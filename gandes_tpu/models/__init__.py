from gandes_tpu.models.gan_des import DCGANGenerator, MelDiscriminator
from gandes_tpu.models.mmgan import (
    BeatGenerator,
    DiscriminatorCNN,
    DiscriminatorMLP,
    MLPGenerator,
)
