from gandes_tpu.models.gan_des import DCGANGenerator, MelDiscriminator
from gandes_tpu.models.mmgan import (
    BeatGenerator,
    DiscriminatorCNN,
    DiscriminatorMLP,
    MLPGenerator,
)


def get_noise(key, n_samples, noise_dim):
    """Reference helper (`GAN_DES/SIMNN.py:37-46`, `network_tests.py:43-44`)
    with jax.random semantics: N(0,1) noise of shape (n_samples, noise_dim)."""
    import jax

    return jax.random.normal(key, (n_samples, noise_dim))
