"""GAN-DES model family (flax) — the DCGAN that emits 20x20 adjacency
matrices and the CNN mel-spectrogram discriminator.

Architectural parity with the reference (`GAN_DES/SIMNN.py`):

* ``DCGANGenerator``: noise (B, 100) -> ConvT(k4,s1) -> BN -> ReLU ->
  ConvT(k4,s2,p1) -> BN -> ReLU -> ConvT(k4,s2,p1) -> BN -> ReLU ->
  ConvT(k5,s1) -> sigmoid, output (B, 20, 20) in [0,1] (SIMNN.py:62-112;
  spatial chain 1 -> 4 -> 8 -> 16 -> 20).
* ``MelDiscriminator``: (B, 128, 216) mel dB -> Conv(16,k2,p1) -> relu ->
  maxpool2 -> Conv(32,k3,p1) -> relu -> maxpool2 -> FC(128) -> relu ->
  FC(1) -> sigmoid (SIMNN.py:115-142). NOTE the reference feeds this
  *sigmoided* output into BCEWithLogits — that double-squash is preserved
  in train/losses.py, not here.

TPU-first choices: NHWC layout throughout (TPU conv-friendly), bfloat16
matmul-friendly shapes, batch statistics synchronized across the ``dp``
mesh axis when an ``axis_name`` is given (the reference's single-device
BatchNorm becomes sync-BN under data parallelism).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from gandes_tpu.models.initializers import (
    bn_scale_normal002,
    make_torch_default_bias,
    normal002,
    torch_default_kernel,
)


class DCGANGenerator(nn.Module):
    noise_dim: int = 100
    gen_dim: int = 32
    out_channels: int = 1
    axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        # z: (B, noise_dim) — reference uses (B, noise_dim, 1, 1)
        x = z.reshape(z.shape[0], 1, 1, self.noise_dim).astype(self.dtype)
        bn = lambda: nn.BatchNorm(
            use_running_average=not train,
            axis_name=self.axis_name,
            scale_init=bn_scale_normal002,  # reference weights_init quirk
            momentum=0.9,  # torch BatchNorm momentum=0.1 semantics
            dtype=self.dtype,
        )
        # torch ConvTranspose2d(padding=p) == lax.conv_transpose padding of
        # (k-1-p) on the dilated input; out = (i-1)*s - 2p + k.
        convt = lambda feats, k, s, p: nn.ConvTranspose(
            features=feats,
            kernel_size=(k, k),
            strides=(s, s),
            padding=((k - 1 - p, k - 1 - p),) * 2,
            use_bias=False,
            kernel_init=normal002,
            dtype=self.dtype,
        )
        x = nn.relu(bn()(convt(self.gen_dim * 4, 4, 1, 0)(x)))   # (B,4,4,128)
        x = nn.relu(bn()(convt(self.gen_dim * 2, 4, 2, 1)(x)))   # (B,8,8,64)
        x = nn.relu(bn()(convt(self.gen_dim, 4, 2, 1)(x)))       # (B,16,16,32)
        x = convt(self.out_channels, 5, 1, 0)(x)                 # (B,20,20,1)
        x = nn.sigmoid(x.astype(jnp.float32))
        return x[..., 0]  # (B, 20, 20)


class MelDiscriminator(nn.Module):
    hidden: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel):
        # mel: (B, 128, 216) -> NHWC
        x = mel[..., None].astype(self.dtype)
        x = nn.Conv(16, (2, 2), padding=((1, 1), (1, 1)),
                    kernel_init=torch_default_kernel,
                    bias_init=make_torch_default_bias(1 * 2 * 2), dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))               # (B,64,108,16)
        x = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=torch_default_kernel,
                    bias_init=make_torch_default_bias(16 * 3 * 3), dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))               # (B,32,54,32)
        x = x.reshape(x.shape[0], -1)                            # 32*54*32
        x = nn.relu(nn.Dense(self.hidden, kernel_init=torch_default_kernel,
                             bias_init=make_torch_default_bias(x.shape[-1]),
                             dtype=self.dtype)(x))
        x = nn.Dense(1, kernel_init=torch_default_kernel,
                     bias_init=make_torch_default_bias(self.hidden), dtype=self.dtype)(x)
        return nn.sigmoid(x.astype(jnp.float32))  # (B, 1), sigmoided as in reference
