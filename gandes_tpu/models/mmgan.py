"""MM-GAN model family (flax): adjacency generator G1, beat-conditioned
parameter generator G2, and the piano-roll discriminators.

Architectural parity with the reference (`MMGAN_MIDI_DES/network_tests.py`):

* ``MLPGenerator`` (G1, :58-90): cat(noise z, aux) -> 4x [Linear -> BN ->
  sigmoid] with widths 4h, 2h, h, prod(adj_size); reshaped (B, A0, A1).
  Linear weights xavier-normal, biases 0 (weights_init :47-55); BN left at
  torch defaults (weights_init only touches BatchNorm2d, these are 1d).
* ``BeatGenerator`` (G2, :93-123): same trunk -> output_dim sim params.
* ``DiscriminatorMLP`` (:126-144, unused by reference training but part of
  the API): Linear+LeakyReLU(0.2) stack h -> 2h -> 1.
* ``DiscriminatorCNN`` (:147-160): (B, 2, 128, T) roll -> Conv(16,k4,s2,p1)
  -> LeakyReLU(0.2) -> Conv(32,k4,s2,p1) -> LeakyReLU -> FC -> 1 logit.
  Torch-default (kaiming-uniform) init — the reference never re-inits it.

The composite MultiModalGAN (G1+G2 -> host DES -> D) lives in
``gandes_tpu.bridge.mmgan_pipeline``; the modules here are the pure device
math. NHWC layout; BN syncs across ``axis_name`` under data parallelism.
"""

from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from gandes_tpu.models.initializers import (
    make_torch_default_bias,
    torch_default_kernel,
    xavier_normal,
)


class _GenBlock(nn.Module):
    features: int
    axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Dense(self.features, kernel_init=xavier_normal,
                     bias_init=nn.initializers.zeros, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, axis_name=self.axis_name,
                         momentum=0.9,  # torch BatchNorm momentum=0.1 semantics
                         dtype=self.dtype)(x)
        return nn.sigmoid(x)


class MLPGenerator(nn.Module):
    """G1: (noise, aux) -> adjacency matrix in [0,1]."""

    z_dim: int = 50
    hidden_dim: int = 64
    input_dim: int = 50
    adj_size: tuple[int, int] = (64, 64)
    axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, noise, input_tensor=None, train: bool = True):
        if input_tensor is None:
            # reference draws fresh normal aux input when none is given
            input_tensor = jax.random.normal(
                self.make_rng("aux"), (noise.shape[0], self.input_dim), self.dtype
            )
        x = jnp.concatenate([noise, input_tensor], axis=1).astype(self.dtype)
        for feats in (self.hidden_dim * 4, self.hidden_dim * 2, self.hidden_dim):
            x = _GenBlock(feats, self.axis_name, self.dtype)(x, train)
        x = _GenBlock(int(np.prod(self.adj_size)), self.axis_name, self.dtype)(x, train)
        return x.reshape(noise.shape[0], *self.adj_size).astype(jnp.float32)


class BeatGenerator(nn.Module):
    """G2: (noise, beat vector) -> simulator parameter vector in [0,1]."""

    z_dim: int = 50
    hidden_dim: int = 64
    input_dim: int = 50
    output_dim: int = 20
    axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, noise, input_tensor=None, train: bool = True):
        if input_tensor is None:
            input_tensor = jax.random.normal(
                self.make_rng("aux"), (noise.shape[0], self.input_dim), self.dtype
            )
        x = jnp.concatenate([noise, input_tensor], axis=1).astype(self.dtype)
        for feats in (self.hidden_dim * 4, self.hidden_dim * 2, self.hidden_dim):
            x = _GenBlock(feats, self.axis_name, self.dtype)(x, train)
        x = _GenBlock(self.output_dim, self.axis_name, self.dtype)(x, train)
        return x.astype(jnp.float32)


class DiscriminatorMLP(nn.Module):
    """Unused-by-training reference Discriminator (:126-144), kept for API
    completeness."""

    hidden_dim: int = 16
    roll_size: tuple[int, int, int] = (2, 128, 50)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1).astype(self.dtype)
        for feats in (self.hidden_dim, self.hidden_dim * 2, 1):
            x = nn.Dense(feats, kernel_init=torch_default_kernel,
                         bias_init=make_torch_default_bias(x.shape[-1]), dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
        return x.astype(jnp.float32)


class DiscriminatorCNN(nn.Module):
    """Piano-roll discriminator; input (B, 2, 128, T) [NCHW at the API
    boundary for reference parity], returns (B, 1) logits."""

    roll_size: tuple[int, int, int] = (2, 128, 50)
    hidden_dim: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roll):
        c = self.roll_size[0]
        x = jnp.transpose(roll, (0, 2, 3, 1)).astype(self.dtype)  # NHWC
        x = nn.Conv(self.hidden_dim, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    kernel_init=torch_default_kernel,
                    bias_init=make_torch_default_bias(c * 4 * 4), dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.hidden_dim * 2, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    kernel_init=torch_default_kernel,
                    bias_init=make_torch_default_bias(self.hidden_dim * 4 * 4), dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(1, kernel_init=torch_default_kernel,
                     bias_init=make_torch_default_bias(x.shape[-1]), dtype=self.dtype)(x)
        return x.astype(jnp.float32)
