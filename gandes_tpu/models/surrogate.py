"""Learned DES surrogate: a differentiable stand-in for the
matrix→DES→MIDI→piano-roll round trip.

The reference's generators receive exactly zero gradient — both training
loops detach G's output before the simulator (`GAN_DES/SIMNN.py:299`,
`MMGAN_MIDI_DES/network_tests.py:189`), so only D learns. The existing
``g_update='direct'`` mode routes gradients through a *fixed* bilinear
renderer; this module is the stronger option: ``RollSurrogate`` is trained
ONLINE (one fused step with the D/G updates, see
``train/steps.py::make_mmgan_train_step_surrogate``) to regress the actual
DES-produced rolls from the generator outputs, and G then trains through it
straight-through, so the gradient reflects what the simulator actually does
with the matrix instead of a hand-picked proxy.

TPU notes: the decoder is one large Dense (512 × 2·128·T ≈ a 512×12800
matmul) — a single MXU-shaped op rather than many small deconvs; the
encoder convs keep NHWC layout and static shapes. Rolls carry velocities up
to ~126 and integer durations, so the head is softplus (positive,
smooth-at-zero) and the regression loss is scaled (train/steps.py) to keep
Adam in a sane regime.
"""

from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax.numpy as jnp


class MelSurrogate(nn.Module):
    """GAN-DES counterpart: (20x20 adjacency matrix) -> predicted (128, 216)
    mel-dB spectrogram — a differentiable stand-in for
    matrix → DES → MIDI → synth → mel (`bridge/gandes_decode.py`). Linear
    head: mel-dB values are signed."""

    mel_shape: tuple[int, int] = (128, 216)
    hidden_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mats):
        B = mats.shape[0]
        x = mats.reshape(B, -1).astype(self.dtype)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        out = nn.Dense(int(np.prod(self.mel_shape)), dtype=self.dtype)(x)
        return out.reshape(B, *self.mel_shape).astype(jnp.float32)


class RollSurrogate(nn.Module):
    """(adjacency matrix, gen2 parameter vector) -> predicted (2, 128, T)
    piano roll, differentiable end to end."""

    roll_size: tuple[int, int, int] = (2, 128, 50)
    hidden_dim: int = 32
    vec_dim: int = 20
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mats, vec):
        B = mats.shape[0]
        x = mats.reshape(B, mats.shape[-2], mats.shape[-1], 1).astype(self.dtype)
        # conv encoder: 64x64 -> 16x16 feature map
        x = nn.Conv(self.hidden_dim, (4, 4), strides=(2, 2), padding="SAME",
                    dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.hidden_dim * 2, (4, 4), strides=(2, 2), padding="SAME",
                    dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        x = x.reshape(B, -1)

        v = nn.Dense(64, dtype=self.dtype)(vec.astype(self.dtype))
        v = nn.leaky_relu(v, 0.2)

        h = jnp.concatenate([x, v], axis=1)
        h = nn.Dense(512, dtype=self.dtype)(h)
        h = nn.leaky_relu(h, 0.2)
        out = nn.Dense(int(np.prod(self.roll_size)), dtype=self.dtype)(h)
        out = nn.softplus(out)
        return out.reshape(B, *self.roll_size).astype(jnp.float32)
