"""Weight initializers matching the reference's torch init semantics.

* ``normal002`` — N(0, 0.02) for conv/convT kernels (GAN-DES
  `SIMNN.py:49-59, 89-95`).
* ``bn_scale_normal002`` — the GAN-DES quirk: ``weights_init`` re-inits
  BatchNorm scales to N(0, 0.02) *after* the N(1, 0.02) init
  (`SIMNN.py:252` applies weights_init last), leaving near-zero BN scales.
* ``xavier_normal`` — MM-GAN Linear layers (`network_tests.py:53-55`).
* ``torch_default_kernel`` / ``torch_default_bias`` — torch's default
  kaiming-uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)), used by
  the MM-GAN DiscriminatorCNN which never gets a custom init.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import random
from jax.nn.initializers import glorot_normal, normal

normal002 = normal(stddev=0.02)
xavier_normal = glorot_normal()


def bn_scale_normal002(key, shape, dtype=jnp.float32):
    return 0.02 * random.normal(key, shape, dtype)


def _fan_in(shape):
    # flax kernels: (*window, in_features, out_features)
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    return shape[-2] * receptive


def torch_default_kernel(key, shape, dtype=jnp.float32):
    bound = 1.0 / np.sqrt(_fan_in(shape))
    return random.uniform(key, shape, dtype, -bound, bound)


def make_torch_default_bias(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, -bound, bound)

    return init
