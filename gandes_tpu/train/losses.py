"""GAN losses.

``bce_with_logits`` is the numerically stable binary cross-entropy used by
both reference loops (torch ``BCEWithLogitsLoss``). Note the GAN-DES quirk:
the reference discriminator already ends in a sigmoid and its output is fed
to BCEWithLogits anyway (`GAN_DES/SIMNN.py:141,257`), i.e. a double squash —
callers preserve that by passing the sigmoided output as "logits".
Label smoothing constants: GAN-DES trains D with real=0.9 / fake=0.1
(`SIMNN.py:284,308`); MM-GAN uses hard 1/0 (`network_tests.py:286-287`).
"""

from __future__ import annotations

import jax.numpy as jnp

GAN_DES_REAL_LABEL = 0.9
GAN_DES_FAKE_LABEL = 0.1


def bce_with_logits(logits, targets):
    """Mean BCE-with-logits, elementwise-stable: max(x,0) - x*t + log1p(e^-|x|)."""
    logits = logits.astype(jnp.float32)
    targets = jnp.broadcast_to(jnp.asarray(targets, jnp.float32), logits.shape)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
