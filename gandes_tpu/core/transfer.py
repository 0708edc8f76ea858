"""Compact host->device transfers.

The axon TPU client leaks every host->device transfer's FULL byte size in
client RSS: a 2 MB ``jax.device_put`` (or jit-arg transfer, or explicit
``.delete()``-ed buffer) permanently grows the process ~1.94 MB, while
device->host fetches plateau and CPU-backend runs stay flat (micro-repro
table: PARITY.md "axon h2d transfer leak"; the leak is proportional to
bytes moved, dtype-irrelevant; a no-op launch leaks ~1.5 kB).

The training loops move two batch-sized arrays per step (the real batch
and the DES-produced fake rolls, ~0.8 MB each at batch 16), which over a
reference-schedule run (13,480 steps) compounds to ~28 GB RSS. Both are
piano rolls: integer MIDI velocities in [0, 127] and a binary duration
channel — losslessly representable in uint8. ``compact_put`` transfers
such arrays as uint8 (4x fewer bytes leaked AND moved over the remote
tunnel); the f32 cast happens INSIDE the consumer's already-jitted step
(``cast_f32_args`` below) where XLA fuses it to nothing — an eager
device-side cast would cost an extra dispatch per array, ~80 ms/launch
on this remote-attached platform. The cast is exact for integers <= 255,
so the compiled step consumes bit-identical float32 inputs (pinned by
tests/test_transfer.py). Non-integral arrays (mel spectrograms, beat
vectors) pass through unchanged.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# below this many elements the uint8 round trip saves less than the
# integrality scan costs; transfer small arrays directly
_COMPACT_MIN_ELEMS = 16_384


def is_u8_lossless(a: np.ndarray) -> bool:
    """True iff ``a`` holds only integers in [0, 255] (uint8-exact)."""
    if a.dtype == np.uint8:
        return True
    if a.dtype.kind not in "fiu":
        return False
    amin = a.min() if a.size else 0
    amax = a.max() if a.size else 0
    if amin < 0 or amax > 255:
        return False
    if a.dtype.kind in "iu":
        return True
    return bool(np.all(a == np.trunc(a)))


def compact_put(arr, dtype=jnp.float32):
    """Host->device transfer of ``arr``, moving uint8 bytes when that is
    lossless (integer values in [0, 255]) and ``dtype`` is float32.

    Returns a device array that is either ``dtype`` or uint8; in the
    uint8 case ``x.astype(dtype)`` inside the consuming jitted program is
    bitwise-equal to a plain ``jnp.asarray(arr, dtype)`` transfer. Wrap
    the consumer with :func:`cast_f32_args` so the cast rides the step's
    existing launch. Continuous data (mels, beats) falls through to a
    plain transfer.
    """
    if isinstance(arr, jax.Array) and not isinstance(arr, jax.core.Tracer):
        # already on device (e.g. the GAN-DES fake mels are computed there)
        # — fetching it back to compact would ADD a host round trip
        return arr if arr.dtype in (dtype, jnp.uint8) else jnp.asarray(arr, dtype)
    a = np.asarray(arr)
    if (dtype == jnp.float32 and a.size >= _COMPACT_MIN_ELEMS
            and is_u8_lossless(a)):
        return jnp.asarray(np.ascontiguousarray(a, dtype=np.uint8))
    return jnp.asarray(a, dtype)


def cast_f32_args(fn, *argnums):
    """Wrap ``fn`` so positional args ``argnums`` are cast to float32 at
    trace time — jit the WRAPPER so compact uint8 transfers decode inside
    the step's own program (a free convert_element_type; no extra launch).
    No-op for args that are already float32."""

    def wrapped(*args, **kwargs):
        args = list(args)
        for i in argnums:
            if args[i] is not None:
                args[i] = jnp.asarray(args[i], jnp.float32)
        return fn(*args, **kwargs)

    return wrapped
