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

# Running total of bytes compact_put has moved host->device, for leak
# accounting (PARITY.md "axon h2d transfer leak": client RSS grows by
# ~the bytes moved, so this counter IS the controllable leak budget).
# Read/reset via transfer_bytes()/reset_transfer_bytes().
_TRANSFER_BYTES = 0


def transfer_bytes() -> int:
    return _TRANSFER_BYTES


def reset_transfer_bytes() -> None:
    global _TRANSFER_BYTES
    _TRANSFER_BYTES = 0


def _count(a) -> None:
    global _TRANSFER_BYTES
    _TRANSFER_BYTES += a.size * a.dtype.itemsize


def _int_lossless_max(a: np.ndarray):
    """Largest value if ``a`` holds only nonnegative integers, else None."""
    if a.dtype.kind not in "fiu":
        return None
    amin = a.min() if a.size else 0
    amax = a.max() if a.size else 0
    if amin < 0:
        return None
    if a.dtype.kind not in "iu" and not bool(np.all(a == np.trunc(a))):
        return None
    return float(amax)


def is_u8_lossless(a: np.ndarray) -> bool:
    """True iff ``a`` holds only integers in [0, 255] (uint8-exact)."""
    if a.dtype == np.uint8:
        return True
    m = _int_lossless_max(a)
    return m is not None and m <= 255


def compact_put(arr, dtype=jnp.float32, *, allow_compact=True):
    """Host->device transfer of ``arr``, moving uint8 (or uint16) bytes
    when that is lossless (nonnegative integer values that fit) and
    ``dtype`` is float32.

    Returns a device array that is ``dtype``, uint8 or uint16; in the
    compact cases ``x.astype(dtype)`` inside the consuming jitted program
    is bitwise-equal to a plain ``jnp.asarray(arr, dtype)`` transfer
    (integers <= 2^24 are exact in f32; u16's 65535 is far inside). Wrap
    the consumer with :func:`cast_f32_args` so the cast rides the step's
    existing launch. Continuous data (mels, beats) falls through to a
    plain transfer.

    The uint16 tier exists for the MM-GAN real batches: the durations
    channel counts roll steps on the 300-step pre-window roll, so it
    routinely exceeds 255 — without u16 the whole (B, 2, 128, T) real
    batch fell through to f32, which was most of the round-3 residual
    1.5 MB/step leak (PARITY.md leak table).
    """
    if isinstance(arr, jax.Array) and not isinstance(arr, jax.core.Tracer):
        # already on device (e.g. the GAN-DES fake mels are computed there)
        # — fetching it back to compact would ADD a host round trip
        return arr if arr.dtype in (dtype, jnp.uint8, jnp.uint16) else jnp.asarray(arr, dtype)
    a = np.asarray(arr)
    if allow_compact and dtype == jnp.float32 and a.size >= _COMPACT_MIN_ELEMS:
        if a.dtype == np.uint8:
            _count(a)
            return jnp.asarray(a)
        m = _int_lossless_max(a)
        if m is not None and m <= 255:
            c = np.ascontiguousarray(a, dtype=np.uint8)
            _count(c)
            return jnp.asarray(c)
        if m is not None and m <= 65535:
            c = np.ascontiguousarray(a, dtype=np.uint16)
            _count(c)
            return jnp.asarray(c)
    if a.dtype.kind in "fiu" or a.dtype == np.bool_:
        b = np.asarray(a, dtype)
        _count(b)
        return jnp.asarray(b)
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
