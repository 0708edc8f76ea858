"""Pallas piano-roll rasterization kernel.

Rasterizes batched (note, on, off, velocity) event arrays into the
reference's (2, 128, T) piano rolls (`MMGAN_MIDI_DES/datasets.py:13-70`
semantics: channel 0 velocity at onset, channel 1 the duration painted over
[on, off), message-order conflicts resolved last-writer-wins).

The XLA formulation (`music/piano_roll.py::_rasterize_math`) materializes
(E, T) span masks and resolves write order with two segment-max scatter
passes over flat cell ids. This kernel instead walks the event list
*sequentially* per batch item — the natural encoding of last-writer-wins —
doing two masked (1, T) row read-modify-writes per event against the
VMEM-resident output block. No scatters, no (E, T) intermediates, no HBM
traffic beyond one stream of events in and one roll out; the grid is
(B,) with each program owning one sample's (2, 128, T) block.

Bit-equal to the XLA path. Coverage note: the CI suite runs on the CPU
backend, so tests/test_pallas_roll.py exercises the *interpreter*; the
compiled kernel was verified bit-equal against the XLA path on a real v5e
for E in {512, 1024, 2048, 4096, 8192, 16384} (the capacity probe behind
``PALLAS_MAX_EVENTS``) — re-run that check when touching the kernel:
    PYTHONPATH=. python -c "see tests/test_pallas_roll.py::_random_events"
on a TPU-attached machine with both impls.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401  (memory spaces)

# Largest per-sample event count the compiled kernel has been verified at
# (4 x E x 4 B of SMEM event blocks; E=16384 = 256 KB compiled and matched
# the XLA path bit-for-bit on v5e). The auto-select in
# music.piano_roll.rasterize_events_jax falls back to the XLA scatter path
# above this rather than risk an SMEM overflow on denser inputs.
PALLAS_MAX_EVENTS = 16384


def _kernel(notes_ref, ons_ref, offs_ref, vels_ref, counts_ref, out_ref, *, E, T):
    out_ref[:] = jnp.zeros_like(out_ref)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    # dynamic trip count: only walk this sample's real events, not the
    # shared pad-to-max tail (batches are padded to the densest sample)
    count = jnp.minimum(counts_ref[0, 0, 0], E)

    def body(e, carry):
        note = notes_ref[0, 0, e]
        on = ons_ref[0, 0, e]
        off = offs_ref[0, 0, e]
        vel = vels_ref[0, 0, e]

        @pl.when((note >= 0) & (note < 128))
        def _():
            # channel 0: roll[note, on] = velocity (vel < 0 marks synthetic
            # duration-only events from orphan note_offs)
            @pl.when((vel >= 0) & (on >= 0) & (on < T))
            def _():
                row = out_ref[0, 0, pl.ds(note, 1), :]
                out_ref[0, 0, pl.ds(note, 1), :] = jnp.where(
                    t_iota == on, vel.astype(jnp.float32), row
                )

            # channel 1: durations[note, on:off] = off - on
            row = out_ref[0, 1, pl.ds(note, 1), :]
            out_ref[0, 1, pl.ds(note, 1), :] = jnp.where(
                (t_iota >= on) & (t_iota < off),
                (off - on).astype(jnp.float32), row,
            )

        return carry

    jax.lax.fori_loop(0, count, body, 0)


@partial(jax.jit, static_argnames=("num_steps", "start", "interpret"))
def _rasterize_pallas(notes, ons, offs, vels, num_steps, start, interpret):
    B, E = notes.shape
    T = num_steps
    # events ride as (B, 1, E) SMEM blocks: the kernel indexes them with the
    # *dynamic* loop counter, which only scalar memory supports (VMEM lane
    # dims can't be dynamically indexed), and the reads are scalars anyway
    ev = lambda x: x.reshape(B, 1, E)
    ev_spec = pl.BlockSpec((1, 1, E), lambda b: (b, 0, 0),
                           memory_space=pltpu.SMEM)
    # per-sample trip count = index of the last valid event + 1 (interior
    # pad slots are fine — the kernel skips note < 0 — but the shared
    # pad-to-densest tail is never walked)
    valid = notes >= 0
    counts = jnp.where(valid.any(axis=1),
                       E - jnp.argmax(valid[:, ::-1], axis=1), 0).astype(jnp.int32)
    return pl.pallas_call(
        partial(_kernel, E=E, T=T),
        grid=(B,),
        in_specs=[ev_spec] * 4 + [
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 2, 128, T), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 2, 128, T), jnp.float32),
        interpret=interpret,
    )(ev(notes), ev(ons - start), ev(offs - start), ev(vels),
      counts.reshape(B, 1, 1))


def rasterize_events_pallas(notes, ons, offs, vels, *, num_steps: int,
                            start: int = 0, interpret: bool | None = None):
    """Drop-in Pallas variant of ``piano_roll.rasterize_events_jax``.

    Same contract: int32 (B, E) event arrays (pad unused slots with
    ``note = -1``), returns (B, 2, 128, T) float32. ``interpret=None``
    compiles everywhere except the CPU backend.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    notes = jnp.asarray(notes, jnp.int32)
    ons = jnp.asarray(ons, jnp.int32)
    offs = jnp.asarray(offs, jnp.int32)
    vels = jnp.asarray(vels, jnp.int32)
    return _rasterize_pallas(notes, ons, offs, vels, num_steps, start, interpret)
