"""Piano-roll rasterization.

``generate_piano_roll`` is the host reference implementation with the same
semantics as the reference (`MMGAN_MIDI_DES/datasets.py:13-70`): stream the
merged MIDI messages in seconds, round absolute time to integer steps,
``roll[note, t] = velocity`` on note_on, ``durations[note, on:off] = off-on``
on note_off, crop ``[start:end]``, and return ``(roll, durations, beats)``.

Reference quirks preserved:

* the crop guard compares ``end`` against ``len(piano_roll)`` — the *pitch*
  axis (=128) — so for ``end >= 128`` the crop is ``[:, :end]`` and
  ``start`` is ignored (reference :49-54);
* ``note_on`` with velocity 0 writes a 0 into the roll (it is not a note-off);
* iteration stops at ``time_step >= sequence_length``; when
  ``sequence_length`` is None it defaults to ``end + 20`` (reference :14-15).

``rasterize_events_jax`` is the TPU path: a batch of (note, t_on, t_off,
velocity) event arrays becomes (B, 2, 128, T) rolls via vectorized scatters
— one jitted call for a whole batch instead of a Python message loop per
sample.
"""

from __future__ import annotations

import numpy as np

from gandes_tpu.music.beats import get_beats
from gandes_tpu.music.midi import MidiFile, iter_seconds


def midi_to_events(midi: MidiFile, max_steps: int | None = None,
                   return_total: bool = False):
    """Stream a MidiFile into (note, on_step, off_step, velocity) arrays.

    Mirrors the reference message loop (datasets.py:32-45): absolute seconds
    rounded to integer steps; an unmatched note_on keeps its last on-step;
    an orphan note_off paints a duration span from step 0 (the reference's
    zero-initialized ``note_on_time``) — emitted here as a synthetic event
    with ``velocity = -1`` so the velocity channel ignores it.
    Returns int32 arrays in message order; with ``return_total`` also the
    last step index seen (including the one that breaks the loop — the
    pickler's ``total_time`` semantics, notebook cell 10).
    """
    notes, ons, offs, vels = [], [], [], []
    note_on_time = np.zeros(128)
    open_idx = {}
    my_time = 0.0
    total = 0
    for msg, delta in iter_seconds(midi):
        my_time += delta
        step = int(round(my_time))
        total = step
        if max_steps is not None and step >= max_steps:
            break
        if msg.type == "note_on":
            notes.append(msg.note)
            ons.append(step)
            offs.append(step)  # until matched
            vels.append(msg.velocity)
            note_on_time[msg.note] = step
            open_idx[msg.note] = len(notes) - 1
        elif msg.type == "note_off":
            if msg.note in open_idx:
                offs[open_idx[msg.note]] = step
            else:
                notes.append(msg.note)
                ons.append(int(round(note_on_time[msg.note])))
                offs.append(step)
                vels.append(-1)
    out = (
        np.asarray(notes, dtype=np.int32),
        np.asarray(ons, dtype=np.int32),
        np.asarray(offs, dtype=np.int32),
        np.asarray(vels, dtype=np.int32),
    )
    return out + (total,) if return_total else out


def generate_piano_roll(midi_input, sequence_length=100, beats_length=50, start=0, end=50):
    """Host rasterizer; same surface and quirks as the reference
    (`MMGAN_MIDI_DES/datasets.py:13-70`)."""
    if sequence_length is None:
        sequence_length = end + 20
    if isinstance(midi_input, str):
        midi = MidiFile(midi_input)
        beat_source = midi
    elif isinstance(midi_input, MidiFile):
        midi = midi_input
        # reference: PrettyMIDI(midi.filename) — None for in-memory files,
        # which yields an *empty* beat grid (quirk #2 feeding all-zero
        # beats during MM-GAN training).
        beat_source = MidiFile(midi.filename) if midi.filename else None
    else:
        raise ValueError("midi_input must be a file path or a MidiFile object")

    piano_roll = np.zeros((128, end - start))
    durations = np.zeros((128, end - start))
    try:
        my_time = 0.0
        note_on_time = np.zeros(128)
        for msg, delta in iter_seconds(midi):
            my_time += delta
            time_step = int(round(my_time))
            if time_step >= sequence_length:
                break
            if msg.type == "note_on":
                piano_roll[msg.note, time_step] = msg.velocity
                note_on_time[msg.note] = time_step
            elif msg.type == "note_off":
                note_off_time = int(round(note_on_time[msg.note]))
                durations[msg.note, note_off_time:time_step] = time_step - note_off_time
    except Exception:
        print(f"Error in processing midi file {midi_input}")

    if end < len(piano_roll):  # quirk: compares against the PITCH axis (128)
        piano_roll = piano_roll[:, start:end]
        durations = durations[:, start:end]
    else:
        piano_roll = piano_roll[:, :end]
        durations = durations[:, :end]

    beats = get_beats(beat_source)
    if len(beats) < beats_length:
        beats = np.pad(beats, (0, beats_length - len(beats)))
    elif len(beats) > beats_length:
        beats = beats[:beats_length]

    return piano_roll, durations, beats


# --------------------------------------------------------------------- TPU


def rasterize_events_jax(notes, ons, offs, vels, *, num_steps: int, start: int = 0,
                         impl: str | None = None):
    """Batched piano-roll rasterization on device.

    Args:
      notes, ons, offs, vels: int32 arrays of shape (B, E) (pad unused event
        slots with ``note = -1``). ``ons``/``offs`` are integer time steps
        *before* cropping.
      num_steps: T, the cropped roll length (static).
      start: crop offset subtracted from the step indices (static).

    Returns ``(B, 2, 128, T)`` float32: channel 0 velocity at onset, channel
    1 the duration painted over [on, off), matching the host rasterizer's
    crop semantics for ``end - start = num_steps`` with ``end < 128``.

    Design note ("last writer wins" without a Python loop): the reference
    rasterizer writes cells in message order, so on conflicts the latest
    event wins. We reproduce that with two segment-max passes over flat
    (note*T + t) cell ids — pass 1 finds the highest event index touching
    each cell, pass 2 takes that event's value. Everything is static-shape
    (B, E, T) work that XLA fuses; no host loop, no dynamic shapes.

    ``impl``: ``None`` auto-selects — the Pallas kernel
    (`ops/pallas_roll.py`, sequential per-sample event walk, 5.3x the
    scatter formulation on v5e, bit-equal) on TPU backends, the XLA scatter
    path on CPU and for event counts past the kernel's measured SMEM
    capacity; ``'xla'``/``'pallas'`` force one.
    """
    import jax
    import jax.numpy as jnp

    if impl is None:
        from gandes_tpu.ops.pallas_roll import PALLAS_MAX_EVENTS

        on_cpu = jax.devices()[0].platform == "cpu"
        impl = "xla" if on_cpu or np.shape(notes)[-1] > PALLAS_MAX_EVENTS else "pallas"
    if impl == "pallas":
        from gandes_tpu.ops.pallas_roll import rasterize_events_pallas

        return rasterize_events_pallas(notes, ons, offs, vels,
                                       num_steps=num_steps, start=start)

    notes = jnp.asarray(notes, dtype=jnp.int32)
    ons = jnp.asarray(ons, dtype=jnp.int32)
    offs = jnp.asarray(offs, dtype=jnp.int32)
    vels = jnp.asarray(vels, dtype=jnp.int32)
    return _get_rasterize_impl()(notes, ons, offs, vels, num_steps, start)


_RASTERIZE_IMPL = None


def _get_rasterize_impl():
    """Build the jitted rasterizer on first use (keeps this module — and
    the generators that import it — importable without jax)."""
    global _RASTERIZE_IMPL
    if _RASTERIZE_IMPL is not None:
        return _RASTERIZE_IMPL
    import functools

    import jax

    _RASTERIZE_IMPL = functools.partial(jax.jit, static_argnums=(4, 5))(_rasterize_math)
    return _RASTERIZE_IMPL


def _rasterize_math(notes, ons, offs, vels, num_steps, start):
    import jax
    import jax.numpy as jnp

    ons = ons - start
    offs = offs - start
    B, E = notes.shape
    T = num_steps
    C = 128 * T  # flat cell count; index C = dump slot for masked writes

    def _last_writer(ids, order, values, mask):
        """values scattered at ids, highest `order` wins; masked -> dropped."""
        ids = jnp.where(mask, ids, C)
        best = (
            jnp.full(C + 1, -1, jnp.int32)
            .at[ids.reshape(-1)]
            .max(jnp.where(mask, order, -1).reshape(-1), mode="drop")
        )
        win = mask & (order == best[ids])
        out = (
            jnp.zeros(C + 1, jnp.float32)
            .at[ids.reshape(-1)]
            .max(jnp.where(win, values, 0.0).reshape(-1), mode="drop")
        )
        return out[:C].reshape(128, T)

    def one(notes, ons, offs, vels):
        valid = notes >= 0
        order = jax.lax.iota(jnp.int32, E)

        # channel 0: roll[note, on] = velocity (vel < 0 marks synthetic
        # duration-only events from orphan note_offs)
        on_ids = notes * T + ons
        on_mask = valid & (ons >= 0) & (ons < T) & (vels >= 0)
        vel_roll = _last_writer(on_ids, order, vels.astype(jnp.float32), on_mask)

        # channel 1: durations[note, on:off] = off - on  (painted per step)
        steps = jax.lax.broadcasted_iota(jnp.int32, (E, T), 1)
        span = (steps >= ons[:, None]) & (steps < offs[:, None]) & valid[:, None]
        cell_ids = notes[:, None] * T + steps
        dur = (offs - ons).astype(jnp.float32)
        dur_roll = _last_writer(
            cell_ids,
            jnp.broadcast_to(order[:, None], (E, T)),
            jnp.broadcast_to(dur[:, None], (E, T)),
            span,
        )
        return jnp.stack([vel_roll, dur_roll])

    return jax.vmap(one)(notes, ons, offs, vels)
