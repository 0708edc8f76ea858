"""TPU-native MIDI synthesizer (replaces the reference's FluidSynth binary).

The reference shells out to FluidSynth with the FluidR3_GM soundfont to
render MIDI to WAV (`GAN_DES/matrix_sim_process.py:114-125`,
`MMGAN_MIDI_DES/util.py:123-127`, `SIMULATOR/simulation_to_wav.py:84-95`) —
a per-sample subprocess that dominates the training-loop wall clock. Here
synthesis is a jitted additive-harmonic render that runs on the TPU:

* each note event becomes an oscillator bank (6 harmonics, program-shaped
  spectral rolloff + inharmonic detune for percussive programs) under an
  ADSR envelope;
* the render is a ``lax.scan`` over fixed-size sample chunks; inside a
  chunk the (events x samples) oscillator evaluation is pure VPU work with
  static shapes, summed into the chunk — no per-note Python, no dynamic
  shapes, one compilation per (chunk count, max_events) bucket;
* events are padded to ``max_events`` so every batch hits the same
  executable.

This is not a FluidR3 clone — it is a deterministic, dependency-free
instrument model with per-program timbre so the downstream mel features
retain program/velocity/pitch structure.

``FluidSynth`` at the bottom is an API-compatible facade
(``FluidSynth(sound_font, sample_rate).midi_to_audio(mid, wav)``) so code
written against midi2audio ports over unchanged.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from gandes_tpu.data.audio import save_wav
from gandes_tpu.music.midi import MidiFile, iter_seconds

N_HARMONICS = 6
ATTACK_S = 0.005
RELEASE_S = 0.05
SUSTAIN = 0.75
DECAY_S = 0.08
MAX_NOTE_S = 2.0     # rendered note tail cap (envelope ~silent past this)
EVENT_BLOCK = 32     # events per scatter-add block
# Timeline cap: the SMF/mido quirk treats the generators' ABSOLUTE note
# times as deltas, so a decoded timeline's length grows with the cumsum of
# event times — pathological logs imply hours of (almost entirely silent)
# audio, unbounded pow2 length buckets (one ~85 s remote compile each), and
# ultimately buffer blow-ups. The synth is this framework's instrument
# model (it replaces FluidSynth, it does not emulate it), so it bounds the
# rendered timeline; events past the cap are dropped by the scatter mask.
RENDER_MAX_S = 190.0
RENDER_L_MAX = 1 << 23  # == _pow2(RENDER_MAX_S * 44100)


def midi_to_event_arrays(midi: MidiFile, max_events: int):
    """Absolute-seconds note events (note, vel, on, off, program) padded to
    max_events; unmatched note_ons are held 0.25 s."""
    notes, vels, ons, offs, progs = [], [], [], [], []
    open_ev: dict[tuple, int] = {}
    program = 0
    t = 0.0
    for msg, delta in iter_seconds(midi):
        t += delta
        if msg.type == "program_change":
            program = msg.program
        elif msg.type == "note_on" and msg.velocity > 0:
            open_ev[(msg.channel, msg.note)] = len(notes)
            notes.append(msg.note)
            vels.append(msg.velocity)
            ons.append(t)
            offs.append(-1.0)
            progs.append(program)
        elif msg.type in ("note_off", "note_on"):
            k = (msg.channel, msg.note)
            if k in open_ev:
                offs[open_ev.pop(k)] = t
    n = len(notes)
    arr = lambda x, d: np.asarray((x + [d] * (max_events - n))[:max_events])
    offs = [o if o >= 0 else ons[i] + 0.25 for i, o in enumerate(offs)]
    return (
        arr(notes, 0).astype(np.int32),
        arr(vels, 0).astype(np.float32),
        arr(ons, 0.0).astype(np.float32),
        arr(offs, 0.0).astype(np.float32),
        arr(progs, 0).astype(np.int32),
        n,
        (max(offs) if offs else 0.0),
    )


def _program_timbre(programs):
    """Per-event spectral shape from the GM program number: rolloff power
    in [1, 3] and a brightness tilt — cheap, deterministic variety."""
    p = programs.astype(jnp.float32)
    rolloff = 1.0 + (p % 32.0) / 16.0          # 1..3
    bright = 0.5 + (p % 8.0) / 8.0             # 0.5..1.4
    return rolloff, bright


@partial(jax.jit, static_argnames=("L", "W", "sr"))
def _render(notes, vels, ons, offs, progs, n_valid, L: int, W: int, sr: int):
    """Sparse render: each event synthesizes a W-sample local window
    (oscillator bank under ADSR, pure VPU work) which is scatter-added at
    its onset sample. Cost scales with note material, not timeline length
    — a 10-minute mostly-silent MIDI costs the same as its notes."""
    E = notes.shape[0]
    freqs = 440.0 * jnp.exp2((notes.astype(jnp.float32) - 69.0) / 12.0)
    amps = (vels / 127.0) ** 1.5 * 0.2
    rolloff, bright = _program_timbre(progs)
    valid = (jnp.arange(E) < n_valid) & (vels > 0)

    h = jnp.arange(1, N_HARMONICS + 1, dtype=jnp.float32)          # (H,)
    h_w = bright[:, None] / (h[None, :] ** rolloff[:, None])       # (E, H)
    h_w = h_w / jnp.sum(h_w, axis=1, keepdims=True)

    t_local = jnp.arange(W, dtype=jnp.float32) / sr                # (W,)
    on_samp = jnp.round(ons * sr).astype(jnp.int32)
    durs = jnp.minimum(offs - ons, MAX_NOTE_S)

    n_blocks = E // EVENT_BLOCK

    def block_body(audio, bi):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, bi * EVENT_BLOCK, EVENT_BLOCK)
        f, a_, d, v = sl(freqs), sl(amps), sl(durs), sl(valid)
        hw = jax.lax.dynamic_slice_in_dim(h_w, bi * EVENT_BLOCK, EVENT_BLOCK)
        ons = sl(on_samp)

        dt = t_local[None, :]                                       # (1, W)
        att = jnp.clip(dt / ATTACK_S, 0.0, 1.0)
        dec = 1.0 - (1.0 - SUSTAIN) * jnp.clip((dt - ATTACK_S) / DECAY_S, 0.0, 1.0)
        rel = jnp.clip(1.0 - (dt - d[:, None]) / RELEASE_S, 0.0, 1.0)
        env = att * dec * rel * v[:, None] * a_[:, None]            # (EB, W)

        phase = 2.0 * jnp.pi * f[:, None] * dt                      # (EB, W)
        sig = jnp.zeros_like(phase)
        for k in range(N_HARMONICS):
            sig = sig + hw[:, k : k + 1] * jnp.sin((k + 1) * phase)

        idx = ons[:, None] + jnp.arange(W)[None, :]                 # (EB, W)
        idx = jnp.where(v[:, None], idx, L)                         # dump slot
        audio = audio.at[idx.reshape(-1)].add((env * sig).reshape(-1), mode="drop")
        return audio, None

    audio = jnp.zeros(L + W + 1, jnp.float32)
    audio, _ = jax.lax.scan(block_body, audio, jnp.arange(n_blocks))
    audio = audio[:L]
    peak = jnp.max(jnp.abs(audio))
    return jnp.where(peak > 1.0, audio / (peak + 1e-6), audio)


def _pow2(x: int) -> int:
    return 1 << max(0, int(x) - 1).bit_length()


def render_midi(midi_input, sr: int = 44100, max_events: int = 1024,
                min_seconds: float = 0.5, tail: float = 0.3,
                pad_to_bucket: bool = False, as_jax: bool = False,
                sound_font: str | None = None):
    """Render a MidiFile (or path) to a float32 mono waveform on device.

    Static shapes are bucketed to powers of two (event count, note window,
    total length) so variable MIDIs hit a small set of compiled
    executables. On non-CPU backends the event count and note window are
    FIXED at their maxima — the extra masked work is negligible on a TPU
    while each distinct shape costs a full (remote) compile. With
    ``pad_to_bucket`` the returned audio keeps the bucketed pow2 length
    (zero tail) so downstream dynamic-hop mels also reuse one compiled
    program per bucket.

    ``sound_font``: path to a ``.sf2`` file — rendering is then SAMPLE
    PLAYBACK from that soundfont (music/sf2.py, the reference's
    FluidSynth+FluidR3_GM pipeline); None uses this additive model. A
    missing path raises, except the reference's default font name
    (see ``_resolve_sound_font``)."""
    midi = MidiFile(midi_input) if isinstance(midi_input, str) else midi_input
    sound_font = _resolve_sound_font(sound_font)
    if sound_font:
        return _get_sf2_synth(sound_font).render_midi(
            midi, sr=sr, min_seconds=min_seconds, tail=tail,
            pad_to_bucket=pad_to_bucket, as_jax=as_jax, max_events=max_events)
    events = midi_to_event_arrays(midi, max_events)
    return render_events(events, sr=sr, max_events=max_events,
                         min_seconds=min_seconds, tail=tail,
                         pad_to_bucket=pad_to_bucket, as_jax=as_jax)


def render_events(events, sr: int = 44100, max_events: int = 1024,
                  min_seconds: float = 0.5, tail: float = 0.3,
                  pad_to_bucket: bool = False, as_jax: bool = False,
                  sound_font: str | None = None):
    """Render pre-extracted event arrays (the ``midi_to_event_arrays``
    tuple — or the native decoder's identical output) — same bucketing,
    soundfont dispatch, and return conventions as :func:`render_midi`."""
    sound_font = _resolve_sound_font(sound_font)
    if sound_font:
        return _get_sf2_synth(sound_font).render_events(
            events, sr=sr, min_seconds=min_seconds, tail=tail,
            pad_to_bucket=pad_to_bucket, as_jax=as_jax)
    import jax as _jax

    notes_l, vels_l, ons_l, offs_l, progs_l, n, end = events
    n = min(n, max_events)
    length_s = min(max(float(end) + tail, min_seconds), RENDER_MAX_S)
    L = _pow2(int(length_s * sr))
    on_cpu = _jax.devices()[0].platform == "cpu"
    if on_cpu:
        max_dur = min(MAX_NOTE_S, float(np.max(offs_l[:n] - ons_l[:n]))) if n else 0.25
        W = _pow2(int((max_dur + RELEASE_S + ATTACK_S) * sr) + 1)
        E = max(_pow2(n), EVENT_BLOCK)
        L_render = L
    else:
        W = _pow2(int((MAX_NOTE_S + RELEASE_S + ATTACK_S) * sr) + 1)
        E = max_events
        # ONE compiled render for every length bucket: the remote compile
        # costs ~85 s per distinct L while the run cost is L-independent
        # (sparse per-event windows), so render into the max-length buffer
        # and slice. Bit-identical to a per-L render: event content and the
        # peak normalization are unaffected by the trailing zeros. The
        # RENDER_MAX_S timeline cap bounds the bucket space, so every
        # sample reuses this single program (at sr <= 44.1 kHz).
        L_render = RENDER_L_MAX if L <= RENDER_L_MAX else L
    audio = _render(
        jnp.asarray(notes_l[:E]), jnp.asarray(vels_l[:E]), jnp.asarray(ons_l[:E]),
        jnp.asarray(offs_l[:E]), jnp.asarray(progs_l[:E]), jnp.int32(n),
        L_render, W, sr,
    )
    if L_render != L:
        audio = audio[:L]
    if as_jax:
        # device-resident (bucketed length); .true_samples carries the crop
        return audio, int(length_s * sr)
    audio = np.asarray(audio)
    return audio if pad_to_bucket else audio[: int(length_s * sr)]


_SF2_CACHE: dict = {}

# the reference's hardcoded soundfont name (sim_to_wav's default,
# `SIMULATOR/simulation_to_wav.py:7`): when THIS name is absent the render
# falls back to the additive synth silently — the reference repo ships
# without the font too. Any other missing path is a user error.
DEFAULT_SOUND_FONT = "FluidR3_GM.sf2"


def _resolve_sound_font(sound_font: str | None) -> str | None:
    """None/"" -> additive synth; an existing path -> SF2 sample playback;
    a missing path raises (a typo'd --sound-font must not silently train/
    serve/eval on the wrong timbre) unless it is the reference's default
    font name, which is allowed to be absent."""
    import os as _os

    if not sound_font:
        return None
    if _os.path.isfile(sound_font):
        return sound_font
    if _os.path.basename(sound_font) == DEFAULT_SOUND_FONT:
        return None
    raise FileNotFoundError(
        f"sound font not found: {sound_font!r} (pass None for the additive "
        f"synth; the default name {DEFAULT_SOUND_FONT!r} may be absent)")


def _get_sf2_synth(sound_font: str, interp: str = "cubic"):
    """Parsed-font + device-bank cache (one per soundfont path AND
    interpolation mode — every pipeline render of a given font goes
    through here, so real and fake sides always share one interpolator)."""
    synth = _SF2_CACHE.get((sound_font, interp))
    if synth is None:
        from gandes_tpu.music.sf2 import Sf2Synth

        synth = _SF2_CACHE[(sound_font, interp)] = Sf2Synth(sound_font,
                                                            interp=interp)
    return synth


class FluidSynth:
    """midi2audio-compatible facade (`from midi2audio import FluidSynth`
    drop-in). Given a real ``.sf2`` path it renders by SAMPLE PLAYBACK from
    that soundfont (`music/sf2.py` — the reference's FluidR3_GM pipeline,
    `GAN_DES/matrix_sim_process.py:114-125`); without one it falls back to
    the additive-harmonic instrument model above."""

    def __init__(self, sound_font: str | None = None, sample_rate: int = 44100):
        self.sample_rate = sample_rate
        self.sound_font = sound_font
        resolved = _resolve_sound_font(sound_font)
        self._sf2 = _get_sf2_synth(resolved) if resolved else None

    def midi_to_audio(self, midi_path: str, wav_path: str):
        if self._sf2 is not None:
            audio = self._sf2.render_midi(midi_path, sr=self.sample_rate)
        else:
            audio = render_midi(midi_path, sr=self.sample_rate)
        save_wav(wav_path, audio, self.sample_rate)


def midi_to_audio_fluidsynth(midi_file_path, audio_file_path, sound_font_path=None):
    """== reference ``midi_to_audio_fluidsynth`` (MMGAN_MIDI_DES/util.py:123-127):
    render at 22 050 Hz through the synth facade."""
    FluidSynth(sound_font_path, sample_rate=22050).midi_to_audio(
        midi_file_path, audio_file_path
    )
