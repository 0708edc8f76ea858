"""A/B harness: our SF2 renderer vs a real FluidSynth binary (VERDICT r2 #4b).

The reference's every WAV came from the FluidSynth binary + FluidR3_GM
(`GAN_DES/matrix_sim_process.py:114-125`, `MMGAN_MIDI_DES/util.py:123-127`).
Our `music/sf2.py` is a from-spec renderer validated against host mirrors
and committed goldens — ground truth against the *actual* binary is only
possible where one exists. This module ships the harness so that check can
run anywhere a `fluidsynth` executable and a font are available:

    python -m gandes_tpu.cli doctor --fluidsynth-ab font.sf2 [--ab-midi x.mid]

renders the same MIDI through both engines and reports mel-distance, onset
delta, and a level (gain) ratio with pass thresholds. In this environment
neither the binary nor a real font exists (tests auto-skip, by design) —
run on a box with FluidSynth installed to get the numbers.

Thresholds: the two engines legitimately differ in master gain (FluidSynth
applies its default CC7=100 concave attenuation and -10 dB master gain;
documented in sf2.py), interpolation (4-point cubic vs our cubic), reverb
and chorus algorithms (Freeverb parameters differ per version), and voice
stealing. So both signals are RMS-normalized before the spectral compare,
the raw gain ratio is reported separately, and "pass" means the normalized
mel surfaces agree within PASS_MEL_DB and onsets within PASS_ONSET_MS —
perceptual-equivalence bounds, not bit parity.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import numpy as np

PASS_MEL_DB = 10.0     # mean |Δ log-mel| over active frames, dB
PASS_ONSET_MS = 30.0   # first-audible-sample delta


def find_fluidsynth() -> str | None:
    """Path of a fluidsynth binary, or None ($GANDES_FLUIDSYNTH overrides)."""
    env = os.environ.get("GANDES_FLUIDSYNTH")
    if env and os.path.exists(env):
        return env
    return shutil.which("fluidsynth")


def default_ab_midi():
    """A small register-spanning test piece: chords, overlaps, staccato —
    enough material for a meaningful spectral compare at any program."""
    from gandes_tpu.music.midi import (Message, MetaMessage, MidiFile,
                                       MidiTrack)

    mid = MidiFile(type=0, ticks_per_beat=480)
    tr = MidiTrack()
    tr.append(MetaMessage("set_tempo", tempo=500000, time=0))
    notes = [  # (key, vel, on_s, off_s)
        (48, 96, 0.00, 0.90), (60, 100, 0.00, 0.50), (64, 80, 0.25, 0.75),
        (67, 110, 0.50, 1.40), (72, 70, 0.90, 1.10), (55, 90, 1.10, 1.90),
        (84, 100, 1.40, 1.55), (36, 120, 1.50, 2.30),
    ]
    events = []
    for key, vel, on, off in notes:
        events.append((on, Message("note_on", note=key, velocity=vel)))
        events.append((off, Message("note_off", note=key, velocity=0)))
    events.sort(key=lambda e: e[0])
    t_prev = 0.0
    for t, msg in events:
        msg.time = int(round((t - t_prev) * 960))
        tr.append(msg)
        t_prev += msg.time / 960.0
    tr.append(MetaMessage("end_of_track", time=0))
    mid.tracks.append(tr)
    return mid


def _onset_ms(a: np.ndarray, sr: int, thresh: float = 1e-3) -> float:
    hot = np.abs(a) > thresh * max(float(np.abs(a).max()), 1e-12)
    return float(np.argmax(hot)) / sr * 1e3 if hot.any() else -1.0


def _logmel(a: np.ndarray, sr: int) -> np.ndarray:
    from gandes_tpu.music.mel import melspectrogram_db

    return np.asarray(melspectrogram_db(a.astype(np.float32), sr=sr))


def fluidsynth_ab(sf2_path: str, midi_path: str | None = None, *,
                  sr: int = 44100, fluidsynth_bin: str | None = None) -> dict:
    """Render the same MIDI through our Sf2Synth and the fluidsynth binary;
    return metrics + pass verdicts. Raises FileNotFoundError when no
    binary is available (callers gate on :func:`find_fluidsynth`)."""
    from gandes_tpu.data.audio import load_wav
    from gandes_tpu.music.midi import MidiFile
    from gandes_tpu.music.sf2 import Sf2Synth

    binary = fluidsynth_bin or find_fluidsynth()
    if not binary:
        raise FileNotFoundError(
            "no fluidsynth binary found (PATH or $GANDES_FLUIDSYNTH)")

    with tempfile.TemporaryDirectory() as td:
        if midi_path is None:
            midi_path = os.path.join(td, "ab.mid")
            default_ab_midi().save(midi_path)
        mid = MidiFile(midi_path)

        ours = np.asarray(
            Sf2Synth(sf2_path).render_midi(mid, sr=sr), np.float32)

        wav = os.path.join(td, "fs.wav")
        proc = subprocess.run(
            [binary, "-ni", "-r", str(sr), "-F", wav, sf2_path, midi_path],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            timeout=300)
        if proc.returncode != 0 or not os.path.exists(wav):
            raise RuntimeError(
                f"fluidsynth failed (rc={proc.returncode}):\n{proc.stdout}")
        theirs, got_sr = load_wav(wav, normalize=True, mono=True)
        if got_sr != sr:
            raise RuntimeError(f"fluidsynth wrote sr={got_sr}, wanted {sr}")

    n = min(len(ours), len(theirs))
    ours_c, theirs_c = ours[:n], np.asarray(theirs[:n], np.float32)
    rms_ours = float(np.sqrt(np.mean(ours_c.astype(np.float64) ** 2)))
    rms_theirs = float(np.sqrt(np.mean(theirs_c.astype(np.float64) ** 2)))
    # None (JSON null) when either render is silent: float('inf') is not
    # valid JSON, and a silent side means the A/B itself is broken — the
    # verdict below fails rather than trivially passing on two silences
    # (ADVICE r3 #2)
    silent = rms_ours <= 0 or rms_theirs <= 0
    gain_db = None if silent else 20 * np.log10(rms_ours / rms_theirs)

    # level-normalize before the spectral compare (legit master-gain
    # differences are reported via gain_db, not counted as distance)
    a = ours_c / max(rms_ours, 1e-12)
    b = theirs_c / max(rms_theirs, 1e-12)
    mel_a, mel_b = _logmel(a, sr), _logmel(b, sr)
    f = min(mel_a.shape[-1], mel_b.shape[-1])
    mel_a, mel_b = mel_a[..., :f], mel_b[..., :f]
    # compare where either side has signal; silent frames agree trivially
    active = (mel_a.max(axis=0) > mel_a.max() - 60) | (
        mel_b.max(axis=0) > mel_b.max() - 60)
    mel_l1 = float(np.mean(np.abs(mel_a[:, active] - mel_b[:, active]))
                   ) if active.any() else 0.0

    onset_ours = _onset_ms(ours_c, sr)
    onset_theirs = _onset_ms(theirs_c, sr)
    onset_delta = abs(onset_ours - onset_theirs)

    report = {
        "fluidsynth": binary,
        "sf2": os.path.abspath(sf2_path),
        "sr": sr,
        "n_samples": n,
        "gain_db_ours_minus_fs": None if gain_db is None else round(gain_db, 2),
        "mel_l1_db": round(mel_l1, 3),
        "onset_ours_ms": round(onset_ours, 2),
        "onset_fs_ms": round(onset_theirs, 2),
        "onset_delta_ms": round(onset_delta, 2),
        "pass_mel": mel_l1 <= PASS_MEL_DB,
        "pass_onset": onset_delta <= PASS_ONSET_MS,
    }
    report["silent_render"] = silent
    report["ok"] = report["pass_mel"] and report["pass_onset"] and not silent
    return report
