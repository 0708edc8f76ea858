"""Synth, mel, and audio-bridge tests (GAN-DES + simulator-demo paths)."""

import os
import sys
import types

import numpy as np
import pytest

from gandes_tpu.data.audio import load_wav, save_wav, split_audio_data
from gandes_tpu.music.mel import (
    mel_filterbank,
    melspectrogram_db,
    melspectrogram_db_tensor,
    melspectrogram_power_tensor,
    power_spectrogram,
)
from gandes_tpu.music.midi import Message, MetaMessage, MidiFile, MidiTrack
from gandes_tpu.music.synth import render_midi

from conftest import reference_available


def _tone_midi(note=69, dur_ticks=960, velocity=100):
    mid = MidiFile()
    t = MidiTrack()
    mid.tracks.append(t)
    t.append(MetaMessage("set_tempo", tempo=500000, time=0))
    t.append(Message("program_change", program=0, time=0))
    t.append(Message("note_on", note=note, velocity=velocity, time=0))
    t.append(Message("note_off", note=note, velocity=velocity, time=dur_ticks))
    t.append(MetaMessage("end_of_track", time=0))
    return mid


def test_synth_pitch_accuracy():
    sr = 22050
    audio = render_midi(_tone_midi(note=69), sr=sr)  # A4 = 440 Hz
    assert len(audio) > sr // 2
    seg = audio[int(0.1 * sr):int(0.9 * sr)]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    freqs = np.fft.rfftfreq(len(seg), 1 / sr)
    peak = freqs[np.argmax(spec)]
    assert abs(peak - 440.0) < 5.0
    assert np.max(np.abs(audio)) <= 1.0
    assert np.sqrt((audio**2).mean()) > 1e-3


def test_synth_velocity_scales_amplitude():
    loud = render_midi(_tone_midi(velocity=120), sr=22050)
    quiet = render_midi(_tone_midi(velocity=30), sr=22050)
    assert np.abs(loud).max() > 2 * np.abs(quiet).max()


def test_wav_roundtrip(tmp_path):
    sr = 22050
    w = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    p = str(tmp_path / "t.wav")
    save_wav(p, w, sr)
    w2, sr2 = load_wav(p)
    assert sr2 == sr
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_split_audio_data(tmp_path):
    sr = 44100
    w = np.random.RandomState(0).randn(int(12.5 * sr)).astype(np.float32) * 0.1
    p = str(tmp_path / "long.wav")
    save_wav(p, w, sr)
    splits = split_audio_data(p)
    assert all(len(s) == 5 * sr for s in splits)
    assert len(splits) == 3  # 0-5, 5-10, last right-aligned


def test_power_spectrogram_matches_numpy_reference():
    """Cross-check the jitted STFT against an independent numpy version."""
    rng = np.random.RandomState(1)
    wav = rng.randn(8000).astype(np.float32)
    n_fft, hop = 512, 128
    ours = np.asarray(power_spectrogram(wav, n_fft=n_fft, hop_length=hop))

    padded = np.pad(wav, (n_fft // 2, n_fft // 2), mode="reflect")
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    n_frames = 1 + (len(padded) - n_fft) // hop
    ref = np.stack([
        np.abs(np.fft.rfft(padded[i * hop:i * hop + n_fft] * win)) ** 2
        for i in range(n_frames)
    ]).T
    assert ours.shape == ref.shape == (n_fft // 2 + 1, 1 + len(wav) // hop)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_mel_tone_lands_in_right_bin():
    sr, f = 44100, 1000.0
    wav = np.sin(2 * np.pi * f * np.arange(5 * sr) / sr).astype(np.float32)
    mel = np.asarray(melspectrogram_db_tensor(wav, sr=sr))
    # dynamic hop: hop = L//215, crop to 216*hop is a no-op (exceeds L),
    # frames = 1 + L//hop = 216
    assert mel.shape == (128, 216)
    fb = mel_filterbank(sr, 2048, 128, 20, 8300, htk=True, norm_slaney=False)
    freqs = np.linspace(0, sr / 2, 1025)
    expected_bin = np.argmax(fb[:, np.argmin(np.abs(freqs - f))])
    got_bin = np.argmax(mel.mean(axis=1))
    assert abs(int(got_bin) - int(expected_bin)) <= 1


def test_mel_variants_quirks():
    sr = 44100
    wav = np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32)
    db = np.asarray(melspectrogram_db_tensor(wav, sr=sr))
    power = np.asarray(melspectrogram_power_tensor(wav, sr=sr))
    # the _maestro variant returns power, not dB (util.py:87 quirk)
    assert power.min() >= 0.0
    assert db.min() < 0.0 or db.max() > 50  # dB scale
    # top_db floor: range <= 80
    assert db.max() - db.min() <= 80.0 + 1e-3
    # librosa variant on silence: fully floored
    silent = np.asarray(melspectrogram_db(np.zeros(sr), sr=sr))
    assert silent.max() == silent.min()


def test_melspectrogram_db_from_file(tmp_path):
    from gandes_tpu.music.mel import melspectrogram_db_from_file, melspectrogram_db_ref_max

    sr = 44100
    wav = (0.5 * np.sin(2 * np.pi * 440 * np.arange(2 * sr) / sr)).astype(np.float32)
    p = str(tmp_path / "tone.wav")
    save_wav(p, wav, sr)
    mel = np.asarray(melspectrogram_db_from_file(p, sr=sr))
    loaded, _ = load_wav(p)
    np.testing.assert_allclose(mel, np.asarray(melspectrogram_db_ref_max(loaded, sr)),
                               atol=1e-5)
    assert mel.shape[0] == 128 and mel.max() <= 0.0 + 1e-6  # ref=max dB

    # resampling branch (file at 22050, requested 44100): frame count doubles
    save_wav(str(tmp_path / "t22.wav"), wav[::2], 22050)
    mel2 = np.asarray(melspectrogram_db_from_file(str(tmp_path / "t22.wav"), sr=sr))
    assert mel2.shape[0] == 128
    assert abs(mel2.shape[1] - mel.shape[1]) <= 1


def test_midi_to_audio_fluidsynth(tmp_path):
    from gandes_tpu.music.synth import midi_to_audio_fluidsynth

    midi_path = str(tmp_path / "tone.mid")
    _tone_midi().save(midi_path)
    wav_path = str(tmp_path / "tone22.wav")
    midi_to_audio_fluidsynth(midi_path, wav_path, "FluidR3_GM.sf2")
    audio, sr = load_wav(wav_path)
    assert sr == 22050  # the reference wrapper renders at 22050 (util.py:126)
    assert len(audio) > sr // 2 and np.abs(audio).max() > 1e-3


def test_matrix_to_wav_shapes_and_determinism(tmp_path, monkeypatch):
    from gandes_tpu.bridge import matrix_to_wav

    monkeypatch.chdir(tmp_path)
    rng = np.random.RandomState(3)
    mats = rng.rand(2, 20, 20).astype(np.float32)
    # a customer count that finishes well under the 0.5 s wall budget makes
    # the pipeline deterministic (max_sim_time is wall-clock — quirk)
    np.random.seed(11)
    a = np.asarray(matrix_to_wav(mats, size=20, start=0, end=216, number_of_customers=150))
    np.random.seed(11)
    b = np.asarray(matrix_to_wav(mats, size=20, start=0, end=216, number_of_customers=150))
    assert a.shape == (2, 128, 216)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a).sum() > 0
    # accepts the trainer's `overwrite` kwarg (SIMNN.py:301 fix)
    np.random.seed(11)
    matrix_to_wav(mats[:1], size=20, start=0, end=216, overwrite=True,
                  number_of_customers=150)
    assert os.path.exists("adj_sim_outputs/wav/output_0.wav")


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_sim_to_wav_midi_parity(tmp_path, monkeypatch):
    """Run the reference SIMULATOR/simulation_to_wav.py (FluidSynth stubbed,
    mido backed by our codec) vs our sim_to_wav on identical RNG streams;
    the decoded MIDI must match byte-for-byte."""
    import logging

    from test_music_pipeline import _install_reference_shims

    _install_reference_shims()
    m2a = types.ModuleType("midi2audio")

    class FluidSynth:
        def __init__(self, *a, **k):
            pass

        def midi_to_audio(self, midi_path, wav_path):
            open(wav_path, "wb").write(b"")

    m2a.FluidSynth = FluidSynth
    sys.modules["midi2audio"] = m2a
    p = "/root/reference/SIMULATOR"
    if p not in sys.path:
        sys.path.insert(0, p)
    sys.modules.pop("simulation_to_wav", None)
    import importlib

    ref = importlib.import_module("simulation_to_wav")

    # numpy 2 raises on the reference's `ndarray != []` check inside its
    # MidiGenerator; route the internal call through lists (same values)
    orig_pal = ref.process_adjsim_log
    ref.process_adjsim_log = lambda **kw: orig_pal(
        **{k: (list(v) if isinstance(v, np.ndarray) else v) for k, v in kw.items()}
    )

    from gandes_tpu.bridge import sim_to_wav

    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    os.makedirs("adj_sim_outputs/midi", exist_ok=True)
    os.makedirs("adj_sim_outputs/wav", exist_ok=True)

    for h in logging.root.handlers[:]:
        logging.root.removeHandler(h)

    np.random.seed(99)
    ref.sim_to_wav(matrices=[None], size=32, use_same_instrument=3)
    for h in logging.root.handlers[:]:
        logging.root.removeHandler(h)
    ref_mid = open("adj_sim_outputs/midi/output.mid", "rb").read()
    os.rename("adj_sim_outputs/midi/output.mid", "adj_sim_outputs/midi/ref.mid")

    np.random.seed(99)
    sim_to_wav(matrices=[None], size=32, use_same_instrument=3,
               out_dir="adj_sim_outputs_ours")
    our_mid = open("adj_sim_outputs_ours/midi/output.mid", "rb").read()
    assert our_mid == ref_mid
    assert len(our_mid) > 50
    # and the wav artifact is real audio
    w, sr = load_wav("adj_sim_outputs_ours/wav/output_0.wav")
    assert sr == 44100 and len(w) > 0


def test_render_fixed_buffer_slice_equals_per_length():
    """The non-CPU single-program render (max-length buffer + slice) must be
    bit-identical to a per-length render — checked here by comparing
    _render(L)[:] with _render(L_big)[:L] on the CPU backend."""
    import jax
    import jax.numpy as jnp

    from gandes_tpu.music.synth import _render

    E, W, sr = 64, 4096, 8000
    rng = np.random.RandomState(0)
    notes = jnp.asarray(rng.randint(40, 90, E), jnp.int32)
    vels = jnp.asarray(rng.randint(1, 127, E), jnp.float32)
    ons = jnp.asarray(rng.rand(E) * 1.2, jnp.float32)
    offs = ons + jnp.asarray(rng.rand(E) * 0.4, jnp.float32)
    progs = jnp.asarray(rng.randint(0, 100, E), jnp.int32)

    L = 1 << 14
    a = _render(notes, vels, ons, offs, progs, jnp.int32(E), L, W, sr)
    b = _render(notes, vels, ons, offs, progs, jnp.int32(E), 1 << 16, W, sr)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b)[:L])


def test_play_wav_headless(tmp_path, monkeypatch):
    """--play degrades gracefully: plays through pygame when a (dummy)
    device exists, returns False instead of raising when none does."""
    import numpy as np

    from gandes_tpu.data.audio import play_wav, save_wav

    p = str(tmp_path / "t.wav")
    save_wav(p, np.sin(np.linspace(0, 880 * 3.14, 2205)).astype(np.float32))
    monkeypatch.setenv("SDL_AUDIODRIVER", "dummy")
    assert play_wav(p) is True
    monkeypatch.setenv("SDL_AUDIODRIVER", "nonexistent-driver")
    import pygame

    pygame.mixer.quit()
    assert play_wav(p) in (True, False)  # False headless; True if a system
    # player binary happens to exist
