"""Committed golden render digests for the SF2 synth (VERDICT r2 #4a).

Every other sf2 test compares the compiled render against a host mirror
written from the same reading of the spec — which pins kernel-vs-mirror
consistency but lets kernel+mirror drift *together* silently. These tests
compare against digests FROZEN IN GIT (tests/goldens/sf2_goldens.json):
any behavior change to the renderer fails here even when the mirrors move
with it. The measurements are numpy-only (no reuse of the repo's own mel
front-end), so the checker cannot co-drift with the code under test.

Each case renders a deterministic fixture font + MIDI on CPU and checks
  * the SHA-256 of the float32 PCM bytes (exact behavior pin), and
  * coarse spectral stats (RMS, peak, onset, 4 log-band energies) with
    tolerance — the diagnostic layer that says HOW the render moved when
    the hash breaks (e.g. after an XLA upgrade changes fusion: re-bless
    with --regen after reviewing the stat deltas).

Regenerate (after an intentional behavior change, reviewing the diff):
    python tests/test_sf2_goldens.py --regen
"""

import hashlib
import json
import os

import numpy as np
import pytest

from gandes_tpu.music import sf2 as m
from gandes_tpu.music.midi import Message, MetaMessage, MidiFile, MidiTrack
from gandes_tpu.music.sf2 import Sf2Synth, build_sf2

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "sf2_goldens.json")
SR = 22050


def _midi(notes, program=None):
    """notes: (key, vel, on_s, off_s). 1 tick = 1/960 s at the set tempo."""
    mid = MidiFile(type=0, ticks_per_beat=480)
    tr = MidiTrack()
    tr.append(MetaMessage("set_tempo", tempo=500000, time=0))
    events = []
    if program is not None:
        events.append((0.0, Message("program_change", program=program)))
    for key, vel, on, off in notes:
        events.append((on, Message("note_on", note=key, velocity=vel)))
        events.append((off, Message("note_off", note=key, velocity=0)))
    events.sort(key=lambda e: e[0])
    t_prev = 0.0
    for t, msg in events:
        msg.time = int(round((t - t_prev) * 960))
        tr.append(msg)
        t_prev = t_prev + msg.time / 960.0
    tr.append(MetaMessage("end_of_track", time=0))
    mid.tracks.append(tr)
    return mid


def _sine(n, period, amp=0.5):
    return (amp * np.sin(2 * np.pi * np.arange(n) / period)).astype(np.float32)


def _noise(n, seed=0, amp=0.4):
    return (np.random.RandomState(seed).randn(n) * amp / 3).astype(np.float32)


def _font_plain_loop(path):
    build_sf2(path, samples=[{"name": "s", "data": _sine(2000, 50),
                              "sample_rate": SR, "original_pitch": 60,
                              "loop_start": 200, "loop_end": 1800}],
              instruments=[{"name": "i", "zones": [{"sample": 0, "gens": {
                  m.G_SAMPLE_MODES: 1, m.G_HOLD_VOL: 2786}}]}],
              presets=[{"name": "p", "program": 0,
                        "zones": [{"instrument": 0}]}])


def _font_dahdsr(path):
    build_sf2(path, samples=[{"name": "s", "data": _sine(2000, 50),
                              "sample_rate": SR, "original_pitch": 60,
                              "loop_start": 200, "loop_end": 1800}],
              instruments=[{"name": "i", "zones": [{"sample": 0, "gens": {
                  m.G_SAMPLE_MODES: 1, m.G_ATTACK_VOL: -2000,
                  m.G_HOLD_VOL: -3000, m.G_DECAY_VOL: -1000,
                  m.G_SUSTAIN_VOL: 200, m.G_RELEASE_VOL: -1500}}]}],
              presets=[{"name": "p", "program": 0,
                        "zones": [{"instrument": 0}]}])


def _font_filter_q(path):
    build_sf2(path, samples=[{"name": "n", "data": _noise(4000),
                              "sample_rate": SR, "original_pitch": 60,
                              "loop_start": 400, "loop_end": 3600}],
              instruments=[{"name": "i", "zones": [{"sample": 0, "gens": {
                  m.G_SAMPLE_MODES: 1, m.G_HOLD_VOL: 2786,
                  m.G_INITIAL_FILTER_FC: 7000, m.G_INITIAL_FILTER_Q: 300}}]}],
              presets=[{"name": "p", "program": 0,
                        "zones": [{"instrument": 0}]}])


def _font_lfos(path):
    build_sf2(path, samples=[{"name": "s", "data": _sine(2000, 50),
                              "sample_rate": SR, "original_pitch": 60,
                              "loop_start": 200, "loop_end": 1800}],
              instruments=[{"name": "i", "zones": [{"sample": 0, "gens": {
                  m.G_SAMPLE_MODES: 1, m.G_HOLD_VOL: 2786,
                  m.G_VIB_LFO_TO_PITCH: 80, m.G_DELAY_VIB_LFO: -1200,
                  m.G_MOD_LFO_TO_VOL: 80, m.G_PAN: 350}}]}],
              presets=[{"name": "p", "program": 0,
                        "zones": [{"instrument": 0}]}])


def _font_modenv(path):
    build_sf2(path, samples=[{"name": "n", "data": _noise(4000, seed=1),
                              "sample_rate": SR, "original_pitch": 60,
                              "loop_start": 400, "loop_end": 3600}],
              instruments=[{"name": "i", "zones": [{"sample": 0, "gens": {
                  m.G_SAMPLE_MODES: 1, m.G_HOLD_VOL: 2786,
                  m.G_MOD_ENV_TO_PITCH: 400, m.G_DECAY_MOD_ENV: -1500,
                  m.G_INITIAL_FILTER_FC: 6000,
                  m.G_MOD_ENV_TO_FILTER_FC: 2400,
                  m.G_MOD_LFO_TO_FILTER_FC: 600}}]}],
              presets=[{"name": "p", "program": 0,
                        "zones": [{"instrument": 0}]}])


def _font_effects(path):
    build_sf2(path, samples=[{"name": "s", "data": _sine(2000, 50),
                              "sample_rate": SR, "original_pitch": 60,
                              "loop_start": 200, "loop_end": 1800}],
              instruments=[{"name": "i", "zones": [{"sample": 0, "gens": {
                  m.G_SAMPLE_MODES: 1, m.G_HOLD_VOL: 2786,
                  m.G_REVERB_SEND: 500, m.G_CHORUS_SEND: 400}}]}],
              presets=[{"name": "p", "program": 0,
                        "zones": [{"instrument": 0}]}])


def _font_layers_excl(path):
    """Velocity-split zones, a pitched-up layer, and exclusiveClass choke."""
    build_sf2(path, samples=[
        {"name": "a", "data": _sine(1500, 40, 0.4), "sample_rate": SR,
         "original_pitch": 72},
        {"name": "b", "data": _sine(1500, 64, 0.4), "sample_rate": SR,
         "original_pitch": 60},
    ], instruments=[{"name": "i", "zones": [
        {"sample": 0, "vel_lo": 0, "vel_hi": 63, "gens": {
            m.G_HOLD_VOL: 2786, m.G_EXCLUSIVE_CLASS: 1}},
        {"sample": 1, "vel_lo": 64, "vel_hi": 127, "gens": {
            m.G_HOLD_VOL: 2786, m.G_EXCLUSIVE_CLASS: 1}},
    ]}], presets=[{"name": "p", "program": 0, "zones": [{"instrument": 0}]}])


def _font_full_matrix(path):
    """Every generator family the synth honors in one zone (the doctor
    render), pinned as a golden so the full composition can't drift."""
    gens = {m.G_SAMPLE_MODES: 1, m.G_HOLD_VOL: 1200,
            m.G_ATTACK_VOL: -6000, m.G_RELEASE_VOL: -3000, m.G_PAN: 200,
            m.G_INITIAL_FILTER_FC: 9000, m.G_INITIAL_FILTER_Q: 200,
            m.G_VIB_LFO_TO_PITCH: 50, m.G_MOD_LFO_TO_VOL: 60,
            m.G_MOD_ENV_TO_PITCH: 300, m.G_DECAY_MOD_ENV: -2000,
            m.G_MOD_ENV_TO_FILTER_FC: 1200, m.G_MOD_LFO_TO_FILTER_FC: 600,
            m.G_REVERB_SEND: 300, m.G_CHORUS_SEND: 300}
    build_sf2(path, samples=[{"name": "s", "data": _sine(2000, 50),
                              "sample_rate": SR, "original_pitch": 60,
                              "loop_start": 200, "loop_end": 1800}],
              instruments=[{"name": "i", "zones": [{"sample": 0,
                                                    "gens": gens}]}],
              presets=[{"name": "p", "program": 0,
                        "zones": [{"instrument": 0}]}])


CASES = {
    "plain_loop": (_font_plain_loop, [(60, 100, 0.0, 0.5)]),
    "dahdsr": (_font_dahdsr, [(60, 100, 0.0, 0.6), (67, 64, 0.2, 0.8)]),
    "filter_q": (_font_filter_q, [(60, 100, 0.0, 0.7)]),
    "lfos_pan": (_font_lfos, [(60, 100, 0.0, 0.9)]),
    "modenv_sweeps": (_font_modenv, [(60, 100, 0.0, 0.8)]),
    "effects_sends": (_font_effects, [(60, 100, 0.0, 0.4)]),
    "layers_exclusive": (_font_layers_excl,
                         [(60, 40, 0.0, 0.5), (60, 100, 0.25, 0.7),
                          (64, 100, 0.5, 0.9)]),
    "full_matrix": (_font_full_matrix,
                    [(60, 100, 0.0, 0.4), (67, 80, 0.1, 0.5)]),
}


def _render_case(name, tmpdir):
    build_font, notes = CASES[name]
    path = os.path.join(tmpdir, name + ".sf2")
    build_font(path)
    audio = Sf2Synth(path).render_midi(_midi(notes), sr=SR, min_seconds=1.0)
    return np.asarray(audio, np.float32)


def _measure(audio):
    """Numpy-only digest + coarse stats (independent of the repo's mel)."""
    a = np.asarray(audio, np.float32)
    spec = np.abs(np.fft.rfft(a.astype(np.float64))) ** 2
    edges = np.linspace(0, len(spec), 5).astype(int)  # 4 equal bands
    bands = [float(spec[lo:hi].sum()) for lo, hi in zip(edges, edges[1:])]
    onset = int(np.argmax(np.abs(a) > 1e-4)) if np.any(np.abs(a) > 1e-4) else -1
    return {
        "sha256": hashlib.sha256(a.tobytes()).hexdigest(),
        "n": int(a.size),
        "rms": float(np.sqrt(np.mean(a.astype(np.float64) ** 2))),
        "peak": float(np.abs(a).max()),
        "onset": onset,
        "bands": bands,
    }


def _load_goldens():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.mark.parametrize("name", sorted(CASES))
def test_sf2_render_matches_committed_golden(name, tmp_path):
    golden = _load_goldens().get(name)
    assert golden is not None, (
        f"no committed golden for case {name!r} — run "
        "`python tests/test_sf2_goldens.py --regen` and commit the diff")
    got = _measure(_render_case(name, str(tmp_path)))

    # diagnostic layer first: if the hash broke, these say how far it moved
    assert got["n"] == golden["n"]
    assert got["onset"] == golden["onset"], (
        f"{name}: onset moved {golden['onset']} -> {got['onset']}")
    np.testing.assert_allclose(got["rms"], golden["rms"], rtol=5e-3,
                               err_msg=f"{name}: RMS drifted")
    np.testing.assert_allclose(got["peak"], golden["peak"], rtol=5e-3,
                               err_msg=f"{name}: peak drifted")
    np.testing.assert_allclose(got["bands"], golden["bands"], rtol=2e-2,
                               err_msg=f"{name}: band energies drifted")

    assert got["sha256"] == golden["sha256"], (
        f"{name}: PCM digest changed (stats above are within tolerance — "
        "an exact-behavior drift, e.g. kernel+mirror moved together or an "
        "XLA upgrade changed fusion). Review, then re-bless with "
        "`python tests/test_sf2_goldens.py --regen`.")


def _regen():
    import tempfile

    import jax

    jax.config.update("jax_platforms", "cpu")  # goldens are CPU-pinned
    out = {}
    with tempfile.TemporaryDirectory() as td:
        for name in sorted(CASES):
            out[name] = _measure(_render_case(name, td))
            print(f"{name}: {out[name]['sha256'][:16]} rms={out[name]['rms']:.6f}")
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {GOLDEN_PATH}")


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        _regen()
    else:
        sys.exit("usage: python tests/test_sf2_goldens.py --regen")
