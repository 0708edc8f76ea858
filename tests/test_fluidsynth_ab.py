"""FluidSynth A/B harness (VERDICT r2 #4b).

Ground truth for the SF2 renderer is the real FluidSynth binary the
reference shelled out to (`GAN_DES/matrix_sim_process.py:114-125`). This
environment ships neither the binary nor a real font (the A/B test SKIPS
here, by design) — on any box with `fluidsynth` on PATH the same suite
runs the real comparison. The harness-shape tests below run everywhere.
"""

import numpy as np
import pytest

from gandes_tpu.eval.fluidsynth_ab import (
    PASS_MEL_DB,
    PASS_ONSET_MS,
    default_ab_midi,
    find_fluidsynth,
    fluidsynth_ab,
)


def test_default_ab_midi_is_renderable(tmp_path):
    """The built-in test piece round-trips through the SMF codec and our
    synth (so the A/B can never fail on its own input material)."""
    from gandes_tpu.music.midi import MidiFile
    from gandes_tpu.music.sf2 import G_SAMPLE_MODES, Sf2Synth, build_sf2

    p = str(tmp_path / "ab.mid")
    default_ab_midi().save(p)
    mid = MidiFile(p)
    n_on = sum(1 for tr in mid.tracks for msg in tr
               if msg.type == "note_on" and msg.velocity > 0)
    assert n_on == 8

    font = str(tmp_path / "f.sf2")
    build_sf2(font, samples=[{"name": "s", "data": np.sin(
        2 * np.pi * np.arange(2000) / 50).astype(np.float32) * 0.5,
        "sample_rate": 22050, "original_pitch": 60,
        "loop_start": 200, "loop_end": 1800}],
        instruments=[{"name": "i", "zones": [
            {"sample": 0, "gens": {G_SAMPLE_MODES: 1}}]}],
        presets=[{"name": "p", "program": 0, "zones": [{"instrument": 0}]}])
    audio = Sf2Synth(font).render_midi(mid, sr=22050)
    assert np.all(np.isfinite(audio)) and float(np.abs(audio).max()) > 1e-4


def test_missing_binary_raises(monkeypatch, tmp_path):
    monkeypatch.setenv("PATH", str(tmp_path))       # no fluidsynth here
    monkeypatch.delenv("GANDES_FLUIDSYNTH", raising=False)
    assert find_fluidsynth() is None
    with pytest.raises(FileNotFoundError, match="fluidsynth"):
        fluidsynth_ab("whatever.sf2")


@pytest.mark.skipif(find_fluidsynth() is None,
                    reason="no fluidsynth binary in this environment "
                           "(A/B runs where one exists — by design)")
def test_ab_against_real_fluidsynth(tmp_path):
    """The real comparison: our render vs the binary on the same font+MIDI.
    Runs on any machine with FluidSynth installed; auto-skips here."""
    from gandes_tpu.music.sf2 import G_HOLD_VOL, G_SAMPLE_MODES, build_sf2

    font = str(tmp_path / "f.sf2")
    build_sf2(font, samples=[{"name": "s", "data": np.sin(
        2 * np.pi * np.arange(4000) / 50).astype(np.float32) * 0.5,
        "sample_rate": 44100, "original_pitch": 60,
        "loop_start": 400, "loop_end": 3600}],
        instruments=[{"name": "i", "zones": [
            {"sample": 0, "gens": {G_SAMPLE_MODES: 1, G_HOLD_VOL: 2786}}]}],
        presets=[{"name": "p", "program": 0, "zones": [{"instrument": 0}]}])
    report = fluidsynth_ab(font)
    assert report["mel_l1_db"] <= PASS_MEL_DB, report
    assert report["onset_delta_ms"] <= PASS_ONSET_MS, report
    assert report["ok"], report
