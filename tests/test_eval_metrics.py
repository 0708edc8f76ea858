"""Music-quality metrics (eval/metrics.py): values checked against
hand-computed numpy on structured rolls; batched/jitted path sanity."""

import numpy as np

from gandes_tpu.eval.metrics import (
    compare_distributions,
    mel_metrics,
    pitch_class_histogram,
    roll_metrics,
)


def _roll_with_notes():
    """One sample: note 60 vel 100 at t=3 lasting 4 steps; note 64 vel 50
    at t=10 lasting 2; plus an all-zero sample."""
    r = np.zeros((2, 2, 128, 50), np.float32)
    r[0, 0, 60, 3] = 100.0
    r[0, 1, 60, 3:7] = 4.0
    r[0, 0, 64, 10] = 50.0
    r[0, 1, 64, 10:12] = 2.0
    return r


def test_roll_metrics_values():
    m = {k: np.asarray(v) for k, v in roll_metrics(_roll_with_notes()).items()}
    assert m["note_density"][0] == 2 / (128 * 50)
    assert m["empty"].tolist() == [0.0, 1.0]
    np.testing.assert_allclose(m["pitch_mean"][0], 62.0)
    np.testing.assert_allclose(m["pitch_std"][0], 2.0)
    np.testing.assert_allclose(m["velocity_mean"][0], 75.0)
    np.testing.assert_allclose(m["velocity_std"][0], 25.0)
    # 6 painted cells at durations 4,4,4,4,2,2 -> mean 10/3... (4*4+2*2)/6
    np.testing.assert_allclose(m["duration_mean"][0], (4 * 4 + 2 * 2) / 6)
    # active steps: 3..6 and 10..11 -> 6 steps, 6 sounding cells -> 1.0
    np.testing.assert_allclose(m["polyphony"][0], 1.0)
    # empty sample: all-safe denominators, zeros
    assert m["note_density"][1] == 0.0 and m["polyphony"][1] == 0.0


def test_pitch_class_histogram():
    h = np.asarray(pitch_class_histogram(_roll_with_notes()))
    assert h.shape == (2, 12)
    np.testing.assert_allclose(h[0, 60 % 12], 0.5)
    np.testing.assert_allclose(h[0, 64 % 12], 0.5)
    np.testing.assert_allclose(h[0].sum(), 1.0)
    np.testing.assert_allclose(h[1], 0.0)


def test_mel_metrics_and_compare():
    rng = np.random.RandomState(0)
    mels = rng.rand(3, 128, 216).astype(np.float32) * -40
    m = {k: np.asarray(v) for k, v in mel_metrics(mels).items()}
    np.testing.assert_allclose(m["db_mean"], mels.mean(axis=(1, 2)), rtol=1e-5)
    assert np.all(m["centroid"] >= 0) and np.all(m["centroid"] <= 127)
    assert np.all(m["flux"] > 0)

    a = roll_metrics(_roll_with_notes())
    b = roll_metrics(_roll_with_notes())
    a = dict(a, pitch_classes=pitch_class_histogram(_roll_with_notes()))
    b = dict(b, pitch_classes=pitch_class_histogram(_roll_with_notes()))
    gaps = compare_distributions(a, b)
    assert gaps["pitch_class_l1"] == 0.0
    assert all(v == 0.0 for v in gaps.values())


def test_collect_real_mels_balances_across_files(tmp_path):
    """The eval real side draws round-robin across the directory's MIDIs
    and counts slices only AFTER the short-render filter — a take-until-n
    loop over-weighted the first file(s) (review finding)."""
    from gandes_tpu.data.datasets import collect_real_mels
    from gandes_tpu.music.midi import (Message, MetaMessage, MidiFile,
                                       MidiTrack)

    def write_midi(path, note, n_notes, dur=2.0):
        mid = MidiFile(type=0, ticks_per_beat=480)
        tr = MidiTrack()
        tr.append(MetaMessage("set_tempo", tempo=500000, time=0))
        for i in range(n_notes):
            tr.append(Message("note_on", note=note, velocity=90,
                              time=0 if i == 0 else int(960 * dur)))
            tr.append(Message("note_off", note=note, velocity=0,
                              time=int(960 * dur)))
        tr.append(MetaMessage("end_of_track", time=0))
        mid.tracks.append(tr)
        mid.save(str(path))

    # three files long enough for multiple 5 s slices each
    for k, note in enumerate((48, 60, 72)):
        write_midi(tmp_path / f"f{k}.mid", note, n_notes=5)
    mels, n_files = collect_real_mels(str(tmp_path), 6)
    assert mels.shape[0] == 6
    assert n_files == 3  # every file contributes, not just the first
    # determinism (seeded slice subsampling)
    mels2, _ = collect_real_mels(str(tmp_path), 6)
    np.testing.assert_array_equal(mels, mels2)
