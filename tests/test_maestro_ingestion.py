"""Real-MAESTRO ingestion path against a mock maestro-v3.0.0 layout
(VERDICT r3 missing #3): MAESTRO itself is absent from the reference mount,
so nothing had ever validated the directory-discovery/pickling path a real
MAESTRO user hits first. This builds the v3.0.0 on-disk shape —
``maestro-v3.0.0/<year>/*.midi`` (note the ``.midi`` extension; the
reference's glob is ``data\\maestro-v3.0.0\\**\\*.midi``,
`MMGAN_MIDI_DES/datasets.py:108` — Windows-only separators, one more
reference quirk this port does NOT reproduce) — and drives discovery,
on-the-fly rasterization, the offline pickler, and the CLI end to end.
"""

import os
import pickle
import shutil
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def maestro_dir(tmp_path_factory):
    """data/maestro-v3.0.0/<year>/*.midi built from simulator output."""
    root = tmp_path_factory.mktemp("mock_maestro")
    base = root / "data" / "maestro-v3.0.0"
    cwd = os.getcwd()
    os.chdir(root)
    try:
        os.makedirs("logs", exist_ok=True)
        from gandes_tpu.bridge.sim_demo import sim_to_wav

        np.random.seed(1234)
        for i, year in enumerate(("2004", "2006", "2018")):
            sim_to_wav(matrices=[None], size=32, use_same_instrument=i,
                       out_dir=f"gen_{i}", render=False)
            d = base / year
            d.mkdir(parents=True, exist_ok=True)
            # MAESTRO names carry dots/underscores and the .midi extension
            shutil.move(
                f"gen_{i}/midi/output.mid",
                d / f"MIDI-Unprocessed_{i:02d}_R1_2004_01-04_ORIG_MID--AUDIO_{i}.midi",
            )
    finally:
        os.chdir(cwd)
    # the metadata json MAESTRO ships alongside (not consumed by the MM-GAN
    # path, but its presence must not confuse the recursive glob)
    (base / "maestro-v3.0.0.json").write_text("{}")
    return base


def test_discovery_and_on_the_fly_rasterization(maestro_dir):
    from gandes_tpu.data.datasets import MaestroDatasetMidi

    ds = MaestroDatasetMidi(str(maestro_dir), sequence_length=100,
                            beats_length=50)
    assert len(ds) == 3, ds.file_list
    # sorted, nested one level under year dirs, .midi matched by *.mid*
    assert [os.path.basename(os.path.dirname(p)) for p in ds.file_list] == [
        "2004", "2006", "2018"]
    assert all(p.endswith(".midi") for p in ds.file_list)
    roll, durations, beats = ds[0]
    assert roll.shape == (128, 100) and durations.shape == (128, 100)
    assert beats.shape == (50,)
    assert roll.max() > 0  # the simulator MIDIs carry real notes


def test_pickler_over_maestro_layout(maestro_dir, tmp_path):
    from gandes_tpu.data.datasets import MaestroDatasetPickle, build_window_pickle

    out = str(tmp_path / "preprocessed_data_50.pkl")
    n = build_window_pickle(str(maestro_dir), out, sample_size=300,
                            sequence_length=50)
    assert n > 0
    with open(out, "rb") as f:
        windows = pickle.load(f)
    assert len(windows) == n
    ds = MaestroDatasetPickle(os.path.basename(out), data_dir=str(tmp_path))
    roll, dur, beats = ds[0]
    assert np.asarray(roll).shape == (128, 50)
    assert np.asarray(beats).shape == (50,)


def test_pickler_scale_paths_on_multiminute_corpus(tmp_path):
    """MAESTRO-like volume slice (VERDICT r4 #7): multi-minute files built
    by time-concatenating simulator MIDIs (examples/ingest_bench.py's
    corpus builder — the measured-throughput harness), pickled through all
    three paths (sequential / process-pool workers / device kernel) with
    byte-identical outputs. The full ~200-file measurement lives in
    docs/RESULTS.md; this pins the code paths green at a bounded size."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))
    from ingest_bench import build_corpus

    from gandes_tpu.data.datasets import build_window_pickle

    root, total_bytes = build_corpus(str(tmp_path), n_files=8, concat=4,
                                     n_base=8)
    files = [f for f in os.listdir(os.path.join(root, "2004"))
             if f.endswith(".midi")]
    assert files, "corpus builder wrote no .midi under the year dir"
    sizes = [os.path.getsize(os.path.join(root, "2004", f)) for f in files]
    assert max(sizes) > 30_000, sizes  # multi-minute (~4x a single sim MIDI)

    outs = {}
    for mode, kw in (("seq", {}), ("workers", {"workers": 2}),
                     ("device", {"device_rasterize": True})):
        out = str(tmp_path / f"{mode}.pkl")
        n = build_window_pickle(root, out, sequence_length=50, **kw)
        assert n > 0
        with open(out, "rb") as f:
            outs[mode] = pickle.load(f)
    assert len(outs["seq"]) == len(outs["workers"]) == len(outs["device"])
    for a, b in zip(outs["seq"], outs["workers"]):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for a, b in zip(outs["seq"], outs["device"]):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_cli_pickle_dataset_over_maestro_layout(maestro_dir, tmp_path):
    """The exact first command a MAESTRO user runs."""
    out = str(tmp_path / "cli.pkl")
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [repo, env.get("PYTHONPATH", "")] if p)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-m", "gandes_tpu.cli", "pickle-dataset",
         "--midi-root", str(maestro_dir), "--out", out,
         "--sequence-length", "50"],
        env=env, text=True, capture_output=True, timeout=420)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    with open(out, "rb") as f:
        windows = pickle.load(f)
    assert len(windows) > 0
    # identical to the library path on the same corpus
    from gandes_tpu.data.datasets import build_window_pickle

    ref = str(tmp_path / "lib.pkl")
    build_window_pickle(str(maestro_dir), ref, sequence_length=50)
    with open(ref, "rb") as f:
        ref_windows = pickle.load(f)
    assert len(windows) == len(ref_windows)
    for (a1, a2, a3), (b1, b2, b3) in zip(windows, ref_windows):
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(b1))
        np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))
        np.testing.assert_array_equal(np.asarray(a3), np.asarray(b3))
