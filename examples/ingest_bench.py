"""MAESTRO-scale ingestion throughput (VERDICT r4 #7 / BASELINE.md
"piano-roll preprocessing MB/s measured vs reference pickler").

The reference pickles its training windows from MAESTRO v3.0.0 (~1,276
files / 81 MB of MIDI, `MMGAN_MIDI_DES/datasets.py:103-123` + notebook
cell 11) with a sequential per-file mido loop. MAESTRO itself is absent
from the mount, so this harness builds a synthetic corpus AT THAT SHAPE —
``data/maestro-v3.0.0/<year>/*.midi``, N multi-minute files built by
time-concatenating simulator-generated MIDIs (each base piece comes from
the repo's own DES -> MidiGenerator pipeline; concatenation approximates
MAESTRO's per-file length, which is what bounds the parse cost) — then
measures ``build_window_pickle`` end to end:

* sequential host path (the reference-equivalent algorithm),
* ``--workers N`` process-pool parse/extract + device-kernel rasterize,
* ``--device-rasterize`` single-process batched device kernel.

All three produce byte-identical pickles (pinned here and by
``tests/test_training_loops.py::test_pickler_fast_paths_match``); the
output is one JSON line per mode with MB/s over the corpus bytes.

Usage: python examples/ingest_bench.py WORKDIR [n_files] [concat] [workers]
"""

from __future__ import annotations

import glob
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(workdir: str, n_files: int, concat: int, n_base: int = 40):
    """data/maestro-v3.0.0/<year>/*.midi from concatenated sim MIDIs
    (the repo's own SMF codec — mido is a reference dep, not baked in)."""
    from gandes_tpu.bridge.sim_demo import sim_to_wav
    from gandes_tpu.music.midi import MetaMessage, MidiFile, MidiTrack

    base_dir = os.path.join(workdir, "base")
    os.makedirs(base_dir, exist_ok=True)
    os.makedirs(os.path.join(workdir, "logs"), exist_ok=True)
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        for i in range(n_base):
            out = os.path.join("base", f"net_{i}")
            if os.path.exists(os.path.join(out, "midi", "output.mid")):
                continue
            np.random.seed(10_000 + i)
            sim_to_wav(matrices=[None], size=32, use_same_instrument=i % 16,
                       log_path="logs/", out_dir=out, render=False)
    finally:
        os.chdir(cwd)
    bases = [MidiFile(os.path.join(base_dir, f"net_{i}", "midi", "output.mid"))
             for i in range(n_base)]

    root = os.path.join(workdir, "data", "maestro-v3.0.0")
    rng = np.random.RandomState(7)
    total_bytes = 0
    for f in range(n_files):
        year = str(2004 + (f % 15))
        d = os.path.join(root, year)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(
            d, f"MIDI-Unprocessed_{f:04d}_R1_ORIG_MID--AUDIO_{f}.midi")
        if not os.path.exists(path):
            out = MidiFile(ticks_per_beat=bases[0].ticks_per_beat)
            track = MidiTrack()
            out.tracks.append(track)
            for j in rng.choice(n_base, size=concat, replace=False):
                for msg in bases[j].tracks[0]:
                    if msg.type == "end_of_track":
                        continue
                    track.append(msg)
            track.append(MetaMessage("end_of_track", time=0))
            out.save(path)
        total_bytes += os.path.getsize(path)
    with open(os.path.join(root, "maestro-v3.0.0.json"), "w") as fh:
        fh.write("{}")
    return root, total_bytes


def main():
    workdir = sys.argv[1]
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    concat = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    workers = int(sys.argv[4]) if len(sys.argv) > 4 else max(2, os.cpu_count())
    os.makedirs(workdir, exist_ok=True)

    t0 = time.perf_counter()
    root, total_bytes = build_corpus(workdir, n_files, concat)
    n_found = len(glob.glob(os.path.join(root, "**", "*.mid*"), recursive=True))
    print(f"corpus: {n_found} files, {total_bytes / 1e6:.1f} MB "
          f"({time.perf_counter() - t0:.0f}s to build)", flush=True)

    from gandes_tpu.data.datasets import build_window_pickle

    results = {}
    digests = {}
    for mode, kw in (
        ("sequential", {}),
        (f"workers{workers}", {"workers": workers}),
        ("device_rasterize", {"device_rasterize": True}),
    ):
        out_pkl = os.path.join(workdir, f"windows_{mode}.pkl")
        t0 = time.perf_counter()
        n = build_window_pickle(root, out_pkl, sequence_length=50, **kw)
        dt = time.perf_counter() - t0
        results[mode] = {"windows": n, "seconds": round(dt, 2),
                         "mb_per_s": round(total_bytes / 1e6 / dt, 3)}
        with open(out_pkl, "rb") as fh:
            data = pickle.load(fh)
        import hashlib

        h = hashlib.sha256()
        for roll, dur, beats in data:
            h.update(np.ascontiguousarray(roll).tobytes())
            h.update(np.ascontiguousarray(dur).tobytes())
            h.update(np.ascontiguousarray(beats).tobytes())
        digests[mode] = h.hexdigest()
        print(json.dumps({"mode": mode, **results[mode]}), flush=True)
    assert len(set(digests.values())) == 1, f"pickles diverge: {digests}"
    print(json.dumps({
        "corpus_files": n_found, "corpus_mb": round(total_bytes / 1e6, 1),
        "identical_outputs": True, "results": results}), flush=True)


if __name__ == "__main__":
    main()
