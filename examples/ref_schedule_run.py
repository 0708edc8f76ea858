"""Reference-schedule MM-GAN training run (VERDICT r2 item 3).

Matches the reference's demonstrated data/step scale
(`MMGAN_MIDI_DES/losses/gen_losses_epoch_1.pkl`: 337 steps/epoch x batch 16
on 5,392 MAESTRO windows, trained to epoch 36+): builds a 5,392-window
corpus with the repo's own tooling (random DES networks -> MIDI ->
50-step piano-roll windows — MAESTRO itself is absent from the reference
mount), then trains MM-GAN in surrogate mode for 40 epochs = 13,480 steps,
checkpointing every epoch. Resumable (orbax full-state resume; re-running
the script continues from the newest epoch checkpoint).

Usage: python examples/ref_schedule_run.py WORKDIR [epochs]
         [--instance-noise S] [--instance-noise-anneal E] [--r1-gamma G]
         [--moment-match L] [--seed N] [--recycle-every N] [--np-seed N]

The optional flags are the round-4/5 adversarial-balance knobs (VERDICT r3
#5: at this scale the D wins by ~epoch 12 at d_lr=1e-4 and G's location
statistics drift during the D-dominated phase); defaults reproduce the
round-3 run exactly.

``--recycle-every N`` (VERDICT r4 #5) runs the schedule in N-epoch chunks,
each in a FRESH subprocess resuming from the newest checkpoint (orbax
resume is exact; jax streams continue via the step counter) and records
each chunk's peak RSS to ``WORKDIR/recycle_rss.json`` — the bounded-RSS
demonstration at refsched scale: the axon client leaks ~the bytes of every
h2d transfer in client RSS (PARITY.md "axon h2d transfer leak"), so a
single-process run grows without bound while recycling resets the
envelope every chunk. The global numpy stream (DES routing) cannot be
checkpointed across processes; each chunk gets a deterministic
chunk-derived ``--np-seed``, mirroring the CLI's ``--recycle-every``.
"""

from __future__ import annotations

import os
import pickle
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the reference's window count (337 x 16); env-overridable so tests can
# drive the full script (incl. the recycle chunk driver) on a tiny corpus
TARGET_WINDOWS = int(os.environ.get("GANDES_REFSCHED_WINDOWS", "5392"))
STEPS_PER_EPOCH = int(os.environ.get("GANDES_REFSCHED_STEPS", "337"))


def build_corpus(workdir: str) -> str:
    from gandes_tpu.bridge.sim_demo import sim_to_wav
    from gandes_tpu.data.datasets import build_window_pickle

    pkl = os.path.join(workdir, "windows.pkl")
    if os.path.exists(pkl):
        with open(pkl, "rb") as f:
            n = len(pickle.load(f))
        if n >= TARGET_WINDOWS:
            print(f"corpus: reusing {pkl} ({n} windows)", flush=True)
            return pkl
    midi_dir = os.path.join(workdir, "midis")
    os.makedirs(midi_dir, exist_ok=True)
    os.makedirs(os.path.join(workdir, "logs"), exist_ok=True)
    t0 = time.perf_counter()
    seed, n = 0, 0
    # windows/net varies (~4.3 avg); generate in chunks until the pickle
    # crosses the reference's count
    while n < TARGET_WINDOWS:
        chunk_end = seed + 256
        while seed < chunk_end:
            np.random.seed(seed)
            out = os.path.join(workdir, f"net_{seed}")
            sim_to_wav(matrices=[None], size=32, use_same_instrument=seed % 16,
                       log_path=os.path.join(workdir, "logs") + "/",
                       out_dir=out, render=False)
            os.replace(os.path.join(out, "midi", "output.mid"),
                       os.path.join(midi_dir, f"net_{seed}.mid"))
            seed += 1
        n = build_window_pickle(midi_dir, pkl, sequence_length=50)
        print(f"corpus: {seed} nets -> {n} windows "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
    return pkl


def _run_recycled(args):
    """Run the schedule in ``--recycle-every``-epoch chunks, each a fresh
    subprocess of this script resuming from the newest checkpoint, and
    record each chunk's peak RSS (parsed from its DONE line) to
    ``WORKDIR/recycle_rss.json`` — the bounded-RSS envelope table."""
    import json
    import re
    import subprocess

    chunk, total = args.recycle_every, args.epochs
    base = [sys.executable, os.path.abspath(__file__), args.workdir]
    passthru = []
    for flag, val in (("--instance-noise", args.instance_noise),
                      ("--instance-noise-anneal", args.instance_noise_anneal),
                      ("--instance-noise-floor", args.instance_noise_floor),
                      ("--r1-gamma", args.r1_gamma),
                      ("--moment-match", args.moment_match),
                      ("--moment-match-cond", args.moment_match_cond),
                      ("--seed", args.seed)):
        if val not in (None, 0.0, 0):
            passthru += [flag, str(val)]
    if args.r1_gamma:
        passthru += ["--r1-mode", args.r1_mode, "--r1-fd-eps",
                     str(args.r1_fd_eps)]

    chunks = []
    target = chunk
    while True:
        target = min(target, total)
        np_seed = 1_000_003 * (args.np_seed or 0) + target
        cmd = base + [str(target), "--np-seed", str(np_seed)] + passthru
        print(f"[recycle] chunk -> epoch {target}: {' '.join(cmd[1:])}",
              flush=True)
        proc = subprocess.run(cmd, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
        sys.stdout.write(proc.stdout)
        sys.stdout.flush()
        if proc.returncode != 0:
            raise SystemExit(proc.returncode)
        m = re.search(r"DONE: (\d+) steps in (\d+)s .*max RSS (\d+) MB",
                      proc.stdout)
        chunks.append({"to_epoch": target, "np_seed": np_seed,
                       "steps": int(m.group(1)) if m else None,
                       "wall_s": int(m.group(2)) if m else None,
                       "max_rss_mb": int(m.group(3)) if m else None})
        with open(os.path.join(args.workdir, "recycle_rss.json"), "w") as f:
            json.dump({"chunk_epochs": chunk, "chunks": chunks}, f, indent=2)
        if target >= total:
            break
        target += chunk
    peak = max(c["max_rss_mb"] or 0 for c in chunks)
    print(f"[recycle] done: {len(chunks)} chunks, per-chunk peak RSS "
          f"{[c['max_rss_mb'] for c in chunks]} MB (envelope max {peak} MB)",
          flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("epochs", nargs="?", type=int, default=40)
    ap.add_argument("--instance-noise", type=float, default=0.0)
    ap.add_argument("--instance-noise-anneal", type=float, default=None)
    ap.add_argument("--instance-noise-floor", type=float, default=0.0)
    ap.add_argument("--r1-gamma", type=float, default=0.0)
    ap.add_argument("--r1-mode", choices=["exact", "fd"], default="exact")
    ap.add_argument("--r1-fd-eps", type=float, default=0.5)
    ap.add_argument("--moment-match", type=float, default=0.0)
    ap.add_argument("--moment-match-cond", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--recycle-every", type=int, default=None)
    ap.add_argument("--np-seed", type=int, default=None)
    args = ap.parse_args()
    workdir, epochs = args.workdir, args.epochs

    if args.recycle_every:
        return _run_recycled(args)

    os.makedirs(workdir, exist_ok=True)
    pkl = build_corpus(workdir)
    os.chdir(workdir)
    if args.np_seed is not None:
        # deterministic DES routing for THIS chunk: the simulator consumes
        # the global numpy stream, which cannot be checkpointed across
        # processes — recycle chunks each get an explicit derived seed
        # (mirrors cli.py --np-seed)
        np.random.seed(args.np_seed)

    from gandes_tpu.data.datasets import MaestroDatasetPickle
    from gandes_tpu.train.mmgan_loop import MMGANConfig, train_mmgan

    ds = MaestroDatasetPickle(os.path.basename(pkl), data_dir=".")
    cfg = MMGANConfig(
        batch_size=16, start=0, num_epochs=epochs, save_interval=1,
        g_update="surrogate", lr=1e-3, d_lr=1e-4,
        des_parallel=16, resume=True, print_interval=50, seed=args.seed,
        instance_noise_sigma=args.instance_noise,
        instance_noise_anneal_epochs=args.instance_noise_anneal,
        instance_noise_floor=args.instance_noise_floor,
        r1_gamma=args.r1_gamma, r1_mode=args.r1_mode,
        r1_fd_eps=args.r1_fd_eps, moment_match=args.moment_match,
        moment_match_cond=args.moment_match_cond,
    )

    # RSS watcher: one line per 2 min so the run log itself shows whether
    # memory stays flat across thousands of DES round trips
    import threading

    def _rss_watch():
        while True:
            time.sleep(120)
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        print(f"[rss] {line.split()[1]} kB "
                              f"t={time.perf_counter() - t0:.0f}s", flush=True)
                        break

    t0 = time.perf_counter()
    threading.Thread(target=_rss_watch, daemon=True).start()
    # steps_per_epoch pins BOTH the epoch length and the StepLR(30, 0.1)
    # boundary to the reference's 337-step epochs (the corpus generator
    # overshoots the window target by up to a chunk, so len(loader) > 337)
    state, hist = train_mmgan(ds, cfg, steps_per_epoch=STEPS_PER_EPOCH,
                              max_batches=STEPS_PER_EPOCH)
    wall = time.perf_counter() - t0
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    n_steps = sum(len(e) for e in hist["disc"])
    print(f"DONE: {n_steps} steps in {wall:.0f}s "
          f"({wall / max(n_steps, 1):.2f} s/step), max RSS {rss_mb:.0f} MB",
          flush=True)


if __name__ == "__main__":
    main()
