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
         [--moment-match L] [--seed N]

The optional flags are the round-4 adversarial-balance knobs (VERDICT r3
#5: at this scale the D wins by ~epoch 12 at d_lr=1e-4 and G's location
statistics drift during the D-dominated phase); defaults reproduce the
round-3 run exactly.
"""

from __future__ import annotations

import os
import pickle
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGET_WINDOWS = 5392        # the reference's window count (337 x 16)
STEPS_PER_EPOCH = 337


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
    args = ap.parse_args()
    workdir, epochs = args.workdir, args.epochs
    os.makedirs(workdir, exist_ok=True)
    pkl = build_corpus(workdir)
    os.chdir(workdir)

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
