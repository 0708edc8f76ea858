"""End-to-end TPU training demo with measurable generator learning.

The reference's generators receive exactly zero gradient (SURVEY.md §5.1),
so its training can only drift. This script demonstrates the framework's
flagship improvement — ``g_update='surrogate'`` (a learned differentiable
DES surrogate fitted online, routing straight-through gradients to G) —
actually *reducing* the real-vs-generated distribution gap, end to end on
TPU with the DES in the loop:

1. synthesize a dataset of DES-generated MIDI (24 random queueing networks
   -> sim-to-wav -> 50-step piano-roll windows, no external data needed);
2. measure the initial real-vs-generated gap (eval/metrics.py);
3. train MM-GAN in surrogate mode;
4. re-measure and report.

Usage:  python examples/train_surrogate_demo.py [workdir] [epochs] [n_nets] [g_update]
``g_update`` defaults to 'surrogate'; pass 'reinforce' to run the
score-function mode through the same harness. Writes workdir/RESULTS.json
and prints a summary. Numbers from a real run are recorded in
docs/RESULTS.md.
"""

from __future__ import annotations

import json
import os
import sys

# runnable without an install step: `python examples/train_surrogate_demo.py`
# from anywhere finds the package at the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

if os.environ.get("GANDES_DEMO_CPU"):
    # the measurement is a differential training outcome — identical math
    # on any backend (device throughput is bench.py's job); pinning CPU
    # makes it reproducible anywhere incl. degraded-relay windows.
    # Per-CLAUDE.md quirk: force CPU via jax.config, not env alone.
    jax.config.update("jax_platforms", "cpu")


def build_dataset(workdir: str, n_nets: int = 24) -> str:
    from gandes_tpu.bridge.sim_demo import sim_to_wav
    from gandes_tpu.data.datasets import build_window_pickle

    midi_dir = os.path.join(workdir, "midis")
    os.makedirs(midi_dir, exist_ok=True)
    for seed in range(n_nets):
        np.random.seed(seed)
        out_dir = os.path.join(workdir, f"net_{seed}")
        sim_to_wav(matrices=[None], size=32, use_same_instrument=seed % 16,
                   log_path=os.path.join(workdir, "logs") + "/",
                   out_dir=out_dir, render=False)  # windows come from the
        # .mid; skipping the synth pass keeps the build CPU-cheap
        os.replace(os.path.join(out_dir, "midi", "output.mid"),
                   os.path.join(midi_dir, f"net_{seed}.mid"))
    pkl = os.path.join(workdir, "windows.pkl")
    n = build_window_pickle(midi_dir, pkl, sequence_length=50)
    print(f"dataset: {n} windows from {n_nets} simulated networks")
    return pkl


def generated_rolls(state, cfg, batch: int, seed: int, workdir: str):
    """Eval-mode G1/G2 -> DES (force_roll: decode past the save gate, no
    artifacts) -> (B, 2, 128, 50) rolls."""
    from gandes_tpu.bridge.mmgan_decode import matrix_to_midi
    from gandes_tpu.train.mmgan_loop import _eval_forward

    k = jax.random.key(seed)
    noise1 = jax.random.normal(jax.random.fold_in(k, 0), (batch, cfg.noise_dim))
    noise2 = jax.random.normal(jax.random.fold_in(k, 1), (batch, cfg.noise_dim))
    beats = jnp.zeros((batch, cfg.max_beat_length))
    out1, out2 = _eval_forward(cfg)(state.g_params, state.g_stats, noise1,
                                    noise2, beats, jax.random.key(0))
    rolls, failed = matrix_to_midi(
        np.asarray(out1)[:, None], np.asarray(out2), adj_size=cfg.adj_size,
        instrument=cfg.instrument, start=cfg.start,
        end=cfg.start + cfg.sequence_length, force_roll=True,
        log_path=os.path.join(workdir, "logs") + "/",
        out_dir=os.path.join(workdir, "eval_midi"), parallel=16,
    )
    return np.stack(rolls), failed


def gap(real_rolls, fake_rolls):
    from gandes_tpu.eval.metrics import (
        compare_distributions,
        pitch_class_histogram,
        roll_metrics,
    )

    rm = dict(roll_metrics(real_rolls)); rm["pitch_classes"] = pitch_class_histogram(real_rolls)
    fm = dict(roll_metrics(fake_rolls)); fm["pitch_classes"] = pitch_class_histogram(fake_rolls)
    return {k: float(v) for k, v in compare_distributions(rm, fm).items()}


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "surrogate_demo"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n_nets = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    g_update = sys.argv[4] if len(sys.argv) > 4 else "surrogate"
    d_lr = float(sys.argv[5]) if len(sys.argv) > 5 else None
    os.makedirs(os.path.join(workdir, "logs"), exist_ok=True)

    from gandes_tpu.data.datasets import MaestroDatasetPickle
    from gandes_tpu.train.mmgan_loop import MMGANConfig, init_state_for_config, train_mmgan

    pkl = build_dataset(workdir, n_nets)
    ds = MaestroDatasetPickle(pkl, data_dir=".")
    real = np.stack([np.stack([r, d]) for r, d, _ in
                     (ds[i] for i in range(min(64, len(ds))))])

    cfg = MMGANConfig(
        batch_size=16, start=0, sequence_length=50, num_epochs=epochs,
        g_update=g_update, des_parallel=16, resume=False,
        # the reference's lr=0.01 collapses the game within ~30 steps once G
        # is live (PARITY.md); 1e-3 keeps D/G balanced on this small set,
        # and an optional slower D (d_lr) holds the balance across a full
        # multi-epoch run
        lr=1e-3, d_lr=d_lr, surrogate_lr=1e-3,
        models_dir=os.path.join(workdir, "models"),
        losses_dir=os.path.join(workdir, "losses"),
        log_path=os.path.join(workdir, "logs") + "/",
        midi_out_dir=os.path.join(workdir, "midi"),
        seed=0,
    )

    state0, _, _ = init_state_for_config(cfg)
    fake0, failed0 = generated_rolls(state0, cfg, 64, seed=99, workdir=workdir)
    gap0 = gap(real, fake0)
    print("initial gap:", json.dumps(gap0, indent=None))

    np.random.seed(0)
    state, history = train_mmgan(ds, cfg)

    fake1, failed1 = generated_rolls(state, cfg, 64, seed=99, workdir=workdir)
    gap1 = gap(real, fake1)
    print("final gap:  ", json.dumps(gap1, indent=None))

    disc_curve = [float(np.mean(e)) for e in history["disc"]]
    gen_curve = [float(np.mean(e)) for e in history["gen"]]
    results = {
        "epochs": epochs,
        "g_update": g_update,
        "d_lr": d_lr,
        "steps": sum(len(e) for e in history["disc"]),
        "disc_loss_first_epoch": disc_curve[0],
        "disc_loss_last_epoch": disc_curve[-1],
        "gen_loss_first_epoch": gen_curve[0],
        "gen_loss_last_epoch": gen_curve[-1],
        "disc_loss_per_epoch": disc_curve,
        "gen_loss_per_epoch": gen_curve,
        "gap_initial": gap0,
        "gap_final": gap1,
        "failed_sims_eval": [int(failed0), int(failed1)],
    }
    with open(os.path.join(workdir, "RESULTS.json"), "w") as f:
        json.dump(results, f, indent=2)
    try:  # loss-curve artifact (the reference committed losses/*.pkl;
        # we commit both the pickles — losses_dir — and a rendered curve)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(1, 2, figsize=(9, 3.2))
        ax[0].plot(disc_curve); ax[0].set_title("D loss / epoch")
        ax[1].plot(gen_curve); ax[1].set_title(f"G loss / epoch ({g_update})")
        for a in ax:
            a.set_xlabel("epoch")
        fig.tight_layout()
        fig.savefig(os.path.join(workdir, "loss_curves.png"), dpi=110)
        plt.close(fig)
    except Exception as e:  # pragma: no cover - headless env without mpl
        print(f"loss-curve plot skipped: {e}")
    improved = sum(gap1[k] < gap0[k] for k in gap0)
    print(f"gap improved on {improved}/{len(gap0)} metrics "
          f"-> {workdir}/RESULTS.json")


if __name__ == "__main__":
    main()
