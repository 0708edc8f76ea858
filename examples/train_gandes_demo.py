"""GAN-DES training-outcome demo — the other model family's analog of
``train_surrogate_demo.py``.

The reference's GAN-DES generator receives exactly zero gradient (the
detach at `GAN_DES/SIMNN.py:299`), so its training can only drift. This
harness measures whether the opt-in G-training modes actually pull the
generated mel distribution toward the data, end to end with the full
DES -> MIDI -> synth -> mel chain in the loop (set GANDES_DEMO_CPU=1 to
pin the CPU backend — the measurement is a differential training outcome,
identical math on any backend; device throughput is bench.py's job):

1. synthesize a dataset of DES-generated MIDI (random queueing networks ->
   sim-to-wav MIDIs, no external data needed);
2. measure the initial real-vs-generated mel spectral gap
   (eval/metrics.py::mel_metrics — the same statistics
   `eval-metrics --family gandes` reports);
3. train GAN-DES with a chosen ``g_update`` mode;
4. re-measure and report.

Usage: python examples/train_gandes_demo.py [workdir] [steps] [n_nets]
                                            [g_update] [lr] [d_lr]
``g_update`` in {none, surrogate, reinforce} (default surrogate); ``lr``
defaults to 2e-4 (the reference's 2e-5 moves G too slowly to measure in a
short run; the same lr is used for the 'none' baseline so the comparison
is differential); ``d_lr`` optionally slows the discriminator (the GAN
balance knob — see the MM-GAN runs in docs/RESULTS.md). Writes
workdir/RESULTS.json + loss_curves.png. Numbers from a real run are
recorded in docs/RESULTS.md.
"""

from __future__ import annotations

import json
import os
import sys

# runnable without an install step from any cwd
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if os.environ.get("GANDES_DEMO_CPU"):
    # this demo measures TRAINING OUTCOMES (differential gaps), not device
    # throughput (bench.py's job) — on a degraded relay the CPU backend is
    # both faster and reproducible anywhere. Per-CLAUDE.md quirk: force CPU
    # via jax.config, not env alone.
    jax.config.update("jax_platforms", "cpu")


def build_dataset(workdir: str, n_nets: int = 16) -> str:
    from gandes_tpu.bridge.sim_demo import sim_to_wav

    midi_dir = os.path.join(workdir, "midis")
    os.makedirs(midi_dir, exist_ok=True)
    for seed in range(n_nets):
        np.random.seed(seed)
        out_dir = os.path.join(workdir, f"net_{seed}")
        sim_to_wav(matrices=[None], size=32, use_same_instrument=seed % 16,
                   log_path=os.path.join(workdir, "logs") + "/",
                   out_dir=out_dir, render=False)  # mels render lazily from
        # the .mid through the same synth the training loop uses
        os.replace(os.path.join(out_dir, "midi", "output.mid"),
                   os.path.join(midi_dir, f"net_{seed}.mid"))
    print(f"dataset: {n_nets} simulated-network MIDIs")
    return midi_dir


def real_mels(midi_dir: str, n: int):
    # balanced round-robin across all nets' MIDIs, short renders dropped
    # BEFORE counting (a naive take-until-n over-weights the first nets)
    from gandes_tpu.data.datasets import collect_real_mels

    mels, n_files = collect_real_mels(midi_dir, n, seed=0)
    print(f"real side drawn from {n_files} network MIDIs")
    return mels


def generated_mels(state, cfg, n: int, seed: int, workdir: str):
    from gandes_tpu.bridge.gandes_decode import matrix_to_wav
    from gandes_tpu.models.gan_des import DCGANGenerator
    from gandes_tpu.train.loading import gandes_eval_forward

    gen = DCGANGenerator(noise_dim=cfg.z_dim)
    noise = jax.random.normal(jax.random.key(seed), (n, cfg.z_dim))
    mats = gandes_eval_forward(gen)(state.g_params, state.g_stats, noise)
    np.random.seed(seed)
    specs = matrix_to_wav(
        np.asarray(mats), size=20, start=0, end=cfg.mel_shape[1],
        write_wav=False, parallel=16,
        log_path=os.path.join(workdir, "logs") + "/",
        out_dir=os.path.join(workdir, "eval_out"),
        number_of_customers=cfg.number_of_customers,
        max_sim_time=cfg.max_sim_time,
    )
    return np.asarray(specs)


def gap(real, fake):
    from gandes_tpu.eval.metrics import compare_distributions, mel_metrics

    return {k: float(v) for k, v in
            compare_distributions(mel_metrics(real), mel_metrics(fake)).items()}


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "gandes_demo"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    n_nets = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    g_update = sys.argv[4] if len(sys.argv) > 4 else "surrogate"
    lr = float(sys.argv[5]) if len(sys.argv) > 5 else 2e-4
    d_lr = float(sys.argv[6]) if len(sys.argv) > 6 else None
    os.makedirs(os.path.join(workdir, "logs"), exist_ok=True)

    from gandes_tpu.data.datasets import DataLoader, MaestroDatasetGanDes, my_collate
    from gandes_tpu.models.gan_des import DCGANGenerator, MelDiscriminator
    from gandes_tpu.train.gandes_loop import GanDesConfig, train_gandes
    from gandes_tpu.train.steps import init_gandes_state

    import optax

    midi_dir = build_dataset(workdir, n_nets)
    cfg = GanDesConfig(
        batch_size=16, lr=lr, d_lr=d_lr, g_update=g_update, des_parallel=16,
        write_wav=False, pad_batches=True,
        n_epochs=-(-steps // n_nets),  # loop caps at max_steps
        model_path=os.path.join(workdir, "models") + "/",
        log_path=os.path.join(workdir, "logs") + "/",
        out_dir=os.path.join(workdir, "train_out"),
        # checkpoint every 32 steps (capped so long runs keep a rich
        # eval-metrics --checkpoints-dir selection grid)
        save_step=max(min(steps // 4, 32), 1), display_step=16, seed=0,
    )

    n_eval = 48
    real = real_mels(midi_dir, n_eval)
    print(f"real side: {real.shape[0]} mel slices of {real.shape[-1]} frames")

    tx = optax.adam(cfg.lr, b1=0.5, b2=0.999)
    state0 = init_gandes_state(
        DCGANGenerator(noise_dim=cfg.z_dim), MelDiscriminator(),
        jax.random.key(cfg.seed), batch_size=cfg.batch_size, z_dim=cfg.z_dim,
        mel_shape=cfg.mel_shape, g_tx=tx, d_tx=tx)
    gap0 = gap(real, generated_mels(state0, cfg, n_eval, seed=99, workdir=workdir))
    print("initial gap:", json.dumps(gap0))

    dataset = MaestroDatasetGanDes(batch_size=cfg.batch_size, input_folder=midi_dir)
    loader = DataLoader(dataset, batch_size=1, shuffle=True, collate_fn=my_collate)
    np.random.seed(0)
    state, history = train_gandes(loader, cfg, max_steps=steps)

    gap1 = gap(real, generated_mels(state, cfg, n_eval, seed=99, workdir=workdir))
    print("final gap:  ", json.dumps(gap1))

    results = {
        "steps": len(history["disc"]), "g_update": g_update, "lr": lr,
        "d_lr": d_lr,
        "disc_loss_first10": float(np.mean(history["disc"][:10])),
        "disc_loss_last10": float(np.mean(history["disc"][-10:])),
        "gen_loss_first10": float(np.mean(history["gen"][:10])),
        "gen_loss_last10": float(np.mean(history["gen"][-10:])),
        "disc_losses": history["disc"], "gen_losses": history["gen"],
        "gap_initial": gap0, "gap_final": gap1,
    }
    with open(os.path.join(workdir, "RESULTS.json"), "w") as f:
        json.dump(results, f, indent=2)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(1, 2, figsize=(9, 3.2))
        ax[0].plot(history["disc"]); ax[0].set_title("D loss / step")
        ax[1].plot(history["gen"]); ax[1].set_title(f"G loss / step ({g_update})")
        for a in ax:
            a.set_xlabel("step")
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
