"""MM-GAN training loop.

Re-implements the reference driver
(`MMGAN_MIDI_DES/network_tests.py:208-350`) with the device math fused and
jitted (train/steps.py) and the DES round-trip as a host pipeline stage:

per batch: jitted G1+G2 forward -> host ``matrix_to_midi`` (seeded DES +
MIDI decode + rasterization) -> ONE fused jitted D-update + post-update
G-loss launch. Loss histories pickle to
``losses/{disc,gen}_losses_epoch_{e}.pkl`` (exact reference naming, 337x16
schedule on the reference dataset), checkpoints save every
``save_interval`` epochs as ``mmgan_{A}_{B}_epoch_{e}`` orbax dirs (full
state incl. optimizer — fixing the reference's params-only gap), StepLR(30,
0.1) on both optimizers, resume from the newest epoch checkpoint.

``faithful=True`` reproduces the reference's *second* generator forward +
DES round-trip per batch (the G step re-runs the whole fake path,
:311-315); the default single-round-trip mode halves host work with
identical learning dynamics (G receives no gradients either way — the
detach quirk).
"""

from __future__ import annotations

import os
import pickle
import time
from dataclasses import dataclass, replace

import numpy as np

import jax
import jax.numpy as jnp
import optax

from gandes_tpu.bridge.mmgan_decode import matrix_to_midi
from gandes_tpu.core.transfer import cast_f32_args, compact_put
from gandes_tpu.data.datasets import DataLoader
from gandes_tpu.models.mmgan import BeatGenerator, DiscriminatorCNN, MLPGenerator
from gandes_tpu.train import checkpoint as ckpt
from gandes_tpu.train.losses import bce_with_logits
from gandes_tpu.train.steps import (
    init_mmgan_state,
    make_mmgan_gen_forward,
    make_mmgan_train_step,
    make_steplr,
)


@dataclass
class MMGANConfig:
    batch_size: int = 16
    noise_dim: int = 50
    adj_size: tuple = (64, 64)
    sequence_length: int = 50
    max_beat_length: int = 50
    gen2_output_dim: int = 20
    start: int = 100
    instrument: int | None = 0
    lr: float = 0.01
    # Separate D learning rate (opt-in GAN balance knob; None = lr, the
    # reference's single-lr semantics). At the shared default the D wins
    # the game within ~30 steps once G is live — docs/RESULTS.md.
    d_lr: float | None = None
    steplr_epochs: int = 30
    steplr_gamma: float = 0.1
    num_epochs: int = 100
    save_interval: int = 1
    print_interval: int = 5
    sleep_between_epochs: float = 0.0  # reference: 10 s (network_tests.py:344)
    faithful: bool = False
    # 'none' (reference semantics: G gets zero gradient through the DES),
    # 'direct' (straight-through via a fixed bilinear renderer),
    # 'surrogate' (straight-through via a LEARNED DES surrogate fitted
    # online to the simulator's rolls), or 'reinforce' (score-function
    # estimator: the DES consumes N(G(z), sigma^2) samples and the reward
    # log D(roll) on the simulator's ACTUAL output weights the Gaussian
    # log-density — unbiased through the non-differentiable DES).
    # 'surrogate'/'reinforce' imply force_roll decoding so the fake rolls
    # carry real content. All opt-in; the reference's G trains under none.
    g_update: str = "none"
    surrogate_lr: float = 1e-3
    reinforce_sigma: float = 0.05
    # Adversarial-balance knobs for g_update='surrogate' (all opt-in;
    # zero = exact previous step math). Motivation: at the reference's
    # 337-step epochs the D collapses the game by ~epoch 12 even at
    # d_lr=1e-4 and the G's location statistics drift during the
    # D-dominated phase (docs/RESULTS.md round-3 head-to-head).
    # instance_noise_sigma: N(0, sigma^2) added to every D input (real,
    # fake, proxy), annealed linearly to 0 over instance_noise_anneal_epochs
    # (None = the full num_epochs). Units: roll velocities (~0-126).
    instance_noise_sigma: float = 0.0
    instance_noise_anneal_epochs: float | None = None
    # r1_gamma: R1 gradient penalty weight on the real batch (D loss).
    r1_gamma: float = 0.0
    # r1_mode: 'exact' (grad-of-grad — hangs the axon relay compile at
    # reference shapes, PARITY.md "axon compile hang") or 'fd' (central
    # finite difference along a fresh Gaussian probe, two extra D
    # forwards, first-order autodiff only — compiles on axon).
    r1_mode: str = "exact"
    r1_fd_eps: float = 0.5
    # moment_match: G-side per-pitch mean-profile MSE weight (location
    # anchor through the surrogate gradient path).
    moment_match: float = 0.0
    # moment_match_cond: G-side anchor on the CONDITIONAL statistics the
    # eval scores (E/std[velocity|onset], E[duration|sounding]) — the
    # round-5 extension targeting the velocity_mean/duration_mean gaps
    # (train/steps.py::soft_conditional_moments).
    moment_match_cond: float = 0.0
    # instance_noise_floor: anneal instance noise to this sigma instead of
    # 0 (permanent D noise floor; keeps late-game D gradients informative).
    instance_noise_floor: float = 0.0
    # single-launch steps: the whole train step (G forward + DES as an
    # ordered io_callback + D update) is ONE compiled XLA program per batch
    # (train/fused_callback.py). Identical semantics to the two-phase path;
    # requires g_update='none', faithful=False, mesh_shape=None.
    fused_io: bool = False
    # >1: concurrent native DES sims per batch (fast mode — deterministic
    # but a different RNG stream than the reference's sequential coupling)
    des_parallel: int | None = None
    # (dp, tp) device mesh for sharded training: batch over dp (grad psum
    # over ICI via sharded autodiff; BN batch stats sync the same way),
    # large kernels column-parallel over tp. None = single device.
    mesh_shape: tuple | None = None
    models_dir: str = "models"
    losses_dir: str = "losses"
    log_path: str = "logs/"
    midi_out_dir: str = "./adj_sim_outputs/midi"
    resume: bool = True
    seed: int = 0
    # observability: print a per-phase StepTimer table (host_des vs
    # device_step vs data) every print_interval, and return it in
    # history["profile"]; trace_dir additionally wraps training in a
    # jax.profiler device trace (view with xprof/TensorBoard)
    profile: bool = False
    trace_dir: str | None = None
    # derive per-step noise/aux streams INSIDE the G-forward program from
    # the step counter (bitwise-equal streams and G outputs; the
    # reinforce perturbation may fuse to an FMA, <= 1 ULP; ~6 fewer
    # device dispatches + small-transfer leaks per step on the
    # remote-attached platform — tests/test_counted_rng.py pins loop
    # losses bitwise on vs off). Ignored by the fused_io path, which
    # generates noise eagerly. CAVEAT (ADVICE r3 #3): in
    # g_update='reinforce' the in-program perturbation may fuse to an FMA
    # (<= 1 ULP vs the eager path), and those perturbed mats/vec feed
    # matrix_to_midi's threshold compares — so flipping this flag
    # MID-EXPERIMENT can change reinforce decode outputs for the same
    # seed. Pick a value per experiment and keep it.
    counted_rng: bool = True
    # 'float32' (reference numerics) or 'bf16'/'bfloat16': run the dense
    # forward/backward math in bfloat16 (the MXU's native input width) while
    # params, optimizer state and BN statistics stay float32 (mixed
    # precision). Opt-in — measured ~1.3x samples/s at large batch on v5e;
    # at the reference's B=16 the step is dispatch-bound either way.
    compute_dtype: str = "float32"


def _compute_dtype(cfg) -> "jnp.dtype":
    name = cfg.compute_dtype.lower()
    if name in ("bf16", "bfloat16"):
        return jnp.bfloat16
    if name in ("f32", "float32"):
        return jnp.float32
    raise ValueError(f"compute_dtype must be float32 or bf16, got {cfg.compute_dtype!r}")


def build_mmgan(cfg: MMGANConfig):
    dt = _compute_dtype(cfg)
    g1 = MLPGenerator(z_dim=cfg.noise_dim, adj_size=cfg.adj_size,
                      input_dim=cfg.noise_dim, dtype=dt)
    g2 = BeatGenerator(z_dim=cfg.noise_dim, input_dim=cfg.max_beat_length,
                       output_dim=cfg.gen2_output_dim, dtype=dt)
    d = DiscriminatorCNN(roll_size=(2, 128, cfg.sequence_length), dtype=dt)
    return g1, g2, d


def make_optimizers(cfg: MMGANConfig, steps_per_epoch: int):
    g_sched = make_steplr(cfg.lr, cfg.steplr_epochs, cfg.steplr_gamma, steps_per_epoch)
    d_sched = make_steplr(cfg.d_lr if cfg.d_lr is not None else cfg.lr,
                          cfg.steplr_epochs, cfg.steplr_gamma, steps_per_epoch)
    return optax.adam(g_sched), optax.adam(d_sched)


def init_state_for_config(cfg: MMGANConfig, steps_per_epoch: int = 1,
                          batch_size: int | None = None):
    """One construction path for training AND checkpoint-restore templates
    (the optimizer tree structure must match what training saved)."""
    g1, g2, d = build_mmgan(cfg)
    g_tx, d_tx = make_optimizers(cfg, steps_per_epoch)
    state = init_mmgan_state(
        g1, g2, d, jax.random.key(cfg.seed),
        batch_size=batch_size or cfg.batch_size, z_dim=cfg.noise_dim,
        beat_dim=cfg.max_beat_length, roll_size=(2, 128, cfg.sequence_length),
        g_tx=g_tx, d_tx=d_tx,
    )
    return state, (g1, g2, d), (g_tx, d_tx)


def train_mmgan(dataset, cfg: MMGANConfig = MMGANConfig(), steps_per_epoch=None,
                max_batches=None):
    """Returns (state, history). ``dataset`` yields (roll, dur, beats)."""
    if cfg.trace_dir:
        from gandes_tpu.core.profiling import device_trace

        with device_trace(cfg.trace_dir):
            return _train_mmgan(dataset, cfg, steps_per_epoch, max_batches)
    return _train_mmgan(dataset, cfg, steps_per_epoch, max_batches)


def _train_mmgan(dataset, cfg, steps_per_epoch=None, max_batches=None):
    from gandes_tpu.core.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    loader = DataLoader(dataset, cfg.batch_size, shuffle=False, drop_last=True)
    steps_per_epoch = steps_per_epoch or max(1, len(loader))

    state, (g1, g2, d), (g_tx, d_tx) = init_state_for_config(cfg, steps_per_epoch)

    mesh = None
    if cfg.mesh_shape is not None:
        from gandes_tpu.parallel.mesh import make_mesh, shard_batch, shard_state

        dp, tp = cfg.mesh_shape
        mesh = make_mesh(dp=dp, tp=tp, n_devices=dp * tp)
        if cfg.batch_size % dp:
            raise ValueError(f"batch_size {cfg.batch_size} not divisible by dp={dp}")

    if cfg.faithful and cfg.g_update != "none":
        raise ValueError(
            "faithful=True re-runs the fake path and replaces the generator "
            f"loss with plain BCE, which would silently discard the "
            f"g_update={cfg.g_update!r} objective — use one or the other"
        )

    start_epoch = 0
    if cfg.resume:
        path, epoch = ckpt.latest_epoch_checkpoint(
            cfg.models_dir, f"mmgan_{cfg.adj_size[0]}_{cfg.adj_size[1]}"
        )
        if path:
            state = ckpt.restore_state(path, state)
            start_epoch = epoch
            print(f"Loaded model from {path}")
        else:
            print("No saved model found, starting training from scratch")

    if mesh is not None:
        state = shard_state(state, mesh)

    full_step = None
    if cfg.fused_io:
        if cfg.g_update != "none" or cfg.faithful or cfg.mesh_shape is not None:
            raise ValueError(
                "fused_io requires g_update='none', faithful=False and no mesh"
            )
        from gandes_tpu.train.fused_callback import make_mmgan_full_step_io

        full_step = jax.jit(cast_f32_args(make_mmgan_full_step_io(
            g1, g2, d, g_tx, d_tx, batch_size=cfg.batch_size,
            sequence_length=cfg.sequence_length, adj_size=cfg.adj_size,
            instrument=cfg.instrument, start=cfg.start, log_path=cfg.log_path,
            out_dir=cfg.midi_out_dir, des_parallel=cfg.des_parallel,
        ), 1))

    counted = cfg.counted_rng and full_step is None
    if counted:
        from gandes_tpu.train.steps import make_mmgan_gen_forward_counted

        gen_forward_c = jax.jit(make_mmgan_gen_forward_counted(
            g1, g2, seed=cfg.seed, z_dim=cfg.noise_dim,
            reinforce_sigma=(cfg.reinforce_sigma
                             if cfg.g_update == "reinforce" else None)))
    else:
        gen_forward = jax.jit(make_mmgan_gen_forward(g1, g2))
    s_state = None
    if cfg.g_update == "surrogate":
        from gandes_tpu.models.surrogate import RollSurrogate
        from gandes_tpu.train.steps import (
            init_surrogate_state,
            make_mmgan_train_step_surrogate,
        )

        s_model = RollSurrogate(roll_size=(2, 128, cfg.sequence_length),
                                vec_dim=cfg.gen2_output_dim)
        s_tx = optax.adam(cfg.surrogate_lr)
        s_state = init_surrogate_state(
            s_model, jax.random.key(cfg.seed + 2), batch_size=cfg.batch_size,
            adj_size=cfg.adj_size, vec_dim=cfg.gen2_output_dim, s_tx=s_tx,
        )
        if start_epoch:
            s_path = os.path.join(
                cfg.models_dir,
                f"mmgan_{cfg.adj_size[0]}_{cfg.adj_size[1]}_epoch_{start_epoch}_surrogate",
            )
            if os.path.isdir(s_path):
                s_state = ckpt.restore_state(s_path, s_state)
        if mesh is not None:
            s_state = shard_state(s_state, mesh)
        anneal_epochs = (cfg.instance_noise_anneal_epochs
                         if cfg.instance_noise_anneal_epochs is not None
                         else cfg.num_epochs)
        train_step = jax.jit(cast_f32_args(
            make_mmgan_train_step_surrogate(
                g1, g2, d, s_model, g_tx, d_tx, s_tx,
                instance_noise=((cfg.instance_noise_sigma,
                                 max(1, int(anneal_epochs * steps_per_epoch)))
                                if cfg.instance_noise_sigma else None),
                r1_gamma=cfg.r1_gamma, moment_match=cfg.moment_match,
                moment_match_cond=cfg.moment_match_cond,
                r1_mode=cfg.r1_mode, r1_fd_eps=cfg.r1_fd_eps,
                instance_noise_floor=cfg.instance_noise_floor,
                balance_seed=cfg.seed),
            2, 3,  # real, fake ride uint8; the cast fuses into the step
        ))
    elif cfg.g_update == "reinforce":
        from gandes_tpu.train.steps import make_mmgan_train_step_reinforce

        train_step = jax.jit(cast_f32_args(make_mmgan_train_step_reinforce(
            g1, g2, d, g_tx, d_tx, sigma=cfg.reinforce_sigma), 1, 2))
    else:
        train_step = jax.jit(cast_f32_args(
            make_mmgan_train_step(g1, g2, d, g_tx, d_tx,
                                  g_update=cfg.g_update), 1, 2))
    g_loss_only = jax.jit(
        lambda d_params, fake: bce_with_logits(
            d.apply({"params": d_params},
                    jnp.asarray(fake, jnp.float32)).squeeze(), 1.0
        )
    )

    from gandes_tpu.core.profiling import StepTimer

    timer = StepTimer()
    # resume must CONTINUE the run's RNG streams, not replay them: every
    # per-batch key is derived from count, so restart it where the restored
    # run left off — epochs before start_epoch each ran steps_per_epoch
    # batches, capped by max_batches when that cap was in effect (the CLI's
    # --max-batches flow would otherwise skip ahead in every stream)
    past_epoch_steps = (steps_per_epoch if max_batches is None
                        else min(steps_per_epoch, max_batches))
    count = start_epoch * past_epoch_steps
    from gandes_tpu.core.transfer import transfer_bytes

    tb0, tb_steps = transfer_bytes(), 0
    total_failures = 0
    total_seen = 0
    history = {"disc": [], "gen": []}

    def aux_key(count):
        # G1/G2 aux-input stream: seeded like the noise streams (seed+4
        # namespace) so different-seed runs draw independent aux inputs
        return jax.random.fold_in(jax.random.key(cfg.seed + 4), count)

    def fake_batch(state, noise1, noise2, beats, count):
        if counted:
            # one launch derives noise/aux streams AND runs G1+G2; the
            # derived arrays ride device-to-device into the train step
            mats, vec, new_stats, noise1, noise2, auxk = gen_forward_c(
                state, count, beats)
        else:
            auxk = aux_key(count)
            mats, vec, new_stats = gen_forward(state, noise1, noise2, beats,
                                               auxk)
            if cfg.g_update == "reinforce":
                # the DES consumes a SAMPLE from N(G(z), sigma^2) — that
                # stochasticity is what the score-function gradient needs.
                # Clip to [0,1] to keep the decode semantics (sigmoid
                # range); clipping censors the Gaussian tails (noted in
                # the step's doc)
                ks = jax.random.fold_in(jax.random.key(cfg.seed + 3), count)
                mats = jnp.clip(
                    mats + cfg.reinforce_sigma
                    * jax.random.normal(jax.random.fold_in(ks, 0), mats.shape),
                    0.0, 1.0)
                vec = jnp.clip(
                    vec + cfg.reinforce_sigma
                    * jax.random.normal(jax.random.fold_in(ks, 1), vec.shape),
                    0.0, 1.0)
        rolls, failed = matrix_to_midi(
            np.asarray(mats)[:, None], np.asarray(vec), adj_size=cfg.adj_size,
            instrument=cfg.instrument, start=cfg.start,
            end=cfg.start + cfg.sequence_length, count=count,
            log_path=cfg.log_path, out_dir=cfg.midi_out_dir,
            parallel=cfg.des_parallel,
            # surrogate regression / reinforce rewards / the direct
            # straight-through value all need the DES's actual rolls —
            # decode them even when the reference's save gate would leave
            # them blank
            force_roll=cfg.g_update in ("surrogate", "reinforce", "direct"),
        )
        # rolls are integer velocities + a binary channel: transfer uint8
        # (the axon client leaks every h2d transfer's byte size — see
        # core/transfer.py), cast to f32 on device — bit-identical input
        fake = compact_put(np.stack(rolls))
        if mesh is not None:
            fake = shard_batch(fake, mesh)
        return fake, failed, new_stats, mats, vec, noise1, noise2, auxk

    for epoch in range(start_epoch, cfg.num_epochs):
        disc_losses, gen_losses = [], []
        for i, (piano_roll, durations, beats) in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            count += 1
            tb_steps += 1
            if counted:
                noise1 = noise2 = None  # derived inside gen_forward_c
            else:
                kb = jax.random.fold_in(jax.random.key(cfg.seed + 1), count)
                noise1 = jax.random.normal(jax.random.fold_in(kb, 0), (cfg.batch_size, cfg.noise_dim))
                noise2 = jax.random.normal(jax.random.fold_in(kb, 1), (cfg.batch_size, cfg.noise_dim))
            # compact_put everywhere: it picks the narrowest lossless wire
            # dtype (u8/u16/f32) AND counts the bytes moved — the leak
            # budget on the axon platform (core/transfer.py)
            # (allow_compact=False: beats feed G2 uncast — keep the wire
            # dtype f32; this put exists to be COUNTED, it is only 3 kB)
            beats_j = compact_put(np.asarray(beats), allow_compact=False)
            # stack on host, move once: one compact (uint8/uint16 when
            # lossless) transfer instead of two f32 puts + an eager stack
            real = compact_put(
                np.stack([np.asarray(piano_roll), np.asarray(durations)], axis=1))
            if mesh is not None:
                beats_j, real = shard_batch((beats_j, real), mesh)
                if not counted:
                    noise1, noise2 = shard_batch((noise1, noise2), mesh)

            if full_step is not None:
                # one launch: timing it requires blocking on the result, so
                # only do that under profiling
                with timer.phase("full_step(fwd+des+update)"):
                    state, _, _, metrics = full_step(
                        state, real, noise1, noise2, beats_j,
                        jnp.int32(count), aux_key(count))
                    if cfg.profile:
                        jax.block_until_ready(metrics["d_loss"])
                # device scalar, summed lazily — fetched only at print time
                failed = metrics["failed_simulations"]
                g_loss = metrics["g_loss"]
            else:
                with timer.phase("host_des"):
                    fake, failed, new_stats, mats, vec, noise1, noise2, auxk = \
                        fake_batch(state, noise1, noise2, beats_j, count)
                state = replace(state, g_stats=new_stats)
                with timer.phase("device_step"):
                    if cfg.g_update == "surrogate":
                        state, s_state, metrics = train_step(
                            state, s_state, real, fake, mats, vec, noise1, noise2,
                            beats_j, auxk)
                    elif cfg.g_update == "reinforce":
                        state, metrics = train_step(
                            state, real, fake, mats, vec, noise1, noise2,
                            beats_j, auxk)
                    elif cfg.g_update == "direct":
                        state, metrics = train_step(state, real, fake, noise1, noise2,
                                                    beats_j, auxk)
                    else:
                        state, metrics = train_step(state, real, fake)
                    if cfg.profile:
                        jax.block_until_ready(metrics["d_loss"])
                g_loss = metrics["g_loss"]

                if cfg.faithful:
                    # reference runs the whole fake path again for the G step
                    fake2, failed2, new_stats = fake_batch(
                        state, noise1, noise2, beats_j, count)[:3]
                    state = replace(state, g_stats=new_stats)
                    g_loss = g_loss_only(state.d_params, fake2)
                    failed += failed2

            total_failures = total_failures + failed
            total_seen += cfg.batch_size
            # keep losses on device; a d2h fetch per scalar costs tens of ms
            # on remote-attached TPUs — fetch in bulk at epoch end
            disc_losses.append(metrics["d_loss"])
            gen_losses.append(g_loss)

            if i % cfg.print_interval == 0:
                print(
                    f"Epoch {epoch + 1}/{cfg.num_epochs}, Batch {i}/{steps_per_epoch}, "
                    f"Avg Disc Loss: {np.mean(jax.device_get(disc_losses))}, "
                    f"Avg Gen Loss: {np.mean(jax.device_get(gen_losses))}"
                )
                print("Total failures:", int(total_failures), "Total seen:", total_seen)
                if cfg.profile:
                    print(timer.report())
                    print(f"[h2d] {(transfer_bytes() - tb0) / max(tb_steps, 1) / 1e6:.3f} "
                          "MB/step moved via compact_put (leak budget — "
                          "PARITY.md 'axon h2d transfer leak')")

        disc_losses = [float(x) for x in jax.device_get(disc_losses)]
        gen_losses = [float(x) for x in jax.device_get(gen_losses)]
        os.makedirs(cfg.losses_dir, exist_ok=True)
        with open(os.path.join(cfg.losses_dir, f"disc_losses_epoch_{epoch + 1}.pkl"), "wb") as f:
            pickle.dump(disc_losses, f)
        with open(os.path.join(cfg.losses_dir, f"gen_losses_epoch_{epoch + 1}.pkl"), "wb") as f:
            pickle.dump(gen_losses, f)
        history["disc"].append(disc_losses)
        history["gen"].append(gen_losses)

        if cfg.sleep_between_epochs:
            time.sleep(cfg.sleep_between_epochs)

        if (epoch + 1) % cfg.save_interval == 0:
            path = os.path.join(
                cfg.models_dir,
                f"mmgan_{cfg.adj_size[0]}_{cfg.adj_size[1]}_epoch_{epoch + 1}",
            )
            ckpt.save_state(path, state)
            if s_state is not None:
                ckpt.save_state(path + "_surrogate", s_state)

    # only meaningful under profile=True: without the per-phase block the
    # device phases time async dispatch and the wait leaks into host_des
    if cfg.profile:
        history["profile"] = timer.summary()
    return state, history


_EVAL_FORWARDS: dict = {}


def _eval_forward(cfg: MMGANConfig):
    """Jitted eval-mode G1+G2 forward, cached per model configuration.

    One compiled program per (shape-relevant) config instead of eager
    per-op dispatch — on the remote-attached TPU eager applies cost
    minutes of per-op compiles, which is fatal for repeated inference
    (the serving process calls this warm on every request)."""
    key = (cfg.noise_dim, cfg.adj_size, cfg.max_beat_length, cfg.gen2_output_dim)
    fwd = _EVAL_FORWARDS.get(key)
    if fwd is None:
        g1, g2, _ = build_mmgan(cfg)

        def forward(g_params, g_stats, noise1, noise2, beats, aux_key):
            out1 = g1.apply(
                {"params": g_params["g1"], "batch_stats": g_stats["g1"]},
                noise1, None, False, rngs={"aux": aux_key})
            out2 = g2.apply(
                {"params": g_params["g2"], "batch_stats": g_stats["g2"]},
                noise2, beats, False)
            return out1, out2

        fwd = _EVAL_FORWARDS[key] = jax.jit(forward)
    return fwd


def generate_midi(state, cfg: MMGANConfig, noise1, noise2, beats, out_dir=None):
    """Inference == ``MultiModalGAN.generate_midi`` (network_tests.py:198-206):
    eval-mode G1/G2 -> DES with ``generate=True`` (writes generation.mid)."""
    out1, out2 = _eval_forward(cfg)(
        state.g_params, state.g_stats, jnp.asarray(noise1),
        jnp.asarray(noise2), jnp.asarray(beats), jax.random.key(0),
    )
    rolls, failed = matrix_to_midi(
        np.asarray(out1)[:, None], np.asarray(out2), adj_size=cfg.adj_size,
        instrument=cfg.instrument, start=cfg.start,
        end=cfg.start + cfg.sequence_length, generate=True,
        log_path=cfg.log_path, out_dir=out_dir or cfg.midi_out_dir,
    )
    return rolls
