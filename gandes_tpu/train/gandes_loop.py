"""GAN-DES training loop.

Re-implements the reference script ``__main__`` (`GAN_DES/SIMNN.py:234-348`):
per batch of collated 5 s mel slices — D update with label smoothing
0.9/0.1 over the double-sigmoid BCE (quirk preserved in train/steps.py),
then the post-update generator loss (G gets zero gradient — the detach at
:299). The fake path is: jitted DCGAN forward -> host ``matrix_to_wav``
(DES -> MIDI -> TPU synth -> mel). Generator checkpoints save every
``save_step`` steps as ``gen_{step}_{timestamp}`` orbax dirs (reference
naming, :344-347) — full state, not bare params.
"""

from __future__ import annotations

import os
import dataclasses
from dataclasses import dataclass
from datetime import datetime

import numpy as np

import jax
import jax.numpy as jnp
import optax

from gandes_tpu.bridge.gandes_decode import matrix_to_wav
from gandes_tpu.core.transfer import cast_f32_args, compact_put
from gandes_tpu.models.gan_des import DCGANGenerator, MelDiscriminator
from gandes_tpu.train import checkpoint as ckpt
from gandes_tpu.train.steps import (
    init_gandes_state,
    make_gandes_gen_forward,
    make_gandes_train_step,
)


@dataclass
class GanDesConfig:
    batch_size: int = 30
    z_dim: int = 100
    lr: float = 0.00002
    n_epochs: int = 1
    display_step: int = 5
    save_step: int = 5
    model_path: str = "models/"
    log_path: str = "logs/"
    out_dir: str = "adj_sim_outputs"
    mel_shape: tuple = (128, 216)
    number_of_customers: int = 1000
    max_sim_time: float = 0.5
    # >1: concurrent native DES sims per batch (fast mode, private routing
    # streams — deterministic but not the reference's sequential coupling)
    des_parallel: int | None = None
    # False skips the per-sample WAV artifacts (the reference writes them
    # every step; training never reads them)
    write_wav: bool = True
    # .sf2 path: the fake path renders by sample playback from this
    # soundfont — MUST match the real dataset's sound_font, or D separates
    # real from fake on timbre alone (None = additive synth on both sides)
    sound_font: str | None = None
    # pad short my_collate batches up to batch_size by cycling their own
    # samples: every step then compiles ONE program shape (each distinct
    # batch size otherwise recompiles the fused step — expensive on a
    # remote-attached backend). Opt-in; default is the reference's
    # variable-size batches.
    pad_batches: bool = False
    # 'none' (reference semantics: G gets zero gradient through the DES),
    # 'surrogate' (opt-in: G trains straight-through via a learned
    # matrix->mel surrogate fitted online to the real pipeline output), or
    # 'reinforce' (score-function estimator: the pipeline consumes
    # N(G(z), sigma^2) samples, log D(mel) on the ACTUAL output weights
    # the Gaussian log-density — unbiased through the whole
    # DES->synth->mel chain)
    g_update: str = "none"
    surrogate_lr: float = 1e-3
    reinforce_sigma: float = 0.05
    # Separate D learning rate (opt-in GAN balance knob; None = lr, the
    # reference's single-lr semantics) — same rationale as the MM-GAN
    # loop's, but sharper here: with mel-dB-scale inputs one Adam step at
    # d_lr >= 1e-4 shifts the pre-sigmoid logits past float32 sigmoid
    # underflow (sigma(x) == 0.0 exactly, so sigma' == 0 — D is dead
    # FOREVER after step 1, the bit-flat d_loss == 2*ln2 / g_loss == ln2
    # signature), which starves every G-update mode of gradient. Measured
    # at 1e-5 the game stays alive (docs/RESULTS.md).
    d_lr: float | None = None
    # resume from the newest gen_{step}_{ts} checkpoint under model_path
    # (full state incl. optimizers + BN stats; step-derived noise/
    # reinforce streams continue where the restored run stopped, and the
    # data sequence fast-forwards past the trained steps). The DES stage's
    # global-numpy stream is process-level and NOT checkpointed — an
    # in-process save/resume continues it naturally (pinned bit-exact by
    # test); a fresh process must reseed numpy itself. Opt-in: the
    # reference's GAN-DES never resumes, so False is its semantics.
    resume: bool = False
    # (dp, tp) device mesh for sharded training; None = single device.
    # my_collate batches vary in size — non-divisible batches replicate.
    mesh_shape: tuple | None = None
    # 'float32' (reference numerics) or 'bf16': dense math in bfloat16,
    # params/optimizer/BN stats in float32 (mixed precision, opt-in).
    compute_dtype: str = "float32"
    seed: int = 0
    # derive the per-step noise (and reinforce perturbation) INSIDE the
    # G-forward program from the step counter — bitwise-equal streams
    # and G outputs (the reinforce perturbation may fuse to an FMA,
    # <= 1 ULP), fewer eager dispatches + leaked small transfers per
    # step (tests/test_counted_rng.py)
    counted_rng: bool = True
    # observability (same surface as MMGANConfig): per-phase StepTimer
    # tables at display_step + history["profile"]; jax.profiler device
    # trace when trace_dir is set
    profile: bool = False
    trace_dir: str | None = None


def train_gandes(dataloader, cfg: GanDesConfig = GanDesConfig(), max_steps=None):
    """``dataloader`` yields (B, 128, 216) mel batches (my_collate output)."""
    if cfg.trace_dir:
        from gandes_tpu.core.profiling import device_trace

        with device_trace(cfg.trace_dir):
            return _train_gandes(dataloader, cfg, max_steps)
    return _train_gandes(dataloader, cfg, max_steps)


def _train_gandes(dataloader, cfg, max_steps=None):
    from gandes_tpu.core.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    from gandes_tpu.train.mmgan_loop import _compute_dtype

    dt = _compute_dtype(cfg)
    gen = DCGANGenerator(noise_dim=cfg.z_dim, dtype=dt)
    disc = MelDiscriminator(dtype=dt)
    g_tx = optax.adam(cfg.lr, b1=0.5, b2=0.999)
    d_tx = optax.adam(cfg.d_lr if cfg.d_lr is not None else cfg.lr,
                      b1=0.5, b2=0.999)
    state = init_gandes_state(gen, disc, jax.random.key(cfg.seed),
                              batch_size=cfg.batch_size, z_dim=cfg.z_dim,
                              mel_shape=cfg.mel_shape, g_tx=g_tx, d_tx=d_tx)
    resume_path, start_step = None, 0
    if cfg.resume:
        # full-state continuation (params + BN stats + both Adam states):
        # every per-step key folds from the step counter and state.step is
        # checkpointed, so restarting cur_step there CONTINUES the noise /
        # reinforce streams instead of replaying them. (The reference's
        # GAN-DES has no resume at all; this mirrors the MM-GAN loop's.)
        resume_path, _ = ckpt.latest_step_checkpoint(cfg.model_path)
        if resume_path:
            state = ckpt.restore_state(resume_path, state)
            start_step = int(state.step)
            print(f"Loaded model from {resume_path} (continuing at step "
                  f"{start_step})")
        else:
            print("No saved model found, starting training from scratch")
    mesh = None
    if cfg.mesh_shape is not None:
        from gandes_tpu.parallel.mesh import make_mesh, shard_batch, shard_state

        dp, tp = cfg.mesh_shape
        mesh = make_mesh(dp=dp, tp=tp, n_devices=dp * tp)
        state = shard_state(state, mesh)
    if cfg.counted_rng:
        from gandes_tpu.train.steps import make_gandes_gen_forward_counted

        gen_forward_c = jax.jit(make_gandes_gen_forward_counted(
            gen, seed=cfg.seed, z_dim=cfg.z_dim,
            reinforce_sigma=(cfg.reinforce_sigma
                             if cfg.g_update == "reinforce" else None)))
    else:
        gen_forward = jax.jit(make_gandes_gen_forward(gen))
    s_state = None
    if cfg.g_update == "surrogate":
        from gandes_tpu.models.surrogate import MelSurrogate
        from gandes_tpu.train.steps import (
            init_surrogate_state,
            make_gandes_train_step_surrogate,
        )

        s_model = MelSurrogate(mel_shape=cfg.mel_shape)
        s_tx = optax.adam(cfg.surrogate_lr)
        s_state = init_surrogate_state(s_model, jax.random.key(cfg.seed + 2),
                                       batch_size=cfg.batch_size,
                                       adj_size=(20, 20), s_tx=s_tx)
        if resume_path and os.path.isdir(resume_path + "_surrogate"):
            s_state = ckpt.restore_state(resume_path + "_surrogate", s_state)
        if mesh is not None:
            s_state = shard_state(s_state, mesh)
        train_step = jax.jit(cast_f32_args(
            make_gandes_train_step_surrogate(gen, disc, s_model, g_tx, d_tx, s_tx),
            2, 3,  # compact (uint8) batches decode inside the step program
        ))
    elif cfg.g_update == "reinforce":
        from gandes_tpu.train.steps import make_gandes_train_step_reinforce

        train_step = jax.jit(cast_f32_args(make_gandes_train_step_reinforce(
            gen, disc, g_tx, d_tx, sigma=cfg.reinforce_sigma), 1, 2))
    else:
        train_step = jax.jit(cast_f32_args(
            make_gandes_train_step(gen, disc, g_tx, d_tx), 1, 2))

    from gandes_tpu.core.profiling import StepTimer

    timer = StepTimer()
    gen_losses, disc_losses = [], []
    # display prints the running mean over the whole run (reference
    # semantics, SIMNN.py:337-342) — keep host-side running sums and fetch
    # only the window since the last display, not the full history every
    # time (each 0-d fetch is a relay round trip on this platform)
    fetched_n, g_sum, d_sum = 0, 0.0, 0.0
    cur_step = start_step
    # a resumed run fast-forwards the (epoch x batch) sequence past the
    # steps the checkpoint already trained, rather than replaying the
    # leading batches under new step indices (n_epochs/max_steps stay
    # TOTAL budgets, so resuming a finished run trains nothing further)
    skip = start_step
    for epoch in range(cfg.n_epochs):
        for real in dataloader:
            if skip > 0:
                skip -= 1
                continue
            if max_steps is not None and cur_step >= max_steps:
                hist = {"gen": [float(x) for x in jax.device_get(gen_losses)],
                        "disc": [float(x) for x in jax.device_get(disc_losses)]}
                if cfg.profile:  # phases only honest when steps block
                    hist["profile"] = timer.summary()
                return state, hist
            if cfg.pad_batches and 0 < len(real) < cfg.batch_size:
                reps = -(-cfg.batch_size // len(real))  # cycle own samples
                real = np.concatenate([np.asarray(real)] * reps)[: cfg.batch_size]
            cur_batch_size = len(real)
            # mel batches are continuous f32 (compact_put passes them
            # through); blank-wav fallback batches compact to uint8
            real = compact_put(real)

            if cfg.counted_rng:
                # noise (and the reinforce sample) derive inside the
                # forward's program — bitwise-equal streams, fewer eager
                # dispatches (steps.py::make_gandes_gen_forward_counted)
                if mesh is not None:
                    real = shard_batch(real, mesh)
                fake_mats, new_stats, noise = gen_forward_c(state, cur_step,
                                                            real)
            else:
                noise = jax.random.normal(
                    jax.random.fold_in(jax.random.key(cfg.seed + 1), cur_step),
                    (cur_batch_size, cfg.z_dim),
                )
                if mesh is not None:
                    real, noise = shard_batch((real, noise), mesh)
                fake_mats, new_stats = gen_forward(state, noise)
                if cfg.g_update == "reinforce":
                    # the pipeline consumes a SAMPLE from N(G(z), sigma^2)
                    # — clip to [0,1] to keep the decode semantics
                    fake_mats = jnp.clip(
                        fake_mats + cfg.reinforce_sigma * jax.random.normal(
                            jax.random.fold_in(jax.random.key(cfg.seed + 3),
                                               cur_step),
                            fake_mats.shape),
                        0.0, 1.0)
            state = dataclasses.replace(state, g_stats=new_stats)

            with timer.phase("host_des"):
                fake = matrix_to_wav(
                    np.asarray(fake_mats), size=20, start=0, end=cfg.mel_shape[1],
                    overwrite=True, log_path=cfg.log_path, out_dir=cfg.out_dir,
                    number_of_customers=cfg.number_of_customers,
                    max_sim_time=cfg.max_sim_time, parallel=cfg.des_parallel,
                    write_wav=cfg.write_wav, sound_font=cfg.sound_font,
                )
            fake = compact_put(fake)
            if mesh is not None:
                fake = shard_batch(fake, mesh)
            with timer.phase("device_step"):
                if cfg.g_update == "surrogate":
                    state, s_state, metrics = train_step(state, s_state, real,
                                                         fake, fake_mats, noise)
                elif cfg.g_update == "reinforce":
                    state, metrics = train_step(state, real, fake,
                                                fake_mats, noise)
                else:
                    state, metrics = train_step(state, real, fake)
                if cfg.profile:
                    jax.block_until_ready(metrics["d_loss"])
            # keep losses on device; a d2h fetch per scalar would block the
            # host on the device step before the next DES stage (the MM-GAN
            # loop documents the same rule) — fetched in bulk at display
            # time and on return
            disc_losses.append(metrics["d_loss"])
            gen_losses.append(metrics["g_loss"])

            if cur_step % cfg.display_step == 0 and cur_step > 0:
                g_sum += float(np.sum(jax.device_get(gen_losses[fetched_n:])))
                d_sum += float(np.sum(jax.device_get(disc_losses[fetched_n:])))
                fetched_n = len(gen_losses)
                print(
                    f"Epoch:{epoch} Step {cur_step}: Generator loss: "
                    f"{g_sum / fetched_n}, "
                    f"discriminator loss: {d_sum / fetched_n}"
                )
                if cfg.profile:
                    print(timer.report())
            if cur_step % cfg.save_step == 0 and cur_step > 0:
                now = datetime.now()
                path = os.path.join(
                    cfg.model_path, f"gen_{cur_step}_{datetime.timestamp(now)}"
                )
                ckpt.save_state(path, state)
                if s_state is not None:
                    ckpt.save_state(path + "_surrogate", s_state)
            cur_step += 1

    hist = {"gen": [float(x) for x in jax.device_get(gen_losses)],
            "disc": [float(x) for x in jax.device_get(disc_losses)]}
    if cfg.profile:
        hist["profile"] = timer.summary()
    return state, hist


def generate_song(ckpt_path, cfg: GanDesConfig = GanDesConfig(), n_samples=1):
    """== reference ``generate_song`` (SIMNN.py:201-216): load generator,
    sample noise, decode through the DES to spectrograms."""
    gen = DCGANGenerator(noise_dim=cfg.z_dim)
    disc = MelDiscriminator()
    g_tx = optax.adam(cfg.lr, b1=0.5)
    d_tx = optax.adam(cfg.lr, b1=0.5)
    state = init_gandes_state(gen, disc, jax.random.key(0), batch_size=n_samples,
                              z_dim=cfg.z_dim, mel_shape=cfg.mel_shape,
                              g_tx=g_tx, d_tx=d_tx)
    from gandes_tpu.train.loading import gandes_eval_forward

    state = ckpt.restore_state(ckpt_path, state)
    noise = jax.random.normal(jax.random.key(42), (n_samples, cfg.z_dim))
    mats = gandes_eval_forward(gen)(state.g_params, state.g_stats, noise)
    return matrix_to_wav(np.asarray(mats), size=20, start=0, end=cfg.mel_shape[1],
                         log_path=cfg.log_path, out_dir=cfg.out_dir,
                         number_of_customers=cfg.number_of_customers,
                         max_sim_time=cfg.max_sim_time,
                         parallel=cfg.des_parallel, sound_font=cfg.sound_font)
