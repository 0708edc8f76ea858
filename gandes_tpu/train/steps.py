"""Fused, jittable GAN train steps.

The reference runs D-update then G-update as separate eager torch graphs
with a host DES round-trip inside each (`network_tests.py:276-348`,
`SIMNN.py:275-331`). Here the device math is two fused jitted functions:

* ``gen_forward`` — G1+G2 forward (mutating BN batch stats), returning the
  adjacency matrices / parameter vectors the host DES decodes;
* ``train_step`` — discriminator update on (real, fake) + generator loss
  readout in ONE compiled program: both BCE terms, grads, Adam updates and
  the post-update generator loss, so per step there is exactly one
  host->device transfer of the fake batch and one compiled launch.

Faithful-semantics note: both reference loops detach the generator output
before the DES (`SIMNN.py:299`, `network_tests.py:189`), so generator
parameters receive **zero gradient** — "training" is D-only while G drifts
via BN statistics. ``g_update='none'`` (default) reproduces that exactly
(including stepping G's Adam state on zero gradients, which is a no-op for
the params). ``g_update='direct'`` is the opt-in improved mode: G1/G2 train
against D on a device-side differentiable proxy (provided by the caller as
``fake_proxy``), the straight-through shortcut around the DES.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from gandes_tpu.train.losses import GAN_DES_FAKE_LABEL, GAN_DES_REAL_LABEL, bce_with_logits


def make_steplr(lr: float, step_size_epochs: int, gamma: float, steps_per_epoch: int):
    """torch ``StepLR(step_size, gamma)`` as an optax schedule over steps."""

    def schedule(count):
        epoch = count // steps_per_epoch
        return lr * (gamma ** (epoch // step_size_epochs))

    return schedule


@jax.tree_util.register_dataclass
@dataclass
class GANState:
    """All mutable training state for one GAN (a pytree)."""

    g_params: Any
    g_stats: Any          # BN batch_stats for the generator(s)
    d_params: Any
    d_stats: Any
    g_opt: Any
    d_opt: Any
    step: jax.Array


# ----------------------------------------------------------------- MM-GAN


def _make_mmgan_d_loss(d):
    """Shared MM-GAN discriminator loss (fake->0, real->1); one definition
    for the base and surrogate steps so the modes cannot diverge."""

    def d_loss_fn(d_params, real, fake):
        logits_fake = d.apply({"params": d_params}, fake)
        logits_real = d.apply({"params": d_params}, real)
        return bce_with_logits(logits_fake.squeeze(), 0.0) + bce_with_logits(
            logits_real.squeeze(), 1.0
        )

    return d_loss_fn


def _make_gandes_d_loss(disc):
    """Shared GAN-DES discriminator loss with the reference's 0.9/0.1 label
    smoothing over already-sigmoided outputs (SIMNN.py:283-316 quirk)."""

    def d_loss_fn(d_params, real, fake):
        pred_real = disc.apply({"params": d_params}, real).reshape(-1)
        pred_fake = disc.apply({"params": d_params}, fake).reshape(-1)
        return bce_with_logits(pred_real, GAN_DES_REAL_LABEL) + bce_with_logits(
            pred_fake, GAN_DES_FAKE_LABEL
        )

    return d_loss_fn


def make_mmgan_gen_forward(g1, g2):
    """Jittable G1+G2 forward; returns (adj_matrices, gen2_params, new_stats).

    ``state.g_params`` / ``state.g_stats`` are dicts {'g1':..., 'g2':...}.
    """

    def forward(state: GANState, noise1, noise2, beats, aux_key=None):
        # G1 draws a fresh normal aux input per forward (reference
        # network_tests.py:82-84 calls generator1(noise) with no aux).
        if aux_key is None:
            aux_key = jax.random.key(0)
        out1, vars1 = g1.apply(
            {"params": state.g_params["g1"], "batch_stats": state.g_stats["g1"]},
            noise1, None, True, mutable=["batch_stats"], rngs={"aux": aux_key},
        )
        out2, vars2 = g2.apply(
            {"params": state.g_params["g2"], "batch_stats": state.g_stats["g2"]},
            noise2, beats, True, mutable=["batch_stats"],
        )
        new_stats = {"g1": vars1["batch_stats"], "g2": vars2["batch_stats"]}
        return out1, out2, new_stats

    return forward


def make_mmgan_gen_forward_counted(g1, g2, seed: int, z_dim: int,
                                   reinforce_sigma: float | None = None):
    """G1+G2 forward that derives the per-step noise and aux streams
    INSIDE the program from the step counter.

    The training loop's eager derivation (``fold_in``/``normal``/key
    construction, plus the reinforce perturbation) costs ~6 extra device
    dispatches per step on a remote-attached platform, each also leaking
    a small h2d transfer (PARITY.md "axon h2d transfer leak"). Folding
    them into the forward's launch removes that cost with BITWISE-equal
    streams: ``jax.random`` is a deterministic function of (key, shape),
    identical traced or eager (pinned by tests/test_counted_rng.py; the
    jitted G outputs are bitwise-equal too; only the reinforce
    perturbation's +/* may fuse to an FMA, <= 1 ULP, pinned).

    Returns ``(mats, vec, new_stats, noise1, noise2, aux_key)`` —
    the derived arrays ride device-to-device into the train step (no
    extra transfer). With ``reinforce_sigma``, ``mats``/``vec`` are the
    clipped N(G(z), sigma^2) samples the REINFORCE estimator consumes
    (the loop's exact eager arithmetic, same stream namespaces).
    """
    base = make_mmgan_gen_forward(g1, g2)

    def forward(state: GANState, count, beats):
        kb = jax.random.fold_in(jax.random.key(seed + 1), count)
        batch = beats.shape[0]
        noise1 = jax.random.normal(jax.random.fold_in(kb, 0), (batch, z_dim))
        noise2 = jax.random.normal(jax.random.fold_in(kb, 1), (batch, z_dim))
        aux_key = jax.random.fold_in(jax.random.key(seed + 4), count)
        mats, vec, new_stats = base(state, noise1, noise2, beats, aux_key)
        if reinforce_sigma is not None:
            ks = jax.random.fold_in(jax.random.key(seed + 3), count)
            mats = jnp.clip(
                mats + reinforce_sigma
                * jax.random.normal(jax.random.fold_in(ks, 0), mats.shape),
                0.0, 1.0)
            vec = jnp.clip(
                vec + reinforce_sigma
                * jax.random.normal(jax.random.fold_in(ks, 1), vec.shape),
                0.0, 1.0)
        return mats, vec, new_stats, noise1, noise2, aux_key

    return forward


def make_gandes_gen_forward_counted(gen, seed: int, z_dim: int,
                                    reinforce_sigma: float | None = None):
    """GAN-DES analog of :func:`make_mmgan_gen_forward_counted`: derives
    the per-step noise (and the reinforce perturbation) inside the
    forward's program from the step counter; batch size comes from a
    batch-shaped operand so padded tail batches recompile naturally.
    Returns ``(fake_mats, new_stats, noise)``."""
    base = make_gandes_gen_forward(gen)

    def forward(state: GANState, count, batch_like):
        noise = jax.random.normal(
            jax.random.fold_in(jax.random.key(seed + 1), count),
            (batch_like.shape[0], z_dim))
        fake_mats, new_stats = base(state, noise)
        if reinforce_sigma is not None:
            fake_mats = jnp.clip(
                fake_mats + reinforce_sigma * jax.random.normal(
                    jax.random.fold_in(jax.random.key(seed + 3), count),
                    fake_mats.shape),
                0.0, 1.0)
        return fake_mats, new_stats, noise

    return forward


def make_default_fake_proxy(g1, g2):
    """Straight-through surrogate for ``g_update='direct'``: re-run G1/G2
    differentiably, render a cheap differentiable "roll" from their outputs
    (adjacency matrix bilinearly resized onto the (note, time) grid, scaled
    by gen2's velocity/duration parameters), and route gradients through it
    while the forward VALUE stays the true DES-produced roll:

        proxy = fake_roll + surrogate - stop_grad(surrogate)

    The surrogate is a biased renderer, not the DES — but unlike the
    reference (whose generators receive exactly zero gradient), it gives G
    a non-degenerate training signal through D.
    """

    def proxy(g_params, g_stats, noise1, noise2, beats, aux_key, fake_roll):
        mats, _ = g1.apply(
            {"params": g_params["g1"], "batch_stats": g_stats["g1"]},
            noise1, None, True, mutable=["batch_stats"], rngs={"aux": aux_key},
        )
        vec, _ = g2.apply(
            {"params": g_params["g2"], "batch_stats": g_stats["g2"]},
            noise2, beats, True, mutable=["batch_stats"],
        )
        B, _, H, T = fake_roll.shape
        img = jax.image.resize(mats, (B, H, T), method="bilinear")
        # gen2's MIDI-meta block is vec[10:] (mmgan_decode passes
        # gen2_output[10:] to MidiGeneratorV2): velocity base = vec[13]*90,
        # tempo (which scales note durations in roll steps) = vec[14]*1e6 —
        # scale the rendered channels by the knobs the decoder actually
        # consumes so their gradients reach G2
        vel = img * (126.0 * vec[:, 13][:, None, None])
        dur = img * (20.0 * vec[:, 14][:, None, None])
        surrogate = jnp.stack([vel, dur], axis=1)
        return fake_roll + surrogate - jax.lax.stop_gradient(surrogate)

    return proxy


@jax.tree_util.register_dataclass
@dataclass
class SurrogateState:
    """Mutable state of the learned DES surrogate (a pytree)."""

    params: Any
    opt: Any
    step: jax.Array


def init_surrogate_state(s, key, *, batch_size, adj_size, vec_dim=None, s_tx) -> SurrogateState:
    """``vec_dim=None`` for matrix-only surrogates (MelSurrogate)."""
    mats = jnp.zeros((batch_size, *adj_size))
    if vec_dim is None:
        params = s.init(key, mats)["params"]
    else:
        params = s.init(key, mats, jnp.zeros((batch_size, vec_dim)))["params"]
    return SurrogateState(params=params, opt=s_tx.init(params),
                          step=jnp.zeros((), jnp.int32))


# Piano-roll velocities reach ~126 and durations tens of steps; dividing the
# regression residual by this keeps the MSE O(1) so Adam's 1e-3-ish lr regime
# applies unchanged.
ROLL_SCALE = 64.0


def soft_conditional_moments(roll, mask_src):
    """Batch-mean conditional moments of a (B, 2, 128, T) roll, masked by
    ``mask_src``'s nonzero cells (stop-gradded — the mask decides WHICH
    cells count, the values differentiate): per-sample nonzero-onset
    velocity mean/std and sounding-span duration mean, exactly the
    formulas :func:`gandes_tpu.eval.metrics.roll_metrics` scores
    (velocity_mean / velocity_std / duration_mean), then batch-averaged.
    Returns ``(vel_mean, vel_std, dur_mean)`` scalars. With
    ``roll is mask_src`` on integer rolls the forward VALUES equal the
    eval's statistics (velocity_std up to the 1e-6 sqrt guard)."""
    vel, dur = roll[:, 0], roll[:, 1]
    on = jax.lax.stop_gradient((mask_src[:, 0] > 0).astype(vel.dtype))
    snd = jax.lax.stop_gradient((mask_src[:, 1] > 0).astype(dur.dtype))
    safe_n = jnp.maximum(jnp.sum(on, axis=(1, 2)), 1.0)           # (B,)
    mv = jnp.sum(vel * on, axis=(1, 2)) / safe_n
    var = jnp.sum(on * (vel - mv[:, None, None]) ** 2, axis=(1, 2)) / safe_n
    sv = jnp.sqrt(var + 1e-6)
    span = jnp.maximum(jnp.sum(snd, axis=(1, 2)), 1.0)
    md = jnp.sum(dur * snd, axis=(1, 2)) / span
    return jnp.mean(mv), jnp.mean(sv), jnp.mean(md)


def make_mmgan_train_step_surrogate(g1, g2, d, s, g_tx, d_tx, s_tx, *,
                                    instance_noise: tuple | None = None,
                                    r1_gamma: float = 0.0,
                                    moment_match: float = 0.0,
                                    moment_match_cond: float = 0.0,
                                    r1_mode: str = "exact",
                                    r1_fd_eps: float = 0.5,
                                    instance_noise_floor: float = 0.0,
                                    balance_seed: int = 0):
    """One fused jitted step for ``g_update='surrogate'``:

    1. D update on (real, fake) — identical to the base step;
    2. surrogate update — regress the DES-produced ``fake`` roll from the
       (stop-gradded) generator outputs ``mats``/``vec`` that produced it;
    3. G update — re-run G1/G2 differentiably, render the roll with the
       JUST-updated (frozen) surrogate, and route gradients straight-through:
       the proxy's forward value stays the true DES roll, its gradient is the
       surrogate's.

    Unlike ``g_update='direct'`` (fixed bilinear renderer), the gradient here
    tracks what the simulator actually does with the matrix, because the
    surrogate is fitted online to the DES outputs of the current G
    distribution. Returns ``(state, s_state, metrics)``.

    Adversarial-balance knobs (all opt-in, zero/None = the exact previous
    step math — docs/RESULTS.md: at the reference's 337-step epochs the D
    wins by ~epoch 12 even at d_lr=1e-4, and the G's location statistics
    drift during the D-dominated phase):

    * ``instance_noise=(sigma0, anneal_steps)`` — add N(0, sigma(t)^2) to
      every D input (real, fake, AND the G-update's proxy), with
      sigma(t) = sigma0 * max(0, 1 - step/anneal_steps). The classic
      overlap-inducing regularizer (Sonderby et al. 2017): while the two
      roll distributions are near-disjoint, noise keeps D's decision
      boundary soft so its gradients stay informative. sigma0 is in ROLL
      units (velocities reach ~126).
    * ``r1_gamma`` — R1 gradient penalty (Mescheder et al. 2018):
      gamma/2 * E_real ||grad_x D(x)||^2 added to the D loss, penalizing a
      D that sharpens around the data manifold (the collapse-to-1e-6-loss
      mode of the refsched run).
    * ``moment_match`` — G-side location anchor: lambda * MSE between the
      batch per-pitch mean activation profiles (both roll channels, mean
      over batch x time) of the straight-through proxy and the real batch.
      Targets exactly the first-moment gaps (pitch_mean, pitch_class,
      velocity_mean, note_density) the round-3 head-to-head lost, through
      the same surrogate gradient path as the BCE term.
    * ``moment_match_cond`` — the round-5 extension (VERDICT r4 #3): the
      per-pitch profile anchors unconditional mass but not the
      CONDITIONAL statistics the eval scores — E[velocity | onset],
      std[velocity | onset], E[duration | sounding]
      (eval/metrics.py::roll_metrics) — which is why velocity_mean and
      duration_mean stayed lost in the round-4 head-to-head. This term is
      lambda * the squared gaps of exactly those three statistics between
      the proxy (soft values through the surrogate path, onset/sounding
      masks stop-gradded from the DES's actual roll) and the real batch,
      each normalized to O(1) (velocities /126, durations /20). The
      masks being hard means the gradient moves the VALUES of currently
      active cells (the G2 velocity/tempo knobs the decoder consumes),
      not which cells are active — cell activation is the profile term's
      job.
    * ``r1_mode='fd'`` + ``r1_fd_eps`` — axon-compatible R1: the exact
      penalty's grad-of-grad conv program hangs the axon relay compile at
      reference shapes (PARITY.md "axon compile hang on grad-of-grad conv
      programs"), so this estimates gamma/2 * E||grad_x D||^2 by a
      central finite difference along one fresh Gaussian probe per sample
      per step: E_u[((D(x+eps u) - D(x-eps u)) / 2 eps)^2] over u~N(0,I)
      equals E[(grad_x D . u)^2] = ||grad_x D||^2 up to O(eps^2) FD error
      (zero where D is locally linear — LeakyReLU/conv/FC regions).
      Two extra D forwards, first-order-only autodiff, compiles on axon.
    * ``instance_noise_floor`` — anneal sigma(t) to this floor instead of
      0 (a permanent D noise floor keeps late-game gradients informative;
      the round-4 run died by ~epoch 9 once noise annealed away).
    """
    if r1_mode not in ("exact", "fd"):
        raise ValueError(f"r1_mode must be 'exact' or 'fd', got {r1_mode!r}")

    d_loss_fn = _make_mmgan_d_loss(d)
    sigma0, anneal_steps = instance_noise if instance_noise else (0.0, 1)

    def train_step(state: GANState, s_state: SurrogateState, real_roll,
                   fake_roll, mats, vec, noise1, noise2, beats, aux_key):
        if instance_noise:
            sig = instance_noise_floor + (sigma0 - instance_noise_floor) * jnp.maximum(
                0.0, 1.0 - state.step.astype(jnp.float32) / float(anneal_steps))
            kn = jax.random.fold_in(jax.random.key(balance_seed + 11), state.step)
            real_d = real_roll + sig * jax.random.normal(
                jax.random.fold_in(kn, 0), real_roll.shape)
            fake_d = fake_roll + sig * jax.random.normal(
                jax.random.fold_in(kn, 1), fake_roll.shape)
            proxy_noise = sig * jax.random.normal(
                jax.random.fold_in(kn, 2), fake_roll.shape)
        else:
            real_d, fake_d, proxy_noise = real_roll, fake_roll, 0.0

        if r1_gamma and r1_mode == "fd":
            def d_loss_r1_fd(d_params, real, fake):
                base = d_loss_fn(d_params, real, fake)
                ku = jax.random.fold_in(
                    jax.random.key(balance_seed + 13), state.step)
                u = jax.random.normal(ku, real.shape)
                d_plus = d.apply({"params": d_params}, real + r1_fd_eps * u)
                d_minus = d.apply({"params": d_params}, real - r1_fd_eps * u)
                ddir = (d_plus - d_minus).reshape(-1) / (2.0 * r1_fd_eps)
                return base + 0.5 * r1_gamma * jnp.mean(ddir ** 2)
            d_obj = d_loss_r1_fd
        elif r1_gamma:
            def d_loss_r1(d_params, real, fake):
                base = d_loss_fn(d_params, real, fake)
                grad_x = jax.grad(
                    lambda x: jnp.sum(d.apply({"params": d_params}, x)))(real)
                r1 = 0.5 * r1_gamma * jnp.mean(
                    jnp.sum(grad_x ** 2, axis=(1, 2, 3)))
                return base + r1
            d_obj = d_loss_r1
        else:
            d_obj = d_loss_fn
        d_loss, d_grads = jax.value_and_grad(d_obj)(state.d_params, real_d, fake_d)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        mats_sg = jax.lax.stop_gradient(mats)
        vec_sg = jax.lax.stop_gradient(vec)

        def s_loss_fn(s_params):
            pred = s.apply({"params": s_params}, mats_sg, vec_sg)
            return jnp.mean(((pred - fake_roll) / ROLL_SCALE) ** 2)

        s_loss, s_grads = jax.value_and_grad(s_loss_fn)(s_state.params)
        s_updates, s_opt = s_tx.update(s_grads, s_state.opt, s_state.params)
        s_params = optax.apply_updates(s_state.params, s_updates)
        new_s_state = SurrogateState(params=s_params, opt=s_opt, step=s_state.step + 1)

        s_frozen = jax.lax.stop_gradient(s_params)

        def g_loss_fn(g_params):
            mats_d, _ = g1.apply(
                {"params": g_params["g1"], "batch_stats": state.g_stats["g1"]},
                noise1, None, True, mutable=["batch_stats"], rngs={"aux": aux_key},
            )
            vec_d, _ = g2.apply(
                {"params": g_params["g2"], "batch_stats": state.g_stats["g2"]},
                noise2, beats, True, mutable=["batch_stats"],
            )
            s_roll = s.apply({"params": s_frozen}, mats_d, vec_d)
            proxy = fake_roll + s_roll - jax.lax.stop_gradient(s_roll)
            loss = bce_with_logits(
                d.apply({"params": d_params}, proxy + proxy_noise).squeeze(), 1.0)
            if moment_match:
                # per-pitch mean activation over (batch, time), both
                # channels — normalized by ROLL_SCALE so lambda is O(1)
                pf = jnp.mean(proxy, axis=(0, 3)) / ROLL_SCALE
                pr = jnp.mean(real_roll, axis=(0, 3)) / ROLL_SCALE
                loss = loss + moment_match * jnp.mean((pf - pr) ** 2)
            if moment_match_cond:
                mv_f, sv_f, md_f = soft_conditional_moments(proxy, fake_roll)
                mv_r, sv_r, md_r = soft_conditional_moments(real_roll, real_roll)
                loss = loss + moment_match_cond * (
                    ((mv_f - mv_r) / 126.0) ** 2
                    + ((sv_f - sv_r) / 126.0) ** 2
                    + ((md_f - md_r) / 20.0) ** 2)
            return loss

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        new_state = GANState(
            g_params=g_params, g_stats=state.g_stats,
            d_params=d_params, d_stats=state.d_stats,
            g_opt=g_opt, d_opt=d_opt, step=state.step + 1,
        )
        return new_state, new_s_state, {"d_loss": d_loss, "g_loss": g_loss,
                                        "s_loss": s_loss}

    return train_step


def make_scanned_steps(step_fn, K: int, n_carry: int = 1):
    """Chain K train steps into ONE XLA program via ``lax.scan`` (VERDICT
    r2 #6): the carry is the training state, so K steps pay a single
    host->device dispatch instead of K. Use where no host stage intervenes
    between steps — device-only benches and fixed-buffer regressions (the
    real MM-GAN loop's DES round trip *between* steps is exactly the regime
    where scanning does not apply).

    ``step_fn(*carry, *args) -> (*new_carry, ..., metrics)``: the first
    ``n_carry`` outputs thread as the scan carry (matching the first
    ``n_carry`` inputs); the LAST output (the metrics pytree) is stacked
    across the K steps; intermediate outputs are dropped. Returns
    ``scanned(*carry, *args) -> (*final_carry, stacked_metrics)``.

    One scan iteration runs the same traced math as one ``step_fn`` call,
    so K scanned steps are bitwise-equal to K separate launches
    (pinned in tests/test_scan_steps.py).
    """

    def scanned(*all_args):
        carry0, args = all_args[:n_carry], all_args[n_carry:]

        def body(carry, _):
            out = step_fn(*carry, *args)
            return tuple(out[:n_carry]), out[-1]

        carry, metrics = jax.lax.scan(body, tuple(carry0), None, length=K)
        return (*carry, metrics)

    return scanned


def make_surrogate_regression_scan(s, s_tx, K: int):
    """K surrogate regression steps over a device-resident (mats, vec,
    rolls) buffer in ONE XLA program — the pure-device use of scan
    batching: surrogate fitting has no host DES between steps, so K
    regression epochs amortize dispatch K-fold. Use to pre-fit the
    surrogate on replayed DES triples before enabling
    ``g_update='surrogate'`` (the online step then starts from a fitted
    renderer instead of a random one). Returns
    ``run(s_state, mats, vec, rolls) -> (s_state, losses[K])``; each
    iteration is bitwise-identical math to the surrogate update inside
    :func:`make_mmgan_train_step_surrogate`.
    """

    def loss_fn(params, mats, vec, rolls):
        pred = s.apply({"params": params}, mats, vec)
        return jnp.mean(((pred - rolls) / ROLL_SCALE) ** 2)

    def run(s_state: SurrogateState, mats, vec, rolls):
        mats = jax.lax.stop_gradient(mats)
        vec = jax.lax.stop_gradient(vec)

        def body(st, _):
            s_loss, s_grads = jax.value_and_grad(loss_fn)(st.params, mats,
                                                          vec, rolls)
            s_updates, s_opt = s_tx.update(s_grads, st.opt, st.params)
            return SurrogateState(
                params=optax.apply_updates(st.params, s_updates),
                opt=s_opt, step=st.step + 1), s_loss

        return jax.lax.scan(body, s_state, None, length=K)

    return run


def make_mmgan_train_step(g1, g2, d, g_tx, d_tx, g_update: str = "none",
                          fake_proxy_fn: Callable | None = None):
    """Returns ``train_step(state, real_roll, fake_roll, [noise1, noise2,
    beats, aux_key]) -> (state, metrics)`` with the D update and G loss
    fused into one jit.

    ``g_update='direct'`` uses ``fake_proxy_fn`` (default:
    :func:`make_default_fake_proxy`) to route gradients to the generators
    through a straight-through surrogate around the DES; the extra args are
    required in that mode.
    """
    if g_update not in ("none", "direct"):
        raise ValueError(f"unknown g_update mode {g_update!r}")
    if g_update == "direct" and fake_proxy_fn is None:
        fake_proxy_fn = make_default_fake_proxy(g1, g2)

    d_loss_fn = _make_mmgan_d_loss(d)

    def train_step(state: GANState, real_roll, fake_roll, noise1=None,
                   noise2=None, beats=None, aux_key=None):
        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params, real_roll, fake_roll)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        if g_update == "direct":
            def g_loss_fn(g_params):
                roll = fake_proxy_fn(g_params, state.g_stats, noise1, noise2,
                                     beats, aux_key, fake_roll)
                return bce_with_logits(d.apply({"params": d_params}, roll).squeeze(), 1.0)

            g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params)
        else:
            # faithful: the DES round-trip severed the graph; G sees zero grad
            g_loss = bce_with_logits(d.apply({"params": d_params}, fake_roll).squeeze(), 1.0)
            g_grads = jax.tree.map(jnp.zeros_like, state.g_params)

        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        new_state = GANState(
            g_params=g_params, g_stats=state.g_stats,
            d_params=d_params, d_stats=state.d_stats,
            g_opt=g_opt, d_opt=d_opt, step=state.step + 1,
        )
        return new_state, {"d_loss": d_loss, "g_loss": g_loss}

    return train_step


def make_mmgan_train_step_reinforce(g1, g2, d, g_tx, d_tx, sigma: float = 0.05):
    """One fused jitted step for ``g_update='reinforce'`` — the
    score-function estimator SURVEY.md §5.1 sketches, completing the
    G-training triad (direct / surrogate / reinforce):

    1. D update on (real, fake) — identical to the base step;
    2. G update by REINFORCE: the loop *sampled* the matrices/parameter
       vectors fed to the DES from N(G(z), sigma^2) (``mats_s``/``vec_s``),
       so the per-sample reward r_i = log D(fake_i) — computed on the roll
       the REAL simulator produced — weights the Gaussian log-density of
       that sample under the generator's (differentiable) means:

           g_loss = -mean( advantage_i * logprob_i )

       No surrogate, no straight-through bias: the gradient estimates
       d E[r] / d theta through the non-differentiable DES (up to the
       [0,1] clipping the loop applies to keep decode semantics, which
       censors the Gaussian tails). Advantages are batch-standardized —
       (r - mean) / (std + eps) — because an early D saturates its logits
       on every sample identically (rolls carry values up to ~127 through
       torch-default-init convs), and a raw advantage would then feed
       enormous equal weights into the gradient; standardization yields a
       zero G step exactly when the batch carries no ranking signal, and
       its per-batch centering subsumes a reward baseline.

    ``metrics["reward"]`` reports the batch-mean reward for monitoring.
    Returns ``step(state, real, fake, mats_s, vec_s, noise1, noise2, beats,
    aux_key) -> (state, metrics)``.
    """
    if not sigma > 0:
        raise ValueError(f"reinforce sigma must be > 0, got {sigma}")
    d_loss_fn = _make_mmgan_d_loss(d)
    inv_two_sigma2 = 1.0 / (2.0 * sigma * sigma)

    def train_step(state: GANState, real_roll, fake_roll, mats_s, vec_s,
                   noise1, noise2, beats, aux_key):
        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params, real_roll, fake_roll)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # reward on the DES's actual output, through the just-updated D:
        # log D(fake) = -softplus(-logit)
        logits = d.apply({"params": d_params}, fake_roll).squeeze(-1)
        reward = -jax.nn.softplus(-logits)
        advantage = jax.lax.stop_gradient(
            (reward - jnp.mean(reward)) / (jnp.std(reward) + 1e-6))

        mats_sg = jax.lax.stop_gradient(mats_s)
        vec_sg = jax.lax.stop_gradient(vec_s)

        def g_loss_fn(g_params):
            mu1, _ = g1.apply(
                {"params": g_params["g1"], "batch_stats": state.g_stats["g1"]},
                noise1, None, True, mutable=["batch_stats"], rngs={"aux": aux_key},
            )
            mu2, _ = g2.apply(
                {"params": g_params["g2"], "batch_stats": state.g_stats["g2"]},
                noise2, beats, True, mutable=["batch_stats"],
            )
            logprob = -(
                jnp.sum((mats_sg - mu1) ** 2, axis=(1, 2))
                + jnp.sum((vec_sg - mu2) ** 2, axis=1)
            ) * inv_two_sigma2
            return -jnp.mean(advantage * logprob)

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        new_state = GANState(
            g_params=g_params, g_stats=state.g_stats,
            d_params=d_params, d_stats=state.d_stats,
            g_opt=g_opt, d_opt=d_opt, step=state.step + 1,
        )
        return new_state, {"d_loss": d_loss, "g_loss": g_loss,
                           "reward": jnp.mean(reward)}

    return train_step


def make_mmgan_step_and_next_forward(g1, g2, d, g_tx, d_tx):
    """Dispatch-pipelined fusion of ``train_step(N)`` with ``gen_forward(N+1)``.

    In the training loop the D update for batch N and the G1+G2 forward for
    batch N+1 become runnable at the same moment (the forward's result is
    only consumed by the *host* DES stage afterwards), so they can share ONE
    compiled launch. On a remote-attached TPU the per-dispatch latency is a
    large fraction of the ~0.6 ms device step; halving the launches (plus
    donating the state) measured 1485 -> 2193 steps/s, +48%, in bench.py's
    best-of-3 on the same chip session. Semantics are identical to
    calling :func:`make_mmgan_train_step` then :func:`make_mmgan_gen_forward`
    on the post-update state (pinned by
    ``test_models_and_steps.py::test_fused_step_and_forward_equivalence``).

    Returns ``step(state, real, fake, noise1, noise2, beats, aux_key) ->
    (new_state_with_new_stats, mats, vec, metrics)``; jit with
    ``donate_argnums=(0,)``.
    """
    train_step = make_mmgan_train_step(g1, g2, d, g_tx, d_tx)
    gen_forward = make_mmgan_gen_forward(g1, g2)

    def step(state: GANState, real_roll, fake_roll, noise1, noise2, beats,
             aux_key=None):
        new_state, metrics = train_step(state, real_roll, fake_roll)
        mats, vec, new_stats = gen_forward(new_state, noise1, noise2, beats, aux_key)
        new_state = dataclasses.replace(new_state, g_stats=new_stats)
        return new_state, mats, vec, metrics

    return step


def init_mmgan_state(g1, g2, d, key, *, batch_size, z_dim, beat_dim, roll_size,
                     g_tx, d_tx) -> GANState:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    noise = jnp.zeros((batch_size, z_dim))
    beats = jnp.zeros((batch_size, beat_dim))
    roll = jnp.zeros((batch_size, *roll_size))
    v1 = g1.init({"params": k1, "aux": k4}, noise, beats, True)
    v2 = g2.init({"params": k2, "aux": k4}, noise, beats, True)
    vd = d.init(k3, roll)
    g_params = {"g1": v1["params"], "g2": v2["params"]}
    g_stats = {"g1": v1["batch_stats"], "g2": v2["batch_stats"]}
    return GANState(
        g_params=g_params,
        g_stats=g_stats,
        d_params=vd["params"],
        d_stats={},
        g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(vd["params"]),
        step=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------- GAN-DES


def make_gandes_gen_forward(gen):
    def forward(state: GANState, noise):
        out, vars_ = gen.apply(
            {"params": state.g_params, "batch_stats": state.g_stats},
            noise, True, mutable=["batch_stats"],
        )
        return out, vars_["batch_stats"]

    return forward


def make_gandes_train_step(gen, disc, g_tx, d_tx):
    """GAN-DES fused step: D update with label smoothing 0.9/0.1 on the
    *sigmoided* D outputs through BCE-with-logits (reference double-squash,
    `SIMNN.py:283-316`), then post-update generator loss (zero G grads —
    faithful to the detach at :299)."""

    d_loss_fn = _make_gandes_d_loss(disc)

    def train_step(state: GANState, real_mel, fake_mel):
        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params, real_mel, fake_mel)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        g_loss = bce_with_logits(
            disc.apply({"params": d_params}, fake_mel).squeeze(), 1.0
        )
        g_grads = jax.tree.map(jnp.zeros_like, state.g_params)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        new_state = GANState(
            g_params=g_params, g_stats=state.g_stats,
            d_params=d_params, d_stats=state.d_stats,
            g_opt=g_opt, d_opt=d_opt, step=state.step + 1,
        )
        return new_state, {"d_loss": d_loss, "g_loss": g_loss}

    return train_step


# mel-dB spectrograms span ~[-80, 0]; normalize the surrogate regression
# residual so the MSE is O(1)
MEL_SCALE = 40.0


def make_gandes_train_step_surrogate(gen, disc, s, g_tx, d_tx, s_tx):
    """GAN-DES ``g_update='surrogate'`` fused step (mirror of the MM-GAN
    one): D update with the reference's 0.9/0.1 smoothing, online surrogate
    regression matrix->mel against the pipeline's actual output, then a
    straight-through G update whose gradient flows through the just-updated
    (frozen) surrogate. Returns ``(state, s_state, metrics)``."""

    d_loss_fn = _make_gandes_d_loss(disc)

    def train_step(state: GANState, s_state: SurrogateState, real_mel,
                   fake_mel, mats, noise):
        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params, real_mel, fake_mel)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        mats_sg = jax.lax.stop_gradient(mats)

        def s_loss_fn(s_params):
            pred = s.apply({"params": s_params}, mats_sg)
            return jnp.mean(((pred - fake_mel) / MEL_SCALE) ** 2)

        s_loss, s_grads = jax.value_and_grad(s_loss_fn)(s_state.params)
        s_updates, s_opt = s_tx.update(s_grads, s_state.opt, s_state.params)
        s_params = optax.apply_updates(s_state.params, s_updates)
        new_s_state = SurrogateState(params=s_params, opt=s_opt, step=s_state.step + 1)

        s_frozen = jax.lax.stop_gradient(s_params)

        def g_loss_fn(g_params):
            mats_d, _ = gen.apply(
                {"params": g_params, "batch_stats": state.g_stats},
                noise, True, mutable=["batch_stats"],
            )
            s_mel = s.apply({"params": s_frozen}, mats_d)
            proxy = fake_mel + s_mel - jax.lax.stop_gradient(s_mel)
            return bce_with_logits(disc.apply({"params": d_params}, proxy).squeeze(), 1.0)

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        new_state = GANState(
            g_params=g_params, g_stats=state.g_stats,
            d_params=d_params, d_stats=state.d_stats,
            g_opt=g_opt, d_opt=d_opt, step=state.step + 1,
        )
        return new_state, new_s_state, {"d_loss": d_loss, "g_loss": g_loss,
                                        "s_loss": s_loss}

    return train_step


def make_gandes_train_step_reinforce(gen, disc, g_tx, d_tx, sigma: float = 0.05):
    """GAN-DES ``g_update='reinforce'`` fused step (mirror of the MM-GAN
    one): D update with the reference's 0.9/0.1 smoothing, then a
    score-function G update — the DES/synth/mel pipeline consumed matrices
    sampled from N(G(z), sigma^2) (``mats_s``), and the reward
    log D(mel) on the pipeline's ACTUAL output weights the Gaussian
    log-density of that sample under the generator's differentiable means.
    Advantages are batch-standardized (see the MM-GAN step's rationale).
    Returns ``step(state, real_mel, fake_mel, mats_s, noise) ->
    (state, metrics)``.
    """
    if not sigma > 0:
        raise ValueError(f"reinforce sigma must be > 0, got {sigma}")
    d_loss_fn = _make_gandes_d_loss(disc)
    inv_two_sigma2 = 1.0 / (2.0 * sigma * sigma)

    def train_step(state: GANState, real_mel, fake_mel, mats_s, noise):
        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params, real_mel, fake_mel)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # the GAN-DES D is already sigmoided (reference quirk) — its output
        # IS the probability; reward = log D(mel)
        probs = disc.apply({"params": d_params}, fake_mel).reshape(-1)
        reward = jnp.log(jnp.clip(probs, 1e-7, 1.0))
        advantage = jax.lax.stop_gradient(
            (reward - jnp.mean(reward)) / (jnp.std(reward) + 1e-6))

        mats_sg = jax.lax.stop_gradient(mats_s)

        def g_loss_fn(g_params):
            mu, _ = gen.apply(
                {"params": g_params, "batch_stats": state.g_stats},
                noise, True, mutable=["batch_stats"],
            )
            logprob = -jnp.sum((mats_sg - mu) ** 2, axis=(1, 2)) * inv_two_sigma2
            return -jnp.mean(advantage * logprob)

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        new_state = GANState(
            g_params=g_params, g_stats=state.g_stats,
            d_params=d_params, d_stats=state.d_stats,
            g_opt=g_opt, d_opt=d_opt, step=state.step + 1,
        )
        return new_state, {"d_loss": d_loss, "g_loss": g_loss,
                           "reward": jnp.mean(reward)}

    return train_step


def init_gandes_state(gen, disc, key, *, batch_size, z_dim=100, mel_shape=(128, 216),
                      g_tx=None, d_tx=None) -> GANState:
    k1, k2 = jax.random.split(key)
    v_g = gen.init(k1, jnp.zeros((batch_size, z_dim)), True)
    v_d = disc.init(k2, jnp.zeros((batch_size, *mel_shape)))
    return GANState(
        g_params=v_g["params"],
        g_stats=v_g["batch_stats"],
        d_params=v_d["params"],
        d_stats={},
        g_opt=g_tx.init(v_g["params"]),
        d_opt=d_tx.init(v_d["params"]),
        step=jnp.zeros((), jnp.int32),
    )
