"""Model shapes, fused train-step semantics, and multi-device sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from gandes_tpu.models import (
    BeatGenerator,
    DCGANGenerator,
    DiscriminatorCNN,
    DiscriminatorMLP,
    MelDiscriminator,
    MLPGenerator,
)
from gandes_tpu.parallel import make_mesh, shard_batch, shard_state
from gandes_tpu.train.steps import (
    init_gandes_state,
    init_mmgan_state,
    make_gandes_gen_forward,
    make_gandes_train_step,
    make_mmgan_gen_forward,
    make_mmgan_train_step,
    make_steplr,
)


def test_dcgan_generator_shape():
    gen = DCGANGenerator()
    v = gen.init(jax.random.key(0), jnp.zeros((4, 100)), True)
    out, _ = gen.apply(v, jax.random.normal(jax.random.key(1), (4, 100)), True,
                       mutable=["batch_stats"])
    assert out.shape == (4, 20, 20)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_mel_discriminator_shape():
    d = MelDiscriminator()
    v = d.init(jax.random.key(0), jnp.zeros((3, 128, 216)))
    out = d.apply(v, jax.random.normal(jax.random.key(1), (3, 128, 216)))
    assert out.shape == (3, 1)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()  # sigmoided


def test_mmgan_generator_shapes():
    g1 = MLPGenerator(adj_size=(64, 64))
    g2 = BeatGenerator(output_dim=20)
    noise = jnp.zeros((5, 50))
    beats = jnp.zeros((5, 50))
    v1 = g1.init({"params": jax.random.key(0), "aux": jax.random.key(9)}, noise, beats, True)
    v2 = g2.init({"params": jax.random.key(1), "aux": jax.random.key(9)}, noise, beats, True)
    o1, _ = g1.apply(v1, noise, beats, True, mutable=["batch_stats"])
    o2, _ = g2.apply(v2, noise, beats, True, mutable=["batch_stats"])
    assert o1.shape == (5, 64, 64)
    assert o2.shape == (5, 20)
    assert float(o1.min()) >= 0 and float(o1.max()) <= 1  # sigmoid blocks


def test_discriminators_shapes():
    roll = jnp.zeros((4, 2, 128, 50))
    dcnn = DiscriminatorCNN(roll_size=(2, 128, 50))
    v = dcnn.init(jax.random.key(0), roll)
    assert dcnn.apply(v, roll).shape == (4, 1)
    dmlp = DiscriminatorMLP(roll_size=(2, 128, 50))
    v2 = dmlp.init(jax.random.key(0), roll)
    assert dmlp.apply(v2, roll).shape == (4, 1)


def _mmgan_setup(batch=8, T=50):
    g1 = MLPGenerator(adj_size=(64, 64))
    g2 = BeatGenerator(output_dim=20)
    d = DiscriminatorCNN(roll_size=(2, 128, T))
    g_tx = optax.adam(0.01)
    d_tx = optax.adam(0.01)
    state = init_mmgan_state(g1, g2, d, jax.random.key(0), batch_size=batch,
                             z_dim=50, beat_dim=50, roll_size=(2, 128, T),
                             g_tx=g_tx, d_tx=d_tx)
    fwd = jax.jit(make_mmgan_gen_forward(g1, g2))
    step = jax.jit(make_mmgan_train_step(g1, g2, d, g_tx, d_tx))
    return state, fwd, step


def test_mmgan_train_step_semantics():
    state, fwd, step = _mmgan_setup()
    key = jax.random.key(42)
    noise1 = jax.random.normal(key, (8, 50))
    noise2 = jax.random.normal(jax.random.key(43), (8, 50))
    beats = jnp.zeros((8, 50))
    mats, params_vec, new_stats = fwd(state, noise1, noise2, beats)
    assert mats.shape == (8, 64, 64) and params_vec.shape == (8, 20)

    real = jax.random.uniform(jax.random.key(1), (8, 2, 128, 50)) * 100
    fake = jnp.zeros((8, 2, 128, 50))
    g_params_before = jax.tree.map(lambda x: np.asarray(x).copy(), state.g_params)
    d_params_before = jax.tree.map(lambda x: np.asarray(x).copy(), state.d_params)
    new_state, metrics = step(state, real, fake)
    assert np.isfinite(metrics["d_loss"]) and np.isfinite(metrics["g_loss"])
    # faithful semantics: D moved, G frozen (detach quirk)
    d_moved = jax.tree.reduce(
        lambda a, b: a or b,
        jax.tree.map(lambda a, b: bool(np.any(a != np.asarray(b))), d_params_before,
                     new_state.d_params),
    )
    g_moved = jax.tree.reduce(
        lambda a, b: a or b,
        jax.tree.map(lambda a, b: bool(np.any(a != np.asarray(b))), g_params_before,
                     new_state.g_params),
    )
    assert d_moved and not g_moved
    assert int(new_state.step) == 1


def test_fused_step_and_forward_equivalence():
    """make_mmgan_step_and_next_forward == train_step then gen_forward
    (one launch vs two), bitwise on params, stats, matrices and metrics."""
    from gandes_tpu.train.steps import make_mmgan_step_and_next_forward

    g1 = MLPGenerator(adj_size=(64, 64))
    g2 = BeatGenerator(output_dim=20)
    d = DiscriminatorCNN(roll_size=(2, 128, 50))
    g_tx, d_tx = optax.adam(0.01), optax.adam(0.01)
    state = init_mmgan_state(g1, g2, d, jax.random.key(0), batch_size=4,
                             z_dim=50, beat_dim=50, roll_size=(2, 128, 50),
                             g_tx=g_tx, d_tx=d_tx)
    fwd = jax.jit(make_mmgan_gen_forward(g1, g2))
    step = jax.jit(make_mmgan_train_step(g1, g2, d, g_tx, d_tx))
    fused = jax.jit(make_mmgan_step_and_next_forward(g1, g2, d, g_tx, d_tx))

    k = jax.random.key(7)
    noise1 = jax.random.normal(jax.random.fold_in(k, 0), (4, 50))
    noise2 = jax.random.normal(jax.random.fold_in(k, 1), (4, 50))
    beats = jnp.zeros((4, 50))
    real = jax.random.uniform(jax.random.fold_in(k, 2), (4, 2, 128, 50)) * 100
    fake = jax.random.uniform(jax.random.fold_in(k, 3), (4, 2, 128, 50)) * 100
    aux = jax.random.key(11)

    ref_state, ref_metrics = step(state, real, fake)
    ref_mats, ref_vec, ref_stats = fwd(ref_state, noise1, noise2, beats, aux)

    new_state, mats, vec, metrics = fused(state, real, fake, noise1, noise2,
                                          beats, aux)

    np.testing.assert_array_equal(np.asarray(mats), np.asarray(ref_mats))
    np.testing.assert_array_equal(np.asarray(vec), np.asarray(ref_vec))
    for name in ("d_loss", "g_loss"):
        np.testing.assert_array_equal(np.asarray(metrics[name]),
                                      np.asarray(ref_metrics[name]))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                 new_state.d_params, ref_state.d_params)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                 new_state.g_stats, ref_stats)
    assert int(new_state.step) == int(ref_state.step)


def test_mmgan_direct_g_update_moves_generators():
    """Improved mode: the straight-through surrogate gives G1/G2 real
    gradients (the reference's generators receive exactly zero)."""
    g1 = MLPGenerator(adj_size=(64, 64))
    g2 = BeatGenerator(output_dim=20)
    d = DiscriminatorCNN(roll_size=(2, 128, 50))
    g_tx = optax.adam(0.01)
    d_tx = optax.adam(0.01)
    state = init_mmgan_state(g1, g2, d, jax.random.key(0), batch_size=4,
                             z_dim=50, beat_dim=50, roll_size=(2, 128, 50),
                             g_tx=g_tx, d_tx=d_tx)
    step = jax.jit(make_mmgan_train_step(g1, g2, d, g_tx, d_tx, g_update="direct"))
    noise1 = jax.random.normal(jax.random.key(1), (4, 50))
    noise2 = jax.random.normal(jax.random.key(2), (4, 50))
    beats = jnp.zeros((4, 50))
    # small magnitudes: unnormalized 0..100 rolls saturate D's logits after
    # one update and the sigmoid gradient vanishes exactly
    real = jax.random.uniform(jax.random.key(3), (4, 2, 128, 50))
    fake = jax.random.uniform(jax.random.key(4), (4, 2, 128, 50))
    before = jax.tree.map(lambda x: np.asarray(x).copy(), state.g_params)
    new_state, metrics = step(state, real, fake, noise1, noise2, beats, jax.random.key(9))
    assert np.isfinite(metrics["g_loss"]) and float(metrics["g_loss"]) > 0
    moved = jax.tree.reduce(
        lambda a, b: a or b,
        jax.tree.map(lambda a, b: bool(np.any(a != np.asarray(b))), before,
                     new_state.g_params),
    )
    assert moved


def test_gandes_train_step():
    gen = DCGANGenerator()
    disc = MelDiscriminator()
    g_tx = optax.adam(2e-5, b1=0.5)
    d_tx = optax.adam(2e-5, b1=0.5)
    state = init_gandes_state(gen, disc, jax.random.key(0), batch_size=4,
                              g_tx=g_tx, d_tx=d_tx)
    fwd = jax.jit(make_gandes_gen_forward(gen))
    step = jax.jit(make_gandes_train_step(gen, disc, g_tx, d_tx))
    mats, _ = fwd(state, jax.random.normal(jax.random.key(7), (4, 100)))
    assert mats.shape == (4, 20, 20)
    real = jax.random.normal(jax.random.key(8), (4, 128, 216))
    fake = jax.random.normal(jax.random.key(9), (4, 128, 216))
    new_state, metrics = step(state, real, fake)
    assert np.isfinite(metrics["d_loss"]) and np.isfinite(metrics["g_loss"])


def test_steplr_schedule():
    sched = make_steplr(0.01, step_size_epochs=30, gamma=0.1, steps_per_epoch=337)
    assert sched(0) == pytest.approx(0.01)
    assert sched(29 * 337) == pytest.approx(0.01)
    assert sched(30 * 337) == pytest.approx(0.001)
    assert sched(60 * 337) == pytest.approx(0.0001)


def test_sequence_length_is_a_config_axis():
    """Longer piano rolls than the reference's T=50 compile through the
    same step factories — the sequence axis is static config, not a
    hardcoded shape (the reference requires re-pickling the dataset and
    editing literals, network_tests.py:219)."""
    for T in (96, 128):
        state, fwd, step = _mmgan_setup(batch=4, T=T)
        real = jax.random.uniform(jax.random.key(1), (4, 2, 128, T))
        fake = jnp.zeros((4, 2, 128, T))
        new_state, metrics = step(state, real, fake)
        assert np.isfinite(metrics["d_loss"]) and np.isfinite(metrics["g_loss"])
        # the surrogate step takes the same axis
        from gandes_tpu.models.surrogate import RollSurrogate
        from gandes_tpu.train.steps import (
            init_surrogate_state,
            make_mmgan_train_step_surrogate,
        )

        g1 = MLPGenerator(adj_size=(64, 64))
        g2 = BeatGenerator(output_dim=20)
        d = DiscriminatorCNN(roll_size=(2, 128, T))
        s = RollSurrogate(roll_size=(2, 128, T), vec_dim=20)
        tx = optax.adam(0.01)
        st = init_mmgan_state(g1, g2, d, jax.random.key(0), batch_size=4,
                              z_dim=50, beat_dim=50, roll_size=(2, 128, T),
                              g_tx=tx, d_tx=tx)
        ss = init_surrogate_state(s, jax.random.key(2), batch_size=4,
                                  adj_size=(64, 64), vec_dim=20, s_tx=tx)
        sstep = jax.jit(make_mmgan_train_step_surrogate(g1, g2, d, s, tx, tx, tx))
        mats = jnp.zeros((4, 64, 64))
        vec = jnp.zeros((4, 20))
        n1 = jax.random.normal(jax.random.key(3), (4, 50))
        st2, ss2, m = sstep(st, ss, real, fake, mats, vec, n1, n1,
                            jnp.zeros((4, 50)), jax.random.key(4))
        assert np.isfinite(m["s_loss"])


def test_multichip_sharded_step():
    """Full MM-GAN train step over a (4, 2) dp x tp mesh (8 virtual CPU
    devices, see conftest)."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(dp=4, tp=2, n_devices=8)
    state, fwd, step = _mmgan_setup(batch=8)
    state = shard_state(state, mesh)
    # the big G1 kernel (64 -> 4096) must actually be tp-sharded
    kernel = state.g_params["g1"]["_GenBlock_3"]["Dense_0"]["kernel"]
    assert "tp" in str(kernel.sharding.spec)

    batch = shard_batch(
        {
            "noise1": jax.random.normal(jax.random.key(1), (8, 50)),
            "noise2": jax.random.normal(jax.random.key(2), (8, 50)),
            "beats": jnp.zeros((8, 50)),
            "real": jax.random.uniform(jax.random.key(3), (8, 2, 128, 50)),
            "fake": jnp.zeros((8, 2, 128, 50)),
        },
        mesh,
    )
    mats, vec, _ = fwd(state, batch["noise1"], batch["noise2"], batch["beats"])
    assert mats.shape == (8, 64, 64)
    new_state, metrics = step(state, batch["real"], batch["fake"])
    assert np.isfinite(metrics["d_loss"])
    # dp sharding of inputs preserved end-to-end
    assert "dp" in str(batch["real"].sharding.spec)


def test_multichip_sharded_step_matches_single_device():
    """The jit+NamedSharding mesh path computes the same math as one
    device: D update and metrics agree, and — the sync-BN claim in
    docs/SCALING.md — the generators' BatchNorm batch statistics from the
    sharded forward equal the single-device statistics (their mean/var
    reductions run over the dp-sharded batch axis, so GSPMD inserts the
    cross-shard reduction; nothing per-shard leaks into the stats)."""
    mesh = make_mesh(dp=4, tp=2, n_devices=8)
    state, fwd, step = _mmgan_setup(batch=8)
    sstate = shard_state(state, mesh)

    noise1 = jax.random.normal(jax.random.key(11), (8, 50))
    noise2 = jax.random.normal(jax.random.key(12), (8, 50))
    beats = jnp.zeros((8, 50))
    real = jax.random.uniform(jax.random.key(13), (8, 2, 128, 50)) * 100
    fake = jax.random.uniform(jax.random.key(14), (8, 2, 128, 50))
    batch = shard_batch({"noise1": noise1, "noise2": noise2, "beats": beats,
                         "real": real, "fake": fake}, mesh)

    mats0, vec0, stats0 = fwd(state, noise1, noise2, beats)
    mats1, vec1, stats1 = fwd(sstate, batch["noise1"], batch["noise2"],
                              batch["beats"])
    np.testing.assert_allclose(np.asarray(mats1), np.asarray(mats0),
                               rtol=0, atol=1e-5)
    for p0, p1 in zip(jax.tree.leaves(stats0), jax.tree.leaves(stats1)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                                   rtol=1e-5, atol=1e-6)

    new0, m0 = step(state, real, fake)
    new1, m1 = step(sstate, batch["real"], batch["fake"])
    np.testing.assert_allclose(float(m1["d_loss"]), float(m0["d_loss"]),
                               rtol=1e-5)
    for p0, p1 in zip(jax.tree.leaves(new0.d_params),
                      jax.tree.leaves(new1.d_params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                                   rtol=1e-4, atol=1e-6)
