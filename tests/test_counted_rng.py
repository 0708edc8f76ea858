"""counted_rng: deriving per-step noise/aux streams inside the jitted
G-forward (steps.py::make_*_gen_forward_counted) is bitwise-identical to
the loops' eager derivation — it exists to cut eager dispatches and the
axon client's per-transfer leak (core/transfer.py), not to change any
stream."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_mmgan_counted_forward_bitwise():
    from gandes_tpu.train.mmgan_loop import MMGANConfig, init_state_for_config
    from gandes_tpu.train.steps import (
        make_mmgan_gen_forward,
        make_mmgan_gen_forward_counted,
    )

    cfg = MMGANConfig(batch_size=4, seed=11)
    state, (g1, g2, d), _ = init_state_for_config(cfg, 1, batch_size=4)
    eager = jax.jit(make_mmgan_gen_forward(g1, g2))  # the loop jits both paths
    counted = jax.jit(make_mmgan_gen_forward_counted(
        g1, g2, seed=cfg.seed, z_dim=cfg.noise_dim))
    beats = jnp.linspace(0.0, 3.0, 4 * cfg.max_beat_length).reshape(
        4, cfg.max_beat_length)

    for count in (1, 2, 57):
        kb = jax.random.fold_in(jax.random.key(cfg.seed + 1), count)
        n1 = jax.random.normal(jax.random.fold_in(kb, 0), (4, cfg.noise_dim))
        n2 = jax.random.normal(jax.random.fold_in(kb, 1), (4, cfg.noise_dim))
        auxk = jax.random.fold_in(jax.random.key(cfg.seed + 4), count)
        em, ev, estats = eager(state, n1, n2, beats, auxk)
        cm, cv, cstats, cn1, cn2, cauxk = counted(state, count, beats)
        np.testing.assert_array_equal(np.asarray(cn1), np.asarray(n1))
        np.testing.assert_array_equal(np.asarray(cn2), np.asarray(n2))
        np.testing.assert_array_equal(
            jax.random.key_data(cauxk), jax.random.key_data(auxk))
        np.testing.assert_array_equal(np.asarray(cm), np.asarray(em))
        np.testing.assert_array_equal(np.asarray(cv), np.asarray(ev))
        for k in ("g1", "g2"):
            for a, b in zip(jax.tree.leaves(cstats[k]),
                            jax.tree.leaves(estats[k])):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mmgan_counted_reinforce_bitwise():
    from gandes_tpu.train.mmgan_loop import MMGANConfig, init_state_for_config
    from gandes_tpu.train.steps import (
        make_mmgan_gen_forward,
        make_mmgan_gen_forward_counted,
    )

    cfg = MMGANConfig(batch_size=2, seed=5, g_update="reinforce",
                      reinforce_sigma=0.05)
    state, (g1, g2, d), _ = init_state_for_config(cfg, 1, batch_size=2)
    # mirror the loop exactly: the forward is jitted, the reinforce
    # perturbation is EAGER arithmetic on its outputs
    eager = jax.jit(make_mmgan_gen_forward(g1, g2))
    counted = jax.jit(make_mmgan_gen_forward_counted(
        g1, g2, seed=cfg.seed, z_dim=cfg.noise_dim,
        reinforce_sigma=cfg.reinforce_sigma))
    beats = jnp.zeros((2, cfg.max_beat_length))
    count = 3

    # the loop's exact eager arithmetic (mmgan_loop.py fake_batch)
    kb = jax.random.fold_in(jax.random.key(cfg.seed + 1), count)
    n1 = jax.random.normal(jax.random.fold_in(kb, 0), (2, cfg.noise_dim))
    n2 = jax.random.normal(jax.random.fold_in(kb, 1), (2, cfg.noise_dim))
    auxk = jax.random.fold_in(jax.random.key(cfg.seed + 4), count)
    mats, vec, _ = eager(state, n1, n2, beats, auxk)
    ks = jax.random.fold_in(jax.random.key(cfg.seed + 3), count)
    mats = jnp.clip(mats + cfg.reinforce_sigma * jax.random.normal(
        jax.random.fold_in(ks, 0), mats.shape), 0.0, 1.0)
    vec = jnp.clip(vec + cfg.reinforce_sigma * jax.random.normal(
        jax.random.fold_in(ks, 1), vec.shape), 0.0, 1.0)

    cm, cv, _, cn1, cn2, _ = counted(state, count, beats)
    # the perturbation STREAMS are bitwise; the +/* arithmetic fuses
    # (FMA) inside the counted program, so values may differ by 1 ULP —
    # pinned here so a larger drift fails
    np.testing.assert_array_equal(np.asarray(cn1), np.asarray(n1))
    np.testing.assert_array_equal(np.asarray(cn2), np.asarray(n2))
    np.testing.assert_allclose(np.asarray(cm), np.asarray(mats),
                               rtol=0, atol=1.5e-7)
    np.testing.assert_allclose(np.asarray(cv), np.asarray(vec),
                               rtol=0, atol=1.5e-7)


def test_gandes_counted_forward_bitwise():
    import optax

    from gandes_tpu.models.gan_des import DCGANGenerator, MelDiscriminator
    from gandes_tpu.train.gandes_loop import GanDesConfig
    from gandes_tpu.train.steps import (
        init_gandes_state,
        make_gandes_gen_forward,
        make_gandes_gen_forward_counted,
    )

    cfg = GanDesConfig(batch_size=3, seed=2, reinforce_sigma=0.05)
    gen = DCGANGenerator(noise_dim=cfg.z_dim)
    disc = MelDiscriminator()
    state = init_gandes_state(gen, disc, jax.random.key(cfg.seed),
                              batch_size=3, z_dim=cfg.z_dim,
                              mel_shape=cfg.mel_shape,
                              g_tx=optax.adam(cfg.lr), d_tx=optax.adam(cfg.lr))
    eager = jax.jit(make_gandes_gen_forward(gen))
    counted = jax.jit(make_gandes_gen_forward_counted(
        gen, seed=cfg.seed, z_dim=cfg.z_dim,
        reinforce_sigma=cfg.reinforce_sigma))
    batch_like = jnp.zeros((3, 128, 216))

    for step in (0, 1, 9):
        n = jax.random.normal(
            jax.random.fold_in(jax.random.key(cfg.seed + 1), step),
            (3, cfg.z_dim))
        em, _ = eager(state, n)
        em = jnp.clip(em + cfg.reinforce_sigma * jax.random.normal(
            jax.random.fold_in(jax.random.key(cfg.seed + 3), step),
            em.shape), 0.0, 1.0)
        cm, _, cn = counted(state, step, batch_like)
        np.testing.assert_array_equal(np.asarray(cn), np.asarray(n))
        # reinforce perturbation: streams bitwise, arithmetic may fuse
        # (FMA) -> <= 1 ULP (see the mmgan reinforce case above)
        np.testing.assert_allclose(np.asarray(cm), np.asarray(em),
                                   rtol=0, atol=1.5e-7)


def test_mmgan_loop_bitwise_counted_on_vs_off(midi_fixture_dir, tmp_path,
                                              monkeypatch):
    from gandes_tpu.data.datasets import MaestroDatasetPickle, build_window_pickle
    from gandes_tpu.train.mmgan_loop import MMGANConfig, train_mmgan

    out = str(tmp_path / "w.pkl")
    build_window_pickle(str(midi_fixture_dir), out, sequence_length=50)
    ds = MaestroDatasetPickle(out, data_dir=".")
    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)

    def run(tag, counted):
        cfg = MMGANConfig(batch_size=2, num_epochs=1, start=0,
                          sequence_length=50, seed=1, resume=False,
                          g_update="surrogate", counted_rng=counted,
                          models_dir=str(tmp_path / f"models_{tag}"),
                          losses_dir=str(tmp_path / f"losses_{tag}"))
        np.random.seed(0)
        _, hist = train_mmgan(ds, cfg, max_batches=2)
        return hist

    h_on = run("on", True)
    h_off = run("off", False)
    assert h_on["disc"] == h_off["disc"]
    assert h_on["gen"] == h_off["gen"]
