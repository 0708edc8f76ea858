"""g_update='reinforce': score-function G training through the real DES.

The third G-training mode (after 'direct' and 'surrogate'): the DES
consumes N(G(z), sigma^2) samples and log D(roll) on the simulator's
actual output weights the Gaussian log-density. These tests pin the fused
step's semantics (G moves along the advantage direction, standardized
advantages subsume a baseline) and run the training loop end to end.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp
import optax

from gandes_tpu.models import BeatGenerator, DiscriminatorCNN, MLPGenerator
from gandes_tpu.train.steps import (
    init_mmgan_state,
    make_mmgan_gen_forward,
    make_mmgan_train_step_reinforce,
)


def test_reinforce_step_moves_generators():
    B, T = 4, 50
    g1 = MLPGenerator(adj_size=(64, 64))
    g2 = BeatGenerator(output_dim=20)
    d = DiscriminatorCNN(roll_size=(2, 128, T))
    g_tx, d_tx = optax.adam(0.01), optax.adam(0.01)
    state = init_mmgan_state(g1, g2, d, jax.random.key(0), batch_size=B,
                             z_dim=50, beat_dim=50, roll_size=(2, 128, T),
                             g_tx=g_tx, d_tx=d_tx)
    fwd = jax.jit(make_mmgan_gen_forward(g1, g2))
    step = jax.jit(make_mmgan_train_step_reinforce(g1, g2, d, g_tx, d_tx,
                                                   sigma=0.05))

    k = jax.random.key(1)
    noise1 = jax.random.normal(jax.random.fold_in(k, 0), (B, 50))
    noise2 = jax.random.normal(jax.random.fold_in(k, 1), (B, 50))
    beats = jnp.zeros((B, 50))
    aux = jax.random.key(2)
    mats, vec, _ = fwd(state, noise1, noise2, beats, aux)
    # perturbed samples (what the DES would consume) + a fake roll standing
    # in for the DES output — varied per sample so rewards differ
    mats_s = jnp.clip(mats + 0.05 * jax.random.normal(jax.random.fold_in(k, 2), mats.shape), 0, 1)
    vec_s = jnp.clip(vec + 0.05 * jax.random.normal(jax.random.fold_in(k, 3), vec.shape), 0, 1)
    # moderate scale keeps the fresh D's logits unsaturated so per-sample
    # rewards actually rank (saturated batches standardize to zero
    # advantage by design)
    fake = jax.random.uniform(jax.random.fold_in(k, 4), (B, 2, 128, T))
    real = jax.random.uniform(jax.random.fold_in(k, 5), (B, 2, 128, T))

    g_before = jax.tree.map(lambda x: np.asarray(x).copy(), state.g_params)
    new_state, metrics = step(state, real, fake, mats_s, vec_s,
                              noise1, noise2, beats, aux)
    assert np.isfinite(metrics["d_loss"]) and np.isfinite(metrics["g_loss"])
    assert np.isfinite(metrics["reward"])
    moved = jax.tree.reduce(
        lambda a, b: a or b,
        jax.tree.map(lambda a, b: bool(np.any(a != np.asarray(b))),
                     g_before, new_state.g_params))
    assert moved, "REINFORCE must move the generator parameters"
    assert int(new_state.step) == 1


def test_reinforce_sigma_validation():
    import pytest

    from gandes_tpu.train.steps import make_gandes_train_step_reinforce

    g1 = MLPGenerator(adj_size=(64, 64))
    g2 = BeatGenerator(output_dim=20)
    d = DiscriminatorCNN(roll_size=(2, 128, 50))
    tx = optax.adam(0.01)
    for bad in (0.0, -0.1):
        with pytest.raises(ValueError, match="sigma"):
            make_mmgan_train_step_reinforce(g1, g2, d, tx, tx, sigma=bad)
        with pytest.raises(ValueError, match="sigma"):
            make_gandes_train_step_reinforce(g1, d, tx, tx, sigma=bad)


def test_gandes_reinforce_training_loop(tmp_path, monkeypatch):
    """Symmetric mode for the GAN-DES pipeline: the whole
    DES->synth->mel chain sits between the sample and the reward."""
    from gandes_tpu.train.gandes_loop import GanDesConfig, train_gandes

    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    rng = np.random.RandomState(0)
    batches = [rng.rand(4, 128, 216).astype(np.float32) * 40 - 40
               for _ in range(2)]
    cfg = GanDesConfig(batch_size=4, model_path=str(tmp_path / "models"),
                       number_of_customers=120, max_sim_time=0.3,
                       save_step=99, g_update="reinforce", lr=1e-3,
                       write_wav=False)
    np.random.seed(2)
    state, history = train_gandes(iter(batches), cfg, max_steps=2)
    assert all(np.isfinite(v) for v in history["disc"])
    assert all(np.isfinite(v) for v in history["gen"])


def test_reinforce_training_loop(midi_fixture_dir, tmp_path, monkeypatch):
    from gandes_tpu.data.datasets import MaestroDatasetPickle, build_window_pickle
    from gandes_tpu.train.mmgan_loop import MMGANConfig, train_mmgan

    out = str(tmp_path / "w.pkl")
    build_window_pickle(str(midi_fixture_dir), out, sequence_length=50)
    ds = MaestroDatasetPickle(out, data_dir=".")

    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    cfg = MMGANConfig(batch_size=2, num_epochs=1, start=0, sequence_length=50,
                      models_dir=str(tmp_path / "models"),
                      losses_dir=str(tmp_path / "losses"), seed=1,
                      g_update="reinforce", lr=1e-3)
    np.random.seed(0)
    state, history = train_mmgan(ds, cfg, max_batches=2)
    assert len(history["disc"][0]) == 2
    assert all(np.isfinite(v) for v in history["disc"][0])
    assert all(np.isfinite(v) for v in history["gen"][0])
    assert os.path.isdir(tmp_path / "models" / "mmgan_64_64_epoch_1")
