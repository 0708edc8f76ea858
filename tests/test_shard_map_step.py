"""Explicit shard_map DP step == single-device step (same math)."""

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gandes_tpu.models import BeatGenerator, DiscriminatorCNN, MLPGenerator
from gandes_tpu.parallel.shard_map_step import make_mmgan_train_step_shmap
from gandes_tpu.train.steps import init_mmgan_state, make_mmgan_train_step


def test_shard_map_step_matches_single_device():
    assert len(jax.devices()) >= 8
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8, 1)[:, 0], axis_names=("dp",))

    g1 = MLPGenerator(adj_size=(64, 64))
    g2 = BeatGenerator(output_dim=20)
    d = DiscriminatorCNN(roll_size=(2, 128, 50))
    # SGD, not Adam: Adam's update is lr*g/(|g|+eps), so for near-zero
    # gradient elements the pmean association noise gets amplified to O(lr)
    # and post-step params are irreproducible across reduction orders by
    # construction. SGD is linear in the gradient — a sharp equivalence test.
    g_tx, d_tx = optax.sgd(0.01), optax.sgd(0.01)
    state = init_mmgan_state(g1, g2, d, jax.random.key(0), batch_size=16,
                             z_dim=50, beat_dim=50, roll_size=(2, 128, 50),
                             g_tx=g_tx, d_tx=d_tx)

    real = jax.random.uniform(jax.random.key(1), (16, 2, 128, 50))
    fake = jax.random.uniform(jax.random.key(2), (16, 2, 128, 50))

    ref_step = jax.jit(make_mmgan_train_step(g1, g2, d, g_tx, d_tx))
    ref_state, ref_metrics = ref_step(state, real, fake)

    sh_step = make_mmgan_train_step_shmap(g1, g2, d, g_tx, d_tx, mesh)
    real_s = jax.device_put(real, NamedSharding(mesh, P("dp")))
    fake_s = jax.device_put(fake, NamedSharding(mesh, P("dp")))
    sh_state, sh_metrics = sh_step(state, real_s, fake_s)

    # mean-of-shard-means vs full-batch mean: same value up to reduction
    # association (~1 ulp)
    np.testing.assert_allclose(float(sh_metrics["d_loss"]),
                               float(ref_metrics["d_loss"]), rtol=1e-6)
    # g_loss here is near-zero (~1e-5), so association noise is relatively
    # large; 1e-4 still pins mean-of-means == full-batch mean semantics
    np.testing.assert_allclose(float(sh_metrics["g_loss"]),
                               float(ref_metrics["g_loss"]), rtol=1e-4)
    leaves_ref = jax.tree.leaves(ref_state.d_params)
    leaves_sh = jax.tree.leaves(sh_state.d_params)
    for a, b in zip(leaves_ref, leaves_sh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)
