"""Scan-batched device stepping (VERDICT r2 #6): K steps chained in ONE
XLA program via ``make_scanned_steps`` / ``make_surrogate_regression_scan``
are bitwise-equal to K separate launches of the same step.

These cover the regimes where scanning is semantically sound — no host DES
between steps: device-only stepping (the bench's dispatch-amortized
ceiling) and fixed-buffer surrogate regression (pre-fitting the surrogate
on replayed DES triples).
"""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from gandes_tpu.models import BeatGenerator, DiscriminatorCNN, MLPGenerator
from gandes_tpu.models.surrogate import RollSurrogate
from gandes_tpu.train.steps import (
    init_mmgan_state,
    init_surrogate_state,
    make_mmgan_step_and_next_forward,
    make_scanned_steps,
    make_surrogate_regression_scan,
)

B, T, K = 2, 50, 4


def _assert_tree_equal(a, b):
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        a, b)


def test_scanned_steps_bitwise_equal_k_launches():
    g1 = MLPGenerator(adj_size=(64, 64))
    g2 = BeatGenerator(output_dim=20)
    d = DiscriminatorCNN(roll_size=(2, 128, T))
    g_tx, d_tx = optax.adam(0.01), optax.adam(0.01)
    state = init_mmgan_state(g1, g2, d, jax.random.key(0), batch_size=B,
                             z_dim=50, beat_dim=50, roll_size=(2, 128, T),
                             g_tx=g_tx, d_tx=d_tx)
    one = make_mmgan_step_and_next_forward(g1, g2, d, g_tx, d_tx)

    k = jax.random.key(1)
    noise = jax.random.normal(k, (B, 50))
    beats = jnp.zeros((B, 50))
    real = jax.random.uniform(jax.random.fold_in(k, 1), (B, 2, 128, T)) * 100
    fake = jax.random.uniform(jax.random.fold_in(k, 2), (B, 2, 128, T)) * 100
    args = (real, fake, noise, noise, beats)

    scanned = jax.jit(make_scanned_steps(one, K))
    s_scan, metrics_scan = scanned(state, *args)

    # bitwise: one K-step launch == K one-step launches. The one-step
    # launch is scan-length-1 so both sides compile the step as a loop
    # body — the apples-to-apples dispatch-amortization claim.
    one_step = jax.jit(make_scanned_steps(one, 1))
    s_loop, losses = state, []
    for _ in range(K):
        s_loop, metrics = one_step(s_loop, *args)
        losses.append(jax.tree.map(lambda x: x[0], metrics))

    _assert_tree_equal(s_scan, s_loop)
    # stacked metrics: row i of the scan == launch i's metrics
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *losses)
    _assert_tree_equal(metrics_scan, stacked)

    # vs the plain (non-scan) jitted step, XLA's fusion choices inside a
    # loop body may differ from the standalone program's, so equality is
    # ULP-level, not bitwise; Adam's 1/(sqrt(v)+eps) then amplifies those
    # ULPs where the second moment is near zero — pin that the drift stays
    # in that regime (measured max ~4e-6 absolute after K=4 steps).
    per_launch = jax.jit(one)
    s_plain = state
    for _ in range(K):
        s_plain, _mats, _vec, _m = per_launch(s_plain, *args)
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=5e-3, atol=1e-4),
        s_scan, s_plain)


def test_surrogate_regression_scan_bitwise_equal_k_launches():
    s = RollSurrogate(roll_size=(2, 128, T), vec_dim=20)
    s_tx = optax.adam(1e-3)
    s_state = init_surrogate_state(s, jax.random.key(3), batch_size=B,
                                   adj_size=(64, 64), vec_dim=20, s_tx=s_tx)
    k = jax.random.key(4)
    mats = jax.random.uniform(k, (B, 64, 64))
    vec = jax.random.uniform(jax.random.fold_in(k, 1), (B, 20))
    rolls = jax.random.uniform(jax.random.fold_in(k, 2), (B, 2, 128, T)) * 100

    run_k = jax.jit(make_surrogate_regression_scan(s, s_tx, K))
    st_scan, losses_scan = run_k(s_state, mats, vec, rolls)

    run_1 = jax.jit(make_surrogate_regression_scan(s, s_tx, 1))
    st_loop, losses = s_state, []
    for _ in range(K):
        st_loop, l = run_1(st_loop, mats, vec, rolls)
        losses.append(np.asarray(l)[0])

    _assert_tree_equal(st_scan, st_loop)
    np.testing.assert_array_equal(np.asarray(losses_scan), np.asarray(losses))
    # the regression actually descends on the fixed buffer
    assert float(losses_scan[-1]) < float(losses_scan[0])
