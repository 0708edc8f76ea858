"""Explicit-collective data-parallel train step (shard_map + pmean).

The jit+NamedSharding path (parallel/mesh.py) lets XLA place collectives;
this module is the hand-written SPMD equivalent: the batch is sharded over
the ``dp`` mesh axis, every shard computes local losses/gradients, and
``lax.pmean`` over ICI reduces them — gradients and therefore parameter
updates are bitwise-replicated across shards. Both paths compute the same
math (tests/test_shard_map_step.py pins equivalence with the single-device
step); this one exists for cases where explicit collective placement or
per-shard side computation is wanted, and as the building block for
overlapping custom Pallas collectives later.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gandes_tpu.train.losses import bce_with_logits
from gandes_tpu.train.steps import GANState


def make_mmgan_train_step_shmap(g1, g2, d, g_tx, d_tx, mesh: Mesh):
    """DP train step with explicit pmean gradient reduction over 'dp'.

    Params/opt state are replicated; ``real_roll``/``fake_roll`` are
    sharded on their batch axis. Faithful semantics (G gets zero grads).
    """

    def d_loss_fn(d_params, real, fake):
        logits_fake = d.apply({"params": d_params}, fake)
        logits_real = d.apply({"params": d_params}, real)
        return bce_with_logits(logits_fake.squeeze(), 0.0) + bce_with_logits(
            logits_real.squeeze(), 1.0
        )

    def local_step(state: GANState, real, fake):
        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params, real, fake)
        # mean-of-means == full-batch mean for equal shards; ICI collective
        d_grads = jax.lax.pmean(d_grads, "dp")
        d_loss = jax.lax.pmean(d_loss, "dp")
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        g_loss = jax.lax.pmean(
            bce_with_logits(d.apply({"params": d_params}, fake).squeeze(), 1.0), "dp"
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

    # check_vma=False keeps classic manual semantics: jax.grad returns the
    # LOCAL gradient and the pmean above is the one real collective. Under
    # the default vma-aware tracing (jax>=0.8), autodiff already inserts a
    # psum for replicated params (the cotangent of a replicated input is the
    # cross-shard sum), so an explicit pmean on top would scale gradients by
    # the axis size — tests/test_shard_map_step.py pins the correct scale.
    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P("dp"), P("dp")),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(state, real_roll, fake_roll):
        return sharded(state, real_roll, fake_roll)

    return step
