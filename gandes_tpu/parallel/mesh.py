"""Device mesh + sharding layout for GAN training.

The reference is single-process/single-device (SURVEY.md section 2: no
DP/TP/PP anywhere). The idiomatic TPU treatment: a 2-D ``Mesh`` with axes

* ``dp`` — data parallel: the batch (real rolls / mels, noise, host-decoded
  fake batches) is sharded on its leading axis; gradient reduction becomes
  XLA ``psum`` over ICI inserted automatically by jit through the sharded
  autodiff.
* ``tp`` — tensor parallel: large Dense/Conv kernels are sharded on their
  output-feature axis (column parallel). The models are MLP/CNN stacks with
  one dominant matmul each (G1's hidden->4096 projection, D's flatten->FC),
  so column sharding its kernel + replicating the small layers is the whole
  story; XLA inserts the all-gathers where activations re-materialize.

PP/EP are intentionally absent: the model family has no pipeline-depth or
MoE structure to exploit (4-layer MLPs / 2-conv CNNs); a pipeline stage
boundary would cost more in bubbles than it saves. SP (sequence/context
parallelism) is unnecessary at T=50..216 but the step functions take the
sequence axis as a config value, so longer rolls compile under the same
layout.

Everything uses ``jax.sharding`` NamedSharding + jit: annotate inputs,
let the compiler place collectives (scaling-book recipe).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, dp: int | None = None, tp: int | None = None,
              devices=None) -> Mesh:
    """A (dp, tp) mesh over the available (or given) devices. Defaults:
    tp = min(2, n) when n is even, rest data-parallel."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if tp is None:
        tp = 2 if (n % 2 == 0 and n >= 2) else 1
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp}) * tp({tp}) != n_devices({n})")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def _param_spec(path_leaf: tuple, arr, tp_size: int, min_tp_dim: int = 256) -> P:
    """Column-parallel rule: shard the output-feature (last) axis of large
    kernels across ``tp``. Kernels whose output axis is small but whose
    INPUT axis is large (the discriminators' flatten->FC heads: 12288x1,
    55296x128) shard row-parallel on the contracted axis instead — XLA
    turns the contraction into a psum over ICI. Everything else replicates."""
    if arr.ndim >= 2 and arr.shape[-1] >= min_tp_dim and arr.shape[-1] % tp_size == 0:
        return P(*([None] * (arr.ndim - 1)), "tp")
    if arr.ndim >= 2 and arr.shape[-2] >= min_tp_dim and arr.shape[-2] % tp_size == 0:
        return P(*([None] * (arr.ndim - 2)), "tp", None)
    return P()


def state_shardings(state, mesh: Mesh, min_tp_dim: int = 256):
    """A GANState-shaped pytree of NamedShardings (params column-parallel
    on tp, optimizer moments following their params, scalars replicated)."""
    tp_size = mesh.shape["tp"]

    def spec_of(arr):
        if not hasattr(arr, "ndim"):
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _param_spec((), arr, tp_size, min_tp_dim))

    return jax.tree.map(spec_of, state)


def shard_state(state, mesh: Mesh, min_tp_dim: int = 256):
    shardings = state_shardings(state, mesh, min_tp_dim)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), state, shardings)


def shard_batch(batch, mesh: Mesh):
    """Shard array leading axes over dp (batch parallel). Leading axes not
    divisible by dp (e.g. GAN-DES's variable my_collate batches) replicate —
    correct math, just no batch-split for that batch."""
    dp = mesh.shape["dp"]

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % dp == 0:
            return jax.device_put(x, NamedSharding(mesh, P("dp")))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, batch)
