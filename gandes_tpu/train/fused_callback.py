"""Single-launch MM-GAN training step with the DES as an `io_callback`.

The reference's training step is eager torch around a host DES round trip
(`MMGAN_MIDI_DES/network_tests.py:276-315` calling
`matrix_sim_process.py:15-195`). The two-phase loop in
``train/mmgan_loop.py`` keeps that structure (device forward -> host DES ->
device update, two dispatches per step). This module collapses the whole
step into ONE compiled XLA program: the G1+G2 forward, the host DES stage
as a shape-stable ``jax.experimental.io_callback`` (always returns a
(B, 2, 128, T) float32 roll batch + an int32 failure count — the blank-roll
fallback keeps shapes static exactly like the reference's zero-roll
substitution), and the fused D update + post-update G loss.

Why: under jit, XLA owns the whole step — the device math around the
callback is scheduled as one program (no Python dispatch between forward
and update), and the step is a single function you can wrap, profile, or
checkpoint around. The callback is ``ordered=True`` because the DES stage
has real side effects (the simulation log, the count-gated .mid saves) whose
order is part of reference parity.

Under a multi-device mesh, pass ``callback_device`` (normally
``mesh.devices.flat[0]``). XLA's SPMD partitioner rejects the ordered
callback's token, which carries a replicated sharding
("side-effect HLO cannot have a replicated sharding",
spmd_partitioner.cc RET_CHECK), so the sharded build pins the callback to
ONE device via ``SingleDeviceSharding`` with ``ordered=False``: XLA
all-gathers ``mats``/``vec`` to that device, the host stage sees the
GLOBAL batch exactly like the single-chip path (global-numpy-RNG
consumption and file side effects are bit-identical), and the returned
roll batch is re-distributed to the consumers' shardings. Dropping the
ordering token is sound here because consecutive steps are already
ordered by DATA dependence: step N+1's generator forward reads the state
produced by step N's update, which consumed step N's callback output —
XLA cannot reorder or elide the callback without breaking that chain.
Pinned under a (dp, tp) mesh by ``tests/test_fused_io.py`` and the
driver's ``__graft_entry__._dryrun_body``.

Semantics are identical to the two-phase path; pinned bitwise by
``tests/test_fused_io.py``.
"""

from __future__ import annotations

import dataclasses
import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import io_callback

from gandes_tpu.bridge.mmgan_decode import matrix_to_midi
from gandes_tpu.train.steps import (
    GANState,
    make_mmgan_gen_forward,
    make_mmgan_train_step,
)


def make_mmgan_full_step_io(
    g1,
    g2,
    d,
    g_tx,
    d_tx,
    *,
    batch_size: int,
    sequence_length: int = 50,
    adj_size: tuple = (64, 64),
    instrument: int | None = 0,
    start: int = 100,
    log_path: str = "logs/",
    out_dir: str = "./adj_sim_outputs/midi",
    des_parallel: int | None = None,
    force_roll: bool = False,
    watchdog: float = 2.5,
    callback_device=None,
):
    """Returns ``full_step(state, real, noise1, noise2, beats, count,
    aux_key) -> (new_state, mats, vec, metrics)`` — jit it (donating
    argnum 0 is safe). ``metrics['failed_simulations']`` is the host
    stage's failure count for the batch (int32, on device).

    ``callback_device``: required when the step runs under a sharded mesh
    — pins the host stage to that device (see module docstring for why
    this swaps the ordering token for data-dependence ordering).
    """
    B, T = batch_size, sequence_length
    gen_forward = make_mmgan_gen_forward(g1, g2)
    train_step = make_mmgan_train_step(g1, g2, d, g_tx, d_tx)

    def host_stage(mats, vec, count):
        rolls, failed = matrix_to_midi(
            np.asarray(mats)[:, None], np.asarray(vec), adj_size=adj_size,
            instrument=instrument, start=start, end=start + T,
            count=int(count), log_path=log_path, out_dir=out_dir,
            parallel=des_parallel, force_roll=force_roll, watchdog=watchdog,
        )
        return np.stack(rolls).astype(np.float32), np.int32(failed)

    result_shapes = (
        jax.ShapeDtypeStruct((B, 2, 128, T), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    if callback_device is not None:
        cb_kwargs = dict(
            ordered=False,
            sharding=jax.sharding.SingleDeviceSharding(callback_device),
        )
    else:
        cb_kwargs = dict(ordered=True)

    def full_step(state: GANState, real, noise1, noise2, beats, count,
                  aux_key=None):
        mats, vec, new_stats = gen_forward(state, noise1, noise2, beats, aux_key)
        # DCE GUARD: in the sharded build the callback is ordered=False, so
        # its execution rests ENTIRELY on `fake`/`failed` being
        # data-consumed (here: by train_step / the returned metrics). A
        # future caller that jits a wrapper discarding them (e.g. an
        # eval-only forward returning just mats/vec) lets XLA elide the
        # callback — silently skipping parity-relevant side effects (sim
        # log, count-gated .mid saves, global numpy RNG consumption). Keep
        # every consumer, or use make_mmgan_gen_forward + matrix_to_midi
        # directly instead. Pinned by
        # tests/test_fused_io.py::test_fused_io_side_effects_survive_partial_fetch.
        fake, failed = io_callback(host_stage, result_shapes, mats, vec,
                                   count, **cb_kwargs)
        state = dataclasses.replace(state, g_stats=new_stats)
        new_state, metrics = train_step(state, real, fake)
        return new_state, mats, vec, {**metrics, "failed_simulations": failed}

    return full_step
