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
):
    """Returns ``full_step(state, real, noise1, noise2, beats, count,
    aux_key) -> (new_state, mats, vec, metrics)`` — jit it (donating
    argnum 0 is safe). ``metrics['failed_simulations']`` is the host
    stage's failure count for the batch (int32, on device).
    """
    B, T = batch_size, sequence_length
    gen_forward = make_mmgan_gen_forward(g1, g2)
    train_step = make_mmgan_train_step(g1, g2, d, g_tx, d_tx)

    def host_stage(mats, vec, count):
        rolls, failed = matrix_to_midi(
            np.asarray(mats)[:, None], np.asarray(vec), adj_size=adj_size,
            instrument=instrument, start=start, end=start + T,
            count=int(count), log_path=log_path, out_dir=out_dir,
            parallel=des_parallel, force_roll=force_roll,
        )
        return np.stack(rolls).astype(np.float32), np.int32(failed)

    result_shapes = (
        jax.ShapeDtypeStruct((B, 2, 128, T), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32),
    )

    def full_step(state: GANState, real, noise1, noise2, beats, count,
                  aux_key=None):
        mats, vec, new_stats = gen_forward(state, noise1, noise2, beats, aux_key)
        fake, failed = io_callback(host_stage, result_shapes, mats, vec,
                                   count, ordered=True)
        state = dataclasses.replace(state, g_stats=new_stats)
        new_state, metrics = train_step(state, real, fake)
        return new_state, mats, vec, {**metrics, "failed_simulations": failed}

    return full_step
