"""Music-quality metrics over piano rolls and mel spectrograms.

The reference has no quantitative evaluation beyond loss curves
(SURVEY.md §4: its "tests" are queueing-theory validations); generated
music is judged by listening. This module adds the standard symbolic-music
statistics so generated batches can be compared against the training
distribution numerically — all batched, jittable device math (one fused
program per metric set), usable in-training or from the CLI.

Roll conventions match the pipeline: ``(B, 2, 128, T)`` float rolls with
channel 0 velocity-at-onset and channel 1 duration spans; mels are
``(B, 128, F)`` dB.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


@jax.jit
def roll_metrics(rolls):
    """Per-batch symbolic statistics of (B, 2, 128, T) piano rolls.

    Returns a dict of (B,) arrays:
      note_density      — fraction of (pitch, step) cells with an onset
      polyphony         — mean simultaneous sounding notes per active step
      pitch_mean/std    — onset-weighted pitch moments
      velocity_mean/std — moments of nonzero onset velocities
      duration_mean     — mean painted duration over active span cells
      empty             — 1.0 where the roll is all zeros (the reference's
                          zero-roll training quirk makes this common)
    """
    rolls = jnp.asarray(rolls, jnp.float32)
    vel = rolls[:, 0]                        # (B, 128, T)
    dur = rolls[:, 1]
    B, P, T = vel.shape

    onset = (vel > 0).astype(jnp.float32)
    n_onsets = jnp.sum(onset, axis=(1, 2))
    safe_n = jnp.maximum(n_onsets, 1.0)

    note_density = n_onsets / (P * T)

    sounding = (dur > 0).astype(jnp.float32)       # (B, 128, T)
    active_steps = jnp.sum(jnp.any(dur > 0, axis=1), axis=1)  # (B,)
    polyphony = jnp.sum(sounding, axis=(1, 2)) / jnp.maximum(active_steps, 1.0)

    pitches = jnp.arange(P, dtype=jnp.float32)[None, :, None]
    pitch_mean = jnp.sum(onset * pitches, axis=(1, 2)) / safe_n
    pitch_var = jnp.sum(onset * (pitches - pitch_mean[:, None, None]) ** 2,
                        axis=(1, 2)) / safe_n
    pitch_std = jnp.sqrt(pitch_var)

    velocity_mean = jnp.sum(vel, axis=(1, 2)) / safe_n
    velocity_var = jnp.sum(onset * (vel - velocity_mean[:, None, None]) ** 2,
                           axis=(1, 2)) / safe_n
    velocity_std = jnp.sqrt(velocity_var)

    span_cells = jnp.sum(sounding, axis=(1, 2))
    duration_mean = jnp.sum(dur, axis=(1, 2)) / jnp.maximum(span_cells, 1.0)

    empty = (jnp.sum(jnp.abs(rolls), axis=(1, 2, 3)) == 0).astype(jnp.float32)
    return {
        "note_density": note_density,
        "polyphony": polyphony,
        "pitch_mean": pitch_mean,
        "pitch_std": pitch_std,
        "velocity_mean": velocity_mean,
        "velocity_std": velocity_std,
        "duration_mean": duration_mean,
        "empty": empty,
    }


@jax.jit
def pitch_class_histogram(rolls):
    """Onset-count histogram over the 12 pitch classes, normalized per
    sample. (B, 2, 128, T) -> (B, 12); all-zero rolls yield zeros."""
    vel = jnp.asarray(rolls, jnp.float32)[:, 0]
    onset = (vel > 0).astype(jnp.float32)          # (B, 128, T)
    counts = jnp.sum(onset, axis=2)                # (B, 128)
    pc = jnp.zeros((counts.shape[0], 12), jnp.float32)
    classes = jnp.arange(128) % 12
    pc = pc.at[:, classes].add(counts)
    total = jnp.sum(pc, axis=1, keepdims=True)
    return jnp.where(total > 0, pc / total, pc)


@jax.jit
def mel_metrics(mels):
    """Spectral statistics of (B, 128, F) mel-dB batches: per-sample dB
    mean/std, spectral centroid (mel-bin expectation of the linearized
    power) and temporal flux (mean abs dB frame difference)."""
    mels = jnp.asarray(mels, jnp.float32)
    db_mean = jnp.mean(mels, axis=(1, 2))
    db_std = jnp.std(mels, axis=(1, 2))
    power = jnp.power(10.0, mels / 10.0)
    bins = jnp.arange(mels.shape[1], dtype=jnp.float32)[None, :, None]
    centroid = jnp.sum(power * bins, axis=(1, 2)) / jnp.maximum(
        jnp.sum(power, axis=(1, 2)), 1e-12)
    flux = jnp.mean(jnp.abs(jnp.diff(mels, axis=2)), axis=(1, 2))
    return {"db_mean": db_mean, "db_std": db_std, "centroid": centroid,
            "flux": flux}


def compare_distributions(real_metrics: dict, fake_metrics: dict) -> dict:
    """Scalar real-vs-generated summary: per metric, the absolute difference
    of batch means (plus the pitch-class histogram L1 when both sides carry
    one under the key 'pitch_classes')."""
    out = {}
    for k in real_metrics:
        if k == "pitch_classes":
            r = np.mean(np.asarray(real_metrics[k]), axis=0)
            f = np.mean(np.asarray(fake_metrics[k]), axis=0)
            out["pitch_class_l1"] = float(np.abs(r - f).sum())
        elif k in fake_metrics:
            out[k + "_gap"] = float(
                abs(np.mean(np.asarray(real_metrics[k]))
                    - np.mean(np.asarray(fake_metrics[k])))
            )
    return out
