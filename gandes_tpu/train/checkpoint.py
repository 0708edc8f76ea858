"""Checkpoint/resume via orbax.

The reference saves bare ``state_dict``s and never checkpoints optimizer
state (SURVEY.md section 5 "Checkpoint / resume"); here the FULL training
state (params, BN stats, both Adam states, step counter) round-trips, so
resume is bit-exact. Naming mirrors the reference's
``mmgan_{a}_{b}_epoch_{e}`` / ``gen_{step}_{ts}`` layouts with directories
instead of .pt files.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp

from gandes_tpu.train.steps import GANState


def save_state(path: str, state: GANState) -> str:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(lambda x: x, state), force=True)
    ckptr.wait_until_finished()
    return path


def restore_state(path: str, template: GANState) -> GANState:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)


def latest_epoch_checkpoint(models_dir: str, prefix: str):
    """Find the newest ``{prefix}_epoch_{e}`` checkpoint dir, or None."""
    if not os.path.isdir(models_dir):
        return None, 0
    best, best_e = None, 0
    for name in os.listdir(models_dir):
        if name.startswith(prefix + "_epoch_"):
            try:
                e = int(name.rsplit("_", 1)[1])
            except ValueError:
                continue
            if e > best_e:
                best, best_e = os.path.join(models_dir, name), e
    return best, best_e


def latest_step_checkpoint(models_dir: str, prefix: str = "gen_"):
    """Find the newest GAN-DES ``gen_{step}_{timestamp}`` checkpoint dir
    (``*_surrogate`` companions skipped), or (None, 0). Newest = highest
    step, timestamp breaking ties."""
    import re

    if not os.path.isdir(models_dir):
        return None, 0
    best, best_key = None, (-1, -1.0)
    for name in os.listdir(models_dir):
        m = re.fullmatch(re.escape(prefix) + r"(\d+)_([\d.]+)", name)
        if m:
            try:  # [\d.]+ admits names like 1.2.3 — skip, don't crash
                key = (int(m.group(1)), float(m.group(2)))
            except ValueError:
                continue
            if key > best_key:
                best, best_key = os.path.join(models_dir, name), key
    return best, max(best_key[0], 0)
