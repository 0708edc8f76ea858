"""Pallas piano-roll rasterizer == the XLA scatter path, bitwise.

The kernel (ops/pallas_roll.py) walks each sample's event list sequentially
(last-writer-wins by construction); the XLA path resolves write order with
segment-max passes. Both must agree bit-for-bit — and with the host
reference rasterizer, which test_music_pipeline already pins against the
XLA path.
"""

import numpy as np

from gandes_tpu.music.piano_roll import rasterize_events_jax
from gandes_tpu.ops.pallas_roll import rasterize_events_pallas


def _random_events(rng, B, E, T, start):
    notes = rng.randint(-1, 128, (B, E)).astype(np.int32)
    ons = rng.randint(0, T + start + 10, (B, E)).astype(np.int32)
    offs = (ons + rng.randint(-2, 20, (B, E))).astype(np.int32)
    vels = rng.randint(-1, 127, (B, E)).astype(np.int32)
    return notes, ons, offs, vels


def test_pallas_rasterizer_matches_xla_random():
    rng = np.random.RandomState(0)
    for B, E, T, start in [(3, 32, 50, 5), (2, 128, 50, 100), (1, 16, 96, 0)]:
        notes, ons, offs, vels = _random_events(rng, B, E, T, start)
        ref = np.asarray(rasterize_events_jax(notes, ons, offs, vels,
                                              num_steps=T, start=start, impl="xla"))
        got = np.asarray(rasterize_events_pallas(notes, ons, offs, vels,
                                                 num_steps=T, start=start))
        np.testing.assert_array_equal(got, ref)


def test_pallas_rasterizer_last_writer_wins():
    """Deliberate conflicts: same (note, t) cells written by several events —
    the latest event must win in both channels, including a later zero
    velocity erasing an earlier nonzero one."""
    T = 50
    notes = np.array([[60, 60, 60, 60, 64, 64]], np.int32)
    ons = np.array([[10, 10, 10, 10, 5, 5]], np.int32)
    offs = np.array([[30, 20, 15, 12, 40, 8]], np.int32)
    vels = np.array([[100, 90, 0, -1, 70, 0]], np.int32)
    ref = np.asarray(rasterize_events_jax(notes, ons, offs, vels,
                                          num_steps=T, start=0, impl="xla"))
    got = np.asarray(rasterize_events_pallas(notes, ons, offs, vels,
                                             num_steps=T, start=0))
    np.testing.assert_array_equal(got, ref)
    # the -1-velocity (duration-only) event leaves channel 0's previous write
    assert ref[0, 0, 60, 10] == 0.0  # vel 0 wrote over 100/90 before the -1
    assert ref[0, 1, 60, 10] == 2.0  # durations: last event's off-on = 2


def test_pallas_rasterizer_sparse_padding_and_interior_holes():
    """Per-sample dynamic trip count: heavy tail padding (pad-to-densest)
    and pad slots in the middle of the stream must not change the result."""
    rng = np.random.RandomState(3)
    B, E, T = 4, 256, 50
    notes = np.full((B, E), -1, np.int32)
    for b in range(B):
        nv = rng.randint(4, 40)
        notes[b, :nv] = rng.randint(0, 128, nv)
        notes[b, rng.randint(0, nv)] = -1  # interior hole
    ons = rng.randint(0, 60, (B, E)).astype(np.int32)
    offs = (ons + rng.randint(-2, 20, (B, E))).astype(np.int32)
    vels = rng.randint(-1, 127, (B, E)).astype(np.int32)
    ref = np.asarray(rasterize_events_jax(notes, ons, offs, vels,
                                          num_steps=T, start=0, impl="xla"))
    got = np.asarray(rasterize_events_pallas(notes, ons, offs, vels,
                                             num_steps=T, start=0))
    np.testing.assert_array_equal(got, ref)


def test_pallas_rasterizer_empty_and_full_pad():
    notes = np.full((2, 8), -1, np.int32)
    z = np.zeros((2, 8), np.int32)
    out = np.asarray(rasterize_events_pallas(notes, z, z, z, num_steps=50))
    assert out.shape == (2, 2, 128, 50) and not out.any()


def test_pallas_rasterizer_compiled_on_tpu_matches_xla():
    """COMPILED-kernel bit-equality on real TPU hardware (ADVICE r1).

    The in-process suite pins jax to a virtual CPU mesh (conftest), so the
    Pallas kernel only ever runs in interpret mode here. This test re-checks
    the compiled kernel in a subprocess with the CPU forcing stripped; it
    auto-skips when that subprocess still lands on a CPU backend (no TPU
    attached).
    """
    import os
    import subprocess
    import sys

    import pytest

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [repo, env.get("PYTHONPATH", "")] if p
    )
    body = (
        "import jax\n"
        "if jax.devices()[0].platform == 'cpu':\n"
        "    print('NO_TPU'); raise SystemExit(0)\n"
        "import numpy as np\n"
        "from gandes_tpu.music.piano_roll import rasterize_events_jax\n"
        "from gandes_tpu.ops.pallas_roll import rasterize_events_pallas\n"
        "rng = np.random.RandomState(11)\n"
        "for B, E, T, start in [(3, 64, 50, 5), (2, 256, 50, 100)]:\n"
        "    notes = rng.randint(-1, 128, (B, E)).astype(np.int32)\n"
        "    ons = rng.randint(0, T + start + 10, (B, E)).astype(np.int32)\n"
        "    offs = (ons + rng.randint(-2, 20, (B, E))).astype(np.int32)\n"
        "    vels = rng.randint(-1, 127, (B, E)).astype(np.int32)\n"
        "    ref = np.asarray(rasterize_events_jax(notes, ons, offs, vels,\n"
        "        num_steps=T, start=start, impl='xla'))\n"
        "    got = np.asarray(rasterize_events_pallas(notes, ons, offs, vels,\n"
        "        num_steps=T, start=start))\n"
        "    np.testing.assert_array_equal(got, ref)\n"
        "print('TPU_PARITY_OK')\n"
    )
    try:
        proc = subprocess.run([sys.executable, "-c", body], env=env, text=True,
                              capture_output=True, timeout=420)
    except subprocess.TimeoutExpired:
        # the remote-attached TPU's relay has degraded periods where even
        # small compiles take minutes (CLAUDE.md); parity was verified on a
        # healthy relay — a slow day must not read as a kernel regression
        pytest.skip("TPU subprocess exceeded 420 s (degraded relay)")
    if "NO_TPU" in proc.stdout:
        pytest.skip("no TPU attached in subprocess")
    if proc.returncode != 0 and "Unable to initialize backend" in (
            proc.stdout + proc.stderr):
        pytest.skip("TPU backend failed to initialize (degraded relay)")
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "TPU_PARITY_OK" in proc.stdout
