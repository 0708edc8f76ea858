"""Driver hooks (__graft_entry__) must keep working: r1's only
driver-visible failure was dryrun_multichip assuming provisioned devices.
conftest provisions the 8-device virtual CPU mesh, so _dryrun_body runs
here in-process exactly as the driver's subprocess does."""

import jax
import pytest


def test_entry_compiles_and_runs():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    mats = out[0]
    assert mats.shape == (16, 64, 64)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_body_8_devices(capsys):
    from __graft_entry__ import _dryrun_body

    _dryrun_body(8)
    out = capsys.readouterr().out
    assert "dryrun_multichip ok: mesh=(4x2)" in out
    assert "sharding check ok" in out
