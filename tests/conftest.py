"""Test configuration.

Force JAX onto a virtual 8-device CPU mesh *before* jax initializes, so
multi-chip sharding tests run anywhere (the driver separately dry-runs the
multi-chip path; real-TPU benchmarking happens in bench.py, not tests).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the driver env may point at TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # 12 = the 8-device test mesh + 4 SLACK executor threads. The slack is
    # load-bearing on few-core hosts: XLA:CPU's worker pool is
    # max(ncores, n_devices), and the fused-io mesh tests occupy all 8
    # device workers at once (7 blocked in the gradient all-reduce
    # rendezvous + 1 running the pinned io_callback) — the callback's
    # np.asarray(operand) then enqueues a d2h copy task that NO free
    # worker can run, deadlocking the suite on a 1-core box (reproduced
    # deterministically; PARITY.md "XLA:CPU io_callback pool deadlock").
    # Mesh-building tests must therefore slice jax.devices()[:8], never
    # assume len(jax.devices()) == 8.
    flags = (flags + " --xla_force_host_platform_device_count=12").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # XLA:CPU LOG(FATAL)s the WHOLE process (pytest dies with no report)
    # when a collective rendezvous misses its 40 s termination deadline —
    # under box load the fused-io tests' host callback can hold one device
    # thread that long while the rest wait at the gradient all-reduce
    # (VERDICT r3 #3b: two full-suite runs killed this way). 7200 s makes
    # the deadman unreachable; real deadlocks are prevented by the slack
    # devices above, and runaway tests are pytest's (or the driver's)
    # problem to bound, not a reason to kill the process without a report.
    flags = (flags + " --xla_cpu_collective_call_terminate_timeout_seconds=7200").strip()
os.environ["XLA_FLAGS"] = flags

# a sitecustomize may have imported jax already (env defaults latched), so
# set the config directly as well
import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 12)  # 8 mesh + 4 slack, see above
except Exception:
    pass  # older jax: XLA_FLAGS fallback above

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from gandes_tpu.core.compilation_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

REFERENCE_ROOT = pathlib.Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE_ROOT / "SIMULATOR" / "simulation_v3.py").exists()


import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The 7200 s rendezvous deadman above removes XLA's own in-process bound on
# a genuine future deadlock — pair it with a faulthandler watchdog (ADVICE
# r4 #4) so a regression surfaces as repeated all-thread stack dumps on
# stderr instead of a silent multi-hour hang. 2700 s per TEST is far above
# any legitimate test (the whole suite runs ~14-21 min) yet bounded enough
# to diagnose a wedged run; re-armed per test so only a single stuck test
# trips it, and cancelled on teardown.
import faulthandler  # noqa: E402

_HANG_DUMP_S = float(os.environ.get("GANDES_TEST_HANG_DUMP_S", "2700"))


@pytest.fixture(autouse=True)
def _hang_watchdog():
    faulthandler.dump_traceback_later(_HANG_DUMP_S, repeat=True)
    yield
    faulthandler.cancel_dump_traceback_later()


@pytest.fixture(scope="session")
def midi_fixture_dir(tmp_path_factory):
    """A few MIDI files generated through the simulator demo pipeline."""
    d = tmp_path_factory.mktemp("midi_fixtures")
    cwd = os.getcwd()
    os.chdir(d)
    try:
        os.makedirs("logs", exist_ok=True)
        from gandes_tpu.bridge.sim_demo import sim_to_wav

        np.random.seed(42)
        for i in range(3):
            sim_to_wav(matrices=[None], size=32, use_same_instrument=i,
                       out_dir=f"out_{i}")
    finally:
        os.chdir(cwd)
    return d
