"""Single-native-call MM-GAN host stage (`native/des_engine.cpp::
mmgan_host_batch` via `bridge/mmgan_decode._matrix_to_midi_batch`).

The sequential batch mode (parallel=1) must be BIT-IDENTICAL to the pure
sequential path — rolls, failure counts, AND the post-call global numpy
RNG state (the decode consumes the global stream per sample and the sims
route on it, interleaved exactly like the Python loop). Inputs here use
the same light-sim parameter band as tests/test_bridge_parity.py (sims
terminate by customer count, far under their wall budgets) so the
comparison is machine-speed independent.
"""

import os

import numpy as np
import pytest

from gandes_tpu.bridge import matrix_to_midi
from gandes_tpu.des.native import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native engine unavailable")


def _inputs(seed, B):
    rng = np.random.RandomState(seed)
    g1 = rng.rand(B, 1, 64, 64).astype(np.float32)
    g2 = (rng.rand(B, 20).astype(np.float32) * 0.5 + 0.2)
    return g1, g2


def _state():
    s = np.random.get_state()
    return (tuple(s[1]), s[2], s[3], s[4])


@pytest.mark.parametrize("force_roll,instrument", [
    (False, 0), (True, 0), (False, None), (True, None)])
def test_batch_mode_bitwise_equals_sequential(tmp_path, monkeypatch,
                                              force_roll, instrument):
    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    g1, g2 = _inputs(11, 5)

    np.random.seed(17)
    a, fa = matrix_to_midi(g1, g2, adj_size=(64, 64), instrument=instrument,
                           start=100, end=150, parallel=1,
                           force_roll=force_roll,
                           out_dir=str(tmp_path / "m1"))
    state_a = _state()

    np.random.seed(17)
    b, fb = matrix_to_midi(g1, g2, adj_size=(64, 64), instrument=instrument,
                           start=100, end=150, parallel=None,
                           force_roll=force_roll,
                           out_dir=str(tmp_path / "m2"))
    state_b = _state()

    assert fa == fb
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert state_a == state_b, "global RNG stream diverged"


def test_batch_mode_f64_inputs_fall_back(tmp_path, monkeypatch):
    """float64 generator outputs decode in f64 on the sequential path; the
    f32 native decode must not engage (results would differ in low bits)."""
    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    g1, g2 = _inputs(3, 2)
    g1 = g1.astype(np.float64)

    np.random.seed(5)
    a, fa = matrix_to_midi(g1, g2, adj_size=(64, 64), instrument=0,
                           start=100, end=150, parallel=2)
    np.random.seed(5)
    b, fb = matrix_to_midi(g1, g2, adj_size=(64, 64), instrument=0,
                           start=100, end=150, parallel=2)
    assert fa == fb
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_batch_decode_error_matches_sequential_exception(tmp_path, monkeypatch):
    """A row with no nonzero off-diagonals raises ValueError in the
    reference decode (np.random.choice on an empty list). The native batch
    detects it, restores the RNG snapshot, and replays on the Python path
    so the same exception surfaces."""
    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    g1, g2 = _inputs(7, 2)
    g1[1, 0, 3, :] = 0.0  # row 3 of sample 1 has no routing mass

    for parallel in (1, None, 8):
        np.random.seed(9)
        with pytest.raises(ValueError):
            matrix_to_midi(g1, g2, adj_size=(64, 64), instrument=0,
                           start=100, end=150, parallel=parallel)


def test_batch_threads_mode_deterministic(tmp_path, monkeypatch):
    """parallel>1 uses C++ worker threads with private routing streams —
    deterministic given the starting global state (in the light-sim band
    where no sim hits its wall budget)."""
    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    g1, g2 = _inputs(21, 6)

    np.random.seed(33)
    a, fa = matrix_to_midi(g1, g2, adj_size=(64, 64), instrument=0,
                           start=100, end=150, parallel=6, force_roll=True)
    np.random.seed(33)
    b, fb = matrix_to_midi(g1, g2, adj_size=(64, 64), instrument=0,
                           start=100, end=150, parallel=6, force_roll=True)
    assert fa == fb
    assert sum(float(np.abs(x).sum()) > 0 for x in a) == 6  # force_roll decoded
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
