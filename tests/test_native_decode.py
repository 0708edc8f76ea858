"""Native v2 record-array decoder (native/midi_decode.cpp) parity.

The C++ decoder consumes the native DES engine's raw event records and must
produce rolls BIT-IDENTICAL to the Python chain (string materialization ->
regex -> MidiGeneratorV2 -> finalize_in_memory -> generate_piano_roll) for
the in-memory force_roll path, across many random generator outputs — this
sweeps the tricky semantics: repr() scientific-notation no-matches, python
int() truncation / % sign, the remove-while-iterating cleanup, banker's
rounding of accumulated tick times, and the IndexError partial-roll abort.
"""

import numpy as np
import pytest

from gandes_tpu.bridge.mmgan_decode import _decode_sample
from gandes_tpu.des.engine import Sim
from gandes_tpu.music.generators import process_adjsim_log_v2


def _native_ready():
    from gandes_tpu.des.native import native_available
    from gandes_tpu.music.native_decode import native_decode_available

    return native_available() and native_decode_available()


@pytest.mark.skipif(not _native_ready(), reason="native libs unavailable")
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_native_decode_matches_python(tmp_path, seed):
    from gandes_tpu.music.native_decode import decode_records_v2

    rng = np.random.RandomState(seed)
    B = 6
    g1 = rng.rand(B, 64, 64).astype(np.float32)
    g2 = rng.rand(B, 20).astype(np.float32)

    np.random.seed(100 + seed)
    dim, size, num_aug = 61, 64, 3
    checked = 0
    for i in range(B):
        sm, dists, instr, notes, seeds, nc = _decode_sample(
            g1[i], g2[i], dim, size, num_aug, None)
        sim = Sim(sm, dists, [254] * dim, seeds=seeds, generate_log=True,
                  record_history=False, logging_mode="Music",
                  max_sim_time=min(float(g2[i][5]), 0.4), engine="native",
                  log_path=str(tmp_path) + "/")
        sim.log.path = None
        sim.run(number_of_customers=min(nc, 1500))

        native = decode_records_v2(sim, instr, notes, g2[i][10:], 100, 150)
        assert native is not None

        roll_py, dur_py, beats_py = process_adjsim_log_v2(
            instruments=instr, note_levels=notes, gen2_output=g2[i][10:],
            count=1, start=100, end=150, generate=False,
            lines=sim.music_lines(limit=5001), out_dir=str(tmp_path),
            force_roll=True,
        )
        roll_n, dur_n, beats_n = native
        np.testing.assert_array_equal(roll_n, roll_py)
        np.testing.assert_array_equal(dur_n, dur_py)
        np.testing.assert_array_equal(beats_n, beats_py)
        if np.asarray(roll_py).any():
            checked += 1
    assert checked > 0  # at least one non-trivial roll compared


@pytest.mark.skipif(not _native_ready(), reason="native libs unavailable")
def test_native_decode_crop_quirk_small_end(tmp_path):
    """end < 128 exercises the pitch-axis crop quirk branch."""
    from gandes_tpu.music.native_decode import decode_records_v2

    rng = np.random.RandomState(9)
    g1 = rng.rand(1, 64, 64).astype(np.float32)
    g2 = rng.rand(1, 20).astype(np.float32)
    np.random.seed(9)
    sm, dists, instr, notes, seeds, nc = _decode_sample(g1[0], g2[0], 61, 64, 3, None)
    sim = Sim(sm, dists, [254] * 61, seeds=seeds, generate_log=True,
              logging_mode="Music", max_sim_time=0.3, engine="native",
              log_path=str(tmp_path) + "/")
    sim.log.path = None
    sim.run(number_of_customers=800)

    native = decode_records_v2(sim, instr, notes, g2[0][10:], 10, 60)
    roll_py, dur_py, _ = process_adjsim_log_v2(
        instruments=instr, note_levels=notes, gen2_output=g2[0][10:],
        count=1, start=10, end=60, generate=False,
        lines=sim.music_lines(limit=5001), out_dir=str(tmp_path),
        force_roll=True,
    )
    roll_n, dur_n, _ = native
    np.testing.assert_array_equal(roll_n, roll_py)
    np.testing.assert_array_equal(dur_n, dur_py)


@pytest.mark.skipif(not _native_ready(), reason="native libs unavailable")
def test_parallel_force_roll_uses_native_and_matches_python(tmp_path):
    """matrix_to_midi(parallel=N, force_roll=True) rolls are identical
    whether the worker decodes natively or via the Python fallback."""
    import gandes_tpu.music.native_decode as nd
    from gandes_tpu.bridge.mmgan_decode import matrix_to_midi

    rng = np.random.RandomState(4)
    B = 4
    g1 = rng.rand(B, 1, 64, 64).astype(np.float32)
    g2 = rng.rand(B, 20).astype(np.float32)
    # wall budgets are machine-speed dependent (reference quirk); give every
    # sim the full 1.0 s cap so both runs end on the customer count and the
    # event streams are identical
    g2[:, 5] = 0.999
    g2[:, 6] = 0.1  # 1000 customers

    np.random.seed(21)
    rolls_native, failed_a = matrix_to_midi(
        g1, g2, adj_size=(64, 64), start=100, end=150, parallel=B,
        write_log_file=False, force_roll=True, log_path=str(tmp_path) + "/")

    # disable the native decoder and repeat with the identical RNG stream
    real = nd.decode_records_v2
    nd.decode_records_v2 = lambda *a, **k: None
    try:
        np.random.seed(21)
        rolls_py, failed_b = matrix_to_midi(
            g1, g2, adj_size=(64, 64), start=100, end=150, parallel=B,
            write_log_file=False, force_roll=True, log_path=str(tmp_path) + "/")
    finally:
        nd.decode_records_v2 = real

    assert failed_a == failed_b
    for a, b in zip(rolls_native, rolls_py):
        np.testing.assert_array_equal(a, b)
    assert any(np.asarray(r).any() for r in rolls_native)
