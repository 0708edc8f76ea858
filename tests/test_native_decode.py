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


class _FakeLog:
    def __init__(self, preamble):
        self.lines = list(preamble)
        self.path = None

    def flush(self):
        pass


class _FakeSim:
    """Just enough Sim surface for decode_records_v2 / materialize_records."""

    def __init__(self, preamble, values, ids, servers, kinds):
        self.log = _FakeLog(preamble)
        self._pending_records = (
            np.asarray(values, np.float64), np.asarray(ids, np.int64),
            np.asarray(servers, np.int32), np.asarray(kinds, np.uint8),
        )
        self._pending_offset = 0

    def music_lines(self, limit=None):
        from gandes_tpu.des.native import materialize_records

        materialize_records(self, limit)
        return self.log.lines


@pytest.mark.skipif(not _native_ready(), reason="native libs unavailable")
def test_native_decode_regex_and_cleanup_edge_cases(tmp_path):
    """Hand-crafted records covering every match/no-match and cleanup
    branch: scientific-notation reprs (<1e-4, >=1e16), negatives, zero
    times, 'processing'/delayed kinds, None servers, the midi_time<200
    gate, >200 off-times (removal passes), duplicate note_ons, and the
    sequence-length / IndexError abort."""
    from gandes_tpu.music.native_decode import decode_records_v2

    g2tail = np.asarray([0.31, 0.52, 0.73, 0.66, 0.45, 0.38, 0, 0, 0, 0],
                        np.float32)
    n = 8
    instruments = np.arange(n, dtype=np.float64) * 3.0
    note_levels = (np.arange(n, dtype=np.float64) * 7.0 + 30.0) % 128

    V, I, S, K = [], [], [], []

    def rec(v, i, s, k):
        V.append(v), I.append(i), S.append(s), K.append(k)

    # matches
    rec(0.0, 6, 1, 0)            # zero time arrival ('0.0')
    rec(1.5, 10, 2, 0)           # arrival
    rec(2.25, 10, 2, 2)          # departure (note pair)
    # no-match quirks
    rec(5e-05, 6, 3, 0)          # sci-notation small -> skipped
    rec(1e16, 6, 3, 0)           # sci-notation large -> skipped
    rec(-1.0, 6, 3, 0)           # negative -> skipped
    rec(3.0, 6, 3, 1)            # 'processing' kind -> regex group-4 miss
    rec(3.0, 6, 3, 3)            # delayed-departure kind -> miss
    rec(3.5, 6, -1, 0)           # server 'None' -> miss
    # skip-moduli misses and hits
    rec(4.0, 7, 4, 0)            # id 7: depends on derived skip moduli
    rec(5.0, 12, 5, 0)           # id 12
    rec(6.5, 12, 5, 2)
    # duplicate note_on on the same node (clean_midi_file dedup)
    rec(7.0, 10, 2, 0)
    rec(8.0, 10, 2, 0)
    # long times: 150 + service pushes off_time past 200 (removal passes)
    rec(150.0, 20, 6, 0)
    rec(199.0, 20, 6, 2)
    # beyond the midi_time < 200 gate
    rec(230.0, 30, 7, 0)
    # orphan departure on a never-seen node
    rec(9.0, 10, 0, 2)

    preamble = ["INFO:root:3 branch method set as shortest queue"]
    sim_a = _FakeSim(preamble, V, I, S, K)
    sim_b = _FakeSim(preamble, V, I, S, K)

    native = decode_records_v2(sim_a, instruments, note_levels, g2tail, 100, 150)
    assert native is not None
    roll_py, dur_py, beats_py = process_adjsim_log_v2(
        instruments=instruments, note_levels=note_levels, gen2_output=g2tail,
        count=1, start=100, end=150, generate=False,
        lines=sim_b.music_lines(limit=5001), out_dir=str(tmp_path),
        force_roll=True,
    )
    roll_n, dur_n, beats_n = native
    np.testing.assert_array_equal(roll_n, roll_py)
    np.testing.assert_array_equal(dur_n, dur_py)
    np.testing.assert_array_equal(beats_n, beats_py)


@pytest.mark.skipif(not _native_ready(), reason="native libs unavailable")
def test_native_decode_respects_line_budget():
    """Records past the 5000-line cap (minus preamble) must be ignored,
    exactly like the Python line loop."""
    from gandes_tpu.music.native_decode import decode_records_v2

    g2tail = np.asarray([0.31, 0.52, 0.73, 0.66, 0.45, 0.38], np.float32)
    n = 4
    instruments = np.zeros(n)
    note_levels = np.asarray([60.0, 62.0, 64.0, 65.0])

    # preamble of 4998 lines leaves budget for exactly 2 records
    preamble = ["INFO:root:x"] * 4998
    V = [1.0, 2.0, 3.0, 4.0]
    I = [10, 10, 10, 10]
    S = [1, 1, 2, 2]
    K = [0, 2, 0, 2]
    sim_a = _FakeSim(preamble, V, I, S, K)
    sim_b = _FakeSim(preamble, V, I, S, K)

    native = decode_records_v2(sim_a, instruments, note_levels, g2tail, 100, 150)
    roll_py, dur_py, _ = process_adjsim_log_v2(
        instruments=instruments, note_levels=note_levels, gen2_output=g2tail,
        count=1, start=100, end=150, generate=False,
        lines=sim_b.music_lines(limit=5001), out_dir=".", force_roll=True,
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


@pytest.mark.skipif(not _native_ready(), reason="native libs unavailable")
@pytest.mark.parametrize("pcn,tag", [(False, "v1"), (True, "v0")])
def test_native_v1_decode_matches_python(tmp_path, pcn, tag):
    """midi_decode_v1: SMF bytes byte-identical to process_adjsim_log_v1/v0's
    file, event arrays bit-identical to midi_to_event_arrays, over random
    GAN-DES sims."""
    from gandes_tpu.bridge.gandes_decode import _decode_gandes_sample
    from gandes_tpu.music.generators import (
        process_adjsim_log_v0,
        process_adjsim_log_v1,
    )
    from gandes_tpu.music.native_decode import decode_records_v1
    from gandes_tpu.music.synth import midi_to_event_arrays

    procfn = process_adjsim_log_v0 if pcn else process_adjsim_log_v1
    checked = 0
    for seed in range(4):
        np.random.seed(seed)
        mat = np.abs(np.random.rand(20, 20)).astype(np.float32)
        sm, dists, instr, notes = _decode_gandes_sample(mat, 20, 5, None)
        np.random.seed(np.random.randint(0, 99999, size=1))
        seeds = np.random.randint(0, 99999, size=1)
        sim = Sim(sm, dists, [254] * 15, seeds=seeds, generate_log=True,
                  logging_mode="Music", max_sim_time=0.5, engine="native",
                  log_path=str(tmp_path) + "/")
        sim.log.path = None
        sim.run(number_of_customers=1000)

        p_nat = str(tmp_path / f"nat_{seed}_{tag}.mid")
        res = decode_records_v1(sim, instr, notes, p_nat,
                                program_change_per_note=pcn)
        assert res is not None
        _, ev_nat = res

        p_py = str(tmp_path / f"py_{seed}_{tag}.mid")
        _, mid = procfn(instruments=instr, note_levels=notes,
                        lines=sim.music_lines(limit=5001), out_path=p_py,
                        return_mid=True)
        assert open(p_nat, "rb").read() == open(p_py, "rb").read()
        ev_py = midi_to_event_arrays(mid, 1024)
        for a, b in zip(ev_nat[:5], ev_py[:5]):
            np.testing.assert_array_equal(a, b)
        assert ev_nat[5] == ev_py[5] and ev_nat[6] == ev_py[6]
        if ev_nat[5] > 0:
            checked += 1
    assert checked > 0


@pytest.mark.skipif(not _native_ready(), reason="native libs unavailable")
def test_matrix_to_wav_parallel_native_v1_matches_fallback(tmp_path, monkeypatch):
    """matrix_to_wav(parallel=N) mels are identical whether the v1 decode
    runs natively or through the Python generator fallback."""
    import gandes_tpu.music.native_decode as nd
    from gandes_tpu.bridge.gandes_decode import matrix_to_wav

    monkeypatch.chdir(tmp_path)
    rng = np.random.RandomState(7)
    mats = rng.rand(3, 20, 20).astype(np.float32)

    np.random.seed(13)
    a = np.asarray(matrix_to_wav(mats, size=20, start=0, end=216, parallel=3,
                                 write_wav=False, number_of_customers=400,
                                 max_sim_time=2.0))
    real = nd.decode_records_v1
    nd.decode_records_v1 = lambda *args, **kw: None
    try:
        np.random.seed(13)
        b = np.asarray(matrix_to_wav(mats, size=20, start=0, end=216, parallel=3,
                                     write_wav=False, number_of_customers=400,
                                     max_sim_time=2.0))
    finally:
        nd.decode_records_v1 = real
    np.testing.assert_array_equal(a, b)
