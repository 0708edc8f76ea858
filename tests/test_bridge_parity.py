"""End-to-end MM-GAN fake-path parity: matrix_to_midi vs the reference.

Runs the reference `MMGAN_MIDI_DES/matrix_sim_process.matrix_to_midi`
(with midi2audio shimmed out — it's imported but unused on this path, and
mido/pretty_midi backed by our codec) and our bridge on identical generator
outputs and identical global-RNG state, comparing piano rolls, failure
counts, and saved MIDI bytes. This pins the full chain:
decode -> seeded DES -> event log -> MidiGenerator v2 -> rasterization.
"""

import logging
import os
import sys
import types

import numpy as np
import pytest

from test_music_pipeline import _install_reference_shims

from conftest import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted at /root/reference"
)


def _clear_root_logger():
    for h in logging.root.handlers[:]:
        logging.root.removeHandler(h)
        try:
            h.close()
        except Exception:
            pass


def _make_reference_machine_independent(ref_bridge, monkeypatch):
    """Make the reference side's termination machine-speed independent.

    Its sim budget (``max_sim_time``, quirk #7) and 2.5 s watchdog are
    WALL-CLOCK (`simulation_v3.py:496`, `matrix_sim_process.py:159-168`):
    on a slow or loaded box the pure-Python reference engine gets
    budget-truncated where our native engine completes by customer count,
    and the comparison stops being deterministic (CLAUDE.md: never assert
    across truncation points). Freeze the clock the reference *engine*
    reads — its budget check can then never fire — and give its watchdog a
    patient join, so the reference always runs to customer count exactly
    like our (fast enough to never truncate) engine. Both patches are
    scoped to the reference modules' globals, not the shared ``time`` /
    ``threading`` modules our own engine uses.

    OUR side keeps its real clock (the native C++ engine reads
    CLOCK_MONOTONIC internally, so it cannot be frozen from here), which
    is safe only because the native engine finishes these sims in
    milliseconds — ~1000x headroom under the 1.0 s budget. The pure-Python
    fallback engine has no such headroom on a slow box, so the comparison
    requires the native engine."""
    import threading as real_threading
    import time as real_time

    from gandes_tpu.des.native import native_available

    if not native_available():
        pytest.skip(
            "machine-independent comparison needs the native engine (the "
            "Python engine could hit the 1.0 s wall budget like the "
            "reference does on a slow box)"
        )

    sim_v3 = sys.modules["simulation_v3"]
    fake_time = types.ModuleType("time")
    fake_time.time = lambda: 0.0
    fake_time.sleep = real_time.sleep
    monkeypatch.setattr(sim_v3, "time", fake_time)

    class PatientThread(real_threading.Thread):
        def join(self, timeout=None):
            super().join()

    fake_threading = types.ModuleType("threading")
    fake_threading.Thread = PatientThread
    monkeypatch.setattr(ref_bridge, "threading", fake_threading)


def _load_reference_bridge():
    _install_reference_shims()
    # midi2audio is imported at the top of matrix_sim_process but unused on
    # the matrix_to_midi path
    m2a = types.ModuleType("midi2audio")

    class FluidSynth:
        def __init__(self, *a, **k):
            pass

        def midi_to_audio(self, *a, **k):
            raise RuntimeError("FluidSynth not available in tests")

    m2a.FluidSynth = FluidSynth
    sys.modules["midi2audio"] = m2a

    for p in ("/root/reference/GAN_DES", "/root/reference/MMGAN_MIDI_DES"):
        if p in sys.path:
            sys.path.remove(p)
        sys.path.insert(0, p)
    mod = sys.modules.get("datasets")
    if mod is not None and "MMGAN_MIDI_DES" not in (getattr(mod, "__file__", "") or ""):
        del sys.modules["datasets"]
    # make sure we get the MMGAN matrix_sim_process, not a cached GAN_DES one
    for name in ("matrix_sim_process", "sim_log_to_midi", "simulation_v3"):
        sys.modules.pop(name, None)
    import importlib

    return importlib.import_module("matrix_sim_process")


@pytest.mark.parametrize("generate", [True, False])
def test_matrix_to_midi_parity(tmp_path, monkeypatch, generate):
    """Per-sample parity. NOTE on batching: ``max_sim_time`` is a
    *wall-clock* budget (reference quirk), so a faster engine simulates
    more events before truncation and its extra routing decisions consume
    more global-RNG draws — later samples in one batched call then see a
    different RNG stream than the reference would on its own hardware.
    Per-sample (with a fixed RNG state at entry) the outputs are
    bit-identical, which is the strongest machine-independent guarantee
    the reference's design admits."""
    import torch

    ref_bridge = _load_reference_bridge()
    _make_reference_machine_independent(ref_bridge, monkeypatch)
    from gandes_tpu.bridge import matrix_to_midi

    rng = np.random.RandomState(5)
    samples = []
    for _ in range(2):
        g1 = rng.rand(1, 1, 64, 64).astype(np.float32)
        g2 = rng.rand(1, 20).astype(np.float32) * 0.5 + 0.2
        # give the sim the full 1.0 s wall budget so the (slow) reference
        # completes by customer count — otherwise its budget truncation
        # point (machine-speed-dependent, quirk #7) makes line counts and
        # the %100 save gate diverge between engines
        g2[:, 5] = 1.5
        samples.append((g1, g2))

    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    os.makedirs("adj_sim_outputs/midi", exist_ok=True)

    for si, (gen1, gen2) in enumerate(samples):
        _clear_root_logger()
        np.random.seed(777 + si)
        ref_rolls, ref_failed = ref_bridge.matrix_to_midi(
            torch.from_numpy(gen1), torch.from_numpy(gen2),
            adj_size=(64, 64), instrument=None, start=0, end=50,
            count=7, generate=generate,
        )
        _clear_root_logger()
        if generate:
            ref_mid = open("adj_sim_outputs/midi/generation.mid", "rb").read()

        np.random.seed(777 + si)
        our_rolls, our_failed = matrix_to_midi(
            gen1, gen2, adj_size=(64, 64), instrument=None, start=0, end=50,
            count=7, generate=generate, out_dir="./adj_sim_outputs/midi_ours",
        )

        assert our_failed == ref_failed
        assert len(our_rolls) == len(ref_rolls) == 1
        np.testing.assert_array_equal(our_rolls[0], ref_rolls[0])
        if generate:
            assert our_rolls[0].sum() > 0
            our_mid = open("adj_sim_outputs/midi_ours/generation.mid", "rb").read()
            assert our_mid == ref_mid


# scale the randomized sweep up for heavy validation: GANDES_FUZZ_BRIDGE=50
# (invalid or < 1 values fall back to the default 3-seed list rather than
# erroring the whole file's collection)
try:
    _n_bridge = int(os.environ.get("GANDES_FUZZ_BRIDGE", ""))
except ValueError:
    _n_bridge = 0
_BRIDGE_SEEDS = (list(range(101, 101 + _n_bridge)) if _n_bridge >= 1
                 else [101, 202, 303])


@pytest.mark.parametrize("fuzz_seed", _BRIDGE_SEEDS)
def test_matrix_to_midi_parity_fuzz(tmp_path, monkeypatch, fuzz_seed):
    """Randomized single-sample parity sweep (full budget so both engines
    complete by customer count)."""
    import torch

    ref_bridge = _load_reference_bridge()
    _make_reference_machine_independent(ref_bridge, monkeypatch)
    from gandes_tpu.bridge import matrix_to_midi

    rng = np.random.RandomState(fuzz_seed)
    g1 = rng.rand(1, 1, 64, 64).astype(np.float32)
    g2 = rng.rand(1, 20).astype(np.float32) * 0.4 + 0.15
    g2[:, 5] = 1.5  # full wall budget (see test_matrix_to_midi_parity)
    g2[:, 6] = 0.1  # 1000 customers

    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    os.makedirs("adj_sim_outputs/midi", exist_ok=True)

    _clear_root_logger()
    np.random.seed(fuzz_seed * 7)
    ref_rolls, ref_failed = ref_bridge.matrix_to_midi(
        torch.from_numpy(g1), torch.from_numpy(g2), adj_size=(64, 64),
        start=0, end=50, generate=True)
    _clear_root_logger()

    np.random.seed(fuzz_seed * 7)
    our_rolls, our_failed = matrix_to_midi(
        g1, g2, adj_size=(64, 64), start=0, end=50, generate=True,
        out_dir="./adj_sim_outputs/midi_ours")
    assert our_failed == ref_failed
    np.testing.assert_array_equal(our_rolls[0], ref_rolls[0])


def test_skip_trivial_decode_is_parity_exact(tmp_path, monkeypatch):
    """The zero-roll shortcut must change nothing observable."""
    from gandes_tpu.bridge import matrix_to_midi

    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    rng = np.random.RandomState(8)
    g1 = rng.rand(3, 1, 64, 64).astype(np.float32)
    g2 = (rng.rand(3, 20) * 0.5 + 0.2).astype(np.float32)
    np.random.seed(21)
    a, fa = matrix_to_midi(g1, g2, adj_size=(64, 64), start=0, end=50,
                           skip_trivial_decode=True)
    np.random.seed(21)
    b, fb = matrix_to_midi(g1, g2, adj_size=(64, 64), start=0, end=50,
                           skip_trivial_decode=False)
    assert fa == fb
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_matrix_to_midi_parallel_mode(tmp_path, monkeypatch):
    """Fast mode: concurrent native sims; deterministic given the RNG
    state, no per-sample log files, same shapes/failure semantics."""
    from gandes_tpu.bridge import matrix_to_midi
    from gandes_tpu.des.native import native_available

    if not native_available():
        pytest.skip("native engine unavailable")
    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    rng = np.random.RandomState(4)
    g1 = rng.rand(4, 1, 64, 64).astype(np.float32)
    g2 = (rng.rand(4, 20) * 0.5 + 0.2).astype(np.float32)

    np.random.seed(55)
    a, fa = matrix_to_midi(g1, g2, adj_size=(64, 64), start=0, end=50,
                           parallel=4, out_dir=str(tmp_path / "m1"))
    np.random.seed(55)
    b, fb = matrix_to_midi(g1, g2, adj_size=(64, 64), start=0, end=50,
                           parallel=4, out_dir=str(tmp_path / "m2"))
    assert fa == fb
    assert len(a) == 4 and all(r.shape == (2, 128, 50) for r in a)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # no per-sample log files written in fast mode
    assert not any(p.name.startswith("simulation.") for p in (tmp_path / "logs").iterdir())


def test_matrix_to_midi_instrument_override(tmp_path, monkeypatch):
    from gandes_tpu.bridge import matrix_to_midi

    rng = np.random.RandomState(9)
    gen1 = rng.rand(1, 1, 64, 64).astype(np.float32)
    gen2 = (rng.rand(1, 20).astype(np.float32) * 0.5 + 0.2)
    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    np.random.seed(1)
    rolls, failed = matrix_to_midi(gen1, gen2, adj_size=(64, 64), instrument=0,
                                   start=0, end=50, generate=True,
                                   out_dir=str(tmp_path / "mid"))
    assert len(rolls) == 1 and rolls[0].shape == (2, 128, 50)
    assert failed == 0
