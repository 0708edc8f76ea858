"""Native C++ engine: bit-parity with the Python engine and speed.

The native core re-implements numpy's legacy RandomState primitives and
CPython's heapq mechanics; these tests compare full 'Music' event logs
byte-for-byte and all statistics against the Python engine on the same
networks used for reference parity.
"""

import numpy as np
import pytest

from gandes_tpu.des import Sim
from gandes_tpu.des.native import native_available

from test_reference_parity import _dense_network, _shortest_queue_network

pytestmark = pytest.mark.skipif(not native_available(), reason="native engine build failed")


def _run(engine, tmp_path, build, n_customers, seeds=(101, 202), **kw):
    adj, dists, qlist = build()
    np.random.seed(123)
    sim = Sim(np.array(adj), [list(d) for d in dists], list(qlist), seeds=list(seeds),
              generate_log=True, log_path=str(tmp_path) + f"/{engine}_",
              logging_mode="Music", max_sim_time=kw.get("max_sim_time", 60),
              engine=engine)
    sim.run(number_of_customers=n_customers,
            use_next_available_server=kw.get("use_next_available_server", False))
    state = np.random.get_state()
    return sim, list(sim.music_lines()), (state[1].copy(), state[2], state[3], state[4])


@pytest.mark.parametrize("config,kw", [
    ("dense", {}),
    ("dense_next_available", {"use_next_available_server": True}),
    ("shortest_queue_delayed", {}),
])
def test_native_matches_python_engine(tmp_path, config, kw):
    build = _dense_network if config.startswith("dense") else _shortest_queue_network
    py_sim, py_lines, py_state = _run("python", tmp_path, build, 400, **kw)
    nt_sim, nt_lines, nt_state = _run("native", tmp_path, build, 400, **kw)

    assert len(py_lines) > 100
    assert nt_lines == py_lines

    # post-run GLOBAL RNG stream identical (routing draws counted equally)
    assert (nt_state[0] == py_state[0]).all() and nt_state[1:] == py_state[1:]

    for sid in py_sim.servers:
        p, c = py_sim.servers[sid], nt_sim.servers[sid]
        assert c.total_customers_served == p.total_customers_served
        assert c.reneges == p.reneges
        assert c.max_queue_length == p.max_queue_length
        assert c.total_time_in_service == pytest.approx(p.total_time_in_service, rel=1e-12)
        assert c.total_time_in_queue == pytest.approx(p.total_time_in_queue, rel=1e-12, abs=1e-12)
        p_qlt = {k: v for k, v in p.queue_length_times.items() if v != 0}
        c_qlt = {k: v for k, v in c.queue_length_times.items() if v != 0}
        assert set(c_qlt) == set(p_qlt)
        for k in p_qlt:
            assert c_qlt[k] == pytest.approx(p_qlt[k], rel=1e-9, abs=1e-12)
    for src in py_sim.sources:
        assert nt_sim.sources[src].customers_generated == py_sim.sources[src].customers_generated
        assert nt_sim.sources[src].arrival_times == py_sim.sources[src].arrival_times
    assert nt_sim.server_seeds == py_sim.server_seeds
    assert nt_sim.source_seeds == py_sim.source_seeds
    assert nt_sim.total_customers == py_sim.total_customers
    assert nt_sim.Clock == py_sim.Clock


def test_native_gamma_beta_parity(tmp_path):
    def build():
        adj = np.zeros((3, 3))
        adj[0, 0] = 1.0
        adj[0, 1], adj[0, 2] = 0.5, 0.5
        adj[1, 1] = adj[2, 2] = -1.0
        dists = [["gamma", 2.0, 0.0, 0.4], ["beta", 2.0, 3.0, 0.1, 1.0],
                 ["gamma", 0.7, 0.05, 0.5]]
        return adj, dists, [0, 8, 8]

    _, py_lines, _ = _run("python", tmp_path, build, 500)
    _, nt_lines, _ = _run("native", tmp_path, build, 500)
    assert nt_lines == py_lines and len(py_lines) > 200


def test_native_speedup(tmp_path):
    import time

    adj, dists, qlist = _dense_network()

    def timed(engine, n):
        np.random.seed(1)
        sim = Sim(np.array(adj), [list(d) for d in dists], list(qlist), seeds=[7],
                  generate_log=True, log_path=str(tmp_path) + f"/b{engine}_",
                  logging_mode="Music", engine=engine)
        t0 = time.perf_counter()
        sim.run(number_of_customers=n)
        return time.perf_counter() - t0

    n = 30000
    t_native = timed("native", n)
    t_python = timed("python", n)
    speedup = t_python / t_native
    print(f"native speedup: {speedup:.1f}x ({t_python:.3f}s -> {t_native:.3f}s)")
    # loose gate: this is a correctness guard against accidental fallback,
    # not a benchmark (see PARITY.md for measured numbers)
    assert speedup > 1.5


def test_native_record_history_matches_python():
    """Metrics histories (record_history=True) parity across engines."""
    adj = np.array([[1.0, 1.0], [0.0, -1.0]])
    dists = [["exponential", 1.0], ["exponential", 0.6]]

    def run(engine):
        np.random.seed(4)
        sim = Sim(adj, [list(d) for d in dists], [0, 40], seeds=[31, 32, 33],
                  record_history=True, engine=engine)
        sim.run(number_of_customers=2000)
        return sim

    py, nt = run("python"), run("native")
    assert len(nt.avg_queue_length_history) == len(py.avg_queue_length_history) == 3
    for attr in ("avg_queue_length_history", "avg_server_length_history",
                 "avg_queue_time_history", "renege_rate_history",
                 "server_utilizations_history", "max_queue_lengths_history",
                 "customers_served_per_server", "total_arrival_time_history"):
        for h_py, h_nt in zip(getattr(py, attr), getattr(nt, attr)):
            assert set(h_py) == set(h_nt), attr
            for k in h_py:
                assert h_nt[k] == pytest.approx(h_py[k], rel=1e-9, abs=1e-12), (attr, k)
    assert nt.total_customers_history == py.total_customers_history


def test_zero_wall_budget_matches_python(tmp_path):
    """max_sim_time=0.0 (a saturated float32 gen2[5] produces exactly this)
    must stop after the first event on BOTH engines — the native 0.0
    'disabled' sentinel regression."""
    adj = np.array([[1.0, 1.0], [0.0, -1.0]])
    dists = [["exponential", 1.0], ["exponential", 0.5]]
    lines = {}
    for eng in ("python", "native"):
        np.random.seed(2)
        sim = Sim(adj, dists, [0, 10], seeds=[5], generate_log=True,
                  log_path=str(tmp_path) + f"/{eng}_", logging_mode="Music",
                  max_sim_time=0.0, engine=eng)
        sim.run(number_of_customers=500)
        lines[eng] = list(sim.music_lines())
    assert lines["native"] == lines["python"]
    assert len(lines["python"]) <= 3  # stopped almost immediately


def test_route_to_source_falls_back_to_python():
    """A probability row that can deliver customers to a source node must
    use the Python engine (which raises KeyError like the reference) —
    the C++ core would spin on an unseeded stream."""
    adj = np.array([
        [1.0, 1.0, 0.0],
        [0.5, -1.0, 0.5],
        [0.0, 0.0, -1.0],
    ])
    dists = [["exponential", 1.0], ["exponential", 0.4], ["exponential", 0.4]]
    np.random.seed(3)
    sim = Sim(adj, dists, [0, 10, 10], seeds=[5], engine="auto")
    from gandes_tpu.des.native import native_eligible

    assert not native_eligible(sim)
    with pytest.raises(KeyError):
        sim.run(number_of_customers=200)


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
def test_native_log_formatting_matches_python_repr():
    """The C++ record formatter (des_format_records) must be byte-equal to
    the Python engine's f-string/repr() formatting — fuzz the float repr
    across magnitudes plus every layout edge (fixed/exp boundary, integral
    .0 suffix, subnormals, exponent widths, the int-0 processing quirk,
    server None)."""
    import ctypes as C

    from gandes_tpu.des.native import get_lib

    rng = np.random.RandomState(0)
    edge = np.array([
        0.0, -0.0, 1.0, -1.0, 0.1, 1 / 3, 123456.0, 1e15, 1e16, 1e17,
        9999999999999998.0, 1e-4, -1e-4, 1e-5, 2.5e-5, 6.9e-05, 5e-324,
        2.2250738585072014e-308, 1.7976931348623157e308, 0.30000000000000004,
        1234567890123456.7, 1e100, -3e-200,
        np.inf, -np.inf, np.nan,  # repr 'inf'/'-inf'/'nan' (ADVICE r1)
    ])
    fuzz = (rng.randn(20000) * np.exp(rng.uniform(-300, 300, 20000) * np.log(10)
                                      ).clip(1e-307, 1e307))
    plain = rng.standard_exponential(20000) * 10  # typical event times
    values = np.ascontiguousarray(np.concatenate([edge, fuzz, plain]))
    m = len(values)
    ids = np.arange(m, dtype=np.int64)
    servers = np.ascontiguousarray(
        rng.randint(-1, 5, m).astype(np.int32))
    kinds = np.ascontiguousarray(rng.randint(0, 3, m).astype(np.uint8))
    kinds[:2] = 1  # 0.0/-0.0 with kind 'processing': -0.0 == 0.0 hits the quirk

    lib = get_lib()
    ptr = lambda a: a.ctypes.data_as(C.c_void_p)
    buf = C.create_string_buffer(128 * m)
    nb = lib.des_format_records(ptr(values), ptr(ids), ptr(servers), ptr(kinds),
                                C.c_int64(0), C.c_int64(m), buf, C.c_int64(len(buf)))
    assert nb >= 0
    got = buf.raw[:nb].decode("ascii").split("\n")

    names = ("arrival", "processing", "departure")
    expected = []
    for v, i, s, kk in zip(values.tolist(), ids.tolist(), servers.tolist(),
                           kinds.tolist()):
        if kk == 1 and v == 0.0:
            expected.append(f"INFO:root:0 - {i} - {s} - processing")
        elif s >= 0:
            expected.append(f"INFO:root:{v!r} - {i} - {s} - {names[kk]}")
        else:
            expected.append(f"INFO:root:{v!r} - {i} - None - {names[kk]}")
    assert got == expected


def test_engine_fallback_for_unsupported_configs():
    adj = np.array([[1.0, 1.0], [0.0, -1.0]])
    dists = [["exponential", 1.0], ["exponential", 0.5]]
    np.random.seed(0)
    # 'All' logging mode is Python-only: auto falls back silently
    sim = Sim(adj, dists, [0, 10], seeds=[1], engine="auto",
              generate_log=True, logging_mode="All")
    sim.run(number_of_customers=200)
    assert sim.servers[1].total_customers_served > 0
    with pytest.raises(ValueError):
        Sim(adj, dists, [0, 10], seeds=[1], engine="native",
            generate_log=True, logging_mode="All").run(number_of_customers=10)


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
@pytest.mark.parametrize("support", ["int", "float"])
def test_native_discrete_distribution_parity(tmp_path, support):
    """Discrete service/interarrival nodes run natively with byte-identical
    logs — including the int-vs-float 'processing' time formatting that
    follows the support array's dtype (scipy rv_discrete.rvs)."""
    adj = np.array([
        [1.0, 0.6, 0.4],
        [0.0, -1.0, 1.0],
        [0.0, 0.0, -1.0],
    ])
    if support == "int":
        service = [["discrete", [1, 2, 5], [0.25, 0.5, 0.25]],
                   ["discrete", [2, 3], [0.5, 0.5]]]
    else:
        service = [["discrete", [0.5, 1.25, 2.0], [0.25, 0.5, 0.25]],
                   ["discrete", [1.5, 3.25], [0.5, 0.5]]]
    dists = [["exponential", 0.8]] + service
    logs = {}
    for engine in ("python", "native"):
        np.random.seed(11)
        sim = Sim(adj, dists, [0, 8, 8], seeds=[5, 6], generate_log=True,
                  log_path=str(tmp_path) + f"/{engine}_", logging_mode="Music",
                  max_sim_time=60, engine=engine)
        sim.run(number_of_customers=300)
        logs[engine] = (tmp_path / f"{engine}_simulation.log").read_text()
    assert logs["python"] == logs["native"]
    processing = [l for l in logs["native"].splitlines() if "processing" in l]
    assert len(processing) > 50
    times = [l.split(" - ")[0].split(":")[-1] for l in processing]
    if support == "int":
        assert all("." not in t for t in times)  # '2', never '2.0'
    else:
        assert any("." in t for t in times)


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
def test_native_discrete_redraw_fallback_parity(tmp_path):
    """An int-support discrete service node whose support is all non-positive
    hits the 10000-redraw cap; the 1e-9 fallback is assigned as a Python
    *float* and must log as '1e-09' in both engines — not as the int-kind
    '0' the node's dtype would otherwise imply (review finding, r2)."""
    adj = np.array([
        [1.0, 1.0],
        [0.0, -1.0],
    ])
    dists = [["exponential", 0.8],
             ["discrete", [-1, 0], [0.5, 0.5]]]
    logs = {}
    for engine in ("python", "native"):
        np.random.seed(3)
        sim = Sim(adj, dists, [0, 4], seeds=[9], generate_log=True,
                  log_path=str(tmp_path) + f"/{engine}_", logging_mode="Music",
                  max_sim_time=60, engine=engine)
        sim.run(number_of_customers=40)
        logs[engine] = (tmp_path / f"{engine}_simulation.log").read_text()
    assert logs["python"] == logs["native"]
    assert "1e-09 - " in logs["native"]  # the fallback actually fired
