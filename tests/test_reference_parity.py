"""Byte-level parity against the reference DES.

Runs the reference `simulation_v3.Sim` (when mounted at /root/reference)
and our engine on identical networks, seeds, and global-RNG state, then
compares the 'Music' event logs line-for-line and the per-server statistics.
This pins event ordering, RNG draw sequences, routing, reneging, delayed
departures, and float formatting all at once.
"""

import logging

import numpy as np
import pytest

from gandes_tpu.des import Sim

from conftest import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted at /root/reference"
)


def _load_reference():
    import sys

    if "/root/reference/SIMULATOR" not in sys.path:
        sys.path.insert(0, "/root/reference/SIMULATOR")
    import simulation_v3

    return simulation_v3


def _clear_root_logger():
    for h in logging.root.handlers[:]:
        logging.root.removeHandler(h)
        try:
            h.close()
        except Exception:
            pass
    logging.root.setLevel(logging.WARNING)


def _run_reference(tmp_path, adj, dists, qlist, seeds, n_customers, **kw):
    ref = _load_reference()
    _clear_root_logger()
    np.random.seed(123)
    sim = ref.Sim(
        np.array(adj, dtype=np.float64),
        [list(d) for d in dists],
        list(qlist),
        seeds=list(seeds),
        generate_log=True,
        log_path=str(tmp_path) + "/ref_",
        logging_mode="Music",
        max_sim_time=kw.get("max_sim_time", 60),
    )
    sim.run(number_of_customers=n_customers,
            use_next_available_server=kw.get("use_next_available_server", False))
    _clear_root_logger()
    lines = (tmp_path / "ref_simulation.log").read_text().splitlines()
    return sim, lines


def _run_ours(tmp_path, adj, dists, qlist, seeds, n_customers, **kw):
    np.random.seed(123)
    sim = Sim(
        np.array(adj, dtype=np.float64),
        [list(d) for d in dists],
        list(qlist),
        seeds=list(seeds),
        generate_log=True,
        log_path=str(tmp_path) + "/ours_",
        logging_mode="Music",
        max_sim_time=kw.get("max_sim_time", 60),
    )
    sim.run(number_of_customers=n_customers,
            use_next_available_server=kw.get("use_next_available_server", False))
    lines = (tmp_path / "ours_simulation.log").read_text().splitlines()
    return sim, lines


def _assert_stats_match(ref_sim, our_sim):
    assert set(ref_sim.servers) == set(our_sim.servers)
    for sid in ref_sim.servers:
        r, o = ref_sim.servers[sid], our_sim.servers[sid]
        assert o.total_customers_served == r.total_customers_served, sid
        assert o.reneges == r.reneges, sid
        assert o.max_queue_length == r.max_queue_length, sid
        assert o.total_time_in_service == pytest.approx(r.total_time_in_service, rel=1e-9), sid
        assert o.total_time_in_queue == pytest.approx(r.total_time_in_queue, rel=1e-9, abs=1e-12), sid
        assert o.cumulative_queue_length == pytest.approx(r.cumulative_queue_length, rel=1e-9, abs=1e-12), sid
        # lazy accounting vs per-event sweep: same buckets, same totals
        r_qlt = {k: v for k, v in r.queue_length_times.items() if v != 0}
        o_qlt = {k: v for k, v in o.queue_length_times.items() if v != 0}
        assert set(o_qlt) == set(r_qlt), sid
        for k in r_qlt:
            assert o_qlt[k] == pytest.approx(r_qlt[k], rel=1e-9, abs=1e-12), (sid, k)
    for src in ref_sim.sources:
        assert our_sim.sources[src].customers_generated == ref_sim.sources[src].customers_generated
        assert our_sim.sources[src].arrival_times == pytest.approx(
            ref_sim.sources[src].arrival_times, rel=1e-12
        )


def _dense_network():
    """2 sources + 5 servers + a branch node, proper probability rows."""
    n = 8
    adj = np.zeros((n, n))
    adj[0, 0] = 1.0
    adj[1, 1] = 1.0
    for i in range(2, n):
        adj[i, i] = -1.0
    adj[0, 2], adj[0, 3] = 0.5, 0.5
    adj[1, 3], adj[1, 4] = 0.25, 0.75
    adj[2, 4], adj[2, 5] = 0.5, 0.5
    adj[3, 5] = 1.0
    adj[4, 6], adj[4, 7] = 0.3, 0.7
    # 5,6,7: zero rows -> sinks
    dists = [
        ["exponential", 1.0],
        ["normal", 2.0, 1.5],
        ["exponential", 0.7],
        ["normal", 1.0, 0.8],
        ["branch"],
        ["exponential", 0.5],
        ["uniform", 0.2, 0.6],
        ["gamma", 2.0, 0.0, 0.3],
    ]
    qlist = [0, 0, 5, 5, 5, 5, 5, 5]
    return adj, dists, qlist


def _shortest_queue_network():
    """Source row not summing to 1 -> shortest-queue routing; includes a
    'queue' node feeding two servers (exercises delayed departures)."""
    n = 6
    adj = np.zeros((n, n))
    adj[0, 0] = 1.0
    adj[0, 1], adj[0, 2] = 0.4, 0.3  # sums to 0.7 -> shortest queue
    for i in range(1, n):
        adj[i, i] = -1.0
    adj[1, 3] = 1.0
    adj[2, 3] = 1.0
    adj[3, 4], adj[3, 5] = 0.5, 0.5  # queue node routes to 4/5
    dists = [
        ["exponential", 0.3],
        ["exponential", 0.4],
        ["exponential", 0.4],
        ["queue"],
        ["normal", 3.0, 1.0],
        ["normal", 3.0, 1.0],
    ]
    qlist = [0, 4, 4, 10, 4, 4]
    return adj, dists, qlist


CONFIGS = {
    "dense": (_dense_network, 400, {}),
    "dense_next_available": (_dense_network, 300, {"use_next_available_server": True}),
    "shortest_queue_delayed": (_shortest_queue_network, 400, {}),
}


def test_all_mode_log_byte_parity(tmp_path):
    """'All' logging mode (verbose lifecycle lines, <100-customer gates)
    byte-parity — always on the Python engine (the native core only
    implements 'Music')."""
    adj, dists, qlist = _dense_network()
    ref = _load_reference()
    _clear_root_logger()
    np.random.seed(123)
    sim = ref.Sim(np.array(adj), [list(d) for d in dists], list(qlist), seeds=[11, 12],
                  generate_log=True, log_path=str(tmp_path) + "/ref_",
                  logging_mode="All", max_sim_time=60)
    sim.run(number_of_customers=60)
    _clear_root_logger()
    ref_lines = (tmp_path / "ref_simulation.log").read_text().splitlines()

    np.random.seed(123)
    ours = Sim(np.array(adj), [list(d) for d in dists], list(qlist), seeds=[11, 12],
               generate_log=True, log_path=str(tmp_path) + "/ours_",
               logging_mode="All", max_sim_time=60)
    ours.run(number_of_customers=60)
    our_lines = (tmp_path / "ours_simulation.log").read_text().splitlines()
    assert len(ref_lines) > 100
    # the reference's last line embeds a wall-clock elapsed time; compare
    # everything except that timing token
    import re as _re

    def scrub(lines):
        return [_re.sub(r"\d+\.\d+(e-?\d+)? elapsed time", "<T> elapsed time", l)
                for l in lines]

    assert scrub(our_lines) == scrub(ref_lines)


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_music_log_byte_parity(tmp_path, name):
    build, n_customers, kw = CONFIGS[name]
    adj, dists, qlist = build()
    seeds = [101, 202]
    ref_sim, ref_lines = _run_reference(tmp_path, adj, dists, qlist, seeds, n_customers, **kw)
    our_sim, our_lines = _run_ours(tmp_path, adj, dists, qlist, seeds, n_customers, **kw)
    assert len(ref_lines) > 50
    assert our_lines == ref_lines
    _assert_stats_match(ref_sim, our_sim)
