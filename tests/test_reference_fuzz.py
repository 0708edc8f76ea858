"""Randomized-topology byte-parity fuzz against the executed reference DES.

The hand-built configs in test_reference_parity.py pin three topologies;
this suite draws the whole network per case — source/server counts, queue
caps, routing rows (proper, shortest-queue, sinks), and distribution kinds
including gamma/beta/discrete service nodes plus branch/queue nodes
(`/root/reference/SIMULATOR/simulation_v3.py:148-282`) — runs both engines
on identical seeds/global-RNG state, and compares the full 'Music' logs
byte-for-byte plus the per-server statistics.

Case count defaults to 25; scale with GANDES_FUZZ_TOPO=<n>.
"""

import logging
import os

import numpy as np
import pytest

from gandes_tpu.des import Sim

from conftest import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted at /root/reference"
)

N_CASES = int(os.environ.get("GANDES_FUZZ_TOPO", "25"))


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


def _random_distribution(rng, role):
    """A distribution spec in the reference's list format. ``role`` is
    'source' (interarrival) or 'server' (service)."""
    kinds = ["exponential", "uniform", "normal", "gamma", "beta", "discrete"]
    kind = kinds[rng.randint(0, len(kinds))]
    if kind == "exponential":
        return ["exponential", float(rng.uniform(0.3, 2.5))]
    if kind == "uniform":
        return ["uniform", float(rng.uniform(0.05, 0.5)), float(rng.uniform(0.3, 2.0))]
    if kind == "normal":
        # positive mean; negative draws exercise the redraw-while-<=0 loop
        return ["normal", float(rng.uniform(0.8, 3.0)), float(rng.uniform(0.2, 1.5))]
    if kind == "gamma":
        return ["gamma", float(rng.uniform(0.5, 3.0)), 0.0, float(rng.uniform(0.3, 1.2))]
    if kind == "beta":
        return ["beta", float(rng.uniform(0.5, 3.0)), float(rng.uniform(0.5, 3.0)),
                0.0, float(rng.uniform(0.5, 2.0))]
    # discrete: integer support, probs summing to exactly 1 in binary
    k = rng.randint(2, 5)
    values = sorted(rng.choice(np.arange(1, 9), size=k, replace=False).tolist())
    raw = rng.randint(1, 8, size=k).astype(np.float64)
    probs = (raw / raw.sum()).tolist()
    probs[-1] = float(1.0 - sum(probs[:-1]))
    return ["discrete", values, probs]


def _random_network(case: int):
    """Draw a full network config. Returns (adj, dists, qlist, n_customers,
    use_next_available_server, seeds)."""
    rng = np.random.RandomState(10_000 + case)
    n_src = rng.randint(1, 4)
    n_srv = rng.randint(2, 7)
    n = n_src + n_srv
    adj = np.zeros((n, n))
    dists = []
    qlist = []
    servers = list(range(n_src, n))

    special = None  # at most one branch OR queue node per net
    if n_srv >= 3 and rng.rand() < 0.4:
        special = ("branch" if rng.rand() < 0.5 else "queue",
                   servers[rng.randint(0, n_srv - 1)])  # never the last server

    def route_row(i, children, proper_p=0.75):
        k = len(children)
        if rng.rand() < proper_p:
            raw = rng.randint(1, 6, size=k).astype(np.float64)
            probs = raw / raw.sum()
            probs[-1] = 1.0 - probs[:-1].sum()  # exact float sum -> proper row
        else:
            probs = rng.uniform(0.05, 0.4, size=k)  # doesn't sum to 1 ->
            # shortest-queue fallback in FlowBranchOperator
        for c, p in zip(children, probs):
            adj[i, c] = p

    for i in range(n_src):
        adj[i, i] = 1.0
        k = rng.randint(1, min(3, n_srv) + 1)
        children = sorted(rng.choice(servers, size=k, replace=False).tolist())
        route_row(i, children)
        dists.append(_random_distribution(rng, "source"))
        qlist.append(0)

    for i in servers:
        adj[i, i] = -1.0
        downstream = [j for j in servers if j > i]
        is_special = special is not None and special[1] == i
        if is_special:
            # branch/queue nodes must route somewhere downstream
            k = rng.randint(1, min(2, len(downstream)) + 1)
            children = sorted(rng.choice(downstream, size=k, replace=False).tolist())
            route_row(i, children)
            dists.append([special[0]] if special[0] == "branch" else ["queue"])
            qlist.append(int(rng.randint(2, 12)))
            continue
        if not downstream or rng.rand() < 0.35:
            pass  # zero row -> sink
        else:
            k = rng.randint(1, min(3, len(downstream)) + 1)
            children = sorted(rng.choice(downstream, size=k, replace=False).tolist())
            route_row(i, children)
        dists.append(_random_distribution(rng, "server"))
        qlist.append(int(rng.randint(1, 25)))

    n_customers = int(rng.randint(120, 400))
    use_nas = bool(rng.rand() < 0.25)
    seeds = rng.randint(1, 10_000, size=rng.randint(1, 3)).tolist()
    return adj, dists, qlist, n_customers, use_nas, seeds


def _run(sim_cls, tmp_path, tag, adj, dists, qlist, seeds, n_customers, use_nas):
    _clear_root_logger()
    np.random.seed(123)
    sim = sim_cls(
        np.array(adj, dtype=np.float64),
        [list(d) for d in dists],
        list(qlist),
        seeds=list(seeds),
        generate_log=True,
        log_path=str(tmp_path) + f"/{tag}_",
        logging_mode="Music",
        max_sim_time=60,
    )
    sim.run(number_of_customers=n_customers, use_next_available_server=use_nas)
    _clear_root_logger()
    lines = (tmp_path / f"{tag}_simulation.log").read_text().splitlines()
    return sim, lines


@pytest.mark.parametrize("case", range(N_CASES))
def test_random_topology_log_byte_parity(tmp_path, case):
    adj, dists, qlist, n_customers, use_nas, seeds = _random_network(case)
    ref = _load_reference()
    ref_sim, ref_lines = _run(ref.Sim, tmp_path, "ref", adj, dists, qlist,
                              seeds, n_customers, use_nas)
    our_sim, our_lines = _run(Sim, tmp_path, "ours", adj, dists, qlist,
                              seeds, n_customers, use_nas)
    assert our_lines == ref_lines
    assert len(ref_lines) > 10  # the net actually ran

    for sid in ref_sim.servers:
        r, o = ref_sim.servers[sid], our_sim.servers[sid]
        assert o.total_customers_served == r.total_customers_served, sid
        assert o.reneges == r.reneges, sid
        assert o.max_queue_length == r.max_queue_length, sid
        assert o.total_time_in_service == pytest.approx(
            r.total_time_in_service, rel=1e-9, abs=1e-12), sid
    for src in ref_sim.sources:
        assert (our_sim.sources[src].customers_generated
                == ref_sim.sources[src].customers_generated)


@pytest.mark.parametrize("case", range(max(5, N_CASES // 5)))
def test_random_topology_all_mode_parity(tmp_path, case):
    """'All' logging mode (verbose lifecycle lines, <100-customer gates) on
    randomized topologies — always the Python engine (native is
    Music-only). The reference's last line embeds wall-clock elapsed time;
    compare everything except that token."""
    import re

    adj, dists, qlist, n_customers, use_nas, seeds = _random_network(900 + case)
    ref = _load_reference()

    def run_all(sim_cls, tag):
        _clear_root_logger()
        np.random.seed(123)
        sim = sim_cls(np.array(adj, dtype=np.float64),
                      [list(d) for d in dists], list(qlist),
                      seeds=list(seeds), generate_log=True,
                      log_path=str(tmp_path) + f"/{tag}_",
                      logging_mode="All", max_sim_time=60)
        sim.run(number_of_customers=min(n_customers, 80), use_next_available_server=use_nas)
        _clear_root_logger()
        return (tmp_path / f"{tag}_simulation.log").read_text().splitlines()

    scrub = lambda lines: [
        re.sub(r"\d+\.\d+(e-?\d+)? elapsed time", "<T> elapsed time", l)
        for l in lines]
    ref_lines = run_all(ref.Sim, "ref")
    our_lines = run_all(Sim, "ours")
    assert len(ref_lines) > 50
    assert scrub(our_lines) == scrub(ref_lines)
