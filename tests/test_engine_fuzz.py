"""Randomized DES parity hammer.

Property: for ANY supported network configuration, the Python engine, the
C++ engine, and the reference produce byte-identical Music event logs and
identical statistics given identical seeds. The three fixed scenarios in
test_reference_parity pin known layouts; this suite sweeps randomly
generated networks (sizes, routing modes, distribution kinds, queue caps,
replication counts) so layout-dependent regressions can't hide.
"""

import os

import numpy as np
import pytest

from gandes_tpu.des import Sim
from gandes_tpu.des.native import native_available

from conftest import reference_available
from test_reference_parity import (
    _assert_stats_match,
    _run_ours,
    _run_reference,
)

# dyadic weights sum to exactly 1.0 in float -> probability-routing mode;
# anything else falls back to the reference's shortest-queue mode
_EXACT_WEIGHT_SETS = ([1.0], [0.5, 0.5], [0.5, 0.25, 0.25], [0.25] * 4)


def _random_net(seed):
    """A random supported network: sources with exponential/uniform/gamma
    interarrivals, servers over all continuous kinds plus 'branch', routing
    rows mixing exact-probability / shortest-queue / sink modes, varied
    queue caps. Never routes to a source (the reference raises KeyError on
    such nets, so they are out of the supported envelope)."""
    rng = np.random.RandomState(seed)
    n = int(rng.randint(4, 11))
    n_src = int(rng.randint(1, 3))
    servers = list(range(n_src, n))
    adj = np.zeros((n, n))
    dists = []
    for i in range(n):
        adj[i, i] = 1.0 if i < n_src else -1.0
    for i in range(n):
        mode = rng.rand()
        # children exclude self: a self-loop entry would overwrite the
        # diagonal, silently retyping the node
        kids = [c for c in servers if c != i]
        if i >= n_src and mode < 0.2:
            pass  # zero row -> sink
        elif mode < 0.6:
            k = int(rng.randint(1, min(4, len(kids)) + 1))
            ws = _EXACT_WEIGHT_SETS[k - 1]
            for c, w in zip(rng.choice(kids, size=k, replace=False), ws):
                adj[i, c] = w
        else:
            k = int(rng.randint(1, min(3, len(kids)) + 1))
            for c in rng.choice(kids, size=k, replace=False):
                adj[i, c] = float(rng.rand() * 0.8 + 0.1)
        if i < n_src and not adj[i, kids].any():
            adj[i, kids[int(rng.randint(len(kids)))]] = 1.0
        if i < n_src:
            dists.append([
                ["exponential", 0.5 + rng.rand()],
                ["uniform", 0.1, 0.5 + rng.rand()],
                ["gamma", 2.0, 0.0, 0.3],
            ][int(rng.randint(3))])
        else:
            dists.append([
                ["exponential", 0.3 + rng.rand()],
                ["uniform", 0.05, 0.3 + rng.rand()],
                ["normal", 1.0, 0.2],
                ["beta", 2.0, 3.0, 0.0, 1.0],
                ["gamma", 2.0, 0.0, 0.25],
                ["branch"],
            ][int(rng.randint(6))])
    queue_caps = [int(c) for c in rng.choice([0, 1, 5, 30], size=n)]
    seeds = [int(rng.randint(1, 2**31))]
    if rng.rand() < 0.3:
        seeds.append(seeds[0] + 1)
    return adj, dists, queue_caps, seeds


def _run_engine(engine, tmp_path, adj, dists, qs, seeds, customers):
    np.random.seed(123)
    sim = Sim(np.array(adj), [list(d) for d in dists], list(qs),
              seeds=list(seeds), generate_log=True,
              log_path=str(tmp_path) + f"/{engine}_", logging_mode="Music",
              max_sim_time=60, engine=engine)
    sim.run(number_of_customers=customers)
    lines = (tmp_path / f"{engine}_simulation.log").read_text().splitlines()
    return sim, lines


# scale the sweep up for heavy validation runs: GANDES_FUZZ_NETS=100
try:
    _N_FUZZ = int(os.environ.get("GANDES_FUZZ_NETS", "12"))
except ValueError:
    _N_FUZZ = 12
if _N_FUZZ < 1:
    _N_FUZZ = 12


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
@pytest.mark.parametrize("seed", range(_N_FUZZ))
def test_fuzz_native_matches_python(tmp_path, seed):
    adj, dists, qs, seeds = _random_net(seed)
    py_sim, py_lines = _run_engine("python", tmp_path, adj, dists, qs, seeds, 300)
    nt_sim, nt_lines = _run_engine("native", tmp_path, adj, dists, qs, seeds, 300)
    assert nt_lines == py_lines, f"net seed {seed}"
    _assert_stats_match(py_sim, nt_sim)
    # both engines leave the global numpy routing stream at the same point
    np.random.seed(123)
    _run_engine("python", tmp_path, adj, dists, qs, seeds, 300)
    s_py = np.random.get_state()
    np.random.seed(123)
    _run_engine("native", tmp_path, adj, dists, qs, seeds, 300)
    s_nt = np.random.get_state()
    assert s_py[2] == s_nt[2] and np.array_equal(s_py[1], s_nt[1])


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize(
    "seed", [0, 3, 7, 9] if _N_FUZZ <= 12 else list(range(_N_FUZZ)))
def test_fuzz_ours_matches_reference(tmp_path, seed):
    adj, dists, qs, seeds = _random_net(seed)
    ref_sim, ref_lines = _run_reference(tmp_path, adj, dists, qs, seeds, 300)
    our_sim, our_lines = _run_ours(tmp_path, adj, dists, qs, seeds, 300)
    assert our_lines == ref_lines, f"net seed {seed}"
    _assert_stats_match(ref_sim, our_sim)
