"""DES engine tests: determinism, queueing-theory validation, log format.

These automate the reference project's manual validation methodology
(SURVEY.md section 4): simulated M/M/1 metrics vs closed forms, blocking
rates vs M/M/c/N theory, and seeded reproducibility.
"""

import re

import numpy as np
import pytest

from gandes_tpu.des import Sim, calculate_theoretical_renege_rate, mm1_lq, mm1_pk
from gandes_tpu.des.engine import FlowBranchOperator

MUSIC_RE = re.compile(
    r"INFO:root:([0-9]*\.[0-9]+|[0-9]+) - ([0-9]*\.[0-9]+|[0-9]+) - "
    r"([0-9]*\.[0-9]+|[0-9]+) - (arrival|departure)"
)


def mm1_system(rho, cap=10**9):
    """Source node 0 -> server node 1 -> sink. Interarrival mean 1 (lam=1),
    service mean rho (mu = 1/rho)."""
    adj = np.array([[1.0, 1.0], [0.0, -1.0]])
    dists = [["exponential", 1.0], ["exponential", rho]]
    queue_list = [0, cap]
    return adj, dists, queue_list


def test_seeded_determinism(tmp_path):
    adj, dists, q = mm1_system(0.7)
    logs = []
    for _ in range(2):
        np.random.seed(7)
        sim = Sim(adj, dists, q, seeds=[11, 12], generate_log=True,
                  log_path=str(tmp_path) + "/", logging_mode="Music")
        sim.run(number_of_customers=500)
        logs.append(list(sim.music_lines()))
    assert logs[0] == logs[1]
    assert len(logs[0]) > 100


def test_distinct_seeds_differ():
    adj, dists, q = mm1_system(0.7)
    np.random.seed(7)
    a = Sim(adj, dists, q, seeds=[11], generate_log=True, log_path="/tmp/a_", logging_mode="Music")
    a.run(number_of_customers=300)
    np.random.seed(7)
    b = Sim(adj, dists, q, seeds=[12], generate_log=True, log_path="/tmp/b_", logging_mode="Music")
    b.run(number_of_customers=300)
    assert a.music_lines() != b.music_lines()


def test_music_log_format(tmp_path):
    adj, dists, q = mm1_system(0.5)
    np.random.seed(0)
    sim = Sim(adj, dists, q, seeds=[5], generate_log=True,
              log_path=str(tmp_path) + "/", logging_mode="Music")
    sim.run(number_of_customers=200)
    lines = sim.music_lines()
    kinds = {"arrival": 0, "departure": 0, "processing": 0}
    for line in lines:
        assert line.startswith("INFO:root:")
        if line.endswith("arrival"):
            kinds["arrival"] += 1
        elif line.endswith("departure"):
            kinds["departure"] += 1
        elif line.endswith("processing"):
            kinds["processing"] += 1
    assert kinds["arrival"] > 50 and kinds["departure"] > 50 and kinds["processing"] > 50
    # the machine-readable subset parses with the reference regex
    parsed = [m for m in map(MUSIC_RE.match, lines) if m]
    assert len(parsed) > 100
    # flushed file is byte-identical to the in-memory buffer
    content = (tmp_path / "simulation.log").read_text().splitlines()
    assert content == lines


def test_mm1_metrics_match_theory():
    rho = 0.5
    adj, dists, q = mm1_system(rho)
    np.random.seed(3)
    sim = Sim(adj, dists, q, seeds=list(range(200, 208)), record_history=True)
    sim.run(number_of_customers=20000)
    lq = np.mean([h[1] for h in sim.avg_queue_length_history])
    util = np.mean([h[1] for h in sim.server_utilizations_history])
    assert util == pytest.approx(rho, rel=0.06)
    assert lq == pytest.approx(mm1_lq(rho), rel=0.15)


def test_mm1_queue_length_distribution_geometric():
    rho = 0.4
    adj, dists, q = mm1_system(rho)
    np.random.seed(3)
    sim = Sim(adj, dists, q, seeds=[77, 78, 79, 80], record_history=True)
    sim.run(number_of_customers=20000)
    # P(server system has k=0 in queue & idle) ~ time at queue length 0 is
    # dominated by idle; use P(0 in queue) = 1 - rho^2 under M/M/1.
    probs = sim.probabilities_of_queue_lengths_history
    p0 = np.mean([p[1].get(0, 0.0) for p in probs])
    assert p0 == pytest.approx(1 - mm1_pk(0.0, 0) * 0 - rho * rho, rel=0.1)


def test_blocking_renege_rate():
    # M/M/1/(N+1): finite queue cap, high load -> renege (blocking) rate
    # approaches the theoretical full-system probability.
    rho = 0.9
    cap = 3
    adj, dists, q = mm1_system(rho, cap=cap)
    np.random.seed(5)
    sim = Sim(adj, dists, q, seeds=list(range(300, 306)), record_history=True)
    sim.run(number_of_customers=20000)
    served = np.mean([h[1] for h in sim.customers_served_per_server])
    reneges = np.mean([h[1] * s for h, s in zip(sim.renege_rate_history,
                                                [h[1] for h in sim.customers_served_per_server])])
    frac_blocked = reneges / (served + reneges)
    theo = calculate_theoretical_renege_rate(1.0, 1 / rho, 1, cap)
    assert frac_blocked == pytest.approx(theo, rel=0.25)


def test_branch_normalization_and_shortest_queue_semantics():
    # Rows with positive entries are renormalized to sum 1 -> probability
    # routing, never shortest-queue (reference FlowBranchOperator :40-52:
    # after normalization |1 - sum| can only exceed 1e-4 for EMPTY rows).
    adj = np.array([
        [2.0, 0.3, 0.3, 0.0],
        [0.0, -1.0, 0.0, 0.0],
        [0.0, 0.0, -1.0, 0.0],
        [0.0, 0.0, 0.0, -1.0],
    ])
    dists = [["exponential", 1.0]] + [["exponential", 0.5]] * 3
    q = [0, 100, 100, 100]
    np.random.seed(9)
    sim = Sim(adj, dists, q, seeds=[1])
    src_dest = sim.sources[0].destination
    assert not src_dest.uses_shortest_queue()
    assert src_dest.children == [1, 2]
    assert src_dest.probabilities == pytest.approx([0.5, 0.5])
    # an empty row sets the shortest-queue flag (and reads as a sink)
    srv_dest = sim.servers[3].destination
    assert srv_dest.uses_shortest_queue()
    assert srv_dest.is_sink()
    sim.run(number_of_customers=500)
    assert sim.servers[1].total_customers_served > 0


def test_sink_detection():
    fb = FlowBranchOperator(probabilities=[0.0, 0.0], children=[0, 0], origin=1)
    assert fb.is_sink()
    fb2 = FlowBranchOperator(probabilities=[0.0, 1.0], children=[0, 1], origin=0)
    assert not fb2.is_sink()


def test_num_runs_without_seeds():
    adj, dists, q = mm1_system(0.5)
    np.random.seed(1)
    sim = Sim(adj, dists, q, num_runs=2)
    sim.run(number_of_customers=100)
    assert sim.seeds == [1000, 1001]


def test_wall_clock_budget():
    import time
    adj, dists, q = mm1_system(0.99)
    np.random.seed(1)
    sim = Sim(adj, dists, q, seeds=[4], max_sim_time=0.05)
    t0 = time.time()
    sim.run(number_of_customers=10**8)
    assert time.time() - t0 < 5.0
