"""SimTester sweeps, Sim plotting surface, visualization, profiling."""

import os

import numpy as np
import pytest

from gandes_tpu.des import Sim
from gandes_tpu.des.tester import SimTester
from gandes_tpu.des.theory import mm1_lq


def mm1(rho=0.5, cap=10**9):
    adj = np.array([[1.0, 1.0], [0.0, -1.0]])
    dists = [["exponential", 1.0], ["exponential", rho]]
    return adj, dists, [0, cap]


def test_sim_tester_utilization_sweep_matches_theory():
    adj, dists, q = mm1()
    np.random.seed(0)
    tester = SimTester(adj, dists, q, seeds=list(range(50, 56)), record_history=True)
    utils = [0.3, 0.6]
    tester.test_server_utilization([[], utils], number_of_customers=20000)
    lqs = [m for m, _ in tester.avg_queue_length_history[1]]
    assert lqs[0] == pytest.approx(mm1_lq(0.3), rel=0.2)
    assert lqs[1] == pytest.approx(mm1_lq(0.6), rel=0.2)
    obs = [m for m, _ in tester.observed_utilizations[1]]
    assert obs[0] == pytest.approx(0.3, rel=0.1)
    assert obs[1] == pytest.approx(0.6, rel=0.1)


def test_sim_tester_plots_and_ranking(tmp_path):
    adj, dists, q = mm1()
    np.random.seed(0)
    tester = SimTester(adj, dists, q, seeds=[1, 2, 3], record_history=True)
    tester.test_server_utilization([[], [0.4, 0.7]], number_of_customers=3000)
    theory = tester.plot_metrics(server=1, save_path=str(tmp_path / "sweep.png"))
    assert os.path.exists(tmp_path / "sweep.png")
    assert theory["Average queue length"][0] == pytest.approx(mm1_lq(0.4))
    ranked = tester.find_principle_servers()
    assert ranked[0][0][0] == 1  # server 1 tops the queue-length ranking
    tester.display_principle_servers()


def test_sim_tester_all_servers_sweep(tmp_path):
    adj, dists, q = mm1()
    np.random.seed(0)
    tester = SimTester(adj, dists, q, seeds=[7, 8], record_history=True)
    settings = [["exponential", 0.3], ["exponential", 0.7]]
    tester.test_all_servers(settings, number_of_customers=3000)
    assert len(tester.queue_times[0]) == 2
    tester.plot_metrics_all_servers(save_path=str(tmp_path / "all.png"))
    assert os.path.exists(tmp_path / "all.png")


def test_randomness_check():
    adj, dists, q = mm1()
    np.random.seed(0)
    tester = SimTester(adj, dists, q, seeds=[1, 2, 3, 4], record_history=True)
    tester.test_server_utilization([[], [0.5]], number_of_customers=500)
    chi_servers, chi_sources, limit, warnings = tester.randomness_check()
    assert limit > 0
    assert len(chi_servers) == 1 and len(chi_servers[0]) == 5  # id + 4 seeds
    # healthy MT19937 streams: most chi-square stats under the reject limit
    vals = chi_servers[0][1:] + chi_sources[0][1:]
    assert np.mean([v < limit for v in vals]) >= 0.75
    assert warnings == []


def test_sim_plotting_surface(tmp_path):
    adj, dists, q = mm1(0.6)
    np.random.seed(0)
    sim = Sim(adj, dists, q, seeds=[3, 4, 5], record_history=True)
    sim.run(number_of_customers=5000)
    sim.plot_metrics(server=1, save_path=str(tmp_path / "m.png"))
    sim.plot_metrics_all_servers(theoretical={"LQ": [mm1_lq(0.6)]},
                                 save_path=str(tmp_path / "all.png"))
    probs, theo = sim.plot_probability_k_customers_in_system(
        node=1, save_path=str(tmp_path / "pk.png"))
    assert probs.shape == theo.shape == (10,)
    # reference quirk preserved: "simulated" bars are time-at-QUEUE-length
    # (P(0 in queue) = 1 - rho^2 for M/M/1) while the theoretical bars are
    # the SYSTEM-size geometric rho^k(1-rho) — they intentionally differ.
    assert probs[0] == pytest.approx(1 - 0.6**2, abs=0.05)
    assert theo[0] == pytest.approx(1 - 0.6, abs=0.05)
    sim.plot_cumulative_renege_rates(queue_length=5, save_path=str(tmp_path / "rr.png"))
    for f in ("m.png", "all.png", "pk.png", "rr.png"):
        assert os.path.exists(tmp_path / f)


def test_visualizations(tmp_path):
    from gandes_tpu.eval import (
        plot_input_matrix,
        plot_spectrogram,
        simulation_log_to_gif,
        visualize_piano_roll,
    )

    roll = np.random.RandomState(0).rand(128, 50) * 100
    visualize_piano_roll(roll, save_path=str(tmp_path / "roll.png"))
    plot_input_matrix(np.random.rand(8, 8), sources=[0, 1], servers=[2, 3],
                      save_path=str(tmp_path / "mat.png"))
    plot_spectrogram(np.random.rand(128, 216) * 80 - 80,
                     save_path=str(tmp_path / "spec.png"))

    adj, dists, q = mm1(0.7)
    np.random.seed(0)
    sim = Sim(adj, dists, q, seeds=[2], generate_log=True,
              log_path=str(tmp_path) + "/", logging_mode="Music")
    sim.run(number_of_customers=300)
    frames = simulation_log_to_gif(sim.music_lines(), out_path=str(tmp_path / "sim.gif"),
                                   n_frames=10)
    assert frames.shape[0] == 10
    for f in ("roll.png", "mat.png", "spec.png", "sim.gif"):
        assert os.path.exists(tmp_path / f)


def test_display_images_grid(tmp_path):
    from gandes_tpu.eval import display_images

    imgs = np.random.RandomState(1).rand(7, 1, 20, 20)
    grid = display_images(imgs, num_images=25, size=(1, 20, 20),
                          save_path=str(tmp_path / "grid.png"))
    # 7 images, 5 columns -> 2 rows; make_grid layout: 2px padding all
    # around, single-channel expanded to gray RGB like torchvision
    assert grid.shape == (3, 2 + 2 * 22, 2 + 5 * 22)
    np.testing.assert_array_equal(grid[0, 2:22, 2:22], imgs[0, 0])
    np.testing.assert_array_equal(grid[0, 24:44, 2:22], imgs[5, 0])
    assert os.path.exists(tmp_path / "grid.png")


def test_step_timer():
    import time

    from gandes_tpu.core.profiling import StepTimer

    t = StepTimer()
    for _ in range(3):
        with t.phase("a"):
            time.sleep(0.01)
    with t.phase("b"):
        time.sleep(0.001)
    s = t.summary()
    assert s["a"]["count"] == 3 and s["a"]["total_s"] > 0.02
    assert "a" in t.report() and "frac" in t.report()


def test_render_computation_graph(tmp_path):
    """jaxpr DAG rendering (the reference's torchviz make_dot analog,
    network_tests.py:180-188): PNG + pretty-printed jaxpr text."""
    import os

    import jax.numpy as jnp

    from gandes_tpu.eval.visualize import render_computation_graph

    p = render_computation_graph(
        lambda x: jnp.tanh(x @ x.T).sum(axis=1), jnp.zeros((4, 8)),
        save_path=str(tmp_path / "g.png"), title="toy")
    assert os.path.getsize(p) > 5000
    txt = open(p + ".jaxpr.txt").read()
    assert "tanh" in txt and "dot_general" in txt
