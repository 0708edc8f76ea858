"""Metric plots for Sim runs (reference `simulation_v3.py:850-1353`).

Same figures as the reference — per-server metric panels with
t-distribution confidence intervals, whole-system panels with
predicted/theoretical overlays, P(k customers) bars, cumulative renege
rates vs the M/M/c/N closed form — with two usability changes: every
function takes ``show``/``save_path`` (headless-friendly; the reference
always calls ``plt.show()``) and none of them crash on single-run
histories.
"""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
from scipy import stats

from gandes_tpu.des.theory import calculate_theoretical_renege_rate


def _finish(fig, show, save_path):
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
    if show:
        plt.show()
    plt.close(fig)


def _series_ci(values, confidence_level, n_seeds):
    try:
        return stats.t.interval(confidence_level, n_seeds - 1, loc=np.mean(values),
                                scale=stats.sem(values))
    except Exception:
        return (np.nan, np.nan)


def _panel(ax, values, label, confidence_level, n_seeds):
    if len(values) == 1:
        ax.plot(list(values) * 2)
    else:
        ax.plot(values)
        lo, hi = _series_ci(values, confidence_level, n_seeds)
        if np.isfinite(lo):
            ax.plot([lo] * len(values), "r--", alpha=0.5,
                    label=f"{confidence_level * 100}% confidence interval")
            ax.plot([hi] * len(values), "r--", alpha=0.5)
    ax.set_xlabel("Simulation run")
    ax.set_ylabel(label)
    ax.set_title(f"{label} with {confidence_level * 100}% confidence interval")


def plot_metrics(sim, server=1, confidence_level=0.95, show=False, save_path=None):
    """Per-server 8-panel figure (reference :935-1114)."""
    if not sim.record_history:
        print("No history recorded")
        return None
    if server not in sim.servers:
        raise ValueError("Server not found")

    fig = plt.figure(figsize=(24, 24))
    fig.suptitle(f"Server {server}")
    panels = [
        ("Average server length", [x.get(server, 0) for x in sim.avg_server_length_history]),
        ("Average queue length", [x.get(server, 0) for x in sim.avg_queue_length_history]),
        ("Average time at server", [x.get(server, 0) for x in sim.avg_time_at_server_history]),
        ("Queue time", [x.get(server, 0) for x in sim.avg_queue_time_history]),
        ("Server utilization", [x.get(server, 0) for x in sim.server_utilizations_history]),
        ("Renege rate", [x.get(server, 0) for x in sim.renege_rate_history]),
        ("Average service time", [x.get(server, 0) for x in sim.total_service_time_history]),
    ]
    for i, (label, values) in enumerate(panels, start=1):
        _panel(fig.add_subplot(4, 2, i), values, label, confidence_level, len(sim.seeds))

    # panel 8: average arrival time over sources routed at this server
    sources = [i for i, d in enumerate(np.diag(sim.adj_matrix)) if d > 0]
    connected = [s for s in sources
                 if server < len(sim.adj_matrix[s]) and sim.adj_matrix[s][server] == 1]
    avg_arrival = [x[src] for x in sim.total_arrival_time_history for src in connected]
    if avg_arrival:
        _panel(fig.add_subplot(4, 2, 8), avg_arrival, "Average arrival time",
               confidence_level, len(sim.seeds))
    _finish(fig, show, save_path)
    return fig


def plot_metrics_all_servers(sim, confidence_level=0.95, predicted=None,
                             theoretical=None, show=False, save_path=None):
    """Whole-system 4-panel figure with overlays (reference :1116-1279)."""
    if not sim.record_history:
        print("No history recorded")
        return None
    predicted = predicted or {}
    theoretical = theoretical or {}
    fig = plt.figure(figsize=(24, 24))
    fig.suptitle("Metrics for all servers")
    series = {
        "LQ": [sum(x.get(s, 0) for s in sim.servers) for x in sim.avg_queue_length_history],
        "L": [sum(x.get(s, 0) for s in sim.servers) for x in sim.avg_server_length_history],
        "WQ": [sum(x.get(s, 0) for s in sim.servers) for x in sim.avg_queue_time_history],
        "W": [sum(x.get(s, 0) for s in sim.servers) for x in sim.avg_time_at_server_history],
    }
    labels = {"LQ": "Average queue length", "L": "Average server length",
              "WQ": "Average queue time", "W": "Average time at server"}
    for i, key in enumerate(["LQ", "L", "WQ", "W"], start=1):
        ax = fig.add_subplot(2, 2, i)
        _panel(ax, series[key], labels[key], confidence_level, len(sim.seeds))
        for src, name in ((predicted, "Predicted"), (theoretical, "Theoretical")):
            if key in src:
                vals = np.atleast_1d(src[key])
                if len(vals) == 1:
                    ax.plot(vals * np.ones(max(2, len(series[key]))), label=name)
                else:
                    ax.plot(vals, label=name)
        ax.legend()
    _finish(fig, show, save_path)
    return fig


def plot_probability_k_customers_in_system(sim, node=1, confidence_level=0.95,
                                           show=False, save_path=None, k_max=10):
    """Simulated vs geometric rho^k (1-rho) bars (reference :850-903)."""
    if node not in sim.servers:
        raise ValueError("Server not found")
    if sim.servers[node].distribution is None:
        children = [c for c in sim.servers[node].destination.children if c in sim.servers]
        rho = sum(sim.server_utilizations_history[-1][c] for c in children) / len(children)
    else:
        vals = [h[node] for h in sim.server_utilizations_history]
        rho = sum(vals) / len(vals)

    theoretical = [rho**i * (1 - rho) for i in range(k_max)]
    probs = np.zeros(k_max)
    hist = sim.probabilities_of_queue_lengths_history
    for i in range(k_max):
        probs[i] = np.mean([h[node].get(i, 0.0) for h in hist]) if hist else 0.0

    ind = np.arange(k_max)
    fig, ax = plt.subplots()
    ax.bar(ind - 0.175, probs, 0.35, label="Simulated")
    ax.bar(ind + 0.175, theoretical, 0.35, label="Theoretical")
    ax.set_ylabel("Probability")
    ax.set_xlabel("Number of customers in system")
    ax.set_title(f"Probability of k customers in system for server {node}")
    ax.set_xticks(ind)
    ax.legend()
    _finish(fig, show, save_path)
    return probs, np.array(theoretical)


def plot_cumulative_renege_rates(sim, queue_length=None, confidence_level=0.95,
                                 observed=None, show=False, save_path=None):
    """Cumulative renege rates + theoretical M/M/c/N overlay (reference
    :1281-1353)."""
    if not sim.record_history:
        print("No history recorded")
        return 0
    renege_rates = [sum(x.get(s, 0) for s in sim.servers) for x in sim.renege_rate_history]

    theo = None
    if queue_length is not None:
        lam_vals, mu_vals = [], []
        is_exponential = True
        for i, server in sim.servers.items():
            if server.distribution is not None and sim.distributions[i][0] != "exponential":
                is_exponential = False
                break
            if server.distribution is not None:
                lam_vals.append(sim.distributions[i][1])
        for i in sim.sources:
            mu_vals.append(sim.distributions[i][1])
        avg_lam = np.mean(lam_vals)
        avg_mu = np.mean(mu_vals)
        theo = calculate_theoretical_renege_rate(avg_lam, avg_mu, len(lam_vals), queue_length)
        if not is_exponential:
            theo = theo * (1 - (avg_lam / avg_mu) ** len(lam_vals))

    fig, ax = plt.subplots(figsize=(12, 8))
    _panel(ax, renege_rates, "Cumulative renege rate", confidence_level, len(sim.seeds))
    if observed is not None:
        ax.plot(observed * np.ones(max(2, len(renege_rates))), label="Observed")
    if theo is not None:
        ax.plot(theo * np.ones(max(2, len(renege_rates))), label="Theoretical")
    ax.legend()
    _finish(fig, show, save_path)
    return theo
