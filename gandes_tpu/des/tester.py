"""SimTester — parameter sweeps and statistical audits of the DES.

Re-implements the reference harness (`simulation_v3.py:1359-1875`):

* ``test_server_utilization`` — sweep one server's utilization, collecting
  (mean, sem) of queue length / queue time / renege rate / utilization per
  setting (reference :1419-1473);
* ``plot_metrics`` — sweep plots with t-CIs and the closed-form M/M/1 /
  M/D/1 overlays (reference :1476-1571, theory :1514-1518);
* ``test_all_servers`` + ``plot_metrics_all_servers`` — whole-system
  sweeps (reference :1723-1875; the reference's version is marked
  "INCOMPLETE AND NOT WORKING" — this one works);
* ``find_principle_servers`` / ``display_principle_servers`` — ranking
  (reference :1575-1639);
* ``randomness_check`` — chi-square audit of every per-node seed stream +
  uniqueness/bounds warnings (reference :1643-1720), returning the
  statistics so it doubles as an automated test.
"""

from __future__ import annotations

import math

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
from scipy import stats

from gandes_tpu.des.engine import Sim
from gandes_tpu.des.theory import md1_lq, md1_wq, mm1_lq


class SimTester:
    def __init__(self, adj_matrix, distributions, queue_list, seeds=None,
                 num_runs=None, generate_log=False, record_history=True):
        self.adj_matrix = adj_matrix
        self.distributions = distributions
        self.queue_list = queue_list
        self.seeds = seeds
        self.num_runs = num_runs
        self.generate_log = generate_log
        self.record_history = record_history

        self.sources = None
        self.servers = None
        self.queue_times = {}
        self.renege_rates = {}
        self.observed_utilizations = {}
        self.avg_queue_length_history = {}
        self.test_server_utilizations = None
        self.test_distribution_settings = None

    # ------------------------------------------------------------- sweeps

    def _collect(self, store, key, values):
        mean, sem = np.mean(values), stats.sem(values)
        store.setdefault(key, []).append((mean, sem))

    def test_server_utilization(self, server_utilizations, number_of_customers=50):
        """``server_utilizations[i]`` is a list of utilizations to sweep for
        server i (mu=1 convention, reference :1363)."""
        self.test_server_utilizations = server_utilizations
        count = 0
        for i, utils in enumerate(server_utilizations):
            if not utils:
                continue
            for utilization in utils:
                if self.generate_log:
                    print(f"Testing server utilization {utils}")
                distributions = [list(d) for d in self.distributions]
                distributions[i][1] = utilization
                sim = Sim(self.adj_matrix, distributions, self.queue_list,
                          seeds=self.seeds, num_runs=self.num_runs,
                          generate_log=self.generate_log,
                          record_history=self.record_history)
                sim.run(number_of_customers=number_of_customers)
                if count == 0:
                    self.server_seeds = sim.server_seeds
                    self.source_seeds = sim.source_seeds
                    self.sources = sim.sources
                    self.servers = sim.servers
                count += 1

                self._collect(self.avg_queue_length_history, i,
                              [x.get(i, 0) for x in sim.avg_queue_length_history])
                self._collect(self.queue_times, i,
                              [x.get(i, 0) for x in sim.avg_queue_time_history])
                self._collect(self.renege_rates, i,
                              [x.get(i, 0) for x in sim.renege_rate_history])
                self._collect(self.observed_utilizations, i,
                              [x.get(i, 0) for x in sim.server_utilizations_history])
        return self.queue_times, self.renege_rates

    def test_all_servers(self, distribution_settings, number_of_customers=1000):
        """Sweep every server's distribution at once; collects whole-system
        sums (working version of reference :1723-1781)."""
        self.test_distribution_settings = distribution_settings
        diag = np.diag(self.adj_matrix)
        key = 0
        count = 0
        for setting in distribution_settings:
            distributions = [list(setting) if diag[i] <= 0 else list(d)
                             for i, d in enumerate(self.distributions)]
            sim = Sim(self.adj_matrix, distributions, self.queue_list,
                      seeds=self.seeds, num_runs=self.num_runs,
                      generate_log=self.generate_log,
                      record_history=self.record_history)
            sim.run(number_of_customers=number_of_customers)
            if count == 0:
                self.server_seeds = sim.server_seeds
                self.source_seeds = sim.source_seeds
                self.sources = sim.sources
                self.servers = sim.servers
            count += 1
            sums = lambda hist: [sum(x.get(s, 0) for s in self.servers) for x in hist]
            self._collect(self.avg_queue_length_history, key, sums(sim.avg_queue_length_history))
            self._collect(self.queue_times, key, sums(sim.avg_queue_time_history))
            self._collect(self.renege_rates, key, sums(sim.renege_rate_history))
            self._collect(self.observed_utilizations, key, sums(sim.server_utilizations_history))
        return self.queue_times, self.renege_rates

    # -------------------------------------------------------------- plots

    def _n_seeds(self):
        return len(self.seeds) if self.seeds is not None else self.num_runs

    def plot_metrics(self, server=1, confidence_level=0.95, show=False, save_path=None):
        utils = self.test_server_utilizations[server]
        panels = [
            ("Average queue length", self.avg_queue_length_history[server]),
            ("Average queue time", self.queue_times[server]),
            ("Renege rate", self.renege_rates[server]),
            ("Server utilization", self.observed_utilizations[server]),
        ]
        all_exp = all(d[0] == "exponential" for d in self.distributions)
        theory = {}
        if all_exp:
            kind = self.distributions[server][0]
            if kind == "exponential":
                theory = {"Average queue length": [mm1_lq(u) for u in utils],
                          "Average queue time": [u / ((1 / u) * (1 - u)) for u in utils]}
            elif kind == "deterministic":
                theory = {"Average queue length": [md1_lq(u) for u in utils],
                          "Average queue time": [md1_wq(u) for u in utils]}

        fig = plt.figure(figsize=(20, 20))
        fig.suptitle(f"Server {server}")
        for pi, (label, series) in enumerate(panels, start=1):
            ax = fig.add_subplot(2, 2, pi)
            means = [m for m, _ in series]
            cis = [stats.t.interval(confidence_level, self._n_seeds() - 1, loc=m, scale=s)
                   for m, s in series]
            ax.plot(means, label=label, color="b", linestyle="--", linewidth=6)
            ax.plot([c[0] for c in cis], alpha=0.5, color="lightsteelblue",
                    linestyle="--", linewidth=6,
                    label=f"{confidence_level * 100}% confidence interval")
            ax.plot([c[1] for c in cis], alpha=0.5, color="mediumpurple",
                    linestyle="--", linewidth=6)
            if label in theory:
                ax.plot(theory[label], label=f"Theoretical {label.lower()}",
                        color="r", linewidth=9, linestyle=(0, (1, 10)))
            ax.set_xticks(range(len(series)))
            ax.set_xticklabels([f"{u:.2f}" for u in utils])
            ax.set_xlabel("Server utilization")
            ax.set_ylabel(label)
            ax.legend(prop={"size": 12})
        if save_path:
            fig.savefig(save_path, bbox_inches="tight")
        if show:
            plt.show()
        plt.close(fig)
        return theory

    def plot_metrics_all_servers(self, confidence_level=0.95, predictions=None,
                                 theoretical_values=None, show=False, save_path=None):
        theoretical_values = theoretical_values or {}
        panels = [
            ("Average queue length", self.avg_queue_length_history[0], "LQ"),
            ("Average queue time", self.queue_times[0], "WQ"),
            ("Renege rate", self.renege_rates[0], "RR"),
            ("Server utilization", self.observed_utilizations[0], "utilization"),
        ]
        fig = plt.figure(figsize=(20, 20))
        fig.suptitle("Metrics for all servers")
        for pi, (label, series, tkey) in enumerate(panels, start=1):
            ax = fig.add_subplot(2, 2, pi)
            means = [m for m, _ in series]
            cis = [stats.t.interval(confidence_level, self._n_seeds() - 1, loc=m, scale=s)
                   for m, s in series]
            ax.plot(means, label=label, color="b", linestyle="--")
            ax.plot([c[0] for c in cis], alpha=0.5, linestyle="--",
                    label=f"{confidence_level * 100}% confidence interval")
            ax.plot([c[1] for c in cis], alpha=0.5, linestyle="--")
            if tkey in theoretical_values:
                ax.plot(theoretical_values[tkey], label=f"Theoretical {label.lower()}",
                        color="r", linewidth=1.5, linestyle=(0, (1, 10)))
            ax.set_xticks(range(len(self.test_distribution_settings)))
            ax.set_xticklabels([str(s) for s in self.test_distribution_settings])
            ax.legend()
        if save_path:
            fig.savefig(save_path, bbox_inches="tight")
        if show:
            plt.show()
        plt.close(fig)

    # ------------------------------------------------------------ analysis

    def find_principle_servers(self, confidence_level=0.95):
        def rank(store):
            means = {s: np.mean([m for m, _ in vals]) for s, vals in store.items()}
            cis = {
                s: stats.t.interval(confidence_level, self._n_seeds() - 1,
                                    loc=np.mean([m for m, _ in vals]),
                                    scale=max(np.mean([e for _, e in vals]), 1e-12))
                for s, vals in store.items()
            }
            s_means = sorted(means.items(), key=lambda x: x[1], reverse=True)
            s_cis = sorted(cis.items(), key=lambda x: x[1][0], reverse=True)
            return s_means, s_cis

        aql, aql_ci = rank(self.avg_queue_length_history)
        qt, qt_ci = rank(self.queue_times)
        rr, rr_ci = rank(self.renege_rates)
        su, su_ci = rank(self.observed_utilizations)
        return aql, aql_ci, qt, qt_ci, rr, rr_ci, su, su_ci

    def display_principle_servers(self, confidence_level=0.95):
        aql, aql_ci, qt, qt_ci, rr, rr_ci, su, su_ci = self.find_principle_servers(confidence_level)
        print(f"Average queue lengths: {aql}")
        print(f"Average queue lengths confidence intervals: {aql_ci}")
        print(f"Average queue times: {qt}")
        print(f"Average queue times confidence intervals: {qt_ci}")
        print(f"Renege rates: {rr}")
        print(f"Renege rates confidence intervals: {rr_ci}")
        print(f"Server utilizations: {su}")
        print(f"Server utilizations confidence intervals: {su_ci}")

    def randomness_check(self, confidence_level=0.95, sample_size=10000,
                         show=False, save_path=None):
        """Chi-square audit of every dealt node seed; returns
        (chi_square_servers, chi_square_sources, reject_limit, warnings)."""
        bins = int(math.ceil(math.sqrt(sample_size)))
        warnings = []

        def audit(seed_lists, kind):
            out = []
            for j, seed_list in enumerate(seed_lists):
                if len(set(seed_list)) != len(seed_list):
                    warnings.append(f"{kind} {j}: seeds are not unique")
                if not seed_list:
                    continue
                row = [j]
                for seed in seed_list:
                    if seed < 0 or seed > 9999999:
                        warnings.append(f"{kind} {j}: seed {seed} out of range")
                        continue
                    rng = np.random.RandomState(seed)
                    sample = np.histogram(rng.uniform(size=sample_size), bins=bins)[0]
                    chi, _ = stats.chisquare(sample)
                    row.append(chi)
                out.append(row)
            return out

        chi_servers = audit(self.server_seeds, "server")
        chi_sources = audit(self.source_seeds, "source")
        reject_limit = stats.chi2.ppf(confidence_level, bins - 1)

        if show or save_path:
            fig = plt.figure(figsize=(20, 20))
            for sub, data, title in ((1, chi_servers, "servers"), (2, chi_sources, "sources")):
                ax = fig.add_subplot(2, 1, sub)
                for row in data:
                    ax.plot(row[1:], label=f"{title[:-1]} {row[0]}")
                ax.axhline(reject_limit, color="r", linestyle="--",
                           label=f"{confidence_level * 100}% confidence interval")
                ax.set_xlabel("Seed")
                ax.set_ylabel("Chi-square statistic")
                ax.set_title(f"Chi-square statistic for seeds used in {title}")
                ax.legend()
            if save_path:
                fig.savefig(save_path, bbox_inches="tight")
            if show:
                plt.show()
            plt.close(fig)

        return chi_servers, chi_sources, reject_limit, warnings
