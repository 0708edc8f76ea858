"""Closed-form queueing-theory results used to validate the DES.

Mirrors the reference's validation math: the M/M/c/N blocking probability
(`simulation_v3.py:1878-1887`), the M/M/1 and M/D/1 LQ/WQ forms used by
``SimTester.plot_metrics`` (`simulation_v3.py:1514-1518`), and the
geometric P(k in system) overlay (`simulation_v3.py:880-882`).
"""

from __future__ import annotations

import math


def calculate_theoretical_renege_rate(lam: float, mu: float, c: int, N: int) -> float:
    """M/M/c/(N+c) steady-state probability that the system is full.

    Same formula (and the same N := N + c shift) as the reference
    `simulation_v3.py:1878-1887`.
    """
    N = N + c
    rho = lam / (c * mu)
    a = lam / mu
    p_zero = 1 / (
        1
        + sum((a ** n) / math.factorial(n) for n in range(1, c + 1))
        + ((a ** c) / math.factorial(c)) * sum(rho ** (n - c) for n in range(c + 1, N + 1))
    )
    p_n = ((a ** N) * p_zero) / (math.factorial(c) * c ** (N - c))
    return p_n


def mm1_lq(rho: float) -> float:
    """M/M/1 mean queue length (excluding the customer in service)."""
    return rho * rho / (1 - rho)


def mm1_wq(rho: float, mu: float = 1.0) -> float:
    """M/M/1 mean waiting time in queue."""
    return rho / (mu * (1 - rho))


def md1_lq(rho: float) -> float:
    """M/D/1 mean queue length (reference `simulation_v3.py:1514`)."""
    return rho * rho / (2 * (1 - rho))


def md1_wq(rho: float, mu: float = 1.0) -> float:
    """M/D/1 mean waiting time in queue (reference `simulation_v3.py:1515`)."""
    return rho / (2 * mu * (1 - rho))


def mm1_pk(rho: float, k: int) -> float:
    """M/M/1 P(k customers in system) = rho^k (1 - rho)."""
    return (rho ** k) * (1 - rho)
