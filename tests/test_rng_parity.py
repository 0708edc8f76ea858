"""Bit-parity of core.rng.Sampler with scipy frozen-distribution rvs.

The DES must reproduce the reference's draw sequences exactly
(simulation_v3.py:181-199 uses scipy frozen rvs on per-node RandomStates);
these tests pin that equivalence.
"""

import numpy as np
import pytest
from scipy import stats

from gandes_tpu.core.rng import Sampler, spawn_node_seeds

SPECS = [
    (["exponential", 2.5], lambda: stats.expon(scale=2.5)),
    (["uniform", 1.0, 3.0], lambda: stats.uniform(loc=1.0, scale=3.0)),
    (["normal", 5.0, 3.0], lambda: stats.norm(loc=5.0, scale=3.0)),
    (["beta", 2.0, 3.0, 0.5, 2.0], lambda: stats.beta(a=2.0, b=3.0, loc=0.5, scale=2.0)),
    (["gamma", 2.0, 0.25, 1.5], lambda: stats.gamma(a=2.0, loc=0.25, scale=1.5)),
]


@pytest.mark.parametrize("spec,frozen", SPECS, ids=[s[0][0] for s in SPECS])
def test_continuous_bit_parity(spec, frozen):
    sampler = Sampler(spec)
    dist = frozen()
    rng_a = np.random.RandomState(1234)
    rng_b = np.random.RandomState(1234)
    ours = [sampler.draw(rng_a) for _ in range(200)]
    theirs = [float(dist.rvs(random_state=rng_b)) for _ in range(200)]
    assert ours == theirs


def test_discrete_bit_parity():
    xk = [1.0, 3.0, 7.0]
    pk = [0.2, 0.5, 0.3]
    sampler = Sampler(["discrete", xk, pk])
    dist = stats.rv_discrete(values=(xk, pk))
    rng_a = np.random.RandomState(99)
    rng_b = np.random.RandomState(99)
    ours = [sampler.draw(rng_a) for _ in range(500)]
    theirs = [float(dist.rvs(random_state=rng_b)) for _ in range(500)]
    assert ours == theirs


def test_means_match_scipy():
    for spec, frozen in SPECS:
        assert Sampler(spec).mean == pytest.approx(float(frozen().mean()), rel=1e-12)
    assert Sampler(["discrete", [1.0, 3.0], [0.25, 0.75]]).mean == pytest.approx(2.5)


def test_spawn_node_seeds_matches_reference_order():
    # reference simulation_v3.py:446-456: master RandomState deals
    # randint(3, 9999999) to servers first (in id order), then sources.
    master = np.random.RandomState(42)
    expect_servers = [int(master.randint(3, 9999999)) for _ in range(3)]
    expect_sources = [int(master.randint(3, 9999999)) for _ in range(2)]
    got_servers, got_sources = spawn_node_seeds(42, 3, 2)
    assert got_servers == expect_servers
    assert got_sources == expect_sources
