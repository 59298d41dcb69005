"""Variance swaps: exact GBM discrete oracle + Heston fair strike."""
import jax
import numpy as np
import pytest

from mctpu import engine
from mctpu.types import HestonOption, VanillaOption

KEY = jax.random.key(818)
CFG = engine.EngineConfig(num_blocks=8, rows=8, backend="xla")
GBM = VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0)


def _gbm_exact(v, r, t, n):
    return v * v + (r - 0.5 * v * v) ** 2 * t / n


@pytest.mark.slow
def test_gbm_matches_exact_discrete_expectation():
    for n_obs in (12, 52, 252):
        res = engine.fair_variance_strike(GBM, 1 << 16, KEY, CFG,
                                          n_obs=n_obs)
        want = _gbm_exact(0.2, 0.05, 1.0, n_obs)
        assert abs(float(res.price) - want) < 4 * float(res.std_error)


@pytest.mark.slow
def test_heston_converges_to_continuous_fair_strike():
    h = HestonOption(s=100.0, k=100.0, r=0.03, t=1.0, v0=0.09, kappa=2.0,
                     theta=0.04, xi=0.4, rho=-0.6)
    kt = 2.0
    want = 0.04 + (0.09 - 0.04) * (1 - np.exp(-kt)) / kt
    res = engine.fair_variance_strike(h, 1 << 16, KEY, CFG, n_obs=252)
    # O(dt) Euler/discretization bias allowance at 252 steps
    assert abs(float(res.price) - want) < 4 * float(res.std_error) + 5e-4


def test_heston_term_structure_monotone():
    # v0 > theta: the fair strike decays toward theta as T grows.
    def strike(t):
        h = HestonOption(s=100.0, k=100.0, r=0.03, t=t, v0=0.09,
                         kappa=2.0, theta=0.04, xi=0.4, rho=-0.6)
        return float(engine.fair_variance_strike(h, 1 << 15, KEY, CFG,
                                                 n_obs=64).price)

    s1, s3 = strike(1.0), strike(3.0)
    assert 0.04 < s3 < s1 < 0.09


def test_pallas_interpret_twin():
    icfg = engine.EngineConfig(num_blocks=4, rows=8, backend="pallas",
                               interpret=True)
    res = engine.fair_variance_strike(GBM, 1 << 14, KEY, icfg, n_obs=52)
    want = _gbm_exact(0.2, 0.05, 1.0, 52)
    assert abs(float(res.price) - want) < 4 * float(res.std_error)
    h = HestonOption(s=100.0, k=100.0, r=0.03, t=1.0, v0=0.04, kappa=1.5,
                     theta=0.04, xi=0.5, rho=-0.7)
    res2 = engine.fair_variance_strike(h, 1 << 14, KEY, icfg, n_obs=32)
    assert abs(float(res2.price) - 0.04) < 4 * float(res2.std_error) + 1e-3


@pytest.mark.slow
def test_shard_invariant():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    from mctpu.parallel import path_mesh
    base = engine.fair_variance_strike(GBM, 1 << 14, KEY, CFG, n_obs=12)
    cfg8 = engine.EngineConfig(num_blocks=8, rows=8, backend="xla",
                               mesh=path_mesh(devs[:8]))
    shard = engine.fair_variance_strike(GBM, 1 << 14, KEY, cfg8, n_obs=12)
    assert float(base.price) == float(shard.price)
