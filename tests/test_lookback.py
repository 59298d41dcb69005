"""Lookback options: GSG continuous bound, oracle cross-checks, identities."""
import jax
import numpy as np
import pytest

from mctpu import engine, math as mcmath, reference
from mctpu.types import LookbackOption

KEY = jax.random.key(313)
CFG = engine.EngineConfig(num_blocks=8, rows=8, backend="xla")
FLT = LookbackOption(s=100.0, r=0.05, v=0.2, t=1.0, n_obs=50)


def test_floating_call_vs_numpy_oracle():
    res = engine.price_lookback(FLT, 1 << 17, KEY, CFG)
    ora = reference.price_lookback(FLT, 1 << 16, seed=9)
    se = np.hypot(float(res.std_error), ora.std_error)
    assert abs(float(res.price) - ora.price) < 4 * se


@pytest.mark.slow
def test_converges_to_gsg_from_below():
    cf = float(mcmath.lookback_floating_call(100.0, 0.05, 0.2, 1.0))
    prices = []
    for n_obs in (12, 50, 250):
        opt = LookbackOption(s=100.0, r=0.05, v=0.2, t=1.0, n_obs=n_obs)
        prices.append(float(engine.price_lookback(opt, 1 << 16, KEY,
                                                  CFG).price))
    assert prices[0] < prices[1] < prices[2] < cf
    # O(1/sqrt(n)) gap: the 250-obs price is much closer than the 12-obs one
    assert cf - prices[2] < (cf - prices[0]) / 3


def test_fixed_strike_dominates_vanilla():
    # max_j S_j >= S_T pathwise, so the fixed lookback call >= European.
    fixed = LookbackOption(s=100.0, r=0.05, v=0.2, t=1.0, k=100.0,
                           n_obs=50, kind="fixed")
    res = engine.price_lookback(fixed, 1 << 16, KEY, CFG)
    bs = float(mcmath.bs_call(100.0, 100.0, 0.05, 0.2, 1.0))
    assert float(res.price) > bs + 3 * float(res.std_error)


def test_fixed_put_vs_oracle():
    fixed = LookbackOption(s=100.0, r=0.05, v=0.2, t=1.0, k=100.0,
                           n_obs=50, kind="fixed", payoff="put")
    res = engine.price_lookback(fixed, 1 << 16, KEY, CFG)
    ora = reference.price_lookback(fixed, 1 << 16, seed=10)
    se = np.hypot(float(res.std_error), ora.std_error)
    assert abs(float(res.price) - ora.price) < 4 * se


def test_floating_put_positive_and_below_call_here():
    put = LookbackOption(s=100.0, r=0.05, v=0.2, t=1.0, payoff="put")
    res = engine.price_lookback(put, 1 << 16, KEY, CFG)
    assert float(res.price) > 0
    ora = reference.price_lookback(put, 1 << 16, seed=11)
    se = np.hypot(float(res.std_error), ora.std_error)
    assert abs(float(res.price) - ora.price) < 4 * se


def test_pallas_interpret_twin():
    icfg = engine.EngineConfig(num_blocks=4, rows=8, backend="pallas",
                               interpret=True)
    res = engine.price_lookback(FLT, 1 << 14, KEY, icfg)
    ora = reference.price_lookback(FLT, 1 << 16, seed=9)
    se = np.hypot(float(res.std_error), ora.std_error)
    assert abs(float(res.price) - ora.price) < 4 * se


def test_shard_invariant():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    from mctpu.parallel import path_mesh
    base = engine.price_lookback(FLT, 1 << 14, KEY, CFG)
    cfg8 = engine.EngineConfig(num_blocks=8, rows=8, backend="xla",
                               mesh=path_mesh(devs[:8]))
    shard = engine.price_lookback(FLT, 1 << 14, KEY, cfg8)
    assert float(base.price) == float(shard.price)


def test_validation():
    with pytest.raises(ValueError, match="kind"):
        LookbackOption(s=100.0, r=0.05, v=0.2, t=1.0,
                       kind="roaming").validate()
    with pytest.raises(ValueError, match="strike"):
        LookbackOption(s=100.0, r=0.05, v=0.2, t=1.0,
                       kind="fixed").validate()
