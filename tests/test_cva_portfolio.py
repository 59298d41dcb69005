"""Netted-portfolio CVA tests (the thesis scope beyond the single call)."""
import jax
import numpy as np
import pytest

from mctpu import engine, math as mcmath, reference
from mctpu.types import CvaPortfolioSpec, CvaSpec, VanillaOption

KEY = jax.random.key(2025)
CFG = engine.EngineConfig(num_blocks=8, rows=8, backend="xla")
BASE = dict(intensity=0.03, lgd=0.6, s=100.0, r=0.05, v=0.2, t=1.0)


def _port(strikes, weights, n_grid=25):
    return CvaPortfolioSpec(strikes=np.asarray(strikes, np.float64),
                            weights=np.asarray(weights, np.float64),
                            n_grid=n_grid, **BASE)


def test_single_option_portfolio_equals_price_cva():
    spec = CvaSpec(intensity=0.03, lgd=0.6,
                   option=VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0),
                   n_grid=25)
    a = engine.price_cva(spec, 1 << 15, KEY, CFG)
    b = engine.price_cva_portfolio(_port([100.0], [1.0]), 1 << 15, KEY, CFG)
    assert float(a.cva) == float(b.cva)
    np.testing.assert_array_equal(np.asarray(a.expected_exposure),
                                  np.asarray(b.expected_exposure))


def test_long_portfolio_matches_closed_form():
    strikes, weights = [90.0, 100.0, 110.0], [0.5, 0.3, 0.2]
    port = _port(strikes, weights)
    res = engine.price_cva_portfolio(port, 1 << 16, KEY, CFG)
    want = float(mcmath.cva_portfolio_closed_form(
        n_grid=port.n_grid, strikes=strikes, weights=weights, **BASE))
    assert abs(float(res.cva) - want) < 3 * float(res.std_error)


def test_long_portfolio_is_weighted_sum_of_singles():
    # Netting never binds for long-only calls: closed form is linear.
    strikes, weights = [80.0, 120.0], [1.0, 2.0]
    want = sum(
        w * float(mcmath.cva_closed_form(k=k, n_grid=25, **BASE))
        for k, w in zip(strikes, weights))
    got = float(mcmath.cva_portfolio_closed_form(
        strikes=strikes, weights=weights, n_grid=25, **BASE))
    assert got == pytest.approx(want, rel=1e-10)


def test_netted_portfolio_vs_oracle():
    # Long 1x K=90 call, short 1x K=110 call: netting binds on high paths.
    strikes, weights = [90.0, 110.0], [1.0, -1.0]
    port = _port(strikes, weights)
    res = engine.price_cva_portfolio(port, 1 << 16, KEY, CFG)
    ora = reference.price_cva_portfolio(
        strikes=strikes, weights=weights, n_grid=25,
        n_paths=1 << 15, seed=9, s0=BASE["s"],
        **{k: v for k, v in BASE.items() if k != "s"})
    se = np.hypot(float(res.std_error), ora.std_error)
    assert abs(float(res.cva) - ora.price) < 3 * se


def test_netting_reduces_exposure():
    long_only = engine.price_cva_portfolio(_port([90.0], [1.0]),
                                           1 << 15, KEY, CFG)
    hedged = engine.price_cva_portfolio(_port([90.0, 110.0], [1.0, -1.0]),
                                        1 << 15, KEY, CFG)
    assert float(hedged.cva) < float(long_only.cva)


def test_closed_form_rejects_short_positions():
    with pytest.raises(ValueError, match="non-negative"):
        mcmath.cva_portfolio_closed_form(
            strikes=[90.0, 110.0], weights=[1.0, -1.0], n_grid=25, **BASE)


def test_validation():
    with pytest.raises(ValueError, match="strikes"):
        _port([-5.0], [1.0]).validate()
    with pytest.raises(ValueError, match="weights"):
        CvaPortfolioSpec(strikes=np.ones(2), weights=np.ones(3),
                         n_grid=10, **BASE).validate()
