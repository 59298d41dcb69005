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


class TestWrongWayRisk:
    SPEC = CvaSpec(intensity=0.03, lgd=0.6,
                   option=VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0),
                   n_grid=25)

    def test_b_zero_is_exactly_the_independent_model(self):
        base = engine.price_cva(self.SPEC, 1 << 15, KEY, CFG)
        port = CvaPortfolioSpec.from_single(self.SPEC, wwr_b=0.0)
        res = engine.price_cva_portfolio(port, 1 << 15, KEY, CFG)
        assert float(base.cva) == float(res.cva)

    def test_wrong_way_raises_cva_right_way_lowers(self):
        # Call exposure rises with the spot; a hazard that also rises with
        # the spot (b > 0) must increase the CVA, b < 0 must decrease it.
        # Same key = common random numbers, so tiny MC noise.
        mk = lambda b: engine.price_cva_portfolio(
            CvaPortfolioSpec.from_single(self.SPEC, wwr_b=b),
            1 << 16, KEY, CFG)
        mid, up, down = mk(0.0), mk(1.0), mk(-1.0)
        assert float(up.cva) > float(mid.cva) + 2 * float(mid.std_error)
        assert float(down.cva) < float(mid.cva) - 2 * float(mid.std_error)

    def test_matches_numpy_oracle(self):
        port = CvaPortfolioSpec.from_single(self.SPEC, wwr_b=0.8)
        res = engine.price_cva_portfolio(port, 1 << 16, KEY, CFG)
        ora = reference.price_cva_portfolio(
            0.03, 0.6, 100.0, 0.05, 0.2, 1.0, [100.0], [1.0],
            n_grid=25, n_paths=1 << 16, seed=17, wwr_b=0.8)
        se = np.hypot(float(res.std_error), ora.std_error)
        assert abs(float(res.cva) - ora.price) < 4 * se

    @pytest.mark.slow
    def test_pallas_interpret_twin(self):
        port = CvaPortfolioSpec.from_single(self.SPEC, wwr_b=0.8)
        cfg = engine.EngineConfig(num_blocks=4, rows=8, backend="pallas",
                                  interpret=True)
        res = engine.price_cva_portfolio(port, 1 << 14, KEY, cfg)
        ora = reference.price_cva_portfolio(
            0.03, 0.6, 100.0, 0.05, 0.2, 1.0, [100.0], [1.0],
            n_grid=25, n_paths=1 << 16, seed=17, wwr_b=0.8)
        se = np.hypot(float(res.std_error), ora.std_error)
        assert abs(float(res.cva) - ora.price) < 4 * se

    @pytest.mark.slow
    def test_shard_invariant(self):
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        from mctpu.parallel import path_mesh
        port = CvaPortfolioSpec.from_single(self.SPEC, wwr_b=0.8)
        base = engine.price_cva_portfolio(port, 1 << 15, KEY, CFG)
        cfg8 = engine.EngineConfig(num_blocks=8, rows=8, backend="xla",
                                   mesh=path_mesh(devs[:8]))
        shard = engine.price_cva_portfolio(port, 1 << 15, KEY, cfg8)
        assert float(base.cva) == float(shard.cva)

    def test_traced_wwr_b_rejected(self):
        port = CvaPortfolioSpec.from_single(self.SPEC, wwr_b=0.8)
        with pytest.raises(ValueError, match="concrete"):
            jax.jit(lambda p: engine.price_cva_portfolio(
                p, 1 << 12, KEY, CFG))(port)
