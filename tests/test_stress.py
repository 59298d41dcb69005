"""Edge-case robustness: extreme parameters must give finite, sane prices.

The production-deployment concern SURVEY's fail-fast philosophy implies:
no NaN/inf escapes, degenerate limits hit their exact values, and the
validators catch malformed inputs before kernels do.
"""
import jax
import numpy as np
import pytest

from mctpu import engine, math as mcmath
from mctpu.types import (AsianOption, BarrierOption, BasketOption, CvaSpec,
                         HestonOption, VanillaOption)

KEY = jax.random.key(717)
CFG = engine.EngineConfig(num_blocks=8, rows=8, backend="xla")


class TestExtremeParameters:
    def test_zero_vol_vanilla_is_forward_intrinsic(self):
        opt = VanillaOption(100.0, 90.0, 0.05, 0.0, 1.0)
        res = engine.price_vanilla(opt, 1 << 12, KEY, CFG)
        want = float(np.exp(-0.05) * (100.0 * np.exp(0.05) - 90.0))
        # f32 kernel arithmetic: a few ulps of exp/mul rounding.  The
        # residual std_error comes from raw-moment cancellation of the f32
        # block sums (n*sum2 - sum^2 of nearly-equal squares); the f64
        # combine keeps it ~1e-5 relative, not exactly zero.
        assert float(res.price) == pytest.approx(want, rel=1e-5)
        assert float(res.std_error) <= 1e-4 * want

    def test_tiny_maturity(self):
        opt = VanillaOption(100.0, 90.0, 0.05, 0.2, 1e-6)
        res = engine.price_vanilla(opt, 1 << 14, KEY, CFG)
        assert float(res.price) == pytest.approx(10.0, abs=0.01)

    def test_huge_vol(self):
        opt = VanillaOption(100.0, 100.0, 0.05, 3.0, 1.0)
        res = engine.price_vanilla(opt, 1 << 18, KEY, CFG)
        bs = float(mcmath.bs_call(100.0, 100.0, 0.05, 3.0, 1.0))
        assert np.isfinite(float(res.price))
        # heavy-tailed payoffs: generous gate, but must be in the ballpark
        assert abs(float(res.price) - bs) < 6 * float(res.std_error)

    def test_deep_otm_is_near_zero_not_nan(self):
        opt = VanillaOption(100.0, 1000.0, 0.05, 0.2, 1.0)
        res = engine.price_vanilla(opt, 1 << 16, KEY, CFG)
        assert np.isfinite(float(res.price))
        assert 0.0 <= float(res.price) < 1e-4

    def test_long_maturity(self):
        opt = VanillaOption(100.0, 100.0, 0.05, 0.2, 30.0)
        res = engine.price_vanilla(opt, 1 << 18, KEY, CFG)
        bs = float(mcmath.bs_call(100.0, 100.0, 0.05, 0.2, 30.0))
        assert abs(float(res.price) - bs) < 4 * float(res.std_error)

    def test_single_path_block_geometry(self):
        # Smallest possible request: geometry auto-shrinks, result is sane.
        opt = VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0)
        res = engine.price_vanilla(opt, 1, KEY, CFG)
        assert np.isfinite(float(res.price))
        assert res.n_paths >= 1

    @pytest.mark.slow
    def test_heston_feller_violation_stays_finite(self):
        # 2 kappa theta < xi^2: variance hits zero often; full truncation
        # and QE must both stay finite and agree with the CF price.
        from mctpu.models import heston as mheston
        opt = HestonOption(s=100.0, k=100.0, r=0.03, t=1.0, v0=0.01,
                           kappa=0.5, theta=0.01, xi=1.0, rho=-0.9)
        cf = float(mheston.cf_call_price(opt))
        for scheme, slop in (("euler", 0.35), ("qe", 0.1)):
            res = engine.price_heston(opt, 1 << 17, KEY, CFG, n_steps=64,
                                      scheme=scheme)
            assert np.isfinite(float(res.price))
            assert abs(float(res.price) - cf) < 4 * float(res.std_error) + slop

    def test_cva_zero_intensity_is_zero(self):
        spec = CvaSpec(intensity=0.0, lgd=0.6,
                       option=VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0),
                       n_grid=10)
        res = engine.price_cva(spec, 1 << 12, KEY, CFG)
        assert float(res.cva) == 0.0

    def test_barrier_at_strike_boundary(self):
        # barrier just above strike: tiny corridor, price ~ 0 but finite
        opt = BarrierOption(100.0, 100.0, 0.05, 0.2, 1.0, barrier=101.0,
                            n_obs=50, kind="up-and-out")
        res = engine.price_barrier(opt, 1 << 16, KEY, CFG)
        assert 0.0 <= float(res.price) < 0.2

    def test_asian_one_observation_is_vanilla(self):
        a = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=1)
        res = engine.price_asian(a, 1 << 18, KEY, CFG)
        bs = float(mcmath.bs_call(100.0, 100.0, 0.05, 0.2, 1.0))
        assert abs(float(res.price) - bs) < 4 * float(res.std_error)

    @pytest.mark.slow
    def test_basket_256_assets(self):
        # Beyond the lane width: wide-basket fallback pads to 2 lanes rows.
        opt = BasketOption.equicorrelated(256, rho=0.1)
        res = engine.price_basket(opt, 1 << 13, KEY,
                                  engine.EngineConfig(num_blocks=8, rows=8,
                                                      backend="xla"))
        assert np.isfinite(float(res.price))
        assert float(res.price) > 0


class TestValidatorsCatchBadInput:
    def test_negative_spot(self):
        with pytest.raises(ValueError, match="positive"):
            VanillaOption(-1.0, 100.0, 0.05, 0.2, 1.0).validate()

    def test_negative_maturity(self):
        with pytest.raises(ValueError, match="maturity"):
            VanillaOption(100.0, 100.0, 0.05, 0.2, -1.0).validate()

    def test_asymmetric_corr(self):
        c = np.eye(3)
        c[0, 1] = 0.5
        with pytest.raises(ValueError, match="symmetric"):
            BasketOption(s=np.full(3, 100.0), v=np.full(3, 0.2),
                         w=np.full(3, 1 / 3), corr=c, d=np.zeros(3),
                         k=100.0, r=0.05, t=1.0).validate()

    def test_bad_lgd(self):
        with pytest.raises(ValueError, match="lgd"):
            CvaSpec(intensity=0.03, lgd=1.5,
                    option=VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0),
                    n_grid=10).validate()
