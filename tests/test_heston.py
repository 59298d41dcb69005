"""Heston stochastic-volatility tests: CF pricer limits + MC-vs-CF."""
import jax
import numpy as np
import pytest

from mctpu import engine, math as mcmath
from mctpu.models import heston as mheston
from mctpu.types import HestonOption

KEY = jax.random.key(1234)
CFG = engine.EngineConfig(num_blocks=8, rows=8, backend="xla")
OPT = HestonOption(s=100.0, k=100.0, r=0.05, t=1.0, v0=0.04, kappa=2.0,
                   theta=0.04, xi=0.3, rho=-0.7)


class TestCharacteristicFunction:
    def test_bs_limit(self):
        # xi -> 0 and v0 = theta: variance is deterministic -> Black-Scholes.
        o = HestonOption(s=100.0, k=100.0, r=0.05, t=1.0, v0=0.04,
                         kappa=2.0, theta=0.04, xi=1e-6, rho=0.0)
        cf = float(mheston.cf_call_price(o))
        bs = float(mcmath.bs_call(100.0, 100.0, 0.05, 0.2, 1.0))
        assert cf == pytest.approx(bs, abs=1e-4)

    def test_monotone_in_strike_and_bounds(self):
        prices = []
        for k in (60.0, 80.0, 100.0, 120.0, 150.0):
            o = HestonOption(s=100.0, k=k, r=0.05, t=1.0, v0=0.04,
                             kappa=2.0, theta=0.04, xi=0.3, rho=-0.7)
            c = float(mheston.cf_call_price(o))
            assert max(100.0 - k * np.exp(-0.05), 0.0) - 1e-6 < c < 100.0
            prices.append(c)
        assert all(a > b for a, b in zip(prices, prices[1:]))

    def test_put_call_parity_via_cf(self):
        # P = C - S + K e^{-rT} must be positive and below K e^{-rT}.
        c = float(mheston.cf_call_price(OPT))
        p = c - 100.0 + 100.0 * np.exp(-0.05)
        assert 0.0 < p < 100.0 * np.exp(-0.05)


class TestEngine:
    def test_mc_within_tolerance_of_cf(self):
        res = engine.price_heston(OPT, 1 << 17, KEY, CFG, n_steps=200)
        want = float(mheston.cf_call_price(OPT))
        se = float(res.std_error)
        # 3 sigma MC + 0.5% Euler discretization allowance at 200 steps.
        assert abs(float(res.price) - want) < 3 * se + 0.005 * want

    @pytest.mark.slow
    def test_antithetic(self):
        cfg_a = engine.EngineConfig(num_blocks=8, rows=8, backend="xla",
                                    antithetic=True)
        anti = engine.price_heston(OPT, 1 << 16, KEY, cfg_a, n_steps=100)
        plain = engine.price_heston(OPT, 1 << 16, KEY, CFG, n_steps=100)
        assert float(anti.std_error) < float(plain.std_error)

    @pytest.mark.slow
    def test_zero_vol_of_vol_matches_bs_mc(self):
        o = HestonOption(s=100.0, k=100.0, r=0.05, t=1.0, v0=0.04,
                         kappa=2.0, theta=0.04, xi=0.0, rho=0.0)
        res = engine.price_heston(o, 1 << 17, KEY, CFG, n_steps=100)
        bs = float(mcmath.bs_call(100.0, 100.0, 0.05, 0.2, 1.0))
        se = float(res.std_error)
        assert abs(float(res.price) - bs) < 4 * se

    def test_negative_rho_fattens_left_tail(self):
        # rho < 0 produces skew: OTM puts richer; the ATM call price drops
        # slightly vs rho=0 at equal total variance.
        neg = engine.price_heston(OPT, 1 << 17, KEY, CFG, n_steps=100)
        o0 = HestonOption(s=100.0, k=100.0, r=0.05, t=1.0, v0=0.04,
                          kappa=2.0, theta=0.04, xi=0.3, rho=0.0)
        zero = engine.price_heston(o0, 1 << 17, KEY, CFG, n_steps=100)
        # Both must straddle their own CF values; this is a smoke ordering.
        cf_neg = float(mheston.cf_call_price(OPT))
        cf_zero = float(mheston.cf_call_price(o0))
        assert abs(float(neg.price) - cf_neg) < 0.05
        assert abs(float(zero.price) - cf_zero) < 0.05

    def test_validation(self):
        with pytest.raises(ValueError, match="rho"):
            HestonOption(100.0, 100.0, 0.05, 1.0, 0.04, 2.0, 0.04, 0.3,
                         -1.5).validate()
        with pytest.raises(ValueError, match="variance"):
            HestonOption(100.0, 100.0, 0.05, 1.0, -0.1, 2.0, 0.04, 0.3,
                         0.0).validate()


class TestQeScheme:
    STEEP = HestonOption(s=100.0, k=100.0, r=0.03, t=1.0, v0=0.04,
                         kappa=1.5, theta=0.04, xi=0.5, rho=-0.7)

    def test_qe_unbiased_at_coarse_grid(self):
        # 16 steps: Euler carries ~0.075 absolute bias on this config; QE
        # must land within plain MC error of the CF price.
        res = engine.price_heston(self.STEEP, 1 << 18, KEY, CFG, n_steps=16,
                                  scheme="qe")
        cf = float(mheston.cf_call_price(self.STEEP))
        assert abs(float(res.price) - cf) < 4 * float(res.std_error)

    def test_qe_beats_euler_bias(self):
        cf = float(mheston.cf_call_price(self.STEEP))
        qe = engine.price_heston(self.STEEP, 1 << 18, KEY, CFG, n_steps=16,
                                 scheme="qe")
        eu = engine.price_heston(self.STEEP, 1 << 18, KEY, CFG, n_steps=16,
                                 scheme="euler")
        assert abs(float(qe.price) - cf) < abs(float(eu.price) - cf)
        # and the Euler bias is actually visible at this MC error
        assert abs(float(eu.price) - cf) > 2 * float(eu.std_error)

    def test_qe_pallas_interpret_twin(self):
        icfg = engine.EngineConfig(num_blocks=4, rows=8, backend="pallas",
                                   interpret=True)
        res = engine.price_heston(self.STEEP, 1 << 15, KEY, icfg, n_steps=16,
                                  scheme="qe")
        cf = float(mheston.cf_call_price(self.STEEP))
        assert abs(float(res.price) - cf) < 4 * float(res.std_error)

    @pytest.mark.slow
    def test_qe_shard_invariant(self):
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        from mctpu.parallel import path_mesh
        base = engine.price_heston(self.STEEP, 1 << 15, KEY, CFG, n_steps=8,
                                   scheme="qe")
        cfg8 = engine.EngineConfig(num_blocks=8, rows=8, backend="xla",
                                   mesh=path_mesh(devs[:8]))
        shard = engine.price_heston(self.STEEP, 1 << 15, KEY, cfg8,
                                    n_steps=8, scheme="qe")
        assert float(base.price) == float(shard.price)

    def test_bad_scheme_rejected(self):
        with pytest.raises(ValueError, match="scheme"):
            engine.price_heston(self.STEEP, 1 << 12, KEY, CFG,
                                scheme="milstein")
