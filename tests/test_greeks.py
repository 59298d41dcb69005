"""MC Greeks vs closed-form Black-Scholes Greeks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mctpu import greeks, math as mcmath
from mctpu.types import BasketOption, VanillaOption

OPT = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0)
KEY = jax.random.key(31)
CF = {k: float(v) for k, v in
      mcmath.bs_greeks(100.0, 100.0, 0.048790, 0.2, 1.0).items()}


class TestVanillaGreeks:
    @pytest.fixture(scope="class")
    def mc(self):
        return {k: float(v) for k, v in
                greeks.vanilla_greeks(OPT, 1 << 20, KEY).items()}

    @pytest.mark.parametrize("name,rtol", [
        ("price", 0.005), ("delta", 0.01), ("vega", 0.02),
        ("theta", 0.02), ("rho", 0.01),
    ])
    def test_matches_closed_form(self, mc, name, rtol):
        assert mc[name] == pytest.approx(CF[name], rel=rtol)

    def test_antithetic_off_still_works(self):
        mc = greeks.vanilla_greeks(OPT, 1 << 20, KEY, antithetic=False)
        assert float(mc["delta"]) == pytest.approx(CF["delta"], rel=0.02)


class TestBasketDelta:
    def test_single_asset_equals_vanilla_delta(self):
        opt = BasketOption(
            s=np.array([100.0]), v=np.array([0.2]), w=np.array([1.0]),
            corr=np.eye(1), d=np.zeros(1), k=100.0, r=0.048790, t=1.0)
        price, delta = greeks.basket_delta(opt, 1 << 19, KEY)
        assert float(delta[0]) == pytest.approx(CF["delta"], rel=0.02)

    def test_three_asset_deltas_positive_and_sum_sane(self):
        opt = BasketOption.default_reference(3)
        price, delta = greeks.basket_delta(opt, 1 << 18, KEY)
        d = np.asarray(delta)
        assert (d > 0).all()
        # The strongly anti-correlated equal-weight basket has tiny variance:
        # the forward sits above K almost surely, so the basket delta is ~1
        # and each per-asset delta ~ w_i = 1/3.
        np.testing.assert_allclose(d, 1 / 3, rtol=0.05)


class TestBumpAndRevalue:
    def _price(self, s):
        # Deterministic given the fixed key: CRN holds across bumps.
        o = VanillaOption(s=s, k=OPT.k, r=OPT.r, v=OPT.v, t=OPT.t)
        return greeks.vanilla_greeks(o, 1 << 18, KEY)["price"]

    def test_gamma_matches_closed_form(self):
        gamma = float(greeks.bump_and_revalue(self._price, jnp.float64(100.0),
                                              eps=1.0, order=2))
        assert gamma == pytest.approx(CF["gamma"], rel=0.05)

    def test_crn_delta_matches_pathwise(self):
        fd = float(greeks.bump_and_revalue(self._price, jnp.float64(100.0),
                                           eps=0.5, order=1))
        pw = float(greeks.vanilla_greeks(OPT, 1 << 18, KEY)["delta"])
        # Same paths -> the MC noise cancels; only O(eps^2) bias remains.
        assert fd == pytest.approx(pw, abs=2e-3)


class TestExoticGreeks:
    def test_asian_greeks_match_geometric_closed_form(self):
        from mctpu.types import AsianOption
        geo = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=12,
                          average="geometric")
        g = greeks.asian_greeks(geo, 1 << 17, jax.random.key(2))

        def cf(s, v, r):
            return mcmath.geometric_asian_call(s, 100.0, r, v, 1.0, 12)

        d_cf = jax.grad(cf, argnums=(0, 1, 2))(100.0, 0.2, 0.05)
        assert float(g["delta"]) == pytest.approx(float(d_cf[0]), abs=0.005)
        assert float(g["vega"]) == pytest.approx(float(d_cf[1]), rel=0.02)
        assert float(g["rho"]) == pytest.approx(float(d_cf[2]), rel=0.02)

    def test_heston_delta_matches_cf_finite_difference(self):
        import dataclasses as dc

        from mctpu.models import heston as mheston
        from mctpu.types import HestonOption
        hopt = HestonOption(s=100.0, k=100.0, r=0.03, t=1.0, v0=0.04,
                            kappa=1.5, theta=0.04, xi=0.5, rho=-0.7)
        g = greeks.heston_greeks(hopt, 1 << 16, jax.random.key(3),
                                 n_steps=24, scheme="qe")
        eps = 0.5
        fd = (float(mheston.cf_call_price(dc.replace(hopt, s=100 + eps)))
              - float(mheston.cf_call_price(dc.replace(hopt, s=100 - eps)))
              ) / (2 * eps)
        assert float(g["delta"]) == pytest.approx(fd, abs=0.02)
        # v0 sensitivity: CF finite difference too
        fd_v0 = (float(mheston.cf_call_price(dc.replace(hopt, v0=0.045)))
                 - float(mheston.cf_call_price(dc.replace(hopt, v0=0.035)))
                 ) / 0.01
        assert float(g["dv0"]) == pytest.approx(fd_v0, rel=0.15)

    def test_barrier_crn_delta_matches_bgk_finite_difference(self):
        from mctpu.types import BarrierOption
        uo = BarrierOption(100.0, 100.0, 0.05, 0.2, 1.0, barrier=130.0,
                           n_obs=50, kind="up-and-out")

        def cf(s):
            beff = float(mcmath.barrier_continuity_correction(
                130.0, s, 0.2, 1.0, 50, up=True))
            return float(mcmath.up_and_out_call(s, 100.0, 0.05, 0.2, 1.0,
                                                beff))

        fd = (cf(100.5) - cf(99.5)) / 1.0
        d = greeks.barrier_delta_crn(uo, 1 << 18, jax.random.key(4))
        assert float(d) == pytest.approx(fd, abs=0.02)
