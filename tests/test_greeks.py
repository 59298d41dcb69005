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
