"""Control-variate estimator tests: unbiasedness + variance reduction."""
import jax
import numpy as np
import pytest

from mctpu import engine, math as mcmath, variance
from mctpu.types import BasketOption, VanillaOption

OPT = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0)
KEY = jax.random.key(55)
BS = float(mcmath.bs_call(100.0, 100.0, 0.048790, 0.2, 1.0))
CFG = engine.EngineConfig(num_blocks=8, rows=8, backend="xla")


def test_vanilla_cv_unbiased():
    res = variance.price_vanilla_cv(OPT, 1 << 18, KEY)
    assert abs(float(res.price) - BS) < 4 * float(res.std_error)


def test_vanilla_cv_reduces_variance():
    cv = variance.price_vanilla_cv(OPT, 1 << 18, KEY)
    mc = engine.price_vanilla(OPT, 1 << 18, jax.random.key(56), CFG)
    assert float(cv.std_error) < float(mc.std_error) / 1.8


@pytest.mark.slow
def test_basket_cv_unbiased_vs_plain():
    opt = BasketOption.equicorrelated(5, rho=0.3)
    cv = variance.price_basket_cv(opt, 1 << 18, KEY)
    mc = engine.price_basket(opt, 1 << 20, jax.random.key(57), CFG)
    se = np.hypot(float(cv.std_error),
                  float(mc.std_error))
    assert abs(float(cv.price) - float(mc.price)) < 4 * se


@pytest.mark.slow
def test_basket_cv_reduces_variance():
    opt = BasketOption.equicorrelated(5, rho=0.3)
    cv = variance.price_basket_cv(opt, 1 << 18, KEY)
    mc = engine.price_basket(opt, 1 << 18, jax.random.key(58), CFG)
    assert float(cv.std_error) < float(mc.std_error) / 1.8


@pytest.mark.slow
def test_deep_itm_control_is_near_perfect():
    # Deep ITM: payoff ~ S_T - K (linear in the control) -> huge reduction.
    opt = VanillaOption(s=100.0, k=20.0, r=0.048790, v=0.2, t=1.0)
    cv = variance.price_vanilla_cv(opt, 1 << 16, KEY)
    mc = engine.price_vanilla(opt, 1 << 16, jax.random.key(59), CFG)
    assert float(cv.std_error) < float(mc.std_error) / 100


class TestImportanceSampling:
    def test_unbiased_at_the_money(self):
        # theta=0 reduces IS to plain MC; the default tilt must stay
        # unbiased wherever it is applied.
        o = opt_mk(100.0)
        res = variance.price_vanilla_is(o, 1 << 17, jax.random.key(7))
        bs = float(mcmath.bs_call(100.0, 100.0, 0.05, 0.2, 1.0))
        assert abs(float(res.price) - bs) < 4 * float(res.std_error)

    def test_deep_otm_massive_variance_reduction(self):
        o = opt_mk(200.0)
        bs = float(mcmath.bs_call(100.0, 200.0, 0.05, 0.2, 1.0))
        res = variance.price_vanilla_is(o, 1 << 16, jax.random.key(4))
        assert abs(float(res.price) - bs) < 4 * float(res.std_error)
        from mctpu import engine
        mc = engine.price_vanilla(o, 1 << 16, jax.random.key(4),
                                  engine.EngineConfig(num_blocks=8, rows=8,
                                                      backend="xla"))
        # measured ~2900x variance reduction; gate conservatively
        assert float(res.std_error) < float(mc.std_error) / 10

    def test_custom_theta_still_unbiased(self):
        o = opt_mk(150.0)
        bs = float(mcmath.bs_call(100.0, 150.0, 0.05, 0.2, 1.0))
        for theta in (0.5, 1.5, 3.0):
            res = variance.price_vanilla_is(o, 1 << 17, jax.random.key(8),
                                            theta=theta)
            assert abs(float(res.price) - bs) < 5 * float(res.std_error)

    def test_put_rejected(self):
        from mctpu.types import VanillaOption
        with pytest.raises(ValueError, match="call"):
            variance.price_vanilla_is(
                VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0, kind="put"),
                1 << 12, jax.random.key(0))


def opt_mk(k):
    from mctpu.types import VanillaOption
    return VanillaOption(100.0, k, 0.05, 0.2, 1.0)
