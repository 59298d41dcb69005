"""Control-variate estimator tests: unbiasedness + variance reduction."""
import jax
import numpy as np

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


def test_basket_cv_unbiased_vs_plain():
    opt = BasketOption.equicorrelated(5, rho=0.3)
    cv = variance.price_basket_cv(opt, 1 << 18, KEY)
    mc = engine.price_basket(opt, 1 << 20, jax.random.key(57), CFG)
    se = np.hypot(float(cv.std_error),
                  float(mc.std_error))
    assert abs(float(cv.price) - float(mc.price)) < 4 * se


def test_basket_cv_reduces_variance():
    opt = BasketOption.equicorrelated(5, rho=0.3)
    cv = variance.price_basket_cv(opt, 1 << 18, KEY)
    mc = engine.price_basket(opt, 1 << 18, jax.random.key(58), CFG)
    assert float(cv.std_error) < float(mc.std_error) / 1.8


def test_deep_itm_control_is_near_perfect():
    # Deep ITM: payoff ~ S_T - K (linear in the control) -> huge reduction.
    opt = VanillaOption(s=100.0, k=20.0, r=0.048790, v=0.2, t=1.0)
    cv = variance.price_vanilla_cv(opt, 1 << 16, KEY)
    mc = engine.price_vanilla(opt, 1 << 16, jax.random.key(59), CFG)
    assert float(cv.std_error) < float(mc.std_error) / 100
