"""Asian option tests: geometric closed-form oracle, AM-GM ordering,
geometric control variate for the arithmetic average."""
import jax
import numpy as np
import pytest

from mctpu import engine, math as mcmath, variance
from mctpu.models import asian as masian
from mctpu.types import AsianOption

KEY = jax.random.key(808)
CFG = engine.EngineConfig(num_blocks=8, rows=8, backend="xla")
GEO = AsianOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0, n_obs=12,
                  average="geometric")
ARI = AsianOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0, n_obs=12,
                  average="arithmetic")


class TestClosedForm:
    def test_single_observation_is_vanilla(self):
        # m=1: the "average" is just S_T -> plain Black-Scholes.
        got = float(mcmath.geometric_asian_call(100.0, 100.0, 0.05, 0.2,
                                                1.0, 1))
        want = float(mcmath.bs_call(100.0, 100.0, 0.05, 0.2, 1.0))
        assert got == pytest.approx(want, rel=1e-10)

    def test_below_vanilla(self):
        # Averaging reduces effective volatility: Asian < vanilla.
        asian = float(mcmath.geometric_asian_call(100.0, 100.0, 0.05, 0.2,
                                                  1.0, 50))
        vanilla = float(mcmath.bs_call(100.0, 100.0, 0.05, 0.2, 1.0))
        assert 0 < asian < vanilla

    def test_monotone_in_observations(self):
        # More observations -> smaller average variance -> lower price.
        prices = [float(mcmath.geometric_asian_call(100.0, 100.0, 0.05,
                                                    0.2, 1.0, m))
                  for m in (1, 2, 4, 12, 50)]
        assert all(a > b for a, b in zip(prices, prices[1:]))


class TestEngine:
    def test_geometric_within_3_sigma_of_closed_form(self):
        res = engine.price_asian(GEO, 1 << 17, KEY, CFG)
        want = float(masian.closed_form_geometric(GEO))
        se = float(res.std_error)
        assert abs(float(res.price) - want) < 3 * se

    def test_arithmetic_above_geometric(self):
        # AM >= GM pathwise, so the arithmetic price dominates.
        a = engine.price_asian(ARI, 1 << 17, KEY, CFG)
        g = engine.price_asian(GEO, 1 << 17, KEY, CFG)
        assert float(a.price) > float(g.price)

    def test_antithetic(self):
        cfg_a = engine.EngineConfig(num_blocks=8, rows=8, backend="xla",
                                    antithetic=True)
        anti = engine.price_asian(GEO, 1 << 16, KEY, cfg_a)
        plain = engine.price_asian(GEO, 1 << 16, KEY, CFG)
        assert float(anti.std_error) < float(plain.std_error)
        want = float(masian.closed_form_geometric(GEO))
        assert abs(float(anti.price) - want) < 4 * float(anti.std_error)

    def test_model_twin_agrees(self):
        # models.asian.path_payoff is the spec; the engine must match it
        # statistically (different streams).
        z = jax.random.normal(jax.random.key(5), (12, 1 << 15))
        pay = masian.path_payoff(ARI, z)
        direct = float(np.exp(-0.05) * np.mean(np.asarray(pay)))
        res = engine.price_asian(ARI, 1 << 17, KEY, CFG)
        se = float(res.std_error) + \
            float(np.std(np.asarray(pay)) / np.sqrt(pay.size))
        assert abs(direct - float(res.price)) < 4 * se

    def test_validation(self):
        with pytest.raises(ValueError, match="average"):
            AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, 12, "median").validate()


class TestControlVariate:
    def test_unbiased_and_much_tighter(self):
        cv = variance.price_asian_cv(ARI, 1 << 15, KEY)
        mc = engine.price_asian(ARI, 1 << 15, KEY, CFG)
        # ~99% payoff correlation: order-of-magnitude CI reduction.
        assert float(cv.std_error) < float(mc.std_error) / 8
        se = np.hypot(float(cv.std_error),
                      float(mc.std_error))
        assert abs(float(cv.price) - float(mc.price)) < 4 * se

    def test_rejects_geometric_input(self):
        with pytest.raises(ValueError, match="arithmetic"):
            variance.price_asian_cv(GEO, 1024, KEY)
