"""Unit tests for the closed-form math layer (SURVEY.md §4: unit tier)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mctpu import math as mcmath
from mctpu import reference
from mctpu.types import BasketOption


class TestNormCdf:
    def test_hastings_matches_erf(self):
        d = jnp.linspace(-8.0, 8.0, 4001, dtype=jnp.float64)
        got = mcmath.norm_cdf_hastings(d)
        want = mcmath.norm_cdf(d)
        # Hastings 26.2.17 is accurate to ~7.5e-8 absolute.
        assert float(jnp.max(jnp.abs(got - want))) < 1e-7

    def test_symmetry(self):
        d = jnp.asarray([0.0, 1.0, -1.0, 2.5, -2.5], jnp.float64)
        c = mcmath.norm_cdf_hastings(d)
        assert float(jnp.abs(c[1] + c[2] - 1.0)) < 1e-9
        assert abs(float(c[0]) - 0.5) < 1e-9

    def test_extremes(self):
        assert float(mcmath.norm_cdf_hastings(jnp.float64(10.0))) == pytest.approx(1.0)
        assert float(mcmath.norm_cdf_hastings(jnp.float64(-10.0))) == pytest.approx(0.0, abs=1e-12)


class TestBsCall:
    def test_textbook_value(self):
        # Classic S=K=100, r=5%, v=20%, T=1 -> 10.4506 (Hull, Table 13.x).
        c = float(mcmath.bs_call(100.0, 100.0, 0.05, 0.2, 1.0))
        assert c == pytest.approx(10.4506, abs=2e-4)

    def test_reference_driver_value(self):
        # The vanillaOpt.cu:22-26 parameters; cross-checked against the
        # independent NumPy/Hastings implementation.
        a = float(mcmath.bs_call(100.0, 100.0, 0.048790, 0.2, 1.0))
        b = float(reference.bs_call(100.0, 100.0, 0.048790, 0.2, 1.0))
        # The oracle uses the Hastings CDF (|err| ~ 7.5e-8, scaled by S=100).
        assert a == pytest.approx(b, abs=5e-5)

    def test_intrinsic_limit_at_expiry(self):
        assert float(mcmath.bs_call(120.0, 100.0, 0.05, 0.2, 0.0)) == pytest.approx(20.0)
        assert float(mcmath.bs_call(80.0, 100.0, 0.05, 0.2, 0.0)) == 0.0

    def test_monotone_in_spot(self):
        s = jnp.linspace(50.0, 150.0, 101, dtype=jnp.float64)
        c = mcmath.bs_call(s, 100.0, 0.05, 0.2, 1.0)
        assert bool(jnp.all(jnp.diff(c) > 0))

    def test_bounds(self):
        # max(S - K e^{-rT}, 0) <= C <= S
        s, k, r, v, t = 100.0, 90.0, 0.03, 0.25, 2.0
        c = float(mcmath.bs_call(s, k, r, v, t))
        assert max(s - k * np.exp(-r * t), 0.0) < c < s


class TestCholesky:
    def test_roundtrip_singular_reference_matrix(self):
        # The reference's own default correlation matrix is singular
        # (basketOpt.cu:46-54): must factorize without NaNs.
        corr = jnp.asarray(BasketOption.default_reference(3).corr, jnp.float64)
        L = mcmath.cholesky_lower(corr)
        assert not bool(jnp.any(jnp.isnan(L)))
        assert float(jnp.max(jnp.abs(L @ L.T - corr))) < 1e-12

    def test_roundtrip_random_pd(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((10, 10))
        cov = a @ a.T + 10 * np.eye(10)
        d = np.sqrt(np.diag(cov))
        corr = cov / np.outer(d, d)
        L = mcmath.cholesky_lower(jnp.asarray(corr, jnp.float64))
        assert float(jnp.max(jnp.abs(L @ L.T - corr))) < 1e-12
        # Matches the independent NumPy Golub-Van Loan implementation.
        Lnp = reference.cholesky_psd(corr)
        assert np.abs(np.asarray(L) - Lnp).max() < 1e-12

    def test_lower_triangular(self):
        corr = jnp.asarray(BasketOption.default_reference(5).corr, jnp.float64)
        L = np.asarray(mcmath.cholesky_lower(corr))
        assert np.abs(np.triu(L, 1)).max() == 0.0


class TestCvaClosedForm:
    def test_martingale_identity(self):
        # CVA = lgd * C0 * sum_j dp_j e^{r t_j}; independently recompute.
        lam, lgd, s, k, r, v, t, g = 0.03, 0.6, 100.0, 100.0, 0.05, 0.2, 1.0, 50
        got = float(mcmath.cva_closed_form(lam, lgd, s, k, r, v, t, g))
        c0 = float(mcmath.bs_call(s, k, r, v, t))
        dt = t / g
        j = np.arange(1, g + 1)
        dp = np.exp(-lam * dt * (j - 1)) - np.exp(-lam * dt * j)
        want = lgd * c0 * np.sum(dp * np.exp(r * j * dt))
        assert got == pytest.approx(want, rel=1e-10)

    def test_default_leg_sums_to_total_default_prob(self):
        lam, t, g = 0.03, 1.0, 250
        dp = np.asarray(mcmath.default_leg_weights(lam, t, g, dtype=jnp.float64))
        assert dp.sum() == pytest.approx(1 - np.exp(-lam * t), rel=1e-12)
        assert (dp > 0).all()
