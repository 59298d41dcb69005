"""Control-variate estimators (variance reduction, beyond-parity).

Classic control for equity options: the discounted terminal spot is a
martingale with known mean (``E[e^{-rT} S_T] = S_0``), and it is strongly
correlated with call payoffs.  The regression-adjusted estimator

    Y_i = P_i - beta (C_i - E[C]),   beta* = Cov(P, C) / Var(C)

is unbiased for any *fixed* beta; estimating beta on the same sample adds
O(1/n) bias, which we avoid the standard way: beta is estimated on a small
pilot fraction and applied to the rest.

Complements antithetic variates (:class:`mctpu.engine.EngineConfig`) and the
lattice RQMC (:mod:`mctpu.qmc`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mctpu import math as mcmath
from mctpu.models import basket as mbasket
from mctpu.types import AsianOption, BasketOption, McResult, VanillaOption

__all__ = ["price_vanilla_cv", "price_basket_cv", "price_asian_cv",
           "price_vanilla_is", "optimal_tilt"]


def _cv_estimate(pay, ctrl, ctrl_mean, pilot: int, discount):
    """Pilot-estimated-beta control-variate mean and CI."""
    p_pilot, c_pilot = pay[:pilot], ctrl[:pilot]
    dc = c_pilot - jnp.mean(c_pilot)
    beta = jnp.sum((p_pilot - jnp.mean(p_pilot)) * dc) / (
        jnp.sum(dc * dc) + jnp.finfo(pay.dtype).tiny)
    y = pay[pilot:] - beta * (ctrl[pilot:] - ctrl_mean)
    n = y.shape[0]
    mean = jnp.mean(y)
    se = jnp.std(y, ddof=1) / jnp.sqrt(1.0 * n)
    return discount * mean, se, n


@functools.partial(jax.jit, static_argnames=("n_paths", "pilot"))
def _vanilla_cv(s, k, r, v, t, key, n_paths: int, pilot: int):
    dtype = mcmath.wide_dtype()
    z = jax.random.normal(key, (n_paths,), dtype)
    s_t = s * jnp.exp((r - 0.5 * v * v) * t + v * jnp.sqrt(t) * z)
    pay = jnp.maximum(s_t - k, 0.0)
    # Control: terminal spot, E[S_T] = s e^{rT}.
    return _cv_estimate(pay, s_t, s * jnp.exp(r * t), pilot,
                        jnp.exp(-r * t))


def price_vanilla_cv(opt: VanillaOption, n_paths: int, key: jax.Array,
                     pilot_frac: float = 0.1) -> McResult:
    """Control-variate European call price (control: terminal spot)."""
    if getattr(opt, "kind", "call") != "call":
        raise ValueError("price_vanilla_cv prices calls")
    dtype = mcmath.wide_dtype()
    pilot = max(2, int(n_paths * pilot_frac))
    price, se, n = _vanilla_cv(
        jnp.asarray(opt.s, dtype), jnp.asarray(opt.k, dtype),
        jnp.asarray(opt.r, dtype), jnp.asarray(opt.v, dtype),
        jnp.asarray(opt.t, dtype), key, n_paths, pilot)
    se = se * jnp.exp(-jnp.asarray(opt.r, dtype) * jnp.asarray(opt.t, dtype))
    return McResult(price=price, ci=1.96 * se, std_error=se,
                    sum_p=price * n, sum_p2=jnp.zeros_like(price),
                    n=n_paths - pilot, n_paths=n_paths)


@functools.partial(jax.jit, static_argnames=("n_paths", "pilot"))
def _basket_cv(opt: BasketOption, chol, key, n_paths: int, pilot: int):
    dtype = mcmath.wide_dtype()
    a = opt.corr.shape[0]
    z = jax.random.normal(key, (n_paths, a), dtype)
    bt = mbasket.correlate(chol, opt.d, z)
    drift = (opt.r - 0.5 * opt.v * opt.v) * opt.t
    s_t = opt.s * jnp.exp(drift + opt.v * jnp.sqrt(opt.t) * bt)
    basket = s_t @ opt.w
    pay = jnp.maximum(basket - opt.k, 0.0)
    # Control: the weighted basket itself; under zero Brownian drift d,
    # E[sum w_j S_T^j] = e^{rT} sum w_j s0_j.
    ctrl_mean = jnp.exp(opt.r * opt.t) * jnp.sum(opt.w * opt.s)
    return _cv_estimate(pay, basket, ctrl_mean, pilot,
                        jnp.exp(-opt.r * opt.t))


@functools.partial(jax.jit, static_argnames=("n_paths", "pilot"))
def _asian_cv(opt, key, n_paths: int, pilot: int):
    from mctpu.models import asian as masian
    dtype = mcmath.wide_dtype()
    o = opt.astype(dtype)
    z_seq = jax.random.normal(key, (opt.n_obs, n_paths), dtype)
    arith = masian.path_payoff(
        AsianOption(s=o.s, k=o.k, r=o.r, v=o.v, t=o.t, n_obs=opt.n_obs,
                    average="arithmetic"), z_seq)
    geom = masian.path_payoff(
        AsianOption(s=o.s, k=o.k, r=o.r, v=o.v, t=o.t, n_obs=opt.n_obs,
                    average="geometric"), z_seq)
    # Control: the (undiscounted) geometric-Asian payoff; its exact mean is
    # the closed form grown at the risk-free rate.
    ctrl_mean = jnp.exp(o.r * o.t) * mcmath.geometric_asian_call(
        o.s, o.k, o.r, o.v, o.t, opt.n_obs, dtype=dtype)
    return _cv_estimate(arith, geom, ctrl_mean, pilot, jnp.exp(-o.r * o.t))


def price_asian_cv(opt, n_paths: int, key: jax.Array,
                   pilot_frac: float = 0.1) -> McResult:
    """Arithmetic-Asian price with the geometric-Asian control variate.

    The classic pairing: the two payoffs are ~99% correlated and the
    geometric mean is known exactly (:func:`mctpu.math.geometric_asian_call`),
    so the CI shrinks by an order of magnitude or more.
    """
    if opt.average != "arithmetic":
        raise ValueError("the geometric control variate prices the "
                         "arithmetic average")
    dtype = mcmath.wide_dtype()
    pilot = max(2, int(n_paths * pilot_frac))
    price, se, n = _asian_cv(opt, key, n_paths, pilot)
    se = se * jnp.exp(-jnp.asarray(opt.r, dtype) * jnp.asarray(opt.t, dtype))
    return McResult(price=price, ci=1.96 * se, std_error=se,
                    sum_p=price * n, sum_p2=jnp.zeros_like(price),
                    n=n_paths - pilot, n_paths=n_paths)


def price_basket_cv(opt: BasketOption, n_paths: int, key: jax.Array,
                    pilot_frac: float = 0.1) -> McResult:
    """Control-variate basket call price (control: the terminal basket).

    Assumes the reference's usual zero Brownian drift vector ``d`` (the
    control mean shifts otherwise).
    """
    dtype = mcmath.wide_dtype()
    o = opt.astype(dtype)
    chol = mcmath.cholesky_lower(jnp.asarray(o.corr, dtype))
    pilot = max(2, int(n_paths * pilot_frac))
    price, se, n = _basket_cv(o, chol, key, n_paths, pilot)
    se = se * jnp.exp(-jnp.asarray(opt.r, dtype) * jnp.asarray(opt.t, dtype))
    return McResult(price=price, ci=1.96 * se, std_error=se,
                    sum_p=price * n, sum_p2=jnp.zeros_like(price),
                    n=n_paths - pilot, n_paths=n_paths)


# ---------------------------------------------------------------------------
# Importance sampling (exponential tilting)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_paths",))
def _vanilla_is(s, k, r, v, t, theta, key, n_paths: int):
    dtype = mcmath.wide_dtype()
    z = jax.random.normal(key, (n_paths,), dtype)
    mu = (r - 0.5 * v * v) * t
    sig = v * jnp.sqrt(t)
    zt = z + theta  # sample under the tilted measure N(theta, 1)
    lr = jnp.exp(-theta * zt + 0.5 * theta * theta)  # dP/dQ weight
    st = s * jnp.exp(mu + sig * zt)
    pay = jnp.maximum(st - k, 0.0) * lr
    disc = jnp.exp(-r * t)
    n = jnp.asarray(n_paths, dtype)
    sum_p = jnp.sum(pay)
    sum_p2 = jnp.sum(pay * pay)
    mean = disc * sum_p / n
    var = jnp.maximum(n * sum_p2 - sum_p * sum_p, 0.0) / (n * (n - 1.0))
    se = disc * jnp.sqrt(var / n)
    return mean, se, sum_p, sum_p2


def optimal_tilt(opt: VanillaOption) -> float:
    """Drift shift that centers the sampler on the strike.

    Under the tilted measure ``z ~ N(theta, 1)`` the spot's median lands on
    ``K`` when ``theta = (ln(K/S) - (r - v^2/2) T) / (v sqrt(T))`` — the
    standard heuristic (near-optimal for OTM calls, where nearly every
    untilted path wastes its draw on a zero payoff).
    """
    import numpy as np

    s, k, r, v, t = (float(x) for x in (opt.s, opt.k, opt.r, opt.v, opt.t))
    return max((np.log(k / s) - (r - 0.5 * v * v) * t) / (v * np.sqrt(t)),
               0.0)


def price_vanilla_is(opt: VanillaOption, n_paths: int, key: jax.Array,
                     theta: float | None = None) -> McResult:
    """Importance-sampled European call (exponential tilting).

    Samples ``z ~ N(theta, 1)`` and reweights payoffs by the likelihood
    ratio ``exp(-theta z + theta^2/2)`` — unbiased for any ``theta``, and
    for deep out-of-the-money strikes (where plain MC wastes almost every
    path on a zero payoff) the variance drops by orders of magnitude.
    ``theta`` defaults to :func:`optimal_tilt`.
    """
    opt.validate()
    if getattr(opt, "kind", "call") != "call":
        raise ValueError("importance sampling implemented for calls "
                         "(OTM puts: tilt negative via put-call parity)")
    if theta is None:
        theta = optimal_tilt(opt)
    dtype = mcmath.wide_dtype()
    mean, se, sum_p, sum_p2 = _vanilla_is(
        jnp.asarray(opt.s, dtype), jnp.asarray(opt.k, dtype),
        jnp.asarray(opt.r, dtype), jnp.asarray(opt.v, dtype),
        jnp.asarray(opt.t, dtype), jnp.asarray(theta, dtype), key, n_paths)
    return McResult(price=mean, ci=1.96 * se, std_error=se,
                    sum_p=sum_p, sum_p2=sum_p2, n=n_paths, n_paths=n_paths)
