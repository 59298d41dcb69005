"""American options by Longstaff-Schwartz regression Monte Carlo.

A methodologically new engine tier beyond the reference's European-only
scope: simulate GBM paths forward, then induct backward over exercise dates,
estimating the continuation value at each date by least-squares regression
of realized discounted cashflows on a polynomial basis of the spot
(Longstaff & Schwartz 2001).

TPU shape of the algorithm:

* the forward pass is one ``lax.scan`` producing the ``(n_steps, n_paths)``
  spot matrix (path dimension on lanes);
* each backward step is two tiny matmuls (the 4x4 normal equations
  ``X^T W X`` and ``X^T W y`` over all paths at once — MXU food) plus an
  elementwise exercise decision;
* everything jits into one program; no Python in the induction.

Estimator notes: the LSM price is slightly *low-biased* (the exercise rule is
suboptimal, and deciding with in-sample regressions adds a small high bias —
both vanish as paths/basis grow).  The CI below is the sampling CI of the
mean discounted cashflow under the estimated rule, as in standard practice.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mctpu import math as mcmath
from mctpu.types import AmericanOption, McResult

__all__ = ["price_american"]

_BASIS = 4  # 1, x, x^2, x^3 (scaled spot)


def _payoff(kind: str, s, k):
    return jnp.maximum(k - s, 0.0) if kind == "put" else jnp.maximum(s - k, 0.0)


def _basis(s, k):
    """Polynomial regression basis in the moneyness x = s/k (n, 4)."""
    x = s / k
    return jnp.stack([jnp.ones_like(x), x, x * x, x * x * x], axis=-1)


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "kind",
                                             "antithetic"))
def _lsm(s0, k, r, v, t, key, n_paths: int, n_steps: int, kind: str,
         antithetic: bool):
    dtype = mcmath.wide_dtype()
    s0, k, r, v, t = (jnp.asarray(x, dtype) for x in (s0, k, r, v, t))
    dt = t / n_steps
    drift = (r - 0.5 * v * v) * dt
    vol = v * jnp.sqrt(dt)
    disc = jnp.exp(-r * dt)

    # Forward pass: spots at t_1..t_n, shape (n_steps, n_paths).
    z = jax.random.normal(key, (n_steps, n_paths), dtype)
    if antithetic:
        z = jnp.concatenate([z, -z], axis=1)

    def fwd(s, zj):
        s = s * jnp.exp(drift + vol * zj)
        return s, s

    n_all = z.shape[1]
    _, spots = jax.lax.scan(fwd, jnp.full((n_all,), s0, dtype), z)

    # Backward induction from maturity.
    cf = _payoff(kind, spots[-1], k)  # cashflow valued AT its exercise date

    def bwd(cf, s_t):
        cf = cf * disc  # discount one step back to t
        exercise_val = _payoff(kind, s_t, k)
        itm = exercise_val > 0
        w = itm.astype(dtype)
        x = _basis(s_t, k)
        xw = x * w[:, None]
        # Ridge-regularized normal equations: stable when few paths are ITM.
        a = xw.T @ x + 1e-6 * jnp.eye(_BASIS, dtype=dtype)
        b = xw.T @ cf
        beta = jnp.linalg.solve(a, b)
        continuation = x @ beta
        do_exercise = itm & (exercise_val > continuation)
        cf = jnp.where(do_exercise, exercise_val, cf)
        return cf, None

    # Exercise dates t_{n-1}..t_1 (at t_n the payoff already stands).
    cf, _ = jax.lax.scan(bwd, cf, spots[:-1], reverse=True)
    cf = cf * disc  # discount t_1 -> 0

    if antithetic:
        cf = 0.5 * (cf[:n_paths] + cf[n_paths:])
    n = cf.shape[0]
    mean = jnp.mean(cf)
    se = jnp.std(cf, ddof=1) / jnp.sqrt(1.0 * n)
    return mean, se, n


def price_american(opt: AmericanOption, n_paths: int, key: jax.Array,
                   antithetic: bool = True) -> McResult:
    """Longstaff-Schwartz price of an American put/call.

    ``n_paths`` is the total GBM path count (halved into antithetic pairs by
    default).  Runs on the XLA backend (regression needs the whole cross
    section; the MXU does the normal equations).
    """
    opt.validate()
    n = n_paths // 2 if antithetic else n_paths
    mean, se, n_units = _lsm(opt.s, opt.k, opt.r, opt.v, opt.t, key, n,
                             opt.n_steps, opt.payoff, antithetic)
    return McResult(price=mean, ci=1.96 * se, std_error=se,
                    sum_p=mean * n_units, sum_p2=jnp.zeros_like(mean),
                    n=int(n_units), n_paths=n * (2 if antithetic else 1))
