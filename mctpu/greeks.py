"""Monte Carlo Greeks via automatic differentiation (beyond-parity feature).

The reference prices only; a production pricing framework also needs
sensitivities.  Two TPU-native mechanisms, both enabled by this framework's
design:

* **Pathwise (autodiff) Greeks** — ``jax.grad`` through the jitted Monte
  Carlo estimator gives delta/vega/rho/theta in one reverse pass.  Valid for
  a.e.-differentiable payoffs (the call's kink has measure zero).
* **Bump-and-revalue with common random numbers** — the counter-based RNG
  makes every run a deterministic function of the key, so central differences
  reuse *identical* paths and the MC noise cancels to first order.  This is
  the right tool for gamma (the pathwise second derivative of ``max`` is a
  Dirac delta and autodiffs to zero).

Both run on the XLA (Threefry) backend: the Pallas kernels have no VJP, and
Greeks workloads are far smaller than pricing sweeps.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from mctpu import math as mcmath
from mctpu.models import basket as mbasket
from mctpu.types import BasketOption, VanillaOption

__all__ = ["vanilla_greeks", "basket_delta", "bump_and_revalue"]


def _vanilla_price(s, k, r, v, t, z, antithetic: bool):
    """Discounted MC price from pre-drawn normals (differentiable)."""
    mu = (r - 0.5 * v * v) * t
    sig = v * jnp.sqrt(t)
    pay = jnp.maximum(s * jnp.exp(mu + sig * z) - k, 0.0)
    if antithetic:
        pay = 0.5 * (pay + jnp.maximum(s * jnp.exp(mu - sig * z) - k, 0.0))
    return jnp.exp(-r * t) * jnp.mean(pay)


@functools.partial(jax.jit, static_argnames=("n_paths", "antithetic"))
def _vanilla_greeks_impl(s, k, r, v, t, key, n_paths: int, antithetic: bool):
    dtype = mcmath.wide_dtype()
    z = jax.random.normal(key, (n_paths,), dtype)
    price, grads = jax.value_and_grad(_vanilla_price, argnums=(0, 2, 3, 4))(
        jnp.asarray(s, dtype), jnp.asarray(k, dtype), jnp.asarray(r, dtype),
        jnp.asarray(v, dtype), jnp.asarray(t, dtype), z, antithetic)
    delta, rho, vega, theta = grads
    return price, delta, vega, theta, rho


def vanilla_greeks(opt: VanillaOption, n_paths: int, key: jax.Array,
                   antithetic: bool = True) -> dict:
    """Pathwise MC Greeks of a European call: price, delta, vega, theta, rho.

    ``theta`` is d/d(maturity) (same convention as :func:`mctpu.math.bs_greeks`).
    Gamma is intentionally absent here — use :func:`bump_and_revalue` on
    delta, or the closed form.  Validated against ``bs_greeks`` in
    ``tests/test_greeks.py``.
    """
    if getattr(opt, "kind", "call") != "call":
        raise ValueError("vanilla_greeks prices calls; use put-call parity "
                         "for put Greeks")
    n = n_paths // 2 if antithetic else n_paths
    price, delta, vega, theta, rho = _vanilla_greeks_impl(
        opt.s, opt.k, opt.r, opt.v, opt.t, key, n, antithetic)
    return {"price": price, "delta": delta, "vega": vega, "theta": theta,
            "rho": rho}


@functools.partial(jax.jit, static_argnames=("n_paths",))
def _basket_delta_impl(opt: BasketOption, key, n_paths: int):
    dtype = mcmath.wide_dtype()
    o = opt.astype(dtype)
    chol = mcmath.cholesky_lower(jnp.asarray(o.corr, dtype))
    z = jax.random.normal(key, (n_paths, o.corr.shape[0]), dtype)

    def price(s_vec):
        o2 = BasketOption(s=s_vec, v=o.v, w=o.w, corr=o.corr, d=o.d,
                          k=o.k, r=o.r, t=o.t)
        pay = mbasket.terminal_payoff(o2, chol, z)
        return jnp.exp(-o.r * o.t) * jnp.mean(pay)

    return jax.value_and_grad(price)(o.s)


def basket_delta(opt: BasketOption, n_paths: int, key: jax.Array):
    """(price, per-asset pathwise delta vector) of the basket call."""
    return _basket_delta_impl(opt, key, n_paths)


def bump_and_revalue(price_fn: Callable[..., jax.Array], x0, eps: float,
                     order: int = 2):
    """Central finite differences with common random numbers.

    ``price_fn(x)`` must be a deterministic function of ``x`` (fix the PRNG
    key inside — every mctpu engine is deterministic given its key, so paths
    are identical across bumps and MC noise cancels).  ``order=1`` returns
    the first derivative; ``order=2`` the (f(x+e) - 2f(x) + f(x-e))/e^2
    second derivative (e.g. gamma from the price).
    """
    up = price_fn(x0 + eps)
    dn = price_fn(x0 - eps)
    if order == 1:
        return (up - dn) / (2 * eps)
    mid = price_fn(x0)
    return (up - 2 * mid + dn) / (eps * eps)
