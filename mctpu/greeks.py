"""Monte Carlo Greeks via automatic differentiation (beyond-parity feature).

The reference prices only; a production pricing framework also needs
sensitivities.  Three TPU-native mechanisms, by engine tier:

* **In-kernel pathwise Greeks** (the flagship path) — the fused Pallas
  kernels accumulate the pathwise delta/vega/rho/theta integrands alongside
  the payoff sums; see :func:`mctpu.engine.greeks` and
  :mod:`mctpu.kernels.greeks`.  Runs at pricing-sweep throughput
  (measured 1.2x the price-only kernel on chip), mesh-sharded and bitwise
  shard-invariant.  Use that for production sensitivity sweeps.
* **Pathwise (autodiff) Greeks** (this module) — ``jax.grad`` through the
  jitted Monte Carlo estimator gives sensitivities in one reverse pass for
  ANY a.e.-differentiable payoff, including walks the fused kernels don't
  hand-differentiate (Asian, Heston).  Valid because payoff kinks have
  measure zero.
* **Bump-and-revalue with common random numbers** — the counter-based RNG
  makes every run a deterministic function of the key, so central differences
  reuse *identical* paths and the MC noise cancels to first order.  This is
  the right tool for gamma (the pathwise second derivative of ``max`` is a
  Dirac delta and autodiffs to zero) and for discontinuous payoffs
  (barriers).

The autodiff/CRN paths run on the XLA (Threefry) backend — they are
anchors and fallbacks; the in-kernel path is the engine-scale tool.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from mctpu import math as mcmath
from mctpu.models import basket as mbasket
from mctpu.types import BasketOption, VanillaOption

__all__ = ["vanilla_greeks", "basket_delta", "asian_greeks",
           "heston_greeks", "barrier_delta_crn", "bump_and_revalue"]


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


@functools.partial(jax.jit, static_argnames=("n_paths", "n_obs",
                                             "geometric"))
def _asian_greeks_impl(s, k, r, v, t, key, n_paths: int, n_obs: int,
                       geometric: bool):
    dtype = mcmath.wide_dtype()
    z = jax.random.normal(key, (n_obs, n_paths), dtype)

    def price(s0, r_, v_):
        dt = jnp.asarray(t, dtype) / n_obs
        drift = (r_ - 0.5 * v_ * v_) * dt
        vol = v_ * jnp.sqrt(dt)

        def step(carry, zj):
            spot, acc = carry
            spot = spot * jnp.exp(drift + vol * zj)
            acc = acc + (jnp.log(spot) if geometric else spot)
            return (spot, acc), None

        init = (jnp.full((n_paths,), s0, dtype),
                jnp.zeros((n_paths,), dtype))
        (_, acc), _ = jax.lax.scan(step, init, z)
        avg = jnp.exp(acc / n_obs) if geometric else acc / n_obs
        pay = jnp.maximum(avg - k, 0.0)
        return jnp.exp(-r_ * jnp.asarray(t, dtype)) * jnp.mean(pay)

    args = (jnp.asarray(s, dtype), jnp.asarray(r, dtype),
            jnp.asarray(v, dtype))
    p, (delta, rho, vega) = jax.value_and_grad(price, argnums=(0, 1, 2))(*args)
    return p, delta, vega, rho


def asian_greeks(opt, n_paths: int, key: jax.Array) -> dict:
    """Pathwise MC Greeks of the Asian call: price, delta, vega, rho.

    The average payoff is a.e. differentiable (kink has measure zero), so
    pathwise autodiff is unbiased — same mechanism as
    :func:`vanilla_greeks`, differentiated *through the walk* (one
    ``lax.scan`` reverse pass).  Validated against the exact geometric
    closed form's derivatives in ``tests/test_greeks.py``.
    """
    opt.validate()
    return dict(zip(
        ("price", "delta", "vega", "rho"),
        _asian_greeks_impl(opt.s, opt.k, opt.r, opt.v, opt.t, key, n_paths,
                           opt.n_obs, opt.average == "geometric")))


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "scheme"))
def _heston_greeks_impl(s, k, r, t, v0, kappa, theta, xi, rho_sv, key,
                        n_paths: int, n_steps: int, scheme: str):
    from mctpu.models import heston as mheston
    from mctpu.types import HestonOption

    dtype = mcmath.wide_dtype()
    z = jax.random.normal(key, (n_steps, 2, n_paths), dtype)

    def price(s0, v0_, xi_):
        opt = HestonOption(s=s0, k=k, r=r, t=t, v0=v0_, kappa=kappa,
                           theta=theta, xi=xi_, rho=rho_sv)
        if scheme == "qe":
            c = mheston.qe_constants(opt, n_steps, dtype)
            x = jnp.zeros((n_paths,), dtype)
            v = jnp.full((n_paths,), v0_, dtype)

            def step(carry, zj):
                return mheston.qe_step(carry[0], carry[1], zj[0], zj[1], c,
                                       mcmath.norm_cdf), None

            (x, _), _ = jax.lax.scan(step, (x, v), z)
            st = s0 * jnp.exp(x)
        else:
            dt = jnp.asarray(t, dtype) / n_steps
            sqdt = jnp.sqrt(dt)
            rho_c = jnp.asarray(rho_sv, dtype)
            rho_s = jnp.sqrt(1.0 - rho_c * rho_c)

            def step(carry, zj):
                st_, v = carry
                vp = jnp.maximum(v, 0.0)
                sq_v = jnp.sqrt(vp) * sqdt
                z_s = rho_c * zj[0] + rho_s * zj[1]
                st_ = st_ * jnp.exp(r * dt - 0.5 * vp * dt + sq_v * z_s)
                v = v + kappa * (theta - vp) * dt + xi_ * sq_v * zj[0]
                return (st_, v), None

            init = (jnp.full((n_paths,), s0, dtype),
                    jnp.full((n_paths,), v0_, dtype))
            (st, _), _ = jax.lax.scan(step, init, z)
        pay = jnp.maximum(st - k, 0.0)
        return jnp.exp(-jnp.asarray(r, dtype) * jnp.asarray(t, dtype)) \
            * jnp.mean(pay)

    args = (jnp.asarray(s, dtype), jnp.asarray(v0, dtype),
            jnp.asarray(xi, dtype))
    p, (delta, dv0, dxi) = jax.value_and_grad(price, argnums=(0, 1, 2))(*args)
    return p, delta, dv0, dxi


def heston_greeks(opt, n_paths: int, key: jax.Array, n_steps: int = 100,
                  scheme: str = "euler") -> dict:
    """Pathwise Heston Greeks: price, delta, d/d(v0), d/d(xi).

    Autodiff through the full stochastic-vol walk (Euler or QE — branch
    selection via ``where`` is autodiff-safe).  Validated against central
    differences of the characteristic-function price.
    """
    opt.validate()
    p, delta, dv0, dxi = _heston_greeks_impl(
        opt.s, opt.k, opt.r, opt.t, opt.v0, opt.kappa, opt.theta, opt.xi,
        opt.rho, key, n_paths, n_steps, scheme)
    return {"price": p, "delta": delta, "dv0": dv0, "dxi": dxi}


def barrier_delta_crn(opt, n_paths: int, key: jax.Array,
                      eps: float = 0.5) -> jax.Array:
    """Barrier-call delta by common-random-number central differences.

    Pathwise autodiff is *biased* for barrier payoffs: the knockout
    indicator is discontinuous in the spot, and its derivative (a surface
    Dirac term) autodiffs to zero.  CRN bump-and-revalue prices identical
    paths at ``s ± eps`` (counter-based RNG), so the estimator converges to
    the true delta with the MC noise cancelling to first order.
    """
    import dataclasses as _dc

    from mctpu import engine

    opt.validate()
    cfg = engine.EngineConfig(num_blocks=8, rows=8, backend="xla")

    def price(s0):
        o = _dc.replace(opt, s=float(s0))
        return float(engine.price_barrier(o, n_paths, key, cfg).price)

    return bump_and_revalue(price, float(opt.s), eps, order=1)
