"""Randomized quasi-Monte Carlo: rank-1 shifted lattice rules.

Beyond-parity feature (the RQMC theme of the retrieved literature, PAPERS.md):
replace i.i.d. uniforms with a low-discrepancy point set to cut the error
rate from O(n^-1/2) toward O(n^-1) for smooth low-dimensional integrands —
exactly the vanilla (d=1) and basket (d=n_assets) payoffs.

Design (TPU-shaped):

* **Rank-1 lattice**: ``u_i = frac(i * g / n + shift)`` — pure vectorized
  arithmetic, no per-dimension tables, perfect for the VPU.  The generating
  vector is Korobov-style ``g_j = a^j mod n`` with ``n`` prime.
* **Random shifts**: R independent uniform shifts give R unbiased replicate
  estimates; their spread yields a statistically honest CI (the i.i.d. unit
  is the replicate, not the path).
* Normals via the inverse CDF (``ndtri``) — the standard QMC map (Box-Muller
  scrambles low-discrepancy structure).

CVA is intentionally left on plain MC: its effective dimension is the whole
time grid (up to 500), where lattice rules lose their edge.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mctpu import math as mcmath
from mctpu.models import basket as mbasket
from mctpu.types import BasketOption, McResult, VanillaOption

__all__ = ["lattice_points", "price_vanilla_qmc", "price_basket_qmc",
           "next_prime"]


def next_prime(n: int) -> int:
    """Smallest prime >= n (trial division; n is a host-side launch size)."""
    def is_prime(m: int) -> bool:
        if m < 2:
            return False
        if m % 2 == 0:
            return m == 2
        f = 3
        while f * f <= m:
            if m % f == 0:
                return False
            f += 2
        return True

    while not is_prime(n):
        n += 1
    return n


def korobov_vector(n: int, dim: int, a: int = 1571) -> np.ndarray:
    """Korobov generating vector ``(1, a, a^2, ...) mod n`` (host-side).

    Requires ``gcd(a, n) == 1`` — otherwise every dimension ``j >= 1``
    collapses (worst case ``a % n == 0`` makes them all constant); bump ``a``
    past any collision (n is prime in our callers, so coprimality is just
    ``a % n != 0``).
    """
    import math as _math

    while _math.gcd(a, n) != 1:
        a += 1
    g = np.empty(dim, dtype=np.int64)
    g[0] = 1
    for j in range(1, dim):
        g[j] = (g[j - 1] * a) % n
    return g


def lattice_points(n: int, dim: int, shift: jax.Array, dtype=jnp.float32):
    """The shifted rank-1 lattice point set, shape ``(n, dim)`` in [0, 1).

    ``shift`` is a ``(dim,)`` uniform array (one randomization).  The
    unshifted lattice ``(i * g mod n) / n`` is computed exactly in host-side
    int64 — never in floating point, whose ulp at ``i * g / n ~ n`` exceeds
    the 1/n lattice spacing even in f32 for n as small as ~2^13 (and jnp.f64
    silently downgrades to f32 when x64 is off, e.g. on TPU).  Only the
    shift-and-frac runs on device, on values in [0, 1) where ``dtype``
    resolution is ample.
    """
    g = korobov_vector(n, dim)
    i = np.arange(n, dtype=np.int64)[:, None]
    base = ((i * g[None, :]) % n).astype(np.float64) / n  # exact for n < 2^53
    u = jnp.asarray(base, dtype) + jnp.asarray(shift, dtype)[None, :]
    return u - jnp.floor(u)


def _replicate_estimate(values):
    """McResult-style (mean, ci) from R replicate estimates (R small)."""
    r = values.shape[0]
    mean = jnp.mean(values)
    se = jnp.std(values, ddof=1) / jnp.sqrt(r * 1.0)
    return mean, se


@functools.partial(jax.jit, static_argnames=("n", "replicates"))
def _vanilla_qmc(s, k, r, v, t, key, n: int, replicates: int):
    dtype = mcmath.wide_dtype()
    shifts = jax.random.uniform(key, (replicates, 1), dtype=dtype)

    mu = (r - 0.5 * v * v) * t
    sig = v * jnp.sqrt(t)

    def one(shift):
        u = lattice_points(n, 1, shift, dtype)[:, 0]
        # Clamp away from {0,1}: ndtri(0) = -inf would poison the mean.
        eps = jnp.asarray(1e-7, dtype)
        z = mcmath_ndtri(jnp.clip(u, eps, 1 - eps))
        pay = jnp.maximum(s * jnp.exp(mu + sig * z) - k, 0.0)
        return jnp.exp(-r * t) * jnp.mean(pay)

    vals = jax.vmap(one)(shifts)
    return _replicate_estimate(vals)


def mcmath_ndtri(u):
    from jax.scipy.special import ndtri
    return ndtri(u)


def price_vanilla_qmc(opt: VanillaOption, n_points: int, key: jax.Array,
                      replicates: int = 16) -> McResult:
    """RQMC price of a European call.

    ``n_points`` lattice points per replicate (rounded up to a prime) x
    ``replicates`` random shifts; the CI comes from the replicate spread.
    """
    n = next_prime(n_points)
    dtype = mcmath.wide_dtype()
    price, se = _vanilla_qmc(
        jnp.asarray(opt.s, dtype), jnp.asarray(opt.k, dtype),
        jnp.asarray(opt.r, dtype), jnp.asarray(opt.v, dtype),
        jnp.asarray(opt.t, dtype), key, n, replicates)
    return McResult(price=price, ci=1.96 * se, std_error=se,
                    sum_p=price * n * replicates, sum_p2=jnp.zeros_like(price),
                    n=replicates, n_paths=n * replicates)


@functools.partial(jax.jit, static_argnames=("n", "replicates", "dim"))
def _basket_qmc(opt: BasketOption, chol, key, n: int, dim: int,
                replicates: int):
    dtype = mcmath.wide_dtype()
    shifts = jax.random.uniform(key, (replicates, dim), dtype=dtype)

    def one(shift):
        u = lattice_points(n, dim, shift, dtype)
        eps = jnp.asarray(1e-7, dtype)
        z = mcmath_ndtri(jnp.clip(u, eps, 1 - eps))
        pay = mbasket.terminal_payoff(opt, chol, z)
        return jnp.exp(-opt.r * opt.t) * jnp.mean(pay)

    vals = jax.vmap(one)(shifts)
    return _replicate_estimate(vals)


def price_basket_qmc(opt: BasketOption, n_points: int, key: jax.Array,
                     replicates: int = 16) -> McResult:
    """RQMC price of the basket call (lattice dimension = n_assets)."""
    n = next_prime(n_points)
    dtype = mcmath.wide_dtype()
    o = opt.astype(dtype)
    chol = mcmath.cholesky_lower(jnp.asarray(o.corr, dtype))
    price, se = _basket_qmc(o, chol, key, n, opt.n_assets, replicates)
    return McResult(price=price, ci=1.96 * se, std_error=se,
                    sum_p=price * n * replicates, sum_p2=jnp.zeros_like(price),
                    n=replicates, n_paths=n * replicates)
