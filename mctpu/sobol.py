"""Sobol low-discrepancy sequences (digital (t,s)-nets) in pure JAX.

Second QMC family next to the lattice rules of :mod:`mctpu.qmc` — Sobol nets
keep their equidistribution under *any* power-of-two sample count and extend
to high dimension (2048 dims bundled — enough for 252-obs variance-swap
years, 500-node CVA grids and 1000-asset baskets; the classic Joe-Kuo
benchmark count is 1111), making them the default RQMC choice.

Construction: the classic gray-code XOR form, fully vectorized for the VPU —
``x_i = XOR_{b set in gray(i)} v_b`` over the 30-bit Joe-Kuo direction
numbers (data asset ``mctpu/data/sobol_directions_2048x30.npy``, regenerable
via ``tools/gen_sobol_directions.py``; parity-checked against scipy's
independent implementation at high dims in ``tests/test_sobol.py``).  Randomization is a per-replicate
digital shift (XOR with uniform bits), which preserves the net structure and
gives unbiased replicate estimates with an honest CI — same estimator
contract as the lattice module.
"""
from __future__ import annotations

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from mctpu import math as mcmath
from mctpu.models import basket as mbasket
from mctpu.types import BasketOption, McResult, VanillaOption

__all__ = ["sobol_points", "price_vanilla_sobol", "price_basket_sobol",
           "price_asian_sobol", "bridge_paths", "brownian_bridge_plan",
           "MAX_DIM"]

_DATA = Path(__file__).resolve().parent / "data" / "sobol_directions_2048x30.npy"
_BITS = 30
MAX_DIM = 2048


@functools.lru_cache(maxsize=1)
def _directions() -> np.ndarray:
    return np.load(_DATA)  # (MAX_DIM, 30) uint32


def sobol_points(n: int, dim: int, shift_bits: jax.Array | None = None,
                 dtype=jnp.float32):
    """First ``n`` Sobol points in ``dim`` dimensions, shape ``(n, dim)``.

    ``shift_bits`` (optional, ``(dim,)`` uint32) applies a digital shift.
    Matches ``torch.quasirandom.SobolEngine`` exactly when unshifted.
    """
    if dim > MAX_DIM:
        raise ValueError(f"sobol supports up to {MAX_DIM} dims, got {dim}")
    v = jnp.asarray(_directions()[:dim], jnp.uint32)  # (dim, 30)
    i = jnp.arange(n, dtype=jnp.uint32)
    gray = i ^ (i >> 1)

    def body(b, acc):
        mask = ((gray >> b) & 1).astype(bool)[:, None]
        return acc ^ jnp.where(mask, v[None, :, b], jnp.uint32(0))

    acc = jax.lax.fori_loop(0, _BITS, body,
                            jnp.zeros((n, dim), jnp.uint32))
    if shift_bits is not None:
        acc = acc ^ (jnp.asarray(shift_bits, jnp.uint32)[None, :]
                     >> jnp.uint32(32 - _BITS))
    # Convert at the requested dtype: values live in [0, 1) where dtype
    # resolution is the binding limit anyway (requesting f64 with x64 off
    # would only emit a downgrade warning, not extra precision).
    return acc.astype(dtype) * jnp.asarray(1.0 / (1 << _BITS), dtype)


def _replicate_estimate(values):
    r = values.shape[0]
    mean = jnp.mean(values)
    se = jnp.std(values, ddof=1) / jnp.sqrt(r * 1.0)
    return mean, se


def _replicate_result(sums, n: int, replicates: int, discount) -> McResult:
    """McResult from per-replicate undiscounted (sum, sum2) rows.

    Price/CI from the replicate spread (RQMC randomization CI);
    ``sum_p``/``sum_p2`` are genuine undiscounted accumulator sums (the
    McResult contract — advisor finding r2), with ``n`` = replicates (the
    i.i.d. unit) and ``n_paths`` the total point count.
    """
    sums_p, sums_p2 = sums
    mean, se = _replicate_estimate(discount * sums_p / n)
    return McResult(price=mean, ci=1.96 * se, std_error=se,
                    sum_p=jnp.sum(sums_p), sum_p2=jnp.sum(sums_p2),
                    n=replicates, n_paths=n * replicates)


def _clip_ndtri(u, dtype):
    from jax.scipy.special import ndtri
    eps = jnp.asarray(1e-7, dtype)
    return ndtri(jnp.clip(u, eps, 1 - eps))


@functools.partial(jax.jit, static_argnames=("n", "replicates"))
def _vanilla_sobol(s, k, r, v, t, key, n: int, replicates: int):
    dtype = mcmath.wide_dtype()
    shifts = jax.random.bits(key, (replicates, 1), dtype=jnp.uint32)
    mu = (r - 0.5 * v * v) * t
    sig = v * jnp.sqrt(t)

    def one(shift):
        z = _clip_ndtri(sobol_points(n, 1, shift, dtype)[:, 0], dtype)
        pay = jnp.maximum(s * jnp.exp(mu + sig * z) - k, 0.0)
        return jnp.sum(pay), jnp.sum(pay * pay)

    return jax.vmap(one)(shifts), jnp.exp(-r * t)


def price_vanilla_sobol(opt: VanillaOption, n_points: int, key: jax.Array,
                        replicates: int = 16) -> McResult:
    """Sobol-RQMC European call price (digital-shift replicates for the CI)."""
    dtype = mcmath.wide_dtype()
    sums, disc = _vanilla_sobol(
        jnp.asarray(opt.s, dtype), jnp.asarray(opt.k, dtype),
        jnp.asarray(opt.r, dtype), jnp.asarray(opt.v, dtype),
        jnp.asarray(opt.t, dtype), key, n_points, replicates)
    return _replicate_result(sums, n_points, replicates, disc)


@functools.partial(jax.jit, static_argnames=("n", "dim", "replicates"))
def _basket_sobol(opt: BasketOption, chol, key, n: int, dim: int,
                  replicates: int):
    dtype = mcmath.wide_dtype()
    shifts = jax.random.bits(key, (replicates, dim), dtype=jnp.uint32)

    def one(shift):
        z = _clip_ndtri(sobol_points(n, dim, shift, dtype), dtype)
        pay = mbasket.terminal_payoff(opt, chol, z)
        return jnp.sum(pay), jnp.sum(pay * pay)

    return jax.vmap(one)(shifts), jnp.exp(-opt.r * opt.t)


def price_basket_sobol(opt: BasketOption, n_points: int, key: jax.Array,
                       replicates: int = 16) -> McResult:
    """Sobol-RQMC basket call price (net dimension = n_assets, <= 2048)."""
    dtype = mcmath.wide_dtype()
    o = opt.astype(dtype)
    chol = mcmath.cholesky_lower(jnp.asarray(o.corr, dtype))
    sums, disc = _basket_sobol(o, chol, key, n_points, opt.n_assets,
                               replicates)
    return _replicate_result(sums, n_points, replicates, disc)


# ---------------------------------------------------------------------------
# Brownian-bridge path construction (QMC for path-dependent payoffs)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def brownian_bridge_plan(m: int):
    """Bisection order and coefficients for a Brownian bridge over m uniform
    steps (Glasserman §3.1): draw k fills time index ``out[k]`` as

        W_out = ca * W_left + cb * W_right + sd * z_k

    with ``left = -1`` meaning the t=0 anchor (W=0).  Draw 0 is the terminal
    point.  The bridge maps the best (lowest) Sobol dimensions to the
    largest-variance components of the path — the standard trick that keeps
    the effective dimension low for path-dependent payoffs.
    Times are in units of the step (t_j = j+1 for index j); coefficients are
    scale-free except ``sd`` which is in sqrt(step) units.
    """
    left = np.zeros(m, np.int32)
    right = np.zeros(m, np.int32)
    out = np.zeros(m, np.int32)
    ca = np.zeros(m)
    cb = np.zeros(m)
    sd = np.zeros(m)
    # draw 0: terminal W at time m (index m-1), unconditional.
    out[0] = m - 1
    left[0] = -1
    right[0] = -1
    ca[0] = 0.0
    cb[0] = 0.0
    sd[0] = np.sqrt(m)
    # Bisect intervals (a, b) with W known at time-index a and b (a may be
    # the -1 anchor at t=0).
    queue = [(-1, m - 1)]
    k = 1
    while queue:
        a, b = queue.pop(0)
        if b - a < 2:
            continue
        c = (a + b + 1) // 2
        ta, tc, tb = a + 1.0, c + 1.0, b + 1.0  # times in step units
        out[k] = c
        left[k] = a
        right[k] = b
        ca[k] = (tb - tc) / (tb - ta)
        cb[k] = (tc - ta) / (tb - ta)
        sd[k] = np.sqrt((tc - ta) * (tb - tc) / (tb - ta))
        k += 1
        queue.append((a, c))
        queue.append((c, b))
    assert k == m, (k, m)
    return left, right, out, ca, cb, sd


def bridge_paths(z, t_total, dtype):
    """Brownian motion W at m uniform times from normals ``z (n, m)``.

    Returns ``w (m, n)`` with ``Cov[W_i, W_j] = min(t_i, t_j)``,
    ``t_j = (j+1) t_total / m``; draw order follows
    :func:`brownian_bridge_plan` so ``z[:, 0]`` (the best Sobol dim) drives
    the terminal point.
    """
    n, m = z.shape
    left, right, out, ca, cb, sd = brownian_bridge_plan(m)
    step_scale = jnp.sqrt(jnp.asarray(t_total, dtype) / m)
    w = [None] * m
    w[int(out[0])] = jnp.asarray(sd[0], dtype) * step_scale * z[:, 0]
    for k in range(1, m):
        wa = 0.0 if left[k] < 0 else w[int(left[k])]
        wb = w[int(right[k])]
        w[int(out[k])] = (jnp.asarray(ca[k], dtype) * wa
                          + jnp.asarray(cb[k], dtype) * wb
                          + jnp.asarray(sd[k], dtype) * step_scale
                          * z[:, k])
    return jnp.stack(w)


@functools.partial(jax.jit, static_argnames=("n", "n_obs", "geometric",
                                             "replicates"))
def _asian_sobol(s, k, r, v, t, key, n: int, n_obs: int, geometric: bool,
                 replicates: int):
    dtype = mcmath.wide_dtype()
    shifts = jax.random.bits(key, (replicates, n_obs), dtype=jnp.uint32)
    t_j = jnp.asarray(t, dtype) * jnp.arange(1, n_obs + 1, dtype=dtype) / n_obs

    def one(shift):
        z = _clip_ndtri(sobol_points(n, n_obs, shift, dtype), dtype)
        w = bridge_paths(z, t, dtype)  # (n_obs, n)
        log_s = jnp.log(s) + (r - 0.5 * v * v) * t_j[:, None] + v * w
        if geometric:
            avg = jnp.exp(jnp.mean(log_s, axis=0))
        else:
            avg = jnp.mean(jnp.exp(log_s), axis=0)
        pay = jnp.maximum(avg - k, 0.0)
        return jnp.sum(pay), jnp.sum(pay * pay)

    return jax.vmap(one)(shifts), jnp.exp(-r * t)


def price_asian_sobol(opt, n_points: int, key: jax.Array,
                      replicates: int = 16) -> McResult:
    """Sobol-RQMC Asian call via Brownian-bridge path construction.

    The bridge assigns the lowest Sobol dimensions to the coarsest path
    structure (terminal, then midpoints), keeping the integrand's effective
    dimension low — the standard recipe for QMC on path-dependent payoffs
    (net dimension = ``n_obs``, up to 2048 — a 252-obs daily year included).
    """
    opt.validate()
    if opt.n_obs > MAX_DIM:
        raise ValueError(f"sobol asian supports n_obs <= {MAX_DIM}")
    dtype = mcmath.wide_dtype()
    sums, disc = _asian_sobol(
        jnp.asarray(opt.s, dtype), jnp.asarray(opt.k, dtype),
        jnp.asarray(opt.r, dtype), jnp.asarray(opt.v, dtype),
        jnp.asarray(opt.t, dtype), key, n_points, opt.n_obs,
        opt.average == "geometric", replicates)
    return _replicate_result(sums, n_points, replicates, disc)
