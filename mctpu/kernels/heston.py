"""Fused Heston Monte Carlo kernel (stochastic-volatility path walk).

Full-truncation Euler scheme (Lord et al. 2010 — the least-biased of the
simple Euler variants for the CIR variance):

    v+   = max(v, 0)
    S   *= exp((r - v+/2) dt + sqrt(v+ dt) (rho z_v + sqrt(1-rho^2) z_perp))
    v   += kappa (theta - v+) dt + xi sqrt(v+ dt) z_v

Each step consumes exactly one Box-Muller pair (``z_v``, ``z_perp``) — both
branches used, nothing discarded.  Same fused-walk architecture as the other
grid kernels: the (S, v) tiles live in registers for the whole path.
"""
from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mctpu import math as mcmath
from mctpu import rng as mcrng
from mctpu.kernels.common import (block_out_shape, block_out_spec,
                                  GRID_SEMANTICS, LANES, Plan, acc_add_n,
                                  acc_final_n, acc_init_n, chunk_sums,
                                  draw_normal_pair, interpret_arg,
                                  prng_emulation, seed_prng, walk_steps)
from mctpu.kernels.vanilla import _accum_add, _accum_final, _accum_init
from mctpu.models import heston as mheston
from mctpu.types import HestonOption

__all__ = ["make_plan", "xla_partials", "pallas_partials",
           "level_xla_partials", "level_pallas_partials",
           "greek_xla_partials", "greek_pallas_partials", "N_GREEK_SUMS"]

N_GREEK_SUMS = 14  # (sum, sum^2) for each of: payoff, delta, vega(v0),
#                    rho, d/dtheta, d/dkappa, d/dxi

# Order of the QE constant vector passed to the kernel (SMEM scalars).
_QE_KEYS = ("e", "c1", "c2", "r_dt", "k0", "k1", "k2", "k3", "k4", "theta")


def make_plan(n_paths: int, num_blocks: int, rows: int, antithetic: bool,
              dtype: str = "float32", kahan: bool = True,
              n_steps: int = 100) -> Plan:
    units = rows * LANES
    paths = units * (2 if antithetic else 1)
    return Plan.plan(n_paths, num_blocks, rows, paths, units, antithetic,
                     dtype, kahan)


def _heston_step(x, v, z_v, z_perp, k_dt, th, xi, rho_c, rho_s, r_dt, sqdt):
    """One full-truncation Euler step; returns (x_next, v_next).

    ``x`` is the carried log-spot ratio ``log(S/S_0)`` — an exact f32 sum
    of increments, like the QE scheme (and kernels/cva.py): a product of
    per-step TPU f32 exps would compound the chip's ~-1.6e-6 relative exp
    bias over the grid.  One terminal exp prices the payoff.
    """
    vp = jnp.maximum(v, 0.0)
    sq_v = jnp.sqrt(vp) * sqdt
    z_s = rho_c * z_v + rho_s * z_perp
    x = x + r_dt - 0.5 * vp * (sqdt * sqdt) + sq_v * z_s
    v = v + k_dt * (th - vp) + xi * sq_v * z_v
    return x, v


# ---------------------------------------------------------------------------
# XLA backend
# ---------------------------------------------------------------------------

def xla_partials(opt: HestonOption, key: jax.Array, block_offset, plan: Plan,
                 n_blocks: int, n_steps: int, scheme: str = "euler"):
    """Per-block partial sums, shape ``(n_blocks, 2)``.

    ``scheme``: "euler" (full truncation, O(dt) bias) or "qe" (Andersen's
    quadratic-exponential — effectively unbiased at coarse grids).
    """
    dtype = plan.jdtype
    o = opt.astype(dtype)
    dt = o.t / n_steps
    sqdt = jnp.sqrt(dt)
    k_dt = o.kappa * dt
    r_dt = o.r * dt
    rho_c = o.rho
    rho_s = jnp.sqrt(1.0 - o.rho * o.rho)
    qe_c = mheston.qe_constants(opt, n_steps, dtype) if scheme == "qe" else None
    shape = (plan.rows, LANES)

    def walk(z_seq, sgn):
        if scheme == "qe":
            def body(j, carry):
                x, v = carry
                return mheston.qe_step(x, v, sgn * z_seq[j, 0],
                                       sgn * z_seq[j, 1], qe_c,
                                       mcmath.norm_cdf)

            init = (jnp.zeros(shape, dtype), jnp.full(shape, o.v0, dtype))
            x, _ = jax.lax.fori_loop(0, n_steps, body, init)
            return jnp.maximum(o.s * jnp.exp(x) - o.k, 0.0)

        def body(j, carry):
            x, v = carry
            return _heston_step(x, v, sgn * z_seq[j, 0], sgn * z_seq[j, 1],
                                k_dt, o.theta, o.xi, rho_c, rho_s, r_dt, sqdt)

        init = (jnp.zeros(shape, dtype), jnp.full(shape, o.v0, dtype))
        x, _ = jax.lax.fori_loop(0, n_steps, body, init)
        return jnp.maximum(o.s * jnp.exp(x) - o.k, 0.0)

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (n_steps, 2) + shape, dtype)
            pay = walk(z_seq, jnp.asarray(1.0, dtype))
            if plan.antithetic:
                pay = 0.5 * (pay + walk(z_seq, jnp.asarray(-1.0, dtype)))
            cs, cs2 = chunk_sums(pay)
            return _accum_add(carry, cs, cs2, plan.kahan)

        carry = jax.lax.fori_loop(0, plan.iters, body,
                                  _accum_init(dtype, plan.kahan))
        s, s2 = _accum_final(carry, plan.kahan)
        return jnp.stack([s, s2])

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


# ---------------------------------------------------------------------------
# Pallas TPU backend
# ---------------------------------------------------------------------------

def _heston_kernel(seed_ref, off_ref, scal_ref, qe_ref, out_ref, *,
                   plan: Plan, n_steps: int, scheme: str):
    s0, k, v0 = scal_ref[0], scal_ref[1], scal_ref[2]
    k_dt, th, xi = scal_ref[3], scal_ref[4], scal_ref[5]
    rho_c, rho_s = scal_ref[6], scal_ref[7]
    r_dt, sqdt = scal_ref[8], scal_ref[9]
    qe_c = {name: qe_ref[i] for i, name in enumerate(_QE_KEYS)}
    shape = (plan.rows, LANES)
    b = pl.program_id(0)

    def walk(i, sgn):
        # Re-seed per (block, iter): antithetic mirror replays the stream.
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)

        if scheme == "qe":
            def body(j, carry):
                x, v = carry
                z_v, z_s = draw_normal_pair(shape, j)
                return mheston.qe_step(x, v, sgn * z_v, sgn * z_s, qe_c,
                                       mcmath.norm_cdf_hastings)

            init = (jnp.zeros(shape, jnp.float32),
                    jnp.full(shape, v0, jnp.float32))
            x, _ = walk_steps(n_steps, body, init)
            return jnp.maximum(s0 * jnp.exp(x) - k, 0.0)

        def body(j, carry):
            x, v = carry
            z_v, z_perp = draw_normal_pair(shape, j)
            return _heston_step(x, v, sgn * z_v, sgn * z_perp, k_dt, th, xi,
                                rho_c, rho_s, r_dt, sqdt)

        init = (jnp.zeros(shape, jnp.float32),
                jnp.full(shape, v0, jnp.float32))
        x, _ = walk_steps(n_steps, body, init)
        return jnp.maximum(s0 * jnp.exp(x) - k, 0.0)

    def body(i, carry):
        pay = walk(i, 1.0)
        if plan.antithetic:
            pay = 0.5 * (pay + walk(i, -1.0))
        cs, cs2 = chunk_sums(pay)
        return _accum_add(carry, cs, cs2, plan.kahan)

    carry = jax.lax.fori_loop(0, plan.iters, body,
                              _accum_init(jnp.float32, plan.kahan))
    s, s2 = _accum_final(carry, plan.kahan)
    out_ref[0, 0, 0] = s
    out_ref[0, 0, 1] = s2


def pallas_partials(opt: HestonOption, seed, block_offset, plan: Plan,
                    n_blocks: int, n_steps: int, interpret: bool = False,
                    scheme: str = "euler"):
    """Per-block partial sums, shape ``(n_blocks, 2)``, fused on TPU."""
    # Mosaic has no i64/f64: trace with x64 semantics off (see vanilla.py).
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        return _pallas_partials(opt, seed, block_offset, plan, n_blocks,
                                n_steps, interpret, scheme)


# ---------------------------------------------------------------------------
# Pathwise Greeks (delta, d/dv0, rho, d/dtheta, d/dkappa, d/dxi) —
# forward-mode tangents in the walk
# ---------------------------------------------------------------------------
# The call payoff is CONTINUOUS in s0 and the variance parameters (unlike
# the barrier), so pathwise differentiation of the discretized scheme is
# unbiased for that scheme's own price (Glasserman section 7.2).  The
# kernel carries FOUR forward-mode tangent pairs (d log S/dp, d v/dp) for
# p in {v0, theta, kappa, xi} alongside the Euler state.  The recursion
# coefficients are shared — per step:
#
#   vp  = max(v, 0),  m = 1{v > 0}          (full-truncation subgradient)
#   cA  = z_s * dsq - dt/2                  (one compute, four uses)
#   cB  = xi z_v * dsq - kappa dt
#   per pair p: dvp = m * av_p;  al_p += dvp cA;  av_p += dvp cB + e_p
#
# where e_p is the EXPLICIT parameter derivative of the v-update:
# e_v0 = 0 (init av = 1), e_theta = kappa dt, e_kappa = dt (theta - vp),
# e_xi = sqrt(vp dt) z_v; dsq = sqdt / (2 sqrt(vp)), guarded at vp = 0.
#
# Terminal integrands (I = 1{S_T > K}): delta = I e^x (homogeneity — no
# division), vega_p = I S_T al_p, and rho is EXACT pathwise: r enters the
# log-spot drift only, dx/dr = t, so the integrand is t K I after the
# -t*P discount fold.  All outputs are gated against CRN bumps of the
# same scheme (and delta/vega/rho against FD of the characteristic-
# function price) in tests.
#
# Variance caveat (measured): the dsq = 1/(2 sqrt(vp)) factor makes every
# variance-parameter tangent HEAVY-TAILED when the Feller condition
# 2 kappa theta >= xi^2 is violated — the discrete v's density is O(1) at
# 0+, so E[1/vp 1{vp>0}] (the tangent's second moment) is log-divergent:
# the estimator stays unbiased a.s. but its CI converges slowly and the
# reported se underestimates on short runs.  In Feller-satisfied regimes
# the tangents match CRN finite differences to 4-5 digits at 2^16 paths
# (tests/test_greeks.py::test_variance_tangents_match_crn_bumps).


def _greek_step(x, v, tg, z_v, z_perp, k_dt, th, xi, rho_c, rho_s,
                r_dt, sqdt, half_dt, dt):
    """One Euler step advancing state AND the four (d/dp) tangent pairs.

    ``tg`` is the tangent tuple ``(al_v0, av_v0, al_th, av_th, al_ka,
    av_ka, al_xi, av_xi)``.
    """
    vp = jnp.maximum(v, 0.0)
    sq = jnp.sqrt(vp)
    sq_v = sq * sqdt
    dsq = jnp.where(vp > 0.0, (0.5 * sqdt) * jax.lax.rsqrt(vp), 0.0)
    m = v > 0.0
    z_s = rho_c * z_v + rho_s * z_perp
    x = x + r_dt - half_dt * vp + sq_v * z_s
    c_a = z_s * dsq - half_dt
    c_b = xi * dsq * z_v - k_dt
    extras = (0.0, k_dt, dt * (th - vp), sq_v * z_v)
    out = []
    for i, e in enumerate(extras):
        al, av = tg[2 * i], tg[2 * i + 1]
        dvp = jnp.where(m, av, 0.0)
        out.append(al + dvp * c_a)
        out.append(av + dvp * c_b + e)
    v = v + k_dt * (th - vp) + xi * sq_v * z_v
    return x, v, tuple(out)


def _greek_quants(x, tg, s0, k, t_k):
    """(p, gd, gv0, gr, gth, gka, gxi) integrand tiles; ``t_k = t * K``
    (rho integrand)."""
    e_x = jnp.exp(x)
    st = s0 * e_x
    ind = jnp.where(st > k, 1.0, 0.0)
    p = jnp.maximum(st - k, 0.0)
    ist = ind * st
    return (p, ind * e_x, ist * tg[0], t_k * ind,
            ist * tg[2], ist * tg[4], ist * tg[6])


def _greek_sums(tiles):
    out = []
    for q in tiles:
        out.append(jnp.sum(q))
        out.append(jnp.sum(q * q))
    return tuple(out)


def _greek_tangent_init(shape, dtype):
    zero = jnp.zeros(shape, dtype)
    return (zero, jnp.ones(shape, dtype),  # (al, av) for v0
            zero, zero, zero, zero, zero, zero)  # theta, kappa, xi


def greek_xla_partials(opt: HestonOption, key: jax.Array, block_offset,
                       plan: Plan, n_blocks: int, n_steps: int):
    """Per-block Greek partials ``(n_blocks, 14)``: payoff/delta/vega(v0)/
    rho/dtheta/dkappa/dxi (sum, sum^2) pairs — ``N_GREEK_SUMS`` columns.
    Euler scheme only."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    dt = o.t / n_steps
    sqdt = jnp.sqrt(dt)
    k_dt = o.kappa * dt
    r_dt = o.r * dt
    half_dt = 0.5 * dt
    rho_c = o.rho
    rho_s = jnp.sqrt(1.0 - o.rho * o.rho)
    t_k = o.t * o.k
    shape = (plan.rows, LANES)

    def walk(z_seq, sgn):
        def body(j, carry):
            x, v, tg = carry
            return _greek_step(x, v, tg, sgn * z_seq[j, 0],
                               sgn * z_seq[j, 1], k_dt, o.theta, o.xi,
                               rho_c, rho_s, r_dt, sqdt, half_dt, dt)

        init = (jnp.zeros(shape, dtype), jnp.full(shape, o.v0, dtype),
                _greek_tangent_init(shape, dtype))
        x, _, tg = jax.lax.fori_loop(0, n_steps, body, init)
        return _greek_quants(x, tg, o.s, o.k, t_k)

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (n_steps, 2) + shape, dtype)
            tiles = walk(z_seq, jnp.asarray(1.0, dtype))
            if plan.antithetic:
                m = walk(z_seq, jnp.asarray(-1.0, dtype))
                tiles = tuple(0.5 * (a + b) for a, b in zip(tiles, m))
            return acc_add_n(carry, _greek_sums(tiles), plan.kahan)

        carry = jax.lax.fori_loop(
            0, plan.iters, body, acc_init_n(N_GREEK_SUMS, dtype, plan.kahan))
        return jnp.stack(acc_final_n(carry, plan.kahan))

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


def _heston_greeks_kernel(seed_ref, off_ref, scal_ref, out_ref, *,
                          plan: Plan, n_steps: int):
    s0, k, v0 = scal_ref[0], scal_ref[1], scal_ref[2]
    k_dt, th, xi = scal_ref[3], scal_ref[4], scal_ref[5]
    rho_c, rho_s = scal_ref[6], scal_ref[7]
    r_dt, sqdt = scal_ref[8], scal_ref[9]
    half_dt, t_k, dt = scal_ref[10], scal_ref[11], scal_ref[12]
    shape = (plan.rows, LANES)
    b = pl.program_id(0)

    def walk(i, sgn):
        # Re-seed per (block, iter): antithetic mirror replays the stream.
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)

        def body(j, carry):
            x, v, tg = carry
            z_v, z_perp = draw_normal_pair(shape, j)
            return _greek_step(x, v, tg, sgn * z_v, sgn * z_perp,
                               k_dt, th, xi, rho_c, rho_s, r_dt, sqdt,
                               half_dt, dt)

        init = (jnp.zeros(shape, jnp.float32),
                jnp.full(shape, v0, jnp.float32),
                _greek_tangent_init(shape, jnp.float32))
        x, _, tg = walk_steps(n_steps, body, init)
        return _greek_quants(x, tg, s0, k, t_k)

    def body(i, carry):
        tiles = walk(i, 1.0)
        if plan.antithetic:
            m = walk(i, -1.0)
            tiles = tuple(0.5 * (a + b) for a, b in zip(tiles, m))
        return acc_add_n(carry, _greek_sums(tiles), plan.kahan)

    carry = jax.lax.fori_loop(
        0, plan.iters, body,
        acc_init_n(N_GREEK_SUMS, jnp.float32, plan.kahan))
    sums = acc_final_n(carry, plan.kahan)
    for j, sj in enumerate(sums):
        out_ref[0, 0, j] = sj


def greek_pallas_partials(opt: HestonOption, seed, block_offset, plan: Plan,
                          n_blocks: int, n_steps: int,
                          interpret: bool = False):
    """Per-block Greek partials ``(n_blocks, 14)``, fused on TPU."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        o = opt.astype(jnp.float32)
        dt = o.t / n_steps
        scal = jnp.stack([
            o.s, o.k, o.v0,
            o.kappa * dt, o.theta, o.xi,
            o.rho, jnp.sqrt(1.0 - o.rho * o.rho),
            o.r * dt, jnp.sqrt(dt),
            0.5 * dt, o.t * o.k, dt,
        ])
        kernel = functools.partial(_heston_greeks_kernel, plan=plan,
                                   n_steps=n_steps)
        paths_iter = plan.rows * LANES * (2 if plan.antithetic else 1)
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
            out_specs=block_out_spec(N_GREEK_SUMS),
            out_shape=block_out_shape(n_blocks, N_GREEK_SUMS),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=GRID_SEMANTICS,
            ),
            cost_estimate=pl.CostEstimate(
                flops=42 * plan.iters * paths_iter * n_steps,
                bytes_accessed=n_blocks * 4 * N_GREEK_SUMS,
                transcendentals=7 * plan.iters * paths_iter * n_steps,
            ),
            interpret=interpret_arg(interpret),
        )(jnp.atleast_1d(jnp.asarray(seed, jnp.int32)),
          jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32)), scal).reshape(n_blocks, N_GREEK_SUMS)


# ---------------------------------------------------------------------------
# MLMC coupled-level kernels (Giles 2008)
# ---------------------------------------------------------------------------
# Level l >= 1 of the multilevel estimator simulates COUPLED fine/coarse
# Euler walks from the same Brownian increments: two fine steps consume two
# normal pairs, the matching coarse step consumes their sum scaled to unit
# variance (dW_c = dW_f1 + dW_f2  ->  z_c = (z1 + z2)/sqrt(2)).  The level
# sample is the payoff DIFFERENCE d = P_fine - P_coarse, whose variance
# decays with level so deep levels need few paths.  Level 0 is the plain
# n0-step walk — exactly `pallas_partials(..., n_steps=n0)`.

_INV_SQRT2 = 0.7071067811865476


def _level_constants(o, n_fine: int):
    """Fine/coarse per-step scalars of the coupled Euler walk."""
    dt_f = o.t / n_fine
    dt_c = 2.0 * dt_f
    return (o.kappa * dt_f, o.r * dt_f, jnp.sqrt(dt_f),
            o.kappa * dt_c, o.r * dt_c, jnp.sqrt(dt_c))


def _coupled_walk(shape, n_coarse: int, draw, consts, v0, theta, xi, rho_c,
                  rho_s, sgn):
    """Run the coupled fine/coarse walk; returns (x_fine, x_coarse).

    ``draw(j) -> (z1v, z1p, z2v, z2p)`` supplies the two normal pairs of
    coarse step ``j`` (hardware PRNG in the kernel, ``z_seq`` rows in the
    XLA twin); ``sgn`` mirrors all increments for antithetic pairs.
    """
    k_dt_f, r_dt_f, sq_f, k_dt_c, r_dt_c, sq_c = consts
    inv = jnp.float32(_INV_SQRT2)

    def body(j, st):
        xf, vf, xc, vc = st
        z1v, z1p, z2v, z2p = draw(j)
        xf, vf = _heston_step(xf, vf, sgn * z1v, sgn * z1p, k_dt_f, theta,
                              xi, rho_c, rho_s, r_dt_f, sq_f)
        xf, vf = _heston_step(xf, vf, sgn * z2v, sgn * z2p, k_dt_f, theta,
                              xi, rho_c, rho_s, r_dt_f, sq_f)
        zcv = (z1v + z2v) * inv
        zcp = (z1p + z2p) * inv
        xc, vc = _heston_step(xc, vc, sgn * zcv, sgn * zcp, k_dt_c, theta,
                              xi, rho_c, rho_s, r_dt_c, sq_c)
        return (xf, vf, xc, vc)

    zero = jnp.zeros(shape, jnp.float32)
    vini = jnp.full(shape, v0, jnp.float32)
    xf, _, xc, _ = walk_steps(n_coarse, body, (zero, vini, zero, vini))
    return xf, xc


def level_xla_partials(opt: HestonOption, key: jax.Array, block_offset,
                       plan: Plan, n_blocks: int, n0: int, level: int):
    """Per-block (sum_d, sum_d2) of the level-``level`` correction,
    shape ``(n_blocks, 2)``.  ``level >= 1`` (level 0 = ``xla_partials``
    with ``n_steps = n0``)."""
    assert level >= 1
    dtype = plan.jdtype
    o = opt.astype(jnp.float32)
    n_fine = n0 * (2 ** level)
    n_coarse = n_fine // 2
    consts = _level_constants(o, n_fine)
    rho_s = jnp.sqrt(1.0 - o.rho * o.rho)
    shape = (plan.rows, LANES)

    def walk(z_seq, sgn):
        draw = lambda j: (z_seq[j, 0], z_seq[j, 1], z_seq[j, 2], z_seq[j, 3])
        xf, xc = _coupled_walk(shape, n_coarse, draw, consts, o.v0, o.theta,
                               o.xi, o.rho, rho_s, sgn)
        pay = lambda x: jnp.maximum(o.s * jnp.exp(x) - o.k, 0.0)
        return pay(xf) - pay(xc)

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (n_coarse, 4) + shape,
                                      jnp.float32)
            d = walk(z_seq, jnp.float32(1.0))
            if plan.antithetic:
                d = 0.5 * (d + walk(z_seq, jnp.float32(-1.0)))
            d = jnp.asarray(d, dtype)
            cs, cs2 = chunk_sums(d)
            return _accum_add(carry, cs, cs2, plan.kahan)

        carry = jax.lax.fori_loop(0, plan.iters, body,
                                  _accum_init(dtype, plan.kahan))
        s, s2 = _accum_final(carry, plan.kahan)
        return jnp.stack([s, s2])

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


def _level_kernel(seed_ref, off_ref, scal_ref, out_ref, *, plan: Plan,
                  n_coarse: int):
    s0, k, v0 = scal_ref[0], scal_ref[1], scal_ref[2]
    theta, xi, rho_c, rho_s = (scal_ref[3], scal_ref[4], scal_ref[5],
                               scal_ref[6])
    consts = (scal_ref[7], scal_ref[8], scal_ref[9], scal_ref[10],
              scal_ref[11], scal_ref[12])
    shape = (plan.rows, LANES)
    b = pl.program_id(0)

    def walk(i, sgn):
        # Re-seed per (block, iter): antithetic mirror replays the stream.
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)

        def draw(j):
            z1v, z1p = draw_normal_pair(shape, 2 * j)
            z2v, z2p = draw_normal_pair(shape, 2 * j + 1)
            return z1v, z1p, z2v, z2p

        xf, xc = _coupled_walk(shape, n_coarse, draw, consts, v0, theta,
                               xi, rho_c, rho_s, sgn)
        pay = lambda x: jnp.maximum(s0 * jnp.exp(x) - k, 0.0)
        return pay(xf) - pay(xc)

    def body(i, carry):
        d = walk(i, 1.0)
        if plan.antithetic:
            d = 0.5 * (d + walk(i, -1.0))
        cs, cs2 = chunk_sums(d)
        return _accum_add(carry, cs, cs2, plan.kahan)

    carry = jax.lax.fori_loop(0, plan.iters, body,
                              _accum_init(jnp.float32, plan.kahan))
    s, s2 = _accum_final(carry, plan.kahan)
    out_ref[0, 0, 0] = s
    out_ref[0, 0, 1] = s2


def level_pallas_partials(opt: HestonOption, seed, block_offset, plan: Plan,
                          n_blocks: int, n0: int, level: int,
                          interpret: bool = False):
    """Per-block MLMC level-correction sums ``(n_blocks, 2)`` on TPU."""
    assert level >= 1
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        o = opt.astype(jnp.float32)
        n_fine = n0 * (2 ** level)
        n_coarse = n_fine // 2
        consts = _level_constants(o, n_fine)
        scal = jnp.stack([o.s, o.k, o.v0, o.theta, o.xi, o.rho,
                          jnp.sqrt(1.0 - o.rho * o.rho), *consts])
        kernel = functools.partial(_level_kernel, plan=plan,
                                   n_coarse=n_coarse)
        paths_iter = plan.rows * LANES * (2 if plan.antithetic else 1)
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
            out_specs=block_out_spec(2),
            out_shape=block_out_shape(n_blocks, 2),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=GRID_SEMANTICS,
            ),
            cost_estimate=pl.CostEstimate(
                flops=3 * 14 * plan.iters * paths_iter * n_coarse,
                bytes_accessed=n_blocks * 8,
                transcendentals=3 * 6 * plan.iters * paths_iter * n_coarse,
            ),
            interpret=interpret_arg(interpret),
        )(jnp.atleast_1d(jnp.asarray(seed, jnp.int32)),
          jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32)), scal).reshape(n_blocks, 2)


def _pallas_partials(opt, seed, block_offset, plan, n_blocks, n_steps,
                     interpret, scheme="euler"):
    o = opt.astype(jnp.float32)
    dt = o.t / n_steps
    scal = jnp.stack([
        o.s, o.k, o.v0,
        o.kappa * dt, o.theta, o.xi,
        o.rho, jnp.sqrt(1.0 - o.rho * o.rho),
        o.r * dt, jnp.sqrt(dt),
    ])
    if scheme == "qe":
        qe_c = mheston.qe_constants(opt, n_steps, jnp.float32)
        qe = jnp.stack([jnp.asarray(qe_c[name], jnp.float32)
                        for name in _QE_KEYS])
    else:
        # Euler never reads these; don't compute them (kappa or xi may be
        # 0, which would bake NaN/inf into a dead operand) and ship zeros.
        qe = jnp.zeros((len(_QE_KEYS),), jnp.float32)
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))

    kernel = functools.partial(_heston_kernel, plan=plan, n_steps=n_steps,
                               scheme=scheme)
    paths_iter = plan.rows * LANES * (2 if plan.antithetic else 1)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=block_out_spec(2),
        out_shape=block_out_shape(n_blocks, 2),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=GRID_SEMANTICS,
        ),
        cost_estimate=pl.CostEstimate(
            flops=14 * plan.iters * paths_iter * n_steps,
            bytes_accessed=n_blocks * 8,
            transcendentals=6 * plan.iters * paths_iter * n_steps,
        ),
        interpret=interpret_arg(interpret),
    )(seed_arr, off_arr, scal, qe).reshape(n_blocks, 2)
