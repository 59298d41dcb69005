"""Fused Asian-option Monte Carlo kernel (running average over the path).

Same on-chip walk skeleton as the CVA kernel (``mctpu/kernels/cva.py``): a
``fori_loop`` over the observation grid carries the spot tile and the running
(log-)sum in registers; the payoff evaluates once at the end.  New product
family beyond the reference.
"""
from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mctpu import rng as mcrng
from mctpu.kernels.common import (block_out_shape, block_out_spec,
                                  GRID_SEMANTICS, LANES, Plan, acc_add_n,
                                  acc_final_n, acc_init_n, chunk_sums,
                                  draw_normal_pair, interpret_arg,
                                  prng_emulation, seed_prng, walk_pairwise, walk_steps)
from mctpu.kernels.vanilla import _accum_add, _accum_final, _accum_init
from mctpu.models import asian as masian
from mctpu.types import AsianOption

__all__ = ["make_plan", "xla_partials", "pallas_partials",
           "greek_xla_partials", "greek_pallas_partials", "N_GREEK_SUMS"]

N_GREEK_SUMS = 10  # (sum, sum^2) for each of: payoff, delta, vega, rho,
#                    gamma


def make_plan(n_paths: int, num_blocks: int, rows: int, antithetic: bool,
              dtype: str = "float32", kahan: bool = True) -> Plan:
    units = rows * LANES
    paths = units * (2 if antithetic else 1)
    return Plan.plan(n_paths, num_blocks, rows, paths, units, antithetic, dtype, kahan)


def _payoff_from_avg(acc, k, n_obs: int, geometric: bool):
    avg = acc / n_obs
    if geometric:
        avg = jnp.exp(avg)
    return jnp.maximum(avg - k, 0.0)


# ---------------------------------------------------------------------------
# XLA backend
# ---------------------------------------------------------------------------

def xla_partials(opt: AsianOption, key: jax.Array, block_offset, plan: Plan,
                 n_blocks: int):
    """Per-block partial sums, shape ``(n_blocks, 2)``."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    g = opt.n_obs
    geometric = opt.average == "geometric"
    drift, vol = masian.step_constants(o, dtype)
    shape = (plan.rows, LANES)

    log_s0 = jnp.log(jnp.asarray(o.s, dtype))

    def walk(z_seq, sgn):
        def body(j, carry):
            # Log-space walk (see kernels/cva.py): exact f32 sum carry;
            # geometric averaging needs NO transcendental per step at all
            # (the average of log-spots is the accumulator), arithmetic
            # pays one non-compounding exp per observation.
            log_s, acc = carry
            log_s = log_s + drift + vol * (sgn * z_seq[j])
            acc = acc + (log_s if geometric else jnp.exp(log_s))
            return (log_s, acc)

        init = (jnp.full(shape, log_s0, dtype), jnp.zeros(shape, dtype))
        _, acc = jax.lax.fori_loop(0, g, body, init)
        return _payoff_from_avg(acc, o.k, g, geometric)

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (g,) + shape, dtype)
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
# Pathwise Greeks (delta, vega) — the log-space walk gives them nearly free
# ---------------------------------------------------------------------------
# Under exact GBM sampling, log s_j = log s0 + (r - v^2/2) t_j + v W_j, so
#
#     d(log s_j)/dv = W_j - v t_j = (log_rel_j - r t_j - v^2 t_j / 2) / v
#                   = log_rel_j * (1/v) + c1 * j,   c1 = -(r + v^2/2) dt / v
#
# — recoverable from the CARRIED log-spot with one FMA per step, no extra
# Brownian bookkeeping.  Then (with I = 1{avg > k}):
#
#     arithmetic: d(avg)/ds0 = avg/s0,  d(avg)/dv = (1/n) sum_j s_j f_j
#     geometric:  d(avg)/ds0 = avg/s0,  d(avg)/dv = avg * (1/n) sum_j f_j
#
# and the pathwise Greeks are gd = I*avg/s0, gv = I*d(avg)/dv (unbiased:
# the payoff kink has measure zero — Glasserman section 7.2).  Gated in
# tests/test_greeks.py against jax.grad of the exact geometric closed form
# and CRN bumps for the arithmetic average.


def _greek_quants(log_s0, s0, k, n_obs, geometric, t, tbar, zc0, ivst,
                  log_s, avg_acc, g_acc, r_acc, r2_acc):
    """(p, gd, gv, gr, gg) integrand tiles from the walk accumulators.

    ``gr`` folds the ``-t * P`` discount cross-term into the per-path
    integrand (like the vanilla kernel's rho), so
    ``rho = e^{-rt} * E[gr]`` carries an honest independent CI.
    ``d(s_j)/dr = s_j t_j``: geometric averaging gives
    ``d(avg)/dr = avg * tbar`` with the CONSTANT ``tbar = mean_j t_j`` —
    no extra accumulator; arithmetic uses the carried
    ``r_acc = sum_j s_j t_j``.

    ``gg`` is the mixed pathwise-LR GAMMA integrand.  The payoff's second
    s0-derivative is a Dirac on {avg = K}; Stein's identity along the
    standardized TOTAL normal ``z = (log(s_T/s0) - (r - v^2/2)T)/(v
    sqrt(T))`` (uniform Brownian tilt, ``d log s_j / dz = v t_j /
    sqrt(T)``) converts it to sampleable form.  With ``h = Abar^2 /
    (dA/dz)`` (``Abar = avg/s0``):

        Gamma = E[h 1{avg>K} z] - E[(dh/dz) 1{avg>K}]

    — arithmetic needs ``dA/dz = (v/sqrt(T)) r_acc/n`` (carried) and
    ``d(r_acc/n)/dz = (v/sqrt(T)) r2_acc/n`` (one NEW carry, sum s_j
    t_j^2); the geometric ratio collapses to constants: ``gg = I
    (avg/s0^2) ((sqrt(T)/(v tbar)) z - 1)``.  ``h`` is well-conditioned:
    ``r_acc/n >= t_1 avg`` bounds it by ``n avg sqrt(T)/(v T s0^2)``.
    In the n_obs = 1 limit the arithmetic form reduces to
    ``I (s_T/s0^2)(z/(v sqrt(T)) - 1)`` — an alternate
    integration-by-parts grouping of the vanilla kernel's
    ``I K z/(s0^2 v sqrt(T))``, equal in expectation (both are
    d/ds0 E[I s_T/s0]).
    """
    inv_n = 1.0 / n_obs
    avg = avg_acc * inv_n
    if geometric:
        avg = jnp.exp(avg)
    ind = jnp.where(avg > k, 1.0, 0.0)
    p = jnp.maximum(avg - k, 0.0)
    gd = ind * avg / s0
    gv = ind * ((avg * g_acc * inv_n) if geometric else (g_acc * inv_n))
    davg_dr = (avg * tbar) if geometric else (r_acc * inv_n)
    gr = ind * davg_dr - t * p
    z = (log_s - log_s0 - zc0) * ivst
    sqt_v = t * ivst  # sqrt(T)/v
    inv_s02 = 1.0 / (s0 * s0)
    if geometric:
        gg = ind * (avg * inv_s02) * ((sqt_v / tbar) * z - 1.0)
    else:
        m = r_acc * inv_n
        r2n = r2_acc * inv_n
        h = sqt_v * (avg * avg) * inv_s02 / m
        dh = inv_s02 * (2.0 * avg - (avg * avg) * r2n / (m * m))
        gg = ind * (h * z - dh)
    return p, gd, gv, gr, gg


def _greek_step(log_s0, drift, vol, inv_v, c1, dt, geometric):
    """Walk step advancing (log_s, avg_acc, g_acc, r_acc, r2_acc, cj, tj).

    ``cj``/``tj`` carry ``c1 * (j+1)`` / ``t_j`` as running scalar sums —
    TPUs have no fast int->float cast, so deriving them from the loop
    counter would put a scalar conversion on every step's critical path.
    """
    def step(j, z, carry, sgn):
        log_s, acc, gacc, racc, r2acc, cj, tj = carry
        log_s = log_s + drift + vol * (sgn * z)
        f = (log_s - log_s0) * inv_v + cj
        if geometric:
            # racc/r2acc unused (d(avg)/dr and the gamma ratio collapse
            # to the constant tbar).
            return (log_s, acc + log_s, gacc + f, racc, r2acc,
                    cj + c1, tj)
        s = jnp.exp(log_s)
        st = s * tj
        return (log_s, acc + s, gacc + s * f, racc + st, r2acc + st * tj,
                cj + c1, tj + dt)

    return step


def _greek_sums(tiles):
    out = []
    for q in tiles:
        out.append(jnp.sum(q))
        out.append(jnp.sum(q * q))
    return tuple(out)


def greek_xla_partials(opt: AsianOption, key: jax.Array, block_offset,
                       plan: Plan, n_blocks: int):
    """Per-block Greek partials ``(n_blocks, 10)``: payoff/delta/vega/rho/
    gamma (sum, sum^2) pairs — ``N_GREEK_SUMS`` columns."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    g = opt.n_obs
    geometric = opt.average == "geometric"
    drift, vol = masian.step_constants(o, dtype)
    t = jnp.asarray(o.t, dtype)
    dt = t / g
    inv_v = 1.0 / jnp.asarray(o.v, dtype)
    c1 = -(o.r + 0.5 * o.v * o.v) * dt * inv_v
    log_s0 = jnp.log(jnp.asarray(o.s, dtype))
    shape = (plan.rows, LANES)
    tbar = dt * (g + 1) / 2.0
    zc0 = (o.r - 0.5 * o.v * o.v) * t
    ivst = 1.0 / (jnp.asarray(o.v, dtype) * jnp.sqrt(t))
    step = _greek_step(log_s0, drift, vol, inv_v, c1, dt, geometric)

    def walk(z_seq, sgn):
        def body(j, carry):
            return step(j, z_seq[j], carry, sgn)

        init = (jnp.full(shape, log_s0, dtype), jnp.zeros(shape, dtype),
                jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                jnp.zeros(shape, dtype), c1, dt)
        log_s, acc, gacc, racc, r2acc, _, _ = jax.lax.fori_loop(
            0, g, body, init)
        return _greek_quants(log_s0, o.s, o.k, g, geometric, t, tbar,
                             zc0, ivst, log_s, acc, gacc, racc, r2acc)

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (g,) + shape, dtype)
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


def _asian_greeks_kernel(seed_ref, off_ref, scal_ref, out_ref, *,
                         plan: Plan, n_obs: int, geometric: bool):
    log_s0, s0, k = scal_ref[0], scal_ref[1], scal_ref[2]
    drift, vol, inv_v, c1 = (scal_ref[3], scal_ref[4], scal_ref[5],
                             scal_ref[6])
    dt, t, tbar = scal_ref[7], scal_ref[8], scal_ref[9]
    zc0, ivst = scal_ref[10], scal_ref[11]
    shape = (plan.rows, LANES)
    b = pl.program_id(0)
    step = _greek_step(log_s0, drift, vol, inv_v, c1, dt, geometric)

    def walk(i, sgn):
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)

        def pair_step(j, z, carry):
            return step(j, z, carry, sgn)

        init = (jnp.full(shape, log_s0, jnp.float32),
                jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32), c1 * 1.0, dt * 1.0)
        log_s, acc, gacc, racc, r2acc, _, _ = walk_pairwise(
            shape, n_obs, pair_step, init)
        return _greek_quants(log_s0, s0, k, n_obs, geometric, t, tbar,
                             zc0, ivst, log_s, acc, gacc, racc, r2acc)

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


def greek_pallas_partials(opt: AsianOption, seed, block_offset, plan: Plan,
                          n_blocks: int, interpret: bool = False):
    """Per-block Greek partials ``(n_blocks, 10)``, fused on TPU."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        o = opt.astype(jnp.float32)
        g = opt.n_obs
        drift, vol = masian.step_constants(o, jnp.float32)
        t = jnp.asarray(o.t, jnp.float32)
        dt = t / g
        inv_v = 1.0 / jnp.asarray(o.v, jnp.float32)
        c1 = -(o.r + 0.5 * o.v * o.v) * dt * inv_v
        tbar = dt * (g + 1) / 2.0
        zc0 = (o.r - 0.5 * o.v * o.v) * t
        ivst = 1.0 / (jnp.asarray(o.v, jnp.float32) * jnp.sqrt(t))
        scal = jnp.stack([jnp.log(jnp.asarray(o.s, jnp.float32)), o.s, o.k,
                          drift, vol, inv_v, c1, dt, t, tbar, zc0, ivst])
        kernel = functools.partial(_asian_greeks_kernel, plan=plan,
                                   n_obs=g,
                                   geometric=opt.average == "geometric")
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
                flops=17 * plan.iters * paths_iter * g,
                bytes_accessed=n_blocks * 4 * N_GREEK_SUMS,
                transcendentals=4 * plan.iters * paths_iter * g,
            ),
            interpret=interpret_arg(interpret),
        )(jnp.atleast_1d(jnp.asarray(seed, jnp.int32)),
          jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32)), scal).reshape(n_blocks, N_GREEK_SUMS)


# ---------------------------------------------------------------------------
# Pallas TPU backend
# ---------------------------------------------------------------------------

def _asian_kernel(seed_ref, off_ref, scal_ref, out_ref, *, plan: Plan,
                  n_obs: int, geometric: bool):
    log_s0, k, drift, vol = (scal_ref[0], scal_ref[1], scal_ref[2],
                             scal_ref[3])
    shape = (plan.rows, LANES)
    b = pl.program_id(0)

    def walk(i, sgn):
        # Re-seed per (block, iter) so the antithetic mirror replays the
        # stream (same trick as the CVA kernel).
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)

        def step(j, z, carry):
            # Log-space walk: see the XLA twin above.
            log_s, acc = carry
            log_s = log_s + drift + vol * (sgn * z)
            acc = acc + (log_s if geometric else jnp.exp(log_s))
            return (log_s, acc)

        init = (jnp.full(shape, log_s0, jnp.float32),
                jnp.zeros(shape, jnp.float32))
        _, acc = walk_pairwise(shape, n_obs, step, init)
        return _payoff_from_avg(acc, k, n_obs, geometric)

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


def pallas_partials(opt: AsianOption, seed, block_offset, plan: Plan,
                    n_blocks: int, interpret: bool = False):
    """Per-block partial sums, shape ``(n_blocks, 2)``, fused on TPU."""
    # Mosaic has no i64/f64: trace with x64 semantics off (see vanilla.py).
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        return _pallas_partials(opt, seed, block_offset, plan, n_blocks,
                                interpret)


def _pallas_partials(opt, seed, block_offset, plan, n_blocks, interpret):
    o = opt.astype(jnp.float32)
    drift, vol = masian.step_constants(o, jnp.float32)
    scal = jnp.stack([jnp.log(jnp.asarray(o.s, jnp.float32)), o.k, drift,
                      vol])
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))

    kernel = functools.partial(_asian_kernel, plan=plan, n_obs=opt.n_obs,
                               geometric=opt.average == "geometric")
    paths_iter = plan.rows * LANES * (2 if plan.antithetic else 1)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
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
            flops=10 * plan.iters * paths_iter * opt.n_obs,
            bytes_accessed=n_blocks * 8,
            transcendentals=4 * plan.iters * paths_iter * opt.n_obs,
        ),
        interpret=interpret_arg(interpret),
    )(seed_arr, off_arr, scal).reshape(n_blocks, 2)


# ---------------------------------------------------------------------------
# MLMC coupled-level kernels (Giles 2008, observation-count refinement)
# ---------------------------------------------------------------------------
# Under exact GBM sampling the DISCRETELY-monitored Asian has no scheme
# bias; the multilevel target is the CONTINUOUSLY-monitored average, with
# the observation count as the level parameter (n_l = n0 * 2^l dates).
# Exact transitions make the coupling pure SUBSAMPLING: the coarse path at
# its dates coincides with the fine path (same Brownian path), so the
# level kernel is one fine walk that accumulates two averages — all dates
# (fine) and every second date (coarse).  The average difference is a
# Riemann refinement of a continuous path functional: Var[P_f - P_c]
# decays at beta ~= 2 with level cost gamma = 1, the GOOD corner of
# Giles's complexity theorem (total work O(eps^-2)); contrast the
# Euler-Heston boundary case documented in mctpu/mlmc.py.


def level_xla_partials(opt: AsianOption, key: jax.Array, block_offset,
                       plan: Plan, n_blocks: int, n0: int, level: int):
    """Per-block ``(sum_d, sum_d2)`` of the level-``level`` correction
    ``d = P(avg over n0*2^l dates) - P(avg over n0*2^(l-1) dates)``."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    nf = n0 * (2 ** level)
    nc = nf // 2
    geometric = opt.average == "geometric"
    dt = jnp.asarray(o.t, dtype) / nf
    drift = (o.r - 0.5 * o.v * o.v) * dt
    vol = o.v * jnp.sqrt(dt)
    log_s0 = jnp.log(jnp.asarray(o.s, dtype))
    shape = (plan.rows, LANES)

    def walk(z_seq, sgn):
        def body(j, carry):
            log_s, accf, accc = carry
            log_s = log_s + drift + vol * (sgn * z_seq[2 * j])
            x = log_s if geometric else jnp.exp(log_s)
            accf = accf + x
            log_s = log_s + drift + vol * (sgn * z_seq[2 * j + 1])
            x = log_s if geometric else jnp.exp(log_s)
            return (log_s, accf + x, accc + x)

        init = (jnp.full(shape, log_s0, dtype), jnp.zeros(shape, dtype),
                jnp.zeros(shape, dtype))
        _, accf, accc = jax.lax.fori_loop(0, nc, body, init)
        return (_payoff_from_avg(accf, o.k, nf, geometric)
                - _payoff_from_avg(accc, o.k, nc, geometric))

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (nf,) + shape, dtype)
            d = walk(z_seq, jnp.asarray(1.0, dtype))
            if plan.antithetic:
                d = 0.5 * (d + walk(z_seq, jnp.asarray(-1.0, dtype)))
            cs, cs2 = chunk_sums(d)
            return _accum_add(carry, cs, cs2, plan.kahan)

        carry = jax.lax.fori_loop(0, plan.iters, body,
                                  _accum_init(dtype, plan.kahan))
        return jnp.stack(_accum_final(carry, plan.kahan))

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


def _asian_level_kernel(seed_ref, off_ref, scal_ref, out_ref, *, plan: Plan,
                        nf: int, geometric: bool):
    log_s0, k, drift, vol = (scal_ref[0], scal_ref[1], scal_ref[2],
                             scal_ref[3])
    nc = nf // 2
    shape = (plan.rows, LANES)
    b = pl.program_id(0)

    def walk(i, sgn):
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)

        def body(j, carry):
            # One coarse step = two fine steps; the Box-Muller pair maps
            # onto exactly one iteration (no discarded branch).
            log_s, accf, accc = carry
            z1, z2 = draw_normal_pair(shape, j)
            log_s = log_s + drift + vol * (sgn * z1)
            x = log_s if geometric else jnp.exp(log_s)
            accf = accf + x
            log_s = log_s + drift + vol * (sgn * z2)
            x = log_s if geometric else jnp.exp(log_s)
            return (log_s, accf + x, accc + x)

        init = (jnp.full(shape, log_s0, jnp.float32),
                jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32))
        _, accf, accc = walk_steps(nc, body, init)
        return (_payoff_from_avg(accf, k, nf, geometric)
                - _payoff_from_avg(accc, k, nc, geometric))

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


def level_pallas_partials(opt: AsianOption, seed, block_offset, plan: Plan,
                          n_blocks: int, n0: int, level: int,
                          interpret: bool = False):
    """Fused TPU twin of :func:`level_xla_partials`."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        o = opt.astype(jnp.float32)
        nf = n0 * (2 ** level)
        dt = jnp.asarray(o.t, jnp.float32) / nf
        drift = (o.r - 0.5 * o.v * o.v) * dt
        vol = o.v * jnp.sqrt(dt)
        scal = jnp.stack([jnp.log(jnp.asarray(o.s, jnp.float32)), o.k,
                          drift, vol])
        kernel = functools.partial(_asian_level_kernel, plan=plan, nf=nf,
                                   geometric=opt.average == "geometric")
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
                flops=12 * plan.iters * paths_iter * nf,
                bytes_accessed=n_blocks * 8,
                transcendentals=4 * plan.iters * paths_iter * nf,
            ),
            interpret=interpret_arg(interpret),
        )(jnp.atleast_1d(jnp.asarray(seed, jnp.int32)),
          jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32)), scal).reshape(n_blocks, 2)
