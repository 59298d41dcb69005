"""Fused knock-out barrier call Monte Carlo kernel.

Walk skeleton shared with the Asian/CVA kernels: a ``fori_loop`` over the
observation grid carries the spot tile plus a 0/1 ``alive`` tile that zeroes
once the barrier is touched; the terminal call payoff is masked by ``alive``.
New product family beyond the reference.
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
                                  prng_emulation, seed_prng, walk_pairwise,
                                  walk_steps)
from mctpu.kernels.vanilla import _accum_add, _accum_final, _accum_init
from mctpu.types import BarrierOption

__all__ = ["make_plan", "xla_partials", "pallas_partials",
           "greek_xla_partials", "greek_pallas_partials", "N_GREEK_SUMS",
           "level_xla_partials", "level_pallas_partials"]

N_GREEK_SUMS = 8  # (sum, sum^2) for each of: payoff, delta, vega, rho


def make_plan(n_paths: int, num_blocks: int, rows: int, antithetic: bool,
              dtype: str = "float32", kahan: bool = True) -> Plan:
    units = rows * LANES
    paths = units * (2 if antithetic else 1)
    return Plan.plan(n_paths, num_blocks, rows, paths, units, antithetic, dtype, kahan)


def _alive_update(alive, log_s, log_barrier, up: bool):
    hit = log_s >= log_barrier if up else log_s <= log_barrier
    return alive * jnp.where(hit, 0.0, 1.0)


def _walk_tile(log_s0, k, log_barrier, drift, vol, z_at, n_obs: int,
               up: bool, sgn, shape, dtype):
    """XLA-backend walk from pre-drawn normals ``z_at(j)``.

    The walk lives in log space: the carried log-spot is an exact f32 sum
    (TPU f32 exp is ~-1.6e-6 relative and would compound over the grid,
    see kernels/cva.py), the barrier compare moves to the log barrier
    (monotone — the knock-out decision is identical), and the whole step
    is one FMA + compare: no transcendental until the terminal payoff.
    """
    def body(j, carry):
        log_s, alive = carry
        log_s = log_s + drift + vol * (sgn * z_at(j))
        return (log_s, _alive_update(alive, log_s, log_barrier, up))

    init = (jnp.full(shape, log_s0, dtype), jnp.ones(shape, dtype))
    log_s, alive = jax.lax.fori_loop(0, n_obs, body, init)
    return alive * jnp.maximum(jnp.exp(log_s) - k, 0.0)


# ---------------------------------------------------------------------------
# XLA backend
# ---------------------------------------------------------------------------

def xla_partials(opt: BarrierOption, key: jax.Array, block_offset,
                 plan: Plan, n_blocks: int):
    """Per-block partial sums, shape ``(n_blocks, 2)``."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    g = opt.n_obs
    up = opt.kind == "up-and-out"
    dt = o.t / g
    drift = (o.r - 0.5 * o.v * o.v) * dt
    vol = o.v * jnp.sqrt(dt)
    shape = (plan.rows, LANES)

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (g,) + shape, dtype)
            log_s0 = jnp.log(jnp.asarray(o.s, dtype))
            log_h = jnp.log(jnp.asarray(o.barrier, dtype))
            pay = _walk_tile(log_s0, o.k, log_h, drift, vol,
                             lambda j: z_seq[j], g, up,
                             jnp.asarray(1.0, dtype), shape, dtype)
            if plan.antithetic:
                pay_m = _walk_tile(log_s0, o.k, log_h, drift, vol,
                                   lambda j: z_seq[j], g, up,
                                   jnp.asarray(-1.0, dtype), shape, dtype)
                pay = 0.5 * (pay + pay_m)
            cs, cs2 = chunk_sums(pay)
            return _accum_add(carry, cs, cs2, plan.kahan)

        carry = jax.lax.fori_loop(0, plan.iters, body,
                                  _accum_init(dtype, plan.kahan))
        s, s2 = _accum_final(carry, plan.kahan)
        return jnp.stack([s, s2])

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


# ---------------------------------------------------------------------------
# Likelihood-ratio Greeks (delta, vega, rho)
# ---------------------------------------------------------------------------
# The knock-out indicator is DISCONTINUOUS in (s0, v, r): a bump can flip a
# path from alive to knocked out, so plain pathwise differentiation drops
# the barrier-boundary term and is biased (the fallback in mctpu/greeks.py
# documents this; the reference ships no barrier Greeks at all).  The
# likelihood-ratio method differentiates the sampling DENSITY instead of
# the payoff (Glasserman 2004, section 7.3), so the discontinuity is
# harmless and the estimator is unbiased for the discretely-monitored
# product itself.
#
# With per-step log-increments x_j ~ N(mu, sigma^2), mu = (r - v^2/2) dt,
# sigma = v sqrt(dt), and effective draws zeta_j = (x_j - mu)/sigma:
#
#   delta: s0 only moves the FIRST point's density (Markov) ->
#          score = zeta_1 / (s0 sigma)
#   vega:  v moves every step's mu and sigma ->
#          score = sum_j [(zeta_j^2 - 1)/v - zeta_j sqrt(dt)]
#   rho:   r moves every step's mu ->
#          score = sum_j zeta_j sqrt(dt)/v, plus the -t*P discount term
#          folded into the integrand (like the vanilla/Asian rho).
#
# The walk only has to carry three extra tiles (zeta_1, sum zeta, sum
# zeta^2) — no transcendentals are added.  LR variance grows ~linearly in
# the number of observations (each Greek's CI is reported honestly by the
# estimator), which is the textbook price of unbiasedness here; CRN
# bump-and-revalue (mctpu/greeks.py) remains available when a smoother
# target is acceptable.


def _greek_scalars(o, n_obs: int, dtype):
    """Per-option constants of the LR integrands (see module comment)."""
    dt = o.t / n_obs
    vol = o.v * jnp.sqrt(dt)          # sigma per step
    return {
        "drift": (o.r - 0.5 * o.v * o.v) * dt,
        "vol": vol,
        "c_d": 1.0 / (o.s * vol),     # zeta_1 multiplier of the delta score
        "inv_v": 1.0 / o.v,
        "sqdt": jnp.sqrt(dt),
        "n_over_v": n_obs / o.v,
        "c_r": jnp.sqrt(dt) / o.v,
        "t": o.t * jnp.ones((), dtype),
    }


def _greek_step(drift, vol, log_h, up: bool):
    """Walk step advancing (log_s, alive, z1, zs, z2s) from draw ``z``."""
    def step(j, z, carry, sgn):
        log_s, alive, z1, zs, z2s = carry
        zeta = sgn * z
        log_s = log_s + drift + vol * zeta
        alive = _alive_update(alive, log_s, log_h, up)
        z1 = jnp.where(j == 0, zeta, z1)
        return (log_s, alive, z1, zs + zeta, z2s + zeta * zeta)

    return step


def _greek_quants(log_s, alive, z1, zs, z2s, k, c):
    """(p, gd, gv, gr) integrand tiles from the walk carries."""
    p = alive * jnp.maximum(jnp.exp(log_s) - k, 0.0)
    gd = p * z1 * c["c_d"]
    gv = p * (z2s * c["inv_v"] - zs * c["sqdt"] - c["n_over_v"])
    gr = p * (zs * c["c_r"] - c["t"])
    return p, gd, gv, gr


def _greek_sums(tiles):
    out = []
    for q in tiles:
        out.append(jnp.sum(q))
        out.append(jnp.sum(q * q))
    return tuple(out)


def greek_xla_partials(opt: BarrierOption, key: jax.Array, block_offset,
                       plan: Plan, n_blocks: int):
    """Per-block LR Greek partials ``(n_blocks, 8)``: payoff/delta/vega/rho
    (sum, sum^2) pairs — ``N_GREEK_SUMS`` columns."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    g = opt.n_obs
    up = opt.kind == "up-and-out"
    c = _greek_scalars(o, g, dtype)
    log_s0 = jnp.log(jnp.asarray(o.s, dtype))
    log_h = jnp.log(jnp.asarray(o.barrier, dtype))
    shape = (plan.rows, LANES)
    step = _greek_step(c["drift"], c["vol"], log_h, up)

    def walk(z_seq, sgn):
        def body(j, carry):
            return step(j, z_seq[j], carry, sgn)

        z = jnp.zeros(shape, dtype)
        init = (jnp.full(shape, log_s0, dtype), jnp.ones(shape, dtype),
                z, z, z)
        log_s, alive, z1, zs, z2s = jax.lax.fori_loop(0, g, body, init)
        return _greek_quants(log_s, alive, z1, zs, z2s, o.k, c)

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


def _barrier_greeks_kernel(seed_ref, off_ref, scal_ref, out_ref, *,
                           plan: Plan, n_obs: int, up: bool):
    log_s0, k, log_h = scal_ref[0], scal_ref[1], scal_ref[2]
    c = {"drift": scal_ref[3], "vol": scal_ref[4], "c_d": scal_ref[5],
         "inv_v": scal_ref[6], "sqdt": scal_ref[7], "n_over_v": scal_ref[8],
         "c_r": scal_ref[9], "t": scal_ref[10]}
    shape = (plan.rows, LANES)
    b = pl.program_id(0)
    step = _greek_step(c["drift"], c["vol"], log_h, up)

    def walk(i, sgn):
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)

        def pair_step(j, z, carry):
            return step(j, z, carry, sgn)

        z = jnp.zeros(shape, jnp.float32)
        init = (jnp.full(shape, log_s0, jnp.float32),
                jnp.ones(shape, jnp.float32), z, z, z)
        log_s, alive, z1, zs, z2s = walk_pairwise(shape, n_obs, pair_step,
                                                  init)
        return _greek_quants(log_s, alive, z1, zs, z2s, k, c)

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


def greek_pallas_partials(opt: BarrierOption, seed, block_offset, plan: Plan,
                          n_blocks: int, interpret: bool = False):
    """Per-block LR Greek partials ``(n_blocks, 8)``, fused on TPU."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        o = opt.astype(jnp.float32)
        c = _greek_scalars(o, opt.n_obs, jnp.float32)
        scal = jnp.stack([jnp.log(jnp.asarray(o.s, jnp.float32)), o.k,
                          jnp.log(jnp.asarray(o.barrier, jnp.float32)),
                          c["drift"], c["vol"], c["c_d"], c["inv_v"],
                          c["sqdt"], c["n_over_v"], c["c_r"], c["t"]])
        kernel = functools.partial(_barrier_greeks_kernel, plan=plan,
                                   n_obs=opt.n_obs,
                                   up=opt.kind == "up-and-out")
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
                flops=16 * plan.iters * paths_iter * opt.n_obs,
                bytes_accessed=n_blocks * 4 * N_GREEK_SUMS,
                transcendentals=4 * plan.iters * paths_iter * opt.n_obs,
            ),
            interpret=interpret_arg(interpret),
        )(jnp.atleast_1d(jnp.asarray(seed, jnp.int32)),
          jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32)), scal).reshape(n_blocks, N_GREEK_SUMS)


# ---------------------------------------------------------------------------
# Pallas TPU backend
# ---------------------------------------------------------------------------

def _barrier_kernel(seed_ref, off_ref, scal_ref, out_ref, *, plan: Plan,
                    n_obs: int, up: bool):
    log_s0, k, log_h = scal_ref[0], scal_ref[1], scal_ref[2]
    drift, vol = scal_ref[3], scal_ref[4]
    shape = (plan.rows, LANES)
    b = pl.program_id(0)

    def walk(i, sgn):
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)

        def step(j, z, carry):
            # Log-space: FMA + compare per step, zero transcendentals
            # (see _walk_tile).
            log_s, alive = carry
            log_s = log_s + drift + vol * (sgn * z)
            return (log_s, _alive_update(alive, log_s, log_h, up))

        init = (jnp.full(shape, log_s0, jnp.float32),
                jnp.ones(shape, jnp.float32))
        log_s, alive = walk_pairwise(shape, n_obs, step, init)
        return alive * jnp.maximum(jnp.exp(log_s) - k, 0.0)

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


def pallas_partials(opt: BarrierOption, seed, block_offset, plan: Plan,
                    n_blocks: int, interpret: bool = False):
    """Per-block partial sums, shape ``(n_blocks, 2)``, fused on TPU."""
    # Mosaic has no i64/f64: trace with x64 semantics off (see vanilla.py).
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        return _pallas_partials(opt, seed, block_offset, plan, n_blocks,
                                interpret)


def _pallas_partials(opt, seed, block_offset, plan, n_blocks, interpret):
    o = opt.astype(jnp.float32)
    dt = o.t / opt.n_obs
    drift = (o.r - 0.5 * o.v * o.v) * dt
    vol = o.v * jnp.sqrt(dt)
    scal = jnp.stack([jnp.log(jnp.asarray(o.s, jnp.float32)), o.k,
                      jnp.log(jnp.asarray(o.barrier, jnp.float32)),
                      drift, vol])
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))

    kernel = functools.partial(_barrier_kernel, plan=plan, n_obs=opt.n_obs,
                               up=opt.kind == "up-and-out")
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
# MLMC coupled-level kernels (monitoring-frequency refinement)
# ---------------------------------------------------------------------------
# Exact GBM transitions make the discretely-monitored barrier scheme-bias
# free; the multilevel target is the CONTINUOUSLY-monitored knockout
# (Broadie-Glasserman-Kou: the discrete price approaches it at
# O(1/sqrt(n))), with the monitoring count as the level parameter
# (n_l = n0 * 2^l dates).  One fine walk carries TWO alive flags — every
# date (fine) and every second date (coarse, a subsample of the same
# exact path) — and the level correction is
#
#   d = (alive_f - alive_c) * max(S_T - K, 0)       (alive_f <= alive_c)
#
# which is nonzero only on paths whose extra (odd-indexed) monitoring
# dates breach the barrier: an O(n^{-1/2}) fraction, each O(1) — so the
# level variance decays at beta ~= 1/2 with cost gamma = 1 (the middle
# case of Giles's theorem, total work O(eps^-3); still a full order
# better than single-level's O(eps^-4) at alpha = 1/2, and the honest
# rate for an indicator functional without conditional-expectation
# smoothing).  Measured decay is asserted in tests/test_mlmc.py.


def _level_walk_tile(log_s0, k, log_h, drift, vol, z_at, nc: int, up: bool,
                     sgn, shape, dtype):
    """Coupled fine/coarse knockout walk from ``z_at(j) -> (z1, z2)``."""
    def body(j, carry):
        log_s, af, ac = carry
        z1, z2 = z_at(j)
        log_s = log_s + drift + vol * (sgn * z1)
        af = _alive_update(af, log_s, log_h, up)      # odd (fine-only) date
        log_s = log_s + drift + vol * (sgn * z2)
        af = _alive_update(af, log_s, log_h, up)      # shared date
        ac = _alive_update(ac, log_s, log_h, up)
        return (log_s, af, ac)

    init = (jnp.full(shape, log_s0, dtype), jnp.ones(shape, dtype),
            jnp.ones(shape, dtype))
    log_s, af, ac = walk_steps(nc, body, init)
    return (af - ac) * jnp.maximum(jnp.exp(log_s) - k, 0.0)


def level_xla_partials(opt: BarrierOption, key: jax.Array, block_offset,
                       plan: Plan, n_blocks: int, n0: int, level: int):
    """Per-block ``(sum_d, sum_d2)`` of the level-``level`` monitoring
    correction ``d = P(n0 * 2^l dates) - P(n0 * 2^(l-1) dates)``."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    nf = n0 * (2 ** level)
    nc = nf // 2
    up = opt.kind == "up-and-out"
    dt = o.t / nf
    drift = (o.r - 0.5 * o.v * o.v) * dt
    vol = o.v * jnp.sqrt(dt)
    shape = (plan.rows, LANES)
    log_s0 = jnp.log(jnp.asarray(o.s, dtype))
    log_h = jnp.log(jnp.asarray(o.barrier, dtype))

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (nf,) + shape, dtype)
            d = _level_walk_tile(log_s0, o.k, log_h, drift, vol,
                                 lambda j: (z_seq[2 * j], z_seq[2 * j + 1]),
                                 nc, up, jnp.asarray(1.0, dtype), shape,
                                 dtype)
            if plan.antithetic:
                dm = _level_walk_tile(
                    log_s0, o.k, log_h, drift, vol,
                    lambda j: (z_seq[2 * j], z_seq[2 * j + 1]), nc, up,
                    jnp.asarray(-1.0, dtype), shape, dtype)
                d = 0.5 * (d + dm)
            cs, cs2 = chunk_sums(d)
            return _accum_add(carry, cs, cs2, plan.kahan)

        carry = jax.lax.fori_loop(0, plan.iters, body,
                                  _accum_init(dtype, plan.kahan))
        s, s2 = _accum_final(carry, plan.kahan)
        return jnp.stack([s, s2])

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


def _barrier_level_kernel(seed_ref, off_ref, scal_ref, out_ref, *,
                          plan: Plan, nf: int, up: bool):
    log_s0, k, log_h, drift, vol = (scal_ref[0], scal_ref[1], scal_ref[2],
                                    scal_ref[3], scal_ref[4])
    nc = nf // 2
    shape = (plan.rows, LANES)
    b = pl.program_id(0)

    def walk(i, sgn):
        # One coarse step = two fine steps: the Box-Muller pair maps onto
        # exactly one iteration (no discarded branch).
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)
        return _level_walk_tile(log_s0, k, log_h, drift, vol,
                                lambda j: draw_normal_pair(shape, j), nc,
                                up, sgn, shape, jnp.float32)

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


def level_pallas_partials(opt: BarrierOption, seed, block_offset,
                          plan: Plan, n_blocks: int, n0: int, level: int,
                          interpret: bool = False):
    """Fused TPU twin of :func:`level_xla_partials`."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        o = opt.astype(jnp.float32)
        nf = n0 * (2 ** level)
        dt = jnp.asarray(o.t, jnp.float32) / nf
        scal = jnp.stack([
            jnp.log(jnp.asarray(o.s, jnp.float32)), o.k,
            jnp.log(jnp.asarray(o.barrier, jnp.float32)),
            (o.r - 0.5 * o.v * o.v) * dt, o.v * jnp.sqrt(dt),
        ])
        kernel = functools.partial(_barrier_level_kernel, plan=plan, nf=nf,
                                   up=opt.kind == "up-and-out")
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
                flops=10 * plan.iters * paths_iter * nf,
                bytes_accessed=n_blocks * 8,
                transcendentals=4 * plan.iters * paths_iter * nf,
            ),
            interpret=interpret_arg(interpret),
        )(jnp.atleast_1d(jnp.asarray(seed, jnp.int32)),
          jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32)), scal).reshape(n_blocks, 2)
