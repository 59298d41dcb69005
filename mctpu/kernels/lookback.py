"""Fused lookback-option Monte Carlo kernel (running-extreme walk).

Walk skeleton shared with the barrier kernel: a ``fori_loop`` over the
observation grid carries the spot tile plus the running extreme.  Payoffs:

* ``floating`` call: ``S_T - min_j S_j``  (put: ``max_j S_j - S_T``)
* ``fixed`` call:    ``max(max_j S_j - K, 0)``  (put: ``max(K - min_j, 0)``)

New product family beyond the reference; the continuous-monitoring
Goldman-Sosin-Gatto price (:func:`mctpu.math.lookback_floating_call`) is an
upper bound the discrete price approaches from below as ``n_obs`` grows.
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
                                  interpret_arg, prng_emulation,
                                  seed_prng, walk_pairwise)
from mctpu.kernels.vanilla import _accum_add, _accum_final, _accum_init

__all__ = ["make_plan", "xla_partials", "pallas_partials",
           "greek_xla_partials", "greek_pallas_partials", "N_GREEK_SUMS"]


def make_plan(n_paths: int, num_blocks: int, rows: int, antithetic: bool,
              dtype: str = "float32", kahan: bool = True) -> Plan:
    units = rows * LANES
    paths = units * (2 if antithetic else 1)
    return Plan.plan(n_paths, num_blocks, rows, paths, units, antithetic,
                     dtype, kahan)


def _payoff(s, ext, k, kind: str, put: bool):
    """Terminal lookback payoff from spot + running extreme."""
    if kind == "floating":
        # ext = running min for a call, running max for a put
        return (ext - s) if put else (s - ext)
    if put:
        return jnp.maximum(k - ext, 0.0)  # ext = running min
    return jnp.maximum(ext - k, 0.0)      # ext = running max


def _tracks_min(kind: str, put: bool) -> bool:
    return (kind == "floating") != put  # floating call / fixed put -> min


def _walk_tile(log_s0, k, drift, vol, z_at, n_obs: int, kind: str,
               put: bool, sgn, shape, dtype):
    """XLA-backend walk from pre-drawn normals ``z_at(j)``.

    Log-space walk: the running extreme moves to the log-spot (min/max is
    monotone-invariant), each step is one FMA + min/max with zero
    transcendentals, and the two terminal exps avoid the compounding
    ~-1.6e-6 relative bias of 100s of chained TPU f32 exps
    (see kernels/cva.py).
    """
    use_min = _tracks_min(kind, put)

    def body(j, carry):
        log_s, log_ext = carry
        log_s = log_s + drift + vol * (sgn * z_at(j))
        log_ext = (jnp.minimum(log_ext, log_s) if use_min
                   else jnp.maximum(log_ext, log_s))
        return (log_s, log_ext)

    init = (jnp.full(shape, log_s0, dtype), jnp.full(shape, log_s0, dtype))
    log_s, log_ext = jax.lax.fori_loop(0, n_obs, body, init)
    return _payoff(jnp.exp(log_s), jnp.exp(log_ext), k, kind, put)


# ---------------------------------------------------------------------------
# XLA backend
# ---------------------------------------------------------------------------

def xla_partials(opt, key: jax.Array, block_offset, plan: Plan,
                 n_blocks: int):
    """Per-block partial sums, shape ``(n_blocks, 2)``."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    g = opt.n_obs
    put = opt.payoff == "put"
    dt = o.t / g
    drift = (o.r - 0.5 * o.v * o.v) * dt
    vol = o.v * jnp.sqrt(dt)
    shape = (plan.rows, LANES)

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (g,) + shape, dtype)
            log_s0 = jnp.log(jnp.asarray(o.s, dtype))
            pay = _walk_tile(log_s0, o.k, drift, vol, lambda j: z_seq[j], g,
                             opt.kind, put, jnp.asarray(1.0, dtype), shape,
                             dtype)
            if plan.antithetic:
                pay_m = _walk_tile(log_s0, o.k, drift, vol,
                                   lambda j: z_seq[j],
                                   g, opt.kind, put,
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
# Pallas TPU backend
# ---------------------------------------------------------------------------

def _lookback_kernel(seed_ref, off_ref, scal_ref, out_ref, *, plan: Plan,
                     n_obs: int, kind: str, put: bool):
    log_s0, k = scal_ref[0], scal_ref[1]
    drift, vol = scal_ref[2], scal_ref[3]
    shape = (plan.rows, LANES)
    b = pl.program_id(0)
    use_min = _tracks_min(kind, put)

    def walk(i, sgn):
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)

        def step(j, z, carry):
            # Log-space: FMA + min/max per step, zero transcendentals
            # (see _walk_tile).
            log_s, log_ext = carry
            log_s = log_s + drift + vol * (sgn * z)
            log_ext = (jnp.minimum(log_ext, log_s) if use_min
                       else jnp.maximum(log_ext, log_s))
            return (log_s, log_ext)

        init = (jnp.full(shape, log_s0, jnp.float32),
                jnp.full(shape, log_s0, jnp.float32))
        log_s, log_ext = walk_pairwise(shape, n_obs, step, init)
        return _payoff(jnp.exp(log_s), jnp.exp(log_ext), k, kind, put)

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


# ---------------------------------------------------------------------------
# Pathwise Greeks (delta, vega, rho) — extreme-tracking in log space
# ---------------------------------------------------------------------------
# Every s_j is proportional to s0 under GBM, so every lookback payoff is
# homogeneous of degree <= 1 in s0 and delta comes for free:
#
#     floating (P = |s_T - ext|):  gd = P / s0            (exactly)
#     fixed call / put:            gd = +-1{itm} * ext / s0
#
# For vega, d(s_j)/dv = s_j * f_j with f_j = log_rel_j/v + c1*j (same
# identity as kernels/asian.py); the extreme's sensitivity needs f at the
# *arg-extreme*, so the walk carries (log_ext, f_ext) and updates both
# whenever the extreme improves — two selects per step, still zero
# transcendentals in the loop.  d(ext)/dv = ext * f_ext, and:
#
#     floating call: gv = s_T f_T - ext f_ext   (put: negated)
#     fixed call:    gv = 1{ext > k} * ext * f_ext   (put: -1{ext < k} ...)
#
# Unbiased wherever the payoff kink has measure zero.  One genuine edge:
# the running extreme has an ATOM at s0 (the initial fixing is a
# monitoring point), so a fixed-strike option with k == s0 exactly puts
# positive probability mass ON the kink — delta does not exist there and
# the pathwise estimator returns the left derivative (a central CRN bump
# averages the two one-sided slopes instead; verified in f64 NumPy, gap
# = P(extreme == s0)/2).  Any k != s0 is clean.  Gated in
# tests/test_greeks.py by the EXACT homogeneity identity delta == price/s0
# (floating), CRN bumps at off-atom strikes, and the interpret/shard
# contracts.

N_GREEK_SUMS = 8  # (sum, sum^2) for each of: payoff, delta, vega, rho


def _greek_step_fn(log_s0, inv_v, c1, drift, vol, dt, use_min):
    """One (log_s, log_ext, f_ext, t_ext, cj, tj) update; shared by both
    backends.  ``t_ext`` tracks the arg-extreme TIME (for rho: ``ds_j/dr
    = t_j s_j`` makes ``d ext/dr = t_ext ext``); ``tj`` is the running
    observation time — both ride the same extreme-improvement select."""
    def step(z, carry, sgn):
        log_s, log_ext, f_ext, t_ext, cj, tj = carry
        log_s = log_s + drift + vol * (sgn * z)
        tj = tj + dt
        f = (log_s - log_s0) * inv_v + cj
        upd = log_s < log_ext if use_min else log_s > log_ext
        log_ext = jnp.where(upd, log_s, log_ext)
        f_ext = jnp.where(upd, f, f_ext)
        t_ext = jnp.where(upd, tj, t_ext)
        return (log_s, log_ext, f_ext, t_ext, cj + c1, tj)

    return step


def _greek_epilogue(log_s, log_ext, f_ext, t_ext, log_s0, s0, k, kind, put,
                    n_obs, inv_v, c1, t_mat):
    """(p, gd, gv, gr) integrand tiles from the final walk state; shared.

    Rho folds the discount term in (the estimator applies e^{-rT} only):
    ``d/dr e^{-rT} P = e^{-rT} (dP/dr - T P)``.  With ``ds_j/dr = t_j
    s_j`` the floating call collapses to ``gr = ext (T - t_ext)`` (put:
    negated) and the fixed call to ``1{ext>k} t_ext ext - T p``.
    """
    s_t = jnp.exp(log_s)
    ext = jnp.exp(log_ext)
    f_t = (log_s - log_s0) * inv_v + c1 * n_obs
    if kind == "floating":
        p = (ext - s_t) if put else (s_t - ext)
        gd = p / s0
        gv = s_t * f_t - ext * f_ext
        gr = ext * (t_mat - t_ext)
        if put:
            gv = -gv
            gr = -gr
    elif put:  # fixed put: ext tracks the min
        ind = jnp.where(ext < k, 1.0, 0.0)
        p = jnp.maximum(k - ext, 0.0)
        gd = -ind * ext / s0
        gv = -ind * ext * f_ext
        gr = -ind * t_ext * ext - t_mat * p
    else:      # fixed call: ext tracks the max
        ind = jnp.where(ext > k, 1.0, 0.0)
        p = jnp.maximum(ext - k, 0.0)
        gd = ind * ext / s0
        gv = ind * ext * f_ext
        gr = ind * t_ext * ext - t_mat * p
    return p, gd, gv, gr


def _greek_init(shape, log_s0, c1, dtype):
    return (jnp.full(shape, log_s0, dtype), jnp.full(shape, log_s0, dtype),
            jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
            c1 * jnp.ones((), dtype), jnp.zeros((), dtype))


def _greek_walk_quants(log_s0, s0, k, kind, put, use_min, n_obs, inv_v, c1,
                       drift, vol, dt, t_mat, z_at, sgn, shape, dtype):
    """One XLA-backend walk -> (p, gd, gv, gr) integrand tiles."""
    step = _greek_step_fn(log_s0, inv_v, c1, drift, vol, dt, use_min)

    def body(j, carry):
        return step(z_at(j), carry, sgn)

    log_s, log_ext, f_ext, t_ext, _, _ = jax.lax.fori_loop(
        0, n_obs, body, _greek_init(shape, log_s0, c1, dtype))
    return _greek_epilogue(log_s, log_ext, f_ext, t_ext, log_s0, s0, k,
                           kind, put, n_obs, inv_v, c1, t_mat)


def _greek_sums(tiles):
    out = []
    for q in tiles:
        out.append(jnp.sum(q))
        out.append(jnp.sum(q * q))
    return tuple(out)


def greek_xla_partials(opt, key, block_offset, plan: Plan, n_blocks: int):
    """Per-block Greek partials ``(n_blocks, 8)``:
    payoff/delta/vega/rho sums."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    g = opt.n_obs
    put = opt.payoff == "put"
    use_min = _tracks_min(opt.kind, put)
    dt = o.t / g
    drift = (o.r - 0.5 * o.v * o.v) * dt
    vol = o.v * jnp.sqrt(dt)
    inv_v = 1.0 / jnp.asarray(o.v, dtype)
    c1 = -(o.r + 0.5 * o.v * o.v) * dt * inv_v
    log_s0 = jnp.log(jnp.asarray(o.s, dtype))
    shape = (plan.rows, LANES)

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (g,) + shape, dtype)
            tiles = _greek_walk_quants(
                log_s0, o.s, o.k, opt.kind, put, use_min, g, inv_v, c1,
                drift, vol, dt, o.t, lambda j: z_seq[j],
                jnp.asarray(1.0, dtype), shape, dtype)
            if plan.antithetic:
                m = _greek_walk_quants(
                    log_s0, o.s, o.k, opt.kind, put, use_min, g, inv_v, c1,
                    drift, vol, dt, o.t, lambda j: z_seq[j],
                    jnp.asarray(-1.0, dtype), shape, dtype)
                tiles = tuple(0.5 * (a + b) for a, b in zip(tiles, m))
            return acc_add_n(carry, _greek_sums(tiles), plan.kahan)

        carry = jax.lax.fori_loop(
            0, plan.iters, body, acc_init_n(N_GREEK_SUMS, dtype, plan.kahan))
        return jnp.stack(acc_final_n(carry, plan.kahan))

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


def _lookback_greeks_kernel(seed_ref, off_ref, scal_ref, out_ref, *,
                            plan: Plan, n_obs: int, kind: str, put: bool):
    log_s0, s0, k = scal_ref[0], scal_ref[1], scal_ref[2]
    drift, vol, inv_v, c1 = (scal_ref[3], scal_ref[4], scal_ref[5],
                             scal_ref[6])
    dt, t_mat = scal_ref[7], scal_ref[8]
    shape = (plan.rows, LANES)
    b = pl.program_id(0)
    use_min = _tracks_min(kind, put)

    step_fn = _greek_step_fn(log_s0, inv_v, c1, drift, vol, dt, use_min)

    def walk(i, sgn):
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)

        def step(j, z, carry):
            return step_fn(z, carry, sgn)

        log_s, log_ext, f_ext, t_ext, _, _ = walk_pairwise(
            shape, n_obs, step, _greek_init(shape, log_s0, c1, jnp.float32))
        return _greek_epilogue(log_s, log_ext, f_ext, t_ext, log_s0, s0, k,
                               kind, put, n_obs, inv_v, c1, t_mat)

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


def greek_pallas_partials(opt, seed, block_offset, plan: Plan,
                          n_blocks: int, interpret: bool = False):
    """Per-block Greek partials ``(n_blocks, 8)``, fused on TPU."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        o = opt.astype(jnp.float32)
        g = opt.n_obs
        dt = o.t / g
        drift = (o.r - 0.5 * o.v * o.v) * dt
        vol = o.v * jnp.sqrt(dt)
        inv_v = 1.0 / jnp.asarray(o.v, jnp.float32)
        c1 = -(o.r + 0.5 * o.v * o.v) * dt * inv_v
        scal = jnp.stack([jnp.log(jnp.asarray(o.s, jnp.float32)),
                          jnp.asarray(o.s, jnp.float32),
                          jnp.asarray(o.k, jnp.float32),
                          drift, vol, inv_v, c1, dt,
                          jnp.asarray(o.t, jnp.float32)])
        kernel = functools.partial(_lookback_greeks_kernel, plan=plan,
                                   n_obs=g, kind=opt.kind,
                                   put=opt.payoff == "put")
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
                flops=14 * plan.iters * paths_iter * g,
                bytes_accessed=n_blocks * 4 * N_GREEK_SUMS,
                transcendentals=3 * plan.iters * paths_iter * g,
            ),
            interpret=interpret_arg(interpret),
        )(jnp.atleast_1d(jnp.asarray(seed, jnp.int32)),
          jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32)), scal).reshape(n_blocks, N_GREEK_SUMS)


def pallas_partials(opt, seed, block_offset, plan: Plan, n_blocks: int,
                    interpret: bool = False):
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
    scal = jnp.stack([jnp.log(jnp.asarray(o.s, jnp.float32)),
                      jnp.asarray(o.k, jnp.float32), drift, vol])
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))

    kernel = functools.partial(_lookback_kernel, plan=plan, n_obs=opt.n_obs,
                               kind=opt.kind, put=opt.payoff == "put")
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
            flops=8 * plan.iters * paths_iter * opt.n_obs,
            bytes_accessed=n_blocks * 8,
            transcendentals=3 * plan.iters * paths_iter * opt.n_obs,
        ),
        interpret=interpret_arg(interpret),
    )(seed_arr, off_arr, scal).reshape(n_blocks, 2)
