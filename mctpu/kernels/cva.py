"""Fused CVA Monte Carlo kernel (exposure walk over a time grid).

TPU-native rebuild of ``cvaCallOptMC`` (``MonteCarloKernel.cu:223-284``): each
path walks a GBM over ``n_grid`` steps of ``dt = T / n_grid``; at node ``j``
the default-probability mass is ``dp_j = e^{-lambda t_{j-1}} - e^{-lambda t_j}``
and the exposure is the remaining Black-Scholes value (Hastings CDF on the
VPU, ``device_bsCall``, ``MonteCarloKernel.cu:125-129``); the per-path default
leg is ``lgd * sum_j dp_j * ee_j``.  The sequential time loop stays on-chip as
a ``fori_loop`` with the running spots carried in registers (never shard time
— the GBM recurrence is serial; SURVEY.md §2).

Also accumulates the expected-exposure profile ``sum_paths ee_j`` per node, a
first-class output the reference never materializes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mctpu import math as mcmath
from mctpu import rng as mcrng
from mctpu.kernels.common import LANES, Plan, chunk_sums
from mctpu.kernels.vanilla import _accum_add, _accum_final, _accum_init
from mctpu.types import CvaSpec

__all__ = ["make_plan", "xla_partials", "pallas_partials", "node_constants"]


def make_plan(n_paths: int, num_blocks: int, rows: int, antithetic: bool,
              dtype: str = "float32", kahan: bool = True) -> Plan:
    # One (rows, 128) tile of paths walks the whole grid per iteration.
    units = rows * LANES
    paths = units * (2 if antithetic else 1)
    return Plan.plan(n_paths, num_blocks, rows, paths, units, antithetic, dtype, kahan)


def node_constants(spec: CvaSpec, dtype):
    """Per-node constants of the exposure walk, precomputed once.

    ``dp``: default-leg weights (``MonteCarloKernel.cu:249``); ``t_rem``:
    remaining maturity after node j (exact 0 at the last node); plus the
    per-step GBM drift/vol scalars.
    """
    opt = spec.option
    g = spec.n_grid
    t = jnp.asarray(opt.t, dtype)
    dp = mcmath.default_leg_weights(spec.intensity, opt.t, g, dtype=dtype)
    j = jnp.arange(1, g + 1, dtype=dtype)
    t_rem = t * (g - j) / g
    dt = t / g
    drift = (opt.r - 0.5 * opt.v * opt.v) * dt
    vol = opt.v * jnp.sqrt(dt)
    return dp, t_rem, drift.astype(dtype), vol.astype(dtype)


def _exposure(s, k, r, v, t_rem):
    """Remaining option value at one node: BS with Hastings CDF, intrinsic at
    the final node (normalized edge semantics, see mctpu.models.cva)."""
    bs = mcmath.bs_call_hastings(s, k, r, v, jnp.maximum(t_rem, 1e-12))
    return jnp.where(t_rem > 0, bs, jnp.maximum(s - k, 0.0))


def _walk(spec_scalars, dp, t_rem, drift, vol, z_at, shape, n_grid: int,
          antithetic: bool, dtype):
    """Walk one path tile over the grid; returns (cva_tile, ee_sums (G,)).

    ``z_at(j)`` yields the node-j normal tile.  With antithetic variates two
    mirrored walks share each draw and the tile value is the pair mean.
    """
    s0, k, r, v, lgd = spec_scalars

    def one(sgn):
        def body(j, carry):
            s, acc, ee_sums = carry
            z = z_at(j)
            s = s * jnp.exp(drift + vol * (sgn * z))
            ee = _exposure(s, k, r, v, t_rem[j])
            acc = acc + dp[j] * ee
            ee_sums = ee_sums.at[j].add(jnp.sum(ee))
            return (s, acc, ee_sums)

        init = (
            jnp.full(shape, s0, dtype),
            jnp.zeros(shape, dtype),
            jnp.zeros((n_grid,), dtype),
        )
        _, acc, ee_sums = jax.lax.fori_loop(0, n_grid, body, init)
        return lgd * acc, ee_sums

    cva_p, ee_p = one(jnp.asarray(1.0, dtype))
    if antithetic:
        cva_m, ee_m = one(jnp.asarray(-1.0, dtype))
        return 0.5 * (cva_p + cva_m), 0.5 * (ee_p + ee_m)
    return cva_p, ee_p


# ---------------------------------------------------------------------------
# XLA backend
# ---------------------------------------------------------------------------

def xla_partials(spec: CvaSpec, key: jax.Array, block_offset, plan: Plan,
                 n_blocks: int):
    """Per-block partials: ``((n_blocks, 2), (n_blocks, n_grid))``.

    Second output is the per-block sum of exposures per node (for the
    expected-exposure profile).
    """
    dtype = plan.jdtype
    sp = spec.astype(dtype)
    o = sp.option
    g = spec.n_grid
    dp, t_rem, drift, vol = node_constants(sp, dtype)
    scalars = (o.s, o.k, o.r, o.v, sp.lgd)
    shape = (plan.rows, LANES)

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (g,) + shape, dtype)
            cva_tile, ee_sums = _walk(scalars, dp, t_rem, drift, vol,
                                      lambda j: z_seq[j], shape, g,
                                      plan.antithetic, dtype)
            cs, cs2 = chunk_sums(cva_tile)
            acc, ee_acc = carry
            return (_accum_add(acc, cs, cs2, plan.kahan), ee_acc + ee_sums)

        init = (_accum_init(dtype, plan.kahan), jnp.zeros((g,), dtype))
        acc, ee_acc = jax.lax.fori_loop(0, plan.iters, body, init)
        s, s2 = _accum_final(acc, plan.kahan)
        return jnp.stack([s, s2]), ee_acc

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


# ---------------------------------------------------------------------------
# Pallas TPU backend
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _cva_kernel(seed_ref, off_ref, scal_ref, dp_ref, trem_ref, out_ref,
                ee_ref, prof_scratch, *, plan: Plan, n_grid: int):
    s0, k, r, v, lgd = (scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3],
                        scal_ref[4])
    drift, vol = scal_ref[5], scal_ref[6]
    shape = (plan.rows, LANES)
    b = pl.program_id(0)
    g_pad = prof_scratch.shape[0]

    def draw():
        bits1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        bits2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        return mcrng.box_muller(bits1, bits2)[0]

    def walk(i, sgn):
        # (Re)seed per (block, iteration): the antithetic mirror walk replays
        # the exact same hardware-PRNG stream with the opposite sign.  The
        # hardware seed op takes two words; fold (block, iter) into one
        # counter (unique per run: iter < plan.iters).
        pltpu.prng_seed(seed_ref[0],
                        (off_ref[0] + b) * jnp.int32(plan.iters) + i)
        sgn_half = 0.5 if plan.antithetic else 1.0

        def body(j, carry):
            s, acc = carry
            z = draw()
            s = s * jnp.exp(drift + vol * (sgn * z))
            ee = _exposure(s, k, r, v, trem_ref[j])
            acc = acc + dp_ref[j] * ee
            # Exposure profile: accumulate the per-lane row sums at node j.
            row = jnp.sum(ee, axis=0, keepdims=True)
            prof_scratch[pl.ds(j, 1), :] += sgn_half * row
            return (s, acc)

        init = (jnp.full(shape, s0, jnp.float32), jnp.zeros(shape, jnp.float32))
        _, acc = jax.lax.fori_loop(0, n_grid, body, init)
        return lgd * acc

    def body(i, carry):
        if plan.antithetic:
            cva_tile = 0.5 * (walk(i, 1.0) + walk(i, -1.0))
        else:
            cva_tile = walk(i, 1.0)
        return _accum_add(carry, cva_tile, cva_tile * cva_tile, plan.kahan)

    prof_scratch[:] = jnp.zeros((g_pad, LANES), jnp.float32)
    # Vector accumulators; one reduction per block (see vanilla.py note).
    tile = jnp.zeros(shape, jnp.float32)
    carry = jax.lax.fori_loop(0, plan.iters, body,
                              ((tile, tile), (tile, tile)) if plan.kahan
                              else (tile, tile))
    acc, acc2 = _accum_final(carry, plan.kahan)
    out_ref[b, 0] = jnp.sum(acc)
    out_ref[b, 1] = jnp.sum(acc2)
    ee_ref[b, :] = jnp.sum(prof_scratch[:], axis=1)


def pallas_partials(spec: CvaSpec, seed, block_offset, plan: Plan,
                    n_blocks: int, interpret: bool = False):
    """Per-block partials: ``((n_blocks, 2), (n_blocks, n_grid))`` on TPU."""
    # Mosaic has no i64/f64: trace with x64 semantics off (see vanilla.py).
    with jax.enable_x64(False):
        return _pallas_partials(spec, seed, block_offset, plan, n_blocks,
                                interpret)


def _pallas_partials(spec, seed, block_offset, plan, n_blocks, interpret):
    sp = spec.astype(jnp.float32)
    o = sp.option
    g = spec.n_grid
    dp, t_rem, drift, vol = node_constants(sp, jnp.float32)
    scal = jnp.stack([o.s, o.k, o.r, o.v, sp.lgd, drift, vol])
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))

    g_pad = _round_up(g, 8)
    kernel = functools.partial(_cva_kernel, plan=plan, n_grid=g)
    paths_iter = plan.rows * LANES * (2 if plan.antithetic else 1)
    out, ee = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks, 2), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, g_pad), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((g_pad, LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=20 * plan.iters * paths_iter * g,
            bytes_accessed=n_blocks * (2 + g) * 4,
            transcendentals=8 * plan.iters * paths_iter * g,
        ),
        interpret=interpret,
    )(seed_arr, off_arr, scal, dp, t_rem)
    return out, ee[:, :g]
