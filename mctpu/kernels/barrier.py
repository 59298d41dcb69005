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
from mctpu.kernels.common import (GRID_SEMANTICS, LANES, Plan, chunk_sums,
                                  interpret_arg, prng_emulation, seed_prng,
                                  walk_pairwise)
from mctpu.kernels.vanilla import _accum_add, _accum_final, _accum_init
from mctpu.types import BarrierOption

__all__ = ["make_plan", "xla_partials", "pallas_partials"]


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
    out_ref[b, 0] = s
    out_ref[b, 1] = s2


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
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=GRID_SEMANTICS,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * plan.iters * paths_iter * opt.n_obs,
            bytes_accessed=n_blocks * 8,
            transcendentals=4 * plan.iters * paths_iter * opt.n_obs,
        ),
        interpret=interpret_arg(interpret),
    )(seed_arr, off_arr, scal)
