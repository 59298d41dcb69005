"""Fused vanilla European call Monte Carlo kernel.

TPU-native rebuild of ``vanillaOptMonteCarlo`` (``MonteCarloKernel.cu:179-221``):
per simulation block, generate normals, take one terminal GBM step, evaluate
the call payoff and accumulate ``(sum_p, sum_p2)`` — all fused in VMEM.  The
reference's shared-memory tree reduction + host loop becomes an on-chip VPU
reduction + (in the engine) a pairwise combine across blocks.
"""
from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mctpu import rng as mcrng
from mctpu.kernels.common import (GRID_SEMANTICS, LANES, Plan,
                                  block_out_shape, block_out_spec,
                                  chunk_sums, draw_normal_pair,
                                  interpret_arg, prng_emulation, seed_prng, walk_steps)
from mctpu.types import VanillaOption
from mctpu.utils.accum import kahan_add

__all__ = ["make_plan", "xla_partials", "pallas_partials"]


def make_plan(n_paths: int, num_blocks: int, rows: int, antithetic: bool,
              dtype: str = "float32", kahan: bool = True) -> Plan:
    units = 2 * rows * LANES  # both Box-Muller branches per iteration
    paths = units * (2 if antithetic else 1)
    return Plan.plan(n_paths, num_blocks, rows, paths, units, antithetic, dtype, kahan)


def _accum_init(dtype, kahan: bool):
    z = jnp.zeros((), dtype)
    return ((z, z), (z, z)) if kahan else (z, z)


def _accum_add(carry, cs, cs2, kahan: bool):
    if kahan:
        a, b = carry
        return (kahan_add(a, cs), kahan_add(b, cs2))
    s, s2 = carry
    return (s + cs, s2 + cs2)


def _accum_final(carry, kahan: bool):
    if kahan:
        (s, c), (s2, c2) = carry
        return s + c, s2 + c2
    return carry


def _payoffs(s0, k, mu, sig, z, antithetic: bool, put: bool = False):
    """Option payoff(s) of a tile of normals; pair-mean when antithetic.

    Call: ``max(s0 * exp(mu + sig*z) - k, 0)`` per ``callPayoff``
    (``MonteCarloKernel.cu:67-71``); put mirrors it (beyond the reference's
    call-only scope).  With antithetic variates the i.i.d. estimator unit is
    the pair mean ``(p(z) + p(-z)) / 2``.
    """
    if put:
        pay = lambda zz: jnp.maximum(k - s0 * jnp.exp(mu + sig * zz), 0.0)
    else:
        pay = lambda zz: jnp.maximum(s0 * jnp.exp(mu + sig * zz) - k, 0.0)
    if antithetic:
        return 0.5 * (pay(z) + pay(-z))
    return pay(z)


# ---------------------------------------------------------------------------
# XLA backend (Threefry streams; CPU tests + non-TPU fallback)
# ---------------------------------------------------------------------------

def xla_partials(opt: VanillaOption, key: jax.Array, block_offset, plan: Plan,
                 n_blocks: int):
    """Per-block partial sums, shape ``(n_blocks, 2)``, via jax.random."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    mu = (o.r - 0.5 * o.v * o.v) * o.t
    sig = o.v * jnp.sqrt(o.t)

    def block_fn(bkey):
        def body(i, carry):
            zk = jax.random.fold_in(bkey, i)
            z = jax.random.normal(zk, (2, plan.rows, LANES), dtype)
            p = _payoffs(o.s, o.k, mu, sig, z, plan.antithetic,
                         put=opt.kind == "put")
            cs, cs2 = chunk_sums(p)
            return _accum_add(carry, cs, cs2, plan.kahan)

        carry = jax.lax.fori_loop(0, plan.iters, body, _accum_init(dtype, plan.kahan))
        s, s2 = _accum_final(carry, plan.kahan)
        return jnp.stack([s, s2])

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


# ---------------------------------------------------------------------------
# Pallas TPU backend (in-kernel hardware PRNG; f32 only)
# ---------------------------------------------------------------------------

def _vanilla_kernel(seed_ref, off_ref, par_ref, out_ref, *, plan: Plan,
                    put: bool):
    seed_prng(seed_ref[0], off_ref[0] + pl.program_id(0))
    s0, k, mu, sig = par_ref[0], par_ref[1], par_ref[2], par_ref[3]

    # Scalar accumulators with a per-iteration tree reduction: measured ~16%
    # faster than carrying (rows, 128) vector accumulators through the loop
    # (large fori_loop carries cost more than the VPU reduction here); Kahan
    # compensation rides on the cheap scalar adds.
    def body(i, carry):
        z1, z2 = draw_normal_pair((plan.rows, LANES), i)
        p1 = _payoffs(s0, k, mu, sig, z1, plan.antithetic, put=put)
        p2 = _payoffs(s0, k, mu, sig, z2, plan.antithetic, put=put)
        cs = jnp.sum(p1) + jnp.sum(p2)
        cs2 = jnp.sum(p1 * p1) + jnp.sum(p2 * p2)
        return _accum_add(carry, cs, cs2, plan.kahan)

    # unroll 2: pipelines the two-tile bodies across iterations
    # (bitwise-neutral, see common.walk_steps / WALK_UNROLL notes).
    carry = walk_steps(plan.iters, body,
                       _accum_init(jnp.float32, plan.kahan), unroll=2)
    s, s2 = _accum_final(carry, plan.kahan)
    out_ref[0, 0, 0] = s
    out_ref[0, 0, 1] = s2


def pallas_partials(opt: VanillaOption, seed, block_offset, plan: Plan,
                    n_blocks: int, interpret: bool = False):
    """Per-block partial sums, shape ``(n_blocks, 2)``, fused on TPU."""
    # Mosaic has no i64/f64; trace the kernel with x64 semantics off so
    # literals and index arithmetic stay 32-bit even when the caller enabled
    # x64 for the estimator tail.
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        return _pallas_partials(opt, seed, block_offset, plan, n_blocks,
                                interpret)


def _pallas_partials(opt, seed, block_offset, plan, n_blocks, interpret):
    o = opt.astype(jnp.float32)
    mu = (o.r - 0.5 * o.v * o.v) * o.t
    sig = o.v * jnp.sqrt(o.t)
    params = jnp.stack([o.s, o.k, mu, sig])
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))

    kernel = functools.partial(_vanilla_kernel, plan=plan,
                               put=opt.kind == "put")
    flops_iter = plan.rows * LANES * 2 * (2 if plan.antithetic else 1)
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
            flops=10 * plan.iters * flops_iter,
            bytes_accessed=n_blocks * 8,
            transcendentals=5 * plan.iters * flops_iter,
        ),
        interpret=interpret_arg(interpret),
    )(seed_arr, off_arr, params).reshape(n_blocks, 2)
