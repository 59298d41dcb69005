"""Fused basket-call Monte Carlo kernel (correlated multi-asset GBM).

TPU-native rebuild of ``basketOptMonteCarlo`` (``MonteCarloKernel.cu:133-177``):
per path, draw an asset vector of normals, correlate it with the Cholesky
factor, take terminal GBM steps per asset and evaluate the weighted basket
call.  The reference's serial per-asset loops (``brownianVect``,
``MonteCarloKernel.cu:74-87``) become one MXU matmul per path tile: normals
``(rows, A_pad) @ L^T (A_pad, A_pad)`` with the asset dimension padded to the
128-lane boundary (runtime ``n_assets``, vs the reference's compile-time
``N=3``).
"""
from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mctpu import rng as mcrng
from mctpu.kernels.common import (LANES, Plan, chunk_sums,
                                  draw_normal_pair, interpret_arg,
                                  prng_emulation, seed_prng)
from mctpu.kernels.vanilla import _accum_add, _accum_final, _accum_init
from mctpu.types import BasketOption

__all__ = ["make_plan", "xla_partials", "pallas_partials", "pad_assets"]


def make_plan(n_paths: int, num_blocks: int, rows: int, antithetic: bool,
              dtype: str = "float32", kahan: bool = True) -> Plan:
    # Each iteration draws two (rows, A_pad) normal tiles -> 2*rows paths.
    units = 2 * rows
    paths = units * (2 if antithetic else 1)
    return Plan.plan(n_paths, num_blocks, rows, paths, units, antithetic, dtype, kahan)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pad_assets(opt: BasketOption, chol, dtype, lanes: int = LANES):
    """Pad per-asset operands to the lane boundary with payoff-neutral zeros.

    Padded lanes have s0 = w = v = 0 and zero Cholesky rows, so they
    contribute exactly 0 to the basket sum.  Returns 2-D row vectors
    ``(1, A_pad)`` (TPU wants >=2-D) plus ``chol_t`` ``(A_pad, A_pad)`` laid
    out so ``bt = z @ chol_t + d`` equals ``L @ z + d`` per path.
    """
    a = opt.n_assets
    ap = _round_up(max(a, 1), lanes)

    def row(x):
        return jnp.zeros((1, ap), dtype).at[0, :a].set(jnp.asarray(x, dtype))

    chol_t = jnp.zeros((ap, ap), dtype).at[:a, :a].set(jnp.asarray(chol, dtype).T)
    return {
        "s0": row(opt.s),
        "v": row(opt.v),
        "w": row(opt.w),
        "d": row(opt.d),
        "chol_t": chol_t,
    }


def _payoff_tile(ops, k, r, t, z, antithetic: bool):
    """Basket payoff of one (rows, A_pad) normal tile; pair-mean if antithetic.

    Mirrors ``brownianVect`` + ``basketPayoff`` (``MonteCarloKernel.cu:74-101``):
    ``bt = L z + d``; ``s_j = s0_j exp((r - v_j^2/2) t + v_j sqrt(t) bt_j)``;
    ``payoff = max(sum_j w_j s_j - k, 0)``.
    """
    drift = (r - 0.5 * ops["v"] * ops["v"]) * t
    vol = ops["v"] * jnp.sqrt(t)

    def pay(zz):
        bt = jnp.dot(zz, ops["chol_t"], preferred_element_type=jnp.float32) + ops["d"]
        s_t = ops["s0"] * jnp.exp(drift + vol * bt)
        # keepdims: Mosaic wants >=2-D vectors; (rows, 1) stays tiled.
        basket = jnp.sum(s_t * ops["w"], axis=-1, keepdims=True)
        return jnp.maximum(basket - k, 0.0)

    if antithetic:
        return 0.5 * (pay(z) + pay(-z))
    return pay(z)


# ---------------------------------------------------------------------------
# XLA backend
# ---------------------------------------------------------------------------

def xla_partials(opt: BasketOption, chol, key: jax.Array, block_offset,
                 plan: Plan, n_blocks: int):
    """Per-block partial sums, shape ``(n_blocks, 2)``, via jax.random."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    ops = pad_assets(o, chol, dtype)
    a_pad = ops["chol_t"].shape[0]

    def block_fn(bkey):
        def body(i, carry):
            zk = jax.random.fold_in(bkey, i)
            z = jax.random.normal(zk, (2 * plan.rows, a_pad), dtype)
            p = _payoff_tile(ops, o.k, o.r, o.t, z, plan.antithetic)
            cs, cs2 = chunk_sums(p)
            return _accum_add(carry, cs, cs2, plan.kahan)

        carry = jax.lax.fori_loop(0, plan.iters, body, _accum_init(dtype, plan.kahan))
        s, s2 = _accum_final(carry, plan.kahan)
        return jnp.stack([s, s2])

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


# ---------------------------------------------------------------------------
# Pallas TPU backend
# ---------------------------------------------------------------------------

def _basket_kernel(seed_ref, off_ref, scal_ref, s0_ref, v_ref, w_ref, d_ref,
                   lt_ref, out_ref, *, plan: Plan):
    seed_prng(seed_ref[0], off_ref[0] + pl.program_id(0))
    k, r, t = scal_ref[0], scal_ref[1], scal_ref[2]
    ops = {
        "s0": s0_ref[:],
        "v": v_ref[:],
        "w": w_ref[:],
        "d": d_ref[:],
        "chol_t": lt_ref[:],
    }
    a_pad = lt_ref.shape[0]

    # Scalar accumulators with per-iteration reductions (see the measured
    # note in vanilla.py: small loop carries beat vector accumulators).
    def body(i, carry):
        z1, z2 = draw_normal_pair((plan.rows, a_pad), i)
        p1 = _payoff_tile(ops, k, r, t, z1, plan.antithetic)
        p2 = _payoff_tile(ops, k, r, t, z2, plan.antithetic)
        cs = jnp.sum(p1) + jnp.sum(p2)
        cs2 = jnp.sum(p1 * p1) + jnp.sum(p2 * p2)
        return _accum_add(carry, cs, cs2, plan.kahan)

    carry = jax.lax.fori_loop(0, plan.iters, body,
                              _accum_init(jnp.float32, plan.kahan))
    s, s2 = _accum_final(carry, plan.kahan)
    b = pl.program_id(0)
    out_ref[b, 0] = s
    out_ref[b, 1] = s2


def pallas_partials(opt: BasketOption, chol, seed, block_offset, plan: Plan,
                    n_blocks: int, interpret: bool = False):
    """Per-block partial sums, shape ``(n_blocks, 2)``, fused on TPU."""
    # Mosaic has no i64/f64: trace with x64 semantics off (see vanilla.py).
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        return _pallas_partials(opt, chol, seed, block_offset, plan,
                                n_blocks, interpret)


def _pallas_partials(opt, chol, seed, block_offset, plan, n_blocks, interpret):
    o = opt.astype(jnp.float32)
    ops = pad_assets(o, chol, jnp.float32)
    a_pad = ops["chol_t"].shape[0]
    scal = jnp.stack([o.k, o.r, o.t])
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))

    kernel = functools.partial(_basket_kernel, plan=plan)
    paths_iter = 2 * plan.rows * (2 if plan.antithetic else 1)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=plan.iters * paths_iter * (2 * a_pad * a_pad + 6 * a_pad),
            bytes_accessed=n_blocks * 8 + a_pad * a_pad * 4,
            transcendentals=plan.iters * paths_iter * (2 * a_pad + 2),
        ),
        interpret=interpret_arg(interpret),
    )(seed_arr, off_arr, scal, ops["s0"], ops["v"], ops["w"], ops["d"], ops["chol_t"])
