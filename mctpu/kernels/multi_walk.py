"""Fused multi-asset path-walk kernels: basket-Asian and basket-barrier.

Composes the basket kernel's lane packing (``mctpu/kernels/basket.py``: ``c``
paths per 128-lane row, block-diagonal Cholesky, weight-selector matmul)
with the walk skeleton of the Asian/barrier kernels: each of ``n_obs`` steps
draws a correlated asset increment for every packed path with ONE MXU matmul
``z @ chol_bd``, advances all asset spots, and reduces the basket value with
a second matmul — the monitor (running average / knockout) then acts on the
``(rows, c)`` basket values.

Beyond the reference (single-asset products only); per-step Brownian
correlation equals the terminal kernel's: increments are ``sqrt(dt) L z_j``
so the terminal distribution matches ``basket.py`` exactly (the drift vector
``d`` is applied as ``d / sqrt(n_obs)`` per step, summing to the terminal
kernel's ``d``).
"""
from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mctpu import rng as mcrng
from mctpu.kernels.basket import MATMUL_PRECISION, pack_assets, pack_factor
from mctpu.kernels.common import (GRID_SEMANTICS, LANES, Plan, chunk_sums,
                                  interpret_arg, prng_emulation, seed_prng,
                                  walk_pairwise)
from mctpu.kernels.vanilla import _accum_add, _accum_final, _accum_init

__all__ = ["make_plan", "xla_partials", "pallas_partials"]


def make_plan(n_paths: int, num_blocks: int, rows: int, antithetic: bool,
              dtype: str = "float32", kahan: bool = True,
              n_assets: int = 3) -> Plan:
    # One (rows, width) tile walks the whole grid per iteration; each row
    # packs c paths.
    _, c, _ = pack_factor(n_assets)
    units = rows * c
    paths = units * (2 if antithetic else 1)
    return Plan.plan(n_paths, num_blocks, rows, paths, units, antithetic,
                     dtype, kahan)


def _step_ops(opt, chol, dtype, n_obs: int):
    """Per-step packed operands: terminal pack rescaled to one dt step."""
    ops = pack_assets(opt, chol, dtype)
    n = jnp.asarray(float(n_obs), dtype)
    return {
        # The walk carries absolute log-spots (exact f32 sums — a product
        # of per-step TPU f32 exps compounds the chip's ~-1.6e-6 relative
        # exp bias, see kernels/cva.py).  Padded lanes (s0 = 0) carry
        # log-spot 0; the wsel/isel masks already zero them out of every
        # basket sum, so their spot value is irrelevant.
        "log_s0": jnp.where(ops["s0"] > 0, jnp.log(
            jnp.maximum(ops["s0"], 1e-30)), 0.0),
        "drift": ops["drift"] / n,             # (r - v^2/2) dt
        "vol": ops["vol"] / jnp.sqrt(n),       # v sqrt(dt)
        "d": ops["d"] / jnp.sqrt(n),           # sums to terminal d
        "chol_bd": ops["chol_bd"],
        "wsel": ops["wsel"],
    }


def _make_step(ops, monitor, mxu: bool):
    """One packed walk step: ``(s, extra) -> (s', monitor(basket', extra))``.

    ``mxu=True`` (Pallas) does the per-path basket sums with the ``wsel``
    matmul; the XLA twin uses a reshape-sum (see basket.py on why batched
    dots would break bitwise mesh invariance).
    """
    prec = MATMUL_PRECISION

    def step(j, z, carry):
        x, extra = carry
        bt = jnp.dot(z, ops["chol_bd"], precision=prec,
                     preferred_element_type=jnp.float32) + ops["d"]
        x = x + ops["drift"] + ops["vol"] * bt
        s = jnp.exp(x)
        if mxu:
            basket = jnp.dot(s, ops["wsel"], precision=prec,
                             preferred_element_type=jnp.float32)
        else:
            width = ops["chol_bd"].shape[0]
            c = ops["wsel"].shape[1]
            w_row = jnp.sum(ops["wsel"], axis=1).reshape(1, -1)
            prod = s * w_row
            basket = prod.reshape(prod.shape[0], c, width // c).sum(axis=-1)
        return (x, monitor(basket, extra))

    return step


def _monitor_fns(product: str, n_obs: int, k, barrier, up: bool):
    """(monitor, init_extra_fn, payoff) for 'asian' | 'barrier'."""
    if product == "asian":
        def monitor(basket, acc):
            return acc + basket

        def payoff(extra):
            return jnp.maximum(extra / n_obs - k, 0.0)

        init = lambda shape_c, dtype: jnp.zeros(shape_c, dtype)
        return monitor, init, payoff

    def monitor(basket, carry):
        alive, last = carry
        if up:
            alive = alive * (basket < barrier).astype(alive.dtype)
        else:
            alive = alive * (basket > barrier).astype(alive.dtype)
        return (alive, basket)

    def payoff(carry):
        alive, last = carry
        return alive * jnp.maximum(last - k, 0.0)

    init = lambda shape_c, dtype: (jnp.ones(shape_c, dtype),
                                   jnp.zeros(shape_c, dtype))
    return monitor, init, payoff


# ---------------------------------------------------------------------------
# XLA backend
# ---------------------------------------------------------------------------

def xla_partials(opt, chol, key: jax.Array, block_offset, plan: Plan,
                 n_blocks: int, *, product: str, n_obs: int,
                 barrier=None, up: bool = True):
    """Per-block partial sums ``(n_blocks, 2)`` for the packed walk."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    ops = _step_ops(o, chol, dtype, n_obs)
    width = ops["chol_bd"].shape[0]
    c = ops["wsel"].shape[1]
    monitor, init_extra, payoff = _monitor_fns(
        product, n_obs, o.k,
        None if barrier is None else jnp.asarray(barrier, dtype), up)
    shape = (plan.rows, width)
    shape_c = (plan.rows, c)

    def walk(z_seq, sgn):
        step = _make_step(ops, monitor, mxu=False)

        def body(j, carry):
            return step(j, sgn * z_seq[j], carry)

        init = (jnp.broadcast_to(ops["log_s0"], shape),
                init_extra(shape_c, dtype))
        _, extra = jax.lax.fori_loop(0, n_obs, body, init)
        return payoff(extra)

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (n_obs,) + shape, dtype)
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

def _mw_kernel(seed_ref, off_ref, scal_ref, s0_ref, drift_ref, vol_ref,
               d_ref, lt_ref, wsel_ref, out_ref, *, plan: Plan,
               product: str, n_obs: int, up: bool):
    seed_prng_base = (off_ref[0] + pl.program_id(0)) * jnp.int32(plan.iters)
    k, barrier = scal_ref[0], scal_ref[1]
    ops = {
        "log_s0": s0_ref[:], "drift": drift_ref[:], "vol": vol_ref[:],
        "d": d_ref[:], "chol_bd": lt_ref[:], "wsel": wsel_ref[:],
    }
    width = lt_ref.shape[0]
    c = wsel_ref.shape[1]
    shape = (plan.rows, width)
    shape_c = (plan.rows, c)
    monitor, init_extra, payoff = _monitor_fns(product, n_obs, k, barrier, up)
    step = _make_step(ops, monitor, mxu=True)

    def walk(i, sgn):
        # Re-seed per (block, iter): antithetic mirror replays the stream.
        seed_prng(seed_ref[0], seed_prng_base + i)

        def pair_step(j, z, carry):
            return step(j, sgn * z, carry)

        init = (jnp.broadcast_to(ops["log_s0"], shape),
                init_extra(shape_c, jnp.float32))
        _, extra = walk_pairwise(shape, n_obs, pair_step, init)
        return payoff(extra)

    def body(i, carry):
        pay = walk(i, 1.0)
        if plan.antithetic:
            pay = 0.5 * (pay + walk(i, -1.0))
        cs, cs2 = chunk_sums(pay)
        return _accum_add(carry, cs, cs2, plan.kahan)

    carry = jax.lax.fori_loop(0, plan.iters, body,
                              _accum_init(jnp.float32, plan.kahan))
    s, s2 = _accum_final(carry, plan.kahan)
    b = pl.program_id(0)
    out_ref[b, 0] = s
    out_ref[b, 1] = s2


def pallas_partials(opt, chol, seed, block_offset, plan: Plan, n_blocks: int,
                    *, product: str, n_obs: int, barrier=None,
                    up: bool = True, interpret: bool = False):
    """Per-block partial sums ``(n_blocks, 2)``, fused on TPU."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        return _pallas_partials(opt, chol, seed, block_offset, plan,
                                n_blocks, product, n_obs, barrier, up,
                                interpret)


def _pallas_partials(opt, chol, seed, block_offset, plan, n_blocks, product,
                     n_obs, barrier, up, interpret):
    o = opt.astype(jnp.float32)
    ops = _step_ops(o, chol, jnp.float32, n_obs)
    scal = jnp.stack([jnp.asarray(o.k, jnp.float32),
                      jnp.asarray(0.0 if barrier is None else barrier,
                                  jnp.float32)])
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))
    width = ops["chol_bd"].shape[0]
    c = ops["wsel"].shape[1]

    kernel = functools.partial(_mw_kernel, plan=plan, product=product,
                               n_obs=n_obs, up=up)
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
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=GRID_SEMANTICS,
        ),
        cost_estimate=pl.CostEstimate(
            flops=plan.iters * plan.rows * n_obs * (2 * width * width
                                                    + 2 * width * c
                                                    + 6 * width),
            bytes_accessed=n_blocks * 8 + 2 * width * width * 4,
            transcendentals=plan.iters * plan.rows * n_obs * (2 * width + 2),
        ),
        interpret=interpret_arg(interpret),
    )(seed_arr, off_arr, scal, ops["log_s0"], ops["drift"], ops["vol"],
      ops["d"], ops["chol_bd"], ops["wsel"])
