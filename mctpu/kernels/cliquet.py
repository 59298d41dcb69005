"""Fused cliquet kernel: locally capped/floored ratchet on period returns.

Payoff ``sum_j clip(S_j/S_{j-1} - 1, floor, cap)`` over ``n_periods``
i.i.d. GBM period returns — each step is one log-return draw, one exp and
one clamp; no spot level is carried at all (the ratchet depends on
RETURNS only, which also makes spot delta identically zero).  Exact
oracle at any period count: :func:`mctpu.math.cliquet_closed_form`
(period-return independence telescopes the expectation to a per-period
call-spread).

Greeks ride the same walk (the Greek kernels emit 8 sums): the clip
corners have measure zero, so pathwise differentiation is unbiased with
the per-period mask ``m_j = 1{floor < ret_j < cap}``:

    vega  = sum_j m_j e^{lr_j} ((lr_j - mu dt)/v - v dt)
                                     (sqrt(dt) z recovered from lr)
    rho   = sum_j m_j e^{lr_j} dt - T * pay        (discount term folded)
    theta = sum_j m_j e^{lr_j} (lr_j + mu dt)/(2T) - r * pay

every factor already in registers; gated against ``jax.grad`` of the
exact closed form.
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
                                  interpret_arg, prng_emulation, seed_prng,
                                  walk_pairwise)
from mctpu.kernels.vanilla import _accum_add, _accum_final, _accum_init

__all__ = ["make_plan", "xla_partials", "pallas_partials",
           "greek_xla_partials", "greek_pallas_partials", "N_GREEK_SUMS"]

N_GREEK_SUMS = 8  # (sum, sum^2) of: payoff, vega, rho, theta


def make_plan(n_paths: int, num_blocks: int, rows: int, antithetic: bool,
              dtype: str = "float32", kahan: bool = True) -> Plan:
    units = rows * LANES
    paths = units * (2 if antithetic else 1)
    return Plan.plan(n_paths, num_blocks, rows, paths, units, antithetic,
                     dtype, kahan)


def _price_step(z, acc, mu_dt, vol, cap, floor):
    lr = mu_dt + vol * z
    ret = jnp.exp(lr) - 1.0
    return acc + jnp.clip(ret, floor, cap)


def _greek_step(z, carry, mu_dt, vol, cap, floor, dt, inv_v):
    """One period advancing (pay, vega, rho-raw, theta-raw) tiles."""
    acc, gv, grr, gtr = carry
    lr = mu_dt + vol * z
    e = jnp.exp(lr)
    ret = e - 1.0
    m = jnp.where((ret > floor) & (ret < cap), 1.0, 0.0)
    me = m * e
    acc = acc + jnp.clip(ret, floor, cap)
    gv = gv + me * ((lr - mu_dt) * inv_v - (vol * inv_v * vol))
    grr = grr + me
    gtr = gtr + me * (lr + mu_dt)
    return (acc, gv, grr, gtr)


def _greek_finalize(carry, dt, t, r):
    acc, gv, grr, gtr = carry
    gr = grr * dt - t * acc
    gt = gtr * (0.5 / t) - r * acc
    return acc, gv, gr, gt


# ---------------------------------------------------------------------------
# XLA backend
# ---------------------------------------------------------------------------

def _scalars(o, n_periods: int, dtype):
    dt = jnp.asarray(o.t, dtype) / n_periods
    mu_dt = (o.r - 0.5 * o.v * o.v) * dt
    vol = o.v * jnp.sqrt(dt)
    return dt, mu_dt, vol


def xla_partials(opt, key: jax.Array, block_offset, plan: Plan,
                 n_blocks: int):
    """Per-block partial sums, shape ``(n_blocks, 2)``."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    g = opt.n_periods
    dt, mu_dt, vol = _scalars(o, g, dtype)
    shape = (plan.rows, LANES)

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (g,) + shape, dtype)

            def walk(sgn):
                def step(j, acc):
                    return _price_step(sgn * z_seq[j], acc, mu_dt, vol,
                                       o.cap, o.floor)

                return jax.lax.fori_loop(0, g, step,
                                         jnp.zeros(shape, dtype))

            pay = walk(jnp.asarray(1.0, dtype))
            if plan.antithetic:
                pay = 0.5 * (pay + walk(jnp.asarray(-1.0, dtype)))
            cs, cs2 = chunk_sums(pay)
            return _accum_add(carry, cs, cs2, plan.kahan)

        carry = jax.lax.fori_loop(0, plan.iters, body,
                                  _accum_init(dtype, plan.kahan))
        s, s2 = _accum_final(carry, plan.kahan)
        return jnp.stack([s, s2])

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


def greek_xla_partials(opt, key: jax.Array, block_offset, plan: Plan,
                       n_blocks: int):
    """Per-block Greek partials ``(n_blocks, 8)``."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    g = opt.n_periods
    dt, mu_dt, vol = _scalars(o, g, dtype)
    inv_v = 1.0 / o.v
    shape = (plan.rows, LANES)

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (g,) + shape, dtype)

            def walk(sgn):
                def step(j, cy):
                    return _greek_step(sgn * z_seq[j], cy, mu_dt, vol,
                                       o.cap, o.floor, dt, inv_v)

                zero = jnp.zeros(shape, dtype)
                cy = jax.lax.fori_loop(0, g, step,
                                       (zero, zero, zero, zero))
                return _greek_finalize(cy, dt, o.t, o.r)

            tiles = walk(jnp.asarray(1.0, dtype))
            if plan.antithetic:
                mt = walk(jnp.asarray(-1.0, dtype))
                tiles = tuple(0.5 * (a + b) for a, b in zip(tiles, mt))
            vals = []
            for q in tiles:
                vals.append(jnp.sum(q))
                vals.append(jnp.sum(q * q))
            return acc_add_n(carry, tuple(vals), plan.kahan)

        carry = jax.lax.fori_loop(0, plan.iters, body,
                                  acc_init_n(N_GREEK_SUMS, dtype,
                                             plan.kahan))
        return jnp.stack(acc_final_n(carry, plan.kahan))

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


# ---------------------------------------------------------------------------
# Pallas TPU backend
# ---------------------------------------------------------------------------

def _cliquet_kernel(seed_ref, off_ref, scal_ref, out_ref, *, plan: Plan,
                    n_periods: int):
    mu_dt, vol, cap, floor = (scal_ref[0], scal_ref[1], scal_ref[2],
                              scal_ref[3])
    shape = (plan.rows, LANES)
    b = pl.program_id(0)

    def walk(i, sgn):
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)
        return walk_pairwise(
            shape, n_periods,
            lambda j, z, acc: _price_step(sgn * z, acc, mu_dt, vol, cap,
                                          floor),
            jnp.zeros(shape, jnp.float32))

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


def pallas_partials(opt, seed, block_offset, plan: Plan, n_blocks: int,
                    interpret: bool = False):
    """Per-block partial sums ``(n_blocks, 2)``, fused on TPU."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        o = opt.astype(jnp.float32)
        g = opt.n_periods
        dt, mu_dt, vol = _scalars(o, g, jnp.float32)
        scal = jnp.stack([mu_dt, vol, jnp.asarray(o.cap, jnp.float32),
                          jnp.asarray(o.floor, jnp.float32)])
        kernel = functools.partial(_cliquet_kernel, plan=plan,
                                   n_periods=g)
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
                flops=8 * plan.iters * paths_iter * g,
                bytes_accessed=n_blocks * 8,
                transcendentals=4 * plan.iters * paths_iter * g,
            ),
            interpret=interpret_arg(interpret),
        )(jnp.atleast_1d(jnp.asarray(seed, jnp.int32)),
          jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32)), scal).reshape(n_blocks, 2)


def _cliquet_greeks_kernel(seed_ref, off_ref, scal_ref, out_ref, *,
                           plan: Plan, n_periods: int):
    mu_dt, vol, cap, floor = (scal_ref[0], scal_ref[1], scal_ref[2],
                              scal_ref[3])
    dt, t, r, inv_v = (scal_ref[4], scal_ref[5], scal_ref[6], scal_ref[7])
    shape = (plan.rows, LANES)
    b = pl.program_id(0)

    def walk(i, sgn):
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)
        zero = jnp.zeros(shape, jnp.float32)
        cy = walk_pairwise(
            shape, n_periods,
            lambda j, z, c: _greek_step(sgn * z, c, mu_dt, vol, cap,
                                        floor, dt, inv_v),
            (zero, zero, zero, zero))
        return _greek_finalize(cy, dt, t, r)

    def body(i, carry):
        tiles = walk(i, 1.0)
        if plan.antithetic:
            mt = walk(i, -1.0)
            tiles = tuple(0.5 * (a + b2) for a, b2 in zip(tiles, mt))
        vals = []
        for q in tiles:
            vals.append(jnp.sum(q))
            vals.append(jnp.sum(q * q))
        return acc_add_n(carry, tuple(vals), plan.kahan)

    carry = jax.lax.fori_loop(0, plan.iters, body,
                              acc_init_n(N_GREEK_SUMS, jnp.float32,
                                         plan.kahan))
    vals = acc_final_n(carry, plan.kahan)
    for j in range(N_GREEK_SUMS):
        out_ref[0, 0, j] = vals[j]


def greek_pallas_partials(opt, seed, block_offset, plan: Plan,
                          n_blocks: int, interpret: bool = False):
    """Fused cliquet Greek partials ``(n_blocks, 8)`` on TPU."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        o = opt.astype(jnp.float32)
        g = opt.n_periods
        dt, mu_dt, vol = _scalars(o, g, jnp.float32)
        scal = jnp.stack([mu_dt, vol, jnp.asarray(o.cap, jnp.float32),
                          jnp.asarray(o.floor, jnp.float32), dt,
                          jnp.asarray(o.t, jnp.float32), o.r, 1.0 / o.v])
        kernel = functools.partial(_cliquet_greeks_kernel, plan=plan,
                                   n_periods=g)
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
                flops=16 * plan.iters * paths_iter * g,
                bytes_accessed=n_blocks * 4 * N_GREEK_SUMS,
                transcendentals=4 * plan.iters * paths_iter * g,
            ),
            interpret=interpret_arg(interpret),
        )(jnp.atleast_1d(jnp.asarray(seed, jnp.int32)),
          jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32)), scal).reshape(n_blocks, N_GREEK_SUMS)
