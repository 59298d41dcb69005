"""Fused realized-variance kernel: fair variance-swap strikes.

A variance swap pays ``notional * (RV - K_var)`` with the annualized
realized variance ``RV = (1/T) sum_j ln(S_j/S_{j-1})^2`` over ``n_obs``
observation dates; its fair strike is ``E[RV]``, which this kernel
estimates per path.  Exact oracles:

* GBM: ``E[RV] = v^2 + (r - v^2/2)^2 T / n`` — exact at ANY discrete n
  (the drift-squared term is the standard convexity bias of discrete
  sampling).
* Heston (continuous limit): ``E[(1/T) int v dt]
  = theta + (v0 - theta)(1 - e^{-kappa T})/(kappa T)`` — the textbook fair
  strike, approached as n grows.

Walk skeleton shared with the other grid kernels; the per-path state is
``(spot-state, sum of squared log-returns)``.
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
                                  draw_normal_pair, interpret_arg,
                                  prng_emulation, seed_prng, walk_pairwise)
from mctpu.kernels.heston import _heston_step
from mctpu.kernels.vanilla import _accum_add, _accum_final, _accum_init

__all__ = ["make_plan", "xla_partials", "pallas_partials"]


def make_plan(n_paths: int, num_blocks: int, rows: int, antithetic: bool,
              dtype: str = "float32", kahan: bool = True) -> Plan:
    units = rows * LANES
    paths = units * (2 if antithetic else 1)
    return Plan.plan(n_paths, num_blocks, rows, paths, units, antithetic,
                     dtype, kahan)


# ---------------------------------------------------------------------------
# XLA backend
# ---------------------------------------------------------------------------

def xla_partials(opt, key: jax.Array, block_offset, plan: Plan,
                 n_blocks: int, *, n_obs: int, dynamics: str):
    """Per-block partial sums of annualized realized variance."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    g = n_obs
    shape = (plan.rows, LANES)
    inv_t = 1.0 / jnp.asarray(o.t, dtype)

    if dynamics == "gbm":
        dt = o.t / g
        drift = (o.r - 0.5 * o.v * o.v) * dt
        vol = o.v * jnp.sqrt(dt)

        def walk(z_seq, sgn):
            def body(j, acc):
                lr = drift + vol * (sgn * z_seq[j, 0])
                return acc + lr * lr

            acc = jax.lax.fori_loop(0, g, body, jnp.zeros(shape, dtype))
            return acc * inv_t
    else:  # heston (full-truncation Euler)
        dt = o.t / g
        sqdt = jnp.sqrt(dt)
        k_dt = o.kappa * dt
        r_dt = o.r * dt
        rho_c = o.rho
        rho_s = jnp.sqrt(1.0 - o.rho * o.rho)

        def walk(z_seq, sgn):
            def body(j, carry):
                x, v, acc = carry
                # _heston_step walks log-spot: the log-return IS the
                # increment — no per-step log or exp at all.
                x_new, v_new = _heston_step(
                    x, v, sgn * z_seq[j, 0], sgn * z_seq[j, 1], k_dt,
                    o.theta, o.xi, rho_c, rho_s, r_dt, sqdt)
                lr = x_new - x
                return (x_new, v_new, acc + lr * lr)

            init = (jnp.zeros(shape, dtype),
                    jnp.full(shape, o.v0, dtype), jnp.zeros(shape, dtype))
            _, _, acc = jax.lax.fori_loop(0, g, body, init)
            return acc * inv_t

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (g, 2) + shape, dtype)
            rv = walk(z_seq, jnp.asarray(1.0, dtype))
            if plan.antithetic:
                rv = 0.5 * (rv + walk(z_seq, jnp.asarray(-1.0, dtype)))
            cs, cs2 = chunk_sums(rv)
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

def _varswap_kernel(seed_ref, off_ref, scal_ref, out_ref, *, plan: Plan,
                    n_obs: int, dynamics: str):
    shape = (plan.rows, LANES)
    b = pl.program_id(0)
    inv_t = scal_ref[0]

    def walk(i, sgn):
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)
        if dynamics == "gbm":
            drift, vol = scal_ref[1], scal_ref[2]

            def step(j, z, acc):
                lr = drift + vol * (sgn * z)
                return acc + lr * lr

            acc = walk_pairwise(shape, n_obs, step,
                                jnp.zeros(shape, jnp.float32))
            return acc * inv_t

        v0 = scal_ref[2]  # scal[1] (s0) is unused: the walk is log-relative
        k_dt, th, xi = scal_ref[3], scal_ref[4], scal_ref[5]
        rho_c, rho_s = scal_ref[6], scal_ref[7]
        r_dt, sqdt = scal_ref[8], scal_ref[9]

        def body(j, carry):
            x, v, acc = carry
            z_v, z_perp = draw_normal_pair(shape, j)
            # Log-spot walk: the log-return IS the increment — the whole
            # Heston realized-variance step has zero transcendentals
            # beyond the CIR sqrt.
            x_new, v_new = _heston_step(x, v, sgn * z_v, sgn * z_perp, k_dt,
                                        th, xi, rho_c, rho_s, r_dt, sqdt)
            lr = x_new - x
            return (x_new, v_new, acc + lr * lr)

        init = (jnp.zeros(shape, jnp.float32),
                jnp.full(shape, v0, jnp.float32),
                jnp.zeros(shape, jnp.float32))
        _, _, acc = jax.lax.fori_loop(0, n_obs, body, init)
        return acc * inv_t

    def body(i, carry):
        rv = walk(i, 1.0)
        if plan.antithetic:
            rv = 0.5 * (rv + walk(i, -1.0))
        cs, cs2 = chunk_sums(rv)
        return _accum_add(carry, cs, cs2, plan.kahan)

    carry = jax.lax.fori_loop(0, plan.iters, body,
                              _accum_init(jnp.float32, plan.kahan))
    s, s2 = _accum_final(carry, plan.kahan)
    out_ref[b, 0] = s
    out_ref[b, 1] = s2


def pallas_partials(opt, seed, block_offset, plan: Plan, n_blocks: int, *,
                    n_obs: int, dynamics: str, interpret: bool = False):
    """Per-block partial sums, shape ``(n_blocks, 2)``, fused on TPU."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        return _pallas_partials(opt, seed, block_offset, plan, n_blocks,
                                n_obs, dynamics, interpret)


def _pallas_partials(opt, seed, block_offset, plan, n_blocks, n_obs,
                     dynamics, interpret):
    o = opt.astype(jnp.float32)
    inv_t = 1.0 / jnp.asarray(o.t, jnp.float32)
    if dynamics == "gbm":
        dt = o.t / n_obs
        scal = jnp.stack([inv_t, (o.r - 0.5 * o.v * o.v) * dt,
                          o.v * jnp.sqrt(dt)])
    else:
        dt = o.t / n_obs
        scal = jnp.stack([
            inv_t, o.s, o.v0, o.kappa * dt, o.theta, o.xi, o.rho,
            jnp.sqrt(1.0 - o.rho * o.rho), o.r * dt, jnp.sqrt(dt),
        ])
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))

    kernel = functools.partial(_varswap_kernel, plan=plan, n_obs=n_obs,
                               dynamics=dynamics)
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
            flops=12 * plan.iters * paths_iter * n_obs,
            bytes_accessed=n_blocks * 8,
            transcendentals=5 * plan.iters * paths_iter * n_obs,
        ),
        interpret=interpret_arg(interpret),
    )(seed_arr, off_arr, scal)
