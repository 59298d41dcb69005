"""Fused Longstaff-Schwartz forward-pricing kernel (frozen exercise rule).

Round-2 review: the LSM pricing pass was "an engine apart" — a plain XLA
``lax.scan`` with no Pallas kernel, no ``EngineConfig``, no mesh.  This
kernel gives the American forward pass the same tier as the CVA walk
(``kernels/cva.py``): the GBM recurrence stays register-resident, normals
come from the in-kernel hardware PRNG (both Box-Muller branches consumed
via ``walk_pairwise``), and the frozen rule is one 4-term Horner polynomial
compare per exercise date:

    y    = s / k - 1                      (centered moneyness)
    cont = b0 + y (b1 + y (b2 + y b3))    (per-date regression row)
    exercise iff alive & payoff > 0 & payoff > cont

The per-date rows ``beta (n_steps-1, 4)`` and discounts ``df_j = e^{-r t_j}``
sit in SMEM; the walk carries ``(spot, cashflow, alive)`` per lane.  Per
block the kernel emits Kahan-compensated ``(sum_cf, sum_cf2)`` of the
present-value cashflows — the engine applies the standard estimator with
discount 1.  Two-pass semantics (rule fitted on independent pilot paths,
``mctpu/lsm.py``) are unchanged: this kernel only replaces the execution
tier of pass 2.
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

_BASIS = 4


def make_plan(n_paths: int, num_blocks: int, rows: int, antithetic: bool,
              dtype: str = "float32", kahan: bool = True) -> Plan:
    # One (rows, 128) tile of paths walks the whole exercise grid per
    # iteration (same geometry as the CVA walk kernel).
    units = rows * LANES
    paths = units * (2 if antithetic else 1)
    return Plan.plan(n_paths, num_blocks, rows, paths, units, antithetic,
                     dtype, kahan)


def _payoff(put: bool, s, k):
    return jnp.maximum(k - s, 0.0) if put else jnp.maximum(s - k, 0.0)


def _continuation(s, inv_k, b0, b1, b2, b3):
    # Moneyness basis via a precomputed reciprocal: a per-step per-path
    # division by the (traced) strike is a multi-pass VPU op the compiler
    # cannot strength-reduce on its own (roofline lever, round 4).
    y = s * inv_k - 1.0
    return b0 + y * (b1 + y * (b2 + y * b3))


# ---------------------------------------------------------------------------
# XLA backend (Threefry streams; CPU tests + non-TPU fallback)
# ---------------------------------------------------------------------------

def xla_partials(opt, beta, key: jax.Array, block_offset, plan: Plan,
                 n_blocks: int, n_steps: int, put: bool):
    """Per-block partials ``(n_blocks, 2)`` of PV cashflow sums.

    ``beta``: (n_steps - 1, 4) frozen regression rows (traced operand —
    refitting the rule never recompiles the pricer).
    """
    dtype = plan.jdtype
    s0 = jnp.asarray(opt.s, dtype)
    k = jnp.asarray(opt.k, dtype)
    r = jnp.asarray(opt.r, dtype)
    v = jnp.asarray(opt.v, dtype)
    t = jnp.asarray(opt.t, dtype)
    beta = jnp.asarray(beta, dtype)
    if beta.shape[0] == 0:  # n_steps == 1: no exercise dates
        beta = jnp.zeros((1, _BASIS), dtype)
    dt = t / n_steps
    drift = (r - 0.5 * v * v) * dt
    vol = v * jnp.sqrt(dt)
    df = jnp.exp(-r * dt * jnp.arange(1, n_steps + 1, dtype=dtype))
    shape = (plan.rows, LANES)

    log_s0 = jnp.log(s0)

    def walk(z_seq, sgn):
        def body(j, carry):
            # Log-space carry (see kernels/cva.py): the per-date exp does
            # not compound the TPU f32 exp bias across the grid.
            log_s, cf, alive = carry
            log_s = log_s + drift + vol * (sgn * z_seq[j])
            s = jnp.exp(log_s)
            pay = _payoff(put, s, k)

            def decide(args):
                cf, alive = args
                b = jax.lax.dynamic_index_in_dim(beta, j, keepdims=False)
                cont = _continuation(s, 1.0 / k, b[0], b[1], b[2], b[3])
                ex = alive * jnp.where((pay > 0) & (pay > cont), 1.0, 0.0)
                return cf + df[j] * ex * pay, alive - ex

            def mature(args):
                cf, alive = args
                return cf + df[j] * alive * pay, alive * 0.0

            cf, alive = jax.lax.cond(j < n_steps - 1, decide, mature,
                                     (cf, alive))
            return (log_s, cf, alive)

        init = (jnp.full(shape, log_s0, dtype), jnp.zeros(shape, dtype),
                jnp.ones(shape, dtype))
        _, cf, _ = jax.lax.fori_loop(0, n_steps, body, init)
        return cf

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (n_steps,) + shape, dtype)
            cf = walk(z_seq, jnp.asarray(1.0, dtype))
            if plan.antithetic:
                cf = 0.5 * (cf + walk(z_seq, jnp.asarray(-1.0, dtype)))
            cs, cs2 = chunk_sums(cf)
            return _accum_add(carry, cs, cs2, plan.kahan)

        carry = jax.lax.fori_loop(0, plan.iters, body,
                                  _accum_init(dtype, plan.kahan))
        s, s2 = _accum_final(carry, plan.kahan)
        return jnp.stack([s, s2])

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


# ---------------------------------------------------------------------------
# Pallas TPU backend (in-kernel hardware PRNG; f32 only)
# ---------------------------------------------------------------------------

def _lsm_kernel(seed_ref, off_ref, scal_ref, beta_ref, df_ref, out_ref, *,
                plan: Plan, n_steps: int, put: bool):
    s0, k, drift, vol = (scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3])
    inv_k = scal_ref[4]
    shape = (plan.rows, LANES)
    b = pl.program_id(0)

    def walk(i, sgn):
        # (Re)seed per (block, iteration): the antithetic mirror replays the
        # exact stream with the opposite sign (same scheme as kernels/cva.py).
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)

        def step(j, z, carry):
            # Log-space carry: see the XLA twin above.
            log_s, cf, alive = carry
            log_s = log_s + drift + vol * (sgn * z)
            s = jnp.exp(log_s)
            pay = _payoff(put, s, k)
            cont = _continuation(s, inv_k, beta_ref[j, 0], beta_ref[j, 1],
                                 beta_ref[j, 2], beta_ref[j, 3])
            # Maturity (j == n_steps - 1) pays every still-alive path;
            # earlier dates exercise only above the continuation value.
            is_last = jnp.where(j == n_steps - 1, 1.0, 0.0)
            rule = jnp.where((pay > 0) & (pay > cont), 1.0, 0.0)
            ex = alive * jnp.maximum(rule, is_last)
            cf = cf + df_ref[j] * ex * pay
            return (log_s, cf, alive - ex)

        init = (jnp.full(shape, jnp.log(s0), jnp.float32),
                jnp.zeros(shape, jnp.float32),
                jnp.ones(shape, jnp.float32))
        _, cf, _ = walk_pairwise(shape, n_steps, step, init)
        return cf

    def body(i, carry):
        if plan.antithetic:
            cf = 0.5 * (walk(i, 1.0) + walk(i, -1.0))
        else:
            cf = walk(i, 1.0)
        cs, cs2 = chunk_sums(cf)
        return _accum_add(carry, cs, cs2, plan.kahan)

    carry = jax.lax.fori_loop(0, plan.iters, body,
                              _accum_init(jnp.float32, plan.kahan))
    s, s2 = _accum_final(carry, plan.kahan)
    out_ref[0, 0, 0] = s
    out_ref[0, 0, 1] = s2


def pallas_partials(opt, beta, seed, block_offset, plan: Plan,
                    n_blocks: int, n_steps: int, put: bool,
                    interpret: bool = False):
    """Per-block partials ``(n_blocks, 2)`` of PV cashflow sums, fused."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        return _pallas_partials(opt, beta, seed, block_offset, plan,
                                n_blocks, n_steps, put, interpret)


def _pallas_partials(opt, beta, seed, block_offset, plan, n_blocks, n_steps,
                     put, interpret):
    s0 = jnp.asarray(opt.s, jnp.float32)
    k = jnp.asarray(opt.k, jnp.float32)
    r = jnp.asarray(opt.r, jnp.float32)
    v = jnp.asarray(opt.v, jnp.float32)
    t = jnp.asarray(opt.t, jnp.float32)
    dt = t / n_steps
    drift = (r - 0.5 * v * v) * dt
    vol = v * jnp.sqrt(dt)
    scal = jnp.stack([s0, k, drift, vol, 1.0 / k])
    beta = jnp.asarray(beta, jnp.float32)
    if beta.shape[0] == 0:
        beta = jnp.zeros((1, _BASIS), jnp.float32)
    # The maturity row is never used as a rule (is_last forces exercise);
    # pad beta to n_steps rows so beta_ref[j] is always in bounds.
    pad = n_steps - beta.shape[0]
    if pad > 0:
        beta = jnp.concatenate(
            [beta, jnp.zeros((pad, _BASIS), jnp.float32)], axis=0)
    df = jnp.exp(-r * dt * jnp.arange(1, n_steps + 1, dtype=jnp.float32))
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))

    kernel = functools.partial(_lsm_kernel, plan=plan, n_steps=n_steps,
                               put=put)
    paths_iter = plan.rows * LANES * (2 if plan.antithetic else 1)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
            flops=16 * plan.iters * paths_iter * n_steps,
            bytes_accessed=n_blocks * 8 + n_steps * 20,
            transcendentals=4 * plan.iters * paths_iter * n_steps,
        ),
        interpret=interpret_arg(interpret),
    )(seed_arr, off_arr, scal, beta, df).reshape(n_blocks, 2)


# ---------------------------------------------------------------------------
# Fixed-rule pathwise Greeks (delta, vega, rho) — the frozen exercise rule
# makes the American sensitivity a plain pathwise problem
# ---------------------------------------------------------------------------
# With the rule frozen, the forward pass prices a *fixed stopping policy*
# tau(omega); its value V_rule(s0, v, r) = E[e^{-r tau} payoff(S_tau)] is the
# quantity the engine reports, and the Greeks below are the derivatives of
# exactly that function (the standard production method for Bermudan/American
# sensitivities — Piterbarg 2004; Glasserman sec. 7.2.4: at the trigger the
# exercise value equals the continuation estimate, so the boundary term of
# the policy-value derivative is second-order in the regression error).
#
# Per path, exercise fires once at date t_j with df_j = e^{-r t_j}:
#
#     put  cashflow df_j (K - S_j):  d/ds0 = -df_j S_j / s0
#                                    d/dv  = -df_j S_j f_j
#                                    d/dr  = -t_j df_j K          (exact:
#                                        the -t_j df (K - S) discount term
#                                        and the -df t_j S_j drift term sum
#                                        to -t_j df_j K)
#     call mirrors with +; f_j = d(log S_j)/dv is recovered from the CARRIED
#     log-spot with one FMA (same identity as kernels/asian.py):
#
#         f_j = log(S_j) / v - t_j (r + v^2/2) / v - log(s0) / v
#             = log_s * inv_v + vc[j]            (vc: per-date SMEM table)
#
# At maturity still-alive OTM paths pay zero with zero derivative (the kink
# has measure zero), masked by ind = 1{payoff > 0}.  No theta: the exercise
# grid itself moves with maturity, so d/dt is not a pathwise quantity here.
#
# Per block the kernels emit N_GREEK_SUMS = 8 partials
# (sum, sum^2 of: PV cashflow, delta, vega, rho) under the same mesh /
# fixed-order-combine / estimator contract (discount 1 — cashflows are
# already present-value), so American Greeks are bitwise shard-invariant.

N_GREEK_SUMS = 8  # (sum, sum^2) of: PV cashflow, delta, vega, rho


def _greek_tables(k, r, v, t, n_steps: int, put: bool, dtype, log_s0):
    """Per-date tables (df, vega offset vc, rho coefficient) + scalars."""
    dt = t / n_steps
    tj = dt * jnp.arange(1, n_steps + 1, dtype=dtype)
    df = jnp.exp(-r * tj)
    inv_v = 1.0 / v
    psign = jnp.asarray(-1.0 if put else 1.0, dtype)
    vc = -(r + 0.5 * v * v) * inv_v * tj - log_s0 * inv_v
    rhoc = psign * tj * df * k
    return df, vc, rhoc, inv_v, psign


def greek_xla_partials(opt, beta, key: jax.Array, block_offset, plan: Plan,
                       n_blocks: int, n_steps: int, put: bool):
    """Per-block Greek partials ``(n_blocks, 8)`` under the frozen rule."""
    dtype = plan.jdtype
    s0 = jnp.asarray(opt.s, dtype)
    k = jnp.asarray(opt.k, dtype)
    r = jnp.asarray(opt.r, dtype)
    v = jnp.asarray(opt.v, dtype)
    t = jnp.asarray(opt.t, dtype)
    beta = jnp.asarray(beta, dtype)
    if beta.shape[0] == 0:  # n_steps == 1: no exercise dates
        beta = jnp.zeros((1, _BASIS), dtype)
    dt = t / n_steps
    drift = (r - 0.5 * v * v) * dt
    vol = v * jnp.sqrt(dt)
    log_s0 = jnp.log(s0)
    inv_s0 = 1.0 / s0
    df, vc, rhoc, inv_v, psign = _greek_tables(k, r, v, t, n_steps, put,
                                               dtype, log_s0)
    shape = (plan.rows, LANES)

    def walk(z_seq, sgn):
        def body(j, carry):
            log_s, cf, alive, gd, gv, gr = carry
            log_s = log_s + drift + vol * (sgn * z_seq[j])
            s = jnp.exp(log_s)
            pay = _payoff(put, s, k)
            b = jax.lax.dynamic_index_in_dim(beta,
                                             jnp.minimum(j, n_steps - 2),
                                             keepdims=False)
            cont = _continuation(s, 1.0 / k, b[0], b[1], b[2], b[3])
            is_last = jnp.where(j == n_steps - 1, 1.0, 0.0)
            rule = jnp.where((pay > 0) & (pay > cont), 1.0, 0.0)
            ex = alive * jnp.maximum(rule, is_last)
            exi = ex * jnp.where(pay > 0, 1.0, 0.0)
            dfj = df[j]
            cf = cf + dfj * ex * pay
            wp = (psign * dfj) * (exi * s)
            gd = gd + wp * inv_s0
            gv = gv + wp * (log_s * inv_v + vc[j])
            gr = gr + exi * rhoc[j]
            return (log_s, cf, alive - ex, gd, gv, gr)

        init = (jnp.full(shape, log_s0, dtype), jnp.zeros(shape, dtype),
                jnp.ones(shape, dtype), jnp.zeros(shape, dtype),
                jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        _, cf, _, gd, gv, gr = jax.lax.fori_loop(0, n_steps, body, init)
        return (cf, gd, gv, gr)

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (n_steps,) + shape, dtype)
            tiles = walk(z_seq, jnp.asarray(1.0, dtype))
            if plan.antithetic:
                mirror = walk(z_seq, jnp.asarray(-1.0, dtype))
                tiles = tuple(0.5 * (a + b)
                              for a, b in zip(tiles, mirror))
            sums = []
            for q in tiles:
                sums.append(jnp.sum(q))
                sums.append(jnp.sum(q * q))
            return acc_add_n(carry, sums, plan.kahan)

        carry = jax.lax.fori_loop(0, plan.iters, body,
                                  acc_init_n(N_GREEK_SUMS, dtype,
                                             plan.kahan))
        return jnp.stack(acc_final_n(carry, plan.kahan))

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


def _lsm_greeks_kernel(seed_ref, off_ref, scal_ref, beta_ref, df_ref,
                       vc_ref, rhoc_ref, out_ref, *, plan: Plan,
                       n_steps: int, put: bool):
    s0, k, drift, vol = (scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3])
    inv_k, inv_v, psign, inv_s0 = (scal_ref[4], scal_ref[5], scal_ref[6],
                                   scal_ref[7])
    shape = (plan.rows, LANES)
    b = pl.program_id(0)

    def walk(i, sgn):
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)

        def step(j, z, carry):
            log_s, cf, alive, gd, gv, gr = carry
            log_s = log_s + drift + vol * (sgn * z)
            s = jnp.exp(log_s)
            pay = _payoff(put, s, k)
            cont = _continuation(s, inv_k, beta_ref[j, 0], beta_ref[j, 1],
                                 beta_ref[j, 2], beta_ref[j, 3])
            is_last = jnp.where(j == n_steps - 1, 1.0, 0.0)
            rule = jnp.where((pay > 0) & (pay > cont), 1.0, 0.0)
            ex = alive * jnp.maximum(rule, is_last)
            exi = ex * jnp.where(pay > 0, 1.0, 0.0)
            dfj = df_ref[j]
            cf = cf + dfj * ex * pay
            wp = (psign * dfj) * (exi * s)
            gd = gd + wp * inv_s0
            gv = gv + wp * (log_s * inv_v + vc_ref[j])
            gr = gr + exi * rhoc_ref[j]
            return (log_s, cf, alive - ex, gd, gv, gr)

        init = (jnp.full(shape, jnp.log(s0), jnp.float32),
                jnp.zeros(shape, jnp.float32),
                jnp.ones(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32))
        _, cf, _, gd, gv, gr = walk_pairwise(shape, n_steps, step, init)
        return (cf, gd, gv, gr)

    def body(i, carry):
        tiles = walk(i, 1.0)
        if plan.antithetic:
            mirror = walk(i, -1.0)
            tiles = tuple(0.5 * (a + b) for a, b in zip(tiles, mirror))
        sums = []
        for q in tiles:
            sums.append(jnp.sum(q))
            sums.append(jnp.sum(q * q))
        return acc_add_n(carry, sums, plan.kahan)

    carry = jax.lax.fori_loop(0, plan.iters, body,
                              acc_init_n(N_GREEK_SUMS, jnp.float32,
                                         plan.kahan))
    finals = acc_final_n(carry, plan.kahan)
    for idx in range(N_GREEK_SUMS):
        out_ref[0, 0, idx] = finals[idx]


def greek_pallas_partials(opt, beta, seed, block_offset, plan: Plan,
                          n_blocks: int, n_steps: int, put: bool,
                          interpret: bool = False):
    """Per-block Greek partials ``(n_blocks, 8)``, fused on TPU."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        return _greek_pallas_partials(opt, beta, seed, block_offset, plan,
                                      n_blocks, n_steps, put, interpret)


def _greek_pallas_partials(opt, beta, seed, block_offset, plan, n_blocks,
                           n_steps, put, interpret):
    s0 = jnp.asarray(opt.s, jnp.float32)
    k = jnp.asarray(opt.k, jnp.float32)
    r = jnp.asarray(opt.r, jnp.float32)
    v = jnp.asarray(opt.v, jnp.float32)
    t = jnp.asarray(opt.t, jnp.float32)
    dt = t / n_steps
    drift = (r - 0.5 * v * v) * dt
    vol = v * jnp.sqrt(dt)
    log_s0 = jnp.log(s0)
    df, vc, rhoc, inv_v, psign = _greek_tables(k, r, v, t, n_steps, put,
                                               jnp.float32, log_s0)
    scal = jnp.stack([s0, k, drift, vol, 1.0 / k, inv_v, psign, 1.0 / s0])
    beta = jnp.asarray(beta, jnp.float32)
    if beta.shape[0] == 0:
        beta = jnp.zeros((1, _BASIS), jnp.float32)
    pad = n_steps - beta.shape[0]
    if pad > 0:
        beta = jnp.concatenate(
            [beta, jnp.zeros((pad, _BASIS), jnp.float32)], axis=0)
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))

    kernel = functools.partial(_lsm_greeks_kernel, plan=plan,
                               n_steps=n_steps, put=put)
    paths_iter = plan.rows * LANES * (2 if plan.antithetic else 1)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 7,
        out_specs=block_out_spec(N_GREEK_SUMS),
        out_shape=block_out_shape(n_blocks, N_GREEK_SUMS),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=GRID_SEMANTICS,
        ),
        cost_estimate=pl.CostEstimate(
            flops=24 * plan.iters * paths_iter * n_steps,
            bytes_accessed=n_blocks * 4 * N_GREEK_SUMS + n_steps * 28,
            transcendentals=4 * plan.iters * paths_iter * n_steps,
        ),
        interpret=interpret_arg(interpret),
    )(seed_arr, off_arr, scal, beta, df, vc, rhoc).reshape(n_blocks, N_GREEK_SUMS)
