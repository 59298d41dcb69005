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
from mctpu.kernels.common import (block_out_shape, block_out_spec,
                                  GRID_SEMANTICS, LANES, Plan, acc_add_n,
                                  acc_final_n, acc_init_n, chunk_sums,
                                  draw_normal_pair, interpret_arg,
                                  prng_emulation, seed_prng, walk_pairwise,
                                  walk_steps)
from mctpu.kernels.heston import _heston_step
from mctpu.kernels.vanilla import _accum_add, _accum_final, _accum_init

__all__ = ["make_plan", "xla_partials", "pallas_partials",
           "greek_xla_partials", "greek_pallas_partials",
           "N_GREEK_SUMS_GBM", "N_GREEK_SUMS_HESTON"]


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
        _, _, acc = walk_steps(n_obs, body, init)
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
    out_ref[0, 0, 0] = s
    out_ref[0, 0, 1] = s2


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
        out_specs=block_out_spec(2),
        out_shape=block_out_shape(n_blocks, 2),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=GRID_SEMANTICS,
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * plan.iters * paths_iter * n_obs,
            bytes_accessed=n_blocks * 8,
            transcendentals=5 * plan.iters * paths_iter * n_obs,
        ),
        interpret=interpret_arg(interpret),
    )(seed_arr, off_arr, scal).reshape(n_blocks, 2)


# ---------------------------------------------------------------------------
# Greeks: fair-strike sensitivities fused into the realized-variance walk
# ---------------------------------------------------------------------------
#
# GBM: with lr_j = mu dt + v sqrt(dt) z_j (mu = r - v^2/2) and
# RV = (1/T) sum lr_j^2, every sensitivity is a function of just TWO
# per-path sums A = sum lr_j^2 and B = sum lr_j:
#
#   dRV/ds0  == 0 exactly (log-returns do not depend on the spot level)
#   dRV/dv   = (2/T)[(A - mu dt B)/v - v dt B]   (dlr/dv = (lr - mu dt)/v
#                                                 - v dt, no stored z needed)
#   dRV/dr   = (2 dt/T) B                        (dlr/dr = dt; d mu/dr = 1)
#   dRV/dT   = (mu dt / T^2) B    (the -RV/T and +RV/T terms cancel exactly;
#                                  expectation mu^2/n matches d/dT of the
#                                  discrete oracle v^2 + mu^2 T/n)
#
# so the GBM Greeks cost ONE extra accumulator (B) over pricing.  Exact
# discrete oracles: jax.grad of v^2 + (r - v^2/2)^2 T/n.
#
# Heston: the walk carries the forward-mode tangent pairs
# (d log S/dp, d v/dp) for p in (v0, theta, kappa, xi) — the SAME
# recursion as the Heston price Greeks (kernels/heston.py:_greek_step) —
# and accumulates dA/dp = sum 2 lr (dlr/dp) with dlr/dp the per-step
# tangent increment.  dRV/dr = (2 dt/T) B rides along like GBM.  The
# continuous-limit oracle K = theta + (v0 - theta)(1 - e^{-kT})/(kT)
# gives closed-form dv0/dtheta/dkappa gates (dxi -> 0 in that limit; the
# small discrete-sampling xi effect is gated by CRN bumps instead).
# Spot delta is identically zero in BOTH dynamics; the engine returns it
# as an exact 0 +- 0 rather than spending an accumulator.

N_GREEK_SUMS_GBM = 8       # (sum, sum^2) of: rv, vega, rho, theta
N_GREEK_SUMS_HESTON = 12   # (sum, sum^2) of: rv, dv0, dtheta, dkappa,
#                            dxi, rho


def _gbm_greek_quants(acc2, acc1, drift, v, dt, inv_t):
    """(rv, vega, rho, theta) per-path tiles from the two carried sums."""
    rv = acc2 * inv_t
    gv = 2.0 * inv_t * ((acc2 - drift * acc1) * (1.0 / v)
                        - (v * dt) * acc1)
    gr = (2.0 * dt * inv_t) * acc1
    gt = (drift * inv_t * inv_t) * acc1
    return rv, gv, gr, gt


def _sums(quants):
    out = []
    for q in quants:
        out.append(jnp.sum(q))
        out.append(jnp.sum(q * q))
    return tuple(out)


def _heston_greek_walk(shape, n_obs: int, draw, consts, sgn):
    """One sign's Heston Greek walk via the tangent recursion.

    ``draw(j) -> (z_v, z_perp)``; ``consts`` is the scalar tuple
    ``(v0, k_dt, th, xi, rho_c, rho_s, r_dt, sqdt, half_dt, dt, inv_t)``.
    Returns the 6 per-path quants (rv, dv0, dth, dka, dxi, rho).
    """
    from mctpu.kernels.heston import _greek_step, _greek_tangent_init
    (v0, k_dt, th, xi, rho_c, rho_s, r_dt, sqdt, half_dt, dt,
     inv_t) = consts

    def body(j, carry):
        x, v, tg, acc2, acc1, dacc = carry
        z_v, z_perp = draw(j)
        x_new, v_new, tg_new = _greek_step(
            x, v, tg, sgn * z_v, sgn * z_perp, k_dt, th, xi, rho_c,
            rho_s, r_dt, sqdt, half_dt, dt)
        lr = x_new - x
        two_lr = 2.0 * lr
        dacc_new = tuple(
            d + two_lr * (tg_new[2 * i] - tg[2 * i])
            for i, d in enumerate(dacc))
        return (x_new, v_new, tg_new, acc2 + lr * lr, acc1 + lr,
                dacc_new)

    zero = jnp.zeros(shape, jnp.float32)
    init = (zero, jnp.full(shape, v0, jnp.float32),
            _greek_tangent_init(shape, jnp.float32), zero, zero,
            (zero, zero, zero, zero))
    _, _, _, acc2, acc1, dacc = walk_steps(n_obs, body, init)
    rv = acc2 * inv_t
    return (rv, dacc[0] * inv_t, dacc[1] * inv_t, dacc[2] * inv_t,
            dacc[3] * inv_t, (2.0 * dt * inv_t) * acc1)


def _pair_halved(qa, qb):
    return tuple(0.5 * (a + b) for a, b in zip(qa, qb))


def greek_xla_partials(opt, key: jax.Array, block_offset, plan: Plan,
                       n_blocks: int, *, n_obs: int, dynamics: str):
    """Per-block Greek partials: ``(n_blocks, 8)`` GBM /
    ``(n_blocks, 12)`` Heston."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    g = n_obs
    shape = (plan.rows, LANES)
    inv_t = 1.0 / jnp.asarray(o.t, dtype)
    dt = o.t / g

    if dynamics == "gbm":
        drift = (o.r - 0.5 * o.v * o.v) * dt
        vol = o.v * jnp.sqrt(dt)
        n_sums = N_GREEK_SUMS_GBM

        def iter_quants(z_seq):
            def walk(sgn):
                def body(j, carry):
                    a2, a1 = carry
                    lr = drift + vol * (sgn * z_seq[j, 0])
                    return a2 + lr * lr, a1 + lr

                zero = jnp.zeros(shape, dtype)
                a2, a1 = jax.lax.fori_loop(0, g, body, (zero, zero))
                return _gbm_greek_quants(a2, a1, drift, o.v, dt, inv_t)

            if plan.antithetic:
                return _pair_halved(walk(1.0), walk(-1.0))
            return walk(1.0)
    else:
        consts = (o.v0, o.kappa * dt, o.theta, o.xi, o.rho,
                  jnp.sqrt(1.0 - o.rho * o.rho), o.r * dt, jnp.sqrt(dt),
                  0.5 * dt, dt, inv_t)
        n_sums = N_GREEK_SUMS_HESTON

        def iter_quants(z_seq):
            def run(sgn):
                return _heston_greek_walk(
                    shape, g, lambda j: (z_seq[j, 0], z_seq[j, 1]),
                    consts, sgn)

            if plan.antithetic:
                return _pair_halved(run(1.0), run(-1.0))
            return run(1.0)

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (g, 2) + shape, dtype)
            return acc_add_n(carry, _sums(iter_quants(z_seq)), plan.kahan)

        carry = jax.lax.fori_loop(0, plan.iters, body,
                                  acc_init_n(n_sums, dtype, plan.kahan))
        return jnp.stack(acc_final_n(carry, plan.kahan))

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


def _varswap_greeks_kernel(seed_ref, off_ref, scal_ref, out_ref, *,
                           plan: Plan, n_obs: int, dynamics: str):
    shape = (plan.rows, LANES)
    b = pl.program_id(0)
    inv_t = scal_ref[0]

    if dynamics == "gbm":
        drift, vol, v, dt = (scal_ref[1], scal_ref[2], scal_ref[3],
                             scal_ref[4])
        n_sums = N_GREEK_SUMS_GBM

        def iter_quants(i):
            def walk(sgn):
                seed_prng(seed_ref[0],
                          (off_ref[0] + b) * jnp.int32(plan.iters) + i)

                def step(j, z, carry):
                    a2, a1 = carry
                    lr = drift + vol * (sgn * z)
                    return a2 + lr * lr, a1 + lr

                zero = jnp.zeros(shape, jnp.float32)
                a2, a1 = walk_pairwise(shape, n_obs, step, (zero, zero))
                return _gbm_greek_quants(a2, a1, drift, v, dt, inv_t)

            if plan.antithetic:
                return _pair_halved(walk(1.0), walk(-1.0))
            return walk(1.0)
    else:
        n_sums = N_GREEK_SUMS_HESTON

        def iter_quants(i):
            consts = (scal_ref[1], scal_ref[2], scal_ref[3], scal_ref[4],
                      scal_ref[5], scal_ref[6], scal_ref[7], scal_ref[8],
                      scal_ref[9], scal_ref[10], inv_t)

            # Antithetic needs BOTH signs over the SAME draws: reseed and
            # rerun the stream per sign (stateless counter PRNG).
            def run(sgn):
                seed_prng(seed_ref[0],
                          (off_ref[0] + b) * jnp.int32(plan.iters) + i)
                return _heston_greek_walk(
                    shape, n_obs, lambda j: draw_normal_pair(shape, j),
                    consts, sgn)

            if plan.antithetic:
                return _pair_halved(run(1.0), run(-1.0))
            return run(1.0)

    def body(i, carry):
        return acc_add_n(carry, _sums(iter_quants(i)), plan.kahan)

    carry = jax.lax.fori_loop(0, plan.iters, body,
                              acc_init_n(n_sums, jnp.float32, plan.kahan))
    vals = acc_final_n(carry, plan.kahan)
    for j in range(n_sums):
        out_ref[0, 0, j] = vals[j]


def greek_pallas_partials(opt, seed, block_offset, plan: Plan,
                          n_blocks: int, *, n_obs: int, dynamics: str,
                          interpret: bool = False):
    """Fused varswap Greek partials on TPU (GBM: 8 sums; Heston: 12)."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        o = opt.astype(jnp.float32)
        inv_t = 1.0 / jnp.asarray(o.t, jnp.float32)
        dt = jnp.asarray(o.t, jnp.float32) / n_obs
        if dynamics == "gbm":
            scal = jnp.stack([inv_t, (o.r - 0.5 * o.v * o.v) * dt,
                              o.v * jnp.sqrt(dt), o.v, dt])
            n_sums = N_GREEK_SUMS_GBM
        else:
            scal = jnp.stack([
                inv_t, o.v0, o.kappa * dt, o.theta, o.xi, o.rho,
                jnp.sqrt(1.0 - o.rho * o.rho), o.r * dt, jnp.sqrt(dt),
                0.5 * dt, dt,
            ])
            n_sums = N_GREEK_SUMS_HESTON
        seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
        off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))
        kernel = functools.partial(_varswap_greeks_kernel, plan=plan,
                                   n_obs=n_obs, dynamics=dynamics)
        paths_iter = plan.rows * LANES * (2 if plan.antithetic else 1)
        per_step = 8 if dynamics == "gbm" else 40
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
            out_specs=block_out_spec(n_sums),
            out_shape=block_out_shape(n_blocks, n_sums),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=GRID_SEMANTICS,
            ),
            cost_estimate=pl.CostEstimate(
                flops=per_step * plan.iters * paths_iter * n_obs,
                bytes_accessed=n_blocks * 4 * n_sums,
                transcendentals=5 * plan.iters * paths_iter * n_obs,
            ),
            interpret=interpret_arg(interpret),
        )(seed_arr, off_arr, scal).reshape(n_blocks, n_sums)
