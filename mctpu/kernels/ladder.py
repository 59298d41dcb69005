"""Fused strike-ladder kernel: K vanilla payoffs from one path sweep.

The production pricing pattern for smiles/surfaces: every strike reuses the
same terminal-GBM draws, so one memory pass prices the whole ladder and the
estimates are *comonotone* across strikes — spreads and butterflies computed
from the ladder are arbitrage-consistent up to MC noise (independent runs
per strike would not be).  Per iteration the normal tile is generated once
and K payoff reductions run over it (strike count is static and unrolled;
the marginal cost per strike is one subtract + max + two reduces, far below
the Box-Muller + exp of the draw).
"""
from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mctpu import rng as mcrng
from mctpu.kernels.common import (GRID_SEMANTICS, LANES, Plan, acc_add_n,
                                  acc_final_n, acc_init_n, chunk_sums,
                                  draw_normal_pair, interpret_arg,
                                  prng_emulation, seed_prng)
from mctpu.kernels.vanilla import _accum_add, _accum_final, _accum_init

__all__ = ["make_plan", "xla_partials", "pallas_partials", "MAX_STRIKES",
           "greek_xla_partials", "greek_pallas_partials",
           "N_LADDER_GREEK_SUMS"]

MAX_STRIKES = 64  # unrolled per-strike reductions; keep compile time sane


def make_plan(n_paths: int, num_blocks: int, rows: int, antithetic: bool,
              dtype: str = "float32", kahan: bool = True) -> Plan:
    units = 2 * rows * LANES  # both Box-Muller branches per iteration
    paths = units * (2 if antithetic else 1)
    return Plan.plan(n_paths, num_blocks, rows, paths, units, antithetic,
                     dtype, kahan)


def _spots(s0, mu, sig, z, antithetic: bool):
    if antithetic:
        return (s0 * jnp.exp(mu + sig * z), s0 * jnp.exp(mu - sig * z))
    return (s0 * jnp.exp(mu + sig * z),)


def _ladder_sums(spot_tiles, k_m, put: bool):
    """(sum, sum2) of the strike-``m`` payoff over the iteration's tiles."""
    if len(spot_tiles) > 1:
        # antithetic: the i.i.d. unit is the pair mean
        pair = 0.0
        for st in spot_tiles:
            pair = pair + jnp.maximum((k_m - st) if put else (st - k_m), 0.0)
        pair = pair / len(spot_tiles)
        return jnp.sum(pair), jnp.sum(pair * pair)
    st = spot_tiles[0]
    pay = jnp.maximum((k_m - st) if put else (st - k_m), 0.0)
    return jnp.sum(pay), jnp.sum(pay * pay)


# ---------------------------------------------------------------------------
# XLA backend
# ---------------------------------------------------------------------------

def xla_partials(opt, strikes, key: jax.Array, block_offset, plan: Plan,
                 n_blocks: int):
    """Per-block partials, shape ``(n_blocks, K, 2)``."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    n_k = strikes.shape[0]
    ks = jnp.asarray(strikes, dtype)
    mu = (o.r - 0.5 * o.v * o.v) * o.t
    sig = o.v * jnp.sqrt(o.t)
    put = opt.kind == "put"

    def block_fn(bkey):
        def body(i, carry):
            zk = jax.random.fold_in(bkey, i)
            z = jax.random.normal(zk, (2, plan.rows, LANES), dtype)
            tiles = _spots(o.s, mu, sig, z, plan.antithetic)
            new = []
            for m in range(n_k):
                cs, cs2 = _ladder_sums(tiles, ks[m], put)
                new.append(_accum_add(carry[m], cs, cs2, plan.kahan))
            return tuple(new)

        init = tuple(_accum_init(dtype, plan.kahan) for _ in range(n_k))
        carry = jax.lax.fori_loop(0, plan.iters, body, init)
        rows = [jnp.stack(_accum_final(carry[m], plan.kahan))
                for m in range(n_k)]
        return jnp.stack(rows)  # (K, 2)

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


# ---------------------------------------------------------------------------
# Pallas TPU backend
# ---------------------------------------------------------------------------

def _ladder_kernel(seed_ref, off_ref, par_ref, k_ref, out_ref, *,
                   plan: Plan, n_k: int, put: bool):
    seed_prng(seed_ref[0], off_ref[0] + pl.program_id(0))
    s0, mu, sig = par_ref[0], par_ref[1], par_ref[2]

    def body(i, carry):
        z1, z2 = draw_normal_pair((plan.rows, LANES), i)
        t1 = _spots(s0, mu, sig, z1, plan.antithetic)
        t2 = _spots(s0, mu, sig, z2, plan.antithetic)
        new = []
        for m in range(n_k):
            a1, b1 = _ladder_sums(t1, k_ref[m], put)
            a2, b2 = _ladder_sums(t2, k_ref[m], put)
            new.append(_accum_add(carry[m], a1 + a2, b1 + b2, plan.kahan))
        return tuple(new)

    init = tuple(_accum_init(jnp.float32, plan.kahan) for _ in range(n_k))
    carry = jax.lax.fori_loop(0, plan.iters, body, init)
    for m in range(n_k):
        s, s2 = _accum_final(carry[m], plan.kahan)
        out_ref[0, m, 0] = s
        out_ref[0, m, 1] = s2


def pallas_partials(opt, strikes, seed, block_offset, plan: Plan,
                    n_blocks: int, interpret: bool = False):
    """Per-block partials, shape ``(n_blocks, K, 2)``, fused on TPU."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        return _pallas_partials(opt, strikes, seed, block_offset, plan,
                                n_blocks, interpret)


def _pallas_partials(opt, strikes, seed, block_offset, plan, n_blocks,
                     interpret):
    o = opt.astype(jnp.float32)
    n_k = strikes.shape[0]
    mu = (o.r - 0.5 * o.v * o.v) * o.t
    sig = o.v * jnp.sqrt(o.t)
    params = jnp.stack([o.s, mu, sig])
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))

    kernel = functools.partial(_ladder_kernel, plan=plan, n_k=n_k,
                               put=opt.kind == "put")
    flops_iter = plan.rows * LANES * 2 * (2 if plan.antithetic else 1)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        # Blocked SMEM window: the full (n_blocks, K, 2) array pads each
        # block row to (16, 128) scalars, which overflows the 1 MB SMEM at
        # production block counts (512 blocks x 8 KB = 4 MB); a (1, K, 2)
        # per-iteration window keeps 8 KB live and each block is visited
        # exactly once.
        out_specs=pl.BlockSpec((1, n_k, 2), lambda b: (b, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, n_k, 2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=GRID_SEMANTICS,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(10 + 4 * n_k) * plan.iters * flops_iter,
            bytes_accessed=n_blocks * n_k * 8,
            transcendentals=5 * plan.iters * flops_iter,
        ),
        interpret=interpret_arg(interpret),
    )(seed_arr, off_arr, params, jnp.asarray(strikes, jnp.float32))


# ---------------------------------------------------------------------------
# Greeks: the per-strike risk ladder (smile Jacobian) from one path sweep
# ---------------------------------------------------------------------------
#
# Per strike the kernel accumulates the SAME six integrands as the fused
# vanilla Greeks kernel (kernels/greeks.py module docstring — pathwise
# delta/vega/rho/theta, mixed pathwise-LR gamma), sharing the terminal
# spot, the vega weight wv = sqt z - v t and the theta weight across all
# strikes: the marginal cost per strike is ~12 VPU ops on register-
# resident tiles.  Comonotone draws across strikes make the OUTPUT ladder
# arbitrage-consistent in every Greek up to MC noise (e.g. the delta
# ladder is monotone in K for calls), which per-strike independent runs
# would not be — the production pattern for smile risk / calibration
# Jacobians.

N_LADDER_GREEK_SUMS = 12  # (sum, sum^2) of: p, delta, vega, rho, theta,
#                           gamma — per strike


def _greek_ladder_quants(st, zz, wv, q, k_m, inv_s0, cg_m, tk_m, r,
                         put: bool):
    """Six integrand tiles of strike ``k_m`` from shared per-tile values.

    ``st`` terminal spot, ``wv = sqt z - v t``, ``q = r - v^2/2
    + 0.5 v z / sqt`` (theta weight), ``cg_m = k_m/(s0^2 v sqt)`` (gamma
    LR scale), ``tk_m = t k_m`` (rho scale).
    """
    if put:
        ind = jnp.where(st < k_m, -1.0, 0.0).astype(st.dtype)
        p = jnp.maximum(k_m - st, 0.0)
    else:
        ind = jnp.where(st > k_m, 1.0, 0.0).astype(st.dtype)
        p = jnp.maximum(st - k_m, 0.0)
    w = ind * st
    return (p, w * inv_s0, w * wv, tk_m * ind, w * q - r * p,
            cg_m * (ind * zz))


def _ladder_greek_shared(s0, mu, sig, v, t, sqt, r, z):
    """Shared tiles consumed by every strike's integrands."""
    st = s0 * jnp.exp(mu + sig * z)
    wv = sqt * z - v * t
    q = (r - 0.5 * v * v) + (0.5 * v / sqt) * z
    return st, wv, q


def _ladder_greek_iter(zs, ks, consts, n_k: int, put: bool,
                       antithetic: bool):
    """One iteration's flat sums: ``n_k`` strikes x 12.

    ``zs`` is the tuple of normal tiles this iteration consumes; the
    antithetic pair-mean is taken per strike BEFORE squaring (the i.i.d.
    unit is the pair).  ``consts = (s0, mu, sig, v, t, sqt, r, inv_s0,
    cg_over_k)`` with ``cg_over_k = 1/(s0^2 sig)`` so ``cg_m
    = cg_over_k * k_m``.
    """
    s0, mu, sig, v, t, sqt, r, inv_s0, cg_over_k = consts
    sums = None
    for z in zs:
        shared = [_ladder_greek_shared(s0, mu, sig, v, t, sqt, r, z)]
        zsides = [z]
        if antithetic:
            shared.append(_ladder_greek_shared(s0, mu, sig, v, t, sqt, r,
                                               -z))
            zsides.append(-z)
        row = []
        for m in range(n_k):
            k_m = ks(m)
            cg_m = cg_over_k * k_m
            tk_m = t * k_m
            quants = None
            for (st, wv, q), zz in zip(shared, zsides):
                one = _greek_ladder_quants(st, zz, wv, q, k_m, inv_s0,
                                           cg_m, tk_m, r, put)
                quants = one if quants is None else tuple(
                    a + b for a, b in zip(quants, one))
            if antithetic:
                quants = tuple(0.5 * x for x in quants)
            for x in quants:
                row.append(jnp.sum(x))
                row.append(jnp.sum(x * x))
        sums = row if sums is None else [a + b for a, b in zip(sums, row)]
    return tuple(sums)


def greek_xla_partials(opt, strikes, key: jax.Array, block_offset,
                       plan: Plan, n_blocks: int):
    """Per-block Greek partials, shape ``(n_blocks, K, 12)``."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    n_k = strikes.shape[0]
    ks = jnp.asarray(strikes, dtype)
    sqt = jnp.sqrt(jnp.asarray(o.t, dtype))
    consts = (o.s, (o.r - 0.5 * o.v * o.v) * o.t, o.v * sqt, o.v, o.t,
              sqt, o.r, 1.0 / o.s, 1.0 / (o.s * o.s * o.v * sqt))
    put = opt.kind == "put"
    n_sums = n_k * N_LADDER_GREEK_SUMS

    def block_fn(bkey):
        def body(i, carry):
            zk = jax.random.fold_in(bkey, i)
            z = jax.random.normal(zk, (2, plan.rows, LANES), dtype)
            sums = _ladder_greek_iter((z[0], z[1]), lambda m: ks[m],
                                      consts, n_k, put, plan.antithetic)
            return acc_add_n(carry, sums, plan.kahan)

        carry = jax.lax.fori_loop(0, plan.iters, body,
                                  acc_init_n(n_sums, dtype, plan.kahan))
        flat = jnp.stack(acc_final_n(carry, plan.kahan))
        return flat.reshape(n_k, N_LADDER_GREEK_SUMS)

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


def _ladder_greeks_kernel(seed_ref, off_ref, par_ref, k_ref, out_ref, *,
                          plan: Plan, n_k: int, put: bool):
    seed_prng(seed_ref[0], off_ref[0] + pl.program_id(0))
    consts = (par_ref[0], par_ref[1], par_ref[2], par_ref[3], par_ref[4],
              par_ref[5], par_ref[6], par_ref[7], par_ref[8])
    n_sums = n_k * N_LADDER_GREEK_SUMS

    def body(i, carry):
        z1, z2 = draw_normal_pair((plan.rows, LANES), i)
        sums = _ladder_greek_iter((z1, z2), lambda m: k_ref[m], consts,
                                  n_k, put, plan.antithetic)
        return acc_add_n(carry, sums, plan.kahan)

    carry = jax.lax.fori_loop(0, plan.iters, body,
                              acc_init_n(n_sums, jnp.float32, plan.kahan))
    vals = acc_final_n(carry, plan.kahan)
    for m in range(n_k):
        for j in range(N_LADDER_GREEK_SUMS):
            out_ref[0, m, j] = vals[m * N_LADDER_GREEK_SUMS + j]


def greek_pallas_partials(opt, strikes, seed, block_offset, plan: Plan,
                          n_blocks: int, interpret: bool = False):
    """Fused ladder Greek partials ``(n_blocks, K, 12)`` on TPU."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        o = opt.astype(jnp.float32)
        n_k = strikes.shape[0]
        sqt = jnp.sqrt(jnp.asarray(o.t, jnp.float32))
        params = jnp.stack([
            o.s, (o.r - 0.5 * o.v * o.v) * o.t, o.v * sqt, o.v, o.t, sqt,
            o.r, 1.0 / o.s, 1.0 / (o.s * o.s * o.v * sqt),
        ])
        seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
        off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))
        kernel = functools.partial(_ladder_greeks_kernel, plan=plan,
                                   n_k=n_k, put=opt.kind == "put")
        flops_iter = plan.rows * LANES * 2 * (2 if plan.antithetic else 1)
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 4,
            # Blocked SMEM window — see pallas_partials: the full 3-D array
            # overflows SMEM at production block counts.
            out_specs=pl.BlockSpec(
                (1, n_k, N_LADDER_GREEK_SUMS), lambda b: (b, 0, 0),
                memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct(
                (n_blocks, n_k, N_LADDER_GREEK_SUMS), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=GRID_SEMANTICS,
            ),
            cost_estimate=pl.CostEstimate(
                flops=(14 + 24 * n_k) * plan.iters * flops_iter,
                bytes_accessed=n_blocks * n_k * 4 * N_LADDER_GREEK_SUMS,
                transcendentals=5 * plan.iters * flops_iter,
            ),
            interpret=interpret_arg(interpret),
        )(seed_arr, off_arr, params,
          jnp.asarray(strikes, jnp.float32))
