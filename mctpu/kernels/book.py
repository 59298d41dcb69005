"""Fused portfolio ("book") kernel: M heterogeneous vanillas in one sweep.

The production *serving* pattern: a desk reprices a whole book — mixed
calls/puts with per-instrument spot / strike / rate / vol / maturity — on
every market tick.  Running one Monte Carlo sweep per instrument wastes the
expensive part (bits -> Box-Muller) M times over and yields independent
noise per instrument; this kernel draws each standard-normal tile ONCE and
evaluates all M instruments on it (terminal sampling: the same ``z`` maps
to instrument ``i``'s terminal spot via its own ``exp(mu_i + sig_i z)``).
Estimates are comonotone across the book, so hedge ratios and spread marks
computed from one sweep are internally consistent up to MC noise.

Unlike the strike-ladder kernel (``kernels/ladder.py``, which compiles the
strike vector into the program), ALL per-instrument parameters here are
runtime data in SMEM — one compiled program serves any book of the same
size, so market-data updates never trigger a recompile.  Put/call mix
rides in as a ±1 sign vector (also data).

Generalizes the reference's one-option-per-binary drivers
(``vanillaOpt.cu:28-109``) to the multi-instrument case the reference has
no analogue for.  Marginal cost per instrument per path: one ``exp`` +
~5 VPU ops (the draw cost is amortized across the book).
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
                                  draw_normal_pair, interpret_arg,
                                  prng_emulation, seed_prng)
from mctpu.kernels.vanilla import _accum_add, _accum_final, _accum_init

__all__ = ["make_plan", "xla_partials", "pallas_partials", "MAX_BOOK",
           "greek_xla_partials", "greek_pallas_partials",
           "N_BOOK_GREEK_SUMS"]

MAX_BOOK = 64  # per-instrument reductions are unrolled; keep compiles sane


def make_plan(n_paths: int, num_blocks: int, rows: int, antithetic: bool,
              dtype: str = "float32", kahan: bool = True) -> Plan:
    units = 2 * rows * LANES  # both Box-Muller branches per iteration
    paths = units * (2 if antithetic else 1)
    return Plan.plan(n_paths, num_blocks, rows, paths, units, antithetic,
                     dtype, kahan)


def _inst_sums(z_tiles, s0_i, mu_i, sig_i, k_i, sgn_i):
    """(sum, sum2) of instrument ``i``'s payoff over the iteration's tiles.

    ``mu_i = (r_i - v_i^2/2) t_i``, ``sig_i = v_i sqrt(t_i)``; ``sgn_i``
    is +1 for calls, -1 for puts: ``max(sgn * (S_T - k), 0)`` covers both
    without branching (IEEE negation is exact, so the put branch equals
    ``max(k - S_T, 0)`` bitwise).  The op order deliberately mirrors
    ``kernels/vanilla._payoffs`` so a one-instrument book ties to the
    vanilla kernel bitwise on shared streams.  With antithetic tiles the
    i.i.d. estimator unit is the pair mean.
    """
    pays = [jnp.maximum(sgn_i * (s0_i * jnp.exp(mu_i + sig_i * z) - k_i),
                        0.0)
            for z in z_tiles]
    if len(pays) > 1:
        pay = 0.5 * (pays[0] + pays[1])
    else:
        pay = pays[0]
    return jnp.sum(pay), jnp.sum(pay * pay)


def _z_tiles(z, antithetic: bool):
    return (z, -z) if antithetic else (z,)


# ---------------------------------------------------------------------------
# XLA backend (Threefry streams; CPU tests + non-TPU fallback)
# ---------------------------------------------------------------------------

def xla_partials(params, key: jax.Array, block_offset, plan: Plan,
                 n_blocks: int):
    """Per-block partials, shape ``(n_blocks, M, 2)``.

    ``params = (s0, mu, sig, k, sgn)`` — five ``(M,)`` vectors (see
    :func:`_inst_sums`).  The draw schedule matches
    ``kernels/vanilla.xla_partials`` exactly, so a one-instrument book is
    bitwise-identical to the vanilla kernel on shared streams.
    """
    s0, mu, sig, ks, sgn = (jnp.asarray(p, plan.jdtype) for p in params)
    m = s0.shape[0]

    def block_fn(bkey):
        def body(i, carry):
            zk = jax.random.fold_in(bkey, i)
            z = jax.random.normal(zk, (2, plan.rows, LANES), plan.jdtype)
            tiles = _z_tiles(z, plan.antithetic)
            new = []
            for j in range(m):
                cs, cs2 = _inst_sums(tiles, s0[j], mu[j], sig[j], ks[j],
                                     sgn[j])
                new.append(_accum_add(carry[j], cs, cs2, plan.kahan))
            return tuple(new)

        init = tuple(_accum_init(plan.jdtype, plan.kahan) for _ in range(m))
        carry = jax.lax.fori_loop(0, plan.iters, body, init)
        rows = [jnp.stack(_accum_final(carry[j], plan.kahan))
                for j in range(m)]
        return jnp.stack(rows)  # (M, 2)

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


# ---------------------------------------------------------------------------
# Pallas TPU backend (in-kernel hardware PRNG; f32 only)
# ---------------------------------------------------------------------------

def _book_kernel(seed_ref, off_ref, s0_ref, mu_ref, sig_ref, k_ref,
                 sgn_ref, out_ref, *, plan: Plan, m: int):
    seed_prng(seed_ref[0], off_ref[0] + pl.program_id(0))

    def body(i, carry):
        z1, z2 = draw_normal_pair((plan.rows, LANES), i)
        t1 = _z_tiles(z1, plan.antithetic)
        t2 = _z_tiles(z2, plan.antithetic)
        new = []
        for j in range(m):
            a1, b1 = _inst_sums(t1, s0_ref[j], mu_ref[j], sig_ref[j],
                                k_ref[j], sgn_ref[j])
            a2, b2 = _inst_sums(t2, s0_ref[j], mu_ref[j], sig_ref[j],
                                k_ref[j], sgn_ref[j])
            new.append(_accum_add(carry[j], a1 + a2, b1 + b2, plan.kahan))
        return tuple(new)

    init = tuple(_accum_init(jnp.float32, plan.kahan) for _ in range(m))
    carry = jax.lax.fori_loop(0, plan.iters, body, init)
    for j in range(m):
        s, s2 = _accum_final(carry[j], plan.kahan)
        out_ref[0, j, 0] = s
        out_ref[0, j, 1] = s2


def pallas_partials(params, seed, block_offset, plan: Plan, n_blocks: int,
                    interpret: bool = False):
    """Per-block partials, shape ``(n_blocks, M, 2)``, fused on TPU.

    Same PRNG stream schedule as ``kernels/vanilla.pallas_partials``
    (seed ``(seed, block)``, one pair draw per iteration), so a
    one-instrument book ties to the vanilla kernel bitwise.
    """
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        return _pallas_partials(params, seed, block_offset, plan, n_blocks,
                                interpret)


def _pallas_partials(params, seed, block_offset, plan, n_blocks, interpret):
    s0, mu, sig, ks, sgn = (jnp.asarray(p, jnp.float32) for p in params)
    m = s0.shape[0]
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))

    kernel = functools.partial(_book_kernel, plan=plan, m=m)
    flops_iter = plan.rows * LANES * 2 * (2 if plan.antithetic else 1)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 7,
        out_specs=pl.BlockSpec((1, m, 2), lambda b: (b, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, m, 2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=GRID_SEMANTICS,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(10 + 5 * m) * plan.iters * flops_iter,
            bytes_accessed=n_blocks * m * 8,
            transcendentals=(4 + m) * plan.iters * flops_iter,
        ),
        interpret=interpret_arg(interpret),
    )(seed_arr, off_arr, s0, mu, sig, ks, sgn)


# ---------------------------------------------------------------------------
# Greeks: the per-instrument risk run (portfolio Jacobian) from one sweep
# ---------------------------------------------------------------------------
#
# Per instrument the kernel accumulates the SAME six integrands as the
# fused vanilla Greeks kernel (kernels/greeks.py module docstring —
# pathwise delta/vega/rho/theta, mixed pathwise-LR gamma) and the strike
# ladder's risk sweep (kernels/ladder.py), with every constant a
# per-instrument SMEM value so the whole book's risk reprices without a
# recompile.  The call/put mix rides in as the +-1 sign: the indicator
# becomes ``where(sgn*(st-k) > 0, sgn, 0)``, which reproduces both static
# branches of _greek_ladder_quants exactly.

N_BOOK_GREEK_SUMS = 12  # (sum, sum^2) of: p, delta, vega, rho, theta,
#                         gamma — per instrument

_N_CONST_ROWS = 13  # s0, mu, sig, sqt, vt, a, b, r, inv_s0, cg, tk, k, sgn


def greek_const_rows(params, dtype):
    """(13, M) per-instrument constants consumed by the Greek integrands.

    ``params = (s, k, r, v, t, sgn)`` raw market vectors; precomputes the
    divide-bearing scales host-side (``b = v/(2 sqt)``, ``cg
    = k/(s0^2 v sqt)``) so the kernel hot loop is divide-free.
    """
    s0, k, r, v, t, sgn = (jnp.asarray(p, dtype) for p in params)
    sqt = jnp.sqrt(t)
    return jnp.stack([
        s0, (r - 0.5 * v * v) * t, v * sqt, sqt, v * t,
        r - 0.5 * v * v, 0.5 * v / sqt, r, 1.0 / s0,
        k / (s0 * s0 * v * sqt), t * k, k, sgn])


def _book_greek_quants(c, j, z, zz):
    """Six integrand tiles of instrument ``j`` on normal tile ``z``.

    ``zz`` is the signed normal consumed by the gamma LR weight (the
    antithetic mirror passes ``-z`` for both); ``c(row, j)`` reads the
    constant table built by :func:`greek_const_rows`.
    """
    st = c(0, j) * jnp.exp(c(1, j) + c(2, j) * z)
    wv = c(3, j) * z - c(4, j)
    q = c(5, j) + c(6, j) * z
    sgn = c(12, j)
    edge = sgn * (st - c(11, j))
    ind = jnp.where(edge > 0, sgn, 0.0).astype(st.dtype)
    p = jnp.maximum(edge, 0.0)
    w = ind * st
    return (p, w * c(8, j), w * wv, c(10, j) * ind,
            w * q - c(7, j) * p, c(9, j) * (ind * zz))


def _book_greek_iter(zs, c, m: int, antithetic: bool):
    """One iteration's flat sums: ``m`` instruments x 12."""
    sums = None
    for z in zs:
        zsides = [z, -z] if antithetic else [z]
        row = []
        for j in range(m):
            quants = None
            for zz in zsides:
                one = _book_greek_quants(c, j, zz, zz)
                quants = one if quants is None else tuple(
                    a + b for a, b in zip(quants, one))
            if antithetic:
                quants = tuple(0.5 * x for x in quants)
            for x in quants:
                row.append(jnp.sum(x))
                row.append(jnp.sum(x * x))
        sums = row if sums is None else [a + b for a, b in zip(sums, row)]
    return tuple(sums)


def greek_xla_partials(params, key: jax.Array, block_offset, plan: Plan,
                       n_blocks: int):
    """Per-block Greek partials, shape ``(n_blocks, M, 12)``.

    ``params = (s, k, r, v, t, sgn)`` raw market vectors.
    """
    from mctpu.kernels.common import acc_add_n, acc_final_n, acc_init_n

    dtype = plan.jdtype
    cvec = greek_const_rows(params, dtype)
    m = cvec.shape[1]
    n_sums = m * N_BOOK_GREEK_SUMS

    def block_fn(bkey):
        def body(i, carry):
            zk = jax.random.fold_in(bkey, i)
            z = jax.random.normal(zk, (2, plan.rows, LANES), dtype)
            sums = _book_greek_iter((z[0], z[1]), lambda r, j: cvec[r, j],
                                    m, plan.antithetic)
            return acc_add_n(carry, sums, plan.kahan)

        carry = jax.lax.fori_loop(0, plan.iters, body,
                                  acc_init_n(n_sums, dtype, plan.kahan))
        flat = jnp.stack(acc_final_n(carry, plan.kahan))
        return flat.reshape(m, N_BOOK_GREEK_SUMS)

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


def _book_greeks_kernel(seed_ref, off_ref, cvec_ref, out_ref, *,
                        plan: Plan, m: int):
    from mctpu.kernels.common import acc_add_n, acc_final_n, acc_init_n

    seed_prng(seed_ref[0], off_ref[0] + pl.program_id(0))
    n_sums = m * N_BOOK_GREEK_SUMS

    def body(i, carry):
        z1, z2 = draw_normal_pair((plan.rows, LANES), i)
        sums = _book_greek_iter((z1, z2), lambda r, j: cvec_ref[r, j],
                                m, plan.antithetic)
        return acc_add_n(carry, sums, plan.kahan)

    carry = jax.lax.fori_loop(0, plan.iters, body,
                              acc_init_n(n_sums, jnp.float32, plan.kahan))
    vals = acc_final_n(carry, plan.kahan)
    for j in range(m):
        for i in range(N_BOOK_GREEK_SUMS):
            out_ref[0, j, i] = vals[j * N_BOOK_GREEK_SUMS + i]


def greek_pallas_partials(params, seed, block_offset, plan: Plan,
                          n_blocks: int, interpret: bool = False):
    """Per-block Greek partials, shape ``(n_blocks, M, 12)``, fused on TPU."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        cvec = greek_const_rows(params, jnp.float32)
        m = cvec.shape[1]
        seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
        off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))
        kernel = functools.partial(_book_greeks_kernel, plan=plan, m=m)
        flops_iter = plan.rows * LANES * 2 * (2 if plan.antithetic else 1)
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
            out_specs=pl.BlockSpec((1, m, N_BOOK_GREEK_SUMS),
                                   lambda b: (b, 0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((n_blocks, m, N_BOOK_GREEK_SUMS),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=GRID_SEMANTICS,
            ),
            cost_estimate=pl.CostEstimate(
                flops=(10 + 30 * m) * plan.iters * flops_iter,
                bytes_accessed=n_blocks * m * N_BOOK_GREEK_SUMS * 4,
                transcendentals=(4 + m) * plan.iters * flops_iter,
            ),
            interpret=interpret_arg(interpret),
        )(seed_arr, off_arr, cvec)
