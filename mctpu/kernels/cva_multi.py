"""Fused multi-underlying CVA kernel: netting set over correlated GBMs.

Composes the correlated walk with the CVA exposure grid
(``mctpu/kernels/cva.py``): option ``m`` is a call on underlying ``m``; at
node ``j`` every path re-prices all its options with the Hastings-CDF
Black-Scholes on the VPU, the signed position values net per path, and the
positive part feeds the default leg ``lgd * sum_j dp_j * max(netted_j, 0)``.

Dual walk regime (the ``kernels/basket.py`` convention): netting sets of
``m <= ASSET_MAJOR_MAX`` underlyings run asset-major — one (rows, 128)
log-spot tile per underlying, correlation as m(m+1)/2 broadcast-scalar
FMAs, netting as tile adds (see the asset-major section below).  Wider
sets use the lane-packed layout (``c`` paths per 128-lane row,
block-diagonal Cholesky, indicator matmuls on the MXU).

Beyond the reference (single underlying, single option); the exposure
profile per node is accumulated in Kahan-compensated SMEM scalars.
"""
from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mctpu import math as mcmath
from mctpu import rng as mcrng
from mctpu.kernels.basket import (MATMUL_PRECISION, pack_factor,
                                  use_asset_major)
from mctpu.kernels.common import (GRID_SEMANTICS, LANES, Plan, acc_add_n,
                                  acc_final_n, acc_init_n, am_lane_rows,
                                  block_out_shape, block_out_spec,
                                  chunk_sums, det_col_sums, interpret_arg,
                                  prng_emulation, seed_prng, walk_pairwise,
                                  walk_pairwise_multi)
from mctpu.kernels.vanilla import _accum_add, _accum_final, _accum_init
from mctpu.types import CvaMultiSpec

__all__ = ["make_plan", "xla_partials", "pallas_partials", "pack_spec",
           "greek_xla_partials", "greek_pallas_partials",
           "greek_tables", "N_MULTI_GREEK_SCALARS",
           "xva_xla_partials", "xva_pallas_partials", "xva_tables",
           "N_XVA_SUMS",
           "xva_greek_xla_partials", "xva_greek_pallas_partials",
           "xva_greek_tables", "N_XVA_GREEK_SCALARS"]


def make_plan(n_paths: int, num_blocks: int, rows: int, antithetic: bool,
              dtype: str = "float32", kahan: bool = True,
              n_underlyings: int = 2) -> Plan:
    if use_asset_major(n_underlyings):
        units = rows * LANES  # every lane a path (one tile per underlying)
    else:
        _, c, _ = pack_factor(n_underlyings)
        units = rows * c
    paths = units * (2 if antithetic else 1)
    return Plan.plan(n_paths, num_blocks, rows, paths, units, antithetic,
                     dtype, kahan)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_spec(spec: CvaMultiSpec, chol, dtype, lanes: int = LANES):
    """Packed per-lane operands for the netting-set walk.

    Lane layout mirrors :func:`mctpu.kernels.basket.pack_assets`: ``c``
    paths per row, each owning an ``a_tile`` span of lanes holding its M
    underlyings.  ``mask`` marks real (non-padding) lanes so padded lanes
    contribute exactly 0 to the netted value; ``isel (width, c)`` is the
    indicator matmul that sums each path's signed position values.
    """
    m = spec.n_underlyings
    a_tile, c, width = pack_factor(m, lanes)

    def tile_row(x, fill=0.0):
        row = jnp.full((a_tile,), fill, dtype).at[:m].set(
            jnp.asarray(x, dtype))
        return jnp.tile(row, c).reshape(1, width)

    g = spec.n_grid
    dt = jnp.asarray(spec.t, dtype) / g
    v_row = tile_row(spec.v, fill=1.0)  # pad vol 1: keeps BS math finite
    drift = (jnp.asarray(spec.r, dtype) - 0.5 * v_row * v_row) * dt
    vol = v_row * jnp.sqrt(dt)

    block = jnp.zeros((a_tile, a_tile), dtype).at[:m, :m].set(
        jnp.asarray(chol, dtype).T)
    chol_bd = jnp.zeros((width, width), dtype)
    isel = jnp.zeros((width, c), dtype)
    ones = jnp.zeros((a_tile,), dtype).at[:m].set(1.0)
    for p in range(c):
        chol_bd = jax.lax.dynamic_update_slice(chol_bd, block,
                                               (p * a_tile, p * a_tile))
        isel = jax.lax.dynamic_update_slice(isel, ones[:, None],
                                            (p * a_tile, p))

    return {
        "s0": tile_row(spec.s, fill=1.0),  # pad spot 1: log() stays finite
        "k": tile_row(spec.strikes, fill=1.0),
        "w": tile_row(spec.weights, fill=0.0),  # pad weight 0: nets to 0
        "v": v_row,
        "drift": drift,
        "vol": vol,
        "chol_bd": chol_bd,
        "isel": isel,
    }


def _netted_exposure(s, ops, r, t_rem, mxu: bool):
    """Netted positive exposure ``(rows, c)`` at one node.

    Per lane: signed position value ``w * BS(s, k, v, t_rem)`` (intrinsic at
    the final node); per path: indicator matmul over its lane span, then the
    positive part.
    """
    t_safe = jnp.maximum(t_rem, 1e-12)
    bs = mcmath.bs_call_hastings(s, ops["k"], r, ops["v"], t_safe)
    val = ops["w"] * jnp.where(t_rem > 0, bs,
                               jnp.maximum(s - ops["k"], 0.0))
    if mxu:
        net = jnp.dot(val, ops["isel"], precision=MATMUL_PRECISION,
                      preferred_element_type=jnp.float32)
    else:
        c = ops["isel"].shape[1]
        a_tile = ops["chol_bd"].shape[0] // c
        net = val.reshape(val.shape[0], c, a_tile).sum(axis=-1)
    return jnp.maximum(net, 0.0)


# ---------------------------------------------------------------------------
# XLA backend
# ---------------------------------------------------------------------------

def xla_partials(spec: CvaMultiSpec, chol, key: jax.Array, block_offset,
                 plan: Plan, n_blocks: int):
    """Per-block partials: ``((n_blocks, 2), (n_blocks, n_grid))``."""
    dtype = plan.jdtype
    sp = spec.astype(dtype)
    if use_asset_major(spec.n_underlyings):
        return _am_xla_partials(sp, chol, key, block_offset, plan, n_blocks)
    g = spec.n_grid
    ops = pack_spec(sp, chol, dtype)
    width = ops["chol_bd"].shape[0]
    dp = mcmath.default_leg_weights(sp.intensity, sp.t, g, dtype=dtype)
    j = jnp.arange(1, g + 1, dtype=dtype)
    t_rem = jnp.asarray(sp.t, dtype) * (g - j) / g
    shape = (plan.rows, width)

    def walk(z_seq, sgn):
        def body(jj, carry):
            # Log-space carry (see kernels/cva.py): one non-compounding
            # exp per node recovers the spots for the exposure.
            x, acc, ee_sums = carry
            bt = jnp.dot(sgn * z_seq[jj], ops["chol_bd"],
                         precision=MATMUL_PRECISION,
                         preferred_element_type=jnp.float32)
            x = x + ops["drift"] + ops["vol"] * bt
            s = jnp.exp(x)
            ee = _netted_exposure(s, ops, sp.r, t_rem[jj], mxu=False)
            acc = acc + dp[jj] * ee
            ee_sums = ee_sums.at[jj].add(jnp.sum(ee))
            return (x, acc, ee_sums)

        init = (jnp.broadcast_to(jnp.log(ops["s0"]), shape),
                jnp.zeros((plan.rows, ops["isel"].shape[1]), dtype),
                jnp.zeros((g,), dtype))
        _, acc, ee_sums = jax.lax.fori_loop(0, g, body, init)
        return sp.lgd * acc, ee_sums

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (g,) + shape, dtype)
            cva_tile, ee_sums = walk(z_seq, jnp.asarray(1.0, dtype))
            if plan.antithetic:
                cva_m, ee_m = walk(z_seq, jnp.asarray(-1.0, dtype))
                cva_tile = 0.5 * (cva_tile + cva_m)
                ee_sums = 0.5 * (ee_sums + ee_m)
            cs, cs2 = chunk_sums(cva_tile)
            acc, ee_acc = carry
            return (_accum_add(acc, cs, cs2, plan.kahan), ee_acc + ee_sums)

        init = (_accum_init(dtype, plan.kahan), jnp.zeros((g,), dtype))
        acc, ee_acc = jax.lax.fori_loop(0, plan.iters, body, init)
        s, s2 = _accum_final(acc, plan.kahan)
        return jnp.stack([s, s2]), ee_acc

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


# ---------------------------------------------------------------------------
# Pallas TPU backend
# ---------------------------------------------------------------------------

def _cva_multi_kernel(seed_ref, off_ref, scal_ref, dp_ref, trem_ref,
                      s0_ref, k_ref, w_ref, v_ref, drift_ref, vol_ref,
                      lt_ref, isel_ref, out_ref, ee_ref, prof_ref, comp_ref,
                      *, plan: Plan, n_grid: int):
    r, lgd = scal_ref[0], scal_ref[1]
    ops = {
        "s0": s0_ref[:], "k": k_ref[:], "w": w_ref[:], "v": v_ref[:],
        "drift": drift_ref[:], "vol": vol_ref[:],
        "chol_bd": lt_ref[:], "isel": isel_ref[:],
    }
    width = lt_ref.shape[0]
    c = isel_ref.shape[1]
    shape = (plan.rows, width)
    b = pl.program_id(0)
    g_pad = prof_ref.shape[0]

    def walk(i, sgn):
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)
        sgn_half = 0.5 if plan.antithetic else 1.0

        def step(j, z, carry):
            # Log-space carry: see the XLA twin above.
            x, acc = carry
            bt = jnp.dot(sgn * z, ops["chol_bd"],
                         precision=MATMUL_PRECISION,
                         preferred_element_type=jnp.float32)
            x = x + ops["drift"] + ops["vol"] * bt
            s = jnp.exp(x)
            ee = _netted_exposure(s, ops, r, trem_ref[j], mxu=True)
            acc = acc + dp_ref[j] * ee
            # Kahan-compensated scalar profile accumulation in SMEM.
            total = sgn_half * jnp.sum(ee)
            y = total - comp_ref[j]
            t_new = prof_ref[j] + y
            comp_ref[j] = (t_new - prof_ref[j]) - y
            prof_ref[j] = t_new
            return (x, acc)

        init = (jnp.broadcast_to(jnp.log(ops["s0"]), shape),
                jnp.zeros((plan.rows, c), jnp.float32))
        _, acc = walk_pairwise(shape, n_grid, step, init)
        return lgd * acc

    def body(i, carry):
        if plan.antithetic:
            cva_tile = 0.5 * (walk(i, 1.0) + walk(i, -1.0))
        else:
            cva_tile = walk(i, 1.0)
        cs, cs2 = chunk_sums(cva_tile)
        return _accum_add(carry, cs, cs2, plan.kahan)

    def zero_prof(j, _):
        prof_ref[j] = 0.0
        comp_ref[j] = 0.0
        return 0

    jax.lax.fori_loop(0, g_pad, zero_prof, 0)
    carry = jax.lax.fori_loop(0, plan.iters, body,
                              _accum_init(jnp.float32, plan.kahan))
    s, s2 = _accum_final(carry, plan.kahan)
    out_ref[0, 0, 0] = s
    out_ref[0, 0, 1] = s2

    def write_prof(j, _):
        ee_ref[0, 0, j] = prof_ref[j] + comp_ref[j]
        return 0

    jax.lax.fori_loop(0, g_pad, write_prof, 0)


def pallas_partials(spec: CvaMultiSpec, chol, seed, block_offset, plan: Plan,
                    n_blocks: int, interpret: bool = False):
    """Per-block partials: ``((n_blocks, 2), (n_blocks, n_grid))`` on TPU."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        if use_asset_major(spec.n_underlyings):
            return _am_pallas_partials(spec, chol, seed, block_offset,
                                       plan, n_blocks, interpret)
        return _pallas_partials(spec, chol, seed, block_offset, plan,
                                n_blocks, interpret)


def _pallas_partials(spec, chol, seed, block_offset, plan, n_blocks,
                     interpret):
    sp = spec.astype(jnp.float32)
    g = spec.n_grid
    ops = pack_spec(sp, chol, jnp.float32)
    width = ops["chol_bd"].shape[0]
    c = ops["isel"].shape[1]
    dp = mcmath.default_leg_weights(sp.intensity, sp.t, g, jnp.float32)
    j = jnp.arange(1, g + 1, dtype=jnp.float32)
    t_rem = jnp.asarray(sp.t, jnp.float32) * (g - j) / g
    scal = jnp.stack([sp.r, sp.lgd])
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))
    g_pad = _round_up(g, 8)

    kernel = functools.partial(_cva_multi_kernel, plan=plan, n_grid=g)
    paths_iter = plan.rows * c * (2 if plan.antithetic else 1)
    out, ee = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 5
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=(
            block_out_spec(2),
            block_out_spec(g_pad),
        ),
        out_shape=(
            block_out_shape(n_blocks, 2),
            block_out_shape(n_blocks, g_pad),
        ),
        scratch_shapes=[pltpu.SMEM((g_pad,), jnp.float32),
                        pltpu.SMEM((g_pad,), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=GRID_SEMANTICS,
        ),
        cost_estimate=pl.CostEstimate(
            flops=plan.iters * plan.rows * g * (2 * width * width
                                                + 20 * width),
            bytes_accessed=n_blocks * (2 + g) * 4,
            transcendentals=plan.iters * paths_iter * g * 8,
        ),
        interpret=interpret_arg(interpret),
    )(seed_arr, off_arr, scal, dp, t_rem, ops["s0"], ops["k"], ops["w"],
      ops["v"], ops["drift"], ops["vol"], ops["chol_bd"], ops["isel"])
    return out.reshape(n_blocks, 2), ee.reshape(n_blocks, g_pad)[:, :g]


# ---------------------------------------------------------------------------
# Greeks: netting-set CVA sensitivities (credit delta + per-underlying
# delta/vega vectors) fused into the correlated exposure walk
# ---------------------------------------------------------------------------
#
# CVA = lgd * E[sum_j dp_j ee_j], ee_j = max(sum_m w_m BS(S_m, k_m, tau_j),
# 0).  Pathwise identities (kinks measure-zero, Glasserman 7.2):
#
#   credit delta: d(dp_j)/dlambda is a node table
#     (kernels/cva.py:credit_delta_weights — CvaMultiSpec duck-types it);
#   delta_m = sum_j dp_j 1{V_j>0} w_m N(d1_mj) S_mj / s0_m
#     (GBM homogeneity; intrinsic indicator at the final node);
#   vega_m  = sum_j dp_j 1{V_j>0} w_m [N(d1_mj) S_mj dxv_mj
#             + S_mj phi(d1_mj) sqrt(tau_j)]
#     with dxv_m = d log S_m/dv_m = sqrt(dt) sum bt - v_m t_j carried per
#     lane (ONE FMA per lane per step — the packed layout makes the
#     per-underlying tangent free: each lane already IS one underlying).
#
# The per-path exercise indicator (rows, c) is broadcast back onto the
# lanes with the transposed indicator matmul (iselT), mirroring the packed
# basket Greeks kernel's expand (kernels/greeks.py:_basket_greek_tile).
# Second-order outputs are intentionally absent here (the single-
# underlying greeks_cva carries them); use CRN bumps for netting-set
# gamma.  Per block: 4 scalar sums (cva, credit) + (4, width) lane rows
# (delta, vega sum/sum^2), folded onto the M underlying slots by the host.

N_MULTI_GREEK_SCALARS = 4  # (sum, sum^2) of: cva, credit delta


def greek_tables(spec: CvaMultiSpec, dtype):
    """Per-node scalar tables: dp, ddp/dlambda, tau, sqrt(tau), disc."""
    from mctpu.kernels.cva import credit_delta_weights
    g = spec.n_grid
    dp = mcmath.default_leg_weights(spec.intensity, spec.t, g, dtype=dtype)
    ddp = credit_delta_weights(spec, dtype)
    j = jnp.arange(1, g + 1, dtype=dtype)
    tau = jnp.asarray(spec.t, dtype) * (g - j) / g
    sqtau = jnp.sqrt(tau)
    disc = jnp.exp(-jnp.asarray(spec.r, dtype) * tau)
    return dp, ddp, tau, sqtau, disc


def _greek_node(x, s, ops, r, tau_j, sqtau_j, disc_j, dxv, mxu: bool):
    """One node's (ee, dval, vval) tiles from the walk state.

    ``dval``/``vval`` are the per-lane delta/vega integrands (already
    indicator-masked); ``ee`` the per-path netted positive exposure.
    """
    prec = MATMUL_PRECISION
    last = tau_j <= 0.0
    tau_safe = jnp.maximum(tau_j, 1e-12)
    sq = ops["v"] * jnp.maximum(sqtau_j, 1e-6)
    isig = 1.0 / sq
    d1 = (x - ops["logk"] + (r + ops["v2half"]) * tau_safe) * isig
    d2 = d1 - sq
    nd1 = mcmath.norm_cdf_hastings(d1)
    bs = s * nd1 - ops["k"] * disc_j * mcmath.norm_cdf_hastings(d2)
    itm = jnp.where(s > ops["k"], 1.0, 0.0)
    val = ops["w"] * jnp.where(last, jnp.maximum(s - ops["k"], 0.0), bs)
    if mxu:
        net = jnp.dot(val, ops["isel"], precision=prec,
                      preferred_element_type=jnp.float32)
    else:
        c = ops["isel"].shape[1]
        a_tile = ops["chol_bd"].shape[0] // c
        net = val.reshape(val.shape[0], c, a_tile).sum(axis=-1)
    ee = jnp.maximum(net, 0.0)
    ind = jnp.where(net > 0.0, 1.0, 0.0)
    if mxu:
        ind_w = jnp.dot(ind, ops["iselT"], precision=prec,
                        preferred_element_type=jnp.float32)
    else:
        c = ops["isel"].shape[1]
        a_tile = ops["chol_bd"].shape[0] // c
        ind_w = jnp.repeat(ind, a_tile, axis=1)
    nd1_eff = jnp.where(last, itm, nd1)
    ws = ind_w * ops["w"] * s
    dval = ws * nd1_eff
    phi = jnp.where(last, 0.0,
                    0.3989422804014327 * jnp.exp(-0.5 * d1 * d1))
    vval = dval * dxv + ws * phi * sqtau_j
    return ee, dval, vval


def _greek_step(j, z, carry, sgn, ops, tables, sp_r, mxu: bool):
    """One grid step advancing the walk state and the four accumulators."""
    dp, ddp, tau, sqtau, disc = tables
    x, dxv, acc, acc_cr, acc_d, acc_v = carry
    bt = jnp.dot(sgn * z, ops["chol_bd"], precision=MATMUL_PRECISION,
                 preferred_element_type=jnp.float32)
    x = x + ops["drift"] + ops["vol"] * bt
    dxv = dxv + ops["sqdt"] * bt - ops["vdt"]
    s = jnp.exp(x)
    ee, dval, vval = _greek_node(x, s, ops, sp_r, tau[j], sqtau[j],
                                 disc[j], dxv, mxu)
    return (x, dxv, acc + dp[j] * ee, acc_cr + ddp[j] * ee,
            acc_d + dp[j] * dval, acc_v + dp[j] * vval)


def _greek_walk_init(ops, shape):
    c = ops["isel"].shape[1]
    zero_c = jnp.zeros((shape[0], c), jnp.float32)
    zero_w = jnp.zeros(shape, jnp.float32)
    return (jnp.broadcast_to(jnp.log(ops["s0"]), shape), zero_w, zero_c,
            zero_c, zero_w, zero_w)


def _greek_walk(z_at, sgn, ops, tables, sp_r, lgd, g: int, shape,
                mxu: bool):
    """XLA-twin walk (pre-drawn normals) -> (cva (rows, c), credit
    (rows, c), delta (rows, width), vega (rows, width)) tiles."""
    def body(j, carry):
        return _greek_step(j, z_at(j), carry, sgn, ops, tables, sp_r, mxu)

    _, _, acc, acc_cr, acc_d, acc_v = jax.lax.fori_loop(
        0, g, body, _greek_walk_init(ops, shape))
    return lgd * acc, lgd * acc_cr, lgd * acc_d, lgd * acc_v


def greek_ops(spec: CvaMultiSpec, chol, dtype):
    """Greek-kernel operands: :func:`pack_spec` plus the tangent rows."""
    ops = pack_spec(spec, chol, dtype)
    g = spec.n_grid
    dt = jnp.asarray(spec.t, dtype) / g
    ops["iselT"] = ops["isel"].T.copy()
    ops["logk"] = jnp.log(ops["k"])
    ops["v2half"] = 0.5 * ops["v"] * ops["v"]
    ops["sqdt"] = jnp.sqrt(dt)
    ops["vdt"] = ops["v"] * dt
    return ops


def greek_xla_partials(spec: CvaMultiSpec, chol, key: jax.Array,
                       block_offset, plan: Plan, n_blocks: int):
    """Per-block Greek partials: ``((n_blocks, 4), (n_blocks, 4, width))``
    (``width = LANES`` in the asset-major regime)."""
    dtype = plan.jdtype
    sp = spec.astype(dtype)
    if use_asset_major(spec.n_underlyings):
        return _am_greek_xla_partials(sp, chol, key, block_offset, plan,
                                      n_blocks)
    g = spec.n_grid
    ops = greek_ops(sp, chol, dtype)
    tables = greek_tables(sp, dtype)
    width = ops["chol_bd"].shape[0]
    shape = (plan.rows, width)

    def block_fn(bkey):
        def body(i, carry):
            acc, vecs = carry
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (g,) + shape, dtype)
            tiles = _greek_walk(lambda j: z_seq[j], 1.0, ops, tables,
                                sp.r, sp.lgd, g, shape, mxu=False)
            if plan.antithetic:
                mt = _greek_walk(lambda j: z_seq[j], -1.0, ops, tables,
                                 sp.r, sp.lgd, g, shape, mxu=False)
                tiles = tuple(0.5 * (a + b) for a, b in zip(tiles, mt))
            cva_t, cr_t, d_t, v_t = tiles
            acc = acc_add_n(acc, (jnp.sum(cva_t), jnp.sum(cva_t * cva_t),
                                  jnp.sum(cr_t), jnp.sum(cr_t * cr_t)),
                            plan.kahan)
            vecs = vecs + jnp.stack([
                det_col_sums(d_t), det_col_sums(d_t * d_t),
                det_col_sums(v_t), det_col_sums(v_t * v_t)])
            return acc, vecs

        acc, vecs = jax.lax.fori_loop(
            0, plan.iters, body,
            (acc_init_n(N_MULTI_GREEK_SCALARS, dtype, plan.kahan),
             jnp.zeros((4, width), dtype)))
        return jnp.stack(acc_final_n(acc, plan.kahan)), vecs

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


def _cva_multi_greeks_kernel(seed_ref, off_ref, scal_ref, dp_ref, ddp_ref,
                             tau_ref, sqtau_ref, disc_ref, s0_ref, k_ref,
                             logk_ref, w_ref, v_ref, v2h_ref, vdt_ref,
                             drift_ref, vol_ref, lt_ref, isel_ref,
                             iselt_ref, out_ref, vec_ref, *, plan: Plan,
                             n_grid: int):
    r, lgd, sqdt = scal_ref[0], scal_ref[1], scal_ref[2]
    ops = {
        "s0": s0_ref[:], "k": k_ref[:], "logk": logk_ref[:],
        "w": w_ref[:], "v": v_ref[:], "v2half": v2h_ref[:],
        "vdt": vdt_ref[:], "drift": drift_ref[:], "vol": vol_ref[:],
        "chol_bd": lt_ref[:], "isel": isel_ref[:], "iselT": iselt_ref[:],
        "sqdt": sqdt,
    }
    width = lt_ref.shape[0]
    shape = (plan.rows, width)
    tables = (dp_ref, ddp_ref, tau_ref, sqtau_ref, disc_ref)
    b = pl.program_id(0)

    def one_walk(i, sgn):
        # Same pairwise Box-Muller consumption as the pricing kernel:
        # both branches drive grid steps, none are discarded.
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)
        carry = walk_pairwise(
            shape, n_grid,
            lambda j, z, cy: _greek_step(j, z, cy, sgn, ops, tables, r,
                                         True),
            _greek_walk_init(ops, shape))
        _, _, acc, acc_cr, acc_d, acc_v = carry
        return lgd * acc, lgd * acc_cr, lgd * acc_d, lgd * acc_v

    def body(i, carry):
        acc, vecs = carry
        tiles = one_walk(i, 1.0)
        if plan.antithetic:
            mt = one_walk(i, -1.0)
            tiles = tuple(0.5 * (a + b2) for a, b2 in zip(tiles, mt))
        cva_t, cr_t, d_t, v_t = tiles
        acc = acc_add_n(acc, (jnp.sum(cva_t), jnp.sum(cva_t * cva_t),
                              jnp.sum(cr_t), jnp.sum(cr_t * cr_t)),
                        plan.kahan)
        vecs = vecs + jnp.stack([
            det_col_sums(d_t), det_col_sums(d_t * d_t),
            det_col_sums(v_t), det_col_sums(v_t * v_t)])
        return acc, vecs

    acc, vecs = jax.lax.fori_loop(
        0, plan.iters, body,
        (acc_init_n(N_MULTI_GREEK_SCALARS, jnp.float32, plan.kahan),
         jnp.zeros((4, width), jnp.float32)))
    vals = acc_final_n(acc, plan.kahan)
    for j in range(N_MULTI_GREEK_SCALARS):
        out_ref[0, 0, j] = vals[j]
    vec_ref[0] = vecs


def greek_pallas_partials(spec: CvaMultiSpec, chol, seed, block_offset,
                          plan: Plan, n_blocks: int,
                          interpret: bool = False):
    """Fused netting-set CVA Greek partials on TPU."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        if use_asset_major(spec.n_underlyings):
            return _am_greek_pallas_partials(spec, chol, seed, block_offset,
                                             plan, n_blocks, interpret)
        sp = spec.astype(jnp.float32)
        g = spec.n_grid
        ops = greek_ops(sp, chol, jnp.float32)
        dp, ddp, tau, sqtau, disc = greek_tables(sp, jnp.float32)
        width = ops["chol_bd"].shape[0]
        scal = jnp.stack([sp.r, sp.lgd, ops["sqdt"]])
        seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
        off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))
        kernel = functools.partial(_cva_multi_greeks_kernel, plan=plan,
                                   n_grid=g)
        c = ops["isel"].shape[1]
        paths_iter = plan.rows * c * (2 if plan.antithetic else 1)
        out, vecs = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 8
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12,
            out_specs=(
                block_out_spec(N_MULTI_GREEK_SCALARS),
                pl.BlockSpec((1, 4, width), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                block_out_shape(n_blocks, N_MULTI_GREEK_SCALARS),
                jax.ShapeDtypeStruct((n_blocks, 4, width), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=GRID_SEMANTICS,
            ),
            cost_estimate=pl.CostEstimate(
                flops=plan.iters * plan.rows * g * (4 * width * width
                                                    + 40 * width),
                bytes_accessed=n_blocks * (4 + 4 * width) * 4,
                transcendentals=plan.iters * paths_iter * g * 12,
            ),
            interpret=interpret_arg(interpret),
        )(seed_arr, off_arr, scal, dp, ddp, tau, sqtau, disc, ops["s0"],
          ops["k"], ops["logk"], ops["w"], ops["v"], ops["v2half"],
          ops["vdt"], ops["drift"], ops["vol"], ops["chol_bd"],
          ops["isel"], ops["iselT"])
    return out.reshape(n_blocks, N_MULTI_GREEK_SCALARS), vecs


# ---------------------------------------------------------------------------
# Asset-major regime (m <= ASSET_MAJOR_MAX)
# ---------------------------------------------------------------------------
# Small netting sets skip the MXU entirely (the kernels/basket.py:45 /
# kernels/multi_walk.py argument): the packed walk pays THREE width x width
# HIGHEST-precision matmuls per node (Cholesky walk, indicator fold,
# indicator expand) for ~97% zeros at m = 2 — measured at 29% of its VPU op
# ceiling even at 256-row geometry (benchmarks/greeks_r4.json).  Asset-major
# carries one (rows, 128) log-spot tile PER UNDERLYING — every lane a
# path — so the correlation costs m(m+1)/2 broadcast-scalar FMAs, the
# netting fold is m-1 tile adds, and the exercise indicator is shared by
# all legs with no expand at all.  Draws pair across two successive grid
# steps (walk_pairwise_multi); streams therefore differ from the packed
# regime (the same regime-keyed convention as kernels/basket.py).  The
# node math below is SHARED between the pricer and the Greek kernel
# (tracing DCE drops the Greek factors from the pricing program), so
# greeks_cva_multi's price ties to price_cva_multi bitwise on shared
# streams.

def _am_ops(spec: CvaMultiSpec, chol, dtype):
    """``(lt (m, m), params (9, m), sqdt)``: per-underlying columns
    0 log_s0, 1 drift dt, 2 v sqrt(dt), 3 v dt, 4 w, 5 k, 6 log k,
    7 v^2/2, 8 v."""
    m = spec.n_underlyings
    dt = jnp.asarray(spec.t, dtype) / spec.n_grid
    v = jnp.broadcast_to(jnp.asarray(spec.v, dtype), (m,))
    s0 = jnp.broadcast_to(jnp.asarray(spec.s, dtype), (m,))
    k = jnp.broadcast_to(jnp.asarray(spec.strikes, dtype), (m,))
    w = jnp.broadcast_to(jnp.asarray(spec.weights, dtype), (m,))
    r = jnp.asarray(spec.r, dtype)
    params = jnp.stack([jnp.log(s0), (r - 0.5 * v * v) * dt,
                        v * jnp.sqrt(dt), v * dt, w, k, jnp.log(k),
                        0.5 * v * v, v])
    return jnp.asarray(chol, dtype), params, jnp.sqrt(dt)


def _am_quants(zs, xs, lt_at, par_at, r, tau_j, sqtau_j, disc_j, m: int):
    """Advance the ``m`` log-spot tiles one grid node and re-price every
    leg.

    Returns ``(new_xs, bts, ss, vals, nd1_effs, phis)``: the advanced
    walk state, per-asset correlated increments and spots, the signed
    position-value tiles, and the delta/vega node factors (the pricing
    walk ignores the last two; tracing DCE drops them).  Node semantics
    match the packed :func:`_greek_node` exactly: Hastings-CDF
    Black-Scholes exposure, intrinsic value and the ITM indicator at the
    final node.
    """
    last = tau_j <= 0.0
    tau_safe = jnp.maximum(tau_j, 1e-12)
    sq_floor = jnp.maximum(sqtau_j, 1e-6)
    new_xs, bts, ss, vals, nd1_effs, phis = [], [], [], [], [], []
    for i in range(m):
        bt = None
        for jj in range(i + 1):
            zc = lt_at(i, jj) * zs[jj]
            bt = zc if bt is None else bt + zc
        x = xs[i] + par_at(1, i) + par_at(2, i) * bt
        s = jnp.exp(x)
        sq = par_at(8, i) * sq_floor
        isig = 1.0 / sq
        d1 = (x - par_at(6, i) + (r + par_at(7, i)) * tau_safe) * isig
        d2 = d1 - sq
        nd1 = mcmath.norm_cdf_hastings(d1)
        bs = s * nd1 - par_at(5, i) * disc_j * mcmath.norm_cdf_hastings(d2)
        intr = jnp.maximum(s - par_at(5, i), 0.0)
        val = par_at(4, i) * jnp.where(last, intr, bs)
        itm = jnp.where(s > par_at(5, i), 1.0, 0.0)
        nd1_eff = jnp.where(last, itm, nd1)
        phi = jnp.where(last, 0.0,
                        0.3989422804014327 * jnp.exp(-0.5 * d1 * d1))
        new_xs.append(x)
        bts.append(bt)
        ss.append(s)
        vals.append(val)
        nd1_effs.append(nd1_eff)
        phis.append(phi)
    return tuple(new_xs), bts, ss, vals, nd1_effs, phis


def _am_net(vals):
    net = vals[0]
    for v in vals[1:]:
        net = net + v
    return jnp.maximum(net, 0.0), net


def _am_init_xs(par_at, m: int, shape, dtype=jnp.float32):
    return tuple(jnp.zeros(shape, dtype) + par_at(0, i) for i in range(m))


# -- pricing ----------------------------------------------------------------

def _am_price_step(j, zs, carry, lt_at, par_at, r, tables_at, m: int,
                   node_hook=None):
    """One pricing grid step: ``carry = (xs, acc)`` with ``acc`` the
    per-path running default-leg sum.  ``node_hook(j, ee)`` feeds the
    exposure-profile accumulator (SMEM Kahan scalars in the kernel, a
    vector ``.at[j].add`` on the XLA twin)."""
    dp_at, tau_at, sqtau_at, disc_at = tables_at
    xs, acc = carry
    xs, _, _, vals, _, _ = _am_quants(zs, xs, lt_at, par_at, r, tau_at(j),
                                      sqtau_at(j), disc_at(j), m)
    ee, _ = _am_net(vals)
    if node_hook is not None:
        node_hook(j, ee)
    return (xs, acc + dp_at(j) * ee)


def _am_xla_partials(sp, chol, key, block_offset, plan: Plan,
                     n_blocks: int):
    """Asset-major XLA twin: ``((n_blocks, 2), (n_blocks, n_grid))``."""
    dtype = plan.jdtype
    m = sp.n_underlyings
    g = sp.n_grid
    lt, params, _ = _am_ops(sp, chol, dtype)
    dp, _, tau, sqtau, disc = greek_tables(sp, dtype)
    lt_at = lambda i, j: lt[i, j]
    par_at = lambda r_, i: params[r_, i]
    tables_at = (lambda j: dp[j], lambda j: tau[j], lambda j: sqtau[j],
                 lambda j: disc[j])
    shape = (plan.rows, LANES)
    r = jnp.asarray(sp.r, dtype)
    sgn_half = jnp.asarray(0.5 if plan.antithetic else 1.0, dtype)

    def walk(z_seq, sgn, ee_sums):
        def body(j, carry):
            xs, acc, ee_acc = carry
            zs = [sgn * z_seq[j, i] for i in range(m)]
            seen = []
            xs, acc = _am_price_step(j, zs, (xs, acc), lt_at, par_at, r,
                                     tables_at, m,
                                     node_hook=lambda _, ee: seen.append(ee))
            ee_acc = ee_acc.at[j].add(sgn_half * jnp.sum(seen[0]))
            return (xs, acc, ee_acc)

        init = (_am_init_xs(par_at, m, shape, dtype),
                jnp.zeros(shape, dtype), ee_sums)
        _, acc, ee_sums = jax.lax.fori_loop(0, g, body, init)
        return sp.lgd * acc, ee_sums

    def block_fn(bkey):
        def body(i, carry):
            acc, ee_acc = carry
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (g, m) + shape, dtype)
            cva_tile, ee_acc = walk(z_seq, jnp.asarray(1.0, dtype), ee_acc)
            if plan.antithetic:
                cva_m, ee_acc = walk(z_seq, jnp.asarray(-1.0, dtype),
                                     ee_acc)
                cva_tile = 0.5 * (cva_tile + cva_m)
            cs, cs2 = chunk_sums(cva_tile)
            return (_accum_add(acc, cs, cs2, plan.kahan), ee_acc)

        init = (_accum_init(dtype, plan.kahan), jnp.zeros((g,), dtype))
        acc, ee_acc = jax.lax.fori_loop(0, plan.iters, body, init)
        s, s2 = _accum_final(acc, plan.kahan)
        return jnp.stack([s, s2]), ee_acc

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


def _am_cva_multi_kernel(seed_ref, off_ref, scal_ref, dp_ref, tau_ref,
                         sqtau_ref, disc_ref, lt_ref, par_ref, out_ref,
                         ee_ref, prof_ref, comp_ref, *, plan: Plan,
                         n_grid: int, m: int):
    r, lgd = scal_ref[0], scal_ref[1]
    lt_at = lambda ii, jj: lt_ref[ii, jj]
    par_at = lambda rr, ii: par_ref[rr, ii]
    tables_at = (lambda j: dp_ref[j], lambda j: tau_ref[j],
                 lambda j: sqtau_ref[j], lambda j: disc_ref[j])
    shape = (plan.rows, LANES)
    b = pl.program_id(0)
    g_pad = prof_ref.shape[0]
    sgn_half = 0.5 if plan.antithetic else 1.0

    def hook(j, ee):
        # Kahan-compensated scalar profile accumulation in SMEM.
        total = sgn_half * jnp.sum(ee)
        y = total - comp_ref[j]
        t_new = prof_ref[j] + y
        comp_ref[j] = (t_new - prof_ref[j]) - y
        prof_ref[j] = t_new

    def walk(i, sgn):
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)

        def step(j, zs, carry):
            return _am_price_step(j, [sgn * z for z in zs], carry, lt_at,
                                  par_at, r, tables_at, m, node_hook=hook)

        init = (_am_init_xs(par_at, m, shape), jnp.zeros(shape, jnp.float32))
        _, acc = walk_pairwise_multi(shape, m, n_grid, step, init)
        return lgd * acc

    def body(i, carry):
        if plan.antithetic:
            cva_tile = 0.5 * (walk(i, 1.0) + walk(i, -1.0))
        else:
            cva_tile = walk(i, 1.0)
        cs, cs2 = chunk_sums(cva_tile)
        return _accum_add(carry, cs, cs2, plan.kahan)

    def zero_prof(j, _):
        prof_ref[j] = 0.0
        comp_ref[j] = 0.0
        return 0

    jax.lax.fori_loop(0, g_pad, zero_prof, 0)
    carry = jax.lax.fori_loop(0, plan.iters, body,
                              _accum_init(jnp.float32, plan.kahan))
    s, s2 = _accum_final(carry, plan.kahan)
    out_ref[0, 0, 0] = s
    out_ref[0, 0, 1] = s2

    def write_prof(j, _):
        ee_ref[0, 0, j] = prof_ref[j] + comp_ref[j]
        return 0

    jax.lax.fori_loop(0, g_pad, write_prof, 0)


def _am_pallas_partials(spec, chol, seed, block_offset, plan, n_blocks,
                        interpret):
    sp = spec.astype(jnp.float32)
    m = sp.n_underlyings
    g = sp.n_grid
    lt, params, _ = _am_ops(sp, chol, jnp.float32)
    dp, _, tau, sqtau, disc = greek_tables(sp, jnp.float32)
    scal = jnp.stack([sp.r, sp.lgd])
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))
    g_pad = _round_up(g, 8)
    kernel = functools.partial(_am_cva_multi_kernel, plan=plan, n_grid=g,
                               m=m)
    paths_iter = plan.rows * LANES * (2 if plan.antithetic else 1)
    out, ee = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 9,
        out_specs=(
            block_out_spec(2),
            block_out_spec(g_pad),
        ),
        out_shape=(
            block_out_shape(n_blocks, 2),
            block_out_shape(n_blocks, g_pad),
        ),
        scratch_shapes=[pltpu.SMEM((g_pad,), jnp.float32),
                        pltpu.SMEM((g_pad,), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=GRID_SEMANTICS,
        ),
        cost_estimate=pl.CostEstimate(
            flops=plan.iters * paths_iter * g * (m * (m + 1) + 12 * m + 4),
            bytes_accessed=n_blocks * (2 + g) * 4,
            transcendentals=plan.iters * paths_iter * g * (3 * m + m // 2),
        ),
        interpret=interpret_arg(interpret),
    )(seed_arr, off_arr, scal, dp, tau, sqtau, disc, lt, params)
    return out.reshape(n_blocks, 2), ee.reshape(n_blocks, g_pad)[:, :g]


# -- Greeks -----------------------------------------------------------------

def _am_greek_step(j, zs, carry, lt_at, par_at, r, sqdt, tables_at,
                   m: int):
    """One Greek grid step.  ``carry = (xs, dxvs, acc, acc_cr, acc_d,
    acc_v)``; integrands match the packed :func:`_greek_step` exactly
    (the per-asset vol tangent ``dxv_i += sqdt bt_i - v_i dt``, the
    shared per-path exercise indicator, and the delta/vega node
    factors)."""
    dp_at, ddp_at, tau_at, sqtau_at, disc_at = tables_at
    xs, dxvs, acc, acc_cr, acc_d, acc_v = carry
    sqtau_j = sqtau_at(j)
    xs, bts, ss, vals, nd1_effs, phis = _am_quants(
        zs, xs, lt_at, par_at, r, tau_at(j), sqtau_j, disc_at(j), m)
    dxvs = tuple(dxvs[i] + sqdt * bts[i] - par_at(3, i) for i in range(m))
    ee, net = _am_net(vals)
    ind = jnp.where(net > 0.0, 1.0, 0.0)
    dp_j, ddp_j = dp_at(j), ddp_at(j)
    new_d, new_v = [], []
    for i in range(m):
        ws = ind * par_at(4, i) * ss[i]
        dval = ws * nd1_effs[i]
        vval = dval * dxvs[i] + ws * phis[i] * sqtau_j
        new_d.append(acc_d[i] + dp_j * dval)
        new_v.append(acc_v[i] + dp_j * vval)
    return (xs, dxvs, acc + dp_j * ee, acc_cr + ddp_j * ee,
            tuple(new_d), tuple(new_v))


def _am_greek_init(par_at, m: int, shape, dtype=jnp.float32):
    zero = lambda: jnp.zeros(shape, dtype)
    zeros_m = lambda: tuple(zero() for _ in range(m))
    return (_am_init_xs(par_at, m, shape, dtype), zeros_m(), zero(),
            zero(), zeros_m(), zeros_m())


def _am_greek_sums(tiles, m: int):
    """Per-iteration scalar sums, ordered for :func:`am_lane_rows`:
    ``[cva, cva^2, cr, cr^2, d_0.., d^2_0.., v_0.., v^2_0..]``."""
    cva_t, cr_t, dvals, vvals = tiles
    vals = [jnp.sum(cva_t), jnp.sum(cva_t * cva_t),
            jnp.sum(cr_t), jnp.sum(cr_t * cr_t)]
    for grp in (dvals, [d * d for d in dvals],
                vvals, [v * v for v in vvals]):
        vals.extend(jnp.sum(g) for g in grp)
    return tuple(vals)


def _am_avg_tiles(ta, tb):
    return tuple(
        0.5 * (x + y) if not isinstance(x, list)
        else [0.5 * (xi + yi) for xi, yi in zip(x, y)]
        for x, y in zip(ta, tb))


def _am_greek_xla_partials(sp, chol, key, block_offset, plan: Plan,
                           n_blocks: int):
    """Asset-major XLA twin of the netting-set Greek kernel."""
    dtype = plan.jdtype
    m = sp.n_underlyings
    g = sp.n_grid
    lt, params, sqdt = _am_ops(sp, chol, dtype)
    dp, ddp, tau, sqtau, disc = greek_tables(sp, dtype)
    lt_at = lambda i, j: lt[i, j]
    par_at = lambda r_, i: params[r_, i]
    tables_at = (lambda j: dp[j], lambda j: ddp[j], lambda j: tau[j],
                 lambda j: sqtau[j], lambda j: disc[j])
    shape = (plan.rows, LANES)
    r = jnp.asarray(sp.r, dtype)
    n_sums = N_MULTI_GREEK_SCALARS + 4 * m

    def one_walk(z_seq, sgn):
        def body(j, carry):
            zs = [sgn * z_seq[j, i] for i in range(m)]
            return _am_greek_step(j, zs, carry, lt_at, par_at, r, sqdt,
                                  tables_at, m)

        carry = jax.lax.fori_loop(0, g, body,
                                  _am_greek_init(par_at, m, shape, dtype))
        _, _, acc, acc_cr, acc_d, acc_v = carry
        return (sp.lgd * acc, sp.lgd * acc_cr,
                [sp.lgd * d for d in acc_d], [sp.lgd * v for v in acc_v])

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (g, m) + shape, dtype)
            tiles = one_walk(z_seq, jnp.asarray(1.0, dtype))
            if plan.antithetic:
                tiles = _am_avg_tiles(
                    tiles, one_walk(z_seq, jnp.asarray(-1.0, dtype)))
            return acc_add_n(carry, _am_greek_sums(tiles, m), plan.kahan)

        carry = jax.lax.fori_loop(0, plan.iters, body,
                                  acc_init_n(n_sums, dtype, plan.kahan))
        vals = acc_final_n(carry, plan.kahan)
        return (jnp.stack(vals[:N_MULTI_GREEK_SCALARS]),
                am_lane_rows(vals, N_MULTI_GREEK_SCALARS, m, 4)
                .astype(dtype))

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


def _am_cva_multi_greeks_kernel(seed_ref, off_ref, scal_ref, dp_ref,
                                ddp_ref, tau_ref, sqtau_ref, disc_ref,
                                lt_ref, par_ref, out_ref, vec_ref, *,
                                plan: Plan, n_grid: int, m: int):
    r, lgd, sqdt = scal_ref[0], scal_ref[1], scal_ref[2]
    lt_at = lambda ii, jj: lt_ref[ii, jj]
    par_at = lambda rr, ii: par_ref[rr, ii]
    tables_at = (lambda j: dp_ref[j], lambda j: ddp_ref[j],
                 lambda j: tau_ref[j], lambda j: sqtau_ref[j],
                 lambda j: disc_ref[j])
    shape = (plan.rows, LANES)
    n_sums = N_MULTI_GREEK_SCALARS + 4 * m
    b = pl.program_id(0)

    def one_walk(i, sgn):
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)

        def step(j, zs, carry):
            return _am_greek_step(j, [sgn * z for z in zs], carry, lt_at,
                                  par_at, r, sqdt, tables_at, m)

        carry = walk_pairwise_multi(shape, m, n_grid, step,
                                    _am_greek_init(par_at, m, shape))
        _, _, acc, acc_cr, acc_d, acc_v = carry
        return (lgd * acc, lgd * acc_cr, [lgd * d for d in acc_d],
                [lgd * v for v in acc_v])

    def body(i, carry):
        tiles = one_walk(i, 1.0)
        if plan.antithetic:
            tiles = _am_avg_tiles(tiles, one_walk(i, -1.0))
        return acc_add_n(carry, _am_greek_sums(tiles, m), plan.kahan)

    carry = jax.lax.fori_loop(0, plan.iters, body,
                              acc_init_n(n_sums, jnp.float32, plan.kahan))
    vals = acc_final_n(carry, plan.kahan)
    for j in range(N_MULTI_GREEK_SCALARS):
        out_ref[0, 0, j] = vals[j]
    vec_ref[0] = am_lane_rows(vals, N_MULTI_GREEK_SCALARS, m, 4)


def _am_greek_pallas_partials(spec, chol, seed, block_offset, plan: Plan,
                              n_blocks: int, interpret: bool):
    """Fused asset-major netting-set CVA Greek partials on TPU."""
    sp = spec.astype(jnp.float32)
    m = sp.n_underlyings
    g = sp.n_grid
    lt, params, sqdt = _am_ops(sp, chol, jnp.float32)
    dp, ddp, tau, sqtau, disc = greek_tables(sp, jnp.float32)
    scal = jnp.stack([sp.r, sp.lgd, sqdt])
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))
    kernel = functools.partial(_am_cva_multi_greeks_kernel, plan=plan,
                               n_grid=g, m=m)
    paths_iter = plan.rows * LANES * (2 if plan.antithetic else 1)
    out, vecs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 10,
        out_specs=(
            block_out_spec(N_MULTI_GREEK_SCALARS),
            pl.BlockSpec((1, 4, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            block_out_shape(n_blocks, N_MULTI_GREEK_SCALARS),
            jax.ShapeDtypeStruct((n_blocks, 4, LANES), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=GRID_SEMANTICS,
        ),
        cost_estimate=pl.CostEstimate(
            flops=plan.iters * paths_iter * g * (m * (m + 1) + 20 * m + 6),
            bytes_accessed=n_blocks * (4 + 4 * LANES) * 4,
            transcendentals=plan.iters * paths_iter * g * (3 * m + m // 2),
        ),
        interpret=interpret_arg(interpret),
    )(seed_arr, off_arr, scal, dp, ddp, tau, sqtau, disc, lt, params)
    return out.reshape(n_blocks, N_MULTI_GREEK_SCALARS), vecs


# ---------------------------------------------------------------------------
# Bilateral xVA: CVA / DVA / FCA / FBA legs from one fused sweep
# ---------------------------------------------------------------------------
# Beyond the reference (unilateral CVA only, cvaOpt.cu): the netted value
# V_j the pricing kernels already compute (pre-clamp) carries BOTH exposure
# sides — EPE_j = max(V_j, 0) feeds the CVA and funding-cost legs, ENE_j =
# max(-V_j, 0) the DVA and funding-benefit legs.  All four legs are
# deterministic node tables (math.xva_leg_weights / funding_leg_weights)
# times additive per-path accumulators, so they ride the engine contract
# unchanged: per-block (sum, sum^2) partials per leg (8 scalars), fixed-
# order combine, bitwise shard invariance.  The walk and node math are
# _am_quants / _am_net — the SAME code as the pricer — so at
# own_intensity = 0, funding_spread = 0 the CVA leg ties price_cva_multi
# bitwise on shared streams.  Asset-major only (every netting set the
# Pallas path serves is m <= ASSET_MAJOR_MAX; the XLA twin runs the same
# asset-major structure at any m).

N_XVA_SUMS = 8  # (sum, sum^2) of: cva, dva, fca, fba path legs


def xva_tables(xspec, dtype):
    """Per-node tables ``(w_cva, w_dva, w_fnd, tau, sqtau, disc)``."""
    sp = xspec.netting
    g = sp.n_grid
    w_cva, w_dva = mcmath.xva_leg_weights(sp.intensity, xspec.own_intensity,
                                          sp.t, g, dtype=dtype)
    w_fnd = mcmath.funding_leg_weights(sp.intensity, xspec.own_intensity,
                                       xspec.funding_spread, sp.t, g,
                                       dtype=dtype)
    j = jnp.arange(1, g + 1, dtype=dtype)
    tau = jnp.asarray(sp.t, dtype) * (g - j) / g
    sqtau = jnp.sqrt(tau)
    disc = jnp.exp(-jnp.asarray(sp.r, dtype) * tau)
    return w_cva, w_dva, w_fnd, tau, sqtau, disc


def _am_xva_step(j, zs, carry, lt_at, par_at, r, tables_at, m: int,
                 node_hook=None):
    """One xVA grid step: ``carry = (xs, ac, ad, af, ab)`` — the walk state
    plus the four running leg sums.  ``node_hook(j, epe, ene)`` feeds the
    two exposure-profile accumulators."""
    wc_at, wd_at, wf_at, tau_at, sqtau_at, disc_at = tables_at
    xs, ac, ad, af, ab = carry
    xs, _, _, vals, _, _ = _am_quants(zs, xs, lt_at, par_at, r, tau_at(j),
                                      sqtau_at(j), disc_at(j), m)
    epe, net = _am_net(vals)
    ene = epe - net  # max(-net, 0) without a second clamp
    if node_hook is not None:
        node_hook(j, epe, ene)
    wf_j = wf_at(j)
    return (xs, ac + wc_at(j) * epe, ad + wd_at(j) * ene,
            af + wf_j * epe, ab + wf_j * ene)


def _xva_leg_sums(tiles):
    """Per-iteration ``(sum, sum^2)`` pairs over the four leg tiles, in
    N_XVA_SUMS order."""
    vals = []
    for t in tiles:
        vals.append(jnp.sum(t))
        vals.append(jnp.sum(t * t))
    return tuple(vals)


def xva_xla_partials(xspec, chol, key: jax.Array, block_offset, plan: Plan,
                     n_blocks: int):
    """XLA twin: ``((n_blocks, N_XVA_SUMS), (n_blocks, 2, n_grid))`` —
    asset-major at any underlying count."""
    dtype = plan.jdtype
    sp = xspec.netting.astype(dtype)
    m, g = sp.n_underlyings, sp.n_grid
    lt, params, _ = _am_ops(sp, chol, dtype)
    tabs = xva_tables(xspec, dtype)
    lt_at = lambda i, j: lt[i, j]
    par_at = lambda r_, i: params[r_, i]
    tables_at = tuple((lambda j, a=a: a[j]) for a in tabs)
    shape = (plan.rows, LANES)
    r = jnp.asarray(sp.r, dtype)
    lgd = jnp.asarray(sp.lgd, dtype)
    olgd = jnp.asarray(xspec.own_lgd, dtype)
    sgn_half = jnp.asarray(0.5 if plan.antithetic else 1.0, dtype)

    def walk(z_seq, sgn, prof):
        def body(j, carry):
            *state, pr = carry
            zs = [sgn * z_seq[j, i] for i in range(m)]
            seen = []
            state = _am_xva_step(
                j, zs, tuple(state), lt_at, par_at, r, tables_at, m,
                node_hook=lambda _, epe, ene: seen.extend([epe, ene]))
            pr = pr.at[0, j].add(sgn_half * jnp.sum(seen[0]))
            pr = pr.at[1, j].add(sgn_half * jnp.sum(seen[1]))
            return (*state, pr)

        zero = jnp.zeros(shape, dtype)
        init = (_am_init_xs(par_at, m, shape, dtype), zero, zero, zero,
                zero, prof)
        _, ac, ad, af, ab, prof = jax.lax.fori_loop(0, g, body, init)
        return (lgd * ac, olgd * ad, af, ab), prof

    def block_fn(bkey):
        def body(i, carry):
            acc, prof = carry
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (g, m) + shape, dtype)
            tiles, prof = walk(z_seq, jnp.asarray(1.0, dtype), prof)
            if plan.antithetic:
                mt, prof = walk(z_seq, jnp.asarray(-1.0, dtype), prof)
                tiles = tuple(0.5 * (a + b) for a, b in zip(tiles, mt))
            return acc_add_n(acc, _xva_leg_sums(tiles), plan.kahan), prof

        acc, prof = jax.lax.fori_loop(
            0, plan.iters, body,
            (acc_init_n(N_XVA_SUMS, dtype, plan.kahan),
             jnp.zeros((2, g), dtype)))
        return jnp.stack(acc_final_n(acc, plan.kahan)), prof

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


def _am_xva_kernel(seed_ref, off_ref, scal_ref, wc_ref, wd_ref, wf_ref,
                   tau_ref, sqtau_ref, disc_ref, lt_ref, par_ref, out_ref,
                   prof_out_ref, prof_ref, comp_ref, *, plan: Plan,
                   n_grid: int, m: int):
    r, lgd, olgd = scal_ref[0], scal_ref[1], scal_ref[2]
    lt_at = lambda ii, jj: lt_ref[ii, jj]
    par_at = lambda rr, ii: par_ref[rr, ii]
    tables_at = (lambda j: wc_ref[j], lambda j: wd_ref[j],
                 lambda j: wf_ref[j], lambda j: tau_ref[j],
                 lambda j: sqtau_ref[j], lambda j: disc_ref[j])
    shape = (plan.rows, LANES)
    b = pl.program_id(0)
    two_g_pad = prof_ref.shape[0]
    g_pad = two_g_pad // 2
    sgn_half = 0.5 if plan.antithetic else 1.0

    def _prof_add(slot, total):
        # Kahan-compensated scalar profile accumulation in SMEM.
        y = total - comp_ref[slot]
        t_new = prof_ref[slot] + y
        comp_ref[slot] = (t_new - prof_ref[slot]) - y
        prof_ref[slot] = t_new

    def hook(j, epe, ene):
        _prof_add(j, sgn_half * jnp.sum(epe))
        _prof_add(g_pad + j, sgn_half * jnp.sum(ene))

    def walk(i, sgn):
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)

        def step(j, zs, carry):
            return _am_xva_step(j, [sgn * z for z in zs], carry, lt_at,
                                par_at, r, tables_at, m, node_hook=hook)

        zero = jnp.zeros(shape, jnp.float32)
        init = (_am_init_xs(par_at, m, shape), zero, zero, zero, zero)
        _, ac, ad, af, ab = walk_pairwise_multi(shape, m, n_grid, step, init)
        return (lgd * ac, olgd * ad, af, ab)

    def body(i, carry):
        tiles = walk(i, 1.0)
        if plan.antithetic:
            mt = walk(i, -1.0)
            tiles = tuple(0.5 * (a + b2) for a, b2 in zip(tiles, mt))
        return acc_add_n(carry, _xva_leg_sums(tiles), plan.kahan)

    def zero_prof(j, _):
        prof_ref[j] = 0.0
        comp_ref[j] = 0.0
        return 0

    jax.lax.fori_loop(0, two_g_pad, zero_prof, 0)
    carry = jax.lax.fori_loop(0, plan.iters, body,
                              acc_init_n(N_XVA_SUMS, jnp.float32,
                                         plan.kahan))
    vals = acc_final_n(carry, plan.kahan)
    for j in range(N_XVA_SUMS):
        out_ref[0, 0, j] = vals[j]

    def write_prof(j, _):
        prof_out_ref[0, 0, j] = prof_ref[j] + comp_ref[j]
        return 0

    jax.lax.fori_loop(0, two_g_pad, write_prof, 0)


def xva_pallas_partials(xspec, chol, seed, block_offset, plan: Plan,
                        n_blocks: int, interpret: bool = False):
    """Fused bilateral xVA partials on TPU (asset-major; the engine routes
    wider sets to the XLA twin)."""
    if not use_asset_major(xspec.netting.n_underlyings):
        raise NotImplementedError(
            "xva Pallas kernel is asset-major (m <= ASSET_MAJOR_MAX); the "
            "engine routes wider netting sets to the XLA twin")
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        sp = xspec.netting.astype(jnp.float32)
        m, g = sp.n_underlyings, sp.n_grid
        lt, params, _ = _am_ops(sp, chol, jnp.float32)
        wc, wd, wf, tau, sqtau, disc = xva_tables(xspec, jnp.float32)
        scal = jnp.stack([sp.r, sp.lgd,
                          jnp.asarray(xspec.own_lgd, jnp.float32)])
        seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
        off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))
        g_pad = _round_up(g, 8)
        kernel = functools.partial(_am_xva_kernel, plan=plan, n_grid=g, m=m)
        paths_iter = plan.rows * LANES * (2 if plan.antithetic else 1)
        out, prof = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 11,
            out_specs=(
                block_out_spec(N_XVA_SUMS),
                block_out_spec(2 * g_pad),
            ),
            out_shape=(
                block_out_shape(n_blocks, N_XVA_SUMS),
                block_out_shape(n_blocks, 2 * g_pad),
            ),
            scratch_shapes=[pltpu.SMEM((2 * g_pad,), jnp.float32),
                            pltpu.SMEM((2 * g_pad,), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=GRID_SEMANTICS,
            ),
            cost_estimate=pl.CostEstimate(
                flops=plan.iters * paths_iter * g * (m * (m + 1)
                                                     + 12 * m + 12),
                bytes_accessed=n_blocks * (N_XVA_SUMS + 2 * g) * 4,
                transcendentals=plan.iters * paths_iter * g
                * (3 * m + m // 2),
            ),
            interpret=interpret_arg(interpret),
        )(seed_arr, off_arr, scal, wc, wd, wf, tau, sqtau, disc, lt, params)
    prof = prof.reshape(n_blocks, 2 * g_pad)
    return (out.reshape(n_blocks, N_XVA_SUMS),
            jnp.stack([prof[:, :g], prof[:, g_pad:g_pad + g]], axis=1))


# ---------------------------------------------------------------------------
# Bilateral xVA Greeks: leg values + credit/funding/spot/vol sensitivities
# ---------------------------------------------------------------------------
# One fused sweep carries the four leg accumulators of the xVA pricer PLUS
# the three hedge-facing scalar sensitivities (per-leg derivatives wrt their
# own driver: dCVA/dlam_c, dDVA/dlam_b, dFVA/dspread — deterministic
# derivative tables, math.xva_leg_weight_derivs, on the SAME epe/ene
# integrands) and per-underlying pathwise delta/vega of the TOTAL adjustment
# XVA = CVA - DVA + FCA - FBA.  The exposure side the path sits on selects
# the node weight: d epe_j/dtheta = 1{V_j>0} dV_j/dtheta and
# d ene_j/dtheta = -1{V_j<0} dV_j/dtheta, so the total-xVA tangent weight
# collapses to (wc'+wf) on the positive side and (wd'+wf) on the negative
# (wc' = lgd_c w_cva, wd' = lgd_b w_dva) — one select per node, shared by
# every underlying's delta and vega integrand.  dV_j/ds0_i and dV_j/dv_i
# reuse the _am_quants node factors exactly as _am_greek_step does.
# Beyond the reference (unilateral CVA pricer only, cvaOpt.cu).

# (sum, sum^2) of: cva, dva, fca, fba legs, dCVA/dlam_c, dDVA/dlam_b,
# dFVA/dspread path values
N_XVA_GREEK_SCALARS = 14


def xva_greek_tables(xspec, dtype):
    """Per-node tables for the xVA Greek sweep: ``(wc', wd', wf, dwc',
    dwd', dwf, tau, sqtau, disc)`` with the LGD factors folded into the
    CVA/DVA tables (``wc' = lgd w_cva`` etc.) so the kernel needs no
    end-of-walk scaling."""
    sp = xspec.netting
    g = sp.n_grid
    lgd = jnp.asarray(sp.lgd, dtype)
    olgd = jnp.asarray(xspec.own_lgd, dtype)
    w_cva, w_dva = mcmath.xva_leg_weights(sp.intensity, xspec.own_intensity,
                                          sp.t, g, dtype=dtype)
    w_fnd = mcmath.funding_leg_weights(sp.intensity, xspec.own_intensity,
                                       xspec.funding_spread, sp.t, g,
                                       dtype=dtype)
    dwc, dwd, dwf = mcmath.xva_leg_weight_derivs(
        sp.intensity, xspec.own_intensity, sp.t, g, dtype=dtype)
    j = jnp.arange(1, g + 1, dtype=dtype)
    tau = jnp.asarray(sp.t, dtype) * (g - j) / g
    sqtau = jnp.sqrt(tau)
    disc = jnp.exp(-jnp.asarray(sp.r, dtype) * tau)
    return (lgd * w_cva, olgd * w_dva, w_fnd, lgd * dwc, olgd * dwd, dwf,
            tau, sqtau, disc)


def _am_xva_greek_step(j, zs, carry, lt_at, par_at, r, sqdt, tables_at,
                       m: int):
    """One xVA Greek grid step.  ``carry = (xs, dxvs, legs(4), sens(3),
    acc_d(m), acc_v(m))``; leg updates match :func:`_am_xva_step` (with
    the LGD scaling pre-folded into the tables), tangent updates match
    :func:`_am_greek_step` with the side-selected total-xVA weight."""
    (wc_at, wd_at, wf_at, dwc_at, dwd_at, dwf_at, tau_at, sqtau_at,
     disc_at) = tables_at
    xs, dxvs, legs, sens, acc_d, acc_v = carry
    ac, ad, af, ab = legs
    scr, sdr, sfr = sens
    sqtau_j = sqtau_at(j)
    xs, bts, ss, vals, nd1_effs, phis = _am_quants(
        zs, xs, lt_at, par_at, r, tau_at(j), sqtau_j, disc_at(j), m)
    dxvs = tuple(dxvs[i] + sqdt * bts[i] - par_at(3, i) for i in range(m))
    epe, net = _am_net(vals)
    ene = epe - net
    ind = jnp.where(net > 0.0, 1.0, 0.0)
    wc_j, wd_j, wf_j = wc_at(j), wd_at(j), wf_at(j)
    # Total-xVA node weight on dV_j/dtheta (side-selected; see section
    # comment): XVA = CVA - DVA + FCA - FBA.
    tw = (wc_j + wf_j) * ind + (wd_j + wf_j) * (1.0 - ind)
    new_d, new_v = [], []
    for i in range(m):
        ws = par_at(4, i) * ss[i]
        dval = ws * nd1_effs[i]
        vval = dval * dxvs[i] + ws * phis[i] * sqtau_j
        new_d.append(acc_d[i] + tw * dval)
        new_v.append(acc_v[i] + tw * vval)
    return (xs, dxvs,
            (ac + wc_j * epe, ad + wd_j * ene, af + wf_j * epe,
             ab + wf_j * ene),
            (scr + dwc_at(j) * epe, sdr + dwd_at(j) * ene,
             sfr + dwf_at(j) * (epe - ene)),
            tuple(new_d), tuple(new_v))


def _am_xva_greek_init(par_at, m: int, shape, dtype=jnp.float32):
    zero = lambda: jnp.zeros(shape, dtype)
    zeros_m = lambda: tuple(zero() for _ in range(m))
    return (_am_init_xs(par_at, m, shape, dtype), zeros_m(),
            (zero(), zero(), zero(), zero()), (zero(), zero(), zero()),
            zeros_m(), zeros_m())


def _xva_greek_sums(tiles, m: int):
    """Per-iteration scalar sums: 14 leg/sens pairs then the lane-row
    groups ``[d_0.., d^2_0.., v_0.., v^2_0..]``."""
    legs, sens, dvals, vvals = tiles
    vals = []
    for t in (*legs, *sens):
        vals.append(jnp.sum(t))
        vals.append(jnp.sum(t * t))
    for grp in (dvals, [d * d for d in dvals],
                vvals, [v * v for v in vvals]):
        vals.extend(jnp.sum(g) for g in grp)
    return tuple(vals)


def _xva_avg_tiles(ta, tb):
    out = []
    for x, y in zip(ta, tb):
        if isinstance(x, tuple) and not hasattr(x, "shape"):
            out.append(tuple(0.5 * (xi + yi) for xi, yi in zip(x, y)))
        else:
            out.append(0.5 * (x + y))
    return tuple(out)


def xva_greek_xla_partials(xspec, chol, key, block_offset, plan: Plan,
                           n_blocks: int):
    """XLA twin: ``((n_blocks, 14), (n_blocks, 4, LANES))`` — asset-major
    at any underlying count."""
    dtype = plan.jdtype
    sp = xspec.netting.astype(dtype)
    m, g = sp.n_underlyings, sp.n_grid
    lt, params, sqdt = _am_ops(sp, chol, dtype)
    tabs = xva_greek_tables(xspec, dtype)
    lt_at = lambda i, j: lt[i, j]
    par_at = lambda r_, i: params[r_, i]
    tables_at = tuple((lambda j, a=a: a[j]) for a in tabs)
    shape = (plan.rows, LANES)
    r = jnp.asarray(sp.r, dtype)
    n_sums = N_XVA_GREEK_SCALARS + 4 * m

    def one_walk(z_seq, sgn):
        def body(j, carry):
            zs = [sgn * z_seq[j, i] for i in range(m)]
            return _am_xva_greek_step(j, zs, carry, lt_at, par_at, r,
                                      sqdt, tables_at, m)

        carry = jax.lax.fori_loop(
            0, g, body, _am_xva_greek_init(par_at, m, shape, dtype))
        _, _, legs, sens, acc_d, acc_v = carry
        return (legs, sens, list(acc_d), list(acc_v))

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (g, m) + shape, dtype)
            tiles = one_walk(z_seq, jnp.asarray(1.0, dtype))
            if plan.antithetic:
                tiles = _xva_avg_tiles(
                    tiles, one_walk(z_seq, jnp.asarray(-1.0, dtype)))
            return acc_add_n(carry, _xva_greek_sums(tiles, m), plan.kahan)

        carry = jax.lax.fori_loop(0, plan.iters, body,
                                  acc_init_n(n_sums, dtype, plan.kahan))
        vals = acc_final_n(carry, plan.kahan)
        return (jnp.stack(vals[:N_XVA_GREEK_SCALARS]),
                am_lane_rows(vals, N_XVA_GREEK_SCALARS, m, 4)
                .astype(dtype))

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


def _am_xva_greeks_kernel(seed_ref, off_ref, scal_ref, wc_ref, wd_ref,
                          wf_ref, dwc_ref, dwd_ref, dwf_ref, tau_ref,
                          sqtau_ref, disc_ref, lt_ref, par_ref, out_ref,
                          vec_ref, *, plan: Plan, n_grid: int, m: int):
    r, sqdt = scal_ref[0], scal_ref[1]
    lt_at = lambda ii, jj: lt_ref[ii, jj]
    par_at = lambda rr, ii: par_ref[rr, ii]
    tables_at = (lambda j: wc_ref[j], lambda j: wd_ref[j],
                 lambda j: wf_ref[j], lambda j: dwc_ref[j],
                 lambda j: dwd_ref[j], lambda j: dwf_ref[j],
                 lambda j: tau_ref[j], lambda j: sqtau_ref[j],
                 lambda j: disc_ref[j])
    shape = (plan.rows, LANES)
    n_sums = N_XVA_GREEK_SCALARS + 4 * m
    b = pl.program_id(0)

    def one_walk(i, sgn):
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)

        def step(j, zs, carry):
            return _am_xva_greek_step(j, [sgn * z for z in zs], carry,
                                      lt_at, par_at, r, sqdt, tables_at, m)

        carry = walk_pairwise_multi(shape, m, n_grid, step,
                                    _am_xva_greek_init(par_at, m, shape))
        _, _, legs, sens, acc_d, acc_v = carry
        return (legs, sens, list(acc_d), list(acc_v))

    def body(i, carry):
        tiles = one_walk(i, 1.0)
        if plan.antithetic:
            tiles = _xva_avg_tiles(tiles, one_walk(i, -1.0))
        return acc_add_n(carry, _xva_greek_sums(tiles, m), plan.kahan)

    carry = jax.lax.fori_loop(0, plan.iters, body,
                              acc_init_n(n_sums, jnp.float32, plan.kahan))
    vals = acc_final_n(carry, plan.kahan)
    for j in range(N_XVA_GREEK_SCALARS):
        out_ref[0, 0, j] = vals[j]
    vec_ref[0] = am_lane_rows(vals, N_XVA_GREEK_SCALARS, m, 4)


def xva_greek_pallas_partials(xspec, chol, seed, block_offset, plan: Plan,
                              n_blocks: int, interpret: bool = False):
    """Fused asset-major bilateral xVA Greek partials on TPU."""
    if not use_asset_major(xspec.netting.n_underlyings):
        raise NotImplementedError(
            "xva Greek Pallas kernel is asset-major (m <= ASSET_MAJOR_MAX);"
            " the engine routes wider netting sets to the XLA twin")
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        sp = xspec.netting.astype(jnp.float32)
        m, g = sp.n_underlyings, sp.n_grid
        lt, params, sqdt = _am_ops(sp, chol, jnp.float32)
        tabs = xva_greek_tables(xspec, jnp.float32)
        scal = jnp.stack([sp.r, sqdt])
        seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
        off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))
        kernel = functools.partial(_am_xva_greeks_kernel, plan=plan,
                                   n_grid=g, m=m)
        paths_iter = plan.rows * LANES * (2 if plan.antithetic else 1)
        out, vecs = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 14,
            out_specs=(
                block_out_spec(N_XVA_GREEK_SCALARS),
                pl.BlockSpec((1, 4, LANES), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                block_out_shape(n_blocks, N_XVA_GREEK_SCALARS),
                jax.ShapeDtypeStruct((n_blocks, 4, LANES), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=GRID_SEMANTICS,
            ),
            cost_estimate=pl.CostEstimate(
                flops=plan.iters * paths_iter * g * (m * (m + 1)
                                                     + 24 * m + 22),
                bytes_accessed=n_blocks * (N_XVA_GREEK_SCALARS
                                           + 4 * LANES) * 4,
                transcendentals=plan.iters * paths_iter * g
                * (3 * m + m // 2),
            ),
            interpret=interpret_arg(interpret),
        )(seed_arr, off_arr, scal, *tabs, lt, params)
    return out.reshape(n_blocks, N_XVA_GREEK_SCALARS), vecs
