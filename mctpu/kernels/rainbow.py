"""Fused rainbow-option kernel: calls on the MAX/MIN of correlated assets.

Terminal sampling with the basket kernel's lane packing (``c = 128/a_tile``
paths per row, block-diagonal Cholesky matmul); the per-path extreme across
each ``a_tile`` lane span is a log2(a_tile) butterfly of ``jnp.roll`` maxima
on the VPU — after ``shift = 1, 2, ..., a_tile/2`` rounds, the lane at each
segment HEAD holds the extreme of exactly its own span (interior lanes see
cross-segment contamination and are masked out of the reduction).

Padding is extreme-neutral: padded spots are 0 for ``max`` and +inf for
``min``.  Oracle: the Stulz (1982) two-asset closed form
(:func:`mctpu.math.rainbow_max_call` / ``rainbow_min_call``) plus the exact
``k = 0`` martingale identity ``price_max + price_min = S1 + S2``.
"""
from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mctpu import rng as mcrng
from mctpu.kernels.basket import (MATMUL_PRECISION, pack_factor,
                                  use_asset_major)
from mctpu.kernels.common import (block_out_shape, block_out_spec,
                                  GRID_SEMANTICS, LANES, Plan, acc_add_n,
                                  acc_final_n, acc_init_n, chunk_sums,
                                  draw_normal_pair, interpret_arg,
                                  prng_emulation, seed_prng, walk_steps)
from mctpu.kernels.vanilla import _accum_add, _accum_final, _accum_init

__all__ = ["make_plan", "xla_partials", "pallas_partials", "pack_rainbow",
           "greek_xla_partials", "greek_pallas_partials", "n_greek_sums"]


def make_plan(n_paths: int, num_blocks: int, rows: int, antithetic: bool,
              dtype: str = "float32", kahan: bool = True,
              n_assets: int = 2) -> Plan:
    if use_asset_major(n_assets):
        units = 2 * rows * LANES  # asset-major: every lane a path
    else:
        _, c, _ = pack_factor(n_assets)
        units = 2 * rows * c  # two normal tiles per iteration
    paths = units * (2 if antithetic else 1)
    return Plan.plan(n_paths, num_blocks, rows, paths, units, antithetic,
                     dtype, kahan)


def rainbow_am_ops(opt, chol, dtype):
    """Asset-major operands: (a, a) Cholesky + per-asset param rows.

    ``params`` rows: drift_i, vol_i, s0_i.  No padding exists — every lane
    is a real path, and the extreme is an elementwise min/max across the
    ``a`` per-asset tiles (the packed layout's lane-butterfly ``jnp.roll``
    rounds and pad-neutralization disappear entirely).
    """
    a = opt.n_assets
    drift = (jnp.asarray(opt.r, dtype)
             - 0.5 * jnp.asarray(opt.v, dtype) ** 2) * jnp.asarray(
                 opt.t, dtype)
    vol = jnp.asarray(opt.v, dtype) * jnp.sqrt(jnp.asarray(opt.t, dtype))
    params = jnp.stack([jnp.broadcast_to(drift, (a,)),
                        jnp.broadcast_to(vol, (a,)),
                        jnp.broadcast_to(jnp.asarray(opt.s, dtype), (a,))])
    return jnp.asarray(chol, dtype), params


def _am_payoff(zs, lt_at, par_at, k, a: int, use_min: bool,
               antithetic: bool):
    """Rainbow payoff of one path tile from ``a`` asset normal tiles."""
    op = jnp.minimum if use_min else jnp.maximum

    def pay(sgn):
        ext = None
        for i in range(a):
            bt = None
            for j in range(i + 1):
                x = lt_at(i, j) * zs[j]
                bt = x if bt is None else bt + x
            s_i = par_at(2, i) * jnp.exp(par_at(0, i)
                                         + par_at(1, i) * (sgn * bt))
            ext = s_i if ext is None else op(ext, s_i)
        return jnp.maximum(ext - k, 0.0)

    if antithetic:
        return 0.5 * (pay(1.0) + pay(-1.0))
    return pay(1.0)


def pack_rainbow(opt, chol, dtype, lanes: int = LANES):
    """Packed operands; padded lanes are extreme-neutral (0 / +inf)."""
    a = opt.n_assets
    a_tile, c, width = pack_factor(a, lanes)
    use_min = opt.kind == "min"
    pad_spot = np.inf if use_min else 0.0

    def tile_row(x, fill):
        row = jnp.full((a_tile,), fill, dtype).at[:a].set(
            jnp.asarray(x, dtype))
        return jnp.tile(row, c).reshape(1, width)

    v_row = tile_row(opt.v, 1.0)
    t = jnp.asarray(opt.t, dtype)
    r = jnp.asarray(opt.r, dtype)
    drift = (r - 0.5 * v_row * v_row) * t
    # Padded drift 0 keeps exp() finite; the spot fill does the neutralizing.
    drift = jnp.where(jnp.isfinite(tile_row(opt.s, pad_spot))
                      & (tile_row(opt.s, 0.0) > 0), drift, 0.0)

    block = jnp.zeros((a_tile, a_tile), dtype).at[:a, :a].set(
        jnp.asarray(chol, dtype).T)
    chol_bd = jnp.zeros((width, width), dtype)
    for p in range(c):
        chol_bd = jax.lax.dynamic_update_slice(chol_bd, block,
                                               (p * a_tile, p * a_tile))
    head = jnp.zeros((width,), dtype)
    head = head.at[jnp.arange(c) * a_tile].set(1.0).reshape(1, width)
    return {
        "s0": tile_row(opt.s, pad_spot),
        "drift": drift,
        "vol": v_row * jnp.sqrt(t),
        "chol_bd": chol_bd,
        "head": head,
        "a_tile": a_tile,
        "c": c,
    }


def _segment_extreme(x, a_tile: int, use_min: bool):
    """Lane-butterfly extreme: head lanes end with their span's extreme."""
    op = jnp.minimum if use_min else jnp.maximum
    m = x
    shift = 1
    while shift < a_tile:
        m = op(m, jnp.roll(m, -shift, axis=-1))
        shift *= 2
    return m


def _payoff_tile(ops, k, z, antithetic: bool, use_min: bool, mxu: bool):
    """Rainbow payoffs at head lanes of one (rows, width) tile."""
    a_tile = ops["a_tile"]

    def pay(zz):
        bt = jnp.dot(zz, ops["chol_bd"], precision=MATMUL_PRECISION,
                     preferred_element_type=jnp.float32)
        s_t = ops["s0"] * jnp.exp(ops["drift"] + ops["vol"] * bt)
        if mxu:
            ext = _segment_extreme(s_t, a_tile, use_min)
            # where, not multiply: interior lanes can hold inf (min-kind
            # pad / cross-segment contamination) and inf * 0 would be NaN.
            return jnp.where(ops["head"] > 0,
                             jnp.maximum(ext - k, 0.0), 0.0)
        # XLA twin: deterministic reshape extreme over (rows, c, a_tile);
        # payoffs come out at shape (rows, c) directly.
        seg = s_t.reshape(s_t.shape[0], ops["c"], a_tile)
        red = seg.min(axis=-1) if use_min else seg.max(axis=-1)
        return jnp.maximum(red - k, 0.0)

    if antithetic:
        return 0.5 * (pay(z) + pay(-z))
    return pay(z)


# ---------------------------------------------------------------------------
# XLA backend
# ---------------------------------------------------------------------------

def xla_partials(opt, chol, key: jax.Array, block_offset, plan: Plan,
                 n_blocks: int):
    """Per-block partial sums, shape ``(n_blocks, 2)``."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    a = opt.n_assets
    use_min = opt.kind == "min"
    if use_asset_major(a):
        lt, params = rainbow_am_ops(o, chol, dtype)
        shape = (plan.rows, LANES)

        def block_fn(bkey):
            def body(i, carry):
                zk = jax.random.fold_in(bkey, i)
                z = jax.random.normal(zk, (2, a) + shape, dtype)
                lt_at = lambda ii, jj: lt[ii, jj]
                par_at = lambda rr, ii: params[rr, ii]
                p1 = _am_payoff([z[0, t] for t in range(a)], lt_at, par_at,
                                o.k, a, use_min, plan.antithetic)
                p2 = _am_payoff([z[1, t] for t in range(a)], lt_at, par_at,
                                o.k, a, use_min, plan.antithetic)
                cs = jnp.sum(p1) + jnp.sum(p2)
                cs2 = jnp.sum(p1 * p1) + jnp.sum(p2 * p2)
                return _accum_add(carry, cs, cs2, plan.kahan)

            carry = jax.lax.fori_loop(0, plan.iters, body,
                                      _accum_init(dtype, plan.kahan))
            s, s2 = _accum_final(carry, plan.kahan)
            return jnp.stack([s, s2])

        keys = mcrng.block_keys(key, block_offset, n_blocks)
        return jax.vmap(block_fn)(keys)

    ops = pack_rainbow(o, chol, dtype)
    width = ops["chol_bd"].shape[0]

    def block_fn(bkey):
        def body(i, carry):
            zk = jax.random.fold_in(bkey, i)
            z = jax.random.normal(zk, (2 * plan.rows, width), dtype)
            p = _payoff_tile(ops, o.k, z, plan.antithetic, use_min,
                             mxu=False)
            cs, cs2 = chunk_sums(p)
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

def _rainbow_kernel(seed_ref, off_ref, scal_ref, s0_ref, drift_ref, vol_ref,
                    lt_ref, head_ref, out_ref, *, plan: Plan, a_tile: int,
                    c: int, use_min: bool):
    seed_prng(seed_ref[0], off_ref[0] + pl.program_id(0))
    k = scal_ref[0]
    ops = {
        "s0": s0_ref[:], "drift": drift_ref[:], "vol": vol_ref[:],
        "chol_bd": lt_ref[:], "head": head_ref[:],
        "a_tile": a_tile, "c": c,
    }
    width = lt_ref.shape[0]

    def body(i, carry):
        z1, z2 = draw_normal_pair((plan.rows, width), i)
        p1 = _payoff_tile(ops, k, z1, plan.antithetic, use_min, mxu=True)
        p2 = _payoff_tile(ops, k, z2, plan.antithetic, use_min, mxu=True)
        cs = jnp.sum(p1) + jnp.sum(p2)
        cs2 = jnp.sum(p1 * p1) + jnp.sum(p2 * p2)
        return _accum_add(carry, cs, cs2, plan.kahan)

    carry = jax.lax.fori_loop(0, plan.iters, body,
                              _accum_init(jnp.float32, plan.kahan))
    s, s2 = _accum_final(carry, plan.kahan)
    out_ref[0, 0, 0] = s
    out_ref[0, 0, 1] = s2


def pallas_partials(opt, chol, seed, block_offset, plan: Plan,
                    n_blocks: int, interpret: bool = False):
    """Per-block partial sums, shape ``(n_blocks, 2)``, fused on TPU."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        return _pallas_partials(opt, chol, seed, block_offset, plan,
                                n_blocks, interpret)


def _rainbow_am_kernel(seed_ref, off_ref, scal_ref, lt_ref, par_ref,
                       out_ref, *, plan: Plan, a: int, use_min: bool):
    seed_prng(seed_ref[0], off_ref[0] + pl.program_id(0))
    k = scal_ref[0]
    lt_at = lambda ii, jj: lt_ref[ii, jj]
    par_at = lambda rr, ii: par_ref[rr, ii]
    shape = (plan.rows, LANES)

    def body(i, carry):
        za, zb = [], []
        for p in range(a):
            z1, z2 = draw_normal_pair(shape, i * a + p)
            za.append(z1)
            zb.append(z2)
        p1 = _am_payoff(za, lt_at, par_at, k, a, use_min, plan.antithetic)
        p2 = _am_payoff(zb, lt_at, par_at, k, a, use_min, plan.antithetic)
        cs = jnp.sum(p1) + jnp.sum(p2)
        cs2 = jnp.sum(p1 * p1) + jnp.sum(p2 * p2)
        return _accum_add(carry, cs, cs2, plan.kahan)

    carry = jax.lax.fori_loop(0, plan.iters, body,
                              _accum_init(jnp.float32, plan.kahan))
    s, s2 = _accum_final(carry, plan.kahan)
    out_ref[0, 0, 0] = s
    out_ref[0, 0, 1] = s2


def _pallas_partials(opt, chol, seed, block_offset, plan, n_blocks,
                     interpret):
    o = opt.astype(jnp.float32)
    a = opt.n_assets
    if use_asset_major(a):
        lt, params = rainbow_am_ops(o, chol, jnp.float32)
        kernel = functools.partial(_rainbow_am_kernel, plan=plan, a=a,
                                   use_min=opt.kind == "min")
        paths_iter = 2 * plan.rows * LANES
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 5,
            out_specs=block_out_spec(2),
            out_shape=block_out_shape(n_blocks, 2),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=GRID_SEMANTICS,
            ),
            cost_estimate=pl.CostEstimate(
                flops=plan.iters * paths_iter * (a * (a + 1) + 4 * a),
                bytes_accessed=n_blocks * 8,
                transcendentals=plan.iters * paths_iter * (3 * a // 2 + a),
            ),
            interpret=interpret_arg(interpret),
        )(jnp.atleast_1d(jnp.asarray(seed, jnp.int32)),
          jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32)),
          jnp.stack([jnp.asarray(o.k, jnp.float32)]), lt, params).reshape(n_blocks, 2)
    ops = pack_rainbow(o, chol, jnp.float32)
    width = ops["chol_bd"].shape[0]
    scal = jnp.stack([jnp.asarray(o.k, jnp.float32)])
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))

    kernel = functools.partial(_rainbow_kernel, plan=plan,
                               a_tile=ops["a_tile"], c=ops["c"],
                               use_min=opt.kind == "min")
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=block_out_spec(2),
        out_shape=block_out_shape(n_blocks, 2),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=GRID_SEMANTICS,
        ),
        cost_estimate=pl.CostEstimate(
            flops=plan.iters * 2 * plan.rows * (2 * width * width
                                                + 8 * width),
            bytes_accessed=n_blocks * 8 + width * width * 4,
            transcendentals=plan.iters * 2 * plan.rows * (2 * width + 2),
        ),
        interpret=interpret_arg(interpret),
    )(seed_arr, off_arr, scal, ops["s0"], ops["drift"], ops["vol"],
      ops["chol_bd"], ops["head"]).reshape(n_blocks, 2)


# ---------------------------------------------------------------------------
# Greeks: fused pathwise sensitivities of the rainbow extreme (asset-major)
# ---------------------------------------------------------------------------
#
# Pathwise identities for P = (ext - K)^+ with ext = op_i S_i (op = max or
# min) and S_i = s0_i exp((r - v_i^2/2) t + v_i sqrt(t) bt_i), bt = L z:
#
#   dP/ds0_i = I 1{argext = i} S_i / s0_i          (per-asset delta)
#   dP/dv_i  = I 1{argext = i} S_i sqrt(t)(bt_i - v_i sqrt(t))  (vega_i)
#   rho      = e^{-rt} E[t K I]       (dS_i/dr = t S_i collapses I*ext - P)
#   theta    = e^{-rt} E[I S_ext (drift_ext + vol_ext bt_ext / 2)/t - r P]
#
# The extreme's kink set (ties between assets, ext = K) has measure zero,
# so pathwise differentiation is unbiased (Glasserman §7.2) — the argext
# indicator is tracked by a running strict-compare select chain, exactly
# the arg-extreme device the lookback Greeks use along the TIME axis
# (kernels/lookback.py), here along the ASSET axis.  Gamma is intentionally
# absent: d(argext indicator) is a surface Dirac across BOTH the exercise
# and the asset-crossing boundaries, and no single Stein tilt direction is
# sign-definite for the crossing term — use CRN bump-and-revalue
# (mctpu.greeks.bump_and_revalue) for rainbow gamma.
#
# Per block the kernels emit ``6 + 4a`` partial sums: scalar
# (p, p2, rho, rho2, th, th2) then per-asset (gd_i, gd_i2, gv_i, gv_i2)
# pairs — same mesh / fixed-order-combine / estimator contract as the
# pricer, so the Greeks are bitwise shard-invariant too.


def n_greek_sums(a: int) -> int:
    """Flat partial-sum count of the rainbow Greeks kernels."""
    return 6 + 4 * a


def _greek_quants(zs, lt_at, par_at, k, a: int, sqt, t, r, use_min: bool,
                  antithetic: bool):
    """One asset-major path tile -> ``(p, [gd_i], [gv_i], ind, th)``.

    ``gd_i`` is the RAW argext-masked terminal spot (the caller applies
    ``1/s0_i`` to the sums); ``gv_i`` the per-asset vega integrand; ``th``
    the maturity derivative with its ``-r P`` discount term folded in.
    ``par`` rows: 0 drift ``(r - v_i^2/2) t``, 1 vol ``v_i sqrt(t)``,
    2 spot ``s0_i`` (same operands as :func:`rainbow_am_ops`).
    """
    def one(sgn):
        ss, bts = [], []
        for i in range(a):
            bt = None
            for j in range(i + 1):
                x = lt_at(i, j) * zs[j]
                bt = x if bt is None else bt + x
            btd = sgn * bt
            s_i = par_at(2, i) * jnp.exp(par_at(0, i)
                                         + par_at(1, i) * btd)
            ss.append(s_i)
            bts.append(btd)
        # Running strict-compare argext: first extreme wins exact ties
        # (a measure-zero event for distinct assets).
        ext = ss[0]
        idx = jnp.zeros_like(ext)
        for i in range(1, a):
            better = ss[i] < ext if use_min else ss[i] > ext
            ext = jnp.where(better, ss[i], ext)
            idx = jnp.where(better, jnp.float32(i), idx)
        ind = jnp.where(ext > k, 1.0, 0.0)
        p = jnp.maximum(ext - k, 0.0)
        gds, gvs = [], []
        th = None
        for i in range(a):
            gd = jnp.where(idx == i, ind * ss[i], 0.0)
            gds.append(gd)
            gvs.append(gd * sqt * (bts[i] - par_at(1, i)))
            x = gd * (par_at(0, i) + 0.5 * par_at(1, i) * bts[i])
            th = x if th is None else th + x
        th = th * (1.0 / t) - r * p
        return p, gds, gvs, ind, th

    if antithetic:
        pa, pb = one(1.0), one(-1.0)
        return (0.5 * (pa[0] + pb[0]),
                [0.5 * (x + y) for x, y in zip(pa[1], pb[1])],
                [0.5 * (x + y) for x, y in zip(pa[2], pb[2])],
                0.5 * (pa[3] + pb[3]), 0.5 * (pa[4] + pb[4]))
    return one(1.0)


def _greek_sums(zs_a, zs_b, lt_at, par_at, inv_s0_at, k, a: int, sqt, t, r,
                use_min: bool, antithetic: bool):
    """Both path tiles of one iteration -> flat tuple of ``6 + 4a`` sums."""
    tk = t * k
    sums = None
    for zs in (zs_a, zs_b):
        p, gds, gvs, ind, th = _greek_quants(zs, lt_at, par_at, k, a, sqt,
                                             t, r, use_min, antithetic)
        ri = tk * ind
        row = [jnp.sum(p), jnp.sum(p * p), jnp.sum(ri), jnp.sum(ri * ri),
               jnp.sum(th), jnp.sum(th * th)]
        for i in range(a):
            inv = inv_s0_at(i)
            row += [inv * jnp.sum(gds[i]),
                    inv * inv * jnp.sum(gds[i] ** 2),
                    jnp.sum(gvs[i]), jnp.sum(gvs[i] ** 2)]
        sums = row if sums is None else [s + r2 for s, r2 in zip(sums, row)]
    return tuple(sums)


def greek_xla_partials(opt, chol, key: jax.Array, block_offset, plan: Plan,
                       n_blocks: int):
    """Per-block Greek partials ``(n_blocks, 6 + 4a)`` on the XLA twin.

    Asset-major only (``a <= ASSET_MAJOR_MAX``): every practical rainbow
    is a handful of assets; the packed-lane regime keeps its pricing
    kernel and falls back to autodiff for sensitivities.
    """
    dtype = plan.jdtype
    o = opt.astype(dtype)
    a = opt.n_assets
    use_min = opt.kind == "min"
    lt, params = rainbow_am_ops(o, chol, dtype)
    inv_s0 = 1.0 / jnp.broadcast_to(jnp.asarray(o.s, dtype), (a,))
    sqt = jnp.sqrt(jnp.asarray(o.t, dtype))
    shape = (plan.rows, LANES)
    n_sums = n_greek_sums(a)

    def block_fn(bkey):
        def body(i, carry):
            zk = jax.random.fold_in(bkey, i)
            z = jax.random.normal(zk, (2, a) + shape, dtype)
            sums = _greek_sums(
                [z[0, j] for j in range(a)], [z[1, j] for j in range(a)],
                lambda ii, jj: lt[ii, jj], lambda rr, ii: params[rr, ii],
                lambda ii: inv_s0[ii], o.k, a, sqt, o.t, o.r, use_min,
                plan.antithetic)
            return acc_add_n(carry, sums, plan.kahan)

        carry = jax.lax.fori_loop(0, plan.iters, body,
                                  acc_init_n(n_sums, dtype, plan.kahan))
        return jnp.stack(acc_final_n(carry, plan.kahan))

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


def _rainbow_greeks_kernel(seed_ref, off_ref, scal_ref, lt_ref, par_ref,
                           invs0_ref, out_ref, *, plan: Plan, a: int,
                           use_min: bool):
    seed_prng(seed_ref[0], off_ref[0] + pl.program_id(0))
    k, t, sqt, r = scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3]
    shape = (plan.rows, LANES)
    n_sums = n_greek_sums(a)

    def body(i, carry):
        za, zb = [], []
        for p in range(a):
            z1, z2 = draw_normal_pair(shape, i * a + p)
            za.append(z1)
            zb.append(z2)
        sums = _greek_sums(
            za, zb, lambda ii, jj: lt_ref[ii, jj],
            lambda rr, ii: par_ref[rr, ii], lambda ii: invs0_ref[ii], k, a,
            sqt, t, r, use_min, plan.antithetic)
        return acc_add_n(carry, sums, plan.kahan)

    # Per-path bodies pipeline across iterations when unrolled (the
    # round-5 composition microbench measured ~17% headroom at unroll 2;
    # bitwise-neutral, see common.walk_steps).
    carry = walk_steps(plan.iters, body,
                       acc_init_n(n_sums, jnp.float32, plan.kahan),
                       unroll=3)
    vals = acc_final_n(carry, plan.kahan)
    for j in range(n_sums):
        out_ref[0, 0, j] = vals[j]


def greek_pallas_partials(opt, chol, seed, block_offset, plan: Plan,
                          n_blocks: int, interpret: bool = False):
    """Fused rainbow Greek partials ``(n_blocks, 6 + 4a)`` on TPU.

    Same asset-major tile layout and PRNG stream schedule as the pricing
    kernel (:func:`_rainbow_am_kernel`), so CRN bump comparisons against
    :func:`mctpu.engine.price_rainbow` are exact.
    """
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        o = opt.astype(jnp.float32)
        a = opt.n_assets
        lt, params = rainbow_am_ops(o, chol, jnp.float32)
        inv_s0 = 1.0 / jnp.broadcast_to(jnp.asarray(o.s, jnp.float32), (a,))
        t = jnp.asarray(o.t, jnp.float32)
        scal = jnp.stack([o.k, t, jnp.sqrt(t), o.r])
        seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
        off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))
        kernel = functools.partial(_rainbow_greeks_kernel, plan=plan, a=a,
                                   use_min=opt.kind == "min")
        paths_iter = 2 * plan.rows * LANES
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 6,
            out_specs=block_out_spec(n_greek_sums(a)),
            out_shape=block_out_shape(n_blocks, n_greek_sums(a)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=GRID_SEMANTICS,
            ),
            cost_estimate=pl.CostEstimate(
                flops=plan.iters * paths_iter * (a * (a + 1) + 16 * a + 10),
                bytes_accessed=n_blocks * 4 * n_greek_sums(a),
                transcendentals=plan.iters * paths_iter * (3 * a // 2 + a),
            ),
            interpret=interpret_arg(interpret),
        )(seed_arr, off_arr, scal, lt, params, inv_s0).reshape(
            n_blocks, n_greek_sums(a))
