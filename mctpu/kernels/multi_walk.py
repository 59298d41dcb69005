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
from mctpu.kernels.basket import (MATMUL_PRECISION, pack_assets, pack_factor,
                                  use_asset_major)
from mctpu.kernels.common import (block_out_shape, block_out_spec,
                                  GRID_SEMANTICS, LANES, Plan, acc_add_n,
                                  acc_final_n, acc_init_n, am_lane_rows,
                                  chunk_sums, det_col_sums, interpret_arg,
                                  prng_emulation, seed_prng, walk_pairwise,
                                  walk_pairwise_multi)
from mctpu.kernels.vanilla import _accum_add, _accum_final, _accum_init

__all__ = ["make_plan", "xla_partials", "pallas_partials",
           "greek_xla_partials", "greek_pallas_partials",
           "bar_greek_xla_partials", "bar_greek_pallas_partials",
           "N_MW_GREEK_SCALARS"]


def make_plan(n_paths: int, num_blocks: int, rows: int, antithetic: bool,
              dtype: str = "float32", kahan: bool = True,
              n_assets: int = 3, asset_major: bool | None = None) -> Plan:
    """Launch geometry for a multi-asset walk.

    ``asset_major=None`` picks the regime the PRICING kernels use
    (asset-major for ``n_assets <= ASSET_MAJOR_MAX``).  The Greek kernels
    run the packed layout only — their callers pass
    ``asset_major=False`` so the plan's unit accounting matches the
    ``rows * c`` paths each packed iteration actually walks.
    """
    if asset_major is None:
        asset_major = use_asset_major(n_assets)
    if asset_major:
        # Asset-major walk (small baskets): every lane of the ``a``
        # carried (rows, 128) spot tiles is a path — per iteration one
        # full-lane path tile walks the whole grid.
        units = rows * LANES
    else:
        # Packed layout: one (rows, width) tile walks the whole grid per
        # iteration; each row packs c paths.
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
# Asset-major walk core (a <= ASSET_MAJOR_MAX)
# ---------------------------------------------------------------------------
# Small baskets skip the MXU (see kernels/basket.py:45): the packed walk
# pays TWO width x width HIGHEST-precision matmuls per step for ~97% zeros
# at a = 3, measured at ~3% of its VPU op ceiling.  Asset-major carries one
# (rows, 128) log-spot tile PER ASSET — every lane a path — and computes
# the correlation as a(a+1)/2 broadcast-scalar FMAs.  Draws pair across
# two successive steps (walk_pairwise_multi), so no Box-Muller branch is
# wasted at any asset count.

def _am_walk_ops(opt, chol, dtype, n_obs: int):
    """Per-asset per-step operand rows: ``params (5, a)`` = log_s0,
    drift*dt, vol*sqrt(dt), d/sqrt(n), w; ``lt (a, a)`` the Cholesky
    factor.  Same per-step semantics as :func:`_step_ops`."""
    a = opt.n_assets
    n = jnp.asarray(float(n_obs), dtype)
    v = jnp.asarray(opt.v, dtype)
    t = jnp.asarray(opt.t, dtype)
    r = jnp.asarray(opt.r, dtype)
    log_s0 = jnp.log(jnp.asarray(opt.s, dtype))
    drift = jnp.broadcast_to((r - 0.5 * v * v) * t / n, (a,))
    vol = jnp.broadcast_to(v * jnp.sqrt(t) / jnp.sqrt(n), (a,))
    d = jnp.broadcast_to(jnp.asarray(opt.d, dtype) / jnp.sqrt(n), (a,))
    w = jnp.broadcast_to(jnp.asarray(opt.w, dtype), (a,))
    params = jnp.stack([log_s0, drift, vol, d, w])
    return jnp.asarray(chol, dtype), params


def _am_core(zs, xs, lt_at, par_at, a: int):
    """One asset-major walk step shared by the pricing and Greek kernels
    (pricing ignores the extras; tracing DCE drops them), so the log-spot
    chain is bitwise identical across kernels — the shared-stream
    price == pricer contract.

    Returns ``(new_xs, basket, bts, ss)``: advanced log-spot tiles, the
    weighted basket tile, and the per-asset correlated-increment /
    terminal-spot tiles.
    """
    new_xs, bts, ss = [], [], []
    basket = None
    for i in range(a):
        bt = par_at(3, i)
        for j in range(i + 1):
            bt = bt + lt_at(i, j) * zs[j]
        x = xs[i] + par_at(1, i) + par_at(2, i) * bt
        s = jnp.exp(x)
        term = par_at(4, i) * s
        basket = term if basket is None else basket + term
        new_xs.append(x)
        bts.append(bt)
        ss.append(s)
    return tuple(new_xs), basket, bts, ss


def _am_init_xs(par_at, a: int, shape, dtype=jnp.float32):
    return tuple(jnp.zeros(shape, dtype) + par_at(0, i)
                 for i in range(a))


# Per-block vector-partial packing for the asset-major Greek kernels:
# shared by cva_multi.py, so it lives in kernels/common.py.
_am_lane_rows = am_lane_rows


# ---------------------------------------------------------------------------
# XLA backend
# ---------------------------------------------------------------------------

def xla_partials(opt, chol, key: jax.Array, block_offset, plan: Plan,
                 n_blocks: int, *, product: str, n_obs: int,
                 barrier=None, up: bool = True):
    """Per-block partial sums ``(n_blocks, 2)`` (either walk regime)."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    if use_asset_major(opt.n_assets):
        return _am_xla_partials(o, chol, key, block_offset, plan, n_blocks,
                                product=product, n_obs=n_obs,
                                barrier=barrier, up=up)
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


def _am_xla_partials(o, chol, key, block_offset, plan: Plan, n_blocks: int,
                     *, product: str, n_obs: int, barrier, up: bool):
    """Asset-major XLA twin of the walk pricing kernel."""
    dtype = plan.jdtype
    a = o.n_assets
    lt, params = _am_walk_ops(o, chol, dtype, n_obs)
    lt_at = lambda i, j: lt[i, j]
    par_at = lambda r, i: params[r, i]
    monitor, init_extra, payoff = _monitor_fns(
        product, n_obs, o.k,
        None if barrier is None else jnp.asarray(barrier, dtype), up)
    shape = (plan.rows, LANES)

    def walk(z_seq, sgn):
        def body(j, carry):
            xs, extra = carry
            zs = [sgn * z_seq[j, i] for i in range(a)]
            xs, basket, _, _ = _am_core(zs, xs, lt_at, par_at, a)
            return (xs, monitor(basket, extra))

        init = (_am_init_xs(par_at, a, shape, dtype),
                init_extra(shape, dtype))
        _, extra = jax.lax.fori_loop(0, n_obs, body, init)
        return payoff(extra)

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (n_obs, a) + shape, dtype)
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
    out_ref[0, 0, 0] = s
    out_ref[0, 0, 1] = s2


def pallas_partials(opt, chol, seed, block_offset, plan: Plan, n_blocks: int,
                    *, product: str, n_obs: int, barrier=None,
                    up: bool = True, interpret: bool = False):
    """Per-block partial sums ``(n_blocks, 2)``, fused on TPU."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        return _pallas_partials(opt, chol, seed, block_offset, plan,
                                n_blocks, product, n_obs, barrier, up,
                                interpret)


def _mw_am_kernel(seed_ref, off_ref, scal_ref, lt_ref, par_ref, out_ref, *,
                  plan: Plan, a: int, product: str, n_obs: int, up: bool):
    k, barrier = scal_ref[0], scal_ref[1]
    lt_at = lambda ii, jj: lt_ref[ii, jj]
    par_at = lambda rr, ii: par_ref[rr, ii]
    shape = (plan.rows, LANES)
    monitor, init_extra, payoff = _monitor_fns(product, n_obs, k, barrier, up)
    b = pl.program_id(0)

    def one_walk(i, sgn):
        # Re-seed per (block, iter): antithetic mirror replays the stream.
        seed_prng(seed_ref[0], (off_ref[0] + b) * jnp.int32(plan.iters) + i)

        def step(j, zs, carry):
            xs, extra = carry
            xs, basket, _, _ = _am_core([sgn * z for z in zs], xs, lt_at,
                                        par_at, a)
            return (xs, monitor(basket, extra))

        init = (_am_init_xs(par_at, a, shape), init_extra(shape, jnp.float32))
        _, extra = walk_pairwise_multi(shape, a, n_obs, step, init)
        return payoff(extra)

    def body(i, carry):
        pay = one_walk(i, 1.0)
        if plan.antithetic:
            pay = 0.5 * (pay + one_walk(i, -1.0))
        cs, cs2 = chunk_sums(pay)
        return _accum_add(carry, cs, cs2, plan.kahan)

    carry = jax.lax.fori_loop(0, plan.iters, body,
                              _accum_init(jnp.float32, plan.kahan))
    s, s2 = _accum_final(carry, plan.kahan)
    out_ref[0, 0, 0] = s
    out_ref[0, 0, 1] = s2


def _pallas_partials(opt, chol, seed, block_offset, plan, n_blocks, product,
                     n_obs, barrier, up, interpret):
    o = opt.astype(jnp.float32)
    a = opt.n_assets
    if use_asset_major(a):
        lt, params = _am_walk_ops(o, chol, jnp.float32, n_obs)
        scal = jnp.stack([jnp.asarray(o.k, jnp.float32),
                          jnp.asarray(0.0 if barrier is None else barrier,
                                      jnp.float32)])
        seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
        off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))
        kernel = functools.partial(_mw_am_kernel, plan=plan, a=a,
                                   product=product, n_obs=n_obs, up=up)
        paths_iter = plan.rows * LANES * (2 if plan.antithetic else 1)
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
                flops=plan.iters * paths_iter * n_obs
                * (a * (a + 1) + 6 * a + 4),
                bytes_accessed=n_blocks * 8,
                transcendentals=plan.iters * paths_iter * n_obs
                * (a + a // 2 + 1),
            ),
            interpret=interpret_arg(interpret),
        )(seed_arr, off_arr, scal, lt, params).reshape(n_blocks, 2)
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
        out_specs=block_out_spec(2),
        out_shape=block_out_shape(n_blocks, 2),
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
      ops["d"], ops["chol_bd"], ops["wsel"]).reshape(n_blocks, 2)


# ---------------------------------------------------------------------------
# Greeks: basket-Asian pathwise sensitivities (per-asset delta/vega + rho)
# ---------------------------------------------------------------------------
#
# P = max(Abar - K, 0), Abar = (1/n) sum_j B_j, B_j = sum_m w_m S_m(t_j).
# Pathwise identities (average kink measure-zero, Glasserman 7.2):
#
#   delta_m = I w_m (1/n) sum_j S_m(t_j) / s0_m     (homogeneity per date)
#   vega_m  = I w_m (1/n) sum_j S_m(t_j) dxv_m(t_j),
#             dxv_m(t_j) = d log S_m(t_j)/dv_m = sqrt(dt) sum_{i<=j} bt_i
#                          - v_m t_j              (one carried FMA per step)
#   rho     = I (1/n) sum_j t_j B_j - t P          (dS/dr = t_j S; discount
#                                                   term folded in)
#
# The walk carries two extra lane tiles (running spot sum AS, running
# S*dxv sum AV) and one extra per-path tile (t_j-weighted basket sum);
# the per-path indicator expands onto lanes with the 0/1 selector matmul
# (same device as kernels/cva_multi.py / kernels/greeks.py).  Theta is
# documented-absent (the observation grid moves with maturity — same
# estimator-theory limit as the single-asset Asian); gamma likewise
# (Stein tilt through the compound average-of-basket map; use CRN bumps).
# Per block: 4 scalar sums (payoff, rho) + (4, width) lane rows.

N_MW_GREEK_SCALARS = 4  # (sum, sum^2) of: payoff, rho


def greek_step_ops(opt, chol, dtype, n_obs: int):
    """:func:`_step_ops` plus the Greek-walk operand rows."""
    ops = _step_ops(opt, chol, dtype, n_obs)
    a = opt.n_assets
    a_tile, c, width = pack_factor(a)
    dt = jnp.asarray(opt.t, dtype) / n_obs
    v_row = ops["vol"] / jnp.sqrt(dt)  # per-lane vols (vol = v sqrt(dt))
    s0 = pack_assets(opt, chol, dtype)["s0"]
    ops.update({
        "esel": _esel(a, dtype),
        "w_row": jnp.sum(ops["wsel"], axis=1).reshape(1, width),
        "inv_s0": jnp.where(s0 > 0, 1.0 / jnp.maximum(s0, 1e-30), 0.0),
        "vdt": v_row * dt,
        "sqdt": jnp.sqrt(dt),
        "tj": dt * jnp.arange(1, n_obs + 1, dtype=dtype),
    })
    return ops


def _greek_step_mw(j, z, carry, ops, mxu: bool):
    """One basket-Asian Greek walk step."""
    prec = MATMUL_PRECISION
    x, dxv, acc, tb, a_s, a_v = carry
    bt = jnp.dot(z, ops["chol_bd"], precision=prec,
                 preferred_element_type=jnp.float32) + ops["d"]
    x = x + ops["drift"] + ops["vol"] * bt
    dxv = dxv + ops["sqdt"] * bt - ops["vdt"]
    # Padded lanes carry exp(r t_j) here (drift r t, vol 0) — harmless:
    # wsel and w_row are 0 there, zeroing them out of basket, dval, vval.
    s = jnp.exp(x)
    if mxu:
        basket = jnp.dot(s, ops["wsel"], precision=prec,
                         preferred_element_type=jnp.float32)
    else:
        width = ops["chol_bd"].shape[0]
        c = ops["wsel"].shape[1]
        prod = s * ops["w_row"]
        basket = prod.reshape(prod.shape[0], c, width // c).sum(axis=-1)
    return (x, dxv, acc + basket, tb + ops["tj"][j] * basket, a_s + s,
            a_v + s * dxv)


def _greek_payoff_mw(carry, ops, k, t, inv_n, mxu: bool):
    """End-of-walk (payoff, rho, delta-lane, vega-lane) tiles."""
    prec = MATMUL_PRECISION
    _, _, acc, tb, a_s, a_v = carry
    abar = acc * inv_n
    p = jnp.maximum(abar - k, 0.0)
    ind = jnp.where(abar > k, 1.0, 0.0)
    gr = ind * (tb * inv_n) - t * p
    if mxu:
        ind_w = jnp.dot(ind, ops["esel"], precision=prec,
                        preferred_element_type=jnp.float32)
    else:
        width = ops["chol_bd"].shape[0]
        c = ops["wsel"].shape[1]
        ind_w = jnp.repeat(ind, width // c, axis=1)
    wiv = ind_w * ops["w_row"] * inv_n
    dval = wiv * a_s * ops["inv_s0"]
    vval = wiv * a_v
    return p, gr, dval, vval


def _greek_walk_init_mw(ops, shape, shape_c):
    zero_w = jnp.zeros(shape, jnp.float32)
    zero_c = jnp.zeros(shape_c, jnp.float32)
    return (jnp.broadcast_to(ops["log_s0"], shape), zero_w, zero_c,
            zero_c, zero_w, zero_w)


def greek_xla_partials(opt, chol, key: jax.Array, block_offset, plan: Plan,
                       n_blocks: int, *, n_obs: int):
    """Per-block basket-Asian Greek partials:
    ``((n_blocks, 4), (n_blocks, 4, width))`` (``width = LANES`` in the
    asset-major regime)."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    if use_asset_major(o.n_assets):
        return _am_greek_xla_partials(o, chol, key, block_offset, plan,
                                      n_blocks, n_obs=n_obs)
    ops = greek_step_ops(o, chol, dtype, n_obs)
    width = ops["chol_bd"].shape[0]
    c = ops["wsel"].shape[1]
    shape = (plan.rows, width)
    shape_c = (plan.rows, c)
    inv_n = 1.0 / jnp.asarray(float(n_obs), dtype)
    t = jnp.asarray(o.t, dtype)

    def one_walk(z_seq, sgn):
        def body(j, carry):
            return _greek_step_mw(j, sgn * z_seq[j], carry, ops, mxu=False)

        carry = jax.lax.fori_loop(0, n_obs, body,
                                  _greek_walk_init_mw(ops, shape, shape_c))
        return _greek_payoff_mw(carry, ops, o.k, t, inv_n, mxu=False)

    def block_fn(bkey):
        def body(i, carry):
            acc, vecs = carry
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (n_obs,) + shape, dtype)
            tiles = one_walk(z_seq, jnp.asarray(1.0, dtype))
            if plan.antithetic:
                mt = one_walk(z_seq, jnp.asarray(-1.0, dtype))
                tiles = tuple(0.5 * (a + b) for a, b in zip(tiles, mt))
            p, gr, dval, vval = tiles
            acc = acc_add_n(acc, (jnp.sum(p), jnp.sum(p * p),
                                  jnp.sum(gr), jnp.sum(gr * gr)),
                            plan.kahan)
            vecs = vecs + jnp.stack([
                det_col_sums(dval), det_col_sums(dval * dval),
                det_col_sums(vval), det_col_sums(vval * vval)])
            return acc, vecs

        acc, vecs = jax.lax.fori_loop(
            0, plan.iters, body,
            (acc_init_n(N_MW_GREEK_SCALARS, dtype, plan.kahan),
             jnp.zeros((4, width), dtype)))
        return jnp.stack(acc_final_n(acc, plan.kahan)), vecs

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


def _mw_greeks_kernel(seed_ref, off_ref, scal_ref, tj_ref, s0_ref,
                      drift_ref, vol_ref, d_ref, lt_ref, wsel_ref,
                      esel_ref, wrow_ref, invs0_ref, vdt_ref, out_ref,
                      vec_ref, *, plan: Plan, n_obs: int):
    k, t, inv_n, sqdt = (scal_ref[0], scal_ref[1], scal_ref[2],
                         scal_ref[3])
    ops = {
        "log_s0": s0_ref[:], "drift": drift_ref[:], "vol": vol_ref[:],
        "d": d_ref[:], "chol_bd": lt_ref[:], "wsel": wsel_ref[:],
        "esel": esel_ref[:], "w_row": wrow_ref[:],
        "inv_s0": invs0_ref[:], "vdt": vdt_ref[:], "sqdt": sqdt,
        "tj": tj_ref,
    }
    width = lt_ref.shape[0]
    c = wsel_ref.shape[1]
    shape = (plan.rows, width)
    shape_c = (plan.rows, c)
    b = pl.program_id(0)

    def one_walk(i, sgn):
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)
        carry = walk_pairwise(
            shape, n_obs,
            lambda j, z, cy: _greek_step_mw(j, sgn * z, cy, ops, True),
            _greek_walk_init_mw(ops, shape, shape_c))
        return _greek_payoff_mw(carry, ops, k, t, inv_n, mxu=True)

    def body(i, carry):
        acc, vecs = carry
        tiles = one_walk(i, 1.0)
        if plan.antithetic:
            mt = one_walk(i, -1.0)
            tiles = tuple(0.5 * (a + b2) for a, b2 in zip(tiles, mt))
        p, gr, dval, vval = tiles
        acc = acc_add_n(acc, (jnp.sum(p), jnp.sum(p * p),
                              jnp.sum(gr), jnp.sum(gr * gr)), plan.kahan)
        vecs = vecs + jnp.stack([
            det_col_sums(dval), det_col_sums(dval * dval),
            det_col_sums(vval), det_col_sums(vval * vval)])
        return acc, vecs

    acc, vecs = jax.lax.fori_loop(
        0, plan.iters, body,
        (acc_init_n(N_MW_GREEK_SCALARS, jnp.float32, plan.kahan),
         jnp.zeros((4, width), jnp.float32)))
    vals = acc_final_n(acc, plan.kahan)
    for j in range(N_MW_GREEK_SCALARS):
        out_ref[0, 0, j] = vals[j]
    vec_ref[0] = vecs


def greek_pallas_partials(opt, chol, seed, block_offset, plan: Plan,
                          n_blocks: int, *, n_obs: int,
                          interpret: bool = False):
    """Fused basket-Asian Greek partials on TPU."""
    if use_asset_major(opt.n_assets):
        return _am_greek_pallas_partials(opt, chol, seed, block_offset,
                                         plan, n_blocks, n_obs=n_obs,
                                         interpret=interpret)
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        o = opt.astype(jnp.float32)
        ops = greek_step_ops(o, chol, jnp.float32, n_obs)
        width = ops["chol_bd"].shape[0]
        c = ops["wsel"].shape[1]
        scal = jnp.stack([jnp.asarray(o.k, jnp.float32),
                          jnp.asarray(o.t, jnp.float32),
                          jnp.asarray(1.0 / n_obs, jnp.float32),
                          ops["sqdt"]])
        seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
        off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))
        kernel = functools.partial(_mw_greeks_kernel, plan=plan,
                                   n_obs=n_obs)
        paths_iter = plan.rows * c * (2 if plan.antithetic else 1)
        out, vecs = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
            out_specs=(
                block_out_spec(N_MW_GREEK_SCALARS),
                pl.BlockSpec((1, 4, width), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                block_out_shape(n_blocks, N_MW_GREEK_SCALARS),
                jax.ShapeDtypeStruct((n_blocks, 4, width), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=GRID_SEMANTICS,
            ),
            cost_estimate=pl.CostEstimate(
                flops=plan.iters * plan.rows * n_obs * (2 * width * width
                                                        + 14 * width),
                bytes_accessed=n_blocks * (4 + 4 * width) * 4,
                transcendentals=plan.iters * paths_iter * n_obs * 3,
            ),
            interpret=interpret_arg(interpret),
        )(seed_arr, off_arr, scal, ops["tj"], ops["log_s0"], ops["drift"],
          ops["vol"], ops["d"], ops["chol_bd"], ops["wsel"], ops["esel"],
          ops["w_row"], ops["inv_s0"], ops["vdt"])
    return out.reshape(n_blocks, N_MW_GREEK_SCALARS), vecs


# ---------------------------------------------------------------------------
# Greeks: basket-barrier LIKELIHOOD-RATIO sensitivities
# ---------------------------------------------------------------------------
#
# The knockout indicator is discontinuous in every parameter, so pathwise
# differentiation is biased (Glasserman 7.3) — the barrier Greeks use the
# likelihood-ratio method, which differentiates the path DENSITY instead.
# With per-step increments dx = drift + diag(v sqrt(dt)) L z (z iid std
# normal) the scores are exact:
#
#   delta_m:  shifting log s0_m by d equals shifting z_1 along
#             u_m = L^{-1} e_m by d/(v_m sqrt(dt)) (the step-1 shift
#             propagates to every later node exactly like an s0 shift), so
#               score_dm = q_{1,m} / (s0_m v_m sqrt(dt)),
#             q_{j} = z_j @ (L^{-1})^T the per-asset projections (ONE extra
#             block-diagonal MXU matmul per step).
#   vega_m:   transition-density score (single-asset limit reduces to
#             Glasserman's (z^2-1)/sigma - z sqrt(t)):
#               score_vm = sum_j q_{j,m} (bt_{j,m}/v_m - sqrt(dt)) - n/v_m.
#   rho:      drift shift dt per step per asset:
#               score_r = sum_j <z_j, L^{-1} (sqrt(dt)/v)>
#                       = fold((sum_j q_j) * sqrt(dt)/v)   (linear — folded
#             once at walk end), with the -t P discount term folded in.
#
# Estimators are P * score (P the knockout payoff), unbiased under the
# discontinuity; LR variance grows with n_obs (the standard trade-off —
# same as the single-asset kernels/barrier.py Greeks).  Theta and gamma
# are documented-absent (moving monitoring grid; Dirac^2) — use CRN bumps.
# Per block: 4 scalar sums (payoff, rho) + (4, width) lane rows
# (delta, vega), identical plumbing to the basket-Asian Greeks above.


def barrier_greek_ops(opt, chol, dtype, n_obs: int):
    """:func:`_step_ops` plus the LR-score operand rows.

    ``linv_bd`` is the block-diagonal L^{-1} so the ROW-vector product
    ``q = z @ linv_bd`` yields ``q_m = (z^T L^{-1})_m = <z, L^{-1} e_m>``
    (the pricing matmul uses L^T for the same reason: ``z @ L^T = L z``;
    the two orientations coincide only at a = 1); ``cd_row`` the delta
    score scale ``1/(s0 v sqrt(dt))``; ``sr_row`` the rho direction
    ``sqrt(dt)/v``; ``inv_v`` per-lane ``1/v``.
    """
    ops = _step_ops(opt, chol, dtype, n_obs)
    a = opt.n_assets
    a_tile, c, width = pack_factor(a)
    dt = jnp.asarray(opt.t, dtype) / n_obs
    sqdt = jnp.sqrt(dt)
    import jax.scipy.linalg as jsla
    linv = jsla.solve_triangular(jnp.asarray(chol, dtype), jnp.eye(a, dtype=dtype),
                                 lower=True)
    block = jnp.zeros((a_tile, a_tile), dtype).at[:a, :a].set(linv)
    linv_bd = jnp.zeros((width, width), dtype)
    for p in range(c):
        linv_bd = jax.lax.dynamic_update_slice(linv_bd, block,
                                               (p * a_tile, p * a_tile))
    s0 = pack_assets(opt, chol, dtype)["s0"]
    v_row = ops["vol"] / sqdt
    safe = (s0 > 0) & (v_row > 0)
    inv_v = jnp.where(safe, 1.0 / jnp.maximum(v_row, 1e-30), 0.0)
    esel = _esel(a, dtype)
    ops.update({
        "esel": esel,
        "eselT": esel.T.copy(),
        "w_row": jnp.sum(ops["wsel"], axis=1).reshape(1, -1),
        "linvT_bd": linv_bd,
        "cd_row": jnp.where(
            safe, 1.0 / jnp.maximum(s0 * v_row * sqdt, 1e-30), 0.0),
        "sr_row": sqdt * inv_v,
        "inv_v": inv_v,
        "sqdt": sqdt,
    })
    return ops


def _esel(a: int, dtype):
    a_tile, c, width = pack_factor(a)
    esel = jnp.zeros((c, width), dtype)
    ones = jnp.zeros((a_tile,), dtype).at[:a].set(1.0)
    for p in range(c):
        esel = jax.lax.dynamic_update_slice(esel, ones[None, :],
                                            (p, p * a_tile))
    return esel


def _bar_greek_step(j, z, carry, ops, barrier, up: bool, mxu: bool):
    """One LR-score barrier walk step."""
    prec = MATMUL_PRECISION
    x, qd, acc_q, acc_v, alive, last = carry
    bt = jnp.dot(z, ops["chol_bd"], precision=prec,
                 preferred_element_type=jnp.float32) + ops["d"]
    q = jnp.dot(z, ops["linvT_bd"], precision=prec,
                preferred_element_type=jnp.float32)
    x = x + ops["drift"] + ops["vol"] * bt
    qd = jnp.where(j == 0, q, qd)  # step-1 projection drives delta
    acc_q = acc_q + q
    acc_v = acc_v + q * (bt * ops["inv_v"] - ops["sqdt"])
    s = jnp.exp(x)
    if mxu:
        basket = jnp.dot(s, ops["wsel"], precision=prec,
                         preferred_element_type=jnp.float32)
    else:
        width = ops["chol_bd"].shape[0]
        c = ops["wsel"].shape[1]
        prod = s * ops["w_row"]
        basket = prod.reshape(prod.shape[0], c, width // c).sum(axis=-1)
    hit = (basket < barrier) if up else (basket > barrier)
    alive = alive * hit.astype(alive.dtype)
    return (x, qd, acc_q, acc_v, alive, basket)


def _bar_greek_payoff(carry, ops, k, t, n_obs: int, mxu: bool):
    """End-of-walk (payoff, rho, delta-lane, vega-lane) tiles."""
    prec = MATMUL_PRECISION
    _, qd, acc_q, acc_v, alive, last = carry
    p = alive * jnp.maximum(last - k, 0.0)
    if mxu:
        score_r = jnp.dot(acc_q * ops["sr_row"], ops["eselT"],
                          precision=prec,
                          preferred_element_type=jnp.float32)
        p_w = jnp.dot(p, ops["esel"], precision=prec,
                      preferred_element_type=jnp.float32)
    else:
        width = ops["chol_bd"].shape[0]
        c = ops["wsel"].shape[1]
        a_tile = width // c
        qs = acc_q * ops["sr_row"]
        score_r = qs.reshape(qs.shape[0], c, a_tile).sum(axis=-1)
        p_w = jnp.repeat(p, a_tile, axis=1)
    gr = p * score_r - t * p
    dval = p_w * qd * ops["cd_row"]
    vval = p_w * (acc_v - n_obs * ops["inv_v"])
    return p, gr, dval, vval


def _bar_greek_init(ops, shape, shape_c):
    zero_w = jnp.zeros(shape, jnp.float32)
    zero_c = jnp.zeros(shape_c, jnp.float32)
    return (jnp.broadcast_to(ops["log_s0"], shape), zero_w, zero_w,
            zero_w, jnp.ones(shape_c, jnp.float32), zero_c)


def bar_greek_xla_partials(opt, chol, key: jax.Array, block_offset,
                           plan: Plan, n_blocks: int, *, n_obs: int,
                           barrier, up: bool):
    """Per-block basket-barrier LR Greek partials:
    ``((n_blocks, 4), (n_blocks, 4, width))`` (``width = LANES`` in the
    asset-major regime)."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    if use_asset_major(o.n_assets):
        return _am_bar_greek_xla_partials(o, chol, key, block_offset, plan,
                                          n_blocks, n_obs=n_obs,
                                          barrier=barrier, up=up)
    ops = barrier_greek_ops(o, chol, dtype, n_obs)
    width = ops["chol_bd"].shape[0]
    c = ops["wsel"].shape[1]
    shape = (plan.rows, width)
    shape_c = (plan.rows, c)
    bar = jnp.asarray(barrier, dtype)
    t = jnp.asarray(o.t, dtype)

    def one_walk(z_seq, sgn):
        def body(j, carry):
            return _bar_greek_step(j, sgn * z_seq[j], carry, ops, bar, up,
                                   mxu=False)

        carry = jax.lax.fori_loop(0, n_obs, body,
                                  _bar_greek_init(ops, shape, shape_c))
        return _bar_greek_payoff(carry, ops, o.k, t, n_obs, mxu=False)

    def block_fn(bkey):
        def body(i, carry):
            acc, vecs = carry
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (n_obs,) + shape, dtype)
            tiles = one_walk(z_seq, jnp.asarray(1.0, dtype))
            if plan.antithetic:
                mt = one_walk(z_seq, jnp.asarray(-1.0, dtype))
                tiles = tuple(0.5 * (a + b) for a, b in zip(tiles, mt))
            p, gr, dval, vval = tiles
            acc = acc_add_n(acc, (jnp.sum(p), jnp.sum(p * p),
                                  jnp.sum(gr), jnp.sum(gr * gr)),
                            plan.kahan)
            vecs = vecs + jnp.stack([
                det_col_sums(dval), det_col_sums(dval * dval),
                det_col_sums(vval), det_col_sums(vval * vval)])
            return acc, vecs

        acc, vecs = jax.lax.fori_loop(
            0, plan.iters, body,
            (acc_init_n(N_MW_GREEK_SCALARS, dtype, plan.kahan),
             jnp.zeros((4, width), dtype)))
        return jnp.stack(acc_final_n(acc, plan.kahan)), vecs

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


def _mw_bar_greeks_kernel(seed_ref, off_ref, scal_ref, s0_ref, drift_ref,
                          vol_ref, d_ref, lt_ref, linv_ref, wsel_ref,
                          esel_ref, eselt_ref, cd_ref, sr_ref, invv_ref,
                          out_ref, vec_ref, *, plan: Plan, n_obs: int,
                          up: bool):
    k, t, bar, sqdt = scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3]
    ops = {
        "log_s0": s0_ref[:], "drift": drift_ref[:], "vol": vol_ref[:],
        "d": d_ref[:], "chol_bd": lt_ref[:], "linvT_bd": linv_ref[:],
        "wsel": wsel_ref[:], "esel": esel_ref[:], "eselT": eselt_ref[:],
        "cd_row": cd_ref[:], "sr_row": sr_ref[:], "inv_v": invv_ref[:],
        "sqdt": sqdt,
    }
    width = lt_ref.shape[0]
    c = wsel_ref.shape[1]
    shape = (plan.rows, width)
    shape_c = (plan.rows, c)
    b = pl.program_id(0)

    def one_walk(i, sgn):
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)
        carry = walk_pairwise(
            shape, n_obs,
            lambda j, z, cy: _bar_greek_step(j, sgn * z, cy, ops, bar, up,
                                             True),
            _bar_greek_init(ops, shape, shape_c))
        return _bar_greek_payoff(carry, ops, k, t, n_obs, mxu=True)

    def body(i, carry):
        acc, vecs = carry
        tiles = one_walk(i, 1.0)
        if plan.antithetic:
            mt = one_walk(i, -1.0)
            tiles = tuple(0.5 * (a + b2) for a, b2 in zip(tiles, mt))
        p, gr, dval, vval = tiles
        acc = acc_add_n(acc, (jnp.sum(p), jnp.sum(p * p),
                              jnp.sum(gr), jnp.sum(gr * gr)), plan.kahan)
        vecs = vecs + jnp.stack([
            det_col_sums(dval), det_col_sums(dval * dval),
            det_col_sums(vval), det_col_sums(vval * vval)])
        return acc, vecs

    acc, vecs = jax.lax.fori_loop(
        0, plan.iters, body,
        (acc_init_n(N_MW_GREEK_SCALARS, jnp.float32, plan.kahan),
         jnp.zeros((4, width), jnp.float32)))
    vals = acc_final_n(acc, plan.kahan)
    for j in range(N_MW_GREEK_SCALARS):
        out_ref[0, 0, j] = vals[j]
    vec_ref[0] = vecs


def bar_greek_pallas_partials(opt, chol, seed, block_offset, plan: Plan,
                              n_blocks: int, *, n_obs: int, barrier,
                              up: bool, interpret: bool = False):
    """Fused basket-barrier LR Greek partials on TPU."""
    if use_asset_major(opt.n_assets):
        return _am_bar_greek_pallas_partials(opt, chol, seed, block_offset,
                                             plan, n_blocks, n_obs=n_obs,
                                             barrier=barrier, up=up,
                                             interpret=interpret)
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        o = opt.astype(jnp.float32)
        ops = barrier_greek_ops(o, chol, jnp.float32, n_obs)
        width = ops["chol_bd"].shape[0]
        c = ops["wsel"].shape[1]
        scal = jnp.stack([jnp.asarray(o.k, jnp.float32),
                          jnp.asarray(o.t, jnp.float32),
                          jnp.asarray(barrier, jnp.float32), ops["sqdt"]])
        seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
        off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))
        kernel = functools.partial(_mw_bar_greeks_kernel, plan=plan,
                                   n_obs=n_obs, up=up)
        paths_iter = plan.rows * c * (2 if plan.antithetic else 1)
        out, vecs = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12,
            out_specs=(
                block_out_spec(N_MW_GREEK_SCALARS),
                pl.BlockSpec((1, 4, width), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                block_out_shape(n_blocks, N_MW_GREEK_SCALARS),
                jax.ShapeDtypeStruct((n_blocks, 4, width), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=GRID_SEMANTICS,
            ),
            cost_estimate=pl.CostEstimate(
                flops=plan.iters * plan.rows * n_obs * (4 * width * width
                                                        + 16 * width),
                bytes_accessed=n_blocks * (4 + 4 * width) * 4,
                transcendentals=plan.iters * paths_iter * n_obs * 3,
            ),
            interpret=interpret_arg(interpret),
        )(seed_arr, off_arr, scal, ops["log_s0"], ops["drift"],
          ops["vol"], ops["d"], ops["chol_bd"], ops["linvT_bd"],
          ops["wsel"], ops["esel"], ops["eselT"], ops["cd_row"],
          ops["sr_row"], ops["inv_v"])
    return out.reshape(n_blocks, N_MW_GREEK_SCALARS), vecs


# ---------------------------------------------------------------------------
# Greeks: asset-major regime (a <= ASSET_MAJOR_MAX)
# ---------------------------------------------------------------------------
#
# Same sensitivities as the packed Greek kernels above, on the asset-major
# walk core the PRICING kernels use for small baskets (``_am_core``): one
# full-lane (rows, 128) tile per asset, correlation as a(a+1)/2
# broadcast-scalar FMAs instead of two width x width matmuls.  Sharing
# ``_am_core`` keeps the log-spot chain bitwise identical to the pricer —
# the shared-stream price == pricer contract the engine tests assert.
# Per-block outputs: 4 scalar sums (payoff, rho pairs) + a (4, LANES) lane
# row holding the per-asset (delta, delta^2, vega, vega^2) sums in lanes
# 0..a-1 (the engine fold reads ``[:, :a]`` via ``c = 1``).


def _am_greek_ops(opt, chol, dtype, n_obs: int):
    """``params (8, a)``: the 5 walk rows of :func:`_am_walk_ops` plus
    ``vdt`` (v dt), ``winvn`` (w / n_obs), ``inv_s0``."""
    lt, walk_params = _am_walk_ops(opt, chol, dtype, n_obs)
    a = opt.n_assets
    dt = jnp.asarray(opt.t, dtype) / n_obs
    v = jnp.broadcast_to(jnp.asarray(opt.v, dtype), (a,))
    s0 = jnp.broadcast_to(jnp.asarray(opt.s, dtype), (a,))
    w = jnp.broadcast_to(jnp.asarray(opt.w, dtype), (a,))
    extra = jnp.stack([v * dt, w / n_obs, 1.0 / s0])
    return lt, jnp.concatenate([walk_params, extra]), jnp.sqrt(dt), dt


def _am_greek_step(j, zs, carry, lt_at, par_at, sqdt, dt, a: int):
    """One asset-major basket-Asian Greek step (pathwise tangents)."""
    xs, dxvs, acc, tb, a_s, a_v = carry
    xs, basket, bts, ss = _am_core(zs, xs, lt_at, par_at, a)
    dxvs = tuple(dxvs[i] + sqdt * bts[i] - par_at(5, i) for i in range(a))
    a_s = tuple(a_s[i] + ss[i] for i in range(a))
    a_v = tuple(a_v[i] + ss[i] * dxvs[i] for i in range(a))
    tj = dt * (jnp.asarray(j, dt.dtype) + 1.0)
    return (xs, dxvs, acc + basket, tb + tj * basket, a_s, a_v)


def _am_greek_init(par_at, a: int, shape, dtype=jnp.float32):
    zero = lambda: jnp.zeros(shape, dtype)
    zeros_a = lambda: tuple(zero() for _ in range(a))
    return (_am_init_xs(par_at, a, shape, dtype), zeros_a(), zero(),
            zero(), zeros_a(), zeros_a())


def _am_greek_payoff(carry, par_at, k, t, inv_n, a: int):
    _, _, acc, tb, a_s, a_v = carry
    abar = acc * inv_n
    p = jnp.maximum(abar - k, 0.0)
    ind = jnp.where(abar > k, 1.0, 0.0)
    gr = ind * (tb * inv_n) - t * p
    dvals = [ind * par_at(6, i) * a_s[i] * par_at(7, i) for i in range(a)]
    vvals = [ind * par_at(6, i) * a_v[i] for i in range(a)]
    return p, gr, dvals, vvals


def _am_greek_sums(tiles):
    """Per-iteration scalar sums, ordered for :func:`_am_lane_rows`:
    ``[p, p^2, gr, gr^2, d_0.., d^2_0.., v_0.., v^2_0..]``."""
    p, gr, dvals, vvals = tiles
    vals = [jnp.sum(p), jnp.sum(p * p), jnp.sum(gr), jnp.sum(gr * gr)]
    for grp in (dvals, [d * d for d in dvals],
                vvals, [v * v for v in vvals]):
        vals.extend(jnp.sum(g) for g in grp)
    return tuple(vals)


def _am_greek_xla_partials(o, chol, key, block_offset, plan: Plan,
                           n_blocks: int, *, n_obs: int):
    """Asset-major XLA twin of the basket-Asian Greek kernel."""
    dtype = plan.jdtype
    a = o.n_assets
    lt, params, sqdt, dt = _am_greek_ops(o, chol, dtype, n_obs)
    lt_at = lambda i, j: lt[i, j]
    par_at = lambda r, i: params[r, i]
    shape = (plan.rows, LANES)
    inv_n = jnp.asarray(1.0 / n_obs, dtype)
    t = jnp.asarray(o.t, dtype)
    n_sums = 4 + 4 * a

    def one_walk(z_seq, sgn):
        def body(j, carry):
            zs = [sgn * z_seq[j, i] for i in range(a)]
            return _am_greek_step(j, zs, carry, lt_at, par_at, sqdt, dt, a)

        carry = jax.lax.fori_loop(0, n_obs, body,
                                  _am_greek_init(par_at, a, shape, dtype))
        return _am_greek_payoff(carry, par_at, o.k, t, inv_n, a)

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (n_obs, a) + shape, dtype)
            tiles = one_walk(z_seq, jnp.asarray(1.0, dtype))
            if plan.antithetic:
                mt = one_walk(z_seq, jnp.asarray(-1.0, dtype))
                tiles = tuple(
                    0.5 * (x + y) if not isinstance(x, list)
                    else [0.5 * (xi + yi) for xi, yi in zip(x, y)]
                    for x, y in zip(tiles, mt))
            return acc_add_n(carry, _am_greek_sums(tiles), plan.kahan)

        carry = jax.lax.fori_loop(0, plan.iters, body,
                                  acc_init_n(n_sums, dtype, plan.kahan))
        vals = acc_final_n(carry, plan.kahan)
        return (jnp.stack(vals[:N_MW_GREEK_SCALARS]),
                _am_lane_rows(vals, N_MW_GREEK_SCALARS, a, 4)
                .astype(dtype))

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


def _mw_am_greeks_kernel(seed_ref, off_ref, scal_ref, lt_ref, par_ref,
                         out_ref, vec_ref, *, plan: Plan, a: int,
                         n_obs: int):
    k, t, inv_n, sqdt, dt = (scal_ref[0], scal_ref[1], scal_ref[2],
                             scal_ref[3], scal_ref[4])
    lt_at = lambda ii, jj: lt_ref[ii, jj]
    par_at = lambda rr, ii: par_ref[rr, ii]
    shape = (plan.rows, LANES)
    n_sums = 4 + 4 * a
    b = pl.program_id(0)

    def one_walk(i, sgn):
        seed_prng(seed_ref[0], (off_ref[0] + b) * jnp.int32(plan.iters) + i)

        def step(j, zs, carry):
            return _am_greek_step(j, [sgn * z for z in zs], carry, lt_at,
                                  par_at, sqdt, dt, a)

        carry = walk_pairwise_multi(shape, a, n_obs, step,
                                    _am_greek_init(par_at, a, shape))
        return _am_greek_payoff(carry, par_at, k, t, inv_n, a)

    def body(i, carry):
        tiles = one_walk(i, 1.0)
        if plan.antithetic:
            mt = one_walk(i, -1.0)
            tiles = tuple(
                0.5 * (x + y) if not isinstance(x, list)
                else [0.5 * (xi + yi) for xi, yi in zip(x, y)]
                for x, y in zip(tiles, mt))
        return acc_add_n(carry, _am_greek_sums(tiles), plan.kahan)

    carry = jax.lax.fori_loop(0, plan.iters, body,
                              acc_init_n(n_sums, jnp.float32, plan.kahan))
    vals = acc_final_n(carry, plan.kahan)
    for j in range(N_MW_GREEK_SCALARS):
        out_ref[0, 0, j] = vals[j]
    vec_ref[0] = _am_lane_rows(vals, N_MW_GREEK_SCALARS, a, 4)


def _am_greek_pallas_partials(opt, chol, seed, block_offset, plan: Plan,
                              n_blocks: int, *, n_obs: int,
                              interpret: bool):
    """Fused asset-major basket-Asian Greek partials on TPU."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        o = opt.astype(jnp.float32)
        a = o.n_assets
        lt, params, sqdt, dt = _am_greek_ops(o, chol, jnp.float32, n_obs)
        scal = jnp.stack([jnp.asarray(o.k, jnp.float32),
                          jnp.asarray(o.t, jnp.float32),
                          jnp.asarray(1.0 / n_obs, jnp.float32), sqdt, dt])
        seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
        off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))
        kernel = functools.partial(_mw_am_greeks_kernel, plan=plan, a=a,
                                   n_obs=n_obs)
        paths_iter = plan.rows * LANES * (2 if plan.antithetic else 1)
        out, vecs = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 5,
            out_specs=(
                block_out_spec(N_MW_GREEK_SCALARS),
                pl.BlockSpec((1, 4, LANES), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                block_out_shape(n_blocks, N_MW_GREEK_SCALARS),
                jax.ShapeDtypeStruct((n_blocks, 4, LANES), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=GRID_SEMANTICS,
            ),
            cost_estimate=pl.CostEstimate(
                flops=plan.iters * paths_iter * n_obs
                * (a * (a + 1) + 14 * a + 8),
                bytes_accessed=n_blocks * (4 + 4 * LANES) * 4,
                transcendentals=plan.iters * paths_iter * n_obs
                * (a + a // 2 + 1),
            ),
            interpret=interpret_arg(interpret),
        )(seed_arr, off_arr, scal, lt, params)
    return out.reshape(n_blocks, N_MW_GREEK_SCALARS), vecs


def _am_bar_greek_ops(opt, chol, dtype, n_obs: int):
    """``params (8, a)``: the 5 walk rows plus the LR-score rows
    ``inv_v``, ``cd`` (1 / (s0 v sqrt(dt))), ``sr`` (sqrt(dt) / v)."""
    lt, walk_params = _am_walk_ops(opt, chol, dtype, n_obs)
    a = opt.n_assets
    dt = jnp.asarray(opt.t, dtype) / n_obs
    sqdt = jnp.sqrt(dt)
    import jax.scipy.linalg as jsla
    linv = jsla.solve_triangular(jnp.asarray(chol, dtype),
                                 jnp.eye(a, dtype=dtype), lower=True)
    v = jnp.broadcast_to(jnp.asarray(opt.v, dtype), (a,))
    s0 = jnp.broadcast_to(jnp.asarray(opt.s, dtype), (a,))
    extra = jnp.stack([1.0 / v, 1.0 / (s0 * v * sqdt), sqdt / v])
    return lt, linv, jnp.concatenate([walk_params, extra]), sqdt


def _am_bar_greek_step(j, zs, carry, lt_at, linv_at, par_at, sqdt,
                       barrier, up: bool, a: int):
    """One asset-major LR-score barrier walk step.

    ``q_m = <z, L^{-1} e_m> = sum_{j >= m} Linv[j, m] z_j`` — the same
    projections the packed kernel computes with a block-diagonal matmul,
    here as a(a+1)/2 broadcast-scalar FMAs."""
    xs, qds, acc_q, acc_v, alive, last = carry
    xs, basket, bts, ss = _am_core(zs, xs, lt_at, par_at, a)
    qs = []
    for m in range(a):
        q = linv_at(m, m) * zs[m]
        for jj in range(m + 1, a):
            q = q + linv_at(jj, m) * zs[jj]
        qs.append(q)
    qds = tuple(jnp.where(j == 0, qs[m], qds[m]) for m in range(a))
    acc_q = tuple(acc_q[m] + qs[m] for m in range(a))
    acc_v = tuple(acc_v[m] + qs[m] * (bts[m] * par_at(5, m) - sqdt)
                  for m in range(a))
    hit = (basket < barrier) if up else (basket > barrier)
    alive = alive * hit.astype(alive.dtype)
    return (xs, qds, acc_q, acc_v, alive, basket)


def _am_bar_greek_init(par_at, a: int, shape, dtype=jnp.float32):
    zero = lambda: jnp.zeros(shape, dtype)
    zeros_a = lambda: tuple(zero() for _ in range(a))
    return (_am_init_xs(par_at, a, shape, dtype), zeros_a(), zeros_a(),
            zeros_a(), jnp.ones(shape, dtype), zero())


def _am_bar_greek_payoff(carry, par_at, k, t, n_obs: int, a: int):
    _, qds, acc_q, acc_v, alive, last = carry
    p = alive * jnp.maximum(last - k, 0.0)
    score_r = acc_q[0] * par_at(7, 0)
    for m in range(1, a):
        score_r = score_r + acc_q[m] * par_at(7, m)
    gr = p * score_r - t * p
    dvals = [p * qds[m] * par_at(6, m) for m in range(a)]
    vvals = [p * (acc_v[m] - n_obs * par_at(5, m)) for m in range(a)]
    return p, gr, dvals, vvals


def _am_bar_greek_xla_partials(o, chol, key, block_offset, plan: Plan,
                               n_blocks: int, *, n_obs: int, barrier,
                               up: bool):
    """Asset-major XLA twin of the basket-barrier LR Greek kernel."""
    dtype = plan.jdtype
    a = o.n_assets
    lt, linv, params, sqdt = _am_bar_greek_ops(o, chol, dtype, n_obs)
    lt_at = lambda i, j: lt[i, j]
    linv_at = lambda i, j: linv[i, j]
    par_at = lambda r, i: params[r, i]
    shape = (plan.rows, LANES)
    bar = jnp.asarray(barrier, dtype)
    t = jnp.asarray(o.t, dtype)
    n_sums = 4 + 4 * a

    def one_walk(z_seq, sgn):
        def body(j, carry):
            zs = [sgn * z_seq[j, i] for i in range(a)]
            return _am_bar_greek_step(j, zs, carry, lt_at, linv_at,
                                      par_at, sqdt, bar, up, a)

        carry = jax.lax.fori_loop(
            0, n_obs, body, _am_bar_greek_init(par_at, a, shape, dtype))
        return _am_bar_greek_payoff(carry, par_at, o.k, t, n_obs, a)

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (n_obs, a) + shape, dtype)
            tiles = one_walk(z_seq, jnp.asarray(1.0, dtype))
            if plan.antithetic:
                mt = one_walk(z_seq, jnp.asarray(-1.0, dtype))
                tiles = tuple(
                    0.5 * (x + y) if not isinstance(x, list)
                    else [0.5 * (xi + yi) for xi, yi in zip(x, y)]
                    for x, y in zip(tiles, mt))
            return acc_add_n(carry, _am_greek_sums(tiles), plan.kahan)

        carry = jax.lax.fori_loop(0, plan.iters, body,
                                  acc_init_n(n_sums, dtype, plan.kahan))
        vals = acc_final_n(carry, plan.kahan)
        return (jnp.stack(vals[:N_MW_GREEK_SCALARS]),
                _am_lane_rows(vals, N_MW_GREEK_SCALARS, a, 4)
                .astype(dtype))

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


def _mw_am_bar_greeks_kernel(seed_ref, off_ref, scal_ref, lt_ref, linv_ref,
                             par_ref, out_ref, vec_ref, *, plan: Plan,
                             a: int, n_obs: int, up: bool):
    k, t, bar, sqdt = scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3]
    lt_at = lambda ii, jj: lt_ref[ii, jj]
    linv_at = lambda ii, jj: linv_ref[ii, jj]
    par_at = lambda rr, ii: par_ref[rr, ii]
    shape = (plan.rows, LANES)
    n_sums = 4 + 4 * a
    b = pl.program_id(0)

    def one_walk(i, sgn):
        seed_prng(seed_ref[0], (off_ref[0] + b) * jnp.int32(plan.iters) + i)

        def step(j, zs, carry):
            return _am_bar_greek_step(j, [sgn * z for z in zs], carry,
                                      lt_at, linv_at, par_at, sqdt, bar,
                                      up, a)

        carry = walk_pairwise_multi(shape, a, n_obs, step,
                                    _am_bar_greek_init(par_at, a, shape))
        return _am_bar_greek_payoff(carry, par_at, k, t, n_obs, a)

    def body(i, carry):
        tiles = one_walk(i, 1.0)
        if plan.antithetic:
            mt = one_walk(i, -1.0)
            tiles = tuple(
                0.5 * (x + y) if not isinstance(x, list)
                else [0.5 * (xi + yi) for xi, yi in zip(x, y)]
                for x, y in zip(tiles, mt))
        return acc_add_n(carry, _am_greek_sums(tiles), plan.kahan)

    carry = jax.lax.fori_loop(0, plan.iters, body,
                              acc_init_n(n_sums, jnp.float32, plan.kahan))
    vals = acc_final_n(carry, plan.kahan)
    for j in range(N_MW_GREEK_SCALARS):
        out_ref[0, 0, j] = vals[j]
    vec_ref[0] = _am_lane_rows(vals, N_MW_GREEK_SCALARS, a, 4)


def _am_bar_greek_pallas_partials(opt, chol, seed, block_offset,
                                  plan: Plan, n_blocks: int, *, n_obs: int,
                                  barrier, up: bool, interpret: bool):
    """Fused asset-major basket-barrier LR Greek partials on TPU."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        o = opt.astype(jnp.float32)
        a = o.n_assets
        lt, linv, params, sqdt = _am_bar_greek_ops(o, chol, jnp.float32,
                                                   n_obs)
        scal = jnp.stack([jnp.asarray(o.k, jnp.float32),
                          jnp.asarray(o.t, jnp.float32),
                          jnp.asarray(barrier, jnp.float32), sqdt])
        seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
        off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))
        kernel = functools.partial(_mw_am_bar_greeks_kernel, plan=plan,
                                   a=a, n_obs=n_obs, up=up)
        paths_iter = plan.rows * LANES * (2 if plan.antithetic else 1)
        out, vecs = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 6,
            out_specs=(
                block_out_spec(N_MW_GREEK_SCALARS),
                pl.BlockSpec((1, 4, LANES), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                block_out_shape(n_blocks, N_MW_GREEK_SCALARS),
                jax.ShapeDtypeStruct((n_blocks, 4, LANES), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=GRID_SEMANTICS,
            ),
            cost_estimate=pl.CostEstimate(
                flops=plan.iters * paths_iter * n_obs
                * (2 * a * (a + 1) + 14 * a + 8),
                bytes_accessed=n_blocks * (4 + 4 * LANES) * 4,
                transcendentals=plan.iters * paths_iter * n_obs
                * (a + a // 2 + 1),
            ),
            interpret=interpret_arg(interpret),
        )(seed_arr, off_arr, scal, lt, linv, params)
    return out.reshape(n_blocks, N_MW_GREEK_SCALARS), vecs
