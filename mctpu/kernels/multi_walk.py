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
from mctpu.kernels.common import (GRID_SEMANTICS, LANES, Plan, acc_add_n,
                                  acc_final_n, acc_init_n, chunk_sums,
                                  det_col_sums, interpret_arg, prng_emulation, seed_prng,
                                  walk_pairwise)
from mctpu.kernels.vanilla import _accum_add, _accum_final, _accum_init

__all__ = ["make_plan", "xla_partials", "pallas_partials",
           "greek_xla_partials", "greek_pallas_partials",
           "bar_greek_xla_partials", "bar_greek_pallas_partials",
           "N_MW_GREEK_SCALARS"]


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
    ``((n_blocks, 4), (n_blocks, 4, width))``."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
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
        out_ref[b, j] = vals[j]
    vec_ref[0] = vecs


def greek_pallas_partials(opt, chol, seed, block_offset, plan: Plan,
                          n_blocks: int, *, n_obs: int,
                          interpret: bool = False):
    """Fused basket-Asian Greek partials on TPU."""
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
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 4, width), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_blocks, N_MW_GREEK_SCALARS),
                                     jnp.float32),
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
    return out, vecs


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
    ``((n_blocks, 4), (n_blocks, 4, width))``."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
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
        out_ref[b, j] = vals[j]
    vec_ref[0] = vecs


def bar_greek_pallas_partials(opt, chol, seed, block_offset, plan: Plan,
                              n_blocks: int, *, n_obs: int, barrier,
                              up: bool, interpret: bool = False):
    """Fused basket-barrier LR Greek partials on TPU."""
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
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 4, width), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_blocks, N_MW_GREEK_SCALARS),
                                     jnp.float32),
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
    return out, vecs
