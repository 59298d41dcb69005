"""Fused basket-call Monte Carlo kernel (correlated multi-asset GBM).

TPU-native rebuild of ``basketOptMonteCarlo`` (``MonteCarloKernel.cu:133-177``):
per path, draw an asset vector of normals, correlate it with the Cholesky
factor, take terminal GBM steps per asset and evaluate the weighted basket
call.  The reference's serial per-asset loops (``brownianVect``,
``MonteCarloKernel.cu:74-87``) become MXU matmuls over path tiles.

Lane packing: small baskets would waste the 128-lane dimension (3 assets in
128 lanes = 2.3% utilization), so ``c = 128 / a_tile`` independent paths are
packed per lane row, with the Cholesky factor laid out block-diagonally
(``c`` copies of the ``a_tile x a_tile`` block).  Correlation is then one
``(rows, 128) @ (128, 128)`` matmul covering c paths at once, and the
weighted basket sum is a second matmul with a block-structured ``(128, c)``
weight selector — both MXU ops.  Baskets wider than 64 assets take one path
per row with the asset dim padded to a lane multiple (tested to 100+ assets,
the BASELINE.json scaling config).  Runtime ``n_assets`` throughout, vs the
reference's compile-time ``N=3``.
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
                                  block_out_shape, block_out_spec,
                                  chunk_sums, draw_normal_pair,
                                  interpret_arg, prng_emulation, seed_prng)
from mctpu.kernels.vanilla import _accum_add, _accum_final, _accum_init
from mctpu.types import BasketOption

__all__ = ["make_plan", "xla_partials", "pallas_partials", "pack_factor",
           "pack_assets", "use_asset_major"]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Narrow baskets skip the MXU entirely.  The packed layout's 128x128
# block-diagonal matmul computes ~97% zeros for a 3-asset basket, and at
# HIGHEST precision (required for accuracy, see MATMUL_PRECISION) each
# matmul is a multi-pass operation — the roofline measured the packed
# kernel at 41% of its op budget with the MXU dispatches on the critical
# path.  Up to this many assets the correlation is a handful of
# broadcast-scalar FMAs on full (rows, 128) path tiles (every lane a
# path, not 1-in-a_tile), which also quadruples the paths per tile.
ASSET_MAJOR_MAX = 8


def use_asset_major(n_assets: int) -> bool:
    """True when the basket runs the asset-major VPU path (small a)."""
    return n_assets <= ASSET_MAJOR_MAX


# Full-f32 matmuls (multi-pass bf16 on the MXU): the DEFAULT precision
# truncates inputs to bf16, and that *deterministic* rounding of the
# Cholesky/weight entries is a multiplicative price bias, not noise —
# measured +4% on the 3-asset reference basket (z=21 vs the oracle) and
# +1.8% at 100 assets.  HIGHEST restores z ~ 1.  Mosaic lowers only DEFAULT
# and HIGHEST (Precision.HIGH raises NotImplementedError), so there is no
# cheaper accurate middle tier.  Module-level so benchmarks can A/B.
MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def pack_factor(n_assets: int, lanes: int = LANES):
    """``(a_tile, c, width)``: asset-tile span, paths packed per lane row,
    and the lane width of the normal tile.

    ``a_tile`` is the power-of-2 span one path's assets occupy; ``c`` paths
    share a row when ``a_tile < lanes``.  Wide baskets (> lanes/2) take one
    path per row with assets padded to a lane multiple.
    """
    a_tile = 1
    while a_tile < n_assets:
        a_tile *= 2
    if a_tile >= lanes:
        width = _round_up(n_assets, lanes)
        return width, 1, width
    return a_tile, lanes // a_tile, lanes


def make_plan(n_paths: int, num_blocks: int, rows: int, antithetic: bool,
              dtype: str = "float32", kahan: bool = True,
              n_assets: int = 3) -> Plan:
    if use_asset_major(n_assets):
        # Each iteration draws n_assets Box-Muller pairs whose two branches
        # feed two independent (rows, 128) path tiles (asset-major: every
        # lane is a path) -> 2 * rows * 128 paths per iteration.
        units = 2 * rows * LANES
    else:
        # Packed layout: two (rows, width) normal tiles; each row packs c
        # paths -> 2 * rows * c paths per iteration.
        _, c, _ = pack_factor(n_assets)
        units = 2 * rows * c
    paths = units * (2 if antithetic else 1)
    return Plan.plan(n_paths, num_blocks, rows, paths, units, antithetic,
                     dtype, kahan)


def asset_major_ops(opt: BasketOption, chol, dtype):
    """Small per-asset operand vectors for the asset-major path.

    ``lt``: the (a, a) lower-triangular Cholesky factor; ``params`` rows:
    drift_a, vol_a, d_a (Brownian drift offset), w_a * s0_a (the weighted
    payoff scale — padded-lane logic does not exist here, every lane is a
    real path).
    """
    a = opt.n_assets
    drift = (jnp.asarray(opt.r, dtype)
             - 0.5 * jnp.asarray(opt.v, dtype) ** 2) * jnp.asarray(
                 opt.t, dtype)
    vol = jnp.asarray(opt.v, dtype) * jnp.sqrt(jnp.asarray(opt.t, dtype))
    d = jnp.asarray(opt.d, dtype)
    ws0 = jnp.asarray(opt.w, dtype) * jnp.asarray(opt.s, dtype)
    params = jnp.stack([jnp.broadcast_to(drift, (a,)),
                        jnp.broadcast_to(vol, (a,)),
                        jnp.broadcast_to(d, (a,)),
                        jnp.broadcast_to(ws0, (a,))])
    return jnp.asarray(chol, dtype), params


def _asset_major_payoff(zs, lt_at, par_at, k, a: int, antithetic: bool,
                        with_value: bool = False):
    """Basket payoff of one path tile from ``a`` asset normal tiles.

    ``zs``: list of ``a`` (rows, 128) tiles; ``lt_at(i, j)``/``par_at(r, i)``
    read scalar operands (SMEM refs in the kernel, arrays in the XLA twin).
    The correlation ``bt_i = sum_j L_ij z_j`` is lower-triangular
    broadcast-scalar FMAs; the antithetic mirror flips the ``L z`` term
    only (the Brownian offset ``d`` is deterministic).

    ``with_value=True`` additionally returns the undiscounted terminal
    basket value (the control-variate tile, pair-meaned like the payoff).
    """
    def pay(sgn):
        basket = None
        for i in range(a):
            bt = None
            for j in range(i + 1):
                term = lt_at(i, j) * zs[j]
                bt = term if bt is None else bt + term
            arg = par_at(0, i) + par_at(1, i) * (sgn * bt + par_at(2, i))
            term = par_at(3, i) * jnp.exp(arg)
            basket = term if basket is None else basket + term
        return jnp.maximum(basket - k, 0.0), basket

    if antithetic:
        p1, c1 = pay(1.0)
        p2, c2 = pay(-1.0)
        p, c = 0.5 * (p1 + p2), 0.5 * (c1 + c2)
    else:
        p, c = pay(1.0)
    return (p, c) if with_value else p


def pack_assets(opt: BasketOption, chol, dtype, lanes: int = LANES):
    """Packed, payoff-neutral operand layout (see module docstring).

    Returns row vectors ``s0/drift/vol/d`` of shape ``(1, width)`` tiled
    ``c`` times (padded slots have ``s0 = vol = drift = 0`` so they add
    exactly 0 to every basket), the block-diagonal transposed Cholesky
    ``(width, width)`` laid out so ``bt = z @ chol_bd`` equals ``L @ z`` per
    packed path, and the weight selector ``wsel (width, c)`` whose matmul
    performs all ``c`` weighted basket sums at once.
    """
    a = opt.n_assets
    a_tile, c, width = pack_factor(a, lanes)

    def tile_row(x):
        row = jnp.zeros((a_tile,), dtype).at[:a].set(jnp.asarray(x, dtype))
        return jnp.tile(row, c).reshape(1, width)

    s0_row = tile_row(opt.s)
    v_row = tile_row(opt.v)
    t = jnp.asarray(opt.t, dtype)
    r = jnp.asarray(opt.r, dtype)
    # Padded slots are neutralized by s0 = 0 (payoff term s0*exp(...) == 0),
    # so drift/vol rows need no masking of their own.
    drift = (r - 0.5 * v_row * v_row) * t
    vol = v_row * jnp.sqrt(t)
    d_row = tile_row(opt.d)

    block = jnp.zeros((a_tile, a_tile), dtype).at[:a, :a].set(
        jnp.asarray(chol, dtype).T)
    chol_bd = jnp.zeros((width, width), dtype)
    w_col = jnp.zeros((a_tile,), dtype).at[:a].set(jnp.asarray(opt.w, dtype))
    wsel = jnp.zeros((width, c), dtype)
    for p in range(c):
        chol_bd = jax.lax.dynamic_update_slice(chol_bd, block,
                                               (p * a_tile, p * a_tile))
        wsel = jax.lax.dynamic_update_slice(wsel, w_col[:, None],
                                            (p * a_tile, p))

    return {"s0": s0_row, "drift": drift, "vol": vol, "d": d_row,
            "chol_bd": chol_bd, "wsel": wsel}


def _payoff_tile(ops, k, z, antithetic: bool, mxu: bool,
                 with_value: bool = False):
    """Basket payoffs of one (rows, width) normal tile -> ``(rows, c)``;
    pair-mean if antithetic.

    Mirrors ``brownianVect`` + ``basketPayoff`` (``MonteCarloKernel.cu:74-101``):
    ``bt = L z + d``; ``s_j = s0_j exp((r - v_j^2/2) t + v_j sqrt(t) bt_j)``;
    ``payoff = max(sum_j w_j s_j - k, 0)``.

    ``mxu=True`` (Pallas kernel) computes all ``c`` per-path asset sums with
    one ``wsel`` matmul; the XLA twin uses a reshape-sum instead — a batched
    dot's reduction order may vary with the vmap batch size, which would
    break the bitwise mesh-invariance contract the engine tests enforce.

    ``with_value=True`` additionally returns the terminal basket value
    (the control-variate tile, pair-meaned like the payoff).
    """
    c = ops["wsel"].shape[1]
    a_tile = ops["chol_bd"].shape[0] // c

    prec = MATMUL_PRECISION

    def pay(zz):
        bt = jnp.dot(zz, ops["chol_bd"], precision=prec,
                     preferred_element_type=jnp.float32) + ops["d"]
        s_t = ops["s0"] * jnp.exp(ops["drift"] + ops["vol"] * bt)
        if mxu:
            basket = jnp.dot(s_t, ops["wsel"], precision=prec,
                             preferred_element_type=jnp.float32)
        else:
            w_row = jnp.sum(ops["wsel"], axis=1).reshape(1, -1)
            prod = s_t * w_row
            basket = prod.reshape(prod.shape[0], c, a_tile).sum(axis=-1)
        return jnp.maximum(basket - k, 0.0), basket

    if antithetic:
        p1, c1 = pay(z)
        p2, c2 = pay(-z)
        p, cv = 0.5 * (p1 + p2), 0.5 * (c1 + c2)
    else:
        p, cv = pay(z)
    return (p, cv) if with_value else p


# ---------------------------------------------------------------------------
# XLA backend
# ---------------------------------------------------------------------------

def xla_partials(opt: BasketOption, chol, key: jax.Array, block_offset,
                 plan: Plan, n_blocks: int):
    """Per-block partial sums, shape ``(n_blocks, 2)``, via jax.random."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    a = opt.n_assets
    if use_asset_major(a):
        lt, params = asset_major_ops(o, chol, dtype)
        shape = (plan.rows, LANES)

        def block_fn(bkey):
            def body(i, carry):
                zk = jax.random.fold_in(bkey, i)
                z = jax.random.normal(zk, (2, a) + shape, dtype)
                lt_at = lambda ii, jj: lt[ii, jj]
                par_at = lambda rr, ii: params[rr, ii]
                p1 = _asset_major_payoff([z[0, t] for t in range(a)],
                                         lt_at, par_at, o.k, a,
                                         plan.antithetic)
                p2 = _asset_major_payoff([z[1, t] for t in range(a)],
                                         lt_at, par_at, o.k, a,
                                         plan.antithetic)
                cs = jnp.sum(p1) + jnp.sum(p2)
                cs2 = jnp.sum(p1 * p1) + jnp.sum(p2 * p2)
                return _accum_add(carry, cs, cs2, plan.kahan)

            carry = jax.lax.fori_loop(0, plan.iters, body,
                                      _accum_init(dtype, plan.kahan))
            s, s2 = _accum_final(carry, plan.kahan)
            return jnp.stack([s, s2])

        keys = mcrng.block_keys(key, block_offset, n_blocks)
        return jax.vmap(block_fn)(keys)

    ops = pack_assets(o, chol, dtype)
    width = ops["chol_bd"].shape[0]

    def block_fn(bkey):
        def body(i, carry):
            zk = jax.random.fold_in(bkey, i)
            z = jax.random.normal(zk, (2 * plan.rows, width), dtype)
            p = _payoff_tile(ops, o.k, z, plan.antithetic, mxu=False)
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

def _basket_kernel(seed_ref, off_ref, scal_ref, s0_ref, drift_ref, vol_ref,
                   d_ref, lt_ref, wsel_ref, out_ref, *, plan: Plan,
                   mxu: bool = True):
    seed_prng(seed_ref[0], off_ref[0] + pl.program_id(0))
    k = scal_ref[0]
    ops = {
        "s0": s0_ref[:],
        "drift": drift_ref[:],
        "vol": vol_ref[:],
        "d": d_ref[:],
        "chol_bd": lt_ref[:],
        "wsel": wsel_ref[:],
    }
    width = lt_ref.shape[0]

    # Scalar accumulators with per-iteration reductions (see the measured
    # note in vanilla.py: small loop carries beat vector accumulators).
    def body(i, carry):
        z1, z2 = draw_normal_pair((plan.rows, width), i)
        p1 = _payoff_tile(ops, k, z1, plan.antithetic, mxu=mxu)
        p2 = _payoff_tile(ops, k, z2, plan.antithetic, mxu=mxu)
        cs = jnp.sum(p1) + jnp.sum(p2)
        cs2 = jnp.sum(p1 * p1) + jnp.sum(p2 * p2)
        return _accum_add(carry, cs, cs2, plan.kahan)

    carry = jax.lax.fori_loop(0, plan.iters, body,
                              _accum_init(jnp.float32, plan.kahan))
    s, s2 = _accum_final(carry, plan.kahan)
    out_ref[0, 0, 0] = s
    out_ref[0, 0, 1] = s2


def pallas_partials(opt: BasketOption, chol, seed, block_offset, plan: Plan,
                    n_blocks: int, interpret: bool = False):
    """Per-block partial sums, shape ``(n_blocks, 2)``, fused on TPU."""
    # Mosaic has no i64/f64: trace with x64 semantics off (see vanilla.py).
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        return _pallas_partials(opt, chol, seed, block_offset, plan,
                                n_blocks, interpret)


def _basket_am_kernel(seed_ref, off_ref, scal_ref, lt_ref, par_ref, out_ref,
                      *, plan: Plan, a: int):
    seed_prng(seed_ref[0], off_ref[0] + pl.program_id(0))
    k = scal_ref[0]
    lt_at = lambda ii, jj: lt_ref[ii, jj]
    par_at = lambda rr, ii: par_ref[rr, ii]
    shape = (plan.rows, LANES)

    def body(i, carry):
        # a Box-Muller pairs: branch 1 of pair p is asset p of path tile A,
        # branch 2 is asset p of path tile B — nothing discarded at any a.
        za, zb = [], []
        for p in range(a):
            z1, z2 = draw_normal_pair(shape, i * a + p)
            za.append(z1)
            zb.append(z2)
        p1 = _asset_major_payoff(za, lt_at, par_at, k, a, plan.antithetic)
        p2 = _asset_major_payoff(zb, lt_at, par_at, k, a, plan.antithetic)
        cs = jnp.sum(p1) + jnp.sum(p2)
        cs2 = jnp.sum(p1 * p1) + jnp.sum(p2 * p2)
        return _accum_add(carry, cs, cs2, plan.kahan)

    carry = jax.lax.fori_loop(0, plan.iters, body,
                              _accum_init(jnp.float32, plan.kahan))
    s, s2 = _accum_final(carry, plan.kahan)
    out_ref[0, 0, 0] = s
    out_ref[0, 0, 1] = s2


def _pallas_partials(opt, chol, seed, block_offset, plan, n_blocks, interpret):
    o = opt.astype(jnp.float32)
    a = opt.n_assets
    seed_arr0 = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    off_arr0 = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))
    if use_asset_major(a):
        lt, params = asset_major_ops(o, chol, jnp.float32)
        kernel = functools.partial(_basket_am_kernel, plan=plan, a=a)
        paths_iter = 2 * plan.rows * LANES * (2 if plan.antithetic else 1)
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
        )(seed_arr0, off_arr0, jnp.stack([o.k]), lt, params).reshape(
            n_blocks, 2)
    ops = pack_assets(o, chol, jnp.float32)
    width = ops["chol_bd"].shape[0]
    c = ops["wsel"].shape[1]
    scal = jnp.stack([o.k])
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))

    kernel = functools.partial(_basket_kernel, plan=plan)
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
            flops=plan.iters * 2 * plan.rows * (2 * width * width
                                                + 2 * width * c + 6 * width),
            bytes_accessed=n_blocks * 8 + 2 * width * width * 4,
            transcendentals=plan.iters * 2 * plan.rows * (2 * width + 2),
        ),
        interpret=interpret_arg(interpret),
    )(seed_arr, off_arr, scal, ops["s0"], ops["drift"], ops["vol"],
      ops["d"], ops["chol_bd"], ops["wsel"]).reshape(n_blocks, 2)
