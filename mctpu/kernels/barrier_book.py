"""Fused BARRIER book kernel: M heterogeneous knock-outs in one walk sweep.

The path-dependent completion of the serving entry point: real books are
mostly path-dependent, and ``kernels/book.py`` (terminal-sampling
vanillas) cannot price them.  This kernel walks ONE shared standard-normal
increment stream over the observation grid and advances all M instruments
on it — each instrument owns its log-spot and alive tiles, scaled by its
own per-step ``drift_i = (r_i - v_i^2/2) t_i/g`` and ``vol_i =
v_i sqrt(t_i/g)``, knocked at its own log-barrier with its own direction
(up/down rides in as a ±1 DATA sign, so flipping a barrier's direction on
a tick does not recompile).  Marginal cost per instrument per step: one
FMA + one compare + one select on tiles the walk already holds; the draw
(the expensive part) is paid once for the whole book.

Everything per-instrument is runtime data in SMEM — one compiled program
serves any book of the same (size, n_obs), so market-data ticks never
recompile (the ``kernels/book.py`` serving contract extended to the
path-dependent case).  The walk math mirrors ``kernels/barrier.py``
op-for-op, so a ONE-instrument book ties the single barrier pricer
bitwise on shared streams (asserted in ``tests/test_book.py``).

Greeks ride almost free: the likelihood-ratio scores (Glasserman §7.3 —
pathwise is biased under the knock-out) are built from THREE shared
carried tiles (the first increment ``z_1``, ``sum z``, ``sum z^2``),
because every instrument consumes the SAME standardized increments; per
instrument the scores differ only by the deterministic constants
``1/(s0_i vol_i)``, ``1/v_i``, ``sqrt(dt_i)`` applied at payoff time.  So
the whole book's delta/vega/rho risk run costs the pricing walk plus
3 shared tile adds per step.

Beyond the reference (one European option per driver binary).
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
                                  acc_final_n, acc_init_n, interpret_arg,
                                  prng_emulation, seed_prng, walk_pairwise)
from mctpu.kernels.vanilla import _accum_add, _accum_final, _accum_init

__all__ = ["make_plan", "xla_partials", "pallas_partials", "book_params",
           "greek_xla_partials", "greek_pallas_partials",
           "N_BB_GREEK_SUMS", "MAX_BARRIER_BOOK"]

MAX_BARRIER_BOOK = 32  # per-instrument walk state is unrolled; keep
#                        compiles + VMEM tiles sane

N_BB_GREEK_SUMS = 8  # (sum, sum^2) of: payoff, delta, vega, rho


def make_plan(n_paths: int, num_blocks: int, rows: int, antithetic: bool,
              dtype: str = "float32", kahan: bool = True) -> Plan:
    units = rows * LANES
    paths = units * (2 if antithetic else 1)
    return Plan.plan(n_paths, num_blocks, rows, paths, units, antithetic,
                     dtype, kahan)


def book_params(book, n_obs: int, dtype):
    """(7, M) per-instrument rows: log_s0, k, log_barrier, drift, vol,
    barrier-direction sign (+1 up-and-out, -1 down-and-out), payoff sign
    (+1 call, -1 put).  Same arithmetic as the single kernel's scalar
    prep (``kernels/barrier._pallas_partials``) so element 0 of a
    one-instrument book is bitwise-identical."""
    o = book.astype(dtype)
    g = jnp.asarray(n_obs, dtype)
    dt = o.t / g
    drift = (o.r - 0.5 * o.v * o.v) * dt
    vol = o.v * jnp.sqrt(dt)
    bsgn = jnp.asarray([1.0 if d == "up-and-out" else -1.0
                        for d in book.directions], dtype)
    ksgn = jnp.asarray([1.0 if kd == "call" else -1.0
                        for kd in book.kinds], dtype)
    return jnp.stack([jnp.log(jnp.asarray(o.s, dtype)), o.k,
                      jnp.log(jnp.asarray(o.barrier, dtype)), drift, vol,
                      bsgn, ksgn])


def _alive_update_sgn(alive, log_s, log_b, bsgn):
    # bsgn*(log_s - log_b) >= 0 is `log_s >= log_b` for up-and-out and
    # `log_s <= log_b` for down-and-out — the same compare/select as the
    # single kernel's static branch, with the direction as data.
    hit = bsgn * (log_s - log_b) >= 0.0
    return alive * jnp.where(hit, 0.0, 1.0)


def _bb_step(at, m: int):
    """Walk step advancing ``(logs, alives)`` (M tiles each) on one shared
    draw; ``at(row, i)`` reads the per-instrument constant table."""
    def step(z, carry):
        logs, alives = carry
        new_l, new_a = [], []
        for i in range(m):
            ls = logs[i] + at(3, i) + at(4, i) * z
            new_l.append(ls)
            new_a.append(_alive_update_sgn(alives[i], ls, at(2, i),
                                           at(5, i)))
        return new_l, new_a

    return step


def _bb_init(at, m: int, shape, dtype=jnp.float32):
    return ([jnp.zeros(shape, dtype) + at(0, i) for i in range(m)],
            [jnp.ones(shape, dtype) for _ in range(m)])


def _bb_payoffs(logs, alives, at, m: int):
    return [alives[i]
            * jnp.maximum(at(6, i) * (jnp.exp(logs[i]) - at(1, i)), 0.0)
            for i in range(m)]


# ---------------------------------------------------------------------------
# XLA backend
# ---------------------------------------------------------------------------

def xla_partials(par, key: jax.Array, block_offset, plan: Plan,
                 n_blocks: int, n_obs: int):
    """Per-block partials, shape ``(n_blocks, M, 2)``.  Draw schedule
    matches ``kernels/barrier.xla_partials`` (one ``(g,)+shape`` normal
    tensor per iteration, antithetic legs sharing it)."""
    dtype = plan.jdtype
    par = jnp.asarray(par, dtype)
    m = par.shape[1]
    at = lambda r, i: par[r, i]
    shape = (plan.rows, LANES)
    step = _bb_step(at, m)

    def walk(z_seq, sgn):
        def body(j, carry):
            return step(sgn * z_seq[j], carry)

        logs, alives = jax.lax.fori_loop(0, n_obs, body,
                                         _bb_init(at, m, shape, dtype))
        return _bb_payoffs(logs, alives, at, m)

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (n_obs,) + shape, dtype)
            pays = walk(z_seq, jnp.asarray(1.0, dtype))
            if plan.antithetic:
                pays_m = walk(z_seq, jnp.asarray(-1.0, dtype))
                pays = [0.5 * (a + b) for a, b in zip(pays, pays_m)]
            new = []
            for i in range(m):
                new.append(_accum_add(carry[i], jnp.sum(pays[i]),
                                      jnp.sum(pays[i] * pays[i]),
                                      plan.kahan))
            return tuple(new)

        init = tuple(_accum_init(dtype, plan.kahan) for _ in range(m))
        carry = jax.lax.fori_loop(0, plan.iters, body, init)
        return jnp.stack([jnp.stack(_accum_final(carry[i], plan.kahan))
                          for i in range(m)])

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


# ---------------------------------------------------------------------------
# Pallas TPU backend
# ---------------------------------------------------------------------------

def _bb_kernel(seed_ref, off_ref, par_ref, out_ref, *, plan: Plan,
               n_obs: int, m: int):
    at = lambda r, i: par_ref[r, i]
    shape = (plan.rows, LANES)
    b = pl.program_id(0)
    step = _bb_step(at, m)

    def walk(i, sgn):
        # Same stream schedule as kernels/barrier._barrier_kernel: seed
        # (seed, global_iter), both Box-Muller branches consumed pairwise.
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)
        logs, alives = walk_pairwise(
            shape, n_obs, lambda j, z, c: step(sgn * z, c),
            _bb_init(at, m, shape))
        return _bb_payoffs(logs, alives, at, m)

    def body(i, carry):
        pays = walk(i, 1.0)
        if plan.antithetic:
            pays_m = walk(i, -1.0)
            pays = [0.5 * (a + b2) for a, b2 in zip(pays, pays_m)]
        new = []
        for j in range(m):
            new.append(_accum_add(carry[j], jnp.sum(pays[j]),
                                  jnp.sum(pays[j] * pays[j]), plan.kahan))
        return tuple(new)

    init = tuple(_accum_init(jnp.float32, plan.kahan) for _ in range(m))
    carry = jax.lax.fori_loop(0, plan.iters, body, init)
    for j in range(m):
        s, s2 = _accum_final(carry[j], plan.kahan)
        out_ref[0, j, 0] = s
        out_ref[0, j, 1] = s2


def pallas_partials(par, seed, block_offset, plan: Plan, n_blocks: int,
                    n_obs: int, interpret: bool = False):
    """Per-block partials ``(n_blocks, M, 2)``, fused on TPU."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        par = jnp.asarray(par, jnp.float32)
        m = par.shape[1]
        seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
        off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))
        kernel = functools.partial(_bb_kernel, plan=plan, n_obs=n_obs, m=m)
        paths_iter = plan.rows * LANES * (2 if plan.antithetic else 1)
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
            out_specs=pl.BlockSpec((1, m, 2), lambda b: (b, 0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((n_blocks, m, 2), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=GRID_SEMANTICS,
            ),
            cost_estimate=pl.CostEstimate(
                flops=plan.iters * paths_iter * n_obs * (4 + 3 * m),
                bytes_accessed=n_blocks * m * 8,
                transcendentals=plan.iters * paths_iter
                * (4 * n_obs + m),
            ),
            interpret=interpret_arg(interpret),
        )(seed_arr, off_arr, par)


# ---------------------------------------------------------------------------
# Likelihood-ratio Greeks: the whole book's risk run from one walk
# ---------------------------------------------------------------------------
# Same LR scores as kernels/barrier.py's Greeks section, with the key
# observation that the standardized increments are SHARED: zeta_j is the
# same tile for every instrument, so the walk carries (z1, sum z,
# sum z^2 - each shared, 3 tiles total) and the per-instrument scores are
# formed at payoff time from per-instrument constants:
#
#   delta_i = P_i * z1 / (s0_i vol_i)
#   vega_i  = P_i * ((sum z^2 - g)/v_i - sum z * sqrt(dt_i))
#   rho_i   = P_i * (sum z * sqrt(dt_i)/v_i - t_i)
#
# (the -t_i P_i rho discount term folded in, as in the single kernel).

def greek_rows(book, n_obs: int, dtype):
    """(13, M) rows: the 7 pricing rows + c_d, inv_v, sqdt, n_over_v,
    c_r, t (the single kernel's ``_greek_scalars`` vectorized)."""
    o = book.astype(dtype)
    g = jnp.asarray(n_obs, dtype)
    dt = o.t / g
    vol = o.v * jnp.sqrt(dt)
    base = book_params(book, n_obs, dtype)
    extra = jnp.stack([1.0 / (o.s * vol), 1.0 / o.v, jnp.sqrt(dt),
                       g / o.v, jnp.sqrt(dt) / o.v, o.t])
    return jnp.concatenate([base, extra], axis=0)


def _bb_greek_step(at, m: int):
    def step(j, zeta, carry):
        logs, alives, z1, zs, z2s = carry
        logs, alives = _bb_step(at, m)(zeta, (logs, alives))
        z1 = jnp.where(j == 0, zeta, z1)
        return (logs, alives, z1, zs + zeta, z2s + zeta * zeta)

    return step


def _bb_greek_init(at, m: int, shape, dtype=jnp.float32):
    z = jnp.zeros(shape, dtype)
    logs, alives = _bb_init(at, m, shape, dtype)
    return (logs, alives, z, z, z)


def _bb_greek_tiles(carry, at, m: int):
    logs, alives, z1, zs, z2s = carry
    pays = _bb_payoffs(logs, alives, at, m)
    tiles = []
    for i in range(m):
        p = pays[i]
        gd = p * z1 * at(7, i)
        gv = p * (z2s * at(8, i) - zs * at(9, i) - at(10, i))
        gr = p * (zs * at(11, i) - at(12, i))
        tiles.extend([p, gd, gv, gr])
    return tiles


def _bb_greek_sums(tiles):
    out = []
    for q in tiles:
        out.append(jnp.sum(q))
        out.append(jnp.sum(q * q))
    return tuple(out)


def greek_xla_partials(par, key: jax.Array, block_offset, plan: Plan,
                       n_blocks: int, n_obs: int):
    """Per-block LR Greek partials, shape ``(n_blocks, M, 8)``."""
    dtype = plan.jdtype
    par = jnp.asarray(par, dtype)
    m = par.shape[1]
    at = lambda r, i: par[r, i]
    shape = (plan.rows, LANES)
    step = _bb_greek_step(at, m)
    n_sums = m * N_BB_GREEK_SUMS

    def walk(z_seq, sgn):
        def body(j, carry):
            return step(j, sgn * z_seq[j], carry)

        carry = jax.lax.fori_loop(0, n_obs, body,
                                  _bb_greek_init(at, m, shape, dtype))
        return _bb_greek_tiles(carry, at, m)

    def block_fn(bkey):
        def body(i, carry):
            ikey = jax.random.fold_in(bkey, i)
            z_seq = jax.random.normal(ikey, (n_obs,) + shape, dtype)
            tiles = walk(z_seq, jnp.asarray(1.0, dtype))
            if plan.antithetic:
                tiles_m = walk(z_seq, jnp.asarray(-1.0, dtype))
                tiles = [0.5 * (a + b) for a, b in zip(tiles, tiles_m)]
            return acc_add_n(carry, _bb_greek_sums(tiles), plan.kahan)

        carry = jax.lax.fori_loop(0, plan.iters, body,
                                  acc_init_n(n_sums, dtype, plan.kahan))
        return jnp.stack(acc_final_n(carry, plan.kahan)).reshape(
            m, N_BB_GREEK_SUMS)

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


def _bb_greeks_kernel(seed_ref, off_ref, par_ref, out_ref, *, plan: Plan,
                      n_obs: int, m: int):
    at = lambda r, i: par_ref[r, i]
    shape = (plan.rows, LANES)
    b = pl.program_id(0)
    step = _bb_greek_step(at, m)
    n_sums = m * N_BB_GREEK_SUMS

    def walk(i, sgn):
        seed_prng(seed_ref[0],
                  (off_ref[0] + b) * jnp.int32(plan.iters) + i)
        carry = walk_pairwise(shape, n_obs,
                              lambda j, z, c: step(j, sgn * z, c),
                              _bb_greek_init(at, m, shape))
        return _bb_greek_tiles(carry, at, m)

    def body(i, carry):
        tiles = walk(i, 1.0)
        if plan.antithetic:
            tiles_m = walk(i, -1.0)
            tiles = [0.5 * (a + b2) for a, b2 in zip(tiles, tiles_m)]
        return acc_add_n(carry, _bb_greek_sums(tiles), plan.kahan)

    carry = jax.lax.fori_loop(0, plan.iters, body,
                              acc_init_n(n_sums, jnp.float32, plan.kahan))
    vals = acc_final_n(carry, plan.kahan)
    for j in range(m):
        for i in range(N_BB_GREEK_SUMS):
            out_ref[0, j, i] = vals[j * N_BB_GREEK_SUMS + i]


def greek_pallas_partials(par, seed, block_offset, plan: Plan,
                          n_blocks: int, n_obs: int,
                          interpret: bool = False):
    """Per-block LR Greek partials ``(n_blocks, M, 8)``, fused on TPU."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        par = jnp.asarray(par, jnp.float32)
        m = par.shape[1]
        seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
        off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))
        kernel = functools.partial(_bb_greeks_kernel, plan=plan,
                                   n_obs=n_obs, m=m)
        paths_iter = plan.rows * LANES * (2 if plan.antithetic else 1)
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
            out_specs=pl.BlockSpec((1, m, N_BB_GREEK_SUMS),
                                   lambda b: (b, 0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((n_blocks, m, N_BB_GREEK_SUMS),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=GRID_SEMANTICS,
            ),
            cost_estimate=pl.CostEstimate(
                flops=plan.iters * paths_iter * (n_obs * (7 + 3 * m)
                                                 + 14 * m),
                bytes_accessed=n_blocks * m * N_BB_GREEK_SUMS * 4,
                transcendentals=plan.iters * paths_iter
                * (4 * n_obs + m),
            ),
            interpret=interpret_arg(interpret),
        )(seed_arr, off_arr, par)
