"""Round-5: measured-composition ceilings for the five 85-88% kernels.

Round-4 review (VERDICT weak #3 / next-step #2): five kernels sit at
85-88% of ceilings "whose only evidence is source-counted op budgets" —
rainbow2_greeks, asian_greeks10, basket_asian3_greeks, cva_multi2_price,
varswap_heston252_greeks.  Round 4 itself proved source counts can be
wrong in both directions (the QE "76%" became 100% once divides were
*measured*).  This script extends that methodology two ways:

1. **Every op class is measured** (``measure_classes``) — including the
   classes the old budgets priced blind at the fma rate: plain adds,
   compare+select pairs, max(x-c,0) payoff clamps, full-tile reductions
   and fused square-reductions — at each tile geometry the five kernels
   actually run (256/64/32 rows; serial walk kernels are latency-bound
   at narrow tiles, so a 256-row rate overprices a 32-row kernel).
2. **Each kernel's composition is measured as a whole**
   (``measure_compositions``): the kernel's own step/path math —
   imported from the kernel module, constants inlined, no Pallas
   scaffold, no payoff beyond what the step itself carries — runs in the
   k-differenced chain harness (ROOFLINE.md methodology) at the kernel's
   benchmarked geometry.  The marginal per-step rate of that idealized
   body IS the composition ceiling: it prices exactly the required op
   mix, including dependency-chain latency and class-mixing effects
   that no additive class-sum can see.

The final table re-prices each kernel's achieved rate (greeks_r4.json)
against BOTH the measured-composition ceiling and the class-sum
rebuild, so the old "~N vec ops" lines are replaced by measured
evidence in either direction.

Run on a real TPU: ``python -m benchmarks.opcomp_r5``.  Writes
``benchmarks/opcomp_r5.json``.
"""
import functools
import json
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.roofline import (BLOCKS, ITERS, LANES, _chain_fn, _time)
from mctpu.kernels.common import draw_normal_pair, seed_prng

KLO, KHI = 2, 6


# ---------------------------------------------------------------------------
# Part A: op classes at the kernels' tile geometries
# ---------------------------------------------------------------------------

def _measure_rows(op, label, x0, rows, k_lo=2, k_hi=10):
    """roofline._measure_op at a parametric tile height."""
    x = jnp.full((rows, LANES), x0, jnp.float32)
    t_lo, sp_lo = _time(_chain_fn(op, k_lo), x)
    t_hi, sp_hi = _time(_chain_fn(op, k_hi), x)
    ratio = t_hi / t_lo if t_lo > 0 else float("inf")
    ops = BLOCKS * ITERS * (k_hi - k_lo) * rows * LANES
    rate = ops / (t_hi - t_lo) if t_hi > t_lo else float("nan")
    ok = ratio > 1.15 and max(sp_lo, sp_hi) < 0.5
    print(f"  [{rows:3d} rows] {label:22s} {rate/1e9:9.1f} Gop/s  "
          f"(ratio {ratio:4.2f}{'' if ok else ', UNRELIABLE'})", flush=True)
    return {"gops": rate / 1e9, "rows": rows,
            "hi_lo_ratio": round(ratio, 3), "reliable": ok}


def _reduce_chain_kernel(x_ref, out_ref, *, k: int, square: bool):
    def body(i, carry):
        x, acc = carry
        for _ in range(k):
            x = x * 0.9999 + 1e-7  # 1 fma keeps the tile moving
            acc = acc + (jnp.sum(x * x) if square else jnp.sum(x))
        return x, acc

    x, acc = jax.lax.fori_loop(0, ITERS, body,
                               (x_ref[...], jnp.float32(0.0)))
    out_ref[pl.program_id(0), 0] = acc + jnp.sum(x)


def _measure_reduce(rows, square: bool, fma_gops: float):
    """Marginal per-ELEMENT cost of a full-tile reduction (the carrier
    fma's measured cost is subtracted)."""
    def fn(k):
        kern = functools.partial(_reduce_chain_kernel, k=k, square=square)
        return jax.jit(lambda x: pl.pallas_call(
            kern,
            grid=(BLOCKS,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((BLOCKS, 1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x))

    x = jnp.full((rows, LANES), 0.5, jnp.float32)
    t_lo, _ = _time(fn(2), x)
    t_hi, _ = _time(fn(10), x)
    n = BLOCKS * ITERS * 8 * rows * LANES
    t_unit = (t_hi - t_lo) / n            # fma + reduce, per element
    t_red = t_unit - 1.0 / (fma_gops * 1e9)
    rate = 1.0 / t_red if t_red > 0 else float("inf")
    label = "square-reduce" if square else "reduce"
    print(f"  [{rows:3d} rows] {label:22s} {rate/1e9:9.1f} Gelem/s  "
          f"(unit {1e-9/t_unit:.1f}G incl. carrier fma)", flush=True)
    return {"gops": rate / 1e9, "rows": rows,
            "carrier_fma_gops": fma_gops,
            "reliable": t_hi / t_lo > 1.15}


def _pair_chain_kernel(seed_ref, out_ref, *, d: int, rows: int):
    seed_prng(seed_ref[0], pl.program_id(0))
    shape = (rows, LANES)

    def body(i, acc):
        for q in range(d):
            z1, z2 = draw_normal_pair(shape, i * d + q)
            acc = acc + z1 + z2
        return acc

    acc = jax.lax.fori_loop(0, ITERS, body, jnp.zeros(shape, jnp.float32))
    out_ref[pl.program_id(0), 0] = jnp.sum(acc)


def _measure_pair(rows):
    def fn(d):
        kern = functools.partial(_pair_chain_kernel, d=d, rows=rows)
        return jax.jit(lambda s: pl.pallas_call(
            kern,
            grid=(BLOCKS,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((BLOCKS, 1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(s))

    s = jnp.int32([7])
    t_lo, _ = _time(fn(1), s)
    t_hi, _ = _time(fn(3), s)
    n = BLOCKS * ITERS * 2 * rows * LANES
    rate = n / (t_hi - t_lo) if t_hi > t_lo else float("nan")
    print(f"  [{rows:3d} rows] {'normal pair':22s} {rate/1e9:9.1f} "
          f"Gpair/s", flush=True)
    return {"gpairs": rate / 1e9, "rows": rows,
            "reliable": t_hi / t_lo > 1.15}


def measure_classes():
    from mctpu import math as mcmath
    out = {}

    def at(rows, name, op, x0, **kw):
        out[f"{name}@{rows}"] = _measure_rows(op, name, x0, rows, **kw)

    fma = lambda x: x * 0.9999 + 1e-7
    print("op classes (k-differenced chains):", flush=True)
    for rows in (256, 64, 32):
        at(rows, "fma", fma, 0.5, k_lo=8, k_hi=40)
        at(rows, "exp", lambda x: jnp.exp(-x), 0.5)
        out[f"normal_pair@{rows}"] = _measure_pair(rows)
    for rows in (256, 64):
        at(rows, "cnd",
           lambda x: mcmath.norm_cdf_hastings(x) * 0.5 + 0.1, 0.4,
           k_lo=1, k_hi=5)
        out[f"reduce@{rows}"] = _measure_reduce(
            rows, False, out[f"fma@{rows}"]["gops"])
    out["square_reduce@256"] = _measure_reduce(
        256, True, out["fma@256"]["gops"])
    for rows in (32,):
        at(rows, "sqrt", lambda x: jnp.sqrt(x + 1.0), 0.5)
        at(rows, "rsqrt", lambda x: jax.lax.rsqrt(x + 1.0), 0.5)
    # classes the old budgets priced blind at the fma rate, 256 rows:
    at(256, "add", lambda x: x + 1e-7, 0.5, k_lo=8, k_hi=40)
    at(256, "cmpsel_add",  # where(cmp) + 1 add: price cmp+select as
       #                     (1/rate - 1/add_rate)
       lambda x: jnp.where(x > 0.35, x, x + 1e-7), 0.3, k_lo=4, k_hi=20)
    at(256, "max0_add",    # max(x-c,0)+c: sub+max+add
       lambda x: jnp.maximum(x - 0.35, 0.0) + 0.35, 0.5, k_lo=4, k_hi=20)
    return out


# ---------------------------------------------------------------------------
# Part B: whole-composition chains (the kernels' own math, idealized)
# ---------------------------------------------------------------------------

def _comp_chain_fn(unit, init_fn, k: int, iters: int):
    """Chain harness with an arbitrary pytree carry.

    ``unit(ctr, carry) -> carry`` is one application of the composition
    (real PRNG draws included); ``init_fn()`` builds the carry.  Every
    leaf of the final carry is consumed so nothing is DCE'd.
    """
    def kern(seed_ref, out_ref):
        seed_prng(seed_ref[0], pl.program_id(0))

        def body(i, carry):
            c = carry
            for q in range(k):
                c = unit(i * k + q, c)
            return c

        carry = jax.lax.fori_loop(0, iters, body, init_fn())
        acc = jnp.float32(0.0)
        for leaf in jax.tree.leaves(carry):
            leaf = jnp.asarray(leaf)
            acc = acc + (jnp.sum(leaf) if leaf.ndim else leaf)
        out_ref[pl.program_id(0), 0] = acc

    return jax.jit(lambda s: pl.pallas_call(
        kern,
        grid=(BLOCKS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((BLOCKS, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(s))


def _measure_comp(name, unit, init_fn, iters: int, work_per_unit: int):
    """Marginal composition rate via KHI-vs-KLO differencing."""
    s = jnp.int32([7])
    t_lo, sp_lo = _time(_comp_chain_fn(unit, init_fn, KLO, iters), s)
    t_hi, sp_hi = _time(_comp_chain_fn(unit, init_fn, KHI, iters), s)
    n = BLOCKS * iters * (KHI - KLO) * work_per_unit
    rate = n / (t_hi - t_lo) if t_hi > t_lo else float("nan")
    ratio = t_hi / t_lo if t_lo > 0 else float("inf")
    ok = ratio > 1.15 and max(sp_lo, sp_hi) < 0.5
    print(f"  {name:28s} {rate/1e9:8.2f} G/s   (t_lo {t_lo*1e3:6.1f} ms, "
          f"t_hi {t_hi*1e3:6.1f} ms, ratio {ratio:4.2f}"
          f"{'' if ok else ', UNRELIABLE'})", flush=True)
    return {"ceiling_gps": rate / 1e9, "t_lo_ms": t_lo * 1e3,
            "t_hi_ms": t_hi * 1e3, "hi_lo_ratio": round(ratio, 3),
            "reliable": ok}


def comp_asian_greeks():
    """asian_greeks10_64: both Box-Muller branches each advance a path
    tile through the kernel's own ``_greek_step`` (kernels/asian.py).
    Unit = 1 pair -> 2 path-steps."""
    from mctpu.kernels.asian import _greek_step
    rows = 256
    shape = (rows, LANES)
    s0, kk, r, v, t, n_obs = 100.0, 100.0, 0.05, 0.2, 1.0, 64
    dt = t / n_obs
    # Python/NumPy scalars only: jax-array closures would trip the
    # pallas captured-constant check (the real kernel reads these from
    # SMEM operands, hoisted out of the loop — equivalent cost).
    drift = np.float32((r - 0.5 * v * v) * dt)
    vol = np.float32(v * math.sqrt(dt))
    inv_v = np.float32(1.0 / v)
    c1 = np.float32(-(r + 0.5 * v * v) * dt / v)
    log_s0 = np.float32(math.log(s0))
    step = _greek_step(log_s0, drift, vol, inv_v, c1, np.float32(dt),
                       geometric=False)

    def one():
        z = jnp.zeros(shape, jnp.float32)
        return (jnp.full(shape, log_s0, jnp.float32), z, z, z, z,
                c1, np.float32(dt))

    def unit(ctr, carry):
        ca, cb = carry
        z1, z2 = draw_normal_pair(shape, ctr)
        return step(0, z1, ca, 1.0), step(0, z2, cb, 1.0)

    return _measure_comp("asian_greeks10_64", unit,
                         lambda: (one(), one()), 512, 2 * rows * LANES)


def comp_rainbow_greeks():
    """rainbow2_greeks: the kernel's own ``_greek_sums`` (kernels/
    rainbow.py) — 2 paths, 14 full-tile reductions, scalar accumulate.
    Unit = 2 draws -> 2 paths."""
    from mctpu.kernels.rainbow import _greek_sums
    rows = 256
    shape = (rows, LANES)
    s = np.array([100.0, 95.0])
    v = np.array([0.2, 0.3])
    corr = np.array([[1.0, 0.5], [0.5, 1.0]])
    lt = np.linalg.cholesky(corr)
    kk, r, t = 100.0, 0.05, 1.0
    par = np.stack([(r - 0.5 * v * v) * t, v * math.sqrt(t), s])
    inv_s0 = 1.0 / s

    def unit(ctr, sums):
        z1a, z1b = draw_normal_pair(shape, 2 * ctr)
        z2a, z2b = draw_normal_pair(shape, 2 * ctr + 1)
        row = _greek_sums([z1a, z2a], [z1b, z2b],
                          lambda i, j: float(lt[i, j]),
                          lambda rr, i: float(par[rr, i]),
                          lambda i: float(inv_s0[i]), kk, 2,
                          math.sqrt(t), t, r, use_min=False,
                          antithetic=False)
        return tuple(a + b for a, b in zip(sums, row))

    init = lambda: tuple(jnp.float32(0.0) for _ in range(14))
    return _measure_comp("rainbow2_greeks", unit, init, 512,
                         2 * rows * LANES)


def comp_varswap_heston():
    """varswap_heston252_greeks: the kernel's own Heston tangent step
    (kernels/heston.py ``_greek_step``) + the varswap dacc chain, at the
    kernel's 32-row geometry.  Unit = 1 pair -> 1 path-step."""
    from mctpu.kernels.heston import _greek_step, _greek_tangent_init
    rows = 32
    shape = (rows, LANES)
    v0, kap, th, xi, rho, r, t, n_obs = (0.04, 1.5, 0.04, 0.5, -0.7,
                                         0.03, 1.0, 252)
    dt = t / n_obs
    k_dt = np.float32(kap * dt)
    thj = np.float32(th)
    xij = np.float32(xi)
    rho_c = np.float32(rho)
    rho_s = np.float32(math.sqrt(1.0 - rho * rho))
    r_dt = np.float32(r * dt)
    sqdt = np.float32(math.sqrt(dt))
    half_dt = np.float32(0.5 * dt)
    dtj = np.float32(dt)

    def init():
        zero = jnp.zeros(shape, jnp.float32)
        return (zero, jnp.full(shape, v0, jnp.float32),
                _greek_tangent_init(shape, jnp.float32), zero, zero,
                (zero, zero, zero, zero))

    def unit(ctr, carry):
        x, v, tg, acc2, acc1, dacc = carry
        z_v, z_perp = draw_normal_pair(shape, ctr)
        x_new, v_new, tg_new = _greek_step(x, v, tg, z_v, z_perp, k_dt,
                                           thj, xij, rho_c, rho_s, r_dt,
                                           sqdt, half_dt, dtj)
        lr = x_new - x
        two_lr = 2.0 * lr
        dacc_new = tuple(d + two_lr * (tg_new[2 * i] - tg[2 * i])
                         for i, d in enumerate(dacc))
        return (x_new, v_new, tg_new, acc2 + lr * lr, acc1 + lr,
                dacc_new)

    return _measure_comp("varswap_heston252_greeks", unit, init, 4096,
                         rows * LANES)


def comp_basket_asian_greeks():
    """basket_asian3_greeks16: the kernel's own asset-major Greek step
    (kernels/multi_walk.py ``_am_greek_step``), 64-row geometry.
    Unit = 3 pairs -> 2 path-steps (a = 3 normals per step)."""
    from mctpu.kernels.multi_walk import _am_greek_init, _am_greek_step
    rows = 64
    shape = (rows, LANES)
    a, n_obs, rho = 3, 16, 0.3
    s = np.full(3, 100.0)
    v = np.array([0.3, 0.2, 0.3])
    w = np.full(3, 1.0 / 3)
    r, t = 0.048790164, 1.0
    corr = np.full((3, 3), rho)
    np.fill_diagonal(corr, 1.0)
    lt = np.linalg.cholesky(corr)
    dt = t / n_obs
    par = np.stack([np.log(s), (r - 0.5 * v * v) * dt, v * math.sqrt(dt),
                    np.zeros(3), w, v * dt, w / n_obs, 1.0 / s])
    lt_at = lambda i, j: float(lt[i, j])
    par_at = lambda rr, i: float(par[rr, i])
    sqdt = np.float32(math.sqrt(dt))
    dtj = np.float32(dt)

    def unit(ctr, carry):
        p1 = draw_normal_pair(shape, 3 * ctr)
        p2 = draw_normal_pair(shape, 3 * ctr + 1)
        p3 = draw_normal_pair(shape, 3 * ctr + 2)
        carry = _am_greek_step(2 * ctr, [p1[0], p1[1], p2[0]], carry,
                               lt_at, par_at, sqdt, dtj, a)
        return _am_greek_step(2 * ctr + 1, [p2[1], p3[0], p3[1]], carry,
                              lt_at, par_at, sqdt, dtj, a)

    init = lambda: _am_greek_init(par_at, a, shape)
    return _measure_comp("basket_asian3_greeks16", unit, init, 1024,
                         2 * rows * LANES)


def comp_cva_multi_price():
    """cva_multi2_price50: the kernel's own asset-major node
    (kernels/cva_multi.py ``_am_quants`` + ``_am_net``) + default-leg
    fma + the EE-profile tile reduction, 64-row geometry.  The node
    tables (dp, tau, sqtau, disc) are scalar SMEM loads in the kernel;
    here tau is carried (so the final-node select stays live) and the
    rest are constants.  Unit = 1 pair -> 1 path-node."""
    from mctpu.kernels.cva_multi import _am_net, _am_quants
    rows = 64
    shape = (rows, LANES)
    m, n_grid = 2, 50
    s = np.array([100.0, 95.0])
    v = np.array([0.2, 0.3])
    kk = np.array([100.0, 90.0])
    w = np.array([1.0, 0.5])
    r, t = 0.05, 1.0
    corr = np.array([[1.0, 0.4], [0.4, 1.0]])
    lt = np.linalg.cholesky(corr)
    dt = t / n_grid
    par = np.stack([np.log(s), (r - 0.5 * v * v) * dt, v * math.sqrt(dt),
                    v * dt, w, kk, np.log(kk), 0.5 * v * v, v])
    lt_at = lambda i, j: float(lt[i, j])
    par_at = lambda rr, i: float(par[rr, i])
    rj = np.float32(r)
    sqtau = np.float32(math.sqrt(0.5))
    disc = np.float32(math.exp(-r * 0.5))
    dp = np.float32(6e-4)
    dtf = np.float32(dt)

    def init():
        xs = tuple(jnp.full(shape, float(np.log(s[i])), jnp.float32)
                   for i in range(m))
        return (xs, jnp.zeros(shape, jnp.float32), np.float32(0.0),
                np.float32(1.0))

    def unit(ctr, carry):
        xs, acc, prof, tau = carry
        z1, z2 = draw_normal_pair(shape, ctr)
        xs, _, _, vals, _, _ = _am_quants([z1, z2], xs, lt_at, par_at,
                                          rj, tau, sqtau, disc, m)
        ee, _ = _am_net(vals)
        return (xs, acc + dp * ee, prof + jnp.sum(ee), tau - dtf)

    return _measure_comp("cva_multi2_price50", unit, init, 1024,
                         rows * LANES)


# ---------------------------------------------------------------------------
# Part C: rebuilt table
# ---------------------------------------------------------------------------

# Exact op enumerations per unit (source-derived, every op named in the
# comments of the composition functions above); priced at the measured
# class rates for the class-sum column of the report.  normal-pair
# counts are per path-step (or path), matching greeks_r4.json budgets.
CLASS_BUDGETS = {
    # per path-step: log_s fma+add, f sub+fma, st mul, 4 accumulator
    # fma/adds, cj/tj scalar adds (vector-free) -> 11 slots + exp +
    # 0.5 pair; per-path epilogue (quants ~25 + 2 div + 10 reduces)
    # amortized over 64 steps.
    "asian_greeks10_64": {"rows": 256, "normal_pair": 0.5, "exp": 1.0,
                          "fma": 11.4, "reduce": 10.0 / 64},
    # per path: chol 3, spots 2x(fma)+2 mul, argext cmp+2sel, ind
    # cmp+sel, p sub+max, per-asset gd cmp+mul+sel / gv 3 / th 2 (x2),
    # th final 2, ri mul, 7 squares fused into square-reduces; 14
    # reductions; 2 exp; 1 pair.
    "rainbow2_greeks": {"rows": 256, "normal_pair": 1.0, "exp": 2.0,
                        "fma": 24.0, "cmpsel": 4.0, "max0": 1.0,
                        "reduce": 7.0, "square_reduce": 7.0},
    # per step: heston tangent step (max, sqrt, rsqrt, 2 cmp, 5 sel,
    # ~27 fma) + varswap dacc chain (~12 fma).
    "varswap_heston252_greeks": {"rows": 32, "normal_pair": 1.0,
                                 "sqrt": 1.0, "rsqrt": 1.0, "fma": 39.0,
                                 "cmpsel": 5.0, "max0": 1.0},
    # per step: chol 6 fma + x 6 + 3 exp + w-term 3 + basket 2 + dxv 6
    # + a_s 3 + a_v 3 + acc/tb 3 + int->float tj cast (scalar);
    # payoff amortized /16 (~2 fma + 1 reduce + cmp/sel/max).
    "basket_asian3_greeks16": {"rows": 64, "normal_pair": 1.5,
                               "exp": 3.0, "fma": 34.0,
                               "cmpsel": 1.0 / 16, "max0": 1.0 / 16,
                               "reduce": 1.0},
    # per node: chol 3 + x 4 + 2 exp + 4 cnd + d1/d2 8 + bs 4 + intr
    # 2 sub + val 2 mul + 2 sel + net add+max + leg fma + 1 reduce.
    "cva_multi2_price50": {"rows": 64, "normal_pair": 1.0, "exp": 2.0,
                           "cnd": 4.0, "fma": 25.0, "cmpsel": 2.0,
                           "max0": 3.0, "reduce": 1.0},
}

# r4 measured rates reused where this script does not re-measure them
# (same chip family; see roofline_results.json).
R4_FALLBACK = {"sqrt": 464.1, "rsqrt": 514.8, "divide": 406.1}


def class_sum_ceiling(budget, classes):
    """1 / sum(count_i / measured_rate_i) with geometry-aware lookup."""
    rows = budget["rows"]

    def rate(op):
        for rr in (rows, 64, 256):
            rec = classes.get(f"{op}@{rr}")
            if rec:
                return rec.get("gops") or rec.get("gpairs")
        return R4_FALLBACK[op]

    add = rate("add")
    t = 0.0
    for op, cnt in budget.items():
        if op == "rows":
            continue
        if op == "cmpsel":
            r_ = 1.0 / (1.0 / rate("cmpsel_add") - 1.0 / add)
        elif op == "max0":
            r_ = 1.0 / (1.0 / rate("max0_add") - 1.0 / add)
        elif op == "normal_pair":
            r_ = rate("normal_pair")
        else:
            r_ = rate(op)
        t += cnt / (r_ * 1e9)
    return 1.0 / t / 1e9


def main():
    assert jax.default_backend() == "tpu", "run on a real TPU"
    classes = measure_classes()
    print("whole-composition chains (the kernels' own step math, "
          "idealized scaffold):", flush=True)
    comps = {
        "asian_greeks10_64": comp_asian_greeks(),
        "rainbow2_greeks": comp_rainbow_greeks(),
        "varswap_heston252_greeks": comp_varswap_heston(),
        "basket_asian3_greeks16": comp_basket_asian_greeks(),
        "cva_multi2_price50": comp_cva_multi_price(),
    }

    with open("benchmarks/greeks_r4.json") as f:
        achieved = json.load(f)
    table = {}
    print("\nre-priced table (achieved vs measured ceilings):")
    for name, comp in comps.items():
        a = achieved[name]
        rate = a.get("gsteps_per_s") or a.get("gpaths_per_s")
        cs = class_sum_ceiling(CLASS_BUDGETS[name], classes)
        pct_comp = 100 * rate / comp["ceiling_gps"]
        pct_cs = 100 * rate / cs
        print(f"  {name:28s} achieved {rate:7.2f}  comp-ceiling "
              f"{comp['ceiling_gps']:7.2f} ({pct_comp:5.1f}%)  "
              f"class-sum {cs:7.2f} ({pct_cs:5.1f}%)")
        table[name] = {
            "achieved_gps": rate,
            "composition_ceiling_gps": comp["ceiling_gps"],
            "pct_of_composition": round(pct_comp, 1),
            "class_sum_ceiling_gps": round(cs, 1),
            "pct_of_class_sum": round(pct_cs, 1),
            "composition_reliable": comp["reliable"],
            "old_r4_pct": a["pct_of_ceiling"],
        }

    report = {
        "what": "Round-5 measured-composition ceilings for the five "
                "85-88% kernels (VERDICT r4 weak #3 / next-step #2)",
        "method": "Part A: every op class k-differenced at the kernels' "
                  "tile geometries; Part B: each kernel's own step math "
                  "(imported, constants inlined, no Pallas scaffold) "
                  "k-differenced as a whole — the composition ceiling "
                  "prices dependency latency and class mixing that "
                  "class sums cannot",
        "classes": classes,
        "compositions": comps,
        "kernels": table,
    }
    with open("benchmarks/opcomp_r5.json", "w") as f:
        json.dump(report, f, indent=1)
    print("wrote benchmarks/opcomp_r5.json")


if __name__ == "__main__":
    main()
