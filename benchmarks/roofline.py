"""Roofline for the fused walk kernels: measured VPU ceilings vs achieved.

Round-2 review: "no roofline/MFU evidence behind the headline number".
This script derives per-op ceilings EMPIRICALLY on the real chip and then
prices each production kernel against an analytic per-path op budget.

Methodology (designed around the tunnel's known timing hazards — bogus
near-instant completions and multi-ms dispatch jitter, RESULTS_r2.md):

1. **k-differencing.**  Every op cost is the *difference* between two
   otherwise-identical Pallas chain kernels running ``k_hi`` vs ``k_lo``
   applications of the op per loop iteration.  Loop control, PRNG seeding,
   the final reduction epilogue, call dispatch, and tunnel round-trip
   overhead are identical in both variants, so they cancel exactly; what
   remains is ``(k_hi - k_lo)`` marginal op applications.
2. **Chained unique dispatch, fetch-closed clock.**  Each timed call's
   argument is derived from the previous call's output, so the REPS calls
   serialize on-device; every argument is unique (a counter is mixed in)
   so no execution can be served from any cache; and the clock is closed
   by fetching the final result's BYTES to the host.  The fetch is the
   load-bearing part: through the axon tunnel ``jax.block_until_ready``
   returns before execution (measured: a 1e9-path kernel "completes" in
   0.1 ms by that barrier, then a value fetch blocks ~50 ms for the real
   run).  Two earlier revisions of this script trusted the barrier and
   measured physically impossible throughputs.
3. **Self-consistency gates.**  Each variant is timed ``RUNS`` times and the
   median taken; the hi/lo timing ratio must exceed 1.15 or the measurement
   is flagged unreliable in the output (a bogus-completion symptom).

Op chains run on full (ROWS, 128) f32 tiles — 32768 independent lanes per
application — so they measure *throughput*, not instruction latency.
Composite units (Box-Muller normal pair, Hastings cnd) are measured the
same way so kernel budgets can be expressed in the units the kernels
actually execute.

Run on a real TPU: ``python benchmarks/roofline.py``.  Writes
benchmarks/roofline_results.json; benchmarks/ROOFLINE.md narrates the
recorded numbers.
"""
import functools
import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS = 256
BLOCKS = 128
ITERS = 1024
REPS = 4    # chained calls per timing
RUNS = 5    # timings per variant; median reported


def _nudge(arg0, n: int):
    """A unique-but-equivalent variant of ``arg0`` for call number ``n``."""
    if jnp.issubdtype(arg0.dtype, jnp.integer):
        return arg0 + n  # a different PRNG seed costs the same
    # <= 1e-2 perturbation: unique at f32 near O(1) values, and far too
    # small to move any op out of its domain or change its speed.
    return arg0 + n * 1e-5


def _fetch(out):
    """HONEST completion barrier: pull real bytes to the host.

    Through the axon tunnel ``jax.block_until_ready`` returns before the
    device has executed anything (measured: a 1e9-path kernel "completes"
    in 0.1 ms by that barrier, then a value fetch blocks for the full
    50 ms of real execution).  Only materializing the result data proves
    the computation ran.
    """
    return np.asarray(jax.tree.leaves(out)[0])


def _time_once(fn, arg0, counter):
    out = fn(_nudge(arg0, next(counter)))  # unique warmup arg
    _fetch(out)  # drains any queue backlog too
    t0 = time.perf_counter()
    for _ in range(REPS):
        leaf = jax.tree.leaves(out)[0]
        # Chained (depends on previous output) AND unique per call: the
        # REPS calls serialize on-device; one final fetch closes the clock.
        arg = _nudge(arg0, next(counter)) + (
            leaf.flatten()[0] * 0).astype(arg0.dtype)
        out = fn(arg)
    _fetch(out)
    return (time.perf_counter() - t0) / REPS


def _time(fn, arg0):
    """Median of RUNS chained timings; also returns the relative spread.

    Every call across every run gets a unique argument (a shared counter
    drives the nudge) so no two executions are ever identical.
    """
    import itertools
    counter = itertools.count(1)
    ts = sorted(_time_once(fn, arg0, counter) for _ in range(RUNS))
    med = statistics.median(ts)
    # Trimmed spread (worst run dropped): the tunnel occasionally stalls a
    # single dispatch for hundreds of ms; the median is robust to it and
    # one outlier should not flag an otherwise-stable measurement.
    spread = (ts[-2] - ts[0]) / med if med > 0 else float("inf")
    return med, spread


# ---------------------------------------------------------------------------
# Op chains (k-differenced)
# ---------------------------------------------------------------------------

def _chain_kernel(x_ref, out_ref, *, op, k: int):
    def body(i, x):
        for _ in range(k):
            x = op(x)
        return x

    x = jax.lax.fori_loop(0, ITERS, body, x_ref[...])
    out_ref[pl.program_id(0), 0] = jnp.sum(x)


def _chain_fn(op, k: int):
    kern = functools.partial(_chain_kernel, op=op, k=k)
    return jax.jit(lambda x: pl.pallas_call(
        kern,
        grid=(BLOCKS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((BLOCKS, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x))


def _measure_op(op, label: str, x0: float, k_lo: int = 2, k_hi: int = 10):
    """Marginal sustained op/s from the k_hi-vs-k_lo timing difference."""
    x = jnp.full((ROWS, LANES), x0, jnp.float32)
    t_lo, sp_lo = _time(_chain_fn(op, k_lo), x)
    t_hi, sp_hi = _time(_chain_fn(op, k_hi), x)
    ratio = t_hi / t_lo if t_lo > 0 else float("inf")
    ops = BLOCKS * ITERS * (k_hi - k_lo) * ROWS * LANES
    rate = ops / (t_hi - t_lo) if t_hi > t_lo else float("nan")
    ok = ratio > 1.15 and max(sp_lo, sp_hi) < 0.5
    print(f"  {label:24s} {rate/1e9:9.1f} Gop/s   "
          f"(t_lo {t_lo*1e3:7.2f} ms, t_hi {t_hi*1e3:7.2f} ms, "
          f"ratio {ratio:4.2f}, spread {max(sp_lo, sp_hi):4.2f}"
          f"{', UNRELIABLE' if not ok else ''})")
    return {"gops": rate / 1e9, "t_lo_ms": t_lo * 1e3, "t_hi_ms": t_hi * 1e3,
            "hi_lo_ratio": round(ratio, 3),
            "spread": round(max(sp_lo, sp_hi), 3), "reliable": ok}


# ---------------------------------------------------------------------------
# PRNG + Box-Muller composite chains (draw-count differenced)
# ---------------------------------------------------------------------------

def _prng_kernel(seed_ref, out_ref, *, d: int, bm: bool):
    from mctpu.kernels.common import seed_prng
    seed_prng(seed_ref[0], pl.program_id(0))
    if bm:
        from mctpu import rng as mcrng

        def body(i, acc):
            for _ in range(d):
                b1 = pltpu.bitcast(pltpu.prng_random_bits((ROWS, LANES)),
                                   jnp.uint32)
                b2 = pltpu.bitcast(pltpu.prng_random_bits((ROWS, LANES)),
                                   jnp.uint32)
                z1, z2 = mcrng.box_muller(b1, b2)
                acc = acc + z1 + z2  # consume both branches (2 adds/pair)
            return acc

        acc = jax.lax.fori_loop(0, ITERS, body,
                                jnp.zeros((ROWS, LANES), jnp.float32))
        out_ref[pl.program_id(0), 0] = jnp.sum(acc)
    else:
        def body(i, acc):
            for _ in range(d):
                acc = acc ^ pltpu.bitcast(pltpu.prng_random_bits(
                    (ROWS, LANES)), jnp.uint32)
            return acc

        acc = jax.lax.fori_loop(0, ITERS, body,
                                jnp.zeros((ROWS, LANES), jnp.uint32))
        out_ref[pl.program_id(0), 0] = jnp.sum(
            pltpu.bitcast(acc, jnp.int32)).astype(jnp.float32)


def _measure_draws(label: str, bm: bool, d_lo: int = 1, d_hi: int = 3):
    """Marginal draw (or normal-pair) rate via draw-count differencing."""
    def fn(d):
        kern = functools.partial(_prng_kernel, d=d, bm=bm)
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
    t_lo, sp_lo = _time(fn(d_lo), s)
    t_hi, sp_hi = _time(fn(d_hi), s)
    ratio = t_hi / t_lo if t_lo > 0 else float("inf")
    n = BLOCKS * ITERS * (d_hi - d_lo) * ROWS * LANES
    rate = n / (t_hi - t_lo) if t_hi > t_lo else float("nan")
    ok = ratio > 1.15 and max(sp_lo, sp_hi) < 0.5
    unit = "Gpair/s" if bm else "Gword/s"
    print(f"  {label:24s} {rate/1e9:9.1f} {unit}  "
          f"(t_lo {t_lo*1e3:7.2f} ms, t_hi {t_hi*1e3:7.2f} ms, "
          f"ratio {ratio:4.2f}{', UNRELIABLE' if not ok else ''})")
    return {("gpairs" if bm else "gwords"): rate / 1e9,
            "t_lo_ms": t_lo * 1e3, "t_hi_ms": t_hi * 1e3,
            "hi_lo_ratio": round(ratio, 3),
            "spread": round(max(sp_lo, sp_hi), 3), "reliable": ok}


def measure_ceilings():
    from mctpu import math as mcmath
    print(f"marginal op throughputs (k-differenced chains on "
          f"({ROWS},{LANES}) f32 tiles):")
    c = {}
    c["fma"] = _measure_op(lambda x: x * 0.9999 + 1e-7, "fma", 0.5,
                           k_lo=8, k_hi=40)
    c["exp"] = _measure_op(lambda x: jnp.exp(-x), "exp(-x)", 0.5)
    c["log"] = _measure_op(lambda x: jnp.log(x + 1.0), "log(x+1)", 0.5)
    c["sqrt"] = _measure_op(lambda x: jnp.sqrt(x + 1.0), "sqrt(x+1)", 0.5)
    c["divide"] = _measure_op(lambda x: 2.0 / (x + 1.5), "divide", 0.5)
    c["rsqrt"] = _measure_op(lambda x: jax.lax.rsqrt(x + 1.0), "rsqrt", 0.5)
    c["cos"] = _measure_op(jnp.cos, "cos", 0.5)

    def _folded(x):
        from mctpu.rng import sincos_2pi_bits
        cc, ss = sincos_2pi_bits(jax.lax.bitcast_convert_type(x, jnp.uint32))
        return cc + 0.5 * ss
    c["sincos_folded"] = _measure_op(_folded, "sincos_2pi folded pair", 0.5,
                                     k_lo=1, k_hi=5)
    c["erfinv"] = _measure_op(lambda x: jax.lax.erf_inv(x) * 0.5 + 0.1,
                              "erf_inv (+1 fma)", 0.3)
    c["cnd"] = _measure_op(
        lambda x: mcmath.norm_cdf_hastings(x) * 0.5 + 0.1,
        "cnd Hastings (+1 fma)", 0.4, k_lo=1, k_hi=5)
    c["prng_u32"] = _measure_draws("prng_random_bits u32", bm=False)
    c["normal_pair"] = _measure_draws("Box-Muller normal pair", bm=True)
    return c


# ---------------------------------------------------------------------------
# Production kernel rates (the real shipped kernels, real geometry)
# ---------------------------------------------------------------------------

def kernel_rates():
    from mctpu import math as mcmath
    from mctpu.kernels import basket as kbasket
    from mctpu.kernels import cva as kcva
    from mctpu.kernels import greeks as kgreeks
    from mctpu.kernels import heston as kheston
    from mctpu.kernels import lsm as klsm
    from mctpu.kernels import vanilla as kvanilla
    from mctpu.types import (BasketOption, CvaPortfolioSpec, CvaSpec,
                             HestonOption, VanillaOption)

    opt = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0)
    rates = {}

    def record(name, fn, arg0, units):
        dt, spread = _time(jax.jit(fn), arg0)
        rates[name] = (units / dt, units, dt, spread)

    # Workloads sized so each call runs >= ~300 ms: the tunnel adds
    # 10s-of-ms scheduling noise per chained fetch window, which at
    # sub-100ms calls depressed measured rates by 10-30%.
    plan = kvanilla.make_plan(1 << 35, 512, 256, antithetic=False)
    record("vanilla",
           lambda s: kvanilla.pallas_partials(opt, s, 0, plan, 512),
           jnp.int32(42), plan.total_paths)

    gplan = kgreeks.make_plan(1 << 34, 512, 256, antithetic=False)
    record("greeks_vanilla",
           lambda s: kgreeks.pallas_partials(opt, s, 0, gplan, 512),
           jnp.int32(42), gplan.total_paths)

    bopt = BasketOption.default_reference(3)
    chol = mcmath.cholesky_lower(jnp.asarray(np.asarray(bopt.corr),
                                             jnp.float32))
    bplan = kbasket.make_plan(1 << 33, 512, 256, antithetic=False,
                              n_assets=3)
    record("basket3",
           lambda s: kbasket.pallas_partials(bopt, chol, s, 0, bplan, 512),
           jnp.int32(42), bplan.total_paths)

    spec = CvaPortfolioSpec.from_single(
        CvaSpec(intensity=0.03, lgd=0.6,
                option=VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0),
                n_grid=500))
    # rows=128: the serial walk is latency-bound below ~128 rows (see
    # walk_geometry_r3.json); the engine's auto_shrink now keeps tiles
    # this wide at real workloads.
    cplan = kcva.make_plan(1 << 23, 512, 128, antithetic=False)
    record("cva500",
           lambda s: kcva.pallas_partials(spec, s, 0, cplan, 512),
           jnp.int32(42), cplan.total_paths * 500)

    hopt = HestonOption(s=100.0, k=100.0, r=0.03, t=1.0, v0=0.04, kappa=1.5,
                        theta=0.04, xi=0.5, rho=-0.7)
    hplan = kheston.make_plan(1 << 24, 512, 32, antithetic=False)
    record("heston_qe100",
           lambda s: kheston.pallas_partials(hopt, s, 0, hplan, 512, 100,
                                             scheme="qe"),
           jnp.int32(42), hplan.total_paths * 100)

    for k, (r, n, dt, sp) in rates.items():
        print(f"  {k:16s} {r/1e9:8.2f} G/s   ({n:.3g} units, "
              f"{dt*1e3:7.1f} ms, spread {sp:4.2f})")
    return rates


def main():
    assert jax.default_backend() == "tpu", "run on a real TPU"
    ceilings = measure_ceilings()
    print("kernel rates:")
    rates = kernel_rates()

    # Per-unit op budgets (analytic, from the kernel source; composite units
    # where measured — normal pairs and Hastings cnd count as one unit each).
    # "vop" = plain vector op (add/mul/select/compare), priced at fma rate.
    budgets = {
        # vanilla path (vanilla.py:_payoffs): both BM branches used, so each
        # path is half a pair; 1 exp; mu+sig*z, s0*·, ·-k, max, p*p, 2 tile-
        # reduce adds ≈ 7 vops.
        "vanilla": {"normal_pair": 0.5, "exp": 1.0, "fma": 7},
        # greeks path (kernels/greeks.py): vanilla + delta/vega/rho/theta
        # integrands (~6 fma) + the mixed PW-LR gamma integrand (~2 vops)
        # + 12 accumulator tile-reductions amortized (~12 extra vops incl.
        # squares).
        "greeks_vanilla": {"normal_pair": 0.5, "exp": 1.0, "fma": 28},
        # basket path (kernels/basket.py asset-major, a=3): a/2 = 1.5 pairs
        # per path (every Box-Muller branch feeds a path tile), a = 3 exps,
        # lower-tri correlation a(a+1)/2 = 6 FMAs + 2a arg FMAs + a
        # accumulates + payoff/reduce ~ 21 vops.  No MXU at small a.
        "basket3": {"normal_pair": 1.5, "exp": 3.0, "fma": 21},
        # cva step (kernels/cva.py walk_pairwise, log-space): half a pair
        # per step; ONE exp (recover s from the carried log-spot — d1/d2,
        # the sqrt and the discount come from per-node constant tables);
        # Hastings cnd x2 (measured composite); ~14 vops (log-walk fma,
        # d1/d2 fma, payoff combine, dp weight, profile row adds).
        "cva500": {"normal_pair": 0.5, "exp": 1.0, "cnd": 2.0, "fma": 14},
        # heston QE step (mctpu/models/heston.py qe_step): 1 pair (2
        # normals: vol + spot); 1 cnd (uniform for the exponential branch);
        # 3 sqrt (fused b2 product, b, diffusion); ~0.5 log + 0.3 exp
        # (exponential branch, ~prob-weighted); 4 divisions (measured as
        # their own op class — a divide costs ~6 fma slots) + ~32 vops of
        # branch algebra and selects.
        "heston_qe100": {"normal_pair": 1.0, "exp": 0.3, "cnd": 1.0,
                         "sqrt": 3.0, "log": 0.5, "divide": 4.0, "fma": 32},
    }

    key_for = {"normal_pair": "gpairs", "prng_u32": "gwords"}
    print("\nroofline (ceiling = 1 / sum(count_i / rate_i)):")
    report = {
        "method": "k-differenced marginal op chains; chained dispatch; "
                  "median of %d runs" % RUNS,
        "ceilings": {k: v for k, v in ceilings.items()},
        "kernels": {},
    }
    for name, (rate, n, dt, spread) in rates.items():
        b = budgets[name]
        t_unit = 0.0
        reliable = True
        for op, cnt in b.items():
            rec = ceilings[op]
            gops = rec.get("gops") or rec.get(key_for.get(op, ""), None)
            t_unit += cnt / (gops * 1e9)
            reliable = reliable and rec["reliable"]
        ceiling = 1.0 / t_unit
        mfu = rate / ceiling
        flag = "" if reliable else "  [ceiling from UNRELIABLE op measure]"
        print(f"  {name:16s} achieved {rate/1e9:8.2f} G/s   "
              f"op-budget ceiling {ceiling/1e9:8.2f} G/s   "
              f"-> {100*mfu:5.1f}% of ceiling{flag}")
        report["kernels"][name] = {
            "achieved_gps": rate / 1e9,
            "ceiling_gps": ceiling / 1e9,
            "pct_of_ceiling": round(100 * mfu, 1),
            "budget": b,
            "ms": dt * 1e3,
            "timing_spread": round(spread, 3),
            "ceiling_reliable": reliable,
        }

    with open("benchmarks/roofline_results.json", "w") as f:
        json.dump(report, f, indent=1)
    print("\nwrote benchmarks/roofline_results.json")


if __name__ == "__main__":
    main()
