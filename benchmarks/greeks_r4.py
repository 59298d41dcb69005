"""Round-4 Greek-kernel rate measurements (the family-sweep kernels).

Measures the fused Pallas Greek kernels added by the round-4 family
sweep — rainbow, varswap (GBM + Heston), strike ladder, CVA-multi,
basket-Asian and basket-barrier-LR — with honest source-counted op
budgets, using the ROOFLINE.md methodology (fetch-closed chained clock,
best of two jit instances, median of 3).  Run on the real chip:

    python -m benchmarks.greeks_r4

Workloads auto-size: each kernel starts from a small path count and
doubles until a single chained call runs >= 300 ms (the ROOFLINE.md
sizing rule — shorter calls sit inside the axon tunnel's 10s-of-ms
dispatch-noise regime and depress measured rates; the first run of this
script at fixed 20 ms geometries reported the rainbow kernel at 7.7% of
ceiling purely from that artifact).

``--cpu-smoke`` runs tiny shapes on the CPU backend to validate the
measurement plumbing without hardware (rates are meaningless there).
"""
from __future__ import annotations

import json
import math
import sys

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.perf_r4 import _chained_rate, load_ceilings

LANES = 128
SMOKE = "--cpu-smoke" in sys.argv

MIN_CALL_S = 0.30   # ROOFLINE.md sizing rule
PATH_CAP = 1 << 36  # runaway guard for the auto-sizer


def _chol(corr):
    from mctpu import math as mcmath
    return mcmath.cholesky_lower(jnp.asarray(corr, jnp.float64))


def _scalar_chain(base):
    """Chain fn for kernels whose first output is a 2-D partial array."""
    return lambda i, out: (jnp.int32(base + i)
                           + (out[0, 0] * 0).astype(jnp.int32))


def _rate_sized(mk, n0, chain):
    """Auto-sized, overhead-cancelled chained rate.

    ``mk(n)`` returns ``(build_fn, work_per_call)`` for an ``n``-path
    plan.  A 1-rep single-instance probe grows ``n`` until one chained
    call runs >= 300 ms (each resize is one extra compile); the final
    rate is **k-differenced** across the sized geometry and a 4x-smaller
    one — ``(w2 - w1) / (dt2 - dt1)`` — so the fixed per-call dispatch
    cost (tens of ms through the axon tunnel) cancels exactly instead of
    depressing the rate by ~10% even at 300 ms calls.  Both points are
    best-of-two jit instances, 3 reps (ROOFLINE.md methodology).
    """
    n = n0
    while True:
        build, work = mk(n)
        if SMOKE:
            return _chained_rate(build, jnp.int32(7), chain, work,
                                 reps=1, n_instances=1)
        _, dt = _chained_rate(build, jnp.int32(7), chain, work,
                              reps=1, n_instances=1)
        if dt >= MIN_CALL_S or n >= PATH_CAP:
            break
        mult = 1 << max(1, math.ceil(math.log2(1.2 * MIN_CALL_S / dt)))
        n = min(PATH_CAP, n * mult)
    _, dt2 = _chained_rate(build, jnp.int32(7), chain, work)
    build1, work1 = mk(max(n // 4, 1 << 12))
    _, dt1 = _chained_rate(build1, jnp.int32(7), chain, work1)
    if work > work1 and dt2 > dt1:
        return (work - work1) / (dt2 - dt1), dt2
    return work / dt2, dt2  # degenerate sizing; plain rate


def _budget_rate(name, rate, dt, ops, budget_desc, per="path"):
    """Assemble one result row from an op-budget dict."""
    ceil = load_ceilings()
    t = 0.0
    for op, cnt in ops.items():
        t += cnt / ceil[op]
    ceiling = 1.0 / t / 1e9
    return {"kernel": name, f"g{per}s_per_s": rate / 1e9, "dt_s": dt,
            "budget_ceiling": round(ceiling, 1),
            "pct_of_ceiling": round(100 * rate / 1e9 / ceiling, 1),
            "budget": budget_desc}


def rainbow_greeks_rate(geom=(512, 256)):
    from mctpu.kernels import rainbow as krainbow
    from mctpu.types import RainbowOption

    opt = RainbowOption(s=np.array([100.0, 95.0]), v=np.array([0.2, 0.3]),
                        corr=np.array([[1.0, 0.5], [0.5, 1.0]]), k=100.0,
                        r=0.05, t=1.0)
    chol = _chol(opt.corr)
    blocks, rows = (4, 8) if SMOKE else geom

    def mk(n):
        plan = krainbow.make_plan(n, blocks, rows, False, n_assets=2)
        build = lambda seed: krainbow.greek_pallas_partials(
            opt, chol, seed, 0, plan, plan.num_blocks, interpret=SMOKE)
        return build, plan.total_paths

    rate, dt = _rate_sized(mk, 1 << 12 if SMOKE else 1 << 28,
                           _scalar_chain(50))
    # Per path (a = 2): one Box-Muller pair per asset pair of tiles
    # (2 draws), a(a+1)/2 = 3 Cholesky FMAs + 2 exp + arg-extreme selects
    # + ~18 Greek FMAs (delta/vega/rho/theta integrands + 10 accum adds).
    return _budget_rate(
        "rainbow2_greeks", rate, dt,
        {"normal_pair": 1.0, "exp": 2.0, "fma": 28.0},
        "1 normal-pair + 2 exp + ~28 vec ops/path (a=2, 14 sums)")


def varswap_greeks_rate(dynamics, geom=(512, 256)):
    from mctpu.kernels import varswap as kvarswap
    from mctpu.types import HestonOption, VanillaOption

    n_obs = 16 if SMOKE else 252
    if dynamics == "gbm":
        opt = VanillaOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0)
        # GBM Greeks: +1 accumulator over pricing — ~5 vops/step.
        ops = {"normal_pair": 0.5, "fma": 5.0}
        desc = "0.5 normal-pair + ~5 vec ops/step (2 carried sums)"
    else:
        opt = HestonOption(s=100.0, k=100.0, r=0.03, t=1.0, v0=0.04,
                           kappa=1.5, theta=0.04, xi=0.5, rho=-0.7)
        # Tangent walk, full source recount (heston._greek_step + the
        # varswap body): vp-max 1, sq_v 1, dsq guard 3 (mul+cmp+select),
        # m-cmp 1, z_s 2, x-update 3, c_a 1, c_b 2, extras 2, 4 tangent
        # pairs x (select + al FMA + av 2-FMA) = 16, v-update 3  -> ~35;
        # body: lr 1, two_lr 1, dacc 4 x (diff + FMA) = 8, acc2 1,
        # acc1 1 -> ~12.  Total ~47 fma-class + sqrt + rsqrt.
        ops = {"normal_pair": 1.0, "sqrt": 1.0, "rsqrt": 1.0, "fma": 47.0}
        desc = ("1 normal-pair + sqrt + rsqrt + ~47 vec ops/step "
                "(8 tangent pairs, guards/selects counted, + 4 dacc)")
    blocks, rows = (4, 8) if SMOKE else geom

    def mk(n):
        plan = kvarswap.make_plan(n, blocks, rows, False)
        build = lambda seed: kvarswap.greek_pallas_partials(
            opt, seed, 0, plan, plan.num_blocks, n_obs=n_obs,
            dynamics=dynamics, interpret=SMOKE)
        return build, plan.total_paths * n_obs

    rate, dt = _rate_sized(mk, 1 << 12 if SMOKE else 1 << 24,
                           _scalar_chain(60))
    return _budget_rate(f"varswap_{dynamics}{n_obs}_greeks", rate, dt, ops,
                        desc, per="step")


def ladder_greeks_rate(geom=(512, 256)):
    from mctpu.kernels import ladder as kladder
    from mctpu.types import VanillaOption

    opt = VanillaOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0)
    strikes = jnp.linspace(80.0, 120.0, 9)
    blocks, rows = (4, 8) if SMOKE else geom

    def mk(n):
        plan = kladder.make_plan(n, blocks, rows, False)
        build = lambda seed: kladder.greek_pallas_partials(
            opt, strikes, seed, 0, plan, plan.num_blocks, interpret=SMOKE)
        return build, plan.total_paths

    rate, dt = _rate_sized(
        mk, 1 << 12 if SMOKE else 1 << 26,
        lambda i, out: jnp.int32(70 + i)
        + (out[0, 0, 0] * 0).astype(jnp.int32))
    # Per path: 0.5 normal-pair + 1 exp shared; per strike ~12 integrand
    # vops + 12 accumulate adds (Kahan doubles them) => 9 * 24 + ~8 shared.
    return _budget_rate(
        "ladder9_greeks", rate, dt,
        {"normal_pair": 0.5, "exp": 1.0, "fma": 8.0 + 9 * 24.0},
        "0.5 normal-pair + 1 exp + (8 + 9x24) vec ops/path "
        "(9 strikes x 6 outputs, Kahan)")


def cva_multi_greeks_rate(geom=(256, 64)):
    from mctpu.kernels import cva_multi as kmulti
    from mctpu.types import CvaMultiSpec

    n_grid = 10 if SMOKE else 50
    spec = CvaMultiSpec(intensity=0.03, lgd=0.6,
                        s=np.array([100.0, 95.0]), v=np.array([0.2, 0.3]),
                        corr=np.array([[1.0, 0.4], [0.4, 1.0]]), r=0.05,
                        t=1.0, strikes=np.array([100.0, 90.0]),
                        weights=np.array([1.0, 0.5]), n_grid=n_grid)
    chol = _chol(spec.corr)
    blocks, rows = (4, 8) if SMOKE else geom

    def mk(n):
        plan = kmulti.make_plan(n, blocks, rows, False, n_underlyings=2)

        def build(seed):
            out, vecs = kmulti.greek_pallas_partials(
                spec, chol, seed, 0, plan, plan.num_blocks,
                interpret=SMOKE)
            return out

        return build, plan.total_paths * n_grid

    rate, dt = _rate_sized(mk, 1 << 12 if SMOKE else 1 << 22,
                           _scalar_chain(80))
    # Asset-major regime (m = 2, one lane tile per underlying): per
    # path-node m/2 normal pairs, 2m exp (spot + phi), 2m Hastings cnd
    # (measured as their own op class), m(m+1)/2 chol FMAs + ~24m carry/
    # integrand vops (x, dxv, d1/d2, bs, val, ws/dval/vval, accumulators)
    # + the netting fold.  No MXU matmuls (the packed regime's three
    # width x width matmuls measured at 29% of ceiling even at 256 rows).
    return _budget_rate(
        "cva_multi2_greeks50", rate, dt,
        {"normal_pair": 1.0, "exp": 4.0, "cnd": 4.0, "fma": 50.0},
        "1 normal-pair + 4 exp + 4 cnd + ~50 vec ops/path-node "
        "(asset-major: chol FMAs + per-leg BS node + tangent carries)",
        per="step")


def cva_multi_price_rate(geom=(256, 64)):
    """Pricing twin of the asset-major netting-set kernel (no tangents)."""
    from mctpu.kernels import cva_multi as kmulti
    from mctpu.types import CvaMultiSpec

    n_grid = 10 if SMOKE else 50
    spec = CvaMultiSpec(intensity=0.03, lgd=0.6,
                        s=np.array([100.0, 95.0]), v=np.array([0.2, 0.3]),
                        corr=np.array([[1.0, 0.4], [0.4, 1.0]]), r=0.05,
                        t=1.0, strikes=np.array([100.0, 90.0]),
                        weights=np.array([1.0, 0.5]), n_grid=n_grid)
    chol = _chol(spec.corr)
    blocks, rows = (4, 8) if SMOKE else geom

    def mk(n):
        plan = kmulti.make_plan(n, blocks, rows, False, n_underlyings=2)

        def build(seed):
            out, ee = kmulti.pallas_partials(
                spec, chol, seed, 0, plan, plan.num_blocks,
                interpret=SMOKE)
            return out

        return build, plan.total_paths * n_grid

    # Start near the sized geometry: the pricing kernel is ~7x faster than
    # the Greek twin, and every auto-sizer resize is a 20-40 s tunnel
    # compile.
    rate, dt = _rate_sized(mk, 1 << 12 if SMOKE else 1 << 27,
                           _scalar_chain(85))
    # Asset-major pricing: m/2 normal pairs, m spot exp (the phi/tangent
    # factors are DCE'd), 2m Hastings cnd, chol FMAs + BS-node vops +
    # netting fold + default-leg/profile accumulation ~36 fma-class.
    return _budget_rate(
        "cva_multi2_price50", rate, dt,
        {"normal_pair": 1.0, "exp": 2.0, "cnd": 4.0, "fma": 36.0},
        "1 normal-pair + 2 exp + 4 cnd + ~36 vec ops/path-node "
        "(asset-major pricing: chol FMAs + per-leg BS node + netting)",
        per="step")


def basket_asian_greeks_rate(geom=(256, 64)):
    from mctpu.kernels import multi_walk as kmw
    from mctpu.types import BasketOption

    bk = BasketOption.equicorrelated(3, rho=0.3)
    n_obs = 4 if SMOKE else 16
    chol = _chol(bk.corr)
    blocks, rows = (4, 8) if SMOKE else geom

    def mk(n):
        plan = kmw.make_plan(n, blocks, rows, False, n_assets=3)

        def build(seed):
            out, vecs = kmw.greek_pallas_partials(
                bk, chol, seed, 0, plan, plan.num_blocks, n_obs=n_obs,
                interpret=SMOKE)
            return out

        return build, plan.total_paths * n_obs

    rate, dt = _rate_sized(mk, 1 << 12 if SMOKE else 1 << 24,
                           _scalar_chain(90))
    # Asset-major (a = 3): per path-step a/2 normal pairs + a exp +
    # a(a+1)/2 chol FMAs + ~9a carry vops (x, basket, dxv, AS, AV, acc/tB).
    return _budget_rate(
        f"basket_asian3_greeks{n_obs}", rate, dt,
        {"normal_pair": 1.5, "exp": 3.0, "fma": 33.0},
        "1.5 normal-pair + 3 exp + ~33 vec ops/path-step "
        "(asset-major chol FMAs + dxv/AS/AV/tB carries)", per="step")


def basket_barrier_greeks_rate(geom=(256, 64)):
    from mctpu.kernels import multi_walk as kmw
    from mctpu.types import BasketOption

    bk = BasketOption.equicorrelated(3, rho=0.3)
    n_obs = 4 if SMOKE else 50
    chol = _chol(bk.corr)
    blocks, rows = (4, 8) if SMOKE else geom

    def mk(n):
        plan = kmw.make_plan(n, blocks, rows, False, n_assets=3)

        def build(seed):
            out, vecs = kmw.bar_greek_pallas_partials(
                bk, chol, seed, 0, plan, plan.num_blocks, n_obs=n_obs,
                barrier=130.0, up=True, interpret=SMOKE)
            return out

        return build, plan.total_paths * n_obs

    rate, dt = _rate_sized(mk, 1 << 12 if SMOKE else 1 << 23,
                           _scalar_chain(95))
    # Asset-major (a = 3): chol + L^-1 projections are a(a+1) FMAs, plus
    # ~11a carry vops (x, basket, qd selects, acc_q, acc_v, alive).
    return _budget_rate(
        f"basket_barrier3_greeks{n_obs}", rate, dt,
        {"normal_pair": 1.5, "exp": 3.0, "fma": 41.0},
        "1.5 normal-pair + 3 exp + ~41 vec ops/path-step "
        "(asset-major chol + L^-1 projection FMAs + LR carries)",
        per="step")


def main():
    if not SMOKE and jax.default_backend() != "tpu":
        raise SystemExit("run on the TPU (or pass --cpu-smoke)")
    out = {}
    # Per-kernel geometry knees (measured, benchmarks/geom_probe_r4.py):
    # reduction-heavy kernels want 256-row tiles; the Heston tangent walk
    # (8 carried tangent pairs, deep per-step dependency chain) is
    # monotone FASTER at small tiles — 28.2 Gsteps/s at 32 rows vs 16.8
    # at 256.
    for fn in (rainbow_greeks_rate,
               lambda: varswap_greeks_rate("gbm"),
               lambda: varswap_greeks_rate("heston", geom=(512, 32)),
               ladder_greeks_rate, cva_multi_greeks_rate,
               cva_multi_price_rate,
               basket_asian_greeks_rate, basket_barrier_greeks_rate,
               vanilla_greeks_rate, asian_greeks_rate,
               heston_greeks_rate, cva_greeks_rate):
        r = fn()
        out[r["kernel"]] = r
        print(json.dumps(r), flush=True)
    if not SMOKE:
        import pathlib
        pathlib.Path(__file__).with_name("greeks_r4.json").write_text(
            json.dumps(out, indent=1))


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# Grown single-asset Greek kernels (round-4 close-out re-measurement)
# ---------------------------------------------------------------------------
# The family-sweep close-out grew these kernels after their r3 rates were
# recorded: vanilla 12 -> 16 sums (+vanna/volga), asian 8 -> 10 (+gamma),
# heston 8 -> 14 (+dtheta/dkappa/dxi), cva 8 -> 14 (+spot/credit/cross
# gamma).  Budgets recounted from source at the new widths.

def vanilla_greeks_rate(geom=(512, 256)):
    from mctpu.kernels import greeks as kgreeks
    from mctpu.types import VanillaOption

    opt = VanillaOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0)
    blocks, rows = (4, 8) if SMOKE else geom

    def mk(n):
        plan = kgreeks.make_plan(n, blocks, rows, False)
        build = lambda seed: kgreeks.pallas_partials(
            opt, seed, 0, plan, plan.num_blocks, interpret=SMOKE)
        return build, plan.total_paths

    rate, dt = _rate_sized(mk, 1 << 12 if SMOKE else 1 << 32,
                           _scalar_chain(110))
    # 16 sums: the r3 12-sum count (28) + vanna (4 vops) + volga (6) +
    # 2 squares + 2 tile reductions = ~42.
    return _budget_rate(
        "vanilla_greeks16", rate, dt,
        {"normal_pair": 0.5, "exp": 1.0, "fma": 42.0},
        "0.5 normal-pair + 1 exp + ~42 vec ops/path (16 sums incl. "
        "vanna/volga)")


def asian_greeks_rate(geom=(512, 256)):
    from mctpu.kernels import asian as kasian
    from mctpu.types import AsianOption

    n_obs = 8 if SMOKE else 64
    opt = AsianOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0, n_obs=n_obs,
                      average="arithmetic")
    blocks, rows = (4, 8) if SMOKE else geom

    def mk(n):
        plan = kasian.make_plan(n, blocks, rows, False)
        build = lambda seed: kasian.greek_pallas_partials(
            opt, seed, 0, plan, plan.num_blocks, interpret=SMOKE)
        return build, plan.total_paths * n_obs

    rate, dt = _rate_sized(mk, 1 << 12 if SMOKE else 1 << 26,
                           _scalar_chain(120))
    # Arithmetic walk step: log_s 1, f 2, st 1, 4 accumulator FMAs,
    # scalar cj/tj free -> ~8 incl. the per-path payoff quants (~25)
    # amortized over 64 steps.
    return _budget_rate(
        f"asian_greeks10_{n_obs}", rate, dt,
        {"normal_pair": 0.5, "exp": 1.0, "fma": 8.0},
        "0.5 normal-pair + 1 exp + ~8 vec ops/step (10 sums incl. "
        "Stein gamma; payoff amortized)", per="step")


def heston_greeks_rate(geom=(512, 32)):
    from mctpu.kernels import heston as kheston
    from mctpu.types import HestonOption

    opt = HestonOption(s=100.0, k=100.0, r=0.03, t=1.0, v0=0.04, kappa=1.5,
                       theta=0.04, xi=0.5, rho=-0.7)
    n_steps = 16 if SMOKE else 100
    blocks, rows = (4, 8) if SMOKE else geom

    def mk(n):
        plan = kheston.make_plan(n, blocks, rows, False)
        build = lambda seed: kheston.greek_pallas_partials(
            opt, seed, 0, plan, plan.num_blocks, n_steps,
            interpret=SMOKE)
        return build, plan.total_paths * n_steps

    rate, dt = _rate_sized(mk, 1 << 12 if SMOKE else 1 << 24,
                           _scalar_chain(130))
    # Full-truncation Euler tangent step (the varswap recount without the
    # dacc chain): ~35 fma-class + sqrt + rsqrt; payoff quants amortized.
    return _budget_rate(
        f"heston_greeks14_{n_steps}", rate, dt,
        {"normal_pair": 1.0, "sqrt": 1.0, "rsqrt": 1.0, "fma": 35.0},
        "1 normal-pair + sqrt + rsqrt + ~35 vec ops/step (4 tangent "
        "pairs, guards counted)", per="step")


def cva_greeks_rate(geom=(512, 32)):
    from mctpu.kernels import cva as kcva
    from mctpu.types import CvaPortfolioSpec

    n_grid = 10 if SMOKE else 50
    spec = CvaPortfolioSpec(intensity=0.03, lgd=0.6, s=100.0, r=0.05,
                            v=0.2, t=1.0, strikes=np.array([100.0]),
                            weights=np.array([1.0]), n_grid=n_grid)
    blocks, rows = (4, 8) if SMOKE else geom

    def mk(n):
        plan = kcva.make_plan(n, blocks, rows, False)
        build = lambda seed: kcva.greek_pallas_partials(
            spec, seed, 0, plan, plan.num_blocks, interpret=SMOKE)
        return build, plan.total_paths * n_grid

    rate, dt = _rate_sized(mk, 1 << 12 if SMOKE else 1 << 23,
                           _scalar_chain(140))
    # Per node (non-WWR, 1 option): walk 2 + dxv 2 + exposure grads ~10
    # + dee_ds0/dee_dv 5 + z_std 2 + 7 accumulators (~10 incl. the
    # terminal-node select) = ~31; 2 Hastings cnd + spot/phi exp.
    return _budget_rate(
        f"cva_greeks14_{n_grid}", rate, dt,
        {"normal_pair": 0.5, "exp": 2.0, "cnd": 2.0, "fma": 31.0},
        "0.5 normal-pair + 2 exp + 2 cnd + ~31 vec ops/node (14 sums "
        "incl. spot/credit/cross gamma)", per="step")
