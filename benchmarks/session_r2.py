"""Round-2 on-hardware measurement session (single TPU chip).

Produces the evidence VERDICT round 1 asked for:
 - basket kernel throughput at 3/10/100 assets (weak #7 / next #4)
 - f64 XLA vanilla on the chip: throughput + price agreement (missing #2)
 - CVA grid-500 EE profile: Kahan vs plain accumulation digits (next #7)

Run: python benchmarks/session_r2.py   (on the TPU box; ~10 min fresh)
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def best_of(fn, arg_fn, reps=6):
    np.asarray(jax.block_until_ready(fn(arg_fn(0))))  # compile + sync
    ts = []
    out = None
    for i in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(arg_fn(i + 1)))
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts)), out


def bench_basket():
    from mctpu import math as mcmath, reference
    from mctpu.kernels import basket as kbasket
    from mctpu.types import BasketOption

    print("== basket kernel throughput (fused Pallas, f32+Kahan) ==")
    for a, n_paths in ((3, 1 << 31), (10, 1 << 30), (100, 1 << 28)):
        opt = BasketOption.default_reference(a)
        plan = kbasket.make_plan(n_paths, 512, 256, antithetic=False,
                                 n_assets=a)
        chol = np.asarray(  # PSD-pivoted: reference rho=-0.5 is singular
            mcmath.cholesky_lower(jnp.asarray(opt.corr, jnp.float64)),
            np.float32)

        def fn(seed, _plan=plan, _opt=opt, _chol=chol):
            return kbasket.pallas_partials(_opt, _chol, seed, 0, _plan,
                                           _plan.num_blocks)

        jfn = jax.jit(fn)
        dt, partials = best_of(jfn, lambda i: jnp.int32(11 + i))
        p = np.asarray(partials, np.float64)
        s, s2 = p[:, 0].sum(), p[:, 1].sum()
        n = plan.total_paths
        disc = float(np.exp(-opt.r * opt.t))
        price = disc * s / n
        se = disc * np.sqrt(max(n * s2 - s * s, 0) / (n * (n - 1))) / np.sqrt(n)
        ora = reference.price_basket(opt, 1 << 18, seed=3)
        z = abs(price - ora.price) / np.hypot(se, ora.std_error)
        print(f"assets={a:<4d} paths/s={n / dt:.3e}  asset-steps/s="
              f"{a * n / dt:.3e}  price={price:.5f}  z_vs_oracle={z:.2f}  "
              f"dt={dt * 1e3:.1f}ms  n={n:.2e}")


def bench_f64_vanilla():
    from mctpu import engine, math as mcmath
    from mctpu.types import Precision, VanillaOption

    print("== f64 on-chip evidence (XLA backend, x64 enabled) ==")
    jax.config.update("jax_enable_x64", True)
    opt = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0)
    bs = float(mcmath.bs_call(100.0, 100.0, 0.048790, 0.2, 1.0))
    for prec, np_ in ((Precision.F64, 1 << 26), (Precision.F32_KAHAN, 1 << 26)):
        cfg = engine.EngineConfig(num_blocks=128, rows=64, backend="xla",
                                  precision=prec)
        r0 = engine.price_vanilla(opt, np_, jax.random.key(1), cfg)  # compile
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            r = engine.price_vanilla(opt, np_, jax.random.key(2 + i), cfg)
            jax.block_until_ready(r.price)
            ts.append(time.perf_counter() - t0)
        dt = float(np.min(ts))
        z = abs(float(r.price) - bs) / float(r.std_error)
        print(f"{prec.name:<10s} paths/s={r.n_paths / dt:.3e}  "
              f"price={float(r.price):.6f}  bs={bs:.6f}  z={z:.2f}  "
              f"dt={dt * 1e3:.1f}ms")
    jax.config.update("jax_enable_x64", False)


def cva_profile_digits():
    from mctpu.kernels import cva as kcva
    from mctpu.types import CvaPortfolioSpec, CvaSpec

    print("== CVA grid-500 EE profile: Kahan vs plain accumulation ==")
    spec = CvaSpec(intensity=0.03, lgd=0.6, n_grid=500,
                   option=__import__("mctpu.types", fromlist=["VanillaOption"])
                   .VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0))
    port = CvaPortfolioSpec.from_single(spec)
    # Large per-block iteration count: many adds into the profile scratch.
    for kahan in (True, False):
        plan = kcva.make_plan(1 << 23, 8, 8, False, kahan=kahan)
        out, ee = jax.jit(lambda s, _p=plan: kcva.pallas_partials(
            port, s, 0, _p, _p.num_blocks))(jnp.int32(5))
        ee = np.asarray(ee, np.float64).sum(axis=0) / plan.total_units
        if kahan:
            ee_kahan = ee
        else:
            ee_plain = ee
    denom = np.maximum(np.abs(ee_kahan), 1e-30)
    rel = np.abs(ee_kahan - ee_plain) / denom
    print(f"iters/block={plan.iters}  nodes=500  "
          f"max_rel_diff(kahan vs plain, same draws)={rel.max():.3e}  "
          f"mean={rel.mean():.3e}")
    # Statistical gate vs the closed-form expected exposure
    # E[BS(S_t, T-t)] = e^{r t} BS(S_0, T).
    from mctpu import math as mcmath
    t_j = np.arange(1, 501) / 500.0
    want = np.exp(0.05 * t_j) * float(
        mcmath.bs_call(100.0, 100.0, 0.05, 0.2, 1.0))
    relerr = np.abs(ee_kahan - want) / want
    print(f"kahan profile vs closed form: max_rel={relerr.max():.3e} "
          f"mean_rel={relerr.mean():.3e} (MC error at n={plan.total_units:.1e})")


def main():
    print("backend:", jax.default_backend())
    bench_basket()
    cva_profile_digits()
    bench_f64_vanilla()


if __name__ == "__main__":
    main()
