"""Walk-kernel throughput sweep (one TPU chip): path-steps/s per product.

Round-2 numbers for benchmarks/RESULTS_r2.md; every row re-checks accuracy
against its oracle before reporting (a throughput number without an
accuracy gate can hide a bias — see the basket MXU-precision episode).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def best_of(jfn, args_fn, reps=5):
    np.asarray(jax.block_until_ready(jfn(args_fn(0))))
    ts, out = [], None
    for i in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(jfn(args_fn(i + 1)))
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts)), out


def main():
    from mctpu import engine, math as mcmath, reference
    from mctpu.models import asian as masian, cva as mcva, heston as mheston
    from mctpu.types import (AsianOption, BarrierOption, BasketAsianOption,
                             BasketBarrierOption, BasketOption, CvaMultiSpec,
                             CvaSpec, VanillaOption)

    print("backend:", jax.default_backend())
    cfg = engine.EngineConfig(num_blocks=512, rows=32, backend="pallas")
    key = jax.random.key(11)

    rows = []

    def run(tag, fn, opt, n, steps, want, se_extra=0.0, **kw):
        fn(opt, n, key, cfg, **kw)  # compile
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            res = fn(opt, n, jax.random.fold_in(key, i), cfg, **kw)
            jax.block_until_ready(res.price if hasattr(res, "price")
                                  else res.cva)
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        val = float(res.price if hasattr(res, "price") else res.cva)
        se = float(res.std_error)
        z = abs(val - want) / np.hypot(se, se_extra) if want == want else 0.0
        rate = res.n_paths * steps / dt
        rows.append((tag, rate, val, z, dt))
        print(f"{tag:<28s} path-steps/s={rate:.3e}  value={val:.5f} "
              f"z={z:.2f}  dt={dt * 1e3:.1f}ms")

    g = 50
    spec = CvaSpec(intensity=0.03, lgd=0.6,
                   option=VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0),
                   n_grid=g)
    run("cva grid=50", engine.price_cva, spec, 1 << 23, g,
        float(mcva.closed_form(spec)))

    geo = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=50,
                      average="geometric")
    run("asian 50 obs (geom)", engine.price_asian, geo, 1 << 23, 50,
        float(masian.closed_form_geometric(geo)))

    uo = BarrierOption(100.0, 100.0, 0.05, 0.2, 1.0, barrier=130.0,
                       n_obs=50, kind="up-and-out")
    beff = float(mcmath.barrier_continuity_correction(130.0, 100.0, 0.2,
                                                      1.0, 50, up=True))
    run("barrier 50 obs (uo)", engine.price_barrier, uo, 1 << 23, 50,
        float(mcmath.up_and_out_call(100.0, 100.0, 0.05, 0.2, 1.0, beff)),
        se_extra=0.01)

    hopt = HestonOption = __import__("mctpu.types",
                                     fromlist=["HestonOption"]).HestonOption(
        s=100.0, k=100.0, r=0.03, t=1.0, v0=0.04, kappa=1.5, theta=0.04,
        xi=0.5, rho=-0.7)
    cf = float(mheston.cf_call_price(hopt))
    run("heston euler 100", engine.price_heston, hopt, 1 << 22, 100, cf,
        se_extra=0.02, n_steps=100)
    run("heston qe 100", engine.price_heston, hopt, 1 << 22, 100, cf,
        se_extra=0.01, n_steps=100, scheme="qe")

    bk = BasketOption.default_reference(3)
    ora = reference.price_basket_asian(BasketAsianOption(bk, n_obs=12),
                                       1 << 16, seed=7)
    run("basket-asian 3a 12 obs", engine.price_basket_asian,
        BasketAsianOption(bk, n_obs=12), 1 << 22, 12, ora.price,
        se_extra=ora.std_error)
    orb = reference.price_basket_barrier(
        BasketBarrierOption(bk, barrier=120.0, n_obs=12), 1 << 16, seed=8)
    run("basket-barrier 3a 12 obs", engine.price_basket_barrier,
        BasketBarrierOption(bk, barrier=120.0, n_obs=12), 1 << 22, 12,
        orb.price, se_extra=orb.std_error)

    corr = np.array([[1.0, 0.5], [0.5, 1.0]])
    mspec = CvaMultiSpec(intensity=0.03, lgd=0.6, s=[100.0, 95.0],
                         v=[0.2, 0.3], corr=corr, r=0.05, t=1.0,
                         strikes=[100.0, 90.0], weights=[0.5, 0.5],
                         n_grid=25)
    run("cva-multi 2u grid=25", engine.price_cva_multi, mspec, 1 << 21, 25,
        float(mcmath.cva_multi_closed_form(0.03, 0.6, mspec.s, mspec.v,
                                           mspec.strikes, mspec.weights,
                                           0.05, 1.0, 25)))
    return rows


if __name__ == "__main__":
    main()
