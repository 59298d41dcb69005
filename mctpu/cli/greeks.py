"""Greeks experiment driver (beyond the reference: sensitivities).

Prints pathwise Monte Carlo Greeks (delta/vega/theta/rho via jax.grad), the
common-random-number bump gamma, and the closed-form Black-Scholes column for
comparison.
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from mctpu import greeks, math as mcmath
from mctpu.cli import common
from mctpu.types import VanillaOption


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--paths", type=int, default=1 << 20)
    p.add_argument("--spot", type=float, default=100.0)
    p.add_argument("--strike", type=float, default=100.0)
    p.add_argument("--rate", type=float, default=0.048790)
    p.add_argument("--vol", type=float, default=0.2)
    p.add_argument("--maturity", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--product",
                   choices=["vanilla", "basket", "asian", "basket-asian",
                            "basket-barrier", "lookback", "rainbow",
                            "varswap", "cliquet", "ladder", "book",
                            "barrier", "heston", "cva", "cva-multi",
                            "xva", "american"],
                   default="vanilla")
    p.add_argument("--barrier", type=float, default=130.0,
                   help="knock-out level for --product barrier")
    p.add_argument("--assets", type=int, default=3,
                   help="basket size for --product basket")
    p.add_argument("--obs", type=int, default=12,
                   help="observation dates (asian) / steps (heston) / "
                        "exposure grid (cva)")
    p.add_argument("--wwr-b", type=float, default=0.0,
                   help="wrong-way-risk coupling for --product cva")
    p.add_argument("--rqmc", action="store_true",
                   help="vanilla only: the full Greek surface on Sobol "
                        "nets (16 digitally-shifted replicates; ~an order "
                        "of magnitude tighter CIs at equal points)")
    p.add_argument("--engine", action="store_true",
                   help="use the in-kernel engine-tier Greeks (fused "
                        "pathwise accumulators with per-Greek CIs) instead "
                        "of the autodiff fallbacks; vanilla/asian only "
                        "(cva is always engine-tier)")
    args = p.parse_args(argv)

    opt = VanillaOption(s=args.spot, k=args.strike, r=args.rate,
                        v=args.vol, t=args.maturity)
    key = jax.random.key(args.seed)
    common.print_option(opt)

    if args.product == "asian":
        from mctpu.types import AsianOption
        aopt = AsianOption(args.spot, args.strike, args.rate, args.vol,
                           args.maturity, n_obs=args.obs,
                           average="geometric")
        if args.engine:
            from mctpu import engine
            res, dt = common.timed(engine.greeks_asian, aopt, args.paths,
                                   key)
            cf_fn = lambda s, v: mcmath.geometric_asian_call(
                s, args.strike, args.rate, v, args.maturity, args.obs)
            d = jax.grad(cf_fn, argnums=(0, 1))(args.spot, args.vol)
            gam = jax.grad(jax.grad(lambda s: cf_fn(s, args.vol)))(args.spot)
            cf = {"price": cf_fn(args.spot, args.vol), "delta": d[0],
                  "vega": d[1], "gamma": gam}
            print(f"\ngeometric asian ({args.obs} obs), engine tier, "
                  f"paths={args.paths}  time={dt * 1e3:.2f} ms")
            print(f"{'greek':>6} | {'pathwise MC':>12} | {'95% CI':>10} | "
                  f"{'closed form':>12}")
            for name in ("price", "delta", "vega", "gamma"):
                r = getattr(res, name)
                print(f"{name:>6} | {float(r.price):12.6f} | "
                      f"±{float(r.ci):8.6f} | {float(cf[name]):12.6f}")
            return 0
        mc, dt = common.timed(greeks.asian_greeks, aopt, args.paths, key)
        cf_fn = lambda s, v, r: mcmath.geometric_asian_call(
            s, args.strike, r, v, args.maturity, args.obs)
        d = jax.grad(cf_fn, argnums=(0, 1, 2))(args.spot, args.vol,
                                               args.rate)
        cf = {"price": cf_fn(args.spot, args.vol, args.rate),
              "delta": d[0], "vega": d[1], "rho": d[2]}
        print(f"\ngeometric asian ({args.obs} obs), paths={args.paths}  "
              f"time={dt * 1e3:.2f} ms")
        print(f"{'greek':>6} | {'pathwise MC':>12} | {'closed form':>12}")
        for name in ("price", "delta", "vega", "rho"):
            print(f"{name:>6} | {float(mc[name]):12.6f} | "
                  f"{float(cf[name]):12.6f}")
        return 0

    if args.product == "basket":
        from mctpu import engine
        from mctpu.types import BasketOption
        bopt = BasketOption.default_reference(args.assets)
        res, dt = common.timed(engine.greeks_basket, bopt, args.paths, key)
        print(f"\nbasket-{args.assets} per-asset Greeks, engine tier, "
              f"paths={args.paths}  time={dt * 1e3:.2f} ms")
        print(f"{'greek':>6} | per-asset values (MC pathwise, ±95% CI)")
        p_ = res.price
        print(f"{'price':>6} | {float(p_.price):.6f} ± {float(p_.ci):.6f}")
        for name in ("delta", "vega"):
            r = getattr(res, name)
            vals = " ".join(f"{v:.5f}±{c:.5f}" for v, c in
                            zip(jnp.atleast_1d(r.price),
                                jnp.atleast_1d(r.ci)))
            print(f"{name:>6} | {vals}")
        if res.gamma is not None:
            vals = " ".join(f"{v:.6f}±{c:.6f}" for v, c in
                            zip(jnp.atleast_1d(res.gamma.price),
                                jnp.atleast_1d(res.gamma.ci)))
            print(f"{'gamma':>6} | {vals}")
        else:
            print(f"{'gamma':>6} | n/a (rank-deficient correlation: no "
                  "sign-definite Brownian tilt)")
        for name in ("rho", "theta"):
            r = getattr(res, name)
            print(f"{name:>6} | {float(r.price):.6f} ± {float(r.ci):.6f}")
        return 0

    if args.product == "lookback":
        from mctpu import engine
        from mctpu.types import LookbackOption
        lopt = LookbackOption(s=args.spot, r=args.rate, v=args.vol,
                              t=args.maturity, n_obs=args.obs)
        res, dt = common.timed(engine.greeks_lookback, lopt, args.paths,
                               key)
        print(f"\nfloating-strike lookback ({args.obs} obs), engine tier, "
              f"paths={args.paths}  time={dt * 1e3:.2f} ms")
        print(f"{'greek':>6} | {'pathwise MC':>12} | {'95% CI':>10}")
        for name in ("price", "delta", "vega", "rho"):
            r = getattr(res, name)
            print(f"{name:>6} | {float(r.price):12.6f} | "
                  f"±{float(r.ci):8.6f}")
        return 0

    if args.product == "basket-asian":
        import numpy as np

        from mctpu import engine
        from mctpu.types import BasketAsianOption, BasketOption
        bk = BasketOption.equicorrelated(args.assets, rho=0.3)
        baopt = BasketAsianOption(bk, n_obs=args.obs)
        res, dt = common.timed(engine.greeks_basket_asian, baopt,
                               args.paths, key)
        print(f"\nbasket-asian call ({args.assets} assets, {args.obs} "
              f"obs), pathwise Greeks, paths={args.paths}  "
              f"time={dt * 1e3:.2f} ms")
        print(f"{'greek':>6} | {'pathwise MC':>28} | {'95% CI':>24}")
        for name in ("price", "delta", "vega", "rho"):
            r = getattr(res, name)
            pv = np.atleast_1d(np.asarray(r.price, dtype=np.float64))
            ci = np.atleast_1d(np.asarray(r.ci, dtype=np.float64))
            print(f"{name:>6} | {np.array2string(pv, precision=4):>28} | "
                  f"±{np.array2string(ci, precision=4):>23}")
        return 0

    if args.product == "basket-barrier":
        import numpy as np

        from mctpu import engine
        from mctpu.types import BasketBarrierOption, BasketOption
        bk = BasketOption.equicorrelated(args.assets, rho=0.3)
        bbopt = BasketBarrierOption(bk, barrier=args.barrier,
                                    n_obs=args.obs)
        res, dt = common.timed(engine.greeks_basket_barrier, bbopt,
                               args.paths, key)
        print(f"\nup-and-out basket call ({args.assets} assets, barrier "
              f"{args.barrier}, {args.obs} obs), likelihood-ratio Greeks "
              f"(unbiased under the knockout), paths={args.paths}  "
              f"time={dt * 1e3:.2f} ms")
        print(f"{'greek':>6} | {'LR MC':>28} | {'95% CI':>24}")
        for name in ("price", "delta", "vega", "rho"):
            r = getattr(res, name)
            pv = np.atleast_1d(np.asarray(r.price, dtype=np.float64))
            ci = np.atleast_1d(np.asarray(r.ci, dtype=np.float64))
            print(f"{name:>6} | {np.array2string(pv, precision=4):>28} | "
                  f"±{np.array2string(ci, precision=4):>23}")
        return 0

    if args.product == "cva-multi":
        import dataclasses as dc

        import numpy as np

        from mctpu import engine
        from mctpu.types import CvaMultiSpec
        m = args.assets
        corr = np.full((m, m), 0.3) + 0.7 * np.eye(m)
        spec = CvaMultiSpec(
            intensity=0.03, lgd=0.6,
            s=args.spot * (1.0 - 0.05 * np.arange(m)),
            v=args.vol * (1.0 + 0.25 * np.arange(m)), corr=corr,
            r=args.rate, t=args.maturity,
            strikes=args.strike * np.ones(m), weights=np.ones(m),
            n_grid=args.obs)
        res, dt = common.timed(engine.greeks_cva_multi, spec, args.paths,
                               key)

        def cf(sp):
            return float(mcmath.cva_multi_closed_form(
                sp.intensity, sp.lgd, sp.s, sp.v, sp.strikes, sp.weights,
                sp.r, sp.t, sp.n_grid))

        h = 1e-4
        cd_fd = (cf(dc.replace(spec, intensity=0.03 + h))
                 - cf(dc.replace(spec, intensity=0.03 - h))) / (2 * h)
        print(f"\nnetting-set CVA Greeks over {m} correlated underlyings "
              f"(grid {args.obs}), paths={args.paths}  "
              f"time={dt * 1e3:.2f} ms")
        print(f"{'output':>12} | {'pathwise MC':>24} | {'closed form':>12}")
        print(f"{'cva':>12} | {float(res.cva.price):24.6f} | "
              f"{cf(spec):12.6f}")
        print(f"{'credit_delta':>12} | "
              f"{float(res.credit_delta.price):24.6f} | {cd_fd:12.6f}")
        for name in ("delta", "vega"):
            r = getattr(res, name)
            pv = np.asarray(r.price, dtype=np.float64)
            print(f"{name:>12} | {np.array2string(pv, precision=5):>24} | "
                  f"{'(per-underlying)':>12}")
        return 0

    if args.product == "xva":
        import numpy as np

        from mctpu import engine
        from mctpu.types import CvaMultiSpec, XvaSpec
        m = args.assets
        corr = np.full((m, m), 0.3) + 0.7 * np.eye(m)
        spec = XvaSpec(
            netting=CvaMultiSpec(
                intensity=0.03, lgd=0.6,
                s=args.spot * (1.0 - 0.05 * np.arange(m)),
                v=args.vol * (1.0 + 0.25 * np.arange(m)), corr=corr,
                r=args.rate, t=args.maturity,
                strikes=args.strike * np.ones(m), weights=np.ones(m),
                n_grid=args.obs),
            own_intensity=0.02, own_lgd=0.5, funding_spread=0.01)
        res, dt = common.timed(engine.greeks_xva, spec, args.paths, key)

        def cf_legs(lam_c=0.03, lam_b=0.02, sf=0.01):
            net = spec.netting
            legs = mcmath.xva_multi_closed_form(
                lam_c, net.lgd, lam_b, spec.own_lgd, sf, net.s, net.v,
                net.strikes, net.weights, net.r, net.t, net.n_grid)
            return np.array([float(x) for x in legs])

        h = 1e-5
        fd_cpty = (cf_legs(lam_c=0.03 + h)
                   - cf_legs(lam_c=0.03 - h))[0] / (2 * h)
        fd_f = (cf_legs(sf=0.01 + h) - cf_legs(sf=0.01 - h)) / (2 * h)
        legs = cf_legs()
        print(f"\nbilateral xVA Greeks over {m} correlated underlyings "
              f"(grid {args.obs}, all-long netting), paths={args.paths}  "
              f"time={dt * 1e3:.2f} ms  (undiscounted legs, "
              f"MonteCarloKernel.cu:467 semantics)")
        print(f"{'output':>12} | {'pathwise MC':>24} | {'closed form':>12}")
        print(f"{'cva':>12} | {float(res.cva.price):24.6f} | "
              f"{legs[0]:12.6f}")
        print(f"{'fca':>12} | {float(res.fca.price):24.6f} | "
              f"{legs[2]:12.6f}")
        print(f"{'credit_cpty':>12} | {float(res.credit_cpty.price):24.6f}"
              f" | {fd_cpty:12.6f}")
        print(f"{'funding':>12} | {float(res.funding.price):24.6f} | "
              f"{fd_f[2] - fd_f[3]:12.6f}")
        for name in ("delta", "vega"):
            r = getattr(res, name)
            pv = np.asarray(r.price, dtype=np.float64)
            print(f"{name:>12} | {np.array2string(pv, precision=5):>24} | "
                  f"{'(per-underlying)':>12}")
        return 0

    if args.product == "cliquet":
        from mctpu import engine
        from mctpu.types import CliquetOption
        copt = CliquetOption(s=args.spot, r=args.rate, v=args.vol,
                             t=args.maturity, n_periods=args.obs,
                             cap=0.05, floor=-0.02)
        res, dt = common.timed(engine.greeks_cliquet, copt, args.paths,
                               key)
        gv, gr, gt = [float(x) for x in jax.grad(
            lambda v, r, t: mcmath.cliquet_closed_form(
                r, v, t, args.obs, 0.05, -0.02),
            argnums=(0, 1, 2))(args.vol, args.rate, args.maturity)]
        cf = {"price": float(mcmath.cliquet_closed_form(
            args.rate, args.vol, args.maturity, args.obs, 0.05, -0.02)),
            "delta": 0.0, "vega": gv, "rho": gr, "theta": gt}
        print(f"\ncliquet cap 5% floor -2% x{args.obs}, pathwise Greeks "
              f"(delta/gamma exactly 0: returns are s0-free), "
              f"paths={args.paths}  time={dt * 1e3:.2f} ms")
        print(f"{'greek':>6} | {'pathwise MC':>12} | {'95% CI':>12} | "
              f"{'exact':>12}")
        for name in ("price", "delta", "vega", "rho", "theta"):
            r = getattr(res, name)
            print(f"{name:>6} | {float(r.price):12.6f} | "
                  f"±{float(r.ci):10.8f} | {cf[name]:12.6f}")
        return 0

    if args.product == "ladder":
        import numpy as np

        from mctpu import engine
        strikes = np.linspace(0.8, 1.2, 9) * args.strike
        res, dt = common.timed(engine.greeks_vanilla_ladder, opt, strikes,
                               args.paths, key)
        print(f"\nstrike-ladder risk sweep ({len(strikes)} strikes, one "
              f"path sweep), paths={args.paths}  time={dt * 1e3:.2f} ms")
        print(f"{'strike':>8} | {'price':>9} | {'delta':>8} | {'vega':>8} "
              f"| {'gamma':>8} | {'BS delta':>8} | {'BS gamma':>8}")
        for i, km in enumerate(strikes):
            cf = mcmath.bs_greeks(args.spot, float(km), args.rate,
                                  args.vol, args.maturity)
            print(f"{km:8.2f} | "
                  f"{float(np.asarray(res.price.price)[i]):9.4f} | "
                  f"{float(np.asarray(res.delta.price)[i]):8.4f} | "
                  f"{float(np.asarray(res.vega.price)[i]):8.4f} | "
                  f"{float(np.asarray(res.gamma.price)[i]):8.5f} | "
                  f"{float(cf['delta']):8.4f} | {float(cf['gamma']):8.5f}")
        return 0

    if args.product == "book":
        import numpy as np

        from mctpu import engine
        from mctpu.types import VanillaBook
        opts = []
        for j in range(8):
            opts.append(VanillaOption(
                s=args.spot, k=args.strike * (0.8 + 0.4 * (j % 5) / 4),
                r=args.rate, v=args.vol * (0.8 + 0.1 * (j % 4)),
                t=args.maturity * (0.5 + 0.25 * (j % 3)),
                kind="call" if j % 2 == 0 else "put"))
        book = VanillaBook.from_options(opts)
        res, dt = common.timed(engine.greeks_book, book, args.paths, key)
        print(f"\nbook risk run ({book.n_instruments} instruments, one "
              f"path sweep), paths={args.paths}  time={dt * 1e3:.2f} ms")
        print(f"{'instrument':>22} | {'price':>9} | {'delta':>8} | "
              f"{'vega':>8} | {'gamma':>8} | {'BS delta':>8}")
        for i, o in enumerate(opts):
            cf = mcmath.bs_greeks(o.s, o.k, o.r, o.v, o.t)
            bsd = float(cf["delta"]) - (1.0 if o.kind == "put" else 0.0)
            tag = f"{o.kind} K={o.k:.1f} T={o.t:.2f}"
            print(f"{tag:>22} | "
                  f"{float(np.asarray(res.price.price)[i]):9.4f} | "
                  f"{float(np.asarray(res.delta.price)[i]):8.4f} | "
                  f"{float(np.asarray(res.vega.price)[i]):8.4f} | "
                  f"{float(np.asarray(res.gamma.price)[i]):8.5f} | "
                  f"{bsd:8.4f}")
        return 0

    if args.product == "varswap":
        from mctpu import engine
        n = args.obs
        res, dt = common.timed(engine.greeks_varswap, opt, args.paths, key,
                               engine.EngineConfig(), n)

        def K(v, r, t):
            mu = r - 0.5 * v * v
            return v * v + mu * mu * t / n

        kv, kr, kt = jax.grad(K, argnums=(0, 1, 2))(
            args.vol, args.rate, args.maturity)
        cf = {"price": float(K(args.vol, args.rate, args.maturity)),
              "delta": 0.0, "vega": float(kv), "rho": float(kr),
              "theta": float(kt)}
        print(f"\nGBM variance-swap fair strike ({n} obs), fused walk-sum "
              f"Greeks, paths={args.paths}  time={dt * 1e3:.2f} ms")
        print(f"{'greek':>6} | {'pathwise MC':>12} | {'95% CI':>12} | "
              f"{'exact':>12}")
        for name in ("price", "delta", "vega", "rho", "theta"):
            r = getattr(res, name)
            print(f"{name:>6} | {float(r.price):12.8f} | "
                  f"±{float(r.ci):10.8f} | {cf[name]:12.8f}")
        return 0

    if args.product == "rainbow":
        import numpy as np

        from mctpu import engine
        from mctpu.types import RainbowOption
        a = args.assets
        spots = args.spot * (1.0 - 0.05 * np.arange(a))
        vols = args.vol * (1.0 + 0.25 * np.arange(a))
        corr = np.full((a, a), 0.5) + 0.5 * np.eye(a)
        ropt = RainbowOption(s=spots, v=vols, corr=corr, k=args.strike,
                             r=args.rate, t=args.maturity, kind="max")
        res, dt = common.timed(engine.greeks_rainbow, ropt, args.paths, key)
        cf = None
        if a == 2:
            def price(s1, s2, v1, v2, r, t):
                return mcmath.rainbow_max_call(s1, s2, args.strike, r,
                                               v1, v2, 0.5, t)

            pargs = (spots[0], spots[1], vols[0], vols[1], args.rate,
                     args.maturity)
            g = jax.grad(price, argnums=(0, 1, 2, 3, 4, 5))(*pargs)
            cf = {"price": float(price(*pargs)),
                  "delta": np.array([float(g[0]), float(g[1])]),
                  "vega": np.array([float(g[2]), float(g[3])]),
                  "rho": float(g[4]), "theta": float(g[5])}
        print(f"\nmax-of-{a} rainbow call, arg-extreme pathwise Greeks, "
              f"paths={args.paths}  time={dt * 1e3:.2f} ms")
        hdr = f"{'greek':>8} | {'pathwise MC':>24} | {'95% CI':>20}"
        if cf is not None:
            hdr += f" | {'Stulz grad':>24}"
        print(hdr)
        for name in ("price", "delta", "vega", "rho", "theta"):
            r = getattr(res, name)
            pv = np.atleast_1d(np.asarray(r.price, dtype=np.float64))
            ci = np.atleast_1d(np.asarray(r.ci, dtype=np.float64))
            row = (f"{name:>8} | "
                   f"{np.array2string(pv, precision=4):>24} | "
                   f"±{np.array2string(ci, precision=4):>19}")
            if cf is not None:
                want = np.atleast_1d(np.asarray(cf[name], dtype=np.float64))
                row += f" | {np.array2string(want, precision=4):>24}"
            print(row)
        return 0

    if args.product == "barrier":
        from mctpu import engine
        from mctpu.types import BarrierOption
        bopt = BarrierOption(args.spot, args.strike, args.rate, args.vol,
                             args.maturity, barrier=args.barrier,
                             n_obs=args.obs)
        res, dt = common.timed(engine.greeks_barrier, bopt, args.paths, key)

        def cf(s=args.spot, v=args.vol, r=args.rate):
            beff = float(mcmath.barrier_continuity_correction(
                args.barrier, s, v, args.maturity, args.obs, up=True))
            return float(mcmath.up_and_out_call(
                s, args.strike, r, v, args.maturity, beff))

        h = 1e-3
        col = {
            "price": cf(),
            "delta": (cf(s=args.spot + 0.05) - cf(s=args.spot - 0.05)) / 0.1,
            "vega": (cf(v=args.vol + h) - cf(v=args.vol - h)) / (2 * h),
            "rho": (cf(r=args.rate + h) - cf(r=args.rate - h)) / (2 * h),
        }
        print(f"\nup-and-out barrier {args.barrier} ({args.obs} obs), "
              f"likelihood-ratio Greeks (unbiased under the knock-out "
              f"discontinuity), paths={args.paths}  time={dt * 1e3:.2f} ms")
        print(f"{'greek':>6} | {'LR MC':>12} | {'95% CI':>10} | "
              f"{'BGK closed-form FD':>18}")
        for name in ("price", "delta", "vega", "rho"):
            r = getattr(res, name)
            print(f"{name:>6} | {float(r.price):12.6f} | "
                  f"±{float(r.ci):8.6f} | {col[name]:18.6f}")
        return 0

    if args.product == "cva":
        import dataclasses

        from mctpu import engine
        from mctpu.types import CvaPortfolioSpec, CvaSpec
        spec = CvaSpec(intensity=0.03, lgd=0.6, option=opt, n_grid=args.obs)
        target = spec
        if args.wwr_b != 0.0:
            target = dataclasses.replace(
                CvaPortfolioSpec.from_single(spec), wwr_b=args.wwr_b)
        res, dt = common.timed(engine.greeks_cva, target, args.paths, key)
        print(f"\nCVA sensitivities (grid {args.obs}, lambda=0.03, "
              f"lgd=0.6, wwr_b={args.wwr_b}), engine tier, "
              f"paths={args.paths}  time={dt * 1e3:.2f} ms")

        def cf(lam=0.03, s=args.spot, v=args.vol):
            # f64 is mandatory for the FD reference columns: second
            # differences of the f32 closed form at h=1e-2 are ~60% noise
            # on gamma (the round-4 x64 lesson, test_greeks_cva_on_chip).
            with jax.enable_x64(True):
                return float(mcmath.cva_closed_form(
                    lam, 0.6, s, args.strike, args.rate, v, args.maturity,
                    args.obs, dtype=jnp.float64))

        h = 1e-4
        hs, hl = 1e-2, 1e-3
        col = {
            "cva": cf(),
            "credit_delta": (cf(lam=0.03 + h) - cf(lam=0.03 - h)) / (2 * h),
            "delta": (cf(s=args.spot + 1e-2) - cf(s=args.spot - 1e-2))
            / 2e-2,
            "vega": (cf(v=args.vol + h) - cf(v=args.vol - h)) / (2 * h),
            "gamma": (cf(s=args.spot + hs) - 2 * cf()
                      + cf(s=args.spot - hs)) / (hs * hs),
            "credit_gamma": (cf(lam=0.03 + hl) - 2 * cf()
                             + cf(lam=0.03 - hl)) / (hl * hl),
            "cross_gamma": (cf(lam=0.03 + hl, s=args.spot + hs)
                            - cf(lam=0.03 + hl, s=args.spot - hs)
                            - cf(lam=0.03 - hl, s=args.spot + hs)
                            + cf(lam=0.03 - hl, s=args.spot - hs))
            / (4 * hs * hl),
        }
        tag = ("closed-form FD" if args.wwr_b == 0.0
               else "wwr_b=0 closed-form FD (reference column)")
        print(f"{'output':>12} | {'pathwise MC':>12} | {'95% CI':>10} | "
              f"{tag:>28}")
        for name in ("cva", "credit_delta", "delta", "vega", "gamma",
                     "credit_gamma", "cross_gamma"):
            r = getattr(res, name)
            print(f"{name:>12} | {float(r.price):12.6f} | "
                  f"±{float(r.ci):8.6f} | {col[name]:28.6f}")
        return 0

    if args.product == "american":
        from mctpu import engine, reference
        from mctpu.types import AmericanOption
        aopt = AmericanOption(s=args.spot, k=args.strike, r=args.rate,
                              v=args.vol, t=args.maturity, n_steps=args.obs,
                              payoff="put")
        res, dt = common.timed(engine.greeks_american, aopt, args.paths, key)

        def bino(s=args.spot, v=args.vol, r=args.rate):
            return reference.binomial_american(s, args.strike, r, v,
                                               args.maturity, 2000, "put")

        col = {
            "price": bino(),
            "delta": (bino(s=args.spot + 0.25)
                      - bino(s=args.spot - 0.25)) / 0.5,
            "vega": (bino(v=args.vol + 5e-3)
                     - bino(v=args.vol - 5e-3)) / 1e-2,
            "rho": (bino(r=args.rate + 2e-3)
                    - bino(r=args.rate - 2e-3)) / 4e-3,
        }
        print(f"\namerican put ({args.obs} exercise dates), frozen-rule "
              f"pathwise Greeks, paths={args.paths}  time={dt * 1e3:.2f} ms")
        print(f"{'greek':>6} | {'pathwise MC':>12} | {'95% CI':>10} | "
              f"{'binomial FD':>12}")
        for name in ("price", "delta", "vega", "rho"):
            r = getattr(res, name)
            print(f"{name:>6} | {float(r.price):12.6f} | "
                  f"±{float(r.ci):8.6f} | {col[name]:12.6f}")
        return 0

    if args.product == "heston":
        from mctpu.models import heston as mheston
        from mctpu.types import HestonOption
        hopt = HestonOption(s=args.spot, k=args.strike, r=args.rate,
                            t=args.maturity, v0=args.vol ** 2, kappa=2.0,
                            theta=args.vol ** 2, xi=0.3, rho=-0.7)
        if args.engine:
            import dataclasses

            from mctpu import engine
            res, dt = common.timed(engine.greeks_heston, hopt, args.paths,
                                   key, n_steps=args.obs)

            def cfp(**bump):
                return float(mheston.cf_call_price(
                    dataclasses.replace(hopt, **bump)))

            col = {
                "price": cfp(),
                "delta": (cfp(s=args.spot + 0.05)
                          - cfp(s=args.spot - 0.05)) / 0.1,
                "vega": (cfp(v0=hopt.v0 + 1e-3)
                         - cfp(v0=hopt.v0 - 1e-3)) / 2e-3,
                "rho": (cfp(r=args.rate + 1e-3)
                        - cfp(r=args.rate - 1e-3)) / 2e-3,
                "dtheta": (cfp(theta=hopt.theta + 1e-3)
                           - cfp(theta=hopt.theta - 1e-3)) / 2e-3,
                "dkappa": (cfp(kappa=hopt.kappa + 1e-2)
                           - cfp(kappa=hopt.kappa - 1e-2)) / 2e-2,
                "dxi": (cfp(xi=hopt.xi + 1e-3)
                        - cfp(xi=hopt.xi - 1e-3)) / 2e-3,
            }
            print(f"\nheston euler ({args.obs} steps), engine-tier pathwise "
                  f"tangents, paths={args.paths}  time={dt * 1e3:.2f} ms")
            print(f"{'greek':>6} | {'pathwise MC':>12} | {'95% CI':>10} | "
                  f"{'char-fn FD':>12}   (vega = dV/dv0)")
            for name in ("price", "delta", "vega", "rho", "dtheta",
                         "dkappa", "dxi"):
                r = getattr(res, name)
                print(f"{name:>6} | {float(r.price):12.6f} | "
                      f"±{float(r.ci):8.6f} | {col[name]:12.6f}")
            return 0
        mc, dt = common.timed(greeks.heston_greeks, hopt, args.paths, key,
                              n_steps=args.obs, scheme="qe")
        print(f"\nheston QE ({args.obs} steps), paths={args.paths}  "
              f"time={dt * 1e3:.2f} ms")
        print(f"cf price: {float(mheston.cf_call_price(hopt)):.6f}")
        for name in ("price", "delta", "dv0", "dxi"):
            print(f"{name:>6} | {float(mc[name]):12.6f}")
        return 0

    if args.rqmc:
        from mctpu import qmc_engine
        reps = 16
        pts = max(args.paths // reps, 1 << 10)
        res, dt = common.timed(qmc_engine.greeks_vanilla_rqmc, opt, pts,
                               key, None, reps)
        cf = mcmath.bs_greeks(opt.s, opt.k, opt.r, opt.v, opt.t)
        print(f"\nSobol-RQMC Greek surface ({reps} replicates x {pts} "
              f"points), time={dt * 1e3:.2f} ms")
        print(f"{'greek':>6} | {'RQMC':>12} | {'95% CI':>12} | "
              f"{'closed form':>12}")
        for name in ("price", "delta", "vega", "rho", "theta", "gamma",
                     "vanna", "volga"):
            r = getattr(res, name)
            print(f"{name:>6} | {float(r.price):12.6f} | "
                  f"±{float(r.ci):10.8f} | {float(cf[name]):12.6f}")
        return 0

    if args.engine:
        from mctpu import engine
        res, dt = common.timed(engine.greeks_vanilla, opt, args.paths, key)
        cf = mcmath.bs_greeks(opt.s, opt.k, opt.r, opt.v, opt.t)
        print(f"\nengine tier, paths={args.paths}  time={dt * 1e3:.2f} ms")
        print(f"{'greek':>6} | {'pathwise MC':>12} | {'95% CI':>10} | "
              f"{'closed form':>12}")
        for name in ("price", "delta", "vega", "rho", "theta", "gamma",
                     "vanna", "volga"):
            r = getattr(res, name)
            print(f"{name:>6} | {float(r.price):12.6f} | "
                  f"±{float(r.ci):8.6f} | {float(cf[name]):12.6f}")
        return 0

    mc, dt = common.timed(greeks.vanilla_greeks, opt, args.paths, key)
    gamma = greeks.bump_and_revalue(
        lambda s: greeks.vanilla_greeks(
            VanillaOption(s=s, k=opt.k, r=opt.r, v=opt.v, t=opt.t),
            args.paths, key)["price"],
        jnp.asarray(opt.s, mcmath.wide_dtype()), eps=1.0, order=2)
    cf = mcmath.bs_greeks(opt.s, opt.k, opt.r, opt.v, opt.t)

    print(f"\npaths={args.paths}  time={dt * 1e3:.2f} ms")
    print(f"{'greek':>6} | {'pathwise MC':>12} | {'closed form':>12}")
    for name in ("price", "delta", "vega", "theta", "rho"):
        print(f"{name:>6} | {float(mc[name]):12.6f} | {float(cf[name]):12.6f}")
    print(f"{'gamma':>6} | {float(gamma):12.6f} | {float(cf['gamma']):12.6f}"
          f"   (CRN bump-and-revalue)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
