"""Exotic-product experiment driver (families beyond the reference).

``--product asian|barrier|american`` prices the product on the accelerator
and prints the relevant oracle column (geometric closed form / BGK-corrected
barrier formula / CRR binomial lattice).
"""
from __future__ import annotations

import argparse

import jax

from mctpu import engine, lsm, math as mcmath, reference, variance
from mctpu.cli import common
from mctpu.types import AmericanOption, AsianOption, BarrierOption


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_engine_args(p, default_mult=1)
    p.add_argument("--product",
                   choices=["asian", "barrier", "american", "heston",
                            "lookback", "rainbow", "basket-asian",
                            "basket-barrier", "varswap", "ladder", "book",
                            "barrier-book",
                            "rqmc", "mlmc", "mlmc-asian", "mlmc-barrier",
                            "cliquet", "cva-multi", "xva", "is", "cv",
                            "american-heston"],
                   default="asian")
    p.add_argument("--assets", type=int, default=3,
                   help="basket size for the basket-* products")
    p.add_argument("--spot", type=float, default=100.0)
    p.add_argument("--strike", type=float, default=100.0)
    p.add_argument("--rate", type=float, default=0.05)
    p.add_argument("--vol", type=float, default=0.2)
    p.add_argument("--maturity", type=float, default=1.0)
    p.add_argument("--obs", type=int, default=50,
                   help="observation/exercise dates")
    p.add_argument("--average", choices=["arithmetic", "geometric"],
                   default="arithmetic")
    p.add_argument("--barrier", type=float, default=130.0)
    p.add_argument("--kind", choices=["up-and-out", "down-and-out"],
                   default="up-and-out")
    p.add_argument("--payoff", choices=["put", "call"], default="put")
    p.add_argument("--scheme", choices=["euler", "qe"], default="euler",
                   help="heston discretization (qe = Andersen 2008, "
                        "effectively unbiased at coarse grids)")
    p.add_argument("--eps", type=float, default=0.02,
                   help="MLMC root-mean-square error target")
    p.add_argument("--replicates", type=int, default=16,
                   help="RQMC digital-shift replicates (the CI unit)")
    args = p.parse_args(argv)

    n = common.n_paths(args)
    cfg = common.build_config(args)
    key = jax.random.key(args.seed)
    base = dict(s=args.spot, k=args.strike, r=args.rate, v=args.vol,
                t=args.maturity)

    if args.product == "asian":
        opt = AsianOption(n_obs=args.obs, average=args.average, **base)
        engine.price_asian(opt, n, key, cfg)  # compile
        res, dt = common.timed(engine.price_asian, opt, n, key, cfg)
        common.print_result(f"asian/{args.average}", res.price, res.ci, dt,
                            res.n_paths * args.obs, extra="  (path-steps/s)")
        geo = float(mcmath.geometric_asian_call(
            args.spot, args.strike, args.rate, args.vol, args.maturity,
            args.obs))
        print(f"geometric closed form: {geo:.6f}")
        if args.average == "arithmetic":
            cv = variance.price_asian_cv(opt, min(n, 1 << 17), key)
            print(f"geometric-CV estimate: {float(cv.price):.6f} "
                  f"± {float(cv.ci):.6f}")
        return 0

    if args.product == "barrier":
        opt = BarrierOption(barrier=args.barrier, n_obs=args.obs,
                            kind=args.kind, **base)
        engine.price_barrier(opt, n, key, cfg)  # compile
        res, dt = common.timed(engine.price_barrier, opt, n, key, cfg)
        common.print_result(args.kind, res.price, res.ci, dt,
                            res.n_paths * args.obs, extra="  (path-steps/s)")
        if args.kind == "up-and-out":
            beff = float(mcmath.barrier_continuity_correction(
                args.barrier, args.spot, args.vol, args.maturity, args.obs))
            want = float(mcmath.up_and_out_call(
                args.spot, args.strike, args.rate, args.vol, args.maturity,
                beff))
            print(f"BGK-corrected closed form: {want:.6f} "
                  f"(continuous barrier {args.barrier} -> {beff:.3f})")
        return 0

    if args.product == "rainbow":
        import numpy as np

        from mctpu.types import RainbowOption
        corr = np.full((args.assets, args.assets), 0.3)
        np.fill_diagonal(corr, 1.0)
        vols = np.where(np.arange(args.assets) % 2 == 0, args.vol,
                        args.vol * 1.5)
        opt = RainbowOption(s=np.full(args.assets, args.spot), v=vols,
                            corr=corr, k=args.strike, r=args.rate,
                            t=args.maturity, kind="max")
        engine.price_rainbow(opt, n, key, cfg)  # compile
        res, dt = common.timed(engine.price_rainbow, opt, n, key, cfg)
        common.print_result(f"rainbow max-of-{args.assets}", res.price,
                            res.ci, dt, res.n_paths * args.assets,
                            extra="  (asset-draws/s)")
        if args.assets == 2:
            cf = float(mcmath.rainbow_max_call(
                args.spot, args.spot, args.strike, args.rate, vols[0],
                vols[1], 0.3, args.maturity))
            print(f"Stulz closed form: {cf:.6f}")
        return 0

    if args.product == "lookback":
        from mctpu.types import LookbackOption
        opt = LookbackOption(s=args.spot, r=args.rate, v=args.vol,
                             t=args.maturity, k=args.strike, n_obs=args.obs,
                             kind="floating", payoff=args.payoff)
        engine.price_lookback(opt, n, key, cfg)  # compile
        res, dt = common.timed(engine.price_lookback, opt, n, key, cfg)
        common.print_result(f"lookback floating {args.payoff}", res.price,
                            res.ci, dt, res.n_paths * args.obs,
                            extra="  (path-steps/s)")
        if args.payoff == "call":
            cf = float(mcmath.lookback_floating_call(
                args.spot, args.rate, args.vol, args.maturity))
            print(f"continuous GSG upper bound: {cf:.6f} "
                  f"(discrete gap shrinks O(1/sqrt(n_obs)))")
        return 0

    if args.product in ("basket-asian", "basket-barrier"):
        from mctpu.types import (BasketAsianOption, BasketBarrierOption,
                                 BasketOption)
        bk = (BasketOption.default_reference(args.assets)
              if args.assets <= 3 else
              BasketOption.equicorrelated(args.assets))
        if args.product == "basket-asian":
            opt = BasketAsianOption(bk, n_obs=args.obs)
            fn, orafn = engine.price_basket_asian, reference.price_basket_asian
        else:
            opt = BasketBarrierOption(bk, barrier=args.barrier,
                                      n_obs=args.obs, kind=args.kind)
            fn, orafn = (engine.price_basket_barrier,
                         reference.price_basket_barrier)
        fn(opt, n, key, cfg)  # compile
        res, dt = common.timed(fn, opt, n, key, cfg)
        common.print_result(f"{args.product} ({args.assets} assets)",
                            res.price, res.ci, dt,
                            res.n_paths * args.obs * args.assets,
                            extra="  (asset-steps/s)")
        ora = orafn(opt, min(n, 1 << 15), seed=args.seed)
        print(f"numpy oracle: {ora.price:.6f} ± {ora.ci:.6f}")
        return 0

    if args.product == "varswap":
        from mctpu.types import VanillaOption
        opt = VanillaOption(**base)
        engine.fair_variance_strike(opt, n, key, cfg, n_obs=args.obs)
        res, dt = common.timed(engine.fair_variance_strike, opt, n, key,
                               cfg, n_obs=args.obs)
        common.print_result(f"varswap/gbm n={args.obs}", res.price, res.ci,
                            dt, res.n_paths * args.obs,
                            extra="  (path-steps/s)")
        exact = (args.vol ** 2 + (args.rate - 0.5 * args.vol ** 2) ** 2
                 * args.maturity / args.obs)
        print(f"exact discrete fair strike: {exact:.8f} "
              f"(continuous: {args.vol ** 2:.6f})")
        return 0

    if args.product == "ladder":
        import numpy as np

        from mctpu.types import VanillaOption
        opt = VanillaOption(**base)
        strikes = np.linspace(0.8 * args.strike, 1.2 * args.strike, 9)
        engine.price_vanilla_ladder(opt, strikes, n, key, cfg)  # compile
        res, dt = common.timed(engine.price_vanilla_ladder, opt, strikes,
                               n, key, cfg)
        rate = res.n_paths / max(dt, 1e-12)
        print(f"strike ladder ({len(strikes)} strikes, ONE path sweep; "
              f"{rate:.3e} paths/s):")
        prices = np.asarray(res.price)
        cis = np.asarray(res.ci)
        for j, kk in enumerate(strikes):
            bs = float(mcmath.bs_call(args.spot, kk, args.rate, args.vol,
                                      args.maturity))
            print(f"  K={kk:7.2f}  mc {prices[j]:9.6f} ± {cis[j]:.6f}   "
                  f"bs {bs:9.6f}   |z| "
                  f"{abs(prices[j] - bs) / max(cis[j] / 1.96, 1e-12):.2f}")
        return 0

    if args.product == "book":
        import numpy as np

        from mctpu.types import VanillaBook, VanillaOption
        # A synthetic serving book around the flag market data: strikes
        # 80%..120%, staggered maturities/vols, alternating calls/puts.
        opts = []
        for j in range(args.assets if args.assets > 3 else 8):
            kk = args.strike * (0.8 + 0.4 * (j % 5) / 4)
            opts.append(VanillaOption(
                s=args.spot, k=kk, r=args.rate,
                v=args.vol * (0.8 + 0.1 * (j % 4)),
                t=args.maturity * (0.5 + 0.25 * (j % 3)),
                kind="call" if j % 2 == 0 else "put"))
        book = VanillaBook.from_options(opts)
        engine.price_book(book, n, key, cfg)  # compile
        res, dt = common.timed(engine.price_book, book, n, key, cfg)
        rate = res.n_paths / max(dt, 1e-12)
        print(f"vanilla book ({book.n_instruments} instruments, ONE path "
              f"sweep; {rate:.3e} paths/s):")
        prices = np.asarray(res.price)
        cis = np.asarray(res.ci)
        for j, o in enumerate(opts):
            fn = mcmath.bs_call if o.kind == "call" else mcmath.bs_put
            bs = float(fn(o.s, o.k, o.r, o.v, o.t))
            print(f"  {o.kind:4s} K={o.k:7.2f} T={o.t:4.2f} v={o.v:4.2f}  "
                  f"mc {prices[j]:9.6f} ± {cis[j]:.6f}   bs {bs:9.6f}   "
                  f"|z| {abs(prices[j] - bs) / max(cis[j] / 1.96, 1e-12):.2f}")
        return 0

    if args.product == "barrier-book":
        import numpy as np

        from mctpu.types import BarrierBook
        # A synthetic knock-out book around the flag market data: strikes
        # 80%..120%, staggered vols/maturities, up-and-out calls with
        # per-instrument barriers plus one down-and-out put.
        m = args.assets if args.assets > 3 else 8
        ks, vs, ts, bs_, kinds, dirs = [], [], [], [], [], []
        for j in range(m):
            ks.append(args.strike * (0.8 + 0.4 * (j % 5) / 4))
            vs.append(args.vol * (0.8 + 0.1 * (j % 4)))
            ts.append(args.maturity * (0.5 + 0.25 * (j % 3)))
            if j % 4 == 3:
                kinds.append("put"); dirs.append("down-and-out")
                bs_.append(0.6 * args.spot)
            else:
                kinds.append("call"); dirs.append("up-and-out")
                bs_.append(args.barrier * (1.0 + 0.1 * (j % 3)))
        book = BarrierBook(
            s=np.full(m, args.spot), k=np.asarray(ks), r=np.full(m, args.rate),
            v=np.asarray(vs), t=np.asarray(ts), barrier=np.asarray(bs_),
            n_obs=args.obs, kinds=tuple(kinds), directions=tuple(dirs))
        engine.price_barrier_book(book, n, key, cfg)  # compile
        res, dt = common.timed(engine.price_barrier_book, book, n, key, cfg)
        marks = res.n_paths * m / max(dt, 1e-12)
        print(f"barrier book ({m} instruments x {args.obs} dates, ONE "
              f"walk sweep; {marks:.3e} instrument-marks/s):")
        prices = np.asarray(res.price)
        cis = np.asarray(res.ci)
        for j in range(m):
            print(f"  {kinds[j]:4s}/{dirs[j]:12s} K={ks[j]:7.2f} "
                  f"B={bs_[j]:6.1f} T={ts[j]:4.2f}  "
                  f"mc {prices[j]:9.6f} ± {cis[j]:.6f}")
        g, dtg = common.timed(engine.greeks_barrier_book, book, n, key, cfg)
        d = np.asarray(g.delta.price)
        print(f"risk run (price/delta/vega/rho per instrument, LR): "
              f"delta[0]={d[0]:.4f}  "
              f"{res.n_paths * m * 4 / max(dtg, 1e-12):.3e} greeks-marks/s")
        return 0

    if args.product == "rqmc":
        from mctpu import qmc_engine
        from mctpu.types import VanillaOption
        reps = args.replicates
        opt = VanillaOption(**base)
        qmc_engine.price_vanilla_rqmc(opt, n, key, cfg, replicates=reps)
        res, dt = common.timed(qmc_engine.price_vanilla_rqmc, opt, n, key,
                               cfg, replicates=reps)
        common.print_result(f"rqmc vanilla ({reps} replicates)", res.price,
                            res.ci, dt, res.n_paths, extra="  (points/s)")
        bs = float(mcmath.bs_call(args.spot, args.strike, args.rate,
                                  args.vol, args.maturity))
        mc = engine.price_vanilla(opt, res.n_paths, key, cfg)
        print(f"bs closed form: {bs:.6f}   plain-MC CI at same paths: "
              f"±{float(mc.ci):.6f} (RQMC tightens "
              f"{float(mc.ci) / max(float(res.ci), 1e-12):.0f}x)")
        aop = AsianOption(n_obs=args.obs, average=args.average, **base)
        ra, dta = common.timed(qmc_engine.price_asian_rqmc, aop,
                               max(n // args.obs, 1 << 12), key, cfg,
                               replicates=reps)
        common.print_result(f"rqmc asian/{args.average} (bridge)", ra.price,
                            ra.ci, dta, ra.n_paths * args.obs,
                            extra="  (path-steps/s)")
        if args.average == "geometric":
            geo = float(mcmath.geometric_asian_call(
                args.spot, args.strike, args.rate, args.vol, args.maturity,
                args.obs))
            print(f"geometric closed form: {geo:.6f}")
        from mctpu.types import BasketOption
        bk = BasketOption.equicorrelated(args.assets, rho=0.3)
        rbq, dtb = common.timed(qmc_engine.price_basket_rqmc, bk, n, key,
                                cfg, replicates=reps)
        common.print_result(f"rqmc basket ({args.assets} assets)",
                            rbq.price, rbq.ci, dtb,
                            rbq.n_paths * args.assets,
                            extra="  (asset-draws/s)")
        return 0

    if args.product == "cv":
        from mctpu.types import BasketOption, VanillaOption
        opt = VanillaOption(**base)
        variance.price_vanilla_cv(opt, n, key, cfg)  # compile
        res, dt = common.timed(variance.price_vanilla_cv, opt, n, key, cfg)
        common.print_result("vanilla + terminal-spot CV", res.price,
                            res.ci, dt, res.n_paths, extra="  (paths/s)")
        mc = engine.price_vanilla(opt, n, key, cfg)
        bs = float(mcmath.bs_call(args.spot, args.strike, args.rate,
                                  args.vol, args.maturity))
        print(f"bs closed form: {bs:.6f}   plain-MC CI: ±{float(mc.ci):.6f}"
              f"  (CV tightens {float(mc.ci) / max(float(res.ci), 1e-12):.1f}x)")
        bk = BasketOption.equicorrelated(args.assets, rho=0.3)
        rb, dtb = common.timed(variance.price_basket_cv, bk, n, key, cfg)
        mcb = engine.price_basket(bk, n, key, cfg)
        common.print_result(f"basket-{args.assets} + basket-value CV",
                            rb.price, rb.ci, dtb, rb.n_paths,
                            extra="  (paths/s)")
        print(f"plain-MC CI: ±{float(mcb.ci):.6f}  (CV tightens "
              f"{float(mcb.ci) / max(float(rb.ci), 1e-12):.1f}x)")
        aop = AsianOption(n_obs=args.obs, average="arithmetic", **base)
        ra, dta = common.timed(variance.price_asian_cv, aop,
                               max(n // 4, 1 << 12), key, cfg)
        common.print_result("asian + geometric CV", ra.price, ra.ci, dta,
                            ra.n_paths * args.obs, extra="  (path-steps/s)")
        return 0

    if args.product == "american-heston":
        from mctpu.types import HestonOption
        hopt = HestonOption(s=args.spot, k=args.strike, r=args.rate,
                            t=args.maturity, v0=args.vol**2, kappa=2.0,
                            theta=args.vol**2, xi=0.3, rho=-0.7)
        n_am = min(n, 1 << 17)
        lsm.price_american_heston(hopt, n_am, key, n_steps=args.obs,
                                  scheme=args.scheme,
                                  payoff=args.payoff)  # compile
        res, dt = common.timed(lsm.price_american_heston, hopt, n_am, key,
                               n_steps=args.obs, scheme=args.scheme,
                               payoff=args.payoff)
        common.print_result(f"american-heston {args.payoff}/{args.scheme}",
                            res.price, res.ci, dt, res.n_paths * args.obs,
                            extra="  (path-steps/s)")
        from mctpu.models import heston as mheston
        if args.payoff == "call":
            # No dividends: American call = European (CF oracle).
            print(f"characteristic-function european call: "
                  f"{float(mheston.cf_call_price(hopt)):.6f} "
                  f"(American call must match: no early-exercise premium)")
        return 0

    if args.product == "mlmc":
        from mctpu import mlmc
        from mctpu.models import heston as mheston
        from mctpu.types import HestonOption
        opt = HestonOption(s=args.spot, k=args.strike, r=args.rate,
                           t=args.maturity, v0=args.vol ** 2, kappa=2.0,
                           theta=args.vol ** 2, xi=0.3, rho=-0.7)
        res, dt = common.timed(mlmc.price_heston_mlmc, opt, args.eps, key,
                               config=cfg)
        print(f"mlmc heston/euler eps={args.eps}: {res.price:.6f} "
              f"± {res.ci:.6f}   [{dt:.3f} s, "
              f"{res.total_path_steps / dt:.3e} path-steps/s]")
        print(f"characteristic-function price: "
              f"{float(mheston.cf_call_price(opt)):.6f}")
        print("level  steps     paths        E[dP]        Var[dP]")
        for lv in res.levels:
            print(f"  {lv.level}    {lv.n_steps:5d}  {lv.n_paths:9d}  "
                  f"{lv.mean:+.3e}   {lv.var:.3e}")
        return 0

    if args.product == "cliquet":
        from mctpu.types import CliquetOption
        opt = CliquetOption(s=args.spot, r=args.rate, v=args.vol,
                            t=args.maturity, n_periods=args.obs,
                            cap=0.05, floor=-0.02)
        engine.price_cliquet(opt, n, key, cfg)  # compile
        res, dt = common.timed(engine.price_cliquet, opt, n, key, cfg)
        common.print_result(f"cliquet cap 5% floor -2% x{args.obs}",
                            res.price, res.ci, dt, res.n_paths * args.obs,
                            extra="  (path-steps/s)")
        cf = float(mcmath.cliquet_closed_form(
            args.rate, args.vol, args.maturity, args.obs, 0.05, -0.02))
        print(f"exact closed form (i.i.d. period returns): {cf:.6f}")
        return 0

    if args.product == "mlmc-barrier":
        # NOTE: BarrierOption comes from the MODULE-level import — a local
        # `from mctpu.types import BarrierOption` here would make the name
        # function-local and break the plain barrier branch above.
        from mctpu import mlmc
        opt = BarrierOption(args.spot, args.strike, args.rate, args.vol,
                            args.maturity, barrier=args.barrier, n_obs=8)
        # alpha = 1/2 sends the level ladder deep; cap it so the CLI
        # stays interactive (the remaining bias is printed via the table).
        res, dt = common.timed(mlmc.price_barrier_mlmc, opt, args.eps,
                               key, config=cfg, max_levels=8)
        cont = float(mcmath.up_and_out_call(
            args.spot, args.strike, args.rate, args.vol, args.maturity,
            args.barrier))
        print(f"mlmc barrier (continuous-monitoring target) "
              f"eps={args.eps}: {res.price:.6f} ± {res.ci:.6f}   "
              f"[{dt:.3f} s, {res.total_path_steps / dt:.3e} "
              f"path-steps/s]")
        print(f"continuous closed form (target of the telescoped sum): "
              f"{cont:.6f}")
        print("level  dates     paths        E[dP]        Var[dP]")
        for lv in res.levels:
            print(f"  {lv.level}    {lv.n_steps:5d}  {lv.n_paths:9d}  "
                  f"{lv.mean:+.3e}   {lv.var:.3e}")
        return 0

    if args.product == "mlmc-asian":
        from mctpu import mlmc
        opt = AsianOption(args.spot, args.strike, args.rate, args.vol,
                          args.maturity, n_obs=4, average=args.average)
        res, dt = common.timed(mlmc.price_asian_mlmc, opt, args.eps, key,
                               config=cfg)
        print(f"mlmc asian/{args.average} (continuous-monitoring target) "
              f"eps={args.eps}: {res.price:.6f} ± {res.ci:.6f}   "
              f"[{dt:.3f} s, {res.total_path_steps / dt:.3e} path-steps/s]")
        if args.average == "geometric":
            cf = float(mcmath.geometric_asian_call(
                args.spot, args.strike, args.rate, args.vol, args.maturity,
                res.levels[-1].n_steps))
            print(f"exact geometric closed form at the finest grid "
                  f"(n={res.levels[-1].n_steps}): {cf:.6f}")
        print("level  dates     paths        E[dP]        Var[dP]")
        for lv in res.levels:
            print(f"  {lv.level}    {lv.n_steps:5d}  {lv.n_paths:9d}  "
                  f"{lv.mean:+.3e}   {lv.var:.3e}")
        return 0

    if args.product == "cva-multi":
        import numpy as np

        from mctpu.types import CvaMultiSpec
        m = max(2, args.assets)
        corr = np.full((m, m), 0.5)
        np.fill_diagonal(corr, 1.0)
        spec = CvaMultiSpec(
            intensity=0.03, lgd=0.6, s=np.full(m, args.spot),
            v=np.full(m, args.vol), corr=corr, r=args.rate,
            t=args.maturity, strikes=np.full(m, args.strike),
            weights=np.full(m, 1.0 / m), n_grid=args.obs)
        engine.price_cva_multi(spec, n, key, cfg)  # compile
        res, dt = common.timed(engine.price_cva_multi, spec, n, key, cfg)
        common.print_result(f"cva-multi ({m} underlyings, grid {args.obs})",
                            res.cva, res.ci, dt,
                            res.n_paths * args.obs * m,
                            extra="  (asset-steps/s)")
        cf = float(mcmath.cva_multi_closed_form(
            0.03, 0.6, spec.s, spec.v, spec.strikes, spec.weights,
            args.rate, args.maturity, args.obs))
        print(f"closed form (all-long): {cf:.6f}   "
              f"z = {(float(res.cva) - cf) / float(res.std_error):+.2f}")
        return 0

    if args.product == "xva":
        import numpy as np

        from mctpu.types import CvaMultiSpec, XvaSpec
        m = max(2, args.assets)
        corr = np.full((m, m), 0.5)
        np.fill_diagonal(corr, 1.0)
        spec = XvaSpec(
            netting=CvaMultiSpec(
                intensity=0.03, lgd=0.6, s=np.full(m, args.spot),
                v=np.full(m, args.vol), corr=corr, r=args.rate,
                t=args.maturity, strikes=np.full(m, args.strike),
                weights=np.full(m, 1.0 / m), n_grid=args.obs),
            own_intensity=0.02, own_lgd=0.5, funding_spread=0.01)
        engine.price_xva(spec, n, key, cfg)  # compile
        res, dt = common.timed(engine.price_xva, spec, n, key, cfg)
        common.print_result(f"xva ({m} underlyings, grid {args.obs})",
                            res.cva.price, res.cva.ci, dt,
                            res.cva.n_paths * args.obs * m,
                            extra="  (asset-steps/s)")
        print(f"dva: {float(res.dva.price):.6f} ± {float(res.dva.ci):.6f}  "
              f"fca: {float(res.fca.price):.6f} ± {float(res.fca.ci):.6f}  "
              f"fba: {float(res.fba.price):.6f} ± {float(res.fba.ci):.6f}")
        print(f"bcva: {float(res.bcva):.6f}   fva: {float(res.fva):.6f}  "
              f"(undiscounted legs, MonteCarloKernel.cu:467 semantics)")
        legs = mcmath.xva_multi_closed_form(
            0.03, 0.6, 0.02, 0.5, 0.01, spec.netting.s, spec.netting.v,
            spec.netting.strikes, spec.netting.weights, args.rate,
            args.maturity, args.obs)
        cf = float(legs[0])
        print(f"closed form CVA (all-long): {cf:.6f}   "
              f"z = {(float(res.cva.price) - cf) / float(res.cva.std_error):+.2f}")
        return 0

    if args.product == "is":
        from mctpu.types import VanillaOption
        # Importance sampling shines deep OTM; default to 2x spot.
        k_otm = max(args.strike, 2.0 * args.spot)
        opt = VanillaOption(s=args.spot, k=k_otm, r=args.rate, v=args.vol,
                            t=args.maturity)
        theta = variance.optimal_tilt(opt)
        variance.price_vanilla_is(opt, n, key, cfg)  # compile
        res, dt = common.timed(variance.price_vanilla_is, opt, n, key, cfg)
        common.print_result(f"importance-sampled K={k_otm:.0f} "
                            f"(tilt {theta:.2f})", res.price, res.ci, dt,
                            res.n_paths, extra="  (paths/s)")
        bs = float(mcmath.bs_call(args.spot, k_otm, args.rate, args.vol,
                                  args.maturity))
        mc = engine.price_vanilla(opt, n, key, cfg)
        print(f"bs closed form: {bs:.8f}   plain-MC CI: ±{float(mc.ci):.2e}"
              f"  (IS tightens {float(mc.ci) / max(float(res.ci), 1e-30):.0f}x)")
        return 0

    if args.product == "heston":
        from mctpu.models import heston as mheston
        from mctpu.types import HestonOption
        opt = HestonOption(s=args.spot, k=args.strike, r=args.rate,
                           t=args.maturity, v0=args.vol**2, kappa=2.0,
                           theta=args.vol**2, xi=0.3, rho=-0.7)
        engine.price_heston(opt, n, key, cfg, n_steps=args.obs,
                            scheme=args.scheme)  # compile
        res, dt = common.timed(engine.price_heston, opt, n, key, cfg,
                               n_steps=args.obs, scheme=args.scheme)
        common.print_result(f"heston/{args.scheme}", res.price, res.ci, dt,
                            res.n_paths * args.obs, extra="  (path-steps/s)")
        print(f"characteristic-function price: "
              f"{float(mheston.cf_call_price(opt)):.6f}  "
              f"(v0=theta={args.vol**2:.4f}, kappa=2, xi=0.3, rho=-0.7)")
        return 0

    opt = AmericanOption(n_steps=args.obs, payoff=args.payoff, **base)
    lsm.price_american(opt, min(n, 1 << 18), key)  # compile
    res, dt = common.timed(lsm.price_american, opt, min(n, 1 << 18), key)
    common.print_result(f"american {args.payoff}", res.price, res.ci, dt,
                        res.n_paths * args.obs, extra="  (path-steps/s)")
    crr = reference.binomial_american(args.spot, args.strike, args.rate,
                                      args.vol, args.maturity,
                                      payoff=args.payoff)
    eur = (mcmath.bs_put if args.payoff == "put" else mcmath.bs_call)(
        args.spot, args.strike, args.rate, args.vol, args.maturity)
    print(f"binomial lattice (2000 steps): {crr:.6f}   "
          f"european: {float(eur):.6f}")
    bnd = lsm.price_american_bounds(opt, min(n, 1 << 16), key, n_sub=32)
    print(f"duality bracket: [{float(bnd.lower.price):.6f} "
          f"± {float(bnd.lower.ci):.6f}, {float(bnd.upper.price):.6f} "
          f"± {float(bnd.upper.ci):.6f}]   gap {bnd.gap:.6f} "
          f"({100 * bnd.gap / max(float(res.price), 1e-12):.2f}% — the "
          f"measured rule-suboptimality bias)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
