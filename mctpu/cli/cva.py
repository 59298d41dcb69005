"""CVA experiment (replaces ``cvaOpt.cu:30-111``).

Computes the CVA of a European call (default intensity 3%, LGD 60%, S=K=100,
r=5%, v=20%, T=1y: ``cvaOpt.cu:22-28,33-34``) over a sweep of exposure-grid
sizes — the reference's self-consistency sweep (``cvaOpt.cu:70-97``) upgraded
with an exact closed-form column (martingale identity,
:func:`mctpu.math.cva_closed_form`) and the expected-exposure profile.
"""
from __future__ import annotations

import argparse

import jax
import numpy as np

from mctpu import engine, reference
from mctpu.cli import common
from mctpu.models import cva as mcva
from mctpu.types import CvaSpec, VanillaOption


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_engine_args(p, default_mult=1)
    p.add_argument("--intensity", type=float, default=0.03)
    p.add_argument("--recovery", type=float, default=0.4)
    p.add_argument("--grids", type=int, nargs="+",
                   default=[25, 50, 75, 250, 500],
                   help="exposure grid sizes to sweep (cvaOpt.cu:70)")
    p.add_argument("--profile", action="store_true",
                   help="print the expected-exposure profile")
    p.add_argument("--strikes", type=float, nargs="+", default=None,
                   help="portfolio strike ladder (with --weights: netted "
                        "portfolio CVA instead of the single call)")
    p.add_argument("--weights", type=float, nargs="+", default=None,
                   help="portfolio position weights (negatives = short)")
    p.add_argument("--wwr-b", type=float, default=0.0,
                   help="wrong-way-risk loading b: hazard h = intensity * "
                        "exp(b*z - b^2/2) with z the standardized log-"
                        "return (b > 0 raises call-portfolio CVA)")
    args = p.parse_args(argv)

    opt = VanillaOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0)
    lgd = 1.0 - args.recovery
    n = common.n_paths(args)
    cfg = common.build_config(args)
    key = jax.random.key(args.seed)

    print("CVA of a European call (mctpu)")
    print(f"default intensity {args.intensity:.2f}, LGD {lgd:.2f}, "
          f"paths {n}")
    common.print_option(opt)
    print()

    portfolio = args.strikes is not None or args.wwr_b != 0.0
    if args.strikes is None:
        args_strikes, default_weights = [100.0], [1.0]
    else:
        args_strikes, default_weights = args.strikes, [1.0] * len(args.strikes)
    if args.wwr_b != 0.0:
        print(f"wrong-way risk: b={args.wwr_b}")
    if portfolio:
        weights = args.weights if args.weights is not None else default_weights
        if len(weights) != len(args_strikes):
            p.error("--strikes and --weights must have the same length")
        print(f"portfolio: strikes={args_strikes} weights={weights}")

    ok = True
    for g in args.grids:
        if portfolio:
            from mctpu import math as mcmath
            from mctpu.types import CvaPortfolioSpec
            port = CvaPortfolioSpec(
                intensity=args.intensity, lgd=lgd, s=opt.s, r=opt.r,
                v=opt.v, t=opt.t, strikes=np.asarray(args_strikes),
                weights=np.asarray(weights), wwr_b=args.wwr_b, n_grid=g)
            engine.price_cva_portfolio(port, n, key, cfg)  # compile
            res, dt = common.timed(engine.price_cva_portfolio, port, n, key, cfg)
            if all(w >= 0 for w in weights) and args.wwr_b == 0.0:
                want = float(mcmath.cva_portfolio_closed_form(
                    args.intensity, lgd, opt.s, opt.r, opt.v, opt.t,
                    args_strikes, weights, g))
                z = abs(float(res.cva) - want) / float(res.std_error)
            else:
                # netting / wrong-way risk: no closed form; cross-check the
                # first grid against the independent NumPy oracle below.
                want, z = float("nan"), 0.0
        else:
            spec = CvaSpec(intensity=args.intensity, lgd=lgd, option=opt,
                           n_grid=g)
            want = float(mcva.closed_form(spec))
            engine.price_cva(spec, n, key, cfg)  # compile
            res, dt = common.timed(engine.price_cva, spec, n, key, cfg)
            z = abs(float(res.cva) - want) / float(res.std_error)
        ok &= z < 4
        print(f"grid={g:4d}  cva={float(res.cva):.6f}  "
              f"ci=±{float(res.ci):.6f}  closed_form={want:.6f}  "
              f"z={z:5.2f}  time={dt * 1e3:9.2f} ms")
        if args.profile:
            ee = np.asarray(res.expected_exposure)
            with np.printoptions(precision=4, threshold=16):
                print(f"  E[exposure] profile: {ee}")
        if not args.skip_cpu and g == args.grids[0]:
            if portfolio:
                ora = reference.price_cva_portfolio(
                    args.intensity, lgd, float(opt.s), float(opt.r),
                    float(opt.v), float(opt.t), args_strikes, weights,
                    n_grid=g, n_paths=min(n, 1 << 16), seed=args.seed,
                    wwr_b=args.wwr_b)
                print(f"  cpu oracle (grid={g}): {ora.price:.6f} "
                      f"± {ora.ci:.6f}")
            else:
                eng = common.cpu_engine()
                ora = eng.price_cva(spec, min(n, 1 << 16), seed=args.seed)
                tag = "cpu native" if eng is not reference else "cpu oracle"
                print(f"  {tag} (grid={g}): {ora.price:.6f} ± {ora.ci:.6f}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
