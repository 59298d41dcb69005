"""Basket option experiment (replaces ``basketOpt.cu:27-144``).

Prices the reference's 3-asset equally-weighted basket (vols .2/.3/.2,
off-diagonal correlation -0.5, K=100, r=4.8790164%, T=1y:
``basketOpt.cu:33-61``) and cross-checks the accelerator engine against the
independent CPU oracle (no closed form exists for an arithmetic basket, so
this is the reference's own acceptance test, ``basketOpt.cu:122``).
``--assets N`` switches to the reference's generic-N fallback config
(``basketOpt.cu:147-177``) with runtime asset count.
"""
from __future__ import annotations

import argparse

import jax
import numpy as np

from mctpu import engine, reference
from mctpu.cli import common
from mctpu.types import BasketOption


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_engine_args(p)
    p.add_argument("--assets", type=int, default=3,
                   help="number of underlyings (runtime, not compile-time)")
    args = p.parse_args(argv)

    opt = BasketOption.default_reference(args.assets)
    n = common.n_paths(args)
    cfg = common.build_config(args)
    key = jax.random.key(args.seed)

    print("Basket Option Pricing (mctpu)")
    print(f"Underlyings: {args.assets}   Monte Carlo scenarios: {n}")
    if args.assets <= 6:
        with np.printoptions(precision=3):
            print("vols   ", np.asarray(opt.v))
            print("weights", np.asarray(opt.w))
            print("corr\n", np.asarray(opt.corr))

    cpu = None
    if not args.skip_cpu:
        eng = common.cpu_engine()
        cpu, cpu_time = common.timed(eng.price_basket, opt, n, seed=args.seed)
        tag = "cpu native" if eng is not reference else "cpu oracle"
        common.print_result(tag, cpu.price, cpu.ci, cpu_time, n)

    engine.price_basket(opt, n, key, cfg)  # compile
    res, dt = common.timed(engine.price_basket, opt, n, key, cfg)
    common.print_result(cfg.resolve_backend(), res.price, res.ci, dt,
                        res.n_paths)

    if cpu is not None:
        diff = abs(float(res.price) - cpu.price)
        se = float(np.hypot(float(res.std_error), cpu.std_error))
        print(f"\n|accelerator - cpu| = {diff:.6f} "
              f"({diff / se:.2f} combined sigma)")
        if dt > 0:
            print(f"speedup vs CPU oracle: {cpu_time / dt:.1f}x")
        return 0 if diff <= 4 * se else 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
