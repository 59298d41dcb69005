"""Vanilla European call experiment (replaces ``vanillaOpt.cu:28-109``).

Prices the reference's hard-coded option (S=K=100, r=4.879%, v=20%, T=1y:
``vanillaOpt.cu:22-26``) by Monte Carlo on the accelerator, cross-checks
against the Black-Scholes closed form and the independent CPU oracle, and
reports |MC - BS|, the 95% CI, timings and the CPU/accelerator speedup —
the same experiment, scanf replaced by flags.
"""
from __future__ import annotations

import argparse

import jax

from mctpu import engine, math as mcmath, reference
from mctpu.cli import common
from mctpu.types import VanillaOption


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_engine_args(p)
    p.add_argument("--spot", type=float, default=100.0)
    p.add_argument("--strike", type=float, default=100.0)
    p.add_argument("--rate", type=float, default=0.048790)
    p.add_argument("--vol", type=float, default=0.2)
    p.add_argument("--maturity", type=float, default=1.0)
    p.add_argument("--put", action="store_true",
                   help="price a European put instead of a call")
    p.add_argument("--sampler", choices=["mc", "lattice", "sobol"],
                   default="mc",
                   help="plain Monte Carlo or randomized QMC point sets")
    args = p.parse_args(argv)

    opt = VanillaOption(s=args.spot, k=args.strike, r=args.rate,
                        v=args.vol, t=args.maturity,
                        kind="put" if args.put else "call")
    n = common.n_paths(args)
    cfg = common.build_config(args)
    key = jax.random.key(args.seed)

    print("Vanilla Option Pricing (mctpu)")
    print(f"Monte Carlo scenarios: {n}")
    common.print_option(opt)

    bs_fn = mcmath.bs_put if args.put else mcmath.bs_call
    bs = float(bs_fn(opt.s, opt.k, opt.r, opt.v, opt.t))
    print(f"\nBlack & Scholes {'put' if args.put else 'call'} price: "
          f"{bs:.6f}\n")

    cpu_time = None
    if not args.skip_cpu:
        cpu = common.cpu_engine()
        ora, cpu_time = common.timed(
            cpu.price_vanilla, opt, n, seed=args.seed,
            antithetic=args.antithetic)
        tag = "cpu native" if cpu is not reference else "cpu oracle"
        common.print_result(tag, ora.price, ora.ci, cpu_time, n,
                            extra=f"  |MC-BS|={abs(ora.price - bs):.6f}")

    # Compile once, then report warm timing (the reference times a single
    # launch after its separate init phase: MonteCarloKernel.cu:381-387).
    if args.sampler == "mc":
        price_fn, tag = engine.price_vanilla, cfg.resolve_backend()
        price_fn(opt, n, key, cfg)
        res, dt = common.timed(price_fn, opt, n, key, cfg)
    else:
        if args.put:
            p.error("QMC samplers currently price calls")
        from mctpu import qmc, sobol
        price_fn = (qmc.price_vanilla_qmc if args.sampler == "lattice"
                    else sobol.price_vanilla_sobol)
        tag = args.sampler
        price_fn(opt, max(n // 16, 1024), key)
        res, dt = common.timed(price_fn, opt, max(n // 16, 1024), key)
    diff = abs(float(res.price) - bs)
    common.print_result(tag, res.price, res.ci, dt,
                        res.n_paths, extra=f"  |MC-BS|={diff:.6f}")
    within = diff <= 3 * float(res.std_error)
    print(f"\n|MC-BS| within 3 sigma: {within}")
    if cpu_time is not None and dt > 0:
        print(f"speedup vs CPU oracle: {cpu_time / dt:.1f}x")
    return 0 if within else 1


if __name__ == "__main__":
    raise SystemExit(main())
