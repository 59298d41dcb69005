"""Shared CLI plumbing: engine-config flags, timing, report formatting."""
from __future__ import annotations

import argparse
import time

import jax

from mctpu.engine import EngineConfig
from mctpu.types import Precision

# The reference's path-count quantum: SIMS = user input x 131072
# (vanillaOpt.cu:15,54).  Kept as the --mult unit for experiment parity.
SIM_QUANTUM = 131072


def add_engine_args(p: argparse.ArgumentParser, default_mult: int = 4):
    p.add_argument("--mult", type=int, default=default_mult,
                   help=f"path-count multiplier (x{SIM_QUANTUM}), the "
                        "reference's interactive scanf input")
    p.add_argument("--paths", type=int, default=None,
                   help="explicit number of GBM paths (overrides --mult)")
    p.add_argument("--blocks", type=int, default=512,
                   help="global simulation blocks (RNG/reduction unit)")
    p.add_argument("--rows", type=int, default=256,
                   help="on-chip tile rows (paths per tile = rows*128)")
    p.add_argument("--precision", choices=[p.value for p in Precision],
                   default=Precision.F32_KAHAN.value)
    p.add_argument("--antithetic", action="store_true",
                   help="antithetic variates (variance reduction)")
    p.add_argument("--backend", choices=["auto", "pallas", "xla"],
                   default="auto")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip-cpu", action="store_true",
                   help="skip the (slow) CPU oracle cross-check")
    p.add_argument("--mesh", action="store_true",
                   help="shard blocks over all visible devices")
    return p


def build_config(args) -> EngineConfig:
    mesh = None
    if args.mesh:
        from mctpu.parallel import path_mesh
        mesh = path_mesh()
    return EngineConfig(
        num_blocks=args.blocks,
        rows=args.rows,
        backend=args.backend,
        precision=Precision(args.precision),
        antithetic=args.antithetic,
        mesh=mesh,
    )


def n_paths(args) -> int:
    return args.paths if args.paths is not None else args.mult * SIM_QUANTUM


def cpu_engine():
    """The CPU baseline engine: native C++ when built, NumPy oracle else.

    Plays the reference's ``host_*`` role (baseline + independent
    cross-check); both implementations share the estimator semantics.
    """
    from mctpu import native, reference
    return native if native.available() else reference


def timed(fn, *a, **kw):
    """(result, seconds) with a device sync, warm timing after compile."""
    t0 = time.perf_counter()
    out = fn(*a, **kw)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready()
        if hasattr(x, "block_until_ready") else x, out)
    return out, time.perf_counter() - t0


def print_option(opt):
    """Option detail block (printOption, MonteCarloHost.c:43-49)."""
    print("-  Option data  -")
    print(f"  spot     {float(opt.s):10.2f}")
    print(f"  strike   {float(opt.k):10.2f}")
    print(f"  rate     {float(opt.r) * 100:9.3f} %")
    print(f"  vol      {float(opt.v) * 100:9.2f} %")
    print(f"  maturity {float(opt.t):10.2f} y")


def print_result(tag, price, ci, seconds, n, extra=""):
    rate = n / seconds if seconds > 0 else float("inf")
    print(f"[{tag:>10}] price={float(price):.6f}  ci=±{float(ci):.6f}  "
          f"time={seconds * 1e3:9.2f} ms  paths/s={rate:.3e}{extra}")
