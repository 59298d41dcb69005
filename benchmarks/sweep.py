"""BASELINE.json config sweep: one JSON line per benchmark config.

The five configurations from /root/repo/BASELINE.json:

1. European vanilla call, 1M paths, f64 — error vs closed form
2. Basket option, 10 correlated underlyings, 10M paths
3. CVA of a call: 50-step exposure grid + hazard-rate default leg
4. Precision parity: f32 vs f64 vs f32+Kahan at 1e8 paths, antithetic variates
5. Multi-chip scaling: 1e9 paths sharded over a path mesh, 100-asset basket

Usage: python benchmarks/sweep.py [--quick] [--configs 1 2 ...]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import jax
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
jax.config.update("jax_enable_x64", True)

from mctpu import engine, math as mcmath  # noqa: E402
from mctpu.models import cva as mcva  # noqa: E402
from mctpu.types import (BasketOption, CvaSpec, Precision,  # noqa: E402
                         VanillaOption)

OPT = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0)
CVA_OPT = VanillaOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0)
KEY = jax.random.key(2024)


def _emit(name, seconds, n_paths, steps_per_path=1, **extra):
    rec = {
        "config": name,
        "seconds": round(seconds, 5),
        "paths": n_paths,
        "path_steps_per_sec": round(n_paths * steps_per_path / seconds, 1),
    }
    rec.update(extra)
    print(json.dumps(rec))


WARM_KEY = jax.random.key(777)


def _fetch(out):
    """Honest completion barrier: materialize every array leaf.

    Through the remote tunnel ``block_until_ready`` can report completion
    before execution, and repeat executions with identical arguments can
    be served without running (benchmarks/ROOFLINE.md) — so the warmup
    uses a DIFFERENT key than the timed call and the clock closes on a
    value fetch.
    """
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "__array__") else x, out)


def _timed(fn_of_key):
    _fetch(fn_of_key(WARM_KEY))  # compile + drain with a distinct key
    t0 = time.perf_counter()
    out = fn_of_key(KEY)
    _fetch(out)
    return out, time.perf_counter() - t0


def config1_vanilla_f64(quick):
    n = 1 << 20
    cfg = engine.EngineConfig(precision=Precision.F64, backend="xla",
                              num_blocks=64, rows=32)
    res, dt = _timed(lambda k: engine.price_vanilla(OPT, n, k, cfg))
    bs = float(mcmath.bs_call(OPT.s, OPT.k, OPT.r, OPT.v, OPT.t))
    _emit("vanilla_1M_f64_vs_closed_form", dt, res.n_paths,
          price=float(res.price), closed_form=bs,
          abs_error=abs(float(res.price) - bs), ci=float(res.ci),
          within_3sigma=bool(abs(float(res.price) - bs)
                             <= 3 * float(res.std_error) * np.exp(-0.048790)))


def config2_basket10(quick):
    n = 1 << 20 if quick else 10_000_000
    opt = BasketOption.default_reference(10)
    res, dt = _timed(lambda k: engine.price_basket(opt, n, k))
    _emit("basket_10assets_10M", dt, res.n_paths,
          price=float(res.price), ci=float(res.ci))


def config3_cva50(quick):
    n = 1 << 17 if quick else 1 << 20
    spec = CvaSpec(intensity=0.03, lgd=0.6, option=CVA_OPT, n_grid=50)
    cfg = engine.EngineConfig(num_blocks=64, rows=32)
    res, dt = _timed(lambda k: engine.price_cva(spec, n, k, cfg))
    want = float(mcva.closed_form(spec))
    _emit("cva_grid50_default_leg", dt, res.n_paths, steps_per_path=50,
          cva=float(res.cva), closed_form=want, ci=float(res.ci),
          within_3sigma=bool(abs(float(res.cva) - want)
                             <= 3 * float(res.std_error)),
          ee_first=float(res.expected_exposure[0]),
          ee_last=float(res.expected_exposure[-1]))


def config4_precision_parity(quick):
    n = 1 << 22 if quick else 100_000_000
    prices = {}
    for prec in (Precision.F32, Precision.F32_KAHAN, Precision.F64):
        cfg = engine.EngineConfig(precision=prec, antithetic=True,
                                  backend="xla" if prec is Precision.F64
                                  else "auto")
        res, dt = _timed(lambda k: engine.price_vanilla(OPT, n, k, cfg))
        prices[prec.value] = float(res.price)
        _emit(f"precision_parity_{prec.value}_antithetic", dt, res.n_paths,
              price=float(res.price), ci=float(res.ci))
    spread = max(prices.values()) - min(prices.values())
    print(json.dumps({"config": "precision_parity_spread",
                      "max_abs_spread": spread,
                      "note": "f32/f32_kahan/f64 draw different streams; "
                              "spread must sit inside MC error"}))


def config5_multichip(quick):
    from mctpu.parallel import path_mesh
    devs = jax.devices()
    n = 1 << 22 if quick or len(devs) == 1 else 1 << 30
    mesh = path_mesh(devs) if len(devs) > 1 else None
    opt = BasketOption.equicorrelated(100, rho=0.3)
    cfg = engine.EngineConfig(mesh=mesh, num_blocks=512, rows=128,
                              backend="xla" if jax.default_backend() == "cpu"
                              else "auto")
    res, dt = _timed(lambda k: engine.price_basket(opt, n, k, cfg))
    _emit("multichip_1e9_100asset_basket", dt, res.n_paths,
          devices=len(devs) if mesh else 1,
          price=float(res.price), ci=float(res.ci))


CONFIGS = {1: config1_vanilla_f64, 2: config2_basket10, 3: config3_cva50,
           4: config4_precision_parity, 5: config5_multichip}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--quick", action="store_true",
                   help="reduced path counts (CI / CPU-friendly)")
    p.add_argument("--configs", type=int, nargs="+",
                   default=sorted(CONFIGS))
    args = p.parse_args(argv)
    for c in args.configs:
        CONFIGS[c](args.quick)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
