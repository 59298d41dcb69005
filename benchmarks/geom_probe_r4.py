"""Throwaway geometry probe for the weak round-4 Greek kernels.

Measures cva_multi / rainbow / ladder Greek kernels across block
geometries to locate the latency-vs-ceiling knee (the greeks_r4.py rows
used (256,16)/(512,32); the engine default is 512x256).
"""
from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.perf_r4 import _chained_rate
from benchmarks.greeks_r4 import _chol, _scalar_chain, _rate_sized, _budget_rate

assert jax.default_backend() == "tpu"

WHICH = sys.argv[1] if len(sys.argv) > 1 else "cva_multi"


def cva_multi_at(blocks, rows):
    from mctpu.kernels import cva_multi as kmulti
    from mctpu.types import CvaMultiSpec

    n_grid = 50
    spec = CvaMultiSpec(intensity=0.03, lgd=0.6,
                        s=np.array([100.0, 95.0]), v=np.array([0.2, 0.3]),
                        corr=np.array([[1.0, 0.4], [0.4, 1.0]]), r=0.05,
                        t=1.0, strikes=np.array([100.0, 90.0]),
                        weights=np.array([1.0, 0.5]), n_grid=n_grid)
    chol = _chol(spec.corr)

    def mk(n):
        plan = kmulti.make_plan(n, blocks, rows, False, n_underlyings=2)

        def build(seed):
            out, vecs = kmulti.greek_pallas_partials(
                spec, chol, seed, 0, plan, plan.num_blocks)
            return out

        return build, plan.total_paths * n_grid

    rate, dt = _rate_sized(mk, 1 << 22, _scalar_chain(80))
    print(json.dumps({"kernel": f"cva_multi2_greeks50[{blocks}x{rows}]",
                      "gsteps_per_s": rate / 1e9, "dt_s": dt}), flush=True)


def rainbow_at(blocks, rows):
    from mctpu.kernels import rainbow as krainbow
    from mctpu.types import RainbowOption

    opt = RainbowOption(s=np.array([100.0, 95.0]), v=np.array([0.2, 0.3]),
                        corr=np.array([[1.0, 0.5], [0.5, 1.0]]), k=100.0,
                        r=0.05, t=1.0)
    chol = _chol(opt.corr)

    def mk(n):
        plan = krainbow.make_plan(n, blocks, rows, False, n_assets=2)
        build = lambda seed: krainbow.greek_pallas_partials(
            opt, chol, seed, 0, plan, plan.num_blocks)
        return build, plan.total_paths

    rate, dt = _rate_sized(mk, 1 << 28, _scalar_chain(50))
    print(json.dumps({"kernel": f"rainbow2_greeks[{blocks}x{rows}]",
                      "gpaths_per_s": rate / 1e9, "dt_s": dt}), flush=True)


def ladder_at(blocks, rows):
    from mctpu.kernels import ladder as kladder
    from mctpu.types import VanillaOption

    opt = VanillaOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0)
    strikes = jnp.linspace(80.0, 120.0, 9)

    def mk(n):
        plan = kladder.make_plan(n, blocks, rows, False)
        build = lambda seed: kladder.greek_pallas_partials(
            opt, strikes, seed, 0, plan, plan.num_blocks)
        return build, plan.total_paths

    rate, dt = _rate_sized(
        mk, 1 << 26,
        lambda i, out: jnp.int32(70 + i)
        + (out[0, 0, 0] * 0).astype(jnp.int32))
    print(json.dumps({"kernel": f"ladder9_greeks[{blocks}x{rows}]",
                      "gpaths_per_s": rate / 1e9, "dt_s": dt}), flush=True)


if WHICH == "cva_multi":
    for blocks, rows in ((256, 64), (256, 256), (512, 256)):
        cva_multi_at(blocks, rows)
elif WHICH == "rainbow":
    for blocks, rows in ((512, 128), (512, 256)):
        rainbow_at(blocks, rows)
elif WHICH == "ladder":
    for blocks, rows in ((512, 128), (512, 256)):
        ladder_at(blocks, rows)
