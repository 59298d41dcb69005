"""Book (portfolio) kernel rate measurement — the serving throughput.

Measures ``kernels/book.py`` at several book sizes with the ROOFLINE.md
methodology (fetch-closed chained clock, best of two jit instances,
auto-sized >= 300 ms calls), and prices each against a source-counted op
budget: per path, half a Box-Muller pair (shared by the whole book) plus
per instrument one ``exp`` and ~8 vector ops (GBM fma, spot mul, strike
sub, sign mul, max, two reduce-adds, square).  The serving metric is
**instrument-marks/s** = paths/s x book size.

    python -m benchmarks.book_rate_r4
"""
from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.greeks_r4 import _rate_sized
from benchmarks.perf_r4 import load_ceilings

LANES = 128


def _book_params(m):
    from mctpu.types import VanillaBook, VanillaOption
    opts = [VanillaOption(100.0, 80.0 + 40.0 * (j % 5) / 4, 0.05,
                          0.15 + 0.05 * (j % 4), 0.5 + 0.5 * (j % 3),
                          kind="call" if j % 2 == 0 else "put")
            for j in range(m)]
    bk = VanillaBook.from_options(opts)
    o = bk.astype(jnp.float32)
    mu = (o.r - 0.5 * o.v * o.v) * o.t
    sig = o.v * jnp.sqrt(o.t)
    sgn = jnp.asarray([1.0 if kd == "call" else -1.0 for kd in bk.kinds],
                      jnp.float32)
    return (o.s, mu, sig, o.k, sgn)


def book_rate(m, rows=256):
    from mctpu.kernels import book as kbook

    params = _book_params(m)

    def mk(n):
        plan = kbook.make_plan(n, 512, rows, antithetic=False)
        fn = lambda seed: kbook.pallas_partials(params, seed, 0, plan,
                                                plan.num_blocks)
        return fn, float(plan.total_paths)

    chain = lambda i, out: (jnp.int32(100 + i)
                            + (out[0, 0, 0] * 0).astype(jnp.int32))
    rate, dt = _rate_sized(mk, 1 << 28, chain)
    c = load_ceilings()
    slots_per_path = (0.5 * c["fma"] / c["normal_pair"]
                      + m * (c["fma"] / c["exp"] + 8.0))
    ceiling = c["fma"] / slots_per_path
    return {
        "kernel": f"book{m}",
        "gpaths_per_s": rate / 1e9,
        "ginst_marks_per_s": rate * m / 1e9,
        "dt_s": dt,
        "budget_ceiling_gpaths": ceiling / 1e9,
        "pct_of_ceiling": round(100 * rate / ceiling, 1),
        "budget": "0.5 normal-pair (shared) + per instrument 1 exp "
                  "+ ~8 vec ops/path",
    }


def _raw_params(m):
    from mctpu.types import VanillaBook, VanillaOption
    opts = [VanillaOption(100.0, 80.0 + 40.0 * (j % 5) / 4, 0.05,
                          0.15 + 0.05 * (j % 4), 0.5 + 0.5 * (j % 3),
                          kind="call" if j % 2 == 0 else "put")
            for j in range(m)]
    bk = VanillaBook.from_options(opts)
    o = bk.astype(jnp.float32)
    sgn = jnp.asarray([1.0 if kd == "call" else -1.0 for kd in bk.kinds],
                      jnp.float32)
    return (o.s, o.k, o.r, o.v, o.t, sgn)


def greeks_book_rate(m, rows=256):
    from mctpu.kernels import book as kbook

    params = _raw_params(m)

    def mk(n):
        plan = kbook.make_plan(n, 512, rows, antithetic=False)
        fn = lambda seed: kbook.greek_pallas_partials(params, seed, 0, plan,
                                                      plan.num_blocks)
        return fn, float(plan.total_paths)

    chain = lambda i, out: (jnp.int32(100 + i)
                            + (out[0, 0, 0] * 0).astype(jnp.int32))
    rate, dt = _rate_sized(mk, 1 << 26, chain)
    c = load_ceilings()
    # per instrument: 1 exp + ~24 vec ops (3 shared tiles, 6 integrands,
    # 12 reduce-adds/squares)
    slots_per_path = (0.5 * c["fma"] / c["normal_pair"]
                      + m * (c["fma"] / c["exp"] + 24.0))
    ceiling = c["fma"] / slots_per_path
    return {
        "kernel": f"book{m}_greeks12",
        "gpaths_per_s": rate / 1e9,
        "ginst_greeks_per_s": rate * m * 6 / 1e9,
        "dt_s": dt,
        "budget_ceiling_gpaths": ceiling / 1e9,
        "pct_of_ceiling": round(100 * rate / ceiling, 1),
        "budget": "0.5 normal-pair (shared) + per instrument 1 exp "
                  "+ ~24 vec ops/path (6 integrands x (sum, sum^2))",
    }


def main():
    if jax.default_backend() != "tpu":
        raise SystemExit("run on the TPU (measures hardware kernels)")
    out = {}
    for m in (1, 8, 64):
        r = book_rate(m)
        out[r["kernel"]] = r
        print(json.dumps(r), flush=True)
    for m in (8, 64):
        r = greeks_book_rate(m)
        out[r["kernel"]] = r
        print(json.dumps(r), flush=True)
    import pathlib
    pathlib.Path(__file__).with_name("book_rate_r4.json").write_text(
        json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
