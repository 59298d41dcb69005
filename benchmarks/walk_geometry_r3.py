"""Walk-kernel tile-height sweep: are the serial walks latency-bound?

The GBM recurrence is serial per path, so a step's vector ops depend on the
previous step's.  At rows=8 a (rows, 128) tile is ONE vector register of
work — every op's latency is fully exposed, with no independent work to
hide it.  This sweep measures cva/heston/lsm throughput at rows in
{8, 32, 128, 256} with the total path count held fixed, using the honest
fetch-closed chained clock (see roofline.py).

Run: ``python -m benchmarks.walk_geometry_r3`` (on the real TPU).
"""
import itertools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 3
RUNS = 3


def _time(fn):
    cnt = itertools.count(1)
    np.asarray(jax.tree.leaves(fn(jnp.int32(9_000 + next(cnt))))[0])
    ts = []
    for _ in range(RUNS):
        out = fn(jnp.int32(9_000 + next(cnt)))
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(REPS):
            leaf = jax.tree.leaves(out)[0]
            seed = jnp.int32(next(cnt)) + (leaf.flatten()[0] * 0).astype(
                jnp.int32)
            out = fn(seed)
        np.asarray(jax.tree.leaves(out)[0])
        ts.append((time.perf_counter() - t0) / REPS)
    return sorted(ts)[RUNS // 2]


def main():
    assert jax.default_backend() == "tpu"
    from mctpu.kernels import cva as kcva
    from mctpu.kernels import heston as kheston
    from mctpu.kernels import lsm as klsm
    from mctpu.types import (CvaPortfolioSpec, CvaSpec, HestonOption,
                             VanillaOption)

    results = {}
    spec = CvaPortfolioSpec.from_single(
        CvaSpec(intensity=0.03, lgd=0.6,
                option=VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0),
                n_grid=500))
    hopt = HestonOption(s=100.0, k=100.0, r=0.03, t=1.0, v0=0.04, kappa=1.5,
                        theta=0.04, xi=0.5, rho=-0.7)

    print("cva500 (2^21 paths x 500 steps), rows sweep:")
    results["cva500"] = {}
    for rows in (8, 32, 128, 256):
        plan = kcva.make_plan(1 << 21, 512, rows, antithetic=False)
        fn = jax.jit(lambda s, p=plan: kcva.pallas_partials(spec, s, 0, p,
                                                            512))
        dt = _time(fn)
        rate = plan.total_paths * 500 / dt
        results["cva500"][rows] = rate
        print(f"  rows={rows:4d}: {rate/1e9:7.2f} Gsteps/s ({dt*1e3:.1f} ms)")

    print("heston_qe100 (2^23 paths x 100 steps), rows sweep:")
    results["heston_qe100"] = {}
    for rows in (8, 32, 128, 256):
        plan = kheston.make_plan(1 << 23, 512, rows, antithetic=False)
        fn = jax.jit(lambda s, p=plan: kheston.pallas_partials(
            hopt, s, 0, p, 512, 100, scheme="qe"))
        dt = _time(fn)
        rate = plan.total_paths * 100 / dt
        results["heston_qe100"][rows] = rate
        print(f"  rows={rows:4d}: {rate/1e9:7.2f} Gsteps/s ({dt*1e3:.1f} ms)")

    with open("benchmarks/walk_geometry_r3.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote benchmarks/walk_geometry_r3.json")


if __name__ == "__main__":
    main()
