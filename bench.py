"""Benchmark: GBM path-steps/sec/chip on the fused vanilla Pallas kernel.

Headline metric per BASELINE.json: terminal-GBM Monte Carlo throughput
(1 path-step per vanilla path: draw normal -> GBM exp -> payoff -> reduce),
target >= 1e9 path-steps/sec/chip.  Prints exactly one JSON line.

Run on a TPU; falls back to the XLA backend elsewhere (reported as such).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PATH_STEPS = 1e9  # BASELINE.json north-star, per chip


def main() -> None:
    from mctpu import math as mcmath
    from mctpu.kernels import vanilla as kvanilla
    from mctpu.types import VanillaOption

    on_tpu = jax.default_backend() == "tpu"
    opt = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0)
    # 512 blocks x 512 iters x 65536 paths/iter = 1.7e10 paths per call.
    n_paths = 1 << 34 if on_tpu else 1 << 22
    num_blocks = 512 if on_tpu else 8
    rows = 256 if on_tpu else 8
    plan = kvanilla.make_plan(n_paths, num_blocks, rows, antithetic=False)

    if on_tpu:
        fn = jax.jit(lambda seed: kvanilla.pallas_partials(
            opt, seed, 0, plan, plan.num_blocks))
        arg = lambda i: jnp.int32(42 + i)
    else:
        fn = jax.jit(lambda k: kvanilla.xla_partials(
            opt, k, 0, plan, plan.num_blocks))
        arg = lambda i: jax.random.key(i)

    # Warm up (compile) with a full host sync, then timed repetitions.
    # Best-of-N: the remote-tunnel runtime adds hundreds-of-ms jitter on some
    # dispatches; the fastest rep is the closest to true device time.
    np.asarray(fn(arg(0)))
    times = []
    for i in range(8):
        t0 = time.perf_counter()
        partials = fn(arg(i + 1))
        partials.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = float(np.min(times))
    # Physical ceiling guard: the remote-tunnel runtime occasionally reports
    # a bogus instant completion; fall back to data-dependent chained timing.
    if plan.total_paths / dt > 5e11:
        t0 = time.perf_counter()
        seed = jnp.int32(7)
        reps = 3
        for i in range(reps):
            partials = fn(seed)
            seed = jnp.int32(8 + i) + (partials[0, 0] * 0).astype(jnp.int32)
        partials.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
    paths_per_sec = plan.total_paths / dt

    # Accuracy gate: the benchmark result must be a *correct* price.
    p = np.asarray(partials, np.float64)
    s, s2 = p[:, 0].sum(), p[:, 1].sum()
    n = plan.total_paths
    price = np.exp(-float(opt.r) * float(opt.t)) * s / n
    se = (np.exp(-float(opt.r) * float(opt.t))
          * np.sqrt(max(n * s2 - s * s, 0.0) / (n * (n - 1.0))) / np.sqrt(n))
    bs = float(mcmath.bs_call(opt.s, opt.k, opt.r, opt.v, opt.t))
    if abs(price - bs) > 5 * se:
        raise SystemExit(
            f"accuracy gate failed: price={price} bs={bs} se={se}")

    print(json.dumps({
        "metric": "vanilla_gbm_path_steps_per_sec_per_chip",
        "value": round(paths_per_sec, 1),
        "unit": "path-steps/s/chip",
        "vs_baseline": round(paths_per_sec / BASELINE_PATH_STEPS, 3),
    }))


if __name__ == "__main__":
    main()
