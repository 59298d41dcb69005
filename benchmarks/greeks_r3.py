import time
import jax, jax.numpy as jnp
import numpy as np
from mctpu.kernels import vanilla as kvanilla
from mctpu.kernels import greeks as kgreeks
from mctpu.types import VanillaOption

assert jax.default_backend() == 'tpu'
opt = VanillaOption(s=100., k=100., r=0.048790, v=0.2, t=1.0)

def measure(fn, total_paths, label):
    np.asarray(fn(jnp.int32(42)))  # warm/compile, full sync
    times = []
    for i in range(8):
        t0 = time.perf_counter()
        p = fn(jnp.int32(43 + i))
        p.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = float(np.min(times))
    if total_paths / dt > 5e11:  # bogus instant completion: chain
        seed = jnp.int32(7)
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            p = fn(seed)
            seed = jnp.int32(8 + i) + (p[0, 0] * 0).astype(jnp.int32)
        p.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {total_paths/dt/1e9:8.2f} Gpaths/s ({dt*1e3:.1f} ms)  all={[f'{t*1e3:.0f}' for t in times]}")
    return total_paths / dt

n_paths = 1 << 34
plan_p = kvanilla.make_plan(n_paths, 512, 256, antithetic=False)
fp = jax.jit(lambda seed: kvanilla.pallas_partials(opt, seed, 0, plan_p, 512))
pp = measure(fp, plan_p.total_paths, "price ")

plan_g = kgreeks.make_plan(n_paths, 512, 256, antithetic=False)
fg = jax.jit(lambda seed: kgreeks.pallas_partials(opt, seed, 0, plan_g, 512))
pg = measure(fg, plan_g.total_paths, "greeks")
print(f"ratio: {pp/pg:.2f}x")
