import time
import jax, jax.numpy as jnp
import numpy as np
from mctpu import math as mcmath
from mctpu.kernels import basket as kbasket
from mctpu.kernels import greeks as kgreeks
from mctpu.types import BasketOption

assert jax.default_backend() == 'tpu'
opt = BasketOption.default_reference(3)
chol = mcmath.cholesky_lower(jnp.asarray(np.asarray(opt.corr), jnp.float32))

def measure(fn, total_paths, label):
    np.asarray(jax.tree.leaves(fn(jnp.int32(42)))[0])
    times = []
    for i in range(8):
        t0 = time.perf_counter()
        p = fn(jnp.int32(43 + i))
        jax.block_until_ready(p)
        times.append(time.perf_counter() - t0)
    dt = float(np.min(times))
    print(f"{label}: {total_paths/dt/1e9:8.2f} Gpaths/s ({dt*1e3:.1f} ms)")
    return total_paths / dt

n_paths = 1 << 31
plan_p = kbasket.make_plan(n_paths, 512, 256, antithetic=False, n_assets=3)
fp = jax.jit(lambda s: kbasket.pallas_partials(opt, chol, s, 0, plan_p, 512))
pp = measure(fp, plan_p.total_paths, "basket price ")

plan_g = kgreeks.make_basket_plan(n_paths, 512, 256, antithetic=False, n_assets=3)
fg = jax.jit(lambda s: kgreeks.pallas_basket_partials(opt, chol, s, 0, plan_g, 512))
pg = measure(fg, plan_g.total_paths, "basket greeks")
print(f"ratio: {pp/pg:.2f}x")
