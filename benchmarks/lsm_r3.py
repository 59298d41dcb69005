"""On-chip LSM engine-tier benchmark: 10M x 100-step forward pass."""
import time
import jax, jax.numpy as jnp
import numpy as np
from mctpu import engine, lsm, reference
from mctpu.types import AmericanOption

assert jax.default_backend() == 'tpu'
opt = AmericanOption(s=100., k=100., r=0.05, v=0.2, t=1.0, n_steps=100,
                     payoff='put')
key = jax.random.key(11)
cfg = engine.EngineConfig(num_blocks=512, rows=32, backend='pallas')
n_paths = 10_000_000

r = lsm.price_american(opt, n_paths, key, config=cfg)  # warm (fit + compile)
bino = float(reference.binomial_american(100, 100, 0.05, 0.2, 1.0, 2000, 'put'))
print(f'price {float(r.price):.5f} +- {float(r.ci):.5f}  binomial {bino:.5f} '
      f'(lower bound gap {bino - float(r.price):.5f})  n_paths={r.n_paths}')

# time ONLY the forward pass (rule frozen): call the cached runner via
# price_american again — fit_exercise_rule is jitted+cached too, tiny.
times = []
for i in range(6):
    t0 = time.perf_counter()
    r = lsm.price_american(opt, n_paths, jax.random.key(i), config=cfg)
    jax.block_until_ready(r.price)
    times.append(time.perf_counter() - t0)
dt = float(np.min(times))
steps = r.n_paths * opt.n_steps
print(f'forward pass: {steps/dt/1e9:.2f} Gpath-steps/s ({dt*1e3:.1f} ms)  '
      f'all={[f"{t*1e3:.0f}" for t in times]}')
