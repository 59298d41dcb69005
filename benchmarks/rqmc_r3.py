import time
import jax, numpy as np
from mctpu import engine, math as mcmath, qmc_engine
from mctpu.types import VanillaOption, BasketOption

assert jax.default_backend() == 'tpu'
opt = VanillaOption(s=100., k=100., r=0.048790, v=0.2, t=1.0)
key = jax.random.key(5)
cfg = engine.EngineConfig(backend='pallas', rows=256)
bs = float(mcmath.bs_call(100,100,0.048790,0.2,1))

r = qmc_engine.price_vanilla_rqmc(opt, 1<<21, key, cfg, replicates=32)
z = (float(r.price)-bs)/float(r.std_error)
print(f'vanilla rqmc on-chip: {float(r.price):.6f} +- {float(r.ci):.6f}  z={z:.2f}  n_paths={r.n_paths}')

# throughput (points/s) at a large net
t0=time.perf_counter()
r2 = qmc_engine.price_vanilla_rqmc(opt, 1<<25, key, cfg, replicates=32)
jax.block_until_ready(r2.price); t1=time.perf_counter()-t0  # includes compile
times=[]
for i in range(5):
    t0=time.perf_counter()
    r2 = qmc_engine.price_vanilla_rqmc(opt, 1<<25, jax.random.key(i), cfg, replicates=32)
    jax.block_until_ready(r2.price)
    times.append(time.perf_counter()-t0)
dt=min(times)
print(f'vanilla rqmc: {r2.n_paths/dt/1e9:.2f} Gpts/s  ({dt*1e3:.1f} ms, {r2.n_paths:.3g} pts) z={(float(r2.price)-bs)/float(r2.std_error):.2f} ci={float(r2.ci):.2e}')

bopt = BasketOption.default_reference(3)
rb = qmc_engine.price_basket_rqmc(bopt, 1<<20, key, cfg, replicates=32)
print(f'basket rqmc on-chip: {float(rb.price):.6f} +- {float(rb.ci):.6f} n_paths={rb.n_paths}')
