"""Worker process for the multi-process DCN rehearsal test.

Launched (twice) by tests/test_distributed.py.  Each process owns 4 virtual
CPU devices; ``jax.distributed.initialize`` stitches them into one global
8-device mesh — the same code path a real multi-host pod slice takes
(SURVEY.md §2: multi-host via ``jax.distributed.initialize``), with gloo
standing in for DCN.  Prices run through the unmodified engine over the
global mesh; the parent asserts the totals are bitwise equal to a
single-process run.

Usage: python tests/_distributed_worker.py <coordinator> <num_procs> <pid>
"""
import json
import os
import sys

coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Cross-process CPU collectives ride gloo (the CPU stand-in for DCN).
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mctpu import parallel  # noqa: E402

mesh = parallel.initialize_distributed(
    coordinator_address=coordinator, num_processes=num_procs, process_id=pid)

import mctpu  # noqa: E402
from mctpu import EngineConfig, VanillaOption  # noqa: E402

assert jax.device_count() == 4 * num_procs, jax.devices()
assert jax.local_device_count() == 4
assert mesh.devices.size == 4 * num_procs

opt = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0)
# Pinned geometry (auto_shrink off) so the parent can reproduce the exact
# same plan single-process — the documented cross-mesh-width recipe.
cfg = EngineConfig(mesh=mesh, backend="xla", num_blocks=64, rows=8,
                   auto_shrink=False)
res = mctpu.price_vanilla(opt, 1 << 18, jax.random.key(7), cfg)

print(json.dumps({
    "pid": pid,
    "n_devices": jax.device_count(),
    "price": repr(float(res.price)),
    "ci": repr(float(res.ci)),
    "sum_p": repr(float(res.sum_p)),
    "sum_p2": repr(float(res.sum_p2)),
}), flush=True)

jax.distributed.shutdown()
