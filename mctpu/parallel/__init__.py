"""Parallelism layer: device meshes and deterministic cross-block reduction.

The reference's only parallelism is data parallelism over Monte Carlo paths
(CUDA grid of blocks x threads, with a shared-memory tree reduction per block
and a serial host loop across blocks: ``MonteCarloKernel.cu:147-220,406-420``).
Here the same strategy spans chips: the path-block axis is sharded over a 1-D
``jax.sharding.Mesh`` and per-block partial sums are combined by collectives
(the host loop disappears into the jitted program).  See SURVEY.md §2
"Parallelism strategies" for why TP/PP/SP/EP are intentionally N/A.
"""
from mctpu.parallel.mesh import initialize_distributed, path_mesh  # noqa: F401
from mctpu.parallel.reduce import pairwise_tree_sum  # noqa: F401
