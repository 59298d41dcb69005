"""Fused Monte Carlo kernels (L2 of the framework).

Each product has two mathematically-twin backends:

* ``pallas_partials`` — the TPU fast path: one fused Pallas kernel per
  simulation block that seeds the hardware PRNG, draws bits, Box-Mullers them
  into normals, steps GBM, evaluates the payoff and tree-reduces
  ``(sum_p, sum_p2)`` entirely in VMEM/registers (replacing
  ``vanillaOptMonteCarlo`` / ``basketOptMonteCarlo`` / ``cvaCallOptMC``,
  ``MonteCarloKernel.cu:131-284``);
* ``xla_partials`` — a pure-jnp twin using ``jax.random`` Threefry streams,
  used on CPU (tests), as the non-TPU fallback, and as the statistical
  cross-check of the Pallas path.

Both return per-block partial sums shaped ``(n_blocks, 2)`` and are
shard-invariant: block ``b``'s partials depend only on (key, global block id,
plan), never on which chip ran it.
"""
from mctpu.kernels.common import Plan  # noqa: F401
