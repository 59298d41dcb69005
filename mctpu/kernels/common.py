"""Shared kernel plumbing: block plans, in-kernel RNG, Kahan scalar loops.

The reference sizes its launch as ``numBlocks x numThreads`` with
``path = sims / numBlocks`` simulations per block (integer division — the
remainder is silently dropped, ``MonteCarloKernel.cu:492,509,526``).  Here a
:class:`Plan` rounds the requested path count *up* to a whole number of
(block, iteration) tiles and reports the exact simulated count.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mctpu import rng as mcrng

__all__ = ["Plan", "LANES", "draw_normal_pair", "chunk_sums",
           "walk_pairwise"]

LANES = 128


@dataclasses.dataclass(frozen=True)
class Plan:
    """Static launch geometry for one Monte Carlo run.

    ``num_blocks`` is the *global* number of simulation blocks (the RNG-stream
    and reduction unit, analogous to a CUDA block); it never changes with the
    mesh, which only decides how blocks are distributed over chips.

    ``rows`` is the sublane count of one on-chip tile: each inner iteration
    processes ``rows x 128`` lanes of paths at once.

    ``paths_per_iter`` counts GBM paths evaluated per iteration per block and
    is product-specific (vanilla uses both Box-Muller branches, CVA one).
    ``units_per_iter`` counts i.i.d. estimator samples (= pairs when
    antithetic variates are on).
    """

    num_blocks: int
    iters: int
    rows: int
    paths_per_iter: int
    units_per_iter: int
    antithetic: bool
    dtype: str = "float32"  # hot-loop compute dtype
    kahan: bool = True

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @property
    def paths_per_block(self) -> int:
        return self.iters * self.paths_per_iter

    @property
    def total_paths(self) -> int:
        return self.num_blocks * self.paths_per_block

    @property
    def total_units(self) -> int:
        return self.num_blocks * self.iters * self.units_per_iter

    @staticmethod
    def plan(n_paths: int, num_blocks: int, rows: int, paths_per_iter: int,
             units_per_iter: int, antithetic: bool, dtype: str, kahan: bool) -> "Plan":
        iters = max(1, -(-n_paths // (num_blocks * paths_per_iter)))
        return Plan(
            num_blocks=num_blocks,
            iters=iters,
            rows=rows,
            paths_per_iter=paths_per_iter,
            units_per_iter=units_per_iter,
            antithetic=antithetic,
            dtype=dtype,
            kahan=kahan,
        )


# ---------------------------------------------------------------------------
# In-kernel (Pallas) RNG: bits -> normal pair
# ---------------------------------------------------------------------------

def draw_normal_pair(shape):
    """Two (shape)-arrays of f32 standard normals from the seeded TPU PRNG.

    Must run after ``pltpu.prng_seed``; consumes 2 x 32 bits per lane and
    yields both Box-Muller branches (the reference's curand draw is one normal
    per 32+ bits; this is 1 normal per 32 bits).
    """
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return mcrng.box_muller(b1, b2)


def chunk_sums(p):
    """(sum, sum of squares) of one payoff tile, reduced on the VPU."""
    return jnp.sum(p), jnp.sum(p * p)


def walk_pairwise(shape, n_steps: int, step_fn, init):
    """Drive a per-step walk consuming BOTH Box-Muller branches.

    ``step_fn(j, z, carry) -> carry`` advances one grid step.  A naive
    one-draw-per-step walk computes a full Box-Muller pair and discards the
    sine branch every step; pairing two steps per iteration halves the
    bits-generation and log/sqrt cost of the walk kernels (CVA/Asian/
    barrier).  ``j`` arrives in order 0..n_steps-1; odd step counts take one
    trailing half-pair.
    """
    half = n_steps // 2

    def body(jj, carry):
        z1, z2 = draw_normal_pair(shape)
        carry = step_fn(2 * jj, z1, carry)
        return step_fn(2 * jj + 1, z2, carry)

    carry = jax.lax.fori_loop(0, half, body, init)
    if n_steps % 2:
        z1, _ = draw_normal_pair(shape)
        carry = step_fn(n_steps - 1, z1, carry)
    return carry
