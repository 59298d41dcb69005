"""Counter-based random streams (replaces the reference's curand state pool).

The reference allocates one XORWOW state per CUDA thread, seeded by a
``randomSetup`` kernel with per-*block* seeds (``MonteCarloKernel.cu:286-291``)
— a scheme with no cross-seed independence guarantee and a fixed deterministic
seed (SURVEY.md §3.5).  The TPU-native replacement is counter-based:

* at the JAX level, each *simulation block* ``b`` gets an independent Threefry
  stream ``fold_in(key, b)`` — reproducible and shard-invariant by
  construction (block ``b`` draws the same numbers no matter which chip runs
  it, so resharding a run never changes its partial sums);
* inside Pallas kernels, the per-core hardware PRNG is seeded from
  ``(seed, global_block_id)`` and raw bits are shaped into normals with the
  same Box-Muller transform as the reference CPU path
  (``MonteCarloHost.c:118-122``), vectorized over (sublane, lane) tiles.

``uniform_from_bits`` / ``box_muller`` are pure jnp functions shared by the
Pallas kernels and their interpret-mode tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "block_keys",
    "normal_block",
    "uniform_from_bits",
    "box_muller",
    "key_to_seed",
]

TWO_PI = 6.283185307179586


def block_keys(key: jax.Array, block_offset: int, n_blocks: int) -> jax.Array:
    """Independent per-block keys for global block ids [offset, offset+n)."""
    ids = jnp.arange(n_blocks, dtype=jnp.uint32) + jnp.uint32(block_offset)
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(ids)


def normal_block(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Standard normals for one block's sub-stream (XLA backend path)."""
    return jax.random.normal(key, shape, dtype=dtype)


def key_to_seed(key: jax.Array) -> jax.Array:
    """Collapse a JAX PRNG key to one int32 seed for the in-kernel PRNG.

    The Pallas TPU PRNG is seeded per kernel program with
    ``prng_seed(seed, global_block_id)``; mixing both key words keeps distinct
    user keys on distinct hardware streams.
    """
    data = jax.random.key_data(key).astype(jnp.uint32)
    mixed = data[..., 0] ^ (data[..., 1] * jnp.uint32(2654435761))
    return mixed.astype(jnp.int32)


def uniform_from_bits(bits_u32: jax.Array) -> jax.Array:
    """Map uint32 bits to f32 uniforms in [0, 1) via the mantissa trick.

    Sets the exponent to place the value in [1, 2) using the top 23 random
    bits as mantissa, then subtracts 1 — no int->float conversion needed (TPU
    has no fast u32->f32 cast).
    """
    mant = (bits_u32 >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
    return jax.lax.bitcast_convert_type(mant, jnp.float32) - 1.0


def box_muller(bits1_u32: jax.Array, bits2_u32: jax.Array):
    """Two independent standard-normal arrays from two uint32 bit arrays.

    ``u1`` is mapped to (0, 1] so ``log(u1)`` is finite.  Same transform as
    the reference host RNG (``MonteCarloHost.c:118-122``), returning both the
    cosine and sine branches (the reference discards the sine; using both
    halves the per-normal bit cost).
    """
    u1 = 1.0 - uniform_from_bits(bits1_u32)  # (0, 1]
    u2 = uniform_from_bits(bits2_u32)  # [0, 1)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = TWO_PI * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)
