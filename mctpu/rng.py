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
    "sincos_2pi_bits",
    "key_to_seed",
    "philox4x32",
]

TWO_PI = 6.283185307179586

# ---------------------------------------------------------------------------
# Philox-4x32 counter PRNG (Salmon, Moraes, Dror & Shaw, SC'11)
# ---------------------------------------------------------------------------
# A known-good counter generator in pure u32 vector ops (no u64, no carries
# across words), so it runs identically on the TPU VPU, in Pallas interpret
# mode, and on any non-TPU Pallas backend.  It backs the interpret-mode
# emulation of the hardware PRNG (mctpu.kernels.common) and is the portable
# in-kernel bits source where ``pltpu.prng_random_bits`` does not exist.

_PHILOX_M0 = 0xD2511F53
_PHILOX_M1 = 0xCD9E8D57
_PHILOX_W0 = 0x9E3779B9  # golden ratio
_PHILOX_W1 = 0xBB67AE85  # sqrt(3) - 1


def _umulhilo(a: int, b: jax.Array):
    """(hi, lo) 32-bit halves of the 64-bit product, u32 ops only.

    TPUs have no u64; the high half is assembled from 16-bit partial
    products (the standard schoolbook split — carries cannot overflow u32).
    """
    a = jnp.uint32(a)
    b = jnp.asarray(b, jnp.uint32)
    lo = a * b
    a0, a1 = a & jnp.uint32(0xFFFF), a >> jnp.uint32(16)
    b0, b1 = b & jnp.uint32(0xFFFF), b >> jnp.uint32(16)
    t = a1 * b0 + ((a0 * b0) >> jnp.uint32(16))
    w = a0 * b1 + (t & jnp.uint32(0xFFFF))
    hi = a1 * b1 + (t >> jnp.uint32(16)) + (w >> jnp.uint32(16))
    return hi, lo


def philox4x32(key, ctr, rounds: int = 10):
    """Philox-4x32 block: 2-word key + 4-word counter -> 4 u32 words.

    ``key`` is ``(k0, k1)`` and ``ctr`` ``(c0, c1, c2, c3)``; all u32 arrays
    (broadcastable).  ``rounds=10`` is the Random123 default (7+ passes
    BigCrush).  Verified against the Random123 known-answer vectors in
    tests/test_rng.py.
    """
    k0, k1 = (jnp.asarray(k, jnp.uint32) for k in key)
    c0, c1, c2, c3 = (jnp.asarray(c, jnp.uint32) for c in ctr)
    for _ in range(rounds):
        hi0, lo0 = _umulhilo(_PHILOX_M0, c0)
        hi1, lo1 = _umulhilo(_PHILOX_M1, c2)
        c0, c1, c2, c3 = hi1 ^ c1 ^ k0, lo1, hi0 ^ c3 ^ k1, lo0
        k0 = k0 + jnp.uint32(_PHILOX_W0)
        k1 = k1 + jnp.uint32(_PHILOX_W1)
    return c0, c1, c2, c3


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


# cos/sin of 2*pi*u without generic range reduction.  XLA's cos/sin lower
# to an arbitrary-argument range-reduction sequence that the roofline
# measured at 41 Gop/s on v5e — 55x slower than exp and the single binding
# term of the Box-Muller budget (benchmarks/ROOFLINE.md).  Here the angle is
# *by construction* 2*pi*u with u uniform in [0,1): the top two bits of the
# u32 pick the quadrant exactly, the remaining 30 bits give the intra-
# quadrant fraction x in [0,1), and degree-9/8 polynomials (least-squares
# fit toward equioscillation; f32 max abs error 2.7e-7, see
# tools/gen_sincos_coeffs.py) evaluate cos/sin(pi/2 x) in ~20 plain VPU ops.
_SIN_C = (1.5707963220833954, -0.6459638379804595, 0.07969037160884318,
          -0.004674962479799562, 0.00015212572840063213)
_COS_C = (0.9999999672205848, -1.2336987443427399, 0.25365381634350864,
          -0.020816187054871052, 0.0008612789203638717)


def sincos_2pi_bits(bits_u32: jax.Array):
    """(cos, sin) of ``2*pi*u`` for ``u = bits / 2**32``, poly-folded.

    Returns f32 arrays; max abs error ~2.7e-7 (a few ULP at 1.0).
    """
    bits = jnp.asarray(bits_u32, jnp.uint32)
    q = (bits >> jnp.uint32(30)).astype(jnp.int32)  # quadrant, exact
    x = uniform_from_bits(bits << jnp.uint32(2))  # fraction in [0,1)
    x2 = x * x
    s0, s1, s2, s3, s4 = _SIN_C
    c0, c1, c2, c3, c4 = _COS_C
    s = x * (s0 + x2 * (s1 + x2 * (s2 + x2 * (s3 + x2 * s4))))
    c = c0 + x2 * (c1 + x2 * (c2 + x2 * (c3 + x2 * c4)))
    swap = (q & 1) == 1  # odd quadrants exchange sin/cos
    cq = jnp.where(swap, s, c)
    sq = jnp.where(swap, c, s)
    cos = jnp.where((q == 1) | (q == 2), -cq, cq)
    sin = jnp.where(q >= 2, -sq, sq)
    return cos, sin


def box_muller(bits1_u32: jax.Array, bits2_u32: jax.Array):
    """Two independent standard-normal arrays from two uint32 bit arrays.

    ``u1`` is mapped to (0, 1] so ``log(u1)`` is finite.  Same transform as
    the reference host RNG (``MonteCarloHost.c:118-122``), returning both the
    cosine and sine branches (the reference discards the sine; using both
    halves the per-normal bit cost).  The angle factor uses the folded
    polynomial ``sincos_2pi_bits`` — measured 2.25x vanilla-kernel
    throughput vs ``jnp.cos``/``jnp.sin`` on v5e (benchmarks/ROOFLINE.md).
    """
    u1 = 1.0 - uniform_from_bits(bits1_u32)  # (0, 1]
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    c, s = sincos_2pi_bits(bits2_u32)
    return r * c, r * s
