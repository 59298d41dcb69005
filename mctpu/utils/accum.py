"""Compensated (Kahan) accumulation.

The reference forks its whole source tree to get double precision
(``double_precision/``).  On TPU, f64 is emulated, so the f32_kahan precision
policy instead carries a compensation term through the per-block accumulation
loops; the pair (sum, comp) recovers most of the f64 accuracy at f32 cost.
Used identically by the XLA and Pallas backends.

Note: correctness relies on XLA not re-associating float arithmetic, which it
does not do by default.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["kahan_init", "kahan_add", "kahan_value",
           "two_sum", "ds_add", "ds_value"]


def kahan_init(like):
    """(sum, compensation) carry initialized to zero, shaped/dtyped like `like`."""
    z = jnp.zeros_like(like)
    return (z, z)


def kahan_add(carry, x):
    """Neumaier-variant compensated add of ``x`` into ``carry=(sum, comp)``."""
    s, c = carry
    t = s + x
    # Neumaier: pick the larger-magnitude operand to compute the lost bits.
    big_s = jnp.abs(s) >= jnp.abs(x)
    lost = jnp.where(big_s, (s - t) + x, (x - t) + s)
    return (t, c + lost)


def kahan_value(carry):
    s, c = carry
    return s + c


# ---------------------------------------------------------------------------
# Double-single (two-float) arithmetic for carried WALK STATE
# ---------------------------------------------------------------------------
# Kahan compensation protects the scalar accumulators; the serial walk
# kernels additionally carry a running log-spot whose f32 rounding
# random-walks over deep grids (~sqrt(n_steps) ulp).  A (hi, lo) pair kept
# normalized (|lo| <= ulp(hi)/2) makes that running SUM exact to ~2^-48 —
# the on-chip answer to the reference's device f64 tree
# (double_precision/MonteCarloKernel.cu; its draws stay f32 too, :68,:78).
# Only error-free ADDS are needed (the log-space walks are pure sums of
# increments), so no two_prod/FMA splitting is required.


def two_sum(a, b):
    """Knuth's branch-free error-free transformation: a + b = s + e."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def ds_add(hi, lo, x):
    """Add f32 ``x`` into the normalized double-single ``(hi, lo)``."""
    s, e = two_sum(hi, x)
    lo = lo + e
    # Renormalize (fast_two_sum: |s| >= |lo| after the accumulation).
    hi2 = s + lo
    lo2 = lo - (hi2 - s)
    return hi2, lo2


def ds_value(hi, lo):
    """Best f32 approximation of the carried value (hi is normalized)."""
    return hi + lo
