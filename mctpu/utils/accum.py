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

__all__ = ["kahan_init", "kahan_add", "kahan_value"]


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
