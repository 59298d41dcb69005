"""Deterministic cross-block reduction of Monte Carlo partial sums.

The reference reduces per-block partials with a serial host loop after a D2H
copy (``MonteCarloKernel.cu:406,417-420``).  The TPU-native equivalent keeps
the partials on device and reduces them inside the jitted program — but with
a twist: a *fixed-order pairwise tree* reduction, so the floating-point
combination order is identical no matter how many chips the block axis is
sharded over.  Together with per-block counter-based RNG streams this makes
whole-run results bitwise shard-invariant (tested in
``tests/test_sharding.py``).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["pairwise_tree_sum"]


def pairwise_tree_sum(x, axis: int = 0):
    """Sum along ``axis`` with a fixed pairwise-tree association.

    Unlike ``jnp.sum`` (whose association depends on backend partitioning),
    this emits an explicit log2(B) sequence of elementwise adds, identical for
    every device count — XLA does not re-associate float adds, so the result
    is bitwise reproducible.  Pairwise summation is also numerically superior
    to serial accumulation (O(log B) error growth vs O(B)).
    """
    x = jnp.moveaxis(jnp.asarray(x), axis, 0)
    n = x.shape[0]
    while n > 1:
        half = n // 2
        if n % 2:
            # Fold the odd trailing element into the first slot.
            x = jnp.concatenate([x[:1] + x[n - 1 : n], x[1:n - 1]], axis=0)
            n -= 1
            half = n // 2
        x = x[:half] + x[half:n]
        n = half
    return x[0]
