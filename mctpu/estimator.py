"""The Monte Carlo estimator: price, sample stdev, 95% confidence interval.

Reproduces the closing math of the reference engines
(``MonteCarloKernel.cu:413-423`` and ``MonteCarloHost.c:221-229``):

    price   = discount * sum_p / n
    emp_std = sqrt((n * sum_p2 - sum_p^2) / (n * (n - 1)))
    ci      = 1.96 * emp_std / sqrt(n)

with three deliberate numeric upgrades: the combine across blocks is a
fixed-order pairwise tree in float64 (the ``n*sum2 - sum^2`` form
catastrophically cancels in f32 at ~1e9 paths, SURVEY.md §7); CVA keeps
the reference's no-discount quirk (``MonteCarloKernel.cu:467``); and —
unlike the reference, whose printed CI is in *undiscounted* payoff units
while the price is discounted — ``std_error``/``ci`` here are discounted
too, so every result field shares the price's units (see ``McResult``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mctpu.parallel.reduce import pairwise_tree_sum
from mctpu.types import McResult

__all__ = ["combine_block_partials", "estimate", "wide_dtype"]

# Re-exported for engine use; see mctpu.math.wide_dtype.
from mctpu.math import wide_dtype  # noqa: E402


def combine_block_partials(partials):
    """Combine per-block ``[sum_p, sum_p2]`` rows into global f64 sums.

    ``partials`` has shape ``(num_blocks, 2)`` (any float dtype).  Upcasts to
    f64 *before* combining (when x64 is enabled), then reduces in a fixed
    pairwise order so the result is bitwise independent of how blocks were
    sharded over chips.
    """
    p64 = jnp.asarray(partials, wide_dtype())
    total = pairwise_tree_sum(p64, axis=0)
    return total[0], total[1]


def estimate(sum_p, sum_p2, n: int, *, discount=1.0, n_paths: int | None = None) -> McResult:
    """Apply the reference estimator to global sums (computed in f64)."""
    wide = wide_dtype()
    nf = jnp.asarray(n, wide)
    sum_p = jnp.asarray(sum_p, wide)
    sum_p2 = jnp.asarray(sum_p2, wide)
    disc = jnp.asarray(discount, wide)
    price = disc * sum_p / nf
    var = jnp.maximum(nf * sum_p2 - sum_p * sum_p, 0.0) / (nf * (nf - 1.0))
    # Discount the standard error too: price, std_error and ci share units
    # (the reference's CI stays in undiscounted payoff units,
    # MonteCarloKernel.cu:421-423 — a units mismatch we fix, not mirror).
    se = disc * jnp.sqrt(var) / jnp.sqrt(nf)
    return McResult(
        price=price,
        ci=1.96 * se,
        std_error=se,
        sum_p=sum_p,
        sum_p2=sum_p2,
        n=int(n),
        n_paths=int(n_paths if n_paths is not None else n),
    )
