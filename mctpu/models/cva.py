"""CVA (credit valuation adjustment) of a European call.

Model twin of ``cvaCallOptMC`` (``MonteCarloKernel.cu:223-284``) and the host
``cvaMonteCarlo`` (``MonteCarloHost.c:233-278``): walk a GBM over an
``n_grid``-step time grid; at node ``j`` the counterparty defaults with
probability mass ``dp_j`` and the exposure is the remaining option value
``ee_j = BS(S_j, T - t_j)``; the per-path CVA is ``lgd * sum_j dp_j * ee_j``.

Normalized edge semantics (SURVEY.md §3.4): at the final node ``t = T`` the
exposure is the intrinsic value (the ``t -> 0+`` limit of Black-Scholes).  The
reference's two implementations disagree at that node due to float rounding of
``t -= dt``; both this model, the XLA engine, the Pallas kernel and the NumPy
oracle share this one convention, and :func:`mctpu.math.cva_closed_form` gives
its exact expectation.
"""
from __future__ import annotations

import jax.numpy as jnp

from mctpu import math as mcmath
from mctpu.types import CvaSpec

__all__ = ["step", "path_values", "closed_form"]


def step(spec: CvaSpec, j: int, s, z, *, hastings: bool = True):
    """Advance paths one grid step and return (s_next, exposure at node j).

    ``j`` is the 1-based node index (static or traced int).  ``s``/``z`` are
    arrays of identical shape (current spots, standard normal draws).
    Mirrors the loop body ``MonteCarloKernel.cu:248-259``.
    """
    opt = spec.option
    dt = opt.t / spec.n_grid
    s_next = mcmath.gbm_terminal(s, opt.r, opt.v, dt, z)
    # Remaining maturity after the step; exact zero at the last node.
    t_rem = opt.t * (spec.n_grid - j) / spec.n_grid
    f = mcmath.bs_call_hastings if hastings else mcmath.bs_call
    ee = f(s_next, opt.k, opt.r, opt.v, t_rem)
    return s_next, ee


def path_values(spec: CvaSpec, z_seq, *, hastings: bool = True):
    """Per-path default leg from pre-drawn normals.

    ``z_seq`` has shape ``(n_grid, ...)``; returns ``(cva_paths, ee_nodes)``
    where ``cva_paths`` has shape ``(...)`` (already scaled by ``lgd``,
    ``MonteCarloKernel.cu:260``) and ``ee_nodes`` has shape ``(n_grid, ...)``
    (per-node exposures, the profile output).

    Written as a Python loop over the static grid for clarity; engine code
    uses ``lax.scan`` / Pallas ``fori_loop`` with :func:`step`.
    """
    opt = spec.option
    dp = mcmath.default_leg_weights(spec.intensity, opt.t, spec.n_grid,
                                    dtype=jnp.result_type(z_seq))
    s = jnp.broadcast_to(jnp.asarray(opt.s, z_seq.dtype), z_seq.shape[1:])
    acc = jnp.zeros(z_seq.shape[1:], z_seq.dtype)
    ee_nodes = []
    for j in range(1, spec.n_grid + 1):
        s, ee = step(spec, j, s, z_seq[j - 1], hastings=hastings)
        ee_nodes.append(ee)
        acc = acc + dp[j - 1] * ee
    return spec.lgd * acc, jnp.stack(ee_nodes)


def closed_form(spec: CvaSpec, dtype=None):
    """Exact expectation of the CVA estimator (martingale argument)."""
    opt = spec.option
    return mcmath.cva_closed_form(
        spec.intensity, spec.lgd, opt.s, opt.k, opt.r, opt.v, opt.t,
        spec.n_grid, dtype=dtype,
    )
