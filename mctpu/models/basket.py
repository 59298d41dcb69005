"""Weighted basket call on Cholesky-correlated GBM underlyings.

Model twin of ``brownianVect`` + ``basketPayoff``
(``MonteCarloKernel.cu:74-101``) and the host pair ``simGaussVect`` +
``multiStockValue`` (``MonteCarloHost.c:151-185``).  The asset dimension is a
runtime size here (vectorized over VPU lanes / MXU on TPU), not the reference's
compile-time ``N``.
"""
from __future__ import annotations

import jax.numpy as jnp

from mctpu.types import BasketOption

__all__ = ["correlate", "terminal_payoff", "payoff_from_brownian"]


def correlate(chol, d, z):
    """Correlated Brownian vector ``bt = L @ z + d`` for ``z ~ N(0, I)``.

    ``z`` has shape ``(..., A)``; ``chol`` is the lower Cholesky factor of the
    correlation matrix (the reference pre-factorizes on the host,
    ``basketOpt.cu:96-99``, and the kernel applies the matvec + drift,
    ``MonteCarloKernel.cu:74-87``).
    """
    bt = jnp.einsum("ij,...j->...i", chol, z)
    return bt + d


def payoff_from_brownian(opt: BasketOption, bt):
    """Weighted-basket call payoff from an already-correlated vector ``bt``.

    ``s_j = s0_j exp((r - v_j^2/2) T + v_j sqrt(T) bt_j)``;
    ``payoff = max(sum_j w_j s_j - K, 0)`` (``MonteCarloKernel.cu:89-101``).
    Note the per-asset diffusion multiplies the *correlated unit-variance*
    component by ``v_j`` (corr has unit diagonal, so Var(bt_j) = 1).
    """
    drift = (opt.r - 0.5 * opt.v * opt.v) * opt.t
    s_t = opt.s * jnp.exp(drift + opt.v * jnp.sqrt(opt.t) * bt)
    basket = jnp.einsum("...j,j->...", s_t, opt.w)
    return jnp.maximum(basket - opt.k, 0.0)


def terminal_payoff(opt: BasketOption, chol, z):
    """Payoff of one terminal sample: correlate then evaluate the basket."""
    return payoff_from_brownian(opt, correlate(chol, opt.d, z))
