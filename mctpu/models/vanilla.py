"""European vanilla call under Black-Scholes GBM.

Model twin of the reference's ``callPayoff`` (``MonteCarloKernel.cu:67-71``)
and the closed form ``host_bsCall`` (``MonteCarloHost.c:140-144``).
"""
from __future__ import annotations

import jax.numpy as jnp

from mctpu import math as mcmath
from mctpu.types import VanillaOption

__all__ = ["terminal_payoff", "closed_form"]


def terminal_payoff(opt: VanillaOption, z):
    """Payoff (at maturity) of a terminal GBM sample.

    Call: ``max(S0 exp((r - v^2/2) T + v sqrt(T) z) - K, 0)`` for standard
    normal ``z`` of any shape (``MonteCarloKernel.cu:67-71``); puts mirror
    it.  Discounting happens in the estimator, as in the reference
    (``MonteCarloKernel.cu:421``).
    """
    s_t = mcmath.gbm_terminal(opt.s, opt.r, opt.v, opt.t, z)
    if getattr(opt, "kind", "call") == "put":
        return jnp.maximum(opt.k - s_t, 0.0)
    return jnp.maximum(s_t - opt.k, 0.0)


def closed_form(opt: VanillaOption, *, hastings: bool = False):
    """Black-Scholes price of the option (the oracle of ``vanillaOpt.cu:62``)."""
    if getattr(opt, "kind", "call") == "put":
        return mcmath.bs_put(opt.s, opt.k, opt.r, opt.v, opt.t)
    f = mcmath.bs_call_hastings if hastings else mcmath.bs_call
    return f(opt.s, opt.k, opt.r, opt.v, opt.t)
