"""Discretely-monitored Asian (average-price) call — model math.

New product family (not in the reference): the payoff depends on the path
average, so the kernel walks the grid like the CVA kernel
(``mctpu/kernels/cva.py``) but carries a running average instead of
re-pricing exposures.
"""
from __future__ import annotations

import jax.numpy as jnp

from mctpu import math as mcmath
from mctpu.types import AsianOption

__all__ = ["path_payoff", "closed_form_geometric", "step_constants"]


def step_constants(opt: AsianOption, dtype):
    """(drift, vol) of one observation step ``dt = T / n_obs``."""
    dt = jnp.asarray(opt.t, dtype) / opt.n_obs
    drift = (opt.r - 0.5 * opt.v * opt.v) * dt
    vol = opt.v * jnp.sqrt(dt)
    return drift.astype(dtype), vol.astype(dtype)


def path_payoff(opt: AsianOption, z_seq):
    """Payoff from pre-drawn normals ``z_seq`` of shape ``(n_obs, ...)``.

    Arithmetic: ``max(mean_i S_{t_i} - K, 0)``; geometric: the mean runs in
    log space (numerically exact product).
    """
    dtype = jnp.result_type(z_seq)
    o = opt.astype(dtype)
    drift, vol = step_constants(o, dtype)
    s = jnp.broadcast_to(jnp.asarray(o.s, dtype), z_seq.shape[1:])
    acc = jnp.zeros(z_seq.shape[1:], dtype)
    for j in range(opt.n_obs):
        s = s * jnp.exp(drift + vol * z_seq[j])
        acc = acc + (jnp.log(s) if opt.average == "geometric" else s)
    avg = acc / opt.n_obs
    if opt.average == "geometric":
        avg = jnp.exp(avg)
    return jnp.maximum(avg - o.k, 0.0)


def closed_form_geometric(opt: AsianOption, dtype=None):
    """Exact discrete-geometric price (oracle; valid for either `average`
    field since it prices the geometric payoff)."""
    return mcmath.geometric_asian_call(opt.s, opt.k, opt.r, opt.v, opt.t,
                                       opt.n_obs, dtype=dtype)
