"""Product models: payoffs and closed forms, as pure jnp functions.

Each module defines the payoff math for one product family of the reference
(vanilla European call, correlated basket call, CVA of a call).  The same
functions are consumed by the XLA engine path and by the fused Pallas TPU
kernels (:mod:`mctpu.kernels`).
"""
from mctpu.models import basket, cva, vanilla  # noqa: F401
