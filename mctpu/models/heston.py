"""Heston stochastic-volatility model: semi-closed form + path dynamics.

A second *dynamics* family beyond the reference's Black-Scholes GBM:

    dS = r S dt + sqrt(v) S dW_s
    dv = kappa (theta - v) dt + xi sqrt(v) dW_v,   d<W_s, W_v> = rho dt

The European call has a semi-closed form via the characteristic function
(Heston 1993, in Gatheral's "little trap" parameterization, which is
numerically stable for long maturities); it anchors the Monte Carlo engine
the same way Black-Scholes anchors the GBM products.

``cf_call_price`` integrates the two in-the-money probabilities with
Gauss-Legendre quadrature in complex128 — deliberately pure NumPy: it is an
oracle, and TPU backends do not implement complex128.
"""
from __future__ import annotations

import functools

import numpy as np

from mctpu.types import HestonOption

__all__ = ["cf_call_price", "step_constants"]


@functools.lru_cache(maxsize=8)
def _gauss_legendre(n: int, u_max: float):
    """Nodes/weights for ∫_0^{u_max} (host-side, cached)."""
    x, w = np.polynomial.legendre.leggauss(n)
    u = 0.5 * u_max * (x + 1.0)
    return u, 0.5 * u_max * w


def _cf_log_spot(u, s0, r, t, v0, kappa, theta, xi, rho):
    """Characteristic function E[e^{iu ln S_T}] (Gatheral's form)."""
    iu = 1j * u
    alpha = kappa - rho * xi * iu
    d = np.sqrt(alpha * alpha + xi * xi * (iu + u * u))
    g2 = (alpha - d) / (alpha + d)
    edt = np.exp(-d * t)
    cc = (kappa * theta / (xi * xi)) * (
        (alpha - d) * t - 2.0 * np.log((1.0 - g2 * edt) / (1.0 - g2)))
    dd = ((alpha - d) / (xi * xi)) * (1.0 - edt) / (1.0 - g2 * edt)
    return np.exp(cc + dd * v0 + iu * (np.log(s0) + r * t))


def cf_call_price(opt: HestonOption, n_nodes: int = 192,
                  u_max: float = 200.0):
    """European call under Heston via the P1/P2 probability integrals.

    ``C = S0 P1 - K e^{-rT} P2`` with
    ``P_j = 1/2 + (1/pi) ∫_0^inf Re[e^{-iu ln K} phi_j(u) / (iu)] du``,
    ``phi_2 = phi`` and ``phi_1(u) = phi(u - i) / phi(-i)``.

    f64/complex128 throughout; validated against the Black-Scholes limit
    (xi -> 0, v0 = theta) and the Monte Carlo engine in
    ``tests/test_heston.py``.
    """
    s0, k, r, t = (float(x) for x in (opt.s, opt.k, opt.r, opt.t))
    v0, kap, th = (float(x) for x in (opt.v0, opt.kappa, opt.theta))
    xi, rho = float(opt.xi), float(opt.rho)

    u, w = _gauss_legendre(n_nodes, u_max)
    lnk = np.log(k)

    def prob(shifted: bool) -> float:
        if shifted:
            num = _cf_log_spot(u - 1j, s0, r, t, v0, kap, th, xi, rho)
            den = _cf_log_spot(np.complex128(-1j), s0, r, t, v0, kap, th,
                               xi, rho)
            phi = num / den
        else:
            phi = _cf_log_spot(u, s0, r, t, v0, kap, th, xi, rho)
        integrand = np.real(np.exp(-1j * u * lnk) * phi / (1j * u))
        return 0.5 + float(np.sum(w * integrand)) / np.pi

    p1 = prob(True)
    p2 = prob(False)
    return s0 * p1 - k * np.exp(-r * t) * p2


def step_constants(opt: HestonOption, n_steps: int, dtype):
    """Per-step constants of the full-truncation Euler scheme."""
    import jax.numpy as jnp
    dt = jnp.asarray(opt.t, dtype) / n_steps
    return (dt, jnp.sqrt(dt).astype(dtype))
