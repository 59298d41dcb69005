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


def qe_constants(opt: HestonOption, n_steps: int, dtype):
    """Per-step constants of the Andersen (2008) quadratic-exponential
    scheme with the gamma1 = gamma2 = 1/2 central drift weighting.

    Returns a dict of scalars; pure host math, shared by the XLA twin and
    the Pallas kernel (both consume it as SMEM scalars).
    """
    import jax.numpy as jnp

    kappa, theta, xi, rho, r, t = (
        jnp.asarray(x, dtype) for x in (opt.kappa, opt.theta, opt.xi,
                                        opt.rho, opt.r, opt.t))
    dt = t / n_steps
    e = jnp.exp(-kappa * dt)
    g1 = g2 = 0.5
    k_ratio = kappa * rho / xi - 0.5
    return {
        "e": e,
        "c1": xi * xi * e * (1.0 - e) / kappa,          # * v  -> s2 part 1
        "c2": theta * xi * xi * (1.0 - e) ** 2 / (2.0 * kappa),
        "r_dt": r * dt,
        "k0": -rho * kappa * theta * dt / xi,
        "k1": g1 * dt * k_ratio - rho / xi,
        "k2": g2 * dt * k_ratio + rho / xi,
        "k3": g1 * dt * (1.0 - rho * rho),
        "k4": g2 * dt * (1.0 - rho * rho),
        "theta": theta,
    }


def qe_step(x, v, z_v, z_s, c, norm_cdf):
    """One QE step: ``(x, v) -> (x', v')`` with ``x = ln(S/S0)``.

    Variance: moment-matched quadratic ``a (b + Zv)^2`` for ``psi <= 1.5``,
    exponential-mass-at-zero for ``psi > 1.5`` (Andersen 2008 §3.2.3-3.2.4);
    the uniform for the exponential branch is ``Phi(Zv)`` so both branches
    consume the same draw.  Log-spot: the K0..K4 discretization (§4.2).
    Pure jnp — runs identically in the Pallas kernel and the XLA twin.
    """
    import jax.numpy as jnp

    m = c["theta"] + (v - c["theta"]) * c["e"]
    s2 = v * c["c1"] + c["c2"]
    inv_m = 1.0 / jnp.maximum(m, 1e-30)  # shared: psi, exp-branch scale
    psi = s2 * inv_m * inv_m
    quad = psi <= 1.5
    # Quadratic branch (psi <= 1.5).  The unselected branch's sqrt(0) has an
    # infinite derivative that would poison grads through `where` (pathwise
    # Greeks autodiff through this step), so feed it a safe placeholder.
    # sqrt(q) * sqrt(q - 1) fuses to one sqrt(q (q - 1)) — both factors are
    # non-negative on the selected branch (roofline lever, ROOFLINE.md).
    two_over = 2.0 / psi
    quad_arg = jnp.where(quad,
                         jnp.maximum(two_over * (two_over - 1.0), 0.0), 1.0)
    b2 = jnp.where(quad, two_over - 1.0 + jnp.sqrt(quad_arg), 0.0)
    a = m / (1.0 + b2)
    v_quad = a * (jnp.sqrt(b2) + z_v) ** 2
    # Exponential branch (psi > 1.5), division-minimized (measured: one f32
    # divide costs ~6 FMA slots, benchmarks/roofline_results.json):
    #   p       = (psi-1)/(psi+1)    -> "u <= p" tested as u(psi+1) <= psi-1
    #   1-p     = 2/(psi+1)          -> log_arg = 2 / ((psi+1)(1-u))
    #   1/beta  = m(psi+1)/2         -> the log is SCALED, never divided
    # leaving a single divide (log_arg) where the textbook form takes three.
    psip1 = psi + 1.0
    u = jnp.clip(norm_cdf(z_v), 0.0, 1.0 - 1e-7)
    at_zero = u * psip1 <= psi - 1.0  # u <= p
    log_arg = jnp.where(at_zero, 1.0,
                        2.0 / jnp.maximum(psip1 * (1.0 - u), 1e-30))
    v_exp = jnp.where(at_zero, 0.0,
                      jnp.log(log_arg) * (0.5 * m * psip1))
    v_new = jnp.where(quad, v_quad, v_exp)
    # 1e-20 floor: sqrt'(0) is infinite and v = v' = 0 is reachable (the
    # exponential branch puts mass at zero); the value change is ~1e-10.
    x_new = (x + c["r_dt"] + c["k0"] + c["k1"] * v + c["k2"] * v_new
             + jnp.sqrt(jnp.maximum(c["k3"] * v + c["k4"] * v_new, 1e-20))
             * z_s)
    return x_new, v_new
