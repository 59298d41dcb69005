"""Closed-form financial math (pure jnp, usable inside Pallas kernels).

Replaces the device math library of the reference
(``single_precision/MonteCarloKernel.cu:65-129``) and its CPU twin
(``single_precision/MonteCarloHost.c:91-185``).  Every function here is a pure
function of jnp arrays, so the *same code* runs in three places: jitted XLA
programs, Pallas TPU kernels (on VMEM refs' values), and the NumPy oracle via
``jax.numpy`` on CPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "norm_cdf",
    "norm_cdf_hastings",
    "erf_inv_f32",
    "norm_ppf_f32",
    "bs_call",
    "bs_put",
    "bs_call_hastings",
    "cholesky_lower",
    "gbm_terminal",
    "cva_closed_form",
    "cva_portfolio_closed_form",
    "cva_multi_closed_form",
    "lookback_floating_call",
    "bivariate_norm_cdf",
    "cliquet_closed_form",
    "rainbow_min_call",
    "rainbow_max_call",
    "default_leg_weights",
    "wide_dtype",
]


def wide_dtype():
    """f64 when x64 is enabled, else f32 (TPU default).

    Estimator tails and closed-form oracles prefer f64; hot kernels are
    explicitly f32, so enabling x64 (``JAX_ENABLE_X64=1``) costs nothing.
    """
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

# Hastings polynomial coefficients (Abramowitz & Stegun 26.2.17), as used by
# the reference's `cnd` (MonteCarloKernel.cu:110-123 and MonteCarloHost.c:125-137).
_A1 = 0.31938153
_A2 = -0.356563782
_A3 = 1.781477937
_A4 = -1.821255978
_A5 = 1.330274429
_ONEOVER2PI = 0.39894228040143267793994605993438


def norm_cdf_hastings(d):
    """Hastings approximation of the standard normal CDF (|err| < 7.5e-8).

    Bit-for-bit the same polynomial as the reference ``cnd``
    (``MonteCarloKernel.cu:110-123``); kept for parity checks and because it is
    cheap on the VPU (one exp + one reciprocal + 5 FMA).
    """
    d = jnp.asarray(d)
    k = 1.0 / (1.0 + 0.2316419 * jnp.abs(d))
    poly = k * (_A1 + k * (_A2 + k * (_A3 + k * (_A4 + k * _A5))))
    cnd = _ONEOVER2PI * jnp.exp(-0.5 * d * d) * poly
    return jnp.where(d > 0, 1.0 - cnd, cnd).astype(d.dtype)


def norm_cdf(d):
    """Standard normal CDF via erf (exact to dtype precision)."""
    d = jnp.asarray(d)
    return (0.5 * (1.0 + jax.lax.erf(d * (2.0 ** -0.5)))).astype(d.dtype)


# Giles (2010), "Approximating the erfinv function" — the f32 polynomial
# pair (central w < 5, tail otherwise).  Same coefficients XLA's own f32
# erf_inv lowering uses, but hand-rolled in plain VPU ops: on this chip
# Mosaic's native erf_inv primitive runs at 69 Gop/s while this form runs
# at 93 Gop/s (measured, benchmarks/roofline.py methodology) — log, sqrt
# and FMAs schedule better than the opaque primitive.
_GILES_CENTRAL = (3.43273939e-07, -3.5233877e-06, -4.39150654e-06,
                  0.00021858087, -0.00125372503, -0.00417768164,
                  0.246640727, 1.50140941)
_GILES_TAIL = (0.000100950558, 0.00134934322, -0.00367342844,
               0.00573950773, -0.0076224613, 0.00943887047,
               1.00167406, 2.83297682)


def _giles_from_w(w, x):
    """Shared tail of the Giles erfinv evaluation: polynomials in
    ``w = -log(1 - x^2)`` (however the caller computed ``w``), times x."""
    wc = w - 2.5
    p = jnp.float32(2.81022636e-08)
    for c in _GILES_CENTRAL:
        p = jnp.float32(c) + p * wc
    wt = jnp.sqrt(w) - 3.0
    q = jnp.float32(-0.000200214257)
    for c in _GILES_TAIL:
        q = jnp.float32(c) + q * wt
    return jnp.where(w < 5.0, p, q) * x


def erf_inv_f32(x):
    """f32 inverse error function (Giles polynomial pair).

    Max abs error vs the f64 reference is ~5e-5 in the normal-quantile
    map — the same accuracy class as ``jax.lax.erf_inv`` in f32 (they
    share coefficients; measured max |difference| 2.1e-5) at 1.34x the
    measured throughput inside Pallas kernels.
    """
    w = -jnp.log(jnp.maximum((1.0 - x) * (1.0 + x), 1e-37))
    return _giles_from_w(w, x)


def norm_ppf_f32(u):
    """f32 inverse standard-normal CDF from uniforms in (0, 1).

    ``sqrt(2) * erfinv(2u - 1)`` with the Giles polynomials, entered
    through ``w = -log(4 u (1-u))`` — algebraically ``-log(1 - x^2)``
    for ``x = 2u - 1``, but computed WITHOUT the cancellation ``1 - x^2``
    suffers near the tails (``4u(1-u)`` is exact-to-ulp for small u).
    Uniforms are clipped to ``[1e-7, 1 - 1e-7]`` like the erf_inv path
    (a digital shift makes u = 0 measure-zero but the unshifted first
    Sobol point is exactly 0).
    """
    eps = jnp.float32(1e-7)
    u = jnp.clip(u, eps, 1.0 - eps)
    x = 2.0 * u - 1.0
    w = -jnp.log(4.0 * u * (1.0 - u))
    return _giles_from_w(w, x) * jnp.float32(1.4142135623730951)


def _bs_call(s, k, r, v, t, cdf):
    """Black-Scholes call with a pluggable normal CDF.

    Matches ``device_bsCall`` (``MonteCarloKernel.cu:125-129``) /
    ``host_bsCall`` (``MonteCarloHost.c:140-144``), extended with a safe
    ``t -> 0`` limit: at zero remaining maturity the price is the intrinsic
    value ``max(s - k, 0)`` (the reference divides by ``v*sqrt(t)`` and relies
    on float rounding near the last CVA grid node; we normalize that edge, see
    SURVEY.md §3.4 note).
    """
    s, k, r, v, t = map(jnp.asarray, (s, k, r, v, t))
    dtype = jnp.result_type(s, k, r, v, t)
    eps = jnp.asarray(1e-12, dtype)
    t_safe = jnp.maximum(t, eps)
    sq = v * jnp.sqrt(t_safe)
    d1 = (jnp.log(s / k) + (r + 0.5 * v * v) * t_safe) / sq
    d2 = d1 - sq
    price = s * cdf(d1) - k * jnp.exp(-r * t_safe) * cdf(d2)
    intrinsic = jnp.maximum(s - k, 0.0)
    return jnp.where(t > eps, price, intrinsic).astype(dtype)


def bs_call(s, k, r, v, t):
    """Black-Scholes European call price (erf-based CDF)."""
    return _bs_call(s, k, r, v, t, norm_cdf)


def bs_put(s, k, r, v, t):
    """Black-Scholes European put via put-call parity
    (``P = C - S + K e^{-rt}``)."""
    s, k, r, t = map(jnp.asarray, (s, k, r, t))
    return bs_call(s, k, r, v, t) - s + k * jnp.exp(-r * t)


def bs_call_hastings(s, k, r, v, t):
    """Black-Scholes call with the reference's Hastings CDF (kernel-grade)."""
    return _bs_call(s, k, r, v, t, norm_cdf_hastings)


def bs_greeks(s, k, r, v, t):
    """Closed-form Black-Scholes call Greeks (oracle for the MC Greeks).

    Returns dict(price, delta, gamma, vega, theta, rho).  Theta is the
    derivative w.r.t. *maturity* t (the calendar-decay convention is its
    negation).  Not in the reference — the oracle for :mod:`mctpu.greeks`.
    """
    s, k, r, v, t = map(jnp.asarray, (s, k, r, v, t))
    sq = v * jnp.sqrt(t)
    d1 = (jnp.log(s / k) + (r + 0.5 * v * v) * t) / sq
    d2 = d1 - sq
    pdf = jnp.exp(-0.5 * d1 * d1) * 0.3989422804014327
    disc = jnp.exp(-r * t)
    return {
        "price": s * norm_cdf(d1) - k * disc * norm_cdf(d2),
        "delta": norm_cdf(d1),
        "gamma": pdf / (s * sq),
        "vega": s * pdf * jnp.sqrt(t),
        "theta": s * pdf * v / (2 * jnp.sqrt(t)) + r * k * disc * norm_cdf(d2),
        "rho": k * t * disc * norm_cdf(d2),
        # Second-order cross sensitivities (same for call and put):
        # vanna = d2V/ds dv, volga = d2V/dv2.
        "vanna": -pdf * d2 / v,
        "volga": s * pdf * jnp.sqrt(t) * d1 * d2 / v,
    }


def geometric_asian_call(s, k, r, v, t, n_obs: int, dtype=None):
    """Exact price of a discretely-monitored geometric-average Asian call.

    Under GBM, ``log G`` of the geometric mean over ``t_i = i T / m``
    (i = 1..m) is normal with

        mean = log s + (r - v^2/2) T (m+1) / (2m)
        var  = v^2 T (m+1)(2m+1) / (6 m^2)

    so the price is a Black-Scholes-style formula on ``G``.  Oracle for the
    geometric Asian MC engine and the control-variate mean for the
    arithmetic Asian (no closed form exists for the arithmetic average).
    """
    if dtype is None:
        dtype = wide_dtype()
    s, k, r, v, t = (jnp.asarray(x, dtype) for x in (s, k, r, v, t))
    m = n_obs
    mu_g = jnp.log(s) + (r - 0.5 * v * v) * t * (m + 1) / (2 * m)
    var_g = v * v * t * (m + 1) * (2 * m + 1) / (6 * m * m)
    sd = jnp.sqrt(var_g)
    d1 = (mu_g - jnp.log(k) + var_g) / sd
    d2 = d1 - sd
    fwd_g = jnp.exp(mu_g + 0.5 * var_g)
    return jnp.exp(-r * t) * (fwd_g * norm_cdf(d1) - k * norm_cdf(d2))


def up_and_out_call(s, k, r, v, t, barrier, dtype=None):
    """Continuously-monitored up-and-out barrier call (Reiner-Rubinstein).

    Requires ``k < barrier`` (otherwise the payoff region is knocked out and
    the price is 0) and ``s < barrier`` (else already knocked out).  Oracle
    for the barrier MC engine via the Broadie-Glasserman-Kou correction
    (:func:`barrier_continuity_correction`) for discrete monitoring.
    """
    if dtype is None:
        dtype = wide_dtype()
    s, k, r, v, t, b = (jnp.asarray(x, dtype) for x in (s, k, r, v, t, barrier))
    sq = v * jnp.sqrt(t)
    lam = (r + 0.5 * v * v) / (v * v)
    x = jnp.log(s / k) / sq + lam * sq
    x1 = jnp.log(s / b) / sq + lam * sq
    y = jnp.log(b * b / (s * k)) / sq + lam * sq
    y1 = jnp.log(b / s) / sq + lam * sq
    disc = jnp.exp(-r * t)
    pow1 = (b / s) ** (2 * lam)
    pow2 = (b / s) ** (2 * lam - 2)
    # C_uo = C_vanilla - C_ui with the Reiner-Rubinstein up-and-in call:
    # C_ui = S N(x1) - K e^{-rT} N(x1-sq)
    #        - S (B/S)^{2 lam} [N(-y) - N(-y1)]
    #        + K e^{-rT} (B/S)^{2 lam - 2} [N(-y+sq) - N(-y1+sq)]
    price = (
        s * (norm_cdf(x) - norm_cdf(x1))
        - k * disc * (norm_cdf(x - sq) - norm_cdf(x1 - sq))
        + s * pow1 * (norm_cdf(-y) - norm_cdf(-y1))
        - k * disc * pow2 * (norm_cdf(-y + sq) - norm_cdf(-y1 + sq))
    )
    # Already knocked out / degenerate regions.
    price = jnp.where(s >= b, 0.0, price)
    price = jnp.where(k >= b, 0.0, price)
    return jnp.maximum(price, 0.0)


def barrier_continuity_correction(barrier, s, v, t, n_obs: int, up: bool = True):
    """BGK-corrected effective barrier for discretely-monitored MC.

    A discrete walk monitors the barrier only at ``n_obs`` points, so it
    knocks out less often than the continuous contract; the discrete price
    matches the continuous formula evaluated at the barrier shifted by
    ``exp(±beta v sqrt(dt))`` with ``beta = zeta(1/2)/sqrt(2 pi) ~ 0.5826``
    (Broadie-Glasserman-Kou 1997).
    """
    beta = 0.5825971579390106
    dt = jnp.asarray(t, wide_dtype()) / n_obs
    shift = jnp.exp((beta if up else -beta) * jnp.asarray(v, wide_dtype())
                    * jnp.sqrt(dt))
    del s
    return jnp.asarray(barrier, wide_dtype()) * shift


def cholesky_lower(corr):
    """Lower Cholesky factor L with L @ L.T == corr, PSD-tolerant.

    Replaces the host Golub-Van Loan routine ``Chol``
    (``MonteCarloHost.c:91-106``) that the basket driver applies before
    pricing (``basketOpt.cu:96-99``).  Like the reference, it handles
    positive *semi*-definite matrices via the ``v[j] > 0`` pivot guard
    (zero column when the pivot vanishes) — necessary because the
    reference's own default 3-asset correlation matrix (all off-diagonals
    -0.5, ``basketOpt.cu:46-54``) is singular, and ``jnp.linalg.cholesky``
    would return NaNs for it.

    The column loop is a Python loop over the static asset count (small:
    3-100), fully unrolled at trace time.
    """
    c = jnp.asarray(corr)
    n = c.shape[0]
    a = jnp.zeros_like(c)
    idx = jnp.arange(n)
    # Relative pivot tolerance: a pivot below n*eps*max|diag| is numerically
    # zero.  An exact `> 0` test would divide by rounding noise (~1e-17 in
    # f64) and blow the column up to ~1e8 for singular correlation matrices.
    tol = (n * jnp.finfo(c.dtype).eps
           * jnp.max(jnp.abs(jnp.diagonal(c))))
    for j in range(n):
        # v_i = c[i,j] - sum_{k<j} a[i,k] a[j,k]  (columns >= j are still 0)
        v = c[:, j] - a @ a[j, :]
        col = jnp.where(v[j] > tol, v / jnp.sqrt(jnp.maximum(v[j], tol)), 0.0)
        a = a.at[:, j].set(jnp.where(idx >= j, col, 0.0))
    return a


def gbm_terminal(s, r, v, t, z):
    """Terminal value of a GBM step: ``s * exp((r - v^2/2) t + v sqrt(t) z)``.

    The one-step log-Euler (exact for GBM) used by every payoff in the
    reference: ``callPayoff`` (``MonteCarloKernel.cu:67-71``), ``geomBrownian``
    (``:104-107``), ``basketPayoff`` (``:89-101``).
    """
    return s * jnp.exp((r - 0.5 * v * v) * t + v * jnp.sqrt(t) * z)


def default_leg_weights(intensity, t, n_grid: int, dtype=jnp.float32):
    """Default-probability mass per grid node.

    ``dp_j = exp(-lambda t_{j-1}) - exp(-lambda t_j)`` for ``j = 1..n_grid``
    with ``t_j = j * t / n_grid`` (``MonteCarloKernel.cu:249``). Returns shape
    ``(n_grid,)``.
    """
    dt = jnp.asarray(t, dtype) / n_grid
    j = jnp.arange(1, n_grid + 1, dtype=dtype)
    lam = jnp.asarray(intensity, dtype)
    # Factored form: the literal difference of two exponentials ~0.97 apart
    # by ~lambda*dt cancels catastrophically in f32 (at n_grid=500 each
    # dp_j carried ~2e-3 relative error — a 4-sigma CVA bias at 2^21
    # paths); exp * (-expm1) keeps full relative precision at any grid.
    return jnp.exp(-lam * dt * (j - 1)) * (-jnp.expm1(-lam * dt))


def cva_closed_form(intensity, lgd, s, k, r, v, t, n_grid: int, dtype=None):
    """Exact expectation of the reference CVA estimator (no MC error).

    The discounted BS price process ``e^{-r u} C(S_u, T-u)`` is a martingale,
    so ``E[ee_j] = E[C(S_{t_j}, T - t_j)] = e^{r t_j} C(S_0, T)``.  The
    reference estimator (``cvaCallOptMC``, ``MonteCarloKernel.cu:242-263``)
    averages ``lgd * sum_j dp_j * ee_j`` with **no discounting** of the sum
    (``MonteCarloKernel.cu:467``), hence:

        CVA = lgd * C(S_0,T) * sum_j dp_j * e^{r t_j}

    This exact value is the correctness oracle for the CVA Monte Carlo engine
    (the reference had only a self-consistency sweep, ``cvaOpt.cu:70-97``).
    At the final node ``t_j = T`` we use the normalized convention
    ``ee = intrinsic`` whose expectation is also ``e^{r T} C(S_0, T)``.
    """
    if dtype is None:
        dtype = wide_dtype()
    dp = default_leg_weights(intensity, t, n_grid, dtype=dtype)
    tj = jnp.asarray(t, dtype) / n_grid * jnp.arange(1, n_grid + 1, dtype=dtype)
    c0 = bs_call(
        jnp.asarray(s, dtype), jnp.asarray(k, dtype), jnp.asarray(r, dtype),
        jnp.asarray(v, dtype), jnp.asarray(t, dtype),
    )
    return jnp.asarray(lgd, dtype) * c0 * jnp.sum(dp * jnp.exp(jnp.asarray(r, dtype) * tj))


def cva_portfolio_closed_form(intensity, lgd, s, r, v, t, strikes, weights,
                              n_grid: int, dtype=None):
    """Exact CVA expectation for an all-long call portfolio.

    With non-negative weights the netting ``max(.,0)`` never binds (call
    values are non-negative), so the martingale argument of
    :func:`cva_closed_form` applies per option and the CVA is linear:

        CVA = lgd * (sum_m w_m C_0(k_m)) * sum_j dp_j e^{r t_j}

    Raises for mixed-sign weights (no closed form; use the MC engines).
    """
    import numpy as _np
    if (_np.asarray(weights) < 0).any():
        raise ValueError("closed form requires non-negative weights "
                         "(netting may bind otherwise)")
    if dtype is None:
        dtype = wide_dtype()
    strikes = jnp.asarray(strikes, dtype)
    weights = jnp.asarray(weights, dtype)
    c0 = jnp.sum(weights * bs_call(jnp.asarray(s, dtype), strikes,
                                   jnp.asarray(r, dtype),
                                   jnp.asarray(v, dtype),
                                   jnp.asarray(t, dtype)))
    dp = default_leg_weights(intensity, t, n_grid, dtype=dtype)
    tj = jnp.asarray(t, dtype) / n_grid * jnp.arange(1, n_grid + 1, dtype=dtype)
    return jnp.asarray(lgd, dtype) * c0 * jnp.sum(
        dp * jnp.exp(jnp.asarray(r, dtype) * tj))


def cva_multi_closed_form(intensity, lgd, s, v, strikes, weights, r, t,
                          n_grid: int, dtype=None):
    """Exact CVA expectation for an all-long netting set over M correlated
    underlyings.

    With non-negative weights the netting never binds, and the discounted BS
    value of each option is a martingale *in its own underlying*, so
    correlation drops out of the expectation entirely:

        CVA = lgd * (sum_m w_m C_0(s_m, k_m, v_m)) * sum_j dp_j e^{r t_j}

    (per-underlying version of :func:`cva_portfolio_closed_form`).
    """
    if dtype is None:
        dtype = wide_dtype()
    s = jnp.asarray(s, dtype)
    v = jnp.asarray(v, dtype)
    strikes = jnp.asarray(strikes, dtype)
    weights = jnp.asarray(weights, dtype)
    c0 = jnp.sum(weights * bs_call(s, strikes, r, v, t))
    dp = default_leg_weights(intensity, t, n_grid, dtype=dtype)
    t_j = jnp.asarray(t, dtype) * jnp.arange(1, n_grid + 1, dtype=dtype) / n_grid
    growth = jnp.sum(dp * jnp.exp(jnp.asarray(r, dtype) * t_j))
    return jnp.asarray(lgd, dtype) * c0 * growth


def xva_leg_weights(intensity, own_intensity, t, n_grid: int,
                    dtype=jnp.float32):
    """Bilateral default-leg node tables ``(w_cva, w_dva)``, shape
    ``(n_grid,)`` each.

    First-to-default weighting on the reference's uniform grid
    (``MonteCarloKernel.cu:249`` semantics, extended bilaterally): the
    counterparty-default mass at node ``j`` counts only while the bank
    itself survives, and vice versa:

        w_cva_j = S_B(t_{j-1}) * [S_C(t_{j-1}) - S_C(t_j)]
        w_dva_j = S_C(t_{j-1}) * [S_B(t_{j-1}) - S_B(t_j)]

    with ``S_X(u) = exp(-lambda_X u)``.  At ``own_intensity = 0`` the CVA
    table reduces EXACTLY to :func:`default_leg_weights` (same factored
    ``exp * (-expm1)`` form, so the unilateral engine's numerics are
    reproduced bit-for-bit) and ``w_dva`` is identically zero.

    Discretization note: this start-of-interval weighting double-counts
    the (joint) event that BOTH parties default inside the same interval
    — the exact first-to-default weight is ``lam_c/(lam_c+lam_b) *
    S(t_{j-1}) * (1 - e^{-(lam_c+lam_b) dt})``.  The bias is
    O(lam_c*lam_b*dt^2) per node (vanishes as ``n_grid`` grows; ~1e-7
    relative at the default grid-50 configs) and is mirrored exactly in
    :func:`xva_multi_closed_form` and the NumPy oracle, so every gate is
    self-consistent.  Use a finer grid for coarse-grid bilateral runs
    where both intensities are large.
    """
    dt = jnp.asarray(t, dtype) / n_grid
    j = jnp.arange(1, n_grid + 1, dtype=dtype)
    lam_c = jnp.asarray(intensity, dtype)
    lam_b = jnp.asarray(own_intensity, dtype)
    surv_prev = jnp.exp(-(lam_c + lam_b) * dt * (j - 1))
    w_cva = surv_prev * (-jnp.expm1(-lam_c * dt))
    w_dva = surv_prev * (-jnp.expm1(-lam_b * dt))
    return w_cva, w_dva


def funding_leg_weights(intensity, own_intensity, funding_spread, t,
                        n_grid: int, dtype=jnp.float32):
    """Funding accrual node table ``w_fnd_j = sf * dt * S_B * S_C`` at
    ``t_{j-1}`` (funding accrues over interval ``j`` while both parties
    survive at its start), shape ``(n_grid,)``.

    NOTE: no numeraire discount factor is applied — the funding legs are
    forward-valued, consistent with the engine-wide undiscounted CVA
    semantics inherited from the reference (``MonteCarloKernel.cu:467``).
    The conventional discounted FVA integral is this table times
    ``exp(-r t_{j-1})``; multiply in before passing to a custom kernel,
    or re-weight the returned EPE/ENE profiles externally.
    """
    dt = jnp.asarray(t, dtype) / n_grid
    j = jnp.arange(1, n_grid + 1, dtype=dtype)
    lam = jnp.asarray(intensity, dtype) + jnp.asarray(own_intensity, dtype)
    return jnp.asarray(funding_spread, dtype) * dt * jnp.exp(
        -lam * dt * (j - 1))


def xva_leg_weight_derivs(intensity, own_intensity, t, n_grid: int,
                          dtype=jnp.float32):
    """Per-leg derivative node tables ``(dw_cva/dlam_c, dw_dva/dlam_b,
    dw_fnd/dspread)``, shape ``(n_grid,)`` each.

    Exact derivatives of :func:`xva_leg_weights` /
    :func:`funding_leg_weights` with respect to each leg's OWN driver
    (the hedge-facing sensitivities: the counterparty CDS ratio
    dCVA/dlam_c, the own-credit ratio dDVA/dlam_b, and the funding
    basis dFVA/dspread).  With ``S(u) = exp(-(lam_c + lam_b) u)`` and
    ``w_cva_j = S(t_{j-1})(1 - e^{-lam_c dt})``:

        dw_cva_j/dlam_c = -t_{j-1} w_cva_j + S(t_{j-1}) dt e^{-lam_c dt}
        dw_dva_j/dlam_b = -t_{j-1} w_dva_j + S(t_{j-1}) dt e^{-lam_b dt}
        dw_fnd_j/dsf    = dt S(t_{j-1})

    The cross sensitivities (lam_c moving the DVA/funding legs through
    the joint survival factor, and vice versa) are deliberately NOT
    folded in — each output is the per-leg ratio a desk hedges with;
    total-bilateral credit deltas come from CRN bumps of
    :func:`mctpu.engine.price_xva`.
    """
    dt = jnp.asarray(t, dtype) / n_grid
    j = jnp.arange(1, n_grid + 1, dtype=dtype)
    lam_c = jnp.asarray(intensity, dtype)
    lam_b = jnp.asarray(own_intensity, dtype)
    t_prev = dt * (j - 1)
    surv_prev = jnp.exp(-(lam_c + lam_b) * t_prev)
    dwc = surv_prev * (t_prev * jnp.expm1(-lam_c * dt)
                       + dt * jnp.exp(-lam_c * dt))
    dwd = surv_prev * (t_prev * jnp.expm1(-lam_b * dt)
                       + dt * jnp.exp(-lam_b * dt))
    dwf = dt * surv_prev
    return dwc, dwd, dwf


def xva_multi_closed_form(intensity, lgd, own_intensity, own_lgd,
                          funding_spread, s, v, strikes, weights, r, t,
                          n_grid: int, dtype=None):
    """Exact xVA legs ``(cva, dva, fca, fba)`` for a SINGLE-SIGNED netting
    set over M correlated underlyings.

    All-long weights never trip the netting clamp, so ``EPE_j`` is linear
    and the per-underlying martingale argument of
    :func:`cva_multi_closed_form` gives ``E[EPE_j] = sum_m w_m C_0m
    e^{r t_j}`` with ``ENE_j = 0`` (hence DVA = FBA = 0 exactly); all-short
    sets mirror onto the ENE side.  Mixed-sign weights have no closed form
    (the clamp binds path-by-path) — raises; use the MC engine.
    """
    import numpy as _np
    w_np = _np.asarray(weights)
    if (w_np < 0).any() and (w_np > 0).any():
        raise ValueError("closed form requires single-signed weights "
                         "(netting binds otherwise); use the MC engine")
    if dtype is None:
        dtype = wide_dtype()
    s = jnp.asarray(s, dtype)
    v = jnp.asarray(v, dtype)
    strikes = jnp.asarray(strikes, dtype)
    weights = jnp.asarray(weights, dtype)
    c0 = jnp.sum(weights * bs_call(s, strikes, r, v, t))
    t_j = jnp.asarray(t, dtype) * jnp.arange(1, n_grid + 1, dtype=dtype) / n_grid
    growth = jnp.exp(jnp.asarray(r, dtype) * t_j)
    epe = jnp.maximum(c0, 0.0) * growth
    ene = jnp.maximum(-c0, 0.0) * growth
    w_cva, w_dva = xva_leg_weights(intensity, own_intensity, t, n_grid,
                                   dtype=dtype)
    w_fnd = funding_leg_weights(intensity, own_intensity, funding_spread,
                                t, n_grid, dtype=dtype)
    return (jnp.asarray(lgd, dtype) * jnp.sum(w_cva * epe),
            jnp.asarray(own_lgd, dtype) * jnp.sum(w_dva * ene),
            jnp.sum(w_fnd * epe), jnp.sum(w_fnd * ene))


def lookback_floating_call(s, r, v, t, m=None, dtype=None):
    """Continuously-monitored floating-strike lookback call
    (Goldman-Sosin-Gatto 1979): pays ``S_T - min_{u<=T} S_u``.

    ``m`` is the running minimum so far (= ``s`` for a fresh issue).  Used
    as the continuous-limit oracle for the discrete lookback MC engine —
    discrete monitoring samples a higher minimum, so the discrete price
    approaches this value FROM BELOW as ``n_obs`` grows.
    """
    if dtype is None:
        dtype = wide_dtype()
    s, r, v, t = (jnp.asarray(x, dtype) for x in (s, r, v, t))
    m = s if m is None else jnp.asarray(m, dtype)
    sq = v * jnp.sqrt(t)
    a1 = (jnp.log(s / m) + (r + 0.5 * v * v) * t) / sq
    a2 = a1 - sq
    a3 = (jnp.log(s / m) + (-r + 0.5 * v * v) * t) / sq
    q = 2.0 * r / (v * v)
    disc = jnp.exp(-r * t)
    return (s * norm_cdf(a1) - m * disc * norm_cdf(a2)
            + s * disc * (1.0 / q)
            * ((s / m) ** (-q) * norm_cdf(-a3)
               - jnp.exp(r * t) * norm_cdf(-a1)))


def bivariate_norm_cdf(a, b, rho, n_nodes: int = 256, dtype=None):
    """P(X <= a, Y <= b) for standard bivariate normals with correlation rho.

    Computed by Gauss-Legendre quadrature of
    ``int_-8^a phi(x) Phi((b - rho x)/sqrt(1-rho^2)) dx`` — accurate to
    ~1e-9 at 256 nodes, plenty for closed-form oracles.  Pure jnp.
    """
    if dtype is None:
        dtype = wide_dtype()
    import numpy as _np

    x_np, w_np = _np.polynomial.legendre.leggauss(n_nodes)
    a = jnp.asarray(a, dtype)
    b = jnp.asarray(b, dtype)
    rho = jnp.asarray(rho, dtype)
    lo = jnp.asarray(-8.0, dtype)
    half = (a - lo) / 2.0
    mid = (a + lo) / 2.0
    x = mid + half * jnp.asarray(x_np, dtype)
    w = half * jnp.asarray(w_np, dtype)
    phi = jnp.exp(-0.5 * x * x) * jnp.asarray(0.3989422804014327, dtype)
    denom = jnp.sqrt(jnp.maximum(1.0 - rho * rho, 1e-12))
    inner = norm_cdf((b - rho * x) / denom)
    return jnp.sum(w * phi * inner)


def rainbow_min_call(s1, s2, k, r, v1, v2, rho, t, dtype=None):
    """European call on the MIN of two correlated GBMs (Stulz 1982).

    ``C_min = S1 M(y1, -d; rho1) + S2 M(y2, d - s sqrt(T); rho2)
              - K e^{-rT} M(y1 - v1 sqrt(T), y2 - v2 sqrt(T); rho)``
    with ``s^2 = v1^2 + v2^2 - 2 rho v1 v2``.  The call on the MAX follows
    from ``C_max = C1 + C2 - C_min``.
    """
    if dtype is None:
        dtype = wide_dtype()
    s1, s2, k, r, v1, v2, rho, t = (jnp.asarray(x, dtype)
                                    for x in (s1, s2, k, r, v1, v2, rho, t))
    sq1 = v1 * jnp.sqrt(t)
    sq2 = v2 * jnp.sqrt(t)
    sig = jnp.sqrt(v1 * v1 + v2 * v2 - 2.0 * rho * v1 * v2)
    sqs = sig * jnp.sqrt(t)
    d = (jnp.log(s1 / s2) + 0.5 * sig * sig * t) / sqs
    y1 = (jnp.log(s1 / k) + (r + 0.5 * v1 * v1) * t) / sq1
    y2 = (jnp.log(s2 / k) + (r + 0.5 * v2 * v2) * t) / sq2
    rho1 = (rho * v2 - v1) / sig
    rho2 = (rho * v1 - v2) / sig
    m = bivariate_norm_cdf
    return (s1 * m(y1, -d, rho1) + s2 * m(y2, d - sqs, rho2)
            - k * jnp.exp(-r * t) * m(y1 - sq1, y2 - sq2, rho))


def rainbow_max_call(s1, s2, k, r, v1, v2, rho, t, dtype=None):
    """European call on the MAX of two correlated GBMs (Stulz 1982):
    ``C_max = C1 + C2 - C_min``."""
    return (bs_call(s1, k, r, v1, t) + bs_call(s2, k, r, v2, t)
            - rainbow_min_call(s1, s2, k, r, v1, v2, rho, t, dtype=dtype))


def cliquet_closed_form(r, v, t, n_periods: int, cap, floor, dtype=None):
    """Exact value of the locally capped/floored cliquet.

    Payoff (paid at T): ``sum_j clip(S_{t_j}/S_{t_{j-1}} - 1, floor, cap)``
    over ``n_periods`` equal periods.  Under GBM the period returns are
    i.i.d., so the expectation telescopes to ``n`` copies of one period's
    clipped-return mean, which is a call-spread in the gross return
    ``R = e^{(r - v^2/2) dt + v sqrt(dt) z}``:

        E[clip(R - 1, f, c)] = f + E[(R - (1+f))^+] - E[(R - (1+c))^+]

    with the UNDISCOUNTED Black expectation
    ``E[(R - K)^+] = e^{r dt} N(d1) - K N(d2)``.  The cliquet value is
    ``e^{-rT} n E[clip]`` — exact at any n, the oracle for the MC kernel.
    """
    if dtype is None:
        dtype = wide_dtype()
    r = jnp.asarray(r, dtype)
    v = jnp.asarray(v, dtype)
    t = jnp.asarray(t, dtype)
    dt = t / n_periods
    sq = v * jnp.sqrt(dt)

    def call_on_gross(kk):
        kk = jnp.asarray(kk, dtype)
        d1 = (-jnp.log(kk) + (r + 0.5 * v * v) * dt) / sq
        return jnp.exp(r * dt) * norm_cdf(d1) - kk * norm_cdf(d1 - sq)

    e_clip = (jnp.asarray(floor, dtype) + call_on_gross(1.0 + floor)
              - call_on_gross(1.0 + cap))
    return jnp.exp(-r * t) * n_periods * e_clip
