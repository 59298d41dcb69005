"""Independent NumPy oracle engine (the CPU twin, kept deliberately simple).

Port-of-behavior of the reference CPU engine ``MonteCarloHost.c`` (C9 in
SURVEY.md §2): same payoffs, same estimator (discounted mean + 95% CI from raw
``(sum, sum2)``), but an *independent implementation* — NumPy ``Generator``
(PCG64) randoms instead of JAX Threefry, plain vectorized arithmetic instead
of XLA — so agreement with the TPU engine is a genuine cross-check, exactly
like the reference's CPU-vs-GPU basket comparison (``basketOpt.cu:122``).

This module intentionally does NOT import jax.
"""
from __future__ import annotations

import dataclasses
import numpy as np

from mctpu.types import BasketOption, CvaSpec, VanillaOption

__all__ = [
    "OracleResult",
    "bs_call",
    "price_vanilla",
    "price_basket",
    "price_cva",
]

_A = (0.31938153, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_ONEOVER2PI = 0.39894228040143267793994605993438


@dataclasses.dataclass(frozen=True)
class OracleResult:
    price: float
    ci: float
    std_error: float
    n: int
    expected_exposure: np.ndarray | None = None


def norm_cdf(d):
    """Hastings polynomial CDF, as in ``MonteCarloHost.c:125-137``."""
    d = np.asarray(d, dtype=np.float64)
    k = 1.0 / (1.0 + 0.2316419 * np.abs(d))
    poly = k * (_A[0] + k * (_A[1] + k * (_A[2] + k * (_A[3] + k * _A[4]))))
    cnd = _ONEOVER2PI * np.exp(-0.5 * d * d) * poly
    return np.where(d > 0, 1.0 - cnd, cnd)


def cholesky_psd(c: np.ndarray) -> np.ndarray:
    """Golub-Van Loan Cholesky with the reference's PSD pivot guard
    (``Chol``, ``MonteCarloHost.c:91-106``): zero column on vanishing pivot,
    so the reference's singular default correlation matrix factorizes."""
    c = np.asarray(c, np.float64)
    n = c.shape[0]
    a = np.zeros_like(c)
    tol = n * np.finfo(np.float64).eps * np.abs(np.diag(c)).max()
    for j in range(n):
        v = c[j:, j] - a[j:, :j] @ a[j, :j]
        if v[0] > tol:  # relative pivot tolerance (numerically zero -> skip)
            a[j:, j] = v / np.sqrt(v[0])
    return a


def bs_call(s, k, r, v, t):
    """Black-Scholes call (``host_bsCall``, ``MonteCarloHost.c:140-144``)
    with the normalized intrinsic-value limit at t == 0."""
    s = np.asarray(s, dtype=np.float64)
    t = np.asarray(t, dtype=np.float64)
    t_safe = np.maximum(t, 1e-12)
    sq = v * np.sqrt(t_safe)
    d1 = (np.log(s / k) + (r + 0.5 * v * v) * t_safe) / sq
    d2 = d1 - sq
    price = s * norm_cdf(d1) - k * np.exp(-r * t_safe) * norm_cdf(d2)
    return np.where(t > 1e-12, price, np.maximum(s - k, 0.0))


def _estimate(payoffs: np.ndarray, discount: float) -> OracleResult:
    """The reference estimator (``MonteCarloHost.c:221-229``): discounted mean,
    sample stdev from raw sums, 95% CI = 1.96 sigma / sqrt(n).

    Unlike the reference we discount the standard error as well, so price,
    ``std_error`` and ``ci`` share units (package-wide convention)."""
    n = payoffs.size
    s = float(payoffs.sum())
    s2 = float((payoffs * payoffs).sum())
    price = discount * s / n
    emp_std = np.sqrt(max(n * s2 - s * s, 0.0) / (n * (n - 1.0)))
    se = discount * emp_std / np.sqrt(n)
    return OracleResult(price=float(price), ci=float(1.96 * se), std_error=float(se), n=n)


def price_vanilla(opt: VanillaOption, n_paths: int, seed: int = 0,
                  antithetic: bool = False) -> OracleResult:
    """Serial-twin of ``host_vanillaOpt`` (``MonteCarloHost.c:284-292``)."""
    rng = np.random.default_rng(seed)
    s, k, r, v, t = (float(x) for x in (opt.s, opt.k, opt.r, opt.v, opt.t))
    if antithetic:
        z = rng.standard_normal(n_paths // 2)
        z = np.concatenate([z, -z])
    else:
        z = rng.standard_normal(n_paths)
    st = s * np.exp((r - 0.5 * v * v) * t + v * np.sqrt(t) * z)
    if getattr(opt, "kind", "call") == "put":
        p = np.maximum(k - st, 0.0)
    else:
        p = np.maximum(st - k, 0.0)
    if antithetic:
        half = n_paths // 2
        p = 0.5 * (p[:half] + p[half:])  # pair means are the i.i.d. unit
    return _estimate(p, np.exp(-r * t))


def price_basket(opt: BasketOption, n_paths: int, seed: int = 0) -> OracleResult:
    """Twin of the basket branch of ``MonteCarlo`` (``MonteCarloHost.c:202-219``)."""
    rng = np.random.default_rng(seed)
    a = opt.n_assets
    s0 = np.asarray(opt.s, np.float64)
    v = np.asarray(opt.v, np.float64)
    w = np.asarray(opt.w, np.float64)
    d = np.asarray(opt.d, np.float64)
    corr = np.asarray(opt.corr, np.float64)
    k, r, t = float(opt.k), float(opt.r), float(opt.t)
    chol = cholesky_psd(corr)
    z = rng.standard_normal((n_paths, a))
    bt = z @ chol.T + d  # simGaussVect: MonteCarloHost.c:151-162
    st = s0 * np.exp((r - 0.5 * v * v) * t + v * np.sqrt(t) * bt)
    p = np.maximum(st @ w - k, 0.0)
    return _estimate(p, np.exp(-r * t))


def binomial_american(s, k, r, v, t, n_steps: int = 2000,
                      payoff: str = "put") -> float:
    """Cox-Ross-Rubinstein binomial price of an American option.

    Independent lattice oracle for the Longstaff-Schwartz engine
    (:mod:`mctpu.lsm`); converges O(1/n) to the continuous-exercise price.
    """
    dt = t / n_steps
    u = np.exp(v * np.sqrt(dt))
    d = 1.0 / u
    p = (np.exp(r * dt) - d) / (u - d)
    disc = np.exp(-r * dt)
    j = np.arange(n_steps + 1)
    st = s * u ** (n_steps - j) * d ** j

    def exercise(sv):
        return np.maximum(k - sv, 0.0) if payoff == "put" else np.maximum(sv - k, 0.0)

    values = exercise(st)
    for step in range(n_steps - 1, -1, -1):
        st = st[: step + 1] * d  # spots at this level
        values = disc * (p * values[:-1] + (1 - p) * values[1:])
        values = np.maximum(values, exercise(st))
    return float(values[0])


def price_cva_portfolio(intensity, lgd, s0, r, v, t, strikes, weights,
                        n_grid: int, n_paths: int, seed: int = 0,
                        wwr_b: float = 0.0) -> OracleResult:
    """Netted-portfolio CVA oracle: exposure = max(sum_m w_m BS_m, 0).

    ``wwr_b != 0`` switches on the wrong-way hazard
    ``h_j = intensity * exp(wwr_b * z_j - wwr_b^2/2)`` (``z_j`` the
    standardized log-return at node j), with per-path default masses
    ``dp_j = surv_{j-1} - surv_j`` — the independent NumPy twin of the
    engine's WWR mode (see ``mctpu.types.CvaPortfolioSpec``).
    """
    rng = np.random.default_rng(seed)
    strikes = np.asarray(strikes, np.float64)
    weights = np.asarray(weights, np.float64)
    dt = t / n_grid
    j = np.arange(1, n_grid + 1)
    dp = np.exp(-intensity * dt * (j - 1)) - np.exp(-intensity * dt * j)
    s = np.full(n_paths, float(s0))
    surv = np.ones(n_paths)
    acc = np.zeros(n_paths)
    drift = (r - 0.5 * v * v) * dt
    vol = v * np.sqrt(dt)
    for jj in range(1, n_grid + 1):
        z = rng.standard_normal(n_paths)
        s = s * np.exp(drift + vol * z)
        t_rem = t * (n_grid - jj) / n_grid
        value = np.zeros(n_paths)
        for k, w in zip(strikes, weights):
            value += w * bs_call(s, k, r, v, t_rem)
        if wwr_b != 0.0:
            t_j = t * jj / n_grid
            zstd = ((np.log(s / float(s0)) - (r - 0.5 * v * v) * t_j)
                    / (v * np.sqrt(t_j)))
            h = intensity * np.exp(wwr_b * zstd - 0.5 * wwr_b * wwr_b)
            surv_new = surv * np.exp(-h * dt)
            dp_j = surv - surv_new
            surv = surv_new
        else:
            dp_j = dp[jj - 1]
        acc += dp_j * np.maximum(value, 0.0)
    return _estimate(lgd * acc, discount=1.0)


def _basket_walk(opt, n_paths: int, n_obs: int, seed: int):
    """Yields the (n_paths,) basket value at each of n_obs dates (NumPy)."""
    rng = np.random.default_rng(seed)
    a = opt.n_assets
    s0 = np.asarray(opt.s, np.float64)
    v = np.asarray(opt.v, np.float64)
    w = np.asarray(opt.w, np.float64)
    d = np.asarray(opt.d, np.float64)
    r, t = float(opt.r), float(opt.t)
    chol = cholesky_psd(np.asarray(opt.corr, np.float64))
    dt = t / n_obs
    drift = (r - 0.5 * v * v) * dt
    vol = v * np.sqrt(dt)
    d_step = d / np.sqrt(n_obs)
    s = np.tile(s0, (n_paths, 1))
    for _ in range(n_obs):
        z = rng.standard_normal((n_paths, a))
        bt = z @ chol.T + d_step
        s = s * np.exp(drift + vol * bt)
        yield s @ w


def price_basket_asian(opt, n_paths: int, seed: int = 0) -> OracleResult:
    """Oracle twin of the packed basket-Asian walk kernel
    (:mod:`mctpu.kernels.multi_walk`)."""
    acc = None
    bk = opt.basket
    for basket in _basket_walk(bk, n_paths, opt.n_obs, seed):
        acc = basket if acc is None else acc + basket
    pay = np.maximum(acc / opt.n_obs - float(bk.k), 0.0)
    return _estimate(pay, np.exp(-float(bk.r) * float(bk.t)))


def price_basket_barrier(opt, n_paths: int, seed: int = 0) -> OracleResult:
    """Oracle twin of the packed basket-barrier walk kernel."""
    bk = opt.basket
    up = opt.kind == "up-and-out"
    alive = np.ones(n_paths, bool)
    basket = None
    for basket in _basket_walk(bk, n_paths, opt.n_obs, seed):
        alive &= (basket < float(opt.barrier)) if up \
            else (basket > float(opt.barrier))
    pay = np.where(alive, np.maximum(basket - float(bk.k), 0.0), 0.0)
    return _estimate(pay, np.exp(-float(bk.r) * float(bk.t)))


def price_lookback(opt, n_paths: int, seed: int = 0) -> OracleResult:
    """NumPy twin of :func:`mctpu.engine.price_lookback` (LookbackOption)."""
    rng = np.random.default_rng(seed)
    s0, r, v, t = (float(x) for x in (opt.s, opt.r, opt.v, opt.t))
    k, g = float(opt.k), int(opt.n_obs)
    dt = t / g
    drift = (r - 0.5 * v * v) * dt
    vol = v * np.sqrt(dt)
    s = np.full(n_paths, s0)
    ext = np.full(n_paths, s0)
    use_min = (opt.kind == "floating") != (opt.payoff == "put")
    for _ in range(g):
        s = s * np.exp(drift + vol * rng.standard_normal(n_paths))
        ext = np.minimum(ext, s) if use_min else np.maximum(ext, s)
    if opt.kind == "floating":
        pay = (ext - s) if opt.payoff == "put" else (s - ext)
    elif opt.payoff == "put":
        pay = np.maximum(k - ext, 0.0)
    else:
        pay = np.maximum(ext - k, 0.0)
    return _estimate(pay, np.exp(-r * t))


def price_rainbow(opt, n_paths: int, seed: int = 0) -> OracleResult:
    """NumPy twin of :func:`mctpu.engine.price_rainbow` (RainbowOption)."""
    rng = np.random.default_rng(seed)
    m = opt.n_assets
    s0 = np.asarray(opt.s, np.float64)
    v = np.asarray(opt.v, np.float64)
    k, r, t = float(opt.k), float(opt.r), float(opt.t)
    chol = cholesky_psd(np.asarray(opt.corr, np.float64))
    z = rng.standard_normal((n_paths, m))
    st = s0 * np.exp((r - 0.5 * v * v) * t + v * np.sqrt(t) * (z @ chol.T))
    ext = st.min(axis=1) if opt.kind == "min" else st.max(axis=1)
    return _estimate(np.maximum(ext - k, 0.0), np.exp(-r * t))


def price_cva_multi(spec, n_paths: int, seed: int = 0) -> OracleResult:
    """NumPy twin of :func:`mctpu.engine.price_cva_multi` (CvaMultiSpec):
    netting set of calls on M correlated underlyings."""
    rng = np.random.default_rng(seed)
    m = spec.n_underlyings
    s0 = np.asarray(spec.s, np.float64)
    v = np.asarray(spec.v, np.float64)
    strikes = np.asarray(spec.strikes, np.float64)
    weights = np.asarray(spec.weights, np.float64)
    r, t = float(spec.r), float(spec.t)
    lam, lgd, g = float(spec.intensity), float(spec.lgd), int(spec.n_grid)
    chol = cholesky_psd(np.asarray(spec.corr, np.float64))
    dt = t / g
    j = np.arange(1, g + 1)
    dp = np.exp(-lam * dt * (j - 1)) - np.exp(-lam * dt * j)
    drift = (r - 0.5 * v * v) * dt
    vol = v * np.sqrt(dt)
    s = np.tile(s0, (n_paths, 1))
    acc = np.zeros(n_paths)
    for jj in range(1, g + 1):
        z = rng.standard_normal((n_paths, m))
        s = s * np.exp(drift + vol * (z @ chol.T))
        t_rem = t * (g - jj) / g
        value = np.zeros(n_paths)
        for i in range(m):
            value += weights[i] * bs_call(s[:, i], strikes[i], r, v[i], t_rem)
        acc += dp[jj - 1] * np.maximum(value, 0.0)
    return _estimate(lgd * acc, discount=1.0)


def price_xva_multi(xspec, n_paths: int, seed: int = 0) -> dict:
    """NumPy twin of :func:`mctpu.engine.price_xva` (XvaSpec): bilateral
    CVA/DVA/FCA/FBA legs of a netting set from one shared path sweep.

    Returns ``{"cva"|"dva"|"fca"|"fba": OracleResult, "epe"|"ene":
    (n_grid,) profile}``.  Leg weights follow
    :func:`mctpu.math.xva_leg_weights` (first-to-default) and
    :func:`mctpu.math.funding_leg_weights` (survival-weighted accrual).
    """
    spec = xspec.netting
    rng = np.random.default_rng(seed)
    m = spec.n_underlyings
    s0 = np.asarray(spec.s, np.float64)
    v = np.asarray(spec.v, np.float64)
    strikes = np.asarray(spec.strikes, np.float64)
    weights = np.asarray(spec.weights, np.float64)
    r, t = float(spec.r), float(spec.t)
    lam = float(spec.intensity)
    lam_b = float(xspec.own_intensity)
    lgd, olgd = float(spec.lgd), float(xspec.own_lgd)
    sf = float(xspec.funding_spread)
    g = int(spec.n_grid)
    chol = cholesky_psd(np.asarray(spec.corr, np.float64))
    dt = t / g
    j = np.arange(1, g + 1)
    surv_prev = np.exp(-(lam + lam_b) * dt * (j - 1))
    w_cva = surv_prev * -np.expm1(-lam * dt)
    w_dva = surv_prev * -np.expm1(-lam_b * dt)
    w_fnd = sf * dt * surv_prev
    drift = (r - 0.5 * v * v) * dt
    vol = v * np.sqrt(dt)
    s = np.tile(s0, (n_paths, 1))
    ac = np.zeros(n_paths)
    ad = np.zeros(n_paths)
    af = np.zeros(n_paths)
    ab = np.zeros(n_paths)
    epe_prof = np.empty(g)
    ene_prof = np.empty(g)
    for jj in range(1, g + 1):
        z = rng.standard_normal((n_paths, m))
        s = s * np.exp(drift + vol * (z @ chol.T))
        t_rem = t * (g - jj) / g
        value = np.zeros(n_paths)
        for i in range(m):
            value += weights[i] * bs_call(s[:, i], strikes[i], r, v[i],
                                          t_rem)
        epe = np.maximum(value, 0.0)
        ene = np.maximum(-value, 0.0)
        ac += w_cva[jj - 1] * epe
        ad += w_dva[jj - 1] * ene
        af += w_fnd[jj - 1] * epe
        ab += w_fnd[jj - 1] * ene
        epe_prof[jj - 1] = epe.mean()
        ene_prof[jj - 1] = ene.mean()
    return {
        "cva": _estimate(lgd * ac, discount=1.0),
        "dva": _estimate(olgd * ad, discount=1.0),
        "fca": _estimate(af, discount=1.0),
        "fba": _estimate(ab, discount=1.0),
        "epe": epe_prof,
        "ene": ene_prof,
    }


def price_cva(spec: CvaSpec, n_paths: int, seed: int = 0) -> OracleResult:
    """Twin of ``cvaMonteCarlo`` (``MonteCarloHost.c:233-278``).

    Normalized node semantics (shared with the TPU engine, SURVEY.md §3.4):
    exposure at node j is ``BS(S_j, T - j dt)`` with the intrinsic value at the
    final node; the estimator mean is NOT discounted
    (``MonteCarloHost.c:273``).  Also returns the expected-exposure profile.
    """
    rng = np.random.default_rng(seed)
    opt = spec.option
    s0, k, r, v, t = (float(x) for x in (opt.s, opt.k, opt.r, opt.v, opt.t))
    lam, lgd, g = float(spec.intensity), float(spec.lgd), int(spec.n_grid)
    dt = t / g
    j = np.arange(1, g + 1)
    dp = np.exp(-lam * dt * (j - 1)) - np.exp(-lam * dt * j)
    s = np.full(n_paths, s0)
    acc = np.zeros(n_paths)
    ee_profile = np.empty(g)
    drift = (r - 0.5 * v * v) * dt
    vol = v * np.sqrt(dt)
    for jj in range(1, g + 1):
        z = rng.standard_normal(n_paths)
        s = s * np.exp(drift + vol * z)
        t_rem = t * (g - jj) / g
        ee = bs_call(s, k, r, v, t_rem)
        ee_profile[jj - 1] = ee.mean()
        acc += dp[jj - 1] * ee
    res = _estimate(lgd * acc, discount=1.0)
    return dataclasses.replace(res, expected_exposure=ee_profile)
