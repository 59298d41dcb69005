"""Multilevel Monte Carlo (Giles 2008) for discretized dynamics.

Completes the variance-reduction family (antithetic, control variates,
importance sampling, RQMC — ``mctpu.variance`` / ``mctpu.qmc_engine``)
with the classic multilevel estimator for dynamics whose *discretization*
carries bias: here the Heston full-truncation Euler scheme (the GBM
products sample terminal laws exactly, so MLMC has nothing to offer
them; the QE scheme is effectively unbiased at coarse grids — Euler is
the textbook MLMC target).

    E[P_L] = E[P_0] + sum_{l=1..L} E[P_l - P_{l-1}]

Each correction level simulates COUPLED fine/coarse paths from the same
Brownian increments (the coarse step consumes the sum of two fine
normals, scaled to unit variance), so Var[P_l - P_{l-1}] decays with
level and the deep (expensive) levels need only a few paths.  Sample
sizes follow the standard optimal allocation
``N_l ~ eps^-2 sqrt(V_l / C_l) * sum_l sqrt(V_l C_l)``.

Implementation notes (TPU-first):

* Per-level coupled walks are single jitted programs: one ``fori_loop``
  over *coarse* steps, each drawing two fine normal pairs, advancing the
  fine state twice and the coarse state once — both states in registers,
  no (n_steps, ...) arrays materialized.
* Levels reuse the engine's counter-stream discipline: block ``b`` of
  level ``l`` draws from ``fold_in(fold_in(key, l), b)`` — reproducible,
  independent across levels (MLMC requires independent level estimates).
* The adaptive outer loop (estimate V_l from pilots, allocate N_l, top
  up) is host-driven, as in every MLMC implementation: the loop's trip
  counts are data-dependent, but each level program is fixed-shape and
  compiled once per (level, tile) geometry.

Oracle: the Heston characteristic-function pricer
(:func:`mctpu.models.heston.cf_call_price`).  Reference scope: beyond
the reference (cited in PAPERS.md — "A nested MLMC framework ...").

Honest scoping: for the ATM Euler-Heston test configuration the level
variance decays at beta ~= 1 while level cost grows at gamma = 1 — the
boundary case of Giles's complexity theorem, where MLMC's advantage over
a well-tuned single level is a log factor that only materializes at
tight tolerances.  At the loose eps the CI exercises, MLMC comes out
*comparable* to the finest single level (measured within ~1.3x); the
estimator exists for the regimes where it pays — small eps, slower weak
convergence, payoffs whose bias forces deep refinement — and its level
table makes the variance/cost trade inspectable either way.
"""
from __future__ import annotations

import dataclasses
import math as pymath

import jax
import jax.numpy as jnp
import numpy as np

from mctpu.kernels.heston import _heston_step
from mctpu.types import HestonOption

__all__ = ["MlmcLevel", "MlmcResult", "price_heston_mlmc"]


@dataclasses.dataclass(frozen=True)
class MlmcLevel:
    """Recorded statistics of one MLMC level."""

    level: int
    n_steps: int
    n_paths: int
    mean: float     # E[P_l - P_{l-1}] (level 0: E[P_0])
    var: float      # Var of the level correction
    cost: float     # fine + coarse steps simulated per path


@dataclasses.dataclass(frozen=True)
class MlmcResult:
    """MLMC estimate: discounted price, 95% CI, and the level table."""

    price: float
    ci: float
    std_error: float
    levels: tuple
    total_path_steps: float

    def validate(self) -> "MlmcResult":
        assert np.isfinite(self.price) and np.isfinite(self.ci)
        return self


def _level_sums(opt: HestonOption, key, level: int, n0: int, n_paths: int,
                rows: int, lanes: int = 128):
    """(sum, sum2, n) of the level-``level`` correction over ``n_paths``.

    Level 0 is the plain ``n0``-step Euler payoff; level l couples an
    ``n0 * 2^l``-step fine walk with an ``n0 * 2^(l-1)``-step coarse walk
    driven by the same increments.
    """
    o = opt.astype(jnp.float32)
    n_fine = n0 * (2 ** level)
    n_coarse = n_fine // 2
    shape = (rows, lanes)
    tile = rows * lanes
    iters = max(1, -(-n_paths // tile))
    # Round the trip count to a power of two: the host-driven top-up loop
    # would otherwise compile a fresh program per exact iteration count;
    # this bounds compilations per level to O(log n) (paths are counted
    # exactly either way).
    iters = 1 << (iters - 1).bit_length()

    dt_f = jnp.float32(o.t / n_fine)
    sq_f = jnp.sqrt(dt_f)
    args_f = (o.kappa * dt_f, o.theta, o.xi, o.rho,
              jnp.sqrt(1.0 - o.rho * o.rho), o.r * dt_f, sq_f)
    if level > 0:
        dt_c = jnp.float32(o.t / n_coarse)
        args_c = (o.kappa * dt_c, o.theta, o.xi, o.rho,
                  jnp.sqrt(1.0 - o.rho * o.rho), o.r * dt_c,
                  jnp.sqrt(dt_c))

    inv_sqrt2 = jnp.float32(1.0 / np.sqrt(2.0))

    def payoff(x):
        return jnp.maximum(o.s * jnp.exp(x) - o.k, 0.0)

    def body(i, carry):
        s_acc, s2_acc, ikey = carry
        ikey, sub = jax.random.split(ikey)
        if level == 0:
            z = jax.random.normal(sub, (n_fine, 2) + shape, jnp.float32)

            def step0(j, st):
                x, v = st
                k_dt, th, xi, rc, rs, r_dt, sq = args_f
                return _heston_step(x, v, z[j, 0], z[j, 1], k_dt, th, xi,
                                    rc, rs, r_dt, sq)

            x, _ = jax.lax.fori_loop(0, n_fine, step0,
                                     (jnp.zeros(shape, jnp.float32),
                                      jnp.full(shape, o.v0, jnp.float32)))
            d = payoff(x)
        else:
            z = jax.random.normal(sub, (n_coarse, 2, 2) + shape,
                                  jnp.float32)

            def stepl(j, st):
                xf, vf, xc, vc = st
                k_dt, th, xi, rc, rs, r_dt, sq = args_f
                # Two fine steps from the two independent normal pairs.
                xf, vf = _heston_step(xf, vf, z[j, 0, 0], z[j, 0, 1], k_dt,
                                      th, xi, rc, rs, r_dt, sq)
                xf, vf = _heston_step(xf, vf, z[j, 1, 0], z[j, 1, 1], k_dt,
                                      th, xi, rc, rs, r_dt, sq)
                # One coarse step from the SAME Brownian increments:
                # dW_c = dW_f1 + dW_f2  ->  z_c = (z1 + z2)/sqrt(2).
                zc_v = (z[j, 0, 0] + z[j, 1, 0]) * inv_sqrt2
                zc_p = (z[j, 0, 1] + z[j, 1, 1]) * inv_sqrt2
                k_dt, th, xi, rc, rs, r_dt, sq = args_c
                xc, vc = _heston_step(xc, vc, zc_v, zc_p, k_dt, th, xi,
                                      rc, rs, r_dt, sq)
                return (xf, vf, xc, vc)

            xf, _, xc, _ = jax.lax.fori_loop(
                0, n_coarse, stepl,
                (jnp.zeros(shape, jnp.float32),
                 jnp.full(shape, o.v0, jnp.float32),
                 jnp.zeros(shape, jnp.float32),
                 jnp.full(shape, o.v0, jnp.float32)))
            d = payoff(xf) - payoff(xc)
        d64 = jnp.asarray(d, jnp.float64)
        return (s_acc + jnp.sum(d64), s2_acc + jnp.sum(d64 * d64), ikey)

    @jax.jit
    def run(key):
        s, s2, _ = jax.lax.fori_loop(
            0, iters, body, (jnp.float64(0.0), jnp.float64(0.0), key))
        return s, s2

    s, s2 = run(key)
    return float(s), float(s2), iters * tile


def price_heston_mlmc(opt: HestonOption, eps: float, key: jax.Array,
                      n0: int = 8, max_levels: int = 8,
                      n_pilot: int = 1 << 14, rows: int = 8,
                      bias_tol_factor: float = 1.0 / np.sqrt(2.0),
                      ) -> MlmcResult:
    """Giles MLMC price of a European call under Heston (Euler scheme).

    Targets root-mean-square error ``eps``: the statistical error budget
    is ``eps / sqrt(2)`` and levels are added until the weak-error
    estimate ``|mean_L| / (2^gamma - 1)`` falls under the bias budget
    (standard Giles convergence test with the observed weak rate).

    Returns the discounted price with a 95% CI over the *statistical*
    part, plus the per-level table (n_steps, paths, mean, variance,
    cost) so the variance decay is inspectable.
    """
    opt.validate()
    lanes = 128
    tile = rows * lanes

    stats = {}   # level -> [sum, sum2, n]

    def add_paths(level: int, n_extra: int):
        if n_extra <= 0 and level in stats:
            return
        lkey = jax.random.fold_in(key, level)
        # Distinct sub-key per top-up: fold in the current path count.
        lkey = jax.random.fold_in(lkey, stats.get(level, [0, 0, 0])[2])
        s, s2, n = _level_sums(opt, lkey, level, n0,
                               max(n_extra, tile), rows, lanes)
        if level in stats:
            stats[level][0] += s
            stats[level][1] += s2
            stats[level][2] += n
        else:
            stats[level] = [s, s2, n]

    def level_cost(level: int) -> float:
        # fine + coarse steps per path
        return n0 * (2 ** level) * (1.0 if level == 0 else 1.5)

    def mean_var(level: int):
        s, s2, n = stats[level]
        m = s / n
        v = max(s2 / n - m * m, 1e-30)
        return m, v, n

    # Pilot runs on levels 0..2.
    levels = [0, 1, 2]
    for l in levels:
        add_paths(l, n_pilot)

    stat_budget2 = (eps * bias_tol_factor) ** 2
    for _ in range(32):  # outer allocation loop (bounded)
        # Optimal allocation over current levels.
        terms = []
        for l in levels:
            _, v, _ = mean_var(l)
            terms.append(pymath.sqrt(v * level_cost(l)))
        lam = sum(terms) / stat_budget2
        need = False
        for l, t in zip(levels, terms):
            _, v, n = mean_var(l)
            n_opt = int(pymath.ceil(lam * pymath.sqrt(v / level_cost(l))))
            if n < n_opt:
                add_paths(l, n_opt - n)
                need = True
        if need:
            continue
        # Bias (weak-error) convergence test with the observed rate.
        if len(levels) >= 3:
            m_prev = abs(mean_var(levels[-2])[0])
            m_last = abs(mean_var(levels[-1])[0])
            gamma = 1.0
            if m_last > 0 and m_prev > 0:
                gamma = max(0.5, pymath.log2(m_prev / m_last))
            bias = m_last / (2.0 ** gamma - 1.0)
            if bias <= eps * pymath.sqrt(1.0 - bias_tol_factor ** 2):
                break
        if len(levels) >= max_levels:
            break
        nxt = levels[-1] + 1
        levels.append(nxt)
        add_paths(nxt, n_pilot)

    price = 0.0
    se2 = 0.0
    total_steps = 0.0
    table = []
    for l in levels:
        m, v, n = mean_var(l)
        price += m
        se2 += v / n
        total_steps += level_cost(l) * n
        table.append(MlmcLevel(level=l, n_steps=n0 * 2 ** l, n_paths=n,
                               mean=m, var=v, cost=level_cost(l)))
    disc = float(np.exp(-float(opt.r) * float(opt.t)))
    se = disc * pymath.sqrt(se2)
    return MlmcResult(price=disc * price, ci=1.96 * se, std_error=se,
                      levels=tuple(table),
                      total_path_steps=total_steps).validate()
