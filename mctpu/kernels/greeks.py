"""Fused pathwise-Greeks Monte Carlo kernels (vanilla + basket).

Prices alone are not enough for a pricing desk; the sensitivities must run
at the same engine scale.  These kernels extend the fused vanilla/basket
payoff kernels (``kernels/vanilla.py`` / ``kernels/basket.py``) to
accumulate pathwise derivative sums *alongside* ``(sum_p, sum_p2)`` — under
GBM each Greek is one indicator-times-factor FMA on values the kernel
already holds in registers (the payoff formulas sit next to ``callPayoff``,
``MonteCarloKernel.cu:67-71``; the reference computes no sensitivities).

Pathwise identities for the vanilla call ``P = (S_T - K)^+`` with
``S_T = s0 exp((r - v^2/2) t + v sqrt(t) z)`` and ``I = 1{S_T > K}``:

    dP/ds0 = I S_T / s0                       (delta integrand)
    dP/dv  = I S_T (sqrt(t) z - v t)          (vega integrand)
    rho    = d/dr [e^{-rt} E P] = e^{-rt} E[t K I]
    theta  = d/dt [e^{-rt} E P]
           = e^{-rt} E[I S_T (r - v^2/2 + v z / (2 sqrt(t))) - r P]

``rho``/``theta`` fold their ``-t*price`` / ``-r*price`` discount terms INTO
the per-path integrand (``g_rho = t(I S_T - P) = t K I``), so each Greek is
a plain MC mean with an honest per-Greek CI — no post-hoc covariance needed.
The put mirrors every identity with ``I = -1{S_T < K}``.

Pathwise differentiation is unbiased here because the payoff kink has
measure zero (Glasserman, *MC Methods in Financial Engineering*, §7.2).
Gamma is a Dirac second derivative, so pure pathwise fails — the kernel
instead uses the **mixed pathwise-then-likelihood-ratio estimator**
(Glasserman §7.3): differentiate the pathwise delta ``E[I S_T]/s0`` once
more with the lognormal score ``d ln p/d s0 = z/(s0 v sqrt(t))``, which
after the product rule collapses (via ``E[I S_T (z/sig - 1)] =
E[K I z]/sig``, both sides checked against BS gamma) to

    gamma integrand = (K / (s0^2 v sqrt(t))) * ind * z

— one FMA on values already in registers, unbiased for calls AND puts
(``ind`` carries the put's sign; both reduce to ``e^{-rt} K phi(d2) /
(s0^2 v sqrt(t)) = phi(d1)/(s0 v sqrt(t))``, the BS gamma).

Per block the kernels emit 16 partial sums
``(sum_p, sum_p2, sum_gd, sum_gd2, sum_gv, sum_gv2, sum_gr, sum_gr2,
sum_gt, sum_gt2, sum_gg, sum_gg2, sum_gvn, sum_gvn2, sum_gvg,
sum_gvg2)`` — same mesh / fixed-order-combine / estimator contract as
the pricing kernels, so Greeks are bitwise shard-invariant too.
Vanna and volga (the second-order cross sensitivities) use the same
mixed pathwise-LR device as gamma; see ``_greek_tile``.

The basket kernel accumulates per-asset delta and vega *vectors* in the
packed lane layout of ``kernels/basket.py``:

    delta_i = I w_i S_i / s0_i
    vega_i  = I w_i S_i (sqrt(t) bt_i - v_i t)

where ``bt = L z`` is the correlated Brownian vector the kernel already
computed for the payoff.
"""
from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mctpu import rng as mcrng
from mctpu.kernels import basket as kbasket
from mctpu.kernels.common import (block_out_shape, block_out_spec,
                                  GRID_SEMANTICS, LANES, Plan, acc_add_n,
                                  acc_final_n, acc_init_n, det_col_sums,
                                  draw_normal_pair,
                                  interpret_arg, prng_emulation, seed_prng)
from mctpu.types import BasketOption, VanillaOption

__all__ = ["make_plan", "xla_partials", "pallas_partials", "N_SUMS",
           "make_basket_plan", "xla_basket_partials",
           "pallas_basket_partials"]

N_SUMS = 16  # (sum, sum^2) of: payoff, delta, vega, rho, theta, gamma,
#              vanna, volga


def make_plan(n_paths: int, num_blocks: int, rows: int, antithetic: bool,
              dtype: str = "float32", kahan: bool = True) -> Plan:
    units = 2 * rows * LANES  # both Box-Muller branches per iteration
    paths = units * (2 if antithetic else 1)
    return Plan.plan(n_paths, num_blocks, rows, paths, units, antithetic,
                     dtype, kahan)


def _greek_tile(s0, k, r, v, t, mu, sig, sqt, z, antithetic: bool,
                put: bool):
    """Payoff + 7 Greek integrands of one tile of normals (pair-mean when
    antithetic).  Returns an 8-tuple of arrays shaped like ``z``.

    The second-order cross terms use the same mixed pathwise-LR device
    as gamma (module docstring): differentiating the vega integrand
    ``ind S_T wv`` (``wv = d log S/dv = sqt z - v t``) in s0 (vanna) or
    v (volga) splits into a plain pathwise part plus a Dirac at the
    kink, which Stein's identity converts to sampleable form:

        vanna = E[ind ((S_T/s0) wv + (K/(s0 sig)) (wv z - sqt))]
        volga = E[ind (S_T (wv^2 - t) + (K/sig) wv (wv z - 2 sqt))]

    The SIGNED put indicator (-1) makes both formulas cover call and put
    unchanged — the boundary jump of the indicator has the same sign in
    both cases, matching put-call parity (second derivatives of the
    linear forward term vanish, so put vanna/volga == call vanna/volga).
    """
    cg = k / (s0 * s0 * sig)  # mixed PW-LR gamma scale (module docstring)
    cvn = k / (s0 * sig)      # vanna LR scale
    cvg = k / sig             # volga LR scale
    inv_s0 = 1.0 / s0

    def quants(zz):
        st = s0 * jnp.exp(mu + sig * zz)
        if put:
            ind = jnp.where(st < k, -1.0, 0.0).astype(st.dtype)
            p = jnp.maximum(k - st, 0.0)
        else:
            ind = jnp.where(st > k, 1.0, 0.0).astype(st.dtype)
            p = jnp.maximum(st - k, 0.0)
        w = ind * st  # signed I * S_T — the common pathwise factor
        gd = w * inv_s0
        wv = sqt * zz - v * t
        gv = w * wv
        gr = (t * k) * ind
        gt = w * (r - 0.5 * v * v + 0.5 * v * zz / sqt) - r * p
        gg = cg * (ind * zz)
        gvn = gd * wv + cvn * (ind * (wv * zz - sqt))
        gvg = w * (wv * wv - t) + cvg * (ind * (wv * (wv * zz - 2.0 * sqt)))
        return (p, gd, gv, gr, gt, gg, gvn, gvg)

    if antithetic:
        a = quants(z)
        b = quants(-z)
        return tuple(0.5 * (x + y) for x, y in zip(a, b))
    return quants(z)


def _tile_sums(tiles):
    """Interleaved (sum, sum^2) of each tile -> 2*len(tiles) scalars."""
    out = []
    for q in tiles:
        out.append(jnp.sum(q))
        out.append(jnp.sum(q * q))
    return tuple(out)


def _pair_sums(t1, t2):
    return tuple(a + b for a, b in zip(_tile_sums(t1), _tile_sums(t2)))


# ---------------------------------------------------------------------------
# XLA backend (Threefry streams; CPU tests + non-TPU fallback)
# ---------------------------------------------------------------------------

def xla_partials(opt: VanillaOption, key: jax.Array, block_offset,
                 plan: Plan, n_blocks: int):
    """Per-block Greek partial sums, shape ``(n_blocks, 16)``."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    mu = (o.r - 0.5 * o.v * o.v) * o.t
    sqt = jnp.sqrt(o.t)
    sig = o.v * sqt
    put = opt.kind == "put"

    def block_fn(bkey):
        def body(i, carry):
            zk = jax.random.fold_in(bkey, i)
            z = jax.random.normal(zk, (2, plan.rows, LANES), dtype)
            tiles = _greek_tile(o.s, o.k, o.r, o.v, o.t, mu, sig, sqt, z,
                                plan.antithetic, put)
            return acc_add_n(carry, _tile_sums(tiles), plan.kahan)

        carry = jax.lax.fori_loop(0, plan.iters, body,
                                  acc_init_n(N_SUMS, dtype, plan.kahan))
        return jnp.stack(acc_final_n(carry, plan.kahan))

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


# ---------------------------------------------------------------------------
# Pallas TPU backend (in-kernel hardware PRNG; f32 only)
# ---------------------------------------------------------------------------

def _greeks_kernel(seed_ref, off_ref, par_ref, out_ref, *, plan: Plan,
                   put: bool):
    seed_prng(seed_ref[0], off_ref[0] + pl.program_id(0))
    s0, k, r, v = par_ref[0], par_ref[1], par_ref[2], par_ref[3]
    t, mu, sig, sqt = par_ref[4], par_ref[5], par_ref[6], par_ref[7]

    def body(i, carry):
        z1, z2 = draw_normal_pair((plan.rows, LANES), i)
        t1 = _greek_tile(s0, k, r, v, t, mu, sig, sqt, z1, plan.antithetic,
                         put)
        t2 = _greek_tile(s0, k, r, v, t, mu, sig, sqt, z2, plan.antithetic,
                         put)
        return acc_add_n(carry, _pair_sums(t1, t2), plan.kahan)

    carry = jax.lax.fori_loop(0, plan.iters, body,
                              acc_init_n(N_SUMS, jnp.float32, plan.kahan))
    sums = acc_final_n(carry, plan.kahan)
    for j, sj in enumerate(sums):
        out_ref[0, 0, j] = sj


def pallas_partials(opt: VanillaOption, seed, block_offset, plan: Plan,
                    n_blocks: int, interpret: bool = False):
    """Per-block Greek partial sums, shape ``(n_blocks, 16)``, fused
    on TPU."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        return _pallas_partials(opt, seed, block_offset, plan, n_blocks,
                                interpret)


def _pallas_partials(opt, seed, block_offset, plan, n_blocks, interpret):
    o = opt.astype(jnp.float32)
    sqt = jnp.sqrt(o.t)
    mu = (o.r - 0.5 * o.v * o.v) * o.t
    sig = o.v * sqt
    params = jnp.stack([o.s, o.k, o.r, o.v, o.t, mu, sig, sqt])
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))

    kernel = functools.partial(_greeks_kernel, plan=plan,
                               put=opt.kind == "put")
    flops_iter = plan.rows * LANES * 2 * (2 if plan.antithetic else 1)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=block_out_spec(N_SUMS),
        out_shape=block_out_shape(n_blocks, N_SUMS),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=GRID_SEMANTICS,
        ),
        cost_estimate=pl.CostEstimate(
            flops=30 * plan.iters * flops_iter,
            bytes_accessed=n_blocks * 4 * N_SUMS,
            transcendentals=5 * plan.iters * flops_iter,
        ),
        interpret=interpret_arg(interpret),
    )(seed_arr, off_arr, params).reshape(n_blocks, N_SUMS)


# ===========================================================================
# Basket Greeks: per-asset delta and vega vectors in the packed lane layout
# ===========================================================================

def make_basket_plan(n_paths: int, num_blocks: int, rows: int,
                     antithetic: bool, dtype: str = "float32",
                     kahan: bool = True, n_assets: int = 3) -> Plan:
    if kbasket.use_asset_major(n_assets):
        units = 2 * rows * kbasket.LANES  # asset-major: every lane a path
    else:
        _, c, _ = kbasket.pack_factor(n_assets)
        units = 2 * rows * c
    paths = units * (2 if antithetic else 1)
    return Plan.plan(n_paths, num_blocks, rows, paths, units, antithetic,
                     dtype, kahan)


# ---------------------------------------------------------------------------
# Asset-major basket Greeks (a <= ASSET_MAJOR_MAX): same tile layout and
# RNG streams as the asset-major pricer, so price/Greeks share draws with
# price_basket exactly (the CRN property the bump gates rely on).
# ---------------------------------------------------------------------------

def _am_greek_quants(zs, lt_at, par_at, evec_at, gvec_at, k, a: int, sqt,
                     t, r, antithetic: bool):
    """One path tile -> ``(p, [gd_i], [gv_i], [gg_i], ind, th)``
    (pair-means if antithetic).

    ``gd_i = 1{basket>k} * w_i s0_i exp(arg_i)`` (the per-asset ``1/s0_i``
    factor is applied to the scalar sums by the caller); ``gv_i`` carries
    the pathwise dd(arg)/dv_i factor ``sqt*btd_i - v_i*t``.  ``ind`` is the
    exercise indicator (the rho integrand is ``t*K*ind`` — ``dS_i/dr =
    t S_i`` collapses ``ind*B - p`` to ``ind*K``); ``th`` is the pathwise
    maturity derivative ``sum_i gd_i (drift_i + vol_i btd_i / 2) / t
    - r p``.

    ``gg_i`` is the per-asset DIAGONAL GAMMA integrand (mixed
    pathwise-LR).  ``d delta_i/ds0_i = E[(w_i S_i/s0_i)^2 delta(B-K)]``
    is a Dirac; Stein's identity along the Brownian tilt direction
    ``e = L^{-1} 1`` (chosen so d(bt_i)/du == const for every asset,
    making dB/du = sum w_i S_i vol_i g_i > 0 bounded away from 0, with
    g = L e sign-definite — see :func:`tilt_direction`) converts it to
    (no normalization needed: Stein pairs the RAW directional derivative
    with the RAW projection <z, e>):

        gg_i = I (w_i S_i)^2 (zu - 2 vol_i g_i + Bu2/Bu) / Bu

    with ``zu = sum_j e_j z_j``, ``Bu = sum w_i S_i vol_i g_i``,
    ``Bu2 = sum w_i S_i (vol_i g_i)^2`` (caller applies ``1/s0_i^2``;
    full-rank correlations give ``g == 1``).  The
    single-asset limit reduces to ``I (S/s0^2)(z - vol)/vol`` — an
    alternate grouping of the vanilla mixed gamma, equal in expectation.
    """
    def one(sgn):
        terms, btds = [], []
        basket = zu = None
        for i in range(a):
            bt = None
            for j in range(i + 1):
                x = lt_at(i, j) * zs[j]
                bt = x if bt is None else bt + x
            btd = sgn * bt + par_at(2, i)
            term = par_at(3, i) * jnp.exp(par_at(0, i) + par_at(1, i) * btd)
            terms.append(term)
            btds.append(btd)
            basket = term if basket is None else basket + term
            x = evec_at(i) * (sgn * zs[i])
            zu = x if zu is None else zu + x
        ind = jnp.where(basket > k, 1.0, 0.0)
        p = jnp.maximum(basket - k, 0.0)
        gds = [ind * terms[i] for i in range(a)]
        gvs = [gds[i] * (sqt * btds[i] - (par_at(1, i) / sqt) * t)
               for i in range(a)]
        th = bu = bu2 = None
        for i in range(a):
            x = gds[i] * (par_at(0, i) + 0.5 * par_at(1, i) * btds[i])
            th = x if th is None else th + x
            vg = par_at(1, i) * gvec_at(i)
            y = terms[i] * vg
            bu = y if bu is None else bu + y
            y2 = y * vg
            bu2 = y2 if bu2 is None else bu2 + y2
        th = th * (1.0 / t) - r * p
        inv_bu = 1.0 / bu
        path_term = (zu + bu2 * inv_bu) * inv_bu
        ggs = [gds[i] * terms[i]
               * (path_term - (2.0 * par_at(1, i) * gvec_at(i)) * inv_bu)
               for i in range(a)]
        return p, gds, gvs, ggs, ind, th

    if antithetic:
        pa, pb = one(1.0), one(-1.0)
        return (0.5 * (pa[0] + pb[0]),
                [0.5 * (x + y) for x, y in zip(pa[1], pb[1])],
                [0.5 * (x + y) for x, y in zip(pa[2], pb[2])],
                [0.5 * (x + y) for x, y in zip(pa[3], pb[3])],
                0.5 * (pa[4] + pb[4]), 0.5 * (pa[5] + pb[5]))
    return one(1.0)


def _am_greek_sums(zs_a, zs_b, lt_at, par_at, inv_s0_at, evec_at, gvec_at,
                   k, a, sqt, t, r, antithetic: bool):
    """Both path tiles of one iteration -> flat tuple of 6 + 6a sums."""
    tk = t * k
    sums = None
    for zs in (zs_a, zs_b):
        p, gds, gvs, ggs, ind, th = _am_greek_quants(
            zs, lt_at, par_at, evec_at, gvec_at, k, a, sqt, t, r,
            antithetic)
        ri = tk * ind
        row = [jnp.sum(p), jnp.sum(p * p), jnp.sum(ri), jnp.sum(ri * ri),
               jnp.sum(th), jnp.sum(th * th)]
        for i in range(a):
            inv = inv_s0_at(i)
            inv2 = inv * inv
            row += [inv * jnp.sum(gds[i]), inv * inv * jnp.sum(gds[i] ** 2),
                    jnp.sum(gvs[i]), jnp.sum(gvs[i] ** 2),
                    inv2 * jnp.sum(ggs[i]),
                    inv2 * inv2 * jnp.sum(ggs[i] ** 2)]
        sums = row if sums is None else [s + r2 for s, r2 in zip(sums, row)]
    return tuple(sums)


def tilt_direction(corr, a: int):
    """EAGER tilt for the diagonal-gamma Stein estimator.

    Returns ``(evec, gvec, ok)`` as NumPy f64 arrays: the raw z-space
    direction ``e`` and its per-asset effect ``g = L e`` (``d bt_i/du =
    g_i``).  The estimator needs ``dB/du = sum w_i S_i vol_i g_i``
    bounded away from 0, i.e. a SIGN-DEFINITE ``g``: for any full-rank
    correlation ``e = L^{-1} 1`` gives ``g == 1`` exactly.  Rank-
    deficient correlations (e.g. the reference's alternating ±0.5 matrix
    beyond 2 assets) may admit no such tilt — the least-squares ``g``
    mixes signs — in which case ``ok = False`` and the caller must
    disable the gamma output (a fixed-direction Stein estimate would
    have an a.s. pole at dB/du = 0).  Eager by design: the rank check is
    data-dependent and must not be traced.
    """
    import numpy as np
    import scipy.linalg as sla

    from mctpu import math as _m

    with jax.enable_x64(True):  # exact rank test even with x64 off
        ll = np.asarray(_m.cholesky_lower(jnp.asarray(corr, jnp.float64)),
                        np.float64)
    ones = np.ones((a,))
    if np.diag(ll).min() > 1e-6:
        e = sla.solve_triangular(ll, ones, lower=True)
        return e, ones, True
    e, *_ = np.linalg.lstsq(ll, ones, rcond=None)
    g = ll @ e
    if g.min() > 0.05:
        return e, g, True
    return np.zeros((a,)), ones, False


def xla_basket_am_partials(opt: BasketOption, chol, tilt, key, block_offset,
                           plan: Plan, n_blocks: int):
    """Per-block partials ``(n_blocks, 6 + 6*a)``: scalar
    ``(price, rho, theta)`` sum/sum² pairs then per-asset
    ``(sum_gd, sum_gd2, sum_gv, sum_gv2, sum_gg, sum_gg2)`` rows.
    ``tilt = (evec, gvec)`` from :func:`tilt_direction` (eager)."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    a = opt.n_assets
    lt, params = kbasket.asset_major_ops(o, chol, dtype)
    inv_s0 = 1.0 / (jnp.broadcast_to(jnp.asarray(o.s, dtype), (a,)))
    evec = jnp.asarray(tilt[0], dtype)
    gvec = jnp.asarray(tilt[1], dtype)
    sqt = jnp.sqrt(jnp.asarray(o.t, dtype))
    shape = (plan.rows, kbasket.LANES)
    n_sums = 6 + 6 * a

    def block_fn(bkey):
        def body(i, carry):
            zk = jax.random.fold_in(bkey, i)
            z = jax.random.normal(zk, (2, a) + shape, dtype)
            sums = _am_greek_sums(
                [z[0, j] for j in range(a)], [z[1, j] for j in range(a)],
                lambda ii, jj: lt[ii, jj], lambda rr, ii: params[rr, ii],
                lambda ii: inv_s0[ii], lambda ii: evec[ii],
                lambda ii: gvec[ii], o.k, a, sqt, o.t, o.r,
                plan.antithetic)
            return acc_add_n(carry, sums, plan.kahan)

        carry = jax.lax.fori_loop(0, plan.iters, body,
                                  acc_init_n(n_sums, dtype, plan.kahan))
        return jnp.stack(acc_final_n(carry, plan.kahan))

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


def _basket_greeks_am_kernel(seed_ref, off_ref, scal_ref, lt_ref, par_ref,
                             invs0_ref, evec_ref, gvec_ref, out_ref, *,
                             plan: Plan, a: int):
    seed_prng(seed_ref[0], off_ref[0] + pl.program_id(0))
    k, t, sqt, r = scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3]
    shape = (plan.rows, kbasket.LANES)
    n_sums = 6 + 6 * a

    def body(i, carry):
        za, zb = [], []
        for p in range(a):
            z1, z2 = draw_normal_pair(shape, i * a + p)
            za.append(z1)
            zb.append(z2)
        sums = _am_greek_sums(
            za, zb, lambda ii, jj: lt_ref[ii, jj],
            lambda rr, ii: par_ref[rr, ii], lambda ii: invs0_ref[ii],
            lambda ii: evec_ref[ii], lambda ii: gvec_ref[ii], k, a, sqt,
            t, r, plan.antithetic)
        return acc_add_n(carry, sums, plan.kahan)

    carry = jax.lax.fori_loop(0, plan.iters, body,
                              acc_init_n(n_sums, jnp.float32, plan.kahan))
    vals = acc_final_n(carry, plan.kahan)
    for j in range(n_sums):
        out_ref[0, 0, j] = vals[j]


def pallas_basket_am_partials(opt: BasketOption, chol, tilt, seed,
                              block_offset, plan: Plan, n_blocks: int,
                              interpret: bool = False):
    """Asset-major basket Greek partials ``(n_blocks, 6 + 6*a)`` on TPU."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        o = opt.astype(jnp.float32)
        a = opt.n_assets
        lt, params = kbasket.asset_major_ops(o, chol, jnp.float32)
        inv_s0 = 1.0 / jnp.broadcast_to(jnp.asarray(o.s, jnp.float32), (a,))
        evec = jnp.asarray(tilt[0], jnp.float32)
        gvec = jnp.asarray(tilt[1], jnp.float32)
        t = jnp.asarray(o.t, jnp.float32)
        scal = jnp.stack([o.k, t, jnp.sqrt(t), o.r])
        seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
        off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))
        kernel = functools.partial(_basket_greeks_am_kernel, plan=plan, a=a)
        paths_iter = 2 * plan.rows * kbasket.LANES
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 8,
            out_specs=block_out_spec(6 + 6 * a),
            out_shape=block_out_shape(n_blocks, 6 + 6 * a),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=GRID_SEMANTICS,
            ),
            cost_estimate=pl.CostEstimate(
                flops=plan.iters * paths_iter * (a * (a + 1) + 24 * a + 12),
                bytes_accessed=n_blocks * 4 * (6 + 6 * a),
                transcendentals=plan.iters * paths_iter * (3 * a // 2 + a),
            ),
            interpret=interpret_arg(interpret),
        )(seed_arr, off_arr, scal, lt, params, inv_s0, evec, gvec).reshape(n_blocks, 6 + 6 * a)


def _basket_greek_ops(opt: BasketOption, chol, tilt, dtype):
    """Packed operands of the basket Greeks kernel.

    Extends :func:`mctpu.kernels.basket.pack_assets` with ``esel`` — a
    binary ``(c, width)`` expander mapping per-path indicators back to the
    asset slots of their path — and ``inv_s0`` (0 in padded slots so the
    delta division never sees the padding's ``s0 = 0``).
    """
    ops = kbasket.pack_assets(opt, chol, dtype)
    width, c = ops["wsel"].shape
    a = opt.n_assets
    a_tile = width // c
    esel = jnp.zeros((c, width), dtype)
    for p in range(c):
        esel = jax.lax.dynamic_update_slice(
            esel, jnp.ones((1, a_tile), dtype), (p, p * a_tile))
    s0 = ops["s0"]
    ops["esel"] = esel
    ops["eselT"] = esel.T  # (width, c): slot -> path fold for theta
    ops["inv_s0"] = jnp.where(s0 > 0, 1.0 / jnp.where(s0 > 0, s0, 1.0), 0.0)
    # w_row: per-slot weights (the wsel columns collapsed onto the slots).
    ops["w_row"] = jnp.sum(ops["wsel"], axis=1).reshape(1, -1)
    # Diagonal-gamma (Stein) operands: the tilt e (from tilt_direction,
    # eager) tiled onto the slots (zsel folds <z, e> per path), the
    # per-slot effect vg = vol * g, and the w*vg / w*vg^2 rows whose
    # folds give Bu = dB/du and Bu2 (padded slots contribute exactly 0
    # through vol = 0).
    evec = jnp.asarray(tilt[0], dtype)
    gvec = jnp.asarray(tilt[1], dtype)
    e_tile = jnp.zeros((a_tile,), dtype).at[:a].set(evec)
    e_row = jnp.tile(e_tile, c).reshape(width, 1)
    ops["zsel"] = ops["eselT"] * e_row  # (width, c)
    g_tile = jnp.zeros((a_tile,), dtype).at[:a].set(gvec)
    g_row = jnp.tile(g_tile, c).reshape(1, width)
    ops["vg_row"] = ops["vol"] * g_row
    ops["wv_row"] = ops["w_row"] * ops["vg_row"]
    ops["wv2_row"] = ops["wv_row"] * ops["vg_row"]
    return ops


def _basket_greek_tile(ops, k, v_row, t, sqt, r, z, antithetic: bool,
                       mxu: bool):
    """One packed tile -> (payoff (rows, c), delta (rows, width),
    vega (rows, width), gamma (rows, width), indicator (rows, c),
    theta (rows, c)); pair-means when antithetic.

    The scalar tails are exact pathwise derivatives of the discounted
    payoff with the discount factored out (the estimator applies it):
    ``dS_i/dr = t S_i`` collapses the rho integrand to ``t K 1{B>K}``
    (accumulated by the caller), and ``dS_i/dT = S_i ((r - v_i^2/2)
    + v_i bt_i / (2 sqrt(T)))`` gives ``theta = sum_i I w_i dS_i/dT
    - r * payoff`` (``bt`` is T-independent: correlated standard
    normals plus the constant Brownian shift ``d``).

    ``gg`` is the per-asset diagonal gamma (mixed pathwise-LR via
    Stein's identity along the tilt ``e = L^{-1} 1``; derivation in
    ``_am_greek_quants``): per slot
    ``I (w S)^2 (zu - 2 vol + Bu2/Bu) / (Bu s0^2)`` with the path
    scalars ``zu = <z, e>``, ``Bu = sum w S vol``, ``Bu2 = sum w S
    vol^2`` folded per packed path and expanded back onto the slots.
    """
    prec = kbasket.MATMUL_PRECISION
    c = ops["wsel"].shape[1]
    a_tile = ops["chol_bd"].shape[0] // c
    inv_t = 1.0 / t

    def fold(x):
        # (rows, width) slot values -> (rows, c) per-path sums.
        if mxu:
            return jnp.dot(x, ops["eselT"], precision=prec,
                           preferred_element_type=jnp.float32)
        return x.reshape(x.shape[0], c, a_tile).sum(axis=-1)

    def expand(x):
        # (rows, c) per-path scalars -> (rows, width) slot broadcast.
        if mxu:
            return jnp.dot(x, ops["esel"], precision=prec,
                           preferred_element_type=jnp.float32)
        return jnp.repeat(x, a_tile, axis=1)

    def quants(zz):
        bt = jnp.dot(zz, ops["chol_bd"], precision=prec,
                     preferred_element_type=jnp.float32) + ops["d"]
        s_t = ops["s0"] * jnp.exp(ops["drift"] + ops["vol"] * bt)
        if mxu:
            basket = jnp.dot(s_t, ops["wsel"], precision=prec,
                             preferred_element_type=jnp.float32)
        else:
            prod = s_t * ops["w_row"]
            basket = prod.reshape(prod.shape[0], c, a_tile).sum(axis=-1)
        ind = jnp.where(basket > k, 1.0, 0.0).astype(s_t.dtype)  # (rows, c)
        p = jnp.maximum(basket - k, 0.0)
        ind_wide = expand(ind)
        ws = ind_wide * ops["w_row"] * s_t  # I w_i S_i per slot
        gd = ws * ops["inv_s0"]
        gv = ws * (sqt * bt - v_row * t)
        # theta slots: I w_i S_i (drift_i + vol_i bt_i / 2) / t
        ths = ws * ((ops["drift"] + 0.5 * ops["vol"] * bt) * inv_t)
        th = fold(ths) - r * p
        # Diagonal gamma per slot (Stein tilt; see docstring).
        zu = jnp.dot(zz, ops["zsel"], precision=prec,
                     preferred_element_type=jnp.float32)  # (rows, c)
        bu = fold(s_t * ops["wv_row"])
        bu2 = fold(s_t * ops["wv2_row"])
        inv_bu = 1.0 / bu
        path_term = expand((zu + bu2 * inv_bu) * inv_bu)
        inv_bu_wide = expand(inv_bu)
        wss = ws * (ops["w_row"] * s_t)  # I (w S)^2 (ind^2 == ind)
        gg = (wss * (ops["inv_s0"] * ops["inv_s0"])
              * (path_term - (2.0 * ops["vg_row"]) * inv_bu_wide))
        return p, gd, gv, gg, ind, th

    if antithetic:
        a = quants(z)
        b = quants(-z)
        return tuple(0.5 * (x + y) for x, y in zip(a, b))
    return quants(z)


def xla_basket_partials(opt: BasketOption, chol, tilt, key: jax.Array,
                        block_offset, plan: Plan, n_blocks: int):
    """Per-block basket Greek partials:
    ``((n_blocks, 6), (n_blocks, 6, width))`` — scalar
    ``(payoff, rho, theta)`` sum/sum² pairs plus per-asset-slot
    ``(sum_gd, sum_gd2, sum_gv, sum_gv2, sum_gg, sum_gg2)`` rows."""
    dtype = plan.jdtype
    o = opt.astype(dtype)
    ops = _basket_greek_ops(o, chol, tilt, dtype)
    width = ops["chol_bd"].shape[0]
    sqt = jnp.sqrt(jnp.asarray(o.t, dtype))
    v_row = ops["vol"] / sqt  # per-slot vols (vol = v * sqrt(t))
    tk = jnp.asarray(o.t, dtype) * jnp.asarray(o.k, dtype)

    def block_fn(bkey):
        def body(i, carry):
            acc, vecs = carry
            zk = jax.random.fold_in(bkey, i)
            z = jax.random.normal(zk, (2 * plan.rows, width), dtype)
            p, gd, gv, gg, ind, th = _basket_greek_tile(
                ops, o.k, v_row, o.t, sqt, o.r, z, plan.antithetic,
                mxu=False)
            ri = tk * ind
            acc = acc_add_n(acc, (jnp.sum(p), jnp.sum(p * p),
                                  jnp.sum(ri), jnp.sum(ri * ri),
                                  jnp.sum(th), jnp.sum(th * th)),
                            plan.kahan)
            vecs = vecs + jnp.stack([
                det_col_sums(gd), det_col_sums(gd * gd),
                det_col_sums(gv), det_col_sums(gv * gv),
                det_col_sums(gg), det_col_sums(gg * gg)])
            return acc, vecs

        acc, vecs = jax.lax.fori_loop(
            0, plan.iters, body,
            (acc_init_n(6, dtype, plan.kahan), jnp.zeros((6, width), dtype)))
        return jnp.stack(acc_final_n(acc, plan.kahan)), vecs

    keys = mcrng.block_keys(key, block_offset, n_blocks)
    return jax.vmap(block_fn)(keys)


def _basket_greeks_kernel(seed_ref, off_ref, scal_ref, s0_ref, drift_ref,
                          vol_ref, d_ref, lt_ref, wsel_ref, esel_ref,
                          eselt_ref, invs0_ref, wrow_ref, zsel_ref,
                          vg_ref, wv_ref, wv2_ref, out_ref, vec_ref,
                          *, plan: Plan):
    seed_prng(seed_ref[0], off_ref[0] + pl.program_id(0))
    k, t, sqt, r = scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3]
    ops = {
        "s0": s0_ref[:], "drift": drift_ref[:], "vol": vol_ref[:],
        "d": d_ref[:], "chol_bd": lt_ref[:], "wsel": wsel_ref[:],
        "esel": esel_ref[:], "eselT": eselt_ref[:],
        "inv_s0": invs0_ref[:], "w_row": wrow_ref[:],
        "zsel": zsel_ref[:], "vg_row": vg_ref[:], "wv_row": wv_ref[:],
        "wv2_row": wv2_ref[:],
    }
    width = lt_ref.shape[0]
    v_row = ops["vol"] / sqt
    tk = t * k

    def body(i, carry):
        acc, vecs = carry
        z1, z2 = draw_normal_pair((plan.rows, width), i)
        p1, gd1, gv1, gg1, i1, th1 = _basket_greek_tile(
            ops, k, v_row, t, sqt, r, z1, plan.antithetic, mxu=True)
        p2, gd2, gv2, gg2, i2, th2 = _basket_greek_tile(
            ops, k, v_row, t, sqt, r, z2, plan.antithetic, mxu=True)
        r1, r2 = tk * i1, tk * i2
        pair = lambda x1, x2: jnp.sum(x1) + jnp.sum(x2)
        acc = acc_add_n(acc, (pair(p1, p2), pair(p1 * p1, p2 * p2),
                              pair(r1, r2), pair(r1 * r1, r2 * r2),
                              pair(th1, th2), pair(th1 * th1, th2 * th2)),
                        plan.kahan)
        row = lambda x1, x2: det_col_sums(x1) + det_col_sums(x2)
        vecs = vecs + jnp.stack([
            row(gd1, gd2), row(gd1 * gd1, gd2 * gd2),
            row(gv1, gv2), row(gv1 * gv1, gv2 * gv2),
            row(gg1, gg2), row(gg1 * gg1, gg2 * gg2)])
        return acc, vecs

    acc, vecs = jax.lax.fori_loop(
        0, plan.iters, body,
        (acc_init_n(6, jnp.float32, plan.kahan),
         jnp.zeros((6, width), jnp.float32)))
    vals = acc_final_n(acc, plan.kahan)
    for j in range(6):
        out_ref[0, 0, j] = vals[j]
    vec_ref[0] = vecs


def pallas_basket_partials(opt: BasketOption, chol, tilt, seed,
                           block_offset, plan: Plan, n_blocks: int,
                           interpret: bool = False):
    """Per-block basket Greek partials on TPU (see ``xla_basket_partials``)."""
    ctx = prng_emulation() if interpret else contextlib.nullcontext()
    with jax.enable_x64(False), ctx:
        return _pallas_basket_partials(opt, chol, tilt, seed, block_offset,
                                       plan, n_blocks, interpret)


def _pallas_basket_partials(opt, chol, tilt, seed, block_offset, plan,
                            n_blocks, interpret):
    o = opt.astype(jnp.float32)
    ops = _basket_greek_ops(o, chol, tilt, jnp.float32)
    width = ops["chol_bd"].shape[0]
    c = ops["wsel"].shape[1]
    t = jnp.asarray(o.t, jnp.float32)
    scal = jnp.stack([o.k, t, jnp.sqrt(t), o.r])
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    off_arr = jnp.atleast_1d(jnp.asarray(block_offset, jnp.int32))

    kernel = functools.partial(_basket_greeks_kernel, plan=plan)
    out, vecs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 14,
        out_specs=(
            block_out_spec(6),
            pl.BlockSpec((1, 6, width), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            block_out_shape(n_blocks, 6),
            jax.ShapeDtypeStruct((n_blocks, 6, width), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=GRID_SEMANTICS,
        ),
        cost_estimate=pl.CostEstimate(
            flops=plan.iters * 2 * plan.rows * (2 * width * width
                                                + 9 * width * c + 30 * width),
            bytes_accessed=n_blocks * (6 + 6 * width) * 4
            + 2 * width * width * 4,
            transcendentals=plan.iters * 2 * plan.rows * (2 * width + 2),
        ),
        interpret=interpret_arg(interpret),
    )(seed_arr, off_arr, scal, ops["s0"], ops["drift"], ops["vol"],
      ops["d"], ops["chol_bd"], ops["wsel"], ops["esel"], ops["eselT"],
      ops["inv_s0"], ops["w_row"], ops["zsel"], ops["vg_row"],
      ops["wv_row"], ops["wv2_row"])
    return out.reshape(n_blocks, 6), vecs
