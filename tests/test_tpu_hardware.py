"""On-chip accuracy gates for the fused Pallas kernels (real TPU only).

Run with ``MCTPU_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_hardware.py``
on a machine with a TPU attached.  These cover the one thing the
interpret-mode suite (tests/test_pallas_kernels.py) cannot: the hardware
PRNG (``pltpu.prng_seed``/``prng_random_bits``) and the Mosaic compilation
of each kernel.  Geometries are kept small so the whole module compiles and
runs in a couple of minutes on one chip.
"""
import jax
import numpy as np
import pytest

from mctpu import engine, math as mcmath
from mctpu.models import asian as masian, cva as mcva, heston as mheston
from mctpu.types import (AsianOption, BarrierOption, BasketOption, CvaSpec,
                         HestonOption, VanillaOption)

pytestmark = pytest.mark.tpu

KEY = jax.random.key(101)
OPT = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0)


def _cfg(**kw):
    kw.setdefault("num_blocks", 16)
    kw.setdefault("rows", 32)
    return engine.EngineConfig(backend="pallas", **kw)


def _z(price, want, se):
    return abs(float(price) - want) / float(se)


def test_vanilla_on_chip():
    bs = float(mcmath.bs_call(100.0, 100.0, 0.048790, 0.2, 1.0))
    res = engine.price_vanilla(OPT, 1 << 22, KEY, _cfg())
    assert _z(res.price, bs, res.std_error) < 4


def test_vanilla_hardware_prng_moments():
    # With 4M paths the payoff mean AND second moment must both be right;
    # a biased bit stream shifts sum_p2 detectably.
    res = engine.price_vanilla(OPT, 1 << 22, KEY, _cfg())
    n = res.n
    m2 = float(res.sum_p2) / n
    m1 = float(res.sum_p) / n
    # Closed-form E[payoff^2] for a GBM call (f64 quadrature-free form).
    s, k, r, v, t = 100.0, 100.0, 0.048790, 0.2, 1.0
    sq = v * np.sqrt(t)
    d1 = (np.log(s / k) + (r + 0.5 * v * v) * t) / sq
    d2 = d1 - sq
    from math import erf

    def cdf(x):
        return 0.5 * (1.0 + erf(x / np.sqrt(2.0)))

    e_s2 = s * s * np.exp((2 * r + v * v) * t) * cdf(d1 + sq)
    e_sk = s * np.exp(r * t) * cdf(d1)
    e_k2 = cdf(d2)
    want_m2 = e_s2 - 2 * k * e_sk + k * k * e_k2
    assert abs(m2 - want_m2) / want_m2 < 0.01
    assert abs(m1 - np.exp(r * t) * float(mcmath.bs_call(s, k, r, v, t))) < 0.05


def test_basket_on_chip():
    opt = BasketOption.default_reference(3)
    res = engine.price_basket(opt, 1 << 20, KEY, _cfg())
    from mctpu import reference
    ora = reference.price_basket(opt, 1 << 18, seed=5)
    se = np.hypot(float(res.std_error), ora.std_error)
    assert _z(res.price, ora.price, se) < 4


def test_cva_on_chip():
    spec = CvaSpec(intensity=0.03, lgd=0.6,
                   option=VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0),
                   n_grid=25)
    res = engine.price_cva(spec, 1 << 18, KEY, _cfg(num_blocks=16, rows=8))
    want = float(mcva.closed_form(spec))
    assert _z(res.cva, want, res.std_error) < 4


def test_asian_on_chip():
    geo = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=12,
                      average="geometric")
    res = engine.price_asian(geo, 1 << 20, KEY, _cfg(num_blocks=16, rows=8))
    want = float(masian.closed_form_geometric(geo))
    assert _z(res.price, want, res.std_error) < 4


def test_barrier_on_chip():
    uo = BarrierOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0,
                       barrier=130.0, n_obs=50, kind="up-and-out")
    res = engine.price_barrier(uo, 1 << 20, KEY, _cfg(num_blocks=16, rows=8))
    b_eff = float(mcmath.barrier_continuity_correction(
        uo.barrier, uo.s, uo.v, uo.t, uo.n_obs, up=True))
    want = float(mcmath.up_and_out_call(uo.s, uo.k, uo.r, uo.v, uo.t, b_eff))
    assert abs(float(res.price) - want) < 4 * float(res.std_error) + 0.03


def test_heston_on_chip():
    hopt = HestonOption(s=100.0, k=100.0, r=0.03, t=1.0, v0=0.04,
                        kappa=1.5, theta=0.04, xi=0.5, rho=-0.7)
    res = engine.price_heston(hopt, 1 << 20, KEY,
                              _cfg(num_blocks=16, rows=8), n_steps=100)
    want = float(mheston.cf_call_price(hopt))
    assert abs(float(res.price) - want) < 4 * float(res.std_error) + 0.05


def test_lsm_american_put_on_chip():
    import jax.numpy as jnp

    from mctpu import lsm, reference
    from mctpu.types import AmericanOption
    opt = AmericanOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0,
                         n_steps=100, payoff="put")
    res = lsm.price_american(opt, 1 << 20, KEY, dtype=jnp.float32)
    # Matching-dates Bermudan lattice is the honest target; LSM is a lower
    # bound (frozen out-of-sample rule), so allow the small rule bias.
    crr100 = reference.binomial_american(100.0, 100.0, 0.05, 0.2, 1.0,
                                         n_steps=100, payoff="put")
    assert abs(float(res.price) - crr100) < 4 * float(res.std_error) + 0.02


def test_basket_asian_on_chip():
    from mctpu import reference
    from mctpu.types import BasketAsianOption
    opt = BasketAsianOption(BasketOption.default_reference(3), n_obs=12)
    res = engine.price_basket_asian(opt, 1 << 18, KEY,
                                    _cfg(num_blocks=16, rows=8))
    ora = reference.price_basket_asian(opt, 1 << 16, seed=7)
    se = np.hypot(float(res.std_error), ora.std_error)
    assert _z(res.price, ora.price, se) < 4


def test_basket_barrier_on_chip():
    from mctpu import reference
    from mctpu.types import BasketBarrierOption
    opt = BasketBarrierOption(BasketOption.default_reference(3),
                              barrier=120.0, n_obs=12)
    res = engine.price_basket_barrier(opt, 1 << 18, KEY,
                                      _cfg(num_blocks=16, rows=8))
    ora = reference.price_basket_barrier(opt, 1 << 16, seed=8)
    se = np.hypot(float(res.std_error), ora.std_error)
    assert _z(res.price, ora.price, se) < 4


def test_cva_wwr_on_chip():
    from mctpu import reference
    from mctpu.types import CvaPortfolioSpec
    spec = CvaSpec(intensity=0.03, lgd=0.6,
                   option=VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0),
                   n_grid=25)
    port = CvaPortfolioSpec.from_single(spec, wwr_b=0.8)
    res = engine.price_cva_portfolio(port, 1 << 18, KEY,
                                     _cfg(num_blocks=16, rows=8))
    ora = reference.price_cva_portfolio(
        0.03, 0.6, 100.0, 0.05, 0.2, 1.0, [100.0], [1.0],
        n_grid=25, n_paths=1 << 16, seed=17, wwr_b=0.8)
    se = np.hypot(float(res.std_error), ora.std_error)
    assert abs(float(res.cva) - ora.price) < 4 * se


def test_heston_qe_on_chip():
    hopt = HestonOption(s=100.0, k=100.0, r=0.03, t=1.0, v0=0.04,
                        kappa=1.5, theta=0.04, xi=0.5, rho=-0.7)
    # QE at a coarse 16-step grid must hit the CF price with NO bias
    # allowance — the whole point of the scheme.
    res = engine.price_heston(hopt, 1 << 20, KEY,
                              _cfg(num_blocks=16, rows=8), n_steps=16,
                              scheme="qe")
    want = float(mheston.cf_call_price(hopt))
    assert _z(res.price, want, res.std_error) < 4


def test_cva_multi_on_chip():
    from mctpu import math as mm
    from mctpu.types import CvaMultiSpec
    corr = np.array([[1.0, 0.5], [0.5, 1.0]])
    spec = CvaMultiSpec(intensity=0.03, lgd=0.6, s=[100.0, 95.0],
                        v=[0.2, 0.3], corr=corr, r=0.05, t=1.0,
                        strikes=[100.0, 90.0], weights=[0.5, 0.5], n_grid=25)
    res = engine.price_cva_multi(spec, 1 << 18, KEY,
                                 _cfg(num_blocks=16, rows=8))
    want = float(mm.cva_multi_closed_form(
        0.03, 0.6, spec.s, spec.v, spec.strikes, spec.weights, 0.05, 1.0,
        25))
    assert _z(res.cva, want, res.std_error) < 4


def test_lookback_on_chip():
    from mctpu import reference
    from mctpu.types import LookbackOption
    opt = LookbackOption(s=100.0, r=0.05, v=0.2, t=1.0, n_obs=50)
    res = engine.price_lookback(opt, 1 << 20, KEY, _cfg(num_blocks=16,
                                                        rows=8))
    ora = reference.price_lookback(opt, 1 << 16, seed=9)
    se = np.hypot(float(res.std_error), ora.std_error)
    assert _z(res.price, ora.price, se) < 4
    cf = float(mcmath.lookback_floating_call(100.0, 0.05, 0.2, 1.0))
    assert float(res.price) < cf  # discrete monitoring is below continuous


def test_book_on_chip():
    from mctpu.types import VanillaBook, VanillaOption
    book = VanillaBook.from_options([
        VanillaOption(100.0, 100.0, 0.048790, 0.2, 1.0),
        VanillaOption(100.0, 120.0, 0.05, 0.3, 0.5),
        VanillaOption(95.0, 90.0, 0.03, 0.15, 2.0, kind="put"),
        VanillaOption(120.0, 100.0, 0.01, 0.25, 0.25, kind="put"),
    ])
    res = engine.price_book(book, 1 << 21, KEY, _cfg(num_blocks=16,
                                                     rows=32))
    bs = []
    for i in range(book.n_instruments):
        o = book.option(i)
        fn = mcmath.bs_call if o.kind == "call" else mcmath.bs_put
        bs.append(float(fn(o.s, o.k, o.r, o.v, o.t)))
    z = np.abs(np.asarray(res.price) - np.asarray(bs)) / np.asarray(
        res.std_error)
    assert (z < 4).all()
    # A one-instrument book ties to the vanilla kernel bitwise on chip.
    one = VanillaBook.from_options([
        VanillaOption(100.0, 100.0, 0.048790, 0.2, 1.0)])
    rb = engine.price_book(one, 1 << 18, KEY, _cfg(num_blocks=16, rows=32))
    rv = engine.price_vanilla(
        VanillaOption(100.0, 100.0, 0.048790, 0.2, 1.0), 1 << 18, KEY,
        _cfg(num_blocks=16, rows=32))
    assert float(rb.price[0]) == float(rv.price)


def test_greeks_book_on_chip():
    from mctpu.types import VanillaBook, VanillaOption
    book = VanillaBook.from_options([
        VanillaOption(100.0, 100.0, 0.048790, 0.2, 1.0),
        VanillaOption(95.0, 90.0, 0.03, 0.15, 2.0, kind="put"),
    ])
    g = engine.greeks_book(book, 1 << 21, KEY, _cfg(num_blocks=16,
                                                    rows=32))
    for i in range(2):
        o = book.option(i)
        ex = mcmath.bs_greeks(o.s, o.k, o.r, o.v, o.t)
        if o.kind == "put":  # put-call parity on the closed form
            import math as _m
            disc = _m.exp(-float(o.r) * float(o.t))
            ex = dict(ex)
            ex["price"] = float(mcmath.bs_put(o.s, o.k, o.r, o.v, o.t))
            ex["delta"] = float(ex["delta"]) - 1.0
            ex["rho"] = float(ex["rho"]) - float(o.k) * float(o.t) * disc
            ex["theta"] = float(ex["theta"]) - float(o.r) * float(o.k) * disc
        for name in ("price", "delta", "vega", "rho", "theta", "gamma"):
            mc = getattr(g, name)
            z = abs(float(np.asarray(mc.price)[i]) - float(ex[name])) \
                / float(np.asarray(mc.std_error)[i])
            assert z < 4, (i, name, z)


def test_strike_ladder_on_chip():
    ks = np.array([70.0, 85.0, 100.0, 115.0, 130.0])
    res = engine.price_vanilla_ladder(OPT, ks, 1 << 21, KEY,
                                      _cfg(num_blocks=16, rows=32))
    bs = np.array([float(mcmath.bs_call(100.0, k, 0.048790, 0.2, 1.0))
                   for k in ks])
    z = np.abs(np.asarray(res.price) - bs) / np.asarray(res.std_error)
    assert (z < 4).all()
    p = np.asarray(res.price)
    assert (p[:-2] - 2 * p[1:-1] + p[2:] >= -1e-6).all()


def test_rainbow_on_chip():
    from mctpu import math as mm
    from mctpu.types import RainbowOption
    corr = np.array([[1.0, 0.3], [0.3, 1.0]])
    opt = RainbowOption(s=np.array([100.0, 95.0]), v=np.array([0.2, 0.3]),
                        corr=corr, k=100.0, r=0.05, t=1.0, kind="max")
    res = engine.price_rainbow(opt, 1 << 20, KEY, _cfg(num_blocks=16,
                                                       rows=32))
    cf = float(mm.rainbow_max_call(100.0, 95.0, 100.0, 0.05, 0.2, 0.3,
                                   0.3, 1.0))
    assert _z(res.price, cf, res.std_error) < 4


def test_variance_swap_on_chip():
    res = engine.fair_variance_strike(OPT, 1 << 20, KEY,
                                      _cfg(num_blocks=16, rows=8), n_obs=252)
    want = 0.2 ** 2 + (0.048790 - 0.02) ** 2 / 252
    assert _z(res.price, want, res.std_error) < 4


def test_greeks_vanilla_on_chip():
    """Fused in-kernel pathwise Greeks vs bs_greeks (hardware PRNG)."""
    cf = mcmath.bs_greeks(100.0, 100.0, 0.048790, 0.2, 1.0)
    res = engine.greeks_vanilla(OPT, 1 << 22, KEY, _cfg())
    for name in ("price", "delta", "vega", "rho", "theta", "gamma",
                 "vanna", "volga"):
        r = getattr(res, name)
        assert _z(r.price, float(cf[name]), r.std_error) < 4, name


def test_greeks_basket_on_chip():
    """Per-asset basket delta/vega vs the packed-MXU kernel accumulators."""
    opt = BasketOption.default_reference(3)
    res = engine.greeks_basket(opt, 1 << 20, KEY, _cfg())
    d = np.asarray(res.delta.price)
    # Strongly anti-correlated equal-weight reference basket: delta_i ~ 1/3.
    np.testing.assert_allclose(d, 1 / 3, atol=0.01)
    assert np.isfinite(np.asarray(res.vega.price)).all()
    assert (np.asarray(res.delta.std_error) > 0).all()
    # rho = t K df P(B>K): the anti-correlated basket forward is above K
    # almost surely, so rho ~ t K df and theta ~ r K df (tiny diffusion
    # term).  Both sit in narrow bands around their degenerate limits.
    df = np.exp(-float(opt.r) * float(opt.t))
    assert 0.9 * float(opt.k) * df < float(res.rho.price) <= float(opt.k) * df
    assert np.isfinite(float(res.theta.price))
    assert float(res.theta.std_error) > 0
    # The rank-deficient reference corr has no sign-definite Stein tilt:
    # diagonal gamma correctly degrades to None; a full-rank basket
    # carries the finite per-asset gamma vector on the hardware PRNG.
    assert res.gamma is None
    fr = BasketOption.equicorrelated(4, rho=0.3)
    rfr = engine.greeks_basket(fr, 1 << 18, KEY, _cfg())
    g = np.asarray(rfr.gamma.price)
    assert np.isfinite(g).all() and (g > 0).all()


def test_greeks_asian_on_chip():
    """Log-space-walk Asian Greeks vs jax.grad of the exact geometric law."""
    from mctpu.types import AsianOption
    geo = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=12,
                      average="geometric")
    res = engine.greeks_asian(geo, 1 << 20, KEY, _cfg())

    def cf(s, v):
        return mcmath.geometric_asian_call(s, 100.0, 0.05, v, 1.0, 12)

    d_cf = jax.grad(cf, argnums=(0, 1))(100.0, 0.2)
    assert _z(res.delta.price, float(d_cf[0]), res.delta.std_error) < 4
    assert _z(res.vega.price, float(d_cf[1]), res.vega.std_error) < 4
    hess = float(jax.grad(jax.grad(lambda s: cf(s, 0.2)))(100.0))
    assert _z(res.gamma.price, hess, res.gamma.std_error) < 4


def test_greeks_lookback_on_chip():
    """Homogeneity-exact delta + arg-extreme vega on the hardware PRNG."""
    from mctpu.types import LookbackOption
    opt = LookbackOption(s=100.0, r=0.05, v=0.25, t=1.0, n_obs=32,
                         kind="floating", payoff="call")
    res = engine.greeks_lookback(opt, 1 << 20, KEY, _cfg())
    # Exact pathwise identity for the floating payoff: delta == price/s0.
    assert float(res.delta.price) == pytest.approx(
        float(res.price.price) / 100.0, rel=1e-5)
    assert float(res.vega.price) > 0
    assert float(res.vega.std_error) > 0
    # rho = E[ext (T - t_ext)] > 0 for the floating call, bounded by T*E[ext]
    # (ext >= s0 for the running max).
    assert 0 < float(res.rho.price) < float(opt.t) * 200.0
    assert float(res.rho.std_error) > 0


def test_lsm_engine_tier_on_chip():
    """Fused LSM forward-pass kernel vs the binomial lattice (hardware)."""
    import jax.numpy as jnp

    from mctpu import lsm, reference
    from mctpu.types import AmericanOption
    put = AmericanOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0, n_steps=50,
                         payoff="put")
    # dtype=f32: the pilot fit's linalg.solve has no f64 path on TPU.
    res = lsm.price_american(put, 1 << 20, KEY, config=_cfg(),
                             dtype=jnp.float32)
    bino = float(reference.binomial_american(100.0, 100.0, 0.05, 0.2, 1.0,
                                             1000, "put"))
    # Frozen-rule LSM is a lower bound within rule quality of the lattice.
    assert float(res.price) < bino + 3 * float(res.std_error)
    assert float(res.price) > bino - 0.06


def test_greeks_cva_on_chip():
    # Round-4: the fused 8-accumulator CVA Greeks kernel on hardware.
    # The FD reference MUST be computed in f64 (numpy semantics): with
    # x64 off, differencing the f32 closed form at h=1e-2 injects a fake
    # +1.2e-5 "bias" into the reference itself (round-4 diagnostic).
    spec = CvaSpec(intensity=0.03, lgd=0.6,
                   option=VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0),
                   n_grid=25)
    res = engine.greeks_cva(spec, 1 << 19, KEY, _cfg())

    def cf(lam=0.03, s=100.0, v=0.2):
        return float(mcmath.cva_closed_form(lam, 0.6, s, 100.0, 0.05, v,
                                            1.0, 25, dtype=np.float64))

    h = 1e-4
    hs, hl = 1e-2, 1e-3
    gates = {
        "cva": cf(),
        "credit_delta": (cf(lam=0.03 + h) - cf(lam=0.03 - h)) / (2 * h),
        "delta": (cf(s=100 + 1e-2) - cf(s=100 - 1e-2)) / 2e-2,
        "vega": (cf(v=0.2 + h) - cf(v=0.2 - h)) / (2 * h),
        # Second-order outputs (mixed-LR terminal node + smooth BS inner
        # nodes; deterministic d2dp/dlam2 table; ddp_l x dee_ds0 cross).
        "gamma": (cf(s=100 + hs) - 2 * cf() + cf(s=100 - hs)) / (hs * hs),
        "credit_gamma": (cf(lam=0.03 + hl) - 2 * cf()
                         + cf(lam=0.03 - hl)) / (hl * hl),
        "cross_gamma": (cf(lam=0.03 + hl, s=100 + hs)
                        - cf(lam=0.03 + hl, s=100 - hs)
                        - cf(lam=0.03 - hl, s=100 + hs)
                        + cf(lam=0.03 - hl, s=100 - hs)) / (4 * hs * hl),
    }
    for name, want in gates.items():
        r = getattr(res, name)
        assert _z(r.price, want, r.std_error) < 4, (
            name, float(r.price), want)


def test_control_variate_on_chip():
    # Round-4: the centered-moment CV kernel + two-stage pilot on
    # hardware; the basket control's residual sigma ~ 1e-5 of the payoff
    # scale is exactly the regime the f32 combine must survive.
    from mctpu import variance
    bs = float(mcmath.bs_call(100.0, 100.0, 0.048790, 0.2, 1.0))
    cv = variance.price_vanilla_cv(OPT, 1 << 20, KEY, _cfg())
    assert _z(cv.price, bs, cv.std_error) < 4
    mc = engine.price_vanilla(OPT, 1 << 20, KEY, _cfg())
    assert float(cv.std_error) < float(mc.std_error)
    bk = BasketOption.equicorrelated(5, rho=0.3)
    bcv = variance.price_basket_cv(bk, 1 << 18, KEY, _cfg())
    bmc = engine.price_basket(bk, 1 << 18, jax.random.key(9), _cfg())
    assert 0.0 < float(bcv.std_error) < float(bmc.std_error)
    se = float(np.hypot(float(bcv.std_error), float(bmc.std_error)))
    assert abs(float(bcv.price) - float(bmc.price)) < 5 * se


def test_importance_sampling_on_chip():
    from mctpu import variance
    otm = VanillaOption(100.0, 200.0, 0.05, 0.2, 1.0)
    bs = float(mcmath.bs_call(100.0, 200.0, 0.05, 0.2, 1.0))
    res = variance.price_vanilla_is(otm, 1 << 20, KEY, _cfg())
    assert _z(res.price, bs, res.std_error) < 4
    mc = engine.price_vanilla(otm, 1 << 20, KEY, _cfg())
    assert float(res.std_error) < float(mc.std_error) / 10


def test_asian_rqmc_bridge_on_chip():
    # Round-4: the fused Sobol + Brownian-bridge kernel on hardware.
    from mctpu import qmc_engine
    geo = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=16,
                      average="geometric")
    res = qmc_engine.price_asian_rqmc(geo, 1 << 16, KEY, _cfg(),
                                      replicates=16)
    want = float(mcmath.geometric_asian_call(100.0, 100.0, 0.05, 0.2, 1.0,
                                             16))
    assert _z(res.price, want, res.std_error) < 5


def test_mlmc_level_kernel_on_chip():
    # Round-4: the coupled fine/coarse MLMC level kernel on hardware.
    from mctpu import mlmc
    hopt = HestonOption(s=100.0, k=100.0, r=0.03, t=1.0, v0=0.04,
                        kappa=1.5, theta=0.04, xi=0.4, rho=-0.6)
    s1, s12, n1 = mlmc.level_partials(hopt, KEY, 1, 8, 1 << 16, _cfg())
    s2, s22, n2 = mlmc.level_partials(hopt, KEY, 2, 8, 1 << 16, _cfg())
    v1 = s12 / n1 - (s1 / n1) ** 2
    v2 = s22 / n2 - (s2 / n2) ** 2
    assert np.isfinite(v1) and np.isfinite(v2)
    # Giles premise on hardware: coupled variance decays with level.
    assert v2 < v1 / 1.3


def test_asian_mlmc_level_kernel_on_chip():
    """Observation-count Asian MLMC level kernel on hardware: level mean
    equals the EXACT geometric closed-form telescoping difference, and
    the subsampling coupling decays at beta ~= 2."""
    from mctpu import mlmc
    from mctpu.types import AsianOption
    geo = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=4,
                      average="geometric")
    disc = np.exp(-0.05)
    stats = {}
    for lv in (1, 2):
        s, s2, n = mlmc.asian_level_partials(
            geo, jax.random.fold_in(KEY, lv), lv, 4, 1 << 18, _cfg())
        m = s / n
        v = max(s2 / n - m * m, 0.0)
        want = float(
            mcmath.geometric_asian_call(100., 100., 0.05, 0.2, 1.,
                                        4 * 2 ** lv)
            - mcmath.geometric_asian_call(100., 100., 0.05, 0.2, 1.,
                                          2 * 2 ** lv)) / disc
        assert abs(m - want) < 4 * np.sqrt(v / n), (lv, m, want)
        stats[lv] = v
    assert stats[2] < stats[1] / 2.5  # beta ~= 2


def test_greeks_barrier_on_chip():
    """Round-4: likelihood-ratio barrier Greeks kernel on the hardware
    PRNG, gated against FD of the BGK-corrected closed form (the LR
    estimator is unbiased for the discrete product; BGK approximates it
    to O(1/sqrt(n_obs)) — hence the additive slack)."""
    uo = BarrierOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0,
                       barrier=130.0, n_obs=50, kind="up-and-out")
    res = engine.greeks_barrier(uo, 1 << 21, KEY, _cfg())

    def cf(s=100.0, v=0.2, r=0.05):
        beff = float(mcmath.barrier_continuity_correction(
            130.0, s, v, 1.0, 50, up=True))
        return float(mcmath.up_and_out_call(s, 100.0, r, v, 1.0, beff))

    gates = {
        "delta": ((cf(s=100.5) - cf(s=99.5)) / 1.0, 0.01),
        "vega": ((cf(v=0.205) - cf(v=0.195)) / 0.01, 0.6),
        "rho": ((cf(r=0.051) - cf(r=0.049)) / 0.002, 0.7),
    }
    for name, (want, slack) in gates.items():
        r = getattr(res, name)
        tol = 4 * float(r.std_error) + slack
        assert abs(float(r.price) - want) < tol, (name, float(r.price),
                                                  want)


def test_greeks_heston_on_chip():
    """Round-4: forward-tangent Heston Greeks kernel on hardware, gated
    against FD of the characteristic-function price (pathwise is unbiased
    for the discretized scheme; 100 Euler steps keep the O(dt) scheme
    bias inside the slack)."""
    import dataclasses as dc
    hopt = HestonOption(s=100.0, k=100.0, r=0.03, t=1.0, v0=0.04,
                        kappa=1.5, theta=0.04, xi=0.5, rho=-0.7)
    res = engine.greeks_heston(hopt, 1 << 20, KEY, _cfg(), n_steps=100)

    def cfp(**bump):
        return float(mheston.cf_call_price(dc.replace(hopt, **bump)))

    gates = {
        "delta": ((cfp(s=100.5) - cfp(s=99.5)) / 1.0, 0.01),
        "vega": ((cfp(v0=0.041) - cfp(v0=0.039)) / 0.002, 1.0),
        "rho": ((cfp(r=0.031) - cfp(r=0.029)) / 0.002, 0.6),
    }
    for name, (want, slack) in gates.items():
        r = getattr(res, name)
        tol = 4 * float(r.std_error) + slack
        assert abs(float(r.price) - want) < tol, (name, float(r.price),
                                                  want)

    # Variance-parameter tangents (dtheta/dkappa/dxi): gate in a
    # Feller-satisfied regime (2 kappa theta = 0.36 > xi^2 = 0.16) where
    # the tangents are light-tailed — CF finite differences at 100 steps.
    hf = HestonOption(s=100.0, k=100.0, r=0.03, t=1.0, v0=0.09, kappa=2.0,
                      theta=0.09, xi=0.4, rho=-0.6)
    rf = engine.greeks_heston(hf, 1 << 20, KEY, _cfg(), n_steps=100)

    def cff(**bump):
        return float(mheston.cf_call_price(dc.replace(hf, **bump)))

    fgates = {
        "dtheta": ((cff(theta=0.091) - cff(theta=0.089)) / 0.002, 1.0),
        "dkappa": ((cff(kappa=2.01) - cff(kappa=1.99)) / 0.02, 0.05),
        "dxi": ((cff(xi=0.401) - cff(xi=0.399)) / 0.002, 0.3),
    }
    for name, (want, slack) in fgates.items():
        r = getattr(rf, name)
        tol = 4 * float(r.std_error) + slack
        assert abs(float(r.price) - want) < tol, (name, float(r.price),
                                                  want)


def test_greeks_american_on_chip():
    """Fused fixed-rule American Greeks vs binomial-lattice FD (hardware)."""
    import jax.numpy as jnp

    from mctpu import reference
    from mctpu.types import AmericanOption
    put = AmericanOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0, n_steps=50,
                         payoff="put")
    g = engine.greeks_american(put, 1 << 20, KEY, _cfg(),
                               fit_dtype=jnp.float32)

    def bino(s=100.0, r=0.05, v=0.2):
        return reference.binomial_american(s, 100.0, r, v, 1.0, 2000, "put")

    d = (bino(s=100.25) - bino(s=99.75)) / 0.5
    ve = (bino(v=0.205) - bino(v=0.195)) / 0.01
    rh = (bino(r=0.052) - bino(r=0.048)) / 0.004
    assert _z(g.delta.price, d, g.delta.std_error) < 4
    # vega/rho differ from the continuous-exercise lattice by the 50-date
    # Bermudan grid + frozen-rule quality (see kernels/lsm.py): allow 1%
    # slack on top of the sampling CI (observed offsets 0.75% / 1.5%).
    assert abs(float(g.vega.price) - ve) < (
        4 * float(g.vega.std_error) + 0.01 * abs(ve))
    assert abs(float(g.rho.price) - rh) < (
        4 * float(g.rho.std_error) + 0.02 * abs(rh))


def test_greeks_rainbow_on_chip():
    """Fused arg-extreme rainbow Greeks on the hardware PRNG, gated
    against jax.grad of the exact Stulz (1982) closed form."""
    from mctpu.types import RainbowOption
    opt = RainbowOption(s=np.array([100.0, 95.0]), v=np.array([0.2, 0.3]),
                        corr=np.array([[1.0, 0.5], [0.5, 1.0]]),
                        k=100.0, r=0.05, t=1.0, kind="max")
    res = engine.greeks_rainbow(opt, 1 << 20, KEY, _cfg())

    import jax.numpy as jnp

    def price(s1, s2, v1, v2, r, t):
        return mcmath.rainbow_max_call(s1, s2, 100.0, r, v1, v2, 0.5, t,
                                       dtype=jnp.float64)

    args = (100.0, 95.0, 0.2, 0.3, 0.05, 1.0)
    g = jax.grad(price, argnums=(0, 1, 2, 3, 4, 5))(*args)
    want = {"price": float(price(*args)),
            "delta": np.array([float(g[0]), float(g[1])]),
            "vega": np.array([float(g[2]), float(g[3])]),
            "rho": float(g[4]), "theta": float(g[5])}
    for name in ("price", "rho", "theta"):
        r = getattr(res, name)
        assert _z(r.price, want[name], r.std_error) < 4, name
    for name in ("delta", "vega"):
        r = getattr(res, name)
        z = (np.asarray(r.price) - want[name]) / np.asarray(r.std_error)
        assert (np.abs(z) < 4).all(), (name, np.asarray(r.price),
                                       want[name])


def test_greeks_varswap_on_chip():
    """Fused varswap fair-strike Greeks on the hardware PRNG: GBM gated
    against jax.grad of the exact discrete oracle, Heston against the
    continuous-limit closed form."""
    n = 16
    res = engine.greeks_varswap(OPT, 1 << 20, KEY, _cfg(), n_obs=n)

    def K(v, r, t):
        mu = r - 0.5 * v * v
        return v * v + mu * mu * t / n

    kv, kr, kt = jax.grad(K, argnums=(0, 1, 2))(0.2, 0.048790, 1.0)
    want = {"price": float(K(0.2, 0.048790, 1.0)), "vega": float(kv),
            "rho": float(kr), "theta": float(kt)}
    for nm in ("price", "vega", "rho", "theta"):
        r = getattr(res, nm)
        assert _z(r.price, want[nm], r.std_error) < 4, nm
    assert float(res.delta.price) == 0.0

    hopt = HestonOption(s=100.0, k=100.0, r=0.03, t=1.0, v0=0.09,
                        kappa=2.0, theta=0.06, xi=0.3, rho=-0.6)
    gh = engine.greeks_varswap(hopt, 1 << 18, KEY, _cfg(), n_obs=128)
    import jax.numpy as jnp

    def Kh(v0, th, ka):
        e = (1.0 - jnp.exp(-ka)) / ka
        return th + (v0 - th) * e

    dv0, dth, dka = jax.grad(Kh, argnums=(0, 1, 2))(0.09, 0.06, 2.0)
    wanth = {"price": float(Kh(0.09, 0.06, 2.0)), "vega": float(dv0),
             "dtheta": float(dth), "dkappa": float(dka)}
    for nm in ("price", "vega", "dtheta", "dkappa"):
        r = getattr(gh, nm)
        tol = 4 * float(r.std_error) + 0.02 * abs(wanth[nm])
        assert abs(float(r.price) - wanth[nm]) < tol, (nm, float(r.price),
                                                       wanth[nm])


def test_greeks_ladder_on_chip():
    """Per-strike Greek ladder on the hardware PRNG: every strike's six
    outputs within 4 sigma of bs_greeks, delta ladder monotone."""
    strikes = np.array([80.0, 90.0, 100.0, 110.0, 120.0])
    res = engine.greeks_vanilla_ladder(OPT, strikes, 1 << 20, KEY, _cfg())
    for i, km in enumerate(strikes):
        cf = mcmath.bs_greeks(100.0, float(km), 0.048790, 0.2, 1.0)
        for nm in ('price', 'delta', 'vega', 'rho', 'theta', 'gamma'):
            got = float(np.asarray(getattr(res, nm).price)[i])
            se = max(float(np.asarray(getattr(res, nm).std_error)[i]),
                     1e-12)
            assert abs(got - float(cf[nm])) < 4 * se, (float(km), nm)
    assert (np.diff(np.asarray(res.delta.price)) < 0).all()


def test_greeks_cva_multi_on_chip():
    """Netting-set CVA Greeks on the hardware PRNG, gated against f64
    finite differences of the exact all-long closed form."""
    import dataclasses as dc

    from mctpu.types import CvaMultiSpec
    corr = np.array([[1.0, 0.4], [0.4, 1.0]])
    spec = CvaMultiSpec(intensity=0.03, lgd=0.6,
                        s=np.array([100.0, 95.0]), v=np.array([0.2, 0.3]),
                        corr=corr, r=0.05, t=1.0,
                        strikes=np.array([100.0, 90.0]),
                        weights=np.array([1.0, 0.5]), n_grid=25)
    res = engine.greeks_cva_multi(spec, 1 << 18, KEY, _cfg())

    def cf(sp):
        return float(mcmath.cva_multi_closed_form(
            sp.intensity, sp.lgd, sp.s, sp.v, sp.strikes, sp.weights,
            sp.r, sp.t, sp.n_grid))

    assert _z(res.cva.price, cf(spec), res.cva.std_error) < 4
    h = 1e-4
    fd = (cf(dc.replace(spec, intensity=0.03 + h))
          - cf(dc.replace(spec, intensity=0.03 - h))) / (2 * h)
    assert _z(res.credit_delta.price, fd, res.credit_delta.std_error) < 4
    for i in range(2):
        e = np.zeros(2)
        e[i] = 0.05
        fd = (cf(dc.replace(spec, s=spec.s + e))
              - cf(dc.replace(spec, s=spec.s - e))) / 0.1
        got = float(np.asarray(res.delta.price)[i])
        se = float(np.asarray(res.delta.std_error)[i])
        assert abs(got - fd) < 4 * se, ("delta", i)
        e[i] = 1e-3
        fdv = (cf(dc.replace(spec, v=spec.v + e))
               - cf(dc.replace(spec, v=spec.v - e))) / 2e-3
        gotv = float(np.asarray(res.vega.price)[i])
        sev = float(np.asarray(res.vega.std_error)[i])
        assert abs(gotv - fdv) < 4 * sev, ("vega", i)


def test_greeks_basket_asian_on_chip():
    """Basket-Asian pathwise Greeks on the hardware PRNG: price must
    equal the pricing kernel bitwise (shared streams); deltas positive
    and summing below the all-ITM bound."""
    from mctpu.types import BasketAsianOption
    bk = BasketOption.equicorrelated(3, rho=0.3)
    opt = BasketAsianOption(bk, n_obs=8)
    res = engine.greeks_basket_asian(opt, 1 << 18, KEY, _cfg())
    p = engine.price_basket_asian(opt, 1 << 18, KEY, _cfg())
    assert float(res.price.price) == float(p.price)
    d = np.asarray(res.delta.price)
    assert (d > 0).all() and d.sum() < 1.0
    v = np.asarray(res.vega.price)
    assert (v > 0).all()
    assert np.isfinite(float(res.rho.price))


def test_greeks_basket_barrier_on_chip():
    """Basket-barrier LR Greeks on the hardware PRNG: price bitwise
    equals the pricer; far-barrier limit matches the European basket
    Greeks within LR noise."""
    from mctpu.types import BasketBarrierOption
    bk = BasketOption.equicorrelated(3, rho=0.3)
    opt = BasketBarrierOption(bk, barrier=130.0, n_obs=8)
    res = engine.greeks_basket_barrier(opt, 1 << 18, KEY, _cfg())
    p = engine.price_basket_barrier(opt, 1 << 18, KEY, _cfg())
    assert float(res.price.price) == float(p.price)
    far = engine.greeks_basket_barrier(
        BasketBarrierOption(bk, barrier=1e5, n_obs=8), 1 << 18, KEY,
        _cfg())
    eur = engine.greeks_basket(bk, 1 << 18, KEY, _cfg())
    for nm in ("price", "delta", "vega", "rho"):
        x = np.asarray(getattr(far, nm).price)
        y = np.asarray(getattr(eur, nm).price)
        se = np.hypot(np.asarray(getattr(far, nm).std_error),
                      np.asarray(getattr(eur, nm).std_error))
        assert (np.abs(x - y) < 4 * se).all(), nm


def test_greeks_vanilla_rqmc_on_chip():
    """Sobol Greek surface on hardware: all 8 outputs within 4 spread-CI
    sigmas of bs_greeks, delta CI at least 5x tighter than plain MC."""
    from mctpu import qmc_engine
    g = qmc_engine.greeks_vanilla_rqmc(OPT, 1 << 16, KEY, _cfg(),
                                       replicates=16)
    cf = mcmath.bs_greeks(100.0, 100.0, 0.048790, 0.2, 1.0)
    for nm in ("price", "delta", "vega", "rho", "theta", "gamma",
               "vanna", "volga"):
        r = getattr(g, nm)
        assert _z(r.price, float(cf[nm]), max(float(r.std_error),
                                              1e-15)) < 4, nm
    mc = engine.greeks_vanilla(OPT, 1 << 20, KEY, _cfg())
    assert (float(mc.delta.std_error)
            / max(float(g.delta.std_error), 1e-15)) > 5.0


def test_cliquet_on_chip():
    """Cliquet price + Greeks on the hardware PRNG vs the exact closed
    form and its gradients."""
    from mctpu.types import CliquetOption
    opt = CliquetOption(s=100.0, r=0.03, v=0.2, t=1.0, n_periods=12,
                        cap=0.05, floor=-0.02)
    res = engine.price_cliquet(opt, 1 << 20, KEY, _cfg())
    cf = float(mcmath.cliquet_closed_form(0.03, 0.2, 1.0, 12, 0.05,
                                          -0.02))
    assert _z(res.price, cf, res.std_error) < 4
    g = engine.greeks_cliquet(opt, 1 << 20, KEY, _cfg())
    gv, gr, gt = [float(x) for x in jax.grad(
        lambda v, r, t: mcmath.cliquet_closed_form(r, v, t, 12, 0.05,
                                                   -0.02),
        argnums=(0, 1, 2))(0.2, 0.03, 1.0)]
    for nm, want in (("vega", gv), ("rho", gr), ("theta", gt)):
        r = getattr(g, nm)
        assert _z(r.price, want, r.std_error) < 4, nm
    assert float(g.delta.price) == 0.0


def test_price_xva_on_chip():
    """Bilateral xVA legs on the hardware PRNG vs the exact single-signed
    closed forms (round-5 surface completion: VERDICT r4 weak #1)."""
    from mctpu.types import CvaMultiSpec, XvaSpec
    corr = np.array([[1.0, 0.5], [0.5, 1.0]])
    spec = XvaSpec(
        netting=CvaMultiSpec(intensity=0.03, lgd=0.6,
                             s=np.array([100.0, 95.0]),
                             v=np.array([0.2, 0.3]), corr=corr, r=0.05,
                             t=1.0, strikes=np.array([100.0, 90.0]),
                             weights=np.array([0.5, 0.5]), n_grid=25),
        own_intensity=0.02, own_lgd=0.5, funding_spread=0.01)
    res = engine.price_xva(spec, 1 << 20, KEY, _cfg())
    legs = [float(x) for x in mcmath.xva_multi_closed_form(
        0.03, 0.6, 0.02, 0.5, 0.01, spec.netting.s, spec.netting.v,
        spec.netting.strikes, spec.netting.weights, 0.05, 1.0, 25)]
    assert _z(res.cva.price, legs[0], res.cva.std_error) < 4
    assert _z(res.fca.price, legs[2], res.fca.std_error) < 4
    assert float(res.dva.price) == 0.0 and float(res.fba.price) == 0.0
    assert np.asarray(res.ene_profile).max() == 0.0


def test_greeks_xva_on_chip():
    """xVA Greeks on the hardware PRNG: per-leg credit/funding ratios and
    per-underlying delta/vega vs f64 finite differences of the closed
    form."""
    from mctpu.types import CvaMultiSpec, XvaSpec
    corr = np.array([[1.0, 0.5], [0.5, 1.0]])
    spec = XvaSpec(
        netting=CvaMultiSpec(intensity=0.03, lgd=0.6,
                             s=np.array([100.0, 95.0]),
                             v=np.array([0.2, 0.3]), corr=corr, r=0.05,
                             t=1.0, strikes=np.array([100.0, 90.0]),
                             weights=np.array([0.5, 0.5]), n_grid=25),
        own_intensity=0.02, own_lgd=0.5, funding_spread=0.01)
    res = engine.greeks_xva(spec, 1 << 19, KEY, _cfg())

    def legs(lam_c=0.03, lam_b=0.02, sf=0.01, s=None, v=None):
        s = spec.netting.s if s is None else s
        v = spec.netting.v if v is None else v
        out = mcmath.xva_multi_closed_form(
            lam_c, 0.6, lam_b, 0.5, sf, s, v, spec.netting.strikes,
            spec.netting.weights, 0.05, 1.0, 25)
        return np.array([float(x) for x in out])

    eps = 1e-5
    fd_cpty = (legs(lam_c=0.03 + eps) - legs(lam_c=0.03 - eps))[0] / (2 * eps)
    assert _z(res.credit_cpty.price, fd_cpty, res.credit_cpty.std_error) < 4
    fd_f = (legs(sf=0.01 + eps) - legs(sf=0.01 - eps)) / (2 * eps)
    assert _z(res.funding.price, fd_f[2] - fd_f[3],
              res.funding.std_error) < 4
    assert float(res.credit_own.price) == 0.0  # all-long: exact zero

    def total(s=None, v=None):
        c, d, f, b = legs(s=s, v=v)
        return c - d + f - b

    for i in range(2):
        e = np.zeros(2)
        e[i] = 0.05
        fd = (total(s=spec.netting.s + e)
              - total(s=spec.netting.s - e)) / 0.1
        got = float(np.asarray(res.delta.price)[i])
        se = float(np.asarray(res.delta.std_error)[i])
        assert abs(got - fd) < 4 * se, ("delta", i)
        e[i] = 1e-3
        fdv = (total(v=spec.netting.v + e)
               - total(v=spec.netting.v - e)) / 2e-3
        gotv = float(np.asarray(res.vega.price)[i])
        sev = float(np.asarray(res.vega.std_error)[i])
        assert abs(gotv - fdv) < 4 * sev, ("vega", i)


def test_american_bounds_on_chip():
    """Duality bracket on the hardware PRNG: the engine-tier Pallas LSM
    lower bound plus the dual upper bound must bracket CRR-4000 at 50
    dates (round-5: VERDICT r4 weak #5)."""
    from mctpu import lsm, reference
    from mctpu.types import AmericanOption
    opt = AmericanOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0,
                         n_steps=50, payoff="put")
    b = lsm.price_american_bounds(opt, 1 << 18, KEY, n_sub=64,
                                  config=_cfg())
    crr = reference.binomial_american(100.0, 100.0, 0.05, 0.2, 1.0,
                                      payoff="put", n_steps=4000)
    lo = float(b.lower.price) - float(b.lower.ci)
    hi = float(b.upper.price) + float(b.upper.ci)
    assert lo <= crr <= hi, (lo, crr, hi)
    assert b.gap < 0.008 * crr + float(b.lower.ci) + float(b.upper.ci)


def test_barrier_book_on_chip():
    """Barrier book on the hardware PRNG: the one-instrument bitwise tie
    to the single kernel must hold on REAL Mosaic lowering, and a mixed
    4-instrument book must price each instrument within tolerance of the
    single pricer run separately (round 5: path-dependent serving)."""
    import numpy as np

    from mctpu.types import BarrierBook, BarrierOption
    opt = BarrierOption(100.0, 100.0, 0.05, 0.2, 1.0, barrier=130.0,
                        n_obs=16)
    book1 = BarrierBook.from_options([opt])
    rb = engine.price_barrier_book(book1, 1 << 20, KEY, _cfg())
    rs = engine.price_barrier(opt, 1 << 20, KEY, _cfg())
    assert float(np.asarray(rb.price)[0]) == float(rs.price)
    book = BarrierBook(
        s=np.array([100.0, 95.0, 105.0, 100.0]),
        k=np.array([100.0, 90.0, 110.0, 95.0]),
        r=np.array([0.05, 0.03, 0.04, 0.05]),
        v=np.array([0.2, 0.25, 0.15, 0.3]),
        t=np.array([1.0, 2.0, 0.5, 1.0]),
        barrier=np.array([130.0, 140.0, 150.0, 70.0]), n_obs=16,
        kinds=("call", "call", "call", "put"),
        directions=("up-and-out", "up-and-out", "up-and-out",
                    "down-and-out"))
    rbm = engine.price_barrier_book(book, 1 << 20, KEY, _cfg())
    for i in range(3):
        single = engine.price_barrier(book.option(i), 1 << 20,
                                      jax.random.key(55 + i), _cfg())
        se = float(np.hypot(np.asarray(rbm.std_error)[i],
                            float(single.std_error)))
        assert abs(float(np.asarray(rbm.price)[i])
                   - float(single.price)) < 4 * se, i
    g = engine.greeks_barrier_book(book, 1 << 19, KEY, _cfg())
    assert np.isfinite(np.asarray(g.delta.price)).all()
    gs = engine.greeks_barrier(book.option(0), 1 << 19, KEY, _cfg())
    se = float(np.hypot(np.asarray(g.delta.std_error)[0],
                        float(gs.delta.std_error)))
    assert abs(float(np.asarray(g.delta.price)[0])
               - float(gs.delta.price)) < 4 * se
