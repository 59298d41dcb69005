"""Native C++ host engine tests (csrc/mc_host.cpp via ctypes).

The native engine is a third, fully independent implementation (own RNG, own
math, own language); its agreement with the closed forms and the NumPy oracle
is the strongest cross-check tier in the suite.
"""
import numpy as np
import pytest

from mctpu import math as mcmath
from mctpu import native, reference
from mctpu.models import cva as mcva
from mctpu.types import BasketOption, CvaSpec, VanillaOption

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native engine not built (needs g++)")

OPT = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0)


def test_bs_call_matches_jax():
    a = native.bs_call(100.0, 100.0, 0.048790, 0.2, 1.0)
    b = float(mcmath.bs_call(100.0, 100.0, 0.048790, 0.2, 1.0))
    assert a == pytest.approx(b, abs=1e-9)


def test_vanilla_within_3_sigma():
    res = native.price_vanilla(OPT, 1 << 21, seed=1)
    bs = native.bs_call(100.0, 100.0, 0.048790, 0.2, 1.0)
    assert abs(res.price - bs) < 3 * res.std_error


def test_vanilla_deterministic_and_thread_invariant():
    # Chunked counter RNG: the result must not depend on scheduling.
    a = native.price_vanilla(OPT, 1 << 19, seed=7)
    b = native.price_vanilla(OPT, 1 << 19, seed=7)
    assert a.price == b.price
    assert a.ci == b.ci


def test_vanilla_antithetic_reduces_error():
    plain = native.price_vanilla(OPT, 1 << 20, seed=2)
    anti = native.price_vanilla(OPT, 1 << 20, seed=2, antithetic=True)
    assert anti.std_error < plain.std_error


def test_basket_vs_numpy_oracle():
    opt = BasketOption.default_reference(3)
    a = native.price_basket(opt, 1 << 20, seed=3)
    b = reference.price_basket(opt, 1 << 19, seed=4)
    se = np.hypot(a.std_error, b.std_error)
    assert abs(a.price - b.price) < 3 * se


def test_basket_single_asset_is_vanilla():
    opt = BasketOption(
        s=np.array([100.0]), v=np.array([0.2]), w=np.array([1.0]),
        corr=np.eye(1), d=np.zeros(1), k=100.0, r=0.048790, t=1.0)
    res = native.price_basket(opt, 1 << 20, seed=5)
    bs = native.bs_call(100.0, 100.0, 0.048790, 0.2, 1.0)
    assert abs(res.price - bs) < 3 * res.std_error


def test_cva_within_3_sigma_of_closed_form():
    spec = CvaSpec(intensity=0.03, lgd=0.6,
                   option=VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0),
                   n_grid=50)
    res = native.price_cva(spec, 1 << 17, seed=6)
    want = float(mcva.closed_form(spec))
    assert abs(res.price - want) < 3 * res.std_error


def test_cva_profile_matches_martingale_growth():
    spec = CvaSpec(intensity=0.03, lgd=0.6,
                   option=VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0),
                   n_grid=25)
    res = native.price_cva(spec, 1 << 16, seed=8)
    c0 = float(mcmath.bs_call(100.0, 100.0, 0.05, 0.2, 1.0))
    tj = 1.0 / spec.n_grid * np.arange(1, spec.n_grid + 1)
    np.testing.assert_allclose(res.expected_exposure, c0 * np.exp(0.05 * tj),
                               rtol=0.02)


def test_cholesky_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((8, 8))
    cov = a @ a.T + 8 * np.eye(8)
    d = np.sqrt(np.diag(cov))
    corr = cov / np.outer(d, d)
    np.testing.assert_allclose(native.cholesky(corr),
                               reference.cholesky_psd(corr), atol=1e-12)
    # And the singular reference matrix factorizes too.
    sing = np.asarray(BasketOption.default_reference(3).corr, np.float64)
    L = native.cholesky(sing)
    np.testing.assert_allclose(L @ L.T, sing, atol=1e-12)


def test_asset_limit_guard():
    a = 1025
    opt = BasketOption(
        s=np.full(a, 100.0), v=np.full(a, 0.2), w=np.full(a, 1 / a),
        corr=np.eye(a), d=np.zeros(a), k=100.0, r=0.05, t=1.0)
    with pytest.raises(ValueError, match="1024"):
        native.price_basket(opt, 1024, seed=0)


def test_native_put():
    put = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0,
                        kind="put")
    res = native.price_vanilla(put, 1 << 20, seed=4)
    want = float(mcmath.bs_put(100.0, 100.0, 0.048790, 0.2, 1.0))
    assert abs(res.price - want) < 3 * res.std_error


def test_native_asian_vs_geometric_closed_form():
    from mctpu import math as mcmath
    from mctpu.types import AsianOption
    opt = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=12,
                      average="geometric")
    res = native.price_asian(opt, 1 << 18, seed=3)
    want = float(mcmath.geometric_asian_call(100.0, 100.0, 0.05, 0.2, 1.0,
                                             12))
    assert abs(res.price - want) < 4 * res.std_error


def test_native_asian_antithetic_tightens():
    from mctpu.types import AsianOption
    opt = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=12)
    plain = native.price_asian(opt, 1 << 17, seed=4)
    anti = native.price_asian(opt, 1 << 17, seed=4, antithetic=True)
    assert anti.std_error < plain.std_error


def test_native_barrier_vs_bgk_closed_form():
    from mctpu import math as mcmath
    from mctpu.types import BarrierOption
    opt = BarrierOption(100.0, 100.0, 0.05, 0.2, 1.0, barrier=130.0,
                        n_obs=50, kind="up-and-out")
    res = native.price_barrier(opt, 1 << 18, seed=5)
    beff = float(mcmath.barrier_continuity_correction(
        130.0, 100.0, 0.2, 1.0, 50, up=True))
    want = float(mcmath.up_and_out_call(100.0, 100.0, 0.05, 0.2, 1.0, beff))
    assert abs(res.price - want) < 4 * res.std_error + 0.03


def test_native_asian_vs_engine_twin():
    import jax

    from mctpu import engine
    from mctpu.types import AsianOption
    opt = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=12)
    nat = native.price_asian(opt, 1 << 17, seed=6)
    eng = engine.price_asian(opt, 1 << 17, jax.random.key(6),
                             engine.EngineConfig(num_blocks=8, rows=8,
                                                 backend="xla"))
    se = np.hypot(nat.std_error, float(eng.std_error))
    assert abs(nat.price - float(eng.price)) < 4 * se


def test_native_vanilla_greeks_match_closed_form():
    """All 8 Greek outputs (call AND put) within 4 sigma of bs_greeks —
    the f64 cross-implementation gate for the pathwise and mixed
    pathwise-LR integrands (incl. gamma/vanna/volga Stein forms)."""
    cf = {k: float(v) for k, v in
          mcmath.bs_greeks(100.0, 100.0, 0.048790, 0.2, 1.0).items()}
    disc = float(np.exp(-0.048790))
    for kind in ("call", "put"):
        opt = VanillaOption(100.0, 100.0, 0.048790, 0.2, 1.0, kind=kind)
        g = native.vanilla_greeks(opt, 1 << 20, seed=3)
        for name, (mc, se) in g.items():
            want = cf[name]
            if kind == "put":  # put-call parity adjustments
                want = {
                    "price": cf["price"] - 100 + 100 * disc,
                    "delta": cf["delta"] - 1.0,
                    "rho": cf["rho"] - 100 * disc,
                    "theta": cf["theta"] - 0.048790 * 100 * disc,
                }.get(name, want)
            z = (mc - want) / se
            assert abs(z) < 4.0, (kind, name, mc, want, z)


def test_native_vanilla_greeks_agree_with_engine():
    """Native f64 Greeks vs the JAX engine tier: independent streams, so
    statistical agreement within combined CIs."""
    import jax

    from mctpu import engine
    g_native = native.vanilla_greeks(OPT, 1 << 19, seed=11)
    cfg = engine.EngineConfig(num_blocks=16, rows=8, backend="xla")
    g_eng = engine.greeks_vanilla(OPT, 1 << 19, jax.random.key(11), cfg)
    for name, (mc, se) in g_native.items():
        r = getattr(g_eng, name)
        comb = float(np.hypot(se, float(r.std_error)))
        assert abs(mc - float(r.price)) < 5 * comb, (name, mc,
                                                     float(r.price))


def test_native_greeks_antithetic_and_thread_invariance():
    g1 = native.vanilla_greeks(OPT, 1 << 18, seed=5)
    g2 = native.vanilla_greeks(OPT, 1 << 18, seed=5)
    for name in native.GREEK_NAMES:
        assert g1[name] == g2[name], name  # deterministic
    ga = native.vanilla_greeks(OPT, 1 << 18, seed=5, antithetic=True)
    assert ga["delta"][1] < g1["delta"][1]  # antithetic tightens delta


def test_native_book_vs_closed_form_and_engine():
    from mctpu import math as mcmath
    from mctpu.types import VanillaBook

    book = VanillaBook.from_options([
        VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0),
        VanillaOption(100.0, 120.0, 0.05, 0.3, 0.5),
        VanillaOption(95.0, 90.0, 0.03, 0.15, 2.0, kind="put"),
    ])
    res = native.price_book(book, 1 << 19, seed=3)
    for i, r in enumerate(res):
        o = book.option(i)
        fn = mcmath.bs_call if o.kind == "call" else mcmath.bs_put
        ex = float(fn(o.s, o.k, o.r, o.v, o.t))
        assert abs(r.price - ex) < 4 * r.std_error, (i, r.price, ex)
    # deterministic + comonotone with the single pricer's estimator family
    res2 = native.price_book(book, 1 << 19, seed=3)
    assert all(a.price == b.price for a, b in zip(res, res2))
    anti = native.price_book(book, 1 << 19, seed=3, antithetic=True)
    assert all(a.std_error < b.std_error for a, b in zip(anti, res))
