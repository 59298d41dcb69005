"""Multi-underlying netting-set CVA: closed form, oracle, degenerate ties."""
import jax
import numpy as np
import pytest

from mctpu import engine, math as mcmath, reference
from mctpu.types import CvaMultiSpec, CvaPortfolioSpec, CvaSpec, VanillaOption

KEY = jax.random.key(777)
CFG = engine.EngineConfig(num_blocks=8, rows=8, backend="xla")
CORR = np.array([[1.0, 0.5], [0.5, 1.0]])
SPEC = CvaMultiSpec(intensity=0.03, lgd=0.6, s=[100.0, 95.0], v=[0.2, 0.3],
                    corr=CORR, r=0.05, t=1.0, strikes=[100.0, 90.0],
                    weights=[0.5, 0.5], n_grid=25)


def test_long_only_matches_closed_form():
    res = engine.price_cva_multi(SPEC, 1 << 16, KEY, CFG)
    want = float(mcmath.cva_multi_closed_form(
        0.03, 0.6, SPEC.s, SPEC.v, SPEC.strikes, SPEC.weights, 0.05, 1.0, 25))
    assert abs(float(res.cva) - want) < 4 * float(res.std_error)


@pytest.mark.slow
def test_single_underlying_ties_to_portfolio_engine():
    one = CvaMultiSpec(intensity=0.03, lgd=0.6, s=[100.0], v=[0.2],
                       corr=np.eye(1), r=0.05, t=1.0, strikes=[100.0],
                       weights=[1.0], n_grid=25)
    a = engine.price_cva_multi(one, 1 << 16, KEY, CFG)
    spec1 = CvaSpec(intensity=0.03, lgd=0.6,
                    option=VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0),
                    n_grid=25)
    b = engine.price_cva(spec1, 1 << 16, jax.random.key(8), CFG)
    se = np.hypot(float(a.std_error), float(b.std_error))
    assert abs(float(a.cva) - float(b.cva)) < 4 * se


def test_netted_short_position_vs_numpy_oracle():
    net = CvaMultiSpec(intensity=0.03, lgd=0.6, s=[100.0, 95.0],
                       v=[0.2, 0.3], corr=CORR, r=0.05, t=1.0,
                       strikes=[100.0, 90.0], weights=[1.0, -0.6], n_grid=25)
    res = engine.price_cva_multi(net, 1 << 16, KEY, CFG)
    ora = reference.price_cva_multi(net, 1 << 16, seed=21)
    se = np.hypot(float(res.std_error), ora.std_error)
    assert abs(float(res.cva) - ora.price) < 4 * se


def test_netting_reduces_cva():
    longs = engine.price_cva_multi(SPEC, 1 << 16, KEY, CFG)
    net = CvaMultiSpec(intensity=0.03, lgd=0.6, s=[100.0, 95.0],
                       v=[0.2, 0.3], corr=CORR, r=0.05, t=1.0,
                       strikes=[100.0, 90.0], weights=[0.5, -0.5], n_grid=25)
    netted = engine.price_cva_multi(net, 1 << 16, KEY, CFG)
    assert float(netted.cva) < float(longs.cva)


def test_correlation_matters_for_netted_sets():
    # A long/short pair on two underlyings: high correlation means the legs
    # track each other and the netted exposure shrinks.
    def cva_at(rho):
        c = np.array([[1.0, rho], [rho, 1.0]])
        s = CvaMultiSpec(intensity=0.03, lgd=0.6, s=[100.0, 100.0],
                         v=[0.2, 0.2], corr=c, r=0.05, t=1.0,
                         strikes=[100.0, 100.0], weights=[1.0, -1.0],
                         n_grid=25)
        return float(engine.price_cva_multi(s, 1 << 16, KEY, CFG).cva)

    assert cva_at(0.9) < cva_at(0.0) < cva_at(-0.9)


@pytest.mark.slow
def test_pallas_interpret_twin():
    icfg = engine.EngineConfig(num_blocks=4, rows=8, backend="pallas",
                               interpret=True)
    res = engine.price_cva_multi(SPEC, 1 << 14, KEY, icfg)
    want = float(mcmath.cva_multi_closed_form(
        0.03, 0.6, SPEC.s, SPEC.v, SPEC.strikes, SPEC.weights, 0.05, 1.0, 25))
    assert abs(float(res.cva) - want) < 4 * float(res.std_error)
    ee = np.asarray(res.expected_exposure)
    assert ee.shape == (25,)
    assert np.all(ee > 0)


@pytest.mark.slow
def test_shard_invariant():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    from mctpu.parallel import path_mesh
    base = engine.price_cva_multi(SPEC, 1 << 14, KEY, CFG)
    cfg8 = engine.EngineConfig(num_blocks=8, rows=8, backend="xla",
                               mesh=path_mesh(devs[:8]))
    shard = engine.price_cva_multi(SPEC, 1 << 14, KEY, cfg8)
    assert float(base.cva) == float(shard.cva)
    np.testing.assert_array_equal(np.asarray(base.expected_exposure),
                                  np.asarray(shard.expected_exposure))


def test_validation():
    with pytest.raises(ValueError, match="shape"):
        CvaMultiSpec(intensity=0.03, lgd=0.6, s=[100.0, 95.0], v=[0.2],
                     corr=CORR, r=0.05, t=1.0, strikes=[100.0, 90.0],
                     weights=[0.5, 0.5], n_grid=25).validate()


def test_packed_regime_wide_set_matches_closed_form():
    """m = 9 > ASSET_MAJOR_MAX keeps the packed MXU layout covered (the
    asset-major regime now owns every small-m test in this module)."""
    from mctpu.kernels.basket import ASSET_MAJOR_MAX, use_asset_major
    m = ASSET_MAJOR_MAX + 1
    assert not use_asset_major(m)
    corr = np.full((m, m), 0.2) + 0.8 * np.eye(m)
    spec = CvaMultiSpec(intensity=0.03, lgd=0.6, s=np.full(m, 100.0),
                        v=np.linspace(0.15, 0.35, m), corr=corr, r=0.05,
                        t=1.0, strikes=np.linspace(90.0, 110.0, m),
                        weights=np.full(m, 1.0 / m), n_grid=10)
    res = engine.price_cva_multi(spec, 1 << 14, KEY, CFG)
    want = float(mcmath.cva_multi_closed_form(
        spec.intensity, spec.lgd, spec.s, spec.v, spec.strikes,
        spec.weights, spec.r, spec.t, spec.n_grid))
    assert abs(float(res.cva) - want) < 4 * float(res.std_error)


@pytest.mark.slow
def test_packed_regime_wide_set_greeks():
    """Packed-regime Greek kernel (m = 9): delta/vega vs closed-form FD."""
    import dataclasses as dc

    from mctpu.kernels.basket import ASSET_MAJOR_MAX
    m = ASSET_MAJOR_MAX + 1
    corr = np.full((m, m), 0.2) + 0.8 * np.eye(m)
    spec = CvaMultiSpec(intensity=0.03, lgd=0.6, s=np.full(m, 100.0),
                        v=np.linspace(0.15, 0.35, m), corr=corr, r=0.05,
                        t=1.0, strikes=np.linspace(90.0, 110.0, m),
                        weights=np.full(m, 1.0 / m), n_grid=10)

    def cf(sp):
        return float(mcmath.cva_multi_closed_form(
            sp.intensity, sp.lgd, sp.s, sp.v, sp.strikes, sp.weights,
            sp.r, sp.t, sp.n_grid))

    g = engine.greeks_cva_multi(spec, 1 << 15, KEY, CFG)
    zc = (float(g.cva.price) - cf(spec)) / float(g.cva.std_error)
    assert abs(zc) < 4.0, zc
    for i in (0, m - 1):
        e = np.zeros(m)
        e[i] = 0.05
        fd = (cf(dc.replace(spec, s=spec.s + e))
              - cf(dc.replace(spec, s=spec.s - e))) / 0.1
        got = float(np.asarray(g.delta.price)[i])
        se = float(np.asarray(g.delta.std_error)[i])
        assert abs(got - fd) < 4 * se, ("delta", i, got, fd)
        e[i] = 1e-3
        fdv = (cf(dc.replace(spec, v=spec.v + e))
               - cf(dc.replace(spec, v=spec.v - e))) / 2e-3
        gotv = float(np.asarray(g.vega.price)[i])
        sev = float(np.asarray(g.vega.std_error)[i])
        assert abs(gotv - fdv) < 4 * sev, ("vega", i, gotv, fdv)
