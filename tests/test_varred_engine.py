"""Engine-contract tests for the variance-reduction tier (CV + IS).

Round-3 VERDICT weak #1: CV/IS bypassed the engine (HBM payoff arrays, no
mesh, no Pallas path).  These tests pin the new contract: per-block
cross-moment partials, bitwise mesh invariance, interpret-mode Pallas
parity, and unbiasedness of the pilot-block beta split.
"""
import jax
import numpy as np
import pytest

from mctpu import engine, math as mcmath, variance
from mctpu.kernels import varred as kvr
from mctpu.kernels import vanilla as kvanilla
from mctpu.parallel import path_mesh
from mctpu.types import AsianOption, BasketOption, VanillaOption

OPT = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0)
ARI = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=12,
                  average="arithmetic")
KEY = jax.random.key(1234)
BS = float(mcmath.bs_call(100.0, 100.0, 0.048790, 0.2, 1.0))


def _cfg(mesh=None, **kw):
    kw.setdefault("num_blocks", 16)
    kw.setdefault("rows", 8)
    kw.setdefault("backend", "xla")
    return engine.EngineConfig(mesh=mesh, **kw)


def _icfg(**kw):
    kw.setdefault("num_blocks", 4)
    kw.setdefault("rows", 8)
    return engine.EngineConfig(backend="pallas", interpret=True, **kw)


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return path_mesh(devs[:8])


class TestShardInvariance:
    @pytest.mark.slow
    def test_vanilla_cv_bitwise_invariant(self, mesh8):
        base = variance.price_vanilla_cv(OPT, 1 << 17, KEY, _cfg(mesh=None))
        shard = variance.price_vanilla_cv(OPT, 1 << 17, KEY,
                                          _cfg(mesh=mesh8))
        assert float(base.price) == float(shard.price)
        assert float(base.ci) == float(shard.ci)

    @pytest.mark.slow
    def test_vanilla_is_bitwise_invariant(self, mesh8):
        o = VanillaOption(100.0, 150.0, 0.05, 0.2, 1.0)
        base = variance.price_vanilla_is(o, 1 << 17, KEY, _cfg(mesh=None))
        shard = variance.price_vanilla_is(o, 1 << 17, KEY, _cfg(mesh=mesh8))
        assert float(base.price) == float(shard.price)
        assert float(base.ci) == float(shard.ci)

    @pytest.mark.slow
    def test_asian_cv_bitwise_invariant(self, mesh8):
        base = variance.price_asian_cv(ARI, 1 << 15, KEY, _cfg(mesh=None))
        shard = variance.price_asian_cv(ARI, 1 << 15, KEY, _cfg(mesh=mesh8))
        assert float(base.price) == float(shard.price)
        assert float(base.ci) == float(shard.ci)

    @pytest.mark.slow
    def test_basket_cv_bitwise_invariant(self, mesh8):
        opt = BasketOption.default_reference(3)
        base = variance.price_basket_cv(opt, 1 << 15, KEY, _cfg(mesh=None))
        shard = variance.price_basket_cv(opt, 1 << 15, KEY,
                                         _cfg(mesh=mesh8))
        assert float(base.price) == float(shard.price)
        assert float(base.ci) == float(shard.ci)


CENTER = np.asarray([10.9, 105.0], np.float32)  # (p0, m) shifts


class TestPallasKernels:
    def test_vanilla_cv_partials_deterministic(self):
        plan = kvanilla.make_plan(1 << 13, num_blocks=4, rows=8,
                                  antithetic=False)
        a = kvr.vanilla_cv_pallas_partials(OPT, CENTER, 7, 0, plan, 4,
                                           interpret=True)
        b = kvr.vanilla_cv_pallas_partials(OPT, CENTER, 7, 0, plan, 4,
                                           interpret=True)
        assert a.shape == (4, kvr.N_MOMENT_SUMS)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_vanilla_cv_block_offset_relabels_streams(self):
        plan = kvanilla.make_plan(1 << 13, num_blocks=4, rows=8,
                                  antithetic=False)
        full = np.asarray(kvr.vanilla_cv_pallas_partials(
            OPT, CENTER, 9, 0, plan, 4, interpret=True))
        tail = np.asarray(kvr.vanilla_cv_pallas_partials(
            OPT, CENTER, 9, 2, plan, 2, interpret=True))
        np.testing.assert_array_equal(full[2:], tail)

    def test_vanilla_cv_interpret_unbiased(self):
        res = variance.price_vanilla_cv(OPT, 1 << 15, KEY, _icfg())
        assert abs(float(res.price) - BS) < 5 * float(res.std_error)

    def test_vanilla_is_interpret_unbiased(self):
        o = VanillaOption(100.0, 140.0, 0.05, 0.2, 1.0)
        bs = float(mcmath.bs_call(100.0, 140.0, 0.05, 0.2, 1.0))
        res = variance.price_vanilla_is(o, 1 << 15, KEY, _icfg())
        assert abs(float(res.price) - bs) < 5 * float(res.std_error)

    @pytest.mark.slow
    def test_asian_cv_interpret_unbiased(self):
        xla = variance.price_asian_cv(ARI, 1 << 14, KEY, _cfg())
        res = variance.price_asian_cv(ARI, 1 << 14, KEY, _icfg())
        se = np.hypot(float(xla.std_error), float(res.std_error))
        # Both estimators are ultra-tight (geometric CV); compare loosely.
        assert abs(float(res.price) - float(xla.price)) < 6 * se + 1e-3

    @pytest.mark.slow
    def test_basket_cv_interpret_both_regimes(self):
        for a in (3, 20):  # asset-major and packed-MXU regimes
            opt = BasketOption.equicorrelated(a, rho=0.3)
            mc = engine.price_basket(opt, 1 << 16, KEY, _cfg())
            cv = variance.price_basket_cv(opt, 1 << 14, KEY, _icfg())
            se = np.hypot(float(mc.std_error), float(cv.std_error))
            assert abs(float(cv.price) - float(mc.price)) < 5 * se, a


class TestContract:
    def test_cv_memory_is_per_block(self):
        # The per-block output is 5 floats regardless of path count: the
        # (n,) HBM payoff arrays of the pre-engine implementation are gone.
        plan = kvanilla.make_plan(1 << 20, num_blocks=8, rows=8,
                                  antithetic=False)
        p = kvr.vanilla_cv_xla_partials(OPT, CENTER, KEY, 0, plan, 8)
        assert p.shape == (8, kvr.N_MOMENT_SUMS)

    def test_pilot_frac_validation(self):
        with pytest.raises(ValueError, match="pilot_frac"):
            variance.price_vanilla_cv(OPT, 1 << 12, KEY, _cfg(),
                                      pilot_frac=1.5)

    @pytest.mark.slow
    def test_antithetic_cv_unbiased(self):
        cfg = _cfg(antithetic=True)
        res = variance.price_vanilla_cv(OPT, 1 << 16, KEY, cfg)
        assert abs(float(res.price) - BS) < 5 * float(res.std_error)

    def test_is_with_engine_config_antithetic(self):
        o = VanillaOption(100.0, 150.0, 0.05, 0.2, 1.0)
        bs = float(mcmath.bs_call(100.0, 150.0, 0.05, 0.2, 1.0))
        res = variance.price_vanilla_is(o, 1 << 16, KEY,
                                        _cfg(antithetic=True))
        assert abs(float(res.price) - bs) < 5 * float(res.std_error)

    @pytest.mark.slow
    def test_cv_ci_sane_in_f32_wide_dtype(self):
        # Pins the round-4 on-chip bug: with x64 OFF (the TPU production
        # default) the UN-centered moment algebra cancelled to CI == 0.0
        # exactly.  Centered in-kernel moments must give a nonzero CI that
        # still beats plain MC.
        with jax.enable_x64(False):
            opt = BasketOption.default_reference(3)
            cv = variance.price_basket_cv(opt, 1 << 16, KEY, _cfg())
            mc = engine.price_basket(opt, 1 << 16, jax.random.key(3),
                                     _cfg())
            assert float(cv.ci) > 0.0
            assert float(cv.std_error) < float(mc.std_error)

    @pytest.mark.slow
    def test_basket_cv_nonzero_brownian_drift_mean(self):
        # The control mean must account for the drift offset d (the old
        # implementation assumed d = 0).
        opt = BasketOption.default_reference(3)
        import dataclasses
        opt = dataclasses.replace(opt, d=np.full(3, 0.3, np.float64))
        cv = variance.price_basket_cv(opt, 1 << 16, KEY, _cfg())
        mc = engine.price_basket(opt, 1 << 18, jax.random.key(5), _cfg())
        se = np.hypot(float(cv.std_error), float(mc.std_error))
        assert abs(float(cv.price) - float(mc.price)) < 5 * se
