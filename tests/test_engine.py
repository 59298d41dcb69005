"""Engine tests (XLA backend on CPU): correctness vs closed forms and the
independent NumPy oracle — the reference's oracle comparisons promoted to
asserts (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mctpu import engine, math as mcmath, reference
from mctpu.models import cva as mcva
from mctpu.types import BasketOption, CvaSpec, Precision, VanillaOption

OPT = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0)
CVA_OPT = VanillaOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0)
CFG = engine.EngineConfig(num_blocks=8, rows=8, backend="xla")
KEY = jax.random.key(2024)


def _z(price, want, se):
    return abs(float(price) - float(want)) / float(se)


class TestVanilla:
    def test_within_3_sigma_of_bs(self):
        res = engine.price_vanilla(OPT, 1 << 19, KEY, CFG)
        bs = mcmath.bs_call(OPT.s, OPT.k, OPT.r, OPT.v, OPT.t)
        # CI applies to the discounted mean; discount the comparison too.
        assert _z(res.price, bs, res.std_error) < 3

    def test_rounds_path_count_up(self):
        res = engine.price_vanilla(OPT, 1000, KEY, CFG)
        assert res.n_paths >= 1000
        assert res.n == res.n_paths

    def test_antithetic_reduces_error_and_halves_units(self):
        plain = engine.price_vanilla(OPT, 1 << 18, KEY, CFG)
        cfg_a = engine.EngineConfig(num_blocks=8, rows=8, backend="xla",
                                    antithetic=True)
        anti = engine.price_vanilla(OPT, 1 << 18, KEY, cfg_a)
        assert anti.n == anti.n_paths // 2
        assert float(anti.std_error) < float(plain.std_error)
        bs = mcmath.bs_call(OPT.s, OPT.k, OPT.r, OPT.v, OPT.t)
        assert _z(anti.price, bs, anti.std_error) < 3

    def test_f64_precision_policy(self):
        cfg = engine.EngineConfig(num_blocks=8, rows=8, backend="xla",
                                  precision=Precision.F64)
        res = engine.price_vanilla(OPT, 1 << 18, KEY, cfg)
        bs = mcmath.bs_call(OPT.s, OPT.k, OPT.r, OPT.v, OPT.t)
        assert _z(res.price, bs, res.std_error) < 3

    def test_kahan_agrees_with_plain_f32_on_same_draws(self):
        # F32 and F32_KAHAN consume identical f32 normal draws; only the
        # accumulator differs, so prices must agree to accumulation noise.
        cfg_k = engine.EngineConfig(num_blocks=8, rows=8, backend="xla",
                                    precision=Precision.F32_KAHAN)
        cfg_p = engine.EngineConfig(num_blocks=8, rows=8, backend="xla",
                                    precision=Precision.F32)
        a = engine.price_vanilla(OPT, 1 << 18, KEY, cfg_k)
        b = engine.price_vanilla(OPT, 1 << 18, KEY, cfg_p)
        assert abs(float(a.price) - float(b.price)) < 1e-4

    def test_kahan_accumulator_beats_plain_f32(self):
        # Unit-level: compensated f32 summation of an adversarial sequence
        # tracks the f64 sum where plain f32 drifts.
        from mctpu.utils.accum import kahan_add, kahan_init, kahan_value
        rng = np.random.default_rng(0)
        xs = (rng.standard_normal(200_000) * 7 + 10).astype(np.float32)
        want = float(np.sum(xs.astype(np.float64)))

        def scan_fn(carry, x):
            plain, kah = carry
            return (plain + x, kahan_add(kah, x)), None

        (plain, kah), _ = jax.lax.scan(
            scan_fn,
            (jnp.float32(0), kahan_init(jnp.float32(0))),
            jnp.asarray(xs))
        del kahan_value  # value extracted in f64 to dodge output rounding
        err_plain = abs(float(plain) - want)
        err_kahan = abs(float(kah[0]) + float(kah[1]) - want)
        assert err_kahan < err_plain / 100
        assert err_kahan < 0.01

    def test_ci_shrinks_with_paths(self):
        small = engine.price_vanilla(OPT, 1 << 15, KEY, CFG)
        big = engine.price_vanilla(OPT, 1 << 20, KEY, CFG)
        ratio = float(small.ci) / float(big.ci)
        assert ratio == pytest.approx(np.sqrt(big.n / small.n), rel=0.15)

    def test_reproducible(self):
        a = engine.price_vanilla(OPT, 1 << 16, KEY, CFG)
        b = engine.price_vanilla(OPT, 1 << 16, KEY, CFG)
        assert float(a.price) == float(b.price)


class TestBasket:
    @pytest.mark.slow
    def test_single_asset_matches_bs(self):
        opt = BasketOption(
            s=np.array([100.0]), v=np.array([0.2]), w=np.array([1.0]),
            corr=np.eye(1), d=np.zeros(1), k=100.0, r=0.048790, t=1.0,
        )
        res = engine.price_basket(opt, 1 << 19, KEY, CFG)
        bs = mcmath.bs_call(100.0, 100.0, 0.048790, 0.2, 1.0)
        assert _z(res.price, bs, res.std_error) < 3

    def test_reference_config_vs_oracle(self):
        opt = BasketOption.default_reference(3)
        res = engine.price_basket(opt, 1 << 19, KEY, CFG)
        ora = reference.price_basket(opt, 1 << 19, seed=11)
        se = np.hypot(float(res.std_error),
                      ora.std_error)
        assert _z(res.price, ora.price, se) < 3

    def test_ten_assets_vs_oracle(self):
        opt = BasketOption.default_reference(10)
        res = engine.price_basket(opt, 1 << 18, KEY, CFG)
        ora = reference.price_basket(opt, 1 << 18, seed=12)
        se = np.hypot(float(res.std_error),
                      ora.std_error)
        assert _z(res.price, ora.price, se) < 3

    def test_perfectly_correlated_equals_single(self):
        # Equal vols + rho=1 + equal spots -> basket == single asset.
        a = 4
        opt = BasketOption(
            s=np.full(a, 100.0), v=np.full(a, 0.2), w=np.full(a, 1 / a),
            corr=np.ones((a, a)), d=np.zeros(a), k=100.0, r=0.048790, t=1.0,
        )
        res = engine.price_basket(opt, 1 << 19, KEY, CFG)
        bs = mcmath.bs_call(100.0, 100.0, 0.048790, 0.2, 1.0)
        assert _z(res.price, bs, res.std_error) < 3

    @pytest.mark.slow
    def test_antithetic(self):
        opt = BasketOption.default_reference(3)
        cfg_a = engine.EngineConfig(num_blocks=8, rows=8, backend="xla",
                                    antithetic=True)
        anti = engine.price_basket(opt, 1 << 18, KEY, cfg_a)
        plain = engine.price_basket(opt, 1 << 18, KEY, CFG)
        assert float(anti.std_error) < float(plain.std_error)


class TestCva:
    SPEC = CvaSpec(intensity=0.03, lgd=0.6, option=CVA_OPT, n_grid=25)

    def test_within_3_sigma_of_closed_form(self):
        res = engine.price_cva(self.SPEC, 1 << 17, KEY, CFG)
        want = float(mcva.closed_form(self.SPEC))
        assert _z(res.cva, want, res.std_error) < 3

    def test_exposure_profile(self):
        res = engine.price_cva(self.SPEC, 1 << 17, KEY, CFG)
        c0 = float(mcmath.bs_call(CVA_OPT.s, CVA_OPT.k, CVA_OPT.r, CVA_OPT.v, CVA_OPT.t))
        tj = CVA_OPT.t / self.SPEC.n_grid * np.arange(1, self.SPEC.n_grid + 1)
        want = c0 * np.exp(CVA_OPT.r * tj)
        np.testing.assert_allclose(np.asarray(res.expected_exposure), want, rtol=0.02)

    def test_default_leg_output(self):
        res = engine.price_cva(self.SPEC, 1 << 14, KEY, CFG)
        dp = np.asarray(res.default_leg)
        assert dp.shape == (self.SPEC.n_grid,)
        assert dp.sum() == pytest.approx(
            1 - np.exp(-0.03 * 1.0), rel=1e-6)

    def test_vs_oracle(self):
        res = engine.price_cva(self.SPEC, 1 << 17, KEY, CFG)
        ora = reference.price_cva(self.SPEC, 1 << 15, seed=13)
        se = np.hypot(float(res.std_error), ora.std_error)
        assert _z(res.cva, ora.price, se) < 3

    @pytest.mark.slow
    def test_antithetic(self):
        cfg_a = engine.EngineConfig(num_blocks=8, rows=8, backend="xla",
                                    antithetic=True)
        anti = engine.price_cva(self.SPEC, 1 << 16, KEY, cfg_a)
        want = float(mcva.closed_form(self.SPEC))
        assert _z(anti.cva, want, anti.std_error) < 3
        assert anti.n == anti.n_paths // 2

    @pytest.mark.slow
    def test_grid_sweep(self):
        # The reference CVA driver sweeps grid sizes (cvaOpt.cu:70-97);
        # assert each converges to its own closed form.
        for g in (25, 50):
            spec = CvaSpec(intensity=0.03, lgd=0.6, option=CVA_OPT, n_grid=g)
            res = engine.price_cva(spec, 1 << 15, KEY, CFG)
            want = float(mcva.closed_form(spec))
            assert _z(res.cva, want, res.std_error) < 4


class TestAutoShrink:
    def test_small_request_shrinks_geometry(self):
        cfg = engine.EngineConfig(num_blocks=512, rows=256, backend="xla")
        res = engine.price_vanilla(OPT, 262144, KEY, cfg)
        # Without shrink this would be 512*256*256 = 33.5M paths.
        assert res.n_paths <= 2 * 262144

    def test_shrink_respects_exact_request(self):
        cfg = engine.EngineConfig(num_blocks=512, rows=256, backend="xla")
        res = engine.price_vanilla(OPT, 1 << 18, KEY, cfg)
        assert res.n_paths == 1 << 18

    @pytest.mark.slow
    def test_shrunk_run_is_mesh_invariant(self):
        from mctpu.parallel import path_mesh
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 devices")
        base = engine.price_vanilla(
            OPT, 1 << 15, KEY,
            engine.EngineConfig(num_blocks=512, rows=256, backend="xla"))
        shard = engine.price_vanilla(
            OPT, 1 << 15, KEY,
            engine.EngineConfig(num_blocks=512, rows=256, backend="xla",
                                mesh=path_mesh(devs[:8])))
        assert float(base.price) == float(shard.price)

    @pytest.mark.slow
    def test_opt_out(self):
        cfg = engine.EngineConfig(num_blocks=64, rows=64, backend="xla",
                                  auto_shrink=False)
        res = engine.price_vanilla(OPT, 1, KEY, cfg)
        assert res.n_paths == 64 * 2 * 64 * 128


class TestValidation:
    def test_vanilla_rejects_bad_inputs(self):
        import pytest as _pytest
        from mctpu.types import VanillaOption
        with _pytest.raises(ValueError, match="positive"):
            VanillaOption(s=-1.0, k=100.0, r=0.05, v=0.2, t=1.0).validate()
        with _pytest.raises(ValueError, match="volatility"):
            VanillaOption(s=100.0, k=100.0, r=0.05, v=-0.1, t=1.0).validate()
        with _pytest.raises(ValueError, match="maturity"):
            VanillaOption(s=100.0, k=100.0, r=0.05, v=0.2, t=0.0).validate()

    def test_basket_rejects_bad_inputs(self):
        import pytest as _pytest
        good = BasketOption.default_reference(3)
        good.validate()
        bad_corr = BasketOption(
            s=np.full(3, 100.0), v=np.full(3, 0.2), w=np.full(3, 1 / 3),
            corr=np.eye(3) * 2, d=np.zeros(3), k=100.0, r=0.05, t=1.0)
        with _pytest.raises(ValueError, match="unit diagonal"):
            bad_corr.validate()
        bad_shape = BasketOption(
            s=np.full(3, 100.0), v=np.full(2, 0.2), w=np.full(3, 1 / 3),
            corr=np.eye(3), d=np.zeros(3), k=100.0, r=0.05, t=1.0)
        with _pytest.raises(ValueError, match="shape"):
            bad_shape.validate()

    def test_cva_rejects_bad_inputs(self):
        import pytest as _pytest
        with _pytest.raises(ValueError, match="n_grid"):
            CvaSpec(intensity=0.03, lgd=0.6, option=CVA_OPT, n_grid=0).validate()
        with _pytest.raises(ValueError, match="lgd"):
            CvaSpec(intensity=0.03, lgd=1.5, option=CVA_OPT, n_grid=5).validate()

    def test_engine_validates(self):
        import pytest as _pytest
        bad = VanillaOption(s=-5.0, k=100.0, r=0.05, v=0.2, t=1.0)
        with _pytest.raises(ValueError):
            engine.price_vanilla(bad, 1 << 12, KEY, CFG)

    def test_result_to_dict(self):
        import json
        res = engine.price_vanilla(OPT, 1 << 14, KEY, CFG)
        d = res.to_dict()
        json.dumps(d)
        assert set(d) == {"price", "ci", "std_error", "n", "n_paths"}
        spec = CvaSpec(intensity=0.03, lgd=0.6, option=CVA_OPT, n_grid=5)
        rc = engine.price_cva(spec, 1 << 12, KEY, CFG)
        dc = rc.to_dict()
        json.dumps(dc)
        assert len(dc["expected_exposure"]) == 5


class TestPut:
    def test_put_within_3_sigma_of_bs_put(self):
        put = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0,
                            kind="put")
        res = engine.price_vanilla(put, 1 << 19, KEY, CFG)
        want = float(mcmath.bs_put(100.0, 100.0, 0.048790, 0.2, 1.0))
        assert _z(res.price, want, res.std_error) < 3

    def test_put_call_parity_same_draws(self):
        # Same key => same paths => pathwise (S-K)+ - (K-S)+ = S - K, so
        # C - P = e^{-rT} (mean(S_T) - K): parity holds up to the MC error
        # of mean(S_T), whose sd is S0 sqrt(e^{v^2 T} - 1) (undiscounted).
        n = 1 << 18
        call = engine.price_vanilla(OPT, n, KEY, CFG)
        put = engine.price_vanilla(
            VanillaOption(OPT.s, OPT.k, OPT.r, OPT.v, OPT.t, kind="put"),
            n, KEY, CFG)
        lhs = float(call.price) - float(put.price)
        rhs = 100.0 - 100.0 * np.exp(-OPT.r * OPT.t)
        se = 100.0 * np.sqrt(np.exp(OPT.v**2 * OPT.t) - 1.0) / np.sqrt(n)
        assert lhs == pytest.approx(rhs, abs=4 * se)

    def test_oracle_put(self):
        put = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0,
                            kind="put")
        ora = reference.price_vanilla(put, 1 << 19, seed=21)
        want = float(mcmath.bs_put(100.0, 100.0, 0.048790, 0.2, 1.0))
        assert abs(ora.price - want) < 3 * ora.std_error

    def test_kind_validated(self):
        with pytest.raises(ValueError, match="kind"):
            VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0,
                          kind="straddle").validate()
        from mctpu.types import CvaSpec as _C
        with pytest.raises(ValueError, match="call"):
            _C(intensity=0.03, lgd=0.6,
               option=VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0,
                                    kind="put"),
               n_grid=10).validate()


class TestAutoShrinkWideMeshWarning:
    """auto_shrink past the 8-device floor must warn loudly (r2 weak #4)."""

    class _FakeMesh:
        class _D:
            size = 16
        devices = _D()

    def test_wide_mesh_geometry_change_warns(self):
        import warnings

        from mctpu.engine import EngineConfig
        cfg = EngineConfig(num_blocks=64, rows=8, mesh=self._FakeMesh())
        with pytest.warns(UserWarning, match="bitwise"):
            blocks, rows = cfg.layout_for(1 << 10, 256)
        assert blocks == 16  # floored at n_dev, not at 8

    def test_wide_mesh_no_shrink_no_warning(self):
        import warnings

        from mctpu.engine import EngineConfig
        # Path count large enough that no shrinking happens at any width.
        cfg = EngineConfig(num_blocks=64, rows=8, mesh=self._FakeMesh())
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            blocks, rows = cfg.layout_for(1 << 30, 256)
        assert blocks == 64

    def test_narrow_mesh_never_warns(self):
        import warnings

        from mctpu.engine import EngineConfig
        cfg = EngineConfig(num_blocks=64, rows=8)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            cfg.layout_for(1 << 10, 256)


class TestDoubleSinglePrecision:
    """Precision.F32_DS: double-single carried walk state (round 4)."""

    def test_ds_cva_matches_closed_form(self):
        from mctpu import engine
        from mctpu.models import cva as mcva
        from mctpu.types import CvaSpec, Precision, VanillaOption
        spec = CvaSpec(intensity=0.03, lgd=0.6,
                       option=VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0),
                       n_grid=100)
        cfg = engine.EngineConfig(num_blocks=16, rows=8, backend="xla",
                                  precision=Precision.F32_DS)
        r = engine.price_cva(spec, 1 << 16, jax.random.key(3), cfg)
        cf = float(mcva.closed_form(spec))
        assert abs(float(r.cva) - cf) < 4 * float(r.std_error)

    @pytest.mark.slow
    def test_ds_close_to_kahan_same_streams(self):
        # Same key, same geometry: DS differs from plain f32 only by walk
        # rounding — far below the MC standard error.
        import dataclasses

        from mctpu import engine
        from mctpu.types import CvaSpec, Precision, VanillaOption
        spec = CvaSpec(intensity=0.03, lgd=0.6,
                       option=VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0),
                       n_grid=200)
        cfg = engine.EngineConfig(num_blocks=16, rows=8, backend="xla",
                                  precision=Precision.F32_KAHAN)
        a = engine.price_cva(spec, 1 << 15, jax.random.key(5), cfg)
        b = engine.price_cva(
            spec, 1 << 15, jax.random.key(5),
            dataclasses.replace(cfg, precision=Precision.F32_DS))
        assert abs(float(a.cva) - float(b.cva)) < 0.05 * float(a.std_error)

    def test_ds_add_exactness(self):
        # The double-single sum of many small increments must track f64.
        import numpy as np

        from mctpu.utils.accum import ds_add
        rng = np.random.default_rng(0)
        incs = rng.normal(0.0, 0.01, 2000).astype(np.float32)
        hi = jnp.float32(4.60517)  # log(100)
        lo = jnp.float32(0.0)
        plain = jnp.float32(4.60517)
        for x in incs:
            hi, lo = ds_add(hi, lo, jnp.float32(x))
            plain = plain + jnp.float32(x)
        exact = (np.float64(np.float32(4.60517))
                 + incs.astype(np.float64).sum())
        err_ds = abs(float(hi) + float(lo) - exact)
        err_plain = abs(float(plain) - exact)
        assert err_ds <= err_plain
        assert err_ds < 1e-9

    def test_ds_precision_flags(self):
        from mctpu.types import Precision
        assert Precision.F32_DS.kahan and Precision.F32_DS.ds
        assert not Precision.F32_KAHAN.ds
        assert Precision.F32_DS.dtype == jnp.float32
