"""Interpret-mode parity tests for the six fused Pallas kernels.

``pltpu.InterpretParams`` executes the real kernel code on CPU — fused
walks, payoff math, Kahan accumulation, output plumbing — with one swap:
the hardware PRNG (which the interpreter stubs out with constant bits) is
replaced by the counter-hash emulation in ``mctpu.kernels.common``.  A
broken kernel edit therefore fails CI; only the ``pltpu.prng_*`` call
itself needs hardware, and that is covered by the ``@pytest.mark.tpu``
gates in ``tests/test_tpu_hardware.py``.

Fills the validation role of the reference's oracle printouts
(``vanillaOpt.cu:62-104``) for the device kernels proper.
"""
import jax
import numpy as np
import pytest

from mctpu import engine, estimator as mcest, math as mcmath, reference
from mctpu.kernels import (asian as kasian, basket as kbasket, cva as kcva,
                           heston as kheston, vanilla as kvanilla)
from mctpu.models import asian as masian, cva as mcva, heston as mheston
from mctpu.types import (AsianOption, BarrierOption, BasketOption, CvaSpec,
                         HestonOption, VanillaOption)

KEY = jax.random.key(31)
OPT = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0)
BS = float(mcmath.bs_call(100.0, 100.0, 0.048790, 0.2, 1.0))


def _cfg(**kw):
    kw.setdefault("num_blocks", 4)
    kw.setdefault("rows", 8)
    return engine.EngineConfig(backend="pallas", interpret=True, **kw)


def _z(price, want, se):
    return abs(float(price) - want) / float(se)


class TestVanillaKernel:
    def test_partials_shape_and_accounting(self):
        plan = kvanilla.make_plan(1 << 14, num_blocks=4, rows=8,
                                  antithetic=False)
        p = kvanilla.pallas_partials(OPT, 77, 0, plan, plan.num_blocks,
                                     interpret=True)
        assert p.shape == (plan.num_blocks, 2)
        assert plan.total_units == plan.num_blocks * plan.iters * 2 * 8 * 128
        assert np.all(np.isfinite(np.asarray(p)))
        # sum_p2 >= 0 and consistent with a nonneg payoff
        assert np.all(np.asarray(p) >= 0)

    def test_deterministic_in_seed(self):
        plan = kvanilla.make_plan(1 << 14, num_blocks=4, rows=8,
                                  antithetic=False)
        a = kvanilla.pallas_partials(OPT, 77, 0, plan, plan.num_blocks,
                                     interpret=True)
        b = kvanilla.pallas_partials(OPT, 77, 0, plan, plan.num_blocks,
                                     interpret=True)
        c = kvanilla.pallas_partials(OPT, 78, 0, plan, plan.num_blocks,
                                     interpret=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.array_equal(np.asarray(a), np.asarray(c))

    def test_block_offset_relabels_streams(self):
        # Blocks [2,3] of an offset-0 launch == blocks [0,1] of offset 2:
        # the mesh-sharding invariance depends on exactly this property.
        plan = kvanilla.make_plan(1 << 13, num_blocks=4, rows=8,
                                  antithetic=False)
        full = np.asarray(kvanilla.pallas_partials(OPT, 9, 0, plan, 4,
                                                   interpret=True))
        tail = np.asarray(kvanilla.pallas_partials(OPT, 9, 2, plan, 2,
                                                   interpret=True))
        np.testing.assert_array_equal(full[2:], tail)

    def test_call_within_4_sigma_of_bs(self):
        res = engine.price_vanilla(OPT, 1 << 15, KEY, _cfg())
        assert _z(res.price, BS, res.std_error) < 4

    def test_put_within_4_sigma(self):
        put = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0,
                            kind="put")
        want = BS - 100.0 + 100.0 * np.exp(-0.048790)  # put-call parity
        res = engine.price_vanilla(put, 1 << 15, KEY, _cfg())
        assert _z(res.price, want, res.std_error) < 4

    def test_antithetic_reduces_error_and_stays_unbiased(self):
        plain = engine.price_vanilla(OPT, 1 << 15, KEY, _cfg())
        anti = engine.price_vanilla(OPT, 1 << 15, KEY,
                                    _cfg(antithetic=True))
        assert float(anti.std_error) < float(plain.std_error)
        assert _z(anti.price, BS, anti.std_error) < 4


class TestBasketKernel:
    def test_single_asset_equals_bs(self):
        opt = BasketOption(s=np.array([100.0]), v=np.array([0.2]),
                           w=np.array([1.0]), corr=np.eye(1),
                           d=np.zeros(1), k=100.0, r=0.048790, t=1.0)
        res = engine.price_basket(opt, 1 << 14, KEY, _cfg())
        assert _z(res.price, BS, res.std_error) < 4

    def test_reference_3asset_vs_oracle(self):
        opt = BasketOption.default_reference(3)
        res = engine.price_basket(opt, 1 << 14, KEY, _cfg())
        ora = reference.price_basket(opt, 1 << 16, seed=5)
        se = np.hypot(float(res.std_error), ora.std_error)
        assert _z(res.price, ora.price, se) < 4

    @pytest.mark.slow
    def test_antithetic(self):
        opt = BasketOption.default_reference(3)
        plain = engine.price_basket(opt, 1 << 14, KEY, _cfg())
        anti = engine.price_basket(opt, 1 << 14, KEY, _cfg(antithetic=True))
        assert float(anti.std_error) < float(plain.std_error)


class TestCvaKernel:
    SPEC = CvaSpec(intensity=0.03, lgd=0.6,
                   option=VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0),
                   n_grid=10)

    def test_cva_within_4_sigma_of_closed_form(self):
        res = engine.price_cva(self.SPEC, 1 << 14, KEY, _cfg())
        want = float(mcva.closed_form(self.SPEC))
        assert _z(res.cva, want, res.std_error) < 4

    def test_ee_profile_matches_oracle(self):
        res = engine.price_cva(self.SPEC, 1 << 14, KEY, _cfg())
        ora = reference.price_cva(self.SPEC, 1 << 15, seed=4)
        got = np.asarray(res.expected_exposure)
        want = np.asarray(ora.expected_exposure)
        assert got.shape == want.shape == (self.SPEC.n_grid,)
        # Exposures are ~10; both sides are MC with se ~ 0.1 at these sizes.
        np.testing.assert_allclose(got, want, rtol=0.06)

    @pytest.mark.slow
    def test_profile_shape_from_kernel(self):
        from mctpu.types import CvaPortfolioSpec
        port = CvaPortfolioSpec.from_single(self.SPEC)
        plan = kcva.make_plan(1 << 12, num_blocks=2, rows=8,
                              antithetic=False)
        out, ee = kcva.pallas_partials(port, 3, 0, plan, plan.num_blocks,
                                       interpret=True)
        assert out.shape == (2, 2)
        assert ee.shape == (2, self.SPEC.n_grid)
        assert np.all(np.isfinite(np.asarray(ee)))


class TestAsianKernel:
    GEO = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=12,
                      average="geometric")

    def test_geometric_within_4_sigma_of_closed_form(self):
        res = engine.price_asian(self.GEO, 1 << 14, KEY, _cfg())
        want = float(masian.closed_form_geometric(self.GEO))
        assert _z(res.price, want, res.std_error) < 4

    def test_arithmetic_between_geometric_and_vanilla(self):
        ari = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=12,
                          average="arithmetic")
        res = engine.price_asian(ari, 1 << 14, KEY, _cfg())
        geo = float(masian.closed_form_geometric(self.GEO))
        vanilla = float(mcmath.bs_call(100.0, 100.0, 0.05, 0.2, 1.0))
        assert geo - 4 * float(res.std_error) < float(res.price) < vanilla


class TestBarrierKernel:
    UO = BarrierOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0,
                       barrier=130.0, n_obs=20, kind="up-and-out")

    def test_within_4_sigma_of_bgk_closed_form(self):
        res = engine.price_barrier(self.UO, 1 << 14, KEY, _cfg())
        b_eff = float(mcmath.barrier_continuity_correction(
            self.UO.barrier, self.UO.s, self.UO.v, self.UO.t,
            self.UO.n_obs, up=True))
        want = float(mcmath.up_and_out_call(
            self.UO.s, self.UO.k, self.UO.r, self.UO.v, self.UO.t, b_eff))
        # BGK correction itself is O(1/sqrt(m)) accurate: allow slop.
        assert abs(float(res.price) - want) < 4 * float(res.std_error) + 0.05

    def test_below_vanilla(self):
        res = engine.price_barrier(self.UO, 1 << 14, KEY, _cfg())
        vanilla = float(mcmath.bs_call(100.0, 100.0, 0.05, 0.2, 1.0))
        assert 0 < float(res.price) < vanilla


class TestHestonKernel:
    HOPT = HestonOption(s=100.0, k=100.0, r=0.03, t=1.0, v0=0.04,
                        kappa=1.5, theta=0.04, xi=0.5, rho=-0.7)

    def test_matches_xla_twin_statistically(self):
        # Same discretized model (16-step Euler), independent streams: the
        # kernel twin must agree within combined MC error.
        pall = engine.price_heston(self.HOPT, 1 << 14, KEY, _cfg(),
                                   n_steps=16)
        xla = engine.price_heston(
            self.HOPT, 1 << 16, jax.random.key(8),
            engine.EngineConfig(num_blocks=8, rows=8, backend="xla"),
            n_steps=16)
        se = np.hypot(float(pall.std_error), float(xla.std_error))
        assert _z(pall.price, float(xla.price), se) < 4

    def test_cf_oracle_with_bias_allowance(self):
        res = engine.price_heston(self.HOPT, 1 << 14, KEY, _cfg(),
                                  n_steps=16)
        want = float(mheston.cf_call_price(self.HOPT))
        # O(dt) Euler bias at 16 steps: allow an absolute bias term.
        assert abs(float(res.price) - want) < 4 * float(res.std_error) + 0.15


class TestMeshInterpret:
    def test_sharded_interpret_equals_local(self, devices):
        if len(devices) < 4:
            pytest.skip("needs 4 virtual devices")
        from mctpu.parallel import path_mesh
        mesh = path_mesh(devices[:4])
        base = engine.price_vanilla(OPT, 1 << 14, KEY, _cfg(num_blocks=8))
        shard = engine.price_vanilla(OPT, 1 << 14, KEY,
                                     _cfg(num_blocks=8, mesh=mesh))
        assert float(base.price) == float(shard.price)


class TestBasketPacking:
    def test_pack_factor(self):
        from mctpu.kernels.basket import pack_factor
        assert pack_factor(1) == (1, 128, 128)
        assert pack_factor(3) == (4, 32, 128)
        assert pack_factor(10) == (16, 8, 128)
        assert pack_factor(64) == (64, 2, 128)
        assert pack_factor(65) == (128, 1, 128)
        assert pack_factor(100) == (128, 1, 128)
        assert pack_factor(130) == (256, 1, 256)

    def test_packed_layout_reproduces_per_path_math(self):
        import jax.numpy as jnp

        from mctpu import math as mcmath
        from mctpu.kernels.basket import pack_assets, pack_factor
        opt = BasketOption.default_reference(3)
        dtype = jnp.float64
        chol = mcmath.cholesky_lower(jnp.asarray(opt.corr, dtype))
        ops = pack_assets(opt.astype(dtype), chol, dtype)
        a_tile, c, width = pack_factor(3)
        rng = np.random.default_rng(0)
        z = jnp.asarray(rng.standard_normal((5, width)), dtype)
        bt = z @ ops["chol_bd"] + ops["d"]
        s_t = ops["s0"] * jnp.exp(ops["drift"] + ops["vol"] * bt)
        basket = np.asarray(s_t @ ops["wsel"])  # (5, c)
        # Reference per-path math on the unpacked slices.
        chol_np = np.asarray(chol)
        w = np.asarray(opt.w)
        s0 = np.asarray(opt.s)
        v = np.asarray(opt.v)
        d = np.asarray(opt.d)
        for row in range(5):
            for p in range(c):
                zp = np.asarray(z)[row, p * a_tile:p * a_tile + 3]
                btp = chol_np @ zp + d
                stp = s0 * np.exp((opt.r - 0.5 * v * v) * opt.t
                                  + v * np.sqrt(opt.t) * btp)
                np.testing.assert_allclose(basket[row, p], w @ stp,
                                           rtol=1e-12)

    @pytest.mark.slow
    def test_wide_basket_fallback_100_assets(self):
        opt = BasketOption.default_reference(100)
        res = engine.price_basket(opt, 1 << 13, KEY, _cfg(num_blocks=2))
        ora = reference.price_basket(opt, 1 << 15, seed=9)
        se = np.hypot(float(res.std_error), ora.std_error)
        assert _z(res.price, ora.price, se) < 4
