"""Engine-tier RQMC: accuracy gates, mesh invariance, streamed generation.

The round-2 review flagged the QMC pricers for bypassing the engine
contract; these tests pin the new contract: EngineConfig-driven, replicate
blocks sharded over the mesh with bitwise-invariant results, genuine
accumulator sums, and the Pallas point-generation kernel exercised via
interpret mode (deterministic — no PRNG emulation needed).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mctpu import engine, math as mcmath, qmc_engine, sobol
from mctpu.parallel import path_mesh
from mctpu.types import AsianOption, BasketOption, VanillaOption

OPT = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0)
KEY = jax.random.key(55)
BS = float(mcmath.bs_call(100.0, 100.0, 0.048790, 0.2, 1.0))


def _cfg(**kw):
    kw.setdefault("backend", "xla")
    kw.setdefault("rows", 8)
    return engine.EngineConfig(**kw)


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return path_mesh(devs[:8])


class TestVanillaRqmc:
    def test_unbiased_and_much_tighter_than_mc(self):
        res = qmc_engine.price_vanilla_rqmc(OPT, 1 << 12, KEY, _cfg(),
                                            replicates=16)
        assert abs(float(res.price) - BS) < 4 * float(res.std_error)
        mc = engine.price_vanilla(OPT, res.n_paths, jax.random.key(3),
                                  _cfg(num_blocks=8))
        assert float(res.ci) < float(mc.ci) / 5

    def test_genuine_accumulator_sums(self):
        res = qmc_engine.price_vanilla_rqmc(OPT, 1 << 12, KEY, _cfg(),
                                            replicates=8)
        # sum_p must be the raw undiscounted payoff sum: price ~ disc*sum/n.
        disc = np.exp(-OPT.r * OPT.t)
        assert float(res.price) == pytest.approx(
            disc * float(res.sum_p) / res.n_paths, rel=1e-9)
        assert float(res.sum_p2) > 0

    def test_put_prices_by_parity(self):
        import dataclasses as dc
        put = dc.replace(OPT, kind="put")
        res = qmc_engine.price_vanilla_rqmc(put, 1 << 12, KEY, _cfg(),
                                            replicates=16)
        want = BS - 100.0 + 100.0 * np.exp(-OPT.r * OPT.t)
        assert abs(float(res.price) - want) < 5 * float(res.std_error)

    def test_mesh_bitwise_invariant(self, mesh8):
        base = qmc_engine.price_vanilla_rqmc(OPT, 1 << 12, KEY, _cfg(),
                                             replicates=16)
        shard = qmc_engine.price_vanilla_rqmc(
            OPT, 1 << 12, KEY, _cfg(mesh=mesh8), replicates=16)
        assert float(base.price) == float(shard.price)
        assert float(base.ci) == float(shard.ci)

    def test_pallas_interpret_kernel(self):
        # The Pallas net kernel is deterministic (no PRNG), so interpret
        # mode runs the REAL kernel code on CPU.
        res = qmc_engine.price_vanilla_rqmc(
            OPT, 1 << 10, KEY, _cfg(backend="pallas", interpret=True),
            replicates=8)
        assert abs(float(res.price) - BS) < max(
            5 * float(res.std_error), 2e-3)

    def test_replicates_must_divide_mesh(self, mesh8):
        with pytest.raises(ValueError, match="divide"):
            qmc_engine.price_vanilla_rqmc(OPT, 1 << 10, KEY,
                                          _cfg(mesh=mesh8), replicates=12)


class TestBasketRqmc:
    OPTB = BasketOption.default_reference(3)

    def test_matches_mc(self):
        res = qmc_engine.price_basket_rqmc(self.OPTB, 1 << 12, KEY, _cfg(),
                                           replicates=16)
        mc = engine.price_basket(self.OPTB, 1 << 20, jax.random.key(4),
                                 _cfg(num_blocks=8))
        se = float(jnp.hypot(res.std_error, mc.std_error))
        assert abs(float(res.price) - float(mc.price)) < 4 * se
        assert float(res.ci) < float(mc.ci)

    @pytest.mark.slow
    def test_mesh_bitwise_invariant(self, mesh8):
        base = qmc_engine.price_basket_rqmc(self.OPTB, 1 << 11, KEY, _cfg(),
                                            replicates=16)
        shard = qmc_engine.price_basket_rqmc(
            self.OPTB, 1 << 11, KEY, _cfg(mesh=mesh8), replicates=16)
        assert float(base.price) == float(shard.price)

    @pytest.mark.slow
    def test_pallas_interpret_kernel(self):
        res = qmc_engine.price_basket_rqmc(
            self.OPTB, 1 << 10, KEY, _cfg(backend="pallas", interpret=True),
            replicates=8)
        mc = engine.price_basket(self.OPTB, 1 << 18, jax.random.key(4),
                                 _cfg(num_blocks=8))
        se = float(jnp.hypot(res.std_error, mc.std_error))
        assert abs(float(res.price) - float(mc.price)) < max(5 * se, 3e-3)

    @pytest.mark.slow
    def test_wide_basket_packs(self):
        opt = BasketOption.equicorrelated(10, rho=0.3)
        res = qmc_engine.price_basket_rqmc(opt, 1 << 11, KEY, _cfg(),
                                           replicates=8)
        mc = engine.price_basket(opt, 1 << 19, jax.random.key(6),
                                 _cfg(num_blocks=8))
        se = float(jnp.hypot(res.std_error, mc.std_error))
        assert abs(float(res.price) - float(mc.price)) < 5 * se


class TestAsianRqmc:
    GEO = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=12,
                      average="geometric")

    def test_matches_geometric_closed_form(self):
        res = qmc_engine.price_asian_rqmc(self.GEO, 1 << 11, KEY, _cfg(),
                                          replicates=8)
        want = float(mcmath.geometric_asian_call(100.0, 100.0, 0.05, 0.2,
                                                 1.0, 12))
        assert abs(float(res.price) - want) < 5 * float(res.std_error)

    @pytest.mark.slow
    def test_mesh_bitwise_invariant(self, mesh8):
        base = qmc_engine.price_asian_rqmc(self.GEO, 1 << 10, KEY, _cfg(),
                                           replicates=8)
        shard = qmc_engine.price_asian_rqmc(
            self.GEO, 1 << 10, KEY, _cfg(mesh=mesh8), replicates=8)
        assert float(base.price) == float(shard.price)

    @pytest.mark.slow
    def test_daily_year_grid(self):
        geo = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=252,
                          average="geometric")
        res = qmc_engine.price_asian_rqmc(geo, 1 << 10, KEY, _cfg(),
                                          replicates=8)
        want = float(mcmath.geometric_asian_call(100.0, 100.0, 0.05, 0.2,
                                                 1.0, 252))
        assert abs(float(res.price) - want) < 5 * float(res.std_error)

    def test_pallas_kernel_matches_xla_twin(self):
        # Round-4: the fused Pallas bridge kernel (interpret mode) must
        # track the XLA twin to f32 reassociation noise.
        icfg = engine.EngineConfig(num_blocks=4, rows=8, backend="pallas",
                                   interpret=True)
        ri = qmc_engine.price_asian_rqmc(self.GEO, 1 << 10, KEY, icfg,
                                         replicates=4)
        rx = qmc_engine.price_asian_rqmc(self.GEO, 1 << 10, KEY, _cfg(),
                                         replicates=4)
        assert abs(float(ri.price) - float(rx.price)) < 1e-4
        want = float(mcmath.geometric_asian_call(100.0, 100.0, 0.05, 0.2,
                                                 1.0, 12))
        assert abs(float(ri.price) - want) < 8 * float(ri.std_error)

    @pytest.mark.slow
    def test_pallas_kernel_arithmetic_average(self):
        import dataclasses
        ari = dataclasses.replace(self.GEO, average="arithmetic")
        icfg = engine.EngineConfig(num_blocks=4, rows=8, backend="pallas",
                                   interpret=True)
        ri = qmc_engine.price_asian_rqmc(ari, 1 << 10, KEY, icfg,
                                         replicates=4)
        rx = qmc_engine.price_asian_rqmc(ari, 1 << 10, KEY, _cfg(),
                                         replicates=4)
        assert abs(float(ri.price) - float(rx.price)) < 1e-4


class TestEstimatorContract:
    def test_f32_accuracy_floor_applies(self):
        """A huge f32 net must not claim a CI below the f32 eval accuracy."""
        res = qmc_engine.price_vanilla_rqmc(OPT, 1 << 16, KEY, _cfg(),
                                            replicates=16)
        assert float(res.std_error) >= (
            qmc_engine.F32_ACCURACY_FLOOR * abs(float(res.price)) * 0.999)

    def test_f64_has_no_floor(self):
        from mctpu.types import Precision
        res = qmc_engine.price_vanilla_rqmc(
            OPT, 1 << 20, KEY, _cfg(precision=Precision.F64),
            replicates=8)
        assert float(res.std_error) < (
            qmc_engine.F32_ACCURACY_FLOOR * abs(float(res.price)))
        assert abs(float(res.price) - BS) < 5 * max(
            float(res.std_error), 1e-7)


class TestSobolChunkSplit:
    """The hoisted LOW/CONST construction is pure XOR reassociation of the
    30-bit form: the integers must be BITWISE identical for every chunk."""

    def test_split_equals_plain_scalar_dims(self):
        v0 = qmc_engine._directions_np()[0]
        v_bits = [jnp.uint32(int(v0[b])) for b in range(qmc_engine._BITS)]
        shift = jnp.uint32(0x9E3779B9)
        rows, lanes = 8, qmc_engine.LANES
        lb = qmc_engine._chunk_log2(rows * lanes)
        assert lb == 10
        j = (jax.lax.broadcasted_iota(jnp.uint32, (rows, lanes), 0)
             * jnp.uint32(lanes)
             + jax.lax.broadcasted_iota(jnp.uint32, (rows, lanes), 1))
        low = qmc_engine._sobol_low_tile(j, v_bits, lb)
        for chunk in (0, 1, 2, 7, 31, 1023, 2**19, 2**20 - 3):
            base = jnp.uint32(chunk) * jnp.uint32(rows * lanes)
            plain = qmc_engine._sobol_tile(base + j, v_bits, shift)
            split = low ^ qmc_engine._sobol_chunk_const(base, v_bits,
                                                        shift, lb)
            np.testing.assert_array_equal(np.asarray(plain),
                                          np.asarray(split))

    def test_split_equals_plain_row_dims(self):
        """Multi-dim (per-lane direction rows), the packed-basket layout."""
        rng = np.random.default_rng(3)
        m = 16
        v = qmc_engine._directions_np()[:m]  # (m, 30)
        v_bits = [jnp.asarray(v[:, b][None, :]) for b in range(30)]
        shift = jnp.asarray(
            rng.integers(0, 2**32, size=(1, m), dtype=np.uint32))
        pts = 1 << 12
        lb = qmc_engine._chunk_log2(pts)
        j = jnp.arange(pts, dtype=jnp.uint32)[:, None]
        low = qmc_engine._sobol_low_tile(j, v_bits, lb)
        for chunk in (0, 5, 255, 2**17 + 9):
            base = jnp.uint32(chunk) * jnp.uint32(pts)
            plain = qmc_engine._sobol_tile(base + j, v_bits, shift)
            split = low ^ qmc_engine._sobol_chunk_const(base, v_bits,
                                                        shift, lb)
            np.testing.assert_array_equal(np.asarray(plain),
                                          np.asarray(split))

    def test_non_power_of_two_chunk_disables_split(self):
        assert qmc_engine._chunk_log2(3 * 128) is None
        assert qmc_engine._chunk_log2(1) is None


class TestVanillaGreeksRqmc:
    """The full Greek surface on Sobol nets: unbiased per output, much
    tighter than the plain engine kernel, shard-invariant."""

    CF = {k: float(v) for k, v in
          mcmath.bs_greeks(100.0, 100.0, 0.048790, 0.2, 1.0).items()}
    NAMES = ("price", "delta", "vega", "rho", "theta", "gamma", "vanna",
             "volga")

    def test_call_matches_bs_all_outputs(self):
        g = qmc_engine.greeks_vanilla_rqmc(OPT, 1 << 13, KEY, _cfg(),
                                           replicates=16)
        for nm in self.NAMES:
            r = getattr(g, nm)
            z = (float(r.price) - self.CF[nm]) / max(float(r.std_error),
                                                     1e-15)
            assert abs(z) < 4.0, (nm, float(r.price), self.CF[nm], z)

    def test_put_via_signed_indicator(self):
        popt = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0,
                             kind="put")
        g = qmc_engine.greeks_vanilla_rqmc(popt, 1 << 13, KEY, _cfg(),
                                           replicates=16)
        disc = np.exp(-0.048790)
        want = dict(self.CF)
        want["price"] -= 100.0 - 100.0 * disc
        want["delta"] -= 1.0
        want["rho"] -= 100.0 * disc
        want["theta"] -= 0.048790 * 100.0 * disc
        # gamma/vanna/volga are parity-equal for the put.
        for nm in self.NAMES:
            r = getattr(g, nm)
            z = (float(r.price) - want[nm]) / max(float(r.std_error),
                                                  1e-15)
            assert abs(z) < 4.0, (nm, float(r.price), want[nm], z)

    @pytest.mark.slow
    def test_ci_advantage_over_plain_mc(self):
        """At equal total points the RQMC delta CI must be at least 5x
        tighter (measured 20-80x; 5x is the conservative gate)."""
        n_pts, reps = 1 << 13, 16
        g = qmc_engine.greeks_vanilla_rqmc(OPT, n_pts, KEY, _cfg(),
                                           replicates=reps)
        mc = engine.greeks_vanilla(OPT, reps * n_pts, KEY,
                                   _cfg(num_blocks=16))
        for nm in ("price", "delta", "vega", "gamma"):
            ratio = float(getattr(mc, nm).std_error) / max(
                float(getattr(g, nm).std_error), 1e-15)
            assert ratio > 5.0, (nm, ratio)

    @pytest.mark.slow
    def test_mesh_bitwise_invariant(self, mesh8):
        base = qmc_engine.greeks_vanilla_rqmc(OPT, 1 << 11, KEY, _cfg(),
                                              replicates=16)
        shard = qmc_engine.greeks_vanilla_rqmc(
            OPT, 1 << 11, KEY, _cfg(mesh=mesh8), replicates=16)
        for nm in self.NAMES:
            assert float(getattr(base, nm).price) == float(
                getattr(shard, nm).price), nm

    @pytest.mark.slow
    def test_pallas_interpret_kernel(self):
        x = qmc_engine.greeks_vanilla_rqmc(OPT, 1 << 11, KEY, _cfg(),
                                           replicates=8)
        p = qmc_engine.greeks_vanilla_rqmc(
            OPT, 1 << 11, KEY,
            _cfg(backend="pallas", interpret=True), replicates=8)
        # The Sobol construction is deterministic: same nets, same sums
        # up to f32 association -> prices agree far inside the CI.
        for nm in self.NAMES:
            xa, pa = getattr(x, nm), getattr(p, nm)
            tol = 3 * max(float(xa.std_error), 1e-12) + 1e-5 * abs(
                float(xa.price))
            assert abs(float(xa.price) - float(pa.price)) < tol, nm


class TestGilesPpf:
    """Accuracy gates for the hand-rolled f32 inverse CDF
    (mctpu.math.norm_ppf_f32 / erf_inv_f32) that replaced lax.erf_inv in
    the f32 RQMC paths (round-5: 1.34x measured in-kernel throughput)."""

    def test_norm_ppf_f32_matches_f64_ndtri(self):
        import numpy as np
        from scipy.special import ndtri

        from mctpu import math as mcmath
        u = np.linspace(1e-6, 1.0 - 1e-6, 1 << 17).astype(np.float32)
        got = np.asarray(mcmath.norm_ppf_f32(jnp.asarray(u)))
        want = ndtri(u.astype(np.float64))
        # Same accuracy class as f32 erf_inv: 5e-5 max abs error over the
        # clipped domain (tails included).
        assert np.max(np.abs(got - want)) < 5e-5
        # Relative accuracy in the body.
        body = (u > 0.01) & (u < 0.99) & (np.abs(want) > 0.05)
        rel = np.abs(got[body] - want[body]) / np.abs(want[body])
        assert np.max(rel) < 2e-4

    def test_norm_ppf_f32_tail_behaviour(self):
        import numpy as np

        from mctpu import math as mcmath
        # Clipped at 1e-7: finite, symmetric, monotone.
        u = jnp.asarray([0.0, 1e-9, 1e-7, 0.5, 1.0], jnp.float32)
        z = np.asarray(mcmath.norm_ppf_f32(u))
        assert np.isfinite(z).all()
        assert abs(z[3]) < 1e-6  # median -> 0
        assert z[0] == z[1] == z[2]  # clip floor
        assert abs(z[0] - (-5.199)) < 0.05  # ndtri(1e-7) = -5.199
        # Exact antisymmetry on exactly-representable pairs (u, 1-u):
        # 4u(1-u) commutes and x negates, so the values negate bitwise.
        for ulo in (2.0 ** -20, 2.0 ** -7, 0.25, 0.375):
            lo = float(mcmath.norm_ppf_f32(jnp.float32(ulo)))
            hi = float(mcmath.norm_ppf_f32(jnp.float32(1.0 - ulo)))
            assert lo == -hi, ulo

    def test_erf_inv_f32_matches_lax_erf_inv(self):
        import numpy as np

        from mctpu import math as mcmath
        x = jnp.linspace(-0.999999, 0.999999, 1 << 16, dtype=jnp.float32)
        a = np.asarray(mcmath.erf_inv_f32(x))
        b = np.asarray(jax.lax.erf_inv(x))
        assert np.max(np.abs(a - b)) < 5e-5  # shared coefficient family

    def test_rqmc_price_still_unbiased(self):
        # End-to-end: the swapped ppf keeps the vanilla RQMC price on the
        # closed form (f32 XLA twin exercises norm_ppf_f32).
        import numpy as np

        from mctpu import engine, math as mcmath, qmc_engine
        from mctpu.types import VanillaOption
        opt = VanillaOption(100.0, 100.0, 0.048790, 0.2, 1.0)
        from mctpu.types import Precision
        cfg = engine.EngineConfig(num_blocks=8, rows=8, backend="xla",
                                  precision=Precision.F32)
        res = qmc_engine.price_vanilla_rqmc(opt, 1 << 14, jax.random.key(5),
                                            cfg, replicates=8)
        bs = float(mcmath.bs_call(100.0, 100.0, 0.048790, 0.2, 1.0))
        assert abs(float(res.price) - bs) < max(
            3 * float(res.std_error), 3e-4 * bs)
