"""Rainbow (max/min) options: Stulz closed form + identities + oracle."""
import jax
import numpy as np
import pytest

from mctpu import engine, math as mcmath, reference
from mctpu.types import RainbowOption

KEY = jax.random.key(616)
CFG = engine.EngineConfig(num_blocks=8, rows=8, backend="xla")
CORR2 = np.array([[1.0, 0.3], [0.3, 1.0]])


def _opt(kind="max", k=100.0, corr=CORR2, s=(100.0, 95.0), v=(0.2, 0.3)):
    return RainbowOption(s=np.asarray(s), v=np.asarray(v), corr=corr,
                         k=k, r=0.05, t=1.0, kind=kind)


class TestTwoAssetStulz:
    def test_max_call_matches_closed_form(self):
        res = engine.price_rainbow(_opt("max"), 1 << 18, KEY, CFG)
        cf = float(mcmath.rainbow_max_call(100.0, 95.0, 100.0, 0.05, 0.2,
                                           0.3, 0.3, 1.0))
        assert abs(float(res.price) - cf) < 4 * float(res.std_error)

    def test_min_call_matches_closed_form(self):
        res = engine.price_rainbow(_opt("min"), 1 << 18, KEY, CFG)
        cf = float(mcmath.rainbow_min_call(100.0, 95.0, 100.0, 0.05, 0.2,
                                           0.3, 0.3, 1.0))
        assert abs(float(res.price) - cf) < 4 * float(res.std_error)

    def test_k0_martingale_identity(self):
        # max + min = S1 + S2 pathwise, so with common draws the two MC
        # estimates sum to the sampled forwards exactly; in expectation
        # they sum to S1_0 + S2_0.
        a = engine.price_rainbow(_opt("max", k=1e-9), 1 << 18, KEY, CFG)
        b = engine.price_rainbow(_opt("min", k=1e-9), 1 << 18, KEY, CFG)
        se = np.hypot(float(a.std_error), float(b.std_error))
        assert abs(float(a.price) + float(b.price) - 195.0) < 4 * se

    @pytest.mark.slow
    def test_bracketed_by_vanillas(self):
        # min-call <= each vanilla call <= max-call
        mx = engine.price_rainbow(_opt("max"), 1 << 17, KEY, CFG)
        mn = engine.price_rainbow(_opt("min"), 1 << 17, KEY, CFG)
        c1 = float(mcmath.bs_call(100.0, 100.0, 0.05, 0.2, 1.0))
        c2 = float(mcmath.bs_call(95.0, 100.0, 0.05, 0.3, 1.0))
        assert float(mx.price) > max(c1, c2)
        assert float(mn.price) < min(c1, c2)


class TestManyAssets:
    def test_five_assets_vs_numpy_oracle(self):
        rho = 0.4
        corr = np.full((5, 5), rho)
        np.fill_diagonal(corr, 1.0)
        opt = RainbowOption(s=np.full(5, 100.0),
                            v=np.array([0.2, 0.25, 0.3, 0.2, 0.35]),
                            corr=corr, k=100.0, r=0.05, t=1.0, kind="max")
        res = engine.price_rainbow(opt, 1 << 17, KEY, CFG)
        ora = reference.price_rainbow(opt, 1 << 17, seed=6)
        se = np.hypot(float(res.std_error), ora.std_error)
        assert abs(float(res.price) - ora.price) < 4 * se

    def test_min_of_five_vs_oracle(self):
        corr = np.eye(5)
        opt = RainbowOption(s=np.full(5, 100.0), v=np.full(5, 0.2),
                            corr=corr, k=90.0, r=0.05, t=1.0, kind="min")
        res = engine.price_rainbow(opt, 1 << 17, KEY, CFG)
        ora = reference.price_rainbow(opt, 1 << 17, seed=7)
        se = np.hypot(float(res.std_error), ora.std_error)
        assert abs(float(res.price) - ora.price) < 4 * se

    def test_sixteen_assets_vs_oracle_packed_path(self):
        # a = 16 > ASSET_MAJOR_MAX exercises the packed lane-butterfly
        # kernel (small baskets route to the asset-major layout).
        rho = 0.3
        corr = np.full((16, 16), rho)
        np.fill_diagonal(corr, 1.0)
        opt = RainbowOption(s=np.full(16, 100.0), v=np.full(16, 0.25),
                            corr=corr, k=110.0, r=0.05, t=1.0, kind="max")
        res = engine.price_rainbow(opt, 1 << 16, KEY, CFG)
        ora = reference.price_rainbow(opt, 1 << 16, seed=8)
        se = np.hypot(float(res.std_error), ora.std_error)
        assert abs(float(res.price) - ora.price) < 4 * se

    @pytest.mark.slow
    def test_single_asset_is_vanilla(self):
        opt = RainbowOption(s=np.array([100.0]), v=np.array([0.2]),
                            corr=np.eye(1), k=100.0, r=0.05, t=1.0)
        res = engine.price_rainbow(opt, 1 << 17, KEY, CFG)
        bs = float(mcmath.bs_call(100.0, 100.0, 0.05, 0.2, 1.0))
        assert abs(float(res.price) - bs) < 4 * float(res.std_error)


class TestBackends:
    @pytest.mark.slow
    def test_pallas_interpret_twin(self):
        icfg = engine.EngineConfig(num_blocks=4, rows=8, backend="pallas",
                                   interpret=True)
        for kind in ("max", "min"):
            res = engine.price_rainbow(_opt(kind), 1 << 14, KEY, icfg)
            cf = float((mcmath.rainbow_max_call if kind == "max"
                        else mcmath.rainbow_min_call)(
                100.0, 95.0, 100.0, 0.05, 0.2, 0.3, 0.3, 1.0))
            assert abs(float(res.price) - cf) < 4 * float(res.std_error)
            assert np.isfinite(float(res.price))

    @pytest.mark.slow
    def test_shard_invariant(self):
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        from mctpu.parallel import path_mesh
        base = engine.price_rainbow(_opt("max"), 1 << 14, KEY, CFG)
        cfg8 = engine.EngineConfig(num_blocks=8, rows=8, backend="xla",
                                   mesh=path_mesh(devs[:8]))
        shard = engine.price_rainbow(_opt("max"), 1 << 14, KEY, cfg8)
        assert float(base.price) == float(shard.price)

    def test_validation(self):
        with pytest.raises(ValueError, match="kind"):
            _opt("median").validate()
