"""Distributed tests on a virtual 8-device CPU mesh (SURVEY.md §4).

The key guarantee: per-block counter RNG + fixed-order combine make results
bitwise identical for every mesh size — resharding a run never changes it.
This replaces (and strengthens) the reference's single-device-only story.
"""
import jax
import numpy as np
import pytest

from mctpu import engine
from mctpu import math as mcmath
from mctpu.parallel import path_mesh
from mctpu.types import (AsianOption, BarrierOption, BasketOption, CvaSpec,
                         HestonOption, VanillaOption)

OPT = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0)
KEY = jax.random.key(99)


def _cfg(mesh=None, **kw):
    return engine.EngineConfig(num_blocks=16, rows=8, backend="xla",
                               mesh=mesh, **kw)


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return path_mesh(devs[:8])


class TestShardInvariance:
    @pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
    def test_vanilla_bitwise_invariant(self, n_dev):
        devs = jax.devices()
        if len(devs) < n_dev:
            pytest.skip("not enough devices")
        base = engine.price_vanilla(OPT, 1 << 18, KEY, _cfg(mesh=None))
        mesh = path_mesh(devs[:n_dev])
        shard = engine.price_vanilla(OPT, 1 << 18, KEY, _cfg(mesh=mesh))
        assert float(base.price) == float(shard.price)
        assert float(base.ci) == float(shard.ci)

    @pytest.mark.slow
    def test_basket_bitwise_invariant(self, mesh8):
        opt = BasketOption.default_reference(3)
        base = engine.price_basket(opt, 1 << 17, KEY, _cfg(mesh=None))
        shard = engine.price_basket(opt, 1 << 17, KEY, _cfg(mesh=mesh8))
        assert float(base.price) == float(shard.price)

    def test_cva_bitwise_invariant(self, mesh8):
        spec = CvaSpec(intensity=0.03, lgd=0.6,
                       option=VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0),
                       n_grid=10)
        base = engine.price_cva(spec, 1 << 15, KEY, _cfg(mesh=None))
        shard = engine.price_cva(spec, 1 << 15, KEY, _cfg(mesh=mesh8))
        assert float(base.cva) == float(shard.cva)
        np.testing.assert_array_equal(np.asarray(base.expected_exposure),
                                      np.asarray(shard.expected_exposure))

    @pytest.mark.slow
    def test_asian_bitwise_invariant(self, mesh8):
        opt = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=12)
        base = engine.price_asian(opt, 1 << 15, KEY, _cfg(mesh=None))
        shard = engine.price_asian(opt, 1 << 15, KEY, _cfg(mesh=mesh8))
        assert float(base.price) == float(shard.price)
        assert float(base.ci) == float(shard.ci)

    def test_barrier_bitwise_invariant(self, mesh8):
        opt = BarrierOption(100.0, 100.0, 0.05, 0.2, 1.0, barrier=130.0,
                            n_obs=12, kind="up-and-out")
        base = engine.price_barrier(opt, 1 << 15, KEY, _cfg(mesh=None))
        shard = engine.price_barrier(opt, 1 << 15, KEY, _cfg(mesh=mesh8))
        assert float(base.price) == float(shard.price)
        assert float(base.ci) == float(shard.ci)

    @pytest.mark.slow
    def test_heston_bitwise_invariant(self, mesh8):
        opt = HestonOption(s=100.0, k=100.0, r=0.03, t=1.0, v0=0.04,
                           kappa=1.5, theta=0.04, xi=0.5, rho=-0.7)
        base = engine.price_heston(opt, 1 << 15, KEY, _cfg(mesh=None),
                                   n_steps=16)
        shard = engine.price_heston(opt, 1 << 15, KEY, _cfg(mesh=mesh8),
                                    n_steps=16)
        assert float(base.price) == float(shard.price)
        assert float(base.ci) == float(shard.ci)

    @pytest.mark.slow
    def test_greeks_vanilla_bitwise_invariant(self, mesh8):
        base = engine.greeks_vanilla(OPT, 1 << 17, KEY, _cfg(mesh=None))
        shard = engine.greeks_vanilla(OPT, 1 << 17, KEY, _cfg(mesh=mesh8))
        for name in ("price", "delta", "vega", "rho", "theta",
                     "gamma", "vanna", "volga"):
            b, s = getattr(base, name), getattr(shard, name)
            assert float(b.price) == float(s.price), name
            assert float(b.ci) == float(s.ci), name

    @pytest.mark.slow
    def test_greeks_basket_bitwise_invariant(self, mesh8):
        opt = BasketOption.default_reference(3)
        base = engine.greeks_basket(opt, 1 << 15, KEY, _cfg(mesh=None))
        shard = engine.greeks_basket(opt, 1 << 15, KEY, _cfg(mesh=mesh8))
        assert float(base.price.price) == float(shard.price.price)
        np.testing.assert_array_equal(np.asarray(base.delta.price),
                                      np.asarray(shard.delta.price))
        np.testing.assert_array_equal(np.asarray(base.vega.ci),
                                      np.asarray(shard.vega.ci))
        assert float(base.rho.price) == float(shard.rho.price)
        assert float(base.theta.price) == float(shard.theta.price)

    def test_sharded_result_is_correct(self, mesh8):
        res = engine.price_vanilla(OPT, 1 << 19, KEY, _cfg(mesh=mesh8))
        bs = float(mcmath.bs_call(OPT.s, OPT.k, OPT.r, OPT.v, OPT.t))
        se = float(res.std_error)
        assert abs(float(res.price) - bs) < 3 * se

    def test_uneven_blocks_rejected(self, mesh8):
        with pytest.raises(ValueError, match="divide"):
            engine.price_vanilla(
                OPT, 1 << 14, KEY,
                engine.EngineConfig(num_blocks=12, rows=8, backend="xla",
                                    mesh=mesh8))
