"""Multi-asset walk products: basket-Asian and basket-barrier.

Degenerate limits tie the new kernels back to already-validated engines
(single-asset Asian, terminal basket); the NumPy oracle cross-checks the
correlated case with an independent RNG.
"""
import jax
import numpy as np
import pytest

from mctpu import engine, reference
from mctpu.types import (AsianOption, BasketAsianOption, BasketBarrierOption,
                         BasketOption)

KEY = jax.random.key(4242)
CFG = engine.EngineConfig(num_blocks=8, rows=8, backend="xla")
ICFG = engine.EngineConfig(num_blocks=4, rows=8, backend="pallas",
                           interpret=True)


def _one_asset_basket():
    return BasketOption(s=np.array([100.0]), v=np.array([0.2]),
                        w=np.array([1.0]), corr=np.eye(1), d=np.zeros(1),
                        k=100.0, r=0.05, t=1.0)


def _z(a, b, se):
    return abs(float(a) - float(b)) / se


class TestBasketAsian:
    @pytest.mark.slow
    def test_single_asset_equals_plain_asian(self):
        opt = BasketAsianOption(_one_asset_basket(), n_obs=12)
        res = engine.price_basket_asian(opt, 1 << 17, KEY, CFG)
        single = engine.price_asian(
            AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=12),
            1 << 17, jax.random.key(5), CFG)
        se = np.hypot(float(res.std_error), float(single.std_error))
        assert _z(res.price, single.price, se) < 4

    @pytest.mark.slow
    def test_one_observation_is_terminal_basket(self):
        bk = BasketOption.default_reference(3)
        res = engine.price_basket_asian(BasketAsianOption(bk, n_obs=1),
                                        1 << 17, KEY, CFG)
        term = engine.price_basket(bk, 1 << 17, jax.random.key(6), CFG)
        se = np.hypot(float(res.std_error), float(term.std_error))
        assert _z(res.price, term.price, se) < 4

    def test_correlated_vs_numpy_oracle(self):
        opt = BasketAsianOption(BasketOption.default_reference(3), n_obs=12)
        res = engine.price_basket_asian(opt, 1 << 17, KEY, CFG)
        ora = reference.price_basket_asian(opt, 1 << 16, seed=7)
        se = np.hypot(float(res.std_error), ora.std_error)
        assert _z(res.price, ora.price, se) < 4

    @pytest.mark.slow
    def test_pallas_interpret_twin(self):
        opt = BasketAsianOption(BasketOption.default_reference(3), n_obs=12)
        res = engine.price_basket_asian(opt, 1 << 14, KEY, ICFG)
        ora = reference.price_basket_asian(opt, 1 << 16, seed=7)
        se = np.hypot(float(res.std_error), ora.std_error)
        assert _z(res.price, ora.price, se) < 4

    def test_below_terminal_basket_price(self):
        # Averaging lowers effective vol: Asian < vanilla on the same basket.
        bk = BasketOption.default_reference(3)
        asian = engine.price_basket_asian(BasketAsianOption(bk, n_obs=12),
                                          1 << 17, KEY, CFG)
        term = engine.price_basket(bk, 1 << 17, KEY, CFG)
        assert float(asian.price) < float(term.price)

    @pytest.mark.slow
    def test_shard_invariant(self):
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        from mctpu.parallel import path_mesh
        opt = BasketAsianOption(BasketOption.default_reference(3), n_obs=6)
        base = engine.price_basket_asian(opt, 1 << 14, KEY, CFG)
        cfg8 = engine.EngineConfig(num_blocks=8, rows=8, backend="xla",
                                   mesh=path_mesh(devs[:8]))
        shard = engine.price_basket_asian(opt, 1 << 14, KEY, cfg8)
        assert float(base.price) == float(shard.price)


class TestBasketBarrier:
    def test_huge_barrier_equals_terminal_basket(self):
        bk = BasketOption.default_reference(3)
        res = engine.price_basket_barrier(
            BasketBarrierOption(bk, barrier=1e7, n_obs=12), 1 << 17, KEY, CFG)
        term = engine.price_basket(bk, 1 << 17, jax.random.key(6), CFG)
        se = np.hypot(float(res.std_error), float(term.std_error))
        assert _z(res.price, term.price, se) < 4

    def test_correlated_vs_numpy_oracle(self):
        opt = BasketBarrierOption(BasketOption.default_reference(3),
                                  barrier=120.0, n_obs=12)
        res = engine.price_basket_barrier(opt, 1 << 17, KEY, CFG)
        ora = reference.price_basket_barrier(opt, 1 << 16, seed=8)
        se = np.hypot(float(res.std_error), ora.std_error)
        assert _z(res.price, ora.price, se) < 4

    @pytest.mark.slow
    def test_pallas_interpret_twin(self):
        opt = BasketBarrierOption(BasketOption.default_reference(3),
                                  barrier=120.0, n_obs=12)
        res = engine.price_basket_barrier(opt, 1 << 14, KEY, ICFG)
        ora = reference.price_basket_barrier(opt, 1 << 16, seed=8)
        se = np.hypot(float(res.std_error), ora.std_error)
        assert _z(res.price, ora.price, se) < 4

    @pytest.mark.slow
    def test_monotone_in_barrier_and_below_vanilla(self):
        bk = BasketOption.default_reference(3)
        prices = [float(engine.price_basket_barrier(
            BasketBarrierOption(bk, barrier=b, n_obs=12), 1 << 16, KEY,
            CFG).price) for b in (110.0, 120.0, 140.0)]
        assert prices[0] < prices[1] < prices[2]
        term = engine.price_basket(bk, 1 << 16, KEY, CFG)
        assert prices[-1] < float(term.price)

    def test_validation(self):
        bk = BasketOption.default_reference(3)
        with pytest.raises(ValueError, match="knocked out"):
            BasketBarrierOption(bk, barrier=90.0, n_obs=12).validate()
        with pytest.raises(ValueError, match="kind"):
            BasketBarrierOption(bk, barrier=120.0, n_obs=12,
                                kind="sideways").validate()
