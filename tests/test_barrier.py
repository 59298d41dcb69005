"""Barrier option tests: degenerate limits, BGK-corrected closed form."""
import jax
import numpy as np
import pytest

from mctpu import engine, math as mcmath
from mctpu.types import BarrierOption

KEY = jax.random.key(909)
CFG = engine.EngineConfig(num_blocks=8, rows=8, backend="xla")
UO = BarrierOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0, barrier=130.0,
                   n_obs=50, kind="up-and-out")


class TestClosedForm:
    def test_huge_barrier_is_vanilla(self):
        got = float(mcmath.up_and_out_call(100.0, 100.0, 0.05, 0.2, 1.0,
                                           1e7))
        want = float(mcmath.bs_call(100.0, 100.0, 0.05, 0.2, 1.0))
        assert got == pytest.approx(want, rel=1e-9)

    def test_knocked_out_regions_are_zero(self):
        assert float(mcmath.up_and_out_call(130.0, 100.0, 0.05, 0.2, 1.0,
                                            120.0)) == 0.0
        assert float(mcmath.up_and_out_call(100.0, 130.0, 0.05, 0.2, 1.0,
                                            120.0)) == 0.0

    def test_monotone_in_barrier(self):
        prices = [float(mcmath.up_and_out_call(100.0, 100.0, 0.05, 0.2,
                                               1.0, b))
                  for b in (110.0, 120.0, 140.0, 200.0)]
        assert all(a < b for a, b in zip(prices, prices[1:]))

    def test_below_vanilla(self):
        uo = float(mcmath.up_and_out_call(100.0, 100.0, 0.05, 0.2, 1.0,
                                          130.0))
        vanilla = float(mcmath.bs_call(100.0, 100.0, 0.05, 0.2, 1.0))
        assert 0 < uo < vanilla


class TestEngine:
    def test_matches_bgk_corrected_closed_form(self):
        res = engine.price_barrier(UO, 1 << 18, KEY, CFG)
        b_eff = float(mcmath.barrier_continuity_correction(
            UO.barrier, UO.s, UO.v, UO.t, UO.n_obs, up=True))
        want = float(mcmath.up_and_out_call(UO.s, UO.k, UO.r, UO.v, UO.t,
                                            b_eff))
        se = float(res.std_error)
        # BGK is O(1/sqrt(m)) accurate; allow MC error + 1% correction bias.
        assert abs(float(res.price) - want) < 3 * se + 0.01 * want

    def test_huge_barrier_matches_vanilla_mc(self):
        far = BarrierOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0,
                            barrier=1e6, n_obs=10, kind="up-and-out")
        res = engine.price_barrier(far, 1 << 17, KEY, CFG)
        want = float(mcmath.bs_call(100.0, 100.0, 0.05, 0.2, 1.0))
        se = float(res.std_error)
        assert abs(float(res.price) - want) < 4 * se

    def test_down_and_out_far_barrier_is_vanilla(self):
        do = BarrierOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0,
                           barrier=1e-3, n_obs=10, kind="down-and-out")
        res = engine.price_barrier(do, 1 << 17, KEY, CFG)
        want = float(mcmath.bs_call(100.0, 100.0, 0.05, 0.2, 1.0))
        se = float(res.std_error)
        assert abs(float(res.price) - want) < 4 * se

    @pytest.mark.slow
    def test_more_observations_knock_out_more(self):
        coarse = engine.price_barrier(
            BarrierOption(100.0, 100.0, 0.05, 0.2, 1.0, 120.0, 5), 1 << 17,
            KEY, CFG)
        fine = engine.price_barrier(
            BarrierOption(100.0, 100.0, 0.05, 0.2, 1.0, 120.0, 100), 1 << 17,
            KEY, CFG)
        assert float(fine.price) < float(coarse.price)

    @pytest.mark.slow
    def test_antithetic(self):
        cfg_a = engine.EngineConfig(num_blocks=8, rows=8, backend="xla",
                                    antithetic=True)
        anti = engine.price_barrier(UO, 1 << 16, KEY, cfg_a)
        plain = engine.price_barrier(UO, 1 << 16, KEY, CFG)
        assert float(anti.std_error) < float(plain.std_error)

    def test_validation(self):
        with pytest.raises(ValueError, match="knocked out"):
            BarrierOption(130.0, 100.0, 0.05, 0.2, 1.0, 120.0).validate()
        with pytest.raises(ValueError, match="kind"):
            BarrierOption(100.0, 100.0, 0.05, 0.2, 1.0, 120.0,
                          kind="sideways").validate()
