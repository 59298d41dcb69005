"""NumPy oracle self-tests: the oracle must itself be statistically sound
before it can anchor the TPU engines (SURVEY.md §4: golden tier)."""
import numpy as np
import pytest

from mctpu import math as mcmath
from mctpu import reference
from mctpu.models import cva as mcva
from mctpu.types import BasketOption, CvaSpec, VanillaOption

OPT = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0)  # vanillaOpt.cu:22-26
CVA_OPT = VanillaOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0)  # cvaOpt.cu:24-28


def test_vanilla_within_ci_of_bs():
    res = reference.price_vanilla(OPT, 1 << 20, seed=0)
    bs = float(mcmath.bs_call(OPT.s, OPT.k, OPT.r, OPT.v, OPT.t))
    assert abs(res.price - bs) < 3 * res.std_error


def test_vanilla_antithetic_reduces_error():
    plain = reference.price_vanilla(OPT, 1 << 18, seed=1)
    anti = reference.price_vanilla(OPT, 1 << 18, seed=1, antithetic=True)
    assert anti.std_error < plain.std_error
    bs = float(mcmath.bs_call(OPT.s, OPT.k, OPT.r, OPT.v, OPT.t))
    assert abs(anti.price - bs) < 4 * anti.std_error


def test_basket_single_asset_degenerates_to_vanilla():
    # A 1-asset basket with weight 1 IS the vanilla option: closed form applies.
    opt = BasketOption(
        s=np.array([100.0]), v=np.array([0.2]), w=np.array([1.0]),
        corr=np.eye(1), d=np.zeros(1), k=100.0, r=0.048790, t=1.0,
    )
    res = reference.price_basket(opt, 1 << 20, seed=2)
    bs = float(mcmath.bs_call(100.0, 100.0, 0.048790, 0.2, 1.0))
    assert abs(res.price - bs) < 3 * res.std_error


def test_basket_reference_config_sane():
    opt = BasketOption.default_reference(3)
    res = reference.price_basket(opt, 1 << 20, seed=3)
    # Strongly negatively correlated equal-weight basket: variance of the
    # basket is far below single-asset variance, so the price sits well below
    # the vanilla price but above intrinsic (0).
    assert 0.0 < res.price < 10.0
    assert res.ci < 0.05


def test_cva_within_ci_of_closed_form():
    spec = CvaSpec(intensity=0.03, lgd=0.6, option=CVA_OPT, n_grid=50)
    res = reference.price_cva(spec, 1 << 17, seed=4)
    want = float(mcva.closed_form(spec))
    assert abs(res.price - want) < 3 * res.std_error


def test_cva_exposure_profile_matches_martingale_growth():
    spec = CvaSpec(intensity=0.03, lgd=0.6, option=CVA_OPT, n_grid=25)
    res = reference.price_cva(spec, 1 << 17, seed=5)
    c0 = float(mcmath.bs_call(CVA_OPT.s, CVA_OPT.k, CVA_OPT.r, CVA_OPT.v, CVA_OPT.t))
    tj = CVA_OPT.t / spec.n_grid * np.arange(1, spec.n_grid + 1)
    want = c0 * np.exp(CVA_OPT.r * tj)
    # Per-node MC error ~ c0-sized std / sqrt(n); 1% relative tolerance.
    np.testing.assert_allclose(res.expected_exposure, want, rtol=0.01)


def test_cva_grid_convergence():
    # Finer grids change the value smoothly (self-consistency sweep of
    # cvaOpt.cu:70-97 promoted to an assert via the closed form).
    for g in (25, 50, 100):
        spec = CvaSpec(intensity=0.03, lgd=0.6, option=CVA_OPT, n_grid=g)
        res = reference.price_cva(spec, 1 << 15, seed=6)
        want = float(mcva.closed_form(spec))
        assert abs(res.price - want) < 4 * res.std_error
