"""Randomized QMC tests: unbiasedness and variance reduction vs plain MC."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mctpu import engine, math as mcmath, qmc
from mctpu.types import BasketOption, VanillaOption

OPT = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0)
KEY = jax.random.key(404)
BS = float(mcmath.bs_call(100.0, 100.0, 0.048790, 0.2, 1.0))


def test_next_prime():
    assert qmc.next_prime(10) == 11
    assert qmc.next_prime(11) == 11
    assert qmc.next_prime(1 << 14) == 16411


def test_lattice_points_properties():
    pts = np.asarray(qmc.lattice_points(qmc.next_prime(512), 5,
                                        jnp.zeros(5, jnp.float64)))
    assert pts.shape[1] == 5
    assert (pts >= 0).all() and (pts < 1).all()
    # Each 1-D projection of a rank-1 lattice with prime n is equidistributed:
    # its sorted points are an arithmetic grid.
    col = np.sort(pts[:, 1])
    gaps = np.diff(col)
    assert gaps.max() < 2.5 / pts.shape[0]


def test_vanilla_qmc_unbiased_and_tight():
    res = qmc.price_vanilla_qmc(OPT, 1 << 12, KEY, replicates=16)
    assert abs(float(res.price) - BS) < 4 * float(res.std_error)
    # d=1 lattice ~ stratification: far tighter than MC at the same budget.
    mc = engine.price_vanilla(OPT, res.n_paths, jax.random.key(7),
                              engine.EngineConfig(num_blocks=8, rows=8,
                                                  backend="xla"))
    assert float(res.ci) < float(mc.ci) / 5


@pytest.mark.slow
def test_basket_qmc_matches_oracle():
    opt = BasketOption.default_reference(3)
    res = qmc.price_basket_qmc(opt, 1 << 12, KEY, replicates=16)
    mc = engine.price_basket(opt, 1 << 20, jax.random.key(8),
                             engine.EngineConfig(num_blocks=8, rows=8,
                                                 backend="xla"))
    se = np.hypot(float(res.std_error),
                  float(mc.std_error))
    assert abs(float(res.price) - float(mc.price)) < 4 * se


@pytest.mark.slow
def test_basket_qmc_variance_reduction():
    opt = BasketOption.equicorrelated(5, rho=0.3)
    res = qmc.price_basket_qmc(opt, 1 << 12, KEY, replicates=16)
    mc = engine.price_basket(opt, res.n_paths, jax.random.key(9),
                             engine.EngineConfig(num_blocks=8, rows=8,
                                                 backend="xla"))
    assert float(res.ci) < float(mc.ci) / 2


def test_qmc_reproducible():
    a = qmc.price_vanilla_qmc(OPT, 4096, KEY)
    b = qmc.price_vanilla_qmc(OPT, 4096, KEY)
    assert float(a.price) == float(b.price)
