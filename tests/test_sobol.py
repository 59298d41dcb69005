"""Sobol net tests: exact parity with the torch reference implementation,
net quality, and RQMC pricing accuracy/variance reduction."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mctpu import engine, math as mcmath, sobol
from mctpu.types import BasketOption, VanillaOption

OPT = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0)
KEY = jax.random.key(777)
BS = float(mcmath.bs_call(100.0, 100.0, 0.048790, 0.2, 1.0))


def test_matches_torch_sobol_engine():
    torch = pytest.importorskip("torch")
    n, d = 256, 8
    want = torch.quasirandom.SobolEngine(dimension=d).draw(n).numpy()
    got = np.asarray(sobol.sobol_points(n, d, dtype=jnp.float64))
    np.testing.assert_allclose(got, want.astype(np.float64), atol=1e-7)


def test_net_balance_property():
    # A (t,m,s)-net in base 2: every dyadic interval [k/2^j,(k+1)/2^j) of a
    # 1-D projection gets exactly n/2^j points (for j small vs n).
    n = 1 << 10
    pts = np.asarray(sobol.sobol_points(n, 4, dtype=jnp.float64))
    for d in range(4):
        counts = np.histogram(pts[:, d], bins=16, range=(0, 1))[0]
        assert (counts == n // 16).all()


def test_digital_shift_preserves_balance():
    shift = jax.random.bits(KEY, (4,), dtype=jnp.uint32)
    pts = np.asarray(sobol.sobol_points(1 << 10, 4, shift, jnp.float64))
    counts = np.histogram(pts[:, 2], bins=16, range=(0, 1))[0]
    assert (counts == (1 << 10) // 16).all()


def test_dim_limit():
    with pytest.raises(ValueError, match="128"):
        sobol.sobol_points(16, 129)


def test_vanilla_sobol_unbiased_and_tight():
    res = sobol.price_vanilla_sobol(OPT, 1 << 12, KEY, replicates=16)
    assert abs(float(res.price) - BS) < 4 * float(res.std_error)
    mc = engine.price_vanilla(OPT, res.n_paths, jax.random.key(3),
                              engine.EngineConfig(num_blocks=8, rows=8,
                                                  backend="xla"))
    assert float(res.ci) < float(mc.ci) / 5


def test_basket_sobol_matches_mc():
    opt = BasketOption.equicorrelated(10, rho=0.3)
    res = sobol.price_basket_sobol(opt, 1 << 12, KEY, replicates=16)
    mc = engine.price_basket(opt, 1 << 20, jax.random.key(4),
                             engine.EngineConfig(num_blocks=8, rows=8,
                                                 backend="xla"))
    se = np.hypot(float(res.std_error),
                  float(mc.std_error))
    assert abs(float(res.price) - float(mc.price)) < 4 * se
    # and tighter than MC at the same budget
    mc_same = engine.price_basket(opt, res.n_paths, jax.random.key(5),
                                  engine.EngineConfig(num_blocks=8, rows=8,
                                                      backend="xla"))
    assert float(res.ci) < float(mc_same.ci) / 2
