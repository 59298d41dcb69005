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


@pytest.mark.slow
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
    with pytest.raises(ValueError, match="2048"):
        sobol.sobol_points(16, 2049)


def test_matches_scipy_at_high_dims():
    """Independent-implementation parity at dims beyond the old 128 cap.

    scipy.stats.qmc.Sobol carries its own copy of the Joe-Kuo direction
    numbers and its own generator code path; agreement at dim > 1111 (the
    classic Joe-Kuo table size) validates the whole extended table.
    """
    scipy_qmc = pytest.importorskip("scipy.stats.qmc")
    d = 2000
    want = scipy_qmc.Sobol(d=d, scramble=False).random(64)
    got = np.asarray(sobol.sobol_points(64, d, dtype=jnp.float64))
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_high_dim_net_balance():
    # 1-D projections of the highest bundled dimensions are still (0,1)-nets.
    n = 1 << 9
    pts = np.asarray(sobol.sobol_points(n, 2048, dtype=jnp.float64))
    for d in (1111, 2000, 2047):
        counts = np.histogram(pts[:, d], bins=8, range=(0, 1))[0]
        assert (counts == n // 8).all(), d


def test_vanilla_sobol_unbiased_and_tight():
    res = sobol.price_vanilla_sobol(OPT, 1 << 12, KEY, replicates=16)
    assert abs(float(res.price) - BS) < 4 * float(res.std_error)
    mc = engine.price_vanilla(OPT, res.n_paths, jax.random.key(3),
                              engine.EngineConfig(num_blocks=8, rows=8,
                                                  backend="xla"))
    assert float(res.ci) < float(mc.ci) / 5


@pytest.mark.slow
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


class TestBrownianBridgeAsian:
    GEO = __import__("mctpu.types", fromlist=["AsianOption"]).AsianOption(
        100.0, 100.0, 0.05, 0.2, 1.0, n_obs=12, average="geometric")

    def test_bridge_covariance_is_brownian(self):
        # With iid normal inputs the constructed path must have
        # Cov[W_i, W_j] = min(t_i, t_j) — validates order + coefficients.
        rng = np.random.default_rng(0)
        z = jnp.asarray(rng.standard_normal((100000, 10)))
        w = np.asarray(sobol.bridge_paths(z, 2.0, jnp.float64))
        t = 2.0 * np.arange(1, 11) / 10
        cov = w @ w.T / z.shape[0]
        np.testing.assert_allclose(cov, np.minimum.outer(t, t), atol=0.02)

    def test_bridge_plan_covers_all_indices(self):
        for m in (1, 2, 3, 7, 12, 50, 128):
            _, _, out, _, _, _ = sobol.brownian_bridge_plan(m)
            assert sorted(out.tolist()) == list(range(m))

    def test_geometric_matches_closed_form(self):
        res = sobol.price_asian_sobol(self.GEO, 1 << 13, jax.random.key(5))
        want = float(mcmath.geometric_asian_call(100.0, 100.0, 0.05, 0.2,
                                                 1.0, 12))
        assert abs(float(res.price) - want) < 5 * float(res.std_error)

    def test_beats_plain_mc_by_an_order_of_magnitude(self):
        from mctpu import engine
        from mctpu.types import AsianOption
        res = sobol.price_asian_sobol(self.GEO, 1 << 13, jax.random.key(5))
        mc = engine.price_asian(self.GEO, (1 << 13) * 16, jax.random.key(5),
                                engine.EngineConfig(num_blocks=8, rows=8,
                                                    backend="xla"))
        assert float(res.ci) < float(mc.ci) / 10

    def test_arithmetic_within_geometric_vanilla_bracket(self):
        from mctpu.types import AsianOption
        ari = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=12,
                          average="arithmetic")
        res = sobol.price_asian_sobol(ari, 1 << 13, jax.random.key(6))
        geo = float(mcmath.geometric_asian_call(100.0, 100.0, 0.05, 0.2,
                                                1.0, 12))
        vanilla = float(mcmath.bs_call(100.0, 100.0, 0.05, 0.2, 1.0))
        assert geo < float(res.price) < vanilla

    @pytest.mark.slow
    def test_daily_year_varswap_grid(self):
        """A 252-obs (daily-monitoring) Asian prices through the bridge with
        the QMC CI advantage intact (the round-2 MAX_DIM=128 cap is gone)."""
        from mctpu.types import AsianOption
        geo = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=252,
                          average="geometric")
        res = sobol.price_asian_sobol(geo, 1 << 11, jax.random.key(9),
                                      replicates=8)
        want = float(mcmath.geometric_asian_call(100.0, 100.0, 0.05, 0.2,
                                                 1.0, 252))
        assert abs(float(res.price) - want) < 5 * float(res.std_error)
        mc = engine.price_asian(geo, res.n_paths, jax.random.key(9),
                                engine.EngineConfig(num_blocks=8, rows=8,
                                                    backend="xla"))
        assert float(res.ci) < float(mc.ci) / 5

    def test_too_many_obs_rejected(self):
        from mctpu.types import AsianOption
        with pytest.raises(ValueError, match="n_obs"):
            sobol.price_asian_sobol(
                AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=2500),
                1 << 10, jax.random.key(0))
