"""MC Greeks vs closed-form Black-Scholes Greeks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mctpu import greeks, math as mcmath
from mctpu.types import BasketOption, VanillaOption

OPT = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0)
KEY = jax.random.key(31)
CF = {k: float(v) for k, v in
      mcmath.bs_greeks(100.0, 100.0, 0.048790, 0.2, 1.0).items()}


class TestVanillaGreeks:
    @pytest.fixture(scope="class")
    def mc(self):
        return {k: float(v) for k, v in
                greeks.vanilla_greeks(OPT, 1 << 20, KEY).items()}

    @pytest.mark.parametrize("name,rtol", [
        ("price", 0.005), ("delta", 0.01), ("vega", 0.02),
        ("theta", 0.02), ("rho", 0.01),
    ])
    def test_matches_closed_form(self, mc, name, rtol):
        assert mc[name] == pytest.approx(CF[name], rel=rtol)

    def test_antithetic_off_still_works(self):
        mc = greeks.vanilla_greeks(OPT, 1 << 20, KEY, antithetic=False)
        assert float(mc["delta"]) == pytest.approx(CF["delta"], rel=0.02)


class TestBasketDelta:
    def test_single_asset_equals_vanilla_delta(self):
        opt = BasketOption(
            s=np.array([100.0]), v=np.array([0.2]), w=np.array([1.0]),
            corr=np.eye(1), d=np.zeros(1), k=100.0, r=0.048790, t=1.0)
        price, delta = greeks.basket_delta(opt, 1 << 19, KEY)
        assert float(delta[0]) == pytest.approx(CF["delta"], rel=0.02)

    def test_three_asset_deltas_positive_and_sum_sane(self):
        opt = BasketOption.default_reference(3)
        price, delta = greeks.basket_delta(opt, 1 << 18, KEY)
        d = np.asarray(delta)
        assert (d > 0).all()
        # The strongly anti-correlated equal-weight basket has tiny variance:
        # the forward sits above K almost surely, so the basket delta is ~1
        # and each per-asset delta ~ w_i = 1/3.
        np.testing.assert_allclose(d, 1 / 3, rtol=0.05)


class TestBumpAndRevalue:
    def _price(self, s):
        # Deterministic given the fixed key: CRN holds across bumps.
        o = VanillaOption(s=s, k=OPT.k, r=OPT.r, v=OPT.v, t=OPT.t)
        return greeks.vanilla_greeks(o, 1 << 18, KEY)["price"]

    def test_gamma_matches_closed_form(self):
        gamma = float(greeks.bump_and_revalue(self._price, jnp.float64(100.0),
                                              eps=1.0, order=2))
        assert gamma == pytest.approx(CF["gamma"], rel=0.05)

    def test_crn_delta_matches_pathwise(self):
        fd = float(greeks.bump_and_revalue(self._price, jnp.float64(100.0),
                                           eps=0.5, order=1))
        pw = float(greeks.vanilla_greeks(OPT, 1 << 18, KEY)["delta"])
        # Same paths -> the MC noise cancels; only O(eps^2) bias remains.
        assert fd == pytest.approx(pw, abs=2e-3)


class TestExoticGreeks:
    def test_asian_greeks_match_geometric_closed_form(self):
        from mctpu.types import AsianOption
        geo = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=12,
                          average="geometric")
        g = greeks.asian_greeks(geo, 1 << 17, jax.random.key(2))

        def cf(s, v, r):
            return mcmath.geometric_asian_call(s, 100.0, r, v, 1.0, 12)

        d_cf = jax.grad(cf, argnums=(0, 1, 2))(100.0, 0.2, 0.05)
        assert float(g["delta"]) == pytest.approx(float(d_cf[0]), abs=0.005)
        assert float(g["vega"]) == pytest.approx(float(d_cf[1]), rel=0.02)
        assert float(g["rho"]) == pytest.approx(float(d_cf[2]), rel=0.02)

    @pytest.mark.slow
    def test_heston_delta_matches_cf_finite_difference(self):
        import dataclasses as dc

        from mctpu.models import heston as mheston
        from mctpu.types import HestonOption
        hopt = HestonOption(s=100.0, k=100.0, r=0.03, t=1.0, v0=0.04,
                            kappa=1.5, theta=0.04, xi=0.5, rho=-0.7)
        g = greeks.heston_greeks(hopt, 1 << 16, jax.random.key(3),
                                 n_steps=24, scheme="qe")
        eps = 0.5
        fd = (float(mheston.cf_call_price(dc.replace(hopt, s=100 + eps)))
              - float(mheston.cf_call_price(dc.replace(hopt, s=100 - eps)))
              ) / (2 * eps)
        assert float(g["delta"]) == pytest.approx(fd, abs=0.02)
        # v0 sensitivity: CF finite difference too
        fd_v0 = (float(mheston.cf_call_price(dc.replace(hopt, v0=0.045)))
                 - float(mheston.cf_call_price(dc.replace(hopt, v0=0.035)))
                 ) / 0.01
        assert float(g["dv0"]) == pytest.approx(fd_v0, rel=0.15)

    @pytest.mark.slow
    def test_barrier_crn_delta_matches_bgk_finite_difference(self):
        from mctpu.types import BarrierOption
        uo = BarrierOption(100.0, 100.0, 0.05, 0.2, 1.0, barrier=130.0,
                           n_obs=50, kind="up-and-out")

        def cf(s):
            beff = float(mcmath.barrier_continuity_correction(
                130.0, s, 0.2, 1.0, 50, up=True))
            return float(mcmath.up_and_out_call(s, 100.0, 0.05, 0.2, 1.0,
                                                beff))

        fd = (cf(100.5) - cf(99.5)) / 1.0
        d = greeks.barrier_delta_crn(uo, 1 << 18, jax.random.key(4))
        assert float(d) == pytest.approx(fd, abs=0.02)


class TestEngineGreeksAsian:
    """Engine-tier pathwise Asian Greeks (kernels/asian.py Greeks section)."""

    def _cfg(self, **kw):
        from mctpu import engine
        return engine.EngineConfig(num_blocks=16, rows=8, backend="xla",
                                   **kw)

    def test_gamma_geometric_matches_exact_hessian(self):
        """Stein mixed-LR gamma vs d2/ds2 of the exact geometric law."""
        from mctpu import engine
        from mctpu.types import AsianOption
        geo = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=12,
                          average="geometric")
        g = engine.greeks_asian(geo, 1 << 18, KEY, self._cfg())

        def cf(s):
            return mcmath.geometric_asian_call(s, 100.0, 0.05, 0.2, 1.0,
                                               12, dtype=jnp.float64)

        hess = float(jax.grad(jax.grad(cf))(100.0))
        z = (float(g.gamma.price) - hess) / float(g.gamma.std_error)
        assert abs(z) < 4.0, (z, float(g.gamma.price), hess)

    @pytest.mark.slow
    def test_gamma_arithmetic_matches_crn_delta_fd(self):
        """Arithmetic gamma (carried sum s_j t_j^2 ratio) vs CRN central
        differences of the validated pathwise delta output."""
        import dataclasses as dc

        from mctpu import engine
        from mctpu.types import AsianOption
        ari = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=12,
                          average="arithmetic")
        g = engine.greeks_asian(ari, 1 << 18, KEY, self._cfg())

        def delta_at(s):
            return float(engine.greeks_asian(dc.replace(ari, s=s), 1 << 18,
                                             KEY, self._cfg()).delta.price)

        fd = delta_at(100.5) - delta_at(99.5)
        tol = 5 * float(g.gamma.std_error) + abs(fd) * 5e-3
        assert abs(float(g.gamma.price) - fd) < tol, (float(g.gamma.price),
                                                      fd)

    @pytest.mark.slow
    def test_gamma_single_obs_reduces_to_vanilla(self):
        """n_obs = 1: the arithmetic Stein form is an alternate grouping
        of the vanilla mixed gamma; both estimate BS gamma."""
        from mctpu import engine
        from mctpu.types import AsianOption
        one = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=1,
                          average="arithmetic")
        g = engine.greeks_asian(one, 1 << 18, KEY, self._cfg())
        z = (float(g.gamma.price) - CF["gamma"]) / float(g.gamma.std_error)
        assert abs(z) < 4.0, z

    def test_geometric_matches_grad_of_closed_form(self):
        from mctpu import engine
        from mctpu.types import AsianOption
        geo = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=12,
                          average="geometric")
        g = engine.greeks_asian(geo, 1 << 19, KEY, self._cfg())

        def cf(s, v, r):
            return mcmath.geometric_asian_call(s, 100.0, r, v, 1.0, 12)

        d_cf = jax.grad(cf, argnums=(0, 1, 2))(100.0, 0.2, 0.05)
        for mc, ref in ((g.delta, d_cf[0]), (g.vega, d_cf[1]),
                        (g.rho, d_cf[2])):
            z = abs(float(mc.price) - float(ref)) / float(mc.std_error)
            assert z < 4, (float(mc.price), float(ref), z)

    @pytest.mark.slow
    def test_price_matches_pricer(self):
        from mctpu import engine
        from mctpu.types import AsianOption
        opt = AsianOption(100.0, 100.0, 0.05, 0.25, 1.0, n_obs=16,
                          average="arithmetic")
        g = engine.greeks_asian(opt, 1 << 18, KEY, self._cfg())
        p = engine.price_asian(opt, 1 << 18, KEY, self._cfg())
        # Same streams and geometry -> same paths; f32 reduction orders of
        # two distinct XLA programs may differ in the last ulps.
        assert float(g.price.price) == pytest.approx(float(p.price),
                                                     rel=1e-6)

    def test_arithmetic_delta_vega_match_crn_bumps(self):
        from mctpu import engine
        from mctpu.types import AsianOption

        def price(s, v):
            opt = AsianOption(s, 100.0, 0.05, v, 1.0, n_obs=16,
                              average="arithmetic")
            return float(engine.price_asian(opt, 1 << 18, KEY,
                                            self._cfg()).price)

        g = engine.greeks_asian(
            AsianOption(100.0, 100.0, 0.05, 0.25, 1.0, n_obs=16,
                        average="arithmetic"), 1 << 18, KEY, self._cfg())
        h = 0.5
        fd_delta = (price(100.0 + h, 0.25) - price(100.0 - h, 0.25)) / (2 * h)
        assert float(g.delta.price) == pytest.approx(fd_delta, abs=0.01)
        hv = 0.005
        fd_vega = (price(100.0, 0.25 + hv) - price(100.0, 0.25 - hv)) / (2 * hv)
        assert float(g.vega.price) == pytest.approx(fd_vega, rel=0.05)

    def test_arithmetic_rho_matches_crn_bump(self):
        from mctpu import engine
        from mctpu.types import AsianOption

        def price(r):
            opt = AsianOption(100.0, 100.0, r, 0.25, 1.0, n_obs=16,
                              average="arithmetic")
            return float(engine.price_asian(opt, 1 << 18, KEY,
                                            self._cfg()).price)

        g = engine.greeks_asian(
            AsianOption(100.0, 100.0, 0.05, 0.25, 1.0, n_obs=16,
                        average="arithmetic"), 1 << 18, KEY, self._cfg())
        hr = 0.002
        fd_rho = (price(0.05 + hr) - price(0.05 - hr)) / (2 * hr)
        assert float(g.rho.price) == pytest.approx(fd_rho, rel=0.05)

    @pytest.mark.slow
    def test_antithetic_variant(self):
        from mctpu import engine
        from mctpu.types import AsianOption
        opt = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=8,
                          average="geometric")
        a = engine.greeks_asian(opt, 1 << 17, KEY,
                                self._cfg(antithetic=True))
        b = engine.greeks_asian(opt, 1 << 17, KEY, self._cfg())
        assert float(a.delta.std_error) < float(b.delta.std_error)

    @pytest.mark.slow
    def test_pallas_interpret_twin_consistent(self):
        from mctpu import engine
        from mctpu.types import AsianOption
        opt = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=8,
                          average="geometric")
        x = engine.greeks_asian(opt, 1 << 14, KEY, self._cfg())
        pcfg = engine.EngineConfig(num_blocks=16, rows=8, backend="pallas",
                                   interpret=True)
        p = engine.greeks_asian(opt, 1 << 14, KEY, pcfg)
        for name in ("price", "delta", "vega"):
            xa, pa = getattr(x, name), getattr(p, name)
            se = np.hypot(float(xa.std_error), float(pa.std_error))
            assert abs(float(xa.price) - float(pa.price)) < 5 * se

    def test_dispatcher(self):
        from mctpu import engine
        from mctpu.types import AsianOption
        opt = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=8,
                          average="geometric")
        g = engine.greeks(opt, 1 << 14, KEY, self._cfg())
        assert g.vega is not None

    @pytest.mark.slow
    def test_shard_invariant(self):
        import mctpu
        from mctpu import engine
        from mctpu.types import AsianOption
        opt = AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=8,
                          average="arithmetic")
        base = engine.greeks_asian(opt, 1 << 14, KEY, self._cfg())
        mesh = mctpu.parallel.path_mesh(jax.devices()[:8])
        sharded = engine.greeks_asian(opt, 1 << 14, KEY, self._cfg(mesh=mesh))
        for name in ("price", "delta", "vega"):
            assert float(getattr(base, name).price) == float(
                getattr(sharded, name).price)


class TestEngineGreeksLookback:
    """Engine-tier lookback Greeks (extreme-tracking in log space)."""

    def _cfg(self, **kw):
        from mctpu import engine
        return engine.EngineConfig(num_blocks=16, rows=8, backend="xla",
                                   **kw)

    def _opt(self, kind="floating", payoff="call", n_obs=16):
        from mctpu.types import LookbackOption
        return LookbackOption(s=100.0, r=0.05, v=0.25, t=1.0, k=100.0,
                              n_obs=n_obs, kind=kind, payoff=payoff)

    def test_floating_delta_is_exact_homogeneity(self):
        # Floating payoffs are homogeneous degree 1 in s0, so the pathwise
        # delta estimator satisfies delta == price / s0 EXACTLY (same
        # paths, same sums up to f32 rounding) — a closed identity, not a
        # statistical gate.
        from mctpu import engine
        g = engine.greeks_lookback(self._opt(), 1 << 17, KEY, self._cfg())
        assert float(g.delta.price) == pytest.approx(
            float(g.price.price) / 100.0, rel=1e-5)

    @pytest.mark.slow
    def test_price_matches_pricer(self):
        from mctpu import engine
        g = engine.greeks_lookback(self._opt(), 1 << 17, KEY, self._cfg())
        p = engine.price_lookback(self._opt(), 1 << 17, KEY, self._cfg())
        assert float(g.price.price) == pytest.approx(float(p.price),
                                                     rel=1e-6)

    @pytest.mark.parametrize("kind,payoff,k", [
        ("floating", "call", 100.0), ("fixed", "call", 105.0),
        ("fixed", "put", 95.0)])
    @pytest.mark.slow
    def test_delta_vega_match_crn_bumps(self, kind, payoff, k):
        # Fixed strikes sit AWAY from s0: the running extreme has an atom
        # at s0 (the initial fixing), so at k == s0 exactly the payoff
        # kink carries positive probability mass — delta does not exist
        # there (the pathwise estimator returns the left derivative while
        # a central difference averages the two one-sided slopes).
        from mctpu import engine
        from mctpu.types import LookbackOption

        def price(s, v):
            o = LookbackOption(s=s, r=0.05, v=v, t=1.0, k=k, n_obs=16,
                               kind=kind, payoff=payoff)
            return float(engine.price_lookback(o, 1 << 17, KEY,
                                               self._cfg()).price)

        from mctpu.types import LookbackOption as LO
        opt = LO(s=100.0, r=0.05, v=0.25, t=1.0, k=k, n_obs=16,
                 kind=kind, payoff=payoff)
        g = engine.greeks_lookback(opt, 1 << 17, KEY, self._cfg())
        h = 0.5
        fd_d = (price(100.0 + h, 0.25) - price(100.0 - h, 0.25)) / (2 * h)
        assert float(g.delta.price) == pytest.approx(fd_d, abs=0.015)
        hv = 0.005
        fd_v = (price(100.0, 0.25 + hv) - price(100.0, 0.25 - hv)) / (2 * hv)
        assert float(g.vega.price) == pytest.approx(
            fd_v, rel=0.06, abs=0.5)

    @pytest.mark.parametrize("kind,payoff,k", [
        ("floating", "call", 100.0), ("floating", "put", 100.0),
        ("fixed", "call", 105.0), ("fixed", "put", 95.0)])
    @pytest.mark.slow
    def test_rho_matches_crn_bump(self, kind, payoff, k):
        """Arg-extreme-time rho (ds_j/dr = t_j s_j) vs CRN rate bumps."""
        import dataclasses as dc

        from mctpu import engine
        from mctpu.types import LookbackOption
        opt = LookbackOption(s=100.0, r=0.05, v=0.25, t=1.0, k=k, n_obs=16,
                             kind=kind, payoff=payoff)
        g = engine.greeks_lookback(opt, 1 << 17, KEY, self._cfg())
        h = 1e-3
        up = engine.price_lookback(dc.replace(opt, r=0.05 + h), 1 << 17,
                                   KEY, self._cfg())
        dn = engine.price_lookback(dc.replace(opt, r=0.05 - h), 1 << 17,
                                   KEY, self._cfg())
        fd = (float(up.price) - float(dn.price)) / (2 * h)
        tol = 5 * float(g.rho.std_error) + abs(fd) * 5e-3
        assert abs(float(g.rho.price) - fd) < tol, (float(g.rho.price), fd)

    @pytest.mark.slow
    def test_pallas_interpret_twin_consistent(self):
        from mctpu import engine
        x = engine.greeks_lookback(self._opt(n_obs=8), 1 << 14, KEY,
                                   self._cfg())
        pcfg = engine.EngineConfig(num_blocks=16, rows=8, backend="pallas",
                                   interpret=True)
        p = engine.greeks_lookback(self._opt(n_obs=8), 1 << 14, KEY, pcfg)
        for name in ("price", "delta", "vega", "rho"):
            xa, pa = getattr(x, name), getattr(p, name)
            se = np.hypot(float(xa.std_error), float(pa.std_error))
            assert abs(float(xa.price) - float(pa.price)) < 5 * se

    def test_dispatcher_and_shard_invariance(self):
        import mctpu
        from mctpu import engine
        opt = self._opt(n_obs=8)
        base = engine.greeks(opt, 1 << 14, KEY, self._cfg())
        mesh = mctpu.parallel.path_mesh(jax.devices()[:8])
        shard = engine.greeks_lookback(opt, 1 << 14, KEY,
                                       self._cfg(mesh=mesh))
        for name in ("price", "delta", "vega", "rho"):
            assert float(getattr(base, name).price) == float(
                getattr(shard, name).price)


class TestEngineGreeksVanilla:
    """In-kernel pathwise Greeks via the full engine contract."""

    def _cfg(self, **kw):
        from mctpu import engine
        return engine.EngineConfig(num_blocks=16, rows=8, backend="xla",
                                   **kw)

    @pytest.fixture(scope="class")
    def res(self):
        from mctpu import engine
        return engine.greeks_vanilla(OPT, 1 << 20, KEY, self._cfg())

    @pytest.mark.parametrize("name", ["price", "delta", "vega", "rho",
                                      "theta", "gamma", "vanna",
                                      "volga"])
    def test_each_greek_within_4_sigma_of_bs(self, res, name):
        r = getattr(res, name)
        z = (float(r.price) - CF[name]) / max(float(r.std_error), 1e-12)
        assert abs(z) < 4.0, (name, float(r.price), CF[name], z)

    @pytest.mark.slow
    def test_antithetic_variant(self):
        from mctpu import engine
        res = engine.greeks_vanilla(OPT, 1 << 19, KEY,
                                    self._cfg(antithetic=True))
        for name in ("price", "delta", "vega", "rho", "theta", "gamma",
                     "vanna", "volga"):
            r = getattr(res, name)
            z = (float(r.price) - CF[name]) / max(float(r.std_error), 1e-12)
            assert abs(z) < 4.0, (name, z)

    def test_put_greeks_via_parity(self):
        """Put Greeks follow from call Greeks by put-call parity."""
        from mctpu import engine
        popt = VanillaOption(s=OPT.s, k=OPT.k, r=OPT.r, v=OPT.v, t=OPT.t,
                             kind="put")
        res = engine.greeks_vanilla(popt, 1 << 20, KEY, self._cfg())
        disc = np.exp(-OPT.r * OPT.t)
        expected = {
            "delta": CF["delta"] - 1.0,
            "vega": CF["vega"],
            "rho": CF["rho"] - OPT.t * OPT.k * disc,
            "theta": CF["theta"] - OPT.r * OPT.k * disc,
            "gamma": CF["gamma"],  # put gamma == call gamma
            "vanna": CF["vanna"],  # second derivatives of the linear
            "volga": CF["volga"],  # forward term vanish under parity
        }
        for name, want in expected.items():
            r = getattr(res, name)
            z = (float(r.price) - want) / max(float(r.std_error), 1e-12)
            assert abs(z) < 4.0, (name, float(r.price), want, z)

    def test_pallas_interpret_twin_consistent(self):
        """The fused TPU kernel (interpret mode) hits the same numbers."""
        from mctpu import engine
        cfg = engine.EngineConfig(num_blocks=8, rows=8, backend="pallas",
                                  interpret=True)
        res = engine.greeks_vanilla(OPT, 1 << 16, KEY, cfg)
        for name in ("price", "delta", "vega", "rho", "theta", "gamma"):
            r = getattr(res, name)
            z = (float(r.price) - CF[name]) / max(float(r.std_error), 1e-12)
            assert abs(z) < 4.5, (name, float(r.price), CF[name], z)

    def test_greeks_dispatcher(self):
        from mctpu import engine
        res = engine.greeks(OPT, 1 << 16, KEY, self._cfg())
        assert float(res.delta.price) == pytest.approx(CF["delta"], abs=0.02)
        with pytest.raises(TypeError):
            # Unknown product types still fail fast (every shipped family
            # — vanilla/basket/asian/lookback/barrier/heston/cva/american —
            # now routes through the dispatcher).
            engine.greeks(object(), 1 << 10, KEY, self._cfg())


class TestEngineGreeksBasket:
    def _cfg(self, **kw):
        from mctpu import engine
        return engine.EngineConfig(num_blocks=16, rows=8, backend="xla",
                                   **kw)

    @pytest.fixture(scope="class")
    def res(self):
        from mctpu import engine
        return engine.greeks_basket(BasketOption.default_reference(3),
                                    1 << 19, KEY, self._cfg())

    @pytest.mark.slow
    def test_price_matches_pricer(self, res):
        from mctpu import engine
        p = engine.price_basket(BasketOption.default_reference(3), 1 << 19,
                                KEY, self._cfg())
        # Same plan geometry and key -> identical paths; sums agree to f32
        # rounding (two distinct XLA programs may fuse/reduce differently).
        assert float(res.price.price) == pytest.approx(float(p.price),
                                                       rel=1e-6)

    def test_delta_matches_autodiff(self, res):
        _, d_ad = greeks.basket_delta(BasketOption.default_reference(3),
                                      1 << 19, KEY)
        d = np.asarray(res.delta.price)
        se = np.asarray(res.delta.std_error)
        np.testing.assert_allclose(d, np.asarray(d_ad), atol=0.01)
        assert (se > 0).all()

    @pytest.mark.slow
    def test_ten_assets_packed_path(self):
        # a = 10 > ASSET_MAJOR_MAX exercises the packed-lane Greeks kernel
        # (small baskets route to the asset-major layout).  Price parity
        # with the (also packed) pricer and sane per-asset deltas.
        from mctpu import engine
        opt = BasketOption.default_reference(10)
        g = engine.greeks_basket(opt, 1 << 17, KEY, self._cfg())
        p = engine.price_basket(opt, 1 << 17, KEY, self._cfg())
        assert float(g.price.price) == pytest.approx(float(p.price),
                                                     rel=1e-6)
        d = np.asarray(g.delta.price)
        assert d.shape == (10,) and (d > 0).all() and d.sum() < 1.5

    def test_vega_matches_crn_bump(self, res):
        """Per-asset vega vs common-random-number central differences."""
        import dataclasses as dc

        from mctpu import engine
        opt = BasketOption.default_reference(3)
        eps = 1e-3
        cfg = self._cfg()
        for i in range(3):
            v_up = np.asarray(opt.v, float).copy()
            v_dn = v_up.copy()
            v_up[i] += eps
            v_dn[i] -= eps
            up = engine.price_basket(dc.replace(opt, v=jnp.asarray(v_up)),
                                     1 << 19, KEY, cfg)
            dn = engine.price_basket(dc.replace(opt, v=jnp.asarray(v_dn)),
                                     1 << 19, KEY, cfg)
            fd = (float(up.price) - float(dn.price)) / (2 * eps)
            assert float(res.vega.price[i]) == pytest.approx(fd, abs=0.02)

    def test_rho_theta_match_crn_bumps(self, res):
        """Scalar rho/theta vs common-random-number central differences
        (asset-major regime)."""
        import dataclasses as dc

        from mctpu import engine
        opt = BasketOption.default_reference(3)
        cfg = self._cfg()
        h = 1e-3
        up = engine.price_basket(dc.replace(opt, r=opt.r + h), 1 << 19,
                                 KEY, cfg)
        dn = engine.price_basket(dc.replace(opt, r=opt.r - h), 1 << 19,
                                 KEY, cfg)
        fd_rho = (float(up.price) - float(dn.price)) / (2 * h)
        assert float(res.rho.price) == pytest.approx(fd_rho, abs=0.02)
        up = engine.price_basket(dc.replace(opt, t=opt.t + h), 1 << 19,
                                 KEY, cfg)
        dn = engine.price_basket(dc.replace(opt, t=opt.t - h), 1 << 19,
                                 KEY, cfg)
        fd_th = (float(up.price) - float(dn.price)) / (2 * h)
        assert float(res.theta.price) == pytest.approx(fd_th, abs=0.02)

    @pytest.mark.slow
    def test_rho_theta_packed_regime(self):
        """Same CRN gates through the packed-lane MXU kernel (a > 8)."""
        import dataclasses as dc

        from mctpu import engine
        opt = BasketOption.default_reference(12)
        cfg = self._cfg()
        g = engine.greeks_basket(opt, 1 << 17, KEY, cfg)
        h = 1e-3
        for field, greek in (("r", g.rho), ("t", g.theta)):
            up = engine.price_basket(
                dc.replace(opt, **{field: getattr(opt, field) + h}),
                1 << 17, KEY, cfg)
            dn = engine.price_basket(
                dc.replace(opt, **{field: getattr(opt, field) - h}),
                1 << 17, KEY, cfg)
            fd = (float(up.price) - float(dn.price)) / (2 * h)
            assert float(greek.price) == pytest.approx(fd, abs=0.05), field

    @pytest.mark.slow
    def test_single_asset_reduces_to_vanilla(self):
        from mctpu import engine
        opt = BasketOption(
            s=np.array([100.0]), v=np.array([0.2]), w=np.array([1.0]),
            corr=np.eye(1), d=np.zeros(1), k=100.0, r=0.048790, t=1.0)
        res = engine.greeks_basket(opt, 1 << 19, KEY, self._cfg())
        zd = (float(res.delta.price[0]) - CF["delta"]) \
            / float(res.delta.std_error[0])
        zv = (float(res.vega.price[0]) - CF["vega"]) \
            / float(res.vega.std_error[0])
        zr = (float(res.rho.price) - CF["rho"]) / float(res.rho.std_error)
        zt = (float(res.theta.price) - CF["theta"]) \
            / float(res.theta.std_error)
        zg = (float(res.gamma.price[0]) - CF["gamma"]) \
            / float(res.gamma.std_error[0])
        assert abs(zd) < 4.0 and abs(zv) < 4.0, (zd, zv)
        assert abs(zr) < 4.0 and abs(zt) < 4.0, (zr, zt)
        assert abs(zg) < 4.0, zg

    @pytest.mark.slow
    def test_gamma_equicorrelated_matches_crn_delta_fd(self):
        """Per-asset diagonal gamma (Stein tilt) vs CRN central
        differences of the per-asset delta output — asset-major regime.
        The FD reference itself is the noisy side (bumping s_i moves
        paths across the kink), hence the relative slack."""
        import dataclasses as dc

        from mctpu import engine
        opt = BasketOption.equicorrelated(5, rho=0.3)
        cfg = self._cfg()
        g = engine.greeks_basket(opt, 1 << 18, KEY, cfg)
        h = 1.0
        for i in (0, 2):
            su = np.asarray(opt.s, float).copy()
            sd = su.copy()
            su[i] += h
            sd[i] -= h
            du = engine.greeks_basket(dc.replace(opt, s=su), 1 << 18, KEY,
                                      cfg)
            dd = engine.greeks_basket(dc.replace(opt, s=sd), 1 << 18, KEY,
                                      cfg)
            fd = (float(du.delta.price[i]) - float(dd.delta.price[i])) \
                / (2 * h)
            mc = float(g.gamma.price[i])
            tol = 5 * float(g.gamma.std_error[i]) + 0.10 * abs(fd)
            assert abs(mc - fd) < tol, (i, mc, fd)

    @pytest.mark.slow
    def test_gamma_packed_regime_and_degenerate_none(self):
        """Packed MXU kernel (a > 8) produces finite, CRN-consistent
        diagonal gamma for a full-rank correlation; the rank-deficient
        reference correlation has no sign-definite Brownian tilt, so
        gamma degrades to None with every other output unaffected."""
        import dataclasses as dc

        from mctpu import engine
        opt = BasketOption.equicorrelated(12, rho=0.3)
        cfg = self._cfg()
        g = engine.greeks_basket(opt, 1 << 17, KEY, cfg)
        assert np.isfinite(np.asarray(g.gamma.price)).all()
        h = 1.0
        su = np.asarray(opt.s, float).copy()
        sd = su.copy()
        su[0] += h
        sd[0] -= h
        du = engine.greeks_basket(dc.replace(opt, s=su), 1 << 17, KEY, cfg)
        dd = engine.greeks_basket(dc.replace(opt, s=sd), 1 << 17, KEY, cfg)
        fd = (float(du.delta.price[0]) - float(dd.delta.price[0])) / (2 * h)
        mc = float(g.gamma.price[0])
        tol = 5 * float(g.gamma.std_error[0]) + 0.15 * abs(fd)
        assert abs(mc - fd) < tol, (mc, fd)

        degen = engine.greeks_basket(BasketOption.default_reference(3),
                                     1 << 14, KEY, cfg)
        assert degen.gamma is None
        assert np.isfinite(np.asarray(degen.delta.price)).all()
        assert np.isfinite(float(degen.rho.price))

    @pytest.mark.slow
    def test_pallas_interpret_twin_consistent(self):
        from mctpu import engine
        cfg = engine.EngineConfig(num_blocks=8, rows=8, backend="pallas",
                                  interpret=True)
        res = engine.greeks_basket(BasketOption.default_reference(3),
                                   1 << 14, KEY, cfg)
        np.testing.assert_allclose(np.asarray(res.delta.price), 1 / 3,
                                   atol=0.01)
        # rho/theta ride the same kernel; statistical agreement with the
        # XLA twin (independent streams) pins the interpret-mode math.
        xcfg = engine.EngineConfig(num_blocks=8, rows=8, backend="xla")
        ref = engine.greeks_basket(BasketOption.default_reference(3),
                                   1 << 14, KEY, xcfg)
        for a, b in ((res.rho, ref.rho), (res.theta, ref.theta)):
            # The anti-correlated basket exercises a.s., so rho is the
            # degenerate constant t*K on both backends (se == 0).
            se = np.hypot(float(a.std_error), float(b.std_error))
            assert abs(float(a.price) - float(b.price)) <= 5 * se + 1e-9


class TestEngineGreeksCva:
    """Round-4 engine-tier CVA sensitivities (VERDICT next-step #2):
    fused in-kernel credit delta (dCVA/dlambda), spot delta and vega,
    gated against finite differences of the exact closed form and CRN
    bumps of the WWR pricer."""

    SPEC = None  # built lazily (CvaSpec import at module scope is light)

    @staticmethod
    def _spec(n_grid=25):
        from mctpu.types import CvaSpec
        return CvaSpec(intensity=0.03, lgd=0.6,
                       option=VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0),
                       n_grid=n_grid)

    @staticmethod
    def _cfg(**kw):
        from mctpu import engine
        kw.setdefault("num_blocks", 16)
        kw.setdefault("rows", 8)
        kw.setdefault("backend", "xla")
        return engine.EngineConfig(**kw)

    @pytest.fixture(scope="class")
    def res(self):
        from mctpu import engine
        return engine.greeks_cva(self._spec(), 1 << 17, KEY, self._cfg())

    def test_all_outputs_match_closed_form_fd(self, res):
        from mctpu import math as mcmath

        def cf(lam=0.03, s=100.0, v=0.2):
            return float(mcmath.cva_closed_form(lam, 0.6, s, 100.0, 0.05,
                                                v, 1.0, 25))

        h = 1e-4
        hs, hl = 1e-2, 1e-3  # second-difference steps (f64 closed form)
        gates = {
            "cva": (res.cva, cf()),
            "credit_delta": (res.credit_delta,
                             (cf(lam=0.03 + h) - cf(lam=0.03 - h)) / (2 * h)),
            "delta": (res.delta,
                      (cf(s=100 + 1e-2) - cf(s=100 - 1e-2)) / 2e-2),
            "vega": (res.vega, (cf(v=0.2 + h) - cf(v=0.2 - h)) / (2 * h)),
            "gamma": (res.gamma,
                      (cf(s=100 + hs) - 2 * cf() + cf(s=100 - hs))
                      / (hs * hs)),
            "credit_gamma": (res.credit_gamma,
                             (cf(lam=0.03 + hl) - 2 * cf()
                              + cf(lam=0.03 - hl)) / (hl * hl)),
            "cross_gamma": (res.cross_gamma,
                            (cf(lam=0.03 + hl, s=100 + hs)
                             - cf(lam=0.03 + hl, s=100 - hs)
                             - cf(lam=0.03 - hl, s=100 + hs)
                             + cf(lam=0.03 - hl, s=100 - hs))
                            / (4 * hs * hl)),
        }
        for name, (r, want) in gates.items():
            z = (float(r.price) - want) / float(r.std_error)
            assert abs(z) < 4.0, (name, z, float(r.price), want)

    @pytest.mark.slow
    def test_dispatch_accepts_cva_types(self):
        from mctpu import engine
        from mctpu.types import CvaGreeksResult, CvaPortfolioSpec
        r = engine.greeks(self._spec(n_grid=5), 1 << 12, KEY, self._cfg())
        assert isinstance(r, CvaGreeksResult)
        port = CvaPortfolioSpec.from_single(self._spec(n_grid=5))
        r2 = engine.greeks(port, 1 << 12, KEY, self._cfg())
        assert float(r.cva.price) == float(r2.cva.price)

    @pytest.mark.slow
    def test_wwr_greeks_match_crn_bumps(self):
        import dataclasses

        from mctpu import engine
        from mctpu.types import CvaPortfolioSpec
        port = dataclasses.replace(
            CvaPortfolioSpec.from_single(self._spec()), wwr_b=0.5)
        cfg = self._cfg()
        res = engine.greeks_cva(port, 1 << 17, KEY, cfg)

        def crn(**bump):
            pb = dataclasses.replace(port, **bump)
            return float(engine.price_cva_portfolio(pb, 1 << 17, KEY,
                                                    cfg).cva)

        h = 1e-3
        fd = {
            "cva": crn(),
            "credit_delta": (crn(intensity=0.03 + h)
                             - crn(intensity=0.03 - h)) / (2 * h),
            "delta": (crn(s=100 * (1 + h)) - crn(s=100 * (1 - h)))
            / (2 * 100 * h),
            "vega": (crn(v=0.2 + h) - crn(v=0.2 - h)) / (2 * h),
        }
        for name, want in fd.items():
            r = getattr(res, name)
            tol = 5 * float(r.std_error) + abs(want) * 5e-3  # CRN + O(h^2)
            assert abs(float(r.price) - want) < tol, (name, float(r.price),
                                                      want)

        # Second-order outputs: CRN central differences of the (already
        # gated) FIRST-order outputs are a far lower-noise reference than
        # second differences of the price.  The gamma gate in particular
        # pins the Stein correction for the hazard's correlation with the
        # terminal normal (ddp_z): without it gamma reads ~4% high.
        def crn_g(name, **bump):
            pb = dataclasses.replace(port, **bump)
            return float(getattr(engine.greeks_cva(pb, 1 << 17, KEY, cfg),
                                 name).price)

        hs = 0.5
        fd2 = {
            "gamma": (crn_g("delta", s=100 + hs)
                      - crn_g("delta", s=100 - hs)) / (2 * hs),
            "credit_gamma": (crn_g("credit_delta", intensity=0.03 + h)
                             - crn_g("credit_delta", intensity=0.03 - h))
            / (2 * h),
            "cross_gamma": (crn_g("credit_delta", s=100 + hs)
                            - crn_g("credit_delta", s=100 - hs)) / (2 * hs),
        }
        for name, want in fd2.items():
            r = getattr(res, name)
            tol = 5 * float(r.std_error) + abs(want) * 5e-3
            assert abs(float(r.price) - want) < tol, (name, float(r.price),
                                                      want)

    @pytest.mark.slow
    def test_portfolio_greeks_match_portfolio_fd(self):
        # Two-strike all-long portfolio: gate the spot delta against the
        # exact portfolio closed form (mixed-sign netting has no closed
        # form — that case is covered by the CRN-bump WWR gate above).
        import numpy as np_

        from mctpu import engine
        from mctpu import math as mcmath
        from mctpu.types import CvaPortfolioSpec
        port = CvaPortfolioSpec(
            intensity=0.03, lgd=0.6, s=100.0, r=0.05, v=0.2, t=1.0,
            strikes=np_.array([100.0, 120.0]),
            weights=np_.array([1.0, 0.5]), n_grid=10)
        res = engine.greeks_cva(port, 1 << 16, KEY, self._cfg())

        def cf(s):
            return float(mcmath.cva_portfolio_closed_form(
                0.03, 0.6, s, 0.05, 0.2, 1.0, port.strikes, port.weights,
                10))

        want = (cf(100 + 1e-2) - cf(100 - 1e-2)) / 2e-2
        z = (float(res.delta.price) - want) / float(res.delta.std_error)
        assert abs(z) < 4.0, (z, float(res.delta.price), want)

    @pytest.mark.slow
    def test_netted_mixed_sign_delta_matches_crn_bump(self):
        # Mixed-sign netting set (long call + short higher-strike call):
        # the exposure floor BINDS here, so gate against CRN bumps of the
        # MC pricer itself.
        import dataclasses

        import numpy as np_

        from mctpu import engine
        from mctpu.types import CvaPortfolioSpec
        port = CvaPortfolioSpec(
            intensity=0.03, lgd=0.6, s=100.0, r=0.05, v=0.2, t=1.0,
            strikes=np_.array([100.0, 120.0]),
            weights=np_.array([1.0, -0.5]), n_grid=10)
        cfg = self._cfg()
        res = engine.greeks_cva(port, 1 << 16, KEY, cfg)

        def crn(s):
            pb = dataclasses.replace(port, s=s)
            return float(engine.price_cva_portfolio(pb, 1 << 16, KEY,
                                                    cfg).cva)

        want = (crn(100 * 1.001) - crn(100 * 0.999)) / 0.2
        tol = 5 * float(res.delta.std_error) + abs(want) * 5e-3
        assert abs(float(res.delta.price) - want) < tol, (
            float(res.delta.price), want)

    @pytest.mark.slow
    def test_pallas_interpret_twin_consistent(self):
        from mctpu import engine
        icfg = self._cfg(num_blocks=4, backend="pallas", interpret=True)
        spec = self._spec(n_grid=10)
        gi = engine.greeks_cva(spec, 1 << 13, KEY, icfg)
        gx = engine.greeks_cva(spec, 1 << 15, jax.random.key(77),
                               self._cfg())
        for name in ("cva", "credit_delta", "delta", "vega"):
            a, b = getattr(gi, name), getattr(gx, name)
            se = np.hypot(float(a.std_error), float(b.std_error))
            assert abs(float(a.price) - float(b.price)) < 5 * se, name

    @pytest.mark.slow
    def test_bitwise_shard_invariant(self):
        from mctpu import engine
        from mctpu.parallel import path_mesh
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        spec = self._spec(n_grid=10)
        base = engine.greeks_cva(spec, 1 << 14, KEY, self._cfg(mesh=None))
        shard = engine.greeks_cva(spec, 1 << 14, KEY,
                                  self._cfg(mesh=path_mesh(devs[:8])))
        for name in ("cva", "credit_delta", "delta", "vega"):
            b, s = getattr(base, name), getattr(shard, name)
            assert float(b.price) == float(s.price), name
            assert float(b.ci) == float(s.ci), name


class TestEngineGreeksBarrier:
    """Round-4 engine-tier barrier Greeks: likelihood-ratio estimators
    (unbiased under the knock-out discontinuity, Glasserman sec. 7.3),
    gated against CRN bumps of the MC pricer and FD of the BGK-corrected
    closed form."""

    @staticmethod
    def _opt(n_obs=16, kind="up-and-out", barrier=130.0):
        from mctpu.types import BarrierOption
        return BarrierOption(100.0, 100.0, 0.05, 0.2, 1.0, barrier=barrier,
                             n_obs=n_obs, kind=kind)

    @staticmethod
    def _cfg(**kw):
        from mctpu import engine
        kw.setdefault("num_blocks", 16)
        kw.setdefault("rows", 8)
        kw.setdefault("backend", "xla")
        return engine.EngineConfig(**kw)

    @pytest.mark.slow
    def test_price_matches_pricer(self):
        from mctpu import engine
        opt = self._opt()
        g = engine.greeks_barrier(opt, 1 << 17, KEY, self._cfg())
        p = engine.price_barrier(opt, 1 << 17, KEY, self._cfg())
        assert float(g.price.price) == pytest.approx(float(p.price),
                                                     rel=1e-6)

    @pytest.mark.slow
    def test_delta_vega_rho_match_crn_bumps(self):
        import dataclasses

        from mctpu import engine
        opt = self._opt()
        cfg = self._cfg()
        g = engine.greeks_barrier(opt, 1 << 19, KEY, cfg)

        def crn(**bump):
            ob = dataclasses.replace(opt, **bump)
            return float(engine.price_barrier(ob, 1 << 19, KEY, cfg).price)

        fd = {
            "delta": (crn(s=100.5) - crn(s=99.5)) / 1.0,
            "vega": (crn(v=0.2 + 5e-3) - crn(v=0.2 - 5e-3)) / 1e-2,
            "rho": (crn(r=0.05 + 1e-3) - crn(r=0.05 - 1e-3)) / 2e-3,
        }
        for name, want in fd.items():
            r = getattr(g, name)
            # LR variance is the price of unbiasedness; CRN FD has its own
            # noise + O(h^2) bias -> combined gate.
            tol = 5 * float(r.std_error) + abs(want) * 2e-2 + 2e-3
            assert abs(float(r.price) - want) < tol, (name, float(r.price),
                                                      want)

    def test_delta_matches_bgk_closed_form_fd(self):
        from mctpu import engine
        opt = self._opt(n_obs=50)
        g = engine.greeks_barrier(opt, 1 << 20, KEY, self._cfg())

        def cf(s):
            beff = float(mcmath.barrier_continuity_correction(
                130.0, s, 0.2, 1.0, 50, up=True))
            return float(mcmath.up_and_out_call(s, 100.0, 0.05, 0.2, 1.0,
                                                beff))

        want = (cf(100.5) - cf(99.5)) / 1.0
        z = (float(g.delta.price) - want) / float(g.delta.std_error)
        # BGK is itself an O(1/sqrt(n_obs)) approximation -> wide gate.
        assert abs(z) < 6, (z, float(g.delta.price), want)

    @pytest.mark.slow
    def test_down_and_out_variant(self):
        import dataclasses

        from mctpu import engine
        opt = self._opt(kind="down-and-out", barrier=80.0)
        cfg = self._cfg()
        g = engine.greeks_barrier(opt, 1 << 18, KEY, cfg)

        def crn(s):
            ob = dataclasses.replace(opt, s=s)
            return float(engine.price_barrier(ob, 1 << 18, KEY, cfg).price)

        want = (crn(100.5) - crn(99.5)) / 1.0
        tol = 5 * float(g.delta.std_error) + abs(want) * 2e-2
        assert abs(float(g.delta.price) - want) < tol

    @pytest.mark.slow
    def test_pallas_interpret_twin_consistent(self):
        from mctpu import engine
        opt = self._opt(n_obs=8)
        x = engine.greeks_barrier(opt, 1 << 15, KEY, self._cfg())
        pcfg = self._cfg(num_blocks=4, backend="pallas", interpret=True)
        p = engine.greeks_barrier(opt, 1 << 15, KEY, pcfg)
        for name in ("price", "delta", "vega", "rho"):
            xa, pa = getattr(x, name), getattr(p, name)
            se = np.hypot(float(xa.std_error), float(pa.std_error))
            assert abs(float(xa.price) - float(pa.price)) < 5 * se, name

    def test_dispatcher_and_shard_invariance(self):
        from mctpu import engine
        from mctpu.parallel import path_mesh
        opt = self._opt(n_obs=8)
        g = engine.greeks(opt, 1 << 14, KEY, self._cfg())
        assert g.rho is not None
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        base = engine.greeks_barrier(opt, 1 << 14, KEY, self._cfg())
        shard = engine.greeks_barrier(opt, 1 << 14, KEY,
                                      self._cfg(mesh=path_mesh(devs[:8])))
        for name in ("price", "delta", "vega", "rho"):
            assert float(getattr(base, name).price) == float(
                getattr(shard, name).price), name


class TestEngineGreeksHeston:
    """Round-4 engine-tier Heston Greeks: forward-mode tangents of the
    full-truncation Euler walk (pathwise — the call payoff is continuous
    in s0/v0/r), gated against CRN bumps of the same scheme and FD of the
    characteristic-function price."""

    @staticmethod
    def _opt(**kw):
        from mctpu.types import HestonOption
        d = dict(s=100.0, k=100.0, t=1.0, r=0.03, v0=0.09, kappa=2.0,
                 theta=0.09, xi=0.4, rho=-0.6)
        d.update(kw)
        return HestonOption(**d)

    @staticmethod
    def _cfg(**kw):
        from mctpu import engine
        kw.setdefault("num_blocks", 16)
        kw.setdefault("rows", 8)
        kw.setdefault("backend", "xla")
        return engine.EngineConfig(**kw)

    @pytest.mark.slow
    def test_price_matches_pricer(self):
        from mctpu import engine
        opt = self._opt()
        g = engine.greeks_heston(opt, 1 << 17, KEY, self._cfg(), n_steps=24)
        p = engine.price_heston(opt, 1 << 17, KEY, self._cfg(), n_steps=24)
        # Same streams/geometry; the tangent walk folds dt slightly
        # differently (half_dt vs sqdt^2) -> last-ulps drift over steps.
        assert float(g.price.price) == pytest.approx(float(p.price),
                                                     rel=1e-4)

    @pytest.mark.slow
    def test_greeks_match_crn_bumps(self):
        import dataclasses

        from mctpu import engine
        opt = self._opt()
        cfg = self._cfg()
        g = engine.greeks_heston(opt, 1 << 19, KEY, cfg, n_steps=30)

        def crn(**bump):
            ob = dataclasses.replace(opt, **bump)
            return float(engine.price_heston(ob, 1 << 19, KEY, cfg,
                                             n_steps=30).price)

        fd = {
            "delta": (crn(s=100.5) - crn(s=99.5)) / 1.0,
            "vega": (crn(v0=0.092) - crn(v0=0.088)) / 4e-3,
            "rho": (crn(r=0.032) - crn(r=0.028)) / 4e-3,
        }
        for name, want in fd.items():
            r = getattr(g, name)
            tol = 5 * float(r.std_error) + abs(want) * 1e-2
            assert abs(float(r.price) - want) < tol, (name, float(r.price),
                                                      want)

    @pytest.mark.slow
    def test_variance_tangents_match_crn_bumps(self):
        """dtheta/dkappa/dxi forward tangents vs CRN bumps of the same
        scheme — 4-5 digit agreement in this Feller-satisfied regime
        (2 kappa theta = 0.36 > xi^2; the heavy-tail caveat for violated
        regimes is documented in kernels/heston.py)."""
        import dataclasses

        from mctpu import engine
        opt = self._opt()
        cfg = self._cfg()
        g = engine.greeks_heston(opt, 1 << 17, KEY, cfg, n_steps=30)

        def crn(**bump):
            ob = dataclasses.replace(opt, **bump)
            return float(engine.price_heston(ob, 1 << 17, KEY, cfg,
                                             n_steps=30).price)

        fd = {
            "dtheta": (crn(theta=0.09 + 1e-4) - crn(theta=0.09 - 1e-4))
            / 2e-4,
            "dkappa": (crn(kappa=2.0 + 1e-2) - crn(kappa=2.0 - 1e-2))
            / 2e-2,
            "dxi": (crn(xi=0.4 + 1e-3) - crn(xi=0.4 - 1e-3)) / 2e-3,
        }
        for name, want in fd.items():
            r = getattr(g, name)
            # CRN FD of the identical streams: per-path FD == per-path
            # tangent to O(h), so the tolerance is dominated by the O(h)
            # term, not the estimator se.
            tol = 0.05 * float(r.std_error) + abs(want) * 2e-3 + 1e-4
            assert abs(float(r.price) - want) < tol, (name, float(r.price),
                                                      want)

    def test_delta_matches_cf_finite_difference(self):
        import dataclasses as dc

        from mctpu import engine
        from mctpu.models import heston as mheston
        opt = self._opt()
        g = engine.greeks_heston(opt, 1 << 19, KEY, self._cfg(),
                                 n_steps=100)
        eps = 0.5
        fd = (float(mheston.cf_call_price(dc.replace(opt, s=100 + eps)))
              - float(mheston.cf_call_price(dc.replace(opt, s=100 - eps)))
              ) / (2 * eps)
        # Pathwise delta is unbiased for the DISCRETIZED scheme; at 100
        # Euler steps the O(dt) scheme bias is within this gate.
        assert float(g.delta.price) == pytest.approx(fd, abs=0.01)

    @pytest.mark.slow
    def test_pallas_interpret_twin_consistent(self):
        from mctpu import engine
        opt = self._opt()
        x = engine.greeks_heston(opt, 1 << 15, KEY, self._cfg(), n_steps=12)
        pcfg = self._cfg(num_blocks=4, backend="pallas", interpret=True)
        p = engine.greeks_heston(opt, 1 << 15, KEY, pcfg, n_steps=12)
        for name in ("price", "delta", "vega", "rho"):
            xa, pa = getattr(x, name), getattr(p, name)
            se = np.hypot(float(xa.std_error), float(pa.std_error))
            assert abs(float(xa.price) - float(pa.price)) < 5 * se, name

    @pytest.mark.slow
    def test_dispatcher_and_shard_invariance(self):
        from mctpu import engine
        from mctpu.parallel import path_mesh
        opt = self._opt()
        g = engine.greeks(opt, 1 << 14, KEY, self._cfg())
        assert g.vega is not None
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        base = engine.greeks_heston(opt, 1 << 14, KEY, self._cfg(),
                                    n_steps=12)
        shard = engine.greeks_heston(opt, 1 << 14, KEY,
                                     self._cfg(mesh=path_mesh(devs[:8])),
                                     n_steps=12)
        for name in ("price", "delta", "vega", "rho"):
            assert float(getattr(base, name).price) == float(
                getattr(shard, name).price), name


class TestEngineGreeksAmerican:
    """Fixed-rule pathwise American Greeks (kernels/lsm.py Greeks section).

    Ground truth: finite differences of the CRR binomial lattice for the
    put (true American sensitivities — the frozen-rule estimator tracks
    them to within the rule's suboptimality), and exact Black-Scholes for
    the call (no dividends: never exercised early, so the American call
    IS European and every Greek must match the closed form).
    """

    def _cfg(self, **kw):
        from mctpu import engine
        kw.setdefault("num_blocks", 32)
        kw.setdefault("rows", 8)
        kw.setdefault("backend", "xla")
        return engine.EngineConfig(**kw)

    def _put(self, n_steps=50):
        from mctpu.types import AmericanOption
        return AmericanOption(100.0, 100.0, 0.05, 0.2, 1.0,
                              n_steps=n_steps, payoff="put")

    @pytest.fixture(scope="class")
    def bino(self):
        from mctpu import reference

        def fd(h, **kw):
            base = dict(s=100.0, r=0.05, v=0.2)

            def at(sign):
                p = dict(base)
                for nm, dh in kw.items():
                    p[nm] = p[nm] + sign * dh
                return reference.binomial_american(p["s"], 100.0, p["r"],
                                                   p["v"], 1.0, 4000, "put")
            return (at(+1) - at(-1)) / (2 * h)

        return {"delta": fd(0.25, s=0.25), "vega": fd(0.005, v=0.005),
                "rho": fd(0.002, r=0.002)}

    @pytest.fixture(scope="class")
    def res(self):
        from mctpu import engine
        return engine.greeks_american(self._put(), 1 << 18, KEY,
                                      self._cfg())

    def test_delta_matches_binomial(self, res, bino):
        z = (float(res.delta.price) - bino["delta"]) / float(
            res.delta.std_error)
        assert abs(z) < 4.0, (float(res.delta.price), bino["delta"], z)

    def test_vega_matches_binomial(self, res, bino):
        z = (float(res.vega.price) - bino["vega"]) / float(
            res.vega.std_error)
        assert abs(z) < 4.0, (float(res.vega.price), bino["vega"], z)

    def test_rho_matches_binomial_with_rule_slack(self, res, bino):
        # rho carries the frozen-rule boundary term (O(regression error) —
        # kernels/lsm.py Greeks docstring): allow 0.5 absolute on top of
        # the sampling CI (observed offset ~0.4 at pilot 2^15).
        err = abs(float(res.rho.price) - bino["rho"])
        assert err < 4 * float(res.rho.std_error) + 0.5, (
            float(res.rho.price), bino["rho"])

    def test_price_matches_pricer_crn(self, res):
        from mctpu import lsm
        p = lsm.price_american(self._put(), 1 << 18, KEY, antithetic=False,
                               config=self._cfg())
        # Same rule, same streams; fusion differences only.
        assert float(res.price.price) == pytest.approx(
            float(p.price), rel=2e-6)

    def test_delta_matches_frozen_rule_crn_fd(self, res):
        # The estimator's own definition: derivative of the frozen-policy
        # value.  CRN finite differences at h=0.5 include O(h) boundary-
        # flip noise; agreement within ~0.02 pins the pathwise identity.
        import dataclasses

        from mctpu import lsm
        opt = self._put()
        k_fit, k_price = jax.random.split(jax.random.fold_in(KEY, 0x15A1))
        beta = lsm.fit_exercise_rule(opt.s, opt.k, opt.r, opt.v, opt.t,
                                     k_fit, 1 << 15, opt.n_steps, "put",
                                     dtype=jnp.float64)
        h = 0.5

        def pr(ds):
            o2 = dataclasses.replace(opt, s=opt.s + ds)
            return float(lsm._price_forward_engine(
                o2, beta, k_price, 1 << 18, self._cfg(), False).price)

        fd = (pr(h) - pr(-h)) / (2 * h)
        assert abs(float(res.delta.price) - fd) < 0.02, (
            float(res.delta.price), fd)

    @pytest.mark.slow
    def test_call_greeks_match_black_scholes(self):
        # American call on a non-dividend asset == European call.
        from mctpu import engine
        from mctpu.types import AmericanOption
        opt = AmericanOption(100.0, 100.0, 0.05, 0.2, 1.0, n_steps=20,
                             payoff="call")
        cf = mcmath.bs_greeks(100.0, 100.0, 0.05, 0.2, 1.0)
        g = engine.greeks_american(opt, 1 << 17, KEY, self._cfg())
        for name in ("delta", "vega", "rho"):
            r = getattr(g, name)
            z = (float(r.price) - float(cf[name])) / float(r.std_error)
            assert abs(z) < 4.0, (name, float(r.price), float(cf[name]), z)

    @pytest.mark.slow
    def test_antithetic_tightens_ci(self):
        from mctpu import engine
        opt = self._put(n_steps=20)
        a = engine.greeks_american(opt, 1 << 16, KEY,
                                   self._cfg(antithetic=True))
        b = engine.greeks_american(opt, 1 << 16, KEY, self._cfg())
        assert float(a.price.ci) < float(b.price.ci)
        assert np.isfinite(float(a.delta.price))

    @pytest.mark.slow
    def test_pallas_interpret_twin_consistent(self):
        from mctpu import engine
        opt = self._put(n_steps=20)
        x = engine.greeks_american(opt, 1 << 15, KEY,
                                   self._cfg(num_blocks=8))
        pcfg = self._cfg(num_blocks=8, backend="pallas", interpret=True)
        p = engine.greeks_american(opt, 1 << 15, KEY, pcfg)
        for name in ("price", "delta", "vega", "rho"):
            xa, pa = getattr(x, name), getattr(p, name)
            se = np.hypot(float(xa.std_error), float(pa.std_error))
            assert abs(float(xa.price) - float(pa.price)) < 5 * se, name

    @pytest.mark.slow
    def test_dispatcher_and_shard_invariance(self):
        from mctpu import engine
        from mctpu.parallel import path_mesh
        opt = self._put(n_steps=20)
        g = engine.greeks(opt, 1 << 14, KEY, self._cfg())
        assert g.rho is not None and g.theta is None
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        base = engine.greeks_american(opt, 1 << 14, KEY, self._cfg())
        shard = engine.greeks_american(opt, 1 << 14, KEY,
                                       self._cfg(mesh=path_mesh(devs[:8])))
        for name in ("price", "delta", "vega", "rho"):
            b, s = getattr(base, name), getattr(shard, name)
            assert float(b.price) == float(s.price), name
            assert float(b.ci) == float(s.ci), name


class TestEngineGreeksRainbow:
    """Fused arg-extreme pathwise rainbow Greeks (engine tier).

    Two-asset Greeks gate against ``jax.grad`` of the exact Stulz (1982)
    closed form (differentiable: the bivariate CDF is Gauss-Legendre in
    jnp); three-asset against CRN bumps of the pricer; plus the exact
    ``K = 0`` identities (``rho == 0``: the discounted extreme's rate
    sensitivity cancels pathwise; ``delta_max + delta_min = 1`` per
    asset: every path's spot is the extreme of exactly one kind).
    """

    def _cfg(self, **kw):
        from mctpu import engine
        return engine.EngineConfig(num_blocks=16, rows=8, backend="xla",
                                   **kw)

    def _opt(self, kind="max", k=100.0):
        from mctpu.types import RainbowOption
        return RainbowOption(s=np.array([100.0, 95.0]),
                             v=np.array([0.2, 0.3]),
                             corr=np.array([[1.0, 0.5], [0.5, 1.0]]),
                             k=k, r=0.05, t=1.0, kind=kind)

    def _stulz_grads(self, kind):
        f = (mcmath.rainbow_min_call if kind == "min"
             else mcmath.rainbow_max_call)

        def price(s1, s2, v1, v2, r, t):
            return f(s1, s2, 100.0, r, v1, v2, 0.5, t, dtype=jnp.float64)

        args = (100.0, 95.0, 0.2, 0.3, 0.05, 1.0)
        p = float(price(*args))
        d1, d2, v1, v2, rho, th = [
            float(x) for x in
            jax.grad(price, argnums=(0, 1, 2, 3, 4, 5))(*args)]
        return {"price": p, "delta": np.array([d1, d2]),
                "vega": np.array([v1, v2]), "rho": rho, "theta": th}

    @pytest.mark.parametrize(
        "kind", ["max", pytest.param("min", marks=pytest.mark.slow)])
    def test_two_asset_matches_stulz_gradients(self, kind):
        from mctpu import engine
        res = engine.greeks_rainbow(self._opt(kind), 1 << 16, KEY,
                                    self._cfg())
        want = self._stulz_grads(kind)
        for name in ("price", "rho", "theta"):
            r = getattr(res, name)
            z = (float(r.price) - want[name]) / max(float(r.std_error),
                                                    1e-12)
            assert abs(z) < 4.0, (kind, name, float(r.price), want[name])
        for name in ("delta", "vega"):
            r = getattr(res, name)
            z = (np.asarray(r.price) - want[name]) / np.maximum(
                np.asarray(r.std_error), 1e-12)
            assert (np.abs(z) < 4.0).all(), (kind, name,
                                             np.asarray(r.price),
                                             want[name])
        assert res.gamma is None  # documented: no sign-definite tilt

    @pytest.mark.slow
    def test_k_zero_identities(self):
        """rho == 0 exactly in expectation; per-asset max+min deltas = 1."""
        from mctpu import engine
        gmax = engine.greeks_rainbow(self._opt("max", k=0.0), 1 << 17, KEY,
                                     self._cfg())
        gmin = engine.greeks_rainbow(self._opt("min", k=0.0), 1 << 17, KEY,
                                     self._cfg())
        # The rho integrand t*K*ind is identically zero at K = 0.
        assert float(gmax.rho.price) == 0.0
        assert float(gmin.rho.price) == 0.0
        d = np.asarray(gmax.delta.price) + np.asarray(gmin.delta.price)
        se = np.hypot(np.asarray(gmax.delta.std_error),
                      np.asarray(gmin.delta.std_error))
        assert (np.abs(d - 1.0) < 4 * se).all(), d

    @pytest.mark.slow
    def test_three_asset_matches_crn_bumps(self):
        """No closed form at a = 3: CRN bump the pricer (shared streams)."""
        import dataclasses as dc

        from mctpu import engine
        from mctpu.types import RainbowOption
        corr = np.array([[1.0, 0.3, 0.2], [0.3, 1.0, 0.4],
                         [0.2, 0.4, 1.0]])
        opt = RainbowOption(s=np.array([100.0, 98.0, 102.0]),
                            v=np.array([0.2, 0.25, 0.3]), corr=corr,
                            k=100.0, r=0.05, t=1.0, kind="max")
        g = engine.greeks_rainbow(opt, 1 << 17, KEY, self._cfg())

        def price(o):
            return float(engine.price_rainbow(o, 1 << 17, KEY,
                                              self._cfg()).price)

        h = 0.25
        for i in range(3):
            e = np.zeros(3)
            e[i] = h
            fd = (price(dc.replace(opt, s=opt.s + e))
                  - price(dc.replace(opt, s=opt.s - e))) / (2 * h)
            got = float(np.asarray(g.delta.price)[i])
            assert got == pytest.approx(fd, abs=0.01), (i, got, fd)
        hv = 0.005
        for i in range(3):
            e = np.zeros(3)
            e[i] = hv
            fd = (price(dc.replace(opt, v=opt.v + e))
                  - price(dc.replace(opt, v=opt.v - e))) / (2 * hv)
            got = float(np.asarray(g.vega.price)[i])
            assert got == pytest.approx(fd, rel=0.05, abs=0.3), (i, got, fd)
        hr = 1e-3
        fd = (price(dc.replace(opt, r=opt.r + hr))
              - price(dc.replace(opt, r=opt.r - hr))) / (2 * hr)
        assert float(g.rho.price) == pytest.approx(fd, rel=0.02, abs=0.1)
        ht = 1e-3
        fd = (price(dc.replace(opt, t=opt.t + ht))
              - price(dc.replace(opt, t=opt.t - ht))) / (2 * ht)
        assert float(g.theta.price) == pytest.approx(fd, rel=0.03, abs=0.1)

    @pytest.mark.slow
    def test_antithetic_variant(self):
        from mctpu import engine
        res = engine.greeks_rainbow(self._opt("max"), 1 << 17, KEY,
                                    self._cfg(antithetic=True))
        want = self._stulz_grads("max")
        z = (float(res.price.price) - want["price"]) / max(
            float(res.price.std_error), 1e-12)
        assert abs(z) < 4.0
        zd = (np.asarray(res.delta.price) - want["delta"]) / np.asarray(
            res.delta.std_error)
        assert (np.abs(zd) < 4.0).all()

    @pytest.mark.slow
    def test_pallas_interpret_twin_consistent(self):
        from mctpu import engine
        x = engine.greeks_rainbow(self._opt("max"), 1 << 14, KEY,
                                  self._cfg())
        pcfg = engine.EngineConfig(num_blocks=16, rows=8, backend="pallas",
                                   interpret=True)
        p = engine.greeks_rainbow(self._opt("max"), 1 << 14, KEY, pcfg)
        for name in ("price", "rho", "theta"):
            xa, pa = getattr(x, name), getattr(p, name)
            se = np.hypot(float(xa.std_error), float(pa.std_error))
            assert abs(float(xa.price) - float(pa.price)) < 5 * se, name
        for name in ("delta", "vega"):
            xa, pa = getattr(x, name), getattr(p, name)
            se = np.hypot(np.asarray(xa.std_error),
                          np.asarray(pa.std_error))
            diff = np.abs(np.asarray(xa.price) - np.asarray(pa.price))
            assert (diff < 5 * se).all(), name

    @pytest.mark.slow
    def test_dispatcher_and_shard_invariance(self):
        from mctpu import engine
        from mctpu.parallel import path_mesh
        opt = self._opt("min")
        base = engine.greeks(opt, 1 << 14, KEY, self._cfg())
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        shard = engine.greeks_rainbow(opt, 1 << 14, KEY,
                                      self._cfg(mesh=path_mesh(devs[:8])))
        for name in ("price", "delta", "vega", "rho", "theta"):
            b, s = getattr(base, name), getattr(shard, name)
            np.testing.assert_array_equal(np.asarray(b.price),
                                          np.asarray(s.price), err_msg=name)
            np.testing.assert_array_equal(np.asarray(b.ci),
                                          np.asarray(s.ci), err_msg=name)

    def test_large_rainbow_raises_with_guidance(self):
        from mctpu import engine
        from mctpu.types import RainbowOption
        a = 9
        opt = RainbowOption(s=np.full(a, 100.0), v=np.full(a, 0.2),
                            corr=np.eye(a), k=100.0, r=0.05, t=1.0)
        with pytest.raises(ValueError, match="asset-major"):
            engine.greeks_rainbow(opt, 1 << 12, KEY, self._cfg())


class TestEngineGreeksVarswap:
    """Fair-strike sensitivities fused into the realized-variance walk.

    GBM gates against ``jax.grad`` of the EXACT discrete oracle
    ``v^2 + (r - v^2/2)^2 T/n`` (every output, any n); Heston against
    CRN bumps of ``fair_variance_strike`` (exact — shared draw streams)
    and the continuous-limit closed form.  Spot delta is identically
    zero in both dynamics and must come back exact ``0 ± 0``.
    """

    def _cfg(self, **kw):
        from mctpu import engine
        return engine.EngineConfig(num_blocks=16, rows=8, backend="xla",
                                   **kw)

    def _gbm(self):
        return VanillaOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0)

    def _heston(self):
        from mctpu.types import HestonOption
        return HestonOption(s=100.0, k=100.0, r=0.03, t=1.0, v0=0.09,
                            kappa=2.0, theta=0.06, xi=0.3, rho=-0.6)

    def test_gbm_matches_exact_discrete_oracle(self):
        from mctpu import engine
        n = 16
        g = engine.greeks_varswap(self._gbm(), 1 << 17, KEY, self._cfg(),
                                  n_obs=n)

        def K(v, r, t):
            mu = r - 0.5 * v * v
            return v * v + mu * mu * t / n

        kv, kr, kt = jax.grad(K, argnums=(0, 1, 2))(0.2, 0.05, 1.0)
        want = {"price": float(K(0.2, 0.05, 1.0)), "vega": float(kv),
                "rho": float(kr), "theta": float(kt)}
        for nm in ("price", "vega", "rho", "theta"):
            r = getattr(g, nm)
            z = (float(r.price) - want[nm]) / max(float(r.std_error),
                                                  1e-15)
            assert abs(z) < 4.0, (nm, float(r.price), want[nm], z)

    @pytest.mark.slow
    def test_delta_exactly_zero(self):
        from mctpu import engine
        g = engine.greeks_varswap(self._gbm(), 1 << 14, KEY, self._cfg(),
                                  n_obs=8)
        assert float(g.delta.price) == 0.0
        assert float(g.delta.std_error) == 0.0
        gh = engine.greeks_varswap(self._heston(), 1 << 14, KEY,
                                   self._cfg(), n_obs=8)
        assert float(gh.delta.price) == 0.0

    @pytest.mark.slow
    def test_heston_tangents_match_crn_bumps(self):
        """Forward-mode tangents vs CRN central differences of the
        pricer (identical draw streams make the FD noise cancel)."""
        import dataclasses as dc

        from mctpu import engine
        opt = self._heston()
        n, g_obs = 1 << 16, 32
        gh = engine.greeks_varswap(opt, n, KEY, self._cfg(), n_obs=g_obs)

        def fair(o):
            return float(engine.fair_variance_strike(
                o, n, KEY, self._cfg(), n_obs=g_obs).price)

        for nm, field, h in (("v0", "vega", 1e-3), ("theta", "dtheta", 1e-3),
                             ("kappa", "dkappa", 1e-2), ("xi", "dxi", 1e-2)):
            up = fair(dc.replace(opt, **{nm: getattr(opt, nm) + h}))
            dn = fair(dc.replace(opt, **{nm: getattr(opt, nm) - h}))
            fd = (up - dn) / (2 * h)
            r = getattr(gh, field)
            tol = 5 * float(r.std_error) + 2e-3 * abs(fd) + 2e-5
            assert abs(float(r.price) - fd) < tol, (nm, float(r.price), fd)

    def test_heston_matches_continuous_closed_form(self):
        from mctpu import engine
        opt = self._heston()
        gh = engine.greeks_varswap(opt, 1 << 16, KEY, self._cfg(),
                                   n_obs=256)

        def K(v0, th, ka):
            e = (1.0 - jnp.exp(-ka)) / ka
            return th + (v0 - th) * e

        dv0, dth, dka = jax.grad(K, argnums=(0, 1, 2))(0.09, 0.06, 2.0)
        want = {"price": float(K(0.09, 0.06, 2.0)), "vega": float(dv0),
                "dtheta": float(dth), "dkappa": float(dka)}
        for nm in ("price", "vega", "dtheta", "dkappa"):
            r = getattr(gh, nm)
            # 4 sigma + 1% discretization slack (n = 256 vs the n -> inf
            # closed form).
            tol = 4 * float(r.std_error) + 0.01 * abs(want[nm])
            assert abs(float(r.price) - want[nm]) < tol, (nm,
                                                          float(r.price),
                                                          want[nm])

    @pytest.mark.slow
    def test_antithetic_variant(self):
        from mctpu import engine
        n = 16
        g = engine.greeks_varswap(self._gbm(), 1 << 16, KEY,
                                  self._cfg(antithetic=True), n_obs=n)
        mu = 0.05 - 0.5 * 0.2 * 0.2
        want = 0.2 * 0.2 + mu * mu / n
        z = (float(g.price.price) - want) / max(float(g.price.std_error),
                                                1e-15)
        assert abs(z) < 4.0

    @pytest.mark.slow
    def test_pallas_interpret_twin_consistent(self):
        from mctpu import engine
        pcfg = engine.EngineConfig(num_blocks=8, rows=8, backend="pallas",
                                   interpret=True)
        for opt, fields in ((self._gbm(), ("price", "vega", "rho",
                                           "theta")),
                            (self._heston(), ("price", "vega", "dtheta",
                                              "dkappa", "dxi", "rho"))):
            x = engine.greeks_varswap(opt, 1 << 13, KEY, self._cfg(),
                                      n_obs=8)
            p = engine.greeks_varswap(opt, 1 << 13, KEY, pcfg, n_obs=8)
            for name in fields:
                xa, pa = getattr(x, name), getattr(p, name)
                se = np.hypot(float(xa.std_error), float(pa.std_error))
                d = abs(float(xa.price) - float(pa.price))
                assert d < 5 * se + 1e-9, (type(opt).__name__, name)

    @pytest.mark.slow
    def test_shard_invariance(self):
        from mctpu import engine
        from mctpu.parallel import path_mesh
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        for opt in (self._gbm(), self._heston()):
            base = engine.greeks_varswap(opt, 1 << 14, KEY, self._cfg(),
                                         n_obs=8)
            shard = engine.greeks_varswap(
                opt, 1 << 14, KEY, self._cfg(mesh=path_mesh(devs[:8])),
                n_obs=8)
            for name in ("price", "vega", "rho"):
                assert float(getattr(base, name).price) == float(
                    getattr(shard, name).price), name


class TestEngineGreeksLadder:
    """Per-strike risk ladder: six Greek vectors from one path sweep."""

    STRIKES = np.array([80.0, 90.0, 100.0, 110.0, 120.0])

    def _cfg(self, **kw):
        from mctpu import engine
        return engine.EngineConfig(num_blocks=16, rows=8, backend="xla",
                                   **kw)

    def _want(self, km, kind):
        cf = {k: float(v) for k, v in
              mcmath.bs_greeks(100.0, km, 0.05, 0.2, 1.0).items()}
        if kind == "put":
            disc = np.exp(-0.05)
            cf["price"] -= 100.0 - km * disc
            cf["delta"] -= 1.0
            cf["rho"] -= km * disc
            cf["theta"] -= 0.05 * km * disc
        return cf

    @pytest.mark.parametrize(
        "kind", ["call", pytest.param("put", marks=pytest.mark.slow)])
    def test_each_strike_matches_bs(self, kind):
        from mctpu import engine
        opt = VanillaOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0,
                            kind=kind)
        g = engine.greeks_vanilla_ladder(opt, self.STRIKES, 1 << 17, KEY,
                                         self._cfg())
        for i, km in enumerate(self.STRIKES):
            cf = self._want(float(km), kind)
            for nm in ("price", "delta", "vega", "rho", "theta", "gamma"):
                r = getattr(g, nm)
                got = float(np.asarray(r.price)[i])
                se = max(float(np.asarray(r.std_error)[i]), 1e-12)
                assert abs(got - cf[nm]) < 4 * se, (kind, float(km), nm,
                                                    got, cf[nm])

    @pytest.mark.slow
    def test_ladder_matches_single_strike_kernel(self):
        """Strike m of the ladder == greeks_vanilla at that strike up to
        draw-stream differences (gate via z-scores between the two)."""
        from mctpu import engine
        opt = VanillaOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0)
        g = engine.greeks_vanilla_ladder(opt, self.STRIKES, 1 << 16, KEY,
                                         self._cfg())
        import dataclasses as dc
        single = engine.greeks_vanilla(dc.replace(opt, k=110.0), 1 << 16,
                                       KEY, self._cfg())
        i = 3  # strike 110
        for nm in ("price", "delta", "vega", "rho", "theta", "gamma"):
            a = float(np.asarray(getattr(g, nm).price)[i])
            b = float(getattr(single, nm).price)
            se = np.hypot(float(np.asarray(getattr(g, nm).std_error)[i]),
                          float(getattr(single, nm).std_error))
            assert abs(a - b) < 5 * se, (nm, a, b)

    @pytest.mark.slow
    def test_arbitrage_consistency_of_greek_ladders(self):
        """Comonotone draws: call delta/price ladders monotone in K
        path-exactly (not just within noise)."""
        from mctpu import engine
        opt = VanillaOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0)
        g = engine.greeks_vanilla_ladder(opt, self.STRIKES, 1 << 15, KEY,
                                         self._cfg())
        assert (np.diff(np.asarray(g.price.price)) < 0).all()
        assert (np.diff(np.asarray(g.delta.price)) < 0).all()

    @pytest.mark.slow
    def test_antithetic_variant(self):
        from mctpu import engine
        opt = VanillaOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0)
        g = engine.greeks_vanilla_ladder(opt, self.STRIKES, 1 << 16, KEY,
                                         self._cfg(antithetic=True))
        for i, km in enumerate(self.STRIKES):
            cf = self._want(float(km), "call")
            got = float(np.asarray(g.delta.price)[i])
            se = max(float(np.asarray(g.delta.std_error)[i]), 1e-12)
            assert abs(got - cf["delta"]) < 4 * se

    @pytest.mark.slow
    def test_pallas_interpret_twin_consistent(self):
        from mctpu import engine
        opt = VanillaOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0)
        ks = np.array([90.0, 100.0, 110.0])
        x = engine.greeks_vanilla_ladder(opt, ks, 1 << 13, KEY, self._cfg())
        pcfg = engine.EngineConfig(num_blocks=8, rows=8, backend="pallas",
                                   interpret=True)
        p = engine.greeks_vanilla_ladder(opt, ks, 1 << 13, KEY, pcfg)
        for nm in ("price", "delta", "vega", "rho", "theta", "gamma"):
            xa, pa = getattr(x, nm), getattr(p, nm)
            se = np.hypot(np.asarray(xa.std_error),
                          np.asarray(pa.std_error))
            d = np.abs(np.asarray(xa.price) - np.asarray(pa.price))
            assert (d < 5 * se).all(), nm

    @pytest.mark.slow
    def test_shard_invariance(self):
        from mctpu import engine
        from mctpu.parallel import path_mesh
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        opt = VanillaOption(s=100.0, k=100.0, r=0.05, v=0.2, t=1.0)
        base = engine.greeks_vanilla_ladder(opt, self.STRIKES, 1 << 14,
                                            KEY, self._cfg())
        shard = engine.greeks_vanilla_ladder(
            opt, self.STRIKES, 1 << 14, KEY,
            self._cfg(mesh=path_mesh(devs[:8])))
        for nm in ("price", "delta", "vega", "rho", "theta", "gamma"):
            np.testing.assert_array_equal(
                np.asarray(getattr(base, nm).price),
                np.asarray(getattr(shard, nm).price), err_msg=nm)


class TestEngineGreeksCvaMulti:
    """Netting-set CVA Greeks over correlated underlyings.

    All-long weights admit the exact closed form
    (``cva_multi_closed_form``), so credit delta and every per-underlying
    delta/vega gate against its f64 finite differences; mixed-sign
    netting (no closed form) gates against CRN bumps of the pricer
    (shared draw streams on the XLA twin make them exact).
    """

    CORR = np.array([[1.0, 0.4, 0.2], [0.4, 1.0, 0.3], [0.2, 0.3, 1.0]])

    def _cfg(self, **kw):
        from mctpu import engine
        return engine.EngineConfig(num_blocks=16, rows=8, backend="xla",
                                   **kw)

    def _spec(self, weights=(1.0, 0.5, 0.8), n_grid=25):
        from mctpu.types import CvaMultiSpec
        return CvaMultiSpec(intensity=0.03, lgd=0.6,
                            s=np.array([100.0, 95.0, 105.0]),
                            v=np.array([0.2, 0.25, 0.3]), corr=self.CORR,
                            r=0.05, t=1.0,
                            strikes=np.array([100.0, 90.0, 110.0]),
                            weights=np.asarray(weights, np.float64),
                            n_grid=n_grid)

    def _cf(self, sp):
        return float(mcmath.cva_multi_closed_form(
            sp.intensity, sp.lgd, sp.s, sp.v, sp.strikes, sp.weights,
            sp.r, sp.t, sp.n_grid))

    def test_all_long_matches_closed_form_fd(self):
        import dataclasses as dc

        from mctpu import engine
        spec = self._spec()
        g = engine.greeks_cva_multi(spec, 1 << 16, KEY, self._cfg())
        zc = (float(g.cva.price) - self._cf(spec)) / float(
            g.cva.std_error)
        assert abs(zc) < 4.0, zc
        h = 1e-4
        fd = (self._cf(dc.replace(spec, intensity=0.03 + h))
              - self._cf(dc.replace(spec, intensity=0.03 - h))) / (2 * h)
        zl = (float(g.credit_delta.price) - fd) / float(
            g.credit_delta.std_error)
        assert abs(zl) < 4.0, (float(g.credit_delta.price), fd)
        for i in range(3):
            e = np.zeros(3)
            e[i] = 0.05
            fd = (self._cf(dc.replace(spec, s=spec.s + e))
                  - self._cf(dc.replace(spec, s=spec.s - e))) / 0.1
            got = float(np.asarray(g.delta.price)[i])
            se = float(np.asarray(g.delta.std_error)[i])
            assert abs(got - fd) < 4 * se, ("delta", i, got, fd)
            e[i] = 1e-3
            fdv = (self._cf(dc.replace(spec, v=spec.v + e))
                   - self._cf(dc.replace(spec, v=spec.v - e))) / 2e-3
            gotv = float(np.asarray(g.vega.price)[i])
            sev = float(np.asarray(g.vega.std_error)[i])
            assert abs(gotv - fdv) < 4 * sev, ("vega", i, gotv, fdv)
        assert g.gamma is None and g.credit_gamma is None

    @pytest.mark.slow
    def test_mixed_sign_netting_matches_crn_bumps(self):
        """Short positions bind the netting floor: gate vs CRN bumps."""
        import dataclasses as dc

        from mctpu import engine
        spec = self._spec(weights=(1.0, -0.6, 0.8), n_grid=10)
        n = 1 << 16
        g = engine.greeks_cva_multi(spec, n, KEY, self._cfg())

        def price(sp):
            return float(engine.price_cva_multi(sp, n, KEY,
                                                self._cfg()).cva)

        assert float(g.cva.price) == pytest.approx(price(spec), rel=1e-5)
        h = 1e-4
        fd = (price(dc.replace(spec, intensity=0.03 + h))
              - price(dc.replace(spec, intensity=0.03 - h))) / (2 * h)
        tol = 5 * float(g.credit_delta.std_error) + 2e-3 * abs(fd)
        assert abs(float(g.credit_delta.price) - fd) < tol
        for i in range(3):
            e = np.zeros(3)
            e[i] = 0.1
            fd = (price(dc.replace(spec, s=spec.s + e))
                  - price(dc.replace(spec, s=spec.s - e))) / 0.2
            got = float(np.asarray(g.delta.price)[i])
            assert got == pytest.approx(fd, abs=3e-4), ("delta", i)
            e[i] = 2e-3
            fdv = (price(dc.replace(spec, v=spec.v + e))
                   - price(dc.replace(spec, v=spec.v - e))) / 4e-3
            gotv = float(np.asarray(g.vega.price)[i])
            assert gotv == pytest.approx(fdv, rel=0.03, abs=2e-3), \
                ("vega", i)

    @pytest.mark.slow
    def test_antithetic_variant(self):
        from mctpu import engine
        spec = self._spec(n_grid=10)
        g = engine.greeks_cva_multi(spec, 1 << 15, KEY,
                                    self._cfg(antithetic=True))
        zc = (float(g.cva.price) - self._cf(spec)) / float(g.cva.std_error)
        assert abs(zc) < 4.0

    @pytest.mark.slow
    def test_pallas_interpret_twin_consistent(self):
        from mctpu import engine
        spec = self._spec(n_grid=6)
        x = engine.greeks_cva_multi(spec, 1 << 13, KEY, self._cfg())
        pcfg = engine.EngineConfig(num_blocks=8, rows=8, backend="pallas",
                                   interpret=True)
        p = engine.greeks_cva_multi(spec, 1 << 13, KEY, pcfg)
        for name in ("cva", "credit_delta"):
            xa, pa = getattr(x, name), getattr(p, name)
            se = np.hypot(float(xa.std_error), float(pa.std_error))
            assert abs(float(xa.price) - float(pa.price)) < 5 * se, name
        for name in ("delta", "vega"):
            xa, pa = getattr(x, name), getattr(p, name)
            se = np.hypot(np.asarray(xa.std_error),
                          np.asarray(pa.std_error))
            d = np.abs(np.asarray(xa.price) - np.asarray(pa.price))
            assert (d < 5 * se).all(), name

    @pytest.mark.slow
    def test_dispatcher_and_shard_invariance(self):
        from mctpu import engine
        from mctpu.parallel import path_mesh
        spec = self._spec(n_grid=6)
        base = engine.greeks(spec, 1 << 14, KEY, self._cfg())
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        shard = engine.greeks_cva_multi(spec, 1 << 14, KEY,
                                        self._cfg(mesh=path_mesh(devs[:8])))
        for name in ("cva", "credit_delta", "delta", "vega"):
            np.testing.assert_array_equal(
                np.asarray(getattr(base, name).price),
                np.asarray(getattr(shard, name).price), err_msg=name)


class TestEngineGreeksBasketAsian:
    """Basket-Asian pathwise Greeks: per-asset delta/vega + rho."""

    def _cfg(self, **kw):
        from mctpu import engine
        return engine.EngineConfig(num_blocks=16, rows=8, backend="xla",
                                   **kw)

    def _opt(self, n_obs=8):
        from mctpu.types import BasketAsianOption
        return BasketAsianOption(BasketOption.equicorrelated(3, rho=0.3),
                                 n_obs=n_obs)

    @pytest.mark.slow
    def test_price_matches_pricer_exactly(self):
        """Shared draw streams: the Greek kernel's price IS the pricer's."""
        from mctpu import engine
        opt = self._opt()
        g = engine.greeks_basket_asian(opt, 1 << 15, KEY, self._cfg())
        p = engine.price_basket_asian(opt, 1 << 15, KEY, self._cfg())
        assert float(g.price.price) == float(p.price)

    @pytest.mark.slow
    def test_matches_crn_bumps(self):
        import dataclasses as dc

        from mctpu import engine
        opt = self._opt()
        bk = opt.basket
        n = 1 << 16
        g = engine.greeks_basket_asian(opt, n, KEY, self._cfg())

        def price(o):
            return float(engine.price_basket_asian(o, n, KEY,
                                                   self._cfg()).price)

        s0 = np.asarray(bk.s, np.float64)
        v0 = np.asarray(bk.v, np.float64)
        for i in range(3):
            e = np.zeros(3)
            e[i] = 0.1
            fd = (price(dc.replace(opt, basket=dc.replace(bk, s=s0 + e)))
                  - price(dc.replace(opt, basket=dc.replace(bk, s=s0 - e)))
                  ) / 0.2
            got = float(np.asarray(g.delta.price)[i])
            assert got == pytest.approx(fd, abs=5e-4), ("delta", i)
            e[i] = 2e-3
            fdv = (price(dc.replace(opt, basket=dc.replace(bk, v=v0 + e)))
                   - price(dc.replace(opt, basket=dc.replace(bk, v=v0 - e)))
                   ) / 4e-3
            gotv = float(np.asarray(g.vega.price)[i])
            assert gotv == pytest.approx(fdv, rel=0.01, abs=0.02), \
                ("vega", i)
        h = 1e-3
        fd = (price(dc.replace(opt, basket=dc.replace(bk, r=bk.r + h)))
              - price(dc.replace(opt, basket=dc.replace(bk, r=bk.r - h)))
              ) / (2 * h)
        assert float(g.rho.price) == pytest.approx(fd, rel=5e-3)

    def test_single_asset_limit_matches_asian_kernel(self):
        """a = 1 basket-Asian == the single-asset arithmetic Asian."""
        from mctpu import engine
        from mctpu.types import AsianOption, BasketAsianOption
        bk1 = BasketOption(s=np.array([100.0]), v=np.array([0.2]),
                           w=np.array([1.0]), corr=np.eye(1),
                           d=np.zeros(1), k=100.0, r=0.05, t=1.0)
        g1 = engine.greeks_basket_asian(BasketAsianOption(bk1, n_obs=8),
                                        1 << 16, KEY, self._cfg())
        a1 = engine.greeks_asian(
            AsianOption(100.0, 100.0, 0.05, 0.2, 1.0, n_obs=8,
                        average="arithmetic"), 1 << 16, KEY, self._cfg())
        for nm in ("price", "delta", "vega", "rho"):
            x = float(np.asarray(getattr(g1, nm).price).ravel()[0])
            y = float(getattr(a1, nm).price)
            se = np.hypot(
                float(np.asarray(getattr(g1, nm).std_error).ravel()[0]),
                float(getattr(a1, nm).std_error))
            assert abs(x - y) < 5 * se + 1e-6, (nm, x, y)

    @pytest.mark.slow
    def test_antithetic_variant(self):
        from mctpu import engine
        opt = self._opt()
        g = engine.greeks_basket_asian(opt, 1 << 15, KEY,
                                       self._cfg(antithetic=True))
        ga = engine.greeks_basket_asian(opt, 1 << 15, KEY, self._cfg())
        d = np.asarray(g.delta.price) - np.asarray(ga.delta.price)
        se = np.hypot(np.asarray(g.delta.std_error),
                      np.asarray(ga.delta.std_error))
        assert (np.abs(d) < 5 * se).all()

    @pytest.mark.slow
    def test_pallas_interpret_twin_consistent(self):
        from mctpu import engine
        opt = self._opt(n_obs=4)
        x = engine.greeks_basket_asian(opt, 1 << 13, KEY, self._cfg())
        pcfg = engine.EngineConfig(num_blocks=8, rows=8, backend="pallas",
                                   interpret=True)
        p = engine.greeks_basket_asian(opt, 1 << 13, KEY, pcfg)
        for nm in ("price", "rho"):
            xa, pa = getattr(x, nm), getattr(p, nm)
            se = np.hypot(float(xa.std_error), float(pa.std_error))
            assert abs(float(xa.price) - float(pa.price)) < 5 * se, nm
        for nm in ("delta", "vega"):
            xa, pa = getattr(x, nm), getattr(p, nm)
            se = np.hypot(np.asarray(xa.std_error),
                          np.asarray(pa.std_error))
            d = np.abs(np.asarray(xa.price) - np.asarray(pa.price))
            assert (d < 5 * se).all(), nm

    @pytest.mark.slow
    def test_dispatcher_and_shard_invariance(self):
        from mctpu import engine
        from mctpu.parallel import path_mesh
        opt = self._opt(n_obs=4)
        base = engine.greeks(opt, 1 << 14, KEY, self._cfg())
        assert base.theta is None and base.gamma is None
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        shard = engine.greeks_basket_asian(
            opt, 1 << 14, KEY, self._cfg(mesh=path_mesh(devs[:8])))
        for nm in ("price", "delta", "vega", "rho"):
            np.testing.assert_array_equal(
                np.asarray(getattr(base, nm).price),
                np.asarray(getattr(shard, nm).price), err_msg=nm)


class TestEngineGreeksBasketBarrier:
    """Basket-barrier LIKELIHOOD-RATIO Greeks (pathwise is biased under
    the knockout).  Gates: the far-barrier limit must reproduce the
    European basket Greeks (tight pathwise kernel); the a = 1 limit the
    single-asset LR barrier kernel; CRN bumps within the (large, honest)
    LR standard errors."""

    def _cfg(self, **kw):
        from mctpu import engine
        return engine.EngineConfig(num_blocks=16, rows=8, backend="xla",
                                   **kw)

    def _opt(self, barrier=130.0, n_obs=8):
        from mctpu.types import BasketBarrierOption
        return BasketBarrierOption(BasketOption.equicorrelated(3, rho=0.3),
                                   barrier=barrier, n_obs=n_obs)

    @pytest.mark.slow
    def test_price_matches_pricer_exactly(self):
        from mctpu import engine
        opt = self._opt()
        g = engine.greeks_basket_barrier(opt, 1 << 15, KEY, self._cfg())
        p = engine.price_basket_barrier(opt, 1 << 15, KEY, self._cfg())
        assert float(g.price.price) == float(p.price)

    @pytest.mark.slow
    def test_far_barrier_limit_matches_european_basket_greeks(self):
        """Knockout never binds -> the LR Greeks must equal the European
        basket's pathwise Greeks in expectation."""
        from mctpu import engine
        opt = self._opt(barrier=1e5)
        g = engine.greeks_basket_barrier(opt, 1 << 17, KEY, self._cfg())
        gb = engine.greeks_basket(opt.basket, 1 << 17, KEY, self._cfg())
        for nm in ("price", "delta", "vega", "rho"):
            x = np.asarray(getattr(g, nm).price)
            y = np.asarray(getattr(gb, nm).price)
            se = np.hypot(np.asarray(getattr(g, nm).std_error),
                          np.asarray(getattr(gb, nm).std_error))
            assert (np.abs(x - y) < 4 * se).all(), (nm, x, y)

    def test_single_asset_limit_matches_barrier_kernel(self):
        from mctpu import engine
        from mctpu.types import BarrierOption, BasketBarrierOption
        bk1 = BasketOption(s=np.array([100.0]), v=np.array([0.2]),
                           w=np.array([1.0]), corr=np.eye(1),
                           d=np.zeros(1), k=100.0, r=0.05, t=1.0)
        g1 = engine.greeks_basket_barrier(
            BasketBarrierOption(bk1, barrier=130.0, n_obs=8), 1 << 16,
            KEY, self._cfg())
        b1 = engine.greeks_barrier(
            BarrierOption(100.0, 100.0, 0.05, 0.2, 1.0, barrier=130.0,
                          n_obs=8), 1 << 16, KEY, self._cfg())
        for nm in ("price", "delta", "vega", "rho"):
            x = float(np.asarray(getattr(g1, nm).price).ravel()[0])
            y = float(getattr(b1, nm).price)
            se = np.hypot(
                float(np.asarray(getattr(g1, nm).std_error).ravel()[0]),
                float(getattr(b1, nm).std_error))
            assert abs(x - y) < 5 * se + 1e-6, (nm, x, y)

    @pytest.mark.slow
    def test_matches_crn_bumps_within_lr_noise(self):
        import dataclasses as dc

        from mctpu import engine
        opt = self._opt()
        bk = opt.basket
        n = 1 << 17
        g = engine.greeks_basket_barrier(opt, n, KEY, self._cfg())

        def price(o):
            return float(engine.price_basket_barrier(o, n, KEY,
                                                     self._cfg()).price)

        s0 = np.asarray(bk.s, np.float64)
        v0 = np.asarray(bk.v, np.float64)
        for i in range(3):
            e = np.zeros(3)
            e[i] = 0.25
            fd = (price(dc.replace(opt, basket=dc.replace(bk, s=s0 + e)))
                  - price(dc.replace(opt, basket=dc.replace(bk, s=s0 - e)))
                  ) / 0.5
            got = float(np.asarray(g.delta.price)[i])
            se = float(np.asarray(g.delta.std_error)[i])
            # LR noise dominates; the FD also carries lumpy knockout-flip
            # noise, so allow both.
            assert abs(got - fd) < 6 * se + 0.003, ("delta", i, got, fd)
            e[i] = 5e-3
            fdv = (price(dc.replace(opt, basket=dc.replace(bk, v=v0 + e)))
                   - price(dc.replace(opt, basket=dc.replace(bk, v=v0 - e)))
                   ) / 0.01
            gotv = float(np.asarray(g.vega.price)[i])
            sev = float(np.asarray(g.vega.std_error)[i])
            assert abs(gotv - fdv) < 6 * sev + 0.3, ("vega", i, gotv, fdv)
        # Wider r-step: at h = 2e-3 the CRN difference is dominated by
        # knockout flips (each flip moves the FD by payoff / (2 h n)); the
        # O(h^2) bias at 1e-2 is far below the LR noise floor.
        h = 1e-2
        fd = (price(dc.replace(opt, basket=dc.replace(bk, r=bk.r + h)))
              - price(dc.replace(opt, basket=dc.replace(bk, r=bk.r - h)))
              ) / (2 * h)
        got = float(g.rho.price)
        assert abs(got - fd) < 6 * float(g.rho.std_error) + 0.3, (got, fd)

    @pytest.mark.slow
    def test_down_and_out_variant(self):
        from mctpu import engine
        from mctpu.types import BasketBarrierOption
        opt = BasketBarrierOption(BasketOption.equicorrelated(3, rho=0.3),
                                  barrier=70.0, n_obs=8,
                                  kind="down-and-out")
        g = engine.greeks_basket_barrier(opt, 1 << 15, KEY, self._cfg())
        assert np.isfinite(np.asarray(g.delta.price)).all()
        assert (np.asarray(g.delta.price) > 0).all()

    @pytest.mark.slow
    def test_pallas_interpret_twin_consistent(self):
        from mctpu import engine
        opt = self._opt(n_obs=4)
        x = engine.greeks_basket_barrier(opt, 1 << 13, KEY, self._cfg())
        pcfg = engine.EngineConfig(num_blocks=8, rows=8, backend="pallas",
                                   interpret=True)
        p = engine.greeks_basket_barrier(opt, 1 << 13, KEY, pcfg)
        for nm in ("price", "rho"):
            xa, pa = getattr(x, nm), getattr(p, nm)
            se = np.hypot(float(xa.std_error), float(pa.std_error))
            assert abs(float(xa.price) - float(pa.price)) < 5 * se, nm
        for nm in ("delta", "vega"):
            xa, pa = getattr(x, nm), getattr(p, nm)
            se = np.hypot(np.asarray(xa.std_error),
                          np.asarray(pa.std_error))
            d = np.abs(np.asarray(xa.price) - np.asarray(pa.price))
            assert (d < 5 * se).all(), nm

    @pytest.mark.slow
    def test_dispatcher_and_shard_invariance(self):
        from mctpu import engine
        from mctpu.parallel import path_mesh
        opt = self._opt(n_obs=4)
        base = engine.greeks(opt, 1 << 14, KEY, self._cfg())
        assert base.theta is None and base.gamma is None
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        shard = engine.greeks_basket_barrier(
            opt, 1 << 14, KEY, self._cfg(mesh=path_mesh(devs[:8])))
        for nm in ("price", "delta", "vega", "rho"):
            np.testing.assert_array_equal(
                np.asarray(getattr(base, nm).price),
                np.asarray(getattr(shard, nm).price), err_msg=nm)


def test_basket_barrier_greeks_rank_deficient_raises():
    """The reference's rank-deficient 3-asset corr admits no LR shift."""
    from mctpu import engine
    from mctpu.types import BasketBarrierOption
    opt = BasketBarrierOption(BasketOption.default_reference(3),
                              barrier=200.0, n_obs=4)
    with pytest.raises(ValueError, match="full-rank"):
        engine.greeks_basket_barrier(opt, 1 << 12, KEY,
                                     engine.EngineConfig(num_blocks=8,
                                                         rows=8,
                                                         backend="xla"))
