"""Bilateral xVA engine: closed forms, oracle, pricer ties, invariance.

The xVA legs are deterministic node tables times additive accumulators
(mctpu/kernels/cva_multi.py, xVA section), so they inherit the full
engine contract; the gates here pin each leg to its exact single-signed
closed form (mctpu.math.xva_multi_closed_form), the NumPy oracle for
mixed-sign netting, and the bitwise CVA-leg tie to price_cva_multi at
own_intensity = 0, funding_spread = 0.
"""
import jax
import numpy as np
import pytest

from mctpu import engine, math as mcmath, reference
from mctpu.parallel import path_mesh
from mctpu.types import CvaMultiSpec, XvaSpec

KEY = jax.random.key(4242)
CFG = engine.EngineConfig(num_blocks=8, rows=8, backend="xla")
CORR = np.array([[1.0, 0.5], [0.5, 1.0]])
NET = CvaMultiSpec(intensity=0.03, lgd=0.6, s=[100.0, 95.0], v=[0.2, 0.3],
                   corr=CORR, r=0.05, t=1.0, strikes=[100.0, 90.0],
                   weights=[0.5, 0.5], n_grid=25)
SPEC = XvaSpec(netting=NET, own_intensity=0.02, own_lgd=0.5,
               funding_spread=0.01)


def _closed(spec: XvaSpec):
    net = spec.netting
    return mcmath.xva_multi_closed_form(
        net.intensity, net.lgd, spec.own_intensity, spec.own_lgd,
        spec.funding_spread, net.s, net.v, net.strikes, net.weights,
        net.r, net.t, net.n_grid)


class TestClosedForms:
    def test_all_long_cva_and_fca_match_closed_form(self):
        res = engine.price_xva(SPEC, 1 << 16, KEY, CFG)
        cva, dva, fca, fba = (float(x) for x in _closed(SPEC))
        assert abs(float(res.cva.price) - cva) < 4 * float(res.cva.std_error)
        assert abs(float(res.fca.price) - fca) < 4 * float(res.fca.std_error)
        # All-long: the netted value never goes negative, so the
        # bank-side legs are exactly zero (not just statistically).
        assert float(res.dva.price) == 0.0 and dva == 0.0
        assert float(res.fba.price) == 0.0 and fba == 0.0
        assert np.asarray(res.ene_profile).max() == 0.0

    def test_all_short_dva_and_fba_match_closed_form(self):
        short = XvaSpec(
            netting=CvaMultiSpec(
                intensity=0.03, lgd=0.6, s=[100.0, 95.0], v=[0.2, 0.3],
                corr=CORR, r=0.05, t=1.0, strikes=[100.0, 90.0],
                weights=[-0.5, -0.5], n_grid=25),
            own_intensity=0.02, own_lgd=0.5, funding_spread=0.01)
        res = engine.price_xva(short, 1 << 16, KEY, CFG)
        cva, dva, fca, fba = (float(x) for x in _closed(short))
        assert abs(float(res.dva.price) - dva) < 4 * float(res.dva.std_error)
        assert abs(float(res.fba.price) - fba) < 4 * float(res.fba.std_error)
        assert float(res.cva.price) == 0.0 and cva == 0.0
        assert float(res.fca.price) == 0.0 and fca == 0.0

    def test_closed_form_rejects_mixed_signs(self):
        with pytest.raises(ValueError, match="single-signed"):
            mcmath.xva_multi_closed_form(0.03, 0.6, 0.02, 0.5, 0.01,
                                         [100.0, 95.0], [0.2, 0.3],
                                         [100.0, 90.0], [1.0, -1.0],
                                         0.05, 1.0, 25)

    def test_leg_weights_reduce_to_reference_table(self):
        # own_intensity = 0: w_cva must be the reference's dp table
        # bit-for-bit (same factored exp * (-expm1) form) and w_dva == 0.
        w_cva, w_dva = mcmath.xva_leg_weights(0.03, 0.0, 1.0, 25)
        dp = mcmath.default_leg_weights(0.03, 1.0, 25)
        np.testing.assert_array_equal(np.asarray(w_cva), np.asarray(dp))
        assert np.asarray(w_dva).max() == 0.0


class TestOracleAndTies:
    def test_mixed_sign_netting_vs_numpy_oracle(self):
        mixed = XvaSpec(
            netting=CvaMultiSpec(
                intensity=0.03, lgd=0.6, s=[100.0, 95.0], v=[0.2, 0.3],
                corr=CORR, r=0.05, t=1.0, strikes=[100.0, 90.0],
                weights=[1.0, -0.8], n_grid=25),
            own_intensity=0.02, own_lgd=0.5, funding_spread=0.01)
        res = engine.price_xva(mixed, 1 << 16, KEY, CFG)
        ora = reference.price_xva_multi(mixed, 1 << 16, seed=33)
        for leg in ("cva", "dva", "fca", "fba"):
            mine = getattr(res, leg)
            se = np.hypot(float(mine.std_error), ora[leg].std_error)
            assert abs(float(mine.price) - ora[leg].price) < 4 * se, leg
        # Profiles agree too (MC noise only).
        assert np.allclose(np.asarray(res.epe_profile), ora["epe"],
                           atol=0.05)
        assert np.allclose(np.asarray(res.ene_profile), ora["ene"],
                           atol=0.05)

    def test_cva_leg_ties_price_cva_multi_bitwise(self):
        # At own_intensity = 0, funding_spread = 0 the xVA sweep runs the
        # pricer's exact walk, node math and leg table -> bitwise tie.
        spec0 = XvaSpec(netting=NET, own_intensity=0.0, funding_spread=0.0)
        a = engine.price_xva(spec0, 1 << 15, KEY, CFG)
        b = engine.price_cva_multi(NET, 1 << 15, KEY, CFG)
        assert float(a.cva.price) == float(b.cva)
        assert float(a.cva.ci) == float(b.ci)
        np.testing.assert_array_equal(np.asarray(a.epe_profile),
                                      np.asarray(b.expected_exposure))

    def test_bcva_and_fva_aggregates(self):
        res = engine.price_xva(SPEC, 1 << 14, KEY, CFG)
        assert float(res.bcva) == float(res.cva.price) - float(res.dva.price)
        assert float(res.fva) == float(res.fca.price) - float(res.fba.price)
        d = res.to_dict()
        assert set(d) >= {"cva", "dva", "fca", "fba", "bcva", "fva",
                          "epe_profile", "ene_profile"}

    @pytest.mark.slow
    def test_pallas_interpret_twin(self):
        icfg = engine.EngineConfig(num_blocks=2, rows=8, backend="pallas",
                                   interpret=True)
        small = XvaSpec(
            netting=CvaMultiSpec(
                intensity=0.03, lgd=0.6, s=[100.0, 95.0], v=[0.2, 0.3],
                corr=CORR, r=0.05, t=1.0, strikes=[100.0, 90.0],
                weights=[0.5, 0.5], n_grid=10),
            own_intensity=0.02, own_lgd=0.5, funding_spread=0.01)
        res = engine.price_xva(small, 1 << 12, KEY, icfg)
        cva, _, fca, _ = (float(x) for x in _closed(small))
        assert abs(float(res.cva.price) - cva) < 4 * float(res.cva.std_error)
        assert abs(float(res.fca.price) - fca) < 4 * float(res.fca.std_error)
        assert np.asarray(res.epe_profile).shape == (10,)
        # Bitwise pricer tie holds on the Pallas backend too.
        spec0 = XvaSpec(netting=small.netting, own_intensity=0.0,
                        funding_spread=0.0)
        a = engine.price_xva(spec0, 1 << 12, KEY, icfg)
        b = engine.price_cva_multi(small.netting, 1 << 12, KEY, icfg)
        assert float(a.cva.price) == float(b.cva)
        np.testing.assert_array_equal(np.asarray(a.epe_profile),
                                      np.asarray(b.expected_exposure))

    @pytest.mark.slow
    def test_wide_set_routes_to_xla_twin(self):
        # m > ASSET_MAJOR_MAX on the Pallas backend must not error: the
        # engine reroutes to the XLA twin (same asset-major structure).
        m = 12
        corr = np.full((m, m), 0.2) + 0.8 * np.eye(m)
        wide = XvaSpec(
            netting=CvaMultiSpec(
                intensity=0.03, lgd=0.6, s=[100.0] * m, v=[0.2] * m,
                corr=corr, r=0.05, t=1.0, strikes=[100.0] * m,
                weights=[1.0 / m] * m, n_grid=5),
            own_intensity=0.02, own_lgd=0.5, funding_spread=0.01)
        pcfg = engine.EngineConfig(num_blocks=4, rows=8, backend="pallas",
                                   interpret=True)
        res = engine.price_xva(wide, 1 << 12, KEY, pcfg)
        cva = float(_closed(wide)[0])
        assert abs(float(res.cva.price) - cva) < 4 * float(res.cva.std_error)


class TestContract:
    @pytest.mark.slow
    def test_antithetic_is_consistent(self):
        acfg = engine.EngineConfig(num_blocks=8, rows=8, backend="xla",
                                   antithetic=True)
        res = engine.price_xva(SPEC, 1 << 15, KEY, acfg)
        cva = float(_closed(SPEC)[0])
        assert abs(float(res.cva.price) - cva) < 4 * float(res.cva.std_error)

    @pytest.mark.slow
    def test_shard_invariance_bitwise(self):
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        base = engine.price_xva(SPEC, 1 << 14, KEY,
                                engine.EngineConfig(num_blocks=16, rows=8,
                                                    backend="xla"))
        mesh = path_mesh(devs[:8])
        shard = engine.price_xva(SPEC, 1 << 14, KEY,
                                 engine.EngineConfig(num_blocks=16, rows=8,
                                                     backend="xla",
                                                     mesh=mesh))
        for leg in ("cva", "dva", "fca", "fba"):
            assert float(getattr(base, leg).price) == float(
                getattr(shard, leg).price), leg
        np.testing.assert_array_equal(np.asarray(base.epe_profile),
                                      np.asarray(shard.epe_profile))
        np.testing.assert_array_equal(np.asarray(base.ene_profile),
                                      np.asarray(shard.ene_profile))

    def test_validate_rejects_bad_fields(self):
        with pytest.raises(ValueError, match="own default intensity"):
            XvaSpec(netting=NET, own_intensity=-0.1).validate()
        with pytest.raises(ValueError, match="own_lgd"):
            XvaSpec(netting=NET, own_lgd=1.5).validate()
        with pytest.raises(ValueError, match="funding_spread"):
            XvaSpec(netting=NET, funding_spread=-0.01).validate()


class TestGreeksXva:
    """greeks_xva: legs + per-leg credit/funding ratios + total-xVA
    delta/vega, gated against f64 finite differences of the exact
    single-signed closed form and CRN bumps for mixed-sign netting."""

    def _closed_vec(self, lam_c=0.03, lam_b=0.02, sf=0.01, s=None, v=None,
                    weights=(0.5, 0.5)):
        import jax.numpy as jnp
        s = [100.0, 95.0] if s is None else s
        v = [0.2, 0.3] if v is None else v
        legs = mcmath.xva_multi_closed_form(
            lam_c, 0.6, lam_b, 0.5, sf, s, v, [100.0, 90.0], list(weights),
            0.05, 1.0, 25, dtype=jnp.float64)
        return np.array([float(x) for x in legs])

    def test_all_long_credit_and_funding_ratios_match_fd(self):
        res = engine.greeks_xva(SPEC, 1 << 17, KEY, CFG)
        eps = 1e-5
        fd_cpty = (self._closed_vec(lam_c=0.03 + eps)
                   - self._closed_vec(lam_c=0.03 - eps))[0] / (2 * eps)
        fd_fund = ((self._closed_vec(sf=0.01 + eps)
                    - self._closed_vec(sf=0.01 - eps)) / (2 * eps))
        assert abs(float(res.credit_cpty.price) - fd_cpty) \
            < 4 * float(res.credit_cpty.std_error)
        assert abs(float(res.funding.price) - (fd_fund[2] - fd_fund[3])) \
            < 4 * float(res.funding.std_error)
        # All-long: the bank-side outputs are exactly zero.
        assert float(res.dva.price) == 0.0
        assert float(res.credit_own.price) == 0.0
        # Leg values match price_xva's closed forms.
        legs = self._closed_vec()
        assert abs(float(res.cva.price) - legs[0]) \
            < 4 * float(res.cva.std_error)
        assert abs(float(res.fca.price) - legs[2]) \
            < 4 * float(res.fca.std_error)

    def test_all_long_delta_vega_match_fd_of_total(self):
        res = engine.greeks_xva(SPEC, 1 << 17, KEY, CFG)

        def total(s0=100.0, v0=0.2):
            c, d, f, b = self._closed_vec(s=[s0, 95.0], v=[v0, 0.3])
            return c - d + f - b

        h = 1e-3
        fd_d0 = (total(s0=100 + h) - total(s0=100 - h)) / (2 * h)
        fd_v0 = (total(v0=0.2 + 1e-5) - total(v0=0.2 - 1e-5)) / 2e-5
        d, dse = np.asarray(res.delta.price), np.asarray(res.delta.std_error)
        v, vse = np.asarray(res.vega.price), np.asarray(res.vega.std_error)
        assert d.shape == (2,) and v.shape == (2,)
        assert abs(d[0] - fd_d0) < 4 * dse[0]
        assert abs(v[0] - fd_v0) < 4 * vse[0]

    def test_all_short_credit_own_matches_fd(self):
        short = XvaSpec(
            netting=CvaMultiSpec(
                intensity=0.03, lgd=0.6, s=[100.0, 95.0], v=[0.2, 0.3],
                corr=CORR, r=0.05, t=1.0, strikes=[100.0, 90.0],
                weights=[-0.5, -0.5], n_grid=25),
            own_intensity=0.02, own_lgd=0.5, funding_spread=0.01)
        res = engine.greeks_xva(short, 1 << 17, KEY, CFG)
        eps = 1e-5
        fd_own = (self._closed_vec(lam_b=0.02 + eps, weights=(-0.5, -0.5))
                  - self._closed_vec(lam_b=0.02 - eps,
                                     weights=(-0.5, -0.5)))[1] / (2 * eps)
        assert abs(float(res.credit_own.price) - fd_own) \
            < 4 * float(res.credit_own.std_error)
        assert float(res.cva.price) == 0.0
        assert float(res.credit_cpty.price) == 0.0
        # Short side: delta of XVA is negative (exposure grows as spots
        # fall); sign check against FD of the total.
        assert np.asarray(res.delta.price)[0] < 0.0

    def test_mixed_sign_vs_crn_bumps_of_price_xva(self):
        mixed = XvaSpec(
            netting=CvaMultiSpec(
                intensity=0.03, lgd=0.6, s=[100.0, 95.0], v=[0.2, 0.3],
                corr=CORR, r=0.05, t=1.0, strikes=[100.0, 90.0],
                weights=[1.0, -0.8], n_grid=25),
            own_intensity=0.02, own_lgd=0.5, funding_spread=0.01)
        res = engine.greeks_xva(mixed, 1 << 16, KEY, CFG)

        def total_price(ds0=0.0, dv0=0.0):
            net = mixed.netting
            bumped = XvaSpec(
                netting=CvaMultiSpec(
                    intensity=net.intensity, lgd=net.lgd,
                    s=[100.0 + ds0, 95.0], v=[0.2 + dv0, 0.3],
                    corr=CORR, r=net.r, t=net.t, strikes=net.strikes,
                    weights=net.weights, n_grid=net.n_grid),
                own_intensity=mixed.own_intensity, own_lgd=mixed.own_lgd,
                funding_spread=mixed.funding_spread)
            r = engine.price_xva(bumped, 1 << 16, KEY, CFG)
            return (float(r.cva.price) - float(r.dva.price)
                    + float(r.fca.price) - float(r.fba.price))

        h = 0.25
        crn_d0 = (total_price(ds0=h) - total_price(ds0=-h)) / (2 * h)
        d0 = float(np.asarray(res.delta.price)[0])
        # CRN bumps share streams, so the FD noise is tiny; allow the
        # second-order O(h^2) term plus MC se.
        assert abs(d0 - crn_d0) < 6 * float(
            np.asarray(res.delta.std_error)[0]) + 2e-4
        hv = 0.005
        crn_v0 = (total_price(dv0=hv) - total_price(dv0=-hv)) / (2 * hv)
        v0 = float(np.asarray(res.vega.price)[0])
        assert abs(v0 - crn_v0) < 6 * float(
            np.asarray(res.vega.std_error)[0]) + 5e-3

    @pytest.mark.slow
    def test_pallas_interpret_twin_matches_closed_form(self):
        icfg = engine.EngineConfig(num_blocks=2, rows=8, backend="pallas",
                                   interpret=True)
        small = XvaSpec(
            netting=CvaMultiSpec(
                intensity=0.03, lgd=0.6, s=[100.0, 95.0], v=[0.2, 0.3],
                corr=CORR, r=0.05, t=1.0, strikes=[100.0, 90.0],
                weights=[0.5, 0.5], n_grid=10),
            own_intensity=0.02, own_lgd=0.5, funding_spread=0.01)
        res = engine.greeks_xva(small, 1 << 12, KEY, icfg)
        import jax.numpy as jnp
        legs = mcmath.xva_multi_closed_form(
            0.03, 0.6, 0.02, 0.5, 0.01, [100.0, 95.0], [0.2, 0.3],
            [100.0, 90.0], [0.5, 0.5], 0.05, 1.0, 10, dtype=jnp.float64)
        assert abs(float(res.cva.price) - float(legs[0])) \
            < 4 * float(res.cva.std_error)
        assert abs(float(res.fca.price) - float(legs[2])) \
            < 4 * float(res.fca.std_error)

    @pytest.mark.slow
    def test_wide_set_routes_to_xla_twin(self):
        m = 12
        corr = np.full((m, m), 0.2) + 0.8 * np.eye(m)
        wide = XvaSpec(
            netting=CvaMultiSpec(
                intensity=0.03, lgd=0.6, s=[100.0] * m, v=[0.2] * m,
                corr=corr, r=0.05, t=1.0, strikes=[100.0] * m,
                weights=[1.0 / m] * m, n_grid=5),
            own_intensity=0.02, own_lgd=0.5, funding_spread=0.01)
        pcfg = engine.EngineConfig(num_blocks=4, rows=8, backend="pallas",
                                   interpret=True)
        res = engine.greeks_xva(wide, 1 << 12, KEY, pcfg)
        assert np.asarray(res.delta.price).shape == (m,)

    @pytest.mark.slow
    def test_shard_invariance_bitwise(self):
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        base = engine.greeks_xva(SPEC, 1 << 14, KEY,
                                 engine.EngineConfig(num_blocks=16, rows=8,
                                                     backend="xla"))
        mesh = path_mesh(devs[:8])
        shard = engine.greeks_xva(SPEC, 1 << 14, KEY,
                                  engine.EngineConfig(num_blocks=16, rows=8,
                                                      backend="xla",
                                                      mesh=mesh))
        for leg in ("cva", "dva", "fca", "fba", "credit_cpty",
                    "credit_own", "funding"):
            assert float(getattr(base, leg).price) == float(
                getattr(shard, leg).price), leg
        np.testing.assert_array_equal(np.asarray(base.delta.price),
                                      np.asarray(shard.delta.price))
        np.testing.assert_array_equal(np.asarray(base.vega.price),
                                      np.asarray(shard.vega.price))

    def test_weight_deriv_tables_vs_fd(self):
        # Table-level gate: exact derivative tables vs f64 FD of the
        # weight tables themselves.
        import jax.numpy as jnp
        eps = 1e-6
        dwc, dwd, dwf = (np.asarray(x) for x in mcmath.xva_leg_weight_derivs(
            0.03, 0.02, 1.0, 25, dtype=jnp.float64))
        wc_p, _ = mcmath.xva_leg_weights(0.03 + eps, 0.02, 1.0, 25,
                                         dtype=jnp.float64)
        wc_m, _ = mcmath.xva_leg_weights(0.03 - eps, 0.02, 1.0, 25,
                                         dtype=jnp.float64)
        np.testing.assert_allclose(dwc, (np.asarray(wc_p) - np.asarray(wc_m))
                                   / (2 * eps), rtol=1e-6, atol=1e-12)
        _, wd_p = mcmath.xva_leg_weights(0.03, 0.02 + eps, 1.0, 25,
                                         dtype=jnp.float64)
        _, wd_m = mcmath.xva_leg_weights(0.03, 0.02 - eps, 1.0, 25,
                                         dtype=jnp.float64)
        np.testing.assert_allclose(dwd, (np.asarray(wd_p) - np.asarray(wd_m))
                                   / (2 * eps), rtol=1e-6, atol=1e-12)
        wf = mcmath.funding_leg_weights(0.03, 0.02, 1.0, 1.0, 25,
                                        dtype=jnp.float64)
        np.testing.assert_allclose(dwf, np.asarray(wf), rtol=1e-12)
