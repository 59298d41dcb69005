"""Cliquet (locally capped/floored ratchet): exact-oracle gates.

Period-return independence under GBM telescopes the value to an exact
closed form at ANY period count (math.cliquet_closed_form), so every
gate here is against truth, not an approximation.
"""
import jax
import numpy as np
import pytest

from mctpu import engine, math as mcmath
from mctpu.types import CliquetOption

KEY = jax.random.key(29)
OPT = CliquetOption(s=100.0, r=0.03, v=0.2, t=1.0, n_periods=12,
                    cap=0.05, floor=-0.02)


def _cfg(**kw):
    kw.setdefault("num_blocks", 16)
    kw.setdefault("rows", 8)
    kw.setdefault("backend", "xla")
    return engine.EngineConfig(**kw)


def _cf(r=0.03, v=0.2, t=1.0, n=12, cap=0.05, floor=-0.02):
    return float(mcmath.cliquet_closed_form(r, v, t, n, cap, floor))


class TestPrice:
    def test_matches_exact_closed_form(self):
        res = engine.price_cliquet(OPT, 1 << 18, KEY, _cfg())
        z = (float(res.price) - _cf()) / float(res.std_error)
        assert abs(z) < 4.0, (float(res.price), _cf(), z)

    @pytest.mark.parametrize("n,cap,floor", [
        (1, 0.10, -0.10), (4, 0.03, 0.0), (52, 0.02, -0.01)])
    @pytest.mark.slow
    def test_period_count_and_band_sweep(self, n, cap, floor):
        opt = CliquetOption(s=100.0, r=0.03, v=0.2, t=1.0, n_periods=n,
                            cap=cap, floor=floor)
        res = engine.price_cliquet(opt, 1 << 17, KEY, _cfg())
        want = _cf(n=n, cap=cap, floor=floor)
        z = (float(res.price) - want) / float(res.std_error)
        assert abs(z) < 4.0, (n, cap, floor, float(res.price), want, z)

    def test_tight_band_collapses_to_deterministic(self):
        """cap == floor + eps: the payoff pins to ~n*floor exactly."""
        opt = CliquetOption(s=100.0, r=0.03, v=0.2, t=1.0, n_periods=12,
                            cap=0.02 + 1e-6, floor=0.02)
        res = engine.price_cliquet(opt, 1 << 14, KEY, _cfg())
        want = np.exp(-0.03) * 12 * 0.02
        assert float(res.price) == pytest.approx(want, rel=1e-4)

    def test_antithetic_variant(self):
        res = engine.price_cliquet(OPT, 1 << 17, KEY,
                                   _cfg(antithetic=True))
        z = (float(res.price) - _cf()) / float(res.std_error)
        assert abs(z) < 4.0

    def test_pallas_interpret_twin(self):
        x = engine.price_cliquet(OPT, 1 << 14, KEY, _cfg())
        p = engine.price_cliquet(OPT, 1 << 14, KEY,
                                 _cfg(backend="pallas", interpret=True))
        se = np.hypot(float(x.std_error), float(p.std_error))
        assert abs(float(x.price) - float(p.price)) < 5 * se

    def test_mesh_bitwise_invariant(self):
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        from mctpu.parallel import path_mesh
        base = engine.price_cliquet(OPT, 1 << 14, KEY, _cfg())
        shard = engine.price_cliquet(OPT, 1 << 14, KEY,
                                     _cfg(mesh=path_mesh(devs[:8])))
        assert float(base.price) == float(shard.price)
        assert float(base.ci) == float(shard.ci)


class TestGreeks:
    def test_matches_exact_gradients(self):
        g = engine.greeks_cliquet(OPT, 1 << 17, KEY, _cfg())
        gv, gr, gt = [float(x) for x in jax.grad(
            lambda v, r, t: mcmath.cliquet_closed_form(
                r, v, t, 12, 0.05, -0.02), argnums=(0, 1, 2))(
                    0.2, 0.03, 1.0)]
        for nm, want in (("price", _cf()), ("vega", gv), ("rho", gr),
                         ("theta", gt)):
            r = getattr(g, nm)
            z = (float(r.price) - want) / max(float(r.std_error), 1e-15)
            assert abs(z) < 4.0, (nm, float(r.price), want, z)

    def test_delta_and_gamma_exactly_zero(self):
        g = engine.greeks_cliquet(OPT, 1 << 14, KEY, _cfg())
        assert float(g.delta.price) == 0.0
        assert float(g.delta.std_error) == 0.0
        assert float(g.gamma.price) == 0.0

    def test_dispatcher(self):
        g = engine.greeks(OPT, 1 << 14, KEY, _cfg())
        assert float(g.vega.price) != 0.0

    @pytest.mark.slow
    def test_pallas_interpret_twin(self):
        x = engine.greeks_cliquet(OPT, 1 << 13, KEY, _cfg())
        p = engine.greeks_cliquet(OPT, 1 << 13, KEY,
                                  _cfg(backend="pallas", interpret=True))
        for nm in ("price", "vega", "rho", "theta"):
            xa, pa = getattr(x, nm), getattr(p, nm)
            se = np.hypot(float(xa.std_error), float(pa.std_error))
            assert abs(float(xa.price) - float(pa.price)) < 5 * se, nm

    def test_shard_invariance(self):
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        from mctpu.parallel import path_mesh
        base = engine.greeks_cliquet(OPT, 1 << 14, KEY, _cfg())
        shard = engine.greeks_cliquet(OPT, 1 << 14, KEY,
                                      _cfg(mesh=path_mesh(devs[:8])))
        for nm in ("price", "vega", "rho", "theta"):
            assert float(getattr(base, nm).price) == float(
                getattr(shard, nm).price), nm


class TestValidation:
    def test_cap_below_floor_raises(self):
        with pytest.raises(ValueError, match="cap"):
            CliquetOption(100.0, 0.03, 0.2, 1.0, cap=0.0,
                          floor=0.05).validate()
