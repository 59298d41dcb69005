"""Portfolio (book) pricing: per-instrument accuracy, vanilla-kernel ties,
serving-cache behavior, and shard invariance."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mctpu import engine, math as mcmath
from mctpu.types import VanillaBook, VanillaOption

KEY = jax.random.key(929)
CFG = engine.EngineConfig(num_blocks=8, rows=8, backend="xla")
BOOK = VanillaBook.from_options([
    VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0),
    VanillaOption(100.0, 120.0, 0.05, 0.3, 0.5),
    VanillaOption(95.0, 90.0, 0.03, 0.15, 2.0, kind="put"),
    VanillaOption(120.0, 100.0, 0.01, 0.25, 0.25, kind="put"),
])


def _bs(book):
    out = []
    for i in range(book.n_instruments):
        o = book.option(i)
        fn = mcmath.bs_call if o.kind == "call" else mcmath.bs_put
        out.append(float(fn(o.s, o.k, o.r, o.v, o.t)))
    return np.array(out)


def test_each_instrument_within_3_sigma_of_bs():
    res = engine.price_book(BOOK, 1 << 19, KEY, CFG)
    z = np.abs(np.asarray(res.price) - _bs(BOOK)) / np.asarray(res.std_error)
    assert (z < 3).all()


def test_one_instrument_book_ties_to_vanilla_bitwise():
    # Same draw schedule and payoff op order as kernels/vanilla: the book
    # is the batch generalization, not a different estimator.
    opt = VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0)
    one = VanillaBook.from_options([opt])
    rb = engine.price_book(one, 1 << 16, KEY, CFG)
    rv = engine.price_vanilla(opt, 1 << 16, KEY, CFG)
    assert float(rb.price[0]) == float(rv.price)
    assert float(rb.ci[0]) == float(rv.ci)


def test_put_call_mix_and_put_instrument_matches_put_pricer():
    put = VanillaOption(95.0, 90.0, 0.03, 0.15, 2.0, kind="put")
    one = VanillaBook.from_options([put])
    rb = engine.price_book(one, 1 << 16, KEY, CFG)
    rv = engine.price_vanilla(put, 1 << 16, KEY, CFG)
    assert float(rb.price[0]) == float(rv.price)


def test_market_tick_reuses_the_compiled_program():
    # Serving contract: same book shape + kinds mix, new market data ->
    # no retrace (all parameters are runtime arrays).
    res = engine.price_book(BOOK, 1 << 14, KEY, CFG)
    n_runners = len(engine._RUNNERS)
    ticked = VanillaBook(s=BOOK.s * 1.01, k=BOOK.k, r=BOOK.r,
                         v=BOOK.v * 0.98, t=BOOK.t, kinds=BOOK.kinds)
    res2 = engine.price_book(ticked, 1 << 14, KEY, CFG)
    assert len(engine._RUNNERS) == n_runners  # cache hit
    assert not np.allclose(np.asarray(res.price), np.asarray(res2.price))


@pytest.mark.slow
def test_antithetic_tightens_every_instrument():
    plain = engine.price_book(BOOK, 1 << 17, KEY, CFG)
    anti = engine.price_book(
        BOOK, 1 << 17, KEY,
        engine.EngineConfig(num_blocks=8, rows=8, backend="xla",
                            antithetic=True))
    assert (np.asarray(anti.std_error) < np.asarray(plain.std_error)).all()


def test_pallas_interpret_twin():
    icfg = engine.EngineConfig(num_blocks=4, rows=8, backend="pallas",
                               interpret=True)
    res = engine.price_book(BOOK, 1 << 14, KEY, icfg)
    z = np.abs(np.asarray(res.price) - _bs(BOOK)) / np.asarray(res.std_error)
    assert (z < 4).all()


def test_pallas_one_instrument_ties_to_vanilla_kernel():
    opt = VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0)
    one = VanillaBook.from_options([opt])
    icfg = engine.EngineConfig(num_blocks=4, rows=8, backend="pallas",
                               interpret=True)
    rb = engine.price_book(one, 1 << 14, KEY, icfg)
    rv = engine.price_vanilla(opt, 1 << 14, KEY, icfg)
    assert float(rb.price[0]) == float(rv.price)


@pytest.mark.slow
def test_shard_invariant():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    from mctpu.parallel import path_mesh
    base = engine.price_book(BOOK, 1 << 14, KEY, CFG)
    cfg8 = engine.EngineConfig(num_blocks=8, rows=8, backend="xla",
                               mesh=path_mesh(devs[:8]))
    shard = engine.price_book(BOOK, 1 << 14, KEY, cfg8)
    np.testing.assert_array_equal(np.asarray(base.price),
                                  np.asarray(shard.price))
    np.testing.assert_array_equal(np.asarray(base.ci),
                                  np.asarray(shard.ci))


def test_validation():
    with pytest.raises(ValueError, match="kinds"):
        VanillaBook(s=np.ones(2), k=np.ones(2), r=np.ones(2), v=np.ones(2),
                    t=np.ones(2), kinds=("call",)).validate()
    with pytest.raises(ValueError, match="positive"):
        VanillaBook(s=np.array([100.0, -1.0]), k=np.ones(2),
                    r=np.zeros(2), v=np.ones(2) * 0.2, t=np.ones(2),
                    kinds=("call", "call")).validate()
    big = VanillaBook.from_options(
        [VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0)] * 65)
    with pytest.raises(ValueError, match="instruments"):
        engine.price_book(big, 1 << 12, KEY, CFG)


class TestGreeksBook:
    def test_each_instrument_greeks_within_3_sigma(self):
        g = engine.greeks_book(BOOK, 1 << 19, KEY, CFG)
        for i in range(BOOK.n_instruments):
            o = BOOK.option(i)
            ex = mcmath.bs_greeks(o.s, o.k, o.r, o.v, o.t)
            if o.kind == "put":  # put-call parity on the closed form
                import math as _m
                disc = _m.exp(-float(o.r) * float(o.t))
                ex = dict(ex)
                ex["price"] = float(mcmath.bs_put(o.s, o.k, o.r, o.v, o.t))
                ex["delta"] = float(ex["delta"]) - 1.0
                ex["rho"] = float(ex["rho"]) - float(o.k) * float(o.t) * disc
                ex["theta"] = (float(ex["theta"])
                               - float(o.r) * float(o.k) * disc)
            for name in ("price", "delta", "vega", "rho", "theta", "gamma"):
                mc = getattr(g, name)
                z = abs(float(np.asarray(mc.price)[i]) - float(ex[name])) \
                    / float(np.asarray(mc.std_error)[i])
                assert z < 3.5, (i, name, z)

    @pytest.mark.slow
    def test_one_call_ties_to_ladder_greeks_bitwise(self):
        opt = VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0)
        one = VanillaBook.from_options([opt])
        gb = engine.greeks_book(one, 1 << 15, KEY, CFG)
        gl = engine.greeks_vanilla_ladder(opt, np.array([100.0]), 1 << 15,
                                          KEY, CFG)
        for name in ("price", "delta", "vega", "rho", "theta", "gamma"):
            assert float(np.asarray(getattr(gb, name).price)[0]) \
                == float(np.asarray(getattr(gl, name).price)[0]), name

    @pytest.mark.slow
    def test_pallas_interpret_twin(self):
        icfg = engine.EngineConfig(num_blocks=4, rows=8, backend="pallas",
                                   interpret=True)
        g = engine.greeks_book(BOOK, 1 << 14, KEY, icfg)
        o = BOOK.option(0)
        ex = mcmath.bs_greeks(o.s, o.k, o.r, o.v, o.t)
        for name in ("delta", "vega", "gamma"):
            mc = getattr(g, name)
            z = abs(float(np.asarray(mc.price)[0]) - float(ex[name])) \
                / float(np.asarray(mc.std_error)[0])
            assert z < 4, (name, z)

    @pytest.mark.slow
    def test_shard_invariant(self):
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        from mctpu.parallel import path_mesh
        base = engine.greeks_book(BOOK, 1 << 14, KEY, CFG)
        cfg8 = engine.EngineConfig(num_blocks=8, rows=8, backend="xla",
                                   mesh=path_mesh(devs[:8]))
        shard = engine.greeks_book(BOOK, 1 << 14, KEY, cfg8)
        for name in ("price", "delta", "vega", "rho", "theta", "gamma"):
            np.testing.assert_array_equal(
                np.asarray(getattr(base, name).price),
                np.asarray(getattr(shard, name).price))

    @pytest.mark.slow
    def test_tick_reuses_compiled_program(self):
        engine.greeks_book(BOOK, 1 << 13, KEY, CFG)
        n_runners = len(engine._RUNNERS)
        ticked = VanillaBook(s=BOOK.s * 0.99, k=BOOK.k, r=BOOK.r,
                             v=BOOK.v * 1.02, t=BOOK.t, kinds=BOOK.kinds)
        engine.greeks_book(ticked, 1 << 13, KEY, CFG)
        assert len(engine._RUNNERS) == n_runners


class TestBarrierBook:
    """Path-dependent serving: M heterogeneous knock-outs from one walk
    (round 5 — real books are mostly path-dependent; VERDICT r4 #6)."""

    KEY = jax.random.key(77)
    CFG = engine.EngineConfig(num_blocks=8, rows=8, backend="xla")

    def _book(self, m=4, n_obs=5):
        import numpy as np

        from mctpu.types import BarrierBook
        return BarrierBook(
            s=jnp.asarray([100.0, 95.0, 105.0, 100.0][:m]),
            k=jnp.asarray([100.0, 90.0, 110.0, 95.0][:m]),
            r=jnp.asarray([0.05, 0.03, 0.04, 0.05][:m]),
            v=jnp.asarray([0.2, 0.25, 0.15, 0.3][:m]),
            t=jnp.asarray([1.0, 2.0, 0.5, 1.0][:m]),
            barrier=jnp.asarray([130.0, 140.0, 150.0, 70.0][:m]),
            n_obs=n_obs,
            kinds=("call", "call", "call", "put")[:m],
            directions=("up-and-out", "up-and-out", "up-and-out",
                        "down-and-out")[:m])

    def test_one_instrument_ties_single_barrier_bitwise(self):
        from mctpu.types import BarrierBook, BarrierOption
        opt = BarrierOption(100.0, 100.0, 0.05, 0.2, 1.0, barrier=130.0,
                            n_obs=5)
        book = BarrierBook.from_options([opt])
        rb = engine.price_barrier_book(book, 1 << 13, self.KEY, self.CFG)
        rs = engine.price_barrier(opt, 1 << 13, self.KEY, self.CFG)
        assert float(np.asarray(rb.price)[0]) == float(rs.price)
        assert float(np.asarray(rb.ci)[0]) == float(rs.ci)

    @pytest.mark.slow
    def test_each_instrument_matches_single_pricer_statistically(self):
        book = self._book(m=3)  # all-call slice
        rb = engine.price_barrier_book(book, 1 << 14, self.KEY, self.CFG)
        for i in range(3):
            single = engine.price_barrier(book.option(i), 1 << 14,
                                          jax.random.key(1234 + i),
                                          self.CFG)
            se = float(np.hypot(np.asarray(rb.std_error)[i],
                                float(single.std_error)))
            assert abs(float(np.asarray(rb.price)[i])
                       - float(single.price)) < 4 * se, i

    def test_put_and_down_and_out_instrument(self):
        # Instrument 3: down-and-out put, barrier 70 < s0 = 100.  Gate vs
        # a NumPy oracle of the same discrete walk.
        import numpy as np
        book = self._book(m=4)
        rb = engine.price_barrier_book(book, 1 << 15, self.KEY, self.CFG)
        rng = np.random.default_rng(5)
        g, n = book.n_obs, 1 << 17
        s0, k, r, v, t, b = 100.0, 95.0, 0.05, 0.3, 1.0, 70.0
        dt = t / g
        z = rng.standard_normal((g, n))
        logs = np.log(s0) + np.cumsum(
            (r - 0.5 * v * v) * dt + v * np.sqrt(dt) * z, axis=0)
        alive = (logs > np.log(b)).all(axis=0)
        pay = alive * np.maximum(k - np.exp(logs[-1]), 0.0)
        want = np.exp(-r * t) * pay.mean()
        se_o = np.exp(-r * t) * pay.std() / np.sqrt(n)
        se = float(np.hypot(np.asarray(rb.std_error)[3], se_o))
        assert abs(float(np.asarray(rb.price)[3]) - want) < 4 * se

    def test_pallas_interpret_ties_single_kernel(self):
        from mctpu.types import BarrierBook, BarrierOption
        icfg = engine.EngineConfig(num_blocks=2, rows=8, backend="pallas",
                                   interpret=True)
        opt = BarrierOption(100.0, 100.0, 0.05, 0.2, 1.0, barrier=130.0,
                            n_obs=4)
        book = BarrierBook.from_options([opt])
        rb = engine.price_barrier_book(book, 1 << 12, self.KEY, icfg)
        rs = engine.price_barrier(opt, 1 << 12, self.KEY, icfg)
        assert float(np.asarray(rb.price)[0]) == float(rs.price)

    def test_greeks_match_single_barrier_greeks(self):
        from mctpu.types import BarrierBook, BarrierOption
        opt = BarrierOption(100.0, 100.0, 0.05, 0.2, 1.0, barrier=130.0,
                            n_obs=5)
        book = BarrierBook.from_options([opt, opt])
        gb = engine.greeks_barrier_book(book, 1 << 14, self.KEY, self.CFG)
        gs = engine.greeks_barrier(opt, 1 << 14, self.KEY, self.CFG)
        for nm in ("price", "delta", "vega", "rho"):
            got = float(np.asarray(getattr(gb, nm).price)[0])
            want = float(getattr(gs, nm).price)
            se = float(np.hypot(np.asarray(getattr(gb, nm).std_error)[0],
                                float(getattr(gs, nm).std_error)))
            assert abs(got - want) < 4 * max(se, 1e-12), nm
        # Both instruments identical -> identical marks (shared draws).
        p = np.asarray(gb.price.price)
        assert p[0] == p[1]

    @pytest.mark.slow
    def test_greeks_match_crn_bumps(self):
        import dataclasses as dc
        book = self._book(m=2)
        gb = engine.greeks_barrier_book(book, 1 << 15, self.KEY, self.CFG)
        h = 0.5

        def priced(i, **bump):
            b2 = dc.replace(book, **bump)
            r = engine.price_barrier_book(b2, 1 << 15, self.KEY, self.CFG)
            return float(np.asarray(r.price)[i])

        s = np.asarray(book.s, float)
        for i in range(2):
            e = np.zeros(2)
            e[i] = h
            fd = (priced(i, s=jnp.asarray(s + e))
                  - priced(i, s=jnp.asarray(s - e))) / (2 * h)
            got = float(np.asarray(gb.delta.price)[i])
            se = float(np.asarray(gb.delta.std_error)[i])
            # LR noise dominates; CRN bumps share streams.
            assert abs(got - fd) < 6 * se + 5e-3, i

    def test_tick_reuses_compiled_program(self):
        book = self._book(m=3)
        engine.price_barrier_book(book, 1 << 12, self.KEY, self.CFG)
        import dataclasses as dc
        compiles = 0
        ticked = dc.replace(book, s=jnp.asarray(np.asarray(book.s) * 1.01),
                            v=jnp.asarray(np.asarray(book.v) * 0.99))
        key2 = jax.random.key(123)
        n0 = len(engine._RUNNERS)
        engine.price_barrier_book(ticked, 1 << 12, key2, self.CFG)
        assert len(engine._RUNNERS) == n0  # same runner, no new compile

    @pytest.mark.slow
    def test_shard_invariance_bitwise(self):
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        from mctpu.parallel import path_mesh
        book = self._book(m=4)
        base = engine.price_barrier_book(
            book, 1 << 13, self.KEY,
            engine.EngineConfig(num_blocks=16, rows=8, backend="xla"))
        shard = engine.price_barrier_book(
            book, 1 << 13, self.KEY,
            engine.EngineConfig(num_blocks=16, rows=8, backend="xla",
                                mesh=path_mesh(devs[:8])))
        np.testing.assert_array_equal(np.asarray(base.price),
                                      np.asarray(shard.price))

    def test_validate_rejects_dead_start_and_bad_shapes(self):
        from mctpu.types import BarrierBook
        with pytest.raises(ValueError, match="starts knocked out"):
            BarrierBook(s=jnp.asarray([100.0]), k=jnp.asarray([100.0]),
                        r=jnp.asarray([0.05]), v=jnp.asarray([0.2]),
                        t=jnp.asarray([1.0]), barrier=jnp.asarray([90.0]),
                        n_obs=5, kinds=("call",),
                        directions=("up-and-out",)).validate()
        with pytest.raises(ValueError, match="share n_obs"):
            from mctpu.types import BarrierOption
            BarrierBook.from_options([
                BarrierOption(100.0, 100.0, 0.05, 0.2, 1.0, barrier=130.0,
                              n_obs=5),
                BarrierOption(100.0, 100.0, 0.05, 0.2, 1.0, barrier=130.0,
                              n_obs=10)])
