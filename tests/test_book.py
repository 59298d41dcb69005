"""Portfolio (book) pricing: per-instrument accuracy, vanilla-kernel ties,
serving-cache behavior, and shard invariance."""
import jax
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

    def test_one_call_ties_to_ladder_greeks_bitwise(self):
        opt = VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0)
        one = VanillaBook.from_options([opt])
        gb = engine.greeks_book(one, 1 << 15, KEY, CFG)
        gl = engine.greeks_vanilla_ladder(opt, np.array([100.0]), 1 << 15,
                                          KEY, CFG)
        for name in ("price", "delta", "vega", "rho", "theta", "gamma"):
            assert float(np.asarray(getattr(gb, name).price)[0]) \
                == float(np.asarray(getattr(gl, name).price)[0]), name

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

    def test_tick_reuses_compiled_program(self):
        engine.greeks_book(BOOK, 1 << 13, KEY, CFG)
        n_runners = len(engine._RUNNERS)
        ticked = VanillaBook(s=BOOK.s * 0.99, k=BOOK.k, r=BOOK.r,
                             v=BOOK.v * 1.02, t=BOOK.t, kinds=BOOK.kinds)
        engine.greeks_book(ticked, 1 << 13, KEY, CFG)
        assert len(engine._RUNNERS) == n_runners
