"""Strike-ladder pricing: per-strike accuracy + cross-strike consistency."""
import jax
import numpy as np
import pytest

from mctpu import engine, math as mcmath
from mctpu.types import VanillaOption

KEY = jax.random.key(515)
CFG = engine.EngineConfig(num_blocks=8, rows=8, backend="xla")
OPT = VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0)
KS = np.array([70.0, 85.0, 100.0, 115.0, 130.0])


def test_each_strike_within_3_sigma_of_bs():
    res = engine.price_vanilla_ladder(OPT, KS, 1 << 19, KEY, CFG)
    bs = np.array([float(mcmath.bs_call(100.0, k, 0.05, 0.2, 1.0))
                   for k in KS])
    z = np.abs(np.asarray(res.price) - bs) / np.asarray(res.std_error)
    assert (z < 3).all()


def test_common_paths_make_the_ladder_pathwise_consistent():
    # max(s-k, 0) is monotone decreasing and convex in k FOR EVERY PATH;
    # with common paths these hold exactly in the estimates, not just in
    # expectation — the point of pricing the ladder in one sweep.
    res = engine.price_vanilla_ladder(OPT, KS, 1 << 16, KEY, CFG)
    p = np.asarray(res.price)
    assert (np.diff(p) < 0).all()  # monotone in strike
    butterflies = p[:-2] - 2 * p[1:-1] + p[2:]
    assert (butterflies >= -1e-12).all()  # convex in strike


def test_put_ladder():
    put = VanillaOption(100.0, 100.0, 0.05, 0.2, 1.0, kind="put")
    res = engine.price_vanilla_ladder(put, KS, 1 << 18, KEY, CFG)
    bs = np.array([float(mcmath.bs_put(100.0, k, 0.05, 0.2, 1.0))
                   for k in KS])
    z = np.abs(np.asarray(res.price) - bs) / np.asarray(res.std_error)
    assert (z < 3).all()
    assert (np.diff(np.asarray(res.price)) > 0).all()  # puts increase in k


def test_pallas_interpret_twin():
    icfg = engine.EngineConfig(num_blocks=4, rows=8, backend="pallas",
                               interpret=True)
    res = engine.price_vanilla_ladder(OPT, KS, 1 << 14, KEY, icfg)
    bs = np.array([float(mcmath.bs_call(100.0, k, 0.05, 0.2, 1.0))
                   for k in KS])
    z = np.abs(np.asarray(res.price) - bs) / np.asarray(res.std_error)
    assert (z < 4).all()
    p = np.asarray(res.price)
    assert (p[:-2] - 2 * p[1:-1] + p[2:] >= -1e-6).all()


@pytest.mark.slow
def test_antithetic_ladder_tightens_every_strike():
    plain = engine.price_vanilla_ladder(OPT, KS, 1 << 17, KEY, CFG)
    anti = engine.price_vanilla_ladder(
        OPT, KS, 1 << 17, KEY,
        engine.EngineConfig(num_blocks=8, rows=8, backend="xla",
                            antithetic=True))
    assert (np.asarray(anti.std_error) < np.asarray(plain.std_error)).all()


@pytest.mark.slow
def test_shard_invariant():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    from mctpu.parallel import path_mesh
    base = engine.price_vanilla_ladder(OPT, KS, 1 << 14, KEY, CFG)
    cfg8 = engine.EngineConfig(num_blocks=8, rows=8, backend="xla",
                               mesh=path_mesh(devs[:8]))
    shard = engine.price_vanilla_ladder(OPT, KS, 1 << 14, KEY, cfg8)
    np.testing.assert_array_equal(np.asarray(base.price),
                                  np.asarray(shard.price))


def test_too_many_strikes_rejected():
    with pytest.raises(ValueError, match="strikes"):
        engine.price_vanilla_ladder(OPT, np.linspace(50, 150, 65), 1 << 12,
                                    KEY, CFG)
