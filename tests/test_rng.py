"""RNG subsystem tests: stream independence, reproducibility, Box-Muller."""
import jax
import jax.numpy as jnp
import numpy as np

from mctpu import rng as mcrng


class TestBlockKeys:
    def test_deterministic(self):
        key = jax.random.key(42)
        a = mcrng.block_keys(key, 0, 8)
        b = mcrng.block_keys(key, 0, 8)
        assert bool(jnp.all(jax.random.key_data(a) == jax.random.key_data(b)))

    def test_offset_slices_the_same_stream(self):
        # Blocks [4..8) of a 0-offset range == blocks of a 4-offset range:
        # the property that makes sharding invariant.
        key = jax.random.key(42)
        full = jax.random.key_data(mcrng.block_keys(key, 0, 8))
        tail = jax.random.key_data(mcrng.block_keys(key, 4, 4))
        assert bool(jnp.all(full[4:] == tail))

    def test_distinct_across_blocks(self):
        key = jax.random.key(7)
        data = np.asarray(jax.random.key_data(mcrng.block_keys(key, 0, 1024)))
        assert len({tuple(row) for row in data}) == 1024


class TestKeyToSeed:
    def test_deterministic_and_distinct(self):
        seeds = {int(mcrng.key_to_seed(jax.random.key(i))) for i in range(100)}
        assert len(seeds) == 100
        again = int(mcrng.key_to_seed(jax.random.key(3)))
        assert again == int(mcrng.key_to_seed(jax.random.key(3)))


def _py_philox4x32(key, ctr, rounds=10):
    """Independent pure-Python-int Philox (no numpy dtypes, no vectors)."""
    M0, M1, W0, W1 = 0xD2511F53, 0xCD9E8D57, 0x9E3779B9, 0xBB67AE85
    k0, k1 = key
    c = list(ctr)
    for _ in range(rounds):
        p0, p1 = M0 * c[0], M1 * c[2]
        c = [((p1 >> 32) ^ c[1] ^ k0) & 0xFFFFFFFF, p1 & 0xFFFFFFFF,
             ((p0 >> 32) ^ c[3] ^ k1) & 0xFFFFFFFF, p0 & 0xFFFFFFFF]
        k0, k1 = (k0 + W0) & 0xFFFFFFFF, (k1 + W1) & 0xFFFFFFFF
    return c


class TestPhilox:
    # Random123 philox4x32-10 known-answer vectors (kat_vectors file).
    KAT = [
        ((0, 0), (0, 0, 0, 0),
         (0x6627E8D5, 0xE169C58D, 0xBC57AC4C, 0x9B00DBD8)),
        ((0xFFFFFFFF, 0xFFFFFFFF), (0xFFFFFFFF,) * 4,
         (0x408F276D, 0x41C83B0E, 0xA20BC7C6, 0x6D5451FD)),
        ((0xA4093822, 0x299F31D0),
         (0x243F6A88, 0x85A308D3, 0x13198A2E, 0x03707344),
         (0xD16CFE09, 0x94FDCCEB, 0x5001E420, 0x24126EA1)),
    ]

    def test_known_answer_vectors(self):
        for key, ctr, want in self.KAT:
            got = tuple(int(np.asarray(w)) for w in mcrng.philox4x32(key, ctr))
            assert got == want

    def test_matches_independent_python_ints_on_random_blocks(self):
        rng = np.random.default_rng(11)
        for _ in range(20):
            key = tuple(int(x) for x in rng.integers(0, 1 << 32, 2))
            ctr = tuple(int(x) for x in rng.integers(0, 1 << 32, 4))
            got = tuple(int(np.asarray(w)) for w in mcrng.philox4x32(key, ctr))
            assert got == tuple(_py_philox4x32(key, ctr))

    def test_vectorized_matches_scalar(self):
        c0 = jnp.arange(64, dtype=jnp.uint32)
        words = mcrng.philox4x32((3, 5), (c0, 7, 0, 0))
        for i in (0, 13, 63):
            want = _py_philox4x32((3, 5), (i, 7, 0, 0))
            assert [int(w[i]) for w in words] == want

    def test_word_uniformity(self):
        n = 1 << 18
        c0 = jnp.arange(n, dtype=jnp.uint32)
        w0, w1, w2, w3 = mcrng.philox4x32((123, 456), (c0, 9, 0, 0))
        for w in (w0, w1, w2, w3):
            u = np.asarray(mcrng.uniform_from_bits(w), np.float64)
            assert abs(u.mean() - 0.5) < 5 / np.sqrt(12 * n)
            assert len(np.unique(np.asarray(w))) > 0.99 * n  # no collisions


class TestEmulatedKernelPrng:
    """The interpret-mode stand-in for the hardware PRNG is Philox-backed."""

    def _pair(self, seed, ctr, shape=(8, 128)):
        from mctpu.kernels import common as kc
        with kc.prng_emulation():
            kc.seed_prng(jnp.int32(seed), jnp.int32(0))
            return kc.draw_normal_pair(shape, jnp.int32(ctr))

    def test_seed_replay_and_ctr_distinctness(self):
        a1, a2 = self._pair(7, 3)
        b1, b2 = self._pair(7, 3)
        assert bool(jnp.all(a1 == b1)) and bool(jnp.all(a2 == b2))
        c1, _ = self._pair(7, 4)
        d1, _ = self._pair(8, 3)
        assert not bool(jnp.all(a1 == c1))
        assert not bool(jnp.all(a1 == d1))

    def test_emulated_normal_moments(self):
        zs = []
        for ctr in range(16):
            z1, z2 = self._pair(42, ctr, shape=(64, 128))
            zs += [np.asarray(z1, np.float64), np.asarray(z2, np.float64)]
        z = np.concatenate([a.ravel() for a in zs])
        n = z.size  # 2^18 normals
        assert abs(z.mean()) < 5 / np.sqrt(n)
        assert abs(z.std() - 1.0) < 5 / np.sqrt(2 * n)
        kurt = ((z - z.mean()) ** 4).mean() / z.std() ** 4
        assert abs(kurt - 3.0) < 0.1


class TestBoxMuller:
    def _bits(self, seed, shape):
        k = jax.random.key(seed)
        return jax.random.bits(k, shape, dtype=jnp.uint32)

    def test_uniform_from_bits_range(self):
        u = mcrng.uniform_from_bits(self._bits(0, (1 << 16,)))
        assert float(u.min()) >= 0.0
        assert float(u.max()) < 1.0
        # Mean of U[0,1): 0.5 +- 5 sigma (sigma = 1/sqrt(12 n))
        assert abs(float(u.mean()) - 0.5) < 5 / np.sqrt(12 * u.size)

    def test_normal_moments(self):
        n = 1 << 20
        z1, z2 = mcrng.box_muller(self._bits(1, (n,)), self._bits(2, (n,)))
        z = jnp.concatenate([z1, z2]).astype(jnp.float64)
        m = float(z.mean())
        s = float(z.std())
        kurt = float(jnp.mean((z - m) ** 4) / s**4)
        assert abs(m) < 5 / np.sqrt(2 * n)
        assert abs(s - 1.0) < 5 / np.sqrt(4 * n)
        assert abs(kurt - 3.0) < 0.05

    def test_sincos_2pi_accuracy_vs_f64(self):
        bits = self._bits(5, (1 << 20,))
        c, s = mcrng.sincos_2pi_bits(bits)
        u = np.asarray(bits, np.uint32).astype(np.float64) / 2.0 ** 32
        theta = 2 * np.pi * u
        assert np.abs(np.asarray(c, np.float64) - np.cos(theta)).max() < 1e-6
        assert np.abs(np.asarray(s, np.float64) - np.sin(theta)).max() < 1e-6

    def test_sincos_2pi_quadrant_boundaries(self):
        # Exact quadrant corners: u = 0, 1/4, 1/2, 3/4.
        bits = jnp.asarray([0, 1 << 30, 2 << 30, 3 << 30], jnp.uint32)
        c, s = mcrng.sincos_2pi_bits(bits)
        np.testing.assert_allclose(np.asarray(c), [1, 0, -1, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(s), [0, 1, 0, -1], atol=1e-6)

    def test_sincos_pythagorean_identity(self):
        c, s = mcrng.sincos_2pi_bits(self._bits(6, (1 << 18,)))
        dev = np.abs(np.asarray(c, np.float64) ** 2
                     + np.asarray(s, np.float64) ** 2 - 1.0)
        assert dev.max() < 2e-6

    def test_no_nan_at_bit_extremes(self):
        zeros = jnp.zeros((8,), jnp.uint32)
        ones = jnp.full((8,), 0xFFFFFFFF, dtype=jnp.uint32)
        for b1 in (zeros, ones):
            for b2 in (zeros, ones):
                z1, z2 = mcrng.box_muller(b1, b2)
                assert bool(jnp.all(jnp.isfinite(z1)))
                assert bool(jnp.all(jnp.isfinite(z2)))
