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

    def test_no_nan_at_bit_extremes(self):
        zeros = jnp.zeros((8,), jnp.uint32)
        ones = jnp.full((8,), 0xFFFFFFFF, dtype=jnp.uint32)
        for b1 in (zeros, ones):
            for b2 in (zeros, ones):
                z1, z2 = mcrng.box_muller(b1, b2)
                assert bool(jnp.all(jnp.isfinite(z1)))
                assert bool(jnp.all(jnp.isfinite(z2)))
