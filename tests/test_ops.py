"""Pallas kernel tests (interpreter mode on CPU; the same kernels compile on
TPU — exercised by bench/driver runs)."""

import jax.numpy as jnp
import numpy as np

from libwave_tpu.ops import hamming_distance_pallas
from libwave_tpu.vision.matcher import hamming_distance_matrix


class TestHammingKernel:
    def test_matches_reference(self, rng):
        d1 = jnp.asarray(
            rng.integers(0, 2**32, (100, 8), dtype=np.uint64).astype(np.uint32)
        )
        d2 = jnp.asarray(
            rng.integers(0, 2**32, (73, 8), dtype=np.uint64).astype(np.uint32)
        )
        out = hamming_distance_pallas(d1, d2)
        ref = hamming_distance_matrix(d1, d2)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_identity_zero(self, rng):
        d = jnp.asarray(
            rng.integers(0, 2**32, (40, 16), dtype=np.uint64).astype(np.uint32)
        )
        out = np.asarray(hamming_distance_pallas(d, d))
        assert (np.diag(out) == 0).all()

    def test_single_bit(self):
        a = jnp.zeros((1, 4), dtype=jnp.uint32)
        b = jnp.zeros((1, 4), dtype=jnp.uint32).at[0, 2].set(1 << 7)
        out = hamming_distance_pallas(a, b)
        assert int(out[0, 0]) == 1

    def test_unaligned_sizes(self, rng):
        """Sizes not multiples of the 128 tile must pad/mask correctly."""
        d1 = jnp.asarray(
            rng.integers(0, 2**32, (130, 8), dtype=np.uint64).astype(np.uint32)
        )
        d2 = jnp.asarray(
            rng.integers(0, 2**32, (257, 8), dtype=np.uint64).astype(np.uint32)
        )
        out = hamming_distance_pallas(d1, d2)
        assert out.shape == (130, 257)
        ref = hamming_distance_matrix(d1, d2)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
