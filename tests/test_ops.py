"""Pallas kernel tests (interpreter mode on CPU; the same kernels compile on
TPU — exercised by bench/driver runs)."""

import jax
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


class TestFusedTop2:
    """hamming_top2 == full-matrix top-2 (the kernel the ratio test uses on
    TPU — VERDICT r1 item 7)."""

    def _reference_top2(self, d1, d2, mask2=None):
        dist = hamming_distance_matrix(d1, d2, None, mask2)
        neg = -dist.astype(jnp.float32)
        top2, idx = jax.lax.top_k(neg, 2)
        return (-top2[:, 0]).astype(jnp.int32), (
            -top2[:, 1]
        ).astype(jnp.int32), idx[:, 0]

    def test_matches_matrix_path(self, rng):
        from libwave_tpu.ops.hamming import hamming_top2

        d1 = jnp.asarray(
            rng.integers(0, 2**32, (300, 8), dtype=np.uint64).astype(np.uint32)
        )
        d2 = jnp.asarray(
            rng.integers(0, 2**32, (517, 8), dtype=np.uint64).astype(np.uint32)
        )
        best, second, idx = hamming_top2(d1, d2)
        rb, rs, ridx = self._reference_top2(d1, d2)
        np.testing.assert_array_equal(np.asarray(best), np.asarray(rb))
        np.testing.assert_array_equal(np.asarray(second), np.asarray(rs))
        # index may differ only on exact-tie rows
        tie = np.asarray(rb) == np.asarray(rs)
        np.testing.assert_array_equal(
            np.asarray(idx)[~tie], np.asarray(ridx)[~tie]
        )

    def test_mask2_excludes_columns(self, rng):
        from libwave_tpu.ops.hamming import hamming_top2

        d1 = jnp.asarray(
            rng.integers(0, 2**32, (64, 4), dtype=np.uint64).astype(np.uint32)
        )
        d2 = jnp.concatenate([d1, d1], axis=0)  # duplicates
        mask2 = jnp.concatenate(
            [jnp.ones(64, bool), jnp.zeros(64, bool)]
        )
        best, second, idx = hamming_top2(d1, d2, mask2)
        # with the duplicate half masked out, each row's best is its own
        # copy at distance 0 and the second-best is a genuine other row
        np.testing.assert_array_equal(np.asarray(best), 0)
        assert (np.asarray(idx) == np.arange(64)).all()
        assert (np.asarray(second) > 0).all()

    def test_identical_rows_tie(self):
        from libwave_tpu.ops.hamming import hamming_top2

        d = jnp.asarray(np.full((4, 2), 7, np.uint32))
        best, second, idx = hamming_top2(d, d)
        np.testing.assert_array_equal(np.asarray(best), 0)
        np.testing.assert_array_equal(np.asarray(second), 0)
        np.testing.assert_array_equal(np.asarray(idx), 0)  # first occurrence


class TestSegMM:
    """One-hot-matmul segment kernels (ops.segmm) vs reference numpy."""

    def test_seg_reduce_and_broadcast(self, rng):
        import jax.numpy as jnp

        from libwave_tpu.ops.segmm import (
            seg_broadcast_onehot,
            seg_reduce_onehot,
        )

        K, M, C = 1000, 333, 4
        idx = rng.integers(0, M, K).astype(np.int32)
        vals = rng.standard_normal((C, K)).astype(np.float32)
        out = np.asarray(
            seg_reduce_onehot(jnp.asarray(vals), jnp.asarray(idx), M)
        )
        ref = np.zeros((C, M), np.float32)
        np.add.at(ref.T, idx, vals.T)
        np.testing.assert_allclose(out, ref, atol=1e-5)

        y = rng.standard_normal((C, M)).astype(np.float32)
        outb = np.asarray(
            seg_broadcast_onehot(jnp.asarray(y), jnp.asarray(idx))
        )
        np.testing.assert_allclose(outb, y[:, idx], atol=0)

    def test_dense_g_a_matches_scatter(self, rng):
        import jax.numpy as jnp

        from libwave_tpu.ops.segmm import dense_g_a_onehot

        N, Pmax, M, Dj = 7, 40, 61, 6
        C = Dj * 3
        W = rng.standard_normal((C, N, Pmax)).astype(np.float32)
        lm_slot = rng.integers(0, M, (N, Pmax)).astype(np.int32)
        # zero-weight padding slots (the ELL contract)
        W[:, :, -5:] = 0.0
        hcomp = rng.standard_normal((6, M)).astype(np.float32)

        g3, a3 = dense_g_a_onehot(
            jnp.asarray(W), jnp.asarray(lm_slot), jnp.asarray(hcomp)
        )
        # reference: scatter G then apply Hinv
        G_ref = np.zeros((N, C, M), np.float32)
        for n in range(N):
            for s in range(Pmax):
                G_ref[n, :, lm_slot[n, s]] += W[:, n, s]
        np.testing.assert_allclose(np.asarray(g3), G_ref, atol=1e-4)
        at = {(0, 0): 0, (0, 1): 1, (0, 2): 2, (1, 0): 1, (1, 1): 3,
              (1, 2): 4, (2, 0): 2, (2, 1): 4, (2, 2): 5}
        A_ref = np.zeros((N, C, M), np.float32)
        for d in range(Dj):
            for l in range(3):
                A_ref[:, d * 3 + l] = sum(
                    G_ref[:, d * 3 + j] * hcomp[at[(j, l)]][None]
                    for j in range(3)
                )
        np.testing.assert_allclose(np.asarray(a3), A_ref, atol=1e-3)
