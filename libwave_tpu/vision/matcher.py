"""Descriptor matching: Hamming brute force, ratio/distance filters, RANSAC.

Capability parity with the reference's matcher stack (wave_vision):
- ``BruteForceMatcher`` (brute_force_matcher.hpp:20-145: NORM_HAMMING,
  use_knn with Lowe ratio 0.8, or distance heuristic
  ``d <= distance_threshold * min_d``; auto_remove_outliers via
  cv::findFundamentalMat with FM_RANSAC(3px, 0.99)/FM_8POINT/FM_LMEDS,
  src/matcher/brute_force_matcher.cpp:87-158) and the same filter pipeline in
  ``FLANNMatcher`` (flann_matcher.hpp) — on TPU an exact tiled
  distance-matrix sweep replaces the approximate FLANN index: at the
  fixed-capacity sizes used here, dense XOR+popcount on the VPU is faster
  than any tree/LSH walk would be.

TPU-first redesign:
- descriptors are packed uint32 words; the Hamming distance matrix is
  XOR + ``lax.population_count`` + a word-axis reduction, fully fused;
- knn is a two-column top-k over the masked distance matrix;
- RANSAC is *batched hypothesis* style: all H hypotheses (8-point samples)
  are solved simultaneously (batched SVD), scored by Sampson distance, and
  the best is refined — no sequential early exit (keyed RNG replaces
  cv::theRNG).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from libwave_tpu.utils.config import ConfigError

from libwave_tpu.utils.precision import f32_matmuls

_BIG = 1 << 24  # plain int: module import must not touch the backend
# (multihost processes import the library BEFORE jax.distributed.initialize)


@dataclasses.dataclass(frozen=True)
class MatcherParams:
    """brute_force_matcher.hpp:20-145 parameter parity."""

    use_knn: bool = True
    ratio_threshold: float = 0.8
    distance_threshold: float = 5.0
    cross_check: bool = False  # used with the distance heuristic (OpenCV BF)
    auto_remove_outliers: bool = True
    fm_method: str = "ransac"  # "ransac" | "8point" | "lmeds"
    ransac_reproj_px: float = 3.0
    ransac_hypotheses: int = 256
    # None = auto (fused Pallas top-2 kernel on TPU backends); set False to
    # force the XLA matrix path, e.g. when running on a CPU *device* of a
    # process whose default backend is TPU
    use_fused_top2: bool = None
    # Candidate-generation method (the FLANNMatcher/BruteForceMatcher split,
    # flann_matcher.hpp:39-51): "exact" = full Hamming (fused top-2 on
    # TPU); "lsh" = the bucketed multi-table LSH index (vision.flann),
    # sub-linear candidates — measured crossover vs the exact kernel is
    # ~16k x 16k descriptors (0.5x there, the only feasible path at 65k+
    # where the exact matrix/kernel no longer fits). The knn-ratio and
    # RANSAC stages downstream are shared.
    method: str = "exact"
    flann: object = None  # FLANNParams override (None = defaults + ratio)

    def validate(self):
        if not 0 < self.ratio_threshold <= 1:
            raise ConfigError("ratio_threshold must be in (0, 1]")
        if self.distance_threshold < 0:
            raise ConfigError("distance_threshold is a negative value!")
        if self.fm_method not in ("ransac", "8point", "lmeds"):
            raise ConfigError("fm_method is not an acceptable value!")
        if self.method not in ("exact", "lsh"):
            raise ConfigError("method must be exact | lsh")


def hamming_distance_matrix(
    d1: jnp.ndarray, d2: jnp.ndarray, mask1=None, mask2=None
) -> jnp.ndarray:
    """(N1, W) x (N2, W) packed-uint32 descriptors -> (N1, N2) int32 Hamming
    distances; masked rows/cols get a large sentinel distance."""
    x = jax.lax.population_count(d1[:, None, :] ^ d2[None, :, :])
    dist = jnp.sum(x, axis=-1).astype(jnp.int32)
    if mask1 is not None:
        dist = jnp.where(mask1[:, None], dist, _BIG)
    if mask2 is not None:
        dist = jnp.where(mask2[None, :], dist, _BIG)
    return dist


def match_ratio_test(dist: jnp.ndarray, ratio: float = 0.8):
    """Lowe ratio test on a distance matrix (knnMatch k=2 + filterMatches,
    brute_force_matcher.cpp:106-119).

    Returns (idx2 (N1,), valid (N1,)): best match per row, accepted when
    best/second <= ratio.
    """
    neg = -dist.astype(jnp.float32)
    top2, idx = jax.lax.top_k(neg, 2)
    best = -top2[:, 0]
    second = -top2[:, 1]
    valid = best <= ratio * second
    valid = valid & (best < jnp.float32(_BIG))
    return idx[:, 0], valid


def match_distance_heuristic(
    dist: jnp.ndarray, threshold: float, cross_check: bool = False
):
    """Distance-heuristic filter (brute_force_matcher.cpp:87-101): keep the
    best match per row when d <= threshold * min_d over all matches;
    optional cross-check (mutual best)."""
    idx2 = jnp.argmin(dist, axis=1)
    best = jnp.min(dist, axis=1)
    present = best < _BIG
    min_d = jnp.min(jnp.where(present, best, _BIG))
    valid = present & (best <= threshold * jnp.maximum(min_d, 1))
    if cross_check:
        idx1_of_2 = jnp.argmin(dist, axis=0)  # best row per column
        valid = valid & (idx1_of_2[idx2] == jnp.arange(dist.shape[0]))
    return idx2, valid


# ---------------------------------------------------------------------------
# Epipolar outlier rejection (cv::findFundamentalMat replacement)
# ---------------------------------------------------------------------------


def _normalize_points(pts, w):
    """Hartley normalization over weighted points: zero mean, sqrt(2) RMS."""
    wsum = jnp.sum(w) + 1e-9
    mean = jnp.sum(pts * w[:, None], axis=0) / wsum
    d = jnp.sqrt(jnp.sum((pts - mean) ** 2, axis=-1))
    scale = jnp.sqrt(2.0) / (jnp.sum(d * w) / wsum + 1e-9)
    T = jnp.asarray(
        [
            [scale, 0.0, -scale * mean[0]],
            [0.0, scale, -scale * mean[1]],
            [0.0, 0.0, 1.0],
        ],
        dtype=pts.dtype,
    )
    pn = (pts - mean) * scale
    return pn, T


def _eight_point(p1, p2, w):
    """Weighted 8-point fundamental matrix from (N,2)+(N,2) with weights.

    Solves min ||A f|| via the eigenvector of A^T W A with smallest
    eigenvalue, then enforces rank 2. Returns (3,3) F mapping p1 -> lines in
    image 2: p2h^T F p1h = 0.
    """
    p1n, T1 = _normalize_points(p1, w)
    p2n, T2 = _normalize_points(p2, w)
    x1, y1 = p1n[:, 0], p1n[:, 1]
    x2, y2 = p2n[:, 0], p2n[:, 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )
    AtA = (A * w[:, None]).T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    f = vecs[:, 0]
    F = f.reshape(3, 3)
    # rank-2 enforcement
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    F = (U * S[None, :]) @ Vt
    return T2.T @ F @ T1


def _sampson_distance(F, p1, p2):
    """Squared Sampson distance per correspondence (px^2)."""
    ones = jnp.ones((p1.shape[0], 1), dtype=p1.dtype)
    x1 = jnp.concatenate([p1, ones], axis=-1)
    x2 = jnp.concatenate([p2, ones], axis=-1)
    Fx1 = x1 @ F.T  # (N, 3) = F @ x1
    Ftx2 = x2 @ F  # (N, 3) = F^T @ x2
    num = jnp.sum(x2 * Fx1, axis=-1) ** 2
    den = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
    return num / (den + 1e-12)


@f32_matmuls
def find_fundamental_ransac(
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    reproj_px: float = 3.0,
    num_hypotheses: int = 256,
    lmeds: bool = False,
):
    """Batched-hypothesis RANSAC (or LMedS) fundamental-matrix estimation.

    All hypotheses sample 8 valid correspondences with a keyed RNG, solve in
    one batched eigendecomposition, and score simultaneously; the winner is
    refined by a weighted 8-point solve on its inliers. Replaces
    cv::findFundamentalMat(FM_RANSAC, 3.0, 0.99) at
    brute_force_matcher.cpp:147.

    Returns (F (3,3), inlier_mask (N,)).
    """
    N = p1.shape[0]
    w = valid.astype(p1.dtype)

    # sample 8 indices per hypothesis, biased to valid entries via gumbel-max
    keys = jax.random.split(key, num_hypotheses)

    def sample(k):
        g = jax.random.gumbel(k, (N,), dtype=p1.dtype)
        scores = jnp.where(valid, g, -jnp.inf)
        _, idx = jax.lax.top_k(scores, 8)
        return idx

    idx = jax.vmap(sample)(keys)  # (H, 8)

    def solve(ii):
        ww = jnp.ones((8,), dtype=p1.dtype)
        return _eight_point(p1[ii], p2[ii], ww)

    Fs = jax.vmap(solve)(idx)  # (H, 3, 3)
    d2 = jax.vmap(lambda F: _sampson_distance(F, p1, p2))(Fs)  # (H, N)
    thresh = reproj_px * reproj_px
    if lmeds:
        # median of squared distances over valid correspondences
        big = jnp.where(valid[None, :], d2, jnp.inf)
        med = jnp.nanmedian(jnp.where(jnp.isinf(big), jnp.nan, big), axis=1)
        best = jnp.argmin(med)
        # LMedS inliers: within 2.5 * robust sigma
        sigma2 = 2.1981 * med[best]
        inliers = valid & (d2[best] < 6.25 * sigma2)
    else:
        inl = (d2 < thresh) & valid[None, :]
        counts = jnp.sum(inl, axis=1)
        best = jnp.argmax(counts)
        inliers = inl[best]

    # refine on inliers with weighted 8-point
    F = _eight_point(p1, p2, inliers.astype(p1.dtype))
    final_inliers = valid & (_sampson_distance(F, p1, p2) < thresh)
    return F, final_inliers


def match_descriptors(
    desc1, desc2, xy1, xy2, mask1, mask2, key,
    params: MatcherParams = MatcherParams(),
):
    """Full reference matching pipeline (matchDescriptors,
    brute_force_matcher.cpp:160-207): Hamming distances -> knn-ratio or
    distance filter -> optional epipolar outlier rejection.

    Returns (idx2 (N1,), valid (N1,), diagnostics dict). Row i of image-1
    keypoints matches xy2[idx2[i]] where valid.

    On TPU the knn path runs the fused Hamming+top-2 Pallas kernel
    (libwave_tpu.ops.hamming.hamming_top2) — per-row running top-2 in VMEM,
    no (N1, N2) matrix in HBM; elsewhere (and for the distance heuristic,
    which needs the full matrix for cross-check) the XLA matrix path.
    """
    fused = (
        params.use_fused_top2
        if params.use_fused_top2 is not None
        else jax.default_backend() == "tpu"
    )
    if params.method == "lsh":
        from libwave_tpu.vision.flann import (
            FLANNParams,
            build_lsh_index,
            lsh_match,
        )

        if params.flann is not None:
            # a user-supplied FLANNParams is authoritative — including its
            # ratio_threshold (don't silently clobber it with the
            # matcher-level default)
            fp = params.flann
        else:
            fp = dataclasses.replace(
                FLANNParams(), ratio_threshold=params.ratio_threshold
            )
        index = build_lsh_index(desc2, mask2, fp)
        idx2, valid, lsh_diag = lsh_match(desc1, mask1, index, fp)
    elif params.use_knn and fused:
        from libwave_tpu.ops.hamming import hamming_top2

        best, second, idx2 = hamming_top2(desc1, desc2, mask2)
        valid = (
            (best.astype(jnp.float32)
             <= params.ratio_threshold * second.astype(jnp.float32))
            & (best < _BIG)
        )
    elif params.use_knn:
        dist = hamming_distance_matrix(desc1, desc2, mask1, mask2)
        idx2, valid = match_ratio_test(dist, params.ratio_threshold)
    else:
        dist = hamming_distance_matrix(desc1, desc2, mask1, mask2)
        idx2, valid = match_distance_heuristic(
            dist, params.distance_threshold, params.cross_check
        )
    valid = valid & mask1
    num_filtered = jnp.sum(valid)

    if params.auto_remove_outliers:
        p1 = xy1
        p2 = xy2[idx2]
        F, inliers = find_fundamental_ransac(
            p1, p2, valid, key,
            reproj_px=params.ransac_reproj_px,
            num_hypotheses=params.ransac_hypotheses,
            lmeds=params.fm_method == "lmeds",
        )
        valid = valid & inliers

    diagnostics = {
        "num_raw_matches": jnp.sum(mask1),
        "num_filtered_matches": num_filtered,
        "num_good_matches": jnp.sum(valid),
    }
    if params.method == "lsh":
        # candidate-budget evidence (sub-linear generation) rides along
        diagnostics["num_candidates"] = lsh_diag["num_candidates"]
    return idx2, valid, diagnostics
