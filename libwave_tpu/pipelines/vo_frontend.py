"""Two-frame visual-odometry front end: detect -> describe -> match -> pose.

This is BASELINE.md measurement config (1) — "two-frame FAST+BRISK match +
essential pose" — promoted to a first-class pipeline. The reference assembles
the same flow by hand from wave_vision pieces (FASTDetector ->
BRISKDescriptor -> BruteForceMatcher with RANSAC, then OpenCV recoverPose
downstream); here the entire flow is one jit-able device program:

    fast_score/NMS/top-k  (dense, branch-free; detector.py)
      -> brisk_describe   (rotated-pattern bilinear gathers; descriptor.py)
      -> match_descriptors (Hamming table + ratio test + F-RANSAC; matcher.py)
      -> essential_from_fundamental + recover_pose (epipolar.py)

Everything is fixed-capacity + masks, so a batch of frame pairs vmaps and the
batch axis shards over a 'dp' mesh.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax.numpy as jnp

from libwave_tpu.geometry.se3 import SE3
from libwave_tpu.vision.descriptor import BRISKParams, brisk_describe
from libwave_tpu.vision.detector import FASTParams, detect_fast
from libwave_tpu.vision.epipolar import (
    essential_from_fundamental,
    recover_pose,
)
from libwave_tpu.vision.matcher import (
    MatcherParams,
    find_fundamental_ransac,
    match_descriptors,
)

__all__ = ["VOFrontendConfig", "TwoFrameResult", "two_frame_pose"]


@dataclass(frozen=True)
class VOFrontendConfig:
    fast: FASTParams = field(default_factory=FASTParams)
    brisk: BRISKParams = field(default_factory=BRISKParams)
    matcher: MatcherParams = field(
        # RANSAC runs once on the epipolar stage below; skip the matcher's
        # built-in outlier pass so the fundamental matrix is estimated from
        # ratio-test survivors exactly once.
        default_factory=lambda: MatcherParams(auto_remove_outliers=False)
    )
    ransac_reproj_px: float = 2.0
    ransac_hypotheses: int = 512


class TwoFrameResult(NamedTuple):
    T_21: SE3                 # camera-1 -> camera-2, ‖t‖ = 1
    xy1: jnp.ndarray          # (N, 2) keypoints in frame 1
    xy2: jnp.ndarray          # (N, 2) matched points in frame 2
    inliers: jnp.ndarray      # (N,) final epipolar+cheirality inliers
    E: jnp.ndarray            # (3, 3) essential matrix
    diagnostics: dict         # raw/filtered/good match counts, votes


def two_frame_pose(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    K: jnp.ndarray,
    key,
    config: VOFrontendConfig = VOFrontendConfig(),
) -> TwoFrameResult:
    """Relative camera pose between two grayscale frames (float images).

    Returns motion up to monocular scale: X_cam2 = R X_cam1 + t, ‖t‖=1.
    """
    xy1, _, m1 = detect_fast(img1, config.fast)
    xy2, _, m2 = detect_fast(img2, config.fast)
    d1, m1 = brisk_describe(img1, xy1, m1, config.brisk)
    d2, m2 = brisk_describe(img2, xy2, m2, config.brisk)

    idx2, valid, diag = match_descriptors(
        d1, d2, xy1, xy2, m1, m2, key, config.matcher
    )
    p1 = xy1.astype(jnp.float32)
    p2 = xy2[idx2].astype(jnp.float32)

    F, inl = find_fundamental_ransac(
        p1, p2, valid, key,
        reproj_px=config.ransac_reproj_px,
        num_hypotheses=config.ransac_hypotheses,
    )
    E = essential_from_fundamental(F, K)
    T_21, cheir, votes = recover_pose(E, p1, p2, K, inl)
    diag = dict(diag)
    diag["num_epipolar_inliers"] = jnp.sum(inl)
    diag["cheirality_votes"] = votes
    return TwoFrameResult(
        T_21=T_21, xy1=p1, xy2=p2, inliers=inl & cheir, E=E,
        diagnostics=diag,
    )
