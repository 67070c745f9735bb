"""Epipolar geometry: essential matrix, pose recovery, triangulation.

The reference stops at fundamental-matrix outlier rejection
(cv::findFundamentalMat inside DescriptorMatcher::removeOutliers,
wave_vision/src/matcher/brute_force_matcher.cpp:122-158) and leaves relative
pose to downstream consumers of OpenCV (recoverPose). This module completes
the two-view geometry stack natively so the framework's front end produces
metric-direction camera motion without OpenCV:

- ``essential_from_fundamental``: E = K2ᵀ F K1.
- ``decompose_essential``: SVD -> the four (R, t) candidates.
- ``triangulate``: batched linear (DLT) midpoint triangulation.
- ``recover_pose``: cheirality vote over the four candidates (the
  cv::recoverPose contract), fully batched — all candidates evaluated at
  once, winner by masked inlier count.

Convention: x2ᵀ E x1 = 0 with x = K⁻¹ [u v 1]ᵀ; the recovered (R, t) maps
camera-1 coordinates into camera-2 (X2 = R X1 + t), ‖t‖ = 1 (monocular
scale ambiguity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from libwave_tpu.geometry.se3 import SE3

from libwave_tpu.utils.precision import f32_matmuls

__all__ = [
    "essential_from_fundamental",
    "decompose_essential",
    "triangulate",
    "recover_pose",
]


@f32_matmuls
def essential_from_fundamental(F, K1, K2=None):
    """E = K2ᵀ F K1, projected onto the essential manifold (two equal
    singular values, third zero)."""
    if K2 is None:
        K2 = K1
    E = K2.T @ F @ K1
    U, s, Vt = jnp.linalg.svd(E)
    sbar = 0.5 * (s[0] + s[1])
    return U @ jnp.diag(jnp.asarray([sbar, sbar, 0.0], E.dtype)) @ Vt


@f32_matmuls
def decompose_essential(E):
    """The four relative-pose candidates of an essential matrix.

    Returns (Rs (4, 3, 3), ts (4, 3)): (R1, t), (R1, -t), (R2, t), (R2, -t),
    with det(R) = +1 enforced.
    """
    U, _, Vt = jnp.linalg.svd(E)
    # keep rotations proper
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.asarray([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


@f32_matmuls
def triangulate(R, t, x1, x2):
    """Linear triangulation in normalized coordinates.

    Camera 1 at identity, camera 2 at [R | t]. ``x1``/``x2`` are (N, 2)
    normalized image points. Returns (X (N, 3) in camera-1 frame,
    depth1 (N,), depth2 (N,)).
    """
    P1 = jnp.concatenate(
        [jnp.eye(3, dtype=R.dtype), jnp.zeros((3, 1), R.dtype)], axis=1
    )
    P2 = jnp.concatenate([R, t[:, None]], axis=1)

    def one(u1, u2):
        A = jnp.stack(
            [
                u1[0] * P1[2] - P1[0],
                u1[1] * P1[2] - P1[1],
                u2[0] * P2[2] - P2[0],
                u2[1] * P2[2] - P2[1],
            ]
        )
        # smallest right singular vector of A
        _, _, Vt = jnp.linalg.svd(A)
        Xh = Vt[-1]
        w = jnp.where(jnp.abs(Xh[3]) < 1e-12, 1e-12, Xh[3])
        X = Xh[:3] / w
        z1 = X[2]
        z2 = (R @ X + t)[2]
        return X, z1, z2

    return jax.vmap(one)(x1, x2)


@f32_matmuls
def recover_pose(E, p1, p2, K, valid):
    """Select the cheirality-consistent (R, t) from an essential matrix.

    Batched analog of cv::recoverPose: all four candidates triangulate every
    correspondence simultaneously; the winner maximizes the count of valid
    points with positive depth in both cameras. Returns
    (SE3 T_21 with unit translation, cheirality_inliers (N,), votes (4,)).
    """
    Kinv = jnp.linalg.inv(K)
    ones = jnp.ones(p1.shape[:-1] + (1,), p1.dtype)
    x1 = (jnp.concatenate([p1, ones], -1) @ Kinv.T)[..., :2]
    x2 = (jnp.concatenate([p2, ones], -1) @ Kinv.T)[..., :2]

    Rs, ts = decompose_essential(E)

    def score(R, t):
        _, z1, z2 = triangulate(R, t, x1, x2)
        good = (z1 > 0) & (z2 > 0) & valid
        return jnp.sum(good), good

    votes, goods = jax.vmap(score)(Rs, ts)
    best = jnp.argmax(votes)
    R, t = Rs[best], ts[best]
    return SE3.from_rot_trans(R, t), goods[best], votes
