"""Generalized ICP (plane-to-plane).

Capability parity with the reference's ``GICPMatcher`` wrapping
pcl::GeneralizedIterativeClosestPoint (wave_matching/include/wave/matching/
gicp.hpp:13-41, src/gicp.cpp: params corr_rand=10, max_iter=100, res,
fit_eps, rotation/translation epsilons).

TPU-first: per-point covariances come from k-NN neighborhoods regularized to
the GICP (1, 1, eps) plane model, computed once per cloud with the chunked
matmul k-NN; each iteration is a Gauss-Newton step on the Mahalanobis cost
    r_k = q_k - T p_k,   W_k = (C_q + R C_p R^T)^{-1}
batched over correspondences (segment-free: the 6x6 normal equations are a
single einsum reduction).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from libwave_tpu.geometry import so3
from libwave_tpu.geometry.se3 import SE3
from libwave_tpu.matching.knn import knn, nearest_neighbor
from libwave_tpu.matching.loop import converged_scan
from libwave_tpu.matching.pointcloud import PointCloud, voxel_downsample
from libwave_tpu.utils.config import ConfigError

from libwave_tpu.utils.precision import f32_matmuls


@dataclasses.dataclass(frozen=True)
class GICPParams:
    max_corr: float = 3.0
    max_iter: int = 50
    t_eps: float = 1e-8
    k_neighbors: int = 10  # corr_rand parity: neighborhood size
    plane_eps: float = 1e-3  # GICP epsilon along the normal
    res: float = 0.1

    def validate(self):
        if self.k_neighbors < 3:
            raise ConfigError("k_neighbors must be >= 3")
        if self.max_iter <= 0:
            raise ConfigError("max_iter must be positive")


def _point_covariances(cloud: PointCloud, k: int, eps: float):
    """GICP-regularized neighborhood covariances: eigen-decompose the k-NN
    scatter and clamp eigenvalues to (1, 1, eps) (plane-to-plane model)."""
    idx, d2 = knn(cloud.points, cloud.mask, cloud.points, cloud.mask, k)
    nbrs = cloud.points[idx]  # (N, k, 3)
    valid = jnp.isfinite(d2)
    w = valid.astype(cloud.points.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
    mean = jnp.sum(nbrs * w[..., None], axis=1, keepdims=True) / cnt[..., None]
    d = (nbrs - mean) * w[..., None]
    C = jnp.einsum("nki,nkj->nij", d, d) / cnt[..., None]
    # eigen clamp
    vals, vecs = jnp.linalg.eigh(C)
    clamped = jnp.concatenate(
        [
            jnp.full(vals.shape[:-1] + (1,), eps, vals.dtype),
            jnp.ones(vals.shape[:-1] + (2,), vals.dtype),
        ],
        axis=-1,
    )  # smallest eigenvalue -> eps (normal direction), others -> 1
    return vecs @ (clamped[..., None] * jnp.swapaxes(vecs, -1, -2))


class GICPResult(NamedTuple):
    transform: SE3
    converged: jnp.ndarray
    iterations: jnp.ndarray


@f32_matmuls
def gicp_match(ref: PointCloud, target: PointCloud,
               params: GICPParams = GICPParams(),
               init: SE3 | None = None) -> GICPResult:
    dtype = ref.points.dtype
    if params.res > 0:
        ref = voxel_downsample(ref, params.res)
        target = voxel_downsample(target, params.res)
    Cp = _point_covariances(ref, params.k_neighbors, params.plane_eps)
    Cq = _point_covariances(target, params.k_neighbors, params.plane_eps)
    max_corr2 = params.max_corr * params.max_corr
    T0 = SE3.identity(dtype=dtype) if init is None else init

    def body(T):
        R = T.rotation()
        moved = ref.points @ R.T + T.t
        idx, d2 = nearest_neighbor(moved, ref.mask, target.points, target.mask)
        valid = ref.mask & (d2 <= max_corr2)
        w = valid.astype(dtype)
        q = target.points[idx]
        W = jnp.linalg.inv(
            Cq[idx] + R @ Cp @ R.T + 1e-9 * jnp.eye(3, dtype=dtype)
        )  # (N, 3, 3)
        r = q - moved  # (N, 3)
        # Jacobian of r wrt [omega, v] (right perturbation on T):
        # d moved / d omega = -R hat(p) ... use world-frame small rotation:
        # moved' = exp(w)^ (R p + t) + v => dr/dw = hat(moved), dr/dv = -I
        Hm = so3.hat(moved)  # (N, 3, 3); dr/domega = +hat(moved)
        J = jnp.concatenate([Hm, -jnp.broadcast_to(jnp.eye(3, dtype=dtype), Hm.shape)], axis=-1)  # (N, 3, 6)
        JtW = jnp.einsum("nij,nik->njk", J, W)  # (N, 6, 3) = J^T W
        H = jnp.einsum("njk,nkl,n->jl", JtW, J, w)  # (6, 6) = sum J^T W J
        b = -jnp.einsum("njk,nk,n->j", JtW, r, w)  # = -sum J^T W r
        # GN: H dx = -sum J^T W r = b
        dx = jnp.linalg.solve(H + 1e-9 * jnp.eye(6, dtype=dtype), b)
        dT = SE3(q=so3.exp_quat(dx[0:3]), t=dx[3:6])
        T_new = dT.compose(T).normalize()
        delta = jnp.sum(dx * dx)
        return T_new, delta

    T, iters = converged_scan(body, T0, params.max_iter, params.t_eps, dtype)
    return GICPResult(transform=T, converged=iters < params.max_iter,
                      iterations=iters)
