"""Point-to-point ICP with multiscale schedule and LUM/Censi information.

Capability parity with the reference's ``ICPMatcher``
(wave_matching/include/wave/matching/icp.hpp:30-67, src/icp.cpp):

- params max_corr=3, max_iter=100, t_eps=1e-8, res=0.1, multiscale_steps=3,
  lidar angular/linear covariances, covar_estimator in {LUM, CENSI, LUMold};
- coarse-to-fine multiscale loop: leaf = 2^i * res, correspondence radius
  2^i * max_corr, composing a running transform (icp.cpp:77-103);
- ``estimateInfo``: LUM (Lu-Milios M'M edge information from final
  correspondences, icp_pcl_functions.cpp:182) and Censi/Haralick closed-form
  covariance with a polar sensor-noise model (icp.cpp:167-396).

TPU-first redesign:
- correspondence via chunked matmul NN (knn.py) instead of kd-trees;
- each iteration is a masked Umeyama (weighted SVD) alignment step — the
  same update PCL's transformation-estimation SVD performs, batched;
- the iteration loop is a fixed-trip ``lax.scan`` with the reference's
  t_eps stopping rule applied by convergence gating (matching/loop.py), so
  the whole multiscale match jits as one program with zero per-iteration
  host syncs;
- the Censi estimate replaces ~200 lines of hand-expanded euler-angle
  Hessians with ``jax.hessian``/``jax.jacfwd``-derived d2J/dX2 and d2J/dZdX
  of the same cost (exact, and batched over correspondences).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from libwave_tpu.geometry import euler as euler_mod
from libwave_tpu.geometry import so3
from libwave_tpu.geometry.se3 import SE3
from libwave_tpu.matching.knn import nearest_neighbor
from libwave_tpu.matching.loop import converged_scan
from libwave_tpu.matching.pointcloud import PointCloud, voxel_downsample
from libwave_tpu.utils.config import ConfigError

from libwave_tpu.utils.precision import f32_matmuls


@dataclasses.dataclass(frozen=True)
class ICPParams:
    """icp.hpp:30-65 parameter parity."""

    max_corr: float = 3.0
    max_iter: int = 100
    t_eps: float = 1e-8
    fit_eps: float = 1e-2
    lidar_ang_covar: float = 7.78e-9
    lidar_lin_covar: float = 2.5e-4
    multiscale_steps: int = 3
    res: float = 0.1
    covar_estimator: str = "LUM"  # LUM | CENSI | LUMold

    def validate(self):
        if self.max_iter <= 0:
            raise ConfigError("max_iter must be positive")
        if self.covar_estimator not in ("LUM", "CENSI", "LUMold"):
            raise ConfigError("invalid covariance estimate method")


class ICPResult(NamedTuple):
    transform: SE3  # maps ref -> target frame (the reference's `result`)
    converged: jnp.ndarray  # () bool
    iterations: jnp.ndarray  # () int32
    correspondences: jnp.ndarray  # (N,) target index per (downsampled) ref pt
    corr_valid: jnp.ndarray  # (N,) bool
    ref_ds: PointCloud  # downsampled ref used at finest scale
    target_ds: PointCloud  # downsampled target used at finest scale


def _umeyama_step(p, q, w):
    """Weighted rigid alignment p -> q (the SVD update inside each ICP
    iteration). Returns SE3."""
    wsum = jnp.sum(w) + 1e-12
    cp = jnp.sum(p * w[:, None], axis=0) / wsum
    cq = jnp.sum(q * w[:, None], axis=0) / wsum
    pc = p - cp
    qc = q - cq
    H = (pc * w[:, None]).T @ qc  # (3, 3)
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], H.dtype)).at[2, 2].set(d)
    R = Vt.T @ D @ U.T
    t = cq - R @ cp
    return SE3(q=so3.rot_to_quat(R), t=t)


def _icp_single_scale(ref: PointCloud, target: PointCloud, T0: SE3,
                      max_corr: float, max_iter: int, t_eps: float):
    """Fixed-scale ICP loop: static-trip scan with convergence gating
    (matching/loop.py — no per-iteration host sync). Returns
    (T, iters, corr)."""
    dtype = ref.points.dtype
    max_corr2 = max_corr * max_corr

    def corr_at(T):
        moved = T.apply(ref.points)
        idx, d2 = nearest_neighbor(moved, ref.mask, target.points, target.mask)
        valid = ref.mask & (d2 <= max_corr2)
        return idx, valid, moved

    def body(T):
        idx, valid, moved = corr_at(T)
        w = valid.astype(dtype)
        dT = _umeyama_step(moved, target.points[idx], w)
        T_new = dT.compose(T).normalize()
        delta = jnp.sum((dT.matrix() - jnp.eye(4, dtype=dT.t.dtype)) ** 2)
        return T_new, delta

    T, iters = converged_scan(body, T0, max_iter, t_eps, dtype)
    idx, valid, _ = corr_at(T)
    return T, iters, idx, valid


@f32_matmuls
def icp_match(ref: PointCloud, target: PointCloud,
              params: ICPParams = ICPParams(),
              init: SE3 | None = None) -> ICPResult:
    """Full reference match flow (icp.cpp:75-133): optional multiscale
    voxel pyramid composing a running transform, else single-scale."""
    dtype = ref.points.dtype
    T = SE3.identity(dtype=dtype) if init is None else init
    total_iters = jnp.asarray(0)

    if params.res > 0 and params.multiscale_steps > 0:
        for i in range(params.multiscale_steps, -1, -1):
            leaf = (2.0**i) * params.res
            r = voxel_downsample(ref, leaf)
            t = voxel_downsample(target, leaf)
            T, iters, idx, valid = _icp_single_scale(
                r, t, T, (2.0**i) * params.max_corr, params.max_iter,
                params.t_eps,
            )
            total_iters = total_iters + iters
        ref_ds, target_ds = r, t
    elif params.res > 0:
        ref_ds = voxel_downsample(ref, params.res)
        target_ds = voxel_downsample(target, params.res)
        T, iters, idx, valid = _icp_single_scale(
            ref_ds, target_ds, T, params.max_corr, params.max_iter, params.t_eps
        )
        total_iters = iters
    else:
        ref_ds, target_ds = ref, target
        T, iters, idx, valid = _icp_single_scale(
            ref_ds, target_ds, T, params.max_corr, params.max_iter, params.t_eps
        )
        total_iters = iters

    converged = jnp.sum(valid.astype(jnp.int32)) >= 3
    return ICPResult(
        transform=T,
        converged=converged,
        iterations=total_iters,
        correspondences=idx,
        corr_valid=valid,
        ref_ds=ref_ds,
        target_ds=target_ds,
    )


# ---------------------------------------------------------------------------
# Information-matrix estimation
# ---------------------------------------------------------------------------


@f32_matmuls
def estimate_info_lum(result: ICPResult) -> jnp.ndarray:
    """Lu-Milios edge information from final correspondences
    (estimateLUM, icp_pcl_functions.cpp:182): M'M assembled from
    correspondence midpoints, scaled by mean squared error / (2n - 3).

    Order of the 6 DOF: [x, y, z, rotx, roty, rotz] as in PCL's LUM.
    """
    res = result
    aligned = res.transform.apply(res.ref_ds.points)
    tgt = res.target_ds.points[res.correspondences]
    w = res.corr_valid.astype(aligned.dtype)
    aver = 0.5 * (aligned + tgt)
    diff = aligned - tgt

    x, y, z = aver[:, 0], aver[:, 1], aver[:, 2]
    n = jnp.sum(w)
    MM = jnp.zeros((6, 6), dtype=aligned.dtype)
    s = lambda v: jnp.sum(v * w)
    MM = MM.at[0, 0].set(n).at[1, 1].set(n).at[2, 2].set(n)
    MM = MM.at[0, 4].set(-s(y)).at[0, 5].set(s(z))
    MM = MM.at[1, 3].set(-s(z)).at[1, 4].set(s(x))
    MM = MM.at[2, 3].set(s(y)).at[2, 5].set(-s(x))
    MM = MM.at[3, 4].set(-s(x * z)).at[3, 5].set(-s(x * y))
    MM = MM.at[4, 5].set(-s(y * z))
    MM = MM.at[3, 3].set(s(y * y + z * z))
    MM = MM.at[4, 4].set(s(x * x + y * y))
    MM = MM.at[5, 5].set(s(x * x + z * z))
    MM = MM + jnp.triu(MM, 1).T  # symmetrize

    ss = jnp.sum(jnp.sum(diff * diff, axis=-1) * w)
    denom = jnp.maximum(2.0 * n - 3.0, 1.0)
    ss = jnp.maximum(ss / denom, 1e-12)
    info = MM / ss
    # degenerate guard (reference falls back to identity, icp_pcl:170-173)
    ok = jnp.isfinite(ss) & (ss > 1e-13)
    return jnp.where(ok, info, jnp.eye(6, dtype=aligned.dtype))


def _censi_cost(x6, matched_tgt, ref_pts):
    """Per-correspondence point-to-point cost in an euler chart
    x = [tx, ty, tz, roll, pitch, yaw] (321 sequence — any valid chart gives
    a consistent covariance; the reference uses Eigen's eulerAngles(0,1,2)):
    J_k = || R(rpy) ref_k + t - tgt_k ||^2."""
    t = x6[0:3]
    R = euler_mod.euler2rot(x6[3:6], 321)
    moved = ref_pts @ R.T + t
    d = moved - matched_tgt
    return jnp.sum(d * d, axis=-1)


def _spherical_jacobian(p):
    """d cartesian / d (range, bearing, azimuth) at point p — the sensor
    noise model mapping (icp.cpp:225-250)."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    rho = jnp.sqrt(x * x + y * y)
    rg = jnp.sqrt(x * x + y * y + z * z)
    br = jnp.arctan2(y, x)
    az = jnp.arctan2(z, jnp.maximum(rho, 1e-12))
    # the reference uses az measured from the z axis via cos(az)=z/rg form;
    # follow its exact basis: columns are d/d rg, d/d br, d/d az with
    # x = rg cos(br) sin(az'), ... where az' = angle from +z:
    azp = jnp.arccos(jnp.clip(z / jnp.maximum(rg, 1e-12), -1.0, 1.0))
    cb, sb = jnp.cos(br), jnp.sin(br)
    ca, sa = jnp.cos(azp), jnp.sin(azp)
    J = jnp.stack(
        [
            jnp.stack([cb * sa, -rg * sb * sa, rg * cb * ca], axis=-1),
            jnp.stack([sb * sa, rg * cb * sa, rg * ca * sb], axis=-1),
            jnp.stack([ca, jnp.zeros_like(ca), -rg * sa], axis=-1),
        ],
        axis=-2,
    )
    return J


@f32_matmuls
def estimate_info_censi(result: ICPResult, params: ICPParams) -> jnp.ndarray:
    """Censi/Haralick ICP covariance (estimateCensi, icp.cpp:167-396):

        cov(x) ~ A^-1 B cov(z) B^T A^-1,   A = d2J/dx2, B = d2J/dzdx

    computed here with jax second-order autodiff of the *same cost* instead
    of the reference's hand-expanded symbolic Hessians, batched over
    correspondences. Returns the information matrix (cov^-1).
    """
    dtype = result.ref_ds.points.dtype
    T = result.transform
    # x at the optimum, in the euler parameterization of the cost
    rpy = euler_mod.quat2euler(T.q, 321)
    x0 = jnp.concatenate([T.t, rpy]).astype(dtype)

    p_ref = result.target_ds.points[result.correspondences]  # target matches
    q_tgt = result.ref_ds.points  # ref points (moved by T in cost)
    w = result.corr_valid.astype(dtype)

    def total_cost(x):
        return jnp.sum(_censi_cost(x, p_ref, q_tgt) * w)

    A = jax.hessian(total_cost)(x0)  # (6, 6)

    # B_k = d2 J_k / dz dx with z = (p_k, q_k) in R^6; then
    # middle = sum_k B_k cov_Z B_k^T with cov_Z from the polar noise model.
    def per_corr_grad(x, p, q):
        return jax.grad(lambda xx: jnp.sum(_censi_cost(xx, p[None], q[None])))(x)

    def B_of(p, q):
        def g_of_z(z):
            return per_corr_grad(x0, z[0:3], z[3:6])

        z = jnp.concatenate([p, q])
        return jax.jacfwd(g_of_z)(z)  # (6 x, 6 z)

    Bs = jax.vmap(B_of)(p_ref, q_tgt)  # (N, 6, 6)

    lin = jnp.asarray(params.lidar_lin_covar, dtype)
    ang = jnp.asarray(params.lidar_ang_covar, dtype)
    sphere = jnp.diag(jnp.stack([lin, ang, ang, lin, ang, ang]))

    Jp = _spherical_jacobian(p_ref)  # (N, 3, 3)
    Jq = _spherical_jacobian(q_tgt)
    Z = jnp.zeros_like(Jp)
    Jz = jnp.concatenate(
        [
            jnp.concatenate([Jp, Z], axis=-1),
            jnp.concatenate([Z, Jq], axis=-1),
        ],
        axis=-2,
    )  # (N, 6, 6)
    covZ = Jz @ sphere @ jnp.swapaxes(Jz, -1, -2)
    middle = jnp.einsum(
        "nij,njk,nlk,n->il", Bs, covZ, Bs, w
    )
    A_inv = jnp.linalg.inv(A + 1e-9 * jnp.eye(6, dtype=dtype))
    cov = A_inv @ middle @ A_inv
    return jnp.linalg.inv(cov + 1e-12 * jnp.eye(6, dtype=dtype))


def estimate_info(result: ICPResult, params: ICPParams) -> jnp.ndarray:
    """Dispatch on covar_estimator (estimateInfo, icp.cpp:135). LUMold maps
    to the same Lu-Milios estimate (the reference keeps both for PCL-version
    compatibility; their consistency is a reference test,
    icp_tests.cpp:194)."""
    if params.covar_estimator == "CENSI":
        return estimate_info_censi(result, params)
    return estimate_info_lum(result)
