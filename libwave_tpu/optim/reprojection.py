"""Reprojection factor bank: residuals + hand-derived manifold Jacobians.

Capability parity with the reference's ``BAResidual`` autodiff functor
(wave_optimization/include/wave/optimization/ceres/ba.hpp:16-93: pixel error of
``pinholeProject(K, R(q_GC), p_GC, X)``) — but instead of per-observation
autodiff Jets, the whole bank of K observations linearizes as one vmapped
closed-form evaluation:

    pc   = R(q)^T (X - p)                 (camera-frame point)
    uv   = [fx pcx/pcz + cx, fy pcy/pcz + cy]
    r    = uv - measurement

Pose tangent is the product-manifold perturbation ``[omega(3), dp(3)]`` with
``q <- q ⊗ exp(omega)`` (right perturbation) and ``p <- p + dp``; the
closed-form blocks are

    d pc/d omega = hat(pc)        d pc/d dp = -R^T       d pc/d X = R^T

chained through the projection Jacobian ``d uv/d pc``. Verified against
``jax.jacobian`` in tests (replacing Ceres' autodiff check).
"""

from __future__ import annotations

import jax.numpy as jnp

from libwave_tpu.geometry import so3


def _camera_point(q_GC, p_GC, X):
    """World point -> camera frame, plus R (world-from-camera)."""
    return so3.quat_rotate(so3.quat_inverse(q_GC), X - p_GC)


def reprojection_residual(K, q_GC, p_GC, X, uv_meas):
    """Residual r = project(X) - uv_meas. Broadcasts over leading dims.

    Returns (r, valid) where valid is the cheirality flag (z > eps); invalid
    observations should be weighted to zero by the caller rather than allowed
    to produce huge residuals.
    """
    pc = _camera_point(q_GC, p_GC, X)
    z = pc[..., 2]
    valid = z > 1e-6
    safe_z = jnp.where(valid, z, 1.0)
    fx = K[0, 0]
    fy = K[1, 1]
    cx = K[0, 2]
    cy = K[1, 2]
    u = fx * pc[..., 0] / safe_z + cx
    v = fy * pc[..., 1] / safe_z + cy
    r = jnp.stack([u, v], axis=-1) - uv_meas
    return jnp.where(valid[..., None], r, 0.0), valid


def linearize_reprojection(K, q_GC, p_GC, X, uv_meas):
    """Residual and Jacobian blocks for a bank of observations.

    All inputs broadcast over a leading observation axis:
      q_GC (K_,4), p_GC (K_,3), X (K_,3), uv_meas (K_,2)

    Returns (r (K_,2), J_pose (K_,2,6) in [omega, dp] order, J_lm (K_,2,3),
    valid (K_,)).
    """
    Rt = so3.quat_to_rot(so3.quat_inverse(q_GC))  # R^T, rotates world->camera
    pc = jnp.einsum("...ij,...j->...i", Rt, X - p_GC)
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    valid = z > 1e-6
    zs = jnp.where(valid, z, 1.0)

    fx = K[0, 0]
    fy = K[1, 1]
    u = fx * x / zs + K[0, 2]
    v = fy * y / zs + K[1, 2]
    r = jnp.stack([u, v], axis=-1) - uv_meas
    r = jnp.where(valid[..., None], r, 0.0)

    # d uv / d pc : (K_, 2, 3)
    zero = jnp.zeros_like(x)
    inv_z = 1.0 / zs
    J_proj = jnp.stack(
        [
            jnp.stack([fx * inv_z, zero, -fx * x * inv_z * inv_z], axis=-1),
            jnp.stack([zero, fy * inv_z, -fy * y * inv_z * inv_z], axis=-1),
        ],
        axis=-2,
    )
    # d pc / d omega = hat(pc);  d pc / d dp = -R^T;  d pc / d X = R^T
    J_omega = J_proj @ so3.hat(pc)
    J_dp = -(J_proj @ Rt)
    J_lm = J_proj @ Rt
    J_pose = jnp.concatenate([J_omega, J_dp], axis=-1)  # (K_, 2, 6)

    mask = valid[..., None, None]
    return r, jnp.where(mask, J_pose, 0.0), jnp.where(mask, J_lm, 0.0), valid
