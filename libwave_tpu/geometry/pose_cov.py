"""SE(3) pose composition with 6x6 covariance propagation.

Capability parity with the reference's ``PoseWithCovariance`` /
``composePose`` (wave_utils/include/wave/utils/pose_cov_comp.hpp:62,
wave_utils/src/pose_cov_comp.cpp:104), which chains eight hand-written
p7/p6 Jacobians from the Blanco SE(3) tutorial over a
[x, y, z, yaw, pitch, roll] parameterization.

TPU-first redesign: the covariance lives on the se(3) *tangent space* at the
pose (right/body perturbation, twist order [omega, v] matching
:mod:`libwave_tpu.geometry.se3`). Composition Jacobians are then exact,
closed-form, and batched:

    T = T1 ∘ T2,  with  T ≈ (T1 exp(e1)) ∘ (T2 exp(e2))
                        = T exp(Ad(T2⁻¹) e1) exp(e2)  (first order)

    =>  Sigma = Ad(T2⁻¹) Sigma1 Ad(T2⁻¹)ᵀ + Sigma2

Correctness is verified against ``jax.jacobian`` of the composition map in
tests (replacing the reference's MATLAB oracle scripts,
wave_utils/tests/utils/matlab_scripts/pose_cov_comp.m).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from libwave_tpu.geometry import se3
from libwave_tpu.geometry.se3 import SE3

from libwave_tpu.utils.precision import f32_matmuls


class PoseWithCovariance(NamedTuple):
    """Pose with 6x6 tangent-space covariance (right perturbation)."""

    pose: SE3
    cov: jnp.ndarray  # (..., 6, 6), twist order [omega(3), v(3)]

    @staticmethod
    def certain(pose: SE3) -> "PoseWithCovariance":
        batch = pose.t.shape[:-1]
        return PoseWithCovariance(
            pose=pose, cov=jnp.zeros(batch + (6, 6), dtype=pose.t.dtype)
        )


@f32_matmuls
def compose_pose_with_covariance(
    p1: PoseWithCovariance, p2: PoseWithCovariance
) -> PoseWithCovariance:
    """Compose two uncertain poses: result = p1.pose ∘ p2.pose with propagated
    covariance. Batched over leading dims; cross-covariance assumed zero, as in
    the reference (pose_cov_comp.cpp:104 composePose)."""
    T = p1.pose.compose(p2.pose)
    A = se3.adjoint(p2.pose.inverse())  # (..., 6, 6)
    cov = A @ p1.cov @ jnp.swapaxes(A, -1, -2) + p2.cov
    return PoseWithCovariance(pose=T, cov=cov)


@f32_matmuls
def transform_point_with_covariance(
    p: PoseWithCovariance, x: jnp.ndarray, x_cov: jnp.ndarray | None = None
):
    """Transform a point and propagate covariance through the uncertain pose.

    y = R x + t;  J wrt twist [omega, v] is [-R hat(x), R] (right perturbation);
    J wrt x is R.

    Returns (y, y_cov) with y_cov shape (..., 3, 3).
    """
    from libwave_tpu.geometry import so3

    R = p.pose.rotation()
    y = p.pose.apply(x)
    J_omega = -R @ so3.hat(x)
    J = jnp.concatenate([J_omega, R], axis=-1)  # (..., 3, 6)
    y_cov = J @ p.cov @ jnp.swapaxes(J, -1, -2)
    if x_cov is not None:
        y_cov = y_cov + R @ x_cov @ jnp.swapaxes(R, -1, -2)
    return y, y_cov
