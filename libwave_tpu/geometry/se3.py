"""Batched SE(3) rigid transforms as (quaternion, translation) pytrees.

TPU-native replacement for the reference's Eigen ``Affine3d`` /
wave_geometry transform usage (e.g. wave_matching/include/wave/matching/
matcher.hpp:52 result transforms, wave_kinematics pose.hpp:21). An :class:`SE3`
is a NamedTuple pytree of ``q`` (..., 4) Hamilton [w,x,y,z] and ``t`` (..., 3);
it broadcasts over leading batch dims and composes with vmap/scan/jit.

Tangent-space convention: twists are ordered ``xi = [omega, v]`` with the
rotational block FIRST, matching the 6x6 covariance block layout used by the
factor-graph back end (rotation indices 0:3, translation 3:6).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from libwave_tpu.geometry import so3


class SE3(NamedTuple):
    """Rigid transform: ``x_out = R(q) @ x_in + t``. Pytree of two arrays."""

    q: jnp.ndarray  # (..., 4) unit quaternion [w, x, y, z]
    t: jnp.ndarray  # (..., 3)

    @staticmethod
    def identity(shape=(), dtype=jnp.float32) -> "SE3":
        return SE3(
            q=so3.quat_identity(shape, dtype),
            t=jnp.zeros(tuple(shape) + (3,), dtype=dtype),
        )

    @staticmethod
    def from_rot_trans(R: jnp.ndarray, t: jnp.ndarray) -> "SE3":
        return SE3(q=so3.rot_to_quat(R), t=t)

    @staticmethod
    def from_matrix(T: jnp.ndarray) -> "SE3":
        """From (..., 4, 4) homogeneous matrices."""
        return SE3(q=so3.rot_to_quat(T[..., :3, :3]), t=T[..., :3, 3])

    def rotation(self) -> jnp.ndarray:
        return so3.quat_to_rot(self.q)

    def matrix(self) -> jnp.ndarray:
        """As (..., 4, 4) homogeneous matrices."""
        R = self.rotation()
        batch = R.shape[:-2]
        T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
        T = T.at[..., :3, :3].set(R)
        T = T.at[..., :3, 3].set(self.t)
        return T.at[..., 3, 3].set(1.0)

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """Transform points: (..., 3) -> (..., 3)."""
        return so3.quat_rotate(self.q, x) + self.t

    def compose(self, other: "SE3") -> "SE3":
        """self ∘ other (apply ``other`` first)."""
        return SE3(
            q=so3.quat_multiply(self.q, other.q),
            t=so3.quat_rotate(self.q, other.t) + self.t,
        )

    def inverse(self) -> "SE3":
        qi = so3.quat_inverse(self.q)
        return SE3(q=qi, t=-so3.quat_rotate(qi, self.t))

    def normalize(self) -> "SE3":
        return SE3(q=so3.quat_normalize(self.q), t=self.t)


# ---------------------------------------------------------------------------
# exp / log / retraction  (twist order: [omega(3), v(3)])
# ---------------------------------------------------------------------------


def exp(xi: jnp.ndarray) -> SE3:
    """se(3) -> SE(3). ``xi = [omega, v]`` shape (..., 6)."""
    omega, v = xi[..., 0:3], xi[..., 3:6]
    q = so3.exp_quat(omega)
    V = so3.left_jacobian(omega)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return SE3(q=q, t=t)


def log(T: SE3) -> jnp.ndarray:
    """SE(3) -> se(3) twist ``[omega, v]`` of shape (..., 6)."""
    omega = so3.log_quat(T.q)
    Vinv = so3.left_jacobian_inverse(omega)
    v = jnp.einsum("...ij,...j->...i", Vinv, T.t)
    return jnp.concatenate([omega, v], axis=-1)


def boxplus(T: SE3, xi: jnp.ndarray) -> SE3:
    """Right retraction: T ⊞ xi = T ∘ exp(xi).

    This is the manifold update used by the Gauss-Newton solver — matching the
    block Retract pattern of the reference's combined states
    (wave_gtsam/include/wave/gtsam/pose_vel.hpp:69 traits).
    """
    return T.compose(exp(xi))


def boxminus(T1: SE3, T2: SE3) -> jnp.ndarray:
    """Local coordinates: log(T2⁻¹ ∘ T1); inverse of :func:`boxplus`."""
    return log(T2.inverse().compose(T1))


def adjoint(T: SE3) -> jnp.ndarray:
    """6x6 adjoint with twist order [omega, v]:

    Ad = [[R, 0], [hat(t) R, R]].
    """
    R = T.rotation()
    batch = R.shape[:-2]
    A = jnp.zeros(batch + (6, 6), dtype=R.dtype)
    A = A.at[..., 0:3, 0:3].set(R)
    A = A.at[..., 3:6, 3:6].set(R)
    return A.at[..., 3:6, 0:3].set(so3.hat(T.t) @ R)


def interpolate(T1: SE3, T2: SE3, alpha) -> SE3:
    """Geodesic interpolation T1 ∘ exp(alpha * log(T1⁻¹ T2)).

    SO(3)-aware pose interpolation — parity with the reference's specialized
    PoseMeasurement interpolation (wave_benchmark/include/wave/benchmark/
    pose_measurement.hpp:31-49) and the transparent interpolating ``get`` of the
    measurement container.
    """
    alpha = jnp.asarray(alpha)[..., None]
    return boxplus(T1, alpha * boxminus(T2, T1))
