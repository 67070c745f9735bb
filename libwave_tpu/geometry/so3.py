"""Batched SO(3): quaternions, rotation matrices, exp/log maps.

TPU-native replacement for the reference's scalar Eigen rotation helpers
(wave_utils/src/math.cpp:89-260 ``euler2rot``/``euler2quat``/``quat2euler``/
``quat2rot``) and the wave_geometry rotation types. All functions broadcast over
leading batch dimensions and are safe under ``jit``/``vmap``/``grad`` —
small-angle singularities use Taylor-series branches selected with ``where`` on
safe operands so gradients stay finite.

Conventions:
- quaternion ``q = [w, x, y, z]``, Hamilton product, unit norm, rotates vectors
  by ``R(q) @ v``;
- tangent vectors (rotation vectors) ``phi`` in R^3 with ``R = exp(hat(phi))``;
- right-handed frames throughout.
"""

from __future__ import annotations

import jax.numpy as jnp

# Small-angle cutoff: below this, use Taylor expansions. sqrt(eps) for f32.
_SMALL = 1e-6


def _stack_last(parts):
    return jnp.stack(parts, axis=-1)


# ---------------------------------------------------------------------------
# hat / vee
# ---------------------------------------------------------------------------


def hat(phi: jnp.ndarray) -> jnp.ndarray:
    """Map R^3 -> so(3): the skew-symmetric cross-product matrix.

    ``hat(a) @ b == cross(a, b)``. Shape (..., 3) -> (..., 3, 3).
    """
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zero = jnp.zeros_like(x)
    rows = [
        _stack_last([zero, -z, y]),
        _stack_last([z, zero, -x]),
        _stack_last([-y, x, zero]),
    ]
    return jnp.stack(rows, axis=-2)


def vee(Phi: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`hat`. Shape (..., 3, 3) -> (..., 3)."""
    return _stack_last([Phi[..., 2, 1], Phi[..., 0, 2], Phi[..., 1, 0]])


# ---------------------------------------------------------------------------
# quaternion algebra
# ---------------------------------------------------------------------------


def quat_identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    """Identity quaternion(s) of shape ``shape + (4,)``."""
    q = jnp.zeros(tuple(shape) + (4,), dtype=dtype)
    return q.at[..., 0].set(1.0)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b; composition of rotations R(a)R(b)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return _stack_last(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ]
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (= inverse for unit quaternions)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inverse(q: jnp.ndarray) -> jnp.ndarray:
    return quat_conjugate(q)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize to unit quaternion, canonicalized to w >= 0."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by unit quaternion(s) q: ``R(q) @ v``.

    Uses the 2-cross-product expansion (no 3x3 matrix materialized).
    """
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> rotation matrix. (..., 4) -> (..., 3, 3).

    Parity with quat2rot (wave_utils/src/math.cpp:232).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rows = [
        _stack_last([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)]),
        _stack_last([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)]),
        _stack_last([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)]),
    ]
    return jnp.stack(rows, axis=-2)


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w >= 0), branch-free.

    Computes all four Shepperd candidates and selects the best-conditioned one
    with ``where`` — no data-dependent control flow, so it vectorizes on the
    VPU across the batch.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    one = jnp.ones_like(tr)

    # Four candidate (unnormalized) quaternions, each scaled by 4*component^2.
    qw = _stack_last([one + tr, m21 - m12, m02 - m20, m10 - m01])
    qx = _stack_last([m21 - m12, one + m00 - m11 - m22, m01 + m10, m02 + m20])
    qy = _stack_last([m02 - m20, m01 + m10, one - m00 + m11 - m22, m12 + m21])
    qz = _stack_last([m10 - m01, m02 + m20, m12 + m21, one - m00 - m11 + m22])

    # Pick the candidate whose pivot (first listed diagonal term) is largest.
    pivots = jnp.stack(
        [one + tr, one + m00 - m11 - m22, one - m00 + m11 - m22, one - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# exp / log
# ---------------------------------------------------------------------------


def _safe_theta(phi):
    """(theta2, safe_theta, small): ``safe_theta`` equals |phi| off the
    small-angle branch and 1.0 on it, with sqrt evaluated away from 0 so
    gradients stay finite (the where-guard must protect the sqrt *input*)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    small = theta2 < _SMALL * _SMALL
    safe = jnp.sqrt(jnp.where(small, 1.0, theta2))
    return theta2, safe, small


def exp(phi: jnp.ndarray) -> jnp.ndarray:
    """so(3) -> SO(3) as rotation matrix (Rodrigues). (..., 3) -> (..., 3, 3)."""
    theta2, theta, small = _safe_theta(phi)
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks.
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta * theta))
    Phi = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return eye + a[..., None, None] * Phi + b[..., None, None] * (Phi @ Phi)


def exp_quat(phi: jnp.ndarray) -> jnp.ndarray:
    """so(3) -> unit quaternion. (..., 3) -> (..., 4)."""
    theta2, theta, small = _safe_theta(phi)
    half = 0.5 * theta
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    return jnp.concatenate([w[..., None], k[..., None] * phi], axis=-1)


def log(R: jnp.ndarray) -> jnp.ndarray:
    """SO(3) -> so(3) from rotation matrix. (..., 3, 3) -> (..., 3).

    Goes through the quaternion for a numerically robust inverse near pi.
    """
    return log_quat(rot_to_quat(R))


def log_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> rotation vector. (..., 4) -> (..., 3)."""
    q = jnp.where(q[..., :1] < 0, -q, q)  # w >= 0 => theta in [0, pi]
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    vn2 = jnp.sum(q[..., 1:4] * q[..., 1:4], axis=-1)
    small = vn2 < _SMALL * _SMALL
    vn = jnp.sqrt(jnp.where(small, 1.0, vn2))
    theta = 2.0 * jnp.arctan2(vn, w)
    # theta/vn -> 2/w - 2 vn^2 / (3 w^3) as vn -> 0 (w ~ 1 here since w >= 0).
    safe_w = jnp.maximum(w, _SMALL)
    k = jnp.where(
        small, 2.0 / safe_w - 2.0 * vn2 / (3.0 * safe_w**3), theta / vn
    )
    return k[..., None] * q[..., 1:4]


def left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J_l of SO(3): d exp(phi+d) ≈ exp(J_l d) exp(phi)."""
    theta2, theta, small = _safe_theta(phi)
    safe2 = theta * theta
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe2)
    b = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (safe2 * theta)
    )
    Phi = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return eye + a[..., None, None] * Phi + b[..., None, None] * (Phi @ Phi)


def left_jacobian_inverse(phi: jnp.ndarray) -> jnp.ndarray:
    """Inverse left Jacobian of SO(3)."""
    theta2, theta, small = _safe_theta(phi)
    half = 0.5 * theta
    cot = jnp.cos(half) / jnp.sin(half)
    k = jnp.where(
        small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - half * cot) / (theta * theta)
    )
    Phi = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return eye - 0.5 * Phi + k[..., None, None] * (Phi @ Phi)


# ---------------------------------------------------------------------------
# boxplus / boxminus on the quaternion chart (right perturbation)
# ---------------------------------------------------------------------------


def quat_boxplus(q: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """Retract: q ⊞ phi = q ⊗ exp(phi). Right (body-frame) perturbation."""
    return quat_multiply(q, exp_quat(phi))


def quat_boxminus(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Local coordinates: q1 ⊟ q2 = log(q2⁻¹ ⊗ q1), inverse of boxplus."""
    return log_quat(quat_multiply(quat_inverse(q2), q1))


def rotation_distance(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle between two rotations, in radians."""
    return jnp.linalg.norm(quat_boxminus(q1, q2), axis=-1)
