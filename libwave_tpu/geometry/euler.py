"""Euler-angle conversions (sequences 321 and 123) and angle wrapping.

Capability parity with the reference's euler helpers
(wave_utils/src/math.cpp:89 ``euler2rot``, :134 ``euler2quat``, :181
``quat2euler``; wave_utils/src/angles.cpp ``wrapToPi``/``wrapToTwoPi``;
math.cpp:77-88 ``wrapTo180``/``wrapTo360``), batched and jit-safe.

Sequence names follow the reference: the euler vector is ``[phi, theta, psi]``
(rotations about axes 1, 2, 3 = x, y, z); sequence ``321`` composes
``Rz(psi) @ Ry(theta) @ Rx(phi)`` (yaw-pitch-roll of a world-frame attitude),
sequence ``123`` is its transpose ordering ``Rx(phi)... `` producing the
body-from-world matrix.
"""

from __future__ import annotations

import jax.numpy as jnp

from libwave_tpu.geometry import so3


def wrap_to_pi(angle: jnp.ndarray) -> jnp.ndarray:
    """Wrap radians to (-pi, pi]."""
    return jnp.pi - jnp.mod(jnp.pi - angle, 2.0 * jnp.pi)


def wrap_to_two_pi(angle: jnp.ndarray) -> jnp.ndarray:
    """Wrap radians to [0, 2*pi)."""
    return jnp.mod(angle, 2.0 * jnp.pi)


def wrap_to_180(deg: jnp.ndarray) -> jnp.ndarray:
    """Wrap degrees to [-180, 180)."""
    return jnp.mod(deg + 180.0, 360.0) - 180.0


def wrap_to_360(deg: jnp.ndarray) -> jnp.ndarray:
    """Wrap degrees to [0, 360)."""
    return jnp.mod(deg, 360.0)


def deg2rad(d):
    return jnp.asarray(d) * (jnp.pi / 180.0)


def rad2deg(r):
    return jnp.asarray(r) * (180.0 / jnp.pi)


def _rot_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack(
        [
            jnp.stack([o, z, z], axis=-1),
            jnp.stack([z, c, -s], axis=-1),
            jnp.stack([z, s, c], axis=-1),
        ],
        axis=-2,
    )


def _rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack(
        [
            jnp.stack([c, z, s], axis=-1),
            jnp.stack([z, o, z], axis=-1),
            jnp.stack([-s, z, c], axis=-1),
        ],
        axis=-2,
    )


def _rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], axis=-1),
            jnp.stack([s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def euler2rot(euler: jnp.ndarray, seq: int = 321) -> jnp.ndarray:
    """Euler [phi, theta, psi] -> rotation matrix. seq in {321, 123}."""
    phi, theta, psi = euler[..., 0], euler[..., 1], euler[..., 2]
    if seq == 321:
        return _rot_z(psi) @ _rot_y(theta) @ _rot_x(phi)
    if seq == 123:
        return jnp.swapaxes(_rot_z(psi) @ _rot_y(theta) @ _rot_x(phi), -1, -2)
    raise ValueError(f"unsupported euler sequence {seq}; use 321 or 123")


def euler2quat(euler: jnp.ndarray, seq: int = 321) -> jnp.ndarray:
    """Euler [phi, theta, psi] -> unit quaternion [w, x, y, z]."""
    half = 0.5 * euler
    c1, c2, c3 = jnp.cos(half[..., 0]), jnp.cos(half[..., 1]), jnp.cos(half[..., 2])
    s1, s2, s3 = jnp.sin(half[..., 0]), jnp.sin(half[..., 1]), jnp.sin(half[..., 2])
    if seq not in (321, 123):
        raise ValueError(f"unsupported euler sequence {seq}; use 321 or 123")
    q = jnp.stack(
        [
            c1 * c2 * c3 + s1 * s2 * s3,
            s1 * c2 * c3 - c1 * s2 * s3,
            c1 * s2 * c3 + s1 * c2 * s3,
            c1 * c2 * s3 - s1 * s2 * c3,
        ],
        axis=-1,
    )
    if seq == 123:
        # euler2rot(e, 123) == euler2rot(e, 321).T, hence the conjugate.
        q = so3.quat_conjugate(q)
    return so3.quat_normalize(q)


def quat2euler(q: jnp.ndarray, seq: int = 321) -> jnp.ndarray:
    """Unit quaternion -> euler [phi, theta, psi] for seq in {321, 123}."""
    if seq not in (321, 123):
        raise ValueError(f"unsupported euler sequence {seq}; use 321 or 123")
    if seq == 123:
        q = so3.quat_conjugate(q)  # inverse of the conjugation in euler2quat
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    phi = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    theta = jnp.arcsin(jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0))
    psi = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return jnp.stack([phi, theta, psi], axis=-1)
