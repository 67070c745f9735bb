"""Position + orientation record.

Parity with the reference's ``Pose`` (wave_kinematics/include/wave/kinematics/
pose.hpp:21 {Vec3 position, Quaternion orientation}). Thin alias of the
geometry SE3 with the reference's accessor names.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from libwave_tpu.geometry import so3


class Pose(NamedTuple):
    position: jnp.ndarray  # (..., 3)
    orientation: jnp.ndarray  # (..., 4) quaternion [w, x, y, z]

    def rotation_matrix(self) -> jnp.ndarray:
        return so3.quat_to_rot(self.orientation)

    @staticmethod
    def identity(shape=(), dtype=jnp.float32) -> "Pose":
        return Pose(
            position=jnp.zeros(tuple(shape) + (3,), dtype=dtype),
            orientation=so3.quat_identity(shape, dtype),
        )
