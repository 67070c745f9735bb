"""Combined manifold states over trajectories.

Capability parity with the reference's wave_gtsam state types and their
gtsam manifold traits (block Retract/Local by stacking sub-tangents):

- ``PoseVel``        {Pose3, 6d twist},               dim 12
  (wave_gtsam/include/wave/gtsam/pose_vel.hpp:24,69)
- ``PoseVelBias``    + 3d translational (GPS) bias,   dim 15, offsets
  pose=0 / vel=6 / bias=12 (pose_vel_bias.hpp:26,37,77)
- ``PoseVelAccBias`` + 6d acceleration state,         dim 21
  (pose_vel_acc_bias.hpp:27,83)

TPU-first: a "state" here is the whole trajectory as a pytree of stacked
arrays (q (T,4), p (T,3), vel (T,6), ...); retract/local operate on (T, D)
tangent blocks at once. The pose block uses the SE(3) exponential retraction
(gtsam Pose3::Retract), twist order [omega, v].
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from libwave_tpu.geometry import se3, so3
from libwave_tpu.geometry.se3 import SE3


class PoseVelState(NamedTuple):
    """dim 12 per step: [pose(6), vel(6)]."""

    q: jnp.ndarray  # (T, 4)
    p: jnp.ndarray  # (T, 3)
    vel: jnp.ndarray  # (T, 6) angular then linear (pose_vel.hpp comment)

    DIM = 12

    @staticmethod
    def identity(T: int, dtype=jnp.float64) -> "PoseVelState":
        return PoseVelState(
            q=so3.quat_identity((T,), dtype),
            p=jnp.zeros((T, 3), dtype),
            vel=jnp.zeros((T, 6), dtype),
        )

    def pose(self) -> SE3:
        return SE3(q=self.q, t=self.p)

    def retract(self, dx: jnp.ndarray) -> "PoseVelState":
        """dx (T, 12): [xi_pose(6), dvel(6)]."""
        new_pose = se3.boxplus(self.pose(), dx[:, 0:6])
        return PoseVelState(
            q=new_pose.q, p=new_pose.t, vel=self.vel + dx[:, 6:12]
        )

    def local(self, other: "PoseVelState") -> jnp.ndarray:
        """Tangent taking self to other (gtsam Local(origin=self, other))."""
        xi = se3.boxminus(other.pose(), self.pose())
        return jnp.concatenate([xi, other.vel - self.vel], axis=-1)


class PoseVelBiasState(NamedTuple):
    """dim 15 per step: [pose(6), vel(6), bias(3)]."""

    q: jnp.ndarray
    p: jnp.ndarray
    vel: jnp.ndarray
    bias: jnp.ndarray  # (T, 3) translational (GPS) bias

    DIM = 15

    @staticmethod
    def identity(T: int, dtype=jnp.float64) -> "PoseVelBiasState":
        return PoseVelBiasState(
            q=so3.quat_identity((T,), dtype),
            p=jnp.zeros((T, 3), dtype),
            vel=jnp.zeros((T, 6), dtype),
            bias=jnp.zeros((T, 3), dtype),
        )

    def pose(self) -> SE3:
        return SE3(q=self.q, t=self.p)

    def retract(self, dx: jnp.ndarray) -> "PoseVelBiasState":
        new_pose = se3.boxplus(self.pose(), dx[:, 0:6])
        return PoseVelBiasState(
            q=new_pose.q,
            p=new_pose.t,
            vel=self.vel + dx[:, 6:12],
            bias=self.bias + dx[:, 12:15],
        )

    def local(self, other: "PoseVelBiasState") -> jnp.ndarray:
        xi = se3.boxminus(other.pose(), self.pose())
        return jnp.concatenate(
            [xi, other.vel - self.vel, other.bias - self.bias], axis=-1
        )


class PoseVelAccBiasState(NamedTuple):
    """dim 21 per step: [pose(6), vel(6), accel(6), bias(3)]
    (pose_vel_acc_bias.hpp layout)."""

    q: jnp.ndarray
    p: jnp.ndarray
    vel: jnp.ndarray
    accel: jnp.ndarray  # (T, 6)
    bias: jnp.ndarray  # (T, 3)

    DIM = 21

    @staticmethod
    def identity(T: int, dtype=jnp.float64) -> "PoseVelAccBiasState":
        return PoseVelAccBiasState(
            q=so3.quat_identity((T,), dtype),
            p=jnp.zeros((T, 3), dtype),
            vel=jnp.zeros((T, 6), dtype),
            accel=jnp.zeros((T, 6), dtype),
            bias=jnp.zeros((T, 3), dtype),
        )

    def pose(self) -> SE3:
        return SE3(q=self.q, t=self.p)

    def retract(self, dx: jnp.ndarray) -> "PoseVelAccBiasState":
        new_pose = se3.boxplus(self.pose(), dx[:, 0:6])
        return PoseVelAccBiasState(
            q=new_pose.q,
            p=new_pose.t,
            vel=self.vel + dx[:, 6:12],
            accel=self.accel + dx[:, 12:18],
            bias=self.bias + dx[:, 18:21],
        )

    def local(self, other: "PoseVelAccBiasState") -> jnp.ndarray:
        xi = se3.boxminus(other.pose(), self.pose())
        return jnp.concatenate(
            [
                xi,
                other.vel - self.vel,
                other.accel - self.accel,
                other.bias - self.bias,
            ],
            axis=-1,
        )
