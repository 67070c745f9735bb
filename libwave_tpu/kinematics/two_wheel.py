"""Two-wheel (unicycle) robot model.

Parity with the reference's ``TwoWheelRobot2DModel`` (wave_kinematics/include/
wave/kinematics/two_wheel.hpp:15, src/two_wheel.cpp:5-11): state
``[x, y, theta]``, input ``[v, omega]``, Euler integration
``pose += [v cos(theta), v sin(theta), omega] * dt``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def two_wheel_step(pose: jnp.ndarray, u: jnp.ndarray, dt) -> jnp.ndarray:
    """One Euler step. pose (..., 3) [x, y, theta]; u (..., 2) [v, omega]."""
    v, omega = u[..., 0], u[..., 1]
    theta = pose[..., 2]
    delta = jnp.stack(
        [v * jnp.cos(theta), v * jnp.sin(theta), omega], axis=-1
    )
    return pose + delta * dt


def simulate_two_wheel(pose0: jnp.ndarray, inputs: jnp.ndarray, dt) -> jnp.ndarray:
    """Roll out T steps under ``lax.scan``; inputs (T, 2) -> poses (T, 3)
    (pose *after* each step, mirroring the reference's update loop)."""

    def step(pose, u):
        new = two_wheel_step(pose, u, dt)
        return new, new

    _, traj = jax.lax.scan(step, pose0, inputs)
    return traj
