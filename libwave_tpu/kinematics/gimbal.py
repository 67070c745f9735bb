"""2-axis gimbal dynamics with PID attitude tracking.

Parity with the reference's ``Gimbal2AxisModel`` / ``Gimbal2AxisController``
(wave_kinematics/include/wave/kinematics/gimbal.hpp:24,66; src/gimbal.cpp):
4-state [roll, roll_vel, pitch, pitch_vel] double-integrator joints, joint
setpoints tracking a world-frame target attitude compensated by the frame
(mount) orientation, and target-in-body-frame geometry for pointing the camera
at a 3D target (gimbal.cpp getTargetInBF/getTargetInBPF/trackTarget).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from libwave_tpu.controls.pid import PIDGains, PIDState, pid_init, pid_update
from libwave_tpu.geometry import euler as euler_mod
from libwave_tpu.geometry import frames, so3


class GimbalParams(NamedTuple):
    Ix: float = 0.01
    camera_offset_rpy: tuple = (0.0, 0.0, 0.0)  # mount rotation (321 euler)
    camera_offset_pos: tuple = (0.0, 0.0, 0.0)


class GimbalState(NamedTuple):
    states: jnp.ndarray  # (4,) [roll, roll_vel, pitch, pitch_vel]
    joint_orientation: jnp.ndarray  # (4,) quaternion of joint angles
    frame_orientation: jnp.ndarray  # (4,) quaternion of mount frame (yaw-free)
    target_attitude_if: jnp.ndarray  # (2,) [roll, pitch] target in inertial
    joint_setpoints: jnp.ndarray  # (2,)
    pids: PIDState  # (2,) roll/pitch joint PIDs
    ctrl_dt: jnp.ndarray  # () accumulated controller time
    ctrl_outputs: jnp.ndarray  # (2,) held outputs


# Chosen for discrete stability at dt = 1 ms: the derivative term acts through
# a one-step delay, so the delayed-damping coefficient k_d/Ix must stay well
# below 1 per step (spectral radius 0.87 here).
JOINT_GAINS = PIDGains(k_p=150.0, k_i=0.0, k_d=2.0)  # plain floats: no backend init at import


def gimbal_init(dtype=jnp.float32) -> GimbalState:
    return GimbalState(
        states=jnp.zeros(4, dtype),
        joint_orientation=so3.quat_identity((), dtype),
        frame_orientation=so3.quat_identity((), dtype),
        target_attitude_if=jnp.zeros(2, dtype),
        joint_setpoints=jnp.zeros(2, dtype),
        pids=pid_init((2,), dtype),
        ctrl_dt=jnp.zeros((), dtype),
        ctrl_outputs=jnp.zeros(2, dtype),
    )


def gimbal_set_frame_orientation(s: GimbalState, q_frame) -> GimbalState:
    """Set mount orientation, discarding yaw (gimbal.cpp setFrameOrientation)."""
    e = euler_mod.quat2euler(q_frame, 321)
    e = e.at[..., 2].set(0.0)
    return s._replace(frame_orientation=euler_mod.euler2quat(e, 321))


def gimbal_step(p: GimbalParams, s: GimbalState, motor_inputs, dt) -> GimbalState:
    """Integrate joint double-integrators and refresh joint orientation +
    setpoints (gimbal.cpp Gimbal2AxisModel::update)."""
    ph, phv, th, thv = s.states[0], s.states[1], s.states[2], s.states[3]
    states = jnp.stack(
        [
            ph + phv * dt,
            phv + motor_inputs[0] / p.Ix * dt,
            th + thv * dt,
            thv + motor_inputs[1] / p.Ix * dt,
        ]
    )
    joint_q = euler_mod.euler2quat(
        jnp.stack([states[0], states[2], jnp.zeros_like(states[0])]), 321
    )
    frame_euler = euler_mod.quat2euler(s.frame_orientation, 321)
    setpoints = s.target_attitude_if - frame_euler[:2]
    return s._replace(
        states=states, joint_orientation=joint_q, joint_setpoints=setpoints
    )


def gimbal_attitude_control(s: GimbalState, dt):
    """Joint PIDs -> motor inputs, rate-limited to 1 kHz
    (gimbal.cpp Gimbal2AxisController::update)."""
    acc = s.ctrl_dt + dt
    ready = acc >= 0.001
    actual = jnp.stack([s.states[0], s.states[2]])
    out, new_pids = pid_update(JOINT_GAINS, s.pids, s.joint_setpoints, actual, dt)
    outputs = jnp.where(ready, out, s.ctrl_outputs)
    import jax

    return outputs, s._replace(
        pids=jax.tree.map(lambda n, o: jnp.where(ready, n, o), new_pids, s.pids),
        ctrl_dt=jnp.where(ready, 0.0, acc),
        ctrl_outputs=outputs,
    )


def target_in_body_frame(p: GimbalParams, target_cf: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame (EDN) target -> gimbal body frame via the mount offset
    (gimbal.cpp getTargetInBF)."""
    # camera frame (x-right, y-down, z-forward) -> NWU
    target_nwu = jnp.stack(
        [target_cf[..., 2], -target_cf[..., 0], -target_cf[..., 1]], axis=-1
    )
    R = euler_mod.euler2rot(jnp.asarray(p.camera_offset_rpy, target_cf.dtype), 321)
    t = jnp.asarray(p.camera_offset_pos, target_cf.dtype)
    return jnp.einsum("ij,...j->...i", R, target_nwu) + t


def gimbal_track_target(p: GimbalParams, s: GimbalState, target_cf) -> GimbalState:
    """Update target attitude so the camera points at a camera-frame target
    (gimbal.cpp trackTarget): transform into the body planar frame, then
    roll = asin(y/d), pitch = -asin(x/d)."""
    tb = target_in_body_frame(p, target_cf)
    R_body = so3.quat_to_rot(s.frame_orientation)
    R_joint = so3.quat_to_rot(s.joint_orientation)
    tbpf = R_body @ (R_joint @ tb)
    dist = jnp.linalg.norm(tbpf)
    target_att = jnp.stack(
        [jnp.arcsin(tbpf[1] / dist), -jnp.arcsin(tbpf[0] / dist)]
    )
    return s._replace(target_attitude_if=target_att)
