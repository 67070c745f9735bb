"""12-state quadrotor dynamics with cascaded PID control.

Parity with the reference's ``QuadrotorModel`` + ``AttitudeController`` +
``PositionController`` (wave_kinematics/include/wave/kinematics/
quadrotor.hpp:18,41,63; src/quadrotor.cpp):

- Euler-integrated rigid-body dynamics: 321-euler attitude kinematics,
  gyroscopic + rotational-drag torques, thrust mapped through the attitude
  into world-frame acceleration with translational drag and gravity
  (quadrotor.cpp ``QuadrotorModel::update``).
- Motor mixing ``tau = A @ motors`` with the reference's plus-configuration
  allocation matrix (arm length ``l``, drag coefficient ``d``).
- Attitude controller: 3 PIDs (roll/pitch/yaw) + relative thrust scaled to
  ``max_thrust=5``, mixed to 4 motor commands clipped to [0, max_thrust],
  yaw error wrapped to ±180° (quadrotor.cpp AttitudeController::update).
- Position controller: world-frame position error rotated into the body-yaw
  frame, x/y/z PIDs producing [roll, pitch, yaw, thrust] setpoints with ±30°
  roll/pitch limits, thrust base 0.5, "yaw-first" gating when yaw error
  exceeds 2° (quadrotor.cpp PositionController::update).

Redesign notes (TPU-first): everything is a pure step; the reference's
rate-limiting accumulators (attitude at 1 kHz, position at 100 Hz) become
explicit ``steps_per_*`` counters handled with ``where`` masks so a whole
flight simulates as one ``lax.scan``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from libwave_tpu.controls.pid import PIDGains, PIDState, pid_init, pid_update
from libwave_tpu.geometry import euler as euler_mod


class QuadrotorParams(NamedTuple):
    Ix: float = 0.0963
    Iy: float = 0.0963
    Iz: float = 0.1927
    kr: float = 0.1  # rotational drag
    kt: float = 0.2  # translational drag
    l: float = 0.9  # arm length
    d: float = 1.0  # drag torque coefficient
    m: float = 1.0
    g: float = 10.0
    max_thrust: float = 5.0


class QuadrotorState(NamedTuple):
    attitude: jnp.ndarray  # (3,) [roll, pitch, yaw]
    angular_velocity: jnp.ndarray  # (3,) body rates [p, q, r]
    position: jnp.ndarray  # (3,)
    linear_velocity: jnp.ndarray  # (3,)
    # controller internal state
    att_pids: PIDState  # (3,) roll/pitch/yaw
    pos_pids: PIDState  # (3,) x/y/z
    att_dt: jnp.ndarray  # () accumulated time since last attitude update
    pos_dt: jnp.ndarray  # ()
    att_outputs: jnp.ndarray  # (4,) last motor outputs (rate-held)
    pos_outputs: jnp.ndarray  # (4,) last [r, p, y, t] setpoints (rate-held)


ATT_GAINS = PIDGains(k_p=200.0, k_i=0.5, k_d=10.0)  # plain floats: no backend init at import
POS_GAINS_XY = PIDGains(k_p=0.5, k_i=0.0, k_d=0.035)
POS_GAINS_Z = PIDGains(k_p=0.5, k_i=0.0, k_d=0.018)


def quadrotor_init(pose=None, dtype=jnp.float32) -> QuadrotorState:
    z3 = jnp.zeros(3, dtype=dtype)
    att = z3 if pose is None else jnp.asarray(pose[3:6], dtype=dtype)
    pos = z3 if pose is None else jnp.asarray(pose[0:3], dtype=dtype)
    return QuadrotorState(
        attitude=att,
        angular_velocity=z3,
        position=pos,
        linear_velocity=z3,
        att_pids=pid_init((3,), dtype),
        pos_pids=pid_init((3,), dtype),
        att_dt=jnp.zeros((), dtype),
        pos_dt=jnp.zeros((), dtype),
        att_outputs=jnp.zeros(4, dtype),
        pos_outputs=jnp.zeros(4, dtype),
    )


def mixing_matrix(p: QuadrotorParams, dtype=jnp.float32) -> jnp.ndarray:
    """Motor->generalized-force allocation (quadrotor.cpp update A matrix)."""
    return jnp.asarray(
        [
            [1.0, 1.0, 1.0, 1.0],
            [0.0, -p.l, 0.0, p.l],
            [-p.l, 0.0, p.l, 0.0],
            [-p.d, p.d, -p.d, p.d],
        ],
        dtype=dtype,
    )


def quadrotor_dynamics(
    p: QuadrotorParams, s: QuadrotorState, motors: jnp.ndarray, dt
) -> QuadrotorState:
    """Euler-integrate the 12-state rigid body under 4 motor thrusts."""
    ph, th, ps = s.attitude[0], s.attitude[1], s.attitude[2]
    w = s.angular_velocity
    pq, qq, rq = w[0], w[1], w[2]

    tau = mixing_matrix(p, s.attitude.dtype) @ motors
    tauf, taup, tauq, taur = tau[0], tau[1], tau[2], tau[3]

    sph, cph, tth = jnp.sin(ph), jnp.cos(ph), jnp.tan(th)
    att_dot = jnp.stack(
        [
            pq + qq * sph * tth + rq * cph * tth,
            qq * cph - rq * sph,
            (qq * sph + rq * cph) / jnp.cos(th),
        ]
    )
    w_dot = jnp.stack(
        [
            -((p.Iz - p.Iy) / p.Ix) * qq * rq - p.kr * pq / p.Ix + taup / p.Ix,
            -((p.Ix - p.Iz) / p.Iy) * pq * rq - p.kr * qq / p.Iy + tauq / p.Iy,
            -((p.Iy - p.Ix) / p.Iz) * pq * qq - p.kr * rq / p.Iz + taur / p.Iz,
        ]
    )
    v = s.linear_velocity
    thrust_dir = jnp.stack(
        [
            cph * jnp.sin(th) * jnp.cos(ps) + sph * jnp.sin(ps),
            cph * jnp.sin(th) * jnp.sin(ps) - sph * jnp.cos(ps),
            cph * jnp.cos(th),
        ]
    )
    v_dot = -p.kt * v / p.m + thrust_dir * tauf / p.m - jnp.asarray(
        [0.0, 0.0, p.g], dtype=v.dtype
    )

    attitude = s.attitude + att_dot * dt
    attitude = attitude.at[2].set(euler_mod.wrap_to_pi(attitude[2]))
    return s._replace(
        attitude=attitude,
        angular_velocity=w + w_dot * dt,
        position=s.position + v * dt,
        linear_velocity=v + v_dot * dt,
    )


def quadrotor_attitude_control(
    p: QuadrotorParams, s: QuadrotorState, setpoints: jnp.ndarray, dt
):
    """Attitude PID cascade -> 4 motor outputs, rate-limited to 1 kHz.

    ``setpoints`` = [roll, pitch, yaw, relative_thrust in [0,1]].
    Returns (motors, new_state).
    """
    acc = s.att_dt + dt
    ready = acc >= 0.001

    err_yaw = euler_mod.wrap_to_pi(setpoints[2] - s.attitude[2])
    sp = jnp.stack([setpoints[0], setpoints[1], err_yaw])
    actual = jnp.stack([s.attitude[0], s.attitude[1], jnp.zeros_like(err_yaw)])
    out, new_pids = pid_update(ATT_GAINS, s.att_pids, sp, actual, acc)
    r, pch, y = out[0], out[1], out[2]
    t = jnp.clip(p.max_thrust * setpoints[3], 0.0, p.max_thrust)
    motors = jnp.stack([-pch - y + t, -r + y + t, pch - y + t, r + y + t])
    motors = jnp.clip(motors, 0.0, p.max_thrust)

    motors_out = jnp.where(ready, motors, s.att_outputs)
    new_state = s._replace(
        att_pids=jax.tree.map(
            lambda new, old: jnp.where(ready, new, old), new_pids, s.att_pids
        ),
        att_dt=jnp.where(ready, 0.0, acc),
        att_outputs=motors_out,
    )
    return motors_out, new_state


def quadrotor_position_control(
    p: QuadrotorParams, s: QuadrotorState, setpoints: jnp.ndarray, yaw, dt
):
    """Position PID cascade -> [roll, pitch, yaw, thrust] attitude setpoints,
    rate-limited to 100 Hz. ``setpoints`` = world [x, y, z]."""
    acc = s.pos_dt + dt
    ready = acc >= 0.01

    err_world = setpoints - s.position
    # rotate error into the yaw-aligned (body planar) frame; euler2rot(...,123)
    # with yaw only is Rz(yaw)^T (see geometry.euler seq-123 convention).
    cz, sz = jnp.cos(s.attitude[2]), jnp.sin(s.attitude[2])
    err = jnp.stack(
        [
            cz * err_world[0] + sz * err_world[1],
            -sz * err_world[0] + cz * err_world[1],
            err_world[2],
        ]
    )
    out_x, pidx = pid_update(
        POS_GAINS_XY,
        PIDState(s.pos_pids.error_prev[0], s.pos_pids.error_sum[0]),
        err[0], 0.0, dt,
    )
    out_y, pidy = pid_update(
        POS_GAINS_XY,
        PIDState(s.pos_pids.error_prev[1], s.pos_pids.error_sum[1]),
        err[1], 0.0, dt,
    )
    out_z, pidz = pid_update(
        POS_GAINS_Z,
        PIDState(s.pos_pids.error_prev[2], s.pos_pids.error_sum[2]),
        err[2], 0.0, dt,
    )
    max_tilt = jnp.deg2rad(30.0)
    roll = jnp.clip(-out_y, -max_tilt, max_tilt)
    pitch = jnp.clip(out_x, -max_tilt, max_tilt)
    thrust = jnp.clip(0.5 + out_z, 0.0, 1.0)
    # yaw-first gating: level the craft until yaw error is small
    yaw_far = jnp.abs(yaw - s.attitude[2]) > jnp.deg2rad(2.0)
    roll = jnp.where(yaw_far, 0.0, roll)
    pitch = jnp.where(yaw_far, 0.0, pitch)
    outputs = jnp.stack([roll, pitch, jnp.asarray(yaw, roll.dtype), thrust])

    outputs_held = jnp.where(ready, outputs, s.pos_outputs)
    new_pids = PIDState(
        error_prev=jnp.stack([pidx.error_prev, pidy.error_prev, pidz.error_prev]),
        error_sum=jnp.stack([pidx.error_sum, pidy.error_sum, pidz.error_sum]),
    )
    new_state = s._replace(
        pos_pids=jax.tree.map(
            lambda new, old: jnp.where(ready, new, old), new_pids, s.pos_pids
        ),
        pos_dt=jnp.where(ready, 0.0, acc),
        pos_outputs=outputs_held,
    )
    return outputs_held, new_state


def quadrotor_step(
    p: QuadrotorParams, s: QuadrotorState, pos_setpoint: jnp.ndarray, yaw, dt
) -> QuadrotorState:
    """One closed-loop step: position control -> attitude control -> dynamics.
    The full hover/waypoint stack of the reference tests, as a scan step."""
    att_sp, s = quadrotor_position_control(p, s, pos_setpoint, yaw, dt)
    motors, s = quadrotor_attitude_control(p, s, att_sp, dt)
    return quadrotor_dynamics(p, s, motors, dt)
