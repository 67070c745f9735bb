"""IMU preintegration: on-manifold integration, bias Jacobians, covariance.

Capability parity with the reference's ``PreintegratedImuFactor<State>``
(wave_gtsam/include/wave/gtsam/preint_imu_factor.hpp:20,
src/preint_imu_factor.cpp:8-207), which wraps gtsam's
``PreintegratedCombinedMeasurements``: integrate gyro/accel between two
states, then constrain (pose_i, vel_i, bias_i, pose_j, vel_j, bias_j).

TPU-first: preintegration is a single ``lax.scan`` over the IMU window
(quaternion increments, velocity/position accumulation, first-order bias
Jacobians, 9x9 [dtheta, dv, dp] covariance propagation — the standard
on-manifold formulation of Forster et al., "IMU Preintegration on Manifold
for Efficient Visual-Inertial Estimation", RSS 2015). The residual applies
first-order bias corrections via the accumulated Jacobians, exactly as
gtsam's computeErrorAndJacobians consumed by the reference factor.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from libwave_tpu.geometry import so3

from libwave_tpu.utils.precision import f32_matmuls

GRAVITY = (0.0, 0.0, -9.81)  # plain tuple: no backend init at import time


class PreintegratedImu(NamedTuple):
    """Preintegrated deltas between two keyframes + bias sensitivities."""

    dq: jnp.ndarray  # (4,) ΔR as quaternion (body_i <- body_j)
    dv: jnp.ndarray  # (3,)
    dp: jnp.ndarray  # (3,)
    dt_total: jnp.ndarray  # ()
    # first-order bias Jacobians
    J_q_bg: jnp.ndarray  # (3, 3) d log(ΔR) / d bg
    J_v_bg: jnp.ndarray  # (3, 3)
    J_v_ba: jnp.ndarray  # (3, 3)
    J_p_bg: jnp.ndarray  # (3, 3)
    J_p_ba: jnp.ndarray  # (3, 3)
    cov: jnp.ndarray  # (9, 9) [dtheta, dv, dp]
    bg_ref: jnp.ndarray  # (3,) gyro bias used during integration
    ba_ref: jnp.ndarray  # (3,) accel bias used during integration


@f32_matmuls
def preintegrate_imu(
    gyro: jnp.ndarray,  # (N, 3) rad/s
    accel: jnp.ndarray,  # (N, 3) m/s^2 (body frame, includes -gravity)
    dt,  # scalar or (N,) sample periods
    bg: jnp.ndarray,
    ba: jnp.ndarray,
    gyro_noise_density: float = 1.7e-4,
    accel_noise_density: float = 2.0e-3,
) -> PreintegratedImu:
    """Integrate an IMU window under lax.scan."""
    dtype = gyro.dtype
    N = gyro.shape[0]
    dts = jnp.broadcast_to(jnp.asarray(dt, dtype), (N,))
    sg2 = gyro_noise_density**2
    sa2 = accel_noise_density**2

    def step(carry, inputs):
        dq, dv, dp, Jqbg, Jvbg, Jvba, Jpbg, Jpba, P = carry
        w, a, h = inputs
        wc = w - bg
        ac = a - ba
        R = so3.quat_to_rot(dq)
        dR_inc = so3.exp_quat(wc * h)
        Jr = so3.left_jacobian(-wc * h)  # right Jacobian of exp(wc*h)
        Ra = R @ so3.hat(ac)

        new_dp = dp + dv * h + 0.5 * (R @ ac) * h * h
        new_dv = dv + (R @ ac) * h
        new_dq = so3.quat_multiply(dq, dR_inc)

        # bias Jacobians (Forster eq. 69-70 discrete forms)
        Rinc_T = so3.quat_to_rot(dR_inc).T
        new_Jpba = Jpba + Jvba * h - 0.5 * R * h * h
        new_Jpbg = Jpbg + Jvbg * h - 0.5 * Ra @ Jqbg * h * h
        new_Jvba = Jvba - R * h
        new_Jvbg = Jvbg - Ra @ Jqbg * h
        new_Jqbg = Rinc_T @ Jqbg - Jr * h

        # covariance propagation, state [dtheta, dv, dp]
        A = jnp.zeros((9, 9), dtype)
        A = A.at[0:3, 0:3].set(Rinc_T)
        A = A.at[3:6, 0:3].set(-Ra * h)
        A = A.at[3:6, 3:6].set(jnp.eye(3, dtype=dtype))
        A = A.at[6:9, 0:3].set(-0.5 * Ra * h * h)
        A = A.at[6:9, 3:6].set(jnp.eye(3, dtype=dtype) * h)
        A = A.at[6:9, 6:9].set(jnp.eye(3, dtype=dtype))
        B = jnp.zeros((9, 6), dtype)
        B = B.at[0:3, 0:3].set(Jr * h)
        B = B.at[3:6, 3:6].set(R * h)
        B = B.at[6:9, 3:6].set(0.5 * R * h * h)
        Q = jnp.diag(
            jnp.concatenate(
                [jnp.full((3,), sg2 / jnp.maximum(h, 1e-9), dtype),
                 jnp.full((3,), sa2 / jnp.maximum(h, 1e-9), dtype)]
            )
        )
        newP = A @ P @ A.T + B @ Q @ B.T
        return (
            new_dq, new_dv, new_dp,
            new_Jqbg, new_Jvbg, new_Jvba, new_Jpbg, new_Jpba, newP,
        ), None

    z3 = jnp.zeros(3, dtype)
    z33 = jnp.zeros((3, 3), dtype)
    init = (
        so3.quat_identity((), dtype), z3, z3,
        z33, z33, z33, z33, z33, jnp.zeros((9, 9), dtype),
    )
    (dq, dv, dp, Jqbg, Jvbg, Jvba, Jpbg, Jpba, P), _ = jax.lax.scan(
        step, init, (gyro, accel, dts)
    )
    return PreintegratedImu(
        dq=dq, dv=dv, dp=dp, dt_total=jnp.sum(dts),
        J_q_bg=Jqbg, J_v_bg=Jvbg, J_v_ba=Jvba, J_p_bg=Jpbg, J_p_ba=Jpba,
        cov=P + 1e-12 * jnp.eye(9, dtype=dtype),
        bg_ref=bg, ba_ref=ba,
    )


def imu_residual(
    pim: PreintegratedImu,
    q_i, p_i, v_i,  # state i: orientation (4,), position (3,), linear vel (3,)
    q_j, p_j, v_j,
    bg_i, ba_i,  # biases at state i (corrections applied first-order)
    gravity=GRAVITY,
):
    """9-dim preintegration residual [r_R, r_v, r_p] (unwhitened).

    With bias corrections:
      ΔR' = ΔR exp(J_q_bg (bg_i - bg_ref))
      Δv' = Δv + J_v_bg dbg + J_v_ba dba     (and similarly Δp')
      r_R = log(ΔR'⁻¹ R_i⁻¹ R_j)
      r_v = R_i⁻¹ (v_j − v_i − g Δt) − Δv'
      r_p = R_i⁻¹ (p_j − p_i − v_i Δt − ½ g Δt²) − Δp'
    """
    g = jnp.asarray(gravity, p_i.dtype)
    dbg = bg_i - pim.bg_ref
    dba = ba_i - pim.ba_ref
    dt = pim.dt_total

    dq_corr = so3.quat_multiply(pim.dq, so3.exp_quat(pim.J_q_bg @ dbg))
    dv_corr = pim.dv + pim.J_v_bg @ dbg + pim.J_v_ba @ dba
    dp_corr = pim.dp + pim.J_p_bg @ dbg + pim.J_p_ba @ dba

    qi_inv = so3.quat_inverse(q_i)
    r_R = so3.log_quat(
        so3.quat_multiply(
            so3.quat_inverse(dq_corr), so3.quat_multiply(qi_inv, q_j)
        )
    )
    r_v = so3.quat_rotate(qi_inv, v_j - v_i - g * dt) - dv_corr
    r_p = (
        so3.quat_rotate(qi_inv, p_j - p_i - v_i * dt - 0.5 * g * dt * dt)
        - dp_corr
    )
    return jnp.concatenate([r_R, r_v, r_p])


@f32_matmuls
def imu_sqrt_info(pim: PreintegratedImu) -> jnp.ndarray:
    """Whitening matrix: inverse Cholesky factor of the preintegration
    covariance (L^-1 with cov = L L^T), so r_white = sqrt_info @ r."""
    L = jnp.linalg.cholesky(pim.cov)
    eye = jnp.eye(9, dtype=pim.cov.dtype)
    return jax.lax.linalg.triangular_solve(L, eye, left_side=True, lower=True)


def simulate_imu(q_traj, p_traj, v_traj, dt, bg=None, ba=None,
                 gravity=GRAVITY, key=None, gyro_sigma=0.0, accel_sigma=0.0):
    """Generate consistent IMU samples from a smooth trajectory (for tests
    and the synthetic VIO pipeline): body rates from consecutive
    orientations, specific force from acceleration minus gravity."""
    dtype = p_traj.dtype
    T = q_traj.shape[0]
    g = jnp.asarray(gravity, dtype)
    # body angular velocity between samples
    dq = so3.quat_multiply(so3.quat_inverse(q_traj[:-1]), q_traj[1:])
    gyro = so3.log_quat(dq) / dt
    # linear acceleration (world) -> specific force in body frame
    a_world = (v_traj[1:] - v_traj[:-1]) / dt
    f_world = a_world - g
    accel = so3.quat_rotate(so3.quat_inverse(q_traj[:-1]), f_world)
    if bg is not None:
        gyro = gyro + bg
    if ba is not None:
        accel = accel + ba
    if key is not None:
        k1, k2 = jax.random.split(key)
        gyro = gyro + gyro_sigma * jax.random.normal(k1, gyro.shape, dtype)
        accel = accel + accel_sigma * jax.random.normal(k2, accel.shape, dtype)
    return gyro, accel
