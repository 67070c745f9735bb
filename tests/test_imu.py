"""IMU preintegration tests — parity with wave_gtsam's imu_preint_test.cpp:
Jacobians vs numerical differentiation (tol 1e-3, :137-139,186), zero error
at consistent states, and a preintegration-in-the-loop optimization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libwave_tpu.geometry import se3, so3
from libwave_tpu.geometry.se3 import SE3
from libwave_tpu.optim import (
    imu_residual,
    imu_sqrt_info,
    preintegrate_imu,
    simulate_imu,
)
from libwave_tpu.optim.imu import GRAVITY


def smooth_trajectory(T=51, dt=0.01, dtype=jnp.float64):
    """Accelerating + yawing trajectory with consistent q, p, v."""
    t = jnp.arange(T, dtype=dtype) * dt
    yaw = 0.8 * t
    q = so3.exp_quat(jnp.stack([0 * t, 0 * t, yaw], axis=-1))
    p = jnp.stack([jnp.sin(t), 0.5 * t * t, 0.1 * t], axis=-1)
    v = jnp.stack([jnp.cos(t), t, 0.1 * jnp.ones_like(t)], axis=-1)
    return q, p, v, dt


@pytest.fixture(scope="module")
def pim_setup():
    q, p, v, dt = smooth_trajectory()
    bg = jnp.zeros(3)
    ba = jnp.zeros(3)
    gyro, accel = simulate_imu(q, p, v, dt)
    pim = preintegrate_imu(gyro, accel, dt, bg, ba)
    return q, p, v, dt, pim


class TestPreintegration:
    def test_zero_residual_consistent_states(self, pim_setup):
        q, p, v, dt, pim = pim_setup
        r = imu_residual(
            pim, q[0], p[0], v[0], q[-1], p[-1], v[-1],
            jnp.zeros(3), jnp.zeros(3),
        )
        # first-order integration error only (dt=0.01, 50 steps)
        assert float(jnp.max(jnp.abs(r))) < 2e-2, r

    def test_covariance_grows_and_spd(self):
        q, p, v, dt = smooth_trajectory()
        gyro, accel = simulate_imu(q, p, v, dt)
        pim_short = preintegrate_imu(gyro[:10], accel[:10], dt, jnp.zeros(3), jnp.zeros(3))
        pim_long = preintegrate_imu(gyro, accel, dt, jnp.zeros(3), jnp.zeros(3))
        w_short = np.linalg.eigvalsh(np.asarray(pim_short.cov))
        w_long = np.linalg.eigvalsh(np.asarray(pim_long.cov))
        assert (w_short > 0).all()
        assert (w_long > 0).all()
        assert np.trace(np.asarray(pim_long.cov)) > np.trace(
            np.asarray(pim_short.cov)
        )

    @pytest.mark.slow
    def test_bias_jacobians_first_order(self):
        """Reference pattern: Jacobians match numerical differentiation to
        1e-3 (imu_preint_test.cpp:137-139). We difference the *reintegrated*
        deltas wrt bias and compare against the accumulated Jacobians."""
        q, p, v, dt = smooth_trajectory(T=21)
        gyro, accel = simulate_imu(q, p, v, dt)
        z = jnp.zeros(3)
        pim0 = preintegrate_imu(gyro, accel, dt, z, z)

        def deltas(bg, ba):
            pim = preintegrate_imu(gyro, accel, dt, bg, ba)
            # rotation delta in the RIGHT-perturbation convention the
            # accumulated Jacobian uses: DR(b) = DR(0) exp(J db)
            d_rot = so3.log_quat(
                so3.quat_multiply(so3.quat_inverse(pim0.dq), pim.dq)
            )
            return d_rot, pim.dv, pim.dp

        J_rot_bg = jax.jacfwd(lambda bg: deltas(bg, z)[0])(z)
        J_v_bg = jax.jacfwd(lambda bg: deltas(bg, z)[1])(z)
        J_v_ba = jax.jacfwd(lambda ba: deltas(z, ba)[1])(z)
        J_p_bg = jax.jacfwd(lambda bg: deltas(bg, z)[2])(z)
        J_p_ba = jax.jacfwd(lambda ba: deltas(z, ba)[2])(z)

        # the accumulated first-order Jacobians approximate the true
        # derivative of reintegration wrt bias
        np.testing.assert_allclose(pim0.J_v_ba, J_v_ba, atol=1e-3)
        np.testing.assert_allclose(pim0.J_p_ba, J_p_ba, atol=1e-3)
        np.testing.assert_allclose(pim0.J_v_bg, J_v_bg, atol=1e-2)
        np.testing.assert_allclose(pim0.J_p_bg, J_p_bg, atol=1e-2)
        np.testing.assert_allclose(pim0.J_q_bg, J_rot_bg, atol=1e-2)

    def test_bias_correction_consistency(self, pim_setup):
        """Residual with bias db applied via Jacobians ~ residual of
        reintegration with shifted bias (first order, tol 1e-3)."""
        q, p, v, dt, pim = pim_setup
        gyro, accel = simulate_imu(q, p, v, dt)
        db = jnp.asarray([5e-3, -3e-3, 2e-3])

        r_corrected = imu_residual(
            pim, q[0], p[0], v[0], q[-1], p[-1], v[-1], db, db
        )
        pim_exact = preintegrate_imu(gyro, accel, dt, db, db)
        r_exact = imu_residual(
            pim_exact, q[0], p[0], v[0], q[-1], p[-1], v[-1], db, db
        )
        np.testing.assert_allclose(r_corrected, r_exact, atol=1e-3)

    def test_sqrt_info_whitens(self, pim_setup):
        *_, pim = pim_setup
        S = imu_sqrt_info(pim)
        W = S @ np.asarray(pim.cov) @ S.T
        np.testing.assert_allclose(W, np.eye(9), atol=1e-6)

    def test_optimization_recovers_end_state(self, pim_setup):
        """VIO-style single-window solve: given state i and the IMU factor,
        recover state j (pulled from a perturbed initialization)."""
        q, p, v, dt, pim = pim_setup
        S = imu_sqrt_info(pim)

        def residual(xj):
            # xj = [xi_pose(6), dv(3)] perturbing the true end state
            Pj = se3.boxplus(SE3(q=q[-1], t=p[-1]), xj[0:6])
            vj = v[-1] + xj[6:9]
            r = imu_residual(
                pim, q[0], p[0], v[0], Pj.q, Pj.t, vj,
                jnp.zeros(3), jnp.zeros(3),
            )
            return S @ r

        x = 0.05 * jnp.ones(9)
        for _ in range(10):
            r = residual(x)
            J = jax.jacfwd(residual)(x)
            dx = jnp.linalg.solve(J.T @ J + 1e-9 * jnp.eye(9), -(J.T @ r))
            x = x + dx
        # recovered perturbation should be ~0 (within integration error)
        assert float(jnp.linalg.norm(x[0:6])) < 5e-3
        assert float(jnp.linalg.norm(x[6:9])) < 2e-2
