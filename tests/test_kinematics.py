"""Kinematics/controls tests — parity with wave_kinematics tests
(two_wheel_test.cpp, quadrotor_test.cpp, gimbal_test.cpp, pid_test.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from libwave_tpu.controls import PIDGains, pid_init, pid_update
from libwave_tpu.kinematics import (
    GimbalParams,
    QuadrotorParams,
    gimbal_init,
    gimbal_step,
    gimbal_track_target,
    quadrotor_init,
    quadrotor_step,
    simulate_two_wheel,
    two_wheel_step,
)
from libwave_tpu.kinematics.gimbal import gimbal_attitude_control


class TestPID:
    def test_proportional(self):
        g = PIDGains(k_p=jnp.asarray(2.0), k_i=jnp.asarray(0.0), k_d=jnp.asarray(0.0))
        out, st = pid_update(g, pid_init(), 1.0, 0.0, 0.1)
        np.testing.assert_allclose(out, 2.0)

    def test_integral_accumulates(self):
        g = PIDGains(k_p=jnp.asarray(0.0), k_i=jnp.asarray(1.0), k_d=jnp.asarray(0.0))
        st = pid_init()
        out1, st = pid_update(g, st, 1.0, 0.0, 0.5)
        out2, st = pid_update(g, st, 1.0, 0.0, 0.5)
        np.testing.assert_allclose(out1, 0.5)
        np.testing.assert_allclose(out2, 1.0)

    def test_derivative(self):
        g = PIDGains(k_p=jnp.asarray(0.0), k_i=jnp.asarray(0.0), k_d=jnp.asarray(1.0))
        st = pid_init()
        out1, st = pid_update(g, st, 1.0, 0.0, 0.1)
        out2, st = pid_update(g, st, 1.0, 0.0, 0.1)
        np.testing.assert_allclose(out1, 10.0)  # (1 - 0)/0.1
        np.testing.assert_allclose(out2, 0.0)  # error unchanged


class TestTwoWheel:
    def test_straight_line(self):
        pose = jnp.zeros(3)
        for _ in range(100):
            pose = two_wheel_step(pose, jnp.asarray([1.0, 0.0]), 0.01)
        np.testing.assert_allclose(pose, [1.0, 0.0, 0.0], atol=1e-9)

    def test_circle_closes(self):
        """One full revolution on a 0.5 m circle returns near the start
        (the reference's VO trajectory, VoDataset.cpp:219-231)."""
        r, v, dt, steps = 0.5, 1.0, 0.01, 300
        w = v / r
        inputs = jnp.tile(jnp.asarray([v, w]), (steps, 1))
        traj = simulate_two_wheel(jnp.zeros(3), inputs, dt)
        # circumference = pi -> 300 steps of 0.01 at 1 m/s traverses 3.0 m ~
        # 0.955 revolutions; check the heading advanced by w*T
        np.testing.assert_allclose(traj[-1, 2], w * steps * dt, atol=1e-9)
        # all points lie on a circle centred at (0, r) (Euler-integration
        # tolerance ~ v*dt)
        c = jnp.asarray([0.0, r])
        radii = jnp.linalg.norm(traj[:, :2] - c, axis=-1)
        assert float(jnp.max(jnp.abs(radii - r))) < 0.02


class TestQuadrotor:
    def test_hover_thrust_equilibrium(self):
        """With motors at mg/4 each, the craft stays level and still."""
        from libwave_tpu.kinematics.quadrotor import quadrotor_dynamics

        p = QuadrotorParams()
        s = quadrotor_init(dtype=jnp.float64)
        motors = jnp.full(4, p.m * p.g / 4.0, dtype=jnp.float64)
        for _ in range(50):
            s = quadrotor_dynamics(p, s, motors, 0.001)
        np.testing.assert_allclose(s.position, 0.0, atol=1e-9)
        np.testing.assert_allclose(s.attitude, 0.0, atol=1e-9)

    def test_closed_loop_hover_converges(self):
        """Full cascade holds a setpoint: after 6 simulated seconds the craft
        is near the commanded hover point (reference quadrotor_test
        behavior)."""
        p = QuadrotorParams()
        s = quadrotor_init(dtype=jnp.float64)
        target = jnp.asarray([1.0, 0.0, 2.0], dtype=jnp.float64)

        def step(s, _):
            s = quadrotor_step(p, s, target, 0.0, 0.001)
            return s, s.position

        s, hist = jax.lax.scan(step, s, None, length=6000)
        final = hist[-1]
        assert float(jnp.linalg.norm(final - target)) < 0.3, final

    def test_step_jits(self):
        p = QuadrotorParams()
        s = quadrotor_init(dtype=jnp.float64)
        f = jax.jit(lambda s: quadrotor_step(p, s, jnp.zeros(3, jnp.float64), 0.0, 0.001))
        out = f(s)
        assert out.position.shape == (3,)


class TestGimbal:
    def test_tracks_attitude(self):
        """Joint controller drives joints to the commanded attitude."""
        p = GimbalParams()
        s = gimbal_init(dtype=jnp.float64)
        s = s._replace(target_attitude_if=jnp.asarray([0.2, -0.1], dtype=jnp.float64))

        def step(s, _):
            motors, s = gimbal_attitude_control(s, 0.001)
            s = gimbal_step(p, s, motors, 0.001)
            return s, None

        s, _ = jax.lax.scan(step, s, None, length=4000)
        np.testing.assert_allclose(s.states[0], 0.2, atol=0.01)
        np.testing.assert_allclose(s.states[2], -0.1, atol=0.01)

    def test_track_target_boresight(self):
        """The rest boresight of this gimbal is straight down (gimbal.cpp
        trackTarget): a target directly below (camera-frame y, which is down)
        commands zero joint motion."""
        p = GimbalParams()
        s = gimbal_init(dtype=jnp.float64)
        s = gimbal_track_target(p, s, jnp.asarray([0.0, 1.0, 0.0], jnp.float64))
        np.testing.assert_allclose(s.target_attitude_if, [0.0, 0.0], atol=1e-12)

    def test_track_target_ahead_pitches(self):
        """A target ahead of the vehicle (camera z forward) commands a pitch
        toward it with the reference's sign convention
        (pitch = -asin(x_bpf / d))."""
        p = GimbalParams()
        s = gimbal_init(dtype=jnp.float64)
        s = gimbal_track_target(p, s, jnp.asarray([0.0, 1.0, 1.0], jnp.float64))
        np.testing.assert_allclose(
            s.target_attitude_if, [0.0, -np.arcsin(1.0 / np.sqrt(2.0))], atol=1e-12
        )
