"""Combined-state factor tests — parity with the reference's wave_gtsam
tests: zero-error at consistent states, hand-coded-Jacobian agreement
(motion_factor_impl), prior pull-to-value optimizations (prior_tests.cpp:
17-60), and the GPS/hand-eye/decaying-bias factor semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libwave_tpu.geometry import se3, so3
from libwave_tpu.geometry.se3 import SE3
from libwave_tpu.optim import (
    PoseVelBiasState,
    PoseVelState,
    bias_prior_residual,
    decaying_bias_residual,
    gps_residual,
    hand_eye_residual,
    motion_residual,
    pose_prior_residual,
    solve_trajectory_gn,
    twist_prior_residual,
)


def rand_se3(rng, n=None):
    shape = () if n is None else (n,)
    q = so3.quat_normalize(jnp.asarray(rng.normal(size=shape + (4,))))
    return SE3(q=q, t=jnp.asarray(rng.normal(size=shape + (3,))))


class TestStates:
    def test_retract_local_roundtrip(self, rng):
        st = PoseVelBiasState.identity(4)
        dx = 0.3 * jnp.asarray(rng.normal(size=(4, 15)))
        st2 = st.retract(dx)
        np.testing.assert_allclose(st.local(st2), dx, atol=1e-9)

    def test_posevel_dim(self, rng):
        st = PoseVelState.identity(3)
        dx = 0.2 * jnp.asarray(rng.normal(size=(3, 12)))
        np.testing.assert_allclose(st.local(st.retract(dx)), dx, atol=1e-9)


class TestMotionFactor:
    def test_zero_residual_constant_velocity(self):
        """A trajectory exactly following constant twist has zero residual."""
        T = 5
        dt = 0.1
        vel = jnp.tile(jnp.asarray([0.0, 0.0, 0.2, 1.0, 0.0, 0.0]), (T, 1))
        poses = [SE3.identity(dtype=jnp.float64)]
        for _ in range(T - 1):
            poses.append(se3.boxplus(poses[-1], vel[0] * dt))
        st = PoseVelBiasState(
            q=jnp.stack([P.q for P in poses]),
            p=jnp.stack([P.t for P in poses]),
            vel=vel,
            bias=jnp.zeros((T, 3)),
        )
        i = jnp.arange(T - 1)
        r = motion_residual(st, i, i + 1, dt)
        np.testing.assert_allclose(r, 0.0, atol=1e-9)

    def test_jacobian_matches_reference_structure(self, rng):
        """The reference's hand-coded H1/H2 (motion_factor_impl.hpp:16-35)
        are identity blocks + dt*I coupling and -I. At consistent states our
        autodiff Jacobian must match."""
        dt = 0.25
        # identity relative pose: the reference's hand-coded identity-block
        # Jacobians (motion_factor_impl.hpp) are exact only here — away from
        # it they are a first-order approximation of the manifold Jacobian.
        vel = jnp.zeros((2, 6), dtype=jnp.float64)
        P0 = SE3.identity(dtype=jnp.float64)
        P1 = se3.boxplus(P0, vel[0] * dt)
        st = PoseVelBiasState(
            q=jnp.stack([P0.q, P1.q]),
            p=jnp.stack([P0.t, P1.t]),
            vel=vel,
            bias=jnp.zeros((2, 3)),
        )

        def res(dx):
            return motion_residual(st.retract(dx.reshape(2, 15)), jnp.asarray([0]), jnp.asarray([1]), dt)

        J = jax.jacfwd(res)(jnp.zeros(30)).reshape(15, 2, 15)
        H1, H2 = J[:, 0, :], J[:, 1, :]
        # H2 = -I (the reference's exact value)
        np.testing.assert_allclose(H2, -jnp.eye(15), atol=1e-6)
        # H1: identity + dt coupling vel->pose rows (reference approximates
        # the pose-block Jacobian by identity; at identity relative pose it
        # is exact)
        expect = jnp.eye(15)
        expect = expect.at[0:6, 6:12].set(dt * jnp.eye(6))
        np.testing.assert_allclose(H1, expect, atol=1e-6)


class TestPriors:
    def test_priors_pull_state(self, rng):
        """prior_tests.cpp pattern: optimize a single state with priors on
        each block; state converges to the prior values."""
        target_pose = rand_se3(np.random.default_rng(1))
        target_vel = jnp.asarray(np.random.default_rng(2).normal(size=6))
        target_bias = jnp.asarray([0.1, -0.2, 0.3])
        st = PoseVelBiasState.identity(1)

        fns = [
            lambda s: pose_prior_residual(s, jnp.asarray([0]), target_pose),
            lambda s: twist_prior_residual(s, jnp.asarray([0]), target_vel),
            lambda s: bias_prior_residual(s, jnp.asarray([0]), target_bias),
        ]
        out, info = solve_trajectory_gn(st, fns, num_iters=15)
        np.testing.assert_allclose(out.p[0], target_pose.t, atol=1e-6)
        np.testing.assert_allclose(
            so3.rotation_distance(out.q[0], target_pose.q), 0.0, atol=1e-6
        )
        np.testing.assert_allclose(out.vel[0], target_vel, atol=1e-6)
        np.testing.assert_allclose(out.bias[0], target_bias, atol=1e-6)


class TestGPSFactor:
    def test_zero_residual_at_measurement(self, rng):
        P = rand_se3(np.random.default_rng(5))
        st = PoseVelBiasState(
            q=P.q[None], p=P.t[None], vel=jnp.zeros((1, 6)),
            bias=jnp.zeros((1, 3)),
        )
        r = gps_residual(st, jnp.asarray([0]), SE3(q=P.q[None], t=P.t[None]))
        np.testing.assert_allclose(r, 0.0, atol=1e-9)

    def test_bias_shifts_translation(self):
        """With identity pose and bias b, residual translation is b
        (LiftedBias composes on the left, gps_factor_with_bias.cpp:22-27)."""
        st = PoseVelBiasState.identity(1)
        st = st._replace(bias=jnp.asarray([[0.5, -0.2, 0.1]]))
        meas = SE3.identity(dtype=jnp.float64)
        r = gps_residual(st, jnp.asarray([0]), SE3(q=meas.q[None], t=meas.t[None]))
        np.testing.assert_allclose(r[0:3], 0.0, atol=1e-12)
        np.testing.assert_allclose(r[3:6], [0.5, -0.2, 0.1], atol=1e-9)

    def test_gps_with_bias_recovery(self):
        """Trajectory + GPS measurements with constant offset + decaying
        bias factors + bias prior: solver recovers poses and bias (the
        factor combination the reference designed these for)."""
        T = 6
        rng = np.random.default_rng(7)
        true_pose = [SE3.identity(dtype=jnp.float64)]
        for _ in range(T - 1):
            true_pose.append(
                se3.boxplus(true_pose[-1], jnp.asarray([0, 0, 0.1, 1.0, 0, 0.0]) * 0.5)
            )
        true_bias = jnp.asarray([0.3, -0.1, 0.0])
        meas = [SE3(q=P.q, t=P.t + true_bias) for P in true_pose]  # biased GPS

        st = PoseVelBiasState(
            q=jnp.stack([P.q for P in true_pose]),
            p=jnp.stack([P.t for P in true_pose]) + 0.1,
            vel=jnp.zeros((T, 6)),
            bias=jnp.zeros((T, 3)),
        )
        idx = [jnp.asarray([i]) for i in range(T)]
        fns = []
        for i in range(T):
            Ti = SE3(q=meas[i].q[None], t=meas[i].t[None])
            fns.append(lambda s, i=i, Ti=Ti: gps_residual(s, idx[i], Ti))
        # tie biases together strongly (tau large => equality-ish)
        for i in range(T - 1):
            fns.append(
                lambda s, i=i: decaying_bias_residual(
                    s, idx[i], idx[i + 1], dt=jnp.asarray([0.5]), tau=1e9,
                    sqrt_info=100.0,
                )
            )
        out, info = solve_trajectory_gn(st, fns, num_iters=25)
        # gauge: pose+bias split is observable only through the biased GPS;
        # with shared bias the solution family is (p + c, bias - c). Check
        # consistency instead: recovered biased measurement must match.
        for i in range(T):
            pred = out.bias[i] + out.p[i]
            np.testing.assert_allclose(pred, meas[i].t, atol=1e-6)


class TestHandEye:
    def test_zero_at_consistent_calibration(self, rng):
        r1 = np.random.default_rng(11)
        T_LOCAL_S1 = rand_se3(r1)
        T_S1_S2 = rand_se3(r1)
        T_LOCAL_S2 = T_LOCAL_S1.compose(T_S1_S2)
        r = hand_eye_residual(
            T_LOCAL_S2, T_S1_S2, jnp.zeros(3), T_LOCAL_S1
        )
        np.testing.assert_allclose(r, 0.0, atol=1e-9)

    def test_bias_detected(self):
        T_LOCAL_S1 = SE3.identity(dtype=jnp.float64)
        T_S1_S2 = SE3.identity(dtype=jnp.float64)
        b = jnp.asarray([0.1, 0.0, 0.0])
        T_LOCAL_S2 = SE3(q=T_S1_S2.q, t=b)  # true relative includes bias
        r = hand_eye_residual(T_LOCAL_S2, T_S1_S2, b, T_LOCAL_S1)
        np.testing.assert_allclose(r, 0.0, atol=1e-9)


class TestDecayingBias:
    def test_exact_decay_zero_residual(self):
        st = PoseVelBiasState.identity(2)
        b0 = jnp.asarray([1.0, -2.0, 0.5])
        tau, dt = 3.0, 0.7
        st = st._replace(
            bias=jnp.stack([b0, b0 * jnp.exp(-dt / tau)])
        )
        r = decaying_bias_residual(
            st, jnp.asarray([0]), jnp.asarray([1]), jnp.asarray([dt]), tau
        )
        np.testing.assert_allclose(r, 0.0, atol=1e-9)
