"""Golden-value tests for the Lie/rotation layer.

Replaces the reference's math tests (wave_utils/tests/utils/math_test.cpp) and
MATLAB-oracle pose-covariance tests (wave_utils/tests/utils/
test_pose_cov_comp.cpp + matlab_scripts/) with jax.jacobian numerical oracles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libwave_tpu.geometry import euler, frames, pose_cov, se3, so3
from libwave_tpu.geometry.se3 import SE3


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q[q[:, 0] < 0] *= -1
    return jnp.asarray(q)


def random_se3(rng, n):
    return SE3(q=random_quats(rng, n), t=jnp.asarray(rng.normal(size=(n, 3))))


class TestSO3:
    def test_hat_vee_roundtrip(self, rng):
        phi = jnp.asarray(rng.normal(size=(10, 3)))
        np.testing.assert_allclose(so3.vee(so3.hat(phi)), phi)

    def test_hat_is_cross_product(self, rng):
        a = jnp.asarray(rng.normal(size=(5, 3)))
        b = jnp.asarray(rng.normal(size=(5, 3)))
        np.testing.assert_allclose(
            jnp.einsum("nij,nj->ni", so3.hat(a), b), jnp.cross(a, b), atol=1e-12
        )

    def test_quat_multiply_matches_rotmat(self, rng):
        qa, qb = random_quats(rng, 8), random_quats(rng, 8)
        Rab = so3.quat_to_rot(so3.quat_multiply(qa, qb))
        np.testing.assert_allclose(
            Rab, so3.quat_to_rot(qa) @ so3.quat_to_rot(qb), atol=1e-12
        )

    def test_quat_rotate_matches_matrix(self, rng):
        q = random_quats(rng, 8)
        v = jnp.asarray(rng.normal(size=(8, 3)))
        np.testing.assert_allclose(
            so3.quat_rotate(q, v),
            jnp.einsum("nij,nj->ni", so3.quat_to_rot(q), v),
            atol=1e-12,
        )

    def test_rot_quat_roundtrip(self, rng):
        q = random_quats(rng, 64)
        np.testing.assert_allclose(so3.rot_to_quat(so3.quat_to_rot(q)), q, atol=1e-9)

    def test_rot_to_quat_near_pi(self):
        # Worst case for naive extraction: rotations by ~pi about odd axes.
        for axis in ([1, 0, 0], [0, 1, 0], [0, 0, 1], [0.6, 0.8, 0.0]):
            phi = jnp.asarray(axis, dtype=jnp.float64) * (np.pi - 1e-7)
            R = so3.exp(phi)
            q = so3.rot_to_quat(R)
            np.testing.assert_allclose(so3.quat_to_rot(q), R, atol=1e-8)

    def test_exp_log_roundtrip(self, rng):
        phi = jnp.asarray(rng.normal(size=(64, 3)))
        phi = phi / np.linalg.norm(phi, axis=-1, keepdims=True)
        phi = phi * jnp.linspace(1e-10, np.pi - 1e-3, 64)[:, None]
        np.testing.assert_allclose(so3.log(so3.exp(phi)), phi, atol=1e-7)
        np.testing.assert_allclose(so3.log_quat(so3.exp_quat(phi)), phi, atol=1e-7)

    def test_exp_matches_exp_quat(self, rng):
        phi = jnp.asarray(rng.normal(size=(16, 3)))
        np.testing.assert_allclose(
            so3.exp(phi), so3.quat_to_rot(so3.exp_quat(phi)), atol=1e-12
        )

    def test_exp_small_angle_grad_finite(self):
        g = jax.jacobian(lambda p: so3.exp(p))(jnp.zeros(3))
        assert np.all(np.isfinite(g))
        g2 = jax.jacobian(lambda p: so3.exp_quat(p))(jnp.zeros(3))
        assert np.all(np.isfinite(g2))

    def test_left_jacobian_numerical(self, rng):
        # J_l(phi) satisfies exp(phi + d) ~ exp(J_l d) exp(phi):
        # d log(exp(phi+d) exp(phi)^-1)/dd at d=0 == J_l.
        phi = jnp.asarray(rng.normal(size=3))

        def f(d):
            return so3.log(so3.exp(phi + d) @ so3.exp(phi).T)

        J_num = jax.jacobian(f)(jnp.zeros(3))
        np.testing.assert_allclose(J_num, so3.left_jacobian(phi), atol=1e-6)

    def test_left_jacobian_inverse(self, rng):
        phi = jnp.asarray(rng.normal(size=(8, 3)))
        JJinv = so3.left_jacobian(phi) @ so3.left_jacobian_inverse(phi)
        np.testing.assert_allclose(
            JJinv, jnp.broadcast_to(jnp.eye(3), (8, 3, 3)), atol=1e-9
        )

    def test_boxplus_boxminus(self, rng):
        q = random_quats(rng, 8)
        phi = 0.3 * jnp.asarray(rng.normal(size=(8, 3)))
        np.testing.assert_allclose(
            so3.quat_boxminus(so3.quat_boxplus(q, phi), q), phi, atol=1e-9
        )


class TestEuler:
    def test_euler2rot_vs_quat(self, rng):
        e = jnp.asarray(rng.uniform(-1.2, 1.2, size=(16, 3)))
        for seq in (321, 123):
            np.testing.assert_allclose(
                euler.euler2rot(e, seq),
                so3.quat_to_rot(euler.euler2quat(e, seq)),
                atol=1e-12,
            )

    def test_quat2euler_roundtrip(self, rng):
        e = jnp.asarray(rng.uniform(-1.2, 1.2, size=(16, 3)))
        for seq in (321, 123):
            np.testing.assert_allclose(
                euler.quat2euler(euler.euler2quat(e, seq), seq), e, atol=1e-9
            )

    def test_seq123_is_transpose_of_seq321(self, rng):
        e = jnp.asarray(rng.uniform(-1.2, 1.2, size=(4, 3)))
        np.testing.assert_allclose(
            euler.euler2rot(e, 123),
            jnp.swapaxes(euler.euler2rot(e, 321), -1, -2),
            atol=1e-12,
        )

    def test_yaw_only(self):
        # 321 with yaw psi only == Rz(psi)
        e = jnp.asarray([0.0, 0.0, 0.7])
        R = euler.euler2rot(e, 321)
        c, s = np.cos(0.7), np.sin(0.7)
        np.testing.assert_allclose(R, [[c, -s, 0], [s, c, 0], [0, 0, 1]], atol=1e-12)

    def test_wrap(self):
        np.testing.assert_allclose(euler.wrap_to_pi(jnp.asarray(3 * np.pi)), np.pi)
        np.testing.assert_allclose(
            euler.wrap_to_pi(jnp.asarray(-0.5)), -0.5, atol=1e-12
        )
        np.testing.assert_allclose(
            euler.wrap_to_two_pi(jnp.asarray(-0.5)), 2 * np.pi - 0.5
        )
        np.testing.assert_allclose(euler.wrap_to_180(jnp.asarray(270.0)), -90.0)
        np.testing.assert_allclose(euler.wrap_to_360(jnp.asarray(-90.0)), 270.0)

    def test_deg_rad(self):
        np.testing.assert_allclose(euler.deg2rad(180.0), np.pi)
        np.testing.assert_allclose(euler.rad2deg(np.pi / 2), 90.0)


class TestFrames:
    def test_enu_nwu_roundtrip(self, rng):
        v = jnp.asarray(rng.normal(size=(6, 3)))
        np.testing.assert_allclose(frames.nwu2enu(frames.enu2nwu(v)), v)

    def test_ned2enu_involution(self, rng):
        v = jnp.asarray(rng.normal(size=(6, 3)))
        np.testing.assert_allclose(frames.ned2enu(frames.ned2enu(v)), v)

    def test_axes(self):
        # east in ENU is right(-y) in NWU
        np.testing.assert_allclose(
            frames.enu2nwu(jnp.asarray([1.0, 0, 0])), [0, -1, 0]
        )
        # NWU forward is EDN z (camera looks forward)
        np.testing.assert_allclose(
            frames.nwu2edn(jnp.asarray([1.0, 0, 0])), [0, 0, 1]
        )


class TestSE3:
    def test_compose_matches_matrix(self, rng):
        Ta, Tb = random_se3(rng, 8), random_se3(rng, 8)
        np.testing.assert_allclose(
            Ta.compose(Tb).matrix(), Ta.matrix() @ Tb.matrix(), atol=1e-12
        )

    def test_inverse(self, rng):
        T = random_se3(rng, 8)
        I = T.compose(T.inverse()).matrix()
        np.testing.assert_allclose(
            I, jnp.broadcast_to(jnp.eye(4), (8, 4, 4)), atol=1e-12
        )

    def test_apply_matches_matrix(self, rng):
        T = random_se3(rng, 8)
        x = jnp.asarray(rng.normal(size=(8, 3)))
        xh = jnp.concatenate([x, jnp.ones((8, 1))], axis=-1)
        np.testing.assert_allclose(
            T.apply(x), jnp.einsum("nij,nj->ni", T.matrix(), xh)[:, :3], atol=1e-12
        )

    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=(32, 6)))
        # rotation part must stay below pi for log to invert exp
        omega = xi[:, :3]
        scale = jnp.minimum(1.0, 2.8 / jnp.linalg.norm(omega, axis=-1, keepdims=True))
        xi = jnp.concatenate([omega * scale, xi[:, 3:]], axis=-1)
        np.testing.assert_allclose(se3.log(se3.exp(xi)), xi, atol=1e-7)

    def test_boxplus_boxminus(self, rng):
        T = random_se3(rng, 8)
        xi = 0.4 * jnp.asarray(rng.normal(size=(8, 6)))
        np.testing.assert_allclose(
            se3.boxminus(se3.boxplus(T, xi), T), xi, atol=1e-9
        )

    def test_adjoint_identity(self, rng):
        # T exp(xi) T^-1 == exp(Ad_T xi)
        T = random_se3(rng, 4)
        xi = 0.3 * jnp.asarray(rng.normal(size=(4, 6)))
        lhs = T.compose(se3.exp(xi)).compose(T.inverse()).matrix()
        rhs = se3.exp(jnp.einsum("nij,nj->ni", se3.adjoint(T), xi)).matrix()
        np.testing.assert_allclose(lhs, rhs, atol=1e-9)

    def test_interpolate_endpoints(self, rng):
        Ta, Tb = random_se3(rng, 4), random_se3(rng, 4)
        T0 = se3.interpolate(Ta, Tb, jnp.zeros(4))
        T1 = se3.interpolate(Ta, Tb, jnp.ones(4))
        np.testing.assert_allclose(T0.matrix(), Ta.matrix(), atol=1e-9)
        np.testing.assert_allclose(T1.matrix(), Tb.matrix(), atol=1e-9)

    def test_from_matrix_roundtrip(self, rng):
        T = random_se3(rng, 8)
        T2 = SE3.from_matrix(T.matrix())
        np.testing.assert_allclose(T2.matrix(), T.matrix(), atol=1e-9)


class TestPoseCov:
    def test_compose_jacobian_matches_autodiff(self, rng):
        """The closed-form adjoint covariance propagation must match the
        jacobian of the composition map wrt right-perturbations (the jax
        replacement for the reference's MATLAB oracle)."""
        T1, T2 = random_se3(rng, 1), random_se3(rng, 1)
        T1 = SE3(q=T1.q[0], t=T1.t[0])
        T2 = SE3(q=T2.q[0], t=T2.t[0])

        def compose_perturbed(e1, e2):
            Ta = se3.boxplus(T1, e1)
            Tb = se3.boxplus(T2, e2)
            return se3.boxminus(Ta.compose(Tb), T1.compose(T2))

        J1 = jax.jacobian(compose_perturbed, argnums=0)(jnp.zeros(6), jnp.zeros(6))
        J2 = jax.jacobian(compose_perturbed, argnums=1)(jnp.zeros(6), jnp.zeros(6))
        np.testing.assert_allclose(J1, se3.adjoint(T2.inverse()), atol=1e-6)
        np.testing.assert_allclose(J2, jnp.eye(6), atol=1e-6)

    def test_compose_cov_propagation(self, rng):
        T1, T2 = random_se3(rng, 3), random_se3(rng, 3)
        A = jnp.asarray(rng.normal(size=(3, 6, 6)))
        B = jnp.asarray(rng.normal(size=(3, 6, 6)))
        S1 = 0.01 * A @ jnp.swapaxes(A, -1, -2)
        S2 = 0.01 * B @ jnp.swapaxes(B, -1, -2)
        out = pose_cov.compose_pose_with_covariance(
            pose_cov.PoseWithCovariance(T1, S1), pose_cov.PoseWithCovariance(T2, S2)
        )
        Ad = se3.adjoint(T2.inverse())
        np.testing.assert_allclose(
            out.cov, Ad @ S1 @ jnp.swapaxes(Ad, -1, -2) + S2, atol=1e-12
        )
        # covariance stays symmetric PSD
        w = np.linalg.eigvalsh(np.asarray(out.cov))
        assert (w > -1e-10).all()

    def test_monte_carlo(self, rng):
        """Sampled composition statistics match the propagated covariance."""
        T1 = SE3(q=random_quats(rng, 1)[0], t=jnp.asarray(rng.normal(size=3)))
        T2 = SE3(q=random_quats(rng, 1)[0], t=jnp.asarray(rng.normal(size=3)))
        s1, s2 = 0.02, 0.015
        S1 = s1**2 * jnp.eye(6)
        S2 = s2**2 * jnp.eye(6)
        out = pose_cov.compose_pose_with_covariance(
            pose_cov.PoseWithCovariance(T1, S1), pose_cov.PoseWithCovariance(T2, S2)
        )
        n = 20000
        e1 = jnp.asarray(rng.normal(size=(n, 6))) * s1
        e2 = jnp.asarray(rng.normal(size=(n, 6))) * s2
        Ts = se3.boxplus(T1, e1).compose(se3.boxplus(T2, e2))
        errs = se3.boxminus(Ts, out.pose)
        emp = jnp.einsum("ni,nj->ij", errs, errs) / n
        np.testing.assert_allclose(emp, out.cov, atol=3e-4)

    def test_transform_point_cov(self, rng):
        T = SE3(q=random_quats(rng, 1)[0], t=jnp.asarray(rng.normal(size=3)))
        x = jnp.asarray(rng.normal(size=3))
        S = 0.01 * jnp.eye(6)
        p = pose_cov.PoseWithCovariance(T, S)
        y, ycov = pose_cov.transform_point_with_covariance(p, x)

        def f(e):
            return se3.boxplus(T, e).apply(x)

        J = jax.jacobian(f)(jnp.zeros(6))
        np.testing.assert_allclose(ycov, J @ S @ J.T, atol=1e-9)


class TestJit:
    def test_geometry_jits(self, rng):
        T = random_se3(rng, 16)
        f = jax.jit(lambda T, xi: se3.boxplus(T, xi).matrix())
        out = f(T, 0.1 * jnp.asarray(rng.normal(size=(16, 6))))
        assert out.shape == (16, 4, 4)

    def test_vmap_compose(self, rng):
        Ta, Tb = random_se3(rng, 16), random_se3(rng, 16)
        single = lambda a, b: a.compose(b)
        out = jax.vmap(single)(Ta, Tb)
        np.testing.assert_allclose(out.matrix(), Ta.compose(Tb).matrix(), atol=1e-12)
