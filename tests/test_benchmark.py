"""Trajectory-evaluation tests — parity with wave_benchmark tests
(trajectory_compare_tests.cpp interpolation/error behavior) plus ATE/RPE."""

import jax
import jax.numpy as jnp
import numpy as np

from libwave_tpu.benchmark import (
    Trajectory,
    absolute_trajectory_error,
    interpolate_at,
    relative_pose_error,
    trajectory_error,
    write_error_csv,
)
from libwave_tpu.geometry import so3
from libwave_tpu.geometry.se3 import SE3


def circle_traj(n, radius=5.0, dtype=jnp.float64, yaw_offset=0.0):
    th = jnp.linspace(0, jnp.pi, n, dtype=dtype)
    t = jnp.stack(
        [radius * jnp.cos(th), radius * jnp.sin(th), jnp.zeros_like(th)], axis=-1
    )
    q = so3.exp_quat(
        jnp.stack([jnp.zeros_like(th), jnp.zeros_like(th), th + yaw_offset], axis=-1)
    )
    return Trajectory(times=th, poses=SE3(q=q, t=t))


class TestInterpolation:
    def test_midpoint(self):
        tr = circle_traj(2)
        mid = interpolate_at(tr, jnp.asarray([jnp.pi / 2]))
        # geodesic midpoint of two poses
        expect = jnp.asarray([0.0, 5.0 * jnp.sin(jnp.pi / 4) / jnp.cos(jnp.pi/4) , 0.0])
        # just verify time endpoints exactly and midpoint yaw
        yaw = 2 * jnp.arctan2(mid.q[0, 3], mid.q[0, 0])
        np.testing.assert_allclose(float(yaw), jnp.pi / 2, atol=1e-9)

    def test_exact_sample_times(self):
        tr = circle_traj(10)
        out = interpolate_at(tr, tr.times)
        np.testing.assert_allclose(out.t, tr.poses.t, atol=1e-9)
        np.testing.assert_allclose(out.q, tr.poses.q, atol=1e-9)


class TestErrors:
    def test_zero_error_same_traj(self):
        tr = circle_traj(20)
        te, re = trajectory_error(tr, tr)
        np.testing.assert_allclose(te, 0.0, atol=1e-9)
        np.testing.assert_allclose(re, 0.0, atol=1e-9)

    def test_known_offset(self):
        tr = circle_traj(20)
        shifted = Trajectory(
            times=tr.times,
            poses=SE3(q=tr.poses.q, t=tr.poses.t + jnp.asarray([0.1, 0, 0])),
        )
        te, re = trajectory_error(tr, shifted)
        np.testing.assert_allclose(te[:, 0], 0.1, atol=1e-9)
        np.testing.assert_allclose(re, 0.0, atol=1e-9)

    def test_csv_export(self, tmp_path):
        tr = circle_traj(5)
        te, re = trajectory_error(tr, tr)
        path = str(tmp_path / "err.csv")
        write_error_csv(path, tr.times, te, re)
        data = np.loadtxt(path, delimiter=",")
        assert data.shape == (5, 7)


class TestATE:
    def test_ate_zero(self):
        tr = circle_traj(30)
        ate, _ = absolute_trajectory_error(tr, tr)
        np.testing.assert_allclose(float(ate), 0.0, atol=1e-9)

    def test_ate_alignment_removes_rigid_offset(self):
        """A rigidly-transformed estimate has zero ATE after alignment."""
        tr = circle_traj(30)
        T = SE3(
            q=so3.exp_quat(jnp.asarray([0.0, 0.0, 0.3])),
            t=jnp.asarray([1.0, -2.0, 0.5]),
        )
        moved = Trajectory(
            times=tr.times,
            poses=SE3(
                q=so3.quat_multiply(
                    jnp.broadcast_to(T.q, tr.poses.q.shape), tr.poses.q
                ),
                t=T.apply(tr.poses.t),
            ),
        )
        ate_aligned, _ = absolute_trajectory_error(tr, moved, align=True)
        ate_raw, _ = absolute_trajectory_error(tr, moved, align=False)
        assert float(ate_aligned) < 1e-6
        assert float(ate_raw) > 1.0

    def test_rpe(self):
        tr = circle_traj(30)
        # drifting estimate: add linearly growing offset
        drift = jnp.linspace(0, 1.0, 30)[:, None] * jnp.asarray([1.0, 0, 0])
        est = Trajectory(
            times=tr.times, poses=SE3(q=tr.poses.q, t=tr.poses.t + drift)
        )
        t_rmse, r_rmse, _ = relative_pose_error(tr, est, delta=1)
        assert 0.0 < float(t_rmse) < 0.1  # per-step drift is small
        np.testing.assert_allclose(float(r_rmse), 0.0, atol=1e-9)
