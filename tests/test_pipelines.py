"""Pipeline-level tests: pose-graph solve, lidar odometry, two-view geometry.

Mirrors the reference's pipeline coverage: the offline GTSAM examples build
Between/Prior graphs and assert the optimizer pulls a perturbed trajectory
back (gtsam_offline_example.cpp:139-176); the matching tests assert a known
perturbation is recovered from scan pairs (icp_tests.cpp:37-61). Here both
are exercised through the first-class pipelines.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libwave_tpu.geometry import so3
from libwave_tpu.geometry.se3 import SE3
from libwave_tpu.matching.icp import ICPParams
from libwave_tpu.matching.pointcloud import PointCloud, synthetic_scan
from libwave_tpu.optim.pose_graph import (
    BetweenBank,
    PoseGraphConfig,
    PriorBank,
    between_from_trajectory,
    pose_graph_cost,
    solve_pose_graph,
)
from libwave_tpu.pipelines import (
    LidarOdometryConfig,
    lidar_odometry,
    two_frame_pose,
)
from libwave_tpu.vision.epipolar import (
    decompose_essential,
    essential_from_fundamental,
    recover_pose,
    triangulate,
)


def circle_trajectory(n=30, radius=5.0, dtype=jnp.float64):
    theta = jnp.linspace(0, 1.5 * jnp.pi, n).astype(dtype)
    p = jnp.stack(
        [radius * jnp.cos(theta), radius * jnp.sin(theta),
         jnp.zeros_like(theta)], -1
    )
    yaw = theta + jnp.pi / 2
    omega = jnp.stack([jnp.zeros_like(yaw), jnp.zeros_like(yaw), yaw], -1)
    q = so3.exp_quat(omega)
    return q, p


class TestPoseGraphSolve:
    def test_perturbed_trajectory_recovers(self):
        q, p = circle_trajectory()
        bank = between_from_trajectory(q, p, 0.01, 0.05)
        prior = PriorBank(
            i=jnp.zeros((1,), jnp.int32), q=q[:1], p=p[:1],
            sqrt_info=jnp.full((1, 6), 1e3, dtype=p.dtype),
        )
        key = jax.random.key(3)
        k1, k2 = jax.random.split(key)
        q0 = so3.quat_boxplus(q, 0.05 * jax.random.normal(k1, p.shape, p.dtype))
        p0 = p + 0.3 * jax.random.normal(k2, p.shape, p.dtype)
        c0 = pose_graph_cost(q0, p0, bank, prior)
        qf, pf, info = jax.jit(
            lambda q0, p0: solve_pose_graph(q0, p0, bank, prior)
        )(q0, p0)
        assert float(info["final_cost"]) < 1e-6 * float(c0)
        # recovered trajectory matches ground truth (gauge fixed by prior)
        assert float(jnp.max(jnp.linalg.norm(pf - p, axis=-1))) < 1e-3
        rot_err = jnp.linalg.norm(so3.quat_boxminus(qf, q), axis=-1)
        assert float(jnp.max(rot_err)) < 1e-3

    def test_free_mask_fixes_poses(self):
        q, p = circle_trajectory(n=10)
        bank = between_from_trajectory(q, p, 0.01, 0.05)
        free = jnp.ones((10,), p.dtype).at[0].set(0.0).at[1].set(0.0)
        p0 = p + 0.1
        qf, pf, _ = solve_pose_graph(q, p0, bank, free=free,
                                     cfg=PoseGraphConfig(max_iterations=5))
        np.testing.assert_allclose(np.asarray(pf[:2]), np.asarray(p0[:2]))


def make_scan_sequence(T=4, n=512, step=0.08, yaw_step=0.02):
    """World cloud observed from a moving sensor: scan_t = T_t^{-1} * world."""
    world = synthetic_scan(jax.random.key(0), n=n, dtype=jnp.float64)
    poses = []
    scans_pts, scans_mask = [], []
    for t in range(T):
        omega = jnp.asarray([0.0, 0.0, yaw_step * t], jnp.float64)
        pose = SE3(
            q=so3.exp_quat(omega),
            t=jnp.asarray([step * t, -0.5 * step * t, 0.0], jnp.float64),
        )
        poses.append(pose)
        local = pose.inverse().apply(world.points)
        scans_pts.append(local)
        scans_mask.append(world.mask)
    scans = PointCloud(
        points=jnp.stack(scans_pts), mask=jnp.stack(scans_mask)
    )
    return scans, poses


class TestLidarOdometry:
    def test_recovers_trajectory(self):
        scans, poses = make_scan_sequence()
        cfg = LidarOdometryConfig(
            icp=ICPParams(res=0, multiscale_steps=0, max_corr=1.0,
                          max_iter=40),
        )
        res = lidar_odometry(scans, cfg)
        assert bool(jnp.all(res.converged))
        for t, pose in enumerate(poses):
            err_t = float(jnp.linalg.norm(res.trajectory.t[t] - pose.t))
            assert err_t < 0.05, (t, err_t)
        # relative transforms match ground-truth deltas
        d01 = poses[0].inverse().compose(poses[1])
        np.testing.assert_allclose(
            np.asarray(res.relative.t[0]), np.asarray(d01.t), atol=0.03
        )

    def test_information_shape_and_spd(self):
        scans, _ = make_scan_sequence(T=3)
        cfg = LidarOdometryConfig(
            icp=ICPParams(res=0, multiscale_steps=0, max_corr=1.0,
                          max_iter=30),
        )
        res = lidar_odometry(scans, cfg)
        assert res.information.shape == (2, 6, 6)
        eig = np.linalg.eigvalsh(np.asarray(res.information))
        assert np.all(eig > -1e-6)

    def test_pose_graph_refinement_runs(self):
        scans, poses = make_scan_sequence(T=4)
        cfg = LidarOdometryConfig(
            icp=ICPParams(res=0, multiscale_steps=0, max_corr=1.0,
                          max_iter=40),
            refine_pose_graph=True,
            pose_graph=PoseGraphConfig(max_iterations=3, cg_max_iters=30),
        )
        res = lidar_odometry(scans, cfg)
        err = float(jnp.linalg.norm(res.trajectory.t[-1] - poses[-1].t))
        assert err < 0.05


def synthetic_two_view(n=64, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    X1 = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
         rng.uniform(4, 10, n)], -1
    )  # in camera-1 frame, in front
    omega = np.asarray([0.02, -0.04, 0.03])
    R = np.asarray(so3.quat_to_rot(so3.exp_quat(jnp.asarray(omega, dtype))))
    t = np.asarray([0.4, 0.1, -0.05])
    t = t / np.linalg.norm(t)
    X2 = X1 @ R.T + t
    K = np.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    p1 = (X1 / X1[:, 2:]) @ K.T
    p2 = (X2 / X2[:, 2:]) @ K.T
    return (jnp.asarray(p1[:, :2], dtype), jnp.asarray(p2[:, :2], dtype),
            jnp.asarray(K, dtype), jnp.asarray(R, dtype),
            jnp.asarray(t, dtype))


class TestEpipolar:
    def test_recover_pose_exact(self):
        from libwave_tpu.vision.matcher import find_fundamental_ransac

        p1, p2, K, R, t = synthetic_two_view()
        valid = jnp.ones(p1.shape[0], bool)
        F, inl = find_fundamental_ransac(p1, p2, valid, jax.random.key(0),
                                         reproj_px=1.0)
        assert int(jnp.sum(inl)) > 50
        E = essential_from_fundamental(F, K)
        T21, cheir, votes = recover_pose(E, p1, p2, K, inl)
        assert int(jnp.sum(cheir)) > 50
        np.testing.assert_allclose(
            np.asarray(T21.rotation()), np.asarray(R), atol=5e-3
        )
        # translation up to scale (unit norm both sides)
        np.testing.assert_allclose(np.asarray(T21.t), np.asarray(t),
                                   atol=5e-3)

    def test_decompose_essential_candidates(self):
        p1, p2, K, R, t = synthetic_two_view()
        tx = jnp.asarray(
            [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]],
            t.dtype,
        )
        E = tx @ R
        Rs, ts = decompose_essential(E)
        dets = np.linalg.det(np.asarray(Rs))
        np.testing.assert_allclose(dets, 1.0, atol=1e-8)
        # one candidate matches (R, t) up to sign conventions
        errs = [
            float(jnp.linalg.norm(Rs[i] - R) + jnp.linalg.norm(ts[i] - t))
            for i in range(4)
        ]
        assert min(errs) < 1e-6

    def test_triangulate_depths(self):
        p1, p2, K, R, t = synthetic_two_view(n=16)
        Kinv = jnp.linalg.inv(K)
        ones = jnp.ones((16, 1), p1.dtype)
        x1 = (jnp.concatenate([p1, ones], -1) @ Kinv.T)[:, :2]
        x2 = (jnp.concatenate([p2, ones], -1) @ Kinv.T)[:, :2]
        X, z1, z2 = triangulate(R, t, x1, x2)
        assert bool(jnp.all(z1 > 0)) and bool(jnp.all(z2 > 0))


@pytest.mark.slow
class TestTwoFramePipeline:
    def test_runs_on_textured_pair(self):
        from libwave_tpu.vision.detector import FASTParams
        from libwave_tpu.pipelines import VOFrontendConfig

        rng = np.random.default_rng(1)
        base = rng.uniform(0, 255, (96, 128)).astype(np.float32)
        # box-blur so FAST corners are sparse and BRISK sampling is stable
        img = base.copy()
        for ax in (0, 1):
            img = (np.roll(img, 1, ax) + img + np.roll(img, -1, ax)) / 3.0
        img1 = jnp.asarray(img)
        img2 = jnp.asarray(np.roll(img, shift=(2, 3), axis=(0, 1)))
        K = jnp.asarray([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]],
                        jnp.float32)
        cfg = VOFrontendConfig(fast=FASTParams(num_features=128))
        res = two_frame_pose(img1, img2, K, jax.random.key(0), cfg)
        assert int(res.diagnostics["num_good_matches"]) > 20
        assert np.all(np.isfinite(np.asarray(res.T_21.t)))


class TestPipelinedOverlap:
    """Front-end/back-end software pipeline (PP analog): identical results
    to the serial schedule, stages on distinct devices."""

    def test_matches_serial_across_devices(self):
        from libwave_tpu.pipelines import pipelined_windows, serial_windows
        from libwave_tpu.vision import FASTParams, detect_fast

        rng = np.random.default_rng(5)
        frames = [
            jnp.asarray(rng.uniform(0, 255, (64, 96)).astype(np.float32))
            for _ in range(4)
        ]
        fast_p = FASTParams(num_features=32)
        frontend = jax.jit(lambda img: detect_fast(img, fast_p))
        backend = jax.jit(
            lambda feats: jnp.sum(feats[1] * feats[2])  # score mass
        )
        d0, d1 = jax.devices()[0], jax.devices()[1]
        piped = pipelined_windows(
            frontend, backend, frames, frontend_device=d0, backend_device=d1
        )
        serial = serial_windows(frontend, backend, frames)
        for a, b in zip(piped, serial):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # back-end results actually live on the second device
        assert list(piped[0].devices())[0] == d1
