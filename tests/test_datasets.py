"""Dataset loader tests on miniature synthetic datasets written in the real
EuRoC/KITTI on-disk formats."""

import os

import numpy as np
import pytest

from libwave_tpu.datasets import (
    load_euroc_camera_index,
    load_euroc_ground_truth,
    load_euroc_imu,
    load_kitti_poses,
    load_kitti_times,
    load_kitti_velodyne,
)


@pytest.fixture
def euroc_root(tmp_path, rng):
    root = tmp_path / "MH_01" / "mav0"
    for sensor in ("imu0", "cam0", "state_groundtruth_estimate0"):
        os.makedirs(root / sensor)
    n = 20
    t0 = 1403636579758555392
    with open(root / "imu0" / "data.csv", "w") as f:
        f.write("#timestamp [ns],w_RS_S_x,w_RS_S_y,w_RS_S_z,a_RS_S_x,a_RS_S_y,a_RS_S_z\n")
        for i in range(n):
            vals = rng.normal(size=6)
            f.write(f"{t0 + i * 5000000}," + ",".join(f"{v:.6f}" for v in vals) + "\n")
    with open(root / "state_groundtruth_estimate0" / "data.csv", "w") as f:
        f.write("#timestamp, p_RS_R_x ...\n")
        for i in range(n):
            vals = rng.normal(size=16)
            vals[3:7] /= np.linalg.norm(vals[3:7])
            f.write(f"{t0 + i * 5000000}," + ",".join(f"{v:.6f}" for v in vals) + "\n")
    with open(root / "cam0" / "data.csv", "w") as f:
        f.write("#timestamp [ns],filename\n")
        for i in range(5):
            f.write(f"{t0 + i * 50000000},{t0 + i * 50000000}.png\n")
    return str(tmp_path / "MH_01")


class TestEuroc:
    def test_imu(self, euroc_root):
        imu = load_euroc_imu(euroc_root)
        assert imu.gyro.shape == (20, 3)
        assert imu.accel.shape == (20, 3)
        dt = np.diff(imu.times)
        # ns epochs in f64 quantize at ~0.25 us; fine for 200 Hz IMU
        np.testing.assert_allclose(dt, 0.005, rtol=1e-4)

    def test_ground_truth(self, euroc_root):
        gt = load_euroc_ground_truth(euroc_root)
        assert gt.p.shape == (20, 3)
        assert gt.q.shape == (20, 4)
        np.testing.assert_allclose(
            np.linalg.norm(gt.q, axis=1), 1.0, atol=1e-5
        )

    def test_camera_index(self, euroc_root):
        times, paths = load_euroc_camera_index(euroc_root)
        assert len(times) == 5 and len(paths) == 5
        assert paths[0].endswith(".png")

    def test_missing(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_euroc_imu(str(tmp_path))


class TestKitti:
    def test_velodyne(self, tmp_path, rng):
        pts = rng.normal(size=(100, 4)).astype(np.float32)
        p = tmp_path / "000000.bin"
        pts.tofile(str(p))
        out = load_kitti_velodyne(str(p))
        np.testing.assert_allclose(out, pts[:, :3])
        sub = load_kitti_velodyne(str(p), max_points=10)
        assert sub.shape == (10, 3)

    def test_poses(self, tmp_path, rng):
        from libwave_tpu.geometry import so3
        import jax.numpy as jnp

        n = 6
        qs = rng.normal(size=(n, 4))
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
        R = np.asarray(so3.quat_to_rot(jnp.asarray(qs)))
        t = rng.normal(size=(n, 3))
        rows = np.concatenate([R, t[:, :, None]], axis=2).reshape(n, 12)
        p = tmp_path / "00.txt"
        np.savetxt(str(p), rows)
        poses = load_kitti_poses(str(p))
        np.testing.assert_allclose(np.asarray(poses.t), t, atol=1e-6)
        np.testing.assert_allclose(
            np.abs(np.sum(np.asarray(poses.q) * qs, axis=1)), 1.0, atol=1e-6
        )

    def test_times(self, tmp_path):
        p = tmp_path / "times.txt"
        p.write_text("0.0\n0.1\n0.2\n")
        np.testing.assert_allclose(load_kitti_times(str(p)), [0, 0.1, 0.2])
