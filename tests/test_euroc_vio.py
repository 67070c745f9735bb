"""End-to-end VIO on an EuRoC-format sequence (BASELINE config 4 /
north-star analog): generate an MH_01-like ASL directory (200 Hz IMU with
bias + noise, camera tracks with 5% outliers and dropouts), reload it
through the datasets.euroc loaders, run preintegration -> triangulation ->
robust solve_vio, and assert the ATE bound. Mirrors the reference's
offline-pipeline tests (gtsam_offline_kitti_example.cpp:25-153)."""

import numpy as np
import pytest

from libwave_tpu.datasets import (
    load_euroc_ground_truth,
    load_euroc_imu,
    load_euroc_tracks,
)
from libwave_tpu.pipelines import EurocVIOParams, run_euroc_vio
from libwave_tpu.sim import EurocSimParams, generate_euroc_sequence

SIM = EurocSimParams(duration=12.0, cam_hz=5.0, nb_landmarks=160)


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("euroc_mh01_like")
    generate_euroc_sequence(str(root), SIM, seed=3)
    return str(root)


class TestLoaders:
    def test_imu_roundtrip(self, seq_dir):
        imu = load_euroc_imu(seq_dir)
        n = int(SIM.duration * SIM.imu_hz)
        assert imu.gyro.shape == (n, 3)
        dt = np.diff(imu.times)
        np.testing.assert_allclose(dt, 1.0 / SIM.imu_hz, atol=1e-6)

    def test_ground_truth_roundtrip(self, seq_dir):
        gt = load_euroc_ground_truth(seq_dir)
        assert gt.p.shape[0] == int(SIM.duration * SIM.imu_hz) + 1
        # quaternions normalized, biases constant as written
        np.testing.assert_allclose(
            np.linalg.norm(gt.q, axis=-1), 1.0, atol=1e-6
        )
        np.testing.assert_allclose(gt.bg[0], SIM.gyro_bias, atol=1e-9)

    def test_tracks_have_outliers(self, seq_dir):
        tracks = load_euroc_tracks(seq_dir)
        assert tracks.shape[1] == 4
        n_frames = int(SIM.duration * SIM.cam_hz) + 1
        assert tracks[:, 0].max() == n_frames - 1


class TestDeviceTimeSafety:
    def test_times_are_sequence_relative(self, seq_dir):
        """Device arrays must carry sequence-relative times: EuRoC epoch
        stamps (~1.4e9 s) have 128 s f32 resolution and collapse to a
        single value on TPU (f32 default), silently breaking every
        time association in the evaluation."""
        from libwave_tpu.pipelines.euroc_vio import (
            EurocVIOParams,
            build_euroc_vio_problem,
        )

        _, _, gt_traj, kf_times = build_euroc_vio_problem(
            seq_dir, EurocVIOParams()
        )
        kt = np.asarray(kf_times)
        gt = np.asarray(gt_traj.times)
        assert kt[0] == 0.0
        # small enough that f32 keeps sub-millisecond resolution
        assert float(max(kt.max(), np.abs(gt).max())) < 1e5
        # spacing survives an f32 round-trip
        assert np.all(np.diff(kt.astype(np.float32)) > 0)


@pytest.mark.slow
class TestEndToEnd:
    def test_vio_ate_bound(self, seq_dir):
        """The full pipeline beats dead reckoning and lands under the ATE
        bound despite track outliers (Huber) and IMU bias (estimated)."""
        state, report = run_euroc_vio(
            seq_dir, EurocVIOParams(pixel_sigma=0.7)
        )
        assert report["final_cost"] < report["initial_cost"]
        assert report["ate_rmse"] < 0.03, report
        assert report["ate_rmse"] < 0.5 * max(
            report["ate_rmse_deadreckon"], 1e-6
        ) or report["ate_rmse_deadreckon"] < 0.02, report
        # gyro bias is observable through the orientation chain
        bg_est = np.asarray(state.bg).mean(axis=0)
        np.testing.assert_allclose(bg_est, SIM.gyro_bias, atol=2e-3)
