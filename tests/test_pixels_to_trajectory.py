"""Pixels -> trajectory: the closed front-end/back-end loop.

The only sensor inputs are rendered cam0 images and the IMU stream; the
framework's own FAST/BRISK/match/track front end produces the landmark
measurements the VIO factor graph solves. This mirrors the reference's
composition of Tracker (wave_vision/include/wave/vision/tracker/
tracker.hpp:34) filling the container its BA consumes
(wave_optimization/tests/ceres/ba_test.cpp:97) — with an explicit ATE bound
at the end.
"""

import os

import jax
import numpy as np
import pytest

from libwave_tpu.datasets.euroc import load_euroc_camera_index
from libwave_tpu.pipelines import (
    EurocVIOParams,
    FrontendParams,
    run_euroc_vio_from_images,
    track_sequence,
)
from libwave_tpu.sim import EurocSimParams, generate_euroc_sequence
from libwave_tpu.vision.images import read_image_sequence

SIM = EurocSimParams(
    duration=6.0, cam_hz=5.0, nb_landmarks=120,
    fx=229.0, fy=228.0, cx=188.0, cy=120.0, width=376, height_px=240,
    render_images=True,
)
K = np.array([[SIM.fx, 0, SIM.cx], [0, SIM.fy, SIM.cy], [0, 0, 1.0]])


@pytest.fixture(scope="module")
def sim_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("euroc_rendered"))
    generate_euroc_sequence(root, SIM, seed=0)
    return root


class TestFrontendTracks:
    def test_rendered_sequence_produces_clean_tracks(self, sim_root):
        _, paths = load_euroc_camera_index(sim_root)
        frames = read_image_sequence(paths)
        assert frames.shape[1:] == (240, 376)
        tracks = track_sequence(frames, params=FrontendParams())
        n_meas = len(tracks)
        ids = np.unique(tracks[:, 1])
        # ~120 landmarks in view across 31 frames: the tracker should
        # produce on the order of one track per (landmark, visibility
        # interval) — not thousands of fragments
        assert 60 <= len(ids) <= 500, len(ids)
        assert n_meas >= 300, n_meas
        lengths = np.bincount(tracks[:, 1].astype(int))
        lengths = lengths[lengths > 0]
        assert np.mean(lengths) >= 3.0, np.mean(lengths)
        # frames are covered contiguously per track (tracker semantics:
        # a track is an unbroken match chain)
        t0 = tracks[tracks[:, 1] == ids[np.argmax(lengths)]]
        fr = np.sort(t0[:, 0].astype(int))
        assert (np.diff(fr) == 1).all()

    def test_scan_and_streaming_modes_agree(self, sim_root):
        """One-lax.scan-program tracking vs per-frame streaming: identical
        keys by construction, but XLA may fuse reductions differently, and
        RANSAC thresholds turn ULP differences into discrete match flips —
        so the contract is statistical equivalence, not bit equality."""
        _, paths = load_euroc_camera_index(sim_root)
        frames = read_image_sequence(paths[:8])
        p = FrontendParams()
        t_stream = track_sequence(frames, params=p, scan=False)
        t_scan = track_sequence(frames, params=p, scan=True)

        def stats(t):
            lengths = np.bincount(t[:, 1].astype(int))
            return len(t), len(np.unique(t[:, 1])), lengths[lengths > 0].mean()

        n1, ids1, len1 = stats(t_stream)
        n2, ids2, len2 = stats(t_scan)
        assert abs(n1 - n2) <= 0.1 * max(n1, n2), (n1, n2)
        assert abs(ids1 - ids2) <= 0.1 * max(ids1, ids2), (ids1, ids2)
        assert abs(len1 - len2) <= 0.5, (len1, len2)
        # the measurement sets themselves overlap almost entirely
        s1 = {(int(f), round(u, 1), round(v, 1))
              for f, _, u, v in t_stream}
        s2 = {(int(f), round(u, 1), round(v, 1)) for f, _, u, v in t_scan}
        overlap = len(s1 & s2) / max(len(s1 | s2), 1)
        assert overlap > 0.9, overlap


class TestOrbFrontend:
    def test_method_validation(self):
        with pytest.raises(ValueError, match="unknown front-end method"):
            FrontendParams(method="sift")

    @pytest.mark.slow
    def test_orb_method_tracks(self, sim_root):
        """The Tracker composition axis (tracker.hpp:34 templating): the
        same tracker runs over the ORB pyramid front end."""
        _, paths = load_euroc_camera_index(sim_root)
        frames = read_image_sequence(paths[:10])
        tracks = track_sequence(frames, params=FrontendParams(method="orb"))
        ids = np.unique(tracks[:, 1])
        assert len(ids) >= 40, len(ids)
        lengths = np.bincount(tracks[:, 1].astype(int))
        lengths = lengths[lengths > 0]
        assert lengths.mean() >= 2.0, lengths.mean()


class TestPixelsToTrajectory:
    @pytest.mark.slow
    def test_images_plus_imu_meet_ate_bound(self, sim_root):
        state, rep = run_euroc_vio_from_images(
            sim_root, EurocVIOParams(), K=K
        )
        # explicit bound on the end-to-end trajectory: well under the
        # reference's per-pose 0.1 m synthetic-VO bound
        # (gtsam_offline_example.cpp:150), and the solve must actually
        # correct the IMU dead-reckoning, not ride it
        assert rep["ate_rmse"] < 0.06, rep["ate_rmse"]
        assert rep["ate_rmse"] < 0.5 * rep["ate_rmse_deadreckon"], rep
        assert rep["num_tracks"] >= 60
        assert rep["frontend_frames_per_s"] > 0


@pytest.mark.slow
def test_track_sequences_batched_matches_single(sim_root):
    """DP batch mode: vmapped whole-sequence tracking must reproduce the
    single-sequence tracker exactly per matching key."""
    from libwave_tpu.pipelines import track_sequences_batched

    _, paths = load_euroc_camera_index(sim_root)
    frames = read_image_sequence(paths[:10])
    params = FrontendParams()
    key = jax.random.key(3)
    seq_keys = jax.random.split(key, 2)
    batched = track_sequences_batched(
        np.stack([frames, frames]), params=params, key=key
    )
    single0 = track_sequence(frames, params=params, key=seq_keys[0],
                             scan=True)
    np.testing.assert_allclose(batched[0], single0)
    assert len(batched) == 2 and len(batched[1]) > 0
