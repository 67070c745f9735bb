"""Sliding-window VIO: bounded-memory solves for long sequences.

The windowed solver is the framework's answer to north-star sequence
lengths (the reference bounds only its tracker via window purging,
impl/tracker.hpp:90-101; its solvers stay global). Key property verified
here: windows chain through frozen-anchor overlap without ATE blowup, at
lengths where the IMU dead-reckoned initialization has drifted far beyond
what the full-batch solve can recover from.
"""

import jax
import numpy as np
import pytest

from libwave_tpu.pipelines import (
    EurocVIOParams,
    WindowedVIOParams,
    run_euroc_vio_windowed,
)
from libwave_tpu.sim import EurocSimParams, generate_euroc_sequence


@pytest.fixture(scope="module")
def mid_root(tmp_path_factory):
    """40 s / 201-keyframe sequence (4 windows at W=60/o=10)."""
    root = str(tmp_path_factory.mktemp("euroc_mid"))
    generate_euroc_sequence(
        root, EurocSimParams(duration=40.0, cam_hz=5.0, nb_landmarks=300),
        seed=0,
    )
    return root


def test_param_validation():
    with pytest.raises(ValueError):
        WindowedVIOParams(window=50, overlap=50).validate()
    with pytest.raises(ValueError):
        WindowedVIOParams(window=50, overlap=0).validate()


@pytest.mark.slow
def test_windowed_chain_meets_ate_bound(mid_root):
    est, rep = run_euroc_vio_windowed(
        mid_root, EurocVIOParams(), WindowedVIOParams(window=60, overlap=10)
    )
    assert rep["num_windows"] == 4
    assert rep["num_keyframes"] == 201
    # measured 0.0133 m over 40 s; chained windows must stay well under
    # the reference's 0.1 m per-pose synthetic-VO bound
    assert rep["ate_rmse"] < 0.05, rep["ate_rmse"]
    assert np.isfinite(rep["window_final_costs"]).all()


@pytest.mark.slow
def test_single_window_degenerate(mid_root):
    """N <= window collapses to one full-batch-equivalent solve."""
    est, rep = run_euroc_vio_windowed(
        mid_root, EurocVIOParams(max_keyframes=50),
        WindowedVIOParams(window=60, overlap=10),
    )
    assert rep["num_windows"] == 1
    assert rep["ate_rmse"] < 0.05, rep["ate_rmse"]


@pytest.mark.slow
def test_pixels_to_windowed_trajectory(tmp_path_factory):
    """The fully closed loop at multi-window length: rendered images + IMU
    -> the framework's own tracker -> chained window solves -> ATE bound.
    No ground-truth data association anywhere."""
    from libwave_tpu.datasets.euroc import load_euroc_camera_index
    from libwave_tpu.pipelines import FrontendParams, track_sequence
    from libwave_tpu.vision.images import read_image_sequence

    root = str(tmp_path_factory.mktemp("euroc_px_windows"))
    # landmark density matters at half-res intrinsics: 150 landmarks leaves
    # the first window weakly constrained (measured ATE 0.29); 300 gives
    # 0.085 — the test pins the well-posed configuration
    sim = EurocSimParams(
        duration=24.0, cam_hz=5.0, nb_landmarks=300,
        fx=229.0, fy=228.0, cx=188.0, cy=120.0, width=376, height_px=240,
        render_images=True,
    )
    K = np.array([[sim.fx, 0, sim.cx], [0, sim.fy, sim.cy], [0, 0, 1.0]])
    generate_euroc_sequence(root, sim, seed=0)
    _, paths = load_euroc_camera_index(root)
    frames = read_image_sequence(paths)
    tracks = track_sequence(frames, params=FrontendParams())

    est, rep = run_euroc_vio_windowed(
        root, EurocVIOParams(), WindowedVIOParams(window=50, overlap=8),
        K=K, tracks=tracks,
    )
    assert rep["num_windows"] >= 3, rep["num_windows"]
    assert rep["ate_rmse"] < 0.15, rep["ate_rmse"]


@pytest.mark.slow
def test_checkpoint_crash_resume(mid_root, tmp_path):
    """Crash after 2 of 4 windows -> rerun resumes from the checkpoint and
    reproduces the uninterrupted result exactly (the chain is
    deterministic, so resumed == straight-through)."""
    p = EurocVIOParams()
    wp = WindowedVIOParams(window=60, overlap=10)
    ck = str(tmp_path / "ckpt")

    est_full, rep_full = run_euroc_vio_windowed(mid_root, p, wp)

    _, rep_partial = run_euroc_vio_windowed(
        mid_root, p, wp, checkpoint_dir=ck, stop_after_windows=2
    )
    assert not rep_partial["completed"]
    assert rep_partial["windows_done"] == 2
    assert rep_partial["num_keyframes_solved"] < rep_full["num_keyframes"]

    est_res, rep_res = run_euroc_vio_windowed(
        mid_root, p, wp, checkpoint_dir=ck
    )
    assert rep_res["completed"]
    assert rep_res["windows_done"] == rep_full["num_windows"]
    np.testing.assert_allclose(
        np.asarray(est_res.poses.t), np.asarray(est_full.poses.t),
        atol=1e-9,
    )
    assert abs(rep_res["ate_rmse"] - rep_full["ate_rmse"]) < 1e-9


def test_short_sequence_overlap_clamp(mid_root):
    """N at or below the configured overlap degrades to a single window
    instead of a zero/negative march step (advisor finding r3)."""
    _, rep = run_euroc_vio_windowed(
        mid_root, EurocVIOParams(max_keyframes=8),
        WindowedVIOParams(window=60, overlap=10),
    )
    assert rep["num_windows"] == 1
    assert rep["num_keyframes"] == 8
    assert np.isfinite(rep["ate_rmse"])


def test_mode_validation():
    with pytest.raises(ValueError):
        WindowedVIOParams(mode="nope").validate()


@pytest.mark.slow
def test_marginalize_vs_freeze_ablation(mid_root):
    """The Schur-complement prior must track the chain at least as well as
    the frozen-anchor ablation — and both must meet the synthetic bound."""
    p = EurocVIOParams()
    _, rep_m = run_euroc_vio_windowed(
        mid_root, p, WindowedVIOParams(window=60, overlap=10,
                                       mode="marginalize")
    )
    _, rep_f = run_euroc_vio_windowed(
        mid_root, p, WindowedVIOParams(window=60, overlap=10, mode="freeze")
    )
    assert rep_m["mode"] == "marginalize"
    assert rep_f["mode"] == "freeze"
    assert rep_m["ate_rmse"] < 0.05, rep_m["ate_rmse"]
    assert rep_f["ate_rmse"] < 0.05, rep_f["ate_rmse"]
    # the prior-carrying chain should not be materially worse
    assert rep_m["ate_rmse"] < rep_f["ate_rmse"] * 1.5 + 1e-3


@pytest.mark.slow
def test_multipass_checkpoint_resume(mid_root, tmp_path):
    """Iterated smoothing passes x crash-resume: stopping mid-pass-2 and
    resuming must reproduce the uninterrupted 2-pass chain exactly."""
    p = EurocVIOParams()
    wp = WindowedVIOParams(window=60, overlap=10, passes=2)
    ck = str(tmp_path / "ckpt2")

    est_full, rep_full = run_euroc_vio_windowed(mid_root, p, wp)
    assert rep_full["passes"] == 2

    _, rep_partial = run_euroc_vio_windowed(
        mid_root, p, wp, checkpoint_dir=ck, stop_after_windows=5
    )
    assert not rep_partial["completed"]

    est_res, rep_res = run_euroc_vio_windowed(
        mid_root, p, wp, checkpoint_dir=ck
    )
    assert rep_res["completed"]
    np.testing.assert_allclose(
        np.asarray(est_res.poses.t), np.asarray(est_full.poses.t),
        atol=1e-9,
    )
    assert abs(rep_res["ate_rmse"] - rep_full["ate_rmse"]) < 1e-9


@pytest.mark.slow
def test_marg_device_path_parity(mid_root):
    """The on-device Schur complement (vio_marginalize_device) must chain
    to the same trajectory as the host-f64 path (on CPU both run f64, so
    agreement is tight)."""
    p = EurocVIOParams(max_keyframes=120)
    est_h, rep_h = run_euroc_vio_windowed(
        mid_root, p, WindowedVIOParams(window=60, overlap=10,
                                       marg_device=False))
    est_d, rep_d = run_euroc_vio_windowed(
        mid_root, p, WindowedVIOParams(window=60, overlap=10,
                                       marg_device=True))
    assert rep_h["num_windows"] == rep_d["num_windows"] == 3
    # the paths use slightly different ridge constants (1e-7 vs 1e-10
    # Marquardt-scaled), so agreement is millimetric, not bitwise
    np.testing.assert_allclose(
        np.asarray(est_d.poses.t), np.asarray(est_h.poses.t), atol=5e-3,
        rtol=0,
    )
    assert abs(rep_d["ate_rmse"] - rep_h["ate_rmse"]) < 1e-3


@pytest.mark.slow
def test_pad_bucketing_dense_window(mid_root):
    """One deliberately dense window must not inflate every window's
    padded solve: pad_percentile < 100 builds a typical-size bucket plus
    an overflow bucket, with accuracy unchanged (padding rows are
    zero-weight either way)."""
    from libwave_tpu.datasets.euroc import load_euroc_tracks

    tracks = np.asarray(load_euroc_tracks(mid_root))
    # densify frames [125, 145): duplicate their observations 3x under
    # fresh landmark ids (consistent projections -> they triangulate and
    # participate normally; only that window's bank grows)
    sel = (tracks[:, 0] >= 125) & (tracks[:, 0] < 145)
    dups = []
    for c in range(3):
        d = tracks[sel].copy()
        d[:, 1] += 100000 * (c + 1)
        dups.append(d)
    tracks2 = np.concatenate([tracks] + dups)

    wp = dict(window=60, overlap=10, mode="marginalize")
    _, base = run_euroc_vio_windowed(
        mid_root, EurocVIOParams(), WindowedVIOParams(**wp),
        tracks=tracks2,
    )
    _, buck = run_euroc_vio_windowed(
        mid_root, EurocVIOParams(),
        WindowedVIOParams(**wp, pad_percentile=70.0),
        tracks=tracks2,
    )
    assert len(base["pad_buckets"]) == 1
    assert len(buck["pad_buckets"]) == 2
    small, big = buck["pad_buckets"]
    assert small[0] < big[0]  # typical bucket strictly smaller
    assert buck["pad_bucket_windows"][0] >= 2  # most windows stay typical
    # identical factor content -> matching accuracy
    assert abs(buck["ate_rmse"] - base["ate_rmse"]) < 5e-3, (
        buck["ate_rmse"], base["ate_rmse"],
    )
