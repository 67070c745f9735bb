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
