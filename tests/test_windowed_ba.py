"""Windowed vision-only BA: correctness on synthetic, bounded drift on KITTI.

Two contracts, deliberately different:

- synthetic circle sequence (well-conditioned windows): the chained solve
  must meet the reference's synthetic-VO bounds (pos < 0.1 m,
  rot < 0.05 rad — gtsam_offline_example.cpp:150,155), proving the window
  machinery adds no error of its own;
- real KITTI drive_0036: an 80-frame window is intrinsically
  under-constrained — the PROVEN full-batch assembly restricted to the
  first 80 frames already misses the 3.0 m full-sequence bound (measured
  max 5.6 m; the windowed assembly does slightly better at 4.6 m). So the
  windowed mode's honest claim on this data is bounded odometry drift, not
  the global-solve bound: final drift under ~12% of path length with local
  (10-frame) relative errors ~1 m. Full-batch remains the right tool at
  <= ~250 frames; windowing is the bounded-memory scaling mode.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libwave_tpu.geometry import so3
from libwave_tpu.optim import BAConfig, PriorBank, between_from_trajectory
from libwave_tpu.pipelines import WindowedBAParams, solve_ba_windowed
from libwave_tpu.sim import VoSimParams, generate_vo_dataset, load_vo_dataset
from libwave_tpu.sim.vo_dataset import q_BC

pytestmark = pytest.mark.slow

DATASET_DIR = "/root/reference/wave_optimization/tests/data/vo_data_drive_0036"


def _bank_from_dataset(ds, frames):
    vis = np.asarray(ds.visible)[frames]
    px = np.asarray(ds.pixels)[frames]
    rows = [
        (i, j, px[i, j, 0], px[i, j, 1])
        for i in range(len(frames))
        for j in np.nonzero(vis[i])[0]
    ]
    return np.asarray(rows, np.float64)


def test_synthetic_circle_windowed_meets_reference_bounds():
    ds = generate_vo_dataset(
        VoSimParams(nb_landmarks=120, steps=2000, fx=200.0, fy=200.0,
                    hz=10.0),
        jax.random.key(0),
    )
    frames = np.nonzero(np.asarray(ds.frame_has_obs))[0]
    N = len(frames)
    assert N >= 150  # enough for 4 chained windows
    qbc = q_BC(ds.robot_q_GB.dtype)
    q_gt = np.asarray(so3.quat_multiply(
        ds.robot_q_GB[frames], jnp.broadcast_to(qbc, (N, 4))
    ))
    p_gt = np.asarray(ds.robot_p_GB)[frames]

    tracks = _bank_from_dataset(ds, frames)
    rng = np.random.default_rng(1)
    tracks[:, 2:] += 1.0 * rng.standard_normal((len(tracks), 2))

    between = between_from_trajectory(
        jnp.asarray(q_gt), jnp.asarray(p_gt),
        sigmas_rot=1e-2, sigmas_trans=1e-2, noise_key=jax.random.key(5),
    )
    priors = PriorBank(
        i=jnp.asarray([0, 1], jnp.int32),
        q=jnp.asarray(q_gt[:2]), p=jnp.asarray(p_gt[:2]),
        sqrt_info=jnp.concatenate(
            [jnp.full((2, 3), 1e5), jnp.full((2, 3), 1e6)], axis=-1
        ),
    )
    off_q = so3.exp_quat(jnp.asarray([-0.02, 0.02, 0.02]))
    off_p = jnp.asarray([0.02, -0.03, 0.05])
    q0 = np.asarray(so3.quat_multiply(
        jnp.asarray(q_gt), jnp.broadcast_to(off_q, (N, 4))
    ))
    p0 = p_gt + np.asarray(so3.quat_rotate(
        jnp.asarray(q_gt), jnp.broadcast_to(off_p, (N, 3))
    ))

    q_est, p_est, rep = solve_ba_windowed(
        np.asarray(ds.camera_K, np.float64), tracks, N, q0, p0,
        between=between, priors=priors,
        wparams=WindowedBAParams(window=60, overlap=10),
        cfg=BAConfig(max_iterations=40, cg_max_iters=150, huber_delta=3.0),
    )
    assert rep["num_windows"] >= 3
    pos_err = np.linalg.norm(p_est - p_gt, axis=-1)
    rot_err = np.asarray(
        so3.rotation_distance(jnp.asarray(q_est), jnp.asarray(q_gt))
    )
    # reference synthetic-VO bounds (gtsam_offline_example.cpp:150,155);
    # measured 0.024 m / 0.005 rad
    assert pos_err.max() < 0.1, pos_err.max()
    assert rot_err.max() < 0.05, rot_err.max()


@pytest.mark.skipif(
    not os.path.isdir(DATASET_DIR), reason="reference dataset not mounted"
)
def test_kitti_drive_0036_windowed_bounded_drift():
    ds = load_vo_dataset(DATASET_DIR)
    N = ds.num_frames
    qbc = q_BC(ds.robot_q_GB.dtype)
    q_gt = so3.quat_multiply(ds.robot_q_GB, qbc)
    p_gt = ds.robot_p_GB
    dtype = p_gt.dtype
    tracks = _bank_from_dataset(ds, np.arange(N))

    between = between_from_trajectory(
        q_gt, p_gt, sigmas_rot=0.05, sigmas_trans=0.05,
        noise_key=jax.random.key(5),
    )
    priors = PriorBank(
        i=jnp.asarray([0, 1], jnp.int32),
        q=q_gt[:2], p=p_gt[:2],
        sqrt_info=jnp.concatenate(
            [jnp.full((2, 3), 1e5, dtype), jnp.full((2, 3), 1e6, dtype)],
            axis=-1,
        ),
    )
    off_q = so3.exp_quat(jnp.asarray([-0.1, 0.1, 0.1], dtype))
    off_p = jnp.asarray([0.05, -0.10, 0.20], dtype)
    q0 = np.asarray(
        so3.quat_multiply(q_gt, jnp.broadcast_to(off_q, q_gt.shape))
    )
    p0 = np.asarray(
        p_gt + so3.quat_rotate(q_gt, jnp.broadcast_to(off_p, p_gt.shape))
    )

    q_est, p_est, rep = solve_ba_windowed(
        np.asarray(ds.camera_K), tracks, N, q0, p0,
        between=between, priors=priors,
        wparams=WindowedBAParams(window=80, overlap=12),
        cfg=BAConfig(max_iterations=40, cg_max_iters=150, huber_delta=3.0),
    )
    assert rep["num_windows"] >= 3
    assert np.isfinite(rep["window_final_costs"]).all()

    p_gt_np = np.asarray(p_gt)
    path_len = float(
        np.sum(np.linalg.norm(np.diff(p_gt_np, axis=0), axis=1))
    )
    pos_err = np.linalg.norm(p_est - p_gt_np, axis=-1)
    # odometry contract: end drift bounded as a fraction of path length
    # (measured 9.2% at W=80/o=12) and local 10-frame relative consistency
    assert pos_err[-1] / path_len < 0.15, pos_err[-1] / path_len
    d = 10
    rel_err = np.linalg.norm(
        (p_est[d:] - p_est[:-d]) - (p_gt_np[d:] - p_gt_np[:-d]), axis=1
    )
    assert rel_err.mean() < 1.2, rel_err.mean()
