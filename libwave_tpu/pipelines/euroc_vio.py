"""End-to-end VIO on an EuRoC (ASL-format) sequence.

The north-star pipeline (BASELINE.md: EuRoC MH_01 ATE): load IMU + camera
feature tracks through ``libwave_tpu.datasets.euroc``, preintegrate per
keyframe interval, triangulate an initial map from dead-reckoned poses,
solve the full VIO factor graph (Huber-robust against track outliers), and
report ATE against the dataset's ground truth. The reference's analog is
the offline GTSAM pipeline over dumped feature tracks
(wave_gtsam/tests/gtsam/gtsam_offline_kitti_example.cpp:25-153: load ->
backproject init -> LM -> per-pose error thresholds).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from libwave_tpu.benchmark.trajectory import (
    Trajectory,
    absolute_trajectory_error,
    relative_pose_error,
)
from libwave_tpu.datasets.euroc import (
    EUROC_CAM0_K,
    load_euroc_camera_index,
    load_euroc_ground_truth,
    load_euroc_imu,
    load_euroc_tracks,
)
from libwave_tpu.geometry import so3
from libwave_tpu.geometry.se3 import SE3
from libwave_tpu.optim import schur
from libwave_tpu.optim.imu import imu_sqrt_info, preintegrate_imu
from libwave_tpu.pipelines.vio import (
    VIOConfig,
    VIOProblem,
    VIOState,
    solve_vio,
    vio_dead_reckon,
)
from libwave_tpu.sim.vo_dataset import q_BC as default_q_BC


@dataclasses.dataclass(frozen=True)
class EurocVIOParams:
    pixel_sigma: float = 1.0
    huber_delta: float = 3.0  # whitened px — robust to track outliers
    max_keyframes: int = 0  # 0 = all camera frames
    min_track_length: int = 3
    # reprojection gate (px) against the dead-reckoned init: observations
    # beyond it are outliers the front-end's RANSAC would reject; they are
    # weight-zeroed and landmarks re-triangulated from the survivors. The
    # gate must sit well ABOVE the dead-reckoning drift's pixel footprint
    # (gating at drift level would delete the correction signal itself) and
    # below the uniform-outlier scale (~hundreds of px).
    outlier_gate_px: float = 100.0
    gate_rounds: int = 2
    gyro_noise_density: float = 1.7e-4
    accel_noise_density: float = 2.0e-3
    bias_walk_sqrt_info: float = 1e3
    bias_prior_gyro: float = 1e2
    bias_prior_accel: float = 1e1


def _preintegrate_intervals(imu, cam_times, N, params):
    """vmapped preintegration of every keyframe interval (equal-length
    windows over a uniform IMU stream): one compiled program instead of a
    host loop — the step that dominated problem build time at
    north-star sequence lengths. Returns (pim_stack, sqrt_infos)."""
    dt_imu = float(np.median(np.diff(imu.times)))
    steps = int(round((cam_times[1] - cam_times[0]) / dt_imu))
    starts = np.round(
        (np.asarray(cam_times[:-1]) - imu.times[0]) / dt_imu
    ).astype(np.int64)
    idx = np.minimum(starts[:, None] + np.arange(steps)[None, :],
                     len(imu.times) - 1)
    z3 = jnp.zeros(3)
    pim_stack = jax.vmap(
        lambda g, a: preintegrate_imu(
            g, a, dt_imu, z3, z3,
            gyro_noise_density=params.gyro_noise_density,
            accel_noise_density=params.accel_noise_density,
        )
    )(jnp.asarray(imu.gyro[idx]), jnp.asarray(imu.accel[idx]))
    sqrt_infos = jax.vmap(imu_sqrt_info)(pim_stack)
    return pim_stack, sqrt_infos


def _track_bank(tracks, N, min_track_length, frame_offset=0,
                return_raw=False):
    """(frame, id, u, v) rows -> dense-id observation bank over keyframes
    [frame_offset, frame_offset + N), sorted by frame. Returns
    (pose_idx, lm_idx, uv, M), plus the per-observation ORIGINAL track id
    when ``return_raw`` (the windowed solvers track landmark identity
    across windows with it)."""
    frames = tracks[:, 0].astype(np.int64) - frame_offset
    keep = (frames >= 0) & (frames < N)
    frames = frames[keep]
    raw_ids = tracks[keep, 1].astype(np.int64)
    uv_all = tracks[keep, 2:4]
    uniq, inv, counts = np.unique(
        raw_ids, return_inverse=True, return_counts=True
    )
    long_enough = counts[inv] >= min_track_length
    frames = frames[long_enough]
    inv = inv[long_enough]
    uv_all = uv_all[long_enough]
    uniq2, lm_ids = np.unique(inv, return_inverse=True)
    M = len(uniq2)

    order = np.argsort(frames, kind="stable")
    out = (
        frames[order].astype(np.int32),
        lm_ids[order].astype(np.int32),
        uv_all[order],
        M,
    )
    if return_raw:
        return out + (uniq[inv][order],)
    return out


def _camera_P_mats(qs, ps, Kmat, qbc):
    """Batched pinhole projection matrices P = K [R^T | -R^T p] for body
    poses composed with the camera extrinsic rotation."""
    n = len(qs)
    q_GC = np.asarray(
        so3.quat_multiply(
            jnp.asarray(qs), jnp.broadcast_to(jnp.asarray(qbc), (n, 4))
        )
    )
    R = np.asarray(jax.vmap(so3.quat_to_rot)(jnp.asarray(q_GC)))
    P = np.zeros((n, 3, 4))
    P[:, :, :3] = np.einsum("ij,nkj->nik", np.asarray(Kmat), R)  # K R^T
    P[:, :, 3] = -np.einsum("nij,nj->ni", P[:, :, :3], np.asarray(ps))
    return P


def _spread_views(lm_idx, inlier, M, V=4):
    """Per-landmark selection of up to V observation indices spread across
    its track (inliers preferred; all observations when < 2 inliers
    survive). Fully vectorized. Returns (sel (M, V), mask (M, V))."""
    K_obs = len(lm_idx)
    cnt_all = np.bincount(lm_idx, minlength=M)
    cnt_in = np.bincount(lm_idx[inlier], minlength=M)
    use_all = cnt_in < 2
    # sort observations by landmark with outliers demoted to the tail of
    # each landmark's run (so the first `pool` entries are the usable set)
    demote = np.where(use_all[lm_idx], False, ~inlier)
    order = np.lexsort((np.arange(K_obs), demote, lm_idx))
    start = np.zeros(M, np.int64)
    np.cumsum(cnt_all[:-1], out=start[1:])
    pool = np.where(use_all, cnt_all, cnt_in)
    js = np.arange(V)
    pos = (js[None, :] * (np.maximum(pool, 1) - 1)[:, None]) // max(V - 1, 1)
    sel = order[np.minimum(start[:, None] + pos, max(K_obs - 1, 0))]
    mask = pool[:, None] > 0
    uniq = np.ones((M, V), bool)
    uniq[:, 1:] = pos[:, 1:] != pos[:, :-1]
    return sel, mask & uniq


def _triangulate_gated(P_mats, pose_idx, lm_idx, uv, M, gate_px, rounds):
    """Alternating batched-DLT triangulation and reprojection gating —
    the pipeline stand-in for the front-end's RANSAC outlier rejection
    (brute_force_matcher.cpp:122-158). Round 1 uses all observations
    (outliers included); later rounds re-triangulate from gate survivors.
    Fully vectorized over landmarks (one batched (M, 2V, 4) SVD per round).
    Returns (lm_init (M, 3), inlier (K,))."""
    K_obs = len(pose_idx)
    inlier = np.ones(K_obs, bool)
    lm_init = np.zeros((M, 3))
    for _ in range(max(rounds, 1)):
        sel, smask = _spread_views(lm_idx, inlier, M)
        P = P_mats[pose_idx[sel]]  # (M, V, 3, 4)
        u, v = uv[sel][..., 0], uv[sel][..., 1]
        rows = np.stack(
            [
                u[..., None] * P[:, :, 2] - P[:, :, 0],
                v[..., None] * P[:, :, 2] - P[:, :, 1],
            ],
            axis=2,
        )  # (M, V, 2, 4)
        A = (rows * smask[..., None, None]).reshape(M, -1, 4)
        _, _, Vt = np.linalg.svd(A, full_matrices=False)
        X = Vt[:, -1, :]
        w = X[:, 3]
        safe_w = np.where(np.abs(w) < 1e-12, 1.0, w)
        lm_init = np.where(
            np.abs(w[:, None]) > 1e-12, X[:, :3] / safe_w[:, None], X[:, :3]
        )
        Xh = np.concatenate([lm_init, np.ones((M, 1))], axis=-1)
        proj = np.einsum("kij,kj->ki", P_mats[pose_idx], Xh[lm_idx])
        z = proj[:, 2]
        uv_hat = proj[:, :2] / np.where(np.abs(z) < 1e-9, 1e-9, z)[:, None]
        err = np.linalg.norm(uv_hat - uv, axis=-1)
        inlier = (z > 0.1) & (err < gate_px)
    return lm_init, inlier


def build_euroc_vio_problem(root: str,
                            params: EurocVIOParams = EurocVIOParams(),
                            K: np.ndarray | None = None,
                            tracks: np.ndarray | None = None):
    """Host-side problem assembly: loaders -> preintegration -> track bank
    -> triangulated initial map -> (problem, init_state, gt Trajectory,
    keyframe times).

    ``tracks`` overrides the cam0/tracks.csv sidecar with an in-memory
    (frame, landmark_id, u, v) array — the path used when the framework's
    own front end (pipelines.visual_frontend.track_sequence) produced the
    tracks from the cam0 images."""
    imu = load_euroc_imu(root)
    gt = load_euroc_ground_truth(root)
    cam_times, _ = load_euroc_camera_index(root)
    if tracks is None:
        tracks = load_euroc_tracks(root)

    N = len(cam_times)
    if params.max_keyframes and N > params.max_keyframes:
        N = params.max_keyframes
        cam_times = cam_times[:N]

    pim_stack, sqrt_infos = _preintegrate_intervals(
        imu, cam_times, N, params
    )
    pose_idx, lm_idx, uv, M = _track_bank(
        tracks, N, params.min_track_length
    )

    Kmat = EUROC_CAM0_K if K is None else K
    qbc = np.asarray(default_q_BC(np.float64))

    # initial state: dead-reckon the IMU chain from the ground-truth start
    gi = int(np.argmin(np.abs(gt.times - cam_times[0])))
    q0 = jnp.asarray(gt.q[gi] / np.linalg.norm(gt.q[gi]))
    p0 = jnp.asarray(gt.p[gi])
    v0 = jnp.asarray(gt.v[gi])

    free = np.ones((N, 15))
    free[0, 0:6] = 0.0

    pose_ell, lm_ell, pad_mask, ell, uv_p = schur.pack_observations(
        pose_idx, lm_idx, N, M, uv
    )
    problem = VIOProblem(
        K=jnp.asarray(Kmat),
        pose_idx=pose_ell,
        lm_idx=lm_ell,
        uv=jnp.asarray(uv_p),
        obs_weight=pad_mask.astype(jnp.float64),
        pim=pim_stack,
        imu_i=jnp.arange(N - 1, dtype=jnp.int32),
        imu_j=jnp.arange(1, N, dtype=jnp.int32),
        imu_sqrt_info=sqrt_infos,
        bias_walk_sqrt_info=jnp.full((6,), params.bias_walk_sqrt_info),
        bias_prior_sqrt_info=jnp.concatenate(
            [
                jnp.full((3,), params.bias_prior_gyro),
                jnp.full((3,), params.bias_prior_accel),
            ]
        ),
        ell=ell,
        free_pose=jnp.asarray(free),
        q_BC=jnp.asarray(qbc),
        pixel_sigma=params.pixel_sigma,
    )

    # dead-reckoned keyframe chain -> triangulated initial map
    state0 = vio_dead_reckon(
        problem, q0, p0, v0, jnp.zeros((M, 3))
    )
    P_mats = _camera_P_mats(
        np.asarray(state0.q), np.asarray(state0.p), Kmat, qbc
    )
    lm_init, inlier = _triangulate_gated(
        P_mats, pose_idx, lm_idx, uv, M,
        params.outlier_gate_px, params.gate_rounds,
    )

    # weight-zero the gated-out observations; drop landmarks left with < 2
    # inliers entirely (their init is untrustworthy)
    lm_inlier_count = np.bincount(lm_idx[inlier], minlength=M)
    inlier &= lm_inlier_count[lm_idx] >= 2
    weight = inlier.astype(np.float64)
    pose_ell, lm_ell, pad_mask, ell, uv_p, w_p = schur.pack_observations(
        pose_idx, lm_idx, N, M, uv, weight
    )
    problem = problem._replace(
        pose_idx=pose_ell, lm_idx=lm_ell, uv=jnp.asarray(uv_p),
        obs_weight=jnp.asarray(w_p) * pad_mask, ell=ell,
    )
    state0 = state0._replace(lm=jnp.asarray(lm_init))

    # Times go on device sequence-relative: EuRoC ASL stamps are epoch
    # seconds (~1.4e9) whose f32 resolution is 128 s — under the TPU's
    # default f32 they would all collapse to one value and every
    # interpolation/association in the evaluation would silently break.
    t0 = float(cam_times[0])
    gt_traj = Trajectory(
        times=jnp.asarray(np.asarray(gt.times, np.float64) - t0),
        poses=SE3(q=jnp.asarray(gt.q), t=jnp.asarray(gt.p)),
    )
    kf_rel = jnp.asarray(np.asarray(cam_times, np.float64) - t0)
    return problem, state0, gt_traj, kf_rel


def default_vio_config(params: EurocVIOParams) -> VIOConfig:
    """The pipeline's default solver configuration (single source of truth
    — bench.py measures exactly this config).

    The auto solver picks the dense Schur path at EuRoC window sizes
    (N*15 in the hundreds): exact LM steps, where the stiff IMU chain
    made block-Jacobi PCG propagate corrections ~one keyframe per
    iteration (measured on the 12 s synthetic MH_01 analog:
    ATE 0.075 m after 40 PCG-limited iterations vs 0.009 m after 20
    dense iterations). cg_max_iters only applies past the size caps.
    """
    return VIOConfig(
        max_iterations=25, cg_max_iters=150,
        huber_delta=params.huber_delta,
    )


def run_euroc_vio(root: str, params: EurocVIOParams = EurocVIOParams(),
                  cfg: VIOConfig | None = None, K: np.ndarray | None = None,
                  tracks: np.ndarray | None = None):
    """Full pipeline: build -> solve -> ATE. Returns (state, report dict)."""
    problem, init, gt_traj, kf_times = build_euroc_vio_problem(
        root, params, K, tracks=tracks
    )
    if cfg is None:
        cfg = default_vio_config(params)
    state, info = jax.jit(
        lambda pr, st: solve_vio(pr, st, cfg)
    )(problem, init)

    est = Trajectory(times=kf_times, poses=SE3(q=state.q, t=state.p))
    ate, err = absolute_trajectory_error(gt_traj, est)
    rpe_t, rpe_r, _ = relative_pose_error(gt_traj, est, delta=1)
    init_est = Trajectory(times=kf_times, poses=SE3(q=init.q, t=init.p))
    ate0, _ = absolute_trajectory_error(gt_traj, init_est)
    report = {
        "ate_rmse": float(ate),
        "rpe_trans_rmse": float(rpe_t),
        "rpe_rot_rmse": float(rpe_r),
        "ate_rmse_deadreckon": float(ate0),
        "per_pose_error": np.asarray(err),
        "final_cost": float(info["final_cost"]),
        "initial_cost": float(info["initial_cost"]),
        "num_keyframes": int(state.q.shape[0]),
        "num_landmarks": int(state.lm.shape[0]),
    }
    return state, report


def run_euroc_vio_from_images(
    root: str,
    params: EurocVIOParams = EurocVIOParams(),
    frontend=None,
    cfg: VIOConfig | None = None,
    K: np.ndarray | None = None,
):
    """End-to-end VIO whose only sensor inputs are the cam0 **images** and
    the IMU stream: run the framework's own front end
    (FAST -> BRISK -> match -> track) over cam0/data/*.png, feed the
    resulting track bank into the VIO factor graph, solve, and score ATE.

    This is the full closed loop the reference assembles across modules —
    Tracker filling the LandmarkMeasurementContainer
    (wave_vision/include/wave/vision/tracker/tracker.hpp:34) that the BA
    problem consumes (wave_optimization/tests/ceres/ba_test.cpp:97) — as
    one pipeline call. Ground truth is used only for the initial state
    (q0, p0, v0, standard VIO initialization) and for scoring.

    Returns ``(state, report)`` with front-end stats added to the report.
    """
    import time as _time

    from libwave_tpu.pipelines.visual_frontend import (
        FrontendParams,
        track_sequence,
    )
    from libwave_tpu.vision.images import read_image_sequence

    if frontend is None:
        frontend = FrontendParams()
    cam_times, paths = load_euroc_camera_index(root)
    n = len(paths)
    if params.max_keyframes and n > params.max_keyframes:
        paths = paths[: params.max_keyframes]
    frames = read_image_sequence(paths)
    t0 = _time.perf_counter()
    tracks = track_sequence(frames, params=frontend)
    dt_frontend = _time.perf_counter() - t0

    state, report = run_euroc_vio(root, params, cfg, K, tracks=tracks)
    report["num_track_measurements"] = int(len(tracks))
    report["num_tracks"] = int(len(np.unique(tracks[:, 1])))
    report["frontend_frames"] = int(frames.shape[0])
    report["frontend_seconds"] = float(dt_frontend)
    report["frontend_frames_per_s"] = float(frames.shape[0] / dt_frontend)
    return state, report
