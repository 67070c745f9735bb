"""Sliding-window VIO: bounded-memory solves for north-star-length sequences.

The full-batch ``pipelines.euroc_vio`` solve keeps every keyframe in one
factor graph — right for short calibration-grade runs, but an MH_01-scale
sequence (~3,700 frames) needs bounded windows. The reference bounds only
the *tracker* this way (window_size purge, wave_vision/include/wave/vision/
tracker/impl/tracker.hpp:90-101) and leaves its solvers global; here the
solver itself windows:

- fixed-size keyframe windows with overlap, marching down the sequence;
- each window solves the full VIO factor graph (IMU preintegration + bias
  walk + Huber reprojection) with its leading already-solved keyframes
  FROZEN at the previous window's estimates — a hard-anchor stand-in for
  prior-carrying marginalization that keeps every window's problem
  identically shaped;
- bias estimates carry forward as the next window's initialization;
- every window is padded to common (Pmax, M, shift-pass) dimensions, so
  ONE jit-compiled executable serves the whole sequence — no per-window
  retracing, and windows could equally run as a vmapped batch where
  dependencies allow.

TPU framing: the window march is the sequential axis; throughput scaling
comes from batching independent sequences/sessions (vmap over the window
solve), not from parallelizing one chain.
"""

from __future__ import annotations

import dataclasses
import os
import time as _time

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
from libwave_tpu.geometry.se3 import SE3
from libwave_tpu.optim import schur
from libwave_tpu.pipelines.euroc_vio import (
    EurocVIOParams,
    _camera_P_mats,
    _preintegrate_intervals,
    _track_bank,
    _triangulate_gated,
)
from libwave_tpu.pipelines.vio import VIOConfig, VIOProblem, VIOState, solve_vio
from libwave_tpu.sim.vo_dataset import q_BC as default_q_BC

__all__ = ["WindowedVIOParams", "run_euroc_vio_windowed"]


@dataclasses.dataclass(frozen=True)
class WindowedVIOParams:
    window: int = 100  # keyframes per window
    overlap: int = 10  # keyframes shared with (frozen from) the previous

    def validate(self):
        if self.overlap < 1 or self.overlap >= self.window:
            raise ValueError("need 1 <= overlap < window")


def _quat_to_rot_np(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _quat_mult_np(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def _dead_reckon_np(q0, p0, v0, dq, dp, dv, dt, g):
    """Host-side IMU dead-reckoning (the init path runs per window on the
    host; numpy avoids per-step device dispatches through the TPU tunnel).
    Returns (L+1, ...) chains including the start state."""
    L = len(dt)
    qs = np.zeros((L + 1, 4))
    ps = np.zeros((L + 1, 3))
    vs = np.zeros((L + 1, 3))
    qs[0], ps[0], vs[0] = q0, p0, v0
    for i in range(L):
        R = _quat_to_rot_np(qs[i])
        ps[i + 1] = ps[i] + vs[i] * dt[i] + 0.5 * g * dt[i] ** 2 + R @ dp[i]
        vs[i + 1] = vs[i] + g * dt[i] + R @ dv[i]
        q = _quat_mult_np(qs[i], dq[i])
        qs[i + 1] = q / np.linalg.norm(q)
    return qs, ps, vs


def _pad_shift_masks(ell: schur.EllLayout, s_target: int) -> schur.EllLayout:
    s = ell.shift_masks.shape[0]
    if s == s_target:
        return ell
    pad = jnp.zeros((s_target - s,) + ell.shift_masks.shape[1:],
                    ell.shift_masks.dtype)
    return ell._replace(shift_masks=jnp.concatenate([ell.shift_masks, pad]))


def run_euroc_vio_windowed(
    root: str,
    params: EurocVIOParams = EurocVIOParams(),
    wparams: WindowedVIOParams = WindowedVIOParams(),
    cfg: VIOConfig | None = None,
    K: np.ndarray | None = None,
    tracks: np.ndarray | None = None,
    checkpoint_dir: str | None = None,
    stop_after_windows: int | None = None,
):
    """Windowed VIO over an EuRoC (ASL) sequence of arbitrary length.

    Ground truth enters only through the very first window's initial state
    (q0, p0, v0) and the final ATE scoring; every later window chains off
    the previous solution. Returns ``(est Trajectory, report dict)``.

    ``checkpoint_dir``: snapshot the chain state after every solved window
    (atomic npz via ``utils.checkpoint``); a rerun with the same arguments
    resumes from the last completed window — the crash-recovery story for
    multi-hour sequences (SURVEY §5.3-5.4: the reference never checkpoints
    solver state). ``stop_after_windows`` stops the chain early (fault
    injection in tests; incremental processing in production) — the report
    then carries ``completed=False`` and ATE over the solved prefix.
    """
    wparams.validate()
    imu = load_euroc_imu(root)
    gt = load_euroc_ground_truth(root)
    cam_times, _ = load_euroc_camera_index(root)
    if tracks is None:
        tracks = load_euroc_tracks(root)

    N = len(cam_times)
    if params.max_keyframes and N > params.max_keyframes:
        N = params.max_keyframes
        cam_times = cam_times[:N]
    W = min(wparams.window, N)
    step = W - wparams.overlap

    pim_stack, sqrt_infos = _preintegrate_intervals(imu, cam_times, N, params)
    pim_np = jax.tree.map(np.asarray, pim_stack)

    Kmat = EUROC_CAM0_K if K is None else K
    qbc = np.asarray(default_q_BC(np.float64))
    g_vec = np.array([0.0, 0.0, -9.81])

    # window starts: march by `step`, clamp the last to end exactly at N
    starts = list(range(0, max(N - W, 0) + 1, step))
    if starts[-1] != N - W:
        starts.append(N - W)

    # pass 1: per-window track banks + global padding dimensions (layout
    # only — initialization is sequential and happens in pass 2)
    banks = []
    for s in starts:
        pose_idx, lm_idx, uv, M = _track_bank(
            tracks, W, params.min_track_length, frame_offset=s
        )
        banks.append((pose_idx, lm_idx, uv, M))
    M_pad = max(max((b[3] for b in banks), default=1), 1)
    pmax_g = 1
    for pose_idx, _, _, _ in banks:
        if len(pose_idx):
            pmax_g = max(pmax_g, int(np.bincount(pose_idx).max()))
    # common shift-pass count: layout depends only on (pose_idx, lm_idx)
    s_max = 1
    for pose_idx, lm_idx, _, M in banks:
        _, _, _, ell_probe = schur.pack_observations(
            pose_idx, lm_idx, W, M_pad, min_pmax=pmax_g
        )
        s_max = max(s_max, ell_probe.shift_masks.shape[0])

    if cfg is None:
        from libwave_tpu.pipelines.euroc_vio import default_vio_config

        cfg = default_vio_config(params)
    solve = jax.jit(lambda pr, st: solve_vio(pr, st, cfg))

    est_q = np.zeros((N, 4))
    est_p = np.zeros((N, 3))
    est_v = np.zeros((N, 3))
    est_bg = np.zeros((N, 3))
    est_ba = np.zeros((N, 3))

    gi = int(np.argmin(np.abs(gt.times - cam_times[0])))
    est_q[0] = gt.q[gi] / np.linalg.norm(gt.q[gi])
    est_p[0] = gt.p[gi]
    est_v[0] = gt.v[gi]

    solved_upto = 1  # states [0, solved_upto) are final
    window_costs = []
    window_times = []
    t_solve = 0.0
    windows_done = 0
    ckpt_path = None
    if checkpoint_dir is not None:
        from libwave_tpu.utils.checkpoint import (
            load_checkpoint,
            save_checkpoint,
        )

        os.makedirs(checkpoint_dir, exist_ok=True)
        ckpt_path = os.path.join(checkpoint_dir, "windowed_vio.npz")
        if os.path.exists(ckpt_path):
            like = {
                "est_q": est_q, "est_p": est_p, "est_v": est_v,
                "est_bg": est_bg, "est_ba": est_ba,
                "solved_upto": np.asarray(0),
                "windows_done": np.asarray(0),
                "window_costs": np.zeros(len(starts)),
            }
            snap = load_checkpoint(ckpt_path, like)
            windows_done = int(snap["windows_done"])
            solved_upto = int(snap["solved_upto"])
            est_q[:] = np.asarray(snap["est_q"])
            est_p[:] = np.asarray(snap["est_p"])
            est_v[:] = np.asarray(snap["est_v"])
            est_bg[:] = np.asarray(snap["est_bg"])
            est_ba[:] = np.asarray(snap["est_ba"])
            window_costs = list(
                np.asarray(snap["window_costs"])[:windows_done]
            )

    resumed_at = windows_done
    stopped_early = False
    # pass 2: sequential build-and-solve — each window's initialization
    # chains off the previous window's solution
    for wi, s in enumerate(starts):
        if wi < windows_done:
            continue  # already solved (checkpoint resume)
        pose_idx, lm_idx, uv, M = banks[wi]
        frozen = max(solved_upto - s, 1)

        # initial window states: frozen head from the chain, dead-reckoned
        # tail from the last frozen state, biases carried forward
        a = s + frozen - 1  # last frozen global index
        qs, ps, vs = _dead_reckon_np(
            est_q[a], est_p[a], est_v[a],
            pim_np.dq[a : s + W - 1], pim_np.dp[a : s + W - 1],
            pim_np.dv[a : s + W - 1], pim_np.dt_total[a : s + W - 1],
            g_vec,
        )
        q0 = np.concatenate([est_q[s:a], qs])
        p0 = np.concatenate([est_p[s:a], ps])
        v0 = np.concatenate([est_v[s:a], vs])
        bg0 = np.broadcast_to(est_bg[a], (W, 3)).copy()
        ba0 = np.broadcast_to(est_ba[a], (W, 3)).copy()

        # local triangulation + gating off the initialized chain
        P_mats = _camera_P_mats(q0, p0, Kmat, qbc)
        if M > 0:
            lm_init, inlier = _triangulate_gated(
                P_mats, pose_idx, lm_idx, uv, M,
                params.outlier_gate_px, params.gate_rounds,
            )
            cnt = np.bincount(lm_idx[inlier], minlength=M)
            inlier &= cnt[lm_idx] >= 2
            weight = inlier.astype(np.float64)
        else:
            lm_init = np.zeros((0, 3))
            weight = np.zeros(0)

        lm0 = np.zeros((M_pad, 3))
        lm0[:M] = lm_init

        pose_ell, lm_ell, pad_mask, ell, uv_p, w_p = schur.pack_observations(
            pose_idx, lm_idx, W, M_pad, uv, weight, min_pmax=pmax_g
        )
        ell = _pad_shift_masks(ell, s_max)

        free = np.ones((W, 15))
        free[:frozen, :] = 0.0

        problem = VIOProblem(
            K=jnp.asarray(Kmat),
            pose_idx=pose_ell,
            lm_idx=lm_ell,
            uv=jnp.asarray(uv_p),
            obs_weight=jnp.asarray(w_p) * pad_mask,
            pim=jax.tree.map(lambda x: x[s : s + W - 1], pim_stack),
            imu_i=jnp.arange(W - 1, dtype=jnp.int32),
            imu_j=jnp.arange(1, W, dtype=jnp.int32),
            imu_sqrt_info=sqrt_infos[s : s + W - 1],
            bias_walk_sqrt_info=jnp.full((6,), params.bias_walk_sqrt_info),
            bias_prior_sqrt_info=jnp.concatenate([
                jnp.full((3,), params.bias_prior_gyro),
                jnp.full((3,), params.bias_prior_accel),
            ]),
            ell=ell,
            free_pose=jnp.asarray(free),
            q_BC=jnp.asarray(qbc),
            pixel_sigma=params.pixel_sigma,
        )
        state0 = VIOState(
            q=jnp.asarray(q0), p=jnp.asarray(p0), v=jnp.asarray(v0),
            bg=jnp.asarray(bg0), ba=jnp.asarray(ba0), lm=jnp.asarray(lm0),
        )
        t0 = _time.perf_counter()
        state, info = solve(problem, state0)
        jax.block_until_ready(state)
        window_times.append(_time.perf_counter() - t0)
        t_solve += window_times[-1]
        window_costs.append(float(info["final_cost"]))
        frozen = max(solved_upto - s, 1)
        est_q[s + frozen : s + W] = np.asarray(state.q)[frozen:]
        est_p[s + frozen : s + W] = np.asarray(state.p)[frozen:]
        est_v[s + frozen : s + W] = np.asarray(state.v)[frozen:]
        est_bg[s + frozen : s + W] = np.asarray(state.bg)[frozen:]
        est_ba[s + frozen : s + W] = np.asarray(state.ba)[frozen:]
        solved_upto = s + W
        windows_done = wi + 1
        if ckpt_path is not None:
            costs_arr = np.zeros(len(starts))
            costs_arr[: len(window_costs)] = window_costs
            save_checkpoint(ckpt_path, {
                "est_q": est_q, "est_p": est_p, "est_v": est_v,
                "est_bg": est_bg, "est_ba": est_ba,
                "solved_upto": np.asarray(solved_upto),
                "windows_done": np.asarray(windows_done),
                "window_costs": costs_arr,
            })
        if (stop_after_windows is not None
                and windows_done - resumed_at >= stop_after_windows
                and windows_done < len(starts)):
            stopped_early = True
            break

    n_solved = solved_upto if stopped_early else N
    t0c = float(cam_times[0])
    gt_traj = Trajectory(
        times=jnp.asarray(np.asarray(gt.times, np.float64) - t0c),
        poses=SE3(q=jnp.asarray(gt.q), t=jnp.asarray(gt.p)),
    )
    kf_rel = jnp.asarray(np.asarray(cam_times[:n_solved], np.float64) - t0c)
    est = Trajectory(
        times=kf_rel,
        poses=SE3(
            q=jnp.asarray(est_q[:n_solved]), t=jnp.asarray(est_p[:n_solved])
        ),
    )
    ate, err = absolute_trajectory_error(gt_traj, est)
    rpe_t, rpe_r, _ = relative_pose_error(gt_traj, est, delta=1)
    if len(window_times) > 1:
        t_steady = t_solve - (
            window_times[0] - float(np.median(window_times[1:]))
        )
    else:
        t_steady = t_solve
    n_timed = n_solved if window_times else 0
    report = {
        "ate_rmse": float(ate),
        "rpe_trans_rmse": float(rpe_t),
        "rpe_rot_rmse": float(rpe_r),
        "per_pose_error": np.asarray(err),
        "num_keyframes": N,
        "num_keyframes_solved": n_solved,
        "completed": not stopped_early,
        "num_windows": len(starts),
        "windows_done": windows_done,
        "window": W,
        "overlap": wparams.overlap,
        "window_final_costs": window_costs,
        "solve_seconds": t_solve,
        # the first window's time includes the (single) jit compile; the
        # steady-state rate replaces it with the median of the rest
        "solve_keyframes_per_s": n_timed / max(t_steady, 1e-9),
        "solve_keyframes_per_s_including_compile": n_timed / max(
            t_solve, 1e-9
        ),
        "num_landmarks_padded": M_pad,
    }
    return est, report
