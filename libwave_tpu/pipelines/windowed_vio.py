"""Sliding-window VIO: bounded-memory solves for north-star-length sequences.

The full-batch ``pipelines.euroc_vio`` solve keeps every keyframe in one
factor graph — right for short calibration-grade runs, but an MH_01-scale
sequence (~3,700 frames) needs bounded windows. The reference bounds only
the *tracker* this way (window_size purge, wave_vision/include/wave/vision/
tracker/impl/tracker.hpp:90-101) and leaves its solvers global; here the
solver itself windows:

- fixed-size keyframe windows with ``overlap`` shared keyframes, marching
  down the sequence by ``window - overlap``;
- **marginalization mode (default)**: after each window solves, the
  out-of-window states (and their factors) are Schur-complement
  marginalized onto the overlap states (optim.marginalization); the next
  window carries that dense prior on its head states
  (pipelines.vio.VIOProblem.prior_Lambda) with everything free — a
  fixed-lag smoother that retains the information a global solve would
  keep. Every measurement is counted exactly once across the chain: the
  marginalized factor set is the incoming prior + the FULL live tracks of
  every landmark touching an out-frame (their overlap-frame observations
  included — so cross-boundary baselines survive in the prior, and those
  observations are excluded from the next window, see _marg_obs_split) +
  IMU / bias-walk intervals up to the overlap boundary; overlap-only
  landmarks and overlap intervals flow into the next window instead;
- **freeze mode (ablation)**: the round-3 behavior — the head keyframes
  are hard-frozen at the previous window's estimates, a prior-free anchor
  that discards the overlap information (bounded-drift odometry);
- bias estimates carry forward as the next window's initialization;
- every window is padded to common (Pmax, M, shift-pass) dimensions, so
  ONE jit-compiled solve executable and ONE reduced-Hessian executable
  serve the whole sequence — no per-window retracing. In marginalization
  mode window starts stay exactly ``step`` apart (the final window is
  padded with pinned zero-information dummy frames past the sequence end)
  so the marginalized keep-set always aligns with the next head.

TPU framing: the window march is the sequential axis; throughput scaling
comes from batching independent sequences/sessions (vmap over the window
solve), not from parallelizing one chain. The marginalization complement
runs on device by default on TPU backends (pulling only the prior block
through the runtime; WindowedVIOParams.marg_device) with the host-f64
path of optim.marginalization as the precision reference.
"""

from __future__ import annotations

import dataclasses
import os
import sys
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
from libwave_tpu.optim.marginalization import psd_project, schur_marginalize
from libwave_tpu.pipelines.euroc_vio import (
    EurocVIOParams,
    _camera_P_mats,
    _preintegrate_intervals,
    _track_bank,
    _triangulate_gated,
)
from libwave_tpu.pipelines.vio import (
    VIOConfig,
    VIOProblem,
    VIOState,
    solve_vio,
    vio_reduced_hessian,
)
from libwave_tpu.sim.vo_dataset import q_BC as default_q_BC

__all__ = ["WindowedVIOParams", "run_euroc_vio_windowed"]

D = 15  # keyframe tangent dim


@dataclasses.dataclass(frozen=True)
class WindowedVIOParams:
    window: int = 100  # keyframes per window
    overlap: int = 10  # keyframes shared with the previous window
    # "marginalize": carry the out-of-window information forward as a
    # Schur-complement prior on the overlap (fixed-lag smoother);
    # "freeze": hard-anchor the overlap at the previous estimates (the
    # bounded-drift ablation baseline).
    mode: str = "marginalize"
    # window-0 prior information on the first keyframe's 15 tangent dims
    # (the soft equivalent of freezing the initial state at its given
    # value; 1e8 = sigma 1e-4)
    anchor_info: float = 1e8
    # What happens to the overlap-frame observations of a landmark whose
    # track is being marginalized (it also has out-frame observations):
    #   "split"     — half their information enters the marginalization,
    #                 half carries into the next window's fresh variable;
    #                 totals exactly 1.0 across the chain and keeps BOTH
    #                 the out<->overlap and overlap<->tail vision ties;
    #   "exclusive" — all into the marginalization, excluded from the next
    #                 window (severs the overlap<->tail tie of
    #                 boundary-spanning tracks);
    #   "duplicate" — all into both (double-counts those observations;
    #                 diagnostic only).
    boundary_obs: str = "split"
    # Marginal-prior regularization against fixed-lag inconsistency: the
    # prior's Lambda/b are linearized at each window's solution and never
    # re-linearized, so their errors (growing with chain-drift) enter as
    # confidently-wrong information that fresh windows cannot bend back.
    # ``prior_scale`` < 1 inflates the carried covariance (treating
    # linearization error as process noise); ``prior_gradient=False``
    # additionally drops the carried gradient b (prior centered exactly
    # at the previous solution).
    prior_scale: float = 1.0
    prior_gradient: bool = True
    # Where the Schur complement runs: None = auto (on device when the
    # backend is a TPU — pulling only the (O*15)^2 prior instead of the
    # full (W*15)^2 Hessian through the runtime; measured 99 s -> ~1 s of
    # transfer at MH_01 scale), True/False to force. The host path does
    # the complement in f64 — keep it for un-capped stiff chains where
    # f32 cancellation headroom matters (see bench_euroc_mh01_scale).
    marg_device: bool | None = None
    # Forward passes of the whole window chain (iterated fixed-lag
    # smoothing). Pass p>1 re-runs every window with its initialization
    # (and re-triangulation) taken from pass p-1's estimates, so the
    # marginal priors re-linearize at estimates that already saw up to a
    # window of future data. On weak-geometry street sequences this is
    # what closes the gap to (and past) the global batch solve: KITTI
    # drive_0036 at W=80/o=12 measures 5.9 m (1 pass) -> 4.0 (2) ->
    # 1.79 m (3 passes, converged) vs 2.80 m for the global full-batch
    # solve — the windows' tighter relinearization beats one global
    # linearization ladder. Well-conditioned sequences converge in 1.
    passes: int = 1
    # Precision of the window solves' pose-block Hessian sums + reduced
    # factorization (VIOConfig.hessian_dtype). "auto" (default) widens to
    # f64 when the IMU whitening is stiff (max |imu_sqrt_info| > 3e4 —
    # e.g. 20 Hz keyframes, where f32 summation annihilates the vision
    # information and windows silently diverge); None forces pure f32;
    # "float64" forces the widened path. The widening also applies to the
    # carried marginal prior so its weak directions survive the chain.
    hessian_dtype: str | None = "auto"
    # Adaptive iteration allocation: each window solves in chunks of
    # ``solve_iters_chunk`` LM iterations (one jitted scan per chunk, the
    # trust-region lambda carried across chunks) up to
    # ``solve_chunks_max`` chunks, stopping early once a whole chunk
    # improves the cost by less than ``solve_rel_tol`` relative. Why:
    # on stiff (f64-widened) chains each iteration pays a ~0.2 s f64
    # factorization; pass-1 windows converge in ~20 iterations while
    # pass-2 windows (initialized from the previous pass's stitched
    # estimates, whose whitened IMU discontinuities start the cost at
    # ~1e9) legitimately need ~40 — a fixed budget either wastes half
    # the factorizations or truncates the damped descent (measured: 25
    # fixed iterations left pass-2 windows unconverged, ATE 0.16 vs
    # 0.05 at 40 on the 45 s stiff sequence).
    solve_iters_chunk: int = 12
    solve_chunks_max: int = 4
    solve_rel_tol: float = 1e-3
    # Window-padding bucketing for heterogeneous sequences: every window
    # pads to common (landmark-count, obs-per-pose, shift-pass) dims so
    # solves share executables; with a single global bucket one dense
    # window inflates EVERY window's solve. pad_percentile < 100 builds
    # TWO buckets — a "typical" bucket sized at this percentile of the
    # per-window dims and an overflow bucket at the global max — costing
    # one extra jit compile while typical windows solve at their own
    # scale. 100 (default) keeps the single global bucket.
    pad_percentile: float = 100.0

    def validate(self):
        if self.overlap < 1 or self.overlap >= self.window:
            raise ValueError("need 1 <= overlap < window")
        if self.mode == "marginalize" and self.overlap > self.window // 2:
            # each frame must live in at most 2 consecutive windows: the
            # boundary-observation exclusion bookkeeping (excl_pairs) only
            # carries one window back, so overlap > window/2 would let a
            # half-weighted marginalized observation re-enter a third
            # window at full weight (double-counted information)
            raise ValueError(
                "marginalize mode needs overlap <= window // 2 (frames "
                "must span at most 2 windows for exact information "
                "accounting)"
            )
        if self.mode not in ("marginalize", "freeze"):
            raise ValueError("mode must be marginalize | freeze")
        if self.boundary_obs not in ("split", "exclusive", "duplicate"):
            raise ValueError(
                "boundary_obs must be split | exclusive | duplicate"
            )
        if self.hessian_dtype not in (None, "auto", "float64"):
            raise ValueError("hessian_dtype must be None | auto | float64")
        if not 1.0 <= self.pad_percentile <= 100.0:
            raise ValueError("pad_percentile must be in (1, 100]")


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


def _excluded_mask(frames_global, raw_ids, excl_pairs):
    """Boolean mask of observations listed in ``excl_pairs`` ((E, 2) rows
    of [global frame, original track id]) — observations the previous
    window (partially or fully) marginalized into the incoming prior."""
    if excl_pairs is None or len(excl_pairs) == 0 or len(raw_ids) == 0:
        return np.zeros(len(raw_ids), bool)
    base = int(max(raw_ids.max(), excl_pairs[:, 1].max())) + 1
    key = frames_global.astype(np.int64) * base + raw_ids.astype(np.int64)
    excl_key = excl_pairs[:, 0] * base + excl_pairs[:, 1]
    return np.isin(key, excl_key)


def _marg_obs_split(pose_idx, lm_idx, raw_ids, weight, W, O, s,
                    boundary_obs="split"):
    """Full-track marginalization split of a window's observation bank.

    A landmark with any live observation at an out-frame (local index
    < W - O) is *owned by the marginalization*: its live observations —
    including those at overlap frames — enter the marginalization Hessian,
    so cross-boundary baselines survive in the prior. What its
    overlap-frame observations do NEXT is ``boundary_obs``
    (WindowedVIOParams): "split" gives them weight 1/2 here and 1/2 in the
    next window (information totals 1.0 across the chain while keeping
    both the out<->overlap and overlap<->tail ties); "exclusive" puts them
    fully here and drops them from the next window; "duplicate"
    double-counts (diagnostic). Landmarks seen only in the overlap flow to
    the next window untouched.

    Returns ``(w_marg, pairs_next)`` where ``pairs_next`` are (E, 2)
    [global frame, raw id] rows the NEXT window must down-weight (by the
    mode's reuse factor).
    """
    if len(lm_idx) == 0:
        return np.zeros(0), np.zeros((0, 2), np.int64)
    M = int(lm_idx.max()) + 1
    live = weight > 0
    out = pose_idx < W - O
    has_out = np.zeros(M, bool)
    has_out[lm_idx[live & out]] = True
    w_marg = weight * has_out[lm_idx]
    selx = live & ~out & has_out[lm_idx]
    if boundary_obs == "split":
        w_marg = np.where(selx, 0.5 * w_marg, w_marg)
    pairs = np.stack(
        [pose_idx[selx].astype(np.int64) + s,
         raw_ids[selx].astype(np.int64)], axis=1,
    )
    if boundary_obs == "duplicate":
        pairs = np.zeros((0, 2), np.int64)
    return w_marg, pairs


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

    ``checkpoint_dir``: snapshot the chain state (estimates + the marginal
    prior) after every solved window (atomic npz via ``utils.checkpoint``);
    a rerun with the same arguments resumes from the last completed window
    — the crash-recovery story for multi-hour sequences (SURVEY §5.3-5.4:
    the reference never checkpoints solver state). ``stop_after_windows``
    stops the chain early (fault injection in tests; incremental
    processing in production) — the report then carries ``completed=False``
    and ATE over the solved prefix.
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
    # clamp for short sequences: a sequence at or below the overlap still
    # degrades to a single window instead of a zero/negative step
    O = min(wparams.overlap, W - 1) if W > 1 else 0
    step = max(W - O, 1)
    marg = wparams.mode == "marginalize" and O >= 1

    pim_stack, sqrt_infos = _preintegrate_intervals(imu, cam_times, N, params)

    # window starts. Marginalization mode keeps starts exactly `step`
    # apart (the marginalized keep-set must align with the next window's
    # head) and pads the final window past the sequence end with pinned
    # dummy frames; freeze mode clamps the last start to end at N.
    if N <= W:
        starts = [0]
    elif marg:
        n_win = int(np.ceil((N - W) / step)) + 1
        starts = [i * step for i in range(n_win)]
    else:
        starts = list(range(0, N - W + 1, step))
        if starts[-1] != N - W:
            starts.append(N - W)
    N_ext = starts[-1] + W
    if N_ext > N:  # pad interval stacks with zero-information dummies
        pad = N_ext - N
        pad_pim = jax.tree.map(
            lambda x: jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]
            ),
            pim_stack,
        )
        pim_stack = pad_pim._replace(
            dq=pad_pim.dq.at[N - 1 :, 0].set(1.0)
        )
        sqrt_infos = jnp.concatenate(
            [sqrt_infos, jnp.zeros((pad, 9, 9), sqrt_infos.dtype)]
        )
    pim_np = jax.tree.map(np.asarray, pim_stack)

    Kmat = EUROC_CAM0_K if K is None else K
    qbc = np.asarray(default_q_BC(np.float64))
    g_vec = np.array([0.0, 0.0, -9.81])

    # pass 1: per-window track banks + global padding dimensions (layout
    # only — initialization is sequential and happens in pass 2)
    banks = []
    for s in starts:
        banks.append(_track_bank(
            tracks, min(W, N - s), params.min_track_length, frame_offset=s,
            return_raw=True,
        ))
    Ms = [max(b[3], 1) for b in banks]
    pmaxs = [
        max(int(np.bincount(b[0]).max()), 1) if len(b[0]) else 1
        for b in banks
    ]
    M_pad = max(Ms)
    pmax_g = max(pmaxs)
    # Bucketed padding (pad_percentile < 100): typical windows solve at a
    # percentile-sized bucket; only outlier-dense windows pay the global
    # max (their own executable). One extra compile, no accuracy change —
    # padding rows are zero-weight either way.
    if wparams.pad_percentile < 100.0 and len(banks) >= 2:
        M_small = int(np.ceil(np.percentile(Ms, wparams.pad_percentile)))
        pmax_small = int(
            np.ceil(np.percentile(pmaxs, wparams.pad_percentile))
        )
        win_dims = [
            (M_small, pmax_small)
            if Ms[i] <= M_small and pmaxs[i] <= pmax_small
            else (M_pad, pmax_g)
            for i in range(len(banks))
        ]
    else:
        win_dims = [(M_pad, pmax_g)] * len(banks)
    # common shift-pass count PER BUCKET: layout depends only on
    # (pose_idx, lm_idx) and the bucket's pmax
    s_max_by_bucket = {}
    for (pose_idx, lm_idx, *_), dims in zip(banks, win_dims):
        _, _, _, ell_probe = schur.pack_observations(
            pose_idx, lm_idx, W, dims[0], min_pmax=dims[1]
        )
        s_max_by_bucket[dims] = max(
            s_max_by_bucket.get(dims, 1), ell_probe.shift_masks.shape[0]
        )

    # stiffness-gated Hessian widening (see WindowedVIOParams): at 20 Hz
    # keyframe rates the per-interval whitening reaches ~2.6e4 (Hessian
    # entries ~7e8) and f32 summation annihilates the ~1e2 vision
    # information — the widened path restores CPU-f64 parity at true
    # noise densities (no "information capping" needed).
    hdt = wparams.hessian_dtype
    if hdt == "auto":
        # measured whitening maxima on the ASL sim: 5 Hz keyframes 1.9e4
        # (f32 chain verified accurate in r4: 651-kf ATE 0.0228), 10 Hz
        # 5.5e4, 20 Hz 1.5e5 (f32 silently diverges) — gate between them
        stiff = float(np.max(np.abs(np.asarray(sqrt_infos[: max(N - 1, 1)]))))
        hdt = "float64" if stiff > 3e4 else None
    pdt = jnp.float64 if hdt == "float64" else None

    if cfg is None:
        from libwave_tpu.pipelines.euroc_vio import default_vio_config

        cfg = default_vio_config(params)
    if hdt is not None and cfg.hessian_dtype is None:
        cfg = dataclasses.replace(cfg, hessian_dtype=hdt)
    # chunked adaptive iterations (see WindowedVIOParams): the jitted
    # chunk runs solve_iters_chunk LM iterations; the host loop in
    # _solve_adaptive re-invokes it (lambda carried) until a chunk stops
    # paying or the chunk budget is exhausted
    cfg_chunk = dataclasses.replace(
        cfg, max_iterations=wparams.solve_iters_chunk
    )
    solve_chunk = jax.jit(
        lambda pr, st, lam: solve_vio(pr, st, cfg_chunk, lam0=lam)
    )

    def solve(pr, st):
        lam = cfg.init_lambda
        info = None
        prev = None
        for _ in range(max(wparams.solve_chunks_max, 1)):
            st, ci = solve_chunk(pr, st, lam)
            lam = ci["final_lambda"]
            cost = float(ci["final_cost"])
            if info is None:
                info = dict(ci)
                prev = float(ci["initial_cost"])
            else:
                info["final_cost"] = ci["final_cost"]
                info["accepted"] = jnp.concatenate(
                    [info["accepted"], ci["accepted"]]
                )
                info["costs"] = jnp.concatenate(
                    [info["costs"], ci["costs"]]
                )
            if prev - cost <= wparams.solve_rel_tol * abs(cost):
                break
            prev = cost
        return st, info

    # jitted per-component cost decomposition for WAVE_DEBUG_WINDOWS
    @jax.jit
    def _dbg_parts(pr, st):
        from libwave_tpu.optim.reprojection import (
            reprojection_residual_ell as _rre,
        )
        from libwave_tpu.pipelines import vio as _vio

        q_cam = _vio._camera_quats(pr, st.q)
        r, valid = _rre(
            pr.K, q_cam, st.p, st.lm,
            pr.lm_idx.reshape(W, -1),
            pr.uv.T.reshape(2, W, -1),
        )
        wf = pr.obs_weight.reshape(W, -1)
        n_viol = jnp.sum(wf * (~valid))
        wv = wf * valid
        c_vis = 0.5 * jnp.sum(
            wv * (r[0] ** 2 + r[1] ** 2) / params.pixel_sigma**2
        )
        ri, _, _ = _vio._imu_linearize(pr, st, None)
        c_imu = 0.5 * jnp.sum(ri * ri)
        c_pri = (
            _vio._prior_cost(pr, st)
            if pr.prior_Lambda is not None else jnp.float32(0)
        )
        return n_viol, c_vis, c_imu, c_pri

    P = O * D
    prior_Lambda = np.zeros((P, P))
    prior_b = np.zeros(P)
    if marg:
        from libwave_tpu.ops.segmm import on_tpu_backend

        marg_dev = (
            wparams.marg_device if wparams.marg_device is not None
            else on_tpu_backend()
        )
        if marg_dev:
            from libwave_tpu.pipelines.vio import vio_marginalize_device

            red_hess = jax.jit(
                lambda pr, st: vio_marginalize_device(
                    pr, st, P, params.huber_delta, cfg.hessian_dtype
                )
            )
        else:
            red_hess = jax.jit(
                lambda pr, st: vio_reduced_hessian(
                    pr, st, params.huber_delta, cfg.hessian_dtype
                )
            )
        red_hess_host = None  # lazy host-f64 fallback (device NaN guard)
        # Per-keyframe bias-prior mask for the MARGINALIZATION problem:
        # only out-frames' zero-mean bias priors enter the carried prior.
        # Keep/overlap frames continue into the next window, where their
        # bias prior is applied directly — including them here too would
        # double-count that information across the chain (every factor
        # counted exactly once; advisor r4 finding).
        bias_out_mask = np.zeros((W, 1))
        bias_out_mask[: W - O] = 1.0
        bias_out_mask_j = jnp.asarray(bias_out_mask)
        # factors entering the marginalization: IMU/bias intervals up to
        # the overlap boundary only (the overlap's own intervals belong to
        # the next window)
        imu_marg_mask = np.ones(W - 1)
        imu_marg_mask[W - O :] = 0.0
        imu_marg_mask_j = jnp.asarray(imu_marg_mask)[:, None, None]
        # window-0 prior: anchor the very first keyframe
        prior_Lambda[:D, :D] = wparams.anchor_info * np.eye(D)
    prior0_Lambda = prior_Lambda.copy()

    est_q = np.zeros((N, 4))
    est_p = np.zeros((N, 3))
    est_v = np.zeros((N, 3))
    est_bg = np.zeros((N, 3))
    est_ba = np.zeros((N, 3))

    gi = int(np.argmin(np.abs(gt.times - cam_times[0])))
    est_q[0] = gt.q[gi] / np.linalg.norm(gt.q[gi])
    est_p[0] = gt.p[gi]
    est_v[0] = gt.v[gi]

    solved_upto = 1  # states [0, solved_upto) are final (current pass)
    excl_pairs = np.zeros((0, 2), np.int64)  # marginalized (frame, id) obs
    window_costs = []
    window_times = []
    t_solve = 0.0
    t_marg = 0.0
    windows_done = 0
    pass_done = 0
    n_passes = wparams.passes if marg else 1
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
                "prior_Lambda": prior_Lambda,
                "prior_b": prior_b,
                "excl_pairs": excl_pairs,
                "pass_done": np.asarray(0),
            }
            snap = load_checkpoint(ckpt_path, like)
            windows_done = int(snap["windows_done"])
            pass_done = int(snap["pass_done"])
            solved_upto = int(snap["solved_upto"])
            est_q[:] = np.asarray(snap["est_q"])
            est_p[:] = np.asarray(snap["est_p"])
            est_v[:] = np.asarray(snap["est_v"])
            est_bg[:] = np.asarray(snap["est_bg"])
            est_ba[:] = np.asarray(snap["est_ba"])
            prior_Lambda = np.asarray(snap["prior_Lambda"])
            prior_b = np.asarray(snap["prior_b"])
            excl_pairs = np.asarray(snap["excl_pairs"]).reshape(-1, 2)
            window_costs = list(
                np.asarray(snap["window_costs"])[:windows_done]
            )
            if windows_done >= len(starts) and pass_done + 1 < n_passes:
                # the checkpoint finished a pass; resume into the next
                pass_done += 1
                windows_done = 0
                solved_upto = 1
                excl_pairs = np.zeros((0, 2), np.int64)
                prior_Lambda = prior0_Lambda.copy()
                prior_b = np.zeros(P)
                window_costs = []

    resumed_pass = pass_done
    resumed_at = windows_done
    kf_solved_run = 0
    windows_run = 0
    stopped_early = False
    # sequential build-and-solve — each window's initialization chains off
    # the previous window's solution; later passes (iterated fixed-lag
    # smoothing) re-run the chain initialized from the previous pass
    prev_q = prev_p = prev_v = prev_bg = prev_ba = None
    for pass_idx in range(resumed_pass, n_passes):
      if pass_idx > resumed_pass:  # fresh pass state (estimates carry)
        solved_upto = 1
        windows_done = 0
        excl_pairs = np.zeros((0, 2), np.int64)
        prior_Lambda = prior0_Lambda.copy()
        prior_b = np.zeros(P)
        window_costs = []
      if pass_idx >= 1:
        # Snapshot the previous pass's estimates: later windows initialize
        # their tails from these (gauge-aligned at the seam, below) while
        # ``est_*`` is progressively overwritten by THIS pass's solutions.
        # (On a checkpoint resume into a later pass, ``est_*`` may already
        # be partially this-pass — the snapshot is then approximate for
        # the already-solved prefix, which is never read as tail init.)
        prev_q, prev_p, prev_v = est_q.copy(), est_p.copy(), est_v.copy()
        prev_bg, prev_ba = est_bg.copy(), est_ba.copy()
      for wi, s in enumerate(starts):
        if wi < windows_done:
            continue  # already solved (checkpoint resume)
        pose_idx, lm_idx, uv, M, raw_ids = banks[wi]
        M_pad_w, pmax_w = win_dims[wi]
        s_max_w = s_max_by_bucket[win_dims[wi]]
        nreal = min(W, N - s)  # real (non-dummy) frames this window
        head = max(min(solved_upto - s, W), 1)

        # initial window states: head from the chain (= the prior mean in
        # marginalization mode); the tail is dead-reckoned from the last
        # head state on pass 0 and taken from the previous pass's
        # estimates afterwards (frames >= solved_upto still hold them)
        a = s + head - 1  # last chained global index
        if pass_idx == 0:
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
            bg0[: a - s] = est_bg[s:a]
            ba0[: a - s] = est_ba[s:a]
        else:
            # Iterated-smoothing init: the head ([0, head)) comes from THIS
            # pass's chain; the tail comes from the PREVIOUS pass's
            # estimates — but gauge-aligned first. The two passes drift in
            # the unobservable directions (global position + yaw)
            # independently, so raw prev-pass tails sit a growing seam
            # discontinuity away from the pass-2 head; with stiff IMU
            # whitening (~2.6e4 at 20 Hz) a centimeter seam starts the
            # window at cost ~1e9 pulling against a ~7e8-information
            # marginal prior — the long-chain pass-2 regression. A 4-DoF
            # (yaw about gravity + translation) transform computed at the
            # seam frame maps the prev-pass tail into this pass's gauge,
            # keeping its *shape* (the future information iterated
            # smoothing is after) while removing the seam entirely.
            a0 = s + min(head, nreal) - 1  # seam: last this-pass frame
            R2 = _quat_to_rot_np(est_q[a0])
            R1 = _quat_to_rot_np(prev_q[a0])
            R_rel = R2 @ R1.T
            dyaw = np.arctan2(R_rel[1, 0], R_rel[0, 0])
            cz, sz = np.cos(dyaw), np.sin(dyaw)
            Rz = np.array([[cz, -sz, 0.0], [sz, cz, 0.0], [0.0, 0.0, 1.0]])
            qz = np.array(
                [np.cos(dyaw / 2), 0.0, 0.0, np.sin(dyaw / 2)]
            )
            dp = est_p[a0] - Rz @ prev_p[a0]

            def _tail(arr, rot=None, shift=None, quat=False):
                seg = arr[s : s + nreal].copy()
                if quat:
                    seg = np.stack([_quat_mult_np(qz, qk) for qk in seg])
                    seg /= np.linalg.norm(seg, axis=1, keepdims=True)
                elif rot is not None:
                    seg = seg @ rot.T
                    if shift is not None:
                        seg = seg + shift
                return np.concatenate([
                    seg, np.tile(seg[-1], (W - nreal, 1))
                ])
            q0 = _tail(prev_q, quat=True)
            p0 = _tail(prev_p, rot=Rz, shift=dp)
            v0 = _tail(prev_v, rot=Rz)
            bg0, ba0 = _tail(prev_bg), _tail(prev_ba)
            h = min(head, nreal)
            q0[:h] = est_q[s : s + h]
            p0[:h] = est_p[s : s + h]
            v0[:h] = est_v[s : s + h]
            bg0[:h] = est_bg[s : s + h]
            ba0[:h] = est_ba[s : s + h]

        # local triangulation + gating off the initialized chain
        P_mats = _camera_P_mats(q0, p0, Kmat, qbc)
        if M > 0:
            lm_init, inlier = _triangulate_gated(
                P_mats, pose_idx, lm_idx, uv, M,
                params.outlier_gate_px, params.gate_rounds,
            )
            scale = np.ones(len(pose_idx))
            if marg:
                # observations the previous window marginalized into the
                # incoming prior carry only their reuse share here (0 in
                # "exclusive" mode, 1/2 in "split" — see _marg_obs_split)
                reuse = {"split": 0.5, "exclusive": 0.0,
                         "duplicate": 1.0}[wparams.boundary_obs]
                exm = _excluded_mask(pose_idx + s, raw_ids, excl_pairs)
                if reuse == 0.0:
                    inlier &= ~exm
                else:
                    scale = np.where(exm, reuse, 1.0)
            cnt = np.bincount(lm_idx[inlier], minlength=M)
            inlier &= cnt[lm_idx] >= 2
            weight = inlier * scale
        else:
            lm_init = np.zeros((0, 3))
            weight = np.zeros(0)

        lm0 = np.zeros((M_pad_w, 3))
        lm0[:M] = lm_init

        # full-track marginalization split (see _marg_obs_split)
        if marg:
            w_marg, excl_next = _marg_obs_split(
                pose_idx, lm_idx, raw_ids, weight, W, O, s,
                wparams.boundary_obs,
            )
            (pose_ell, lm_ell, pad_mask, ell, uv_p, w_p,
             wm_p) = schur.pack_observations(
                pose_idx, lm_idx, W, M_pad_w, uv, weight, w_marg,
                min_pmax=pmax_w,
            )
        else:
            pose_ell, lm_ell, pad_mask, ell, uv_p, w_p = (
                schur.pack_observations(
                    pose_idx, lm_idx, W, M_pad_w, uv, weight,
                    min_pmax=pmax_w,
                )
            )
        ell = _pad_shift_masks(ell, s_max_w)

        free = np.ones((W, D))
        if marg:
            free[nreal:, :] = 0.0  # pin final-window dummy frames
        else:
            free[:head, :] = 0.0

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
            prior_Lambda=(
                jnp.asarray(prior_Lambda, dtype=pdt) if marg else None
            ),
            prior_b=jnp.asarray(prior_b, dtype=pdt) if marg else None,
            prior_q=jnp.asarray(q0[:O]) if marg else None,
            prior_p=jnp.asarray(p0[:O]) if marg else None,
            prior_v=jnp.asarray(v0[:O]) if marg else None,
            prior_bg=jnp.asarray(bg0[:O]) if marg else None,
            prior_ba=jnp.asarray(ba0[:O]) if marg else None,
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
        if os.environ.get("WAVE_DEBUG_WINDOWS"):
            acc = np.asarray(info["accepted"]).astype(int)
            dp_move = float(
                np.abs(np.asarray(state.p)[:nreal] - p0[:nreal]).max()
            )
            v0_, cv0, ci0, cp0 = map(float, _dbg_parts(problem, state0))
            v1_, cv1, ci1, cp1 = map(float, _dbg_parts(problem, state))
            print(
                f"[w {pass_idx}:{wi}] cost0 {float(info['initial_cost']):.4g}"
                f" cost {window_costs[-1]:.4g} acc {acc.sum()}/{len(acc)}"
                f" nobs {int((weight > 0).sum())} max|dp| {dp_move:.3f}\n"
                f"   init: viol {v0_:.0f} vis {cv0:.4g} imu {ci0:.4g}"
                f" prior {cp0:.4g}\n"
                f"   final: viol {v1_:.0f} vis {cv1:.4g} imu {ci1:.4g}"
                f" prior {cp1:.4g}",
                file=sys.stderr, flush=True,
            )

        if marg:
            # the whole window re-estimated (overlap refined by the prior)
            est_q[s : s + nreal] = np.asarray(state.q)[:nreal]
            est_p[s : s + nreal] = np.asarray(state.p)[:nreal]
            est_v[s : s + nreal] = np.asarray(state.v)[:nreal]
            est_bg[s : s + nreal] = np.asarray(state.bg)[:nreal]
            est_ba[s : s + nreal] = np.asarray(state.ba)[:nreal]
        else:
            est_q[s + head : s + W] = np.asarray(state.q)[head:]
            est_p[s + head : s + W] = np.asarray(state.p)[head:]
            est_v[s + head : s + W] = np.asarray(state.v)[head:]
            est_bg[s + head : s + W] = np.asarray(state.bg)[head:]
            est_ba[s + head : s + W] = np.asarray(state.ba)[head:]
        kf_solved_run += min(s + W, N) - max(solved_upto, s)
        solved_upto = min(s + W, N)
        windows_done = wi + 1
        windows_run += 1

        if marg and wi + 1 < len(starts):
            tm0 = _time.perf_counter()
            marg_problem = problem._replace(
                obs_weight=jnp.asarray(wm_p) * pad_mask,
                imu_sqrt_info=problem.imu_sqrt_info * imu_marg_mask_j,
                # bias priors of keep/overlap frames are excluded — they
                # are counted in the window that marginalizes them out
                bias_prior_sqrt_info=(
                    problem.bias_prior_sqrt_info[None, :] * bias_out_mask_j
                ),
            )
            if marg_dev:
                Lam, b_m = red_hess(marg_problem, state)
                Lam, b_m = np.asarray(Lam), np.asarray(b_m)
                if np.isfinite(Lam).all() and np.isfinite(b_m).all():
                    prior_Lambda, prior_b = psd_project(Lam, b_m)
                else:
                    # device Cholesky NaN'd (indefinite Hoo from roundoff
                    # on a stiff chain): fall back to the host-f64 exact
                    # complement for this window instead of corrupting
                    # the prior chain
                    if red_hess_host is None:
                        red_hess_host = jax.jit(
                            lambda pr, st: vio_reduced_hessian(
                                pr, st, params.huber_delta,
                                cfg.hessian_dtype,
                            )
                        )
                    H, b = red_hess_host(marg_problem, state)
                    prior_Lambda, prior_b = schur_marginalize(
                        np.asarray(H), np.asarray(b), keep_dim=P
                    )
            else:
                H, b = red_hess(marg_problem, state)
                prior_Lambda, prior_b = schur_marginalize(
                    np.asarray(H), np.asarray(b), keep_dim=P
                )
            prior_Lambda = prior_Lambda * wparams.prior_scale
            prior_b = (
                prior_b * wparams.prior_scale
                if wparams.prior_gradient else np.zeros(P)
            )
            excl_pairs = excl_next
            t_marg += _time.perf_counter() - tm0
            if os.environ.get("WAVE_DEBUG_WINDOWS"):
                ww = np.linalg.eigvalsh(prior_Lambda)
                print(
                    f"[m {pass_idx}:{wi}] eig [{ww.min():.3g},"
                    f" {ww.max():.3g}] n<=0 {(ww <= 0).sum()}"
                    f" |b| {np.linalg.norm(prior_b):.4g}",
                    file=sys.stderr, flush=True,
                )

        if ckpt_path is not None:
            costs_arr = np.zeros(len(starts))
            costs_arr[: len(window_costs)] = window_costs
            save_checkpoint(ckpt_path, {
                "est_q": est_q, "est_p": est_p, "est_v": est_v,
                "est_bg": est_bg, "est_ba": est_ba,
                "solved_upto": np.asarray(solved_upto),
                "windows_done": np.asarray(windows_done),
                "window_costs": costs_arr,
                "prior_Lambda": prior_Lambda,
                "prior_b": prior_b,
                "excl_pairs": excl_pairs,
                "pass_done": np.asarray(pass_idx),
            })
        remaining = (
            (n_passes - 1 - pass_idx) * len(starts)
            + len(starts) - windows_done
        )
        if (stop_after_windows is not None
                and windows_run >= stop_after_windows
                and remaining > 0):
            stopped_early = True
            break
      if stopped_early:
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
    # rate metrics count only keyframes advanced in THIS run (a checkpoint
    # resume must not divide previously-solved keyframes by this run's
    # time; later smoothing passes re-count their re-solved keyframes in
    # the WINDOW-MARCH rate, while the SEQUENCE rate divides re-solves
    # back out — quote the sequence rate for end-to-end throughput)
    n_timed = kf_solved_run if window_times else 0
    passes_run = max(n_passes - resumed_pass, 1)
    report = {
        "ate_rmse": float(ate),
        "rpe_trans_rmse": float(rpe_t),
        "rpe_rot_rmse": float(rpe_r),
        "per_pose_error": np.asarray(err),
        "num_keyframes": N,
        "num_keyframes_solved": n_solved,
        "completed": not stopped_early,
        "mode": wparams.mode,
        "passes": n_passes,
        "num_windows": len(starts),
        "windows_done": windows_done,
        "window": W,
        "overlap": O,
        "window_final_costs": window_costs,
        "solve_seconds": t_solve,
        "marginalization_seconds": t_marg,
        # the first window's time includes the (single) jit compile; the
        # steady-state rate replaces it with the median of the rest.
        # solve_keyframes_per_s is the WINDOW-MARCH rate: at passes > 1 its
        # numerator counts keyframes once per pass that re-solves them.
        "solve_keyframes_per_s": n_timed / max(t_steady, 1e-9),
        "solve_keyframes_per_s_including_compile": n_timed / max(
            t_solve, 1e-9
        ),
        # end-to-end rate: unique sequence keyframes / steady solve wall
        # (re-solving passes divided out) — the honest headline number
        "sequence_keyframes_per_s": (
            n_timed / passes_run / max(t_steady, 1e-9)
        ),
        "hessian_dtype": cfg.hessian_dtype,
        "num_landmarks_padded": M_pad,
        "pad_buckets": sorted(set(win_dims)),
        "pad_bucket_windows": [
            sum(1 for d in win_dims if d == b)
            for b in sorted(set(win_dims))
        ],
    }
    return est, report
