"""Sliding-window bundle adjustment: vision-only long-sequence solves.

The vision-only sibling of :mod:`pipelines.windowed_vio` — the windowed
promotion of the reference's offline KITTI example
(wave_gtsam/tests/gtsam/gtsam_offline_kitti_example.cpp: projection factors
+ noisy odometry between-factors + priors, solved as ONE global graph).
A global solve works at 238 frames; at thousands it needs bounded windows:

- fixed-size keyframe windows with ``overlap`` shared frames marching down
  the sequence by ``window - overlap``;
- **marginalization mode (default)**: after each window solves, the
  out-of-window poses and their factors — the FULL live tracks of every
  landmark touching an out-frame (overlap observations included, so
  cross-boundary baselines survive; those observations are then excluded
  from the next window, see windowed_vio._marg_obs_split),
  between-factors reaching out of the overlap, window-0 priors, and the
  incoming prior — are Schur-complement marginalized onto the overlap
  poses (optim.marginalization); the next window carries that dense
  (O*6)^2 prior on its head poses (optim.ba.BAProblem.prior_Lambda) with
  every pose free — a fixed-lag smoother. No measurement is counted
  twice: overlap-only landmarks and overlap-internal between-factors
  flow into the next window instead;
- **freeze mode (ablation)**: round-3 behavior — the head poses are
  hard-frozen at the previous window's estimates (bounded-drift
  odometry);
- window ``w``'s tail initializes from the caller's full-trajectory
  initial poses, *anchor-corrected*: the rigid transform taking the
  provided init to the solved chain at the anchor frame is applied to the
  tail, so the init's global drift never re-enters a later window;
- per-window landmarks re-triangulate from the corrected init (gated DLT,
  the shared euroc_vio machinery with an identity camera extrinsic);
- every window pads to common (Pmax, M, shift-pass, factor-count)
  dimensions: ONE jit solve executable + ONE reduced-Hessian executable
  serve the whole sequence. In marginalization mode, starts stay exactly
  ``step`` apart (the final window pads with pinned dummy frames past the
  sequence end) so the marginalized keep-set aligns with the next head.
"""

from __future__ import annotations

import time as _time

import jax
import jax.numpy as jnp
import numpy as np

from libwave_tpu.geometry import so3
from libwave_tpu.optim import schur
from libwave_tpu.optim.ba import (
    BAConfig,
    BAProblem,
    BAState,
    ba_reduced_hessian,
    solve_ba,
)
from libwave_tpu.optim.marginalization import schur_marginalize
from libwave_tpu.optim.pose_graph import BetweenBank, PriorBank
from libwave_tpu.pipelines.euroc_vio import (
    _camera_P_mats,
    _track_bank,
    _triangulate_gated,
)
from libwave_tpu.pipelines.windowed_vio import (
    WindowedVIOParams as WindowedBAParams,  # same knobs: window/overlap/mode
    _excluded_mask,
    _marg_obs_split,
    _pad_shift_masks,
)

__all__ = ["WindowedBAParams", "solve_ba_windowed"]

_IDENTITY_Q = np.array([1.0, 0.0, 0.0, 0.0])


def _slice_between(between: BetweenBank | None, s: int, W: int, f_max: int,
                   dtype, marg_boundary: int | None = None):
    """Between-factors with both endpoints inside [s, s+W), re-indexed
    locally and padded to ``f_max`` zero-information slots.
    ``marg_boundary``: additionally zero the information of factors lying
    entirely inside the keep-set [marg_boundary, W) — the marginalization
    factor split (those factors belong to the next window)."""
    if between is None or f_max == 0:
        return None
    i = np.asarray(between.i)
    j = np.asarray(between.j)
    sel = (i >= s) & (i < s + W) & (j >= s) & (j < s + W)
    n = int(sel.sum())
    pad = f_max - n

    def take(x, fill=0.0):
        arr = np.asarray(x)[sel]
        if pad:
            arr = np.concatenate(
                [arr, np.full((pad,) + arr.shape[1:], fill, arr.dtype)]
            )
        return jnp.asarray(arr)

    dq = np.asarray(between.dq)[sel]
    if pad:
        dq = np.concatenate(
            [dq, np.tile(_IDENTITY_Q, (pad, 1)).astype(dq.dtype)]
        )
    si = np.asarray(between.sqrt_info)[sel]
    if marg_boundary is not None:
        keep_only = (
            (i[sel] - s >= marg_boundary) & (j[sel] - s >= marg_boundary)
        )
        si = si * ~keep_only[:, None]
    if pad:
        si = np.concatenate(
            [si, np.zeros((pad,) + si.shape[1:], si.dtype)]
        )
    return BetweenBank(
        i=jnp.asarray(np.concatenate(
            [i[sel] - s, np.zeros(pad, i.dtype)]
        )),
        j=jnp.asarray(np.concatenate(
            [j[sel] - s, np.zeros(pad, j.dtype)]
        )),
        dq=jnp.asarray(dq),
        dp=take(between.dp),
        sqrt_info=jnp.asarray(si),  # zero rows = silent
    )


def solve_ba_windowed(
    K: np.ndarray,
    tracks: np.ndarray,
    num_frames: int,
    q_init: np.ndarray,
    p_init: np.ndarray,
    between: BetweenBank | None = None,
    priors: PriorBank | None = None,
    wparams: WindowedBAParams = WindowedBAParams(),
    cfg: BAConfig | None = None,
    min_track_length: int = 2,
    outlier_gate_px: float = 100.0,
    gate_rounds: int = 2,
):
    """Chained window solves over a (frame, id, u, v) track bank.

    ``q_init``/``p_init`` are the caller's full-trajectory initial CAMERA
    poses (the role the offset ground truth plays in the reference's KITTI
    example); only window 0 consumes them directly — later windows apply
    them anchor-corrected. Returns ``(q_est, p_est, report)``.
    """
    wparams.validate()
    if cfg is None:
        cfg = BAConfig(max_iterations=40, cg_max_iters=150, huber_delta=3.0)
    N = num_frames
    W = min(wparams.window, N)
    O = min(wparams.overlap, W - 1) if W > 1 else 0
    step = max(W - O, 1)
    marg = wparams.mode == "marginalize" and O >= 1
    q_init = np.asarray(q_init)
    p_init = np.asarray(p_init)
    dtype = p_init.dtype

    if N <= W:
        starts = [0]
    elif marg:
        n_win = int(np.ceil((N - W) / step)) + 1
        starts = [i * step for i in range(n_win)]
    else:
        starts = list(range(0, N - W + 1, step))
        if starts[-1] != N - W:
            starts.append(N - W)

    # pass 1: layout dims (independent of initialization)
    banks = []
    for s in starts:
        banks.append(_track_bank(tracks, min(W, N - s), min_track_length,
                                 frame_offset=s, return_raw=True))
    M_pad = max(max((b[3] for b in banks), default=1), 1)
    pmax_g = 1
    for pose_idx, *_ in banks:
        if len(pose_idx):
            pmax_g = max(pmax_g, int(np.bincount(pose_idx).max()))
    s_max = 1
    for pose_idx, lm_idx, *_ in banks:
        _, _, _, ell_probe = schur.pack_observations(
            pose_idx, lm_idx, W, M_pad, min_pmax=pmax_g
        )
        s_max = max(s_max, ell_probe.shift_masks.shape[0])
    f_max = 0
    if between is not None:
        bi = np.asarray(between.i)
        bj = np.asarray(between.j)
        for s in starts:
            f_max = max(f_max, int(
                ((bi >= s) & (bi < s + W) & (bj >= s) & (bj < s + W)).sum()
            ))

    solve = jax.jit(lambda pr, st: solve_ba(pr, st, cfg))

    P = O * 6
    prior_Lambda = np.zeros((P, P))
    prior_b = np.zeros(P)
    if marg:
        red_hess = jax.jit(
            lambda pr, st: ba_reduced_hessian(pr, st, cfg.huber_delta)
        )
        if priors is None:
            # soft gauge for window 0: anchor the first two poses at their
            # init (the prior-free analog of freezing them); scale rides on
            # the inter-pose baseline either way
            n_anchor = min(2, O)
            prior_Lambda[: n_anchor * 6, : n_anchor * 6] = (
                wparams.anchor_info * np.eye(n_anchor * 6)
            )

    prior0_Lambda = prior_Lambda.copy()
    est_q = np.zeros((N, 4))
    est_p = np.zeros((N, 3))
    est_q[0] = q_init[0]
    est_p[0] = p_init[0]
    solved_upto = 1
    excl_pairs = np.zeros((0, 2), np.int64)
    window_costs = []
    t_solve = 0.0
    t_marg = 0.0
    identity_qbc = _IDENTITY_Q.astype(dtype)
    n_passes = wparams.passes if marg else 1

    # later passes (iterated fixed-lag smoothing) re-run the chain with
    # every window initialized from the previous pass's estimates — the
    # relinearization that closes (and passes) the gap to the global
    # batch solve on weak-geometry sequences (see WindowedVIOParams.passes)
    for pass_idx in range(n_passes):
      if pass_idx > 0:  # fresh pass state (estimates carry)
        solved_upto = 1
        excl_pairs = np.zeros((0, 2), np.int64)
        prior_Lambda = prior0_Lambda.copy()
        prior_b = np.zeros(P)
        window_costs = []
      for wi, s in enumerate(starts):
        pose_idx, lm_idx, uv, M, raw_ids = banks[wi]
        nreal = min(W, N - s)
        head = max(min(solved_upto - s, W), 1)
        a = s + head - 1  # anchor: last chained global frame

        if pass_idx > 0:
            q0 = np.concatenate([
                est_q[s : s + nreal],
                np.tile(est_q[s + nreal - 1], (W - nreal, 1)),
            ])
            p0 = np.concatenate([
                est_p[s : s + nreal],
                np.tile(est_p[s + nreal - 1], (W - nreal, 1)),
            ])
        elif wi == 0:
            q0 = np.concatenate(
                [q_init[s : s + nreal],
                 np.tile(_IDENTITY_Q, (W - nreal, 1))]
            )
            p0 = np.concatenate(
                [p_init[s : s + nreal],
                 np.tile(p_init[min(N, s + nreal) - 1], (W - nreal, 1))]
            )
            q0[:head] = est_q[s : s + head]
            p0[:head] = est_p[s : s + head]
        else:
            # anchor-correct the provided init: T_corr maps init -> solved
            # at frame a, applied rigidly to the tail
            q_corr = np.asarray(so3.quat_multiply(
                jnp.asarray(est_q[a]),
                so3.quat_conjugate(jnp.asarray(q_init[a])),
            ))
            R_corr = np.asarray(so3.quat_to_rot(jnp.asarray(q_corr)))
            t_corr = est_p[a] - R_corr @ p_init[a]
            q0 = np.tile(_IDENTITY_Q, (W, 1))
            p0 = np.zeros((W, 3))
            q0[:head] = est_q[s : s + head]
            p0[:head] = est_p[s : s + head]
            tail_q = jnp.asarray(q_init[a + 1 : s + nreal])
            q0[head:nreal] = np.asarray(so3.quat_multiply(
                jnp.broadcast_to(jnp.asarray(q_corr), tail_q.shape), tail_q
            ))
            p0[head:nreal] = p_init[a + 1 : s + nreal] @ R_corr.T + t_corr
            q0[nreal:] = q0[nreal - 1]
            p0[nreal:] = p0[nreal - 1]

        P_mats = _camera_P_mats(q0, p0, K, identity_qbc)
        if M > 0:
            lm_init, inlier = _triangulate_gated(
                P_mats, pose_idx, lm_idx, uv, M, outlier_gate_px,
                gate_rounds,
            )
            scale = np.ones(len(pose_idx))
            if marg:
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
        lm0 = np.zeros((M_pad, 3))
        lm0[:M] = lm_init

        if marg:
            w_marg, excl_next = _marg_obs_split(
                pose_idx, lm_idx, raw_ids, weight, W, O, s,
                wparams.boundary_obs,
            )
            (pose_ell, lm_ell, pad_mask, ell, uv_p, w_p,
             wm_p) = schur.pack_observations(
                pose_idx, lm_idx, W, M_pad, uv, weight, w_marg,
                min_pmax=pmax_g,
            )
        else:
            pose_ell, lm_ell, pad_mask, ell, uv_p, w_p = (
                schur.pack_observations(
                    pose_idx, lm_idx, W, M_pad, uv, weight,
                    min_pmax=pmax_g,
                )
            )
        ell = _pad_shift_masks(ell, s_max)

        free = np.ones(W)
        if marg:
            free[nreal:] = 0.0  # pin final-window dummy frames
        else:
            if wi == 0 and priors is None:
                free[: min(2, W)] = 0.0  # hard gauge when no priors given
            if wi > 0:
                free[:head] = 0.0

        problem = BAProblem(
            K=jnp.asarray(K),
            pose_idx=pose_ell,
            lm_idx=lm_ell,
            uv=jnp.asarray(uv_p),
            weight=jnp.asarray(w_p) * pad_mask,
            free_pose=jnp.asarray(free, dtype),
            between=_slice_between(between, s, W, f_max, dtype),
            priors=priors if wi == 0 else _far_priors(priors, W),
            ell=ell,
            prior_Lambda=jnp.asarray(prior_Lambda) if marg else None,
            prior_b=jnp.asarray(prior_b) if marg else None,
            prior_q=jnp.asarray(q0[:O]) if marg else None,
            prior_p=jnp.asarray(p0[:O]) if marg else None,
        )
        state0 = BAState(
            q=jnp.asarray(q0), p=jnp.asarray(p0), lm=jnp.asarray(lm0)
        )
        t0 = _time.perf_counter()
        state, info = solve(problem, state0)
        jax.block_until_ready(state)
        t_solve += _time.perf_counter() - t0
        window_costs.append(float(info["final_cost"]))

        if marg or wi == 0:
            est_q[s : s + nreal] = np.asarray(state.q)[:nreal]
            est_p[s : s + nreal] = np.asarray(state.p)[:nreal]
        else:
            est_q[s + head : s + W] = np.asarray(state.q)[head:]
            est_p[s + head : s + W] = np.asarray(state.p)[head:]
        solved_upto = min(s + W, N)

        if marg and wi + 1 < len(starts):
            tm0 = _time.perf_counter()
            marg_problem = problem._replace(
                weight=jnp.asarray(wm_p) * pad_mask,
                between=_slice_between(
                    between, s, W, f_max, dtype, marg_boundary=W - O
                ),
            )
            H, b = red_hess(marg_problem, state)
            prior_Lambda, prior_b = schur_marginalize(
                np.asarray(H), np.asarray(b), keep_dim=P
            )
            excl_pairs = excl_next
            t_marg += _time.perf_counter() - tm0

    report = {
        "num_frames": N,
        "num_windows": len(starts),
        "window": W,
        "overlap": O,
        "mode": wparams.mode,
        "passes": n_passes,
        "window_final_costs": window_costs,
        "solve_seconds": t_solve,
        "marginalization_seconds": t_marg,
        "num_landmarks_padded": M_pad,
    }
    return est_q, est_p, report


def _far_priors(priors: PriorBank | None, W: int):
    """Later windows keep the prior bank's SHAPE (one compiled executable)
    but silence it: zero sqrt-information rows on dummy local indices."""
    if priors is None:
        return None
    n = np.asarray(priors.i).shape[0]
    return PriorBank(
        i=jnp.zeros((n,), jnp.int32),
        q=jnp.broadcast_to(
            jnp.asarray(_IDENTITY_Q, priors.p.dtype), (n, 4)
        ),
        p=jnp.zeros((n, 3), priors.p.dtype),
        sqrt_info=jnp.zeros_like(priors.sqrt_info),
    )
