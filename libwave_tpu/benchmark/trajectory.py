"""Trajectory comparison: interpolation, pose error, ATE / RPE.

Capability parity with the reference's wave_benchmark module:
- ``BenchmarkPose``/``PoseMeasurement`` with SO(3)-aware interpolation
  (wave_benchmark/include/wave/benchmark/pose_measurement.hpp:18,31-49);
- ``poseError``/``trajectoryError``/``TrajectoryCompare`` — interpolate the
  ground-truth stream at measurement timestamps and difference the poses
  (trajectory_compare.hpp:30-47, src/trajectory_compare.cpp), with CSV export
  of translation + so(3) rotation errors (:65-70).

Extended (per BASELINE.md north star) with the standard SLAM metrics the
reference leaves to external tooling: Umeyama trajectory alignment, absolute
trajectory error (ATE RMSE), and relative pose error (RPE) over a distance
or index delta.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from libwave_tpu.geometry import se3, so3
from libwave_tpu.geometry.se3 import SE3


class Trajectory(NamedTuple):
    """Time-stamped pose stream (the measurement-container view of a
    trajectory)."""

    times: jnp.ndarray  # (T,)
    poses: SE3  # batched SE3: q (T, 4), t (T, 3)


def interpolate_at(traj: Trajectory, query_times: jnp.ndarray) -> SE3:
    """Geodesic interpolation of the pose stream at query times
    (the SO(3)-aware specialization of the container's interpolating get,
    pose_measurement.hpp:31-49). Queries outside the time range clamp to the
    end poses."""
    t = traj.times
    qt = jnp.clip(query_times, t[0], t[-1])
    hi = jnp.clip(jnp.searchsorted(t, qt, side="right"), 1, t.shape[0] - 1)
    lo = hi - 1
    denom = t[hi] - t[lo]
    alpha = (qt - t[lo]) / jnp.where(denom == 0, 1.0, denom)
    P_lo = SE3(q=traj.poses.q[lo], t=traj.poses.t[lo])
    P_hi = SE3(q=traj.poses.q[hi], t=traj.poses.t[hi])
    return se3.interpolate(P_lo, P_hi, alpha)


def pose_error(truth: SE3, estimate: SE3):
    """(translation error (.., 3), rotation error (.., 3) in so(3)) —
    the reference's BenchmarkPose error split (trajectory_compare.cpp
    poseError)."""
    dt = estimate.t - truth.t
    drot = so3.quat_boxminus(estimate.q, truth.q)
    return dt, drot


def trajectory_error(truth: Trajectory, measured: Trajectory):
    """Interpolate truth at measurement times and difference
    (TrajectoryCompare::calculateError parity). Returns (trans_err (T,3),
    rot_err (T,3))."""
    truth_at = interpolate_at(truth, measured.times)
    return pose_error(truth_at, measured.poses)


def write_error_csv(path: str, times, trans_err, rot_err) -> None:
    """CSV export: time, translation error xyz, so(3) error xyz
    (trajectory_compare.hpp:65-70 outputCSV parity)."""
    data = np.concatenate(
        [
            np.asarray(times)[:, None],
            np.asarray(trans_err),
            np.asarray(rot_err),
        ],
        axis=-1,
    )
    np.savetxt(path, data, delimiter=",")


# ---------------------------------------------------------------------------
# ATE / RPE (north-star metrics)
# ---------------------------------------------------------------------------


def align_trajectories_umeyama(truth_t: jnp.ndarray, est_t: jnp.ndarray):
    """Similarity-free (SE3) Umeyama alignment of estimate onto truth.
    Returns the aligning SE3 (applied to the estimate)."""
    cp = jnp.mean(est_t, axis=0)
    cq = jnp.mean(truth_t, axis=0)
    H = (est_t - cp).T @ (truth_t - cq)
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], H.dtype)).at[2, 2].set(d)
    R = Vt.T @ D @ U.T
    t = cq - R @ cp
    return SE3(q=so3.rot_to_quat(R), t=t)


def absolute_trajectory_error(truth: Trajectory, estimate: Trajectory,
                              align: bool = True):
    """ATE: RMSE of translation error after (optional) SE3 alignment,
    with truth interpolated at estimate timestamps. Returns (ate_rmse,
    per-pose errors)."""
    truth_at = interpolate_at(truth, estimate.times)
    est = estimate.poses
    if align:
        T = align_trajectories_umeyama(truth_at.t, est.t)
        est = SE3(
            q=so3.quat_multiply(
                jnp.broadcast_to(T.q, est.q.shape), est.q
            ),
            t=T.apply(est.t),
        )
    err = jnp.linalg.norm(est.t - truth_at.t, axis=-1)
    return jnp.sqrt(jnp.mean(err * err)), err


def relative_pose_error(truth: Trajectory, estimate: Trajectory,
                        delta: int = 1):
    """RPE over an index delta: error of relative motions
    truth_i->truth_{i+d} vs est_i->est_{i+d}. Returns (trans_rmse, rot_rmse,
    per-pair errors)."""
    truth_at = interpolate_at(truth, estimate.times)
    est = estimate.poses

    def rel(P: SE3, d):
        A = SE3(q=P.q[:-d], t=P.t[:-d])
        B = SE3(q=P.q[d:], t=P.t[d:])
        return A.inverse().compose(B)

    rel_truth = rel(truth_at, delta)
    rel_est = rel(est, delta)
    err = rel_truth.inverse().compose(rel_est)
    terr = jnp.linalg.norm(err.t, axis=-1)
    rerr = jnp.linalg.norm(so3.log_quat(err.q), axis=-1)
    return (
        jnp.sqrt(jnp.mean(terr * terr)),
        jnp.sqrt(jnp.mean(rerr * rerr)),
        (terr, rerr),
    )
