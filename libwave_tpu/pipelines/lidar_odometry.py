"""Lidar odometry: sequence-level scan registration -> trajectory.

The reference composes this pipeline by hand out of wave_matching pieces —
``MultiMatcher`` queues consecutive-scan ICP jobs across a thread pool
(wave_matching/include/wave/matching/multi_matcher.hpp:30-95) and the caller
chains the resulting transforms. Here the whole pipeline is one device
program, restructured for TPU parallelism instead of translated:

1. **all pairs at once** — scan-to-scan registration between consecutive
   frames has no sequential dependency, so every (scan_t, scan_{t+1}) pair is
   registered simultaneously with ``vmap`` (shard the pair axis over a 'dp'
   mesh for multi-chip);
2. **trajectory composition as a parallel prefix** — absolute poses are the
   running product T_0 ∘ Δ_1 ∘ ... ∘ Δ_t, computed in O(log T) depth with
   ``jax.lax.associative_scan`` over SE(3) composition, not a serial loop;
3. **optional pose-graph refinement** — per-pair information matrices (LUM,
   icp_pcl_functions.cpp:182) weight a between-factor graph solved by
   :func:`libwave_tpu.optim.pose_graph.solve_pose_graph` (matrix-free PCG).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from libwave_tpu.geometry import so3
from libwave_tpu.geometry.se3 import SE3
from libwave_tpu.matching.icp import ICPParams, estimate_info_lum, icp_match
from libwave_tpu.matching.pointcloud import PointCloud
from libwave_tpu.optim.pose_graph import (
    BetweenBank,
    PoseGraphConfig,
    PriorBank,
    solve_pose_graph,
)

__all__ = ["LidarOdometryConfig", "LidarOdometryResult", "lidar_odometry"]


@dataclass(frozen=True)
class LidarOdometryConfig:
    """Pipeline knobs. ``matcher`` follows the reference's Matcher<T> family:
    any ``(ref, target, params) -> result-with-.transform`` callable
    (icp_match / gicp_match / ndt_match)."""

    icp: ICPParams = ICPParams()
    estimate_information: bool = True
    refine_pose_graph: bool = False
    pose_graph: PoseGraphConfig = PoseGraphConfig(max_iterations=8)


class LidarOdometryResult(NamedTuple):
    trajectory: SE3          # (T,) absolute poses, frame 0 = identity
    relative: SE3            # (T-1,) scan-to-scan transforms
    information: jnp.ndarray  # (T-1, 6, 6) per-edge information (LUM) or eye
    converged: jnp.ndarray   # (T-1,) bool per pair
    iterations: jnp.ndarray  # (T-1,) ICP iterations per pair


def _compose_scan(rel: SE3, T0: Optional[SE3] = None) -> SE3:
    """Absolute trajectory from relative transforms via parallel prefix."""

    def combine(a: SE3, b: SE3) -> SE3:
        return SE3(
            q=so3.quat_multiply(a.q, b.q),
            t=so3.quat_rotate(a.q, b.t) + a.t,
        )

    prefix = jax.lax.associative_scan(combine, rel)
    first = SE3.identity(dtype=rel.t.dtype) if T0 is None else T0
    # prepend identity (pose of frame 0) and left-compose the start pose
    q = jnp.concatenate([first.q[None], so3.quat_multiply(first.q, prefix.q)])
    t = jnp.concatenate(
        [first.t[None], so3.quat_rotate(first.q, prefix.t) + first.t]
    )
    return SE3(q=so3.quat_normalize(q), t=t)


def lidar_odometry(
    scans: PointCloud,
    config: LidarOdometryConfig = LidarOdometryConfig(),
    matcher=icp_match,
    T0: Optional[SE3] = None,
) -> LidarOdometryResult:
    """Estimate a trajectory from a sequence of lidar scans.

    ``scans`` carries a leading time axis: points (T, N, 3), mask (T, N).
    Frame convention: ``icp_match(ref, target).transform`` maps ref (scan t)
    coordinates into target (scan t+1) coordinates, i.e. it equals
    T_{t+1}⁻¹ T_t. The relative sensor motion is its inverse,
    Δ_t = T_t⁻¹ T_{t+1}, and absolute poses are the running product
    T_{t+1} = T_t ∘ Δ_t (the same chaining the reference's Matcher users do
    with the target→ref result, matcher.hpp:63-70).
    """
    pts, mask = scans.points, scans.mask
    refs = PointCloud(points=pts[:-1], mask=mask[:-1])
    tgts = PointCloud(points=pts[1:], mask=mask[1:])

    def match_one(rp, rm, tp, tm):
        res = matcher(
            PointCloud(points=rp, mask=rm), PointCloud(points=tp, mask=tm),
            config.icp,
        )
        if config.estimate_information and hasattr(res, "correspondences"):
            info = estimate_info_lum(res)
        else:
            info = jnp.eye(6, dtype=rp.dtype)
        return res.transform.inverse(), info, res.converged, res.iterations

    rel, info, conv, iters = jax.vmap(match_one)(
        refs.points, refs.mask, tgts.points, tgts.mask
    )
    traj = _compose_scan(rel, T0)

    if config.refine_pose_graph:
        # diagonal sqrt-information from the LUM matrices; full 6x6 weighting
        # enters through the between sqrt_info diagonal (block weighting is
        # available by whitening residuals with chol(info) upstream).
        diag = jnp.clip(jnp.diagonal(info, axis1=-2, axis2=-1), 1e-6, 1e8)
        sqrt_info = jnp.sqrt(diag)
        n = traj.q.shape[0]
        i = jnp.arange(0, n - 1, dtype=jnp.int32)
        bank = BetweenBank(i=i, j=i + 1, dq=rel.q, dp=rel.t,
                           sqrt_info=sqrt_info)
        prior = PriorBank(
            i=jnp.zeros((1,), jnp.int32),
            q=traj.q[:1],
            p=traj.t[:1],
            sqrt_info=jnp.full((1, 6), 1e3, dtype=traj.t.dtype),
        )
        q, p, _ = solve_pose_graph(
            traj.q, traj.t, bank, prior, cfg=config.pose_graph
        )
        traj = SE3(q=q, t=p)

    return LidarOdometryResult(
        trajectory=traj,
        relative=rel,
        information=info,
        converged=conv,
        iterations=iters,
    )
