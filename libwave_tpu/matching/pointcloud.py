"""Fixed-capacity masked point clouds + voxel downsampling.

The TPU replacement for pcl::PointCloud + pcl::VoxelGrid
(wave_matching/include/wave/matching/matcher.hpp:52 resolution semantics,
src/icp.cpp:80-90 downsample-then-match): a cloud is a fixed (N, 3) array
with a validity mask; the voxel filter is a sort-based exact segment-mean
(points in the same voxel average to one point), keeping the input capacity
and masking the tail.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from libwave_tpu.geometry.se3 import SE3


class PointCloud(NamedTuple):
    points: jnp.ndarray  # (N, 3)
    mask: jnp.ndarray  # (N,) bool

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    def count(self):
        return jnp.sum(self.mask.astype(jnp.int32))


def make_cloud(points, mask=None) -> PointCloud:
    points = jnp.asarray(points)
    if mask is None:
        mask = jnp.ones(points.shape[:-1], dtype=bool)
    return PointCloud(points=points, mask=mask)


def transform_cloud(T: SE3, cloud: PointCloud) -> PointCloud:
    return PointCloud(points=T.apply(cloud.points), mask=cloud.mask)


def _voxel_hash(pts: jnp.ndarray, leaf: float) -> jnp.ndarray:
    """Spatial hash of voxel coordinates (int32). Collisions merge distant
    voxels with vanishing probability — acceptable for downsampling."""
    ijk = jnp.floor(pts / leaf).astype(jnp.int32)
    h = (
        ijk[..., 0] * jnp.int32(73856093)
        ^ ijk[..., 1] * jnp.int32(19349663)
        ^ ijk[..., 2] * jnp.int32(83492791)
    )
    return h


def voxel_downsample(cloud: PointCloud, leaf: float) -> PointCloud:
    """Average points within each voxel of side ``leaf`` (pcl::VoxelGrid
    semantics). Output keeps capacity N with a mask over unique voxels."""
    N = cloud.capacity
    h = _voxel_hash(cloud.points, leaf)
    # sort by hash; invalid points to the end
    key = jnp.where(cloud.mask, h, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(key)
    h_sorted = key[order]
    pts_sorted = cloud.points[order]
    valid_sorted = cloud.mask[order]

    first = jnp.concatenate(
        [jnp.ones((1,), bool), h_sorted[1:] != h_sorted[:-1]]
    ) & valid_sorted
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1  # segment index per point
    seg = jnp.where(valid_sorted, seg, N - 1)
    sums = jax.ops.segment_sum(
        jnp.where(valid_sorted[:, None], pts_sorted, 0.0), seg, num_segments=N
    )
    counts = jax.ops.segment_sum(
        valid_sorted.astype(pts_sorted.dtype), seg, num_segments=N
    )
    num_voxels = jnp.sum(first.astype(jnp.int32))
    mask = jnp.arange(N) < num_voxels
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    return PointCloud(points=jnp.where(mask[:, None], means, 0.0), mask=mask)


def synthetic_scan(key, n: int = 4096, dtype=jnp.float32) -> PointCloud:
    """Structured synthetic lidar scan: room walls, ground plane with gentle
    slope, and scattered box obstacles — enough geometry to lock all 6 DOF.
    Replaces the reference's testscan.pcd fixture."""
    import numpy as onp

    rng = onp.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    pts = []
    per = n // 8
    # ground
    g = onp.stack(
        [
            rng.uniform(-10, 10, 2 * per),
            rng.uniform(-10, 10, 2 * per),
            onp.zeros(2 * per),
        ],
        axis=-1,
    )
    g[:, 2] = 0.02 * g[:, 0] + 0.01 * g[:, 1] + rng.normal(0, 0.01, 2 * per)
    pts.append(g)
    # two walls
    for axis, pos in ((0, -10.0), (1, 10.0)):
        w = onp.stack(
            [
                rng.uniform(-10, 10, per),
                rng.uniform(-10, 10, per),
                rng.uniform(0, 4, per),
            ],
            axis=-1,
        )
        w[:, axis] = pos + rng.normal(0, 0.01, per)
        pts.append(w)
    # boxes
    for _ in range(4):
        c = rng.uniform(-8, 8, 2)
        size = rng.uniform(0.5, 1.5)
        face = rng.integers(0, 3, per)
        b = onp.stack(
            [
                c[0] + rng.uniform(-size, size, per),
                c[1] + rng.uniform(-size, size, per),
                rng.uniform(0, 2 * size, per),
            ],
            axis=-1,
        )
        b[face == 0, 0] = c[0] + size
        b[face == 1, 1] = c[1] - size
        b[face == 2, 2] = 2 * size
        pts.append(b)
    all_pts = onp.concatenate(pts, axis=0)[:n]
    if all_pts.shape[0] < n:
        pad = onp.zeros((n - all_pts.shape[0], 3))
        all_pts = onp.concatenate([all_pts, pad], axis=0)
        mask = onp.arange(n) < all_pts.shape[0]
    return make_cloud(jnp.asarray(all_pts, dtype=dtype))
