"""NDT (Normal Distributions Transform) scan registration.

Capability parity with the reference's ``NDTMatcher`` wrapping
pcl::NormalDistributionsTransform (wave_matching/include/wave/matching/
ndt.hpp:13-44, src/ndt.cpp: params step_size=3, res=5 with floor 0.05,
max_iter=100, t_eps=1e-8, default identity information).

TPU-first: the target's voxel Gaussian statistics (mean + regularized
covariance per cell) are built with the same sort-based segment reduction as
the voxel filter; each GN iteration scores every source point against its
voxel's Gaussian (O(1) direct quantization — no neighbor search at all) and
reduces a batched 6x6 normal system. Distribution-to-point Mahalanobis with
eigenvalue-floored covariances is the standard Magnusson formulation.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from libwave_tpu.geometry import so3
from libwave_tpu.geometry.se3 import SE3
from libwave_tpu.matching.loop import converged_scan
from libwave_tpu.matching.pointcloud import PointCloud, _voxel_hash
from libwave_tpu.utils.config import ConfigError

from libwave_tpu.utils.precision import f32_matmuls

_MIN_RES = 0.05  # ndt.hpp floor


@dataclasses.dataclass(frozen=True)
class NDTParams:
    step_size: float = 3.0
    res: float = 5.0
    max_iter: int = 100
    t_eps: float = 1e-8
    min_points_per_cell: int = 5

    def validate(self):
        if self.res < _MIN_RES:
            raise ConfigError(f"NDT resolution must be >= {_MIN_RES}")
        if self.max_iter <= 0:
            raise ConfigError("max_iter must be positive")


class NDTGrid(NamedTuple):
    """Voxel Gaussian table addressed by open hashing."""

    keys: jnp.ndarray  # (V,) int32 voxel hash (sentinel for empty)
    means: jnp.ndarray  # (V, 3)
    inv_covs: jnp.ndarray  # (V, 3, 3)
    valid: jnp.ndarray  # (V,)


_EMPTY = 0x7FFFFFFF  # int32 max as a plain int (no backend init at import)


def build_ndt_grid(cloud: PointCloud, res: float,
                   min_points: int = 5) -> NDTGrid:
    """Per-voxel mean + covariance via sort/segment reductions; covariance
    eigenvalues floored at 1e-2 * max-eig (Magnusson regularization)."""
    N = cloud.capacity
    dtype = cloud.points.dtype
    h = _voxel_hash(cloud.points, res)
    key = jnp.where(cloud.mask, h, _EMPTY)
    order = jnp.argsort(key)
    hs = key[order]
    ps = cloud.points[order]
    vs = cloud.mask[order]

    first = jnp.concatenate([jnp.ones((1,), bool), hs[1:] != hs[:-1]]) & vs
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg = jnp.where(vs, seg, N - 1)
    w = vs.astype(dtype)
    cnt = jax.ops.segment_sum(w, seg, num_segments=N)
    sums = jax.ops.segment_sum(ps * w[:, None], seg, num_segments=N)
    outer = jax.ops.segment_sum(
        jnp.einsum("ni,nj->nij", ps, ps) * w[:, None, None], seg, num_segments=N
    )
    mean = sums / jnp.maximum(cnt, 1.0)[:, None]
    cov = outer / jnp.maximum(cnt, 1.0)[:, None, None] - jnp.einsum(
        "ni,nj->nij", mean, mean
    )
    # eigenvalue floor
    vals, vecs = jnp.linalg.eigh(cov)
    floor = 1e-2 * jnp.maximum(vals[..., 2:3], 1e-6)
    vals = jnp.maximum(vals, floor)
    inv_cov = vecs @ ((1.0 / vals)[..., None] * jnp.swapaxes(vecs, -1, -2))

    cell_key = jax.ops.segment_sum(
        jnp.where(first, hs, 0), seg, num_segments=N
    )  # each segment's key (first element's hash)
    cell_valid = cnt >= min_points
    num_cells = jnp.sum(first.astype(jnp.int32))
    in_range = jnp.arange(N) < num_cells
    # Keys stay in ascending order for searchsorted (under-populated cells
    # keep their key but are rejected through ``valid`` at lookup).
    return NDTGrid(
        keys=jnp.where(in_range, cell_key, _EMPTY),
        means=mean,
        inv_covs=inv_cov,
        valid=in_range & cell_valid,
    )


def _lookup(grid: NDTGrid, pts: jnp.ndarray, res: float):
    """Find each point's voxel cell by searching the sorted key table."""
    h = _voxel_hash(pts, res)
    # grid.keys is sorted ascending except sentinel tail (argsort order kept)
    idx = jnp.searchsorted(grid.keys, h)
    idx = jnp.clip(idx, 0, grid.keys.shape[0] - 1)
    hit = (grid.keys[idx] == h) & grid.valid[idx]
    return idx, hit


class NDTResult(NamedTuple):
    transform: SE3
    converged: jnp.ndarray
    iterations: jnp.ndarray
    information: jnp.ndarray  # (6, 6) — identity, ndt.hpp default


@f32_matmuls
def ndt_match(ref: PointCloud, target: PointCloud,
              params: NDTParams = NDTParams(),
              init: SE3 | None = None) -> NDTResult:
    """Register ref onto target: GN on the point-to-distribution Mahalanobis
    cost over the target's NDT grid."""
    dtype = ref.points.dtype
    grid = build_ndt_grid(target, params.res, params.min_points_per_cell)
    T0 = SE3.identity(dtype=dtype) if init is None else init

    def score_terms(T):
        """Per-point Mahalanobis + Gaussian score weights (Magnusson: the
        NDT objective saturates, bounding the influence of points far from
        their cell's distribution and smoothing cell-border jumps)."""
        moved = ref.points @ T.rotation().T + T.t
        idx, hit = _lookup(grid, moved, params.res)
        w = (ref.mask & hit).astype(dtype)
        mu = grid.means[idx]
        Wm = grid.inv_covs[idx]
        r = moved - mu
        m2 = jnp.einsum("ni,nij,nj->n", r, Wm, r)
        score_w = jnp.exp(-0.5 * jnp.minimum(m2, 40.0))
        return moved, r, Wm, w * score_w, m2

    def cost_of(T):
        # NDT score: sum of -exp(-m2/2) over in-grid points
        _, _, _, w_eff, _ = score_terms(T)
        return -jnp.sum(w_eff)  # w_eff = hit * exp(-m2/2)

    def body(T):
        moved, r, Wm, w, _ = score_terms(T)
        J = jnp.concatenate(
            [
                -so3.hat(moved),
                jnp.broadcast_to(jnp.eye(3, dtype=dtype), (moved.shape[0], 3, 3)),
            ],
            axis=-1,
        )  # (N, 3, 6); moved' = exp(w)^ moved + v
        JtW = jnp.einsum("nij,nik->njk", J, Wm)
        H = jnp.einsum("njk,nkl,n->jl", JtW, J, w)
        g = jnp.einsum("njk,nk,n->j", JtW, r, w)
        dx = jnp.linalg.solve(H + 1e-6 * jnp.eye(6, dtype=dtype), -g)
        norm = jnp.linalg.norm(dx)
        cap = jnp.asarray(params.step_size, dtype)
        dx = dx * jnp.minimum(1.0, cap / jnp.maximum(norm, 1e-12))

        # backtracking line search on the NDT score (More-Thuente stand-in)
        c0 = cost_of(T)

        def try_alpha(alpha):
            d = alpha * dx
            Tn = SE3(q=so3.exp_quat(d[0:3]), t=d[3:6]).compose(T).normalize()
            return Tn, cost_of(Tn)

        T1, c1 = try_alpha(1.0)
        T2, c2 = try_alpha(0.5)
        T3, c3 = try_alpha(0.25)
        # pick the best of the three; keep T if none improves
        cands_c = jnp.stack([c1, c2, c3])
        best = jnp.argmin(cands_c)
        improved = cands_c[best] < c0
        Tn = jax.tree.map(
            lambda a, b, c: jnp.where(best == 0, a, jnp.where(best == 1, b, c)),
            T1, T2, T3,
        )
        T_new = jax.tree.map(lambda n, o: jnp.where(improved, n, o), Tn, T)
        step = jnp.where(improved, jnp.sum(dx * dx), jnp.asarray(0.0, dtype))
        return T_new, step

    T, iters = converged_scan(body, T0, params.max_iter, params.t_eps, dtype)
    return NDTResult(
        transform=T,
        converged=iters < params.max_iter,
        iterations=iters,
        information=jnp.eye(6, dtype=dtype),
    )
