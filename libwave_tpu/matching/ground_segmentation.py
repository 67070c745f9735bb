"""Gaussian-process INSAC ground segmentation.

Capability parity with the reference's ``GroundSegmentation<PointT>`` filter
(wave_matching/include/wave/matching/ground_segmentation.hpp:117, impl:
genPolarBinGrid -> per-sector sectorINSAC -> ground/obstacle/drivable split;
params ground_segmentation_params.hpp:9-60: 72 angular x 200 linear polar
bins, sq-exp GP with length p_l / scale p_sf / noise p_sn, INSAC thresholds
p_tmodel/p_tdata, ground height p_tg, robot_height overhang split, seeding
bounds; Chen et al. 2014 "Gaussian-Process-Based Real-Time Ground
Segmentation for Autonomous Land Vehicles").

TPU-first redesign: all 72 sectors run as ONE vmapped program. Each sector
keeps a fixed-length signal vector (one prototype point per linear bin — the
lowest point, as in the reference's range_height_signal) with a validity
mask; the INSAC grow loop becomes a fixed number of *batched masked GP
regressions*: the model set is a boolean vector, the GP solve uses the full
LxL kernel with non-model rows decoupled by a large diagonal, and inliers
join the model via ``where``. The reference's dynamic row/column deletion
(impl:248-271) disappears entirely — masks do that work for free on the VPU.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from libwave_tpu.matching.pointcloud import PointCloud
from libwave_tpu.utils.config import ConfigError

from libwave_tpu.utils.precision import f32_matmuls

_BIG = 1e8

# point labels
GROUND = 0
OBSTACLE = 1
DRIVABLE = 2
UNLABELED = -1


@dataclasses.dataclass(frozen=True)
class GroundSegmentationParams:
    """ground_segmentation_params.hpp:9-60 parity."""

    rmax: float = 100.0
    max_bin_points: int = 200
    num_seed_points: int = 10
    p_l: float = 4.0
    p_sf: float = 1.0
    p_sn: float = 0.3
    p_tmodel: float = 5.0
    p_tdata: float = 5.0
    p_tg: float = 0.3
    robot_height: float = 1.2
    max_seed_range: float = 50.0
    max_seed_height: float = 15.0
    num_bins_a: int = 72
    num_bins_l: int = 200
    insac_iterations: int = 10  # fixed INSAC growth rounds (converges fast)
    min_bin_points: int = 5  # reference requires > 5 points per signal bin

    def validate(self):
        if self.num_bins_a <= 0 or self.num_bins_l <= 0:
            raise ConfigError("bin counts must be positive")
        if self.rmax <= 0:
            raise ConfigError("rmax must be positive")


class GroundSegmentationResult(NamedTuple):
    labels: jnp.ndarray  # (N,) int32: GROUND/OBSTACLE/DRIVABLE/UNLABELED
    ground_mask: jnp.ndarray  # (N,)
    obstacle_mask: jnp.ndarray  # (N,)
    drivable_mask: jnp.ndarray  # (N,)


def _sq_exp(r1, r2, p_sf, p_l):
    d = r1[..., :, None] - r2[..., None, :]
    return p_sf * jnp.exp(-(d * d) / (2.0 * p_l * p_l))


@f32_matmuls
def segment_ground(cloud: PointCloud,
                   params: GroundSegmentationParams = GroundSegmentationParams()
                   ) -> GroundSegmentationResult:
    """Label every point ground / obstacle / drivable-overhanging."""
    pts = cloud.points
    dtype = pts.dtype
    N = pts.shape[0]
    A, L = params.num_bins_a, params.num_bins_l

    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    rng = jnp.sqrt(x * x + y * y)
    ang = jnp.arctan2(y, x)  # [-pi, pi)
    in_range = cloud.mask & (rng < params.rmax)

    sector = jnp.clip(
        ((ang + jnp.pi) / (2 * jnp.pi) * A).astype(jnp.int32), 0, A - 1
    )
    lin = jnp.clip((rng / params.rmax * L).astype(jnp.int32), 0, L - 1)
    bin_id = jnp.where(in_range, sector * L + lin, A * L)  # overflow bin

    # prototype per bin: the lowest-z point (reference range_height_signal)
    z_masked = jnp.where(in_range, z, jnp.inf)
    bin_min_z = jax.ops.segment_min(z_masked, bin_id, num_segments=A * L + 1)
    bin_count = jax.ops.segment_sum(
        in_range.astype(jnp.int32), bin_id, num_segments=A * L + 1
    )
    # prototype range: mean range per bin (bins are narrow; the reference
    # uses the lowest point's range — the difference is < rmax/L)
    bin_rng_sum = jax.ops.segment_sum(
        jnp.where(in_range, rng, 0.0), bin_id, num_segments=A * L + 1
    )
    bin_rng = bin_rng_sum / jnp.maximum(bin_count, 1)

    sig_h = bin_min_z[: A * L].reshape(A, L)
    sig_r = bin_rng[: A * L].reshape(A, L)
    sig_valid = (bin_count[: A * L] > params.min_bin_points).reshape(A, L)

    def sector_insac(h, r, valid):
        """One sector: returns (model_mask (L,), f_s (L,), model_ok ())."""
        # seeds: the num_seed_points lowest valid signal points within
        # seeding bounds (impl:150-180)
        seedable = (
            valid
            & (r < params.max_seed_range)
            & (jnp.abs(h) < params.max_seed_height)
        )
        order = jnp.argsort(jnp.where(seedable, h, jnp.inf))
        rank = jnp.argsort(order)  # rank of each bin by height
        model = seedable & (rank < params.num_seed_points)
        model_ok = jnp.sum(model.astype(jnp.int32)) >= 2

        def gp_predict(model):
            m = model.astype(dtype)
            K = _sq_exp(r, r, params.p_sf, params.p_l)
            A_mat = K * (m[:, None] * m[None, :]) + jnp.diag(
                params.p_sn + _BIG * (1.0 - m)
            )
            alpha = jnp.linalg.solve(A_mat, h * m)
            f = K @ (alpha * m)
            # predictive variance diag: p_sf - diag(K_sm A^-1 K_ms), one
            # multi-RHS solve instead of L separate solves
            X = jnp.linalg.solve(A_mat, K * m[:, None])  # (L, L)
            vf = params.p_sf - jnp.einsum("ij,ji->i", K * m[None, :], X)
            return f, vf

        def round_fn(i, carry):
            model, f_prev = carry
            f, vf = gp_predict(model)
            met = (h - f) / jnp.sqrt(params.p_sn + vf * vf)
            inlier = (
                valid
                & ~model
                & (vf < params.p_tmodel)
                & (jnp.abs(met) < params.p_tdata)
            )
            return (model | inlier, f)

        model, f_s = jax.lax.fori_loop(
            0, params.insac_iterations, round_fn, (model, h)
        )
        f_s, _ = gp_predict(model)
        return model, f_s, model_ok

    model, f_s, model_ok = jax.vmap(sector_insac)(sig_h, sig_r, sig_valid)

    # classify every point from its bin's status (impl:292-355)
    flat_model = model.reshape(-1)
    flat_f = f_s.reshape(-1)
    flat_h = sig_h.reshape(-1)
    flat_ok = jnp.repeat(model_ok, L)

    safe_bin = jnp.clip(bin_id, 0, A * L - 1)
    p_in_model = flat_model[safe_bin] & in_range
    p_ok = flat_ok[safe_bin]
    ref_height = jnp.where(
        p_in_model, flat_h[safe_bin], flat_f[safe_bin]
    )  # model bins compare to prototype height, others to GP prediction
    dh = jnp.abs(z - ref_height)

    is_ground = p_in_model & (dh < params.p_tg)
    is_drv = ~is_ground & (dh > params.robot_height) & in_range & p_ok
    is_obs = ~is_ground & ~is_drv & in_range & p_ok
    labels = jnp.where(
        is_ground,
        GROUND,
        jnp.where(is_drv, DRIVABLE, jnp.where(is_obs, OBSTACLE, UNLABELED)),
    ).astype(jnp.int32)
    return GroundSegmentationResult(
        labels=labels,
        ground_mask=is_ground,
        obstacle_mask=is_obs,
        drivable_mask=is_drv,
    )
