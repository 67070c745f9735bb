"""GP-INSAC ground segmentation tests — parity with the reference's
ground_segmentation_tests.cpp (ground/obstacle split on a structured scene).
Synthetic scene: sloped ground + boxes + overhanging structure with known
per-point labels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libwave_tpu.matching import (
    DRIVABLE,
    GROUND,
    OBSTACLE,
    GroundSegmentationParams,
    make_cloud,
    segment_ground,
)
from libwave_tpu.utils.config import ConfigError, validate


def scene(rng, n_ground=12000, n_obs=2000, n_drv=600):
    """Known-label scene: gently sloped ground, vertical posts, high wires."""
    gx = rng.uniform(-40, 40, n_ground)
    gy = rng.uniform(-40, 40, n_ground)
    gz = 0.01 * gx + 0.02 * gy + rng.normal(0, 0.03, n_ground)
    ground = np.stack([gx, gy, gz], axis=-1)

    # vertical posts (obstacles): heights 0.4 - 1.0 m above local ground
    px = np.repeat(rng.uniform(-30, 30, n_obs // 20), 20)
    py = np.repeat(rng.uniform(-30, 30, n_obs // 20), 20)
    base = 0.01 * px + 0.02 * py
    pz = base + rng.uniform(0.4, 1.1, n_obs)
    obs = np.stack([px, py, pz], axis=-1)

    # overhanging wires: 3 m above ground (drivable-under)
    wx = rng.uniform(-30, 30, n_drv)
    wy = rng.uniform(-30, 30, n_drv)
    wz = 0.01 * wx + 0.02 * wy + rng.uniform(2.5, 4.0, n_drv)
    drv = np.stack([wx, wy, wz], axis=-1)

    pts = np.concatenate([ground, obs, drv], axis=0)
    labels = np.concatenate(
        [
            np.full(n_ground, GROUND),
            np.full(n_obs, OBSTACLE),
            np.full(n_drv, DRIVABLE),
        ]
    )
    return jnp.asarray(pts, jnp.float64), labels


class TestGroundSegmentation:
    def test_param_validation(self):
        with pytest.raises(ConfigError):
            validate(GroundSegmentationParams(num_bins_a=0))
        with pytest.raises(ConfigError):
            validate(GroundSegmentationParams(rmax=-1))

    def test_labels_structured_scene(self, rng):
        pts, true_labels = scene(rng)
        cloud = make_cloud(pts)
        res = segment_ground(
            cloud,
            GroundSegmentationParams(rmax=60.0, num_bins_a=24, num_bins_l=40),
        )
        labels = np.asarray(res.labels)

        g = true_labels == GROUND
        o = true_labels == OBSTACLE
        d = true_labels == DRIVABLE
        labeled = labels != -1

        ground_recall = (labels[g] == GROUND).mean()
        obs_recall = (labels[o] == OBSTACLE)[labeled[o]].mean()
        drv_recall = (labels[d] == DRIVABLE)[labeled[d]].mean()
        assert ground_recall > 0.85, f"ground recall {ground_recall}"
        assert obs_recall > 0.75, f"obstacle recall {obs_recall}"
        assert drv_recall > 0.75, f"drivable recall {drv_recall}"
        # ground precision: few obstacle points called ground
        called_ground = labels == GROUND
        ground_precision = g[called_ground].mean()
        assert ground_precision > 0.9, f"precision {ground_precision}"

    def test_masks_partition(self, rng):
        pts, _ = scene(rng, 4000, 800, 200)
        res = segment_ground(
            make_cloud(pts),
            GroundSegmentationParams(rmax=60.0, num_bins_a=24, num_bins_l=40),
        )
        gm = np.asarray(res.ground_mask)
        om = np.asarray(res.obstacle_mask)
        dm = np.asarray(res.drivable_mask)
        assert not (gm & om).any()
        assert not (gm & dm).any()
        assert not (om & dm).any()

    def test_jit(self, rng):
        pts, _ = scene(rng, 2000, 400, 80)
        p = GroundSegmentationParams(rmax=60.0, num_bins_a=16, num_bins_l=32)
        f = jax.jit(lambda c: segment_ground(c, p))
        res = f(make_cloud(pts))
        assert res.labels.shape == (2480,)
