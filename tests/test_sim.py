"""Synthetic VO dataset tests — parity with the reference's dataset tests
(wave_vision/tests/dataset_tests.cpp) plus round-trip of the directory
format."""

import jax
import jax.numpy as jnp
import numpy as np

from libwave_tpu.sim import (
    VoSimParams,
    generate_vo_dataset,
    load_vo_dataset,
    save_vo_dataset,
)
from libwave_tpu.geometry import so3
from libwave_tpu.sim.vo_dataset import q_BC
from libwave_tpu.vision import camera as cam


def small_params():
    return VoSimParams(nb_landmarks=50, steps=100)


class TestCamera:
    def test_focal_length(self):
        f = cam.focal_length(jnp.deg2rad(90.0), 640)
        np.testing.assert_allclose(f, 320.0, rtol=1e-6)

    def test_project_center(self):
        """A point straight ahead of an identity camera maps to the principal
        point."""
        K = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        # camera frame == world frame: camera looks down +z
        q = so3.quat_identity()
        uv, ok = cam.pinhole_project(K, q, jnp.zeros(3), jnp.asarray([0.0, 0, 5.0]))
        np.testing.assert_allclose(uv, [320.0, 240.0])
        assert bool(ok)

    def test_cheirality(self):
        K = jnp.eye(3)
        uv, ok = cam.pinhole_project(
            K, so3.quat_identity(), jnp.zeros(3), jnp.asarray([0.0, 0, -5.0])
        )
        assert not bool(ok)

    def test_batched_frames(self):
        K = jnp.eye(3)
        q = so3.quat_identity((4,))
        p = jnp.zeros((4, 3))
        pts = jnp.asarray(np.random.default_rng(0).normal(size=(7, 3)) + [0, 0, 5])
        uv, ok = cam.pinhole_project_frames(K, q, p, pts)
        assert uv.shape == (4, 7, 2) and ok.shape == (4, 7)


class TestVoDataset:
    def test_generate_shapes(self):
        ds = generate_vo_dataset(small_params(), jax.random.key(0))
        assert ds.landmarks.shape == (50, 3)
        assert ds.pixels.shape == (100, 50, 2)
        assert ds.visible.shape == (100, 50)
        assert ds.robot_q_GB.shape == (100, 4)

    def test_landmarks_in_bounds(self):
        p = small_params()
        ds = generate_vo_dataset(p, jax.random.key(1))
        lm = np.asarray(ds.landmarks)
        assert (lm[:, 0] >= p.landmark_x_bounds[0]).all()
        assert (lm[:, 0] <= p.landmark_x_bounds[1]).all()
        assert (lm[:, 2] >= p.landmark_z_bounds[0]).all()

    def test_observations_consistent(self):
        """Re-projecting ground truth reproduces the stored pixels exactly,
        and all visible pixels are strictly inside the image."""
        p = small_params()
        ds = generate_vo_dataset(p, jax.random.key(2))
        qbc = q_BC(ds.robot_q_GB.dtype)
        q_GC = so3.quat_multiply(ds.robot_q_GB, qbc)
        uv, in_front = cam.pinhole_project_frames(
            ds.camera_K, q_GC, ds.robot_p_GB, ds.landmarks
        )
        vis = np.asarray(ds.visible)
        assert vis.sum() > 100, "expect plenty of observations"
        np.testing.assert_allclose(
            np.asarray(uv)[vis], np.asarray(ds.pixels)[vis], atol=1e-9
        )
        inside = np.asarray(
            cam.in_image(ds.pixels, p.image_width, p.image_height)
        )
        assert inside[vis].all()

    def test_camera_rate_gate(self):
        """At hz=50 and dt=0.01, the camera triggers every 3rd step
        (accumulator must exceed 1/hz, VoTestCamera.cpp:8)."""
        p = VoSimParams(nb_landmarks=10, steps=30, hz=50.0)
        ds = generate_vo_dataset(p, jax.random.key(3))
        trig = np.asarray(ds.frame_has_obs)
        assert trig.sum() == 10
        assert not trig[0] and not trig[1] and trig[2]

    def test_directory_roundtrip(self, tmp_path):
        ds = generate_vo_dataset(small_params(), jax.random.key(4))
        save_vo_dataset(ds, str(tmp_path))
        ds2 = load_vo_dataset(str(tmp_path))
        # only triggered frames are serialized
        trig = np.asarray(ds.frame_has_obs)
        np.testing.assert_allclose(ds2.times, np.asarray(ds.times)[trig])
        np.testing.assert_allclose(
            ds2.robot_p_GB, np.asarray(ds.robot_p_GB)[trig], atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(ds2.robot_q_GB), np.asarray(ds.robot_q_GB)[trig], atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(ds2.landmarks), np.asarray(ds.landmarks), atol=1e-12
        )
        vis1 = np.asarray(ds.visible)[trig]
        np.testing.assert_array_equal(np.asarray(ds2.visible), vis1)
        np.testing.assert_allclose(
            np.asarray(ds2.pixels)[vis1], np.asarray(ds.pixels)[trig][vis1], atol=1e-9
        )

    def test_jit_generate(self):
        p = small_params()
        f = jax.jit(lambda k: generate_vo_dataset(p, k))
        ds = f(jax.random.key(5))
        assert ds.pixels.shape == (100, 50, 2)
