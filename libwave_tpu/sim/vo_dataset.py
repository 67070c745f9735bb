"""Synthetic VO dataset: two-wheel robot on a circle observing landmarks.

Parity with the reference's ``VoDatasetGenerator`` / ``VoDataset``
(wave_vision/include/wave/vision/dataset/VoDataset.hpp:20,46,139;
src/dataset/VoDataset.cpp:213 ``generate``, :57-211 directory I/O;
VoTestCamera.cpp:6 rate gate, :18 ``observeLandmarks``):

- ``nb`` landmarks uniform in x/y/z bounds;
- two-wheel robot driving a circle of radius 0.5 m at 1 m/s, 300 steps of
  dt = 0.01 (one full revolution);
- camera rigidly mounted with q_BC = Rz(-90°) Rx(-90°) (x-forward body ->
  z-forward camera), rate-gated at ``hz``;
- per triggered frame, all landmarks projected through the pinhole model and
  kept when in front of the camera and strictly inside the image.

TPU-first redesign: the whole simulation is one ``lax.scan`` over time and the
observations come out *dense*: ``pixels (T, M, 2)`` with ``visible (T, M)``
masks instead of ragged per-frame lists — the exact layout batched
reprojection factors consume. Directory serialization matches the reference's
``landmarks.dat / calib.dat / state.dat / observed_n.dat + index.dat`` text
format for interop (quaternions stored xyzw in files, as in Eigen's
``coeffs()``; wxyz in memory).
"""

from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from libwave_tpu.geometry import euler as euler_mod
from libwave_tpu.geometry import so3
from libwave_tpu.kinematics.two_wheel import two_wheel_step
from libwave_tpu.utils.config import config_field
from libwave_tpu.vision import camera as cam


@dataclasses.dataclass(frozen=True)
class VoSimParams:
    """Generator parameters (reference yaml schema VoDataset.cpp:9-38)."""

    image_width: int = 640
    image_height: int = 480
    fx: float = 554.25
    fy: float = 554.25
    cx: float = 320.0
    cy: float = 240.0
    hz: float = 100.0
    nb_landmarks: int = 100
    landmark_x_bounds: tuple = (-10.0, 10.0)
    landmark_y_bounds: tuple = (-10.0, 10.0)
    landmark_z_bounds: tuple = (-1.0, 1.0)
    # trajectory (VoDataset.cpp:219-231)
    circle_radius: float = 0.5
    velocity: float = 1.0
    dt: float = 0.01
    steps: int = 300

    def K(self, dtype=jnp.float64):
        return jnp.asarray(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=dtype,
        )

    def validate(self):
        if self.nb_landmarks <= 0:
            raise ValueError("nb_landmarks must be > 0")
        if self.hz <= 0 or self.dt <= 0:
            raise ValueError("hz and dt must be > 0")


class VoDataset(NamedTuple):
    """Dense synthetic dataset (all arrays fixed-shape)."""

    landmarks: jnp.ndarray  # (M, 3) world positions
    camera_K: jnp.ndarray  # (3, 3)
    times: jnp.ndarray  # (T,)
    robot_p_GB: jnp.ndarray  # (T, 3) body position (z = 0)
    robot_q_GB: jnp.ndarray  # (T, 4) body orientation wxyz
    pixels: jnp.ndarray  # (T, M, 2) projections (valid where visible)
    visible: jnp.ndarray  # (T, M) bool — in-frustum AND camera triggered
    frame_has_obs: jnp.ndarray  # (T,) bool — camera triggered this step

    @property
    def num_frames(self) -> int:
        return self.times.shape[0]


# Body-to-camera rotation: Rz(-90) * Ry(0) * Rx(-90)  (VoDataset.cpp:241-245)
def q_BC(dtype=jnp.float64) -> jnp.ndarray:
    qz = so3.exp_quat(jnp.asarray([0.0, 0.0, -jnp.pi / 2], dtype=dtype))
    qx = so3.exp_quat(jnp.asarray([-jnp.pi / 2, 0.0, 0.0], dtype=dtype))
    return so3.quat_multiply(qz, qx)


def generate_vo_dataset(params: VoSimParams, key: jax.Array) -> VoDataset:
    """Simulate the dataset as one jit-able scan."""
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    M, T, dt = params.nb_landmarks, params.steps, params.dt

    kx, ky, kz = jax.random.split(key, 3)
    lm = jnp.stack(
        [
            jax.random.uniform(
                k, (M,), dtype, minval=lo, maxval=hi
            )
            for k, (lo, hi) in zip(
                (kx, ky, kz),
                (
                    params.landmark_x_bounds,
                    params.landmark_y_bounds,
                    params.landmark_z_bounds,
                ),
            )
        ],
        axis=-1,
    )

    # circle trajectory inputs (VoDataset.cpp:219-227)
    w = params.velocity / params.circle_radius
    u = jnp.asarray([params.velocity, w], dtype=dtype)
    K = params.K(dtype)
    qbc = q_BC(dtype)

    def step(carry, i):
        pose2d, cam_acc, frame_idx = carry
        pose2d = two_wheel_step(pose2d, u, dt)
        # camera rate gate (VoTestCamera.cpp:6: trigger when acc > 1/hz)
        cam_acc = cam_acc + dt
        trigger = cam_acc > (1.0 / params.hz)
        cam_acc = jnp.where(trigger, 0.0, cam_acc)
        frame_idx = frame_idx + trigger.astype(jnp.int32)

        p_GB = jnp.stack([pose2d[0], pose2d[1], jnp.zeros_like(pose2d[0])])
        q_GB = so3.exp_quat(
            jnp.stack([jnp.zeros_like(pose2d[2]), jnp.zeros_like(pose2d[2]), pose2d[2]])
        )
        q_GC = so3.quat_multiply(q_GB, qbc)
        uv, in_front = cam.pinhole_project(K, q_GC[None, :], p_GB[None, :], lm)
        vis = in_front & cam.in_image(uv, params.image_width, params.image_height)
        vis = vis & trigger
        return (pose2d, cam_acc, frame_idx), (p_GB, q_GB, uv, vis, trigger)

    pose0 = jnp.zeros(3, dtype=dtype)
    init = (pose0, jnp.zeros((), dtype=dtype), jnp.zeros((), jnp.int32))
    _, (p_GB, q_GB, uv, vis, trig) = jax.lax.scan(
        step, init, jnp.arange(T)
    )
    times = (jnp.arange(T, dtype=dtype)) * dt
    return VoDataset(
        landmarks=lm,
        camera_K=K,
        times=times,
        robot_p_GB=p_GB,
        robot_q_GB=q_GB,
        pixels=uv,
        visible=vis,
        frame_has_obs=trig,
    )


# ---------------------------------------------------------------------------
# Directory serialization (reference text format, VoDataset.cpp:57-211)
# ---------------------------------------------------------------------------


def save_vo_dataset(ds: VoDataset, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    lm = np.asarray(ds.landmarks)
    with open(os.path.join(out_dir, "landmarks.dat"), "w") as f:
        for i, p in enumerate(lm):
            f.write(f"{i} {p[0]} {p[1]} {p[2]}\n")
    K = np.asarray(ds.camera_K).reshape(-1)
    with open(os.path.join(out_dir, "calib.dat"), "w") as f:
        f.write(" ".join(str(v) for v in K) + "\n")

    q = np.asarray(ds.robot_q_GB)
    p = np.asarray(ds.robot_p_GB)
    t = np.asarray(ds.times)
    vis = np.asarray(ds.visible)
    uv = np.asarray(ds.pixels)
    trig = np.asarray(ds.frame_has_obs)

    with open(os.path.join(out_dir, "state.dat"), "w") as f:
        for i in range(len(t)):
            # quaternion written xyzw (Eigen coeffs order)
            f.write(
                f"{t[i]} {p[i,0]} {p[i,1]} {p[i,2]} "
                f"{q[i,1]} {q[i,2]} {q[i,3]} {q[i,0]}\n"
            )

    index_path = os.path.join(out_dir, "index.dat")
    with open(index_path, "w") as idx:
        n = 0
        for i in range(len(t)):
            if not trig[i]:
                continue
            name = f"observed_{n}.dat"
            with open(os.path.join(out_dir, name), "w") as f:
                f.write(f"{t[i]}\n")
                f.write(f"{p[i,0]} {p[i,1]} {p[i,2]}\n")
                f.write(f"{q[i,1]} {q[i,2]} {q[i,3]} {q[i,0]}\n")
                ids = np.nonzero(vis[i])[0]
                f.write(f"{len(ids)}\n")
                for j in ids:
                    f.write(f"{j} {uv[i,j,0]} {uv[i,j,1]}\n")
            idx.write(name + "\n")
            n += 1


def load_vo_dataset(in_dir: str, num_landmarks: int | None = None) -> VoDataset:
    """Load a dataset in the reference directory format back into dense
    arrays (VoDataset::loadFromDirectory). Handles datasets written by this
    module and by the reference (e.g. KITTI-derived feature-track exports)."""
    lm_path = os.path.join(in_dir, "landmarks.dat")
    K = np.loadtxt(os.path.join(in_dir, "calib.dat")).reshape(3, 3)

    with open(os.path.join(in_dir, "index.dat")) as f:
        names = [ln.strip() for ln in f if ln.strip()]

    if os.path.exists(lm_path):
        lm_raw = np.loadtxt(lm_path, ndmin=2)
        ids = lm_raw[:, 0].astype(int)
        M = (int(ids.max()) + 1) if num_landmarks is None else num_landmarks
        landmarks = np.zeros((M, 3))
        landmarks[ids] = lm_raw[:, 1:4]
    else:
        # datasets exported from real drives carry no landmark ground truth
        # (e.g. the reference's vo_data_drive_0036); size the table from the
        # largest observed id
        max_id = -1
        for name in names:
            with open(os.path.join(in_dir, os.path.basename(name))) as f:
                toks = f.read().split()
            n_obs = int(float(toks[8]))
            for k in range(n_obs):
                if 9 + 3 * k >= len(toks):
                    break  # tolerate truncated rows in exported datasets
                max_id = max(max_id, int(float(toks[9 + 3 * k])))
        M = (max_id + 1) if num_landmarks is None else num_landmarks
        landmarks = np.zeros((M, 3))

    T = len(names)
    times = np.zeros(T)
    p_GB = np.zeros((T, 3))
    q_GB = np.zeros((T, 4))
    pixels = np.zeros((T, M, 2))
    visible = np.zeros((T, M), dtype=bool)
    for i, name in enumerate(names):
        with open(os.path.join(in_dir, os.path.basename(name))) as f:
            toks = f.read().split()
        k = 0
        times[i] = float(toks[k]); k += 1
        p_GB[i] = [float(toks[k + j]) for j in range(3)]; k += 3
        x, y, z, w = (float(toks[k + j]) for j in range(4)); k += 4
        q_GB[i] = [w, x, y, z]
        n_obs = int(float(toks[k])); k += 1
        # Some exported datasets (e.g. the reference's vo_data_drive_0036)
        # declare more observations than the file contains; the reference's
        # stream-based loader reads garbage past EOF there — we read only
        # the rows actually present.
        n_avail = (len(toks) - k) // 3
        for _ in range(min(n_obs, n_avail)):
            j = int(float(toks[k])); k += 1
            u, v = float(toks[k]), float(toks[k + 1]); k += 2
            if j < M:
                pixels[i, j] = (u, v)
                visible[i, j] = True

    return VoDataset(
        landmarks=jnp.asarray(landmarks),
        camera_K=jnp.asarray(K),
        times=jnp.asarray(times),
        robot_p_GB=jnp.asarray(p_GB),
        robot_q_GB=jnp.asarray(q_GB),
        pixels=jnp.asarray(pixels),
        visible=jnp.asarray(visible),
        frame_has_obs=jnp.ones(T, dtype=bool),
    )
