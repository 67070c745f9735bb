"""Pinhole camera model.

Parity with the reference's vision utils (wave_vision/include/wave/vision/
utils.hpp:25-76 ``focal_length`` / ``pinholeProject``): project world points
through ``K [R_CG | -R_CG p]`` with cheirality checking. Batched over
arbitrary leading dims of points and/or camera poses — one fused einsum chain
on device instead of a per-landmark loop (VoTestCamera.cpp:18).
"""

from __future__ import annotations

import jax.numpy as jnp

from libwave_tpu.geometry import so3


def focal_length(fov, image_size):
    """Theoretical focal length from field of view (radians) and image size in
    pixels (utils.hpp:25). Works elementwise for 2-vector hfov/vfov."""
    return jnp.asarray(image_size) / (2.0 * jnp.tan(jnp.asarray(fov) / 2.0))


def pinhole_project(K, q_GC, p_GC, points_G):
    """Project world points into the image.

    Args:
      K: (3, 3) intrinsics.
      q_GC: (..., 4) camera orientation in world frame (camera-to-world).
      p_GC: (..., 3) camera position in world frame.
      points_G: (..., 3) world points (broadcast against camera batch).

    Returns:
      (uv, in_front): pixel coordinates (..., 2) and cheirality flags (...,).
    """
    # camera-frame point: R_CG (X - p) computed as R(q)^T (X - p)
    d = points_G - p_GC
    pc = so3.quat_rotate(so3.quat_inverse(q_GC), d)
    h = jnp.einsum("ij,...j->...i", jnp.asarray(K, pc.dtype), pc)
    z = h[..., 2]
    in_front = z > 0
    safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    return h[..., :2] / safe_z[..., None], in_front


def pinhole_project_frames(K, q_GC, p_GC, points_G):
    """All-pairs projection: cameras (T, ...) x points (M, 3) ->
    uv (T, M, 2), in_front (T, M). The dense layout used by the synthetic VO
    generator and the batched reprojection factor banks."""
    return pinhole_project(
        K, q_GC[:, None, :], p_GC[:, None, :], points_G[None, :, :]
    )


def in_image(uv, image_width, image_height):
    """Strict interior test matching the reference's bounds
    (VoTestCamera.cpp:38-41: 0 < u < W, 0 < v < H)."""
    u, v = uv[..., 0], uv[..., 1]
    return (u > 0) & (u < image_width) & (v > 0) & (v < image_height)


def backproject(K, q_GC, p_GC, uv, depth):
    """Image point -> world point at the given camera-frame depth
    (gtsam SimpleCamera::backproject, used by the reference's KITTI example
    to initialize landmarks at depth 3, gtsam_offline_kitti_example.cpp:114).
    Broadcasts over leading dims."""
    K = jnp.asarray(K)
    uv = jnp.asarray(uv)
    x = (uv[..., 0] - K[0, 2]) / K[0, 0]
    y = (uv[..., 1] - K[1, 2]) / K[1, 1]
    pc = jnp.stack([x, y, jnp.ones_like(x)], axis=-1) * jnp.asarray(depth)[..., None]
    return so3.quat_rotate(q_GC, pc) + p_GC
