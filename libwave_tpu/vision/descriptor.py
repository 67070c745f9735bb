"""Binary descriptors: BRISK-pattern and ORB(BRIEF)-pattern extraction.

Capability parity with the reference's descriptor stack (wave_vision):
- ``BRISKDescriptor`` (brisk_descriptor.hpp:25: radius_list
  {0, 2.47, 4.17, 6.29, 9.18}, number_list {1, 10, 14, 15, 20}, d_max=5.85
  short-pair threshold, d_min=8.2 long-pair threshold) wrapping cv::BRISK;
- ``ORBDescriptor`` (orb_descriptor.hpp:29: tuple_size(WTA_K)=2,
  patch_size=31) wrapping cv::ORB's rBRIEF.

TPU-first redesign: descriptors for the whole fixed-capacity keypoint bank
extract in one batched pass — pattern points are rotated by each keypoint's
orientation, sampled with bilinear gathers, pairwise-compared, and packed to
uint32 words with a matmul against a bit-weight matrix. The sampling patterns
are precomputed host-side (numpy) at build time; pair selection follows the
BRISK construction (all pairs below/above the distance thresholds) and a
seeded random BRIEF pattern for ORB (OpenCV's learned table is proprietary to
its training run; a fixed random pattern has equivalent matching statistics).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from libwave_tpu.utils.config import ConfigError


@dataclasses.dataclass(frozen=True)
class BRISKParams:
    radius_list: tuple = (0.0, 2.47, 4.17, 6.29, 9.18)
    number_list: tuple = (1, 10, 14, 15, 20)
    d_max: float = 5.85
    d_min: float = 8.2

    def validate(self):
        if len(self.radius_list) == 0 or len(self.number_list) == 0:
            raise ConfigError("radius_list/number_list cannot be empty")
        if len(self.radius_list) != len(self.number_list):
            raise ConfigError("radius_list and number_list must match in size")
        if any(r < 0 for r in self.radius_list):
            raise ConfigError("radii must be non-negative")
        if any(n <= 0 for n in self.number_list):
            raise ConfigError("number_list entries must be positive")
        if self.d_max >= self.d_min:
            raise ConfigError("d_max must be less than d_min")


@dataclasses.dataclass(frozen=True)
class ORBDescriptorParams:
    tuple_size: int = 2  # WTA_K; only 2 (binary comparisons) supported
    patch_size: int = 31
    num_bits: int = 256
    seed: int = 0x5151

    def validate(self):
        if self.tuple_size != 2:
            raise ConfigError("only tuple_size=2 (WTA_K=2) is supported")
        if self.patch_size <= 2:
            raise ConfigError("patch_size must be > 2")


@lru_cache(maxsize=8)
def _brisk_pattern(params: BRISKParams):
    """(points (P, 2), sigmas (P,), short_pairs (S, 2), long_pairs (L, 2))."""
    pts, sigmas = [], []
    for r, n in zip(params.radius_list, params.number_list):
        for k in range(n):
            a = 2 * np.pi * k / n + (0.5 if r > 0 else 0.0)
            pts.append((r * np.cos(a), r * np.sin(a)))
            # smoothing radius grows with ring radius (BRISK sigma ~ 1.3 * r / n)
            sigmas.append(max(0.7, 1.3 * (r * np.sin(np.pi / max(n, 2)))))
    pts = np.asarray(pts, dtype=np.float32)
    sigmas = np.asarray(sigmas, dtype=np.float32)

    P = len(pts)
    ii, jj = np.triu_indices(P, k=1)
    d = np.linalg.norm(pts[ii] - pts[jj], axis=-1)
    short = np.stack([ii[d < params.d_max], jj[d < params.d_max]], axis=-1)
    long = np.stack([ii[d > params.d_min], jj[d > params.d_min]], axis=-1)
    return pts, sigmas, short.astype(np.int32), long.astype(np.int32)


def _bilinear_sample(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    H, W = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    y0 = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def _pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(N, B) bool -> (N, B//32) uint32 via weighted segment sums."""
    N, B = bits.shape
    pad = (-B) % 32
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.zeros((N, pad), dtype=bits.dtype)], axis=-1
        )
        B += pad
    w = jnp.asarray((1 << np.arange(32)).astype(np.uint32))
    grouped = bits.reshape(N, B // 32, 32).astype(jnp.uint32)
    return jnp.sum(grouped * w, axis=-1, dtype=jnp.uint32)


def _smoothed(image: jnp.ndarray, sigma: float = 1.2) -> jnp.ndarray:
    """Separable 5-tap Gaussian pre-smoothing (stand-in for per-point
    integral-image smoothing; adequate for matching)."""
    x = np.arange(-2, 3)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k = (k / k.sum()).astype(np.float32)
    kj = jnp.asarray(k)
    img = image.astype(jnp.float32)
    img = jax.lax.conv_general_dilated(
        img[None, None], kj[None, None, :, None], (1, 1), "SAME"
    )[0, 0]
    img = jax.lax.conv_general_dilated(
        img[None, None], kj[None, None, None, :], (1, 1), "SAME"
    )[0, 0]
    return img


def brisk_describe(
    image: jnp.ndarray,
    xy: jnp.ndarray,
    mask: jnp.ndarray,
    params: BRISKParams = BRISKParams(),
):
    """BRISK descriptors for a keypoint bank.

    Orientation per keypoint from long-pair gradients (the BRISK rule), then
    short-pair comparisons of rotated-pattern samples -> packed uint32 words.

    Returns (desc (N, W) uint32, mask (N,)).
    """
    pts_np, _, short_np, long_np = _brisk_pattern(params)
    pts = jnp.asarray(pts_np)  # (P, 2) [x, y]
    short = jnp.asarray(short_np)
    long_pairs = jnp.asarray(long_np)
    img = _smoothed(image)

    def sample_at(pt_xy, angle):
        c, s = jnp.cos(angle), jnp.sin(angle)
        rot = jnp.asarray([[c, -s], [s, c]])
        p = pts @ rot.T  # rotate pattern
        xs = pt_xy[0] + p[:, 0]
        ys = pt_xy[1] + p[:, 1]
        return _bilinear_sample(img, ys, xs)

    def one(pt_xy):
        # pass 1: unrotated samples -> orientation from long pairs
        vals = sample_at(pt_xy, 0.0)
        gi = vals[long_pairs[:, 0]]
        gj = vals[long_pairs[:, 1]]
        dpos = pts[long_pairs[:, 1]] - pts[long_pairs[:, 0]]
        dist2 = jnp.sum(dpos * dpos, axis=-1)
        g = (gj - gi)[:, None] * dpos / dist2[:, None]
        grad = jnp.sum(g, axis=0)
        angle = jnp.arctan2(grad[1], grad[0])
        # pass 2: rotated samples -> short-pair comparisons
        vals_r = sample_at(pt_xy, angle)
        bits = vals_r[short[:, 0]] < vals_r[short[:, 1]]
        return bits, angle

    bits, angles = jax.vmap(one)(xy)
    desc = _pack_bits(bits)
    desc = jnp.where(mask[:, None], desc, 0)
    return desc, mask


@lru_cache(maxsize=8)
def _brief_pattern(params: ORBDescriptorParams):
    """Seeded random BRIEF pattern: pairs of offsets ~ N(0, (patch/5)^2),
    clipped to the patch (the classic BRIEF G-II construction)."""
    rng = np.random.default_rng(params.seed)
    half = params.patch_size // 2
    sigma = params.patch_size / 5.0
    a = np.clip(rng.normal(0, sigma, (params.num_bits, 2)), -half, half)
    b = np.clip(rng.normal(0, sigma, (params.num_bits, 2)), -half, half)
    return a.astype(np.float32), b.astype(np.float32)


def orb_describe(
    image: jnp.ndarray,
    xy: jnp.ndarray,
    angle: jnp.ndarray,
    mask: jnp.ndarray,
    params: ORBDescriptorParams = ORBDescriptorParams(),
):
    """Rotated-BRIEF (ORB-style) descriptors. Returns (desc (N, W) uint32,
    mask)."""
    a_np, b_np = _brief_pattern(params)
    a = jnp.asarray(a_np)
    b = jnp.asarray(b_np)
    img = _smoothed(image, sigma=2.0)

    def one(pt_xy, th):
        c, s = jnp.cos(th), jnp.sin(th)
        rot = jnp.asarray([[c, -s], [s, c]])
        pa = a @ rot.T
        pb = b @ rot.T
        va = _bilinear_sample(img, pt_xy[1] + pa[:, 1], pt_xy[0] + pa[:, 0])
        vb = _bilinear_sample(img, pt_xy[1] + pb[:, 1], pt_xy[0] + pb[:, 0])
        return va < vb

    bits = jax.vmap(one)(xy, angle)
    desc = _pack_bits(bits)
    return jnp.where(mask[:, None], desc, 0), mask


def orb_describe_pyramid(
    image: jnp.ndarray,
    xy: jnp.ndarray,
    angle: jnp.ndarray,
    level: jnp.ndarray,
    mask: jnp.ndarray,
    scale_factor: float,
    num_levels: int,
    params: ORBDescriptorParams = ORBDescriptorParams(),
):
    """Scale-aware rBRIEF: each keypoint's pattern samples its *own* pyramid
    level's (smoothed) pixels — the cv::ORB behavior
    (orb_detector.hpp:29-44: descriptors computed per level so a feature
    re-detected at a different scale produces a comparable descriptor).

    ``xy`` are level-0 coordinates and ``level`` the per-keypoint pyramid
    level, as returned by
    :func:`libwave_tpu.vision.detector.detect_orb_pyramid`. Level images are
    padded into one (L, H, W) stack so the per-keypoint level pick is a
    single dynamic index; the detector's edge_threshold border guarantees
    patches never touch the padding.

    Returns (desc (N, W) uint32, mask).
    """
    from libwave_tpu.vision.detector import build_pyramid

    a_np, b_np = _brief_pattern(params)
    a = jnp.asarray(a_np)
    b = jnp.asarray(b_np)

    levels = build_pyramid(image, scale_factor, num_levels)
    H, W = levels[0].shape
    stack = jnp.zeros((num_levels, H, W), jnp.float32)
    for lvl, img_l in enumerate(levels):
        stack = stack.at[
            lvl, : img_l.shape[0], : img_l.shape[1]
        ].set(_smoothed(img_l, sigma=2.0))
    inv_scales = jnp.asarray(
        [scale_factor**-lvl for lvl in range(num_levels)], jnp.float32
    )

    def one(pt_xy, th, lvl):
        img = stack[lvl]
        pt = pt_xy * inv_scales[lvl]  # level-0 -> level coords
        c, s = jnp.cos(th), jnp.sin(th)
        rot = jnp.asarray([[c, -s], [s, c]])
        pa = a @ rot.T
        pb = b @ rot.T
        va = _bilinear_sample(img, pt[1] + pa[:, 1], pt[0] + pa[:, 0])
        vb = _bilinear_sample(img, pt[1] + pb[:, 1], pt[0] + pb[:, 0])
        return va < vb

    bits = jax.vmap(one)(xy, angle, level)
    desc = _pack_bits(bits)
    return jnp.where(mask[:, None], desc, 0), mask
