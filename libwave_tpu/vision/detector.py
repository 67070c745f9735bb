"""Feature detection: FAST segment test + Harris scoring + ORB-style pyramid.

Capability parity with the reference's detector stack (wave_vision):
- ``FASTDetector`` (fast_detector.hpp:20 params: threshold=10, nonmax, type
  TYPE_{5_8,7_12,9_16}, top-N retention) wrapping cv::FastFeatureDetector;
- ``ORBDetector`` (orb_detector.hpp:29: num_features=2000, scale_factor=1.2,
  num_levels=8, edge_threshold=31, Harris/FAST score, fast_threshold=10)
  wrapping cv::ORB.

TPU-first redesign: detection is dense, branch-free array math over the whole
image (the VPU loves this; OpenCV's early-exit pointer chasing does not map to
TPU). The FAST segment test evaluates all 16 ring comparisons at every pixel
simultaneously; the "n contiguous" test is a circular run-length check done
with log-shift ANDs on a 32-bit mask. Non-max suppression is a reduce-window
max compare; top-N retention is ``lax.top_k`` -> fixed-shape keypoint arrays
with a validity mask (dynamic keypoint counts don't exist on TPU).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from libwave_tpu.utils.config import ConfigError


# Bresenham circle of radius 3 (the FAST-16 ring, clockwise from 12 o'clock).
_RING16 = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)
# radius-1.5 ring of 8 for TYPE_5_8 and radius-2 ring of 12 for TYPE_7_12
_RING8 = np.array(
    [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1)],
    dtype=np.int32,
) * np.int32(1)
_RING12 = np.array(
    [
        (-2, 0), (-2, 1), (-1, 2), (0, 2), (1, 2), (2, 1), (2, 0), (2, -1),
        (1, -2), (0, -2), (-1, -2), (-2, -1),
    ],
    dtype=np.int32,
)

_FAST_TYPES = {
    "5_8": (_RING8, 5),
    "7_12": (_RING12, 7),
    "9_16": (_RING16, 9),
}


@dataclasses.dataclass(frozen=True)
class FASTParams:
    """fast_detector.hpp:20 parameter parity (type as a string enum)."""

    threshold: float = 10.0
    nonmax_suppression: bool = True
    type: str = "9_16"
    num_features: int = 1024  # top-N retained (0 in the reference = "all";
    # fixed shapes require an explicit cap here)

    def validate(self):
        if self.threshold <= 0:
            raise ConfigError("threshold must be greater than 0")
        if self.type not in _FAST_TYPES:
            raise ConfigError(f"invalid FAST type {self.type}")
        if self.num_features <= 0:
            raise ConfigError("num_features must be positive (fixed capacity)")


def _shifted(img, dy, dx):
    """Image shifted so out[y, x] = img[y + dy, x + dx], zero-padded."""
    H, W = img.shape
    out = jnp.roll(img, shift=(-dy, -dx), axis=(0, 1))
    return out


def _contiguous_run(mask16: jnp.ndarray, n: int, ring_size: int) -> jnp.ndarray:
    """Whether each pixel's circular ring mask has >= n contiguous set bits.

    mask16: (..., ring) boolean. Implemented as a wrap-around cumulative AND
    with log-step shifts on a packed integer mask.
    """
    # pack bits into int32: bit i = ring position i; duplicate for wraparound
    weights = (1 << np.arange(ring_size)).astype(np.uint32)
    packed = jnp.sum(
        mask16.astype(jnp.uint32) * weights, axis=-1, dtype=jnp.uint32
    )
    m = packed | (packed << ring_size)  # 2*ring bits
    # AND of n consecutive shifted copies leaves bit i set iff positions
    # i..i+n-1 are all set; log-step doubling.
    out = m
    shift = 1
    remaining = n - 1
    while remaining > 0:
        s = min(shift, remaining)
        out = out & (out >> s)
        remaining -= s
        shift *= 2
    return out != 0


def fast_score(image: jnp.ndarray, params: FASTParams = FASTParams()):
    """Dense FAST corner response.

    Returns (score (H, W), is_corner (H, W)). Score is the OpenCV-style
    sum-of-absolute-differences over the qualifying arc (max of bright/dark
    sums), zero where the segment test fails or in the 3-pixel border.
    """
    ring, n = _FAST_TYPES[params.type]
    img = image.astype(jnp.float32)
    H, W = img.shape
    t = jnp.float32(params.threshold)

    ring_vals = jnp.stack(
        [_shifted(img, int(dy), int(dx)) for dy, dx in ring], axis=-1
    )  # (H, W, R)
    center = img[..., None]
    bright = ring_vals > center + t
    dark = ring_vals < center - t

    is_bright = _contiguous_run(bright, n, len(ring))
    is_dark = _contiguous_run(dark, n, len(ring))
    is_corner = is_bright | is_dark

    diff = ring_vals - center
    bright_sum = jnp.sum(jnp.where(bright, diff - t, 0.0), axis=-1)
    dark_sum = jnp.sum(jnp.where(dark, -diff - t, 0.0), axis=-1)
    score = jnp.maximum(
        jnp.where(is_bright, bright_sum, 0.0), jnp.where(is_dark, dark_sum, 0.0)
    )

    # zero the border (ring reads wrap via roll; border results are invalid)
    r = int(np.max(np.abs(ring)))
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    interior = (yy >= r) & (yy < H - r) & (xx >= r) & (xx < W - r)
    score = jnp.where(interior & is_corner, score, 0.0)
    return score, interior & is_corner


def nonmax_suppress(score: jnp.ndarray, window: int = 3) -> jnp.ndarray:
    """Keep only local maxima of the response in a window x window patch."""
    local_max = jax.lax.reduce_window(
        score,
        -jnp.inf,
        jax.lax.max,
        (window, window),
        (1, 1),
        "SAME",
    )
    return jnp.where(score >= local_max, score, 0.0)


def select_top_k(score: jnp.ndarray, k: int):
    """Flatten -> top-k -> (xy (k, 2) float, response (k,), mask (k,)).

    xy is (x=col, y=row) to match OpenCV KeyPoint.pt convention
    (vision utils.hpp KeyPoint<->Vec2 converters).
    """
    H, W = score.shape
    flat = score.reshape(-1)
    vals, idx = jax.lax.top_k(flat, k)
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    mask = vals > 0
    xy = jnp.stack([xs, ys], axis=-1)
    return jnp.where(mask[:, None], xy, -1.0), vals, mask


def detect_fast(image: jnp.ndarray, params: FASTParams = FASTParams()):
    """Full FAST detection: score -> (optional) NMS -> top-N.

    Returns (xy (N,2), response (N,), mask (N,)) with N = params.num_features.
    Batch over images with vmap.
    """
    score, _ = fast_score(image, params)
    if params.nonmax_suppression:
        score = nonmax_suppress(score)
    return select_top_k(score, params.num_features)


# ---------------------------------------------------------------------------
# Harris response + ORB-style detector
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ORBDetectorParams:
    """orb_detector.hpp:29 parameter parity (pyramid levels via vmap'd
    rescale; HARRIS_SCORE ranking)."""

    num_features: int = 2000
    scale_factor: float = 1.2
    num_levels: int = 8
    edge_threshold: int = 31
    fast_threshold: float = 10.0
    use_harris_score: bool = True

    def validate(self):
        if self.num_features < 0:
            raise ConfigError("num_features must be >= 0")
        if self.scale_factor < 1.0:
            raise ConfigError("scale_factor must be >= 1")
        if not 0 < self.num_levels <= 12:
            raise ConfigError("num_levels out of range")
        if self.fast_threshold <= 0:
            raise ConfigError("fast_threshold must be > 0")


def _box3(x):
    k = jnp.ones((3, 3), dtype=x.dtype) / 9.0
    return jax.lax.conv_general_dilated(
        x[None, None], k[None, None], (1, 1), "SAME"
    )[0, 0]


def harris_score(image: jnp.ndarray, k: float = 0.04) -> jnp.ndarray:
    """Harris corner response det(M) - k tr(M)^2 with 3x3 aggregation."""
    img = image.astype(jnp.float32)
    dx = (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1)) * 0.5
    dy = (jnp.roll(img, -1, axis=0) - jnp.roll(img, 1, axis=0)) * 0.5
    Ixx, Iyy, Ixy = _box3(dx * dx), _box3(dy * dy), _box3(dx * dy)
    det = Ixx * Iyy - Ixy * Ixy
    tr = Ixx + Iyy
    return det - k * tr * tr


def orb_orientation(image: jnp.ndarray, xy: jnp.ndarray, radius: int = 15):
    """Intensity-centroid orientation per keypoint (the ORB "oFAST" angle):
    theta = atan2(m01, m10) over a circular patch."""
    img = image.astype(jnp.float32)
    H, W = img.shape
    dy, dx = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    circle = (dy * dy + dx * dx) <= radius * radius
    offs = np.stack([dy[circle], dx[circle]], axis=-1)  # (P, 2)
    offs_j = jnp.asarray(offs)

    def one(pt):
        y = jnp.clip(pt[1].astype(jnp.int32) + offs_j[:, 0], 0, H - 1)
        x = jnp.clip(pt[0].astype(jnp.int32) + offs_j[:, 1], 0, W - 1)
        vals = img[y, x]
        m01 = jnp.sum(vals * offs_j[:, 0])
        m10 = jnp.sum(vals * offs_j[:, 1])
        return jnp.arctan2(m01, m10)

    return jax.vmap(one)(xy)


def detect_orb(image: jnp.ndarray, params: ORBDetectorParams = ORBDetectorParams()):
    """Single-level ORB-style detection: FAST segment test gated, Harris
    ranked, oriented. (Pyramid levels: run per level on pre-scaled images and
    merge — see tracker utilities.)

    Returns (xy (N,2), response (N,), angle (N,), mask (N,)).
    """
    fast_p = FASTParams(
        threshold=params.fast_threshold,
        nonmax_suppression=True,
        num_features=params.num_features,
    )
    score, corners = fast_score(image, fast_p)
    if params.use_harris_score:
        h = harris_score(image)
        score = jnp.where(corners, h - jnp.min(h) + 1e-3, 0.0)
    score = nonmax_suppress(score)
    # suppress near-edge responses (edge_threshold border, orb_detector
    # parity: descriptors need intact patches)
    H, W = image.shape
    b = params.edge_threshold
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    inside = (yy >= b) & (yy < H - b) & (xx >= b) & (xx < W - b)
    score = jnp.where(inside, score, 0.0)
    xy, resp, mask = select_top_k(score, params.num_features)
    angle = orb_orientation(image, xy)
    return xy, resp, jnp.where(mask, angle, 0.0), mask
