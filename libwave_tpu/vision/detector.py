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
    """orb_detector.hpp:29 parameter parity (HARRIS_SCORE ranking;
    num_levels/scale_factor drive the image pyramid of
    :func:`detect_orb_pyramid`). ``cross_level_nms`` additionally suppresses
    keypoints that re-detect a strictly stronger response from another level
    at the same level-0 location (off by default for cv::ORB parity, which
    keeps multi-scale duplicates)."""

    num_features: int = 2000
    scale_factor: float = 1.2
    num_levels: int = 8
    edge_threshold: int = 31
    fast_threshold: float = 10.0
    use_harris_score: bool = True
    cross_level_nms: bool = False

    def validate(self):
        if self.num_features < 0:
            raise ConfigError("num_features must be >= 0")
        if self.scale_factor < 1.0:
            raise ConfigError("scale_factor must be >= 1")
        if not 0 < self.num_levels <= 12:
            raise ConfigError("num_levels out of range")
        if self.fast_threshold <= 0:
            raise ConfigError("fast_threshold must be > 0")


def pyramid_shapes(H: int, W: int, scale_factor: float, num_levels: int):
    """Static per-level image shapes (floored at 8 px)."""
    out = []
    for level in range(num_levels):
        s = scale_factor**level
        out.append((max(int(round(H / s)), 8), max(int(round(W / s)), 8)))
    return out


def build_pyramid(image: jnp.ndarray, scale_factor: float, num_levels: int):
    """Per-level bilinear rescales of ``image`` (cv::ORB's image pyramid,
    orb_detector.hpp:36-44). Level shapes are static; each level resamples
    the full-resolution image (equivalent to, and slightly sharper than,
    OpenCV's successive downscaling)."""
    img = image.astype(jnp.float32)
    H, W = img.shape
    shapes = pyramid_shapes(H, W, scale_factor, num_levels)
    return [
        img if lvl == 0 else jax.image.resize(img, shp, method="bilinear")
        for lvl, shp in enumerate(shapes)
    ]


def _level_budgets(num_features: int, scale_factor: float, num_levels: int):
    """cv::ORB's per-level feature budget: geometric decay by 1/scale_factor
    per level, remainder to the coarsest level (ORB_Impl::detectAndCompute
    feature distribution)."""
    factor = 1.0 / scale_factor
    if num_levels == 1:
        return [num_features]
    if factor == 1.0:
        return [max(num_features // num_levels, 1)] * num_levels
    ndesired = num_features * (1 - factor) / (1 - factor**num_levels)
    budgets = []
    acc = 0
    for level in range(num_levels - 1):
        b = max(int(round(ndesired * factor**level)), 1)
        budgets.append(b)
        acc += b
    budgets.append(max(num_features - acc, 1))
    return budgets


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


def _detect_orb_level(image: jnp.ndarray, params: ORBDetectorParams,
                      budget: int):
    """One pyramid level: FAST segment test gated, Harris ranked, NMS,
    edge-threshold border, top-``budget``, oriented."""
    fast_p = FASTParams(
        threshold=params.fast_threshold,
        nonmax_suppression=True,
        num_features=budget,
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
    xy, resp, mask = select_top_k(score, budget)
    angle = orb_orientation(image, xy)
    return xy, resp, jnp.where(mask, angle, 0.0), mask


def detect_orb_pyramid(image: jnp.ndarray,
                       params: ORBDetectorParams = ORBDetectorParams()):
    """Full multi-level ORB detection (orb_detector.hpp:29-112 parity:
    num_features across num_levels scales of scale_factor).

    Per level: detect on the pre-scaled image with a geometrically decaying
    feature budget, orient on that level's pixels, then map coordinates back
    to level 0 and merge by response into the fixed num_features capacity.
    With ``cross_level_nms`` a keypoint is dropped when a strictly stronger
    response from another level sits within its scaled NMS radius.

    Returns (xy (N, 2) level-0 coords, response (N,), angle (N,),
    level (N,) int32, mask (N,)); N = params.num_features. Feed ``level``
    to :func:`libwave_tpu.vision.descriptor.orb_describe_pyramid` so
    descriptor patches sample the matching scale.
    """
    levels = build_pyramid(image, params.scale_factor, params.num_levels)
    budgets = _level_budgets(
        params.num_features, params.scale_factor, params.num_levels
    )
    xs, rs, asz, ls, ms = [], [], [], [], []
    for lvl, (img_l, budget) in enumerate(zip(levels, budgets)):
        xy, resp, ang, mask = _detect_orb_level(img_l, params, budget)
        scale = params.scale_factor**lvl
        xs.append(jnp.where(mask[:, None], xy * scale, -1.0))
        rs.append(resp)
        asz.append(ang)
        ls.append(jnp.full(resp.shape, lvl, jnp.int32))
        ms.append(mask)
    xy = jnp.concatenate(xs)
    resp = jnp.concatenate(rs)
    angle = jnp.concatenate(asz)
    level = jnp.concatenate(ls)
    mask = jnp.concatenate(ms)

    if params.cross_level_nms and params.num_levels > 1:
        # suppress k where a strictly stronger response from another level
        # lies within 2 px * its scale at level 0
        d2 = jnp.sum(
            (xy[:, None, :] - xy[None, :, :]) ** 2, axis=-1
        )  # (T, T)
        radius = 2.0 * params.scale_factor ** jnp.maximum(
            level[:, None], level[None, :]
        ).astype(xy.dtype)
        other_level = level[:, None] != level[None, :]
        stronger = (resp[None, :] > resp[:, None]) & mask[None, :]
        dominated = jnp.any(
            (d2 <= radius * radius) & other_level & stronger, axis=1
        )
        mask = mask & ~dominated

    # merge: global top num_features by response
    neg = jnp.asarray(-jnp.inf, resp.dtype)
    keyed = jnp.where(mask, resp, neg)
    _, idx = jax.lax.top_k(keyed, params.num_features)
    mask = mask[idx]
    return (
        jnp.where(mask[:, None], xy[idx], -1.0),
        jnp.where(mask, resp[idx], 0.0),
        jnp.where(mask, angle[idx], 0.0),
        jnp.where(mask, level[idx], 0),
        mask,
    )


def detect_orb(image: jnp.ndarray, params: ORBDetectorParams = ORBDetectorParams()):
    """ORB detection honoring ``num_levels``: the full image pyramid when
    num_levels > 1 (see :func:`detect_orb_pyramid`), single-level otherwise.

    Returns (xy (N,2) level-0 coords, response (N,), angle (N,), mask (N,)).
    For per-level descriptor patches use :func:`detect_orb_pyramid` directly
    (it additionally returns each keypoint's pyramid level).
    """
    if params.num_levels > 1:
        xy, resp, angle, _, mask = detect_orb_pyramid(image, params)
        return xy, resp, angle, mask
    xy, resp, angle, mask = _detect_orb_level(
        image, params, params.num_features
    )
    return xy, resp, angle, mask
