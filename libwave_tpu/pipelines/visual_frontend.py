"""Image-sequence front end: pixels -> persistent feature tracks.

This closes the reference's front-end/back-end loop: the templated Tracker
fills a LandmarkMeasurementContainer (wave_vision/include/wave/vision/
tracker/tracker.hpp:34) whose tracks are exactly what the BA problem
builder consumes (wave_optimization/tests/ceres/ba_test.cpp:97). Here the
same flow is a fixed-shape device program per frame — FAST detect -> BRISK
describe -> Hamming match + ratio + RANSAC -> masked ID inheritance — and
the resulting track bank exports as the framework's (frame, landmark_id,
u, v) array, the format ``datasets.euroc.load_euroc_tracks`` returns and
``pipelines.euroc_vio`` solves from.

The per-frame step is jit-compiled once and re-used across the sequence
(tracker state threads through host-side), so arbitrarily long sequences
stream without retracing; batches of sequences can vmap the same step.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from libwave_tpu.vision.descriptor import (
    BRISKParams,
    ORBDescriptorParams,
    brisk_describe,
    orb_describe_pyramid,
)
from libwave_tpu.vision.detector import (
    FASTParams,
    ORBDetectorParams,
    detect_fast,
    detect_orb_pyramid,
)
from libwave_tpu.vision.matcher import MatcherParams
from libwave_tpu.vision.tracker import (
    TrackerParams,
    TrackerState,
    add_image_features,
    tracker_init,
)

__all__ = [
    "FrontendParams",
    "detect_and_describe",
    "track_sequence",
    "track_sequences_batched",
    "tracks_from_state",
]


@dataclasses.dataclass(frozen=True)
class FrontendParams:
    """Composed front-end configuration (detector + descriptor + tracker) —
    the composition axis of the reference's templated
    ``Tracker<TDetector, TDescriptor, TMatcher>`` (tracker.hpp:34),
    expressed as a method switch over the same fixed bank contract.

    ``method``: "fast_brisk" (FAST corners + BRISK descriptors) or "orb"
    (multi-level oFAST/Harris pyramid + scale-aware rBRIEF)."""

    method: str = "fast_brisk"
    fast: FASTParams = dataclasses.field(
        default_factory=lambda: FASTParams(threshold=20.0, num_features=512)
    )
    brisk: BRISKParams = dataclasses.field(default_factory=BRISKParams)
    orb: ORBDetectorParams = dataclasses.field(
        default_factory=lambda: ORBDetectorParams(num_features=512)
    )
    orb_desc: ORBDescriptorParams = dataclasses.field(
        default_factory=ORBDescriptorParams
    )
    tracker: TrackerParams = dataclasses.field(
        default_factory=lambda: TrackerParams(
            num_features=512, buffer_capacity=65536
        )
    )

    def __post_init__(self):
        if self.method not in ("fast_brisk", "orb"):
            raise ValueError(f"unknown front-end method {self.method!r}")
        det = self.fast if self.method == "fast_brisk" else self.orb
        if self.tracker.num_features != det.num_features:
            raise ValueError(
                "tracker.num_features must equal the detector's "
                f"({self.tracker.num_features} != {det.num_features})"
            )


def detect_and_describe(image: jnp.ndarray, params: FrontendParams):
    """One frame's (xy, desc, mask) bank — jit/vmap-able. Accepts uint8 or
    float frames; integer frames are cast ON DEVICE — through a remote TPU
    runtime the host->device image transfer is the front end's single
    largest cost (measured: 57 ms/frame for f32 752x480 stacks vs 10 ms
    as uint8 — the compute itself is 15 ms), so callers should ship uint8
    and let this cast happen chip-side."""
    if not jnp.issubdtype(image.dtype, jnp.floating):
        image = image.astype(jnp.float32)
    if params.method == "orb":
        xy, _, angle, level, m = detect_orb_pyramid(image, params.orb)
        desc, m = orb_describe_pyramid(
            image, xy, angle, level, m,
            params.orb.scale_factor, params.orb.num_levels, params.orb_desc,
        )
        return xy, desc, m
    xy, _, m = detect_fast(image, params.fast)
    desc, m = brisk_describe(image, xy, m, params.brisk)
    return xy, desc, m


@partial(jax.jit, static_argnames=("params",))
def _frontend_step(state: TrackerState, image, time, key,
                   params: FrontendParams):
    xy, desc, m = detect_and_describe(image, params)
    return add_image_features(
        state, xy, desc, m, time, key, params.tracker
    )


def _desc_words(params: FrontendParams) -> int:
    if params.method == "orb":
        from libwave_tpu.vision.descriptor import _brief_pattern

        a, _ = _brief_pattern(params.orb_desc)
        return (len(a) + 31) // 32
    from libwave_tpu.vision.descriptor import _brisk_pattern

    _, _, short, _ = _brisk_pattern(params.brisk)
    return (len(short) + 31) // 32


@partial(jax.jit, static_argnames=("params",))
def _frontend_scan(state: TrackerState, frames, times, keys,
                   params: FrontendParams):
    """Whole-sequence tracking as ONE device program (`lax.scan` over
    frames) — the production TPU convention: through a remote runtime the
    per-frame dispatch latency (~30 ms) would otherwise cap throughput."""

    def step(st, inp):
        img, t, k = inp
        # nested jit inlines under trace — same computation as the
        # streaming per-frame step
        return _frontend_step(st, img, t, k, params), None

    state, _ = jax.lax.scan(step, state, (frames, times, keys))
    return state


def track_sequence(frames, times=None,
                   params: FrontendParams = FrontendParams(),
                   key=None, scan: bool | None = None) -> np.ndarray:
    """Track a (T, H, W) image stack; return the (K, 4) float64 track array
    ``(frame, landmark_id, u, v)`` — the tracks.csv/VoDataset-export format
    the VIO/BA problem builders consume.

    ``frames`` may be uint8 or float; ``times`` defaults to the frame
    index. ``scan`` selects the execution mode:

    - ``True``: the whole sequence runs as one ``lax.scan`` device program
      (one dispatch; the stack lives on device);
    - ``False``: one jit-compiled step per frame (streaming mode — frames
      can arrive one at a time and never co-reside on device);
    - ``None`` (default): scan when the float32 stack fits comfortably on
      device (< 512 MB), else stream.

    Both modes use identical per-frame keys, so they produce identical
    tracks.
    """
    frames = np.asarray(frames)
    T = frames.shape[0]
    if times is None:
        times = np.arange(T, dtype=np.float64)
    if key is None:
        key = jax.random.key(0)
    if scan is None:
        # the stack now lives on device in its native dtype (uint8 for
        # images); only one frame at a time is cast to f32 inside the scan
        scan = frames.nbytes < 512 * 1024 * 1024

    keys = jax.random.split(key, T)
    state = tracker_init(params.tracker, desc_words=_desc_words(params))
    times32 = jnp.asarray(np.asarray(times, np.float32))
    # ship frames in their native dtype (uint8 for image files) — the
    # float cast happens on device in detect_and_describe; an f32 upload
    # through the remote tunnel would cost 4x the transfer and dominate
    # the whole pipeline (57 of ~72 ms/frame measured at 752x480)
    if scan:
        state = _frontend_scan(
            state, jnp.asarray(frames), times32, keys, params
        )
    else:
        for i in range(T):
            state = _frontend_step(
                state, jnp.asarray(frames[i]),
                times32[i], keys[i], params,
            )
    return tracks_from_state(state)


@partial(jax.jit, static_argnames=("params",))
def _frontend_scan_vmapped(states, frames, times, keys, params):
    return jax.vmap(
        lambda st, f, t, k: _frontend_scan(st, f, t, k, params)
    )(states, frames, times, keys)


def track_sequences_batched(frames, times=None,
                            params: FrontendParams = FrontendParams(),
                            key=None) -> list:
    """Track a BATCH of sequences ((B, T, H, W) stack) as one vmapped
    whole-sequence device program — the DP throughput mode (SURVEY §2.8:
    the front end is embarrassingly parallel over sequences/cameras; the
    per-frame chain itself is sequential). Returns a list of B (K, 4)
    track arrays, each identical to ``track_sequence`` on that sequence
    with the matching per-sequence key.
    """
    frames = np.asarray(frames)
    B, T = frames.shape[:2]
    if times is None:
        times = np.broadcast_to(np.arange(T, dtype=np.float64), (B, T))
    if key is None:
        key = jax.random.key(0)
    seq_keys = jax.random.split(key, B)
    keys = jnp.stack([jax.random.split(k, T) for k in seq_keys])
    state0 = tracker_init(params.tracker, desc_words=_desc_words(params))
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), state0
    )
    out = _frontend_scan_vmapped(
        states,
        jnp.asarray(frames),  # native dtype; device-side float cast
        jnp.asarray(np.asarray(times, np.float32)),
        keys,
        params,
    )
    return [
        tracks_from_state(jax.tree.map(lambda x: x[b], out))
        for b in range(B)
    ]


def tracks_from_state(state: TrackerState) -> np.ndarray:
    """Export the tracker's landmark buffer as (frame, id, u, v) rows,
    sorted by (frame, id) — ``LandmarkMeasurementContainer`` iteration
    order (landmark_measurement_container.hpp:196)."""
    buf = state.landmarks
    valid = np.asarray(buf.valid)
    frames = np.asarray(buf.images)[valid]
    ids = np.asarray(buf.landmark_ids)[valid]
    uv = np.asarray(buf.values)[valid]
    order = np.lexsort((ids, frames))
    out = np.zeros((len(frames), 4), np.float64)
    out[:, 0] = frames[order]
    out[:, 1] = ids[order]
    out[:, 2:] = uv[order]
    return out
