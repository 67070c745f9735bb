"""Fixed-capacity feature tracker with persistent landmark IDs.

Capability parity with the reference's templated ``Tracker<TDetector,
TDescriptor, TMatcher>`` (wave_vision/include/wave/vision/tracker/
tracker.hpp:34; impl/tracker.hpp:150 ``addImage``, :29 ``registerKeypoints``,
:16-27 ``purgeContainer``):

- detect -> describe -> match(prev, curr) each frame;
- persistent IDs: a matched current keypoint inherits the previous keypoint's
  ID; a first-time match mints a new monotonic ID (generateFeatureID,
  tracker.hpp:130-137) and back-fills the *previous* frame's measurement;
- measurements accumulate in a landmark container; **sliding-window mode**
  (window_size > 0) purges measurements older than the window
  (impl/tracker.hpp:90-101);
- ``get_tracks(img)`` returns the tracks alive at an image.

TPU-first redesign: per-frame state is a fixed-capacity keypoint bank
(N keypoints, validity mask); ID inheritance/minting is a masked prefix-sum
over the match list (no std::map); the measurement store is the
struct-of-arrays LandmarkBuffer. ``add_image`` is a pure function usable
inside ``lax.scan`` for offline sequences (offlineTracker parity).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from libwave_tpu.containers.landmark import (
    LandmarkBuffer,
    erase_older_than_image,
    insert_landmark_batch,
    landmark_buffer,
)
from libwave_tpu.utils.config import ConfigError
from libwave_tpu.vision.matcher import MatcherParams, match_descriptors


@dataclasses.dataclass(frozen=True)
class TrackerParams:
    """tracker.hpp:50-52 parity: window_size >= 0 (0 = keep everything)."""

    window_size: int = 0
    num_features: int = 512
    buffer_capacity: int = 16384
    sensor_id: int = 0
    matcher: MatcherParams = MatcherParams()

    def validate(self):
        if self.window_size < 0:
            raise ConfigError("window_size cannot be negative!")


class TrackerState(NamedTuple):
    prev_xy: jnp.ndarray  # (N, 2)
    prev_desc: jnp.ndarray  # (N, W) uint32
    prev_mask: jnp.ndarray  # (N,)
    prev_ids: jnp.ndarray  # (N,) int32, -1 = no ID assigned yet
    prev_time: jnp.ndarray  # ()
    image_count: jnp.ndarray  # () int32 — images added so far
    next_id: jnp.ndarray  # () int32 — monotonic ID source
    landmarks: LandmarkBuffer


def tracker_init(params: TrackerParams, desc_words: int, dtype=jnp.float32) -> TrackerState:
    N = params.num_features
    return TrackerState(
        prev_xy=jnp.zeros((N, 2), dtype=dtype),
        prev_desc=jnp.zeros((N, desc_words), dtype=jnp.uint32),
        prev_mask=jnp.zeros((N,), dtype=bool),
        prev_ids=jnp.full((N,), -1, dtype=jnp.int32),
        prev_time=jnp.zeros((), dtype=dtype),
        image_count=jnp.zeros((), dtype=jnp.int32),
        next_id=jnp.zeros((), dtype=jnp.int32),
        landmarks=landmark_buffer(params.buffer_capacity, 2, dtype=dtype),
    )


def add_image_features(
    state: TrackerState,
    xy: jnp.ndarray,
    desc: jnp.ndarray,
    mask: jnp.ndarray,
    time,
    key: jax.Array,
    params: TrackerParams,
) -> TrackerState:
    """Register one frame's detected features (the core of addImage after
    detectAndCompute). Pure function: returns the new tracker state."""
    N = params.num_features
    first = state.image_count == 0

    idx2, valid, _ = match_descriptors(
        state.prev_desc, desc, state.prev_xy, xy,
        state.prev_mask, mask, key, params.matcher,
    )
    valid = valid & ~first  # no matches into an empty tracker

    # ID assignment per *previous* keypoint row (match query side):
    had_id = state.prev_ids >= 0
    needs_new = valid & ~had_id
    new_rank = jnp.cumsum(needs_new.astype(jnp.int32)) - needs_new.astype(jnp.int32)
    minted = state.next_id + new_rank
    prev_ids_updated = jnp.where(
        needs_new, minted, state.prev_ids
    ).astype(jnp.int32)
    ids_for_match = jnp.where(valid, prev_ids_updated, -1)
    num_minted = jnp.sum(needs_new.astype(jnp.int32))

    # scatter IDs onto current keypoint rows
    curr_ids = jnp.full((N,), -1, dtype=jnp.int32)
    safe_idx2 = jnp.where(valid, idx2, 0)
    curr_ids = curr_ids.at[safe_idx2].set(
        jnp.where(valid, ids_for_match, curr_ids[safe_idx2])
    )

    img = state.image_count  # current image index (0-based)
    dtype = state.prev_xy.dtype

    # back-fill previous-frame measurements for newly-minted IDs
    # (impl/tracker.hpp:62-81), then insert current-frame measurements
    lm = state.landmarks
    lm = insert_landmark_batch(
        lm,
        jnp.full((N,), state.prev_time, dtype=dtype),
        jnp.full((N,), params.sensor_id, jnp.int32),
        prev_ids_updated,
        jnp.full((N,), img - 1, jnp.int32),
        state.prev_xy,
        mask=needs_new,
    )
    lm = insert_landmark_batch(
        lm,
        jnp.full((N,), jnp.asarray(time, dtype), dtype=dtype),
        jnp.full((N,), params.sensor_id, jnp.int32),
        ids_for_match,
        jnp.full((N,), img, jnp.int32),
        xy[safe_idx2],
        mask=valid,
    )

    # sliding window purge (impl/tracker.hpp:90-101): with window_size w and
    # images 0..img, drop measurements at images < img+1-w
    if params.window_size > 0:
        cutoff = img + 1 - params.window_size
        lm = jax.tree.map(
            lambda new, old: jnp.where(cutoff > 0, new, old),
            erase_older_than_image(lm, jnp.maximum(cutoff, 0)),
            lm,
        )

    return TrackerState(
        prev_xy=xy,
        prev_desc=desc,
        prev_mask=mask,
        prev_ids=curr_ids,
        prev_time=jnp.asarray(time, dtype),
        image_count=img + 1,
        next_id=(state.next_id + num_minted).astype(jnp.int32),
        landmarks=lm,
    )


def make_add_image(
    detect_describe: Callable, params: TrackerParams
) -> Callable:
    """Compose detect/describe with feature registration into the reference's
    ``addImage(image, time)`` signature. ``detect_describe(image) ->
    (xy, desc, mask)``."""

    def add_image(state: TrackerState, image, time, key):
        xy, desc, mask = detect_describe(image)
        return add_image_features(state, xy, desc, mask, time, key, params)

    return add_image


def offline_tracker(
    detect_describe: Callable,
    images: jnp.ndarray,
    times: jnp.ndarray,
    key: jax.Array,
    params: TrackerParams,
    desc_words: int,
) -> TrackerState:
    """Track a whole (T, H, W) sequence under lax.scan (offlineTracker
    parity, tracker.hpp offlineTracker)."""
    add_image = make_add_image(detect_describe, params)
    state = tracker_init(params, desc_words, dtype=times.dtype)
    keys = jax.random.split(key, images.shape[0])

    def step(state, inputs):
        image, time, k = inputs
        return add_image(state, image, time, k), None

    state, _ = jax.lax.scan(step, state, (images, times, keys))
    return state


def get_tracks(state: TrackerState, params: TrackerParams, max_len: int,
               landmark_id):
    """Time-sorted track of one landmark (getTracks building block —
    fixed-shape per-landmark gather; loop landmark IDs host-side or vmap)."""
    from libwave_tpu.containers.landmark import get_track

    return get_track(
        state.landmarks, params.sensor_id, landmark_id, max_len
    )
