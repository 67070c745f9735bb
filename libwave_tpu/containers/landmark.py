"""Landmark measurement table with track extraction.

TPU-native equivalent of the reference's ``LandmarkMeasurementContainer<T>``
(wave_containers/include/wave/containers/landmark_measurement_container.hpp:34;
impl 335 LoC): records are ``{time, sensor_id, landmark_id, image, value}``
with a unique (time, sensor, landmark) key, exact ``get`` (no interpolation),
``getLandmarkIDs[InWindow]``, and ``getTrack[InWindow](sensor, id)`` returning
a time-sorted track.

Struct-of-arrays, fixed capacity, masked — tracks come out as fixed-length
gathers with a validity mask, ready to feed batched reprojection factors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

_INF = jnp.inf


class LandmarkBuffer(NamedTuple):
    times: jnp.ndarray  # (C,)
    sensor_ids: jnp.ndarray  # (C,) int32
    landmark_ids: jnp.ndarray  # (C,) int32
    images: jnp.ndarray  # (C,) int32 — frame number
    values: jnp.ndarray  # (C, D) — pixel (u, v) for D=2
    valid: jnp.ndarray  # (C,) bool
    cursor: jnp.ndarray  # () int32

    @property
    def capacity(self) -> int:
        return self.times.shape[0]


def landmark_buffer(capacity: int, value_dim: int = 2, dtype=jnp.float32) -> LandmarkBuffer:
    return LandmarkBuffer(
        times=jnp.full((capacity,), -_INF, dtype=dtype),
        sensor_ids=jnp.full((capacity,), -1, dtype=jnp.int32),
        landmark_ids=jnp.full((capacity,), -1, dtype=jnp.int32),
        images=jnp.full((capacity,), -1, dtype=jnp.int32),
        values=jnp.zeros((capacity, value_dim), dtype=dtype),
        valid=jnp.zeros((capacity,), dtype=bool),
        cursor=jnp.zeros((), dtype=jnp.int32),
    )


def landmark_size(buf: LandmarkBuffer) -> jnp.ndarray:
    return jnp.sum(buf.valid.astype(jnp.int32))


def _match_slot(buf: LandmarkBuffer, t, sensor_id, landmark_id) -> jnp.ndarray:
    hit = (
        buf.valid
        & (buf.sensor_ids == sensor_id)
        & (buf.landmark_ids == landmark_id)
        & (buf.times == t)
    )
    return jnp.where(jnp.any(hit), jnp.argmax(hit), -1).astype(jnp.int32)


def insert_landmark(
    buf: LandmarkBuffer, t, sensor_id, landmark_id, image, value
) -> LandmarkBuffer:
    """Insert one observation; (time, sensor, landmark) is unique-key —
    overwrite on collision, else write at ring cursor."""
    t = jnp.asarray(t, buf.times.dtype)
    existing = _match_slot(buf, t, sensor_id, landmark_id)
    use_cursor = existing < 0
    slot = jnp.where(use_cursor, buf.cursor, existing)
    return LandmarkBuffer(
        times=buf.times.at[slot].set(t),
        sensor_ids=buf.sensor_ids.at[slot].set(jnp.asarray(sensor_id, jnp.int32)),
        landmark_ids=buf.landmark_ids.at[slot].set(
            jnp.asarray(landmark_id, jnp.int32)
        ),
        images=buf.images.at[slot].set(jnp.asarray(image, jnp.int32)),
        values=buf.values.at[slot].set(jnp.asarray(value, buf.values.dtype)),
        valid=buf.valid.at[slot].set(True),
        cursor=jnp.where(use_cursor, (buf.cursor + 1) % buf.capacity, buf.cursor).astype(
            jnp.int32
        ),
    )


def insert_landmark_batch(
    buf: LandmarkBuffer, times, sensor_ids, landmark_ids, images, values, mask=None
) -> LandmarkBuffer:
    """Bulk insert N observations at consecutive ring slots; ``mask`` marks
    which of the N rows are real (masked rows write to a slot but stay
    invalid... no — masked rows are skipped by compacting the cursor walk).

    For simplicity and jit-safety, masked rows still consume no slots: rows
    are compacted so that valid rows land in consecutive slots.
    """
    times = jnp.asarray(times, buf.times.dtype)
    n = times.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)
    # compact: offset[i] = number of valid rows before i
    offsets = jnp.cumsum(mask.astype(jnp.int32)) - mask.astype(jnp.int32)
    slots = (buf.cursor + offsets) % buf.capacity
    # masked rows write to a scratch slot then are marked invalid — route them
    # to the slot they'd overwrite anyway but guard with where() on payloads.
    def upd(arr, vals):
        cur = arr[slots]
        return arr.at[slots].set(jnp.where(mask[..., None] if vals.ndim > 1 else mask, vals, cur))

    n_new = jnp.sum(mask.astype(jnp.int32))
    return LandmarkBuffer(
        times=upd(buf.times, times),
        sensor_ids=upd(buf.sensor_ids, jnp.asarray(sensor_ids, jnp.int32)),
        landmark_ids=upd(buf.landmark_ids, jnp.asarray(landmark_ids, jnp.int32)),
        images=upd(buf.images, jnp.asarray(images, jnp.int32)),
        values=upd(buf.values, jnp.asarray(values, buf.values.dtype)),
        valid=upd(buf.valid, mask),
        cursor=((buf.cursor + n_new) % buf.capacity).astype(jnp.int32),
    )


def get_exact(buf: LandmarkBuffer, t, sensor_id, landmark_id):
    """Exact lookup (no interpolation — reference landmark ``get``,
    landmark_measurement_container.hpp:167). Returns (value, ok)."""
    slot = _match_slot(buf, jnp.asarray(t, buf.times.dtype), sensor_id, landmark_id)
    ok = slot >= 0
    return buf.values[jnp.maximum(slot, 0)], ok


def get_landmark_ids(buf: LandmarkBuffer, max_ids: int, t_start=None, t_end=None):
    """Unique landmark ids (optionally within a time window), as a
    fixed-length ascending array plus count. Parity: ``getLandmarkIDs`` /
    ``getLandmarkIDsInWindow`` (landmark_measurement_container.hpp:167-196)."""
    m = buf.valid
    if t_start is not None:
        m = m & (buf.times >= t_start) & (buf.times <= t_end)
    ids = jnp.where(m, buf.landmark_ids, jnp.iinfo(jnp.int32).max)
    sorted_ids = jnp.sort(ids)
    # unique: keep first occurrence
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]]
    )
    is_real = sorted_ids != jnp.iinfo(jnp.int32).max
    keep = first & is_real
    order = jnp.argsort(~keep, stable=True)  # keeps sorted order among kept
    out = jnp.where(keep[order], sorted_ids[order], -1)[:max_ids]
    count = jnp.sum(keep.astype(jnp.int32))
    return out, count


def get_track(
    buf: LandmarkBuffer, sensor_id, landmark_id, max_len: int,
    t_start=None, t_end=None,
):
    """Time-sorted track of one landmark from one sensor.

    Returns ``(times, images, values, mask)`` arrays of length ``max_len``
    (mask False past the end). Parity: ``getTrack``/``getTrackInWindow``
    (landmark_measurement_container.hpp:196).
    """
    m = buf.valid & (buf.sensor_ids == sensor_id) & (buf.landmark_ids == landmark_id)
    if t_start is not None:
        m = m & (buf.times >= t_start) & (buf.times <= t_end)
    key = jnp.where(m, buf.times, _INF)
    order = jnp.argsort(key)[:max_len]
    mask = m[order]
    return (
        jnp.where(mask, buf.times[order], 0.0),
        jnp.where(mask, buf.images[order], -1),
        jnp.where(mask[:, None], buf.values[order], 0.0),
        mask,
    )


def erase_older_than_image(buf: LandmarkBuffer, image_cutoff) -> LandmarkBuffer:
    """Invalidate all observations with image < cutoff — the sliding-window
    purge used by the tracker (reference impl/tracker.hpp:90-101)."""
    keep = buf.valid & (buf.images >= image_cutoff)
    return buf._replace(valid=keep)
