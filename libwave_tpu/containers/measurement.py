"""Time/sensor-indexed measurement table with interpolating lookup.

TPU-native equivalent of the reference's ``MeasurementContainer<T>``
(wave_containers/include/wave/containers/measurement_container.hpp:47; index
machinery impl/measurement_container.hpp:33-68). The reference stores
``{time_point, sensor_id, value}`` records in a Boost.MultiIndex with two
ordered-unique composite keys and offers:

- ``insert``/``emplace``/``erase`` keyed by (time, sensor) (unique),
- ``get(t, s)`` that *transparently linearly interpolates* between the two
  neighbouring measurements of sensor ``s`` when no exact record exists,
- ``getTimeWindow(start, end)`` and ``getAllFromSensor(s)``.

Here the container is a fixed-capacity struct-of-arrays pytree with a validity
mask. There are no ordered trees: every query is a masked reduction over the
capacity axis (an O(C) VPU sweep — far faster on TPU than pointer chasing for
the C ≤ tens-of-thousands this workload sees). Insert/erase are functional:
they return a new buffer (same buffers donated/reused under jit).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

_INF = jnp.inf


class MeasurementBuffer(NamedTuple):
    """Fixed-capacity measurement table (pytree)."""

    times: jnp.ndarray  # (C,) float
    sensor_ids: jnp.ndarray  # (C,) int32
    values: jnp.ndarray  # (C, D) float
    valid: jnp.ndarray  # (C,) bool
    cursor: jnp.ndarray  # () int32 — next insertion slot (ring)

    @property
    def capacity(self) -> int:
        return self.times.shape[0]


def measurement_buffer(capacity: int, value_dim: int, dtype=jnp.float32) -> MeasurementBuffer:
    """Allocate an empty buffer."""
    return MeasurementBuffer(
        times=jnp.full((capacity,), -_INF, dtype=dtype),
        sensor_ids=jnp.full((capacity,), -1, dtype=jnp.int32),
        values=jnp.zeros((capacity, value_dim), dtype=dtype),
        valid=jnp.zeros((capacity,), dtype=bool),
        cursor=jnp.zeros((), dtype=jnp.int32),
    )


def size(buf: MeasurementBuffer) -> jnp.ndarray:
    """Number of valid records (reference ``size()``)."""
    return jnp.sum(buf.valid.astype(jnp.int32))


def _match_slot(buf: MeasurementBuffer, t, sensor_id) -> jnp.ndarray:
    """Slot index holding (t, sensor) exactly, or -1."""
    hit = buf.valid & (buf.sensor_ids == sensor_id) & (buf.times == t)
    any_hit = jnp.any(hit)
    idx = jnp.argmax(hit)
    return jnp.where(any_hit, idx, -1).astype(jnp.int32)


def insert(buf: MeasurementBuffer, t, sensor_id, value) -> MeasurementBuffer:
    """Insert a measurement. (time, sensor) is a unique key — an existing
    record is overwritten, matching the set semantics of the reference's
    ordered_unique index. Otherwise the record goes to the ring cursor slot
    (evicting whatever was there when the buffer is full)."""
    t = jnp.asarray(t, dtype=buf.times.dtype)
    value = jnp.asarray(value, dtype=buf.values.dtype)
    existing = _match_slot(buf, t, sensor_id)
    use_cursor = existing < 0
    slot = jnp.where(use_cursor, buf.cursor, existing)
    new_cursor = jnp.where(
        use_cursor, (buf.cursor + 1) % buf.capacity, buf.cursor
    ).astype(jnp.int32)
    return MeasurementBuffer(
        times=buf.times.at[slot].set(t),
        sensor_ids=buf.sensor_ids.at[slot].set(jnp.asarray(sensor_id, jnp.int32)),
        values=buf.values.at[slot].set(value),
        valid=buf.valid.at[slot].set(True),
        cursor=new_cursor,
    )


def insert_batch(buf: MeasurementBuffer, times, sensor_ids, values) -> MeasurementBuffer:
    """Bulk insert N new records at consecutive ring slots (no dedup check —
    use for streaming sensor feeds)."""
    n = times.shape[0]
    slots = (buf.cursor + jnp.arange(n, dtype=jnp.int32)) % buf.capacity
    return MeasurementBuffer(
        times=buf.times.at[slots].set(jnp.asarray(times, buf.times.dtype)),
        sensor_ids=buf.sensor_ids.at[slots].set(jnp.asarray(sensor_ids, jnp.int32)),
        values=buf.values.at[slots].set(jnp.asarray(values, buf.values.dtype)),
        valid=buf.valid.at[slots].set(True),
        cursor=((buf.cursor + n) % buf.capacity).astype(jnp.int32),
    )


def erase(buf: MeasurementBuffer, t, sensor_id) -> MeasurementBuffer:
    """Erase the record with key (t, sensor) if present."""
    slot = _match_slot(buf, jnp.asarray(t, buf.times.dtype), sensor_id)
    hit = slot >= 0
    safe = jnp.maximum(slot, 0)
    return buf._replace(valid=buf.valid.at[safe].set(buf.valid[safe] & ~hit))


def get_interpolated(buf: MeasurementBuffer, t, sensor_id):
    """Value of sensor ``sensor_id`` at time ``t``.

    Exact record if it exists; otherwise linear interpolation between the
    nearest neighbours below and above (the reference's transparent
    interpolating ``get``, impl/measurement_container.hpp). Returns
    ``(value, ok)`` — ``ok`` is False when no bracketing pair exists (the
    reference throws std::out_of_range there; under jit we return a flag).
    """
    t = jnp.asarray(t, dtype=buf.times.dtype)
    sensor_mask = buf.valid & (buf.sensor_ids == sensor_id)
    dt = buf.times - t

    below = sensor_mask & (dt <= 0)
    above = sensor_mask & (dt >= 0)
    # nearest below: maximize dt among below (dt<=0) => argmax of masked dt
    t_lo = jnp.where(below, dt, -_INF)
    t_hi = jnp.where(above, dt, _INF)
    i_lo = jnp.argmax(t_lo)
    i_hi = jnp.argmin(t_hi)
    ok = jnp.any(below) & jnp.any(above)

    lo_t, hi_t = buf.times[i_lo], buf.times[i_hi]
    lo_v, hi_v = buf.values[i_lo], buf.values[i_hi]
    denom = hi_t - lo_t
    w = jnp.where(denom > 0, (t - lo_t) / jnp.where(denom == 0, 1.0, denom), 0.0)
    value = lo_v + w * (hi_v - lo_v)
    return value, ok


def get_time_window(buf: MeasurementBuffer, start, end) -> jnp.ndarray:
    """Boolean mask of records with start <= time <= end (reference
    ``getTimeWindow``). Use the mask to gather/reduce downstream."""
    start = jnp.asarray(start, buf.times.dtype)
    end = jnp.asarray(end, buf.times.dtype)
    return buf.valid & (buf.times >= start) & (buf.times <= end)


def get_all_from_sensor(buf: MeasurementBuffer, sensor_id) -> jnp.ndarray:
    """Boolean mask of records from ``sensor_id`` (reference
    ``getAllFromSensor``)."""
    return buf.valid & (buf.sensor_ids == sensor_id)


def sorted_indices(buf: MeasurementBuffer, mask: jnp.ndarray) -> jnp.ndarray:
    """Slot indices sorted by time with invalid entries last; pairs with the
    masks above to produce time-ordered gathers like the reference's ordered
    iteration."""
    key = jnp.where(mask, buf.times, _INF)
    return jnp.argsort(key)
