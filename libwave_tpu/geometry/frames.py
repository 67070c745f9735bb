"""Axis-permutation conversions between body/world frame conventions.

Parity with the reference's frame helpers (wave_utils/src/math.cpp:258-303:
``enu2nwu``, ``ned2enu``, ``ned2nwu``, ``nwu2enu``, ``nwu2ned``, ``nwu2edn``),
batched over leading dims.

Frame axis meanings:
- ENU: x-east(right), y-north(forward), z-up
- NWU: x-forward, y-left, z-up
- NED: x-forward, y-right, z-down
- EDN: x-right, y-down, z-forward (camera convention)
"""

from __future__ import annotations

import jax.numpy as jnp


def enu2nwu(enu: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([enu[..., 1], -enu[..., 0], enu[..., 2]], axis=-1)


def nwu2enu(nwu: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([-nwu[..., 1], nwu[..., 0], nwu[..., 2]], axis=-1)


def ned2enu(ned: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([ned[..., 1], ned[..., 0], -ned[..., 2]], axis=-1)


def nwu2edn(nwu: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([-nwu[..., 1], -nwu[..., 2], nwu[..., 0]], axis=-1)


def ned2nwu_quat(q: jnp.ndarray) -> jnp.ndarray:
    """NED-frame attitude quaternion -> NWU (negate y, z components)."""
    return q * jnp.asarray([1.0, 1.0, -1.0, -1.0], dtype=q.dtype)


def nwu2ned_quat(q: jnp.ndarray) -> jnp.ndarray:
    """NWU-frame attitude quaternion -> NED (involution of ned2nwu_quat)."""
    return q * jnp.asarray([1.0, 1.0, -1.0, -1.0], dtype=q.dtype)
