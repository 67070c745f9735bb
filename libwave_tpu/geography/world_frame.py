"""WGS84 LLH / ECEF / local-ENU conversions.

Capability parity with the reference's wave_geography free functions
(wave_geography/include/wave/geography/world_frame_conversions.hpp:53-122,
src/world_frame_conversions.cpp wrapping GeographicLib::Geocentric::WGS84 and
LocalCartesian): ``ecefPointFromLLH``/``llhPointFromECEF``,
``enuFromECEFTransformMatrix``/``ecefFromENUTransformMatrix``,
``enuPointFromLLH``/``llhPointFromENU``.

TPU-native: closed-form WGS84 ellipsoid math (no GeographicLib), batched over
leading dims and jit-safe. The ECEF->LLH inverse uses Bowring's method with a
fixed iteration count (converges to sub-millimeter in 3 iterations for
|h| < 100 km). Angles in degrees at the API, as in the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

# WGS84 ellipsoid
_A = 6378137.0  # semi-major axis [m]
_F = 1.0 / 298.257223563  # flattening
_B = _A * (1.0 - _F)
_E2 = _F * (2.0 - _F)  # first eccentricity squared
_EP2 = _E2 / (1.0 - _E2)  # second eccentricity squared


def ecef_point_from_llh(llh: jnp.ndarray) -> jnp.ndarray:
    """(lat_deg, lon_deg, height_m) -> ECEF (x, y, z). Batched (..., 3)."""
    lat = jnp.deg2rad(llh[..., 0])
    lon = jnp.deg2rad(llh[..., 1])
    h = llh[..., 2]
    sl, cl = jnp.sin(lat), jnp.cos(lat)
    N = _A / jnp.sqrt(1.0 - _E2 * sl * sl)
    x = (N + h) * cl * jnp.cos(lon)
    y = (N + h) * cl * jnp.sin(lon)
    z = (N * (1.0 - _E2) + h) * sl
    return jnp.stack([x, y, z], axis=-1)


def llh_point_from_ecef(ecef: jnp.ndarray) -> jnp.ndarray:
    """ECEF -> (lat_deg, lon_deg, height_m) via Bowring iterations."""
    x, y, z = ecef[..., 0], ecef[..., 1], ecef[..., 2]
    lon = jnp.arctan2(y, x)
    p = jnp.sqrt(x * x + y * y)
    # Bowring's initial parametric latitude
    theta = jnp.arctan2(z * _A, p * _B)
    lat = jnp.arctan2(
        z + _EP2 * _B * jnp.sin(theta) ** 3, p - _E2 * _A * jnp.cos(theta) ** 3
    )
    for _ in range(3):
        sl = jnp.sin(lat)
        N = _A / jnp.sqrt(1.0 - _E2 * sl * sl)
        h = p / jnp.cos(lat) - N
        lat = jnp.arctan2(z, p * (1.0 - _E2 * N / (N + h)))
    sl = jnp.sin(lat)
    N = _A / jnp.sqrt(1.0 - _E2 * sl * sl)
    # height: use the more stable of the two expressions by latitude
    h_p = p / jnp.cos(lat) - N
    h_z = z / jnp.where(jnp.abs(sl) < 1e-12, 1.0, sl) - N * (1.0 - _E2)
    h = jnp.where(jnp.abs(sl) > 0.1, h_z, h_p)
    return jnp.stack([jnp.rad2deg(lat), jnp.rad2deg(lon), h], axis=-1)


def _enu_rotation(lat_rad, lon_rad):
    """Rows are ENU axes expressed in ECEF: R maps ECEF deltas -> ENU."""
    sl, cl = jnp.sin(lat_rad), jnp.cos(lat_rad)
    so_, co = jnp.sin(lon_rad), jnp.cos(lon_rad)
    zero = jnp.zeros_like(sl)
    return jnp.stack(
        [
            jnp.stack([-so_, co, zero], axis=-1),
            jnp.stack([-sl * co, -sl * so_, cl], axis=-1),
            jnp.stack([cl * co, cl * so_, sl], axis=-1),
        ],
        axis=-2,
    )


def _datum_to_llh(datum, datum_is_llh: bool):
    return datum if datum_is_llh else llh_point_from_ecef(datum)


def enu_from_ecef_transform(datum, datum_is_llh: bool = True) -> jnp.ndarray:
    """4x4 transform taking ECEF points to the datum's local ENU frame
    (enuFromECEFTransformMatrix parity)."""
    llh = _datum_to_llh(jnp.asarray(datum), datum_is_llh)
    R = _enu_rotation(jnp.deg2rad(llh[..., 0]), jnp.deg2rad(llh[..., 1]))
    origin = ecef_point_from_llh(llh)
    t = -jnp.einsum("...ij,...j->...i", R, origin)
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    return T.at[..., 3, 3].set(1.0)


def ecef_from_enu_transform(datum, datum_is_llh: bool = True) -> jnp.ndarray:
    """Inverse of :func:`enu_from_ecef_transform`."""
    llh = _datum_to_llh(jnp.asarray(datum), datum_is_llh)
    R = _enu_rotation(jnp.deg2rad(llh[..., 0]), jnp.deg2rad(llh[..., 1]))
    origin = ecef_point_from_llh(llh)
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(jnp.swapaxes(R, -1, -2))
    T = T.at[..., :3, 3].set(origin)
    return T.at[..., 3, 3].set(1.0)


def enu_point_from_llh(point_llh, enu_datum, datum_is_llh: bool = True):
    """LLH point -> local ENU of the datum (enuPointFromLLH parity)."""
    ecef = ecef_point_from_llh(jnp.asarray(point_llh))
    T = enu_from_ecef_transform(enu_datum, datum_is_llh)
    return (
        jnp.einsum("...ij,...j->...i", T[..., :3, :3], ecef) + T[..., :3, 3]
    )


def llh_point_from_enu(point_enu, enu_datum, datum_is_llh: bool = True):
    """Local ENU point -> LLH (llhPointFromENU parity)."""
    T = ecef_from_enu_transform(enu_datum, datum_is_llh)
    ecef = (
        jnp.einsum("...ij,...j->...i", T[..., :3, :3], jnp.asarray(point_enu))
        + T[..., :3, 3]
    )
    return llh_point_from_ecef(ecef)
