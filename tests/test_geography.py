"""Geodesy tests — parity with wave_geography tests
(test_enu_llh_point_conversions.cpp round trips)."""

import jax.numpy as jnp
import numpy as np

from libwave_tpu.geography import (
    ecef_from_enu_transform,
    ecef_point_from_llh,
    enu_from_ecef_transform,
    enu_point_from_llh,
    llh_point_from_ecef,
    llh_point_from_enu,
)


WATERLOO = jnp.asarray([43.472285, -80.544858, 329.0])


class TestECEF:
    def test_known_point_equator(self):
        """lat=lon=h=0 -> (a, 0, 0)."""
        ecef = ecef_point_from_llh(jnp.asarray([0.0, 0.0, 0.0]))
        np.testing.assert_allclose(ecef, [6378137.0, 0.0, 0.0], atol=1e-6)

    def test_known_point_pole(self):
        ecef = ecef_point_from_llh(jnp.asarray([90.0, 0.0, 0.0]))
        np.testing.assert_allclose(
            ecef, [0.0, 0.0, 6356752.314245], atol=1e-4
        )

    def test_roundtrip(self, rng):
        llh = jnp.asarray(
            np.stack(
                [
                    rng.uniform(-85, 85, 32),
                    rng.uniform(-180, 180, 32),
                    rng.uniform(-100, 9000, 32),
                ],
                axis=-1,
            )
        )
        back = llh_point_from_ecef(ecef_point_from_llh(llh))
        np.testing.assert_allclose(back[:, :2], llh[:, :2], atol=1e-9)
        np.testing.assert_allclose(back[:, 2], llh[:, 2], atol=1e-6)


class TestENU:
    def test_datum_maps_to_origin(self):
        enu = enu_point_from_llh(WATERLOO, WATERLOO)
        np.testing.assert_allclose(enu, [0.0, 0.0, 0.0], atol=1e-6)

    def test_transforms_are_inverse(self):
        T1 = enu_from_ecef_transform(WATERLOO)
        T2 = ecef_from_enu_transform(WATERLOO)
        np.testing.assert_allclose(T1 @ T2, jnp.eye(4), atol=1e-6)

    def test_north_displacement(self):
        """A point 0.001 deg north of datum maps to +y (north) in ENU."""
        north = WATERLOO + jnp.asarray([0.001, 0.0, 0.0])
        enu = enu_point_from_llh(north, WATERLOO)
        assert abs(float(enu[0])) < 1.0  # little east
        assert 100.0 < float(enu[1]) < 120.0  # ~111 m north
        assert abs(float(enu[2])) < 1.0

    def test_enu_llh_roundtrip(self, rng):
        pts = jnp.asarray(rng.uniform(-2000, 2000, (16, 3)))
        llh = llh_point_from_enu(pts, WATERLOO)
        back = enu_point_from_llh(llh, WATERLOO)
        np.testing.assert_allclose(back, pts, atol=1e-5)

    def test_ecef_datum_variant(self):
        datum_ecef = ecef_point_from_llh(WATERLOO)
        enu = enu_point_from_llh(WATERLOO, datum_ecef, datum_is_llh=False)
        np.testing.assert_allclose(enu, [0.0, 0.0, 0.0], atol=1e-5)
