"""Unit tests for core geodesy: exact values + cross-checks vs closed forms.

The reference has no tests (SURVEY.md §4); these pin the behavioral contract
of `preprocessing/geo_utils.py` with independently-derived expected values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigeon_tpu.core import (
    EARTH_RADIUS_KM,
    ecef2lla,
    ecef2lla_np,
    haversine,
    haversine_matrix,
    haversine_matrix_np,
    haversine_np,
    lla2ecef,
    lla2ecef_np,
)

RNG = np.random.default_rng(330)


def random_lonlat(n):
    lon = RNG.uniform(-180, 180, size=n)
    lat = RNG.uniform(-89, 89, size=n)
    return np.stack([lon, lat], axis=-1)


class TestHaversine:
    def test_zero_distance(self):
        pts = random_lonlat(16)
        np.testing.assert_allclose(haversine_np(pts, pts), 0.0, atol=1e-9)

    def test_known_values(self):
        # Paris (2.3522E, 48.8566N) -> New York (-74.0060, 40.7128):
        # great-circle distance on a sphere of R=6378.137 km.
        paris = np.array([[2.3522, 48.8566]])
        nyc = np.array([[-74.0060, 40.7128]])
        d = haversine_np(paris, nyc)[0]
        # Independent closed form: R * central angle (spherical law of cosines)
        lam1, phi1 = np.deg2rad(paris[0])
        lam2, phi2 = np.deg2rad(nyc[0])
        ang = np.arccos(np.sin(phi1) * np.sin(phi2)
                        + np.cos(phi1) * np.cos(phi2) * np.cos(lam2 - lam1))
        np.testing.assert_allclose(d, EARTH_RADIUS_KM * ang, rtol=1e-9)

    def test_equator_degree(self):
        # 1 degree along the equator = R * pi / 180.
        a = np.array([[0.0, 0.0]])
        b = np.array([[1.0, 0.0]])
        np.testing.assert_allclose(
            haversine_np(a, b)[0], EARTH_RADIUS_KM * np.pi / 180, rtol=1e-12)

    def test_antipodal(self):
        a = np.array([[0.0, 0.0]])
        b = np.array([[180.0, 0.0]])
        np.testing.assert_allclose(
            haversine_np(a, b)[0], EARTH_RADIUS_KM * np.pi, rtol=1e-9)

    def test_jnp_matches_np(self):
        x, y = random_lonlat(64), random_lonlat(64)
        np.testing.assert_allclose(
            np.asarray(haversine(x, y)), haversine_np(x, y), rtol=2e-5)

    def test_matrix_matches_pairwise(self):
        x, y = random_lonlat(8), random_lonlat(5)
        m = haversine_matrix_np(x, y)
        assert m.shape == (8, 5)
        for i in range(8):
            for j in range(5):
                np.testing.assert_allclose(
                    m[i, j], haversine_np(x[i:i+1], y[j:j+1])[0], rtol=1e-12)

    def test_matrix_jnp(self):
        x, y = random_lonlat(8), random_lonlat(5)
        np.testing.assert_allclose(
            np.asarray(haversine_matrix(x, y)),
            haversine_matrix_np(x, y), rtol=2e-5)

    def test_symmetry(self):
        x, y = random_lonlat(32), random_lonlat(32)
        np.testing.assert_allclose(
            haversine_np(x, y), haversine_np(y, x), rtol=1e-12)

    def test_jittable_and_vmappable(self):
        x, y = jnp.asarray(random_lonlat(16)), jnp.asarray(random_lonlat(16))
        jitted = jax.jit(haversine)(x, y)
        vmapped = jax.vmap(lambda a, b: haversine(a, b))(x, y)
        np.testing.assert_allclose(np.asarray(jitted), np.asarray(vmapped),
                                   rtol=1e-6)


class TestEcef:
    def test_lla2ecef_known(self):
        # (lon=0, lat=0) -> (a, 0, 0); poles -> (0, 0, +-b).
        a = 6378137.0
        b = a * (1 - 1 / 298.257223563)
        out = lla2ecef_np(np.array([[0.0, 0.0], [0.0, 90.0], [0.0, -90.0],
                                    [90.0, 0.0]]))
        np.testing.assert_allclose(out[0], [a, 0, 0], atol=1e-6)
        np.testing.assert_allclose(out[1], [0, 0, b], atol=1e-6)
        np.testing.assert_allclose(out[2], [0, 0, -b], atol=1e-6)
        np.testing.assert_allclose(out[3], [0, a, 0], atol=1e-6)

    def test_roundtrip_np(self):
        pts = random_lonlat(256)
        back = ecef2lla_np(lla2ecef_np(pts))
        np.testing.assert_allclose(back, pts, atol=1e-7)

    def test_roundtrip_jnp(self):
        pts = random_lonlat(256).astype(np.float32)
        back = np.asarray(ecef2lla(lla2ecef(jnp.asarray(pts))))
        # float32 Bowring: sub-100m accuracy is plenty for refinement guards.
        np.testing.assert_allclose(back[:, 0], pts[:, 0], atol=1e-3)
        np.testing.assert_allclose(back[:, 1], pts[:, 1], atol=1e-3)

    def test_jnp_matches_np_in_f64(self):
        pts = random_lonlat(64)
        ecef = lla2ecef_np(pts)
        with jax.enable_x64(True):
            out = np.asarray(ecef2lla(jnp.asarray(ecef)))
        np.testing.assert_allclose(out, ecef2lla_np(ecef), atol=1e-9)

    def test_ecef_on_ellipsoid(self):
        pts = random_lonlat(64)
        xyz = lla2ecef_np(pts)
        a = 6378137.0
        b = a * (1 - 1 / 298.257223563)
        val = (xyz[:, 0]**2 + xyz[:, 1]**2) / a**2 + xyz[:, 2]**2 / b**2
        np.testing.assert_allclose(val, 1.0, rtol=1e-12)
