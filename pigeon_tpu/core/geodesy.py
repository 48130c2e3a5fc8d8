"""WGS84 geodesy: haversine distances and LLA <-> ECEF conversions.

Behavioral parity targets (reference LukasHaas/PIGEON):
  * haversine / haversine_matrix  — `preprocessing/geo_utils.py:23-93`
  * lla2ecef                      — `preprocessing/geo_utils.py:96-142`
  * ecef2lla                      — `preprocessing/geo_utils.py:145-257`

Design notes (TPU-first):
  * All `jnp` functions are shape-polymorphic pure functions, safe under
    `jit`/`vmap`/`pjit`, and dtype-preserving: feed float32 for device hot
    paths (loss label smoothing), float64 (with `jax.enable_x64`) or the
    `_np` twins for offline/metric paths.
  * `ecef2lla` uses a *fixed* 5-iteration Bowring fixed-point solve
    (`lax.fori_loop`-free, unrolled) instead of the reference's
    data-dependent `while` (`geo_utils.py:203-225`) — data-dependent
    iteration counts don't compile under XLA and 5 iterations is the
    reference's own upper bound.
  * The reference's closed-form `ecef2lla_np` contains a typo in the
    Heikkinen `G` term (`geo_utils.py:162`: `e_sq * ee * 2` instead of
    `e_sq * ee`); we implement the correct formula — round-trip error
    against `lla2ecef` is < 1e-9 degrees (tested) instead of inheriting
    the reference's meter-level bias.

Coordinate convention throughout the framework: points are `(lon, lat)` in
degrees, matching the reference (`geo_utils.py:27-28`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# WGS84 constants (reference geo_utils.py:6-21)
# ---------------------------------------------------------------------------

#: Equatorial radius of the Earth in meters (WGS84 semi-major axis).
EARTH_RADIUS_M = 6378137.0
#: Equatorial radius in kilometers — haversine distances are returned in km.
EARTH_RADIUS_KM = EARTH_RADIUS_M / 1000.0
#: WGS84 flattening factor.
WGS84_FLATTENING = 1.0 / 298.257223563

_A = EARTH_RADIUS_M
_F = WGS84_FLATTENING
_B = _A * (1.0 - _F)                      # semi-minor axis
_E_SQ = _F * (2.0 - _F)                   # first eccentricity squared
_EP_SQ = (_A**2 - _B**2) / _B**2          # second eccentricity squared
_E2_DIFF = _A**2 - _B**2


# ---------------------------------------------------------------------------
# Haversine
# ---------------------------------------------------------------------------

def haversine(x, y):
    """Pairwise haversine distance between aligned point sets, in km.

    Args:
        x: ``(..., 2)`` array of (lon, lat) degrees.
        y: ``(..., 2)`` array of (lon, lat) degrees, same shape as ``x``.

    Returns:
        ``(...)`` distances in kilometers.

    Parity: reference `preprocessing/geo_utils.py:40-55` (torch twin) —
    spherical haversine on the WGS84 equatorial radius.
    """
    x = jnp.deg2rad(x)
    y = jnp.deg2rad(y)
    dlon = y[..., 0] - x[..., 0]
    dlat = y[..., 1] - x[..., 1]
    a = (jnp.sin(dlat / 2.0) ** 2
         + jnp.cos(x[..., 1]) * jnp.cos(y[..., 1]) * jnp.sin(dlon / 2.0) ** 2)
    # Clip guards sqrt/arcsin from FP drift just outside [0, 1].
    c = 2.0 * jnp.arcsin(jnp.sqrt(jnp.clip(a, 0.0, 1.0)))
    return EARTH_RADIUS_KM * c


def haversine_matrix(x, y):
    """All-pairs haversine distances, in km.

    Args:
        x: ``(N, 2)`` array of (lon, lat) degrees.
        y: ``(M, 2)`` array of (lon, lat) degrees.

    Returns:
        ``(N, M)`` distance matrix in kilometers.

    Parity: reference `preprocessing/geo_utils.py:58-74` (which takes ``y``
    transposed as ``(2, M)``; we take ``(M, 2)`` — the natural layout for
    broadcasting and for sharding the geocell table across a mesh axis).
    """
    return haversine(x[..., :, None, :], y[..., None, :, :])


def haversine_np(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Float64 NumPy twin of :func:`haversine` for host-side metrics."""
    x = np.deg2rad(np.asarray(x, dtype=np.float64))
    y = np.deg2rad(np.asarray(y, dtype=np.float64))
    dlon = y[..., 0] - x[..., 0]
    dlat = y[..., 1] - x[..., 1]
    a = (np.sin(dlat / 2.0) ** 2
         + np.cos(x[..., 1]) * np.cos(y[..., 1]) * np.sin(dlon / 2.0) ** 2)
    c = 2.0 * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))
    return EARTH_RADIUS_KM * c


def haversine_matrix_np(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Float64 NumPy twin of :func:`haversine_matrix` (y as ``(M, 2)``)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    return haversine_np(x[:, None, :], y[None, :, :])


# ---------------------------------------------------------------------------
# LLA <-> ECEF
# ---------------------------------------------------------------------------

def lla2ecef(coords):
    """(lon, lat) degrees -> ECEF (x, y, z) meters on the WGS84 ellipsoid.

    Args:
        coords: ``(..., 2)`` array of (lon, lat) degrees.

    Returns:
        ``(..., 3)`` ECEF coordinates in meters (surface points, h=0).

    Parity: reference `preprocessing/geo_utils.py:120-142`.
    """
    rad = jnp.deg2rad(coords)
    lon, lat = rad[..., 0], rad[..., 1]
    cos_lat, sin_lat = jnp.cos(lat), jnp.sin(lat)
    ff = (1.0 - _F) ** 2
    c = 1.0 / jnp.sqrt(cos_lat**2 + ff * sin_lat**2)
    s = c * ff
    x = (_A * c) * cos_lat * jnp.cos(lon)
    y = (_A * c) * cos_lat * jnp.sin(lon)
    z = (_A * s) * sin_lat
    return jnp.stack([x, y, z], axis=-1)


def lla2ecef_np(coords: np.ndarray) -> np.ndarray:
    """Float64 NumPy twin of :func:`lla2ecef`."""
    rad = np.deg2rad(np.asarray(coords, dtype=np.float64))
    lon, lat = rad[..., 0], rad[..., 1]
    cos_lat, sin_lat = np.cos(lat), np.sin(lat)
    ff = (1.0 - _F) ** 2
    c = 1.0 / np.sqrt(cos_lat**2 + ff * sin_lat**2)
    s = c * ff
    x = (_A * c) * cos_lat * np.cos(lon)
    y = (_A * c) * cos_lat * np.sin(lon)
    z = (_A * s) * sin_lat
    return np.stack([x, y, z], axis=-1)


_BOWRING_ITERS = 5  # reference's own cap (`geo_utils.py:207`)


def ecef2lla(coords):
    """ECEF (x, y, z) meters -> (lon, lat) degrees via Bowring's method.

    Fixed 5-iteration fixed-point solve for the parametric latitude —
    statically unrolled so the function is jit/vmap-compilable (the reference
    torch twin iterates data-dependently to the same cap,
    `preprocessing/geo_utils.py:203-229`).

    Args:
        coords: ``(..., 3)`` ECEF meters.

    Returns:
        ``(..., 2)`` (lon, lat) in degrees.
    """
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    lon = jnp.arctan2(y, x)
    rho = jnp.sqrt(x**2 + y**2)

    a, b = _A, _B
    e2 = _E_SQ
    ae2 = a * e2
    bep2 = b * e2 / (1.0 - e2)

    # Bowring 1985 starting value for parametric latitude beta.
    r = jnp.sqrt(rho**2 + z**2)
    u = a * rho
    v = b * z * (1.0 + bep2 / r)
    hyp = jnp.sqrt(u**2 + v**2)
    cos_beta = u / hyp
    sin_beta = v / hyp

    for _ in range(_BOWRING_ITERS):
        u = rho - ae2 * cos_beta**3
        v = z + bep2 * sin_beta**3
        au = a * u
        bv = b * v
        hyp = jnp.sqrt(au**2 + bv**2)
        cos_beta = au / hyp
        sin_beta = bv / hyp

    lat = jnp.arctan2(v, u)
    return jnp.stack([jnp.rad2deg(lon), jnp.rad2deg(lat)], axis=-1)


def ecef2lla_np(coords: np.ndarray) -> np.ndarray:
    """Float64 closed-form (Heikkinen) ECEF -> (lon, lat) degrees.

    Parity: reference `preprocessing/geo_utils.py:145-174`, with its `G`-term
    typo corrected (see module docstring).
    """
    coords = np.asarray(coords, dtype=np.float64)
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    a, b, e_sq = _A, _B, _E_SQ

    r = np.sqrt(x**2 + y**2)
    f = 54.0 * b**2 * z**2
    g = r**2 + (1.0 - e_sq) * z**2 - e_sq * _E2_DIFF
    c = (e_sq**2) * f * r**2 / g**3
    s = np.cbrt(1.0 + c + np.sqrt(c**2 + 2.0 * c))
    p = f / (3.0 * (s + 1.0 / s + 1.0) ** 2 * g**2)
    q = np.sqrt(1.0 + 2.0 * e_sq**2 * p)
    r0 = (-(p * e_sq * r) / (1.0 + q)
          + np.sqrt(np.maximum(
              0.5 * a**2 * (1.0 + 1.0 / q)
              - p * (1.0 - e_sq) * z**2 / (q * (1.0 + q))
              - 0.5 * p * r**2, 0.0)))
    v = np.sqrt((r - e_sq * r0) ** 2 + (1.0 - e_sq) * z**2)
    z0 = b**2 * z / (a * v)
    lat = np.arctan((z + _EP_SQ * z0) / r)
    lon = np.arctan2(y, x)
    return np.stack([np.rad2deg(lon), np.rad2deg(lat)], axis=-1)
