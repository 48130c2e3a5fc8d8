"""Pallas TPU kernel: fused haversine distance matrix + label smoothing.

Every training step computes a ``(batch, num_cells)`` haversine matrix from
the true locations to all geocell centroids, then smooths it into soft
targets (reference `super_guessr.py:469-471`). Unfused, XLA materializes
several (B, C) intermediates (radians, sin/cos products, the distance
matrix, the row-min broadcast) in HBM. This kernel computes the whole
pipeline per (row-tile x full cell axis) block in VMEM: trig -> distance ->
row-min -> exp, writing ONLY the final targets.

Layout notes (see pallas_guide.md):
  * cells are fed as ``(2, C)`` so the C axis lands on lanes (C padded to a
    multiple of 128 by the wrapper; padding cells sit at +inf distance so
    they get weight ~0 and never win the row-min);
  * each grid step owns a ``(TILE_B, C)`` block — for C=2304 (2203 cells
    padded) and TILE_B=128 that is ~1.2 MB of f32 in VMEM;
  * everything is VPU elementwise work; the only reduction is the row min.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pigeon_tpu.core.geodesy import EARTH_RADIUS_KM

TILE_B = 128
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


#: Abramowitz & Stegun 4.4.46 arcsin coefficients (|error| <= 2e-8 on
#: [0, 1] — below f32 resolution). Mosaic lowers only sin/cos/sqrt/exp;
#: there is no asin/atan primitive on TPU (verified on hardware).
_ASIN_COEFFS = (1.5707963050, -0.2145988016, 0.0889789874, -0.0501743046,
                0.0308918810, -0.0170881256, 0.0066700901, -0.0012624911)


def _arcsin01(x):
    """arcsin for x in [0, 1] via A&S 4.4.46 (TPU-lowerable ops only)."""
    poly = jnp.full_like(x, np.float32(_ASIN_COEFFS[7]))
    for c in _ASIN_COEFFS[6::-1]:
        poly = poly * x + np.float32(c)
    return np.float32(np.pi / 2) - jnp.sqrt(1.0 - x) * poly


def _smooth_kernel(labels_ref, cells_ref, out_ref, *, tau_km: float,
                   num_cells: int):
    """One (TILE_B, C_pad) block: distances + row-min smoothing."""
    lon1 = labels_ref[:, 0:1]                 # (TILE_B, 1) degrees
    lat1 = labels_ref[:, 1:2]
    lon2 = cells_ref[0:1, :]                  # (1, C_pad) degrees
    lat2 = cells_ref[1:2, :]

    deg2rad = np.float32(np.pi / 180.0)
    lon1, lat1 = lon1 * deg2rad, lat1 * deg2rad
    lon2, lat2 = lon2 * deg2rad, lat2 * deg2rad

    sin_dlat = jnp.sin((lat2 - lat1) * 0.5)
    sin_dlon = jnp.sin((lon2 - lon1) * 0.5)
    a = sin_dlat * sin_dlat + \
        jnp.cos(lat1) * jnp.cos(lat2) * sin_dlon * sin_dlon
    a = jnp.clip(a, 0.0, 1.0)
    d = (2.0 * np.float32(EARTH_RADIUS_KM)) * _arcsin01(jnp.sqrt(a))

    # Padding cells must not win the min nor get weight: push them far out.
    c_pad = out_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, c_pad), 1)
    d = jnp.where(col < num_cells, d, jnp.float32(1e30))

    dmin = jnp.min(d, axis=1, keepdims=True)
    out_ref[:, :] = jnp.exp((dmin - d) * np.float32(1.0 / tau_km))


@functools.partial(jax.jit, static_argnames=("tau_km",))
def smooth_labels_from_points(labels, geocells, tau_km: float = 75.0):
    """Fused ``(B, 2) x (C, 2) -> (B, C)`` smoothed geocell targets.

    Drop-in replacement for
    ``smooth_labels(haversine_matrix(labels, geocells), tau_km)`` on TPU.
    Padding (both batch and cell axes) is handled internally; outputs are
    sliced back to ``(B, num_cells)``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    labels = jnp.asarray(labels, jnp.float32)
    geocells = jnp.asarray(geocells, jnp.float32)
    b, num_cells = labels.shape[0], geocells.shape[0]
    b_pad = _round_up(max(b, 8), TILE_B) if b > 8 else 8
    c_pad = _round_up(num_cells, LANE)

    labels_p = jnp.zeros((b_pad, 2), jnp.float32).at[:b].set(labels)
    cells_p = jnp.full((2, c_pad), 0.0, jnp.float32) \
        .at[:, :num_cells].set(geocells.T)

    tile_b = min(TILE_B, b_pad)
    grid = (b_pad // tile_b,)
    out = pl.pallas_call(
        functools.partial(_smooth_kernel, tau_km=float(tau_km),
                          num_cells=num_cells),
        out_shape=jax.ShapeDtypeStruct((b_pad, c_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, c_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(labels_p, cells_p)
    return out[:b, :num_cells]


def smooth_labels_reference(labels, geocells, tau_km: float = 75.0):
    """XLA reference implementation (for parity tests + non-TPU fallback)."""
    from pigeon_tpu.core.geodesy import haversine_matrix
    from pigeon_tpu.core.scoring import smooth_labels

    return smooth_labels(haversine_matrix(labels, geocells), tau_km)
