"""Finite Voronoi tessellation.

`scipy.spatial.Voronoi` leaves boundary regions infinite; geocell splitting
needs closed polygons to carve cluster territories
(reference `dataset_creation/geocell/voronoi.py:5-85`, itself a public-gist
adaptation). This is an independent implementation of the same
reconstruction: every infinite ridge is extended `radius` away from the
point-cloud center, then each region's vertices are sorted CCW around the
region's point.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
from scipy.spatial import Voronoi


def voronoi_finite_polygons(vor: Voronoi, radius: float = None
                            ) -> Tuple[List[List[int]], np.ndarray]:
    """Close the infinite regions of a 2-D Voronoi diagram.

    Args:
        vor: scipy Voronoi of >= 3 points (2-D).
        radius: how far to extend infinite ridges (default: 100x the
            point-cloud span — "effectively infinity" for geocell shapes
            that get clipped to a parent polygon right after).

    Returns:
        (regions, vertices): per-input-point lists of vertex indices into
        `vertices` (CCW), all finite.
    """
    if vor.points.shape[1] != 2:
        raise ValueError("2-D input required")

    center = vor.points.mean(axis=0)
    span = np.ptp(vor.points, axis=0).max()
    if radius is None:
        # Must dwarf both the site span AND the farthest Voronoi vertex:
        # near-coincident sites push circumcenters arbitrarily far out, and
        # extensions anchored there must still reach back across the cloud.
        vertex_reach = (np.abs(vor.vertices - center).max()
                        if len(vor.vertices) else 0.0)
        radius = max(span, vertex_reach, 1e-3) * 100

    vertices = list(vor.vertices)

    # All ridges incident to each point.
    ridges: dict[int, list] = {}
    for (p1, p2), (v1, v2) in zip(vor.ridge_points, vor.ridge_vertices):
        ridges.setdefault(p1, []).append((p2, v1, v2))
        ridges.setdefault(p2, []).append((p1, v1, v2))

    regions: List[List[int]] = []
    for p1, region_idx in enumerate(vor.point_region):
        region = vor.regions[region_idx]
        if all(v >= 0 for v in region):
            regions.append(list(region))
            continue

        new_region = [v for v in region if v >= 0]
        for p2, v1, v2 in ridges.get(p1, []):
            if v2 < 0:
                v1, v2 = v2, v1
            if v1 >= 0:
                continue  # finite ridge

            # Direction: perpendicular to the p1-p2 line, pointing away
            # from the cloud center.
            t = vor.points[p2] - vor.points[p1]
            t = t / np.linalg.norm(t)
            normal = np.array([-t[1], t[0]])
            midpoint = (vor.points[p1] + vor.points[p2]) / 2.0
            direction = np.sign(np.dot(midpoint - center, normal)) * normal
            far = vor.vertices[v2] + direction * radius
            new_region.append(len(vertices))
            vertices.append(far)

        # Sort region vertices CCW around their mean.
        vs = np.asarray([vertices[v] for v in new_region])
        c = vs.mean(axis=0)
        order = np.argsort(np.arctan2(vs[:, 1] - c[1], vs[:, 0] - c[0]))
        regions.append([new_region[i] for i in order])

    return regions, np.asarray(vertices)


def voronoi_regions_for_points(coords: np.ndarray,
                               radius: float = None) -> List[np.ndarray]:
    """Convenience: coords ``(N>=3, 2)`` -> list of N closed convex rings,
    ordered like the input points."""
    coords = np.asarray(coords, np.float64)
    uniq, inverse = np.unique(coords, axis=0, return_inverse=True)
    if len(uniq) < 3:
        raise ValueError("need >= 3 distinct points for Voronoi")
    vor = Voronoi(uniq)
    regions, vertices = voronoi_finite_polygons(vor, radius)
    rings = [vertices[r] for r in regions]
    return [rings[i] for i in inverse]
