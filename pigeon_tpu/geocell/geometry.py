"""Dependency-free planar geometry for geocell work.

The reference leans on shapely/GEOS for polygon surgery
(`dataset_creation/geocell/cell.py`), neither of which exists in this
environment. This module provides the minimal algebra the geocell pipeline
actually needs, in vectorized numpy:

  * ring area / centroid (shoelace), bounding boxes;
  * batched point-in-polygon (even-odd ray casting);
  * polygon-polygon intersection TEST (segment crossing + containment) —
    used for adjacency during cell fusing (`cell_collection.py:195-230`);
  * convex clipping (Sutherland-Hodgman) — sufficient and exact for
    intersecting shapes with finite Voronoi regions, which are always
    convex (`cell.py:233-273`);
  * scale-about-centroid (the reference's 1.01x adjacency trick).

Polygons are ``(N, 2)`` float64 arrays of (lon, lat) ring vertices
(unclosed; closure is implicit). A MultiPolygon is a list of rings. Holes
are not modeled — for geocell purposes holes only matter for "doughnut"
splits, which are handled at the cell level by point set difference.

Coordinates are treated as PLANAR lon/lat — polygons spanning the +-180
antimeridian are not unwrapped. This matches the reference exactly
(shapely on raw EPSG:4326 coordinates has the same behavior); admin
boundary products ship antimeridian-split polygons, so it only affects
synthetic shapes that deliberately cross the dateline.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

Polygon = np.ndarray          # (N, 2) ring, implicit closure
MultiPolygon = List[np.ndarray]


def as_ring(poly) -> np.ndarray:
    """Coerce to an unclosed (N, 2) float64 ring."""
    ring = np.asarray(poly, np.float64)
    if ring.ndim != 2 or ring.shape[1] != 2:
        raise ValueError(f"ring must be (N, 2), got {ring.shape}")
    if len(ring) > 1 and np.allclose(ring[0], ring[-1]):
        ring = ring[:-1]
    return ring


def polygon_area(poly: Polygon) -> float:
    """Signed shoelace area (positive for counter-clockwise rings)."""
    r = as_ring(poly)
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def polygon_centroid(poly: Polygon) -> np.ndarray:
    """Area centroid of a ring (vertex mean fallback for degenerate rings)."""
    r = as_ring(poly)
    x, y = r[:, 0], r[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    cross = x * yn - xn * y
    a = cross.sum() / 2.0
    if abs(a) < 1e-12:
        return r.mean(axis=0)
    cx = np.sum((x + xn) * cross) / (6.0 * a)
    cy = np.sum((y + yn) * cross) / (6.0 * a)
    return np.array([cx, cy])


def bbox(poly: Polygon) -> np.ndarray:
    r = as_ring(poly)
    return np.array([r[:, 0].min(), r[:, 1].min(),
                     r[:, 0].max(), r[:, 1].max()])


def bboxes_overlap(a: np.ndarray, b: np.ndarray) -> bool:
    return not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])


def points_in_ring(points: np.ndarray, ring: Polygon) -> np.ndarray:
    """Vectorized even-odd ray casting: ``(N, 2)`` points vs one ring."""
    ring = as_ring(ring)
    pts = np.atleast_2d(np.asarray(points, np.float64))
    x, y = pts[:, 0:1], pts[:, 1:2]
    x0, y0 = ring[:, 0], ring[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    straddle = (y0 <= y) != (y1 <= y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xs = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
    inside = (np.sum(straddle & (xs > x), axis=1) % 2) == 1
    return inside


def points_in_multipolygon(points: np.ndarray,
                           rings: Sequence[Polygon]) -> np.ndarray:
    pts = np.atleast_2d(points)
    # Native (OpenMP) path for large workloads; numpy fallback otherwise.
    if len(pts) * sum(len(r) for r in rings) > 200_000:
        from pigeon_tpu import native

        if native.available():
            return native.pip_multi(pts, [as_ring(r) for r in rings])
    out = np.zeros(len(pts), bool)
    for ring in rings:
        remaining = ~out
        if not remaining.any():
            break
        out[remaining] |= points_in_ring(pts[remaining], ring)
    return out


def _segments_cross(a0, a1, b0, b1) -> bool:
    """Do any segment in batch A properly intersect any in batch B?

    a0, a1: (N, 2) segment endpoints; b0, b1: (M, 2).
    """
    d1 = a1 - a0                                         # (N, 2)
    d2 = b1 - b0                                         # (M, 2)
    diff = b0[None, :, :] - a0[:, None, :]               # (N, M, 2)
    denom = d1[:, None, 0] * d2[None, :, 1] - \
        d1[:, None, 1] * d2[None, :, 0]                  # (N, M)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (diff[..., 0] * d2[None, :, 1]
             - diff[..., 1] * d2[None, :, 0]) / denom
        u = (diff[..., 0] * d1[:, None, 1]
             - diff[..., 1] * d1[:, None, 0]) / denom
    hit = (np.abs(denom) > 1e-18) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    return bool(hit.any())


def rings_intersect(a: Polygon, b: Polygon) -> bool:
    """Do two rings intersect (boundary crossing or containment)?"""
    a, b = as_ring(a), as_ring(b)
    if not bboxes_overlap(bbox(a), bbox(b)):
        return False
    if points_in_ring(a[:1], b)[0] or points_in_ring(b[:1], a)[0]:
        return True
    return _segments_cross(a, np.roll(a, -1, 0), b, np.roll(b, -1, 0))


def polygons_intersect(a: Sequence[Polygon] | Polygon,
                       b: Sequence[Polygon] | Polygon) -> bool:
    """MultiPolygon-aware intersection test (adjacency predicate)."""
    aa = [a] if isinstance(a, np.ndarray) else list(a)
    bb = [b] if isinstance(b, np.ndarray) else list(b)
    return any(rings_intersect(ra, rb) for ra in aa for rb in bb)


def scale_about_centroid(poly: Polygon, factor: float,
                         origin: np.ndarray = None) -> Polygon:
    """Scale a ring about its (or a supplied) centroid — the reference's
    1.01x adjacency buffer (`cell_collection.py:195`)."""
    r = as_ring(poly)
    c = polygon_centroid(r) if origin is None else np.asarray(origin)
    return c + factor * (r - c)


def clip_to_convex(subject: Polygon, clip: Polygon) -> Polygon:
    """Sutherland-Hodgman: clip an arbitrary ring to a CONVEX ring.

    Exact for our use — Voronoi regions are convex by construction
    (`cell.py:252-263` intersects Voronoi regions with cell shapes).
    Returns an empty (0, 2) array when the intersection is empty.
    """
    empty = np.empty((0, 2), np.float64)
    clip = as_ring(clip)
    if len(clip) < 3:
        return empty
    # Degenerate clip (all vertices effectively coincident or collinear):
    # the intersection is measure-zero — clip everything away. Guard on
    # extent so tiny-but-real slivers still go through the edge loop
    # (identity clips of slivers must survive).
    extent = float(max(np.ptp(clip[:, 0]), np.ptp(clip[:, 1])))
    if extent == 0.0:
        return empty
    if polygon_area(clip) < 0:        # ensure CCW so "inside" = left side
        clip = clip[::-1]
    output = as_ring(subject)

    for i in range(len(clip)):
        if len(output) == 0:
            break
        a, b = clip[i], clip[(i + 1) % len(clip)]
        edge = b - a
        edge_len = float(np.hypot(edge[0], edge[1]))
        if edge_len == 0.0:
            continue                  # zero-length edge constrains nothing
        rel = output - a
        # inside = left of edge (CCW clip ring). The tolerance must scale
        # with |edge|·|rel| — an absolute epsilon lets near-coincident clip
        # vertices (edge ~1e-200) pass every point and return the subject
        # unclipped (hypothesis-found regression).
        side = edge[0] * rel[:, 1] - edge[1] * rel[:, 0]
        tol = 1e-12 * edge_len * (np.hypot(rel[:, 0], rel[:, 1]) + 1.0)
        inside = side >= -tol

        new_pts = []
        n = len(output)
        for j in range(n):
            k = (j + 1) % n
            p, q = output[j], output[k]
            pin, qin = inside[j], inside[k]
            if pin:
                new_pts.append(p)
            if pin != qin:
                # Intersection of segment pq with the infinite clip edge.
                d = q - p
                denom = edge[0] * d[1] - edge[1] * d[0]
                d_len = float(np.hypot(d[0], d[1]))
                if abs(denom) > 1e-15 * edge_len * (d_len + 1.0):
                    t = (edge[0] * (a[1] - p[1])
                         - edge[1] * (a[0] - p[0])) / denom
                    new_pts.append(p + t * d)
        output = np.asarray(new_pts, np.float64).reshape(-1, 2)
    return output


def convex_hull(points: np.ndarray) -> Polygon:
    """Convex hull ring (Andrew's monotone chain), CCW."""
    pts = np.unique(np.asarray(points, np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2:
                a = out[-1] - out[-2]
                b = p - out[-2]
                if a[0] * b[1] - a[1] * b[0] > 0:   # strict left turn
                    break
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


def to_wkt(rings: Sequence[Polygon] | Polygon) -> str:
    """Serialize as WKT POLYGON/MULTIPOLYGON (closing rings), matching the
    reference's geocell CSV geometry column."""
    if isinstance(rings, np.ndarray):
        rings = [rings]
    rings = [as_ring(r) for r in rings if len(as_ring(r)) >= 3]
    if not rings:
        return "POLYGON EMPTY"

    def ring_str(r):
        closed = np.vstack([r, r[:1]])
        return "(" + ", ".join(f"{x:.6f} {y:.6f}" for x, y in closed) + ")"

    if len(rings) == 1:
        return f"POLYGON ({ring_str(rings[0])})"
    return ("MULTIPOLYGON ("
            + ", ".join(f"({ring_str(r)})" for r in rings) + ")")


def from_wkt(wkt: str) -> MultiPolygon:
    """Parse POLYGON/MULTIPOLYGON WKT (outer rings only; holes dropped)."""
    s = wkt.strip()
    if s.upper().startswith("POLYGON EMPTY"):
        return []

    def parse_ring(text: str) -> np.ndarray:
        pairs = [p.strip() for p in text.split(",")]
        return as_ring(np.asarray(
            [[float(v) for v in p.split()[:2]] for p in pairs]))

    import re
    body = s[s.index("(") :]
    if s.upper().startswith("MULTIPOLYGON"):
        polys = re.findall(r"\(\(([^()]+)\)", body)
        return [parse_ring(p) for p in polys]
    ring = re.findall(r"\(([^()]+)\)", body)
    return [parse_ring(ring[0])]
