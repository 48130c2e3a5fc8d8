"""Property-based tests (hypothesis) for the geometry engine.

Geometry code fails on edge cases, not happy paths — generate random
convex clips, subject rings, and point clouds and assert the invariants
that must hold for ANY input.
"""

import os

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pigeon_tpu.geocell import geometry as geom

# GEO_HYP_EXAMPLES=5000 for deep offline hunts; 60 keeps the suite fast.
settings.register_profile(
    "geo", max_examples=int(os.environ.get("GEO_HYP_EXAMPLES", "60")),
    deadline=None)
settings.load_profile("geo")


@st.composite
def convex_polygon(draw, max_radius=50.0):
    """Random convex ring: sorted angles around a center, varying radii."""
    n = draw(st.integers(3, 10))
    cx = draw(st.floats(-100, 100))
    cy = draw(st.floats(-50, 50))
    angles = np.sort(np.asarray(
        draw(st.lists(st.floats(0, 2 * np.pi - 1e-3), min_size=n,
                      max_size=n, unique=True))))
    radius = draw(st.floats(1.0, max_radius))
    pts = np.stack([cx + radius * np.cos(angles),
                    cy + radius * np.sin(angles)], -1)
    return pts


@st.composite
def simple_polygon(draw):
    """Random star-shaped (simple, possibly concave) ring.

    Simplicity requires EVERY consecutive angular gap (wraparound
    included) to stay below pi: with a gap > pi the chord between the
    two vertices passes on the far side of the center and can cross
    other edges (hypothesis-found at 3000 examples — sorted-unique
    angles alone generated a self-intersecting 'simple' ring whose
    clipped area exceeded the subject's). Gaps are drawn over a wide
    ratio ([0.01, 1] — SMALL gaps make the near-collinear sliver
    vertices that found the polygon_area conditioning bug and must
    stay generatable); only when the largest fraction reaches 0.45 is
    the vector blended toward uniform just enough to cap it — a
    deterministic transform, so hypothesis shrinking stays valid."""
    n = draw(st.integers(3, 12))
    cx = draw(st.floats(-100, 100))
    cy = draw(st.floats(-50, 50))
    rot = draw(st.floats(0, 2 * np.pi))
    gaps = np.asarray(draw(st.lists(st.floats(0.01, 1.0), min_size=n,
                                    max_size=n)))
    f = gaps / gaps.sum()
    if f.max() > 0.45:
        lam = (0.45 - 1.0 / n) / (f.max() - 1.0 / n)
        f = lam * f + (1 - lam) / n
    angles = rot + 2 * np.pi * np.cumsum(f)
    radii = np.asarray(draw(st.lists(st.floats(0.5, 40.0), min_size=n,
                                     max_size=n)))
    return np.stack([cx + radii * np.cos(angles),
                     cy + radii * np.sin(angles)], -1)


class TestClipProperties:
    def test_degenerate_clip_clips_everything(self):
        """Regression: near-coincident clip vertices (area 0) must yield an
        empty intersection, not the unclipped subject (hypothesis-found)."""
        subject = np.array([[1.0, 0.0],
                            [0.54030231, 0.84147098],
                            [-0.41614684, 0.90929743]])
        clip = np.array([[1.0, 0.0],
                         [1.0, 1.08451872e-236],
                         [1.0, 4.39525567e-229]])
        out = geom.clip_to_convex(subject, clip)
        assert len(out) < 3 or abs(geom.polygon_area(out)) <= 1e-9
        # All-coincident and sub-3-vertex clips are empty outright.
        pt = np.array([[5.0, 5.0]] * 3)
        assert len(geom.clip_to_convex(subject, pt)) == 0
        assert len(geom.clip_to_convex(subject, subject[:2])) == 0

    @given(subject=simple_polygon(), clip=convex_polygon())
    def test_clip_area_bounded(self, subject, clip):
        out = geom.clip_to_convex(subject, clip)
        if len(out) < 3:
            return
        a_out = abs(geom.polygon_area(out))
        a_subj = abs(geom.polygon_area(subject))
        a_clip = abs(geom.polygon_area(clip))
        assert a_out <= min(a_subj, a_clip) * (1 + 1e-9) + 1e-9

    @given(clip=convex_polygon())
    def test_clip_self_is_identity_area(self, clip):
        out = geom.clip_to_convex(clip, clip)
        assert abs(geom.polygon_area(out)) == pytest.approx(
            abs(geom.polygon_area(clip)), rel=1e-9, abs=1e-12)

    def test_clip_self_noise_length_edge(self):
        """Pinned hypothesis falsifier (r7): a vertex repeated to within
        1 ulp (edge length ~9e-16, NOT exactly 0) produced a pure-noise
        half-plane normal that sliced a real corner off the subject
        (rel area loss ~1e-6). Edges negligible vs the clip extent must
        be skipped like exactly-zero ones."""
        clip = np.array([
            [1.000000000000000e+00, 0.000000000000000e+00],
            [5.403023058681398e-01, 8.414709848078965e-01],
            [9.999995000000417e-01, -9.999998333348088e-04],
            [9.999995000000417e-01, -9.999998333339206e-04]])
        out = geom.clip_to_convex(clip, clip)
        assert abs(geom.polygon_area(out)) == pytest.approx(
            abs(geom.polygon_area(clip)), rel=1e-9, abs=1e-12)

    @given(subject=simple_polygon(), clip=convex_polygon())
    def test_clip_points_inside_clip(self, subject, clip):
        if abs(geom.polygon_area(clip)) < 1e-3:
            return  # degenerate sliver clips: boundary FP dominates
        out = geom.clip_to_convex(subject, clip)
        if len(out) < 3:
            return
        # Every output vertex satisfies every clip half-plane (with FP
        # tolerance) — the defining property of Sutherland-Hodgman output.
        ring = geom.as_ring(clip)
        if geom.polygon_area(ring) < 0:
            ring = ring[::-1]
        for i in range(len(ring)):
            a, b = ring[i], ring[(i + 1) % len(ring)]
            edge = b - a
            side = edge[0] * (out[:, 1] - a[1]) - edge[1] * (out[:, 0] - a[0])
            assert (side >= -1e-6 * (1 + np.abs(side).max())).all()


class TestPipProperties:
    @given(poly=simple_polygon(),
           seed=st.integers(0, 2**31 - 1))
    def test_centroid_of_convexified_inside(self, poly, seed):
        hull = geom.convex_hull(poly)
        # Degenerate slivers: centroid-inside is not FP-guaranteed.
        if len(hull) < 3 or abs(geom.polygon_area(hull)) < 1e-3:
            return
        c = geom.polygon_centroid(hull)
        assert geom.points_in_ring(c[None], hull)[0]

    @given(poly=convex_polygon(), seed=st.integers(0, 2**31 - 1))
    def test_numpy_native_agree(self, poly, seed):
        from pigeon_tpu import native

        if not native.available():
            return
        rng = np.random.default_rng(seed)
        bb = geom.bbox(poly)
        pts = np.stack([rng.uniform(bb[0] - 5, bb[2] + 5, 200),
                        rng.uniform(bb[1] - 5, bb[3] + 5, 200)], -1)
        np.testing.assert_array_equal(
            geom.points_in_ring(pts, poly),
            native.pip_batch(pts, geom.as_ring(poly)))


class TestDissolveProperties:
    @given(seed=st.integers(0, 2**31 - 1), k=st.integers(2, 8))
    def test_voronoi_partition_dissolves_to_parent(self, seed, k):
        """Carving a convex parent into k Voronoi territories and
        dissolving the pieces must recover the parent's area exactly
        (shared borders cancel; shells minus holes)."""
        from pigeon_tpu.geocell.voronoi import voronoi_regions_for_points

        rng = np.random.default_rng(seed)
        sites = rng.uniform(1, 9, (k, 2))
        self._check_partition(sites)

    @given(seed=st.integers(0, 2**31 - 1), k=st.integers(2, 6),
           scale=st.sampled_from([1.0, 1e-2, 1e-5, 1e-8]))
    def test_voronoi_partition_near_coincident_sites(self, seed, k, scale):
        """Same invariant with sites clustered arbitrarily tightly — the
        configuration that broke the ridge-extension reconstruction
        (hypothesis seed 9027, k=3 lost 3% of the parent's area).

        AREA is exact at every scale. The one-component claim holds only
        down to site separations ~100x dissolve's snap (1e-7): where
        three cells meet, each cell computes the corner from a DIFFERENT
        bisector pair, and below ~1e-5 separation those float results
        can differ by more than the snap — edge cancellation then leaves
        a measure-zero sliver component (hypothesis seed 2044, k=5,
        scale 1e-5: vertices 2.5e-6 apart). Production `Cell.split`
        repairs such fragments via `clean_dirty_splits`; here we assert
        any extra component is a sub-1e-6 sliver."""
        rng = np.random.default_rng(seed)
        anchor = rng.uniform(2, 8, (1, 2))
        sites = anchor + rng.uniform(-scale, scale, (k, 2))
        self._check_partition(sites, one_component=scale >= 1e-4)

    def _check_partition(self, sites, one_component=True):
        from pigeon_tpu.geocell.voronoi import voronoi_regions_for_points

        parent = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
        k = len(sites)
        if len(np.unique(sites, axis=0)) < k:
            return  # exact duplicates share a region; partition not 1:1
        regions = voronoi_regions_for_points(sites)
        pieces = []
        for region in regions:
            clipped = geom.clip_to_convex(parent, region)
            if len(clipped) >= 3:
                pieces.append(clipped)
        out = geom.dissolve(pieces)
        total = sum(abs(geom.polygon_area(s)) for s, _ in out) \
            - sum(abs(geom.polygon_area(h)) for _, hs in out for h in hs)
        assert total == pytest.approx(100.0, rel=1e-6)
        if one_component:
            assert len(out) == 1, "a partition of a square dissolves to one"
        else:
            areas = sorted((abs(geom.polygon_area(s)) for s, _ in out),
                           reverse=True)
            assert areas[0] == pytest.approx(100.0, rel=1e-5)
            assert all(a < 1e-6 for a in areas[1:]), areas

    @given(seed=st.integers(0, 2**31 - 1))
    def test_dissolve_idempotent_on_shells(self, seed):
        rng = np.random.default_rng(seed)
        a = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)
        b = a + [4.0, 0.0]          # shares the x=4 edge
        c = a + [20.0, 0.0]         # disjoint
        out1 = geom.dissolve([a, b, c])
        shells = [s for s, _ in out1]
        out2 = geom.dissolve(shells)
        area1 = sum(abs(geom.polygon_area(s)) for s, _ in out1)
        area2 = sum(abs(geom.polygon_area(s)) for s, _ in out2)
        assert area1 == pytest.approx(area2, rel=1e-9)
        assert len(out1) == len(out2) == 2


class TestAreaProperties:
    @given(poly=convex_polygon(), factor=st.floats(0.1, 3.0))
    def test_scaling_scales_area_quadratically(self, poly, factor):
        scaled = geom.scale_about_centroid(poly, factor)
        assert abs(geom.polygon_area(scaled)) == pytest.approx(
            abs(geom.polygon_area(poly)) * factor**2, rel=1e-9)

    @given(poly=simple_polygon())
    def test_wkt_roundtrip_preserves_area(self, poly):
        parsed = geom.from_wkt(geom.to_wkt(poly))
        if not parsed:
            # A ring whose extent underflows as_ring's 1e-12-degree
            # closure floor (~0.1 um) serializes as POLYGON EMPTY —
            # legitimate only for (numerically) zero-area input, and
            # production callers (geocell/assignment.py:49) handle the
            # empty parse by nearest-centroid fallback.
            assert abs(geom.polygon_area(poly)) < 1e-20
            return
        back = parsed[0]
        # WKT uses 6 decimal places; compare accordingly.
        assert abs(geom.polygon_area(back)) == pytest.approx(
            abs(geom.polygon_area(poly)), rel=1e-3, abs=1e-4)
