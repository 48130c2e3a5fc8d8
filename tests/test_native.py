"""Native geo kernels: build, parity vs numpy, and speed sanity."""

import numpy as np
import pytest

from pigeon_tpu import native
from pigeon_tpu.core.geodesy import haversine_matrix_np
from pigeon_tpu.geocell import geometry as geom

RNG = np.random.default_rng(77)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain / native build failed")


def square(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]],
                    float)


class TestPip:
    def test_matches_numpy_ring(self):
        ring = np.array([[0, 0], [10, 0], [10, 5], [5, 5], [5, 10], [0, 10]],
                        float)
        pts = RNG.uniform(-2, 12, size=(5000, 2))
        got = native.pip_batch(pts, ring)
        want = geom.points_in_ring(pts, ring)
        np.testing.assert_array_equal(got, want)

    def test_multi(self):
        rings = [square(0, 0, 4), square(6, 6, 4)]
        pts = RNG.uniform(-1, 11, size=(3000, 2))
        got = native.pip_multi(pts, rings)
        want = geom.points_in_multipolygon(pts, rings)
        np.testing.assert_array_equal(got, want)

    def test_assign_features(self):
        feats = [[square(0, 0, 10)], [square(10, 0, 10), square(25, 0, 3)]]
        bboxes = np.array([[0, 0, 10, 10], [10, 0, 28, 10]], float)
        pts = np.array([[5, 5], [15, 5], [26, 1], [50, 50]], float)
        got = native.assign_features(pts, feats, bboxes)
        np.testing.assert_array_equal(got, [0, 1, 1, -1])


class TestHaversine:
    def test_matches_numpy(self):
        x = np.stack([RNG.uniform(-180, 180, 300),
                      RNG.uniform(-70, 70, 300)], -1)
        y = np.stack([RNG.uniform(-180, 180, 200),
                      RNG.uniform(-70, 70, 200)], -1)
        got = native.haversine_matrix(x, y)
        want = haversine_matrix_np(x, y)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-9)

    def test_speed_sanity(self):
        import time

        pts = np.stack([RNG.uniform(-180, 180, 2000),
                        RNG.uniform(-70, 70, 2000)], -1)
        t0 = time.perf_counter()
        native.haversine_matrix(pts, pts)
        t_native = time.perf_counter() - t0
        t0 = time.perf_counter()
        haversine_matrix_np(pts, pts)
        t_numpy = time.perf_counter() - t0
        # Native should never be drastically slower than numpy.
        assert t_native < t_numpy * 3
