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


class TestMultipolyIntersect:
    def test_matches_numpy_polygons_intersect(self):
        def rnd_ring(cx, cy, r):
            ang = np.sort(RNG.uniform(0, 2 * np.pi, 8))
            return np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)],
                            -1)

        for _ in range(100):
            subj = [rnd_ring(RNG.uniform(-3, 3), RNG.uniform(-3, 3),
                             RNG.uniform(0.2, 2))
                    for _ in range(RNG.integers(1, 4))]
            cands = [[rnd_ring(RNG.uniform(-6, 6), RNG.uniform(-6, 6),
                               RNG.uniform(0.2, 2))
                      for _ in range(RNG.integers(1, 4))]
                     for _ in range(10)]
            got = native.multipoly_intersect_batch(subj, cands)
            want = np.array([geom.polygons_intersect(subj, c)
                             for c in cands])
            np.testing.assert_array_equal(got, want)

    def test_containment_and_empty(self):
        outer = square(0, 0, 10)
        inner = square(4, 4, 1)          # fully inside: no edge crossing
        far = square(50, 50, 1)
        got = native.multipoly_intersect_batch(
            [outer], [[inner], [far], []])
        np.testing.assert_array_equal(got, [True, False, False])


class TestOptics:
    """The native OPTICS graph must be BIT-identical to sklearn's
    `compute_optics_graph` (max_eps=inf) so that `cluster_optics_xi` on
    top of it reproduces `OPTICS(...).fit_predict` exactly — the geocell
    split ladder (`cells.py`) and the prototype builder (`prototypes.py`)
    both route through it (reference contract:
    `dataset_creation/geocell/cell.py:336-418`,
    `dataset_creation/prototype/prototype.py:135-149`)."""

    @staticmethod
    def blobs(n, k, spread, seed):
        rng = np.random.default_rng(seed)
        centers = rng.uniform(-50, 50, (k, 2))
        return (centers[rng.integers(0, k, n)]
                + rng.normal(0, spread, (n, 2)))

    def test_graph_arrays_match_sklearn(self):
        from sklearn.cluster import OPTICS

        pts = self.blobs(400, 5, 1.0, seed=3)
        ref = OPTICS(min_samples=8, xi=0.05).fit(pts)
        ordering, core, reach, pred = native.optics_graph(pts, 8)
        np.testing.assert_array_equal(ordering, ref.ordering_)
        np.testing.assert_array_equal(core, ref.core_distances_)
        np.testing.assert_array_equal(reach, ref.reachability_)
        np.testing.assert_array_equal(pred, ref.predecessor_)

    @pytest.mark.parametrize("n,min_samples,xi", [
        (400, 8, 0.05),       # streetview ladder entry
        (500, 15, 0.015),     # streetview ladder entry
        (600, 300, 0.05),     # planet ladder entry (clamped regime)
    ])
    def test_labels_match_sklearn_euclidean(self, n, min_samples, xi):
        from sklearn.cluster import OPTICS

        from pigeon_tpu.geocell.optics import optics_xi_labels

        pts = self.blobs(n, 6, 1.2, seed=n)
        want = OPTICS(min_samples=min_samples, xi=xi).fit_predict(pts)
        got = optics_xi_labels(pts, min_samples, xi)
        np.testing.assert_array_equal(got, want)

    def test_parallel_path_matches_serial_bitwise(self, tmp_path):
        """The OpenMP fused relax+argmin path (m >= 8192, per-thread
        argmin chunks merged with first-occurrence tie-breaking) must be
        BIT-identical to the serial path. This box may expose 1 CPU, so
        the multi-threaded run happens in a subprocess with
        OMP_NUM_THREADS=8 (OpenMP timeslices threads over fewer cores —
        the merge logic still executes with nt > 1)."""
        import os
        import subprocess
        import sys

        n = 10_000   # above the 8192 OpenMP threshold
        pts = self.blobs(n, 6, 1.5, seed=11)
        ordering, core, reach, pred = native.optics_graph(pts, 300)

        pts_file = tmp_path / "pts.npy"
        out_file = tmp_path / "graph.npz"
        np.save(pts_file, pts)
        code = (
            "import numpy as np\n"
            "from pigeon_tpu import native\n"
            "pts = np.load(%r)\n"
            "o, c, r, p = native.optics_graph(pts, 300)\n"
            "np.savez(%r, o=o, c=c, r=r, p=p)\n"
            % (str(pts_file), str(out_file)))
        env = dict(os.environ, OMP_NUM_THREADS="8",
                   PYTHONPATH=os.pathsep.join(
                       [os.getcwd()] + sys.path))
        subprocess.run([sys.executable, "-c", code], check=True, env=env,
                       timeout=300)
        got = np.load(out_file)
        np.testing.assert_array_equal(got["o"], ordering)
        np.testing.assert_array_equal(got["c"], core)
        np.testing.assert_array_equal(got["r"], reach)
        np.testing.assert_array_equal(got["p"], pred)

    def test_labels_match_sklearn_precomputed_haversine(self):
        from sklearn.cluster import OPTICS

        from pigeon_tpu.geocell.optics import optics_xi_labels

        rng = np.random.default_rng(9)
        pts = np.stack([rng.uniform(-10, 10, 350),
                        rng.uniform(40, 50, 350)], -1)
        d = haversine_matrix_np(pts, pts)
        d = np.where(d == 0, 1e-5, d)   # reference's zero clamp
        want = OPTICS(min_samples=5, xi=0.05,
                      metric="precomputed").fit_predict(d)
        got = optics_xi_labels(d, 5, 0.05, precomputed=True)
        np.testing.assert_array_equal(got, want)


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
