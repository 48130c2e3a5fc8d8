"""OPTICS xi-clustering on a native O(n²) reachability-graph kernel.

The reference clusters oversize geocells and per-cell prototype points with
sklearn OPTICS (`dataset_creation/geocell/cell.py:336-418`,
`dataset_creation/prototype/prototype.py:135-149`). sklearn's ordering loop
is Python-over-numpy-rows and dominates planet-scale geocell balancing
(~14 min of the 79k-point scale run). The native kernel
(`native/geokernels.cpp::optics_graph_*`) computes the SAME reachability
graph — identical distance expressions (FP contraction off), identical
``np.around`` rounding, identical argmin tie-breaking — and sklearn's own
`cluster_optics_xi` extracts labels from that graph, so the clustering
semantics remain sklearn's bit-for-bit (golden-tested in
tests/test_native.py). Falls back to sklearn end-to-end when no C++
toolchain is available.
"""

from __future__ import annotations

import numpy as np


def optics_xi_labels(points: np.ndarray, min_samples: int, xi: float,
                     precomputed: bool = False) -> np.ndarray:
    """Cluster labels equal to
    ``OPTICS(min_samples, xi[, metric='precomputed']).fit_predict(points)``.

    Args:
        points: (n, 2) euclidean coords, or (n, n) pairwise distances when
            ``precomputed``.
        min_samples: OPTICS core-neighborhood size (callers clamp to <= n).
        xi: steepness threshold for the xi cluster extraction.
    """
    pts = np.ascontiguousarray(points, np.float64)
    from pigeon_tpu import native

    if native.available():
        from sklearn.cluster import cluster_optics_xi

        ordering, _core, reach, pred = native.optics_graph(
            pts, min_samples, precomputed=precomputed)
        labels, _ = cluster_optics_xi(
            reachability=reach, predecessor=pred, ordering=ordering,
            min_samples=min_samples, xi=xi)
        return labels

    from sklearn.cluster import OPTICS

    kwargs = ({"metric": "precomputed"} if precomputed
              else {"n_jobs": -1})
    return OPTICS(min_samples=min_samples, xi=xi,
                  **kwargs).fit_predict(pts)
