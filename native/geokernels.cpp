// Native host-side geo kernels for pigeon_tpu.
//
// The offline geocell pipeline is dominated by two host computations:
//   * point-in-polygon tests (assigning millions of training points to
//     admin areas / geocells — reference uses geopandas' libgeos sindex,
//     `dataset_creation/geocell/geocell_creation.py:193`);
//   * dense pairwise haversine matrices (per-cell OPTICS clustering over
//     precomputed distances, `dataset_creation/prototype/prototype.py:135`).
//
// Both are embarrassingly parallel; this TU exposes them with a C ABI for
// ctypes (no pybind11 in this image). OpenMP parallel, SIMD-friendly inner
// loops. Build: native/build.sh -> libgeokernels.so.

#include <cmath>
#include <cstdint>

extern "C" {

// Even-odd ray casting: points (n,2) vs one ring (m,2) -> out[n] in {0,1}.
void pip_batch(const double* points, int64_t n,
               const double* ring, int64_t m, uint8_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const double x = points[2 * i];
    const double y = points[2 * i + 1];
    int inside = 0;
    for (int64_t j = 0; j < m; ++j) {
      const int64_t k = (j + 1 == m) ? 0 : j + 1;
      const double x0 = ring[2 * j], y0 = ring[2 * j + 1];
      const double x1 = ring[2 * k], y1 = ring[2 * k + 1];
      if ((y0 <= y) != (y1 <= y)) {
        const double xs = x0 + (y - y0) * (x1 - x0) / (y1 - y0);
        if (xs > x) inside ^= 1;
      }
    }
    out[i] = static_cast<uint8_t>(inside);
  }
}

// Points vs a multipolygon given as concatenated rings.
// ring_offsets has num_rings+1 entries (prefix offsets into ring_data rows).
// out[i] = 1 if the point is inside ANY ring (outer-ring union semantics,
// matching pigeon_tpu.geocell.geometry.points_in_multipolygon).
void pip_multi(const double* points, int64_t n,
               const double* ring_data, const int64_t* ring_offsets,
               int64_t num_rings, uint8_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const double x = points[2 * i];
    const double y = points[2 * i + 1];
    int hit = 0;
    for (int64_t r = 0; r < num_rings && !hit; ++r) {
      const double* ring = ring_data + 2 * ring_offsets[r];
      const int64_t m = ring_offsets[r + 1] - ring_offsets[r];
      int inside = 0;
      for (int64_t j = 0; j < m; ++j) {
        const int64_t k = (j + 1 == m) ? 0 : j + 1;
        const double x0 = ring[2 * j], y0 = ring[2 * j + 1];
        const double x1 = ring[2 * k], y1 = ring[2 * k + 1];
        if ((y0 <= y) != (y1 <= y)) {
          const double xs = x0 + (y - y0) * (x1 - x0) / (y1 - y0);
          if (xs > x) inside ^= 1;
        }
      }
      hit = inside;
    }
    out[i] = static_cast<uint8_t>(hit);
  }
}

// Assign each point to the FIRST multipolygon containing it, else -1.
// feature_offsets (num_features+1) indexes into ring_offsets; bboxes is
// (num_features,4) [minx,miny,maxx,maxy] for prefiltering.
void assign_features(const double* points, int64_t n,
                     const double* ring_data, const int64_t* ring_offsets,
                     const int64_t* feature_offsets, int64_t num_features,
                     const double* bboxes, int64_t* out) {
#pragma omp parallel for schedule(dynamic, 256)
  for (int64_t i = 0; i < n; ++i) {
    const double x = points[2 * i];
    const double y = points[2 * i + 1];
    int64_t found = -1;
    for (int64_t f = 0; f < num_features && found < 0; ++f) {
      const double* bb = bboxes + 4 * f;
      if (x < bb[0] || y < bb[1] || x > bb[2] || y > bb[3]) continue;
      for (int64_t r = feature_offsets[f];
           r < feature_offsets[f + 1] && found < 0; ++r) {
        const double* ring = ring_data + 2 * ring_offsets[r];
        const int64_t m = ring_offsets[r + 1] - ring_offsets[r];
        int inside = 0;
        for (int64_t j = 0; j < m; ++j) {
          const int64_t k = (j + 1 == m) ? 0 : j + 1;
          const double x0 = ring[2 * j], y0 = ring[2 * j + 1];
          const double x1 = ring[2 * k], y1 = ring[2 * k + 1];
          if ((y0 <= y) != (y1 <= y)) {
            const double xs = x0 + (y - y0) * (x1 - x0) / (y1 - y0);
            if (xs > x) inside ^= 1;
          }
        }
        if (inside) found = f;
      }
    }
    out[i] = found;
  }
}

// Dense pairwise haversine: x (n,2), y (m,2) in (lon,lat) degrees ->
// out (n*m) km. WGS84 equatorial radius (parity with core.geodesy).
void haversine_matrix(const double* x, int64_t n,
                      const double* y, int64_t m, double* out) {
  constexpr double kDeg2Rad = 0.017453292519943295;
  constexpr double kRadiusKm = 6378.137;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const double lon1 = x[2 * i] * kDeg2Rad;
    const double lat1 = x[2 * i + 1] * kDeg2Rad;
    const double clat1 = std::cos(lat1);
    for (int64_t j = 0; j < m; ++j) {
      const double lon2 = y[2 * j] * kDeg2Rad;
      const double lat2 = y[2 * j + 1] * kDeg2Rad;
      const double sdlat = std::sin(0.5 * (lat2 - lat1));
      const double sdlon = std::sin(0.5 * (lon2 - lon1));
      double a = sdlat * sdlat + clat1 * std::cos(lat2) * sdlon * sdlon;
      a = a < 0.0 ? 0.0 : (a > 1.0 ? 1.0 : a);
      out[i * m + j] = 2.0 * kRadiusKm * std::asin(std::sqrt(a));
    }
  }
}

}  // extern "C"
