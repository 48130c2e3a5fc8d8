"""ctypes loader for the native geo kernels (with transparent fallback).

Builds `native/libgeokernels.so` lazily on first use when a compiler is
available; callers (`geocell.geometry`, `geocell.prototypes`) fall back to
the numpy implementations when native code is unavailable, so the framework
never hard-depends on a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger("pigeon_tpu.native")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgeokernels.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _signatures(lib: ctypes.CDLL) -> ctypes.CDLL:
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64

    lib.pip_batch.argtypes = [f64p, i64, f64p, i64, u8p]
    lib.pip_multi.argtypes = [f64p, i64, f64p, i64p, i64, u8p]
    lib.assign_features.argtypes = [f64p, i64, f64p, i64p, i64p, i64,
                                    f64p, i64p]
    lib.haversine_matrix.argtypes = [f64p, i64, f64p, i64, f64p]
    lib.optics_graph_euclidean.argtypes = [f64p, i64, i64, i64p, f64p,
                                           f64p, i64p]
    lib.optics_graph_precomputed.argtypes = [f64p, i64, i64, i64p, f64p,
                                             f64p, i64p]
    lib.multipoly_intersect_batch.argtypes = [f64p, i64p, i64, f64p, i64p,
                                              i64p, i64, u8p]
    return lib


def build_shared(src_path: str, lib_path: str, extra_args=()) -> bool:
    """(Re)compile a native shared library. Atomic (temp + rename) and
    serialized across processes with an flock — process-pool workers
    (prototype builder, split fan-out) may race to build on first use.
    Shared by the geo kernels and the JPEG decode kernel
    (`data/native_decode.py`)."""
    if not os.path.exists(src_path):
        return False
    lock_path = lib_path + ".lock"
    tmp_path = f"{lib_path}.tmp.{os.getpid()}"
    try:
        with open(lock_path, "w") as lock_file:
            try:
                import fcntl

                fcntl.flock(lock_file, fcntl.LOCK_EX)
            except ImportError:  # pragma: no cover (non-POSIX)
                pass
            # Another process may have finished the build while we waited.
            if (os.path.exists(lib_path) and os.path.getmtime(lib_path)
                    >= os.path.getmtime(src_path)):
                return True
            subprocess.run(
                ["g++", "-O3", "-march=native", "-ffp-contract=off",
                 "-fPIC", "-shared", "-fopenmp", "-o", tmp_path, src_path,
                 *extra_args],
                check=True, capture_output=True, timeout=120)
            # rename keeps the old inode alive for processes that
            # already dlopen'd it (no mid-run SIGBUS).
            os.replace(tmp_path, lib_path)
            return True
    except (OSError, subprocess.SubprocessError) as e:
        logger.info("native build unavailable (%s): %s",
                    os.path.basename(src_path), e)
        return False
    finally:
        if os.path.exists(tmp_path):
            try:
                os.remove(tmp_path)
            except OSError:
                pass


def _build() -> bool:
    # -ffp-contract=off: OPTICS kernel parity with sklearn's
    # uncontracted euclidean distances (see native/build.sh).
    return build_shared(os.path.join(_NATIVE_DIR, "geokernels.cpp"),
                        _LIB_PATH)


def _try_load(path: str = _LIB_PATH) -> Optional[ctypes.CDLL]:
    """dlopen + bind symbols; None if the .so is missing symbols (stale
    build from an older source revision) or unloadable."""
    try:
        return _signatures(ctypes.CDLL(path))
    except (OSError, AttributeError) as e:
        logger.info("native load failed: %s", e)
        return None


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure.

    Fallback ladder: rebuild when the source is newer than the .so; if
    no compiler is available but a prebuilt .so exists, try it anyway —
    `_signatures` validates every symbol, so an outdated binary degrades
    to the numpy/sklearn paths instead of crashing."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src = os.path.join(_NATIVE_DIR, "geokernels.cpp")
        stale = (os.path.exists(_LIB_PATH) and os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))
        if stale or not os.path.exists(_LIB_PATH):
            built = _build()
            if not built and not os.path.exists(_LIB_PATH):
                return None
        _lib = _try_load()
        if _lib is None and os.path.exists(src):
            # Symbol-incomplete binary (stale cache with a fresh-looking
            # mtime): force one rebuild and retry. glibc dlopen caches by
            # NAME within a process, so the retry must go through a
            # unique path (the handle survives the unlink).
            try:
                os.remove(_LIB_PATH)
            except OSError:
                pass
            if _build():
                import shutil

                retry = f"{_LIB_PATH}.retry.{os.getpid()}"
                try:
                    shutil.copy2(_LIB_PATH, retry)
                    _lib = _try_load(retry)
                except OSError:
                    _lib = None
                finally:
                    try:
                        os.remove(retry)
                    except OSError:
                        pass
        return _lib


def available() -> bool:
    return load() is not None


# ---------------------------------------------------------------------------
# Wrappers (numpy in / numpy out)
# ---------------------------------------------------------------------------

def pip_batch(points: np.ndarray, ring: np.ndarray) -> np.ndarray:
    lib = load()
    pts = np.ascontiguousarray(points, np.float64)
    rg = np.ascontiguousarray(ring, np.float64)
    out = np.empty(len(pts), np.uint8)
    lib.pip_batch(pts, len(pts), rg, len(rg), out)
    return out.astype(bool)


def pip_multi(points: np.ndarray, rings) -> np.ndarray:
    lib = load()
    pts = np.ascontiguousarray(points, np.float64)
    offsets = np.zeros(len(rings) + 1, np.int64)
    for i, r in enumerate(rings):
        offsets[i + 1] = offsets[i] + len(r)
    data = (np.concatenate(rings).astype(np.float64)
            if rings else np.zeros((0, 2)))
    data = np.ascontiguousarray(data, np.float64)
    out = np.empty(len(pts), np.uint8)
    lib.pip_multi(pts, len(pts), data, offsets, len(rings), out)
    return out.astype(bool)


def assign_features(points: np.ndarray, rings_per_feature,
                    bboxes: np.ndarray) -> np.ndarray:
    """Point -> first containing feature index (-1 outside all)."""
    lib = load()
    pts = np.ascontiguousarray(points, np.float64)
    ring_offsets = [0]
    feature_offsets = [0]
    chunks = []
    for rings in rings_per_feature:
        for r in rings:
            chunks.append(np.asarray(r, np.float64))
            ring_offsets.append(ring_offsets[-1] + len(r))
        feature_offsets.append(feature_offsets[-1] + len(rings))
    data = (np.ascontiguousarray(np.concatenate(chunks), np.float64)
            if chunks else np.zeros((0, 2)))
    out = np.empty(len(pts), np.int64)
    lib.assign_features(
        pts, len(pts), data,
        np.asarray(ring_offsets, np.int64),
        np.asarray(feature_offsets, np.int64),
        len(rings_per_feature),
        np.ascontiguousarray(bboxes, np.float64), out)
    return out


def haversine_matrix(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    lib = load()
    xx = np.ascontiguousarray(x, np.float64)
    yy = np.ascontiguousarray(y, np.float64)
    out = np.empty((len(xx), len(yy)), np.float64)
    lib.haversine_matrix(xx, len(xx), yy, len(yy), out)
    return out


def multipoly_intersect_batch(subject_rings, candidate_ring_lists
                              ) -> np.ndarray:
    """Does the subject multipolygon intersect each candidate?

    Args:
        subject_rings: list of (k, 2) rings.
        candidate_ring_lists: list (one per candidate) of lists of rings.

    Returns:
        bool array (num_candidates,), semantics of
        `geometry.polygons_intersect(subject_rings, candidate)`.
    """
    lib = load()
    subj_offsets = [0]
    for r in subject_rings:
        subj_offsets.append(subj_offsets[-1] + len(r))
    subj_data = (np.ascontiguousarray(
        np.concatenate([np.asarray(r, np.float64)
                        for r in subject_rings]))
        if subject_rings else np.zeros((0, 2)))

    ring_offsets = [0]
    feat_offsets = [0]
    chunks = []
    for rings in candidate_ring_lists:
        for r in rings:
            chunks.append(np.asarray(r, np.float64))
            ring_offsets.append(ring_offsets[-1] + len(r))
        feat_offsets.append(feat_offsets[-1] + len(rings))
    cand_data = (np.ascontiguousarray(np.concatenate(chunks))
                 if chunks else np.zeros((0, 2)))

    out = np.zeros(len(candidate_ring_lists), np.uint8)
    if len(subject_rings) and len(candidate_ring_lists):
        lib.multipoly_intersect_batch(
            subj_data, np.asarray(subj_offsets, np.int64),
            len(subject_rings), cand_data,
            np.asarray(ring_offsets, np.int64),
            np.asarray(feat_offsets, np.int64),
            len(candidate_ring_lists), out)
    return out.astype(bool)


def optics_graph(points: np.ndarray, min_samples: int,
                 precomputed: bool = False):
    """OPTICS reachability graph, bit-parity with sklearn's
    `compute_optics_graph` at max_eps=inf.

    Args:
        points: (n, 2) euclidean coords, or (n, n) pairwise distances when
            `precomputed`.
        min_samples: core-point neighborhood size (counts the point itself).

    Returns:
        (ordering, core_distances, reachability, predecessor) — the inputs
        sklearn's `cluster_optics_xi` extraction consumes.
    """
    lib = load()
    x = np.ascontiguousarray(points, np.float64)
    n = len(x)
    ordering = np.empty(n, np.int64)
    core = np.empty(n, np.float64)
    reach = np.empty(n, np.float64)
    pred = np.empty(n, np.int64)
    fn = (lib.optics_graph_precomputed if precomputed
          else lib.optics_graph_euclidean)
    fn(x, n, int(min_samples), ordering, core, reach, pred)
    return ordering, core, reach, pred
