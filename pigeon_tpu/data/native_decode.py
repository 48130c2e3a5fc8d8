"""ctypes wrapper for the native JPEG decode kernel (`native/decode.cpp`).

Host-input fast path: libjpeg decode with PIL-draft DCT scaling + bicubic
shortest-edge resize + center crop, all in C++ (OpenMP batch variant).
The behavioral contract is the PIL path in `data/image_ops.py::
resize_crop_pil` with `Image.draft` applied first — exactly what
`data/pipeline.py::load_pixels` does on the uint8 wire path; parity is
test-bounded (tests/test_native_decode.py). Falls back transparently when
the toolchain or libjpeg headers are unavailable, or per-image on decode
failure (e.g. CMYK JPEGs, which libjpeg cannot convert to RGB).

Disable explicitly with ``PIGEON_NATIVE_DECODE=0``.
"""

from __future__ import annotations

import ctypes
import logging
import os
import threading
from typing import List, Optional, Sequence

import numpy as np

logger = logging.getLogger("pigeon_tpu.native_decode")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SRC_PATH = os.path.join(_NATIVE_DIR, "decode.cpp")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdecode.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _signatures(lib: ctypes.CDLL) -> ctypes.CDLL:
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64

    lib.decode_resize_crop.argtypes = [u8p, i64, i64, u8p, i64]
    lib.decode_resize_crop.restype = i64
    lib.decode_resize_crop_batch.argtypes = [u8p, i64p, i64, i64, u8p,
                                             u8p, i64, i64]
    lib.decode_resize_crop_batch.restype = None
    return lib


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the decode library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("PIGEON_NATIVE_DECODE", "1") == "0":
            return None
        from pigeon_tpu.native import build_shared

        stale = (os.path.exists(_LIB_PATH) and os.path.exists(_SRC_PATH)
                 and os.path.getmtime(_SRC_PATH)
                 > os.path.getmtime(_LIB_PATH))
        if stale or not os.path.exists(_LIB_PATH):
            # -ffp-contract=fast overrides the loader's parity-oriented
            # default (that's for the OPTICS kernel only); FMA + unrolling
            # is ~25% on the resize passes.
            extra = ("-ffp-contract=fast", "-funroll-loops", "-ljpeg")
            if (not build_shared(_SRC_PATH, _LIB_PATH, extra)
                    and not os.path.exists(_LIB_PATH)):
                return None
        try:
            _lib = _signatures(ctypes.CDLL(_LIB_PATH))
        except (OSError, AttributeError) as e:
            logger.info("native decode load failed: %s", e)
            _lib = None
        return _lib


def available() -> bool:
    return load() is not None


def decode_resize_crop(jpeg_bytes: bytes, target: int,
                       fast: bool = True) -> Optional[np.ndarray]:
    """One JPEG buffer -> (target, target, 3) uint8 RGB, or None on any
    decode failure (caller falls back to PIL).

    ``fast=True`` uses libjpeg-turbo's M/8 IDCT scaling (decodes only the
    pixels the downstream resize needs; PIL can only reduce by powers of
    two); ``fast=False`` reproduces the PIL draft+resize output to
    per-pixel tolerance.
    """
    lib = load()
    if lib is None:
        return None
    buf = np.frombuffer(jpeg_bytes, dtype=np.uint8)
    out = np.empty((target, target, 3), np.uint8)
    rc = lib.decode_resize_crop(buf, buf.size, target, out, int(fast))
    if rc != 0:
        logger.debug("native decode failed rc=%d (len=%d)", rc, buf.size)
        return None
    return out


def decode_resize_crop_batch(buffers: Sequence[bytes], target: int,
                             fast: bool = True, nthreads: int = 0
                             ) -> Optional[List[Optional[np.ndarray]]]:
    """Decode many JPEG buffers in one native call (OpenMP across images).

    Returns a list aligned with `buffers`: (target, target, 3) uint8 per
    success, None per per-image failure. Returns None wholesale when the
    native library is unavailable.
    """
    lib = load()
    if lib is None:
        return None
    n = len(buffers)
    offsets = np.zeros(n + 1, np.int64)
    for i, b in enumerate(buffers):
        offsets[i + 1] = offsets[i] + len(b)
    data = (np.frombuffer(b"".join(buffers), dtype=np.uint8)
            if n else np.zeros(0, np.uint8))
    out = np.empty((n, target, target, 3), np.uint8)
    ok = np.zeros(n, np.uint8)
    lib.decode_resize_crop_batch(data, offsets, n, target, out, ok,
                                 int(fast), int(nthreads))
    return [out[i] if ok[i] else None for i in range(n)]
