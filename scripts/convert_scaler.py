#!/usr/bin/env python
"""Convert the reference's pickled sklearn regression scaler to JSON.

The reference stores the multi-task target scaler as a joblib-pickled
sklearn ``StandardScaler`` fit on log/offset-transformed values and
inverts it at metric time (`/root/reference/evaluation/metrics.py:29-54`:
``scaler.inverse_transform`` -> ``exp`` on all columns but temp_avg ->
subtract ``[offset, 1, 0, 1, 1, 1]`` with offset 408, or 416 under
``--yfcc``). pigeon_tpu replaces the pickle with the JSON-native
`train/metrics.py::RegressionScaler`, which bakes the same mean/scale
and elevation offset.

Usage:
    python scripts/convert_scaler.py scaler.joblib out.json [--yfcc]

Anyone migrating from the reference runs this ONCE per scaler file;
everything downstream (`evaluate --scaler out.json`) reads the JSON.
"""

from __future__ import annotations

import argparse
import json
import sys


def convert(scaler, yfcc: bool = False) -> dict:
    """sklearn scaler object -> RegressionScaler JSON dict.

    Accepts any scaler exposing ``mean_``/``scale_`` (StandardScaler and
    friends). The offsets are NOT stored in the sklearn object — the
    reference hardcodes them at inverse time (metrics.py:50-52) — so the
    elevation offset is chosen by the ``yfcc`` flag exactly as the
    reference chooses its scaler path.
    """
    mean = getattr(scaler, "mean_", None)
    scale = getattr(scaler, "scale_", None)
    if mean is None or scale is None:
        raise ValueError(
            f"unsupported scaler {type(scaler).__name__}: needs mean_ and "
            "scale_ (the reference uses sklearn StandardScaler)")
    mean = [float(v) for v in mean]
    scale = [float(v) for v in scale]
    if len(mean) != 6 or len(scale) != 6:
        raise ValueError(
            f"expected 6 multi-task columns, got {len(mean)} — is this "
            "the regression scaler?")
    return {"mean": mean, "scale": scale,
            "elevation_offset": 416.0 if yfcc else 408.0}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("joblib_path", help="reference scaler .joblib/.pkl")
    ap.add_argument("json_path", help="output RegressionScaler JSON")
    ap.add_argument("--yfcc", action="store_true",
                    help="YFCC scaler (elevation offset 416, not 408 — "
                         "reference metrics.py:50)")
    args = ap.parse_args(argv)

    try:
        import joblib
    except ImportError:  # pragma: no cover - joblib ships with sklearn
        raise SystemExit("joblib is required (ships with scikit-learn)")

    try:
        payload = convert(joblib.load(args.joblib_path), yfcc=args.yfcc)
    except ValueError as e:
        raise SystemExit(str(e))
    with open(args.json_path, "w") as f:
        json.dump(payload, f)
    print(f"wrote {args.json_path} (elevation_offset="
          f"{payload['elevation_offset']})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
