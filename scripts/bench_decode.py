"""Host input-pipeline throughput: JPEG decode + crop img/s, no device.

SURVEY §7.3 calls feeding the device the hard part: the single-chip bf16
eval rate is ~317 img/s (bs32, docs/PERF.md), and a PCIe-local deployment
must DECODE at least that fast on the host. This bench measures
`data/pipeline.py::iter_batches` (the exact path `cli
finetune/evaluate/predict` feed from) over synthetic StreetView-sized
JPEGs, for both wire formats:

* normalize=False — uint8 resize-crop only (the low-transfer serving
  format; CLIP normalize fuses into the jitted step on device);
* normalize=True  — full f32 CLIP preprocess on the host.

Usage: python scripts/bench_decode.py [--images 512] [--size 640]
           [--workers 8,16,32] [--batch 32]
Prints one json line per (mode, workers) with images/sec.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def make_jpegs(root: str, n: int, src_size: int) -> pd.DataFrame:
    """n synthetic StreetView-ish JPEGs (quality 85) + metadata frame."""
    from PIL import Image

    rng = np.random.default_rng(0)
    rows = []
    # Low-frequency content compresses/decodes like real photos
    # (pure noise JPEGs decode unrealistically slowly).
    yy, xx = np.mgrid[0:src_size, 0:src_size].astype(np.float32)
    for i in range(n):
        img = np.stack([
            127 + 120 * np.sin(xx / (20 + i % 17) + i),
            127 + 120 * np.cos(yy / (25 + i % 13) + i * 0.7),
            127 + 120 * np.sin((xx + yy) / (30 + i % 11)),
        ], -1)
        img += rng.normal(0, 8, img.shape)
        name = f"{i}.jpg"
        Image.fromarray(img.clip(0, 255).astype(np.uint8)).save(
            os.path.join(root, name), quality=85)
        rows.append({"image": name, "lng": float(i % 360 - 180),
                     "lat": float(i % 120 - 60)})
    return pd.DataFrame(rows)


def run(df, image_dir, image_size, batch, workers, normalize) -> float:
    from pigeon_tpu.data.pipeline import TabularImageDataset, iter_batches

    ds = TabularImageDataset(df, image_dir=image_dir,
                             image_size=image_size, normalize=normalize)
    n_images = 0
    t0 = time.perf_counter()
    for b in iter_batches(ds, batch, num_workers=workers, prefetch=4):
        n_images += len(b["inputs"])
    return n_images / (time.perf_counter() - t0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--size", type=int, default=640,
                    help="source JPEG side (StreetView captures ~640px)")
    ap.add_argument("--target", type=int, default=336)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--workers", default="8,16,32")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as root:
        df = make_jpegs(root, args.images, args.size)
        for normalize in (False, True):
            mode = "f32_clip_preprocess" if normalize else "uint8_crop"
            for w in [int(x) for x in args.workers.split(",")]:
                run(df.head(64), root, args.target, args.batch, w,
                    normalize)  # warm the thread pool + page cache
                rate = run(df, root, args.target, args.batch, w, normalize)
                print(json.dumps({
                    "metric": f"host_decode_{mode}_images_per_sec",
                    "workers": w,
                    "value": round(rate, 1),
                    "unit": "images/sec",
                }))
                sys.stdout.flush()


if __name__ == "__main__":
    main()
