"""Dataset builders + batching: CSV/metadata-driven image datasets.

Replaces the reference's HF-`datasets` pipelines (`dataset_creation/finetune`,
`dataset_creation/benchmark`) with a dependency-light design: pandas for
metadata, PIL for decode, a thread pool for parallel host decode, and a
one-deep prefetch queue so decode overlaps device compute.

Schema (reference-compatible):
  * metadata CSV columns: ``image`` (+ ``image_2..image_4`` for panoramas),
    ``lng``, ``lat``, ``selection`` (train/val/test split), optional
    multi-task columns (elevation, population, temp_avg, temp_diff,
    prec_avg, prec_diff), ``climate_zone_idx``, ``heading`` (degrees),
    ``month`` (0-11), optional precomputed ``geocell_idx``;
  * benchmark registry JSON: ``{name: {"meta": csv, "images": dir}}``
    (reference `data/benchmarks/benchmarks.json`).
"""

from __future__ import annotations

import json
import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, Optional, Sequence

import numpy as np
import pandas as pd

from pigeon_tpu.data.image_ops import (
    clip_preprocess_pil,
    heading_to_sincos,
)

MT_COLUMNS = ("elevation", "population", "temp_avg", "temp_diff",
              "prec_avg", "prec_diff")


class TabularImageDataset:
    """CSV-metadata image dataset (single image or 4-view panorama).

    Functional replacement for the reference's `generate_finetune_dataset`
    (`dataset_creation/finetune/finetune_dataset.py:97-150`): rows are
    filtered by the ``selection`` column into splits; images load lazily.
    """

    def __init__(self, df: pd.DataFrame, image_dir: str = "",
                 image_size: int = 336, panorama: bool = False,
                 normalize: bool = True):
        self.df = df.reset_index(drop=True)
        self.image_dir = image_dir
        self.image_size = image_size
        self.panorama = panorama
        #: normalize=False keeps pixels uint8 (decode+resize only on host
        #: workers); normalize on device via `image_ops.normalize_images`
        #: inside the jitted step — ~3x more host throughput per worker.
        self.normalize = normalize

    @classmethod
    def from_csv(cls, csv_path: str, split: Optional[str] = None,
                 image_dir: str = "", image_size: int = 336,
                 panorama: bool = False,
                 normalize: bool = True) -> "TabularImageDataset":
        df = pd.read_csv(csv_path)
        if split is not None and "selection" in df.columns:
            df = df[df["selection"] == split]
        return cls(df, image_dir, image_size, panorama,
                   normalize=normalize)

    def __len__(self) -> int:
        return len(self.df.index)

    @property
    def image_columns(self) -> Sequence[str]:
        if self.panorama:
            return ("image", "image_2", "image_3", "image_4")
        return ("image",)

    def load_pixels(self, row) -> np.ndarray:
        """Decode + CLIP-preprocess one sample's image(s)."""
        from PIL import Image

        from pigeon_tpu.data import native_decode
        from pigeon_tpu.data.image_ops import resize_crop_pil

        fn = clip_preprocess_pil if self.normalize else resize_crop_pil
        views = []
        for col in self.image_columns:
            path = os.path.join(self.image_dir, str(row[col]))
            if (not self.normalize
                    and path.lower().endswith((".jpg", ".jpeg"))
                    and native_decode.available()):
                # Native fast path: libjpeg + bicubic in C++, PIL-parity
                # output (tests/test_native_decode.py); None -> PIL below.
                with open(path, "rb") as f:
                    arr = native_decode.decode_resize_crop(
                        f.read(), self.image_size)
                if arr is not None:
                    views.append(arr)
                    continue
            with Image.open(path) as im:
                if not self.normalize:
                    im.draft("RGB", (self.image_size, self.image_size))
                views.append(fn(im, self.image_size))
        if self.panorama:
            return np.stack(views)          # (4, S, S, 3)
        return views[0]                      # (S, S, 3)

    def labels_lla(self) -> np.ndarray:
        return self.df[["lng", "lat"]].to_numpy(dtype=np.float32)

    def sample_arrays(self, row) -> Dict[str, np.ndarray]:
        """Non-image arrays for one row. Label columns are optional so
        unlabeled inference rows (`cli predict`) batch through the same
        pipeline."""
        out = {}
        if "lng" in row.index and "lat" in row.index:
            out["labels"] = np.array([row["lng"], row["lat"]], np.float32)
        if "geocell_idx" in row.index:
            out["labels_clf"] = np.int32(row["geocell_idx"])
        elif "geocell_idx_yfcc" in row.index:
            out["labels_clf"] = np.int32(row["geocell_idx_yfcc"])
        if all(c in row.index for c in MT_COLUMNS):
            out["labels_multi_task"] = np.array(
                [row[c] for c in MT_COLUMNS], np.float32)
        if "climate_zone_idx" in row.index:
            out["labels_climate"] = np.int32(row["climate_zone_idx"])
        if "month" in row.index and not pd.isna(row["month"]):
            out["labels_month"] = np.int32(row["month"])
        if "heading" in row.index and not pd.isna(row["heading"]):
            out["heading"] = heading_to_sincos(float(row["heading"]))
        return out


class BenchmarkDataset(TabularImageDataset):
    """Registry-driven eval dataset (reference `benchmark_dataset.py:14-31`).

    Benchmarks are single-image; the square min-side crop happens inside
    CLIP preprocessing (resize shortest edge + center crop ≡ min-side crop
    + resize for these images).
    """

    def __init__(self, name: str, registry_path: str,
                 image_size: int = 336, normalize: bool = True):
        with open(registry_path) as f:
            registry = json.load(f)
        if name not in registry:
            raise KeyError(
                f"benchmark {name!r} not registered; available: "
                f"{sorted(registry)}")
        entry = registry[name]
        base = os.path.dirname(os.path.abspath(registry_path))
        meta = entry["meta"]
        images = entry["images"]
        if not os.path.isabs(meta):
            meta = os.path.join(base, meta)
        if not os.path.isabs(images):
            images = os.path.join(base, images)
        df = pd.read_csv(meta)
        super().__init__(df, image_dir=images, image_size=image_size,
                         panorama=False, normalize=normalize)
        self.name = name


def holdout(dataset: TabularImageDataset, sl: slice) -> TabularImageDataset:
    """Slice view of a dataset (the reference's `EvalDataset` holdout
    wrapper with slice support, `dataset_creation/benchmark/eval_dataset.py`).
    """
    out = TabularImageDataset(dataset.df.iloc[sl],
                              image_dir=dataset.image_dir,
                              image_size=dataset.image_size,
                              panorama=dataset.panorama)
    return out


def iter_batches(dataset: TabularImageDataset, batch_size: int,
                 shuffle: bool = False, seed: int = 0,
                 drop_last: bool = False, num_workers: int = 16,
                 prefetch: int = 2,
                 transform: Optional[Callable] = None
                 ) -> Iterator[Dict[str, np.ndarray]]:
    """Yield batches of stacked numpy arrays with threaded decode.

    Decode for batch N+1 overlaps device compute on batch N via a bounded
    prefetch queue — the host-side analogue of the reference's DataLoader
    worker pool (`training/train_eval_loop.py:188-189`).
    """
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)

    bounds = range(0, n - batch_size + 1 if drop_last else n, batch_size)
    pool = ThreadPoolExecutor(max_workers=num_workers)
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    _SENTINEL = object()

    def build_batch(idx: np.ndarray) -> Dict[str, np.ndarray]:
        rows = [dataset.df.iloc[i] for i in idx]
        pixels = list(pool.map(dataset.load_pixels, rows))
        batch: Dict[str, list] = {"inputs": pixels}
        for row in rows:
            for k, v in dataset.sample_arrays(row).items():
                batch.setdefault(k, []).append(v)
        # Optional per-row fields (heading/month may be NaN for some rows):
        # a key must be present for EVERY row to form a rectangular batch.
        n_rows = len(rows)
        batch = {k: v for k, v in batch.items() if len(v) == n_rows}
        out = {k: np.stack(v) for k, v in batch.items()}
        if transform is not None:
            out = transform(out)
        return out

    def producer():
        # A decode/IO failure (e.g. one corrupt JPEG) must surface in
        # the CONSUMER, not die with this thread: before r8 the stream
        # just ended early — `predict` wrote 0 rows with rc 0 and a
        # training epoch would silently truncate. Ship the exception
        # through the queue and re-raise it at the iteration site.
        try:
            for start in bounds:
                idx = order[start:start + batch_size]
                q.put(build_batch(idx))
            q.put(_SENTINEL)
        except BaseException as e:  # noqa: BLE001 — re-raised below
            q.put(e)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        thread.join(timeout=1.0)
        pool.shutdown(wait=False)
