"""Micro-batched serving dispatcher.

The Chrome-extension bot sends one panorama per round, but a deployment
serving many concurrent games (the reference ran duels from a single
SSH-forwarded A100, `bot/README.md:3`) would serialize whole-model
forwards per request. This coalesces concurrent requests into ONE device
dispatch: requests queue, a collector thread drains up to ``max_batch``
within ``max_wait_ms`` of the first arrival, pads to the compiled batch
shape (single executable, static shapes — the XLA rule), and fans results
back out through per-request futures.

Latency cost for a lone request is bounded by ``max_wait_ms``; throughput
under load approaches the bs=max_batch forward rate instead of
bs1 x concurrency.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Callable, Optional

import numpy as np


class MicroBatcher:
    """Coalesce concurrent single-sample predictions into batched calls.

    Args:
        serve_fn: batched ``pixels (B, ...) -> dict of (B, ...) arrays``
            (the jitted serving forward, `server.py::make_serving_fn`).
        refine_fn: optional batched refiner applied to the whole batch.
        max_batch: largest compiled batch size.
        max_wait_ms: how long the collector waits for co-riders after the
            first request of a batch arrives.
        buckets: compiled batch sizes; a fill of n dispatches at the
            smallest bucket >= n. Default: powers of two up to
            max_batch. Measured (r3, docs/PERF.md): padding every
            partial fill to one fixed max_batch burned enough device
            compute on zero rows that batching LOST to serialized bs1
            under 8-way concurrency — bucketing removes that waste at
            the cost of one warm executable per bucket.
    """

    def __init__(self, serve_fn: Callable,
                 refine_fn: Optional[Callable] = None,
                 max_batch: int = 8, max_wait_ms: float = 5.0,
                 buckets: Optional[tuple] = None):
        self.serve_fn = serve_fn
        self.refine_fn = refine_fn
        self.max_batch = int(max_batch)
        if buckets is None:
            buckets, b = [], 1
            while b < self.max_batch:
                buckets.append(b)
                b *= 2
            buckets.append(self.max_batch)
        self.buckets = tuple(sorted(set(int(b) for b in buckets)))
        if not self.buckets:
            raise ValueError("buckets must be non-empty")
        # A fill can never exceed the largest compiled bucket — clamp so
        # bucket selection is total (a custom buckets tuple smaller than
        # max_batch would otherwise strand the collector thread).
        self.max_batch = min(self.max_batch, self.buckets[-1])
        self.max_wait = max_wait_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        self.batches_run = 0        # observability
        self.requests_served = 0

    def submit(self, pixels: np.ndarray) -> "Future":
        """Enqueue one sample (no batch dim); resolves to its result row:
        dict with ``pred_lla`` (2,) plus the serving tuple fields."""
        fut: Future = Future()
        self._q.put((np.asarray(pixels), fut))
        return fut

    def predict_one(self, pixels: np.ndarray, timeout: float = 120.0):
        return self.submit(pixels).result(timeout=timeout)

    def warm(self, sample_shape, dtype) -> None:
        """Compile AND execute every bucket executable before traffic.

        The scalar readback forces execution — through tunneled backends
        an async warm-up dispatch returns immediately and the first real
        coalesced batch would still wait behind the server-side compile,
        tripping `predict_one`'s future timeout (docs/PERF.md).
        """
        import jax.numpy as jnp

        for bucket in self.buckets:
            out = self.serve_fn(jnp.zeros((bucket, *sample_shape), dtype))
            if self.refine_fn is not None:
                refined = self.refine_fn(
                    out["embedding"], out["pred_lla"],
                    out["topk_cells"], out["topk_probs"])
                float(jnp.sum(refined["pred_lla"]))
            float(jnp.sum(out["pred_lla"]))

    def close(self) -> None:
        self._stop.set()
        self._q.put(None)           # wake the collector
        self._thread.join(timeout=5)

    # ------------------------------------------------------------------

    def _collect(self):
        """Block for the first request, then drain co-riders briefly."""
        first = self._q.get()
        if first is None:
            return []
        items = [first]
        deadline = None
        import time

        while len(items) < self.max_batch:
            if deadline is None:
                deadline = time.monotonic() + self.max_wait
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                break
            items.append(nxt)
        return items

    def _loop(self):
        while not self._stop.is_set():
            items = self._collect()
            if not items:
                continue
            n = len(items)
            try:
                pixels = np.stack([p for p, _ in items])
                bucket = next(b for b in self.buckets if b >= n)
                if n < bucket:
                    # Pad to the bucket's compiled shape ON DEVICE:
                    # transfer exactly n rows (host->device bandwidth is
                    # the serving bottleneck on slow links), then a cheap
                    # device-side concat brings the batch to the static
                    # executable shape.
                    import jax.numpy as jnp

                    dev = jnp.asarray(pixels)
                    pad = jnp.zeros((bucket - n, *dev.shape[1:]),
                                    dev.dtype)
                    pixels = jnp.concatenate([dev, pad])
                out = self.serve_fn(pixels)
                if self.refine_fn is not None:
                    refined = self.refine_fn(
                        out["embedding"], out["pred_lla"],
                        out["topk_cells"], out["topk_probs"])
                    out = dict(out, pred_lla=refined["pred_lla"],
                               pred_cell=refined.get("pred_cell"))
                rows = {k: np.asarray(v) for k, v in out.items()
                        if v is not None}
                self.batches_run += 1
                self.requests_served += n
                for i, (_, fut) in enumerate(items):
                    fut.set_result({k: v[i] for k, v in rows.items()})
            except Exception as e:  # noqa: BLE001 — propagate per-request
                for _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)
