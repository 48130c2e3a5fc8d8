"""Serving round-trip latency benchmark (reproducible protocol).

Measures the full HTTP path the GeoGuessr bot exercises
(`bot/chrome_extension/scripts/duel.js:51-64`): 4 base64 JPEG
screenshots -> POST /api/v1/predict -> JPEG decode + resize + uint8
device transfer + ViT-L/14-336 panorama forward + top-k [+ refinement]
-> (lat, lng). Round-2's 156 ms (unrefined) / 194 ms (refined+hedged)
numbers in docs/PERF.md follow this protocol.

Env knobs:
  SERVE_MODE   (panorama) — "classic": the single-image contract the
                 extension's classic.js speaks (one `image` field,
                 `--panorama` off; `bot/chrome_extension/scripts/
                 classic.js:23-27`). Metric gains a `_classic` suffix.
  SERVE_QUANT  (0) — 1: int8 W8A8 tower (static act scales).
  SERVE_REFINE (0) — 1: production-scale refiner+hedge bank
                     (2203 cells x 64 protos x 1024-d, 100k members).
  SERVE_N      (20) — timed requests (median reported); PER CLIENT
                 THREAD when SERVE_CONCURRENCY>1 (total = N x C).
  SERVE_PX     (512) — screenshot resolution posted by the fake bot.
  SERVE_CONCURRENCY (1) — >1: that many client threads fire requests
                     simultaneously; reports aggregate requests/sec +
                     per-request latency. Combine with SERVE_BATCH.
  SERVE_BATCH  (0) — >0: micro-batch concurrent requests into one
                     device dispatch (`serve/batching.py`), the CLI's
                     --serve-batch path.

Prints ONE JSON line {metric, value(ms), unit, ...}.
"""

from __future__ import annotations

import base64
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import urllib.request


def _screenshot_b64(rng, px: int) -> str:
    from PIL import Image

    img = Image.fromarray(
        rng.integers(0, 255, (px, px, 3), dtype="uint8"), "RGB")
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=85)
    return "data:image/jpeg;base64," + base64.b64encode(
        buf.getvalue()).decode()


def main() -> None:
    import jax

    from pigeon_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    from pigeon_tpu.config import HeadConfig, vit_l14_336_vision
    from pigeon_tpu.models.super_guessr import SuperGuessr
    from pigeon_tpu.serve import PredictionService, serve
    from pigeon_tpu.serve.server import make_serving_fn

    quant = os.environ.get("SERVE_QUANT", "0") == "1"
    refine = os.environ.get("SERVE_REFINE", "0") == "1"
    classic = os.environ.get("SERVE_MODE", "panorama") == "classic"
    n = int(os.environ.get("SERVE_N", "20"))
    px = int(os.environ.get("SERVE_PX", "512"))

    if os.environ.get("SERVE_TINY", "0") == "1":   # CPU smoke-test mode
        from pigeon_tpu.config import VisionConfig

        vision_cfg = VisionConfig(image_size=32, patch_size=8,
                                  hidden_size=64, intermediate_size=128,
                                  num_layers=2, num_heads=4,
                                  projection_dim=32)
        head_cfg = HeadConfig(num_cells=32, embed_dim=64,
                              panorama=not classic, multi_task=True)
    else:
        vision_cfg = vit_l14_336_vision()
        head_cfg = HeadConfig(num_cells=2203, embed_dim=1024,
                              panorama=not classic, multi_task=True)
    # Match the product `cli serve` route (`cli/run.py::_attn_impl` /
    # `_quant_attn_impl`): flash_fused since r3 (bf16) / r4 (int8).
    attn = "xla" if os.environ.get("SERVE_TINY") == "1" else "flash_fused"
    model = SuperGuessr(vision_cfg, head_cfg, dtype=jnp.bfloat16,
                        attn_impl=attn)
    size = vision_cfg.image_size
    example = (jnp.zeros((1, size, size, 3)) if classic
               else jnp.zeros((1, 4, size, size, 3)))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), example)["params"]

    if quant:
        from pigeon_tpu.models.quant import quantize_and_calibrate

        # Exactly the `cli serve --quant` recipe incl. its 1.25 margin,
        # so the measured latency is the latency actually served.
        dyn = SuperGuessr(vision_cfg, head_cfg, dtype=jnp.bfloat16,
                          attn_impl=attn, quant=True)
        calib = jax.random.normal(jax.random.PRNGKey(3),
                                  example.shape, jnp.float32)
        params = quantize_and_calibrate(dyn, params, calib,
                                        tower_key="vision", margin=1.25)
        model = SuperGuessr(vision_cfg, head_cfg, dtype=jnp.bfloat16,
                            attn_impl=attn, quant="static")

    rng = np.random.default_rng(0)
    cells = np.stack([rng.uniform(-170, 170, head_cfg.num_cells),
                      rng.uniform(-55, 65, head_cfg.num_cells)],
                     -1).astype(np.float32)
    serve_fn = make_serving_fn(model, params, head_cfg, cells)

    refine_fn = None
    if refine:
        from pigeon_tpu.train.evaluate import RefinerConfig, build_refiner

        n_bank, dim, protos = 100_000, 1024, 64
        bank_emb = rng.normal(size=(n_bank, dim)).astype(np.float32)
        bank_lla = np.stack([rng.uniform(-170, 170, n_bank),
                             rng.uniform(-55, 65, n_bank)],
                            -1).astype(np.float32)
        per_cell = n_bank // head_cfg.num_cells
        rows = []
        for c in range(head_cfg.num_cells):
            base = c * per_cell
            step = max(per_cell // protos, 1)
            for j in range(min(protos, per_cell)):
                idx = list(range(base + j * step,
                                 min(base + (j + 1) * step, n_bank)))
                if not idx:
                    break
                rows.append({"geocell_idx": c,
                             "lng": float(bank_lla[idx, 0].mean()),
                             "lat": float(bank_lla[idx, 1].mean()),
                             "count": len(idx),
                             "indices": json.dumps(idx)})
        preset = RefinerConfig(topk=5, max_refinement_km=1000.0,
                               temperature=1.6, hedge=True)
        refine_fn = build_refiner(rows, bank_emb, bank_lla,
                                  num_cells=head_cfg.num_cells, cfg=preset)

    # Warm the uint8 executable (the wire format) + the refiner, with a
    # scalar readback to force execution through the tunnel.
    out = serve_fn(jnp.zeros_like(example, dtype=jnp.uint8))
    if refine_fn is not None:
        out_r = refine_fn(out["embedding"], out["pred_lla"],
                          out["topk_cells"], out["topk_probs"])
        float(jnp.sum(out_r["pred_lla"]))
    float(jnp.sum(out["pred_lla"]))

    serve_batch = int(os.environ.get("SERVE_BATCH", "0"))
    batcher = None
    if serve_batch > 0:
        from pigeon_tpu.serve.batching import MicroBatcher

        batcher = MicroBatcher(serve_fn, refine_fn=refine_fn,
                               max_batch=serve_batch)
        # Warm every bucket executable (shared implementation with
        # `cli serve`; scalar readbacks force execution).
        batcher.warm(example.shape[1:], jnp.uint8)
    service = PredictionService(serve_fn, image_size=size,
                                panorama=not classic,
                                refine_fn=refine_fn, batcher=batcher)
    httpd = serve(service, host="127.0.0.1", port=0, block=False)
    port = httpd.server_address[1]
    url = f"http://127.0.0.1:{port}/api/v1/predict"

    payload = {"gameID": "bench", "roundID": 1}
    keys = ("image",) if classic else ("image", "image_2", "image_3",
                                       "image_4")
    for key in keys:
        payload[key] = _screenshot_b64(rng, px)
    body = json.dumps(payload).encode()

    def post(timeout=60):
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return json.loads(resp.read())

    # Warm the HTTP path end to end (a generous timeout: the first
    # in-handler dispatch may hit a fresh remote compile).
    t0 = time.perf_counter()
    post(timeout=600)
    print(f"# first request {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    post()

    concurrency = int(os.environ.get("SERVE_CONCURRENCY", "1"))
    mode = "classic" if classic else "panorama"
    suffix = ("_int8" if quant else "") + ("_refined" if refine else "") \
        + (f"_b{serve_batch}" if serve_batch else "")

    def pct(sorted_ms, q):
        # Nearest-rank percentile on the sorted latency list.
        i = min(len(sorted_ms) - 1, (len(sorted_ms) * q) // 100)
        return round(sorted_ms[i], 1)
    if concurrency > 1:
        # Throughput mode: each thread fires n requests; transport and
        # device dispatch overlap across clients (and coalesce into one
        # dispatch when SERVE_BATCH is on).
        import threading

        times = []
        times_lock = threading.Lock()

        failures = [0]

        def client():
            for _ in range(n):
                t0 = time.perf_counter()
                try:
                    post(timeout=120)
                except Exception as e:  # noqa: BLE001 — count, don't die
                    with times_lock:
                        failures[0] += 1
                    print(f"# request failed: {type(e).__name__}: "
                          f"{str(e)[:120]}", file=sys.stderr)
                    continue
                dt = (time.perf_counter() - t0) * 1000.0
                with times_lock:
                    times.append(dt)

        threads = [threading.Thread(target=client)
                   for _ in range(concurrency)]
        t_all = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t_all
        httpd.shutdown()
        times.sort()
        if not times:
            raise SystemExit(f"all {failures[0]} requests failed")
        print(json.dumps({
            "metric": f"serving_{mode}_requests_per_sec"
                      f"{suffix}_c{concurrency}",
            "value": round(len(times) / wall, 2),
            "unit": "requests/sec",
            "median_ms": pct(times, 50),
            "p90_ms": pct(times, 90),
            "p99_ms": pct(times, 99),
            "failed": failures[0],
        }))
        print(f"# clients={concurrency} total={len(times)} "
              f"failed={failures[0]} wall={wall:.1f}s", file=sys.stderr)
        return

    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        result = post()
        times.append((time.perf_counter() - t0) * 1000.0)
    httpd.shutdown()
    times.sort()
    median = times[len(times) // 2]

    print(json.dumps({
        "metric": f"serving_{mode}_roundtrip_ms{suffix}",
        "value": round(median, 1),
        "unit": "ms",
        "p10": pct(times, 10),
        "p90": pct(times, 90),
        "p99": pct(times, 99),
    }))
    print(f"# n={n} px={px} last_guess={result['results']}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
