"""Ingestion-fed end-to-end throughput: disk JPEGs -> pipeline -> device.

PERF.md claims "threaded decode + prefetch overlapping device compute",
but every device bench generates inputs ON device and the decode bench
(`scripts/bench_decode.py`) is host-only — no single number showed the
real path (`/root/reference/preprocessing/embed.py:16-43`'s job; SURVEY
§7.3 "input pipeline throughput"). This script measures each stage and
their composition, all with the SAME uint8 wire format the product
`evaluate`/`finetune` routes use (decode+crop on host workers, CLIP
normalize fused on device):

  host_only    iter_batches alone: JPEG decode + resize-crop img/s.
  transfer     device_put of prebuilt uint8 batches + scalar readback:
               the host->device link alone (the axon tunnel runs
               ~6 MB/s — a PCIe/TPU-VM host runs GB/s and this stage
               vanishes; the attribution below says which regime binds).
  device_only  the forward on device-resident uint8 inputs
               (bench.py's chained protocol, incl. in-jit normalize).
  e2e          the real loop: iter_batches -> transfer -> async forward,
               one scalar readback at the end.

Deliverable: e2e vs min(host_only, transfer, device_only) — the overlap
claim holds if e2e ~= the binding stage (the pipeline hides the cheaper
stages), and the binding stage names the deployment regime (1-vCPU host:
host-bound; this tunnel: transfer-bound; TPU-VM: device-bound).

Env knobs: BENCH_N (192 images), BENCH_BATCH (route default), BENCH_SRC
(640 source px), BENCH_WORKERS (8), BENCH_QUANT (0), BENCH_ATTN
(flash_fused), BENCH_TINY (0; 1 = tiny tower on CPU — the suite's
smoke path), BENCH_SKIP_DEVICE (0; 1 = host_only row only, no jax).
Prints one JSON line per stage.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_decode import make_jpegs  # noqa: E402  (same synthetic corpus)


def main() -> list:
    import shutil

    root = tempfile.mkdtemp(prefix="ingest_bench_")
    try:
        return _main(root)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _main(root: str) -> list:
    results = []

    def emit(stage, images, seconds, **extra):
        row = {"metric": f"ingest_{stage}_images_per_sec",
               "value": round(images / seconds, 2),
               "unit": "images/sec", **extra}
        results.append(row)
        print(json.dumps(row))
        sys.stdout.flush()
        return row["value"]

    tiny = os.environ.get("BENCH_TINY", "0") == "1"
    n_images = int(os.environ.get("BENCH_N", "48" if tiny else "192"))
    src = int(os.environ.get("BENCH_SRC", "640"))
    workers = int(os.environ.get("BENCH_WORKERS", "8"))
    quant = os.environ.get("BENCH_QUANT", "0") == "1"
    attn_impl = os.environ.get("BENCH_ATTN", "flash_fused")

    df = make_jpegs(root, n_images, src)

    if tiny:
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass

    from pigeon_tpu.data.pipeline import TabularImageDataset, iter_batches

    if tiny:
        from pigeon_tpu.config import HeadConfig, VisionConfig

        vision_cfg = VisionConfig(image_size=32, patch_size=8,
                                  hidden_size=64, intermediate_size=128,
                                  num_layers=2, num_heads=4,
                                  projection_dim=32)
        head_cfg = HeadConfig(num_cells=32, embed_dim=64, panorama=False,
                              multi_task=True)
        default_batch = "8"
        attn_impl = "xla"
    else:
        from pigeon_tpu.config import HeadConfig, vit_l14_336_vision

        vision_cfg = vit_l14_336_vision()
        head_cfg = HeadConfig(num_cells=2203, embed_dim=1024,
                              panorama=False, multi_task=True)
        fused = attn_impl.startswith("flash_fused")
        default_batch = ("48" if fused else "24") if quant \
            else ("56" if fused else "32")
    batch = int(os.environ.get("BENCH_BATCH", default_batch))
    size = vision_cfg.image_size

    ds = TabularImageDataset(df, image_dir=root, image_size=size,
                             normalize=False)

    def host_sweep():
        count = 0
        t0 = time.perf_counter()
        for b in iter_batches(ds, batch, num_workers=workers, prefetch=4,
                              drop_last=True):
            count += len(b["inputs"])
        return count, time.perf_counter() - t0

    host_sweep()                                 # warm pool + page cache
    host_rate = emit("host_only", *host_sweep(), workers=workers)

    if os.environ.get("BENCH_SKIP_DEVICE", "0") == "1":
        return results

    import jax
    import jax.numpy as jnp

    from pigeon_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from pigeon_tpu.data.image_ops import normalize_images
    from pigeon_tpu.models.clip import CLIPVisionTower
    from pigeon_tpu.models.embedder import token_mean_embedding
    from pigeon_tpu.models.geocell_head import GeocellHead

    tower_params = jax.jit(CLIPVisionTower(vision_cfg).init)(
        jax.random.PRNGKey(0), jnp.zeros((2, size, size, 3)))["params"]
    head_params = jax.jit(GeocellHead(head_cfg).init)(
        jax.random.PRNGKey(1), jnp.zeros((2, head_cfg.embed_dim)))["params"]
    dtype = jnp.float32 if tiny else jnp.bfloat16
    if quant:
        from pigeon_tpu.models.quant import quantize_and_calibrate

        dyn = CLIPVisionTower(vision_cfg, dtype=dtype,
                              attn_impl=attn_impl, quant=True)
        calib_px = jax.random.normal(jax.random.PRNGKey(7),
                                     (8, size, size, 3), jnp.float32)
        tower_params = quantize_and_calibrate(dyn, tower_params, calib_px)
        tower = CLIPVisionTower(vision_cfg, dtype=dtype,
                                attn_impl=attn_impl, quant="static")
    else:
        tower = CLIPVisionTower(vision_cfg, dtype=dtype,
                                attn_impl=attn_impl)
    head = GeocellHead(head_cfg, dtype=dtype)
    params = {"tower": tower_params, "head": head_params}

    def whole(p, px_u8):
        # The product uint8 wire: normalize INSIDE the jit (fuses into
        # the patch-embed matmul — serving's round-2 win).
        px = normalize_images(px_u8)
        h, _ = tower.apply({"params": p["tower"]}, px)
        emb = token_mean_embedding(h)
        out = head.apply({"params": p["head"]}, emb)
        return out.logits, emb

    jitted = jax.jit(whole)
    scalarize = jax.jit(lambda a, b: a.astype(jnp.float32).sum()
                        + b.astype(jnp.float32).sum())

    # --- transfer: host->device of real uint8 batches, readback-synced.
    pinned = [b["inputs"] for b in iter_batches(
        ds, batch, num_workers=workers, drop_last=True)]
    sum_u8 = jax.jit(lambda x: x.astype(jnp.float32).sum())
    float(sum_u8(jax.device_put(pinned[0])))     # warm the executable
    count = 0
    t0 = time.perf_counter()
    carry = None
    for arr in pinned:
        carry = sum_u8(jax.device_put(arr))
        count += len(arr)
    float(carry)
    dt = time.perf_counter() - t0
    mb = count * size * size * 3 / 1e6
    transfer_rate = emit("transfer", count, dt,
                         mb_per_s=round(mb / dt, 1))

    # --- device_only: bench.py's protocol on device-resident uint8.
    dev_px = [jax.jit(lambda key: jax.random.randint(
        key, (batch, size, size, 3), 0, 256, jnp.uint8))(
            jax.random.PRNGKey(i)) for i in range(2)]
    iters = max(len(pinned), 4)

    def window(k):
        carry = None
        t0 = time.perf_counter()
        for i in range(k):
            logits, emb = jitted(params, dev_px[i % 2])
            carry = scalarize(logits, emb)
        float(carry)
        return time.perf_counter() - t0

    window(1)                                    # compile
    window(2)                                    # steady state
    device_rate = emit("device_only", batch * iters, window(iters))

    # --- e2e: the real loop (fresh decode, transfer, async forward).
    def e2e_sweep():
        count = 0
        carry = None
        t0 = time.perf_counter()
        for b in iter_batches(ds, batch, num_workers=workers, prefetch=4,
                              drop_last=True):
            logits, emb = jitted(params, jax.device_put(b["inputs"]))
            carry = scalarize(logits, emb)
            count += len(b["inputs"])
        float(carry)
        return count, time.perf_counter() - t0

    e2e_sweep()                                  # warm
    bound = min(host_rate, transfer_rate, device_rate)
    binding = {host_rate: "host", transfer_rate: "transfer",
               device_rate: "device"}[bound]
    count, dt = e2e_sweep()
    emit("e2e", count, dt, binding_stage=binding, bound_rate=bound,
         overlap_efficiency=round((count / dt) / bound, 3))
    print(f"# e2e {count / dt:.1f} vs bound {bound} ({binding}-bound): "
          f"overlap efficiency {(count / dt) / bound:.2f}",
          file=sys.stderr)
    return results


if __name__ == "__main__":
    main()
