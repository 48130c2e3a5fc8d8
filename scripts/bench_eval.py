"""Full eval-pipeline throughput: forward + top-50 + batched refinement.

Times the PRODUCT path — `train.loop.evaluate_model` with a real
`make_eval_step` and a production-size prototype bank — not an isolated
kernel. evaluate_model accumulates device arrays and defers every
readback to the end (late round 2), so eval batches chain-dispatch;
this bench validates that on hardware.

Batches are pre-staged on device (host->device is ~6 MB/s through the
tunnel; a real run overlaps decode via iter_batches prefetch).

Env knobs: BENCH_BATCH (route-aware like the product CLI: 48 int8 /
56 bf16 on the fused route — the r7/r6 optima; 32 otherwise),
BENCH_BATCHES (8), BENCH_TOPK (40),
BENCH_REFINE (1), BENCH_ATTN (flash_fused — matches the PRODUCT route:
`cli.run._attn_impl` resolves 'flash_fused' for eval and
`_quant_attn_impl` keeps it under int8; the r5 session's int8 leg
accidentally measured the old 'flash' route at 410.9 because this
default said 'flash' while the product said 'flash_fused' — keep the
two in lockstep), BENCH_QUANT (0; 1 = int8 W8A8
tower, the `evaluate --quant` path).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    import jax

    from pigeon_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    from pigeon_tpu.config import HeadConfig, RefinerConfig, \
        vit_l14_336_vision
    from pigeon_tpu.models.refiner import ProtoBank, make_refine_fn
    from pigeon_tpu.models.super_guessr import SuperGuessr
    from pigeon_tpu.train import make_eval_step

    n_batches = int(os.environ.get("BENCH_BATCHES", "8"))
    topk = int(os.environ.get("BENCH_TOPK", "40"))
    refine = os.environ.get("BENCH_REFINE", "1") == "1"
    attn_impl = os.environ.get("BENCH_ATTN", "flash_fused")
    # Default batch mirrors `cli.run._default_batch` (bf16 r6 / int8
    # r7 optima) so this
    # bench measures the batch the product actually dispatches.
    if attn_impl.startswith("flash_fused"):
        default_batch = "48" if os.environ.get("BENCH_QUANT") == "1" \
            else "56"
    else:
        default_batch = "32"
    batch = int(os.environ.get("BENCH_BATCH", default_batch))

    num_cells, protos, dim, members = 2203, 64, 1024, 100_000
    vision_cfg = vit_l14_336_vision()
    # multi_task=False: benchmark rows carry no multi-task labels, so
    # this matches what `cmd_evaluate` runs on real benchmarks.
    head_cfg = HeadConfig(num_cells=num_cells, embed_dim=dim,
                          panorama=False, multi_task=False,
                          num_candidates=50)
    model = SuperGuessr(vision_cfg, head_cfg, dtype=jnp.bfloat16,
                        attn_impl=attn_impl)
    size = vision_cfg.image_size
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((2, size, size, 3)))["params"]

    quant = os.environ.get("BENCH_QUANT", "0") == "1"
    if quant:
        from pigeon_tpu.models.quant import quantize_and_calibrate

        dyn = SuperGuessr(vision_cfg, head_cfg, dtype=jnp.bfloat16,
                          attn_impl=attn_impl, quant=True)
        calib = jax.random.normal(jax.random.PRNGKey(7),
                                  (8, size, size, 3), jnp.float32)
        params = quantize_and_calibrate(dyn, params, calib,
                                        tower_key="vision")
        model = SuperGuessr(vision_cfg, head_cfg, dtype=jnp.bfloat16,
                            attn_impl=attn_impl, quant="static")

    rng = np.random.default_rng(0)
    cells = np.stack([rng.uniform(-170, 170, num_cells),
                      rng.uniform(-55, 65, num_cells)],
                     -1).astype(np.float32)
    eval_step = make_eval_step(model, head_cfg, cells, num_candidates=50)

    refine_fn = None
    if refine:
        # Production-size bank generated ON DEVICE (~0.9 GB HBM).
        ks = jax.random.split(jax.random.PRNGKey(1), 4)
        counts = jax.random.randint(ks[3], (num_cells, protos), 0, 40)
        bank = ProtoBank(
            proto_emb=jax.random.normal(ks[0], (num_cells, protos, dim),
                                        jnp.float32),
            proto_lla=jax.random.uniform(ks[1], (num_cells, protos, 2),
                                         jnp.float32, -60, 60),
            proto_count=counts,
            member_idx=jax.random.randint(ks[2], (num_cells, protos, 40),
                                          0, members),
            bank_emb=jax.random.normal(ks[0], (members, dim), jnp.float32),
            bank_lla=jax.random.uniform(ks[1], (members, 2), jnp.float32,
                                        -60, 60),
        )
        cfg = RefinerConfig(topk=topk, max_refinement_km=100000.0,
                            temperature=1.0)
        refine_fn = make_refine_fn(bank, cfg)

    # Pre-staged device batches with labels (the metric suite needs them).
    batches = []
    for i in range(n_batches):
        ks = jax.random.split(jax.random.PRNGKey(10 + i), 3)
        batches.append({
            "inputs": jax.random.normal(ks[0], (batch, size, size, 3),
                                        jnp.float32),
            "labels": jnp.stack(
                [jax.random.uniform(ks[1], (batch,), minval=-170,
                                    maxval=170),
                 jax.random.uniform(ks[2], (batch,), minval=-55,
                                    maxval=65)], -1),
        })

    from pigeon_tpu.train.loop import evaluate_model

    # Warm (compile forward + refiner).
    evaluate_model(eval_step, params, batches[:1], refine_fn=refine_fn)

    t0 = time.perf_counter()
    metrics = evaluate_model(eval_step, params, batches,
                             refine_fn=refine_fn)
    wall = time.perf_counter() - t0
    rate = batch * n_batches / wall
    print(json.dumps({
        "metric": "vit_l14_336_eval_pipeline_images_per_sec"
                  f"_bs{batch}_top{topk}"
                  f"{'_refined' if refine else ''}"
                  f"{'_int8' if quant else ''}",
        "value": round(rate, 2),
        "unit": "images/sec",
        "median_km": round(float(metrics["Median_km_error"]), 1),
    }))
    print(f"# wall={wall:.2f}s batches={n_batches} incl. metric suite",
          file=sys.stderr)


if __name__ == "__main__":
    main()
