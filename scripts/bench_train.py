"""Training-step throughput benchmark (ViT-L/14-336 SuperGuessr, v5e).

Measures the full train step (forward + backward + AdamW update) on real
TPU hardware with the same protocol as bench.py: on-device inputs, scalar
readback for synchronization (block_until_ready is a no-op through the
axon tunnel), median of BENCH_WINDOWS timing windows.

Env knobs: BENCH_BATCH (32), BENCH_ITERS (6), BENCH_WINDOWS (5),
BENCH_ATTN (flash_fused — the r7 training winner with
remat='attn_kernel' and the kernel backward, 95.4 img/s bs48 vs 88.4
under the r5 'attn_out'; comma-separated
list runs an in-process A/B so the
variants share one tunnel session — e.g. "flash,flash_fused"; an entry
may carry a per-variant remat as "impl:remat", e.g.
"flash_fused_mlp:none" — under the fused custom_vjp layers the outer
jax.checkpoint re-runs the Pallas forward whose output the vjp never
reads, so remat='none' stores only per-layer block inputs (~0.9 GB at
bs32) and drops that third pass — and an optional third field
"impl:remat:bwd" selecting the fused-QKV backward, e.g.
"flash_fused:full:kernel" -> PIGEON_FUSED_BWD=kernel), BENCH_REMAT
(full | attn_out | attn_kernel | none; the default for entries
without a suffix).

A variant that fails (e.g. remote-compile HTTP 500 on an
out-of-memory graph) is reported and skipped — the A/B continues so
one bad combination cannot burn the shared tunnel session.

BENCH_PANORAMA=1 (r8) benches the flagship PIGEON config instead:
4-view panorama fold + heading features + hierarchical aggregation
(reference `config.py:96-116`). BENCH_BATCH counts SAMPLES there
(4x the images); the JSON reports images/s (comparable with the
single-view row) plus samples_per_sec.
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

    from pigeon_tpu.config import HeadConfig, vit_l14_336_vision
    from pigeon_tpu.models.super_guessr import SuperGuessr
    from pigeon_tpu.train import create_train_state
    from pigeon_tpu.train.train_loop import adamw, make_train_step

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "6"))
    windows = int(os.environ.get("BENCH_WINDOWS", "5"))
    attn_impls = os.environ.get("BENCH_ATTN", "flash_fused").split(",")
    default_remat = os.environ.get("BENCH_REMAT", "attn_kernel")

    # BENCH_PANORAMA=1 (r8): the flagship PIGEON config — 4-view
    # panorama fold + heading features + hierarchical aggregation.
    # BENCH_BATCH then counts SAMPLES (4x the images); the JSON line
    # reports images/s for direct comparison with the single-view row
    # plus a samples_per_sec field.
    panorama = os.environ.get("BENCH_PANORAMA", "0") == "1"
    views = 4 if panorama else 1

    vision_cfg = vit_l14_336_vision()
    head_cfg = HeadConfig(num_cells=2203, embed_dim=1024,
                          panorama=panorama, multi_task=True)
    size = vision_cfg.image_size
    import numpy as np

    cells = np.stack([np.linspace(-170, 170, head_cfg.num_cells),
                      np.linspace(-55, 65, head_cfg.num_cells)],
                     -1).astype(np.float32)

    # On-device batch (host->device is ~6 MB/s through the tunnel).
    ks = jax.random.split(jax.random.PRNGKey(5), 8)
    in_shape = ((batch, 4, size, size, 3) if panorama
                else (batch, size, size, 3))
    dev_batch = {
        "inputs": jax.random.normal(ks[0], in_shape, jnp.float32),
        "labels": jnp.stack(
            [jax.random.uniform(ks[1], (batch,), minval=-170, maxval=170),
             jax.random.uniform(ks[2], (batch,), minval=-55, maxval=65)],
            -1),
        "labels_clf": jax.random.randint(ks[3], (batch,), 0,
                                         head_cfg.num_cells),
        "labels_multi_task": jax.random.normal(ks[4], (batch, 6)),
        "labels_climate": jax.random.randint(ks[5], (batch,), 0, 28),
        "labels_month": jax.random.randint(ks[6], (batch,), 0, 12),
    }
    if panorama:
        theta = jax.random.uniform(ks[7], (batch, 4), maxval=2 * 3.14159)
        dev_batch["heading"] = jnp.stack(
            [jnp.sin(theta), jnp.cos(theta)], -1)
    rng = jax.random.PRNGKey(7)

    for entry in attn_impls:
        attn_impl, _, rest = entry.partition(":")
        remat, _, bwd = rest.partition(":")
        remat = remat or default_remat
        # Optional third field selects the fused-QKV backward
        # ("impl:remat:kernel" -> PIGEON_FUSED_BWD=kernel, read at
        # trace time by `_fused_qkv_bwd`); empty leaves the env as-is.
        if bwd:
            os.environ["PIGEON_FUSED_BWD"] = bwd
        try:
            model = SuperGuessr(vision_cfg, head_cfg, dtype=jnp.bfloat16,
                                attn_impl=attn_impl, remat=remat)
            example = jnp.zeros((2, 4, size, size, 3) if panorama
                                else (2, size, size, 3))
            opt = adamw(2e-5)
            state = create_train_state(jax.random.PRNGKey(0), model, opt,
                                       (example,))
            # BENCH_GRAD_NORM=0 drops the grad_norm metric — a
            # batch-dependent compile-schedule artifact, ~+0.5% at
            # bs48 / -1.0% at bs32 (r8 A/B, PERF.md); default matches
            # the product step (metric on).
            step = make_train_step(
                model, opt, head_cfg, cells,
                grad_norm_metric=os.environ.get("BENCH_GRAD_NORM",
                                                "1") == "1")

            t0 = time.perf_counter()
            state, metrics = step(state, dev_batch, rng)
            float(metrics["loss"])         # sync (compile included)
            compile_s = time.perf_counter() - t0
            state, metrics = step(state, dev_batch, rng)
            float(metrics["loss"])

            rates = []
            for _ in range(windows):
                t0 = time.perf_counter()
                for _ in range(iters):
                    state, metrics = step(state, dev_batch, rng)
                loss = float(metrics["loss"])  # scalar readback = sync
                per_iter = (time.perf_counter() - t0) / iters
                rates.append(batch * views / per_iter)
        except Exception as e:  # noqa: BLE001 — e.g. compile OOM/500
            print(f"# {attn_impl}:remat-{remat}{':' + bwd if bwd else ''}"
                  f" FAILED {type(e).__name__}: {str(e)[:300]}",
                  file=sys.stderr)
            continue
        rates.sort()
        rate = rates[len(rates) // 2]
        payload = {
            "metric": f"vit_l14_336_train_images_per_sec_bs{batch}"
                      + ("_pano4" if panorama else "")
                      + f"_{attn_impl}_remat-{remat}"
                      + (f"_bwd-{bwd}" if bwd else ""),
            "value": round(rate, 2),
            "unit": "images/sec",
            "loss": round(loss, 3),
        }
        if panorama:
            payload["samples_per_sec"] = round(rate / 4, 2)
        print(json.dumps(payload))
        print(f"# windows={[round(r, 1) for r in rates]} "
              f"compile={compile_s:.1f}s", file=sys.stderr)
        sys.stdout.flush()


if __name__ == "__main__":
    main()
