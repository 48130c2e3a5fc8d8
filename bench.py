"""Benchmark: ViT-L/14-336 embed + geocell classify throughput on TPU.

Measures the framework's headline number against BASELINE.json's north star
(>= 5,000 images/sec/chip for CLIP ViT-L/14 embed+classify). Prints ONE
JSON line: {"metric", "value", "unit", "vs_baseline"}.

Run on the real chip: `python bench.py` (do NOT force CPU).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_IMAGES_PER_SEC = 5000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pigeon_tpu.config import HeadConfig, vit_l14_336_vision
    from pigeon_tpu.models.super_guessr import SuperGuessr

    vision_cfg = vit_l14_336_vision()
    head_cfg = HeadConfig(num_cells=2203, embed_dim=1024, panorama=False,
                          multi_task=True)
    model = SuperGuessr(vision_cfg, head_cfg, dtype=jnp.bfloat16)

    init_pixels = jnp.zeros(
        (2, vision_cfg.image_size, vision_cfg.image_size, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), init_pixels)["params"]

    @jax.jit
    def forward(pixels):
        out = model.apply({"params": params}, pixels)
        return out.logits, out.embedding

    rng = np.random.default_rng(0)
    best_rate = 0.0
    best_batch = 0
    for batch in (128, 256):
        try:
            pixels = jnp.asarray(rng.normal(size=(
                batch, vision_cfg.image_size, vision_cfg.image_size, 3)
            ).astype(np.float32))
            # Warmup (compile + 2 steady-state iterations).
            jax.block_until_ready(forward(pixels))
            jax.block_until_ready(forward(pixels))
            jax.block_until_ready(forward(pixels))
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                out = forward(pixels)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            rate = batch * iters / dt
            if rate > best_rate:
                best_rate, best_batch = rate, batch
        except Exception as e:  # OOM at larger batch: keep best so far
            print(f"batch {batch} failed: {e}", file=sys.stderr)
            break

    print(json.dumps({
        "metric": "vit_l14_336_embed_classify_images_per_sec_per_chip"
                  f"_bs{best_batch}",
        "value": round(best_rate, 2),
        "unit": "images/sec",
        "vs_baseline": round(best_rate / BASELINE_IMAGES_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
