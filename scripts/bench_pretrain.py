"""Contrastive CLIP pretrain-step throughput benchmark (v5e).

The reference's heaviest training mode: full CLIP (ViT-L/14-336 vision +
text tower) contrastive forward + backward + AdamW, global-batch
in-batch negatives (`training/train_modes.py:30-64`, HF Trainer DDP
there). Protocol identical to scripts/bench_train.py: on-device inputs,
scalar-readback sync, median of BENCH_WINDOWS windows.

Env knobs: BENCH_BATCH (32, the reference's per-device pretrain batch),
BENCH_ITERS (6), BENCH_WINDOWS (5), BENCH_ATTN (flash_fused),
BENCH_REMAT (attn_kernel — the r7 winner; the prior r5 'attn_out'
measured pretrain 82.9 vs 77.4 img/s full-remat), BENCH_TOKENS (77).
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

    from pigeon_tpu.config import pigeon_config
    from pigeon_tpu.models.clip import CLIPModel
    from pigeon_tpu.train import create_train_state
    from pigeon_tpu.train.modes import make_pretrain_step
    from pigeon_tpu.train.train_loop import adamw

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "6"))
    windows = int(os.environ.get("BENCH_WINDOWS", "5"))
    attn_impl = os.environ.get("BENCH_ATTN", "flash_fused")
    remat = os.environ.get("BENCH_REMAT", "attn_kernel")
    tokens = int(os.environ.get("BENCH_TOKENS", "77"))

    cfg = pigeon_config()
    model = CLIPModel(cfg.vision, cfg.text, dtype=jnp.bfloat16,
                      attn_impl=attn_impl, remat=remat)
    size = cfg.vision.image_size

    # No schedule/accum: measure the raw step (the reference's accum=8 is
    # a memory workaround, not more work per image).
    opt = adamw(1e-6, b1=0.9, b2=0.98, eps=1e-6, max_grad_norm=1.0)
    example = (jnp.zeros((2, size, size, 3)),
               jnp.zeros((2, tokens), jnp.int32))
    state = create_train_state(jax.random.PRNGKey(0), model, opt, example,
                               init_kwargs={})
    step = make_pretrain_step(model, opt)

    ks = jax.random.split(jax.random.PRNGKey(5), 2)
    dev_batch = {
        "pixel_values": jax.random.normal(ks[0], (batch, size, size, 3),
                                          jnp.float32),
        "input_ids": jax.random.randint(ks[1], (batch, tokens), 0,
                                        cfg.text.vocab_size),
    }

    t0 = time.perf_counter()
    state, metrics = step(state, dev_batch)
    float(metrics["loss"])                 # sync (compile included)
    compile_s = time.perf_counter() - t0
    state, metrics = step(state, dev_batch)
    float(metrics["loss"])

    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, dev_batch)
        loss = float(metrics["loss"])      # scalar readback = sync
        per_iter = (time.perf_counter() - t0) / iters
        rates.append(batch / per_iter)
    rates.sort()
    rate = rates[len(rates) // 2]
    print(json.dumps({
        "metric": f"clip_l14_336_pretrain_images_per_sec_bs{batch}"
                  f"_{attn_impl}_remat-{remat}",
        "value": round(rate, 2),
        "unit": "images/sec",
        "loss": round(loss, 3),
    }))
    print(f"# windows={[round(r, 1) for r in rates]} "
          f"compile={compile_s:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
