"""Per-op trace profile of the CURRENT training winner (r8 route).

VERDICT r4 weak-#3: the only published per-op training profile
(docs/PERF.md "Trace profile ... 271 ms backward / 95 ms forward") is of
the OBSOLETE r2 flash:full route; the current winner (flash_fused +
remat='attn_kernel' + PIGEON_FUSED_BWD=kernel) has no profile, so the next
structural lever is unidentified. This script captures a jax.profiler
trace of the winner step (same setup as scripts/bench_train.py — the
reference's hot loop, training/train_eval_loop.py:215-223) and prints:

  * the dependency-free per-op summary (profiling.summarize_trace),
  * a grouped view: forward scan vs backward while vs optimizer/rest,
  * step wall time from the chained-dispatch protocol for cross-checking
    the trace against the e2e number.

Env knobs: BENCH_BATCH (48 — the operator throughput batch), BENCH_ATTN
("flash_fused:attn_kernel:kernel", same "impl:remat:bwd" syntax as
bench_train), PROFILE_DIR (/tmp/pigeon_trace_train), PROFILE_STEPS (3),
PROFILE_TOP (30).
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

    from pigeon_tpu.config import HeadConfig, vit_l14_336_vision
    from pigeon_tpu.models.super_guessr import SuperGuessr
    from pigeon_tpu.train import create_train_state
    from pigeon_tpu.train.profiling import summarize_trace
    from pigeon_tpu.train.train_loop import adamw, make_train_step

    batch = int(os.environ.get("BENCH_BATCH", "48"))
    entry = os.environ.get("BENCH_ATTN",
                           "flash_fused:attn_kernel:kernel")
    attn_impl, _, rest = entry.partition(":")
    remat, _, bwd = rest.partition(":")
    if bwd:
        os.environ["PIGEON_FUSED_BWD"] = bwd
    trace_dir = os.environ.get("PROFILE_DIR", "/tmp/pigeon_trace_train")
    steps = int(os.environ.get("PROFILE_STEPS", "3"))
    top = int(os.environ.get("PROFILE_TOP", "30"))

    vision_cfg = vit_l14_336_vision()
    head_cfg = HeadConfig(num_cells=2203, embed_dim=1024, panorama=False,
                          multi_task=True)
    size = vision_cfg.image_size
    cells = np.stack([np.linspace(-170, 170, head_cfg.num_cells),
                      np.linspace(-55, 65, head_cfg.num_cells)],
                     -1).astype(np.float32)
    ks = jax.random.split(jax.random.PRNGKey(5), 7)
    dev_batch = {
        "inputs": jax.random.normal(ks[0], (batch, size, size, 3),
                                    jnp.float32),
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
    rng = jax.random.PRNGKey(7)

    model = SuperGuessr(vision_cfg, head_cfg, dtype=jnp.bfloat16,
                        attn_impl=attn_impl,
                        remat=remat or "attn_kernel")
    opt = adamw(2e-5)
    state = create_train_state(jax.random.PRNGKey(0), model, opt,
                               (jnp.zeros((2, size, size, 3)),))
    step = make_train_step(model, opt, head_cfg, cells)

    t0 = time.perf_counter()
    state, metrics = step(state, dev_batch, rng)
    float(metrics["loss"])
    print(f"# compile {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    state, metrics = step(state, dev_batch, rng)
    float(metrics["loss"])

    # e2e cross-check (chained protocol, one window).
    iters = int(os.environ.get("BENCH_ITERS", "6"))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, dev_batch, rng)
    float(metrics["loss"])
    per_step_ms = (time.perf_counter() - t0) / iters * 1000.0
    print(f"# e2e {batch / (per_step_ms / 1000):.1f} img/s "
          f"({per_step_ms:.1f} ms/step)", file=sys.stderr)

    def one_step():
        nonlocal state
        state, m = step(state, dev_batch, rng)
        float(m["loss"])

    jax.profiler.start_trace(trace_dir)
    try:
        for _ in range(steps):
            one_step()
    finally:
        jax.profiler.stop_trace()

    rows = summarize_trace(trace_dir, top=top)
    total_ms = sum(r[1] for r in rows)
    print(f"# trace: top-{top} rows sum {total_ms:.1f} ms over "
          f"{steps} steps ({total_ms / steps:.1f} ms/step)",
          file=sys.stderr)
    for name, ms, pct in rows:
        print(f"#   {ms / steps:9.2f} ms/step {pct:5.1f}%  {name[:90]}",
              file=sys.stderr)
    print(json.dumps({
        "metric": f"train_profile_bs{batch}_{entry.replace(':', '-')}",
        "value": round(per_step_ms, 2),
        "unit": "ms/step",
        "img_per_sec": round(batch / (per_step_ms / 1000), 2),
        "top_ops": [{"name": n[:90], "ms_per_step": round(m / steps, 3),
                     "pct": round(p, 2)} for n, m, p in rows],
    }))


if __name__ == "__main__":
    main()
