"""Benchmark: ViT-L/14-336 embed + geocell classify throughput on TPU.

Measures the framework's headline number against BASELINE.json's north star
(>= 5,000 images/sec/chip for CLIP ViT-L/14 embed+classify — note this
exceeds single-chip speed of light at 336px; see docs/PERF.md). Prints ONE
JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol notes for this environment (axon-tunneled TPU; docs/PERF.md):
  * `block_until_ready` is a NO-OP through the tunnel — synchronization is
    forced by reading a scalar back to the host;
  * the remote compile service cannot compile the monolithic 24-layer
    forward (server-side "broken pipe" after ~37 min, reproducibly), while
    shallow programs compile in seconds — so the flagship forward runs
    SEGMENTED (`pigeon_tpu.models.segmented`): identical math, all 24
    layers execute, split across BENCH_SEGMENTS executables;
  * inputs are generated ON DEVICE (host->device ~6 MB/s);
  * an AWAITED dispatch costs ~32 ms round-trip but a CHAINED async
    dispatch only ~1.7 ms (the send pipelines with device compute), so
    the loop dispatches every iteration async and reads back ONE scalar
    per window (a single TPU core executes enqueued programs in order,
    so awaiting the last drains the queue). The old protocol (sync
    every iteration, subtract probed overhead) over-corrected at small
    batches — it "measured" int8 bs16 at 1667 img/s, 2.6x above int8
    speed of light.

Variance control: the timing loop runs BENCH_WINDOWS (default 5)
independent windows and reports the MEDIAN rate (all windows on stderr) —
single-window numbers on this shared tunnel vary ~10%.

Env knobs: BENCH_BATCH (route-specific default — bf16 56, the r6
flash_fused re-optimum: 378.4 vs 374.9 bs48 / 375.8 bs40 / 372.9 bs52 /
369.4 bs60 / 365.0 bs64, all one session (the pre-fusion
serial-VPU-share argument that picked 32 no longer binds once the
projections run in-kernel); int8 48: 586.2 — full r7 curve 577.1 bs40 /
572.1 bs44 / 554.2 bs52 / 555.5 bs56 / 568.4 bs64 / 575.7 bs72; the r4
"bs48 VMEM-spill to 408.3" did NOT reproduce on a clean rebuild — one
pathological server-side compile, not a shape property
(docs/PERF.md)), BENCH_ITERS (16 — at bs32 a window is
~1.6 s, long enough to drown scheduling jitter), BENCH_SEGMENTS (1),
BENCH_WINDOWS (5), BENCH_ATTN (flash_fused — the QKV-projection+
attention fusion, measured 374 vs 316 img/s for 'flash' same-session;
docs/PERF.md), BENCH_QUANT (0; 1 = the int8 W8A8 serving path,
`models/quant.py` — separate metric name, default headline stays
bf16; the int8 route is flash_fused (`fused_qkv_mha_int8`, r4: 565.9
vs 434.1 img/s for 'flash' at bs32, Mosaic parity err 0.0)).
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_IMAGES_PER_SEC = 5000.0

#: Single-chip v5e speed of light for this model (docs/PERF.md §SOL):
#: ~382 GFLOP/image at 336px over ~197 TFLOP/s bf16 peak. The int8 path
#: quantizes ~91% of forward FLOPs onto the ~1.8x-rate int8 MXU
#: (measured 286 TOPS vs 160 TFLOPS), so its SOL is
#: 515 / (0.91/1.8 + 0.09) ≈ 865 img/s.
SOL_IMAGES_PER_SEC_BF16 = 515.0
SOL_IMAGES_PER_SEC_INT8 = 865.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pigeon_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()   # cold remote compiles cost 60-380 s once
    from pigeon_tpu.config import HeadConfig, vit_l14_336_vision
    from pigeon_tpu.models.clip import CLIPVisionTower
    from pigeon_tpu.models.geocell_head import GeocellHead
    from pigeon_tpu.models.segmented import (
        build_segmented_forward,
        run_segmented,
    )

    # Both the bf16 and int8 routes default to the fused QKV kernels
    # (`fused_qkv_mha` / `fused_qkv_mha_int8`) — the int8 fusion was
    # hardware-validated in the r4 session (parity err 0.0, 565.9 vs
    # 434.1 img/s for the separate-projection 'flash' route).
    attn_impl = os.environ.get("BENCH_ATTN", "flash_fused")
    # Measured optima differ per ROUTE: bf16 flash_fused peaks at bs56
    # (r6: 378.4 vs 374.9 bs48 / 372.9 bs52 / 369.4 bs60, a
    # grid-divisibility bump measured in ONE session) and int8
    # flash_fused at bs48 (r7: 586.2 vs 577.1 bs40 / 572.1 bs44 /
    # 554.2 bs52 — the r4 "bs48 VMEM spill" was one pathological
    # server-side compile and did not reproduce). The old
    # separate-projection 'flash' route keeps bs32 bf16 (317 vs 313
    # bs48) / bs24 int8 (450). The default follows the selected impl
    # (advisor r3).
    fused = attn_impl.startswith("flash_fused")
    if os.environ.get("BENCH_QUANT", "0") == "1":
        default_batch = "48" if fused else "24"
    else:
        default_batch = "56" if fused else "32"
    batch = int(os.environ.get("BENCH_BATCH", default_batch))
    iters = int(os.environ.get("BENCH_ITERS", "16"))
    segments = int(os.environ.get("BENCH_SEGMENTS", "1"))

    vision_cfg = vit_l14_336_vision()
    head_cfg = HeadConfig(num_cells=2203, embed_dim=1024, panorama=False,
                          multi_task=True)

    # init compiles cheaply (forward is dead-code-eliminated).
    size = vision_cfg.image_size
    tower_params = jax.jit(CLIPVisionTower(vision_cfg).init)(
        jax.random.PRNGKey(0), jnp.zeros((2, size, size, 3)))["params"]
    head_params = jax.jit(GeocellHead(head_cfg).init)(
        jax.random.PRNGKey(1), jnp.zeros((2, 1024)))["params"]

    quant = os.environ.get("BENCH_QUANT", "0") == "1"
    if quant:
        from pigeon_tpu.models.embedder import token_mean_embedding
        from pigeon_tpu.models.quant import quantize_and_calibrate

        # The exact serving recipe (shared with `cli serve --quant`):
        # per-channel weight quant + one dynamic-mode forward to freeze
        # activation scales (no runtime reduces in the static model).
        dyn = CLIPVisionTower(vision_cfg, dtype=jnp.bfloat16,
                              attn_impl=attn_impl, quant=True)
        calib_px = jax.random.normal(jax.random.PRNGKey(7),
                                     (8, size, size, 3), jnp.float32)
        qtower = quantize_and_calibrate(dyn, tower_params, calib_px)

        tower = CLIPVisionTower(vision_cfg, dtype=jnp.bfloat16,
                                attn_impl=attn_impl, quant="static")
        head = GeocellHead(head_cfg, dtype=jnp.bfloat16)
        qparams = {"tower": qtower, "head": head_params}

        def whole(p, px):
            h, _ = tower.apply({"params": p["tower"]}, px)
            emb = token_mean_embedding(h)
            out = head.apply({"params": p["head"]}, emb)
            return out.logits, emb

        jitted = jax.jit(whole)
        fns = [lambda px, _f=jitted, _p=qparams: _f(_p, px)]
    else:
        fns = build_segmented_forward(
            vision_cfg, head_cfg, tower_params, head_params, segments,
            dtype=jnp.bfloat16, attn_impl=attn_impl)
    scalarize = jax.jit(lambda a, b: a.astype(jnp.float32).sum()
                        + b.astype(jnp.float32).sum())

    pixels = [jax.random.normal(jax.random.PRNGKey(i),
                                (batch, size, size, 3), jnp.float32)
              for i in range(2)]

    def window(iters):
        """iters async-dispatched forwards, ONE readback at the end.

        No explicit data dependency is needed: a single TPU core
        executes enqueued programs in order, so awaiting the LAST
        scalar drains the whole queue. (An input-perturbation chain was
        tried first — the (B, 336, 336, 3) eager add costs ~90 ms/iter
        because the trailing dim of 3 lane-pads 3->128 on the VPU.)"""
        carry = None
        t0 = time.perf_counter()
        for i in range(iters):
            logits, emb = run_segmented(fns, pixels[i % 2])
            carry = scalarize(logits, emb)
        float(carry)                       # sync: the whole queue drained
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    window(1)                              # compiles all segments
    compile_s = time.perf_counter() - t0
    window(2)                              # steady state warmup

    windows = int(os.environ.get("BENCH_WINDOWS", "5"))
    rates = []
    for _ in range(windows):
        rates.append(batch * iters / window(iters))
    rates.sort()
    rate = rates[len(rates) // 2]          # median window
    sol = SOL_IMAGES_PER_SEC_INT8 if quant else SOL_IMAGES_PER_SEC_BF16
    print(json.dumps({
        "metric": "vit_l14_336_embed_classify_images_per_sec_per_chip"
                  f"_bs{batch}_{attn_impl}{'_int8' if quant else ''}",
        "value": round(rate, 2),
        "unit": "images/sec",
        "vs_baseline": round(rate / BASELINE_IMAGES_PER_SEC, 4),
        # BASELINE.json's 5,000 img/s north star is ~10x past single-chip
        # speed of light at 336px (docs/PERF.md §SOL); mfu = fraction of
        # the SOL actually achieved — the self-interpreting number.
        "mfu": round(rate / sol, 4),
    }))
    print(f"# windows={[round(r, 1) for r in rates]} "
          f"compile={compile_s:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
