"""Re-probe the int8/bf16 MXU rates at the MODEL's dot shapes.

VERDICT r4 weak-#2: the int8 SOL (865 img/s) rests on ONE n=8192
square-matmul probe (286 TOPS vs 160 TFLOPS bf16). This script measures
the SUSTAINED rate of each distinct dot shape the quantized ViT-L/14-336
layer actually issues (B=48, S=577 -> M=27,696):

  proj  (M, 1024) @ (1024, 1024)   x4 per layer (q, k, v, out)
  fc1   (M, 1024) @ (1024, 4096)
  fc2   (M, 4096) @ (4096, 1024)

plus the per-layer activation-quantize pass (round/clip/cast f32->int8
of (B, S, D), a pure VPU+HBM op with no bf16 counterpart) — the int8
route's overhead the SOL model ignores.

Protocol: each probe is ONE program containing a `lax.fori_loop` of
LOOP_ITERS dot iterations (a 1-element dynamic_update_slice feeds the
output back into the input so XLA cannot hoist the dot out of the
loop); host dispatch overhead (~1.7 ms chained, docs/PERF.md) is paid
once per window instead of once per dot, so sub-millisecond ops
measure honestly. Median of BENCH_WINDOWS windows.

Output: one JSON line per (shape, dtype) with achieved TOPS/TFLOPS and
the int8:bf16 ratio — the honest denominators for the int8 SOL model
in docs/PERF.md.

Env knobs: BENCH_BATCH (48), LOOP_ITERS (32), BENCH_WINDOWS (5).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pigeon_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    B = int(os.environ.get("BENCH_BATCH", "48"))
    S, D, INTER = 577, 1024, 4096
    M = B * S
    loop_iters = int(os.environ.get("LOOP_ITERS", "32"))
    windows = int(os.environ.get("BENCH_WINDOWS", "5"))
    rng = np.random.default_rng(11)

    def probe_dot(name, m, k, n, int8: bool):
        if int8:
            x0 = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
            w = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
        else:
            x0 = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.bfloat16)
            w = jnp.asarray(rng.normal(0, 0.02, (k, n)), jnp.bfloat16)
        x0, w = jax.device_put(x0), jax.device_put(w)

        def body(i, carry):
            x, s = carry
            if int8:
                y = jax.lax.dot_general(
                    x, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                dep = (y[:1, :1] & 1).astype(jnp.int8)
                s = s + y[0, 0].astype(jnp.float32)
            else:
                y = x @ w
                dep = y[:1, :1].astype(x.dtype)
                s = s + y[0, 0].astype(jnp.float32)
            # 1-element feedback: forces iteration ordering without a
            # full-array pass (the carry buffer aliases in place).
            x = jax.lax.dynamic_update_slice(x, dep, (0, 0))
            return x, s

        @jax.jit
        def run(x):
            _, s = jax.lax.fori_loop(0, loop_iters, body, (x, 0.0))
            return s

        float(run(x0))          # compile + first execution
        float(run(x0))
        times = []
        for _ in range(windows):
            t0 = time.perf_counter()
            float(run(x0))      # one dispatch, loop_iters dots
            times.append((time.perf_counter() - t0) / loop_iters)
        med = sorted(times)[windows // 2]
        tops = 2.0 * m * k * n / med / 1e12
        print(json.dumps({
            "probe": name, "dtype": "int8" if int8 else "bf16",
            "shape": [m, k, n], "us_per_dot": round(med * 1e6, 2),
            "tops": round(tops, 1)}))
        sys.stdout.flush()
        return med, tops

    def probe_quantize():
        """round/clip/cast of the (B, S, D) activation — the int8-only
        per-layer overhead (6 of these per layer: pre-QKV, pre-out,
        pre-fc1, pre-fc2 + 2 dequant-side casts folded elsewhere)."""
        x0 = jax.device_put(
            jnp.asarray(rng.normal(0, 1, (B, S, D)), jnp.float32))

        def body(i, carry):
            x, s = carry
            q = jnp.clip(jnp.round(x / jnp.float32(0.05)),
                         -127, 127).astype(jnp.int8)
            s = s + q[0, 0, 0].astype(jnp.float32)
            x = jax.lax.dynamic_update_slice(
                x, q[:1, :1, :1].astype(jnp.float32), (0, 0, 0))
            return x, s

        @jax.jit
        def run(x):
            _, s = jax.lax.fori_loop(0, loop_iters, body, (x, 0.0))
            return s

        float(run(x0))
        float(run(x0))
        times = []
        for _ in range(windows):
            t0 = time.perf_counter()
            float(run(x0))
            times.append((time.perf_counter() - t0) / loop_iters)
        med = sorted(times)[windows // 2]
        gb = (B * S * D * 5) / 1e9      # 4 B read + 1 B write
        print(json.dumps({
            "probe": "quantize_act", "dtype": "f32->int8",
            "shape": [B, S, D], "us_per_call": round(med * 1e6, 2),
            "gbps": round(gb / med, 1)}))
        sys.stdout.flush()

    shapes = [("proj", M, D, D), ("fc1", M, D, INTER),
              ("fc2", M, INTER, D)]
    results = {}
    for name, m, k, n in shapes:
        t8, r8 = probe_dot(name, m, k, n, int8=True)
        tb, rb = probe_dot(name, m, k, n, int8=False)
        results[name] = (t8, tb)
        print(json.dumps({"probe": name, "int8_vs_bf16": round(tb / t8, 3)}))
    probe_quantize()

    # Per-image MXU floor from the measured per-shape rates: 24 layers x
    # (4 proj + fc1 + fc2), per image = /B.
    for tag, idx in (("int8", 0), ("bf16", 1)):
        per_layer = 4 * results["proj"][idx] + results["fc1"][idx] \
            + results["fc2"][idx]
        per_img_ms = 24 * per_layer / B * 1e3
        print(json.dumps({
            "probe": f"mxu_floor_{tag}",
            "projection_dots_ms_per_img": round(per_img_ms, 4),
            "img_per_sec_if_dots_only": round(1e3 / per_img_ms, 1)}))


if __name__ == "__main__":
    main()
