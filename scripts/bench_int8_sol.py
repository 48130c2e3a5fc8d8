"""Re-probe the int8/bf16 MXU rates at the MODEL's dot shapes.

VERDICT r4 weak-#2: the int8 SOL (865 img/s) rests on ONE n=8192
square-matmul probe (286 TOPS vs 160 TFLOPS bf16). This script measures
the SUSTAINED rate of the dot shapes the quantized ViT-L/14-336 layer
actually issues (B=48, S=577 -> M=27,696):

  proj      (M, 1024) @ (1024, 1024), output chained into the next
            dot's input — 4 of these per layer (q, k, v, out).
  mlp_pair  (M, 1024) @ (1024, 4096) -> requant -> (M, 4096) @
            (4096, 1024) — the fc1+fc2 pair exactly as the static-quant
            MLP runs it (int8: int32 accumulate + shift-requant between
            the dots; bf16: plain chained matmuls).

plus the per-layer activation-quantize pass (round/clip/cast f32->int8
of (B, S, D), a pure VPU+HBM op with no bf16 counterpart).

Probe design (two earlier attempts were wrong, kept here as protocol
notes): a loop whose dependency reads only y[0,0] lets XLA shrink the
dot to one row ("284 TFLOPS bf16" > the 197 peak — dead-code); adding a
full jnp.sum(y) per iteration keeps the dot live but serializes a
454 MB reduce against every dot (bf16 "rates" capped at ~115 TFLOPS,
below the model's own sustained 144). The honest structure is the
model's: each dot's OUTPUT is the next dot's INPUT (requantized in int8
mode), every element live, no artificial epilogue; one scalar readback
per window. Host dispatch (~1.7 ms chained) is paid once per window of
LOOP_ITERS in-device iterations.

Output: one JSON line per (shape, dtype) with achieved TOPS/TFLOPS and
the int8:bf16 ratio — the honest denominators for the int8 SOL model in
docs/PERF.md.

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

    def time_loop(run, x0, flops_per_iter, name, dtype_tag, shape):
        float(run(x0))          # compile + first (server-side) build
        float(run(x0))
        times = []
        for _ in range(windows):
            t0 = time.perf_counter()
            float(run(x0))      # one dispatch, loop_iters chained dots
            times.append((time.perf_counter() - t0) / loop_iters)
        med = sorted(times)[windows // 2]
        tops = flops_per_iter / med / 1e12
        print(json.dumps({
            "probe": name, "dtype": dtype_tag, "shape": shape,
            "us_per_iter": round(med * 1e6, 2), "tops": round(tops, 1)}))
        sys.stdout.flush()
        return med

    def probe_proj(int8: bool):
        """(M, D) @ (D, D), output requantized/cast into the next
        iteration's input — the q/k/v/out projection shape."""
        if int8:
            x0 = jnp.asarray(rng.integers(-127, 127, (M, D)), jnp.int8)
            w = jax.device_put(
                jnp.asarray(rng.integers(-127, 127, (D, D)), jnp.int8))

            def body(i, x):
                y = jax.lax.dot_general(
                    x, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                # shift-requant: the epilogue cast the static-quant
                # model also pays (int32 accum -> 8-bit activation).
                return (y >> 7).astype(jnp.int8)
        else:
            x0 = jnp.asarray(rng.normal(0, 1, (M, D)), jnp.bfloat16)
            w = jax.device_put(jnp.asarray(
                rng.normal(0, 1.0 / np.sqrt(D), (D, D)), jnp.bfloat16))

            def body(i, x):
                return x @ w

        @jax.jit
        def run(x):
            out = jax.lax.fori_loop(0, loop_iters, body, x)
            return out.astype(jnp.float32).sum()

        return time_loop(run, jax.device_put(x0), 2.0 * M * D * D,
                         "proj", "int8" if int8 else "bf16", [M, D, D])

    def probe_mlp_pair(int8: bool):
        """(M, D) @ (D, INTER) -> requant -> (M, INTER) @ (INTER, D):
        the fc1+fc2 pair, intermediate written/read exactly once."""
        if int8:
            x0 = jnp.asarray(rng.integers(-127, 127, (M, D)), jnp.int8)
            w1 = jax.device_put(jnp.asarray(
                rng.integers(-127, 127, (D, INTER)), jnp.int8))
            w2 = jax.device_put(jnp.asarray(
                rng.integers(-127, 127, (INTER, D)), jnp.int8))

            def body(i, x):
                h = jax.lax.dot_general(
                    x, w1, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                h8 = (h >> 7).astype(jnp.int8)
                y = jax.lax.dot_general(
                    h8, w2, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return (y >> 9).astype(jnp.int8)
        else:
            x0 = jnp.asarray(rng.normal(0, 1, (M, D)), jnp.bfloat16)
            w1 = jax.device_put(jnp.asarray(
                rng.normal(0, 1.0 / np.sqrt(D), (D, INTER)),
                jnp.bfloat16))
            w2 = jax.device_put(jnp.asarray(
                rng.normal(0, 1.0 / np.sqrt(INTER), (INTER, D)),
                jnp.bfloat16))

            def body(i, x):
                return (x @ w1) @ w2

        @jax.jit
        def run(x):
            out = jax.lax.fori_loop(0, loop_iters, body, x)
            return out.astype(jnp.float32).sum()

        return time_loop(run, jax.device_put(x0),
                         2.0 * M * D * INTER * 2,
                         "mlp_pair", "int8" if int8 else "bf16",
                         [M, D, INTER])

    def probe_quantize():
        """round/clip/cast of the (B, S, D) activation — the int8-only
        per-layer overhead the SOL model ignores. Chained: the int8
        output feeds the next iteration's f32 input (a dequant-style
        cast, also real in the static model)."""
        x0 = jax.device_put(
            jnp.asarray(rng.normal(0, 1, (B, S, D)), jnp.float32))

        def body(i, x):
            q = jnp.clip(jnp.round(x / jnp.float32(0.05)),
                         -127, 127).astype(jnp.int8)
            return q.astype(jnp.float32) * jnp.float32(0.05)

        @jax.jit
        def run(x):
            out = jax.lax.fori_loop(0, loop_iters, body, x)
            return out.sum()

        float(run(x0))
        float(run(x0))
        times = []
        for _ in range(windows):
            t0 = time.perf_counter()
            float(run(x0))
            times.append((time.perf_counter() - t0) / loop_iters)
        med = sorted(times)[windows // 2]
        gb = (B * S * D * 10) / 1e9   # q: 4R+1W; dq: 1R+4W per iter
        print(json.dumps({
            "probe": "quantize_dequant_act", "dtype": "f32<->int8",
            "shape": [B, S, D], "us_per_iter": round(med * 1e6, 2),
            "gbps": round(gb / med, 1)}))
        sys.stdout.flush()
        return med

    t_proj8 = probe_proj(int8=True)
    t_projb = probe_proj(int8=False)
    print(json.dumps({"probe": "proj",
                      "int8_vs_bf16": round(t_projb / t_proj8, 3)}))
    t_mlp8 = probe_mlp_pair(int8=True)
    t_mlpb = probe_mlp_pair(int8=False)
    print(json.dumps({"probe": "mlp_pair",
                      "int8_vs_bf16": round(t_mlpb / t_mlp8, 3)}))
    probe_quantize()

    # Per-image MXU floor from the measured rates: 24 layers x (4 proj
    # + the MLP pair), per image = /B. The real attention core
    # (2 x S^2 x d score/value dots + softmax, bf16 in BOTH routes) is
    # NOT included — add its measured kernel time on top when reading
    # this as a model floor.
    for tag, tp, tm in (("int8", t_proj8, t_mlp8),
                        ("bf16", t_projb, t_mlpb)):
        per_layer = 4 * tp + tm
        per_img_ms = 24 * per_layer / B * 1e3
        print(json.dumps({
            "probe": f"mxu_floor_{tag}",
            "projection_dots_ms_per_img": round(per_img_ms, 4),
            "img_per_sec_if_dots_only": round(1e3 / per_img_ms, 1)}))


if __name__ == "__main__":
    main()
