"""r7 int8 fused MLP kernel: hardware parity gate + component A/B.

Validates `kernels/fused_mlp.fused_mlp_int8` (the LN-free rebuild —
LN2 + input quantize stay in XLA; only GELU + requantize move
in-kernel) against the XLA QuantDense static composition at the
flagship per-layer shape, ON REAL MOSAIC (CLAUDE.md rule 4: interpret
mode cannot catch int8/transcendental lowering divergence — the r4
`fused_ln_mlp_int8` failed exactly this gate at 0.051).

Acceptance (the r4 int8 cross-backend methodology, docs/PERF.md):
max |err| <= a few dequantized output LSBs AND flip fraction small.
Prints parity + ms/call for kernel vs XLA path (chained protocol).

Env knobs: BENCH_BATCH (48), BENCH_ITERS (8), BENCH_WINDOWS (5).
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
    from pigeon_tpu.kernels.fused_mlp import fused_mlp_int8
    from pigeon_tpu.models.quant import quantize_channelwise

    enable_persistent_cache()

    B = int(os.environ.get("BENCH_BATCH", "48"))
    S, D, INTER = 577, 1024, 4096
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    windows = int(os.environ.get("BENCH_WINDOWS", "5"))

    rng = np.random.default_rng(3)
    x = jax.jit(lambda key: jax.random.normal(
        key, (B, S, D), jnp.bfloat16))(jax.random.PRNGKey(0))
    xn = jax.jit(lambda key: jax.random.normal(
        key, (B, S, D), jnp.bfloat16))(jax.random.PRNGKey(1))
    w1, s1 = quantize_channelwise(
        rng.normal(0, .02, (D, INTER)).astype("f"))
    w2, s2 = quantize_channelwise(
        rng.normal(0, .02, (INTER, D)).astype("f"))
    b1 = jnp.asarray(rng.normal(0, .02, (INTER,)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, .02, (D,)), jnp.float32)
    w1, w2 = jax.device_put(w1), jax.device_put(w2)
    s1, s2 = jax.device_put(s1), jax.device_put(s2)
    a1, a2 = jnp.float32(0.05), jnp.float32(0.04)

    def xla_ref(x, xn):
        """The product's QuantDense(static) fc1-gelu-fc2 + residual."""
        def qdense(y, a, wq, sw, bias):
            yq = jnp.clip(jnp.round(y.astype(jnp.float32) / a),
                          -127, 127).astype(jnp.int8)
            o = jax.lax.dot_general(
                yq, wq, (((y.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (o.astype(jnp.float32) * (a * sw)
                    + bias).astype(x.dtype)

        h = qdense(xn, a1, w1, s1, b1)
        g = h * jax.nn.sigmoid(1.702 * h)
        return x + qdense(g, a2, w2, s2, b2)

    def kernel(x, xn):
        return fused_mlp_int8(x, xn, a1, w1, s1, b1, a2, w2, s2, b2)

    jref = jax.jit(xla_ref)
    jker = jax.jit(kernel)
    scalarize = jax.jit(lambda a: a.astype(jnp.float32).sum())

    # ---- parity on real Mosaic ----
    want = np.asarray(jref(x, xn), np.float32)
    got = np.asarray(jker(x, xn), np.float32)
    err = np.abs(got - want)
    # subtract one bf16 output ulp; what remains is requantize flips.
    excess = err - 2.0 ** -8 * np.abs(want)
    quantum = float(a2) * float(np.max(np.asarray(s2)))  # 1 output LSB
    flips = float((excess > 0.25 * quantum).mean())
    print(json.dumps({
        "check": "parity", "max_err": round(float(err.max()), 6),
        "max_excess_vs_bf16ulp": round(float(excess.max()), 6),
        "output_lsb": round(quantum, 6),
        "flip_fraction": round(flips, 6),
        "ok": bool(excess.max() <= 4 * quantum and flips < 0.02),
    }))
    sys.stdout.flush()

    # ---- component A/B (chained protocol) ----
    for name, fn in (("mlp_int8_xla", jref), ("mlp_int8_kernel", jker)):
        try:
            float(scalarize(fn(x, xn)))
        except Exception as e:  # noqa: BLE001
            print(f"# {name} FAILED {type(e).__name__}: {str(e)[:300]}",
                  file=sys.stderr)
            continue

        def window(n, _f=fn):
            carry = None
            t0 = time.perf_counter()
            for _ in range(n):
                carry = scalarize(_f(x, xn))
            float(carry)
            return time.perf_counter() - t0

        window(2)
        med = sorted(window(iters) / iters
                     for _ in range(windows))[windows // 2]
        print(json.dumps({
            "variant": name, "batch": B,
            "ms_per_call": round(med * 1000, 3),
            "ms_per_img": round(med * 1000 / B, 4)}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
