"""Fused LN+MLP+residual kernel vs the XLA path — hardware A/B (r4).

Measures `kernels/fused_mlp.fused_ln_mlp` against the tower's current
XLA composition (nn.LayerNorm -> fc1 -> quick_gelu -> fc2 -> residual)
at the flagship per-layer shape (bs32, S=577, D=1024, inter=4096).
The fusion removes the LN output (75 MB) and fc1 output (302 MB)
HBM round-trips per layer; this script tells us whether that transfers
to wall-clock against XLA's own fusion/pipelining.

Chained-dispatch protocol, median of windows (docs/PERF.md). Also
parity-checks the kernel on real TPU (Mosaic lowering of the
sigmoid-based quick-GELU; CLAUDE.md rule 4).
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
    from pigeon_tpu.kernels.fused_mlp import fused_ln_mlp

    enable_persistent_cache()

    B = int(os.environ.get("BENCH_BATCH", "32"))
    S, D, INTER = 577, 1024, 4096
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    windows = int(os.environ.get("BENCH_WINDOWS", "5"))

    rng = np.random.default_rng(0)
    # x generated ON DEVICE (host->device ~6 MB/s through the tunnel).
    x = jax.jit(lambda key: jax.random.normal(
        key, (B, S, D), jnp.bfloat16))(jax.random.PRNGKey(0))
    ls = jax.device_put(jnp.ones((D,), jnp.float32))
    lb = jax.device_put(jnp.zeros((D,), jnp.float32))
    w1 = jax.device_put(jnp.asarray(
        rng.normal(0, 0.02, (D, INTER)).astype(np.float32), jnp.bfloat16))
    b1 = jax.device_put(jnp.asarray(
        rng.normal(0, 0.02, (INTER,)).astype(np.float32), jnp.bfloat16))
    w2 = jax.device_put(jnp.asarray(
        rng.normal(0, 0.02, (INTER, D)).astype(np.float32), jnp.bfloat16))
    b2 = jax.device_put(jnp.asarray(
        rng.normal(0, 0.02, (D,)).astype(np.float32), jnp.bfloat16))
    args = (x, ls, lb, w1, b1, w2, b2)

    def xla_path(x, ls, lb, w1, b1, w2, b2):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.maximum(0., jnp.mean(xf * xf, -1, keepdims=True)
                          - mu * mu)
        xn = (((xf - mu) * jax.lax.rsqrt(var + 1e-5)) * ls
              + lb).astype(x.dtype)
        h = xn @ w1 + b1
        h = (h * jax.nn.sigmoid(1.702 * h)).astype(x.dtype)
        return x + (h @ w2 + b2)

    def fused_path(x, ls, lb, w1, b1, w2, b2):
        return fused_ln_mlp(x, ls, lb, w1, b1, w2, b2, 1e-5)

    # Int8 timing row: the QuantDense(static) XLA composition — the
    # production static-quant MLP path. (Its fused twin
    # `fused_ln_mlp_int8` FAILED r4 hardware parity, 0.051 > the
    # one-LSB budget, and was deleted in r5.)
    from pigeon_tpu.models.quant import quantize_channelwise

    w1_q, s1 = quantize_channelwise(w1.astype(jnp.float32))
    w2_q, s2 = quantize_channelwise(w2.astype(jnp.float32))
    a1 = jnp.float32(0.05)
    a2 = jnp.float32(0.02)
    iargs = (x, ls, lb, a1, w1_q, s1, b1.astype(jnp.float32), a2,
             w2_q, s2, b2.astype(jnp.float32))

    def xla_int8(x, ls, lb, a1, w1_q, s1, b1, a2, w2_q, s2, b2):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.maximum(0., jnp.mean(xf * xf, -1, keepdims=True)
                          - mu * mu)
        xn = (((xf - mu) * jax.lax.rsqrt(var + 1e-5)) * ls
              + lb).astype(x.dtype)

        def qdense(y, a, w_q, s_w, bias):
            y_q = jnp.clip(jnp.round(y.astype(jnp.float32) / a),
                           -127, 127).astype(jnp.int8)
            o = jax.lax.dot_general(
                y_q, w_q, (((y_q.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (o.astype(jnp.float32) * (a * s_w)
                    + bias).astype(x.dtype)

        h = qdense(xn, a1, w1_q, s1, b1)
        h = (h * jax.nn.sigmoid(1.702 * h)).astype(x.dtype)
        return x + qdense(h, a2, w2_q, s2, b2).astype(jnp.float32) \
            .astype(x.dtype)

    variants = {"xla_ln_mlp": (xla_path, args),
                "fused_ln_mlp": (fused_path, args),
                "xla_int8_ln_mlp": (xla_int8, iargs)}

    scalarize = jax.jit(lambda a: a.astype(jnp.float32).sum())
    family_base = {}  # family -> the XLA reference's output ONLY — a
    # fused variant must never be silently promoted to baseline when
    # the XLA row fails (a max_err_vs_xla-free record is a timing row,
    # not a hardware parity claim).
    for name, (fn, vargs) in variants.items():
        family = "int8" if "int8" in name else "bf16"
        jitted = jax.jit(fn)
        try:
            out = jitted(*vargs)
            float(scalarize(out))
            err = None
            if name.startswith("xla_"):
                family_base[family] = np.asarray(out[:4], np.float32)
            elif family not in family_base:
                print(f"# {name}: baseline xla row missing — timing "
                      "only, NO parity claim", file=sys.stderr)
            else:
                err = float(np.abs(np.asarray(out[:4], np.float32)
                                   - family_base[family]).max())
                assert err < 5e-2, f"{name} parity {err}"
        except Exception as e:  # noqa: BLE001
            print(f"# {name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  file=sys.stderr)
            continue

        def window(n):
            carry = None
            t0 = time.perf_counter()
            for _ in range(n):
                carry = scalarize(jitted(*vargs))
            float(carry)
            return time.perf_counter() - t0

        window(2)
        rates = sorted(window(iters) / iters for _ in range(windows))
        rec = {"variant": name,
               "ms_per_call": round(rates[len(rates) // 2] * 1000, 3)}
        if err is not None:
            rec["max_err_vs_xla"] = round(err, 5)
        print(json.dumps(rec))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
