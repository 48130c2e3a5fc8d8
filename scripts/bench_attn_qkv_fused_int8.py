"""Int8 fused QKV projection + attention kernel: hardware validation.

Round-3 landed the bf16 QKV-projection+attention fusion (+18.6% e2e);
this measures its int8 twin (`kernels/flash_attention.fused_qkv_mha_int8`)
— the ROADMAP candidate that stacks the int8 MXU win (~1.8x projection
rate) on top of the fusion win (qkv never touch HBM, and the int8 x DMA
is HALF the bf16 kernel's).

CPU tests pin exact parity with QuantDense(static) + attention; this
script exists because Mosaic's int8 dot lowering on REAL TPU is exactly
what interpret mode cannot catch (CLAUDE.md rule 4). Variants:

  * int8_sep_flash   — the current int8 per-layer path: QuantDense
    static-act math in XLA (quant -> int8 dot -> dequant epilogue),
    fold -> `_flash_forward` -> unfold.
  * int8_fused       — `fused_qkv_mha_int8` (x quantized once at the
    shared per-tensor scale, int8 projection dots in-kernel).
  * bf16_fused       — `fused_qkv_mha` for cross-dtype reference.

Parity: int8_fused vs int8_sep_flash is the SAME math (shared scale,
int32 accumulation) — tolerance covers only bf16 attention rounding.
Chained-dispatch protocol, median of windows (docs/PERF.md).
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
    from pigeon_tpu.kernels import flash_attention as fa
    from pigeon_tpu.models.quant import quantize_channelwise

    enable_persistent_cache()

    B = int(os.environ.get("BENCH_BATCH", "32"))
    H, S, DH, D = 16, 577, 64, 1024
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    windows = int(os.environ.get("BENCH_WINDOWS", "5"))

    rng = np.random.default_rng(0)
    # x generated ON DEVICE (host->device is ~6 MB/s through the
    # tunnel; a (32, 577, 1024) f32 upload alone would take ~13 s).
    x = jax.jit(lambda key: jax.random.normal(
        key, (B, S, D), jnp.bfloat16))(jax.random.PRNGKey(0))
    x.block_until_ready()
    packs = []
    for _ in range(3):
        w = rng.normal(0, 0.02, (D, D)).astype(np.float32)
        w_q, s_w = quantize_channelwise(jnp.asarray(w))
        bias = jnp.asarray(rng.normal(0, 0.02, (D,)).astype(np.float32))
        packs.append((jax.device_put(w_q), jax.device_put(s_w),
                      jax.device_put(bias)))
    act_scale = jnp.float32(4.5 / 127.0)  # ~N(0,1) amax at this size

    def int8_sep_flash(x, packs, act_scale):
        """QuantDense(static) projections in XLA + flash attention."""
        xf = x.astype(jnp.float32)
        x_q = jnp.clip(jnp.round(xf / act_scale), -127, 127).astype(jnp.int8)

        def proj(w_q, s_w, bias):
            y = jax.lax.dot_general(
                x_q, w_q, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (act_scale * s_w) + bias
            return jnp.swapaxes(
                y.astype(jnp.bfloat16).reshape(B, S, H, DH),
                1, 2).reshape(B * H, S, DH)

        out = fa._flash_forward(*(proj(*p) for p in packs))
        return jnp.swapaxes(
            out.reshape(B, H, S, DH), 1, 2).reshape(B, S, H * DH)

    def int8_fused(x, packs, act_scale):
        args = [a for p in packs for a in p]
        return fa.fused_qkv_mha_int8(
            x, act_scale, args[0], args[1], args[2], args[3], args[4],
            args[5], args[6], args[7], args[8], H)

    def bf16_fused(x, packs, act_scale):
        deq = [(p[0].astype(jnp.float32) * p[1], p[2]) for p in packs]
        return fa.fused_qkv_mha(
            x, deq[0][0].astype(jnp.bfloat16),
            deq[1][0].astype(jnp.bfloat16),
            deq[2][0].astype(jnp.bfloat16), deq[0][1], deq[1][1],
            deq[2][1], H)

    def int8_block(x, packs, act_scale):
        # Whole attention half incl. out-projection + residual: LN is
        # IDENTITY-parameterized here (scale 1, bias 0) and a 4th
        # weight pack reuses pack 0, so the comparison isolates the
        # kernel design, not extra math. Output differs from the
        # sep/fused variants (adds LN + out-proj) — timing-only row.
        from pigeon_tpu.kernels.flash_attention import (
            fused_block_attention_int8,
        )

        d = x.shape[-1]
        ls = jnp.ones((d,), jnp.float32)
        lb = jnp.zeros((d,), jnp.float32)
        flat = [a for p in packs for a in p]
        return fused_block_attention_int8(
            x, ls, lb, act_scale, *flat, jnp.float32(0.02), *packs[0],
            H, 1e-5)

    variants = {"int8_sep_flash": int8_sep_flash,
                "int8_fused": int8_fused,
                "bf16_fused": bf16_fused,
                "int8_block": int8_block}

    scalarize = jax.jit(lambda a: a.astype(jnp.float32).sum())
    base_out = None  # ONLY ever int8_sep_flash's output (the XLA
    # QuantDense reference): if the baseline variant fails, downstream
    # parity simply cannot be claimed — a fused variant must never be
    # silently promoted to baseline, because hw_decide_r4.py treats an
    # int8_fused record WITH max_err_vs_int8_sep as "the Mosaic parity
    # assert held on real hardware".
    for name, fn in variants.items():
        jitted = jax.jit(fn)
        try:
            out = jitted(x, packs, act_scale)
            float(scalarize(out))
            err = None
            if name == "int8_sep_flash":
                base_out = np.asarray(out[:4], np.float32)
            # bf16 differs by quant error; int8_block adds LN +
            # out-proj + residual (timing-only row, parity in tests).
            elif name not in ("bf16_fused", "int8_block"):
                if base_out is None:
                    print(f"# {name}: baseline int8_sep_flash missing —"
                          " timing only, NO parity claim",
                          file=sys.stderr)
                else:
                    err = float(np.abs(np.asarray(out[:4], np.float32)
                                       - base_out).max())
                    assert err < 5e-2, f"{name} parity {err}"
        except Exception as e:  # noqa: BLE001
            print(f"# {name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  file=sys.stderr)
            continue

        def window(n):
            carry = None
            t0 = time.perf_counter()
            for _ in range(n):
                carry = scalarize(jitted(x, packs, act_scale))
            float(carry)
            return time.perf_counter() - t0

        window(2)
        rates = sorted(window(iters) / iters for _ in range(windows))
        rec = {"variant": name,
               "ms_per_call": round(rates[len(rates) // 2] * 1000, 3)}
        if err is not None:
            rec["max_err_vs_int8_sep"] = round(err, 5)
        print(json.dumps(rec))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
