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
  * int8_block_xla   — the block kernel's full composition (identity
    LN + QKV + attention + int8 out-proj + residual) in XLA: the
    parity reference for the block kernel.
  * int8_block       — `fused_block_attention_int8`, ONE program per
    batch element with all weights VMEM-resident.

Parity: int8_fused vs int8_sep_flash and int8_block vs int8_block_xla
are the SAME math (shared scales, int32 accumulation) — tolerance
covers only bf16 attention rounding + quantization ulp flips. The
recorded max_err keys are the hardware parity evidence
`hw_decide_r4.py` requires before flipping the quant route.
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
    # Shape overrides exist so the CPU suite can run this script's
    # parity logic end-to-end at a tiny shape in interpret mode
    # (tests/test_hw_decide.py) — the HW session uses the defaults.
    H = int(os.environ.get("BENCH_HEADS", "16"))
    S = int(os.environ.get("BENCH_SEQ", "577"))
    DH = int(os.environ.get("BENCH_HEAD_DIM", "64"))
    D = H * DH
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

    AO_SCALE = jnp.float32(0.02)  # out-projection act scale (synthetic)

    def int8_block(x, packs, act_scale):
        # Whole attention half incl. out-projection + residual: LN is
        # IDENTITY-parameterized here (scale 1, bias 0) and a 4th
        # weight pack reuses pack 0, so the comparison isolates the
        # kernel design, not extra math. Parity vs `int8_block_xla`
        # below (same composition in XLA) — the hardware evidence
        # hw_decide_r4.py requires before flipping the quant route
        # onto 'flash_fused_block'.
        from pigeon_tpu.kernels.flash_attention import (
            fused_block_attention_int8,
        )

        d = x.shape[-1]
        ls = jnp.ones((d,), jnp.float32)
        lb = jnp.zeros((d,), jnp.float32)
        flat = [a for p in packs for a in p]
        return fused_block_attention_int8(
            x, ls, lb, act_scale, *flat, AO_SCALE, *packs[0],
            H, 1e-5)

    def int8_block_xla(x, packs, act_scale):
        """The block kernel's exact composition in XLA: identity LN +
        shared-scale quantize + int8 QKV + bf16 attention + quantize at
        AO_SCALE + int8 out-proj (pack 0) + residual. Matches
        `_block_attn_int8_kernel` within in-kernel softmax/round ulp
        flips (one dequantized LSB each; docs/PERF.md bound)."""
        d = x.shape[-1]
        ls = jnp.ones((d,), jnp.float32)
        lb = jnp.zeros((d,), jnp.float32)
        xn = fa._layer_norm_f32(x, ls, lb, 1e-5).astype(x.dtype)
        x_q = jnp.clip(jnp.round(xn.astype(jnp.float32) / act_scale),
                       -127, 127).astype(jnp.int8)

        def proj(w_q, s_w, bias):
            y = jax.lax.dot_general(
                x_q, w_q, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (act_scale * s_w) + bias
            return jnp.swapaxes(
                y.astype(x.dtype).reshape(B, S, H, DH),
                1, 2).reshape(B * H, S, DH)

        attn = fa._xla_attention_bshd(*(proj(*p) for p in packs))
        attn = jnp.swapaxes(
            attn.reshape(B, H, S, DH), 1, 2).reshape(B, S, H * DH)
        oq = jnp.clip(jnp.round(attn.astype(jnp.float32) / AO_SCALE),
                      -127, 127).astype(jnp.int8)
        wo_q, s_o, bo = packs[0]
        po = jax.lax.dot_general(
            oq, wo_q, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out = (x.astype(jnp.float32) + bo
               + po.astype(jnp.float32) * (AO_SCALE * s_o))
        return out.astype(x.dtype)

    variants = {"int8_sep_flash": int8_sep_flash,
                "int8_fused": int8_fused,
                "bf16_fused": bf16_fused,
                "int8_block_xla": int8_block_xla,
                "int8_block": int8_block}

    scalarize = jax.jit(lambda a: a.astype(jnp.float32).sum())
    # Parity reference per variant: (reference variant, record key).
    # References are ALWAYS the XLA-path rows — if a reference fails,
    # the dependent variant becomes timing-only (never silently
    # re-based), because hw_decide_r4.py treats a record WITH its
    # max_err key as "the parity assert held on real hardware".
    parity_plan = {
        "int8_fused": ("int8_sep_flash", "max_err_vs_int8_sep"),
        "int8_block": ("int8_block_xla", "max_err_vs_xla"),
    }
    ref_outs = {}
    for name, fn in variants.items():
        jitted = jax.jit(fn)
        try:
            out = jitted(x, packs, act_scale)
            float(scalarize(out))
            err = err_key = None
            if name in ("int8_sep_flash", "int8_block_xla"):
                ref_outs[name] = np.asarray(out[:4], np.float32)
            elif name in parity_plan:  # bf16_fused: cross-dtype, no claim
                ref_name, err_key = parity_plan[name]
                if ref_name not in ref_outs:
                    print(f"# {name}: reference {ref_name} missing — "
                          "timing only, NO parity claim",
                          file=sys.stderr)
                    err_key = None
                else:
                    err = float(np.abs(np.asarray(out[:4], np.float32)
                                       - ref_outs[ref_name]).max())
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
        if err is not None and err_key is not None:
            rec[err_key] = round(err, 5)
        print(json.dumps(rec))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
