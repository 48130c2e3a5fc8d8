"""Backward attention kernel tuning bench (VERDICT r3 #4).

Times variants of the fused Pallas attention BACKWARD at the flagship
shape (bs32 ViT-L/14-336: BH=512, S=577, Dh=64, bf16) with the chained
dispatch protocol (docs/PERF.md): N async dispatches, one scalar
readback per window, median of windows.

Variants:
  base      — current library kernel (`kernels/flash_attention.py`,
              BWD_PACK=2): 4 dots + S²-wide dp*u rowsum for r.
  r_from_o  — r = rowsum(g ⊙ o_rec) with o_rec = (u @ v)/den recomputed
              by one extra MXU dot: exact same math (r_row = g·o_row),
              drops the S²-wide dp*u multiply+rowsum VPU pass. Trades
              VPU (the measured bound) for MXU (<=50% busy by shape).
  split4    — dq-kernel and dk/dv-kernel as SEPARATE pallas_calls, each
              at pack=4 (VERDICT candidate): restores wider packing but
              recomputes the S² softmax chain twice.
  pack{1,2,4} — pack sweep of the winning kernel body.

Each variant is verified against jax.vjp of the einsum reference before
timing (max |Δ| printed; bf16-scale tolerance).
"""

from __future__ import annotations

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pigeon_tpu.core.compile_cache import enable_persistent_cache
    from pigeon_tpu.kernels import flash_attention as fa

    enable_persistent_cache()

    B = int(os.environ.get("BENCH_BATCH", "32"))
    H, S, DH = 16, 577, 64
    BH = B * H
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    windows = int(os.environ.get("BENCH_WINDOWS", "5"))
    scale = DH ** -0.5

    # ---------------- kernel bodies ----------------

    def bwd_r_from_o(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                     *, pack: int):
        for i in range(pack):
            q, k, v = q_ref[i], k_ref[i], v_ref[i]
            g = g_ref[i].astype(jnp.float32)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * np.float32(scale)
            m = jnp.max(logits, axis=1, keepdims=True)
            u = jnp.exp(logits - m)
            den = jnp.sum(u, axis=1, keepdims=True)

            u_lo = u.astype(v.dtype)
            g_n = (g / den).astype(v.dtype)
            dv_ref[i] = jax.lax.dot_general(
                u_lo, g_n, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dv_ref.dtype)

            # o_rec = (u @ v) / den; r_row = g . o_row  (== rowsum(dp*p))
            o_rec = jax.lax.dot_general(
                u_lo, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) / den
            r = jnp.sum(g * o_rec, axis=1, keepdims=True)       # (S, 1)

            dp = jax.lax.dot_general(
                g.astype(v.dtype), v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dl = (u * (dp - r) * (np.float32(scale) / den)).astype(q.dtype)
            dq_ref[i] = jax.lax.dot_general(
                dl, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dq_ref.dtype)
            dk_ref[i] = jax.lax.dot_general(
                dl, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dk_ref.dtype)

    def make_bwd(body, pack):
        spec = pl.BlockSpec((pack, S, DH), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
        shape = jax.ShapeDtypeStruct((BH, S, DH), jnp.bfloat16)

        def run(q, k, v, g):
            return pl.pallas_call(
                functools.partial(body, pack=pack),
                out_shape=(shape, shape, shape),
                grid=(BH // pack,),
                in_specs=[spec] * 4,
                out_specs=(spec,) * 3,
            )(q, k, v, g)
        return run

    # split4: dq kernel and dk/dv kernel, each pack=4
    def dq_body(q_ref, k_ref, v_ref, g_ref, dq_ref, *, pack: int):
        for i in range(pack):
            q, k, v = q_ref[i], k_ref[i], v_ref[i]
            g = g_ref[i].astype(jnp.float32)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * np.float32(scale)
            m = jnp.max(logits, axis=1, keepdims=True)
            u = jnp.exp(logits - m)
            den = jnp.sum(u, axis=1, keepdims=True)
            dp = jax.lax.dot_general(
                g.astype(v.dtype), v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            r = jnp.sum(dp * u, axis=1, keepdims=True) / den
            dl = (u * (dp - r) * (np.float32(scale) / den)).astype(q.dtype)
            dq_ref[i] = jax.lax.dot_general(
                dl, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dq_ref.dtype)

    def dkv_body(q_ref, k_ref, v_ref, g_ref, dk_ref, dv_ref, *, pack: int):
        for i in range(pack):
            q, k, v = q_ref[i], k_ref[i], v_ref[i]
            g = g_ref[i].astype(jnp.float32)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * np.float32(scale)
            m = jnp.max(logits, axis=1, keepdims=True)
            u = jnp.exp(logits - m)
            den = jnp.sum(u, axis=1, keepdims=True)
            u_lo = u.astype(v.dtype)
            g_n = (g / den).astype(v.dtype)
            dv_ref[i] = jax.lax.dot_general(
                u_lo, g_n, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dv_ref.dtype)
            dp = jax.lax.dot_general(
                g.astype(v.dtype), v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            r = jnp.sum(dp * u, axis=1, keepdims=True) / den
            dl = (u * (dp - r) * (np.float32(scale) / den)).astype(q.dtype)
            dk_ref[i] = jax.lax.dot_general(
                dl, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dk_ref.dtype)

    def make_split(pack):
        spec = pl.BlockSpec((pack, S, DH), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
        shape = jax.ShapeDtypeStruct((BH, S, DH), jnp.bfloat16)

        def run(q, k, v, g):
            dq = pl.pallas_call(
                functools.partial(dq_body, pack=pack),
                out_shape=shape, grid=(BH // pack,),
                in_specs=[spec] * 4, out_specs=spec)(q, k, v, g)
            dk, dv = pl.pallas_call(
                functools.partial(dkv_body, pack=pack),
                out_shape=(shape, shape), grid=(BH // pack,),
                in_specs=[spec] * 4, out_specs=(spec, spec))(q, k, v, g)
            return dq, dk, dv
        return run

    # Diagnostics: MXU floor (dots only, softmax chain replaced by a
    # cast) and VPU floor (softmax chain only, output dots removed).
    def dots_only(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                  *, pack: int):
        for i in range(pack):
            q, k, v = q_ref[i], k_ref[i], v_ref[i]
            g = g_ref[i]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            u_lo = logits.astype(v.dtype)
            dv_ref[i] = jax.lax.dot_general(
                u_lo, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dv_ref.dtype)
            dp = jax.lax.dot_general(
                g, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dl = (logits * dp).astype(q.dtype)
            dq_ref[i] = jax.lax.dot_general(
                dl, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dq_ref.dtype)
            dk_ref[i] = jax.lax.dot_general(
                dl, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dk_ref.dtype)

    def vpu_only(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                 *, pack: int):
        for i in range(pack):
            q, k, v = q_ref[i], k_ref[i], v_ref[i]
            g = g_ref[i].astype(jnp.float32)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * np.float32(scale)
            m = jnp.max(logits, axis=1, keepdims=True)
            u = jnp.exp(logits - m)
            den = jnp.sum(u, axis=1, keepdims=True)
            dp = logits  # stand-in, no second dot
            r = jnp.sum(dp * u, axis=1, keepdims=True) / den
            dl = u * (dp - r) * (np.float32(scale) / den)
            dq_ref[i] = (q + dl[:, :64].astype(q.dtype)).astype(
                dq_ref.dtype)
            dk_ref[i] = k.astype(dk_ref.dtype)
            dv_ref[i] = (g / den).astype(dv_ref.dtype)

    variants = {
        "base_pack2": lambda q, k, v, g: fa._flash_backward(q, k, v, g),
        "base_pack4": make_bwd(
            lambda *a, pack: fa._attn_bwd_kernel(*a, scale=scale,
                                                 pack=pack), 4),
        "r_from_o_pack2": make_bwd(bwd_r_from_o, 2),
        "r_from_o_pack4": make_bwd(bwd_r_from_o, 4),
        "r_from_o_pack1": make_bwd(bwd_r_from_o, 1),
        "split4": make_split(4),
        "diag_dots_only_p2": make_bwd(dots_only, 2),
        "diag_vpu_only_p2": make_bwd(vpu_only, 2),
    }

    key = jax.random.PRNGKey(0)
    qv, kv, vv, gv = (jax.random.normal(jax.random.fold_in(key, i),
                                        (BH, S, DH), jnp.bfloat16)
                      for i in range(4))

    # Reference grads for correctness (small slice to keep compile fast).
    ref_fn = jax.jit(lambda q, k, v, g: jax.vjp(
        fa._xla_attention_bshd, q, k, v)[1](g))
    sl = slice(0, 8)
    ref = ref_fn(qv[sl], kv[sl], vv[sl], gv[sl])

    scalarize = jax.jit(
        lambda a, b, c: (a.astype(jnp.float32).sum()
                         + b.astype(jnp.float32).sum()
                         + c.astype(jnp.float32).sum()))

    results = {}
    for name, fn in variants.items():
        jitted = jax.jit(fn)
        try:
            out = jitted(qv, kv, vv, gv)
            if name.startswith("diag"):
                err = -1.0  # diagnostics are intentionally wrong math
            else:
                err = max(float(jnp.abs(o[sl].astype(jnp.float32)
                                        - r.astype(jnp.float32)).max())
                          for o, r in zip(out, ref))
            float(scalarize(*out))
        except Exception as e:  # noqa: BLE001 — report compile failures
            print(f"# {name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  file=sys.stderr)
            continue

        def window(n):
            carry = None
            t0 = time.perf_counter()
            for _ in range(n):
                o = jitted(qv, kv, vv, gv)
                carry = scalarize(*o)
            float(carry)
            return time.perf_counter() - t0

        window(2)
        rates = sorted(window(iters) / iters for _ in range(windows))
        ms = rates[len(rates) // 2] * 1000
        results[name] = ms
        print(json.dumps({"variant": name,
                          "ms_per_call": round(ms, 3),
                          "ms_per_layer_est": round(ms, 3),
                          "max_err_vs_xla": round(err, 5)}))
        sys.stdout.flush()

    if results:
        best = min(results, key=results.get)
        print(f"# best: {best} {results[best]:.3f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
