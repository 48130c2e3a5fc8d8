"""Forward attention kernel floor diagnostics (r3).

The round-2 SOL argument says the forward kernel (2.49 ms/layer at bs32)
is bound by the serial sum of its two dots (~0.9 ms floor) and its f32
softmax VPU passes (~1.5 ms). The backward diagnostics overturned that
theory for the backward kernel (deleting the softmax chain saved
nothing), so this script applies the same surgery to the FORWARD: time
the real kernel against (a) dots-only (softmax replaced by a cast) and
(b) softmax-only (PV dot removed), at the flagship shape.

Chained-dispatch protocol, median of windows; diagnostics are
intentionally wrong math and skip the parity check.
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

    def dots_only(q_ref, k_ref, v_ref, o_ref, *, pack: int):
        for i in range(pack):
            q, k, v = q_ref[i], k_ref[i], v_ref[i]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            o = jax.lax.dot_general(
                logits.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[i] = o.astype(o_ref.dtype)

    def softmax_only(q_ref, k_ref, v_ref, o_ref, *, pack: int):
        for i in range(pack):
            q, k, v = q_ref[i], k_ref[i], v_ref[i]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * np.float32(scale)
            m = jnp.max(logits, axis=1, keepdims=True)
            p = jnp.exp(logits - m)
            denom = jnp.sum(p, axis=1, keepdims=True)
            o_ref[i] = ((p[:, :DH] / denom) + v).astype(o_ref.dtype)

    def qk_only(q_ref, k_ref, v_ref, o_ref, *, pack: int):
        for i in range(pack):
            q, k, v = q_ref[i], k_ref[i], v_ref[i]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[i] = (logits[:, :DH].astype(v.dtype) + v).astype(
                o_ref.dtype)

    def make(body, pack):
        spec = pl.BlockSpec((pack, S, DH), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

        def run(q, k, v):
            return pl.pallas_call(
                functools.partial(body, pack=pack),
                out_shape=jax.ShapeDtypeStruct((BH, S, DH), jnp.bfloat16),
                grid=(BH // pack,),
                in_specs=[spec] * 3,
                out_specs=spec,
            )(q, k, v)
        return run

    def qk_chunked(q_ref, k_ref, v_ref, o_ref, *, pack: int,
                   chunk: int = 128):
        """Same QK FLOPs, but only (S, chunk) logits live at a time —
        isolates whether the (S, S) f32 materialization is the cost."""
        for i in range(pack):
            q, k, v = q_ref[i], k_ref[i], v_ref[i]
            acc = jnp.zeros((q.shape[0], 1), jnp.float32)
            for c0 in range(0, S, chunk):
                c1 = min(c0 + chunk, S)
                lc = jax.lax.dot_general(
                    q, k[c0:c1], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = acc + jnp.sum(lc, axis=1, keepdims=True)
            o_ref[i] = (acc[:, :1] + v[:, :1] * 0 + v).astype(o_ref.dtype)

    def online_softmax(q_ref, k_ref, v_ref, o_ref, *, pack: int,
                       chunk: int = 128):
        """EXACT attention via online softmax: the (S, S) block is never
        materialized — per K-chunk running max/denominator with
        correction factors, PV accumulated in f32. PV contraction dim is
        the chunk (128) — full MXU width, unlike the monolithic PV."""
        for i in range(pack):
            q, k, v = q_ref[i], k_ref[i], v_ref[i]
            n = q.shape[0]
            m = jnp.full((n, 1), -jnp.inf, jnp.float32)
            den = jnp.zeros((n, 1), jnp.float32)
            acc = jnp.zeros((n, DH), jnp.float32)
            for c0 in range(0, S, chunk):
                c1 = min(c0 + chunk, S)
                lc = jax.lax.dot_general(
                    q, k[c0:c1], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * np.float32(scale)
                m_new = jnp.maximum(m, jnp.max(lc, axis=1, keepdims=True))
                p = jnp.exp(lc - m_new)
                corr = jnp.exp(m - m_new)
                den = den * corr + jnp.sum(p, axis=1, keepdims=True)
                acc = acc * corr + jax.lax.dot_general(
                    p.astype(v.dtype), v[c0:c1], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                m = m_new
            o_ref[i] = (acc / den).astype(o_ref.dtype)

    variants = {
        "base_fwd_pack4": lambda q, k, v: fa._flash_forward(q, k, v),
        "diag_dots_only_p4": make(dots_only, 4),
        "diag_softmax_only_p4": make(softmax_only, 4),
        "diag_qk_only_p4": make(qk_only, 4),
        "diag_qk_chunked_p4": make(qk_chunked, 4),
        "online_softmax_p4_c128": make(online_softmax, 4),
        "online_softmax_p8_c128": make(online_softmax, 8),
        "online_softmax_p4_c256": make(
            functools.partial(online_softmax, chunk=256), 4),
    }

    key = jax.random.PRNGKey(0)
    qv, kv, vv = (jax.random.normal(jax.random.fold_in(key, i),
                                    (BH, S, DH), jnp.bfloat16)
                  for i in range(3))
    scalarize = jax.jit(lambda a: a.astype(jnp.float32).sum())
    base_out = None

    for name, fn in variants.items():
        jitted = jax.jit(fn)
        try:
            out = jitted(qv, kv, vv)
            float(scalarize(out))
            err = None
            if name.startswith("base"):
                base_out = np.asarray(out[:8], np.float32)
            elif not name.startswith("diag") and base_out is not None:
                err = float(np.abs(np.asarray(out[:8], np.float32)
                                   - base_out).max())
                assert err < 3e-2, f"{name} parity {err}"
        except Exception as e:  # noqa: BLE001
            print(f"# {name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  file=sys.stderr)
            continue

        def window(n):
            carry = None
            t0 = time.perf_counter()
            for _ in range(n):
                carry = scalarize(jitted(qv, kv, vv))
            float(carry)
            return time.perf_counter() - t0

        window(2)
        rates = sorted(window(iters) / iters for _ in range(windows))
        rec = {"variant": name,
               "ms_per_call": round(rates[len(rates) // 2] * 1000, 3)}
        if err is not None:
            rec["max_err_vs_base"] = round(err, 5)
        print(json.dumps(rec))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
