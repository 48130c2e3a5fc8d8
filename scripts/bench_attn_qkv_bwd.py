"""Fused QKV+attention BACKWARD A/B (VERDICT r3 -> r4 item 1).

The r4 training A/B proved the fused forward's custom_vjp backward
loses 5-8 img/s to the separate-projection 'flash' path: the backward
rematerializes q/k/v with XLA einsums (a 113 MB HBM write + read per
layer the fused forward had deleted), folds them, runs the flash
backward kernel, unfolds, then projects the gradients. This script
times the structural fix — `_fused_qkv_bwd_kernel`, the backward twin
of `fused_qkv_mha` (q/k/v recomputed IN-kernel from the resident x
block, dq/dk/dv emitted in natural layout, dx accumulated in an f32
VMEM scratch across the group sweep) — against the shipping paths at
the flagship shape (bs32 ViT-L/14-336: B=32, H=16, S=577, Dh=64, D=1024,
bf16).

Variants (each times ONE full vjp call: attention-half backward incl.
the dW/db projection-gradient dots; forward residuals precomputed):
  flash_sep_proj   — the train default today: XLA projections saved by
                     the vjp, flash backward kernel, unfold, dx/dW dots.
  fused_bwd_xla    — `fused_qkv_mha` custom_vjp, PIGEON_FUSED_BWD=xla
                     (the r4 loser: XLA-remat projections + kernel).
  fused_bwd_g{2,4,8} — PIGEON_FUSED_BWD=kernel at
                     PIGEON_FUSED_BWD_GROUPS 2/4/8 (VMEM trade: wider
                     groups = fewer x re-reads, more live scratch).

Every variant's grads are verified against jax.vjp of the einsum
composition before timing (bf16-scale tolerance); a variant that fails
compile (VMEM) is reported and skipped. Chained-dispatch protocol,
median of windows.
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

    enable_persistent_cache()

    B = int(os.environ.get("BENCH_BATCH", "32"))
    H, S, DH, D = 16, 577, 64, 1024
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    windows = int(os.environ.get("BENCH_WINDOWS", "5"))

    # On-device inputs (host->device ~6 MB/s through the tunnel).
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    x = jax.jit(lambda k: 0.3 * jax.random.normal(
        k, (B, S, D), jnp.bfloat16))(ks[0])
    g = jax.jit(lambda k: jax.random.normal(
        k, (B, S, D), jnp.bfloat16))(ks[1])
    rng = np.random.default_rng(1)
    ws = tuple(jax.device_put(jnp.asarray(
        rng.normal(0, 0.02, (D, D)).astype(np.float32), jnp.bfloat16))
        for _ in range(3))
    bs = tuple(jax.device_put(jnp.asarray(
        rng.normal(0, 0.02, (D,)).astype(np.float32), jnp.bfloat16))
        for _ in range(3))
    args = (x, *ws, *bs)

    def sep_proj(x, wq, wk, wv, bq, bk, bv):
        def proj(w, b):
            y = (jnp.einsum("bsd,de->bse", x, w) + b).astype(x.dtype)
            return jnp.swapaxes(
                y.reshape(B, S, H, DH), 1, 2).reshape(B * H, S, DH)

        out = fa._mha_bh(proj(wq, bq), proj(wk, bk), proj(wv, bv))
        return jnp.swapaxes(
            out.reshape(B, H, S, DH), 1, 2).reshape(B, S, H * DH)

    def fused(x, wq, wk, wv, bq, bk, bv):
        return fa.fused_qkv_mha(x, wq, wk, wv, bq, bk, bv, H)

    def xla_ref(x, wq, wk, wv, bq, bk, bv):
        def proj(w, b):
            return (jnp.einsum("bsd,de->bse", x, w) + b).reshape(
                B, S, H, DH)

        q, k, v = proj(wq, bq), proj(wk, bk), proj(wv, bv)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * DH ** -0.5
        p = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, S, H * DH)

    def make_bwd(fn):
        """jit(forward + one vjp call) — the full-remat cost shape the
        training step pays per layer (the rematerialized forward plus
        the backward; the custom_vjp residuals are just x + weights)."""
        def bwd(g_out, *a):
            _, vjp = jax.vjp(fn, *a)
            return vjp(g_out)
        return jax.jit(bwd)

    # Parity reference once (f32 view of every grad leaf).
    ref = make_bwd(xla_ref)(g, *args)
    ref_np = [np.asarray(t, np.float32) for t in ref]

    variants = [("flash_sep_proj", sep_proj, {}),
                ("fused_bwd_xla", fused, {"PIGEON_FUSED_BWD": "xla"})]
    # r5 HW session: g2/g4 FAIL server-side compile on VMEM at the
    # flagship shape; g8 = 8.16 ms vs 9.32 sep-proj. g16 probes the
    # narrower end (1 head/program: more x re-reads, less live VMEM).
    for groups in (2, 4, 8, 16):
        variants.append((f"fused_bwd_g{groups}", fused,
                         {"PIGEON_FUSED_BWD": "kernel",
                          "PIGEON_FUSED_BWD_GROUPS": str(groups)}))

    scalarize = jax.jit(
        lambda gs: sum(t.astype(jnp.float32).sum() for t in gs))

    for name, fn, env in variants:
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            bwd = make_bwd(fn)
            t0 = time.perf_counter()
            grads = bwd(g, *args)
            float(scalarize(grads))
            compile_s = time.perf_counter() - t0
            # Per-leaf RELATIVE bound: dW leaves accumulate over
            # B*S=18k terms, so absolute error scales with |dW|.
            err = max(float(np.abs(np.asarray(a, np.float32) - r).max()
                            / (1.0 + np.abs(r).max()))
                      for a, r in zip(grads, ref_np))
            assert err < 0.05, f"{name} grad parity {err}"

            def window(n):
                carry = None
                t0 = time.perf_counter()
                for _ in range(n):
                    carry = scalarize(bwd(g, *args))
                float(carry)
                return time.perf_counter() - t0

            window(2)
            rates = sorted(window(iters) / iters for _ in range(windows))
            print(json.dumps({
                "variant": name,
                "ms_per_call": round(rates[len(rates) // 2] * 1000, 3),
                "max_err_vs_xla": round(err, 5)}))
            print(f"# {name}: compile={compile_s:.1f}s "
                  f"windows={[round(r * 1000, 2) for r in rates]}",
                  file=sys.stderr)
            sys.stdout.flush()
        except Exception as e:  # noqa: BLE001 — VMEM compile fail etc.
            print(f"# {name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  file=sys.stderr)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v


if __name__ == "__main__":
    main()
