"""QKV-projection + attention fusion experiment (r3).

docs/PERF.md names ONE remaining structural candidate for the forward:
"fusing attention with adjacent projections". This script measures it:
a Pallas kernel that reads x (B, S, D) and the packed QKV weights, does
the projection dot IN-KERNEL (full 1024-contraction width), then the
monolithic softmax attention per head — eliminating the (B, S, 3D) qkv
HBM round-trip and the fold/transpose copies between XLA projections
and the attention kernel.

The trade: the projection moves from XLA (N=3072 full-width, overlapped
with kernel DMA) into the serial Mosaic program, but qkv never touches
HBM. Grid is (groups, B) with the weight block's index constant in b so
it stays VMEM-resident per group sweep; x is re-read once per group.

Variants:
  * baseline_xla_proj_flash — the model's current per-layer path:
    XLA dense projections (+bias) -> fold -> `_flash_forward` -> unfold.
  * fused_g2 / fused_g4 — heads in 2 or 4 groups (VMEM trade).
Parity-checked against the baseline (same weights), chained-dispatch
protocol, median of windows.
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
    H, S, DH, D = 16, 577, 64, 1024
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    windows = int(os.environ.get("BENCH_WINDOWS", "5"))
    scale = DH ** -0.5

    def qkv_attn_kernel(x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
                        bv_ref, o_ref, *, hg: int):
        """One (group, batch) program: project hg heads' q/k/v from x
        (natural weight layout — no host-side packing), then monolithic
        single-pass attention per head."""
        x = x_ref[0]                                   # (S, D) bf16

        def proj(w_ref, b_ref):
            y = jax.lax.dot_general(
                x, w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return (y + b_ref[...].astype(jnp.float32)).astype(x.dtype)

        q_all = proj(wq_ref, bq_ref)                   # (S, hg*DH)
        k_all = proj(wk_ref, bk_ref)
        v_all = proj(wv_ref, bv_ref)
        for h in range(hg):
            sl = slice(h * DH, (h + 1) * DH)
            logits = jax.lax.dot_general(
                q_all[:, sl], k_all[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * np.float32(scale)
            m = jnp.max(logits, axis=1, keepdims=True)
            p = jnp.exp(logits - m)
            denom = jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v_all.dtype), v_all[:, sl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, :, h * DH:(h + 1) * DH] = (o / denom).astype(
                o_ref.dtype)

    def make_fused(groups: int):
        hg = H // groups
        gw = hg * DH  # weight-block columns per group

        def run(x, wq, wk, wv, bq, bk, bv):
            wspec = pl.BlockSpec((D, gw), lambda g, b: (0, g),
                                 memory_space=pltpu.VMEM)
            bspec = pl.BlockSpec((1, gw), lambda g, b: (0, g),
                                 memory_space=pltpu.VMEM)
            return pl.pallas_call(
                functools.partial(qkv_attn_kernel, hg=hg),
                out_shape=jax.ShapeDtypeStruct((B, S, H * DH),
                                               jnp.bfloat16),
                grid=(groups, B),
                in_specs=[
                    pl.BlockSpec((1, S, D), lambda g, b: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                    wspec, bspec, wspec, bspec, wspec, bspec,
                ],
                out_specs=pl.BlockSpec(
                    (1, S, hg * DH), lambda g, b: (b, 0, g),
                    memory_space=pltpu.VMEM),
            )(x, wq, bq[None, :], wk, bk[None, :], wv, bv[None, :])
        return run

    def baseline(x, wq, wk, wv, bq, bk, bv):
        def proj(w, b):
            y = (jnp.einsum("bsd,de->bse", x, w) + b).astype(jnp.bfloat16)
            return jnp.swapaxes(
                y.reshape(B, S, H, DH), 1, 2).reshape(B * H, S, DH)

        out = fa._flash_forward(proj(wq, bq), proj(wk, bk), proj(wv, bv))
        return jnp.swapaxes(
            out.reshape(B, H, S, DH), 1, 2).reshape(B, S, H * DH)

    rng = np.random.default_rng(0)
    # x generated ON DEVICE (host->device ~6 MB/s; a (32, 577, 1024)
    # f32 upload alone is ~13 s through the tunnel).
    x = jax.jit(lambda key: jax.random.normal(
        key, (B, S, D), jnp.bfloat16))(jax.random.PRNGKey(0))
    wq, wk, wv = (rng.normal(0, 0.02, (D, D)).astype(np.float32)
                  for _ in range(3))
    bq, bk, bv = (rng.normal(0, 0.02, (D,)).astype(np.float32)
                  for _ in range(3))
    base_args = tuple(jax.device_put(jnp.asarray(a, jnp.bfloat16))
                      for a in (wq, wk, wv, bq, bk, bv))

    variants = {"baseline_xla_proj_flash": (baseline, base_args)}
    for groups in (2, 4, 8):
        variants[f"fused_g{groups}"] = (make_fused(groups), base_args)

    # LN-fusion A/B (r4): separate XLA LayerNorm + fused kernel vs the
    # LN-folded kernel. Both take the RAW x, so the delta is exactly
    # the LN'd tensor's HBM round-trip (+ in-kernel VPU LN cost).
    ls = jax.device_put(jnp.ones((D,), jnp.float32))
    lb = jax.device_put(jnp.zeros((D,), jnp.float32))

    def ln_then_fused(x, wq, wk, wv, bq, bk, bv):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.maximum(0., jnp.mean(xf * xf, -1, keepdims=True)
                          - mu * mu)
        xn = (((xf - mu) * jax.lax.rsqrt(var + 1e-5)) * ls
              + lb).astype(x.dtype)
        return fa.fused_qkv_mha(xn, wq, wk, wv, bq, bk, bv, H)

    def ln_fused(x, wq, wk, wv, bq, bk, bv):
        return fa.fused_ln_qkv_mha(x, ls, lb, wq, wk, wv, bq, bk, bv,
                                   H, 1e-5)

    variants["ln_xla_then_fused"] = (ln_then_fused, base_args)
    variants["ln_fused_in_kernel"] = (ln_fused, base_args)

    scalarize = jax.jit(lambda a: a.astype(jnp.float32).sum())
    # Parity baselines are per family: the LN variants normalize x, so
    # they compare against each other, not the no-LN baseline.
    family_base = {}  # family -> the XLA-path reference's output ONLY
    # (never a fused variant silently promoted when the reference row
    # fails — an err-free record must stay a timing row, not a parity
    # claim).
    reference_names = {"plain": "baseline_xla_proj_flash",
                       "ln": "ln_xla_then_fused"}
    for name, (fn, args) in variants.items():
        family = "ln" if name.startswith("ln_") else "plain"
        jitted = jax.jit(fn)
        try:
            out = jitted(x, *args)
            float(scalarize(out))
            err = None
            if name == reference_names[family]:
                family_base[family] = np.asarray(out[:4], np.float32)
            elif family not in family_base:
                print(f"# {name}: reference "
                      f"{reference_names[family]} missing — timing "
                      "only, NO parity claim", file=sys.stderr)
            else:
                err = float(np.abs(np.asarray(out[:4], np.float32)
                                   - family_base[family]).max())
                assert err < 5e-2, f"{name} parity {err}"
        except Exception as e:  # noqa: BLE001
            print(f"# {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
            continue

        def window(n):
            carry = None
            t0 = time.perf_counter()
            for _ in range(n):
                carry = scalarize(jitted(x, *args))
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
