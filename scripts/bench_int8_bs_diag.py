"""Locate the int8 bs48 throughput cliff (566 -> 408 img/s, r4).

The e2e int8 route loses 28% going bs32 -> bs48 while bf16 GAINS
(368 -> 375); r4 labeled it "VMEM spill" without a component-level
diagnosis. The Pallas int8 attention kernel's per-program VMEM is
batch-INDEPENDENT (grid=(groups, b)), so the cliff must live in one of
the XLA-side int8 ops. This script times every distinct component of
the quantized encoder layer at each batch in BENCH_SWEEP and reports
ms_per_img — the culprit is whichever row's ms_per_img jumps instead
of staying flat.

Rows (flagship per-layer shape S=577, D=1024, INTER=4096):
  * quantize_x      — round/clip/cast of (B, S, D) f32->int8
  * attn_int8_fused — `fused_qkv_mha_int8` incl. its XLA quantize step
  * outproj_int8    — QuantDense(static) 1024->1024 + residual
  * mlp_int8        — LN + QuantDense 4096 + quick-GELU + QuantDense
                      1024 + residual (the production static-quant MLP)
  * layer_int8      — the full composition of the above (one encoder
                      layer as the int8 static tower runs it)
  * layer_bf16      — the bf16 flash_fused layer twin (cross-reference:
                      bf16 does NOT cliff at bs48 e2e)

FINDING (r5 session, 2026-08-19): every per-layer component IMPROVES
per-image at bs48 (layer_int8 0.192 -> 0.152 ms/img; attn 0.140 ->
0.111) — the cliff is NOT in the encoder layer. BENCH_TOWER=1 adds
full-model rows (the real `CLIPVisionTower` int8 static / bf16 twins +
head, exactly bench.py's program) to localize it in the composition
(scan-stacked weights, patch embed, head, or XLA scheduling).

RESOLVED (r7 session, 2026-08-20): the BENCH_TOWER=1 rows show the
full int8 model is monotone BETTER per-image through bs32/40/48
(1.803 / 1.769 / 1.739 ms/img; tower-only tracks it, bf16 twin same
shape), and a clean rebuild of bench.py itself at bs48 measured 586.2
img/s — not 408. The r4 "VMEM spill" was ONE pathological server-side
compilation, not a shape property; the int8 default moved to bs48.
Full story: docs/PERF.md "r7: the int8 bs48 cliff".

Chained-dispatch protocol, median of BENCH_WINDOWS windows
(docs/PERF.md). Inputs generated on device (host->device ~6 MB/s).

Env knobs: BENCH_SWEEP ("32,48"), BENCH_ITERS (8), BENCH_WINDOWS (5),
BENCH_TOWER (0; 1 = full-model rows INSTEAD of the per-layer rows),
BENCH_LAYERS (24; tower depth for bisecting the scan).
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

    S = int(os.environ.get("BENCH_SEQ", "577"))
    D = int(os.environ.get("BENCH_DIM", "1024"))
    INTER = 4 * D
    H = int(os.environ.get("BENCH_HEADS", "16"))
    sweep = [int(b) for b in
             os.environ.get("BENCH_SWEEP", "32,48").split(",")]
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    windows = int(os.environ.get("BENCH_WINDOWS", "5"))

    rng = np.random.default_rng(7)

    def dev(a, dt=jnp.float32):
        return jax.device_put(jnp.asarray(a, dt))

    # Weights (batch-independent, staged once).
    wq, sq = quantize_channelwise(rng.normal(0, .02, (D, D)).astype("f"))
    wk, sk = quantize_channelwise(rng.normal(0, .02, (D, D)).astype("f"))
    wv, sv = quantize_channelwise(rng.normal(0, .02, (D, D)).astype("f"))
    wo, so = quantize_channelwise(rng.normal(0, .02, (D, D)).astype("f"))
    w1, s1 = quantize_channelwise(
        rng.normal(0, .02, (D, INTER)).astype("f"))
    w2, s2 = quantize_channelwise(
        rng.normal(0, .02, (INTER, D)).astype("f"))
    wq, sq, wk, sk, wv, sv, wo, so, w1, s1, w2, s2 = (
        dev(t, t.dtype) for t in
        (wq, sq, wk, sk, wv, sv, wo, so, w1, s1, w2, s2))
    bq, bk, bv, bo, b2 = (dev(np.zeros((D,), "f")) for _ in range(5))
    b1 = dev(np.zeros((INTER,), "f"))
    ls, lb = dev(np.ones((D,), "f")), dev(np.zeros((D,), "f"))
    # bf16 twins for the reference layer
    wq_f, wk_f, wv_f, wo_f = (dev(rng.normal(0, .02, (D, D)), jnp.bfloat16)
                              for _ in range(4))
    w1_f = dev(rng.normal(0, .02, (D, INTER)), jnp.bfloat16)
    w2_f = dev(rng.normal(0, .02, (INTER, D)), jnp.bfloat16)
    bq_f = bk_f = bv_f = bo_f = dev(np.zeros((D,)), jnp.bfloat16)
    b1_f = dev(np.zeros((INTER,)), jnp.bfloat16)
    b2_f = dev(np.zeros((D,)), jnp.bfloat16)
    a_in, a_o, a_1, a_2 = (jnp.float32(v) for v in (.05, .04, .05, .02))

    def ln(x, scale, bias):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.maximum(0., jnp.mean(xf * xf, -1, keepdims=True)
                          - mu * mu)
        return (((xf - mu) * jax.lax.rsqrt(var + 1e-5)) * scale
                + bias).astype(x.dtype)

    def qdense(y, a, w_qq, s_w, bias):
        y_q = jnp.clip(jnp.round(y.astype(jnp.float32) / a),
                       -127, 127).astype(jnp.int8)
        o = jax.lax.dot_general(
            y_q, w_qq, (((y_q.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (o.astype(jnp.float32) * (a * s_w) + bias)

    def quantize_x(x):
        return jnp.clip(jnp.round(x.astype(jnp.float32) / a_in),
                        -127, 127).astype(jnp.int8)

    def attn_int8(x):
        return fa.fused_qkv_mha_int8(
            ln(x, ls, lb), a_in, wq, sq, bq, wk, sk, bk, wv, sv, bv, H)

    def outproj_int8(x):
        return x + qdense(x, a_o, wo, so, bo).astype(x.dtype)

    def mlp_int8(x):
        h = qdense(ln(x, ls, lb), a_1, w1, s1, b1).astype(x.dtype)
        h = (h * jax.nn.sigmoid(1.702 * h)).astype(x.dtype)
        return x + qdense(h, a_2, w2, s2, b2).astype(x.dtype)

    def layer_int8(x):
        a = fa.fused_qkv_mha_int8(
            ln(x, ls, lb), a_in, wq, sq, bq, wk, sk, bk, wv, sv, bv, H)
        x = x + qdense(a, a_o, wo, so, bo).astype(x.dtype)
        return mlp_int8(x)

    def layer_bf16(x):
        a = fa.fused_qkv_mha(ln(x, ls, lb), wq_f, wk_f, wv_f,
                             bq_f, bk_f, bv_f, H)
        x = x + (a @ wo_f + bo_f)
        h = ln(x, ls, lb) @ w1_f + b1_f
        h = (h * jax.nn.sigmoid(1.702 * h)).astype(x.dtype)
        return x + (h @ w2_f + b2_f)

    variants = [("quantize_x", quantize_x, ()),
                ("attn_int8_fused", attn_int8, ()),
                ("outproj_int8", outproj_int8, ()),
                ("mlp_int8", mlp_int8, ()),
                ("layer_int8", layer_int8, ()),
                ("layer_bf16", layer_bf16, ())]

    if os.environ.get("BENCH_TOWER", "0") == "1":
        # Full-model rows: the REAL tower/head program bench.py times,
        # plus a tower-only row and a patch-embed+head-only row to
        # bisect where the bs48 int8 cliff lives.
        import dataclasses

        from pigeon_tpu.config import HeadConfig, vit_l14_336_vision
        from pigeon_tpu.models.clip import CLIPVisionTower
        from pigeon_tpu.models.embedder import token_mean_embedding
        from pigeon_tpu.models.geocell_head import GeocellHead
        from pigeon_tpu.models.quant import quantize_and_calibrate

        vision_cfg = dataclasses.replace(
            vit_l14_336_vision(),
            num_layers=int(os.environ.get("BENCH_LAYERS", "24")),
            image_size=int(os.environ.get("BENCH_IMG", "336")))
        head_cfg = HeadConfig(num_cells=2203, embed_dim=1024,
                              panorama=False, multi_task=True)
        size = vision_cfg.image_size
        tower_params = jax.jit(CLIPVisionTower(vision_cfg).init)(
            jax.random.PRNGKey(0), jnp.zeros((2, size, size, 3))
        )["params"]
        head_params = jax.jit(GeocellHead(head_cfg).init)(
            jax.random.PRNGKey(1), jnp.zeros((2, 1024)))["params"]
        dyn = CLIPVisionTower(vision_cfg, dtype=jnp.bfloat16,
                              attn_impl="flash_fused", quant=True)
        calib_px = jax.random.normal(jax.random.PRNGKey(7),
                                     (8, size, size, 3), jnp.float32)
        qtower = quantize_and_calibrate(dyn, tower_params, calib_px)
        t_int8 = CLIPVisionTower(vision_cfg, dtype=jnp.bfloat16,
                                 attn_impl="flash_fused", quant="static")
        t_bf16 = CLIPVisionTower(vision_cfg, dtype=jnp.bfloat16,
                                 attn_impl="flash_fused")
        head = GeocellHead(head_cfg, dtype=jnp.bfloat16)

        # Tower params are ~hundreds of MB: they MUST be jit ARGUMENTS
        # (closed-over arrays become HLO constants and the remote
        # compile service stalls ~37 min then fails; CLAUDE.md rule 1).
        # The per-layer variants above get away with closures because
        # their weights total ~30 MB.
        def whole_int8(qt, hp, px):
            h, _ = t_int8.apply({"params": qt}, px)
            emb = token_mean_embedding(h)
            return head.apply({"params": hp}, emb).logits

        def whole_bf16(tp, hp, px):
            h, _ = t_bf16.apply({"params": tp}, px)
            emb = token_mean_embedding(h)
            return head.apply({"params": hp}, emb).logits

        def tower_only_int8(qt, px):
            h, _ = t_int8.apply({"params": qt}, px)
            return h

        def embed_head_only(hp, px):
            # patch embed + pre-LN + head, zero encoder layers: shares
            # the non-layer program parts without the scan.
            emb = jnp.mean(
                px.reshape(px.shape[0], -1, 3)[:, :577 * 2:2, :]
                @ jnp.ones((3, 1024), jnp.bfloat16), axis=1)
            return head.apply({"params": hp}, emb).logits

        variants = [("whole_int8", whole_int8, (qtower, head_params)),
                    ("tower_only_int8", tower_only_int8, (qtower,)),
                    ("whole_bf16", whole_bf16,
                     (tower_params, head_params)),
                    ("embed_head_only", embed_head_only, (head_params,))]

    tower_mode = os.environ.get("BENCH_TOWER", "0") == "1"
    scalarize = jax.jit(lambda a: a.astype(jnp.float32).sum())
    for B in sweep:
        if tower_mode:
            sz = int(os.environ.get("BENCH_IMG", "336"))
            x = jax.jit(lambda key: jax.random.normal(
                key, (B, sz, sz, 3), jnp.float32))(jax.random.PRNGKey(0))
        else:
            x = jax.jit(lambda key: jax.random.normal(
                key, (B, S, D), jnp.bfloat16))(jax.random.PRNGKey(0))
        for name, fn, extra in variants:
            jfn = jax.jit(fn)
            jitted = lambda px, _j=jfn, _e=extra: _j(*_e, px)
            try:
                float(scalarize(jitted(x)))
            except Exception as e:  # noqa: BLE001
                print(f"# bs{B} {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", file=sys.stderr)
                continue

            def window(n):
                carry = None
                t0 = time.perf_counter()
                for _ in range(n):
                    carry = scalarize(jitted(x))
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
