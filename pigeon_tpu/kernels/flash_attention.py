"""Pallas TPU fused attention for the ViT towers.

For ViT-L/14-336 the sequence is 577 tokens (+pad to 640): a whole (S, Dh)
K/V pair for one (batch, head) is ~160 KB — it FITS in VMEM. So instead of
a streaming flash-attention with online softmax (needed only when K does
not fit), the optimal kernel here is a single-pass fused attention: per
(batch*head, q-tile) grid step, compute logits -> f32 softmax -> weighted
sum entirely in VMEM, writing only the (S, Dh) output to HBM. This removes
the (B, H, S, S) probability tensor round-trip that the XLA path
materializes when fusion fails, at exactly the model's hot shape.

Backward: `mha` is a `jax.custom_vjp` — forward runs the Pallas kernel,
backward recomputes attention in a fused Pallas kernel
(rematerialization: no saved probabilities, standard flash-attention
memory trade). `fused_qkv_mha` additionally has a fused BACKWARD kernel
(`_fused_qkv_bwd_kernel`, the default since the r5 HW win; opt out with
PIGEON_FUSED_BWD=xla) that recomputes the projections in-kernel too —
see its docstring.

Non-causal, no attention mask (the vision tower's case; the text tower's
577-free causal path stays on XLA — see `models/clip.py`).
"""

from __future__ import annotations

import contextlib
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
#: One query tile per (batch, head): K/V DMA into VMEM exactly once and the
#: whole (S_pad, S_pad) logits block (~1.6 MB f32 at S=640) stays resident.
#: Tiling queries smaller re-DMAs K/V per tile and measured ~35% slower.
DEFAULT_BLOCK_Q = 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


#: (batch, head) pairs processed per grid program. Forward: 4 measured
#: best on v5e (2.49 vs 2.91 ms/layer-attention at the ViT-L shape);
#: 8 fails server-side compile (VMEM). Backward keeps 2 (4 dots + extra
#: (S, S) buffers per slice put pack=4 over VMEM).
FWD_PACK = 4
BWD_PACK = 2
DEFAULT_PACK = FWD_PACK  # backward-compat alias


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, pack: int):
    """`pack` (batch*head) slices: full (S, Dh) attention in VMEM each.

    The softmax denominator is applied to the (S, Dh) OUTPUT of the PV dot
    rather than to the (S, S) probability block — exactly the same math
    (1/denom is per-row, the dot is linear in rows), one less full pass
    over the S x S buffer. Measured 12% faster at the ViT-L shape; the
    kernel is VPU-bound (dots are K=64-limited to <=50% MXU; see
    docs/PERF.md SOL analysis), so removing S² VPU work is the lever.
    """
    for i in range(pack):
        q = q_ref[i]                           # (S, Dh)
        k = k_ref[i]
        v = v_ref[i]

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * np.float32(scale)

        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)                # unnormalized, f32
        denom = jnp.sum(p, axis=1, keepdims=True)

        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[i] = (o / denom).astype(o_ref.dtype)


#: Online-softmax forward variant: chunk size over K. The (S, S) block is
#: never materialized — per-chunk running max/denominator with correction
#: factors (exact math). The ~4x smaller VMEM footprint admits pack=8
#: (the monolithic kernel fails server-side compile at pack=8), which
#: measured AT the kernel's floor (r3 diagnostics, docs/PERF.md).
ONLINE_CHUNK = 128
ONLINE_PACK = 8


def _attn_kernel_online(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                        pack: int, chunk: int = ONLINE_CHUNK):
    """Exact attention with online softmax, per (batch*head) slice."""
    s = q_ref.shape[1]
    dh = q_ref.shape[2]
    for i in range(pack):
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i]
        m = jnp.full((s, 1), -jnp.inf, jnp.float32)
        den = jnp.zeros((s, 1), jnp.float32)
        acc = jnp.zeros((s, dh), jnp.float32)
        for c0 in range(0, s, chunk):
            c1 = min(c0 + chunk, s)
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


def _flash_forward(q, k, v, block_q: int = DEFAULT_BLOCK_Q):
    """q/k/v: (BH, S, Dh) -> (BH, S, Dh).

    No explicit padding: Mosaic handles non-128-aligned S internally,
    and explicit jnp.pad copies measured ~46 ms/iter on the ViT-L tower
    (the difference between losing to and matching XLA attention).

    Kernel body selection (``PIGEON_FLASH_FWD``): ``monolithic``
    (default; single-pass (S, S) softmax in VMEM) or ``online``
    (online-softmax chunks at pack=8 — measured at the kernel floor in
    standalone calls; kept opt-in until it beats monolithic
    END-TO-END, docs/PERF.md r3 diagnostics).
    """
    import os

    del block_q  # whole (S, Dh) tiles per (batch, head): K/V DMA'd once
    bh, s, dh = q.shape
    scale = dh ** -0.5

    if os.environ.get("PIGEON_FLASH_FWD", "monolithic") == "online":
        pack = next((p for p in (ONLINE_PACK, 4, 2, 1) if bh % p == 0), 1)
        body = functools.partial(_attn_kernel_online, scale=scale,
                                 pack=pack)
    else:
        pack = next((p for p in (FWD_PACK, 2, 1) if bh % p == 0), 1)
        body = functools.partial(_attn_kernel, scale=scale, pack=pack)

    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((bh, s, dh), q.dtype),
        grid=(bh // pack,),
        in_specs=[
            pl.BlockSpec((pack, s, dh), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pack, s, dh), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pack, s, dh), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((pack, s, dh), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )(q, k, v)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                     *, scale: float, pack: int):
    """Fused attention backward: recompute softmax in VMEM, emit dq/dk/dv.

    Standard gradients (per (batch, head) slice), with the softmax
    denominator folded into the (S, Dh)-shaped tensors instead of
    normalizing the (S, S) block (exact same math, one less S² pass —
    the forward's trick applied twice):
        u   = exp(q k^T * scale - rowmax)       # unnormalized
        den = rowsum(u)
        dv  = u^T (g / den)                      # == p^T g
        dp  = g v^T
        dl  = (u / den) * (dp - rowsum(dp * u) / den) * scale
            = u * (dp - r) * (scale / den)       # r broadcast per row
        dq  = dl k ;  dk = dl^T q
    """
    for i in range(pack):
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i]
        g = g_ref[i].astype(jnp.float32)

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * np.float32(scale)
        m = jnp.max(logits, axis=1, keepdims=True)
        u = jnp.exp(logits - m)                             # (S, S) f32
        den = jnp.sum(u, axis=1, keepdims=True)             # (S, 1)

        u_lo = u.astype(v.dtype)
        g_n = (g / den).astype(v.dtype)                     # (S, Dh)
        dv_ref[i] = jax.lax.dot_general(
            u_lo, g_n, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)

        dp = jax.lax.dot_general(
            g.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (S, S)
        r = jnp.sum(dp * u, axis=1, keepdims=True) / den    # (S, 1)
        dl = (u * (dp - r) * (np.float32(scale) / den)).astype(q.dtype)

        dq_ref[i] = jax.lax.dot_general(
            dl, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[i] = jax.lax.dot_general(
            dl, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _flash_backward(q, k, v, g):
    """q/k/v/g: (BH, S, Dh) -> (dq, dk, dv)."""
    bh, s, dh = q.shape
    scale = dh ** -0.5
    pack = next((p for p in (BWD_PACK, 1) if bh % p == 0), 1)
    spec = pl.BlockSpec((pack, s, dh), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((bh, s, dh), q.dtype)
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, pack=pack),
        out_shape=(shape, shape, shape),
        grid=(bh // pack,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
    )(q, k, v, g)


#: Head groups for the fused QKV+attention kernel: one grid program
#: projects H/groups heads' q/k/v from x (full 1024-wide contraction)
#: and runs attention on them; the weight blocks' index is constant in
#: the batch dim so they stay VMEM-resident per group sweep. 4 measured
#: best at the ViT-L shape (g2 fails server-side compile on VMEM).
#: Override with PIGEON_FUSED_GROUPS; the static default degrades via
#: `_pick_groups` when the lane constraint demands it (TP local heads).
FUSED_GROUPS = 4

#: Head groups for the fused QKV BACKWARD kernel. The backward carries
#: more live VMEM than the forward (dx f32 accumulator + two (S, S)
#: f32 buffers per head + three gradient output blocks), so it needs
#: NARROWER head groups than the forward's 4: at the flagship shape
#: (H=16, S=577, D=1024) the r5 HW session measured g8 = 8.16 ms/call
#: (vs 9.32 separate-projection, 9.95 XLA-remat backward) while g4 and
#: g2 both FAIL server-side compile on VMEM. 8 groups = 2 heads/program
#: = the compiling sweet spot; retune via PIGEON_FUSED_BWD_GROUPS
#: without a code change.
BWD_FUSED_GROUPS = 8


def _pick_groups(pref: int, fallbacks, num_heads: int, dh: int,
                 p=None, honor_pref: bool = False) -> int:
    """Head-group count for the fused kernels, respecting the Mosaic
    lane constraint: a block's last dim must be 128-divisible OR equal
    the full array dim (the r5 HW session hit this live — g16 at the
    flagship shape makes the weight block (D, 64) and fails lowering).
    The constraint matters beyond tuning: under tensor parallelism the
    kernel sees LOCAL heads (16/tp), so a statically 'good' group count
    can shrink the block width below one lane tile — e.g. the bwd
    default g8 at tp=2 (8 local heads) would emit (D, 64) blocks.
    Interpret mode (CPU tests) doesn't enforce this, so pick correctly
    here rather than discovering it on a pod.

    ``honor_pref``: an EXPLICIT operator preference (env var set) is
    honored on divisibility alone — interpret-mode validation runs and
    future hardware may want widths this check would veto."""
    p = p if p is not None else num_heads * dh
    if honor_pref and pref and num_heads % pref == 0:
        return pref
    for g in (pref, *fallbacks):
        if g and num_heads % g == 0:
            gw = (num_heads // g) * dh
            if gw % LANE == 0 or gw == p:
                return g
    return 1    # gw == p: always a legal single-block width


def _heads_attention(q_all, k_all, v_all, *, hg: int, dh: int,
                     scale: float, out_dtype):
    """Single-pass softmax attention per head over concatenated
    (S, hg*dh) q/k/v blocks (same math as `_attn_kernel`). Returns the
    per-head (S, dh) outputs — the single source of this numerically
    pinned body; callers write the slices into their own refs."""
    outs = []
    for h in range(hg):
        sl = slice(h * dh, (h + 1) * dh)
        logits = jax.lax.dot_general(
            q_all[:, sl], k_all[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * np.float32(scale)
        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_all.dtype), v_all[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        outs.append(((o / denom)).astype(out_dtype))
    return outs


def _fused_heads_attention(q_all, k_all, v_all, o_ref, *, hg: int,
                           dh: int, scale: float):
    """`_heads_attention` written into a (1, S, hg*dh) output block."""
    outs = _heads_attention(q_all, k_all, v_all, hg=hg, dh=dh,
                            scale=scale, out_dtype=o_ref.dtype)
    for h, o in enumerate(outs):
        o_ref[0, :, h * dh:(h + 1) * dh] = o


def _fused_qkv_kernel(x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
                      bv_ref, o_ref, *, hg: int, dh: int, scale: float):
    """One (group, batch) program: project hg heads' q/k/v in-kernel,
    then single-pass softmax attention per head (same math as
    `_attn_kernel`). q/k/v never round-trip through HBM — the structural
    fusion docs/PERF.md names as the forward's remaining lever."""
    x = x_ref[0]                                       # (S, D)

    def proj(w_ref, b_ref):
        y = jax.lax.dot_general(
            x, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y + b_ref[...].astype(jnp.float32)).astype(x.dtype)

    q_all = proj(wq_ref, bq_ref)                       # (S, hg*dh)
    k_all = proj(wk_ref, bk_ref)
    v_all = proj(wv_ref, bv_ref)
    _fused_heads_attention(q_all, k_all, v_all, o_ref, hg=hg, dh=dh,
                           scale=scale)


def _fused_qkv_forward(x, wq, wk, wv, bq, bk, bv, num_heads: int,
                       head_dim=None):
    """x: (B, S, D); w*: (D, P); b*: (P,) -> (B, S, P) attention output
    (heads concatenated in natural order, pre-output-projection).

    ``head_dim`` defaults to ``D // num_heads`` (P == D, the
    single-chip case). Under tensor parallelism the projection width P
    is a HEAD-dim shard of D (Megatron column split), so the caller
    passes ``num_heads`` = local heads and the TRUE ``head_dim`` —
    everything in the kernel derives from (num_heads, head_dim)."""
    b, s, d = x.shape
    dh = head_dim if head_dim is not None else d // num_heads
    p = num_heads * dh
    if wq.shape != (d, p):
        raise ValueError(
            f"fused_qkv_mha: weight shape {wq.shape} != (D={d}, "
            f"num_heads*head_dim={p}) — mis-sharded operands?")
    groups = _pick_groups(
        int(os.environ.get("PIGEON_FUSED_GROUPS", FUSED_GROUPS)),
        (2, 1), num_heads, dh,
        honor_pref="PIGEON_FUSED_GROUPS" in os.environ)
    hg = num_heads // groups
    gw = hg * dh

    wspec = pl.BlockSpec((d, gw), lambda g, bb: (0, g),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, gw), lambda g, bb: (0, g),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fused_qkv_kernel, hg=hg, dh=dh,
                          scale=dh ** -0.5),
        out_shape=jax.ShapeDtypeStruct((b, s, num_heads * dh), x.dtype),
        grid=(groups, b),
        in_specs=[
            pl.BlockSpec((1, s, d), lambda g, bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec, bspec, wspec, bspec, wspec, bspec,
        ],
        out_specs=pl.BlockSpec((1, s, gw), lambda g, bb: (bb, 0, g),
                               memory_space=pltpu.VMEM),
    )(x, wq, bq[None, :], wk, bk[None, :], wv, bv[None, :])


def _fused_qkv_bwd_kernel(x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
                          bv_ref, g_ref, dx_ref, dq_ref, dk_ref, dv_ref,
                          acc_ref, *, hg: int, dh: int, scale: float,
                          groups: int):
    """Fused QKV+attention BACKWARD: one (batch, group) program
    recomputes this group's q/k/v projections from the VMEM-resident x
    (the forward's in-kernel dots — q/k/v never existed in HBM, and the
    backward never materializes them either), runs the attention
    backward per head (`_attn_bwd_kernel` math, denominator deferred to
    the (S, Dh)-shaped tensors), writes the projection cotangents
    dq/dk/dv in natural head-concat layout (no fold/unfold relayouts),
    and accumulates the dx partials ``d* @ W*^T`` into an f32 VMEM
    scratch across the group sweep (group is the INNER grid dim; dx
    flushes once per batch element at the last group).

    The weight gradients are left to XLA (``x^T @ d*_all`` — one
    full-width K=B*S MXU dot each from the emitted cotangents); forming
    them in-kernel needs (D, gw) f32 accumulators that put the program
    over the ~16 MB VMEM budget next to the two (S, S) f32 buffers."""
    g_idx = pl.program_id(1)
    x = x_ref[0]                                       # (S, D) resident

    def proj(w_ref, b_ref):
        y = jax.lax.dot_general(
            x, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y + b_ref[...].astype(jnp.float32)).astype(x.dtype)

    q_all = proj(wq_ref, bq_ref)                       # (S, gw)
    k_all = proj(wk_ref, bk_ref)
    v_all = proj(wv_ref, bv_ref)
    g_all = g_ref[0]

    for h in range(hg):
        sl = slice(h * dh, (h + 1) * dh)
        q = q_all[:, sl]
        k = k_all[:, sl]
        v = v_all[:, sl]
        gh = g_all[:, sl].astype(jnp.float32)

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * np.float32(scale)
        m = jnp.max(logits, axis=1, keepdims=True)
        u = jnp.exp(logits - m)                        # (S, S) f32
        den = jnp.sum(u, axis=1, keepdims=True)

        g_n = (gh / den).astype(v.dtype)               # (S, Dh)
        dv_ref[0, :, sl] = jax.lax.dot_general(
            u.astype(v.dtype), g_n, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)

        dp = jax.lax.dot_general(
            gh.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (S, S)
        r = jnp.sum(dp * u, axis=1, keepdims=True) / den
        dl = (u * (dp - r) * (np.float32(scale) / den)).astype(x.dtype)

        dq_ref[0, :, sl] = jax.lax.dot_general(
            dl, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = jax.lax.dot_general(
            dl, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)

    # dx partials: (S, gw) @ (D, gw)^T with the contraction over this
    # group's projection columns — read back from the just-written
    # cotangent output blocks (still VMEM-resident), full-width dots.
    @pl.when(g_idx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for d_ref, w_ref in ((dq_ref, wq_ref), (dk_ref, wk_ref),
                         (dv_ref, wv_ref)):
        acc_ref[...] += jax.lax.dot_general(
            d_ref[0], w_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(g_idx == groups - 1)
    def _():
        dx_ref[0] = acc_ref[...].astype(dx_ref.dtype)


def _fused_qkv_backward(x, wq, wk, wv, bq, bk, bv, g, num_heads: int,
                        head_dim=None):
    """Pallas fused backward: (B, S, D) x + weights + (B, S, P) g ->
    (dx, dq_all, dk_all, dv_all). The weight/bias grads are formed by
    the caller from the returned cotangents (single XLA dots)."""
    import os

    b, s, d = x.shape
    dh = head_dim if head_dim is not None else d // num_heads
    p = num_heads * dh
    groups_pref = int(os.environ.get("PIGEON_FUSED_BWD_GROUPS",
                                     BWD_FUSED_GROUPS))
    groups = _pick_groups(
        groups_pref, (8, 4, 2, 1), num_heads, dh, p,
        honor_pref="PIGEON_FUSED_BWD_GROUPS" in os.environ)
    hg = num_heads // groups
    gw = hg * dh

    xspec = pl.BlockSpec((1, s, d), lambda bb, gr: (bb, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((d, gw), lambda bb, gr: (0, gr),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, gw), lambda bb, gr: (0, gr),
                         memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((1, s, gw), lambda bb, gr: (bb, 0, gr),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fused_qkv_bwd_kernel, hg=hg, dh=dh,
                          scale=dh ** -0.5, groups=groups),
        out_shape=(jax.ShapeDtypeStruct((b, s, d), x.dtype),
                   jax.ShapeDtypeStruct((b, s, p), x.dtype),
                   jax.ShapeDtypeStruct((b, s, p), x.dtype),
                   jax.ShapeDtypeStruct((b, s, p), x.dtype)),
        grid=(b, groups),
        in_specs=[xspec, wspec, bspec, wspec, bspec, wspec, bspec,
                  gspec],
        out_specs=(xspec, gspec, gspec, gspec),
        scratch_shapes=[pltpu.VMEM((s, d), jnp.float32)],
    )(x, wq, bq[None, :], wk, bk[None, :], wv, bv[None, :], g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_qkv_mha(x, wq, wk, wv, bq, bk, bv, num_heads, head_dim=None):
    """Fused QKV projection + attention: (B, S, D) -> (B, S, D).

    Forward runs the Pallas fusion; the backward is selected by
    ``PIGEON_FUSED_BWD`` (read at trace time):

    * ``kernel`` (default since r5): the fused backward Pallas kernel
      (`_fused_qkv_bwd_kernel`) — q/k/v recomputed IN-kernel from the
      resident x block, dq/dk/dv emitted in natural layout, dx
      accumulated in VMEM; no q/k/v HBM round-trip and no fold/unfold
      relayouts in the backward either. r5 HW: 8.16 ms/call vs 9.32
      (sep-proj) / 9.95 (xla route) at the flagship shape, Mosaic grad
      parity 0.006 — and it carried e2e (train 87.6 vs 81.7 img/s).
    * ``xla``: rematerialize q/k/v with XLA einsums and reuse the fused
      attention backward kernel, then project the gradients.

    Both produce exactly the same math as the Dense-projections +
    `mha` path (parity-tested); the default follows hardware
    evidence (docs/PERF.md).

    ``head_dim``: see `_fused_qkv_forward` — pass it (with
    ``num_heads`` = LOCAL heads) when the weights are a head-dim shard
    of the full projection (tensor parallelism)."""
    return _fused_qkv_forward(x, wq, wk, wv, bq, bk, bv, num_heads,
                              head_dim)


def _fused_qkv_fwd(x, wq, wk, wv, bq, bk, bv, num_heads, head_dim=None):
    out = _fused_qkv_forward(x, wq, wk, wv, bq, bk, bv, num_heads,
                             head_dim)
    return out, (x, wq, wk, wv, bq, bk, bv)


def _fused_qkv_bwd(num_heads, head_dim, res, g):
    import os

    x, wq, wk, wv, bq, bk, bv = res
    b, s, d = x.shape
    dh = head_dim if head_dim is not None else d // num_heads
    p = num_heads * dh                                 # projection width

    if os.environ.get("PIGEON_FUSED_BWD", "kernel") == "kernel":
        dx, dq_u, dk_u, dv_u = _fused_qkv_backward(
            x, wq, wk, wv, bq, bk, bv, g.astype(x.dtype), num_heads, dh)
    else:
        def fold(t):                                   # (B,S,P)->(BH,S,Dh)
            return jnp.swapaxes(t.reshape(b, s, num_heads, dh), 1, 2) \
                .reshape(b * num_heads, s, dh)

        def unfold(t):                                 # (BH,S,Dh)->(B,S,P)
            return jnp.swapaxes(t.reshape(b, num_heads, s, dh), 1, 2) \
                .reshape(b, s, p)

        q = fold((x @ wq + bq).astype(x.dtype))
        k = fold((x @ wk + bk).astype(x.dtype))
        v = fold((x @ wv + bv).astype(x.dtype))
        dq, dk, dv = _flash_backward(q, k, v, fold(g.astype(x.dtype)))
        dq_u, dk_u, dv_u = unfold(dq), unfold(dk), unfold(dv)
        dx = dq_u @ wq.T + dk_u @ wk.T + dv_u @ wv.T

    flat_x = x.reshape(b * s, d)

    def wgrad(dt):
        return jax.lax.dot_general(
            flat_x, dt.reshape(b * s, p), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(wq.dtype)

    return (dx.astype(x.dtype), wgrad(dq_u), wgrad(dk_u), wgrad(dv_u),
            dq_u.sum((0, 1)).astype(bq.dtype),
            dk_u.sum((0, 1)).astype(bk.dtype),
            dv_u.sum((0, 1)).astype(bv.dtype))


fused_qkv_mha.defvjp(_fused_qkv_fwd, _fused_qkv_bwd)


def _layer_norm_f32(x, scale, bias, eps: float):
    """Flax-parity LayerNorm math in f32 (fast-variance form):
    promote to f32, mean/var over the last axis with
    ``var = max(0, E[x^2] - E[x]^2)``, normalize, affine — matching
    `nn.LayerNorm(use_fast_variance=True)` so the fused path is
    bit-compatible with the separate-LN tower at f32."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    # Flax folds scale into the rsqrt factor BEFORE multiplying the
    # centered input; match that association order bit-for-bit — the
    # int8 fused MLP quantizes this output, and a one-ulp difference
    # flips round() at quantization boundaries.
    mul = jax.lax.rsqrt(var + np.float32(eps)) * scale.astype(jnp.float32)
    return (xf - mu) * mul + bias.astype(jnp.float32)


def _fused_ln_qkv_kernel(x_ref, ls_ref, lb_ref, wq_ref, bq_ref, wk_ref,
                         bk_ref, wv_ref, bv_ref, o_ref, *, hg: int,
                         dh: int, scale: float, eps: float):
    """`_fused_qkv_kernel` with the pre-attention LayerNorm folded in:
    x arrives RAW (pre-LN), the LN runs in f32 on the VPU against the
    VMEM-resident block, and the normalized tensor never exists in HBM.
    LN is recomputed once per group program (hg-way redundancy) — a few
    µs of VPU work against a (B, S, D) HBM round-trip per layer."""
    xn = _layer_norm_f32(x_ref[0], ls_ref[...], lb_ref[...],
                         eps).astype(o_ref.dtype)      # (S, D)

    def proj(w_ref, b_ref):
        y = jax.lax.dot_general(
            xn, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y + b_ref[...].astype(jnp.float32)).astype(xn.dtype)

    q_all = proj(wq_ref, bq_ref)                       # (S, hg*dh)
    k_all = proj(wk_ref, bk_ref)
    v_all = proj(wv_ref, bv_ref)
    _fused_heads_attention(q_all, k_all, v_all, o_ref, hg=hg, dh=dh,
                           scale=scale)


def _fused_ln_qkv_forward(x, ln_scale, ln_bias, wq, wk, wv, bq, bk, bv,
                          num_heads: int, eps: float):
    """Pallas LN+QKV+attention fusion: (B, S, D) raw -> (B, S, D)."""
    b, s, d = x.shape
    dh = d // num_heads
    groups = _pick_groups(
        int(os.environ.get("PIGEON_FUSED_GROUPS", FUSED_GROUPS)),
        (2, 1), num_heads, dh,
        honor_pref="PIGEON_FUSED_GROUPS" in os.environ)
    hg = num_heads // groups
    gw = hg * dh

    wspec = pl.BlockSpec((d, gw), lambda g, bb: (0, g),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, gw), lambda g, bb: (0, g),
                         memory_space=pltpu.VMEM)
    lnspec = pl.BlockSpec((1, d), lambda g, bb: (0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fused_ln_qkv_kernel, hg=hg, dh=dh,
                          scale=dh ** -0.5, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
        grid=(groups, b),
        in_specs=[
            pl.BlockSpec((1, s, d), lambda g, bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            lnspec, lnspec,
            wspec, bspec, wspec, bspec, wspec, bspec,
        ],
        out_specs=pl.BlockSpec((1, s, gw), lambda g, bb: (bb, 0, g),
                               memory_space=pltpu.VMEM),
    )(x, ln_scale.astype(jnp.float32)[None, :],
      ln_bias.astype(jnp.float32)[None, :],
      wq, bq[None, :], wk, bk[None, :], wv, bv[None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_ln_qkv_mha(x, ln_scale, ln_bias, wq, wk, wv, bq, bk, bv,
                     num_heads, eps=1e-5):
    """LayerNorm + QKV projection + attention in ONE Pallas kernel.

    Same contract as `fused_qkv_mha` but takes the RAW (pre-LN) block
    input plus the LN affine params: the normalized (B, S, D) tensor is
    computed in-kernel and never round-trips HBM (one full read+write
    of the activation per layer saved vs a separate XLA LayerNorm).

    Backward rematerializes the LN in XLA (chain-ruled via `jax.vjp`)
    and reuses `_fused_qkv_bwd`."""
    return _fused_ln_qkv_forward(x, ln_scale, ln_bias, wq, wk, wv,
                                 bq, bk, bv, num_heads, eps)


def _fused_ln_qkv_fwd(x, ln_scale, ln_bias, wq, wk, wv, bq, bk, bv,
                      num_heads, eps):
    out = _fused_ln_qkv_forward(x, ln_scale, ln_bias, wq, wk, wv, bq,
                                bk, bv, num_heads, eps)
    return out, (x, ln_scale, ln_bias, wq, wk, wv, bq, bk, bv)


def _fused_ln_qkv_bwd(num_heads, eps, res, g):
    x, ln_scale, ln_bias, wq, wk, wv, bq, bk, bv = res

    def ln(x, s, b):
        return _layer_norm_f32(x, s, b, eps).astype(x.dtype)

    xn, ln_vjp = jax.vjp(ln, x, ln_scale, ln_bias)
    grads = _fused_qkv_bwd(num_heads, None, (xn, wq, wk, wv, bq, bk, bv),
                           g)
    dx, dls, dlb = ln_vjp(grads[0])
    return (dx, dls.astype(ln_scale.dtype),
            dlb.astype(ln_bias.dtype)) + grads[1:]


fused_ln_qkv_mha.defvjp(_fused_ln_qkv_fwd, _fused_ln_qkv_bwd)


def _block_attn_kernel(x_ref, ls_ref, lb_ref, wq_ref, bq_ref, wk_ref,
                       bk_ref, wv_ref, bv_ref, wo_ref, bo_ref, o_ref,
                       xn_ref, oall_ref, acc_ref, *, hg: int, dh: int,
                       scale: float, eps: float, groups: int):
    """The WHOLE attention half of a transformer block in one program:
    LN1 + QKV projections + softmax attention + output projection +
    residual. Grid is (batch, group) with the GROUP dim innermost so
    the per-group output-projection partials accumulate into an f32
    VMEM scratch across consecutive steps; x stays resident per batch
    element (it is both the LN input and the residual), the weight
    blocks stream. LN(x), q/k/v, the attention output, and the
    pre-residual projection never exist in HBM."""
    g_idx = pl.program_id(1)

    @pl.when(g_idx == 0)
    def _():
        xn_ref[...] = _layer_norm_f32(
            x_ref[0], ls_ref[...], lb_ref[...], eps).astype(xn_ref.dtype)

    xn = xn_ref[...]

    def proj(w_ref, b_ref):
        y = jax.lax.dot_general(
            xn, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y + b_ref[...].astype(jnp.float32)).astype(xn.dtype)

    q_all = proj(wq_ref, bq_ref)                       # (S, hg*dh)
    k_all = proj(wk_ref, bk_ref)
    v_all = proj(wv_ref, bv_ref)
    for h, o in enumerate(_heads_attention(
            q_all, k_all, v_all, hg=hg, dh=dh, scale=scale,
            out_dtype=oall_ref.dtype)):
        oall_ref[:, h * dh:(h + 1) * dh] = o

    # One (S, gw) @ (gw, D) out-projection dot per group (K=gw keeps
    # the MXU fed vs per-head K=64 slices).
    partial = jax.lax.dot_general(
        oall_ref[...], wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(g_idx == 0)
    def _():
        acc_ref[...] = (x_ref[0].astype(jnp.float32) + bo_ref[...]
                        + partial)

    @pl.when(g_idx > 0)
    def _():
        acc_ref[...] += partial

    @pl.when(g_idx == groups - 1)
    def _():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _fused_block_attn_forward(x, ln_scale, ln_bias, wq, wk, wv, bq, bk,
                              bv, wo, bo, num_heads: int, eps: float):
    b, s, d = x.shape
    dh = d // num_heads
    groups = _pick_groups(
        int(os.environ.get("PIGEON_FUSED_GROUPS", FUSED_GROUPS)),
        (2, 1), num_heads, dh,
        honor_pref="PIGEON_FUSED_GROUPS" in os.environ)
    hg = num_heads // groups
    gw = hg * dh

    wspec = pl.BlockSpec((d, gw), lambda bb, g: (0, g),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, gw), lambda bb, g: (0, g),
                         memory_space=pltpu.VMEM)
    const = pl.BlockSpec((1, d), lambda bb, g: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_block_attn_kernel, hg=hg, dh=dh,
                          scale=dh ** -0.5, eps=eps, groups=groups),
        out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
        grid=(b, groups),
        in_specs=[
            pl.BlockSpec((1, s, d), lambda bb, g: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            const, const,
            wspec, bspec, wspec, bspec, wspec, bspec,
            pl.BlockSpec((gw, d), lambda bb, g: (g, 0),
                         memory_space=pltpu.VMEM),
            const,
        ],
        out_specs=pl.BlockSpec((1, s, d), lambda bb, g: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((s, d), x.dtype),       # LN(x), computed at g==0
            pltpu.VMEM((s, gw), x.dtype),      # group attention output
            pltpu.VMEM((s, d), jnp.float32),   # out-proj accumulator
        ],
    )(x, ln_scale.astype(jnp.float32)[None, :],
      ln_bias.astype(jnp.float32)[None, :],
      wq, bq[None, :], wk, bk[None, :], wv, bv[None, :],
      wo, bo.astype(jnp.float32)[None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def fused_block_attention(x, ln_scale, ln_bias, wq, wk, wv, bq, bk, bv,
                          wo, bo, num_heads, eps=1e-5):
    """LN1 + QKV + attention + out-projection + residual in ONE Pallas
    kernel: ``(B, S, D) -> (B, S, D)`` computing
    ``x + out_proj(attn(LN(x)))``. Combined with
    `kernels/fused_mlp.fused_ln_mlp` the whole transformer layer runs
    as two Pallas programs and no ACTIVATION tensor round-trips HBM —
    but the (batch, group) grid re-streams the four weight blocks on
    every step (~2 MB x groups x B ≈ 256 MB/layer at bs32, vs 8 MB
    read-once for the separate-op layer), trading resident weights for
    resident x. The stream is double-buffered and sits well under the
    attention-half compute time (~312 µs vs ~1.4 ms at bs32), so
    whether the activation savings beat the added weight traffic is an
    OVERLAP question only the e2e measurement answers (the int8 twin
    `fused_block_attention_int8` avoids the trade entirely — int8
    weights fit VMEM whole).

    Backward rematerializes LN + projections in XLA and reuses the
    `fused_qkv_mha` custom_vjp (flash backward kernel) via `jax.vjp`
    of the reference composition."""
    return _fused_block_attn_forward(x, ln_scale, ln_bias, wq, wk, wv,
                                     bq, bk, bv, wo, bo, num_heads, eps)


def _fused_block_reference(x, ln_scale, ln_bias, wq, wk, wv, bq, bk, bv,
                           wo, bo, num_heads, eps):
    xn = _layer_norm_f32(x, ln_scale, ln_bias, eps).astype(x.dtype)
    ao = fused_qkv_mha(xn, wq, wk, wv, bq, bk, bv, num_heads)
    out = jax.lax.dot_general(
        ao, wo, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bo.astype(jnp.float32)
    return (x.astype(jnp.float32) + out).astype(x.dtype)


def _fused_block_fwd(x, ln_scale, ln_bias, wq, wk, wv, bq, bk, bv, wo,
                     bo, num_heads, eps):
    out = _fused_block_attn_forward(x, ln_scale, ln_bias, wq, wk, wv,
                                    bq, bk, bv, wo, bo, num_heads, eps)
    return out, (x, ln_scale, ln_bias, wq, wk, wv, bq, bk, bv, wo, bo)


def _fused_block_bwd(num_heads, eps, res, g):
    _, vjp = jax.vjp(
        lambda *a: _fused_block_reference(*a, num_heads, eps), *res)
    return vjp(g)


fused_block_attention.defvjp(_fused_block_fwd, _fused_block_bwd)


def _block_attn_int8_kernel(x_ref, ls_ref, lb_ref, aq_ref, wq_ref,
                            svq_ref, bq_ref, wk_ref, svk_ref, bk_ref,
                            wv_ref, svv_ref, bv_ref, ao_ref, wo_ref,
                            svo_ref, bo_ref, o_ref, oall_ref, *,
                            hg: int, dh: int, scale: float, eps: float,
                            groups: int):
    """Int8 block attention, ONE program per batch element with ALL
    weights VMEM-resident: the four int8 (D, D) kernels total ~4 MB,
    so unlike the bf16 block kernel nothing streams — the group loop
    is a static unroll with STATIC weight slices, x is read once (it
    is LN input and residual), and no activation ever touches HBM.
    LN + quantize run once; attention stays bf16/f32; the quantized
    attention output feeds the int8 out-projection dot per group and
    the f32 partials sum into the residual."""
    dt = o_ref.dtype
    xn = _layer_norm_f32(x_ref[0], ls_ref[...], lb_ref[...],
                         eps).astype(dt)
    xq = jnp.clip(jnp.round(xn.astype(jnp.float32) / aq_ref[0, 0]),
                  -127, 127).astype(jnp.int8)           # (S, D)
    out = x_ref[0].astype(jnp.float32) + bo_ref[...]

    def proj(w_ref, sv_ref, b_ref, csl):
        y = jax.lax.dot_general(
            xq, w_ref[:, csl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * sv_ref[0, csl][None, :]
             + b_ref[0, csl][None, :])
        return y.astype(dt)

    for g in range(groups):
        csl = slice(g * hg * dh, (g + 1) * hg * dh)
        q_all = proj(wq_ref, svq_ref, bq_ref, csl)      # (S, hg*dh)
        k_all = proj(wk_ref, svk_ref, bk_ref, csl)
        v_all = proj(wv_ref, svv_ref, bv_ref, csl)
        for h, o in enumerate(_heads_attention(
                q_all, k_all, v_all, hg=hg, dh=dh, scale=scale,
                out_dtype=dt)):
            oall_ref[:, h * dh:(h + 1) * dh] = o
        oq = jnp.clip(
            jnp.round(oall_ref[...].astype(jnp.float32) / ao_ref[0, 0]),
            -127, 127).astype(jnp.int8)                 # (S, hg*dh)
        po = jax.lax.dot_general(
            oq, wo_ref[csl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out += po.astype(jnp.float32) * svo_ref[...]

    o_ref[0] = out.astype(dt)


def fused_block_attention_int8(x, ln_scale, ln_bias, aqkv, wq, sq, bq,
                               wk, sk, bk, wv, sv, bv, ao, wo, so, bo,
                               num_heads: int, eps: float = 1e-5):
    """Int8 block attention (serving, fwd-only): LN1 + shared-scale
    quantize + int8 QKV dots + bf16 attention + int8 out-projection +
    residual, one Pallas program per batch element.

    ``aqkv``: the shared q/k/v input act scale (calibration freezes
    identical scales — same input); ``ao``: the out-projection's act
    scale. Weight packs as `models/quant.py` QuantDense. Matches the
    separate QuantDense(static) composition within quantization-flip
    noise (one dequantized LSB; in-kernel exp/rounding may differ from
    XLA by an ulp at round() boundaries)."""
    b, s, d = x.shape
    dh = d // num_heads
    groups = _pick_groups(
        int(os.environ.get("PIGEON_FUSED_GROUPS", FUSED_GROUPS)),
        (2, 1), num_heads, dh,
        honor_pref="PIGEON_FUSED_GROUPS" in os.environ)
    hg = num_heads // groups
    gw = hg * dh

    aqkv = jnp.asarray(aqkv, jnp.float32).reshape(1, 1)
    ao = jnp.asarray(ao, jnp.float32).reshape(1, 1)

    def sv_vec(a, sc):                                 # (1, D) f32
        return (a[0, 0] * sc.astype(jnp.float32))[None, :]

    const = lambda bb: (0, 0)  # noqa: E731
    vec = pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM)
    wfull = pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec((1, 1), const, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_block_attn_int8_kernel, hg=hg, dh=dh,
                          scale=dh ** -0.5, eps=eps, groups=groups),
        out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, d), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            vec, vec, scalar,
            wfull, vec, vec, wfull, vec, vec, wfull, vec, vec,
            scalar, wfull, vec, vec,
        ],
        out_specs=pl.BlockSpec((1, s, d), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((s, gw), x.dtype),  # per-group attention output
        ],
    )(x, ln_scale.astype(jnp.float32)[None, :],
      ln_bias.astype(jnp.float32)[None, :],
      aqkv, wq, sv_vec(aqkv, sq), bq.astype(jnp.float32)[None, :],
      wk, sv_vec(aqkv, sk), bk.astype(jnp.float32)[None, :],
      wv, sv_vec(aqkv, sv), bv.astype(jnp.float32)[None, :],
      ao, wo, sv_vec(ao, so), bo.astype(jnp.float32)[None, :])


def _fused_qkv_int8_kernel(xq_ref, wq_ref, sq_ref, bq_ref, wk_ref,
                           sk_ref, bk_ref, wv_ref, sv_ref, bv_ref,
                           o_ref, *, hg: int, dh: int, scale: float):
    """Int8 variant of `_fused_qkv_kernel`: x arrives pre-quantized
    int8 (HALF the per-group x DMA of the bf16 kernel), the projection
    dots run int8 x int8 -> int32 on the MXU's ~1.8x int8 rate, and the
    per-output-channel dequant scale (act_scale folded in by the
    wrapper) + bias land in the f32 epilogue. Attention stays bf16/f32
    exactly as in the bf16 kernel."""
    xq = xq_ref[0]                                     # (S, D) int8

    def proj(w_ref, s_ref, b_ref):
        y = jax.lax.dot_general(
            xq, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * s_ref[...] + b_ref[...]
        return y.astype(o_ref.dtype)

    q_all = proj(wq_ref, sq_ref, bq_ref)               # (S, hg*dh)
    k_all = proj(wk_ref, sk_ref, bk_ref)
    v_all = proj(wv_ref, sv_ref, bv_ref)
    _fused_heads_attention(q_all, k_all, v_all, o_ref, hg=hg, dh=dh,
                           scale=scale)


def fused_qkv_mha_int8(x, act_scale, wq, sq, bq, wk, sk, bk, wv, sv, bv,
                       num_heads: int, head_dim=None):
    """Int8 fused QKV projection + attention (serving path, fwd-only).

    Args:
        x: (B, S, D) float activations.
        act_scale: f32 scalar — the SHARED per-tensor input scale
            (`models/quant.py` static mode; q/k/v observe the same
            input so calibration freezes identical scales).
        wq/wk/wv: int8 (D, P) kernels; sq/sk/sv: f32 (P,)
            per-output-channel weight scales; bq/bk/bv: f32 (P,).
        head_dim: defaults to ``D // num_heads`` (P == D, single chip).
            Under tensor parallelism P is a HEAD-dim shard of D
            (Megatron column split) — pass ``num_heads`` = LOCAL heads
            and the TRUE head_dim, exactly like `fused_qkv_mha`.
    Returns:
        (B, S, P) attention output in ``x.dtype`` (heads concatenated,
        pre-output-projection).

    Matches QuantDense(static) projections + `mha` exactly:
    ``x_q = clip(round(x / act_scale), ±127)``,
    ``q = x_q @ wq * (act_scale * sq) + bq`` — the quantize step is a
    fusable XLA round/clip/cast (folds into the producing op), and the
    act_scale is folded into the weight-scale vectors so the kernel
    needs no scalar operand.
    """
    b, s, d = x.shape
    dh = head_dim if head_dim is not None else d // num_heads
    p = num_heads * dh
    if wq.shape != (d, p):
        raise ValueError(
            f"fused_qkv_mha_int8: weight shape {wq.shape} != (D={d}, "
            f"num_heads*head_dim={p}) — mis-sharded operands?")
    groups = _pick_groups(
        int(os.environ.get("PIGEON_FUSED_GROUPS", FUSED_GROUPS)),
        (2, 1), num_heads, dh,
        honor_pref="PIGEON_FUSED_GROUPS" in os.environ)
    hg = num_heads // groups
    gw = hg * dh

    act_scale = jnp.asarray(act_scale, jnp.float32)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / act_scale),
                   -127, 127).astype(jnp.int8)

    def fold(sc):                                      # (D,) -> (1, D) f32
        return (act_scale * sc.astype(jnp.float32))[None, :]

    wspec = pl.BlockSpec((d, gw), lambda g, bb: (0, g),
                         memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, gw), lambda g, bb: (0, g),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fused_qkv_int8_kernel, hg=hg, dh=dh,
                          scale=dh ** -0.5),
        out_shape=jax.ShapeDtypeStruct((b, s, p), x.dtype),
        grid=(groups, b),
        in_specs=[
            pl.BlockSpec((1, s, d), lambda g, bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec, vec, vec, wspec, vec, vec, wspec, vec, vec,
        ],
        out_specs=pl.BlockSpec((1, s, gw), lambda g, bb: (bb, 0, g),
                               memory_space=pltpu.VMEM),
    )(x_q, wq, fold(sq), bq.astype(jnp.float32)[None, :],
      wk, fold(sk), bk.astype(jnp.float32)[None, :],
      wv, fold(sv), bv.astype(jnp.float32)[None, :])
    return out


def _xla_attention_bshd(q, k, v):
    """Reference einsum attention on (BH, S, Dh) (f32 softmax)."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqd,bkd->bqk", q, k) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
    return jnp.einsum("bqk,bkd->bqd", probs, v)


@jax.custom_vjp
def _mha_bh(q, k, v):
    return _flash_forward(q, k, v)


def _mha_fwd(q, k, v):
    return _flash_forward(q, k, v), (q, k, v)


def _mha_bwd(res, g):
    """Rematerialized fused backward (Pallas kernel, VMEM-resident)."""
    q, k, v = res
    return _flash_backward(q, k, v, g)


_mha_bh.defvjp(_mha_fwd, _mha_bwd)


def mha(q, k, v):
    """Fused multi-head attention.

    Args:
        q, k, v: ``(B, S, H, Dh)`` (the model's layout).
    Returns:
        ``(B, S, H, Dh)`` attention output.
    """
    b, s, h, dh = q.shape

    def fold(x):
        return jnp.swapaxes(x, 1, 2).reshape(b * h, s, dh)

    out = _mha_bh(fold(q), fold(k), fold(v))
    return jnp.swapaxes(out.reshape(b, h, s, dh), 1, 2)


def sharded_mha(q, k, v, mesh, batch_axis="data", head_axis="model"):
    """`mha` under `jax.shard_map` for multi-chip meshes.

    `pallas_call` cannot live under a plain GSPMD jit with sharded
    operand avals (jax 0.9 raises "requires all mesh axes to be
    Manual" — docs/SHARDING.md). Attention is embarrassingly parallel
    over (batch, head), so the Manual wrapping needs NO collectives:
    shard B over ``batch_axis`` and H over ``head_axis`` and run the
    single-chip kernel on each local block. An axis whose size does
    not divide the corresponding dimension (e.g. evaluate's ragged
    tail batch) is dropped to replicated — correct, just not
    partitioned. `models/clip.py` routes its 'flash' attention here
    whenever a mesh is registered (`set_attention_mesh`, called by
    `train/mesh.py::create_mesh` on multi-chip TPU backends).

    Args:
        q, k, v: ``(B, S, H, Dh)``.
        mesh: `jax.sharding.Mesh`.
        batch_axis / head_axis: mesh-axis names (pass ``None`` to
            leave that dimension unsharded; unknown names count as
            size 1).
    Returns:
        ``(B, S, H, Dh)`` attention output, sharded like q.
    """
    b, _, h, _ = q.shape
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    if batch_axis is not None and b % sizes.get(batch_axis, 1) != 0:
        batch_axis = None
    if head_axis is not None and h % sizes.get(head_axis, 1) != 0:
        head_axis = None
    spec = jax.sharding.PartitionSpec(batch_axis, None, head_axis, None)
    return jax.shard_map(
        mha, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)(q, k, v)


def sharded_fused_qkv_mha(x, wq, wk, wv, bq, bk, bv, num_heads, mesh,
                          batch_axis="data", head_axis="model"):
    """`fused_qkv_mha` under `jax.shard_map` for multi-chip meshes.

    The QKV projection weights carry Megatron column sharding
    (`train/mesh.py` DEFAULT_RULES: kernels P(None, 'model'), biases
    P('model')) — a head-dim split, so each shard projects and attends
    its LOCAL heads against the replicated x block with NO collectives
    in the forward (the backward's dx psum over ``head_axis`` is
    inserted by shard_map's transpose of the replicated-x spec). An
    axis that does not divide its dimension drops to replicated, which
    for ``head_axis`` means falling back to fully local compute.

    Args:
        x: ``(B, S, D)``; wq/wk/wv: ``(D, D)`` (GLOBAL shapes — GSPMD
            supplies shards); bq/bk/bv: ``(D,)``; num_heads: GLOBAL
            head count.
    Returns:
        ``(B, S, D)`` fused attention output, head-sharded like the
        projections.
    """
    b, _, d = x.shape
    dh = d // num_heads
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    if batch_axis is not None and b % sizes.get(batch_axis, 1) != 0:
        batch_axis = None
    tp = sizes.get(head_axis, 1) if head_axis is not None else 1
    if num_heads % max(tp, 1) != 0:
        head_axis, tp = None, 1
    local_heads = num_heads // max(tp, 1)

    P = jax.sharding.PartitionSpec
    xspec = P(batch_axis, None, None)
    wspec = P(None, head_axis)
    bspec = P(head_axis)
    ospec = P(batch_axis, None, head_axis)
    return jax.shard_map(
        lambda xx, a, c, e, f, g, h: fused_qkv_mha(
            xx, a, c, e, f, g, h, local_heads, dh),
        mesh=mesh,
        in_specs=(xspec, wspec, wspec, wspec, bspec, bspec, bspec),
        out_specs=ospec, check_vma=False)(x, wq, wk, wv, bq, bk, bv)


def sharded_fused_qkv_mha_int8(x, act_scale, wq, sq, bq, wk, sk, bk,
                               wv, sv, bv, num_heads, mesh,
                               batch_axis="data", head_axis="model"):
    """`fused_qkv_mha_int8` under `jax.shard_map` for multi-chip meshes.

    Same Megatron head-split layout as `sharded_fused_qkv_mha`: int8
    kernels are column-sharded P(None, head_axis); the per-output-
    channel weight scales and biases follow the columns P(head_axis);
    the per-tensor activation scale is a replicated scalar; x is
    replicated over ``head_axis`` so each shard quantizes it locally
    (identical x_q on every shard — the round/clip is deterministic)
    and projects+attends its LOCAL heads with no forward collectives.
    This is what keeps the validated int8 serving route
    (`_quant_attn_impl` -> 'flash_fused', r4: 565.9 vs 434.1 img/s)
    uniform across chip counts.

    Args:
        x: ``(B, S, D)``; wq/wk/wv: int8 ``(D, D)`` GLOBAL shapes;
        sq/sk/sv, bq/bk/bv: ``(D,)``; act_scale: f32 scalar;
        num_heads: GLOBAL head count.
    Returns:
        ``(B, S, D)`` attention output, head-sharded like the weights.
    """
    b, _, d = x.shape
    dh = d // num_heads
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    if batch_axis is not None and b % sizes.get(batch_axis, 1) != 0:
        batch_axis = None
    tp = sizes.get(head_axis, 1) if head_axis is not None else 1
    if num_heads % max(tp, 1) != 0:
        head_axis, tp = None, 1
    local_heads = num_heads // max(tp, 1)

    P = jax.sharding.PartitionSpec
    xspec = P(batch_axis, None, None)
    sscale = P()
    wspec = P(None, head_axis)
    vspec = P(head_axis)
    ospec = P(batch_axis, None, head_axis)
    return jax.shard_map(
        lambda xx, a, w1, s1, b1, w2, s2, b2, w3, s3, b3:
        fused_qkv_mha_int8(xx, a, w1, s1, b1, w2, s2, b2, w3, s3, b3,
                           local_heads, dh),
        mesh=mesh,
        in_specs=(xspec, sscale, wspec, vspec, vspec, wspec, vspec,
                  vspec, wspec, vspec, vspec),
        out_specs=ospec, check_vma=False)(
            x, jnp.asarray(act_scale, jnp.float32), wq, sq, bq,
            wk, sk, bk, wv, sv, bv)


#: (mesh, batch_axis, head_axis) registered by `set_attention_mesh` —
#: when present, the model's 'flash' attention path runs `sharded_mha`
#: instead of the bare kernel so multi-chip GSPMD steps keep Pallas
#: attention (read at TRACE time; single-chip and CPU runs leave it
#: unset).
_ATTENTION_MESH = None


def set_attention_mesh(mesh, batch_axis: str = "data",
                       head_axis: str = "model") -> None:
    """Register (None to clear) the mesh hosting `mha` via shard_map."""
    global _ATTENTION_MESH
    _ATTENTION_MESH = (None if mesh is None
                       else (mesh, batch_axis, head_axis))


def get_attention_mesh():
    return _ATTENTION_MESH


@contextlib.contextmanager
def attention_mesh(mesh, batch_axis: str = "data",
                   head_axis: str = "model"):
    """Scoped `set_attention_mesh` (tests / explicit deployments)."""
    global _ATTENTION_MESH
    prev = _ATTENTION_MESH
    set_attention_mesh(mesh, batch_axis, head_axis)
    try:
        yield
    finally:
        _ATTENTION_MESH = prev
