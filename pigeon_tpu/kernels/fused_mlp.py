"""Pallas TPU fused LayerNorm + MLP (+ residual) for the ViT towers.

The transformer block's MLP half is the largest remaining HBM consumer
after the QKV fusion (`kernels/flash_attention.fused_qkv_mha`): a
separate XLA LayerNorm materializes the normalized (B, S, D) tensor,
and the fc1 output materializes (B, S, 4D) — at the flagship shape
(bs32, S=577, D=1024) that is ~378 MB of write+read traffic per layer.
This kernel computes ``x + fc2(act(fc1(LN(x))))`` in ONE program per
batch element, chunked over the intermediate (4D) dimension:

  grid = (B, C) with C = intermediate chunks. Per (b, c):
    * c == 0: LN(x) computed once into VMEM scratch (f32 math, cast to
      the compute dtype) — reused by every chunk;
    * h_c = act(xn @ W1[:, c-chunk] + b1[c-chunk])  — K=D full-width
      MXU dot;
    * acc += h_c @ W2[c-chunk, :]                   — K=chunk dot into
      an f32 VMEM accumulator (never bf16 partial sums);
    * c == C-1: out = (x + b2 + acc) cast to the I/O dtype.

The x and output blocks are indexed by b only, so x stays VMEM-resident
across the chunk sweep and the output flushes once; W1/W2 chunks stream
with double buffering. LN(x), fc1 output, and the residual sum never
touch HBM.

Activation: CLIP's ``quick_gelu`` (x * sigmoid(1.702 x)) — sigmoid
lowers to exp, which Mosaic supports (CLAUDE.md rule 4: no
erf/tanh-free guarantees, so the exact-gelu towers fall back to XLA).

Backward (`fused_ln_mlp` custom_vjp): rematerialize in XLA via
`jax.vjp` of the reference composition — same memory trade as the
attention fusions.

Rebuilds the behavioral contract of the reference's transformer MLP
(HF CLIPMLP, used via `models/clip_embedder.py:10-66`); the fusion
itself has no reference counterpart (the reference runs stock torch
CUDA kernels).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pigeon_tpu.kernels.flash_attention import _layer_norm_f32


def _default_chunk() -> int:
    """Intermediate-dimension chunk width (env-tunable:
    PIGEON_MLP_CHUNK, read at CALL time so a VMEM-reject retry in the
    same process takes effect). 512 keeps the per-step weight blocks at
    2 x 1 MB bf16; the full VMEM budget at the flagship shape
    (double-buffered x/out/weights + (S, D) xn + f32 accumulator
    scratch) is ~14-16 MB — near the ~16 MB/core limit, so 256 is the
    first fallback if the server-side compile rejects 512."""
    return int(os.environ.get("PIGEON_MLP_CHUNK", "512"))


def _quick_gelu_f32(y):
    return y * jax.nn.sigmoid(1.702 * y)


def _fused_ln_mlp_kernel(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref,
                         b2_ref, o_ref, xn_ref, acc_ref, *, chunks: int,
                         eps: float):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        xn_ref[...] = _layer_norm_f32(
            x_ref[0], ls_ref[...], lb_ref[...], eps).astype(xn_ref.dtype)

    h = jax.lax.dot_general(
        xn_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = _quick_gelu_f32(h + b1_ref[...]).astype(xn_ref.dtype)
    partial = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(c == 0)
    def _():
        acc_ref[...] = (x_ref[0].astype(jnp.float32) + b2_ref[...]
                        + partial)

    @pl.when(c > 0)
    def _():
        acc_ref[...] += partial

    @pl.when(c == chunks - 1)
    def _():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _fused_ln_mlp_forward(x, ln_scale, ln_bias, w1, b1, w2, b2,
                          eps: float):
    b, s, d = x.shape
    inter = w1.shape[1]
    chunk = _default_chunk()
    ck = chunk if inter % chunk == 0 else inter
    chunks = inter // ck

    return pl.pallas_call(
        functools.partial(_fused_ln_mlp_kernel, chunks=chunks, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
        grid=(b, chunks),
        in_specs=[
            pl.BlockSpec((1, s, d), lambda bb, c: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda bb, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda bb, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, ck), lambda bb, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ck), lambda bb, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ck, d), lambda bb, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda bb, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, d), lambda bb, c: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((s, d), x.dtype),       # LN(x), computed at c==0
            pltpu.VMEM((s, d), jnp.float32),   # f32 accumulator
        ],
    )(x, ln_scale.astype(jnp.float32)[None, :],
      ln_bias.astype(jnp.float32)[None, :],
      w1, b1.astype(jnp.float32)[None, :],
      w2, b2.astype(jnp.float32)[None, :])


def _reference_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, eps: float):
    """XLA reference composition (used by the custom_vjp backward)."""
    xn = _layer_norm_f32(x, ln_scale, ln_bias, eps).astype(x.dtype)
    h = (xn @ w1 + b1.astype(jnp.float32)).astype(jnp.float32)
    h = _quick_gelu_f32(h).astype(x.dtype)
    out = (h @ w2).astype(jnp.float32) + b2.astype(jnp.float32)
    return (x.astype(jnp.float32) + out).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, eps=1e-5):
    """LayerNorm + quick-GELU MLP + residual in ONE Pallas kernel.

    ``(B, S, D) -> (B, S, D)``, computing ``x + fc2(qgelu(fc1(LN(x))))``
    without materializing LN(x) or the (B, S, 4D) fc1 output in HBM.
    Exact-parity with the separate nn.LayerNorm/nn.Dense path (tests).
    """
    return _fused_ln_mlp_forward(x, ln_scale, ln_bias, w1, b1, w2, b2,
                                 eps)


def _fused_ln_mlp_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, eps):
    out = _fused_ln_mlp_forward(x, ln_scale, ln_bias, w1, b1, w2, b2,
                                eps)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _fused_ln_mlp_bwd(eps, res, g):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _reference_ln_mlp(*a, eps), x, ln_scale, ln_bias,
        w1, b1, w2, b2)
    return vjp(g)


fused_ln_mlp.defvjp(_fused_ln_mlp_fwd, _fused_ln_mlp_bwd)
