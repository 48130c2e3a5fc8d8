"""CLIP vision + text towers in Flax, TPU-first.

Behavioral parity targets (HuggingFace `transformers` CLIP, which the
reference uses as its backbone — `models/clip_embedder.py:25-26`,
`training/train_modes.py:43`):

  * pre-LN transformer encoder, quick-GELU MLP, attention softmax in f32;
  * vision tower: conv patch embed + CLS + learned positions, `pre_layrnorm`,
    `last_hidden_state` WITHOUT the post-layernorm, pooled = post_LN(CLS);
  * text tower: causal mask, final LN, pooled at the first EOS position;
  * contrastive head: L2-normalized projections, learned `logit_scale`,
    symmetric cross-entropy.

TPU-first design decisions (NOT in the reference):
  * the encoder stack is an `nn.scan` over a single `TransformerLayer` —
    layer params are stacked on a leading axis, giving one fused HBM
    layout, O(1) compile time in depth, and a natural target for
    per-layer gradient masks (partial freezing) and pipeline sharding;
  * computation dtype is configurable (bf16 on the MXU by default at
    train time) with f32 parameters and f32 softmax accumulation;
  * attention is a pluggable function (`attn_impl='xla'|'flash'`), so the
    Pallas flash-attention kernel can replace the einsum path without
    touching the model definition.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pigeon_tpu.config import TextConfig, VisionConfig

Dtype = Any


def quick_gelu(x):
    """CLIP's activation: ``x * sigmoid(1.702 x)``."""
    return x * jax.nn.sigmoid(1.702 * x)


_ACTIVATIONS: dict[str, Callable] = {
    "quick_gelu": quick_gelu,
    # HF 'gelu' is the exact erf form (jax defaults to the tanh approx).
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_approx": jax.nn.gelu,
}


def xla_attention(q, k, v, mask: Optional[jnp.ndarray], dtype: Dtype):
    """Plain XLA attention: einsum + f32 softmax.

    Shapes: q/k/v are ``(B, S, H, Dh)``; mask is additive ``(1|B, 1, S, S)``
    or None. XLA fuses this well on TPU for moderate sequence lengths
    (ViT-L/14-336 has S=577); the Pallas flash path exists for long-S and
    memory-bound regimes.
    """
    head_dim = q.shape[-1]
    scale = head_dim**-0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


class PatchEmbed(nn.Module):
    """Patch embedding as space-to-depth + matmul.

    For a stride==kernel convolution this is mathematically identical to
    `nn.Conv`, but lands directly on the MXU as one
    ``(B*N, P*P*C) x (P*P*C, D)`` contraction instead of going through the
    conv lowering. The parameter keeps the conv layout ``(P, P, C, D)``
    (name 'kernel') so HF checkpoint import is unchanged.
    """

    features: int
    patch_size: int
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) -> (B, N_patches, features)."""
        p = self.patch_size
        b, h, w, c = x.shape
        gh, gw = h // p, w // p
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (p, p, c, self.features), jnp.float32)
        x = x.reshape(b, gh, p, gw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)
        y = x @ kernel.astype(self.dtype).reshape(p * p * c, self.features)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class _DenseParams(nn.Module):
    """Parameter-only twin of `nn.Dense` (same names/init/shapes/param
    dtype): lets the fused QKV kernel consume raw kernels/biases while
    keeping the checkpoint tree identical to the Dense path."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class _QuantDenseParams(nn.Module):
    """Parameter-only twin of `models.quant.QuantDense` (same names/
    init/shapes/dtypes): lets the int8 fused QKV kernel consume the raw
    int8 kernels + scales while the checkpoint tree stays identical to
    the QuantDense path (so `quantize_tower_params` /
    `calibrate_act_scales` output loads unchanged)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", lambda _, s: jnp.zeros(s, jnp.int8),
                            (self.in_features, self.features))
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        act_scale = self.param("act_scale", nn.initializers.ones,
                               (), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, scale, act_scale, bias


class _LayerNormParams(nn.Module):
    """Parameter-only twin of `nn.LayerNorm` (same names/shapes/dtypes)
    for the LN-fused attention path: the affine params live in the
    checkpoint exactly as the separate-LN tower's, but the normalize
    itself runs inside the Pallas kernel."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return scale, bias


class MultiHeadAttention(nn.Module):
    """Standard MHA with separate q/k/v/out projections (HF-compatible).

    ``attn_impl='flash_fused'`` runs the QKV projections INSIDE the
    Pallas attention kernel (`kernels/flash_attention.fused_qkv_mha`) —
    q/k/v never round-trip through HBM. Param tree is unchanged
    (`_DenseParams`); falls back to 'flash' semantics under masks.
    With ``quant='static'`` the fused kernel runs the projections as
    int8 MXU dots (`fused_qkv_mha_int8`) with x quantized ONCE at the
    shared per-tensor scale (q/k/v observe the same input, so
    calibration freezes identical scales; the kernel uses their max);
    dynamic-quant calibration (``quant=True``) keeps the separate
    QuantDense path so each projection can sow its amax."""

    num_heads: int
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    quant: Any = False  # False | True (int8, dynamic act) | "static"

    @nn.compact
    def __call__(self, x, mask=None, ln=None):
        d = x.shape[-1]
        head_dim = d // self.num_heads
        from pigeon_tpu.models.quant import dense_factory

        make = dense_factory(self.quant, self.dtype)
        dense = lambda name: make(d, name)  # noqa: E731

        if (self.attn_impl == "flash_fused" and mask is None
                and not self.quant):
            from pigeon_tpu.kernels import flash_attention

            wq, bq = _DenseParams(d, d, name="q_proj")()
            wk, bk = _DenseParams(d, d, name="k_proj")()
            wv, bv = _DenseParams(d, d, name="v_proj")()
            cast = lambda t: t.astype(self.dtype)  # noqa: E731
            if ln is not None:
                # `ln` = (scale, bias, eps) from the caller's pre-LN:
                # x is RAW here; LN runs inside the kernel.
                ls, lb, eps = ln
                out = flash_attention.fused_ln_qkv_mha(
                    x.astype(self.dtype), ls, lb, cast(wq), cast(wk),
                    cast(wv), cast(bq), cast(bk), cast(bv),
                    self.num_heads, eps)
            else:
                mesh_info = flash_attention.get_attention_mesh()
                if mesh_info is not None:
                    # Multi-chip: the fused kernel runs per-shard on
                    # its LOCAL (Megatron column-split) heads under
                    # shard_map (docs/SHARDING.md).
                    out = flash_attention.sharded_fused_qkv_mha(
                        x, cast(wq), cast(wk), cast(wv), cast(bq),
                        cast(bk), cast(bv), self.num_heads, *mesh_info)
                else:
                    out = flash_attention.fused_qkv_mha(
                        x, cast(wq), cast(wk), cast(wv), cast(bq),
                        cast(bk), cast(bv), self.num_heads)
            # Named for remat='attn_kernel' (r7): the 'attn_out' policy
            # saves only the POST-out-proj tensor, so the rematerialized
            # backward still re-ran this kernel to rebuild out_proj's
            # input (the r7 trace's attn.25, 1.97 ms/layer). Saving the
            # kernel output too lets the remat pass skip the kernel AND
            # the (then-dead) LN1.
            from jax.ad_checkpoint import checkpoint_name

            return dense("out_proj")(checkpoint_name(
                out, "attn_kernel_out"))

        if (self.attn_impl == "flash_fused_block" and mask is None
                and not self.quant and ln is not None):
            # The whole attention half (LN1 + QKV + attention +
            # out-projection + residual) as ONE kernel — the caller
            # must NOT add the residual again.
            from pigeon_tpu.kernels import flash_attention

            wq, bq = _DenseParams(d, d, name="q_proj")()
            wk, bk = _DenseParams(d, d, name="k_proj")()
            wv, bv = _DenseParams(d, d, name="v_proj")()
            wo, bo = _DenseParams(d, d, name="out_proj")()
            ls, lb, eps = ln
            cast = lambda t: t.astype(self.dtype)  # noqa: E731
            return flash_attention.fused_block_attention(
                x.astype(self.dtype), ls, lb, cast(wq), cast(wk),
                cast(wv), cast(bq), cast(bk), cast(bv), cast(wo),
                cast(bo), self.num_heads, eps)

        if (self.attn_impl == "flash_fused_block" and mask is None
                and self.quant == "static" and ln is not None):
            # Int8 block: all four int8 (D, D) kernels fit VMEM at
            # once (~4 MB), so the kernel runs one program per batch
            # element with zero weight streaming and zero activation
            # round-trips. Residual included — caller must not re-add.
            from pigeon_tpu.kernels import flash_attention

            wq, sq, aq, bq = _QuantDenseParams(d, d, name="q_proj")()
            wk, sk, ak, bk = _QuantDenseParams(d, d, name="k_proj")()
            wv, sv, av, bv = _QuantDenseParams(d, d, name="v_proj")()
            wo, so, ao, bo = _QuantDenseParams(d, d, name="out_proj")()
            ls, lb, eps = ln
            a_qkv = jnp.maximum(jnp.maximum(aq, ak), av)
            return flash_attention.fused_block_attention_int8(
                x.astype(self.dtype), ls, lb, a_qkv, wq, sq, bq,
                wk, sk, bk, wv, sv, bv, ao, wo, so, bo,
                self.num_heads, eps)

        if (self.attn_impl == "flash_fused" and mask is None
                and self.quant == "static"):
            from pigeon_tpu.kernels import flash_attention

            wq, sq, aq, bq = _QuantDenseParams(d, d, name="q_proj")()
            wk, sk, ak, bk = _QuantDenseParams(d, d, name="k_proj")()
            wv, sv, av, bv = _QuantDenseParams(d, d, name="v_proj")()
            a_scale = jnp.maximum(jnp.maximum(aq, ak), av)
            mesh_info = flash_attention.get_attention_mesh()
            if mesh_info is not None:
                # Multi-chip: host the int8 kernel under shard_map on
                # its local (Megatron column-split) heads, exactly
                # like the bf16 fused path (docs/SHARDING.md).
                out = flash_attention.sharded_fused_qkv_mha_int8(
                    x.astype(self.dtype), a_scale, wq, sq, bq, wk, sk,
                    bk, wv, sv, bv, self.num_heads, *mesh_info)
            else:
                out = flash_attention.fused_qkv_mha_int8(
                    x.astype(self.dtype), a_scale, wq, sq, bq, wk, sk,
                    bk, wv, sv, bv, self.num_heads)
            from jax.ad_checkpoint import checkpoint_name

            return dense("out_proj")(checkpoint_name(
                out, "attn_kernel_out"))

        q = dense("q_proj")(x).reshape(*x.shape[:-1], self.num_heads, head_dim)
        k = dense("k_proj")(x).reshape(*x.shape[:-1], self.num_heads, head_dim)
        v = dense("v_proj")(x).reshape(*x.shape[:-1], self.num_heads, head_dim)

        if self.attn_impl in ("flash", "flash_fused") and mask is None:
            from pigeon_tpu.kernels import flash_attention
            mesh_info = flash_attention.get_attention_mesh()
            if mesh_info is not None:
                # Multi-chip: pallas_call rejects sharded avals under
                # GSPMD jit — host the kernel under shard_map on the
                # registered mesh (set by create_mesh on multi-chip
                # TPU backends; docs/SHARDING.md).
                out = flash_attention.sharded_mha(q, k, v, *mesh_info)
            else:
                out = flash_attention.mha(q, k, v)
        else:
            out = xla_attention(q, k, v, mask, self.dtype)

        out = out.reshape(*x.shape[:-1], d)
        from jax.ad_checkpoint import checkpoint_name

        return dense("out_proj")(checkpoint_name(out, "attn_kernel_out"))


class TransformerLayer(nn.Module):
    """Pre-LN transformer block: x += attn(LN1(x)); x += mlp(LN2(x))."""

    num_heads: int
    intermediate_size: int
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    quant: Any = False  # False | True (dynamic act) | "static"

    @nn.compact
    def __call__(self, x, mask=None):
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=self.layer_norm_eps, dtype=self.dtype,
            param_dtype=jnp.float32, name=name)
        act = _ACTIVATIONS[self.hidden_act]
        from pigeon_tpu.models.quant import dense_factory

        mlp_dense = dense_factory(self.quant, self.dtype)

        # 'flash_fused_ln' folds LN1 into the fused QKV kernel (the
        # normalized tensor never round-trips HBM); 'flash_fused_mlp'
        # additionally folds LN2 + fc1 + quick-GELU + fc2 + residual
        # into `kernels/fused_mlp.fused_ln_mlp`. Param tree is
        # unchanged: `_LayerNormParams`/`_DenseParams` declare the same
        # ln1/ln2/fc1/fc2 names. Under masks / dynamic-quant
        # calibration both degrade to plain 'flash_fused' + XLA ops.
        # Int8 static towers keep the MLP in XLA QuantDense ops —
        # settled TWICE on hardware: the r4 `fused_ln_mlp_int8` (LN
        # folded in-kernel) failed parity at 0.051 (Mosaic rsqrt !=
        # XLA rsqrt flips the input requantize), and the r7 LN-free
        # rebuild (`fused_mlp_int8`: only GELU+requantize in-kernel)
        # measured SLOWER than XLA (5.58 vs 4.93 ms/call standalone)
        # AND flipped 70% of requantizes (Mosaic's f32 logistic vs
        # XLA-TPU's native-bf16 logistic). Root cause of the r7
        # attempt: a misread trace — XLA already fuses fc1+scale+GELU+
        # requantize into ONE fusion running at ~88% of int8 MXU peak
        # (docs/PERF.md "r7 int8 floor"). Both kernels deleted; do not
        # rebuild without new trace evidence.
        ln_impls = ("flash_fused_ln", "flash_fused_mlp",
                    "flash_fused_block")
        fuse_ln = (self.attn_impl in ln_impls and mask is None
                   and not self.quant)
        # 'flash_fused_block' fuses the ENTIRE attention half including
        # the out-projection and residual into one kernel; paired with
        # the fused MLP the layer is two Pallas programs. Static int8
        # towers route to the whole-weights-resident int8 block kernel.
        fuse_block = (self.attn_impl == "flash_fused_block"
                      and mask is None
                      and self.quant in (False, "static"))
        fuse_mlp = (self.attn_impl in ("flash_fused_mlp",
                                       "flash_fused_block")
                    and mask is None
                    and self.quant is False
                    and self.hidden_act == "quick_gelu")
        impl = ("flash_fused" if (self.attn_impl in ln_impls
                                  and not fuse_block)
                else self.attn_impl)
        attn = MultiHeadAttention(
            self.num_heads, dtype=self.dtype, attn_impl=impl,
            quant=self.quant, name="attn")
        # Named for remat='attn_out': saving this (B, S, d) tensor skips
        # re-running the attention kernel during the rematerialized
        # backward (the flash backward recomputes softmax internally
        # anyway, so full remat runs the attention THREE times).
        from jax.ad_checkpoint import checkpoint_name

        if fuse_block:
            ls, lb = _LayerNormParams(x.shape[-1], name="ln1")()
            # Residual included by the kernel; the checkpoint_name
            # lands on the post-residual tensor (same (B, S, d) cost).
            x = checkpoint_name(
                attn(x, mask, ln=(ls, lb, self.layer_norm_eps)),
                "attn_out")
        else:
            if fuse_ln:
                ls, lb = _LayerNormParams(x.shape[-1], name="ln1")()
                attn_out = attn(x, mask,
                                ln=(ls, lb, self.layer_norm_eps))
            else:
                attn_out = attn(ln("ln1")(x), mask)
            x = x + checkpoint_name(attn_out, "attn_out")
        if fuse_mlp:
            from pigeon_tpu.kernels.fused_mlp import fused_ln_mlp

            d = x.shape[-1]
            ls2, lb2 = _LayerNormParams(d, name="ln2")()
            w1, b1 = _DenseParams(d, self.intermediate_size,
                                  name="fc1")()
            w2, b2 = _DenseParams(self.intermediate_size, d,
                                  name="fc2")()
            cast = lambda t: t.astype(self.dtype)  # noqa: E731
            return fused_ln_mlp(x.astype(self.dtype), ls2, lb2,
                                cast(w1), cast(b1), cast(w2), cast(b2),
                                self.layer_norm_eps)
        h = ln("ln2")(x)
        h = mlp_dense(self.intermediate_size, "fc1")(h)
        h = act(h)
        h = mlp_dense(x.shape[-1], "fc2")(h)
        return x + h


def _remat_policy_names(remat, attn_impl: str):
    """Checkpoint names saved under a named remat policy, or () for
    'full'.

    * 'attn_out' — the post-residual attention output: the backward
      never re-runs the attention kernel (the flash backward recomputes
      softmax internally anyway, so full remat runs attention THREE
      times).
    * 'attn_kernel' (r7 winner, 95.4 vs 88.4 img/s bs48) — ALSO the
      pre-out-proj kernel output: the 'attn_out' policy still re-ran
      the fused QKV forward in the remat pass to rebuild out_proj's
      input (trace: 1.97 ms/layer); one extra (B, S, d) bf16 save per
      layer removes that rerun and the then-dead LN1.
    * 'attn_slim' (r8, −0.3% vs 'attn_kernel') — ONLY the kernel
      output; attn_out is recomputed as x + out_proj(kernel_out) (one
      dense, still no kernel rerun). A memory knob: one less (B, S, d)
      bf16 save per layer.

    Under `attn_impl='flash_fused_block'` the out-projection and
    residual live INSIDE the kernel, so no pre-out-proj tensor exists
    to name: 'attn_kernel'/'attn_slim' fall back to saving the block
    output ('attn_out') — without this, `save_only_these_names` would
    match NOTHING on that path and the run silently measured FULL
    remat (r8 review finding)."""
    if remat == "attn_out":
        return ("attn_out",)
    if remat in ("attn_kernel", "attn_slim"):
        if attn_impl == "flash_fused_block":
            return ("attn_out",)
        if remat == "attn_kernel":
            return ("attn_out", "attn_kernel_out")
        return ("attn_kernel_out",)
    return ()


class TransformerStack(nn.Module):
    """`nn.scan`-stacked encoder: params carry a leading layer axis.

    The stacked layout is the TPU-idiomatic encoding of depth: a single
    (L, ...) buffer per weight instead of L separate allocations, constant
    compile time, and per-layer freeze masks become a broadcastable
    ``(L, 1, ..)`` multiply on gradients (see `train/partial_freeze.py`).
    """

    num_layers: int
    num_heads: int
    intermediate_size: int
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    quant: Any = False  # False | True (dynamic act) | "static"
    #: False/'none' = save all activations; True/'full' = full per-layer
    #: remat; 'attn_out' = remat but SAVE the attention outputs
    #: ((B, S, d) per layer — cheap in HBM, skips one of the three
    #: attention executions); 'attn_kernel' (r7 winner, 95.4 vs 88.4
    #: img/s bs48) = additionally save the pre-out-proj kernel output
    #: so the remat pass also skips the fused QKV forward rerun.
    remat: Any = False

    @nn.compact
    def __call__(self, x, mask=None):
        layer_cls = TransformerLayer
        if self.remat and self.remat != "none":
            names = _remat_policy_names(self.remat, self.attn_impl)
            policy = (jax.checkpoint_policies.save_only_these_names(
                *names) if names else None)
            layer_cls = nn.remat(layer_cls, prevent_cse=False,
                                 policy=policy)

        def body(layer, carry):
            return layer(carry, mask), None

        stack = nn.scan(
            body,
            variable_axes={"params": 0, "intermediates": 0},
            split_rngs={"params": True},
            length=self.num_layers,
            metadata_params={nn.PARTITION_NAME: "layers"},
        )
        x, _ = stack(
            layer_cls(
                num_heads=self.num_heads,
                intermediate_size=self.intermediate_size,
                hidden_act=self.hidden_act,
                layer_norm_eps=self.layer_norm_eps,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                quant=self.quant,
                name="layers",
            ),
            x,
        )
        return x


class CLIPVisionTower(nn.Module):
    """CLIP ViT vision encoder.

    Returns ``(last_hidden_state, pooled)`` where `last_hidden_state` has
    NO post-layernorm applied (HF contract; the reference's embedding is the
    token MEAN of this tensor — `models/clip_embedder.py:63-66`) and
    `pooled` is post_LN(CLS).
    """

    config: VisionConfig
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    quant: Any = False  # False | True (dynamic act) | "static" (serving)
    remat: Any = False  # False|True("full")|"attn_out"|"attn_kernel"|"none"

    @nn.compact
    def __call__(self, pixel_values):
        """pixel_values: ``(B, H, W, 3)`` CLIP-normalized, NHWC (TPU-native
        layout; NCHW torch inputs must be transposed by the caller)."""
        cfg = self.config
        b = pixel_values.shape[0]

        embed_kwargs = dict(features=cfg.hidden_size,
                            patch_size=cfg.patch_size, use_bias=False,
                            dtype=self.dtype, name="patch_embed")
        if self.quant:
            from pigeon_tpu.models.quant import QuantPatchEmbed

            patches = QuantPatchEmbed(
                static_act=self.quant == "static", **embed_kwargs,
            )(pixel_values.astype(self.dtype))
        else:
            patches = PatchEmbed(**embed_kwargs)(
                pixel_values.astype(self.dtype))

        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (cfg.hidden_size,), jnp.float32)
        cls = jnp.broadcast_to(cls.astype(self.dtype),
                               (b, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)

        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (cfg.seq_len, cfg.hidden_size), jnp.float32)
        x = x + pos.astype(self.dtype)

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         param_dtype=jnp.float32, name="pre_ln")(x)
        x = TransformerStack(
            num_layers=cfg.num_layers,
            num_heads=cfg.num_heads,
            intermediate_size=cfg.intermediate_size,
            hidden_act=cfg.hidden_act,
            layer_norm_eps=cfg.layer_norm_eps,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            quant=self.quant,
            remat=self.remat,
            name="encoder",
        )(x)

        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              param_dtype=jnp.float32, name="post_ln")(x[:, 0])
        return x, pooled


class CLIPTextTower(nn.Module):
    """CLIP text encoder with causal masking and first-EOS pooling."""

    config: TextConfig
    dtype: Dtype = jnp.float32
    eos_token_id: int = 49407
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, input_ids):
        """input_ids: ``(B, S)`` int32 token ids (S <= 77)."""
        cfg = self.config
        s = input_ids.shape[-1]

        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="token_embed")(input_ids)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (cfg.max_position_embeddings, cfg.hidden_size),
                         jnp.float32)
        x = tok + pos[:s].astype(self.dtype)

        # Additive causal mask with a finite large-negative (bf16-safe).
        causal = jnp.triu(jnp.full((s, s), -1e9, dtype=jnp.float32), k=1)
        causal = causal[None, None, :, :]

        x = TransformerStack(
            num_layers=cfg.num_layers,
            num_heads=cfg.num_heads,
            intermediate_size=cfg.intermediate_size,
            hidden_act=cfg.hidden_act,
            layer_norm_eps=cfg.layer_norm_eps,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="encoder",
        )(x, causal)

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         param_dtype=jnp.float32, name="final_ln")(x)

        # Pool at the FIRST occurrence of the EOS token (HF post-#24773
        # contract, modeling_clip.py CLIPTextTransformer.forward).
        eos_pos = jnp.argmax(
            (input_ids == self.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = jnp.take_along_axis(
            x, eos_pos[:, None, None], axis=1).squeeze(1)
        return x, pooled


def clip_contrastive_loss(image_embeds, text_embeds, logit_scale):
    """Symmetric InfoNCE loss over L2-normalized projections.

    Matches HF `CLIPModel` with ``return_loss=True`` (the reference's
    pretraining objective, `training/train_modes.py:45-60`). Under data
    parallelism, gather embeddings across the mesh first (see
    `train/pretrain.py`) so the in-batch negatives span the global batch.
    """
    logits = logit_scale * text_embeds @ image_embeds.T
    n = logits.shape[0]
    labels = jnp.arange(n)
    loss_t = -jnp.mean(jnp.take_along_axis(
        jax.nn.log_softmax(logits, axis=-1), labels[:, None], axis=1))
    loss_i = -jnp.mean(jnp.take_along_axis(
        jax.nn.log_softmax(logits.T, axis=-1), labels[:, None], axis=1))
    return (loss_t + loss_i) / 2.0


class CLIPModel(nn.Module):
    """Full contrastive CLIP: both towers + projections + logit scale."""

    vision_config: VisionConfig
    text_config: TextConfig
    dtype: Dtype = jnp.float32
    eos_token_id: int = 49407
    attn_impl: str = "xla"
    remat: Any = False  # False|True("full")|"attn_out"|"attn_kernel"|"none"
    logit_scale_init: float = float(np.log(1.0 / 0.07))

    @nn.compact
    def __call__(self, pixel_values, input_ids, return_loss: bool = False):
        _, vision_pooled = CLIPVisionTower(
            self.vision_config, dtype=self.dtype, attn_impl=self.attn_impl,
            remat=self.remat, name="vision")(pixel_values)
        _, text_pooled = CLIPTextTower(
            self.text_config, dtype=self.dtype,
            eos_token_id=self.eos_token_id, attn_impl=self.attn_impl,
            name="text")(input_ids)

        image_embeds = nn.Dense(
            self.vision_config.projection_dim, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
            name="visual_projection")(vision_pooled)
        text_embeds = nn.Dense(
            self.text_config.projection_dim, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
            name="text_projection")(text_pooled)

        image_embeds = image_embeds / jnp.linalg.norm(
            image_embeds.astype(jnp.float32), axis=-1, keepdims=True)
        text_embeds = text_embeds / jnp.linalg.norm(
            text_embeds.astype(jnp.float32), axis=-1, keepdims=True)

        logit_scale = jnp.exp(self.param(
            "logit_scale",
            nn.initializers.constant(self.logit_scale_init), (), jnp.float32))

        out = {
            "image_embeds": image_embeds,
            "text_embeds": text_embeds,
            "logit_scale": logit_scale,
            "logits_per_image": logit_scale * image_embeds @ text_embeds.T,
        }
        if return_loss:
            out["loss"] = clip_contrastive_loss(
                image_embeds, text_embeds, logit_scale)
        return out
