"""Int8 (W8A8) quantized inference for the vision tower.

TPU v5e's MXU runs int8 x int8 -> int32 at ~1.8x the bf16 rate (measured
286 TOPS vs 160 TFLOPS at n=8192 through this environment's tunnel; docs/
PERF.md). PIGEON's serving FLOPs are ~91% dense projections + MLP
(attention scores/values are only 1.4 of 15.9 GF/layer), so quantizing
the six per-layer matmuls plus the patch embed targets most of that
headroom while attention, softmax, layernorms, and residuals stay
bf16/f32.

Scheme (standard post-training W8A8):
  * weights: symmetric per-OUTPUT-channel int8, scale = max|w|/127 —
    computed offline by `quantize_tower_params` from trained f32 params;
  * activations: symmetric per-TOKEN dynamic int8 (scale from the row
    max at runtime — one cheap VPU reduce per matmul, no calibration
    data needed);
  * accumulation in int32 on the MXU, dequant fused into the epilogue.

This is an OPT-IN serving path (`CLIPVisionTower(quant=True)` +
converted params): quantization error vs the bf16 tower is bounded by
tests on random weights, but geolocation quality on real checkpoints
must be validated before production (the reference withholds weights and
benchmark data, README.md:11).

The reference has no quantized path at all — this is TPU-hardware
headroom the torch/A100 implementation never claimed.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def dense_factory(quant, dtype):
    """``dense(features, name)`` constructor for a maybe-quantized layer.

    One switch point shared by every dense site in the tower (MHA
    projections, MLP) so the quantization scheme cannot silently diverge
    between sites. ``quant``: False | True (dynamic act) | "static"."""
    if quant:
        return lambda features, name: QuantDense(
            features, dtype=dtype, static_act=quant == "static", name=name)
    return lambda features, name: nn.Dense(
        features, dtype=dtype, param_dtype=jnp.float32, name=name)


def quantize_channelwise(w: jnp.ndarray, axis: int = -1):
    """Symmetric per-channel int8 quantization along ``axis`` (the
    output-feature dim). Returns (w_q int8, scale f32) with
    ``w ≈ w_q * scale`` (scale broadcast on ``axis``)."""
    w = jnp.asarray(w, jnp.float32)
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis % w.ndim)
    amax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale.reshape(w.shape[axis % w.ndim])


def _dynamic_quant_tokens(x: jnp.ndarray):
    """Per-token (last-dim row) symmetric int8:
    (x_q, scale (..., 1), amax (..., 1))."""
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    x_q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return x_q, scale, amax


class QuantDense(nn.Module):
    """Dense layer with an int8 kernel and int8 activations.

    Parameter tree: ``kernel`` int8 (in, features), ``scale`` f32
    (features,), ``act_scale`` f32 scalar, ``bias`` f32 (features,).
    Initializers produce zeros / ones — quantized layers are CONVERTED
    from trained f32 params via `quantize_tower_params`, never trained.

    Activation quantization modes:
      * ``static_act=False`` (calibration / fallback): dynamic per-token
        scales — an extra max-reduce over every input, which MEASURED
        away the whole int8 MXU win (358 vs 362 img/s bf16; docs/
        PERF.md). Sows the observed batch amax so a calibration pass can
        freeze it.
      * ``static_act=True`` (serving): the frozen per-tensor
        ``act_scale`` — quantize collapses to round/clip/cast, which XLA
        fuses into the producing op. Calibrate with
        `calibrate_act_scales`.
    """

    features: int
    use_bias: bool = True
    static_act: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", lambda _, s: jnp.zeros(s, jnp.int8),
            (x.shape[-1], self.features))
        w_scale = self.param("scale", nn.initializers.ones,
                             (self.features,), jnp.float32)
        act_scale = self.param("act_scale", nn.initializers.ones,
                               (), jnp.float32)
        if self.static_act:
            xf = x.astype(jnp.float32)
            x_q = jnp.clip(jnp.round(xf / act_scale),
                           -127, 127).astype(jnp.int8)
            a_scale = act_scale
        else:
            # Sow the TRUE row max, not a_scale*127: the zero-guard maps
            # all-zero rows to scale 1.0, and reconstructing amax from it
            # would let one degenerate row inflate the frozen per-tensor
            # act_scale to >= 127 (ADVICE r2).
            x_q, a_scale, amax = _dynamic_quant_tokens(x)
            self.sow("intermediates", "act_amax",
                     jnp.max(amax),
                     reduce_fn=lambda a, b: jnp.maximum(a, b),
                     init_fn=lambda: jnp.zeros((), jnp.float32))
        y = jax.lax.dot_general(
            x_q, kernel, (((x_q.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (a_scale * w_scale)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias
        return y.astype(self.dtype)


class QuantPatchEmbed(nn.Module):
    """`models.clip.PatchEmbed` with an int8 kernel (space-to-depth +
    one int8 MXU contraction). Kernel keeps the conv layout
    (P, P, C, D) so conversion is positional. Same static/dynamic
    activation modes as `QuantDense`."""

    features: int
    patch_size: int
    use_bias: bool = False
    static_act: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        b, h, w, c = x.shape
        gh, gw = h // p, w // p
        kernel = self.param(
            "kernel", lambda _, s: jnp.zeros(s, jnp.int8),
            (p, p, c, self.features))
        w_scale = self.param("scale", nn.initializers.ones,
                             (self.features,), jnp.float32)
        act_scale = self.param("act_scale", nn.initializers.ones,
                               (), jnp.float32)
        x = x.reshape(b, gh, p, gw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)
        if self.static_act:
            x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / act_scale),
                           -127, 127).astype(jnp.int8)
            a_scale = act_scale
        else:
            # Sow the TRUE row max, not a_scale*127: the zero-guard maps
            # all-zero rows to scale 1.0, and reconstructing amax from it
            # would let one degenerate row inflate the frozen per-tensor
            # act_scale to >= 127 (ADVICE r2).
            x_q, a_scale, amax = _dynamic_quant_tokens(x)
            self.sow("intermediates", "act_amax",
                     jnp.max(amax),
                     reduce_fn=lambda a, b: jnp.maximum(a, b),
                     init_fn=lambda: jnp.zeros((), jnp.float32))
        y = jax.lax.dot_general(
            x_q, kernel.reshape(p * p * c, self.features),
            (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (a_scale * w_scale)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias
        return y.astype(self.dtype)


#: '/'-joined path suffixes of tower kernels that quantize (per-output-
#: channel on the LAST axis). Encoder leaves carry a stacked layer axis.
_QUANT_KERNEL_SUFFIXES = (
    "attn/q_proj/kernel", "attn/k_proj/kernel", "attn/v_proj/kernel",
    "attn/out_proj/kernel", "fc1/kernel", "fc2/kernel",
    "patch_embed/kernel",
)


def quantize_tower_params(tower_params):
    """Convert trained f32 `CLIPVisionTower` params to the
    `quant=True` tower's tree: each dense/patch-embed kernel becomes
    (int8 kernel, f32 scale); stacked encoder leaves quantize per layer
    (the leading scan axis is preserved). Everything else is copied."""

    def walk(tree, path):
        out = {}
        for key, val in tree.items():
            sub_path = f"{path}/{key}" if path else key
            if isinstance(val, dict):
                out[key] = walk(val, sub_path)
                continue
            if key == "kernel" and any(
                    sub_path.endswith(s) for s in _QUANT_KERNEL_SUFFIXES):
                stacked = "encoder/layers" in sub_path
                if stacked:
                    w_q, scale = jax.vmap(
                        lambda w: quantize_channelwise(w, axis=-1))(val)
                    act = jnp.ones((val.shape[0],), jnp.float32)
                else:
                    w_q, scale = quantize_channelwise(val, axis=-1)
                    act = jnp.ones((), jnp.float32)
                out["kernel"] = w_q
                out["scale"] = scale
                # Placeholder until `calibrate_act_scales` freezes real
                # per-tensor activation ranges.
                out["act_scale"] = act
            else:
                out[key] = val
        return out

    return walk(tower_params, "")


def calibrate_act_scales(quant_model, params, sample_pixels,
                         margin: float = 1.0):
    """Freeze per-tensor activation scales from one observed batch.

    Runs the DYNAMIC quant model (``quant=True``) over
    ``sample_pixels``; every QuantDense/QuantPatchEmbed sows the batch
    amax of its input. Returns a params tree with each ``act_scale``
    replaced by ``amax * margin / 127`` — ready for the STATIC model
    (``quant='static'``), whose quantize step is a fusable
    round/clip/cast with no runtime reduce.

    ``margin > 1`` leaves headroom above the observed batch max —
    activations beyond ``act_scale * 127`` hard-clip at every matmul, so
    calibration on a small or unrepresentative batch (e.g. the synthetic
    batch `cli serve --quant` uses at startup) should not sit exactly at
    the observed max. The cost is a proportionally coarser quantization
    step for in-range values.
    """
    # One compile + one dispatch (params as jit ARGUMENTS — an un-jitted
    # apply would execute the 24-layer tower op-by-op, paying per-dispatch
    # RPC overhead thousands of times through the TPU tunnel).
    forward = jax.jit(lambda p, x: quant_model.apply(
        {"params": p}, x, mutable=["intermediates"]))
    _, state = forward(params, sample_pixels)
    inter = state["intermediates"]

    def graft(ptree, itree):
        out = {}
        for key, val in ptree.items():
            sub_i = itree.get(key) if isinstance(itree, dict) else None
            if isinstance(val, dict):
                out[key] = graft(val, sub_i if isinstance(sub_i, dict)
                                 else {})
            elif key == "act_scale" and isinstance(itree, dict) \
                    and "act_amax" in itree:
                amax = itree["act_amax"]
                if isinstance(amax, tuple):
                    amax = amax[0]
                amax = jnp.asarray(amax, jnp.float32).reshape(val.shape)
                out[key] = jnp.where(amax == 0, 1.0,
                                     amax * margin / 127.0)
            else:
                out[key] = val
        return out

    return graft(params, inter)


def quantize_and_calibrate(dyn_model, params, calib_pixels,
                           tower_key: Optional[str] = None,
                           margin: float = 1.0):
    """The full int8 conversion recipe in one call.

    Quantizes the tower kernels per output channel, runs ``dyn_model``
    (the SAME architecture constructed with ``quant=True``) once over
    ``calib_pixels`` (CLIP-normalized f32) to freeze activation scales,
    and returns the params tree ready for the ``quant='static'`` model.
    ``tower_key`` names the tower subtree when the tower is nested
    (e.g. ``"vision"`` inside SuperGuessr params); None quantizes the
    whole tree (bare `CLIPVisionTower` params).

    Single implementation shared by `cli serve/evaluate --quant`,
    `bench.py` (BENCH_QUANT=1) and `scripts/bench_serve.py` so the
    benchmarks measure exactly the serving recipe.
    """
    if tower_key is None:
        qparams = quantize_tower_params(params)
    else:
        qparams = dict(params)
        qparams[tower_key] = quantize_tower_params(params[tower_key])
    return calibrate_act_scales(dyn_model, qparams, calib_pixels,
                                margin=margin)
