"""Segmented vision-tower forward: split the encoder across executables.

Motivation (docs/PERF.md): this environment's remote XLA compile time grows
superlinearly with encoder depth — the 24-layer ViT-L forward can exceed
the compile service's timeout, while shallower programs compile fine. A
segmented forward runs the SAME model (identical math, all 24 layers) as K
jitted pieces: piece 0 = patch/pos embedding + pre-LN + layers[0:n1],
pieces 1..K-1 = further layer slices, the last one adding the token-mean
embedding and the geocell head. Layer slicing is trivial because the
encoder params are `nn.scan`-stacked (leading layer axis).

Also useful beyond the quirk: segment boundaries are natural pipeline-
parallel cut points (each segment could live on a different mesh stage).
"""

from __future__ import annotations

from typing import Any, Callable, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pigeon_tpu.config import HeadConfig, VisionConfig
from pigeon_tpu.models.clip import PatchEmbed, TransformerStack
from pigeon_tpu.models.embedder import token_mean_embedding


class _FrontSegment(nn.Module):
    """Embeddings + pre-LN + the first slice of encoder layers."""

    config: VisionConfig
    num_layers: int
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.config
        b = pixel_values.shape[0]
        patches = PatchEmbed(cfg.hidden_size, cfg.patch_size,
                             use_bias=False, dtype=self.dtype,
                             name="patch_embed")(
            pixel_values.astype(self.dtype))
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (cfg.hidden_size,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype),
                              (b, 1, cfg.hidden_size)), patches], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (cfg.seq_len, cfg.hidden_size), jnp.float32)
        x = x + pos.astype(self.dtype)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         param_dtype=jnp.float32, name="pre_ln")(x)
        return _stack(cfg, self.num_layers, self.dtype, self.attn_impl)(x)


class _MidSegment(nn.Module):
    config: VisionConfig
    num_layers: int
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        return _stack(self.config, self.num_layers, self.dtype,
                      self.attn_impl)(x)


def _stack(cfg: VisionConfig, n: int, dtype,
           attn_impl: str = "xla") -> TransformerStack:
    return TransformerStack(
        num_layers=n, num_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        hidden_act=cfg.hidden_act, layer_norm_eps=cfg.layer_norm_eps,
        dtype=dtype, attn_impl=attn_impl, name="encoder")


def segment_boundaries(num_layers: int, segments: int) -> List[int]:
    """Split `num_layers` into `segments` near-equal slices (prefix sums)."""
    base, extra = divmod(num_layers, segments)
    sizes = [base + (1 if i < extra else 0) for i in range(segments)]
    bounds = [0]
    for s in sizes:
        bounds.append(bounds[-1] + s)
    return bounds


def build_segmented_forward(vision_cfg: VisionConfig, head_cfg: HeadConfig,
                            tower_params, head_params, segments: int,
                            dtype=jnp.bfloat16,
                            attn_impl: str = "xla") -> List[Callable]:
    """Build the list of jitted segment functions.

    Args:
        tower_params: full `CLIPVisionTower` params (stacked encoder).
        head_params: `GeocellHead` params.
        segments: number of executables to split into.

    Returns list of jitted callables; composing them in order is the full
    embed+classify forward: ``pixels -> ... -> (logits, embedding)``.
    """
    from pigeon_tpu.models.geocell_head import GeocellHead

    bounds = segment_boundaries(vision_cfg.num_layers, segments)
    layer_params = tower_params["encoder"]["layers"]

    def layer_slice(lo, hi):
        return jax.tree_util.tree_map(lambda x: x[lo:hi], layer_params)

    fns: List[Callable] = []

    front = _FrontSegment(vision_cfg, bounds[1] - bounds[0], dtype=dtype,
                          attn_impl=attn_impl)
    front_params = {
        "patch_embed": tower_params["patch_embed"],
        "cls_token": tower_params["cls_token"],
        "pos_embed": tower_params["pos_embed"],
        "pre_ln": tower_params["pre_ln"],
        "encoder": {"layers": layer_slice(bounds[0], bounds[1])},
    }

    # CRITICAL: parameters are passed as jit ARGUMENTS, never closed over —
    # closed-over arrays become HLO constants, ballooning the compiled
    # program by the full weight size (which this environment's remote
    # compile service rejects with HTTP 413; see docs/PERF.md).
    def bind(jitted, params):
        return lambda x, _f=jitted, _p=params: _f(_p, x)

    if segments == 1:
        head = GeocellHead(head_cfg, dtype=dtype)

        def whole(p, px, m=front, h=head):
            emb = token_mean_embedding(
                m.apply({"params": p["tower"]}, px))
            out = h.apply({"params": p["head"]}, emb)
            return out.logits, emb

        return [bind(jax.jit(whole),
                     {"tower": front_params, "head": head_params})]

    fns.append(bind(
        jax.jit(lambda p, px, m=front: m.apply({"params": p}, px)),
        front_params))

    for i in range(1, segments):
        lo, hi = bounds[i], bounds[i + 1]
        mid = _MidSegment(vision_cfg, hi - lo, dtype=dtype,
                          attn_impl=attn_impl)
        mid_params = {"encoder": {"layers": layer_slice(lo, hi)}}
        if i < segments - 1:
            fns.append(bind(
                jax.jit(lambda p, x, m=mid: m.apply({"params": p}, x)),
                mid_params))
        else:
            head = GeocellHead(head_cfg, dtype=dtype)

            def last(p, x, m=mid, h=head):
                x = m.apply({"params": p["mid"]}, x)
                emb = token_mean_embedding(x)
                out = h.apply({"params": p["head"]}, emb)
                return out.logits, emb

            fns.append(bind(jax.jit(last),
                            {"mid": mid_params, "head": head_params}))
    return fns


def run_segmented(fns: Sequence[Callable], pixels):
    x = fns[0](pixels)
    for fn in fns[1:]:
        x = fn(x)
    return x
