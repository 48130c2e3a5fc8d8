"""SuperGuessr: the composed geolocation model (vision tower + geocell head).

Functional analogue of the reference's `SuperGuessr` with a base model
(`models/super_guessr.py:30-483`), composed the TPU way: the panorama's four
views are folded into the batch axis for the tower forward — one big MXU
batch instead of the reference's reshape dance — and unfolded for
aggregation.

Use :class:`SuperGuessr` when training end-to-end from pixels; use
:class:`~pigeon_tpu.models.geocell_head.GeocellHead` directly when training
on precomputed embeddings (the reference's `finetune_on_embeddings` mode,
`training/train_modes.py:110-133`).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pigeon_tpu.config import HeadConfig, VisionConfig
from pigeon_tpu.models.clip import CLIPVisionTower
from pigeon_tpu.models.embedder import token_mean_embedding
from pigeon_tpu.models.geocell_head import GeocellHead, GeocellOutput


class SuperGuessr(nn.Module):
    """End-to-end pixels -> geocell logits model.

    Input pixel layout:
      * single image: ``(B, H, W, 3)``;
      * panorama: ``(B, 4, H, W, 3)`` — folded to ``(4B, H, W, 3)`` for the
        tower (keeps the MXU batch large), unfolded to ``(B, 4, D)`` for
        aggregation (reference reshape at `super_guessr.py:386-388,404-405`).
    """

    vision_config: VisionConfig
    head_config: HeadConfig
    dtype: Any = jnp.float32
    attn_impl: str = "xla"
    quant: bool = False  # int8 W8A8 tower matmuls (serving; models/quant.py)
    remat: Any = False  # False|True("full")|"attn_out"|"attn_kernel"|"none"

    @nn.compact
    def __call__(self, pixel_values, heading=None,
                 deterministic: bool = True) -> GeocellOutput:
        cfg = self.head_config
        if cfg.panorama:
            if pixel_values.ndim != 5 or pixel_values.shape[1] != 4:
                raise ValueError(
                    "panorama input must be (B, 4, H, W, 3); got "
                    f"{pixel_values.shape}")
            b = pixel_values.shape[0]
            pixels = pixel_values.reshape(b * 4, *pixel_values.shape[2:])
        else:
            b = pixel_values.shape[0]
            pixels = pixel_values

        last_hidden, _ = CLIPVisionTower(
            self.vision_config, dtype=self.dtype, attn_impl=self.attn_impl,
            quant=self.quant, remat=self.remat, name="vision")(pixels)
        embedding = token_mean_embedding(last_hidden)

        if cfg.panorama:
            embedding = embedding.reshape(b, 4, -1)

        return GeocellHead(cfg, dtype=self.dtype, name="head")(
            embedding, heading=heading, deterministic=deterministic)


def trainable_last_layer_mask(params, num_layers: int,
                              vision_key: str = "vision"):
    """Per-layer gradient mask: train only the LAST encoder layer of the
    vision tower (+ everything outside it).

    The reference freezes all but the last CLIP encoder layer when
    fine-tuning the head on top of pretrained CLIP
    (`models/super_guessr.py:155-160`). With the `nn.scan` stacked layout a
    "layer freeze" is a ``(L, 1, ...)`` broadcast multiply on gradients:
    mask[l] = 0 for l < L-1, 1 for the last layer.

    Returns a pytree of the same structure as ``params`` with float mask
    leaves, to be applied as ``grads = tree_map(mul, grads, mask)``.
    """
    import jax

    layer_mask = jnp.arange(num_layers) == num_layers - 1

    def mask_leaf(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if vision_key in keys and "layers" in keys:
            shape = (num_layers,) + (1,) * (leaf.ndim - 1)
            return layer_mask.astype(leaf.dtype).reshape(shape)
        # Everything else (embeddings, pre/post LN, the head) stays
        # trainable — the reference freezes ONLY encoder.layers[:-1]
        # (`super_guessr.py:159-160`).
        return jnp.ones((1,) * leaf.ndim, dtype=leaf.dtype)

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def apply_grad_mask(grads, mask):
    """Multiply gradients by a broadcastable mask pytree."""
    import jax

    return jax.tree_util.tree_map(lambda g, m: g * m, grads, mask)
