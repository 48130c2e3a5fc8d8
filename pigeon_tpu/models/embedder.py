"""Image embedding semantics: token-mean of the vision tower.

The single most parity-critical line in the whole pipeline: the reference
embeds images as the MEAN of `last_hidden_state` over all 577 tokens — NOT
the pooled CLS (`models/clip_embedder.py:63-66`). Every downstream artifact
(geocell head inputs, prototypes, refinement distances) is defined in this
embedding space.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pigeon_tpu.config import VisionConfig
from pigeon_tpu.models.clip import CLIPVisionTower


def token_mean_embedding(last_hidden_state):
    """``(B, S, D) -> (B, D)`` mean over tokens, accumulated in f32."""
    return jnp.mean(last_hidden_state.astype(jnp.float32), axis=1)


class ClipEmbedder(nn.Module):
    """Frozen-style CLIP embedder producing token-mean embeddings.

    Functional analogue of the reference's `CLIPEmbedding`
    (`models/clip_embedder.py:10-66`): vision tower forward + token mean.
    Panorama batching is the caller's job — fold views into the batch axis
    ``(B, 4, H, W, 3) -> (4B, H, W, 3)`` and unfold after (see
    `models/geocell_head.py`), which keeps the MXU batch large.
    """

    config: VisionConfig
    dtype: Any = jnp.float32
    attn_impl: str = "xla"
    quant: Any = False  # False | True (dynamic act) | "static" (serving)
    remat: Any = False  # False|True("full")|"attn_out"|"attn_kernel"|"none"

    @nn.compact
    def __call__(self, pixel_values):
        last_hidden, _ = CLIPVisionTower(
            self.config, dtype=self.dtype, attn_impl=self.attn_impl,
            quant=self.quant, remat=self.remat,
            name="vision")(pixel_values)
        return token_mean_embedding(last_hidden)
