"""Generic (non-CLIP) ViT image embedder.

The reference imports and uses a `VITEmbedding` class that is NOT defined
anywhere in its release (`run.py:13,132` — a latent crash). This implements
the capability for real: a standard ViT encoder (google/vit-style — biased
conv patch embed, GELU MLPs, final LayerNorm, CLS or token-mean pooling)
sharing the framework's `TransformerStack`, with an HF weight importer for
`ViTModel` checkpoints.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from pigeon_tpu.config import VisionConfig
from pigeon_tpu.models.clip import TransformerStack


class ViTEmbedder(nn.Module):
    """Standard ViT encoder producing image embeddings.

    Differences vs the CLIP vision tower: patch conv has a bias, there is
    no pre-LN before the encoder, MLPs use exact GELU, and the final
    LayerNorm applies to ALL tokens before pooling.
    """

    config: VisionConfig
    dtype: Any = jnp.float32
    pool: str = "cls"            # 'cls' | 'mean'
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.config
        b = pixel_values.shape[0]

        from pigeon_tpu.models.clip import PatchEmbed

        patches = PatchEmbed(
            features=cfg.hidden_size,
            patch_size=cfg.patch_size,
            use_bias=True,
            dtype=self.dtype,
            name="patch_embed",
        )(pixel_values.astype(self.dtype))

        cls = self.param("cls_token", nn.initializers.zeros,
                         (cfg.hidden_size,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype),
                              (b, 1, cfg.hidden_size)), patches], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (cfg.seq_len, cfg.hidden_size), jnp.float32)
        x = x + pos.astype(self.dtype)

        x = TransformerStack(
            num_layers=cfg.num_layers,
            num_heads=cfg.num_heads,
            intermediate_size=cfg.intermediate_size,
            hidden_act="gelu",
            layer_norm_eps=cfg.layer_norm_eps,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="encoder",
        )(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         param_dtype=jnp.float32, name="final_ln")(x)

        if self.pool == "cls":
            return x[:, 0].astype(jnp.float32)
        return jnp.mean(x.astype(jnp.float32), axis=1)


def import_vit_params(state: Mapping[str, object], num_layers: int) -> Dict:
    """HF `ViTModel` state dict -> `ViTEmbedder` params.

    Handles google/vit naming: ``vit.``-prefixed or bare ``embeddings.*`` /
    ``encoder.layer.{i}.*`` / ``layernorm.*``.
    """

    def np32(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().float().numpy()
        return np.asarray(t, dtype=np.float32)

    s = dict(state)
    if any(k.startswith("vit.") for k in s):
        s = {k[4:]: v for k, v in s.items() if k.startswith("vit.")}

    def stacked(fmt, transform=lambda x: x):
        return np.stack([transform(np32(s[fmt.format(i=i)]))
                         for i in range(num_layers)])

    t = lambda w: w.T  # noqa: E731
    pre = "encoder.layer.{i}."
    layers = {
        "ln1": {"scale": stacked(pre + "layernorm_before.weight"),
                "bias": stacked(pre + "layernorm_before.bias")},
        "ln2": {"scale": stacked(pre + "layernorm_after.weight"),
                "bias": stacked(pre + "layernorm_after.bias")},
        "attn": {
            "q_proj": {"kernel": stacked(
                pre + "attention.attention.query.weight", t),
                "bias": stacked(pre + "attention.attention.query.bias")},
            "k_proj": {"kernel": stacked(
                pre + "attention.attention.key.weight", t),
                "bias": stacked(pre + "attention.attention.key.bias")},
            "v_proj": {"kernel": stacked(
                pre + "attention.attention.value.weight", t),
                "bias": stacked(pre + "attention.attention.value.bias")},
            "out_proj": {"kernel": stacked(
                pre + "attention.output.dense.weight", t),
                "bias": stacked(pre + "attention.output.dense.bias")},
        },
        "fc1": {"kernel": stacked(pre + "intermediate.dense.weight", t),
                "bias": stacked(pre + "intermediate.dense.bias")},
        "fc2": {"kernel": stacked(pre + "output.dense.weight", t),
                "bias": stacked(pre + "output.dense.bias")},
    }
    return {
        "patch_embed": {
            "kernel": np32(
                s["embeddings.patch_embeddings.projection.weight"])
            .transpose(2, 3, 1, 0),
            "bias": np32(s["embeddings.patch_embeddings.projection.bias"])},
        "cls_token": np32(s["embeddings.cls_token"]).reshape(-1),
        "pos_embed": np32(s["embeddings.position_embeddings"])[0],
        "encoder": {"layers": layers},
        "final_ln": {"scale": np32(s["layernorm.weight"]),
                     "bias": np32(s["layernorm.bias"])},
    }
