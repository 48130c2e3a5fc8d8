"""Generic ViT embedder: golden parity vs HF torch ViTModel."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pigeon_tpu.config import VisionConfig
from pigeon_tpu.models.vit_embedder import ViTEmbedder, import_vit_params

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY = dict(image_size=32, patch_size=8, hidden_size=32,
            intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4)


@pytest.fixture(scope="module")
def hf_vit():
    torch.manual_seed(0)
    cfg = transformers.ViTConfig(**TINY)
    return transformers.ViTModel(cfg, add_pooling_layer=False).eval()


def our_cfg():
    # NOTE: HF ViT uses layer_norm_eps=1e-12 (vs CLIP's 1e-5).
    return VisionConfig(image_size=32, patch_size=8, hidden_size=32,
                        intermediate_size=64, num_layers=2, num_heads=4,
                        layer_norm_eps=1e-12)


class TestViTParity:
    def test_cls_embedding_matches_hf(self, hf_vit):
        images = np.random.default_rng(0).normal(
            size=(2, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            ref = hf_vit(pixel_values=torch.from_numpy(images)) \
                .last_hidden_state.numpy()
        params = import_vit_params(hf_vit.state_dict(), num_layers=2)
        model = ViTEmbedder(our_cfg(), pool="cls")
        got = model.apply({"params": params},
                          jnp.asarray(images.transpose(0, 2, 3, 1)))
        # HF last_hidden_state already has the final LN applied; CLS pool.
        np.testing.assert_allclose(np.asarray(got), ref[:, 0],
                                   atol=3e-5, rtol=1e-4)

    def test_mean_pool(self, hf_vit):
        images = np.random.default_rng(1).normal(
            size=(2, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            ref = hf_vit(pixel_values=torch.from_numpy(images)) \
                .last_hidden_state.mean(1).numpy()
        params = import_vit_params(hf_vit.state_dict(), num_layers=2)
        model = ViTEmbedder(our_cfg(), pool="mean")
        got = model.apply({"params": params},
                          jnp.asarray(images.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got), ref, atol=3e-5,
                                   rtol=1e-4)
