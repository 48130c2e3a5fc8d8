"""Golden parity tests: pigeon_tpu Flax CLIP vs HuggingFace torch CLIP.

The reference's backbone is HF CLIP (`models/clip_embedder.py:25-26`); these
tests load a tiny random-init torch CLIP, import its weights through
`hf_import`, and require output agreement to float tolerance — the strongest
available check that our towers implement the same function.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import pigeon_tpu.config as cfg_lib
from pigeon_tpu.models import (
    CLIPModel,
    CLIPTextTower,
    CLIPVisionTower,
    import_clip_params,
    import_text_tower_params,
    import_vision_tower_params,
)
from pigeon_tpu.models.embedder import token_mean_embedding

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY_VISION = dict(image_size=32, patch_size=8, hidden_size=32,
                   intermediate_size=64, num_hidden_layers=2,
                   num_attention_heads=4, projection_dim=16)
TINY_TEXT = dict(vocab_size=99, hidden_size=32, intermediate_size=64,
                 num_hidden_layers=2, num_attention_heads=4,
                 max_position_embeddings=16, projection_dim=16,
                 eos_token_id=98, bos_token_id=97, pad_token_id=96)


def tiny_vision_cfg() -> cfg_lib.VisionConfig:
    return cfg_lib.VisionConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, projection_dim=16)


def tiny_text_cfg() -> cfg_lib.TextConfig:
    return cfg_lib.TextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, max_position_embeddings=16, projection_dim=16)


@pytest.fixture(scope="module")
def hf_vision():
    torch.manual_seed(0)
    cfg = transformers.CLIPVisionConfig(**TINY_VISION)
    model = transformers.CLIPVisionModel(cfg).eval()
    return model


@pytest.fixture(scope="module")
def hf_text():
    torch.manual_seed(1)
    cfg = transformers.CLIPTextConfig(**TINY_TEXT)
    model = transformers.CLIPTextModel(cfg).eval()
    return model


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(42)
    return rng.normal(size=(3, 3, 32, 32)).astype(np.float32)  # NCHW


@pytest.fixture(scope="module")
def token_ids():
    rng = np.random.default_rng(7)
    ids = rng.integers(1, 90, size=(3, 12)).astype(np.int32)
    ids[:, 0] = 97           # BOS
    ids[0, 5] = 98           # EOS mid-sequence (first-EOS pooling check)
    ids[:, -1] = 98          # EOS at end
    return ids


class TestVisionParity:
    def test_last_hidden_and_pooled(self, hf_vision, images):
        with torch.no_grad():
            out = hf_vision(pixel_values=torch.from_numpy(images))
        params = import_vision_tower_params(
            hf_vision.state_dict(), num_layers=2)
        tower = CLIPVisionTower(tiny_vision_cfg())
        last, pooled = tower.apply(
            {"params": params}, jnp.asarray(images.transpose(0, 2, 3, 1)))

        np.testing.assert_allclose(
            np.asarray(last), out.last_hidden_state.numpy(),
            atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(pooled), out.pooler_output.numpy(),
            atol=2e-5, rtol=1e-4)

    def test_token_mean_embedding_semantics(self, hf_vision, images):
        # The PIGEON embedding = mean over tokens of last_hidden_state,
        # NOT pooled CLS (`models/clip_embedder.py:63-66`).
        with torch.no_grad():
            ref = hf_vision(pixel_values=torch.from_numpy(images)) \
                .last_hidden_state.mean(dim=1).numpy()
        params = import_vision_tower_params(
            hf_vision.state_dict(), num_layers=2)
        last, _ = CLIPVisionTower(tiny_vision_cfg()).apply(
            {"params": params}, jnp.asarray(images.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(token_mean_embedding(last)), ref, atol=2e-5, rtol=1e-4)


class TestTextParity:
    def test_last_hidden_and_pooled(self, hf_text, token_ids):
        with torch.no_grad():
            out = hf_text(input_ids=torch.from_numpy(token_ids.astype(np.int64)))
        params = import_text_tower_params(hf_text.state_dict(), num_layers=2)
        tower = CLIPTextTower(tiny_text_cfg(), eos_token_id=98)
        last, pooled = tower.apply(
            {"params": params}, jnp.asarray(token_ids))

        np.testing.assert_allclose(
            np.asarray(last), out.last_hidden_state.numpy(),
            atol=2e-5, rtol=1e-4)
        # Row 0 has EOS at position 5 — checks FIRST-EOS pooling.
        np.testing.assert_allclose(
            np.asarray(pooled), out.pooler_output.numpy(),
            atol=2e-5, rtol=1e-4)


class TestFullClipParity:
    def test_logits_and_loss(self, images, token_ids):
        torch.manual_seed(3)
        cfg = transformers.CLIPConfig(
            text_config=TINY_TEXT, vision_config=TINY_VISION,
            projection_dim=16)
        hf = transformers.CLIPModel(cfg).eval()
        with torch.no_grad():
            out = hf(input_ids=torch.from_numpy(token_ids.astype(np.int64)),
                     pixel_values=torch.from_numpy(images),
                     return_loss=True)

        params = import_clip_params(hf.state_dict(), 2, 2)
        model = CLIPModel(tiny_vision_cfg(), tiny_text_cfg(),
                          eos_token_id=98)
        ours = model.apply({"params": params},
                           jnp.asarray(images.transpose(0, 2, 3, 1)),
                           jnp.asarray(token_ids), return_loss=True)

        np.testing.assert_allclose(
            np.asarray(ours["logits_per_image"]),
            out.logits_per_image.numpy(), atol=5e-5, rtol=1e-4)
        np.testing.assert_allclose(
            float(ours["loss"]), out.loss.item(), atol=5e-5)


class TestDtypeAndJit:
    def test_bf16_close_to_f32(self, hf_vision, images):
        params = import_vision_tower_params(
            hf_vision.state_dict(), num_layers=2)
        x = jnp.asarray(images.transpose(0, 2, 3, 1))
        f32, _ = CLIPVisionTower(tiny_vision_cfg()).apply(
            {"params": params}, x)
        bf16, _ = CLIPVisionTower(
            tiny_vision_cfg(), dtype=jnp.bfloat16).apply(
            {"params": params}, x)
        # bf16 compute with f32 params should track f32 to ~1e-2.
        np.testing.assert_allclose(
            np.asarray(bf16, dtype=np.float32), np.asarray(f32),
            atol=5e-2, rtol=5e-2)

    def test_jit_compiles(self, hf_vision, images):
        import jax
        params = import_vision_tower_params(
            hf_vision.state_dict(), num_layers=2)
        tower = CLIPVisionTower(tiny_vision_cfg())
        x = jnp.asarray(images.transpose(0, 2, 3, 1))
        eager, _ = tower.apply({"params": params}, x)
        jitted, _ = jax.jit(
            lambda p, v: tower.apply({"params": p}, v))(params, x)
        np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager),
                                   atol=1e-5)


class TestSuperGuessrCheckpointImport:
    def test_reference_head_checkpoint_roundtrip(self, hf_vision, images):
        """A reference-style SuperGuessr state dict (base_model.* CLIP +
        torch head linears) imports onto our SuperGuessr and reproduces the
        torch head outputs."""
        import jax
        import torch as t

        from pigeon_tpu.config import HeadConfig
        from pigeon_tpu.models.hf_import import (
            import_super_guessr_params,
            merge_params,
        )
        from pigeon_tpu.models.super_guessr import SuperGuessr

        num_cells = 9
        t.manual_seed(5)
        cell_layer = t.nn.Linear(32, num_cells)
        mt_head = t.nn.Linear(32, 6)
        climate = t.nn.Linear(32, 28)
        state = {f"base_model.{k}": v
                 for k, v in hf_vision.state_dict().items()}
        state.update({
            "cell_layer.weight": cell_layer.weight,
            "cell_layer.bias": cell_layer.bias,
            "multi_task_head.weight": mt_head.weight,
            "multi_task_head.bias": mt_head.bias,
            "climate_layer.weight": climate.weight,
            "climate_layer.bias": climate.bias,
        })

        cfg = HeadConfig(num_cells=num_cells, embed_dim=32, multi_task=True,
                         predict_month=True)  # month layer NOT in ckpt
        model = SuperGuessr(tiny_vision_cfg(), cfg)
        x = jnp.asarray(images.transpose(0, 2, 3, 1))
        init = model.init(jax.random.PRNGKey(0), x)["params"]
        loaded = import_super_guessr_params(state, vision_layers=2)
        params = merge_params(init, loaded)
        out = model.apply({"params": params}, x)

        # Torch reference: token-mean embedding -> head linears.
        with torch.no_grad():
            emb = hf_vision(pixel_values=torch.from_numpy(images)) \
                .last_hidden_state.mean(1)
            ref_logits = cell_layer(emb).numpy()
            ref_mt = mt_head(emb).numpy()
        np.testing.assert_allclose(np.asarray(out.logits), ref_logits,
                                   atol=3e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out.preds_mt), ref_mt,
                                   atol=3e-5, rtol=1e-4)
        # Month head (absent from ckpt) keeps its initialization.
        assert out.preds_month.shape == (3, 12)

    def test_merge_shape_mismatch_raises(self):
        from pigeon_tpu.models.hf_import import merge_params

        with pytest.raises(ValueError, match="shape mismatch"):
            merge_params({"a": np.zeros((2, 2))}, {"a": np.zeros((3, 3))})
