"""Composition parity scenario 4: the contrastive PRETRAIN lifecycle.

Complements `test_composition_parity.py` (scenarios 1-3: head lifecycle,
full PIGEON panorama/multi-task, embed sweep): here the PRODUCT pretrain
path — `train/modes.py::make_pretrain_step` + `pretrain` driver (jitted
step, optax AdamW chain, optional `optax.MultiSteps` accumulation) — runs
the same tiny CLIP from the same initial weights and batch schedule as an
independent torch twin of the reference semantics (HF `Trainer.train` on
`CLIPModel(return_loss=True)`, `training/train_modes.py:30-64`), and the
per-step loss trajectories, learned logit scale, and post-training
embeddings must agree.

Per-function parity (one forward/loss, `test_clip_parity.py`) cannot catch
optimizer-chain or accumulation composition bugs; this can.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pigeon_tpu.config import TextConfig, VisionConfig
from pigeon_tpu.models import CLIPModel, import_clip_params
from pigeon_tpu.models.embedder import token_mean_embedding
from pigeon_tpu.train.modes import (
    make_pretrain_step,
    make_retrieval_probe,
    pretrain,
)
from pigeon_tpu.train.train_loop import TrainState, adamw

from tests.reference_twin import pretrain_clip_torch

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY_VISION = dict(image_size=32, patch_size=8, hidden_size=32,
                   intermediate_size=64, num_hidden_layers=2,
                   num_attention_heads=4, projection_dim=16)
TINY_TEXT = dict(vocab_size=99, hidden_size=32, intermediate_size=64,
                 num_hidden_layers=2, num_attention_heads=4,
                 max_position_embeddings=16, projection_dim=16,
                 eos_token_id=98, bos_token_id=97, pad_token_id=96)

N, SEQ, BS, EPOCHS = 48, 12, 16, 8
LR = 1e-3


def _tiny_cfgs():
    vis = VisionConfig(image_size=32, patch_size=8, hidden_size=32,
                       intermediate_size=64, num_layers=2, num_heads=4,
                       projection_dim=16)
    txt = TextConfig(vocab_size=99, hidden_size=32, intermediate_size=64,
                     num_layers=2, num_heads=4, max_position_embeddings=16,
                     projection_dim=16)
    return vis, txt


def _data():
    rng = np.random.default_rng(11)
    images = rng.normal(scale=0.7, size=(N, 3, 32, 32)).astype(np.float32)
    ids = rng.integers(1, 90, size=(N, SEQ)).astype(np.int32)
    ids[:, 0] = 97
    ids[:, -1] = 98
    return images, ids


def _fresh_hf():
    torch.manual_seed(20)
    cfg = transformers.CLIPConfig(text_config=TINY_TEXT,
                                  vision_config=TINY_VISION,
                                  projection_dim=16)
    return transformers.CLIPModel(cfg)


def _run_product(images, ids, accum_steps: int):
    """The REAL pigeon_tpu pretrain path, seeded with the torch weights."""
    vis, txt = _tiny_cfgs()
    model = CLIPModel(vis, txt, eos_token_id=98)
    params = import_clip_params(_fresh_hf().state_dict(), 2, 2)
    opt = adamw(LR, weight_decay=0.0, b1=0.9, b2=0.98, eps=1e-6,
                max_grad_norm=1.0, accum_steps=accum_steps)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt.init(params))
    step = make_pretrain_step(model, opt)

    losses = []

    def batches_fn(epoch):
        for start in range(0, N, BS):
            sl = slice(start, start + BS)
            yield {
                "pixel_values": jnp.asarray(
                    images[sl].transpose(0, 2, 3, 1)),
                "input_ids": jnp.asarray(ids[sl]),
            }

    state = pretrain(model, state, step, batches_fn, num_epochs=EPOCHS,
                     log_fn=lambda s, m: losses.append(float(m["loss"])))
    return model, state, losses


def _run_twin(images, ids, accum_steps: int):
    hf = _fresh_hf()
    losses = pretrain_clip_torch(hf, images, ids, lr=LR, epochs=EPOCHS,
                                 batch_size=BS, accum_steps=accum_steps)
    return hf, losses


class TestPretrainLifecycleParity:
    @pytest.fixture(scope="class")
    def both(self):
        images, ids = _data()
        model, state, losses = _run_product(images, ids, accum_steps=1)
        hf, twin_losses = _run_twin(images, ids, accum_steps=1)
        return images, ids, model, state, losses, hf, twin_losses

    def test_loss_trajectory_matches_twin(self, both):
        _, _, _, _, losses, _, twin_losses = both
        assert len(losses) == len(twin_losses) == EPOCHS * (N // BS)
        np.testing.assert_allclose(losses, twin_losses, rtol=2e-3,
                                   atol=2e-3)

    def test_training_actually_learned(self, both):
        _, _, _, _, losses, _, twin_losses = both
        # in-batch InfoNCE at bs16 starts near ln(16)=2.77
        assert losses[-1] < losses[0] - 0.5
        assert twin_losses[-1] < twin_losses[0] - 0.5

    def test_logit_scale_matches(self, both):
        _, _, _, state, _, hf, _ = both
        ours = float(np.asarray(state.params["logit_scale"]))
        assert ours == pytest.approx(float(hf.logit_scale.detach()),
                                     abs=2e-3)

    def test_posttrain_embeddings_match(self, both):
        images, ids, model, state, _, hf, _ = both
        # The downstream contract: token-MEAN vision embeddings
        # (`models/clip_embedder.py:63-66`) from the PRETRAINED tower.
        out = model.apply({"params": state.params},
                          jnp.asarray(images.transpose(0, 2, 3, 1)),
                          jnp.asarray(ids))
        with torch.no_grad():
            ref = hf.vision_model(
                pixel_values=torch.from_numpy(images)
            ).last_hidden_state.mean(dim=1).numpy()
        params = {"params": state.params["vision"]}
        from pigeon_tpu.models import CLIPVisionTower

        vis, _ = _tiny_cfgs()
        last, _pooled = CLIPVisionTower(vis).apply(
            params, jnp.asarray(images.transpose(0, 2, 3, 1)))
        emb = np.asarray(token_mean_embedding(last))
        cos = np.sum(emb * ref, -1) / (
            np.linalg.norm(emb, axis=-1) * np.linalg.norm(ref, axis=-1))
        assert cos.min() > 0.9995, cos.min()
        # and the contrastive logits agree end to end
        with torch.no_grad():
            ref_logits = hf(
                input_ids=torch.from_numpy(ids.astype(np.int64)),
                pixel_values=torch.from_numpy(images)
            ).logits_per_image.numpy()
        np.testing.assert_allclose(np.asarray(out["logits_per_image"]),
                                   ref_logits, atol=5e-2, rtol=2e-3)

    def test_retrieval_probe_matches_twin_accuracy(self, both):
        images, ids, model, state, _, hf, _ = both
        probe = make_retrieval_probe(model)
        acc = float(probe(state.params,
                          jnp.asarray(images.transpose(0, 2, 3, 1)),
                          jnp.asarray(ids)))
        with torch.no_grad():
            logits = hf(
                input_ids=torch.from_numpy(ids.astype(np.int64)),
                pixel_values=torch.from_numpy(images)).logits_per_image
        ref_acc = float((logits.argmax(-1).numpy()
                         == np.arange(N)).mean())
        assert acc == pytest.approx(ref_acc, abs=1.0 / N + 1e-9)


class TestGradAccumulationParity:
    """`optax.MultiSteps` accumulation == the reference's HF-Trainer
    loss/k + step-every-k semantics (`config.py:121,155`)."""

    def test_accum2_trajectory_matches_twin(self):
        images, ids = _data()
        _, _, losses = _run_product(images, ids, accum_steps=2)
        _, twin_losses = _run_twin(images, ids, accum_steps=2)
        np.testing.assert_allclose(losses, twin_losses, rtol=2e-3,
                                   atol=2e-3)
        assert losses[-1] < losses[0] - 0.3
