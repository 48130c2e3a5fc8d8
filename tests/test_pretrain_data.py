"""Tests: multi-source pretrain indexer + dataset + end-to-end pretrain step."""

import numpy as np
import pandas as pd
import pytest
import jax
import jax.numpy as jnp

from pigeon_tpu.data.pretrain import PretrainDataset, PretrainIndexer

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

RNG = np.random.default_rng(2)


class TestIndexer:
    def test_cutoff_arithmetic(self):
        sources = pd.Series(["o1", "o2", "v1", "l1"])
        ix = PretrainIndexer(sources)
        assert len(ix) == 2 * 4 + 1 + 5
        # Panorama items: rows 0-1, views 0-3, offsets 0/90/180/270.
        assert ix.lookup(0) == (0, 0, 0.0)
        assert ix.lookup(3) == (0, 3, 270.0)
        assert ix.lookup(4) == (1, 0, 0.0)
        # Single item.
        assert ix.lookup(8) == (2, 0, 0.0)
        # Landmark strips: offsets of 72 degrees.
        assert ix.lookup(9) == (3, 0, 0.0)
        assert ix.lookup(13) == (3, 4, 288.0)
        with pytest.raises(IndexError):
            ix.lookup(14)


@pytest.fixture()
def pretrain_env(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()

    def save(name, w=100, h=80):
        Image.fromarray(RNG.integers(0, 255, (h, w, 3), dtype=np.uint8)) \
            .save(img_dir / name)

    rows = []
    # One panorama row with 4 views.
    for i in range(1, 5):
        save(f"pano_{i}.jpg")
    rows.append({"source": "o", "image": "pano_1.jpg",
                 "image_2": "pano_2.jpg", "image_3": "pano_3.jpg",
                 "image_4": "pano_4.jpg", "selection": "train",
                 "country_name": "France", "geo_area": "Normandy",
                 "town": "Bayeux", "heading": 10.0, "month": 3})
    # One single row.
    save("single.jpg")
    rows.append({"source": "v", "image": "single.jpg", "selection": "train",
                 "country_name": "Japan"})
    # One landmark-strip row (wide image).
    save("strip.jpg", w=600, h=120)
    rows.append({"source": "l", "image": "strip.jpg", "selection": "train",
                 "country_name": "Brazil"})
    return pd.DataFrame(rows), str(img_dir)


class TestDataset:
    def test_items(self, pretrain_env):
        df, img_dir = pretrain_env
        ds = PretrainDataset(df, img_dir, image_size=32, augment=False,
                             strip_width=120)
        assert len(ds) == 4 + 1 + 5
        img, cap = ds.item(0)
        assert "France" in cap or cap.endswith(".")
        img, cap = ds.item(4)
        assert "Japan" in cap
        img, cap = ds.item(5)   # first landmark strip
        assert img.size[0] == 120

    def test_batches_shapes(self, pretrain_env):
        from pigeon_tpu.data.tokenizer import HashTokenizer

        df, img_dir = pretrain_env
        ds = PretrainDataset(df, img_dir, image_size=32, augment=True)
        tok = HashTokenizer(vocab_size=256, context_len=16)
        batches = list(ds.batches(tok, batch_size=4, seed=0))
        assert len(batches) == 2  # 10 items, drop_last
        assert batches[0]["pixel_values"].shape == (4, 32, 32, 3)
        assert batches[0]["input_ids"].shape == (4, 16)

    def test_deterministic_per_seed(self, pretrain_env):
        df, img_dir = pretrain_env
        ds = PretrainDataset(df, img_dir, image_size=32, seed=7)
        _, cap1 = ds.item(0)
        _, cap2 = ds.item(0)
        assert cap1 == cap2


class TestPretrainStep:
    def test_contrastive_step_descends(self, pretrain_env):
        from pigeon_tpu.config import TextConfig, VisionConfig, \
            pigeon_config
        from pigeon_tpu.data.tokenizer import HashTokenizer
        from pigeon_tpu.models.clip import CLIPModel
        from pigeon_tpu.train import create_train_state
        from pigeon_tpu.train.modes import (
            make_pretrain_step,
            make_retrieval_probe,
            pretrain_optimizer,
        )

        df, img_dir = pretrain_env
        ds = PretrainDataset(df, img_dir, image_size=32, augment=False)
        tok = HashTokenizer(vocab_size=128, context_len=12)

        vis = VisionConfig(image_size=32, patch_size=8, hidden_size=32,
                           intermediate_size=64, num_layers=2, num_heads=4,
                           projection_dim=16)
        txt = TextConfig(vocab_size=128, hidden_size=32,
                         intermediate_size=64, num_layers=2, num_heads=4,
                         max_position_embeddings=12, projection_dim=16)
        model = CLIPModel(vis, txt, eos_token_id=tok.eos_id)
        cfg = pigeon_config()
        import dataclasses

        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, pretrain_grad_accum_steps=1,
            pretrain_learning_rate=1e-3, pretrain_warmup_ratio=0.1))
        opt = pretrain_optimizer(cfg, total_steps=20)
        state = create_train_state(
            jax.random.PRNGKey(0), model, opt,
            (jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 12), jnp.int32)),
            init_kwargs={})
        step = make_pretrain_step(model, opt)

        batch = next(ds.batches(tok, batch_size=8, drop_last=False))
        dev = {"pixel_values": jnp.asarray(batch["pixel_values"]),
               "input_ids": jnp.asarray(batch["input_ids"])}
        losses = []
        for _ in range(12):
            state, metrics = step(state, dev)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]

        probe = make_retrieval_probe(model)
        acc = float(probe(state.params, dev["pixel_values"],
                          dev["input_ids"]))
        assert 0.0 <= acc <= 1.0
