"""Tests for the data pipeline: CLIP preprocessing parity, crops, headings,
caption synthesis, batching."""

import json
import os

import numpy as np
import pytest

from pigeon_tpu.data import (
    BenchmarkDataset,
    TabularImageDataset,
    clip_preprocess_batch,
    clip_preprocess_pil,
    fov_center_crop,
    heading_to_sincos,
    iter_batches,
    min_side_center_crop,
)
from pigeon_tpu.data.captions import (
    compass_direction,
    streetview_caption,
    yfcc_caption,
)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

RNG = np.random.default_rng(5)


def random_image(w=500, h=400):
    return Image.fromarray(
        RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8))


class TestClipPreprocessParity:
    def test_matches_hf_processor(self):
        transformers = pytest.importorskip("transformers")
        proc = transformers.CLIPImageProcessor(
            size={"shortest_edge": 224},
            crop_size={"height": 224, "width": 224})
        img = random_image(320, 256)
        ref = proc(images=img, return_tensors="np")["pixel_values"][0]
        ours = clip_preprocess_pil(img, image_size=224)
        # ref is CHW; ours is HWC
        np.testing.assert_allclose(ours.transpose(2, 0, 1), ref, atol=1e-5)

    def test_square_input(self):
        transformers = pytest.importorskip("transformers")
        proc = transformers.CLIPImageProcessor(
            size={"shortest_edge": 336},
            crop_size={"height": 336, "width": 336})
        img = random_image(640, 640)
        ref = proc(images=img, return_tensors="np")["pixel_values"][0]
        ours = clip_preprocess_pil(img, image_size=336)
        np.testing.assert_allclose(ours.transpose(2, 0, 1), ref, atol=1e-5)

    def test_device_path_close(self):
        # jax path tracks the PIL path within a fraction of a std.
        img_np = RNG.integers(0, 256, size=(1, 300, 420, 3), dtype=np.uint8)
        dev = np.asarray(clip_preprocess_batch(img_np, image_size=224))[0]
        host = clip_preprocess_pil(
            Image.fromarray(img_np[0]), image_size=224)
        assert dev.shape == host.shape == (224, 224, 3)
        # Different bicubic implementations: compare loosely.
        assert np.abs(dev - host).mean() < 0.15


class TestCrops:
    def test_fov_crop_factor(self):
        # Reference factor for 96deg: arcsin(rad(45))/arcsin(rad(48)).
        img = np.zeros((618, 618, 3))
        out = fov_center_crop(img, original_fov=96)
        factor = np.arcsin(np.radians(45)) / np.arcsin(np.radians(48))
        expected = 618 - (int(np.ceil((618 - factor * 618) / 2))
                          + int(np.floor((618 - factor * 618) / 2)))
        assert out.shape[0] == expected == out.shape[1]

    def test_min_side_crop(self):
        img = RNG.normal(size=(100, 160, 3))
        out = min_side_center_crop(img)
        assert out.shape == (100, 100, 3)
        np.testing.assert_array_equal(out, img[:, 30:130])


class TestHeading:
    def test_four_views_rotate_90(self):
        h = heading_to_sincos(0.0)
        assert h.shape == (4, 2)
        # North, East, South, West as (sin, cos).
        np.testing.assert_allclose(
            h, [[0, 1], [1, 0], [0, -1], [-1, 0]], atol=1e-7)

    def test_wraps(self):
        h = heading_to_sincos(270.0)
        np.testing.assert_allclose(h[1], [0, 1], atol=1e-7)  # 270+90=360=N


class TestCaptions:
    META = {"country_name": "France", "geo_area": "Normandy",
            "town": "Bayeux", "climate_zone": "a temperate oceanic climate",
            "driving_right": True, "heading": 10.0, "month": 3}

    def test_streetview_caption_wellformed(self):
        saw_country = 0
        for seed in range(20):
            cap = streetview_caption(self.META,
                                     rng=np.random.default_rng(seed))
            assert cap and cap.endswith(".")
            saw_country += "France" in cap
        # Location sentence present ~70%+ of the time.
        assert saw_country >= 10

    def test_the_country_article(self):
        meta = dict(self.META, country_name="Netherlands")
        cap = streetview_caption(meta, rng=np.random.default_rng(0),
                                 auxiliary=False)
        assert "in the Netherlands." in cap

    def test_usa_rename(self):
        meta = dict(self.META, country_name="United States Of America")
        cap = streetview_caption(meta, rng=np.random.default_rng(0),
                                 auxiliary=False)
        assert "the United States." in cap

    def test_no_auxiliary_is_deterministic_location(self):
        meta = {"country_name": "Japan"}
        cap = streetview_caption(meta, rng=np.random.default_rng(1),
                                 auxiliary=False)
        assert cap == "A Street View photo in Japan."

    def test_yfcc_always_shows_region_town(self):
        cap = yfcc_caption(self.META, rng=np.random.default_rng(2))
        assert "close to the town of Bayeux" in cap
        assert "in the region of Normandy" in cap
        assert cap.startswith("A photo I took") or "France" in cap

    def test_yfcc_rename_truncated(self):
        meta = {"country_name": "United States Minor Outlying Isl"}
        cap = yfcc_caption(meta, rng=np.random.default_rng(0),
                           auxiliary=False)
        assert "the United States Minor Outlying Islands." in cap

    def test_compass_quantization(self):
        assert compass_direction(0) == "north"
        assert compass_direction(45) == "north"
        assert compass_direction(46) == "east"
        assert compass_direction(180) == "south"
        assert compass_direction(315) == "west"
        assert compass_direction(316) == "north"
        assert compass_direction(-10) == "north"


@pytest.fixture()
def image_dataset(tmp_path):
    """Synthetic on-disk dataset: 10 images + metadata CSV."""
    import pandas as pd

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rows = []
    for i in range(10):
        name = f"img_{i}.jpg"
        random_image(80, 64).save(img_dir / name)
        rows.append({
            "image": name, "lng": float(i * 10 - 40), "lat": float(i * 5 - 20),
            "selection": "train" if i < 8 else "val",
            "elevation": 1.0, "population": 2.0, "temp_avg": 3.0,
            "temp_diff": 4.0, "prec_avg": 5.0, "prec_diff": 6.0,
            "climate_zone_idx": i % 28, "month": i % 12, "heading": i * 36.0,
            "geocell_idx": i % 4,
        })
    csv = tmp_path / "meta.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return str(csv), str(img_dir)


class TestPipeline:
    def test_split_filter(self, image_dataset):
        csv, img_dir = image_dataset
        train = TabularImageDataset.from_csv(csv, "train", img_dir,
                                             image_size=32)
        val = TabularImageDataset.from_csv(csv, "val", img_dir,
                                           image_size=32)
        assert len(train) == 8 and len(val) == 2

    def test_iter_batches_shapes(self, image_dataset):
        csv, img_dir = image_dataset
        ds = TabularImageDataset.from_csv(csv, "train", img_dir,
                                          image_size=32)
        batches = list(iter_batches(ds, batch_size=3, num_workers=2))
        assert len(batches) == 3  # 8 samples -> 3+3+2
        b = batches[0]
        assert b["inputs"].shape == (3, 32, 32, 3)
        assert b["labels"].shape == (3, 2)
        assert b["labels_multi_task"].shape == (3, 6)
        assert b["labels_clf"].shape == (3,)
        assert b["heading"].shape == (3, 4, 2)
        assert batches[-1]["inputs"].shape[0] == 2

    def test_drop_last_and_shuffle(self, image_dataset):
        csv, img_dir = image_dataset
        ds = TabularImageDataset.from_csv(csv, "train", img_dir,
                                          image_size=32)
        batches = list(iter_batches(ds, batch_size=3, drop_last=True,
                                    shuffle=True, seed=1, num_workers=2))
        assert len(batches) == 2
        again = list(iter_batches(ds, batch_size=3, drop_last=True,
                                  shuffle=True, seed=1, num_workers=2))
        np.testing.assert_array_equal(batches[0]["labels"],
                                      again[0]["labels"])

    def test_holdout_slice(self, image_dataset):
        from pigeon_tpu.data.pipeline import holdout

        csv, img_dir = image_dataset
        ds = TabularImageDataset.from_csv(csv, "train", img_dir,
                                          image_size=32)
        sub = holdout(ds, slice(2, 6))
        assert len(sub) == 4
        np.testing.assert_array_equal(sub.labels_lla(),
                                      ds.labels_lla()[2:6])

    def test_benchmark_registry(self, image_dataset, tmp_path):
        csv, img_dir = image_dataset
        registry = tmp_path / "benchmarks.json"
        registry.write_text(json.dumps(
            {"tiny": {"meta": csv, "images": img_dir}}))
        ds = BenchmarkDataset("tiny", str(registry), image_size=32)
        assert len(ds) == 10
        with pytest.raises(KeyError):
            BenchmarkDataset("nope", str(registry))


class TestRaggedOptionalFields:
    def test_partial_heading_column_dropped(self, image_dataset):
        import pandas as pd

        csv, img_dir = image_dataset
        ds = TabularImageDataset.from_csv(csv, "train", img_dir,
                                          image_size=32)
        # Half the rows lose their heading/month -> the key must be dropped
        # from affected batches instead of crashing np.stack.
        ds.df.loc[ds.df.index[::2], "heading"] = np.nan
        ds.df.loc[ds.df.index[::2], "month"] = np.nan
        batches = list(iter_batches(ds, batch_size=4, num_workers=2))
        for b in batches:
            assert b["inputs"].shape[0] == b["labels"].shape[0]
            if "heading" in b:
                assert b["heading"].shape[0] == b["inputs"].shape[0]


class TestUint8WireFormat:
    """uint8 host pipeline + device normalization must equal the f32
    host-normalized path (the steps dtype-dispatch on uint8)."""

    def test_train_and_eval_steps_match_f32_path(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from PIL import Image

        from pigeon_tpu.config import HeadConfig, VisionConfig
        from pigeon_tpu.data.pipeline import TabularImageDataset, iter_batches
        from pigeon_tpu.models.super_guessr import SuperGuessr
        from pigeon_tpu.train import create_train_state, make_eval_step, \
            make_train_step
        from pigeon_tpu.train.train_loop import adamw

        rng = np.random.default_rng(11)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        rows = []
        for i in range(8):
            Image.fromarray(rng.integers(0, 255, (40, 48, 3),
                                         dtype=np.uint8)).save(
                img_dir / f"{i}.png")
            rows.append({"image": f"{i}.png", "lng": float(i * 10 - 40),
                         "lat": float(i * 5 - 20), "geocell_idx": i % 3})
        import pandas as pd

        df = pd.DataFrame(rows)

        tiny = VisionConfig(image_size=32, patch_size=8, hidden_size=32,
                            intermediate_size=64, num_layers=2, num_heads=4)
        head = HeadConfig(num_cells=3, embed_dim=32, panorama=False)
        model = SuperGuessr(tiny, head)
        cells = np.array([[-40., -20.], [0., 0.], [30., 15.]], np.float32)
        opt = adamw(1e-3)
        state = create_train_state(jax.random.PRNGKey(0), model, opt,
                                   (jnp.zeros((2, 32, 32, 3)),))
        step = make_train_step(model, opt, head, cells, donate=False)
        eval_step = make_eval_step(model, head, cells)

        def batch_for(normalize):
            ds = TabularImageDataset(df, str(img_dir), image_size=32,
                                     normalize=normalize)
            return next(iter_batches(ds, 8, num_workers=2))

        b_f32 = {k: jnp.asarray(v) for k, v in batch_for(True).items()}
        b_u8 = {k: jnp.asarray(v) for k, v in batch_for(False).items()}
        assert b_u8["inputs"].dtype == jnp.uint8

        _, m_f32 = step(state, b_f32, jax.random.PRNGKey(3))
        _, m_u8 = step(state, b_u8, jax.random.PRNGKey(3))
        assert float(m_f32["loss"]) == pytest.approx(float(m_u8["loss"]),
                                                     rel=1e-5)

        e_f32, p_f32 = eval_step(state.params, b_f32)
        e_u8, p_u8 = eval_step(state.params, b_u8)
        assert float(e_f32["loss"]) == pytest.approx(float(e_u8["loss"]),
                                                     rel=1e-5)
        np.testing.assert_allclose(np.asarray(p_f32["pred_lla"]),
                                   np.asarray(p_u8["pred_lla"]), atol=1e-4)

    def test_embed_step_matches(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from pigeon_tpu.config import VisionConfig
        from pigeon_tpu.models.embedder import ClipEmbedder
        from pigeon_tpu.train.embed import make_embed_step
        from pigeon_tpu.data.image_ops import normalize_images

        tiny = VisionConfig(image_size=32, patch_size=8, hidden_size=32,
                            intermediate_size=64, num_layers=2, num_heads=4)
        model = ClipEmbedder(tiny)
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 32, 32, 3)))["params"]
        step = make_embed_step(model, params)
        rng = np.random.default_rng(5)
        u8 = rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8)
        out_u8 = np.asarray(step(jnp.asarray(u8)))
        out_f32 = np.asarray(step(jnp.asarray(normalize_images(u8))))
        np.testing.assert_allclose(out_u8, out_f32, atol=1e-5)


class TestProducerErrorPropagation:
    def test_corrupt_image_raises_in_consumer(self, image_dataset):
        """r8: a decode failure in the producer THREAD must re-raise at
        the consumer's iteration site — before this, the thread died,
        the stream silently ended, and `predict` wrote 0 rows with
        rc 0 (a training epoch would silently truncate the same way)."""
        import pandas as pd

        csv, img_dir = image_dataset
        with open(os.path.join(img_dir, "img_3.jpg"), "wb") as f:
            f.write(b"\x00\x01 not a jpeg \x02" * 8)
        ds = TabularImageDataset(pd.read_csv(csv), image_dir=img_dir,
                                 image_size=32)
        with pytest.raises(Exception, match="img_3"):
            for _ in iter_batches(ds, batch_size=4, num_workers=2):
                pass
