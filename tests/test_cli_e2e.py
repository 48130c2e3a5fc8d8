"""CLI end-to-end smoke: embed -> finetune-on-embeddings through main()."""

import os

import numpy as np
import pandas as pd
import pytest

from pigeon_tpu.cli.run import main

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

RNG = np.random.default_rng(10)


@pytest.fixture()
def tiny_world(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    cells = np.array([[-100., 40.], [10., 50.], [120., 30.]], np.float32)
    rows = []
    for i in range(36):
        c = i % 3
        color = np.zeros(3)
        color[c] = 255
        img = RNG.normal(color, 40, (64, 64, 3)).clip(0, 255)
        Image.fromarray(img.astype(np.uint8)).save(img_dir / f"{i}.png")
        lng, lat = cells[c] + RNG.normal(0, 1, 2)
        rows.append({"image": f"{i}.png", "lng": lng, "lat": lat,
                     "selection": "train" if i % 4 else "val",
                     "geocell_idx": c})
    pd.DataFrame(rows).to_csv(tmp_path / "meta.csv", index=False)
    pd.DataFrame({"name": ["a", "b", "c"], "lng": cells[:, 0],
                  "lat": cells[:, 1]}).to_csv(tmp_path / "cells.csv",
                                              index=False)
    return tmp_path


def test_embed_then_finetune_on_embeddings(tiny_world, monkeypatch):
    tmp = tiny_world
    monkeypatch.chdir(tmp)

    rc = main(["embed", "run1", "--tiny",
               "--metadata", str(tmp / "meta.csv"),
               "--images", str(tmp / "imgs"),
               "--output", str(tmp / "emb"),
               "--batch-size", "8"])
    assert rc == 0
    emb = np.load(tmp / "emb" / "train.npy")
    assert emb.shape[0] == 27 and emb.shape[1] == 64

    rc = main(["finetune", "run1", "--tiny",
               "--metadata", str(tmp / "meta.csv"),
               "--geocells", str(tmp / "cells.csv"),
               "--embeddings", str(tmp / "emb"),
               "--batch-size", "8", "--epochs", "3"])
    assert rc == 0
    from pigeon_tpu.train.checkpoints import latest_step

    assert latest_step(str(tmp / "saved_models" / "run1")) is not None


def test_embed_quant_int8_sweep(tiny_world, monkeypatch):
    """`embed --quant` runs the sweep through the int8 W8A8 tower
    (calibrated on the first real batch) and produces embeddings close
    to the bf16 sweep's — the +53% serving-rate path for the product's
    heaviest offline job (reference `preprocessing/embed.py:16-83`
    fans the f32 version over every GPU)."""
    tmp = tiny_world
    monkeypatch.chdir(tmp)

    for name, extra in (("ref", []), ("q8", ["--quant"])):
        rc = main(["embed", f"emb_{name}", "--tiny",
                   "--metadata", str(tmp / "meta.csv"),
                   "--images", str(tmp / "imgs"),
                   "--output", str(tmp / f"emb_{name}"),
                   "--batch-size", "8"] + extra)
        assert rc == 0

    ref = np.load(tmp / "emb_ref" / "train.npy")
    q8 = np.load(tmp / "emb_q8" / "train.npy")
    assert q8.shape == ref.shape
    assert np.isfinite(q8).all()
    # Row order must align (same indices contract).
    np.testing.assert_array_equal(
        np.load(tmp / "emb_ref" / "train_indices.npy"),
        np.load(tmp / "emb_q8" / "train_indices.npy"))
    cos = np.sum(ref * q8, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(q8, axis=-1))
    assert cos.mean() > 0.97, cos.mean()

    # The ViT embedder has no quant twin — explicit error, not silence.
    with pytest.raises(SystemExit, match="CLIP embedder only"):
        main(["embed", "vitq", "--tiny", "--embedder", "vit",
              "--metadata", str(tmp / "meta.csv"),
              "--images", str(tmp / "imgs"),
              "--output", str(tmp / "emb_vq"), "--quant"])


def test_evaluate_command_with_registry_and_refiner(tiny_world, monkeypatch):
    """CLI evaluate: benchmark registry + prototypes + embeddings -> metrics."""
    import json

    tmp = tiny_world
    monkeypatch.chdir(tmp)

    # Embeddings + prototypes from the training split.
    rc = main(["embed", "run2", "--tiny",
               "--metadata", str(tmp / "meta.csv"),
               "--images", str(tmp / "imgs"),
               "--output", str(tmp / "emb"), "--batch-size", "8"])
    assert rc == 0
    meta = pd.read_csv(tmp / "meta.csv")
    train = meta[meta["selection"] == "train"].reset_index(drop=True)
    from pigeon_tpu.geocell import build_prototypes

    build_prototypes(train, cluster_args=(4, 0.05), num_workers=0,
                     output_csv=str(tmp / "protos.csv"))

    # Benchmark registry pointing at the val rows.
    val = meta[meta["selection"] == "val"].reset_index(drop=True)
    val["geocell_idx"] = val["geocell_idx"].astype(int)
    val.to_csv(tmp / "bench_meta.csv", index=False)
    (tmp / "benchmarks.json").write_text(json.dumps(
        {"tinybench": {"meta": str(tmp / "bench_meta.csv"),
                       "images": str(tmp / "imgs")}}))

    # Point the config's registry at our file via --tiny config override:
    # evaluate reads cfg.paths.benchmark_registry; monkeypatch the default
    # by writing to the expected path.
    import pigeon_tpu.cli.run as cli

    orig = cli.make_config

    def patched(args):
        import dataclasses

        cfg = orig(args)
        return cfg.replace(paths=dataclasses.replace(
            cfg.paths, benchmark_registry=str(tmp / "benchmarks.json")))

    monkeypatch.setattr(cli, "make_config", patched)
    out = tmp / "results.json"
    rc = main(["evaluate", "run2", "--tiny", "-l", "tinybench",
               "--metadata", str(tmp / "meta.csv"),
               "--geocells", str(tmp / "cells.csv"),
               "--prototypes", str(tmp / "protos.csv"),
               "--embeddings", str(tmp / "emb"),
               "--batch-size", "4", "--output", str(out)])
    assert rc == 0
    results = json.loads(out.read_text())
    metrics = results["tinybench"]
    assert "Median_km_error" in metrics and "Geoguessr_score" in metrics


def test_evaluate_full_metric_suite(tiny_world, monkeypatch):
    """--countries + --scaler + -m must surface Country_accuracy and all
    six physical-unit MAEs in CLI output (reference
    `evaluation/metrics.py:29-88,165-199`)."""
    import json

    tmp = tiny_world
    monkeypatch.chdir(tmp)

    # Multi-task + climate + month labels on every row.
    meta = pd.read_csv(tmp / "meta.csv")
    n = len(meta)
    meta["elevation"] = RNG.uniform(0, 2000, n)
    meta["population"] = RNG.uniform(0, 1e4, n)
    meta["temp_avg"] = RNG.uniform(-10, 30, n)
    meta["temp_diff"] = RNG.uniform(0, 20, n)
    meta["prec_avg"] = RNG.uniform(0, 300, n)
    meta["prec_diff"] = RNG.uniform(0, 100, n)
    meta["climate_zone_idx"] = RNG.integers(0, 28, n)
    meta["month"] = RNG.integers(0, 12, n)
    meta.to_csv(tmp / "meta.csv", index=False)

    # Scaler fit on the raw values, saved as JSON.
    from pigeon_tpu.train.metrics import MT_VARIABLES, RegressionScaler

    raw = meta[list(MT_VARIABLES)].to_numpy()
    RegressionScaler.fit(raw).save(str(tmp / "scaler.json"))

    # Country boundaries: three boxes around the three geocells.
    features = []
    for name, (lng, lat) in zip("ABC", [(-100, 40), (10, 50), (120, 30)]):
        ring = [[lng - 15, lat - 15], [lng + 15, lat - 15],
                [lng + 15, lat + 15], [lng - 15, lat + 15],
                [lng - 15, lat - 15]]
        features.append({"type": "Feature",
                         "properties": {"name": name},
                         "geometry": {"type": "Polygon",
                                      "coordinates": [ring]}})
    (tmp / "countries.geojson").write_text(json.dumps(
        {"type": "FeatureCollection", "features": features}))

    # Benchmark registry over the val rows.
    val = meta[meta["selection"] == "val"].reset_index(drop=True)
    val.to_csv(tmp / "bench_meta.csv", index=False)
    (tmp / "benchmarks.json").write_text(json.dumps(
        {"tinybench": {"meta": str(tmp / "bench_meta.csv"),
                       "images": str(tmp / "imgs")}}))

    out = tmp / "full_results.json"
    rc = main(["evaluate", "runf", "--tiny", "-m", "-l", "tinybench",
               "--geocells", str(tmp / "cells.csv"),
               "--benchmarks", str(tmp / "benchmarks.json"),
               "--countries", str(tmp / "countries.geojson"),
               "--scaler", str(tmp / "scaler.json"),
               "--batch-size", "4", "--output", str(out)])
    assert rc == 0
    metrics = json.loads(out.read_text())["tinybench"]
    assert "Country_accuracy" in metrics
    for key in ("Mean_elevation_error", "Mean_population_error",
                "Mean_temperature_error", "Mean_temp_diff_error",
                "Mean_precipitation_error", "Mean_prec_diff_error"):
        assert key in metrics, key
    assert "Climate_accuracy" in metrics and "Month_accuracy" in metrics
    assert 0.0 <= metrics["Country_accuracy"] <= 1.0


def test_evaluate_vendored_sample_benchmark(tmp_path, monkeypatch):
    """The vendored sample20 benchmark exercises the registry path with
    REAL committed files (no synthetic fixtures) — the registry, meta CSV,
    and images ship in data/benchmarks/."""
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    registry = os.path.join(repo, "data", "benchmarks", "benchmarks.json")
    assert os.path.exists(registry)

    cells = np.array([[-100., 40.], [10., 50.], [120., 30.], [150., -30.]],
                     np.float32)
    pd.DataFrame({"name": list("abcd"), "lng": cells[:, 0],
                  "lat": cells[:, 1]}).to_csv(tmp_path / "cells.csv",
                                              index=False)
    monkeypatch.chdir(tmp_path)
    out = tmp_path / "sample20.json"
    rc = main(["evaluate", "runs20", "--tiny", "-l", "sample20",
               "--benchmarks", registry,
               "--geocells", str(tmp_path / "cells.csv"),
               "--batch-size", "4", "--output", str(out)])
    assert rc == 0
    metrics = json.loads(out.read_text())["sample20"]
    assert "Median_km_error" in metrics
    assert "Geocell_accuracy" in metrics  # geocell_idx column present
    assert 0 <= metrics["Geocell_accuracy"] <= 1


def test_evaluate_quant_int8_path(tmp_path, monkeypatch):
    """`evaluate --quant` runs the whole benchmark through the int8 W8A8
    tower (activation scales calibrated on the first real batch) — the
    with/without-quant comparison users run to bound the int8 quality
    delta before serving it (`docs/PERF.md`)."""
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    registry = os.path.join(repo, "data", "benchmarks", "benchmarks.json")

    cells = np.array([[-100., 40.], [10., 50.], [120., 30.], [150., -30.]],
                     np.float32)
    pd.DataFrame({"name": list("abcd"), "lng": cells[:, 0],
                  "lat": cells[:, 1]}).to_csv(tmp_path / "cells.csv",
                                              index=False)
    monkeypatch.chdir(tmp_path)
    out = tmp_path / "sample20_int8.json"
    rc = main(["evaluate", "runq", "--tiny", "-l", "sample20", "--quant",
               "--benchmarks", registry,
               "--geocells", str(tmp_path / "cells.csv"),
               "--batch-size", "4", "--output", str(out)])
    assert rc == 0
    metrics = json.loads(out.read_text())["sample20"]
    assert "Median_km_error" in metrics and "Geoguessr_score" in metrics
    assert np.isfinite(metrics["Median_km_error"])


def test_pretrain_command(tiny_world, monkeypatch):
    tmp = tiny_world
    monkeypatch.chdir(tmp)
    # Give the metadata a source + caption columns for the pretrain path.
    meta = pd.read_csv(tmp / "meta.csv")
    meta["source"] = "v"
    meta["country_name"] = "France"
    meta.to_csv(tmp / "meta.csv", index=False)
    rc = main(["pretrain", "run3", "--tiny", "-a",
               "--metadata", str(tmp / "meta.csv"),
               "--images", str(tmp / "imgs"),
               "--batch-size", "8", "--epochs", "1"])
    assert rc == 0
    from pigeon_tpu.train.checkpoints import latest_step

    assert latest_step(str(tmp / "saved_models" / "run3_pretrained")) \
        is not None


def test_evaluate_test_split_holdout(tiny_world, monkeypatch):
    """evaluate -t with no registry scores the metadata's test split."""
    import json

    tmp = tiny_world
    monkeypatch.chdir(tmp)
    meta = pd.read_csv(tmp / "meta.csv")
    meta.loc[meta["selection"] == "val", "selection"] = "test"
    meta.to_csv(tmp / "meta.csv", index=False)
    out = tmp / "holdout.json"
    rc = main(["evaluate", "runh", "--tiny", "-t",
               "--metadata", str(tmp / "meta.csv"),
               "--images", str(tmp / "imgs"),
               "--geocells", str(tmp / "cells.csv"),
               "--batch-size", "4", "--output", str(out)])
    assert rc == 0
    results = json.loads(out.read_text())
    assert "Median_km_error" in results["test"]


def test_finetune_on_embeddings_with_tp2(tiny_world, monkeypatch):
    """--tp 2 trains on a (4 data x 2 model) mesh (8 virtual CPU devices)."""
    tmp = tiny_world
    monkeypatch.chdir(tmp)
    rc = main(["embed", "runtp", "--tiny",
               "--metadata", str(tmp / "meta.csv"),
               "--images", str(tmp / "imgs"),
               "--output", str(tmp / "emb"), "--batch-size", "8"])
    assert rc == 0
    rc = main(["finetune", "runtp", "--tiny", "--tp", "2",
               "--metadata", str(tmp / "meta.csv"),
               "--geocells", str(tmp / "cells.csv"),
               "--embeddings", str(tmp / "emb"),
               "--batch-size", "8", "--epochs", "2"])
    assert rc == 0
    from pigeon_tpu.train.checkpoints import latest_step

    assert latest_step(str(tmp / "saved_models" / "runtp")) is not None


def test_finetune_on_embeddings_with_fsdp(tiny_world, monkeypatch):
    """--fsdp --tp 2: ZeRO storage sharding composed with TP on the
    8-device mesh; training must converge to a checkpoint as usual."""
    tmp = tiny_world
    monkeypatch.chdir(tmp)
    rc = main(["embed", "runfs", "--tiny",
               "--metadata", str(tmp / "meta.csv"),
               "--images", str(tmp / "imgs"),
               "--output", str(tmp / "emb"), "--batch-size", "8"])
    assert rc == 0
    rc = main(["finetune", "runfs", "--tiny", "--tp", "2", "--fsdp",
               "--metadata", str(tmp / "meta.csv"),
               "--geocells", str(tmp / "cells.csv"),
               "--embeddings", str(tmp / "emb"),
               "--batch-size", "8", "--epochs", "2"])
    assert rc == 0
    from pigeon_tpu.train.checkpoints import latest_step

    assert latest_step(str(tmp / "saved_models" / "runfs")) is not None


def test_predict_directory_to_csv(tiny_world, monkeypatch):
    """`predict --images DIR` geolocates every image into a CSV —
    the batch-inference surface the reference never shipped."""
    tmp = tiny_world
    monkeypatch.chdir(tmp)

    out = tmp / "preds.csv"
    rc = main(["predict", "runp", "--tiny",
               "--images", str(tmp / "imgs"),
               "--geocells", str(tmp / "cells.csv"),
               "--batch-size", "8", "--output", str(out)])
    assert rc == 0
    preds = pd.read_csv(out)
    assert len(preds) == 36
    assert set(preds.columns) >= {"image", "lat", "lng", "geocell_idx",
                                  "top1_prob"}
    assert preds["lat"].between(-90, 90).all()
    assert preds["lng"].between(-180, 180).all()
    assert preds["geocell_idx"].between(0, 2).all()
    assert preds["top1_prob"].between(0, 1).all()
    # Tail batch (36 = 4*8 + 4) must not duplicate or drop rows.
    assert preds["image"].is_unique


def test_predict_csv_with_refinement_and_quant(tiny_world, monkeypatch):
    """`predict -l CSV` with refinement assets + --quant: refined
    coordinates must come from the prototype bank's geometry."""
    tmp = tiny_world
    monkeypatch.chdir(tmp)

    rc = main(["embed", "runq", "--tiny",
               "--metadata", str(tmp / "meta.csv"),
               "--images", str(tmp / "imgs"),
               "--output", str(tmp / "emb"), "--batch-size", "8"])
    assert rc == 0
    meta = pd.read_csv(tmp / "meta.csv")
    train = meta[meta["selection"] == "train"].reset_index(drop=True)
    from pigeon_tpu.geocell import build_prototypes

    build_prototypes(train, cluster_args=(4, 0.05), num_workers=0,
                     output_csv=str(tmp / "protos.csv"))

    val = meta[meta["selection"] == "val"].reset_index(drop=True)
    val.to_csv(tmp / "val.csv", index=False)
    out = tmp / "preds.csv"
    rc = main(["predict", "runq", "--tiny", "--quant",
               "-l", str(tmp / "val.csv"),
               "--images", str(tmp / "imgs"),
               "--geocells", str(tmp / "cells.csv"),
               "--prototypes", str(tmp / "protos.csv"),
               "--embeddings", str(tmp / "emb"),
               "--metadata", str(tmp / "meta.csv"),
               "--batch-size", "4", "--output", str(out)])
    assert rc == 0
    preds = pd.read_csv(out)
    assert len(preds) == len(val)
    assert (preds["image"] == val["image"]).all()
    assert preds["lat"].between(-90, 90).all()
    assert preds["lng"].between(-180, 180).all()


def test_evaluate_zeroshot(tiny_world, monkeypatch):
    """`evaluate --zeroshot`: CLIP text-prompt geocell classification
    through the standard evaluate loop + metric suite (BASELINE config
    #1; the capability behind the reference's missing zeroshot.py)."""
    import json

    tmp = tiny_world
    monkeypatch.chdir(tmp)

    meta = pd.read_csv(tmp / "meta.csv")
    val = meta[meta["selection"] == "val"].reset_index(drop=True)
    val["geocell_idx"] = val["geocell_idx"].astype(int)
    val.to_csv(tmp / "bench_meta.csv", index=False)
    (tmp / "benchmarks.json").write_text(json.dumps(
        {"tinybench": {"meta": str(tmp / "bench_meta.csv"),
                       "images": str(tmp / "imgs")}}))
    # Named cells so the prompts exercise the admin/country path.
    cells = pd.read_csv(tmp / "cells.csv")
    cells["admin_1"] = ["Bavaria", "Kanto", "Texas"]
    cells["country"] = ["Germany", "Japan", "United States"]
    cells.to_csv(tmp / "cells_named.csv", index=False)

    out = tmp / "zs.json"
    rc = main(["evaluate", "zs", "--tiny", "--zeroshot", "-l", "tinybench",
               "--geocells", str(tmp / "cells_named.csv"),
               "--benchmarks", str(tmp / "benchmarks.json"),
               "--batch-size", "4", "--output", str(out)])
    assert rc == 0
    metrics = json.loads(out.read_text())["tinybench"]
    assert "Median_km_error" in metrics and "Geocell_accuracy" in metrics
    assert "Geoguessr_score" in metrics
    assert 0.0 <= metrics["Geocell_accuracy"] <= 1.0


def test_finetune_on_pixels_with_resume(tiny_world, monkeypatch):
    """`finetune` on raw pixels (the reference's main mode) + a real
    --resume continuation (the reference raises NotImplementedError,
    `run.py:166-175`)."""
    tmp = tiny_world
    monkeypatch.chdir(tmp)

    common = ["finetune", "runpx", "--tiny",
              "--metadata", str(tmp / "meta.csv"),
              "--images", str(tmp / "imgs"),
              "--geocells", str(tmp / "cells.csv"),
              "--batch-size", "8"]
    rc = main(common + ["--epochs", "1"])
    assert rc == 0
    from pigeon_tpu.train.checkpoints import latest_step

    ckpt = str(tmp / "saved_models" / "runpx")
    step1 = latest_step(ckpt)
    assert step1 is not None and step1 > 0

    rc = main(common + ["--epochs", "2", "--resume"])
    assert rc == 0
    step2 = latest_step(ckpt)
    assert step2 is not None and step2 >= step1


def test_evaluate_landmarks_dual_dataset(tiny_world, monkeypatch):
    """--landmarks end-to-end (reference `run.py:84-85`): the YFCC and
    landmark datasets are passed as comma-separated
    --metadata/--embeddings/--prototypes pairs; their refiner banks
    concatenate with dataset-B member indices shifted
    (`models/proto_refiner.py:53-64`)."""
    import json

    tmp = tiny_world
    monkeypatch.chdir(tmp)

    meta = pd.read_csv(tmp / "meta.csv")
    meta.iloc[:18].to_csv(tmp / "meta_a.csv", index=False)
    meta.iloc[18:].reset_index(drop=True).to_csv(tmp / "meta_b.csv",
                                                 index=False)
    from pigeon_tpu.geocell import build_prototypes

    for tag in ("a", "b"):
        rc = main(["embed", f"lm_{tag}", "--tiny",
                   "--metadata", str(tmp / f"meta_{tag}.csv"),
                   "--images", str(tmp / "imgs"),
                   "--output", str(tmp / f"emb_{tag}"),
                   "--batch-size", "8"])
        assert rc == 0
        sub = pd.read_csv(tmp / f"meta_{tag}.csv")
        train = sub[sub["selection"] == "train"].reset_index(drop=True)
        build_prototypes(train, cluster_args=(4, 0.05), num_workers=0,
                         output_csv=str(tmp / f"protos_{tag}.csv"))

    val = meta[meta["selection"] == "val"].reset_index(drop=True)
    val.to_csv(tmp / "bench_meta.csv", index=False)
    (tmp / "benchmarks.json").write_text(json.dumps(
        {"tinybench": {"meta": str(tmp / "bench_meta.csv"),
                       "images": str(tmp / "imgs")}}))
    import pigeon_tpu.cli.run as cli

    orig = cli.make_config

    def patched(args):
        import dataclasses

        cfg = orig(args)
        assert cfg.name == "pigeotto-landmarks"  # --landmarks preset
        return cfg.replace(paths=dataclasses.replace(
            cfg.paths, benchmark_registry=str(tmp / "benchmarks.json")))

    monkeypatch.setattr(cli, "make_config", patched)
    out = tmp / "results_lm.json"
    rc = main(["evaluate", "lm", "--tiny", "--landmarks", "-l", "tinybench",
               "--metadata", f"{tmp}/meta_a.csv,{tmp}/meta_b.csv",
               "--geocells", str(tmp / "cells.csv"),
               "--prototypes", f"{tmp}/protos_a.csv,{tmp}/protos_b.csv",
               "--embeddings", f"{tmp}/emb_a,{tmp}/emb_b",
               "--batch-size", "4", "--output", str(out)])
    assert rc == 0
    metrics = json.loads(out.read_text())["tinybench"]
    assert "Median_km_error" in metrics and "Geoguessr_score" in metrics


def test_no_classification_fails_loudly():
    """--no-classification must abort: regression mode is unimplemented
    (the reference only logs the mode string, `run.py:99`)."""
    with pytest.raises(SystemExit):
        main(["finetune", "m", "--tiny", "--no-classification"])


def test_model_flag_selects_vit_b32():
    """--model vit-b32 swaps in the ViT-B/32 towers (BASELINE config #1's
    zero-shot model) and resizes the head's embed dim to match."""
    from pigeon_tpu.cli.run import build_parser, make_config

    args = build_parser().parse_args(
        ["evaluate", "m", "--zeroshot", "--model", "vit-b32"])
    cfg = make_config(args)
    assert cfg.vision.image_size == 224
    assert cfg.vision.patch_size == 32
    assert cfg.vision.hidden_size == 768
    assert cfg.head.embed_dim == 768
    assert cfg.text.hidden_size == 512


def test_embed_routes_vit_named_models(tiny_world, monkeypatch):
    """'vit' in the model name selects the generic ViT embedder
    (reference `run.py:127-132` — its VITEmbedding import is undefined;
    here the path is real)."""
    tmp = tiny_world
    monkeypatch.chdir(tmp)
    rc = main(["embed", "vit_run", "--tiny",
               "--metadata", str(tmp / "meta.csv"),
               "--images", str(tmp / "imgs"),
               "--output", str(tmp / "emb_vit"),
               "--batch-size", "8"])
    assert rc == 0
    emb = np.load(tmp / "emb_vit" / "train.npy")
    assert emb.shape[0] == 27 and emb.shape[1] == 64


def test_finetune_multi_dataset_concat(tiny_world, monkeypatch):
    """--metadata a.csv,b.csv: train splits concatenate, val from the
    first (reference `run.py:143-156` multi-dataset training mix)."""
    tmp = tiny_world
    monkeypatch.chdir(tmp)
    meta = pd.read_csv(tmp / "meta.csv")
    meta.iloc[:18].to_csv(tmp / "m_a.csv", index=False)
    meta.iloc[18:].to_csv(tmp / "m_b.csv", index=False)

    rc = main(["finetune", "concat_run", "--tiny",
               "--metadata", f"{tmp}/m_a.csv,{tmp}/m_b.csv",
               "--images", str(tmp / "imgs"),
               "--geocells", str(tmp / "cells.csv"),
               "--batch-size", "8", "--epochs", "1"])
    assert rc == 0
    from pigeon_tpu.train.checkpoints import latest_step

    assert latest_step(str(tmp / "saved_models" / "concat_run")) is not None


def test_embed_sample_writes_aligned_metadata(tiny_world, monkeypatch):
    """embed --sample writes the sampled metadata next to the bank so
    positional contracts (prototypes/evaluate) stay aligned; the
    sampled rows keep original ORDER."""
    tmp = tiny_world
    monkeypatch.chdir(tmp)
    rc = main(["embed", "runS", "--tiny", "--sample", "10",
               "--metadata", str(tmp / "meta.csv"),
               "--images", str(tmp / "imgs"),
               "--output", str(tmp / "emb_s"), "--batch-size", "8"])
    assert rc == 0
    emb = np.load(tmp / "emb_s" / "train.npy")
    assert emb.shape[0] == 10
    sampled = pd.read_csv(tmp / "emb_s" / "metadata_sampled.csv")
    train_rows = sampled[sampled["selection"] == "train"]
    assert len(train_rows) == 10
    # Order preserved: image names strictly increasing by original row.
    orig = pd.read_csv(tmp / "meta.csv")
    pos = [orig.index[orig["image"] == im][0]
           for im in train_rows["image"]]
    assert pos == sorted(pos)


def test_evaluate_holdout_comma_metadata(tiny_world, monkeypatch):
    """evaluate -t with the --landmarks comma-metadata convention
    concatenates the test splits of both CSVs (previously crashed:
    pd.read_csv('a.csv,b.csv'))."""
    import json

    tmp = tiny_world
    monkeypatch.chdir(tmp)
    meta = pd.read_csv(tmp / "meta.csv")
    meta.loc[meta["selection"] == "val", "selection"] = "test"
    meta.iloc[:18].to_csv(tmp / "meta_a.csv", index=False)
    meta.iloc[18:].reset_index(drop=True).to_csv(tmp / "meta_b.csv",
                                                 index=False)
    n_test = int((meta["selection"] == "test").sum())
    out = tmp / "holdout_lm.json"
    rc = main(["evaluate", "runhlm", "--tiny", "-t",
               "--metadata", f"{tmp}/meta_a.csv,{tmp}/meta_b.csv",
               "--images", str(tmp / "imgs"),
               "--geocells", str(tmp / "cells.csv"),
               "--batch-size", "4", "--output", str(out)])
    assert rc == 0
    results = json.loads(out.read_text())
    assert "Median_km_error" in results["test"]
    assert n_test >= 2  # both files contribute test rows


@pytest.fixture()
def aux_world(tmp_path):
    """Synthetic auxiliary-data tree in the `scripts/get_auxiliary_data.sh`
    layout (boundaries + Köppen/elevation/population/WorldClim rasters +
    driving sides) plus a 2-country image metadata CSV WITHOUT multi-task
    columns — the exact input state that triggers the reference's
    auto-augmentation (`finetune_dataset.py:135-137`)."""
    import json

    from test_augmentor import write_geotiff

    aux = tmp_path / "aux"
    (aux / "boundaries").mkdir(parents=True)
    for level, names in (("ADM0", ["Westland", "Eastland"]),
                         ("ADM1", ["West Province", "East Province"])):
        fc = {"type": "FeatureCollection", "features": [
            {"type": "Feature", "properties": {"shapeName": names[0]},
             "geometry": {"type": "Polygon", "coordinates": [
                 [[-20, -10], [0, -10], [0, 10], [-20, 10], [-20, -10]]]}},
            {"type": "Feature", "properties": {"shapeName": names[1]},
             "geometry": {"type": "Polygon", "coordinates": [
                 [[0, -10], [20, -10], [20, 10], [0, 10], [0, -10]]]}},
        ]}
        (aux / "boundaries" / f"geoBoundariesCGAZ_{level}.geojson") \
            .write_text(json.dumps(fc))

    # Degree-grid rasters covering the two-country world (lon -20..20,
    # lat -10..10): Köppen 14 (Cfa) west / 15 (Cfb) east, elevation 100,
    # WorldClim monthly pairs -> avg/diff are exactly computable.
    grid = dict(origin=(-20.0, 10.0), scale=(1.0, 1.0))
    clim = np.full((20, 40), 14, np.uint8)
    clim[:, 20:] = 15
    (aux / "koppen_geiger").mkdir()
    write_geotiff(str(aux / "koppen_geiger" / "koppen.tif"), clim, **grid)
    (aux / "elevation").mkdir()
    write_geotiff(str(aux / "elevation" / "elev.tif"),
                  np.full((20, 40), 100, np.int16), **grid)
    for sub, vals in (("tavg", (10.0, 20.0)), ("prec", (50.0, 150.0))):
        d = aux / "worldclim" / sub
        d.mkdir(parents=True)
        for m, v in enumerate(vals):
            write_geotiff(str(d / f"m{m:02d}.tif"),
                          np.full((20, 40), v, np.float32), **grid)
    # Population raster georeferenced in Mollweide meters (GHSL's CRS,
    # reference `geo_augmentor.py:273-274`): one world-covering grid.
    (aux / "pop_density").mkdir()
    write_geotiff(str(aux / "pop_density" / "pop.tif"),
                  np.full((20, 40), 5.0, np.float32),
                  origin=(-1.81e7, 9.03e6), scale=(9.05e5, 9.03e5))
    (aux / "driving_side.json").write_text(json.dumps(
        {"Westland": "left", "Eastland": "right"}))

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    centers = np.array([[-10.0, 0.0], [10.0, 0.0]])
    rows = []
    for i in range(24):
        c = i % 2
        color = np.zeros(3)
        color[c] = 255
        img = RNG.normal(color, 40, (64, 64, 3)).clip(0, 255)
        Image.fromarray(img.astype(np.uint8)).save(img_dir / f"{i}.png")
        lng, lat = centers[c] + RNG.normal(0, 1.5, 2)
        rows.append({"image": f"{i}.png", "lng": lng, "lat": lat,
                     "selection": "train" if i % 4 else "val",
                     "geocell_idx": c})
    pd.DataFrame(rows).to_csv(tmp_path / "meta.csv", index=False)
    pd.DataFrame({"name": ["w", "e"], "lng": centers[:, 0],
                  "lat": centers[:, 1]}).to_csv(tmp_path / "cells.csv",
                                                index=False)
    return tmp_path


def test_augment_cli_produces_multitask_schema(aux_world, monkeypatch):
    """`pigeon_tpu augment`: metadata + aux tree -> the exact multi-task
    column schema `data/pipeline.py` reads (MT_COLUMNS +
    climate_zone_idx), plus the caption ingredients (country/admin-1
    names, driving side) — reference `geo_augmentor.py:301-353`."""
    tmp = aux_world
    monkeypatch.chdir(tmp)
    out = tmp / "meta_aug.csv"
    rc = main(["augment", "aug", "--metadata", str(tmp / "meta.csv"),
               "--aux-dir", str(tmp / "aux"), "--output", str(out)])
    assert rc == 0
    df = pd.read_csv(out)

    from pigeon_tpu.data.pipeline import MT_COLUMNS

    assert set(MT_COLUMNS) <= set(df.columns)
    assert {"climate_zone_idx", "country_name", "geo_area",
            "driving_right"} <= set(df.columns)
    west = df["lng"] < 0
    assert (df.loc[west, "country_name"] == "Westland").all()
    assert (df.loc[~west, "country_name"] == "Eastland").all()
    assert (df.loc[west, "climate_zone_idx"] == 13).all()   # Cfa
    assert (df.loc[~west, "climate_zone_idx"] == 14).all()  # Cfb
    assert (df["elevation"] == 100).all()
    assert (df["population"] == 5.0).all()
    np.testing.assert_allclose(df["temp_avg"], 15.0)
    np.testing.assert_allclose(df["temp_diff"], 10.0)
    np.testing.assert_allclose(df["prec_avg"], 100.0)
    np.testing.assert_allclose(df["prec_diff"], 100.0)

    # The pipeline actually reads the schema: one sample must carry the
    # multi-task + climate labels.
    from pigeon_tpu.data import TabularImageDataset

    ds = TabularImageDataset(df, str(tmp / "imgs"), image_size=64,
                             normalize=False)
    arrays = ds.sample_arrays(ds.df.iloc[0])
    assert arrays["labels_multi_task"].shape == (6,)
    assert arrays["labels_climate"] in (13, 14)


def test_finetune_auto_augments_missing_multitask(aux_world, monkeypatch,
                                                  caplog):
    """`finetune -m` on metadata WITHOUT multi-task columns auto-runs the
    GeoAugmentor from --aux-dir (reference `finetune_dataset.py:135-137`)
    and trains to a checkpoint; without aux data it degrades with a
    warning instead of crashing."""
    tmp = aux_world
    monkeypatch.chdir(tmp)

    import logging as _logging

    with caplog.at_level(_logging.WARNING, logger="pigeon_tpu.cli"):
        rc = main(["finetune", "runaug", "--tiny", "-m",
                   "--metadata", str(tmp / "meta.csv"),
                   "--images", str(tmp / "imgs"),
                   "--geocells", str(tmp / "cells.csv"),
                   "--aux-dir", str(tmp / "aux"),
                   "--batch-size", "6", "--epochs", "1"])
    assert rc == 0
    assert any("lacks multi-task columns" in r.message for r in
               caplog.records)
    from pigeon_tpu.train.checkpoints import latest_step

    assert latest_step(str(tmp / "saved_models" / "runaug")) is not None

    # No aux data: -m cannot be satisfied — fail loudly with the fix
    # instead of crashing inside the multi-task loss.
    with pytest.raises(SystemExit, match="augment"):
        main(["finetune", "runaug2", "--tiny", "-m",
              "--metadata", str(tmp / "meta.csv"),
              "--images", str(tmp / "imgs"),
              "--geocells", str(tmp / "cells.csv"),
              "--aux-dir", str(tmp / "empty_aux"),
              "--batch-size", "6", "--epochs", "1"])


def test_cli_artifact_ladder_geocells_embed_prototypes_evaluate(
        tmp_path, monkeypatch):
    """The full artifact-regeneration ladder PURELY through the CLI:
    geocells -> embed -> prototypes -> evaluate (the rung the reference
    only offers as unconnected scripts; `prototype.py:69-95`)."""
    import json

    monkeypatch.chdir(tmp_path)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    centers = np.array([[-10.0, 0.0], [10.0, 0.0]])
    rows = []
    for i in range(96):
        c = i % 2
        color = np.zeros(3)
        color[c] = 255
        img = RNG.normal(color, 40, (64, 64, 3)).clip(0, 255)
        Image.fromarray(img.astype(np.uint8)).save(img_dir / f"{i}.png")
        lng, lat = centers[c] + RNG.normal(0, 1.5, 2)
        # (i // 2) decorrelates the split from the i%2 cluster so BOTH
        # cells keep 36 train points (inside the PIGEON 30..60 bounds).
        rows.append({"image": f"{i}.png", "lng": lng, "lat": lat,
                     "selection": "val" if (i // 2) % 4 == 0 else "train"})
    pd.DataFrame(rows).to_csv(tmp_path / "meta.csv", index=False)
    # Admin-2 boundaries seed one cell per box (-l GeoJSON, as
    # `cmd_geocells` consumes it).
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"shapeName": n},
         "geometry": {"type": "Polygon", "coordinates": [r]}}
        for n, r in (
            ("W", [[-20, -10], [0, -10], [0, 10], [-20, 10], [-20, -10]]),
            ("E", [[0, -10], [20, -10], [20, 10], [0, 10], [0, -10]]))]}
    (tmp_path / "admin2.geojson").write_text(json.dumps(fc))

    # Rung 1: geocells. 36 train points/cell sits inside the PIGEON
    # 30..60 bounds -> the two seeded admin cells survive balancing.
    rc = main(["geocells", "lad", "--metadata", str(tmp_path / "meta.csv"),
               "-l", str(tmp_path / "admin2.geojson"),
               "--output", str(tmp_path / "cells.csv")])
    assert rc == 0
    cells = pd.read_csv(tmp_path / "cells.csv")
    assert len(cells) == 2 and cells["size"].sum() == 72

    # Rung 2: embed.
    rc = main(["embed", "lad", "--tiny",
               "--metadata", str(tmp_path / "meta.csv"),
               "--images", str(img_dir),
               "--output", str(tmp_path / "emb"), "--batch-size", "8"])
    assert rc == 0

    # Rung 3: prototypes — geocell_idx assigned from the cells CSV.
    rc = main(["prototypes", "lad", "--metadata", str(tmp_path / "meta.csv"),
               "--geocells", str(tmp_path / "cells.csv"),
               "--output", str(tmp_path / "protos.csv")])
    assert rc == 0
    protos = pd.read_csv(tmp_path / "protos.csv")
    assert {"geocell_idx", "cluster", "lng", "lat", "count",
            "indices"} <= set(protos.columns)
    assert protos["geocell_idx"].nunique() == 2
    # Member indices address the train-filtered frame (the embedding
    # bank's row order).
    max_idx = max(max(json.loads(ix)) for ix in protos["indices"])
    assert max_idx < 72

    # Rung 4: evaluate with the regenerated assets.
    meta = pd.read_csv(tmp_path / "meta.csv")
    val = meta[meta["selection"] == "val"].reset_index(drop=True)
    val.to_csv(tmp_path / "bench_meta.csv", index=False)
    (tmp_path / "benchmarks.json").write_text(json.dumps(
        {"ladbench": {"meta": str(tmp_path / "bench_meta.csv"),
                      "images": str(img_dir)}}))
    out = tmp_path / "ladder_results.json"
    rc = main(["evaluate", "lad", "--tiny", "-l", "ladbench",
               "--benchmarks", str(tmp_path / "benchmarks.json"),
               "--metadata", str(tmp_path / "meta.csv"),
               "--geocells", str(tmp_path / "cells.csv"),
               "--prototypes", str(tmp_path / "protos.csv"),
               "--embeddings", str(tmp_path / "emb"),
               "--batch-size", "8", "--output", str(out)])
    assert rc == 0
    metrics = json.loads(out.read_text())["ladbench"]
    assert "Median_km_error" in metrics and "Geoguessr_score" in metrics


def test_prototypes_cli_landmarks_comma_pairs(tiny_world, monkeypatch):
    """`prototypes` accepts the --landmarks comma-pair convention: one
    prototype CSV per dataset with per-dataset member indices (evaluate
    applies the bank offsets when concatenating)."""
    tmp = tiny_world
    monkeypatch.chdir(tmp)
    meta = pd.read_csv(tmp / "meta.csv")
    meta.iloc[:18].to_csv(tmp / "pm_a.csv", index=False)
    meta.iloc[18:].reset_index(drop=True).to_csv(tmp / "pm_b.csv",
                                                 index=False)
    rc = main(["prototypes", "lm",
               "--metadata", f"{tmp}/pm_a.csv,{tmp}/pm_b.csv",
               "--output", f"{tmp}/pr_a.csv,{tmp}/pr_b.csv"])
    assert rc == 0
    import json

    for tag, src in (("a", "pm_a.csv"), ("b", "pm_b.csv")):
        protos = pd.read_csv(tmp / f"pr_{tag}.csv")
        assert len(protos) > 0
        sub = pd.read_csv(tmp / src)
        n_train = int((sub["selection"] == "train").sum())
        max_idx = max(max(json.loads(ix)) for ix in protos["indices"])
        assert max_idx < n_train  # per-dataset positions, not global


class TestAttnImplSelection:
    """The quant path's attention-impl guard (cli/run.py) must hold
    regardless of the PIGEON_ATTN_IMPL override: 'flash_fused' is the
    hardware-VALIDATED int8 route (r4 step-1 parity err 0.0; 565.9 vs
    434.1 img/s), while the LN/MLP/block variants stay downgraded —
    the parity-failed `fused_ln_mlp_int8` was deleted in r5 (so the
    _mlp downgrade is now also a no-op by construction) and the int8
    block kernel has no e2e win yet."""

    def _sel(self, monkeypatch, attn_env=None, quant_env=None):
        from pigeon_tpu.cli import run as cli

        for k in ("PIGEON_ATTN_IMPL", "PIGEON_QUANT_ATTN_IMPL"):
            monkeypatch.delenv(k, raising=False)
        if attn_env:
            monkeypatch.setenv("PIGEON_ATTN_IMPL", attn_env)
        if quant_env:
            monkeypatch.setenv("PIGEON_QUANT_ATTN_IMPL", quant_env)
        monkeypatch.setattr(cli, "_attn_impl",
                            lambda train=False: (
                                os.environ.get("PIGEON_ATTN_IMPL")
                                or "flash_fused"))
        return cli._quant_attn_impl()

    def test_default_is_validated_fused_route(self, monkeypatch):
        assert self._sel(monkeypatch) == "flash_fused"

    @pytest.mark.parametrize("impl", ["flash_fused_ln",
                                      "flash_fused_mlp",
                                      "flash_fused_block"])
    def test_unvalidated_fused_overrides_downgrade(self, monkeypatch,
                                                   impl):
        assert self._sel(monkeypatch, attn_env=impl) == "flash_fused"

    def test_plain_flash_override_passes_through(self, monkeypatch):
        assert self._sel(monkeypatch, attn_env="flash") == "flash"

    def test_non_fused_override_passes_through(self, monkeypatch):
        assert self._sel(monkeypatch, attn_env="xla") == "xla"

    def test_quant_env_is_the_explicit_opt_in(self, monkeypatch):
        got = self._sel(monkeypatch, quant_env="flash_fused_block")
        assert got == "flash_fused_block"


class TestAttnImplMultiChipGuard:
    """Defaults are UNIFORM across chip counts: both 'flash' and
    'flash_fused' have shard_map hostings (`sharded_mha` /
    `sharded_fused_qkv_mha`) picked up via the attention-mesh registry
    that `create_mesh` fills on multi-chip TPU backends, so
    `_attn_impl` never needs to downgrade (docs/SHARDING.md)."""

    def _impl(self, monkeypatch, n_devices, override=None, train=False):
        import jax

        from pigeon_tpu.cli import run as cli

        monkeypatch.delenv("PIGEON_ATTN_IMPL", raising=False)
        if override:
            monkeypatch.setenv("PIGEON_ATTN_IMPL", override)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(jax, "device_count", lambda: n_devices)
        return cli._attn_impl(train=train)

    def test_single_chip_defaults(self, monkeypatch):
        assert self._impl(monkeypatch, 1) == "flash_fused"
        # r5: training flipped to the fused impl (kernel backward +
        # remat='attn_out' measured 87.6 vs 81.7 img/s flash:full).
        assert self._impl(monkeypatch, 1, train=True) == "flash_fused"

    def test_multi_chip_defaults_match_single_chip(self, monkeypatch):
        assert self._impl(monkeypatch, 8) == "flash_fused"
        assert self._impl(monkeypatch, 8, train=True) == "flash_fused"

    def test_override_wins_on_multi_chip(self, monkeypatch):
        assert self._impl(monkeypatch, 8,
                          override="flash_fused_mlp") == "flash_fused_mlp"
