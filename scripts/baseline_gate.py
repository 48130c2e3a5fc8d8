"""Ready-to-fire BASELINE parity gate (VERDICT r3 item 7).

Runs the five BASELINE.json configs through the PRODUCT CLI the moment
real weights/benchmark data are available, and prints the 0.5%-parity
table against expected (reference-measured) numbers:

    #1 ViT-B/32 zero-shot geocell classify on im2gps3k (batch 8)
    #2 ViT-L/14 finetune: geocell head + haversine-smoothed CE
    #3 4-image StreetView panorama embed + aggregation
    #4 ProtoRefiner retrieval + within-cell refinement
    #5 Full eval on gws15k / yfcc26k / im2gps3k with refiner + metrics

The reference repo publishes NO numbers (BASELINE.md) — the expected
values must be measured by running the reference itself and recorded in
the assets manifest; until then the gate prints our metrics with
``expected: —``.

Usage:
    python scripts/baseline_gate.py --assets assets.json [--configs 1,5]
    python scripts/baseline_gate.py --dry          # wiring check, no data

Assets manifest (JSON) keys — all paths, see `--dry`'s synthesized one
for a template:
    clip_b32_ckpt      HF CLIP ViT-B/32 torch checkpoint (.bin/.pt)
    clip_l14_ckpt      HF CLIP ViT-L/14-336 torch checkpoint
    geocells_csv       geocell CSV (name, lng, lat, geometry, ...)
    mp16_meta / mp16_images      finetune subset (config #2)
    pano_meta / pano_images      4-view panorama metadata (config #3)
    train_meta / embeddings_dir / prototypes_csv   refiner bank assets
    benchmark_registry benchmarks.json with im2gps3k/yfcc26k/gws15k
    expected           {"1": {"Geocell_accuracy": 0.x, ...}, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PARITY_BOUND = 0.005  # 0.5% relative (BASELINE.json)

#: Metrics compared per config when expected values exist. Throughput
#: metrics are reported but not parity-gated (hardware differs).
GATED_METRICS = ("Geocell_accuracy", "Median_km_error")


def _cli(argv):
    from pigeon_tpu.cli.run import main

    rc = main(argv)
    if rc != 0:
        raise RuntimeError(f"CLI failed ({rc}): {argv}")


def _read_results(path):
    with open(path) as f:
        return json.load(f)


def config_1_zeroshot(a, work):
    """ViT-B/32 zero-shot geocell classification on im2gps3k (CPU ok)."""
    out = os.path.join(work, "c1.json")
    argv = ["evaluate", "baseline_c1", "--zeroshot", "--model", "vit-b32",
            "-l", a.get("zeroshot_benchmark", "im2gps3k"),
            "--geocells", a["geocells_csv"],
            "--benchmarks", a["benchmark_registry"],
            "--batch-size", "8", "--output", out]
    if a.get("clip_b32_ckpt"):
        argv += ["-b", a["clip_b32_ckpt"]]
    if a.get("tiny"):
        argv += ["--tiny"]
    _cli(argv)
    return next(iter(_read_results(out).values()))


def config_2_finetune(a, work):
    """Geocell-head finetune with haversine-smoothed CE on the MP-16
    subset, then holdout metrics (evaluate -t)."""
    name = "baseline_c2"
    argv = ["finetune", name, "--metadata", a["mp16_meta"],
            "--images", a["mp16_images"], "--geocells", a["geocells_csv"],
            "--checkpoint-dir", os.path.join(work, "ckpt"),
            "--epochs", str(a.get("finetune_epochs", 1))]
    if a.get("clip_l14_ckpt"):
        argv += ["-b", a["clip_l14_ckpt"]]
    if a.get("tiny"):
        argv += ["--tiny", "--batch-size", "8"]
    _cli(argv)
    out = os.path.join(work, "c2.json")
    ev = ["evaluate", name, "-t", "--metadata", a["mp16_meta"],
          "--images", a["mp16_images"], "--geocells", a["geocells_csv"],
          "--checkpoint-dir", os.path.join(work, "ckpt"),
          "--output", out]
    if a.get("tiny"):
        ev += ["--tiny", "--batch-size", "8"]
    _cli(ev)
    return next(iter(_read_results(out).values()))


def config_3_panorama_embed(a, work):
    """4-view StreetView panorama embed with aggregation."""
    import numpy as np

    emb_dir = os.path.join(work, "pano_emb")
    argv = ["embed", "baseline_c3", "--panorama",
            "--metadata", a["pano_meta"], "--images", a["pano_images"],
            "--output", emb_dir]
    if a.get("clip_l14_ckpt"):
        argv += ["-b", a["clip_l14_ckpt"]]
    if a.get("tiny"):
        argv += ["--tiny", "--batch-size", "4"]
    _cli(argv)
    emb = np.load(os.path.join(emb_dir, "train.npy"))
    return {"embeddings": list(emb.shape),
            "finite": bool(np.isfinite(emb).all())}


def config_4_refiner(a, work):
    """Refined vs unrefined eval on one benchmark: the ProtoRefiner
    retrieval + within-cell refinement delta."""
    rows = {}
    for tag, extra in (("plain", []),
                       ("refined", ["--prototypes", a["prototypes_csv"],
                                    "--embeddings", a["embeddings_dir"],
                                    "--metadata", a["train_meta"]])):
        out = os.path.join(work, f"c4_{tag}.json")
        argv = ["evaluate", "baseline_c4",
                "-l", a.get("refiner_benchmark", "im2gps3k"),
                "--geocells", a["geocells_csv"],
                "--benchmarks", a["benchmark_registry"],
                "--checkpoint-dir", os.path.join(work, "ckpt"),
                "--output", out] + extra
        if a.get("tiny"):
            argv += ["--tiny", "--batch-size", "8"]
        _cli(argv)
        rows[tag] = next(iter(_read_results(out).values()))
    return {"Median_km_error": rows["refined"]["Median_km_error"],
            "Geocell_accuracy": rows["refined"]["Geocell_accuracy"],
            "refinement_delta_km": (rows["plain"]["Median_km_error"]
                                    - rows["refined"]["Median_km_error"])}


def config_5_full_eval(a, work):
    """Full eval with refiner on the SOTA-badge benchmarks."""
    out = os.path.join(work, "c5.json")
    names = a.get("full_benchmarks", "gws15k,yfcc26k,im2gps3k")
    argv = ["evaluate", "baseline_c5", "-l", names,
            "--geocells", a["geocells_csv"],
            "--benchmarks", a["benchmark_registry"],
            "--prototypes", a["prototypes_csv"],
            "--embeddings", a["embeddings_dir"],
            "--metadata", a["train_meta"],
            "--checkpoint-dir", os.path.join(work, "ckpt"),
            "--output", out]
    if a.get("tiny"):
        argv += ["--tiny", "--batch-size", "8"]
    _cli(argv)
    results = _read_results(out)
    return {f"{b}.{k}": v for b, m in results.items()
            for k, v in m.items()
            if k in ("Median_km_error", "Geocell_accuracy",
                     "Geoguessr_score")}


CONFIGS = {
    "1": ("ViT-B/32 zero-shot, im2gps3k", config_1_zeroshot),
    "2": ("ViT-L/14 finetune + smoothed CE", config_2_finetune),
    "3": ("panorama embed", config_3_panorama_embed),
    "4": ("ProtoRefiner refinement", config_4_refiner),
    "5": ("full eval w/ refiner", config_5_full_eval),
}


def parity_row(metric, ours, expected):
    if expected is None or not isinstance(ours, (int, float)):
        return f"  {metric:<34} ours={ours}  expected=—"
    rel = abs(ours - expected) / max(abs(expected), 1e-12)
    verdict = "OK" if rel <= PARITY_BOUND else "FAIL"
    return (f"  {metric:<34} ours={ours:.4f}  expected={expected:.4f}  "
            f"rel={rel:.4%}  [{verdict}]")


def make_dry_assets(work):
    """Synthesize a tiny self-consistent asset tree so the gate's wiring
    runs end to end with no network (the e2e fixtures' world)."""
    import numpy as np
    import pandas as pd
    from PIL import Image

    rng = np.random.default_rng(0)
    img_dir = os.path.join(work, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    cells = np.array([[-100., 40.], [10., 50.], [120., 30.]], np.float32)
    rows = []
    for i in range(36):
        c = i % 3
        color = np.zeros(3)
        color[c] = 255
        img = rng.normal(color, 40, (64, 64, 3)).clip(0, 255)
        Image.fromarray(img.astype(np.uint8)).save(f"{img_dir}/{i}.png")
        lng, lat = cells[c] + rng.normal(0, 1, 2)
        sel = ("test", "val", "train", "train")[(i // 3) % 4]
        rows.append({"image": f"{i}.png", "image_2": f"{i}.png",
                     "image_3": f"{i}.png", "image_4": f"{i}.png",
                     "lng": lng, "lat": lat, "selection": sel,
                     "geocell_idx": c})
    meta = os.path.join(work, "meta.csv")
    pd.DataFrame(rows).to_csv(meta, index=False)
    cells_csv = os.path.join(work, "cells.csv")
    pd.DataFrame({"name": ["a", "b", "c"],
                  "admin_1": ["Bavaria", "Kanto", "Texas"],
                  "country": ["Germany", "Japan", "United States"],
                  "lng": cells[:, 0], "lat": cells[:, 1]}) \
        .to_csv(cells_csv, index=False)

    # Embeddings + prototypes for the refiner configs.
    emb_dir = os.path.join(work, "emb")
    _cli(["embed", "baseline_dry", "--tiny", "--metadata", meta,
          "--images", img_dir, "--output", emb_dir, "--batch-size", "8"])
    protos = os.path.join(work, "protos.csv")
    _cli(["prototypes", "baseline_dry", "--metadata", meta,
          "--output", protos])

    # Benchmark registry: every BASELINE benchmark name points at the
    # synthetic test rows.
    df = pd.read_csv(meta)
    bench_meta = os.path.join(work, "bench_meta.csv")
    df[df["selection"] == "test"].reset_index(drop=True) \
        .to_csv(bench_meta, index=False)
    registry = os.path.join(work, "benchmarks.json")
    with open(registry, "w") as f:
        json.dump({name: {"meta": bench_meta, "images": img_dir}
                   for name in ("im2gps3k", "yfcc26k", "gws15k")}, f)

    return {"tiny": True, "geocells_csv": cells_csv,
            "benchmark_registry": registry,
            "mp16_meta": meta, "mp16_images": img_dir,
            "pano_meta": meta, "pano_images": img_dir,
            "train_meta": meta, "embeddings_dir": emb_dir,
            "prototypes_csv": protos, "finetune_epochs": 2,
            "expected": {}}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--assets", help="assets manifest JSON")
    ap.add_argument("--configs", default="1,2,3,4,5",
                    help="comma-separated config ids to run")
    ap.add_argument("--dry", action="store_true",
                    help="synthesize tiny assets; validate wiring only")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args(argv)

    import jax

    if args.dry or jax.default_backend() not in ("tpu",):
        # The gate itself must never hold the shared TPU tunnel in dry
        # mode; configs run fine on CPU.
        jax.config.update("jax_platforms", "cpu")

    work = args.workdir or tempfile.mkdtemp(prefix="baseline_gate_")
    if args.dry:
        assets = make_dry_assets(work)
    elif args.assets:
        with open(args.assets) as f:
            assets = json.load(f)
    else:
        ap.error("--assets manifest or --dry is required")

    expected_all = assets.get("expected", {})
    failures = 0
    print(f"BASELINE parity gate (bound {PARITY_BOUND:.1%}) — work={work}")
    for cid in args.configs.split(","):
        desc, fn = CONFIGS[cid.strip()]
        print(f"\nconfig #{cid}: {desc}")
        try:
            metrics = fn(assets, work)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"  ERROR: {e}")
            failures += 1
            continue
        expected = expected_all.get(cid.strip(), {})
        for k, v in metrics.items():
            line = parity_row(k, v, expected.get(k))
            print(line)
            failures += "[FAIL]" in line
    print(f"\n{'GATE FAILED' if failures else 'GATE OK'} "
          f"({failures} failures)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
