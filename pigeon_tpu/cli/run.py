"""CLI: pretrain | finetune | embed | evaluate | predict | serve | geocells.

Keeps the reference's public command surface (`run.py:21-93`:
``{pretrain,finetune,embed,evaluate} NAME`` with ``-l -b -s -a -t -m
--heading -r --yfcc``) and adds the subcommands the reference lacked
(`serve` — its server never shipped; `geocells` — its creation only ran as
a bare script). ``--resume`` actually works here (the reference raises
NotImplementedError for finetune/embed, `run.py:166-175`).

Usage:
    python -m pigeon_tpu.cli.run finetune MODEL --metadata data/meta.csv \
        --images data/imgs --geocells data/geocells.csv
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

logger = logging.getLogger("pigeon_tpu.cli")


def _load_base_checkpoint(params, base_path, num_layers):
    """Overlay a torch checkpoint (HF CLIP vision tower or reference
    SuperGuessr .model state dict) onto initialized params."""
    import torch

    from pigeon_tpu.models.hf_import import (
        import_super_guessr_params,
        import_vision_tower_params,
        merge_params,
    )

    state = torch.load(base_path, map_location="cpu")
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    if any(k.startswith(("cell_layer.", "base_model.")) for k in state):
        loaded = import_super_guessr_params(state, num_layers)
    else:
        loaded = {"vision": import_vision_tower_params(state, num_layers)}
    logger.warning("loaded checkpoint %s (%s)", base_path,
                   "+".join(sorted(loaded)))
    return merge_params(params, loaded)


def _load_refine_assets(args):
    """Load the prototype CSV + training embedding bank for refinement.

    Returns ``(proto_rows, bank_emb, bank_lla)`` or ``None`` when the
    required ``--prototypes/--embeddings/--metadata`` flags are absent.
    Rebuilds the asset loading of `evaluation/evaluate.py:52-66`.
    """
    if not (args.prototypes and args.embeddings and args.metadata):
        return None
    import numpy as np
    import pandas as pd

    from pigeon_tpu.geocell.prototypes import load_prototypes_csv
    from pigeon_tpu.models.refiner import parse_indices
    from pigeon_tpu.train.embed import load_embeddings

    # --landmarks: each flag may be a comma-separated YFCC,landmarks pair;
    # the banks concatenate and the later datasets' prototype member
    # indices shift by the bank rows before them (the reference's
    # dual-dataset refiner, `models/proto_refiner.py:53-64`).
    metas = args.metadata.split(",")
    embdirs = args.embeddings.split(",")
    protos = args.prototypes.split(",")
    if not (len(metas) == len(embdirs) == len(protos)):
        raise SystemExit("--metadata/--embeddings/--prototypes must list "
                         "the same number of comma-separated datasets")

    rows, embs, llas, offset = [], [], [], 0
    for meta_path, emb_dir, proto_path in zip(metas, embdirs, protos):
        meta = pd.read_csv(meta_path)
        if "selection" in meta.columns:
            meta = meta[meta["selection"] == "train"]
        lla = meta[["lng", "lat"]].to_numpy(np.float32)
        emb = load_embeddings(emb_dir, "train")
        if emb.ndim == 3:
            emb = emb.mean(1)
        if len(emb) != len(lla):
            # Prototype member indices address bank_emb AND bank_lla by
            # the same row number — a length mismatch would silently
            # corrupt the second dataset's lookups after the offset.
            raise SystemExit(
                f"{emb_dir}: {len(emb)} embeddings vs {len(lla)} "
                f"metadata train rows in {meta_path} — re-embed with "
                "the SAME metadata (did you embed with --sample? use "
                "the sampled metadata CSV written next to the "
                "embeddings)")
        for row in load_prototypes_csv(proto_path):
            idx = parse_indices(row["indices"])
            rows.append(dict(row, indices=[i + offset for i in idx]))
        embs.append(emb)
        llas.append(lla)
        offset += len(emb)
    return rows, np.concatenate(embs), np.concatenate(llas)


def _sample_dataset(ds, n: int):
    """Seeded RANDOM subsample of a dataset's rows (reference
    `finetune_dataset.py:132-133` uses df.sample, not head; seed 330 is
    the reference's global training seed, `config.py:100`). The
    reference samples the pre-split frame; here each split is sampled
    independently — same training-set-cap semantics. Original row ORDER
    is preserved (sort_index before reset) so downstream positional
    contracts stay stable."""
    if n and n < len(ds.df):
        ds.df = ds.df.sample(int(n), random_state=330) \
            .sort_index().reset_index(drop=True)
    return ds


def _attn_impl(train: bool = False) -> str:
    """Pallas attention on SINGLE-chip TPU backends, XLA elsewhere.

    Inference defaults to the QKV-projection+attention fusion
    (`flash_fused`, r3: 374 vs 316 img/s same-session; under masks or
    int8 quant the module falls back to 'flash' semantics per-layer).
    Training ALSO defaults to `flash_fused` since the r5 HW session:
    with the fused BACKWARD kernel (PIGEON_FUSED_BWD=kernel, now the
    default) and remat='attn_kernel' (r7) it measured 95.4 img/s bs48
    vs 88.4 under the r5 'attn_out' and 81.7 for the separate-
    projection flash:full baseline (docs/PERF.md).

    Multi-chip: `pallas_call` under a plain GSPMD jit REQUIRES Manual
    (shard_map) mesh axes — with sharded operand avals it raises
    "pallas_call requires all mesh axes to be Manual"
    (jax/_src/pallas/pallas_call.py abstract-eval check). `create_mesh`
    registers the mesh on multi-chip TPU backends and the model hosts
    'flash' / 'flash_fused' under shard_map (`sharded_mha` /
    `sharded_fused_qkv_mha` — forward collective-free, Megatron
    head-split; docs/SHARDING.md), so the defaults are uniform across
    chip counts. The r4 LN/MLP/block fusion OVERRIDES have no sharded
    wrappers yet — on a pod `PIGEON_ATTN_IMPL=flash_fused_mlp` etc.
    is the operator's responsibility.

    ``PIGEON_ATTN_IMPL`` overrides (e.g. 'flash_fused_ln' /
    'flash_fused_mlp', the r4 LN/MLP-fusion opt-ins) — TPU only, so a
    CPU run never lands on a Pallas path it cannot execute."""
    import jax

    if jax.default_backend() != "tpu":
        return "xla"
    override = os.environ.get("PIGEON_ATTN_IMPL")
    if override:
        return override
    return "flash_fused"


def _remat_override() -> dict:
    """``PIGEON_REMAT`` env override for the training remat policy
    (r8): empty dict = keep the measured default
    (`build_finetune_model`'s 'attn_kernel', 95.8 img/s bs48).
    Operator values: 'attn_slim' (one less (B, S, d) bf16 save per
    layer, −0.3% — the memory knob), 'attn_out' (the r5 winner),
    'full', 'none' (fails remote compile at production batch;
    docs/PERF.md). Mirrors the PIGEON_ATTN_IMPL override pattern."""
    value = os.environ.get("PIGEON_REMAT")
    return {"remat": value} if value else {}


def _default_batch(quant: bool) -> int:
    """Measured batch optima are ROUTE-specific (docs/PERF.md, r7):
    int8 `flash_fused` peaks at bs48 (586.2 img/s; full r7 curve 577.1
    bs40 / 572.1 bs44 / 554.2 bs52 / 555.5 bs56 / 568.4 bs64 — the
    r4 "bs48 VMEM-spills to 408" did NOT reproduce on a clean rebuild
    and is diagnosed as one pathological server-side compilation, see
    PERF.md) while the separate-projection 'flash' route peaked at
    bs24 (450); bf16 `flash_fused` peaks at bs56 (378.4 bench / 368.4
    product eval, vs 374.9 / 361.8 at the old bs48 default) but plain
    'flash' measured 313 at bs48 vs 317 at bs32. The default therefore
    follows the RESOLVED attention impl so a PIGEON_ATTN_IMPL /
    PIGEON_QUANT_ATTN_IMPL override doesn't silently land on the wrong
    batch curve (advisor r3)."""
    if quant:
        return 48 if _quant_attn_impl().startswith("flash_fused") else 24
    return 56 if _attn_impl().startswith("flash_fused") else 32


def _quant_attn_impl() -> str:
    """Attention impl for the int8 (quant='static') serving path.

    'flash_fused' routes static towers into `fused_qkv_mha_int8` —
    VALIDATED on real Mosaic in the r4 HW session (step-1 parity
    max_err 0.0 vs the separate int8 projections; e2e 565.9 vs 434.1
    img/s for the old 'flash' route at bs32, +30%) — so it is the
    default. The LN/MLP/block fused variants remain DOWNGRADED to
    'flash_fused': `fused_ln_mlp_int8` FAILED hardware parity in r4
    (0.051 > bound; Mosaic int8 lowering is exactly what interpret
    mode can't catch — CLAUDE.md rule 4) and was DELETED in r5, so
    under quant 'flash_fused_mlp' now computes exactly what
    'flash_fused' does (int8 QKV kernel + XLA quant MLP) and
    'flash_fused_block' stays blocked pending an e2e win for the int8
    block kernel (its parity passed, 0.0156; the bf16 fusion ladder
    measured slower e2e). PIGEON_QUANT_ATTN_IMPL is the explicit
    opt-in for validation runs of the blocked impls."""
    override = os.environ.get("PIGEON_QUANT_ATTN_IMPL")
    if override:
        return override
    impl = _attn_impl()
    return "flash_fused" if impl.startswith("flash_fused") else impl


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="pigeon_tpu",
        description="TPU-native PIGEON: planet-scale image geolocation.")
    p.add_argument("function",
                   choices=["pretrain", "finetune", "embed", "evaluate",
                            "predict", "serve", "geocells", "prototypes",
                            "augment", "export"],
                   help="operation to run")
    p.add_argument("name", nargs="?", default="pigeon",
                   help="model/run name or checkpoint path")
    p.add_argument("-l", "--load", default=None,
                   help="comma-separated processed dataset / benchmark "
                        "names")
    p.add_argument("-b", "--base", default=None,
                   help="path to base (vision tower) checkpoint")
    p.add_argument("-s", "--sample", type=int, default=None,
                   help="sample N training examples")
    p.add_argument("-a", "--auxiliary", action="store_true",
                   help="use auxiliary captions for pretraining")
    p.add_argument("-t", "--test", action="store_true",
                   help="evaluate on the test split")
    p.add_argument("-c", "--classification",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="geocell classification setup (the only "
                        "implemented mode — the reference's released code "
                        "likewise only logs the mode string, `run.py:99`; "
                        "--no-classification fails loudly instead of "
                        "silently training the wrong thing)")
    p.add_argument("-m", "--multitask", action="store_true",
                   help="enable multi-task heads")
    p.add_argument("--heading", action="store_true",
                   help="use compass headings")
    p.add_argument("-r", "--resume", action="store_true",
                   help="resume from the latest checkpoint")
    p.add_argument("--yfcc", action="store_true",
                   help="PIGEOTTO (planet-scale single image) preset")
    p.add_argument("--landmarks", action="store_true",
                   help="PIGEOTTO + Google Landmarks training mix "
                        "(reference `run.py:84-85`): implies the YFCC "
                        "model config with landmark data paths; refine "
                        "assets (--metadata/--embeddings/--prototypes) "
                        "accept comma-separated YFCC,landmarks pairs whose "
                        "banks are concatenated "
                        "(`models/proto_refiner.py:53-64`)")
    p.add_argument("--panorama", action="store_true",
                   help="4-view StreetView panorama input")
    p.add_argument("--metadata", default=None, help="metadata CSV path")
    p.add_argument("--images", default="", help="image directory")
    p.add_argument("--geocells", default=None, help="geocell CSV path")
    p.add_argument("--prototypes", default=None, help="prototype CSV path")
    p.add_argument("--benchmarks", default=None,
                   help="benchmark registry JSON (default: config path)")
    p.add_argument("--countries", default=None,
                   help="country-boundary GeoJSON for Country_accuracy "
                        "(reference `evaluation/metrics.py:17-20,56-88`)")
    p.add_argument("--scaler", default=None,
                   help="RegressionScaler JSON for physical-unit multi-task "
                        "MAEs (reference `evaluation/metrics.py:29-54`)")
    p.add_argument("--zeroshot", action="store_true",
                   help="evaluate: CLIP zero-shot geocell classification "
                        "via per-cell text prompts (the capability the "
                        "reference's missing `evaluation/zeroshot.py` was "
                        "imported for; `-b` loads a full HF CLIP "
                        "checkpoint)")
    p.add_argument("--hedge", action="store_true",
                   help="serve: hedge refined guesses for competitive play "
                        "(reference `models/layers/hedge.py:8-57`)")
    p.add_argument("--embeddings", default=None,
                   help="embedding shard directory")
    p.add_argument("--checkpoint-dir", default="saved_models")
    p.add_argument("--output", default=None, help="output path")
    p.add_argument("--batch-size", type=int, default=None,
                   help="per-device batch (default: mode-specific; "
                        "evaluate/predict use the measured optimum of "
                        "the RESOLVED attention impl — 48 bf16 / 32 "
                        "--quant on the default flash_fused routes, "
                        "32 / 24 under a PIGEON_ATTN_IMPL override to "
                        "a non-fused impl)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--port", type=int, default=5000)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--embedder", default="auto",
                   choices=["auto", "clip", "vit"],
                   help="embed: which tower embeds. auto = the "
                        "reference's name routing ('vit' in the run "
                        "name selects the generic ViT embedder, "
                        "`run.py:127-132`) — pass clip/vit explicitly "
                        "when the run name would mis-route")
    p.add_argument("--calib-images", default=None,
                   help="serve --quant: directory of real images for "
                        "activation-scale calibration (up to 32; "
                        "synthetic batch with extra margin otherwise)")
    p.add_argument("--serve-batch", type=int, default=0,
                   help="serve: micro-batch up to N concurrent requests "
                        "into one device dispatch (0 = serialized bs1)")
    p.add_argument("--quant", action="store_true",
                   help="serve/evaluate/predict/embed: int8 W8A8 tower "
                        "(models/quant.py; +53%% throughput on v5e, r6). "
                        "serve calibrates "
                        "activation scales on a synthetic batch at startup; "
                        "evaluate/embed calibrate on the first real "
                        "batch — run evaluate with/without --quant to bound "
                        "the int8 quality delta before serving it")
    p.add_argument("--tp", type=int, default=1,
                   help="model (tensor-parallel) mesh axis size; must "
                        "divide the device count (docs/SHARDING.md)")
    p.add_argument("--artifact", default=None,
                   help="serve: load an AOT artifact directory (from "
                        "`export`) instead of building the model; "
                        "export: see --output")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="export: comma-separated lowering platforms "
                        "baked into the artifact")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-style sharding: store params + optimizer "
                        "state 1/dp-th per device over the data axis "
                        "(pretrain/finetune; docs/SHARDING.md)")
    p.add_argument("--model", default=None,
                   choices=["vit-l14-336", "vit-b32"],
                   help="CLIP tower size (default: the preset's "
                        "ViT-L/14-336; vit-b32 matches BASELINE config "
                        "#1's zero-shot model)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model config (smoke tests)")
    p.add_argument("--aux-dir", default="data",
                   help="auxiliary geo-data root for `augment` and the "
                        "finetune auto-augmentation (layout per "
                        "scripts/get_auxiliary_data.sh: boundaries/, "
                        "koppen_geiger/, elevation/, pop_density/, "
                        "worldclim/{tavg,prec}/, driving_side.json)")
    return p


def make_config(args):
    from pigeon_tpu import pigeon_config, pigeotto_config
    import dataclasses

    if getattr(args, "landmarks", False):
        # Landmarks implies the PIGEOTTO model config with landmark data
        # paths (reference `run.py:115-138` swaps metadata/dataset paths
        # under the same YFCC model).
        from pigeon_tpu.config import landmarks_config

        cfg = landmarks_config()
    else:
        cfg = pigeotto_config() if args.yfcc else pigeon_config()
    head = cfg.head
    if args.multitask != head.multi_task:
        head = dataclasses.replace(head, multi_task=args.multitask)
    if args.heading != head.heading:
        head = dataclasses.replace(head, heading=args.heading)
    if args.panorama != head.panorama:
        head = dataclasses.replace(head, panorama=args.panorama)
    cfg = cfg.replace(head=head)
    if getattr(args, "model", None) == "vit-b32":
        from pigeon_tpu.config import vit_b32_text, vit_b32_vision

        vision = vit_b32_vision()
        cfg = cfg.replace(
            vision=vision, text=vit_b32_text(),
            head=dataclasses.replace(cfg.head,
                                     embed_dim=vision.hidden_size))
    if args.tiny:
        from pigeon_tpu.config import VisionConfig, TextConfig

        cfg = cfg.replace(
            vision=VisionConfig(image_size=64, patch_size=16,
                                hidden_size=64, intermediate_size=128,
                                num_layers=2, num_heads=4,
                                projection_dim=32),
            text=TextConfig(vocab_size=1024, hidden_size=64,
                            intermediate_size=128, num_layers=2,
                            num_heads=4, max_position_embeddings=32,
                            projection_dim=32),
            head=dataclasses.replace(cfg.head, embed_dim=64),
        )
    return cfg


def load_geocells(args):
    import numpy as np
    import pandas as pd

    if args.geocells is None:
        raise SystemExit("--geocells CSV is required for this command")
    df = pd.read_csv(args.geocells)
    return df[["lng", "lat"]].to_numpy(np.float32), df


def config_with_cells(args, cells):
    """Config with head.num_cells sized to the loaded geocell table."""
    import dataclasses

    cfg = make_config(args)
    return cfg.replace(
        head=dataclasses.replace(cfg.head, num_cells=len(cells)))


def cmd_geocells(args) -> int:
    import pandas as pd

    from pigeon_tpu.geocell import GeocellCreator
    from pigeon_tpu.geocell.creation import BoundarySet

    from pigeon_tpu.geocell.cells import (
        OPTICS_PARAMS_PLANET,
        OPTICS_PARAMS_STREETVIEW,
    )

    if args.metadata is None:
        raise SystemExit("--metadata CSV is required")
    df = pd.read_csv(args.metadata)
    cfg = make_config(args)
    admin2 = BoundarySet.from_geojson(args.load) if args.load else None
    creator = GeocellCreator(df, admin_2=admin2)
    out = args.output or "data/geocells.csv"
    # OPTICS escalation ladder per variant (reference
    # cell_collection.py:12-13): StreetView for PIGEON, planet for
    # PIGEOTTO.
    ladder = (OPTICS_PARAMS_PLANET if (args.yfcc or args.landmarks)
              else OPTICS_PARAMS_STREETVIEW)
    cells = creator.generate(cfg.geocell.min_cell_size,
                             cfg.geocell.max_cell_size,
                             optics_params=ladder, output_csv=out)
    logger.warning("wrote %d geocells to %s", len(cells), out)
    return 0


def cmd_prototypes(args) -> int:
    """Prototype CSV builder: training metadata -> per-cluster prototype
    table (reference `dataset_creation/prototype/prototype.py:69-95`,
    which only ran as a bare script — its package `__init__` is
    misnamed, SURVEY C18). Closes the artifact-regeneration ladder
    geocells -> embed -> prototypes -> evaluate as a pure-CLI path.

    ``--metadata`` (and ``--output``) accept the --landmarks
    comma-pair convention: one prototype CSV per dataset, member
    ``indices`` being per-dataset train-row positions — evaluate's
    `_load_refine_assets` applies the bank offsets when it
    concatenates (`models/proto_refiner.py:53-64` semantics).

    A metadata frame without a ``geocell_idx`` column is labeled from
    ``--geocells`` (covers + nearest fallback, `geocell/assignment.py`
    — the reference assumes `preprocess` already labeled the frame).
    """
    import numpy as np
    import pandas as pd

    from pigeon_tpu.geocell.prototypes import build_prototypes

    if args.metadata is None:
        raise SystemExit("--metadata CSV is required")
    metas = args.metadata.split(",")
    if args.output:
        outs = args.output.split(",")
    elif len(metas) == 1:
        outs = ["data/prototypes.csv"]
    else:
        outs = [f"data/prototypes_{i}.csv" for i in range(len(metas))]
    if len(outs) != len(metas):
        raise SystemExit("--output must list one CSV per --metadata "
                         "entry (comma-separated, --landmarks pairing)")

    assigner = None
    for meta_path, out in zip(metas, outs):
        df = pd.read_csv(meta_path)
        if "geocell_idx" not in df.columns:
            if args.geocells is None:
                raise SystemExit(
                    f"{meta_path} has no geocell_idx column — pass "
                    "--geocells CSV to assign cells")
            from pigeon_tpu.geocell.assignment import CellAssigner

            if assigner is None:
                assigner = CellAssigner.from_csv(args.geocells)
            df = df.copy()
            df["geocell_idx"] = assigner.assign(
                df[["lng", "lat"]].to_numpy(np.float64))
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        table = build_prototypes(df, output_csv=out)
        logger.warning("wrote %d prototype clusters across %d cells to "
                       "%s", len(table),
                       table["geocell_idx"].nunique() if len(table) else 0,
                       out)
    return 0


def _augment_frame(df, args, source: str):
    """Run the GeoAugmentor over a metadata frame (gated on auxiliary
    data presence). Returns the enriched frame, or the original when no
    auxiliary source exists under ``--aux-dir``."""
    from pigeon_tpu.geocell.augmentor import build_augmentor

    aug = build_augmentor(args.aux_dir)
    if aug is None:
        logger.warning(
            "no auxiliary data under %s — %s is NOT augmented (fetch "
            "with scripts/get_auxiliary_data.sh, or pass --aux-dir)",
            args.aux_dir, source)
        return df
    return aug.augment(df)


def _maybe_augment_multitask(df, args, source: str):
    """Auto-augment a finetune metadata frame whose multi-task columns
    are missing — the reference runs its GeoAugmentor inside the
    finetune dataset build exactly when those columns are absent
    (`dataset_creation/finetune/finetune_dataset.py:135-137`). Gated on
    --multitask (no point paying raster sampling the heads won't read)
    and on auxiliary-data presence."""
    if not getattr(args, "multitask", False):
        return df
    from pigeon_tpu.data.pipeline import MT_COLUMNS

    missing = [c for c in (*MT_COLUMNS, "climate_zone_idx")
               if c not in df.columns]
    if not missing:
        return df
    logger.warning("%s lacks multi-task columns %s — running the "
                   "GeoAugmentor (reference finetune_dataset.py:135-137)",
                   source, missing)
    df = _augment_frame(df, args, source)
    still = [c for c in missing if c not in df.columns]
    if still:
        # -m without the label columns would crash inside the loss;
        # fail with the fix instead.
        raise SystemExit(
            f"--multitask needs columns {still} that {source} lacks and "
            f"augmentation could not supply from --aux-dir={args.aux_dir} "
            "(fetch sources with scripts/get_auxiliary_data.sh or run "
            "`pigeon_tpu augment` with the needed rasters), or drop -m")
    return df


def cmd_augment(args) -> int:
    """Offline metadata enrichment (reference
    `preprocessing/geo_augmentor.py:301-353`, which ships as a bare
    script): (lng, lat) CSV in -> CSV with country/admin-1 names,
    Köppen climate zone + index, elevation, population, WorldClim
    temperature/precipitation stats — the multi-task label and caption
    ingredient columns `data/pipeline.py` reads. Sources are discovered
    under ``--aux-dir`` (layout per `scripts/get_auxiliary_data.sh`);
    missing sources skip their columns."""
    import pandas as pd

    if args.metadata is None:
        raise SystemExit("--metadata CSV is required")
    df = pd.read_csv(args.metadata)
    if not {"lng", "lat"} <= set(df.columns):
        raise SystemExit(f"{args.metadata} needs lng/lat columns")
    before = set(df.columns)
    out_df = _augment_frame(df, args, args.metadata)
    out = args.output or (os.path.splitext(args.metadata)[0]
                          + "_augmented.csv")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    out_df.to_csv(out, index=False)
    logger.warning("wrote %s (+%s)", out,
                   sorted(set(out_df.columns) - before) or "no columns")
    return 0


def cmd_finetune(args) -> int:
    if args.embeddings:
        return _finetune_on_embeddings(args)
    return _finetune_on_pixels(args)


def _finetune_on_embeddings(args) -> int:
    """Headless geocell-head training on precomputed embeddings
    (reference `training/train_modes.py:110-133`)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd

    from pigeon_tpu.train import (
        create_mesh, create_train_state, make_eval_step, make_train_step,
        shard_batch, state_shardings,
    )
    from pigeon_tpu.train.embed import load_embeddings
    from pigeon_tpu.train.loop import train_model
    from pigeon_tpu.train.modes import build_embedding_model
    from pigeon_tpu.train.train_loop import adamw

    cells, _ = load_geocells(args)
    cfg = config_with_cells(args, cells)
    model = build_embedding_model(cfg)
    mesh = create_mesh(tp=args.tp)
    tcfg = cfg.train
    batch = args.batch_size or tcfg.batch_size_per_device

    meta = pd.read_csv(args.metadata)
    splits = {}
    for split in ("train", "val"):
        rows = meta[meta["selection"] == split].reset_index(drop=True) \
            if "selection" in meta.columns else meta
        emb = load_embeddings(args.embeddings, split)
        if emb.ndim == 3 and not cfg.head.panorama:
            emb = emb.mean(1)
        splits[split] = (emb.astype(np.float32), rows)

    dim = splits["train"][0].shape[-1]
    views = (4,) if cfg.head.panorama else ()
    example = (jnp.zeros((2, *views, dim)),)
    opt = adamw(tcfg.learning_rate)
    state = create_train_state(jax.random.PRNGKey(tcfg.seed), model, opt,
                               example, mesh=mesh, fsdp=args.fsdp)
    step = make_train_step(model, opt, cfg.head, cells,
                           out_shardings=(state_shardings(state)
                                          if args.fsdp else None))
    eval_step = make_eval_step(model, cfg.head, cells)

    def batches(split, shuffle_seed=None):
        emb, rows = splits[split]
        order = np.arange(len(emb))
        if shuffle_seed is not None:
            np.random.default_rng(shuffle_seed).shuffle(order)
        for start in range(0, len(order) - batch + 1, batch):
            idx = order[start:start + batch]
            b = {"inputs": emb[idx],
                 "labels": rows.iloc[idx][["lng", "lat"]]
                 .to_numpy(np.float32)}
            if "geocell_idx" in rows.columns:
                b["labels_clf"] = rows.iloc[idx]["geocell_idx"] \
                    .to_numpy(np.int32)
            yield b

    to_dev = lambda b: shard_batch(  # noqa: E731
        {k: jnp.asarray(v) for k, v in b.items()}, mesh)
    ckpt_dir = os.path.join(args.checkpoint_dir, args.name)
    state, history = train_model(
        state, step, eval_step,
        lambda e: batches("train", shuffle_seed=e),
        lambda: batches("val"),
        num_epochs=args.epochs or tcfg.num_epochs,
        rng=jax.random.PRNGKey(0), checkpoint_dir=ckpt_dir,
        log_dir=os.path.join("runs", args.name),
        early_stopping_patience=tcfg.early_stopping_patience,
        batch_to_device=to_dev)
    logger.warning("final metrics: %s", history[-1] if history else {})
    return 0


def _finetune_on_pixels(args) -> int:
    import jax
    import jax.numpy as jnp

    from pigeon_tpu.data import TabularImageDataset, iter_batches
    from pigeon_tpu.train import (
        create_mesh, create_train_state, make_eval_step, make_train_step,
        shard_batch, state_shardings,
    )
    from pigeon_tpu.train.checkpoints import latest_step, restore_checkpoint
    from pigeon_tpu.train.loop import train_model
    from pigeon_tpu.train.modes import build_finetune_model
    from pigeon_tpu.train.train_loop import adamw

    cells, _ = load_geocells(args)
    cfg = config_with_cells(args, cells)
    model, mask_builder = build_finetune_model(
        cfg, attn_impl=_attn_impl(train=True),
        **_remat_override())
    tcfg = cfg.train
    batch = args.batch_size or tcfg.batch_size_per_device
    mesh = create_mesh(tp=args.tp)

    views = (4,) if cfg.head.panorama else ()
    example = (jnp.zeros((2, *views, cfg.vision.image_size,
                          cfg.vision.image_size, 3)),)
    opt = adamw(tcfg.learning_rate)
    state = create_train_state(jax.random.PRNGKey(tcfg.seed), model, opt,
                               example, mesh=mesh, fsdp=args.fsdp)
    ckpt_dir = os.path.join(args.checkpoint_dir, args.name)
    if args.base:
        state = state.replace(params=_load_base_checkpoint(
            state.params, args.base, cfg.vision.num_layers))
    if args.resume and latest_step(ckpt_dir) is not None:
        state = restore_checkpoint(ckpt_dir, state)
        logger.warning("resumed from step %d", int(state.step))

    mask = mask_builder(state.params)
    step = make_train_step(model, opt, cfg.head, cells, grad_mask=mask,
                           out_shardings=(state_shardings(state)
                                          if args.fsdp else None))
    eval_step = make_eval_step(model, cfg.head, cells)

    # uint8 host pipeline: decode+resize on workers, normalize on device
    # (4x less host->device transfer; the steps dtype-dispatch on uint8).
    # --metadata accepts a comma-separated list: train splits concatenate
    # and val comes from the FIRST dataset — the reference's multi-
    # dataset training mix (`run.py:143-156`, used for the landmarks
    # variant).
    import pandas as pd

    meta_paths = args.metadata.split(",")
    kw = dict(image_dir=args.images, image_size=cfg.vision.image_size,
              panorama=cfg.head.panorama, normalize=False)
    train_frames = []
    val_frame = None
    for i, path in enumerate(meta_paths):
        df = _maybe_augment_multitask(pd.read_csv(path), args, path)
        if i == 0:
            # val comes from the FIRST dataset; slice it from the same
            # (possibly augmented) frame so both splits carry the
            # multi-task columns.
            val_frame = (df[df["selection"] == "val"]
                         if "selection" in df.columns else df) \
                .reset_index(drop=True)
        if "selection" in df.columns:
            df = df[df["selection"] == "train"]
        train_frames.append(df)
    train = TabularImageDataset(
        pd.concat(train_frames, ignore_index=True), **kw)
    if len(meta_paths) > 1:
        logger.warning("training on %d concatenated datasets "
                       "(%d rows); val from %s", len(meta_paths),
                       len(train), meta_paths[0])
    val = TabularImageDataset(val_frame, **kw)
    if args.sample:
        train = _sample_dataset(train, args.sample)

    to_dev = lambda b: shard_batch(  # noqa: E731
        {k: jnp.asarray(v) for k, v in b.items()}, mesh)
    state, history = train_model(
        state, step, eval_step,
        lambda e: iter_batches(train, batch, shuffle=True, seed=e,
                               drop_last=True),
        lambda: iter_batches(val, batch),
        num_epochs=args.epochs or tcfg.num_epochs,
        rng=jax.random.PRNGKey(0),
        checkpoint_dir=ckpt_dir,
        log_dir=os.path.join("runs", args.name),
        early_stopping_patience=tcfg.early_stopping_patience,
        batch_to_device=to_dev)
    logger.warning("final metrics: %s", history[-1] if history else {})
    return 0


def cmd_embed(args) -> int:
    import jax
    import jax.numpy as jnp

    from pigeon_tpu.data import TabularImageDataset
    from pigeon_tpu.models.embedder import ClipEmbedder
    from pigeon_tpu.train.embed import embed_splits_to_disk

    cfg = make_config(args)
    # The reference routes 'vit' model names to its (undefined)
    # VITEmbedding and everything else to the CLIP embedder
    # (`run.py:127-132`); here both paths are real.
    if args.embedder != "auto":
        use_vit = args.embedder == "vit"
    else:
        use_vit = "vit" in (args.name or "").lower() \
            and getattr(args, "model", None) is None
    if use_vit:
        from pigeon_tpu.models.vit_embedder import ViTEmbedder

        if getattr(args, "quant", False):
            raise SystemExit("embed --quant supports the CLIP embedder "
                             "only (the ViT tower has no quant twin)")
        model = ViTEmbedder(cfg.vision, dtype=jnp.bfloat16,
                            attn_impl=_attn_impl())
        logger.warning("using the generic ViT embedder for %r", args.name)
    else:
        model = ClipEmbedder(cfg.vision, dtype=jnp.bfloat16,
                             attn_impl=_attn_impl())
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3))
    )["params"]
    if args.base:
        import torch

        state = torch.load(args.base, map_location="cpu")
        if use_vit:
            from pigeon_tpu.models.vit_embedder import import_vit_params

            params = import_vit_params(state, cfg.vision.num_layers)
        else:
            from pigeon_tpu.models.hf_import import (
                import_vision_tower_params,
            )

            params = {"vision": import_vision_tower_params(
                state, cfg.vision.num_layers)}
        logger.warning("loaded vision tower from %s", args.base)

    out = args.output or args.embeddings or "data/embeddings"
    splits = {}
    for split in ("train", "val", "test"):
        ds = TabularImageDataset.from_csv(
            args.metadata, split, args.images,
            image_size=cfg.vision.image_size, panorama=cfg.head.panorama,
            normalize=False)
        if args.sample:
            ds = _sample_dataset(ds, args.sample)
        if len(ds):
            splits[split] = ds
    if args.sample:
        # Embedding row i corresponds to SAMPLED metadata row i — write
        # the sampled metadata next to the bank so prototypes/evaluate
        # are built against the matching frame (the full CSV's row
        # numbering no longer applies; _load_refine_assets validates
        # the lengths).
        import pandas as pd

        sampled = pd.concat([d.df for d in splits.values()],
                            ignore_index=True)
        os.makedirs(out, exist_ok=True)
        sampled_csv = os.path.join(out, "metadata_sampled.csv")
        sampled.to_csv(sampled_csv, index=False)
        logger.warning(
            "--sample: wrote the sampled metadata to %s — use it as "
            "--metadata for prototypes/finetune/evaluate against these "
            "embeddings", sampled_csv)
    batch_size = args.batch_size or cfg.train.embed_batch_size_per_device
    if getattr(args, "quant", False):
        # int8 W8A8 embed sweep: the sweep is the heaviest offline job in
        # the product (the reference fans it over every GPU,
        # `preprocessing/embed.py:16-83`); the int8 tower runs it at the
        # bench-measured +53% over bf16 (577.9 vs 378.4 img/s, r6).
        # Same recipe as `evaluate --quant`: per-channel weight quant +
        # activation scales calibrated on the first REAL batch. The
        # token-mean embedding quality bound is pinned by
        # tests/test_quant.py (cosine) and the embed CLI e2e test.
        from pigeon_tpu.data.image_ops import normalize_images
        from pigeon_tpu.data.pipeline import iter_batches
        from pigeon_tpu.models.quant import quantize_and_calibrate

        if not splits:
            raise SystemExit("no non-empty split to calibrate --quant on")
        first_ds = next(iter(splits.values()))
        first = next(iter(iter_batches(first_ds, min(8, len(first_ds)))))
        pixels = jnp.asarray(first["inputs"])
        if pixels.ndim == 5:               # panorama: fold views
            pixels = pixels.reshape(-1, *pixels.shape[2:])
        calib = normalize_images(pixels)
        dyn = ClipEmbedder(cfg.vision, dtype=jnp.bfloat16,
                           attn_impl=_quant_attn_impl(), quant=True)
        params = quantize_and_calibrate(dyn, params, calib,
                                        tower_key="vision")
        model = ClipEmbedder(cfg.vision, dtype=jnp.bfloat16,
                             attn_impl=_quant_attn_impl(), quant="static")
        # The int8 route's batch optimum (docs/PERF.md r7: bs48)
        # replaces the bf16 sweep batch unless overridden.
        batch_size = args.batch_size or _default_batch(True)
        logger.warning("embedding through the int8 W8A8 tower "
                       "(calibrated on %d images, batch %d)",
                       int(calib.shape[0]), batch_size)
    embed_splits_to_disk(model, params, splits, out, batch_size=batch_size)
    logger.warning("wrote embeddings for %s to %s", sorted(splits), out)
    return 0


def _init_and_restore(args, cfg, model, example):
    """Init params, then restore the run's latest Orbax checkpoint if one
    exists, else overlay ``--base`` (torch) weights. Shared by
    evaluate/serve/predict — one restore policy for every inference
    surface."""
    import jax
    import jax.numpy as jnp  # noqa: F401

    from pigeon_tpu.train.checkpoints import latest_step

    params = jax.jit(model.init)(jax.random.PRNGKey(0), example)["params"]
    ckpt_dir = os.path.join(args.checkpoint_dir, args.name)
    if latest_step(ckpt_dir) is not None:
        from pigeon_tpu.train import create_train_state
        from pigeon_tpu.train.checkpoints import restore_checkpoint
        from pigeon_tpu.train.train_loop import adamw

        state = create_train_state(jax.random.PRNGKey(0), model,
                                   adamw(1e-4), (example,))
        state = restore_checkpoint(ckpt_dir, state)
        logger.warning("restored checkpoint step %d from %s",
                       int(state.step), ckpt_dir)
        return state.params
    if args.base:
        return _load_base_checkpoint(params, args.base,
                                     cfg.vision.num_layers)
    return params


def _quantize_for_inference(cfg, params, calib_pixels,
                            margin: float = 1.0, attn_impl=None):
    """int8 W8A8 tower for inference (`models/quant.py`).

    Quantizes the tower weights per output channel, freezes activation
    scales from one observed ``calib_pixels`` batch (CLIP-normalized
    float32) with ``margin`` headroom, and returns
    ``(static_quant_model, params)``.
    """
    import jax.numpy as jnp

    from pigeon_tpu.models.quant import quantize_and_calibrate
    from pigeon_tpu.models.super_guessr import SuperGuessr

    if attn_impl is None:
        attn_impl = _quant_attn_impl()
    dyn = SuperGuessr(cfg.vision, cfg.head, dtype=jnp.bfloat16,
                      attn_impl=attn_impl, quant=True)
    params = quantize_and_calibrate(dyn, params, calib_pixels,
                                    tower_key="vision", margin=margin)
    model = SuperGuessr(cfg.vision, cfg.head, dtype=jnp.bfloat16,
                        attn_impl=attn_impl, quant="static")
    return model, params


def _build_zeroshot_eval_step(args, cfg, cells, cells_df, num_candidates):
    """CLIP zero-shot geocell eval step (BASELINE config #1): one text
    prompt per geocell -> text-tower embeddings -> cosine classifier.
    Rebuilds the capability behind the reference's MISSING
    `evaluation/zeroshot.py` (`evaluation/__init__.py:3`)."""
    import jax
    import jax.numpy as jnp

    from pigeon_tpu.data.tokenizer import load_tokenizer
    from pigeon_tpu.models.clip import CLIPModel
    from pigeon_tpu.models.zeroshot import (
        embed_prompts,
        geocell_prompts,
        make_zero_shot_eval_step,
    )

    max_tokens = min(cfg.text.max_position_embeddings, 77)
    # context_len = max_tokens so the tokenizer itself truncates and
    # re-appends EOS — slicing a 77-wide row at max_tokens can drop the
    # EOS, and first-EOS pooling (models/clip.py) would silently pool
    # position 0 for that prompt.
    tokenizer = load_tokenizer(context_len=max_tokens,
                               fallback_vocab_size=cfg.text.vocab_size)
    eos = getattr(tokenizer, "eos_id", 49407)
    if eos >= cfg.text.vocab_size:
        raise SystemExit(
            f"tokenizer eos id {eos} exceeds the text vocab "
            f"({cfg.text.vocab_size}); use matching vocab assets")
    model = CLIPModel(cfg.vision, cfg.text, dtype=jnp.bfloat16,
                      eos_token_id=eos)
    size = cfg.vision.image_size
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)),
        jnp.zeros((1, max_tokens), jnp.int32))["params"]
    if args.base:
        import torch

        from pigeon_tpu.models.hf_import import (
            import_clip_params,
            merge_params,
        )

        state = torch.load(args.base, map_location="cpu")
        if hasattr(state, "state_dict"):
            state = state.state_dict()
        params = merge_params(params, import_clip_params(
            state, cfg.vision.num_layers, cfg.text.num_layers))
        logger.warning("loaded full CLIP checkpoint %s", args.base)

    prompts = geocell_prompts(cells_df.to_dict("records"))
    ids = tokenizer(prompts)
    text_embeds = embed_prompts(model, params, ids)
    logger.warning("zero-shot: %d geocell prompts embedded", len(prompts))
    return make_zero_shot_eval_step(model, params, text_embeds, cells,
                                    num_candidates=num_candidates,
                                    attn_impl=_attn_impl())


def cmd_evaluate(args) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd

    from pigeon_tpu.data import BenchmarkDataset, iter_batches
    from pigeon_tpu.models.super_guessr import SuperGuessr
    from pigeon_tpu.train import make_eval_step
    from pigeon_tpu.train.evaluate import (
        EVAL_NUM_CANDIDATES,
        build_refiner,
        evaluate_benchmark,
        refiner_preset,
    )

    cells, cells_df = load_geocells(args)
    cfg = config_with_cells(args, cells)
    if args.zeroshot and args.quant:
        raise SystemExit("--zeroshot and --quant are exclusive (the int8 "
                         "path quantizes the SuperGuessr tower)")
    model = params = None
    if not args.zeroshot:
        model = SuperGuessr(cfg.vision, cfg.head, dtype=jnp.bfloat16,
                            attn_impl=_attn_impl())
        views = (4,) if cfg.head.panorama else ()
        example = jnp.zeros((1, *views, cfg.vision.image_size,
                             cfg.vision.image_size, 3))
        params = _init_and_restore(args, cfg, model, example)

    # Prototype bank built ONCE; a refine function per benchmark family
    # (the per-family topk/temperature/guard presets differ —
    # `train/evaluate.py::REFINER_PRESETS`).
    make_refine = lambda _name: None  # noqa: E731
    assets = _load_refine_assets(args)
    if assets is not None and args.zeroshot:
        logger.warning("--zeroshot skips refinement: the prototype bank "
                       "holds vision-tower embeddings, zero-shot images "
                       "live in the CLIP projection space")
        assets = None
    if assets is not None:
        proto_rows, bank_emb, bank_lla = assets

        def make_refine(name):
            return build_refiner(proto_rows, bank_emb, bank_lla,
                                 num_cells=len(cells),
                                 cfg=refiner_preset(name))

    # Optional full-suite inputs: country polygons for Country_accuracy and
    # the regression scaler for physical-unit multi-task MAEs (reference
    # `evaluation/metrics.py:17-20,29-54`).
    scaler = country_index = None
    if args.scaler:
        from pigeon_tpu.train.metrics import RegressionScaler

        scaler = RegressionScaler.load(args.scaler)
    if args.countries:
        from pigeon_tpu.train.metrics import CountryIndex

        country_index = CountryIndex(args.countries)

    results = {}
    if args.load is None and args.test:
        # -t without benchmarks: evaluate the metadata's test holdout
        # (the reference's EvalDataset path, `run.py:162` + eval_dataset.py).
        # --metadata may be a comma-separated pair (the --landmarks
        # convention, see _load_refine_assets): concatenate the test
        # splits, mirroring the finetune concat.
        from pigeon_tpu.data import TabularImageDataset

        names = ["test"]
        def make_ds(_name):
            frames = [pd.read_csv(m) for m in args.metadata.split(",")]
            frames = [f[f["selection"] == "test"]
                      if "selection" in f.columns else f for f in frames]
            df = pd.concat(frames, ignore_index=True)
            return TabularImageDataset(
                df, args.images,
                image_size=cfg.vision.image_size,
                panorama=cfg.head.panorama, normalize=False)
    else:
        names = (args.load or "im2gps3k").split(",")
        def make_ds(name):
            return BenchmarkDataset(
                name, args.benchmarks or cfg.paths.benchmark_registry,
                image_size=cfg.vision.image_size, normalize=False)

    ds_cache = {}

    def get_ds(name):
        if name not in ds_cache:
            ds_cache[name] = make_ds(name)
        return ds_cache[name]

    if getattr(args, "quant", False):
        # Calibrate activation scales on the first REAL batch of the first
        # benchmark, then evaluate everything through the int8 tower —
        # with/without --quant bounds the int8 quality delta on real data
        # (the validation step docs/PERF.md calls for before serving int8).
        from pigeon_tpu.data.image_ops import normalize_images

        first = next(iter(iter_batches(get_ds(names[0]),
                                       min(8, args.batch_size or 8))))
        calib = normalize_images(jnp.asarray(first["inputs"]))
        model, params = _quantize_for_inference(cfg, params, calib)
        logger.warning("evaluating through the int8 W8A8 tower "
                       "(calibrated on %d real %s images)",
                       int(calib.shape[0]), names[0])

    if args.zeroshot:
        eval_step = _build_zeroshot_eval_step(args, cfg, cells, cells_df,
                                              EVAL_NUM_CANDIDATES)
    else:
        eval_step = make_eval_step(model, cfg.head, cells,
                                   num_candidates=EVAL_NUM_CANDIDATES)

    # Multi-chip eval: shard params by the TP rules and batches over the
    # data axis; GSPMD inserts the collectives (docs/SHARDING.md).
    # `shard_batch` itself replicates ragged tail batches.
    to_dev = lambda b: {k: jnp.asarray(v) for k, v in b.items()}  # noqa: E731
    if jax.device_count() > 1 or args.tp > 1:
        from pigeon_tpu.train import create_mesh, shard_batch
        from pigeon_tpu.train.mesh import shard_params

        mesh = create_mesh(tp=args.tp)
        if params is not None:       # zeroshot binds its params in-jit
            params = shard_params(params, mesh)

        def to_dev(b):  # noqa: F811
            return shard_batch(
                {k: jnp.asarray(v) for k, v in b.items()}, mesh)
        logger.warning("evaluating on %d devices (mesh %s)",
                       jax.device_count(), dict(mesh.shape))

    # Measured eval-pipeline optima (docs/PERF.md, r7): on the
    # validated flash_fused int8 route the optimum is bs48 (561.1
    # img/s refined vs 544.4 bs40; bench forward 586.2 bs48). bf16
    # keeps the r6 re-optimum bs56 (368.4 refined vs 361.8 bs48).
    # Route-aware: an impl override shifts the default with it.
    default_batch = _default_batch(getattr(args, "quant", False))
    for benchmark in names:
        ds = get_ds(benchmark)
        metrics = evaluate_benchmark(
            eval_step, params,
            iter_batches(ds, args.batch_size or default_batch),
            refine_fn=make_refine(benchmark), scaler=scaler,
            country_index=country_index, batch_to_device=to_dev)
        results[benchmark] = metrics
        logger.warning("%s: %s", benchmark, metrics)
    if args.output:
        import json

        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)
    return 0


def cmd_predict(args) -> int:
    """Batch geolocation: images in -> coordinates CSV out.

    The deployment surface the reference never shipped as a command (its
    only inference paths were the benchmark evaluator and the absent bot
    server). Input is either ``--images DIR`` (recursive scan, single
    image per sample) or ``-l/--load CSV`` (metadata rows with `image`
    [+ `image_2..4` when --panorama] columns, resolved against
    ``--images`` as a prefix). Output CSV columns: image, lat, lng,
    geocell_idx, top1_prob. With refinement assets
    (``--prototypes/--embeddings/--metadata``) lat/lng/geocell_idx are
    the REFINED guess; top1_prob stays the unrefined model confidence
    (the refiner outputs a choice, not a calibrated probability).
    ``--quant`` runs the int8 tower, calibrated on the first batch.
    """
    import glob

    import jax
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd

    from pigeon_tpu.data import TabularImageDataset, iter_batches
    from pigeon_tpu.models.super_guessr import SuperGuessr
    from pigeon_tpu.serve.server import make_serving_fn
    from pigeon_tpu.train.transfer import start_host_copies

    cells, _ = load_geocells(args)
    cfg = config_with_cells(args, cells)
    model = SuperGuessr(cfg.vision, cfg.head, dtype=jnp.bfloat16,
                        attn_impl=_attn_impl())
    views = (4,) if cfg.head.panorama else ()
    size = cfg.vision.image_size
    example = jnp.zeros((1, *views, size, size, 3))
    params = _init_and_restore(args, cfg, model, example)

    if args.load:
        df = pd.read_csv(args.load)
        names = df["image"].astype(str).tolist()
    else:
        if not args.images:
            raise SystemExit("predict needs --images DIR or -l CSV")
        exts = (".jpg", ".jpeg", ".png", ".webp", ".bmp")
        names = sorted(
            p for p in glob.glob(os.path.join(args.images, "**"),
                                 recursive=True)
            if p.lower().endswith(exts))
        if not names:
            raise SystemExit(f"no images under {args.images}")
        if cfg.head.panorama:
            raise SystemExit("--panorama predict needs -l CSV with "
                             "image..image_4 columns")
        df = pd.DataFrame({"image": names})
    ds = TabularImageDataset(df, args.images if args.load else "",
                             image_size=size, panorama=cfg.head.panorama,
                             normalize=False)

    # r7 optima (docs/PERF.md): int8 flash_fused peaks at bs48
    # (586.2); bf16 flash_fused at bs56 (378.4).
    batch = args.batch_size or _default_batch(getattr(args, "quant",
                                                      False))

    def pixel_batches():
        """Threaded decode + prefetch (`data/pipeline.iter_batches`),
        tail padded to the one compiled batch shape."""
        for b in iter_batches(ds, batch):
            pixels = b["inputs"]
            n = len(pixels)
            if n < batch:
                pixels = np.concatenate(
                    [pixels, np.repeat(pixels[-1:], batch - n, 0)])
            yield pixels, n

    batches_it = pixel_batches()
    pending = []  # first batch kept for the main loop (no double decode)
    if getattr(args, "quant", False):
        from pigeon_tpu.data.image_ops import normalize_images

        first = next(batches_it)
        pending.append(first)
        calib = normalize_images(jnp.asarray(first[0][:8]))
        model, params = _quantize_for_inference(cfg, params, calib)
        logger.warning("predicting through the int8 W8A8 tower")

    # Multi-chip prediction: the compiled batch shape is fixed (tail is
    # padded), so every dispatch shards evenly over the data axis.
    place = lambda x: x  # noqa: E731
    if jax.device_count() > 1 or args.tp > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        from pigeon_tpu.train import create_mesh
        from pigeon_tpu.train.mesh import shard_params

        mesh = create_mesh(tp=args.tp)
        if batch % mesh.shape["data"] == 0:
            params = shard_params(params, mesh)
            sh = NamedSharding(mesh, PartitionSpec("data"))
            place = lambda x: jax.device_put(x, sh)  # noqa: E731
            logger.warning("predicting on %d devices (mesh %s)",
                           jax.device_count(), dict(mesh.shape))
        else:
            logger.warning(
                "batch size %d not divisible by the data axis (%d); "
                "running single-device", batch, mesh.shape["data"])

    serve_fn = make_serving_fn(model, params, cfg.head, cells)

    refine_fn = None
    assets = _load_refine_assets(args)
    if assets is not None:
        from pigeon_tpu.train.evaluate import build_refiner, refiner_preset

        family = "geoguessr" if cfg.head.panorama else "im2gps3k"
        refine_fn = build_refiner(*assets, num_cells=len(cells),
                                  cfg=refiner_preset(family))
        logger.warning("refinement enabled (%s preset)", family)

    import itertools

    # One-batch-deep device->host pipeline (same pattern as
    # train/embed.py): dispatch batch N+1 before converting batch N's
    # outputs, with async host copies started at dispatch time —
    # otherwise every batch pays ~3 x 32 ms of readback round-trips.
    def device_outputs(pixels):
        out = serve_fn(place(jnp.asarray(pixels, jnp.uint8)))
        arrays = (out["pred_lla"], out["topk_cells"], out["topk_probs"])
        if refine_fn is not None:
            refined = refine_fn(
                out["embedding"], out["pred_lla"], out["topk_cells"],
                out["topk_probs"])
            arrays = (refined["pred_lla"], refined["pred_cell"],
                      out["topk_probs"])
        start_host_copies(arrays)
        return arrays

    def emit(arrays, n):
        lla = np.asarray(arrays[0], np.float64)
        cells_or_topk = np.asarray(arrays[1])
        cell_idx = (cells_or_topk if cells_or_topk.ndim == 1
                    else cells_or_topk[:, 0])
        prob = np.asarray(arrays[2], np.float64)[:, 0]
        for i in range(n):
            out_rows.append({"image": names[len(out_rows)],
                             "lat": lla[i, 1], "lng": lla[i, 0],
                             "geocell_idx": int(cell_idx[i]),
                             "top1_prob": prob[i]})

    out_rows = []
    prev = None
    for pixels, n in itertools.chain(pending, batches_it):
        arrays = device_outputs(pixels)
        if prev is not None:
            emit(*prev)
        prev = (arrays, n)
    if prev is not None:
        emit(*prev)
    result = pd.DataFrame(out_rows)
    out_path = args.output or "predictions.csv"
    result.to_csv(out_path, index=False)
    logger.warning("wrote %d predictions to %s", len(result), out_path)
    return 0


def cmd_pretrain(args) -> int:
    import jax
    import jax.numpy as jnp

    from pigeon_tpu.data.tokenizer import load_tokenizer
    from pigeon_tpu.models.clip import CLIPModel
    from pigeon_tpu.train import (
        create_mesh,
        create_train_state,
        shard_batch,
        state_shardings,
    )
    from pigeon_tpu.train.modes import (
        make_pretrain_step,
        pretrain,
        pretrain_optimizer,
    )

    cfg = make_config(args)
    # Fallback hash tokenizer sized to the model vocab so ids are in-range
    # by construction; a real CLIP vocab must FIT the configured vocab —
    # silently wrapping ids would also wrap EOS and break first-EOS pooling
    # (`models/clip.py`).
    tokenizer = load_tokenizer(fallback_vocab_size=cfg.text.vocab_size)
    tok_vocab = getattr(tokenizer, "vocab_size", cfg.text.vocab_size)
    if tok_vocab > cfg.text.vocab_size:
        raise SystemExit(
            f"tokenizer vocab ({tok_vocab}) exceeds the configured text "
            f"vocab ({cfg.text.vocab_size}); use a matching config or "
            f"vocab assets")
    # attn_impl + remat were previously left at their defaults here
    # ("xla", no remat) — on a real chip that forfeits the Pallas
    # kernels and OOMs HBM at the production batch (full activation
    # storage for 24 layers does not fit one v5e; docs/PERF.md).
    # remat='attn_kernel' is the r7 training winner (finetune 95.4 vs
    # 88.4 img/s bs48 under 'attn_out', the prior r5 winner; it
    # additionally saves the pre-out-proj kernel output so the remat
    # pass skips the fused QKV forward rerun); CPU keeps no-remat
    # (compile speed).
    model = CLIPModel(cfg.vision, cfg.text, dtype=jnp.bfloat16,
                      eos_token_id=getattr(tokenizer, "eos_id", 49407),
                      attn_impl=_attn_impl(train=True),
                      remat=_remat_override().get(
                          "remat",
                          "attn_kernel"
                          if jax.default_backend() == "tpu"
                          else False))

    import pandas as pd

    from pigeon_tpu.data.pretrain import PretrainDataset

    df = pd.read_csv(args.metadata)
    ds = PretrainDataset(df, args.images,
                         variant=("yfcc" if (args.yfcc or args.landmarks)
                                  else "streetview"),
                         auxiliary=args.auxiliary,
                         image_size=cfg.vision.image_size)

    batch_size = args.batch_size or cfg.train.pretrain_batch_size_per_device
    steps_per_epoch = max(len(ds) // batch_size, 1)
    epochs = args.epochs or cfg.train.pretrain_num_epochs
    opt = pretrain_optimizer(cfg, steps_per_epoch * epochs)

    max_tokens = min(cfg.text.max_position_embeddings, 77)
    example = (jnp.zeros((2, cfg.vision.image_size, cfg.vision.image_size,
                          3)),
               jnp.zeros((2, max_tokens), jnp.int32))
    # Pretrain shards over the full mesh: batches over the data axis
    # (global-batch contrastive negatives ride the all-gather), params
    # by the TP rules — plus ZeRO storage sharding under --fsdp.
    mesh = create_mesh(tp=args.tp)
    state = create_train_state(
        jax.random.PRNGKey(cfg.train.pretrain_seed), model, opt, example,
        mesh=mesh, fsdp=args.fsdp, init_kwargs={})
    step = make_pretrain_step(
        model, opt, out_shardings=(state_shardings(state)
                                   if args.fsdp else None))

    def batches(epoch):
        for batch in ds.batches(tokenizer, batch_size, shuffle=True,
                                seed=epoch, max_tokens=max_tokens):
            yield shard_batch({
                "pixel_values": jnp.asarray(batch["pixel_values"]),
                "input_ids": jnp.asarray(batch["input_ids"]),
            }, mesh)

    # Before/after in-batch retrieval probe (reference
    # `training/train_modes.py:53-64`).
    from pigeon_tpu.train.modes import make_retrieval_probe, \
        retrieval_accuracy

    probe = make_retrieval_probe(model)

    def probe_batches(limit=4):
        for i, b in enumerate(batches(0)):
            if i >= limit:
                break
            yield b["pixel_values"], b["input_ids"]

    acc_before = retrieval_accuracy(probe, state.params, probe_batches())
    ckpt = os.path.join(args.checkpoint_dir, f"{args.name}_pretrained")
    state = pretrain(model, state, step, batches, epochs,
                     checkpoint_dir=ckpt,
                     save_steps=cfg.train.pretrain_save_steps)
    acc_after = retrieval_accuracy(probe, state.params, probe_batches())
    logger.warning(
        "pretraining done at step %d: retrieval accuracy %.3f -> %.3f",
        int(state.step), acc_before, acc_after)
    return 0


def _serve_calibration_batch(args, cfg):
    """Real-image activation-calibration batch for `serve --quant`.

    Loads up to 32 images from ``--calib-images`` (a directory of
    images), CLIP-preprocessed at the model size; panorama models tile
    each image across the 4 views (calibration only needs realistic
    activation statistics, not true panoramas). Returns None when the
    flag is absent.
    """
    import glob

    import numpy as np

    path = getattr(args, "calib_images", None)
    if not path:
        return None
    from PIL import Image

    from pigeon_tpu.data.image_ops import clip_preprocess_pil

    files = sorted(
        f for f in glob.glob(os.path.join(path, "*"))
        if f.lower().endswith((".jpg", ".jpeg", ".png", ".webp")))[:32]
    if not files:
        raise SystemExit(f"--calib-images {path}: no images found")
    pixels = []
    for f in files:
        with Image.open(f) as im:
            pixels.append(clip_preprocess_pil(im, cfg.vision.image_size))
    batch = np.stack(pixels)
    if cfg.head.panorama:
        batch = np.repeat(batch[:, None], 4, axis=1)
    import jax.numpy as jnp

    return jnp.asarray(batch, jnp.float32)


def cmd_serve(args) -> int:
    import jax
    import jax.numpy as jnp

    from pigeon_tpu.models.super_guessr import SuperGuessr
    from pigeon_tpu.serve import PredictionService, serve
    from pigeon_tpu.serve.server import make_serving_fn

    if args.artifact:
        return _serve_artifact(args)

    cells, _ = load_geocells(args)
    cfg = config_with_cells(args, cells)
    model = SuperGuessr(cfg.vision, cfg.head, dtype=jnp.bfloat16,
                        attn_impl=_attn_impl())
    views = (4,) if cfg.head.panorama else ()
    example = jnp.zeros((1, *views, cfg.vision.image_size,
                         cfg.vision.image_size, 3))
    params = _init_and_restore(args, cfg, model, example)

    if getattr(args, "quant", False):
        calib = _serve_calibration_batch(args, cfg)
        if calib is None:
            # Synthetic N(0,1) calibration batch (matches CLIP-normalized
            # input stats but not real activation tails) — leave 25%
            # headroom above the observed amax so out-of-distribution
            # activations don't hard-clip at every matmul.
            calib = jax.random.normal(
                jax.random.PRNGKey(3), (2, *example.shape[1:]),
                jnp.float32)
            model, params = _quantize_for_inference(cfg, params, calib,
                                                    margin=1.25)
            logger.warning(
                "int8 W8A8 tower enabled (activation scales calibrated "
                "on a synthetic batch, margin 1.25 — pass --calib-images "
                "DIR for real-data calibration)")
        else:
            model, params = _quantize_for_inference(cfg, params, calib,
                                                    margin=1.1)
            logger.warning(
                "int8 W8A8 tower enabled (activation scales calibrated "
                "on %d real images, margin 1.1)", int(calib.shape[0]))

    serve_fn = make_serving_fn(model, params, cfg.head, cells)

    # Serving-time refinement (+ optional hedging for duel play): the
    # reference bot ran SuperGuessr(serving=True) -> ProtoRefiner ->
    # HedgeLayer (`models/super_guessr.py:462-466`, `proto_refiner.py:121`,
    # `models/layers/hedge.py:8-57`). GeoGuessr serving uses the
    # StreetView-family preset (`evaluation/evaluate.py:73-80`).
    refine_fn = None
    assets = _load_refine_assets(args)
    if assets is not None:
        import dataclasses

        from pigeon_tpu.train.evaluate import build_refiner, refiner_preset

        preset = dataclasses.replace(refiner_preset("geoguessr"),
                                     hedge=args.hedge)
        refine_fn = build_refiner(*assets, num_cells=len(cells),
                                  cfg=preset)
        logger.warning("refinement enabled (topk=%d, hedge=%s)",
                       preset.topk, args.hedge)
    elif args.hedge:
        raise SystemExit("--hedge requires --prototypes/--embeddings/"
                         "--metadata (hedging applies to refined guesses)")

    # Warm up (compile) before accepting traffic — the first compile can
    # take minutes in remote-compile environments. Requests arrive as
    # uint8 (the low-transfer wire format), so warm THAT executable.
    logger.warning("warming up serving executable ...")
    out = serve_fn(jnp.zeros_like(example, dtype=jnp.uint8))
    if refine_fn is not None:
        out_r = refine_fn(out["embedding"], out["pred_lla"],
                          out["topk_cells"], out["topk_probs"])
        float(jnp.sum(out_r["pred_lla"]))   # force execution (the
        # dispatch is async and block_until_ready is a no-op through
        # tunneled backends — without a readback the first real request
        # still waits behind the server-side compile)
    float(jnp.sum(out["pred_lla"]))

    batcher = None
    if args.serve_batch > 1:
        from pigeon_tpu.serve import MicroBatcher

        batcher = MicroBatcher(serve_fn, refine_fn=refine_fn,
                               max_batch=args.serve_batch)
        # Compile + EXECUTE every bucket executable before traffic
        # (single shared implementation: MicroBatcher.warm).
        batcher.warm(example.shape[1:], jnp.uint8)
        logger.warning("micro-batching up to %d requests/dispatch",
                       args.serve_batch)
    logger.warning("warmup done")
    service = PredictionService(serve_fn,
                                image_size=cfg.vision.image_size,
                                panorama=cfg.head.panorama,
                                refine_fn=refine_fn,
                                batcher=batcher,
                                game_log=os.path.join("runs", "games.jsonl"))
    serve(service, host=args.host, port=args.port)
    return 0


def _serve_artifact(args) -> int:
    """Serve from an AOT artifact (`export`): no model code, config, or
    checkpoint machinery — the deserialized program + weights only."""
    import jax.numpy as jnp

    from pigeon_tpu.serve import PredictionService, serve
    from pigeon_tpu.serve.export import load_serving_artifact

    serve_fn, manifest = load_serving_artifact(args.artifact)
    logger.warning("serving artifact %s: %d params, cells=%d, wire=%s, "
                   "platforms=%s", args.artifact, manifest["num_params"],
                   manifest["num_cells"], manifest["wire_dtype"],
                   manifest["platforms"])

    refine_fn = None
    assets = _load_refine_assets(args)
    if assets is not None:
        import dataclasses

        from pigeon_tpu.train.evaluate import build_refiner, refiner_preset

        preset = dataclasses.replace(refiner_preset("geoguessr"),
                                     hedge=args.hedge)
        refine_fn = build_refiner(*assets,
                                  num_cells=manifest["num_cells"],
                                  cfg=preset)
        logger.warning("refinement enabled (topk=%d, hedge=%s)",
                       preset.topk, args.hedge)
    elif args.hedge:
        raise SystemExit("--hedge requires --prototypes/--embeddings/"
                         "--metadata (hedging applies to refined guesses)")

    size = manifest["image_size"]
    views = (4,) if manifest["panorama"] else ()
    batch = 1 if manifest["batch"] == "symbolic" else manifest["batch"]
    logger.warning("warming up artifact executable ...")
    out = serve_fn(jnp.zeros((batch, *views, size, size, 3), jnp.uint8))
    if refine_fn is not None:
        out_r = refine_fn(out["embedding"], out["pred_lla"],
                          out["topk_cells"], out["topk_probs"])
        float(jnp.sum(out_r["pred_lla"]))
    float(jnp.sum(out["pred_lla"]))
    logger.warning("warmup done")
    service = PredictionService(serve_fn, image_size=size,
                                panorama=manifest["panorama"],
                                refine_fn=refine_fn,
                                game_log=os.path.join("runs",
                                                      "games.jsonl"))
    serve(service, host=args.host, port=args.port)
    return 0


def cmd_export(args) -> int:
    """Export the serving program as a reloadable AOT artifact
    (`serve/export.py`): StableHLO module + weights + manifest."""
    import jax
    import jax.numpy as jnp

    from pigeon_tpu.models.super_guessr import SuperGuessr
    from pigeon_tpu.serve.export import export_serving_artifact

    cells, _ = load_geocells(args)
    cfg = config_with_cells(args, cells)
    # XLA attention: Pallas custom calls carry no cross-version
    # compatibility guarantee under jax.export (serve/export.py).
    model = SuperGuessr(cfg.vision, cfg.head, dtype=jnp.bfloat16,
                        attn_impl="xla")
    views = (4,) if cfg.head.panorama else ()
    example = jnp.zeros((1, *views, cfg.vision.image_size,
                         cfg.vision.image_size, 3))
    params = _init_and_restore(args, cfg, model, example)

    if getattr(args, "quant", False):
        calib = _serve_calibration_batch(args, cfg)
        margin = 1.1 if calib is not None else 1.25
        if calib is None:
            calib = jax.random.normal(
                jax.random.PRNGKey(3), (2, *example.shape[1:]),
                jnp.float32)
        model, params = _quantize_for_inference(cfg, params, calib,
                                                margin=margin,
                                                attn_impl="xla")
        logger.warning("exporting the int8 W8A8 tower (margin %.2f)",
                       margin)

    out_dir = args.output or os.path.join(
        args.checkpoint_dir, f"{args.name}_artifact")
    manifest = export_serving_artifact(
        model, params, cfg.head, cells, out_dir,
        image_size=cfg.vision.image_size,
        panorama=cfg.head.panorama,
        batch=args.batch_size,
        platforms=tuple(args.platforms.split(",")))
    logger.warning(
        "exported %s: %d params, %d cells, batch=%s, platforms=%s — "
        "serve it with: pigeon_tpu serve --artifact %s",
        out_dir, manifest["num_params"], manifest["num_cells"],
        manifest["batch"], manifest["platforms"], out_dir)
    return 0


COMMANDS = {
    "pretrain": cmd_pretrain,
    "finetune": cmd_finetune,
    "embed": cmd_embed,
    "evaluate": cmd_evaluate,
    "predict": cmd_predict,
    "serve": cmd_serve,
    "geocells": cmd_geocells,
    "prototypes": cmd_prototypes,
    "augment": cmd_augment,
    "export": cmd_export,
}

#: Pure-CPU offline commands: never enable the XLA compile cache for
#: these — the cache setup probes jax.default_backend(), which would
#: hold the shared TPU tunnel open for an hours-long geospatial run
#: (CLAUDE.md rule 2) with zero benefit.
_OFFLINE_COMMANDS = frozenset({"geocells", "prototypes", "augment"})


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)
    # Persistent XLA compile cache: the remote compile service's cold
    # compiles cost 60-380 s; a warm workspace re-loads in milliseconds
    # (core/compile_cache.py). NOT for the offline CPU commands — see
    # _OFFLINE_COMMANDS.
    if args.function not in _OFFLINE_COMMANDS:
        from pigeon_tpu.core.compile_cache import enable_persistent_cache

        enable_persistent_cache()
    if not args.classification:
        raise SystemExit(
            "regression mode is not implemented (the reference's released "
            "code only logs the mode string, `run.py:99`); drop "
            "--no-classification")
    return COMMANDS[args.function](args)


if __name__ == "__main__":
    sys.exit(main())
