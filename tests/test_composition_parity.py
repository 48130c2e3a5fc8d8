"""Composition-level quality parity: pigeon_tpu vs reference semantics.

The per-function golden tests pin each stage in isolation; this harness
runs the FULL lifecycle on one shared synthetic world through BOTH stacks
and compares the final metric tables:

    pigeon_tpu:  CLIP tower -> smoothed-CE finetune (frozen tower) ->
                 embed -> prototypes -> ProtoRefiner -> metric suite
                 (all through the real library entry points)
    twin:        independent torch/numpy re-derivation of the reference
                 (`tests/reference_twin.py`, cites reference lines)

Both sides share bit-identical tower weights (HF torch CLIP imported via
`models/hf_import`), identical head init, the same batch order and
optimizer hyperparameters — so any metric divergence is a SEMANTIC
difference in the composition, not noise. This is the achievable
substitute for the blocked real-weights BASELINE bound (no network here).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import torch

import jax
import jax.numpy as jnp

import reference_twin as twin
from pigeon_tpu import config as cfg_lib
from pigeon_tpu.config import HeadConfig, RefinerConfig
from pigeon_tpu.models.hf_import import import_vision_tower_params
from pigeon_tpu.models.refiner import build_proto_bank, make_refine_fn
from pigeon_tpu.models.super_guessr import SuperGuessr
from pigeon_tpu.train import create_train_state, make_eval_step, \
    make_train_step
from pigeon_tpu.train.metrics import compute_geoguessr_metrics
from pigeon_tpu.train.train_loop import adamw

transformers = pytest.importorskip("transformers")

# Shared world + hyperparameters (identical on both sides).
CELLS = np.array([[-100.0, 40.0], [10.0, 50.0], [120.0, 30.0],
                  [-60.0, -20.0], [30.0, -25.0]], np.float64)
N_TRAIN, N_VAL = 192, 48
TAU_KM = 75.0
LR, EPOCHS, BATCH = 3e-3, 6, 16
TOPK, TEMPERATURE, MAX_REFINE_KM = 3, 1.6, 1000.0
CLUSTER_ARGS = (4, 0.05)
NUM_CANDIDATES = 5

TINY_VISION_HF = dict(image_size=32, patch_size=8, hidden_size=32,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=4, projection_dim=16)


def _location_images(lla: np.ndarray, rng: np.ndarray) -> np.ndarray:
    """Deterministic smooth location->image map (NHWC float32): pixel
    patterns vary continuously with (lng, lat) so a frozen tower's
    embeddings carry a learnable AND refinable location signal."""
    g = np.random.default_rng(77)
    phase = g.uniform(0, 2 * np.pi, (3, 32, 32))
    freq = g.uniform(0.5, 2.0, (3, 2))
    lng = np.radians(lla[:, 0])[:, None, None, None]
    lat = np.radians(lla[:, 1])[:, None, None, None]
    ph = phase.transpose(1, 2, 0)[None]          # (1, 32, 32, 3)
    f = freq.T[None, None, None]                 # (1, 1, 1, 2, 3) -> split
    img = np.sin(f[..., 0, :] * 3 * lng + ph) * \
        np.cos(f[..., 1, :] * 3 * lat + 2 * ph)
    return (img + 0.35 * rng).astype(np.float32)


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(2203)
    n = N_TRAIN + N_VAL
    cell_of = rng.integers(0, len(CELLS), n)
    lla = CELLS[cell_of] + rng.normal(0, 3.0, (n, 2))
    # Geocell index = nearest centroid (points can straddle cells).
    cell_idx = twin.haversine_matrix_np(lla, CELLS).argmin(axis=1)
    images = _location_images(lla, rng.normal(0, 1, (n, 32, 32, 3)))
    selection = np.where(np.arange(n) % 5 == 4, "val", "train")
    df = pd.DataFrame({"lng": lla[:, 0], "lat": lla[:, 1],
                       "geocell_idx": cell_idx, "selection": selection})

    torch.manual_seed(3)
    hf_tower = transformers.CLIPVisionModel(
        transformers.CLIPVisionConfig(**TINY_VISION_HF)).eval()
    g = np.random.default_rng(11)
    head_w = (g.normal(0, 0.02, (32, len(CELLS)))).astype(np.float32)
    head_b = np.zeros(len(CELLS), np.float32)
    return df, images, hf_tower, head_w, head_b


def _batches(idx: np.ndarray):
    """Deterministic batch order shared by both sides."""
    for start in range(0, len(idx), BATCH):
        yield idx[start:start + BATCH]


def _prototypes_refine_metrics(df, emb_tr, refine_emb, val_preds):
    """Shared composition tail: library OPTICS prototypes -> refiner
    (reference within-cluster semantics) -> metric suite. Used by both
    the on-tower (scenario 1) and embed-mode (scenario 3) runs."""
    from pigeon_tpu.geocell import build_prototypes

    train_rows = np.where(df["selection"] == "train")[0]
    val_rows = np.where(df["selection"] == "val")[0]
    lla = df[["lng", "lat"]].to_numpy(np.float32)

    train_df = df[df["selection"] == "train"].reset_index(drop=True)
    proto_df = build_prototypes(train_df, cluster_args=CLUSTER_ARGS,
                                num_workers=0)
    bank = build_proto_bank(proto_df.to_dict("records"),
                            np.asarray(emb_tr), lla[train_rows],
                            num_cells=len(CELLS))
    refine = make_refine_fn(
        bank, RefinerConfig(topk=TOPK, temperature=TEMPERATURE,
                            max_refinement_km=MAX_REFINE_KM),
        within_cluster="reference")
    refined = refine(jnp.asarray(refine_emb), val_preds["pred_lla"],
                     val_preds["topk_cells"], val_preds["topk_probs"])

    metrics = compute_geoguessr_metrics(
        predictions=np.asarray(refined["pred_lla"]),
        labels=lla[val_rows],
        cell_preds=np.asarray(val_preds["pred_cell"]),
        cell_labels=df["geocell_idx"].to_numpy()[val_rows],
        topk_cells=np.asarray(val_preds["topk_cells"]),
    )
    return metrics, bank


def run_pigeon_tpu(df, images, hf_tower, head_w, head_b):
    """The real library composition, end to end."""
    vision_cfg = cfg_lib.VisionConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, projection_dim=16)
    head_cfg = HeadConfig(num_cells=len(CELLS), embed_dim=32,
                          panorama=False, multi_task=False, heading=False,
                          smooth_labels=True, label_smoothing_km=TAU_KM,
                          num_candidates=NUM_CANDIDATES)
    model = SuperGuessr(vision_cfg, head_cfg, dtype=jnp.float32)
    opt = adamw(LR, weight_decay=0.0)
    state = create_train_state(jax.random.PRNGKey(0), model, opt,
                               (jnp.zeros((1, 32, 32, 3)),))

    # Bit-identical tower + head init with the twin.
    params = dict(state.params)
    params["vision"] = import_vision_tower_params(
        hf_tower.state_dict(), num_layers=2)
    head = dict(params["head"])
    head["cell_layer"] = {"kernel": jnp.asarray(head_w),
                          "bias": jnp.asarray(head_b)}
    params["head"] = head
    state = state.replace(params=params)

    # Frozen tower (reference freeze_base), head trains.
    mask = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    mask["head"] = jax.tree_util.tree_map(jnp.ones_like, mask["head"])

    train_rows = np.where(df["selection"] == "train")[0]
    val_rows = np.where(df["selection"] == "val")[0]
    lla = df[["lng", "lat"]].to_numpy(np.float32)

    step = make_train_step(model, opt, head_cfg, CELLS.astype(np.float32),
                           grad_mask=mask, donate=False)
    for _ in range(EPOCHS):
        for batch_rows in _batches(train_rows):
            state, _ = step(state, {
                "inputs": jnp.asarray(images[batch_rows]),
                "labels": jnp.asarray(lla[batch_rows]),
            }, jax.random.PRNGKey(4))

    # Embed + eval through the library eval step.
    eval_step = make_eval_step(model, head_cfg, CELLS.astype(np.float32),
                               num_candidates=NUM_CANDIDATES)
    _, train_preds = eval_step(state.params,
                               {"inputs": jnp.asarray(images[train_rows]),
                                "labels": jnp.asarray(lla[train_rows])})
    _, val_preds = eval_step(state.params,
                             {"inputs": jnp.asarray(images[val_rows]),
                              "labels": jnp.asarray(lla[val_rows])})

    metrics, bank = _prototypes_refine_metrics(
        df, train_preds["embedding"], val_preds["embedding"], val_preds)
    debug = {"val_embedding": np.asarray(val_preds["embedding"]),
             "val_probs": np.asarray(val_preds["probs"]),
             # For downstream tests (int8-on-trained-checkpoint).
             "state": state, "vision_cfg": vision_cfg,
             "head_cfg": head_cfg, "bank": bank}
    return metrics, debug


def run_twin(df, images, hf_tower, head_w, head_b):
    """The reference re-derivation, end to end."""
    train_rows = np.where(df["selection"] == "train")[0]
    val_rows = np.where(df["selection"] == "val")[0]
    lla = df[["lng", "lat"]].to_numpy(np.float64)

    with torch.no_grad():  # frozen tower; token-mean embedding
        emb = hf_tower(pixel_values=torch.from_numpy(
            images.transpose(0, 3, 1, 2))).last_hidden_state \
            .mean(dim=1).numpy()

    head = torch.nn.Linear(32, len(CELLS))
    with torch.no_grad():
        head.weight.copy_(torch.from_numpy(head_w.T))
        head.bias.copy_(torch.from_numpy(head_b))

    # Same batch order as the pigeon_tpu side.
    order = np.concatenate(list(_batches(train_rows)))
    twin.train_head_torch(head, emb[order], lla[order], CELLS,
                          tau_km=TAU_KM, lr=LR, epochs=EPOCHS,
                          batch_size=BATCH)

    val_out = twin.head_predictions(head, emb[val_rows], CELLS,
                                    NUM_CANDIDATES)
    proto_rows = twin.build_prototypes_sklearn(
        lla[train_rows], df["geocell_idx"].to_numpy()[train_rows],
        *CLUSTER_ARGS)
    pred_lla, _, _ = twin.refine_reference(
        proto_rows, emb[train_rows], lla[train_rows],
        emb[val_rows], val_out["pred_lla"], val_out["topk_cells"],
        val_out["topk_probs"], topk=TOPK, temperature=TEMPERATURE,
        max_refinement_km=MAX_REFINE_KM)

    metrics = twin.compute_metrics_np(
        pred_lla, lla[val_rows], val_out["pred_cell"],
        df["geocell_idx"].to_numpy()[val_rows], val_out["topk_cells"])
    debug = {"val_embedding": emb[val_rows], "val_probs": val_out["probs"]}
    return metrics, debug


@pytest.fixture(scope="module")
def twin_result(world):
    """run_twin computed once, shared by scenarios 1 and 3."""
    return run_twin(*world)


class TestCompositionParity:
    @pytest.fixture(scope="class")
    def both(self, world, twin_result):
        ours, ours_dbg = run_pigeon_tpu(*world)
        ref, ref_dbg = twin_result
        return ours, ref, ours_dbg, ref_dbg

    def test_embedding_stage_parity(self, both):
        """Tower embed stage: bit-identical weights -> near-identical
        embeddings (flax vs torch float drift only)."""
        _, _, ours_dbg, ref_dbg = both
        np.testing.assert_allclose(ours_dbg["val_embedding"],
                                   ref_dbg["val_embedding"],
                                   atol=5e-5, rtol=1e-3)

    def test_trained_probabilities_parity(self, both):
        """After identical training runs, geocell probabilities agree —
        the smoothed-CE + AdamW semantics composed identically."""
        _, _, ours_dbg, ref_dbg = both
        np.testing.assert_allclose(ours_dbg["val_probs"],
                                   ref_dbg["val_probs"], atol=2e-3)

    def test_metric_table_parity(self, both):
        """The headline BASELINE metrics agree between the stacks."""
        ours, ref, _, _ = both
        n_val = N_VAL
        assert abs(ours["Geocell_accuracy"] - ref["Geocell_accuracy"]) \
            <= 1.0 / n_val
        assert abs(ours["Geocell_top5_accuracy"]
                   - ref["Geocell_top5_accuracy"]) <= 1.0 / n_val
        med_o, med_r = ours["Median_km_error"], ref["Median_km_error"]
        assert abs(med_o - med_r) <= max(0.05 * med_r, 5.0), (med_o, med_r)
        mean_o, mean_r = ours["Mean_km_error"], ref["Mean_km_error"]
        assert abs(mean_o - mean_r) <= max(0.05 * mean_r, 10.0), \
            (mean_o, mean_r)
        assert abs(ours["Geoguessr_score"] - ref["Geoguessr_score"]) \
            <= 0.02 * 5000
        for r in (25, 100, 750, 2500):
            assert abs(ours[f"Under_{r}_km"] - ref[f"Under_{r}_km"]) \
                <= 2.0 / n_val, r

    def test_pipeline_actually_learned(self, both):
        """Guard against vacuous parity: the task must be non-trivially
        solved (else both tables would just be comparing noise)."""
        ours, ref, _, _ = both
        assert 0.6 <= ours["Geocell_accuracy"] < 1.0, \
            "task saturated; top-1 parity would be vacuous"
        assert ref["Geocell_accuracy"] >= 0.6
        assert ours["Median_km_error"] <= 1500.0


class TestInt8OnTrainedCheckpoint:
    """VERDICT r2 #5: int8 quality measured on a TRAINED checkpoint —
    the delta table vs the f32 model on the same benchmark, not a
    random-weights shape check."""

    @pytest.fixture(scope="class")
    def tables(self, world):
        from pigeon_tpu.models.quant import quantize_and_calibrate

        df, images, hf_tower, head_w, head_b = world
        f32_metrics, dbg = run_pigeon_tpu(*world)
        state, vision_cfg, head_cfg = \
            dbg["state"], dbg["vision_cfg"], dbg["head_cfg"]

        train_rows = np.where(df["selection"] == "train")[0]
        val_rows = np.where(df["selection"] == "val")[0]
        lla = df[["lng", "lat"]].to_numpy(np.float32)

        # The serving recipe (cli evaluate --quant): dynamic-quant
        # calibration on a real train batch, then the static int8 model.
        dyn = SuperGuessr(vision_cfg, head_cfg, dtype=jnp.float32,
                          quant=True)
        qparams = quantize_and_calibrate(
            dyn, state.params, jnp.asarray(images[train_rows[:32]]),
            tower_key="vision")
        qmodel = SuperGuessr(vision_cfg, head_cfg, dtype=jnp.float32,
                             quant="static")
        eval_step = make_eval_step(qmodel, head_cfg,
                                   CELLS.astype(np.float32),
                                   num_candidates=NUM_CANDIDATES)
        _, preds = eval_step(qparams,
                             {"inputs": jnp.asarray(images[val_rows]),
                              "labels": jnp.asarray(lla[val_rows])})
        # Refiner bank stays the f32 embed-run bank (the CLI layout:
        # --embeddings come from the f32 embed sweep).
        refine = make_refine_fn(
            dbg["bank"], RefinerConfig(topk=TOPK, temperature=TEMPERATURE,
                                       max_refinement_km=MAX_REFINE_KM),
            within_cluster="reference")
        refined = refine(preds["embedding"], preds["pred_lla"],
                         preds["topk_cells"], preds["topk_probs"])
        int8_metrics = compute_geoguessr_metrics(
            predictions=np.asarray(refined["pred_lla"]),
            labels=lla[val_rows],
            cell_preds=np.asarray(preds["pred_cell"]),
            cell_labels=df["geocell_idx"].to_numpy()[val_rows],
            topk_cells=np.asarray(preds["topk_cells"]),
        )
        return f32_metrics, int8_metrics

    def test_int8_quality_delta_bounded(self, tables):
        f32_m, int8_m = tables
        print("\nint8-vs-f32 delta table (trained checkpoint):")
        for k in sorted(f32_m):
            print(f"  {k:26s} f32={f32_m[k]:10.4f} "
                  f"int8={int8_m[k]:10.4f} "
                  f"delta={int8_m[k] - f32_m[k]:+.4f}")
        assert abs(int8_m["Geocell_accuracy"]
                   - f32_m["Geocell_accuracy"]) <= 2.0 / N_VAL
        assert abs(int8_m["Geocell_top5_accuracy"]
                   - f32_m["Geocell_top5_accuracy"]) <= 2.0 / N_VAL
        med_f, med_q = f32_m["Median_km_error"], int8_m["Median_km_error"]
        assert abs(med_q - med_f) <= max(0.10 * med_f, 25.0), (med_f, med_q)
        assert abs(int8_m["Geoguessr_score"]
                   - f32_m["Geoguessr_score"]) <= 0.03 * 5000


# ---------------------------------------------------------------------------
# Scenario 2: full PIGEON configuration — 4-view panorama, multi-task heads,
# month prediction, the 8/2/1 loss-scaling composition.
# ---------------------------------------------------------------------------

EPOCHS2 = 4


def _panorama_images(lla: np.ndarray, noise: np.ndarray) -> np.ndarray:
    """(N, 4, 32, 32, 3): each view is the location image rotated 90° in
    longitude phase (the StreetView capture pattern, distinct per view)."""
    views = [
        _location_images(lla + np.array([90.0 * v, 0.0]), noise[:, v])
        for v in range(4)
    ]
    return np.stack(views, axis=1)


@pytest.fixture(scope="module")
def world_full(world):
    df, _, hf_tower, head_w, head_b = world
    rng = np.random.default_rng(404)
    lla = df[["lng", "lat"]].to_numpy(np.float64)
    n = len(lla)
    images4 = _panorama_images(lla, rng.normal(0, 1, (n, 4, 32, 32, 3)))
    labels_mt = np.stack([
        np.sin(np.radians(lla[:, 0]) * (i + 1))
        + np.cos(np.radians(lla[:, 1]) * (i + 2))
        for i in range(6)], -1).astype(np.float32)
    labels_climate = (df["geocell_idx"].to_numpy() * 5
                      + (lla[:, 1] > 35)).astype(np.int64) % 28
    labels_month = (np.abs(lla[:, 0]).astype(np.int64)) % 12
    g = np.random.default_rng(21)
    aux_w = {
        "multi_task_head": g.normal(0, 0.02, (32, 6)).astype(np.float32),
        "climate_layer": g.normal(0, 0.02, (32, 28)).astype(np.float32),
        "month_layer": g.normal(0, 0.02, (32, 12)).astype(np.float32),
    }
    return (df, images4, hf_tower, head_w, head_b, labels_mt,
            labels_climate, labels_month, aux_w)


def run_pigeon_tpu_full(df, images4, hf_tower, head_w, head_b, labels_mt,
                        labels_climate, labels_month, aux_w):
    vision_cfg = cfg_lib.VisionConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, projection_dim=16)
    head_cfg = HeadConfig(num_cells=len(CELLS), embed_dim=32,
                          panorama=True, multi_task=True,
                          predict_month=True, heading=False,
                          smooth_labels=True, label_smoothing_km=TAU_KM,
                          num_candidates=NUM_CANDIDATES)
    model = SuperGuessr(vision_cfg, head_cfg, dtype=jnp.float32)
    opt = adamw(LR, weight_decay=0.0)
    state = create_train_state(jax.random.PRNGKey(0), model, opt,
                               (jnp.zeros((1, 4, 32, 32, 3)),))
    params = dict(state.params)
    params["vision"] = import_vision_tower_params(
        hf_tower.state_dict(), num_layers=2)
    head = dict(params["head"])
    head["cell_layer"] = {"kernel": jnp.asarray(head_w),
                          "bias": jnp.asarray(head_b)}
    for name, w in aux_w.items():
        head[name] = {"kernel": jnp.asarray(w),
                      "bias": jnp.zeros((w.shape[1],), jnp.float32)}
    params["head"] = head
    state = state.replace(params=params)

    mask = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    mask["head"] = jax.tree_util.tree_map(jnp.ones_like, mask["head"])

    train_rows = np.where(df["selection"] == "train")[0]
    val_rows = np.where(df["selection"] == "val")[0]
    lla = df[["lng", "lat"]].to_numpy(np.float32)

    step = make_train_step(model, opt, head_cfg, CELLS.astype(np.float32),
                           grad_mask=mask, donate=False)
    for _ in range(EPOCHS2):
        for rows in _batches(train_rows):
            state, _ = step(state, {
                "inputs": jnp.asarray(images4[rows]),
                "labels": jnp.asarray(lla[rows]),
                "labels_multi_task": jnp.asarray(labels_mt[rows]),
                "labels_climate": jnp.asarray(labels_climate[rows]),
                "labels_month": jnp.asarray(labels_month[rows]),
            }, jax.random.PRNGKey(4))

    eval_step = make_eval_step(model, head_cfg, CELLS.astype(np.float32),
                               num_candidates=NUM_CANDIDATES)
    _, val_preds = eval_step(state.params, {
        "inputs": jnp.asarray(images4[val_rows]),
        "labels": jnp.asarray(lla[val_rows]),
        "labels_multi_task": jnp.asarray(labels_mt[val_rows]),
        "labels_climate": jnp.asarray(labels_climate[val_rows]),
        "labels_month": jnp.asarray(labels_month[val_rows]),
    })
    metrics = compute_geoguessr_metrics(
        predictions=np.asarray(val_preds["pred_lla"]),
        labels=lla[val_rows],
        cell_preds=np.asarray(val_preds["pred_cell"]),
        cell_labels=df["geocell_idx"].to_numpy()[val_rows],
        topk_cells=np.asarray(val_preds["topk_cells"]),
        preds_climate=np.asarray(val_preds["preds_climate"]),
        labels_climate=labels_climate[val_rows],
        preds_month=np.asarray(val_preds["preds_month"]),
        labels_month=labels_month[val_rows],
    )
    debug = {"val_probs": np.asarray(val_preds["probs"]),
             "val_preds_mt": np.asarray(val_preds["preds_mt"])}
    return metrics, debug


def run_twin_full(df, images4, hf_tower, head_w, head_b, labels_mt,
                  labels_climate, labels_month, aux_w):
    train_rows = np.where(df["selection"] == "train")[0]
    val_rows = np.where(df["selection"] == "val")[0]
    lla = df[["lng", "lat"]].to_numpy(np.float64)
    n = len(lla)

    with torch.no_grad():  # fold views into the batch, token-mean embed
        flat = images4.reshape(n * 4, 32, 32, 3).transpose(0, 3, 1, 2)
        emb4 = hf_tower(pixel_values=torch.from_numpy(flat)) \
            .last_hidden_state.mean(dim=1).numpy().reshape(n, 4, -1)

    head = twin.FullHeadTorch(32, len(CELLS))
    with torch.no_grad():
        head.cell_layer.weight.copy_(torch.from_numpy(head_w.T))
        head.cell_layer.bias.copy_(torch.from_numpy(head_b))
        for name, w in aux_w.items():
            layer = getattr(head, name)
            layer.weight.copy_(torch.from_numpy(w.T))
            layer.bias.zero_()

    order = np.concatenate(list(_batches(train_rows)))
    twin.train_full_torch(head, emb4[order], lla[order], labels_mt[order],
                          labels_climate[order], labels_month[order],
                          CELLS, tau_km=TAU_KM, lr=LR, epochs=EPOCHS2,
                          batch_size=BATCH)
    out = twin.full_head_predictions(head, emb4[val_rows], CELLS,
                                     NUM_CANDIDATES)
    metrics = twin.compute_metrics_np(
        out["pred_lla"], lla[val_rows], out["pred_cell"],
        df["geocell_idx"].to_numpy()[val_rows], out["topk_cells"])
    metrics["Climate_accuracy"] = float(
        (out["preds_climate"].argmax(-1)
         == labels_climate[val_rows]).mean())
    metrics["Month_accuracy"] = float(
        (out["preds_month"].argmax(-1) == labels_month[val_rows]).mean())
    debug = {"val_probs": out["probs"], "val_preds_mt": out["preds_mt"]}
    return metrics, debug


class TestCompositionParityFullPigeon:
    """Scenario 2: the full PIGEON head configuration — 4-view panorama
    mean aggregation + multi-task heads + month, with the 8/2/1 loss
    scalings composing into ONE trained objective on both stacks."""

    @pytest.fixture(scope="class")
    def both(self, world_full):
        ours, ours_dbg = run_pigeon_tpu_full(*world_full)
        ref, ref_dbg = run_twin_full(*world_full)
        return ours, ref, ours_dbg, ref_dbg

    def test_trained_probabilities_and_mt_parity(self, both):
        _, _, ours_dbg, ref_dbg = both
        np.testing.assert_allclose(ours_dbg["val_probs"],
                                   ref_dbg["val_probs"], atol=2e-3)
        np.testing.assert_allclose(ours_dbg["val_preds_mt"],
                                   ref_dbg["val_preds_mt"], atol=5e-3)

    def test_metric_table_parity(self, both):
        ours, ref, _, _ = both
        for key in ("Geocell_accuracy", "Geocell_top5_accuracy",
                    "Climate_accuracy", "Month_accuracy"):
            assert abs(ours[key] - ref[key]) <= 1.0 / N_VAL, key
        med_o, med_r = ours["Median_km_error"], ref["Median_km_error"]
        assert abs(med_o - med_r) <= max(0.05 * med_r, 5.0), (med_o, med_r)


class TestRefinerTwinCrossCheck:
    """The jitted batched refiner vs the twin's independent per-sample
    re-derivation of ProtoRefiner.forward on random banks — every
    branch: no-proto cells, count==1 clusters, the farthest-member
    quirk, the max-refinement cancel gate."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_reference_twin(self, seed):
        rng = np.random.default_rng(seed)
        n_bank, d, n_cells = 60, 16, 6
        bank_emb = rng.normal(size=(n_bank, d)).astype(np.float32)
        bank_lla = np.stack([rng.uniform(-170, 170, n_bank),
                             rng.uniform(-60, 60, n_bank)],
                            -1).astype(np.float32)
        rows = []
        for c in range(n_cells - 1):        # last cell has NO prototypes
            for k in range(rng.integers(1, 4)):
                size = int(rng.integers(1, 6))   # count==1 happens
                idx = rng.choice(n_bank, size, replace=False).tolist()
                rows.append({"geocell_idx": c,
                             "lng": float(bank_lla[idx, 0].mean()),
                             "lat": float(bank_lla[idx, 1].mean()),
                             "count": size, "indices": idx})
        b = 12
        emb = rng.normal(size=(b, d)).astype(np.float32)
        cand = np.stack([rng.permutation(n_cells)[:TOPK]
                         for _ in range(b)]).astype(np.int32)
        probs = rng.uniform(0.1, 1, (b, TOPK)).astype(np.float32)
        initial = np.stack([rng.uniform(-170, 170, b),
                            rng.uniform(-60, 60, b)], -1).astype(np.float32)

        bank = build_proto_bank(rows, bank_emb, bank_lla,
                                num_cells=n_cells)
        for max_km in (200.0, 1e9):          # cancel gate on and off
            refine = make_refine_fn(
                bank, RefinerConfig(topk=TOPK, temperature=TEMPERATURE,
                                    max_refinement_km=max_km),
                within_cluster="reference")
            ours = refine(jnp.asarray(emb), jnp.asarray(initial),
                          jnp.asarray(cand), jnp.asarray(probs))
            twin_lla, twin_cell, _ = twin.refine_reference(
                rows, bank_emb, bank_lla, emb, initial, cand, probs,
                topk=TOPK, temperature=TEMPERATURE,
                max_refinement_km=max_km)
            np.testing.assert_allclose(np.asarray(ours["pred_lla"]),
                                       twin_lla, atol=1e-4)
            np.testing.assert_array_equal(np.asarray(ours["pred_cell"]),
                                          twin_cell)


class TestMetricsTwinCrossCheck:
    """Metric suite vs the twin's independent numpy derivation on random
    predictions — pins haversine radius, radius-bucket boundaries, the
    GeoGuessr score rounding, and top-k membership."""

    @pytest.mark.parametrize("seed", [3, 7])
    def test_matches(self, seed):
        rng = np.random.default_rng(seed)
        n, n_cells, k = 100, 9, 5
        preds = np.stack([rng.uniform(-180, 180, n),
                          rng.uniform(-85, 85, n)], -1)
        # Mix of scales: exact hits, near (few km), far (continental).
        labels = preds.copy()
        labels[20:60] += rng.normal(0, 0.05, (40, 2))
        labels[60:] = np.stack([rng.uniform(-180, 180, 40),
                                rng.uniform(-85, 85, 40)], -1)
        cell_preds = rng.integers(0, n_cells, n)
        cell_labels = rng.integers(0, n_cells, n)
        topk = np.stack([rng.permutation(n_cells)[:k] for _ in range(n)])

        ours = compute_geoguessr_metrics(
            predictions=preds, labels=labels, cell_preds=cell_preds,
            cell_labels=cell_labels, topk_cells=topk)
        ref = twin.compute_metrics_np(preds, labels, cell_preds,
                                      cell_labels, topk)
        for key, value in ref.items():
            assert ours[key] == pytest.approx(value, rel=1e-9), key


# ---------------------------------------------------------------------------
# Scenario 3: the `embed` lifecycle (reference call stack SURVEY §3.2,
# `run.py:120-141` embed -> `train_modes.py:110-133` finetune_on_embeddings)
# — embedding sweep through the production path (threaded batching,
# final-batch padding, async device->host copies, `.npy` save +
# index-ordered reload) -> headless GeocellHead training on the reloaded
# shards -> prototypes -> refine -> metrics, vs the same independent twin.
# Scenario 1 covers the on-tower (pixels) composition; this pins the
# headless composition AND the sweep round-trip that feeds it.
# ---------------------------------------------------------------------------


class _ArrayDataset:
    """In-memory image source through the real `iter_batches` machinery.

    Duck-types `TabularImageDataset` (`data/pipeline.py:39`):
    ``load_pixels`` serves the shared float world directly — no JPEG/PNG
    quantization, so the twin sees bit-identical pixels — while batching,
    padding, and the embed sweep's save/reload all run the production code.
    """

    def __init__(self, df: pd.DataFrame, images: np.ndarray):
        self.df = df.reset_index(drop=True)
        self.image_dir = ""
        self.image_size = images.shape[1]
        self.panorama = False
        self.normalize = True
        self._images = images

    def __len__(self) -> int:
        return len(self.df.index)

    def load_pixels(self, row) -> np.ndarray:
        return self._images[int(row["image"])]

    def sample_arrays(self, row):
        from pigeon_tpu.data.pipeline import TabularImageDataset

        return TabularImageDataset.sample_arrays(self, row)


def run_pigeon_tpu_embed_mode(df, images, hf_tower, head_w, head_b,
                              out_dir):
    """The real embed-mode composition: sweep to disk, then headless."""
    from pigeon_tpu.models.embedder import ClipEmbedder
    from pigeon_tpu.models.geocell_head import GeocellHead
    from pigeon_tpu.train.embed import embed_splits_to_disk, \
        load_embeddings

    vision_cfg = cfg_lib.VisionConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, projection_dim=16)
    embedder = ClipEmbedder(vision_cfg, dtype=jnp.float32)
    eparams = {"vision": import_vision_tower_params(
        hf_tower.state_dict(), num_layers=2)}

    ddf = df.copy()
    ddf["image"] = np.arange(len(ddf))
    datasets = {
        split: _ArrayDataset(ddf[ddf["selection"] == split], images)
        for split in ("train", "val")
    }
    # batch_size=20 does not divide 192/48 -> exercises the pad-and-drop
    # final batch on both splits.
    embed_splits_to_disk(embedder, eparams, datasets, str(out_dir),
                         batch_size=20)
    emb_tr = load_embeddings(str(out_dir), "train").astype(np.float32)
    emb_val = load_embeddings(str(out_dir), "val").astype(np.float32)

    train_rows = np.where(df["selection"] == "train")[0]
    val_rows = np.where(df["selection"] == "val")[0]
    lla = df[["lng", "lat"]].to_numpy(np.float32)

    head_cfg = HeadConfig(num_cells=len(CELLS), embed_dim=32,
                          panorama=False, multi_task=False, heading=False,
                          smooth_labels=True, label_smoothing_km=TAU_KM,
                          num_candidates=NUM_CANDIDATES)
    model = GeocellHead(head_cfg, dtype=jnp.float32)
    opt = adamw(LR, weight_decay=0.0)
    state = create_train_state(jax.random.PRNGKey(0), model, opt,
                               (jnp.zeros((1, 32)),))
    params = dict(state.params)
    params["cell_layer"] = {"kernel": jnp.asarray(head_w),
                            "bias": jnp.asarray(head_b)}
    state = state.replace(params=params)

    # Same batch ORDER as the twin: split-local natural order (emb_tr is
    # index-ordered by load_embeddings, i.e. metadata row order).
    step = make_train_step(model, opt, head_cfg, CELLS.astype(np.float32),
                           donate=False)
    lla_tr = lla[train_rows]
    for _ in range(EPOCHS):
        for rows in _batches(np.arange(len(emb_tr))):
            state, _ = step(state, {
                "inputs": jnp.asarray(emb_tr[rows]),
                "labels": jnp.asarray(lla_tr[rows]),
            }, jax.random.PRNGKey(4))

    eval_step = make_eval_step(model, head_cfg, CELLS.astype(np.float32),
                               num_candidates=NUM_CANDIDATES)
    _, val_preds = eval_step(state.params,
                             {"inputs": jnp.asarray(emb_val),
                              "labels": jnp.asarray(lla[val_rows])})

    metrics, _ = _prototypes_refine_metrics(df, emb_tr, emb_val,
                                            val_preds)
    debug = {"val_embedding": emb_val,
             "val_probs": np.asarray(val_preds["probs"])}
    return metrics, debug


class TestCompositionParityEmbedMode:
    @pytest.fixture(scope="class")
    def both(self, world, twin_result, tmp_path_factory):
        ours, ours_dbg = run_pigeon_tpu_embed_mode(
            *world, tmp_path_factory.mktemp("emb_sweep"))
        ref, ref_dbg = twin_result
        return ours, ref, ours_dbg, ref_dbg

    def test_sweep_roundtrip_matches_twin_embeddings(self, both):
        """The full sweep (pad, async copies, .npy, index reorder) returns
        exactly the twin's torch token-mean embeddings."""
        _, _, ours_dbg, ref_dbg = both
        np.testing.assert_allclose(ours_dbg["val_embedding"],
                                   ref_dbg["val_embedding"],
                                   atol=5e-5, rtol=1e-3)

    def test_trained_probabilities_parity(self, both):
        """Headless training on reloaded shards composes identically."""
        _, _, ours_dbg, ref_dbg = both
        np.testing.assert_allclose(ours_dbg["val_probs"],
                                   ref_dbg["val_probs"], atol=2e-3)

    def test_metric_table_parity(self, both):
        ours, ref, _, _ = both
        n_val = N_VAL
        assert abs(ours["Geocell_accuracy"] - ref["Geocell_accuracy"]) \
            <= 1.0 / n_val
        assert abs(ours["Geocell_top5_accuracy"]
                   - ref["Geocell_top5_accuracy"]) <= 1.0 / n_val
        med_o, med_r = ours["Median_km_error"], ref["Median_km_error"]
        assert abs(med_o - med_r) <= max(0.05 * med_r, 5.0), (med_o, med_r)
        assert abs(ours["Geoguessr_score"] - ref["Geoguessr_score"]) \
            <= 0.02 * 5000
        assert 0.6 <= ours["Geocell_accuracy"] < 1.0
