"""Independent torch/numpy re-derivation of the reference pipeline.

This module re-implements — WITHOUT importing pigeon_tpu — the exact
semantics of the reference's training + evaluation composition so the
composition-parity harness (`test_composition_parity.py`) can run the same
tiny synthetic world through both stacks and compare the final metric
tables. Everything here is derived directly from the reference sources:

* haversine (R = 6378137 m):        `preprocessing/geo_utils.py:7,23-38,77-93`
* smooth_labels:                    `preprocessing/utils.py:7-19`
* head forward + loss:              `models/super_guessr.py:350-483`
  (linear cell layer -> CE with smoothed probability targets)
* training loop (AdamW, per-batch): `training/train_eval_loop.py:164-253`
* prototype creation (OPTICS):      `dataset_creation/prototype/prototype.py`
* ProtoRefiner forward:             `models/proto_refiner.py:120-344`
  (including the within-cluster argmax-of-DISTANCE quirk at :250-255)
* metrics:                          `evaluation/metrics.py:90-202`
"""

from __future__ import annotations

import numpy as np
import torch

EARTH_RADIUS_KM = 6378137.0 / 1000.0
DECAY_CONSTANT = 1492.7  # reference config.py:52


# ----------------------------------------------------------------- geodesy

def haversine_np(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Pairwise (row-by-row) haversine km (`geo_utils.py:23-38`)."""
    x_rad, y_rad = np.radians(np.asarray(x, np.float64)), \
        np.radians(np.asarray(y, np.float64))
    delta = y_rad - x_rad
    a = np.sin(delta[:, 1] / 2) ** 2 + \
        np.cos(x_rad[:, 1]) * np.cos(y_rad[:, 1]) * \
        np.sin(delta[:, 0] / 2) ** 2
    return EARTH_RADIUS_KM * 2 * np.arcsin(np.sqrt(a))


def haversine_matrix_np(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """All-pairs haversine km: (N, 2) x (M, 2) -> (N, M)
    (`geo_utils.py:77-93`; the reference passes y transposed — here both
    are (rows, 2) for clarity, same arithmetic)."""
    x_rad = np.radians(np.asarray(x, np.float64))
    y_rad = np.radians(np.asarray(y, np.float64))
    delta = x_rad[:, :, None] - y_rad.T[None, :, :]
    p = np.cos(x_rad[:, 1])[:, None] * np.cos(y_rad[:, 1])[None, :]
    a = np.sin(delta[:, 1, :] / 2) ** 2 + p * np.sin(delta[:, 0, :] / 2) ** 2
    return EARTH_RADIUS_KM * 2 * np.arcsin(np.sqrt(np.clip(a, 0, 1)))


def smooth_labels_np(distances: np.ndarray, tau_km: float) -> np.ndarray:
    """`preprocessing/utils.py:7-19` (unnormalized exp(-(d - min)/tau))."""
    adj = distances - distances.min(axis=-1, keepdims=True)
    return np.nan_to_num(np.exp(-adj / tau_km), nan=0.0, posinf=0.0,
                         neginf=0.0)


# -------------------------------------------- contrastive pretrain (torch)

def pretrain_clip_torch(model, images_nchw: np.ndarray,
                        token_ids: np.ndarray, lr: float, epochs: int,
                        batch_size: int, b1: float = 0.9, b2: float = 0.98,
                        eps: float = 1e-6, max_grad_norm: float = 1.0,
                        accum_steps: int = 1):
    """Reference contrastive pretraining semantics: HF `Trainer.train` on a
    `CLIPModel` with ``return_loss=True`` (`training/train_modes.py:30-64`)
    — per-batch symmetric InfoNCE, AdamW, global-norm grad clipping before
    each step, fixed batch order, optional gradient accumulation (HF
    divides the loss by accum_steps and steps every accum_steps batches,
    `config.py:121,155`). weight_decay pinned to 0 on both sides so the
    comparison isolates loss/optimizer composition.

    Returns the per-micro-batch loss values (pre-division, i.e. the loss
    of each batch under the params current at that batch).
    """
    opt = torch.optim.AdamW(model.parameters(), lr=lr, betas=(b1, b2),
                            eps=eps, weight_decay=0.0)
    losses = []
    model.train()
    n = len(images_nchw)
    micro = 0
    opt.zero_grad()
    for _ in range(epochs):
        for start in range(0, n, batch_size):
            sl = slice(start, start + batch_size)
            out = model(
                input_ids=torch.from_numpy(token_ids[sl].astype(np.int64)),
                pixel_values=torch.from_numpy(images_nchw[sl]),
                return_loss=True)
            losses.append(float(out.loss.detach()))
            (out.loss / accum_steps).backward()
            micro += 1
            if micro % accum_steps == 0:
                if max_grad_norm is not None:
                    torch.nn.utils.clip_grad_norm_(model.parameters(),
                                                   max_grad_norm)
                opt.step()
                opt.zero_grad()
    model.eval()
    return losses


# ------------------------------------------------- head training (torch)

def train_head_torch(head: torch.nn.Linear, embeddings: np.ndarray,
                     labels_lla: np.ndarray, geocells: np.ndarray,
                     tau_km: float, lr: float, epochs: int,
                     batch_size: int) -> torch.nn.Linear:
    """Reference finetune-on-embeddings: frozen base, linear cell layer,
    CE against haversine-smoothed probability targets, AdamW, fixed batch
    order (`super_guessr.py:448-477`, `train_eval_loop.py:186-224`).

    weight_decay=0 so the comparison isolates the loss/optimizer
    semantics (the reference's optimizer uses torch defaults; the
    harness pins wd=0 on BOTH sides).
    """
    opt = torch.optim.AdamW(head.parameters(), lr=lr, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=0.0)
    loss_fnc = torch.nn.CrossEntropyLoss()  # super_guessr.py:112
    emb = torch.from_numpy(np.asarray(embeddings, np.float32))
    targets = torch.from_numpy(smooth_labels_np(
        haversine_matrix_np(labels_lla, geocells), tau_km).astype(
            np.float32))
    n = emb.shape[0]
    head.train()
    for _ in range(epochs):
        for start in range(0, n, batch_size):
            sl = slice(start, start + batch_size)
            opt.zero_grad()
            loss = loss_fnc(head(emb[sl]), targets[sl])
            loss.backward()
            opt.step()
    head.eval()
    return head


def head_predictions(head: torch.nn.Linear, embeddings: np.ndarray,
                     geocells: np.ndarray, num_candidates: int):
    """Forward + argmax/top-k geocell -> coords
    (`super_guessr.py:448-462`)."""
    with torch.no_grad():
        logits = head(torch.from_numpy(
            np.asarray(embeddings, np.float32)))
        probs = torch.softmax(logits, dim=-1)
    pred_cell = probs.argmax(dim=-1).numpy()
    pred_lla = np.asarray(geocells)[pred_cell]
    topk = torch.topk(probs, num_candidates, dim=-1)
    return {
        "probs": probs.numpy(),
        "pred_cell": pred_cell,
        "pred_lla": pred_lla,
        "topk_cells": topk.indices.numpy(),
        "topk_probs": topk.values.numpy(),
    }


class FullHeadTorch(torch.nn.Module):
    """Panorama + multi-task SuperGuessr head over 4-view embeddings
    (`super_guessr.py:90-131,416-483`): mean aggregation over views
    (heading features do not survive mean aggregation, :273-274), linear
    cell layer, and the three auxiliary heads with the 8/2/1 loss
    scalings (:16-23)."""

    def __init__(self, dim: int, num_cells: int):
        super().__init__()
        self.cell_layer = torch.nn.Linear(dim, num_cells)
        self.multi_task_head = torch.nn.Linear(dim, 6)
        self.climate_layer = torch.nn.Linear(dim, 28)
        self.month_layer = torch.nn.Linear(dim, 12)

    def forward(self, emb4):                   # (B, 4, D)
        agg = emb4.mean(dim=1)
        return (self.cell_layer(agg), self.multi_task_head(agg),
                self.climate_layer(agg), self.month_layer(agg))


def train_full_torch(head: FullHeadTorch, emb4: np.ndarray,
                     labels_lla: np.ndarray, labels_mt: np.ndarray,
                     labels_climate: np.ndarray, labels_month: np.ndarray,
                     geocells: np.ndarray, tau_km: float, lr: float,
                     epochs: int, batch_size: int) -> FullHeadTorch:
    """Reference multi-task training semantics (`super_guessr.py:316-348,
    469-477`): loss = CE(smoothed) + 8*MSE + 2*CE_climate + 1*CE_month."""
    opt = torch.optim.AdamW(head.parameters(), lr=lr, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=0.0)
    ce = torch.nn.CrossEntropyLoss()
    mse = torch.nn.MSELoss(reduction="mean")
    emb = torch.from_numpy(np.asarray(emb4, np.float32))
    targets = torch.from_numpy(smooth_labels_np(
        haversine_matrix_np(labels_lla, geocells), tau_km).astype(
            np.float32))
    t_mt = torch.from_numpy(np.asarray(labels_mt, np.float32))
    t_cl = torch.from_numpy(np.asarray(labels_climate, np.int64))
    t_mo = torch.from_numpy(np.asarray(labels_month, np.int64))
    n = emb.shape[0]
    head.train()
    for _ in range(epochs):
        for start in range(0, n, batch_size):
            sl = slice(start, start + batch_size)
            opt.zero_grad()
            logits, p_mt, p_cl, p_mo = head(emb[sl])
            loss = ce(logits, targets[sl]) \
                + 8.0 * mse(p_mt, t_mt[sl]) \
                + 2.0 * ce(p_cl, t_cl[sl]) \
                + 1.0 * ce(p_mo, t_mo[sl])
            loss.backward()
            opt.step()
    head.eval()
    return head


def full_head_predictions(head: FullHeadTorch, emb4: np.ndarray,
                          geocells: np.ndarray, num_candidates: int):
    with torch.no_grad():
        logits, p_mt, p_cl, p_mo = head(
            torch.from_numpy(np.asarray(emb4, np.float32)))
        probs = torch.softmax(logits, dim=-1)
    pred_cell = probs.argmax(dim=-1).numpy()
    topk = torch.topk(probs, num_candidates, dim=-1)
    return {
        "probs": probs.numpy(),
        "pred_cell": pred_cell,
        "pred_lla": np.asarray(geocells)[pred_cell],
        "topk_cells": topk.indices.numpy(),
        "topk_probs": topk.values.numpy(),
        "preds_mt": p_mt.numpy(),
        "preds_climate": p_cl.numpy(),
        "preds_month": p_mo.numpy(),
    }


# ------------------------------------------------------------- prototypes

def build_prototypes_sklearn(train_lla: np.ndarray, cell_idx: np.ndarray,
                             min_samples: int, xi: float):
    """Per-cell OPTICS clusters on precomputed haversine distances
    (`dataset_creation/prototype/prototype.py:121-149`): cells smaller
    than min_samples collapse to one cluster; zero distances become 1e-5;
    noise (-1) clusters are dropped; cluster centroid = arithmetic mean
    of member (lng, lat); indices are row positions in the train split.

    Returns rows: list of dicts {geocell_idx, lng, lat, count, indices}.
    """
    from sklearn.cluster import OPTICS

    rows = []
    for cell in np.unique(cell_idx):
        member_rows = np.where(cell_idx == cell)[0]
        pts = train_lla[member_rows]
        if len(member_rows) < min_samples:
            labels = np.zeros(len(member_rows), int)
        else:
            d = haversine_matrix_np(pts, pts)
            d = np.where(d == 0, 1e-5, d)
            labels = OPTICS(min_samples=min_samples, xi=xi,
                            metric="precomputed").fit_predict(d)
        for lab in np.unique(labels):
            if lab == -1:
                continue  # noise dropped (prototype.py:100)
            sel = member_rows[labels == lab]
            rows.append({
                "geocell_idx": int(cell),
                "lng": float(train_lla[sel, 0].mean()),
                "lat": float(train_lla[sel, 1].mean()),
                "count": int(len(sel)),
                "indices": sel.tolist(),
            })
    return rows


# --------------------------------------------------------------- refiner

def refine_reference(proto_rows, bank_emb: np.ndarray,
                     bank_lla: np.ndarray, embeddings: np.ndarray,
                     initial_preds: np.ndarray, candidate_cells: np.ndarray,
                     candidate_probs: np.ndarray, topk: int,
                     temperature: float, max_refinement_km: float):
    """ProtoRefiner.forward re-derivation (`proto_refiner.py:120-255`).

    Per sample: for each top-k candidate cell, the best cluster is the one
    whose MEAN member embedding is euclidean-closest; if that cluster has
    >1 member, within-cluster refinement picks the member with the
    LARGEST distance (the reference's argmax-of-distance at :250-255).
    Cluster logits softmax at `temperature`, multiply with candidate
    probabilities, cancel if the move exceeds max_refinement_km.
    """
    bank_emb = np.asarray(bank_emb, np.float64)
    protos_by_cell: dict[int, list] = {}
    for row in proto_rows:
        protos_by_cell.setdefault(int(row["geocell_idx"]), []).append(row)

    pred_lla, pred_cell, changed = [], [], []
    for i in range(len(embeddings)):
        emb = np.asarray(embeddings[i], np.float64)
        cands = candidate_cells[i][:topk]
        c_probs = np.asarray(candidate_probs[i][:topk], np.float64)

        top_preds, top_logits = [], []
        for cell in cands:
            clusters = protos_by_cell.get(int(cell))
            if not clusters:
                top_logits.append(-100000.0)  # proto_refiner.py:172
                top_preds.append([0.0, 0.0])
                continue
            proto_embs = np.stack([
                bank_emb[c["indices"]].mean(axis=0) for c in clusters])
            dists = np.linalg.norm(proto_embs - emb, axis=-1)
            logits = -dists
            top_logits.append(float(logits.max()))
            best = clusters[int(np.argmax(logits))]
            if best["count"] == 1:
                top_preds.append([best["lng"], best["lat"]])
            else:
                member_d = np.linalg.norm(
                    bank_emb[best["indices"]] - emb, axis=-1)
                far = best["indices"][int(np.argmax(member_d))]
                top_preds.append([float(bank_lla[far, 0]),
                                  float(bank_lla[far, 1])])

        ex = np.exp(np.asarray(top_logits) / temperature)
        probs = ex / ex.sum()
        final_probs = c_probs * probs
        refined = int(np.argmax(final_probs))
        dist = haversine_np(initial_preds[i:i + 1],
                            np.asarray([top_preds[refined]]))[0]
        if dist > max_refinement_km:  # proto_refiner.py:200-206
            final_probs = c_probs
        final = int(np.argmax(final_probs))
        pred_lla.append(top_preds[final])
        pred_cell.append(int(cands[final]))
        changed.append(final != 0)
    return (np.asarray(pred_lla), np.asarray(pred_cell),
            np.asarray(changed))


# ---------------------------------------------------------------- metrics

def compute_metrics_np(predictions: np.ndarray, labels: np.ndarray,
                       cell_preds: np.ndarray, cell_labels: np.ndarray,
                       topk_cells: np.ndarray):
    """`evaluation/metrics.py:90-202` core table (no aux heads)."""
    distances = haversine_np(predictions, labels)
    out = {
        "Mean_km_error": float(np.mean(distances)),
        "Median_km_error": float(np.median(distances)),
        "Geoguessr_score": float(np.mean(np.round(
            5000 * np.exp(-distances / DECAY_CONSTANT)))),
        "Geocell_accuracy": float(np.mean(cell_preds == cell_labels)),
        "Geocell_top5_accuracy": float(np.mean([
            lab in row for lab, row in zip(cell_labels, topk_cells)])),
    }
    for r in (1, 5, 10, 25, 50, 100, 200, 750, 1000, 2500):
        out[f"Under_{r}_km"] = float((distances < r).mean())
    return out
