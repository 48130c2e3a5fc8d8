"""ProtoNet guess refinement as batched TPU code.

The reference's `ProtoRefiner` (`models/proto_refiner.py:121-255`) loops in
Python over every sample and every candidate geocell, issuing one cdist +
argmax per (sample, candidate) and a per-cluster HF-dataset lookup for the
within-cluster step — the slowest component of its eval stack. Here the
whole refinement is ONE jitted function:

  * prototypes live in padded device arrays ``(num_cells, P, D)`` with
    masks (variable-length clusters -> static shapes + masking, the TPU
    encoding of raggedness);
  * per-candidate work is a `lax.scan` over the K candidates (K <= 40), each
    step a batched gather + distance + masked argmin — MXU/VPU work instead
    of Python;
  * the within-cluster "best training image" lookup is a second batched
    gather into the training embedding bank — deferred to the SELECTED
    candidate columns (at most two: the refined guess for the cancel
    gate, then the final pick) instead of all K, since the selection
    depends on member coordinates only through those columns. At
    production sizes (M=256, P=64, K=40) this removes ~80% of the
    refiner's HBM gather traffic; with hedging enabled all K columns
    are refined (hedging weighs every candidate's location).

Pipeline parity (reference `proto_refiner.py:176-231`):
  temperature-softmax over best-cluster distances, multiplied with geocell
  probabilities, refinement cancelled beyond `max_refinement_km`, optional
  hedging, final argmax.

Deviation (documented): for within-cluster refinement the reference picks
the training image with the LARGEST embedding distance (`argmax` of cdist,
`proto_refiner.py:252-254`) — almost certainly a defect. Default here is
``within_cluster='nearest'``; pass ``'reference'`` to reproduce the
reference's farthest-image behavior bit-for-bit.
"""

from __future__ import annotations

import dataclasses
import json


import jax
import jax.numpy as jnp
import numpy as np

from pigeon_tpu.config import RefinerConfig
from pigeon_tpu.core.geodesy import haversine

#: Sentinel logit for candidates with no prototype data
#: (reference `proto_refiner.py:172`).
_NO_PROTO_LOGIT = -100000.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ProtoBank:
    """Padded prototype + training-bank arrays (device-resident).

    Shapes:
        proto_emb:    (C, P, D)  per-cell cluster prototype embeddings
        proto_lla:    (C, P, 2)  cluster centroid (lon, lat)
        proto_count:  (C, P)     cluster member counts (0 = padding)
        member_idx:   (C, P, M)  member row indices into the bank (-1 pad)
        bank_emb:     (N, D)     training-set embeddings
        bank_lla:     (N, 2)     training-set (lon, lat)
    """

    proto_emb: jnp.ndarray
    proto_lla: jnp.ndarray
    proto_count: jnp.ndarray
    member_idx: jnp.ndarray
    bank_emb: jnp.ndarray
    bank_lla: jnp.ndarray

    @property
    def num_cells(self) -> int:
        return self.proto_emb.shape[0]


def parse_indices(idx) -> list:
    """Normalize a prototype row's ``indices`` field (list, JSON string,
    None, or NaN — the CSV round-trip formats,
    `dataset_creation/prototype/prototype.py:110-119`) to a list of ints.
    Single implementation shared by `build_proto_bank` and the CLI's
    dual-dataset bank concat."""
    if isinstance(idx, str):
        try:
            idx = json.loads(idx)
        except (json.JSONDecodeError, TypeError):
            idx = []
    if idx is None or (isinstance(idx, float) and np.isnan(idx)):
        idx = []
    return [int(i) for i in idx]


def build_proto_bank(proto_rows, bank_emb: np.ndarray, bank_lla: np.ndarray,
                     num_cells: int, max_protos: int = 64,
                     max_members: int = 256) -> ProtoBank:
    """Pack per-cell cluster prototypes into padded arrays.

    Args:
        proto_rows: iterable of dicts with keys ``geocell_idx``, ``lng``,
            ``lat``, ``count``, ``indices`` (list or JSON string of bank
            rows) — the prototype-dataset schema
            (`dataset_creation/prototype/prototype.py:69-95`).
        bank_emb: ``(N, D)`` training embeddings (panorama embeddings must
            already be view-averaged).
        bank_lla: ``(N, 2)`` training (lon, lat).
        num_cells: total geocell count (cells without rows stay masked).
        max_protos: clusters kept per cell (largest-first on overflow).
        max_members: member indices kept per cluster.
    """
    bank_emb = np.asarray(bank_emb, np.float32)
    bank_lla = np.asarray(bank_lla, np.float32)
    d = bank_emb.shape[1]

    proto_emb = np.zeros((num_cells, max_protos, d), np.float32)
    proto_lla = np.zeros((num_cells, max_protos, 2), np.float32)
    proto_count = np.zeros((num_cells, max_protos), np.int32)
    member_idx = np.full((num_cells, max_protos, max_members), -1, np.int32)

    per_cell: dict[int, list] = {}
    for row in proto_rows:
        idx = parse_indices(row["indices"])
        if not idx:
            continue
        per_cell.setdefault(int(row["geocell_idx"]), []).append(
            (float(row["lng"]), float(row["lat"]), idx))

    for cell, clusters in per_cell.items():
        if cell < 0 or cell >= num_cells:
            continue
        clusters = sorted(clusters, key=lambda c: -len(c[2]))[:max_protos]
        for p, (lng, lat, idx) in enumerate(clusters):
            members = np.asarray(idx[:max_members], np.int64)
            proto_emb[cell, p] = bank_emb[members].mean(0)
            proto_lla[cell, p] = (lng, lat)
            proto_count[cell, p] = len(idx)
            member_idx[cell, p, :len(members)] = members

    return ProtoBank(
        proto_emb=jnp.asarray(proto_emb),
        proto_lla=jnp.asarray(proto_lla),
        proto_count=jnp.asarray(proto_count),
        member_idx=jnp.asarray(member_idx),
        bank_emb=jnp.asarray(bank_emb),
        bank_lla=jnp.asarray(bank_lla),
    )


def hedge_probs(locations, probs, temperature: float = 5.0):
    """Competitive-play hedging: shift probability toward geographically
    central guesses (reference `models/layers/hedge.py:23-44`).

    Args:
        locations: ``(B, K, 2)`` candidate (lon, lat).
        probs: ``(B, K)`` probabilities.
    Returns: ``(B, K)`` redistributed probabilities (same per-row sum).
    """
    d = haversine(locations[:, :, None, :], locations[:, None, :, :])
    centrality = 1.0 / (jnp.mean(d, axis=1)
                        / jnp.mean(d, axis=(1, 2), keepdims=False)[:, None])
    w = jax.nn.softmax(centrality / temperature, axis=-1)
    redist = probs * w
    scale = probs.sum(-1, keepdims=True) / \
        jnp.maximum(redist.sum(-1, keepdims=True), 1e-20)
    return redist * scale


def make_refine_fn(bank: ProtoBank, cfg: RefinerConfig,
                   within_cluster: str = "nearest"):
    """Build the jitted batched refinement function.

    Returns ``refine(embedding, initial_preds, candidate_cells,
    candidate_probs) -> {"pred_lla", "pred_cell", "refine_index",
    "changed"}`` operating on a whole batch at once.
    """
    if within_cluster not in ("nearest", "reference"):
        raise ValueError(f"within_cluster={within_cluster!r}")
    k = cfg.topk
    temp = cfg.temperature
    max_ref = cfg.max_refinement_km

    def per_candidate(carry, cell_idx):
        """One candidate column: cell_idx (B,) -> best-CLUSTER results.

        Prototype-level only: the (B, M, D) member-embedding gather —
        ~80% of the refiner's HBM traffic at production sizes (M=256
        vs P=64) — is DEFERRED to `member_refined_lla` below, which
        the non-hedging path runs for at most two candidate columns
        instead of all K (the selection depends on member coordinates
        only through the chosen column's cancel-gate distance)."""
        bank, emb = carry  # bank arrays ride the carry (jit ARGUMENTS —
        # a closed-over bank would embed ~GBs of constants; docs/PERF.md)
        protos = bank.proto_emb[cell_idx]         # (B, P, D) gather
        counts = bank.proto_count[cell_idx]       # (B, P)
        valid = counts > 0

        diff = protos - emb[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)        # (B, P) squared L2
        d2 = jnp.where(valid, d2, jnp.inf)
        best_p = jnp.argmin(d2, axis=-1)          # (B,)
        has_proto = valid.any(axis=-1)
        # Reference logit = -euclidean distance of best cluster (:177-180).
        best_logit = jnp.where(
            has_proto,
            -jnp.sqrt(jnp.take_along_axis(d2, best_p[:, None], 1)[:, 0]),
            _NO_PROTO_LOGIT)

        rows = jnp.arange(cell_idx.shape[0])
        best_lla = bank.proto_lla[cell_idx, best_p]        # (B, 2)
        best_count = counts[rows, best_p]
        return carry, (best_logit, best_lla, best_count, best_p,
                       has_proto)

    def member_refined_lla(bank, emb, cell_idx, best_p, best_lla,
                           best_count, has_proto):
        """Within-cluster refinement for ONE candidate column: pick one
        training image's exact coords (`proto_refiner.py:233-255`);
        only when the cluster has >1 member. Identical math to the
        pre-split per-candidate body — the oracle/twin tests pin it."""
        rows = jnp.arange(cell_idx.shape[0])
        members = bank.member_idx[cell_idx, best_p]        # (B, M)
        m_valid = members >= 0
        m_emb = bank.bank_emb[jnp.maximum(members, 0)]     # (B, M, D)
        m_d2 = jnp.sum((m_emb - emb[:, None, :]) ** 2, axis=-1)
        if within_cluster == "nearest":
            m_d2 = jnp.where(m_valid, m_d2, jnp.inf)
            pick = jnp.argmin(m_d2, axis=-1)
        else:  # 'reference': farthest member (reference argmax-of-distance)
            m_d2 = jnp.where(m_valid, m_d2, -jnp.inf)
            pick = jnp.argmax(m_d2, axis=-1)
        picked = members[rows, pick]
        member_lla = bank.bank_lla[jnp.maximum(picked, 0)]

        pred_lla = jnp.where((best_count > 1)[:, None], member_lla,
                             best_lla)
        return jnp.where(has_proto[:, None], pred_lla,
                         jnp.zeros_like(pred_lla))

    @jax.jit
    def refine_jit(bank, embedding, initial_preds, candidate_cells,
                   candidate_probs):
        """Refine a batch of guesses.

        Args:
            embedding: ``(B, D)`` or ``(B, V, D)`` query embeddings
                (view-averaged if 3D, reference :139-140).
            initial_preds: ``(B, 2)`` unrefined (lon, lat).
            candidate_cells: ``(B, K>=topk)`` candidate cell indices.
            candidate_probs: ``(B, K)`` candidate probabilities (optional:
                pass None to consider only the first candidate).

        Returns dict: ``pred_lla`` (B, 2), ``pred_cell`` (B,),
            ``refine_index`` (B,) chosen candidate slot,
            ``changed`` (B,) whether refinement moved off slot 0.
        """
        if embedding.ndim == 3:
            embedding = embedding.mean(axis=1)
        cells = candidate_cells[:, :k]
        if candidate_probs is None:
            probs_k = jnp.zeros(cells.shape, jnp.float32).at[:, 0].set(1.0)
        else:
            probs_k = candidate_probs[:, :k]

        _, (logits, blla, bcount, bp, hp) = jax.lax.scan(
            per_candidate, (bank, embedding), cells.T)
        logits = logits.T                         # (B, K)
        blla = jnp.swapaxes(blla, 0, 1)           # (B, K, 2)
        bcount, bp, hp = bcount.T, bp.T, hp.T     # (B, K)

        def col(a, idx):
            """Select one candidate column per row: (B, K[, 2]) -> (B[, 2])."""
            if a.ndim == 3:
                return jnp.take_along_axis(a, idx[:, None, None], 1)[:, 0]
            return jnp.take_along_axis(a, idx[:, None], 1)[:, 0]

        def refined_for(idx):
            """Member-refined (lon, lat) of candidate column `idx` —
            ONE (B, M, D) gather instead of K of them."""
            return member_refined_lla(
                bank, embedding, col(cells, idx), col(bp, idx),
                col(blla, idx), col(bcount, idx), col(hp, idx))

        # Temperature softmax over candidates (reference :186-188).
        proto_probs = jax.nn.softmax(logits / temp, axis=-1)
        final_probs = probs_k * proto_probs       # (:190-193)

        initial_guess = jnp.argmax(probs_k, axis=-1)
        refined_guess = jnp.argmax(final_probs, axis=-1)

        if cfg.hedge:
            # Hedging weighs ALL candidate locations — compute the
            # member-refined coords per candidate (the full path).
            def member_col(carry, xs):
                bank, emb = carry
                return carry, member_refined_lla(bank, emb, *xs)

            _, cand_lla = jax.lax.scan(
                member_col, (bank, embedding),
                (cells.T, bp.T, jnp.swapaxes(blla, 0, 1), bcount.T,
                 hp.T))
            cand_lla = jnp.swapaxes(cand_lla, 0, 1)    # (B, K, 2)
            refined_lla = col(cand_lla, refined_guess)
        else:
            cand_lla = None
            refined_lla = refined_for(refined_guess)

        # Cancel cross-cell refinement beyond max_refinement km (:197-205).
        moved = haversine(initial_preds, refined_lla)
        final_probs = jnp.where((moved > max_ref)[:, None], probs_k,
                                final_probs)

        if cfg.hedge:
            final_probs = hedge_probs(cand_lla, final_probs,
                                      cfg.hedge_temperature)

        final_idx = jnp.argmax(final_probs, axis=-1)
        pred_lla = (col(cand_lla, final_idx) if cand_lla is not None
                    else refined_for(final_idx))
        pred_cell = jnp.take_along_axis(cells, final_idx[:, None], 1)[:, 0]
        return {
            "pred_lla": pred_lla,
            "pred_cell": pred_cell,
            "refine_index": final_idx,
            "changed": final_idx != initial_guess,
        }

    def refine(embedding, initial_preds, candidate_cells, candidate_probs):
        return refine_jit(bank, embedding, initial_preds, candidate_cells,
                          candidate_probs)

    return refine
