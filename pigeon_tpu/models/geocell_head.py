"""Geocell classification head with haversine-smoothed labels + aux tasks.

TPU-native rebuild of the reference's `SuperGuessr` model
(`models/super_guessr.py:30-483`), split into:

  * :class:`GeocellHead` — a pure Flax module over (pre-computed or
    tower-produced) embeddings: panorama aggregation (mean | hierarchical
    self-attention), optional compass-heading features, geocell logits,
    multi-task heads;
  * :func:`geocell_loss` — the full training objective as a pure function:
    smoothed-CE geocell loss + scaled multi-task losses
    (`super_guessr.py:469-477`);
  * :func:`geocell_predictions` — argmax/top-k geocell -> (lon, lat) lookup.

Keeping the geocell centroid table OUT of the parameter tree (it is data,
passed per-call) lets the same jitted step serve any geocell set and lets
the (B x num_cells) haversine matrix in the loss be sharded over the model
axis of the mesh.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pigeon_tpu.config import HeadConfig
from pigeon_tpu.core.geodesy import haversine_matrix
from pigeon_tpu.core.scoring import smooth_labels

#: Default compass headings (sin, cos) when none are supplied — pointing
#: north for single images; N/E/S/W for 4-view panoramas (the GeoGuessr
#: capture pattern). Reference `models/super_guessr.py:27-28`.
DEFAULT_HEADING_SINGLE = np.array([0.0, 1.0], dtype=np.float32)
DEFAULT_HEADING_MULTI = np.array(
    [[0.0, 1.0], [1.0, 0.0], [0.0, -1.0], [-1.0, 0.0]], dtype=np.float32)


class GeocellOutput(NamedTuple):
    """Forward outputs of :class:`GeocellHead`."""

    logits: jnp.ndarray            # (B, num_cells)
    aggregated: jnp.ndarray        # (B, input_dim) post-aggregation features
    embedding: jnp.ndarray         # (B, D) or (B, 4, D) raw embeddings
    preds_mt: Optional[jnp.ndarray]       # (B, 6) regression predictions
    preds_climate: Optional[jnp.ndarray]  # (B, 28) climate logits
    preds_month: Optional[jnp.ndarray]    # (B, 12) month logits


def sinusoidal_positions(length: int, dim: int) -> np.ndarray:
    """Standard sinusoidal positional encoding table ``(length, dim)``.

    The reference's `PositionalEncoder` (`models/layers/positional_encoder.py`)
    intends this but indexes the table by *batch* position after a transpose
    (`:33-34,44`) — a defect we do not reproduce: here position i of the
    table is added to view i of every sample.
    """
    pos = np.arange(length, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float64)
                 * (-np.log(10000.0) / dim))
    table = np.zeros((length, dim), dtype=np.float64)
    table[:, 0::2] = np.sin(pos * div)
    table[:, 1::2] = np.cos(pos * div[: dim // 2])
    return table.astype(np.float32)


class GeocellHead(nn.Module):
    """Geocell classifier over image embeddings.

    Input: ``embedding`` of shape ``(B, D)`` (single image) or ``(B, 4, D)``
    (panorama), plus optional ``heading`` ``(B, 2)`` / ``(B, 4, 2)`` of
    (sin, cos) compass headings.
    """

    config: HeadConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, embedding, heading=None,
                 deterministic: bool = True) -> GeocellOutput:
        cfg = self.config
        emb = embedding.astype(self.dtype)

        if cfg.panorama:
            if emb.ndim != 3:
                raise ValueError(
                    f"panorama head expects (B, 4, D) embeddings, got {emb.shape}")
            if cfg.hierarchical:
                agg = self._hierarchical_aggregate(emb, heading, deterministic)
            else:
                # Mean over views; heading features do not survive mean
                # aggregation (reference super_guessr.py:273-274,437).
                agg = jnp.mean(emb, axis=1)
        else:
            if emb.ndim == 3:  # defensive: (B, 1, D)
                emb = emb[:, 0]
            agg = emb
            if cfg.heading:
                agg = jnp.concatenate(
                    [agg, self._heading_features(emb.shape[0], heading)],
                    axis=-1)

        dense = lambda n, name: nn.Dense(  # noqa: E731
            n, dtype=self.dtype, param_dtype=jnp.float32, name=name)

        logits = dense(cfg.num_cells, "cell_layer")(agg)

        preds_mt = preds_climate = preds_month = None
        if cfg.multi_task:
            # Regression head reads the embedding-width features (reference
            # super_guessr.py:114 uses hidden_size, not input_dim).
            mt_in = agg[..., : cfg.embed_dim]
            preds_mt = dense(cfg.num_mt_vars, "multi_task_head")(mt_in)
            preds_climate = dense(cfg.num_climates, "climate_layer")(agg)
            if cfg.predict_month:
                preds_month = dense(cfg.num_months, "month_layer")(agg)

        return GeocellOutput(
            logits=logits.astype(jnp.float32),
            aggregated=agg,
            embedding=embedding,
            preds_mt=None if preds_mt is None else preds_mt.astype(jnp.float32),
            preds_climate=(None if preds_climate is None
                           else preds_climate.astype(jnp.float32)),
            preds_month=(None if preds_month is None
                         else preds_month.astype(jnp.float32)),
        )

    def _heading_features(self, batch: int, heading):
        """(sin, cos) heading features for single-image mode."""
        if heading is None:
            h = jnp.asarray(DEFAULT_HEADING_SINGLE, dtype=self.dtype)
            return jnp.broadcast_to(h, (batch, 2))
        h = heading.astype(self.dtype)
        if h.ndim == 3:  # (B, 4, 2): first view (reference :288-289)
            h = h[:, 0]
        return h

    def _hierarchical_aggregate(self, emb, heading, deterministic):
        """Self-attention over the 4 panorama views, CLS-style pool.

        Reference `super_guessr.py:94-103,416-433`: optional heading concat
        (zero-padded so the width divides the head count), sinusoidal
        positions, one multi-head self-attention layer, take view 0.
        """
        cfg = self.config
        b = emb.shape[0]
        x = emb
        if cfg.heading:
            if heading is None:
                h = jnp.broadcast_to(
                    jnp.asarray(DEFAULT_HEADING_MULTI, dtype=self.dtype),
                    (b, 4, 2))
            else:
                h = heading.astype(self.dtype).reshape(b, 4, 2)
            pad = cfg.num_attention_heads - 2
            zeros = jnp.zeros((b, 4, pad), dtype=self.dtype)
            x = jnp.concatenate([x, h, zeros], axis=-1)

        dim = x.shape[-1]
        table = jnp.asarray(sinusoidal_positions(4, dim), dtype=self.dtype)
        x = x + table[None, :, :]
        x = nn.Dropout(rate=cfg.attn_dropout)(x, deterministic=deterministic)

        x = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_attention_heads,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            dropout_rate=cfg.attn_dropout,
            deterministic=deterministic,
            name="view_attention",
        )(x, x)
        return x[:, 0]


def smoothed_targets(labels_lla, geocells, tau_km: float):
    """Haversine-smoothed soft targets, fused on TPU.

    On TPU backends this dispatches to the Pallas kernel
    (`kernels/geodesy.py`): one VMEM pass instead of several (B, C) HBM
    intermediates. Elsewhere (CPU tests, interpret-free environments) it
    uses the XLA composition. Both paths are parity-tested.
    """
    import jax

    if jax.default_backend() == "tpu":
        # Same GSPMD constraint as attention (docs/SHARDING.md):
        # pallas_call rejects sharded avals, so on a registered
        # multi-chip mesh the kernel runs under shard_map — rows are
        # independent (batch-parallel), the geocell table replicates.
        from pigeon_tpu.kernels import flash_attention
        from pigeon_tpu.kernels.geodesy import smooth_labels_from_points

        mesh_info = flash_attention.get_attention_mesh()
        if mesh_info is not None:
            from jax.sharding import PartitionSpec as P

            mesh, batch_axis, _ = mesh_info
            sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
            if labels_lla.shape[0] % sizes.get(batch_axis, 1) != 0:
                batch_axis = None
            spec = P(batch_axis, None)
            return jax.shard_map(
                lambda l, g: smooth_labels_from_points(l, g, tau_km),
                mesh=mesh, in_specs=(spec, P(None, None)),
                out_specs=spec, check_vma=False)(labels_lla, geocells)
        return smooth_labels_from_points(labels_lla, geocells, tau_km)
    distances = haversine_matrix(labels_lla, geocells)
    return smooth_labels(distances, tau_km=tau_km)


def soft_cross_entropy(logits, targets):
    """``mean_B [ -sum_c targets_c * log_softmax(logits)_c ]``.

    Exactly torch's `CrossEntropyLoss` for (possibly unnormalized)
    probability targets — the reference's loss with smoothed labels
    (`super_guessr.py:474`).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(targets * logp, axis=-1))


def int_cross_entropy(logits, labels):
    """Standard CE with integer class labels."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def geocell_loss(output: GeocellOutput, geocells, cfg: HeadConfig,
                 labels_lla=None, labels_clf=None, labels_multi_task=None,
                 labels_climate=None, labels_month=None):
    """Full training objective (reference `super_guessr.py:469-477`).

    Args:
        output: forward outputs.
        geocells: ``(num_cells, 2)`` (lon, lat) centroid table.
        cfg: head config (smoothing tau, loss scalings).
        labels_lla: ``(B, 2)`` true (lon, lat) — required when smoothing.
        labels_clf: ``(B,)`` int geocell index — used when not smoothing.
        labels_multi_task: ``(B, 6)`` regression targets.
        labels_climate: ``(B,)`` int or ``(B, 28)`` soft climate targets.
        labels_month: ``(B,)`` int month targets.

    Returns:
        (total_loss, dict of components).
    """
    if cfg.smooth_labels:
        targets = smoothed_targets(labels_lla, geocells,
                                   cfg.label_smoothing_km)
        loss_clf = soft_cross_entropy(output.logits, targets)
    else:
        loss_clf = int_cross_entropy(output.logits, labels_clf)

    parts = {"loss_clf": loss_clf}
    total = loss_clf

    if cfg.multi_task:
        loss_reg = jnp.mean(
            (output.preds_mt - labels_multi_task) ** 2
        ) * cfg.regression_loss_scale
        if labels_climate.ndim == 1:
            loss_climate = int_cross_entropy(output.preds_climate,
                                             labels_climate)
        else:
            loss_climate = soft_cross_entropy(output.preds_climate,
                                              labels_climate)
        loss_climate = loss_climate * cfg.climate_loss_scale
        parts.update(loss_reg=loss_reg, loss_climate=loss_climate)
        total = total + loss_reg + loss_climate

        if cfg.predict_month and labels_month is not None:
            if cfg.month_smoothing > 0:
                from pigeon_tpu.core.scoring import smooth_month_labels

                month_targets = smooth_month_labels(
                    labels_month, cfg.num_months, cfg.month_smoothing)
                loss_month = soft_cross_entropy(output.preds_month,
                                                month_targets)
            else:
                loss_month = int_cross_entropy(
                    output.preds_month, labels_month)
            loss_month = loss_month * cfg.month_loss_scale
            parts["loss_month"] = loss_month
            total = total + loss_month

    parts["loss"] = total
    return total, parts


def geocell_predictions(logits, geocells, num_candidates: int = 5):
    """Geocell probabilities -> coordinate predictions + top-k candidates.

    Returns dict with:
        ``pred_lla``   (B, 2) centroid of the argmax cell,
        ``pred_cell``  (B,) argmax cell index,
        ``topk_cells`` (B, k), ``topk_probs`` (B, k).

    Reference `super_guessr.py:447-459`.
    """
    probs = jax.nn.softmax(logits, axis=-1)
    pred_cell = jnp.argmax(probs, axis=-1)
    pred_lla = jnp.take(geocells, pred_cell, axis=0)
    topk_probs, topk_cells = jax.lax.top_k(
        probs, min(num_candidates, probs.shape[-1]))
    return {
        "probs": probs,
        "pred_cell": pred_cell,
        "pred_lla": pred_lla,
        "topk_cells": topk_cells,
        "topk_probs": topk_probs,
    }
