"""Tests for GeocellHead: aggregation, heading, losses, predictions.

Loss semantics are pinned against torch's CrossEntropyLoss / MSELoss — the
reference's exact loss functions (`models/super_guessr.py:114-130,469-477`).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pigeon_tpu.config import HeadConfig
from pigeon_tpu.core.geodesy import haversine_matrix_np
from pigeon_tpu.models import GeocellHead, geocell_loss
from pigeon_tpu.models.geocell_head import (
    DEFAULT_HEADING_MULTI,
    geocell_predictions,
    int_cross_entropy,
    soft_cross_entropy,
)

torch = pytest.importorskip("torch")

RNG = np.random.default_rng(330)
NUM_CELLS = 17
DIM = 32


def rand_geocells(n=NUM_CELLS):
    lon = RNG.uniform(-180, 180, n)
    lat = RNG.uniform(-60, 70, n)
    return np.stack([lon, lat], -1).astype(np.float32)


class TestLossParity:
    def test_soft_ce_matches_torch(self):
        logits = RNG.normal(size=(8, NUM_CELLS)).astype(np.float32)
        targets = RNG.uniform(0, 1, size=(8, NUM_CELLS)).astype(np.float32)
        ours = float(soft_cross_entropy(jnp.asarray(logits),
                                        jnp.asarray(targets)))
        ref = torch.nn.CrossEntropyLoss()(
            torch.from_numpy(logits), torch.from_numpy(targets)).item()
        assert ours == pytest.approx(ref, rel=1e-5)

    def test_int_ce_matches_torch(self):
        logits = RNG.normal(size=(8, 12)).astype(np.float32)
        labels = RNG.integers(0, 12, size=8)
        ours = float(int_cross_entropy(jnp.asarray(logits),
                                       jnp.asarray(labels)))
        ref = torch.nn.CrossEntropyLoss()(
            torch.from_numpy(logits), torch.from_numpy(labels)).item()
        assert ours == pytest.approx(ref, rel=1e-5)


class TestHeadForward:
    def _init(self, cfg, emb_shape, heading=None):
        head = GeocellHead(cfg)
        emb = jnp.asarray(RNG.normal(size=emb_shape).astype(np.float32))
        params = head.init(jax.random.PRNGKey(0), emb, heading)
        return head, params, emb

    def test_single_image_shapes(self):
        cfg = HeadConfig(num_cells=NUM_CELLS, embed_dim=DIM, panorama=False,
                         multi_task=True, heading=False)
        head, params, emb = self._init(cfg, (5, DIM))
        out = head.apply(params, emb)
        assert out.logits.shape == (5, NUM_CELLS)
        assert out.preds_mt.shape == (5, 6)
        assert out.preds_climate.shape == (5, 28)
        assert out.preds_month.shape == (5, 12)

    def test_heading_default_north(self):
        # Single image + heading mode, no heading given -> (0, 1) appended.
        cfg = HeadConfig(num_cells=NUM_CELLS, embed_dim=DIM, panorama=False,
                         heading=True)
        head, params, emb = self._init(cfg, (4, DIM))
        out_default = head.apply(params, emb, None)
        north = jnp.broadcast_to(jnp.asarray([[0.0, 1.0]]), (4, 2))
        out_explicit = head.apply(params, emb, north)
        np.testing.assert_allclose(np.asarray(out_default.logits),
                                   np.asarray(out_explicit.logits))

    def test_panorama_mean_equals_manual(self):
        cfg = HeadConfig(num_cells=NUM_CELLS, embed_dim=DIM, panorama=True,
                         hierarchical=False)
        head, params, emb = self._init(cfg, (3, 4, DIM))
        out = head.apply(params, emb)
        # Mean-aggregated panorama == feeding the mean as a single embedding.
        cfg_single = HeadConfig(num_cells=NUM_CELLS, embed_dim=DIM,
                                panorama=False)
        single = GeocellHead(cfg_single)
        mean_emb = jnp.mean(emb, axis=1)
        out2 = single.apply(params, mean_emb)
        np.testing.assert_allclose(np.asarray(out.logits),
                                   np.asarray(out2.logits), atol=1e-5)

    def test_hierarchical_runs(self):
        cfg = HeadConfig(num_cells=NUM_CELLS, embed_dim=DIM, panorama=True,
                         hierarchical=True, heading=True,
                         num_attention_heads=2)
        head = GeocellHead(cfg)
        emb = jnp.asarray(RNG.normal(size=(3, 4, DIM)).astype(np.float32))
        heading = jnp.asarray(
            np.tile(DEFAULT_HEADING_MULTI, (3, 1, 1)))
        params = head.init(jax.random.PRNGKey(0), emb, heading)
        out = head.apply(params, emb, heading)
        assert out.logits.shape == (3, NUM_CELLS)
        assert np.isfinite(np.asarray(out.logits)).all()


class TestGeocellLoss:
    def test_smoothed_loss_matches_manual(self):
        cfg = HeadConfig(num_cells=NUM_CELLS, embed_dim=DIM,
                         smooth_labels=True, label_smoothing_km=75.0)
        cells = rand_geocells()
        head = GeocellHead(cfg)
        emb = jnp.asarray(RNG.normal(size=(6, DIM)).astype(np.float32))
        params = head.init(jax.random.PRNGKey(0), emb)
        out = head.apply(params, emb)
        labels_lla = jnp.asarray(rand_geocells(6))

        total, parts = geocell_loss(out, jnp.asarray(cells), cfg,
                                    labels_lla=labels_lla)

        # Manual: f64 distances -> smooth -> torch CE.
        d = haversine_matrix_np(np.asarray(labels_lla), cells)
        smoothed = np.exp(-(d - d.min(-1, keepdims=True)) / 75.0)
        ref = torch.nn.CrossEntropyLoss()(
            torch.from_numpy(np.asarray(out.logits)),
            torch.from_numpy(smoothed.astype(np.float32))).item()
        assert float(total) == pytest.approx(ref, rel=1e-4)

    def test_multitask_scalings(self):
        cfg = HeadConfig(num_cells=NUM_CELLS, embed_dim=DIM,
                         smooth_labels=False, multi_task=True,
                         predict_month=True)
        head = GeocellHead(cfg)
        emb = jnp.asarray(RNG.normal(size=(6, DIM)).astype(np.float32))
        params = head.init(jax.random.PRNGKey(0), emb)
        out = head.apply(params, emb)

        labels_clf = jnp.asarray(RNG.integers(0, NUM_CELLS, 6))
        labels_mt = jnp.asarray(RNG.normal(size=(6, 6)).astype(np.float32))
        labels_climate = jnp.asarray(RNG.integers(0, 28, 6))
        labels_month = jnp.asarray(RNG.integers(0, 12, 6))
        total, parts = geocell_loss(
            out, jnp.asarray(rand_geocells()), cfg, labels_clf=labels_clf,
            labels_multi_task=labels_mt, labels_climate=labels_climate,
            labels_month=labels_month)

        # Scalings 8 / 2 / 1 (reference super_guessr.py:17,20,23).
        mse = torch.nn.MSELoss()(
            torch.from_numpy(np.asarray(out.preds_mt)),
            torch.from_numpy(np.asarray(labels_mt))).item()
        assert float(parts["loss_reg"]) == pytest.approx(8 * mse, rel=1e-5)
        assert float(total) == pytest.approx(
            float(parts["loss_clf"]) + float(parts["loss_reg"])
            + float(parts["loss_climate"]) + float(parts["loss_month"]),
            rel=1e-6)


class TestPredictions:
    def test_topk_and_lla_lookup(self):
        cells = rand_geocells()
        logits = RNG.normal(size=(4, NUM_CELLS)).astype(np.float32)
        preds = geocell_predictions(jnp.asarray(logits),
                                    jnp.asarray(cells), num_candidates=5)
        best = logits.argmax(-1)
        np.testing.assert_array_equal(np.asarray(preds["pred_cell"]), best)
        np.testing.assert_allclose(np.asarray(preds["pred_lla"]),
                                   cells[best], rtol=1e-6)
        assert preds["topk_cells"].shape == (4, 5)
        # top-1 of topk == argmax
        np.testing.assert_array_equal(
            np.asarray(preds["topk_cells"][:, 0]), best)
        # topk probs are descending
        tp = np.asarray(preds["topk_probs"])
        assert (np.diff(tp, axis=1) <= 1e-7).all()


class TestMonthSmoothing:
    def test_smoothed_month_loss_differs_and_matches_manual(self):
        import dataclasses
        from pigeon_tpu.core.scoring import smooth_month_labels

        base = HeadConfig(num_cells=NUM_CELLS, embed_dim=DIM,
                          smooth_labels=False, multi_task=True,
                          predict_month=True)
        smoothed = dataclasses.replace(base, month_smoothing=0.3)
        head = GeocellHead(base)
        emb = jnp.asarray(RNG.normal(size=(6, DIM)).astype(np.float32))
        params = head.init(jax.random.PRNGKey(0), emb)
        out = head.apply(params, emb)
        kwargs = dict(
            labels_clf=jnp.asarray(RNG.integers(0, NUM_CELLS, 6)),
            labels_multi_task=jnp.zeros((6, 6)),
            labels_climate=jnp.asarray(RNG.integers(0, 28, 6)),
            labels_month=jnp.asarray(RNG.integers(0, 12, 6)))
        cells = jnp.asarray(rand_geocells())
        _, hard = geocell_loss(out, cells, base, **kwargs)
        _, soft = geocell_loss(out, cells, smoothed, **kwargs)
        assert float(hard["loss_month"]) != float(soft["loss_month"])
        # Manual: soft CE with the cyclic kernel.
        targets = smooth_month_labels(kwargs["labels_month"], 12, 0.3)
        from pigeon_tpu.models.geocell_head import soft_cross_entropy
        want = float(soft_cross_entropy(out.preds_month, targets))
        assert float(soft["loss_month"]) == pytest.approx(want, rel=1e-6)


class TestHierarchicalTorchParity:
    """Golden parity: the hierarchical panorama aggregation (heading
    concat + zero pad + sinusoidal positions + one multi-head
    self-attention + CLS pool, reference `super_guessr.py:94-103,
    416-433`) vs torch.nn.MultiheadAttention with identical weights.

    NOTE the reference's PositionalEncoder indexes its table by BATCH
    position (a defect this framework deliberately does not reproduce,
    `geocell_head.py::sinusoidal_positions`); the torch twin here uses
    the corrected per-view table on both sides, pinning the attention
    math rather than the documented bug."""

    def test_matches_torch_mha(self):
        from pigeon_tpu.models.geocell_head import sinusoidal_positions

        heads, b = 4, 3
        cfg = HeadConfig(num_cells=NUM_CELLS, embed_dim=DIM, panorama=True,
                         hierarchical=True, heading=True,
                         num_attention_heads=heads, attn_dropout=0.0)
        head = GeocellHead(cfg)
        emb = jnp.asarray(RNG.normal(size=(b, 4, DIM)).astype(np.float32))
        heading = jnp.asarray(
            np.tile(DEFAULT_HEADING_MULTI, (b, 1, 1)).astype(np.float32))
        params = head.init(jax.random.PRNGKey(3), emb, heading)["params"]
        out = head.apply({"params": params}, emb, heading,
                         deterministic=True)

        dim = DIM + heads  # heading (2) + zero pad (heads - 2)
        dh = dim // heads

        # --- torch twin with the SAME weights -------------------------
        attn = params["view_attention"]
        mha = torch.nn.MultiheadAttention(dim, heads, batch_first=True)
        with torch.no_grad():
            in_proj = np.concatenate([
                np.asarray(attn[k]["kernel"]).reshape(dim, dim).T
                for k in ("query", "key", "value")])
            mha.in_proj_weight.copy_(torch.from_numpy(in_proj))
            mha.in_proj_bias.copy_(torch.from_numpy(np.concatenate([
                np.asarray(attn[k]["bias"]).reshape(dim)
                for k in ("query", "key", "value")])))
            mha.out_proj.weight.copy_(torch.from_numpy(
                np.asarray(attn["out"]["kernel"]).reshape(dim, dim).T))
            mha.out_proj.bias.copy_(torch.from_numpy(
                np.asarray(attn["out"]["bias"])))
        mha.eval()

        x = np.concatenate([
            np.asarray(emb),
            np.asarray(heading),
            np.zeros((b, 4, heads - 2), np.float32)], axis=-1)
        x = torch.from_numpy(
            x + sinusoidal_positions(4, dim)[None])
        with torch.no_grad():
            agg = mha(x, x, x, need_weights=False)[0][:, 0]
            logits = torch.nn.functional.linear(
                agg,
                torch.from_numpy(
                    np.asarray(params["cell_layer"]["kernel"]).T),
                torch.from_numpy(np.asarray(params["cell_layer"]["bias"])))

        np.testing.assert_allclose(np.asarray(out.logits), logits.numpy(),
                                   atol=2e-5, rtol=1e-4)
