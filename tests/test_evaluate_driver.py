"""Evaluation driver: presets, refiner cache, end-to-end benchmark eval."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pigeon_tpu.config import HeadConfig, RefinerConfig
from pigeon_tpu.models import GeocellHead
from pigeon_tpu.train import make_eval_step
from pigeon_tpu.train.evaluate import (
    EVAL_NUM_CANDIDATES,
    build_refiner,
    evaluate_benchmark,
    refiner_preset,
)

RNG = np.random.default_rng(14)


class TestPresets:
    def test_families(self):
        assert refiner_preset("gws15k").topk == 5
        assert refiner_preset("gws15k").max_refinement_km == 1000.0
        assert refiner_preset("yfcc26k").topk == 40
        assert refiner_preset("yfcc26k").temperature == 0.6
        assert refiner_preset("im2gps3k").topk == 20
        assert refiner_preset("unknown-benchmark").topk == 5
        assert EVAL_NUM_CANDIDATES == 50


class TestRefinerCache:
    def test_npz_roundtrip(self, tmp_path):
        n_bank = 30
        bank_emb = RNG.normal(size=(n_bank, 8)).astype(np.float32)
        bank_lla = np.stack([RNG.uniform(-170, 170, n_bank),
                             RNG.uniform(-60, 60, n_bank)], -1) \
            .astype(np.float32)
        rows = [{"geocell_idx": i % 3, "lng": 1.0, "lat": 2.0, "count": 10,
                 "indices": list(range(i * 3, i * 3 + 3))}
                for i in range(6)]
        cache = str(tmp_path / "bank.npz")
        cfg = RefinerConfig(topk=2)
        fn1 = build_refiner(rows, bank_emb, bank_lla, num_cells=3, cfg=cfg,
                            cache_path=cache)
        import os

        assert os.path.exists(cache)
        # Second build loads from cache (mutate inputs to prove it).
        fn2 = build_refiner([], bank_emb * 0, bank_lla * 0, num_cells=3,
                            cfg=cfg, cache_path=cache)
        emb = jnp.asarray(RNG.normal(size=(4, 8)).astype(np.float32))
        cells = jnp.asarray(np.tile([0, 1, 2], (4, 1)).astype(np.int32))
        out1 = fn1(emb, jnp.zeros((4, 2)), cells, None)
        out2 = fn2(emb, jnp.zeros((4, 2)), cells, None)
        np.testing.assert_allclose(np.asarray(out1["pred_lla"]),
                                   np.asarray(out2["pred_lla"]))


class TestEndToEnd:
    def test_refined_eval_beats_unrefined_on_designed_task(self):
        """Design a task where refinement MUST help: two cells, queries are
        near-duplicates of specific bank members far from cell centroids."""
        dim = 8
        cells = np.array([[0.0, 0.0], [100.0, 0.0]], np.float32)
        # Bank: cluster members sit 5 deg from their cell centroid.
        bank_lla = np.array([[5.0, 0.0], [5.1, 0.1], [95.0, 0.0],
                             [95.1, 0.1]], np.float32)
        bank_emb = np.array([[1, 0, 0, 0, 0, 0, 0, 0],
                             [0, 1, 0, 0, 0, 0, 0, 0],
                             [0, 0, 1, 0, 0, 0, 0, 0],
                             [0, 0, 0, 1, 0, 0, 0, 0]], np.float32)
        rows = [
            {"geocell_idx": 0, "lng": 5.05, "lat": 0.05, "count": 2,
             "indices": [0, 1]},
            {"geocell_idx": 1, "lng": 95.05, "lat": 0.05, "count": 2,
             "indices": [2, 3]},
        ]
        refine = build_refiner(rows, bank_emb, bank_lla, num_cells=2,
                               cfg=RefinerConfig(topk=2,
                                                 max_refinement_km=1e6))
        # Query embedding ~ bank member 2 -> should land at (95, 0).
        emb = jnp.asarray(bank_emb[2:3] + 0.01)
        cand = jnp.asarray([[1, 0]], jnp.int32)
        probs = jnp.asarray([[0.9, 0.1]], jnp.float32)
        initial = jnp.asarray(cells[1:2])
        out = refine(emb, initial, cand, probs)
        np.testing.assert_allclose(np.asarray(out["pred_lla"])[0],
                                   [95.0, 0.0], atol=0.2)

    def test_evaluate_benchmark_plumbing(self):
        cfg = HeadConfig(num_cells=4, embed_dim=8, smooth_labels=True)
        cells = np.array([[0, 0], [90, 0], [-90, 0], [0, 45]], np.float32)
        model = GeocellHead(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((2, 8)))["params"]
        eval_step = make_eval_step(model, cfg, cells, num_candidates=2)
        batches = [{
            "inputs": jnp.asarray(RNG.normal(size=(6, 8)).astype(np.float32)),
            "labels": jnp.asarray(cells[RNG.integers(0, 4, 6)]),
            "labels_clf": jnp.asarray(RNG.integers(0, 4, 6)),
        }]
        metrics = evaluate_benchmark(eval_step, params, batches)
        assert {"Median_km_error", "Geocell_accuracy",
                "Geoguessr_score"} <= set(metrics)
