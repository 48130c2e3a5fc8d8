"""Tests for the batched ProtoRefiner vs a literal numpy re-derivation of the
reference's per-sample loop semantics (`models/proto_refiner.py:121-255`)."""

import numpy as np
import pytest
import jax.numpy as jnp

from pigeon_tpu.config import RefinerConfig
from pigeon_tpu.core.geodesy import haversine_np
from pigeon_tpu.models.refiner import (
    ProtoBank,
    build_proto_bank,
    hedge_probs,
    make_refine_fn,
)

RNG = np.random.default_rng(21)
D = 16
NUM_CELLS = 8


@pytest.fixture(scope="module")
def bank_and_rows():
    """Synthetic prototype dataset: 8 cells, 1-3 clusters each."""
    n_bank = 60
    bank_emb = RNG.normal(size=(n_bank, D)).astype(np.float32)
    bank_lla = np.stack([RNG.uniform(-170, 170, n_bank),
                         RNG.uniform(-60, 60, n_bank)], -1) \
        .astype(np.float32)
    rows = []
    next_idx = 0
    for cell in range(NUM_CELLS - 1):   # last cell has NO prototypes
        for _ in range(RNG.integers(1, 4)):
            size = int(RNG.integers(1, 6))
            idx = list(range(next_idx, min(next_idx + size, n_bank)))
            next_idx += size
            if not idx:
                continue
            rows.append({
                "geocell_idx": cell,
                "lng": float(bank_lla[idx, 0].mean()),
                "lat": float(bank_lla[idx, 1].mean()),
                "count": len(idx),
                "indices": idx,
            })
    bank = build_proto_bank(rows, bank_emb, bank_lla, NUM_CELLS,
                            max_protos=4, max_members=8)
    return bank, rows, bank_emb, bank_lla


def numpy_reference_refine(rows, bank_emb, bank_lla, emb, initial, cells,
                           probs, topk, temp, max_ref,
                           within="reference"):
    """Literal per-sample reimplementation of the reference semantics."""
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["geocell_idx"], []).append(r)

    out_lla, out_cell, out_idx = [], [], []
    for b in range(len(emb)):
        logits, preds = [], []
        for cell in cells[b, :topk]:
            clusters = by_cell.get(int(cell))
            if not clusters:
                logits.append(-100000.0)
                preds.append((0.0, 0.0))
                continue
            protos = np.stack([bank_emb[c["indices"]].mean(0)
                               for c in clusters])
            dist = np.linalg.norm(protos - emb[b], axis=-1)
            best = int(dist.argmin())
            logits.append(-dist[best])
            c = clusters[best]
            if c["count"] == 1:
                preds.append((c["lng"], c["lat"]))
            else:
                members = np.asarray(c["indices"])
                md = np.linalg.norm(bank_emb[members] - emb[b], axis=-1)
                pick = members[md.argmax() if within == "reference"
                               else md.argmin()]
                preds.append(tuple(bank_lla[pick]))
        logits = np.asarray(logits)
        ex = np.exp(logits / temp - (logits / temp).max())
        # Match softmax exactly (reference has no max-subtraction but the
        # result is identical mathematically).
        pp = ex / ex.sum()
        final = probs[b, :topk] * pp
        refined = int(final.argmax())
        moved = haversine_np(np.asarray([initial[b]]),
                             np.asarray([preds[refined]]))[0]
        if moved > max_ref:
            final = probs[b, :topk]
        fi = int(final.argmax())
        out_lla.append(preds[fi])
        out_cell.append(cells[b, fi])
        out_idx.append(fi)
    return (np.asarray(out_lla, np.float32), np.asarray(out_cell),
            np.asarray(out_idx))


class TestParityWithReferenceLoop:
    @pytest.mark.parametrize("within", ["reference", "nearest"])
    def test_batched_matches_loop(self, bank_and_rows, within):
        bank, rows, bank_emb, bank_lla = bank_and_rows
        cfg = RefinerConfig(topk=4, temperature=1.6,
                            max_refinement_km=100000.0)
        refine = make_refine_fn(bank, cfg, within_cluster=within)

        b = 12
        emb = RNG.normal(size=(b, D)).astype(np.float32)
        cells = np.stack([RNG.permutation(NUM_CELLS)[:5]
                          for _ in range(b)]).astype(np.int32)
        probs = RNG.uniform(0.01, 1, size=(b, 5)).astype(np.float32)
        initial = np.stack([RNG.uniform(-170, 170, b),
                            RNG.uniform(-60, 60, b)], -1) \
            .astype(np.float32)

        got = refine(jnp.asarray(emb), jnp.asarray(initial),
                     jnp.asarray(cells), jnp.asarray(probs))
        want_lla, want_cell, want_idx = numpy_reference_refine(
            rows, bank_emb, bank_lla, emb, initial, cells, probs,
            topk=4, temp=1.6, max_ref=100000.0, within=within)

        np.testing.assert_array_equal(np.asarray(got["refine_index"]),
                                      want_idx)
        np.testing.assert_array_equal(np.asarray(got["pred_cell"]),
                                      want_cell)
        np.testing.assert_allclose(np.asarray(got["pred_lla"]), want_lla,
                                   atol=1e-4)

    def test_max_refinement_guard(self, bank_and_rows):
        bank, rows, bank_emb, bank_lla = bank_and_rows
        cfg = RefinerConfig(topk=4, temperature=1.6, max_refinement_km=1.0)
        refine = make_refine_fn(bank, cfg)
        b = 12
        emb = RNG.normal(size=(b, D)).astype(np.float32)
        cells = np.stack([RNG.permutation(NUM_CELLS)[:5]
                          for _ in range(b)]).astype(np.int32)
        probs = RNG.uniform(0.01, 1, size=(b, 5)).astype(np.float32)
        initial = np.stack([RNG.uniform(-170, 170, b),
                            RNG.uniform(-60, 60, b)], -1) \
            .astype(np.float32)
        got = refine(jnp.asarray(emb), jnp.asarray(initial),
                     jnp.asarray(cells), jnp.asarray(probs))
        want_lla, want_cell, want_idx = numpy_reference_refine(
            rows, bank_emb, bank_lla, emb, initial, cells, probs,
            topk=4, temp=1.6, max_ref=1.0, within="nearest")
        np.testing.assert_array_equal(np.asarray(got["refine_index"]),
                                      want_idx)
        # With a 1 km guard nearly every cross-cell refinement reverts to
        # the geocell argmax.
        np.testing.assert_array_equal(
            np.asarray(got["refine_index"]),
            probs[:, :4].argmax(-1))

    def test_panorama_embedding_averaged(self, bank_and_rows):
        bank, *_ = bank_and_rows
        cfg = RefinerConfig(topk=2)
        refine = make_refine_fn(bank, cfg)
        emb3 = RNG.normal(size=(3, 4, D)).astype(np.float32)
        cells = np.tile(np.arange(3, dtype=np.int32), (3, 1))
        out3 = refine(jnp.asarray(emb3), jnp.zeros((3, 2)),
                      jnp.asarray(cells), None)
        out2 = refine(jnp.asarray(emb3.mean(1)), jnp.zeros((3, 2)),
                      jnp.asarray(cells), None)
        np.testing.assert_allclose(np.asarray(out3["pred_lla"]),
                                   np.asarray(out2["pred_lla"]), atol=1e-6)

    def test_no_probs_uses_first_candidate(self, bank_and_rows):
        bank, *_ = bank_and_rows
        cfg = RefinerConfig(topk=3, max_refinement_km=1e9)
        refine = make_refine_fn(bank, cfg)
        emb = RNG.normal(size=(4, D)).astype(np.float32)
        cells = np.tile(np.arange(3, dtype=np.int32), (4, 1))
        out = refine(jnp.asarray(emb), jnp.zeros((4, 2)),
                     jnp.asarray(cells), None)
        assert out["pred_lla"].shape == (4, 2)


class TestHedge:
    def test_preserves_mass_and_prefers_central(self):
        # 4 guesses: 3 clustered in Europe, 1 in Australia.
        locs = np.asarray([[[2.0, 48.0], [5.0, 50.0], [8.0, 47.0],
                            [151.0, -33.0]]], np.float32)
        probs = np.asarray([[0.25, 0.25, 0.2, 0.3]], np.float32)
        out = np.asarray(hedge_probs(jnp.asarray(locs), jnp.asarray(probs),
                                     temperature=1.0))
        assert out.sum() == pytest.approx(probs.sum(), rel=1e-5)
        # The outlier must lose probability mass.
        assert out[0, 3] < probs[0, 3]
        assert out[0, :3].sum() > probs[0, :3].sum()


class TestHedgeInRefine:
    def test_refine_with_hedging_runs_and_can_change_pick(self,
                                                          bank_and_rows):
        bank, *_ = bank_and_rows
        base = RefinerConfig(topk=4, max_refinement_km=1e9)
        hedged = RefinerConfig(topk=4, max_refinement_km=1e9, hedge=True,
                               hedge_temperature=0.1)
        r_plain = make_refine_fn(bank, base)
        r_hedge = make_refine_fn(bank, hedged)
        b = 16
        emb = RNG.normal(size=(b, D)).astype(np.float32)
        cells = np.stack([RNG.permutation(NUM_CELLS)[:5]
                          for _ in range(b)]).astype(np.int32)
        probs = RNG.uniform(0.01, 1, size=(b, 5)).astype(np.float32)
        initial = np.zeros((b, 2), np.float32)
        out_p = r_plain(jnp.asarray(emb), jnp.asarray(initial),
                        jnp.asarray(cells), jnp.asarray(probs))
        out_h = r_hedge(jnp.asarray(emb), jnp.asarray(initial),
                        jnp.asarray(cells), jnp.asarray(probs))
        assert out_h["pred_lla"].shape == (b, 2)
        assert np.isfinite(np.asarray(out_h["pred_lla"])).all()
        # Aggressive hedging temperature should move at least one pick.
        assert (np.asarray(out_h["refine_index"])
                != np.asarray(out_p["refine_index"])).any()


class TestLandmarksConcat:
    def test_dual_dataset_bank(self):
        """The reference concatenates YFCC + landmark datasets for its
        landmark refiner (`proto_refiner.py:53-64`); with array banks this
        is a plain concat — indices of the second dataset shift by len(A)."""
        rng = np.random.default_rng(3)
        emb_a = rng.normal(size=(10, D)).astype(np.float32)
        emb_b = rng.normal(size=(6, D)).astype(np.float32)
        lla_a = rng.uniform(-60, 60, size=(10, 2)).astype(np.float32)
        lla_b = rng.uniform(-60, 60, size=(6, 2)).astype(np.float32)
        rows_a = [{"geocell_idx": 0, "lng": 1.0, "lat": 1.0, "count": 3,
                   "indices": [0, 1, 2]}]
        rows_b = [{"geocell_idx": 1, "lng": 2.0, "lat": 2.0, "count": 2,
                   "indices": [0, 1]}]  # indices into dataset B

        bank_emb = np.concatenate([emb_a, emb_b])
        bank_lla = np.concatenate([lla_a, lla_b])
        offset = len(emb_a)
        rows = rows_a + [dict(r, indices=[i + offset for i in r["indices"]])
                         for r in rows_b]
        bank = build_proto_bank(rows, bank_emb, bank_lla, num_cells=2,
                                max_protos=2, max_members=4)
        refine = make_refine_fn(bank, RefinerConfig(topk=2,
                                                    max_refinement_km=1e9))
        # Query exactly matching dataset B's member 1 -> its coordinates.
        q = jnp.asarray(emb_b[1:2])
        out = refine(q, jnp.zeros((1, 2)),
                     jnp.asarray([[1, 0]], jnp.int32),
                     jnp.asarray([[0.9, 0.1]], jnp.float32))
        np.testing.assert_allclose(np.asarray(out["pred_lla"])[0],
                                   lla_b[1], atol=1e-5)


class TestRefinerOnMesh:
    """The refiner under multi-device GSPMD (VERDICT r3 item 4): pure
    jnp, so mesh-sharded query batches must reproduce the single-device
    refinement bit-for-bit — this is what lets `evaluate --tp N` keep
    refinement on the mesh (`train/evaluate.py:88-103` path)."""

    @pytest.mark.parametrize("tp", [1, 2])
    def test_sharded_batch_matches_single_device(self, bank_and_rows, tp):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        from pigeon_tpu.train import create_mesh

        if len(jax.devices()) < 2:
            pytest.skip("needs the 8-virtual-device conftest mesh")
        bank, rows, bank_emb, bank_lla = bank_and_rows
        cfg = RefinerConfig(topk=4, temperature=1.6,
                            max_refinement_km=100000.0)
        refine = make_refine_fn(bank, cfg)

        b = 8
        emb = jnp.asarray(RNG.normal(size=(b, D)).astype(np.float32))
        cells = jnp.asarray(np.stack(
            [RNG.permutation(NUM_CELLS)[:5] for _ in range(b)]
        ).astype(np.int32))
        probs = jnp.asarray(
            RNG.uniform(0.01, 1, size=(b, 5)).astype(np.float32))
        initial = jnp.asarray(np.stack(
            [RNG.uniform(-170, 170, b), RNG.uniform(-60, 60, b)],
            -1).astype(np.float32))

        want = refine(emb, initial, cells, probs)

        mesh = create_mesh(tp=tp)
        shard = NamedSharding(mesh, PartitionSpec("data"))
        got = refine(jax.device_put(emb, shard),
                     jax.device_put(initial, shard),
                     jax.device_put(cells, shard),
                     jax.device_put(probs, shard))
        for key in ("pred_lla", "pred_cell", "refine_index", "changed"):
            np.testing.assert_array_equal(np.asarray(got[key]),
                                          np.asarray(want[key]), err_msg=key)


class TestManySeedHunt:
    """Randomized bank/query hunt vs the numpy oracle — exercises the
    lazy member-refinement path (refined-guess column + cancel gate +
    final pick) across bank shapes the fixed fixture cannot. Crank
    REFINER_HUNT_SEEDS (default 6, ~8 s) for deep hunts; 60 seeds x
    both within modes x loose/tight cancel gates ran clean when the
    lazy path landed."""

    def test_random_banks_match_oracle(self):
        import os

        n_seeds = int(os.environ.get("REFINER_HUNT_SEEDS", "6"))
        for seed in range(n_seeds):
            rng = np.random.default_rng(seed)
            num_cells = int(rng.integers(4, 12))
            n_bank = int(rng.integers(20, 80))
            bank_emb = rng.normal(size=(n_bank, D)).astype(np.float32)
            bank_lla = np.stack(
                [rng.uniform(-170, 170, n_bank),
                 rng.uniform(-60, 60, n_bank)], -1).astype(np.float32)
            rows, next_idx = [], 0
            for cell in range(num_cells - 1):
                for _ in range(int(rng.integers(0, 4))):
                    size = int(rng.integers(1, 7))
                    idx = list(range(next_idx,
                                     min(next_idx + size, n_bank)))
                    next_idx += size
                    if not idx:
                        continue
                    rows.append({"geocell_idx": cell,
                                 "lng": float(bank_lla[idx, 0].mean()),
                                 "lat": float(bank_lla[idx, 1].mean()),
                                 "count": len(idx), "indices": idx})
            if not rows:
                continue
            bank = build_proto_bank(rows, bank_emb, bank_lla, num_cells,
                                    max_protos=4, max_members=8)
            b = int(rng.integers(1, 16))
            k = int(rng.integers(2, min(6, num_cells) + 1))
            emb = rng.normal(size=(b, D)).astype(np.float32)
            cells = np.stack([rng.permutation(num_cells)[:k]
                              for _ in range(b)]).astype(np.int32)
            probs = rng.uniform(0.01, 1, size=(b, k)).astype(np.float32)
            initial = np.stack([rng.uniform(-170, 170, b),
                                rng.uniform(-60, 60, b)], -1) \
                .astype(np.float32)

            for within in ("reference", "nearest"):
                for max_ref in (1.0e9, float(rng.uniform(50, 3000))):
                    cfg = RefinerConfig(topk=k, temperature=1.6,
                                        max_refinement_km=max_ref)
                    refine = make_refine_fn(bank, cfg,
                                            within_cluster=within)
                    got = refine(jnp.asarray(emb), jnp.asarray(initial),
                                 jnp.asarray(cells), jnp.asarray(probs))
                    want_lla, want_cell, want_idx = \
                        numpy_reference_refine(
                            rows, bank_emb, bank_lla, emb, initial,
                            cells, probs, topk=k, temp=1.6,
                            max_ref=max_ref, within=within)
                    tag = f"seed={seed} within={within} ref={max_ref}"
                    np.testing.assert_array_equal(
                        np.asarray(got["refine_index"]), want_idx,
                        err_msg=tag)
                    np.testing.assert_array_equal(
                        np.asarray(got["pred_cell"]), want_cell,
                        err_msg=tag)
                    np.testing.assert_allclose(
                        np.asarray(got["pred_lla"]), want_lla,
                        atol=1e-4, err_msg=tag)
