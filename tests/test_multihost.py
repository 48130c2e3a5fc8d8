"""Multi-host scale-out: REAL 2-process x 4-device CPU simulation.

Spawns two OS processes that form a jax.distributed cluster (the CPU
analogue of a 2-host TPU pod slice: 8 global devices, 4 addressable per
process) and runs the per-host input pipeline, the allgathered embed
sweep, and a globally-sharded train step. Results must match a
single-process 8-device reference bit-for-math.

This substitutes for the multi-node testing the reference never had
(SURVEY §4) and covers its DDP contract (`preprocessing/embed.py:36-79`).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
RNG = np.random.default_rng(41)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mh")
    img_dir = tmp / "imgs"
    img_dir.mkdir()
    rows = ["image,lng,lat,selection"]
    for i in range(10):
        img = RNG.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(img).save(img_dir / f"{i}.png")
        rows.append(f"{i}.png,{(i * 31) % 170 - 80},{(i * 17) % 120 - 55},"
                    f"train")
    (tmp / "meta.csv").write_text("\n".join(rows) + "\n")
    return tmp


@pytest.fixture(scope="module")
def results(world):
    """Run the 2-process cluster once; return both result dicts."""
    port = _free_port()
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               PYTHONPATH=REPO + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "multihost_worker.py"),
         str(pid), "2", str(port), str(world)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    return [json.loads((world / f"result_{pid}.json").read_text())
            for pid in range(2)]


def _single_process_reference(world):
    """Same computation on the in-process 8-device CPU mesh."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from pigeon_tpu import pigeon_config
    from pigeon_tpu.config import VisionConfig
    from pigeon_tpu.data.pipeline import TabularImageDataset
    from pigeon_tpu.models.embedder import ClipEmbedder
    from pigeon_tpu.train import create_train_state, make_train_step
    from pigeon_tpu.train.embed import embed_dataset
    from pigeon_tpu.train.mesh import create_mesh, shard_batch
    from pigeon_tpu.train.modes import build_embedding_model
    from pigeon_tpu.train.train_loop import adamw

    mesh = create_mesh()
    tiny = VisionConfig(image_size=32, patch_size=8, hidden_size=32,
                        intermediate_size=64, num_layers=2, num_heads=4)
    model = ClipEmbedder(tiny)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    ds = TabularImageDataset.from_csv(
        str(world / "meta.csv"), "train", str(world / "imgs"),
        image_size=32)
    emb = embed_dataset(model, params, ds, batch_size=4)["embeddings"]

    cells = np.stack([np.linspace(-150, 150, 6),
                      np.linspace(-50, 60, 6)], -1).astype(np.float32)
    cfg = pigeon_config()
    head = dataclasses.replace(cfg.head, num_cells=6, embed_dim=32,
                               panorama=False, multi_task=False)
    cfg = cfg.replace(head=head)
    hmodel = build_embedding_model(cfg)
    opt = adamw(1e-3)
    state = create_train_state(jax.random.PRNGKey(1), hmodel, opt,
                               (jnp.zeros((2, 32)),), mesh=mesh)
    step = make_train_step(hmodel, opt, cfg.head, cells, donate=False)
    rng = np.random.default_rng(3)
    batch = shard_batch({
        "inputs": jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32)),
        "labels": jnp.asarray(np.stack(
            [rng.uniform(-150, 150, 8), rng.uniform(-50, 60, 8)],
            -1).astype(np.float32)),
        "labels_clf": jnp.asarray(rng.integers(0, 6, 8).astype(np.int32)),
    }, mesh)
    losses = []
    for _ in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(metrics["loss"]))
    return emb, losses


class TestTwoProcessCluster:
    def test_hosts_cover_disjoint_slices(self, results):
        s0, s1 = results[0]["host_slice"], results[1]["host_slice"]
        assert s0 == [0, 5] and s1 == [5, 10]

    def test_embed_sweep_gathers_full_table(self, results, world):
        for r in results:
            assert r["emb_shape"][0] == 10
        assert results[0]["emb_checksum"] == \
            pytest.approx(results[1]["emb_checksum"])
        emb_ref, _ = _single_process_reference(world)
        # The multi-host sweep must reproduce the single-process table.
        emb_mh = np.load(world / "emb" / "train.npy")
        idx = np.load(world / "emb" / "train_indices.npy")
        order = np.argsort(idx)
        np.testing.assert_allclose(emb_mh[order], emb_ref, atol=1e-5)

    def test_train_losses_match_single_process(self, results, world):
        _, ref_losses = _single_process_reference(world)
        for r in results:
            assert np.isfinite(r["losses"]).all()
            np.testing.assert_allclose(r["losses"], ref_losses, rtol=1e-5)
        np.testing.assert_allclose(results[0]["losses"],
                                   results[1]["losses"], rtol=0)

    def test_host_pipeline_covers_global_batches(self, results):
        # 10 rows, global batch 8 (= data-axis size), drop_last -> 8 rows.
        for r in results:
            assert r["pipeline_rows"] == 8
        assert results[0]["pipeline_sum"] == \
            pytest.approx(results[1]["pipeline_sum"], rel=1e-6)

    def test_coordinated_preemption_stops_all_hosts_together(self, results):
        """SIGTERM lands on host 0 only; the coordinated flag makes BOTH
        hosts leave the loop at the same log_every boundary (step 6) and
        participate in one collective checkpoint save — the distributed
        half of the preemption contract (`train/preemption.py`)."""
        for r in results:
            assert r["preempt_step"] == 6
            assert r["preempt_ckpt_step"] == 6
            assert r["preempt_hist"] == 0      # stopped before eval
