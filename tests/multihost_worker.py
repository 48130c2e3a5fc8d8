"""Worker process for the 2-process x 4-device multi-host simulation.

Launched by tests/test_multihost.py as
``python multihost_worker.py <pid> <nproc> <port> <workdir>``; each
process initializes jax.distributed over a local coordinator, so
`jax.process_count() == nproc` with 4 CPU devices per process — a real
multi-host SPMD environment (JAX cannot tell this apart from two hosts).

Writes ``result_<pid>.json`` with embedding checksums and train losses
for the test to assert against a single-process reference.
"""

import json
import os
import sys

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    pid, nproc, port, workdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc

    import jax.numpy as jnp
    import numpy as np

    from pigeon_tpu.config import VisionConfig
    from pigeon_tpu.data.pipeline import TabularImageDataset
    from pigeon_tpu.models.embedder import ClipEmbedder
    from pigeon_tpu.train.mesh import create_mesh
    from pigeon_tpu.train.multihost import (
        global_batch_from_local,
        host_slice,
        is_primary,
        iter_host_batches,
    )
    from pigeon_tpu.train.embed import embed_splits_to_disk, load_embeddings

    mesh = create_mesh()        # all 8 global devices on the data axis
    result = {"pid": pid}

    # ---- embed sweep: per-host slices + allgather + primary save --------
    tiny = VisionConfig(image_size=32, patch_size=8, hidden_size=32,
                        intermediate_size=64, num_layers=2, num_heads=4)
    model = ClipEmbedder(tiny)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    ds = TabularImageDataset.from_csv(
        os.path.join(workdir, "meta.csv"), "train",
        os.path.join(workdir, "imgs"), image_size=32)
    assert len(ds) == 10
    sl = host_slice(len(ds))
    result["host_slice"] = [sl.start, sl.stop]

    out_dir = os.path.join(workdir, "emb")
    embed_splits_to_disk(model, params, {"train": ds}, out_dir,
                         batch_size=4)
    # Every host sees the gathered table via load on the saved file
    # (primary wrote it; barrier guarantees it exists).
    emb = load_embeddings(out_dir, "train")
    result["emb_shape"] = list(emb.shape)
    result["emb_checksum"] = float(np.abs(emb).sum())

    # ---- train step over a global batch built from local shards ---------
    from pigeon_tpu.train import create_train_state, make_train_step
    from pigeon_tpu.train.modes import build_embedding_model
    from pigeon_tpu.train.train_loop import adamw
    from pigeon_tpu import pigeon_config
    import dataclasses

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

    # Deterministic global batch; every host holds the metadata but only
    # materializes its own slice as device data.
    rng = np.random.default_rng(3)
    g_inputs = rng.normal(size=(8, 32)).astype(np.float32)
    g_labels = np.stack([rng.uniform(-150, 150, 8),
                         rng.uniform(-50, 60, 8)], -1).astype(np.float32)
    g_cls = rng.integers(0, 6, 8).astype(np.int32)
    sl = host_slice(8)
    local = {"inputs": g_inputs[sl], "labels": g_labels[sl],
             "labels_clf": g_cls[sl]}
    batch = global_batch_from_local(local, mesh)
    losses = []
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(metrics["loss"]))
    result["losses"] = losses

    # ---- per-host input pipeline over image files -----------------------
    total = 0.0
    rows = 0
    for gb in iter_host_batches(ds, global_batch_size=8, mesh=mesh,
                                shuffle=True, seed=5):
        s = jax.jit(lambda b: jnp.sum(b["inputs"]))(gb)
        total += float(s)
        rows += gb["inputs"].shape[0]
    result["pipeline_rows"] = rows
    result["pipeline_sum"] = total

    # ---- coordinated preemption: SIGTERM on ONE host stops BOTH ---------
    # (at the same step, through the same collective checkpoint save —
    # a lone host exiting would strand the other at its next collective)
    import signal

    from pigeon_tpu.train import make_eval_step
    from pigeon_tpu.train.checkpoints import latest_step
    from pigeon_tpu.train.loop import train_model
    from pigeon_tpu.train.multihost import coordinated_flag

    assert coordinated_flag(False) is False
    assert coordinated_flag(pid == 0) is True      # host 0's flag reaches 1

    fired = {"n": 0}

    def train_batches(_epoch=None):
        # state.step starts at 2 (the phase above). Host 0 receives
        # SIGTERM while producing its 3rd batch; with log_every=2 both
        # hosts poll the coordinated flag at global steps 4 and 6 and
        # must stop TOGETHER at step 6.
        for _ in range(6):
            fired["n"] += 1
            if pid == 0 and fired["n"] == 3:
                os.kill(os.getpid(), signal.SIGTERM)
            yield batch

    eval_step = make_eval_step(hmodel, cfg.head, cells, num_candidates=3)
    ckpt_dir = os.path.join(workdir, "preempt_ckpt")
    state2, hist = train_model(
        state, step, eval_step, train_batches, lambda: [],
        num_epochs=1, rng=jax.random.PRNGKey(7),
        checkpoint_dir=ckpt_dir, log_every=2, early_stopping_patience=5)
    result["preempt_step"] = int(jax.device_get(state2.step))
    result["preempt_hist"] = len(hist)
    result["preempt_ckpt_step"] = latest_step(ckpt_dir)

    with open(os.path.join(workdir, f"result_{pid}.json"), "w") as f:
        json.dump(result, f)
    print(f"proc {pid} OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
