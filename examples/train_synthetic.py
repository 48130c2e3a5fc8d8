"""End-to-end smoke example: synthetic images -> SPMD training -> metrics -> resume.

Runs on a virtual 8-device CPU mesh; doubles as the verify-skill drive script.
Usage: XLA_FLAGS="--xla_force_host_platform_device_count=8" python examples/train_synthetic.py
"""
import os, sys, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
if __name__ == "__main__":
    jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import pandas as pd
from PIL import Image

from pigeon_tpu.config import HeadConfig, VisionConfig
from pigeon_tpu.data import TabularImageDataset, iter_batches
from pigeon_tpu.models.super_guessr import SuperGuessr
from pigeon_tpu.train import (create_mesh, create_train_state, make_train_step,
                              make_eval_step, shard_batch)
from pigeon_tpu.train.train_loop import adamw
from pigeon_tpu.train.metrics import compute_geoguessr_metrics
from pigeon_tpu.train.checkpoints import save_checkpoint, restore_checkpoint


def main():
    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    # Synthetic "world": 4 geocells; image mean color encodes the cell.
    cells = np.array([[-100., 40.], [10., 50.], [120., 30.], [25., -25.]],
                     np.float32)
    rows = []
    os.makedirs(f"{tmp}/imgs", exist_ok=True)
    for i in range(64):
        c = i % 4
        color = np.zeros(3)
        color[c % 3] = 255 if c < 3 else 128
        img = rng.normal(color, 40, size=(48, 48, 3)).clip(0, 255)
        Image.fromarray(img.astype(np.uint8)).save(f"{tmp}/imgs/{i}.png")
        lng, lat = cells[c] + rng.normal(0, 1.0, 2)
        rows.append({"image": f"{i}.png", "lng": lng, "lat": lat,
                     "selection": "train" if i < 48 else "val",
                     "geocell_idx": c})
    pd.DataFrame(rows).to_csv(f"{tmp}/meta.csv", index=False)

    vis = VisionConfig(image_size=32, patch_size=8, hidden_size=32,
                       intermediate_size=64, num_layers=2, num_heads=4)
    hcfg = HeadConfig(num_cells=4, embed_dim=32, smooth_labels=True)
    model = SuperGuessr(vis, hcfg)
    opt = adamw(3e-4)
    mesh = create_mesh(tp=2)
    state = create_train_state(jax.random.PRNGKey(0), model, opt,
                               (jnp.zeros((2, 32, 32, 3)),), mesh=mesh)
    step = make_train_step(model, opt, hcfg, cells)
    train = TabularImageDataset.from_csv(f"{tmp}/meta.csv", "train",
                                         f"{tmp}/imgs", image_size=32)
    losses = []
    for epoch in range(8):
        for batch in iter_batches(train, 16, shuffle=True, seed=epoch,
                                  num_workers=4):
            batch = shard_batch({k: jnp.asarray(v) for k, v in batch.items()},
                                mesh)
            state, m = step(state, batch, jax.random.PRNGKey(0))
            losses.append(float(m["loss"]))
    print(f"loss: {losses[0]:.3f} -> {losses[-1]:.3f} ({len(losses)} steps)")

    val = TabularImageDataset.from_csv(f"{tmp}/meta.csv", "val",
                                       f"{tmp}/imgs", image_size=32)
    eval_step = make_eval_step(model, hcfg, cells, num_candidates=2)
    P, L, CP, CL = [], [], [], []
    for batch in iter_batches(val, 8, num_workers=4):
        jb = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
        _, preds = eval_step(state.params, jb)
        P.append(np.asarray(preds["pred_lla"]))
        L.append(batch["labels"])
        CP.append(np.asarray(preds["pred_cell"]))
        CL.append(batch["labels_clf"])
    metrics = compute_geoguessr_metrics(
        np.concatenate(P), np.concatenate(L), cell_preds=np.concatenate(CP),
        cell_labels=np.concatenate(CL))
    keys = ("Median_km_error", "Geocell_accuracy", "Geoguessr_score",
            "Under_200_km")
    print("val:", {k: round(metrics[k], 3) for k in keys})

    save_checkpoint(f"{tmp}/ckpt", state)
    blank = create_train_state(jax.random.PRNGKey(42), model, opt,
                               (jnp.zeros((2, 32, 32, 3)),), mesh=mesh)
    restored = restore_checkpoint(f"{tmp}/ckpt", blank)
    same = bool(jnp.allclose(restored.params["head"]["cell_layer"]["kernel"],
                             state.params["head"]["cell_layer"]["kernel"]))
    print("resume step:", int(restored.step), "params equal:", same)
    assert same and losses[-1] < losses[0]
    print("OK")


if __name__ == "__main__":
    main()
