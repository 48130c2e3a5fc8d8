"""Full PIGEON lifecycle on synthetic data — every subsystem end to end.

    geocell creation -> head finetuning (SPMD mesh) -> embedding sweep ->
    prototype building -> refined benchmark evaluation -> HTTP serving.

Runs in a few minutes on a virtual 8-device CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/full_pipeline.py
"""

import base64
import io
import json
import os
import sys
import tempfile
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import pandas as pd
from PIL import Image

from pigeon_tpu.config import HeadConfig, VisionConfig
from pigeon_tpu.data import TabularImageDataset, iter_batches
from pigeon_tpu.geocell import CellAssigner, GeocellCreator, build_prototypes
from pigeon_tpu.geocell.creation import BoundarySet
from pigeon_tpu.models.refiner import build_proto_bank, make_refine_fn
from pigeon_tpu.models.super_guessr import SuperGuessr
from pigeon_tpu.train import (
    create_mesh,
    create_train_state,
    make_eval_step,
    make_train_step,
    shard_batch,
)
from pigeon_tpu.train.embed import embed_dataset, embed_splits_to_disk, \
    load_embeddings
from pigeon_tpu.train.evaluate import build_refiner
from pigeon_tpu.train.loop import evaluate_model
from pigeon_tpu.train.train_loop import adamw
from pigeon_tpu.config import RefinerConfig
from pigeon_tpu.serve import PredictionService, serve
from pigeon_tpu.serve.server import make_serving_fn

VIS = VisionConfig(image_size=32, patch_size=8, hidden_size=32,
                   intermediate_size=64, num_layers=2, num_heads=4)


def make_world(tmp, n_regions=4, per_region=60):
    """Synthetic world: image color encodes region; admin grid boundaries."""
    rng = np.random.default_rng(0)
    centers = np.array([[-100., 40.], [10., 50.], [120., 30.], [25., -25.]])
    feats = []
    for cx, cy in centers:
        x0, y0 = cx - 5, cy - 5
        feats.append({"type": "Feature", "properties": {},
                      "geometry": {"type": "Polygon", "coordinates": [
                          [[x0, y0], [x0 + 10, y0], [x0 + 10, y0 + 10],
                           [x0, y0 + 10], [x0, y0]]]}})
    (tmp / "admin2.geojson").write_text(json.dumps(
        {"type": "FeatureCollection", "features": feats}))

    os.makedirs(tmp / "imgs", exist_ok=True)
    rows = []
    n = n_regions * per_region
    for i in range(n):
        c = i % n_regions
        color = np.zeros(3)
        color[c % 3] = 255 if c < 3 else 128
        img = rng.normal(color, 40, (48, 48, 3)).clip(0, 255)
        Image.fromarray(img.astype(np.uint8)).save(tmp / f"imgs/{i}.png")
        lng, lat = centers[c] + rng.normal(0, 1.5, 2)
        rows.append({"image": f"{i}.png", "lng": lng, "lat": lat,
                     "selection": "train" if i % 5 else "test"})
    df = pd.DataFrame(rows)
    df.to_csv(tmp / "meta.csv", index=False)
    return df


def main(epochs: int = 6, per_region: int = 60):
    tmp = tempfile.mkdtemp()
    from pathlib import Path

    tmp = Path(tmp)
    df = make_world(tmp, per_region=per_region)
    # tp=2 on an even-sized mesh (the documented 8-device CPU recipe);
    # degrade to pure DP on a single chip so the example runs anywhere.
    mesh = create_mesh(tp=2 if len(jax.devices()) % 2 == 0 else 1)

    # ---- 1. geocell creation -------------------------------------------
    bs = BoundarySet.from_geojson(str(tmp / "admin2.geojson"))
    creator = GeocellCreator(df, admin_2=bs)
    cells_coll = creator.generate(30, 120, ((5, 0.05),),
                                  output_csv=str(tmp / "geocells.csv"))
    assigner = CellAssigner.from_csv(str(tmp / "geocells.csv"))
    print(f"[1] geocells: {len(cells_coll)} cells")

    # label every row with its geocell
    df["geocell_idx"] = assigner.assign(
        df[["lng", "lat"]].to_numpy(np.float64))
    df.to_csv(tmp / "meta.csv", index=False)
    cells = assigner.centroids.astype(np.float32)

    # ---- 2. head finetuning (SPMD) -------------------------------------
    hcfg = HeadConfig(num_cells=assigner.num_cells, embed_dim=32,
                      smooth_labels=True, num_candidates=3)
    model = SuperGuessr(VIS, hcfg)
    opt = adamw(3e-4)
    state = create_train_state(jax.random.PRNGKey(0), model, opt,
                               (jnp.zeros((2, 32, 32, 3)),), mesh=mesh)
    step = make_train_step(model, opt, hcfg, cells)
    train_ds = TabularImageDataset.from_csv(str(tmp / "meta.csv"), "train",
                                            str(tmp / "imgs"), image_size=32)
    first = last = None
    for epoch in range(epochs):
        for batch in iter_batches(train_ds, 16, shuffle=True, seed=epoch,
                                  drop_last=True, num_workers=4):
            dev = shard_batch({k: jnp.asarray(v) for k, v in batch.items()},
                              mesh)
            state, m = step(state, dev, jax.random.PRNGKey(0))
            last = float(m["loss"])
            first = first if first is not None else last
    print(f"[2] finetune: loss {first:.3f} -> {last:.3f}")

    # ---- 3. embedding sweep --------------------------------------------
    # The finetuned tower's params slot straight into the standalone
    # embedder (same module tree under 'vision').
    from pigeon_tpu.models.embedder import ClipEmbedder

    emb_model = ClipEmbedder(VIS)
    emb_params = {"vision": state.params["vision"]}
    out = embed_dataset(emb_model, emb_params, train_ds, batch_size=16,
                        num_workers=4)
    bank_emb = out["embeddings"]
    bank_lla = train_ds.labels_lla()
    print(f"[3] embeddings: {bank_emb.shape}")

    # ---- 4. prototypes + refiner ---------------------------------------
    train_df = df[df["selection"] == "train"].reset_index(drop=True)
    protos = build_prototypes(train_df, cluster_args=(5, 0.05),
                              num_workers=0,
                              output_csv=str(tmp / "protos.csv"))
    refine_fn = build_refiner(
        protos.to_dict("records"), bank_emb, bank_lla,
        num_cells=assigner.num_cells,
        cfg=RefinerConfig(topk=3, max_refinement_km=100000.0,
                          temperature=1.6))
    print(f"[4] prototypes: {len(protos)} clusters")

    # ---- 5. refined evaluation -----------------------------------------
    test_ds = TabularImageDataset.from_csv(str(tmp / "meta.csv"), "test",
                                           str(tmp / "imgs"), image_size=32)
    eval_step = make_eval_step(model, hcfg, cells, num_candidates=3)
    to_dev = lambda b: shard_batch(  # noqa: E731
        {k: jnp.asarray(v) for k, v in b.items()}, mesh)
    plain = evaluate_model(eval_step, state.params,
                           iter_batches(test_ds, 16, num_workers=4),
                           batch_to_device=to_dev)
    refined = evaluate_model(eval_step, state.params,
                             iter_batches(test_ds, 16, num_workers=4),
                             refine_fn=refine_fn, batch_to_device=to_dev)
    print(f"[5] eval: plain median {plain['Median_km_error']:.1f} km, "
          f"refined median {refined['Median_km_error']:.1f} km, "
          f"acc {refined['Geocell_accuracy']:.2f}, "
          f"score {refined['Geoguessr_score']:.0f}")

    # ---- 6. serving -----------------------------------------------------
    scfg = HeadConfig(num_cells=assigner.num_cells, embed_dim=32,
                      panorama=False, num_candidates=3)
    serve_fn = make_serving_fn(model, state.params, scfg, cells)
    service = PredictionService(serve_fn, image_size=32, panorama=False,
                                refine_fn=refine_fn)
    httpd = serve(service, port=0, block=False)
    port = httpd.server_address[1]

    buf = io.BytesIO()
    Image.open(tmp / "imgs/0.png").save(buf, format="PNG")
    payload = {"gameID": "g", "roundID": 1,
               "image": "data:image/png;base64,"
               + base64.b64encode(buf.getvalue()).decode()}
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/v1/predict",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=60) as resp:
        guess = json.loads(resp.read())
    httpd.shutdown()
    true_lla = df.iloc[0][["lng", "lat"]].to_numpy(np.float64)
    from pigeon_tpu.core import haversine_np

    err = haversine_np(np.asarray([[guess["results"]["lng"],
                                    guess["results"]["lat"]]]),
                       true_lla[None])[0]
    print(f"[6] serving: guess {guess['results']} "
          f"({err:.0f} km from truth)")

    assert refined["Geocell_accuracy"] > 0.8, "pipeline should learn"
    assert err < 2000, "serving guess should land near the right region"
    print("FULL PIPELINE OK")


if __name__ == "__main__":
    main()
