"""AOT serving-artifact tests: `serve/export.py` + CLI `export` /
`serve --artifact`.

The artifact is the deployment story the reference never had (its bot
ssh-forwards a live python process, `bot/README.md:3`): the serving
program is serialized once (StableHLO via jax.export, symbolic batch,
tpu+cpu) next to the weights and manifest, and a serving host reloads
it without model code. These tests pin the roundtrip contract.
"""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pigeon_tpu.config import HeadConfig, VisionConfig
from pigeon_tpu.models.super_guessr import SuperGuessr
from pigeon_tpu.serve.export import (
    MANIFEST_FILE,
    export_serving_artifact,
    load_serving_artifact,
)
from pigeon_tpu.serve.server import make_serving_fn

VCFG = VisionConfig(image_size=32, patch_size=8, hidden_size=32,
                    intermediate_size=64, num_layers=2, num_heads=4,
                    projection_dim=16)
HCFG = HeadConfig(num_cells=8, embed_dim=32, panorama=False,
                  multi_task=True, num_candidates=5)
RNG = np.random.default_rng(3)


@pytest.fixture(scope="module")
def setup():
    model = SuperGuessr(VCFG, HCFG)
    px = jnp.zeros((2, 32, 32, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), px)["params"]
    cells = np.stack([np.linspace(-150, 150, 8),
                      np.linspace(-50, 60, 8)], -1).astype(np.float32)
    return model, params, cells


class TestArtifactRoundtrip:
    def test_symbolic_batch_parity(self, setup, tmp_path):
        model, params, cells = setup
        out_dir = str(tmp_path / "art")
        manifest = export_serving_artifact(
            model, params, HCFG, cells, out_dir, image_size=32,
            platforms=("cpu",))
        assert manifest["batch"] == "symbolic"
        serve_fn, loaded_manifest = load_serving_artifact(out_dir)
        direct = make_serving_fn(model, params, HCFG, cells)
        for batch in (1, 3, 6):   # one module serves every batch size
            px = RNG.integers(0, 255, (batch, 32, 32, 3)).astype(np.uint8)
            got = serve_fn(px)
            want = direct(px)
            for key in ("pred_lla", "topk_cells", "topk_probs",
                        "embedding"):
                np.testing.assert_allclose(
                    np.asarray(got[key]), np.asarray(want[key]),
                    atol=1e-5, err_msg=f"{key} at batch {batch}")
        assert loaded_manifest["num_cells"] == 8

    def test_fixed_batch_rejects_other_shapes(self, setup, tmp_path):
        model, params, cells = setup
        out_dir = str(tmp_path / "art_fixed")
        manifest = export_serving_artifact(
            model, params, HCFG, cells, out_dir, image_size=32,
            batch=2, platforms=("cpu",))
        assert manifest["batch"] == 2
        serve_fn, _ = load_serving_artifact(out_dir)
        ok = serve_fn(np.zeros((2, 32, 32, 3), np.uint8))
        assert np.asarray(ok["pred_lla"]).shape == (2, 2)
        with pytest.raises(Exception):
            serve_fn(np.zeros((3, 32, 32, 3), np.uint8))

    def test_f32_wire(self, setup, tmp_path):
        model, params, cells = setup
        out_dir = str(tmp_path / "art_f32")
        export_serving_artifact(
            model, params, HCFG, cells, out_dir, image_size=32,
            wire_dtype="float32", platforms=("cpu",))
        serve_fn, manifest = load_serving_artifact(out_dir)
        assert manifest["wire_dtype"] == "float32"
        px = RNG.normal(size=(2, 32, 32, 3)).astype(np.float32)
        got = serve_fn(px)
        want = make_serving_fn(model, params, HCFG, cells)(px)
        np.testing.assert_allclose(np.asarray(got["pred_lla"]),
                                   np.asarray(want["pred_lla"]),
                                   atol=1e-5)

    def test_quant_static_export(self, setup, tmp_path):
        """The int8 W8A8 serving recipe exports and reloads."""
        from pigeon_tpu.models.quant import quantize_and_calibrate

        _, params, cells = setup
        dyn = SuperGuessr(VCFG, HCFG, quant=True, attn_impl="xla")
        calib = jax.random.normal(jax.random.PRNGKey(5),
                                  (2, 32, 32, 3), jnp.float32)
        qparams = quantize_and_calibrate(dyn, params, calib,
                                         tower_key="vision")
        qmodel = SuperGuessr(VCFG, HCFG, quant="static", attn_impl="xla")
        out_dir = str(tmp_path / "art_q")
        export_serving_artifact(
            qmodel, qparams, HCFG, cells, out_dir, image_size=32,
            platforms=("cpu",))
        serve_fn, _ = load_serving_artifact(out_dir)
        out = serve_fn(RNG.integers(0, 255, (2, 32, 32, 3))
                       .astype(np.uint8))
        pred = np.asarray(out["pred_lla"])
        assert np.isfinite(pred).all()
        assert (np.asarray(out["topk_cells"]) < 8).all()

    def test_version_guard(self, setup, tmp_path):
        model, params, cells = setup
        out_dir = str(tmp_path / "art_v")
        export_serving_artifact(model, params, HCFG, cells, out_dir,
                                image_size=32, platforms=("cpu",))
        path = os.path.join(out_dir, MANIFEST_FILE)
        manifest = json.load(open(path))
        manifest["artifact_version"] = 99
        json.dump(manifest, open(path, "w"))
        with pytest.raises(ValueError, match="artifact version"):
            load_serving_artifact(out_dir)


class TestCliExport:
    def test_export_then_serve_artifact(self, tmp_path, monkeypatch):
        """`export` writes an artifact; `serve --artifact` serves it over
        HTTP with the Chrome-extension contract."""
        import base64
        import io
        import json as _json
        import urllib.request

        import pandas as pd
        from PIL import Image

        import pigeon_tpu.cli.run as cli  # noqa: F401
        import pigeon_tpu.serve as serve_pkg
        from pigeon_tpu.cli.run import main

        cells = np.stack([np.linspace(-150, 150, 5),
                          np.linspace(-50, 60, 5)], -1).astype(np.float32)
        pd.DataFrame({"name": list("abcde"), "lng": cells[:, 0],
                      "lat": cells[:, 1]}).to_csv(
            tmp_path / "cells.csv", index=False)
        monkeypatch.chdir(tmp_path)

        art = str(tmp_path / "artifact")
        rc = main(["export", "exp1", "--tiny",
                   "--geocells", str(tmp_path / "cells.csv"),
                   "--platforms", "cpu", "--output", art])
        assert rc == 0
        manifest = _json.load(open(os.path.join(art, MANIFEST_FILE)))
        assert manifest["platforms"] == ["cpu"]

        captured = {}
        real_serve = serve_pkg.serve

        def fake_serve(service, host="127.0.0.1", port=5000, block=True):
            captured["httpd"] = real_serve(service, host=host, port=0,
                                           block=False)
            return captured["httpd"]

        monkeypatch.setattr("pigeon_tpu.serve.serve", fake_serve)
        rc = main(["serve", "ignored", "--artifact", art])
        assert rc == 0
        httpd = captured["httpd"]
        port = httpd.server_address[1]

        buf = io.BytesIO()
        img = RNG.integers(0, 255, (32, 32, 3)).astype(np.uint8)
        Image.fromarray(img).save(buf, format="PNG")
        b64 = ("data:image/png;base64,"
               + base64.b64encode(buf.getvalue()).decode())
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/predict",
            data=_json.dumps({"gameID": "g", "roundID": 1,
                              "image": b64}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as resp:
            body = _json.loads(resp.read())
        httpd.shutdown()
        lat, lng = body["results"]["lat"], body["results"]["lng"]
        assert np.isclose(cells, [lng, lat], atol=1e-3).all(-1).any()
