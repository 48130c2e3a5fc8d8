"""Serving tests: real HTTP round-trip against the bot protocol."""

import base64
import io
import json
import urllib.request

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pigeon_tpu.config import HeadConfig, VisionConfig
from pigeon_tpu.models.super_guessr import SuperGuessr
from pigeon_tpu.serve import PredictionService, serve
from pigeon_tpu.serve.server import make_serving_fn

TINY = VisionConfig(image_size=32, patch_size=8, hidden_size=32,
                    intermediate_size=64, num_layers=2, num_heads=4)
RNG = np.random.default_rng(4)


def b64_image(w=64, h=64):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(RNG.integers(0, 255, (h, w, 3), dtype=np.uint8)) \
        .save(buf, format="PNG")
    return ("data:image/png;base64,"
            + base64.b64encode(buf.getvalue()).decode())


@pytest.fixture(scope="module")
def server():
    cfg = HeadConfig(num_cells=6, embed_dim=32, panorama=True)
    model = SuperGuessr(TINY, cfg)
    example = jnp.zeros((1, 4, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), example)["params"]
    cells = np.stack([np.linspace(-150, 150, 6),
                      np.linspace(-50, 60, 6)], -1).astype(np.float32)
    serve_fn = make_serving_fn(model, params, cfg, cells)
    service = PredictionService(serve_fn, image_size=32, panorama=True)
    httpd = serve(service, host="127.0.0.1", port=0, block=False)
    port = httpd.server_address[1]
    yield f"http://127.0.0.1:{port}", cells
    httpd.shutdown()


def post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


class TestPredictEndpoint:
    def test_duel_contract(self, server):
        url, cells = server
        payload = {"gameID": "g1", "roundID": 1,
                   "image": b64_image(), "image_2": b64_image(),
                   "image_3": b64_image(), "image_4": b64_image()}
        status, body = post(f"{url}/api/v1/predict", payload)
        assert status == 200
        lat, lng = body["results"]["lat"], body["results"]["lng"]
        # Prediction must be one of the geocell centroids.
        match = np.isclose(cells, [lng, lat], atol=1e-4).all(-1)
        assert match.any()
        assert body["gameID"] == "g1"

    def test_missing_image_field(self, server):
        url, _ = server
        status, body = post(f"{url}/api/v1/predict",
                            {"gameID": "g", "image": b64_image()})
        assert status == 400
        assert "image_2" in body["error"]

    def test_invalid_json(self, server):
        url, _ = server
        req = urllib.request.Request(
            f"{url}/api/v1/predict", data=b"not json{{",
            headers={"Content-Type": "application/json"}, method="POST")
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                status = resp.status
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 400

    def test_garbage_image_bytes_is_400_and_server_survives(self, server):
        """Valid base64 carrying undecodable bytes is a CLIENT error
        (r8): PIL's UnidentifiedImageError is an OSError, which the
        handler used to surface as a 500; it must map to 400, and the
        server must keep answering good requests afterwards."""
        import base64

        url, _ = server
        garbage = base64.b64encode(b"\x00\x01notanimage\x02" * 40).decode()
        payload = {"gameID": "g", "image": garbage, "image_2": garbage,
                   "image_3": garbage, "image_4": garbage}
        status, body = post(f"{url}/api/v1/predict", payload)
        assert status == 400
        assert "undecodable" in body["error"]
        good = {"gameID": "g2", "roundID": 1,
                "image": b64_image(), "image_2": b64_image(),
                "image_3": b64_image(), "image_4": b64_image()}
        status, body = post(f"{url}/api/v1/predict", good)
        assert status == 200

    def test_game_endpoint_and_unknown_path(self, server):
        url, _ = server
        status, body = post(f"{url}/api/v1/game",
                            {"gameID": "g1", "roundID": 1,
                             "game": {"score": 4000}})
        assert status == 200 and body["status"] == "ok"
        status, _ = post(f"{url}/api/v1/nope", {})
        assert status == 404


class TestCli:
    def test_parser_surface(self):
        from pigeon_tpu.cli.run import build_parser

        p = build_parser()
        args = p.parse_args(["finetune", "mymodel", "--yfcc", "-m",
                             "--geocells", "x.csv"])
        assert args.function == "finetune"
        assert args.yfcc and args.multitask
        args = p.parse_args(["evaluate", "m", "-l", "im2gps3k,yfcc4k"])
        assert args.load == "im2gps3k,yfcc4k"

    def test_geocells_command(self, tmp_path):
        import pandas as pd

        from pigeon_tpu.cli.run import main

        pts = np.concatenate([
            RNG.uniform([0, 0], [8, 8], (120, 2)),
            RNG.uniform([20, 20], [28, 28], (120, 2))])
        pd.DataFrame({"lng": pts[:, 0], "lat": pts[:, 1],
                      "selection": "train"}).to_csv(
            tmp_path / "meta.csv", index=False)
        out = tmp_path / "cells.csv"
        # The pure-CPU geocells command must NOT touch the compile
        # cache (probing the backend would hold the shared TPU tunnel
        # for the whole run).
        import pigeon_tpu.core.compile_cache as cc

        def _boom(*a, **k):
            raise AssertionError("geocells must not init a JAX backend")

        orig_epc = cc.enable_persistent_cache
        cc.enable_persistent_cache = _boom
        try:
            rc = main(["geocells", "run1", "--metadata",
                       str(tmp_path / "meta.csv"), "--output", str(out),
                       "--yfcc"])
        finally:
            cc.enable_persistent_cache = orig_epc
        assert rc == 0
        df = pd.read_csv(out)
        assert {"name", "size", "geometry", "lng", "lat"} <= set(df.columns)
        assert df["size"].sum() == 240


class TestServeCommand:
    def test_cmd_serve_wires_checkpointless_model(self, tmp_path,
                                                  monkeypatch):
        """Drive cmd_serve through main() with a patched non-blocking
        serve(); POST one classic-mode prediction."""
        import pandas as pd

        import pigeon_tpu.cli.run as cli
        import pigeon_tpu.serve as serve_pkg

        cells = np.stack([np.linspace(-150, 150, 5),
                          np.linspace(-50, 60, 5)], -1).astype(np.float32)
        pd.DataFrame({"name": list("abcde"), "lng": cells[:, 0],
                      "lat": cells[:, 1]}).to_csv(
            tmp_path / "cells.csv", index=False)

        captured = {}
        real_serve = serve_pkg.serve

        def fake_serve(service, host="127.0.0.1", port=5000, block=True):
            captured["httpd"] = real_serve(service, host=host, port=0,
                                           block=False)
            return captured["httpd"]

        monkeypatch.setattr(cli, "serve", fake_serve, raising=False)
        monkeypatch.setattr("pigeon_tpu.serve.serve", fake_serve)
        monkeypatch.chdir(tmp_path)

        from pigeon_tpu.cli.run import main

        rc = main(["serve", "srv1", "--tiny",
                   "--geocells", str(tmp_path / "cells.csv")])
        assert rc == 0
        httpd = captured["httpd"]
        port = httpd.server_address[1]
        status, body = post(f"http://127.0.0.1:{port}/api/v1/predict",
                            {"gameID": "g", "roundID": 1,
                             "image": b64_image()})
        httpd.shutdown()
        assert status == 200
        lat, lng = body["results"]["lat"], body["results"]["lng"]
        assert np.isclose(cells, [lng, lat], atol=1e-3).all(-1).any()

    def test_cmd_serve_quant_int8(self, tmp_path, monkeypatch):
        """`serve --quant` serves through the int8 W8A8 tower (static
        activation scales calibrated at startup) end-to-end over HTTP."""
        import pandas as pd

        import pigeon_tpu.cli.run as cli
        import pigeon_tpu.serve as serve_pkg

        cells = np.stack([np.linspace(-150, 150, 5),
                          np.linspace(-50, 60, 5)], -1).astype(np.float32)
        pd.DataFrame({"name": list("abcde"), "lng": cells[:, 0],
                      "lat": cells[:, 1]}).to_csv(
            tmp_path / "cells.csv", index=False)

        captured = {}
        real_serve = serve_pkg.serve

        def fake_serve(service, host="127.0.0.1", port=5000, block=True):
            captured["httpd"] = real_serve(service, host=host, port=0,
                                           block=False)
            return captured["httpd"]

        monkeypatch.setattr(cli, "serve", fake_serve, raising=False)
        monkeypatch.setattr("pigeon_tpu.serve.serve", fake_serve)
        monkeypatch.chdir(tmp_path)

        from pigeon_tpu.cli.run import main

        rc = main(["serve", "srvq", "--tiny", "--quant",
                   "--geocells", str(tmp_path / "cells.csv")])
        assert rc == 0
        httpd = captured["httpd"]
        port = httpd.server_address[1]
        status, body = post(f"http://127.0.0.1:{port}/api/v1/predict",
                            {"gameID": "g", "roundID": 1,
                             "image": b64_image()})
        httpd.shutdown()
        assert status == 200
        lat, lng = body["results"]["lat"], body["results"]["lng"]
        assert np.isclose(cells, [lng, lat], atol=1e-3).all(-1).any()

    def test_cmd_serve_quant_real_calibration(self, tmp_path,
                                              monkeypatch):
        """`serve --quant --calib-images DIR` calibrates activation
        scales on real images instead of the synthetic batch."""
        import pandas as pd
        from PIL import Image

        import pigeon_tpu.cli.run as cli
        import pigeon_tpu.serve as serve_pkg

        cells = np.stack([np.linspace(-150, 150, 5),
                          np.linspace(-50, 60, 5)], -1).astype(np.float32)
        pd.DataFrame({"name": list("abcde"), "lng": cells[:, 0],
                      "lat": cells[:, 1]}).to_csv(
            tmp_path / "cells.csv", index=False)
        calib_dir = tmp_path / "calib"
        calib_dir.mkdir()
        rng = np.random.default_rng(0)
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (64, 64, 3),
                                         dtype=np.uint8)).save(
                calib_dir / f"{i}.jpg")

        captured = {}
        real_serve = serve_pkg.serve

        def fake_serve(service, host="127.0.0.1", port=5000, block=True):
            captured["httpd"] = real_serve(service, host=host, port=0,
                                           block=False)
            return captured["httpd"]

        monkeypatch.setattr(cli, "serve", fake_serve, raising=False)
        monkeypatch.setattr("pigeon_tpu.serve.serve", fake_serve)
        monkeypatch.chdir(tmp_path)

        from pigeon_tpu.cli.run import main

        rc = main(["serve", "srvqc", "--tiny", "--quant",
                   "--calib-images", str(calib_dir),
                   "--geocells", str(tmp_path / "cells.csv")])
        assert rc == 0
        httpd = captured["httpd"]
        port = httpd.server_address[1]
        status, body = post(f"http://127.0.0.1:{port}/api/v1/predict",
                            {"gameID": "g", "roundID": 1,
                             "image": b64_image()})
        httpd.shutdown()
        assert status == 200
        lat, lng = body["results"]["lat"], body["results"]["lng"]
        assert np.isclose(cells, [lng, lat], atol=1e-3).all(-1).any()

    def test_cmd_serve_with_refinement_and_hedge(self, tmp_path,
                                                 monkeypatch):
        """cmd_serve --prototypes/--embeddings/--metadata --hedge must run
        the refiner+hedge stack in the HTTP path (the reference bot's
        SuperGuessr(serving=True) + ProtoRefiner + HedgeLayer,
        `super_guessr.py:462-466`, `proto_refiner.py:121`, `hedge.py:8-57`)."""
        import json as jsonlib

        import pandas as pd

        import pigeon_tpu.serve as serve_pkg

        rng = np.random.default_rng(7)
        n_cells, dim, n_bank = 5, 64, 40
        cells = np.stack([np.linspace(-150, 150, n_cells),
                          np.linspace(-50, 60, n_cells)], -1) \
            .astype(np.float32)
        pd.DataFrame({"name": list("abcde"), "lng": cells[:, 0],
                      "lat": cells[:, 1]}).to_csv(
            tmp_path / "cells.csv", index=False)

        # Training bank: 8 points per cell near its centroid.
        bank_lla = np.repeat(cells, n_bank // n_cells, axis=0) \
            + rng.normal(0, 0.5, (n_bank, 2)).astype(np.float32)
        pd.DataFrame({"lng": bank_lla[:, 0], "lat": bank_lla[:, 1],
                      "selection": "train"}).to_csv(
            tmp_path / "meta.csv", index=False)
        emb_dir = tmp_path / "emb"
        emb_dir.mkdir()
        np.save(emb_dir / "train.npy",
                rng.normal(size=(n_bank, dim)).astype(np.float32))
        np.save(emb_dir / "train_indices.npy", np.arange(n_bank))

        # Two clusters per cell over its bank rows.
        rows = []
        for c in range(n_cells):
            base = c * (n_bank // n_cells)
            for half in range(2):
                idx = list(range(base + half * 4, base + half * 4 + 4))
                rows.append({"geocell_idx": c,
                             "lng": float(bank_lla[idx, 0].mean()),
                             "lat": float(bank_lla[idx, 1].mean()),
                             "count": len(idx),
                             "indices": jsonlib.dumps(idx)})
        pd.DataFrame(rows).to_csv(tmp_path / "protos.csv", index=False)

        captured = {}
        real_serve = serve_pkg.serve

        def fake_serve(service, host="127.0.0.1", port=5000, block=True):
            captured["service"] = service
            captured["httpd"] = real_serve(service, host=host, port=0,
                                           block=False)
            return captured["httpd"]

        monkeypatch.setattr("pigeon_tpu.serve.serve", fake_serve)
        monkeypatch.chdir(tmp_path)

        from pigeon_tpu.cli.run import main

        rc = main(["serve", "srv2", "--tiny", "--hedge",
                   "--geocells", str(tmp_path / "cells.csv"),
                   "--metadata", str(tmp_path / "meta.csv"),
                   "--prototypes", str(tmp_path / "protos.csv"),
                   "--embeddings", str(emb_dir)])
        assert rc == 0
        assert captured["service"].refine_fn is not None

        httpd = captured["httpd"]
        port = httpd.server_address[1]
        status, body = post(f"http://127.0.0.1:{port}/api/v1/predict",
                            {"gameID": "g", "roundID": 1,
                             "image": b64_image()})
        httpd.shutdown()
        assert status == 200
        lat, lng = body["results"]["lat"], body["results"]["lng"]
        # The refined guess is an exact bank/prototype location (the
        # ProtoNet contract) — never a bare geocell centroid.
        pool = np.concatenate(
            [bank_lla, np.array([[r["lng"], r["lat"]] for r in rows],
                                np.float32)])
        assert np.isclose(pool, [lng, lat], atol=1e-4).all(-1).any()

    def test_micro_batcher_coalesces_concurrent_requests(self, server):
        """Concurrent HTTP requests through a MicroBatcher service must
        coalesce into fewer device dispatches AND return the same answers
        as the serialized path."""
        import concurrent.futures as cf

        from pigeon_tpu.serve import MicroBatcher

        cfg = HeadConfig(num_cells=6, embed_dim=32, panorama=True)
        model = SuperGuessr(TINY, cfg)
        example = jnp.zeros((1, 4, 32, 32, 3))
        params = model.init(jax.random.PRNGKey(0), example)["params"]
        cells = np.stack([np.linspace(-150, 150, 6),
                          np.linspace(-50, 60, 6)], -1).astype(np.float32)
        serve_fn = make_serving_fn(model, params, cfg, cells)

        calls = {"n": 0}

        def counting_serve(pixels):
            calls["n"] += 1
            return serve_fn(pixels)

        batcher = MicroBatcher(counting_serve, max_batch=4,
                               max_wait_ms=50.0)
        service = PredictionService(serve_fn, image_size=32, panorama=True,
                                    batcher=batcher)
        httpd = serve(service, host="127.0.0.1", port=0, block=False)
        port = httpd.server_address[1]

        payloads = []
        for i in range(8):
            payloads.append({"gameID": f"g{i}", "roundID": i,
                             "image": b64_image(), "image_2": b64_image(),
                             "image_3": b64_image(),
                             "image_4": b64_image()})
        with cf.ThreadPoolExecutor(8) as pool:
            results = list(pool.map(
                lambda p: post(f"http://127.0.0.1:{port}/api/v1/predict",
                               p), payloads))
        httpd.shutdown()

        assert all(status == 200 for status, _ in results)
        assert calls["n"] < 8, "no coalescing happened"
        assert batcher.requests_served == 8

        # Same answers as the serialized path.
        serial = PredictionService(serve_fn, image_size=32, panorama=True)
        for payload, (_, body) in zip(payloads, results):
            ref = serial.predict(payload)["results"]
            assert body["results"]["lat"] == pytest.approx(ref["lat"],
                                                           abs=1e-4)
            assert body["results"]["lng"] == pytest.approx(ref["lng"],
                                                           abs=1e-4)
        batcher.close()

    def test_micro_batcher_bucketed_padding(self):
        """A fill of n dispatches at the smallest warm bucket >= n (the
        measured-slower always-max_batch padding must not come back),
        including non-power-of-two max_batch; undersized custom buckets
        clamp max_batch instead of stranding the collector."""
        import time

        from pigeon_tpu.serve import MicroBatcher

        shapes = []

        def recording_serve(pixels):
            shapes.append(int(pixels.shape[0]))
            n = pixels.shape[0]
            return {"pred_lla": np.zeros((n, 2), np.float32),
                    "pred_cell": np.zeros((n,), np.int32),
                    "topk_cells": np.zeros((n, 3), np.int32),
                    "topk_probs": np.zeros((n, 3), np.float32),
                    "embedding": np.zeros((n, 8), np.float32)}

        batcher = MicroBatcher(recording_serve, max_batch=6,
                               max_wait_ms=200.0)
        assert batcher.buckets == (1, 2, 4, 6)
        px = np.zeros((4, 8, 8, 3), np.uint8)
        # 3 near-simultaneous submits -> one bucket-4 dispatch.
        futs = [batcher.submit(px[0]) for _ in range(3)]
        for f in futs:
            f.result(timeout=10)
        time.sleep(0.05)
        assert shapes[-1] == 4, shapes
        # A lone request -> bucket 1, not max_batch.
        batcher.submit(px[0]).result(timeout=10)
        assert shapes[-1] == 1, shapes
        batcher.close()

        # Undersized custom buckets: max_batch clamps to max(buckets).
        b2 = MicroBatcher(recording_serve, max_batch=8, buckets=(2, 4))
        assert b2.max_batch == 4 and b2.buckets == (2, 4)
        b2.close()
        with pytest.raises(ValueError):
            MicroBatcher(recording_serve, max_batch=8, buckets=())

    def test_micro_batcher_propagates_errors(self):
        from pigeon_tpu.serve import MicroBatcher

        def broken(_pixels):
            raise RuntimeError("device on fire")

        batcher = MicroBatcher(broken, max_batch=2, max_wait_ms=1.0)
        with pytest.raises(RuntimeError, match="device on fire"):
            batcher.predict_one(np.zeros((4, 32, 32, 3)), timeout=10)
        batcher.close()

    def test_hedge_without_refiner_assets_errors(self, tmp_path,
                                                 monkeypatch):
        import pandas as pd

        cells = np.array([[0.0, 0.0], [10.0, 10.0]], np.float32)
        pd.DataFrame({"name": ["a", "b"], "lng": cells[:, 0],
                      "lat": cells[:, 1]}).to_csv(
            tmp_path / "cells.csv", index=False)
        monkeypatch.chdir(tmp_path)
        from pigeon_tpu.cli.run import main

        with pytest.raises(SystemExit):
            main(["serve", "srv3", "--tiny", "--hedge",
                  "--geocells", str(tmp_path / "cells.csv")])
