"""HTTP model server speaking the Chrome-extension bot protocol.

The reference's serving server is ABSENT from its release (`bot/README.md:3`
points at an SSH-forwarded server; fastapi/uvicorn are pinned in `env.yml`
but no server code ships). This implements the contract the extension
actually speaks (`bot/chrome_extension/scripts/duel.js:51-97`):

  * ``POST /api/v1/predict`` with JSON ``{gameID, roundID, image,
    image_2, image_3, image_4}`` (base64 screenshots; classic mode sends
    only ``image``) -> ``{"results": {"lat": .., "lng": ..}}``;
  * ``POST /api/v1/game`` with the round result -> logged to JSONL.

Dependency-light: stdlib ``http.server`` (fastapi isn't in this image).
The compute path is a single jitted serving function (embed + classify +
top-k; the reference's `SuperGuessr(serving=True)` tuple,
`models/super_guessr.py:462-466`) with optional batched refinement.
"""

from __future__ import annotations

import base64
import io
import json
import logging
import os
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

import numpy as np

logger = logging.getLogger("pigeon_tpu.serve")


class PredictionService:
    """Wraps the jitted serving function + preprocessing + refinement."""

    def __init__(self, serve_fn: Callable, image_size: int = 336,
                 panorama: bool = True,
                 refine_fn: Optional[Callable] = None,
                 game_log: Optional[str] = None,
                 batcher=None):
        """Args:
            serve_fn: jitted ``pixels -> dict`` with keys ``pred_lla``
                (B, 2), ``topk_cells``, ``topk_probs``, ``embedding``.
                Input is ``(1, 4, S, S, 3)`` (panorama) or ``(1, S, S, 3)``.
            refine_fn: optional batched refiner
                (`pigeon_tpu.models.refiner.make_refine_fn`).
            batcher: optional `serve.batching.MicroBatcher` — concurrent
                requests coalesce into one device dispatch instead of
                serializing bs1 forwards behind the lock.
        """
        self.serve_fn = serve_fn
        self.image_size = image_size
        self.panorama = panorama
        self.refine_fn = refine_fn
        self.game_log = game_log
        self.batcher = batcher
        self._lock = threading.Lock()

    def predict(self, payload: dict) -> dict:
        from pigeon_tpu.data import native_decode
        from pigeon_tpu.data.image_ops import resize_crop_pil

        keys = (["image", "image_2", "image_3", "image_4"]
                if self.panorama else ["image"])
        raws = []
        for key in keys:
            if key not in payload:
                raise ValueError(f"missing field {key!r}")
            raws.append(re.sub(r"^data:image/[a-zA-Z+]+;base64,", "",
                               payload[key]))
        raws = [base64.b64decode(r) for r in raws]
        # uint8 to the device (4x less host->device traffic — the
        # serving bottleneck through slow links); CLIP normalization
        # runs inside the jitted forward where it fuses into the
        # patch-embed matmul. Decode all views in one native call
        # (libjpeg + OpenMP, native/decode.cpp); per-image None -> PIL
        # fallback (e.g. PNG screenshots).
        decoded = (native_decode.decode_resize_crop_batch(
            raws, self.image_size,
            nthreads=min(len(raws), os.cpu_count() or 1))
            if native_decode.available() else [None] * len(raws))
        views = []
        for raw, nat in zip(raws, decoded):
            if nat is not None:
                views.append(nat)
                continue
            from PIL import Image

            try:
                with Image.open(io.BytesIO(raw)) as im:
                    views.append(resize_crop_pil(im.convert("RGB"),
                                                 self.image_size))
            except Exception as e:  # noqa: BLE001 — client error, not 500
                # Valid base64 carrying undecodable bytes is a CLIENT
                # error: PIL raises UnidentifiedImageError (an OSError,
                # not ValueError), which the handler would otherwise
                # report as a 500 and pollute server-error dashboards.
                raise ValueError(f"undecodable image bytes: {e}") from e
        pixels = np.stack(views)[None] if self.panorama \
            else views[0][None]

        if self.batcher is not None:
            # Micro-batched path: concurrent requests share one dispatch.
            row = self.batcher.predict_one(pixels[0])
            pred = np.asarray(row["pred_lla"])[None]
        else:
            with self._lock:      # one TPU dispatch at a time
                out = self.serve_fn(pixels)
                pred = np.asarray(out["pred_lla"])
                if self.refine_fn is not None:
                    refined = self.refine_fn(
                        out["embedding"], out["pred_lla"],
                        out["topk_cells"], out["topk_probs"])
                    pred = np.asarray(refined["pred_lla"])

        lng, lat = float(pred[0, 0]), float(pred[0, 1])
        return {"results": {"lat": lat, "lng": lng},
                "gameID": payload.get("gameID"),
                "roundID": payload.get("roundID")}

    def record_game(self, payload: dict) -> None:
        if not self.game_log:
            return
        os.makedirs(os.path.dirname(self.game_log) or ".", exist_ok=True)
        with open(self.game_log, "a") as f:
            f.write(json.dumps(payload) + "\n")


def make_serving_fn(model, params, head_cfg, geocells):
    """Build the jitted serving forward for a SuperGuessr model.

    Returns the reference's serving tuple as a dict
    (`super_guessr.py:462-466`): coordinate prediction, top-k candidates,
    embedding.
    """
    import jax
    import jax.numpy as jnp

    from pigeon_tpu.data.image_ops import normalize_images
    from pigeon_tpu.models.geocell_head import geocell_predictions

    geocells = jnp.asarray(geocells, jnp.float32)

    # Params enter as a jit ARGUMENT (closed-over weights become HLO
    # constants and balloon the compiled program; docs/PERF.md).
    @jax.jit
    def serve_jit(p, pixels, cells):
        if pixels.dtype == jnp.uint8:
            # uint8 wire format: normalize on device (fuses into the
            # patch-embed matmul; 4x less host->device transfer).
            pixels = normalize_images(pixels)
        out = model.apply({"params": p}, pixels)
        preds = geocell_predictions(out.logits, cells,
                                    head_cfg.num_candidates)
        return {
            "pred_lla": preds["pred_lla"],
            "topk_cells": preds["topk_cells"],
            "topk_probs": preds["topk_probs"],
            "embedding": out.embedding,
            "preds_mt": out.preds_mt,
        }

    def serve_fn(pixels):
        return serve_jit(params, jnp.asarray(pixels), geocells)

    return serve_fn


class _Handler(BaseHTTPRequestHandler):
    service: PredictionService = None  # injected by serve()

    def _reply(self, code: int, obj: dict) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Access-Control-Allow-Origin", "*")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_OPTIONS(self):  # CORS preflight from the extension
        self.send_response(204)
        self.send_header("Access-Control-Allow-Origin", "*")
        self.send_header("Access-Control-Allow-Methods", "POST, OPTIONS")
        self.send_header("Access-Control-Allow-Headers", "Content-Type")
        self.end_headers()

    def do_POST(self):
        try:
            length = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(length) or b"{}")
        except (ValueError, json.JSONDecodeError):
            self._reply(400, {"error": "invalid JSON"})
            return

        if self.path == "/api/v1/predict":
            try:
                self._reply(200, self.service.predict(payload))
            except ValueError as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — serving must not die
                logger.exception("prediction failed")
                self._reply(500, {"error": str(e)})
        elif self.path == "/api/v1/game":
            self.service.record_game(payload)
            self._reply(200, {"status": "ok"})
        else:
            self._reply(404, {"error": f"unknown path {self.path}"})

    def log_message(self, fmt, *args):
        logger.info("%s " + fmt, self.client_address[0], *args)


def serve(service: PredictionService, host: str = "127.0.0.1",
          port: int = 5000, block: bool = True) -> ThreadingHTTPServer:
    """Start the HTTP server (threaded; TPU dispatches serialized by the
    service lock)."""
    handler = type("BoundHandler", (_Handler,), {"service": service})
    httpd = ThreadingHTTPServer((host, port), handler)
    logger.info("serving on http://%s:%d", host, port)
    if block:
        httpd.serve_forever()
    else:
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
    return httpd
