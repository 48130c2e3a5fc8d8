"""AOT serving artifacts: serialize the serving program with `jax.export`.

The reference has no deployment-artifact story — its bot README
ssh-forwards a live A100 python process running the full research stack
(`bot/README.md:3`), so every serving host needs the model code, the
checkpoint loader, and a working compile path. This module is the
TPU-production equivalent: the jitted serving forward (uint8 wire ->
normalize -> tower -> head -> top-k, `serve/server.py:117-155`) is
lowered ONCE — with a symbolic batch dimension, for both ``tpu`` and
``cpu`` — serialized as StableHLO, and written next to the weights and a
JSON manifest. A serving fleet then loads the artifact and runs it
without model code or config, and the program that was audited is
byte-for-byte the program that serves.

Artifact layout (one directory)::

    serving.jaxexport   serialized jax.export module (StableHLO)
    params.npz          weights, '/'-joined param paths -> arrays
    geocells.npy        (num_cells, 2) centroid table
    manifest.json       shapes, wire dtype, model/meta info

The exported module takes ``(params, pixels, geocells)`` — params stay
an argument (never baked constants; docs/PERF.md) so the same module
can serve updated weights of identical shapes without re-export.

The artifact's attention is the XLA path: Pallas custom calls carry no
cross-version compatibility guarantee under `jax.export`, so the fused
flash kernel remains a live-serving (`cli serve`) optimization.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import numpy as np

MODULE_FILE = "serving.jaxexport"
PARAMS_FILE = "params.npz"
GEOCELLS_FILE = "geocells.npy"
MANIFEST_FILE = "manifest.json"
ARTIFACT_VERSION = 1


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "name", p)))
                    for p in path)


def _flatten_params(params) -> dict:
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {_path_str(path): np.asarray(leaf) for path, leaf in flat}


def _unflatten_params(flat: dict) -> dict:
    tree: dict = {}
    for path, value in flat.items():
        node = tree
        keys = path.split("/")
        for key in keys[:-1]:
            node = node.setdefault(key, {})
        node[keys[-1]] = value
    return tree


def export_serving_artifact(model, params, head_cfg, geocells,
                            out_dir: str, image_size: int,
                            panorama: bool = False,
                            batch: Optional[int] = None,
                            wire_dtype: str = "uint8",
                            platforms: Sequence[str] = ("tpu", "cpu"),
                            ) -> dict:
    """Export the serving forward for ``model`` into ``out_dir``.

    Args:
        batch: fixed batch size, or None for a symbolic ("any") batch.
        wire_dtype: ``uint8`` (low-transfer wire; normalize runs inside
            the program) or ``float32`` (pre-normalized pixels).

    Returns the manifest dict.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from pigeon_tpu.data.image_ops import normalize_images
    from pigeon_tpu.models.geocell_head import geocell_predictions

    def serve_fn(p, pixels, cells):
        if pixels.dtype == jnp.uint8:
            pixels = normalize_images(pixels)
        out = model.apply({"params": p}, pixels)
        preds = geocell_predictions(out.logits, cells,
                                    head_cfg.num_candidates)
        return {
            "pred_lla": preds["pred_lla"],
            "topk_cells": preds["topk_cells"],
            "topk_probs": preds["topk_probs"],
            "embedding": out.embedding,
        }

    flat = _flatten_params(params)
    plain = _unflatten_params(flat)       # canonical plain-dict pytree
    param_specs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), plain)

    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    views: Tuple[int, ...] = (4,) if panorama else ()
    px_spec = jax.ShapeDtypeStruct(
        (b, *views, image_size, image_size, 3),
        jnp.uint8 if wire_dtype == "uint8" else jnp.float32)
    cells = np.asarray(geocells, np.float32)
    cells_spec = jax.ShapeDtypeStruct(cells.shape, jnp.float32)

    exported = jexport.export(jax.jit(serve_fn),
                              platforms=tuple(platforms))(
        param_specs, px_spec, cells_spec)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, MODULE_FILE), "wb") as f:
        f.write(exported.serialize())
    np.savez(os.path.join(out_dir, PARAMS_FILE), **flat)
    np.save(os.path.join(out_dir, GEOCELLS_FILE), cells)
    manifest = {
        "artifact_version": ARTIFACT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "wire_dtype": wire_dtype,
        "image_size": int(image_size),
        "panorama": bool(panorama),
        "batch": ("symbolic" if batch is None else int(batch)),
        "num_cells": int(cells.shape[0]),
        "num_candidates": int(head_cfg.num_candidates),
        "num_params": int(sum(v.size for v in flat.values())),
        "outputs": ["pred_lla", "topk_cells", "topk_probs", "embedding"],
    }
    with open(os.path.join(out_dir, MANIFEST_FILE), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def load_serving_artifact(artifact_dir: str):
    """Load an exported artifact; returns ``(serve_fn, manifest)``.

    ``serve_fn(pixels) -> dict`` matches `serve.server.make_serving_fn`'s
    contract, so `PredictionService` can serve an artifact directly —
    no model code, config, or checkpoint machinery on the serving host.
    """
    import jax.numpy as jnp
    from jax import export as jexport

    with open(os.path.join(artifact_dir, MANIFEST_FILE)) as f:
        manifest = json.load(f)
    if manifest["artifact_version"] != ARTIFACT_VERSION:
        raise ValueError(
            f"artifact version {manifest['artifact_version']} != "
            f"supported {ARTIFACT_VERSION}")
    with open(os.path.join(artifact_dir, MODULE_FILE), "rb") as f:
        exported = jexport.deserialize(f.read())
    with np.load(os.path.join(artifact_dir, PARAMS_FILE)) as z:
        params = _unflatten_params({k: z[k] for k in z.files})
    cells = jnp.asarray(
        np.load(os.path.join(artifact_dir, GEOCELLS_FILE)))

    wire = (jnp.uint8 if manifest["wire_dtype"] == "uint8"
            else jnp.float32)

    def serve_fn(pixels):
        return exported.call(params, jnp.asarray(pixels, wire), cells)

    return serve_fn, manifest
