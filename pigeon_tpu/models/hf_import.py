"""PyTorch/HuggingFace CLIP checkpoint -> pigeon_tpu Flax parameter import.

Replaces the reference's permissive `load_state_dict` weight surgery
(`models/utils.py:24-45`, `models/super_guessr.py:222-238`) with an explicit,
validated mapping. Works on any HF CLIP naming layout:

  * `CLIPVisionModel` state dicts (`vision_model.*`),
  * `CLIPTextModel` state dicts (`text_model.*`),
  * full `CLIPModel` state dicts (both + projections + logit_scale),
  * the reference's finetuned checkpoints (same tensors, possibly without
    the `vision_model.` prefix — handled by prefix sniffing).

Transforms applied:
  * torch Linear ``(out, in)``  -> flax kernel ``(in, out)``;
  * torch Conv2d ``(D, 3, P, P)`` -> flax NHWC kernel ``(P, P, 3, D)``;
  * per-layer tensors -> stacked ``(L, ...)`` leaves (the `nn.scan` layout).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    """torch.Tensor | np.ndarray -> float32 numpy array."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def _strip_prefix(state: Mapping[str, object], prefix: str) -> Dict[str, object]:
    """Keep keys under `prefix`, stripped; pass through if prefix is absent."""
    if any(k.startswith(prefix) for k in state):
        return {k[len(prefix):]: v for k, v in state.items()
                if k.startswith(prefix)}
    return dict(state)


def _layer_stack(state: Mapping[str, object], num_layers: int) -> Dict:
    """Stack `encoder.layers.{i}.*` tensors into the scan layout."""
    def stacked(fmt: str, transform=lambda x: x) -> np.ndarray:
        return np.stack([transform(_np(state[fmt.format(i=i)]))
                         for i in range(num_layers)])

    t = lambda w: w.T  # noqa: E731  (torch linear -> flax kernel)
    pre = "encoder.layers.{i}."
    return {
        "ln1": {"scale": stacked(pre + "layer_norm1.weight"),
                "bias": stacked(pre + "layer_norm1.bias")},
        "ln2": {"scale": stacked(pre + "layer_norm2.weight"),
                "bias": stacked(pre + "layer_norm2.bias")},
        "attn": {
            name: {"kernel": stacked(pre + f"self_attn.{name}.weight", t),
                   "bias": stacked(pre + f"self_attn.{name}.bias")}
            for name in ("q_proj", "k_proj", "v_proj", "out_proj")
        },
        "fc1": {"kernel": stacked(pre + "mlp.fc1.weight", t),
                "bias": stacked(pre + "mlp.fc1.bias")},
        "fc2": {"kernel": stacked(pre + "mlp.fc2.weight", t),
                "bias": stacked(pre + "mlp.fc2.bias")},
    }


def import_vision_tower_params(state: Mapping[str, object],
                               num_layers: int) -> Dict:
    """HF `vision_model.*` state dict -> `CLIPVisionTower` params."""
    s = _strip_prefix(state, "vision_model.")
    return {
        "patch_embed": {
            "kernel": _np(s["embeddings.patch_embedding.weight"])
            .transpose(2, 3, 1, 0)},
        "cls_token": _np(s["embeddings.class_embedding"]),
        "pos_embed": _np(s["embeddings.position_embedding.weight"]),
        "pre_ln": {"scale": _np(s["pre_layrnorm.weight"]),
                   "bias": _np(s["pre_layrnorm.bias"])},
        "encoder": {"layers": _layer_stack(s, num_layers)},
        "post_ln": {"scale": _np(s["post_layernorm.weight"]),
                    "bias": _np(s["post_layernorm.bias"])},
    }


def import_text_tower_params(state: Mapping[str, object],
                             num_layers: int) -> Dict:
    """HF `text_model.*` state dict -> `CLIPTextTower` params."""
    s = _strip_prefix(state, "text_model.")
    return {
        "token_embed": {
            "embedding": _np(s["embeddings.token_embedding.weight"])},
        "pos_embed": _np(s["embeddings.position_embedding.weight"]),
        "encoder": {"layers": _layer_stack(s, num_layers)},
        "final_ln": {"scale": _np(s["final_layer_norm.weight"]),
                     "bias": _np(s["final_layer_norm.bias"])},
    }


def import_super_guessr_params(state: Mapping[str, object],
                               vision_layers: int) -> Dict:
    """Reference SuperGuessr checkpoint -> pigeon_tpu `SuperGuessr` params.

    The reference's finetuned `.model` files are torch state dicts of its
    `SuperGuessr` (`models/super_guessr.py`): a `base_model.*` CLIP vision
    tower plus head layers ``cell_layer``, ``multi_task_head``,
    ``climate_layer``, ``month_layer`` (each ``.weight/.bias``). Heads
    missing from the checkpoint (e.g. month for YFCC models) are simply
    absent from the returned tree — merge over freshly initialized params.

    Returns a ``{"vision": ..., "head": ...}`` tree matching
    `pigeon_tpu.models.super_guessr.SuperGuessr`.
    """
    out: Dict = {}
    vision_keys = {k: v for k, v in state.items()
                   if k.startswith(("base_model.", "vision_model."))}
    if vision_keys:
        stripped = {k[len("base_model."):] if k.startswith("base_model.")
                    else k: v for k, v in vision_keys.items()}
        out["vision"] = import_vision_tower_params(stripped, vision_layers)

    head: Dict = {}
    name_map = {
        "cell_layer": "cell_layer",
        "multi_task_head": "multi_task_head",
        "climate_layer": "climate_layer",
        "month_layer": "month_layer",
    }
    for torch_name, flax_name in name_map.items():
        w = state.get(f"{torch_name}.weight")
        if w is None:
            continue
        head[flax_name] = {"kernel": _np(w).T,
                           "bias": _np(state[f"{torch_name}.bias"])}
    if head:
        out["head"] = head
    return out


def merge_params(base: Dict, loaded: Dict) -> Dict:
    """Recursively overlay `loaded` onto `base` (permissive load: the
    reference's `load_state_dict` keeps unmatched params,
    `models/utils.py:24-45`). Shapes must match where keys overlap."""
    import numpy as np

    out = dict(base)
    for key, value in loaded.items():
        if isinstance(value, dict) and isinstance(out.get(key), dict):
            out[key] = merge_params(out[key], value)
        else:
            if key in out and np.shape(out[key]) != np.shape(value):
                raise ValueError(
                    f"shape mismatch for {key}: checkpoint "
                    f"{np.shape(value)} vs model {np.shape(out[key])}")
            out[key] = value
    return out


def import_clip_params(state: Mapping[str, object],
                       vision_layers: int, text_layers: int) -> Dict:
    """Full HF `CLIPModel` state dict -> `CLIPModel` params."""
    return {
        "vision": import_vision_tower_params(state, vision_layers),
        "text": import_text_tower_params(state, text_layers),
        "visual_projection": {
            "kernel": _np(state["visual_projection.weight"]).T},
        "text_projection": {
            "kernel": _np(state["text_projection.weight"]).T},
        "logit_scale": _np(state["logit_scale"]),
    }
