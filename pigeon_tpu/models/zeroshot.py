"""Zero-shot geocell classification via CLIP text prompts.

The reference imports `evaluation/zeroshot.py` (`evaluation/__init__.py:3`)
— a module MISSING from its release (every `from evaluation import ...`
crashes). This implements the capability for real: per-geocell text
prompts, text-tower embedding, and a jitted image->geocell probability
classifier (BASELINE.json config #1: ViT-B/32 zero-shot geocell
classification).
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def geocell_prompts(records: Sequence[dict],
                    template: str = "A photo located in {place}.") -> List[str]:
    """Build one text prompt per geocell from geocell CSV records.

    Uses admin_1/country names when present (semantic cells), otherwise the
    centroid coordinates.
    """
    prompts = []
    for r in records:
        admin_1 = str(r.get("admin_1", "") or "")
        country = str(r.get("country", "") or "")
        if country and country.lower() not in ("nan", "none", ""):
            place = f"{admin_1}, {country}" if admin_1 and \
                admin_1.lower() not in ("nan", "none", "") else country
        else:
            place = (f"latitude {float(r['lat']):.1f}, "
                     f"longitude {float(r['lng']):.1f}")
        prompts.append(template.format(place=place))
    return prompts


def embed_prompts(clip_model, params, token_ids: np.ndarray) -> jnp.ndarray:
    """Tokenized prompts -> L2-normalized text embeddings ``(C, proj)``.

    One jitted program with params as ARGUMENTS — an eager apply would
    execute the text tower op-by-op (one remote compile + dispatch per
    primitive through a tunneled TPU; docs/PERF.md)."""
    from pigeon_tpu.models.clip import CLIPTextTower

    tower = CLIPTextTower(clip_model.text_config,
                          dtype=clip_model.dtype,
                          eos_token_id=clip_model.eos_token_id)

    @jax.jit
    def embed_jit(text_params, proj, ids):
        _, pooled = tower.apply({"params": text_params}, ids)
        emb = pooled @ proj
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    return embed_jit(params["text"], params["text_projection"]["kernel"],
                     jnp.asarray(token_ids))


def make_zero_shot_classifier(clip_model, params,
                              text_embeds: jnp.ndarray) -> Callable:
    """Build jitted ``pixels -> (probs, logits)`` over geocell prompts.

    `text_embeds` are precomputed once (`embed_prompts`); the per-image
    cost is one vision-tower forward + a (B, D) x (D, C) matmul.
    """
    from pigeon_tpu.models.clip import CLIPVisionTower

    tower = CLIPVisionTower(clip_model.vision_config, dtype=clip_model.dtype)
    bound = {
        "vision": params["vision"],
        "proj": params["visual_projection"]["kernel"],
        "logit_scale": params["logit_scale"],
        "text_embeds": jnp.asarray(text_embeds),
    }

    # Params enter as a jit ARGUMENT (closure constants balloon the
    # compiled program; docs/PERF.md).
    @jax.jit
    def classify_jit(p, pixel_values):
        _, pooled = tower.apply({"params": p["vision"]}, pixel_values)
        img = pooled @ p["proj"]
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        logits = jnp.exp(p["logit_scale"]) * img @ p["text_embeds"].T
        return jax.nn.softmax(logits, axis=-1), logits

    return lambda pixel_values: classify_jit(bound, pixel_values)


def zero_shot_accuracy(classify: Callable, pixel_batches,
                       label_batches) -> float:
    """Top-1 zero-shot geocell accuracy over batches."""
    correct = total = 0
    for pixels, labels in zip(pixel_batches, label_batches):
        probs, _ = classify(jnp.asarray(pixels))
        pred = np.asarray(jnp.argmax(probs, axis=-1))
        labels = np.asarray(labels)
        correct += int((pred == labels).sum())
        total += len(labels)
    return correct / max(total, 1)


def make_zero_shot_eval_step(clip_model, params, text_embeds,
                             geocells, num_candidates: int = 5,
                             attn_impl: str = "xla") -> Callable:
    """Zero-shot eval step with the `make_eval_step` output contract.

    Returns ``eval_step(params, batch) -> (metrics, preds)`` usable by
    `train.loop.evaluate_model` / `evaluate_benchmark`, so the CLI's
    zero-shot mode (``evaluate --zeroshot``, BASELINE config #1) runs
    through the same loop, metric suite, and flags as checkpoint
    evaluation. ``params`` here is the zero-shot bundle built below;
    the positional params argument from the loop is ignored (the bundle
    already rides the jit as an argument).
    """
    from pigeon_tpu.models.clip import CLIPVisionTower
    from pigeon_tpu.models.geocell_head import geocell_predictions

    tower = CLIPVisionTower(clip_model.vision_config, dtype=clip_model.dtype,
                            attn_impl=attn_impl)
    bound = {
        "vision": params["vision"],
        "proj": params["visual_projection"]["kernel"],
        "logit_scale": params["logit_scale"],
        "text_embeds": jnp.asarray(text_embeds),
        "geocells": jnp.asarray(geocells, jnp.float32),
    }

    @jax.jit
    def step_jit(p, batch):
        from pigeon_tpu.data.image_ops import normalize_images

        pixels = batch["inputs"]
        if pixels.dtype == jnp.uint8:
            pixels = normalize_images(pixels)
        _, pooled = tower.apply({"params": p["vision"]}, pixels)
        img = pooled @ p["proj"]
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        logits = jnp.exp(p["logit_scale"]) * img @ p["text_embeds"].T
        preds = geocell_predictions(logits, p["geocells"], num_candidates)
        loss = jnp.float32(0.0)
        if "labels_clf" in batch:
            logp = jax.nn.log_softmax(logits, axis=-1)
            loss = -jnp.mean(jnp.take_along_axis(
                logp, batch["labels_clf"][:, None], axis=-1))
        preds = dict(preds, embedding=img, preds_mt=None,
                     preds_climate=None, preds_month=None)
        return {"loss": loss}, preds

    return lambda _params, batch: step_jit(bound, batch)
