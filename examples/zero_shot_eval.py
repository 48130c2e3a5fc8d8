"""Zero-shot geocell classification (BASELINE config #1) end to end.

Builds per-geocell text prompts, embeds them with the CLIP text tower,
classifies benchmark images zero-shot, and scores with the full metric
suite. With real assets: pass a geocell CSV, a benchmark name, and local
CLIP weights. Without them (this demo): tiny random CLIP + synthetic
benchmark — exercising the identical code path.

    python examples/zero_shot_eval.py

(The same capability is reachable from the CLI:
 `python -m pigeon_tpu.cli.run evaluate NAME --zeroshot -l BENCH
  --geocells cells.csv [-b hf_clip.bin]`.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from pigeon_tpu.config import TextConfig, VisionConfig
from pigeon_tpu.data.tokenizer import load_tokenizer
from pigeon_tpu.models.clip import CLIPModel
from pigeon_tpu.models.zeroshot import (
    embed_prompts,
    geocell_prompts,
    make_zero_shot_classifier,
)
from pigeon_tpu.train.metrics import compute_geoguessr_metrics


def main():
    # ViT-B/32-shaped tiny towers (swap in vit_b32_vision/text + HF weights
    # via models.hf_import for the real run).
    vis = VisionConfig(image_size=64, patch_size=16, hidden_size=64,
                       intermediate_size=128, num_layers=2, num_heads=4,
                       projection_dim=32)
    txt = TextConfig(vocab_size=4096, hidden_size=64, intermediate_size=128,
                     num_layers=2, num_heads=4, max_position_embeddings=24,
                     projection_dim=32)
    tokenizer = load_tokenizer()  # CLIP BPE if assets exist, else hash
    eos_id = getattr(tokenizer, "eos_id", 49407) % txt.vocab_size
    tokenizer.eos_id = eos_id
    tokenizer.bos_id = (eos_id - 1) % txt.vocab_size

    model = CLIPModel(vis, txt, eos_token_id=eos_id)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)),
                        jnp.zeros((1, 24), jnp.int32))["params"]

    # Geocell records (real run: rows of the geocell CSV).
    records = [
        {"admin_1": "Bavaria", "country": "Germany", "lng": 11.5, "lat": 48.1},
        {"admin_1": "Île-de-France", "country": "France", "lng": 2.35,
         "lat": 48.85},
        {"admin_1": "Kanto", "country": "Japan", "lng": 139.7, "lat": 35.7},
        {"admin_1": "New South Wales", "country": "Australia", "lng": 151.2,
         "lat": -33.9},
    ]
    prompts = geocell_prompts(records)
    print("prompts:", prompts)
    ids = tokenizer(prompts)[:, :24] % txt.vocab_size
    text_embeds = embed_prompts(model, params, ids)
    classify = make_zero_shot_classifier(model, params, text_embeds)

    # Synthetic benchmark batch (batch=8 per BASELINE config #1).
    rng = np.random.default_rng(0)
    images = rng.normal(size=(8, 64, 64, 3)).astype(np.float32)
    labels_clf = rng.integers(0, 4, 8)
    cells = np.array([[r["lng"], r["lat"]] for r in records], np.float32)
    labels_lla = cells[labels_clf]

    probs, _ = classify(jnp.asarray(images))
    pred_cell = np.asarray(jnp.argmax(probs, -1))
    topk = np.asarray(jax.lax.top_k(probs, 3)[1])
    metrics = compute_geoguessr_metrics(
        predictions=cells[pred_cell], labels=labels_lla,
        cell_preds=pred_cell, cell_labels=labels_clf, topk_cells=topk)
    keys = ("Median_km_error", "Geocell_accuracy", "Geocell_top5_accuracy",
            "Geoguessr_score")
    print("zero-shot metrics:", {k: round(metrics[k], 3) for k in keys})
    print("OK")


if __name__ == "__main__":
    main()
