"""Segmented forward == monolithic forward (exact same math)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pigeon_tpu.config import HeadConfig, VisionConfig
from pigeon_tpu.models.clip import CLIPVisionTower
from pigeon_tpu.models.embedder import token_mean_embedding
from pigeon_tpu.models.geocell_head import GeocellHead
from pigeon_tpu.models.segmented import (
    build_segmented_forward,
    run_segmented,
    segment_boundaries,
)

CFG = VisionConfig(image_size=32, patch_size=8, hidden_size=32,
                   intermediate_size=64, num_layers=4, num_heads=4)
HCFG = HeadConfig(num_cells=11, embed_dim=32)
RNG = np.random.default_rng(44)


def test_boundaries():
    assert segment_boundaries(24, 2) == [0, 12, 24]
    assert segment_boundaries(24, 3) == [0, 8, 16, 24]
    assert segment_boundaries(5, 2) == [0, 3, 5]


@pytest.mark.parametrize("segments", [1, 2, 3])
def test_matches_monolithic(segments):
    tower = CLIPVisionTower(CFG)
    pixels = jnp.asarray(RNG.normal(size=(2, 32, 32, 3)).astype(np.float32))
    tower_params = tower.init(jax.random.PRNGKey(0), pixels)["params"]
    head = GeocellHead(HCFG)
    emb0 = jnp.zeros((2, 32))
    head_params = head.init(jax.random.PRNGKey(1), emb0)["params"]

    # Monolithic reference.
    last_hidden, _ = tower.apply({"params": tower_params}, pixels)
    emb = token_mean_embedding(last_hidden)
    logits_ref = head.apply({"params": head_params}, emb).logits

    fns = build_segmented_forward(CFG, HCFG, tower_params, head_params,
                                  segments, dtype=jnp.float32)
    assert len(fns) == max(segments, 1)
    logits, emb_seg = run_segmented(fns, pixels)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(emb_seg), np.asarray(emb),
                               atol=2e-5)
