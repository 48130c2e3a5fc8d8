"""End-to-end SuperGuessr tests: pixels -> geocell predictions."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pigeon_tpu.config import HeadConfig, VisionConfig
from pigeon_tpu.models.geocell_head import geocell_predictions
from pigeon_tpu.models.super_guessr import (
    SuperGuessr,
    apply_grad_mask,
    trainable_last_layer_mask,
)

TINY = VisionConfig(image_size=32, patch_size=8, hidden_size=32,
                    intermediate_size=64, num_layers=2, num_heads=4,
                    projection_dim=16)
RNG = np.random.default_rng(9)


def test_single_image_forward():
    cfg = HeadConfig(num_cells=11, embed_dim=32, panorama=False)
    model = SuperGuessr(TINY, cfg)
    x = jnp.asarray(RNG.normal(size=(2, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.logits.shape == (2, 11)
    assert out.embedding.shape == (2, 32)


def test_panorama_fold_unfold():
    cfg = HeadConfig(num_cells=11, embed_dim=32, panorama=True)
    model = SuperGuessr(TINY, cfg)
    x = jnp.asarray(RNG.normal(size=(2, 4, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.logits.shape == (2, 11)
    assert out.embedding.shape == (2, 4, 32)

    # View-fold equivalence: view embeddings == running each view alone
    # through the single-image model with the same tower params.
    cfg_single = HeadConfig(num_cells=11, embed_dim=32, panorama=False)
    single = SuperGuessr(TINY, cfg_single)
    v1 = single.apply(params, x[:, 1])
    np.testing.assert_allclose(np.asarray(out.embedding[:, 1]),
                               np.asarray(v1.embedding), atol=1e-5)


def test_predictions_pipeline():
    cfg = HeadConfig(num_cells=7, embed_dim=32, panorama=False,
                     num_candidates=3)
    model = SuperGuessr(TINY, cfg)
    x = jnp.asarray(RNG.normal(size=(2, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    cells = jnp.asarray(
        np.stack([RNG.uniform(-180, 180, 7), RNG.uniform(-60, 70, 7)], -1)
        .astype(np.float32))
    preds = geocell_predictions(out.logits, cells, 3)
    assert preds["pred_lla"].shape == (2, 2)
    assert preds["topk_cells"].shape == (2, 3)


def test_partial_freeze_mask():
    cfg = HeadConfig(num_cells=5, embed_dim=32, panorama=False)
    model = SuperGuessr(TINY, cfg)
    x = jnp.asarray(RNG.normal(size=(1, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    mask = trainable_last_layer_mask(params, num_layers=2)

    fake_grads = jax.tree_util.tree_map(jnp.ones_like, params)
    masked = apply_grad_mask(fake_grads, mask)

    # Encoder layer 0 grads zeroed, layer 1 (last) kept.
    layer_grads = masked["vision"]["encoder"]["layers"]
    leaf = layer_grads["fc1"]["kernel"]
    assert float(jnp.abs(leaf[0]).max()) == 0.0
    assert float(jnp.abs(leaf[1]).min()) == 1.0
    # Head grads untouched.
    assert float(jnp.abs(masked["head"]["cell_layer"]["kernel"]).min()) == 1.0
    # Vision embeddings stay trainable (reference freezes only layers[:-1]).
    assert float(jnp.abs(masked["vision"]["pos_embed"]).min()) == 1.0


def test_frozen_params_immune_to_weight_decay():
    """A grad-masked (frozen) param must not move AT ALL — adamw's
    decoupled weight decay would otherwise still shrink it (the reference
    freezes via requires_grad=False; torch skips None-grad params)."""
    from pigeon_tpu.train import create_train_state, make_train_step
    from pigeon_tpu.train.train_loop import adamw

    cfg = HeadConfig(num_cells=5, embed_dim=32, panorama=False,
                     smooth_labels=True)
    model = SuperGuessr(TINY, cfg)
    opt = adamw(1e-2, weight_decay=0.1)
    state = create_train_state(jax.random.PRNGKey(0), model, opt,
                               (jnp.zeros((1, 32, 32, 3)),))
    frozen_vision = jax.tree_util.tree_map(
        lambda p: np.asarray(p), state.params["vision"])

    # Freeze the ENTIRE vision tower.
    mask = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    mask["head"] = jax.tree_util.tree_map(jnp.ones_like, mask["head"])
    cells = np.stack([np.linspace(-150, 150, 5),
                      np.linspace(-50, 60, 5)], -1).astype(np.float32)
    step = make_train_step(model, opt, cfg, cells, grad_mask=mask,
                           donate=False)
    batch = {
        "inputs": jnp.asarray(
            RNG.normal(size=(4, 32, 32, 3)).astype(np.float32)),
        "labels": jnp.asarray(np.stack(
            [RNG.uniform(-180, 180, 4), RNG.uniform(-60, 70, 4)],
            -1).astype(np.float32)),
    }
    for _ in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(1))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        frozen_vision, state.params["vision"])
    # And the head DID train.
    assert float(jnp.abs(
        state.params["head"]["cell_layer"]["kernel"]).max()) > 0


def test_param_summary():
    from pigeon_tpu.models.summary import describe, param_count, param_summary

    cfg = HeadConfig(num_cells=11, embed_dim=32, panorama=False)
    model = SuperGuessr(TINY, cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    total = param_count(params)
    groups = param_summary(params)
    assert total > 0
    assert sum(groups.values()) == total
    assert any(k.startswith("vision") for k in groups)
    text = describe(params, "tiny-superguessr")
    assert "parameters" in text and "vision" in text
