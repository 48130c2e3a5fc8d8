"""SPMD contrastive pretraining: sharded-batch step == single-device step.

The global-batch negatives claim (docs/SHARDING.md) requires that sharding
the batch over the data axis does NOT change the loss — XLA must all-gather
for the (B, B) similarity rather than computing per-shard negatives.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pigeon_tpu.config import TextConfig, VisionConfig, pigeon_config
from pigeon_tpu.models.clip import CLIPModel
from pigeon_tpu.train import create_mesh, create_train_state, shard_batch
from pigeon_tpu.train.modes import make_pretrain_step, pretrain_optimizer

RNG = np.random.default_rng(6)


def test_sharded_loss_equals_unsharded():
    vis = VisionConfig(image_size=32, patch_size=8, hidden_size=32,
                       intermediate_size=64, num_layers=2, num_heads=4,
                       projection_dim=16)
    txt = TextConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                     num_layers=2, num_heads=4, max_position_embeddings=12,
                     projection_dim=16)
    model = CLIPModel(vis, txt, eos_token_id=63)
    import dataclasses

    cfg = pigeon_config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, pretrain_grad_accum_steps=1))
    opt = pretrain_optimizer(cfg, total_steps=10)
    example = (jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 12), jnp.int32))
    state = create_train_state(jax.random.PRNGKey(0), model, opt, example,
                               init_kwargs={})
    step = make_pretrain_step(model, opt)

    batch_np = {
        "pixel_values": RNG.normal(size=(8, 32, 32, 3)).astype(np.float32),
        "input_ids": np.concatenate(
            [RNG.integers(0, 60, size=(8, 11)),
             np.full((8, 1), 63)], axis=1).astype(np.int32),
    }

    # Single-device step.
    s1, m1 = step(state, {k: jnp.asarray(v) for k, v in batch_np.items()})

    # Mesh-sharded step from the same initial state.
    mesh = create_mesh(tp=2)
    state2 = create_train_state(jax.random.PRNGKey(0), model, opt, example,
                                mesh=mesh, init_kwargs={})
    step2 = make_pretrain_step(model, opt)
    sharded = shard_batch({k: jnp.asarray(v) for k, v in batch_np.items()},
                          mesh)
    s2, m2 = step2(state2, sharded)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    assert float(m1["in_batch_accuracy"]) == pytest.approx(
        float(m2["in_batch_accuracy"]), abs=1e-6)
    # Updated params agree across the two layouts.
    a = np.asarray(s1.params["visual_projection"]["kernel"])
    b = np.asarray(s2.params["visual_projection"]["kernel"])
    np.testing.assert_allclose(a, b, atol=1e-5)
