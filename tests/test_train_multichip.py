"""Multi-device training tests on the virtual 8-CPU mesh.

Validates the full SPMD story: (data, model) mesh, Megatron-style TP specs
on the ViT + geocell head, sharded batch, jitted train step executing with
gradient all-reduce over the mesh — the TPU-native replacement for the
reference's DDP loop.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pigeon_tpu.config import HeadConfig, VisionConfig
from pigeon_tpu.models.super_guessr import SuperGuessr, trainable_last_layer_mask
from pigeon_tpu.train import (
    create_mesh,
    create_train_state,
    make_eval_step,
    make_train_step,
    shard_batch,
    shard_params,
)
from pigeon_tpu.train.mesh import param_specs
from pigeon_tpu.train.train_loop import adamw

TINY = VisionConfig(image_size=32, patch_size=8, hidden_size=32,
                    intermediate_size=64, num_layers=2, num_heads=4,
                    projection_dim=16)
RNG = np.random.default_rng(0)


def make_batch(b=8, cells=16):
    return {
        "inputs": jnp.asarray(
            RNG.normal(size=(b, 32, 32, 3)).astype(np.float32)),
        "labels": jnp.asarray(np.stack(
            [RNG.uniform(-180, 180, b), RNG.uniform(-60, 70, b)],
            -1).astype(np.float32)),
        "labels_multi_task": jnp.asarray(
            RNG.normal(size=(b, 6)).astype(np.float32)),
        "labels_climate": jnp.asarray(RNG.integers(0, 28, b)),
        "labels_month": jnp.asarray(RNG.integers(0, 12, b)),
    }


def geocell_table(cells=16):
    return np.stack([np.linspace(-170, 170, cells),
                     np.linspace(-55, 65, cells)], -1).astype(np.float32)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    return create_mesh(tp=2)


class TestMesh:
    def test_mesh_shape(self, mesh):
        assert mesh.shape == {"data": 4, "model": 2}

    def test_param_specs_hit_rules(self):
        cfg = HeadConfig(num_cells=16, embed_dim=32, multi_task=True)
        model = SuperGuessr(TINY, cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3)))["params"]
        specs = param_specs(params)
        assert specs["head"]["cell_layer"]["kernel"] == P(None, "model")
        assert specs["vision"]["encoder"]["layers"]["fc1"]["kernel"] == \
            P(None, None, "model")
        assert specs["vision"]["encoder"]["layers"]["fc2"]["kernel"] == \
            P(None, "model", None)
        assert specs["vision"]["pos_embed"] == P()

    def test_shard_params_places_on_mesh(self, mesh):
        cfg = HeadConfig(num_cells=16, embed_dim=32)
        model = SuperGuessr(TINY, cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3)))["params"]
        sharded = shard_params(params, mesh)
        kern = sharded["head"]["cell_layer"]["kernel"]
        # 16 cells over model axis of size 2 -> 8 per shard.
        shard_shapes = {s.data.shape for s in kern.addressable_shards}
        assert shard_shapes == {(32, 8)}


class TestTrainStep:
    def test_full_step_runs_and_descends(self, mesh):
        cfg = HeadConfig(num_cells=16, embed_dim=32, multi_task=True,
                         smooth_labels=True)
        model = SuperGuessr(TINY, cfg)
        opt = adamw(1e-3)
        cells = geocell_table()

        state = create_train_state(
            jax.random.PRNGKey(0), model, opt,
            (jnp.zeros((2, 32, 32, 3)),), mesh=mesh)
        step = make_train_step(model, opt, cfg, cells)
        batch = shard_batch(make_batch(), mesh)

        losses = []
        rng = jax.random.PRNGKey(1)
        for _ in range(5):
            state, metrics = step(state, batch, rng)
            losses.append(float(metrics["loss"]))
        assert int(state.step) == 5
        assert losses[-1] < losses[0], f"no descent: {losses}"
        assert np.isfinite(losses).all()

    def test_eval_step_outputs(self, mesh):
        cfg = HeadConfig(num_cells=16, embed_dim=32, multi_task=True)
        model = SuperGuessr(TINY, cfg)
        opt = adamw(1e-3)
        cells = geocell_table()
        state = create_train_state(
            jax.random.PRNGKey(0), model, opt,
            (jnp.zeros((2, 32, 32, 3)),), mesh=mesh)
        eval_step = make_eval_step(model, cfg, cells, num_candidates=5)
        batch = shard_batch(make_batch(), mesh)
        metrics, preds = eval_step(state.params, batch)
        assert preds["pred_lla"].shape == (8, 2)
        assert preds["topk_cells"].shape == (8, 5)
        assert np.isfinite(float(metrics["loss"]))

    def test_partial_freeze_in_step(self, mesh):
        cfg = HeadConfig(num_cells=16, embed_dim=32)
        model = SuperGuessr(TINY, cfg)
        opt = adamw(1e-2)
        cells = geocell_table()
        state = create_train_state(
            jax.random.PRNGKey(0), model, opt,
            (jnp.zeros((2, 32, 32, 3)),), mesh=mesh)
        mask = trainable_last_layer_mask(state.params, TINY.num_layers)
        step = make_train_step(model, opt, cfg, cells, grad_mask=mask,
                               donate=False)
        batch = shard_batch(make_batch(), mesh)
        before = np.asarray(
            state.params["vision"]["encoder"]["layers"]["fc1"]["kernel"])
        new_state, _ = step(state, batch, jax.random.PRNGKey(2))
        after = np.asarray(
            new_state.params["vision"]["encoder"]["layers"]["fc1"]["kernel"])
        # Layer 0 unchanged, layer 1 updated.
        np.testing.assert_array_equal(before[0], after[0])
        assert np.abs(after[1] - before[1]).max() > 0

    def test_grad_accum_multisteps(self, mesh):
        cfg = HeadConfig(num_cells=16, embed_dim=32)
        model = SuperGuessr(TINY, cfg)
        opt = adamw(1e-3, accum_steps=2)
        cells = geocell_table()
        state = create_train_state(
            jax.random.PRNGKey(0), model, opt,
            (jnp.zeros((2, 32, 32, 3)),), mesh=mesh)
        step = make_train_step(model, opt, cfg, cells, donate=False)
        batch = shard_batch(make_batch(), mesh)
        p0 = np.asarray(state.params["head"]["cell_layer"]["kernel"])
        s1, _ = step(state, batch, jax.random.PRNGKey(3))
        p1 = np.asarray(s1.params["head"]["cell_layer"]["kernel"])
        # First micro-step: params unchanged (accumulating).
        np.testing.assert_array_equal(p0, p1)
        s2, _ = step(s1, batch, jax.random.PRNGKey(3))
        p2 = np.asarray(s2.params["head"]["cell_layer"]["kernel"])
        assert np.abs(p2 - p0).max() > 0


class TestHierarchicalTraining:
    def test_hierarchical_panorama_step(self, mesh):
        """Hierarchical aggregation path (attention + dropout) under the
        jitted train step — exercises the dropout rng plumbing."""
        cfg = HeadConfig(num_cells=16, embed_dim=32, panorama=True,
                         hierarchical=True, heading=True,
                         num_attention_heads=2, multi_task=True)
        model = SuperGuessr(TINY, cfg)
        opt = adamw(1e-3)
        cells = geocell_table()
        state = create_train_state(
            jax.random.PRNGKey(0), model, opt,
            (jnp.zeros((2, 4, 32, 32, 3)),), mesh=mesh)
        step = make_train_step(model, opt, cfg, cells, donate=False)
        b = 8
        batch = shard_batch({
            "inputs": jnp.asarray(
                RNG.normal(size=(b, 4, 32, 32, 3)).astype(np.float32)),
            "heading": jnp.asarray(
                RNG.normal(size=(b, 4, 2)).astype(np.float32)),
            "labels": jnp.asarray(np.stack(
                [RNG.uniform(-180, 180, b), RNG.uniform(-60, 70, b)],
                -1).astype(np.float32)),
            "labels_multi_task": jnp.asarray(
                RNG.normal(size=(b, 6)).astype(np.float32)),
            "labels_climate": jnp.asarray(RNG.integers(0, 28, b)),
            "labels_month": jnp.asarray(RNG.integers(0, 12, b)),
        }, mesh)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        # Same rng -> deterministic; different rng -> dropout is active.
        _, m2 = step(state, batch, jax.random.PRNGKey(2))
        _, m3 = step(state, batch, jax.random.PRNGKey(2))
        assert float(m2["loss"]) == float(m3["loss"])
        _, m4 = step(state, batch, jax.random.PRNGKey(3))
        assert float(m4["loss"]) != float(m2["loss"])


class TestShardBatchRaggedTails:
    """shard_batch owns the ragged policy: divisible leading dims shard
    over `data`, ragged tails replicate (a non-divisible NamedSharding
    is an error; regression for the eval-tail crash fixed late round 2)."""

    def test_divisible_shards_over_data(self, mesh):
        batch = shard_batch({"inputs": jnp.zeros((8, 4))}, mesh)
        sh = batch["inputs"].sharding
        assert sh.spec == P("data")

    def test_ragged_tail_replicates(self, mesh):
        batch = shard_batch({"inputs": jnp.zeros((3, 4)),
                             "labels": jnp.zeros((3, 2))}, mesh)
        for v in batch.values():
            assert v.sharding.is_fully_replicated

    def test_scalar_leaves_pass_through(self, mesh):
        batch = shard_batch({"step": jnp.float32(1.0)}, mesh)
        assert batch["step"].shape == ()


class TestStartHostCopies:
    def test_tolerates_mixed_trees(self, mesh):
        from pigeon_tpu.train.transfer import start_host_copies

        tree = {"dev": jnp.arange(8.0),
                "sharded": shard_batch({"x": jnp.zeros((8, 4))},
                                       mesh)["x"],
                "np": np.arange(3), "scalar": 1.5, "none": None}
        start_host_copies(tree)  # must not raise
        assert float(tree["dev"].sum()) == 28.0
