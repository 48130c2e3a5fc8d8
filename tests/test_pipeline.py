"""Pipeline parallelism: stage-sharded encoder parity on an 8-device mesh.

The reference has no PP (SURVEY §2.2); these tests pin that our GPipe
schedule (`train/pipeline.py`) computes EXACTLY the sequential encoder —
forward and gradients — across stage counts, microbatch counts, and
combined data×stage meshes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigeon_tpu.config import VisionConfig
from pigeon_tpu.models.clip import CLIPVisionTower
from pigeon_tpu.train.pipeline import (
    create_pipeline_mesh,
    pipeline_stack_apply,
    pipeline_vision_forward,
    shard_pipeline_params,
)

CFG = VisionConfig(image_size=16, patch_size=8, hidden_size=32,
                   intermediate_size=64, num_layers=8, num_heads=4,
                   projection_dim=16)


@pytest.fixture(scope="module")
def setup():
    model = CLIPVisionTower(CFG)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.normal(size=(8, 16, 16, 3)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), px)["params"]
    return model, params, px


requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


@requires_8
class TestPipelineForward:
    @pytest.mark.parametrize("pp,microbatches", [
        (4, 4),   # dp=2, standard fill/drain
        (4, 1),   # single microbatch (pure fill/drain, bitwise path)
        (8, 2),   # every device one stage
        (2, 2),   # dp=4
    ])
    def test_matches_sequential(self, setup, pp, microbatches):
        model, params, px = setup
        want_h, want_p = model.apply({"params": params}, px)
        mesh = create_pipeline_mesh(pp=pp)
        sp = shard_pipeline_params(params, mesh)
        got_h, got_p = pipeline_vision_forward(
            CFG, sp, px, mesh, num_microbatches=microbatches)
        np.testing.assert_allclose(got_h, want_h, atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(got_p, want_p, atol=2e-5, rtol=1e-5)

    @pytest.mark.parametrize("pp,tp", [(2, 2), (4, 2), (2, 4)])
    def test_pp_tp_composition(self, setup, pp, tp):
        """stage (manual) x model (auto GSPMD Megatron TP) x data in one
        mesh: same tower output, TP specs on the qkv/MLP kernels."""
        model, params, px = setup
        want_h, want_p = model.apply({"params": params}, px)
        mesh = create_pipeline_mesh(pp=pp, tp=tp)
        sp = shard_pipeline_params(params, mesh)
        qk = sp["encoder"]["layers"]["attn"]["q_proj"]["kernel"]
        assert qk.sharding.spec == ("stage", None, "model")
        fc2 = sp["encoder"]["layers"]["fc2"]["kernel"]
        assert fc2.sharding.spec == ("stage", "model", None)
        got_h, got_p = pipeline_vision_forward(
            CFG, sp, px, mesh, num_microbatches=2)
        np.testing.assert_allclose(got_h, want_h, atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(got_p, want_p, atol=2e-5, rtol=1e-5)

    def test_rejects_indivisible_layers(self, setup):
        _, params, px = setup
        mesh = create_pipeline_mesh(pp=4)
        sp = shard_pipeline_params(params, mesh)
        bad = jax.tree_util.tree_map(
            lambda x: x[:6], sp["encoder"]["layers"])  # 6 layers, pp=4
        with pytest.raises(ValueError, match="not divisible"):
            pipeline_stack_apply(lambda lp, h: h, bad,
                                 jnp.zeros((8, 5, 32)), mesh, 4)

    def test_rejects_indivisible_batch(self, setup):
        _, params, px = setup
        mesh = create_pipeline_mesh(pp=4)
        sp = shard_pipeline_params(params, mesh)
        with pytest.raises(ValueError, match="microbatches"):
            pipeline_stack_apply(lambda lp, h: h, sp["encoder"]["layers"],
                                 jnp.zeros((8, 5, 32)), mesh, 3)


@requires_8
class TestPipelineGradients:
    def test_grads_match_sequential(self, setup):
        model, params, px = setup

        def loss_seq(p):
            _, pooled = model.apply({"params": p}, px)
            return jnp.sum(pooled ** 2)

        mesh = create_pipeline_mesh(pp=4)
        sp = shard_pipeline_params(params, mesh)

        def loss_pp(p):
            _, pooled = pipeline_vision_forward(CFG, p, px, mesh,
                                                num_microbatches=4)
            return jnp.sum(pooled ** 2)

        g_seq = jax.grad(loss_seq)(params)
        g_pp = jax.jit(jax.grad(loss_pp))(sp)

        # f32 accumulation-order noise only; tolerance floored because
        # mathematically-zero grads (k_proj bias under softmax) are pure
        # noise at ~1e-12 in both.
        for (path, a), b in zip(
                jax.tree_util.tree_flatten_with_path(g_seq)[0],
                jax.tree_util.tree_leaves(g_pp)):
            name = "/".join(str(getattr(q, "key", q)) for q in path)
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-4, rtol=5e-3,
                err_msg=f"gradient mismatch at {name}")

    def test_pipeline_train_step_learns(self):
        """Full train step through the pipelined encoder: smoothed-CE +
        multi-task loss decreases and stage sharding survives updates."""
        from pigeon_tpu.config import HeadConfig
        from pigeon_tpu.train.mesh import shard_batch
        from pigeon_tpu.train.pipeline import (
            create_pipeline_train_state,
            make_pipeline_train_step,
        )
        from pigeon_tpu.train.train_loop import adamw

        head_cfg = HeadConfig(num_cells=16, embed_dim=32, panorama=False,
                              multi_task=True, smooth_labels=True)
        mesh = create_pipeline_mesh(pp=4)
        opt = adamw(1e-3, max_grad_norm=1.0)
        rng = np.random.default_rng(0)
        px = jnp.asarray(rng.normal(size=(8, 16, 16, 3)).astype(np.float32))
        state = create_pipeline_train_state(
            jax.random.PRNGKey(0), CFG, head_cfg, opt, px, mesh)
        cells = np.stack([np.linspace(-170, 170, 16),
                          np.linspace(-55, 65, 16)], -1).astype(np.float32)
        step = make_pipeline_train_step(CFG, head_cfg, cells, opt, mesh,
                                        num_microbatches=2)
        batch = shard_batch({
            "inputs": px,
            "labels": jnp.asarray(np.stack(
                [rng.uniform(-180, 180, 8), rng.uniform(-60, 70, 8)],
                -1).astype(np.float32)),
            "labels_multi_task": jnp.asarray(
                rng.normal(size=(8, 6)).astype(np.float32)),
            "labels_climate": jnp.asarray(rng.integers(0, 28, 8)),
            "labels_month": jnp.asarray(rng.integers(0, 12, 8)),
        }, mesh)
        losses = []
        for _ in range(8):
            state, parts = step(state, batch, jax.random.PRNGKey(7))
            losses.append(float(parts["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0] * 0.8, losses
        spec = state.params["tower"]["encoder"]["layers"][
            "fc1"]["kernel"].sharding.spec
        assert spec[0] == "stage", spec

    def test_stage_sharding_applied(self, setup):
        _, params, _ = setup
        mesh = create_pipeline_mesh(pp=4)
        sp = shard_pipeline_params(params, mesh)
        layer_leaf = sp["encoder"]["layers"]["fc1"]["kernel"]
        spec = layer_leaf.sharding.spec
        assert spec[0] == "stage", spec
        # Non-stacked params replicated.
        assert sp["cls_token"].sharding.spec == ()
