"""Int8 W8A8 inference path: quantization error bounds + tree conversion.

No reference counterpart (the torch release has no quantized path) —
these pin the conversion contract: a `quant=True` tower fed
`quantize_tower_params(f32_params)` must track the f32 tower within
int8 quantization noise.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigeon_tpu.config import VisionConfig
from pigeon_tpu.models.clip import CLIPVisionTower
from pigeon_tpu.models.quant import (
    QuantDense,
    quantize_channelwise,
    quantize_tower_params,
)

RNG = np.random.default_rng(123)


class TestQuantizeChannelwise:
    def test_round_trip_error(self):
        w = jnp.asarray(RNG.normal(size=(64, 32)).astype(np.float32))
        w_q, scale = quantize_channelwise(w, axis=-1)
        assert w_q.dtype == jnp.int8 and scale.shape == (32,)
        back = w_q.astype(jnp.float32) * scale
        # Symmetric 8-bit: error <= scale/2 per element.
        assert float(jnp.abs(back - w).max()) <= float(scale.max()) / 2 + 1e-7

    def test_zero_channel(self):
        w = jnp.zeros((8, 4))
        w_q, scale = quantize_channelwise(w)
        np.testing.assert_array_equal(np.asarray(w_q), 0)
        np.testing.assert_array_equal(np.asarray(scale), 1.0)


class TestQuantDense:
    def test_tracks_f32_dense(self):
        d_in, d_out, b = 256, 128, 16
        x = jnp.asarray(RNG.normal(size=(b, d_in)).astype(np.float32))
        dense = nn.Dense(d_out)
        params = dense.init(jax.random.PRNGKey(0), x)["params"]
        want = dense.apply({"params": params}, x)

        w_q, scale = quantize_channelwise(params["kernel"], axis=-1)
        qparams = {"kernel": w_q, "scale": scale, "bias": params["bias"],
                   "act_scale": jnp.ones((), jnp.float32)}
        got = QuantDense(d_out, dtype=jnp.float32).apply(
            {"params": qparams}, x)

        err = jnp.abs(got - want)
        denom = jnp.abs(want).mean() + 1e-6
        # W8A8 per-channel/per-token: ~1% relative error at these shapes.
        assert float(err.mean() / denom) < 0.02, float(err.mean() / denom)

    def test_jit_compiles_int8_dot(self):
        x = jnp.asarray(RNG.normal(size=(4, 64)).astype(np.float32))
        model = QuantDense(32)
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        assert params["kernel"].dtype == jnp.int8
        out = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, x)
        assert out.shape == (4, 32)


class TestCalibrationZeroRow:
    def test_all_zero_token_row_does_not_inflate_act_scale(self):
        """ADVICE r2: the dynamic path's zero-guard maps all-zero rows to
        scale 1.0; reconstructing amax from scales would sow >= 127 and
        coarsen quantization for every real activation. The sown value
        must be the TRUE row max."""
        import flax.linen as nn

        d_in, d_out = 64, 32
        x = RNG.normal(size=(8, d_in)).astype(np.float32) * 0.5
        x[3] = 0.0                       # degenerate all-zero token row
        x = jnp.asarray(x)
        model = QuantDense(d_out, dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        _, state = model.apply({"params": params}, x,
                               mutable=["intermediates"])
        sown = state["intermediates"]["act_amax"]
        if isinstance(sown, tuple):
            sown = sown[0]
        amax = float(sown)
        true_max = float(jnp.abs(x).max())
        assert amax == pytest.approx(true_max, rel=1e-6)
        assert amax < 127.0              # the old bug sowed >= 127


class TestQuantTower:
    CFG = VisionConfig(image_size=32, patch_size=8, hidden_size=64,
                       intermediate_size=128, num_layers=3, num_heads=4,
                       projection_dim=32)

    @pytest.fixture(scope="class")
    def towers(self):
        px = jnp.asarray(RNG.normal(size=(2, 32, 32, 3)).astype(np.float32))
        f32 = CLIPVisionTower(self.CFG, dtype=jnp.float32)
        params = jax.jit(f32.init)(jax.random.PRNGKey(1), px)["params"]
        return f32, params, px

    def test_converted_tree_matches_quant_init_structure(self, towers):
        _, params, px = towers
        quant_model = CLIPVisionTower(self.CFG, dtype=jnp.float32,
                                      quant=True)
        ref_tree = jax.jit(quant_model.init)(
            jax.random.PRNGKey(2), px)["params"]
        converted = quantize_tower_params(params)
        ref_paths = jax.tree_util.tree_structure(ref_tree)
        got_paths = jax.tree_util.tree_structure(converted)
        assert ref_paths == got_paths
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(ref_tree)[0],
                jax.tree_util.tree_flatten_with_path(converted)[0]):
            assert a.shape == b.shape, (pa, a.shape, b.shape)
            assert a.dtype == b.dtype, (pa, a.dtype, b.dtype)

    def test_quant_tower_tracks_f32_tower(self, towers):
        f32, params, px = towers
        want_h, want_p = f32.apply({"params": params}, px)
        quant_model = CLIPVisionTower(self.CFG, dtype=jnp.float32,
                                      quant=True)
        got_h, got_p = jax.jit(
            lambda p, x: quant_model.apply({"params": p}, x))(
            quantize_tower_params(params), px)
        rel = float(jnp.abs(got_h - want_h).mean()
                    / (jnp.abs(want_h).mean() + 1e-6))
        assert rel < 0.05, rel
        # Embedding direction must be preserved (retrieval quality proxy).
        a = np.asarray(want_h.mean(1))
        b = np.asarray(got_h.mean(1))
        cos = (a * b).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9)
        assert cos.min() > 0.999, cos

    def test_static_act_path_after_calibration(self, towers):
        from pigeon_tpu.models.quant import calibrate_act_scales

        f32, params, px = towers
        want_h, _ = f32.apply({"params": params}, px)
        qparams = quantize_tower_params(params)
        dyn_model = CLIPVisionTower(self.CFG, dtype=jnp.float32,
                                    quant=True)
        qparams = calibrate_act_scales(dyn_model, qparams, px)
        # act scales actually got calibrated (not the placeholder ones)
        fc1_scale = qparams["encoder"]["layers"]["fc1"]["act_scale"]
        assert fc1_scale.shape == (self.CFG.num_layers,)
        assert not np.allclose(np.asarray(fc1_scale), 1.0)

        static_model = CLIPVisionTower(self.CFG, dtype=jnp.float32,
                                       quant="static")
        got_h, _ = jax.jit(
            lambda p, x: static_model.apply({"params": p}, x))(qparams, px)
        rel = float(jnp.abs(got_h - want_h).mean()
                    / (jnp.abs(want_h).mean() + 1e-6))
        # Per-tensor static scales are coarser than per-token dynamic.
        assert rel < 0.10, rel
        a = np.asarray(want_h.mean(1))
        b = np.asarray(got_h.mean(1))
        cos = (a * b).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9)
        assert cos.min() > 0.998, cos
