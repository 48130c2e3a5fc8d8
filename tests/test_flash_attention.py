"""Fused attention kernel: parity vs einsum attention, fwd + bwd."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

RNG = np.random.default_rng(30)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    # Tiny test shapes (dh=16) resolve to groups=1 under the
    # lane-aware picker (`_pick_groups`), which would leave the
    # multi-group sweep (weight-block index maps, dx accumulation
    # across groups) untested. An EXPLICIT group count is honored on
    # divisibility alone, so pin 2 module-wide; the default/degenerate
    # g1 path is covered by test_default_groups_tiny_shapes and the
    # picker unit test.
    monkeypatch.setenv("PIGEON_FUSED_GROUPS", "2")
    monkeypatch.setenv("PIGEON_FUSED_BWD_GROUPS", "2")
    with pltpu.force_tpu_interpret_mode():
        yield


def rand_qkv(b, s, h, d, dtype=np.float32):
    shape = (b, s, h, d)
    return tuple(jnp.asarray(RNG.normal(size=shape).astype(dtype) * 0.3)
                 for _ in range(3))


def xla_mha(q, k, v):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


class TestForward:
    @pytest.mark.parametrize("s", [64, 100, 577])
    def test_matches_xla(self, s):
        from pigeon_tpu.kernels.flash_attention import mha

        q, k, v = rand_qkv(2, s, 2, 32)
        got = np.asarray(mha(q, k, v))
        want = np.asarray(xla_mha(q, k, v))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_bf16(self):
        from pigeon_tpu.kernels.flash_attention import mha

        q, k, v = rand_qkv(1, 96, 2, 32)
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        got = np.asarray(mha(qb, kb, vb), dtype=np.float32)
        want = np.asarray(xla_mha(q, k, v))
        np.testing.assert_allclose(got, want, atol=3e-2)


class TestOnlineForward:
    """PIGEON_FLASH_FWD=online selects the online-softmax body (exact
    math, chunked over K, no (S, S) materialization)."""

    @pytest.mark.parametrize("s", [64, 100, 577])
    def test_matches_xla(self, s, monkeypatch):
        from pigeon_tpu.kernels.flash_attention import mha

        monkeypatch.setenv("PIGEON_FLASH_FWD", "online")
        q, k, v = rand_qkv(2, s, 2, 32)
        got = np.asarray(mha(q, k, v))
        want = np.asarray(xla_mha(q, k, v))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_pack_fallback_small_bh(self, monkeypatch):
        # BH=2 not divisible by 8 -> falls back to pack 2.
        from pigeon_tpu.kernels.flash_attention import mha

        monkeypatch.setenv("PIGEON_FLASH_FWD", "online")
        q, k, v = rand_qkv(1, 96, 2, 32)
        np.testing.assert_allclose(np.asarray(mha(q, k, v)),
                                   np.asarray(xla_mha(q, k, v)),
                                   atol=2e-5)


class TestBackward:
    def test_grads_match_xla(self):
        from pigeon_tpu.kernels.flash_attention import mha

        q, k, v = rand_qkv(1, 80, 2, 32)

        def loss_flash(q, k, v):
            return jnp.sum(mha(q, k, v) ** 2)

        def loss_xla(q, k, v):
            return jnp.sum(xla_mha(q, k, v) ** 2)

        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-4)


class TestFusedQKV:
    """`fused_qkv_mha`: QKV projections inside the attention kernel."""

    def _setup(self, b=2, s=64, h=4, dh=16):
        d = h * dh
        x = jnp.asarray(RNG.normal(size=(b, s, d)).astype(np.float32) * .3)
        ws = [jnp.asarray(RNG.normal(size=(d, d)).astype(np.float32) * .1)
              for _ in range(3)]
        bs = [jnp.asarray(RNG.normal(size=(d,)).astype(np.float32) * .1)
              for _ in range(3)]
        return x, ws, bs, h, dh

    @staticmethod
    def _reference(x, ws, bs, h, dh):
        b, s, d = x.shape
        q, k, v = ((x @ w + bb).reshape(b, s, h, dh)
                   for w, bb in zip(ws, bs))
        return xla_mha(q, k, v).reshape(b, s, d)

    @pytest.mark.parametrize("s", [64, 100, 577])
    def test_matches_dense_projections(self, s):
        from pigeon_tpu.kernels.flash_attention import fused_qkv_mha

        x, ws, bs, h, dh = self._setup(s=s)
        got = np.asarray(fused_qkv_mha(x, *ws, *bs, h))
        want = np.asarray(self._reference(x, ws, bs, h, dh))
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_odd_head_count_group_fallback(self):
        # h=3 not divisible by FUSED_GROUPS=4 or 2 -> groups=1.
        from pigeon_tpu.kernels.flash_attention import fused_qkv_mha

        x, ws, bs, h, dh = self._setup(h=3, dh=16)
        got = np.asarray(fused_qkv_mha(x, *ws, *bs, 3))
        want = np.asarray(self._reference(x, ws, bs, 3, 16))
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_grads_match_dense_path(self):
        from pigeon_tpu.kernels.flash_attention import fused_qkv_mha

        x, ws, bs, h, dh = self._setup(s=80)

        def loss_fused(x, wq, wk, wv, bq, bk, bv):
            return jnp.sum(fused_qkv_mha(x, wq, wk, wv, bq, bk, bv, h)
                           ** 2)

        def loss_ref(x, wq, wk, wv, bq, bk, bv):
            return jnp.sum(
                self._reference(x, (wq, wk, wv), (bq, bk, bv), h, dh)
                ** 2)

        args = (x, *ws, *bs)
        g1 = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
        g2 = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4)


class TestFusedQKVBackwardKernel:
    """PIGEON_FUSED_BWD=kernel selects the fused BACKWARD Pallas kernel
    (`_fused_qkv_bwd_kernel`): q/k/v recomputed in-kernel, dq/dk/dv in
    natural layout, dx accumulated in VMEM scratch across the group
    sweep. Must match the XLA-recompute backward (the shipping default)
    and the dense-composition grads exactly on every argument."""

    _setup = TestFusedQKV._setup
    _reference = staticmethod(TestFusedQKV._reference)

    def _grads(self, x, ws, bs, h, loss):
        return jax.grad(loss, argnums=tuple(range(7)))(x, *ws, *bs)

    @pytest.mark.parametrize("s,h,dh", [(64, 4, 16), (100, 4, 16),
                                        (80, 8, 16), (64, 3, 16)])
    def test_grads_match_xla_backward(self, s, h, dh, monkeypatch):
        from pigeon_tpu.kernels.flash_attention import fused_qkv_mha

        x, ws, bs, h, dh = self._setup(s=s, h=h, dh=dh)

        def loss(x, wq, wk, wv, bq, bk, bv):
            return jnp.sum(fused_qkv_mha(x, wq, wk, wv, bq, bk, bv, h)
                           ** 2)

        monkeypatch.setenv("PIGEON_FUSED_BWD", "xla")
        g_xla = self._grads(x, ws, bs, h, loss)
        monkeypatch.setenv("PIGEON_FUSED_BWD", "kernel")
        g_kern = self._grads(x, ws, bs, h, loss)
        for a, b in zip(g_kern, g_xla):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-4)

    def test_grads_match_dense_composition(self, monkeypatch):
        from pigeon_tpu.kernels.flash_attention import fused_qkv_mha

        monkeypatch.setenv("PIGEON_FUSED_BWD", "kernel")
        x, ws, bs, h, dh = self._setup(s=80)

        def loss_fused(x, wq, wk, wv, bq, bk, bv):
            return jnp.sum(fused_qkv_mha(x, wq, wk, wv, bq, bk, bv, h)
                           ** 2)

        def loss_ref(x, wq, wk, wv, bq, bk, bv):
            return jnp.sum(
                self._reference(x, (wq, wk, wv), (bq, bk, bv), h, dh)
                ** 2)

        g1 = self._grads(x, ws, bs, h, loss_fused)
        g2 = self._grads(x, ws, bs, h, loss_ref)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4)

    def test_head_dim_shard_grads(self, monkeypatch):
        """The TP case: weights are a head-dim shard (P = h_local * dh
        < D) with explicit head_dim — the kernel derives everything
        from (num_heads, head_dim), exactly like the forward."""
        from pigeon_tpu.kernels.flash_attention import fused_qkv_mha

        b, s, d, h_local, dh = 2, 64, 64, 2, 16
        p = h_local * dh
        x = jnp.asarray(RNG.normal(size=(b, s, d)).astype(np.float32)
                        * .3)
        ws = [jnp.asarray(RNG.normal(size=(d, p)).astype(np.float32)
                          * .1) for _ in range(3)]
        bs = [jnp.asarray(RNG.normal(size=(p,)).astype(np.float32) * .1)
              for _ in range(3)]

        def loss(x, wq, wk, wv, bq, bk, bv):
            return jnp.sum(fused_qkv_mha(x, wq, wk, wv, bq, bk, bv,
                                         h_local, dh) ** 2)

        monkeypatch.setenv("PIGEON_FUSED_BWD", "xla")
        g_xla = jax.grad(loss, argnums=tuple(range(7)))(x, *ws, *bs)
        monkeypatch.setenv("PIGEON_FUSED_BWD", "kernel")
        g_kern = jax.grad(loss, argnums=tuple(range(7)))(x, *ws, *bs)
        for a, b in zip(g_kern, g_xla):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-4)

    def test_groups_env_override(self, monkeypatch):
        from pigeon_tpu.kernels.flash_attention import fused_qkv_mha

        monkeypatch.setenv("PIGEON_FUSED_BWD", "kernel")
        monkeypatch.setenv("PIGEON_FUSED_BWD_GROUPS", "2")
        x, ws, bs, h, dh = self._setup(h=8, dh=16)

        def loss(x, wq, wk, wv, bq, bk, bv):
            return jnp.sum(fused_qkv_mha(x, wq, wk, wv, bq, bk, bv, h)
                           ** 2)

        g1 = self._grads(x, ws, bs, h, loss)
        monkeypatch.delenv("PIGEON_FUSED_BWD_GROUPS")
        g2 = self._grads(x, ws, bs, h, loss)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-4)

    def test_group_picker_respects_lane_constraint(self):
        """Mosaic requires a block's last dim be 128-divisible or equal
        the full array dim (g16 FAILED lowering on hardware in r5:
        weight block (D, 64)). Under TP the kernel sees LOCAL heads,
        so the static defaults must degrade: e.g. the bwd default g8
        at 8 local heads (tp=2) would emit 64-wide blocks."""
        from pigeon_tpu.kernels.flash_attention import _pick_groups

        fwd = lambda h: _pick_groups(4, (2, 1), h, 64)
        bwd = lambda h: _pick_groups(8, (8, 4, 2, 1), h, 64)
        # flagship single-chip (16 heads, dh 64): measured optima hold
        assert fwd(16) == 4 and bwd(16) == 8
        # tp=2 (8 local heads): g8 would be 64-wide -> bwd degrades
        assert fwd(8) == 4 and bwd(8) == 4
        # tp=4 (4 local heads): both degrade to 128-wide blocks
        assert fwd(4) == 2 and bwd(4) == 2
        # tp=8 (2 local heads): only the full-width single block is
        # legal (gw == p == 128 happens at g1)
        assert fwd(2) == 1 and bwd(2) == 1
        assert fwd(1) == 1 and bwd(1) == 1
        # tiny CPU-test shapes (dh 16): full-width block
        assert _pick_groups(4, (2, 1), 4, 16) == 1
        # explicit operator pref is honored on divisibility alone
        assert _pick_groups(16, (8, 4, 2, 1), 16, 64,
                            honor_pref=True) == 16

    def test_default_groups_tiny_shapes(self, monkeypatch):
        """Without the module fixture's explicit group pins, tiny
        (dh=16) shapes resolve to the degenerate single-group block
        (gw == p) — forward and backward must still be exact."""
        from pigeon_tpu.kernels.flash_attention import fused_qkv_mha

        monkeypatch.delenv("PIGEON_FUSED_GROUPS", raising=False)
        monkeypatch.delenv("PIGEON_FUSED_BWD_GROUPS", raising=False)
        monkeypatch.setenv("PIGEON_FUSED_BWD", "kernel")
        x, ws, bs, h, dh = self._setup(s=64)

        def loss(x, wq, wk, wv, bq, bk, bv):
            return jnp.sum(fused_qkv_mha(x, wq, wk, wv, bq, bk, bv, h)
                           ** 2)

        def loss_ref(x, wq, wk, wv, bq, bk, bv):
            return jnp.sum(
                self._reference(x, (wq, wk, wv), (bq, bk, bv), h, dh)
                ** 2)

        g1 = self._grads(x, ws, bs, h, loss)
        g2 = self._grads(x, ws, bs, h, loss_ref)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4)

    def test_bf16(self, monkeypatch):
        from pigeon_tpu.kernels.flash_attention import fused_qkv_mha

        x, ws, bs, h, dh = self._setup(s=64)
        xb = x.astype(jnp.bfloat16)
        wsb = [w.astype(jnp.bfloat16) for w in ws]
        bsb = [b.astype(jnp.bfloat16) for b in bs]

        def loss(x, wq, wk, wv, bq, bk, bv):
            return jnp.sum(fused_qkv_mha(x, wq, wk, wv, bq, bk, bv, h)
                           .astype(jnp.float32) ** 2)

        monkeypatch.setenv("PIGEON_FUSED_BWD", "xla")
        g_xla = jax.grad(loss, argnums=tuple(range(7)))(xb, *wsb, *bsb)
        monkeypatch.setenv("PIGEON_FUSED_BWD", "kernel")
        g_kern = jax.grad(loss, argnums=tuple(range(7)))(xb, *wsb, *bsb)
        for a, b in zip(g_kern, g_xla):
            np.testing.assert_allclose(
                np.asarray(a, dtype=np.float32),
                np.asarray(b, dtype=np.float32), atol=0.12, rtol=0.05)


class TestFusedLNQKV:
    """`fused_ln_qkv_mha`: LayerNorm folded into the fused QKV kernel
    must match nn.LayerNorm + dense projections + attention."""

    EPS = 1e-5

    def _setup(self, b=2, s=64, h=4, dh=16):
        d = h * dh
        x = jnp.asarray(RNG.normal(size=(b, s, d)).astype(np.float32))
        ls = jnp.asarray(1.0 + RNG.normal(size=(d,)).astype(np.float32)
                         * .1)
        lb = jnp.asarray(RNG.normal(size=(d,)).astype(np.float32) * .1)
        ws = [jnp.asarray(RNG.normal(size=(d, d)).astype(np.float32) * .1)
              for _ in range(3)]
        bs = [jnp.asarray(RNG.normal(size=(d,)).astype(np.float32) * .1)
              for _ in range(3)]
        return x, ls, lb, ws, bs, h, dh

    def _reference(self, x, ls, lb, ws, bs, h, dh):
        import flax.linen as nn

        b, s, d = x.shape
        xn = nn.LayerNorm(epsilon=self.EPS).apply(
            {"params": {"scale": ls, "bias": lb}}, x)
        q, k, v = ((xn @ w + bb).reshape(b, s, h, dh)
                   for w, bb in zip(ws, bs))
        return xla_mha(q, k, v).reshape(b, s, d)

    @pytest.mark.parametrize("s", [64, 100, 577])
    def test_matches_layernorm_plus_dense(self, s):
        from pigeon_tpu.kernels.flash_attention import fused_ln_qkv_mha

        x, ls, lb, ws, bs, h, dh = self._setup(s=s)
        got = np.asarray(fused_ln_qkv_mha(x, ls, lb, *ws, *bs, h,
                                          self.EPS))
        want = np.asarray(self._reference(x, ls, lb, ws, bs, h, dh))
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_grads_match_separate_path(self):
        from pigeon_tpu.kernels.flash_attention import fused_ln_qkv_mha

        x, ls, lb, ws, bs, h, dh = self._setup(s=80)

        def loss_fused(x, ls, lb, wq, wk, wv, bq, bk, bv):
            return jnp.sum(fused_ln_qkv_mha(
                x, ls, lb, wq, wk, wv, bq, bk, bv, h, self.EPS) ** 2)

        def loss_ref(x, ls, lb, wq, wk, wv, bq, bk, bv):
            return jnp.sum(self._reference(
                x, ls, lb, (wq, wk, wv), (bq, bk, bv), h, dh) ** 2)

        args = (x, ls, lb, *ws, *bs)
        g1 = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
        g2 = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4)

    def test_vision_tower_ln_fused_matches_flash(self):
        """attn_impl='flash_fused_ln' must init the SAME param tree
        (`_LayerNormParams` keeps the ln1 {scale, bias} names) and
        match the separate-LN tower."""
        from pigeon_tpu.config import VisionConfig
        from pigeon_tpu.models.clip import CLIPVisionTower

        cfg = VisionConfig(image_size=32, patch_size=8, hidden_size=32,
                           intermediate_size=64, num_layers=2,
                           num_heads=4)
        x = jnp.asarray(RNG.normal(size=(2, 32, 32, 3)).astype(np.float32))
        tower_flash = CLIPVisionTower(cfg, attn_impl="flash")
        params = tower_flash.init(jax.random.PRNGKey(0), x)
        tower_ln = CLIPVisionTower(cfg, attn_impl="flash_fused_ln")
        ln_params = tower_ln.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(ln_params))

        last_f, pooled_f = tower_flash.apply(params, x)
        last_l, pooled_l = tower_ln.apply(params, x)
        np.testing.assert_allclose(np.asarray(last_l),
                                   np.asarray(last_f), atol=5e-5)
        np.testing.assert_allclose(np.asarray(pooled_l),
                                   np.asarray(pooled_f), atol=5e-5)

    def test_tower_grads_match_flash(self):
        """Training viability: d(loss)/d(params) through the LN-fused
        tower matches the separate-LN flash tower."""
        from pigeon_tpu.config import VisionConfig
        from pigeon_tpu.models.clip import CLIPVisionTower

        cfg = VisionConfig(image_size=32, patch_size=8, hidden_size=32,
                           intermediate_size=64, num_layers=2,
                           num_heads=4)
        x = jnp.asarray(RNG.normal(size=(2, 32, 32, 3)).astype(np.float32))
        tower_flash = CLIPVisionTower(cfg, attn_impl="flash")
        tower_ln = CLIPVisionTower(cfg, attn_impl="flash_fused_ln")
        params = tower_flash.init(jax.random.PRNGKey(0), x)["params"]

        def loss(tower, p):
            last, pooled = tower.apply({"params": p}, x)
            return jnp.sum(pooled ** 2) + jnp.sum(last ** 2)

        g_f = jax.grad(lambda p: loss(tower_flash, p))(params)
        g_l = jax.grad(lambda p: loss(tower_ln, p))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_f),
                        jax.tree_util.tree_leaves(g_l)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4)


class TestFusedBlock:
    """`fused_block_attention`: LN1 + QKV + attention + out-projection
    + residual in one kernel must match the separate composition."""

    EPS = 1e-5

    def _setup(self, b=2, s=64, h=4, dh=16):
        d = h * dh
        x = jnp.asarray(RNG.normal(size=(b, s, d)).astype(np.float32))
        ls = jnp.asarray(1.0 + RNG.normal(size=(d,)).astype(np.float32)
                         * .1)
        lb = jnp.asarray(RNG.normal(size=(d,)).astype(np.float32) * .1)
        ws = [jnp.asarray(RNG.normal(size=(d, d)).astype(np.float32)
                          * .1) for _ in range(4)]
        bs = [jnp.asarray(RNG.normal(size=(d,)).astype(np.float32)
                          * .1) for _ in range(4)]
        return x, ls, lb, ws, bs, h, dh

    def _reference(self, x, ls, lb, ws, bs, h, dh):
        import flax.linen as nn

        b, s, d = x.shape
        xn = nn.LayerNorm(epsilon=self.EPS).apply(
            {"params": {"scale": ls, "bias": lb}}, x)
        q, k, v = ((xn @ w + bb).reshape(b, s, h, dh)
                   for w, bb in zip(ws[:3], bs[:3]))
        ao = xla_mha(q, k, v).reshape(b, s, d)
        return x + (ao @ ws[3] + bs[3])

    @pytest.mark.parametrize("s", [64, 100, 577])
    def test_matches_separate_composition(self, s):
        from pigeon_tpu.kernels.flash_attention import (
            fused_block_attention,
        )

        x, ls, lb, ws, bs, h, dh = self._setup(s=s)
        got = np.asarray(fused_block_attention(
            x, ls, lb, ws[0], ws[1], ws[2], bs[0], bs[1], bs[2], ws[3],
            bs[3], h, self.EPS))
        want = np.asarray(self._reference(x, ls, lb, ws, bs, h, dh))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_grads_match_separate_composition(self):
        from pigeon_tpu.kernels.flash_attention import (
            fused_block_attention,
        )

        x, ls, lb, ws, bs, h, dh = self._setup(s=80)

        def loss_fused(x, ls, lb, wq, wk, wv, bq, bk, bv, wo, bo):
            return jnp.sum(fused_block_attention(
                x, ls, lb, wq, wk, wv, bq, bk, bv, wo, bo, h,
                self.EPS) ** 2)

        def loss_ref(x, ls, lb, wq, wk, wv, bq, bk, bv, wo, bo):
            return jnp.sum(self._reference(
                x, ls, lb, (wq, wk, wv, wo), (bq, bk, bv, bo), h, dh)
                ** 2)

        args = (x, ls, lb, ws[0], ws[1], ws[2], bs[0], bs[1], bs[2],
                ws[3], bs[3])
        g1 = jax.grad(loss_fused, argnums=tuple(range(11)))(*args)
        g2 = jax.grad(loss_ref, argnums=tuple(range(11)))(*args)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3)

    def test_vision_tower_block_fused_matches_flash(self):
        """attn_impl='flash_fused_block' (two-Pallas-program layers)
        must init the SAME param tree and match the separate tower."""
        from pigeon_tpu.config import VisionConfig
        from pigeon_tpu.models.clip import CLIPVisionTower

        cfg = VisionConfig(image_size=32, patch_size=8, hidden_size=64,
                           intermediate_size=128, num_layers=2,
                           num_heads=4, projection_dim=32)
        x = jnp.asarray(RNG.normal(size=(2, 32, 32, 3)).astype(np.float32))
        tower_flash = CLIPVisionTower(cfg, attn_impl="flash")
        params = tower_flash.init(jax.random.PRNGKey(0), x)
        tower_blk = CLIPVisionTower(cfg, attn_impl="flash_fused_block")
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(
                    tower_blk.init(jax.random.PRNGKey(0), x)))

        last_f, pooled_f = tower_flash.apply(params, x)
        last_b, pooled_b = tower_blk.apply(params, x)
        np.testing.assert_allclose(np.asarray(last_b),
                                   np.asarray(last_f), atol=1e-4)
        np.testing.assert_allclose(np.asarray(pooled_b),
                                   np.asarray(pooled_f), atol=1e-4)

    def test_tower_grads_match_flash(self):
        from pigeon_tpu.config import VisionConfig
        from pigeon_tpu.models.clip import CLIPVisionTower

        cfg = VisionConfig(image_size=32, patch_size=8, hidden_size=64,
                           intermediate_size=128, num_layers=2,
                           num_heads=4, projection_dim=32)
        x = jnp.asarray(RNG.normal(size=(2, 32, 32, 3)).astype(np.float32))
        tower_flash = CLIPVisionTower(cfg, attn_impl="flash")
        tower_blk = CLIPVisionTower(cfg, attn_impl="flash_fused_block")
        params = tower_flash.init(jax.random.PRNGKey(0), x)["params"]

        def loss(tower, p):
            last, pooled = tower.apply({"params": p}, x)
            return jnp.sum(pooled ** 2) + jnp.sum(last ** 2)

        g_f = jax.grad(lambda p: loss(tower_flash, p))(params)
        g_b = jax.grad(lambda p: loss(tower_blk, p))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_f),
                        jax.tree_util.tree_leaves(g_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3)

    def test_static_int8_tower_block_impl_routes_to_int8_kernels(self):
        """quant='static' + 'flash_fused_block' degrades to the int8
        fused QKV + int8 fused MLP combination (same tree, output
        within quantization-flip noise of the QuantDense path)."""
        from pigeon_tpu.config import VisionConfig
        from pigeon_tpu.models.clip import CLIPVisionTower
        from pigeon_tpu.models.quant import quantize_and_calibrate

        cfg = VisionConfig(image_size=32, patch_size=8, hidden_size=64,
                           intermediate_size=128, num_layers=2,
                           num_heads=4, projection_dim=32)
        px = jnp.asarray(RNG.normal(size=(2, 32, 32, 3)).astype(np.float32))
        f32 = CLIPVisionTower(cfg, dtype=jnp.float32)
        params = jax.jit(f32.init)(jax.random.PRNGKey(1), px)["params"]
        dyn = CLIPVisionTower(cfg, dtype=jnp.float32, quant=True)
        qparams = quantize_and_calibrate(dyn, params, px)

        sep = CLIPVisionTower(cfg, dtype=jnp.float32, quant="static",
                              attn_impl="flash")
        blk = CLIPVisionTower(cfg, dtype=jnp.float32, quant="static",
                              attn_impl="flash_fused_block")
        assert (jax.tree_util.tree_structure(
                    jax.jit(blk.init)(jax.random.PRNGKey(2),
                                      px)["params"])
                == jax.tree_util.tree_structure(
                    jax.jit(sep.init)(jax.random.PRNGKey(2),
                                      px)["params"]))
        want_h, want_p = sep.apply({"params": qparams}, px)
        got_h, got_p = blk.apply({"params": qparams}, px)
        for got, want in ((got_h, want_h), (got_p, want_p)):
            err = np.abs(np.asarray(got) - np.asarray(want))
            assert err.max() < 5e-2
            assert (err > 5e-4).mean() < 5e-3


class TestFusedQKVInt8:
    """`fused_qkv_mha_int8`: int8 projections inside the kernel must
    reproduce QuantDense(static) + attention exactly."""

    def _setup(self, b=2, s=64, h=4, dh=16):
        from pigeon_tpu.models.quant import quantize_channelwise

        d = h * dh
        x = jnp.asarray(RNG.normal(size=(b, s, d)).astype(np.float32) * .5)
        packs = []
        for _ in range(3):
            w = RNG.normal(size=(d, d)).astype(np.float32) * .1
            w_q, s_w = quantize_channelwise(jnp.asarray(w))
            bias = jnp.asarray(RNG.normal(size=(d,)).astype(np.float32)
                               * .1)
            packs.append((w_q, s_w, bias))
        act_scale = jnp.float32(float(jnp.abs(x).max()) / 127.0)
        return x, packs, act_scale, h, dh

    @staticmethod
    def _reference(x, packs, act_scale, h, dh):
        """QuantDense static-mode math + xla attention (int values up
        to 127*127*D stay exactly representable in f32)."""
        b, s, d = x.shape
        x_q = jnp.clip(jnp.round(x / act_scale), -127, 127)
        qkv = []
        for w_q, s_w, bias in packs:
            y = x_q @ w_q.astype(jnp.float32)
            qkv.append((y * (act_scale * s_w) + bias).reshape(b, s, h, dh))
        return xla_mha(*qkv).reshape(b, s, d)

    @pytest.mark.parametrize("s", [64, 100, 577])
    def test_matches_quantdense_static_math(self, s):
        from pigeon_tpu.kernels.flash_attention import fused_qkv_mha_int8

        x, packs, act_scale, h, dh = self._setup(s=s)
        args = [a for p in packs for a in p]
        got = np.asarray(fused_qkv_mha_int8(x, act_scale, *args, h))
        want = np.asarray(self._reference(x, packs, act_scale, h, dh))
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_static_tower_fused_matches_separate_projections(self):
        """quant='static' + attn_impl='flash_fused' must (a) init the
        SAME param tree as the QuantDense path and (b) match its output
        (q/k/v act scales are identical after calibration — same input
        — so the shared-scale fused quantize is the same quantize)."""
        from pigeon_tpu.config import VisionConfig
        from pigeon_tpu.models.clip import CLIPVisionTower
        from pigeon_tpu.models.quant import quantize_and_calibrate

        cfg = VisionConfig(image_size=32, patch_size=8, hidden_size=64,
                           intermediate_size=128, num_layers=2,
                           num_heads=4, projection_dim=32)
        px = jnp.asarray(RNG.normal(size=(2, 32, 32, 3)).astype(np.float32))
        f32 = CLIPVisionTower(cfg, dtype=jnp.float32)
        params = jax.jit(f32.init)(jax.random.PRNGKey(1), px)["params"]
        dyn = CLIPVisionTower(cfg, dtype=jnp.float32, quant=True)
        qparams = quantize_and_calibrate(dyn, params, px)

        sep = CLIPVisionTower(cfg, dtype=jnp.float32, quant="static",
                              attn_impl="flash")
        fused = CLIPVisionTower(cfg, dtype=jnp.float32, quant="static",
                                attn_impl="flash_fused")
        fused_tree = jax.jit(fused.init)(jax.random.PRNGKey(2),
                                         px)["params"]
        sep_tree = jax.jit(sep.init)(jax.random.PRNGKey(2), px)["params"]
        assert (jax.tree_util.tree_structure(fused_tree)
                == jax.tree_util.tree_structure(sep_tree))

        want_h, want_p = sep.apply({"params": qparams}, px)
        got_h, got_p = fused.apply({"params": qparams}, px)
        np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                                   atol=5e-5)


class TestFusedBlockInt8:
    """`fused_block_attention_int8`: whole-weights-resident int8 block
    must match LN -> QuantDense(static) QKV -> attention ->
    QuantDense(static) out-proj -> residual within quantization-flip
    noise (in-kernel exp may differ from XLA by an ulp at round()
    boundaries of the out-projection quantize)."""

    EPS = 1e-5

    def _setup(self, b=2, s=64, h=4, dh=16):
        from pigeon_tpu.models.quant import quantize_channelwise

        d = h * dh
        x = jnp.asarray(RNG.normal(size=(b, s, d)).astype(np.float32))
        ls = jnp.asarray(1.0 + RNG.normal(size=(d,)).astype(np.float32)
                         * .1)
        lb = jnp.asarray(RNG.normal(size=(d,)).astype(np.float32) * .1)
        packs = []
        for _ in range(4):
            w_q, s_w = quantize_channelwise(jnp.asarray(
                RNG.normal(size=(d, d)).astype(np.float32) * .1))
            bias = jnp.asarray(RNG.normal(size=(d,)).astype(np.float32)
                               * .1)
            packs.append((w_q, s_w, bias))
        return x, ls, lb, packs, jnp.float32(0.05), jnp.float32(0.01), h

    def _reference(self, x, ls, lb, packs, aqkv, ao, h):
        import flax.linen as nn

        b, s, d = x.shape
        dh = d // h

        def qdense(y, a, w_q, s_w, bias):
            y_q = jnp.clip(jnp.round(y / a), -127, 127)
            return y_q @ w_q.astype(jnp.float32) * (a * s_w) + bias

        xn = nn.LayerNorm(epsilon=self.EPS).apply(
            {"params": {"scale": ls, "bias": lb}}, x)
        q, k, v = (qdense(xn, aqkv, *p).reshape(b, s, h, dh)
                   for p in packs[:3])
        ao_t = xla_mha(q, k, v).reshape(b, s, d)
        return x + qdense(ao_t, ao, *packs[3])

    @pytest.mark.parametrize("s", [64, 577])
    def test_matches_quantdense_composition(self, s):
        from pigeon_tpu.kernels.flash_attention import (
            fused_block_attention_int8,
        )

        x, ls, lb, packs, aqkv, ao, h = self._setup(s=s)
        flat = [a for p in packs[:3] for a in p]
        got = np.asarray(fused_block_attention_int8(
            x, ls, lb, aqkv, *flat, ao, *packs[3], h, self.EPS))
        want = np.asarray(self._reference(x, ls, lb, packs, aqkv, ao,
                                          h))
        _, s2, _ = packs[3]
        lsb = float(ao * jnp.max(s2) * 127)
        err = np.abs(got - want)
        assert err.max() <= 1.5 * lsb + 2e-4
        assert (err > 2e-4).mean() < 5e-3


class TestModelIntegration:
    def test_vision_tower_flash_matches_xla(self):
        from pigeon_tpu.config import VisionConfig
        from pigeon_tpu.models.clip import CLIPVisionTower

        cfg = VisionConfig(image_size=32, patch_size=8, hidden_size=32,
                           intermediate_size=64, num_layers=2, num_heads=4)
        x = jnp.asarray(RNG.normal(size=(2, 32, 32, 3)).astype(np.float32))
        tower_xla = CLIPVisionTower(cfg, attn_impl="xla")
        params = tower_xla.init(jax.random.PRNGKey(0), x)
        tower_flash = CLIPVisionTower(cfg, attn_impl="flash")
        last_x, pooled_x = tower_xla.apply(params, x)
        last_f, pooled_f = tower_flash.apply(params, x)
        np.testing.assert_allclose(np.asarray(last_f), np.asarray(last_x),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(pooled_f),
                                   np.asarray(pooled_x), atol=5e-5)

    def test_vision_tower_flash_fused_matches_xla(self):
        """attn_impl='flash_fused' must consume the SAME param tree
        (the `_DenseParams` twin keeps q/k/v_proj names) and match."""
        from pigeon_tpu.config import VisionConfig
        from pigeon_tpu.models.clip import CLIPVisionTower

        cfg = VisionConfig(image_size=32, patch_size=8, hidden_size=32,
                           intermediate_size=64, num_layers=2, num_heads=4)
        x = jnp.asarray(RNG.normal(size=(2, 32, 32, 3)).astype(np.float32))
        tower_xla = CLIPVisionTower(cfg, attn_impl="xla")
        params = tower_xla.init(jax.random.PRNGKey(0), x)
        tower_fused = CLIPVisionTower(cfg, attn_impl="flash_fused")
        # identical tree structure from both init paths
        fused_params = tower_fused.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(fused_params))
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(fused_params)):
            assert a.shape == b.shape

        last_x, pooled_x = tower_xla.apply(params, x)
        last_f, pooled_f = tower_fused.apply(params, x)
        np.testing.assert_allclose(np.asarray(last_f), np.asarray(last_x),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(pooled_f),
                                   np.asarray(pooled_x), atol=5e-5)


class TestShardedMha:
    """`sharded_mha` — the Manual-mesh (shard_map) hosting of the
    Pallas attention kernel that a multi-chip deployment needs (a
    plain GSPMD jit rejects pallas_call with sharded avals; see
    docs/SHARDING.md). Attention is embarrassingly parallel over
    (batch, head), so the wrapper must match XLA attention exactly
    with NO collectives on a DP x TP mesh."""

    def test_matches_xla_on_dp_tp_mesh(self):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from pigeon_tpu.kernels.flash_attention import (
            _xla_attention_bshd,
            sharded_mha,
        )

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device virtual mesh")
        B, S, H, Dh = 8, 32, 4, 16
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(k1, (B, S, H, Dh), jnp.float32)
        k = jax.random.normal(k2, (B, S, H, Dh), jnp.float32)
        v = jax.random.normal(k3, (B, S, H, Dh), jnp.float32)

        mesh = Mesh(np.array(jax.devices()).reshape(4, 2),
                    ("data", "model"))
        spec = P("data", None, "model", None)
        args = [jax.device_put(t, NamedSharding(mesh, spec))
                for t in (q, k, v)]
        out = np.asarray(jax.jit(
            lambda a, b, c: sharded_mha(a, b, c, mesh))(*args))

        def fold(x):
            return jnp.swapaxes(x, 1, 2).reshape(B * H, S, Dh)

        want = np.asarray(jnp.swapaxes(
            _xla_attention_bshd(fold(q), fold(k), fold(v))
            .reshape(B, H, S, Dh), 1, 2))
        np.testing.assert_allclose(out, want, atol=2e-5)

    def test_ragged_batch_drops_batch_axis(self):
        # evaluate's tail batch (B=3 on a dp=4 mesh) must not error:
        # the wrapper replicates the non-divisible dimension instead.
        from jax.sharding import Mesh

        from pigeon_tpu.kernels.flash_attention import (
            _xla_attention_bshd,
            sharded_mha,
        )

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device virtual mesh")
        B, S, H, Dh = 3, 16, 4, 8
        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        q, k, v = (jax.random.normal(kk, (B, S, H, Dh), jnp.float32)
                   for kk in ks)
        mesh = Mesh(np.array(jax.devices()).reshape(4, 2),
                    ("data", "model"))
        out = np.asarray(jax.jit(
            lambda a, b, c: sharded_mha(a, b, c, mesh))(q, k, v))

        def fold(x):
            return jnp.swapaxes(x, 1, 2).reshape(B * H, S, Dh)

        want = np.asarray(jnp.swapaxes(
            _xla_attention_bshd(fold(q), fold(k), fold(v))
            .reshape(B, H, S, Dh), 1, 2))
        np.testing.assert_allclose(out, want, atol=2e-5)

    def test_flash_tower_under_registered_mesh_matches_xla(self):
        """The production multi-chip path: attn_impl='flash' with the
        attention mesh registered (as `create_mesh` does on multi-chip
        TPU) and GSPMD-sharded pixel inputs — the tower must match the
        XLA tower. This is exactly the configuration a pod runs."""
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        from pigeon_tpu.config import VisionConfig
        from pigeon_tpu.kernels import flash_attention as fa
        from pigeon_tpu.models.clip import CLIPVisionTower

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device virtual mesh")
        cfg = VisionConfig(image_size=32, patch_size=8, hidden_size=32,
                           intermediate_size=64, num_layers=2,
                           num_heads=4)
        x = jnp.asarray(RNG.normal(size=(8, 32, 32, 3))
                        .astype(np.float32))
        tower_xla = CLIPVisionTower(cfg, attn_impl="xla")
        params = jax.jit(tower_xla.init)(jax.random.PRNGKey(0), x)
        last_x, pooled_x = jax.jit(tower_xla.apply)(params, x)

        mesh = Mesh(np.array(jax.devices()).reshape(4, 2),
                    ("data", "model"))
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        tower_flash = CLIPVisionTower(cfg, attn_impl="flash")
        with fa.attention_mesh(mesh):
            last_f, pooled_f = jax.jit(tower_flash.apply)(params, xs)
        assert fa.get_attention_mesh() is None  # context restored
        np.testing.assert_allclose(np.asarray(last_f),
                                   np.asarray(last_x), atol=5e-5)
        np.testing.assert_allclose(np.asarray(pooled_f),
                                   np.asarray(pooled_x), atol=5e-5)

    @pytest.mark.parametrize("bwd", ["xla", "kernel"])
    def test_fused_tower_under_registered_mesh_matches_xla(
            self, bwd, monkeypatch):
        """flash_fused under the registry: the fused QKV kernel runs
        per-shard on its local Megatron-split heads (sharded_fused_
        qkv_mha). Forward AND gradients must match the XLA tower —
        the grad check exercises shard_map's transpose psum of the
        replicated x block. Parametrized over PIGEON_FUSED_BWD so the
        fused BACKWARD kernel is certified under shard_map too (the
        multi-chip train path inherits whatever the env selects)."""
        monkeypatch.setenv("PIGEON_FUSED_BWD", bwd)
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        from pigeon_tpu.config import VisionConfig
        from pigeon_tpu.kernels import flash_attention as fa
        from pigeon_tpu.models.clip import CLIPVisionTower

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device virtual mesh")
        cfg = VisionConfig(image_size=32, patch_size=8, hidden_size=32,
                           intermediate_size=64, num_layers=2,
                           num_heads=4)
        x = jnp.asarray(RNG.normal(size=(8, 32, 32, 3))
                        .astype(np.float32))
        tower_xla = CLIPVisionTower(cfg, attn_impl="xla")
        params = jax.jit(tower_xla.init)(jax.random.PRNGKey(0), x)

        def loss_of(tower, p, px):
            _, pooled = tower.apply(p, px)
            return jnp.sum(pooled.astype(jnp.float32) ** 2)

        want_l, want_g = jax.value_and_grad(
            lambda p: loss_of(tower_xla, p, x))(params)

        mesh = Mesh(np.array(jax.devices()).reshape(4, 2),
                    ("data", "model"))
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        tower_fused = CLIPVisionTower(cfg, attn_impl="flash_fused")
        with fa.attention_mesh(mesh):
            got_l, got_g = jax.jit(jax.value_and_grad(
                lambda p: loss_of(tower_fused, p, xs)))(params)
        np.testing.assert_allclose(float(got_l), float(want_l),
                                   rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(got_g),
                        jax.tree_util.tree_leaves(want_g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)


class TestShardedFusedQKVInt8:
    """`sharded_fused_qkv_mha_int8` — the shard_map hosting that keeps
    the VALIDATED int8 serving route (`_quant_attn_impl` ->
    'flash_fused', r4: 565.9 vs 434.1 img/s, Mosaic parity err 0.0)
    uniform across chip counts. Same Megatron head-split layout as the
    bf16 hosting; the per-tensor act quantize is recomputed per shard
    on the replicated x (deterministic round/clip -> identical x_q)."""

    def _setup(self, b=8, s=32, h=4, dh=16):
        from pigeon_tpu.models.quant import quantize_channelwise

        d = h * dh
        x = jnp.asarray(RNG.normal(size=(b, s, d)).astype(np.float32)
                        * .5)
        packs = []
        for _ in range(3):
            w = RNG.normal(size=(d, d)).astype(np.float32) * .1
            w_q, s_w = quantize_channelwise(jnp.asarray(w))
            bias = jnp.asarray(
                RNG.normal(size=(d,)).astype(np.float32) * .1)
            packs.append((w_q, s_w, bias))
        act_scale = jnp.float32(float(jnp.abs(x).max()) / 127.0)
        return x, packs, act_scale, h, dh

    def test_matches_single_kernel_on_dp_tp_mesh(self):
        from jax.sharding import Mesh

        from pigeon_tpu.kernels.flash_attention import (
            fused_qkv_mha_int8,
            sharded_fused_qkv_mha_int8,
        )

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device virtual mesh")
        x, packs, act_scale, h, dh = self._setup()
        args = [a for p in packs for a in p]
        want = np.asarray(fused_qkv_mha_int8(x, act_scale, *args, h))
        mesh = Mesh(np.array(jax.devices()).reshape(4, 2),
                    ("data", "model"))
        got = np.asarray(jax.jit(
            lambda xx, *rest: sharded_fused_qkv_mha_int8(
                xx, act_scale, *rest, h, mesh))(x, *args))
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_ragged_batch_and_odd_heads_drop_axes(self):
        # B=3 on dp=4 and h=3 on tp=2: both axes must degrade to
        # replicated instead of erroring (evaluate's tail batch).
        from jax.sharding import Mesh

        from pigeon_tpu.kernels.flash_attention import (
            fused_qkv_mha_int8,
            sharded_fused_qkv_mha_int8,
        )

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device virtual mesh")
        x, packs, act_scale, h, dh = self._setup(b=3, h=3, dh=16)
        args = [a for p in packs for a in p]
        want = np.asarray(fused_qkv_mha_int8(x, act_scale, *args, h))
        mesh = Mesh(np.array(jax.devices()).reshape(4, 2),
                    ("data", "model"))
        got = np.asarray(jax.jit(
            lambda xx, *rest: sharded_fused_qkv_mha_int8(
                xx, act_scale, *rest, h, mesh))(x, *args))
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_static_int8_tower_under_registered_mesh(self):
        """The production multi-chip serving path: quant='static' +
        attn_impl='flash_fused' with the attention mesh registered and
        GSPMD-sharded pixels must match the unregistered tower."""
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        from pigeon_tpu.config import VisionConfig
        from pigeon_tpu.kernels import flash_attention as fa
        from pigeon_tpu.models.clip import CLIPVisionTower
        from pigeon_tpu.models.quant import quantize_and_calibrate

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device virtual mesh")
        cfg = VisionConfig(image_size=32, patch_size=8, hidden_size=64,
                           intermediate_size=128, num_layers=2,
                           num_heads=4, projection_dim=32)
        px = jnp.asarray(RNG.normal(size=(8, 32, 32, 3))
                         .astype(np.float32))
        f32 = CLIPVisionTower(cfg, dtype=jnp.float32)
        params = jax.jit(f32.init)(jax.random.PRNGKey(1), px)["params"]
        dyn = CLIPVisionTower(cfg, dtype=jnp.float32, quant=True)
        qparams = quantize_and_calibrate(dyn, params, px)

        tower = CLIPVisionTower(cfg, dtype=jnp.float32, quant="static",
                                attn_impl="flash_fused")
        want_h, want_p = jax.jit(tower.apply)({"params": qparams}, px)

        mesh = Mesh(np.array(jax.devices()).reshape(4, 2),
                    ("data", "model"))
        pxs = jax.device_put(px, NamedSharding(mesh, P("data")))
        with fa.attention_mesh(mesh):
            got_h, got_p = jax.jit(tower.apply)({"params": qparams},
                                                pxs)
        np.testing.assert_allclose(np.asarray(got_h),
                                   np.asarray(want_h), atol=5e-5)
        np.testing.assert_allclose(np.asarray(got_p),
                                   np.asarray(want_p), atol=5e-5)
