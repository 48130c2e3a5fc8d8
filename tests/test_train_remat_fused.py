"""Train step x remat x fused-attention custom_vjp interplay.

scripts/bench_train.py runs the full train step under remat='full'
with the fused attention impls; this pins that graph structure
(jax.checkpoint + nn.scan + custom_vjp + checkpoint_name) on CPU
BEFORE a hardware session spends compile time on it.

Interpret-mode Pallas carries an OrderedIOEffect that
`jax.checkpoint` partial-eval rejects (NotImplementedError: Effects
not supported), so the Pallas ENTRY POINTS are monkeypatched with
exact XLA twins here — the kernels' numerics are pinned by
tests/test_flash_attention.py and tests/test_fused_mlp.py; this file
validates everything AROUND them: custom_vjp signatures under remat,
checkpoint_name placement (incl. the post-residual block output), and
loss/grad parity across impls.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

RNG = np.random.default_rng(32)


@pytest.fixture(autouse=True)
def xla_twins(monkeypatch):
    """Replace Pallas forwards/backwards with exact XLA equivalents."""
    from pigeon_tpu.kernels import flash_attention as fa
    from pigeon_tpu.kernels import fused_mlp as fm

    def flash_fwd(q, k, v):
        return fa._xla_attention_bshd(q, k, v)

    def flash_bwd(q, k, v, g):
        _, vjp = jax.vjp(fa._xla_attention_bshd, q, k, v)
        return vjp(g)

    def fused_qkv(x, wq, wk, wv, bq, bk, bv, num_heads, head_dim=None):
        b, s, d = x.shape
        dh = head_dim or d // num_heads

        def fold(t):
            return jnp.swapaxes(
                t.reshape(b, s, num_heads, dh), 1, 2) \
                .reshape(b * num_heads, s, dh)

        q, k, v = (fold((x @ w + bb).astype(x.dtype))
                   for w, bb in ((wq, bq), (wk, bk), (wv, bv)))
        out = fa._xla_attention_bshd(q, k, v)
        return jnp.swapaxes(
            out.reshape(b, num_heads, s, dh), 1, 2).reshape(b, s, d)

    def fused_ln_qkv(x, ls, lb, wq, wk, wv, bq, bk, bv, num_heads,
                     eps):
        xn = fa._layer_norm_f32(x, ls, lb, eps).astype(x.dtype)
        return fused_qkv(xn, wq, wk, wv, bq, bk, bv, num_heads)

    def fused_qkv_backward(x, wq, wk, wv, bq, bk, bv, g, num_heads,
                           head_dim=None):
        # XLA twin of the fused BACKWARD kernel (the PIGEON_FUSED_BWD
        # default since r5): same contract — (dx, dq_u, dk_u, dv_u)
        # cotangents with the weight/bias grads left to the caller.
        b, s, d = x.shape
        dh = head_dim if head_dim is not None else d // num_heads
        p = num_heads * dh

        def fold(t):
            return jnp.swapaxes(
                t.reshape(b, s, num_heads, dh), 1, 2) \
                .reshape(b * num_heads, s, dh)

        def unfold(t):
            return jnp.swapaxes(
                t.reshape(b, num_heads, s, dh), 1, 2).reshape(b, s, p)

        q, k, v = (fold((x @ w + bb).astype(x.dtype))
                   for w, bb in ((wq, bq), (wk, bk), (wv, bv)))
        _, vjp = jax.vjp(fa._xla_attention_bshd, q, k, v)
        dq, dk, dv = vjp(fold(g.astype(x.dtype)))
        dq_u, dk_u, dv_u = unfold(dq), unfold(dk), unfold(dv)
        dx = dq_u @ wq.T + dk_u @ wk.T + dv_u @ wv.T
        return dx, dq_u, dk_u, dv_u

    monkeypatch.setattr(fa, "_flash_forward", flash_fwd)
    monkeypatch.setattr(fa, "_flash_backward", flash_bwd)
    monkeypatch.setattr(fa, "_fused_qkv_forward", fused_qkv)
    monkeypatch.setattr(fa, "_fused_qkv_backward", fused_qkv_backward)
    monkeypatch.setattr(fa, "_fused_ln_qkv_forward", fused_ln_qkv)
    monkeypatch.setattr(
        fa, "_fused_block_attn_forward",
        lambda *a: fa._fused_block_reference(*a))
    monkeypatch.setattr(
        fm, "_fused_ln_mlp_forward",
        lambda *a: fm._reference_ln_mlp(*a))
    yield


def _tiny_setup(attn_impl, remat):
    import optax

    from pigeon_tpu.config import HeadConfig, VisionConfig
    from pigeon_tpu.models.super_guessr import SuperGuessr
    from pigeon_tpu.train import create_train_state
    from pigeon_tpu.train.train_loop import make_train_step

    vision = VisionConfig(image_size=32, patch_size=8, hidden_size=64,
                          intermediate_size=128, num_layers=2,
                          num_heads=4, projection_dim=32)
    head = HeadConfig(num_cells=11, embed_dim=32, panorama=False,
                      multi_task=True)
    model = SuperGuessr(vision, head, dtype=jnp.float32,
                        attn_impl=attn_impl, remat=remat)
    example = jnp.zeros((2, 32, 32, 3))
    # SGD(1.0): params_before - params_after == the raw gradient, so
    # the post-step comparison is a clean grad-parity check (AdamW's
    # first step pushes +-lr for ANY nonzero grad — sign-sensitive to
    # harmless ulp differences between impls).
    opt = optax.sgd(1.0)
    state = create_train_state(jax.random.PRNGKey(0), model, opt,
                               (example,))
    cells = np.stack([np.linspace(-170, 170, head.num_cells),
                      np.linspace(-55, 65, head.num_cells)],
                     -1).astype(np.float32)
    step = make_train_step(model, opt, head, cells)
    return state, step


def _batch(n=4):
    ks = jax.random.split(jax.random.PRNGKey(5), 7)
    return {
        "inputs": jax.random.normal(ks[0], (n, 32, 32, 3), jnp.float32),
        "labels": jnp.stack(
            [jax.random.uniform(ks[1], (n,), minval=-170, maxval=170),
             jax.random.uniform(ks[2], (n,), minval=-55, maxval=65)],
            -1),
        "labels_clf": jax.random.randint(ks[3], (n,), 0, 11),
        "labels_multi_task": jax.random.normal(ks[4], (n, 6)),
        "labels_climate": jax.random.randint(ks[5], (n,), 0, 28),
        "labels_month": jax.random.randint(ks[6], (n,), 0, 12),
    }


@pytest.mark.parametrize("attn_impl", ["flash_fused", "flash_fused_ln",
                                       "flash_fused_mlp",
                                       "flash_fused_block"])
def test_remat_train_step_matches_flash(attn_impl):
    batch = _batch()
    rng = jax.random.PRNGKey(7)

    base_state, base_step = _tiny_setup("flash", "full")
    base_state2, base_metrics = base_step(base_state, batch, rng)

    state, step = _tiny_setup(attn_impl, "full")
    state2, metrics = step(state, batch, rng)

    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(base_metrics["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(state2.params),
                    jax.tree_util.tree_leaves(base_state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4)


@pytest.mark.parametrize("attn_impl", ["flash_fused", "flash_fused_mlp",
                                       "flash_fused_block"])
def test_no_remat_train_step_matches_flash(attn_impl):
    """The step-6 HW A/B rows 'impl:none': dropping the outer
    jax.checkpoint must not change the training math — the fused
    custom_vjp layers rematerialize internally from the stored block
    inputs either way."""
    batch = _batch()
    rng = jax.random.PRNGKey(7)

    base_state, base_step = _tiny_setup("flash", "full")
    base_state2, base_metrics = base_step(base_state, batch, rng)

    state, step = _tiny_setup(attn_impl, "none")
    state2, metrics = step(state, batch, rng)

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(base_metrics["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(state2.params),
                    jax.tree_util.tree_leaves(base_state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4)


def test_attn_out_remat_policy_with_block_impl():
    """remat='attn_out' must still compile/run when the checkpoint
    name lands on the post-residual block output."""
    batch = _batch()
    state, step = _tiny_setup("flash_fused_block", "attn_out")
    _, metrics = step(state, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["loss"]))


def test_attn_kernel_remat_policy_matches_full(monkeypatch):
    """remat='attn_kernel' (r7: additionally saves the PRE-out-proj
    kernel output so the remat pass skips the fused QKV forward rerun
    the trace found under 'attn_out') must produce the SAME train step
    as remat='full' — the policy changes what's saved, never the math."""
    batch = _batch()
    rng = jax.random.PRNGKey(7)
    state_f, step_f = _tiny_setup("flash_fused", "full")
    state_k, step_k = _tiny_setup("flash_fused", "attn_kernel")
    out_f, m_f = step_f(state_f, batch, rng)
    out_k, m_k = step_k(state_k, batch, rng)
    np.testing.assert_allclose(float(m_k["loss"]), float(m_f["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(out_f.params),
                    jax.tree_util.tree_leaves(out_k.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5)


def test_finetune_build_defaults_to_attn_kernel_remat():
    """Guard the r7 default flip: build_finetune_model remats with
    'attn_kernel' (95.4 vs 88.4 img/s bs48 under the r5 'attn_out',
    same session — docs/PERF.md)."""
    import inspect

    from pigeon_tpu.train.modes import build_finetune_model

    sig = inspect.signature(build_finetune_model)
    assert sig.parameters["remat"].default == "attn_kernel"


def test_attn_slim_remat_policy_matches_full():
    """remat='attn_slim' (r8 candidate: save ONLY the pre-out-proj
    kernel output; the post-residual attention output is recomputed as
    x + out_proj(kernel_out) — one dense, still no kernel rerun) must
    produce the SAME train step as remat='full'."""
    batch = _batch()
    rng = jax.random.PRNGKey(7)
    state_f, step_f = _tiny_setup("flash_fused", "full")
    state_s, step_s = _tiny_setup("flash_fused", "attn_slim")
    out_f, m_f = step_f(state_f, batch, rng)
    out_s, m_s = step_s(state_s, batch, rng)
    np.testing.assert_allclose(float(m_s["loss"]), float(m_f["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(out_f.params),
                    jax.tree_util.tree_leaves(out_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5)


def test_remat_policy_names_block_fallback():
    """r8 review finding: under attn_impl='flash_fused_block' the
    out-projection+residual live INSIDE the kernel, so no
    'attn_kernel_out' tensor exists — 'attn_kernel'/'attn_slim' must
    fall back to saving the block output instead of silently matching
    nothing (= full remat)."""
    from pigeon_tpu.models.clip import _remat_policy_names

    assert _remat_policy_names("attn_out", "flash_fused") == ("attn_out",)
    assert _remat_policy_names("attn_kernel", "flash_fused") == (
        "attn_out", "attn_kernel_out")
    assert _remat_policy_names("attn_slim", "flash_fused") == (
        "attn_kernel_out",)
    for remat in ("attn_kernel", "attn_slim"):
        assert _remat_policy_names(remat, "flash_fused_block") == (
            "attn_out",)
    assert _remat_policy_names(True, "flash_fused") == ()
    assert _remat_policy_names("full", "flash_fused") == ()


def test_attn_kernel_remat_with_block_impl_matches_full():
    """The fallback policy must keep the math identical under the
    block kernel too."""
    batch = _batch()
    rng = jax.random.PRNGKey(7)
    state_f, step_f = _tiny_setup("flash_fused_block", "full")
    state_k, step_k = _tiny_setup("flash_fused_block", "attn_kernel")
    out_f, m_f = step_f(state_f, batch, rng)
    out_k, m_k = step_k(state_k, batch, rng)
    np.testing.assert_allclose(float(m_k["loss"]), float(m_f["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(out_f.params),
                    jax.tree_util.tree_leaves(out_k.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5)


def test_pigeon_remat_env_override(monkeypatch):
    """PIGEON_REMAT (r8) lets operators pick the remat policy from the
    CLI environment — e.g. 'attn_slim' (the memory knob) or 'full' —
    without touching code; unset keeps the measured default."""
    from pigeon_tpu.cli.run import _remat_override

    monkeypatch.delenv("PIGEON_REMAT", raising=False)
    assert _remat_override() == {}
    monkeypatch.setenv("PIGEON_REMAT", "attn_slim")
    assert _remat_override() == {"remat": "attn_slim"}
