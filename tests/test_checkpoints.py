"""Tests for Orbax checkpointing + resume (closing the reference's
unimplemented-resume gap, `run.py:166-175`)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pigeon_tpu.config import HeadConfig
from pigeon_tpu.models import GeocellHead
from pigeon_tpu.train import create_train_state, make_train_step
from pigeon_tpu.train.checkpoints import (
    latest_step,
    load_params_npz,
    restore_checkpoint,
    save_checkpoint,
    save_params_npz,
)
from pigeon_tpu.train.train_loop import adamw

RNG = np.random.default_rng(3)
CFG = HeadConfig(num_cells=9, embed_dim=16, smooth_labels=True)
CELLS = np.stack([np.linspace(-170, 170, 9),
                  np.linspace(-55, 65, 9)], -1).astype(np.float32)


def fresh_state():
    model = GeocellHead(CFG)
    opt = adamw(1e-3)
    state = create_train_state(
        jax.random.PRNGKey(0), model, opt, (jnp.zeros((2, 16)),))
    return model, opt, state


def one_batch():
    return {
        "inputs": jnp.asarray(RNG.normal(size=(4, 16)).astype(np.float32)),
        "labels": jnp.asarray(np.stack(
            [RNG.uniform(-180, 180, 4), RNG.uniform(-60, 70, 4)],
            -1).astype(np.float32)),
    }


class TestCheckpointing:
    def test_save_restore_roundtrip(self, tmp_path):
        model, opt, state = fresh_state()
        step = make_train_step(model, opt, CFG, CELLS, donate=False)
        state, _ = step(state, one_batch(), jax.random.PRNGKey(1))
        state, _ = step(state, one_batch(), jax.random.PRNGKey(2))

        ckpt_dir = str(tmp_path / "ckpt")
        save_checkpoint(ckpt_dir, state)
        assert latest_step(ckpt_dir) == 2

        _, _, blank = fresh_state()
        restored = restore_checkpoint(ckpt_dir, blank)
        assert int(restored.step) == 2
        jax.tree_util.tree_map(
            np.testing.assert_array_equal, restored.params, state.params)
        jax.tree_util.tree_map(
            np.testing.assert_array_equal, restored.opt_state,
            state.opt_state)

    def test_resume_continues_identically(self, tmp_path):
        """Train 4 steps straight == train 2, checkpoint, restore, train 2."""
        model, opt, state = fresh_state()
        step = make_train_step(model, opt, CFG, CELLS, donate=False)
        batch = one_batch()
        rng = jax.random.PRNGKey(7)

        s = state
        for _ in range(4):
            s, _ = step(s, batch, rng)
        straight = s.params

        s2 = state
        for _ in range(2):
            s2, _ = step(s2, batch, rng)
        ckpt_dir = str(tmp_path / "resume")
        save_checkpoint(ckpt_dir, s2)
        _, _, blank = fresh_state()
        s3 = restore_checkpoint(ckpt_dir, blank)
        for _ in range(2):
            s3, _ = step(s3, batch, rng)

        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-7),
            straight, s3.params)

    def test_max_to_keep(self, tmp_path):
        model, opt, state = fresh_state()
        ckpt_dir = str(tmp_path / "keep")
        for i in range(1, 6):
            state = state.replace(step=jnp.asarray(i))
            save_checkpoint(ckpt_dir, state, max_to_keep=2)
        assert latest_step(ckpt_dir) == 5

    def test_npz_export(self, tmp_path):
        _, _, state = fresh_state()
        path = str(tmp_path / "params.npz")
        save_params_npz(path, state.params)
        zeros = jax.tree_util.tree_map(np.zeros_like, state.params)
        loaded = load_params_npz(path, zeros)
        jax.tree_util.tree_map(
            np.testing.assert_array_equal, loaded, state.params)
