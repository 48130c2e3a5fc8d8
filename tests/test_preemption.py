"""Tests: graceful preemption (SIGTERM -> checkpoint -> exact resume) and
the async CheckpointSession.

The reference has no preemption handling and cannot resume at all
(`run.py:166-175` raises NotImplementedError; SURVEY §5 failure-detection
row) — these pin the beyond-reference contract: a training loop that
receives SIGTERM saves the FULL TrainState at the next step boundary,
returns cleanly, and a restart with the same checkpoint dir continues
with bit-identical params/optimizer/step.
"""

import os
import signal

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pigeon_tpu.config import HeadConfig

RNG = np.random.default_rng(23)


def _world():
    from pigeon_tpu.models import GeocellHead
    from pigeon_tpu.train import create_train_state, make_eval_step, \
        make_train_step
    from pigeon_tpu.train.train_loop import adamw

    cfg = HeadConfig(num_cells=5, embed_dim=16, smooth_labels=True)
    cells = np.stack([np.linspace(-100, 100, 5),
                      np.linspace(-40, 40, 5)], -1).astype(np.float32)
    model = GeocellHead(cfg)
    opt = adamw(3e-2)
    state = create_train_state(jax.random.PRNGKey(0), model, opt,
                               (jnp.zeros((2, 16)),))
    step = make_train_step(model, opt, cfg, cells, donate=False)
    eval_step = make_eval_step(model, cfg, cells, num_candidates=3)
    emb = np.eye(16, dtype=np.float32)[np.arange(20) % 5]
    labels_clf = np.arange(20) % 5
    labels = cells[labels_clf].astype(np.float32)
    batch = {"inputs": jnp.asarray(emb), "labels": jnp.asarray(labels),
             "labels_clf": jnp.asarray(labels_clf)}
    return state, step, eval_step, batch


class TestPreemptionGuard:
    def test_sigterm_sets_flag_and_restores_handler(self):
        from pigeon_tpu.train.preemption import PreemptionGuard

        prior = signal.getsignal(signal.SIGTERM)
        with PreemptionGuard() as guard:
            assert not guard.requested
            os.kill(os.getpid(), signal.SIGTERM)   # would kill, unguarded
            assert guard.requested
        assert signal.getsignal(signal.SIGTERM) is prior

    def test_request_without_signal(self):
        from pigeon_tpu.train.preemption import PreemptionGuard

        guard = PreemptionGuard()
        guard.request()
        assert guard.requested

    def test_non_main_thread_degrades_to_flag(self):
        import threading

        from pigeon_tpu.train.preemption import PreemptionGuard

        out = {}

        def run():
            with PreemptionGuard() as guard:
                out["installed_ok"] = True
                guard.request()
                out["requested"] = guard.requested

        t = threading.Thread(target=run)
        t.start()
        t.join()
        assert out == {"installed_ok": True, "requested": True}


class TestCheckpointSession:
    def test_async_saves_then_restore(self, tmp_path):
        from pigeon_tpu.train.checkpoints import CheckpointSession

        state, step_fn, _eval, batch = _world()
        d = str(tmp_path / "ckpt")
        with CheckpointSession(d, max_to_keep=2) as sess:
            for _ in range(3):
                state, _ = step_fn(state, batch, jax.random.PRNGKey(1))
                sess.save(state)               # async, no wait
            assert sess.latest_step() == 3
            # restore joins the in-flight writer before reading
            blank, *_ = _world()
            restored = sess.restore(blank)
        assert int(jax.device_get(restored.step)) == 3
        jax.tree_util.tree_map(
            np.testing.assert_array_equal, restored.params, state.params)

    def test_restore_empty_dir_raises(self, tmp_path):
        from pigeon_tpu.train.checkpoints import CheckpointSession

        state, *_ = _world()
        with CheckpointSession(str(tmp_path / "empty")) as sess:
            with pytest.raises(FileNotFoundError):
                sess.restore(state)


class TestTrainModelPreemption:
    def test_sigterm_mid_epoch_saves_and_resumes_exactly(self, tmp_path):
        from pigeon_tpu.train.checkpoints import latest_step, \
            restore_checkpoint
        from pigeon_tpu.train.loop import train_model

        state, step_fn, eval_step, batch = _world()
        ckpt = str(tmp_path / "ckpt")
        prior_handler = signal.getsignal(signal.SIGTERM)
        fired = {"n": 0}

        def batches(_epoch=None):
            # 4 steps/epoch. The SIGTERM is raised while producing the
            # 6th batch (epoch 1, 2nd batch) — the loop must stop at
            # the step boundary: 5 steps executed, the 6th never runs.
            for _ in range(4):
                fired["n"] += 1
                if fired["n"] == 6:
                    os.kill(os.getpid(), signal.SIGTERM)
                yield batch

        state, history = train_model(
            state, step_fn, eval_step, batches, lambda: [batch],
            num_epochs=5, rng=jax.random.PRNGKey(1),
            checkpoint_dir=ckpt, log_every=2, early_stopping_patience=50)

        assert int(jax.device_get(state.step)) == 5
        assert len(history) == 1               # only epoch 0 reached eval
        # The preemption save is the LATEST checkpoint (resume target),
        # even though epoch 0's best-ckpt save (step 4) also happened.
        assert latest_step(ckpt) == 5
        blank, *_ = _world()
        restored = restore_checkpoint(ckpt, blank)
        assert int(jax.device_get(restored.step)) == 5
        jax.tree_util.tree_map(
            np.testing.assert_array_equal, restored.params, state.params)
        jax.tree_util.tree_map(
            np.testing.assert_array_equal, restored.opt_state,
            state.opt_state)
        # Guard exited: SIGTERM handling is back to what it was.
        assert signal.getsignal(signal.SIGTERM) is prior_handler

    def test_sigterm_after_last_step_skips_eval(self, tmp_path):
        """A SIGTERM that lands AFTER the last per-step poll (here:
        while the exhausted batch iterator returns) must be caught by
        the single-process epoch-boundary poll — the epoch's eval is
        skipped and the checkpoint written before any further work
        (the grace window is short; a full eval pass could outlive
        it)."""
        from pigeon_tpu.train.checkpoints import latest_step
        from pigeon_tpu.train.loop import train_model

        state, step_fn, eval_step, batch = _world()
        ckpt = str(tmp_path / "ckpt")

        def batches(_epoch=None):
            for _ in range(4):
                yield batch
            # raised during the loop's final (StopIteration) pull —
            # after the last pre-step guard check.
            os.kill(os.getpid(), signal.SIGTERM)

        state, history = train_model(
            state, step_fn, eval_step, batches, lambda: [batch],
            num_epochs=3, rng=jax.random.PRNGKey(1),
            checkpoint_dir=ckpt, log_every=2, early_stopping_patience=50)

        assert int(jax.device_get(state.step)) == 4
        assert history == []                   # eval never ran
        assert latest_step(ckpt) == 4

    def test_preemption_opt_out_installs_no_handler(self, tmp_path):
        """preemption=False leaves signal handling to the caller (e.g.
        the multihost coordinator owns SIGTERM itself)."""
        from pigeon_tpu.train.loop import train_model

        state, step_fn, eval_step, batch = _world()
        prior = signal.getsignal(signal.SIGTERM)
        seen = {}

        def batches(_epoch=None):
            seen["handler"] = signal.getsignal(signal.SIGTERM)
            return [batch]

        train_model(state, step_fn, eval_step, batches,
                    lambda: [batch], num_epochs=1,
                    rng=jax.random.PRNGKey(1), preemption=False)
        assert seen["handler"] is prior


class TestPretrainPreemption:
    def test_pretrain_sigterm_saves_and_stops(self, tmp_path):
        from pigeon_tpu.config import TextConfig, VisionConfig
        from pigeon_tpu.models.clip import CLIPModel
        from pigeon_tpu.train import create_train_state
        from pigeon_tpu.train.checkpoints import latest_step
        from pigeon_tpu.train.modes import make_pretrain_step, pretrain
        from pigeon_tpu.train.train_loop import adamw

        v = VisionConfig(image_size=16, patch_size=8, hidden_size=16,
                         num_layers=1, num_heads=2, intermediate_size=32,
                         projection_dim=8)
        t = TextConfig(vocab_size=64, max_position_embeddings=8,
                       hidden_size=16, num_layers=1, num_heads=2,
                       intermediate_size=32, projection_dim=8)
        model = CLIPModel(v, t)
        opt = adamw(1e-3)
        example = (jnp.zeros((2, 16, 16, 3)), jnp.zeros((2, 8), jnp.int32))
        state = create_train_state(jax.random.PRNGKey(0), model, opt,
                                   example, init_kwargs={})
        step = make_pretrain_step(model, opt)
        pixels = jnp.asarray(RNG.normal(size=(4, 16, 16, 3))
                             .astype(np.float32))
        ids = jnp.asarray(RNG.integers(0, 64, (4, 8)).astype(np.int32))
        batch = {"pixel_values": pixels, "input_ids": ids}
        fired = {"n": 0}

        def batches(_epoch):
            # SIGTERM raised while producing the 3rd batch: 2 steps run.
            for _ in range(10):
                fired["n"] += 1
                if fired["n"] == 3:
                    os.kill(os.getpid(), signal.SIGTERM)
                yield batch

        ckpt = str(tmp_path / "ckpt")
        state = pretrain(model, state, step, batches, num_epochs=4,
                         checkpoint_dir=ckpt, save_steps=100)
        assert int(jax.device_get(state.step)) == 2
        assert latest_step(ckpt) == 2
