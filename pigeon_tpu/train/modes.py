"""Training modes: contrastive pretrain, finetune, finetune-on-embeddings.

Rebuilds `training/train_modes.py:22-133` the TPU way:

  * `make_pretrain_step` — CLIP contrastive step over the mesh. The
    reference relies on HF Trainer DDP where in-batch negatives are
    PER-DEVICE only; here the batch shards over the data axis and the
    (B, B) similarity is computed over the GLOBAL batch — XLA inserts the
    all-gather over ICI automatically, which is strictly stronger
    contrastive signal at the same global batch size.
  * `finetune_model` — SuperGuessr on pixels with the reference's partial
    freeze (only the vision tower's last encoder layer trains,
    `models/super_guessr.py:155-160`).
  * `finetune_on_embeddings` — GeocellHead on precomputed embeddings
    (the cheap head-training path).
  * `retrieval_accuracy` — the in-batch contrastive retrieval probe used
    before/after pretraining (`pretrain_dataset.py:299-330`).
"""

from __future__ import annotations

import functools
import logging
from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pigeon_tpu.config import PigeonConfig
from pigeon_tpu.train.train_loop import TrainState, adamw

logger = logging.getLogger("pigeon_tpu.train")


def linear_warmup_schedule(peak_lr: float, total_steps: int,
                           warmup_ratio: float) -> optax.Schedule:
    """Linear warmup -> linear decay (the reference's HF 'linear' schedule
    with warmup_ratio, `config.py:130-131,164-165`)."""
    warmup = max(int(total_steps * warmup_ratio), 1)
    return optax.join_schedules([
        optax.linear_schedule(0.0, peak_lr, warmup),
        optax.linear_schedule(peak_lr, 0.0, max(total_steps - warmup, 1)),
    ], [warmup])


def pretrain_optimizer(cfg: PigeonConfig, total_steps: int
                       ) -> optax.GradientTransformation:
    """AdamW betas (0.9, 0.98), eps 1e-6, wd 1e-3, clip 1.0, linear
    schedule, grad accumulation (reference `config.py:112-177`)."""
    t = cfg.train
    schedule = linear_warmup_schedule(
        t.pretrain_learning_rate, total_steps, t.pretrain_warmup_ratio)
    return adamw(schedule,
                 weight_decay=t.pretrain_weight_decay,
                 b1=t.pretrain_adam_b1, b2=t.pretrain_adam_b2,
                 eps=t.pretrain_adam_eps,
                 max_grad_norm=t.pretrain_max_grad_norm,
                 accum_steps=t.pretrain_grad_accum_steps)


def make_pretrain_step(clip_model, optimizer, out_shardings=None) -> Callable:
    """Jitted contrastive CLIP train step: (state, batch) -> (state, metrics).

    batch: ``pixel_values`` (B, H, W, 3), ``input_ids`` (B, S) — sharded
    batch-major over the data axis. ``out_shardings`` (a TrainState
    sharding pytree, see `train_loop.state_shardings`) pins the FSDP
    layout across steps.
    """

    def loss_fn(params, batch):
        out = clip_model.apply({"params": params}, batch["pixel_values"],
                               batch["input_ids"], return_loss=True)
        return out["loss"], out

    jit_kwargs = {}
    if out_shardings is not None:
        jit_kwargs["out_shardings"] = (out_shardings, None)

    @functools.partial(jax.jit, donate_argnums=(0,), **jit_kwargs)
    def step(state: TrainState, batch):
        (loss, out), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        logits = out["logits_per_image"]
        acc = jnp.mean(
            (jnp.argmax(logits, axis=-1)
             == jnp.arange(logits.shape[0])).astype(jnp.float32))
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), {
            "loss": loss, "in_batch_accuracy": acc,
            "logit_scale": out["logit_scale"]}

    return step


def make_retrieval_probe(clip_model) -> Callable:
    """Jitted in-batch image->text retrieval accuracy
    (reference `pretrain_dataset.py:299-330`)."""

    @jax.jit
    def probe(params, pixel_values, input_ids):
        out = clip_model.apply({"params": params}, pixel_values, input_ids)
        logits = out["logits_per_image"]
        return jnp.mean(
            (jnp.argmax(logits, axis=-1)
             == jnp.arange(logits.shape[0])).astype(jnp.float32))

    return probe


def retrieval_accuracy(probe: Callable, params,
                       batches: Iterable[Tuple[np.ndarray, np.ndarray]],
                       trials: Optional[int] = 30) -> float:
    """Monte-Carlo mean of the in-batch retrieval probe over batches."""
    accs = []
    for i, (pixels, token_ids) in enumerate(batches):
        if trials is not None and i >= trials:
            break
        accs.append(float(probe(params, jnp.asarray(pixels),
                                jnp.asarray(token_ids))))
    return float(np.mean(accs)) if accs else 0.0


def pretrain(clip_model, state: TrainState, step_fn: Callable,
             batches_fn: Callable[[int], Iterable[dict]],
             num_epochs: int,
             checkpoint_dir: Optional[str] = None,
             save_steps: int = 50,
             batch_to_device: Optional[Callable] = None,
             log_fn: Optional[Callable] = None,
             preemption: bool = True,
             preempt_poll_steps: int = 10) -> TrainState:
    """Contrastive pretraining loop with periodic checkpoints
    (reference `train_modes.py:30-64`: Trainer with save_steps=50).

    Periodic saves run ASYNC through one `CheckpointSession` (the write
    overlaps the next `save_steps` of compute); SIGTERM checkpoints the
    full TrainState at the next step boundary and returns, so a
    preempted pretrain resumes exactly (`train/preemption.py`). On a
    multi-host pod the stop decision is COLLECTIVE (a lone host exiting
    would strand the others at their next collective): hosts agree via
    `multihost.coordinated_flag` every ``preempt_poll_steps`` steps."""
    import contextlib

    from pigeon_tpu.train.checkpoints import CheckpointSession
    from pigeon_tpu.train.multihost import coordinated_flag
    from pigeon_tpu.train.preemption import PreemptionGuard

    nproc = jax.process_count()
    global_step = int(jax.device_get(state.step))
    session = (CheckpointSession(checkpoint_dir)
               if checkpoint_dir else None)
    stack = contextlib.ExitStack()
    guard = stack.enter_context(PreemptionGuard()) if preemption else None
    preempted = False
    try:
        for epoch in range(num_epochs):
            for batch in batches_fn(epoch):
                if nproc == 1 and guard is not None and guard.requested:
                    preempted = True
                    break
                if batch_to_device is not None:
                    batch = batch_to_device(batch)
                state, metrics = step_fn(state, batch)
                global_step += 1
                if log_fn is not None:
                    log_fn(global_step, metrics)
                if session and global_step % save_steps == 0:
                    session.save(state, step=global_step)
                if (nproc > 1 and guard is not None
                        and global_step % preempt_poll_steps == 0
                        and coordinated_flag(guard.requested)):
                    preempted = True
                    break
            if preempted:
                break
        if session:
            session.save(state, step=global_step, wait=True)
            if preempted:
                logger.warning(
                    "pretrain preempted at step %d — checkpoint saved",
                    global_step)
    finally:
        if session:
            session.close()
        stack.close()
    return state


def build_finetune_model(cfg: PigeonConfig, dtype=jnp.bfloat16,
                         attn_impl: str = "xla", remat="attn_kernel"):
    """SuperGuessr for pixel finetuning + its partial-freeze mask builder
    (reference `train_modes.py:67-107`).

    ``remat`` defaults to 'attn_kernel' (remat the tower but SAVE both
    the post-residual attention output AND the pre-out-proj kernel
    output, so the rematerialized backward neither re-runs the fused
    QKV forward nor LN1): the r7 trace found 'attn_out' still re-ran
    the forward kernel to rebuild out_proj's input (1.97 ms/layer);
    saving it measured 95.4 vs 88.4 img/s bs48 same-session (+8%,
    docs/PERF.md). Earlier ladder: 'attn_out' 87.6 > full 86.0 > r4
    flash:full 81.7; 'none' fails remote compile at production batch.
    Same math under any policy (grads bit-exact, pinned by tests)."""
    from pigeon_tpu.models.super_guessr import (
        SuperGuessr,
        trainable_last_layer_mask,
    )

    model = SuperGuessr(cfg.vision, cfg.head, dtype=dtype,
                        attn_impl=attn_impl, remat=remat)

    def mask_builder(params):
        return trainable_last_layer_mask(params, cfg.vision.num_layers)

    return model, mask_builder


def build_embedding_model(cfg: PigeonConfig, dtype=jnp.float32):
    """GeocellHead for headless training on precomputed embeddings
    (reference `train_modes.py:110-133`)."""
    from pigeon_tpu.models.geocell_head import GeocellHead

    return GeocellHead(cfg.head, dtype=dtype)
