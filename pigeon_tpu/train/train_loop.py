"""pjit train/eval steps for geocell-head training.

TPU-native replacement for the reference's accelerate/DDP loop
(`training/train_eval_loop.py:164-253`): one jitted SPMD train step over a
(data, model) mesh — forward, smoothed-CE + multi-task loss, backward
(gradient all-reduce rides ICI via GSPMD), optional stacked-layer gradient
mask (partial freezing), AdamW update. Gradient accumulation is an
`optax.MultiSteps` wrapper, replacing the reference's manual accumulation
loop (`train_eval_loop.py:200-223`).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from pigeon_tpu.config import HeadConfig
from pigeon_tpu.models.geocell_head import geocell_loss, geocell_predictions
from jax.sharding import NamedSharding

from pigeon_tpu.train.mesh import (
    fsdp_param_specs,
    opt_state_specs,
    param_specs,
)


class TrainState(flax.struct.PyTreeNode):
    """Minimal functional train state (params + optimizer + step)."""

    step: jnp.ndarray
    params: Any
    opt_state: Any

    def replace(self, **kwargs):
        return super().replace(**kwargs)


def create_train_state(rng, model, optimizer, example_inputs, mesh=None,
                       init_kwargs: Optional[dict] = None,
                       fsdp: bool = False) -> TrainState:
    """Initialize params + optimizer state, sharded over ``mesh``.

    Initialization runs under jit with output sharding constraints derived
    from the path rules, so large params materialize directly in their
    sharded layout (no host-memory spike, no resharding transfer).

    With ``fsdp=True``, parameters AND optimizer state (Adam moments,
    accumulation buffers) additionally shard over the ``data`` axis
    (`mesh.fsdp_param_specs` — the ZeRO-3 storage layout); the train step
    needs no change — GSPMD all-gathers weights before use and
    reduce-scatters gradients back to the shard layout.
    """
    init_kwargs = init_kwargs or {}

    def init_fn(rng):
        params = model.init(rng, *example_inputs, **init_kwargs)["params"]
        specs = None
        if mesh is not None:
            specs = (fsdp_param_specs(params, mesh) if fsdp
                     else param_specs(params))
            params = jax.tree_util.tree_map(
                lambda x, s: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, s)),
                params, specs)
        opt_state = optimizer.init(params)
        if mesh is not None and fsdp:
            ospecs = opt_state_specs(opt_state, params, specs)
            opt_state = jax.tree_util.tree_map(
                lambda x, s: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, s)),
                opt_state, ospecs)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=opt_state)

    return jax.jit(init_fn)(rng)


def _maybe_normalize(inputs, force: bool = False):
    """uint8 batches normalize on device (the low-transfer wire format:
    4x fewer host->device bytes, and the float math fuses into the
    patch-embed matmul). Float batches pass through unless forced."""
    if force or inputs.dtype == jnp.uint8:
        from pigeon_tpu.data.image_ops import normalize_images

        return normalize_images(inputs)
    return inputs


def state_shardings(state: TrainState):
    """Sharding pytree of a train state (pass as ``make_train_step``'s
    ``out_shardings`` so FSDP layouts survive the step deterministically
    instead of relying on GSPMD propagation)."""
    return jax.tree_util.tree_map(lambda x: x.sharding, state)


def make_train_step(model, optimizer, head_cfg: HeadConfig, geocells,
                    grad_mask=None, donate: bool = True,
                    normalize_inputs: bool = False,
                    out_shardings=None,
                    grad_norm_metric: bool = True) -> Callable:
    """Build the jitted SPMD train step.

    Args:
        model: Flax module whose ``apply`` returns a `GeocellOutput`
            (either `SuperGuessr` on pixels or `GeocellHead` on embeddings).
        optimizer: optax gradient transformation (wrap in
            ``optax.MultiSteps`` for gradient accumulation).
        head_cfg: loss configuration.
        geocells: ``(num_cells, 2)`` centroid table (closed over as a
            constant — baked into the executable, resident in HBM).
        grad_mask: optional broadcastable mask pytree for partial freezing.
        grad_norm_metric: include ``grad_norm`` in the metrics
            (default True). The r8 session A/B'd removing it — the
            norm re-reads the full 1.2 GB gradient tree, but XLA
            overlaps most of it and the residual effect is a
            batch-dependent COMPILE-SCHEDULE artifact, not a win:
            ON 95.48 / OFF 94.49 img/s at bs32, ON 95.36 / OFF 95.82
            at bs48 (same session, docs/PERF.md). The default keeps
            the metric (and the better number at the reference's
            bs32); operators at bs48 can pass False (bench_train:
            BENCH_GRAD_NORM=0) for the last ~0.5%. Clipping
            optimizers clip either way (optax computes its own norm
            internally); this flag only controls the REPORTED metric.

    The returned step has signature ``(state, batch, dropout_rng) ->
    (state, metrics)`` where ``batch`` is a dict with ``inputs`` and label
    arrays, all sharded batch-major over the data axis.
    """
    geocells = jnp.asarray(geocells, jnp.float32)

    def loss_fn(params, batch, rng):
        inputs = _maybe_normalize(batch["inputs"], normalize_inputs)
        out = model.apply(
            {"params": params}, inputs,
            heading=batch.get("heading"),
            deterministic=False, rngs={"dropout": rng})
        total, parts = geocell_loss(
            out, geocells, head_cfg,
            labels_lla=batch.get("labels"),
            labels_clf=batch.get("labels_clf"),
            labels_multi_task=batch.get("labels_multi_task"),
            labels_climate=batch.get("labels_climate"),
            labels_month=batch.get("labels_month"),
        )
        return total, parts

    jit_kwargs = {}
    if out_shardings is not None:
        jit_kwargs["out_shardings"] = (out_shardings, None)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else (),
                       **jit_kwargs)
    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        grads, parts = jax.grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        if grad_mask is not None:
            grads = jax.tree_util.tree_map(
                lambda g, m: g * m, grads, grad_mask)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params)
        if grad_mask is not None:
            # Mask the UPDATES too: adamw's decoupled weight decay would
            # otherwise still shrink frozen params (the reference freezes
            # via requires_grad=False, so frozen params never move —
            # torch skips None-grad params entirely).
            updates = jax.tree_util.tree_map(
                lambda u, m: u * m, updates, grad_mask)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state)
        if grad_norm_metric:
            parts = dict(parts, grad_norm=optax.global_norm(grads))
        return new_state, parts

    return train_step


def make_eval_step(model, head_cfg: HeadConfig, geocells,
                   num_candidates: Optional[int] = None) -> Callable:
    """Build the jitted eval step: forward + loss + predictions.

    Returns ``(metrics, predictions)`` where predictions carries everything
    the metric suite and the refiner need: pred (lon,lat), top-k cells +
    probs, embeddings, multi-task outputs (the reference's evaluate loop
    collects the same tuple, `training/train_eval_loop.py:67-112`).
    """
    geocells = jnp.asarray(geocells, jnp.float32)
    k = num_candidates or head_cfg.num_candidates

    @jax.jit
    def eval_step(params, batch):
        out = model.apply({"params": params},
                          _maybe_normalize(batch["inputs"]),
                          heading=batch.get("heading"), deterministic=True)
        total, parts = geocell_loss(
            out, geocells, head_cfg,
            labels_lla=batch.get("labels"),
            labels_clf=batch.get("labels_clf"),
            labels_multi_task=batch.get("labels_multi_task"),
            labels_climate=batch.get("labels_climate"),
            labels_month=batch.get("labels_month"),
        )
        preds = geocell_predictions(out.logits, geocells, k)
        preds = dict(
            preds,
            embedding=out.embedding,
            preds_mt=out.preds_mt,
            preds_climate=out.preds_climate,
            preds_month=out.preds_month,
        )
        return parts, preds

    return eval_step


def adamw(learning_rate, weight_decay: float = 0.0, b1: float = 0.9,
          b2: float = 0.999, eps: float = 1e-8,
          max_grad_norm: Optional[float] = None,
          accum_steps: int = 1) -> optax.GradientTransformation:
    """AdamW with optional clipping + gradient accumulation.

    Head training: lr 2e-5 plain Adam-ish (reference `config.py:104`);
    pretraining: betas (0.9, 0.98), eps 1e-6, wd 1e-3, clip 1.0, accum 8
    (reference `config.py:119-127`).
    """
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                             weight_decay=weight_decay))
    tx = optax.chain(*chain)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx
