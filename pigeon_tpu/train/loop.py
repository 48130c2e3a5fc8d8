"""High-level train/eval orchestration: epochs, eval, early stop, best ckpt.

Rebuilds the reference's custom loop (`training/train_eval_loop.py:35-253`)
the functional way: the jitted SPMD step does the math; this module owns
epochs, evaluation, TensorBoard scalars, the jax profiler window, best-
checkpoint tracking keyed on geocell accuracy (the reference saves on
improvements of NEGATIVE accuracy, `train_eval_loop.py:161,237-241`),
early stopping, and real resume.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from pigeon_tpu.train.metrics import compute_geoguessr_metrics

logger = logging.getLogger("pigeon_tpu.train")


class MetricWriter:
    """TensorBoard scalar writer (tf.summary if available, else JSONL).

    The reference writes train/val losses + every eval metric to TB
    (`train_eval_loop.py:143-155,226-227`); metric names are kept
    identical.
    """

    def __init__(self, log_dir: Optional[str]):
        self._tf = None
        self._jsonl = None
        if log_dir is None:
            return
        os.makedirs(log_dir, exist_ok=True)
        try:
            import tensorflow as tf  # noqa: F401

            self._tf = tf.summary.create_file_writer(log_dir)
        except Exception:
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._tf is not None:
            import tensorflow as tf

            with self._tf.as_default():
                tf.summary.scalar(tag, float(value), step=step)
        elif self._jsonl is not None:
            import json

            self._jsonl.write(json.dumps(
                {"tag": tag, "value": float(value), "step": step}) + "\n")
            self._jsonl.flush()

    def flush(self) -> None:
        if self._tf is not None:
            self._tf.flush()


class ProfilerWindow:
    """jax.profiler trace over a wait/active step window.

    TPU-native counterpart of the reference's torch.profiler schedule
    (wait 2, warmup 2, active 10 -> TB trace, `train_eval_loop.py:21-33`).
    """

    def __init__(self, log_dir: Optional[str], wait: int = 4,
                 active: int = 10):
        self.log_dir = log_dir
        self.wait = wait
        self.active = active
        self._running = False
        self._step = 0

    def step(self) -> None:
        if self.log_dir is None:
            return
        if self._step == self.wait:
            jax.profiler.start_trace(self.log_dir)
            self._running = True
        if self._step == self.wait + self.active and self._running:
            jax.profiler.stop_trace()
            self._running = False
        self._step += 1

    def close(self) -> None:
        if self._running:
            jax.profiler.stop_trace()
            self._running = False


def evaluate_model(eval_step: Callable, params, batches: Iterable[Dict],
                   refine_fn: Optional[Callable] = None,
                   scaler=None, country_index=None,
                   batch_to_device: Optional[Callable] = None
                   ) -> Dict[str, float]:
    """Run eval batches, optionally refine, compute the full metric suite.

    Mirrors `training/train_eval_loop.py:35-161`: collects predictions,
    labels, top-k candidates, multi-task outputs across batches; when a
    refiner is given, refined (lon, lat)/cells replace the raw argmax
    (`:97-103`).
    """
    acc: Dict[str, list] = {}

    # Values accumulate as DEVICE arrays and convert once at the end: a
    # per-batch `np.asarray`/`float` awaits the dispatch round-trip and
    # stalls the device between batches (~32 ms each through a tunneled
    # TPU; docs/PERF.md "chained dispatch"). Host decode still overlaps
    # via the iter_batches prefetch queue.
    def push(key, value):
        if value is not None:
            acc.setdefault(key, []).append(value)

    losses = []
    for batch in batches:
        dev_batch = batch_to_device(batch) if batch_to_device else batch
        metrics, preds = eval_step(params, dev_batch)
        losses.append(metrics["loss"])

        pred_lla = preds["pred_lla"]
        pred_cell = preds["pred_cell"]
        if refine_fn is not None:
            refined = refine_fn(preds["embedding"], preds["pred_lla"],
                                preds["topk_cells"], preds["topk_probs"])
            pred_lla = refined["pred_lla"]
            pred_cell = refined["pred_cell"]

        push("predictions", pred_lla)
        push("cell_preds", pred_cell)
        push("topk_cells", preds["topk_cells"])
        push("labels", batch.get("labels"))
        push("cell_labels", batch.get("labels_clf"))
        push("preds_mt", preds.get("preds_mt"))
        push("labels_mt", batch.get("labels_multi_task"))
        push("preds_climate", preds.get("preds_climate"))
        push("labels_climate", batch.get("labels_climate"))
        push("preds_month", preds.get("preds_month"))
        push("labels_month", batch.get("labels_month"))

    # Start ALL device->host copies async before awaiting any: a serial
    # np.asarray per accumulated array pays the ~32 ms readback
    # round-trip each (48 arrays = 1.5 s of pure latency for an
    # 8-batch eval, measured — scripts/bench_eval.py). Device-side
    # jnp.concatenate was tried instead and is WORSE (one fresh remote
    # compile per key/shape inside the eval).
    from pigeon_tpu.train.transfer import start_host_copies

    if not acc:
        raise ValueError(
            "evaluate_model received no batches — empty eval split? "
            "(check the metadata's `selection` column / --images dir)")
    start_host_copies((acc, losses))

    cat = {k: np.concatenate([np.asarray(x) for x in v])
           for k, v in acc.items()}
    losses = [float(x) for x in losses]
    metrics = compute_geoguessr_metrics(
        predictions=cat["predictions"],
        labels=cat["labels"],
        cell_preds=cat.get("cell_preds"),
        cell_labels=cat.get("cell_labels"),
        topk_cells=cat.get("topk_cells"),
        preds_mt=cat.get("preds_mt"),
        labels_mt=cat.get("labels_mt"),
        preds_climate=cat.get("preds_climate"),
        labels_climate=cat.get("labels_climate"),
        preds_month=cat.get("preds_month"),
        labels_month=cat.get("labels_month"),
        scaler=scaler,
        country_index=country_index,
    )
    metrics["Eval_loss"] = float(np.mean(losses)) if losses else float("nan")
    return metrics


def train_model(state, train_step: Callable, eval_step: Callable,
                train_batches_fn: Callable[[int], Iterable[Dict]],
                eval_batches_fn: Callable[[], Iterable[Dict]],
                num_epochs: int,
                rng,
                checkpoint_dir: Optional[str] = None,
                log_dir: Optional[str] = None,
                profile_dir: Optional[str] = None,
                early_stopping_patience: int = 10,
                refine_fn: Optional[Callable] = None,
                scaler=None,
                batch_to_device: Optional[Callable] = None,
                log_every: int = 10,
                divergence_guard: bool = True,
                max_recoveries: int = 3,
                preemption: bool = True):
    """Epoch loop with per-epoch eval, best-ckpt save, early stopping.

    Args:
        train_batches_fn: epoch index -> iterable of train batches (fresh
            shuffle per epoch).
        eval_batches_fn: () -> iterable of eval batches.
        divergence_guard: failure detection — the periodic loss flush
            (which reads the device scalars anyway, so this costs
            nothing at steady state) checks finiteness; on NaN/inf the
            loop restores the last saved checkpoint and resumes from the
            next epoch, up to ``max_recoveries`` times. With no
            checkpoint yet (or recoveries exhausted) it raises instead
            of silently training on poisoned weights. The reference has
            no failure detection at all (SURVEY §5).
        preemption: graceful shutdown — SIGTERM (what a TPU-VM reclaim
            or an orchestrator delivers) checkpoints the full TrainState
            at the next step boundary and returns, so ``--resume``
            continues exactly; see `train/preemption.py`. The in-flight
            epoch's eval is skipped (the grace window is for saving, not
            metrics).

    Checkpoints are written through one ASYNC `CheckpointSession` —
    best-checkpoint saves overlap the next epoch's compute, and the
    session joins the background writer before any rollback/return.

    Returns ``(state, history)`` where history is the list of per-epoch
    eval metric dicts. Selection metric: ``Geocell_accuracy`` (maximized),
    the reference's best-model criterion (`train_eval_loop.py:161`).
    """
    from pigeon_tpu.train.checkpoints import CheckpointSession
    from pigeon_tpu.train.multihost import coordinated_flag
    from pigeon_tpu.train.preemption import PreemptionGuard

    nproc = jax.process_count()
    writer = MetricWriter(log_dir)
    profiler = ProfilerWindow(profile_dir)
    best_acc = -np.inf
    stale = 0
    history = []
    recoveries = 0
    global_step = int(jax.device_get(state.step))
    session = (CheckpointSession(checkpoint_dir)
               if checkpoint_dir is not None else None)
    guard = PreemptionGuard() if preemption else None

    def flush(pending):
        """Write pending losses; return False if a non-finite one hit."""
        ok = True
        for s, loss in pending:
            value = float(loss)
            writer.scalar("train/loss", value, s)
            if divergence_guard and not np.isfinite(value):
                logger.error("non-finite train loss %s at step %d",
                             value, s)
                ok = False
        pending.clear()
        return ok

    def recover(state):
        nonlocal recoveries, global_step
        recoveries += 1
        if recoveries > max_recoveries:
            raise RuntimeError(
                f"training diverged {recoveries} times; giving up")
        if session is None:
            raise RuntimeError(
                "training diverged with no checkpoint to roll back to")
        if session.latest_step() is None:
            raise RuntimeError(
                "training diverged before the first checkpoint")
        state = session.restore(state)
        global_step = int(jax.device_get(state.step))
        logger.warning("rolled back to checkpoint step %d (recovery %d)",
                       global_step, recoveries)
        return state

    import contextlib

    stack = contextlib.ExitStack()
    if guard is not None:
        stack.enter_context(guard)
    preempted = False
    try:
        for epoch in range(num_epochs):
            t0 = time.time()
            # Losses stay DEVICE scalars until the periodic flush: float()
            # every step awaits the dispatch round-trip and stalls the next
            # step's dispatch (~32 ms on a tunneled TPU). By flush time the
            # older steps have long completed, so only the newest await
            # costs anything.
            pending: list = []
            diverged = False
            for batch in train_batches_fn(epoch):
                # Single-process: stop on the local flag at any step.
                # Multi-process: the decision must be COLLECTIVE (a lone
                # host breaking out would strand the others at their
                # next collective / deadlock the orbax save), so hosts
                # poll `coordinated_flag` at the shared log_every
                # boundaries below instead — log_every bounds the
                # preemption latency on pods.
                if nproc == 1 and guard is not None and guard.requested:
                    preempted = True
                    break
                dev_batch = (batch_to_device(batch) if batch_to_device
                             else batch)
                state, metrics = train_step(state, dev_batch, rng)
                global_step += 1
                profiler.step()
                pending.append((global_step, metrics["loss"]))
                if global_step % log_every == 0:
                    if not flush(pending):
                        diverged = True
                        break
                    if nproc > 1 and guard is not None and \
                            coordinated_flag(guard.requested):
                        preempted = True
                        break
            if not diverged and not flush(pending):
                diverged = True
            if diverged:
                state = recover(state)
                continue
            if not preempted and guard is not None \
                    and coordinated_flag(guard.requested):
                # Epoch-boundary poll: catches a signal that arrived
                # after the last in-epoch boundary (single-process: after
                # the last per-step poll, e.g. during the final step or
                # flush), before the epoch's eval starts.
                preempted = True
            if preempted:
                # Save the CURRENT state (not best-only): resume needs
                # optimizer continuity, and the grace window is short —
                # wait so the write is durable before the process dies.
                if session is not None:
                    saved = session.save(state, wait=True)
                    logger.warning(
                        "preempted at step %d — checkpoint saved, "
                        "resume with the same --name/--resume",
                        saved)
                else:
                    logger.warning("preempted at step %d with no "
                                   "checkpoint dir — state is lost "
                                   "unless the caller saves it",
                                   global_step)
                break

            eval_metrics = evaluate_model(
                eval_step, state.params, eval_batches_fn(),
                refine_fn=refine_fn, scaler=scaler,
                batch_to_device=batch_to_device)
            history.append(eval_metrics)
            for key, value in eval_metrics.items():
                writer.scalar(f"eval/{key}", value, global_step)
            writer.flush()
            logger.info(
                "epoch %d: loss=%.4f acc=%.4f median_km=%.1f (%.1fs)",
                epoch, eval_metrics["Eval_loss"],
                eval_metrics.get("Geocell_accuracy", float("nan")),
                eval_metrics.get("Median_km_error", float("nan")),
                time.time() - t0)

            acc = eval_metrics.get("Geocell_accuracy",
                                   -eval_metrics["Eval_loss"])
            if acc > best_acc:
                best_acc = acc
                stale = 0
                if session is not None:
                    # Async: the background write overlaps the next
                    # epoch; session.close()/restore() joins it.
                    session.save(state)
            else:
                stale += 1
                if stale >= early_stopping_patience:
                    logger.info("early stopping at epoch %d", epoch)
                    break
    finally:
        profiler.close()
        if session is not None:
            session.close()
        stack.close()
    return state, history
