"""Orbax checkpointing with real resume support.

Closes a reference gap: the reference saves best-only weights with no
optimizer state and raises ``NotImplementedError`` on resume for finetune/
embed (`run.py:166-175`, `training/train_eval_loop.py:237-241`). Here the
full TrainState (params + optimizer + step) checkpoints atomically and any
run resumes exactly.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True),
    )


class CheckpointSession:
    """One CheckpointManager held open for a whole training run.

    The module-level helpers below open/close a manager per call — fine
    for one-shot saves, but inside a training loop that (a) pays the
    manager setup per checkpoint and (b) forces `wait=True` semantics,
    stalling the step pipeline while arrays hit disk. This session keeps
    the manager open so saves run ASYNC (orbax snapshots device arrays
    up front, then writes on a background thread while training
    continues) and joins the writer only where correctness needs it:
    before a restore, and at close.

    Use as a context manager; `close()` (or `__exit__`) blocks until
    every in-flight save is durable.
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = directory
        self._mgr = _manager(directory, max_to_keep)

    def save(self, state: Any, step: Optional[int] = None,
             wait: bool = False) -> int:
        """Save a TrainState at `step` (default: state.step). Returns the
        step. With ``wait=False`` the write completes in the background
        (orbax serializes overlapping saves internally)."""
        import orbax.checkpoint as ocp

        step = int(step if step is not None else jax.device_get(state.step))
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()
        return step

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, target: Any, step: Optional[int] = None) -> Any:
        """Restore into ``target``'s structure/shardings (see module
        ``restore_checkpoint``), joining any in-flight save first so a
        rollback to the step being written cannot read a half-commit."""
        import orbax.checkpoint as ocp

        self._mgr.wait_until_finished()
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self) -> "CheckpointSession":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def save_checkpoint(directory: str, state: Any, step: Optional[int] = None,
                    max_to_keep: int = 3, wait: bool = True) -> None:
    """Save a TrainState (or any pytree) at `step`."""
    import orbax.checkpoint as ocp

    step = int(step if step is not None else jax.device_get(state.step))
    mgr = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    if wait:
        mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(directory: str, target: Any,
                       step: Optional[int] = None) -> Any:
    """Restore into the structure (and shardings) of ``target``.

    ``target`` should be a concrete TrainState (e.g. freshly initialized and
    mesh-sharded) — restored arrays adopt its shardings, so resume works
    identically on a different mesh shape.
    """
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoint found in {directory}")
    restored = mgr.restore(
        step, args=ocp.args.StandardRestore(target))
    mgr.close()
    return restored


def save_params_npz(path: str, params: Any) -> None:
    """Flat .npz export of a parameter tree (interchange/debug format)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {
        "/".join(str(getattr(k, "key", getattr(k, "name", k)))
                 for k in keypath): np.asarray(leaf)
        for keypath, leaf in flat
    }
    np.savez(path, **arrays)


def load_params_npz(path: str, target: Any) -> Any:
    """Load a flat .npz export back into the structure of ``target``."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(target)
    leaves = []
    for keypath, leaf in flat:
        key = "/".join(str(getattr(k, "key", getattr(k, "name", k)))
                       for k in keypath)
        arr = data[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(
                f"shape mismatch for {key}: {arr.shape} vs {np.shape(leaf)}")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)
