"""Multi-host (multi-process) scale-out primitives.

The reference's multi-GPU story is single-node accelerate-DDP: per-rank
DataLoaders, `accelerator.gather` for embedding collection, and
`wait_for_everyone` barriers (`preprocessing/embed.py:36-79`,
`training/train_eval_loop.py:185-240`). The TPU-native multi-host
equivalents here:

  * per-host INPUT sharding — each process loads only its slice of the
    global batch (`host_slice` / `iter_host_batches`);
  * assembling a GLOBAL sharded array from host-local data
    (`global_batch_from_local`, via `jax.make_array_from_process_local_data`)
    so one pjit-compiled step runs SPMD across all hosts' devices;
  * `process_allgather` for collecting per-host results to every host
    (the embed sweep's `accelerator.gather` analogue);
  * `sync_hosts` barriers (the `wait_for_everyone` analogue);
  * `is_primary` rank-0 checks for disk writes.

Everything degrades to a no-op single-process path, so the same code runs
unchanged from a laptop CPU to a multi-host TPU pod. Exercised by a real
2-process x 4-device CPU simulation in `tests/test_multihost.py`.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """Rank-0 check for host-side effects (disk writes, logging) — the
    reference's `is_local_main_process` (`preprocessing/embed.py:32,41`)."""
    return jax.process_index() == 0


def sync_hosts(name: str = "pigeon_tpu") -> None:
    """Cross-host barrier (`accelerator.wait_for_everyone`,
    reference `preprocessing/embed.py:75-79`). No-op single-process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def allgather_hosts(x):
    """Gather a host-local array across processes -> (process_count, ...)
    ndarray on EVERY host (the reference's `accelerator.gather`,
    `preprocessing/embed.py:36-37`). Single-process: adds the leading axis.
    """
    if jax.process_count() == 1:
        return np.asarray(x)[None]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x))


def coordinated_flag(local_flag: bool, name: str = "preempt") -> bool:
    """Agree on a boolean across hosts: True ANYWHERE -> True everywhere.

    Used for coordinated preemption (`train/preemption.py`): a TPU-VM
    reclaim delivers SIGTERM to ONE host's process, but if that host
    breaks out of the step loop alone the remaining hosts hang at their
    next collective (and an orbax multi-process save would deadlock).
    All hosts therefore poll this at the SAME step boundaries and take
    the same branch. Single-process: returns the flag unchanged; the
    reference (single-node accelerate-DDP) has no counterpart.
    """
    if jax.process_count() == 1:
        return bool(local_flag)
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        np.asarray([bool(local_flag)]))
    return bool(np.any(flags))


def host_slice(n: int, pid: Optional[int] = None,
               nproc: Optional[int] = None) -> slice:
    """This host's contiguous slice of ``n`` global samples.

    Uses contiguous blocks (not strided) so a global batch built from the
    concatenation of host slices keeps sample order — metrics and saved
    indices stay comparable with the single-host run.
    """
    pid = jax.process_index() if pid is None else pid
    nproc = jax.process_count() if nproc is None else nproc
    per = n // nproc
    extra = n % nproc
    start = pid * per + min(pid, extra)
    return slice(start, start + per + (1 if pid < extra else 0))


def global_batch_from_local(local_batch: Dict[str, np.ndarray],
                            mesh: Mesh) -> Dict[str, jax.Array]:
    """Assemble a globally-sharded batch from each host's local arrays.

    Every host passes its own slice (global_batch / process_count rows);
    the result is one global jax.Array per leaf, sharded over the mesh's
    ``data`` axis, ready for the pjit-compiled train step. Single-process
    meshes fall back to a plain device_put.
    """
    from pigeon_tpu.train.mesh import shard_batch

    if jax.process_count() == 1:
        return shard_batch(local_batch, mesh)

    def to_global(x):
        if getattr(x, "ndim", 0) == 0:
            return x
        sharding = NamedSharding(mesh, P("data"))
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))

    return {k: to_global(v) for k, v in local_batch.items()}


def iter_host_batches(dataset, global_batch_size: int, mesh: Mesh,
                      shuffle: bool = False, seed: int = 0,
                      drop_last: bool = True, num_workers: int = 16
                      ) -> Iterator[Dict[str, jax.Array]]:
    """Per-host input pipeline over a global batch.

    All hosts iterate the same global order (same seed); each loads only
    its `host_slice` of every global batch, then the slices are assembled
    into global arrays. The multi-host analogue of the reference's
    per-rank DataLoader + DDP sampler.
    """
    from pigeon_tpu.data.pipeline import iter_batches

    n = len(dataset)
    nproc = jax.process_count()
    data_size = mesh.shape.get("data", 1)
    if global_batch_size % nproc or global_batch_size % data_size:
        raise ValueError(
            f"global batch {global_batch_size} must divide evenly over "
            f"{nproc} processes and the {data_size}-way data axis")
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)

    bounds = range(0, n - global_batch_size + 1 if drop_last else n,
                   global_batch_size)
    for start in bounds:
        global_idx = order[start:start + global_batch_size]
        local_idx = global_idx[host_slice(len(global_idx))]
        # Load only the local rows (threaded decode via a sliced view).
        from pigeon_tpu.data.pipeline import TabularImageDataset

        local_ds = TabularImageDataset(
            dataset.df.iloc[local_idx], image_dir=dataset.image_dir,
            image_size=dataset.image_size, panorama=dataset.panorama,
            normalize=dataset.normalize)
        local = next(iter_batches(local_ds, len(local_idx),
                                  num_workers=num_workers))
        yield global_batch_from_local(local, mesh)
