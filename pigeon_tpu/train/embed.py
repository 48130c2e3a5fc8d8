"""Embedding sweep: embed a whole dataset on the mesh, save to disk.

TPU-native replacement for the reference's accelerate-DDP embedding fan-out
(`preprocessing/embed.py:16-83`): batches shard over the mesh's data axis,
the jitted embedder runs SPMD, and results land in ``.npy`` shards with
their source indices (the reference's rank-0 gather+save contract,
`embed.py:36-43`) — consumed later by headless training and by the
refiner's bank.

Multi-host: each process embeds only its `host_slice` of the dataset and
the shards are `process_allgather`-ed so every host holds the full
embedding table (the reference's per-batch `accelerator.gather`,
`embed.py:36-37`); `embed_splits_to_disk` saves on the primary host only
with barriers between splits (`embed.py:41-43,75-79`). Single-process runs
take the same code path with no collective.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pigeon_tpu.data.pipeline import TabularImageDataset, iter_batches


def make_embed_step(model, params):
    """Jitted pixels -> token-mean embeddings step.

    Params are a jit argument (closure constants balloon the program).
    uint8 batches normalize on device (low-transfer wire format).
    Panorama batches ``(B, V, S, S, 3)`` fold their views into the batch
    axis for the tower (4x larger MXU batches — the model convention,
    `models/embedder.py`) and unfold to ``(B, V, D)`` banks (the layout
    `load_embeddings`/the reference's `.npy` join consume)."""
    from pigeon_tpu.train.train_loop import _maybe_normalize

    @jax.jit
    def step(p, pixels):
        if pixels.ndim == 5:               # (B, V, S, S, 3) panorama
            b, v = pixels.shape[:2]
            flat = pixels.reshape(b * v, *pixels.shape[2:])
            emb = model.apply({"params": p}, _maybe_normalize(flat))
            return emb.reshape(b, v, emb.shape[-1])
        return model.apply({"params": p}, _maybe_normalize(pixels))

    return lambda pixels: step(params, pixels)


def embed_dataset(model, params, dataset: TabularImageDataset,
                  batch_size: int, mesh=None,
                  num_workers: int = 16) -> Dict[str, np.ndarray]:
    """Embed every image in `dataset`; returns dict with ``embeddings``
    ``(N, D)`` (or ``(N, 4, D)`` for panoramas) and ``indices`` ``(N,)``.

    The last batch is padded to `batch_size` (static shapes — one compiled
    executable) and the padding is dropped on the host.
    """
    from pigeon_tpu.data.pipeline import TabularImageDataset
    from pigeon_tpu.train.mesh import shard_batch
    from pigeon_tpu.train.multihost import allgather_hosts, host_slice
    from pigeon_tpu.train.transfer import start_host_copies

    step = make_embed_step(model, params)

    # Per-host input sharding: each process decodes + embeds only its
    # contiguous slice; results allgather at the end.
    n = len(dataset)
    nproc = jax.process_count()
    sl = host_slice(n)
    local_ds = dataset if nproc == 1 else TabularImageDataset(
        dataset.df.iloc[sl], image_dir=dataset.image_dir,
        image_size=dataset.image_size, panorama=dataset.panorama,
        normalize=dataset.normalize)

    chunks, index_chunks = [], []
    seen = sl.start
    # One-batch-deep device->host pipeline: awaiting each batch's
    # embeddings serially costs the ~32 ms readback round-trip per batch
    # (docs/PERF.md); starting the async copy and converting it on the
    # NEXT iteration overlaps the transfer with the next forward while
    # holding at most two batches in HBM.
    pending = None  # (device_emb, real)
    for batch in iter_batches(local_ds, batch_size, shuffle=False,
                              num_workers=num_workers):
        pixels = batch["inputs"]
        real = len(pixels)
        if real < batch_size:       # pad final batch to the compiled shape
            pad = np.repeat(pixels[-1:], batch_size - real, axis=0)
            pixels = np.concatenate([pixels, pad])
        pixels = jnp.asarray(pixels)
        if mesh is not None and nproc == 1:
            pixels = shard_batch({"inputs": pixels}, mesh)["inputs"]
        emb_dev = step(pixels)
        start_host_copies(emb_dev)
        if pending is not None:
            chunks.append(np.asarray(pending[0])[:pending[1]])
        pending = (emb_dev, real)
        index_chunks.append(np.arange(seen, seen + real))
        seen += real
    if pending is not None:
        chunks.append(np.asarray(pending[0])[:pending[1]])

    local_emb = np.concatenate(chunks) if chunks else np.zeros((0,))
    local_idx = (np.concatenate(index_chunks) if index_chunks
                 else np.zeros((0,), np.int64))
    if nproc > 1:
        # Hosts may hold unequal slices: allgather per-host counts first,
        # then pad to the max, gather, and trim (process_allgather needs
        # uniform shapes).
        counts = allgather_hosts(np.array([len(local_idx)]))[:, 0]
        m = int(counts.max())
        if m == 0:
            return {"embeddings": local_emb, "indices": local_idx}
        pad_emb = np.zeros((m, *local_emb.shape[1:]), local_emb.dtype)
        pad_idx = np.full((m,), -1, np.int64)
        pad_emb[:len(local_emb)] = local_emb
        pad_idx[:len(local_idx)] = local_idx
        all_emb = allgather_hosts(pad_emb)
        all_idx = allgather_hosts(pad_idx)
        keep = all_idx.reshape(-1) >= 0
        local_emb = all_emb.reshape(-1, *all_emb.shape[2:])[keep]
        local_idx = all_idx.reshape(-1)[keep]
    return {"embeddings": local_emb, "indices": local_idx}


def embed_splits_to_disk(model, params, datasets: Dict[str, object],
                         out_dir: str, batch_size: int, mesh=None) -> None:
    """Embed named splits and save ``{split}.npy`` + ``{split}_indices.npy``
    (the reference's on-disk embedding layout,
    `preprocessing/embed.py:41-43`, consumed at
    `preprocessing/dataset_preprocessing.py:292-311`). Multi-host: primary
    saves, barrier between splits (`embed.py:75-79`)."""
    from pigeon_tpu.train.multihost import is_primary, sync_hosts

    if is_primary():
        os.makedirs(out_dir, exist_ok=True)
    for split, ds in datasets.items():
        out = embed_dataset(model, params, ds, batch_size, mesh=mesh)
        if is_primary():
            np.save(os.path.join(out_dir, f"{split}.npy"),
                    out["embeddings"])
            np.save(os.path.join(out_dir, f"{split}_indices.npy"),
                    out["indices"])
        sync_hosts(f"embed_{split}")


def load_embeddings(emb_dir: str, split: str,
                    num_samples: Optional[int] = None) -> np.ndarray:
    """Load an embedding shard, reordered by its saved indices
    (reference `dataset_preprocessing.py:292-311`)."""
    emb = np.load(os.path.join(emb_dir, f"{split}.npy"))
    idx = np.load(os.path.join(emb_dir, f"{split}_indices.npy")).flatten()
    if num_samples is not None:
        emb, idx = emb[:num_samples], idx[:num_samples]
    order = np.argsort(idx)
    return emb[order]
