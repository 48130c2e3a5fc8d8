"""Embedding sweep: embed a whole dataset on the mesh, save to disk.

TPU-native replacement for the reference's accelerate-DDP embedding fan-out
(`preprocessing/embed.py:16-83`): batches shard over the mesh's data axis,
the jitted embedder runs SPMD, and results land in ``.npy`` shards with
their source indices (the reference's rank-0 gather+save contract,
`embed.py:36-43`) — consumed later by headless training and by the
refiner's bank.

Multi-host note: on a multi-host mesh wrap `collect` in
`jax.experimental.multihost_utils.process_allgather`; single-host (this
environment) needs no collective because jax arrays are addressable.
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

    Params are a jit argument (closure constants balloon the program)."""

    @jax.jit
    def step(p, pixels):
        return model.apply({"params": p}, pixels)

    return lambda pixels: step(params, pixels)


def embed_dataset(model, params, dataset: TabularImageDataset,
                  batch_size: int, mesh=None,
                  num_workers: int = 16) -> Dict[str, np.ndarray]:
    """Embed every image in `dataset`; returns dict with ``embeddings``
    ``(N, D)`` (or ``(N, 4, D)`` for panoramas) and ``indices`` ``(N,)``.

    The last batch is padded to `batch_size` (static shapes — one compiled
    executable) and the padding is dropped on the host.
    """
    from pigeon_tpu.train.mesh import shard_batch

    step = make_embed_step(model, params)
    n = len(dataset)
    chunks, index_chunks = [], []
    seen = 0
    for batch in iter_batches(dataset, batch_size, shuffle=False,
                              num_workers=num_workers):
        pixels = batch["inputs"]
        real = len(pixels)
        if real < batch_size:       # pad final batch to the compiled shape
            pad = np.repeat(pixels[-1:], batch_size - real, axis=0)
            pixels = np.concatenate([pixels, pad])
        pixels = jnp.asarray(pixels)
        if mesh is not None:
            pixels = shard_batch({"inputs": pixels}, mesh)["inputs"]
        emb = np.asarray(step(pixels))[:real]
        chunks.append(emb)
        index_chunks.append(np.arange(seen, seen + real))
        seen += real
    return {
        "embeddings": np.concatenate(chunks) if chunks
        else np.zeros((0,)),
        "indices": np.concatenate(index_chunks) if index_chunks
        else np.zeros((0,), np.int64),
    }


def embed_splits_to_disk(model, params, datasets: Dict[str, object],
                         out_dir: str, batch_size: int, mesh=None) -> None:
    """Embed named splits and save ``{split}.npy`` + ``{split}_indices.npy``
    (the reference's on-disk embedding layout,
    `preprocessing/embed.py:41-43`, consumed at
    `preprocessing/dataset_preprocessing.py:292-311`)."""
    os.makedirs(out_dir, exist_ok=True)
    for split, ds in datasets.items():
        out = embed_dataset(model, params, ds, batch_size, mesh=mesh)
        np.save(os.path.join(out_dir, f"{split}.npy"), out["embeddings"])
        np.save(os.path.join(out_dir, f"{split}_indices.npy"),
                out["indices"])


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
