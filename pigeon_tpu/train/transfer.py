"""Device->host transfer pipelining.

An awaited readback through a tunneled TPU costs ~32 ms of round-trip
latency per array (docs/PERF.md); `copy_to_host_async` starts the
transfer without blocking, so a later `np.asarray` only waits for
completion. One audited home for the idiom — used by the eval loop,
the embed sweep, and `cli predict`.
"""

from __future__ import annotations

import jax


def start_host_copies(tree) -> None:
    """Start async device->host copies for every jax array in ``tree``.

    Non-jax leaves (numpy arrays, scalars) are ignored. Safe on sharded
    arrays. Call before converting a batch of results with
    ``np.asarray`` so the transfers overlap instead of serializing.
    """
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array):
            try:
                leaf.copy_to_host_async()
            except Exception:  # committed-elsewhere edge cases: harmless
                pass
