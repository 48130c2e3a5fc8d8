"""Device mesh + sharding rules: the framework's "distributed backend".

The reference's distributed story is DDP/NCCL via HF accelerate
(`training/train_eval_loop.py:185-192`, `preprocessing/embed.py:36-79`).
The TPU-native equivalent is GSPMD: one `jax.sharding.Mesh` with a
``data`` axis (batch / DP) and a ``model`` axis (Megatron-style TP over the
ViT MLPs, attention heads, and the wide geocell layer). Gradients
all-reduce over ICI automatically; no hand-written collectives.

Sharding is expressed as path-pattern rules mapped onto the parameter tree —
the single place the layout lives. For ViT-L/14 on a single v5e chip TP=1
(the model fits easily); the `model` axis exists so the same step scales to
sliced meshes and to much wider geocell tables without code changes.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(num_devices: Optional[int] = None, tp: int = 1,
                axis_names: Tuple[str, str] = ("data", "model")) -> Mesh:
    """Create a (data, model) mesh over available devices.

    Args:
        num_devices: number of devices to use (default: all).
        tp: size of the model (tensor-parallel) axis; must divide the
            device count.
    """
    devices = jax.devices()
    n = num_devices or len(devices)
    if n % tp != 0:
        raise ValueError(f"tp={tp} must divide device count {n}")
    grid = np.array(devices[:n]).reshape(n // tp, tp)
    mesh = Mesh(grid, axis_names)
    if n > 1 and devices[0].platform == "tpu":
        # Multi-chip TPU: register the mesh so the model's 'flash'
        # attention runs under shard_map (pallas_call rejects sharded
        # avals under GSPMD jit; docs/SHARDING.md). CPU test meshes
        # stay unregistered — their towers run attn_impl='xla', and a
        # process-global registration would leak across tests.
        from pigeon_tpu.kernels import flash_attention

        flash_attention.set_attention_mesh(mesh, axis_names[0],
                                           axis_names[1])
    return mesh


#: (regex over '/'-joined param path, PartitionSpec) — first match wins.
#: Encoder leaves carry a leading stacked-layer axis (None in the spec).
#: Specs follow Megatron TP: qkv/fc1 split the output feature dim, out/fc2
#: split the input feature dim so each pair needs a single all-reduce.
DEFAULT_RULES: Sequence[Tuple[str, P]] = (
    (r".*encoder/layers/attn/(q_proj|k_proj|v_proj)/kernel", P(None, None, "model")),
    (r".*encoder/layers/attn/(q_proj|k_proj|v_proj)/bias", P(None, "model")),
    (r".*encoder/layers/attn/out_proj/kernel", P(None, "model", None)),
    (r".*encoder/layers/fc1/kernel", P(None, None, "model")),
    (r".*encoder/layers/fc1/bias", P(None, "model")),
    (r".*encoder/layers/fc2/kernel", P(None, "model", None)),
    (r".*head/cell_layer/kernel", P(None, "model")),
    (r".*head/cell_layer/bias", P("model")),
    (r".*token_embed/embedding", P("model", None)),
)


def sharding_rules():
    return DEFAULT_RULES


def spec_for_path(path: str,
                  rules: Sequence[Tuple[str, P]] = DEFAULT_RULES) -> P:
    """PartitionSpec for a '/'-joined parameter path (default: replicated)."""
    for pattern, spec in rules:
        if re.fullmatch(pattern, path):
            return spec
    return P()


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "name", p)))
                    for p in path)


def param_specs(params, rules: Sequence[Tuple[str, P]] = DEFAULT_RULES):
    """Pytree of PartitionSpecs matching ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: spec_for_path(_path_str(path), rules), params)


def shard_params(params, mesh: Mesh,
                 rules: Sequence[Tuple[str, P]] = DEFAULT_RULES):
    """Device-put ``params`` onto ``mesh`` according to the rules."""
    specs = param_specs(params, rules)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def fsdp_param_specs(params, mesh: Mesh,
                     rules: Sequence[Tuple[str, P]] = DEFAULT_RULES,
                     min_size: int = 1 << 14):
    """ZeRO/FSDP-style specs: TP rules + ``data``-axis weight sharding.

    Each leaf keeps its tensor-parallel spec and additionally shards its
    largest still-unsharded axis over the ``data`` mesh axis (when that
    axis size divides the dim), so parameters — and, via
    :func:`opt_state_specs`, optimizer moments and accumulation buffers —
    are stored 1/dp-th per device instead of replicated. XLA inserts the
    all-gather before use and reduce-scatters the gradients (the ZeRO-3
    communication pattern) automatically under GSPMD.

    Leaves smaller than ``min_size`` elements stay on their TP spec alone:
    sharding tiny biases/LN scales saves nothing and costs a collective.
    """
    import math

    data_axis = mesh.axis_names[0]
    dp = mesh.shape[data_axis]

    def one(path, x):
        spec = spec_for_path(_path_str(path), rules)
        entries = list(spec) + [None] * (len(x.shape) - len(spec))
        if dp == 1 or math.prod(x.shape) < min_size:
            return spec
        free = [d for d in range(len(entries))
                if entries[d] is None and x.shape[d] % dp == 0]
        if not free:
            return spec
        d = max(free, key=lambda i: x.shape[i])
        entries[d] = data_axis
        return P(*entries)

    return jax.tree_util.tree_map_with_path(one, params)


def opt_state_specs(opt_state, params, specs):
    """Specs for an optax state tree mirroring ``params`` shardings.

    Optimizer-state leaves that mirror a parameter (Adam's mu/nu,
    MultiSteps' accumulated grads) sit under paths ending in the full
    parameter path — those inherit the parameter's spec (matched on the
    longest path suffix at a ``/`` boundary, with a shape check).
    Everything else (step counts, scalars) replicates.
    """
    by_path = {}
    flat_params = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_specs = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda s: isinstance(s, P))
    for (path, leaf), spec in zip(flat_params, flat_specs):
        by_path[_path_str(path)] = (tuple(leaf.shape), spec)

    def one(path, x):
        s = _path_str(path)
        best = None
        for ppath, (shape, spec) in by_path.items():
            if tuple(getattr(x, "shape", ())) != shape:
                continue
            if s == ppath or s.endswith("/" + ppath):
                if best is None or len(ppath) > len(best[0]):
                    best = (ppath, spec)
        return best[1] if best else P()

    return jax.tree_util.tree_map_with_path(one, opt_state)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays shard their leading axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch, mesh: Mesh):
    """Device-put a batch pytree with leading-axis data parallelism.

    Arrays whose leading dim does not divide the data axis (ragged tail
    batches, e.g. the last eval batch) are replicated instead — a
    non-divisible NamedSharding is an error, and a tail shape triggers
    a fresh compile regardless of placement."""
    sh = batch_sharding(mesh)
    repl = NamedSharding(mesh, P())
    data = mesh.shape[mesh.axis_names[0]]

    def put(x):
        if getattr(x, "ndim", 0) == 0:
            return x
        target = sh if x.shape[0] % data == 0 else repl
        return jax.device_put(x, target)

    return jax.tree_util.tree_map(put, batch)
