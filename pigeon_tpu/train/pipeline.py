"""Pipeline parallelism over the scan-stacked ViT encoder.

The reference has NO pipeline parallelism (SURVEY §2.2: its only model
execution parallelism is DDP — `training/train_eval_loop.py:185-192`;
ViT-L/14 fits one device). This module exists for larger towers and more
chips, completing the framework's parallelism matrix (DP `train/mesh.py`,
TP Megatron rules ibid., multi-host `train/multihost.py`, PP here).

Design — TPU-native, not a port of any GPU pipeline runtime:

  * the encoder's `nn.scan`-stacked layer axis (`models/clip.py::
    TransformerStack`) is sharded over a ``stage`` mesh axis — each stage
    holds a contiguous slice of layers, exactly the cut points
    `models/segmented.py::segment_boundaries` defines;
  * `shard_map` runs a GPipe fill/drain schedule: every step each stage
    scans its local layers over its activation, then hands it to the next
    stage with `jax.lax.ppermute` (one hop over ICI);
  * microbatches keep stages busy; the bubble is the usual (pp-1)/(M+pp-1)
    fraction;
  * the whole schedule is differentiable (`ppermute`/`scan`/`where`
    transpose cleanly), so the same function serves training — gradients
    flow back through the reversed permutation with no custom VJP.

Math parity with the sequential encoder is exact (layer order preserved;
per-layer computation is the SAME `TransformerLayer.apply`) and pinned by
tests/test_pipeline.py on an 8-device CPU mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # moved to jax.experimental.shard_map -> jax.shard_map across versions
    from jax import shard_map as _shard_map_mod  # type: ignore

    shard_map = _shard_map_mod  # pragma: no cover
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from pigeon_tpu.config import VisionConfig
from pigeon_tpu.models.clip import PatchEmbed, TransformerLayer


def create_pipeline_mesh(pp: int, num_devices: Optional[int] = None,
                         tp: int = 1,
                         axis_names: Tuple[str, str, str]
                         = ("data", "stage", "model")) -> Mesh:
    """(data, stage, model) mesh: batch over ``data``, encoder depth over
    ``stage``, Megatron TP over ``model``.

    The ``stage`` hops should ride ICI — `jax.devices()` order is
    ICI-contiguous on TPU slices, so stage and model are the
    fastest-varying axes and each ppermute hop is a near neighbor. The
    pipeline runs ``stage`` (and ``data``) as MANUAL shard_map axes while
    ``model`` stays an AUTO axis: GSPMD places the TP collectives inside
    each stage's layer scan from the parameter shardings alone.
    """
    devices = jax.devices()
    n = num_devices or len(devices)
    if n % (pp * tp) != 0:
        raise ValueError(f"pp*tp={pp * tp} must divide device count {n}")
    grid = np.array(devices[:n]).reshape(n // (pp * tp), pp, tp)
    return Mesh(grid, axis_names)


def make_layer_fn(cfg: VisionConfig, dtype: Any = jnp.float32,
                  attn_impl: str = "xla") -> Callable:
    """Single-encoder-layer apply: ``(layer_params, h) -> h``.

    `layer_params` is one slice of the stacked `encoder/layers` tree —
    the same computation `TransformerStack` scans, applied standalone.
    """
    layer = TransformerLayer(
        num_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        hidden_act=cfg.hidden_act,
        layer_norm_eps=cfg.layer_norm_eps,
        dtype=dtype,
        attn_impl=attn_impl,
    )

    def layer_fn(layer_params, h):
        return layer.apply({"params": layer_params}, h)

    return layer_fn


def pipeline_stack_apply(layer_fn: Callable, stacked_params, x, mesh: Mesh,
                         num_microbatches: int, *,
                         stage_axis: str = "stage",
                         data_axis: str = "data"):
    """Run a stacked layer scan as a stage pipeline.

    Args:
        layer_fn: ``(layer_params, h) -> h`` for ONE layer.
        stacked_params: pytree with a leading layer axis (L, ...); L must
            divide evenly by the stage-axis size. Stage ``s`` executes the
            contiguous slice ``[s*L/pp, (s+1)*L/pp)`` — sequential layer
            order is preserved.
        x: global activations ``(B, ...)``; B must divide by
            ``num_microbatches`` (and the per-data-shard batch too).
        num_microbatches: GPipe microbatch count M. Bubble fraction is
            (pp-1)/(M+pp-1) — raise M to amortize.

    Returns:
        ``(B, ...)`` activations, equal to scanning all L layers
        sequentially.
    """
    pp = mesh.shape[stage_axis]
    num_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if num_layers % pp != 0:
        raise ValueError(f"{num_layers} layers not divisible by pp={pp}")
    m = num_microbatches
    b = x.shape[0]
    if b % m != 0:
        raise ValueError(f"batch {b} not divisible by microbatches {m}")
    x_mb = x.reshape(m, b // m, *x.shape[1:])

    # Parameter in_specs carry only the MANUAL axes (the stage split on
    # the layer dim); TP shardings on other mesh axes stay with the
    # arrays and are handled by GSPMD as auto axes.
    param_specs = jax.tree_util.tree_map(lambda _: P(stage_axis),
                                         stacked_params)
    perm = [(i, (i + 1) % pp) for i in range(pp)]
    steps = m + pp - 1

    sm_kwargs = {}
    extra_axes = [a for a in mesh.axis_names
                  if a not in (stage_axis, data_axis)
                  and mesh.shape[a] > 1]
    if extra_axes:
        # Leave non-pipeline axes (e.g. 'model' TP) to GSPMD. Requires
        # the partial-manual shard_map API (jax >= 0.8 `axis_names`).
        sm_kwargs["axis_names"] = {stage_axis, data_axis}

    @partial(shard_map, mesh=mesh,
             in_specs=(param_specs, P(None, data_axis)),
             out_specs=P(None, data_axis), **sm_kwargs)
    def run(local_params, mb):
        stage = jax.lax.axis_index(stage_axis)

        def stage_scan(h):
            def body(h, lp):
                return layer_fn(lp, h), None

            h, _ = jax.lax.scan(body, h, local_params)
            return h

        def step(carry, t):
            state, outs = carry
            # Fill: stage 0 ingests microbatch t while any remain.
            inj = jax.lax.dynamic_index_in_dim(
                mb, jnp.clip(t, 0, m - 1), keepdims=False)
            state = jnp.where(stage == 0, inj, state)
            state = stage_scan(state)
            # Drain: the last stage emits microbatch t-(pp-1) once the
            # pipeline is full. (Values wrapping last->0 after the fill
            # phase are dead: they would reach the last stage only after
            # the loop ends.)
            out_idx = jnp.clip(t - (pp - 1), 0, m - 1)
            prev = jax.lax.dynamic_index_in_dim(outs, out_idx,
                                                keepdims=False)
            take = jnp.logical_and(stage == pp - 1, t >= pp - 1)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(take, state, prev), out_idx, 0)
            state = jax.lax.ppermute(state, stage_axis, perm)
            return (state, outs), None

        init = (jnp.zeros_like(mb[0]), jnp.zeros_like(mb))
        # The carry varies per stage; zeros start out stage-invariant —
        # mark them varying so jax 0.9's manual-axes typing accepts the
        # scan (older versions: pvary; no-op where unsupported).
        pcast = getattr(jax.lax, "pcast", None)
        if pcast is not None:
            init = jax.tree_util.tree_map(
                lambda a: pcast(a, (stage_axis,), to="varying"), init)
        elif hasattr(jax.lax, "pvary"):  # pragma: no cover
            init = jax.tree_util.tree_map(
                lambda a: jax.lax.pvary(a, (stage_axis,)), init)
        (_, outs), _ = jax.lax.scan(step, init, jnp.arange(steps))
        # Only the last stage holds real outputs; replicate across stages.
        outs = jax.lax.psum(
            jnp.where(stage == pp - 1, outs, jnp.zeros_like(outs)),
            stage_axis)
        return outs

    y = run(stacked_params, x_mb)
    return y.reshape(b, *x.shape[1:])


def shard_pipeline_params(tower_params, mesh: Mesh,
                          stage_axis: str = "stage"):
    """Device-put tower params: stacked encoder layers split over the
    stage axis; when the mesh has a ``model`` axis of size > 1, the
    Megatron TP rules (`train/mesh.py::DEFAULT_RULES`) apply to the
    remaining dims (their leading layer-axis entry becomes the stage
    split). Everything else replicated."""
    from pigeon_tpu.train.mesh import spec_for_path

    tp = int(mesh.shape.get("model", 1))

    def put(path, x):
        names = [str(getattr(p, "key", getattr(p, "name", p)))
                 for p in path]
        if "layers" in names:
            spec = P(stage_axis)
            if tp > 1:
                rule = spec_for_path("encoder/layers/"
                                     + "/".join(names[names.index("layers")
                                                      + 1:]))
                if len(rule) > 0:   # rule[0] is the stacked layer axis
                    spec = P(stage_axis, *rule[1:])
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, tower_params)


def pipeline_vision_forward(cfg: VisionConfig, tower_params, pixel_values,
                            mesh: Mesh, num_microbatches: int,
                            dtype: Any = jnp.float32,
                            attn_impl: str = "xla"):
    """`CLIPVisionTower.__call__` with the encoder stack pipelined.

    Pre (patch embed + CLS + positions + pre-LN) and post (CLS post-LN)
    are O(B·S·d) — negligible next to the 24-layer encoder — and run
    data-parallel outside the pipeline, re-applying the SAME submodules
    on the same param subtrees (the `models/segmented.py` decomposition).
    This re-composition necessarily mirrors `CLIPVisionTower.__call__`
    (a Flax Module's param creation can't be shared with a functional
    path); drift is caught by the exact-parity tests in
    tests/test_pipeline.py, which compare against the Module directly.

    Returns ``(last_hidden_state, pooled)`` — identical to
    `models.clip.CLIPVisionTower.apply`.
    """
    import flax.linen as nn

    b = pixel_values.shape[0]
    patches = PatchEmbed(
        features=cfg.hidden_size, patch_size=cfg.patch_size,
        use_bias=False, dtype=dtype,
    ).apply({"params": tower_params["patch_embed"]},
            pixel_values.astype(dtype))
    cls = jnp.broadcast_to(tower_params["cls_token"].astype(dtype),
                           (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, patches], axis=1)
    x = x + tower_params["pos_embed"].astype(dtype)
    ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                      param_dtype=jnp.float32)
    x = ln.apply({"params": tower_params["pre_ln"]}, x)

    layer_fn = make_layer_fn(cfg, dtype=dtype, attn_impl=attn_impl)
    x = pipeline_stack_apply(layer_fn,
                             tower_params["encoder"]["layers"],
                             x, mesh, num_microbatches)

    pooled = ln.apply({"params": tower_params["post_ln"]}, x[:, 0])
    return x, pooled


# ---------------------------------------------------------------------------
# Training with the pipelined encoder
# ---------------------------------------------------------------------------


def create_pipeline_train_state(rng, cfg: VisionConfig, head_cfg, optimizer,
                                example_pixels, mesh: Mesh,
                                dtype: Any = jnp.float32):
    """TrainState for the pipelined tower+head: tower layers sharded over
    ``stage``, everything else (head, pre/post, optimizer scalars)
    replicated; optimizer moments inherit their parameter's layout."""
    from pigeon_tpu.models.clip import CLIPVisionTower
    from pigeon_tpu.models.geocell_head import GeocellHead
    from pigeon_tpu.train.train_loop import TrainState

    tower = CLIPVisionTower(cfg, dtype=dtype)
    head = GeocellHead(head_cfg, dtype=dtype)
    tower_params = jax.jit(tower.init)(rng, example_pixels)["params"]
    emb = jnp.zeros((example_pixels.shape[0], cfg.hidden_size))
    head_params = jax.jit(head.init)(rng, emb)["params"]
    params = {"tower": shard_pipeline_params(tower_params, mesh),
              "head": jax.device_put(
                  head_params, NamedSharding(mesh, P()))}
    # zeros_like under jit preserves each leaf's sharding, so adamw
    # moments land stage-sharded alongside their parameters.
    opt_state = jax.jit(optimizer.init)(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state)


def make_pipeline_train_step(cfg: VisionConfig, head_cfg, geocells,
                             optimizer, mesh: Mesh, num_microbatches: int,
                             dtype: Any = jnp.float32,
                             attn_impl: str = "xla") -> Callable:
    """Jitted train step with the encoder pipelined over ``stage``.

    Same objective as `train_loop.make_train_step` (smoothed-CE +
    multi-task, `models/geocell_head.py::geocell_loss`); the backward
    through the pipeline reverses the ppermute chain automatically.
    Signature: ``(state, batch, rng) -> (state, metrics)``.
    """
    import optax

    from pigeon_tpu.models.embedder import token_mean_embedding
    from pigeon_tpu.models.geocell_head import GeocellHead, geocell_loss

    geocells = jnp.asarray(geocells, jnp.float32)
    head = GeocellHead(head_cfg, dtype=dtype)

    def loss_fn(params, batch, rng):
        hidden, _ = pipeline_vision_forward(
            cfg, params["tower"], batch["inputs"], mesh,
            num_microbatches, dtype=dtype, attn_impl=attn_impl)
        emb = token_mean_embedding(hidden)
        out = head.apply({"params": params["head"]}, emb,
                         deterministic=False, rngs={"dropout": rng})
        return geocell_loss(
            out, geocells, head_cfg,
            labels_lla=batch.get("labels"),
            labels_clf=batch.get("labels_clf"),
            labels_multi_task=batch.get("labels_multi_task"),
            labels_climate=batch.get("labels_climate"),
            labels_month=batch.get("labels_month"))

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        grads, parts = jax.grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), parts

    return train_step
