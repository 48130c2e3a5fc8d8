"""Multi-chip data-parallel inference throughput bench (ready-to-fire).

The 5,000 img/s north star (BASELINE.json) is ~10x past single-chip
speed of light at 336px (docs/PERF.md §SOL) — it is a MULTI-CHIP number:
~9 chips of the measured int8 rate (586.2 img/s/chip bs48, r7). This
script is the counterpart of `scripts/baseline_gate.py` for hardware:
virtual-mesh tested today (tests/test_bench_multichip.py), one knob to
run on a real mesh the day one exists. Reference scope: the embedding
sweep is the reference's only multi-GPU inference
(`preprocessing/embed.py:45-83`); this measures the same fan-out for the
serving/eval forward.

What it runs: the flagship embed+classify forward (bench.py's program)
with the batch GSPMD-sharded over the ``data`` mesh axis and params
replicated (TP optional via BENCH_TP — `train/mesh.py` Megatron rules).
On multi-chip TPU meshes `create_mesh` registers the attention-mesh so
the Pallas routes host under shard_map (`sharded_fused_qkv_mha[_int8]`,
docs/SHARDING.md) — the SAME kernels and defaults as single chip
(dryrun-certified: fused_err 9.5e-07 / int8_err 0.0).

Timing: bench.py's chained-dispatch protocol — async dispatches, ONE
fully-reduced scalar readback per window (the psum-to-replicated sum
drains every device's queue), median of BENCH_WINDOWS windows.

Env knobs:
  BENCH_BATCH     per-CHIP batch (route defaults mirror bench.py:
                  56 bf16 (r6) / 48 int8 (r7) single-chip optima; the
                  global batch is BENCH_BATCH x dp).
  BENCH_QUANT     (0) 1 = int8 W8A8 static route (serving default).
  BENCH_ATTN      (flash_fused) attention impl.
  BENCH_TP        (1) model-axis size; must divide the device count.
  BENCH_DEVICES   (all) devices to use.
  BENCH_ITERS     (16) dispatches per window; BENCH_WINDOWS (5).
  BENCH_TINY      (0) 1 = tiny tower + interpret-mode Pallas: the
                  virtual-mesh test path (CPU, any device count).
  BENCH_TRAIN     (0) 1 = measure the TRAINING step instead (flagship
                  SuperGuessr finetune step: forward + backward +
                  AdamW, the r8 route — flash_fused +
                  remat='attn_kernel' [BENCH_REMAT] + the fused
                  backward kernel [PIGEON_FUSED_BWD]). Per-chip batch
                  defaults to 48 (the operator optimum; the curve is
                  flat 94-95.5 across 32-64). bf16 only (int8 is a
                  serving route). SOL denominator: ~139 img/s/chip.
  BENCH_FSDP      (0, train only) 1 = ZeRO-3 storage: params + Adam
                  moments sharded over the data axis
                  (`mesh.fsdp_param_specs`); GSPMD inserts the
                  all-gather/reduce-scatter pattern.

Prints ONE JSON line: total img/s, per-chip img/s, per-chip MFU vs the
single-chip SOL, and chips_to_target = ceil(5000 / per_chip).
"""

from __future__ import annotations

import contextlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TARGET_IMAGES_PER_SEC = 5000.0
SOL_BF16 = 515.0
SOL_INT8 = 865.0
SOL_TRAIN = 139.0  # img/s/chip under attn_kernel remat (docs/PERF.md r8)


def _train_leg(vision_cfg, head_cfg, *, per_chip, dp, tp, n, iters,
               windows, attn_impl, tiny, interp_ctx) -> dict:
    """Multi-chip data-parallel TRAINING throughput (BENCH_TRAIN=1).

    The flagship finetune step (`train_loop.make_train_step`: forward +
    backward + AdamW) with the global batch GSPMD-sharded over ``data``
    and the r8 single-chip route (flash_fused + remat='attn_kernel' +
    the fused backward kernel) hosted per-shard under shard_map exactly
    as on one chip. BENCH_FSDP=1 additionally shards params + Adam
    moments over ``data`` (ZeRO-3 storage, `mesh.fsdp_param_specs`).
    Reference scope: the reference trains one process per GPU with DDP
    semantics (`training/train_eval_loop.py:215-223`); this is the same
    data-parallel step as one compiled SPMD program.
    """
    import contextlib
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pigeon_tpu.kernels import flash_attention as fa
    from pigeon_tpu.models.super_guessr import SuperGuessr
    from pigeon_tpu.train import create_train_state
    from pigeon_tpu.train.mesh import create_mesh, shard_batch
    from pigeon_tpu.train.train_loop import adamw, make_train_step

    # Tiny (virtual-mesh) runs default remat OFF: interpret-mode Pallas
    # carries an OrderedIOEffect that jax.checkpoint partial-eval
    # rejects (see tests/test_train_remat_fused.py's docstring) — a
    # real Mosaic mesh has no such effect and runs the r8 default.
    remat = os.environ.get("BENCH_REMAT",
                           "none" if tiny else "attn_kernel")
    fsdp = os.environ.get("BENCH_FSDP", "0") == "1"
    if fsdp and jax.default_backend() != "tpu" \
            and attn_impl.startswith("flash"):
        # Interpret-mode Pallas synchronizes logical devices through a
        # Python barrier; the ZeRO all-gather schedule starves it and
        # the process ABORTS. FSDP is a storage-layout leg — run it on
        # XLA attention off-TPU (a real Mosaic mesh needs no fallback).
        print("# BENCH_FSDP off-TPU: attention falls back to 'xla' "
              "(interpret-Pallas barrier deadlocks under the ZeRO "
              "all-gather schedule)", file=sys.stderr)
        attn_impl = "xla"
    size = vision_cfg.image_size
    batch = per_chip * dp

    mesh = create_mesh(num_devices=n, tp=tp)
    explicit_registry = (fa.attention_mesh(mesh)
                         if jax.default_backend() != "tpu" and n > 1
                         else contextlib.nullcontext())

    cells = np.stack([np.linspace(-170, 170, head_cfg.num_cells),
                      np.linspace(-55, 65, head_cfg.num_cells)],
                     -1).astype(np.float32)
    ks = jax.random.split(jax.random.PRNGKey(5), 7)
    host_batch = {
        "inputs": jax.random.normal(ks[0], (batch, size, size, 3),
                                    jnp.float32),
        "labels": jnp.stack(
            [jax.random.uniform(ks[1], (batch,), minval=-170, maxval=170),
             jax.random.uniform(ks[2], (batch,), minval=-55, maxval=65)],
            -1),
        "labels_clf": jax.random.randint(ks[3], (batch,), 0,
                                         head_cfg.num_cells),
        "labels_multi_task": jax.random.normal(ks[4], (batch, 6)),
        "labels_climate": jax.random.randint(ks[5], (batch,), 0, 28),
        "labels_month": jax.random.randint(ks[6], (batch,), 0, 12),
    }

    with explicit_registry, interp_ctx():
        model = SuperGuessr(vision_cfg, head_cfg, dtype=jnp.bfloat16,
                            attn_impl=attn_impl, remat=remat)
        opt = adamw(2e-5)
        state = create_train_state(
            jax.random.PRNGKey(0), model, opt,
            (jnp.zeros((2, size, size, 3)),), mesh=mesh, fsdp=fsdp)
        step = make_train_step(model, opt, head_cfg, cells)
        dev_batch = shard_batch(host_batch, mesh)
        rng = jax.random.PRNGKey(7)

        def window(k):
            nonlocal state
            m = None
            t0 = time.perf_counter()
            for _ in range(k):
                state, m = step(state, dev_batch, rng)
            # loss is a replicated scalar: reading it drains every
            # chip's queue (block_until_ready is a no-op through the
            # axon tunnel).
            loss = float(m["loss"])
            return time.perf_counter() - t0, loss

        t0 = time.perf_counter()
        window(1)
        compile_s = time.perf_counter() - t0
        window(2)

        timed = [window(iters) for _ in range(windows)]
    rates = sorted(batch * iters / t for t, _ in timed)
    rate = rates[len(rates) // 2]
    rate_per_chip = rate / n
    result = {
        "metric": "vit_l14_336_sharded_train_images_per_sec"
                  f"_n{n}_tp{tp}_bs{per_chip}x{dp}_{attn_impl}"
                  f"_remat-{remat}{'_fsdp' if fsdp else ''}"
                  f"{'_tiny' if tiny else ''}",
        "value": round(rate, 2),
        "unit": "images/sec",
        "per_chip": round(rate_per_chip, 2),
        "loss": round(timed[0][1], 3),
        "mfu_per_chip": (round(rate_per_chip / SOL_TRAIN, 4)
                         if not tiny else None),
    }
    print(json.dumps(result))
    print(f"# train devices={n} dp={dp} tp={tp} fsdp={fsdp} "
          f"global_batch={batch} remat={remat} "
          f"windows={[round(batch * iters / t, 1) for t, _ in timed]} "
          f"compile={compile_s:.1f}s", file=sys.stderr)
    return result


def main() -> dict:
    import jax

    tiny = os.environ.get("BENCH_TINY", "0") == "1"
    if tiny:
        # Virtual-mesh test path: honor forced CPU devices before any
        # backend init (the axon plugin ignores JAX_PLATFORMS).
        if "xla_force_host_platform_device_count" in os.environ.get(
                "XLA_FLAGS", ""):
            try:
                jax.config.update("jax_platforms", "cpu")
            except RuntimeError:
                pass

    import jax.numpy as jnp

    from pigeon_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pigeon_tpu.config import HeadConfig, VisionConfig, vit_l14_336_vision
    from pigeon_tpu.kernels import flash_attention as fa
    from pigeon_tpu.models.clip import CLIPVisionTower
    from pigeon_tpu.models.embedder import token_mean_embedding
    from pigeon_tpu.models.geocell_head import GeocellHead
    from pigeon_tpu.train.mesh import create_mesh, shard_params

    quant = os.environ.get("BENCH_QUANT", "0") == "1"
    train = os.environ.get("BENCH_TRAIN", "0") == "1"
    if train and quant:
        raise SystemExit("BENCH_TRAIN is bf16-only — int8 is a serving "
                         "route (unset BENCH_QUANT)")
    attn_impl = os.environ.get("BENCH_ATTN", "flash_fused")
    fused = attn_impl.startswith("flash_fused")
    if train:
        default_batch = "48" if fused else "32"
    elif quant:
        default_batch = "48" if fused else "24"
    else:
        default_batch = "56" if fused else "32"
    per_chip = int(os.environ.get("BENCH_BATCH", default_batch))
    tp = int(os.environ.get("BENCH_TP", "1"))
    n = int(os.environ.get("BENCH_DEVICES", str(len(jax.devices()))))
    iters = int(os.environ.get("BENCH_ITERS", "16"))
    windows = int(os.environ.get("BENCH_WINDOWS", "5"))
    dp = n // tp
    batch = per_chip * dp

    if tiny:
        vision_cfg = VisionConfig(image_size=32, patch_size=8,
                                  hidden_size=64, intermediate_size=128,
                                  num_layers=2, num_heads=4,
                                  projection_dim=32)
        head_cfg = HeadConfig(num_cells=32, embed_dim=64, panorama=False,
                              multi_task=True)
    else:
        vision_cfg = vit_l14_336_vision()
        head_cfg = HeadConfig(num_cells=2203, embed_dim=1024,
                              panorama=False, multi_task=True)
    size = vision_cfg.image_size
    embed_dim = head_cfg.embed_dim

    def interp_ctx():
        # Pallas under shard_map needs interpret mode off-TPU (the
        # virtual-mesh test); a real TPU mesh runs Mosaic natively.
        return (contextlib.nullcontext() if jax.default_backend() == "tpu"
                else pltpu.force_tpu_interpret_mode())

    if train:
        return _train_leg(vision_cfg, head_cfg, per_chip=per_chip, dp=dp,
                          tp=tp, n=n, iters=iters, windows=windows,
                          attn_impl=attn_impl, tiny=tiny,
                          interp_ctx=interp_ctx)

    tower_params = jax.jit(CLIPVisionTower(vision_cfg).init)(
        jax.random.PRNGKey(0), jnp.zeros((2, size, size, 3)))["params"]
    head_params = jax.jit(GeocellHead(head_cfg).init)(
        jax.random.PRNGKey(1), jnp.zeros((2, embed_dim)))["params"]

    if quant:
        from pigeon_tpu.models.quant import quantize_and_calibrate

        # Calibrate BEFORE the mesh registry exists: the dynamic-mode
        # calibration forward is a single-device program.
        dyn = CLIPVisionTower(vision_cfg, dtype=jnp.bfloat16,
                              attn_impl=attn_impl, quant=True)
        calib_px = jax.random.normal(jax.random.PRNGKey(7),
                                     (8, size, size, 3), jnp.float32)
        with interp_ctx():
            tower_params = quantize_and_calibrate(dyn, tower_params,
                                                  calib_px)
        tower = CLIPVisionTower(vision_cfg, dtype=jnp.bfloat16,
                                attn_impl=attn_impl, quant="static")
    else:
        tower = CLIPVisionTower(vision_cfg, dtype=jnp.bfloat16,
                                attn_impl=attn_impl)
    head = GeocellHead(head_cfg, dtype=jnp.bfloat16)

    # THE knob: `create_mesh` registers the attention mesh on multi-chip
    # TPU backends so the Pallas routes host under shard_map. Off-TPU
    # (virtual mesh) the registration is explicit + interpret mode.
    mesh = create_mesh(num_devices=n, tp=tp)
    explicit_registry = (fa.attention_mesh(mesh)
                         if jax.default_backend() != "tpu" and n > 1
                         else contextlib.nullcontext())

    params = shard_params({"tower": tower_params, "head": head_params},
                          mesh)
    data_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    def whole(p, px):
        h, _ = tower.apply({"params": p["tower"]}, px)
        emb = token_mean_embedding(h)
        out = head.apply({"params": p["head"]}, emb)
        return out.logits, emb

    with explicit_registry, interp_ctx():
        jitted = jax.jit(whole)
        scalarize = jax.jit(
            lambda a, b: a.astype(jnp.float32).sum()
            + b.astype(jnp.float32).sum(),
            out_shardings=replicated)

        pixels = [
            jax.device_put(
                jax.random.normal(jax.random.PRNGKey(i),
                                  (batch, size, size, 3), jnp.float32),
                data_sharding)
            for i in range(2)]

        def window(k):
            carry = None
            t0 = time.perf_counter()
            for i in range(k):
                logits, emb = jitted(params, pixels[i % 2])
                carry = scalarize(logits, emb)
            float(carry)   # replicated scalar: drains every chip's queue
            return time.perf_counter() - t0

        t0 = time.perf_counter()
        window(1)
        compile_s = time.perf_counter() - t0
        window(2)

        rates = sorted(batch * iters / window(iters)
                       for _ in range(windows))
    rate = rates[len(rates) // 2]
    rate_per_chip = rate / n
    sol = SOL_INT8 if quant else SOL_BF16
    result = {
        "metric": "vit_l14_336_sharded_infer_images_per_sec"
                  f"_n{n}_tp{tp}_bs{per_chip}x{dp}_{attn_impl}"
                  f"{'_int8' if quant else ''}{'_tiny' if tiny else ''}",
        "value": round(rate, 2),
        "unit": "images/sec",
        "per_chip": round(rate_per_chip, 2),
        "vs_baseline": round(rate / TARGET_IMAGES_PER_SEC, 4),
        "mfu_per_chip": round(rate_per_chip / sol, 4) if not tiny else None,
        "chips_to_target": (math.ceil(TARGET_IMAGES_PER_SEC
                                      / rate_per_chip)
                            if rate_per_chip > 0 else None),
    }
    print(json.dumps(result))
    print(f"# devices={n} dp={dp} tp={tp} global_batch={batch} "
          f"windows={[round(r, 1) for r in rates]} compile={compile_s:.1f}s",
          file=sys.stderr)
    return result


if __name__ == "__main__":
    main()
