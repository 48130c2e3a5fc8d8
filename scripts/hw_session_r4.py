"""Round-4 hardware measurement session — ALL pending A/Bs, one process.

The axon tunnel is shared and flaky; e2e comparisons are only honest
within one tunnel session (docs/PERF.md). This driver runs every
pending round-4 measurement in priority order IN-PROCESS so the
variants share a session, flushing results as it goes:

  0. fast headline smoke: one 2-window bench.py run at the current
     default (flash_fused) so a flapping tunnel still yields a
     driver-comparable e2e number in the first minutes;
  1. int8 fused QKV component bench (validates Mosaic int8 dot
     lowering — the one thing interpret mode can't check);
  2. QKV-fusion component bench incl. the LN-fusion A/B pair;
  3. fused LN+MLP component bench (validates scratch persistence +
     cross-chunk accumulation on real Mosaic, bf16 + int8 pairs);
  4. e2e bf16 bench sweep: flash_fused vs flash_fused_ln vs
     flash_fused_mlp vs flash_fused_block (mlp/block VMEM rejects
     retry once at PIGEON_MLP_CHUNK=256);
  5. e2e int8 bench: flash (current quant default) vs flash_fused
     (fused_qkv_mha_int8) vs flash_fused_mlp vs flash_fused_block;
  6. training A/B: flash vs the fused custom_vjp impls, crossed with
     remat='none' rows for the fused-mlp/block variants;
  7. e2e bf16 batch-size re-optimum for flash_fused (bs24/48/64);
  8. product eval path with the lazy-member refiner (bf16 bs32
     flash_fused + int8 bs24) vs the standing 304/418 img/s;
  9. pretrain bench with the step-6 training winner (parses this
     process's own log, HW_LOG overridable) vs the standing 77.4.

Afterwards run `python scripts/hw_decide_r4.py` on the log — it
applies the ROADMAP decision rule mechanically.

Env: HW_BUDGET_S (default 9000) — steps are skipped once the budget is
exhausted; HW_STEPS (comma list of step numbers to run, default all).
"""

from __future__ import annotations

import contextlib
import importlib.util
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

START = time.time()
BUDGET = float(os.environ.get("HW_BUDGET_S", "9000"))


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _script(fname):
    return _load(os.path.join(ROOT, "scripts", fname),
                 fname.replace(".py", ""))


def step(num, title):
    def deco(fn):
        fn._num, fn._title = num, title
        return fn
    return deco


@contextlib.contextmanager
def _env(**kv):
    """Set env vars for a block, RESTORING prior values on exit — a
    plain pop() would delete an operator-set override (e.g. an
    exported PIGEON_MLP_CHUNK=256) after the first use and silently
    change the config mid-session."""
    prior = {k: os.environ.get(k) for k in kv}
    for k, v in kv.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    try:
        yield
    finally:
        for k, v in prior.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


@step(0, "fast headline smoke (flash_fused, 2 windows)")
def s0():
    # The tunnel flaps: secure a driver-comparable headline number in
    # the first minutes of a recovered session, before the long sweeps.
    bench = _load(os.path.join(ROOT, "bench.py"), "bench_smoke")
    with _env(BENCH_WINDOWS="2"):
        bench.main()


@step(1, "int8 fused QKV component")
def s1():
    _script("bench_attn_qkv_fused_int8.py").main()


@step(2, "QKV fusion + LN A/B component")
def s2():
    _script("bench_attn_qkv_fused.py").main()


@step(3, "fused LN+MLP component")
def s3():
    _script("bench_mlp_fused.py").main()


def _e2e_sweep(tag, module_name, variants):
    """One bench.py run per attention impl; a variant that uses the
    fused MLP (chunk-512 VMEM budget is ~14-16 of ~16 MB, docs/PERF.md)
    retries ONCE at the documented PIGEON_MLP_CHUNK=256 fallback before
    being dropped, so a VMEM reject doesn't lose the whole variant."""
    bench = _load(os.path.join(ROOT, "bench.py"), module_name)
    for attn in variants:
        attempts = [None]
        if (attn in ("flash_fused_mlp", "flash_fused_block")
                and os.environ.get("PIGEON_MLP_CHUNK") != "256"):
            attempts.append("256")
        for chunk in attempts:
            if chunk is not None:
                print(f"## {tag} {attn}: retry with MLP chunk {chunk}",
                      flush=True)
            overrides = {"BENCH_ATTN": attn}
            if chunk is not None:
                overrides["PIGEON_MLP_CHUNK"] = chunk
            try:
                with _env(**overrides):
                    bench.main()
                break
            except Exception:  # noqa: BLE001 — e.g. VMEM compile reject
                traceback.print_exc()
                print(f"## {tag} {attn}"
                      f"{' (chunk ' + chunk + ')' if chunk else ''} "
                      "FAILED", flush=True)


@step(4, "e2e bf16 attn sweep")
def s4():
    _e2e_sweep("e2e", "bench_e2e",
               ("flash_fused", "flash_fused_ln", "flash_fused_mlp",
                "flash_fused_block"))


@step(5, "e2e int8: flash vs fused")
def s5():
    with _env(BENCH_QUANT="1"):
        _e2e_sweep("int8 e2e", "bench_e2e_int8",
                   ("flash", "flash_fused", "flash_fused_mlp",
                    "flash_fused_block"))


@step(6, "training attn A/B (impl x remat)")
def s6():
    # remat='none' rows: under the fused custom_vjp layers the outer
    # jax.checkpoint re-runs the Pallas forward the vjp never reads —
    # dropping it stores only per-layer block inputs (~0.9 GB at bs32)
    # and removes a third forward-equivalent pass. 'flash:none' is NOT
    # listed (XLA MLP + separate projections under no-remat failed
    # remote compile in r2 — docs/PERF.md); failures skip per-variant.
    with _env(BENCH_ATTN=(
            "flash,flash_fused,flash_fused_ln,flash_fused_mlp,"
            "flash_fused_block,flash_fused:none,flash_fused_mlp:none,"
            "flash_fused_block:none")):
        _script("bench_train.py").main()


@step(8, "product eval (lazy refiner): bf16 bs32 + int8 bs24")
def s8():
    # The refiner's member gathers are now deferred to the selected
    # candidate columns (models/refiner.py) — re-measure the product
    # eval path (standing numbers: 304 bf16 bs32 / 418 int8 bs24).
    bench = _load(os.path.join(ROOT, "scripts", "bench_eval.py"),
                  "bench_eval_r4")
    # Pin BOTH knobs per leg — an ambient BENCH_BATCH/BENCH_ATTN from a
    # manual run must not leak in, or the rows stop being comparable to
    # the standing numbers.
    for env in ({"BENCH_ATTN": "flash_fused", "BENCH_BATCH": "32",
                 "BENCH_QUANT": None},
                {"BENCH_QUANT": "1", "BENCH_BATCH": "24",
                 "BENCH_ATTN": "flash"}):
        try:
            with _env(**env):
                bench.main()
        except Exception:  # noqa: BLE001
            traceback.print_exc()
            print(f"## eval {env} FAILED — next", flush=True)


@step(9, "pretrain with the step-6 training winner")
def s9():
    # Pretrain shares the tower: if a fused impl/remat combo won the
    # training A/B, confirm it carries to the contrastive step
    # (standing number 77.4 img/s with flash:full). Reads this
    # process's own accumulated log via the decision parser.
    impl, remat = "flash", "full"
    try:
        decider = _script("hw_decide_r4.py")
        with open(os.environ.get("HW_LOG", "/tmp/hw_session_r4.log")) as f:
            train = decider.parse(f)["train"]
        if train:
            best_key = max(train, key=train.get)  # ("impl:remat", bs)
            impl, remat = best_key[0].split(":")
    except Exception:  # noqa: BLE001 — no log (manual run): baseline
        traceback.print_exc()
    print(f"## pretrain winner: {impl}:{remat}", flush=True)
    with _env(BENCH_ATTN=impl, BENCH_REMAT=remat, BENCH_BATCH="32"):
        _script("bench_pretrain.py").main()


@step(7, "e2e bf16 batch-size re-optimum (flash_fused)")
def s7():
    # ROADMAP r4 #2: the serial-VPU-share argument that picked bs32
    # weakened once the projections moved in-kernel — re-find the
    # optimum for the validated default impl.
    bench = _load(os.path.join(ROOT, "bench.py"), "bench_e2e_bs")
    for bs in ("24", "48", "64"):
        try:
            with _env(BENCH_ATTN="flash_fused", BENCH_BATCH=bs):
                bench.main()
        except Exception:  # noqa: BLE001
            traceback.print_exc()
            print(f"## bs{bs} FAILED — next", flush=True)


def main() -> None:
    steps = sorted(
        (v for v in globals().values() if hasattr(v, "_num")),
        key=lambda f: f._num)
    only = os.environ.get("HW_STEPS")
    if only:
        keep = {int(s) for s in only.split(",")}
        steps = [s for s in steps if s._num in keep]
    for fn in steps:
        elapsed = time.time() - START
        if elapsed > BUDGET:
            print(f"## budget exhausted ({elapsed:.0f}s) — skipping "
                  f"step {fn._num}+", flush=True)
            break
        print(f"## step {fn._num}: {fn._title} (t={elapsed:.0f}s)",
              flush=True)
        try:
            fn()
        except Exception:  # noqa: BLE001
            traceback.print_exc()
            print(f"## step {fn._num} FAILED — continuing", flush=True)
    print(f"## session done (t={time.time() - START:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
