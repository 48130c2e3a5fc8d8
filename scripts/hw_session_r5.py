"""Round-5 hardware measurement session — the fused-backward A/B queue.

One process, priority order, results flushed as JSON lines (same log
protocol as `hw_session_r4.py`; decisions via `hw_decide_r4.py`, whose
parser understands the new three-part "impl:remat:bwd" train rows).

  0. fast headline smoke: one 2-window bench.py run at the shipping
     default (flash_fused bf16 bs48) — a flapping tunnel still yields
     a driver-comparable e2e number in the first minutes;
  1. fused QKV BACKWARD component A/B (`bench_attn_qkv_bwd.py`):
     grad parity of `_fused_qkv_bwd_kernel` on real Mosaic (the one
     thing interpret mode can't check — CLAUDE.md rule 4) + timing of
     flash_sep_proj vs fused_bwd_xla vs fused_bwd_g{2,4,8};
  2. training A/B: flash:full (standing 81.7 baseline) vs the fused
     custom_vjp with the kernel backward across remat policies —
     flash_fused:full:kernel, flash_fused:attn_out:kernel,
     flash_fused:none:kernel ('none' failed remote compile in r4 with
     the XLA backward; the kernel backward shrinks the graph, retry);
  3. int8 headline re-cert (VERDICT r3 item 8 — every HW session):
     the component parity record (`bench_attn_qkv_fused_int8.py`)
     plus one BENCH_QUANT=1 bench.py at the bs32 optimum;
  4. product eval re-cert: bf16 bs48 + int8 bs32 (standing 362/530);
  5. pretrain with the step-2 training winner (parses this process's
     own log) vs the standing 77.4 — only if the winner flipped.

Afterwards: `python scripts/hw_decide_r4.py /tmp/hw_session_r5.log`.
FLIP CHECKLIST if the kernel backward wins step 2: `cli/run.py::
_attn_impl` train return -> 'flash_fused' + set PIGEON_FUSED_BWD
default to 'kernel' in `_fused_qkv_bwd` (flip the env default, keep
the knob), bench_train/CLAUDE.md/PERF.md numbers.

Env: HW_BUDGET_S (default 7200), HW_STEPS (comma list, default all).
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
BUDGET = float(os.environ.get("HW_BUDGET_S", "7200"))


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
    """Set env vars for a block, RESTORING prior values on exit (an
    operator-exported override must survive the session)."""
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


@step(0, "fast headline smoke (flash_fused bf16 bs48, 2 windows)")
def s0():
    bench = _load(os.path.join(ROOT, "bench.py"), "bench_smoke")
    with _env(BENCH_WINDOWS="2"):
        bench.main()


@step(1, "fused QKV backward component A/B + Mosaic parity")
def s1():
    _script("bench_attn_qkv_bwd.py").main()


@step(2, "training A/B: flash:full vs kernel-backward fused")
def s2():
    # 'flash_fused:full' (XLA backward) was measured in r4 (76.4) —
    # not re-run; the kernel rows are the new information. remat=none
    # with the kernel backward stores only per-layer x AND skips the
    # outer-checkpoint re-forward — the largest possible win if it
    # compiles (r4's XLA-backward 'none' drew HTTP 500).
    with _env(BENCH_ATTN=("flash:full,flash_fused:full:kernel,"
                          "flash_fused:attn_out:kernel,"
                          "flash_fused:none:kernel")):
        _script("bench_train.py").main()


@step(3, "int8 re-cert: component parity + bs32 headline")
def s3():
    _script("bench_attn_qkv_fused_int8.py").main()
    bench = _load(os.path.join(ROOT, "bench.py"), "bench_int8")
    with _env(BENCH_QUANT="1", BENCH_BATCH="32", BENCH_ATTN=None):
        bench.main()


@step(4, "product eval re-cert (bf16 bs48 + int8 bs32)")
def s4():
    bench = _load(os.path.join(ROOT, "scripts", "bench_eval.py"),
                  "bench_eval_r5")
    for env in ({"BENCH_ATTN": "flash_fused", "BENCH_BATCH": "48",
                 "BENCH_QUANT": None},
                {"BENCH_QUANT": "1", "BENCH_BATCH": "32",
                 "BENCH_ATTN": None}):
        try:
            with _env(**env):
                bench.main()
        except Exception:  # noqa: BLE001
            traceback.print_exc()
            print(f"## eval {env} FAILED — next", flush=True)


@step(5, "pretrain with the step-2 winner (only if flipped)")
def s5():
    impl, remat, bwd = "flash", "full", None
    try:
        decider = _script("hw_decide_r4.py")
        with open(os.environ.get("HW_LOG",
                                 "/tmp/hw_session_r5.log")) as f:
            train = decider.parse(f)["train"]
        if train:
            parts = max(train, key=train.get)[0].split(":")
            impl, remat = parts[0], parts[1]
            bwd = parts[2] if len(parts) > 2 else None
    except Exception:  # noqa: BLE001 — no log (manual run): baseline
        traceback.print_exc()
    if (impl, remat, bwd) == ("flash", "full", None):
        print("## pretrain: train winner unchanged (flash:full) — "
              "standing 77.4 stands, skipping", flush=True)
        return
    print(f"## pretrain winner: {impl}:{remat}"
          f"{':' + bwd if bwd else ''}", flush=True)
    with _env(BENCH_ATTN=impl, BENCH_REMAT=remat, BENCH_BATCH="32",
              PIGEON_FUSED_BWD=bwd):
        _script("bench_pretrain.py").main()


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
