"""Round-6 hardware measurement session — fill-in sweeps.

One process, priority order, results flushed as JSON lines (same log
protocol as `hw_session_r4/r5.py`). Everything here is a FILL-IN of a
measured curve, not a new A/B — the r4/r5 sessions settled the route
defaults (flash_fused everywhere, kernel backward, attn_out remat);
this queue asks whether any standing batch optimum is a local max of
an under-sampled curve:

  0. fast headline smoke: one 2-window bench.py at the shipping default
     (flash_fused bf16 bs48) — a flapping tunnel still yields a
     driver-comparable e2e number in the first minutes;
  1. pretrain batch sweep bs48/bs64 under the r5 winner route
     (flash_fused + remat=attn_out + kernel backward): the FINETUNE
     optimum moved 32 -> 48 under the same route (87.67 -> 88.3) and
     pretrain was only ever measured at bs32 (82.89) / bs16 (72.1);
     attn_out's lighter footprint should admit bs48 here too;
  2. int8 inference fill-in bs36/bs40: the standing curve is
     bs24 553.7 / bs32 565.9-570.4 / bs48 408 (VMEM spill) — the
     32->48 gap is unsampled and the spill edge unknown;
  3. int8 product-eval leg at the new optimum ONLY IF step 2 moved it
     by >1% (else the standing 530-539 bs32 stands);
  4. bf16 inference fill-in bs40/bs56 (budget-gated, lowest value:
     the 374.8 bs48 peak is bracketed by 368.4/364.1).

Afterwards: update docs/PERF.md tables + any default whose optimum
moved (`bench.py` default_batch, `evaluate --quant` batch, CLAUDE.md
numbers). Protocol per CLAUDE.md: chained dispatches, one scalar
readback per window, ONE TPU process at a time, never compare
`compile=` across sessions.

Env: HW_BUDGET_S (default 5400), HW_STEPS (comma list, default all),
HW_LOG (where step 3 reads step 2's rows from; default
/tmp/hw_session_r6.log — run with `tee` to that path).
"""

from __future__ import annotations

import contextlib
import importlib.util
import json
import os
import re
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

START = time.time()
BUDGET = float(os.environ.get("HW_BUDGET_S", "5400"))


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
    bench = _load(os.path.join(ROOT, "bench.py"), "bench_smoke_r6")
    with _env(BENCH_WINDOWS="2", BENCH_QUANT=None, BENCH_BATCH=None,
              BENCH_ATTN=None):
        bench.main()


@step(1, "pretrain batch sweep bs48/bs64 (r5 winner route)")
def s1():
    for bs in ("48", "64"):
        try:
            with _env(BENCH_BATCH=bs, BENCH_ATTN="flash_fused",
                      BENCH_REMAT="attn_out", PIGEON_FUSED_BWD="kernel"):
                _script("bench_pretrain.py").main()
        except Exception:  # noqa: BLE001 — bs64 may OOM; keep going
            traceback.print_exc()
            print(f"## pretrain bs{bs} FAILED — next", flush=True)


@step(2, "int8 inference fill-in bs36/bs40")
def s2():
    for bs in ("36", "40"):
        try:
            bench = _load(os.path.join(ROOT, "bench.py"),
                          f"bench_int8_bs{bs}")
            with _env(BENCH_QUANT="1", BENCH_BATCH=bs, BENCH_ATTN=None):
                bench.main()
        except Exception:  # noqa: BLE001 — VMEM spill edge expected
            traceback.print_exc()
            print(f"## int8 bs{bs} FAILED — next", flush=True)


_INT8_RE = re.compile(
    r'"metric": "vit_l14_336_embed_classify_images_per_sec_per_chip'
    r'_bs(\d+)_[^"]*_int8", "value": ([0-9.]+)')
STANDING_INT8_BS32 = 565.9  # r4 optimum, r5 re-certs 568.8/570.4


@step(3, "int8 eval leg IF the bs36/40 fill-in moved the optimum >1%")
def s3():
    rows = {}
    try:
        with open(os.environ.get("HW_LOG", "/tmp/hw_session_r6.log")) as f:
            for m in _INT8_RE.finditer(f.read()):
                rows[int(m.group(1))] = float(m.group(2))
    except OSError:
        traceback.print_exc()
    best_bs, best = max(rows.items(), key=lambda kv: kv[1],
                        default=(32, 0.0))
    if best <= STANDING_INT8_BS32 * 1.01 or best_bs == 32:
        print(f"## int8 optimum unchanged (fill-in best bs{best_bs} "
              f"{best} vs standing bs32 {STANDING_INT8_BS32}) — "
              "skipping eval leg", flush=True)
        return
    print(f"## int8 fill-in WON at bs{best_bs} ({best}) — eval leg",
          flush=True)
    with _env(BENCH_QUANT="1", BENCH_BATCH=str(best_bs), BENCH_ATTN=None):
        _script("bench_eval.py").main()


@step(4, "bf16 inference fill-in bs40/bs56 (budget-gated)")
def s4():
    if time.time() - START > BUDGET * 0.6:
        print("## >60% budget spent — skipping the low-value bf16 "
              "fill-in", flush=True)
        return
    for bs in ("40", "56"):
        try:
            bench = _load(os.path.join(ROOT, "bench.py"),
                          f"bench_bf16_bs{bs}")
            with _env(BENCH_BATCH=bs, BENCH_QUANT=None, BENCH_ATTN=None):
                bench.main()
        except Exception:  # noqa: BLE001
            traceback.print_exc()
            print(f"## bf16 bs{bs} FAILED — next", flush=True)


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
