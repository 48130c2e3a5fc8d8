"""r6 follow-up B: product legs at the two new batch optima.

The r6 fill-in moved the forward optima (int8 bs32 -> bs40 at 577.9;
bf16 bs48 -> bs56 at 378.4 — a grid-divisibility bump: bs52 and bs60
both measure LOWER). Before the defaults flip, measure the product
paths at the new points:

  1. bf16 product eval at bs56 (standing 361.8 at bs48) — the int8
     eval leg at bs40 already ran in the session proper (544.4);
  2. training step at bs56 (r5 swept 24/32/48/64: 85.75/87.67/88.3/
     86.8 — if the forward's bs56 bump survives the backward, the
     operator guidance moves too).

One process, chained protocol, JSON lines.
"""

from __future__ import annotations

import contextlib
import importlib.util
import os
import sys
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


@contextlib.contextmanager
def _env(**kv):
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


def _load(fname, tag):
    spec = importlib.util.spec_from_file_location(
        tag, os.path.join(ROOT, fname))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    print("## leg eval bf16 bs56", flush=True)
    try:
        with _env(BENCH_QUANT=None, BENCH_BATCH="56",
                  BENCH_ATTN="flash_fused"):
            _load(os.path.join("scripts", "bench_eval.py"),
                  "bench_eval_bs56").main()
    except Exception:  # noqa: BLE001
        traceback.print_exc()
        print("## eval bs56 FAILED — next", flush=True)

    print("## leg train bs56", flush=True)
    try:
        with _env(BENCH_BATCH="56", BENCH_ATTN="flash_fused:attn_out",
                  PIGEON_FUSED_BWD="kernel"):
            _load(os.path.join("scripts", "bench_train.py"),
                  "bench_train_bs56").main()
    except Exception:  # noqa: BLE001
        traceback.print_exc()
        print("## train bs56 FAILED", flush=True)
    print("## followup-b done", flush=True)


if __name__ == "__main__":
    main()
