"""r6 follow-up: bracket the two batch optima the r6 fill-in moved.

The r6 session found the standing curves under-sampled on the high
side: int8 rose 570.8 (bs36) -> 577.9 (bs40) before the known bs48
VMEM cliff (408), and bf16 rose 374.9 (bs48) -> 378.4 (bs56). This
one-process queue samples the remaining edges so the new defaults sit
on measured maxima, not on the last sampled point:

  int8  bs42, bs44            (spill edge between 40 and 48)
  bf16  bs52, bs60, bs64      (bs64 re-run: r4 measured 364.1 in a
                               different session — confirm the curve
                               really falls past 56 within ONE session)

Protocol per CLAUDE.md: chained dispatches, one scalar readback per
window, one TPU process. Results as JSON lines; apply via the same
PERF/defaults checklist as the session proper.
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


def _bench(tag):
    spec = importlib.util.spec_from_file_location(
        f"bench_{tag}", os.path.join(ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    legs = [("int8", "42"), ("int8", "44"),
            ("bf16", "52"), ("bf16", "60"), ("bf16", "64")]
    for kind, bs in legs:
        print(f"## leg {kind} bs{bs}", flush=True)
        try:
            with _env(BENCH_QUANT="1" if kind == "int8" else None,
                      BENCH_BATCH=bs, BENCH_ATTN=None):
                _bench(f"{kind}_bs{bs}").main()
        except Exception:  # noqa: BLE001 — VMEM spill edges expected
            traceback.print_exc()
            print(f"## {kind} bs{bs} FAILED — next", flush=True)
    print("## followup done", flush=True)


if __name__ == "__main__":
    main()
