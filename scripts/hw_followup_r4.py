"""Round-4 follow-up measurements after the main HW session.

The step-5 sweep showed the int8 quant route should flip to
`flash_fused` (`fused_qkv_mha_int8`: 565.9 vs 434.1 img/s at bs32,
Mosaic parity err 0.0) — but the int8 batch-size optimum was only ever
measured on the OLD 'flash' route (bs24 peak), and the product-eval
int8 leg (step 8) is pinned to flash:bs24 for comparability with the
standing numbers. This script completes the decision inputs in the
SAME tunnel session class:

  1. int8 flash_fused batch sweep (bs24 / bs48; bs32 = 565.9 from
     step 5) -> new `evaluate --quant` / serve / BENCH default batch;
  2. product eval with the NEW quant route (flash_fused int8) at the
     winning batch vs the standing 418 img/s (flash int8 bs24);
  3. bf16 bs48 confirmation for the eval path (step-7 found bs48 374.8
     > bs32 368.4 on the bench forward; the eval path has its own
     input mix).

Run AFTER hw_session_r4.py exits (one TPU process at a time).
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

START = time.time()


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run(title, path, name, env):
    print(f"## followup: {title} (t={time.time() - START:.0f}s)",
          flush=True)
    prior = {k: os.environ.get(k) for k in env}
    for k, v in env.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    try:
        _load(os.path.join(ROOT, path), name).main()
    except Exception:  # noqa: BLE001
        traceback.print_exc()
        print(f"## followup {title} FAILED — next", flush=True)
    finally:
        for k, v in prior.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main() -> None:
    for bs in ("24", "48"):
        _run(f"int8 flash_fused bs{bs}", "bench.py", f"b_i8_{bs}",
             {"BENCH_QUANT": "1", "BENCH_ATTN": "flash_fused",
              "BENCH_BATCH": bs, "BENCH_WINDOWS": "3"})
    # Product eval on the flipped quant route at its best batch so far.
    _run("eval int8 flash_fused bs32", "scripts/bench_eval.py",
         "ev_i8_fused",
         {"BENCH_QUANT": "1", "BENCH_ATTN": "flash_fused",
          "BENCH_BATCH": "32"})
    _run("eval bf16 flash_fused bs48", "scripts/bench_eval.py",
         "ev_bf16_48",
         {"BENCH_QUANT": None, "BENCH_ATTN": "flash_fused",
          "BENCH_BATCH": "48"})
    print(f"## followup done (t={time.time() - START:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
