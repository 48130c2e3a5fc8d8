"""Round-5 follow-up measurements, run AFTER `hw_session_r5.py`.

The main session answers "does the fused backward kernel win the
training A/B". This follow-up refines the winner's operating point:

  0. backward-kernel group sweep tail: g16 (1 head/program — the
     narrower end the main session didn't probe; g2/g4 failed compile
     on VMEM, g8 won at 8.16 ms);
  1. training BATCH sweep under the winning impl:remat:bwd — the
     kernel backward changes the VMEM/HBM profile, so the bs32
     optimum inherited from the XLA-backward era may have moved
     (mirrors the r4 bf16 re-optimum that moved inference 32 -> 48).
     Entries via BENCH_TRAIN_SWEEP (default "24,32,48").

Usage:  python scripts/hw_followup_r5.py 'flash_fused:full:kernel'
        (the winner string from `hw_decide_r4.py` / the session log;
        defaults to flash:full = no-op guard if the kernel lost).
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _script(fname, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, "scripts", fname))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    start = time.time()
    winner = (sys.argv[1] if len(sys.argv) > 1
              else os.environ.get("HW_WINNER", "flash:full"))
    print(f"## follow-up for winner {winner}", flush=True)

    if os.environ.get("HW_SKIP_G16") != "1":
        print("## step 0: backward group sweep tail (g16)", flush=True)
        try:
            # The component bench's variant list now includes g16
            # (each variant pins its own PIGEON_FUSED_BWD_GROUPS);
            # the known-failing g2/g4 rows fail fast on this backend.
            _script("bench_attn_qkv_bwd.py", "qkv_bwd_g16").main()
        except Exception:  # noqa: BLE001
            traceback.print_exc()

    impl, _, rest = winner.partition(":")
    remat, _, bwd = rest.partition(":")
    if impl == "flash" and not bwd:
        print("## winner is the standing default — batch sweep already "
              "measured in r4 (bs32 optimum); skipping step 1",
              flush=True)
        return
    sweep = os.environ.get("BENCH_TRAIN_SWEEP", "24,32,48").split(",")
    for bs in sweep:
        print(f"## step 1: train sweep bs={bs} {winner} "
              f"(t={time.time() - start:.0f}s)", flush=True)
        try:
            os.environ["BENCH_BATCH"] = bs
            os.environ["BENCH_ATTN"] = winner
            _script("bench_train.py", f"bench_train_bs{bs}").main()
        except Exception:  # noqa: BLE001
            traceback.print_exc()


if __name__ == "__main__":
    main()
