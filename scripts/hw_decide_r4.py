"""Parse the round-4 HW session log and apply the ROADMAP decision rule.

`scripts/hw_session_r4.py` interleaves JSON result lines (component
benches, e2e bench.py, bench_train.py) with progress/stderr text in one
log. This script turns that log into the three decisions the ROADMAP
pins so acting on a recovered tunnel is mechanical:

  1. INFERENCE default (`models/clip.py::_attn_impl`): fastest
     VALIDATED bf16 e2e impl (step 4; an impl that crashed or was
     skipped never wins).
  2. TRAIN default: flip only if a fused custom_vjp variant beats
     'flash' in the step-6 A/B.
  3. QUANT route (`cli/run.py::_quantize_for_inference` + bench
     default): flip to a fused int8 impl only if BOTH the step-5 int8
     e2e beats 'flash' AND every int8 kernel that impl routes through
     has a hardware parity record WITH an error bound (a record
     missing its max_err key is a timing row whose XLA reference
     failed — no parity claim). flash_fused and flash_fused_mlp need
     the step-1 int8_fused row (since r5 the MLP half is XLA
     QuantDense under every impl — `fused_ln_mlp_int8` was deleted
     after its r4 parity FAIL); flash_fused_block needs its step-1
     int8_block row (parity vs the int8_block_xla twin).
  4. BENCH_BATCH: step-7 re-optimum for the winning bf16 impl
     (bs32 comes from step 4's flash_fused row).

Usage: python scripts/hw_decide_r4.py [/tmp/hw_session_r4.log]
Exit code 2 when the log has no usable e2e rows (session never ran).
"""

from __future__ import annotations

import json
import re
import sys

E2E_RE = re.compile(
    r"embed_classify_images_per_sec_per_chip_bs(\d+)_(\w+?)(_int8)?$")
TRAIN_RE = re.compile(
    # (?:^|_): the finetune metric's 'train' token is underscore-
    # delimited (vit_l14_336_train_images_per_sec_...), while the
    # step-9 PRETRAIN metric embeds 'train...' inside the word
    # 'pretrain' — anchoring on the token boundary excludes it and any
    # future compound ('retrain', ...) instead of special-casing the
    # 'pre' prefix (advisor r3). The optional _bwd-<sel> suffix is the
    # r5 fused-QKV-backward selector (bench_train "impl:remat:bwd"
    # entries -> PIGEON_FUSED_BWD); \w+? before _remat- must stay lazy
    # so it never swallows the suffix.
    r"(?:^|_)train_images_per_sec_bs(\d+)_(\w+?)_remat-(\w+?)"
    r"(?:_bwd-(\w+))?$")


def parse(lines):
    """Collect {bf16: {(impl, bs): rate}, int8: {...}, train: {...},
    component: [records]} from mixed log lines."""
    out = {"bf16": {}, "int8": {}, "train": {}, "component": []}
    for line in lines:
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if "variant" in rec:
            out["component"].append(rec)
            continue
        metric = rec.get("metric", "")
        m = E2E_RE.search(metric)
        if m:
            bs, impl, quant = int(m.group(1)), m.group(2), m.group(3)
            out["int8" if quant else "bf16"][(impl, bs)] = rec["value"]
            continue
        m = TRAIN_RE.search(metric)
        if m:
            variant = f"{m.group(2)}:{m.group(3)}"
            if m.group(4):                     # fused-QKV backward sel
                variant += f":{m.group(4)}"
            out["train"][(variant, int(m.group(1)))] = rec["value"]
    return out


def _best(table):
    return max(table.items(), key=lambda kv: kv[1]) if table else None


def decide(parsed):
    """Return a list of (decision, detail) strings."""
    decisions = []

    bf16 = parsed["bf16"]
    best_bf16 = _best({k: v for k, v in bf16.items() if k[1] == 32})
    if best_bf16:
        (impl, _), rate = best_bf16
        cur = bf16.get(("flash_fused", 32))
        if impl == "flash_fused":
            decisions.append((
                "INFERENCE default stays 'flash_fused'",
                f"{rate:.1f} img/s is the best validated bs32 impl"))
        elif cur:
            decisions.append((
                f"INFERENCE default -> '{impl}'",
                f"{rate:.1f} img/s vs flash_fused {cur:.1f} "
                f"(+{100 * (rate / cur - 1):.1f}%)"))
        else:
            # The rule is "fastest VALIDATED impl" — a crashed/absent
            # flash_fused row cannot keep the default.
            decisions.append((
                f"INFERENCE default -> '{impl}'",
                f"{rate:.1f} img/s; current default flash_fused has "
                "NO bs32 row this session (crashed or skipped) — "
                "fastest validated impl wins"))

    train = parsed["train"]
    best_train = _best(train)
    if best_train:
        (impl, bs), rate = best_train
        base = train.get(("flash:full", bs))
        if impl != "flash:full" and base and rate > base:
            decisions.append((
                f"TRAIN default -> '{impl}' (attn_impl:remat)",
                f"{rate:.1f} img/s vs flash:full {base:.1f} "
                f"(+{100 * (rate / base - 1):.1f}%)"))
        else:
            decisions.append((
                "TRAIN default stays 'flash' + full remat",
                f"flash:full remains fastest at {rate:.1f} img/s"
                if impl == "flash:full" else f"{impl} wins without a "
                "flash:full baseline row — investigate before flipping"))

    int8 = parsed["int8"]

    def _parity(variant, err_key):
        """True iff the component bench recorded variant WITH a parity
        error bound — an err-free record is a timing row (its XLA
        reference may have failed), never a hardware parity claim."""
        return any(r.get("variant") == variant and err_key in r
                   for r in parsed["component"])

    # Which int8 kernels each e2e impl routes through (models/clip.py
    # static routing), and the hardware parity evidence each requires.
    # Since r5 (`fused_ln_mlp_int8` deleted after its r4 parity FAIL)
    # the MLP half is XLA QuantDense under every impl:
    #   flash_fused       -> fused_qkv_mha_int8          (int8_fused)
    #   flash_fused_mlp   -> fused_qkv_mha_int8          (int8_fused)
    #   flash_fused_block -> fused_block_attention_int8  (int8_block)
    qkv_ok = _parity("int8_fused", "max_err_vs_int8_sep")
    blk_ok = _parity("int8_block", "max_err_vs_xla")
    impl_gates = {
        "flash_fused": (qkv_ok, "step-1 int8_fused parity record"),
        "flash_fused_mlp": (qkv_ok, "step-1 int8_fused parity record"),
        "flash_fused_block": (
            blk_ok, "step-1 int8_block (vs int8_block_xla) parity"),
    }
    best_int8 = _best(int8)
    if best_int8:
        base = max((v for (i, _), v in int8.items() if i == "flash"),
                   default=None)
        # Among int8 rows beating flash, prefer the fastest GATED impl;
        # report any faster-but-ungated row as blocked.
        beating = sorted(
            ((v, k) for k, v in int8.items()
             if k[0] != "flash" and base and v > base), reverse=True)
        flipped = False
        for rate, (impl, bs) in beating:
            ok, why = impl_gates.get(impl, (False, "unknown impl"))
            if ok:
                decisions.append((
                    f"QUANT route -> '{impl}' (bs{bs})",
                    f"{rate:.1f} img/s vs flash {base:.1f} "
                    f"(+{100 * (rate / base - 1):.1f}%); Mosaic int8 "
                    f"parity gate PASSED ({why})"))
                flipped = True
                break
            decisions.append((
                f"QUANT candidate '{impl}' BLOCKED despite win",
                f"{rate:.1f} beats flash {base:.1f} but {why} — do "
                "not flip"))
        if not flipped:
            decisions.append((
                "QUANT route stays 'flash'",
                "all faster fused impls are parity-blocked" if beating
                else "no fused int8 impl beat the flash baseline"))

    sweep = {bs: v for (i, bs), v in bf16.items() if i == "flash_fused"}
    if len(sweep) > 1:
        bs, rate = max(sweep.items(), key=lambda kv: kv[1])
        decisions.append((
            f"BENCH_BATCH optimum: bs{bs}",
            " ".join(f"bs{b}={v:.1f}" for b, v in sorted(sweep.items()))))
    return decisions


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hw_session_r4.log"
    try:
        with open(path) as f:
            parsed = parse(f)
    except OSError as e:
        print(f"cannot read {path}: {e}", file=sys.stderr)
        return 2
    if not (parsed["bf16"] or parsed["int8"] or parsed["train"]):
        print(f"{path}: no usable result rows", file=sys.stderr)
        return 2

    for section in ("bf16", "int8", "train"):
        for (impl, bs), v in sorted(parsed[section].items()):
            print(f"  {section:5s} {impl:18s} bs{bs:<3d} {v:8.1f} img/s")
    for rec in parsed["component"]:
        extra = "".join(f" {k}={v}" for k, v in rec.items()
                        if k != "variant")
        print(f"  comp  {rec['variant']:18s}{extra}")
    print()
    for head, detail in decide(parsed):
        print(f"DECISION: {head}\n    {detail}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
