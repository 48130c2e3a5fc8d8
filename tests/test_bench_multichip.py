"""The ready-to-fire multi-chip inference bench runs on a virtual mesh.

`scripts/bench_multichip.py` is the hardware-pending counterpart of
`scripts/baseline_gate.py`: it must execute end-to-end on the 8-device
virtual CPU mesh (tiny model, interpret-mode Pallas) for every route it
will time on a real mesh — bf16, int8, and TP>1 — so the day multi-chip
hardware exists the only change is dropping BENCH_TINY.
"""

import importlib.util
import math
import os
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(monkeypatch, **env):
    monkeypatch.setenv("BENCH_TINY", "1")
    monkeypatch.setenv("BENCH_BATCH", "4")
    monkeypatch.setenv("BENCH_ITERS", "2")
    monkeypatch.setenv("BENCH_WINDOWS", "2")
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    spec = importlib.util.spec_from_file_location(
        "bench_multichip", os.path.join(REPO, "scripts",
                                        "bench_multichip.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_multichip"] = mod
    spec.loader.exec_module(mod)
    return mod.main()


@pytest.mark.parametrize("env", [
    {},                                         # bf16 DP over all devices
    {"BENCH_QUANT": "1"},                       # int8 serving route
    {"BENCH_TP": "2"},                          # (data, model) mesh
], ids=["bf16_dp", "int8_dp", "bf16_tp2"])
def test_bench_multichip_virtual_mesh(monkeypatch, env):
    n = len(jax.devices())
    assert n >= 2, "suite runs on the 8-device virtual mesh"
    result = _run(monkeypatch, **env)
    assert result["unit"] == "images/sec"
    assert result["value"] > 0
    tp = int(env.get("BENCH_TP", "1"))
    assert f"_n{n}_tp{tp}_" in result["metric"]
    if env.get("BENCH_QUANT") == "1":
        assert "_int8" in result["metric"]
    # both fields are rounded to 2 decimals in the JSON payload
    assert result["per_chip"] == pytest.approx(result["value"] / n,
                                               abs=0.011)
    # chips_to_target uses the UNROUNDED per-chip rate; recomputing from
    # the 2-decimal payload carries the rounding error relatively
    assert result["chips_to_target"] == pytest.approx(
        math.ceil(5000.0 / result["per_chip"]), rel=0.01)


@pytest.mark.parametrize("env", [
    {},                                         # bf16 DP train
    {"BENCH_FSDP": "1"},                        # ZeRO-3 storage
    {"BENCH_TP": "2"},                          # (data, model) mesh
], ids=["train_dp", "train_fsdp", "train_tp2"])
def test_bench_multichip_train_virtual_mesh(monkeypatch, env):
    """BENCH_TRAIN=1: the multi-chip TRAINING leg (full finetune step —
    forward + backward + AdamW — with the r8 remat route) must execute
    end-to-end on the virtual mesh for every sharding it will time on
    a real mesh."""
    import numpy as np

    n = len(jax.devices())
    result = _run(monkeypatch, BENCH_TRAIN="1", **env)
    assert result["unit"] == "images/sec"
    assert result["value"] > 0
    assert "_sharded_train_" in result["metric"]
    # tiny mode remats 'none': interpret Pallas + jax.checkpoint are
    # incompatible (OrderedIOEffect); real meshes default attn_kernel.
    assert "_remat-none" in result["metric"]
    tp = int(env.get("BENCH_TP", "1"))
    assert f"_n{n}_tp{tp}_" in result["metric"]
    if env.get("BENCH_FSDP") == "1":
        assert "_fsdp" in result["metric"]
    assert np.isfinite(result["loss"])
    assert result["per_chip"] == pytest.approx(result["value"] / n,
                                               abs=0.011)


def test_bench_multichip_train_rejects_quant(monkeypatch):
    with pytest.raises(SystemExit):
        _run(monkeypatch, BENCH_TRAIN="1", BENCH_QUANT="1")
