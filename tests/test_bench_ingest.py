"""The ingestion-fed e2e bench runs end to end (tiny CPU mode).

`scripts/bench_e2e_ingest.py` is the hardware-pending measurement of
SURVEY §7.3's "input pipeline throughput" hard part: disk JPEGs ->
`data/pipeline.py::iter_batches` -> device forward. The tiny mode must
produce all four stage rows (host_only / transfer / device_only / e2e)
with a sane binding-stage attribution so the real-hardware run is just
dropping BENCH_TINY.
"""

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    scripts = os.path.join(REPO, "scripts")
    if scripts not in sys.path:
        sys.path.insert(0, scripts)
    spec = importlib.util.spec_from_file_location(
        "bench_e2e_ingest", os.path.join(scripts, "bench_e2e_ingest.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_e2e_ingest"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_host_only_row(monkeypatch):
    monkeypatch.setenv("BENCH_TINY", "1")
    monkeypatch.setenv("BENCH_N", "24")
    monkeypatch.setenv("BENCH_SKIP_DEVICE", "1")
    rows = _load().main()
    assert [r["metric"] for r in rows] == [
        "ingest_host_only_images_per_sec"]
    assert rows[0]["value"] > 0


def test_all_stages_and_attribution(monkeypatch):
    monkeypatch.setenv("BENCH_TINY", "1")
    monkeypatch.setenv("BENCH_N", "32")
    rows = {r["metric"].removeprefix("ingest_")
             .removesuffix("_images_per_sec"): r for r in _load().main()}
    assert set(rows) == {"host_only", "transfer", "device_only", "e2e"}
    for r in rows.values():
        assert r["value"] > 0
    e2e = rows["e2e"]
    assert e2e["binding_stage"] in ("host", "transfer", "device")
    assert e2e["bound_rate"] == pytest.approx(
        min(rows["host_only"]["value"], rows["transfer"]["value"],
            rows["device_only"]["value"]))
    assert e2e["overlap_efficiency"] == pytest.approx(
        e2e["value"] / e2e["bound_rate"], abs=0.02)
