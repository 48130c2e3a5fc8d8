"""Tests for scripts/baseline_gate.py — the ready-to-fire 0.5%-parity
gate (VERDICT r3 item 7). The full five-config dry run is exercised
manually / by the round driver; here the wiring pieces that must not
rot: dry-asset synthesis, one real config end-to-end, and the parity
arithmetic."""

import os
import sys

import numpy as np
import pytest

SCRIPTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
if SCRIPTS not in sys.path:
    sys.path.insert(0, SCRIPTS)

import baseline_gate as bg  # noqa: E402

PIL = pytest.importorskip("PIL")


def test_parity_row_bounds():
    assert "[OK]" in bg.parity_row("m", 100.0, 100.4)      # 0.4% <= 0.5%
    assert "[FAIL]" in bg.parity_row("m", 100.0, 101.0)    # 1.0% > 0.5%
    assert "expected=—" in bg.parity_row("m", 100.0, None)
    assert "expected=—" in bg.parity_row("m", [1, 2], None)


def test_dry_assets_and_config3_panorama_embed(tmp_path, monkeypatch):
    """make_dry_assets synthesizes a self-consistent tree (exercising
    embed + prototypes through the CLI) and config #3 produces a finite
    (N, 4, D) panorama bank — the view-fold path `make_embed_step` now
    owns."""
    monkeypatch.chdir(tmp_path)
    work = str(tmp_path / "work")
    os.makedirs(work)
    assets = bg.make_dry_assets(work)
    for key in ("geocells_csv", "benchmark_registry", "prototypes_csv"):
        assert os.path.exists(assets[key]), key
    emb = np.load(os.path.join(assets["embeddings_dir"], "train.npy"))
    assert emb.ndim == 2 and np.isfinite(emb).all()

    out = bg.config_3_panorama_embed(assets, work)
    assert out["finite"]
    n, views, dim = out["embeddings"]
    assert views == 4 and dim > 0
