"""Driver-contract tests: __graft_entry__ entry() + dryrun_multichip()."""

import sys

import numpy as np
import pytest
import jax


@pytest.fixture()
def graft(monkeypatch):
    import importlib
    import pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__

    return importlib.reload(__graft_entry__)


def test_dryrun_multichip_8(graft, capsys):
    graft.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "OK" in out
    assert "'data': 4" in out and "'model': 2" in out


def test_dryrun_multichip_odd(graft, capsys):
    # Odd device count -> pure DP mesh.
    graft.dryrun_multichip(7)
    out = capsys.readouterr().out
    assert "OK" in out and "'model': 1" in out


@pytest.mark.slow
def test_entry_compiles_tiny_override(graft, monkeypatch):
    """entry() returns (fn, args) that jit-compile. The flagship ViT-L is
    too slow to compile in the CPU test loop, so this only checks the
    callable contract shape-wise via eval_shape."""
    fn, args = graft.entry()
    shapes = jax.eval_shape(fn, *args)
    logits, embedding = shapes
    assert logits.shape == (4, 2203)
    assert embedding.shape == (4, 1024)
