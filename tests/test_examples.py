"""Smoke-run the examples/ scripts under pytest (VERDICT r3 item 6:
nothing previously stopped them from rotting — they were only claimed
green manually). Each main() runs at reduced size on the 8-virtual-
device CPU mesh the conftest configures."""

import os
import sys

EXAMPLES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples")
if EXAMPLES_DIR not in sys.path:
    sys.path.insert(0, EXAMPLES_DIR)


def test_full_pipeline_example(capsys):
    """geocells -> finetune -> embed -> prototypes -> refined eval ->
    HTTP serve, asserting the pipeline learns (the example's own
    asserts)."""
    import full_pipeline

    full_pipeline.main(epochs=4, per_region=40)
    out = capsys.readouterr().out
    assert "FULL PIPELINE OK" in out


def test_zero_shot_eval_example(capsys):
    import zero_shot_eval

    zero_shot_eval.main()
    out = capsys.readouterr().out
    assert "OK" in out and "zero-shot metrics" in out


def test_train_synthetic_example(capsys):
    import train_synthetic

    train_synthetic.main()
    out = capsys.readouterr().out.lower()
    assert "ok" in out or "median" in out
