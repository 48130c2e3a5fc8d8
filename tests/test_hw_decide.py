"""Unit tests for the round-4 HW decision parser (scripts/hw_decide_r4.py).

The parser turns the mixed hw_session_r4.py log (JSON rows interleaved
with progress text) into the ROADMAP's three default-flip decisions.
Testing it on synthetic logs means the real tunnel-recovery session is
acted on mechanically instead of by ad-hoc log reading.
"""

import importlib.util
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "hw_decide_r4", os.path.join(ROOT, "scripts", "hw_decide_r4.py"))
hw = importlib.util.module_from_spec(spec)
spec.loader.exec_module(hw)


def e2e(impl, bs, value, quant=False):
    return json.dumps({
        "metric": "vit_l14_336_embed_classify_images_per_sec_per_chip"
                  f"_bs{bs}_{impl}{'_int8' if quant else ''}",
        "value": value, "unit": "images/sec", "vs_baseline": 0.07,
        "mfu": 0.7})


def train(impl, bs, value, remat="full", bwd=None):
    return json.dumps({
        "metric": f"vit_l14_336_train_images_per_sec_bs{bs}_{impl}"
                  f"_remat-{remat}" + (f"_bwd-{bwd}" if bwd else ""),
        "value": value, "unit": "images/sec", "loss": 5.4})


def test_parse_ignores_noise_and_buckets_rows():
    lines = [
        "## step 4: e2e bf16 attn sweep (t=120s)",
        "# windows=[373.9, 374.4] compile=4.8s",
        "{not json",
        e2e("flash_fused", 32, 374.4),
        e2e("flash_fused_mlp", 32, 390.1),
        e2e("flash_fused", 32, 451.0, quant=True),
        train("flash", 32, 81.9),
        json.dumps({"variant": "int8_fused", "ms_per_call": 1.2,
                    "max_err_vs_int8_sep": 0.001}),
    ]
    p = hw.parse(lines)
    assert p["bf16"] == {("flash_fused", 32): 374.4,
                         ("flash_fused_mlp", 32): 390.1}
    assert p["int8"] == {("flash_fused", 32): 451.0}
    assert p["train"] == {("flash:full", 32): 81.9}
    assert p["component"][0]["variant"] == "int8_fused"


def test_inference_flip_when_variant_wins():
    p = hw.parse([e2e("flash_fused", 32, 374.0),
                  e2e("flash_fused_block", 32, 401.0)])
    heads = [h for h, _ in hw.decide(p)]
    assert any("INFERENCE default -> 'flash_fused_block'" in h
               for h in heads)


def test_inference_stays_when_fused_best():
    p = hw.parse([e2e("flash_fused", 32, 374.0),
                  e2e("flash_fused_ln", 32, 360.0)])
    heads = [h for h, _ in hw.decide(p)]
    assert any("stays 'flash_fused'" in h for h in heads)


def test_train_flip_requires_beating_flash():
    p = hw.parse([train("flash", 32, 82.0),
                  train("flash_fused", 32, 86.3)])
    heads = [h for h, _ in hw.decide(p)]
    assert any("TRAIN default -> 'flash_fused:full'" in h for h in heads)

    p = hw.parse([train("flash", 32, 82.0),
                  train("flash_fused", 32, 79.0)])
    heads = [h for h, _ in hw.decide(p)]
    assert any("TRAIN default stays 'flash'" in h for h in heads)


def test_train_fused_bwd_kernel_variant_parses_and_wins():
    # r5 fused-QKV-backward rows carry a third "_bwd-<sel>" field
    # (bench_train "impl:remat:kernel" -> PIGEON_FUSED_BWD=kernel);
    # the lazy \w+? before _remat- must not swallow it, and a winning
    # kernel-backward row must name the FULL three-part combo.
    p = hw.parse([train("flash", 32, 81.7),
                  train("flash_fused", 32, 76.4),
                  train("flash_fused", 32, 88.2, bwd="kernel")])
    assert p["train"][("flash_fused:full:kernel", 32)] == 88.2
    heads = [h for h, _ in hw.decide(p)]
    assert any("TRAIN default -> 'flash_fused:full:kernel'" in h
               for h in heads)


def test_train_remat_none_variant_wins():
    # The impl x remat cross product: a fused no-remat row beating the
    # flash:full baseline must name BOTH halves of the winning combo.
    p = hw.parse([train("flash", 32, 82.0),
                  train("flash_fused_mlp", 32, 84.0),
                  train("flash_fused_mlp", 32, 97.0, remat="none")])
    heads = [h for h, _ in hw.decide(p)]
    assert any("TRAIN default -> 'flash_fused_mlp:none'" in h
               for h in heads)


def test_quant_flip_gated_on_mosaic_parity():
    rows = [e2e("flash", 24, 450.0, quant=True),
            e2e("flash_fused", 24, 500.0, quant=True)]
    # Without the step-1 int8_fused component record: blocked.
    heads = [h for h, _ in hw.decide(hw.parse(rows))]
    assert any("BLOCKED" in h for h in heads)
    # A record WITHOUT the parity-error key is a timing-only row (its
    # XLA reference failed) — still blocked.
    rows.append(json.dumps({"variant": "int8_fused", "ms_per_call": 1.0}))
    heads = [h for h, _ in hw.decide(hw.parse(rows))]
    assert any("BLOCKED" in h for h in heads)
    # With the parity bound recorded: flip.
    rows[-1] = json.dumps({"variant": "int8_fused", "ms_per_call": 1.0,
                           "max_err_vs_int8_sep": 0.001})
    heads = [h for h, _ in hw.decide(hw.parse(rows))]
    assert any("QUANT route -> 'flash_fused'" in h for h in heads)


def test_quant_block_impl_gated_on_its_own_kernel_parity():
    # fused_block_attention_int8's evidence is the int8_block row WITH
    # max_err_vs_xla (vs the int8_block_xla twin): a timing-only
    # int8_block record must not pass. (Since r5 the MLP half is XLA
    # QuantDense — `fused_ln_mlp_int8` was deleted — so no MLP row is
    # required.)
    rows = [e2e("flash", 24, 450.0, quant=True),
            e2e("flash_fused_block", 24, 520.0, quant=True),
            e2e("flash_fused", 24, 500.0, quant=True),
            json.dumps({"variant": "int8_fused", "ms_per_call": 1.0,
                        "max_err_vs_int8_sep": 0.001}),
            json.dumps({"variant": "int8_block", "ms_per_call": 0.9})]
    decs = hw.decide(hw.parse(rows))
    heads = [h for h, _ in decs]
    assert any("QUANT candidate 'flash_fused_block' BLOCKED" in h
               for h in heads)
    # ...and the flip falls through to the fastest GATED impl.
    assert any("QUANT route -> 'flash_fused'" in h for h in heads)

    # With its own parity bound the block wins.
    rows[-1] = json.dumps({"variant": "int8_block", "ms_per_call": 0.9,
                           "max_err_vs_xla": 0.002})
    heads = [h for h, _ in hw.decide(hw.parse(rows))]
    assert any("QUANT route -> 'flash_fused_block'" in h for h in heads)


def test_quant_mlp_impl_needs_qkv_parity_record():
    # flash_fused_mlp under quant computes exactly what flash_fused
    # does since r5 (int8 QKV kernel + XLA quant MLP) — its gate is
    # the int8_fused row alone.
    rows = [e2e("flash", 24, 450.0, quant=True),
            e2e("flash_fused_mlp", 24, 505.0, quant=True)]
    heads = [h for h, _ in hw.decide(hw.parse(rows))]
    assert any("BLOCKED" in h for h in heads)
    rows.append(json.dumps({"variant": "int8_fused", "ms_per_call": 1.0,
                            "max_err_vs_int8_sep": 0.001}))
    heads = [h for h, _ in hw.decide(hw.parse(rows))]
    assert any("QUANT route -> 'flash_fused_mlp'" in h for h in heads)


def test_inference_flips_when_default_row_missing():
    # "Fastest VALIDATED impl": if flash_fused crashed (no row), the
    # best surviving impl wins — it must not "stay" on a default that
    # failed validation.
    p = hw.parse([e2e("flash_fused_mlp", 32, 390.0)])
    decs = hw.decide(p)
    heads = [h for h, _ in decs]
    assert any("INFERENCE default -> 'flash_fused_mlp'" in h
               for h in heads)
    detail = dict(decs)["INFERENCE default -> 'flash_fused_mlp'"]
    assert "NO bs32 row" in detail


def test_int8_component_bench_emits_parity_records(monkeypatch, capsys):
    """Run the REAL step-1 component bench end-to-end at a tiny shape
    (interpret mode) and check every parity record the decision gate
    relies on is emitted with its error bound — i.e. the XLA twins in
    the script really do match the kernels' math, so the HW asserts
    won't fail for transcription reasons."""
    from jax.experimental.pallas import tpu as pltpu

    spec2 = importlib.util.spec_from_file_location(
        "bench_int8_tiny",
        os.path.join(ROOT, "scripts", "bench_attn_qkv_fused_int8.py"))
    bench = importlib.util.module_from_spec(spec2)
    spec2.loader.exec_module(bench)

    for k, v in {"BENCH_BATCH": "2", "BENCH_HEADS": "4",
                 "BENCH_SEQ": "16", "BENCH_HEAD_DIM": "8",
                 "BENCH_ITERS": "1", "BENCH_WINDOWS": "1"}.items():
        monkeypatch.setenv(k, v)
    with pltpu.force_tpu_interpret_mode():
        bench.main()

    recs = {}
    for line in capsys.readouterr().out.splitlines():
        if line.startswith("{"):
            r = json.loads(line)
            recs[r["variant"]] = r
    assert "max_err_vs_int8_sep" in recs["int8_fused"]
    assert recs["int8_fused"]["max_err_vs_int8_sep"] < 5e-2
    assert "max_err_vs_xla" in recs["int8_block"]
    assert recs["int8_block"]["max_err_vs_xla"] < 5e-2
    assert "int8_block_xla" in recs and "bf16_fused" in recs


def test_batch_sweep_reports_optimum():
    p = hw.parse([e2e("flash_fused", 32, 374.0),
                  e2e("flash_fused", 48, 382.0),
                  e2e("flash_fused", 64, 377.0)])
    decs = dict(hw.decide(p))
    assert "BENCH_BATCH optimum: bs48" in decs


def test_pretrain_row_does_not_overwrite_train_baseline():
    """Regression: the step-9 PRETRAIN metric name contains
    'train_images_per_sec_..._remat-full' as a substring; in the real
    r4 session it overwrote the step-6 flash:full row (81.69 -> 77.08)
    and flipped the TRAIN decision to a variant that actually LOST."""
    pretrain = json.dumps({
        "metric": "clip_l14_336_pretrain_images_per_sec_bs32_flash"
                  "_remat-full",
        "value": 77.08, "unit": "images/sec", "loss": 1.958})
    p = hw.parse([train("flash", 32, 81.69),
                  train("flash_fused_mlp", 32, 79.6, remat="none"),
                  pretrain])
    assert p["train"][("flash:full", 32)] == 81.69
    heads = [h for h, _ in hw.decide(p)]
    assert any("TRAIN default stays 'flash' + full remat" in h
               for h in heads)
