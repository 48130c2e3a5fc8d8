"""Benchmark evaluation driver: model + refiner + metric suite.

Rebuilds `evaluation/evaluate.py:10-86`: build the eval model (pixel tower
+ head, or headless on embeddings), widen the candidate pool to 50
(`evaluate.py:44`), build or load the prototype bank, refine, and score
with the full metric suite. Per-benchmark-family refiner settings follow
the reference's documented overrides (`evaluate.py:73-80`).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterable, Optional

import numpy as np

from pigeon_tpu.config import RefinerConfig

#: Per-benchmark-family refiner overrides (reference `evaluate.py:73-80`):
#: StreetView: topk 5, 1000 km, temp 1.6; planet-scale (YFCC/landmarks):
#: topk 20-40, effectively-unbounded refinement, temp 0.6-1.0.
REFINER_PRESETS: Dict[str, RefinerConfig] = {
    "streetview": RefinerConfig(topk=5, max_refinement_km=1000.0,
                                temperature=1.6),
    "geoguessr": RefinerConfig(topk=5, max_refinement_km=1000.0,
                               temperature=1.6),
    # gws15k: the reference's comment block (`evaluate.py:73-80`) is
    # ambiguous about its family; it IS StreetView imagery (Clark et al.
    # 2023), so the StreetView preset applies. Sensitivity: with the
    # planet preset (topk 20-40, unbounded refinement) the refiner can
    # move guesses across continents, which the 1000 km guard exists to
    # prevent on StreetView-like distributions.
    "gws15k": RefinerConfig(topk=5, max_refinement_km=1000.0,
                            temperature=1.6),
    "im2gps": RefinerConfig(topk=20, max_refinement_km=10000.0,
                            temperature=1.0),
    "im2gps3k": RefinerConfig(topk=20, max_refinement_km=10000.0,
                              temperature=1.0),
    "yfcc4k": RefinerConfig(topk=40, max_refinement_km=100000.0,
                            temperature=0.6),
    "yfcc26k": RefinerConfig(topk=40, max_refinement_km=100000.0,
                             temperature=0.6),
}

#: Candidate pool width used at eval time (reference `evaluate.py:44`).
EVAL_NUM_CANDIDATES = 50


def refiner_preset(benchmark: str) -> RefinerConfig:
    return REFINER_PRESETS.get(benchmark,
                               RefinerConfig(topk=5,
                                             max_refinement_km=1000.0,
                                             temperature=1.6))


def build_refiner(proto_rows, bank_emb: np.ndarray, bank_lla: np.ndarray,
                  num_cells: int, cfg: RefinerConfig,
                  cache_path: Optional[str] = None,
                  within_cluster: str = "nearest") -> Callable:
    """Build (or load from npz cache) the batched refine function.

    The reference pickles its whole refiner object as a cache
    (`evaluate.py:66-80`); here only the packed arrays are cached.
    """
    from pigeon_tpu.models.refiner import (
        ProtoBank,
        build_proto_bank,
        make_refine_fn,
    )
    import jax.numpy as jnp

    if cache_path and os.path.exists(cache_path):
        data = np.load(cache_path)
        bank = ProtoBank(**{k: jnp.asarray(data[k]) for k in data.files})
    else:
        bank = build_proto_bank(proto_rows, bank_emb, bank_lla, num_cells,
                                max_protos=cfg.max_protos_per_cell,
                                max_members=cfg.max_members_per_cluster)
        if cache_path:
            os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
            np.savez(cache_path, **{
                f: np.asarray(getattr(bank, f))
                for f in ("proto_emb", "proto_lla", "proto_count",
                          "member_idx", "bank_emb", "bank_lla")})
    return make_refine_fn(bank, cfg, within_cluster=within_cluster)


def evaluate_benchmark(eval_step: Callable, params,
                       batches: Iterable[dict],
                       refine_fn: Optional[Callable] = None,
                       scaler=None, country_index=None,
                       batch_to_device: Optional[Callable] = None
                       ) -> Dict[str, float]:
    """Run a benchmark end-to-end: forward + (refine) + metric suite."""
    from pigeon_tpu.train.loop import evaluate_model

    return evaluate_model(eval_step, params, batches,
                          refine_fn=refine_fn, scaler=scaler,
                          country_index=country_index,
                          batch_to_device=batch_to_device)
