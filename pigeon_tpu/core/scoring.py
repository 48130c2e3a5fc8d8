"""Label smoothing and GeoGuessr scoring — pure jnp functions.

Parity targets (reference LukasHaas/PIGEON):
  * smooth_labels     — `preprocessing/utils.py:7-19`
  * geoguessr_score   — `evaluation/metrics.py:103-115`
  * percentage_within_radius — `evaluation/metrics.py:90-101`
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pigeon_tpu.config import GEOGUESSR_DECAY_KM, GEOGUESSR_MAX_SCORE


def smooth_labels(distances, tau_km: float = 75.0):
    """Haversine label smoothing over geocells.

    Converts a ``(batch, num_cells)`` matrix of haversine distances (km) from
    each sample's true location to every geocell centroid into soft targets:

        ``exp(-(d - min_c d) / tau)``

    The minimum-distance cell gets weight 1.0; weight decays exponentially
    with *extra* distance. Targets are intentionally unnormalized — the loss
    contract is ``-sum_c target_c * log_softmax(logits)_c`` exactly as
    torch's ``CrossEntropyLoss`` computes it for probability targets
    (reference `preprocessing/utils.py:7-19`, `models/super_guessr.py:469-474`).

    Args:
        distances: ``(..., num_cells)`` distances in km.
        tau_km: smoothing temperature in km (75 PIGEON / 65 PIGEOTTO,
            reference `config.py:55`).

    Returns:
        ``(..., num_cells)`` soft targets in [0, 1].
    """
    adj = distances - jnp.min(distances, axis=-1, keepdims=True)
    smoothed = jnp.exp(-adj / tau_km)
    return jnp.nan_to_num(smoothed, nan=0.0, posinf=0.0, neginf=0.0)


def smooth_month_labels(month_labels, num_months: int = 12,
                        tau: float = 0.3):
    """Cyclic smoothing of month labels.

    The reference defines ``LABEL_SMOOTHING_MONTHS = 0.3`` (`config.py:56`)
    for month-distance smoothing; we apply the same exponential kernel over
    circular month distance (months 0..11, wrap-around):

        ``exp(-circ_dist(m, label) / tau)``

    Args:
        month_labels: ``(...,)`` int month indices in [0, 12).
        num_months: number of classes.
        tau: smoothing temperature in months.

    Returns:
        ``(..., num_months)`` soft targets, max entry 1.0.
    """
    months = jnp.arange(num_months)
    diff = jnp.abs(month_labels[..., None] - months)
    circ = jnp.minimum(diff, num_months - diff)
    return jnp.exp(-circ / tau)


def geoguessr_score(distances_km):
    """Mean GeoGuessr score: ``mean(round(5000 * exp(-d / 1492.7)))``.

    Parity: reference `evaluation/metrics.py:103-115`.
    """
    scores = jnp.round(GEOGUESSR_MAX_SCORE
                       * jnp.exp(-distances_km / GEOGUESSR_DECAY_KM))
    return jnp.mean(scores)


def geoguessr_score_np(distances_km: np.ndarray) -> float:
    """Float64 host twin of :func:`geoguessr_score`."""
    d = np.asarray(distances_km, dtype=np.float64)
    return float(np.mean(np.round(
        GEOGUESSR_MAX_SCORE * np.exp(-d / GEOGUESSR_DECAY_KM))))


def percentage_within_radius(distances_km, km: float):
    """Fraction of samples with error strictly below ``km`` kilometers.

    Parity: reference `evaluation/metrics.py:90-101` (strict ``<``).
    """
    d = jnp.asarray(distances_km)
    return jnp.mean((d < km).astype(jnp.float32))
