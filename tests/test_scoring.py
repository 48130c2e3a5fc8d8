"""Tests for label smoothing + GeoGuessr scoring parity."""

import jax.numpy as jnp
import numpy as np

from pigeon_tpu.core import (
    geoguessr_score,
    geoguessr_score_np,
    percentage_within_radius,
    smooth_labels,
    smooth_month_labels,
)


class TestSmoothLabels:
    def test_min_cell_gets_one(self):
        d = np.array([[100.0, 25.0, 4000.0], [0.0, 75.0, 150.0]])
        s = np.asarray(smooth_labels(jnp.asarray(d), tau_km=75.0))
        assert s[0].max() == 1.0 and s[0].argmax() == 1
        assert s[1].max() == 1.0 and s[1].argmax() == 0

    def test_exact_values(self):
        # exp(-(d - dmin)/tau) elementwise.
        d = np.array([[0.0, 75.0, 150.0]])
        s = np.asarray(smooth_labels(jnp.asarray(d), tau_km=75.0))
        np.testing.assert_allclose(
            s[0], [1.0, np.exp(-1.0), np.exp(-2.0)], rtol=1e-5)

    def test_tau_switch(self):
        d = np.array([[0.0, 65.0]])
        s = np.asarray(smooth_labels(jnp.asarray(d), tau_km=65.0))
        np.testing.assert_allclose(s[0, 1], np.exp(-1.0), rtol=1e-5)

    def test_nan_guard(self):
        d = jnp.asarray(np.array([[0.0, np.nan, np.inf]]))
        s = np.asarray(smooth_labels(d))
        assert np.isfinite(s).all()

    def test_unnormalized(self):
        # Targets deliberately do NOT sum to 1 (see scoring.py docstring).
        d = np.zeros((1, 5))
        s = np.asarray(smooth_labels(jnp.asarray(d)))
        np.testing.assert_allclose(s, 1.0)


class TestMonthSmoothing:
    def test_wraparound(self):
        s = np.asarray(smooth_month_labels(jnp.asarray([0])))[0]
        # December (11) is 1 month from January (0) circularly.
        np.testing.assert_allclose(s[11], s[1], rtol=1e-6)
        assert s[0] == 1.0
        assert s[6] == s.min()


class TestGeoguessrScore:
    def test_perfect(self):
        assert geoguessr_score_np(np.zeros(10)) == 5000.0

    def test_decay_constant(self):
        # Exactly one decay constant away -> round(5000/e) = 1839.
        assert geoguessr_score_np(np.array([1492.7])) == float(
            np.round(5000 / np.e))

    def test_rounding_then_mean(self):
        # Rounding happens per-sample BEFORE the mean (metrics.py:113-115).
        d = np.array([0.0, 1492.7])
        expected = (5000.0 + np.round(5000 / np.e)) / 2
        assert geoguessr_score_np(d) == expected

    def test_jnp_matches(self):
        d = np.abs(np.random.default_rng(0).normal(500, 400, size=100))
        np.testing.assert_allclose(
            float(geoguessr_score(jnp.asarray(d))),
            geoguessr_score_np(d), rtol=1e-6)


class TestWithinRadius:
    def test_strict_inequality(self):
        import pytest
        d = jnp.asarray([1.0, 0.5, 25.0])
        assert float(percentage_within_radius(d, 1.0)) == pytest.approx(1 / 3)
        assert float(percentage_within_radius(d, 25.0)) == pytest.approx(2 / 3)
        assert float(percentage_within_radius(d, 26.0)) == 1.0
