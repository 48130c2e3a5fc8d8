"""Tests for the evaluation metric suite + regression scaler + country PIP."""

import json

import numpy as np
import pytest

from pigeon_tpu.train.metrics import (
    CountryIndex,
    RegressionScaler,
    compute_geoguessr_metrics,
    country_accuracy,
    points_in_polygon,
)

RNG = np.random.default_rng(11)


class TestScaler:
    def test_roundtrip(self):
        raw = np.stack([
            RNG.uniform(-100, 4000, 50),      # elevation
            RNG.uniform(0, 10000, 50),        # population
            RNG.uniform(-30, 35, 50),         # temp avg
            RNG.uniform(0, 40, 50),           # temp diff
            RNG.uniform(0, 400, 50),          # prec avg
            RNG.uniform(0, 300, 50),          # prec diff
        ], -1)
        scaler = RegressionScaler.fit(raw)
        back = scaler.inverse(scaler.transform(raw))
        np.testing.assert_allclose(back, raw, rtol=1e-8, atol=1e-8)

    def test_scaled_is_standardized(self):
        raw = np.abs(RNG.normal(1000, 300, size=(200, 6)))
        scaler = RegressionScaler.fit(raw)
        t = scaler.transform(raw)
        np.testing.assert_allclose(t.mean(0), 0, atol=1e-9)
        np.testing.assert_allclose(t.std(0), 1, atol=1e-6)

    def test_save_load(self, tmp_path):
        raw = np.abs(RNG.normal(100, 30, size=(20, 6)))
        scaler = RegressionScaler.fit(raw, elevation_offset=416.0)
        p = str(tmp_path / "scaler.json")
        scaler.save(p)
        loaded = RegressionScaler.load(p)
        np.testing.assert_allclose(
            loaded.inverse(scaler.transform(raw)), raw, rtol=1e-8)


class TestPointInPolygon:
    SQUARE = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)

    def test_inside_outside(self):
        pts = np.array([[5, 5], [15, 5], [-1, -1], [9.99, 9.99]])
        np.testing.assert_array_equal(
            points_in_polygon(pts, self.SQUARE),
            [True, False, False, True])

    def test_concave(self):
        # L-shape: notch cut out of top-right.
        poly = np.array([[0, 0], [10, 0], [10, 5], [5, 5], [5, 10], [0, 10]],
                        float)
        pts = np.array([[7, 7], [2, 7], [7, 2]])
        np.testing.assert_array_equal(
            points_in_polygon(pts, poly), [False, True, True])


@pytest.fixture()
def tiny_world(tmp_path):
    """Two-country GeoJSON: 'Westland' x<0, 'Eastland' x>0."""
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"name": "Westland"},
         "geometry": {"type": "Polygon", "coordinates": [
             [[-20, -10], [0, -10], [0, 10], [-20, 10], [-20, -10]]]}},
        {"type": "Feature", "properties": {"name": "Eastland"},
         "geometry": {"type": "MultiPolygon", "coordinates": [
             [[[0, -10], [20, -10], [20, 10], [0, 10], [0, -10]]]]}},
    ]}
    p = tmp_path / "countries.geojson"
    p.write_text(json.dumps(fc))
    return CountryIndex(str(p))


class TestCountry:
    def test_lookup(self, tiny_world):
        idx = tiny_world.country_of(np.array([[-5.0, 0.0], [5.0, 0.0]]))
        assert tiny_world.names[idx[0]] == "Westland"
        assert tiny_world.names[idx[1]] == "Eastland"

    def test_nearest_fallback(self, tiny_world):
        # Far outside every polygon -> nearest centroid.
        idx = tiny_world.country_of(np.array([[100.0, 0.0]]))
        assert tiny_world.names[idx[0]] == "Eastland"

    def test_accuracy(self, tiny_world):
        labels = np.array([[-5.0, 0.0], [5.0, 0.0]])
        preds_good = np.array([[-10.0, 5.0], [1.0, -2.0]])
        preds_half = np.array([[3.0, 0.0], [1.0, 0.0]])
        assert country_accuracy(preds_good, labels, tiny_world) == 1.0
        assert country_accuracy(preds_half, labels, tiny_world) == 0.5


class TestMetricSuite:
    def test_keys_and_values(self, tiny_world):
        n = 101
        labels = np.stack([RNG.uniform(-15, 15, n),
                           RNG.uniform(-8, 8, n)], -1)
        # Predictions: 51 exact, 50 offset ~1000 km east (odd count so the
        # median lands on an exact-zero sample).
        preds = labels.copy()
        preds[51:, 0] += 9.0
        cell_labels = RNG.integers(0, 10, n)
        cell_preds = cell_labels.copy()
        cell_preds[80:] = (cell_preds[80:] + 1) % 10
        topk = np.stack([cell_labels, (cell_labels + 1) % 10,
                         (cell_labels + 2) % 10], -1)
        topk[90:] = 0  # break top-k for 10 samples where label != 0

        m = compute_geoguessr_metrics(
            preds, labels, cell_preds=cell_preds, cell_labels=cell_labels,
            topk_cells=topk, country_index=tiny_world)

        assert m["Median_km_error"] == pytest.approx(0.0, abs=1e-9)
        assert m["Under_1_km"] == pytest.approx(51 / 101)
        assert m["Under_2500_km"] == 1.0
        assert m["Geocell_accuracy"] == pytest.approx(80 / 101)
        assert 0.85 <= m["Geocell_top5_accuracy"] <= 1.0
        assert 0 <= m["Country_accuracy"] <= 1
        assert m["Geoguessr_score"] > 2500
        for r in (1, 5, 10, 25, 50, 100, 200, 750, 1000, 2500):
            assert f"Under_{r}_km" in m

    def test_one_hot_cell_labels(self):
        labels = np.zeros((4, 2))
        preds = np.zeros((4, 2))
        one_hot = np.eye(5)[[0, 1, 2, 3]]
        m = compute_geoguessr_metrics(
            preds, labels, cell_preds=np.array([0, 1, 2, 0]),
            cell_labels=one_hot)
        assert m["Geocell_accuracy"] == pytest.approx(0.75)

    def test_multitask_maes(self):
        raw = np.abs(RNG.normal(500, 100, size=(30, 6)))
        scaler = RegressionScaler.fit(raw)
        scaled = scaler.transform(raw)
        noisy = scaled + 0.01
        m = compute_geoguessr_metrics(
            np.zeros((30, 2)), np.zeros((30, 2)),
            preds_mt=noisy, labels_mt=scaled, scaler=scaler,
            preds_climate=RNG.normal(size=(30, 28)),
            labels_climate=RNG.integers(0, 28, 30),
            preds_month=RNG.normal(size=(30, 12)),
            labels_month=RNG.integers(0, 12, 30))
        for key in ("Mean_elevation_error", "Mean_population_error",
                    "Mean_temperature_error", "Mean_temp_diff_error",
                    "Mean_precipitation_error", "Mean_prec_diff_error",
                    "Climate_accuracy", "Month_accuracy"):
            assert key in m
        assert m["Mean_temperature_error"] < 1.0  # tiny perturbation
