"""Tests for GeoAugmentor: GeoTIFF sampling, Mollweide projection, gating."""

import json

import numpy as np
import pytest

from pigeon_tpu.geocell.augmentor import (
    GeoAugmentor,
    GeoTiffSampler,
    KOPPEN_CLASSES,
    climate_class_index,
    mollweide_forward,
)

PIL = pytest.importorskip("PIL")


def write_geotiff(path, data, origin=(-180.0, 90.0), scale=(1.0, 1.0)):
    """Write a tiny GeoTIFF with ModelPixelScale + ModelTiepoint tags."""
    from PIL import Image, TiffImagePlugin

    ifd = TiffImagePlugin.ImageFileDirectory_v2()
    ifd[33550] = (float(scale[0]), float(scale[1]), 0.0)
    ifd[33922] = (0.0, 0.0, 0.0, float(origin[0]), float(origin[1]), 0.0)
    im = Image.fromarray(data)
    im.save(path, tiffinfo=ifd)


class TestGeoTiffSampler:
    def test_nearest_sampling(self, tmp_path):
        # 180x360 one-degree world grid; value = row * 1000 + col.
        data = (np.arange(180)[:, None] * 1000
                + np.arange(360)[None, :]).astype(np.int32)
        path = str(tmp_path / "world.tif")
        write_geotiff(path, data)
        s = GeoTiffSampler(path)
        # (lon=-179.5, lat=89.5) -> pixel (0, 0)
        v = s.sample(np.array([-179.5, 0.5, 179.5]),
                     np.array([89.5, 0.5, -89.5]))
        np.testing.assert_array_equal(v, [0, 89 * 1000 + 180,
                                          179 * 1000 + 359])

    def test_missing_tags_raises(self, tmp_path):
        from PIL import Image

        p = str(tmp_path / "plain.tif")
        Image.fromarray(np.zeros((4, 4), np.uint8)).save(p)
        with pytest.raises(ValueError, match="georeference"):
            GeoTiffSampler(p)


class TestMollweide:
    def test_known_points(self):
        # Equator/prime meridian maps to origin.
        x, y = mollweide_forward(np.array([0.0]), np.array([0.0]))
        assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
        # Poles: y = +-sqrt(2) * R.
        _, yn = mollweide_forward(np.array([0.0]), np.array([90.0]))
        np.testing.assert_allclose(yn[0], np.sqrt(2) * 6371007.181,
                                   rtol=1e-6)
        # Monotone in latitude.
        _, ys = mollweide_forward(np.zeros(5),
                                  np.array([-60, -30, 0, 30, 60]))
        assert (np.diff(ys) > 0).all()


class TestClimate:
    def test_legend_complete(self):
        assert set(KOPPEN_CLASSES) == set(range(1, 31))
        assert climate_class_index(1) == 0
        assert climate_class_index(28) == 27
        assert climate_class_index(30) == 27  # polar folds into last class


class TestAugmentor:
    def test_full_augment(self, tmp_path):
        import pandas as pd

        from pigeon_tpu.geocell.creation import BoundarySet

        # Two-country world.
        fc = {"type": "FeatureCollection", "features": [
            {"type": "Feature", "properties": {"name": "Westland"},
             "geometry": {"type": "Polygon", "coordinates": [
                 [[-20, -10], [0, -10], [0, 10], [-20, 10], [-20, -10]]]}},
            {"type": "Feature", "properties": {"name": "Eastland"},
             "geometry": {"type": "Polygon", "coordinates": [
                 [[0, -10], [20, -10], [20, 10], [0, 10], [0, -10]]]}},
        ]}
        gj = tmp_path / "c.geojson"
        gj.write_text(json.dumps(fc))
        bs = BoundarySet.from_geojson(str(gj))

        # Climate raster: west=14 (Cfa), east=15 (Cfb); elevation = 100.
        clim = np.full((20, 40), 14, np.uint8)
        clim[:, 20:] = 15
        write_geotiff(str(tmp_path / "koppen.tif"), clim,
                      origin=(-20.0, 10.0), scale=(1.0, 1.0))
        elev = np.full((20, 40), 100, np.int16)
        write_geotiff(str(tmp_path / "elev.tif"), elev,
                      origin=(-20.0, 10.0), scale=(1.0, 1.0))

        aug = GeoAugmentor(
            countries=bs, country_names=["Westland", "Eastland"],
            koppen_raster=str(tmp_path / "koppen.tif"),
            elevation_raster=str(tmp_path / "elev.tif"),
            driving_side={"Westland": "left", "Eastland": "right"})
        df = pd.DataFrame({"lng": [-10.0, 10.0], "lat": [0.0, 0.0]})
        out = aug.augment(df)

        assert list(out["country_name"]) == ["Westland", "Eastland"]
        assert list(out["driving_right"]) == [False, True]
        assert out["climate_zone"][0] == "a humid subtropical climate"
        assert out["climate_zone"][1] == "a temperate oceanic climate"
        assert list(out["climate_zone_idx"]) == [13, 14]
        assert (out["elevation"] == 100).all()

    def test_gating_missing_sources(self):
        import pandas as pd

        aug = GeoAugmentor(koppen_raster="/nonexistent/k.tif")
        df = pd.DataFrame({"lng": [1.0], "lat": [2.0]})
        out = aug.augment(df)
        # No crash; no enrichment columns added.
        assert "climate_zone" not in out.columns
        assert "country_name" not in out.columns
