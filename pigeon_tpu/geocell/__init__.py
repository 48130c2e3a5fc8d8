"""Offline geocell machinery: geometry engine, Voronoi, creation, prototypes.

This subsystem rebuilds the reference's `dataset_creation/geocell/*` +
`dataset_creation/prototype/*` (the paper's core algorithmic contribution)
WITHOUT geopandas/shapely — on a dependency-free numpy geometry engine
(`geometry.py`, with optional C++ acceleration) plus scipy (Voronoi) and
scikit-learn (OPTICS), which are available.
"""

from pigeon_tpu.geocell.geometry import (  # noqa: F401
    MultiPolygon,
    Polygon,
    polygon_area,
    polygons_intersect,
)
from pigeon_tpu.geocell.voronoi import voronoi_finite_polygons  # noqa: F401
from pigeon_tpu.geocell.cells import Cell, CellCollection  # noqa: F401
from pigeon_tpu.geocell.creation import GeocellCreator  # noqa: F401
from pigeon_tpu.geocell.naive import NaiveCell  # noqa: F401
from pigeon_tpu.geocell.assignment import CellAssigner  # noqa: F401
from pigeon_tpu.geocell.prototypes import build_prototypes  # noqa: F401
