"""Geocell-creation scale validation (synthetic planet, ~80k points).

Round-1 ran this ad hoc; kept as a script so the balance + dissolve +
sliver-repair invariants can be re-validated after geometry changes:

  * no point loss through fuse/split/cleanup;
  * no undersize cells (>= min_cell_size after balancing);
  * every exported WKT parses and round-trips area;
  * exported geometry is dissolved (fragments only where true islands).

Usage: python scripts/geocell_scale_check.py [n_points]
       python scripts/geocell_scale_check.py fuse [n_cells]

The `fuse` mode stresses the OTHER balance phase: a grid of admin-seeded
cells with long-tail sizes (the admin-2 seeding shape,
`creation.py::_seed_cells`) drives the fuse ladder + the native
`multipoly_intersect_batch` adjacency kernel.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from pigeon_tpu.geocell import GeocellCreator
from pigeon_tpu.geocell import geometry as geom
from pigeon_tpu.geocell.cells import OPTICS_PARAMS_PLANET


def synthetic_planet(n_points: int, seed: int = 330) -> pd.DataFrame:
    """Clustered points over a continent grid: ~60 hotspots with long-tail
    sizes, mimicking training-data density skew."""
    rng = np.random.default_rng(seed)
    hotspots = np.stack([rng.uniform(-160, 160, 60),
                         rng.uniform(-55, 65, 60)], -1)
    weights = rng.pareto(1.2, 60) + 0.05
    weights /= weights.sum()
    counts = rng.multinomial(n_points, weights)
    pts = []
    for (cx, cy), c in zip(hotspots, counts):
        sigma = rng.uniform(0.3, 3.0)
        pts.append(rng.normal([cx, cy], sigma, (c, 2)))
    pts = np.concatenate(pts)
    pts[:, 1] = np.clip(pts[:, 1], -85, 85)
    return pd.DataFrame({"lng": pts[:, 0], "lat": pts[:, 1]})


def main(n_points: int = 79_000, num_workers: int = 8) -> int:
    df = synthetic_planet(n_points)
    t0 = time.time()
    creator = GeocellCreator(df)
    cells = creator.generate(min_cell_size=1000, max_cell_size=2000,
                             optics_params=OPTICS_PARAMS_PLANET,
                             num_workers=num_workers)
    t1 = time.time()

    sizes = np.array([c.size for c in cells])
    total = int(sizes.sum())
    print(f"points={n_points} cells={len(cells)} "
          f"balance_time={t1 - t0:.1f}s")
    assert total == n_points, f"point loss: {total} != {n_points}"
    undersize = int((sizes < 1000).sum())
    oversize = int((sizes > 2000).sum())
    print(f"sizes: min={sizes.min()} max={sizes.max()} "
          f"undersize={undersize} oversize={oversize} "
          f"(oversize allowed: dense unimodal blobs)")
    assert undersize == 0, "undersize cells after balancing"

    # WKT export: parses, dissolved, area sane.
    frag_cells = 0
    for c in cells:
        row = c.to_row()
        back = geom.from_wkt(row["geometry"])
        if row["num_polygons"] > 1:
            frag_cells += 1
        if c.polygons:
            assert back, f"unparseable WKT for {c.cell_id}"
    print(f"multi-part cells after dissolve: {frag_cells}/{len(cells)}")
    print("OK")
    return 0


def fuse_stress(n_cells: int = 3000, min_cell_size: int = 30,
                seed: int = 330) -> int:
    """Fuse-phase stress: admin-seeded grid cells with pareto sizes."""
    from pigeon_tpu.geocell.cells import Cell, CellCollection

    rng = np.random.default_rng(0)
    side = int(np.ceil(np.sqrt(n_cells)))
    cells = []
    for k in range(n_cells):
        i, j = divmod(k, side)
        x0, y0 = i - side / 2, j - side / 2
        n = int(rng.pareto(1.0) * 8) + 1
        pts = rng.uniform([x0, y0], [x0 + 1, y0 + 1], (n, 2))
        poly = np.array([[x0, y0], [x0 + 1, y0],
                         [x0 + 1, y0 + 1], [x0, y0 + 1]], float)
        cells.append(Cell(f"c{k}", f"a{i // 6}", "X", pts, [poly]))
    total = sum(c.size for c in cells)
    coll = CellCollection(cells)
    t0 = time.time()
    coll._fuse_country("X", min_cell_size=min_cell_size, seed=seed)
    t = time.time() - t0
    coll.clean()
    after = sum(c.size for c in coll)
    print(f"fuse: cells={n_cells} points={total} time={t:.1f}s "
          f"remaining={len(coll)}")
    assert after == total, f"point loss in fuse: {after} != {total}"
    small_unfusable = [c for c in coll if c.size < min_cell_size]
    # Isolated cells may legitimately stay small; they must be rare.
    assert len(small_unfusable) < n_cells * 0.01, len(small_unfusable)
    print("OK")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "fuse":
        sys.exit(fuse_stress(
            int(sys.argv[2]) if len(sys.argv) > 2 else 3000))
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 79_000))
