"""Raster ↔ vector conversion (north_rule: "raster↔vector").

* raster side: the tile histogram (``stages/tiling.py``) — points
  rasterized onto the z/x/y web-mercator grid.
* vector side: :func:`tile_bounds` / :func:`tiles_to_polygons` — tile
  coordinates back to lon/lat bounding rings (the standard slippy-map
  inverse).  ``sinh`` is written as ``(exp(p) - exp(-p)) / 2`` so a
  DuckDB oracle reproduces the doubles bit-for-bit
  (:func:`tile_bounds_sql`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _lat_of_y(y: np.ndarray, n: float) -> np.ndarray:
    p = np.pi * (1.0 - 2.0 * (y / n))
    sinh_p = (np.exp(p) - np.exp(-p)) / 2.0
    return np.degrees(np.arctan(sinh_p))


def tile_bounds(x, y, z: int):
    """(west, south, east, north) degrees of tile (x, y) at zoom z."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = float(1 << z)
    west = x / n * 360.0 - 180.0
    east = (x + 1.0) / n * 360.0 - 180.0
    north = _lat_of_y(y, n)
    south = _lat_of_y(y + 1.0, n)
    return west, south, east, north


def tile_bounds_sql(x_expr: str, y_expr: str, z: int):
    """DuckDB (west, south, east, north) mirroring :func:`tile_bounds`."""
    n = float(1 << z)

    def lat(yy):
        p = f"(pi() * (1.0 - 2.0 * (({yy}) / {n})))"
        sinh = f"((exp({p}) - exp(-{p})) / 2.0)"
        return f"degrees(atan({sinh}))"

    west = f"(({x_expr}) / {n} * 360.0 - 180.0)"
    east = f"((({x_expr}) + 1.0) / {n} * 360.0 - 180.0)"
    return west, lat(f"({y_expr}) + 1.0"), east, lat(y_expr)


def tiles_to_polygons(batch: pa.Table, z: int, x_col: str = "tile_x",
                      y_col: str = "tile_y") -> pa.Table:
    """Vectorize a tile batch: add bounds + closed CCW boundary rings
    (``ring_lon``/``ring_lat``) matching BOUNDARY_SCHEMA's ring shape —
    the output can feed straight back into the PIP join as regions."""
    x = batch[x_col].to_numpy(zero_copy_only=False)
    y = batch[y_col].to_numpy(zero_copy_only=False)
    w, s, e, n_ = tile_bounds(x, y, z)
    ring_lon = np.stack([w, e, e, w, w], axis=1)
    ring_lat = np.stack([s, s, n_, n_, s], axis=1)
    batch = batch.append_column("west", pa.array(w, pa.float64()))
    batch = batch.append_column("south", pa.array(s, pa.float64()))
    batch = batch.append_column("east", pa.array(e, pa.float64()))
    batch = batch.append_column("north", pa.array(n_, pa.float64()))
    batch = batch.append_column(
        "ring_lon", pa.array(ring_lon.tolist(), pa.list_(pa.float64())))
    batch = batch.append_column(
        "ring_lat", pa.array(ring_lat.tolist(), pa.list_(pa.float64())))
    return batch
