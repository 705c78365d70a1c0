"""Web-mercator (slippy-map) z/x/y tile assignment.

Standard OSM tile math, vectorized; the DuckDB mirror in
:func:`tile_sql` reproduces it bit-for-bit so tile assignment can be
hash-verified against a SQL oracle.
"""

from __future__ import annotations

import numpy as np

MAX_MERC_LAT = 85.05112878


def tile_xy(lat, lon, z: int) -> tuple[np.ndarray, np.ndarray]:
    """(tile_x, tile_y) at zoom ``z`` for lat/lon degrees."""
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_MERC_LAT, MAX_MERC_LAT)
    lon = np.asarray(lon, dtype=np.float64)
    n = np.int64(1) << z
    x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    rad = np.radians(lat)
    y = np.floor((1.0 - np.log(np.tan(rad) + 1.0 / np.cos(rad)) / np.pi) / 2.0 * n)
    y = y.astype(np.int64)
    np.clip(x, 0, n - 1, out=x)
    np.clip(y, 0, n - 1, out=y)
    return x, y


def tile_sql(lat_expr: str, lon_expr: str, z: int) -> tuple[str, str]:
    """DuckDB SQL (x_expr, y_expr) mirroring :func:`tile_xy`."""
    n = 1 << z
    clat = f"least(greatest({lat_expr}, {-MAX_MERC_LAT}), {MAX_MERC_LAT})"
    x = (
        f"least(greatest(cast(floor(({lon_expr} + 180.0) / 360.0 * {n}) "
        f"as bigint), 0), {n - 1})"
    )
    y = (
        f"least(greatest(cast(floor((1.0 - ln(tan(radians({clat})) + "
        f"1.0 / cos(radians({clat}))) / pi()) / 2.0 * {n}) "
        f"as bigint), 0), {n - 1})"
    )
    return x, y
