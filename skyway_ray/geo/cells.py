"""Hierarchical grid cells (the engine's "h3_r*" columns).

A deterministic, SQL-mirrorable hierarchical cell scheme over lat/lon.
The real H3 library is not available in this environment, so the engine
uses an equal-angle quadtree grid exposing the same *interface* H3 would
provide (hierarchical resolutions, parent/child containment, k-ring
neighborhoods).  Resolution ``r`` divides lon into ``2**r`` columns and
lat into ``2**r`` rows; a cell id packs ``(r, ix, iy)`` into an int64:

    cell = (r << 58) | (ix << 29) | iy        # r <= 28, ix/iy < 2**28

The encoding is pure integer arithmetic so a DuckDB oracle can reproduce
it exactly:

    r * 288230376151711744 + ix * 536870912 + iy

Parent/child containment holds by construction: the parent at resolution
``p < r`` is the cell whose (ix, iy) are the child's shifted down by
``r - p`` bits — mirrors H3's ``h3_to_parent``.

All functions are vectorized over numpy arrays; int64 in/out so the
columns round-trip through Arrow/parquet/DuckDB without unsigned casts.
"""

from __future__ import annotations

import numpy as np

CELL_RES_BITS = 58
_XY_BITS = 29
_XY_MASK = (1 << _XY_BITS) - 1


def _as_f64(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float64)


def cell_xy(lat, lon, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Grid indices (ix, iy) at resolution ``res`` for lat/lon degrees."""
    lat = _as_f64(lat)
    lon = _as_f64(lon)
    n = np.int64(1) << res
    ix = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    iy = np.floor((lat + 90.0) / 180.0 * n).astype(np.int64)
    np.clip(ix, 0, n - 1, out=ix)
    np.clip(iy, 0, n - 1, out=iy)
    return ix, iy


def cell_id(lat, lon, res: int) -> np.ndarray:
    """int64 cell id at resolution ``res`` (0..28)."""
    if not 0 <= res <= 28:
        raise ValueError(f"resolution must be 0..28, got {res}")
    ix, iy = cell_xy(lat, lon, res)
    return (np.int64(res) << CELL_RES_BITS) | (ix << _XY_BITS) | iy


def cell_res(cell) -> np.ndarray:
    """Resolution encoded in a cell id."""
    return (np.asarray(cell, dtype=np.int64) >> CELL_RES_BITS).astype(np.int64)


def cell_decode(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(res, ix, iy) from cell ids."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> CELL_RES_BITS
    ix = (cell >> _XY_BITS) & _XY_MASK
    iy = cell & _XY_MASK
    return res, ix, iy


def cell_parent(cell, parent_res: int) -> np.ndarray:
    """Ancestor cell at a coarser resolution (mirrors h3_to_parent)."""
    res, ix, iy = cell_decode(cell)
    shift = res - parent_res
    if np.any(shift < 0):
        raise ValueError("parent_res must be <= cell resolution")
    return (
        (np.int64(parent_res) << CELL_RES_BITS)
        | ((ix >> shift) << _XY_BITS)
        | (iy >> shift)
    )


def cell_center(cell) -> tuple[np.ndarray, np.ndarray]:
    """(lat, lon) of the cell center."""
    res, ix, iy = cell_decode(cell)
    n = (np.int64(1) << res).astype(np.float64)
    lon = (ix.astype(np.float64) + 0.5) / n * 360.0 - 180.0
    lat = (iy.astype(np.float64) + 0.5) / n * 180.0 - 90.0
    return lat, lon


def cell_disk(cell: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance ``k`` of one cell (the H3
    ``grid_disk`` analogue).  Longitude wraps; latitude clamps at the
    poles.  Scalar cell in, int64 array out (deduplicated, sorted)."""
    res, ix, iy = cell_decode(np.asarray([cell]))
    res, ix, iy = int(res[0]), int(ix[0]), int(iy[0])
    n = 1 << res
    dx, dy = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1))
    xs = (ix + dx.ravel()) % n          # wrap lon
    ys = iy + dy.ravel()
    keep = (ys >= 0) & (ys < n)         # clamp lat
    xs, ys = xs[keep].astype(np.int64), ys[keep].astype(np.int64)
    ids = (np.int64(res) << CELL_RES_BITS) | (xs << _XY_BITS) | ys
    return np.unique(ids)


def cell_ring(cell: int, k: int) -> np.ndarray:
    """Cells at exactly Chebyshev distance ``k`` (H3 ``grid_ring``)."""
    if k == 0:
        return np.asarray([cell], dtype=np.int64)
    disk_k = cell_disk(cell, k)
    disk_km1 = cell_disk(cell, k - 1)
    return np.setdiff1d(disk_k, disk_km1, assume_unique=True)


def cell_size_deg(res: int) -> tuple[float, float]:
    """(lat_extent, lon_extent) of a cell in degrees."""
    n = float(1 << res)
    return 180.0 / n, 360.0 / n


def cell_sql(lat_expr: str, lon_expr: str, res: int) -> str:
    """DuckDB SQL expression mirroring :func:`cell_id` exactly."""
    n = 1 << res
    ix = (
        f"least(greatest(cast(floor(({lon_expr} + 180.0) / 360.0 * {n}) "
        f"as bigint), 0), {n - 1})"
    )
    iy = (
        f"least(greatest(cast(floor(({lat_expr} + 90.0) / 180.0 * {n}) "
        f"as bigint), 0), {n - 1})"
    )
    return f"({res} * 288230376151711744 + {ix} * 536870912 + {iy})"
