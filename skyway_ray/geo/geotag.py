"""Deterministic geotag derivation (phash → lat/lon and its inverse).

The input table (BASELINE.json ``input_hint``) carries no lat/lon, so the
engine derives a stable position from the 64-bit ``phash``: the high 32
bits map to latitude in [-60, 60), the low 32 bits to longitude in
[-180, 180) (SURVEY.md §1.3).  Stable across runs and cluster sizes;
pure integer/float arithmetic so a SQL oracle can mirror it.
"""

from __future__ import annotations

import numpy as np

_TWO32 = float(1 << 32)


def latlon_from_phash(phash) -> tuple[np.ndarray, np.ndarray]:
    u = np.asarray(phash, dtype=np.int64).view(np.uint64)
    hi = (u >> np.uint64(32)).astype(np.float64)
    lo = (u & np.uint64(0xFFFFFFFF)).astype(np.float64)
    lat = -60.0 + 120.0 * hi / _TWO32
    lon = -180.0 + 360.0 * lo / _TWO32
    return lat, lon


def phash_from_latlon(lat, lon) -> np.ndarray:
    """Inverse of :func:`latlon_from_phash` (used by fixtures to plant
    points at chosen positions). Returns int64 (uint64 bit pattern)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    hi = np.floor((lat + 60.0) / 120.0 * _TWO32).astype(np.uint64)
    lo = np.floor((lon + 180.0) / 360.0 * _TWO32).astype(np.uint64)
    hi = np.minimum(hi, np.uint64(0xFFFFFFFF))
    lo = np.minimum(lo, np.uint64(0xFFFFFFFF))
    return ((hi << np.uint64(32)) | lo).view(np.int64)
