"""Vectorized point-in-polygon (ray casting / crossing number).

The exact test behind the PIP spatial join (``stages/pip_join.py``).
Semantics follow the even-odd rule with half-open edge treatment
(`y1 <= py != y2 <= py`), the same convention the pure-Python oracle in
``filters/oracle.py`` uses, so engine and golden outputs agree
row-for-row even for points exactly on horizontal edges.
"""

from __future__ import annotations

import numpy as np

# cap the points×edges broadcast at ~4M doubles per chunk
_CHUNK_CELLS = 4_000_000


def points_in_ring(px, py, ring_x, ring_y) -> np.ndarray:
    """Even-odd test of many points against one ring.

    ``ring_x/ring_y`` need not repeat the first vertex; closure is
    implicit. Returns a boolean array aligned with ``px``."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    rx = np.asarray(ring_x, dtype=np.float64)
    ry = np.asarray(ring_y, dtype=np.float64)
    if rx[0] == rx[-1] and ry[0] == ry[-1] and len(rx) > 1:
        rx, ry = rx[:-1], ry[:-1]
    x1, y1 = rx, ry
    x2, y2 = np.roll(rx, -1), np.roll(ry, -1)
    n = len(px)
    out = np.empty(n, dtype=bool)
    step = max(1, _CHUNK_CELLS // max(1, len(rx)))
    for s in range(0, n, step):
        e = min(n, s + step)
        pyc = py[s:e, None]
        pxc = px[s:e, None]
        crosses = (y1 <= pyc) != (y2 <= pyc)
        with np.errstate(divide="ignore", invalid="ignore"):
            xin = x1 + (pyc - y1) * (x2 - x1) / (y2 - y1)
        hits = crosses & (pxc < xin)
        out[s:e] = (hits.sum(axis=1) & 1).astype(bool)
    return out


def point_in_ring_slow(px: float, py: float, ring_x, ring_y) -> bool:
    """Scalar reference used by the golden-output oracle — identical
    edge conventions to :func:`points_in_ring`."""
    rx = list(map(float, ring_x))
    ry = list(map(float, ring_y))
    if len(rx) > 1 and rx[0] == rx[-1] and ry[0] == ry[-1]:
        rx, ry = rx[:-1], ry[:-1]
    inside = False
    n = len(rx)
    for i in range(n):
        x1, y1 = rx[i], ry[i]
        x2, y2 = rx[(i + 1) % n], ry[(i + 1) % n]
        if (y1 <= py) != (y2 <= py):
            xin = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if px < xin:
                inside = not inside
    return inside


def ring_bbox(ring_x, ring_y) -> tuple[float, float, float, float]:
    rx = np.asarray(ring_x, dtype=np.float64)
    ry = np.asarray(ring_y, dtype=np.float64)
    return float(rx.min()), float(ry.min()), float(rx.max()), float(ry.max())
