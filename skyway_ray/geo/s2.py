"""Vectorized S2 cell ids (level-30 leaf cells).

A from-scratch numpy implementation of the public S2 geometry cell-id
scheme (s2geometry.io / the open-source s2geometry reference): lat/lon →
unit-sphere xyz → cube face + (u,v) → quadratic (s,t) → 30-bit (i,j) →
Hilbert-curve position interleave via the classic 4-bit lookup tables.

Leaf cell id layout (64 bits): 3 face bits, 60 position bits, trailing 1.
Returned as int64 — ids with face >= 4 are negative when viewed as
int64; comparisons/grouping still work since the mapping is bijective.
"""

from __future__ import annotations

import numpy as np

_LOOKUP_BITS = 4
_SWAP_MASK = 1
_INVERT_MASK = 2
_POS_TO_ORIENTATION = (_SWAP_MASK, 0, 0, _INVERT_MASK | _SWAP_MASK)
_POS_TO_IJ = (
    (0, 1, 3, 2),
    (0, 2, 3, 1),
    (3, 2, 0, 1),
    (3, 1, 0, 2),
)


def _build_lookup() -> np.ndarray:
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)

    def init(level, i, j, orig_orientation, pos, orientation):
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orientation] = (pos << 2) + orientation
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[orientation]
        for idx in range(4):
            ij = r[idx]
            init(level, i + (ij >> 1), j + (ij & 1), orig_orientation,
                 pos + idx, orientation ^ _POS_TO_ORIENTATION[idx])

    for orientation in range(4):
        init(0, 0, 0, orientation, 0, orientation)
    return lookup_pos


_LOOKUP_POS = _build_lookup()
_MAX_LEVEL = 30
_MAX_SIZE = 1 << _MAX_LEVEL


def _latlon_to_xyz(lat, lon):
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    theta = np.radians(np.asarray(lon, dtype=np.float64))
    cosphi = np.cos(phi)
    return cosphi * np.cos(theta), cosphi * np.sin(theta), np.sin(phi)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    face = np.where((face == 0) & (x < 0), 3, face)
    face = np.where((face == 1) & (y < 0), 4, face)
    face = np.where((face == 2) & (z < 0), 5, face)
    # (u, v) per face, from the s2geometry face conventions; full-array
    # divisions are masked right after, so silence the off-face warnings
    _err = np.seterr(divide="ignore", invalid="ignore")
    u = np.empty_like(x)
    v = np.empty_like(x)
    m0 = face == 0
    u[m0] = (y / x)[m0]; v[m0] = (z / x)[m0]
    m1 = face == 1
    u[m1] = (-x / y)[m1]; v[m1] = (z / y)[m1]
    m2 = face == 2
    u[m2] = (-x / z)[m2]; v[m2] = (-y / z)[m2]
    m3 = face == 3
    u[m3] = (z / x)[m3]; v[m3] = (y / x)[m3]
    m4 = face == 4
    u[m4] = (z / y)[m4]; v[m4] = (-x / y)[m4]
    m5 = face == 5
    u[m5] = (-y / z)[m5]; v[m5] = (-x / z)[m5]
    np.seterr(**_err)
    return face.astype(np.int64), u, v


def _uv_to_st(u):
    """Quadratic projection (the s2geometry default)."""
    with np.errstate(invalid="ignore"):
        # np.where evaluates both branches; each is valid only on its side
        return np.where(
            u >= 0.0,
            0.5 * np.sqrt(1.0 + 3.0 * u),
            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u),
        )


def _st_to_ij(s):
    ij = np.floor(_MAX_SIZE * s).astype(np.int64)
    np.clip(ij, 0, _MAX_SIZE - 1, out=ij)
    return ij


def s2_cell_id(lat, lon) -> np.ndarray:
    """Level-30 S2 leaf cell ids for lat/lon degrees. Vectorized."""
    x, y, z = _latlon_to_xyz(lat, lon)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))

    n = face.astype(np.uint64) << np.uint64(60)
    bits = (face & _SWAP_MASK).astype(np.int64)
    mask = (1 << _LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits += ((i >> (k * _LOOKUP_BITS)) & mask) << (_LOOKUP_BITS + 2)
        bits += ((j >> (k * _LOOKUP_BITS)) & mask) << 2
        bits = _LOOKUP_POS[bits]
        n |= (bits >> 2).astype(np.uint64) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= _SWAP_MASK | _INVERT_MASK
    return ((n << np.uint64(1)) | np.uint64(1)).view(np.int64)


def s2_face(cell_id) -> np.ndarray:
    """Face (0..5) from a leaf cell id."""
    return (np.asarray(cell_id).view(np.uint64) >> np.uint64(61)).astype(np.int64)


def s2_parent_pos(cell_id, level: int) -> np.ndarray:
    """The (face + position) prefix of a leaf id truncated to ``level`` —
    equal for two leaves iff they share the level-``level`` ancestor."""
    u = np.asarray(cell_id).view(np.uint64)
    shift = np.uint64(2 * (_MAX_LEVEL - level) + 1)
    return (u >> shift).view(np.int64)
