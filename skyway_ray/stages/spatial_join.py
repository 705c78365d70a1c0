"""Distributed rectangle-overlap join — Partition-Based Spatial-Merge
(PBSM, Patel & DeWitt SIGMOD'96) on Ray Data.

Both inputs are box tables (id, xmin, ymin, xmax, ymax).  Each box
flat-maps to every fixed-grid cell it touches; a single
bounded-cardinality ``groupby(cell)`` co-partitions both sides, and a
vectorized (chunked — worker memory stays ``chunk × |B-in-cell|``)
overlap test runs per cell.  Duplicate reports across cells are
eliminated WITHOUT a second shuffle by the *reference-point* rule: a
pair is reported only by the cell containing the overlap region's min
corner (floor is monotone, so that cell is always among the covered
cells of both boxes — exact, no post-dedup pass).

Scale notes: grid granularity trades fan-out (boxes × cells-covered
rows) against per-cell work — pick ``cell`` a small multiple of the
typical box size; skewed cells (urban hot spots) split by salting the
cell id with a hash of one side's id and replicating the other side
across the salt range, same as stages/salt.py does for group keys.
Overlap is CLOSED-interval (touching edges join) to match the natural
SQL predicate ``a.xmin <= b.xmax AND b.xmin <= a.xmax AND …``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_X0, _Y0 = -180.0, -90.0  # grid origin (lon/lat layout)


def _cover_rows(batch: pa.Table, side: int, cell: float) -> pa.Table:
    ids = batch["id"].to_numpy(zero_copy_only=False)
    xmin = batch["xmin"].to_numpy(zero_copy_only=False)
    ymin = batch["ymin"].to_numpy(zero_copy_only=False)
    xmax = batch["xmax"].to_numpy(zero_copy_only=False)
    ymax = batch["ymax"].to_numpy(zero_copy_only=False)
    cx0 = np.floor((xmin - _X0) / cell).astype(np.int64)
    cx1 = np.floor((xmax - _X0) / cell).astype(np.int64)
    cy0 = np.floor((ymin - _Y0) / cell).astype(np.int64)
    cy1 = np.floor((ymax - _Y0) / cell).astype(np.int64)
    nx, ny = cx1 - cx0 + 1, cy1 - cy0 + 1
    rep = np.repeat(np.arange(len(ids)), nx * ny)
    # per-box local cell index 0..nx*ny-1, vectorized (no Python loop)
    total = nx * ny
    offs = np.zeros(len(ids) + 1, np.int64)
    np.cumsum(total, out=offs[1:])
    local = np.arange(offs[-1]) - np.repeat(offs[:-1], total)
    cx = cx0[rep] + local % nx[rep]
    cy = cy0[rep] + local // nx[rep]
    return pa.table({
        "cell": pa.array(cy * (1 << 20) + cx, pa.int64()),
        "side": pa.array(np.full(len(rep), side, np.int8), pa.int8()),
        "id": pa.array(ids[rep], pa.int64()),
        "xmin": pa.array(xmin[rep]), "ymin": pa.array(ymin[rep]),
        "xmax": pa.array(xmax[rep]), "ymax": pa.array(ymax[rep]),
    })


def point_radius_join(a_ds, b_ds, radius: float, cell: float = 8.0,
                      out_a: str = "id_a", out_b: str = "id_b",
                      chunk: int = 2048):
    """Distributed point–point radius join: all (a, b) pairs with
    squared planar distance ``(ax-bx)² + (ay-by)² ≤ radius²`` (degree
    space — callers wanting metres pre-project).  Inputs have schema
    (id, x, y).

    PBSM variant with NO dedup pass: only side A fans out (each A
    point covers every grid cell its radius-ball bbox touches); each B
    point lives in exactly ONE cell, so every qualifying pair meets in
    exactly one group.  Per-cell test is a chunked vectorized distance
    matrix.  ``cell`` should be ≥ ``radius`` so A covers ≤ 4 cells
    typically."""

    def a_rows(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        cx0 = np.floor((x - radius - _X0) / cell).astype(np.int64)
        cx1 = np.floor((x + radius - _X0) / cell).astype(np.int64)
        cy0 = np.floor((y - radius - _Y0) / cell).astype(np.int64)
        cy1 = np.floor((y + radius - _Y0) / cell).astype(np.int64)
        nx, ny = cx1 - cx0 + 1, cy1 - cy0 + 1
        total = nx * ny
        rep = np.repeat(np.arange(len(ids)), total)
        offs = np.zeros(len(ids) + 1, np.int64)
        np.cumsum(total, out=offs[1:])
        local = np.arange(offs[-1]) - np.repeat(offs[:-1], total)
        cx = cx0[rep] + local % nx[rep]
        cy = cy0[rep] + local // nx[rep]
        return pa.table({
            "cell": pa.array(cy * (1 << 20) + cx, pa.int64()),
            "side": pa.array(np.zeros(len(rep), np.int8), pa.int8()),
            "id": pa.array(ids[rep], pa.int64()),
            "x": pa.array(x[rep]), "y": pa.array(y[rep]),
        })

    def b_rows(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        cx = np.floor((x - _X0) / cell).astype(np.int64)
        cy = np.floor((y - _Y0) / cell).astype(np.int64)
        return pa.table({
            "cell": pa.array(cy * (1 << 20) + cx, pa.int64()),
            "side": pa.array(np.ones(len(ids), np.int8), pa.int8()),
            "id": pa.array(ids, pa.int64()),
            "x": pa.array(x), "y": pa.array(y),
        })

    r2 = radius * radius

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["side"].to_numpy() == 0]
        b = g[g["side"].to_numpy() == 1]
        if not len(a) or not len(b):
            return pd.DataFrame({out_a: np.empty(0, np.int64),
                                 out_b: np.empty(0, np.int64)})
        bx = b["x"].to_numpy(); by = b["y"].to_numpy()
        bid = b["id"].to_numpy()
        oa, ob = [], []
        for s in range(0, len(a), chunk):
            ax = a["x"].to_numpy()[s:s + chunk, None]
            ay = a["y"].to_numpy()[s:s + chunk, None]
            aid = a["id"].to_numpy()[s:s + chunk]
            dx = ax - bx
            dy = ay - by
            hit = dx * dx + dy * dy <= r2
            ii, jj = np.nonzero(hit)
            oa.append(aid[ii]); ob.append(bid[jj])
        return pd.DataFrame({
            out_a: np.concatenate(oa) if oa else np.empty(0, np.int64),
            out_b: np.concatenate(ob) if ob else np.empty(0, np.int64)})

    rows = (a_ds.map_batches(a_rows, batch_format="pyarrow")
            .union(b_ds.map_batches(b_rows, batch_format="pyarrow")))
    return rows.groupby("cell").map_groups(pairs, batch_format="pandas")


def box_overlap_join(a_ds, b_ds, cell: float = 8.0,
                     out_a: str = "id_a", out_b: str = "id_b",
                     chunk: int = 2048):
    """Inclusive rectangle-overlap join of two box Datasets with schema
    (id, xmin, ymin, xmax, ymax) → Dataset of (out_a, out_b)."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        cid = int(g["cell"].iloc[0])
        a = g[g["side"].to_numpy() == 0]
        b = g[g["side"].to_numpy() == 1]
        if not len(a) or not len(b):
            return pd.DataFrame({out_a: np.empty(0, np.int64),
                                 out_b: np.empty(0, np.int64)})
        bx0 = b["xmin"].to_numpy(); bx1 = b["xmax"].to_numpy()
        by0 = b["ymin"].to_numpy(); by1 = b["ymax"].to_numpy()
        bid = b["id"].to_numpy()
        oa, ob = [], []
        for s in range(0, len(a), chunk):
            ax0 = a["xmin"].to_numpy()[s:s + chunk, None]
            ax1 = a["xmax"].to_numpy()[s:s + chunk, None]
            ay0 = a["ymin"].to_numpy()[s:s + chunk, None]
            ay1 = a["ymax"].to_numpy()[s:s + chunk, None]
            aid = a["id"].to_numpy()[s:s + chunk]
            hit = (ax0 <= bx1) & (bx0 <= ax1) & (ay0 <= by1) & (by0 <= ay1)
            # reference point: report only from the cell holding the
            # overlap's min corner
            rx = np.maximum(ax0, bx0)
            ry = np.maximum(ay0, by0)
            rcx = np.floor((rx - _X0) / cell).astype(np.int64)
            rcy = np.floor((ry - _Y0) / cell).astype(np.int64)
            hit &= (rcy * (1 << 20) + rcx) == cid
            ii, jj = np.nonzero(hit)
            oa.append(aid[ii]); ob.append(bid[jj])
        return pd.DataFrame({
            out_a: np.concatenate(oa) if oa else np.empty(0, np.int64),
            out_b: np.concatenate(ob) if ob else np.empty(0, np.int64)})

    rows = (a_ds.map_batches(lambda t: _cover_rows(t, 0, cell),
                             batch_format="pyarrow")
            .union(b_ds.map_batches(lambda t: _cover_rows(t, 1, cell),
                                    batch_format="pyarrow")))
    return rows.groupby("cell").map_groups(pairs, batch_format="pandas")
