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
typical box size.  Skewed cells (urban hot spots) are guarded by a
fragment-replicate split: a cheap per-(cell, side) counting pass over
the cover rows finds cells where either side exceeds
``hot_threshold`` rows; inside a hot cell, side A splits into
``k_a = ceil(n_a/T)`` id-hash fragments and side B into ``k_b``, each
A fragment replicating across B's axis and vice versa, so every
qualifying pair still meets in EXACTLY one (cell, salt) group and no
group assembles more than ~2T rows.  The reference-point dedup rule is
salt-oblivious (it compares the raw cell id), so results are
bit-identical with the guard on or off.  Overlap is CLOSED-interval
(touching edges join) to match the natural SQL predicate
``a.xmin <= b.xmax AND b.xmin <= a.xmax AND …``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_X0, _Y0 = -180.0, -90.0  # grid origin (lon/lat layout)

# fragment-replicate salting bounds: composite group key is
# cell * _SALT_MAX + salt, so k_a * k_b per cell is capped at _SALT_MAX
# (also keeps cell*_SALT_MAX inside int64 down to ~0.001-degree grids)
_SALT_MAX = 4096
HOT_CELL_ROWS = 250_000  # default per-side per-cell row budget


def _cell_side_counts(rows) -> pd.DataFrame:
    """Per-(cell, side) row counts of the cover-row dataset: per-block
    Arrow partials merged driver-side (bounded by grid cardinality ×
    2, never by data size)."""

    def partial(b: pa.Table) -> pa.Table:
        t = (b.select(["cell", "side"]).group_by(["cell", "side"])
             .aggregate([([], "count_all")]))
        return t.rename_columns(["cell", "side", "n"])

    parts = rows.map_batches(partial, batch_format="pyarrow").to_pandas()
    return parts.groupby(["cell", "side"], as_index=False)["n"].sum()


def _hot_plan(counts: pd.DataFrame, threshold: int):
    """(sorted hot cell ids, k_a, k_b) for cells where either side
    exceeds ``threshold`` rows; None when nothing is hot."""
    piv = (counts.pivot_table(index="cell", columns="side", values="n",
                              aggfunc="sum", fill_value=0))
    n_a = piv[0].to_numpy(np.int64) if 0 in piv.columns else \
        np.zeros(len(piv), np.int64)
    n_b = piv[1].to_numpy(np.int64) if 1 in piv.columns else \
        np.zeros(len(piv), np.int64)
    ka = np.maximum(1, -(-n_a // threshold))
    kb = np.maximum(1, -(-n_b // threshold))
    hot = (ka > 1) | (kb > 1)
    if not hot.any():
        return None
    cells = piv.index.to_numpy(np.int64)[hot]
    ka, kb = ka[hot], kb[hot]
    # cap the per-cell salt grid; shrink the larger factor first
    over = ka * kb > _SALT_MAX
    ka[over] = np.minimum(ka[over], np.maximum(1, _SALT_MAX // kb[over]))
    kb[over] = np.minimum(kb[over], np.maximum(1, _SALT_MAX // ka[over]))
    order = np.argsort(cells)
    return cells[order], ka[order], kb[order]


def _salt_map(hot_cells: np.ndarray, hot_ka: np.ndarray,
              hot_kb: np.ndarray):
    """Vectorized cover-row salting: fixed fragment index on a row's
    own axis (id hash), replication across the other side's axis.
    Non-hot rows pass through once with salt 0."""

    def f(tbl: pa.Table) -> pa.Table:
        cell = tbl["cell"].to_numpy(zero_copy_only=False)
        side = tbl["side"].to_numpy(zero_copy_only=False)
        n = len(cell)
        idx = np.searchsorted(hot_cells, cell)
        idxc = np.minimum(idx, len(hot_cells) - 1)
        is_hot = hot_cells[idxc] == cell
        ka = np.ones(n, np.int64)
        kb = np.ones(n, np.int64)
        ka[is_hot] = hot_ka[idxc[is_hot]]
        kb[is_hot] = hot_kb[idxc[is_hot]]
        h = (tbl["id"].to_numpy(zero_copy_only=False)
             .astype(np.int64).view(np.uint64)
             * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        a_side = side == 0
        own = np.where(a_side, h % ka.view(np.uint64),
                       h % kb.view(np.uint64)).astype(np.int64)
        rep = np.where(a_side, kb, ka)  # replicate across the OTHER axis
        r = np.repeat(np.arange(n), rep)
        offs = np.zeros(n + 1, np.int64)
        np.cumsum(rep, out=offs[1:])
        other = np.arange(offs[-1]) - np.repeat(offs[:-1], rep)
        salt = np.where(a_side[r], own[r] * kb[r] + other,
                        other * kb[r] + own[r])
        out = tbl.take(pa.array(r, pa.int64()))
        return out.append_column(
            "_g", pa.array(cell[r] * _SALT_MAX + salt, pa.int64()))

    return f


def _grouped_pairs(rows, pairs, hot_threshold: int | None):
    """Group cover rows by cell — salted by the hot-cell plan when the
    counting pass finds a cell over ``hot_threshold`` rows on either
    side (one extra cheap pass over the cover maps)."""
    plan = None
    if hot_threshold:
        plan = _hot_plan(_cell_side_counts(rows), hot_threshold)
    if plan is None:
        return rows.groupby("cell").map_groups(pairs, batch_format="pandas")
    return (rows.map_batches(_salt_map(*plan), batch_format="pyarrow")
            .groupby("_g").map_groups(pairs, batch_format="pandas"))


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
                      chunk: int = 2048,
                      hot_threshold: int | None = HOT_CELL_ROWS):
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
    return _grouped_pairs(rows, pairs, hot_threshold)


def box_overlap_join(a_ds, b_ds, cell: float = 8.0,
                     out_a: str = "id_a", out_b: str = "id_b",
                     chunk: int = 2048,
                     hot_threshold: int | None = HOT_CELL_ROWS):
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
    return _grouped_pairs(rows, pairs, hot_threshold)
