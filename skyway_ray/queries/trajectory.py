"""trajectory query family (split from the former single-file queries module)."""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo.cells import cell_id, cell_sql
from ..geo.tiles import tile_sql, tile_xy
from ._common import (
    _DP_EPS_MICRO,
    _DWELL_EPS_MICRO,
    _DWELL_MIN_PTS,
    _RIPLEY_EPS,
    _intra_run_pairs,
    _nrows,
    _read,
    _seg_params,
    derive_latlon,
    latlon_sql,
)




def q_travel_dist(sf_dir: str):
    """Distance traveled per user over their event-point trajectory
    (ordered by ts, event_id): per-step planar distances are computed
    row-locally, micro-int-floored BEFORE summation, then integer-
    summed — order-independent, so the distributed result matches the
    SQL LAG window oracle bit-for-bit (float sums would not)."""
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "x": pa.array(lon), "y": pa.array(lat)})

    def dist(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        x = d["x"].to_numpy()
        y = d["y"].to_numpy()
        dx = np.empty(len(d)); dy = np.empty(len(d))
        dx[0] = dy[0] = 0.0
        dx[1:] = x[1:] - x[:-1]
        dy[1:] = y[1:] - y[:-1]
        first = np.r_[True, u[1:] != u[:-1]]
        dx[first] = dy[first] = 0.0
        step = np.floor(np.sqrt(dx * dx + dy * dy) * 1e6 + 0.5
                        ).astype(np.int64)
        out = pd.DataFrame({"user_id": u, "step": step})
        return (out.groupby("user_id", sort=False, as_index=False)
                .agg(total_micro=("step", "sum"),
                     n_steps=("step", "size")))

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t", "event_id"],
                      fn=dist, n_rows=_nrows(sf_dir, "events"))


def q_travel_dist_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        f"WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        f"{lon} AS x, {lat} AS y FROM events), "
        "s AS (SELECT user_id, x - lag(x) OVER w AS dx, "
        "y - lag(y) OVER w AS dy FROM p "
        "WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)) "
        "SELECT user_id, CAST(sum(CASE WHEN dx IS NULL THEN 0 ELSE "
        "CAST(floor(sqrt(dx * dx + dy * dy) * 1000000 + 0.5) AS BIGINT) "
        "END) AS BIGINT) AS total_micro, "
        "CAST(count(*) AS BIGINT) AS n_steps FROM s GROUP BY user_id"
    )


def q_heading_octants(sf_dir: str):
    """Movement-heading histogram over per-user trajectories: each
    consecutive step (ordered by ts, event_id) is classified into one
    of 8 compass octants by EXACT integer-free comparisons on
    (dx, dy) — sign tests and |dx| vs |dy|, no atan2, so the
    distributed result is bit-identical to the SQL CASE cascade
    (np.select and CASE share first-match semantics and condition
    order).  Per-user steps come from the coarse-bucket keyed_scan;
    the bounded 8-key histogram merges on the combiner tree — no
    all-to-all anywhere."""
    from ..stages.agg_tree import tree_aggregate_to_table
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "x": pa.array(lon), "y": pa.array(lat)})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        x = d["x"].to_numpy()
        y = d["y"].to_numpy()
        dx = np.zeros(len(d))
        dy = np.zeros(len(d))
        dx[1:] = x[1:] - x[:-1]
        dy[1:] = y[1:] - y[:-1]
        first = np.r_[True, u[1:] != u[:-1]]
        octant = np.select(
            [(dx > 0) & (dy >= 0) & (dx >= dy),
             (dy > 0) & (dx >= 0) & (dy > dx),
             (dy > 0) & (dx < 0) & (dy >= -dx),
             (dx < 0) & (dy > 0) & (-dx > dy),
             (dx < 0) & (dy <= 0) & (-dx >= -dy),
             (dy < 0) & (dx <= 0) & (-dy > -dx),
             (dy < 0) & (dx > 0) & (-dy >= dx),
             (dx > 0) & (dy < 0) & (dx > -dy)],
            [0, 1, 2, 3, 4, 5, 6, 7], -1)
        octant[first] = -1
        keep = octant >= 0
        uo, c = np.unique(octant[keep], return_counts=True)
        return pd.DataFrame({"octant": uo.astype(np.int64),
                             "n": c.astype(np.int64)})

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    parts = keyed_scan(ds, key="user_id", order=["t", "event_id"],
                       fn=fn, n_rows=_nrows(sf_dir, "events"))
    return tree_aggregate_to_table(parts, ["octant"], [("n", "sum")])


def q_heading_octants_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        f"WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        f"{lon} AS x, {lat} AS y FROM events), "
        "s AS (SELECT x - lag(x) OVER w AS dx, y - lag(y) OVER w AS dy "
        "FROM p WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), "
        "o AS (SELECT CASE "
        "WHEN dx > 0 AND dy >= 0 AND dx >= dy THEN 0 "
        "WHEN dy > 0 AND dx >= 0 AND dy > dx THEN 1 "
        "WHEN dy > 0 AND dx < 0 AND dy >= -dx THEN 2 "
        "WHEN dx < 0 AND dy > 0 AND -dx > dy THEN 3 "
        "WHEN dx < 0 AND dy <= 0 AND -dx >= -dy THEN 4 "
        "WHEN dy < 0 AND dx <= 0 AND -dy > -dx THEN 5 "
        "WHEN dy < 0 AND dx > 0 AND -dy >= dx THEN 6 "
        "WHEN dx > 0 AND dy < 0 AND dx > -dy THEN 7 END AS octant "
        "FROM s WHERE dx IS NOT NULL) "
        "SELECT CAST(octant AS BIGINT) AS octant, "
        "CAST(count(*) AS BIGINT) AS n "
        "FROM o WHERE octant IS NOT NULL GROUP BY octant"
    )


def q_stay_points(sf_dir: str):
    """Stay-point (dwell) detection per user trajectory: maximal runs
    of consecutive points whose incoming planar step is below
    `_DWELL_EPS_MICRO` (micro-int compare — floats never accumulate);
    a run with ≥ `_DWELL_MIN_PTS` points is a dwell.  Per user:
    dwell count and longest dwell duration (exact int μs).  The
    gaps-and-islands machinery is one vectorized cumsum over run
    boundaries inside each keyed_scan bucket — runs never straddle
    buckets because keys don't."""
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "x": pa.array(lon), "y": pa.array(lat)})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        t = d["t"].to_numpy()
        x = d["x"].to_numpy()
        y = d["y"].to_numpy()
        dx = np.zeros(len(d))
        dy = np.zeros(len(d))
        dx[1:] = x[1:] - x[:-1]
        dy[1:] = y[1:] - y[:-1]
        first = np.r_[True, u[1:] != u[:-1]]
        step6 = np.floor(np.sqrt(dx * dx + dy * dy) * 1e6 + 0.5
                         ).astype(np.int64)
        small = (~first) & (step6 < _DWELL_EPS_MICRO)
        run_id = np.cumsum(~small)
        runs = (pd.DataFrame({"user_id": u, "run": run_id, "t": t})
                .groupby("run", sort=False)
                .agg(user_id=("user_id", "first"), cnt=("t", "size"),
                     t0=("t", "min"), t1=("t", "max")))
        qual = runs["cnt"].to_numpy() >= _DWELL_MIN_PTS
        dur = np.where(qual, runs["t1"].to_numpy() - runs["t0"].to_numpy(),
                       np.int64(-1))
        per = (pd.DataFrame({"user_id": runs["user_id"].to_numpy(),
                             "q": qual.astype(np.int64), "dur": dur})
               .groupby("user_id", sort=False, as_index=False)
               .agg(n_dwells=("q", "sum"), max_dwell_us=("dur", "max")))
        per["max_dwell_us"] = np.maximum(
            per["max_dwell_us"].to_numpy(), 0).astype(np.int64)
        per["n_dwells"] = per["n_dwells"].astype(np.int64)
        return per

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t", "event_id"],
                      fn=fn, n_rows=_nrows(sf_dir, "events"))


def q_stay_points_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        f"WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        f"{lon} AS x, {lat} AS y FROM events), "
        "d AS (SELECT user_id, t, event_id, "
        "x - lag(x) OVER w AS dx, y - lag(y) OVER w AS dy "
        "FROM p WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), "
        "s AS (SELECT user_id, t, event_id, "
        "CASE WHEN dx IS NOT NULL AND "
        "CAST(floor(sqrt(dx * dx + dy * dy) * 1000000 + 0.5) AS BIGINT) "
        f"< {_DWELL_EPS_MICRO} THEN 0 ELSE 1 END AS new_run FROM d), "
        "r AS (SELECT user_id, t, sum(new_run) OVER "
        "(PARTITION BY user_id ORDER BY t, event_id) AS run_id FROM s), "
        "g AS (SELECT user_id, run_id, count(*) AS cnt, "
        "max(t) - min(t) AS dur FROM r GROUP BY user_id, run_id) "
        "SELECT user_id, "
        f"CAST(count(*) FILTER (WHERE cnt >= {_DWELL_MIN_PTS}) AS BIGINT) "
        "AS n_dwells, "
        f"CAST(COALESCE(max(dur) FILTER (WHERE cnt >= {_DWELL_MIN_PTS}), "
        "0) AS BIGINT) AS max_dwell_us FROM g GROUP BY user_id"
    )


def q_shoelace_area(sf_dir: str):
    """Signed polygon area (shoelace, ×2, micro-int) of each user's
    closed trajectory ring (points ordered by ts, event_id; last point
    wraps to the first).  Each cross term ``x·y' − x'·y`` is quantized
    to micro-ints BEFORE summation, so the distributed integer sum is
    order-free and bit-identical to the SQL lead/first_value oracle.
    Single-point users contribute a zero ring."""
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "x": pa.array(lon), "y": pa.array(lat)})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        x = d["x"].to_numpy()
        y = d["y"].to_numpy()
        idx = np.arange(len(d), dtype=np.int64)
        first = np.r_[True, u[1:] != u[:-1]]
        last = np.r_[first[1:], True]
        seg_start = idx[first][np.cumsum(first) - 1]
        nxt = idx + 1
        nxt[last] = seg_start[last]
        cross6 = np.floor((x * y[nxt] - x[nxt] * y) * 1e6 + 0.5
                          ).astype(np.int64)
        out = pd.DataFrame({"user_id": u, "c": cross6})
        return (out.groupby("user_id", sort=False, as_index=False)
                .agg(area2_micro=("c", "sum"), n_pts=("c", "size")))

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t", "event_id"],
                      fn=fn, n_rows=_nrows(sf_dir, "events"))


def q_shoelace_area_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        f"WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        f"{lon} AS x, {lat} AS y FROM events), "
        "s AS (SELECT user_id, x, y, "
        "COALESCE(lead(x) OVER w, first_value(x) OVER w) AS nx, "
        "COALESCE(lead(y) OVER w, first_value(y) OVER w) AS ny "
        "FROM p WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)) "
        "SELECT user_id, CAST(sum(CAST(floor((x * ny - nx * y) * 1000000 "
        "+ 0.5) AS BIGINT)) AS BIGINT) AS area2_micro, "
        "CAST(count(*) AS BIGINT) AS n_pts FROM s GROUP BY user_id"
    )


def q_od_matrix(sf_dir: str):
    """Origin–destination trip matrix (mobility-analytics staple):
    each user's events split into calendar-day trips via the coarse
    keyed_scan (ordered by ts, event_id; a user's rows never straddle
    buckets so day runs are bucket-local), the day's first and last
    positions map to a 15° grid cell, and the bounded (origin, dest)
    cell-pair space merges on the combiner tree — per-bucket partials
    only, no all-to-all exchange anywhere."""
    from ..stages.agg_tree import tree_aggregate_to_table
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        cx = np.floor((lon + 180.0) / 15.0).astype(np.int64)
        cy = np.floor((lat + 60.0) / 15.0).astype(np.int64)
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "cx": pa.array(cx), "cy": pa.array(cy)})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        day = d["t"].to_numpy() // 86_400_000_000
        first = np.r_[True, (u[1:] != u[:-1]) | (day[1:] != day[:-1])]
        last = np.r_[first[1:], True]
        cx = d["cx"].to_numpy()
        cy = d["cy"].to_numpy()
        g = (pd.DataFrame({"o_cx": cx[first], "o_cy": cy[first],
                           "d_cx": cx[last], "d_cy": cy[last]})
             .groupby(["o_cx", "o_cy", "d_cx", "d_cy"], sort=False)
             .size().reset_index(name="n_trips"))
        g["n_trips"] = g["n_trips"].astype(np.int64)
        return g

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"]
               ).map_batches(prep, batch_format="pyarrow")
    parts = keyed_scan(ds, "user_id", ["t", "event_id"], fn)
    return tree_aggregate_to_table(
        parts, ["o_cx", "o_cy", "d_cx", "d_cy"], [("n_trips", "sum")])


def q_od_matrix_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        f"WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        f"CAST(floor(({lon} + 180.0) / 15.0) AS BIGINT) AS cx, "
        f"CAST(floor(({lat} + 60.0) / 15.0) AS BIGINT) AS cy "
        "FROM events), "
        "s AS (SELECT user_id, t // 86400000000 AS day, cx, cy, "
        "row_number() OVER (PARTITION BY user_id, t // 86400000000 "
        "ORDER BY t, event_id) AS rn, "
        "count(*) OVER (PARTITION BY user_id, t // 86400000000) AS cnt "
        "FROM p) "
        "SELECT o.cx AS o_cx, o.cy AS o_cy, d.cx AS d_cx, d.cy AS d_cy, "
        "CAST(count(*) AS BIGINT) AS n_trips "
        "FROM s o JOIN s d ON o.user_id = d.user_id AND o.day = d.day "
        "WHERE o.rn = 1 AND d.rn = d.cnt GROUP BY 1, 2, 3, 4"
    )


def q_douglas_peucker(sf_dir: str):
    """Douglas–Peucker trajectory simplification per user (the
    track-thinning step of a GPS-trace pipeline): each user's
    (t, event_id)-ordered polyline is simplified to ε = 10° with
    exact integer geometry — see functions/simplify.py for the
    breadth-first vectorized engine (no per-user recursion; every
    active segment in a bucket advances in one numpy pass per round).
    Hash-verified against a DuckDB RECURSIVE-CTE replay of the split
    recursion (q_douglas_peucker_sql — segments carry endpoint
    coords; the argmax-with-first-index tie-break rides a HUGEINT
    ``metric·2³² + (2³²−1−i)`` key; the exact ``cross² > ε²·len²``
    test runs in HUGEINT like the engine's Python big-ints);
    tests/test_geo.py additionally pins the engine to a recursive
    textbook oracle point-for-point on planted tracks.
    Output: per-user point/kept counts + a kept-set checksum."""
    from ..functions.simplify import dp_keep_mask
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        return pa.table({
            "user_id": b["user_id"], "t": b["ts"].cast(pa.int64()),
            "event_id": b["event_id"],
            "x": pa.array(np.floor(lon * 1e6 + 0.5).astype(np.int64)),
            "y": pa.array(np.floor(lat * 1e6 + 0.5).astype(np.int64))})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        first = np.r_[True, u[1:] != u[:-1]]
        keep = dp_keep_mask(d["x"].to_numpy(), d["y"].to_numpy(),
                            first, _DP_EPS_MICRO)
        ev = d["event_id"].to_numpy().astype(np.int64)
        gid = np.cumsum(first) - 1
        n_pts = np.bincount(gid).astype(np.int64)
        n_kept = np.bincount(gid, weights=keep).astype(np.int64)
        csum = np.bincount(gid, weights=np.where(keep, ev, 0)
                           ).astype(np.int64)
        return pd.DataFrame({"user_id": u[first], "n_points": n_pts,
                             "n_kept": n_kept, "kept_checksum": csum})

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"]
               ).map_batches(prep, batch_format="pyarrow")
    return keyed_scan(ds, "user_id", ["t", "event_id"], fn)


def q_douglas_peucker_sql() -> str:
    """RECURSIVE-CTE replay of the DP split recursion.  The worklist
    CTE holds live segments WITH their endpoint microdegree coords (no
    per-iteration endpoint re-join); each step aggregates the interior
    points' metric (|cross| to the chord, or squared endpoint distance
    for degenerate zero-length chords), picks the engine's
    first-index-tie-break argmax via one HUGEINT
    ``metric·2³² + (2³²−1 − i)`` key (valid while per-user point
    counts stay below 2³² — any realistic trajectory), applies the
    exact HUGEINT ``cross² > ε²·len²`` split test, and emits the two
    child segments.  The kept set is exactly the endpoint set of every
    segment ever alive plus each user's first/last point."""
    lat, lon = latlon_sql("event_id")
    eps2 = _DP_EPS_MICRO * _DP_EPS_MICRO
    c = 4294967296
    metric = ("CASE WHEN (par.xe - par.xs) * (par.xe - par.xs) "
              "+ (par.ye - par.ys) * (par.ye - par.ys) = 0 "
              "THEN (q.x - par.xs) * (q.x - par.xs) "
              "+ (q.y - par.ys) * (q.y - par.ys) "
              "ELSE abs((par.xe - par.xs) * (q.y - par.ys) "
              "- (par.ye - par.ys) * (q.x - par.xs)) END")
    return (
        "WITH RECURSIVE "
        "pts AS (SELECT user_id, event_id, "
        f"CAST(floor({lon} * 1e6 + 0.5) AS BIGINT) AS x, "
        f"CAST(floor({lat} * 1e6 + 0.5) AS BIGINT) AS y, "
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        " - 1 AS i FROM events), "
        "ends AS (SELECT user_id, max(i) AS last FROM pts GROUP BY 1), "
        "segs AS ("
        "SELECT e.user_id, CAST(0 AS BIGINT) AS s, e.last AS e, "
        "p0.x AS xs, p0.y AS ys, p1.x AS xe, p1.y AS ye "
        "FROM ends e "
        "JOIN pts p0 ON p0.user_id = e.user_id AND p0.i = 0 "
        "JOIN pts p1 ON p1.user_id = e.user_id AND p1.i = e.last "
        "WHERE e.last >= 2 "
        "UNION ALL "
        "SELECT g.user_id, "
        "CASE WHEN sides.side = 0 THEN g.s ELSE g.m END AS s, "
        "CASE WHEN sides.side = 0 THEN g.m ELSE g.e END AS e, "
        "CASE WHEN sides.side = 0 THEN g.xs ELSE g.xm END AS xs, "
        "CASE WHEN sides.side = 0 THEN g.ys ELSE g.ym END AS ys, "
        "CASE WHEN sides.side = 0 THEN g.xm ELSE g.xe END AS xe, "
        "CASE WHEN sides.side = 0 THEN g.ym ELSE g.ye END AS ye "
        "FROM ("
        "SELECT a.user_id, a.s, a.e, a.xs, a.ys, a.xe, a.ye, "
        f"{c - 1} - CAST(a.key % {c} AS BIGINT) AS m, "
        "pm.x AS xm, pm.y AS ym "
        "FROM ("
        "SELECT par.user_id, par.s, par.e, par.xs, par.ys, par.xe, "
        "par.ye, (par.xe - par.xs) * (par.xe - par.xs) "
        "+ (par.ye - par.ys) * (par.ye - par.ys) AS lensq, "
        f"max(CAST({metric} AS HUGEINT) * {c} + ({c - 1} - q.i)) AS key, "
        f"max(CAST({metric} AS HUGEINT)) AS segmax "
        "FROM segs par "
        "JOIN pts q ON q.user_id = par.user_id "
        "AND q.i > par.s AND q.i < par.e "
        "WHERE par.e - par.s > 1 "
        "GROUP BY 1, 2, 3, 4, 5, 6, 7) a "
        "JOIN pts pm ON pm.user_id = a.user_id "
        f"AND pm.i = {c - 1} - CAST(a.key % {c} AS BIGINT) "
        f"WHERE CASE WHEN a.lensq = 0 THEN a.segmax > {eps2} "
        f"ELSE a.segmax * a.segmax > CAST({eps2} AS HUGEINT) * a.lensq "
        "END) g "
        "CROSS JOIN (VALUES (0), (1)) AS sides(side)), "
        "kept AS (SELECT DISTINCT user_id, i FROM ("
        "SELECT user_id, s AS i FROM segs "
        "UNION ALL SELECT user_id, e FROM segs "
        "UNION ALL SELECT user_id, 0 FROM ends "
        "UNION ALL SELECT user_id, last FROM ends)), "
        "kc AS (SELECT k.user_id, CAST(count(*) AS BIGINT) AS n_kept, "
        "CAST(sum(p.event_id) AS BIGINT) AS kept_checksum "
        "FROM kept k JOIN pts p ON p.user_id = k.user_id "
        "AND p.i = k.i GROUP BY 1) "
        "SELECT p.user_id, CAST(count(*) AS BIGINT) AS n_points, "
        "kc.n_kept, kc.kept_checksum "
        "FROM pts p JOIN kc ON kc.user_id = p.user_id "
        "GROUP BY 1, 3, 4"
    )


def q_max_span(sf_dir: str):
    """Per-user trajectory diameter: the maximum squared planar
    distance (degree²) between any two of the user's event points.
    Users co-partition through keyed_scan (one coarse hash exchange);
    the per-bucket pass explodes intra-user index pairs with the
    vectorized chunked generator — no per-key Python loop, and the
    pair budget bounds peak memory.  Quadratic per user by nature
    (documented assumption: per-user event counts are bounded); the
    max of identical per-pair doubles is order-independent, so the
    result hash-matches the SQL self-join exactly."""
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        return pa.table({"user_id": b["user_id"],
                         "event_id": b["event_id"],
                         "x": pa.array(lon), "y": pa.array(lat)})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        x = d["x"].to_numpy()
        y = d["y"].to_numpy()
        best: dict[int, float] = {}
        for ig, jg in _intra_run_pairs(u):
            dx = x[ig] - x[jg]
            dy = y[ig] - y[jg]
            d2 = dx * dx + dy * dy
            t = pd.DataFrame({"u": u[jg], "d2": d2}).groupby(
                "u", sort=False)["d2"].max()
            for k, v in t.items():  # ≤ distinct-users-per-chunk items
                if v > best.get(k, -1.0):
                    best[k] = v
        return pd.DataFrame({"user_id": np.fromiter(best, np.int64),
                             "max_d2": np.fromiter(best.values(),
                                                   np.float64)})

    ds = _read(sf_dir, "events", ["event_id", "user_id"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, "user_id", ["event_id"], fn,
                      n_rows=_nrows(sf_dir, "events"))


def q_max_span_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        f"WITH p AS (SELECT user_id, event_id, {lon} AS x, {lat} AS y "
        "FROM events) "
        "SELECT a.user_id AS user_id, "
        "max((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) "
        "AS max_d2 FROM p a JOIN p b "
        "ON a.user_id = b.user_id AND a.event_id < b.event_id "
        "GROUP BY 1"
    )


def q_self_crossings(sf_dir: str):
    """Per-user trajectory self-intersection counts: consecutive
    events (ordered by ts, event_id) form segments in exact microdegree
    ints; every NON-ADJACENT segment pair of the same user is tested
    for proper crossing with integer cross-product orientation signs
    (no epsilon, no floats — coordinates ≤ 3.6e8 keep every product
    under 2^63).  Same keyed_scan co-partition + chunked pair explode
    as max_span; emits users with ≥ 1 crossing."""
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        return pa.table({
            "user_id": b["user_id"], "t": b["ts"].cast(pa.int64()),
            "event_id": b["event_id"],
            "xm": pa.array(np.floor(lon * 1e6 + 0.5).astype(np.int64)),
            "ym": pa.array(np.floor(lat * 1e6 + 0.5).astype(np.int64))})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        x = d["xm"].to_numpy()
        y = d["ym"].to_numpy()
        seg = np.r_[False, u[1:] == u[:-1]]  # row k closes segment
        # (k-1, k); runs of segment rows inherit the user run id
        sx1, sy1 = np.roll(x, 1)[seg], np.roll(y, 1)[seg]
        sx2, sy2, su = x[seg], y[seg], u[seg]
        out: dict[int, int] = {}
        for ig, jg in _intra_run_pairs(su):
            keep = jg - ig >= 2  # non-adjacent (shared-endpoint pairs
            # are always improper anyway, but skip the work)
            ig, jg = ig[keep], jg[keep]
            ax1, ay1, ax2, ay2 = sx1[ig], sy1[ig], sx2[ig], sy2[ig]
            bx1, by1, bx2, by2 = sx1[jg], sy1[jg], sx2[jg], sy2[jg]
            d1 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
            d2 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
            d3 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)
            d4 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)
            cross = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) \
                & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
            if cross.any():
                t = pd.DataFrame({"u": su[jg][cross]}).groupby(
                    "u", sort=False).size()
                for k, v in t.items():
                    out[k] = out.get(k, 0) + int(v)
        return pd.DataFrame({"user_id": np.fromiter(out, np.int64),
                             "n_cross": np.fromiter(out.values(),
                                                    np.int64)})

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"]
               ).map_batches(prep, batch_format="pyarrow")
    return keyed_scan(ds, "user_id", ["t", "event_id"], fn,
                      n_rows=_nrows(sf_dir, "events"))


def q_self_crossings_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        "WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        f"CAST(floor({lon} * 1e6 + 0.5) AS BIGINT) AS xm, "
        f"CAST(floor({lat} * 1e6 + 0.5) AS BIGINT) AS ym FROM events), "
        "s AS (SELECT user_id, "
        "row_number() OVER w AS seq, "
        "lag(xm) OVER w AS x1, lag(ym) OVER w AS y1, "
        "xm AS x2, ym AS y2 FROM p "
        "WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), "
        "seg AS (SELECT * FROM s WHERE x1 IS NOT NULL), "
        "x AS (SELECT a.user_id, "
        "(a.x2 - a.x1) * (b.y1 - a.y1) - (a.y2 - a.y1) * (b.x1 - a.x1) "
        "AS d1, "
        "(a.x2 - a.x1) * (b.y2 - a.y1) - (a.y2 - a.y1) * (b.x2 - a.x1) "
        "AS d2, "
        "(b.x2 - b.x1) * (a.y1 - b.y1) - (b.y2 - b.y1) * (a.x1 - b.x1) "
        "AS d3, "
        "(b.x2 - b.x1) * (a.y2 - b.y1) - (b.y2 - b.y1) * (a.x2 - b.x1) "
        "AS d4 "
        "FROM seg a JOIN seg b ON a.user_id = b.user_id "
        "AND b.seq >= a.seq + 2) "
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_cross FROM x "
        "WHERE ((d1 > 0 AND d2 < 0) OR (d1 < 0 AND d2 > 0)) "
        "AND ((d3 > 0 AND d4 < 0) OR (d3 < 0 AND d4 > 0)) "
        "GROUP BY 1"
    )


def q_haversine_legs(sf_dir: str):
    """Per-user total great-circle travel distance: consecutive hops
    (ordered by ts, event_id) through the haversine formula, each hop
    pinned to millimetre ints via floor(d·1e3 + 0.5) BEFORE the sum so
    the distributed total is exact-integer (the house transcendental
    protocol — float sums never cross an aggregate).  keyed_scan
    co-partitions users; hops and sums are one vectorized pass per
    bucket."""
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "lat": pa.array(lat), "lon": pa.array(lon)})

    C = np.pi / 180.0
    R2 = 2.0 * 6371000.0

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        phi = d["lat"].to_numpy() * C
        lam = d["lon"].to_numpy() * C
        hop = np.r_[False, u[1:] == u[:-1]]
        p1, p2 = np.roll(phi, 1)[hop], phi[hop]
        l1, l2 = np.roll(lam, 1)[hop], lam[hop]
        sp = np.sin((p2 - p1) / 2.0)
        sl = np.sin((l2 - l1) / 2.0)
        h = sp * sp + np.cos(p1) * np.cos(p2) * (sl * sl)
        dist = R2 * np.arcsin(np.minimum(1.0, np.sqrt(h)))
        mm = np.floor(dist * 1e3 + 0.5).astype(np.int64)
        g = pd.DataFrame({"user_id": u[hop], "total_mm": mm}).groupby(
            "user_id", sort=False, as_index=False)["total_mm"].sum()
        g["total_mm"] = g["total_mm"].astype(np.int64)
        return g

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"]
               ).map_batches(prep, batch_format="pyarrow")
    return keyed_scan(ds, "user_id", ["t", "event_id"], fn,
                      n_rows=_nrows(sf_dir, "events"))


def q_haversine_legs_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        "WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        f"{lat} * (pi() / 180.0) AS phi, "
        f"{lon} * (pi() / 180.0) AS lam FROM events), "
        "s AS (SELECT user_id, phi, lam, "
        "lag(phi) OVER w AS p1, lag(lam) OVER w AS l1 FROM p "
        "WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), "
        "h AS (SELECT user_id, "
        "sin((phi - p1) / 2.0) * sin((phi - p1) / 2.0) "
        "+ cos(p1) * cos(phi) * "
        "(sin((lam - l1) / 2.0) * sin((lam - l1) / 2.0)) AS hv "
        "FROM s WHERE p1 IS NOT NULL) "
        "SELECT user_id, CAST(sum(CAST(floor("
        "2.0 * 6371000.0 * asin(least(1.0, sqrt(hv))) * 1e3 + 0.5) "
        "AS BIGINT)) AS BIGINT) AS total_mm FROM h GROUP BY 1"
    )


def q_pair_dist_hist(sf_dir: str):
    """Ripley-K-style pair-distance histogram: every unordered event
    pair within ε = 1° (PBSM radius self-join — only grid neighbors
    ever meet, no all-pairs) binned by floor(d²·10/ε²); the ≤ 11-key
    bin space merges on the combiner tree.  Pair distances recompute
    from the ids inside the binning map (derive_latlon is pure), so
    the join output stays ids-only."""
    import pyarrow.compute as pc

    from ..stages.agg_tree import tree_aggregate_to_table
    from ..stages.spatial_join import point_radius_join

    def pts(b: pa.Table) -> pa.Table:
        k = b["event_id"].to_numpy(zero_copy_only=False)
        lat, lon = derive_latlon(k)
        return pa.table({"id": pa.array(k), "x": pa.array(lon),
                         "y": pa.array(lat)})

    a = _read(sf_dir, "events", ["event_id"]).map_batches(
        pts, batch_format="pyarrow")
    b = _read(sf_dir, "events", ["event_id"]).map_batches(
        pts, batch_format="pyarrow")
    pairs = point_radius_join(a, b, radius=_RIPLEY_EPS, cell=8.0,
                              out_a="u", out_b="v")

    def bins(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["u"], t["v"]))
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        ya, xa = derive_latlon(u)
        yb, xb = derive_latlon(v)
        d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
        bin_ = np.floor(d2 * 10.0 / (_RIPLEY_EPS * _RIPLEY_EPS)
                        ).astype(np.int64)
        c = pa.table({"bin": pa.array(bin_),
                      "n_pairs": pa.array(np.ones(len(bin_), np.int64))})
        return (c.group_by(["bin"]).aggregate([("n_pairs", "sum")])
                 .rename_columns(["bin", "n_pairs"]))

    return tree_aggregate_to_table(
        pairs.map_batches(bins, batch_format="pyarrow"),
        ["bin"], [("n_pairs", "sum")])


def q_pair_dist_hist_sql() -> str:
    lat, lon = latlon_sql("event_id")
    e2 = _RIPLEY_EPS * _RIPLEY_EPS
    return (
        f"WITH p AS (SELECT event_id AS id, {lon} AS x, {lat} AS y "
        "FROM events), "
        "d AS (SELECT (a.x - b.x) * (a.x - b.x) + "
        "(a.y - b.y) * (a.y - b.y) AS d2 FROM p a JOIN p b "
        "ON a.id < b.id AND (a.x - b.x) * (a.x - b.x) + "
        f"(a.y - b.y) * (a.y - b.y) <= {e2}) "
        f"SELECT CAST(floor(d2 * 10.0 / {e2}) AS BIGINT) AS bin, "
        "CAST(count(*) AS BIGINT) AS n_pairs FROM d GROUP BY 1"
    )


def q_bbox_extent(sf_dir: str):
    """Per-user bounding box (ST_Extent shape) in exact microdegree
    ints plus the box area: per-batch Arrow group_by pre-reduces each
    block to one row per (block, user) — the combiner — then ONE
    coarse hash exchange on user_id finishes the global min/max.  The
    event stream never shuffles."""
    from ..stages.scan import hash_bucket_scan

    def partial(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        t = pa.table({
            "user_id": b["user_id"],
            "xm": pa.array(np.floor(lon * 1e6 + 0.5).astype(np.int64)),
            "ym": pa.array(np.floor(lat * 1e6 + 0.5).astype(np.int64))})
        return (t.group_by(["user_id"]).aggregate(
            [("xm", "min"), ("xm", "max"), ("ym", "min"), ("ym", "max")])
            .rename_columns(["user_id", "x_min", "x_max",
                             "y_min", "y_max"]))

    ds = _read(sf_dir, "events", ["event_id", "user_id"]).map_batches(
        partial, batch_format="pyarrow")

    def final(t: pa.Table) -> pa.Table:
        g = (t.group_by(["user_id"]).aggregate(
            [("x_min", "min"), ("x_max", "max"),
             ("y_min", "min"), ("y_max", "max")])
            .rename_columns(["user_id", "x_min", "x_max",
                             "y_min", "y_max"]))
        area = ((g["x_max"].to_numpy() - g["x_min"].to_numpy())
                * (g["y_max"].to_numpy() - g["y_min"].to_numpy()))
        return g.append_column("area_u2", pa.array(area, pa.int64()))

    return hash_bucket_scan(ds, ["user_id"], final)


def q_bbox_extent_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        "WITH p AS (SELECT user_id, "
        f"CAST(floor({lon} * 1e6 + 0.5) AS BIGINT) AS xm, "
        f"CAST(floor({lat} * 1e6 + 0.5) AS BIGINT) AS ym FROM events) "
        "SELECT user_id, min(xm) AS x_min, max(xm) AS x_max, "
        "min(ym) AS y_min, max(ym) AS y_max, "
        "(max(xm) - min(xm)) * (max(ym) - min(ym)) AS area_u2 "
        "FROM p GROUP BY 1"
    )


def q_cell_transitions(sf_dir: str):
    """Markov cell-transition counts (sequence/mobility mining): each
    user's consecutive events (ordered by ts, event_id) emit a
    (from_cell → to_cell) edge on the 15° grid when the cell changes;
    users co-partition through the coarse keyed_scan and the bounded
    transition space merges on the combiner tree."""
    from ..stages.agg_tree import tree_aggregate_to_table
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        cx = np.floor((lon + 180.0) / 15.0).astype(np.int64)
        cy = np.floor((lat + 60.0) / 15.0).astype(np.int64)
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "cell": pa.array(cy * 24 + cx)})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        c = d["cell"].to_numpy()
        step = np.r_[False, (u[1:] == u[:-1]) & (c[1:] != c[:-1])]
        g = (pd.DataFrame({"from_cell": np.roll(c, 1)[step],
                           "to_cell": c[step]})
             .groupby(["from_cell", "to_cell"], sort=False)
             .size().reset_index(name="n"))
        g["n"] = g["n"].astype(np.int64)
        return g

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"]
               ).map_batches(prep, batch_format="pyarrow")
    parts = keyed_scan(ds, "user_id", ["t", "event_id"], fn,
                       n_rows=_nrows(sf_dir, "events"))
    return tree_aggregate_to_table(
        parts, ["from_cell", "to_cell"], [("n", "sum")])


def q_cell_transitions_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        f"WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        f"CAST(floor(({lat} + 60.0) / 15.0) AS BIGINT) * 24 + "
        f"CAST(floor(({lon} + 180.0) / 15.0) AS BIGINT) AS cell "
        "FROM events), "
        "s AS (SELECT cell AS to_cell, lag(cell) OVER "
        "(PARTITION BY user_id ORDER BY t, event_id) AS from_cell "
        "FROM p) "
        "SELECT from_cell, to_cell, CAST(count(*) AS BIGINT) AS n "
        "FROM s WHERE from_cell IS NOT NULL AND from_cell <> to_cell "
        "GROUP BY 1, 2"
    )


def q_speed_profile(sf_dir: str):
    """Velocity analytics over trajectories: per-hop speed =
    haversine-mm · 1e6 // Δt_µs (pure int64 after the house
    millimetre pinning), bucketed by decimal magnitude (exact digit
    count — integer threshold comparisons, no log) into a bounded
    histogram that merges on the combiner tree.  Zero/negative Δt hops
    (same-timestamp events) are excluded on both sides."""
    from ..stages.agg_tree import tree_aggregate_to_table
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "lat": pa.array(lat), "lon": pa.array(lon)})

    C = np.pi / 180.0
    R2 = 2.0 * 6371000.0
    POW10 = 10 ** np.arange(1, 19, dtype=np.int64)

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        t = d["t"].to_numpy()
        phi = d["lat"].to_numpy() * C
        lam = d["lon"].to_numpy() * C
        hop = np.r_[False, u[1:] == u[:-1]]
        dt = t - np.roll(t, 1)
        p1, p2 = np.roll(phi, 1)[hop], phi[hop]
        l1, l2 = np.roll(lam, 1)[hop], lam[hop]
        dt = dt[hop]
        sp = np.sin((p2 - p1) / 2.0)
        sl = np.sin((l2 - l1) / 2.0)
        h = sp * sp + np.cos(p1) * np.cos(p2) * (sl * sl)
        mm = np.floor(R2 * np.arcsin(np.minimum(1.0, np.sqrt(h)))
                      * 1e3 + 0.5).astype(np.int64)
        ok = dt > 0
        speed = mm[ok] * 1_000_000 // dt[ok]
        digits = (np.searchsorted(POW10, speed, side="right") + 1
                  ).astype(np.int64)
        g = (pd.DataFrame({"magnitude": digits})
             .groupby("magnitude", sort=False).size()
             .reset_index(name="n_hops"))
        g["n_hops"] = g["n_hops"].astype(np.int64)
        return g

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"]
               ).map_batches(prep, batch_format="pyarrow")
    parts = keyed_scan(ds, "user_id", ["t", "event_id"], fn,
                       n_rows=_nrows(sf_dir, "events"))
    return tree_aggregate_to_table(
        parts, ["magnitude"], [("n_hops", "sum")])


def q_speed_profile_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        "WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        f"{lat} * (pi() / 180.0) AS phi, "
        f"{lon} * (pi() / 180.0) AS lam FROM events), "
        "s AS (SELECT user_id, t, phi, lam, lag(t) OVER w AS t0, "
        "lag(phi) OVER w AS p1, lag(lam) OVER w AS l1 FROM p "
        "WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), "
        "h AS (SELECT t - t0 AS dt, "
        "CAST(floor(2.0 * 6371000.0 * asin(least(1.0, sqrt("
        "sin((phi - p1) / 2.0) * sin((phi - p1) / 2.0) "
        "+ cos(p1) * cos(phi) * (sin((lam - l1) / 2.0) * "
        "sin((lam - l1) / 2.0))))) * 1e3 + 0.5) AS BIGINT) AS mm "
        "FROM s WHERE t0 IS NOT NULL), "
        "v AS (SELECT length(CAST(mm * 1000000 // dt AS VARCHAR)) "
        "AS magnitude FROM h WHERE dt > 0) "
        "SELECT CAST(magnitude AS BIGINT) AS magnitude, "
        "CAST(count(*) AS BIGINT) AS n_hops FROM v GROUP BY 1"
    )


def q_traj_intersections(sf_dir: str):
    """Cross-set line-segment intersection join — the vector-overlay
    GIS shape (road network × trajectory hops): every event derives a
    short directed segment (≤ 3° per axis) from its id; even-id
    segments join odd-id segments on PROPER crossing.  Distributed
    plan: PBSM grid co-partition over segment bounding boxes
    (stages/spatial_join.py — cover fan-out, reference-point dedup so
    a pair is reported by exactly one cell, hot-cell fragment-
    replicate guard), then a stateless vectorized verify map
    re-derives endpoints from the ids (only id pairs cross the
    shuffle) and keeps pairs whose exact int64 microdegree
    cross-product orientation signs witness a proper crossing — no
    epsilon, no floats (|products| ≤ ~4e12, far inside int64).  The
    oracle replays the bbox join plus the same strict orientation
    predicate."""
    from ..stages.spatial_join import box_overlap_join

    def boxes(parity: int):
        def f(b: pa.Table) -> pa.Table:
            eid = b["event_id"].to_numpy(zero_copy_only=False)
            eid = eid[eid % 2 == parity]
            y1, x1, y2, x2 = _seg_params(eid)
            return pa.table({
                "id": pa.array(eid, pa.int64()),
                "xmin": pa.array(np.minimum(x1, x2)),
                "ymin": pa.array(np.minimum(y1, y2)),
                "xmax": pa.array(np.maximum(x1, x2)),
                "ymax": pa.array(np.maximum(y1, y2))})
        return f

    a = _read(sf_dir, "events", ["event_id"]).map_batches(
        boxes(0), batch_format="pyarrow")
    b = _read(sf_dir, "events", ["event_id"]).map_batches(
        boxes(1), batch_format="pyarrow")
    cand = box_overlap_join(a, b, cell=4.0, out_a="a_id", out_b="b_id")

    def _micro(eid):
        y1, x1, y2, x2 = _seg_params(eid)
        def m(v):
            return np.floor(v * 1e6 + 0.5).astype(np.int64)
        return m(x1), m(y1), m(x2), m(y2)

    def verify(t: pa.Table) -> pa.Table:
        aid = t["a_id"].to_numpy(zero_copy_only=False)
        bid = t["b_id"].to_numpy(zero_copy_only=False)
        ax1, ay1, ax2, ay2 = _micro(aid)
        bx1, by1, bx2, by2 = _micro(bid)
        d1 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
        d2 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
        d3 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)
        d4 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)
        cross = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) \
            & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
        return pa.table({"a_id": pa.array(aid[cross], pa.int64()),
                         "b_id": pa.array(bid[cross], pa.int64())})

    return cand.map_batches(verify, batch_format="pyarrow")


def q_traj_intersections_sql() -> str:
    # side A (even ids) keys on event_id; side B (odd) on
    # event_id·1000003 — the CAST to HUGEINT happens BEFORE the
    # multiply so the product itself is exact at any event_id (a
    # BIGINT multiply would raise past ~9.2e12 while the engine's
    # int64 wrap proceeds; the downstream latlon derive only uses
    # the value mod 2^32, which both sides then agree on)
    lat, lon = latlon_sql(
        "CASE WHEN event_id % 2 = 1 THEN "
        "CAST(event_id AS HUGEINT) * 1000003 "
        "ELSE CAST(event_id AS HUGEINT) END")
    return (
        "WITH e AS (SELECT event_id, "
        f"CAST({lat} AS DOUBLE) AS lat, CAST({lon} AS DOUBLE) AS lon, "
        "-3.0 + 6.0 * (((event_id * 7919) % 1000) / 1000.0) AS dlat, "
        "-3.0 + 6.0 * (((event_id * 104729) % 1000) / 1000.0) AS dlon "
        "FROM events), "
        "s AS (SELECT event_id, "
        "least(lon, lon + dlon) AS xmin, greatest(lon, lon + dlon) AS xmax, "
        "least(lat, lat + dlat) AS ymin, greatest(lat, lat + dlat) AS ymax, "
        "CAST(floor(lon * 1e6 + 0.5) AS BIGINT) AS x1, "
        "CAST(floor(lat * 1e6 + 0.5) AS BIGINT) AS y1, "
        "CAST(floor((lon + dlon) * 1e6 + 0.5) AS BIGINT) AS x2, "
        "CAST(floor((lat + dlat) * 1e6 + 0.5) AS BIGINT) AS y2 FROM e), "
        "c AS (SELECT a.event_id AS a_id, b.event_id AS b_id, "
        "(a.x2 - a.x1) * (b.y1 - a.y1) - (a.y2 - a.y1) * (b.x1 - a.x1) AS d1, "
        "(a.x2 - a.x1) * (b.y2 - a.y1) - (a.y2 - a.y1) * (b.x2 - a.x1) AS d2, "
        "(b.x2 - b.x1) * (a.y1 - b.y1) - (b.y2 - b.y1) * (a.x1 - b.x1) AS d3, "
        "(b.x2 - b.x1) * (a.y2 - b.y1) - (b.y2 - b.y1) * (a.x2 - b.x1) AS d4 "
        "FROM s a JOIN s b ON a.event_id % 2 = 0 AND b.event_id % 2 = 1 "
        "AND a.xmin <= b.xmax AND b.xmin <= a.xmax "
        "AND a.ymin <= b.ymax AND b.ymin <= a.ymax) "
        "SELECT a_id, b_id FROM c "
        "WHERE ((d1 > 0 AND d2 < 0) OR (d1 < 0 AND d2 > 0)) "
        "AND ((d3 > 0 AND d4 < 0) OR (d3 < 0 AND d4 > 0))"
    )


_VW_K = 8


def q_visvalingam(sf_dir: str):
    """VISVALINGAM-WHYATT polyline simplification of each user's
    trajectory down to K=8 points — the iterative minimum-triangle-
    area sibling of Douglas-Peucker, kept EXACT: coordinates are
    microdegree ints, effective areas are integer cross products, and
    each round removes the per-user (area, seq)-lexicographic minimum
    interior point.  One keyed_scan pass; rounds run VECTORIZED
    ACROSS USERS over doubly-linked prev/next index arrays (remove one
    point per over-budget user per round — never a per-user Python
    loop).  Oracle = a recursive CTE recomputing lag/lead areas and
    deleting the per-user argmin each iteration (prototype-validated
    against an independent reference loop)."""
    from ..stages.scan import keyed_scan

    K = _VW_K

    def prep(b: pa.Table) -> pa.Table:
        e = b["event_id"].to_numpy(zero_copy_only=False)
        lat, lon = derive_latlon(e)
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "mx": pa.array(np.floor(lon * 1e6 + 0.5
                                                 ).astype(np.int64)),
                         "my": pa.array(np.floor(lat * 1e6 + 0.5
                                                 ).astype(np.int64))})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        mx = d["mx"].to_numpy().astype(np.int64)
        my = d["my"].to_numpy().astype(np.int64)
        n = len(u)
        uniq, codes = np.unique(u, return_inverse=True)
        starts = np.r_[0, 1 + np.flatnonzero(u[1:] != u[:-1])]
        sizes = np.diff(np.r_[starts, n])
        x = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
        cnt = sizes.copy()
        prv = np.arange(n, dtype=np.int64) - 1
        nxt = np.arange(n, dtype=np.int64) + 1
        prv[starts] = -1
        nxt[starts + sizes - 1] = -1
        alive = np.ones(n, dtype=bool)
        while True:
            over = cnt > K
            if not over.any():
                break
            interior = alive & (prv >= 0) & (nxt >= 0) & over[codes]
            idx = np.flatnonzero(interior)
            pi, ni = prv[idx], nxt[idx]
            area = np.abs((mx[idx] - mx[pi]) * (my[ni] - my[pi])
                          - (my[idx] - my[pi]) * (mx[ni] - mx[pi]))
            cu = codes[idx]
            amin = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
            np.minimum.at(amin, cu, area)
            tied = area == amin[cu]
            xmin = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
            np.minimum.at(xmin, cu[tied], x[idx[tied]])
            win = tied & (x[idx] == xmin[cu])
            rm = idx[win]          # exactly one per over-budget user
            alive[rm] = False
            cnt[codes[rm]] -= 1
            p, nx2 = prv[rm], nxt[rm]
            nxt[p] = nx2
            prv[nx2] = p
        keep = alive
        return pd.DataFrame({"user_id": u[keep], "x": x[keep],
                             "mx": mx[keep], "my": my[keep]})

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t", "event_id"],
                      fn=fn, n_rows=_nrows(sf_dir, "events"))


def q_visvalingam_sql() -> str:
    lat, lon = latlon_sql("event_id")
    K = _VW_K
    return (
        "WITH RECURSIVE "
        f"p0 AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        f"CAST(floor({lon} * 1e6 + 0.5) AS BIGINT) AS mx, "
        f"CAST(floor({lat} * 1e6 + 0.5) AS BIGINT) AS my FROM events), "
        "p AS (SELECT user_id, row_number() OVER (PARTITION BY user_id "
        "ORDER BY t, event_id) - 1 AS x, mx, my FROM p0), "
        "dp AS (SELECT 0 AS it, user_id, x, mx, my FROM p "
        "UNION ALL SELECT * FROM ("
        "WITH a AS (SELECT it, user_id, x, mx, my, "
        "count(*) OVER (PARTITION BY user_id) AS cnt, "
        "lag(mx) OVER w AS px, lag(my) OVER w AS py, "
        "lead(mx) OVER w AS nx, lead(my) OVER w AS ny FROM dp "
        "WINDOW w AS (PARTITION BY user_id ORDER BY x)), "
        "ar AS (SELECT *, CASE WHEN px IS NULL OR nx IS NULL THEN NULL "
        "ELSE abs((mx - px) * (ny - py) - (my - py) * (nx - px)) END "
        f"AS area FROM a WHERE cnt > {K}), "
        "rm AS (SELECT user_id, x FROM (SELECT user_id, x, "
        "row_number() OVER (PARTITION BY user_id ORDER BY area, x) "
        "AS rn FROM ar WHERE area IS NOT NULL) WHERE rn = 1) "
        "SELECT ar.it + 1 AS it, ar.user_id, ar.x, ar.mx, ar.my "
        "FROM ar LEFT JOIN rm ON rm.user_id = ar.user_id "
        "AND rm.x = ar.x WHERE rm.user_id IS NULL)) "
        "SELECT user_id, x, mx, my FROM (SELECT *, "
        "max(it) OVER (PARTITION BY user_id) AS mit FROM dp) "
        "WHERE it = mit"
    )


def q_visit_entropy(sf_dir: str):
    """VISIT (location) ENTROPY per user — the mobility-predictability
    metric: Shannon entropy of each user's z=8 tile-visit
    distribution, pinned per TERM (floor(−p·ln p·10⁹ + 0.5) on exact
    visit counts — the q_type_entropy recipe) plus the distinct-tile
    count.  One user-keyed hash-bucket exchange; per-user folds are
    np.unique segment reductions."""
    from ..stages.scan import hash_bucket_scan

    def prep(b: pa.Table) -> pa.Table:
        e = b["event_id"].to_numpy(zero_copy_only=False)
        lat, lon = derive_latlon(e)
        x, y = tile_xy(lat, lon, 8)
        return pa.table({"user_id": b["user_id"],
                         "tile": pa.array(y * (1 << 8) + x)})

    def fold(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        tl = t["tile"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tl, u))
        u, tl = u[order], tl[order]
        new_pair = np.ones(len(u), dtype=bool)
        new_pair[1:] = (u[1:] != u[:-1]) | (tl[1:] != tl[:-1])
        pu = u[new_pair]
        c = np.diff(np.append(np.flatnonzero(new_pair), len(u)))
        uniq, codes = np.unique(pu, return_inverse=True)
        n = np.zeros(len(uniq), np.int64)
        np.add.at(n, codes, c)
        p = c / n[codes]
        terms = np.floor(-(p * np.log(p)) * 1e9 + 0.5).astype(np.int64)
        h = np.zeros(len(uniq), np.int64)
        np.add.at(h, codes, terms)
        nt = np.zeros(len(uniq), np.int64)
        np.add.at(nt, codes, 1)
        return pa.table({"user_id": pa.array(uniq),
                         "h_nano": pa.array(h),
                         "n_tiles": pa.array(nt)})

    rows = _read(sf_dir, "events",
                 ["event_id", "user_id"]).map_batches(
        prep, batch_format="pyarrow")
    return hash_bucket_scan(rows, ["user_id"], fold,
                            n_rows=_nrows(sf_dir, "events"))


def q_visit_entropy_sql() -> str:
    lat, lon = latlon_sql("event_id")
    xe, ye = tile_sql(lat, lon, 8)
    return (
        f"WITH t AS (SELECT user_id, ({ye}) * 256 + ({xe}) AS tile "
        "FROM events), "
        "c AS (SELECT user_id, tile, count(*) AS c FROM t "
        "GROUP BY 1, 2), "
        "n AS (SELECT user_id, sum(c) AS n, count(*) AS nt FROM c "
        "GROUP BY 1), "
        "tm AS (SELECT c.user_id, CAST(floor(-((CAST(c.c AS DOUBLE) / "
        "CAST(n.n AS DOUBLE)) * ln(CAST(c.c AS DOUBLE) / "
        "CAST(n.n AS DOUBLE))) * 1e9 + 0.5) AS BIGINT) AS term, n.nt "
        "FROM c JOIN n ON n.user_id = c.user_id) "
        "SELECT user_id, CAST(sum(term) AS BIGINT) AS h_nano, "
        "CAST(any_value(nt) AS BIGINT) AS n_tiles FROM tm GROUP BY 1"
    )


def q_radius_gyration(sf_dir: str):
    """RADIUS OF GYRATION per user (the González-Hidalgo-Barabási
    mobility scale), denominators cleared so everything is exact
    int64 in CENTIDEGREE space: n²·r_g² = n·Σ(x²+y²) − (Σx)² − (Σy)²
    (x² ≤ 1.3e9 at centidegrees keeps n·Σ within int64 at any
    per-user cardinality the fixture carries; micro-degrees would
    overflow — the scale choice is the documented bound).  Per-batch
    moment partials ride the combiner tree keyed by user."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        e = b["event_id"].to_numpy(zero_copy_only=False)
        lat, lon = derive_latlon(e)
        x = np.floor(lon * 1e2 + 0.5).astype(np.int64)
        y = np.floor(lat * 1e2 + 0.5).astype(np.int64)
        t = pa.table({"user_id": b["user_id"],
                      "n": pa.array(np.ones(len(x), np.int64)),
                      "sx": pa.array(x), "sy": pa.array(y),
                      "s2": pa.array(x * x + y * y)})
        g = t.group_by(["user_id"]).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"), ("s2", "sum")])
        return g.rename_columns(["user_id", "n", "sx", "sy", "s2"])

    tab = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_id", "user_id"]).map_batches(
            partial, batch_format="pyarrow"),
        ["user_id"], [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
                      ("s2", "sum")]).to_pandas()
    n = tab["n"].to_numpy().astype(np.int64)
    sx = tab["sx"].to_numpy().astype(np.int64)
    sy = tab["sy"].to_numpy().astype(np.int64)
    s2 = tab["s2"].to_numpy().astype(np.int64)
    return pd.DataFrame({"user_id": tab["user_id"].to_numpy(),
                         "rg2_num": n * s2 - sx * sx - sy * sy,
                         "n": n})


def q_radius_gyration_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        f"WITH p AS (SELECT user_id, "
        f"CAST(floor({lon} * 1e2 + 0.5) AS BIGINT) AS x, "
        f"CAST(floor({lat} * 1e2 + 0.5) AS BIGINT) AS y FROM events) "
        "SELECT user_id, CAST(count(*) * sum(x * x + y * y) "
        "- sum(x) * sum(x) - sum(y) * sum(y) AS BIGINT) AS rg2_num, "
        "CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1"
    )
