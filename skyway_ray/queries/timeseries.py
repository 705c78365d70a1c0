"""timeseries query family (split from the former single-file queries module)."""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo.cells import cell_id, cell_sql
from ..geo.tiles import tile_sql, tile_xy
from ._common import (_hourly_counts_table, _nrows, _read)




def q_window_counts(sf_dir: str):
    """Tumbling 1-hour window counts per user (stream-shaped op:
    event-time bucketing; see ray_guide 'Streaming-shaped')."""

    def bucket(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        hours = ts.astype("datetime64[us]").astype(np.int64) // 3_600_000_000
        t = pa.table({"user_id": batch["user_id"],
                      "window_h": pa.array(hours, pa.int64())})
        g = t.group_by(["user_id", "window_h"]).aggregate([("user_id", "count")])
        return g.rename_columns(["user_id", "window_h", "n"])

    from ..stages.agg_tree import tree_aggregate

    partials = _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
        bucket, batch_format="pyarrow")
    out = tree_aggregate(partials, ["user_id", "window_h"], [("n", "sum")])
    return out.map_batches(
        lambda b: b.rename_columns(["user_id", "window_h", "n_events"]),
        batch_format="pyarrow")


def q_window_counts_sql() -> str:
    return ("SELECT user_id, cast(floor(epoch(ts) / 3600) as bigint) "
            "AS window_h, count(*) AS n_events FROM events GROUP BY 1, 2")


def q_sliding_windows(sf_dir: str):
    """Sliding event-time windows: 1-hour windows every 15 minutes —
    each event lands in 4 windows.  The flat_map-style expansion stays
    inside ``map_batches`` (one ``np.repeat`` per batch, then a LOCAL
    Arrow combine), so the shuffle moves per-(window) partials, not
    4x the event rows."""
    STEP_US = 900_000_000  # 15 min
    NSUB = 4               # 1h window / 15m step

    def expand_partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        slot = ts.astype("datetime64[us]").astype(np.int64) // STEP_US
        wins = (np.repeat(slot, NSUB)
                - np.tile(np.arange(NSUB, dtype=np.int64), len(slot)))
        t = pa.table({"win_slot": pa.array(wins, pa.int64())})
        g = t.group_by(["win_slot"]).aggregate([("win_slot", "count")])
        return g.rename_columns(["win_slot", "n"])

    from ..stages.agg_tree import tree_aggregate

    partials = _read(sf_dir, "events", ["ts"]).map_batches(
        expand_partial, batch_format="pyarrow")
    out = tree_aggregate(partials, ["win_slot"], [("n", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        slots = b["win_slot"].to_numpy(zero_copy_only=False)
        return pa.table({
            "win_start_us": pa.array(slots * STEP_US, pa.int64()),
            "n_events": b["n"],
        })

    return out.map_batches(finish, batch_format="pyarrow")


def q_sliding_windows_sql() -> str:
    return (
        "WITH e AS (SELECT epoch_us(ts) AS t FROM events), "
        "j AS (SELECT unnest(range(4)) AS j), "
        "w AS (SELECT ((t // 900000000) - j) * 900000000 AS win_start_us "
        "FROM e CROSS JOIN j) "
        "SELECT win_start_us, count(*) AS n_events FROM w GROUP BY 1"
    )


def q_asof_join(sf_dir: str):
    """As-of join: for each event, the user's latest order with
    o_orderdate <= ts (ties → max orderkey); events with no qualifying
    order are dropped. pd.merge_asof per batch against the broadcast
    (sorted) orders side."""
    import pyarrow.parquet as pq

    from ..stages.joins import asof_join_broadcast

    orders = pq.read_table(os.path.join(sf_dir, "orders.parquet"),
                           columns=["o_orderkey", "o_custkey", "o_orderdate"]
                           ).to_pandas()
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    joined = asof_join_broadcast(ev, orders, key="user_id", ts="ts",
                                 right_key="o_custkey", right_ts="o_orderdate",
                                 right_cols=["o_orderkey"])

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.dropna(subset=["o_orderkey"])
        return pd.DataFrame({
            "event_id": out["event_id"].astype(np.int64),
            "o_orderkey": out["o_orderkey"].astype(np.int64),
        })

    return joined.map_batches(finish, batch_format="pandas")


def q_asof_join_sql() -> str:
    return (
        "WITH j AS (SELECT e.event_id, o.o_orderkey, row_number() OVER ("
        "PARTITION BY e.event_id ORDER BY o.o_orderdate DESC, "
        "o.o_orderkey DESC) AS rn FROM events e JOIN orders o "
        "ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) "
        "SELECT event_id, o_orderkey FROM j WHERE rn = 1"
    )


def q_session_windows(sf_dir: str):
    """Session windows per user (gap > 1h splits a session) — the
    stream-shaped op the guide maps to ``groupby(key).map_groups`` over
    ts-sorted groups. Deterministic: ordering by (ts, event_id), gaps
    in integer microseconds.

    Scale shape: grouping by a COARSE user-hash bucket rather than per
    user — Ray pays per-group overhead, so each group call sessionizes
    every user in its bucket with one vectorized numpy pass (boundary
    cumsum).  Bucket count auto-scales to a fixed per-bucket row budget
    (stages/scan.py auto_n_buckets) from the parquet footer row
    count."""
    from ..stages.scan import auto_n_buckets

    GAP_US = 3_600_000_000
    N_BUCKETS = auto_n_buckets(_nrows(sf_dir, "events"))

    def add_bucket(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return b.append_column("_bucket", pa.array(u % N_BUCKETS, pa.int64()))

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        user = d["user_id"].to_numpy()
        ts_us = d["ts"].astype("int64").to_numpy()
        n = len(d)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = user[1:] != user[:-1]
        gap = np.zeros(n, dtype=bool)
        gap[1:] = (ts_us[1:] - ts_us[:-1]) > GAP_US
        boundary = new_user | gap
        # session_id within user = (#boundaries so far) - (#boundaries
        # at this user's first row)
        b_cum = np.cumsum(boundary)
        user_start = np.repeat(b_cum[new_user], np.diff(
            np.append(np.flatnonzero(new_user), n)))
        session_id = b_cum - user_start
        seg_id = b_cum - 1  # 0-based contiguous segment index
        counts = np.bincount(seg_id - seg_id[0])
        first_of_seg = np.flatnonzero(boundary)
        return pd.DataFrame({
            "user_id": user[first_of_seg],
            "session_id": session_id[first_of_seg],
            "n_events": counts.astype(np.int64),
        })

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"]).map_batches(
        add_bucket, batch_format="pyarrow")
    out = ds.groupby("_bucket").map_groups(sessions, batch_format="pandas")
    return out.map_batches(
        lambda b: b.select(["user_id", "session_id", "n_events"]),
        batch_format="pyarrow")


def q_session_windows_sql() -> str:
    return (
        "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us "
        "FROM events), "
        "flagged AS (SELECT user_id, ts_us, event_id, CASE WHEN ts_us - "
        "lag(ts_us) "
        "OVER (PARTITION BY user_id ORDER BY ts_us, event_id) > 3600000000 "
        "THEN 1 ELSE 0 END AS new_sess FROM e), "
        "numbered AS (SELECT user_id, cast(sum(new_sess) OVER (PARTITION BY "
        "user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) "
        "AS bigint) AS session_id "
        "FROM flagged) "
        "SELECT user_id, session_id, count(*) AS n_events FROM numbered "
        "GROUP BY 1, 2"
    )


def q_rolling_counts(sf_dir: str):
    """Rolling 1-hour range-window count per user (for each event, how
    many of the user's events fall in [ts-1h, ts] including ts-peers —
    SQL RANGE semantics, inclusive lower bound).  Same coarse user-bucket grouping as
    session_windows (bucket count auto-scales to a per-bucket row
    budget); the per-bucket pass is ONE global two-sided searchsorted —
    each user segment's timestamps shift into a disjoint int64 band
    (band width > global ts span + window), so window bounds never
    cross segments and no per-user Python loop runs."""
    from ..stages.scan import auto_n_buckets

    GAP_US = 3_600_000_000
    N_BUCKETS = auto_n_buckets(_nrows(sf_dir, "events"))

    def add_bucket(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return b.append_column("_bucket", pa.array(u % N_BUCKETS, pa.int64()))

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = d["ts"].astype("int64").to_numpy()
        user = d["user_id"].to_numpy()
        n = len(d)
        if not n:
            return pd.DataFrame({"event_id": np.empty(0, np.int64),
                                 "n_last_hour": np.empty(0, np.int64)})
        out = np.empty(n, dtype=np.int64)
        new = np.ones(n, dtype=bool)
        new[1:] = user[1:] != user[:-1]
        seg = np.cumsum(new) - 1  # 0-based segment index per row
        base = ts - ts.min()
        span = np.int64(base.max()) + GAP_US + 1
        # chunk segments so seg_local * span never overflows int64
        # (one iteration unless segments x ts-span nears 2^62)
        segs_per_chunk = max(1, int((1 << 62) // span))
        n_segs = int(seg[-1]) + 1
        for c0 in range(0, n_segs, segs_per_chunk):
            m = (seg >= c0) & (seg < c0 + segs_per_chunk)
            k = base[m] + (seg[m] - c0) * span
            hi = np.searchsorted(k, k, side="right")
            lo = np.searchsorted(k, k - GAP_US, side="left")
            out[m] = hi - lo
        return pd.DataFrame({"event_id": d["event_id"].to_numpy(),
                             "n_last_hour": out})

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"]).map_batches(
        add_bucket, batch_format="pyarrow")
    return ds.groupby("_bucket").map_groups(roll, batch_format="pandas")


def q_rolling_counts_sql() -> str:
    return ("SELECT event_id, cast(count(*) OVER (PARTITION BY user_id "
            "ORDER BY epoch_us(ts) RANGE BETWEEN 3600000000 PRECEDING "
            "AND CURRENT ROW) AS bigint) AS n_last_hour FROM events")


def q_funnel(sf_dir: str):
    """Event-sequence funnel (click → purchase within 1 h) per user:
    the keyed_scan coarse-bucket shape with a vectorized last-click
    cummax per user — purchases at the same timestamp as a click sort
    AFTER it, so the scan sees the click (ties resolved like the SQL
    window's ORDER BY)."""
    from ..stages.scan import keyed_scan

    H = 3_600_000_000  # 1h in epoch-us

    def prep(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "click") | (et == "purchase")
        t = b.filter(pa.array(keep))
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        is_p = (t["event_type"].to_numpy(zero_copy_only=False)
                == "purchase").astype(np.int64)
        return pa.table({"user_id": t["user_id"],
                         "t": pa.array(ts, pa.int64()),
                         "is_p": pa.array(is_p, pa.int64()),
                         "event_id": t["event_id"]})

    def scan(d: pd.DataFrame) -> pd.DataFrame:
        # positional numpy throughout (group frames arrive with
        # duplicate index labels — label alignment would misassign)
        u = d["user_id"].to_numpy()
        t = d["t"].to_numpy()
        is_p = d["is_p"].to_numpy()
        # last click timestamp per position, reset at user boundaries
        click_t = np.where(is_p == 0, t, np.iinfo(np.int64).min)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        seg = np.zeros(len(u), np.int64)
        seg[starts] = 1
        gid = np.cumsum(seg)
        s = pd.Series(np.where(click_t == np.iinfo(np.int64).min,
                               np.nan, click_t))
        # cummax leaves NaN at NaN positions — ffill within the group
        # carries the running max over the purchase rows
        lc = s.groupby(gid).cummax().groupby(gid).ffill().to_numpy()
        pmask = is_p == 1
        conv = (~np.isnan(lc[pmask])) & (t[pmask] - lc[pmask] <= H)
        pu = u[pmask]
        out = (pd.DataFrame({"user_id": pu,
                             "n_purchases": np.ones(len(pu), np.int64),
                             "n_converted": conv.astype(np.int64)})
               .groupby("user_id", sort=False, as_index=False).sum())
        return out[["user_id", "n_purchases", "n_converted"]]

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "event_type"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t", "is_p", "event_id"],
                      fn=scan, n_rows=_nrows(sf_dir, "events"))


def q_funnel_sql() -> str:
    return (
        "WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type, event_id "
        "FROM events WHERE event_type IN ('click', 'purchase')), "
        "s AS (SELECT *, max(CASE WHEN event_type = 'click' THEN t END) "
        "OVER (PARTITION BY user_id ORDER BY t, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END, event_id "
        "ROWS UNBOUNDED PRECEDING) AS last_click FROM e) "
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases, "
        "CAST(sum(CASE WHEN last_click IS NOT NULL "
        "AND t - last_click <= 3600000000 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_converted FROM s WHERE event_type = 'purchase' "
        "GROUP BY user_id"
    )


def q_throttle_dedup(sf_dir: str):
    """Windowed first-per-key dedup (event throttling: keep each
    user's FIRST event per hour).  The shuffle ships only
    (key, t, event_id, user_id, hour) projections; survivors resolve
    with one vectorized first-of-run mask per coarse bucket
    (stages/scan.py keyed_scan — keys never straddle buckets)."""
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        t = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = b["user_id"].to_numpy(zero_copy_only=False)
        hour = t // 3_600_000_000
        # user_id * 2^20 + hour is collision-free while epoch-hours
        # < 2^20 (until year 2089)
        return pa.table({"k": pa.array(u * (1 << 20) + hour, pa.int64()),
                         "t": pa.array(t, pa.int64()),
                         "event_id": b["event_id"],
                         "user_id": b["user_id"],
                         "hour": pa.array(hour, pa.int64())})

    def first(d: pd.DataFrame) -> pd.DataFrame:
        k = d["k"].to_numpy()
        mask = np.r_[True, k[1:] != k[:-1]]
        return d.loc[mask, ["event_id", "user_id", "hour"]]

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="k", order=["t", "event_id"], fn=first,
                      n_rows=_nrows(sf_dir, "events"))


def q_throttle_dedup_sql() -> str:
    return (
        "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t, "
        "epoch_us(ts) // 3600000000 AS hour FROM events) "
        "SELECT event_id, user_id, hour FROM e "
        "QUALIFY row_number() OVER (PARTITION BY user_id, hour "
        "ORDER BY t, event_id) = 1"
    )


def q_sliding_distinct(sf_dir: str):
    """Sliding-window COUNT(DISTINCT user): 1 h windows every 15 min —
    the window explode (np.repeat inside map_batches, with a LOCAL
    (window, user) pair dedup so the shuffle carries distinct pairs,
    not 4× rows) composed with the unbounded-pair-key distinct
    machinery (stages/agg_tree.py::grouped_count_distinct shape)."""
    from ..stages.agg_tree import grouped_count

    STEP_US = 900_000_000
    NSUB = 4

    def expand_pairs(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        slot = ts // STEP_US
        wins = (np.repeat(slot, NSUB)
                - np.tile(np.arange(NSUB, dtype=np.int64), len(slot)))
        t = pa.table({"win_slot": pa.array(wins, pa.int64()),
                      "user_id": pa.array(np.repeat(u, NSUB), pa.int64())})
        return t.group_by(["win_slot", "user_id"]).aggregate([])

    from ..stages.scan import hash_bucket_scan

    pairs = _read(sf_dir, "events", ["ts", "user_id"]).map_batches(
        expand_pairs, batch_format="pyarrow")
    # pair-key distinct through ONE coarse hash exchange (a pair lands
    # wholly in one bucket; within-bucket Arrow group_by) — no global
    # sort over the unbounded (window, user) key space
    uniq = hash_bucket_scan(
        pairs, ["win_slot", "user_id"],
        lambda t: t.group_by(["win_slot", "user_id"]).aggregate([]),
        n_rows=NSUB * _nrows(sf_dir, "events"))
    out = grouped_count(uniq, ["win_slot"], out_col="n_users")

    def finish(b: pa.Table) -> pa.Table:
        slots = b["win_slot"].to_numpy(zero_copy_only=False)
        return pa.table({
            "win_start_us": pa.array(slots * 900_000_000, pa.int64()),
            "n_users": b["n_users"]})

    return out.map_batches(finish, batch_format="pyarrow")


def q_sliding_distinct_sql() -> str:
    return (
        "WITH e AS (SELECT epoch_us(ts) AS t, user_id FROM events), "
        "j AS (SELECT unnest(range(4)) AS j), "
        "w AS (SELECT ((t // 900000000) - j) * 900000000 AS win_start_us, "
        "user_id FROM e CROSS JOIN j) "
        "SELECT win_start_us, CAST(count(DISTINCT user_id) AS BIGINT) "
        "AS n_users FROM w GROUP BY 1"
    )


def q_scd_intervals(sf_dir: str):
    """Slowly-changing-dimension (type 2) interval build: each user's
    events become validity intervals [ts, next_ts) with the sentinel
    MAX for the open current row — the LEAD window as a vectorized
    next-of-run shift inside coarse key buckets (keys never straddle
    buckets, so no cross-partition carry)."""
    from ..stages.scan import keyed_scan

    SENTINEL = np.int64(2**62)

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"]})

    def intervals(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        t = d["t"].to_numpy()
        nxt = np.empty_like(t)
        nxt[:-1] = t[1:]
        nxt[-1] = SENTINEL
        last = np.r_[u[1:] != u[:-1], True]
        nxt[last] = SENTINEL
        out = d[["user_id", "event_id"]].copy()
        out["valid_from"] = t
        out["valid_to"] = nxt
        return out

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t", "event_id"],
                      fn=intervals, n_rows=_nrows(sf_dir, "events"))


def q_scd_intervals_sql() -> str:
    return (
        "SELECT user_id, event_id, epoch_us(ts) AS valid_from, "
        "COALESCE(lead(epoch_us(ts)) OVER (PARTITION BY user_id "
        "ORDER BY epoch_us(ts), event_id), 4611686018427387904) "
        "AS valid_to FROM events"
    )


def q_user_window(sf_dir: str):
    """LEAD / FIRST_VALUE / running MAX per user in (ts, event_id)
    order — one coarse-bucket keyed scan (stages/scan.py), all three
    windows from a single vectorized pass over the sorted bucket (the
    running max is over the micro-quantized int value, so the oracle's
    windowed MAX matches bit-for-bit)."""
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        vq2 = np.floor(v * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "event_id": b["event_id"], "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "vq2": pa.array(vq2, pa.int64())})

    def scan(d: pd.DataFrame) -> pd.DataFrame:
        k = d["user_id"].to_numpy()
        ts = d["ts_us"].to_numpy()
        first_mask = np.ones(len(d), dtype=bool)
        first_mask[1:] = k[1:] != k[:-1]
        # LEAD(ts): next row's ts, -1 on each user's last row
        lead = np.empty_like(ts)
        lead[:-1] = ts[1:]
        last_mask = np.ones(len(d), dtype=bool)
        last_mask[:-1] = first_mask[1:]
        lead[last_mask] = -1
        # FIRST_VALUE(ts): broadcast each segment's first ts
        seg_start = np.flatnonzero(first_mask)
        sizes = np.diff(np.append(seg_start, len(d)))
        first_ts = np.repeat(ts[seg_start], sizes)
        # running MAX(vq2) within the segment (pandas cummax — C loop,
        # no per-key Python; max has no subtract-the-base reset trick)
        cummax = d.groupby("user_id", sort=False)["vq2"].cummax().to_numpy()
        return pd.DataFrame({
            "event_id": d["event_id"].to_numpy(),
            "lead_ts_us": lead,
            "first_ts_us": first_ts,
            "cummax_vq2": cummax})

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["ts_us", "event_id"],
                      fn=scan, n_rows=_nrows(sf_dir, "events"))


def q_user_window_sql() -> str:
    return (
        "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vq2 FROM events) "
        "SELECT event_id, COALESCE(lead(ts_us) OVER w, -1) AS lead_ts_us, "
        "first_value(ts_us) OVER w AS first_ts_us, "
        "max(vq2) OVER (PARTITION BY user_id ORDER BY ts_us, event_id "
        "ROWS UNBOUNDED PRECEDING) AS cummax_vq2 "
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)"
    )


def q_retention(sf_dir: str):
    """Cohort retention: cohort = each user's first active week, then
    distinct-user counts per (cohort_week, active_week).  ONE hash
    co-partition shuffle on user_id does all the per-user work (first
    week + distinct weeks) vectorized inside each bucket; the
    (cohort, week) key space is bounded (weeks²), so the final count
    rides the combiner tree — no second all-to-all."""
    from ..stages.agg_tree import tree_aggregate
    from ..stages.scan import hash_bucket_scan

    WEEK_US = 7 * 86400 * 1_000_000

    def prep(b: pa.Table) -> pa.Table:
        ts = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b["user_id"],
                         "wk": pa.array(ts // WEEK_US, pa.int64())})

    def per_user(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        w = t["wk"].to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (w[1:] != w[:-1])
        u, w = u[keep], w[keep]                      # distinct (user, wk)
        new_u = np.ones(len(u), dtype=bool)
        new_u[1:] = u[1:] != u[:-1]
        sizes = np.diff(np.append(np.flatnonzero(new_u), len(u)))
        cohort = np.repeat(w[new_u], sizes)          # per-user min week
        t2 = pa.table({"cohort": pa.array(cohort, pa.int64()),
                       "wk": pa.array(w, pa.int64()),
                       "n_users": pa.array(np.ones(len(u), np.int64))})
        g = t2.group_by(["cohort", "wk"]).aggregate([("n_users", "sum")])
        return g.rename_columns(["cohort", "wk", "n_users"])

    ds = _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    pairs = hash_bucket_scan(ds, ["user_id"], per_user,
                             n_rows=_nrows(sf_dir, "events"))
    return tree_aggregate(pairs, ["cohort", "wk"], [("n_users", "sum")])


def q_retention_sql() -> str:
    return (
        "WITH w AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk "
        "FROM events), "
        "c AS (SELECT user_id, min(wk) AS cohort FROM w GROUP BY user_id), "
        "a AS (SELECT DISTINCT w.user_id, c.cohort, w.wk "
        "FROM w JOIN c USING (user_id)) "
        "SELECT cohort, wk, CAST(count(*) AS BIGINT) AS n_users "
        "FROM a GROUP BY cohort, wk"
    )


def q_gap_fill(sf_dir: str):
    """Per-user hourly gap-fill with forward fill: each user's sparse
    (hour, max value) series expands to every hour in [first, last]
    carrying the latest known value — the time-series resample+ffill
    primitive.  ONE user-key hash shuffle; inside a bucket the
    expansion is grouped-arange arithmetic and the fill is one global
    searchsorted over a (user, hour) composite key — no per-user
    loop.  Values pass through untouched (max of doubles), so floats
    hash-match."""
    from ..stages.scan import hash_bucket_scan

    HOUR_US = 3600 * 1_000_000

    def prep(b: pa.Table) -> pa.Table:
        ts = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b["user_id"],
                         "h": pa.array(ts // HOUR_US, pa.int64()),
                         "value": b["value"]})

    def fill(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        h = t["h"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        if len(u) == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "h": pa.array([], pa.int64()),
                             "v": pa.array([], pa.float64())})
        # per-(user, hour) max(value), sorted by (user, hour)
        order = np.lexsort((v, h, u))
        u, h, v = u[order], h[order], v[order]
        last = np.ones(len(u), dtype=bool)
        last[:-1] = (u[1:] != u[:-1]) | (h[1:] != h[:-1])
        u, h, v = u[last], h[last], v[last]          # max = last in v-order
        # per-user [h0, h1] expansion (grouped arange)
        new_u = np.ones(len(u), dtype=bool)
        new_u[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new_u)
        ends = np.append(starts[1:], len(u)) - 1
        h0, h1 = h[starts], h[ends]
        lens = h1 - h0 + 1
        total = int(lens.sum())
        off = np.repeat(np.cumsum(lens) - lens, lens)
        out_h = np.arange(total, dtype=np.int64) - off + np.repeat(h0, lens)
        out_u = np.repeat(u[starts], lens)
        # forward fill: latest sparse row ≤ out_h per user, via a
        # composite (user-ordinal, hour) key monotone within the bucket
        uidx = np.cumsum(new_u) - 1                   # ordinal per sparse row
        out_uidx = np.repeat(np.arange(len(starts), dtype=np.int64), lens)
        SPAN = np.int64(1) << 42                      # hours ≪ 2^42
        key_sparse = uidx * SPAN + h
        key_out = out_uidx * SPAN + out_h
        idx = np.searchsorted(key_sparse, key_out, side="right") - 1
        return pa.table({"user_id": pa.array(out_u, pa.int64()),
                         "h": pa.array(out_h, pa.int64()),
                         "v": pa.array(v[idx], pa.float64())})

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return hash_bucket_scan(ds, ["user_id"], fill,
                            n_rows=_nrows(sf_dir, "events"))


def q_gap_fill_sql() -> str:
    return (
        "WITH hv AS (SELECT user_id, epoch_us(ts) // 3600000000 AS h, "
        "max(value) AS v FROM events GROUP BY user_id, h), "
        "b AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hv "
        "GROUP BY user_id), "
        "s AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS h FROM b) "
        "SELECT s.user_id, s.h, hv.v FROM s ASOF JOIN hv "
        "ON s.user_id = hv.user_id AND s.h >= hv.h"
    )


def q_transitions(sf_dir: str):
    """Markov transition counts over each user's event-type sequence
    (the sequence-mining primitive: session flows, curriculum stats).
    ONE coarse keyed scan co-partitions users and sorts each bucket by
    (user, ts, event_id); the transition pairs fall out of two shifted
    array views (valid where the user doesn't change), and the bounded
    (prev, next) count rides the combiner tree — no second all-to-all.
    Exact ints, so the hash compare vs the LAG-window oracle is
    bit-for-bit."""
    from ..stages.agg_tree import tree_aggregate
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"],
                         "ts_us": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "event_type": b["event_type"]})

    def scan(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        t = d["event_type"].to_numpy()
        same = u[1:] == u[:-1]
        prev, nxt = t[:-1][same], t[1:][same]
        if not len(prev):
            return pd.DataFrame({"prev_type": pd.Series([], dtype=str),
                                 "next_type": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64)})
        # factorize the two columns jointly, count numeric pair codes
        both = np.concatenate([prev, nxt]).astype("U")
        uniq_t, inv = np.unique(both, return_inverse=True)
        code = inv[:len(prev)] * np.int64(len(uniq_t)) + inv[len(prev):]
        ucode, counts = np.unique(code, return_counts=True)
        return pd.DataFrame({"prev_type": uniq_t[ucode // len(uniq_t)],
                             "next_type": uniq_t[ucode % len(uniq_t)],
                             "n": counts.astype(np.int64)})

    ds = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "event_type"]).map_batches(
        prep, batch_format="pyarrow")
    partials = keyed_scan(ds, key="user_id", order=["ts_us", "event_id"],
                          fn=scan, n_rows=_nrows(sf_dir, "events"))
    return tree_aggregate(partials, ["prev_type", "next_type"],
                          [("n", "sum")])


def q_transitions_sql() -> str:
    return (
        "WITH s AS (SELECT user_id, event_type, lag(event_type) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS prev "
        "FROM events) "
        "SELECT prev AS prev_type, event_type AS next_type, "
        "CAST(count(*) AS BIGINT) AS n FROM s "
        "WHERE prev IS NOT NULL GROUP BY prev, event_type"
    )


def q_asof_forward(sf_dir: str):
    """FORWARD as-of join (the mirror of q_asof_join's backward
    direction): each even event matches the EARLIEST odd event of the
    same user at-or-after its timestamp (ties → min event_id; no match
    → -1 sentinels, avoiding nullable drift).  Same coarse user-hash
    exchange as the interval join; per bucket the odd side sorts once
    by a (key-rank, ts, id) composite and ONE global searchsorted
    answers every even row."""
    from ..stages.scan import hash_bucket_scan

    def tag(parity: int):
        def f(b: pa.Table) -> pa.Table:
            eid = b["event_id"].to_numpy(zero_copy_only=False)
            t = b.filter(pa.array(eid % 2 == parity))
            return pa.table({
                "event_id": t["event_id"], "user_id": t["user_id"],
                "t_us": t["ts"].cast(pa.int64()),
                "_side": pa.array(np.full(len(t), parity, np.int8),
                                  pa.int8())})
        return f

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    unioned = (ev.map_batches(tag(0), batch_format="pyarrow")
               .union(ev.map_batches(tag(1), batch_format="pyarrow")))

    def nxt(t: pa.Table) -> pa.Table:
        side = t["_side"].to_numpy(zero_copy_only=False)
        k = t["user_id"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        ts = t["t_us"].to_numpy(zero_copy_only=False)
        a = side == 0
        ka, ia, ta = k[a], eid[a], ts[a]
        if not len(ka):
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "next_id": pa.array([], pa.int64()),
                             "next_ts": pa.array([], pa.int64())})
        kb, ib, tb = k[~a], eid[~a], ts[~a]
        nid = np.full(len(ka), -1, np.int64)
        nts = np.full(len(ka), -1, np.int64)
        if len(kb):
            base = int(min(ta.min(), tb.min()))
            span = int(max(ta.max(), tb.max())) - base + 2
            uk = np.unique(np.concatenate([ka, kb]))
            if len(uk) * span >= 2 ** 63:
                raise ValueError("key-rank × time-span composite "
                                 "overflows int64")
            bkey = (np.searchsorted(uk, kb).astype(np.int64) * span
                    + (tb - base))
            order = np.lexsort((ib, bkey))  # ties → min event_id first
            bkey, ib, tb, kb = bkey[order], ib[order], tb[order], kb[order]
            pos = np.searchsorted(
                bkey, np.searchsorted(uk, ka).astype(np.int64) * span
                + (ta - base), side="left")
            ok = pos < len(bkey)
            pos_c = np.minimum(pos, len(bkey) - 1)
            ok &= kb[pos_c] == ka  # next entry must stay in our key band
            nid[ok] = ib[pos_c[ok]]
            nts[ok] = tb[pos_c[ok]]
        return pa.table({"event_id": pa.array(ia, pa.int64()),
                         "next_id": pa.array(nid, pa.int64()),
                         "next_ts": pa.array(nts, pa.int64())})

    return hash_bucket_scan(unioned, ["user_id"], nxt,
                            n_rows=_nrows(sf_dir, "events"))


def q_asof_forward_sql() -> str:
    return (
        "WITH a AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events "
        "WHERE event_id % 2 = 0), "
        "b AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events "
        "WHERE event_id % 2 = 1), "
        "n AS (SELECT a.event_id, a.user_id, a.t, min(b.t) AS nt FROM a "
        "LEFT JOIN b ON b.user_id = a.user_id AND b.t >= a.t "
        "GROUP BY 1, 2, 3) "
        "SELECT n.event_id, COALESCE(min(b.event_id), -1) AS next_id, "
        "COALESCE(n.nt, -1) AS next_ts FROM n LEFT JOIN b "
        "ON b.user_id = n.user_id AND b.t = n.nt GROUP BY 1, 3"
    )


def q_ks_drift(sf_dir: str):
    """Two-sample Kolmogorov–Smirnov drift between the click and view
    value distributions (stages/global_scan.py — range-partitioned
    distributed CDF scan: bucket totals tree → broadcast exclusive
    offsets → per-bucket vectorized max; exact integer arithmetic, the
    global CDF never materializes)."""
    import pyarrow.compute as pc

    from ..stages.global_scan import two_sample_ks

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b["event_type"],
                              value_set=pa.array(["click", "view"])))
        v = t["value"].to_numpy(zero_copy_only=False)
        isa = pc.equal(t["event_type"], "click").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "v6": pa.array(np.floor(v * 1e6 + 0.5).astype(np.int64),
                           pa.int64()),
            "isa": pa.array(isa, pa.int64())})

    ds = _read(sf_dir, "events", ["event_type", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return two_sample_ks(ds, "v6", "isa", n_rows=_nrows(sf_dir, "events"))


def q_ks_drift_sql() -> str:
    return (
        "WITH x AS (SELECT CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v, "
        "CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS isa "
        "FROM events WHERE event_type IN ('click', 'view')), "
        "t AS (SELECT CAST(sum(isa) AS BIGINT) AS n_a, "
        "CAST(count(*) - sum(isa) AS BIGINT) AS n_b FROM x), "
        "g AS (SELECT v, CAST(sum(isa) AS BIGINT) AS ca, "
        "CAST(count(*) - sum(isa) AS BIGINT) AS cb FROM x GROUP BY v), "
        "c AS (SELECT sum(ca) OVER (ORDER BY v) AS cca, "
        "sum(cb) OVER (ORDER BY v) AS ccb FROM g) "
        "SELECT CAST(max(abs(cca * (SELECT n_b FROM t) - "
        "ccb * (SELECT n_a FROM t))) AS BIGINT) AS d_scaled, "
        "(SELECT n_a FROM t) AS n_a, (SELECT n_b FROM t) AS n_b FROM c"
    )


def q_mom_revenue(sf_dir: str):
    """Month-over-month revenue deltas (the period-over-period
    reporting shape): one streaming pass pre-aggregates cent-quantized
    order totals per calendar month inside each batch, the bounded
    month space merges on the combiner tree, and the lag delta is a
    vectorized driver-side pass over the (tiny) month series —
    no shuffle anywhere."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def partial(b: pd.DataFrame) -> pa.Table:
        ym = (b["o_orderdate"].dt.year * 100
              + b["o_orderdate"].dt.month).to_numpy().astype(np.int64)
        cents = np.floor(b["o_totalprice"].to_numpy() * 100 + 0.5
                         ).astype(np.int64)
        t = pa.table({"ym": pa.array(ym), "rev_cents": pa.array(cents),
                      "n_orders": pa.array(np.ones(len(b), np.int64))})
        return (t.group_by(["ym"])
                 .aggregate([("rev_cents", "sum"), ("n_orders", "sum")])
                 .rename_columns(["ym", "rev_cents", "n_orders"]))

    parts = _read(sf_dir, "orders",
                  ["o_orderdate", "o_totalprice"]).map_batches(
        partial, batch_format="pandas")
    m = tree_aggregate_to_table(
        parts, ["ym"], [("rev_cents", "sum"), ("n_orders", "sum")]
    ).to_pandas().sort_values("ym", kind="mergesort").reset_index(
        drop=True)
    rev = m["rev_cents"].to_numpy().astype(np.int64)
    delta = np.zeros(len(m), np.int64)
    delta[1:] = rev[1:] - rev[:-1]
    m["delta_cents"] = delta
    m["ym"] = m["ym"].astype(np.int64)
    m["n_orders"] = m["n_orders"].astype(np.int64)
    return m


def q_mom_revenue_sql() -> str:
    return (
        "WITH m AS (SELECT CAST(year(o_orderdate) * 100 + "
        "month(o_orderdate) AS BIGINT) AS ym, "
        "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) "
        "AS BIGINT) AS rev_cents, CAST(count(*) AS BIGINT) AS n_orders "
        "FROM orders GROUP BY 1) "
        "SELECT ym, rev_cents, n_orders, "
        "CAST(COALESCE(rev_cents - lag(rev_cents) OVER (ORDER BY ym), 0) "
        "AS BIGINT) AS delta_cents FROM m"
    )


def q_cum_new_users(sf_dir: str):
    """Daily new-user counts with a cumulative total (the
    growth-accounting shape): per-batch Arrow group_by pre-reduces
    each user's min event time (the combiner — shuffle volume is
    distinct users per block, not rows), ONE coarse hash exchange on
    user_id finishes the global first-seen day, the bounded day space
    rides the combiner tree, and the cumulative sum is a vectorized
    pass over the tiny day series on the driver."""
    from ..stages.agg_tree import tree_aggregate_to_table
    from ..stages.scan import hash_bucket_scan

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"user_id": b["user_id"],
                      "t": b["ts"].cast(pa.int64())})
        return (t.group_by(["user_id"]).aggregate([("t", "min")])
                 .rename_columns(["user_id", "t"]))

    ds = _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
        partial, batch_format="pyarrow")

    def per_user_day(t: pa.Table) -> pa.Table:
        g = (t.group_by(["user_id"]).aggregate([("t", "min")])
              .rename_columns(["user_id", "t"]))
        day = g["t"].to_numpy() // 86_400_000_000
        c = pa.table({"day": pa.array(day),
                      "n_new": pa.array(np.ones(len(day), np.int64))})
        return (c.group_by(["day"]).aggregate([("n_new", "sum")])
                 .rename_columns(["day", "n_new"]))

    days = hash_bucket_scan(ds, ["user_id"], per_user_day)
    m = tree_aggregate_to_table(days, ["day"], [("n_new", "sum")]
                                ).to_pandas()
    m = m.sort_values("day", kind="mergesort").reset_index(drop=True)
    m["day"] = m["day"].astype(np.int64)
    m["n_new"] = m["n_new"].astype(np.int64)
    m["cum_users"] = m["n_new"].to_numpy().cumsum()
    return m


def q_cum_new_users_sql() -> str:
    return (
        "WITH f AS (SELECT user_id, min(epoch_us(ts)) // 86400000000 "
        "AS day FROM events GROUP BY 1), "
        "d AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new FROM f "
        "GROUP BY 1) "
        "SELECT day, n_new, CAST(sum(n_new) OVER (ORDER BY day) "
        "AS BIGINT) AS cum_users FROM d"
    )


def q_trend_slopes(sf_dir: str):
    """Per-user least-squares trend of event value over time, kept as
    the exact integer pair (slope_num, slope_den) = (n·Σxy − Σx·Σy,
    n·Σx² − (Σx)²) so the distributed result is bit-identical: x =
    whole hours since the user's first event (int), y = milli-quantized
    value.  One keyed_scan pass — the five moment sums are per-segment
    vectorized reductions; no float ever accumulates."""
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "y": pa.array(np.floor(v * 1e3 + 0.5
                                                ).astype(np.int64))})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        g = d.groupby("user_id", sort=False)
        tmin = g["t"].transform("min").to_numpy()
        x = (d["t"].to_numpy() - tmin) // 3_600_000_000
        y = d["y"].to_numpy()
        f = pd.DataFrame({"user_id": d["user_id"].to_numpy(),
                          "x": x, "y": y, "xy": x * y, "xx": x * x})
        s = (f.groupby("user_id", sort=False, as_index=False)
             .agg(n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
                  sxy=("xy", "sum"), sxx=("xx", "sum")))
        n = s["n"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "user_id": s["user_id"].to_numpy(),
            "slope_num": n * s["sxy"].to_numpy() -
            s["sx"].to_numpy() * s["sy"].to_numpy(),
            "slope_den": n * s["sxx"].to_numpy() -
            s["sx"].to_numpy() ** 2,
            "n": n})

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t", "event_id"],
                      fn=fn, n_rows=_nrows(sf_dir, "events"))


def q_trend_slopes_sql() -> str:
    return (
        "WITH p AS (SELECT user_id, epoch_us(ts) AS t, "
        "CAST(floor(value * 1000 + 0.5) AS BIGINT) AS y FROM events), "
        "x AS (SELECT user_id, (t - min(t) OVER (PARTITION BY user_id)) "
        "// 3600000000 AS x, y FROM p) "
        "SELECT user_id, CAST(count(*) * sum(x * y) - sum(x) * sum(y) "
        "AS BIGINT) AS slope_num, "
        "CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) "
        "AS slope_den, CAST(count(*) AS BIGINT) AS n "
        "FROM x GROUP BY user_id"
    )


def q_rolling_zscore(sf_dir: str):
    """Streaming anomaly flags: per user (ordered by ts, event_id), a
    point is anomalous when its squared z-score against the trailing
    11-row window (ROWS 10 PRECEDING..CURRENT, incl. itself) exceeds
    4 and the window holds ≥ 5 rows.  The test
    ``(v·n − s1)² > 4·(n·s2 − s1²)`` is pure int64 on milli-quantized
    values — no division, no float variance, so distributed runs are
    bit-identical.  Rolling sums are one global cumsum per bucket with
    per-segment window-start clamps (no per-key loop)."""
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "v": pa.array(np.floor(v * 1e3 + 0.5
                                                ).astype(np.int64))})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        v = d["v"].to_numpy()
        idx = np.arange(len(d), dtype=np.int64)
        first = np.r_[True, u[1:] != u[:-1]]
        seg_start = idx[first][np.cumsum(first) - 1]
        start = np.maximum(idx - 10, seg_start)
        c1 = np.concatenate(([0], np.cumsum(v)))
        c2 = np.concatenate(([0], np.cumsum(v * v)))
        s1 = c1[idx + 1] - c1[start]
        s2 = c2[idx + 1] - c2[start]
        n = idx - start + 1
        dev = v * n - s1
        anom = (n >= 5) & (dev * dev > 4 * (n * s2 - s1 * s1))
        return pd.DataFrame({
            "event_id": d["event_id"].to_numpy()[anom],
            "user_id": u[anom]})

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t", "event_id"],
                      fn=fn, n_rows=_nrows(sf_dir, "events"))


def q_rolling_zscore_sql() -> str:
    return (
        "WITH x AS (SELECT event_id, user_id, epoch_us(ts) AS t, "
        "CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v FROM events), "
        "w AS (SELECT event_id, user_id, v, sum(v) OVER win AS s1, "
        "sum(v * v) OVER win AS s2, count(*) OVER win AS n FROM x "
        "WINDOW win AS (PARTITION BY user_id ORDER BY t, event_id "
        "ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)) "
        "SELECT event_id, user_id FROM w WHERE n >= 5 AND "
        "(v * n - s1) * (v * n - s1) > 4 * (n * s2 - s1 * s1)"
    )


def q_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of the hourly event-count series (the
    seasonality probe): one distributed counting pass (combiner
    tree), then r₁ = Σ(N·x_t−S)(N·x_{t+1}−S) / Σ(N·x_t−S)² over the
    gap-filled hour range on the driver — N-scaled deviations keep
    every sum an exact Python bigint at any volume; one pinned double
    division at the end.  Missing hours count 0 (true gap-fill, like
    q_gap_fill)."""
    hc = _hourly_counts_table(sf_dir)
    h = hc["h"].to_numpy()
    full = np.arange(h.min(), h.max() + 1)
    x = np.zeros(len(full), np.int64)
    x[np.searchsorted(full, h)] = hc["x"].to_numpy()
    n = len(full)
    s = int(x.sum())
    z = [n * int(v) - s for v in x]
    num = sum(a * b for a, b in zip(z[:-1], z[1:]))
    den = sum(a * a for a in z)
    r1_nano = int(np.floor(float(num) / float(den) * 1e9 + 0.5))
    return pd.DataFrame({"n_hours": [np.int64(n)],
                         "r1_nano": [np.int64(r1_nano)]})


def q_autocorr_sql() -> str:
    return (
        "WITH c AS (SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) "
        "AS h, CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1), "
        "b AS (SELECT min(h) AS mn, max(h) AS mx FROM c), "
        "r AS (SELECT unnest(generate_series(mn, mx)) AS h FROM b), "
        "f AS MATERIALIZED (SELECT r.h, "
        "COALESCE(c.x, 0) AS x FROM r LEFT JOIN c ON r.h = c.h), "
        "s AS (SELECT CAST(count(*) AS HUGEINT) AS n, "
        "CAST(sum(x) AS HUGEINT) AS t FROM f), "
        "z AS MATERIALIZED (SELECT h, s.n * x - s.t AS z FROM f, s), "
        "num AS (SELECT CAST(sum(a.z * b.z) AS HUGEINT) AS num "
        "FROM z a JOIN z b ON b.h = a.h + 1), "
        "den AS (SELECT CAST(sum(z * z) AS HUGEINT) AS den FROM z) "
        "SELECT CAST(s.n AS BIGINT) AS n_hours, "
        "CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1e9 "
        "+ 0.5) AS BIGINT) AS r1_nano FROM s, num, den"
    )


def q_cusum_changepoint(sf_dir: str):
    """CUSUM changepoint detection over the hourly count series (the
    streaming drift alarm): the cumulative deviation n·S_t − t·S_n is
    an exact bigint per hour (no float drift over arbitrarily long
    series), and the changepoint is its |·| argmax with the earliest-
    hour tiebreak.  Counting pass distributed; the bounded hour table
    finalizes on the driver.  Output = (hour, deviation sign,
    |deviation|)."""
    hc = _hourly_counts_table(sf_dir)
    h = hc["h"].to_numpy()
    full = np.arange(h.min(), h.max() + 1)
    x = np.zeros(len(full), np.int64)
    x[np.searchsorted(full, h)] = hc["x"].to_numpy()
    n = len(full)
    s_n = int(x.sum())
    best = (-1, 0, 0)  # (|dev|, -h, dev)
    s_t = 0
    for t in range(n):
        s_t += int(x[t])
        dev = n * s_t - (t + 1) * s_n
        if abs(dev) > best[0]:
            best = (abs(dev), int(full[t]), dev)
    return pd.DataFrame({
        "cp_hour": [np.int64(best[1])],
        "dev_sign": [np.int64(1 if best[2] > 0 else
                              (-1 if best[2] < 0 else 0))],
        "dev_abs": [np.int64(best[0])]})


def q_cusum_changepoint_sql() -> str:
    return (
        "WITH c AS (SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) "
        "AS h, CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1), "
        "b AS (SELECT min(h) AS mn, max(h) AS mx FROM c), "
        "r AS (SELECT unnest(generate_series(mn, mx)) AS h FROM b), "
        "f AS MATERIALIZED (SELECT r.h, COALESCE(c.x, 0) AS x "
        "FROM r LEFT JOIN c ON r.h = c.h), "
        "s AS (SELECT CAST(count(*) AS HUGEINT) AS n, "
        "CAST(sum(x) AS HUGEINT) AS t FROM f), "
        "w AS (SELECT h, s.n * CAST(sum(x) OVER (ORDER BY h) "
        "AS HUGEINT) - CAST(row_number() OVER (ORDER BY h) "
        "AS HUGEINT) * s.t AS dev FROM f, s) "
        "SELECT h AS cp_hour, "
        "CAST(CASE WHEN dev > 0 THEN 1 WHEN dev < 0 THEN -1 "
        "ELSE 0 END AS BIGINT) AS dev_sign, "
        "CAST(abs(dev) AS BIGINT) AS dev_abs FROM w "
        "ORDER BY abs(dev) DESC, h LIMIT 1"
    )


def q_benford(sf_dir: str):
    """Benford first-digit screen over event value cents (the
    data-quality / fraud heuristic): observed digit counts are one
    bounded combiner-tree pass; expected counts n·log10(1+1/d) and
    the χ² = Σ(o−e)²/e statistic are fixed double sequences pinned
    per digit, summed exactly.  Output = the 9 digit rows plus the
    pinned per-digit χ² contribution."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        c = np.floor(b["value"].to_numpy(zero_copy_only=False)
                     * 100.0 + 0.5).astype(np.int64)
        c = c[c > 0]
        while True:  # leading digit via repeated tens reduction
            big = c >= 10
            if not big.any():
                break
            c = np.where(big, c // 10, c)
        t = pa.table({"d": pa.array(c, pa.int64()),
                      "o": pa.array(np.ones(len(c), np.int64))})
        return (t.group_by(["d"]).aggregate([("o", "sum")])
                .rename_columns(["d", "o"]))

    g = tree_aggregate_to_table(
        _read(sf_dir, "events", ["value"]).map_batches(
            partial, batch_format="pyarrow"),
        ["d"], [("o", "sum")]).to_pandas().sort_values("d")
    n = float(int(g["o"].sum()))
    d = g["d"].to_numpy().astype(np.float64)
    o = g["o"].to_numpy().astype(np.float64)
    e = n * (np.log(1.0 + 1.0 / d) / np.log(10.0))
    chi = (o - e) * (o - e) / e
    return pd.DataFrame({
        "d": g["d"].to_numpy().astype(np.int64),
        "o": g["o"].to_numpy().astype(np.int64),
        "chi_nano": np.floor(chi * 1e9 + 0.5).astype(np.int64)})


def q_benford_sql() -> str:
    return (
        "WITH p AS (SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) "
        "AS c FROM events), "
        # magnitude-independent leading digit (the engine reduces any
        # magnitude with a tens loop; a CASE capped at a fixed power
        # would silently break digit parity past its bound)
        "lead AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) "
        "AS BIGINT) AS d FROM p WHERE c > 0), "
        "g AS MATERIALIZED (SELECT d, CAST(count(*) AS BIGINT) AS o "
        "FROM lead GROUP BY 1), "
        "n AS (SELECT CAST(sum(o) AS DOUBLE) AS n FROM g) "
        "SELECT d, o, CAST(floor("
        "(CAST(o AS DOUBLE) - n.n * (ln(1.0 + 1.0 / "
        "CAST(d AS DOUBLE)) / ln(10.0))) * "
        "(CAST(o AS DOUBLE) - n.n * (ln(1.0 + 1.0 / "
        "CAST(d AS DOUBLE)) / ln(10.0))) / "
        "(n.n * (ln(1.0 + 1.0 / CAST(d AS DOUBLE)) / ln(10.0))) "
        "* 1e9 + 0.5) AS BIGINT) AS chi_nano FROM g, n"
    )


def q_emd1d(sf_dir: str):
    """1-D Wasserstein (earth-mover) distance between the value
    distributions of the two user-parity cohorts — the integral drift
    metric (q_ks_drift is the sup metric): per-(cent, cohort) counts
    on the combiner tree (cents are a bounded grid), then
    W₁ = Σ_bins |F₀−F₁|·Δ on the driver with cross-multiplied integer
    CDFs (|n₁·C₀ − n₀·C₁|·Δcents — exact bigints at any volume); the
    single normalizing division by n₀·n₁·100 pins to nano (unit:
    value, not cents)."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        c = np.floor(b["value"].to_numpy(zero_copy_only=False)
                     * 100.0 + 0.5).astype(np.int64)
        coh = (b["user_id"].to_numpy(zero_copy_only=False) % 2)
        t = pa.table({"c": pa.array(c), "coh": pa.array(coh),
                      "n": pa.array(np.ones(len(c), np.int64))})
        return (t.group_by(["c", "coh"]).aggregate([("n", "sum")])
                .rename_columns(["c", "coh", "n"]))

    g = tree_aggregate_to_table(
        _read(sf_dir, "events", ["user_id", "value"]).map_batches(
            partial, batch_format="pyarrow"),
        ["c", "coh"], [("n", "sum")]).to_pandas()
    cents = np.unique(g["c"].to_numpy())
    n0g = g[g["coh"] == 0].set_index("c")["n"]
    n1g = g[g["coh"] == 1].set_index("c")["n"]
    x0 = n0g.reindex(cents, fill_value=0).to_numpy().astype(object)
    x1 = n1g.reindex(cents, fill_value=0).to_numpy().astype(object)
    n0, n1 = int(sum(x0)), int(sum(x1))
    total = 0
    c0 = c1 = 0
    for i in range(len(cents) - 1):
        c0 += int(x0[i])
        c1 += int(x1[i])
        total += abs(n1 * c0 - n0 * c1) * int(cents[i + 1] - cents[i])
    w1_nano = int(np.floor(float(total) / float(n0 * n1)
                           / 100.0 * 1e9 + 0.5))
    return pd.DataFrame({"n0": [np.int64(n0)], "n1": [np.int64(n1)],
                         "w1_nano": [np.int64(w1_nano)]})


def q_emd1d_sql() -> str:
    return (
        "WITH p AS (SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) "
        "AS c, user_id % 2 AS coh FROM events), "
        "g AS MATERIALIZED (SELECT c, "
        "CAST(sum(CASE WHEN coh = 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS x0, "
        "CAST(sum(CASE WHEN coh = 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS x1 FROM p GROUP BY 1), "
        "n AS (SELECT CAST(sum(x0) AS HUGEINT) AS n0, "
        "CAST(sum(x1) AS HUGEINT) AS n1 FROM g), "
        "w AS (SELECT c, "
        "CAST(sum(x0) OVER (ORDER BY c) AS HUGEINT) AS c0, "
        "CAST(sum(x1) OVER (ORDER BY c) AS HUGEINT) AS c1, "
        "lead(c) OVER (ORDER BY c) AS nxt FROM g), "
        "t AS (SELECT CAST(sum(abs(n.n1 * c0 - n.n0 * c1) "
        "* (nxt - c)) AS HUGEINT) AS total FROM w, n "
        "WHERE nxt IS NOT NULL) "
        "SELECT CAST(n.n0 AS BIGINT) AS n0, "
        "CAST(n.n1 AS BIGINT) AS n1, "
        "CAST(floor(CAST(total AS DOUBLE) / "
        "CAST(n.n0 * n.n1 AS DOUBLE) / 100.0 * 1e9 + 0.5) AS BIGINT) "
        "AS w1_nano FROM t, n"
    )


def _typed_hourly_counts(sf_dir: str) -> pd.DataFrame:
    """Per-(event_type, hour) counts via one combiner-tree pass —
    bounded key space (types × fixture hour range), shared by the
    round-5 smoothing/seasonality queries."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def bucket(b: pa.Table) -> pa.Table:
        h = (b["ts"].to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64) // 3_600_000_000)
        t = pa.table({"event_type": b["event_type"],
                      "h": pa.array(h, pa.int64()),
                      "x": pa.array(np.ones(len(h), np.int64), pa.int64())})
        return (t.group_by(["event_type", "h"]).aggregate([("x", "sum")])
                .rename_columns(["event_type", "h", "x"]))

    return tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_type", "ts"]).map_batches(
            bucket, batch_format="pyarrow"),
        ["event_type", "h"], [("x", "sum")]).to_pandas()


def q_ewma_hourly(sf_dir: str):
    """Exponentially-weighted moving average of the hourly event rate
    per type (α = 1/4), sampled at the end of each day — the smoothing
    pass of a streaming rate monitor.  The unbounded work (hour
    bucketing + counting) is one combiner-tree pass; the recursion
    runs driver-side over the BOUNDED (types × hours) grid with
    zero-filled gaps, mirroring the oracle's recursive CTE term by
    term (s ← 0.25·x + 0.75·s, same op order), and outputs pin to
    micro-units."""
    g = _typed_hourly_counts(sf_dir)
    h0 = int(g["h"].min())
    h1 = int(g["h"].max())
    span = h1 - h0 + 1
    rows = []
    for et, sub in g.groupby("event_type", sort=False):
        x = np.zeros(span, np.float64)
        x[sub["h"].to_numpy(np.int64) - h0] = sub["x"].to_numpy(
            np.float64)
        s = x[0]
        for i in range(1, span):
            s = 0.25 * x[i] + 0.75 * s
            if i % 24 == 23:
                rows.append((et, i, int(np.floor(s * 1e6 + 0.5))))
    out = pd.DataFrame(rows, columns=["event_type", "i", "ewma_micro"])
    out["i"] = out["i"].astype(np.int64)
    out["ewma_micro"] = out["ewma_micro"].astype(np.int64)
    return out.reset_index(drop=True)


def q_ewma_hourly_sql() -> str:
    return (
        "WITH RECURSIVE b AS (SELECT event_type, epoch_us(ts) // "
        "3600000000 AS h FROM events), "
        "rng AS (SELECT min(h) AS h0, max(h) AS h1 FROM b), "
        "hours AS (SELECT unnest(range((SELECT h0 FROM rng), "
        "(SELECT h1 FROM rng) + 1)) AS h), "
        "types AS (SELECT DISTINCT event_type FROM b), "
        "grid AS (SELECT event_type, h FROM types CROSS JOIN hours), "
        "q AS (SELECT event_type, h, CAST(count(*) AS DOUBLE) AS cnt "
        "FROM b GROUP BY 1, 2), "
        "c AS (SELECT g.event_type, COALESCE(q.cnt, 0.0) AS x, "
        "g.h - (SELECT h0 FROM rng) AS i FROM grid g LEFT JOIN q "
        "ON q.event_type = g.event_type AND q.h = g.h), "
        "r AS (SELECT event_type, i, x AS s FROM c WHERE i = 0 "
        "UNION ALL SELECT c.event_type, c.i, 0.25 * c.x + 0.75 * r.s "
        "FROM r JOIN c ON c.event_type = r.event_type AND c.i = r.i + 1) "
        "SELECT event_type, CAST(i AS BIGINT) AS i, "
        "CAST(floor(s * 1e6 + 0.5) AS BIGINT) AS ewma_micro "
        "FROM r WHERE i % 24 = 23"
    )


def q_hourly_seasonality(sf_dir: str):
    """Hour-of-day seasonal index per event type: the share of a
    type's events in each UTC hour slot, scaled so a flat profile
    reads 1e6 — pure integer arithmetic ((n·24·10⁶) // total), so the
    distributed result is exact.  Counts ride the combiner tree
    (bounded types × 24 key space); the index math is a bounded
    driver fold."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def bucket(b: pa.Table) -> pa.Table:
        h = (b["ts"].to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64)
             // 3_600_000_000) % 24
        t = pa.table({"event_type": b["event_type"],
                      "hod": pa.array(h, pa.int64()),
                      "n": pa.array(np.ones(len(h), np.int64), pa.int64())})
        return (t.group_by(["event_type", "hod"]).aggregate([("n", "sum")])
                .rename_columns(["event_type", "hod", "n"]))

    g = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_type", "ts"]).map_batches(
            bucket, batch_format="pyarrow"),
        ["event_type", "hod"], [("n", "sum")]).to_pandas()
    tot = g.groupby("event_type")["n"].transform("sum").to_numpy(np.int64)
    n = g["n"].to_numpy(np.int64)
    return pd.DataFrame({
        "event_type": g["event_type"].astype(str),
        "hod": g["hod"].to_numpy(np.int64),
        "n": n,
        "idx_micro": (n * 24_000_000) // tot,
    }).reset_index(drop=True)


def q_hourly_seasonality_sql() -> str:
    return (
        "WITH c AS (SELECT event_type, (epoch_us(ts) // 3600000000) % 24 "
        "AS hod, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2) "
        "SELECT event_type, hod, n, "
        "CAST((n * 24000000) // sum(n) OVER (PARTITION BY event_type) "
        "AS BIGINT) AS idx_micro FROM c"
    )


def q_seasonal_error(sf_dir: str):
    """Seasonal-naive forecast error per event type: predict each
    hour's count with the same hour yesterday (lag 24) over the
    zero-filled hourly grid and report Σ|x_t − x_{t−24}| and Σx_t as
    exact ints (the scale-free WAPE numerator/denominator).  Same
    bounded-grid posture as q_ewma_hourly: the only unbounded pass is
    the combiner-tree count."""
    g = _typed_hourly_counts(sf_dir)
    h0 = int(g["h"].min())
    h1 = int(g["h"].max())
    span = h1 - h0 + 1
    rows = []
    for et, sub in g.groupby("event_type", sort=False):
        x = np.zeros(span, np.int64)
        x[sub["h"].to_numpy(np.int64) - h0] = sub["x"].to_numpy(np.int64)
        if span > 24:  # spans ≤ 24h have no lag-24 rows (oracle: WHERE
            sae = int(np.abs(x[24:] - x[:-24]).sum())  # p IS NOT NULL)
            tot = int(x[24:].sum())
            rows.append((et, sae, tot))
    out = pd.DataFrame(rows, columns=["event_type", "sae", "actual_sum"])
    out["sae"] = out["sae"].astype(np.int64)
    out["actual_sum"] = out["actual_sum"].astype(np.int64)
    return out.reset_index(drop=True)


def q_seasonal_error_sql() -> str:
    return (
        "WITH b AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h "
        "FROM events), "
        "rng AS (SELECT min(h) AS h0, max(h) AS h1 FROM b), "
        "hours AS (SELECT unnest(range((SELECT h0 FROM rng), "
        "(SELECT h1 FROM rng) + 1)) AS h), "
        "types AS (SELECT DISTINCT event_type FROM b), "
        "grid AS (SELECT event_type, h FROM types CROSS JOIN hours), "
        "q AS (SELECT event_type, h, CAST(count(*) AS BIGINT) AS n "
        "FROM b GROUP BY 1, 2), "
        "c AS (SELECT g.event_type, g.h, COALESCE(q.n, 0) AS x "
        "FROM grid g LEFT JOIN q ON q.event_type = g.event_type "
        "AND q.h = g.h), "
        "l AS (SELECT event_type, h, x, lag(x, 24) OVER (PARTITION BY "
        "event_type ORDER BY h) AS p FROM c) "
        "SELECT event_type, CAST(COALESCE(sum(abs(x - p)), 0) AS BIGINT) "
        "AS sae, CAST(COALESCE(sum(x), 0) AS BIGINT) AS actual_sum "
        "FROM l WHERE p IS NOT NULL GROUP BY 1"
    )


_DTW_L = 12


def _paired_series(sf_dir: str, L: int):
    """(pair, side, pos, v) rows of each user's first-L cent-pinned
    value series (sides = user parity, pair = user_id // 2; users with
    fewer than L events are dropped) via one user-keyed hash-bucket
    exchange — the shared extraction of q_dtw_pairs and
    q_hausdorff_pairs (one copy, so the pairing derivation cannot
    desynchronize across the family)."""
    from ..stages.scan import hash_bucket_scan

    n_ev = _nrows(sf_dir, "events")

    def prep(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b["user_id"],
            "event_id": b["event_id"],
            "v": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
        })

    def head_l(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        e = t["event_id"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, u))
        u, v = u[order], v[order]
        new_u = np.ones(len(u), dtype=bool)
        new_u[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new_u)
        sizes = np.diff(np.append(starts, len(u)))
        pos = np.arange(len(u), dtype=np.int64) - np.repeat(starts, sizes)
        keep = (pos < L) & np.repeat(sizes >= L, sizes)
        u, v, pos = u[keep], v[keep], pos[keep]
        return pa.table({"pair": pa.array(u // 2),
                         "side": pa.array(u % 2),
                         "pos": pa.array(pos), "v": pa.array(v)})

    return hash_bucket_scan(
        _read(sf_dir, "events",
              ["user_id", "event_id", "value"]).map_batches(
            prep, batch_format="pyarrow"),
        ["user_id"], head_l, n_rows=n_ev)


def q_dtw_pairs(sf_dir: str):
    """DYNAMIC TIME WARPING distance between paired user value-series
    (users 2k vs 2k+1, each series = its first L=12 events by
    event_id, values pinned to cents) — the classic elastic
    time-series similarity the suite's pointwise metrics can't
    express.  Distributed shape: one user-keyed hash-bucket exchange
    extracts each series head (sort + run-head slice, vectorized),
    one pair-keyed exchange co-locates the two sides, and the DP
    itself runs as a wavefront VECTORIZED ACROSS PAIRS inside the
    bucket task — L² numpy ops on (n_pairs,)-vectors, never a Python
    loop over pairs; per-pair state is bounded (L² ints) at any
    corpus size.  All-integer costs ⇒ exact.  Oracle = a recursive
    CTE advancing one anti-diagonal per iteration, carrying the
    previous diagonal via age-tagged re-emission."""
    from ..stages.scan import hash_bucket_scan

    L = _DTW_L
    n_ev = _nrows(sf_dir, "events")
    series = _paired_series(sf_dir, L)

    def dp_fn(t: pa.Table) -> pa.Table:
        p = t["pair"].to_numpy(zero_copy_only=False)
        s = t["side"].to_numpy(zero_copy_only=False)
        pos = t["pos"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, s, p))
        p, v = p[order], v[order]
        new_p = np.ones(len(p), dtype=bool)
        new_p[1:] = p[1:] != p[:-1]
        starts = np.flatnonzero(new_p)
        sizes = np.diff(np.append(starts, len(p)))
        full = sizes == 2 * L   # both sides present and complete
        keep = np.repeat(full, sizes)
        p, v = p[keep], v[keep]
        if not len(p):
            return pa.table({"pair": pa.array([], pa.int64()),
                             "dtw": pa.array([], pa.int64())})
        n_pairs = len(p) // (2 * L)
        arr = v.reshape(n_pairs, 2, L)
        a, b = arr[:, 0, :], arr[:, 1, :]
        cost = np.abs(a[:, :, None] - b[:, None, :])
        dp = np.empty((n_pairs, L, L), np.int64)
        dp[:, 0, 0] = cost[:, 0, 0]
        for j in range(1, L):
            dp[:, 0, j] = dp[:, 0, j - 1] + cost[:, 0, j]
        for i in range(1, L):
            dp[:, i, 0] = dp[:, i - 1, 0] + cost[:, i, 0]
            for j in range(1, L):
                dp[:, i, j] = cost[:, i, j] + np.minimum(
                    np.minimum(dp[:, i - 1, j], dp[:, i, j - 1]),
                    dp[:, i - 1, j - 1])
        return pa.table({"pair": pa.array(p[::2 * L]),
                         "dtw": pa.array(dp[:, L - 1, L - 1])})

    return hash_bucket_scan(series, ["pair"], dp_fn,
                            n_rows=max(n_ev // (2 * L), 1))


def q_dtw_pairs_sql() -> str:
    L = _DTW_L
    return (
        "WITH RECURSIVE "
        "ev AS (SELECT user_id, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v, "
        "row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1"
        " AS pos FROM events), "
        f"s0 AS (SELECT * FROM ev WHERE pos < {L}), "
        "full_u AS (SELECT user_id FROM s0 GROUP BY 1 "
        f"HAVING count(*) = {L}), "
        "s AS (SELECT s0.user_id // 2 AS pair, s0.user_id % 2 AS side, "
        "pos, v FROM s0 JOIN full_u ON full_u.user_id = s0.user_id), "
        "cost AS (SELECT a.pair, a.pos AS i, b.pos AS j, "
        "abs(a.v - b.v) AS c FROM s a JOIN s b ON b.pair = a.pair "
        "AND a.side = 0 AND b.side = 1), "
        "dp AS (SELECT pair, i, j, c AS d, 0 AS age FROM cost "
        "WHERE i = 0 AND j = 0 "
        "UNION ALL SELECT * FROM ("
        "SELECT pair, i, j, d, 1 AS age FROM dp "
        f"WHERE age = 0 AND i + j < {2 * L - 2} "
        "UNION ALL "
        "SELECT c.pair, c.i, c.j, c.c + min(p.d) AS d, 0 AS age "
        "FROM cost c JOIN dp p ON p.pair = c.pair AND ("
        "(p.age = 0 AND ((p.i = c.i - 1 AND p.j = c.j) "
        "OR (p.i = c.i AND p.j = c.j - 1))) "
        "OR (p.age = 1 AND p.i = c.i - 1 AND p.j = c.j - 1)) "
        "WHERE c.i + c.j = (SELECT max(q.i + q.j) FROM dp q "
        "WHERE q.age = 0) + 1 "
        "GROUP BY c.pair, c.i, c.j, c.c)) "
        "SELECT pair, CAST(d AS BIGINT) AS dtw FROM dp "
        f"WHERE i = {L - 1} AND j = {L - 1} AND age = 0"
    )


def q_mann_kendall(sf_dir: str):
    """MANN-KENDALL trend statistic per user — the non-parametric
    trend test (S = Σ_{i<j} sign(y_j − y_i) over the time-ordered
    series): pure int64, so exact at any partitioning.  One
    keyed_scan pass; the within-user pair expansion is the vectorized
    _intra_run_pairs chunker (per-key cardinality bounded by design —
    user-sized, not table-sized).  Emits (user_id, s_stat, n_pairs);
    oracle = a per-user self-join on the same (t, event_id) order."""
    from ..stages.scan import keyed_scan
    from ._common import _intra_run_pairs

    def prep(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "y": pa.array(np.floor(v * 1e3 + 0.5
                                                ).astype(np.int64))})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        y = d["y"].to_numpy()
        uniq, codes = np.unique(u, return_inverse=True)
        s = np.zeros(len(uniq), np.int64)
        npairs = np.zeros(len(uniq), np.int64)
        for ig, jg in _intra_run_pairs(u):
            sg = np.sign(y[jg] - y[ig])
            np.add.at(s, codes[ig], sg)
            np.add.at(npairs, codes[ig], np.ones(len(ig), np.int64))
        keep = npairs > 0     # single-event users have no pairs —
        # the self-join oracle never emits them
        return pd.DataFrame({"user_id": uniq[keep], "s_stat": s[keep],
                             "n_pairs": npairs[keep]})

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t", "event_id"],
                      fn=fn, n_rows=_nrows(sf_dir, "events"))


def q_mann_kendall_sql() -> str:
    return (
        "WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        "CAST(floor(value * 1000 + 0.5) AS BIGINT) AS y FROM events) "
        "SELECT a.user_id, "
        "CAST(sum(sign(b.y - a.y)) AS BIGINT) AS s_stat, "
        "CAST(count(*) AS BIGINT) AS n_pairs "
        "FROM p a JOIN p b ON b.user_id = a.user_id "
        "AND (a.t < b.t OR (a.t = b.t AND a.event_id < b.event_id)) "
        "GROUP BY 1"
    )


def q_theilsen_slope(sf_dir: str):
    """THEIL-SEN robust trend per user: the LOWER MEDIAN of all
    pairwise slopes (y_j − y_i)/(x_j − x_i) with x = whole hours since
    the user's first event (ties on x skipped), pinned as
    floor(slope·10⁶ + 0.5).  The slope set is built by the same
    bounded per-key pair chunker as q_mann_kendall, then one
    (user, slope) lexsort + segment pick — no per-user Python.  The
    float division and the microint pin are identical expressions on
    both sides; the lower median (element (m−1)//2 of the sorted
    slopes) avoids even-count averaging.  Oracle = self-join +
    row_number picked at (m−1)//2 + 1."""
    from ..stages.scan import keyed_scan
    from ._common import _intra_run_pairs

    def prep(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "y": pa.array(np.floor(v * 1e3 + 0.5
                                                ).astype(np.int64))})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        g = d.groupby("user_id", sort=False)
        tmin = g["t"].transform("min").to_numpy()
        x = (d["t"].to_numpy() - tmin) // 3_600_000_000
        y = d["y"].to_numpy()
        us, ss = [], []
        for ig, jg in _intra_run_pairs(u):
            dx = x[jg] - x[ig]
            ok = dx != 0
            us.append(u[ig][ok])
            ss.append((y[jg][ok] - y[ig][ok]).astype(np.float64)
                      / dx[ok].astype(np.float64))
        if not us:
            return pd.DataFrame({"user_id": [], "slope_micro": [],
                                 "n_slopes": []}).astype(np.int64)
        uu = np.concatenate(us)
        sl = np.concatenate(ss)
        order = np.lexsort((sl, uu))
        uu, sl = uu[order], sl[order]
        new_u = np.ones(len(uu), dtype=bool)
        new_u[1:] = uu[1:] != uu[:-1]
        starts = np.flatnonzero(new_u)
        sizes = np.diff(np.append(starts, len(uu)))
        med = sl[starts + (sizes - 1) // 2]
        return pd.DataFrame({
            "user_id": uu[starts],
            "slope_micro": np.floor(med * 1e6 + 0.5).astype(np.int64),
            "n_slopes": sizes.astype(np.int64)})

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t", "event_id"],
                      fn=fn, n_rows=_nrows(sf_dir, "events"))


def q_theilsen_slope_sql() -> str:
    return (
        "WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        "CAST(floor(value * 1000 + 0.5) AS BIGINT) AS y FROM events), "
        "x AS (SELECT user_id, event_id, t, (t - min(t) OVER "
        "(PARTITION BY user_id)) // 3600000000 AS x, y FROM p), "
        "sl AS (SELECT a.user_id, "
        "CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS s "
        "FROM x a JOIN x b ON b.user_id = a.user_id "
        "AND (a.t < b.t OR (a.t = b.t AND a.event_id < b.event_id)) "
        "WHERE b.x <> a.x), "
        "r AS (SELECT user_id, s, row_number() OVER "
        "(PARTITION BY user_id ORDER BY s) AS rn, "
        "count(*) OVER (PARTITION BY user_id) AS m FROM sl) "
        "SELECT user_id, "
        "CAST(floor(s * 1e6 + 0.5) AS BIGINT) AS slope_micro, "
        "CAST(m AS BIGINT) AS n_slopes "
        "FROM r WHERE rn = (m - 1) // 2 + 1"
    )


_LTTB_B = 6


def q_lttb_downsample(sf_dir: str):
    """LARGEST-TRIANGLE-THREE-BUCKETS downsampling of each user's
    value series to B=6 points — the standard time-series
    visualization reducer, made EXACT by clearing the next-bucket
    average's denominator: the winner of bucket k maximizes
    |((cx−px)·(Sy−m·py) − (cy−py)·(Sx−m·px))| against the previous
    selection (px,py) and the next bucket's integer SUMS (Sx,Sy,m) —
    all int64, ties → lowest x via the packed key area·2²⁰+(2²⁰−1−x).
    One keyed_scan pass; the B−2 sequential selections run as
    vectorized waves ACROSS users (np.maximum.at segmented argmax),
    never a per-user loop.  Users with n < B are dropped on both
    sides.  Oracle = a recursive CTE carrying the previous selection,
    one bucket per iteration (the q_dtw_pairs pattern)."""
    from ..stages.scan import keyed_scan

    B = _LTTB_B

    def prep(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "y": pa.array(np.floor(v * 100.0 + 0.5
                                                ).astype(np.int64))})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        y = d["y"].to_numpy()
        uniq, codes = np.unique(u, return_inverse=True)
        nu = len(uniq)
        starts = np.r_[0, 1 + np.flatnonzero(u[1:] != u[:-1])]
        sizes = np.diff(np.r_[starts, len(u)])
        x = np.arange(len(u), dtype=np.int64) - np.repeat(starts, sizes)
        n = np.repeat(sizes, sizes)
        ok = n >= B
        k = np.where(x == 0, 0,
                     np.where(x == n - 1, B - 1,
                              1 + (x - 1) * (B - 2) // np.maximum(n - 2, 1)))
        cnt = np.zeros((nu, B), np.int64)
        sx = np.zeros((nu, B), np.int64)
        sy = np.zeros((nu, B), np.int64)
        np.add.at(cnt, (codes[ok], k[ok]), 1)
        np.add.at(sx, (codes[ok], k[ok]), x[ok])
        np.add.at(sy, (codes[ok], k[ok]), y[ok])
        keep_u = sizes >= B
        sel_x = np.zeros(nu, np.int64)
        sel_y = np.zeros(nu, np.int64)
        sel_y[:] = y[starts]
        rows_u = [uniq[keep_u]]
        rows_k = [np.zeros(int(keep_u.sum()), np.int64)]
        rows_x = [np.zeros(int(keep_u.sum()), np.int64)]
        rows_y = [y[starts][keep_u]]
        for kk in range(1, B - 1):
            mask = ok & (k == kk)
            cu, cx, cy = codes[mask], x[mask], y[mask]
            px, py = sel_x[cu], sel_y[cu]
            m = cnt[cu, kk + 1]
            nsx, nsy = sx[cu, kk + 1], sy[cu, kk + 1]
            area = np.abs((cx - px) * (nsy - m * py)
                          - (cy - py) * (nsx - m * px))
            key = area * 1048576 + (1048575 - cx)
            best = np.full(nu, -1, np.int64)
            np.maximum.at(best, cu, key)
            win = key == best[cu]
            sel_x[cu[win]] = cx[win]
            sel_y[cu[win]] = cy[win]
            rows_u.append(uniq[cu[win]])
            rows_k.append(np.full(int(win.sum()), kk, np.int64))
            rows_x.append(cx[win])
            rows_y.append(cy[win])
        last = ok & (x == n - 1)
        rows_u.append(uniq[codes[last]])
        rows_k.append(np.full(int(last.sum()), B - 1, np.int64))
        rows_x.append(x[last])
        rows_y.append(y[last])
        return pd.DataFrame({"user_id": np.concatenate(rows_u),
                             "k": np.concatenate(rows_k),
                             "x": np.concatenate(rows_x),
                             "y": np.concatenate(rows_y)})

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t", "event_id"],
                      fn=fn, n_rows=_nrows(sf_dir, "events"))


def q_lttb_downsample_sql() -> str:
    B = _LTTB_B
    return (
        "WITH RECURSIVE "
        "p0 AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y FROM events), "
        "p AS (SELECT user_id, y, row_number() OVER "
        "(PARTITION BY user_id ORDER BY t, event_id) - 1 AS x, "
        "count(*) OVER (PARTITION BY user_id) AS n FROM p0), "
        f"b AS (SELECT * , CASE WHEN x = 0 THEN 0 "
        f"WHEN x = n - 1 THEN {B - 1} "
        f"ELSE 1 + (x - 1) * {B - 2} // (n - 2) END AS k "
        f"FROM p WHERE n >= {B}), "
        "bs AS (SELECT user_id, k, sum(x) AS sx, sum(y) AS sy, "
        "count(*) AS m FROM b GROUP BY 1, 2), "
        "cand AS (SELECT b.user_id, b.x, b.y, b.k, nb.sx, nb.sy, nb.m "
        "FROM b JOIN bs nb ON nb.user_id = b.user_id "
        f"AND nb.k = b.k + 1 WHERE b.k BETWEEN 1 AND {B - 2}), "
        "dp AS (SELECT user_id, 0 AS k, x, y FROM b WHERE k = 0 "
        "UNION ALL "
        "SELECT user_id, k, x, y FROM ("
        "SELECT q.user_id, q.k, q.x, q.y, row_number() OVER "
        "(PARTITION BY q.user_id ORDER BY q.key DESC) AS rn FROM ("
        "SELECT pv.user_id, pv.k + 1 AS k, c.x, c.y, "
        "abs((c.x - pv.x) * (c.sy - c.m * pv.y) "
        "- (c.y - pv.y) * (c.sx - c.m * pv.x)) * 1048576 "
        "+ (1048575 - c.x) AS key "
        "FROM dp pv JOIN cand c ON c.user_id = pv.user_id "
        f"AND c.k = pv.k + 1 WHERE pv.k + 1 <= {B - 2}) q) "
        "WHERE rn = 1) "
        "SELECT user_id, CAST(k AS BIGINT) AS k, x, y FROM dp "
        f"UNION ALL SELECT user_id, {B - 1}, x, y FROM b "
        f"WHERE k = {B - 1}"
    )


def q_interval_stab(sf_dir: str):
    """INTERVAL STABBING counts — for every distinct order day, how
    many order validity intervals [day, day + (key%30)+1] cover it —
    the classic sweep-line shape done as pure boundary counting: each
    interval emits (+1 at start, −1 at end+1), the per-day deltas ride
    the combiner tree (day domain is bounded), and the prefix sum +
    probe lookup fold on the driver over the tiny boundary table
    (searchsorted — no join).  Exact ints; the oracle is the naive
    inequality join, so the sweep and the O(n·probes) definition are
    proven equal."""
    from ..stages.agg_tree import tree_aggregate_to_table

    DAY_US = 86_400_000_000

    def deltas(b: pa.Table) -> pa.Table:
        s = (b["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // DAY_US)
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        e1 = s + (k % 30 + 1) + 1
        t = pa.table({"day": pa.array(np.concatenate([s, e1])),
                      "delta": pa.array(np.concatenate(
                          [np.ones(len(s), np.int64),
                           -np.ones(len(s), np.int64)])),
                      "probe": pa.array(np.concatenate(
                          [np.ones(len(s), np.int64),
                           np.zeros(len(s), np.int64)]))})
        g = t.group_by(["day"]).aggregate([("delta", "sum"),
                                           ("probe", "max")])
        return g.rename_columns(["day", "delta", "probe"])

    tab = tree_aggregate_to_table(
        _read(sf_dir, "orders",
              ["o_orderkey", "o_orderdate"]).map_batches(
            deltas, batch_format="pyarrow"),
        ["day"], [("delta", "sum"), ("probe", "max")]).to_pandas()
    tab = tab.sort_values("day", kind="mergesort").reset_index(drop=True)
    days = tab["day"].to_numpy()
    n_open = np.cumsum(tab["delta"].to_numpy())
    probes = days[tab["probe"].to_numpy() > 0]
    idx = np.searchsorted(days, probes, side="right") - 1
    return pd.DataFrame({"d": probes, "n_open": n_open[idx]})


def q_interval_stab_sql() -> str:
    return (
        "WITH iv AS (SELECT epoch_us(o_orderdate) // 86400000000 AS s, "
        "epoch_us(o_orderdate) // 86400000000 + (o_orderkey % 30 + 1) "
        "AS e FROM orders), "
        "probes AS (SELECT DISTINCT s AS d FROM iv) "
        "SELECT d, CAST(count(*) AS BIGINT) AS n_open "
        "FROM probes p JOIN iv ON iv.s <= p.d AND p.d <= iv.e "
        "GROUP BY 1"
    )


_XCORR_LAGS = 6


def q_xcorr_lags(sf_dir: str):
    """LAGGED CROSS-CORRELATION between the 'click' and 'purchase'
    hourly count series — the lead/lag discovery primitive (does one
    stream anticipate the other?): for every lag ℓ ∈ [−6, 6], the
    exact int64 dot product Σ_h click(h)·purchase(h+ℓ) over the
    bounded hourly grid.  One combiner-tree pass builds both series
    (per-(type, hour) partials); the 13 dots fold on the driver over
    the tiny grid.  Pure counts ⇒ exact.  Oracle = a shifted
    self-join of the hourly count CTE."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def bucket(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "click") | (et == "purchase")
        ts = b["ts"].to_numpy(zero_copy_only=False)[keep]
        h = ts.astype("datetime64[us]").astype(np.int64) // 3_600_000_000
        t = pa.table({"et": pa.array(et[keep]),
                      "h": pa.array(h, pa.int64()),
                      "x": pa.array(np.ones(len(h), np.int64))})
        return (t.group_by(["et", "h"]).aggregate([("x", "sum")])
                .rename_columns(["et", "h", "x"]))

    tab = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_type", "ts"]).map_batches(
            bucket, batch_format="pyarrow"),
        ["et", "h"], [("x", "sum")]).to_pandas()
    a = tab[tab["et"] == "click"].set_index("h")["x"]
    b = tab[tab["et"] == "purchase"].set_index("h")["x"]
    lags = np.arange(-_XCORR_LAGS, _XCORR_LAGS + 1, dtype=np.int64)
    dots = []
    for lag in lags:
        shifted = b.copy()
        shifted.index = shifted.index - lag
        j = a.to_frame("a").join(shifted.to_frame("b"), how="inner")
        dots.append(int((j["a"].to_numpy()
                         * j["b"].to_numpy()).sum()))
    return pd.DataFrame({"lag": lags,
                         "dot": np.array(dots, np.int64)})


def q_xcorr_lags_sql() -> str:
    L = _XCORR_LAGS
    return (
        "WITH c AS (SELECT event_type AS et, "
        "epoch_us(ts) // 3600000000 AS h, count(*) AS x FROM events "
        "WHERE event_type IN ('click', 'purchase') GROUP BY 1, 2), "
        # LEFT JOIN keeps every lag total: a fixture with one of the
        # two series absent must yield 13 zero rows, like the engine
        f"d AS (SELECT lag, sum(a.x * b.x) AS dot "
        f"FROM range(-{L}, {L + 1}) t(lag) "
        "JOIN c a ON a.et = 'click' "
        "JOIN c b ON b.et = 'purchase' AND b.h = a.h + lag "
        "GROUP BY 1) "
        f"SELECT t2.lag, CAST(COALESCE(d.dot, 0) AS BIGINT) AS dot "
        f"FROM range(-{L}, {L + 1}) t2(lag) "
        "LEFT JOIN d ON d.lag = t2.lag"
    )


def q_hausdorff_pairs(sf_dir: str):
    """Discrete HAUSDORFF DISTANCE between paired user value-series
    (the order-insensitive companion of q_dtw_pairs, same
    _paired_series extraction): H = max(h(A→B), h(B→A)) with
    h(A→B) = max_a min_b (a−b)² — exact int64 squared cents.  The
    per-pair max-min folds run vectorized across all pairs in the
    bucket (one (n_pairs, L, L) squared-difference tensor).  Oracle =
    two plain min-then-max aggregations — no recursion needed."""
    from ..stages.scan import hash_bucket_scan

    L = _DTW_L
    series = _paired_series(sf_dir, L)

    def fold(t: pa.Table) -> pa.Table:
        p = t["pair"].to_numpy(zero_copy_only=False)
        s = t["side"].to_numpy(zero_copy_only=False)
        pos = t["pos"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, s, p))
        p, v = p[order], v[order]
        new_p = np.ones(len(p), dtype=bool)
        new_p[1:] = p[1:] != p[:-1]
        starts = np.flatnonzero(new_p)
        sizes = np.diff(np.append(starts, len(p)))
        full = sizes == 2 * L
        keep = np.repeat(full, sizes)
        p, v = p[keep], v[keep]
        if not len(p):
            return pa.table({"pair": pa.array([], pa.int64()),
                             "hausdorff2": pa.array([], pa.int64())})
        n_pairs = len(p) // (2 * L)
        arr = v.reshape(n_pairs, 2, L)
        a, b = arr[:, 0, :], arr[:, 1, :]
        d2 = (a[:, :, None] - b[:, None, :]) ** 2
        h_ab = d2.min(axis=2).max(axis=1)
        h_ba = d2.min(axis=1).max(axis=1)
        return pa.table({"pair": pa.array(p[::2 * L]),
                         "hausdorff2": pa.array(
                             np.maximum(h_ab, h_ba))})

    return hash_bucket_scan(series, ["pair"], fold,
                            n_rows=max(_nrows(sf_dir, "events")
                                       // (2 * L), 1))


def q_hausdorff_pairs_sql() -> str:
    L = _DTW_L
    return (
        "WITH ev AS (SELECT user_id, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v, "
        "row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1"
        " AS pos FROM events), "
        f"s0 AS (SELECT * FROM ev WHERE pos < {L}), "
        "full_u AS (SELECT user_id FROM s0 GROUP BY 1 "
        f"HAVING count(*) = {L}), "
        "s AS (SELECT s0.user_id // 2 AS pair, s0.user_id % 2 AS side, "
        "pos, v FROM s0 JOIN full_u ON full_u.user_id = s0.user_id), "
        "m1 AS (SELECT a.pair, a.pos, "
        "min((a.v - b.v) * (a.v - b.v)) AS mn FROM s a "
        "JOIN s b ON b.pair = a.pair AND a.side = 0 AND b.side = 1 "
        "GROUP BY 1, 2), "
        "m2 AS (SELECT b.pair, b.pos, "
        "min((a.v - b.v) * (a.v - b.v)) AS mn FROM s a "
        "JOIN s b ON b.pair = a.pair AND a.side = 0 AND b.side = 1 "
        "GROUP BY 1, 2), "
        "h1 AS (SELECT pair, max(mn) AS h FROM m1 GROUP BY 1), "
        "h2 AS (SELECT pair, max(mn) AS h FROM m2 GROUP BY 1) "
        "SELECT h1.pair, CAST(greatest(h1.h, h2.h) AS BIGINT) "
        "AS hausdorff2 FROM h1 JOIN h2 ON h2.pair = h1.pair"
    )


def q_markov_entropy(sf_dir: str):
    """CONDITIONAL ENTROPY of the type-transition Markov chain, per
    source state — the sequence-predictability screen on top of
    q_transitions (same distributed counting pass; the 5×5 count
    matrix is bounded, so the entropy fold is a driver formality):
    h_nano = Σ_next floor(−(p·ln p)·10⁹ + 0.5) with p = n/row_total —
    int-pinned per term, the q_type_entropy recipe."""
    tr = q_transitions(sf_dir).to_pandas()
    g = tr.groupby("prev_type", sort=True)
    out = []
    for prev, grp in g:
        n = grp["n"].to_numpy().astype(np.float64)
        r = n.sum()
        p = n / r
        terms = np.floor(-(p * np.log(p)) * 1e9 + 0.5).astype(np.int64)
        out.append((prev, int(terms.sum()), int(r)))
    return pd.DataFrame(out, columns=["prev_type", "h_nano",
                                      "row_total"])


def q_markov_entropy_sql() -> str:
    return (
        "WITH s AS (SELECT user_id, event_type, lag(event_type) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS prev "
        "FROM events), "
        "c AS (SELECT prev, event_type, count(*) AS n FROM s "
        "WHERE prev IS NOT NULL GROUP BY 1, 2), "
        "r AS (SELECT prev, sum(n) AS rt FROM c GROUP BY 1), "
        "t AS (SELECT c.prev, r.rt, CAST(floor(-((CAST(c.n AS DOUBLE) "
        "/ CAST(r.rt AS DOUBLE)) * ln(CAST(c.n AS DOUBLE) / "
        "CAST(r.rt AS DOUBLE))) * 1e9 + 0.5) AS BIGINT) AS term "
        "FROM c JOIN r ON r.prev = c.prev) "
        "SELECT prev AS prev_type, CAST(sum(term) AS BIGINT) AS h_nano,"
        " CAST(any_value(rt) AS BIGINT) AS row_total "
        "FROM t GROUP BY 1"
    )


def q_rs_range(sf_dir: str):
    """RESCALED-RANGE (Hurst / long-memory screen) inputs per user,
    denominators cleared so everything is exact int64: over the
    time-ordered cent series, c_k = Σ_{i≤k}(n·y_i − S) is the n-scaled
    demeaned cumulative sum (S = Σy), R_scaled = max_k c_k − min_k c_k
    (= n·R), and var_num = n·Σy² − S² (= n²·σ²).  H ≈ log(R/σ√n)
    ratios are left to the analyst — the sufficient statistics are
    the pinned integers.  One keyed_scan; per-user folds are global
    cumsum + segmented min/max (no per-user loop)."""
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "y": pa.array(np.floor(v * 100.0 + 0.5
                                                ).astype(np.int64))})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        y = d["y"].to_numpy()
        uniq, codes = np.unique(u, return_inverse=True)
        starts = np.r_[0, 1 + np.flatnonzero(u[1:] != u[:-1])]
        sizes = np.diff(np.r_[starts, len(u)])
        n = np.repeat(sizes, sizes)
        S = np.zeros(len(uniq), np.int64)
        np.add.at(S, codes, y)
        dev = n * y - S[codes]
        c = np.cumsum(dev)
        seg0 = np.repeat(np.r_[np.int64(0), c[starts[1:] - 1]], sizes)
        c = c - seg0
        cmax = np.full(len(uniq), np.iinfo(np.int64).min, np.int64)
        cmin = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.maximum.at(cmax, codes, c)
        np.minimum.at(cmin, codes, c)
        s2 = np.zeros(len(uniq), np.int64)
        np.add.at(s2, codes, y * y)
        nn = sizes.astype(np.int64)
        return pd.DataFrame({"user_id": uniq,
                             "r_scaled": cmax - cmin,
                             "var_num": nn * s2 - S * S,
                             "n": nn})

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t", "event_id"],
                      fn=fn, n_rows=_nrows(sf_dir, "events"))


def q_rs_range_sql() -> str:
    return (
        "WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y FROM events), "
        "st AS (SELECT user_id, count(*) AS n, sum(y) AS s, "
        "sum(y * y) AS s2 FROM p GROUP BY 1), "
        "c AS (SELECT p.user_id, st.n, st.s, st.s2, "
        "sum(st.n * p.y - st.s) OVER (PARTITION BY p.user_id "
        "ORDER BY p.t, p.event_id ROWS UNBOUNDED PRECEDING) AS ck "
        "FROM p JOIN st ON st.user_id = p.user_id) "
        "SELECT user_id, CAST(max(ck) - min(ck) AS BIGINT) AS r_scaled,"
        " CAST(any_value(n) * any_value(s2) - any_value(s) * "
        "any_value(s) AS BIGINT) AS var_num, "
        "CAST(any_value(n) AS BIGINT) AS n FROM c GROUP BY 1"
    )


def q_perm_counts(sf_dir: str):
    """ORDINAL-PATTERN (permutation-entropy) counts per user: each
    consecutive value triple maps to one of six order patterns
    (strict-less comparisons with the repo's deterministic tie rule:
    earlier position wins ties, i.e. a ≤ b reads 'a before b'), and
    the bounded (user, pattern) counts ride the combiner tree.  The
    entropy itself is left to the reader — the counts are the exact
    sufficient statistics (and what a drift monitor actually stores).
    Pattern id = 2·[y0>y1] + [y1>y2] + 3·[y0>y2] ∈ [0, 7] minus the
    two impossible codes — emitted as the raw id to keep both sides
    trivially identical."""
    from ..stages.agg_tree import tree_aggregate
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "y": pa.array(np.floor(v * 100.0 + 0.5
                                                ).astype(np.int64))})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        y = d["y"].to_numpy()
        ok = (u[:-2] == u[1:-1]) & (u[:-2] == u[2:])
        y0, y1, y2 = y[:-2][ok], y[1:-1][ok], y[2:][ok]
        pat = (2 * (y0 > y1) + (y1 > y2) + 3 * (y0 > y2)).astype(np.int64)
        uu = u[:-2][ok]
        t = pd.DataFrame({"user_id": uu, "pattern": pat})
        g = (t.groupby(["user_id", "pattern"], as_index=False)
             .size().rename(columns={"size": "n"}))
        g["n"] = g["n"].astype(np.int64)
        return g

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow")
    partials = keyed_scan(ds, key="user_id", order=["t", "event_id"],
                          fn=fn, n_rows=_nrows(sf_dir, "events"))
    return tree_aggregate(partials, ["user_id", "pattern"],
                          [("n", "sum")])


def q_perm_counts_sql() -> str:
    return (
        "WITH p AS (SELECT user_id, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y, "
        "row_number() OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS rn, "
        "count(*) OVER (PARTITION BY user_id) AS n FROM events), "
        "tr AS (SELECT a.user_id, a.y AS y0, b.y AS y1, c.y AS y2 "
        "FROM p a JOIN p b ON b.user_id = a.user_id "
        "AND b.rn = a.rn + 1 "
        "JOIN p c ON c.user_id = a.user_id AND c.rn = a.rn + 2) "
        "SELECT user_id, CAST(2 * (CASE WHEN y0 > y1 THEN 1 ELSE 0 END)"
        " + (CASE WHEN y1 > y2 THEN 1 ELSE 0 END) "
        "+ 3 * (CASE WHEN y0 > y2 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS pattern, CAST(count(*) AS BIGINT) AS n "
        "FROM tr GROUP BY 1, 2"
    )


def q_runs_test(sf_dir: str):
    """WALD-WOLFOWITZ RUNS TEST inputs per user: split the
    time-ordered cent series at the user's LOWER MEDIAN (exact order
    statistic, index (n−1)//2), classify each value above/not-above,
    and count the runs plus the two class sizes — the randomness
    screen's exact sufficient statistics.  Median via one segmented
    sort inside the keyed_scan bucket; runs via one shifted compare.
    Users with a single event emit (1, n_above, n_le) like the
    oracle's window arithmetic."""
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "y": pa.array(np.floor(v * 100.0 + 0.5
                                                ).astype(np.int64))})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        y = d["y"].to_numpy()
        uniq, codes = np.unique(u, return_inverse=True)
        starts = np.r_[0, 1 + np.flatnonzero(u[1:] != u[:-1])]
        sizes = np.diff(np.r_[starts, len(u)])
        order = np.lexsort((y, u))   # per-user value sort
        med = y[order][starts + (sizes - 1) // 2]
        above = y > med[codes]
        run_start = np.ones(len(u), dtype=bool)
        run_start[1:] = (u[1:] != u[:-1]) | (above[1:] != above[:-1])
        runs = np.zeros(len(uniq), np.int64)
        np.add.at(runs, codes[run_start], 1)
        na = np.zeros(len(uniq), np.int64)
        np.add.at(na, codes, above.astype(np.int64))
        return pd.DataFrame({"user_id": uniq, "runs": runs,
                             "n_above": na,
                             "n_le": sizes.astype(np.int64) - na})

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t", "event_id"],
                      fn=fn, n_rows=_nrows(sf_dir, "events"))


def q_runs_test_sql() -> str:
    return (
        "WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y FROM events), "
        "r AS (SELECT user_id, t, event_id, y, row_number() OVER "
        "(PARTITION BY user_id ORDER BY y, user_id) AS vr, "
        "count(*) OVER (PARTITION BY user_id) AS n FROM p), "
        "md AS (SELECT user_id, y AS med FROM r "
        "WHERE vr = (n - 1) // 2 + 1), "
        "c AS (SELECT p.user_id, p.t, p.event_id, "
        "CASE WHEN p.y > md.med THEN 1 ELSE 0 END AS ab "
        "FROM p JOIN md ON md.user_id = p.user_id), "
        "s AS (SELECT user_id, ab, lag(ab) OVER (PARTITION BY user_id "
        "ORDER BY t, event_id) AS pab FROM c) "
        "SELECT user_id, CAST(sum(CASE WHEN pab IS NULL OR ab <> pab "
        "THEN 1 ELSE 0 END) AS BIGINT) AS runs, "
        "CAST(sum(ab) AS BIGINT) AS n_above, "
        "CAST(sum(1 - ab) AS BIGINT) AS n_le FROM s GROUP BY 1"
    )


def q_lis_length(sf_dir: str):
    """LONGEST STRICTLY-INCREASING SUBSEQUENCE length of each user's
    time-ordered cent series — the classic sequence-DP, vectorized
    ACROSS USERS: round r computes dp at position r for every user at
    once; the predecessor max folds over offsets (Σr small vector ops,
    never a per-user loop).  Exact ints.  Oracle = a carry-all
    recursive CTE advancing one position per iteration (the q_dtw
    multi-reference pattern), prototype-validated against patience
    sorting."""
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "y": pa.array(np.floor(v * 100.0 + 0.5
                                                ).astype(np.int64))})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        y = d["y"].to_numpy()
        uniq, codes = np.unique(u, return_inverse=True)
        starts = np.r_[0, 1 + np.flatnonzero(u[1:] != u[:-1])]
        sizes = np.diff(np.r_[starts, len(u)])
        dp = np.ones(len(u), np.int64)
        for r in range(1, int(sizes.max()) if len(sizes) else 0):
            sel = sizes > r
            ir = starts[sel] + r
            yr = y[ir]
            best = np.zeros(len(ir), np.int64)
            for off in range(1, r + 1):
                ip = ir - off
                np.maximum(best, np.where(y[ip] < yr, dp[ip], 0),
                           out=best)
            dp[ir] = 1 + best
        lis = np.zeros(len(uniq), np.int64)
        np.maximum.at(lis, codes, dp)
        return pd.DataFrame({"user_id": uniq, "lis_len": lis,
                             "n": sizes.astype(np.int64)})

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t", "event_id"],
                      fn=fn, n_rows=_nrows(sf_dir, "events"))


def q_lis_length_sql() -> str:
    return (
        "WITH RECURSIVE "
        "p0 AS (SELECT user_id, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y, "
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        " AS rn FROM events), "
        "pn AS (SELECT user_id, count(*) AS n FROM p0 GROUP BY 1), "
        "dp AS (SELECT user_id, rn, y, CAST(1 AS BIGINT) AS d "
        "FROM p0 WHERE rn = 1 "
        "UNION ALL SELECT * FROM ("
        "WITH cur AS (SELECT * FROM dp), "
        "mx AS (SELECT cur.user_id, max(cur.rn) AS mr, "
        "any_value(pn.n) AS n FROM cur "
        "JOIN pn ON pn.user_id = cur.user_id GROUP BY 1), "
        "nxt AS (SELECT p0.user_id, p0.rn, p0.y, "
        "1 + COALESCE(max(CASE WHEN c.y < p0.y THEN c.d END), 0) AS d "
        "FROM p0 JOIN mx ON mx.user_id = p0.user_id "
        "AND p0.rn = mx.mr + 1 "
        "LEFT JOIN cur c ON c.user_id = p0.user_id GROUP BY 1, 2, 3) "
        "SELECT c.user_id, c.rn, c.y, c.d FROM cur c "
        "JOIN mx ON mx.user_id = c.user_id WHERE mx.mr < mx.n "
        "UNION ALL SELECT * FROM nxt)) "
        "SELECT dp.user_id, CAST(max(dp.d) AS BIGINT) AS lis_len, "
        "CAST(any_value(pn.n) AS BIGINT) AS n FROM dp "
        "JOIN pn ON pn.user_id = dp.user_id GROUP BY 1"
    )


def q_max_gap(sf_dir: str):
    """MAXIMUM ADJACENT GAP per event type over the sorted cent
    values — the cheap outlier/cluster-break screen (a huge gap =
    separated modes): exact int64 max of consecutive differences plus
    the count.  Per-type value counts ride one combiner-tree pass
    (the quantized cent domain bounds the key space like
    q_equidepth_hist); the gap fold walks each type's sorted distinct
    values driver-side.  Oracle = lag over the distinct values."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        t = pa.table({"et": b["event_type"],
                      "c": pa.array(np.floor(v * 100.0 + 0.5
                                             ).astype(np.int64)),
                      "n": pa.array(np.ones(len(v), np.int64))})
        return (t.group_by(["et", "c"]).aggregate([("n", "sum")])
                .rename_columns(["et", "c", "n"]))

    tab = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_type", "value"]).map_batches(
            partial, batch_format="pyarrow"),
        ["et", "c"], [("n", "sum")]).to_pandas()
    tab = tab.sort_values(["et", "c"], kind="mergesort")
    et = tab["et"].to_numpy()
    c = tab["c"].to_numpy()
    n = tab["n"].to_numpy()
    same = np.zeros(len(et), dtype=bool)
    same[1:] = et[1:] == et[:-1]
    gap = np.zeros(len(et), np.int64)
    gap[same] = c[same] - c[np.flatnonzero(same) - 1]
    uniq, codes = np.unique(et, return_inverse=True)
    mg = np.zeros(len(uniq), np.int64)
    np.maximum.at(mg, codes, gap)
    cnt = np.zeros(len(uniq), np.int64)
    np.add.at(cnt, codes, n)
    return pd.DataFrame({"event_type": uniq, "max_gap": mg,
                         "n": cnt})


def q_max_gap_sql() -> str:
    return (
        "WITH p AS (SELECT event_type, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c FROM events), "
        "d AS (SELECT DISTINCT event_type, c FROM p), "
        "g AS (SELECT event_type, c - lag(c) OVER "
        "(PARTITION BY event_type ORDER BY c) AS gap FROM d) "
        "SELECT g.event_type, "
        "CAST(COALESCE(max(gap), 0) AS BIGINT) AS max_gap, "
        "CAST(any_value(t.n) AS BIGINT) AS n FROM g "
        "JOIN (SELECT event_type, count(*) AS n FROM p GROUP BY 1) t "
        "ON t.event_type = g.event_type GROUP BY 1"
    )


def q_ks_exact(sf_dir: str):
    """EXACT two-sample KOLMOGOROV-SMIRNOV statistic between the
    'click' and 'purchase' cent-value distributions, denominators
    cleared: D·n1·n2 = max over pooled distinct values of
    |F1·n1·n2 − F2·n1·n2| = |cum1·n2 − cum2·n1| — pure int64.  The
    per-(type, cent) counts ride the combiner tree (quantized-domain
    bound); the cumulative walk folds driver-side over the bounded
    distinct-value table.  Oracle = window cumulative sums over the
    same counts."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "click") | (et == "purchase")
        v = b["value"].to_numpy(zero_copy_only=False)[keep]
        t = pa.table({"et": pa.array(et[keep]),
                      "c": pa.array(np.floor(v * 100.0 + 0.5
                                             ).astype(np.int64)),
                      "n": pa.array(np.ones(int(keep.sum()), np.int64))})
        return (t.group_by(["et", "c"]).aggregate([("n", "sum")])
                .rename_columns(["et", "c", "n"]))

    tab = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_type", "value"]).map_batches(
            partial, batch_format="pyarrow"),
        ["et", "c"], [("n", "sum")]).to_pandas()
    vals = np.unique(tab["c"].to_numpy())
    c1 = np.zeros(len(vals), np.int64)
    c2 = np.zeros(len(vals), np.int64)
    m1 = tab["et"] == "click"
    idx1 = np.searchsorted(vals, tab.loc[m1, "c"].to_numpy())
    c1[idx1] = tab.loc[m1, "n"].to_numpy()
    m2 = tab["et"] == "purchase"
    idx2 = np.searchsorted(vals, tab.loc[m2, "c"].to_numpy())
    c2[idx2] = tab.loc[m2, "n"].to_numpy()
    n1, n2 = int(c1.sum()), int(c2.sum())
    d = np.abs(np.cumsum(c1) * n2 - np.cumsum(c2) * n1)
    return pd.DataFrame({"d_num": [np.int64(d.max() if len(d) else 0)],
                         "n1": [np.int64(n1)], "n2": [np.int64(n2)]})


def q_ks_exact_sql() -> str:
    return (
        "WITH p AS (SELECT event_type, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c FROM events "
        "WHERE event_type IN ('click', 'purchase')), "
        "cc AS (SELECT c, "
        "sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a, "
        "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b "
        "FROM p GROUP BY 1), "
        "n AS (SELECT sum(a) AS n1, sum(b) AS n2 FROM cc), "
        "w AS (SELECT sum(a) OVER (ORDER BY c) AS f1, "
        "sum(b) OVER (ORDER BY c) AS f2 FROM cc) "
        "SELECT CAST(COALESCE(max(abs(w.f1 * n.n2 - w.f2 * n.n1)), 0) "
        "AS BIGINT) AS d_num, CAST(any_value(n.n1) AS BIGINT) AS n1, "
        "CAST(any_value(n.n2) AS BIGINT) AS n2 FROM w, n"
    )


def q_bhattacharyya(sf_dir: str):
    """BHATTACHARYYA overlap inputs between the 'click' and
    'purchase' dollar-bucket value histograms: per shared bucket the
    term floor(√(c1·c2)·10⁶ + 0.5) (sqrt is correctly rounded on both
    sides; the product is exact int64), summed exactly, plus both
    totals — BC = Σ√(p·q) = sum_term/(10⁶·√(n1·n2)) is left to the
    reader.  Bounded bucket domain ⇒ one combiner-tree pass."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "click") | (et == "purchase")
        v = b["value"].to_numpy(zero_copy_only=False)[keep]
        t = pa.table({"et": pa.array(et[keep]),
                      "d": pa.array((np.floor(v * 100.0 + 0.5)
                                     .astype(np.int64)) // 100),
                      "n": pa.array(np.ones(int(keep.sum()), np.int64))})
        return (t.group_by(["et", "d"]).aggregate([("n", "sum")])
                .rename_columns(["et", "d", "n"]))

    tab = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_type", "value"]).map_batches(
            partial, batch_format="pyarrow"),
        ["et", "d"], [("n", "sum")]).to_pandas()
    a = tab[tab["et"] == "click"].set_index("d")["n"]
    b = tab[tab["et"] == "purchase"].set_index("d")["n"]
    j = a.to_frame("a").join(b.to_frame("b"), how="inner")
    term = np.floor(np.sqrt(j["a"].to_numpy().astype(np.float64)
                            * j["b"].to_numpy().astype(np.float64))
                    * 1e6 + 0.5).astype(np.int64)
    return pd.DataFrame({"bc_sum": [np.int64(term.sum())],
                         "n1": [np.int64(int(a.sum()))],
                         "n2": [np.int64(int(b.sum()))]})


def q_bhattacharyya_sql() -> str:
    return (
        "WITH p AS (SELECT event_type, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) // 100 AS d "
        "FROM events WHERE event_type IN ('click', 'purchase')), "
        "c AS (SELECT d, "
        "sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a, "
        "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b "
        "FROM p GROUP BY 1) "
        "SELECT CAST(COALESCE(sum(CASE WHEN a > 0 AND b > 0 THEN "
        "CAST(floor(sqrt(CAST(a AS DOUBLE) * CAST(b AS DOUBLE)) "
        "* 1e6 + 0.5) AS BIGINT) ELSE 0 END), 0) AS BIGINT) AS bc_sum,"
        " CAST(COALESCE(sum(a), 0) AS BIGINT) AS n1, "
        "CAST(COALESCE(sum(b), 0) AS BIGINT) AS n2 FROM c"
    )


def q_attribution_pairs(sf_dir: str):
    """TIME-BANDED ATTRIBUTION: per user, the number of
    (click → purchase) event pairs with the purchase 0–15 minutes
    AFTER the click (inclusive) — the conversion-credit primitive.
    One user-keyed hash-bucket exchange; per bucket BOTH sides sort
    once and a two-sided searchsorted counts every click's window
    (no pair materialization).  Emits users with ≥ 1 attributed
    pair.  Exact ints; oracle = the banded self-join."""
    from ..stages.scan import hash_bucket_scan

    W = 15 * 60 * 1_000_000

    def prep(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "click") | (et == "purchase")
        t = b.filter(pa.array(keep))
        ett = et[keep]
        return pa.table({"user_id": t["user_id"],
                         "t_us": t["ts"].cast(pa.int64()),
                         "is_p": pa.array((ett == "purchase")
                                          .astype(np.int8))})

    def fold(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["t_us"].to_numpy(zero_copy_only=False)
        isp = t["is_p"].to_numpy(zero_copy_only=False).astype(bool)
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "n_pairs": pa.array([], pa.int64())})
        if not len(u) or isp.all() or not isp.any():
            return empty
        # composite (dense-user, time-offset) keys make the purchase
        # array GLOBALLY sorted, so every click's [t, t+W] window is
        # ONE two-sided searchsorted — no per-click Python (the
        # q_rolling_counts trick); S > span+W keeps runs disjoint
        uniq_all, code_all = np.unique(u, return_inverse=True)
        tmin = ts.min()
        S = np.int64(int(ts.max()) - int(tmin) + W + 2)
        key = code_all.astype(np.int64) * S + (ts - tmin)
        ck, pk = key[~isp], np.sort(key[isp])
        cu = u[~isp]
        lo = np.searchsorted(pk, ck, side="left")
        hi = np.searchsorted(pk, ck + W, side="right")
        n = hi - lo
        uniq, codes = np.unique(cu, return_inverse=True)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, codes, n)
        keep = tot > 0
        return pa.table({"user_id": pa.array(uniq[keep]),
                         "n_pairs": pa.array(tot[keep])})

    rows = _read(sf_dir, "events",
                 ["user_id", "ts", "event_type"]).map_batches(
        prep, batch_format="pyarrow")
    return hash_bucket_scan(rows, ["user_id"], fold,
                            n_rows=_nrows(sf_dir, "events"))


def q_attribution_pairs_sql() -> str:
    W = 15 * 60 * 1_000_000
    return (
        "WITH c AS (SELECT user_id, epoch_us(ts) AS t FROM events "
        "WHERE event_type = 'click'), "
        "p AS (SELECT user_id, epoch_us(ts) AS t FROM events "
        "WHERE event_type = 'purchase') "
        "SELECT c.user_id, CAST(count(*) AS BIGINT) AS n_pairs "
        "FROM c JOIN p ON p.user_id = c.user_id "
        f"AND p.t >= c.t AND p.t <= c.t + {W} GROUP BY 1"
    )


def q_interval_union(sf_dir: str):
    """GAPS-AND-ISLANDS interval union per user — the classic merge
    of overlapping validity windows: each event opens
    [t, t + (event_id % 30 + 1) minutes], and the user's total
    covered microseconds (plus island count) is exact int64.  One
    keyed_scan; the merge is a per-segment running-max of ends
    (cummax with segment resets) and one island-start mask — no
    per-user loop.  Oracle = the textbook window-function island
    detection."""
    from ..stages.scan import keyed_scan

    MIN_US = 60_000_000

    def prep(b: pa.Table) -> pa.Table:
        e = b["event_id"].to_numpy(zero_copy_only=False)
        t = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b["user_id"],
                         "s": pa.array(t),
                         "event_id": b["event_id"],
                         "e": pa.array(t + (e % 30 + 1) * MIN_US)})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        s = d["s"].to_numpy()
        e = d["e"].to_numpy()
        # rows arrive sorted by (user, s, event_id); segmented cummax
        # of ends via log-doubling (exact, no per-user loop)
        starts = np.r_[0, 1 + np.flatnonzero(u[1:] != u[:-1])]
        sizes = np.diff(np.r_[starts, len(u)])
        pos = np.arange(len(u)) - np.repeat(starts, sizes)
        cm = e.copy()
        shift = 1
        while shift < len(u):
            prev = np.empty_like(cm)
            prev[:shift] = np.iinfo(np.int64).min
            prev[shift:] = cm[:-shift]
            ok = pos >= shift
            cm = np.where(ok, np.maximum(cm, prev), cm)
            shift *= 2
        prev_cm = np.empty_like(cm)
        prev_cm[0] = np.iinfo(np.int64).min
        prev_cm[1:] = cm[:-1]
        new_island = (pos == 0) | (s > prev_cm)
        # covered time = Σ over rows of max(0, new coverage added)
        add = np.where(new_island, e - s,
                       np.maximum(e - prev_cm, 0))
        # rows fully inside the running envelope add 0 via the clamp;
        # rows extending it add the extension; island heads add e−s
        uniq, codes = np.unique(u, return_inverse=True)
        cov = np.zeros(len(uniq), np.int64)
        np.add.at(cov, codes, add)
        ni = np.zeros(len(uniq), np.int64)
        np.add.at(ni, codes, new_island.astype(np.int64))
        return pd.DataFrame({"user_id": uniq, "covered_us": cov,
                             "n_islands": ni})

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["s", "event_id"],
                      fn=fn, n_rows=_nrows(sf_dir, "events"))


def q_interval_union_sql() -> str:
    return (
        "WITH iv AS (SELECT user_id, epoch_us(ts) AS s, event_id, "
        "epoch_us(ts) + (event_id % 30 + 1) * 60000000 AS e "
        "FROM events), "
        "m AS (SELECT user_id, s, e, max(e) OVER (PARTITION BY user_id"
        " ORDER BY s, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "1 PRECEDING) AS pm FROM iv), "
        "g AS (SELECT user_id, s, e, pm, CASE WHEN pm IS NULL "
        "OR s > pm THEN 1 ELSE 0 END AS isl FROM m) "
        "SELECT user_id, CAST(sum(CASE WHEN isl = 1 THEN e - s "
        "ELSE greatest(e - pm, 0) END) AS BIGINT) AS covered_us, "
        "CAST(sum(isl) AS BIGINT) AS n_islands FROM g GROUP BY 1"
    )


def q_scan_stat(sf_dir: str):
    """SCAN STATISTIC per event type: the maximum number of events in
    ANY sliding 1-hour window (window starts at event times — the
    discrete scan statistic of epidemic/burst detection).  Types are
    bounded, so each type's sorted time array folds in one bucket:
    counts are ONE two-sided searchsorted (the q_rolling_counts
    trick), max is exact.  Oracle = per-event window counts via a
    banded self-join, maxed."""
    from ..stages.scan import hash_bucket_scan

    W = 3_600_000_000

    from ..functions.text import fingerprint64

    def prep(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        return pa.table({"et": b["event_type"],
                         "et_h": pa.array(fingerprint64(
                             pd.Series(et.astype("U")))),
                         "t_us": b["ts"].cast(pa.int64())})

    def fold(t: pa.Table) -> pa.Table:
        et = t["et"].to_numpy(zero_copy_only=False)
        ts = t["t_us"].to_numpy(zero_copy_only=False)
        uniq = np.unique(et.astype("U"))
        out_e, out_m = [], []
        for e in uniq:     # bounded type domain (≤ a handful)
            x = np.sort(ts[et == e])
            hi = np.searchsorted(x, x + W, side="left")
            lo = np.searchsorted(x, x, side="left")
            out_e.append(e)
            out_m.append(int((hi - lo).max()) if len(x) else 0)
        return pa.table({"event_type": pa.array(out_e),
                         "max_1h": pa.array(np.array(out_m, np.int64))})

    rows = _read(sf_dir, "events", ["event_type", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    return hash_bucket_scan(rows, ["et_h"], fold,
                            n_rows=_nrows(sf_dir, "events"))


def q_scan_stat_sql() -> str:
    return (
        "WITH p AS (SELECT event_id, event_type, epoch_us(ts) AS t "
        "FROM events), "
        # group per anchor EVENT, not per timestamp — duplicate
        # timestamps must not merge anchors (each contributes one
        # window)
        "c AS (SELECT a.event_id, a.event_type, count(*) AS n "
        "FROM p a JOIN p b ON b.event_type = a.event_type "
        "AND b.t >= a.t AND b.t < a.t + 3600000000 GROUP BY 1, 2) "
        "SELECT event_type, CAST(max(n) AS BIGINT) AS max_1h "
        "FROM c GROUP BY 1"
    )


def q_lag_cov(sf_dir: str):
    """LAG-1 AUTOCOVARIANCE sufficient statistics of each event
    type's time-ordered cent-value series: over consecutive pairs,
    the exact ints (m, Σxy, Σx, Σy) with x = earlier, y = later —
    cov₁ = (m·Σxy − Σx·Σy)/m² is left to the reader.  Types are
    bounded, so the series fold is one hash-bucket exchange keyed by
    the type fingerprint; pairs come from two shifted views of the
    in-bucket (type, time) sort.  Oracle = a LEAD window pairing."""
    from ..functions.text import fingerprint64
    from ..stages.scan import hash_bucket_scan

    def prep(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({"et": b["event_type"],
                         "et_h": pa.array(fingerprint64(
                             pd.Series(et.astype("U")))),
                         "t_us": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "y": pa.array(np.floor(v * 100.0 + 0.5
                                                ).astype(np.int64))})

    def fold(t: pa.Table) -> pa.Table:
        et = t["et"].to_numpy(zero_copy_only=False).astype("U")
        ts = t["t_us"].to_numpy(zero_copy_only=False)
        e = t["event_id"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, ts, et))
        et, y = et[order], y[order]
        same = et[1:] == et[:-1]
        x1, y1 = y[:-1][same], y[1:][same]
        g = et[:-1][same]
        uniq, codes = np.unique(g, return_inverse=True)
        m = np.zeros(len(uniq), np.int64)
        sxy = np.zeros(len(uniq), np.int64)
        sx = np.zeros(len(uniq), np.int64)
        sy = np.zeros(len(uniq), np.int64)
        np.add.at(m, codes, 1)
        np.add.at(sxy, codes, x1 * y1)
        np.add.at(sx, codes, x1)
        np.add.at(sy, codes, y1)
        return pa.table({"event_type": pa.array(uniq),
                         "m": pa.array(m), "sxy": pa.array(sxy),
                         "sx": pa.array(sx), "sy": pa.array(sy)})

    rows = _read(sf_dir, "events",
                 ["event_id", "event_type", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return hash_bucket_scan(rows, ["et_h"], fold,
                            n_rows=_nrows(sf_dir, "events"))


def q_lag_cov_sql() -> str:
    return (
        "WITH p AS (SELECT event_type, epoch_us(ts) AS t, event_id, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y FROM events), "
        "q AS (SELECT event_type, y AS x1, lead(y) OVER "
        "(PARTITION BY event_type ORDER BY t, event_id) AS y1 FROM p) "
        "SELECT event_type, CAST(count(*) AS BIGINT) AS m, "
        "CAST(sum(x1 * y1) AS BIGINT) AS sxy, "
        "CAST(sum(x1) AS BIGINT) AS sx, "
        "CAST(sum(y1) AS BIGINT) AS sy "
        "FROM q WHERE y1 IS NOT NULL GROUP BY 1"
    )


def q_longest_streak(sf_dir: str):
    """LONGEST STRICTLY-INCREASING CONSECUTIVE RUN of each user's
    time-ordered cent values (the streak/momentum screen — the
    contiguous sibling of q_lis_length): exact ints via one
    keyed_scan; run lengths fall out of a reset-mask cumulative
    (position minus last-reset position), no per-user loop.  Oracle =
    the gaps-and-islands grouping."""
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "y": pa.array(np.floor(v * 100.0 + 0.5
                                                ).astype(np.int64))})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        y = d["y"].to_numpy()
        n = len(u)
        pos = np.arange(n, dtype=np.int64)
        reset = np.ones(n, dtype=bool)
        reset[1:] = (u[1:] != u[:-1]) | (y[1:] <= y[:-1])
        last_reset = np.maximum.accumulate(np.where(reset, pos, -1))
        run = pos - last_reset + 1
        uniq, codes = np.unique(u, return_inverse=True)
        best = np.zeros(len(uniq), np.int64)
        np.maximum.at(best, codes, run)
        return pd.DataFrame({"user_id": uniq, "streak": best})

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t", "event_id"],
                      fn=fn, n_rows=_nrows(sf_dir, "events"))


def q_longest_streak_sql() -> str:
    return (
        "WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y FROM events), "
        "m AS (SELECT user_id, t, event_id, y, CASE WHEN "
        "lag(y) OVER w IS NULL OR y <= lag(y) OVER w THEN 1 ELSE 0 END"
        " AS brk FROM p WINDOW w AS (PARTITION BY user_id "
        "ORDER BY t, event_id)), "
        "g AS (SELECT user_id, sum(brk) OVER (PARTITION BY user_id "
        "ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS grp "
        "FROM m), "
        "r AS (SELECT user_id, grp, count(*) AS ln FROM g "
        "GROUP BY 1, 2) "
        "SELECT user_id, CAST(max(ln) AS BIGINT) AS streak FROM r "
        "GROUP BY 1"
    )
