"""relational query family (split from the former single-file queries module)."""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo.cells import cell_id, cell_sql
from ..geo.tiles import tile_sql, tile_xy
from ._common import (
    _GROUP_SAMPLE_K,
    _IV_SQL,
    _PRIORITIES,
    _PROFILE_COLS,
    _events_of_type,
    _iv_events,
    _nrows,
    _read,
    _skyline_mask,
    derive_latlon,
    latlon_sql,
)




def q_events_by_type(sf_dir: str):
    """Plain grouped aggregate parity check."""
    from ray.data.aggregate import Count

    return _read(sf_dir, "events", ["event_type"]).groupby(
        "event_type").aggregate(Count(alias_name="n_events"))


def q_events_by_type_sql() -> str:
    return "SELECT event_type, count(*) AS n_events FROM events GROUP BY 1"


def q_topk_events(sf_dir: str):
    """Distributed top-100 by value (per-batch partial top-k + tiny
    global sort)."""
    from ..stages.topk import top_k

    ds = _read(sf_dir, "events", ["event_id", "value"])
    return top_k(ds, "value", 100, descending=True, tiebreak_col="event_id")


def q_topk_events_sql() -> str:
    return ("SELECT event_id, value FROM events "
            "ORDER BY value DESC, event_id LIMIT 100")


def q_grouped_topk(sf_dir: str):
    """Top-5 events by value per event_type (grouped top-k: per-batch
    per-group pre-reduce, then a tiny per-group finish)."""
    from ..stages.topk import grouped_top_k

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    return grouped_top_k(ds, "event_type", "value", 5,
                         descending=True, tiebreak_col="event_id")


def q_grouped_topk_sql() -> str:
    return ("SELECT event_id, event_type, value FROM ("
            "SELECT event_id, event_type, value, row_number() OVER "
            "(PARTITION BY event_type ORDER BY value DESC, event_id) AS rn "
            "FROM events) WHERE rn <= 5")


def q_grouped_median(sf_dir: str):
    """Exact discrete median value per event_type — per-group sorted
    pick (element pass-through, no float arithmetic, so it hash-matches
    quantile_disc)."""

    def med(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy())
        # quantile_disc(0.5): lower of the two middle elements
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "median_value": [v[(len(v) - 1) // 2]],
        })

    return _read(sf_dir, "events", ["event_type", "value"]).groupby(
        "event_type").map_groups(med, batch_format="pandas")


def q_grouped_median_sql() -> str:
    return ("SELECT event_type, quantile_disc(value, 0.5) AS median_value "
            "FROM events GROUP BY 1")


def q_knn_sql() -> str:
    plat, plon = latlon_sql("s_suppkey")
    rlat, rlon = latlon_sql("c_custkey")
    return (
        "WITH probes AS (SELECT s_suppkey AS probe_id, "
        f"{plat} AS lat, {plon} AS lon FROM supplier), "
        "refs AS (SELECT c_custkey AS neighbor_id, "
        f"{rlat} AS lat, {rlon} AS lon FROM customer), "
        "d AS (SELECT probe_id, neighbor_id, "
        "(r.lat - p.lat) * (r.lat - p.lat) + (r.lon - p.lon) * (r.lon - p.lon) "
        "AS dist2 FROM probes p CROSS JOIN refs r), "
        "ranked AS (SELECT probe_id, neighbor_id, "
        "row_number() OVER (PARTITION BY probe_id ORDER BY dist2, neighbor_id) "
        "AS knn_rank FROM d) "
        "SELECT probe_id, neighbor_id, knn_rank FROM ranked WHERE knn_rank <= 5"
    )


def q_orders_per_nation(sf_dir: str):
    """Broadcast hash join (dimension-table pattern): orders ⋈ customer
    (broadcast) → order count per nation key. No shuffle of the fact
    side."""
    import pyarrow.parquet as pq

    from ..stages.agg_tree import grouped_count
    from ..stages.joins import broadcast_hash_join

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = broadcast_hash_join(orders, cust, on="o_custkey",
                                 small_on="c_custkey")
    joined = joined.map_batches(
        lambda b: b.select(["c_nationkey"]), batch_format="pyarrow")
    out = grouped_count(joined, ["c_nationkey"], out_col="n_orders")
    return out


def q_orders_per_nation_sql() -> str:
    return ("SELECT c_nationkey, count(*) AS n_orders FROM orders "
            "JOIN customer ON o_custkey = c_custkey GROUP BY 1")


def q_semi_join_events(sf_dir: str):
    """Broadcast semi join: events whose user is a customer with
    acctbal > 5000 (HAS-selector analogue over a foreign key)."""
    import pyarrow.parquet as pq

    from ..stages.joins import broadcast_semi_join

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_acctbal"])
    keys = cust.filter(pa.compute.greater(cust["c_acctbal"], 5000.0))[
        "c_custkey"].to_numpy(zero_copy_only=False)
    ev = _read(sf_dir, "events", ["event_id", "user_id"])
    return broadcast_semi_join(ev, keys, on="user_id")


def q_semi_join_events_sql() -> str:
    return ("SELECT event_id, user_id FROM events WHERE user_id IN "
            "(SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)")


def q_anti_join_events(sf_dir: str):
    """Broadcast anti join: events whose user is NOT a high-balance
    customer (the DROP-selector analogue over a foreign key)."""
    import pyarrow.parquet as pq

    from ..stages.joins import broadcast_semi_join

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_acctbal"])
    keys = cust.filter(pa.compute.greater(cust["c_acctbal"], 5000.0))[
        "c_custkey"].to_numpy(zero_copy_only=False)
    ev = _read(sf_dir, "events", ["event_id", "user_id"])
    return broadcast_semi_join(ev, keys, on="user_id", anti=True)


def q_anti_join_events_sql() -> str:
    return ("SELECT event_id, user_id FROM events WHERE user_id NOT IN "
            "(SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)")


def q_stratified_sample(sf_dir: str):
    """Stratified deterministic sample: different hash-sample rates
    per event_type stratum (click 50%, view 20%, else 5%) — the
    per-group sampling a training-data pipeline uses for class
    rebalancing, exactly mirrorable in SQL."""
    RATES = {"click": 50, "view": 20}

    def samp(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        rate = np.full(len(k), 5, dtype=np.int64)
        for name, r in RATES.items():
            rate[et == name] = r
        keep = ((k * 2654435761) % 4294967296) % 100 < rate
        return batch.filter(pa.array(keep))

    return _read(sf_dir, "events", ["event_id", "event_type"]).map_batches(
        samp, batch_format="pyarrow")


def q_stratified_sample_sql() -> str:
    return ("SELECT event_id, event_type FROM events "
            "WHERE ((event_id * 2654435761) % 4294967296) % 100 < "
            "CASE event_type WHEN 'click' THEN 50 WHEN 'view' THEN 20 "
            "ELSE 5 END")


def q_union_all(sf_dir: str):
    """UNION ALL (set op): high-value events ∪ low-value events —
    partition-recombine without a shuffle."""
    hi = _read(sf_dir, "events", ["event_id", "value"]).map_batches(
        lambda b: b.filter(pa.compute.greater(b["value"], 50.0)),
        batch_format="pyarrow")
    lo = _read(sf_dir, "events", ["event_id", "value"]).map_batches(
        lambda b: b.filter(pa.compute.less_equal(b["value"], 50.0)),
        batch_format="pyarrow")
    return hi.union(lo)


def q_union_all_sql() -> str:
    return ("SELECT event_id, value FROM events WHERE value > 50.0 "
            "UNION ALL SELECT event_id, value FROM events WHERE value <= 50.0")


def q_lineitem_stats(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate (count/min/max only — those
    are order-independent over doubles, unlike sums, so the result
    hash-matches across any distributed execution order)."""
    from ray.data.aggregate import Count, Max, Min

    return _read(sf_dir, "lineitem",
                 ["l_returnflag", "l_linestatus", "l_quantity"]).groupby(
        ["l_returnflag", "l_linestatus"]).aggregate(
        Count(alias_name="n_items"),
        Min("l_quantity", alias_name="min_qty"),
        Max("l_quantity", alias_name="max_qty"))


def q_lineitem_stats_sql() -> str:
    return ("SELECT l_returnflag, l_linestatus, count(*) AS n_items, "
            "min(l_quantity) AS min_qty, max(l_quantity) AS max_qty "
            "FROM lineitem GROUP BY 1, 2")


def q_hash_sample(sf_dir: str):
    """Deterministic 10% hash sample — stable across runs, block
    layouts, and cluster sizes (unlike seeded random_sample, whose
    draw depends on block structure); the SQL mirror is exact."""

    def samp(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ((k * 2654435761) % 4294967296) % 100 < 10
        return batch.filter(pa.array(keep))

    return _read(sf_dir, "events", ["event_id", "event_type"]).map_batches(
        samp, batch_format="pyarrow")


def q_hash_sample_sql() -> str:
    return ("SELECT event_id, event_type FROM events "
            "WHERE ((event_id * 2654435761) % 4294967296) % 100 < 10")


def q_distinct_types(sf_dir: str):
    """DISTINCT over a column (set op)."""
    ds = _read(sf_dir, "events", ["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pa.table({"event_type": pa.array(vals, pa.string())})


def q_distinct_types_sql() -> str:
    return "SELECT DISTINCT event_type FROM events"


def q_prefix_sums(sf_dir: str):
    """Per-user running (prefix) sum of event value in (ts, event_id)
    order — the windowed-SUM scan (stages/scan.py running_sum over
    coarse user buckets).  Values quantize to micro-unit int64 FIRST so
    the running sum is integer (order-of-summation-proof) and the SQL
    windowed SUM matches bit-for-bit."""
    from ..stages.scan import running_sum

    def quantize(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "v_micro",
            pa.array(np.floor(v * 1e6 + 0.5).astype(np.int64), pa.int64()))

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value"]).map_batches(
        quantize, batch_format="pyarrow")
    out = running_sum(ds, key="user_id", order=["ts", "event_id"],
                      val="v_micro", out_col="running_sum",
                      keep=["event_id"], n_rows=_nrows(sf_dir, "events"))
    return out.map_batches(
        lambda b: b.select(["event_id", "running_sum"]),
        batch_format="pyarrow")


def q_prefix_sums_sql() -> str:
    return (
        "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
        "CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v FROM events) "
        "SELECT event_id, CAST(sum(v) OVER (PARTITION BY user_id "
        "ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) "
        "AS running_sum FROM e"
    )


def q_lag_deltas(sf_dir: str):
    """Per-user LAG(ts): each event's previous event timestamp (µs) in
    (ts, event_id) order, -1 for the user's first event (stages/scan.py
    keyed_lag)."""
    from ..stages.scan import keyed_lag

    def to_us(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64())
        return b.append_column("ts_us", ts_us)

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"]).map_batches(
        to_us, batch_format="pyarrow")
    out = keyed_lag(ds, key="user_id", order=["ts_us", "event_id"],
                    val="ts_us", out_col="prev_ts_us", fill=-1,
                    keep=["event_id"], n_rows=_nrows(sf_dir, "events"))
    return out.map_batches(
        lambda b: b.select(["event_id", "prev_ts_us"]),
        batch_format="pyarrow")


def q_lag_deltas_sql() -> str:
    return (
        "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us "
        "FROM events) "
        "SELECT event_id, COALESCE(lag(ts_us) OVER (PARTITION BY user_id "
        "ORDER BY ts_us, event_id), -1) AS prev_ts_us FROM e"
    )


def q_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type — per-batch pair
    dedup combiner, one hash shuffle on the (type, user) pair, combiner
    tree for the bounded-cardinality final count
    (stages/agg_tree.py grouped_count_distinct)."""
    from ..stages.agg_tree import grouped_count_distinct

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return grouped_count_distinct(ds, "event_type", "user_id",
                                  out_col="n_users",
                                  n_rows=_nrows(sf_dir, "events"))


def q_distinct_users_sql() -> str:
    return ("SELECT event_type, COUNT(DISTINCT user_id) AS n_users "
            "FROM events GROUP BY event_type")


def q_quantiles(sf_dir: str):
    """Exact global quantiles of l_extendedprice WITHOUT a global sort:
    sampled-splitter selection with streaming range refinement
    (stages/quantiles.py exact_quantiles).  Values are raw elements of
    the column (rank = floor(q*(n-1)) of the ascending sort), so the
    hash compare against ORDER-BY-rank SQL is bit-exact."""
    from ..stages.quantiles import exact_quantiles

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    return exact_quantiles(ds, "l_extendedprice", [0.25, 0.5, 0.9, 0.99])


def q_quantiles_sql() -> str:
    return (
        "WITH s AS (SELECT l_extendedprice AS v, "
        "row_number() OVER (ORDER BY l_extendedprice) - 1 AS r, "
        "count(*) OVER () AS n FROM lineitem) "
        "SELECT CAST(b.q AS DOUBLE) AS q, s.v AS value FROM s "
        "JOIN (VALUES (0.25), (0.5), (0.9), (0.99)) b(q) "
        "ON s.r = CAST(floor(CAST(b.q AS DOUBLE) * (n - 1)) AS BIGINT)"
    )


def q_user_intersect(sf_dir: str):
    """DISTINCT big-ticket (value > 200) purchasers ∩ big-value
    error-reporters — set INTERSECT via one flagged hash shuffle
    (stages/setops.py keyed_set_op)."""
    from ..stages.setops import keyed_set_op

    return keyed_set_op(_events_of_type(sf_dir, "purchase", 200.0),
                        _events_of_type(sf_dir, "error", 200.0),
                        on="user_id", op="intersect")


def q_user_intersect_sql() -> str:
    return ("SELECT user_id FROM events "
            "WHERE event_type = 'purchase' AND value > 200.0 "
            "INTERSECT SELECT user_id FROM events "
            "WHERE event_type = 'error' AND value > 200.0")


def q_user_except(sf_dir: str):
    """DISTINCT big-ticket purchasers \\ big-value error-reporters —
    set EXCEPT on the same one-shuffle stage."""
    from ..stages.setops import keyed_set_op

    return keyed_set_op(_events_of_type(sf_dir, "purchase", 200.0),
                        _events_of_type(sf_dir, "error", 200.0),
                        on="user_id", op="except")


def q_user_except_sql() -> str:
    return ("SELECT user_id FROM events "
            "WHERE event_type = 'purchase' AND value > 200.0 "
            "EXCEPT SELECT user_id FROM events "
            "WHERE event_type = 'error' AND value > 200.0")


def q_heavy_hitters(sf_dir: str):
    """Exact word-bigram heavy hitters (freq > 1/800 of all bigrams)
    over documents.text without shuffling the unbounded bigram key
    space: per-block mergeable Misra-Gries summaries bound what rides
    the merge groupby, then the bounded candidate set is broadcast and
    recounted exactly (see stages/heavy.py).  Integer-only threshold
    (cnt*800 > N) so the DuckDB oracle is bit-identical."""
    from ..stages.heavy import bigram_items, exact_heavy_hitters

    grams = _read(sf_dir, "documents", ["text"]).map_batches(
        bigram_items, batch_format="pandas")
    return exact_heavy_hitters(grams, "item", phi_num=1, phi_den=800)


def q_heavy_hitters_sql() -> str:
    return (
        "WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),"
        " '[a-z0-9]+')) AS tok, generate_subscripts(regexp_extract_all("
        "lower(text), '[a-z0-9]+'), 1) AS i FROM documents), "
        "bg AS (SELECT a.tok || ' ' || b.tok AS item FROM toks a "
        "JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1) "
        "SELECT item, count(*) AS cnt FROM bg GROUP BY item "
        "HAVING count(*) * 800 > (SELECT count(*) FROM bg)"
    )


def q_order_lineitems(sf_dir: str):
    """Large×large inner equi-join (orders ⋈ lineitem on order key)
    through ONE coarse hash co-partition exchange + per-bucket Acero
    hash join (stages/joins.py::copart_hash_join) — NO broadcast side;
    both inputs co-partition by key hash, so the plan holds when
    neither fits a worker (the broadcast joins cover the small-side
    cases).  Revenue is quantized to 1e-4 units (floor(x*1e4+0.5)) so
    the per-row float product hashes bit-identically vs DuckDB."""
    from ..stages.joins import copart_hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_linenumber", "l_partkey",
                  "l_extendedprice", "l_discount"])

    j = copart_hash_join(
        orders, line, "o_orderkey", "l_orderkey",
        n_rows=_nrows(sf_dir, "orders") + _nrows(sf_dir, "lineitem"))

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 1e4 + 0.5).astype(np.int64)
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_custkey": b["o_custkey"],
            "l_linenumber": pc.cast(b["l_linenumber"], pa.int64()),
            "l_partkey": b["l_partkey"],
            "rev_q4": pa.array(rev),
        })

    return j.map_batches(finish, batch_format="pyarrow")


def q_order_lineitems_sql() -> str:
    return (
        "SELECT o_orderkey, o_custkey, CAST(l_linenumber AS BIGINT) AS "
        "l_linenumber, l_partkey, CAST(floor(l_extendedprice * "
        "(1.0 - l_discount) * 1e4 + 0.5) AS BIGINT) AS rev_q4 "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey"
    )


def q_skew_join(sf_dir: str):
    """Skew-resistant inner join (events ⋈ customer on user key):
    Misra-Gries hot-key detection routes heavy keys through a bounded
    broadcast merge while cold keys take the hash-shuffle join — one
    viral key can no longer serialize a partition
    (stages/joins.py::skew_hybrid_join; output is bit-identical to the
    plain join, which is what the oracle checks).  At phi=1/200 on
    events most users clear the threshold, so BOTH paths carry rows in
    the driver run."""
    from ..stages.joins import skew_hybrid_join

    events = _read(sf_dir, "events", ["user_id", "event_type"])
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_mktsegment"])
    j = skew_hybrid_join(events, cust, "user_id", "c_custkey",
                         phi_num=1, phi_den=200)

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.set_column(b.schema.get_field_index("c_nationkey"),
                            "c_nationkey",
                            pc.cast(b["c_nationkey"], pa.int64()))

    return j.map_batches(finish, batch_format="pyarrow")


def q_skew_join_sql() -> str:
    return (
        "SELECT user_id, event_type, CAST(c_nationkey AS BIGINT) AS "
        "c_nationkey, c_mktsegment FROM events "
        "JOIN customer ON user_id = c_custkey"
    )


def q_profile_lineitem(sf_dir: str) -> pd.DataFrame:
    """Data-quality profile (count / nulls / min / max) of six lineitem
    columns in ONE streaming pass: per-block wide partial rows folded
    by a map_batches tree (see stages/profile.py) — the naive oracle
    runs six aggregate scans where this runs one."""
    from ..stages.profile import profile_columns

    return profile_columns(_read(sf_dir, "lineitem", _PROFILE_COLS),
                           _PROFILE_COLS)


def q_profile_lineitem_sql() -> str:
    parts = [
        f"SELECT '{c}' AS \"column\", count(*) AS n, "
        f"count(*) - count({c}) AS nulls, "
        f"CAST(min({c}) AS VARCHAR) AS min_s, "
        f"CAST(max({c}) AS VARCHAR) AS max_s FROM lineitem"
        for c in _PROFILE_COLS]
    return " UNION ALL ".join(parts)


def q_order_pivot(sf_dir: str):
    """Wide pivot: per customer-bucket order counts spread into one
    column per order priority (stages/setops.py pivot_counts on the
    bounded-key combiner tree — per-batch vectorized partial pivots,
    no all-to-all)."""
    from ..stages.setops import pivot_counts

    def bucket(b: pa.Table) -> pa.Table:
        k = b["o_custkey"].to_numpy(zero_copy_only=False)
        return b.append_column("cust_bucket",
                               pa.array(k % 100, pa.int64()))

    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderpriority"]).map_batches(
        bucket, batch_format="pyarrow")
    return pivot_counts(ds, "cust_bucket", "o_orderpriority", _PRIORITIES)


def q_order_pivot_sql() -> str:
    cols = ", ".join(
        f"COUNT(*) FILTER (WHERE o_orderpriority = '{p}') AS \"n_{p}\""
        for p in _PRIORITIES)
    return (f"SELECT o_custkey % 100 AS cust_bucket, {cols} "
            "FROM orders GROUP BY cust_bucket")


def q_group_stats(sf_dir: str):
    """Exact distributed stddev/correlation per l_returnflag via integer
    moment partials + bounded-key combiner tree (stages/moments.py).
    x = l_quantity (integral in TPC-H), y = l_partkey % 97; outputs are
    micro-ints computed in a pinned float-op order (see moments.py)."""
    from ..stages.moments import grouped_moments

    def derive(b: pa.Table) -> pa.Table:
        q = b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = b["l_partkey"].to_numpy(zero_copy_only=False) % 97
        return pa.table({"l_returnflag": b["l_returnflag"],
                         "x": pa.array(q), "y": pa.array(p)})

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_partkey"]).map_batches(
        derive, batch_format="pyarrow")
    return grouped_moments(ds, "l_returnflag", "x", "y")


def q_group_stats_sql() -> str:
    from ..stages.moments import moments_sql

    return moments_sql("lineitem", "l_returnflag",
                       "CAST(l_quantity AS BIGINT)", "l_partkey % 97")


def q_rollup_orders(sf_dir: str):
    """GROUP BY ROLLUP(o_orderpriority, o_orderstatus): per-batch Arrow
    partials → combiner tree to the leaf grid (≤ 15 rows), then the
    subtotal and grand-total levels re-aggregate the LEAF table inside
    the same final block — upper rollup levels are derivable from leaf
    partials, so no second pass over the data.  'ALL' marks rolled-up
    levels (the tables contain no such value)."""
    from ..stages.agg_tree import tree_aggregate

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"o_orderpriority": b["o_orderpriority"],
                      "o_orderstatus": b["o_orderstatus"],
                      "n_orders": pa.array(
                          np.ones(b.num_rows, np.int64)),
                      "min_key": b["o_orderkey"]})
        g = t.group_by(["o_orderpriority", "o_orderstatus"]).aggregate(
            [("n_orders", "sum"), ("min_key", "min")])
        return g.rename_columns(
            ["o_orderpriority", "o_orderstatus", "n_orders", "min_key"])

    def rollup(leaf: pa.Table) -> pa.Table:
        if leaf.num_rows == 0:
            return leaf
        d = leaf.to_pandas()
        lv1 = (d.groupby("o_orderpriority", as_index=False)
               .agg(n_orders=("n_orders", "sum"), min_key=("min_key", "min")))
        lv1["o_orderstatus"] = "ALL"
        lv0 = pd.DataFrame({
            "o_orderpriority": ["ALL"], "o_orderstatus": ["ALL"],
            "n_orders": [d["n_orders"].sum()],
            "min_key": [d["min_key"].min()]})
        out = pd.concat([d, lv1, lv0], ignore_index=True)[
            ["o_orderpriority", "o_orderstatus", "n_orders", "min_key"]]
        return pa.Table.from_pandas(out, preserve_index=False)

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderpriority", "o_orderstatus"])
    partials = ds.map_batches(partial, batch_format="pyarrow")
    leaf = tree_aggregate(partials, ["o_orderpriority", "o_orderstatus"],
                          [("n_orders", "sum"), ("min_key", "min")])
    return leaf.map_batches(rollup, batch_format="pyarrow")


def q_rollup_orders_sql() -> str:
    return (
        "WITH leaf AS (SELECT o_orderpriority AS p, o_orderstatus AS s, "
        "count(*) AS n, min(o_orderkey) AS mk FROM orders GROUP BY 1, 2) "
        "SELECT COALESCE(p, 'ALL') AS o_orderpriority, "
        "COALESCE(s, 'ALL') AS o_orderstatus, "
        "CAST(sum(n) AS BIGINT) AS n_orders, min(mk) AS min_key "
        "FROM leaf GROUP BY ROLLUP(p, s)"
    )


def q_cube_orders(sf_dir: str):
    """GROUP BY CUBE(o_orderpriority, o_orderstatus): all four
    grouping-set levels re-derived from the bounded leaf grid of
    q_rollup_orders — still one pass over the data."""
    from ..stages.agg_tree import tree_aggregate

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"o_orderpriority": b["o_orderpriority"],
                      "o_orderstatus": b["o_orderstatus"],
                      "n_orders": pa.array(np.ones(b.num_rows, np.int64)),
                      "min_key": b["o_orderkey"]})
        g = t.group_by(["o_orderpriority", "o_orderstatus"]).aggregate(
            [("n_orders", "sum"), ("min_key", "min")])
        return g.rename_columns(
            ["o_orderpriority", "o_orderstatus", "n_orders", "min_key"])

    def cube(leaf: pa.Table) -> pa.Table:
        if leaf.num_rows == 0:
            return leaf
        d = leaf.to_pandas()
        outs = [d]
        for keep_col, all_col in (("o_orderpriority", "o_orderstatus"),
                                  ("o_orderstatus", "o_orderpriority")):
            lv = (d.groupby(keep_col, as_index=False)
                  .agg(n_orders=("n_orders", "sum"),
                       min_key=("min_key", "min")))
            lv[all_col] = "ALL"
            outs.append(lv)
        outs.append(pd.DataFrame({
            "o_orderpriority": ["ALL"], "o_orderstatus": ["ALL"],
            "n_orders": [d["n_orders"].sum()],
            "min_key": [d["min_key"].min()]}))
        out = pd.concat(outs, ignore_index=True)[
            ["o_orderpriority", "o_orderstatus", "n_orders", "min_key"]]
        return pa.Table.from_pandas(out, preserve_index=False)

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderpriority", "o_orderstatus"])
    partials = ds.map_batches(partial, batch_format="pyarrow")
    leaf = tree_aggregate(partials, ["o_orderpriority", "o_orderstatus"],
                          [("n_orders", "sum"), ("min_key", "min")])
    return leaf.map_batches(cube, batch_format="pyarrow")


def q_cube_orders_sql() -> str:
    return (
        "WITH leaf AS (SELECT o_orderpriority AS p, o_orderstatus AS s, "
        "count(*) AS n, min(o_orderkey) AS mk FROM orders GROUP BY 1, 2) "
        "SELECT COALESCE(p, 'ALL') AS o_orderpriority, "
        "COALESCE(s, 'ALL') AS o_orderstatus, "
        "CAST(sum(n) AS BIGINT) AS n_orders, min(mk) AS min_key "
        "FROM leaf GROUP BY CUBE(p, s)"
    )


def q_group_mode(sf_dir: str):
    """Per-bucket MODE (most frequent event_type, ties broken
    lexicographically): per-batch count partials → combiner tree over
    the bounded (bucket × type) grid → vectorized argmax in the final
    ≤ 500-row block.  The mode of a union is derivable from count
    partials, so no row-level shuffle occurs."""
    from ..stages.agg_tree import tree_aggregate

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "bucket": pa.array(
                b["user_id"].to_numpy(zero_copy_only=False) % 100),
            "event_type": b["event_type"],
            "n": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by(["bucket", "event_type"]).aggregate([("n", "sum")])
        return g.rename_columns(["bucket", "event_type", "n"])

    def pick(counts: pa.Table) -> pa.Table:
        if counts.num_rows == 0:
            return counts
        d = counts.to_pandas().sort_values(
            ["bucket", "n", "event_type"],
            ascending=[True, False, True], kind="mergesort")
        top = d.drop_duplicates("bucket", keep="first")
        top = top.rename(columns={"event_type": "mode_type"})
        return pa.Table.from_pandas(
            top[["bucket", "mode_type", "n"]], preserve_index=False)

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    partials = ds.map_batches(partial, batch_format="pyarrow")
    counts = tree_aggregate(partials, ["bucket", "event_type"],
                            [("n", "sum")])
    return counts.map_batches(pick, batch_format="pyarrow")


def q_group_mode_sql() -> str:
    return (
        "WITH c AS (SELECT user_id % 100 AS bucket, event_type, "
        "count(*) AS n FROM events GROUP BY 1, 2), "
        "r AS (SELECT bucket, event_type, n, row_number() OVER ("
        "PARTITION BY bucket ORDER BY n DESC, event_type) AS rn FROM c) "
        "SELECT bucket, event_type AS mode_type, CAST(n AS BIGINT) AS n "
        "FROM r WHERE rn = 1"
    )


def q_rank_events(sf_dir: str):
    """Distributed ROW_NUMBER + NTILE(4) per event_type ordered by
    (value DESC, event_id) — the keyed_scan coarse-bucket shape
    (stages/scan.py): types never straddle buckets, each bucket ranks
    all its types in one vectorized pass."""
    from ..stages.scan import keyed_scan

    def hash_type(k: np.ndarray) -> np.ndarray:
        import zlib

        uniq, inv = np.unique(k.astype("U"), return_inverse=True)
        codes = np.array([zlib.crc32(u.encode()) for u in uniq], np.int64)
        return codes[inv]

    def rank(d: pd.DataFrame) -> pd.DataFrame:
        g = d.groupby("event_type", sort=False)
        i = g.cumcount().to_numpy()
        cnt = g["event_id"].transform("size").to_numpy()
        size, rem = cnt // 4, cnt % 4
        cut = rem * (size + 1)
        in_big = i < cut
        tile = np.where(
            in_big, i // np.maximum(size + 1, 1),
            rem + (i - cut) // np.maximum(size, 1)) + 1
        out = d[["event_id", "event_type"]].copy()
        out["rnk"] = i + 1
        out["tile4"] = tile.astype(np.int64)
        return out

    def negv(b: pa.Table) -> pa.Table:
        return b.append_column(
            "neg_value",
            pa.array(-b["value"].to_numpy(zero_copy_only=False)))

    ds = _read(sf_dir, "events",
               ["event_id", "event_type", "value"]).map_batches(
        negv, batch_format="pyarrow")
    return keyed_scan(ds, key="event_type", order=["neg_value", "event_id"],
                      fn=rank, n_buckets=8, hash_key=hash_type)


def q_rank_events_sql() -> str:
    return (
        "SELECT event_id, event_type, "
        "CAST(row_number() OVER w AS BIGINT) AS rnk, "
        "CAST(ntile(4) OVER w AS BIGINT) AS tile4 FROM events "
        "WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)"
    )


def q_group_concat(sf_dir: str):
    """Ordered STRING_AGG per nation (collect-list) via the
    stages/scan.py coarse-bucket shape: buckets auto-scale to a row
    budget and keys never straddle buckets, so the same plan holds for
    unbounded key spaces; rows arrive (key, c_name)-sorted, making the
    concatenation order deterministic (hash-comparable).  The join
    itself is per-key (string_agg is inherently so) but runs inside
    pandas' groupby-agg over each bucket, never one Ray group per
    key."""
    from ..stages.scan import keyed_scan

    def agg(d: pd.DataFrame) -> pd.DataFrame:
        g = d.groupby("c_nationkey", sort=False)
        names = g["c_name"].agg(",".join)
        return pd.DataFrame({
            "c_nationkey": names.index.to_numpy().astype(np.int64),
            "names": names.to_numpy(),
            "n": g.size().to_numpy().astype(np.int64)})

    ds = _read(sf_dir, "customer", ["c_name", "c_nationkey"])
    return keyed_scan(ds, key="c_nationkey", order=["c_name"], fn=agg,
                      n_rows=_nrows(sf_dir, "customer"))


def q_group_concat_sql() -> str:
    return (
        "SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, "
        "string_agg(c_name, ',' ORDER BY c_name) AS names, "
        "CAST(count(*) AS BIGINT) AS n FROM customer GROUP BY c_nationkey"
    )


def q_percentile_cont(sf_dir: str):
    """Interpolated PERCENTILE_CONT without a global sort
    (stages/quantiles.py::percentile_cont): bracketing order statistics
    via sampled-splitter selection, pinned-float interpolation."""
    from ..stages.quantiles import percentile_cont

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    return percentile_cont(ds, "l_extendedprice", [0.25, 0.5, 0.9, 0.99])


def q_percentile_cont_sql() -> str:
    return (
        "WITH s AS (SELECT l_extendedprice AS v, "
        "row_number() OVER (ORDER BY l_extendedprice) - 1 AS r, "
        "count(*) OVER () AS n FROM lineitem), "
        "t AS (SELECT CAST(b.q AS DOUBLE) AS q, "
        "CAST(b.q AS DOUBLE) * (sn.n - 1) AS h, sn.n FROM "
        "(VALUES (0.25), (0.5), (0.9), (0.99)) b(q) "
        "CROSS JOIN (SELECT DISTINCT n FROM s) sn(n)) "
        "SELECT t.q, lo.v + (t.h - floor(t.h)) * (hi.v - lo.v) AS value "
        "FROM t JOIN s lo ON lo.r = CAST(floor(t.h) AS BIGINT) "
        "JOIN s hi ON hi.r = CAST(least(floor(t.h) + 1, t.n - 1) AS BIGINT)"
    )


def q_star_join(sf_dir: str):
    """Star-schema join (TPC-H Q5/Q9 shape): the lineitem fact stream
    joins two broadcast dimensions (supplier → nation) in one fused
    map pass — no shuffle touches the fact table; the aggregate is the
    bounded-key combiner tree."""
    from ..stages.agg_tree import tree_aggregate
    from ..stages.joins import broadcast_hash_join

    import pyarrow.parquet as pq

    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"]).to_pandas()
    dim = sup.merge(nat, left_on="s_nationkey", right_on="n_nationkey")[
        ["s_suppkey", "n_name"]]

    ds = _read(sf_dir, "lineitem", ["l_suppkey", "l_quantity"])
    joined = broadcast_hash_join(ds, dim, on="l_suppkey",
                                 small_on="s_suppkey")

    def partial(b: pd.DataFrame) -> pa.Table:
        q = b["l_quantity"].to_numpy().astype(np.int64)
        t = pa.table({"n_name": pa.array(b["n_name"].to_numpy(), pa.string()),
                      "sum_qty": pa.array(q, pa.int64()),
                      "n_items": pa.array(np.ones(len(b), np.int64))})
        g = t.group_by(["n_name"]).aggregate(
            [("sum_qty", "sum"), ("n_items", "sum")])
        return g.rename_columns(["n_name", "sum_qty", "n_items"])

    partials = joined.map_batches(partial, batch_format="pandas")
    return tree_aggregate(partials, ["n_name"],
                          [("sum_qty", "sum"), ("n_items", "sum")])


def q_star_join_sql() -> str:
    return (
        "SELECT n_name, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) "
        "AS sum_qty, CAST(count(*) AS BIGINT) AS n_items "
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name"
    )


def q_upsert_merge(sf_dir: str):
    """Changelog (CDC) merge: base = even events, updates = odd events
    keyed by ``user_id % 500``; latest wins by (ts, event_id).  The
    keyed_scan bucket shape with a vectorized LAST-of-run mask — the
    symmetric twin of throttle_dedup's first-of-run."""
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array(u % 500, pa.int64()),
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "value": b["value"]})

    def last(d: pd.DataFrame) -> pd.DataFrame:
        k = d["k"].to_numpy()
        mask = np.r_[k[1:] != k[:-1], True]
        out = d.loc[mask, ["k", "event_id", "value"]].copy()
        return out.rename(columns={"k": "merge_key",
                                   "event_id": "latest_event"})

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="k", order=["t", "event_id"], fn=last,
                      n_rows=_nrows(sf_dir, "events"))


def q_upsert_merge_sql() -> str:
    return (
        "WITH e AS (SELECT user_id % 500 AS merge_key, epoch_us(ts) AS t, "
        "event_id, value FROM events) "
        "SELECT merge_key, event_id AS latest_event, value FROM e "
        "QUALIFY row_number() OVER (PARTITION BY merge_key "
        "ORDER BY t DESC, event_id DESC) = 1"
    )


def q_mad(sf_dir: str):
    """Median absolute deviation of l_extendedprice — two composed
    exact order-statistic passes (stages/quantiles.py::select_ranks):
    the median from pass one parameterizes a derived |x - m| column
    for pass two; neither pass sorts or materializes the data.  The
    absolute-difference derivation is one exact float subtraction, so
    the SQL oracle matches bit-for-bit."""
    from ..stages.quantiles import select_ranks

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    n = ds.count()
    r = (n - 1) // 2
    med = select_ranks(ds, "l_extendedprice", [r])[r]

    def deviate(b: pa.Table, m=med) -> pa.Table:
        x = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table({"dev": pa.array(np.abs(x - m))})

    dev = ds.map_batches(deviate, batch_format="pyarrow")
    mad = select_ranks(dev, "dev", [r])[r]
    return pd.DataFrame({"median": [float(med)], "mad": [float(mad)]})


def q_mad_sql() -> str:
    return (
        "WITH s AS (SELECT l_extendedprice AS v, row_number() OVER ("
        "ORDER BY l_extendedprice) - 1 AS r, count(*) OVER () AS n "
        "FROM lineitem), "
        "m AS (SELECT v FROM s WHERE r = (n - 1) // 2), "
        "d AS (SELECT abs(l_extendedprice - (SELECT v FROM m)) AS dv "
        "FROM lineitem), "
        "t AS (SELECT dv, row_number() OVER (ORDER BY dv) - 1 AS r, "
        "count(*) OVER () AS n FROM d) "
        "SELECT (SELECT v FROM m) AS median, dv AS mad FROM t "
        "WHERE r = (n - 1) // 2"
    )


def q_equidepth_hist(sf_dir: str):
    """10-bucket equi-depth histogram of l_extendedprice: the 9
    interior edges are EXACT order statistics (select_ranks — no
    sort), bucket membership is a half-open searchsorted against the
    broadcast edges, counts aggregate on the combiner tree.  Duplicate
    values never split across buckets (unlike NTILE), so the SQL
    oracle counts with the same half-open interval rule."""
    from ..stages.agg_tree import tree_aggregate
    from ..stages.quantiles import select_ranks

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    n = ds.count()
    ranks = [int(np.floor(q * (n - 1))) for q in
             (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)]
    vals = select_ranks(ds, "l_extendedprice", sorted(set(ranks)))
    edges = np.array([vals[r] for r in sorted(set(ranks))], np.float64)

    def bucketize(b: pa.Table, e=edges) -> pa.Table:
        x = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        bk = np.searchsorted(e, x, side="right")
        t = pa.table({"bucket": pa.array(bk.astype(np.int64)),
                      "n": pa.array(np.ones(len(x), np.int64))})
        g = t.group_by(["bucket"]).aggregate([("n", "sum")])
        return g.rename_columns(["bucket", "n"])

    return tree_aggregate(ds.map_batches(bucketize, batch_format="pyarrow"),
                          ["bucket"], [("n", "sum")])


def q_equidepth_hist_sql() -> str:
    return (
        "WITH s AS (SELECT l_extendedprice AS v, row_number() OVER ("
        "ORDER BY l_extendedprice) - 1 AS r, count(*) OVER () AS n "
        "FROM lineitem), "
        "e AS (SELECT CAST(b.q AS DOUBLE) AS q, s.v FROM s JOIN "
        "(VALUES (0.1), (0.2), (0.3), (0.4), (0.5), (0.6), (0.7), "
        "(0.8), (0.9)) b(q) "
        "ON s.r = CAST(floor(CAST(b.q AS DOUBLE) * (n - 1)) AS BIGINT)) "
        "SELECT CAST((SELECT count(*) FROM e WHERE e.v <= l.l_extendedprice)"
        " AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n "
        "FROM lineitem l GROUP BY 1"
    )


def q_ratio_to_report(sf_dir: str):
    """Ratio-to-report window (each event's share of its type's total):
    totals are exact integer sums of micro-quantized values (one tiny
    combiner-tree pass, broadcast back), shares one pinned double
    division per row — no row shuffle at all, and no float-sum
    order-dependence."""
    import ray

    from ..stages.agg_tree import tree_aggregate

    def quantize(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        t = pa.table({"event_type": b["event_type"],
                      "event_id": b["event_id"],
                      "v_micro": pa.array(
                          np.floor(v * 1e6 + 0.5).astype(np.int64))})
        return t

    ds = _read(sf_dir, "events",
               ["event_id", "event_type", "value"]).map_batches(
        quantize, batch_format="pyarrow").materialize()

    def partial(b: pa.Table) -> pa.Table:
        g = (b.select(["event_type", "v_micro"])
             .group_by(["event_type"]).aggregate([("v_micro", "sum")]))
        return g.rename_columns(["event_type", "total"])

    totals = tree_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                            ["event_type"], [("total", "sum")]).to_pandas()
    ref = ray.put(dict(zip(totals["event_type"], totals["total"])))

    def share(b: pa.Table) -> pa.Table:
        import ray as _ray

        tot = _ray.get(ref)
        et = b["event_type"].to_pylist()
        v = b["v_micro"].to_numpy(zero_copy_only=False)
        t = np.array([tot[e] for e in et], np.int64)
        s = np.floor(v.astype(np.float64) / t.astype(np.float64)
                     * 1e6 + 0.5).astype(np.int64)
        return pa.table({"event_id": b["event_id"],
                         "share_micro": pa.array(s, pa.int64())})

    return ds.map_batches(share, batch_format="pyarrow")


def q_ratio_to_report_sql() -> str:
    return (
        "WITH e AS (SELECT event_id, event_type, "
        "CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v FROM events) "
        "SELECT event_id, CAST(floor(CAST(v AS DOUBLE) / "
        "CAST(sum(v) OVER (PARTITION BY event_type) AS DOUBLE) "
        "* 1000000 + 0.5) AS BIGINT) AS share_micro FROM e"
    )


def q_full_outer(sf_dir: str):
    """FULL OUTER equi-join through one hash co-partition exchange +
    per-bucket Acero full-outer join (stages/joins.py::
    copart_hash_join; NO broadcast side): BUILDING-segment customers ⋈
    per-customer count of 'F'-status orders.  Both null sides are real
    — customers with no F orders and F orders from other segments'
    customers — and are filled with -1 (COALESCE on both sides keeps
    schemas nullable-free).  The pre-join count aggregates per
    customer key via the coarse hash-bucket scan (stages/scan.py), the
    unbounded-key path: batch-local Arrow group_by combiner, then one
    keyed exchange."""
    import pyarrow.compute as pc

    from ..stages.joins import copart_hash_join
    from ..stages.scan import hash_bucket_scan

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_acctbal", "c_mktsegment"])

    def filt_cust(b: pa.Table) -> pa.Table:
        m = pc.equal(b["c_mktsegment"], "BUILDING")
        t = b.filter(m)
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        q2 = np.floor(bal * 100.0 + 0.5).astype(np.int64)
        return pa.table({"c_custkey": t["c_custkey"],
                         "acctbal_q2": pa.array(q2, pa.int64())})

    left = cust.map_batches(filt_cust, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])

    def partial_counts(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["o_orderstatus"], "F"))
        g = t.select(["o_custkey"]).group_by(["o_custkey"]).aggregate(
            [("o_custkey", "count")])
        return g.rename_columns(["o_custkey", "n_f_orders"])

    def bucket_sum(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_custkey"]).aggregate([("n_f_orders", "sum")])
        return g.rename_columns(["o_custkey", "n_f_orders"])

    right = hash_bucket_scan(
        orders.map_batches(partial_counts, batch_format="pyarrow"),
        ["o_custkey"], bucket_sum, n_rows=_nrows(sf_dir, "orders"))

    j = copart_hash_join(
        left, right, "c_custkey", "o_custkey", how="full_outer",
        n_rows=_nrows(sf_dir, "customer"),
        left_schema=pa.schema([("c_custkey", pa.int64()),
                               ("acctbal_q2", pa.int64())]),
        right_schema=pa.schema([("o_custkey", pa.int64()),
                                ("n_f_orders", pa.int64())]))

    def finish(b: pa.Table) -> pa.Table:
        # the full_outer join coalesces the two key columns into the
        # left key name (right-only rows carry their key there)
        return pa.table({
            "custkey": pc.cast(b["c_custkey"], pa.int64()),
            "acctbal_q2": pc.cast(
                pc.coalesce(b["acctbal_q2"], pa.scalar(-1)), pa.int64()),
            "n_f_orders": pc.cast(
                pc.coalesce(b["n_f_orders"], pa.scalar(-1)), pa.int64()),
        })

    return j.map_batches(finish, batch_format="pyarrow")


def q_full_outer_sql() -> str:
    return (
        "WITH c AS (SELECT c_custkey, CAST(floor(c_acctbal * 100.0 + 0.5) "
        "AS BIGINT) AS acctbal_q2 FROM customer "
        "WHERE c_mktsegment = 'BUILDING'), "
        "o AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_f_orders "
        "FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey) "
        "SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey, "
        "COALESCE(c.acctbal_q2, -1) AS acctbal_q2, "
        "COALESCE(o.n_f_orders, -1) AS n_f_orders "
        "FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey"
    )


def q_dense_rank(sf_dir: str):
    """DENSE_RANK per event_type over floor(value) DESC (the integer
    floor guarantees real tie groups).  Coarse-bucket keyed scan;
    within each sorted bucket the rank is one cumsum over
    value-change flags with per-type base subtraction — no per-key
    loop."""
    from ..stages.scan import keyed_scan

    def hash_type(k: np.ndarray) -> np.ndarray:
        import zlib

        uniq, inv = np.unique(k.astype("U"), return_inverse=True)
        codes = np.array([zlib.crc32(u.encode()) for u in uniq], np.int64)
        return codes[inv]

    def prep(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        nvq = -np.floor(v).astype(np.int64)
        return pa.table({"event_id": b["event_id"],
                         "event_type": b["event_type"],
                         "neg_vq": pa.array(nvq, pa.int64())})

    def scan(d: pd.DataFrame) -> pd.DataFrame:
        t = d["event_type"].to_numpy()
        v = d["neg_vq"].to_numpy()
        new_type = np.ones(len(d), dtype=bool)
        new_type[1:] = t[1:] != t[:-1]
        new_val = new_type.copy()
        new_val[1:] |= v[1:] != v[:-1]
        s = np.cumsum(new_val)
        starts = np.flatnonzero(new_type)
        sizes = np.diff(np.append(starts, len(d)))
        base = np.repeat(s[starts], sizes)
        return pd.DataFrame({"event_id": d["event_id"].to_numpy(),
                             "drank": (s - base + 1).astype(np.int64)})

    ds = _read(sf_dir, "events",
               ["event_id", "event_type", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="event_type", order=["neg_vq"], fn=scan,
                      n_buckets=8, hash_key=hash_type)


def q_dense_rank_sql() -> str:
    return (
        "SELECT event_id, CAST(dense_rank() OVER (PARTITION BY event_type "
        "ORDER BY CAST(floor(value) AS BIGINT) DESC) AS BIGINT) AS drank "
        "FROM events"
    )


def q_corr_flags(sf_dir: str):
    """Pearson correlation of (quantity, price) per returnflag in
    EXACT integer arithmetic end-to-end: per-batch int64 partial sums
    (n, Σx, Σy, Σxy, Σx², Σy² over unit-quantized values — Σy² stays
    < 2^63 up to ~10^8 rows at these magnitudes; beyond that, split y
    into hi/lo limbs), a combiner tree over the 3-flag key space, and
    the final n·Σxy − ΣxΣy / √(..)·√(..) in PYTHON ints (arbitrary
    precision — the n·Σ products overflow int64 by design) with one
    pinned float expression at the end, mirrored exactly by the
    oracle's HUGEINT sums + DOUBLE casts."""
    import math

    import ray

    from ..stages.agg_tree import tree_aggregate

    def partial(b: pa.Table) -> pa.Table:
        x = np.floor(b["l_quantity"].to_numpy(zero_copy_only=False)
                     + 0.5).astype(np.int64)
        y = np.floor(b["l_extendedprice"].to_numpy(zero_copy_only=False)
                     + 0.5).astype(np.int64)
        t = pa.table({"flag": b["l_returnflag"],
                      "n": pa.array(np.ones(len(x), np.int64)),
                      "sx": pa.array(x), "sy": pa.array(y),
                      "sxy": pa.array(x * y), "sxx": pa.array(x * x),
                      "syy": pa.array(y * y)})
        g = t.group_by(["flag"]).aggregate(
            [(c, "sum") for c in ("n", "sx", "sy", "sxy", "sxx", "syy")])
        return g.rename_columns(["flag", "n", "sx", "sy", "sxy",
                                 "sxx", "syy"])

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])
    sums = tree_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), ["flag"],
        [(c, "sum") for c in ("n", "sx", "sy", "sxy", "sxx", "syy")])
    df = sums.to_pandas()  # ≤ |distinct flags| rows

    flags, ns, corr = [], [], []
    for _, r in df.sort_values("flag").iterrows():
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxy, sxx, syy = int(r["sxy"]), int(r["sxx"]), int(r["syy"])
        num = n * sxy - sx * sy          # exact python ints
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        c = math.floor(1e6 * (float(num)
                              / (math.sqrt(float(dx))
                                 * math.sqrt(float(dy)))) + 0.5)
        flags.append(r["flag"])
        ns.append(n)
        corr.append(c)
    return pd.DataFrame({"flag": flags,
                         "n": np.array(ns, np.int64),
                         "corr_micro": np.array(corr, np.int64)})


def q_corr_flags_sql() -> str:
    return (
        "WITH l AS (SELECT l_returnflag AS flag, "
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS x, "
        "CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y FROM lineitem), "
        "s AS (SELECT flag, count(*) AS n, sum(x) AS sx, sum(y) AS sy, "
        "sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy "
        "FROM l GROUP BY flag) "
        "SELECT flag, CAST(n AS BIGINT) AS n, "
        "CAST(floor(1e6 * (CAST(n*sxy - sx*sy AS DOUBLE) / "
        "(sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * "
        "sqrt(CAST(n*syy - sy*sy AS DOUBLE)))) + 0.5) AS BIGINT) "
        "AS corr_micro FROM s"
    )


def q_pct_rank(sf_dir: str):
    """PERCENT_RANK + CUME_DIST per event_type over floor(value):
    coarse-bucket keyed scan; within a sorted bucket both statistics
    are run-boundary arithmetic (first/last index of each tie run
    inside its type segment) — no per-key loop.  The two divisions are
    single pinned double ops of small ints, identical on the SQL side,
    so the doubles hash-match."""
    from ..stages.scan import keyed_scan

    def hash_type(k: np.ndarray) -> np.ndarray:
        import zlib

        uniq, inv = np.unique(k.astype("U"), return_inverse=True)
        codes = np.array([zlib.crc32(u.encode()) for u in uniq], np.int64)
        return codes[inv]

    def prep(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({"event_id": b["event_id"],
                         "event_type": b["event_type"],
                         "vq": pa.array(np.floor(v).astype(np.int64),
                                        pa.int64())})

    def scan(d: pd.DataFrame) -> pd.DataFrame:
        t = d["event_type"].to_numpy()
        v = d["vq"].to_numpy()
        m = len(d)
        new_type = np.ones(m, dtype=bool)
        new_type[1:] = t[1:] != t[:-1]
        new_val = new_type.copy()
        new_val[1:] |= v[1:] != v[:-1]
        seg_starts = np.flatnonzero(new_type)
        seg_sizes = np.diff(np.append(seg_starts, m))
        run_starts = np.flatnonzero(new_val)
        run_sizes = np.diff(np.append(run_starts, m))
        run_ends = np.append(run_starts[1:], m) - 1
        seg_start = np.repeat(seg_starts, seg_sizes)
        n = np.repeat(seg_sizes, seg_sizes).astype(np.float64)
        rank = (np.repeat(run_starts, run_sizes) - seg_start + 1
                ).astype(np.float64)
        cume = (np.repeat(run_ends, run_sizes) - seg_start + 1
                ).astype(np.float64)
        pct = np.where(n > 1.0, (rank - 1.0) / (n - 1.0), 0.0)
        return pd.DataFrame({"event_id": d["event_id"].to_numpy(),
                             "pct_rank": pct,
                             "cume": cume / n})

    ds = _read(sf_dir, "events",
               ["event_id", "event_type", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="event_type", order=["vq"], fn=scan,
                      n_buckets=8, hash_key=hash_type)


def q_pct_rank_sql() -> str:
    return (
        "SELECT event_id, "
        "percent_rank() OVER w AS pct_rank, cume_dist() OVER w AS cume "
        "FROM events WINDOW w AS (PARTITION BY event_type "
        "ORDER BY CAST(floor(value) AS BIGINT))"
    )


def q_type_entropy(sf_dir: str):
    """Shannon entropy of each event_type's user-activity distribution
    in nano-units: each (type, user) cell contributes the integer
    floor(-(p·ln p)·1e9 + 0.5) and the per-type entropy is the exact
    integer SUM of those terms — summation-order-proof (the house
    rule for transcendental outputs).  ln goes through math.log (libm:
    bit-identical to DuckDB's ln; numpy's SIMD log drifts 1 ulp on
    ~3 % of inputs — measured).  Shape: one pair-key hash shuffle
    makes (type, user) counts exact (user cardinality unbounded);
    per-type totals and the final term sum ride the combiner tree
    (type cardinality bounded)."""
    import math

    import ray

    from ..stages.agg_tree import tree_aggregate, tree_aggregate_to_table
    from ..stages.scan import hash_bucket_scan

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def local_counts(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "user_id"]).aggregate(
            [("user_id", "count")])
        return g.rename_columns(["event_type", "user_id", "c"])

    def bucket_counts(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "user_id"]).aggregate([("c", "sum")])
        return g.rename_columns(["event_type", "user_id", "c"])

    partial = ds.map_batches(local_counts, batch_format="pyarrow")
    pairs = hash_bucket_scan(partial, ["user_id"], bucket_counts,
                             n_rows=_nrows(sf_dir, "events"))
    totals = tree_aggregate_to_table(pairs, ["event_type"], [("c", "sum")])
    tot = {t: int(n) for t, n in zip(totals["event_type"].to_pylist(),
                                     totals["c"].to_pylist())}
    tot_ref = ray.put(tot)

    def term(b: pa.Table) -> pa.Table:
        from ..functions.near_dup import _obj_cached

        lookup = _obj_cached(tot_ref)
        types = b["event_type"].to_pylist()
        c = b["c"].to_numpy(zero_copy_only=False)
        n = np.array([lookup[t] for t in types], np.int64)
        p = c.astype(np.float64) / n.astype(np.float64)
        # math.log, not np.log: libm parity with the oracle's ln
        terms = np.fromiter(
            (math.floor(-(pi * math.log(pi)) * 1e9 + 0.5) for pi in p),
            dtype=np.int64, count=len(p))
        return pa.table({"event_type": b["event_type"],
                         "entropy_nano": pa.array(terms, pa.int64())})

    return tree_aggregate(pairs.map_batches(term, batch_format="pyarrow"),
                          ["event_type"], [("entropy_nano", "sum")])


def q_type_entropy_sql() -> str:
    return (
        "WITH c AS (SELECT event_type, user_id, count(*) AS c FROM events "
        "GROUP BY event_type, user_id), "
        "n AS (SELECT event_type, sum(c) AS n FROM c GROUP BY event_type), "
        "t AS (SELECT c.event_type, CAST(floor(-((CAST(c.c AS DOUBLE) / "
        "CAST(n.n AS DOUBLE)) * ln(CAST(c.c AS DOUBLE) / "
        "CAST(n.n AS DOUBLE))) * 1e9 + 0.5) AS BIGINT) AS term "
        "FROM c JOIN n USING (event_type)) "
        "SELECT event_type, CAST(sum(term) AS BIGINT) AS entropy_nano "
        "FROM t GROUP BY event_type"
    )


def q_unpivot(sf_dir: str):
    """UNPIVOT (wide → long reshape): each lineitem row becomes three
    (metric, val) rows — the inverse of the order_pivot query.  Pure
    per-batch reshape, no shuffle; doubles pass through untouched."""

    def melt(b: pa.Table) -> pa.Table:
        parts = []
        for metric, col in (("quantity", "l_quantity"),
                            ("discount", "l_discount"),
                            ("tax", "l_tax")):
            parts.append(pa.table({
                "l_orderkey": b["l_orderkey"],
                "l_linenumber": b["l_linenumber"],
                "metric": pa.array([metric] * len(b), pa.string()),
                "val": b[col].cast(pa.float64())}))
        return pa.concat_tables(parts)

    return _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_linenumber", "l_quantity",
                  "l_discount", "l_tax"]).map_batches(
        melt, batch_format="pyarrow")


def q_unpivot_sql() -> str:
    return (
        "SELECT l_orderkey, l_linenumber, 'quantity' AS metric, "
        "l_quantity AS val FROM lineitem "
        "UNION ALL SELECT l_orderkey, l_linenumber, 'discount', "
        "l_discount FROM lineitem "
        "UNION ALL SELECT l_orderkey, l_linenumber, 'tax', "
        "l_tax FROM lineitem"
    )


def q_outlier_flags(sf_dir: str):
    """Robust outlier detection: rows with |v − median| > 3·MAD — the
    median/MAD pair comes from two composed exact rank-selection
    passes (no sort, no materialization beyond the pinned single
    column), then one streaming filter pass.  The subtraction, the
    3·MAD product and the comparison are single pinned double ops
    spelled identically in the oracle, so the surviving row set is
    bit-identical."""
    import pyarrow.compute as pc

    from ..stages.quantiles import select_ranks

    ds = _read(sf_dir, "events", ["event_id", "value"])
    n = _nrows(sf_dir, "events")
    r = (n - 1) // 2
    med = float(select_ranks(ds, "value", [r])[r])

    def deviate(b: pa.Table) -> pa.Table:
        x = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({"dev": pa.array(np.abs(x - med))})

    mad = float(select_ranks(
        ds.map_batches(deviate, batch_format="pyarrow"), "dev", [r])[r])
    cut = 3.0 * mad

    def flag(b: pa.Table) -> pa.Table:
        x = b["value"].to_numpy(zero_copy_only=False)
        keep = np.abs(x - med) > cut
        return pa.table({"event_id": b["event_id"].filter(pa.array(keep))})

    return ds.map_batches(flag, batch_format="pyarrow")


def q_outlier_flags_sql() -> str:
    return (
        "WITH s AS (SELECT value AS v, row_number() OVER (ORDER BY value)"
        " - 1 AS r, count(*) OVER () AS n FROM events), "
        "m AS (SELECT v FROM s WHERE r = (n - 1) // 2), "
        "d AS (SELECT abs(value - (SELECT v FROM m)) AS dv FROM events), "
        "t AS (SELECT dv, row_number() OVER (ORDER BY dv) - 1 AS r, "
        "count(*) OVER () AS n FROM d), "
        "mad AS (SELECT dv FROM t WHERE r = (n - 1) // 2) "
        "SELECT event_id FROM events "
        "WHERE abs(value - (SELECT v FROM m)) > 3.0 * (SELECT dv FROM mad)"
    )


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape (shipping priority): BUILDING customers
    semi-filter orders placed before the cutoff (broadcast key set —
    swap for ``bloom_semi_join`` when the segment stops fitting a
    broadcast), the surviving orders copart-join recent lineitems, the
    unbounded per-order revenue aggregates through one hash exchange,
    and the top 10 resolves driver-side from per-bucket partial top-ks.
    Revenue terms are 1e-4-quantized ints, so sums and ordering are
    exact."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.joins import broadcast_semi_join, copart_hash_join
    from ..stages.scan import hash_bucket_scan

    CUT = np.datetime64("1998-06-01T00:00:00", "us").astype(np.int64)

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"])
    keys = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))[
        "c_custkey"].to_numpy(zero_copy_only=False)

    def filt_orders(b: pa.Table) -> pa.Table:
        ts = b["o_orderdate"].cast(pa.int64())
        t = b.filter(pc.less(ts, CUT))
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"],
                         "odate_us": t["o_orderdate"].cast(pa.int64()),
                         "o_orderpriority": t["o_orderpriority"]})

    orders = broadcast_semi_join(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate",
                                 "o_orderpriority"]).map_batches(
            filt_orders, batch_format="pyarrow"),
        keys, "o_custkey").map_batches(
        lambda b: b.drop_columns(["o_custkey"]), batch_format="pyarrow")

    def filt_line(b: pa.Table) -> pa.Table:
        ts = b["l_shipdate"].cast(pa.int64())
        t = b.filter(pc.greater(ts, CUT))
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 1e4 + 0.5).astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev_q4": pa.array(rev, pa.int64())})

    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_shipdate", "l_extendedprice",
                  "l_discount"]).map_batches(filt_line,
                                             batch_format="pyarrow")

    j = copart_hash_join(
        orders, line, "o_orderkey", "l_orderkey",
        n_rows=_nrows(sf_dir, "orders") + _nrows(sf_dir, "lineitem"),
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("odate_us", pa.int64()),
                               ("o_orderpriority", pa.string())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("rev_q4", pa.int64())]))

    def agg(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_orderkey", "odate_us",
                        "o_orderpriority"]).aggregate([("rev_q4", "sum")])
        g = g.rename_columns(["o_orderkey", "odate_us",
                              "o_orderpriority", "rev_q4"])
        # per-bucket partial top-10 (final merge is driver-side and
        # bounded by 10 × buckets)
        idx = np.lexsort((g["o_orderkey"].to_numpy(zero_copy_only=False),
                          -g["rev_q4"].to_numpy(zero_copy_only=False)))
        return g.take(pa.array(idx[:10], pa.int64()))

    partials = hash_bucket_scan(
        j, ["o_orderkey"], agg,
        n_rows=_nrows(sf_dir, "lineitem")).to_pandas()
    top = partials.sort_values(["rev_q4", "o_orderkey"],
                               ascending=[False, True]).head(10)
    return top.reset_index(drop=True)


def q_shipping_priority_sql() -> str:
    return (
        "SELECT l_orderkey AS o_orderkey, epoch_us(o_orderdate) AS odate_us, "
        "o_orderpriority, "
        "CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1e4 "
        "+ 0.5) AS BIGINT)) AS BIGINT) AS rev_q4 "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "AND o_orderdate < TIMESTAMP '1998-06-01' "
        "AND l_shipdate > TIMESTAMP '1998-06-01' "
        "GROUP BY 1, 2, 3 ORDER BY rev_q4 DESC, l_orderkey LIMIT 10"
    )


def q_minmax_norm(sf_dir: str):
    """Per-group min-max feature normalization ((v - min)/(max - min)
    per event_type) — the feature-scaling prep op.  Bounded group
    min/max ride the combiner tree once and broadcast via ``ray.put``;
    the normalization is a pure per-row map.  The two subtractions and
    one division are single pinned double ops, spelled identically in
    the window-function oracle, so doubles hash-match.  (Degenerate
    min==max groups would diverge inf-vs-inf only in sign corner
    cases; the fixture's per-type spread rules it out.)"""
    import ray

    from ..functions.near_dup import _obj_cached
    from ..stages.agg_tree import tree_aggregate_to_table

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": b["event_type"],
                         "vmin": b["value"], "vmax": b["value"]})

    stats = tree_aggregate_to_table(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type"], [("vmin", "min"), ("vmax", "max")])
    lookup = {t: (mn, mx) for t, mn, mx in
              zip(stats["event_type"].to_pylist(),
                  stats["vmin"].to_numpy(zero_copy_only=False),
                  stats["vmax"].to_numpy(zero_copy_only=False))}
    ref = ray.put(lookup)

    def norm(b: pa.Table) -> pa.Table:
        lk = _obj_cached(ref)
        types = b["event_type"].to_pylist()
        v = b["value"].to_numpy(zero_copy_only=False)
        mn = np.array([lk[t][0] for t in types], np.float64)
        mx = np.array([lk[t][1] for t in types], np.float64)
        return pa.table({"event_id": b["event_id"],
                         "norm": pa.array((v - mn) / (mx - mn),
                                          pa.float64())})

    return ds.map_batches(norm, batch_format="pyarrow")


def q_minmax_norm_sql() -> str:
    return (
        "SELECT event_id, (value - min(value) OVER w) / "
        "(max(value) OVER w - min(value) OVER w) AS norm "
        "FROM events WINDOW w AS (PARTITION BY event_type)"
    )


def q_winsorize(sf_dir: str):
    """Winsorization (outlier clamp to the exact p1/p99 order
    statistics) — the numeric-feature cleanup prep op.  The two global
    clamp bounds come from the sampled-splitter rank selection (NO
    global sort — stages/quantiles.py); the clamp itself is
    min/max-element-wise, pure value pass-through (no float
    arithmetic), so the hash compare vs the ORDER-BY-rank oracle is
    trivially bit-exact."""
    import pyarrow.compute as pc

    from ..stages.quantiles import select_ranks

    ds = _read(sf_dir, "events", ["event_id", "value"])
    n = _nrows(sf_dir, "events")
    r01 = int(np.floor(0.01 * (n - 1)))
    r99 = int(np.floor(0.99 * (n - 1)))
    vals = select_ranks(ds, "value", [r01, r99])
    lo, hi = float(vals[r01]), float(vals[r99])

    def clamp(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b["event_id"],
            "vclip": pc.min_element_wise(
                pc.max_element_wise(b["value"], pa.scalar(lo)),
                pa.scalar(hi))})

    return ds.map_batches(clamp, batch_format="pyarrow")


def q_winsorize_sql() -> str:
    return (
        "WITH s AS (SELECT value AS v, "
        "row_number() OVER (ORDER BY value) - 1 AS r, "
        "count(*) OVER () AS n FROM events), "
        "b AS (SELECT CAST(floor(0.01 * (n - 1)) AS BIGINT) AS r01, "
        "CAST(floor(0.99 * (n - 1)) AS BIGINT) AS r99 "
        "FROM (SELECT DISTINCT n FROM s)), "
        "q AS (SELECT (SELECT v FROM s, b WHERE s.r = b.r01) AS lo, "
        "(SELECT v FROM s, b WHERE s.r = b.r99) AS hi) "
        "SELECT event_id, least(greatest(value, (SELECT lo FROM q)), "
        "(SELECT hi FROM q)) AS vclip FROM events"
    )


def q_group_percentiles(sf_dir: str):
    """Per-group PERCENTILE_CONT (p25/p50/p90 of value per event_type)
    — the grouped counterpart of the global rank-selection quantiles.
    One coarse keyed scan sorts each bucket by (type, value); the
    bracketing order statistics per key segment are start-offset
    arithmetic and the interpolation is the pinned float expression
    ``v_lo + (h - floor(h)) * (v_hi - v_lo)`` with ``h = q * (n - 1)``
    spelled identically in the oracle, so doubles hash-match.  Group
    count is unbounded (buckets auto-scale); each group's rows
    co-locate by key hash."""
    from ..stages.scan import keyed_scan

    QS = (0.25, 0.5, 0.9)

    def hash_type(k: np.ndarray) -> np.ndarray:
        import zlib

        uniq, inv = np.unique(k.astype("U"), return_inverse=True)
        codes = np.array([zlib.crc32(u.encode()) for u in uniq], np.int64)
        return codes[inv]

    def scan(d: pd.DataFrame) -> pd.DataFrame:
        t = d["event_type"].to_numpy()
        v = d["value"].to_numpy()
        new = np.ones(len(d), dtype=bool)
        new[1:] = t[1:] != t[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(d)))
        out = []
        for q in QS:
            h = q * (sizes - 1).astype(np.float64)
            lo = np.floor(h).astype(np.int64)
            hi = np.minimum(lo + 1, sizes - 1)
            v0, v1 = v[starts + lo], v[starts + hi]
            out.append(pd.DataFrame({
                "event_type": t[starts],
                "q": np.full(len(starts), q, np.float64),
                "value": v0 + (h - np.floor(h)) * (v1 - v0)}))
        return pd.concat(out, ignore_index=True)

    ds = _read(sf_dir, "events", ["event_type", "value"])
    return keyed_scan(ds, key="event_type", order=["value"], fn=scan,
                      hash_key=hash_type, n_rows=_nrows(sf_dir, "events"))


def q_group_percentiles_sql() -> str:
    return (
        "WITH s AS (SELECT event_type, value AS v, "
        "row_number() OVER (PARTITION BY event_type ORDER BY value) - 1 "
        "AS r, count(*) OVER (PARTITION BY event_type) AS n FROM events), "
        "t AS (SELECT DISTINCT s.event_type, CAST(b.q AS DOUBLE) AS q, "
        "CAST(b.q AS DOUBLE) * (s.n - 1) AS h, s.n FROM s "
        "CROSS JOIN (VALUES (0.25), (0.5), (0.9)) b(q)) "
        "SELECT t.event_type, t.q, "
        "lo.v + (t.h - floor(t.h)) * (hi.v - lo.v) AS value "
        "FROM t JOIN s lo ON lo.event_type = t.event_type AND "
        "lo.r = CAST(floor(t.h) AS BIGINT) "
        "JOIN s hi ON hi.event_type = t.event_type AND "
        "hi.r = CAST(least(floor(t.h) + 1, t.n - 1) AS BIGINT)"
    )


def q_big_orders(sf_dir: str):
    """TPC-H Q18 shape (large-volume orders): per-order quantity sums
    through ONE orderkey hash exchange, the rare winners (sum > 250)
    come back as a broadcast set, and orders + customer attach via
    broadcast joins — the fact table is never shuffled twice.
    Quantities are centi-unit ints so the having-filter is exact."""
    import pyarrow.parquet as pq

    from ..stages.joins import broadcast_hash_join
    from ..stages.scan import hash_bucket_scan

    THRESH_C2 = 250 * 100

    def quantize(b: pa.Table) -> pa.Table:
        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "qty_c2": pa.array(
                             np.floor(q * 100 + 0.5).astype(np.int64),
                             pa.int64())})

    def per_order(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_orderkey"]).aggregate([("qty_c2", "sum")])
        g = g.rename_columns(["l_orderkey", "qty_c2"])
        # keys land wholly in one bucket, so these sums are FINAL —
        # the having-filter applies right here and only winners ship
        return g.filter(pa.compute.greater(g["qty_c2"], THRESH_C2))

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]
                 ).map_batches(quantize, batch_format="pyarrow")
    winners = hash_bucket_scan(
        line, ["l_orderkey"], per_order,
        n_rows=_nrows(sf_dir, "lineitem")).to_pandas()

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_name"]).to_pandas()

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "o_custkey": b["o_custkey"],
                         "odate_us": b["o_orderdate"].cast(pa.int64()),
                         "o_totalprice": b["o_totalprice"]})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
                   ).map_batches(fmt, batch_format="pyarrow")
    j = broadcast_hash_join(orders, winners, on="o_orderkey",
                            small_on="l_orderkey").map_batches(
        lambda d: d[["o_orderkey", "o_custkey", "odate_us", "o_totalprice",
                     "qty_c2"]], batch_format="pandas")
    j = broadcast_hash_join(j, cust, on="o_custkey", small_on="c_custkey")
    return j.map_batches(
        lambda d: d[["c_name", "o_custkey", "o_orderkey", "odate_us",
                     "o_totalprice", "qty_c2"]], batch_format="pandas")


def q_big_orders_sql() -> str:
    return (
        "SELECT c_name, o_custkey, o_orderkey, "
        "epoch_us(o_orderdate) AS odate_us, o_totalprice, "
        "CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) "
        "AS qty_c2 "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON o_orderkey = l_orderkey "
        "GROUP BY 1, 2, 3, 4, 5 "
        "HAVING sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) > 25000"
    )


def q_returned_revenue(sf_dir: str):
    """TPC-H Q10 shape (returned-item revenue): returned lineitems
    copart-join orders for the customer key, per-customer revenue sums
    through one custkey hash exchange with per-bucket partial top-20s
    (bucket-local sums are final, so each bucket ships ≤ 20 rows), the
    driver merges the bounded partials, and the 20 winners pick up
    name/balance from the broadcast customer table."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.joins import copart_hash_join
    from ..stages.scan import hash_bucket_scan

    def filt_line(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["l_returnflag"], "R"))
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 1e4 + 0.5).astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev_q4": pa.array(rev, pa.int64())})

    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_returnflag", "l_extendedprice",
                  "l_discount"]).map_batches(filt_line,
                                             batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    j = copart_hash_join(
        orders, line, "o_orderkey", "l_orderkey",
        n_rows=_nrows(sf_dir, "orders") + _nrows(sf_dir, "lineitem"),
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("o_custkey", pa.int64())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("rev_q4", pa.int64())]))
    j = j.map_batches(lambda b: b.select(["o_custkey", "rev_q4"]),
                      batch_format="pyarrow")

    def agg(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_custkey"]).aggregate([("rev_q4", "sum")])
        g = g.rename_columns(["c_custkey", "rev_q4"])
        idx = np.lexsort((g["c_custkey"].to_numpy(zero_copy_only=False),
                          -g["rev_q4"].to_numpy(zero_copy_only=False)))
        return g.take(pa.array(idx[:20], pa.int64()))

    partials = hash_bucket_scan(
        j, ["o_custkey"], agg,
        n_rows=_nrows(sf_dir, "lineitem")).to_pandas()
    top = partials.sort_values(["rev_q4", "c_custkey"],
                               ascending=[False, True]).head(20)
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_name", "c_acctbal"]
                         ).to_pandas()
    out = top.merge(cust, on="c_custkey")
    return out[["c_custkey", "c_name", "c_acctbal",
                "rev_q4"]].reset_index(drop=True)


def q_returned_revenue_sql() -> str:
    return (
        "WITH r AS (SELECT o_custkey AS c_custkey, "
        "CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1e4 "
        "+ 0.5) AS BIGINT)) AS BIGINT) AS rev_q4 "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE l_returnflag = 'R' GROUP BY 1 "
        "ORDER BY rev_q4 DESC, c_custkey LIMIT 20) "
        "SELECT r.c_custkey, c_name, c_acctbal, rev_q4 "
        "FROM r JOIN customer ON r.c_custkey = customer.c_custkey"
    )


def q_pareto_front(sf_dir: str):
    """Distributed 2-D skyline (Pareto front) over parts: rows not
    dominated on (p_retailprice minimized, p_size maximized).
    Skylines compose — skyline(∪ skylines) = skyline(all) — so each
    block reduces to its local skyline (expected O(log n) rows of n)
    and the bounded union resolves in one final pass; the input never
    shuffles."""

    def local(b: pa.Table) -> pa.Table:
        idx = np.lexsort((-b["p_size"].to_numpy(zero_copy_only=False),
                          b["p_retailprice"].to_numpy(zero_copy_only=False)))
        t = b.take(pa.array(idx, pa.int64()))
        keep = _skyline_mask(
            t["p_retailprice"].to_numpy(zero_copy_only=False),
            t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64))
        return t.filter(pa.array(keep))

    ds = _read(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"])
    return (ds.map_batches(local, batch_format="pyarrow")
              .repartition(1)
              .map_batches(local, batch_format="pyarrow", batch_size=None))


def q_pareto_front_sql() -> str:
    return (
        "SELECT p_partkey, p_retailprice, p_size FROM part a "
        "WHERE NOT EXISTS (SELECT 1 FROM part b "
        "WHERE b.p_retailprice <= a.p_retailprice "
        "AND b.p_size >= a.p_size "
        "AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))"
    )


def q_interval_overlap(sf_dir: str):
    """Interval×interval overlap join (stages/joins.py
    interval_overlap_join): every same-user (even, odd) event pair
    whose derived [ts, ts+dur] intervals overlap.  One user-key hash
    exchange; per bucket the odd side sorts once and every even
    interval finds its candidates with two global searchsorted calls
    under the 1h duration bound — no per-user Python, no all-pairs."""
    from ..stages.joins import interval_overlap_join

    return interval_overlap_join(
        _iv_events(sf_dir, 0), _iv_events(sf_dir, 1), key="user_id",
        left_id="event_id", left_start="s_us", left_end="e_us",
        right_id="event_id", right_start="s_us", right_end="e_us",
        max_right_dur=3600 * 1_000_000, out_cols=("a_id", "b_id"),
        n_rows=_nrows(sf_dir, "events"))


def q_interval_overlap_sql() -> str:
    a = _IV_SQL.format(parity=0)
    b = _IV_SQL.format(parity=1)
    return (
        f"WITH a AS ({a}), b AS ({b}) "
        "SELECT a.event_id AS a_id, b.event_id AS b_id FROM a JOIN b "
        "ON a.user_id = b.user_id AND a.s_us <= b.e_us "
        "AND b.s_us <= a.e_us"
    )


def q_min_cost_supp(sf_dir: str):
    """Argmin join (TPC-H Q2 shape): for each part, the cheapest
    supplier it has shipped through (min s_acctbal, ties → min
    suppkey).  The supplier dimension broadcasts once; per-part argmin
    reduces inside each batch first (distinct part-supplier pairs →
    batch-local argmin) and finishes through one bounded hash
    exchange, so the exchange carries ≤ one row per (part, block)."""
    import pyarrow.parquet as pq

    from ..stages.joins import broadcast_hash_join
    from ..stages.scan import hash_bucket_scan

    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_acctbal"]).to_pandas()

    def local_min(d: pd.DataFrame) -> pd.DataFrame:
        d = d.sort_values(["l_partkey", "s_acctbal", "l_suppkey"],
                          kind="mergesort")
        first = ~d["l_partkey"].duplicated().to_numpy()
        out = d.loc[first, ["l_partkey", "l_suppkey", "s_acctbal"]]
        return out.rename(columns={"l_suppkey": "s_suppkey"})

    line = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    j = broadcast_hash_join(line, supp, on="l_suppkey",
                            small_on="s_suppkey").map_batches(
        local_min, batch_format="pandas")

    def final_min(t: pa.Table) -> pa.Table:
        idx = np.lexsort((
            t["s_suppkey"].to_numpy(zero_copy_only=False),
            t["s_acctbal"].to_numpy(zero_copy_only=False),
            t["l_partkey"].to_numpy(zero_copy_only=False)))
        s = t.take(pa.array(idx, pa.int64()))
        pk = s["l_partkey"].to_numpy(zero_copy_only=False)
        first = np.ones(len(pk), dtype=bool)
        first[1:] = pk[1:] != pk[:-1]
        out = s.filter(pa.array(first))
        return out.rename_columns(["p_partkey", "s_suppkey", "s_acctbal"])

    return hash_bucket_scan(j, ["l_partkey"], final_min,
                            n_rows=_nrows(sf_dir, "lineitem"))


def q_min_cost_supp_sql() -> str:
    return (
        "WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem), "
        "j AS (SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey, "
        "s_acctbal, row_number() OVER (PARTITION BY l_partkey "
        "ORDER BY s_acctbal, l_suppkey) AS rn "
        "FROM ps JOIN supplier ON l_suppkey = s_suppkey) "
        "SELECT p_partkey, s_suppkey, s_acctbal FROM j WHERE rn = 1"
    )


def q_rows_frame_sum(sf_dir: str):
    """ROWS-frame windowed sum (SUM OVER ROWS BETWEEN 2 PRECEDING AND
    CURRENT ROW per user, ts order): the keyed_scan coarse-bucket
    shape; inside a bucket one cumsum minus its 3-shifted self, with
    per-user segment boundaries handled by index arithmetic (no
    per-user loop).  Values quantized to 1e-6 ints so the windowed sum
    is exact."""
    from ..stages.scan import keyed_scan

    def quant(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({"event_id": b["event_id"], "user_id": b["user_id"],
                         "t_us": b["ts"].cast(pa.int64()),
                         "v6": pa.array(
                             np.floor(v * 1e6 + 0.5).astype(np.int64),
                             pa.int64())})

    def frame(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        v = d["v6"].to_numpy()
        cs = np.cumsum(v)
        n = len(d)
        # frame start = max(row_index - 2, segment_start)
        seg_start = np.arange(n)[
            np.r_[True, u[1:] != u[:-1]]]  # start index per segment
        seg_id = np.cumsum(np.r_[True, u[1:] != u[:-1]]) - 1
        start = np.maximum(np.arange(n) - 2, seg_start[seg_id])
        before = np.where(start > 0, cs[np.maximum(start - 1, 0)], 0)
        return pd.DataFrame({"event_id": d["event_id"].to_numpy(),
                             "frame_sum": cs - before})

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]
               ).map_batches(quant, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t_us", "event_id"],
                      fn=frame, n_rows=_nrows(sf_dir, "events"))


def q_rows_frame_sum_sql() -> str:
    return (
        "SELECT event_id, sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS frame_sum "
        "FROM events"
    )


def q_global_rank(sf_dir: str):
    """Global ROW_NUMBER over all events by quantized value (ties →
    event_id) — stages/global_scan.py global_rank: range buckets +
    offset broadcast, no global sort operator."""
    from ..stages.global_scan import global_rank

    def quant(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({"event_id": b["event_id"],
                         "v6": pa.array(
                             np.floor(v * 1e6 + 0.5).astype(np.int64),
                             pa.int64())})

    ds = _read(sf_dir, "events", ["event_id", "value"]).map_batches(
        quant, batch_format="pyarrow")
    return global_rank(ds, "v6", "event_id",
                       n_rows=_nrows(sf_dir, "events"))


def q_global_rank_sql() -> str:
    return (
        "SELECT event_id, row_number() OVER (ORDER BY "
        "CAST(floor(value * 1e6 + 0.5) AS BIGINT), event_id) "
        "AS global_rank FROM events"
    )


def q_gini(sf_dir: str):
    """Exact Gini concentration of purchase values
    (stages/global_scan.py gini_scaled — the offset-broadcast global
    scan; integer numerator/denominator so the distributed result is
    bit-exact)."""
    import pyarrow.compute as pc

    from ..stages.global_scan import gini_scaled

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["event_type"], "purchase"))
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.table({"v6": pa.array(
            np.floor(v * 1e6 + 0.5).astype(np.int64), pa.int64())})

    ds = _read(sf_dir, "events", ["event_type", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return gini_scaled(ds, "v6", n_rows=_nrows(sf_dir, "events"))


def q_gini_sql() -> str:
    return (
        "WITH x AS (SELECT CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v "
        "FROM events WHERE event_type = 'purchase'), "
        "r AS (SELECT v, row_number() OVER (ORDER BY v) AS i, "
        "(SELECT count(*) FROM x) AS n FROM x) "
        "SELECT CAST(COALESCE(sum((2 * i - n - 1) * v), 0) AS BIGINT) "
        "AS g_num, "
        "CAST((SELECT count(*) FROM x) * COALESCE((SELECT sum(v) FROM x), "
        "0) AS BIGINT) AS g_den FROM r"
    )


def q_group_sample(sf_dir: str):
    """Deterministic per-domain cap (the "≤ K documents per source"
    rebalancing step of LLM corpus curation): within each source keep
    the K docs with the smallest multiply-shift hash of doc_id — a
    seedless, replayable uniform sample that needs no RNG state.  The
    engine shape is grouped_top_k's per-batch pre-reduce (≤ K rows per
    (source, batch) survive locally), so the shuffle moves ≤ K·blocks
    rows per source, never the corpus."""
    from ..stages.topk import grouped_top_k

    def prio(b: pa.Table) -> pa.Table:
        i = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (i * 2654435761 + 99991) % 4294967296
        return pa.table({"doc_id": b["doc_id"], "source": b["source"],
                         "h": pa.array(h, pa.int64())})

    ds = _read(sf_dir, "documents", ["doc_id", "source"]).map_batches(
        prio, batch_format="pyarrow")
    out = grouped_top_k(ds, "source", "h", _GROUP_SAMPLE_K,
                        descending=False, tiebreak_col="doc_id")
    return out.select_columns(["doc_id", "source"])


def q_group_sample_sql() -> str:
    return (
        "WITH h AS (SELECT doc_id, source, "
        "(doc_id * 2654435761 + 99991) % 4294967296 AS h "
        "FROM documents), "
        "r AS (SELECT doc_id, source, row_number() OVER ("
        "PARTITION BY source ORDER BY h, doc_id) AS rn FROM h) "
        f"SELECT doc_id, source FROM r WHERE rn <= {_GROUP_SAMPLE_K}"
    )


def q_ab_ttest(sf_dir: str):
    """Welch two-sample t-statistic per event_type between user
    cohorts (user_id % 2) — the A/B-experiment readout: per-(type,
    cohort) moment partials (n, Σcents, Σcents²) are exact int64 and
    merge on the bounded combiner tree; the t finalize is a fixed
    sequence of double ops on the driver (divisions and ONE
    correctly-rounded IEEE sqrt, micro-pinned) replayed verbatim by
    the oracle.  Σc² fits int64 through bench scale; at 100 TB the
    cents partials would shard to (hi, lo) limb pairs like the
    moments stage."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        c = np.floor(b["value"].to_numpy(zero_copy_only=False)
                     * 100.0 + 0.5).astype(np.int64)
        coh = (b["user_id"].to_numpy(zero_copy_only=False) % 2)
        t = pa.table({"event_type": b["event_type"],
                      "coh": pa.array(coh, pa.int64()),
                      "n": pa.array(np.ones(len(c), np.int64)),
                      "s1": pa.array(c), "s2": pa.array(c * c)})
        return (t.group_by(["event_type", "coh"]).aggregate(
            [("n", "sum"), ("s1", "sum"), ("s2", "sum")])
            .rename_columns(["event_type", "coh", "n", "s1", "s2"]))

    g = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_type", "user_id", "value"])
        .map_batches(partial, batch_format="pyarrow"),
        ["event_type", "coh"],
        [("n", "sum"), ("s1", "sum"), ("s2", "sum")]).to_pandas()
    a = g[g["coh"] == 0].set_index("event_type")
    b = g[g["coh"] == 1].set_index("event_type")
    types = sorted(set(a.index) & set(b.index))
    a, b = a.loc[types], b.loc[types]
    na = a["n"].to_numpy().astype(np.float64)
    nb = b["n"].to_numpy().astype(np.float64)
    s1a = a["s1"].to_numpy().astype(np.float64)
    s1b = b["s1"].to_numpy().astype(np.float64)
    s2a = a["s2"].to_numpy().astype(np.float64)
    s2b = b["s2"].to_numpy().astype(np.float64)
    keep = (na > 1) & (nb > 1)
    t = (s1a / na - s1b / nb) / np.sqrt(
        (s2a - s1a * s1a / na) / (na - 1.0) / na
        + (s2b - s1b * s1b / nb) / (nb - 1.0) / nb)
    return pd.DataFrame({
        "event_type": np.asarray(types, dtype=object)[keep],
        "na": a["n"].to_numpy().astype(np.int64)[keep],
        "nb": b["n"].to_numpy().astype(np.int64)[keep],
        "t_micro": np.floor(t[keep] * 1e6 + 0.5).astype(np.int64)})


def q_ab_ttest_sql() -> str:
    def var(s2, s1, n):
        return (f"(CAST({s2} AS DOUBLE) - CAST({s1} AS DOUBLE) * "
                f"CAST({s1} AS DOUBLE) / CAST({n} AS DOUBLE)) / "
                f"CAST({n} - 1 AS DOUBLE) / CAST({n} AS DOUBLE)")

    return (
        "WITH p AS (SELECT event_type, user_id % 2 AS coh, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c FROM events), "
        "g AS (SELECT event_type, coh, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(c) AS BIGINT) AS s1, CAST(sum(c * c) AS BIGINT) AS s2 "
        "FROM p GROUP BY 1, 2) "
        "SELECT a.event_type, a.n AS na, b.n AS nb, "
        "CAST(floor((CAST(a.s1 AS DOUBLE) / CAST(a.n AS DOUBLE) - "
        "CAST(b.s1 AS DOUBLE) / CAST(b.n AS DOUBLE)) / sqrt("
        + var("a.s2", "a.s1", "a.n") + " + "
        + var("b.s2", "b.s1", "b.n") +
        ") * 1e6 + 0.5) AS BIGINT) AS t_micro "
        "FROM g a JOIN g b ON a.event_type = b.event_type "
        "AND a.coh = 0 AND b.coh = 1 WHERE a.n > 1 AND b.n > 1"
    )


def q_rfm_segments(sf_dir: str):
    """RFM (recency / frequency / monetary) user segmentation — the
    two-level marketing rollup: level 1 is a per-user aggregate over
    an UNBOUNDED key space (max ts, count, Σcents — ridden on the
    coarse hash-bucket exchange, one combined pass), level 2 buckets
    each user into fixed 3×3×3 bands and counts segments on the
    bounded combiner tree.  Band edges are fixed constants (hours /
    counts / cents), so everything is exact ints end to end."""
    from ..stages.agg_tree import tree_aggregate_to_table
    from ..stages.scan import hash_bucket_scan

    def per_user(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        c = np.floor(b["value"].to_numpy(zero_copy_only=False)
                     * 100.0 + 0.5).astype(np.int64)
        t = pa.table({"user_id": b["user_id"],
                      "r": pa.array(ts), "f": pa.array(
                          np.ones(len(ts), np.int64)),
                      "m": pa.array(c)})
        return (t.group_by(["user_id"]).aggregate(
            [("r", "max"), ("f", "sum"), ("m", "sum")])
            .rename_columns(["user_id", "r", "f", "m"]))

    users = hash_bucket_scan(
        _read(sf_dir, "events", ["user_id", "ts", "value"])
        .map_batches(per_user, batch_format="pyarrow"),
        ["user_id"],
        lambda t: (t.group_by(["user_id"]).aggregate(
            [("r", "max"), ("f", "sum"), ("m", "sum")])
            .rename_columns(["user_id", "r", "f", "m"])),
        n_rows=_nrows(sf_dir, "events")).materialize()

    # scale-free band edges: recency relative to the global max ts,
    # frequency / monetary relative to the per-user average (exact
    # integer cross-multiplication, no division)
    u_cnt = users.count()
    n_tot = int(users.sum("f"))
    m_tot = int(users.sum("m"))
    r_max = int(users.max("r"))
    H6 = 6 * 3_600_000_000
    H18 = 18 * 3_600_000_000

    def bands(t: pa.Table) -> pa.Table:
        r = t["r"].to_numpy(zero_copy_only=False)
        f = t["f"].to_numpy(zero_copy_only=False)
        m = t["m"].to_numpy(zero_copy_only=False)
        rb = np.where(r >= r_max - H6, 2,
                      np.where(r >= r_max - H18, 1, 0))
        fb = np.where(12 * f * u_cnt >= 13 * n_tot, 2,
                      np.where(12 * f * u_cnt >= 11 * n_tot, 1, 0))
        mb = np.where(12 * m * u_cnt >= 13 * m_tot, 2,
                      np.where(12 * m * u_cnt >= 11 * m_tot, 1, 0))
        out = pa.table({"rb": pa.array(rb.astype(np.int64)),
                        "fb": pa.array(fb.astype(np.int64)),
                        "mb": pa.array(mb.astype(np.int64)),
                        "n": pa.array(np.ones(len(rb), np.int64))})
        return (out.group_by(["rb", "fb", "mb"]).aggregate(
            [("n", "sum")]).rename_columns(["rb", "fb", "mb", "n"]))

    out = tree_aggregate_to_table(
        users.map_batches(bands, batch_format="pyarrow"),
        ["rb", "fb", "mb"], [("n", "sum")])
    return out.to_pandas().astype(np.int64)


def q_rfm_segments_sql() -> str:
    return (
        "WITH u AS MATERIALIZED (SELECT user_id, "
        "max(epoch_us(ts)) AS r, CAST(count(*) AS BIGINT) AS f, "
        "CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) "
        "AS BIGINT) AS m FROM events GROUP BY 1), "
        "g AS (SELECT CAST(count(*) AS BIGINT) AS uc, "
        "CAST(sum(f) AS BIGINT) AS nt, CAST(sum(m) AS BIGINT) AS mt, "
        "max(r) AS rmax FROM u), "
        "b AS (SELECT "
        f"CASE WHEN r >= rmax - {6 * 3_600_000_000} THEN 2 "
        f"WHEN r >= rmax - {18 * 3_600_000_000} THEN 1 ELSE 0 END "
        "AS rb, "
        "CASE WHEN 12 * f * uc >= 13 * nt THEN 2 "
        "WHEN 12 * f * uc >= 11 * nt THEN 1 ELSE 0 END AS fb, "
        "CASE WHEN 12 * m * uc >= 13 * mt THEN 2 "
        "WHEN 12 * m * uc >= 11 * mt THEN 1 ELSE 0 END AS mb "
        "FROM u, g) "
        "SELECT CAST(rb AS BIGINT) AS rb, CAST(fb AS BIGINT) AS fb, "
        "CAST(mb AS BIGINT) AS mb, CAST(count(*) AS BIGINT) AS n "
        "FROM b GROUP BY 1, 2, 3"
    )


def q_ransac_line(sf_dir: str):
    """RANSAC line fitting over the event point cloud (the robust
    geometry-estimation loop, run data-parallel): 64 DETERMINISTIC
    hypothesis lines (endpoints derived from fixed integer keys — the
    house replacement for random sampling), every (point, hypothesis)
    inlier test vectorized per batch — the cross product is an exact
    int64 in microdegrees and the point-to-line distance is one fixed
    double sequence (divide by a correctly-rounded sqrt) pinned to a
    micro int before the ≤ ε comparison, so the count is bit-stable —
    and per-hypothesis inlier counts merge on the bounded combiner
    tree.  Output = the 5 best hypotheses (inliers desc, k asc).
    Hypotheses broadcast; at 100 TB the shape is unchanged."""
    from ..stages.agg_tree import tree_aggregate_to_table

    ks = np.arange(64, dtype=np.int64)
    y1, x1 = derive_latlon(ks * 2 + 1)
    y2, x2 = derive_latlon(ks * 2 + 2)
    x1m = np.floor(x1 * 1e6 + 0.5).astype(np.int64)
    y1m = np.floor(y1 * 1e6 + 0.5).astype(np.int64)
    x2m = np.floor(x2 * 1e6 + 0.5).astype(np.int64)
    y2m = np.floor(y2 * 1e6 + 0.5).astype(np.int64)
    dxm, dym = x2m - x1m, y2m - y1m
    len2 = (dxm * dxm + dym * dym).astype(np.float64)
    eps = 2_000_000  # 2 degrees in micro units

    def partial(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        xm = np.floor(lon * 1e6 + 0.5).astype(np.int64)
        ym = np.floor(lat * 1e6 + 0.5).astype(np.int64)
        cr = (dxm[None, :] * (ym[:, None] - y1m[None, :])
              - dym[None, :] * (xm[:, None] - x1m[None, :]))
        dist = np.floor(np.abs(cr).astype(np.float64)
                        / np.sqrt(len2)[None, :] + 0.5)
        cnt = (dist <= eps).sum(axis=0).astype(np.int64)
        return pa.table({"k": pa.array(ks),
                         "inliers": pa.array(cnt)})

    g = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_id"]).map_batches(
            partial, batch_format="pyarrow"),
        ["k"], [("inliers", "sum")]).to_pandas()
    g = g.sort_values(["inliers", "k"],
                      ascending=[False, True]).head(5)
    return pd.DataFrame({
        "k": g["k"].to_numpy().astype(np.int64),
        "inliers": g["inliers"].to_numpy().astype(np.int64)})


def q_ransac_line_sql() -> str:
    lat, lon = latlon_sql("event_id")
    l1y, l1x = latlon_sql("(k * 2 + 1)")
    l2y, l2x = latlon_sql("(k * 2 + 2)")
    return (
        "WITH h AS MATERIALIZED (SELECT k, "
        f"CAST(floor({l1x} * 1e6 + 0.5) AS BIGINT) AS x1m, "
        f"CAST(floor({l1y} * 1e6 + 0.5) AS BIGINT) AS y1m, "
        f"CAST(floor({l2x} * 1e6 + 0.5) AS BIGINT) AS x2m, "
        f"CAST(floor({l2y} * 1e6 + 0.5) AS BIGINT) AS y2m "
        "FROM range(64) t(k)), "
        "e AS (SELECT "
        f"CAST(floor({lon} * 1e6 + 0.5) AS BIGINT) AS xm, "
        f"CAST(floor({lat} * 1e6 + 0.5) AS BIGINT) AS ym FROM events), "
        "d AS (SELECT h.k, floor(abs(CAST("
        "(x2m - x1m) * (ym - y1m) - (y2m - y1m) * (xm - x1m) "
        "AS DOUBLE)) / sqrt(CAST((x2m - x1m) * (x2m - x1m) "
        "+ (y2m - y1m) * (y2m - y1m) AS DOUBLE)) + 0.5) AS dist "
        "FROM e, h) "
        "SELECT CAST(k AS BIGINT) AS k, "
        "CAST(sum(CASE WHEN dist <= 2000000 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS inliers "
        "FROM d GROUP BY 1 ORDER BY inliers DESC, k LIMIT 5"
    )


def q_mutual_info(sf_dir: str):
    """Mutual information between event_type and a fixed value band
    (the feature-relevance screen; the categorical sibling of
    q_js_divergence): the contingency table rides the bounded
    combiner tree as exact int counts (≤ |types|·4 cells), each
    cell's (c/N)·ln(N·c/(r·s)) is a fixed double sequence pinned to a
    nano int, and MI is the exact int sum of the pins.  Bands are
    floor(value/25) clamped to [0, 3]."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        band = np.clip((b["value"].to_numpy(zero_copy_only=False)
                        // 25.0).astype(np.int64), 0, 3)
        t = pa.table({"event_type": b["event_type"],
                      "band": pa.array(band),
                      "c": pa.array(np.ones(len(band), np.int64))})
        return (t.group_by(["event_type", "band"]).aggregate(
            [("c", "sum")]).rename_columns(["event_type", "band", "c"]))

    g = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_type", "value"]).map_batches(
            partial, batch_format="pyarrow"),
        ["event_type", "band"], [("c", "sum")]).to_pandas()
    n = int(g["c"].sum())
    r = g.groupby("event_type")["c"].transform("sum").to_numpy() \
         .astype(np.int64)
    s = g.groupby("band")["c"].transform("sum").to_numpy() \
         .astype(np.int64)
    c = g["c"].to_numpy().astype(np.int64)
    term = (c.astype(np.float64) / float(n)) * np.log(
        float(n) * c.astype(np.float64)
        / (r * s).astype(np.float64))
    pins = np.floor(term * 1e9 + 0.5).astype(np.int64)
    return pd.DataFrame({"n_cells": [np.int64(len(c))],
                         "mi_nano": [np.int64(int(pins.sum()))]})


def q_mutual_info_sql() -> str:
    return (
        "WITH p AS (SELECT event_type, "
        "least(greatest(CAST(floor(value / 25.0) AS BIGINT), 0), 3) "
        "AS band FROM events), "
        "g AS MATERIALIZED (SELECT event_type, band, "
        "CAST(count(*) AS BIGINT) AS c FROM p GROUP BY 1, 2), "
        "n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM g), "
        "r AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS r "
        "FROM g GROUP BY 1), "
        "s AS (SELECT band, CAST(sum(c) AS BIGINT) AS s "
        "FROM g GROUP BY 1), "
        "t AS (SELECT CAST(floor((CAST(c AS DOUBLE) / "
        "CAST(n.n AS DOUBLE)) * ln(CAST(n.n AS DOUBLE) * "
        "CAST(c AS DOUBLE) / CAST(r.r * s.s AS DOUBLE)) * 1e9 + 0.5) "
        "AS BIGINT) AS pin FROM g "
        "JOIN r ON g.event_type = r.event_type "
        "JOIN s ON g.band = s.band, n) "
        "SELECT CAST(count(*) AS BIGINT) AS n_cells, "
        "CAST(sum(pin) AS BIGINT) AS mi_nano FROM t"
    )


def q_target_encode(sf_dir: str):
    """Smoothed target encoding of event_type against value (the
    categorical-feature ML-prep transform): per-type (n, Σcents)
    int partials on the bounded combiner tree, global mean from the
    same partials, then enc = (s + m·μ)/(n + m) with m = 10 — a fixed
    double sequence per type, pinned micro.  One data pass; at
    unbounded key spaces the partials ride the hash-bucket exchange
    instead (q_group_concat shape)."""
    from ..stages.agg_tree import tree_aggregate_to_table

    M = 10.0

    def partial(b: pa.Table) -> pa.Table:
        c = np.floor(b["value"].to_numpy(zero_copy_only=False)
                     * 100.0 + 0.5).astype(np.int64)
        t = pa.table({"event_type": b["event_type"],
                      "n": pa.array(np.ones(len(c), np.int64)),
                      "s": pa.array(c)})
        return (t.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("s", "sum")])
            .rename_columns(["event_type", "n", "s"]))

    g = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_type", "value"]).map_batches(
            partial, batch_format="pyarrow"),
        ["event_type"], [("n", "sum"), ("s", "sum")]).to_pandas()
    n = g["n"].to_numpy().astype(np.float64)
    s = g["s"].to_numpy().astype(np.float64)
    mu = float(int(g["s"].sum())) / float(int(g["n"].sum()))
    enc = (s + M * mu) / (n + M)
    return pd.DataFrame({
        "event_type": g["event_type"].astype(str),
        "n": g["n"].to_numpy().astype(np.int64),
        "enc_micro": np.floor(enc * 1e6 + 0.5).astype(np.int64)})


def q_target_encode_sql() -> str:
    return (
        "WITH p AS (SELECT event_type, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c FROM events), "
        "g AS MATERIALIZED (SELECT event_type, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(c) AS BIGINT) AS s FROM p GROUP BY 1), "
        "t AS (SELECT CAST(sum(s) AS DOUBLE) / CAST(sum(n) AS DOUBLE) "
        "AS mu FROM g) "
        "SELECT event_type, n, "
        "CAST(floor((CAST(s AS DOUBLE) + 10.0 * mu) / "
        "(CAST(n AS DOUBLE) + 10.0) * 1e6 + 0.5) AS BIGINT) "
        "AS enc_micro FROM g, t"
    )


def q_weighted_median(sf_dir: str):
    """EXACT WEIGHTED LOWER MEDIAN of lineitem extended price,
    weighted by integer quantity, per return flag: the first
    price-cent (ascending) whose doubled cumulative weight reaches
    the total (2·cum ≥ W — integer compare, no halves).  Per-(flag,
    cent) weight sums ride the combiner tree (the quantized domain
    bound of q_equidepth_hist); the cumulative pick folds driver-side
    per bounded flag.  Oracle = window cumsum + the same compare."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        p = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        t = pa.table({"f": b["l_returnflag"],
                      "c": pa.array(np.floor(p * 100.0 + 0.5
                                             ).astype(np.int64)),
                      "w": pa.array(np.floor(q + 0.5).astype(np.int64))})
        return (t.group_by(["f", "c"]).aggregate([("w", "sum")])
                .rename_columns(["f", "c", "w"]))

    tab = tree_aggregate_to_table(
        _read(sf_dir, "lineitem",
              ["l_returnflag", "l_extendedprice",
               "l_quantity"]).map_batches(
            partial, batch_format="pyarrow"),
        ["f", "c"], [("w", "sum")]).to_pandas()
    tab = tab.sort_values(["f", "c"], kind="mergesort")
    out = []
    for f, grp in tab.groupby("f", sort=True):
        w = grp["w"].to_numpy().astype(np.int64)
        c = grp["c"].to_numpy().astype(np.int64)
        tot = int(w.sum())
        cum = np.cumsum(w)
        i = int(np.argmax(2 * cum >= tot))
        out.append((f, int(c[i]), tot))
    return pd.DataFrame(out, columns=["l_returnflag", "wmedian_cents",
                                      "total_w"])


def q_weighted_median_sql() -> str:
    return (
        "WITH p AS (SELECT l_returnflag AS f, "
        "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS c, "
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS w FROM lineitem), "
        "g AS (SELECT f, c, sum(w) AS w FROM p GROUP BY 1, 2), "
        "cu AS (SELECT f, c, sum(w) OVER (PARTITION BY f ORDER BY c) "
        "AS cum, sum(w) OVER (PARTITION BY f) AS tot FROM g) "
        "SELECT f AS l_returnflag, "
        "CAST(min(CASE WHEN 2 * cum >= tot THEN c END) AS BIGINT) "
        "AS wmedian_cents, CAST(any_value(tot) AS BIGINT) AS total_w "
        "FROM cu GROUP BY 1"
    )


def q_ri_audit(sf_dir: str):
    """REFERENTIAL-INTEGRITY AUDIT — the cross-table data-quality
    sweep every warehouse load runs: orphan counts over three FK
    edges (orders.o_custkey → customer, lineitem.l_orderkey → orders,
    events.user_id → customer) plus each child's row count.  Each
    edge is one broadcast anti-semi-join (sorted parent key array via
    ray.put, searchsorted membership per batch — stages/joins.py) and
    a count; parents at TPC-H scales are the small sides by
    construction (an unbounded parent would swap in the Bloom-chain
    from stages/dedup).  Oracle = three NOT-IN counts."""
    import pyarrow.parquet as pq

    from ..stages.joins import broadcast_semi_join

    def parent_keys(table: str, col: str) -> np.ndarray:
        return pq.read_table(os.path.join(sf_dir, f"{table}.parquet"),
                             columns=[col])[col].to_numpy(
            zero_copy_only=False).astype(np.int64)

    edges = (
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("events", "user_id", "customer", "c_custkey"),
    )
    out = []
    for child, fk, parent, pk in edges:
        keys = parent_keys(parent, pk)
        ds = _read(sf_dir, child, [fk])
        n_child = ds.count()

        def to_i64(b: pa.Table, fk=fk) -> pa.Table:
            v = b[fk].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({fk: pa.array(v)})

        orphans = broadcast_semi_join(
            ds.map_batches(to_i64, batch_format="pyarrow"),
            keys, on=fk, anti=True).count()
        out.append((f"{child}.{fk}", np.int64(orphans),
                    np.int64(n_child)))
    return pd.DataFrame(out, columns=["edge", "n_orphans", "n_child"])


def q_ri_audit_sql() -> str:
    return (
        "SELECT 'orders.o_custkey' AS edge, "
        "CAST((SELECT count(*) FROM orders WHERE o_custkey NOT IN "
        "(SELECT c_custkey FROM customer)) AS BIGINT) AS n_orphans, "
        "CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_child "
        "UNION ALL SELECT 'lineitem.l_orderkey', "
        "CAST((SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN "
        "(SELECT o_orderkey FROM orders)) AS BIGINT), "
        "CAST((SELECT count(*) FROM lineitem) AS BIGINT) "
        "UNION ALL SELECT 'events.user_id', "
        "CAST((SELECT count(*) FROM events WHERE user_id NOT IN "
        "(SELECT c_custkey FROM customer)) AS BIGINT), "
        "CAST((SELECT count(*) FROM events) AS BIGINT)"
    )


def q_nation_gini(sf_dir: str):
    """PER-NATION GINI inequality of supplier account balances, kept
    exact by the sorted-rank identity: with cents x₍₁₎ ≤ … ≤ x₍ₙ₎,
    G_num = Σ (2i − n − 1)·x₍ᵢ₎ and G_den = n·Σx (ties ordered by
    supplier key — both sides use the identical (cents, key) rank).
    One keyed_scan over the bounded per-nation groups; no floats.
    Oracle = the same identity via row_number."""
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        v = b["s_acctbal"].to_numpy(zero_copy_only=False)
        return pa.table({
            "nation": pa.array(b["s_nationkey"].to_numpy(
                zero_copy_only=False).astype(np.int64)),
            "c": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
            "k": pa.array(b["s_suppkey"].to_numpy(
                zero_copy_only=False).astype(np.int64))})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        nat = d["nation"].to_numpy()
        c = d["c"].to_numpy()
        k = d["k"].to_numpy()
        order = np.lexsort((k, c, nat))
        nat, c = nat[order], c[order]
        starts = np.r_[0, 1 + np.flatnonzero(nat[1:] != nat[:-1])]
        sizes = np.diff(np.r_[starts, len(nat)])
        i = np.arange(len(nat), dtype=np.int64) \
            - np.repeat(starts, sizes) + 1
        n = np.repeat(sizes, sizes)
        term = (2 * i - n - 1) * c
        uniq = nat[starts]
        num = np.zeros(len(uniq), np.int64)
        codes = np.repeat(np.arange(len(uniq)), sizes)
        np.add.at(num, codes, term)
        sx = np.zeros(len(uniq), np.int64)
        np.add.at(sx, codes, c)
        return pd.DataFrame({"nation": uniq, "g_num": num,
                             "g_den": sizes.astype(np.int64) * sx,
                             "n": sizes.astype(np.int64)})

    ds = _read(sf_dir, "supplier",
               ["s_suppkey", "s_nationkey", "s_acctbal"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="nation", order=["c", "k"], fn=fn,
                      n_rows=_nrows(sf_dir, "supplier"))


def q_nation_gini_sql() -> str:
    return (
        "WITH p AS (SELECT CAST(s_nationkey AS BIGINT) AS nation, "
        "CAST(floor(s_acctbal * 100.0 + 0.5) AS BIGINT) AS c, "
        "s_suppkey AS k FROM supplier), "
        "r AS (SELECT nation, c, row_number() OVER (PARTITION BY "
        "nation ORDER BY c, k) AS i, count(*) OVER (PARTITION BY "
        "nation) AS n FROM p) "
        "SELECT nation, CAST(sum((2 * i - n - 1) * c) AS BIGINT) "
        "AS g_num, CAST(any_value(n) * sum(c) AS BIGINT) AS g_den, "
        "CAST(any_value(n) AS BIGINT) AS n FROM r GROUP BY 1"
    )


def q_theil_nation(sf_dir: str):
    """THEIL-T inequality of supplier balances per nation — the
    decomposable entropy sibling of q_nation_gini: per supplier the
    pinned term floor((x·n/S)·ln(x·n/S)·10⁹ + 0.5) with x = cents,
    S = nation sum, n = nation count (identical float chain both
    sides, ints in, the q_type_entropy protocol; zero/negative
    balances are excluded — ln needs x > 0, same WHERE on both
    sides).  One keyed_scan; emits (nation, t_sum, n_pos)."""
    from ..stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        v = b["s_acctbal"].to_numpy(zero_copy_only=False)
        return pa.table({
            "nation": pa.array(b["s_nationkey"].to_numpy(
                zero_copy_only=False).astype(np.int64)),
            "c": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
            "k": pa.array(b["s_suppkey"].to_numpy(
                zero_copy_only=False).astype(np.int64))})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        d = d[d["c"] > 0]
        nat = d["nation"].to_numpy()
        c = d["c"].to_numpy().astype(np.float64)
        uniq, codes = np.unique(nat, return_inverse=True)
        n = np.zeros(len(uniq), np.int64)
        np.add.at(n, codes, 1)
        S = np.zeros(len(uniq), np.float64)
        np.add.at(S, codes, c)
        r = c * n[codes] / S[codes]
        terms = np.floor(r * np.log(r) * 1e9 + 0.5).astype(np.int64)
        t = np.zeros(len(uniq), np.int64)
        np.add.at(t, codes, terms)
        return pd.DataFrame({"nation": uniq, "t_sum": t, "n_pos": n})

    ds = _read(sf_dir, "supplier",
               ["s_suppkey", "s_nationkey", "s_acctbal"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="nation", order=["c", "k"], fn=fn,
                      n_rows=_nrows(sf_dir, "supplier"))


def q_theil_nation_sql() -> str:
    return (
        "WITH p AS (SELECT CAST(s_nationkey AS BIGINT) AS nation, "
        "CAST(floor(s_acctbal * 100.0 + 0.5) AS BIGINT) AS c "
        "FROM supplier), "
        "q AS (SELECT nation, c FROM p WHERE c > 0), "
        "g AS (SELECT nation, count(*) AS n, sum(c) AS S FROM q "
        "GROUP BY 1), "
        "t AS (SELECT q.nation, g.n, CAST(floor("
        "(CAST(q.c AS DOUBLE) * g.n / CAST(g.S AS DOUBLE)) * "
        "ln(CAST(q.c AS DOUBLE) * g.n / CAST(g.S AS DOUBLE)) "
        "* 1e9 + 0.5) AS BIGINT) AS term "
        "FROM q JOIN g ON g.nation = q.nation) "
        "SELECT nation, CAST(sum(term) AS BIGINT) AS t_sum, "
        "CAST(any_value(n) AS BIGINT) AS n_pos FROM t GROUP BY 1"
    )
