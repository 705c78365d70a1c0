"""TPC-H-shaped extension family (round 5): the classic decision-support
shapes the earlier rounds had not yet covered — promo share (Q14),
national market share (Q8), window top-supplier (Q15), distinct-supplier
counts (Q16), small-quantity revenue (Q17), idle high-balance customers
(Q22) and late-shipment priority counts (Q4).

Scale posture (shared by every entry): money is pinned to int64
quarter-cents (``floor(x * 1e4 + 0.5)``) BEFORE any distributed sum so
aggregates are order-free-exact; the big×big equi-joins ride
``copart_hash_join`` (one coarse hash exchange + per-bucket Acero);
bounded dimensions (nation/region: 25/5 rows) are driver-held lookups;
group keys fed to ``tree_aggregate`` are bounded (years × nations,
priorities, brand × size-band), so the wide step is a combiner tree,
never a sort-based Aggregate."""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ._common import _nrows, _read


def _rev_q4(price: np.ndarray, disc: np.ndarray) -> np.ndarray:
    """Quarter-cent revenue pin used identically by every oracle."""
    return np.floor(price * (1.0 - disc) * 1e4 + 0.5).astype(np.int64)


def _year_i64(ts: np.ndarray) -> np.ndarray:
    return ts.astype("datetime64[Y]").astype(np.int64) + 1970


def q_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape (promotion-revenue share per ship year):
    lineitem×part copart-joined on partkey, promo flag applied
    vectorized, then per-year int sums on the combiner tree (≤ 7
    distinct years)."""
    import pyarrow.compute as pc

    from ..stages.agg_tree import tree_aggregate
    from ..stages.joins import copart_hash_join

    def prep_line(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        yr = _year_i64(b["l_shipdate"].to_numpy(zero_copy_only=False))
        return pa.table({"l_partkey": b["l_partkey"],
                         "ship_year": pa.array(yr, pa.int64()),
                         "rev_q4": pa.array(_rev_q4(price, disc),
                                            pa.int64())})

    def prep_part(b: pa.Table) -> pa.Table:
        return pa.table({
            "p_partkey": b["p_partkey"],
            "is_promo": pc.equal(b["p_type"], "PROMO").cast(pa.int64())})

    line = _read(sf_dir, "lineitem",
                 ["l_partkey", "l_shipdate", "l_extendedprice",
                  "l_discount"]).map_batches(prep_line,
                                             batch_format="pyarrow")
    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        prep_part, batch_format="pyarrow")
    j = copart_hash_join(
        line, part, "l_partkey", "p_partkey",
        n_rows=_nrows(sf_dir, "lineitem") + _nrows(sf_dir, "part"),
        left_schema=pa.schema([("l_partkey", pa.int64()),
                               ("ship_year", pa.int64()),
                               ("rev_q4", pa.int64())]),
        right_schema=pa.schema([("p_partkey", pa.int64()),
                                ("is_promo", pa.int64())]))

    def partial(b: pa.Table) -> pa.Table:
        rev = b["rev_q4"].to_numpy(zero_copy_only=False)
        promo = rev * b["is_promo"].to_numpy(zero_copy_only=False)
        t = pa.table({"ship_year": b["ship_year"],
                      "promo_rev_q4": pa.array(promo, pa.int64()),
                      "total_rev_q4": pa.array(rev, pa.int64())})
        g = t.group_by(["ship_year"]).aggregate(
            [("promo_rev_q4", "sum"), ("total_rev_q4", "sum")])
        return g.rename_columns(["ship_year", "promo_rev_q4",
                                 "total_rev_q4"])

    return tree_aggregate(
        j.map_batches(partial, batch_format="pyarrow"),
        ["ship_year"], [("promo_rev_q4", "sum"), ("total_rev_q4", "sum")])


def q_promo_revenue_sql() -> str:
    return (
        "WITH l AS (SELECT l_partkey, CAST(year(l_shipdate) AS BIGINT) "
        "AS ship_year, CAST(floor(l_extendedprice * (1.0 - l_discount) "
        "* 1e4 + 0.5) AS BIGINT) AS rev_q4 FROM lineitem) "
        "SELECT ship_year, CAST(sum(CASE WHEN p_type = 'PROMO' THEN "
        "rev_q4 ELSE 0 END) AS BIGINT) AS promo_rev_q4, "
        "CAST(sum(rev_q4) AS BIGINT) AS total_rev_q4 "
        "FROM l JOIN part ON l_partkey = p_partkey GROUP BY 1"
    )


def q_market_share(sf_dir: str):
    """TPC-H Q8 shape (national market share): revenue shipped to
    ASIA-region customers, broken down by (order year, supplier
    nation).  Orders are semi-joined to in-region customers and then
    copart-joined to lineitem (both big×big exchanges); the supplier →
    nation attach is a broadcast of the smallest relation; the final
    (year × nation) key space is bounded, so sums ride the tree."""
    import pyarrow.parquet as pq

    from ..stages.agg_tree import tree_aggregate
    from ..stages.joins import broadcast_hash_join, copart_hash_join

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    region = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    asia = int(region.loc[region["r_name"] == "ASIA", "r_regionkey"].iloc[0])
    asia_nations = np.sort(nation.loc[
        nation["n_regionkey"] == asia, "n_nationkey"].to_numpy(np.int64))
    nation_name = dict(zip(nation["n_nationkey"].astype(int),
                           nation["n_name"].astype(str)))

    def prep_cust(b: pa.Table) -> pa.Table:
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(nk, asia_nations)
        return pa.table({"c_custkey": b["c_custkey"].filter(
            pa.array(keep))})

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]
                 ).map_batches(prep_cust, batch_format="pyarrow")

    def prep_orders(b: pa.Table) -> pa.Table:
        yr = _year_i64(b["o_orderdate"].to_numpy(zero_copy_only=False))
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "o_custkey": b["o_custkey"],
                         "o_year": pa.array(yr, pa.int64())})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        prep_orders, batch_format="pyarrow")
    o_asia = copart_hash_join(
        orders, cust, "o_custkey", "c_custkey", how="left_semi",
        n_rows=_nrows(sf_dir, "orders") + _nrows(sf_dir, "customer"),
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("o_custkey", pa.int64()),
                               ("o_year", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64())]))
    o_asia = o_asia.map_batches(
        lambda b: b.select(["o_orderkey", "o_year"]),
        batch_format="pyarrow")

    def prep_line(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"],
                         "rev_q4": pa.array(_rev_q4(price, disc),
                                            pa.int64())})

    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_suppkey", "l_extendedprice",
                  "l_discount"]).map_batches(prep_line,
                                             batch_format="pyarrow")
    j = copart_hash_join(
        line, o_asia, "l_orderkey", "o_orderkey",
        n_rows=_nrows(sf_dir, "lineitem") + _nrows(sf_dir, "orders"),
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_suppkey", pa.int64()),
                               ("rev_q4", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_year", pa.int64())]))

    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp = pd.DataFrame({
        "l_suppkey": supp["s_suppkey"].astype(np.int64),
        "supp_nation": supp["s_nationkey"].astype(int).map(nation_name)})
    j = broadcast_hash_join(j, supp, on="l_suppkey")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["o_year", "supp_nation"], as_index=False)[
            "rev_q4"].sum()
        return g

    return tree_aggregate(
        j.map_batches(partial, batch_format="pandas"),
        ["o_year", "supp_nation"], [("rev_q4", "sum")])


def q_market_share_sql() -> str:
    return (
        "WITH l AS (SELECT l_orderkey, l_suppkey, "
        "CAST(floor(l_extendedprice * (1.0 - l_discount) * 1e4 + 0.5) "
        "AS BIGINT) AS rev_q4 FROM lineitem), "
        "o AS (SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) "
        "AS o_year FROM orders JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA') "
        "SELECT o_year, n_name AS supp_nation, "
        "CAST(sum(rev_q4) AS BIGINT) AS rev_q4 "
        "FROM l JOIN o ON l_orderkey = o_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey GROUP BY 1, 2"
    )


def q_top_supplier(sf_dir: str):
    """TPC-H Q15 shape (top supplier in a quarter): per-supplier
    revenue over 1996Q1 through one suppkey hash exchange whose
    bucket-local sums are final; each bucket ships only its argmax
    row(s), the driver resolves the global max over ≤ n_buckets
    partials, and the winners pick names up from a driver-side
    filtered read of the supplier table."""
    import pyarrow.parquet as pq

    from ..stages.scan import hash_bucket_scan

    LO = np.datetime64("1996-01-01", "us").astype(np.int64)
    HI = np.datetime64("1996-04-01", "us").astype(np.int64)

    def prep(b: pa.Table) -> pa.Table:
        ts = b["l_shipdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        keep = (ts >= LO) & (ts < HI)
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        disc = b["l_discount"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "l_suppkey": b["l_suppkey"].filter(pa.array(keep)),
            "rev_q4": pa.array(_rev_q4(price, disc), pa.int64())})

    ds = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_shipdate", "l_extendedprice",
                "l_discount"]).map_batches(prep, batch_format="pyarrow")

    def bucket_max(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_suppkey"]).aggregate([("rev_q4", "sum")])
        rev = g["rev_q4_sum"].to_numpy(zero_copy_only=False)
        if len(rev) == 0:
            return pa.table({"s_suppkey": pa.array([], pa.int64()),
                             "total_rev_q4": pa.array([], pa.int64())})
        keep = rev == rev.max()
        return pa.table({
            "s_suppkey": g["l_suppkey"].filter(pa.array(keep)),
            "total_rev_q4": pa.array(rev[keep], pa.int64())})

    partials = hash_bucket_scan(ds, ["l_suppkey"], bucket_max,
                                n_rows=_nrows(sf_dir, "lineitem")
                                ).to_pandas()
    best = int(partials["total_rev_q4"].max())
    top = partials[partials["total_rev_q4"] == best]
    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_name"]).to_pandas()
    out = top.merge(supp, on="s_suppkey")
    return out[["s_suppkey", "s_name", "total_rev_q4"]].sort_values(
        "s_suppkey").reset_index(drop=True)


def q_top_supplier_sql() -> str:
    return (
        "WITH r AS (SELECT l_suppkey AS s_suppkey, CAST(sum(CAST(floor("
        "l_extendedprice * (1.0 - l_discount) * 1e4 + 0.5) AS BIGINT)) "
        "AS BIGINT) AS total_rev_q4 FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY 1) "
        "SELECT s.s_suppkey, s_name, total_rev_q4 FROM r "
        "JOIN supplier s USING (s_suppkey) "
        "WHERE total_rev_q4 = (SELECT max(total_rev_q4) FROM r)"
    )


def q_brand_suppliers(sf_dir: str):
    """TPC-H Q16 shape (suppliers per brand/size band): lineitem×part
    copart join attaches (brand, size band); distinct (brand, band,
    suppkey) triples resolve inside ONE suppkey-keyed hash bucket
    exchange (all rows of a triple share the suppkey, so bucket-local
    distinct is global), and the bounded brand×band counts ride the
    combiner tree."""
    from ..stages.agg_tree import tree_aggregate
    from ..stages.joins import copart_hash_join
    from ..stages.scan import hash_bucket_scan

    def prep_part(b: pa.Table) -> pa.Table:
        size = b["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"p_partkey": b["p_partkey"],
                         "p_brand": b["p_brand"],
                         "size_band": pa.array(size // 10, pa.int64())})

    line = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]
                 ).map_batches(prep_part, batch_format="pyarrow")
    j = copart_hash_join(
        line, part, "l_partkey", "p_partkey",
        n_rows=_nrows(sf_dir, "lineitem") + _nrows(sf_dir, "part"),
        left_schema=pa.schema([("l_partkey", pa.int64()),
                               ("l_suppkey", pa.int64())]),
        right_schema=pa.schema([("p_partkey", pa.int64()),
                                ("p_brand", pa.string()),
                                ("size_band", pa.int64())]))

    def local_distinct(b: pa.Table) -> pa.Table:
        return b.select(["l_suppkey", "p_brand", "size_band"]).group_by(
            ["l_suppkey", "p_brand", "size_band"]).aggregate([])

    trip = j.map_batches(local_distinct, batch_format="pyarrow")

    def bucket(t: pa.Table) -> pa.Table:
        d = t.group_by(["l_suppkey", "p_brand", "size_band"]).aggregate([])
        g = d.group_by(["p_brand", "size_band"]).aggregate(
            [("l_suppkey", "count")])
        return g.rename_columns(["p_brand", "size_band", "n_supp"])

    partials = hash_bucket_scan(trip, ["l_suppkey"], bucket,
                                n_rows=_nrows(sf_dir, "lineitem"))
    return tree_aggregate(partials, ["p_brand", "size_band"],
                          [("n_supp", "sum")])


def q_brand_suppliers_sql() -> str:
    return (
        "WITH pp AS (SELECT p_partkey, p_brand, "
        "CAST(p_size // 10 AS BIGINT) AS size_band FROM part) "
        "SELECT p_brand, size_band, "
        "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp "
        "FROM lineitem JOIN pp ON l_partkey = p_partkey GROUP BY 1, 2"
    )


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape (small-quantity revenue): lineitems whose
    quantity is under a fifth of their part's average quantity —
    rewritten as the exact integer predicate ``5·qty·count < Σqty``
    (quantities are integral) so no float average crosses the
    exchange.  One partkey hash co-partition computes per-part stats
    and the qualifying-revenue partial inside each bucket; the driver
    folds ≤ n_buckets single-row partials."""
    from ..stages.scan import hash_bucket_scan

    def prep(b: pa.Table) -> pa.Table:
        qty = np.floor(b["l_quantity"].to_numpy(zero_copy_only=False)
                       + 0.5).astype(np.int64)
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table({
            "l_partkey": b["l_partkey"],
            "qty": pa.array(qty, pa.int64()),
            "rev_q4": pa.array(np.floor(price * 1e4 + 0.5).astype(np.int64),
                               pa.int64())})

    ds = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"]).map_batches(
        prep, batch_format="pyarrow")

    def bucket(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        qty = t["qty"].to_numpy(zero_copy_only=False)
        rev = t["rev_q4"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(pk, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        sq = np.zeros(len(uniq), np.int64)
        np.add.at(sq, inv, qty)
        mask = 5 * qty * cnt[inv] < sq[inv]
        return pa.table({
            "n_small": pa.array([int(mask.sum())], pa.int64()),
            "small_rev_q4": pa.array([int(rev[mask].sum())], pa.int64())})

    partials = hash_bucket_scan(ds, ["l_partkey"], bucket,
                                n_rows=_nrows(sf_dir, "lineitem")
                                ).to_pandas()
    return pd.DataFrame({
        "n_small": [np.int64(partials["n_small"].sum())],
        "small_rev_q4": [np.int64(partials["small_rev_q4"].sum())]})


def q_small_qty_revenue_sql() -> str:
    return (
        "WITH q AS (SELECT l_partkey, CAST(floor(l_quantity + 0.5) AS "
        "BIGINT) AS qty, CAST(floor(l_extendedprice * 1e4 + 0.5) AS "
        "BIGINT) AS rev_q4 FROM lineitem), "
        "s AS (SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS sq, "
        "CAST(count(*) AS BIGINT) AS c FROM q GROUP BY 1) "
        "SELECT CAST(count(*) AS BIGINT) AS n_small, "
        "CAST(COALESCE(sum(rev_q4), 0) AS BIGINT) AS small_rev_q4 "
        "FROM q JOIN s USING (l_partkey) WHERE 5 * qty * c < sq"
    )


def q_idle_customers(sf_dir: str):
    """TPC-H Q22 shape (idle high-balance customers): customers above
    the positive-balance average with no RECENT orders (none since
    1999 — the unqualified anti-join is degenerate on this data: every
    customer has some order), grouped by nation.  Balance cents are
    int64 so the average's numerator/denominator are exact (the single
    int/int division is one deterministic IEEE op on both sides); the
    no-orders test is a copart LEFT ANTI join against per-batch-
    distinct recent-order custkeys; the nation rollup is bounded."""
    from ..stages.agg_tree import tree_aggregate_to_table
    from ..stages.joins import copart_hash_join

    def prep_cust(b: pa.Table) -> pa.Table:
        cents = np.floor(b["c_acctbal"].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "c_custkey": b["c_custkey"],
            "nationkey": pa.array(
                b["c_nationkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64), pa.int64()),
            "cents": pa.array(cents, pa.int64())})

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"]).map_batches(
        prep_cust, batch_format="pyarrow")

    def thr_partial(b: pa.Table) -> pa.Table:
        c = b["cents"].to_numpy(zero_copy_only=False)
        pos = c[c > 0]
        return pa.table({"k": pa.array([0], pa.int64()),
                         "s": pa.array([int(pos.sum())], pa.int64()),
                         "n": pa.array([len(pos)], pa.int64())})

    t = tree_aggregate_to_table(
        cust.map_batches(thr_partial, batch_format="pyarrow"),
        ["k"], [("s", "sum"), ("n", "sum")])
    thr = float(t["s"][0].as_py()) / float(t["n"][0].as_py())

    rich = cust.map_batches(
        lambda b: b.filter(pa.array(
            b["cents"].to_numpy(zero_copy_only=False).astype(np.float64)
            > thr)),
        batch_format="pyarrow")

    CUT_US = int(np.datetime64("1999-01-01", "us").astype(np.int64))

    def recent_keys(b: pa.Table) -> pa.Table:
        ts = b["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return b.filter(pa.array(ts >= CUT_US)).select(
            ["o_custkey"]).group_by(["o_custkey"]).aggregate([])

    o_keys = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]
                   ).map_batches(recent_keys, batch_format="pyarrow")
    idle = copart_hash_join(
        rich, o_keys, "c_custkey", "o_custkey", how="left_anti",
        n_rows=_nrows(sf_dir, "customer") + _nrows(sf_dir, "orders"),
        left_schema=pa.schema([("c_custkey", pa.int64()),
                               ("nationkey", pa.int64()),
                               ("cents", pa.int64())]),
        right_schema=pa.schema([("o_custkey", pa.int64())]))

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"nationkey": b["nationkey"],
                      "n_cust": pa.array(np.ones(len(b), np.int64),
                                         pa.int64()),
                      "total_cents": b["cents"]})
        g = t.group_by(["nationkey"]).aggregate(
            [("n_cust", "sum"), ("total_cents", "sum")])
        return g.rename_columns(["nationkey", "n_cust", "total_cents"])

    from ..stages.agg_tree import tree_aggregate

    return tree_aggregate(
        idle.map_batches(partial, batch_format="pyarrow"),
        ["nationkey"], [("n_cust", "sum"), ("total_cents", "sum")])


def q_idle_customers_sql() -> str:
    return (
        "WITH c AS (SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS "
        "nationkey, CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS "
        "cents FROM customer), "
        "t AS (SELECT CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS "
        "DOUBLE) AS thr FROM c WHERE cents > 0) "
        "SELECT nationkey, CAST(count(*) AS BIGINT) AS n_cust, "
        "CAST(sum(cents) AS BIGINT) AS total_cents FROM c, t "
        "WHERE CAST(cents AS DOUBLE) > thr AND c_custkey NOT IN "
        "(SELECT o_custkey FROM orders "
        "WHERE o_orderdate >= TIMESTAMP '1999-01-01') GROUP BY 1"
    )


def q_late_priority(sf_dir: str):
    """TPC-H Q4 shape (orders with a late shipment, per priority):
    orders×lineitem copart join on orderkey, late test (> 90 days
    after order date) vectorized in int64 microseconds; qualifying
    (orderkey, priority) pairs dedup inside one orderkey-keyed
    exchange (per-batch distinct first bounds the exchange by distinct
    orders per batch, not lineitems); the 5-priority count rides the
    tree."""
    from ..stages.agg_tree import tree_aggregate
    from ..stages.joins import copart_hash_join
    from ..stages.scan import hash_bucket_scan

    LATE_US = 90 * 86_400_000_000

    def prep_orders(b: pa.Table) -> pa.Table:
        ts = b["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "o_orderpriority": b["o_orderpriority"],
                         "ord_us": pa.array(ts, pa.int64())})

    def prep_line(b: pa.Table) -> pa.Table:
        ts = b["l_shipdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "ship_us": pa.array(ts, pa.int64())})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"]
                   ).map_batches(prep_orders, batch_format="pyarrow")
    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]
                 ).map_batches(prep_line, batch_format="pyarrow")
    j = copart_hash_join(
        orders, line, "o_orderkey", "l_orderkey",
        n_rows=_nrows(sf_dir, "orders") + _nrows(sf_dir, "lineitem"),
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("o_orderpriority", pa.string()),
                               ("ord_us", pa.int64())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("ship_us", pa.int64())]))

    def late_pairs(b: pa.Table) -> pa.Table:
        late = (b["ship_us"].to_numpy(zero_copy_only=False)
                > b["ord_us"].to_numpy(zero_copy_only=False) + LATE_US)
        t = b.filter(pa.array(late)).select(
            ["o_orderkey", "o_orderpriority"])
        return t.group_by(["o_orderkey", "o_orderpriority"]).aggregate([])

    pairs = j.map_batches(late_pairs, batch_format="pyarrow")

    def bucket(t: pa.Table) -> pa.Table:
        d = t.group_by(["o_orderkey", "o_orderpriority"]).aggregate([])
        g = d.group_by(["o_orderpriority"]).aggregate(
            [("o_orderkey", "count")])
        return g.rename_columns(["o_orderpriority", "n_late"])

    partials = hash_bucket_scan(pairs, ["o_orderkey"], bucket,
                                n_rows=_nrows(sf_dir, "lineitem"))
    return tree_aggregate(partials, ["o_orderpriority"],
                          [("n_late", "sum")])


def q_late_priority_sql() -> str:
    return (
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late "
        "FROM orders WHERE EXISTS (SELECT 1 FROM lineitem "
        "WHERE l_orderkey = o_orderkey "
        "AND l_shipdate > o_orderdate + INTERVAL 90 DAY) GROUP BY 1"
    )
