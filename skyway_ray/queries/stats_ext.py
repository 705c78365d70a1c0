"""Classical-statistics query family (round 5): rank correlation
(Spearman), rank-sum test (Mann-Whitney U), chi-square independence
terms and one-way ANOVA terms — the screening statistics an
experimentation / data-quality pipeline runs over event streams.

Exactness contract (CLAUDE.md): ranks are integer ROW_NUMBERs with a
deterministic (value, event_id) tie-break, so every rank statistic is
an exact int64; the chi²/ANOVA outputs are emitted as PER-GROUP pinned
terms (``floor(x·1e6 + 0.5)``) computed from exact integer counts with
the identical float operation order on both sides — no float ever sums
across an unordered distributed aggregate.

Scale posture: ranking rides ``stages/global_scan.global_rank`` (range
buckets + offset broadcast — no global sort operator); the rank→rank
pairing is a ``copart_hash_join`` on event_id; every final key space
(event types, value bands) is bounded, so reductions ride the combiner
tree."""
from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ._common import _nrows, _read

# Spearman composite sort keys: rank-within-type == composite global
# rank minus a per-type offset that is IDENTICAL for both orderings
# (it only counts rows of types with a smaller code), so the offsets
# cancel in d = rank_v - rank_t and the oracle can use plain
# PARTITION BY row_number.  code < 2^32 and payload < 2^31 keep the
# packed key inside int64 (max = 2^63 - 1 exactly).
_CODE_SHIFT = np.int64(2) ** 31


def _type_codes(et: np.ndarray) -> np.ndarray:
    """Vectorized crc32 per batch-distinct event_type (vocabulary-
    bounded work, same dispatch trick as stages/scan.py)."""
    uniq, inv = np.unique(et.astype("U"), return_inverse=True)
    codes = np.fromiter((zlib.crc32(u.encode()) for u in uniq),
                        dtype=np.int64, count=len(uniq))
    return codes[inv]


def q_spearman(sf_dir: str):
    """Spearman rank correlation inputs per event type: n and
    Σd² between the value-ranking and the time-ranking (ties broken by
    event_id on both sides; ts compared at second resolution so the
    tie-break is exercised).  ρ = 1 − 6Σd²/(n(n²−1)) is left to the
    reader — n and Σd² are the exact-int sufficient statistics."""
    from ..stages.agg_tree import tree_aggregate
    from ..stages.global_scan import global_rank
    from ..stages.joins import copart_hash_join

    n_ev = _nrows(sf_dir, "events")

    def prep_v(b: pa.Table) -> pa.Table:
        v6 = np.floor(b["value"].to_numpy(zero_copy_only=False) * 1e6
                      + 0.5).astype(np.int64)
        code = _type_codes(b["event_type"].to_numpy(zero_copy_only=False))
        return pa.table({"event_id": b["event_id"],
                         "event_type": b["event_type"],
                         "ck": pa.array(code * _CODE_SHIFT + v6,
                                        pa.int64())})

    def prep_t(b: pa.Table) -> pa.Table:
        sec = (b["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").astype(np.int64) // 1_000_000)
        code = _type_codes(b["event_type"].to_numpy(zero_copy_only=False))
        return pa.table({"event_id": b["event_id"],
                         "ck": pa.array(code * _CODE_SHIFT + sec,
                                        pa.int64())})

    rv = global_rank(
        _read(sf_dir, "events", ["event_id", "event_type", "value"]
              ).map_batches(prep_v, batch_format="pyarrow"),
        "ck", "event_id", out_col="rank_v", n_rows=n_ev,
        keep=("event_type",))
    rt = global_rank(
        _read(sf_dir, "events", ["event_id", "event_type", "ts"]
              ).map_batches(prep_t, batch_format="pyarrow"),
        "ck", "event_id", out_col="rank_t", n_rows=n_ev)
    j = copart_hash_join(
        rv, rt, "event_id", n_rows=2 * n_ev,
        left_schema=pa.schema([("event_id", pa.int64()),
                               ("rank_v", pa.int64()),
                               ("event_type", pa.string())]),
        right_schema=pa.schema([("event_id", pa.int64()),
                                ("rank_t", pa.int64())]))

    def partial(b: pa.Table) -> pa.Table:
        d = (b["rank_v"].to_numpy(zero_copy_only=False)
             - b["rank_t"].to_numpy(zero_copy_only=False))
        t = pa.table({"event_type": b["event_type"],
                      "n": pa.array(np.ones(len(b), np.int64), pa.int64()),
                      "sum_d2": pa.array(d * d, pa.int64())})
        g = t.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("sum_d2", "sum")])
        return g.rename_columns(["event_type", "n", "sum_d2"])

    return tree_aggregate(j.map_batches(partial, batch_format="pyarrow"),
                          ["event_type"], [("n", "sum"), ("sum_d2", "sum")])


def q_spearman_sql() -> str:
    return (
        "WITH v AS (SELECT event_id, event_type, row_number() OVER ("
        "PARTITION BY event_type ORDER BY CAST(floor(value * 1e6 + 0.5) "
        "AS BIGINT), event_id) AS rv FROM events), "
        "t AS (SELECT event_id, row_number() OVER (PARTITION BY "
        "event_type ORDER BY epoch_us(ts) // 1000000, event_id) AS rt "
        "FROM events) "
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum((rv - rt) * (rv - rt)) AS BIGINT) AS sum_d2 "
        "FROM v JOIN t USING (event_id) GROUP BY 1"
    )


def q_mann_whitney(sf_dir: str):
    """Mann-Whitney rank-sum test inputs for purchase vs view values:
    joint ranks over the pooled sample (ties → event_id), then
    U_A = R_A − n_A(n_A+1)/2 from exact integer rank sums."""
    import pyarrow.compute as pc

    from ..stages.agg_tree import tree_aggregate_to_table
    from ..stages.global_scan import global_rank

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b["event_type"],
                              value_set=pa.array(["purchase", "view"])))
        v6 = np.floor(t["value"].to_numpy(zero_copy_only=False) * 1e6
                      + 0.5).astype(np.int64)
        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"],
                         "v6": pa.array(v6, pa.int64())})

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"]
               ).map_batches(prep, batch_format="pyarrow")
    ranked = global_rank(ds, "v6", "event_id", out_col="rk",
                         n_rows=_nrows(sf_dir, "events"),
                         keep=("event_type",))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("event_type", as_index=False).agg(
            n=("rk", "size"), r=("rk", "sum"))
        g["n"] = g["n"].astype(np.int64)
        g["r"] = g["r"].astype(np.int64)
        return g

    t = tree_aggregate_to_table(
        ranked.map_batches(partial, batch_format="pandas"),
        ["event_type"], [("n", "sum"), ("r", "sum")]).to_pandas()
    t = t.set_index("event_type")
    n_a = int(t.loc["purchase", "n"])
    n_b = int(t.loc["view", "n"])
    u_a = int(t.loc["purchase", "r"]) - (n_a * (n_a + 1)) // 2
    return pd.DataFrame({"n_a": [np.int64(n_a)], "n_b": [np.int64(n_b)],
                         "u_a": [np.int64(u_a)]})


def q_mann_whitney_sql() -> str:
    return (
        "WITH x AS (SELECT event_id, event_type, "
        "CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v6 FROM events "
        "WHERE event_type IN ('purchase', 'view')), "
        "r AS (SELECT event_type, row_number() OVER (ORDER BY v6, "
        "event_id) AS rk FROM x), "
        "s AS (SELECT CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 "
        "ELSE 0 END) AS BIGINT) AS n_a, CAST(sum(CASE WHEN event_type = "
        "'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_b, "
        "CAST(sum(CASE WHEN event_type = 'purchase' THEN rk ELSE 0 END) "
        "AS BIGINT) AS r_a FROM r) "
        "SELECT n_a, n_b, CAST(r_a - (n_a * (n_a + 1)) // 2 AS BIGINT) "
        "AS u_a FROM s"
    )


def q_chi2_independence(sf_dir: str):
    """Chi-square independence screen over the event_type × value-band
    contingency table: observed counts ride the combiner tree (the
    table is bounded: types × 5 bands), and each cell's χ² term
    (o−e)²/e is pinned to micro-units per cell — no float crosses a
    distributed sum, and the bounded driver fold applies the identical
    operation order as the oracle's window expression."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        band = np.minimum(np.floor(v / 100.0).astype(np.int64), 4)
        t = pa.table({"event_type": b["event_type"],
                      "band": pa.array(band, pa.int64()),
                      "o": pa.array(np.ones(len(b), np.int64), pa.int64())})
        g = t.group_by(["event_type", "band"]).aggregate([("o", "sum")])
        return g.rename_columns(["event_type", "band", "o"])

    obs = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_type", "value"]).map_batches(
            partial, batch_format="pyarrow"),
        ["event_type", "band"], [("o", "sum")]).to_pandas()
    # bounded driver fold over ≤ types×5 exact-int cells
    rt = obs.groupby("event_type")["o"].transform("sum").to_numpy(np.int64)
    ct = obs.groupby("band")["o"].transform("sum").to_numpy(np.int64)
    n = np.int64(obs["o"].sum())
    o = obs["o"].to_numpy(np.int64)
    e = rt.astype(np.float64) * ct.astype(np.float64) / np.float64(n)
    d = o.astype(np.float64) - e
    chi = d * d / e
    return pd.DataFrame({
        "event_type": obs["event_type"].astype(str),
        "band": obs["band"].to_numpy(np.int64),
        "o": o,
        "chi_micro": np.floor(chi * 1e6 + 0.5).astype(np.int64),
    }).reset_index(drop=True)


def q_chi2_independence_sql() -> str:
    return (
        "WITH c AS (SELECT event_type, LEAST(CAST(floor(value / 100.0) "
        "AS BIGINT), 4) AS band, CAST(count(*) AS BIGINT) AS o "
        "FROM events GROUP BY 1, 2), "
        "t AS (SELECT event_type, band, o, "
        "sum(o) OVER (PARTITION BY event_type) AS rt, "
        "sum(o) OVER (PARTITION BY band) AS ct, "
        "sum(o) OVER () AS n FROM c) "
        "SELECT event_type, band, o, CAST(floor(((CAST(o AS DOUBLE) - "
        "CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)) * "
        "(CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / "
        "CAST(n AS DOUBLE))) / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) "
        "/ CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS chi_micro "
        "FROM t"
    )


def q_anova_f(sf_dir: str):
    """One-way ANOVA sufficient terms per event type over value cents:
    exact-int per-type (n, Σc, Σc²) partials ride the tree; the
    between-group term n_g(m_g − m)² and within-group term
    Σc² − (Σc)²/n_g are pinned per GROUP (micro-cents²) so no float
    result ever crosses an unordered sum — F assembles from the rows.
    Sums of squared cents stay under int64 through the test scales
    (c ≤ 5·10⁴ → c² ≤ 2.5·10⁹/row); the 10¹²-row path would swap the
    Σc² accumulator to a 128-bit pair, noted here for scale."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        c = np.floor(b["value"].to_numpy(zero_copy_only=False) * 100.0
                     + 0.5).astype(np.int64)
        t = pa.table({"event_type": b["event_type"],
                      "n": pa.array(np.ones(len(b), np.int64), pa.int64()),
                      "s": pa.array(c, pa.int64()),
                      "ss": pa.array(c * c, pa.int64())})
        g = t.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("s", "sum"), ("ss", "sum")])
        return g.rename_columns(["event_type", "n", "s", "ss"])

    t = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_type", "value"]).map_batches(
            partial, batch_format="pyarrow"),
        ["event_type"], [("n", "sum"), ("s", "sum"), ("ss", "sum")]
        ).to_pandas()
    n = t["n"].to_numpy(np.int64)
    s = t["s"].to_numpy(np.int64)
    ss = t["ss"].to_numpy(np.int64)
    grand = np.int64(s.sum())
    tot = np.int64(n.sum())
    mg = s.astype(np.float64) / n.astype(np.float64)
    m = np.float64(grand) / np.float64(tot)
    d = mg - m
    ssb = n.astype(np.float64) * d * d
    ssw = ss.astype(np.float64) - (s.astype(np.float64)
                                   * s.astype(np.float64)
                                   / n.astype(np.float64))
    return pd.DataFrame({
        "event_type": t["event_type"].astype(str),
        "n": n,
        "ssb_micro": np.floor(ssb * 1e6 + 0.5).astype(np.int64),
        "ssw_micro": np.floor(ssw * 1e6 + 0.5).astype(np.int64),
    }).reset_index(drop=True)


def q_anova_f_sql() -> str:
    return (
        "WITH p AS (SELECT event_type, CAST(floor(value * 100.0 + 0.5) "
        "AS BIGINT) AS c FROM events), "
        "g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS ss "
        "FROM p GROUP BY 1), "
        "t AS (SELECT event_type, n, s, ss, "
        "sum(s) OVER () AS grand, sum(n) OVER () AS tot FROM g) "
        "SELECT event_type, n, "
        "CAST(floor(CAST(n AS DOUBLE) * (CAST(s AS DOUBLE) / "
        "CAST(n AS DOUBLE) - CAST(grand AS DOUBLE) / CAST(tot AS DOUBLE)"
        ") * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE) - CAST(grand AS "
        "DOUBLE) / CAST(tot AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) "
        "AS ssb_micro, "
        "CAST(floor((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * "
        "CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) "
        "AS ssw_micro FROM t"
    )


_CMS_W_BITS = 10                       # 1024 buckets per row
_CMS_D = 4                             # rows (seeds 0..3)


def q_cms_counts(sf_dir: str):
    """COUNT-MIN SKETCH point estimates per event type, HASH-VERIFIED:
    the sketch is the real distributed artifact — a MERGEABLE
    4×1024 int64 grid (32 KiB) built by per-batch vocabulary-bounded
    partials on the combiner tree (type → fingerprint64 code →
    splitmix64(seed=r) top-10-bit bucket).  Estimates = min over the 4
    rows of the probed cells; the exact per-type counts ride along, so
    the CMS overcount guarantee (est ≥ exact) is itself asserted by
    the oracle, which replays code, buckets, and cell sums in HUGEINT
    (stages/hll.splitmix64_sql precedent).  At 100 TB only the 32 KiB
    grids merge — never raw keys."""
    from ..functions.text import fingerprint64
    from ..stages.agg_tree import tree_aggregate_to_table
    from ..stages.hll import _splitmix64

    shift = np.uint64(64 - _CMS_W_BITS)

    def partial(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(et.astype("U"), return_counts=True)
        code = fingerprint64(pd.Series(uniq))
        rows, buckets, cs = [], [], []
        for r in range(_CMS_D):
            rows.append(np.full(len(uniq), r, np.int64))
            buckets.append((_splitmix64(code, seed=r) >> shift
                            ).astype(np.int64))
            cs.append(counts.astype(np.int64))
        return pa.table({"r": pa.array(np.concatenate(rows)),
                         "b": pa.array(np.concatenate(buckets)),
                         "c": pa.array(np.concatenate(cs))})

    ev = _read(sf_dir, "events", ["event_type"])
    sketch = tree_aggregate_to_table(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["r", "b"], [("c", "sum")])
    grid = np.zeros((_CMS_D, 1 << _CMS_W_BITS), np.int64)
    grid[sketch["r"].to_numpy(zero_copy_only=False),
         sketch["b"].to_numpy(zero_copy_only=False)] = \
        sketch["c"].to_numpy(zero_copy_only=False)

    def exact_partial(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(et.astype("U"), return_counts=True)
        return pa.table({"event_type": pa.array(uniq),
                         "c": pa.array(counts.astype(np.int64))})

    exact = tree_aggregate_to_table(
        ev.map_batches(exact_partial, batch_format="pyarrow"),
        ["event_type"], [("c", "sum")]).to_pandas()
    code = fingerprint64(exact["event_type"])
    est = np.full(len(exact), np.iinfo(np.int64).max, np.int64)
    for r in range(_CMS_D):
        bkt = (_splitmix64(code, seed=r) >> shift).astype(np.int64)
        est = np.minimum(est, grid[r, bkt])
    return pd.DataFrame({"event_type": exact["event_type"],
                         "est": est,
                         "exact": exact["c"].to_numpy()})


def q_cms_counts_sql() -> str:
    from ..stages.hll import splitmix64_sql

    fp = ("CASE WHEN octet_length(encode(event_type)) = 0 "
          "THEN 0::HUGEINT ELSE list_reduce(list_transform("
          "range(0, octet_length(encode(event_type))), "
          "i -> CAST(CAST(concat('0x', substr(hex(encode(event_type)), "
          "2*i+1, 2)) AS INT) AS HUGEINT) + 1), "
          "(acc, b) -> (acc * 1099511628211::HUGEINT + b) "
          "% 18446744073709551616::HUGEINT) END")
    bcols = ", ".join(
        f"({splitmix64_sql('h', seed=r)}) // {1 << (64 - _CMS_W_BITS)}"
        f" AS b{r}" for r in range(_CMS_D))
    joins = " ".join(
        f"JOIN (SELECT a.event_type, sum(x.c) AS s FROM b a "
        f"JOIN b x ON x.b{r} = a.b{r} GROUP BY 1) e{r} "
        f"ON e{r}.event_type = b.event_type" for r in range(_CMS_D))
    least = ", ".join(f"e{r}.s" for r in range(_CMS_D))
    return (
        "WITH t AS (SELECT event_type, count(*) AS c FROM events "
        "GROUP BY 1), "
        f"h0 AS (SELECT event_type, c, {fp} AS h FROM t), "
        f"b AS (SELECT event_type, c, {bcols} FROM h0) "
        f"SELECT b.event_type, CAST(least({least}) AS BIGINT) AS est, "
        f"CAST(b.c AS BIGINT) AS exact FROM b {joins}"
    )


_MERKLE_LEAF = 128
_MERKLE_FAN = 16


def q_merkle_levels(sf_dir: str):
    """MERKLE-STYLE RANGE-HASH TREE over the events table — the
    anti-entropy / sync primitive a 100 TB store uses to find which
    key ranges diverge without shipping rows: row digest =
    splitmix64(event_id) + splitmix64(cents, seed=1) (mod 2^64), leaf
    = sum of row digests over event_id // 128, then two more levels
    of fan-16 range sums.  Commutative mod-2^64 sums ⇒ one combiner-
    tree pass builds every level regardless of partitioning; emitted
    as two's-complement int64.  Oracle replays the digests in HUGEINT
    (splitmix64_sql) and re-aggregates each level."""
    from ..stages.agg_tree import tree_aggregate_to_table
    from ..stages.hll import _splitmix64

    M = np.uint64(0xFFFFFFFFFFFFFFFF)

    def partial(b: pa.Table) -> pa.Table:
        e = b["event_id"].to_numpy(zero_copy_only=False)
        v = b["value"].to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        with np.errstate(over="ignore"):
            h = (_splitmix64(e, seed=0) + _splitmix64(cents, seed=1)) & M
        t = pa.table({"leaf": pa.array((e // _MERKLE_LEAF
                                        ).astype(np.int64)),
                      "h": pa.array(h.view(np.int64))})
        # per-batch pre-sum in uint64 wrap space
        g = t.to_pandas().groupby("leaf", sort=False, as_index=False)
        s = g.agg(h=("h", lambda x: np.int64(
            x.to_numpy().view(np.uint64).sum(dtype=np.uint64))))
        return pa.Table.from_pandas(s, preserve_index=False)

    leaves = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_id", "value"]).map_batches(
            partial, batch_format="pyarrow"),
        ["leaf"], [("h", "sum")]).to_pandas()
    # int64 'sum' in the tree wraps exactly like uint64 mod 2^64 ✓
    out = [pd.DataFrame({"level": np.int64(0),
                         "node": leaves["leaf"].to_numpy(),
                         "h": leaves["h"].to_numpy()})]
    cur = out[0]
    for lvl in (1, 2):
        nodes = cur["node"].to_numpy() // _MERKLE_FAN
        with np.errstate(over="ignore"):
            df = pd.DataFrame({"node": nodes,
                               "h": cur["h"].to_numpy()})
            g = (df.groupby("node", as_index=False)
                 .agg(h=("h", lambda x: np.int64(
                     x.to_numpy().view(np.uint64).sum(dtype=np.uint64)))))
        cur = pd.DataFrame({"level": np.int64(lvl),
                            "node": g["node"].to_numpy(),
                            "h": g["h"].to_numpy()})
        out.append(cur)
    return pd.concat(out, ignore_index=True)


def q_merkle_levels_sql() -> str:
    from ..stages.hll import splitmix64_sql

    h = (f"(({splitmix64_sql('event_id', seed=0)}) + "
         f"({splitmix64_sql('CAST(floor(value * 100.0 + 0.5) AS BIGINT)', seed=1)}))"
         " % 18446744073709551616::HUGEINT")
    to_i64 = ("CASE WHEN s >= 9223372036854775808::HUGEINT "
              "THEN s - 18446744073709551616::HUGEINT ELSE s END")
    return (
        f"WITH r AS (SELECT event_id // {_MERKLE_LEAF} AS leaf, "
        f"{h} AS h FROM events), "
        "l0 AS (SELECT leaf AS node, "
        "sum(h) % 18446744073709551616::HUGEINT AS s FROM r GROUP BY 1), "
        f"l1 AS (SELECT node // {_MERKLE_FAN} AS node, "
        "sum(s) % 18446744073709551616::HUGEINT AS s FROM l0 GROUP BY 1), "
        f"l2 AS (SELECT node // {_MERKLE_FAN} AS node, "
        "sum(s) % 18446744073709551616::HUGEINT AS s FROM l1 GROUP BY 1) "
        "SELECT CAST(0 AS BIGINT) AS level, node, "
        f"CAST({to_i64} AS BIGINT) AS h FROM l0 "
        "UNION ALL SELECT 1, node, "
        f"CAST({to_i64} AS BIGINT) FROM l1 "
        "UNION ALL SELECT 2, node, "
        f"CAST({to_i64} AS BIGINT) FROM l2"
    )


_ITEM_TYPES = ("click", "error", "purchase", "signup", "view")


def q_itemset_triples(sf_dir: str):
    """FREQUENT ITEMSET mining (the market-basket shape) over the
    bounded event-type domain: one user-keyed hash-bucket exchange
    builds each user's 5-bit presence mask (np.bitwise_or.at in the
    bucket task), the buckets emit the BOUNDED mask histogram
    (≤ 2⁵ keys) onto the combiner tree, and the driver folds support
    counts for every type TRIPLE = users whose mask covers it — the
    a-priori candidate lattice is bounded by the vocabulary, never the
    data, so only 32 ints cross the final wire.  Exact; oracle folds
    the same masks from a DISTINCT (user, type) projection."""
    from itertools import combinations

    from ..stages.agg_tree import tree_aggregate_to_table
    from ..stages.scan import hash_bucket_scan

    tcode = {t: i for i, t in enumerate(_ITEM_TYPES)}

    def prep(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(et.astype("U"), return_inverse=True)
        codes = np.array([tcode.get(t, -1) for t in uniq], np.int64)
        row_code = codes[inv]
        keep = row_code >= 0            # unknown types are not items
        t = pa.table({"user_id": b["user_id"].filter(pa.array(keep)),
                      "bit": pa.array(np.int64(1) << row_code[keep])})
        g = t.group_by(["user_id", "bit"]).aggregate([])
        return g

    def mask_hist(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        bit = t["bit"].to_numpy(zero_copy_only=False)
        uu, ui = np.unique(u, return_inverse=True)
        mm = np.zeros(len(uu), np.int64)
        np.bitwise_or.at(mm, ui, bit)
        hm, hc = np.unique(mm, return_counts=True)
        return pa.table({"m": pa.array(hm),
                         "n": pa.array(hc.astype(np.int64))})

    rows = _read(sf_dir, "events",
                 ["user_id", "event_type"]).map_batches(
        prep, batch_format="pyarrow")
    hist = tree_aggregate_to_table(
        hash_bucket_scan(rows, ["user_id"], mask_hist,
                         n_rows=_nrows(sf_dir, "events")),
        ["m"], [("n", "sum")]).to_pandas()
    m = hist["m"].to_numpy()
    n = hist["n"].to_numpy()
    out = []
    for combo in combinations(range(len(_ITEM_TYPES)), 3):
        cm = sum(1 << c for c in combo)
        out.append((combo[0], combo[1], combo[2],
                    int(n[(m & cm) == cm].sum())))
    df = pd.DataFrame(out, columns=["t0", "t1", "t2", "support"])
    return df.astype(np.int64)


def q_itemset_triples_sql() -> str:
    code = ("CASE event_type " + " ".join(
        f"WHEN '{t}' THEN {i}" for i, t in enumerate(_ITEM_TYPES))
        + " END")
    from itertools import combinations
    combos = " UNION ALL ".join(
        f"SELECT {a} AS t0, {b} AS t1, {c} AS t2, "
        f"{(1 << a) | (1 << b) | (1 << c)} AS cm"
        for a, b, c in combinations(range(len(_ITEM_TYPES)), 3))
    return (
        f"WITH d AS (SELECT DISTINCT user_id, {code} AS c FROM events "
        "WHERE " + code + " IS NOT NULL), "
        "mk AS (SELECT user_id, sum(1 << c) AS m FROM d GROUP BY 1), "
        f"combos AS ({combos}) "
        "SELECT CAST(t0 AS BIGINT) AS t0, CAST(t1 AS BIGINT) AS t1, "
        "CAST(t2 AS BIGINT) AS t2, "
        "CAST(count(mk.user_id) AS BIGINT) AS support "
        "FROM combos LEFT JOIN mk ON (mk.m & combos.cm) = combos.cm "
        "GROUP BY 1, 2, 3"
    )


def q_fano_factor(sf_dir: str):
    """FANO FACTOR burstiness screen per event type: over the hourly
    count series, the exact integer pair (n·Σc² − (Σc)², n·Σc) whose
    ratio is the variance-to-mean index — Poisson ⇒ ≈ n·Σc, bursty ⇒
    larger.  Per-(type, hour) counts ride one combiner-tree pass;
    the moment fold is over the bounded hourly grid.  No floats."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def bucket(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy(zero_copy_only=False)
        h = ts.astype("datetime64[us]").astype(np.int64) // 3_600_000_000
        t = pa.table({"et": b["event_type"], "h": pa.array(h, pa.int64()),
                      "x": pa.array(np.ones(len(h), np.int64))})
        return (t.group_by(["et", "h"]).aggregate([("x", "sum")])
                .rename_columns(["et", "h", "x"]))

    tab = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_type", "ts"]).map_batches(
            bucket, batch_format="pyarrow"),
        ["et", "h"], [("x", "sum")]).to_pandas()
    g = tab.groupby("et")["x"]
    n = g.size().astype(np.int64)
    s1 = g.sum().astype(np.int64)
    s2 = g.apply(lambda v: int((v.to_numpy() ** 2).sum())).astype(np.int64)
    return pd.DataFrame({"event_type": n.index.to_numpy(),
                         "fano_num": (n * s2 - s1 * s1).to_numpy(),
                         "fano_den": (n * s1).to_numpy()})


def q_fano_factor_sql() -> str:
    return (
        "WITH c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h, "
        "count(*) AS x FROM events GROUP BY 1, 2) "
        "SELECT event_type, "
        "CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) "
        "AS fano_num, "
        "CAST(count(*) * sum(x) AS BIGINT) AS fano_den "
        "FROM c GROUP BY 1"
    )
