"""Shared helpers, constants, and session caches for the query domain modules.

Every non-query top-level name of the former single-file module lives here,
in its original definition order; domain modules import what they reference
explicitly.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo.cells import cell_id, cell_sql
from ..geo.tiles import tile_sql, tile_xy



# ---------------------------------------------------------------------------
# shared derivations


def derive_latlon(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    key = np.asarray(key, dtype=np.int64)
    u_hi = (key * 2654435761 + 12345) % 4294967296
    u_lo = (key * 1103515245 + 54321) % 4294967296
    lat = -60.0 + 120.0 * (u_hi.astype(np.float64) / 4294967296.0)
    lon = -180.0 + 360.0 * (u_lo.astype(np.float64) / 4294967296.0)
    return lat, lon


def latlon_sql(key_expr: str) -> tuple[str, str]:
    u_hi = f"(({key_expr} * 2654435761 + 12345) % 4294967296)"
    u_lo = f"(({key_expr} * 1103515245 + 54321) % 4294967296)"
    lat = f"(-60.0 + 120.0 * ({u_hi} / 4294967296.0))"
    lon = f"(-180.0 + 360.0 * ({u_lo} / 4294967296.0))"
    return lat, lon


def _geotag_batch(batch: pa.Table, key: str) -> pa.Table:
    lat, lon = derive_latlon(batch[key].to_numpy(zero_copy_only=False))
    return (batch.append_column("lat", pa.array(lat, pa.float64()))
                 .append_column("lon", pa.array(lon, pa.float64())))


def _nrows(sf_dir: str, table: str) -> int:
    """Row count from parquet footer metadata — no data read, no Ray
    tasks.  Feeds keyed_scan's auto bucket sizing (stages/scan.py)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(
        os.path.join(sf_dir, f"{table}.parquet")).metadata.num_rows


def _read(sf_dir: str, table: str, columns=None):
    import ray
    import ray.data

    # single-file tables: Ray's default (~200 tiny blocks) costs more in
    # per-block overhead than it buys in parallelism at these scales
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                                 columns=columns,
                                 override_num_blocks=max(16, cpus // 2))


# boxes for the SQL-expressible rectangle PIP join (from nation keys)
def _box_params(nationkey: np.ndarray):
    k = np.asarray(nationkey, dtype=np.int64)
    clat = -50.0 + 100.0 * (((k * 37) % 100).astype(np.float64) / 100.0)
    clon = -170.0 + 340.0 * (((k * 73) % 100).astype(np.float64) / 100.0)
    hh = 3.0 + (k % 5).astype(np.float64)
    hw = 4.0 + (k % 7).astype(np.float64)
    return clat, clon, hh, hw


_BOX_SQL = (
    "SELECT n_name AS region_id, "
    "(-50.0 + 100.0 * (((n_nationkey * 37) % 100) / 100.0)) AS clat, "
    "(-170.0 + 340.0 * (((n_nationkey * 73) % 100) / 100.0)) AS clon, "
    "(3.0 + (n_nationkey % 5)) AS hh, "
    "(4.0 + (n_nationkey % 7)) AS hw FROM nation"
)


CEL_EVENTS_EXPR = ('value * 2.0 > 150.0 ? event_type == "click" '
                   ': event_type in ["view", "purchase"]')


def _events_of_type(sf_dir: str, etype: str, min_value: float):
    import pyarrow.compute as pc

    def filt(b: pa.Table, t=etype) -> pa.Table:
        return b.filter(pc.and_(pc.equal(b["event_type"], t),
                                pc.greater(b["value"], min_value)))

    return _read(sf_dir, "events",
                 ["user_id", "event_type", "value"]).map_batches(
        filt, batch_format="pyarrow")


_PROFILE_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_returnflag", "l_linestatus"]


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _event_boxes(b: pa.Table) -> pa.Table:
    k = b["event_id"].to_numpy(zero_copy_only=False)
    lat, lon = derive_latlon(k)
    hh = 0.5 + (k % 4).astype(np.float64) * 0.75
    hw = 0.5 + (k % 5).astype(np.float64) * 0.6
    return pa.table({"id": pa.array(k), "xmin": pa.array(lon - hw),
                     "ymin": pa.array(lat - hh), "xmax": pa.array(lon + hw),
                     "ymax": pa.array(lat + hh)})


def _part_boxes(b: pa.Table) -> pa.Table:
    k = b["p_partkey"].to_numpy(zero_copy_only=False)
    lat, lon = derive_latlon(k)
    hh = 1.0 + (k % 3).astype(np.float64) * 0.8
    hw = 1.0 + (k % 4).astype(np.float64) * 0.7
    return pa.table({"id": pa.array(k), "xmin": pa.array(lon - hw),
                     "ymin": pa.array(lat - hh), "xmax": pa.array(lon + hw),
                     "ymax": pa.array(lat + hh)})


def _skyline_mask(price: np.ndarray, size: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the 2-D skyline (price minimized, size
    maximized) for rows ALREADY sorted by (price asc, size desc).
    Strict dominance: a dominates b iff a.price <= b.price and
    a.size >= b.size with at least one strict; equal (price, size)
    duplicates never dominate each other, so all of them survive.
    One vectorized pass: a row survives iff it carries its price
    group's max size AND that max strictly exceeds every smaller
    price's max."""
    n = len(price)
    if n == 0:
        return np.zeros(0, dtype=bool)
    new_grp = np.ones(n, dtype=bool)
    new_grp[1:] = price[1:] != price[:-1]
    grp = np.cumsum(new_grp) - 1
    per_max = size[new_grp]  # sorted size-desc within a price group
    prev_max = np.concatenate(
        ([np.iinfo(np.int64).min],
         np.maximum.accumulate(per_max)[:-1]))[grp]
    return (size == per_max[grp]) & (size > prev_max)


def _iv_events(sf_dir: str, parity: int):
    """Derived interval stream: events with ``event_id % 2 == parity``
    become [ts, ts + dur] where dur is a deterministic 0–1h hash of
    the id (multiplicative-hash derivation, written identically in the
    SQL oracle)."""

    def mk(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        t = b.filter(pa.array(eid % 2 == parity))
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        s = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        dur = ((eid * 2654435761 + 12345) % 4294967296) % 3600 * 1_000_000
        return pa.table({"event_id": t["event_id"], "user_id": t["user_id"],
                         "s_us": pa.array(s, pa.int64()),
                         "e_us": pa.array(s + dur, pa.int64())})

    return _read(sf_dir, "events", ["event_id", "user_id", "ts"]
                 ).map_batches(mk, batch_format="pyarrow")


_IV_SQL = (
    "SELECT event_id, user_id, epoch_us(ts) AS s_us, epoch_us(ts) + "
    "(((event_id * 2654435761 + 12345) % 4294967296) % 3600) * 1000000 "
    "AS e_us FROM events WHERE event_id % 2 = {parity}")


_SCAN_PHRASES = ("fast table", "key agg", "sort merge", "window spark",
                 "data column")


_DWELL_EPS_MICRO = 90_000_000  # step < 90 planar degrees (micro-int)
_DWELL_MIN_PTS = 3


def _border_segments(sf_dir: str):
    """25 deterministic 'border' line segments derived from nation
    keys (endpoints via the shared derive_latlon hash, micro-int
    quantized) — the broadcast small side of the crossing join."""
    import pyarrow.parquet as pq

    nk = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                       columns=["n_nationkey"])["n_nationkey"]\
        .to_numpy(zero_copy_only=False).astype(np.int64)
    a_lat, a_lon = derive_latlon(nk * 2 + 1001)
    b_lat, b_lon = derive_latlon(nk * 2 + 1002)
    micro = lambda v: np.floor(v * 1e6 + 0.5).astype(np.int64)
    return (nk, micro(a_lon), micro(a_lat), micro(b_lon), micro(b_lat))


_DP_EPS_MICRO = 10_000_000  # 10° tolerance on the synthetic tracks


_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


_GROUP_SAMPLE_K = 50


_ADAPT_ZMAX = 8
_ADAPT_CAP = 64


_DBSCAN_EPS = 1.0
_DBSCAN_MINPTS = 3  # |N_eps(p)| ≥ 3 counting the point itself


def _intra_run_pairs(run_id: np.ndarray, pair_budget: int = 2_000_000):
    """All index pairs (i, j), i < j, within equal-value runs of the
    SORTED ``run_id`` array — fully vectorized (np.repeat/arange offset
    arithmetic, the OD-matrix style), yielded in chunks of at most
    ``pair_budget`` pairs so a hot run never materializes quadratically
    in one allocation.  Callers' per-run quadratic cost is the
    documented partitioning assumption (per-key cardinality bounded —
    trajectory/user-sized, not table-sized)."""
    n = len(run_id)
    if n == 0:
        return
    starts = np.r_[0, np.flatnonzero(run_id[1:] != run_id[:-1]) + 1]
    lengths = np.diff(np.r_[starts, n])
    seg_start_of_row = np.repeat(starts, lengths)
    r = np.arange(n) - seg_start_of_row  # index within run = pairs
    # contributed by the row as the 'j' (right) element
    cum = np.r_[0, np.cumsum(r)]
    total = int(cum[-1])
    lo = 0
    while lo < total:
        hi = min(lo + pair_budget, total)
        # rows whose pair slots intersect [lo, hi)
        j0 = int(np.searchsorted(cum, lo, side="right") - 1)
        j1 = int(np.searchsorted(cum, hi, side="left"))
        jr = np.arange(j0, j1)
        cnt = r[j0:j1].copy()
        if len(cnt):
            cnt[0] -= lo - cum[j0]
            cnt[-1] -= cum[j1] - hi
        jg = np.repeat(jr, cnt)
        first_slot = np.maximum(cum[j0:j1], lo)
        a_local = (np.arange(hi - lo)
                   - np.repeat(first_slot - lo, cnt)
                   + np.repeat(first_slot - cum[j0:j1], cnt))
        ig = seg_start_of_row[jg] + a_local
        yield ig, jg
        lo = hi


_RIPLEY_EPS = 1.0


_CHECKSUM_K = 300  # first K fixture images; covers all 15 (side,fmt)


_THUMB_SIDE = 8


# shared SQL fragments replaying fixtures.py::_gen_pixels in HUGEINT
# (numpy's int64-wraparound noise term, then the fake-lossy p//4*4+2
# quantization for non-png formats) — see q_image_checksum_sql
def _raw_px_sql(c: str) -> str:
    return ("((x*3 + y*5 + " + c + "*11 + (i*37) % 256 + "
            "CAST((((CAST(i AS HUGEINT)*2654435761 + (y*side+x)*97 "
            "+ " + c + "*131) * 1103515245) % 18446744073709551616)"
            " // 65536 % 32 AS BIGINT)) % 256)")


def _chan_px_sql(c: str) -> str:
    return (f"(CASE WHEN fmt = 'png' THEN {_raw_px_sql(c)} "
            f"ELSE {_raw_px_sql(c)} // 4 * 4 + 2 END)")


def _imgs_cte_sql(k: int) -> str:
    return (
        "imgs AS (SELECT CAST(i AS BIGINT) AS i, "
        "CASE i % 5 WHEN 0 THEN 16 WHEN 1 THEN 24 WHEN 2 THEN 32 "
        "WHEN 3 THEN 48 ELSE 64 END AS side, "
        "CASE i % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' "
        "ELSE 'webp' END AS fmt "
        f"FROM range({k}) t(i))"
    )


# decoded-luma table (i, side, x, y, l) for the first K fixture images
def _luma_table_sql(k: int) -> str:
    return (
        _imgs_cte_sql(k) + ", "
        "lum AS (SELECT i, side, x, y, "
        f"(77 * {_chan_px_sql('0')} + 150 * {_chan_px_sql('1')} "
        f"+ 29 * {_chan_px_sql('2')}) "
        "// 256 AS l "
        "FROM imgs "
        "JOIN range(64) tx(x) ON tx.x < imgs.side "
        "JOIN range(64) ty(y) ON ty.y < imgs.side)"
    )


# decoded-RGB table (i, side, x, y, r, g, b) for the first K images
def _rgb_table_sql(k: int) -> str:
    return (
        _imgs_cte_sql(k) + ", "
        f"rgb AS (SELECT i, side, x, y, {_chan_px_sql('0')} AS r, "
        f"{_chan_px_sql('1')} AS g, {_chan_px_sql('2')} AS b "
        "FROM imgs "
        "JOIN range(64) tx(x) ON tx.x < imgs.side "
        "JOIN range(64) ty(y) ON ty.y < imgs.side)"
    )


_PATCH_P = 16


_COLOC_EPS = 1.0


_BUFFER_D = 0.5


_SKETCH_QS = (0.25, 0.5, 0.9, 0.99)


_BM25_TERMS = ("spark", "window", "hash", "vector")
_BM25_K = 20


def _seg_params(eid: np.ndarray):
    """Short directed segment per event id: start = the derived point,
    delta = ±3° per axis from two more multiplicative hashes.  Shared
    by the intersection join's cover pass and its verify map (the
    verify re-derives endpoints from ids, so coordinates never ride
    the shuffle).

    Odd ids (the B side) derive their start from ``eid * 1000003``:
    both derive_latlon multipliers are LINEAR in the key, so A/B pairs
    of the SAME derivation have (Δlat, Δlon) determined jointly by Δid
    — at fixture id ranges NO pair is close on both axes at once (a
    measured zero at sf0.001/sf0.01) — and the key remap breaks that
    lattice.  int64 wraparound in ``key * mult`` is exact mod 2^32
    (2^32 | 2^64), mirrored by HUGEINT in the oracle."""
    eid = np.asarray(eid, dtype=np.int64)
    key = np.where(eid % 2 == 1, eid * 1000003, eid)
    lat, lon = derive_latlon(key)
    dlat = -3.0 + 6.0 * (((eid * 7919) % 1000).astype(np.float64) / 1000.0)
    dlon = -3.0 + 6.0 * (((eid * 104729) % 1000).astype(np.float64) / 1000.0)
    return lat, lon, lat + dlat, lon + dlon


def _grid_cell_counts(sf_dir: str) -> pd.DataFrame:
    """Per-5°-cell event counts (cx, cy, x) on the bounded combiner
    tree (≤ 72×24 cells) — the ONE copy of the counting pass shared
    by q_morans_i / q_getis_ord / q_density_gradient (previously
    triplicated; a grid tweak could silently desynchronize the
    family)."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        cx = np.floor((lon + 180.0) / 5.0).astype(np.int64)
        cy = np.floor((lat + 60.0) / 5.0).astype(np.int64)
        t = pa.table({"cx": pa.array(cx), "cy": pa.array(cy),
                      "x": pa.array(np.ones(len(cx), np.int64))})
        return (t.group_by(["cx", "cy"]).aggregate([("x", "sum")])
                .rename_columns(["cx", "cy", "x"]))

    return tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_id"]).map_batches(
            partial, batch_format="pyarrow"),
        ["cx", "cy"], [("x", "sum")]).to_pandas()


# IDW inner cutoff: d² ≥ 10^6 micro² (0.001°).  Bounds the pinned
# 1/d² and v/d² terms within int64 for any point placement — applied
# identically in the engine and the oracle SQL.
_IDW_MIN_D2 = 1_000_000


def _hourly_counts_table(sf_dir: str) -> pd.DataFrame:
    """Per-hour event counts (bounded key space: fixture time range)
    via one combiner-tree pass — shared by the time-series queries."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def bucket(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy(zero_copy_only=False)
        h = ts.astype("datetime64[us]").astype(np.int64) \
            // 3_600_000_000
        t = pa.table({"h": pa.array(h, pa.int64()),
                      "x": pa.array(np.ones(len(h), np.int64))})
        return (t.group_by(["h"]).aggregate([("x", "sum")])
                .rename_columns(["h", "x"]))

    return tree_aggregate_to_table(
        _read(sf_dir, "events", ["ts"]).map_batches(
            bucket, batch_format="pyarrow"),
        ["h"], [("x", "sum")]).to_pandas().sort_values("h")


_QT_VAR_T = 220  # split a block when its luma variance exceeds this


def _batch_token_runs(texts: pd.Series):
    """(flat token array, per-doc offsets) for one batch — the shared
    tokenize step of the n-gram counting kernels."""
    toks = texts.str.lower().str.findall(r"[a-z0-9]+")
    arrs = [np.asarray(t, dtype=object) for t in toks]
    lens = np.array([len(a) for a in arrs], np.int64)
    flat = np.concatenate([a for a in arrs if len(a)]
                          or [np.array([], object)])
    offs = np.concatenate([[0], np.cumsum(lens)])
    return flat, offs


def _bigram_pair_counts(flat: np.ndarray, offs: np.ndarray):
    """Adjacent-pair counts without an object-keyed groupby: factorize
    once, count int pair codes (code_x·V + code_y) with np.unique on
    int64 — ~10× the throughput of a pandas object-pair groupby on
    repetitive corpora.  Pairs spanning doc boundaries drop."""
    if len(flat) < 2:
        e = np.array([], object)
        return e, e, np.array([], np.int64)
    codes, uniq = pd.factorize(flat)
    v = len(uniq)
    valid = np.ones(len(flat) - 1, dtype=bool)
    starts = offs[1:-1]
    starts = starts[(starts > 0) & (starts < len(flat))]
    valid[starts - 1] = False  # pair (s-1, s) straddles two docs
    key = codes[:-1].astype(np.int64) * v + codes[1:]
    uk, cnt = np.unique(key[valid], return_counts=True)
    return (uniq[uk // v].astype(object), uniq[uk % v].astype(object),
            cnt.astype(np.int64))


def _unigram_count_df(texts: pd.Series) -> pd.DataFrame:
    """Per-batch token counts via hash factorize + bincount (O(n)
    object hashing; np.unique's comparison sort is ~2× slower on
    repetitive corpora)."""
    flat, _ = _batch_token_runs(texts)
    if not len(flat):
        return pd.DataFrame({"tok": np.array([], object),
                             "n": np.array([], np.int64)})
    codes, uniq = pd.factorize(flat)
    return pd.DataFrame({"tok": uniq.astype(str),
                         "n": np.bincount(codes).astype(np.int64)})


def _copart_lookup(rows, lut, key_col: str, out_col: str, n_rows: int):
    """Attach ``lut`` (columns ``_lk`` string / ``_lv`` int64) values
    to ``rows`` on ``rows[key_col]`` (string) as ``out_col`` — one
    string-keyed hash-bucket co-partition + a compiled Acero join per
    bucket (the open-vocabulary join shape; neither side is assumed
    to fit a worker).  Inner join: rows without a lut hit drop."""
    import pyarrow.compute as pc

    from ..stages.scan import hash_bucket_scan

    def _pa_type(t):
        # rows built by a pandas-format map_batches report numpy dtypes
        # (object columns as plain Python types); normalize to Arrow.
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(t)
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    rs = rows.schema()
    row_cols = [(n, _pa_type(t)) for n, t in zip(rs.names, rs.types)]

    def pad_rows(t: pa.Table) -> pa.Table:
        t = t.append_column("_lk", pa.nulls(len(t), pa.string()))
        t = t.append_column("_lv", pa.nulls(len(t), pa.int64()))
        t = t.append_column("_jk", t[key_col])
        return t.select(sorted(t.column_names))

    def pad_lut(t: pa.Table) -> pa.Table:
        for name, typ in row_cols:
            t = t.append_column(name, pa.nulls(len(t), typ))
        t = t.append_column("_jk", t["_lk"])
        return t.select(sorted(t.column_names))

    def join(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_jk"]).combine_chunks()
        is_lut = pc.invert(pc.is_null(t["_lk"]))
        lu = (t.filter(is_lut).select(["_lk", "_lv"])
              .rename_columns(["_k", out_col]))
        r = t.filter(pc.invert(is_lut)).drop_columns(["_lk", "_lv"])
        j = r.join(lu, keys=[key_col], right_keys=["_k"],
                   join_type="inner")
        return j.set_column(j.column_names.index(out_col), out_col,
                            j[out_col].cast(pa.int64()))

    return hash_bucket_scan(
        rows.map_batches(pad_rows, batch_format="pyarrow").union(
            lut.map_batches(pad_lut, batch_format="pyarrow")),
        ["_jk"], join, n_rows=n_rows)


_LM_COUNTS_CACHE: dict[str, object] = {}


def _corpus_unigram_counts(sf_dir: str):
    """Materialized (tok, n) corpus unigram-count Dataset — ONE
    tokenize pass + one token hash exchange, cached per sf_dir for
    the session.  q_unigram_logprob, q_pmi_bigrams and q_bigram_ppl
    all need exactly this pass; the first caller builds it and the
    rest reuse (fixture dirs are immutable; one sf_dir retained so
    the object-store footprint stays one vocabulary table)."""
    key = ("uni", sf_dir)
    if key in _LM_COUNTS_CACHE:
        return _LM_COUNTS_CACHE[key]
    from ..stages.scan import hash_bucket_scan

    uni = hash_bucket_scan(
        _read(sf_dir, "documents", ["text"]).map_batches(
            lambda b: _unigram_count_df(b["text"]),
            batch_format="pandas"),
        ["tok"],
        lambda t: t.group_by(["tok"]).aggregate([("n", "sum")])
        .rename_columns(["tok", "n"]),
        n_rows=_nrows(sf_dir, "documents")).materialize()
    for k in [k for k in _LM_COUNTS_CACHE if k[0] == "uni"]:
        del _LM_COUNTS_CACHE[k]
    _LM_COUNTS_CACHE[key] = uni
    return uni


def _corpus_bigram_counts(sf_dir: str):
    """Materialized (x, y, cnt) corpus adjacent-bigram-count Dataset —
    one tokenize + int-coded pair-count pass and one pair hash
    exchange, cached per sf_dir like :func:`_corpus_unigram_counts`
    (shared by q_pmi_bigrams and q_bigram_ppl, which previously each
    ran their own pass)."""
    key = ("bg", sf_dir)
    if key in _LM_COUNTS_CACHE:
        return _LM_COUNTS_CACHE[key]
    from ..stages.scan import hash_bucket_scan

    def bigram_counts(b: pd.DataFrame) -> pd.DataFrame:
        flat, offs = _batch_token_runs(b["text"])
        x, y, cnt = _bigram_pair_counts(flat, offs)
        return pd.DataFrame({"x": x.astype(str), "y": y.astype(str),
                             "cnt": cnt})

    bg = hash_bucket_scan(
        _read(sf_dir, "documents", ["text"]).map_batches(
            bigram_counts, batch_format="pandas"),
        ["x", "y"],
        lambda t: t.group_by(["x", "y"]).aggregate([("cnt", "sum")])
        .rename_columns(["x", "y", "cnt"]),
        n_rows=_nrows(sf_dir, "documents")).materialize()
    for k in [k for k in _LM_COUNTS_CACHE if k[0] == "bg"]:
        del _LM_COUNTS_CACHE[k]
    _LM_COUNTS_CACHE[key] = bg
    return bg


_KCORE_K = 8
_KCORE_ROUNDS = 6  # oracle replay depth; peel is idempotent past fixpoint


def _kcore_node_sql(col: str, v: int) -> str:
    # quadratic-CDF skew: node = (h²>>32)·V >> 32 with h the Knuth
    # multiplicative hash — low ids become hubs, giving nested cores
    return (f"CAST((CAST({col} AS HUGEINT) * 2654435761 % 4294967296) "
            f"* (CAST({col} AS HUGEINT) * 2654435761 % 4294967296) "
            f"// 4294967296 * {v} // 4294967296 AS BIGINT)")


_SSSP_ROUNDS = 14  # oracle replay depth; relaxation idempotent after
