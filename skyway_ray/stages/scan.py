"""Per-key ordered scans (running aggregates, lag/lead deltas) — the
``SUM(...) OVER (PARTITION BY key ORDER BY ...)`` family.

Scale shape (same as the session/rolling window queries): rows group by
a COARSE hash bucket of the key, not per key — Ray pays per-group
overhead once per bucket, and each bucket call handles every key in it
with one vectorized pandas/numpy pass over the (key, order)-sorted
frame.  Buckets bound worker memory at ``~n / n_buckets`` rows; keys
never straddle buckets, so no cross-group carry is needed.

Bucket count AUTO-SCALES with the input: by default
``n_buckets = max(32, ceil(n_rows / rows_per_bucket))`` so a bucket
always targets a fixed row budget (``ROWS_PER_BUCKET``) regardless of
data scale — the 100 TB posture without a per-call tuning knob.
Callers that already know the row count pass ``n_rows`` (a parquet
metadata read — free) so no counting pass runs; otherwise
``ds.count()`` supplies it (metadata-only for pure reads, one
execution otherwise).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

# Target rows per bucket group: one bucket must fit a worker's heap as
# a single pandas frame with room for fn's temporaries.  2M rows of a
# handful of int64/float64 columns is ~100-200 MB peak — comfortable on
# a 4 GB-heap worker, and small enough that 32 CPUs stay busy once the
# input exceeds ~64M rows.
ROWS_PER_BUCKET = 2_000_000


def auto_n_buckets(n_rows: int, rows_per_bucket: int = ROWS_PER_BUCKET,
                   floor: int = 32) -> int:
    """Bucket count targeting ``rows_per_bucket`` rows per group, never
    below ``floor`` (keeps small inputs parallel)."""
    return max(floor, math.ceil(max(0, n_rows) / max(1, rows_per_bucket)))


def int_bucket_ids(arrays: list, n_buckets: int) -> np.ndarray:
    """The mixed multiply-xor bucket hash of int64 key columns — THE
    bucket function of :func:`hash_bucket_scan`, factored out so
    stages that pre-partition static data (graph edge shards) land on
    exactly the buckets a later state exchange will hash to."""
    h = np.zeros(len(arrays[0]), np.uint64)
    for v in arrays:
        h = (h ^ np.asarray(v).astype(np.int64).view(np.uint64)) \
            * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(29)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def keyed_scan(ds, key: str, order: list[str], fn,
               n_buckets: int | None = None, hash_key=None,
               n_rows: int | None = None,
               rows_per_bucket: int = ROWS_PER_BUCKET):
    """Run ``fn(sorted_group: pd.DataFrame) -> pd.DataFrame`` over each
    coarse key-bucket, where the group arrives sorted by
    ``[key] + order`` (mergesort — stable, deterministic).  ``fn`` must
    be vectorized over all keys in the bucket (boundary masks /
    ``groupby(key, sort=False)`` transforms, never a per-key loop).

    ``hash_key``: optional callable mapping the key column's numpy
    array to int64 bucket material (defaults to the values themselves,
    which must then be integers)."""
    if n_buckets is None:
        n_buckets = auto_n_buckets(
            n_rows if n_rows is not None else ds.count(), rows_per_bucket)

    def add_bucket(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False)
        mat = hash_key(k) if hash_key is not None else k.astype(np.int64)
        return b.append_column(
            "_bucket", pa.array(mat % n_buckets, pa.int64()))

    def run(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values([key] + order, kind="mergesort")
        d = d.drop(columns=["_bucket"])
        return fn(d)

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("_bucket").map_groups(run, batch_format="pandas"))


def hash_bucket_scan(ds, keys: list[str], fn, n_buckets: int | None = None,
                     n_rows: int | None = None,
                     rows_per_bucket: int | None = None):
    """Arrow-format coarse HASH-bucket co-partition: every distinct
    ``keys`` tuple lands wholly in ONE bucket group (mixed multiply-
    xor hash of the int64 key columns), and ``fn(tbl: pa.Table) ->
    pa.Table`` receives each bucket's full table (unsorted — fn sorts
    if it needs adjacency).

    This is the shuffle-halving replacement for the global-sort +
    boundary-stitch shape used by the LSH/setsim candidate scans: with
    hash partitioning a key run can never straddle group boundaries,
    so the stitch/rescue machinery (and its extra materializations)
    disappears.  Bucket count auto-scales like :func:`keyed_scan`
    (``n_rows`` hint avoids a counting pass; pass the count of a
    materialized upstream).  ``rows_per_bucket=None`` reads the module
    ``ROWS_PER_BUCKET`` at call time (testable budget override)."""
    if rows_per_bucket is None:
        rows_per_bucket = ROWS_PER_BUCKET
    if n_buckets is None:
        n_buckets = auto_n_buckets(
            n_rows if n_rows is not None else ds.count(), rows_per_bucket)

    def add_bucket(b: pa.Table) -> pa.Table:
        import zlib

        mats = []
        for k in keys:
            v = b[k].to_numpy(zero_copy_only=False)
            if v.dtype.kind in "iub":
                mat = v.astype(np.int64)
            else:  # strings: crc32 per batch-distinct value (vectorized
                # dispatch via unique/inverse — vocabulary-bounded work)
                uniq, inv = np.unique(v.astype("U"), return_inverse=True)
                codes = np.fromiter(
                    (zlib.crc32(u.encode()) for u in uniq),
                    dtype=np.uint64, count=len(uniq))
                mat = codes[inv].view(np.int64)
            mats.append(mat)
        return b.append_column(
            "_hb", pa.array(int_bucket_ids(mats, n_buckets), pa.int64()))

    def run(t: pa.Table) -> pa.Table:
        return fn(t.drop_columns(["_hb"]))

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("_hb").map_groups(run, batch_format="pyarrow"))


def running_sum(ds, key: str, order: list[str], val: str,
                out_col: str = "running_sum", n_buckets: int | None = None,
                keep: list[str] | None = None, n_rows: int | None = None,
                rows_per_bucket: int = ROWS_PER_BUCKET):
    """Per-key running (prefix) sum of an INTEGER column in
    deterministic ``order``.  Integer accumulation keeps the result
    independent of summation grouping, so a SQL windowed-SUM oracle
    matches bit-for-bit (float running sums would need a pinned
    operation order — quantize first; see queries.q_prefix_sums)."""
    cols = keep if keep is not None else [key] + order

    def scan(d: pd.DataFrame) -> pd.DataFrame:
        out = d[cols].copy()
        out[out_col] = d.groupby(key, sort=False)[val].cumsum()
        return out

    return keyed_scan(ds, key, order, scan, n_buckets=n_buckets,
                      n_rows=n_rows, rows_per_bucket=rows_per_bucket)


def keyed_lag(ds, key: str, order: list[str], val: str,
              out_col: str = "lag_val", fill=-1, n_buckets: int | None = None,
              keep: list[str] | None = None, n_rows: int | None = None,
              rows_per_bucket: int = ROWS_PER_BUCKET):
    """Per-key LAG(val, 1): previous row's value in deterministic
    ``order``, ``fill`` for each key's first row (avoids nullable-int
    schema drift between engine and oracle)."""
    cols = keep if keep is not None else [key] + order

    def scan(d: pd.DataFrame) -> pd.DataFrame:
        v = d[val].to_numpy()
        k = d[key].to_numpy()
        prev = np.empty_like(v)
        prev[1:] = v[:-1]
        first = np.ones(len(d), dtype=bool)
        first[1:] = k[1:] != k[:-1]
        prev[first] = fill
        out = d[cols].copy()
        out[out_col] = prev
        return out

    return keyed_scan(ds, key, order, scan, n_buckets=n_buckets,
                      n_rows=n_rows, rows_per_bucket=rows_per_bucket)
