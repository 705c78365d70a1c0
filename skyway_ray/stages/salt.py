"""Skew-proof grouped counting via partial-salting (SURVEY.md §4
"Skew").

Dense urban cells (the fixtures plant ~10% of rows in one region —
FIXTURES.md) make a plain ``groupby(cell)`` ship one giant partition to
one reducer.  Explicit handling, since Ray Data won't fix key skew —
but the detection pre-pass is unnecessary:

1. combine per batch FIRST — after ``pyarrow.Table.group_by`` inside
   ``map_batches``, every key has at most ONE partial row per block,
   so the worst-case reducer input is already #blocks rows, not #rows;
2. attach a deterministic per-batch ``_salt`` to the PARTIALS — the
   hot key's #blocks partial rows now spread across ``num_salts``
   reducers (each sees ≤ ceil(#blocks / num_salts) rows per key);
3. aggregate on ``(key, _salt)``, then a tiny second aggregate merges
   the ≤ num_salts rows per key.

No hot-key counting pass, no sampled estimate, no driver-side key set
— works for unbounded key spaces and is exact for decomposable
aggregates (count/sum/min/max).  :func:`find_hot_keys` /
:func:`add_salt_column` remain for callers that salt RAW rows (e.g.
before a ``map_groups`` whose per-group work scales with row count).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa


def find_hot_keys(ds, key: str, threshold: int, sample_fraction: float = 0.01,
                  seed: int = 42) -> set:
    """Keys whose estimated count exceeds ``threshold`` (sampled:
    scale-up by 1/fraction). Exact when sample_fraction >= 1."""
    from ray.data.aggregate import Count

    if sample_fraction < 1.0:
        ds = ds.random_sample(sample_fraction, seed=seed)
        threshold = max(1, int(threshold * sample_fraction))
    counts = ds.groupby(key).aggregate(Count(alias_name="n")).to_pandas()
    return set(counts.loc[counts["n"] > threshold, key].tolist())


def add_salt_column(batch: pa.Table, key: str, hot_keys: set, num_salts: int,
                    salt_col: str = "_salt") -> pa.Table:
    """Vectorized: ``_salt`` = rotating 0..num_salts-1 for hot keys,
    0 for cold keys."""
    k = batch[key].to_numpy(zero_copy_only=False)
    hot = np.isin(k, np.fromiter(hot_keys, dtype=k.dtype, count=len(hot_keys))) \
        if hot_keys else np.zeros(len(k), dtype=bool)
    salt = (np.arange(len(k)) % num_salts).astype(np.int8)
    return batch.append_column(
        salt_col, pa.array(np.where(hot, salt, 0), pa.int8()))


def salted_count(ds, key: str, num_salts: int = 16,
                 hot_threshold: int | None = None,
                 sample_fraction: float | None = None,
                 n_rows: int | None = None):
    """groupby-count with partial-salting: per-batch combine, then a
    deterministic per-batch salt routes each block's partials across
    ``num_salts`` reducers, and a tiny second aggregate merges the ≤
    num_salts partials per key.  Returns Dataset (key, n) — equal to a
    plain groupby, with no hot-key detection pass.

    ``hot_threshold`` / ``sample_fraction`` are accepted for
    backward compatibility and ignored (hotness no longer needs
    detecting — partials are salted unconditionally)."""
    def salt_and_combine(b: pa.Table) -> pa.Table:
        # combine within the batch before the shuffle: the groupby then
        # moves ≤ |keys in batch| partials instead of rows
        g = b.group_by([key]).aggregate([(key, "count")])
        g = g.rename_columns([key, "n_partial"])
        # deterministic per-batch salt (content-derived, not random —
        # results must not depend on scheduling; any value works, it
        # only routes partials).  Numeric keys hash their raw bytes;
        # object/string keys hash the first key's str() encoding —
        # ndarray.tobytes() on object dtype would serialize PyObject
        # POINTERS, which vary run to run
        if g.num_rows:
            karr = g[key].to_numpy(zero_copy_only=False)
            raw = (str(karr[0]).encode() if karr.dtype == object
                   else karr[:64].tobytes())
            s = zlib.crc32(raw) % num_salts
        else:
            s = 0
        return g.append_column(
            "_salt", pa.array(np.full(g.num_rows, s, np.int8), pa.int8()))

    # both merge phases ride the coarse hash-bucket exchange (inputs
    # are pre-combined partials — ≤ #blocks rows per key — so a bucket
    # group is bounded; the sort-based Aggregate's fixed overhead is
    # gone).  The n_rows hints only size bucket counts.
    from .scan import hash_bucket_scan

    def merge1(t: pa.Table) -> pa.Table:
        g = t.group_by([key, "_salt"]).aggregate([("n_partial", "sum")])
        return g.rename_columns([key, "_salt", "n_salted"])

    phase1 = hash_bucket_scan(
        ds.map_batches(salt_and_combine, batch_format="pyarrow"),
        [key, "_salt"], merge1, n_rows=n_rows)
    phase1 = phase1.map_batches(
        lambda b: b.drop_columns(["_salt"]), batch_format="pyarrow")

    def merge2(t: pa.Table) -> pa.Table:
        g = t.group_by([key]).aggregate([("n_salted", "sum")])
        return g.rename_columns([key, "n"])

    return hash_bucket_scan(phase1, [key], merge2, n_rows=n_rows)
