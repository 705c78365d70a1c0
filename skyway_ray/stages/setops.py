"""Distributed set operations on key columns: INTERSECT / EXCEPT
(DISTINCT semantics) between two Datasets.

One hash shuffle total: each side's keys get a presence flag after a
per-batch local dedup (the combiner — shuffle volume is per-batch
distinct keys, not rows), the flagged union hash-partitions by key
(`groupby(key).max(flags)`), and a vectorized filter keeps keys
present in both (intersect) or only the left (except).  Unbounded key
cardinality is fine — keys never concentrate on the driver or in one
group; each group is one key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _flagged(ds, on: str, is_a: bool):
    """(key, _in_a, _in_b) presence rows with per-batch key dedup;
    fixed column order on both sides so the union schemas align."""

    def f(batch: pa.Table) -> pa.Table:
        u = pc.unique(batch[on].combine_chunks())
        n = len(u)
        one = pa.array(np.ones(n, np.int64), pa.int64())
        zero = pa.array(np.zeros(n, np.int64), pa.int64())
        return pa.table({on: u,
                         "_in_a": one if is_a else zero,
                         "_in_b": zero if is_a else one})

    return ds.map_batches(f, batch_format="pyarrow")


def keyed_set_op(ds_a, ds_b, on: str, op: str = "intersect"):
    """DISTINCT keys of ``ds_a[on]`` {INTERSECT | EXCEPT}
    ``ds_b[on]``.  Returns a Dataset with the single column ``on``."""
    if op not in ("intersect", "except"):
        raise ValueError(f"op must be intersect/except, got {op!r}")
    a = _flagged(ds_a, on, is_a=True)
    b = _flagged(ds_b, on, is_a=False)
    both = a.union(b).groupby(on).max(["_in_a", "_in_b"])

    def filt(batch: pa.Table) -> pa.Table:
        ia = batch["max(_in_a)"]
        ib = batch["max(_in_b)"]
        keep = pc.and_(pc.equal(ia, 1),
                       pc.equal(ib, 1 if op == "intersect" else 0))
        return batch.filter(keep).select([on])

    return both.map_batches(filt, batch_format="pyarrow")


def pivot_counts(ds, row_key: str, col_key: str, col_values: list[str],
                 prefix: str = "n_", mid_blocks: int = 8):
    """Wide pivot: COUNT(*) per (row_key, col_key) spread into one
    column per ``col_values`` entry (fixed, caller-declared column set
    — the schema can't depend on the data in a distributed plan).

    Runs on the bounded-key combiner tree: each batch emits one
    partial pivot row per row_key (vectorized ``pandas.crosstab``-less
    bincount), partials sum via ``stages.agg_tree.tree_aggregate`` —
    no per-group Python, no all-to-all when row_key cardinality is
    bounded (the pivot's wide schema implies it is)."""
    from .agg_tree import tree_aggregate

    cols = [f"{prefix}{v}" for v in col_values]
    val_idx = {v: i for i, v in enumerate(col_values)}

    def partial(batch: pa.Table) -> pa.Table:
        rk = batch[row_key].to_numpy(zero_copy_only=False)
        cv = batch[col_key].to_pylist()
        keys, inv = np.unique(rk, return_inverse=True)
        mat = np.zeros((len(keys), len(col_values)), dtype=np.int64)
        ci = np.array([val_idx.get(v, -1) for v in cv], dtype=np.int64)
        ok = ci >= 0
        np.add.at(mat, (inv[ok], ci[ok]), 1)
        out = {row_key: pa.array(keys)}
        for j, c in enumerate(cols):
            out[c] = pa.array(mat[:, j], pa.int64())
        return pa.table(out)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return tree_aggregate(partials, [row_key], [(c, "sum") for c in cols],
                          mid_blocks=mid_blocks)
