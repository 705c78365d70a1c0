"""Arrow-native tree aggregation for bounded-cardinality keys.

Ray Data's sort-based ``Aggregate`` pays per-group Python overhead —
ruinous when there are 10^5-10^7 groups of a few rows each (the tile
histogram: one group per touched tile).  When the number of DISTINCT
keys is bounded (4^z tiles at zoom z; cells at a fixed resolution),
the exact aggregate can instead be computed as a combiner tree of
``pyarrow.Table.group_by`` calls — fully vectorized C++, no per-group
Python:

    per-block partials → repartition(mid) → per-block combine
                      → repartition(1)  → final combine

Every level is a ``map_batches``; only the LAST level must see all
rows for a key, and its input is ≤ |distinct keys| rows regardless of
input scale, so a single final block is safe exactly when the key
space is bounded.  For unbounded keys (e.g. content hashes at 10^12
rows) fall back to ``Dataset.groupby`` — that is the hash-partitioned
path.
"""

from __future__ import annotations

import pyarrow as pa


_AGGS = {"sum": "sum", "min": "min", "max": "max", "count": "count"}


def _combine(keys: list[str], aggs: list[tuple[str, str]]):
    """Returns a map_batches fn combining (col, op) per key group."""
    out_names = keys + [c for c, _ in aggs]

    def combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        g = batch.group_by(keys).aggregate([(c, _AGGS[op]) for c, op in aggs])
        return g.rename_columns(out_names)

    return combine


def tree_aggregate(ds, keys: list[str], aggs: list[tuple[str, str]],
                   mid_blocks: int = 8):
    """Exact grouped aggregate via an Arrow combiner tree.

    ``aggs`` = [(column, op)] with op ∈ sum/min/max; the input is
    assumed to already be *partials* (e.g. per-block counts) so ops
    must be re-combinable (count partials re-combine with sum).
    Returns a Dataset with columns keys + agg columns."""
    combine = _combine(keys, aggs)
    ds = ds.map_batches(combine, batch_format="pyarrow")
    ds = ds.repartition(mid_blocks).map_batches(combine, batch_format="pyarrow")
    return ds.repartition(1).map_batches(combine, batch_format="pyarrow")


def tree_aggregate_to_table(ds, keys: list[str], aggs: list[tuple[str, str]],
                            chunk: int = 64) -> pa.Table:
    """Exact grouped aggregate: distributed per-block combine, then a
    STREAMING driver-side reduction (re-combining every ``chunk``
    blocks so driver memory stays ≤ |distinct keys| + chunk blocks).

    Preferred over :func:`tree_aggregate` when the plan should stay
    free of all-to-all operators — Ray's streaming executor reserves a
    resource share for Repartition/Aggregate ops, throttling the
    (expensive) upstream map stages; the combined partials here are
    tiny, so the final reduce is driver-cheap.  Requires bounded key
    cardinality (tiles: ≤ 4**z)."""
    import ray

    combine = _combine(keys, aggs)
    combined = ds.map_batches(combine, batch_format="pyarrow")
    acc: pa.Table | None = None
    pending: list[pa.Table] = []
    for ref in combined.to_arrow_refs():
        t = ray.get(ref)
        if not isinstance(t, pa.Table):
            # Ray passes zero-column EMPTY blocks through map UDFs
            # unconverted — a pandas-format empty block can surface
            # here as a DataFrame; it carries no rows by construction
            if len(t) == 0:
                continue
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_rows:
            pending.append(t)
        if len(pending) >= chunk:
            allt = pending if acc is None else [acc] + pending
            acc = combine(pa.concat_tables(allt, promote_options="default"))
            pending = []
    allt = ([acc] if acc is not None else []) + pending
    if not allt:
        return pa.table({k: [] for k in keys + [c for c, _ in aggs]})
    return combine(pa.concat_tables(allt, promote_options="default"))


def grouped_count_distinct(ds, group: str, key: str,
                           out_col: str = "n_distinct",
                           mid_blocks: int = 8, n_rows: int | None = None):
    """Exact COUNT(DISTINCT key) per group.

    Scale shape: a per-batch Arrow ``group_by`` dedups (group, key)
    pairs locally (the combiner — cuts shuffle volume by the in-batch
    duplication factor), ONE hash shuffle over the pair key
    (``Dataset.groupby([group, key])``) makes pairs globally unique —
    this is the unbounded-cardinality path, pairs never concentrate on
    the driver — and the final count-per-group runs on the combiner
    tree (group cardinality is bounded even when key cardinality
    isn't).  10^12 (user, type) pairs hash-partition fine; only
    |groups| rows reach the final block."""

    def local_distinct(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select([group, key])
        return batch.select([group, key]).group_by([group, key]).aggregate([])

    from .scan import hash_bucket_scan

    pairs = ds.map_batches(local_distinct, batch_format="pyarrow")
    # ONE coarse hash exchange on the pair key (a pair lands wholly in
    # one bucket; within-bucket Arrow group_by finishes the dedup) —
    # replaces the sort-based Dataset.groupby all-to-all
    uniq = hash_bucket_scan(
        pairs, [group, key],
        lambda t: t.group_by([group, key]).aggregate([]),
        n_rows=n_rows)
    return grouped_count(uniq, [group], out_col=out_col,
                         mid_blocks=mid_blocks)


def grouped_count(ds, keys: list[str], out_col: str = "n",
                  mid_blocks: int = 8):
    """count(*) per key group via the tree (bounded key spaces)."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate([(keys[0], "count")])
        return g.rename_columns(keys + [out_col])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return tree_aggregate(partials, keys, [(out_col, "sum")],
                          mid_blocks=mid_blocks)
