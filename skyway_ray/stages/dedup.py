"""Exact deduplication (hash-partition + per-group first).

``groupby(key)`` hash-partitions rows so all duplicates co-locate, then
``map_groups`` keeps the winner — the row with the minimum ``order_col``
(deterministic across runs and parallelism levels).  The 2% controlled
duplicate rate in the fixtures (FIXTURES.md §1) exercises this.

Scale note: ``exact_dedup`` shuffles whole rows; for wide rows
(multi-MB image bytes) use ``exact_dedup_projected`` — the shuffle
carries only (key, order_col), and the winner set is broadcast ONCE via
``ray.put`` into an actor pool (a closure-captured Python set would be
re-pickled into every task)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def exact_dedup(ds, key: str = "phash", order_col: str = "image_id"):
    """Keep exactly one row (min ``order_col``) per ``key`` value."""

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return group.nsmallest(1, order_col) if group[order_col].dtype.kind in "iuf" \
            else group.sort_values(order_col, kind="mergesort").head(1)

    return ds.groupby(key).map_groups(first, batch_format="pandas")


# per-worker-process cache for the broadcast winner array (stateless
# tasks — an actor pool sized near the CPU count can starve the
# upstream read in small sessions)
_WINNER_CACHE: dict = {}


def _make_winner_filter(winners_ref, order_col: str):
    def winner_filter(batch: pa.Table) -> pa.Table:
        key = str(winners_ref)
        winners = _WINNER_CACHE.get(key)
        if winners is None:
            import ray

            winners = np.sort(np.asarray(ray.get(winners_ref)))
            _WINNER_CACHE.clear()
            _WINNER_CACHE[key] = winners
        is_str = winners.dtype.kind in "OU"
        vals = np.asarray(batch[order_col].to_pylist()) if is_str \
            else batch[order_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(winners, vals)
        pos = np.clip(pos, 0, len(winners) - 1)
        keep = winners[pos] == vals
        return batch.filter(pa.array(keep))

    return winner_filter


def exact_dedup_projected(ds, key: str = "phash", order_col: str = "image_id",
                          concurrency: int = 4, strategy: str = "tree"):
    """Scale path for wide rows: shuffle only (key, order_col), compute
    winner ids, broadcast them once, then semi-join back via an actor
    pool. Valid when ``order_col`` is unique per row (image_id is).

    ``strategy="tree"`` (default) computes per-key min via the Arrow
    combiner tree — right when the winner set fits one block (it must
    anyway, since it is broadcast).  ``strategy="groupby"`` uses the
    hash-partitioned Dataset groupby for unbounded key spaces, where
    the broadcast itself must also be replaced (bloom filter / join)."""
    import ray

    projected = ds.select_columns([key, order_col])
    if strategy == "tree":
        from .agg_tree import tree_aggregate

        winners_ds = tree_aggregate(projected, [key], [(order_col, "min")])
        winners_df = winners_ds.to_pandas()
        winners_arr = winners_df[order_col].to_numpy()
    else:
        from ray.data.aggregate import Min

        winners_df = (projected.groupby(key)
                      .aggregate(Min(order_col, alias_name="winner"))
                      ).to_pandas()
        winners_arr = winners_df["winner"].to_numpy()
    winners_ref = ray.put(winners_arr)

    return ds.map_batches(_make_winner_filter(winners_ref, order_col),
                          batch_format="pyarrow")
