"""Exact deduplication (hash-partition + per-group first).

``groupby(key)`` hash-partitions rows so all duplicates co-locate, then
``map_groups`` keeps the winner — the row with the minimum ``order_col``
(deterministic across runs and parallelism levels).  The 2% controlled
duplicate rate in the fixtures (FIXTURES.md §1) exercises this.

Scale note: this is a full shuffle of the keyed columns; for very wide
rows (multi-MB image bytes) dedup should run on a projected
(key, order_col) view followed by a semi-join on the winners — see
``exact_dedup_projected``.
"""

from __future__ import annotations

import pandas as pd


def exact_dedup(ds, key: str = "phash", order_col: str = "image_id"):
    """Keep exactly one row (min ``order_col``) per ``key`` value."""

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return group.nsmallest(1, order_col) if group[order_col].dtype.kind in "iuf" \
            else group.sort_values(order_col, kind="mergesort").head(1)

    return ds.groupby(key).map_groups(first, batch_format="pandas")


def exact_dedup_projected(ds, key: str = "phash", order_col: str = "image_id"):
    """Scale path for wide rows: shuffle only (key, order_col), compute
    winner ids, then semi-join the winners back via a broadcast filter.
    Valid when ``order_col`` is unique per row (image_id is)."""
    from ray.data.aggregate import Min

    winners = (
        ds.select_columns([key, order_col])
        .groupby(key)
        .aggregate(Min(order_col, alias_name="winner"))
    )
    winner_set = set(winners.to_pandas()["winner"].tolist())

    def keep_winners(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch[order_col].isin(winner_set)]

    return ds.map_batches(keep_winners, batch_format="pandas")
