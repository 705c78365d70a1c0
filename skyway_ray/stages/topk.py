"""Distributed top-k: per-batch partial top-k, then a tiny global sort.

The per-batch combiner cuts the sort input from N rows to
(k × n_batches) rows, so the global ``sort`` shuffle is negligible.
Ties broken by ``tiebreak_col`` so results are deterministic across
parallelism levels (and hash-comparable against a SQL oracle using
ORDER BY col, tiebreak LIMIT k).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def top_k(ds, col: str, k: int, descending: bool = True,
          tiebreak_col: str | None = None):
    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        keys = [(col, "descending" if descending else "ascending")]
        if tiebreak_col:
            keys.append((tiebreak_col, "ascending"))
        idx = pa.compute.sort_indices(batch, sort_keys=keys)[:k]
        return batch.take(idx)

    reduced = ds.map_batches(partial, batch_format="pyarrow")
    sort_cols = [col] if tiebreak_col is None else [col, tiebreak_col]
    sort_desc = [descending] if tiebreak_col is None else [descending, False]
    return reduced.sort(sort_cols, descending=sort_desc).limit(k)


def grouped_top_k(ds, group_col: str, col: str, k: int,
                  descending: bool = True, tiebreak_col: str | None = None):
    """Top-k rows per group.  Same pre-reduce pattern as the global
    top-k — every batch keeps at most k rows PER GROUP locally (one
    vectorized sort per batch), so the groupby shuffle moves ≤
    k × |groups-per-batch| rows instead of the table; the per-group
    finish then sorts ≤ k × #blocks rows."""
    import pandas as pd

    keys = [(group_col, "ascending"),
            (col, "descending" if descending else "ascending")]
    if tiebreak_col:
        keys.append((tiebreak_col, "ascending"))

    def partial(batch: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(batch, sort_keys=keys)
        b = batch.take(idx)
        g = b[group_col].to_numpy(zero_copy_only=False)
        # rank within group on the sorted block: positions since the
        # group's first row
        import numpy as np

        new = np.ones(len(g), dtype=bool)
        new[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(new)
        rank = np.arange(len(g)) - np.repeat(starts, np.diff(
            np.append(starts, len(g))))
        return b.filter(pa.array(rank < k))

    def finish(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp.sort_values(
            [col] + ([tiebreak_col] if tiebreak_col else []),
            ascending=[not descending] + ([True] if tiebreak_col else []),
            kind="mergesort")
        return grp.head(k)

    reduced = ds.map_batches(partial, batch_format="pyarrow")
    return reduced.groupby(group_col).map_groups(finish,
                                                 batch_format="pandas")
