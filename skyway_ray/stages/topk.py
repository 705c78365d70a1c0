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
