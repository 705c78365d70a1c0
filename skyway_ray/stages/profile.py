"""Single-pass column profiler — ``SELECT count, nulls, min, max`` for
EVERY requested column in ONE scan of the table (a data-quality
"describe" for ingest monitoring).

Scale shape: each block maps to one wide partial row (per column:
row count, null count, typed min, typed max — all vectorized Arrow
kernels), a ``map_batches`` fold tree merges 64 partials at a time
(sum / min / max are associative), and the driver reduces only the
short remainder — never data rows, never one partial per block.  The
output is long format (one row per column) with min/max rendered as
strings so heterogeneous column types share one result schema;
integer and string renderings match DuckDB's ``CAST(x AS VARCHAR)``
bit-for-bit, which is what the hash-verified oracle row checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _partial(cols):
    def partial(batch: pa.Table) -> pa.Table:
        out = {}
        for c in cols:
            a = batch[c]
            out[f"n_{c}"] = pa.array([len(a)], pa.int64())
            out[f"nulls_{c}"] = pa.array([a.null_count], pa.int64())
            mm = pc.min_max(a)
            out[f"min_{c}"] = pa.array([mm["min"].as_py()], a.type)
            out[f"max_{c}"] = pa.array([mm["max"].as_py()], a.type)
        return pa.table(out)

    return partial


def _fold(cols):
    def fold(b: pa.Table) -> pa.Table:
        out = {}
        for c in cols:
            out[f"n_{c}"] = pa.array(
                [pc.sum(b[f"n_{c}"]).as_py() or 0], pa.int64())
            out[f"nulls_{c}"] = pa.array(
                [pc.sum(b[f"nulls_{c}"]).as_py() or 0], pa.int64())
            mn = pc.min_max(b[f"min_{c}"])["min"]
            mx = pc.min_max(b[f"max_{c}"])["max"]
            out[f"min_{c}"] = pa.array([mn.as_py()], b[f"min_{c}"].type)
            out[f"max_{c}"] = pa.array([mx.as_py()], b[f"max_{c}"].type)
        return pa.table(out)

    return fold


def profile_columns(ds, cols: list[str]) -> pd.DataFrame:
    """One streaming pass → long-format profile rows
    (column, n, nulls, min_s, max_s), min/max stringified the way
    DuckDB casts to VARCHAR (exact for integer and string columns —
    profile floats/timestamps separately if you need their rendering)."""
    folded = (ds.map_batches(_partial(cols), batch_format="pyarrow",
                             zero_copy_batch=True)
              .map_batches(_fold(cols), batch_format="pyarrow",
                           batch_size=64)
              .map_batches(_fold(cols), batch_format="pyarrow",
                           batch_size=None))
    t = folded.to_pandas()
    # final driver-side reduce over the short remainder (≤ #blocks/64²)
    rows = []
    for c in cols:
        n = int(t[f"n_{c}"].sum())
        nulls = int(t[f"nulls_{c}"].sum())
        mn = t[f"min_{c}"].min()
        mx = t[f"max_{c}"].max()
        rows.append({"column": c, "n": n, "nulls": nulls,
                     "min_s": str(mn), "max_s": str(mx)})
    return pd.DataFrame(rows)
