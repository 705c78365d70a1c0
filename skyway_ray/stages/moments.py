"""Distributed exact second-moment statistics (stddev / covariance /
Pearson correlation) over integer-valued columns.

Scale shape: one vectorized ``map_batches`` pass emits per-batch moment
partials (n, Σx, Σy, Σx², Σy², Σxy — one row per group per batch, all
exact int64), the bounded-cardinality combiner tree
(:func:`..stages.agg_tree.tree_aggregate`) sums them, and a final
map over the ≤ |groups|-row table evaluates the closed forms.  No
all-to-all shuffle of data rows; only tiny partial rows move.

Determinism: every accumulated quantity is an integer, so the result is
independent of batch boundaries and summation order.  The final stage
evaluates the float formulas in ONE pinned operation order (cast each
exact integer term to double, then divide / sqrt — both IEEE-754
correctly-rounded), so a SQL oracle spelling the same order matches
bit-for-bit; outputs additionally go through the repo's
``floor(x * 1e6 + 0.5)`` micro-int convention.

The final stage does its integer algebra in arbitrary-precision Python
ints (the table there is tiny — one row per group), so ``n·Σx²``-style
terms cannot overflow int64 at web scale even though the *partials*
stay int64 (safe while per-group Σx² < 2⁶³ ≈ 9.2e18; with |x| ≤ 10³
that is ~10¹² rows per group per batch-tree level — raise to float128
partials beyond that).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from .agg_tree import tree_aggregate

_PARTIAL_COLS = ["n", "sx", "sy", "sxx", "syy", "sxy"]


def _partials(key: str, x: str, y: str):
    def fn(batch: pa.Table) -> pa.Table:
        xv = batch[x].to_numpy(zero_copy_only=False).astype(np.int64)
        yv = batch[y].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({
            key: batch[key],
            "n": pa.array(np.ones(len(xv), np.int64)),
            "sx": pa.array(xv),
            "sy": pa.array(yv),
            "sxx": pa.array(xv * xv),
            "syy": pa.array(yv * yv),
            "sxy": pa.array(xv * yv),
        })
        g = t.group_by([key]).aggregate([(c, "sum") for c in _PARTIAL_COLS])
        return g.rename_columns([key] + _PARTIAL_COLS)

    return fn


def _finalize(key: str):
    def fn(batch: pa.Table) -> pa.Table:
        rows = []
        for i in range(batch.num_rows):
            n = int(batch["n"][i].as_py())
            sx, sy = int(batch["sx"][i].as_py()), int(batch["sy"][i].as_py())
            sxx, syy = int(batch["sxx"][i].as_py()), int(batch["syy"][i].as_py())
            sxy = int(batch["sxy"][i].as_py())
            num = n * sxy - sx * sy            # exact (Python int)
            dx = n * sxx - sx * sx
            dy = n * syy - sy * sy
            if dx * dy == 0:
                corr = 0.0
            else:
                corr = float(num) / math.sqrt(float(dx) * float(dy))
            sdx = math.sqrt(float(dx)) / float(n)
            sdy = math.sqrt(float(dy)) / float(n)
            rows.append({
                key: batch[key][i].as_py(),
                "n": n,
                "corr_micro": int(math.floor(corr * 1e6 + 0.5)),
                "sdx_micro": int(math.floor(sdx * 1e6 + 0.5)),
                "sdy_micro": int(math.floor(sdy * 1e6 + 0.5)),
            })
        return pa.Table.from_pylist(rows) if rows else pa.table({
            key: pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "corr_micro": pa.array([], pa.int64()),
            "sdx_micro": pa.array([], pa.int64()),
            "sdy_micro": pa.array([], pa.int64()),
        })

    return fn


def grouped_moments(ds, key: str, x: str, y: str):
    """Exact per-group n / population-stddev(x,y) / corr(x,y) of two
    integer columns, returned as micro-ints (see module docstring for
    the pinned float-op order a SQL oracle must mirror)."""
    partials = ds.map_batches(_partials(key, x, y), batch_format="pyarrow")
    combined = tree_aggregate(partials, [key],
                              [(c, "sum") for c in _PARTIAL_COLS])
    return combined.map_batches(_finalize(key), batch_format="pyarrow")


def moments_sql(table: str, key: str, x_expr: str, y_expr: str) -> str:
    """DuckDB oracle mirroring :func:`grouped_moments` bit-for-bit —
    same exact integer algebra (DuckDB widens to HUGEINT), same
    double-cast points, same op order."""
    return f"""
WITH s AS (
  SELECT {key},
         CAST(count(*) AS BIGINT)        AS n,
         CAST(sum(x) AS HUGEINT)         AS sx,
         CAST(sum(y) AS HUGEINT)         AS sy,
         CAST(sum(x * x) AS HUGEINT)     AS sxx,
         CAST(sum(y * y) AS HUGEINT)     AS syy,
         CAST(sum(x * y) AS HUGEINT)     AS sxy
  FROM (SELECT {key}, CAST({x_expr} AS HUGEINT) AS x,
               CAST({y_expr} AS HUGEINT) AS y FROM {table})
  GROUP BY {key}
), t AS (
  SELECT {key}, n,
         n * sxy - sx * sy AS num,
         n * sxx - sx * sx AS dx,
         n * syy - sy * sy AS dy
  FROM s
)
SELECT {key}, n,
  CAST(floor(CASE WHEN dx * dy = 0 THEN 0.0
       ELSE CAST(num AS DOUBLE) / sqrt(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE))
       END * 1000000 + 0.5) AS BIGINT) AS corr_micro,
  CAST(floor(sqrt(CAST(dx AS DOUBLE)) / CAST(n AS DOUBLE) * 1000000 + 0.5)
       AS BIGINT) AS sdx_micro,
  CAST(floor(sqrt(CAST(dy AS DOUBLE)) / CAST(n AS DOUBLE) * 1000000 + 0.5)
       AS BIGINT) AS sdy_micro
FROM t
"""
