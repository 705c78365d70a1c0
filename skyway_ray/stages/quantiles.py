"""Exact distributed quantiles (order statistics) without a global
sort: sampled-splitter selection with iterative range refinement.

``ORDER BY x LIMIT 1 OFFSET k`` semantics at any scale:

1. One streaming pass bins every value against ~``sample_limit``
   sorted sampled splitters (per-batch ``searchsorted`` + ``bincount``
   — tiny (block, bucket, count) partials, summed on the driver:
   bounded by blocks x splitters, never by rows).
2. The cumulative bucket histogram locates each target rank's bucket;
   ranks whose bucket still exceeds ``collect_limit`` refine by
   re-running step 1 on the (lazy, streaming) range-filtered Dataset
   with splitters resampled inside the bucket — each round shrinks the
   candidate range by ~the splitter count.
3. Terminal buckets (≤ ``collect_limit`` rows) are pulled once and
   selected exactly with ``np.partition``.

The full dataset is never materialized, sorted, or shuffled; driver
memory is O(splitters + collect_limit).  Deterministic: seeded sample.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _bucket_counts(ds, col: str, splitters: np.ndarray) -> np.ndarray:
    """One streaming pass: rows-per-bucket against sorted splitters
    (bucket i = #splitters <= x, i.e. [S[i-1], S[i]) half-open)."""
    nb = len(splitters) + 1

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[col].to_numpy(zero_copy_only=False)
        c = np.bincount(np.searchsorted(splitters, x, side="right"),
                        minlength=nb)
        return pa.table({"bucket": pa.array(np.arange(nb, dtype=np.int64)),
                         "n": pa.array(c.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    counts = np.zeros(nb, dtype=np.int64)
    np.add.at(counts, parts["bucket"].to_numpy(), parts["n"].to_numpy())
    return counts


def _range_filter(ds, col: str, lo, hi):
    """Lazy streaming filter to [lo, hi) (None = unbounded)."""

    def filt(batch: pa.Table) -> pa.Table:
        m = None
        if lo is not None:
            m = pc.greater_equal(batch[col], lo)
        if hi is not None:
            m2 = pc.less(batch[col], hi)
            m = m2 if m is None else pc.and_(m, m2)
        return batch.filter(m) if m is not None else batch

    return ds.map_batches(filt, batch_format="pyarrow")


def _sample_splitters(ds, col: str, sample_limit: int, seed: int) -> np.ndarray:
    s = ds.random_sample(0.5, seed=seed).limit(sample_limit).to_pandas()
    return np.unique(s[col].to_numpy())


def exact_quantiles(ds, col: str, qs: list[float],
                    sample_limit: int = 2048, collect_limit: int = 500_000,
                    max_rounds: int = 6, seed: int = 42,
                    materialize_input: bool = True) -> pd.DataFrame:
    """Exact q-quantiles of ``ds[col]`` with DuckDB-mirrorable
    semantics: for each q, the element at 0-indexed rank
    ``floor(q * (n - 1))`` of the ascending sort (duplicates counted) —
    identical to ``row_number() OVER (ORDER BY col) - 1 = rank``.
    Returns a small DataFrame (q, value), values raw pass-throughs
    (bit-exact in a hash compare)."""
    if materialize_input:
        ds = _pin_column(ds, col)
    n = ds.count()
    if n == 0:
        return pd.DataFrame({"q": pd.Series(qs, dtype=np.float64),
                             "value": np.full(len(qs), np.nan)})
    targets = {q: int(np.floor(q * (n - 1))) for q in qs}
    values = select_ranks(ds, col, sorted(set(targets.values())),
                          sample_limit=sample_limit,
                          collect_limit=collect_limit,
                          max_rounds=max_rounds, seed=seed,
                          materialize_input=False)
    return pd.DataFrame({"q": pd.Series(list(qs), dtype=np.float64),
                         "value": [values[targets[q]] for q in qs]})


def _pin_column(ds, col: str):
    """Project to the one needed column and materialize it once: every
    refinement round re-executes the input (sample pass + count pass +
    terminal collect), so without pinning, a 5-10-pass selection pays
    the upstream read/derivation 5-10×.  The pinned dataset is 8
    bytes/row — at 10^12 rows that is ~8 TB in the object store, which
    spills to local disk on a real cluster and is still cheaper than
    re-scanning the source per pass; pass ``materialize_input=False``
    on storage-constrained clusters to trade memory for re-reads."""
    return ds.select_columns([col]).materialize()


def select_ranks(ds, col: str, ranks: list[int],
                 sample_limit: int = 2048, collect_limit: int = 500_000,
                 max_rounds: int = 6, seed: int = 42,
                 materialize_input: bool = True) -> dict:
    """Exact order statistics: value at each 0-indexed ascending rank
    (``ORDER BY col LIMIT 1 OFFSET r``), one refinement harness for all
    requested ranks (see module docstring).  Returns {rank: value}."""
    if materialize_input:
        ds = _pin_column(ds, col)
    # state per pending rank: (rank_offset_into_range, lo, hi)
    pending = {r: (r, None, None) for r in ranks}
    values: dict = {}
    for _ in range(max_rounds):
        if not pending:
            break
        # group pending ranks by identical range so each range pays one
        # pass (all ranks share the full range in round 1)
        by_range: dict = {}
        for key, (r, lo, hi) in pending.items():
            by_range.setdefault((lo, hi), []).append((key, r))
        next_pending = {}
        for (lo, hi), kr in by_range.items():
            sub = _range_filter(ds, col, lo, hi)
            splitters = _sample_splitters(sub, col, sample_limit, seed)
            counts = _bucket_counts(sub, col, splitters)
            cum = np.concatenate([[0], np.cumsum(counts)])
            for key, r in kr:
                b = int(np.searchsorted(cum, r, side="right")) - 1
                in_rank = r - int(cum[b])
                b_lo = splitters[b - 1] if b > 0 else lo
                b_hi = splitters[b] if b < len(splitters) else hi
                # collect when the bucket is small enough, or when the
                # round made no progress (no interior splitters — all
                # sampled values equal; the bucket IS the range)
                no_progress = (b_lo is lo or b_lo == lo) and \
                              (b_hi is hi or b_hi == hi)
                if counts[b] <= collect_limit or no_progress:
                    vals = _range_filter(ds, col, b_lo, b_hi).to_pandas()
                    v = np.partition(vals[col].to_numpy(), in_rank)[in_rank]
                    values[key] = v
                else:
                    next_pending[key] = (in_rank, b_lo, b_hi)
        pending = next_pending
    for key, (r, lo, hi) in pending.items():  # max_rounds fallback
        vals = _range_filter(ds, col, lo, hi).to_pandas()
        values[key] = np.partition(vals[col].to_numpy(), r)[r]
    return values


def percentile_cont(ds, col: str, qs: list[float],
                    materialize_input: bool = True, **kw) -> pd.DataFrame:
    """Interpolated (PERCENTILE_CONT) quantiles without a global sort:
    the two bracketing order statistics come from :func:`select_ranks`
    and interpolate as ``v_lo + (h - floor(h)) * (v_hi - v_lo)`` with
    ``h = q * (n - 1)`` — each float op pinned so a SQL oracle spelling
    the identical expression matches bit-for-bit."""
    if materialize_input:
        ds = _pin_column(ds, col)
    n = ds.count()
    if n == 0:
        return pd.DataFrame({"q": pd.Series(qs, dtype=np.float64),
                             "value": np.full(len(qs), np.nan)})
    need = {}
    for q in qs:
        h = q * (n - 1)
        lo = int(np.floor(h))
        need[q] = (h, lo, min(lo + 1, n - 1))
    ranks = sorted({r for _, lo, hi in need.values() for r in (lo, hi)})
    vals = select_ranks(ds, col, ranks, materialize_input=False, **kw)
    out = []
    for q in qs:
        h, lo, hi = need[q]
        v0, v1 = float(vals[lo]), float(vals[hi])
        out.append(v0 + (h - np.floor(h)) * (v1 - v0))
    return pd.DataFrame({"q": pd.Series(list(qs), dtype=np.float64),
                         "value": np.asarray(out, np.float64)})
