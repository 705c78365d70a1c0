"""Hot-key salting for skewed shuffles (SURVEY.md §4 "Skew").

Dense urban cells (the fixtures plant ~10% of rows in one region —
FIXTURES.md) make a plain ``groupby(cell)`` ship one giant partition to
one reducer.  Explicit handling, since Ray Data won't fix key skew:

1. :func:`find_hot_keys` — count keys on a cheap sample (or exactly on
   the pre-aggregated combiner output) and flag keys above a threshold.
2. :func:`add_salted_key` — rewrite ``key`` to ``key * S + salt`` for
   hot keys (salt = deterministic row hash % S), identity (``key * S``)
   for cold ones — one int64 column, no string formatting.
3. aggregate on the salted key, then :func:`unsalt` (integer divide)
   and re-aggregate the ≤ S partials per hot key.

The salted re-aggregation is exact for decomposable aggregates
(count/sum/min/max — the flagship tile stats use count).
"""

from __future__ import annotations

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


def add_salted_key(batch: pa.Table, key: str, hot_keys: set, num_salts: int,
                   out_col: str = "salted_key") -> pa.Table:
    """Vectorized: salted = key * num_salts + (row_hash % num_salts if
    hot else 0)."""
    k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
    hot = np.isin(k, np.fromiter(hot_keys, dtype=np.int64, count=len(hot_keys))) \
        if hot_keys else np.zeros(len(k), dtype=bool)
    # deterministic per-row salt from a cheap integer mix of the key and
    # the row's position-independent content hash (use key + arange is
    # NOT stable across block splits; mix with another column if exact
    # reproducibility of salt assignment matters — counts don't care)
    salt = (np.arange(len(k)) % num_salts).astype(np.int64)
    salted = k * num_salts + np.where(hot, salt, 0)
    return batch.append_column(out_col, pa.array(salted, pa.int64()))


def unsalt(batch: pa.Table, salted_col: str, num_salts: int,
           out_col: str) -> pa.Table:
    s = batch[salted_col].to_numpy(zero_copy_only=False)
    out = batch.append_column(out_col, pa.array(s // num_salts, pa.int64()))
    return out.drop_columns([salted_col])


def salted_count(ds, key: str, num_salts: int = 16,
                 hot_threshold: int = 100_000,
                 sample_fraction: float = 0.01):
    """groupby-count with two-phase salting: hot keys split across
    ``num_salts`` reducers, then a tiny second aggregate merges the
    partials. Returns Dataset (key, n)."""
    from ray.data.aggregate import Sum

    hot = find_hot_keys(ds, key, hot_threshold, sample_fraction)

    def salt_batch(b: pa.Table) -> pa.Table:
        return add_salted_key(b, key, hot, num_salts)

    phase1 = (ds.map_batches(salt_batch, batch_format="pyarrow")
              .groupby("salted_key")
              .count())
    phase1 = phase1.map_batches(
        lambda b: unsalt(b.rename_columns(["salted_key", "n_partial"]),
                         "salted_key", num_salts, key),
        batch_format="pyarrow")
    return phase1.groupby(key).aggregate(Sum("n_partial", alias_name="n"))
