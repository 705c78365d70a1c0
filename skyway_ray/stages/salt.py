"""Hot-key salting for skewed shuffles (SURVEY.md §4 "Skew").

Dense urban cells (the fixtures plant ~10% of rows in one region —
FIXTURES.md) make a plain ``groupby(cell)`` ship one giant partition to
one reducer.  Explicit handling, since Ray Data won't fix key skew:

1. :func:`find_hot_keys` — count keys on a cheap sample (or exactly on
   the pre-aggregated combiner output) and flag keys above a threshold.
2. :func:`add_salt_column` — add a ``_salt`` int8 column: a rotating
   salt for hot keys, 0 for cold ones.  A separate column (not folded
   into the key by arithmetic — cell ids use the high int64 bits, so
   ``key * S`` would overflow).
3. aggregate on ``(key, _salt)`` — hot keys now spread across ≤ S
   reducers — then drop ``_salt`` and re-aggregate the ≤ S partials.

The two-phase re-aggregation is exact for decomposable aggregates
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


def add_salt_column(batch: pa.Table, key: str, hot_keys: set, num_salts: int,
                    salt_col: str = "_salt") -> pa.Table:
    """Vectorized: ``_salt`` = rotating 0..num_salts-1 for hot keys,
    0 for cold keys."""
    k = batch[key].to_numpy(zero_copy_only=False)
    hot = np.isin(k, np.fromiter(hot_keys, dtype=k.dtype, count=len(hot_keys))) \
        if hot_keys else np.zeros(len(k), dtype=bool)
    salt = (np.arange(len(k)) % num_salts).astype(np.int8)
    return batch.append_column(
        salt_col, pa.array(np.where(hot, salt, 0), pa.int8()))


def salted_count(ds, key: str, num_salts: int = 16,
                 hot_threshold: int = 100_000,
                 sample_fraction: float = 0.01):
    """groupby-count with two-phase salting: hot keys split across
    ``num_salts`` reducers, then a tiny second aggregate merges the
    partials. Returns Dataset (key, n) — equal to a plain groupby."""
    from ray.data.aggregate import Sum

    hot = find_hot_keys(ds, key, hot_threshold, sample_fraction)

    def salt_and_combine(b: pa.Table) -> pa.Table:
        # combine within the batch before the shuffle: the groupby then
        # moves ≤ |keys in batch| × |salts| partials instead of rows
        b = add_salt_column(b, key, hot, num_salts)
        g = b.group_by([key, "_salt"]).aggregate([(key, "count")])
        return g.rename_columns([key, "_salt", "n_partial"])

    phase1 = (ds.map_batches(salt_and_combine, batch_format="pyarrow")
              .groupby([key, "_salt"])
              .aggregate(Sum("n_partial", alias_name="n_salted")))
    phase1 = phase1.map_batches(
        lambda b: b.drop_columns(["_salt"]), batch_format="pyarrow")
    return phase1.groupby(key).aggregate(Sum("n_salted", alias_name="n"))
