"""Join patterns the Dataset API doesn't ship directly (ray_guide
"Joins and lookups"): broadcast hash join, broadcast semi/anti join,
and a bucketed as-of join.

All small sides travel once via ``ray.put``; lookup happens inside
``map_batches`` with a per-worker-process cache — no shuffle.  The
as-of join co-locates keys with one ``groupby`` on the big side only
and runs ``pd.merge_asof`` per group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_SIDE_CACHE: dict = {}


def _cached(ref):
    key = str(ref)
    val = _SIDE_CACHE.get(key)
    if val is None:
        import ray

        val = ray.get(ref)
        _SIDE_CACHE.clear()
        _SIDE_CACHE[key] = val
    return val


def broadcast_hash_join(ds, small: pd.DataFrame, on: str, how: str = "inner",
                        small_on: str | None = None):
    """Join a Dataset against a broadcast pandas table (dimension-table
    pattern). ``how`` ∈ inner/left."""
    import ray

    ref = ray.put(small)
    small_key = small_on or on

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        rhs = _cached(ref)
        return batch.merge(rhs, how=how, left_on=on, right_on=small_key)

    return ds.map_batches(join, batch_format="pandas")


def broadcast_semi_join(ds, keys, on: str, anti: bool = False):
    """Keep rows whose ``on`` value is (not) in the broadcast key set —
    the HAS/DROP selector analogue over a foreign key."""
    import ray

    arr = np.sort(np.asarray(keys))
    ref = ray.put(arr)

    def filt(batch: pa.Table) -> pa.Table:
        k = _cached(ref)
        vals = batch[on].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(k, vals), 0, len(k) - 1)
        hit = k[pos] == vals if len(k) else np.zeros(len(vals), bool)
        return batch.filter(pa.array(~hit if anti else hit))

    return ds.map_batches(filt, batch_format="pyarrow")


def bloom_semi_join(ds, keys, on: str, bits_per_key: int = 10):
    """Approximate semi join for key sets too large to broadcast
    exactly: ~1% false-positive over-keep, zero false drops. Chain an
    exact filter on the (much smaller) survivor set when exactness is
    required."""
    import ray

    from ..functions.bloom import BloomFilter

    keys = np.asarray(keys)
    bf = BloomFilter(len(keys), bits_per_key=bits_per_key)
    bf.add(keys)
    ref = ray.put(bf)

    def filt(batch: pa.Table) -> pa.Table:
        f = _cached(ref)
        vals = batch[on].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(f.contains(vals)))

    return ds.map_batches(filt, batch_format="pyarrow")


def broadcast_range_join(ds, intervals: pd.DataFrame, on: str,
                         lo: str = "lo", hi: str = "hi",
                         how: str = "inner"):
    """Interval join: match each big-side row's ``on`` value x against
    every broadcast interval with ``lo <= x < hi``.  Intervals MAY
    overlap (a row can match several) — the classic price-band /
    time-range / geofence-latitude join.

    Vectorized bounded-span probe: intervals sort by ``lo`` once on the
    driver; per batch, the candidate set for x is the contiguous run of
    intervals with ``lo`` in ``(x - max_span, x]`` (two searchsorteds),
    expanded with ``np.repeat`` and filtered by ``hi > x``.  Cost is
    O(rows x overlap-degree), not O(rows x intervals).  The interval
    table is the SMALL side (broadcast once via ``ray.put``); a
    large-interval-side variant would bucket both sides by range bins —
    not needed for dimension-table-sized band lists.

    ``how='left'`` keeps unmatched rows with nulls in interval columns.
    """
    import ray

    iv = intervals.sort_values([lo, hi], kind="mergesort").reset_index(drop=True)
    los = iv[lo].to_numpy()
    his = iv[hi].to_numpy()
    max_span = float((his - los).max()) if len(iv) else 0.0
    ref = ray.put((los, his, iv))

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        los_b, his_b, iv_b = _cached(ref)
        x = batch[on].to_numpy()
        # candidate interval indices per row: los in (x - max_span, x]
        start = np.searchsorted(los_b, x - max_span, side="left")
        stop = np.searchsorted(los_b, x, side="right")
        counts = stop - start
        row_idx = np.repeat(np.arange(len(x)), counts)
        # flatten the per-row candidate runs into one index vector
        if len(row_idx):
            offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
            cand = np.arange(len(row_idx)) - offs[row_idx] + start[row_idx]
            keep = his_b[cand] > x[row_idx]
            row_idx, cand = row_idx[keep], cand[keep]
        else:
            cand = row_idx
        out = batch.iloc[row_idx].reset_index(drop=True)
        matched = iv_b.iloc[cand].reset_index(drop=True)
        out = pd.concat([out, matched], axis=1)
        if how == "left":
            miss = np.ones(len(x), dtype=bool)
            miss[row_idx] = False
            if miss.any():
                rest = batch.iloc[np.flatnonzero(miss)].reset_index(drop=True)
                rest = rest.reindex(columns=out.columns)
                out = pd.concat([out, rest], ignore_index=True)
        return out

    return ds.map_batches(join, batch_format="pandas")


def asof_join_broadcast(ds, right: pd.DataFrame, key: str, ts: str,
                        right_key: str, right_ts: str, right_cols: list[str],
                        direction: str = "backward"):
    """As-of join: for each left row, the latest right row with the
    same key and right_ts <= ts (direction=backward).  The right side
    is broadcast (small); each batch merge_asofs locally — no shuffle
    of the big side at all.  For a LARGE right side, bucket both sides
    by key hash and merge per bucket instead (documented scale path).
    """
    import ray

    right = right.sort_values([right_ts, right_key], kind="mergesort")
    ref = ray.put(right)

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        rhs = _cached(ref)
        b = batch.sort_values([ts, key], kind="mergesort")
        out = pd.merge_asof(b, rhs, left_on=ts, right_on=right_ts,
                            left_by=key, right_by=right_key,
                            direction=direction)
        return out[list(batch.columns) + right_cols]

    return ds.map_batches(join, batch_format="pandas")
