"""Global-order statistics via range partitioning — the distributed
prefix-scan pattern: route rows to VALUE-RANGE buckets (sampled
splitters; equal values never straddle buckets), reduce each bucket's
totals through the bounded combiner tree, broadcast the exclusive
prefix offsets, then finish each bucket locally with its offset.  Two
passes over a materialized projection; no global sort, no driver-side
data.

Splitter choice affects only bucket BALANCE, never results — every
statistic here is offset-adjusted exact integer arithmetic (same
posture as stages/quantiles.py, whose sampling the search reuses)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .agg_tree import tree_aggregate_to_table
from .scan import auto_n_buckets


def _range_bucket(ds, col: str, splitters: np.ndarray):
    def add(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False)
        return b.append_column(
            "_rb", pa.array(np.searchsorted(splitters, v, side="right"),
                            pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow")


def two_sample_ks(ds, val_col: str, is_a_col: str,
                  n_buckets: int | None = None, n_rows: int | None = None,
                  seed: int = 42) -> pd.DataFrame:
    """Exact two-sample Kolmogorov–Smirnov distance in integer
    arithmetic: returns one row ``(d_scaled, n_a, n_b)`` where
    ``d_scaled = max over distinct v of |cnt_a(<=v)·n_b −
    cnt_b(<=v)·n_a|`` (so D = d_scaled / (n_a·n_b); callers at
    n_a·n_b ≥ 2^63 must pre-aggregate or accept float).

    ``val_col`` int64 (quantize floats first — the house
    ``floor(x·1e6+0.5)`` rule), ``is_a_col`` ∈ {0,1}.  Plan: one
    materialized bucket pass, a bounded totals tree, broadcast
    exclusive offsets, per-bucket vectorized cumsum + max, bounded
    final max — the global CDF is never assembled anywhere."""
    import ray

    from .quantiles import _sample_splitters

    if n_rows is None:
        n_rows = ds.count()
    if n_buckets is None:
        n_buckets = auto_n_buckets(n_rows)
    cand = _sample_splitters(ds, val_col, sample_limit=4096, seed=seed)
    step = max(1, len(cand) // n_buckets)
    splitters = cand[step - 1::step]

    bucketed = _range_bucket(ds, val_col, splitters).materialize()

    def partial(b: pa.Table) -> pa.Table:
        rb = b["_rb"].to_numpy(zero_copy_only=False)
        a = b[is_a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"_rb": pa.array(np.unique(rb), pa.int64()),
                         "ca": pa.array(np.bincount(
                             rb, weights=a,
                             minlength=0)[np.unique(rb)].astype(np.int64)),
                         "cb": pa.array(np.bincount(
                             rb, weights=1 - a,
                             minlength=0)[np.unique(rb)].astype(np.int64))})

    totals = tree_aggregate_to_table(
        bucketed.map_batches(partial, batch_format="pyarrow"),
        ["_rb"], [("ca", "sum"), ("cb", "sum")]).to_pandas()
    totals = totals.sort_values("_rb")
    n_a = int(totals["ca"].sum())
    n_b = int(totals["cb"].sum())
    if n_a and n_b and float(n_a) * float(n_b) >= float(2 ** 63):
        raise ValueError("n_a*n_b overflows int64 — pre-aggregate")
    off_a = np.zeros(int(len(splitters)) + 1, np.int64)
    off_b = np.zeros(int(len(splitters)) + 1, np.int64)
    idx = totals["_rb"].to_numpy()
    off_a[idx] = totals["ca"].to_numpy()
    off_b[idx] = totals["cb"].to_numpy()
    off_a = np.concatenate(([0], np.cumsum(off_a)[:-1]))
    off_b = np.concatenate(([0], np.cumsum(off_b)[:-1]))
    ref = ray.put((off_a, off_b, n_a, n_b))

    def local_max(g: pd.DataFrame) -> pd.DataFrame:
        from .joins import _cached

        oa, ob, na, nb = _cached(ref)
        rb = int(g["_rb"].iloc[0])
        v = g[val_col].to_numpy()
        a = g[is_a_col].to_numpy().astype(np.int64)
        order = np.argsort(v, kind="stable")
        v, a = v[order], a[order]
        last = np.r_[v[1:] != v[:-1], True]
        ca = oa[rb] + np.cumsum(a)[last]
        cb = ob[rb] + np.cumsum(1 - a)[last]
        d = np.abs(ca * nb - cb * na).max()
        return pd.DataFrame({"d": [np.int64(d)]})

    parts = bucketed.groupby("_rb").map_groups(
        local_max, batch_format="pandas").to_pandas()
    d = int(parts["d"].max()) if len(parts) else 0
    return pd.DataFrame({"d_scaled": pd.Series([d], dtype=np.int64),
                         "n_a": pd.Series([n_a], dtype=np.int64),
                         "n_b": pd.Series([n_b], dtype=np.int64)})


def global_rank(ds, val_col: str, id_col: str, out_col: str = "global_rank",
                n_buckets: int | None = None, n_rows: int | None = None,
                seed: int = 42, keep: tuple[str, ...] = ()):
    """Distributed global ROW_NUMBER: 1-based position of every row in
    the whole-dataset ascending sort by ``(val_col, id_col)`` — the
    ORDER-BY-with-no-PARTITION window no per-key exchange can express.
    Same offset-broadcast plan as :func:`two_sample_ks`: range buckets
    (equal values never straddle), a bounded per-bucket count tree,
    exclusive offsets broadcast, then each bucket ranks locally —
    no global sort operator, no driver-side data.  ``keep`` columns
    ride along into the output (saves the rank→payload re-join when
    the caller groups ranks by a label column)."""
    import ray

    from .quantiles import _sample_splitters

    if n_rows is None:
        n_rows = ds.count()
    if n_buckets is None:
        n_buckets = auto_n_buckets(n_rows)
    cand = _sample_splitters(ds, val_col, sample_limit=4096, seed=seed)
    step = max(1, len(cand) // n_buckets)
    splitters = cand[step - 1::step]

    bucketed = _range_bucket(ds, val_col, splitters).materialize()

    def partial(b: pa.Table) -> pa.Table:
        rb = b["_rb"].to_numpy(zero_copy_only=False)
        u, c = np.unique(rb, return_counts=True)
        return pa.table({"_rb": pa.array(u, pa.int64()),
                         "cnt": pa.array(c.astype(np.int64), pa.int64())})

    totals = tree_aggregate_to_table(
        bucketed.map_batches(partial, batch_format="pyarrow"),
        ["_rb"], [("cnt", "sum")]).to_pandas()
    off = np.zeros(int(len(splitters)) + 1, np.int64)
    off[totals["_rb"].to_numpy()] = totals["cnt"].to_numpy()
    off = np.concatenate(([0], np.cumsum(off)[:-1]))
    ref = ray.put(off)

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        from .joins import _cached

        o = _cached(ref)
        rb = int(g["_rb"].iloc[0])
        order = np.lexsort((g[id_col].to_numpy(), g[val_col].to_numpy()))
        out = pd.DataFrame({id_col: g[id_col].to_numpy()[order]})
        out[out_col] = o[rb] + 1 + np.arange(len(g), dtype=np.int64)
        for c in keep:
            out[c] = g[c].to_numpy()[order]
        return out

    return bucketed.groupby("_rb").map_groups(rank, batch_format="pandas")


def gini_scaled(ds, val_col: str, n_buckets: int | None = None,
                n_rows: int | None = None, seed: int = 42) -> pd.DataFrame:
    """Exact Gini concentration index in integer arithmetic: one row
    ``(g_num, g_den)`` with ``g_num = Σ (2·rank_i − n − 1)·v_i`` over
    the global ascending sort (ties order-invariant — equal values
    share the coefficient block sum) and ``g_den = n · Σv``, so
    G = g_num / g_den.  Same range-bucket + offset-broadcast plan as
    :func:`global_rank`, but the offsets carry (count, value-sum)
    pairs and each bucket reduces to ONE partial — nothing row-sized
    leaves the buckets.  Needs ``n² · max(v)`` < 2^63."""
    import ray

    from .quantiles import _sample_splitters

    if n_rows is None:
        n_rows = ds.count()
    if n_buckets is None:
        n_buckets = auto_n_buckets(n_rows)
    cand = _sample_splitters(ds, val_col, sample_limit=4096, seed=seed)
    step = max(1, len(cand) // n_buckets)
    splitters = cand[step - 1::step]

    bucketed = _range_bucket(ds, val_col, splitters).materialize()

    def partial(b: pa.Table) -> pa.Table:
        rb = b["_rb"].to_numpy(zero_copy_only=False)
        v = b[val_col].to_numpy(zero_copy_only=False)
        u, inv, c = np.unique(rb, return_inverse=True, return_counts=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, v)
        return pa.table({"_rb": pa.array(u, pa.int64()),
                         "cnt": pa.array(c.astype(np.int64), pa.int64()),
                         "vs": pa.array(s, pa.int64())})

    totals = tree_aggregate_to_table(
        bucketed.map_batches(partial, batch_format="pyarrow"),
        ["_rb"], [("cnt", "sum"), ("vs", "sum")]).to_pandas()
    n = int(totals["cnt"].sum())
    vsum = int(totals["vs"].sum())
    off = np.zeros(int(len(splitters)) + 1, np.int64)
    off[totals["_rb"].to_numpy()] = totals["cnt"].to_numpy()
    off = np.concatenate(([0], np.cumsum(off)[:-1]))
    ref = ray.put((off, n))

    def local(g: pd.DataFrame) -> pd.DataFrame:
        from .joins import _cached

        o, nn = _cached(ref)
        rb = int(g["_rb"].iloc[0])
        v = np.sort(g[val_col].to_numpy(), kind="stable")
        i = o[rb] + 1 + np.arange(len(v), dtype=np.int64)
        return pd.DataFrame(
            {"p": [np.int64(np.sum((2 * i - nn - 1) * v))]})

    parts = bucketed.groupby("_rb").map_groups(
        local, batch_format="pandas").to_pandas()
    g_num = int(parts["p"].sum()) if len(parts) else 0
    return pd.DataFrame({"g_num": pd.Series([g_num], dtype=np.int64),
                         "g_den": pd.Series([n * vsum], dtype=np.int64)})
