"""Distributed k-means in exact integer (micro-unit) arithmetic —
iterative ML clustering with a bit-exact SQL oracle.

Same determinism recipe as stages/pagerank.py: coordinates quantize to
micro-ints once (floor(x·1e6 + 0.5) — row-local, order-free), distances
and partial sums are exact int64, and the centroid update divides in
ONE pinned double op (``floor(double(sum) / double(n))``) so an
unrolled SQL oracle matches bit-for-bit.  Squared distances stay in
int64 while |x_micro| · √d < ~3e9 (unit-scale embeddings at d ≤ 4096
are far inside).

Scale shape: centroids (k×d ints) broadcast per iteration; ONE
streaming pass per iteration emits per-batch (cluster, dim, partial
sum) rows — k·(d+1) rows per batch, aggregated on the bounded combiner
tree.  Vectors never shuffle; driver state is k×d.

Initialization: the k vectors with the smallest ids (deterministic and
trivially SQL-expressible).  Empty clusters keep their previous
centroid.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from .agg_tree import tree_aggregate

_CACHE: dict = {}


def _cached(ref):
    key = str(ref)
    if key not in _CACHE:
        import ray

        _CACHE.clear()
        _CACHE[key] = ray.get(ref)
    return _CACHE[key]


def _quantize(emb_col) -> np.ndarray:
    """list<float> column → (n, d) int64 micro matrix."""
    arr = emb_col.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offs = np.asarray(arr.offsets)
    offs = offs - offs[0]
    d = int(offs[1] - offs[0]) if len(offs) > 1 else 0
    q = np.floor(flat * 1e6 + 0.5).astype(np.int64)
    return q.reshape(-1, d)


def kmeans_micro(ds, k: int = 4, iters: int = 2,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
    """k-means over a Dataset with (id, list<float>) columns; returns a
    pyarrow Table (cluster, n, centroid_sum) — final-assignment sizes
    and the integer checksum of each updated centroid."""
    import ray

    # init: vectors with id < k (deterministic; ids assumed 0-based)
    init = ds.filter(expr=f"{id_col} < {k}").to_pandas()
    init = init.sort_values(id_col)
    cents = np.stack([
        np.floor(np.asarray(v, np.float64) * 1e6 + 0.5).astype(np.int64)
        for v in init[vec_col]])
    assert cents.shape[0] == k, "need ids 0..k-1 present"
    d = cents.shape[1]

    last_counts = np.zeros(k, np.int64)
    for _ in range(iters):
        cref = ray.put(cents.copy())

        def partials(b: pa.Table, cref=cref) -> pa.Table:
            C = _cached(cref)
            X = _quantize(b[vec_col])
            if X.size == 0:
                return pa.table({"cluster": pa.array([], pa.int64()),
                                 "dim": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.int64())})
            # (n, k) exact int squared distances
            dist = np.empty((X.shape[0], C.shape[0]), np.int64)
            for j in range(C.shape[0]):
                diff = X - C[j]
                dist[:, j] = np.einsum("ij,ij->i", diff, diff)
            assign = np.argmin(dist, axis=1)  # first min = smallest j
            rows_c, rows_d, rows_s = [], [], []
            for j in range(C.shape[0]):
                m = assign == j
                n_j = int(m.sum())
                if n_j == 0:
                    continue
                s = X[m].sum(axis=0)
                rows_c.extend([j] * (X.shape[1] + 1))
                rows_d.extend(list(range(X.shape[1])) + [-1])
                rows_s.extend(list(s) + [n_j])
            return pa.table({
                "cluster": pa.array(np.asarray(rows_c, np.int64)),
                "dim": pa.array(np.asarray(rows_d, np.int64)),
                "s": pa.array(np.asarray(rows_s, np.int64))})

        agg = tree_aggregate(
            ds.map_batches(partials, batch_format="pyarrow"),
            ["cluster", "dim"], [("s", "sum")]).to_pandas()
        counts = np.zeros(k, np.int64)
        sums = np.zeros((k, d), np.int64)
        cnt_rows = agg[agg["dim"] == -1]
        counts[cnt_rows["cluster"].to_numpy()] = cnt_rows["s"].to_numpy()
        dims = agg[agg["dim"] >= 0]
        sums[dims["cluster"].to_numpy(), dims["dim"].to_numpy()] = \
            dims["s"].to_numpy()
        new = cents.copy()  # empty clusters keep the old centroid
        for j in range(k):
            if counts[j] > 0:
                new[j] = np.array([
                    math.floor(float(sums[j, t]) / float(counts[j]))
                    for t in range(d)], np.int64)
        cents = new
        last_counts = counts

    return pa.table({
        "cluster": pa.array(np.arange(k, dtype=np.int64)),
        "n": pa.array(last_counts, pa.int64()),
        "centroid_sum": pa.array(cents.sum(axis=1).astype(np.int64)),
    })
