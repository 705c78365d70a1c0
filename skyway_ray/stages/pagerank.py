"""Distributed PageRank in exact integer (micro-unit) arithmetic.

Iterative graph computation with the 100 TB shape: the ONE data-sized
pass aggregates the raw event stream into a weighted edge table
(per-batch Arrow ``group_by`` partials → combiner tree, bounded by the
node-id space, not the stream); every power iteration then streams over
the *edge table* with the current rank vector broadcast (``ray.put`` of
two dense int64 arrays — node count is bounded by construction), emits
per-batch contribution partials, and tree-aggregates them.  Ranks never
shuffle; edges never leave the object store after the first pass.

Exactness: all arithmetic is integer — ranks live in micro-units,
per-edge contributions use floor division ``(r[src] * w) // outw[src]``
and the damping update is ``150_000 + (850_000 * s) // 1_000_000``
(α = 0.15 in micro-units).  Every quantity is order-independent
(integer sums), so results are bit-identical across partitionings and
a SQL oracle unrolling the same iterations matches exactly.  Mass lost
to floor rounding and dangling nodes is NOT redistributed — the oracle
defines the semantics, both sides mirror it.
"""

from __future__ import annotations

import numpy as np
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


def pagerank_micro(edge_ds, n_ids: int, iters: int = 3):
    """PageRank over a weighted edge Dataset with schema
    (src, dst, w), node ids in [0, n_ids).  Returns a pyarrow Table
    (node, rank_micro) over the distinct edge-endpoint universe —
    bounded by ``n_ids``, so driver-side state is fixed-size."""
    import ray

    edges = edge_ds.materialize()

    # bounded reductions: out-weight per src and the node universe
    ow_tab = tree_aggregate(
        edges.map_batches(
            lambda b: pa.table({"src": b["src"], "outw": b["w"]}),
            batch_format="pyarrow"),
        ["src"], [("outw", "sum")]).to_pandas()
    node_tab = tree_aggregate(
        edges.map_batches(
            lambda b: pa.table({
                "node": pa.concat_arrays(
                    [b["src"].combine_chunks().cast(pa.int64()),
                     b["dst"].combine_chunks().cast(pa.int64())]),
                "one": pa.array(np.ones(2 * b.num_rows, np.int64))}),
            batch_format="pyarrow"),
        ["node"], [("one", "sum")]).to_pandas()
    nodes = np.sort(node_tab["node"].to_numpy().astype(np.int64))

    outw = np.zeros(n_ids, np.int64)
    outw[ow_tab["src"].to_numpy().astype(np.int64)] = \
        ow_tab["outw"].to_numpy().astype(np.int64)
    ranks = np.zeros(n_ids, np.int64)
    ranks[nodes] = 1_000_000

    for _ in range(iters):
        state_ref = ray.put((ranks.copy(), outw))

        def contribs(b: pa.Table, ref=state_ref) -> pa.Table:
            r, ow = _cached(ref)
            src = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            w = b["w"].to_numpy(zero_copy_only=False).astype(np.int64)
            c = (r[src] * w) // np.maximum(ow[src], 1)
            t = pa.table({"dst": pa.array(dst), "c": pa.array(c)})
            g = t.group_by(["dst"]).aggregate([("c", "sum")])
            return g.rename_columns(["dst", "c"])

        s_tab = tree_aggregate(
            edges.map_batches(contribs, batch_format="pyarrow"),
            ["dst"], [("c", "sum")]).to_pandas()
        s = np.zeros(n_ids, np.int64)
        s[s_tab["dst"].to_numpy().astype(np.int64)] = \
            s_tab["c"].to_numpy().astype(np.int64)
        new = np.zeros(n_ids, np.int64)
        new[nodes] = 150_000 + (850_000 * s[nodes]) // 1_000_000
        ranks = new

    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "rank_micro": pa.array(ranks[nodes], pa.int64())})
