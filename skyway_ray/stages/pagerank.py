"""Distributed PageRank in exact integer (micro-unit) arithmetic —
co-partitioned vertex state (no broadcast, no driver-held vector).

Iterative graph computation with the 100 TB shape: the ONE data-sized
pass aggregates the raw event stream into a weighted edge table
(per-batch Arrow ``group_by`` partials → combiner tree, bounded by the
node-id space, not the stream).  Out-weights attach to the edge table
bucket-locally in a single src-keyed hash exchange (a src's edges all
land in one bucket, so ``outw`` is a bucket-local group sum), and the
weighted edge table is hash-bucket-published ONCE into object-store
shards (:func:`stages.graph.publish_edge_shards` — the rank state
covers the full endpoint universe every round, so the static path's
state buckets reach every edge shard).  Every power iteration is then
two STATE-sized exchanges over :mod:`stages.graph` primitives: the
src-bucketed rank state reads its edge shard in place and emits
pre-combined per-dst contribution sums
``(r[src] * w) // outw[src]``, and a node-keyed sum-combine applies
the damping update ``150_000 + (850_000 * s) // 1_000_000`` (α = 0.15
in micro-units) bucket-locally.  Ranks live as a (node, rank) Dataset
throughout — nothing O(V) ever reaches the driver or is ``ray.put``;
per-bucket memory is bounded by the scan budget at any V.

Exactness: all arithmetic is integer, every quantity order-independent
(integer sums), so results are bit-identical across partitionings and
a SQL oracle unrolling the same iterations matches exactly.  Mass lost
to floor rounding and dangling nodes is NOT redistributed — the oracle
defines the semantics, both sides mirror it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .graph import (bsp_round, combine_state, publish_edge_shards,
                    split_state_refs, transform_state_refs)
from .scan import hash_bucket_scan


def pagerank_micro(edge_ds, n_ids: int, iters: int = 3):
    """PageRank over a weighted edge Dataset with schema
    (src, dst, w), node ids in [0, n_ids).  Returns a Dataset of
    (node, rank_micro) over the distinct edge-endpoint universe —
    distributed state, so ``n_ids`` is only a bucket-sizing hint,
    not a driver-memory bound."""
    edges = edge_ds.materialize()
    E = edges.count()

    def attach_outw(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(src, kind="stable")
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        ss, ws = src[order], w[order]
        starts = np.flatnonzero(np.r_[True, ss[1:] != ss[:-1]])
        sums = np.add.reduceat(ws, starts) if len(ws) else ws
        gid = np.cumsum(np.r_[0, (ss[1:] != ss[:-1]).astype(np.int64)])
        outw = sums[gid][inv] if len(ws) else ws
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": t["dst"].combine_chunks().cast(pa.int64()),
            "w": pa.array(w, pa.int64()),
            "outw": pa.array(outw, pa.int64())})

    edges_ow = hash_bucket_scan(edges, ["src"], attach_outw,
                                n_rows=E)
    shards = publish_edge_shards(edges_ow, "src",
                                 ["dst", "w", "outw"], n_rows=E)

    def endpoints(t: pa.Table) -> pa.Table:
        uv = np.concatenate([
            t["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)])
        return pa.table({"node": pa.array(uv, pa.int64()),
                         "val": pa.array(np.zeros(len(uv), np.int64))})

    # universe with val=0: the zero base folded into every combine so
    # in-degree-0 nodes keep receiving the damping floor
    uni = split_state_refs(
        combine_state(edges.map_batches(endpoints,
                                        batch_format="pyarrow"),
                      "max", n_rows=n_ids),
        shards.n_buckets)

    state = transform_state_refs(
        uni, lambda v: np.full(len(v), 1_000_000, np.int64))

    def emit(ek, pays, lookup):
        r, _ = lookup(ek, default=0)
        c = (r * pays["w"]) // np.maximum(pays["outw"], 1)
        t = pa.table({"node": pa.array(pays["dst"], pa.int64()),
                      "val": pa.array(c, pa.int64())})
        return (t.group_by(["node"]).aggregate([("val", "sum")])
                .rename_columns(["node", "val"]))

    def damp(s: np.ndarray) -> np.ndarray:
        return 150_000 + (850_000 * s) // 1_000_000

    for _ in range(iters):
        state, _ = bsp_round(shards, state, "src",
                             ["dst", "w", "outw"], emit, "sum",
                             transform=damp, base_refs=uni)

    import ray.data

    return ray.data.from_arrow_refs(list(state.values())).map_batches(
        lambda t: pa.table({"node": t["node"], "rank_micro": t["val"]}),
        batch_format="pyarrow")
