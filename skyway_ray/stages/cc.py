"""Distributed connected components over an edge Dataset.

Two paths, switched on edge count:

* ``n_edges ≤ small_graph_limit`` (default 5M ≈ 80 MB): ONE Ray task
  runs a vectorized label-propagation union-find over the edge arrays
  (numpy pointer jumping — no Python loop over edges).  Candidate
  graphs from LSH dedup are ≪ corpus size, so this is the common case;
  the work happens on a worker, never the driver.
* larger graphs: Hash-to-Min star contraction (Rastogi et al.,
  "Finding Connected Components in Map-Reduce in Logarithmic Rounds",
  ICDE 2013 — public algorithm): each round, every node u with
  neighborhood N(u) sends m = min(N(u) ∪ {u}) to all of N(u) ∪ {u};
  the deduped (m, v) pairs are the next edge set.  Components converge
  to stars centered at their minimum node in O(log d) rounds.  Pure
  Dataset groupbys — per-round cost is a shuffle of the (small) edge
  set; convergence is a cheap order-independent checksum aggregate.

Either way the result is the converged star edge set
(doc_a = component-min center, doc_b = member ≠ center) and no
unbounded state ever lands on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MIX = np.uint64(0x9E3779B97F4A7C15)
SMALL_GRAPH_LIMIT = 5_000_000


def _label_propagate(a: np.ndarray, b: np.ndarray) -> pa.Table:
    """Vectorized union-find: min-label propagation with pointer
    jumping until fixpoint.  O((E+V) log V) array ops, no Python loop
    over edges."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[:len(a)], inv[len(a):]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        before = label
        la = np.minimum(label[ia], label[ib])
        nxt = label.copy()
        np.minimum.at(nxt, ia, la)
        np.minimum.at(nxt, ib, la)
        nxt = nxt[nxt]  # pointer jumping halves chain depth
        if np.array_equal(nxt, before):
            break
        label = nxt
    member = np.flatnonzero(label != np.arange(len(nodes)))
    return pa.table({
        "doc_a": nodes[label[member]].astype(np.int64),
        "doc_b": nodes[member].astype(np.int64),
    })


def _cc_small(edges):
    """One-task union-find over the materialized edge blocks."""
    import ray
    import ray.data

    @ray.remote
    def task(refs):
        a_parts, b_parts = [], []
        for r in refs:
            tb = ray.get(r)
            if not len(tb):  # empty blocks may carry a zero-column schema
                continue
            col = (lambda c: tb[c].to_numpy(zero_copy_only=False)
                   if isinstance(tb, pa.Table) else tb[c].to_numpy())
            a_parts.append(col("doc_a").astype(np.int64))
            b_parts.append(col("doc_b").astype(np.int64))
        a = np.concatenate(a_parts) if a_parts else np.empty(0, np.int64)
        b = np.concatenate(b_parts) if b_parts else np.empty(0, np.int64)
        if not len(a):
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        return _label_propagate(a, b)

    refs = [ref for bundle in edges.iter_internal_ref_bundles()
            for ref in bundle.block_refs]
    out = ray.get(task.remote(refs))
    return ray.data.from_arrow(out)


def _checksum(edges) -> tuple[int, int, int]:
    """(row count, xor digest, sum digest) of an edge Dataset
    — one streaming aggregate, no driver materialization."""

    def partial(b: pa.Table) -> pa.Table:
        a = b["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        c = b["doc_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((a * _MIX) ^ c) & np.uint64(0x7FFFFFFFFFFFFFFF)
        if not len(b):
            return pa.table({"n": [0], "x": [0], "s": [0]})
        # two independent order-free digests (xor + wrapping sum) —
        # a collision would terminate the rounds early, so make it
        # ~2^-122 instead of ~2^-63
        return pa.table({
            "n": [len(b)],
            "x": [int(np.bitwise_xor.reduce(h))],
            "s": [int(np.sum(h, dtype=np.uint64)
                      & np.uint64(0x7FFFFFFFFFFFFFFF))],
        })

    parts = edges.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return (0, 0, 0)
    return (int(parts["n"].sum()),
            int(np.bitwise_xor.reduce(parts["x"].to_numpy().astype(np.uint64))),
            int(np.sum(parts["s"].to_numpy().astype(np.uint64),
                       dtype=np.uint64) & np.uint64(0x7FFFFFFFFFFFFFFF)))


def _star_round(g: pd.DataFrame) -> pd.DataFrame:
    """One node's Hash-to-Min emission: grouped rows are (node, nbr)."""
    u = int(g["node"].iloc[0])
    nbrs = g["nbr"].to_numpy()
    m = int(min(nbrs.min(), u))
    members = np.unique(np.append(nbrs, u))
    members = members[members != m]
    return pd.DataFrame({"doc_a": np.full(len(members), m, dtype=np.int64),
                         "doc_b": members.astype(np.int64)})


def _symmetrize(b: pa.Table) -> pa.Table:
    a = b["doc_a"].to_numpy(zero_copy_only=False)
    c = b["doc_b"].to_numpy(zero_copy_only=False)
    return pa.table({"node": np.concatenate([a, c]),
                     "nbr": np.concatenate([c, a])})


def _dedupe_edges(edges):
    return (edges.groupby(["doc_a", "doc_b"]).count()
            .select_columns(["doc_a", "doc_b"]))


def connected_components(edges, max_rounds: int = 16,
                         small_graph_limit: int = SMALL_GRAPH_LIMIT):
    """Edge Dataset (doc_a, doc_b) → converged star edges
    (doc_a = component-min center, doc_b = member ≠ center).

    ``doc_b`` of the result enumerates every non-representative node
    exactly once — the "loser" set for dedup.  int64 node ids;
    returns a materialized (small) Dataset.  Set
    ``small_graph_limit=0`` to force the distributed rounds.

    Raises ``RuntimeError`` if the Hash-to-Min rounds exhaust
    ``max_rounds`` without the checksum stabilizing: downstream dedup
    treats ``doc_b`` as the complete loser set, so silently returning a
    non-converged edge set would KEEP duplicate cluster members.
    Convergence needs O(log d) rounds (d = component diameter), so the
    default 16 covers diameters up to ~2^16 chain hops; rounds are
    cheap once edges are near-stars.
    """
    edges = _dedupe_edges(edges).materialize()
    prev = _checksum(edges)
    if prev[0] == 0:
        return edges
    if prev[0] <= small_graph_limit:
        return _cc_small(edges)
    for _ in range(max_rounds):
        sym = edges.map_batches(_symmetrize, batch_format="pyarrow")
        edges = (sym.groupby("node")
                 .map_groups(_star_round, batch_format="pandas"))
        edges = _dedupe_edges(edges).materialize()
        cur = _checksum(edges)
        if cur == prev:
            return edges
        prev = cur
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds "
        f"({prev[0]} edges at exit) — raise max_rounds; a truncated "
        "result would silently keep duplicate cluster members")
