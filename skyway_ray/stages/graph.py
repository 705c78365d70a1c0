"""Co-partitioned vertex-state graph rounds — the Pregel shape.

Round-4's graph family (sssp / hits / k-core peel / PageRank) held an
O(V) dense vertex vector on the driver and ``ray.put`` it every round:
fine while V is bounded, a scale-killer when V grows with the data
(V = n/12 for the derived graph).  This module replaces that design:

- **vertex state is a Dataset** of ``(node, val)`` int64 rows — it
  never lands on the driver and is never broadcast;
- **each round is a hash-bucket co-partition exchange**
  (:func:`stages.scan.hash_bucket_scan`): edges keyed by the gather
  endpoint union with the state rows, every key lands wholly in one
  bucket, the per-bucket function joins state→edges locally
  (vectorized ``np.searchsorted``) and emits *pre-combined* messages
  (one row per distinct target node per bucket — a combiner, so the
  follow-up node-keyed exchange moves ≤ |distinct nodes| rows, not
  |edges| rows);
- **driver-side state per round is O(1)** — a (count, sum) fingerprint
  for convergence checks, never the vector itself.

Per-bucket memory is bounded by ``rows_per_bucket`` regardless of V
(the bucket count auto-scales with the edge count), so the same loop
runs unchanged whether V is 200 or 10^10 — exactly the posture the
k-core docstring promised ("for unbounded V the degree pass and the
removal filter become a hash-bucket exchange + anti-join — same loop,
no broadcast").

Also hosts :func:`derived_graph_edges`, the ONE copy of the hub-skewed
derived-graph construction shared by q_sssp / q_hits / q_kcore /
q_assortativity (previously quadruplicated — a silent-desync hazard).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .scan import auto_n_buckets, hash_bucket_scan

__all__ = [
    "derived_graph_edges", "node_hash", "state_from_rows",
    "edge_state_messages", "combine_state", "state_fingerprint",
    "topk_state", "materialize_bounded",
]


def materialize_bounded(ds, n_rows: int, slack: int = 4):
    """Materialize ``ds``; if its block count has drifted past
    ``slack ×`` the size-tracked target (``map_groups`` emits blocks
    proportional to its INPUT blocks, so iterate-union-combine loops
    otherwise double the block count every round — measured 3 → 511
    blocks at constant 200 rows), repartition down and re-materialize.
    The conditional check keeps the common per-round cost at zero
    exchanges: the repartition only fires when fan-out actually
    accumulated."""
    out_blocks = auto_n_buckets(n_rows, floor=1)
    m = ds.materialize()
    if m.num_blocks() > slack * out_blocks:
        m = m.repartition(out_blocks).materialize()
    return m


def node_hash(x: np.ndarray, V: int) -> np.ndarray:
    """Quadratic-CDF node id in [0, V): low ids are hubs, so derived
    graphs are hub-skewed at every scale (same map the r4 oracle SQL
    replays via ``_kcore_node_sql``)."""
    h = (x.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    return (((h * h) >> np.uint64(32)) * np.uint64(V)
            >> np.uint64(32)).astype(np.int64)


def derived_graph_edges(sf_dir: str, *, directed: bool,
                        read, nrows) -> tuple:
    """The family's shared derived graph over ``events``: endpoints
    are ``node_hash`` of (user_id, event_id), self-loops drop, edges
    dedup on one pair-key hash exchange.  ``directed=False`` yields
    canonical (u=min, v=max) undirected pairs; ``directed=True``
    keeps u=user-node → v=event-node orientation.  ``read``/``nrows``
    are the caller's ``_read``/``_nrows`` (kept injectable so this
    stage has no import cycle with queries).  Returns
    ``(edges_dataset_materialized, V, n_events)``."""
    n = nrows(sf_dir, "events")
    V = max(200, n // 12)

    def prep(b: pa.Table) -> pa.Table:
        x = node_hash(b["user_id"].to_numpy(zero_copy_only=False), V)
        y = node_hash(b["event_id"].to_numpy(zero_copy_only=False), V)
        keep = x != y
        x, y = x[keep], y[keep]
        if not directed:
            x, y = np.minimum(x, y), np.maximum(x, y)
        return pa.table({"u": pa.array(x, pa.int64()),
                         "v": pa.array(y, pa.int64())})

    edges = hash_bucket_scan(
        read(sf_dir, "events", ["user_id", "event_id"]).map_batches(
            prep, batch_format="pyarrow"),
        ["u", "v"], lambda t: t.group_by(["u", "v"]).aggregate([]),
        n_rows=n).materialize()
    return edges, V, n


def state_from_rows(nodes, vals):
    """A (node, val) vertex-state Dataset from driver-side literals —
    only for O(1)-sized seeds (e.g. SSSP's single source)."""
    import ray.data

    return ray.data.from_arrow(pa.table({
        "node": pa.array(np.asarray(nodes, np.int64), pa.int64()),
        "val": pa.array(np.asarray(vals, np.int64), pa.int64())}))


def _lookup(nodes_sorted: np.ndarray, vals_sorted: np.ndarray,
            q: np.ndarray, default: int | None):
    """Vectorized state lookup: (values, found_mask) for query ids
    ``q`` against the bucket's sorted state arrays.  ``default``
    fills misses (None → caller must mask with ``found``)."""
    pos = np.searchsorted(nodes_sorted, q)
    pos_c = np.minimum(pos, max(len(nodes_sorted) - 1, 0))
    found = (len(nodes_sorted) > 0) & (nodes_sorted[pos_c] == q) \
        if len(nodes_sorted) else np.zeros(len(q), bool)
    out = np.where(found, vals_sorted[pos_c] if len(nodes_sorted)
                   else np.int64(0), np.int64(default or 0))
    return out, found


def edge_state_messages(edges, state, key: str, payload: list[str],
                        emit, n_rows: int, n_buckets: int | None = None,
                        rows_per_bucket: int | None = None):
    """ONE co-partition exchange of ``edges`` (keyed on int64 column
    ``key``) with vertex ``state`` (node, val): every bucket receives
    all its edges plus the state rows of exactly the nodes hashing
    there, and

        ``emit(key_arr, payload_arrays: dict, lookup) -> pa.Table``

    runs per bucket with ``lookup(q, default=None) -> (vals, found)``
    resolving state locally (no broadcast).  ``emit`` should return
    PRE-COMBINED ``(node, val)`` messages (group within the bucket) so
    the next node-keyed exchange moves bounded rows.  ``n_rows`` = the
    edge count (bucket sizing)."""
    if n_buckets is None:
        n_buckets = auto_n_buckets(n_rows) if rows_per_bucket is None \
            else auto_n_buckets(n_rows, rows_per_bucket)

    pay_t = [pa.int64()] * len(payload)

    def tag_edges(b: pa.Table) -> pa.Table:
        cols = {"k": b[key].combine_chunks().cast(pa.int64()),
                "_st": pa.array(np.zeros(len(b), np.int8), pa.int8())}
        for p in payload:
            cols[p] = b[p].combine_chunks().cast(pa.int64())
        cols["val"] = pa.array(np.zeros(len(b), np.int64), pa.int64())
        return pa.table(cols)

    def tag_state(b: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(len(b), np.int64), pa.int64())
        cols = {"k": b["node"].combine_chunks().cast(pa.int64()),
                "_st": pa.array(np.ones(len(b), np.int8), pa.int8())}
        for p, t in zip(payload, pay_t):
            cols[p] = z
        cols["val"] = b["val"].combine_chunks().cast(pa.int64())
        return pa.table(cols)

    u = (edges.map_batches(tag_edges, batch_format="pyarrow")
         .union(state.map_batches(tag_state, batch_format="pyarrow")))

    def per_bucket(t: pa.Table) -> pa.Table:
        st = t["_st"].to_numpy(zero_copy_only=False)
        k = t["k"].to_numpy(zero_copy_only=False)
        is_state = st == 1
        sn = k[is_state]
        sv = t["val"].to_numpy(zero_copy_only=False)[is_state]
        order = np.argsort(sn, kind="stable")
        sn, sv = sn[order], sv[order]
        ek = k[~is_state]
        pays = {p: t[p].to_numpy(zero_copy_only=False)[~is_state]
                for p in payload}

        def lookup(q, default=None):
            return _lookup(sn, sv, q, default)

        out = emit(ek, pays, lookup)
        return out if out is not None else pa.table(
            {"node": pa.array([], pa.int64()),
             "val": pa.array([], pa.int64())})

    return hash_bucket_scan(u, ["k"], lambda t: per_bucket(t),
                            n_buckets=n_buckets)


def combine_state(ds, op: str, n_rows: int, transform=None,
                  n_buckets: int | None = None):
    """Node-keyed exchange reducing (node, val) rows: per bucket an
    Arrow ``group_by(node).aggregate(val op)`` (op ∈ min/max/sum),
    then optional ``transform(vals: np.int64[]) -> np.int64[]``
    applied bucket-locally (for quantize / damping updates that need
    only scalars from the driver, never a vector).

    Output is repartitioned (in-plan, fused into the same execution)
    to a block count tracking the STATE size: ``map_groups`` emits
    blocks proportional to its INPUT block count, so an iterate-
    union-combine loop would otherwise double the state's block count
    every round (measured: 3 → 511 blocks in 8 rounds at constant
    200 rows).  The repartition moves ≤ |distinct nodes| rows, never
    edge-sized; measured cheaper in-plan than a conditional
    post-materialize repartition, which pays a second materialize
    whenever it fires — and in edge-fed loops it fires every round
    (use :func:`materialize_bounded` only where drift is RARE, e.g.
    k-core's shrinking edge set)."""
    if n_buckets is None:
        n_buckets = auto_n_buckets(n_rows)
    out_blocks = auto_n_buckets(n_rows, floor=1)

    def fn(t: pa.Table) -> pa.Table:
        g = (t.group_by(["node"]).aggregate([("val", op)])
             .rename_columns(["node", "val"]))
        if transform is not None:
            g = pa.table({"node": g["node"], "val": pa.array(
                transform(g["val"].to_numpy(zero_copy_only=False)
                          .astype(np.int64)), pa.int64())})
        return g

    return hash_bucket_scan(
        ds, ["node"], fn, n_buckets=n_buckets).repartition(out_blocks)


def state_fingerprint(state) -> tuple[int, int, int]:
    """O(1)-per-block driver fold: (row_count, sum(val), max(val)).
    Exact-int monotone fingerprint for convergence tests — for SSSP
    (vals only decrease, rows only appear) equality of (count, sum)
    ⟺ fixpoint."""

    def partial(b: pa.Table) -> pa.Table:
        v = b["val"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([len(b)], pa.int64()),
            "s": pa.array([int(v.sum()) if len(v) else 0], pa.int64()),
            "m": pa.array([int(v.max()) if len(v) else -(1 << 62)],
                          pa.int64())})

    p = state.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(p):
        return 0, 0, -(1 << 62)
    return (int(p["n"].sum()), int(p["s"].sum()), int(p["m"].max()))


def topk_state(state, k: int, pdf_sort) -> pd.DataFrame:
    """Global top-k of a (node, val) state without a full collect:
    per-block top-k partials (``pdf_sort`` orders a DataFrame best
    first), driver merges ≤ k·blocks rows."""

    def head(b: pd.DataFrame) -> pd.DataFrame:
        return pdf_sort(b).head(k)

    parts = state.map_batches(head, batch_format="pandas").to_pandas()
    return pdf_sort(parts).head(k).reset_index(drop=True)
