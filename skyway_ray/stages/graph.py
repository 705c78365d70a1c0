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

from .scan import auto_n_buckets, hash_bucket_scan, int_bucket_ids

__all__ = [
    "derived_graph_edges", "node_hash", "state_from_rows",
    "edge_state_messages", "combine_state", "state_fingerprint",
    "topk_state", "materialize_bounded", "publish_edge_shards",
    "ShardDirectory", "split_state_refs", "bsp_round",
    "transform_state_refs", "state_refs_to_table", "topk_state_refs",
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


def publish_edge_shards(edges, key: str, payload: list[str],
                        n_rows: int, n_buckets: int | None = None):
    """Hash-partition a STATIC edge set ONCE into worker-published
    object-store shards, so every subsequent Pregel round moves only
    state rows (the :func:`stages.knn.build_sharded_knn` directory
    pattern applied to iterative graph compute).

    :func:`edge_state_messages` re-exchanges the full edge set every
    round — correct, but at R rounds the exchange volume is R·|E| even
    though the topology never changes.  Here ONE ``hash_bucket_scan``
    groups edges by ``int_bucket_ids(key)`` — the exact bucket function
    the per-round state exchange will use, so shard b holds precisely
    the edges whose gather endpoint hashes to state bucket b — and each
    bucket's worker ``ray.put``s its shard (int64 numpy columns:
    ``key`` + ``payload``) and emits one tiny ``(bucket, ref)``
    directory row.  Per-round network is then O(|state|) + a one-time
    per-node shard pull that plasma caches; at 100 TB the edges never
    travel again after the publish.

    Shard objects are DRIVER-OWNED task returns, never worker-side
    ``ray.put``s: the bucket-grouped edge blocks stay in the object
    store (a materialized Dataset — blocks are distributed, nothing
    edge-sized reaches the driver), the driver reads only the block
    refs plus a tiny per-block bucket-id list, and one raw Ray task
    per (block, bucket) slices that bucket's rows out in place.  Task
    returns are owned by the submitting driver and lineage-
    reconstructable, so the shards survive worker churn and cannot be
    garbage-collected while the returned handle lives.  (A worker-
    ``ray.put`` design — the sharded-kNN shape — was tried first and
    intermittently lost shards mid-loop: refs that ride through Ray
    Data blocks to the driver never hold a durable claim, so the
    owning workers deleted them; see ShardDirectory.)  Returns a
    :class:`ShardDirectory` — the driver must keep it in scope for as
    long as rounds run."""
    import ray

    if n_buckets is None:
        n_buckets = auto_n_buckets(n_rows)
    cols = [key] + payload

    def add_bucket(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "_eb", pa.array(int_bucket_ids([k], n_buckets), pa.int64()))

    mat = (edges.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("_eb").map_groups(lambda t: t,
                                      batch_format="pyarrow")
           .materialize())

    @ray.remote
    def buckets_in(block: pa.Table) -> np.ndarray:
        # group-by occasionally emits an empty block with an EMPTY
        # schema (no columns at all) — skip it
        if not len(block) or "_eb" not in block.column_names:
            return np.array([], np.int64)
        return np.unique(block["_eb"].to_numpy(zero_copy_only=False))

    @ray.remote
    def extract(block: pa.Table, b: int) -> dict:
        m = block["_eb"].to_numpy(zero_copy_only=False) == b
        return {c: np.ascontiguousarray(
            block[c].to_numpy(zero_copy_only=False).astype(np.int64)[m])
            for c in cols}

    block_refs = [r for bundle in mat.iter_internal_ref_bundles()
                  for r in bundle.block_refs]
    present = ray.get([buckets_in.remote(r) for r in block_refs])
    directory: dict[int, list] = {}
    for r, bs in zip(block_refs, present):
        for b in bs:
            directory.setdefault(int(b), []).append(
                extract.remote(r, int(b)))
    return ShardDirectory(directory, n_buckets, mat)


class ShardDirectory:
    """Handle for a published shard set: ``directory`` maps
    ``bucket -> [shard refs]``, every ref a DRIVER-owned task return.
    The refs travel to the consuming workers as ACTOR CONSTRUCTOR
    ARGS (``fn_constructor_args``) — in-band through actor creation,
    pinned for the actor's lifetime.  Channels that do NOT work in
    this Ray version, all observed raising
    ReferenceCountingAssertionError / losing the objects under load:
    worker-side ``ray.put`` shards whose refs ride Ray Data blocks to
    the driver (no durable claim — owners deleted them mid-loop),
    ``ray.put(directory)`` + worker re-get of the nested refs, and
    closure capture inside a Ray Data UDF (the transform function is
    pickled outside the core-worker serialization context).  The
    directory is O(n_buckets) refs; ``_mat`` keeps the source blocks
    alive so a lost shard is lineage-reconstructable.  At extreme
    bucket counts raise ``rows_per_bucket`` rather than letting
    n_buckets grow unbounded."""

    def __init__(self, directory: dict, n_buckets: int, mat=None):
        self.directory = directory
        self.n_buckets = n_buckets
        self._mat = mat

    def __reduce__(self):
        # workers need only the refs; never ship the source Dataset
        return (ShardDirectory, (self.directory, self.n_buckets))


_EMPTY_STATE = None


def _empty_state() -> pa.Table:
    global _EMPTY_STATE
    if _EMPTY_STATE is None:
        _EMPTY_STATE = pa.table({"node": pa.array([], pa.int64()),
                                 "val": pa.array([], pa.int64())})
    return _EMPTY_STATE


def split_state_refs(state, n_buckets: int) -> dict:
    """Bucket-partition a (node, val) state into driver-owned
    per-bucket Arrow blocks: ``{bucket -> ObjectRef[pa.Table]}``
    (missing bucket = empty).  ``state`` is a pa.Table (seeds — split
    locally, ``ray.put`` per bucket, driver-owned) or a Dataset (two
    raw-task waves over its materialized block refs: per-block
    ``num_returns=n_buckets`` split, then per-bucket concat —
    edge-sized data never touches the driver)."""
    import ray

    if isinstance(state, pa.Table):
        k = state["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        sb = int_bucket_ids([k], n_buckets)
        return {int(b): ray.put(state.filter(pa.array(sb == b)))
                for b in np.unique(sb)}

    mat = state.materialize()
    block_refs = [r for bundle in mat.iter_internal_ref_bundles()
                  for r in bundle.block_refs]

    @ray.remote
    def split(block: pa.Table) -> tuple:
        if not len(block) or "node" not in block.column_names:
            return tuple(_empty_state() for _ in range(n_buckets))
        k = block["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        sb = int_bucket_ids([k], n_buckets)
        return tuple(block.select(["node", "val"])
                     .filter(pa.array(sb == b))
                     for b in range(n_buckets))

    @ray.remote
    def concat(*tabs) -> pa.Table:
        tabs = [t for t in tabs if len(t)]
        return pa.concat_tables(tabs) if tabs else _empty_state()

    frag_cols = [split.options(num_returns=n_buckets).remote(r)
                 for r in block_refs]
    if not frag_cols:
        return {}
    if n_buckets == 1:  # num_returns=1 yields a bare ref
        frag_cols = [[f] for f in frag_cols]
    return {b: concat.remote(*[col[b] for col in frag_cols])
            for b in range(n_buckets)}


def bsp_round(shard_dir: "ShardDirectory", state_refs: dict, key: str,
              payload: list[str], emit, op: str, transform=None,
              base_refs: dict | None = None) -> tuple:
    """One Pregel superstep as two waves of raw driver-owned tasks —
    no Ray Data job, no actor pool, no edge movement:

    1. GATHER-SCATTER: per non-empty state bucket, one task reads the
       bucket's pre-published edge shard(s) in place (top-level args —
       plasma-local, zero-copy), runs the caller's
       ``emit(key_arr, payload_arrays, lookup)`` (the
       :func:`edge_state_messages` contract), and scatters the
       pre-combined (node, val) messages into ``n_buckets`` return
       fragments by target-node hash.
    2. COMBINE: per bucket, one task folds its incoming fragments
       (plus ``base_refs[bucket]`` — pass ``state_refs`` for SSSP's
       union-with-state, a zero-base universe for PageRank, or None)
       with an Arrow ``group_by(node).aggregate(val op)``, applies the
       optional bucket-local ``transform(vals)``, and returns the new
       state block plus an O(1) (count, sum, max) fingerprint.

    Returns ``(new_state_refs, (count, sum, max))`` — only the tiny
    fingerprints are ``ray.get``; state stays in the object store.
    Driver bookkeeping is O(n_buckets²) fragment refs per round (the
    BSP tradeoff — size ``rows_per_bucket`` so n_buckets stays in the
    thousands).  All refs are task returns owned by the driver:
    lineage-reconstructable, immune to the worker-owned-put GC races
    that broke the first two designs (see :class:`ShardDirectory`)."""
    import ray

    nb = shard_dir.n_buckets

    @ray.remote
    def gather(state_block: pa.Table, *shards) -> tuple:
        sn = state_block["node"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        sv = state_block["val"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.argsort(sn, kind="stable")
        sn, sv = sn[order], sv[order]
        ek = np.concatenate([s[key] for s in shards])
        pays = {p: np.concatenate([s[p] for s in shards])
                for p in payload}

        def lookup(q, default=None):
            return _lookup(sn, sv, q, default)

        out = emit(ek, pays, lookup)
        if out is None or not len(out):
            return tuple(_empty_state() for _ in range(nb))
        tb = int_bucket_ids(
            [out["node"].to_numpy(zero_copy_only=False)], nb)
        return tuple(out.filter(pa.array(tb == c)) for c in range(nb))

    @ray.remote(num_returns=2)
    def combine(*tabs) -> tuple:
        tabs = [t for t in tabs if t is not None and len(t)]
        if not tabs:
            return _empty_state(), (0, 0, -(1 << 62))
        g = (pa.concat_tables(tabs).group_by(["node"])
             .aggregate([("val", op)]).rename_columns(["node", "val"]))
        if transform is not None:
            g = pa.table({"node": g["node"], "val": pa.array(
                transform(g["val"].to_numpy(zero_copy_only=False)
                          .astype(np.int64)), pa.int64())})
        v = g["val"].to_numpy(zero_copy_only=False)
        return g, (len(g), int(v.sum()), int(v.max()))

    frags: dict[int, list] = {}
    for b, sref in state_refs.items():
        shard_refs = shard_dir.directory.get(b, [])
        if not shard_refs:
            continue  # state here, no edges gathering here
        outs = gather.options(num_returns=nb).remote(sref, *shard_refs)
        if nb == 1:
            outs = [outs]
        for c, ref in enumerate(outs):
            frags.setdefault(c, []).append(ref)

    new_refs, fp_refs = {}, []
    for c in range(nb):
        inputs = list(frags.get(c, []))
        if base_refs is not None and c in base_refs:
            inputs.append(base_refs[c])
        if not inputs:
            continue
        block_ref, fp_ref = combine.remote(*inputs)
        new_refs[c] = block_ref
        fp_refs.append(fp_ref)

    fps = ray.get(fp_refs)
    n = sum(f[0] for f in fps)
    s = sum(f[1] for f in fps)
    m = max((f[2] for f in fps), default=-(1 << 62))
    return new_refs, (n, s, m)


def transform_state_refs(state_refs: dict, fn) -> dict:
    """One tiny task per bucket applying ``fn(vals) -> vals`` to a
    bucket-partitioned state (e.g. HITS' post-matvec quantization with
    a driver-known scalar)."""
    import ray

    @ray.remote
    def apply(t: pa.Table) -> pa.Table:
        if not len(t):
            return t
        return pa.table({"node": t["node"], "val": pa.array(
            fn(t["val"].to_numpy(zero_copy_only=False)
               .astype(np.int64)), pa.int64())})

    return {b: apply.remote(r) for b, r in state_refs.items()}


def state_refs_to_table(state_refs: dict) -> pa.Table:
    """Driver collect of a bucket-partitioned state — only for final
    query outputs whose contract is a driver-side frame."""
    import ray

    tabs = [t for t in ray.get(list(state_refs.values())) if len(t)]
    return pa.concat_tables(tabs) if tabs else _empty_state()


def topk_state_refs(state_refs: dict, k: int, pdf_sort) -> pd.DataFrame:
    """Global top-k of a bucket-partitioned state without a full
    collect: one tiny task per bucket returns its local top-k
    (``pdf_sort`` orders a DataFrame best first), the driver merges
    ≤ k·n_buckets rows — the raw-task sibling of :func:`topk_state`."""
    import ray

    @ray.remote
    def head(t: pa.Table) -> pd.DataFrame:
        return pdf_sort(t.to_pandas()).head(k)

    parts = ray.get([head.remote(r) for r in state_refs.values()])
    return (pdf_sort(pd.concat(parts)) if parts else pd.DataFrame(
        {"node": [], "val": []})).head(k).reset_index(drop=True)


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
