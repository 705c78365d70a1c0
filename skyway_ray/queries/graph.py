"""graph query family (split from the former single-file queries module)."""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo.cells import cell_id, cell_sql
from ..geo.tiles import tile_sql, tile_xy
from ._common import (
    _KCORE_K,
    _KCORE_ROUNDS,
    _SSSP_ROUNDS,
    _kcore_node_sql,
    _nrows,
    _read,
)




def q_pagerank(sf_dir: str):
    """3-iteration PageRank over the (user_id%1000 → event_id%1000)
    interaction graph in exact micro-unit integer arithmetic
    (stages/pagerank.py): one data-sized pass builds the weighted edge
    table; each iteration is two hash-bucket co-partition exchanges
    with the rank state as a (node, rank) Dataset — no broadcast, no
    driver-held vector — bit-identical to the unrolled SQL."""
    import ray.data

    from ..stages.agg_tree import tree_aggregate
    from ..stages.pagerank import pagerank_micro

    def edge_partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "src": pa.array(
                b["user_id"].to_numpy(zero_copy_only=False) % 1000),
            "dst": pa.array(
                b["event_id"].to_numpy(zero_copy_only=False) % 1000),
            "w": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by(["src", "dst"]).aggregate([("w", "sum")])
        return g.rename_columns(["src", "dst", "w"])

    ds = _read(sf_dir, "events", ["user_id", "event_id"])
    edges = tree_aggregate(ds.map_batches(edge_partial,
                                          batch_format="pyarrow"),
                           ["src", "dst"], [("w", "sum")])
    return pagerank_micro(edges, n_ids=1000, iters=3)


def q_pagerank_sql() -> str:
    step = (
        "SELECT n.node, CAST(150000 + (850000 * COALESCE(s.c, 0)) "
        "// 1000000 AS BIGINT) AS r FROM n LEFT JOIN ("
        "SELECT e.dst AS node, sum(({prev}.r * e.w) // ow.outw) AS c "
        "FROM e JOIN {prev} ON {prev}.node = e.src "
        "JOIN ow ON ow.src = e.src GROUP BY 1) s ON s.node = n.node"
    )
    return (
        "WITH e AS (SELECT user_id % 1000 AS src, event_id % 1000 AS dst, "
        "count(*) AS w FROM events GROUP BY 1, 2), "
        "ow AS (SELECT src, sum(w) AS outw FROM e GROUP BY 1), "
        "n AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e)), "
        "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n), "
        f"r1 AS ({step.format(prev='r0')}), "
        f"r2 AS ({step.format(prev='r1')}), "
        f"r3 AS ({step.format(prev='r2')}) "
        "SELECT node, r AS rank_micro FROM r3"
    )


def _triangle_partials(sf_dir: str, all_corners: bool = False):
    """Shared triangle-counting pipeline on the derived 400-node graph
    (u = user_id%400 — v = event_id%400 edges): the compact-forward /
    MapReduce shape with DEGREE orientation — every undirected edge
    points from its lower-(degree, id) endpoint, which bounds wedge
    fan-out to O(√m) per node on skewed graphs (the id-oriented
    variant explodes at hub nodes).  Stages: distinct edges via one
    pair-key exchange; bounded degree table on the combiner tree →
    tiny rank array broadcast; wedge generation co-partitioned on the
    anchor (vectorized grouped pair-expansion over rank-sorted
    out-neighbourhoods, no per-node loop); a final co-partition of
    wedges ∪ oriented edges on the closing pair with a
    sorted-membership probe.  With ``all_corners=False`` each triangle
    counts exactly once, at its minimum-rank vertex (q_triangles);
    with ``all_corners=True`` every closed wedge credits all THREE
    corners (the per-vertex counts of q_clustering_coeff).  Returns
    ``(tri_ds, deg_full)``: the tree-aggregated (node, tri) Dataset
    and the dense V-sized degree vector (bounded — V = 400).
    Reference-free addition."""
    import ray.data

    from ..stages.agg_tree import tree_aggregate, tree_aggregate_to_table
    from ..stages.scan import hash_bucket_scan

    V = 400
    n_ev = _nrows(sf_dir, "events")

    def prep(b: pa.Table) -> pa.Table:
        x = b["user_id"].to_numpy(zero_copy_only=False) % V
        y = b["event_id"].to_numpy(zero_copy_only=False) % V
        keep = x != y
        x, y = x[keep], y[keep]
        return pa.table({"u": pa.array(np.minimum(x, y), pa.int64()),
                         "v": pa.array(np.maximum(x, y), pa.int64())})

    def distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["u", "v"]).aggregate([])

    edges = hash_bucket_scan(
        _read(sf_dir, "events", ["user_id", "event_id"]).map_batches(
            prep, batch_format="pyarrow"),
        ["u", "v"], distinct, n_rows=n_ev).materialize()

    # (degree, id) rank per node: the degree table is bounded by V, so
    # it rides the combiner tree and the rank array broadcasts as a
    # tiny dense vector (closure-captured — 400 ints)
    deg_tab = tree_aggregate_to_table(
        edges.map_batches(
            lambda t: pa.table({
                "node": pa.array(np.concatenate(
                    [t["u"].to_numpy(zero_copy_only=False),
                     t["v"].to_numpy(zero_copy_only=False)]), pa.int64()),
                "deg": pa.array(np.ones(2 * len(t), np.int64), pa.int64())}),
            batch_format="pyarrow"),
        ["node"], [("deg", "sum")])
    deg_full = np.zeros(V, np.int64)
    deg_full[deg_tab["node"].to_numpy(zero_copy_only=False)] = \
        deg_tab["deg"].to_numpy(zero_copy_only=False)
    order = np.lexsort((np.arange(V, dtype=np.int64), deg_full))
    rank = np.empty(V, np.int64)
    rank[order] = np.arange(V, dtype=np.int64)

    def orient(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        lo_first = rank[u] < rank[v]
        return pa.table({
            "a": pa.array(np.where(lo_first, u, v), pa.int64()),
            "b": pa.array(np.where(lo_first, v, u), pa.int64())})

    oriented = edges.map_batches(orient, batch_format="pyarrow")

    def wedges(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        v = t["b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((rank[v], a))   # out-neighbours rank-sorted
        a, v = a[order], v[order]
        new_a = np.ones(len(a), dtype=bool)
        new_a[1:] = a[1:] != a[:-1]
        sizes = np.diff(np.append(np.flatnonzero(new_a), len(a)))
        # local index i within each a-segment pairs with the s-1-i
        # following out-neighbours: (p, q) with rank(p) < rank(q)
        loc = np.arange(len(a), dtype=np.int64) - np.repeat(
            np.cumsum(sizes) - sizes, sizes)
        rep = np.repeat(sizes, sizes) - 1 - loc
        b_idx = np.repeat(np.arange(len(a), dtype=np.int64), rep)
        ar = np.arange(int(rep.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(rep) - rep, rep)
        c_idx = b_idx + ar + 1
        return pa.table({"p": pa.array(v[b_idx], pa.int64()),
                         "q": pa.array(v[c_idx], pa.int64()),
                         "a": pa.array(a[b_idx], pa.int64())})

    wedge_ds = hash_bucket_scan(oriented, ["a"], wedges,
                                n_rows=edges.count())
    edge_rows = oriented.map_batches(
        lambda t: pa.table({"p": t["a"], "q": t["b"],
                            "a": pa.array(np.full(len(t), -1, np.int64()),
                                          pa.int64())}),
        batch_format="pyarrow")

    def close(t: pa.Table) -> pa.Table:
        p = t["p"].to_numpy(zero_copy_only=False)
        q = t["q"].to_numpy(zero_copy_only=False)
        a = t["a"].to_numpy(zero_copy_only=False)
        key = p * np.int64(V + 1) + q
        is_edge = a < 0
        ek = np.sort(key[is_edge])
        wk, wa = key[~is_edge], a[~is_edge]
        pos = np.searchsorted(ek, wk)
        hit = (pos < len(ek))
        hit[hit] = ek[pos[hit]] == wk[hit]
        if all_corners:
            nodes = np.concatenate([wa[hit], wk[hit] // np.int64(V + 1),
                                    wk[hit] % np.int64(V + 1)])
        else:
            nodes = wa[hit]
        t2 = pa.table({"node": pa.array(nodes, pa.int64()),
                       "tri": pa.array(np.ones(len(nodes), np.int64))})
        g = t2.group_by(["node"]).aggregate([("tri", "sum")])
        return g.rename_columns(["node", "tri"])

    unioned = wedge_ds.union(edge_rows)
    partials = hash_bucket_scan(unioned, ["p", "q"], close,
                                n_rows=n_ev)
    return (tree_aggregate(partials, ["node"], [("tri", "sum")]),
            deg_full)


def q_triangles(sf_dir: str):
    """Global triangle counts per minimum-rank vertex — see
    _triangle_partials for the distributed shape; the oracle orders
    by the same (degree, id) rank."""
    tri_ds, _ = _triangle_partials(sf_dir, all_corners=False)
    return tri_ds


def q_clustering_coeff(sf_dir: str):
    """LOCAL CLUSTERING COEFFICIENT per vertex of the derived
    400-node graph: every closed wedge credits all three corners
    (so tri_v = triangles through v), joined with the degree table
    and pinned as the exact integer ``cc_micro = 2·10^6·tri_v //
    (deg_v·(deg_v−1))``.  The (node, tri) fold is bounded by V = 400
    so the final join is a driver-side array lookup; for unbounded V
    it becomes one more hash-bucket co-partition of the tri table
    against the degree table (the q_sssp exchange shape).  Emits only
    vertices on ≥ 1 triangle (deg ≥ 2 is implied); oracle = the
    triangles SQL with the three corner projections unioned before
    the per-node count."""
    tri_ds, deg_full = _triangle_partials(sf_dir, all_corners=True)
    d = tri_ds.to_pandas()  # bounded: ≤ V rows
    node = d["node"].to_numpy().astype(np.int64)
    tri = d["tri"].to_numpy().astype(np.int64)
    deg = deg_full[node]
    cc = (np.int64(2_000_000) * tri) // (deg * (deg - 1))
    return pd.DataFrame({"node": node, "tri": tri, "deg": deg,
                         "cc_micro": cc})


def q_triangles_sql() -> str:
    return (
        "WITH raw AS (SELECT user_id % 400 AS x, event_id % 400 AS y "
        "FROM events), "
        "e AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v "
        "FROM raw WHERE x <> y), "
        "d AS (SELECT node, count(*) AS deg FROM "
        "(SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e) "
        "GROUP BY node), "
        "o AS (SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg "
        "AND e.u < e.v) THEN e.u ELSE e.v END AS a, "
        "CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v) "
        "THEN e.v ELSE e.u END AS b "
        "FROM e JOIN d du ON du.node = e.u JOIN d dv ON dv.node = e.v) "
        "SELECT o1.a AS node, CAST(count(*) AS BIGINT) AS tri "
        "FROM o o1 JOIN o o2 ON o2.a = o1.a "
        "JOIN d d1 ON d1.node = o1.b JOIN d d2 ON d2.node = o2.b "
        "JOIN o o3 ON o3.a = o1.b AND o3.b = o2.b "
        "WHERE d1.deg < d2.deg OR (d1.deg = d2.deg AND o1.b < o2.b) "
        "GROUP BY o1.a"
    )


def q_clustering_coeff_sql() -> str:
    return (
        "WITH raw AS (SELECT user_id % 400 AS x, event_id % 400 AS y "
        "FROM events), "
        "e AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v "
        "FROM raw WHERE x <> y), "
        "d AS (SELECT node, count(*) AS deg FROM "
        "(SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e) "
        "GROUP BY node), "
        "o AS (SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg "
        "AND e.u < e.v) THEN e.u ELSE e.v END AS a, "
        "CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v) "
        "THEN e.v ELSE e.u END AS b "
        "FROM e JOIN d du ON du.node = e.u JOIN d dv ON dv.node = e.v), "
        "t AS (SELECT o1.a AS n1, o1.b AS n2, o2.b AS n3 "
        "FROM o o1 JOIN o o2 ON o2.a = o1.a "
        "JOIN d d1 ON d1.node = o1.b JOIN d d2 ON d2.node = o2.b "
        "JOIN o o3 ON o3.a = o1.b AND o3.b = o2.b "
        "WHERE d1.deg < d2.deg OR (d1.deg = d2.deg AND o1.b < o2.b)), "
        "tc AS (SELECT node, count(*) AS tri FROM "
        "(SELECT n1 AS node FROM t UNION ALL SELECT n2 FROM t "
        "UNION ALL SELECT n3 FROM t) GROUP BY 1) "
        "SELECT tc.node, CAST(tc.tri AS BIGINT) AS tri, "
        "CAST(d.deg AS BIGINT) AS deg, "
        "CAST(2000000 * tc.tri // (d.deg * (d.deg - 1)) AS BIGINT) "
        "AS cc_micro FROM tc JOIN d ON d.node = tc.node"
    )


def q_degree_hist(sf_dir: str):
    """Degree distribution of the derived 400-node graph (the
    q_triangles edge set): distinct id-oriented edges via one pair-key
    hash exchange, per-node degrees and the degree histogram both on
    the combiner tree (node space and degree range are bounded by the
    400-node domain).  Exact ints throughout."""
    from ..stages.agg_tree import tree_aggregate, tree_aggregate_to_table
    from ..stages.scan import hash_bucket_scan

    V = 400

    def prep(b: pa.Table) -> pa.Table:
        x = b["user_id"].to_numpy(zero_copy_only=False) % V
        y = b["event_id"].to_numpy(zero_copy_only=False) % V
        keep = x != y
        x, y = x[keep], y[keep]
        return pa.table({"u": pa.array(np.minimum(x, y), pa.int64()),
                         "v": pa.array(np.maximum(x, y), pa.int64())})

    edges = hash_bucket_scan(
        _read(sf_dir, "events", ["user_id", "event_id"]).map_batches(
            prep, batch_format="pyarrow"),
        ["u", "v"], lambda t: t.group_by(["u", "v"]).aggregate([]),
        n_rows=_nrows(sf_dir, "events"))

    def endpoints(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(np.concatenate([u, v]), pa.int64()),
            "deg": pa.array(np.ones(2 * len(t), np.int64), pa.int64())})

    deg_tab = tree_aggregate_to_table(
        edges.map_batches(endpoints, batch_format="pyarrow"),
        ["node"], [("deg", "sum")])
    deg = deg_tab["deg"].to_numpy(zero_copy_only=False)
    uniq, counts = np.unique(deg, return_counts=True)
    return pd.DataFrame({"deg": uniq.astype(np.int64),
                         "n_nodes": counts.astype(np.int64)})


def q_degree_hist_sql() -> str:
    return (
        "WITH raw AS (SELECT user_id % 400 AS x, event_id % 400 AS y "
        "FROM events), "
        "e AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v "
        "FROM raw WHERE x <> y), "
        "d AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM "
        "(SELECT u AS node FROM e UNION ALL SELECT v FROM e) "
        "GROUP BY node) "
        "SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes "
        "FROM d GROUP BY deg"
    )


def q_connected_components(sf_dir: str):
    """Standalone hash-verified connected components (stages/cc.py
    Hash-to-Min) over a derived forest-with-merges graph on event ids:
    every non-multiple-of-64 node links to a hashed earlier node in its
    64-block, and a hashed quarter of block bases link to the previous
    base — components are bounded chains of blocks, so the DuckDB
    recursive-CTE walk oracle stays linear.  Output: (node, comp) with
    comp = min node id in the component, for every edge endpoint."""
    from ..stages.cc import connected_components
    from ..stages.scan import hash_bucket_scan

    def mk_edges(b: pa.Table) -> pa.Table:
        i = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = (i // 64) * 64
        h1 = ((i * 2654435761 + 12345) % 4294967296) % 16
        m1 = i % 64 != 0
        u1, v1 = i[m1], np.maximum(base[m1], i[m1] - 1 - h1[m1])
        h2 = ((i * 1103515245 + 54321) % 4294967296) % 4
        m2 = (i % 64 == 0) & (i > 0) & (h2 == 0)
        u2, v2 = i[m2], i[m2] - 64
        return pa.table({
            "doc_a": pa.array(np.concatenate([u1, u2]), pa.int64()),
            "doc_b": pa.array(np.concatenate([v1, v2]), pa.int64())})

    edges = _read(sf_dir, "events", ["event_id"]).map_batches(
        mk_edges, batch_format="pyarrow")
    stars = connected_components(edges)

    def member_rows(b: pa.Table) -> pa.Table:
        a = b["doc_a"].to_numpy(zero_copy_only=False)
        m = b["doc_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(np.concatenate([m, a]), pa.int64()),
            "comp": pa.array(np.concatenate([a, a]), pa.int64())})

    # centers repeat once per member — dedupe through one node-key
    # exchange (star output is already component-sized, tiny)
    return hash_bucket_scan(
        stars.map_batches(member_rows, batch_format="pyarrow"), ["node"],
        lambda t: t.group_by(["node"]).aggregate([("comp", "min")])
                   .rename_columns(["node", "comp"]),
        n_rows=2 * _nrows(sf_dir, "events"))


def q_connected_components_sql() -> str:
    return (
        "WITH RECURSIVE "
        "ids AS (SELECT event_id AS i FROM events), "
        "edges AS ("
        "SELECT i AS u, GREATEST((i // 64) * 64, "
        "i - 1 - ((i * 2654435761 + 12345) % 4294967296) % 16) AS v "
        "FROM ids WHERE i % 64 <> 0 "
        "UNION ALL "
        "SELECT i AS u, i - 64 AS v FROM ids WHERE i % 64 = 0 AND i > 0 "
        "AND ((i * 1103515245 + 54321) % 4294967296) % 4 = 0), "
        "nodes AS (SELECT DISTINCT u AS node FROM edges "
        "UNION SELECT DISTINCT v FROM edges), "
        "walk(node, cur) AS ("
        "SELECT node, node FROM nodes "
        "UNION ALL "
        "SELECT w.node, e.v FROM walk w JOIN edges e ON e.u = w.cur) "
        "SELECT node, min(cur) AS comp FROM walk GROUP BY node"
    )


def q_power_iteration(sf_dir: str):
    """Distributed PCA power iteration (top principal direction of the
    embedding table): ONE streaming pass computes the exact-int Gram
    matrix XᵀX from milli-quantized vectors (per-batch 64×64 int64
    partials → bounded combiner tree — vectors never shuffle, driver
    state is d²), then 3 driver-side iterations whose only division is
    the kmeans-style pinned-double normalization
    ``floor(double(w)·1000 / double(max|w|))`` — bit-identical to the
    unrolled SQL oracle.  Milli (not micro) quantization keeps
    G·v ≲ 3e15 inside both int64 and the 2^53 double-exact range;
    rescale per magnitude at larger n."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def gram(b: pa.Table) -> pa.Table:
        arr = b["embedding"].combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64)
        offs = np.asarray(arr.offsets)
        d = int(offs[1] - offs[0]) if len(offs) > 1 else 0
        x = np.floor(flat * 1e3 + 0.5).astype(np.int64).reshape(-1, d)
        g = x.T @ x
        i, j = np.divmod(np.arange(d * d, dtype=np.int64), d)
        return pa.table({"i": pa.array(i), "j": pa.array(j),
                         "g": pa.array(g.reshape(-1))})

    parts = _read(sf_dir, "embeddings", ["embedding"]).map_batches(
        gram, batch_format="pyarrow")
    gt = tree_aggregate_to_table(parts, ["i", "j"], [("g", "sum")]
                                 ).to_pandas()
    d = int(gt["i"].max()) + 1
    G = np.zeros((d, d), np.int64)
    G[gt["i"].to_numpy(), gt["j"].to_numpy()] = gt["g"].to_numpy()
    v = np.full(d, 1000, np.int64)
    for _ in range(3):
        w = G @ v
        s = float(np.max(np.abs(w)))
        v = np.floor(w.astype(np.float64) * 1000.0 / s).astype(np.int64)
    return pd.DataFrame({"dim": np.arange(d, dtype=np.int64), "val": v})


def q_power_iteration_sql() -> str:
    ctes = [
        "v AS (SELECT vec_id, i - 1 AS dim, "
        "CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) "
        "AS x FROM embeddings, UNNEST(range(1, len(embedding) + 1)) t(i))",
        "g AS (SELECT a.dim AS i, b.dim AS j, CAST(sum(a.x * b.x) "
        "AS BIGINT) AS g FROM v a JOIN v b ON a.vec_id = b.vec_id "
        "GROUP BY 1, 2)",
        "v0 AS (SELECT DISTINCT dim, CAST(1000 AS BIGINT) AS val FROM v)",
    ]
    for it in range(1, 4):
        ctes.append(
            f"w{it} AS (SELECT g.i AS dim, CAST(sum(g.g * v{it - 1}.val) "
            f"AS BIGINT) AS w FROM g JOIN v{it - 1} ON "
            f"v{it - 1}.dim = g.j GROUP BY 1)")
        ctes.append(
            f"v{it} AS (SELECT dim, CAST(floor(CAST(w AS DOUBLE) * 1000.0 "
            f"/ (SELECT CAST(max(abs(w)) AS DOUBLE) FROM w{it})) "
            f"AS BIGINT) AS val FROM w{it})")
    return ("WITH " + ", ".join(ctes) +
            " SELECT dim, val FROM v3")
# the fixpoint (measured: 6/7/10 rounds at sf0.001/0.01/0.1)


def q_sssp(sf_dir: str):
    """Single-source shortest paths from node 0 by distributed
    Bellman-Ford (the routing primitive; joins q_pagerank/_kcore/
    _connected_components in the graph family): the shared hub-skewed
    derived graph (stages/graph.derived_graph_edges), integer edge
    weights 1 + (31u+17v) mod 100, Jacobi rounds — distances live as a
    co-partitioned (node, dist) DATASET, never on the driver and never
    broadcast.  The static directed edge set is hash-bucket-published
    ONCE into driver-owned object-store shards
    (stages/graph.publish_edge_shards); each round is then ONE BSP
    superstep of raw tasks (stages/graph.bsp_round): per-bucket gather
    tasks read their edge shard in place and scatter pre-combined
    (dst, dist+w) candidates by target hash, per-bucket combine tasks
    min-fold candidates ∪ state.  Per-round network is O(|state|), not
    O(|E|) — at R rounds the edges travel once, not R times — and no
    Ray Data job or actor pool launches per round (absent state
    buckets drop their edges exactly like an all-miss lookup).
    Convergence checks an O(1) (count, sum) fingerprint returned by
    the combine wave (dists only decrease, rows only appear, so
    equality ⟺ fixpoint).  Loops to fixpoint (≤ 14 rounds, asserted);
    the oracle replays exactly 14 chained-CTE rounds (idempotent past
    convergence).  Exact ints throughout; unreached nodes drop."""
    from ..stages.graph import (bsp_round, derived_graph_edges,
                               publish_edge_shards, split_state_refs,
                               state_refs_to_table)

    edges, V, n = derived_graph_edges(sf_dir, directed=False,
                                      read=_read, nrows=_nrows)

    def orient(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        w = 1 + (u * 31 + v * 17) % 100
        return pa.table({
            "src": pa.array(np.concatenate([u, v]), pa.int64()),
            "dst": pa.array(np.concatenate([v, u]), pa.int64()),
            "w": pa.array(np.concatenate([w, w]), pa.int64())})

    E2 = 2 * n  # upper bound on directed edge rows (bucket sizing)
    shards = publish_edge_shards(
        edges.map_batches(orient, batch_format="pyarrow"),
        "src", ["dst", "w"], n_rows=E2)

    def emit(ek, pays, lookup):
        d, found = lookup(ek)
        t = pa.table({
            "node": pa.array(pays["dst"][found], pa.int64()),
            "val": pa.array(d[found] + pays["w"][found], pa.int64())})
        return (t.group_by(["node"]).aggregate([("val", "min")])
                .rename_columns(["node", "val"]))

    state = split_state_refs(
        pa.table({"node": pa.array([0], pa.int64()),
                  "val": pa.array([0], pa.int64())}), shards.n_buckets)
    fp = (1, 0)
    for _ in range(_SSSP_ROUNDS + 1):
        state, nfp = bsp_round(shards, state, "src", ["dst", "w"],
                               emit, "min", base_refs=state)
        if nfp[:2] == fp:
            break
        fp = nfp[:2]
    else:
        raise RuntimeError("Bellman-Ford did not converge within "
                           f"{_SSSP_ROUNDS} oracle-replayable rounds")

    out = (state_refs_to_table(state).to_pandas()
           .sort_values("node").reset_index(drop=True))
    return pd.DataFrame({"node": out["node"].astype(np.int64),
                         "dist": out["val"].astype(np.int64)})


def q_sssp_sql() -> str:
    v = "greatest(200, (SELECT count(*) FROM events) // 12)"
    nu = _kcore_node_sql("user_id", "vv.v")
    ne = _kcore_node_sql("event_id", "vv.v")
    parts = [
        f"WITH vv AS MATERIALIZED (SELECT {v} AS v), "
        "raw AS MATERIALIZED (SELECT " + nu + " AS x, " + ne + " AS y "
        "FROM events, vv), "
        "e AS MATERIALIZED (SELECT u, v, 1 + (u * 31 + v * 17) % 100 "
        "AS w FROM (SELECT DISTINCT least(x, y) AS u, "
        "greatest(x, y) AS v FROM raw WHERE x <> y)), "
        "d0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS node, "
        "CAST(0 AS BIGINT) AS dist)"]
    for r in range(_SSSP_ROUNDS):
        parts.append(
            f", d{r + 1} AS MATERIALIZED (SELECT node, "
            f"CAST(min(dist) AS BIGINT) AS dist FROM ("
            f"SELECT node, dist FROM d{r} "
            f"UNION ALL SELECT e.v AS node, d.dist + e.w AS dist "
            f"FROM e JOIN d{r} d ON d.node = e.u "
            f"UNION ALL SELECT e.u AS node, d.dist + e.w AS dist "
            f"FROM e JOIN d{r} d ON d.node = e.v) GROUP BY node)")
    parts.append(f" SELECT node, dist FROM d{_SSSP_ROUNDS}")
    return "".join(parts)


def q_hits(sf_dir: str):
    """HITS hubs-and-authorities over the DIRECTED derived graph
    (user-node → event-node; PageRank's bipartite-flavoured sibling):
    two full hub/authority rounds, each matvec a co-partitioned
    vertex-state exchange (stages/graph): scores live as a (node, s)
    DATASET partitioned by node hash, and the edge set is
    hash-bucket-published ONCE per gather orientation
    (stages/graph.publish_edge_shards — the seed covers every u and
    each matvec's output covers every gathered endpoint, so every
    edge's gather endpoint resolves); each matvec is then ONE BSP
    superstep of raw tasks (stages/graph.bsp_round): per-bucket
    gathers read their edge shard in place (missing node ⇒ 0,
    mirroring the oracle's LEFT JOIN COALESCE), scatter pre-combined
    per-dst partial sums by target hash, and per-bucket combines
    close the matvec — no Ray Data job or actor pool per round,
    edges never travel after the publish.  Re-quantized after every
    matvec by the power-iteration house normalization
    floor(w·1000 / max w) — max w is the only driver-side value (the
    O(1) fingerprint the combine wave returns), so scores stay small
    ints and every round is bit-replayable by the oracle's chained
    CTEs.  Output = top-10 authorities from the final state blocks."""
    from ..stages.graph import (bsp_round, combine_state,
                               derived_graph_edges, publish_edge_shards,
                               split_state_refs, topk_state_refs,
                               transform_state_refs)

    edges, V, n = derived_graph_edges(sf_dir, directed=True,
                                      read=_read, nrows=_nrows)
    shard_dir = {
        ("u", "v"): publish_edge_shards(edges, "u", ["v"], n_rows=n),
        ("v", "u"): publish_edge_shards(edges, "v", ["u"], n_rows=n)}

    def seed(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b["u"].combine_chunks().cast(pa.int64()),
            "val": pa.array(np.full(len(b), 1000, np.int64),
                            pa.int64())})

    h = split_state_refs(
        combine_state(edges.map_batches(seed, batch_format="pyarrow"),
                      "max", n_rows=V),
        shard_dir[("u", "v")].n_buckets)

    def matvec(state, src: str, dst: str):
        def emit(ek, pays, lookup):
            w, _ = lookup(ek, default=0)
            t = pa.table({"node": pa.array(pays[dst], pa.int64()),
                          "val": pa.array(w, pa.int64())})
            return (t.group_by(["node"]).aggregate([("val", "sum")])
                    .rename_columns(["node", "val"]))

        g, fp = bsp_round(shard_dir[(src, dst)], state, src, [dst],
                          emit, "sum")
        s = float(fp[2])

        def quant(w: np.ndarray) -> np.ndarray:
            return np.floor(w.astype(np.float64) * 1000.0 / s) \
                .astype(np.int64)

        return transform_state_refs(g, quant)

    for _ in range(2):
        a = matvec(h, "u", "v")
        h = matvec(a, "v", "u")

    def best_first(d: pd.DataFrame) -> pd.DataFrame:
        d = d[d["val"] > 0]
        return d.sort_values(["val", "node"], ascending=[False, True],
                             kind="mergesort")

    top = topk_state_refs(a, 10, best_first)
    return pd.DataFrame({"node": top["node"].astype(np.int64),
                         "auth": top["val"].astype(np.int64)})


def q_hits_sql() -> str:
    v = "greatest(200, (SELECT count(*) FROM events) // 12)"
    nu = _kcore_node_sql("user_id", "vv.v")
    ne = _kcore_node_sql("event_id", "vv.v")
    ctes = [
        f"vv AS MATERIALIZED (SELECT {v} AS v)",
        "raw AS MATERIALIZED (SELECT " + nu + " AS x, " + ne +
        " AS y FROM events, vv)",
        "e AS MATERIALIZED (SELECT DISTINCT x AS u, y AS w2 "
        "FROM raw WHERE x <> y)",
        "h0 AS MATERIALIZED (SELECT DISTINCT u AS node, "
        "CAST(1000 AS BIGINT) AS s FROM e)",
    ]
    prev_h = "h0"
    for it in range(1, 3):
        ctes.append(
            f"a{it}r AS MATERIALIZED (SELECT e.w2 AS node, "
            f"CAST(sum(COALESCE(p.s, 0)) AS BIGINT) AS w FROM e "
            f"LEFT JOIN {prev_h} p ON p.node = e.u GROUP BY 1)")
        ctes.append(
            f"a{it} AS MATERIALIZED (SELECT node, "
            f"CAST(floor(CAST(w AS DOUBLE) * 1000.0 / "
            f"(SELECT CAST(max(w) AS DOUBLE) FROM a{it}r)) AS BIGINT) "
            f"AS s FROM a{it}r)")
        ctes.append(
            f"h{it}r AS MATERIALIZED (SELECT e.u AS node, "
            f"CAST(sum(COALESCE(p.s, 0)) AS BIGINT) AS w FROM e "
            f"LEFT JOIN a{it} p ON p.node = e.w2 GROUP BY 1)")
        ctes.append(
            f"h{it} AS MATERIALIZED (SELECT node, "
            f"CAST(floor(CAST(w AS DOUBLE) * 1000.0 / "
            f"(SELECT CAST(max(w) AS DOUBLE) FROM h{it}r)) AS BIGINT) "
            f"AS s FROM h{it}r)")
        prev_h = f"h{it}"
    return ("WITH " + ", ".join(ctes) +
            " SELECT node, s AS auth FROM a2 WHERE s > 0 "
            "ORDER BY s DESC, node LIMIT 10")


def q_assortativity(sf_dir: str):
    """Degree assortativity of the q_kcore graph (the Newman mixing
    coefficient — do hubs attach to hubs?): degrees on the bounded
    combiner tree as a co-partitioned (node, deg) DATASET (never
    broadcast: each of the two attach passes is a hash-bucket
    exchange that reads the degree state bucket-locally —
    stages/graph), and the second attach emits exact-int partial
    sums over both edge orientations (Σx, Σx², Σxy across 2E
    endpoint samples; by symmetry the Pearson r needs NO sqrt:
    r = (n·Sxy − Sx²)/(n·Sxx − Sx²)).  Driver folds the one-row-per-
    bucket partials in Python bigints; ONE pinned division."""
    from ..stages.graph import (combine_state, derived_graph_edges,
                               edge_state_messages)

    edges, V, n = derived_graph_edges(sf_dir, directed=False,
                                      read=_read, nrows=_nrows)

    def endpoints(t: pa.Table) -> pa.Table:
        uv = np.concatenate([t["u"].to_numpy(zero_copy_only=False),
                             t["v"].to_numpy(zero_copy_only=False)])
        return pa.table({"node": pa.array(uv, pa.int64()),
                         "val": pa.array(np.ones(len(uv), np.int64))})

    deg = combine_state(
        edges.map_batches(endpoints, batch_format="pyarrow"),
        "sum", n_rows=V).materialize()

    def attach_du(ek, pays, lookup):
        du, _ = lookup(ek)
        return pa.table({"v": pa.array(pays["v"], pa.int64()),
                         "du": pa.array(du, pa.int64())})

    with_du = edge_state_messages(edges, deg, "u", ["v"], attach_du,
                                  n_rows=n)

    def moments(ek, pays, lookup):
        dw, _ = lookup(ek)
        du = pays["du"]
        x = np.concatenate([du, dw])
        y = np.concatenate([dw, du])
        return pa.table({
            "m": pa.array([len(x)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64())})

    parts = edge_state_messages(with_du, deg, "v", ["du"], moments,
                                n_rows=n).to_pandas()
    m = int(parts["m"].sum())
    sx = int(parts["sx"].sum())
    sxx = int(parts["sxx"].sum())
    sxy = int(parts["sxy"].sum())
    num = m * sxy - sx * sx
    den = m * sxx - sx * sx
    r_nano = int(np.floor(float(num) / float(den) * 1e9 + 0.5))
    return pd.DataFrame({"m": [np.int64(m)],
                         "r_nano": [np.int64(r_nano)]})


def q_assortativity_sql() -> str:
    v = "greatest(200, (SELECT count(*) FROM events) // 12)"
    nu = _kcore_node_sql("user_id", "vv.v")
    ne = _kcore_node_sql("event_id", "vv.v")
    return (
        f"WITH vv AS MATERIALIZED (SELECT {v} AS v), "
        "raw AS MATERIALIZED (SELECT " + nu + " AS x, " + ne + " AS y "
        "FROM events, vv), "
        "e AS MATERIALIZED (SELECT DISTINCT least(x, y) AS u, "
        "greatest(x, y) AS v FROM raw WHERE x <> y), "
        "d AS MATERIALIZED (SELECT node, "
        "CAST(count(*) AS BIGINT) AS deg FROM "
        "(SELECT u AS node FROM e UNION ALL SELECT v FROM e) "
        "GROUP BY node), "
        "p AS (SELECT du.deg AS x, dv.deg AS y FROM e "
        "JOIN d du ON du.node = e.u JOIN d dv ON dv.node = e.v "
        "UNION ALL "
        "SELECT dv.deg, du.deg FROM e "
        "JOIN d du ON du.node = e.u JOIN d dv ON dv.node = e.v), "
        "s AS (SELECT CAST(count(*) AS HUGEINT) AS m, "
        "CAST(sum(x) AS HUGEINT) AS sx, "
        "CAST(sum(x * x) AS HUGEINT) AS sxx, "
        "CAST(sum(x * y) AS HUGEINT) AS sxy FROM p) "
        "SELECT CAST(m AS BIGINT) AS m, "
        "CAST(floor(CAST(m * sxy - sx * sx AS DOUBLE) / "
        "CAST(m * sxx - sx * sx AS DOUBLE) * 1e9 + 0.5) AS BIGINT) "
        "AS r_nano FROM s"
    )


def q_kcore(sf_dir: str):
    """k-core decomposition (k=8) of a hub-skewed derived graph — the
    community-mining peel: nodes come from a quadratic-CDF hash of the
    event endpoints (V = max(200, n/12) scales with the data; low ids
    are hubs, so the core is nested and non-empty at every fixture
    scale), edges dedup on one pair-key hash exchange, then the
    classic iterative peel: drop every node with degree < k, recount,
    repeat to fixpoint.  The promised unbounded-V design is now the
    implementation (stages/graph): per-round degrees are a
    co-partitioned (node, deg) DATASET from a hash-bucket exchange,
    the sub-k nodes stay a Dataset, and the removal filter is two
    hash-bucket ANTI-JOIN exchanges (edges keyed by u, then by v,
    each reading the bad-node state bucket-locally) — no V-sized
    broadcast, no V-sized driver fold; the only driver value per
    round is the bad-node count.  Converges in ≤ 2 rounds at fixture
    densities; the oracle replays a fixed 6-round peel (idempotent
    after the fixpoint).  Output = core nodes with their in-core
    degree, exact ints."""
    import pyarrow.compute as pc

    from ..stages.graph import (combine_state, derived_graph_edges,
                               edge_state_messages, materialize_bounded)

    edges, V, n = derived_graph_edges(sf_dir, directed=False,
                                      read=_read, nrows=_nrows)

    def endpoints(t: pa.Table) -> pa.Table:
        uv = np.concatenate([t["u"].to_numpy(zero_copy_only=False),
                             t["v"].to_numpy(zero_copy_only=False)])
        return pa.table({"node": pa.array(uv, pa.int64()),
                         "val": pa.array(np.ones(len(uv), np.int64))})

    def survive_u(ek, pays, lookup):
        _, found = lookup(ek)
        keep = ~found
        return pa.table({"u": pa.array(ek[keep], pa.int64()),
                         "v": pa.array(pays["v"][keep], pa.int64())})

    def survive_v(ek, pays, lookup):
        _, found = lookup(ek)
        keep = ~found
        return pa.table({"u": pa.array(pays["u"][keep], pa.int64()),
                         "v": pa.array(ek[keep], pa.int64())})

    for _ in range(_KCORE_ROUNDS + 1):
        deg = combine_state(
            edges.map_batches(endpoints, batch_format="pyarrow"),
            "sum", n_rows=V).materialize()
        bad = deg.map_batches(
            lambda t: t.filter(pc.less(t["val"], _KCORE_K)),
            batch_format="pyarrow").materialize()
        if bad.count() == 0:
            break
        edges = materialize_bounded(edge_state_messages(
            edge_state_messages(edges, bad, "u", ["v"], survive_u,
                                n_rows=n),
            bad, "v", ["u"], survive_v, n_rows=n), n)
    else:
        raise RuntimeError("k-core peel did not converge within "
                           f"{_KCORE_ROUNDS} oracle-replayable rounds")

    core = deg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["val"], _KCORE_K)),
        batch_format="pyarrow").to_pandas()
    if "node" not in core.columns:
        # a fully-peeled graph leaves an empty Dataset whose blocks
        # carry no schema — the core is simply empty (oracle: 0 rows)
        core = pd.DataFrame({"node": np.array([], np.int64),
                             "val": np.array([], np.int64)})
    core = core.sort_values("node")
    return pd.DataFrame({"node": core["node"].to_numpy(np.int64),
                         "deg": core["val"].to_numpy(np.int64)})


def q_kcore_sql() -> str:
    v = f"greatest(200, (SELECT count(*) FROM events) // 12)"
    nu = _kcore_node_sql("user_id", "vv.v")
    ne = _kcore_node_sql("event_id", "vv.v")
    # every CTE MATERIALIZED: each round references its predecessor
    # ~5x, and DuckDB's default CTE inlining would expand the chain
    # exponentially (5^rounds scans of the events parquet)
    parts = [
        f"WITH vv AS MATERIALIZED (SELECT {v} AS v), "
        "raw AS MATERIALIZED (SELECT " + nu + " AS x, " + ne + " AS y "
        "FROM events, vv), "
        "e0 AS MATERIALIZED (SELECT DISTINCT least(x, y) AS u, "
        "greatest(x, y) AS v FROM raw WHERE x <> y)"]
    for r in range(_KCORE_ROUNDS):
        parts.append(
            f", d{r} AS MATERIALIZED (SELECT node, "
            f"CAST(count(*) AS BIGINT) AS deg "
            f"FROM (SELECT u AS node FROM e{r} "
            f"UNION ALL SELECT v FROM e{r}) GROUP BY node)"
            f", b{r} AS MATERIALIZED "
            f"(SELECT node FROM d{r} WHERE deg < {_KCORE_K})"
            f", e{r + 1} AS MATERIALIZED (SELECT u, v FROM e{r} "
            f"WHERE u NOT IN (SELECT node FROM b{r}) "
            f"AND v NOT IN (SELECT node FROM b{r}))")
    parts.append(
        f" SELECT node, CAST(count(*) AS BIGINT) AS deg "
        f"FROM (SELECT u AS node FROM e{_KCORE_ROUNDS} "
        f"UNION ALL SELECT v FROM e{_KCORE_ROUNDS}) GROUP BY node")
    return "".join(parts)


def q_modularity(sf_dir: str):
    """NEWMAN MODULARITY of a fixed 16-block partition (community =
    node // 25) of the derived 400-node graph — kept EXACT as the
    integer numerator N = Σ_c (4·m·e_c − d_c²) over denominator 4m²
    (never formed), so no float crosses the aggregate.  One distinct-
    edge pair-key exchange (the q_triangles edge set), then a single
    map pass emits bounded (comm, e, d) partials onto the combiner
    tree; the final fold is over ≤ 16 communities.  Oracle = the same
    distinct-edge CTE with integer group sums."""
    from ..stages.agg_tree import tree_aggregate_to_table
    from ..stages.scan import hash_bucket_scan

    V = 400

    def prep(b: pa.Table) -> pa.Table:
        x = b["user_id"].to_numpy(zero_copy_only=False) % V
        y = b["event_id"].to_numpy(zero_copy_only=False) % V
        keep = x != y
        x, y = x[keep], y[keep]
        return pa.table({"u": pa.array(np.minimum(x, y), pa.int64()),
                         "v": pa.array(np.maximum(x, y), pa.int64())})

    def distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["u", "v"]).aggregate([])

    edges = hash_bucket_scan(
        _read(sf_dir, "events", ["user_id", "event_id"]).map_batches(
            prep, batch_format="pyarrow"),
        ["u", "v"], distinct, n_rows=_nrows(sf_dir, "events")).materialize()
    m = edges.count()

    def partial(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        cu, cv = u // 25, v // 25
        comm = np.concatenate([cu, cv])
        e = np.concatenate([(cu == cv).astype(np.int64),
                            np.zeros(len(cv), np.int64)])
        d = np.ones(2 * len(u), np.int64)
        tt = pa.table({"comm": pa.array(comm), "e": pa.array(e),
                       "d": pa.array(d)})
        g = tt.group_by(["comm"]).aggregate([("e", "sum"), ("d", "sum")])
        return g.rename_columns(["comm", "e", "d"])

    agg = tree_aggregate_to_table(
        edges.map_batches(partial, batch_format="pyarrow"),
        ["comm"], [("e", "sum"), ("d", "sum")])
    e_c = agg["e"].to_numpy(zero_copy_only=False)
    d_c = agg["d"].to_numpy(zero_copy_only=False)
    q_num = int((4 * m * e_c - d_c * d_c).sum())
    return pd.DataFrame({"m": [np.int64(m)],
                         "n_comms": [np.int64(len(e_c))],
                         "q_num": [np.int64(q_num)]})


def q_modularity_sql() -> str:
    return (
        "WITH raw AS (SELECT user_id % 400 AS x, event_id % 400 AS y "
        "FROM events), "
        "e AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v "
        "FROM raw WHERE x <> y), "
        "mm AS (SELECT count(*) AS m FROM e), "
        "c AS (SELECT comm, sum(intra) AS e_c, count(*) AS d_c FROM ("
        "SELECT u // 25 AS comm, "
        "CASE WHEN u // 25 = v // 25 THEN 1 ELSE 0 END AS intra FROM e "
        "UNION ALL SELECT v // 25 AS comm, 0 AS intra FROM e) "
        "GROUP BY 1) "
        "SELECT CAST(mm.m AS BIGINT) AS m, "
        "CAST(count(*) AS BIGINT) AS n_comms, "
        "CAST(sum(4 * mm.m * c.e_c - c.d_c * c.d_c) AS BIGINT) AS q_num "
        "FROM c, mm GROUP BY mm.m"
    )


def q_rich_club(sf_dir: str):
    """RICH-CLUB structure of the derived 400-node graph: for degree
    thresholds k ∈ {2, 4, 8, 16}, the number of nodes with deg > k and
    the number of edges BOTH of whose endpoints pass — the hub-
    interconnection screen, exact ints (the φ(k) ratio e_k/(n_k·(n_k−1)/2)
    is left to the reader).  Distinct edges via one pair-key exchange,
    the bounded degree vector broadcast, one counting pass per
    threshold folded on the combiner tree."""
    from ..stages.agg_tree import tree_aggregate_to_table
    from ..stages.scan import hash_bucket_scan

    V = 400

    def prep(b: pa.Table) -> pa.Table:
        x = b["user_id"].to_numpy(zero_copy_only=False) % V
        y = b["event_id"].to_numpy(zero_copy_only=False) % V
        keep = x != y
        x, y = x[keep], y[keep]
        return pa.table({"u": pa.array(np.minimum(x, y), pa.int64()),
                         "v": pa.array(np.maximum(x, y), pa.int64())})

    edges = hash_bucket_scan(
        _read(sf_dir, "events", ["user_id", "event_id"]).map_batches(
            prep, batch_format="pyarrow"),
        ["u", "v"], lambda t: t.group_by(["u", "v"]).aggregate([]),
        n_rows=_nrows(sf_dir, "events")).materialize()
    deg_tab = tree_aggregate_to_table(
        edges.map_batches(
            lambda t: pa.table({
                "node": pa.array(np.concatenate(
                    [t["u"].to_numpy(zero_copy_only=False),
                     t["v"].to_numpy(zero_copy_only=False)]), pa.int64()),
                "deg": pa.array(np.ones(2 * len(t), np.int64))}),
            batch_format="pyarrow"),
        ["node"], [("deg", "sum")])
    deg = np.zeros(V, np.int64)
    deg[deg_tab["node"].to_numpy(zero_copy_only=False)] = \
        deg_tab["deg"].to_numpy(zero_copy_only=False)
    KS = (2, 4, 8, 16)

    def count_pass(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        ks, es = [], []
        for k in KS:
            ks.append(k)
            es.append(int(((deg[u] > k) & (deg[v] > k)).sum()))
        return pa.table({"k": pa.array(np.array(ks, np.int64)),
                         "e_k": pa.array(np.array(es, np.int64))})

    agg = tree_aggregate_to_table(
        edges.map_batches(count_pass, batch_format="pyarrow"),
        ["k"], [("e_k", "sum")]).to_pandas()
    agg = agg.sort_values("k").reset_index(drop=True)
    n_k = np.array([(deg > k).sum() for k in agg["k"]], np.int64)
    return pd.DataFrame({"k": agg["k"].to_numpy().astype(np.int64),
                         "n_k": n_k,
                         "e_k": agg["e_k"].to_numpy().astype(np.int64)})


def q_rich_club_sql() -> str:
    return (
        "WITH raw AS (SELECT user_id % 400 AS x, event_id % 400 AS y "
        "FROM events), "
        "e AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v "
        "FROM raw WHERE x <> y), "
        "d AS (SELECT node, count(*) AS deg FROM "
        "(SELECT u AS node FROM e UNION ALL SELECT v FROM e) "
        "GROUP BY 1), "
        "ks AS (SELECT unnest([2, 4, 8, 16]) AS k) "
        "SELECT CAST(ks.k AS BIGINT) AS k, "
        "CAST((SELECT count(*) FROM d WHERE d.deg > ks.k) AS BIGINT) "
        "AS n_k, "
        "CAST((SELECT count(*) FROM e "
        "JOIN d du ON du.node = e.u JOIN d dv ON dv.node = e.v "
        "WHERE du.deg > ks.k AND dv.deg > ks.k) AS BIGINT) AS e_k "
        "FROM ks"
    )
