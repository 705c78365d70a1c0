"""Co-partitioned vertex-state primitives (stages/graph.py).

The scale contract the r4 verdict asked to evidence: with vertex
state as a Dataset and every round a hash-bucket exchange, (a) the
per-bucket work is bounded by the rows-per-bucket budget REGARDLESS
of how large the node-id space V is (a planted V=10^12 graph), and
(b) iterate-union-combine loops keep a bounded block count (the
map_groups block-doubling regression that made early rounds O(2^r)).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _edges_ds(n_edges: int, vmax: int, seed: int = 7):
    import ray.data

    rng = np.random.default_rng(seed)
    return ray.data.from_arrow(pa.table({
        "src": pa.array(rng.integers(0, vmax, n_edges), pa.int64()),
        "dst": pa.array(rng.integers(0, vmax, n_edges), pa.int64()),
        "w": pa.array(rng.integers(1, 100, n_edges), pa.int64()),
    })).materialize()


def test_exchange_volume_bounded_at_large_v(ray_session):
    """Planted V = 10^12: per-bucket edge rows stay within a small
    multiple of n_edges / n_buckets — bucket memory tracks the row
    budget, NOT V, so the same loop runs at any node-id scale."""
    from skyway_ray.stages.graph import edge_state_messages
    from skyway_ray.stages.scan import auto_n_buckets

    n_edges, vmax = 20_000, 10**12
    edges = _edges_ds(n_edges, vmax)
    state = edges.map_batches(
        lambda t: pa.table({
            "node": t["src"],
            "val": pa.array(np.ones(len(t), np.int64))}),
        batch_format="pyarrow")

    n_buckets = auto_n_buckets(n_edges, rows_per_bucket=1000)

    def emit(ek, pays, lookup):
        # one row per bucket: its edge-row count
        return pa.table({"bucket_rows": pa.array([len(ek)], pa.int64())})

    sizes = edge_state_messages(
        edges, state, "src", ["dst", "w"], emit,
        n_rows=n_edges, n_buckets=n_buckets).to_pandas()
    assert sizes["bucket_rows"].sum() == n_edges
    # multiplicative-hash balance: no bucket above 4x the mean
    assert sizes["bucket_rows"].max() <= 4 * (n_edges / n_buckets)


def test_lookup_resolves_state_in_bucket(ray_session):
    """Degree-attach round trip: lookup() resolves exactly the state
    rows whose node hashes into the bucket; misses report found=False
    and the default fills."""
    from skyway_ray.stages.graph import (combine_state,
                                         edge_state_messages)

    import ray.data

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([1, 1, 2, 5, 900000000007], pa.int64()),
        "dst": pa.array([2, 3, 3, 6, 1], pa.int64()),
        "w": pa.array([10, 20, 30, 40, 50], pa.int64())})).materialize()
    state = ray.data.from_arrow(pa.table({
        "node": pa.array([1, 2, 900000000007], pa.int64()),
        "val": pa.array([100, 200, 300], pa.int64())}))

    def emit(ek, pays, lookup):
        v, found = lookup(ek, default=-1)
        return pa.table({"src": pa.array(ek, pa.int64()),
                         "dst": pa.array(pays["dst"], pa.int64()),
                         "sv": pa.array(v, pa.int64()),
                         "found": pa.array(found.astype(np.int64))})

    out = edge_state_messages(edges, state, "src", ["dst", "w"], emit,
                              n_rows=5).to_pandas()
    out = out.sort_values(["src", "dst"]).reset_index(drop=True)
    want = pd.DataFrame({
        "src": [1, 1, 2, 5, 900000000007],
        "dst": [2, 3, 3, 6, 1],
        "sv": [100, 100, 200, -1, 300],
        "found": [1, 1, 1, 0, 1]})
    pd.testing.assert_frame_equal(
        out.astype(np.int64), want.astype(np.int64))

    # sum-combine of (node, val) messages matches a local groupby
    msgs = edges.map_batches(
        lambda t: pa.table({"node": t["dst"], "val": t["w"]}),
        batch_format="pyarrow")
    got = (combine_state(msgs, "sum", n_rows=5).to_pandas()
           .sort_values("node").reset_index(drop=True))
    want2 = pd.DataFrame({"node": [1, 2, 3, 6],
                          "val": [50, 10, 50, 40]})
    pd.testing.assert_frame_equal(got.astype(np.int64),
                                  want2.astype(np.int64))


def test_iterated_combine_blocks_stay_bounded(ray_session):
    """Six union→combine rounds: block count stays at the size-tracked
    target instead of doubling per round (the lineage-fanout
    regression: 3 → 511 blocks in 8 rounds while rows stayed at
    200)."""
    from skyway_ray.stages.graph import (combine_state,
                                         edge_state_messages,
                                         state_fingerprint,
                                         state_from_rows)

    edges = _edges_ds(1500, 200)
    state = state_from_rows([0], [0]).materialize()

    def emit(ek, pays, lookup):
        d, found = lookup(ek)
        t = pa.table({
            "node": pa.array(pays["dst"][found], pa.int64()),
            "val": pa.array(d[found] + pays["w"][found], pa.int64())})
        return (t.group_by(["node"]).aggregate([("val", "min")])
                .rename_columns(["node", "val"]))

    fp = state_fingerprint(state)[:2]
    for _ in range(30):
        msgs = edge_state_messages(edges, state, "src", ["dst", "w"],
                                   emit, n_rows=1500)
        state = combine_state(msgs.union(state), "min",
                              n_rows=200).materialize()
        assert state.num_blocks() <= 4
        nfp = state_fingerprint(state)[:2]
        if nfp == fp:
            break
        fp = nfp
    else:
        pytest.fail("Bellman-Ford loop did not converge in 30 rounds")

    # Bellman-Ford fixpoint sanity on the planted graph: at fixpoint
    # every reached node's dist is ≤ min over in-edges of
    # (dist[src] + w)
    df = state.to_pandas().set_index("node")["val"]
    e = edges.to_pandas()
    reached = e[e["src"].isin(df.index)]
    best = (reached.assign(d=reached["src"].map(df) + reached["w"])
            .groupby("dst")["d"].min())
    for node, d in best.items():
        assert df.loc[node] <= d


def test_bsp_round_matches_dynamic_exchange(ray_session):
    """publish_edge_shards + bsp_round must reproduce the dynamic
    edge_state_messages → min-combine-with-state round for a
    found-masked emit (SSSP's shape) with state covering a strict
    SUBSET of sources — including buckets holding edges but no state
    (dropped on both paths) and state but no edges (emit nothing) —
    across BOTH state-splitting entry points (pa.Table seed and
    Dataset)."""
    from skyway_ray.stages.graph import (bsp_round,
                                         combine_state,
                                         edge_state_messages,
                                         publish_edge_shards,
                                         split_state_refs,
                                         state_refs_to_table)

    import ray.data

    n_edges, vmax = 5_000, 600
    edges = _edges_ds(n_edges, vmax, seed=13)
    rng = np.random.default_rng(99)
    nodes = np.sort(rng.choice(vmax, size=vmax // 3, replace=False))
    vals = rng.integers(0, 50, len(nodes))
    state_tbl = pa.table({"node": pa.array(nodes, pa.int64()),
                          "val": pa.array(vals, pa.int64())})
    state_ds = ray.data.from_arrow(state_tbl).materialize()

    def emit(ek, pays, lookup):
        d, found = lookup(ek)
        t = pa.table({
            "node": pa.array(pays["dst"][found], pa.int64()),
            "val": pa.array(d[found] + pays["w"][found], pa.int64())})
        return (t.group_by(["node"]).aggregate([("val", "min")])
                .rename_columns(["node", "val"]))

    msgs = edge_state_messages(edges, state_ds, "src", ["dst", "w"],
                               emit, n_rows=n_edges)
    dyn = (combine_state(msgs.union(state_ds), "min",
                         n_rows=len(nodes))
           .to_pandas().sort_values("node").reset_index(drop=True))

    shards = publish_edge_shards(edges, "src", ["dst", "w"],
                                 n_rows=n_edges)
    for seed_state in (state_tbl, state_ds):
        refs = split_state_refs(seed_state, shards.n_buckets)
        new_refs, fp = bsp_round(shards, refs, "src", ["dst", "w"],
                                 emit, "min", base_refs=refs)
        got = (state_refs_to_table(new_refs).to_pandas()
               .sort_values("node").reset_index(drop=True))
        assert len(got) > 0
        pd.testing.assert_frame_equal(dyn.astype(np.int64),
                                      got.astype(np.int64))
        assert fp[0] == len(got) and fp[1] == got["val"].sum()


def test_published_shards_cover_edges_exactly(ray_session):
    """The shard directory partitions the edge set: concatenating
    every shard reproduces the edges exactly (as multisets), and each
    shard holds only keys hashing to its bucket."""
    import ray

    from skyway_ray.stages.graph import publish_edge_shards
    from skyway_ray.stages.scan import int_bucket_ids

    n_edges = 2_000
    edges = _edges_ds(n_edges, 10**9, seed=21)
    shards = publish_edge_shards(edges, "src", ["dst", "w"],
                                 n_rows=n_edges)
    directory = shards.directory
    rows = []
    for b, refs in directory.items():
        for r in refs:
            s = ray.get(r)
            assert (int_bucket_ids([s["src"]],
                                   shards.n_buckets) == b).all()
            rows.append(pd.DataFrame(s))
    got = (pd.concat(rows).sort_values(["src", "dst", "w"])
           .reset_index(drop=True))
    want = (edges.to_pandas().sort_values(["src", "dst", "w"])
            .reset_index(drop=True)[["src", "dst", "w"]])
    pd.testing.assert_frame_equal(got.astype(np.int64),
                                  want.astype(np.int64))
