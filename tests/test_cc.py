"""Distributed connected components (stages/cc.py) vs a local
union-find oracle, plus transitive-cluster behavior of the
fully-distributed minhash_lsh_dedup."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from skyway_ray.stages.cc import connected_components


def _uf_components(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _stars_to_labels(df):
    lab = {}
    for a, b in zip(df["doc_a"], df["doc_b"]):
        lab[int(b)] = int(a)
        lab.setdefault(int(a), int(a))
    return lab


@pytest.mark.parametrize("limit", [0, 5_000_000])
@pytest.mark.parametrize("seed,n_nodes,n_edges", [
    (0, 30, 25), (1, 100, 80), (2, 200, 300), (3, 50, 5),
])
def test_cc_matches_union_find(ray_session, seed, n_nodes, n_edges, limit):
    import ray.data

    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges, dtype=np.int64)
    b = rng.integers(0, n_nodes, n_edges, dtype=np.int64)
    keep = a != b
    edges = list(zip(a[keep].tolist(), b[keep].tolist()))
    ds = ray.data.from_arrow(pa.table({
        "doc_a": a[keep], "doc_b": b[keep]})).repartition(4)
    stars = connected_components(ds, small_graph_limit=limit).to_pandas()
    got = _stars_to_labels(stars)
    want = _uf_components(edges)
    # every node involved in an edge must map to its component min
    assert got == want
    # converged stars: every doc_b appears exactly once, no doc_a as doc_b
    assert stars["doc_b"].is_unique
    assert not set(stars["doc_a"]) & set(stars["doc_b"])


def test_cc_empty_and_single(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64())}))
    assert connected_components(ds).count() == 0

    ds1 = ray.data.from_arrow(pa.table({"doc_a": [7], "doc_b": [3]}))
    out = connected_components(ds1).to_pandas()
    assert out.values.tolist() == [[3, 7]]


def test_cc_long_chain(ray_session):
    """A path graph exercises multi-round convergence (diameter > 2)."""
    import ray.data

    n = 40
    ds = ray.data.from_arrow(pa.table({
        "doc_a": np.arange(n - 1, dtype=np.int64),
        "doc_b": np.arange(1, n, dtype=np.int64)})).repartition(4)
    stars = connected_components(ds).to_pandas()
    assert (stars["doc_a"] == 0).all()
    assert sorted(stars["doc_b"]) == list(range(1, n))


def test_minhash_dedup_transitive_chain(ray_session):
    """Near-dup clusters that only connect transitively (A~B in one
    bucket, B~C in another) must still collapse to one representative
    — exercises the distributed label propagation, not just pairs."""
    import ray.data

    from skyway_ray.functions.near_dup import minhash_lsh_dedup

    base = " ".join(f"tok{i}" for i in range(60))
    chain = [
        (200, base),
        (201, base + " extraone"),
        (202, base + " extraone extratwo"),
        (203, base + " extraone extratwo extrathree"),
    ]
    fillers = [(i, f"doc{i} " + " ".join(f"f{i}w{j}" for j in range(25)))
               for i in range(50)]
    rows = fillers + chain
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [r[0] for r in rows],
        "text": [r[1] for r in rows]})).repartition(4)
    out = minhash_lsh_dedup(ds, threshold=0.5).to_pandas()
    kept = set(out["doc_id"])
    assert 200 in kept
    assert not {201, 202, 203} & kept
    assert all(i in kept for i in range(50))


def test_cc_raises_on_non_convergence(ray_session):
    """Exhausting max_rounds without checksum stability must raise —
    a silently truncated edge set would keep duplicate cluster members
    downstream (the loser set would be incomplete)."""
    import pytest
    import ray.data

    n = 64  # path graph: diameter 63, far beyond 1 round
    ds = ray.data.from_arrow(pa.table({
        "doc_a": np.arange(n - 1, dtype=np.int64),
        "doc_b": np.arange(1, n, dtype=np.int64)})).repartition(4)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(ds, max_rounds=1, small_graph_limit=0)
    # and with enough rounds the same graph converges to one star
    stars = connected_components(ds, small_graph_limit=0).to_pandas()
    assert sorted(stars["doc_b"]) == list(range(1, n))
    assert set(stars["doc_a"]) == {0}
