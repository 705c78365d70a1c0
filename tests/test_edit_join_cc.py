"""Edit-distance join kernels (functions/edit_join.py) and the
standalone connected-components query: kernel fuzz vs an in-test
Levenshtein, candidate completeness of the symmetric-delete scheme,
distributed-vs-small-path CC parity, and end-to-end edit_join parity
on a planted corpus with empty strings and duplicate names."""

import itertools
import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from skyway_ray.functions.edit_join import (del1_hashes,
                                            edit_similarity_join,
                                            ed_le1_mask)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _fuzz_strings(seed: int, alpha: str, n: int, max_len: int):
    rnd = random.Random(seed)
    return sorted({''.join(rnd.choices(alpha, k=rnd.randint(0, max_len)))
                   for _ in range(n)})


@pytest.mark.parametrize("seed,alpha,max_len", [
    (1, "ab", 5), (2, "abc", 6), (3, "0123456789", 4)])
def test_ed_le1_mask_matches_levenshtein(seed, alpha, max_len):
    strs = _fuzz_strings(seed, alpha, 250, max_len)
    pairs = list(itertools.combinations(strs, 2)) + [(s, s) for s in strs]
    a = np.array([p[0] for p in pairs], dtype="U")
    b = np.array([p[1] for p in pairs], dtype="U")
    got = ed_le1_mask(a, b)
    want = np.array([_lev(x, y) <= 1 for x, y in pairs])
    assert (got == want).all()


def test_del1_candidates_complete():
    """Every true ed<=1 pair must share at least one variant hash
    (hash collisions only ever ADD candidates)."""
    strs = _fuzz_strings(7, "abc", 300, 6)
    names = np.array(strs, dtype="U")
    row, h = del1_hashes(names)
    by_row = {}
    for r, hh in zip(row, h):
        by_row.setdefault(int(r), set()).add(int(hh))
    for i, j in itertools.combinations(range(len(strs)), 2):
        if _lev(strs[i], strs[j]) <= 1:
            assert by_row[i] & by_row[j], (strs[i], strs[j])


def test_edit_join_end_to_end(ray_session, tmp_path):
    """Planted corpus: duplicates (distance 0), substitutions,
    inserts/deletes, empty string, and far-apart strings — the join
    must equal the quadratic truth exactly."""
    import ray.data

    names = ["", "a", "b", "ab", "ba", "abc", "abd", "abcd", "xyz",
             "abc", "zzzzzz", "zzzzz", "hello", "hallo", "help"]
    ids = list(range(100, 100 + len(names)))
    df = pd.DataFrame({"c_custkey": ids, "c_name": names})
    ds = ray.data.from_pandas(df)
    got = edit_similarity_join(ds, "c_custkey", "c_name",
                               n_rows=len(df)).to_pandas()
    got = set(zip(got["a_id"], got["b_id"]))
    want = {(ids[i], ids[j])
            for i, j in itertools.combinations(range(len(names)), 2)
            if _lev(names[i], names[j]) <= 1}
    assert got == want


def test_cc_distributed_path_parity(ray_session):
    """q_connected_components' graph through the FORCED distributed
    Hash-to-Min rounds must equal the small-graph union-find path."""
    import ray.data

    from skyway_ray.stages.cc import connected_components

    i = np.arange(0, 1000, dtype=np.int64)
    base = (i // 64) * 64
    h1 = ((i * 2654435761 + 12345) % 4294967296) % 16
    m1 = i % 64 != 0
    h2 = ((i * 1103515245 + 54321) % 4294967296) % 4
    m2 = (i % 64 == 0) & (i > 0) & (h2 == 0)
    edges = pd.DataFrame({
        "doc_a": np.concatenate([i[m1], i[m2]]),
        "doc_b": np.concatenate(
            [np.maximum(base[m1], i[m1] - 1 - h1[m1]), i[m2] - 64])})

    def stars_to_sets(stars: pd.DataFrame):
        return set(map(tuple, np.sort(
            stars[["doc_a", "doc_b"]].to_numpy(), axis=1).tolist()))

    small = connected_components(ray.data.from_pandas(edges)).to_pandas()
    dist = connected_components(ray.data.from_pandas(edges),
                                small_graph_limit=0).to_pandas()
    assert stars_to_sets(small) == stars_to_sets(dist)
    assert len(small) == len(dist)


def test_ks_partition_invariance(ray_session):
    """two_sample_ks must be invariant to bucket count / splitter
    choice (offsets make each bucket's scan exact), including heavy
    ties and a one-sided degenerate input."""
    import ray.data

    from skyway_ray.stages.global_scan import two_sample_ks

    rng = np.random.default_rng(7)
    v = np.concatenate([rng.integers(0, 50, 4000),
                        rng.integers(25, 80, 3000)]).astype(np.int64)
    isa = np.concatenate([np.ones(4000, np.int64),
                          np.zeros(3000, np.int64)])
    df = pd.DataFrame({"v6": v, "isa": isa})
    outs = [two_sample_ks(ray.data.from_pandas(df), "v6", "isa",
                          n_buckets=nb, seed=s)
            for nb, s in [(1, 42), (7, 42), (64, 1)]]
    d0 = outs[0]["d_scaled"].iloc[0]
    assert all(o["d_scaled"].iloc[0] == d0 for o in outs)

    # brute-force truth
    uv = np.unique(v)
    ca = np.array([(v[isa == 1] <= x).sum() for x in uv])
    cb = np.array([(v[isa == 0] <= x).sum() for x in uv])
    want = np.abs(ca * 3000 - cb * 4000).max()
    assert d0 == want

    one = pd.DataFrame({"v6": v[:100], "isa": np.ones(100, np.int64)})
    out = two_sample_ks(ray.data.from_pandas(one), "v6", "isa")
    assert out["d_scaled"].iloc[0] == 0 and out["n_b"].iloc[0] == 0
