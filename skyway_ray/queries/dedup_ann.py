"""dedup_ann query family (split from the former single-file queries module)."""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo.cells import cell_id, cell_sql
from ..geo.tiles import tile_sql, tile_xy
from ._common import (
    _DBSCAN_EPS,
    _DBSCAN_MINPTS,
    _SKETCH_QS,
    _nrows,
    _read,
    derive_latlon,
    latlon_sql,
)




def q_dedup_docs(sf_dir: str):
    """Exact dedup by document text: keep the min-doc_id row per text.

    The shuffle KEY is a 64-bit hash of the text (cheap int
    partitioning instead of long-string comparisons at shuffle time);
    the text rides as payload and run detection compares the exact
    text, so hash collisions cannot merge distinct docs.

    Scale shape: COARSE hash buckets via stages/scan.py keyed_scan —
    group count = bucket count (auto-scaled to a row budget), never the
    distinct-doc count; the per-bucket step is one vectorized
    first-occurrence mask over the (_h, doc_id)-sorted frame (equal
    texts share _h, so within a bucket the first occurrence in doc_id
    order IS the min-doc_id winner).  For wide rows where even the
    text payload shouldn't shuffle, ``stages.dedup.exact_dedup_bloom``
    (the ``bloom_dedup`` query) sizes cost by the duplicate rate
    instead."""
    from ..functions.text import fingerprint64
    from ..stages.scan import keyed_scan

    def add_h(b: pa.Table) -> pa.Table:
        # flat-buffer polynomial hash straight off the Arrow string
        # buffers — no per-row Python; any deterministic text hash
        # works here (the key only co-locates equal texts; run
        # detection compares the exact text)
        h = fingerprint64(b["text"])
        return b.append_column("_h", pa.array(h, pa.int64()))

    def first(d: pd.DataFrame) -> pd.DataFrame:
        mask = ~d.duplicated(subset=["text"]).to_numpy()
        return d.loc[mask, ["doc_id", "n_chars"]]

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    ds = ds.map_batches(add_h, batch_format="pyarrow")
    return keyed_scan(ds, key="_h", order=["doc_id"], fn=first,
                      n_rows=_nrows(sf_dir, "documents"))


def q_dedup_docs_sql() -> str:
    return ("SELECT min(doc_id) AS doc_id, min(n_chars) AS n_chars "
            "FROM documents GROUP BY text")


def q_bloom_dedup(sf_dir: str):
    """Unbounded-key exact dedup via the Bloom chain
    (stages/dedup.py exact_dedup_bloom): dup-key Bloom split +
    left_outer exact-confirm join — everything sized by the duplicate
    rate, never the distinct-key count.  Result rows equal plain
    dedup, so the oracle is the window-min filter."""
    from ..stages.dedup import exact_dedup_bloom

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    out = exact_dedup_bloom(ds, key="text", order_col="doc_id",
                            n_rows=_nrows(sf_dir, "documents"))
    return out.map_batches(lambda b: b.select(["doc_id", "n_chars"]),
                           batch_format="pyarrow")


def q_bloom_dedup_sql() -> str:
    return ("SELECT doc_id, n_chars FROM ("
            "SELECT doc_id, n_chars, min(doc_id) OVER (PARTITION BY text) "
            "AS w FROM documents) WHERE doc_id = w")


def q_minhash_exact(sf_dir: str):
    """MinHash+LSH near-dedup, hash-verifiable end-to-end: at
    ``threshold=1.0`` over word-SET shingles the verified clusters are
    exactly the token-set equivalence classes — ``jaccard >= 1.0`` iff
    the shingle sets are identical, identical sets give identical
    signatures hence identical band hashes in every band (recall 1),
    and the exact verify pass rejects every non-equal candidate.  The
    FULL distributed pipeline (band explode → sort-chain candidates →
    Bloom prefilter → two co-partition verify joins → connected
    components → loser filter) therefore reduces to "keep the min
    doc_id per distinct token set", which the window-min SQL oracle
    reproduces by partitioning on the sorted distinct token list."""
    from ..functions.near_dup import minhash_lsh_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = minhash_lsh_dedup(ds, threshold=1.0, shingle="token")
    return out.map_batches(lambda b: b.select(["doc_id"]),
                           batch_format="pyarrow")


def q_minhash_exact_sql() -> str:
    # [a-z0-9]+ over lower(text) == the Python tokenizer's
    # [A-Za-z0-9]+ over text.lower() for ASCII corpora
    return ("SELECT doc_id FROM (SELECT doc_id, min(doc_id) OVER ("
            "PARTITION BY list_sort(list_distinct(regexp_extract_all("
            "lower(text), '[a-z0-9]+')))) AS w FROM documents) "
            "WHERE doc_id = w")


def q_knn(sf_dir: str):
    """Exact kNN (k=5): supplier-derived probes against customer-derived
    reference points, via the per-cell sorted Hilbert-key index."""
    import pyarrow.parquet as pq

    from ..stages.knn import CellKnnIndex

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey"])
    ckey = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    clat, clon = derive_latlon(ckey)
    index = CellKnnIndex(clat, clon, ckey, res=5)

    def probe(batch: pa.Table) -> pa.Table:
        skey = batch["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        slat, slon = derive_latlon(skey)
        t = index.query_batch(slat, slon, 5, qids=skey)
        return pa.table({
            "probe_id": t["probe_id"],
            "neighbor_id": t["neighbor_id"],
            "knn_rank": t["rank"],
        })

    return _read(sf_dir, "supplier", ["s_suppkey"]).map_batches(
        probe, batch_format="pyarrow")


def q_ann_cosine(sf_dir: str):
    """Brute-force cosine top-10 for the first 5 embedding vectors
    (ANN baseline; numpy matmul per batch against broadcast queries)."""
    import pyarrow.parquet as pq
    import ray

    from ..functions.ann import (cosine_topk_batch, embeddings_to_matrix,
                                merge_topk, _normalize)
    from ..functions.near_dup import _obj_cached

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    qmask = emb["vec_id"].to_numpy(zero_copy_only=False) < 5
    qtab = emb.filter(pa.array(qmask))
    qm = _normalize(embeddings_to_matrix(qtab["embedding"]).astype(np.float64))
    qids = qtab["vec_id"].to_numpy(zero_copy_only=False)
    ref = ray.put((qm, qids))
    ds = _read(sf_dir, "embeddings")

    # stateless tasks + per-worker-process cache (setup is one ray.get
    # of a tiny matrix — an actor pool would cap parallelism instead)
    def topk_batch(batch: pa.Table) -> pa.Table:
        qm2, qids2 = _obj_cached(ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        vecs = embeddings_to_matrix(batch["embedding"])
        return cosine_topk_batch(vecs, ids, qm2, qids2, 10)

    partials = ds.map_batches(topk_batch, batch_format="pyarrow")
    out = merge_topk(partials, 10)
    return out.map_batches(
        lambda b: b.rename_columns(["query_id", "neighbor_id", "ann_rank"]),
        batch_format="pyarrow")


def q_ann_cosine_sql() -> str:
    return (
        "WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings "
        "WHERE vec_id < 5), "
        "sims AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
        "list_cosine_similarity(q.embedding, e.embedding) AS cos "
        "FROM q CROSS JOIN embeddings e), "
        "ranked AS (SELECT query_id, neighbor_id, row_number() OVER "
        "(PARTITION BY query_id ORDER BY "
        "cast(floor(cos * 1000000 + 0.5) AS bigint) DESC, neighbor_id) "
        "AS ann_rank "
        "FROM sims) "
        "SELECT query_id, neighbor_id, ann_rank FROM ranked WHERE ann_rank <= 10"
    )


def q_ivf_ann(sf_dir: str):
    """Distributed IVF ANN (functions/ann.py ivf_topk): sampled
    k-means centroids broadcast once, inverted lists co-located via
    ``groupby(centroid_id)``, per-list exact rerank of only the queries
    probing that list.  Approximate by construction (rows-only driver
    check; recall-vs-brute-force asserted in tests)."""
    import pyarrow.parquet as pq

    from ..functions.ann import _normalize, embeddings_to_matrix, ivf_topk

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    qmask = emb["vec_id"].to_numpy(zero_copy_only=False) < 5
    qtab = emb.filter(pa.array(qmask))
    qm = _normalize(embeddings_to_matrix(qtab["embedding"]).astype(np.float64))
    qids = qtab["vec_id"].to_numpy(zero_copy_only=False)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # the synthetic embeddings are near-isotropic (no cluster
    # structure), so 0.9 recall needs probing ~60% of lists; real
    # clustered corpora probe far fewer (see test_ivf_recall_clustered)
    out = ivf_topk(ds, qm, qids, k=10, n_centroids=16, n_probe=10)
    return out.map_batches(
        lambda b: b.rename_columns(["query_id", "neighbor_id", "ann_rank"]),
        batch_format="pyarrow")


def q_ivf_exact(sf_dir: str):
    """IVF ANN at FULL probe (``n_probe == n_centroids``): every query
    scans every inverted list, so each vector is scored exactly once
    and the result equals brute force — which makes the whole IVF
    plumbing (sampled k-means centroids, ``groupby(centroid_id)``
    inverted lists, slabbed per-list rerank, partial-top-k merge)
    hash-verifiable against the same quantized-cosine SQL oracle as
    ``ann_cosine``.  ``ivf_ann`` stays the approximate (rows-only)
    production shape."""
    import pyarrow.parquet as pq

    from ..functions.ann import _normalize, embeddings_to_matrix, ivf_topk

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    qmask = emb["vec_id"].to_numpy(zero_copy_only=False) < 5
    qtab = emb.filter(pa.array(qmask))
    qm = _normalize(embeddings_to_matrix(qtab["embedding"]).astype(np.float64))
    qids = qtab["vec_id"].to_numpy(zero_copy_only=False)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = ivf_topk(ds, qm, qids, k=10, n_centroids=16, n_probe=16)
    return out.map_batches(
        lambda b: b.rename_columns(["query_id", "neighbor_id", "ann_rank"]),
        batch_format="pyarrow")


def q_ivf_exact_sql() -> str:
    return q_ann_cosine_sql()


def q_embedding_dedup(sf_dir: str):
    """Embedding-cosine near-dedup (functions/near_dup.py
    embedding_lsh_dedup): hyperplane-LSH banding, exact cosine
    verification, distributed connected components — rows-only (the
    LSH bucketing is approximate by construction)."""
    from ..functions.near_dup import embedding_lsh_dedup

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return embedding_lsh_dedup(ds, threshold=0.95).map_batches(
        lambda b: b.select(["vec_id"]), batch_format="pyarrow")


def q_minhash_dedup(sf_dir: str):
    """MinHash+LSH near-dedup over documents (survivor doc_ids) —
    hash-verified END-TO-END at threshold 0.7: every stage of the
    distributed pipeline is deterministic plain arithmetic, so
    q_minhash_dedup_sql replays the whole thing in DuckDB — FNV-fold32
    token hashes, rotate-xor 3-gram shingles, 128 multiply-shift
    signature minima (the a/b coefficients embedded as literals),
    FNV band folds, the sorted-bucket CHAIN candidate scan (window
    lag over the engine's exact signed sort keys), exact shingle-set
    Jaccard verification, and component minima."""
    from ..functions.near_dup import minhash_lsh_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = minhash_lsh_dedup(ds, threshold=0.7)
    return out.map_batches(lambda b: b.select(["doc_id"]),
                           batch_format="pyarrow")


def q_minhash_dedup_sql(num_perm: int = 128, bands: int = 16,
                        ngram_n: int = 3, threshold: float = 0.7) -> str:
    """DuckDB replay of the full minhash_lsh_dedup pipeline (see
    q_minhash_dedup).  Stage-for-stage: gr = per-doc distinct shingle
    hashes; sig = per-perm minima (empty-token docs pin to U64MAX like
    ``signatures_from_flat``); bh/sh = band FNV folds + order-free set
    hash, compared in the engine's SIGNED int64 order; ed = the chain
    candidates (adjacent rows per (band, band_hash) bucket sorted by
    (set_hash, doc_id) — the engine emits exactly these, layout-
    independent); ver = exact Jaccard ≥ threshold with the engine's
    empty-vs-empty = 1.0 convention; reach/lab = connected-component
    minima (any CC algorithm agrees on min-per-component); survivors =
    everything not a non-min member."""
    import numpy as np

    from ..functions.near_dup import MinHasher
    from ..functions.sqlhash import (FNV_OFFSET, FNV_PRIME, fnv1a64_sql,
                                     fold32_sql, mul64_sql, rot64_sql,
                                     signed64_sql, xor64_sql)

    two64 = 1 << 64
    rows_per_band = num_perm // bands
    tok32 = fold32_sql(fnv1a64_sql("t"))
    gram3 = fold32_sql(xor64_sql(
        rot64_sql(xor64_sql(rot64_sql("h[i]", 13), "h[i+1]"), 13),
        "h[i+2]"))
    assert ngram_n == 3, "gram expression is unrolled for n=3"
    gram_short = fold32_sql(
        f"list_reduce(list_prepend(CAST(0 AS HUGEINT), h), "
        f"(acc, x) -> {xor64_sql(rot64_sql('acc', 13), 'x')})")
    mh = MinHasher(num_perm)
    a_u, b_u = mh.a.view(np.uint64), mh.b.view(np.uint64)
    perm_vals = ", ".join(
        f"({k}, CAST({int(a_u[k])} AS HUGEINT), "
        f"CAST({int(b_u[k])} AS HUGEINT))" for k in range(num_perm))
    c1 = (-7046029254386353131) % two64  # set_hash64's mix constants
    c2 = 0x0123456789ABCDEF
    fnvfold = (f"list_reduce(list_prepend(CAST({FNV_OFFSET} AS HUGEINT), "
               f"ss), (acc, v) -> "
               f"{mul64_sql(xor64_sql('acc', 'v'), FNV_PRIME)})")
    return f"""
WITH RECURSIVE tl AS (SELECT doc_id,
  regexp_extract_all(lower(text), '[a-z0-9]+') AS l FROM documents),
th AS (SELECT doc_id, list_transform(l, t -> {tok32}) AS h FROM tl),
gr AS (SELECT DISTINCT doc_id, g FROM (
  SELECT doc_id, unnest(CASE WHEN len(h) >= {ngram_n}
    THEN list_transform(range(1, len(h) - 1), i -> {gram3})
    ELSE [{gram_short}] END) AS g
  FROM th WHERE len(h) > 0)),
perms(k, a, b) AS (VALUES {perm_vals}),
sig AS (SELECT doc_id, k, min((a * g + b) % {two64}) AS s
        FROM gr CROSS JOIN perms GROUP BY 1, 2
        UNION ALL SELECT t.doc_id, p.k, CAST({two64 - 1} AS HUGEINT)
        FROM th t CROSS JOIN perms p WHERE len(t.h) = 0),
bnd AS (SELECT doc_id, k // {rows_per_band} AS band_id,
        list(s ORDER BY k) AS ss FROM sig GROUP BY 1, 2),
bh AS (SELECT doc_id, band_id, {fnvfold} AS v FROM bnd),
sh AS (SELECT doc_id, CAST(sum((g * {c1} + {c2}) % {two64})
       % {two64} AS HUGEINT) AS v FROM gr GROUP BY 1),
rws AS (SELECT b.doc_id, b.band_id, {signed64_sql('b.v')} AS bhs,
        {signed64_sql('COALESCE(s.v, 0)')} AS shs
        FROM bh b LEFT JOIN sh s ON s.doc_id = b.doc_id),
ed AS (SELECT DISTINCT pd AS doc_a, doc_id AS doc_b FROM (
  SELECT doc_id, lag(doc_id) OVER (
    PARTITION BY band_id, bhs ORDER BY shs, doc_id) AS pd FROM rws)
  WHERE pd IS NOT NULL AND pd != doc_id),
cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM gr GROUP BY 1),
it AS (SELECT e.doc_a, e.doc_b, CAST(count(*) AS BIGINT) AS i
       FROM ed e JOIN gr ga ON ga.doc_id = e.doc_a
                 JOIN gr gb ON gb.doc_id = e.doc_b AND gb.g = ga.g
       GROUP BY 1, 2),
ver AS (SELECT e.doc_a, e.doc_b FROM ed e
        LEFT JOIN it ON it.doc_a = e.doc_a AND it.doc_b = e.doc_b
        LEFT JOIN cnt ca ON ca.doc_id = e.doc_a
        LEFT JOIN cnt cb ON cb.doc_id = e.doc_b
        WHERE CASE WHEN COALESCE(ca.n, 0) + COALESCE(cb.n, 0) = 0
              THEN TRUE ELSE CAST(COALESCE(it.i, 0) AS DOUBLE)
              / (COALESCE(ca.n, 0) + COALESCE(cb.n, 0)
                 - COALESCE(it.i, 0)) >= {threshold!r} END),
und AS (SELECT doc_a AS a, doc_b AS b FROM ver
        UNION SELECT doc_b, doc_a FROM ver),
reach AS (SELECT a AS n, b AS m FROM und
          UNION SELECT r.n, u.b FROM reach r JOIN und u ON u.a = r.m),
lab AS (SELECT n, min(m) AS mn FROM reach GROUP BY 1)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT n FROM lab WHERE mn < n)
"""


def q_simhash(sf_dir: str):
    """SimHash fingerprints over documents — hash-verified: the token
    hash is FNV-1a 64 (plain byte arithmetic the oracle replays in
    HUGEINT via list_reduce), the per-bit vote 2·ones − n is exact
    integer, and the packed word converts uint64 → int64 identically
    on both sides."""
    from ..functions.near_dup import simhash64

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "simhash": simhash64(batch["text"])})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pandas")


def q_simhash_sql() -> str:
    from ..functions.sqlhash import fnv1a64_sql

    return (
        "WITH tok AS (SELECT doc_id, "
        "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tk "
        "FROM documents), "
        f"h AS (SELECT doc_id, {fnv1a64_sql('tk')} AS h FROM tok), "
        "ji AS (SELECT unnest(range(0, 64)) AS j), "
        "bits AS (SELECT doc_id, j, "
        "CAST(sum(CASE WHEN (h // (CAST(1 AS HUGEINT) << j)) % 2 = 1 "
        "THEN 1 ELSE 0 END) AS BIGINT) AS ones, "
        "CAST(count(*) AS BIGINT) AS n "
        "FROM h CROSS JOIN ji GROUP BY 1, 2), "
        "pk AS (SELECT doc_id, sum(CASE WHEN 2 * ones - n > 0 "
        "THEN CAST(1 AS HUGEINT) << j ELSE CAST(0 AS HUGEINT) END) AS v "
        "FROM bits GROUP BY 1) "
        "SELECT d.doc_id, CAST(CASE WHEN COALESCE(pk.v, 0) >= "
        "9223372036854775808 THEN COALESCE(pk.v, 0) "
        "- 18446744073709551616 ELSE COALESCE(pk.v, 0) END AS BIGINT) "
        "AS simhash FROM documents d LEFT JOIN pk USING (doc_id)"
    )


def q_hll_users(sf_dir: str) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT user_id) via a HyperLogLog sketch
    (stages/hll.py): one streaming pass, per-block 16 KiB register
    blobs folded by a map_batches tree — no shuffle, no driver funnel.
    The ESTIMATE itself is hash-verified: integer keys hash with
    splitmix64 (SQL-replayable in HUGEINT), register max-merge is
    exact, the harmonic sum is an exact integer, and the final value
    is one pinned float expression — so the oracle replays the sketch
    algorithm, not the exact distinct count (which is the separate
    hash-verified ``distinct_users``)."""
    from ..stages.hll import hll_distinct

    est = hll_distinct(_read(sf_dir, "events", ["user_id"]), "user_id")
    return pd.DataFrame({"distinct_users_est": [int(np.floor(est + 0.5))]})


def q_hll_users_sql() -> str:
    from ..stages.hll import hll_estimate_sql, hll_reg_rows_sql

    reg = hll_reg_rows_sql("events", "user_id", p=14)
    est = hll_estimate_sql(reg, p=14)
    return (f"SELECT CAST(floor(est + 0.5) AS BIGINT) "
            f"AS distinct_users_est FROM ({est})")


def q_hll_users_by_type(sf_dir: str) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT user_id) per event_type via grouped
    HLL sketches: the groupby shuffle carries groups×blocks 4 KiB
    blobs, never (group, user) pairs (stages/hll.py hll_distinct_by).
    Hash-verified like ``hll_users`` — the oracle replays the sketch
    per group (splitmix64 registers, exact integer harmonic sum,
    pinned finalize)."""
    from ..stages.hll import hll_distinct_by

    return hll_distinct_by(
        _read(sf_dir, "events", ["event_type", "user_id"]),
        "event_type", "user_id").sort_values("event_type")


def q_hll_users_by_type_sql() -> str:
    from ..stages.hll import hll_estimate_sql, hll_reg_rows_sql

    reg = hll_reg_rows_sql("events", "user_id", p=12,
                           group_cols="event_type")
    est = hll_estimate_sql(reg, p=12, group_cols="event_type")
    return (f"SELECT event_type, CAST(floor(est + 0.5) AS BIGINT) "
            f"AS n_distinct_est FROM ({est})")


def q_pq_ann(sf_dir: str) -> pd.DataFrame:
    """Product-quantization ANN (functions/ann.py pq_topk): codebooks
    train on a layout-independent hash sample and broadcast once; the
    corpus encodes to 8-byte codes (zero-copy fixed-size binary — the
    scan table is ~32x smaller than the raw vectors); the ADC scan
    emits bounded per-batch partial pools; only the merged candidate
    ids are fetched for the exact rerank.  Approximate ⇒ rows-only
    (recall vs brute force asserted in tests)."""
    import pyarrow.parquet as pq

    from ..functions.ann import _normalize, embeddings_to_matrix, pq_topk

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    qmask = emb["vec_id"].to_numpy(zero_copy_only=False) < 5
    qtab = emb.filter(pa.array(qmask))
    qm = _normalize(embeddings_to_matrix(qtab["embedding"]).astype(np.float64))
    qids = qtab["vec_id"].to_numpy(zero_copy_only=False)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return pq_topk(ds, qm, qids, k=10, m=8, n_codes=16, rerank=8)


def q_setsim_pairs(sf_dir: str):
    """Exact set-similarity self-join (word-3-shingle Jaccard ≥ 0.9)
    over documents via rarest-first prefix filtering
    (functions/setsim.py — AllPairs/PPJoin family, Vernica et al.
    SIGMOD'10 distributed shape).  Every qualifying pair is found
    exactly — LSH appears nowhere — so the quadratic SQL oracle
    matches bit-for-bit.  Shingles (not single words) because the
    fixture corpus has a ~31-word vocabulary: word-level similarity
    is degenerate there (most pairs qualify), while shingle similarity
    isolates the planted near-duplicates."""
    from ..functions.setsim import setsim_join

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return setsim_join(ds, tau=0.9, freq_order=True, ngram_words=3)


def q_setsim_pairs_sql() -> str:
    from ..functions.setsim import setsim_sql

    return setsim_sql("documents", 0.9, ngram_words=3)


def q_embedding_stats(sf_dir: str):
    """Per-label stats over the list<float> embedding column: row-local
    squared-norm quantized to micro-ints (order-free integer sums —
    a float Σx² would be summation-order-dependent), aggregated on the
    bounded-label combiner tree."""
    from ..stages.agg_tree import tree_aggregate

    def partial(b: pa.Table) -> pa.Table:
        emb = b["embedding"]
        flat = emb.combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.float64)
        offs = np.asarray(emb.combine_chunks().offsets)
        offs = offs - offs[0]  # flatten() trims to the referenced range
        sq = np.floor(flat * flat * 1e6 + 0.5).astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(sq)])
        norm2 = csum[offs[1:]] - csum[offs[:-1]]
        t = pa.table({"label": b["label"].cast(pa.int64()),
                      "norm2_micro": pa.array(norm2, pa.int64()),
                      "n": pa.array(np.ones(len(norm2), np.int64))})
        g = t.group_by(["label"]).aggregate(
            [("norm2_micro", "sum"), ("n", "sum")])
        return g.rename_columns(["label", "norm2_micro", "n"])

    ds = _read(sf_dir, "embeddings", ["embedding", "label"])
    return tree_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                          ["label"],
                          [("norm2_micro", "sum"), ("n", "sum")])


def q_embedding_stats_sql() -> str:
    return (
        "SELECT CAST(label AS BIGINT) AS label, "
        "CAST(sum(m) AS BIGINT) AS norm2_micro, "
        "CAST(count(*) AS BIGINT) AS n FROM ("
        "SELECT label, (SELECT sum(CAST(floor(CAST(e AS DOUBLE) * "
        "CAST(e AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) "
        "FROM unnest(embedding) AS u(e)) AS m FROM embeddings) "
        "GROUP BY label"
    )


def q_kmeans(sf_dir: str):
    """2-iteration k-means (k=4) over the embeddings in exact
    micro-int arithmetic (stages/kmeans.py): centroids broadcast, one
    streaming partial-sum pass per iteration, pinned-double centroid
    division — bit-identical to the unrolled SQL oracle."""
    from ..stages.kmeans import kmeans_micro

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans_micro(ds, k=4, iters=2)


def q_kmeans_sql() -> str:
    def assign(cents: str, name: str) -> str:
        return (
            f"{name} AS (SELECT vec_id, cl FROM ("
            f"SELECT v.vec_id, c.cl, row_number() OVER ("
            f"PARTITION BY v.vec_id ORDER BY "
            f"sum((v.x - c.c) * (v.x - c.c)), c.cl) AS rn "
            f"FROM v JOIN {cents} c ON c.dim = v.dim "
            f"GROUP BY v.vec_id, c.cl) WHERE rn = 1)"
        )

    def update(assign_name: str, prev: str, name: str) -> str:
        return (
            f"{name} AS (SELECT p.cl, p.dim, COALESCE(u.nc, p.c) AS c "
            f"FROM {prev} p LEFT JOIN ("
            f"SELECT a.cl, v.dim, CAST(floor(CAST(sum(v.x) AS DOUBLE) "
            f"/ CAST(count(*) AS DOUBLE)) AS BIGINT) AS nc "
            f"FROM {assign_name} a JOIN v ON v.vec_id = a.vec_id "
            f"GROUP BY a.cl, v.dim) u "
            f"ON u.cl = p.cl AND u.dim = p.dim)"
        )

    return (
        "WITH v AS (SELECT vec_id, i - 1 AS dim, "
        "CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) "
        "AS BIGINT) AS x FROM embeddings, "
        "UNNEST(range(1, len(embedding) + 1)) t(i)), "
        "c0 AS (SELECT vec_id AS cl, dim, x AS c FROM v WHERE vec_id < 4), "
        f"{assign('c0', 'a1')}, "
        f"{update('a1', 'c0', 'c1')}, "
        f"{assign('c1', 'a2')}, "
        f"{update('a2', 'c1', 'c2')} "
        "SELECT cs.cl AS cluster, COALESCE(n.n, 0) AS n, cs.csum "
        "AS centroid_sum FROM "
        "(SELECT cl, CAST(sum(c) AS BIGINT) AS csum FROM c2 GROUP BY cl) cs "
        "LEFT JOIN (SELECT cl, CAST(count(*) AS BIGINT) AS n FROM a2 "
        "GROUP BY cl) n ON n.cl = cs.cl"
    )


def q_nb_features(sf_dir: str):
    """Naive-Bayes-style model training over documents: per-language
    word counts (the likelihood table) reduced to each language's
    top-5 tokens by (count DESC, token ASC).  Per-batch wordcount
    combine → one (lang, token) shuffle → per-group pre-reduced top-k
    (the stages/topk.py grouped shape)."""
    import re as _re

    def partial(b: pd.DataFrame) -> pa.Table:
        langs, toks = [], []
        for lang, text in zip(b["lang"], b["text"]):
            ws = _re.findall(r"[a-z0-9]+", text.lower())
            langs.extend([lang] * len(ws))
            toks.extend(ws)
        t = pa.table({"lang": pa.array(langs, pa.string()),
                      "token": pa.array(toks, pa.string()),
                      "n": pa.array(np.ones(len(toks), np.int64))})
        g = t.group_by(["lang", "token"]).aggregate([("n", "sum")])
        return g.rename_columns(["lang", "token", "n"])

    def top5(g: pd.DataFrame) -> pd.DataFrame:
        d = (g.groupby(["lang", "token"], as_index=False)["n"].sum()
             .sort_values(["n", "token"], ascending=[False, True],
                          kind="mergesort").head(5))
        return d

    ds = _read(sf_dir, "documents", ["lang", "text"]).map_batches(
        partial, batch_format="pandas")
    return ds.groupby("lang").map_groups(top5, batch_format="pandas")


def q_nb_features_sql() -> str:
    return (
        "WITH w AS (SELECT lang, unnest(regexp_extract_all(lower(text), "
        "'[a-z0-9]+')) AS token FROM documents), "
        "c AS (SELECT lang, token, count(*) AS n FROM w GROUP BY 1, 2), "
        "r AS (SELECT lang, token, CAST(n AS BIGINT) AS n, row_number() "
        "OVER (PARTITION BY lang ORDER BY n DESC, token) AS rn FROM c) "
        "SELECT lang, token, n FROM r WHERE rn <= 5"
    )


def q_hamming_topk(sf_dir: str):
    """Binary-code similarity search (the phash-style ANN primitive):
    top-10 nearest 64-bit codes per query by Hamming distance, ties by
    id.  Codes derive from event ids with the house modular mixing (so
    the oracle derives bit-identical codes with DuckDB's
    ``bit_count(xor(...))``); the scan is a vectorized SWAR popcount
    over xor'd uint64 batches against the broadcast 5-query code
    vector, each batch keeps its local top-10 per query, and the
    driver merges the bounded partials — the brute-force baseline
    whose scale path is Hamming-band LSH (functions/phash.py)."""
    import ray

    ds = _read(sf_dir, "events", ["event_id"])

    def codes_of(ids: np.ndarray) -> np.ndarray:
        hi = (ids * 2654435761 + 12345) % 4294967296
        lo = (ids * 1103515245 + 54321) % 4294967296
        return (hi % 2147483648) * 4294967296 + lo

    qids = np.arange(5, dtype=np.int64)
    qcodes = codes_of(qids).astype(np.uint64)

    def popcount64(x: np.ndarray) -> np.ndarray:
        x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
        x = ((x & np.uint64(0x3333333333333333))
             + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333)))
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        return ((x * np.uint64(0x0101010101010101))
                >> np.uint64(56)).astype(np.int64)

    def partial(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy(zero_copy_only=False)
        if not len(ids):
            return pa.table({"qid": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64())})
        codes = codes_of(ids).astype(np.uint64)
        out_q, out_n, out_d = [], [], []
        for qi, qc in zip(qids, qcodes):
            d = popcount64(codes ^ qc)
            order = np.lexsort((ids, d))[:10]
            out_q.append(np.full(len(order), qi, np.int64))
            out_n.append(ids[order])
            out_d.append(d[order])
        return pa.table({"qid": pa.array(np.concatenate(out_q), pa.int64()),
                         "neighbor_id": pa.array(np.concatenate(out_n),
                                                 pa.int64()),
                         "dist": pa.array(np.concatenate(out_d), pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    order = np.lexsort((parts["neighbor_id"].to_numpy(),
                        parts["dist"].to_numpy(),
                        parts["qid"].to_numpy()))
    d = parts.iloc[order]
    qcol = d["qid"].to_numpy()
    new = np.ones(len(d), dtype=bool)
    new[1:] = qcol[1:] != qcol[:-1]
    starts = np.flatnonzero(new)
    sizes = np.diff(np.append(starts, len(d)))
    loc = np.arange(len(d), dtype=np.int64) - np.repeat(starts, sizes)
    keep = loc < 10
    return pd.DataFrame({"qid": qcol[keep],
                         "neighbor_id": d["neighbor_id"].to_numpy()[keep],
                         "rank": (loc[keep] + 1).astype(np.int64)})


def q_hamming_topk_sql() -> str:
    code = ("(((event_id * 2654435761 + 12345) % 4294967296) % 2147483648)"
            " * 4294967296 + ((event_id * 1103515245 + 54321) % 4294967296)")
    return (
        f"WITH c AS (SELECT event_id, {code} AS code FROM events), "
        "q AS (SELECT event_id AS qid, code AS qcode FROM c "
        "WHERE event_id < 5) "
        "SELECT qid, event_id AS neighbor_id, rank FROM ("
        "SELECT q.qid, c.event_id, row_number() OVER (PARTITION BY q.qid "
        "ORDER BY bit_count(xor(c.code, q.qcode)), c.event_id) AS rank "
        "FROM c CROSS JOIN q) t WHERE rank <= 10"
    )


def q_edit_join(sf_dir: str):
    """Edit-distance-1 similarity self-join over customer names
    (functions/edit_join.py — FastSS symmetric-delete candidates from
    polynomial prefix-hashes, exact vectorized verify).  Hash-verified
    against DuckDB's levenshtein."""
    from ..functions.edit_join import edit_similarity_join

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    return edit_similarity_join(ds, "c_custkey", "c_name",
                                n_rows=_nrows(sf_dir, "customer"))


def q_edit_join_sql() -> str:
    return (
        "SELECT a.c_custkey AS a_id, b.c_custkey AS b_id "
        "FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey "
        "AND abs(length(a.c_name) - length(b.c_name)) <= 1 "
        "AND levenshtein(a.c_name, b.c_name) <= 1"
    )


def q_label_scatter(sf_dir: str):
    """Per-label cluster tightness over the embedding table (the
    intra-class scatter used for embedding-quality audits): pass 1
    streams per-batch (label, dim) integer sums over milli-quantized
    vectors into the bounded combiner tree, centroids divide ONCE in
    pinned doubles (the kmeans recipe), pass 2 broadcasts the tiny
    centroid matrix in the task closure and integer-sums each vector's
    exact squared distance to its own-label centroid.  Milli (not
    micro) quantization keeps the sf0.1 scatter sums inside int64."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def _milli(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        arr = b["embedding"].combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64)
        offs = np.asarray(arr.offsets)
        d = int(offs[1] - offs[0]) if len(offs) > 1 else 0
        x = np.floor(flat * 1e3 + 0.5).astype(np.int64).reshape(-1, d)
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        return lab, x

    def sums(b: pa.Table) -> pa.Table:
        lab, x = _milli(b)
        u, inv = np.unique(lab, return_inverse=True)
        d = x.shape[1]
        s = np.zeros((len(u), d), np.int64)
        np.add.at(s, inv, x)
        cnt = np.bincount(inv, minlength=len(u)).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(u, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                    len(u))),
            "sx": pa.array(s.reshape(-1)),
            "n": pa.array(np.repeat(cnt, d))})

    read = lambda: _read(sf_dir, "embeddings", ["embedding", "label"])
    st = tree_aggregate_to_table(
        read().map_batches(sums, batch_format="pyarrow"),
        ["label", "dim"], [("sx", "sum"), ("n", "sum")]).to_pandas()
    st = st.sort_values(["label", "dim"], kind="mergesort")
    labels = st["label"].to_numpy()[::st["dim"].max() + 1]
    d = int(st["dim"].max()) + 1
    cent = np.floor(st["sx"].to_numpy().astype(np.float64)
                    / st["n"].to_numpy().astype(np.float64)
                    ).astype(np.int64).reshape(len(labels), d)

    def scatter(b: pa.Table) -> pa.Table:
        lab, x = _milli(b)
        idx = np.searchsorted(labels, lab)  # labels sorted ascending
        diff = x - cent[idx]
        sq = np.sum(diff * diff, axis=1)
        t = pa.table({"label": pa.array(lab),
                      "n_vecs": pa.array(np.ones(len(lab), np.int64)),
                      "ssd": pa.array(sq)})
        return (t.group_by(["label"])
                 .aggregate([("n_vecs", "sum"), ("ssd", "sum")])
                 .rename_columns(["label", "n_vecs", "ssd"]))

    return tree_aggregate_to_table(
        read().map_batches(scatter, batch_format="pyarrow"),
        ["label"], [("n_vecs", "sum"), ("ssd", "sum")])


def q_label_scatter_sql() -> str:
    return (
        "WITH v AS (SELECT vec_id, label, i - 1 AS dim, "
        "CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) "
        "AS x FROM embeddings, UNNEST(range(1, len(embedding) + 1)) t(i)), "
        "c AS (SELECT label, dim, CAST(floor(CAST(sum(x) AS DOUBLE) / "
        "CAST(count(*) AS DOUBLE)) AS BIGINT) AS c FROM v "
        "GROUP BY 1, 2), "
        "d AS (SELECT v.vec_id, v.label, (v.x - c.c) * (v.x - c.c) AS sq "
        "FROM v JOIN c ON c.label = v.label AND c.dim = v.dim) "
        "SELECT CAST(label AS BIGINT) AS label, "
        "CAST(count(*) / (SELECT max(dim) + 1 FROM c) AS BIGINT) "
        "AS n_vecs, CAST(sum(sq) AS BIGINT) AS ssd FROM d GROUP BY label"
    )


def q_nearest_center(sf_dir: str):
    """Broadcast nearest-center assignment (the k-means / IVF assign
    shape): every event point snaps to its closest nation center by
    EXACT integer squared distance on microdegree coordinates (no
    float argmin ties), reduced to per-center (count, Σd²) partials
    inside each batch and merged on the bounded combiner tree — the
    25-row center table is closure-captured, points never shuffle."""
    import pyarrow.parquet as pq

    from ..stages.agg_tree import tree_aggregate_to_table

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey"]).to_pandas()
    ck = np.sort(nat["n_nationkey"].to_numpy().astype(np.int64))
    clat, clon = derive_latlon(ck)
    cx6 = np.floor(clon * 1e6 + 0.5).astype(np.int64)
    cy6 = np.floor(clat * 1e6 + 0.5).astype(np.int64)

    def assign(b: pa.Table) -> pa.Table:
        k = b["event_id"].to_numpy(zero_copy_only=False)
        lat, lon = derive_latlon(k)
        x6 = np.floor(lon * 1e6 + 0.5).astype(np.int64)
        y6 = np.floor(lat * 1e6 + 0.5).astype(np.int64)
        dx = x6[:, None] - cx6[None, :]
        dy = y6[:, None] - cy6[None, :]
        d2 = dx * dx + dy * dy
        j = np.argmin(d2, axis=1)  # ck sorted asc -> ties take min key
        t = pa.table({
            "center": pa.array(ck[j], pa.int64()),
            "n": pa.array(np.ones(len(k), np.int64)),
            "sum_d2": pa.array(d2[np.arange(len(k)), j], pa.int64())})
        return (t.group_by(["center"])
                 .aggregate([("n", "sum"), ("sum_d2", "sum")])
                 .rename_columns(["center", "n", "sum_d2"]))

    parts = _read(sf_dir, "events", ["event_id"]).map_batches(
        assign, batch_format="pyarrow")
    return tree_aggregate_to_table(
        parts, ["center"], [("n", "sum"), ("sum_d2", "sum")])


def q_nearest_center_sql() -> str:
    elat, elon = latlon_sql("event_id")
    nlat, nlon = latlon_sql("CAST(n_nationkey AS BIGINT)")
    return (
        f"WITH p AS (SELECT event_id, "
        f"CAST(floor({elon} * 1000000 + 0.5) AS BIGINT) AS x6, "
        f"CAST(floor({elat} * 1000000 + 0.5) AS BIGINT) AS y6 "
        "FROM events), "
        f"c AS (SELECT n_nationkey AS ck, "
        f"CAST(floor({nlon} * 1000000 + 0.5) AS BIGINT) AS cx6, "
        f"CAST(floor({nlat} * 1000000 + 0.5) AS BIGINT) AS cy6 "
        "FROM nation), "
        "d AS (SELECT event_id, ck, (x6 - cx6) * (x6 - cx6) + "
        "(y6 - cy6) * (y6 - cy6) AS d2 FROM p, c), "
        "a AS (SELECT event_id, ck, d2, row_number() OVER ("
        "PARTITION BY event_id ORDER BY d2, ck) AS rn FROM d) "
        "SELECT CAST(ck AS BIGINT) AS center, CAST(count(*) AS BIGINT) "
        "AS n, CAST(sum(d2) AS BIGINT) AS sum_d2 FROM a WHERE rn = 1 "
        "GROUP BY ck"
    )


def q_spatial_clusters(sf_dir: str):
    """ε-radius spatial clustering (the DBSCAN-core shape): event
    points within 1.0 planar degree are linked, clusters are the
    connected components, and each clustered point reports its
    cluster id (= min event_id in the component).  Composition of two
    house distributed primitives: the no-dedup PBSM radius self-join
    (stages/spatial_join.py — points meet only inside shared grid
    cells, never all-pairs) feeding Hash-to-Min connected components
    (stages/cc.py).  Only edge endpoints appear (isolated points are
    DBSCAN noise)."""
    import pyarrow.compute as pc

    from ..stages.cc import connected_components
    from ..stages.scan import hash_bucket_scan
    from ..stages.spatial_join import point_radius_join

    def pts(b: pa.Table) -> pa.Table:
        k = b["event_id"].to_numpy(zero_copy_only=False)
        lat, lon = derive_latlon(k)
        return pa.table({"id": pa.array(k), "x": pa.array(lon),
                         "y": pa.array(lat)})

    a = _read(sf_dir, "events", ["event_id"]).map_batches(
        pts, batch_format="pyarrow")
    b = _read(sf_dir, "events", ["event_id"]).map_batches(
        pts, batch_format="pyarrow")
    pairs = point_radius_join(a, b, radius=1.0, cell=8.0,
                              out_a="doc_a", out_b="doc_b")
    edges = pairs.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t["doc_a"], t["doc_b"]))),
        batch_format="pyarrow")
    stars = connected_components(edges)

    def member_rows(t: pa.Table) -> pa.Table:
        c = t["doc_a"].to_numpy(zero_copy_only=False)
        m = t["doc_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(np.concatenate([m, c]), pa.int64()),
            "comp": pa.array(np.concatenate([c, c]), pa.int64())})

    return hash_bucket_scan(
        stars.map_batches(member_rows, batch_format="pyarrow"), ["node"],
        lambda t: t.group_by(["node"]).aggregate([("comp", "min")])
                   .rename_columns(["node", "comp"]),
        n_rows=_nrows(sf_dir, "events"))


def q_spatial_clusters_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        "WITH RECURSIVE "
        f"p AS (SELECT event_id AS id, {lon} AS x, {lat} AS y "
        "FROM events), "
        "e AS (SELECT a.id AS u, b.id AS v FROM p a JOIN p b ON "
        "a.id <> b.id AND (a.x - b.x) * (a.x - b.x) + "
        "(a.y - b.y) * (a.y - b.y) <= 1.0), "
        "nodes AS (SELECT DISTINCT u AS node FROM e), "
        "walk(node, cur) AS ("
        "SELECT node, node FROM nodes "
        "UNION "
        "SELECT w.node, e.v FROM walk w JOIN e ON e.u = w.cur) "
        "SELECT node, min(cur) AS comp FROM walk GROUP BY node"
    )


def q_dbscan(sf_dir: str):
    """Full DBSCAN over event points (ε = 1.0°, minPts = 3): every
    point is classified core (role 2, ≥ minPts−1 ε-neighbors), border
    (role 1, non-core with a core ε-neighbor — assigned the MIN
    cluster id among its core neighbors, the deterministic variant)
    or noise (role 0, comp −1).  Cluster ids are component-min node
    ids over the core–core edge graph; an isolated core (no core
    neighbor) forms its own singleton cluster.

    Everything is ids-only after the PBSM radius self-join, and the
    plan has exactly TWO pipeline breaks: the edge set (reused for
    sizing and both flag passes) and the flagged edge set.  Degrees
    never exist as a separate dataset — edges carry both directions,
    so a bucket keyed on one endpoint holds ALL of that endpoint's
    edges and its degree is a bucket-LOCAL count; two chained
    exchanges therefore attach both endpoint core flags.  Core-core
    edges feed the distributed CC stage, border minima ride one more
    exchange, and the final role/comp labels attach to the id stream
    through a single copart left join of the disjoint core ∪ border
    label union — points are never broadcast and nothing all-pairs."""
    import pyarrow.compute as pc

    from ..stages.cc import connected_components
    from ..stages.graph import edge_state_messages
    from ..stages.joins import copart_hash_join
    from ..stages.scan import auto_n_buckets, hash_bucket_scan
    from ..stages.spatial_join import point_radius_join

    def pts(b: pa.Table) -> pa.Table:
        k = b["event_id"].to_numpy(zero_copy_only=False)
        lat, lon = derive_latlon(k)
        return pa.table({"id": pa.array(k), "x": pa.array(lon),
                         "y": pa.array(lat)})

    a = _read(sf_dir, "events", ["event_id"]).map_batches(
        pts, batch_format="pyarrow")
    b = _read(sf_dir, "events", ["event_id"]).map_batches(
        pts, batch_format="pyarrow")
    pairs = point_radius_join(a, b, radius=_DBSCAN_EPS, cell=8.0,
                              out_a="u", out_b="v")
    edges = pairs.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t["u"], t["v"]))),
        batch_format="pyarrow").materialize()
    n_edges = edges.count()
    nb = auto_n_buckets(n_edges)
    if n_edges == 0:
        # no point has an ε-neighbor: everything is noise (the empty
        # edge Dataset carries no schema, so bail before the label
        # plan rather than teaching every stage about it)
        return _read(sf_dir, "events", ["event_id"]).map_batches(
            lambda t: pa.table({
                "id": t["event_id"].combine_chunks().cast(pa.int64()),
                "role": pa.array(np.zeros(len(t), np.int64)),
                "comp": pa.array(np.full(len(t), -1, np.int64))}),
            batch_format="pyarrow")

    def _deg_flag(key: str):
        """Bucket fn keyed on ``key``: per-key row count IS the
        degree (edges carry both directions), so the core flag needs
        no degree dataset or extra exchange."""
        def fn(t: pa.Table) -> pa.Table:
            k = t[key].to_numpy(zero_copy_only=False)
            _, inv, cnt = np.unique(k, return_inverse=True,
                                    return_counts=True)
            flag = (cnt[inv] >= _DBSCAN_MINPTS - 1).astype(np.int64)
            return t.append_column(key + "core", pa.array(flag))
        return fn

    def _border_min_labels(t: pa.Table) -> pa.Table:
        # core/border lid sets are disjoint and every row of a lid
        # shares its lrole, so (min lcomp, max lrole) folds border
        # candidates while passing core labels through unchanged
        return (t.group_by(["lid"])
                .aggregate([("lcomp", "min"), ("lrole", "max")])
                .rename_columns(["lid", "lcomp", "lrole"]))

    def flag_v_keep_core(t: pa.Table) -> pa.Table:
        t2 = _deg_flag("v")(t)
        return (t2.filter(pc.equal(t2["vcore"], 1))
                .drop_columns(["vcore"]))

    # two chained exchanges: ucore keyed by u, then vcore keyed by v;
    # only v-core rows survive (they are all CC input or border input)
    evc = hash_bucket_scan(
        hash_bucket_scan(edges, ["u"], _deg_flag("u"), n_buckets=nb),
        ["v"], flag_v_keep_core, n_buckets=nb).materialize()

    stars = connected_components(evc.map_batches(
        lambda t: t.filter(pc.equal(t["ucore"], 1))
                   .select(["u", "v"]).rename_columns(
                       ["doc_a", "doc_b"]),
        batch_format="pyarrow"))

    def member_rows(t: pa.Table) -> pa.Table:
        c = t["doc_a"].to_numpy(zero_copy_only=False)
        m = t["doc_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(np.concatenate([m, c]), pa.int64()),
            "comp": pa.array(np.concatenate([c, c]), pa.int64())})

    # lazy, consumed ONCE: the (core node → cluster id) state for the
    # single label exchange below; stars is already materialized
    # inside connected_components
    comp_core = hash_bucket_scan(
        stars.map_batches(member_rows, batch_format="pyarrow"), ["node"],
        lambda t: t.group_by(["node"]).aggregate([("comp", "min")])
                   .rename_columns(["node", "comp"]),
        n_rows=n_edges)

    # ONE co-partition exchange of the flagged edges (keyed on the
    # core endpoint v) with the cluster-id state emits BOTH label
    # kinds bucket-locally: every distinct v is a core label
    # (lrole 2, comp = coalesce(state[v], v) — an isolated core is
    # its own singleton cluster) and every non-core-u row is a border
    # candidate (lrole 1, the same v cluster); a lid-keyed group then
    # folds border candidates to their min while core labels pass
    # through (the sets are disjoint — a border u is never core)
    def emit_labels(ek, pays, lookup):
        cv, found = lookup(ek)
        vcomp = np.where(found, cv, ek)
        uniq, first = np.unique(ek, return_index=True)
        border = pays["ucore"] == 0
        return pa.table({
            "lid": pa.array(np.concatenate(
                [uniq, pays["u"][border]]), pa.int64()),
            "lcomp": pa.array(np.concatenate(
                [vcomp[first], vcomp[border]]), pa.int64()),
            "lrole": pa.array(np.concatenate(
                [np.full(len(uniq), 2, np.int64),
                 np.ones(int(border.sum()), np.int64)]), pa.int64())})

    labels = hash_bucket_scan(
        edge_state_messages(
            evc, comp_core.map_batches(
                lambda t: t.rename_columns(["node", "val"]),
                batch_format="pyarrow"),
            "v", ["u", "ucore"], emit_labels, n_rows=n_edges),
        ["lid"], _border_min_labels, n_rows=n_edges)

    # one copart left join of the id stream against the labels
    ids = _read(sf_dir, "events", ["event_id"]).map_batches(
        lambda t: t.rename_columns(["id"]), batch_format="pyarrow")
    joined = copart_hash_join(ids, labels, left_on="id",
                              right_on="lid", how="left")

    def assemble(t: pa.Table) -> pa.Table:
        role = pc.fill_null(t["lrole"].cast(pa.int64()), 0)
        comp = pc.fill_null(t["lcomp"].cast(pa.int64()), -1)
        return pa.table({"id": t["id"].cast(pa.int64()),
                         "role": role.combine_chunks(),
                         "comp": comp.combine_chunks()})

    return joined.map_batches(assemble, batch_format="pyarrow")


def q_dbscan_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        "WITH RECURSIVE "
        f"p AS (SELECT event_id AS id, {lon} AS x, {lat} AS y "
        "FROM events), "
        "e AS (SELECT a.id AS u, b.id AS v FROM p a JOIN p b ON "
        "a.id <> b.id AND (a.x - b.x) * (a.x - b.x) + "
        "(a.y - b.y) * (a.y - b.y) <= "
        f"{_DBSCAN_EPS * _DBSCAN_EPS}), "
        "core AS (SELECT u AS id FROM e GROUP BY u "
        f"HAVING count(*) >= {_DBSCAN_MINPTS - 1}), "
        "ce AS (SELECT e.u, e.v FROM e "
        "JOIN core cu ON cu.id = e.u JOIN core cv ON cv.id = e.v), "
        "walk(node, cur) AS ("
        "SELECT id, id FROM core "
        "UNION "
        "SELECT w.node, ce.v FROM walk w JOIN ce ON ce.u = w.cur), "
        "comp AS (SELECT node, min(cur) AS comp FROM walk "
        "GROUP BY node), "
        "border AS (SELECT e.u AS id, min(c.comp) AS comp FROM e "
        "JOIN core cv ON cv.id = e.v JOIN comp c ON c.node = e.v "
        "WHERE e.u NOT IN (SELECT id FROM core) GROUP BY e.u) "
        "SELECT p.id AS id, "
        "CAST(CASE WHEN c.node IS NOT NULL THEN 2 "
        "WHEN b.id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS role, "
        "CAST(COALESCE(c.comp, b.comp, -1) AS BIGINT) AS comp "
        "FROM p LEFT JOIN comp c ON c.node = p.id "
        "LEFT JOIN border b ON b.id = p.id"
    )


def q_kll_quantiles(sf_dir: str):
    """Mergeable deterministic quantile sketch over event values (the
    KLL/MRL shape: the streaming alternative to the exact
    distributed-sort quantiles of q_quantiles): each input block
    reduces to ONE tiny (level, value)-pairs sketch row inside
    map_batches — the shuffle carries sketches, never data, exactly
    like the HLL stage — and the bounded per-block sketch set merges
    in one streaming driver pass (at real scale: a tree of merge
    tasks; sketches are associative).  Rows-only entry: the estimate
    is non-SQL by design; tests/test_sketch_quantile.py +
    test_round4_ops.py pin the deterministic rank-error bound against
    exact DuckDB quantiles instead."""
    from ..functions.sketch_quantile import QuantileSketch

    def block_sketch(b: pa.Table) -> pa.Table:
        sk = QuantileSketch().update(
            b["value"].to_numpy(zero_copy_only=False))
        lvs, vs = sk.dump()
        return pa.table({
            "lv": pa.array([lvs.tolist()], pa.list_(pa.int32())),
            "val": pa.array([vs.tolist()], pa.list_(pa.float64()))})

    parts = _read(sf_dir, "events", ["value"]).map_batches(
        block_sketch, batch_format="pyarrow").materialize()

    import ray

    total = QuantileSketch()
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        if isinstance(t, pa.Table) and t.num_rows and "lv" in t.column_names:
            for lv, vs in zip(t["lv"].to_pylist(), t["val"].to_pylist()):
                total.merge(QuantileSketch.load(
                    np.array(lv, np.int32), np.array(vs, np.float64)))
    qs = np.array(_SKETCH_QS)
    est = total.quantile(qs)
    return pd.DataFrame({
        "q": qs, "value_est": est,
        "n": np.full(len(qs), total.n(), np.int64),
        "rank_err_bound": np.full(len(qs), total.error_bound(),
                                  np.int64)})


def q_silhouette(sf_dir: str):
    """Centroid silhouette score per label over the embedding table
    (the clustering-quality readout): pass 1 accumulates exact-int
    per-(label, dim) sums of milli-quantized elements on the bounded
    combiner tree; the 10×64 centroid table broadcasts; pass 2
    computes every point's squared distance to EVERY centroid as an
    exact int (each dim's (q/1000 − s/n)² pins to a pico int before
    the dim sum, so no float accumulation order exists), takes
    a = d²(own), b = min d²(other), pins (b−a)/max(a,b) to nano per
    point, and label sums merge exactly.  Output = per-label n and
    mean silhouette (one final pinned division)."""
    import ray

    from ..stages.agg_tree import tree_aggregate_to_table

    def _quant(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        emb = b["embedding"].combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        offs = np.asarray(emb.offsets)
        offs = offs - offs[0]
        d = int(offs[1] - offs[0])
        q = np.floor(flat * 1000.0 + 0.5).astype(np.int64) \
            .reshape(-1, d)
        lab = b["label"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return q, lab

    def cent_partial(b: pa.Table) -> pa.Table:
        q, lab = _quant(b)
        d = q.shape[1]
        labs = np.unique(lab)
        rows_l, rows_d, rows_s, rows_n = [], [], [], []
        for lv in labs:
            m = lab == lv
            rows_l.append(np.full(d, lv, np.int64))
            rows_d.append(np.arange(d, dtype=np.int64))
            rows_s.append(q[m].sum(axis=0))
            rows_n.append(np.full(d, int(m.sum()), np.int64))
        return pa.table({"label": pa.array(np.concatenate(rows_l)),
                         "dim": pa.array(np.concatenate(rows_d)),
                         "s": pa.array(np.concatenate(rows_s)),
                         "n": pa.array(np.concatenate(rows_n))})

    ds = _read(sf_dir, "embeddings", ["embedding", "label"])
    cent = tree_aggregate_to_table(
        ds.map_batches(cent_partial, batch_format="pyarrow"),
        ["label", "dim"], [("s", "sum"), ("n", "sum")]).to_pandas() \
        .sort_values(["label", "dim"])
    labels = cent["label"].unique()
    labels.sort()
    d = int(cent["dim"].max()) + 1
    c = (cent["s"].to_numpy().astype(np.float64)
         / cent["n"].to_numpy().astype(np.float64)).reshape(
        len(labels), d)
    cref = ray.put((labels.astype(np.int64), c))

    def sil_partial(b: pa.Table, *, _ref=cref) -> pa.Table:
        labs, cm = ray.get(_ref)
        q, lab = _quant(b)
        qf = q.astype(np.float64) / 1000.0
        d2 = np.empty((len(q), len(labs)), np.int64)
        for j in range(len(labs)):
            diff = qf - cm[j][None, :]
            d2[:, j] = np.floor(diff * diff * 1e12
                                + 0.5).astype(np.int64).sum(axis=1)
        own_idx = np.searchsorted(labs, lab)
        a = d2[np.arange(len(q)), own_idx]
        masked = d2.astype(np.float64)
        masked[np.arange(len(q)), own_idx] = np.inf
        bmin = masked.min(axis=1).astype(np.int64)
        mx = np.maximum(a, bmin)
        with np.errstate(divide="ignore", invalid="ignore"):
            pin = np.where(mx == 0, 0, np.floor(
                (bmin - a).astype(np.float64)
                / mx.astype(np.float64) * 1e9 + 0.5)).astype(np.int64)
        t = pa.table({"label": pa.array(lab),
                      "n": pa.array(np.ones(len(lab), np.int64)),
                      "sil": pa.array(pin)})
        return (t.group_by(["label"]).aggregate(
            [("n", "sum"), ("sil", "sum")])
            .rename_columns(["label", "n", "sil"]))

    g = tree_aggregate_to_table(
        ds.map_batches(sil_partial, batch_format="pyarrow"),
        ["label"], [("n", "sum"), ("sil", "sum")]).to_pandas()
    mean = np.floor(g["sil"].to_numpy().astype(np.float64)
                    / g["n"].to_numpy().astype(np.float64)
                    + 0.5).astype(np.int64)
    return pd.DataFrame({
        "label": g["label"].to_numpy().astype(np.int64),
        "n": g["n"].to_numpy().astype(np.int64),
        "mean_sil_nano": mean})


def q_silhouette_sql() -> str:
    return (
        "WITH q AS MATERIALIZED (SELECT vec_id, "
        "CAST(label AS BIGINT) AS label, "
        "CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000.0 "
        "+ 0.5) AS BIGINT) AS q, "
        "generate_subscripts(embedding, 1) AS dim FROM embeddings), "
        "cent AS MATERIALIZED (SELECT label, dim, "
        "CAST(sum(q) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n "
        "FROM q GROUP BY 1, 2), "
        "d0 AS (SELECT q.vec_id, q.label AS own, c.label AS lab, "
        "(CAST(q.q AS DOUBLE) / 1000.0 - CAST(c.s AS DOUBLE) / "
        "CAST(c.n AS DOUBLE)) AS df FROM q JOIN cent c "
        "ON q.dim = c.dim), "
        "d AS MATERIALIZED (SELECT vec_id, own, lab, "
        "CAST(sum(CAST(floor(df * df * 1e12 + 0.5) AS BIGINT)) "
        "AS BIGINT) AS d2 FROM d0 GROUP BY 1, 2, 3), "
        "ab AS (SELECT vec_id, own, "
        "max(CASE WHEN lab = own THEN d2 END) AS a, "
        "min(CASE WHEN lab <> own THEN d2 END) AS b "
        "FROM d GROUP BY 1, 2), "
        "s AS (SELECT own AS label, CASE WHEN greatest(a, b) = 0 "
        "THEN 0 ELSE CAST(floor(CAST(b - a AS DOUBLE) / "
        "CAST(greatest(a, b) AS DOUBLE) * 1e9 + 0.5) AS BIGINT) END "
        "AS pin FROM ab) "
        "SELECT label, CAST(count(*) AS BIGINT) AS n, "
        "CAST(floor(CAST(sum(pin) AS DOUBLE) / "
        "CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) "
        "AS mean_sil_nano FROM s GROUP BY 1"
    )


def q_ann_filtered(sf_dir: str):
    """FILTERED VECTOR SEARCH (the metadata-predicate + ANN combo
    every retrieval stack needs): brute-force cosine top-10 for the
    first 5 query vectors over ONLY the corpus vectors with even
    ``label`` — the predicate is pushed INTO the scan batch before any
    scoring work (filter → matmul), so excluded vectors cost a mask,
    not a dot product.  Same broadcast-queries / partial-top-k merge
    shape as q_ann_cosine; oracle adds the WHERE."""
    import pyarrow.parquet as pq
    import ray

    from ..functions.ann import (cosine_topk_batch, embeddings_to_matrix,
                                merge_topk, _normalize)
    from ..functions.near_dup import _obj_cached

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    qmask = emb["vec_id"].to_numpy(zero_copy_only=False) < 5
    qtab = emb.filter(pa.array(qmask))
    qm = _normalize(embeddings_to_matrix(qtab["embedding"]
                                         ).astype(np.float64))
    qids = qtab["vec_id"].to_numpy(zero_copy_only=False)
    ref = ray.put((qm, qids))
    ds = _read(sf_dir, "embeddings")

    def topk_batch(batch: pa.Table) -> pa.Table:
        qm2, qids2 = _obj_cached(ref)
        keep = batch["label"].to_numpy(zero_copy_only=False) % 2 == 0
        batch = batch.filter(pa.array(keep))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        vecs = embeddings_to_matrix(batch["embedding"])
        return cosine_topk_batch(vecs, ids, qm2, qids2, 10)

    partials = ds.map_batches(topk_batch, batch_format="pyarrow")
    out = merge_topk(partials, 10)
    return out.map_batches(
        lambda b: b.rename_columns(["query_id", "neighbor_id",
                                    "ann_rank"]),
        batch_format="pyarrow")


def q_ann_filtered_sql() -> str:
    return (
        "WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings "
        "WHERE vec_id < 5), "
        "sims AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
        "list_cosine_similarity(q.embedding, e.embedding) AS cos "
        "FROM q CROSS JOIN embeddings e WHERE e.label % 2 = 0), "
        "ranked AS (SELECT query_id, neighbor_id, row_number() OVER "
        "(PARTITION BY query_id ORDER BY "
        "cast(floor(cos * 1000000 + 0.5) AS bigint) DESC, neighbor_id) "
        "AS ann_rank FROM sims) "
        "SELECT query_id, neighbor_id, ann_rank FROM ranked "
        "WHERE ann_rank <= 10"
    )


def q_rrf_fusion(sf_dir: str):
    """HYBRID RETRIEVAL via RECIPROCAL-RANK FUSION: the BM25 lexical
    top-20 (q_bm25_topk, terms spark/window/hash/vector over
    documents) fused with the dense top-10 of query vector 0
    (q_ann_cosine over embeddings, ids shared with doc ids) by
    rrf = 10⁶ // (60 + r_lex) + 10⁶ // (60 + r_dense) — integer
    division, so the fusion is exact.  Both retrievals stay fully
    distributed; only the two BOUNDED rank lists meet on the driver.
    Emits the fused top-10 (doc_id, rrf, rank); ties → lowest doc_id.
    Oracle composes both sub-oracles and replays the fusion."""
    from .textlm import q_bm25_topk

    bm = q_bm25_topk(sf_dir)
    bm = bm.to_pandas() if not isinstance(bm, pd.DataFrame) else bm
    bm = bm.sort_values(["score6", "doc_id"],
                        ascending=[False, True]).reset_index(drop=True)
    rb = {int(d): i + 1 for i, d in enumerate(bm["doc_id"])}
    ann = q_ann_cosine(sf_dir)
    ann = ann.to_pandas() if not isinstance(ann, pd.DataFrame) else ann
    a0 = ann[ann["query_id"] == 0]
    ra = {int(d): int(r) for d, r in zip(a0["neighbor_id"],
                                         a0["ann_rank"])}
    docs = sorted(set(rb) | set(ra))
    rrf = [(1_000_000 // (60 + rb[d]) if d in rb else 0)
           + (1_000_000 // (60 + ra[d]) if d in ra else 0)
           for d in docs]
    out = pd.DataFrame({"doc_id": np.array(docs, np.int64),
                        "rrf": np.array(rrf, np.int64)})
    out = out.sort_values(["rrf", "doc_id"],
                          ascending=[False, True]).head(10)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out.reset_index(drop=True)


def q_rrf_fusion_sql() -> str:
    from .textlm import q_bm25_topk_sql

    return (
        f"WITH rb AS (SELECT doc_id, row_number() OVER "
        f"(ORDER BY score6 DESC, doc_id) AS r "
        f"FROM ({q_bm25_topk_sql()})), "
        f"ra AS (SELECT neighbor_id AS doc_id, ann_rank AS r "
        f"FROM ({q_ann_cosine_sql()}) WHERE query_id = 0), "
        "f AS (SELECT COALESCE(rb.doc_id, ra.doc_id) AS doc_id, "
        "COALESCE(1000000 // (60 + rb.r), 0) "
        "+ COALESCE(1000000 // (60 + ra.r), 0) AS rrf "
        "FROM rb FULL OUTER JOIN ra ON ra.doc_id = rb.doc_id), "
        "t AS (SELECT doc_id, rrf, row_number() OVER "
        "(ORDER BY rrf DESC, doc_id) AS rank FROM f) "
        "SELECT doc_id, rrf, rank FROM t WHERE rank <= 10"
    )


def q_kmv_distinct(sf_dir: str):
    """KMV (k-minimum-values) DISTINCT sketch over user ids — the
    order-statistics sibling of the HLL estimator, mergeable by
    construction: each partition keeps its k smallest splitmix64
    hashes (per-batch partial top-k — only k ints cross the wire),
    the merge is a k-smallest fold, and the pinned outputs are the
    exact k-th minimum hash (as uint64 → two's-complement int64) and
    k — everything the estimator (k−1)·2⁶⁴/kth needs.  Oracle =
    ORDER BY the same HUGEINT hash LIMIT k."""
    from ..stages.hll import _splitmix64

    K = 64

    def partial(b: pa.Table) -> pa.Table:
        u = np.unique(b["user_id"].to_numpy(zero_copy_only=False))
        h = np.unique(_splitmix64(u, seed=7))
        h = h[:K] if len(h) > K else h
        return pa.table({"h": pa.array(h.view(np.int64))})

    parts = _read(sf_dir, "events", ["user_id"]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    # driver fold: ≤ K ints per input block (uint64 ascending order)
    hs = np.unique(parts["h"].to_numpy().view(np.uint64))
    hs = hs[:K]
    kth = int(hs[-1].view(np.int64)) if len(hs) else 0
    return pd.DataFrame({"k": [np.int64(len(hs))],
                         "kth_min": [np.int64(kth)]})


def q_kmv_distinct_sql() -> str:
    from ..stages.hll import splitmix64_sql

    h = splitmix64_sql("user_id", seed=7)
    # NOTE: the two's-complement view must be applied AFTER max(hv) —
    # max over the signed view would pick the wrong element whenever
    # the k-th minimum crosses 2^63
    to_i64 = ("CASE WHEN mh >= 9223372036854775808::HUGEINT "
              "THEN mh - 18446744073709551616::HUGEINT ELSE mh END")
    return (
        f"WITH u AS (SELECT DISTINCT user_id FROM events), "
        f"hh AS (SELECT ({h}) AS hv FROM u), "
        "d AS (SELECT DISTINCT hv FROM hh ORDER BY hv LIMIT 64), "
        "m AS (SELECT count(*) AS k, max(hv) AS mh FROM d) "
        "SELECT CAST(k AS BIGINT) AS k, "
        f"CAST({to_i64} AS BIGINT) AS kth_min FROM m"
    )
