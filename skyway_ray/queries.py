"""Driver-facing query suite: one entry per operator (SURVEY.md §2),
each with a Ray Data implementation and (where SQL-expressible) a
DuckDB oracle that reproduces it bit-for-bit.

Shared derivation: the TPC-H-ish test tables carry no coordinates, so
point queries derive (lat, lon) from an integer key with pure integer
arithmetic + one double division — written identically on both sides
(same operation order) so float results hash-match:

    u_hi = (key * 2654435761 + 12345) % 4294967296
    u_lo = (key * 1103515245 + 54321) % 4294967296
    lat  = -60.0 + 120.0 * (u_hi / 4294967296.0)
    lon  = -180.0 + 360.0 * (u_lo / 4294967296.0)

Float-summation order is NOT deterministic across a distributed
aggregate, so hash-checked aggregates stick to counts/mins over ints;
double columns appear only as raw pass-throughs or per-row derivations.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from .geo.cells import cell_id, cell_sql
from .geo.tiles import tile_sql, tile_xy

# ---------------------------------------------------------------------------
# shared derivations


def derive_latlon(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    key = np.asarray(key, dtype=np.int64)
    u_hi = (key * 2654435761 + 12345) % 4294967296
    u_lo = (key * 1103515245 + 54321) % 4294967296
    lat = -60.0 + 120.0 * (u_hi.astype(np.float64) / 4294967296.0)
    lon = -180.0 + 360.0 * (u_lo.astype(np.float64) / 4294967296.0)
    return lat, lon


def latlon_sql(key_expr: str) -> tuple[str, str]:
    u_hi = f"(({key_expr} * 2654435761 + 12345) % 4294967296)"
    u_lo = f"(({key_expr} * 1103515245 + 54321) % 4294967296)"
    lat = f"(-60.0 + 120.0 * ({u_hi} / 4294967296.0))"
    lon = f"(-180.0 + 360.0 * ({u_lo} / 4294967296.0))"
    return lat, lon


def _geotag_batch(batch: pa.Table, key: str) -> pa.Table:
    lat, lon = derive_latlon(batch[key].to_numpy(zero_copy_only=False))
    return (batch.append_column("lat", pa.array(lat, pa.float64()))
                 .append_column("lon", pa.array(lon, pa.float64())))


def _nrows(sf_dir: str, table: str) -> int:
    """Row count from parquet footer metadata — no data read, no Ray
    tasks.  Feeds keyed_scan's auto bucket sizing (stages/scan.py)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(
        os.path.join(sf_dir, f"{table}.parquet")).metadata.num_rows


def _read(sf_dir: str, table: str, columns=None):
    import ray
    import ray.data

    # single-file tables: Ray's default (~200 tiny blocks) costs more in
    # per-block overhead than it buys in parallelism at these scales
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                                 columns=columns,
                                 override_num_blocks=max(16, cpus // 2))


# boxes for the SQL-expressible rectangle PIP join (from nation keys)
def _box_params(nationkey: np.ndarray):
    k = np.asarray(nationkey, dtype=np.int64)
    clat = -50.0 + 100.0 * (((k * 37) % 100).astype(np.float64) / 100.0)
    clon = -170.0 + 340.0 * (((k * 73) % 100).astype(np.float64) / 100.0)
    hh = 3.0 + (k % 5).astype(np.float64)
    hw = 4.0 + (k % 7).astype(np.float64)
    return clat, clon, hh, hw


_BOX_SQL = (
    "SELECT n_name AS region_id, "
    "(-50.0 + 100.0 * (((n_nationkey * 37) % 100) / 100.0)) AS clat, "
    "(-170.0 + 340.0 * (((n_nationkey * 73) % 100) / 100.0)) AS clon, "
    "(3.0 + (n_nationkey % 5)) AS hh, "
    "(4.0 + (n_nationkey % 7)) AS hw FROM nation"
)


# ---------------------------------------------------------------------------
# hash-verified queries (Ray + SQL oracle)


def q_geotag(sf_dir: str):
    """events → derived (lat, lon) points (the geotag stage over a
    SQL-visible table)."""
    return _read(sf_dir, "events", ["event_id"]).map_batches(
        lambda b: _geotag_batch(b, "event_id"), batch_format="pyarrow")


def q_geotag_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return f"SELECT event_id, {lat} AS lat, {lon} AS lon FROM events"


def q_cells(sf_dir: str):
    """Hierarchical cell encode (h3_r7/r9/r12) over derived points."""

    def enc(batch: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(batch["event_id"].to_numpy(zero_copy_only=False))
        for r in (7, 9, 12):
            batch = batch.append_column(
                f"h3_r{r}", pa.array(cell_id(lat, lon, r), pa.int64()))
        return batch

    return _read(sf_dir, "events", ["event_id"]).map_batches(
        enc, batch_format="pyarrow")


def q_cells_sql() -> str:
    lat, lon = latlon_sql("event_id")
    parts = ", ".join(f"{cell_sql(lat, lon, r)} AS h3_r{r}" for r in (7, 9, 12))
    return f"SELECT event_id, {parts} FROM events"


def q_tiles(sf_dir: str):
    """Web-mercator z=12 tile assignment over derived points."""

    def enc(batch: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(batch["event_id"].to_numpy(zero_copy_only=False))
        x, y = tile_xy(lat, lon, 12)
        return (batch.append_column("tile_x", pa.array(x, pa.int64()))
                     .append_column("tile_y", pa.array(y, pa.int64())))

    return _read(sf_dir, "events", ["event_id"]).map_batches(
        enc, batch_format="pyarrow")


def q_tiles_sql() -> str:
    lat, lon = latlon_sql("event_id")
    xe, ye = tile_sql(lat, lon, 12)
    return f"SELECT event_id, {xe} AS tile_x, {ye} AS tile_y FROM events"


def q_tile_stats(sf_dir: str):
    """Per-tile counts at z=7 — pre-aggregated inside map_batches, then
    the Arrow combiner tree over the bounded tile space (the flagship
    reduction shape)."""

    def partial(batch: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(batch["event_id"].to_numpy(zero_copy_only=False))
        x, y = tile_xy(lat, lon, 7)
        t = pa.table({"tile_x": x, "tile_y": y})
        g = t.group_by(["tile_x", "tile_y"]).aggregate([("tile_x", "count")])
        return g.rename_columns(["tile_x", "tile_y", "partial_n"])

    from .stages.agg_tree import tree_aggregate

    partials = _read(sf_dir, "events", ["event_id"]).map_batches(
        partial, batch_format="pyarrow")
    out = tree_aggregate(partials, ["tile_x", "tile_y"],
                         [("partial_n", "sum")])
    return out.map_batches(
        lambda b: b.rename_columns(["tile_x", "tile_y", "n_events"]),
        batch_format="pyarrow")


def q_tile_stats_sql() -> str:
    lat, lon = latlon_sql("event_id")
    xe, ye = tile_sql(lat, lon, 7)
    return (f"SELECT {xe} AS tile_x, {ye} AS tile_y, "
            f"count(*) AS n_events FROM events GROUP BY 1, 2")


def q_events_by_type(sf_dir: str):
    """Plain grouped aggregate parity check."""
    from ray.data.aggregate import Count

    return _read(sf_dir, "events", ["event_type"]).groupby(
        "event_type").aggregate(Count(alias_name="n_events"))


def q_events_by_type_sql() -> str:
    return "SELECT event_type, count(*) AS n_events FROM events GROUP BY 1"


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
    from .functions.text import fingerprint64
    from .stages.scan import keyed_scan

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
    from .stages.dedup import exact_dedup_bloom

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
    from .functions.near_dup import minhash_lsh_dedup

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


def q_topk_events(sf_dir: str):
    """Distributed top-100 by value (per-batch partial top-k + tiny
    global sort)."""
    from .stages.topk import top_k

    ds = _read(sf_dir, "events", ["event_id", "value"])
    return top_k(ds, "value", 100, descending=True, tiebreak_col="event_id")


def q_topk_events_sql() -> str:
    return ("SELECT event_id, value FROM events "
            "ORDER BY value DESC, event_id LIMIT 100")


def q_token_count(sf_dir: str):
    """Token counting over documents (text-analysis op)."""
    from .functions.text import token_count

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_tokens": token_count(batch["text"]),
        })

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pandas")


def q_token_count_sql() -> str:
    return ("SELECT doc_id, cast(length(regexp_extract_all(text, "
            "'[A-Za-z0-9]+')) as bigint) AS n_tokens FROM documents")


def q_bpe_tokens(sf_dir: str):
    """BPE-ish subword token estimate (GPT-2-style pre-tokenizer piece
    count, lookahead-free so the RE2 oracle matches Python exactly —
    functions/text.py BPE_RE)."""
    from .functions.text import bpe_token_count

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_bpe_tokens": bpe_token_count(batch["text"]),
        })

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pandas")


def q_bpe_tokens_sql() -> str:
    from .functions.text import BPE_RE

    pat = BPE_RE.replace("'", "''")
    return ("SELECT doc_id, cast(length(regexp_extract_all(text, "
            f"'{pat}')) as bigint) AS n_bpe_tokens FROM documents")


def q_grouped_topk(sf_dir: str):
    """Top-5 events by value per event_type (grouped top-k: per-batch
    per-group pre-reduce, then a tiny per-group finish)."""
    from .stages.topk import grouped_top_k

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    return grouped_top_k(ds, "event_type", "value", 5,
                         descending=True, tiebreak_col="event_id")


def q_grouped_topk_sql() -> str:
    return ("SELECT event_id, event_type, value FROM ("
            "SELECT event_id, event_type, value, row_number() OVER "
            "(PARTITION BY event_type ORDER BY value DESC, event_id) AS rn "
            "FROM events) WHERE rn <= 5")


def q_grouped_median(sf_dir: str):
    """Exact discrete median value per event_type — per-group sorted
    pick (element pass-through, no float arithmetic, so it hash-matches
    quantile_disc)."""

    def med(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy())
        # quantile_disc(0.5): lower of the two middle elements
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "median_value": [v[(len(v) - 1) // 2]],
        })

    return _read(sf_dir, "events", ["event_type", "value"]).groupby(
        "event_type").map_groups(med, batch_format="pandas")


def q_grouped_median_sql() -> str:
    return ("SELECT event_type, quantile_disc(value, 0.5) AS median_value "
            "FROM events GROUP BY 1")


def q_quality(sf_dir: str):
    """Quality-scoring features (counts + one ratio of ints)."""
    from .functions.text import char_count, punct_count, token_count

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        n_chars = char_count(batch["text"])
        n_punct = punct_count(batch["text"])
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(n_chars > 0, n_punct / n_chars, 0.0)
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_chars2": n_chars,
            "n_punct": n_punct,
            "punct_ratio": ratio,
        })

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pandas")


def q_quality_sql() -> str:
    punct = r"[.,;:!?''\"()\[\]{}-]"  # '' = escaped quote inside SQL literal
    return (
        "SELECT doc_id, length(text) AS n_chars2, "
        f"cast(length(regexp_extract_all(text, '{punct}')) as bigint) AS n_punct, "
        "CASE WHEN length(text) > 0 THEN "
        f"cast(length(regexp_extract_all(text, '{punct}')) as bigint) "
        "/ cast(length(text) as double) ELSE 0.0 END AS punct_ratio "
        "FROM documents"
    )


def q_knn(sf_dir: str):
    """Exact kNN (k=5): supplier-derived probes against customer-derived
    reference points, via the per-cell sorted Hilbert-key index."""
    import pyarrow.parquet as pq

    from .stages.knn import CellKnnIndex

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


def q_knn_sql() -> str:
    plat, plon = latlon_sql("s_suppkey")
    rlat, rlon = latlon_sql("c_custkey")
    return (
        "WITH probes AS (SELECT s_suppkey AS probe_id, "
        f"{plat} AS lat, {plon} AS lon FROM supplier), "
        "refs AS (SELECT c_custkey AS neighbor_id, "
        f"{rlat} AS lat, {rlon} AS lon FROM customer), "
        "d AS (SELECT probe_id, neighbor_id, "
        "(r.lat - p.lat) * (r.lat - p.lat) + (r.lon - p.lon) * (r.lon - p.lon) "
        "AS dist2 FROM probes p CROSS JOIN refs r), "
        "ranked AS (SELECT probe_id, neighbor_id, "
        "row_number() OVER (PARTITION BY probe_id ORDER BY dist2, neighbor_id) "
        "AS knn_rank FROM d) "
        "SELECT probe_id, neighbor_id, knn_rank FROM ranked WHERE knn_rank <= 5"
    )


def q_pip_join_boxes(sf_dir: str):
    """Point-in-polygon inner join against rectangle regions derived
    from the nation table — the STRtree/ray-casting join on a geometry
    a SQL oracle can also express (BETWEEN on both axes)."""
    import pyarrow.parquet as pq
    import ray

    from .stages.pip_join import make_pip_join_fn

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"])
    nk = nation["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    clat, clon, hh, hw = _box_params(nk)
    ring_lon = [[clon[j] - hw[j], clon[j] + hw[j], clon[j] + hw[j], clon[j] - hw[j]]
                for j in range(len(nk))]
    ring_lat = [[clat[j] - hh[j], clat[j] - hh[j], clat[j] + hh[j], clat[j] + hh[j]]
                for j in range(len(nk))]
    boundaries = pa.table({
        "region_id": nation["n_name"],
        "ring_lon": pa.array(ring_lon, pa.list_(pa.float64())),
        "ring_lat": pa.array(ring_lat, pa.list_(pa.float64())),
    })
    ref = ray.put(boundaries)
    pts = _read(sf_dir, "events", ["event_id"]).map_batches(
        lambda b: _geotag_batch(b, "event_id"), batch_format="pyarrow")
    joined = pts.map_batches(make_pip_join_fn(ref, mode="inner"),
                             batch_format="pyarrow")
    return joined.map_batches(
        lambda b: b.select(["event_id", "region_id"]), batch_format="pyarrow")


def q_pip_join_boxes_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        f"WITH pts AS (SELECT event_id, {lat} AS lat, {lon} AS lon FROM events), "
        f"boxes AS ({_BOX_SQL}) "
        "SELECT p.event_id, b.region_id FROM pts p JOIN boxes b "
        "ON p.lat > b.clat - b.hh AND p.lat < b.clat + b.hh "
        "AND p.lon > b.clon - b.hw AND p.lon < b.clon + b.hw"
    )


def q_ann_cosine(sf_dir: str):
    """Brute-force cosine top-10 for the first 5 embedding vectors
    (ANN baseline; numpy matmul per batch against broadcast queries)."""
    import pyarrow.parquet as pq
    import ray

    from .functions.ann import (cosine_topk_batch, embeddings_to_matrix,
                                merge_topk, _normalize)
    from .functions.near_dup import _obj_cached

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

    from .functions.ann import _normalize, embeddings_to_matrix, ivf_topk

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

    from .functions.ann import _normalize, embeddings_to_matrix, ivf_topk

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
    from .functions.near_dup import embedding_lsh_dedup

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return embedding_lsh_dedup(ds, threshold=0.95).map_batches(
        lambda b: b.select(["vec_id"]), batch_format="pyarrow")


def q_cell_stats(sf_dir: str):
    """Per-cell (h3_r7) counts with explicit hot-key salting: hot cells
    split across salt reducers then exactly re-merged (stages/salt.py).
    Result equals a plain groupby — the salting is transparent."""
    from .stages.salt import salted_count

    pts = _read(sf_dir, "events", ["event_id"]).map_batches(
        lambda b: _geotag_batch(b, "event_id"), batch_format="pyarrow")

    def enc(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        return pa.table({"h3_r7": cell_id(lat, lon, 7)})

    cells = pts.map_batches(enc, batch_format="pyarrow")
    out = salted_count(cells, "h3_r7", num_salts=8, hot_threshold=3,
                       sample_fraction=1.0,
                       n_rows=_nrows(sf_dir, "events"))
    return out.map_batches(
        lambda b: b.rename_columns(["h3_r7", "n_events"]),
        batch_format="pyarrow")


def q_cell_stats_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (f"SELECT {cell_sql(lat, lon, 7)} AS h3_r7, count(*) AS n_events "
            f"FROM events GROUP BY 1")


def q_orders_per_nation(sf_dir: str):
    """Broadcast hash join (dimension-table pattern): orders ⋈ customer
    (broadcast) → order count per nation key. No shuffle of the fact
    side."""
    import pyarrow.parquet as pq

    from .stages.agg_tree import grouped_count
    from .stages.joins import broadcast_hash_join

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = broadcast_hash_join(orders, cust, on="o_custkey",
                                 small_on="c_custkey")
    joined = joined.map_batches(
        lambda b: b.select(["c_nationkey"]), batch_format="pyarrow")
    out = grouped_count(joined, ["c_nationkey"], out_col="n_orders")
    return out


def q_orders_per_nation_sql() -> str:
    return ("SELECT c_nationkey, count(*) AS n_orders FROM orders "
            "JOIN customer ON o_custkey = c_custkey GROUP BY 1")


def q_semi_join_events(sf_dir: str):
    """Broadcast semi join: events whose user is a customer with
    acctbal > 5000 (HAS-selector analogue over a foreign key)."""
    import pyarrow.parquet as pq

    from .stages.joins import broadcast_semi_join

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_acctbal"])
    keys = cust.filter(pa.compute.greater(cust["c_acctbal"], 5000.0))[
        "c_custkey"].to_numpy(zero_copy_only=False)
    ev = _read(sf_dir, "events", ["event_id", "user_id"])
    return broadcast_semi_join(ev, keys, on="user_id")


def q_semi_join_events_sql() -> str:
    return ("SELECT event_id, user_id FROM events WHERE user_id IN "
            "(SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)")


def q_anti_join_events(sf_dir: str):
    """Broadcast anti join: events whose user is NOT a high-balance
    customer (the DROP-selector analogue over a foreign key)."""
    import pyarrow.parquet as pq

    from .stages.joins import broadcast_semi_join

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_acctbal"])
    keys = cust.filter(pa.compute.greater(cust["c_acctbal"], 5000.0))[
        "c_custkey"].to_numpy(zero_copy_only=False)
    ev = _read(sf_dir, "events", ["event_id", "user_id"])
    return broadcast_semi_join(ev, keys, on="user_id", anti=True)


def q_anti_join_events_sql() -> str:
    return ("SELECT event_id, user_id FROM events WHERE user_id NOT IN "
            "(SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)")


def q_window_counts(sf_dir: str):
    """Tumbling 1-hour window counts per user (stream-shaped op:
    event-time bucketing; see ray_guide 'Streaming-shaped')."""

    def bucket(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        hours = ts.astype("datetime64[us]").astype(np.int64) // 3_600_000_000
        t = pa.table({"user_id": batch["user_id"],
                      "window_h": pa.array(hours, pa.int64())})
        g = t.group_by(["user_id", "window_h"]).aggregate([("user_id", "count")])
        return g.rename_columns(["user_id", "window_h", "n"])

    from .stages.agg_tree import tree_aggregate

    partials = _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
        bucket, batch_format="pyarrow")
    out = tree_aggregate(partials, ["user_id", "window_h"], [("n", "sum")])
    return out.map_batches(
        lambda b: b.rename_columns(["user_id", "window_h", "n_events"]),
        batch_format="pyarrow")


def q_window_counts_sql() -> str:
    return ("SELECT user_id, cast(floor(epoch(ts) / 3600) as bigint) "
            "AS window_h, count(*) AS n_events FROM events GROUP BY 1, 2")


def q_sliding_windows(sf_dir: str):
    """Sliding event-time windows: 1-hour windows every 15 minutes —
    each event lands in 4 windows.  The flat_map-style expansion stays
    inside ``map_batches`` (one ``np.repeat`` per batch, then a LOCAL
    Arrow combine), so the shuffle moves per-(window) partials, not
    4x the event rows."""
    STEP_US = 900_000_000  # 15 min
    NSUB = 4               # 1h window / 15m step

    def expand_partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        slot = ts.astype("datetime64[us]").astype(np.int64) // STEP_US
        wins = (np.repeat(slot, NSUB)
                - np.tile(np.arange(NSUB, dtype=np.int64), len(slot)))
        t = pa.table({"win_slot": pa.array(wins, pa.int64())})
        g = t.group_by(["win_slot"]).aggregate([("win_slot", "count")])
        return g.rename_columns(["win_slot", "n"])

    from .stages.agg_tree import tree_aggregate

    partials = _read(sf_dir, "events", ["ts"]).map_batches(
        expand_partial, batch_format="pyarrow")
    out = tree_aggregate(partials, ["win_slot"], [("n", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        slots = b["win_slot"].to_numpy(zero_copy_only=False)
        return pa.table({
            "win_start_us": pa.array(slots * STEP_US, pa.int64()),
            "n_events": b["n"],
        })

    return out.map_batches(finish, batch_format="pyarrow")


def q_sliding_windows_sql() -> str:
    return (
        "WITH e AS (SELECT epoch_us(ts) AS t FROM events), "
        "j AS (SELECT unnest(range(4)) AS j), "
        "w AS (SELECT ((t // 900000000) - j) * 900000000 AS win_start_us "
        "FROM e CROSS JOIN j) "
        "SELECT win_start_us, count(*) AS n_events FROM w GROUP BY 1"
    )


def q_stratified_sample(sf_dir: str):
    """Stratified deterministic sample: different hash-sample rates
    per event_type stratum (click 50%, view 20%, else 5%) — the
    per-group sampling a training-data pipeline uses for class
    rebalancing, exactly mirrorable in SQL."""
    RATES = {"click": 50, "view": 20}

    def samp(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        rate = np.full(len(k), 5, dtype=np.int64)
        for name, r in RATES.items():
            rate[et == name] = r
        keep = ((k * 2654435761) % 4294967296) % 100 < rate
        return batch.filter(pa.array(keep))

    return _read(sf_dir, "events", ["event_id", "event_type"]).map_batches(
        samp, batch_format="pyarrow")


def q_stratified_sample_sql() -> str:
    return ("SELECT event_id, event_type FROM events "
            "WHERE ((event_id * 2654435761) % 4294967296) % 100 < "
            "CASE event_type WHEN 'click' THEN 50 WHEN 'view' THEN 20 "
            "ELSE 5 END")


def q_box_tile_cover(sf_dir: str):
    """Vector→raster: rasterize each nation box onto the z=7
    web-mercator grid — one row per (region, covering tile).  The
    corner tiles come from the same `tile_xy` math the hash-verified
    `tiles` query uses, so the integer tile ranges (and therefore the
    whole cover) mirror the SQL oracle exactly.  The expansion runs
    inside ``map_batches`` over the (small) nation side — boundary
    rasterization is a dimension-side op."""
    Z = 7

    def cover(batch: pa.Table) -> pa.Table:
        k = batch["n_nationkey"].to_numpy(zero_copy_only=False)
        name = batch["n_name"].to_numpy(zero_copy_only=False)
        clat, clon, hh, hw = _box_params(k)
        x0, _ = tile_xy(clat, clon - hw, Z)
        x1, _ = tile_xy(clat, clon + hw, Z)
        _, y0 = tile_xy(clat + hh, clon, Z)   # north edge → smaller y
        _, y1 = tile_xy(clat - hh, clon, Z)
        nx = (x1 - x0 + 1)
        ny = (y1 - y0 + 1)
        reps = nx * ny
        region = np.repeat(name, reps)
        xs_parts, ys_parts = [], []
        for i in range(len(k)):
            gx, gy = np.meshgrid(np.arange(x0[i], x1[i] + 1),
                                 np.arange(y0[i], y1[i] + 1))
            xs_parts.append(gx.ravel())
            ys_parts.append(gy.ravel())
        return pa.table({
            "region_id": pa.array(region, pa.string()),
            "tile_x": pa.array(np.concatenate(xs_parts), pa.int64()),
            "tile_y": pa.array(np.concatenate(ys_parts), pa.int64()),
        })

    return _read(sf_dir, "nation", ["n_nationkey", "n_name"]).map_batches(
        cover, batch_format="pyarrow")


def q_box_tile_cover_sql() -> str:
    xw, _ = tile_sql("clat", "(clon - hw)", 7)
    xe, _ = tile_sql("clat", "(clon + hw)", 7)
    _, yn = tile_sql("(clat + hh)", "clon", 7)
    _, ys = tile_sql("(clat - hh)", "clon", 7)
    return (
        f"WITH b AS ({_BOX_SQL}), "
        f"r AS (SELECT region_id, {xw} AS x0, {xe} AS x1, "
        f"{yn} AS y0, {ys} AS y1 FROM b), "
        "xr AS (SELECT region_id, unnest(generate_series(x0, x1)) "
        "AS tile_x, y0, y1 FROM r) "
        "SELECT region_id, tile_x, "
        "unnest(generate_series(y0, y1)) AS tile_y FROM xr"
    )


def q_asof_join(sf_dir: str):
    """As-of join: for each event, the user's latest order with
    o_orderdate <= ts (ties → max orderkey); events with no qualifying
    order are dropped. pd.merge_asof per batch against the broadcast
    (sorted) orders side."""
    import pyarrow.parquet as pq

    from .stages.joins import asof_join_broadcast

    orders = pq.read_table(os.path.join(sf_dir, "orders.parquet"),
                           columns=["o_orderkey", "o_custkey", "o_orderdate"]
                           ).to_pandas()
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    joined = asof_join_broadcast(ev, orders, key="user_id", ts="ts",
                                 right_key="o_custkey", right_ts="o_orderdate",
                                 right_cols=["o_orderkey"])

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.dropna(subset=["o_orderkey"])
        return pd.DataFrame({
            "event_id": out["event_id"].astype(np.int64),
            "o_orderkey": out["o_orderkey"].astype(np.int64),
        })

    return joined.map_batches(finish, batch_format="pandas")


def q_asof_join_sql() -> str:
    return (
        "WITH j AS (SELECT e.event_id, o.o_orderkey, row_number() OVER ("
        "PARTITION BY e.event_id ORDER BY o.o_orderdate DESC, "
        "o.o_orderkey DESC) AS rn FROM events e JOIN orders o "
        "ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) "
        "SELECT event_id, o_orderkey FROM j WHERE rn = 1"
    )


def q_session_windows(sf_dir: str):
    """Session windows per user (gap > 1h splits a session) — the
    stream-shaped op the guide maps to ``groupby(key).map_groups`` over
    ts-sorted groups. Deterministic: ordering by (ts, event_id), gaps
    in integer microseconds.

    Scale shape: grouping by a COARSE user-hash bucket rather than per
    user — Ray pays per-group overhead, so each group call sessionizes
    every user in its bucket with one vectorized numpy pass (boundary
    cumsum).  Bucket count auto-scales to a fixed per-bucket row budget
    (stages/scan.py auto_n_buckets) from the parquet footer row
    count."""
    from .stages.scan import auto_n_buckets

    GAP_US = 3_600_000_000
    N_BUCKETS = auto_n_buckets(_nrows(sf_dir, "events"))

    def add_bucket(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return b.append_column("_bucket", pa.array(u % N_BUCKETS, pa.int64()))

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        user = d["user_id"].to_numpy()
        ts_us = d["ts"].astype("int64").to_numpy()
        n = len(d)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = user[1:] != user[:-1]
        gap = np.zeros(n, dtype=bool)
        gap[1:] = (ts_us[1:] - ts_us[:-1]) > GAP_US
        boundary = new_user | gap
        # session_id within user = (#boundaries so far) - (#boundaries
        # at this user's first row)
        b_cum = np.cumsum(boundary)
        user_start = np.repeat(b_cum[new_user], np.diff(
            np.append(np.flatnonzero(new_user), n)))
        session_id = b_cum - user_start
        seg_id = b_cum - 1  # 0-based contiguous segment index
        counts = np.bincount(seg_id - seg_id[0])
        first_of_seg = np.flatnonzero(boundary)
        return pd.DataFrame({
            "user_id": user[first_of_seg],
            "session_id": session_id[first_of_seg],
            "n_events": counts.astype(np.int64),
        })

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"]).map_batches(
        add_bucket, batch_format="pyarrow")
    out = ds.groupby("_bucket").map_groups(sessions, batch_format="pandas")
    return out.map_batches(
        lambda b: b.select(["user_id", "session_id", "n_events"]),
        batch_format="pyarrow")


def q_session_windows_sql() -> str:
    return (
        "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us "
        "FROM events), "
        "flagged AS (SELECT user_id, ts_us, event_id, CASE WHEN ts_us - "
        "lag(ts_us) "
        "OVER (PARTITION BY user_id ORDER BY ts_us, event_id) > 3600000000 "
        "THEN 1 ELSE 0 END AS new_sess FROM e), "
        "numbered AS (SELECT user_id, cast(sum(new_sess) OVER (PARTITION BY "
        "user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) "
        "AS bigint) AS session_id "
        "FROM flagged) "
        "SELECT user_id, session_id, count(*) AS n_events FROM numbered "
        "GROUP BY 1, 2"
    )


def q_rolling_counts(sf_dir: str):
    """Rolling 1-hour range-window count per user (for each event, how
    many of the user's events fall in [ts-1h, ts] including ts-peers —
    SQL RANGE semantics, inclusive lower bound).  Same coarse user-bucket grouping as
    session_windows (bucket count auto-scales to a per-bucket row
    budget); the per-bucket pass is ONE global two-sided searchsorted —
    each user segment's timestamps shift into a disjoint int64 band
    (band width > global ts span + window), so window bounds never
    cross segments and no per-user Python loop runs."""
    from .stages.scan import auto_n_buckets

    GAP_US = 3_600_000_000
    N_BUCKETS = auto_n_buckets(_nrows(sf_dir, "events"))

    def add_bucket(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return b.append_column("_bucket", pa.array(u % N_BUCKETS, pa.int64()))

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = d["ts"].astype("int64").to_numpy()
        user = d["user_id"].to_numpy()
        n = len(d)
        if not n:
            return pd.DataFrame({"event_id": np.empty(0, np.int64),
                                 "n_last_hour": np.empty(0, np.int64)})
        out = np.empty(n, dtype=np.int64)
        new = np.ones(n, dtype=bool)
        new[1:] = user[1:] != user[:-1]
        seg = np.cumsum(new) - 1  # 0-based segment index per row
        base = ts - ts.min()
        span = np.int64(base.max()) + GAP_US + 1
        # chunk segments so seg_local * span never overflows int64
        # (one iteration unless segments x ts-span nears 2^62)
        segs_per_chunk = max(1, int((1 << 62) // span))
        n_segs = int(seg[-1]) + 1
        for c0 in range(0, n_segs, segs_per_chunk):
            m = (seg >= c0) & (seg < c0 + segs_per_chunk)
            k = base[m] + (seg[m] - c0) * span
            hi = np.searchsorted(k, k, side="right")
            lo = np.searchsorted(k, k - GAP_US, side="left")
            out[m] = hi - lo
        return pd.DataFrame({"event_id": d["event_id"].to_numpy(),
                             "n_last_hour": out})

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"]).map_batches(
        add_bucket, batch_format="pyarrow")
    return ds.groupby("_bucket").map_groups(roll, batch_format="pandas")


def q_rolling_counts_sql() -> str:
    return ("SELECT event_id, cast(count(*) OVER (PARTITION BY user_id "
            "ORDER BY epoch_us(ts) RANGE BETWEEN 3600000000 PRECEDING "
            "AND CURRENT ROW) AS bigint) AS n_last_hour FROM events")


def q_union_all(sf_dir: str):
    """UNION ALL (set op): high-value events ∪ low-value events —
    partition-recombine without a shuffle."""
    hi = _read(sf_dir, "events", ["event_id", "value"]).map_batches(
        lambda b: b.filter(pa.compute.greater(b["value"], 50.0)),
        batch_format="pyarrow")
    lo = _read(sf_dir, "events", ["event_id", "value"]).map_batches(
        lambda b: b.filter(pa.compute.less_equal(b["value"], 50.0)),
        batch_format="pyarrow")
    return hi.union(lo)


def q_union_all_sql() -> str:
    return ("SELECT event_id, value FROM events WHERE value > 50.0 "
            "UNION ALL SELECT event_id, value FROM events WHERE value <= 50.0")


def q_lineitem_stats(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate (count/min/max only — those
    are order-independent over doubles, unlike sums, so the result
    hash-matches across any distributed execution order)."""
    from ray.data.aggregate import Count, Max, Min

    return _read(sf_dir, "lineitem",
                 ["l_returnflag", "l_linestatus", "l_quantity"]).groupby(
        ["l_returnflag", "l_linestatus"]).aggregate(
        Count(alias_name="n_items"),
        Min("l_quantity", alias_name="min_qty"),
        Max("l_quantity", alias_name="max_qty"))


def q_lineitem_stats_sql() -> str:
    return ("SELECT l_returnflag, l_linestatus, count(*) AS n_items, "
            "min(l_quantity) AS min_qty, max(l_quantity) AS max_qty "
            "FROM lineitem GROUP BY 1, 2")


CEL_EVENTS_EXPR = ('value * 2.0 > 150.0 ? event_type == "click" '
                   ': event_type in ["view", "purchase"]')


def q_cel_filter(sf_dir: str):
    """CEL-filtered scan (filters/cel.py): exercises float arithmetic,
    the lazy ternary, equality, and list membership in one expression —
    the practical surface the reference's embedded cel-interpreter
    exposes (docs/src/cel-filters.md).  The batch's columns are the CEL
    identifiers.  Hash-stable: ``value * 2.0`` is a power-of-two scale
    (exact in IEEE), everything else is string/bool logic."""
    from .filters.cel import CelFilter

    f = CelFilter(CEL_EVENTS_EXPR)
    return _read(sf_dir, "events",
                 ["event_id", "event_type", "value"]).map_batches(
        f.apply_table, batch_format="pyarrow")


def q_cel_filter_sql() -> str:
    return ("SELECT event_id, event_type, value FROM events "
            "WHERE CASE WHEN value * 2.0 > 150.0 "
            "THEN event_type = 'click' "
            "ELSE event_type IN ('view', 'purchase') END")


def q_hash_sample(sf_dir: str):
    """Deterministic 10% hash sample — stable across runs, block
    layouts, and cluster sizes (unlike seeded random_sample, whose
    draw depends on block structure); the SQL mirror is exact."""

    def samp(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ((k * 2654435761) % 4294967296) % 100 < 10
        return batch.filter(pa.array(keep))

    return _read(sf_dir, "events", ["event_id", "event_type"]).map_batches(
        samp, batch_format="pyarrow")


def q_hash_sample_sql() -> str:
    return ("SELECT event_id, event_type FROM events "
            "WHERE ((event_id * 2654435761) % 4294967296) % 100 < 10")


def q_tile_polygons(sf_dir: str):
    """Raster→vector: distinct z=6 tiles of the event points, converted
    back to lon/lat bounding boxes (tile polygonization)."""
    from .geo.raster import tiles_to_polygons

    def enc(batch: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(batch["event_id"].to_numpy(zero_copy_only=False))
        x, y = tile_xy(lat, lon, 6)
        t = pa.table({"tile_x": x, "tile_y": y})
        return t.group_by(["tile_x", "tile_y"]).aggregate([])

    from .stages.agg_tree import tree_aggregate

    tiles = _read(sf_dir, "events", ["event_id"]).map_batches(
        enc, batch_format="pyarrow")
    distinct = tree_aggregate(tiles.map_batches(
        lambda b: b.append_column("one", pa.array(np.ones(b.num_rows, np.int64))),
        batch_format="pyarrow"), ["tile_x", "tile_y"], [("one", "min")])
    def finish(b: pa.Table) -> pa.Table:
        b = tiles_to_polygons(b.drop_columns(["one"]), z=6)
        # north/south come through atan/exp, which differ by 1 ulp
        # across libms — emit microdegrees via floor(x*1e6 + 0.5)
        # (identical rounding on both sides; DuckDB round() is
        # half-away, numpy round() is half-even, so use neither)
        out = {"tile_x": b["tile_x"], "tile_y": b["tile_y"],
               "west": b["west"], "east": b["east"]}
        for c in ("south", "north"):
            v = b[c].to_numpy(zero_copy_only=False)
            out[f"{c}_udeg"] = pa.array(
                np.floor(v * 1e6 + 0.5).astype(np.int64), pa.int64())
        return pa.table(out)

    return distinct.map_batches(finish, batch_format="pyarrow")


def q_tile_polygons_sql() -> str:
    from .geo.raster import tile_bounds_sql
    from .geo.tiles import tile_sql

    lat, lon = latlon_sql("event_id")
    xe, ye = tile_sql(lat, lon, 6)
    w, s, e, n = tile_bounds_sql("tile_x", "tile_y", 6)
    return (
        f"WITH tiles AS (SELECT DISTINCT {xe} AS tile_x, {ye} AS tile_y "
        f"FROM events) SELECT tile_x, tile_y, {w} AS west, {e} AS east, "
        f"cast(floor(({s}) * 1000000 + 0.5) as bigint) AS south_udeg, "
        f"cast(floor(({n}) * 1000000 + 0.5) as bigint) AS north_udeg "
        f"FROM tiles"
    )


def q_distinct_types(sf_dir: str):
    """DISTINCT over a column (set op)."""
    ds = _read(sf_dir, "events", ["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pa.table({"event_type": pa.array(vals, pa.string())})


def q_distinct_types_sql() -> str:
    return "SELECT DISTINCT event_type FROM events"


# ---------------------------------------------------------------------------
# rows-only queries (no SQL equivalent — driver records a weaker check)


def q_flagship_tiles(sf_dir: str):
    """The flagship filter→PIP-join→tile pipeline over the synthetic
    image fixture matching this sf (FIXTURES.md scale mapping)."""
    from .fixtures import (ensure_boundaries_parquet, ensure_images_parquet,
                           scale_for_sf_dir)
    from .pipelines.flagship import flagship_pipeline

    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    boundaries = ensure_boundaries_parquet(50)
    return flagship_pipeline(images, boundaries, z=12)


def q_osmfilter_docs(sf_dir: str):
    """The canonical docs filter over the OSM-element conformance
    fixture (vectorized OSMFilter semantics)."""
    import ray.data

    from .filters.vector import CompiledFilter
    from .fixtures import ensure_osm_elements_parquet, scale_for_sf_dir

    path = ensure_osm_elements_parquet(scale_for_sf_dir(sf_dir))
    docs_filter = (
        "OSMFilter v0.2.0\n\n"
        "TYPE way\n"
        '\tHAS "footway"\n'
        '\t\tSET "surface" "concrete"\n'
        "\t\tCOMMIT\n"
        "TYPE relation\n"
        '\tEQUALS "type" "route"\n'
        "\t\tDROP\n"
        "COMMIT\n"
    )
    f = CompiledFilter.from_source(docs_filter)
    ds = ray.data.read_parquet(path)
    out = ds.map_batches(f.apply_table, batch_format="pyarrow")
    return out.map_batches(
        lambda b: pa.table({
            "id": b["id"],
            "type": b["type"],
            "n_tags": pa.compute.fill_null(
                pa.compute.list_value_length(b["tags"]), 0),
        }),
        batch_format="pyarrow")


def q_exact_dedup_images(sf_dir: str):
    """Exact dedup by phash over the image fixture (projected shuffle —
    wide bytes never enter the shuffle)."""
    import ray.data

    from .fixtures import ensure_images_parquet, scale_for_sf_dir
    from .stages.dedup import exact_dedup_projected

    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    cpus = int(__import__("ray").cluster_resources().get("CPU", 8))
    ds = ray.data.read_parquet(images, columns=["image_id", "phash"],
                               override_num_blocks=max(16, cpus))
    return exact_dedup_projected(ds, "phash", "image_id")


def q_minhash_dedup(sf_dir: str):
    """MinHash+LSH near-dedup over documents (survivor doc_ids)."""
    from .functions.near_dup import minhash_lsh_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = minhash_lsh_dedup(ds, threshold=0.7)
    return out.map_batches(lambda b: b.select(["doc_id"]),
                           batch_format="pyarrow")


def q_simhash(sf_dir: str):
    """SimHash fingerprints over documents."""
    from .functions.near_dup import simhash64

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "simhash": simhash64(batch["text"])})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pandas")


def q_langid(sf_dir: str):
    """Language-ID heuristic over documents (hash-verified: the
    stopword-hit argmax is integer counting over RE2-compatible
    tokenization, so a DuckDB ``regexp_extract_all`` + ``list_filter``
    oracle reproduces it exactly — see :func:`q_langid_sql`)."""
    from .functions.text import guess_lang

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "lang_guess": guess_lang(batch["text"])})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pandas")


def q_langid_sql() -> str:
    """Mirror of functions/text.py guess_lang: tokenize with the same
    RE2/re-agreeing class, count stopword hits per language, argmax
    with ties broken by language-code order, 'und' below 2 hits."""
    from .functions.text import _LANG_STOPWORDS

    langs = sorted(_LANG_STOPWORDS)  # tie-break order == np.argmax order

    def hits(lg: str) -> str:
        words = ", ".join(
            "'" + w.replace("'", "''") + "'"
            for w in sorted(_LANG_STOPWORDS[lg]))
        return (f"len(list_filter(ts, t -> t IN ({words}))) AS {lg}")

    best = " WHEN ".join(
        " AND ".join(f"{lg} >= {other}" for other in langs[i + 1:])
        + f" THEN '{lg}'"
        for i, lg in enumerate(langs[:-1]))
    return (
        "WITH toks AS (SELECT doc_id, "
        "regexp_extract_all(lower(text), '[a-zà-ÿ'']+') AS ts "
        "FROM documents), "
        f"hits AS (SELECT doc_id, {', '.join(hits(lg) for lg in langs)} "
        "FROM toks) "
        "SELECT doc_id, CASE "
        f"WHEN greatest({', '.join(langs)}) < 2 THEN 'und' "
        f"WHEN {best} ELSE '{langs[-1]}' END AS lang_guess FROM hits"
    )


def q_fingerprint(sf_dir: str):
    """Rolling-hash document fingerprints (hash-verified: the mod-2^64
    polynomial fold is reproduced in SQL with HUGEINT Horner steps —
    see :func:`q_fingerprint_sql`)."""
    from .functions.text import fingerprint64

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "fp64": fingerprint64(batch["text"])})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pandas")


def q_fingerprint_sql() -> str:
    """Mirror of functions/text.py fingerprint64: UTF-8 bytes via
    hex-pair parsing of ``encode(text)``, Horner fold in HUGEINT with a
    mod 2^64 per step (acc < 2^64, K < 2^41, so acc*K + b < 2^105 fits
    int128), then two's-complement view back to BIGINT."""
    return (
        "SELECT doc_id, CAST(CASE WHEN h >= 9223372036854775808::HUGEINT "
        "THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT) AS fp64 "
        "FROM (SELECT doc_id, "
        "CASE WHEN octet_length(encode(text)) = 0 THEN 0::HUGEINT "
        "ELSE list_reduce(list_transform(range(0, octet_length(encode(text))), "
        "i -> CAST(CAST(concat('0x', substr(hex(encode(text)), 2*i+1, 2)) "
        "AS INT) AS HUGEINT) + 1), "
        "(acc, b) -> (acc * 1099511628211::HUGEINT + b) "
        "% 18446744073709551616::HUGEINT) END AS h FROM documents)"
    )


def q_range_join(sf_dir: str):
    """Broadcast interval join: orders priced into OVERLAPPING price
    bands derived from nation keys (band k covers [8000k, 8000k+20000)
    — spacing < width, so a price matches up to 3 bands).  The band
    table is the broadcast small side; per batch the candidate run
    comes from two searchsorteds (stages/joins.py
    broadcast_range_join)."""
    import pyarrow.parquet as pq

    from .stages.joins import broadcast_range_join

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey"]).to_pandas()
    k = nat["n_nationkey"].to_numpy(np.int64)
    bands = pd.DataFrame({"band_id": k,
                          "lo": k.astype(np.float64) * 8000.0,
                          "hi": k.astype(np.float64) * 8000.0 + 20000.0})
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    out = broadcast_range_join(ds, bands, on="o_totalprice")
    return out.map_batches(
        lambda b: b.select(["o_orderkey", "band_id"]),
        batch_format="pyarrow")


def q_range_join_sql() -> str:
    return (
        "SELECT o.o_orderkey, CAST(n.n_nationkey AS BIGINT) AS band_id "
        "FROM orders o JOIN nation n "
        "ON o.o_totalprice >= n.n_nationkey * 8000.0 "
        "AND o.o_totalprice < n.n_nationkey * 8000.0 + 20000.0"
    )


def q_prefix_sums(sf_dir: str):
    """Per-user running (prefix) sum of event value in (ts, event_id)
    order — the windowed-SUM scan (stages/scan.py running_sum over
    coarse user buckets).  Values quantize to micro-unit int64 FIRST so
    the running sum is integer (order-of-summation-proof) and the SQL
    windowed SUM matches bit-for-bit."""
    from .stages.scan import running_sum

    def quantize(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "v_micro",
            pa.array(np.floor(v * 1e6 + 0.5).astype(np.int64), pa.int64()))

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value"]).map_batches(
        quantize, batch_format="pyarrow")
    out = running_sum(ds, key="user_id", order=["ts", "event_id"],
                      val="v_micro", out_col="running_sum",
                      keep=["event_id"], n_rows=_nrows(sf_dir, "events"))
    return out.map_batches(
        lambda b: b.select(["event_id", "running_sum"]),
        batch_format="pyarrow")


def q_prefix_sums_sql() -> str:
    return (
        "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
        "CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v FROM events) "
        "SELECT event_id, CAST(sum(v) OVER (PARTITION BY user_id "
        "ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) "
        "AS running_sum FROM e"
    )


def q_lag_deltas(sf_dir: str):
    """Per-user LAG(ts): each event's previous event timestamp (µs) in
    (ts, event_id) order, -1 for the user's first event (stages/scan.py
    keyed_lag)."""
    from .stages.scan import keyed_lag

    def to_us(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64())
        return b.append_column("ts_us", ts_us)

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"]).map_batches(
        to_us, batch_format="pyarrow")
    out = keyed_lag(ds, key="user_id", order=["ts_us", "event_id"],
                    val="ts_us", out_col="prev_ts_us", fill=-1,
                    keep=["event_id"], n_rows=_nrows(sf_dir, "events"))
    return out.map_batches(
        lambda b: b.select(["event_id", "prev_ts_us"]),
        batch_format="pyarrow")


def q_lag_deltas_sql() -> str:
    return (
        "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us "
        "FROM events) "
        "SELECT event_id, COALESCE(lag(ts_us) OVER (PARTITION BY user_id "
        "ORDER BY ts_us, event_id), -1) AS prev_ts_us FROM e"
    )


def q_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type — per-batch pair
    dedup combiner, one hash shuffle on the (type, user) pair, combiner
    tree for the bounded-cardinality final count
    (stages/agg_tree.py grouped_count_distinct)."""
    from .stages.agg_tree import grouped_count_distinct

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return grouped_count_distinct(ds, "event_type", "user_id",
                                  out_col="n_users",
                                  n_rows=_nrows(sf_dir, "events"))


def q_distinct_users_sql() -> str:
    return ("SELECT event_type, COUNT(DISTINCT user_id) AS n_users "
            "FROM events GROUP BY event_type")


def q_quantiles(sf_dir: str):
    """Exact global quantiles of l_extendedprice WITHOUT a global sort:
    sampled-splitter selection with streaming range refinement
    (stages/quantiles.py exact_quantiles).  Values are raw elements of
    the column (rank = floor(q*(n-1)) of the ascending sort), so the
    hash compare against ORDER-BY-rank SQL is bit-exact."""
    from .stages.quantiles import exact_quantiles

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    return exact_quantiles(ds, "l_extendedprice", [0.25, 0.5, 0.9, 0.99])


def q_quantiles_sql() -> str:
    return (
        "WITH s AS (SELECT l_extendedprice AS v, "
        "row_number() OVER (ORDER BY l_extendedprice) - 1 AS r, "
        "count(*) OVER () AS n FROM lineitem) "
        "SELECT CAST(b.q AS DOUBLE) AS q, s.v AS value FROM s "
        "JOIN (VALUES (0.25), (0.5), (0.9), (0.99)) b(q) "
        "ON s.r = CAST(floor(CAST(b.q AS DOUBLE) * (n - 1)) AS BIGINT)"
    )


def q_image_features(sf_dir: str):
    """Multimodal decode → per-image features over the image fixture
    (PNG decode is real; jpeg/webp are the deterministic fake-lossy
    stubs — functions/image_codec.py). Actor pool, small batches."""
    import ray.data

    from .fixtures import ensure_images_parquet, scale_for_sf_dir
    from .stages.multimodal import ImageFeatures

    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"])
    return ds.map_batches(ImageFeatures, batch_format="pyarrow",
                          batch_size=512, concurrency=2)


def q_image_blur(sf_dir: str):
    """Blur / sharpness scoring over the image fixture (the
    blur-filter shape of image curation): actor-pool decode →
    exact-integer Laplacian variance per image
    (stages/multimodal.py::ImageBlurScore) — scores are int64
    num/den pairs, so threshold filters replay identically across
    partitionings."""
    import ray.data

    from .fixtures import ensure_images_parquet, scale_for_sf_dir
    from .stages.multimodal import ImageBlurScore

    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"])
    return ds.map_batches(ImageBlurScore, batch_format="pyarrow",
                          batch_size=512, concurrency=2)


def q_image_patches(sf_dir: str):
    """ViT-style patch extraction over the image fixture: actor-pool
    decode → non-overlapping 16×16 RGB patch rows with exact-int mean
    luma (stages/multimodal.py::ImagePatchify).  Returned as the
    per-image patch-count + luma-sum manifest so the driver check
    stays blob-free; the patch rows themselves are the stage's real
    output (write_parquet partitioned by shard downstream)."""
    import ray.data

    from .fixtures import ensure_images_parquet, scale_for_sf_dir
    from .stages.multimodal import ImagePatchify

    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"])
    patches = ds.map_batches(ImagePatchify, batch_format="pyarrow",
                             batch_size=128, concurrency=2)

    def manifest(b: pa.Table) -> pa.Table:
        t = pa.table({"image_id": b["image_id"],
                      "n_patches": pa.array(
                          np.ones(b.num_rows, np.int64)),
                      "luma_sum": b["mean_luma"]})
        return (t.group_by(["image_id"])
                 .aggregate([("n_patches", "sum"), ("luma_sum", "sum")])
                 .rename_columns(["image_id", "n_patches", "luma_sum"]))

    from .stages.scan import hash_bucket_scan

    return hash_bucket_scan(
        patches.map_batches(manifest, batch_format="pyarrow"),
        ["image_id"],
        lambda t: t.group_by(["image_id"]).aggregate(
            [("n_patches", "sum"), ("luma_sum", "sum")])
        .rename_columns(["image_id", "n_patches", "luma_sum"]),
        n_rows=4096)


def _events_of_type(sf_dir: str, etype: str, min_value: float):
    import pyarrow.compute as pc

    def filt(b: pa.Table, t=etype) -> pa.Table:
        return b.filter(pc.and_(pc.equal(b["event_type"], t),
                                pc.greater(b["value"], min_value)))

    return _read(sf_dir, "events",
                 ["user_id", "event_type", "value"]).map_batches(
        filt, batch_format="pyarrow")


def q_user_intersect(sf_dir: str):
    """DISTINCT big-ticket (value > 200) purchasers ∩ big-value
    error-reporters — set INTERSECT via one flagged hash shuffle
    (stages/setops.py keyed_set_op)."""
    from .stages.setops import keyed_set_op

    return keyed_set_op(_events_of_type(sf_dir, "purchase", 200.0),
                        _events_of_type(sf_dir, "error", 200.0),
                        on="user_id", op="intersect")


def q_user_intersect_sql() -> str:
    return ("SELECT user_id FROM events "
            "WHERE event_type = 'purchase' AND value > 200.0 "
            "INTERSECT SELECT user_id FROM events "
            "WHERE event_type = 'error' AND value > 200.0")


def q_user_except(sf_dir: str):
    """DISTINCT big-ticket purchasers \\ big-value error-reporters —
    set EXCEPT on the same one-shuffle stage."""
    from .stages.setops import keyed_set_op

    return keyed_set_op(_events_of_type(sf_dir, "purchase", 200.0),
                        _events_of_type(sf_dir, "error", 200.0),
                        on="user_id", op="except")


def q_user_except_sql() -> str:
    return ("SELECT user_id FROM events "
            "WHERE event_type = 'purchase' AND value > 200.0 "
            "EXCEPT SELECT user_id FROM events "
            "WHERE event_type = 'error' AND value > 200.0")


def q_top_tokens(sf_dir: str):
    """Exact corpus-wide top-20 most frequent tokens (wordcount shape):
    per-batch vectorized token counting (one np.unique over the batch's
    flat token list — the combiner: the shuffle ships per-batch
    DISTINCT tokens, not token instances), hash groupby over the
    unbounded token key, pre-reduced global top-k."""
    from .stages.topk import top_k

    def count_batch(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.lower().str.findall(r"[a-z0-9]+")
        flat = np.concatenate([np.asarray(t, dtype=object)
                               for t in toks if len(t)] or
                              [np.array([], dtype=object)])
        uniq, counts = np.unique(flat, return_counts=True)
        return pd.DataFrame({"tok": uniq.astype(str),
                             "n": counts.astype(np.int64)})

    from .stages.scan import hash_bucket_scan

    partials = _read(sf_dir, "documents", ["text"]).map_batches(
        count_batch, batch_format="pandas")
    # token totals through ONE coarse hash exchange (open-vocabulary
    # key space — a token lands wholly in one bucket, Arrow sum inside)
    totals = hash_bucket_scan(
        partials, ["tok"],
        lambda t: t.group_by(["tok"]).aggregate([("n", "sum")])
        .rename_columns(["tok", "n"]),
        n_rows=_nrows(sf_dir, "documents"))
    return top_k(totals, "n", 20, descending=True, tiebreak_col="tok")


def q_top_tokens_sql() -> str:
    return (
        "WITH toks AS (SELECT unnest(regexp_extract_all(lower(text), "
        "'[a-z0-9]+')) AS tok FROM documents), "
        "counts AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok) "
        "SELECT tok, n FROM counts ORDER BY n DESC, tok LIMIT 20"
    )


def q_heavy_hitters(sf_dir: str):
    """Exact word-bigram heavy hitters (freq > 1/800 of all bigrams)
    over documents.text without shuffling the unbounded bigram key
    space: per-block mergeable Misra-Gries summaries bound what rides
    the merge groupby, then the bounded candidate set is broadcast and
    recounted exactly (see stages/heavy.py).  Integer-only threshold
    (cnt*800 > N) so the DuckDB oracle is bit-identical."""
    from .stages.heavy import bigram_items, exact_heavy_hitters

    grams = _read(sf_dir, "documents", ["text"]).map_batches(
        bigram_items, batch_format="pandas")
    return exact_heavy_hitters(grams, "item", phi_num=1, phi_den=800)


def q_heavy_hitters_sql() -> str:
    return (
        "WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),"
        " '[a-z0-9]+')) AS tok, generate_subscripts(regexp_extract_all("
        "lower(text), '[a-z0-9]+'), 1) AS i FROM documents), "
        "bg AS (SELECT a.tok || ' ' || b.tok AS item FROM toks a "
        "JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1) "
        "SELECT item, count(*) AS cnt FROM bg GROUP BY item "
        "HAVING count(*) * 800 > (SELECT count(*) FROM bg)"
    )


def q_order_lineitems(sf_dir: str):
    """Large×large inner equi-join (orders ⋈ lineitem on order key)
    through ONE coarse hash co-partition exchange + per-bucket Acero
    hash join (stages/joins.py::copart_hash_join) — NO broadcast side;
    both inputs co-partition by key hash, so the plan holds when
    neither fits a worker (the broadcast joins cover the small-side
    cases).  Revenue is quantized to 1e-4 units (floor(x*1e4+0.5)) so
    the per-row float product hashes bit-identically vs DuckDB."""
    from .stages.joins import copart_hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_linenumber", "l_partkey",
                  "l_extendedprice", "l_discount"])

    j = copart_hash_join(
        orders, line, "o_orderkey", "l_orderkey",
        n_rows=_nrows(sf_dir, "orders") + _nrows(sf_dir, "lineitem"))

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 1e4 + 0.5).astype(np.int64)
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_custkey": b["o_custkey"],
            "l_linenumber": pc.cast(b["l_linenumber"], pa.int64()),
            "l_partkey": b["l_partkey"],
            "rev_q4": pa.array(rev),
        })

    return j.map_batches(finish, batch_format="pyarrow")


def q_order_lineitems_sql() -> str:
    return (
        "SELECT o_orderkey, o_custkey, CAST(l_linenumber AS BIGINT) AS "
        "l_linenumber, l_partkey, CAST(floor(l_extendedprice * "
        "(1.0 - l_discount) * 1e4 + 0.5) AS BIGINT) AS rev_q4 "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey"
    )


def q_tfidf(sf_dir: str):
    """Top-3 TF-IDF terms per document, two streaming passes:
    pass 1 builds the document-frequency table (per-batch distinct
    (doc, token) combiner → one vocab-keyed groupby), which is
    broadcast once (``ray.put``; vocab-bounded — at open-vocab scale
    swap the broadcast for a token-keyed shuffle join); pass 2
    recomputes per-doc term frequencies batch-locally (each document
    lives in ONE row, so TF needs no shuffle) and takes the per-doc
    top 3 by quantized score.  idf = ln(n_docs/df) is transcendental,
    so the score is quantized to microunits (floor(tf·idf·1e6 + 0.5))
    on BOTH sides, keeping the DuckDB oracle bit-identical."""
    import ray

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()

    def _long(b: pd.DataFrame):
        toks = b["text"].str.lower().str.findall(r"[a-z0-9]+")
        lens = toks.str.len().to_numpy()
        if int(lens.sum()) == 0:
            return None
        flat = np.concatenate([np.asarray(t, dtype=object)
                               for t in toks if len(t)])
        doc = np.repeat(b["doc_id"].to_numpy(), lens)
        return pd.DataFrame({"doc_id": doc, "tok": flat.astype(str)})

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        long = _long(b)
        if long is None:
            return pd.DataFrame({"tok": pd.Series([], dtype=str),
                                 "nd": pd.Series([], dtype=np.int64)})
        g = long.drop_duplicates().groupby("tok", sort=False).size()
        return pd.DataFrame({"tok": g.index.astype(str),
                             "nd": g.to_numpy().astype(np.int64)})

    from .stages.scan import hash_bucket_scan

    df_tbl = hash_bucket_scan(
        docs.map_batches(df_partial, batch_format="pandas"),
        ["tok"],
        lambda t: t.group_by(["tok"]).aggregate([("nd", "sum")])
        .rename_columns(["tok", "nd"]),
        n_rows=n_docs).to_pandas()
    vocab = np.sort(df_tbl["tok"].to_numpy().astype(str))
    dfv = (df_tbl.set_index("tok").loc[vocab, "nd"]
           .to_numpy().astype(np.int64))
    ref = ray.put((vocab, dfv))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "tok": pd.Series([], dtype=str),
                              "qscore": pd.Series([], dtype=np.int64)})
        long = _long(b)
        if long is None:
            return empty
        vocab, dfv = ray.get(ref)
        idf = np.log(float(n_docs) / dfv)
        g = (long.groupby(["doc_id", "tok"], sort=False).size()
             .reset_index(name="tf"))
        pos = np.searchsorted(vocab, g["tok"].to_numpy().astype(str))
        q = np.floor(g["tf"].to_numpy() * idf[pos] * 1e6 + 0.5
                     ).astype(np.int64)
        order = np.lexsort((g["tok"].to_numpy(), -q,
                            g["doc_id"].to_numpy()))
        gs = g.iloc[order].assign(qscore=q[order])
        keep = gs.groupby("doc_id", sort=False).cumcount() < 3
        return gs.loc[keep, ["doc_id", "tok", "qscore"]]

    return docs.map_batches(score, batch_format="pandas")


def q_tfidf_sql() -> str:
    return (
        "WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),"
        " '[a-z0-9]+')) AS tok FROM documents), "
        "tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks "
        "GROUP BY doc_id, tok), "
        "df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks "
        "GROUP BY tok), "
        "scored AS (SELECT doc_id, tf.tok AS tok, CAST(floor(tf * ln("
        "CAST((SELECT count(*) FROM documents) AS DOUBLE) / df) * 1e6 + 0.5)"
        " AS BIGINT) AS qscore FROM tf JOIN df ON tf.tok = df.tok), "
        "ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
        "ORDER BY qscore DESC, tok) AS r FROM scored) "
        "SELECT doc_id, tok, qscore FROM ranked WHERE r <= 3"
    )


def q_hll_users(sf_dir: str) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT user_id) via a HyperLogLog sketch
    (stages/hll.py): one streaming pass, per-block 16 KiB register
    blobs folded by a map_batches tree — no shuffle, no driver funnel.
    Approximate ⇒ rows-only (the exact path is hash-verified as
    ``distinct_users``); tests assert the ±0.8%-class error bound."""
    from .stages.hll import hll_distinct

    est = hll_distinct(_read(sf_dir, "events", ["user_id"]), "user_id")
    return pd.DataFrame({"distinct_users_est": [int(round(est))]})


def q_skew_join(sf_dir: str):
    """Skew-resistant inner join (events ⋈ customer on user key):
    Misra-Gries hot-key detection routes heavy keys through a bounded
    broadcast merge while cold keys take the hash-shuffle join — one
    viral key can no longer serialize a partition
    (stages/joins.py::skew_hybrid_join; output is bit-identical to the
    plain join, which is what the oracle checks).  At phi=1/200 on
    events most users clear the threshold, so BOTH paths carry rows in
    the driver run."""
    from .stages.joins import skew_hybrid_join

    events = _read(sf_dir, "events", ["user_id", "event_type"])
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_mktsegment"])
    j = skew_hybrid_join(events, cust, "user_id", "c_custkey",
                         phi_num=1, phi_den=200)

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.set_column(b.schema.get_field_index("c_nationkey"),
                            "c_nationkey",
                            pc.cast(b["c_nationkey"], pa.int64()))

    return j.map_batches(finish, batch_format="pyarrow")


def q_skew_join_sql() -> str:
    return (
        "SELECT user_id, event_type, CAST(c_nationkey AS BIGINT) AS "
        "c_nationkey, c_mktsegment FROM events "
        "JOIN customer ON user_id = c_custkey"
    )


def q_bpe_merges(sf_dir: str) -> pd.DataFrame:
    """Distributed BPE tokenizer training, the real production shape:
    the corpus-sized step is a word-frequency count (per-batch
    ``np.unique`` combiner → one token-key shuffle), and the merge loop
    runs over the VOCABULARY-bounded (word, count) table
    (functions/text.py::learn_bpe_merges — deterministic tie-breaks).
    Returns (rank, left, right) merge rows.  Rows-only: the iterative
    merge loop has no SQL equivalent; a pure-Python reference BPE
    asserts equality in tests."""
    from .functions.text import learn_bpe_merges

    def count_batch(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.lower().str.findall(r"[a-z0-9]+")
        flat = np.concatenate([np.asarray(t, dtype=object)
                               for t in toks if len(t)] or
                              [np.array([], dtype=object)])
        uniq, counts = np.unique(flat, return_counts=True)
        return pd.DataFrame({"w": uniq.astype(str),
                             "n": counts.astype(np.int64)})

    wc = (_read(sf_dir, "documents", ["text"])
          .map_batches(count_batch, batch_format="pandas")
          .groupby("w").sum("n").to_pandas())
    merges = learn_bpe_merges(wc["w"].to_numpy(),
                              wc["sum(n)"].to_numpy(), n_merges=40)
    return pd.DataFrame({
        "rank": np.arange(len(merges), dtype=np.int64),
        "left": [a for a, _ in merges],
        "right": [b for _, b in merges],
    })


def q_decontam(sf_dir: str):
    """Benchmark decontamination: per-document count of distinct word
    5-grams shared with a benchmark set (here: the 5-grams of docs
    with doc_id < 10, standing in for an eval set).  The benchmark
    grams are collected once (bounded by the benchmark size) and
    broadcast sorted; each batch matches its own grams with one
    ``searchsorted`` — documents never shuffle, the output is only the
    contaminated (doc_id, n_hits) rows."""
    import pyarrow.parquet as pq
    import ray

    from .functions.text import benchmark_overlap_counts, ngram_strings

    bench_tab = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"],
                              filters=[("doc_id", "<", 10)])
    bench_df = bench_tab.to_pandas()
    bench = np.unique(ngram_strings(bench_df["text"],
                                    bench_df["doc_id"].to_numpy(),
                                    n=5)["g"].to_numpy().astype(str))
    bench_ref = ray.put(bench)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        return benchmark_overlap_counts(b, ray.get(bench_ref), n=5)

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        score, batch_format="pandas")


def q_decontam_sql() -> str:
    return (
        "WITH docs AS (SELECT doc_id, regexp_extract_all(lower(text), "
        "'[a-z0-9]+') AS arr FROM documents), "
        "grams AS (SELECT doc_id, array_to_string(arr[i:i+4], ' ') AS g "
        "FROM docs, UNNEST(range(1, len(arr) - 3)) AS t(i)), "
        "bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 10) "
        "SELECT doc_id, count(DISTINCT g) AS n_hits FROM grams "
        "WHERE g IN (SELECT g FROM bench) GROUP BY doc_id"
    )


def q_hll_users_by_type(sf_dir: str) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT user_id) per event_type via grouped
    HLL sketches: the groupby shuffle carries groups×blocks 4 KiB
    blobs, never (group, user) pairs (stages/hll.py hll_distinct_by).
    Approximate ⇒ rows-only; the exact pair-shuffle path is the
    hash-verified ``distinct_users``."""
    from .stages.hll import hll_distinct_by

    return hll_distinct_by(
        _read(sf_dir, "events", ["event_type", "user_id"]),
        "event_type", "user_id").sort_values("event_type")


def q_pq_ann(sf_dir: str) -> pd.DataFrame:
    """Product-quantization ANN (functions/ann.py pq_topk): codebooks
    train on a layout-independent hash sample and broadcast once; the
    corpus encodes to 8-byte codes (zero-copy fixed-size binary — the
    scan table is ~32x smaller than the raw vectors); the ADC scan
    emits bounded per-batch partial pools; only the merged candidate
    ids are fetched for the exact rerank.  Approximate ⇒ rows-only
    (recall vs brute force asserted in tests)."""
    import pyarrow.parquet as pq

    from .functions.ann import _normalize, embeddings_to_matrix, pq_topk

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    qmask = emb["vec_id"].to_numpy(zero_copy_only=False) < 5
    qtab = emb.filter(pa.array(qmask))
    qm = _normalize(embeddings_to_matrix(qtab["embedding"]).astype(np.float64))
    qids = qtab["vec_id"].to_numpy(zero_copy_only=False)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return pq_topk(ds, qm, qids, k=10, m=8, n_codes=16, rerank=8)


_PROFILE_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_returnflag", "l_linestatus"]


def q_profile_lineitem(sf_dir: str) -> pd.DataFrame:
    """Data-quality profile (count / nulls / min / max) of six lineitem
    columns in ONE streaming pass: per-block wide partial rows folded
    by a map_batches tree (see stages/profile.py) — the naive oracle
    runs six aggregate scans where this runs one."""
    from .stages.profile import profile_columns

    return profile_columns(_read(sf_dir, "lineitem", _PROFILE_COLS),
                           _PROFILE_COLS)


def q_profile_lineitem_sql() -> str:
    parts = [
        f"SELECT '{c}' AS \"column\", count(*) AS n, "
        f"count(*) - count({c}) AS nulls, "
        f"CAST(min({c}) AS VARCHAR) AS min_s, "
        f"CAST(max({c}) AS VARCHAR) AS max_s FROM lineitem"
        for c in _PROFILE_COLS]
    return " UNION ALL ".join(parts)


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def q_order_pivot(sf_dir: str):
    """Wide pivot: per customer-bucket order counts spread into one
    column per order priority (stages/setops.py pivot_counts on the
    bounded-key combiner tree — per-batch vectorized partial pivots,
    no all-to-all)."""
    from .stages.setops import pivot_counts

    def bucket(b: pa.Table) -> pa.Table:
        k = b["o_custkey"].to_numpy(zero_copy_only=False)
        return b.append_column("cust_bucket",
                               pa.array(k % 100, pa.int64()))

    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderpriority"]).map_batches(
        bucket, batch_format="pyarrow")
    return pivot_counts(ds, "cust_bucket", "o_orderpriority", _PRIORITIES)


def q_order_pivot_sql() -> str:
    cols = ", ".join(
        f"COUNT(*) FILTER (WHERE o_orderpriority = '{p}') AS \"n_{p}\""
        for p in _PRIORITIES)
    return (f"SELECT o_custkey % 100 AS cust_bucket, {cols} "
            "FROM orders GROUP BY cust_bucket")


def q_phash_dedup(sf_dir: str):
    """Perceptual-hash near-dedup over the image fixture: actor-pool
    decode → aHash/dHash (bytes never shuffle), then the distributed
    LSH dedup harness over the tiny (id, hash) table with 16-bit
    Hamming bands (functions/phash.py).  Rows-only (near-dup by
    construction; planted-duplicate recall is tested)."""
    import ray.data

    from .fixtures import ensure_images_parquet, scale_for_sf_dir
    from .functions.phash import phash_near_dup
    from .stages.multimodal import PerceptualHash

    from .stages.dedup import _key_hash64

    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"])
    hashes = ds.map_batches(PerceptualHash, batch_format="pyarrow",
                            batch_size=512, concurrency=2)

    # string image ids → int64 surrogate (the dedup pipeline sorts /
    # Blooms / CCs over int64 ids); survivors still carry image_id
    def add_iid(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_iid", pa.array(_key_hash64(
                b["image_id"].combine_chunks()).view(np.int64), pa.int64()))

    # materialize the hash table (24 B/row — tiny at any corpus size):
    # the dedup harness consumes its input THREE times (band pass,
    # Bloom-prefiltered sketch pass, loser drop); without this the
    # whole decode re-runs each time
    hashed = hashes.map_batches(add_iid, batch_format="pyarrow").materialize()
    out = phash_near_dup(hashed, id_col="_iid", hash_col="dhash64",
                         max_dist=3)
    return out.map_batches(lambda b: b.select(["image_id"]),
                           batch_format="pyarrow")


def q_knn_images(sf_dir: str):
    """kNN over the image fixture: 100 probe images against the full
    set, via the cell index (exact)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from .fixtures import ensure_images_parquet, scale_for_sf_dir
    from .geo.geotag import latlon_from_phash
    from .stages.knn import KnnStage

    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    tab = pq.read_table(images, columns=["image_id", "phash"])
    lat, lon = latlon_from_phash(tab["phash"].to_numpy(zero_copy_only=False))
    ref_table = pa.table({"image_id": tab["image_id"],
                          "lat": pa.array(lat), "lon": pa.array(lon)})
    ref = ray.put(ref_table)
    probes = ray.data.from_arrow(ref_table.slice(0, 100))
    return probes.map_batches(
        KnnStage, fn_constructor_kwargs=dict(ref_table_ref=ref, k=5, res=6),
        batch_format="pyarrow", concurrency=2)


def q_group_stats(sf_dir: str):
    """Exact distributed stddev/correlation per l_returnflag via integer
    moment partials + bounded-key combiner tree (stages/moments.py).
    x = l_quantity (integral in TPC-H), y = l_partkey % 97; outputs are
    micro-ints computed in a pinned float-op order (see moments.py)."""
    from .stages.moments import grouped_moments

    def derive(b: pa.Table) -> pa.Table:
        q = b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = b["l_partkey"].to_numpy(zero_copy_only=False) % 97
        return pa.table({"l_returnflag": b["l_returnflag"],
                         "x": pa.array(q), "y": pa.array(p)})

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_partkey"]).map_batches(
        derive, batch_format="pyarrow")
    return grouped_moments(ds, "l_returnflag", "x", "y")


def q_group_stats_sql() -> str:
    from .stages.moments import moments_sql

    return moments_sql("lineitem", "l_returnflag",
                       "CAST(l_quantity AS BIGINT)", "l_partkey % 97")


def q_rollup_orders(sf_dir: str):
    """GROUP BY ROLLUP(o_orderpriority, o_orderstatus): per-batch Arrow
    partials → combiner tree to the leaf grid (≤ 15 rows), then the
    subtotal and grand-total levels re-aggregate the LEAF table inside
    the same final block — upper rollup levels are derivable from leaf
    partials, so no second pass over the data.  'ALL' marks rolled-up
    levels (the tables contain no such value)."""
    from .stages.agg_tree import tree_aggregate

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"o_orderpriority": b["o_orderpriority"],
                      "o_orderstatus": b["o_orderstatus"],
                      "n_orders": pa.array(
                          np.ones(b.num_rows, np.int64)),
                      "min_key": b["o_orderkey"]})
        g = t.group_by(["o_orderpriority", "o_orderstatus"]).aggregate(
            [("n_orders", "sum"), ("min_key", "min")])
        return g.rename_columns(
            ["o_orderpriority", "o_orderstatus", "n_orders", "min_key"])

    def rollup(leaf: pa.Table) -> pa.Table:
        if leaf.num_rows == 0:
            return leaf
        d = leaf.to_pandas()
        lv1 = (d.groupby("o_orderpriority", as_index=False)
               .agg(n_orders=("n_orders", "sum"), min_key=("min_key", "min")))
        lv1["o_orderstatus"] = "ALL"
        lv0 = pd.DataFrame({
            "o_orderpriority": ["ALL"], "o_orderstatus": ["ALL"],
            "n_orders": [d["n_orders"].sum()],
            "min_key": [d["min_key"].min()]})
        out = pd.concat([d, lv1, lv0], ignore_index=True)[
            ["o_orderpriority", "o_orderstatus", "n_orders", "min_key"]]
        return pa.Table.from_pandas(out, preserve_index=False)

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderpriority", "o_orderstatus"])
    partials = ds.map_batches(partial, batch_format="pyarrow")
    leaf = tree_aggregate(partials, ["o_orderpriority", "o_orderstatus"],
                          [("n_orders", "sum"), ("min_key", "min")])
    return leaf.map_batches(rollup, batch_format="pyarrow")


def q_rollup_orders_sql() -> str:
    return (
        "WITH leaf AS (SELECT o_orderpriority AS p, o_orderstatus AS s, "
        "count(*) AS n, min(o_orderkey) AS mk FROM orders GROUP BY 1, 2) "
        "SELECT COALESCE(p, 'ALL') AS o_orderpriority, "
        "COALESCE(s, 'ALL') AS o_orderstatus, "
        "CAST(sum(n) AS BIGINT) AS n_orders, min(mk) AS min_key "
        "FROM leaf GROUP BY ROLLUP(p, s)"
    )


def q_cube_orders(sf_dir: str):
    """GROUP BY CUBE(o_orderpriority, o_orderstatus): all four
    grouping-set levels re-derived from the bounded leaf grid of
    q_rollup_orders — still one pass over the data."""
    from .stages.agg_tree import tree_aggregate

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"o_orderpriority": b["o_orderpriority"],
                      "o_orderstatus": b["o_orderstatus"],
                      "n_orders": pa.array(np.ones(b.num_rows, np.int64)),
                      "min_key": b["o_orderkey"]})
        g = t.group_by(["o_orderpriority", "o_orderstatus"]).aggregate(
            [("n_orders", "sum"), ("min_key", "min")])
        return g.rename_columns(
            ["o_orderpriority", "o_orderstatus", "n_orders", "min_key"])

    def cube(leaf: pa.Table) -> pa.Table:
        if leaf.num_rows == 0:
            return leaf
        d = leaf.to_pandas()
        outs = [d]
        for keep_col, all_col in (("o_orderpriority", "o_orderstatus"),
                                  ("o_orderstatus", "o_orderpriority")):
            lv = (d.groupby(keep_col, as_index=False)
                  .agg(n_orders=("n_orders", "sum"),
                       min_key=("min_key", "min")))
            lv[all_col] = "ALL"
            outs.append(lv)
        outs.append(pd.DataFrame({
            "o_orderpriority": ["ALL"], "o_orderstatus": ["ALL"],
            "n_orders": [d["n_orders"].sum()],
            "min_key": [d["min_key"].min()]}))
        out = pd.concat(outs, ignore_index=True)[
            ["o_orderpriority", "o_orderstatus", "n_orders", "min_key"]]
        return pa.Table.from_pandas(out, preserve_index=False)

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderpriority", "o_orderstatus"])
    partials = ds.map_batches(partial, batch_format="pyarrow")
    leaf = tree_aggregate(partials, ["o_orderpriority", "o_orderstatus"],
                          [("n_orders", "sum"), ("min_key", "min")])
    return leaf.map_batches(cube, batch_format="pyarrow")


def q_cube_orders_sql() -> str:
    return (
        "WITH leaf AS (SELECT o_orderpriority AS p, o_orderstatus AS s, "
        "count(*) AS n, min(o_orderkey) AS mk FROM orders GROUP BY 1, 2) "
        "SELECT COALESCE(p, 'ALL') AS o_orderpriority, "
        "COALESCE(s, 'ALL') AS o_orderstatus, "
        "CAST(sum(n) AS BIGINT) AS n_orders, min(mk) AS min_key "
        "FROM leaf GROUP BY CUBE(p, s)"
    )


def q_group_mode(sf_dir: str):
    """Per-bucket MODE (most frequent event_type, ties broken
    lexicographically): per-batch count partials → combiner tree over
    the bounded (bucket × type) grid → vectorized argmax in the final
    ≤ 500-row block.  The mode of a union is derivable from count
    partials, so no row-level shuffle occurs."""
    from .stages.agg_tree import tree_aggregate

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "bucket": pa.array(
                b["user_id"].to_numpy(zero_copy_only=False) % 100),
            "event_type": b["event_type"],
            "n": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by(["bucket", "event_type"]).aggregate([("n", "sum")])
        return g.rename_columns(["bucket", "event_type", "n"])

    def pick(counts: pa.Table) -> pa.Table:
        if counts.num_rows == 0:
            return counts
        d = counts.to_pandas().sort_values(
            ["bucket", "n", "event_type"],
            ascending=[True, False, True], kind="mergesort")
        top = d.drop_duplicates("bucket", keep="first")
        top = top.rename(columns={"event_type": "mode_type"})
        return pa.Table.from_pandas(
            top[["bucket", "mode_type", "n"]], preserve_index=False)

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    partials = ds.map_batches(partial, batch_format="pyarrow")
    counts = tree_aggregate(partials, ["bucket", "event_type"],
                            [("n", "sum")])
    return counts.map_batches(pick, batch_format="pyarrow")


def q_group_mode_sql() -> str:
    return (
        "WITH c AS (SELECT user_id % 100 AS bucket, event_type, "
        "count(*) AS n FROM events GROUP BY 1, 2), "
        "r AS (SELECT bucket, event_type, n, row_number() OVER ("
        "PARTITION BY bucket ORDER BY n DESC, event_type) AS rn FROM c) "
        "SELECT bucket, event_type AS mode_type, CAST(n AS BIGINT) AS n "
        "FROM r WHERE rn = 1"
    )


def q_rank_events(sf_dir: str):
    """Distributed ROW_NUMBER + NTILE(4) per event_type ordered by
    (value DESC, event_id) — the keyed_scan coarse-bucket shape
    (stages/scan.py): types never straddle buckets, each bucket ranks
    all its types in one vectorized pass."""
    from .stages.scan import keyed_scan

    def hash_type(k: np.ndarray) -> np.ndarray:
        import zlib

        uniq, inv = np.unique(k.astype("U"), return_inverse=True)
        codes = np.array([zlib.crc32(u.encode()) for u in uniq], np.int64)
        return codes[inv]

    def rank(d: pd.DataFrame) -> pd.DataFrame:
        g = d.groupby("event_type", sort=False)
        i = g.cumcount().to_numpy()
        cnt = g["event_id"].transform("size").to_numpy()
        size, rem = cnt // 4, cnt % 4
        cut = rem * (size + 1)
        in_big = i < cut
        tile = np.where(
            in_big, i // np.maximum(size + 1, 1),
            rem + (i - cut) // np.maximum(size, 1)) + 1
        out = d[["event_id", "event_type"]].copy()
        out["rnk"] = i + 1
        out["tile4"] = tile.astype(np.int64)
        return out

    def negv(b: pa.Table) -> pa.Table:
        return b.append_column(
            "neg_value",
            pa.array(-b["value"].to_numpy(zero_copy_only=False)))

    ds = _read(sf_dir, "events",
               ["event_id", "event_type", "value"]).map_batches(
        negv, batch_format="pyarrow")
    return keyed_scan(ds, key="event_type", order=["neg_value", "event_id"],
                      fn=rank, n_buckets=8, hash_key=hash_type)


def q_rank_events_sql() -> str:
    return (
        "SELECT event_id, event_type, "
        "CAST(row_number() OVER w AS BIGINT) AS rnk, "
        "CAST(ntile(4) OVER w AS BIGINT) AS tile4 FROM events "
        "WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)"
    )


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
    from .functions.setsim import setsim_join

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return setsim_join(ds, tau=0.9, freq_order=True, ngram_words=3)


def q_setsim_pairs_sql() -> str:
    from .functions.setsim import setsim_sql

    return setsim_sql("documents", 0.9, ngram_words=3)


def _event_boxes(b: pa.Table) -> pa.Table:
    k = b["event_id"].to_numpy(zero_copy_only=False)
    lat, lon = derive_latlon(k)
    hh = 0.5 + (k % 4).astype(np.float64) * 0.75
    hw = 0.5 + (k % 5).astype(np.float64) * 0.6
    return pa.table({"id": pa.array(k), "xmin": pa.array(lon - hw),
                     "ymin": pa.array(lat - hh), "xmax": pa.array(lon + hw),
                     "ymax": pa.array(lat + hh)})


def _part_boxes(b: pa.Table) -> pa.Table:
    k = b["p_partkey"].to_numpy(zero_copy_only=False)
    lat, lon = derive_latlon(k)
    hh = 1.0 + (k % 3).astype(np.float64) * 0.8
    hw = 1.0 + (k % 4).astype(np.float64) * 0.7
    return pa.table({"id": pa.array(k), "xmin": pa.array(lon - hw),
                     "ymin": pa.array(lat - hh), "xmax": pa.array(lon + hw),
                     "ymax": pa.array(lat + hh)})


def q_box_join(sf_dir: str):
    """Large×large rectangle-overlap join (events boxes × part boxes)
    via Partition-Based Spatial-Merge (stages/spatial_join.py): grid
    co-partition + per-cell vectorized test, duplicate reports killed
    by the reference-point rule (no post-dedup shuffle)."""
    from .stages.spatial_join import box_overlap_join

    a = _read(sf_dir, "events", ["event_id"]).map_batches(
        _event_boxes, batch_format="pyarrow")
    b = _read(sf_dir, "part", ["p_partkey"]).map_batches(
        _part_boxes, batch_format="pyarrow")
    return box_overlap_join(a, b, cell=8.0,
                            out_a="event_id", out_b="p_partkey")


def q_box_join_sql() -> str:
    elat, elon = latlon_sql("event_id")
    plat, plon = latlon_sql("p_partkey")
    return f"""
WITH a AS (
  SELECT event_id,
         {elon} - (0.5 + (event_id % 5) * 0.6) AS xmin,
         {elon} + (0.5 + (event_id % 5) * 0.6) AS xmax,
         {elat} - (0.5 + (event_id % 4) * 0.75) AS ymin,
         {elat} + (0.5 + (event_id % 4) * 0.75) AS ymax
  FROM events
), b AS (
  SELECT p_partkey,
         {plon} - (1.0 + (p_partkey % 4) * 0.7) AS xmin,
         {plon} + (1.0 + (p_partkey % 4) * 0.7) AS xmax,
         {plat} - (1.0 + (p_partkey % 3) * 0.8) AS ymin,
         {plat} + (1.0 + (p_partkey % 3) * 0.8) AS ymax
  FROM part
)
SELECT a.event_id, b.p_partkey FROM a JOIN b
ON a.xmin <= b.xmax AND b.xmin <= a.xmax
AND a.ymin <= b.ymax AND b.ymin <= a.ymax
"""


def q_group_concat(sf_dir: str):
    """Ordered STRING_AGG per nation (collect-list) via the
    stages/scan.py coarse-bucket shape: buckets auto-scale to a row
    budget and keys never straddle buckets, so the same plan holds for
    unbounded key spaces; rows arrive (key, c_name)-sorted, making the
    concatenation order deterministic (hash-comparable).  The join
    itself is per-key (string_agg is inherently so) but runs inside
    pandas' groupby-agg over each bucket, never one Ray group per
    key."""
    from .stages.scan import keyed_scan

    def agg(d: pd.DataFrame) -> pd.DataFrame:
        g = d.groupby("c_nationkey", sort=False)
        names = g["c_name"].agg(",".join)
        return pd.DataFrame({
            "c_nationkey": names.index.to_numpy().astype(np.int64),
            "names": names.to_numpy(),
            "n": g.size().to_numpy().astype(np.int64)})

    ds = _read(sf_dir, "customer", ["c_name", "c_nationkey"])
    return keyed_scan(ds, key="c_nationkey", order=["c_name"], fn=agg,
                      n_rows=_nrows(sf_dir, "customer"))


def q_group_concat_sql() -> str:
    return (
        "SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, "
        "string_agg(c_name, ',' ORDER BY c_name) AS names, "
        "CAST(count(*) AS BIGINT) AS n FROM customer GROUP BY c_nationkey"
    )


def q_pagerank(sf_dir: str):
    """3-iteration PageRank over the (user_id%1000 → event_id%1000)
    interaction graph in exact micro-unit integer arithmetic
    (stages/pagerank.py): one data-sized pass builds the weighted edge
    table; each iteration is two hash-bucket co-partition exchanges
    with the rank state as a (node, rank) Dataset — no broadcast, no
    driver-held vector — bit-identical to the unrolled SQL."""
    import ray.data

    from .stages.agg_tree import tree_aggregate
    from .stages.pagerank import pagerank_micro

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


def q_funnel(sf_dir: str):
    """Event-sequence funnel (click → purchase within 1 h) per user:
    the keyed_scan coarse-bucket shape with a vectorized last-click
    cummax per user — purchases at the same timestamp as a click sort
    AFTER it, so the scan sees the click (ties resolved like the SQL
    window's ORDER BY)."""
    from .stages.scan import keyed_scan

    H = 3_600_000_000  # 1h in epoch-us

    def prep(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "click") | (et == "purchase")
        t = b.filter(pa.array(keep))
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        is_p = (t["event_type"].to_numpy(zero_copy_only=False)
                == "purchase").astype(np.int64)
        return pa.table({"user_id": t["user_id"],
                         "t": pa.array(ts, pa.int64()),
                         "is_p": pa.array(is_p, pa.int64()),
                         "event_id": t["event_id"]})

    def scan(d: pd.DataFrame) -> pd.DataFrame:
        # positional numpy throughout (group frames arrive with
        # duplicate index labels — label alignment would misassign)
        u = d["user_id"].to_numpy()
        t = d["t"].to_numpy()
        is_p = d["is_p"].to_numpy()
        # last click timestamp per position, reset at user boundaries
        click_t = np.where(is_p == 0, t, np.iinfo(np.int64).min)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        seg = np.zeros(len(u), np.int64)
        seg[starts] = 1
        gid = np.cumsum(seg)
        s = pd.Series(np.where(click_t == np.iinfo(np.int64).min,
                               np.nan, click_t))
        # cummax leaves NaN at NaN positions — ffill within the group
        # carries the running max over the purchase rows
        lc = s.groupby(gid).cummax().groupby(gid).ffill().to_numpy()
        pmask = is_p == 1
        conv = (~np.isnan(lc[pmask])) & (t[pmask] - lc[pmask] <= H)
        pu = u[pmask]
        out = (pd.DataFrame({"user_id": pu,
                             "n_purchases": np.ones(len(pu), np.int64),
                             "n_converted": conv.astype(np.int64)})
               .groupby("user_id", sort=False, as_index=False).sum())
        return out[["user_id", "n_purchases", "n_converted"]]

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "event_type"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t", "is_p", "event_id"],
                      fn=scan, n_rows=_nrows(sf_dir, "events"))


def q_funnel_sql() -> str:
    return (
        "WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type, event_id "
        "FROM events WHERE event_type IN ('click', 'purchase')), "
        "s AS (SELECT *, max(CASE WHEN event_type = 'click' THEN t END) "
        "OVER (PARTITION BY user_id ORDER BY t, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END, event_id "
        "ROWS UNBOUNDED PRECEDING) AS last_click FROM e) "
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases, "
        "CAST(sum(CASE WHEN last_click IS NOT NULL "
        "AND t - last_click <= 3600000000 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_converted FROM s WHERE event_type = 'purchase' "
        "GROUP BY user_id"
    )


def q_props_extract(sf_dir: str):
    """Semi-structured field extraction: pull the integer ``k`` out of
    the JSON-ish ``props`` string with an RE2 kernel
    (pyarrow.compute.extract_regex — same engine class as DuckDB's
    regexp_extract), then an exact grouped sum/count via per-batch
    partials + combiner tree."""
    import pyarrow.compute as pc

    from .stages.agg_tree import tree_aggregate

    def partial(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["props"], r'"k": (?P<k>\d+)')
        k = pc.struct_field(m, "k").cast(pa.int64())
        t = pa.table({"event_type": b["event_type"],
                      "sum_k": k,
                      "n": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by(["event_type"]).aggregate(
            [("sum_k", "sum"), ("n", "sum")])
        return g.rename_columns(["event_type", "sum_k", "n"])

    ds = _read(sf_dir, "events", ["event_type", "props"])
    return tree_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                          ["event_type"], [("sum_k", "sum"), ("n", "sum")])


def q_props_extract_sql() -> str:
    return (
        "SELECT event_type, "
        "CAST(sum(CAST(regexp_extract(props, '\"k\": (\\d+)', 1) "
        "AS BIGINT)) AS BIGINT) AS sum_k, "
        "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY event_type"
    )


def q_image_pyramid(sf_dir: str):
    """Multi-resolution thumbnail pyramid over the image fixture
    (stages/multimodal.py::ImagePyramid — decode once, emit 3 levels
    per image); returns the per-thumbnail manifest (blobs stay in the
    object store, never reach the driver)."""
    import ray.data

    from .fixtures import ensure_images_parquet, scale_for_sf_dir
    from .stages.multimodal import ImagePyramid

    import ray

    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"])
    # actor pool sized well below the session CPU count (never starve
    # the read stage — CLAUDE.md invariant)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    pyr = ds.map_batches(ImagePyramid, batch_format="pyarrow",
                         batch_size=512, concurrency=max(2, cpus // 4))
    return pyr.map_batches(
        lambda b: b.select(["image_id", "level", "n_bytes"]),
        batch_format="pyarrow")


def q_percentile_cont(sf_dir: str):
    """Interpolated PERCENTILE_CONT without a global sort
    (stages/quantiles.py::percentile_cont): bracketing order statistics
    via sampled-splitter selection, pinned-float interpolation."""
    from .stages.quantiles import percentile_cont

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    return percentile_cont(ds, "l_extendedprice", [0.25, 0.5, 0.9, 0.99])


def q_percentile_cont_sql() -> str:
    return (
        "WITH s AS (SELECT l_extendedprice AS v, "
        "row_number() OVER (ORDER BY l_extendedprice) - 1 AS r, "
        "count(*) OVER () AS n FROM lineitem), "
        "t AS (SELECT CAST(b.q AS DOUBLE) AS q, "
        "CAST(b.q AS DOUBLE) * (sn.n - 1) AS h, sn.n FROM "
        "(VALUES (0.25), (0.5), (0.9), (0.99)) b(q) "
        "CROSS JOIN (SELECT DISTINCT n FROM s) sn(n)) "
        "SELECT t.q, lo.v + (t.h - floor(t.h)) * (hi.v - lo.v) AS value "
        "FROM t JOIN s lo ON lo.r = CAST(floor(t.h) AS BIGINT) "
        "JOIN s hi ON hi.r = CAST(least(floor(t.h) + 1, t.n - 1) AS BIGINT)"
    )


def q_throttle_dedup(sf_dir: str):
    """Windowed first-per-key dedup (event throttling: keep each
    user's FIRST event per hour).  The shuffle ships only
    (key, t, event_id, user_id, hour) projections; survivors resolve
    with one vectorized first-of-run mask per coarse bucket
    (stages/scan.py keyed_scan — keys never straddle buckets)."""
    from .stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        t = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = b["user_id"].to_numpy(zero_copy_only=False)
        hour = t // 3_600_000_000
        # user_id * 2^20 + hour is collision-free while epoch-hours
        # < 2^20 (until year 2089)
        return pa.table({"k": pa.array(u * (1 << 20) + hour, pa.int64()),
                         "t": pa.array(t, pa.int64()),
                         "event_id": b["event_id"],
                         "user_id": b["user_id"],
                         "hour": pa.array(hour, pa.int64())})

    def first(d: pd.DataFrame) -> pd.DataFrame:
        k = d["k"].to_numpy()
        mask = np.r_[True, k[1:] != k[:-1]]
        return d.loc[mask, ["event_id", "user_id", "hour"]]

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="k", order=["t", "event_id"], fn=first,
                      n_rows=_nrows(sf_dir, "events"))


def q_throttle_dedup_sql() -> str:
    return (
        "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t, "
        "epoch_us(ts) // 3600000000 AS hour FROM events) "
        "SELECT event_id, user_id, hour FROM e "
        "QUALIFY row_number() OVER (PARTITION BY user_id, hour "
        "ORDER BY t, event_id) = 1"
    )


def q_radius_join(sf_dir: str):
    """Point–point radius join (events points × part points within 1.5
    degrees): the no-dedup PBSM variant — only the probe side fans out
    to neighbor cells, each build point lives in exactly one cell, so
    every qualifying pair meets exactly once
    (stages/spatial_join.py::point_radius_join)."""
    from .stages.spatial_join import point_radius_join

    def epoints(b: pa.Table) -> pa.Table:
        k = b["event_id"].to_numpy(zero_copy_only=False)
        lat, lon = derive_latlon(k)
        return pa.table({"id": pa.array(k), "x": pa.array(lon),
                         "y": pa.array(lat)})

    def ppoints(b: pa.Table) -> pa.Table:
        k = b["p_partkey"].to_numpy(zero_copy_only=False)
        lat, lon = derive_latlon(k)
        return pa.table({"id": pa.array(k), "x": pa.array(lon),
                         "y": pa.array(lat)})

    a = _read(sf_dir, "events", ["event_id"]).map_batches(
        epoints, batch_format="pyarrow")
    b = _read(sf_dir, "part", ["p_partkey"]).map_batches(
        ppoints, batch_format="pyarrow")
    return point_radius_join(a, b, radius=1.5, cell=8.0,
                             out_a="event_id", out_b="p_partkey")


def q_radius_join_sql() -> str:
    elat, elon = latlon_sql("event_id")
    plat, plon = latlon_sql("p_partkey")
    return (
        f"WITH a AS (SELECT event_id, {elon} AS x, {elat} AS y FROM events), "
        f"b AS (SELECT p_partkey, {plon} AS x, {plat} AS y FROM part) "
        "SELECT a.event_id, b.p_partkey FROM a JOIN b ON "
        "(a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 2.25"
    )


def q_star_join(sf_dir: str):
    """Star-schema join (TPC-H Q5/Q9 shape): the lineitem fact stream
    joins two broadcast dimensions (supplier → nation) in one fused
    map pass — no shuffle touches the fact table; the aggregate is the
    bounded-key combiner tree."""
    from .stages.agg_tree import tree_aggregate
    from .stages.joins import broadcast_hash_join

    import pyarrow.parquet as pq

    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"]).to_pandas()
    dim = sup.merge(nat, left_on="s_nationkey", right_on="n_nationkey")[
        ["s_suppkey", "n_name"]]

    ds = _read(sf_dir, "lineitem", ["l_suppkey", "l_quantity"])
    joined = broadcast_hash_join(ds, dim, on="l_suppkey",
                                 small_on="s_suppkey")

    def partial(b: pd.DataFrame) -> pa.Table:
        q = b["l_quantity"].to_numpy().astype(np.int64)
        t = pa.table({"n_name": pa.array(b["n_name"].to_numpy(), pa.string()),
                      "sum_qty": pa.array(q, pa.int64()),
                      "n_items": pa.array(np.ones(len(b), np.int64))})
        g = t.group_by(["n_name"]).aggregate(
            [("sum_qty", "sum"), ("n_items", "sum")])
        return g.rename_columns(["n_name", "sum_qty", "n_items"])

    partials = joined.map_batches(partial, batch_format="pandas")
    return tree_aggregate(partials, ["n_name"],
                          [("sum_qty", "sum"), ("n_items", "sum")])


def q_star_join_sql() -> str:
    return (
        "SELECT n_name, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) "
        "AS sum_qty, CAST(count(*) AS BIGINT) AS n_items "
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name"
    )


def q_prep_pipeline(sf_dir: str):
    """End-to-end training-data prep (the composition story): language
    ID + quality filter → unbounded-key Bloom dedup on content
    fingerprints → benchmark decontamination (broadcast 5-gram set) →
    BPE-ish token counting, all streaming map stages — documents never
    shuffle except the dup-rate-bounded dedup projection.  Returns the
    surviving-doc manifest (doc_id, lang, n_tokens, n_bpe)."""
    import pyarrow.parquet as pq
    import ray

    from .functions.text import (benchmark_overlap_counts,
                                 bpe_token_count, fingerprint64,
                                 guess_lang, ngram_strings,
                                 quality_features)
    from .stages.dedup import exact_dedup_bloom

    bench_tab = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"],
                              filters=[("doc_id", "<", 10)])
    bench_df = bench_tab.to_pandas()
    bench = np.unique(ngram_strings(bench_df["text"],
                                    bench_df["doc_id"].to_numpy(),
                                    n=5)["g"].to_numpy().astype(str))
    bench_ref = ray.put(bench)

    def filter_stage(b: pd.DataFrame) -> pd.DataFrame:
        qf = quality_features(b["text"])
        lang = guess_lang(b["text"])
        keep = ((lang != "und")
                & (qf["n_chars"].to_numpy() >= 50)
                & (qf["punct_ratio"].to_numpy() <= 0.2))
        out = b.loc[keep, ["doc_id", "text"]].copy()
        out["lang"] = lang[keep]
        out["n_tokens"] = qf["n_tokens"].to_numpy()[keep]
        out["fp"] = fingerprint64(out["text"])
        return out

    def decontam_tokenize(b: pd.DataFrame) -> pd.DataFrame:
        hits = benchmark_overlap_counts(b, ray.get(bench_ref), n=5)
        keep = ~b["doc_id"].isin(set(hits["doc_id"].tolist()))
        out = b.loc[keep, ["doc_id", "lang", "n_tokens"]].copy()
        out["n_bpe"] = bpe_token_count(b.loc[keep, "text"])
        return out

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        filter_stage, batch_format="pandas")
    ds = exact_dedup_bloom(ds, key="fp", order_col="doc_id",
                           n_rows=_nrows(sf_dir, "documents"))
    return ds.map_batches(decontam_tokenize, batch_format="pandas")


def q_travel_dist(sf_dir: str):
    """Distance traveled per user over their event-point trajectory
    (ordered by ts, event_id): per-step planar distances are computed
    row-locally, micro-int-floored BEFORE summation, then integer-
    summed — order-independent, so the distributed result matches the
    SQL LAG window oracle bit-for-bit (float sums would not)."""
    from .stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "x": pa.array(lon), "y": pa.array(lat)})

    def dist(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        x = d["x"].to_numpy()
        y = d["y"].to_numpy()
        dx = np.empty(len(d)); dy = np.empty(len(d))
        dx[0] = dy[0] = 0.0
        dx[1:] = x[1:] - x[:-1]
        dy[1:] = y[1:] - y[:-1]
        first = np.r_[True, u[1:] != u[:-1]]
        dx[first] = dy[first] = 0.0
        step = np.floor(np.sqrt(dx * dx + dy * dy) * 1e6 + 0.5
                        ).astype(np.int64)
        out = pd.DataFrame({"user_id": u, "step": step})
        return (out.groupby("user_id", sort=False, as_index=False)
                .agg(total_micro=("step", "sum"),
                     n_steps=("step", "size")))

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t", "event_id"],
                      fn=dist, n_rows=_nrows(sf_dir, "events"))


def q_travel_dist_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        f"WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        f"{lon} AS x, {lat} AS y FROM events), "
        "s AS (SELECT user_id, x - lag(x) OVER w AS dx, "
        "y - lag(y) OVER w AS dy FROM p "
        "WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)) "
        "SELECT user_id, CAST(sum(CASE WHEN dx IS NULL THEN 0 ELSE "
        "CAST(floor(sqrt(dx * dx + dy * dy) * 1000000 + 0.5) AS BIGINT) "
        "END) AS BIGINT) AS total_micro, "
        "CAST(count(*) AS BIGINT) AS n_steps FROM s GROUP BY user_id"
    )


def q_embedding_stats(sf_dir: str):
    """Per-label stats over the list<float> embedding column: row-local
    squared-norm quantized to micro-ints (order-free integer sums —
    a float Σx² would be summation-order-dependent), aggregated on the
    bounded-label combiner tree."""
    from .stages.agg_tree import tree_aggregate

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


def q_tile_pyramid(sf_dir: str):
    """Tile-count pyramid (z12 → z10 → z8): ONE data pass aggregates
    the z12 leaf, coarser zooms re-derive from the leaf table by
    bit-shifting tile coords (web-mercator tiles nest exactly —
    ``x@z-2 == x@z >> 2`` is bit-exact because the tile formula scales
    one float by a power of two).  The SQL oracle computes each level
    directly from the points; equality is the nesting proof."""
    from .stages.agg_tree import tree_aggregate

    def leaf(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        x, y = tile_xy(lat, lon, 12)
        t = pa.table({"tile_x": pa.array(x), "tile_y": pa.array(y),
                      "n": pa.array(np.ones(len(x), np.int64))})
        g = t.group_by(["tile_x", "tile_y"]).aggregate([("n", "sum")])
        return g.rename_columns(["tile_x", "tile_y", "n"])

    def pyramid(leaf_tab: pa.Table) -> pa.Table:
        if leaf_tab.num_rows == 0:
            return pa.table({"tile_z": pa.array([], pa.int64()),
                             "tile_x": pa.array([], pa.int64()),
                             "tile_y": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        d = leaf_tab.to_pandas()
        outs = []
        for z in (12, 10, 8):
            shift = 12 - z
            lv = d.copy()
            lv["tile_x"] = lv["tile_x"].to_numpy() >> shift
            lv["tile_y"] = lv["tile_y"].to_numpy() >> shift
            lv = (lv.groupby(["tile_x", "tile_y"], as_index=False)
                  .agg(n=("n", "sum")))
            lv.insert(0, "tile_z", np.int64(z))
            outs.append(lv)
        return pa.Table.from_pandas(pd.concat(outs, ignore_index=True),
                                    preserve_index=False)

    ds = _read(sf_dir, "events", ["event_id"])
    leaf_ds = tree_aggregate(ds.map_batches(leaf, batch_format="pyarrow"),
                             ["tile_x", "tile_y"], [("n", "sum")])
    return leaf_ds.map_batches(pyramid, batch_format="pyarrow")


def q_tile_pyramid_sql() -> str:
    lat, lon = latlon_sql("event_id")
    parts = []
    for z in (12, 10, 8):
        x, y = tile_sql(lat, lon, z)
        parts.append(
            f"SELECT CAST({z} AS BIGINT) AS tile_z, {x} AS tile_x, "
            f"{y} AS tile_y, CAST(count(*) AS BIGINT) AS n "
            f"FROM events GROUP BY 2, 3")
    return " UNION ALL ".join(parts)


def q_kmeans(sf_dir: str):
    """2-iteration k-means (k=4) over the embeddings in exact
    micro-int arithmetic (stages/kmeans.py): centroids broadcast, one
    streaming partial-sum pass per iteration, pinned-double centroid
    division — bit-identical to the unrolled SQL oracle."""
    from .stages.kmeans import kmeans_micro

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


def q_upsert_merge(sf_dir: str):
    """Changelog (CDC) merge: base = even events, updates = odd events
    keyed by ``user_id % 500``; latest wins by (ts, event_id).  The
    keyed_scan bucket shape with a vectorized LAST-of-run mask — the
    symmetric twin of throttle_dedup's first-of-run."""
    from .stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array(u % 500, pa.int64()),
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "value": b["value"]})

    def last(d: pd.DataFrame) -> pd.DataFrame:
        k = d["k"].to_numpy()
        mask = np.r_[k[1:] != k[:-1], True]
        out = d.loc[mask, ["k", "event_id", "value"]].copy()
        return out.rename(columns={"k": "merge_key",
                                   "event_id": "latest_event"})

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="k", order=["t", "event_id"], fn=last,
                      n_rows=_nrows(sf_dir, "events"))


def q_upsert_merge_sql() -> str:
    return (
        "WITH e AS (SELECT user_id % 500 AS merge_key, epoch_us(ts) AS t, "
        "event_id, value FROM events) "
        "SELECT merge_key, event_id AS latest_event, value FROM e "
        "QUALIFY row_number() OVER (PARTITION BY merge_key "
        "ORDER BY t DESC, event_id DESC) = 1"
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


def q_compress_ratio(sf_dir: str):
    """Per-document zlib compression ratio (redundancy/entropy proxy
    for quality filtering) — vector stage over the documents stream;
    zlib output is deterministic at a fixed level but not
    SQL-expressible, so this is a rows-only entry (determinism is
    unit-tested instead)."""
    from .functions.text import compression_ratio

    def score(b: pd.DataFrame) -> pd.DataFrame:
        r = compression_ratio(b["text"])
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(),
            "ratio_micro": np.floor(r * 1e6 + 0.5).astype(np.int64)})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        score, batch_format="pandas")


def q_mad(sf_dir: str):
    """Median absolute deviation of l_extendedprice — two composed
    exact order-statistic passes (stages/quantiles.py::select_ranks):
    the median from pass one parameterizes a derived |x - m| column
    for pass two; neither pass sorts or materializes the data.  The
    absolute-difference derivation is one exact float subtraction, so
    the SQL oracle matches bit-for-bit."""
    from .stages.quantiles import select_ranks

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    n = ds.count()
    r = (n - 1) // 2
    med = select_ranks(ds, "l_extendedprice", [r])[r]

    def deviate(b: pa.Table, m=med) -> pa.Table:
        x = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table({"dev": pa.array(np.abs(x - m))})

    dev = ds.map_batches(deviate, batch_format="pyarrow")
    mad = select_ranks(dev, "dev", [r])[r]
    return pd.DataFrame({"median": [float(med)], "mad": [float(mad)]})


def q_mad_sql() -> str:
    return (
        "WITH s AS (SELECT l_extendedprice AS v, row_number() OVER ("
        "ORDER BY l_extendedprice) - 1 AS r, count(*) OVER () AS n "
        "FROM lineitem), "
        "m AS (SELECT v FROM s WHERE r = (n - 1) // 2), "
        "d AS (SELECT abs(l_extendedprice - (SELECT v FROM m)) AS dv "
        "FROM lineitem), "
        "t AS (SELECT dv, row_number() OVER (ORDER BY dv) - 1 AS r, "
        "count(*) OVER () AS n FROM d) "
        "SELECT (SELECT v FROM m) AS median, dv AS mad FROM t "
        "WHERE r = (n - 1) // 2"
    )


def q_sliding_distinct(sf_dir: str):
    """Sliding-window COUNT(DISTINCT user): 1 h windows every 15 min —
    the window explode (np.repeat inside map_batches, with a LOCAL
    (window, user) pair dedup so the shuffle carries distinct pairs,
    not 4× rows) composed with the unbounded-pair-key distinct
    machinery (stages/agg_tree.py::grouped_count_distinct shape)."""
    from .stages.agg_tree import grouped_count

    STEP_US = 900_000_000
    NSUB = 4

    def expand_pairs(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        slot = ts // STEP_US
        wins = (np.repeat(slot, NSUB)
                - np.tile(np.arange(NSUB, dtype=np.int64), len(slot)))
        t = pa.table({"win_slot": pa.array(wins, pa.int64()),
                      "user_id": pa.array(np.repeat(u, NSUB), pa.int64())})
        return t.group_by(["win_slot", "user_id"]).aggregate([])

    from .stages.scan import hash_bucket_scan

    pairs = _read(sf_dir, "events", ["ts", "user_id"]).map_batches(
        expand_pairs, batch_format="pyarrow")
    # pair-key distinct through ONE coarse hash exchange (a pair lands
    # wholly in one bucket; within-bucket Arrow group_by) — no global
    # sort over the unbounded (window, user) key space
    uniq = hash_bucket_scan(
        pairs, ["win_slot", "user_id"],
        lambda t: t.group_by(["win_slot", "user_id"]).aggregate([]),
        n_rows=NSUB * _nrows(sf_dir, "events"))
    out = grouped_count(uniq, ["win_slot"], out_col="n_users")

    def finish(b: pa.Table) -> pa.Table:
        slots = b["win_slot"].to_numpy(zero_copy_only=False)
        return pa.table({
            "win_start_us": pa.array(slots * 900_000_000, pa.int64()),
            "n_users": b["n_users"]})

    return out.map_batches(finish, batch_format="pyarrow")


def q_sliding_distinct_sql() -> str:
    return (
        "WITH e AS (SELECT epoch_us(ts) AS t, user_id FROM events), "
        "j AS (SELECT unnest(range(4)) AS j), "
        "w AS (SELECT ((t // 900000000) - j) * 900000000 AS win_start_us, "
        "user_id FROM e CROSS JOIN j) "
        "SELECT win_start_us, CAST(count(DISTINCT user_id) AS BIGINT) "
        "AS n_users FROM w GROUP BY 1"
    )


def q_audio_features(sf_dir: str):
    """Audio decode → duration/RMS/peak/channels over the deterministic
    PCM-WAV fixture (stages/multimodal.py::AudioFeatures — the REAL
    pure-struct WAV codec; compressed formats are documented stubs).
    Actor pool, blobs never reach the driver; rows-only (no SQL can
    decode WAV) — decode correctness is unit-tested against the
    generating parameters instead."""
    import ray
    import ray.data

    from .fixtures import ensure_audio_parquet
    from .stages.multimodal import AudioFeatures

    path = ensure_audio_parquet(200)
    ds = ray.data.read_parquet(path, columns=["audio_id", "bytes"])
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return ds.map_batches(AudioFeatures, batch_format="pyarrow",
                          batch_size=64, concurrency=max(2, cpus // 8))


def q_equidepth_hist(sf_dir: str):
    """10-bucket equi-depth histogram of l_extendedprice: the 9
    interior edges are EXACT order statistics (select_ranks — no
    sort), bucket membership is a half-open searchsorted against the
    broadcast edges, counts aggregate on the combiner tree.  Duplicate
    values never split across buckets (unlike NTILE), so the SQL
    oracle counts with the same half-open interval rule."""
    from .stages.agg_tree import tree_aggregate
    from .stages.quantiles import select_ranks

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    n = ds.count()
    ranks = [int(np.floor(q * (n - 1))) for q in
             (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)]
    vals = select_ranks(ds, "l_extendedprice", sorted(set(ranks)))
    edges = np.array([vals[r] for r in sorted(set(ranks))], np.float64)

    def bucketize(b: pa.Table, e=edges) -> pa.Table:
        x = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        bk = np.searchsorted(e, x, side="right")
        t = pa.table({"bucket": pa.array(bk.astype(np.int64)),
                      "n": pa.array(np.ones(len(x), np.int64))})
        g = t.group_by(["bucket"]).aggregate([("n", "sum")])
        return g.rename_columns(["bucket", "n"])

    return tree_aggregate(ds.map_batches(bucketize, batch_format="pyarrow"),
                          ["bucket"], [("n", "sum")])


def q_equidepth_hist_sql() -> str:
    return (
        "WITH s AS (SELECT l_extendedprice AS v, row_number() OVER ("
        "ORDER BY l_extendedprice) - 1 AS r, count(*) OVER () AS n "
        "FROM lineitem), "
        "e AS (SELECT CAST(b.q AS DOUBLE) AS q, s.v FROM s JOIN "
        "(VALUES (0.1), (0.2), (0.3), (0.4), (0.5), (0.6), (0.7), "
        "(0.8), (0.9)) b(q) "
        "ON s.r = CAST(floor(CAST(b.q AS DOUBLE) * (n - 1)) AS BIGINT)) "
        "SELECT CAST((SELECT count(*) FROM e WHERE e.v <= l.l_extendedprice)"
        " AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n "
        "FROM lineitem l GROUP BY 1"
    )


def q_scd_intervals(sf_dir: str):
    """Slowly-changing-dimension (type 2) interval build: each user's
    events become validity intervals [ts, next_ts) with the sentinel
    MAX for the open current row — the LEAD window as a vectorized
    next-of-run shift inside coarse key buckets (keys never straddle
    buckets, so no cross-partition carry)."""
    from .stages.scan import keyed_scan

    SENTINEL = np.int64(2**62)

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"]})

    def intervals(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        t = d["t"].to_numpy()
        nxt = np.empty_like(t)
        nxt[:-1] = t[1:]
        nxt[-1] = SENTINEL
        last = np.r_[u[1:] != u[:-1], True]
        nxt[last] = SENTINEL
        out = d[["user_id", "event_id"]].copy()
        out["valid_from"] = t
        out["valid_to"] = nxt
        return out

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t", "event_id"],
                      fn=intervals, n_rows=_nrows(sf_dir, "events"))


def q_scd_intervals_sql() -> str:
    return (
        "SELECT user_id, event_id, epoch_us(ts) AS valid_from, "
        "COALESCE(lead(epoch_us(ts)) OVER (PARTITION BY user_id "
        "ORDER BY epoch_us(ts), event_id), 4611686018427387904) "
        "AS valid_to FROM events"
    )


def q_ratio_to_report(sf_dir: str):
    """Ratio-to-report window (each event's share of its type's total):
    totals are exact integer sums of micro-quantized values (one tiny
    combiner-tree pass, broadcast back), shares one pinned double
    division per row — no row shuffle at all, and no float-sum
    order-dependence."""
    import ray

    from .stages.agg_tree import tree_aggregate

    def quantize(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        t = pa.table({"event_type": b["event_type"],
                      "event_id": b["event_id"],
                      "v_micro": pa.array(
                          np.floor(v * 1e6 + 0.5).astype(np.int64))})
        return t

    ds = _read(sf_dir, "events",
               ["event_id", "event_type", "value"]).map_batches(
        quantize, batch_format="pyarrow").materialize()

    def partial(b: pa.Table) -> pa.Table:
        g = (b.select(["event_type", "v_micro"])
             .group_by(["event_type"]).aggregate([("v_micro", "sum")]))
        return g.rename_columns(["event_type", "total"])

    totals = tree_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                            ["event_type"], [("total", "sum")]).to_pandas()
    ref = ray.put(dict(zip(totals["event_type"], totals["total"])))

    def share(b: pa.Table) -> pa.Table:
        import ray as _ray

        tot = _ray.get(ref)
        et = b["event_type"].to_pylist()
        v = b["v_micro"].to_numpy(zero_copy_only=False)
        t = np.array([tot[e] for e in et], np.int64)
        s = np.floor(v.astype(np.float64) / t.astype(np.float64)
                     * 1e6 + 0.5).astype(np.int64)
        return pa.table({"event_id": b["event_id"],
                         "share_micro": pa.array(s, pa.int64())})

    return ds.map_batches(share, batch_format="pyarrow")


def q_ratio_to_report_sql() -> str:
    return (
        "WITH e AS (SELECT event_id, event_type, "
        "CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v FROM events) "
        "SELECT event_id, CAST(floor(CAST(v AS DOUBLE) / "
        "CAST(sum(v) OVER (PARTITION BY event_type) AS DOUBLE) "
        "* 1000000 + 0.5) AS BIGINT) AS share_micro FROM e"
    )


def q_full_outer(sf_dir: str):
    """FULL OUTER equi-join through one hash co-partition exchange +
    per-bucket Acero full-outer join (stages/joins.py::
    copart_hash_join; NO broadcast side): BUILDING-segment customers ⋈
    per-customer count of 'F'-status orders.  Both null sides are real
    — customers with no F orders and F orders from other segments'
    customers — and are filled with -1 (COALESCE on both sides keeps
    schemas nullable-free).  The pre-join count aggregates per
    customer key via the coarse hash-bucket scan (stages/scan.py), the
    unbounded-key path: batch-local Arrow group_by combiner, then one
    keyed exchange."""
    import pyarrow.compute as pc

    from .stages.joins import copart_hash_join
    from .stages.scan import hash_bucket_scan

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_acctbal", "c_mktsegment"])

    def filt_cust(b: pa.Table) -> pa.Table:
        m = pc.equal(b["c_mktsegment"], "BUILDING")
        t = b.filter(m)
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        q2 = np.floor(bal * 100.0 + 0.5).astype(np.int64)
        return pa.table({"c_custkey": t["c_custkey"],
                         "acctbal_q2": pa.array(q2, pa.int64())})

    left = cust.map_batches(filt_cust, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])

    def partial_counts(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["o_orderstatus"], "F"))
        g = t.select(["o_custkey"]).group_by(["o_custkey"]).aggregate(
            [("o_custkey", "count")])
        return g.rename_columns(["o_custkey", "n_f_orders"])

    def bucket_sum(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_custkey"]).aggregate([("n_f_orders", "sum")])
        return g.rename_columns(["o_custkey", "n_f_orders"])

    right = hash_bucket_scan(
        orders.map_batches(partial_counts, batch_format="pyarrow"),
        ["o_custkey"], bucket_sum, n_rows=_nrows(sf_dir, "orders"))

    j = copart_hash_join(
        left, right, "c_custkey", "o_custkey", how="full_outer",
        n_rows=_nrows(sf_dir, "customer"),
        left_schema=pa.schema([("c_custkey", pa.int64()),
                               ("acctbal_q2", pa.int64())]),
        right_schema=pa.schema([("o_custkey", pa.int64()),
                                ("n_f_orders", pa.int64())]))

    def finish(b: pa.Table) -> pa.Table:
        # the full_outer join coalesces the two key columns into the
        # left key name (right-only rows carry their key there)
        return pa.table({
            "custkey": pc.cast(b["c_custkey"], pa.int64()),
            "acctbal_q2": pc.cast(
                pc.coalesce(b["acctbal_q2"], pa.scalar(-1)), pa.int64()),
            "n_f_orders": pc.cast(
                pc.coalesce(b["n_f_orders"], pa.scalar(-1)), pa.int64()),
        })

    return j.map_batches(finish, batch_format="pyarrow")


def q_full_outer_sql() -> str:
    return (
        "WITH c AS (SELECT c_custkey, CAST(floor(c_acctbal * 100.0 + 0.5) "
        "AS BIGINT) AS acctbal_q2 FROM customer "
        "WHERE c_mktsegment = 'BUILDING'), "
        "o AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_f_orders "
        "FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey) "
        "SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey, "
        "COALESCE(c.acctbal_q2, -1) AS acctbal_q2, "
        "COALESCE(o.n_f_orders, -1) AS n_f_orders "
        "FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey"
    )


def q_user_window(sf_dir: str):
    """LEAD / FIRST_VALUE / running MAX per user in (ts, event_id)
    order — one coarse-bucket keyed scan (stages/scan.py), all three
    windows from a single vectorized pass over the sorted bucket (the
    running max is over the micro-quantized int value, so the oracle's
    windowed MAX matches bit-for-bit)."""
    from .stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        vq2 = np.floor(v * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "event_id": b["event_id"], "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "vq2": pa.array(vq2, pa.int64())})

    def scan(d: pd.DataFrame) -> pd.DataFrame:
        k = d["user_id"].to_numpy()
        ts = d["ts_us"].to_numpy()
        first_mask = np.ones(len(d), dtype=bool)
        first_mask[1:] = k[1:] != k[:-1]
        # LEAD(ts): next row's ts, -1 on each user's last row
        lead = np.empty_like(ts)
        lead[:-1] = ts[1:]
        last_mask = np.ones(len(d), dtype=bool)
        last_mask[:-1] = first_mask[1:]
        lead[last_mask] = -1
        # FIRST_VALUE(ts): broadcast each segment's first ts
        seg_start = np.flatnonzero(first_mask)
        sizes = np.diff(np.append(seg_start, len(d)))
        first_ts = np.repeat(ts[seg_start], sizes)
        # running MAX(vq2) within the segment (pandas cummax — C loop,
        # no per-key Python; max has no subtract-the-base reset trick)
        cummax = d.groupby("user_id", sort=False)["vq2"].cummax().to_numpy()
        return pd.DataFrame({
            "event_id": d["event_id"].to_numpy(),
            "lead_ts_us": lead,
            "first_ts_us": first_ts,
            "cummax_vq2": cummax})

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["ts_us", "event_id"],
                      fn=scan, n_rows=_nrows(sf_dir, "events"))


def q_user_window_sql() -> str:
    return (
        "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vq2 FROM events) "
        "SELECT event_id, COALESCE(lead(ts_us) OVER w, -1) AS lead_ts_us, "
        "first_value(ts_us) OVER w AS first_ts_us, "
        "max(vq2) OVER (PARTITION BY user_id ORDER BY ts_us, event_id "
        "ROWS UNBOUNDED PRECEDING) AS cummax_vq2 "
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)"
    )


def q_dense_rank(sf_dir: str):
    """DENSE_RANK per event_type over floor(value) DESC (the integer
    floor guarantees real tie groups).  Coarse-bucket keyed scan;
    within each sorted bucket the rank is one cumsum over
    value-change flags with per-type base subtraction — no per-key
    loop."""
    from .stages.scan import keyed_scan

    def hash_type(k: np.ndarray) -> np.ndarray:
        import zlib

        uniq, inv = np.unique(k.astype("U"), return_inverse=True)
        codes = np.array([zlib.crc32(u.encode()) for u in uniq], np.int64)
        return codes[inv]

    def prep(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        nvq = -np.floor(v).astype(np.int64)
        return pa.table({"event_id": b["event_id"],
                         "event_type": b["event_type"],
                         "neg_vq": pa.array(nvq, pa.int64())})

    def scan(d: pd.DataFrame) -> pd.DataFrame:
        t = d["event_type"].to_numpy()
        v = d["neg_vq"].to_numpy()
        new_type = np.ones(len(d), dtype=bool)
        new_type[1:] = t[1:] != t[:-1]
        new_val = new_type.copy()
        new_val[1:] |= v[1:] != v[:-1]
        s = np.cumsum(new_val)
        starts = np.flatnonzero(new_type)
        sizes = np.diff(np.append(starts, len(d)))
        base = np.repeat(s[starts], sizes)
        return pd.DataFrame({"event_id": d["event_id"].to_numpy(),
                             "drank": (s - base + 1).astype(np.int64)})

    ds = _read(sf_dir, "events",
               ["event_id", "event_type", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="event_type", order=["neg_vq"], fn=scan,
                      n_buckets=8, hash_key=hash_type)


def q_dense_rank_sql() -> str:
    return (
        "SELECT event_id, CAST(dense_rank() OVER (PARTITION BY event_type "
        "ORDER BY CAST(floor(value) AS BIGINT) DESC) AS BIGINT) AS drank "
        "FROM events"
    )


def q_corr_flags(sf_dir: str):
    """Pearson correlation of (quantity, price) per returnflag in
    EXACT integer arithmetic end-to-end: per-batch int64 partial sums
    (n, Σx, Σy, Σxy, Σx², Σy² over unit-quantized values — Σy² stays
    < 2^63 up to ~10^8 rows at these magnitudes; beyond that, split y
    into hi/lo limbs), a combiner tree over the 3-flag key space, and
    the final n·Σxy − ΣxΣy / √(..)·√(..) in PYTHON ints (arbitrary
    precision — the n·Σ products overflow int64 by design) with one
    pinned float expression at the end, mirrored exactly by the
    oracle's HUGEINT sums + DOUBLE casts."""
    import math

    import ray

    from .stages.agg_tree import tree_aggregate

    def partial(b: pa.Table) -> pa.Table:
        x = np.floor(b["l_quantity"].to_numpy(zero_copy_only=False)
                     + 0.5).astype(np.int64)
        y = np.floor(b["l_extendedprice"].to_numpy(zero_copy_only=False)
                     + 0.5).astype(np.int64)
        t = pa.table({"flag": b["l_returnflag"],
                      "n": pa.array(np.ones(len(x), np.int64)),
                      "sx": pa.array(x), "sy": pa.array(y),
                      "sxy": pa.array(x * y), "sxx": pa.array(x * x),
                      "syy": pa.array(y * y)})
        g = t.group_by(["flag"]).aggregate(
            [(c, "sum") for c in ("n", "sx", "sy", "sxy", "sxx", "syy")])
        return g.rename_columns(["flag", "n", "sx", "sy", "sxy",
                                 "sxx", "syy"])

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])
    sums = tree_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), ["flag"],
        [(c, "sum") for c in ("n", "sx", "sy", "sxy", "sxx", "syy")])
    df = sums.to_pandas()  # ≤ |distinct flags| rows

    flags, ns, corr = [], [], []
    for _, r in df.sort_values("flag").iterrows():
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxy, sxx, syy = int(r["sxy"]), int(r["sxx"]), int(r["syy"])
        num = n * sxy - sx * sy          # exact python ints
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        c = math.floor(1e6 * (float(num)
                              / (math.sqrt(float(dx))
                                 * math.sqrt(float(dy)))) + 0.5)
        flags.append(r["flag"])
        ns.append(n)
        corr.append(c)
    return pd.DataFrame({"flag": flags,
                         "n": np.array(ns, np.int64),
                         "corr_micro": np.array(corr, np.int64)})


def q_corr_flags_sql() -> str:
    return (
        "WITH l AS (SELECT l_returnflag AS flag, "
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS x, "
        "CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y FROM lineitem), "
        "s AS (SELECT flag, count(*) AS n, sum(x) AS sx, sum(y) AS sy, "
        "sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy "
        "FROM l GROUP BY flag) "
        "SELECT flag, CAST(n AS BIGINT) AS n, "
        "CAST(floor(1e6 * (CAST(n*sxy - sx*sy AS DOUBLE) / "
        "(sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * "
        "sqrt(CAST(n*syy - sy*sy AS DOUBLE)))) + 0.5) AS BIGINT) "
        "AS corr_micro FROM s"
    )


def q_pct_rank(sf_dir: str):
    """PERCENT_RANK + CUME_DIST per event_type over floor(value):
    coarse-bucket keyed scan; within a sorted bucket both statistics
    are run-boundary arithmetic (first/last index of each tie run
    inside its type segment) — no per-key loop.  The two divisions are
    single pinned double ops of small ints, identical on the SQL side,
    so the doubles hash-match."""
    from .stages.scan import keyed_scan

    def hash_type(k: np.ndarray) -> np.ndarray:
        import zlib

        uniq, inv = np.unique(k.astype("U"), return_inverse=True)
        codes = np.array([zlib.crc32(u.encode()) for u in uniq], np.int64)
        return codes[inv]

    def prep(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({"event_id": b["event_id"],
                         "event_type": b["event_type"],
                         "vq": pa.array(np.floor(v).astype(np.int64),
                                        pa.int64())})

    def scan(d: pd.DataFrame) -> pd.DataFrame:
        t = d["event_type"].to_numpy()
        v = d["vq"].to_numpy()
        m = len(d)
        new_type = np.ones(m, dtype=bool)
        new_type[1:] = t[1:] != t[:-1]
        new_val = new_type.copy()
        new_val[1:] |= v[1:] != v[:-1]
        seg_starts = np.flatnonzero(new_type)
        seg_sizes = np.diff(np.append(seg_starts, m))
        run_starts = np.flatnonzero(new_val)
        run_sizes = np.diff(np.append(run_starts, m))
        run_ends = np.append(run_starts[1:], m) - 1
        seg_start = np.repeat(seg_starts, seg_sizes)
        n = np.repeat(seg_sizes, seg_sizes).astype(np.float64)
        rank = (np.repeat(run_starts, run_sizes) - seg_start + 1
                ).astype(np.float64)
        cume = (np.repeat(run_ends, run_sizes) - seg_start + 1
                ).astype(np.float64)
        pct = np.where(n > 1.0, (rank - 1.0) / (n - 1.0), 0.0)
        return pd.DataFrame({"event_id": d["event_id"].to_numpy(),
                             "pct_rank": pct,
                             "cume": cume / n})

    ds = _read(sf_dir, "events",
               ["event_id", "event_type", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="event_type", order=["vq"], fn=scan,
                      n_buckets=8, hash_key=hash_type)


def q_pct_rank_sql() -> str:
    return (
        "SELECT event_id, "
        "percent_rank() OVER w AS pct_rank, cume_dist() OVER w AS cume "
        "FROM events WINDOW w AS (PARTITION BY event_type "
        "ORDER BY CAST(floor(value) AS BIGINT))"
    )


def q_retention(sf_dir: str):
    """Cohort retention: cohort = each user's first active week, then
    distinct-user counts per (cohort_week, active_week).  ONE hash
    co-partition shuffle on user_id does all the per-user work (first
    week + distinct weeks) vectorized inside each bucket; the
    (cohort, week) key space is bounded (weeks²), so the final count
    rides the combiner tree — no second all-to-all."""
    from .stages.agg_tree import tree_aggregate
    from .stages.scan import hash_bucket_scan

    WEEK_US = 7 * 86400 * 1_000_000

    def prep(b: pa.Table) -> pa.Table:
        ts = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b["user_id"],
                         "wk": pa.array(ts // WEEK_US, pa.int64())})

    def per_user(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        w = t["wk"].to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (w[1:] != w[:-1])
        u, w = u[keep], w[keep]                      # distinct (user, wk)
        new_u = np.ones(len(u), dtype=bool)
        new_u[1:] = u[1:] != u[:-1]
        sizes = np.diff(np.append(np.flatnonzero(new_u), len(u)))
        cohort = np.repeat(w[new_u], sizes)          # per-user min week
        t2 = pa.table({"cohort": pa.array(cohort, pa.int64()),
                       "wk": pa.array(w, pa.int64()),
                       "n_users": pa.array(np.ones(len(u), np.int64))})
        g = t2.group_by(["cohort", "wk"]).aggregate([("n_users", "sum")])
        return g.rename_columns(["cohort", "wk", "n_users"])

    ds = _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    pairs = hash_bucket_scan(ds, ["user_id"], per_user,
                             n_rows=_nrows(sf_dir, "events"))
    return tree_aggregate(pairs, ["cohort", "wk"], [("n_users", "sum")])


def q_retention_sql() -> str:
    return (
        "WITH w AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk "
        "FROM events), "
        "c AS (SELECT user_id, min(wk) AS cohort FROM w GROUP BY user_id), "
        "a AS (SELECT DISTINCT w.user_id, c.cohort, w.wk "
        "FROM w JOIN c USING (user_id)) "
        "SELECT cohort, wk, CAST(count(*) AS BIGINT) AS n_users "
        "FROM a GROUP BY cohort, wk"
    )


def q_doc_stats(sf_dir: str):
    """Gopher-style repetition quality signals per document: word
    count, distinct-word count, duplicate-word fraction and
    top-word fraction — the cheap repetition filters a training-data
    pipeline runs before dedup.  Pure per-row map (no shuffle); the
    fractions are single pinned double divisions of exact ints."""
    import re

    word_re = re.compile(r"[a-z0-9]+")

    def stats(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        out_id, n_w, n_d, max_c = [], [], [], []
        for i, txt in enumerate(b["text"].to_pylist()):
            words = word_re.findall(txt.lower())
            if not words:
                continue                    # SQL's unnest emits no row
            _, counts = np.unique(np.array(words, dtype="U"),
                                  return_counts=True)
            out_id.append(ids[i])
            n_w.append(len(words))
            n_d.append(len(counts))
            max_c.append(int(counts.max()))
        n_w_arr = np.array(n_w, np.int64)
        n_d_arr = np.array(n_d, np.int64)
        max_arr = np.array(max_c, np.int64)
        denom = n_w_arr.astype(np.float64)
        return pa.table({
            "doc_id": pa.array(np.array(out_id, np.int64), pa.int64()),
            "n_words": pa.array(n_w_arr, pa.int64()),
            "n_distinct": pa.array(n_d_arr, pa.int64()),
            "dup_word_frac": pa.array(
                (n_w_arr - n_d_arr).astype(np.float64) / denom, pa.float64()),
            "top_word_frac": pa.array(
                max_arr.astype(np.float64) / denom, pa.float64())})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow")


def q_doc_stats_sql() -> str:
    return (
        "WITH w AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), "
        "'[a-z0-9]+')) AS w FROM documents), "
        "cnt AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w), "
        "agg AS (SELECT doc_id, sum(c) AS n_words, count(*) AS n_distinct, "
        "max(c) AS max_c FROM cnt GROUP BY doc_id) "
        "SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, "
        "CAST(n_distinct AS BIGINT) AS n_distinct, "
        "CAST(n_words - n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) "
        "AS dup_word_frac, "
        "CAST(max_c AS DOUBLE) / CAST(n_words AS DOUBLE) AS top_word_frac "
        "FROM agg"
    )


def q_type_entropy(sf_dir: str):
    """Shannon entropy of each event_type's user-activity distribution
    in nano-units: each (type, user) cell contributes the integer
    floor(-(p·ln p)·1e9 + 0.5) and the per-type entropy is the exact
    integer SUM of those terms — summation-order-proof (the house
    rule for transcendental outputs).  ln goes through math.log (libm:
    bit-identical to DuckDB's ln; numpy's SIMD log drifts 1 ulp on
    ~3 % of inputs — measured).  Shape: one pair-key hash shuffle
    makes (type, user) counts exact (user cardinality unbounded);
    per-type totals and the final term sum ride the combiner tree
    (type cardinality bounded)."""
    import math

    import ray

    from .stages.agg_tree import tree_aggregate, tree_aggregate_to_table
    from .stages.scan import hash_bucket_scan

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def local_counts(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "user_id"]).aggregate(
            [("user_id", "count")])
        return g.rename_columns(["event_type", "user_id", "c"])

    def bucket_counts(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "user_id"]).aggregate([("c", "sum")])
        return g.rename_columns(["event_type", "user_id", "c"])

    partial = ds.map_batches(local_counts, batch_format="pyarrow")
    pairs = hash_bucket_scan(partial, ["user_id"], bucket_counts,
                             n_rows=_nrows(sf_dir, "events"))
    totals = tree_aggregate_to_table(pairs, ["event_type"], [("c", "sum")])
    tot = {t: int(n) for t, n in zip(totals["event_type"].to_pylist(),
                                     totals["c"].to_pylist())}
    tot_ref = ray.put(tot)

    def term(b: pa.Table) -> pa.Table:
        from .functions.near_dup import _obj_cached

        lookup = _obj_cached(tot_ref)
        types = b["event_type"].to_pylist()
        c = b["c"].to_numpy(zero_copy_only=False)
        n = np.array([lookup[t] for t in types], np.int64)
        p = c.astype(np.float64) / n.astype(np.float64)
        # math.log, not np.log: libm parity with the oracle's ln
        terms = np.fromiter(
            (math.floor(-(pi * math.log(pi)) * 1e9 + 0.5) for pi in p),
            dtype=np.int64, count=len(p))
        return pa.table({"event_type": b["event_type"],
                         "entropy_nano": pa.array(terms, pa.int64())})

    return tree_aggregate(pairs.map_batches(term, batch_format="pyarrow"),
                          ["event_type"], [("entropy_nano", "sum")])


def q_type_entropy_sql() -> str:
    return (
        "WITH c AS (SELECT event_type, user_id, count(*) AS c FROM events "
        "GROUP BY event_type, user_id), "
        "n AS (SELECT event_type, sum(c) AS n FROM c GROUP BY event_type), "
        "t AS (SELECT c.event_type, CAST(floor(-((CAST(c.c AS DOUBLE) / "
        "CAST(n.n AS DOUBLE)) * ln(CAST(c.c AS DOUBLE) / "
        "CAST(n.n AS DOUBLE))) * 1e9 + 0.5) AS BIGINT) AS term "
        "FROM c JOIN n USING (event_type)) "
        "SELECT event_type, CAST(sum(term) AS BIGINT) AS entropy_nano "
        "FROM t GROUP BY event_type"
    )


def q_gap_fill(sf_dir: str):
    """Per-user hourly gap-fill with forward fill: each user's sparse
    (hour, max value) series expands to every hour in [first, last]
    carrying the latest known value — the time-series resample+ffill
    primitive.  ONE user-key hash shuffle; inside a bucket the
    expansion is grouped-arange arithmetic and the fill is one global
    searchsorted over a (user, hour) composite key — no per-user
    loop.  Values pass through untouched (max of doubles), so floats
    hash-match."""
    from .stages.scan import hash_bucket_scan

    HOUR_US = 3600 * 1_000_000

    def prep(b: pa.Table) -> pa.Table:
        ts = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b["user_id"],
                         "h": pa.array(ts // HOUR_US, pa.int64()),
                         "value": b["value"]})

    def fill(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        h = t["h"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        if len(u) == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "h": pa.array([], pa.int64()),
                             "v": pa.array([], pa.float64())})
        # per-(user, hour) max(value), sorted by (user, hour)
        order = np.lexsort((v, h, u))
        u, h, v = u[order], h[order], v[order]
        last = np.ones(len(u), dtype=bool)
        last[:-1] = (u[1:] != u[:-1]) | (h[1:] != h[:-1])
        u, h, v = u[last], h[last], v[last]          # max = last in v-order
        # per-user [h0, h1] expansion (grouped arange)
        new_u = np.ones(len(u), dtype=bool)
        new_u[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new_u)
        ends = np.append(starts[1:], len(u)) - 1
        h0, h1 = h[starts], h[ends]
        lens = h1 - h0 + 1
        total = int(lens.sum())
        off = np.repeat(np.cumsum(lens) - lens, lens)
        out_h = np.arange(total, dtype=np.int64) - off + np.repeat(h0, lens)
        out_u = np.repeat(u[starts], lens)
        # forward fill: latest sparse row ≤ out_h per user, via a
        # composite (user-ordinal, hour) key monotone within the bucket
        uidx = np.cumsum(new_u) - 1                   # ordinal per sparse row
        out_uidx = np.repeat(np.arange(len(starts), dtype=np.int64), lens)
        SPAN = np.int64(1) << 42                      # hours ≪ 2^42
        key_sparse = uidx * SPAN + h
        key_out = out_uidx * SPAN + out_h
        idx = np.searchsorted(key_sparse, key_out, side="right") - 1
        return pa.table({"user_id": pa.array(out_u, pa.int64()),
                         "h": pa.array(out_h, pa.int64()),
                         "v": pa.array(v[idx], pa.float64())})

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return hash_bucket_scan(ds, ["user_id"], fill,
                            n_rows=_nrows(sf_dir, "events"))


def q_gap_fill_sql() -> str:
    return (
        "WITH hv AS (SELECT user_id, epoch_us(ts) // 3600000000 AS h, "
        "max(value) AS v FROM events GROUP BY user_id, h), "
        "b AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hv "
        "GROUP BY user_id), "
        "s AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS h FROM b) "
        "SELECT s.user_id, s.h, hv.v FROM s ASOF JOIN hv "
        "ON s.user_id = hv.user_id AND s.h >= hv.h"
    )


def q_triangles(sf_dir: str):
    """Distributed triangle counting on the derived 400-node graph
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
    sorted-membership probe.  Each triangle counts exactly once, at
    its minimum-rank vertex; the oracle orders by the same
    (degree, id) rank.  Reference-free addition."""
    import ray.data

    from .stages.agg_tree import tree_aggregate, tree_aggregate_to_table
    from .stages.scan import hash_bucket_scan

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
        t2 = pa.table({"node": pa.array(wa[hit], pa.int64()),
                       "tri": pa.array(np.ones(int(hit.sum()), np.int64))})
        g = t2.group_by(["node"]).aggregate([("tri", "sum")])
        return g.rename_columns(["node", "tri"])

    unioned = wedge_ds.union(edge_rows)
    partials = hash_bucket_scan(unioned, ["p", "q"], close,
                                n_rows=n_ev)
    return tree_aggregate(partials, ["node"], [("tri", "sum")])


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


def q_char_jaccard(sf_dir: str):
    """Character-3-gram Jaccard between consecutive documents
    (doc_id, doc_id+1) — the n-gram-set similarity kernel on a linear
    pair domain (the τ-threshold SELF-join over word shingles is
    setsim_pairs; char shingles on this tiny-vocabulary corpus would
    make the quadratic oracle explode).  Each doc's distinct-trigram
    hash blob is emitted toward its two neighbour pairs; one pair-key
    hash shuffle co-locates both sides; the verify is the same
    vectorized sorted-dup kernel the setsim join uses
    (functions/setsim._batch_jaccard), micro-quantized like the
    oracle."""
    import zlib

    from .functions.setsim import _batch_jaccard
    from .stages.scan import hash_bucket_scan

    def blobs(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        pair, role, blob = [], [], []
        for i, txt in enumerate(b["text"].to_pylist()):
            s = txt.lower()
            grams = {s[j:j + 3] for j in range(len(s) - 2)}
            if not grams:
                continue
            hs = np.sort(np.fromiter(
                (((zlib.crc32(g) << 32) | zlib.crc32(g, 0xA5A5A5A5))
                 & 0x7FFFFFFFFFFFFFFF
                 for g in (x.encode() for x in grams)),
                dtype=np.int64, count=len(grams)))
            raw = hs.tobytes()
            pair += [int(ids[i]), int(ids[i]) - 1]
            role += [0, 1]
            blob += [raw, raw]
        return pa.table({"pair": pa.array(np.array(pair, np.int64)),
                         "role": pa.array(np.array(role, np.int64)),
                         "blob": pa.array(blob, pa.binary())})

    def verify(t: pa.Table) -> pa.Table:
        pr = t["pair"].to_numpy(zero_copy_only=False)
        ro = t["role"].to_numpy(zero_copy_only=False)
        bl = t["blob"].to_pylist()
        order = np.lexsort((ro, pr))
        pr, ro = pr[order], ro[order]
        both = np.flatnonzero((pr[:-1] == pr[1:])
                              & (ro[:-1] == 0) & (ro[1:] == 1))
        a_blobs = [bl[order[i]] for i in both]
        b_blobs = [bl[order[i + 1]] for i in both]
        jac = _batch_jaccard(a_blobs, b_blobs)
        return pa.table({
            "doc_a": pa.array(pr[both], pa.int64()),
            "doc_b": pa.array(pr[both] + 1, pa.int64()),
            "jac_micro": pa.array(
                np.floor(jac * 1e6 + 0.5).astype(np.int64), pa.int64())})

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        blobs, batch_format="pyarrow")
    return hash_bucket_scan(ds, ["pair"], verify,
                            n_rows=2 * _nrows(sf_dir, "documents"))


def q_char_jaccard_sql() -> str:
    return (
        "WITH g AS (SELECT DISTINCT doc_id, "
        "substr(lower(text), CAST(i AS INT), 3) AS tok "
        "FROM documents, UNNEST(range(1, length(text) - 1)) t(i)), "
        "sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS doc_a, count(*) AS o FROM g a "
        "JOIN g b ON b.doc_id = a.doc_id + 1 AND b.tok = a.tok "
        "GROUP BY a.doc_id) "
        "SELECT sa.doc_id AS doc_a, sa.doc_id + 1 AS doc_b, "
        "CAST(floor(CAST(COALESCE(o, 0) AS DOUBLE) / "
        "CAST(sa.n + sb.n - COALESCE(o, 0) AS DOUBLE) * 1e6 + 0.5) "
        "AS BIGINT) AS jac_micro "
        "FROM sz sa JOIN sz sb ON sb.doc_id = sa.doc_id + 1 "
        "LEFT JOIN inter ON inter.doc_a = sa.doc_id"
    )


def q_dup_spans(sf_dir: str):
    """Cross-document duplicated substrings: every 20-char window that
    appears verbatim in ≥ 2 distinct documents (the detection pass of
    exact substring dedup à la suffix-array training-data dedup, on a
    fixed window).  Per-doc window extraction + local distinct, then
    ONE hash shuffle on a 64-bit window hash; within a bucket the
    distinct-doc count groups by the actual string, so hash collisions
    cannot merge different spans.  At 100 TB the span strings would
    ship as (hash, sample) pairs instead — the 20-byte payload is kept
    here because the oracle compares strings."""
    import zlib

    from .stages.scan import hash_bucket_scan

    L = 20

    def grams(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        out_g, out_d = [], []
        for i, txt in enumerate(b["text"].to_pylist()):
            if len(txt) < L:
                continue
            seen = {txt[j:j + L] for j in range(len(txt) - L + 1)}
            out_g.extend(seen)
            out_d.extend([int(ids[i])] * len(seen))
        h = np.fromiter(
            (((zlib.crc32(g) << 32) | zlib.crc32(g, 0xA5A5A5A5))
             & 0x7FFFFFFFFFFFFFFF for g in (x.encode() for x in out_g)),
            dtype=np.int64, count=len(out_g))
        return pa.table({"gh": pa.array(h, pa.int64()),
                         "gram": pa.array(out_g, pa.string()),
                         "doc_id": pa.array(np.array(out_d, np.int64),
                                            pa.int64())})

    def per_gram(t: pa.Table) -> pa.Table:
        g = t.group_by(["gram"]).aggregate(
            [("doc_id", "count_distinct"), ("doc_id", "min")])
        g = g.rename_columns(["gram", "n_docs", "min_doc"])
        import pyarrow.compute as pc

        return g.filter(pc.greater_equal(g["n_docs"], 2))

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        grams, batch_format="pyarrow")
    out = hash_bucket_scan(ds, ["gh"], per_gram,
                           n_rows=200 * _nrows(sf_dir, "documents"))
    return out.map_batches(
        lambda b: pa.table({"gram": b["gram"],
                            "n_docs": b["n_docs"].cast(pa.int64()),
                            "min_doc": b["min_doc"]}),
        batch_format="pyarrow")


def q_dup_spans_sql() -> str:
    return (
        "WITH g AS (SELECT DISTINCT doc_id, "
        "substr(text, CAST(i AS INT), 20) AS gram "
        "FROM documents, UNNEST(range(1, length(text) - 18)) t(i)) "
        "SELECT gram, CAST(count(*) AS BIGINT) AS n_docs, "
        "min(doc_id) AS min_doc FROM g GROUP BY gram "
        "HAVING count(*) >= 2"
    )


def q_unpivot(sf_dir: str):
    """UNPIVOT (wide → long reshape): each lineitem row becomes three
    (metric, val) rows — the inverse of the order_pivot query.  Pure
    per-batch reshape, no shuffle; doubles pass through untouched."""

    def melt(b: pa.Table) -> pa.Table:
        parts = []
        for metric, col in (("quantity", "l_quantity"),
                            ("discount", "l_discount"),
                            ("tax", "l_tax")):
            parts.append(pa.table({
                "l_orderkey": b["l_orderkey"],
                "l_linenumber": b["l_linenumber"],
                "metric": pa.array([metric] * len(b), pa.string()),
                "val": b[col].cast(pa.float64())}))
        return pa.concat_tables(parts)

    return _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_linenumber", "l_quantity",
                  "l_discount", "l_tax"]).map_batches(
        melt, batch_format="pyarrow")


def q_unpivot_sql() -> str:
    return (
        "SELECT l_orderkey, l_linenumber, 'quantity' AS metric, "
        "l_quantity AS val FROM lineitem "
        "UNION ALL SELECT l_orderkey, l_linenumber, 'discount', "
        "l_discount FROM lineitem "
        "UNION ALL SELECT l_orderkey, l_linenumber, 'tax', "
        "l_tax FROM lineitem"
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


def q_outlier_flags(sf_dir: str):
    """Robust outlier detection: rows with |v − median| > 3·MAD — the
    median/MAD pair comes from two composed exact rank-selection
    passes (no sort, no materialization beyond the pinned single
    column), then one streaming filter pass.  The subtraction, the
    3·MAD product and the comparison are single pinned double ops
    spelled identically in the oracle, so the surviving row set is
    bit-identical."""
    import pyarrow.compute as pc

    from .stages.quantiles import select_ranks

    ds = _read(sf_dir, "events", ["event_id", "value"])
    n = _nrows(sf_dir, "events")
    r = (n - 1) // 2
    med = float(select_ranks(ds, "value", [r])[r])

    def deviate(b: pa.Table) -> pa.Table:
        x = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({"dev": pa.array(np.abs(x - med))})

    mad = float(select_ranks(
        ds.map_batches(deviate, batch_format="pyarrow"), "dev", [r])[r])
    cut = 3.0 * mad

    def flag(b: pa.Table) -> pa.Table:
        x = b["value"].to_numpy(zero_copy_only=False)
        keep = np.abs(x - med) > cut
        return pa.table({"event_id": b["event_id"].filter(pa.array(keep))})

    return ds.map_batches(flag, batch_format="pyarrow")


def q_outlier_flags_sql() -> str:
    return (
        "WITH s AS (SELECT value AS v, row_number() OVER (ORDER BY value)"
        " - 1 AS r, count(*) OVER () AS n FROM events), "
        "m AS (SELECT v FROM s WHERE r = (n - 1) // 2), "
        "d AS (SELECT abs(value - (SELECT v FROM m)) AS dv FROM events), "
        "t AS (SELECT dv, row_number() OVER (ORDER BY dv) - 1 AS r, "
        "count(*) OVER () AS n FROM d), "
        "mad AS (SELECT dv FROM t WHERE r = (n - 1) // 2) "
        "SELECT event_id FROM events "
        "WHERE abs(value - (SELECT v FROM m)) > 3.0 * (SELECT dv FROM mad)"
    )


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape (shipping priority): BUILDING customers
    semi-filter orders placed before the cutoff (broadcast key set —
    swap for ``bloom_semi_join`` when the segment stops fitting a
    broadcast), the surviving orders copart-join recent lineitems, the
    unbounded per-order revenue aggregates through one hash exchange,
    and the top 10 resolves driver-side from per-bucket partial top-ks.
    Revenue terms are 1e-4-quantized ints, so sums and ordering are
    exact."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from .stages.joins import broadcast_semi_join, copart_hash_join
    from .stages.scan import hash_bucket_scan

    CUT = np.datetime64("1998-06-01T00:00:00", "us").astype(np.int64)

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"])
    keys = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))[
        "c_custkey"].to_numpy(zero_copy_only=False)

    def filt_orders(b: pa.Table) -> pa.Table:
        ts = b["o_orderdate"].cast(pa.int64())
        t = b.filter(pc.less(ts, CUT))
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"],
                         "odate_us": t["o_orderdate"].cast(pa.int64()),
                         "o_orderpriority": t["o_orderpriority"]})

    orders = broadcast_semi_join(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate",
                                 "o_orderpriority"]).map_batches(
            filt_orders, batch_format="pyarrow"),
        keys, "o_custkey").map_batches(
        lambda b: b.drop_columns(["o_custkey"]), batch_format="pyarrow")

    def filt_line(b: pa.Table) -> pa.Table:
        ts = b["l_shipdate"].cast(pa.int64())
        t = b.filter(pc.greater(ts, CUT))
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 1e4 + 0.5).astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev_q4": pa.array(rev, pa.int64())})

    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_shipdate", "l_extendedprice",
                  "l_discount"]).map_batches(filt_line,
                                             batch_format="pyarrow")

    j = copart_hash_join(
        orders, line, "o_orderkey", "l_orderkey",
        n_rows=_nrows(sf_dir, "orders") + _nrows(sf_dir, "lineitem"),
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("odate_us", pa.int64()),
                               ("o_orderpriority", pa.string())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("rev_q4", pa.int64())]))

    def agg(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_orderkey", "odate_us",
                        "o_orderpriority"]).aggregate([("rev_q4", "sum")])
        g = g.rename_columns(["o_orderkey", "odate_us",
                              "o_orderpriority", "rev_q4"])
        # per-bucket partial top-10 (final merge is driver-side and
        # bounded by 10 × buckets)
        idx = np.lexsort((g["o_orderkey"].to_numpy(zero_copy_only=False),
                          -g["rev_q4"].to_numpy(zero_copy_only=False)))
        return g.take(pa.array(idx[:10], pa.int64()))

    partials = hash_bucket_scan(
        j, ["o_orderkey"], agg,
        n_rows=_nrows(sf_dir, "lineitem")).to_pandas()
    top = partials.sort_values(["rev_q4", "o_orderkey"],
                               ascending=[False, True]).head(10)
    return top.reset_index(drop=True)


def q_shipping_priority_sql() -> str:
    return (
        "SELECT l_orderkey AS o_orderkey, epoch_us(o_orderdate) AS odate_us, "
        "o_orderpriority, "
        "CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1e4 "
        "+ 0.5) AS BIGINT)) AS BIGINT) AS rev_q4 "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "AND o_orderdate < TIMESTAMP '1998-06-01' "
        "AND l_shipdate > TIMESTAMP '1998-06-01' "
        "GROUP BY 1, 2, 3 ORDER BY rev_q4 DESC, l_orderkey LIMIT 10"
    )


def q_cooccur(sf_dir: str):
    """Event-type co-occurrence supports (association mining: for each
    unordered type pair, how many users performed both).  ONE user-key
    hash exchange; inside a bucket the distinct (user, type) pairs
    fall out of a lexsort + boundary mask and each user's pair
    expansion is the grouped-arange arithmetic (no per-user loop);
    the bounded (type_a, type_b) supports ride the combiner tree.
    Exact ints — bit-match vs the distinct self-join oracle."""
    from .stages.agg_tree import tree_aggregate
    from .stages.scan import hash_bucket_scan

    def pairs(tb: pa.Table) -> pa.Table:
        u = tb["user_id"].to_numpy(zero_copy_only=False)
        t = tb["event_type"].to_numpy(zero_copy_only=False).astype("U")
        order = np.lexsort((t, u))
        u, t = u[order], t[order]
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (t[1:] != t[:-1])
        u, t = u[keep], t[keep]                    # distinct (user, type)
        new_u = np.ones(len(u), dtype=bool)
        new_u[1:] = u[1:] != u[:-1]
        sizes = np.diff(np.append(np.flatnonzero(new_u), len(u)))
        # (i, j) with j after i inside each user segment (types sorted
        # asc, so type_a < type_b by construction)
        loc = np.arange(len(u), dtype=np.int64) - np.repeat(
            np.cumsum(sizes) - sizes, sizes)
        rep = np.repeat(sizes, sizes) - 1 - loc
        a_idx = np.repeat(np.arange(len(u), dtype=np.int64), rep)
        ar = np.arange(int(rep.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(rep) - rep, rep)
        b_idx = a_idx + ar + 1
        t2 = pa.table({"type_a": pa.array(t[a_idx]),
                       "type_b": pa.array(t[b_idx]),
                       "n_users": pa.array(
                           np.ones(len(a_idx), np.int64), pa.int64())})
        g = t2.group_by(["type_a", "type_b"]).aggregate([("n_users", "sum")])
        return g.rename_columns(["type_a", "type_b", "n_users"])

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    partials = hash_bucket_scan(ds, ["user_id"], pairs,
                                n_rows=_nrows(sf_dir, "events"))
    return tree_aggregate(partials, ["type_a", "type_b"],
                          [("n_users", "sum")])


def q_cooccur_sql() -> str:
    return (
        "WITH d AS (SELECT DISTINCT user_id, event_type FROM events) "
        "SELECT a.event_type AS type_a, b.event_type AS type_b, "
        "CAST(count(*) AS BIGINT) AS n_users "
        "FROM d a JOIN d b ON a.user_id = b.user_id "
        "AND b.event_type > a.event_type GROUP BY 1, 2"
    )


def q_minmax_norm(sf_dir: str):
    """Per-group min-max feature normalization ((v - min)/(max - min)
    per event_type) — the feature-scaling prep op.  Bounded group
    min/max ride the combiner tree once and broadcast via ``ray.put``;
    the normalization is a pure per-row map.  The two subtractions and
    one division are single pinned double ops, spelled identically in
    the window-function oracle, so doubles hash-match.  (Degenerate
    min==max groups would diverge inf-vs-inf only in sign corner
    cases; the fixture's per-type spread rules it out.)"""
    import ray

    from .functions.near_dup import _obj_cached
    from .stages.agg_tree import tree_aggregate_to_table

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": b["event_type"],
                         "vmin": b["value"], "vmax": b["value"]})

    stats = tree_aggregate_to_table(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type"], [("vmin", "min"), ("vmax", "max")])
    lookup = {t: (mn, mx) for t, mn, mx in
              zip(stats["event_type"].to_pylist(),
                  stats["vmin"].to_numpy(zero_copy_only=False),
                  stats["vmax"].to_numpy(zero_copy_only=False))}
    ref = ray.put(lookup)

    def norm(b: pa.Table) -> pa.Table:
        lk = _obj_cached(ref)
        types = b["event_type"].to_pylist()
        v = b["value"].to_numpy(zero_copy_only=False)
        mn = np.array([lk[t][0] for t in types], np.float64)
        mx = np.array([lk[t][1] for t in types], np.float64)
        return pa.table({"event_id": b["event_id"],
                         "norm": pa.array((v - mn) / (mx - mn),
                                          pa.float64())})

    return ds.map_batches(norm, batch_format="pyarrow")


def q_minmax_norm_sql() -> str:
    return (
        "SELECT event_id, (value - min(value) OVER w) / "
        "(max(value) OVER w - min(value) OVER w) AS norm "
        "FROM events WINDOW w AS (PARTITION BY event_type)"
    )


def q_winsorize(sf_dir: str):
    """Winsorization (outlier clamp to the exact p1/p99 order
    statistics) — the numeric-feature cleanup prep op.  The two global
    clamp bounds come from the sampled-splitter rank selection (NO
    global sort — stages/quantiles.py); the clamp itself is
    min/max-element-wise, pure value pass-through (no float
    arithmetic), so the hash compare vs the ORDER-BY-rank oracle is
    trivially bit-exact."""
    import pyarrow.compute as pc

    from .stages.quantiles import select_ranks

    ds = _read(sf_dir, "events", ["event_id", "value"])
    n = _nrows(sf_dir, "events")
    r01 = int(np.floor(0.01 * (n - 1)))
    r99 = int(np.floor(0.99 * (n - 1)))
    vals = select_ranks(ds, "value", [r01, r99])
    lo, hi = float(vals[r01]), float(vals[r99])

    def clamp(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b["event_id"],
            "vclip": pc.min_element_wise(
                pc.max_element_wise(b["value"], pa.scalar(lo)),
                pa.scalar(hi))})

    return ds.map_batches(clamp, batch_format="pyarrow")


def q_winsorize_sql() -> str:
    return (
        "WITH s AS (SELECT value AS v, "
        "row_number() OVER (ORDER BY value) - 1 AS r, "
        "count(*) OVER () AS n FROM events), "
        "b AS (SELECT CAST(floor(0.01 * (n - 1)) AS BIGINT) AS r01, "
        "CAST(floor(0.99 * (n - 1)) AS BIGINT) AS r99 "
        "FROM (SELECT DISTINCT n FROM s)), "
        "q AS (SELECT (SELECT v FROM s, b WHERE s.r = b.r01) AS lo, "
        "(SELECT v FROM s, b WHERE s.r = b.r99) AS hi) "
        "SELECT event_id, least(greatest(value, (SELECT lo FROM q)), "
        "(SELECT hi FROM q)) AS vclip FROM events"
    )


def q_group_percentiles(sf_dir: str):
    """Per-group PERCENTILE_CONT (p25/p50/p90 of value per event_type)
    — the grouped counterpart of the global rank-selection quantiles.
    One coarse keyed scan sorts each bucket by (type, value); the
    bracketing order statistics per key segment are start-offset
    arithmetic and the interpolation is the pinned float expression
    ``v_lo + (h - floor(h)) * (v_hi - v_lo)`` with ``h = q * (n - 1)``
    spelled identically in the oracle, so doubles hash-match.  Group
    count is unbounded (buckets auto-scale); each group's rows
    co-locate by key hash."""
    from .stages.scan import keyed_scan

    QS = (0.25, 0.5, 0.9)

    def hash_type(k: np.ndarray) -> np.ndarray:
        import zlib

        uniq, inv = np.unique(k.astype("U"), return_inverse=True)
        codes = np.array([zlib.crc32(u.encode()) for u in uniq], np.int64)
        return codes[inv]

    def scan(d: pd.DataFrame) -> pd.DataFrame:
        t = d["event_type"].to_numpy()
        v = d["value"].to_numpy()
        new = np.ones(len(d), dtype=bool)
        new[1:] = t[1:] != t[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(d)))
        out = []
        for q in QS:
            h = q * (sizes - 1).astype(np.float64)
            lo = np.floor(h).astype(np.int64)
            hi = np.minimum(lo + 1, sizes - 1)
            v0, v1 = v[starts + lo], v[starts + hi]
            out.append(pd.DataFrame({
                "event_type": t[starts],
                "q": np.full(len(starts), q, np.float64),
                "value": v0 + (h - np.floor(h)) * (v1 - v0)}))
        return pd.concat(out, ignore_index=True)

    ds = _read(sf_dir, "events", ["event_type", "value"])
    return keyed_scan(ds, key="event_type", order=["value"], fn=scan,
                      hash_key=hash_type, n_rows=_nrows(sf_dir, "events"))


def q_group_percentiles_sql() -> str:
    return (
        "WITH s AS (SELECT event_type, value AS v, "
        "row_number() OVER (PARTITION BY event_type ORDER BY value) - 1 "
        "AS r, count(*) OVER (PARTITION BY event_type) AS n FROM events), "
        "t AS (SELECT DISTINCT s.event_type, CAST(b.q AS DOUBLE) AS q, "
        "CAST(b.q AS DOUBLE) * (s.n - 1) AS h, s.n FROM s "
        "CROSS JOIN (VALUES (0.25), (0.5), (0.9)) b(q)) "
        "SELECT t.event_type, t.q, "
        "lo.v + (t.h - floor(t.h)) * (hi.v - lo.v) AS value "
        "FROM t JOIN s lo ON lo.event_type = t.event_type AND "
        "lo.r = CAST(floor(t.h) AS BIGINT) "
        "JOIN s hi ON hi.event_type = t.event_type AND "
        "hi.r = CAST(least(floor(t.h) + 1, t.n - 1) AS BIGINT)"
    )


def q_transitions(sf_dir: str):
    """Markov transition counts over each user's event-type sequence
    (the sequence-mining primitive: session flows, curriculum stats).
    ONE coarse keyed scan co-partitions users and sorts each bucket by
    (user, ts, event_id); the transition pairs fall out of two shifted
    array views (valid where the user doesn't change), and the bounded
    (prev, next) count rides the combiner tree — no second all-to-all.
    Exact ints, so the hash compare vs the LAG-window oracle is
    bit-for-bit."""
    from .stages.agg_tree import tree_aggregate
    from .stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"],
                         "ts_us": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "event_type": b["event_type"]})

    def scan(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        t = d["event_type"].to_numpy()
        same = u[1:] == u[:-1]
        prev, nxt = t[:-1][same], t[1:][same]
        if not len(prev):
            return pd.DataFrame({"prev_type": pd.Series([], dtype=str),
                                 "next_type": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64)})
        # factorize the two columns jointly, count numeric pair codes
        both = np.concatenate([prev, nxt]).astype("U")
        uniq_t, inv = np.unique(both, return_inverse=True)
        code = inv[:len(prev)] * np.int64(len(uniq_t)) + inv[len(prev):]
        ucode, counts = np.unique(code, return_counts=True)
        return pd.DataFrame({"prev_type": uniq_t[ucode // len(uniq_t)],
                             "next_type": uniq_t[ucode % len(uniq_t)],
                             "n": counts.astype(np.int64)})

    ds = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "event_type"]).map_batches(
        prep, batch_format="pyarrow")
    partials = keyed_scan(ds, key="user_id", order=["ts_us", "event_id"],
                          fn=scan, n_rows=_nrows(sf_dir, "events"))
    return tree_aggregate(partials, ["prev_type", "next_type"],
                          [("n", "sum")])


def q_transitions_sql() -> str:
    return (
        "WITH s AS (SELECT user_id, event_type, lag(event_type) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS prev "
        "FROM events) "
        "SELECT prev AS prev_type, event_type AS next_type, "
        "CAST(count(*) AS BIGINT) AS n FROM s "
        "WHERE prev IS NOT NULL GROUP BY prev, event_type"
    )


def q_degree_hist(sf_dir: str):
    """Degree distribution of the derived 400-node graph (the
    q_triangles edge set): distinct id-oriented edges via one pair-key
    hash exchange, per-node degrees and the degree histogram both on
    the combiner tree (node space and degree range are bounded by the
    400-node domain).  Exact ints throughout."""
    from .stages.agg_tree import tree_aggregate, tree_aggregate_to_table
    from .stages.scan import hash_bucket_scan

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


def q_local_volume(sf_dir: str):
    """TPC-H Q5 shape (local supplier volume): revenue from 1996
    ASIA-region orders where the supplier and the ordering customer
    share a nation.  Both dimension chains (customer→nation and
    supplier→nation→region) broadcast once; the only exchange is the
    large×large lineitem⋈orders copart join; the 25-key nation rollup
    rides the bounded combiner tree.  Revenue terms are 1e-4-quantized
    ints so the distributed sum is exact."""
    import pyarrow.parquet as pq

    from .stages.agg_tree import tree_aggregate_to_table
    from .stages.joins import broadcast_hash_join, copart_hash_join

    Y0 = np.datetime64("1996-01-01T00:00:00", "us").astype(np.int64)
    Y1 = np.datetime64("1997-01-01T00:00:00", "us").astype(np.int64)

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    region = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    asia_keys = region.loc[region["r_name"] == "ASIA", "r_regionkey"]
    nat = nation[nation["n_regionkey"].isin(set(asia_keys))]

    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp[supp["s_nationkey"].isin(set(nat["n_nationkey"]))]
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"]).to_pandas()

    def filt_orders(b: pa.Table) -> pa.Table:
        ts = b["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = b.filter(pa.array((ts >= Y0) & (ts < Y1)))
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"]})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        filt_orders, batch_format="pyarrow")
    orders = broadcast_hash_join(orders, cust, on="o_custkey",
                                 small_on="c_custkey").map_batches(
        lambda d: d[["o_orderkey", "c_nationkey"]], batch_format="pandas")

    def line_rev(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 1e4 + 0.5).astype(np.int64)
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"],
                         "rev_q4": pa.array(rev, pa.int64())})

    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
                 ).map_batches(line_rev, batch_format="pyarrow")
    line = broadcast_hash_join(line, supp, on="l_suppkey",
                               small_on="s_suppkey").map_batches(
        lambda d: d[["l_orderkey", "s_nationkey", "rev_q4"]],
        batch_format="pandas")

    j = copart_hash_join(
        orders, line, "o_orderkey", "l_orderkey",
        n_rows=_nrows(sf_dir, "orders") + _nrows(sf_dir, "lineitem"),
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("c_nationkey", pa.int32())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("s_nationkey", pa.int32()),
                                ("rev_q4", pa.int64())]))

    def local_only(b: pa.Table) -> pa.Table:
        cn = b["c_nationkey"].to_numpy(zero_copy_only=False)
        sn = b["s_nationkey"].to_numpy(zero_copy_only=False)
        t = b.filter(pa.array(cn == sn))
        return pa.table({"s_nationkey": t["s_nationkey"].cast(pa.int64()),
                         "rev_q4": t["rev_q4"]})

    per_nation = tree_aggregate_to_table(
        j.map_batches(local_only, batch_format="pyarrow"),
        ["s_nationkey"], [("rev_q4", "sum")]).to_pandas()
    names = nat[["n_nationkey", "n_name"]].copy()
    names["n_nationkey"] = names["n_nationkey"].astype(np.int64)
    out = per_nation.merge(names, left_on="s_nationkey",
                           right_on="n_nationkey")
    return out[["n_name", "rev_q4"]].reset_index(drop=True)


def q_local_volume_sql() -> str:
    return (
        "SELECT n_name, CAST(sum(CAST(floor(l_extendedprice * "
        "(1.0 - l_discount) * 1e4 + 0.5) AS BIGINT)) AS BIGINT) AS rev_q4 "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey "
        "AND o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1997-01-01' "
        "GROUP BY n_name"
    )


def q_big_orders(sf_dir: str):
    """TPC-H Q18 shape (large-volume orders): per-order quantity sums
    through ONE orderkey hash exchange, the rare winners (sum > 250)
    come back as a broadcast set, and orders + customer attach via
    broadcast joins — the fact table is never shuffled twice.
    Quantities are centi-unit ints so the having-filter is exact."""
    import pyarrow.parquet as pq

    from .stages.joins import broadcast_hash_join
    from .stages.scan import hash_bucket_scan

    THRESH_C2 = 250 * 100

    def quantize(b: pa.Table) -> pa.Table:
        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "qty_c2": pa.array(
                             np.floor(q * 100 + 0.5).astype(np.int64),
                             pa.int64())})

    def per_order(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_orderkey"]).aggregate([("qty_c2", "sum")])
        g = g.rename_columns(["l_orderkey", "qty_c2"])
        # keys land wholly in one bucket, so these sums are FINAL —
        # the having-filter applies right here and only winners ship
        return g.filter(pa.compute.greater(g["qty_c2"], THRESH_C2))

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]
                 ).map_batches(quantize, batch_format="pyarrow")
    winners = hash_bucket_scan(
        line, ["l_orderkey"], per_order,
        n_rows=_nrows(sf_dir, "lineitem")).to_pandas()

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_name"]).to_pandas()

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "o_custkey": b["o_custkey"],
                         "odate_us": b["o_orderdate"].cast(pa.int64()),
                         "o_totalprice": b["o_totalprice"]})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
                   ).map_batches(fmt, batch_format="pyarrow")
    j = broadcast_hash_join(orders, winners, on="o_orderkey",
                            small_on="l_orderkey").map_batches(
        lambda d: d[["o_orderkey", "o_custkey", "odate_us", "o_totalprice",
                     "qty_c2"]], batch_format="pandas")
    j = broadcast_hash_join(j, cust, on="o_custkey", small_on="c_custkey")
    return j.map_batches(
        lambda d: d[["c_name", "o_custkey", "o_orderkey", "odate_us",
                     "o_totalprice", "qty_c2"]], batch_format="pandas")


def q_big_orders_sql() -> str:
    return (
        "SELECT c_name, o_custkey, o_orderkey, "
        "epoch_us(o_orderdate) AS odate_us, o_totalprice, "
        "CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) "
        "AS qty_c2 "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON o_orderkey = l_orderkey "
        "GROUP BY 1, 2, 3, 4, 5 "
        "HAVING sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) > 25000"
    )


def q_returned_revenue(sf_dir: str):
    """TPC-H Q10 shape (returned-item revenue): returned lineitems
    copart-join orders for the customer key, per-customer revenue sums
    through one custkey hash exchange with per-bucket partial top-20s
    (bucket-local sums are final, so each bucket ships ≤ 20 rows), the
    driver merges the bounded partials, and the 20 winners pick up
    name/balance from the broadcast customer table."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from .stages.joins import copart_hash_join
    from .stages.scan import hash_bucket_scan

    def filt_line(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["l_returnflag"], "R"))
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 1e4 + 0.5).astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev_q4": pa.array(rev, pa.int64())})

    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_returnflag", "l_extendedprice",
                  "l_discount"]).map_batches(filt_line,
                                             batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    j = copart_hash_join(
        orders, line, "o_orderkey", "l_orderkey",
        n_rows=_nrows(sf_dir, "orders") + _nrows(sf_dir, "lineitem"),
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("o_custkey", pa.int64())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("rev_q4", pa.int64())]))
    j = j.map_batches(lambda b: b.select(["o_custkey", "rev_q4"]),
                      batch_format="pyarrow")

    def agg(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_custkey"]).aggregate([("rev_q4", "sum")])
        g = g.rename_columns(["c_custkey", "rev_q4"])
        idx = np.lexsort((g["c_custkey"].to_numpy(zero_copy_only=False),
                          -g["rev_q4"].to_numpy(zero_copy_only=False)))
        return g.take(pa.array(idx[:20], pa.int64()))

    partials = hash_bucket_scan(
        j, ["o_custkey"], agg,
        n_rows=_nrows(sf_dir, "lineitem")).to_pandas()
    top = partials.sort_values(["rev_q4", "c_custkey"],
                               ascending=[False, True]).head(20)
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_name", "c_acctbal"]
                         ).to_pandas()
    out = top.merge(cust, on="c_custkey")
    return out[["c_custkey", "c_name", "c_acctbal",
                "rev_q4"]].reset_index(drop=True)


def q_returned_revenue_sql() -> str:
    return (
        "WITH r AS (SELECT o_custkey AS c_custkey, "
        "CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1e4 "
        "+ 0.5) AS BIGINT)) AS BIGINT) AS rev_q4 "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE l_returnflag = 'R' GROUP BY 1 "
        "ORDER BY rev_q4 DESC, c_custkey LIMIT 20) "
        "SELECT r.c_custkey, c_name, c_acctbal, rev_q4 "
        "FROM r JOIN customer ON r.c_custkey = customer.c_custkey"
    )


def _skyline_mask(price: np.ndarray, size: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the 2-D skyline (price minimized, size
    maximized) for rows ALREADY sorted by (price asc, size desc).
    Strict dominance: a dominates b iff a.price <= b.price and
    a.size >= b.size with at least one strict; equal (price, size)
    duplicates never dominate each other, so all of them survive.
    One vectorized pass: a row survives iff it carries its price
    group's max size AND that max strictly exceeds every smaller
    price's max."""
    n = len(price)
    if n == 0:
        return np.zeros(0, dtype=bool)
    new_grp = np.ones(n, dtype=bool)
    new_grp[1:] = price[1:] != price[:-1]
    grp = np.cumsum(new_grp) - 1
    per_max = size[new_grp]  # sorted size-desc within a price group
    prev_max = np.concatenate(
        ([np.iinfo(np.int64).min],
         np.maximum.accumulate(per_max)[:-1]))[grp]
    return (size == per_max[grp]) & (size > prev_max)


def q_pareto_front(sf_dir: str):
    """Distributed 2-D skyline (Pareto front) over parts: rows not
    dominated on (p_retailprice minimized, p_size maximized).
    Skylines compose — skyline(∪ skylines) = skyline(all) — so each
    block reduces to its local skyline (expected O(log n) rows of n)
    and the bounded union resolves in one final pass; the input never
    shuffles."""

    def local(b: pa.Table) -> pa.Table:
        idx = np.lexsort((-b["p_size"].to_numpy(zero_copy_only=False),
                          b["p_retailprice"].to_numpy(zero_copy_only=False)))
        t = b.take(pa.array(idx, pa.int64()))
        keep = _skyline_mask(
            t["p_retailprice"].to_numpy(zero_copy_only=False),
            t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64))
        return t.filter(pa.array(keep))

    ds = _read(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"])
    return (ds.map_batches(local, batch_format="pyarrow")
              .repartition(1)
              .map_batches(local, batch_format="pyarrow", batch_size=None))


def q_pareto_front_sql() -> str:
    return (
        "SELECT p_partkey, p_retailprice, p_size FROM part a "
        "WHERE NOT EXISTS (SELECT 1 FROM part b "
        "WHERE b.p_retailprice <= a.p_retailprice "
        "AND b.p_size >= a.p_size "
        "AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))"
    )


def q_regex_extract(sf_dir: str):
    """First long-word extraction per document via the compiled
    Arrow RE2 kernel (``pc.extract_regex`` — vectorized, zero-copy
    from the object store; no Python loop).  Non-matching docs yield
    '' on both sides, avoiding nullable-string schema drift."""
    import pyarrow.compute as pc

    def ex(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["text"], r"(?P<w>[a-z]{6,})")
        w = pc.fill_null(pc.struct_field(m, "w"), "")
        return pa.table({"doc_id": b["doc_id"], "first_long": w})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        ex, batch_format="pyarrow")


def q_regex_extract_sql() -> str:
    return ("SELECT doc_id, regexp_extract(text, '[a-z]{6,}') "
            "AS first_long FROM documents")


def _iv_events(sf_dir: str, parity: int):
    """Derived interval stream: events with ``event_id % 2 == parity``
    become [ts, ts + dur] where dur is a deterministic 0–1h hash of
    the id (multiplicative-hash derivation, written identically in the
    SQL oracle)."""

    def mk(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        t = b.filter(pa.array(eid % 2 == parity))
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        s = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        dur = ((eid * 2654435761 + 12345) % 4294967296) % 3600 * 1_000_000
        return pa.table({"event_id": t["event_id"], "user_id": t["user_id"],
                         "s_us": pa.array(s, pa.int64()),
                         "e_us": pa.array(s + dur, pa.int64())})

    return _read(sf_dir, "events", ["event_id", "user_id", "ts"]
                 ).map_batches(mk, batch_format="pyarrow")


_IV_SQL = (
    "SELECT event_id, user_id, epoch_us(ts) AS s_us, epoch_us(ts) + "
    "(((event_id * 2654435761 + 12345) % 4294967296) % 3600) * 1000000 "
    "AS e_us FROM events WHERE event_id % 2 = {parity}")


def q_interval_overlap(sf_dir: str):
    """Interval×interval overlap join (stages/joins.py
    interval_overlap_join): every same-user (even, odd) event pair
    whose derived [ts, ts+dur] intervals overlap.  One user-key hash
    exchange; per bucket the odd side sorts once and every even
    interval finds its candidates with two global searchsorted calls
    under the 1h duration bound — no per-user Python, no all-pairs."""
    from .stages.joins import interval_overlap_join

    return interval_overlap_join(
        _iv_events(sf_dir, 0), _iv_events(sf_dir, 1), key="user_id",
        left_id="event_id", left_start="s_us", left_end="e_us",
        right_id="event_id", right_start="s_us", right_end="e_us",
        max_right_dur=3600 * 1_000_000, out_cols=("a_id", "b_id"),
        n_rows=_nrows(sf_dir, "events"))


def q_interval_overlap_sql() -> str:
    a = _IV_SQL.format(parity=0)
    b = _IV_SQL.format(parity=1)
    return (
        f"WITH a AS ({a}), b AS ({b}) "
        "SELECT a.event_id AS a_id, b.event_id AS b_id FROM a JOIN b "
        "ON a.user_id = b.user_id AND a.s_us <= b.e_us "
        "AND b.s_us <= a.e_us"
    )


def q_asof_forward(sf_dir: str):
    """FORWARD as-of join (the mirror of q_asof_join's backward
    direction): each even event matches the EARLIEST odd event of the
    same user at-or-after its timestamp (ties → min event_id; no match
    → -1 sentinels, avoiding nullable drift).  Same coarse user-hash
    exchange as the interval join; per bucket the odd side sorts once
    by a (key-rank, ts, id) composite and ONE global searchsorted
    answers every even row."""
    from .stages.scan import hash_bucket_scan

    def tag(parity: int):
        def f(b: pa.Table) -> pa.Table:
            eid = b["event_id"].to_numpy(zero_copy_only=False)
            t = b.filter(pa.array(eid % 2 == parity))
            return pa.table({
                "event_id": t["event_id"], "user_id": t["user_id"],
                "t_us": t["ts"].cast(pa.int64()),
                "_side": pa.array(np.full(len(t), parity, np.int8),
                                  pa.int8())})
        return f

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    unioned = (ev.map_batches(tag(0), batch_format="pyarrow")
               .union(ev.map_batches(tag(1), batch_format="pyarrow")))

    def nxt(t: pa.Table) -> pa.Table:
        side = t["_side"].to_numpy(zero_copy_only=False)
        k = t["user_id"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        ts = t["t_us"].to_numpy(zero_copy_only=False)
        a = side == 0
        ka, ia, ta = k[a], eid[a], ts[a]
        if not len(ka):
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "next_id": pa.array([], pa.int64()),
                             "next_ts": pa.array([], pa.int64())})
        kb, ib, tb = k[~a], eid[~a], ts[~a]
        nid = np.full(len(ka), -1, np.int64)
        nts = np.full(len(ka), -1, np.int64)
        if len(kb):
            base = int(min(ta.min(), tb.min()))
            span = int(max(ta.max(), tb.max())) - base + 2
            uk = np.unique(np.concatenate([ka, kb]))
            if len(uk) * span >= 2 ** 63:
                raise ValueError("key-rank × time-span composite "
                                 "overflows int64")
            bkey = (np.searchsorted(uk, kb).astype(np.int64) * span
                    + (tb - base))
            order = np.lexsort((ib, bkey))  # ties → min event_id first
            bkey, ib, tb, kb = bkey[order], ib[order], tb[order], kb[order]
            pos = np.searchsorted(
                bkey, np.searchsorted(uk, ka).astype(np.int64) * span
                + (ta - base), side="left")
            ok = pos < len(bkey)
            pos_c = np.minimum(pos, len(bkey) - 1)
            ok &= kb[pos_c] == ka  # next entry must stay in our key band
            nid[ok] = ib[pos_c[ok]]
            nts[ok] = tb[pos_c[ok]]
        return pa.table({"event_id": pa.array(ia, pa.int64()),
                         "next_id": pa.array(nid, pa.int64()),
                         "next_ts": pa.array(nts, pa.int64())})

    return hash_bucket_scan(unioned, ["user_id"], nxt,
                            n_rows=_nrows(sf_dir, "events"))


def q_asof_forward_sql() -> str:
    return (
        "WITH a AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events "
        "WHERE event_id % 2 = 0), "
        "b AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events "
        "WHERE event_id % 2 = 1), "
        "n AS (SELECT a.event_id, a.user_id, a.t, min(b.t) AS nt FROM a "
        "LEFT JOIN b ON b.user_id = a.user_id AND b.t >= a.t "
        "GROUP BY 1, 2, 3) "
        "SELECT n.event_id, COALESCE(min(b.event_id), -1) AS next_id, "
        "COALESCE(n.nt, -1) AS next_ts FROM n LEFT JOIN b "
        "ON b.user_id = n.user_id AND b.t = n.nt GROUP BY 1, 3"
    )


def q_edit_join(sf_dir: str):
    """Edit-distance-1 similarity self-join over customer names
    (functions/edit_join.py — FastSS symmetric-delete candidates from
    polynomial prefix-hashes, exact vectorized verify).  Hash-verified
    against DuckDB's levenshtein."""
    from .functions.edit_join import edit_similarity_join

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


def q_connected_components(sf_dir: str):
    """Standalone hash-verified connected components (stages/cc.py
    Hash-to-Min) over a derived forest-with-merges graph on event ids:
    every non-multiple-of-64 node links to a hashed earlier node in its
    64-block, and a hashed quarter of block bases link to the previous
    base — components are bounded chains of blocks, so the DuckDB
    recursive-CTE walk oracle stays linear.  Output: (node, comp) with
    comp = min node id in the component, for every edge endpoint."""
    from .stages.cc import connected_components
    from .stages.scan import hash_bucket_scan

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


_SCAN_PHRASES = ("fast table", "key agg", "sort merge", "window spark",
                 "data column")


def q_phrase_match(sf_dir: str):
    """Broadcast multi-phrase containment scan (the PII / contamination
    phrase-list shape): every (doc, phrase) hit for a small phrase
    list.  The list ships once; each batch runs one compiled Arrow
    ``match_substring`` kernel per phrase — docs never shuffle, output
    is hit-sized."""
    import pyarrow.compute as pc

    def scan(b: pa.Table) -> pa.Table:
        doc_ids, phrases = [], []
        for ph in _SCAN_PHRASES:
            hit = b.filter(pc.match_substring(b["text"], ph))
            doc_ids.append(hit["doc_id"].to_numpy(zero_copy_only=False))
            phrases.append(np.full(len(hit), ph, dtype=object))
        return pa.table({
            "doc_id": pa.array(np.concatenate(doc_ids), pa.int64()),
            "phrase": pa.array(np.concatenate(phrases).astype("U"))})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        scan, batch_format="pyarrow")


def q_phrase_match_sql() -> str:
    vals = ", ".join(f"('{p}')" for p in _SCAN_PHRASES)
    return (
        f"SELECT doc_id, phrase FROM documents, "
        f"(VALUES {vals}) AS p(phrase) WHERE contains(text, phrase)"
    )


def q_min_cost_supp(sf_dir: str):
    """Argmin join (TPC-H Q2 shape): for each part, the cheapest
    supplier it has shipped through (min s_acctbal, ties → min
    suppkey).  The supplier dimension broadcasts once; per-part argmin
    reduces inside each batch first (distinct part-supplier pairs →
    batch-local argmin) and finishes through one bounded hash
    exchange, so the exchange carries ≤ one row per (part, block)."""
    import pyarrow.parquet as pq

    from .stages.joins import broadcast_hash_join
    from .stages.scan import hash_bucket_scan

    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_acctbal"]).to_pandas()

    def local_min(d: pd.DataFrame) -> pd.DataFrame:
        d = d.sort_values(["l_partkey", "s_acctbal", "l_suppkey"],
                          kind="mergesort")
        first = ~d["l_partkey"].duplicated().to_numpy()
        out = d.loc[first, ["l_partkey", "l_suppkey", "s_acctbal"]]
        return out.rename(columns={"l_suppkey": "s_suppkey"})

    line = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    j = broadcast_hash_join(line, supp, on="l_suppkey",
                            small_on="s_suppkey").map_batches(
        local_min, batch_format="pandas")

    def final_min(t: pa.Table) -> pa.Table:
        idx = np.lexsort((
            t["s_suppkey"].to_numpy(zero_copy_only=False),
            t["s_acctbal"].to_numpy(zero_copy_only=False),
            t["l_partkey"].to_numpy(zero_copy_only=False)))
        s = t.take(pa.array(idx, pa.int64()))
        pk = s["l_partkey"].to_numpy(zero_copy_only=False)
        first = np.ones(len(pk), dtype=bool)
        first[1:] = pk[1:] != pk[:-1]
        out = s.filter(pa.array(first))
        return out.rename_columns(["p_partkey", "s_suppkey", "s_acctbal"])

    return hash_bucket_scan(j, ["l_partkey"], final_min,
                            n_rows=_nrows(sf_dir, "lineitem"))


def q_min_cost_supp_sql() -> str:
    return (
        "WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem), "
        "j AS (SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey, "
        "s_acctbal, row_number() OVER (PARTITION BY l_partkey "
        "ORDER BY s_acctbal, l_suppkey) AS rn "
        "FROM ps JOIN supplier ON l_suppkey = s_suppkey) "
        "SELECT p_partkey, s_suppkey, s_acctbal FROM j WHERE rn = 1"
    )


def q_rows_frame_sum(sf_dir: str):
    """ROWS-frame windowed sum (SUM OVER ROWS BETWEEN 2 PRECEDING AND
    CURRENT ROW per user, ts order): the keyed_scan coarse-bucket
    shape; inside a bucket one cumsum minus its 3-shifted self, with
    per-user segment boundaries handled by index arithmetic (no
    per-user loop).  Values quantized to 1e-6 ints so the windowed sum
    is exact."""
    from .stages.scan import keyed_scan

    def quant(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({"event_id": b["event_id"], "user_id": b["user_id"],
                         "t_us": b["ts"].cast(pa.int64()),
                         "v6": pa.array(
                             np.floor(v * 1e6 + 0.5).astype(np.int64),
                             pa.int64())})

    def frame(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        v = d["v6"].to_numpy()
        cs = np.cumsum(v)
        n = len(d)
        # frame start = max(row_index - 2, segment_start)
        seg_start = np.arange(n)[
            np.r_[True, u[1:] != u[:-1]]]  # start index per segment
        seg_id = np.cumsum(np.r_[True, u[1:] != u[:-1]]) - 1
        start = np.maximum(np.arange(n) - 2, seg_start[seg_id])
        before = np.where(start > 0, cs[np.maximum(start - 1, 0)], 0)
        return pd.DataFrame({"event_id": d["event_id"].to_numpy(),
                             "frame_sum": cs - before})

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]
               ).map_batches(quant, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t_us", "event_id"],
                      fn=frame, n_rows=_nrows(sf_dir, "events"))


def q_rows_frame_sum_sql() -> str:
    return (
        "SELECT event_id, sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS frame_sum "
        "FROM events"
    )


def q_unigram_logprob(sf_dir: str):
    """Unigram language-model scoring (the perplexity-filter shape of
    LLM data curation): train corpus wordcounts distributed (the
    top_tokens combiner + one token hash exchange), quantize per-word
    log-probs to 1e-6 ints (transcendentals go through
    ``floor(x*1e6+0.5)`` — the house microdegree rule, so the
    distributed per-doc sums are exact), broadcast the vocabulary
    table, and score every document in one streaming pass.  The
    driver-side vocabulary collect is vocabulary-bounded (swap for a
    token-key hash-exchange join when the vocab stops fitting).  The
    wordcount pass is the session-cached one shared with
    q_pmi_bigrams / q_bigram_ppl."""
    import ray

    vocab = _corpus_unigram_counts(sf_dir).to_pandas()
    total = float(vocab["n"].sum())
    lp6 = np.floor((np.log(vocab["n"].to_numpy().astype(np.float64))
                    - np.log(total)) * 1e6 + 0.5).astype(np.int64)
    order = np.argsort(vocab["tok"].to_numpy().astype("U"))
    vocab_sorted = vocab["tok"].to_numpy().astype("U")[order]
    lp6_sorted = lp6[order]
    ref = ray.put((vocab_sorted, lp6_sorted))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        from .stages.joins import _cached

        vs, lp = _cached(ref)
        toks = b["text"].str.lower().str.findall(r"[a-z0-9]+")
        lens = toks.str.len().to_numpy().astype(np.int64)
        flat = np.concatenate([np.asarray(t, dtype="U")
                               for t in toks if len(t)] or
                              [np.array([], dtype="U")])
        doc_idx = np.repeat(np.arange(len(b)), lens)
        acc = np.zeros(len(b), np.int64)
        if len(flat):
            pos = np.searchsorted(vs, flat)  # trained on this corpus —
            np.add.at(acc, doc_idx, lp[pos])  # every token is in-vocab
        keep = lens > 0
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy()[keep],
            "n_words": lens[keep],
            "lp6_sum": acc[keep]})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        score, batch_format="pandas")


def q_unigram_logprob_sql() -> str:
    return (
        "WITH w AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), "
        "'[a-z0-9]+')) AS tok FROM documents), "
        "cnt AS (SELECT tok, count(*) AS c FROM w GROUP BY tok), "
        "tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM cnt), "
        "lp AS (SELECT tok, CAST(floor((ln(CAST(c AS DOUBLE)) - "
        "ln((SELECT t FROM tot))) * 1e6 + 0.5) AS BIGINT) AS lp6 FROM cnt) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, "
        "CAST(sum(lp6) AS BIGINT) AS lp6_sum "
        "FROM w JOIN lp USING (tok) GROUP BY doc_id"
    )


def q_ks_drift(sf_dir: str):
    """Two-sample Kolmogorov–Smirnov drift between the click and view
    value distributions (stages/global_scan.py — range-partitioned
    distributed CDF scan: bucket totals tree → broadcast exclusive
    offsets → per-bucket vectorized max; exact integer arithmetic, the
    global CDF never materializes)."""
    import pyarrow.compute as pc

    from .stages.global_scan import two_sample_ks

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b["event_type"],
                              value_set=pa.array(["click", "view"])))
        v = t["value"].to_numpy(zero_copy_only=False)
        isa = pc.equal(t["event_type"], "click").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "v6": pa.array(np.floor(v * 1e6 + 0.5).astype(np.int64),
                           pa.int64()),
            "isa": pa.array(isa, pa.int64())})

    ds = _read(sf_dir, "events", ["event_type", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return two_sample_ks(ds, "v6", "isa", n_rows=_nrows(sf_dir, "events"))


def q_ks_drift_sql() -> str:
    return (
        "WITH x AS (SELECT CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v, "
        "CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS isa "
        "FROM events WHERE event_type IN ('click', 'view')), "
        "t AS (SELECT CAST(sum(isa) AS BIGINT) AS n_a, "
        "CAST(count(*) - sum(isa) AS BIGINT) AS n_b FROM x), "
        "g AS (SELECT v, CAST(sum(isa) AS BIGINT) AS ca, "
        "CAST(count(*) - sum(isa) AS BIGINT) AS cb FROM x GROUP BY v), "
        "c AS (SELECT sum(ca) OVER (ORDER BY v) AS cca, "
        "sum(cb) OVER (ORDER BY v) AS ccb FROM g) "
        "SELECT CAST(max(abs(cca * (SELECT n_b FROM t) - "
        "ccb * (SELECT n_a FROM t))) AS BIGINT) AS d_scaled, "
        "(SELECT n_a FROM t) AS n_a, (SELECT n_b FROM t) AS n_b FROM c"
    )


def q_global_rank(sf_dir: str):
    """Global ROW_NUMBER over all events by quantized value (ties →
    event_id) — stages/global_scan.py global_rank: range buckets +
    offset broadcast, no global sort operator."""
    from .stages.global_scan import global_rank

    def quant(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({"event_id": b["event_id"],
                         "v6": pa.array(
                             np.floor(v * 1e6 + 0.5).astype(np.int64),
                             pa.int64())})

    ds = _read(sf_dir, "events", ["event_id", "value"]).map_batches(
        quant, batch_format="pyarrow")
    return global_rank(ds, "v6", "event_id",
                       n_rows=_nrows(sf_dir, "events"))


def q_global_rank_sql() -> str:
    return (
        "SELECT event_id, row_number() OVER (ORDER BY "
        "CAST(floor(value * 1e6 + 0.5) AS BIGINT), event_id) "
        "AS global_rank FROM events"
    )


def q_gini(sf_dir: str):
    """Exact Gini concentration of purchase values
    (stages/global_scan.py gini_scaled — the offset-broadcast global
    scan; integer numerator/denominator so the distributed result is
    bit-exact)."""
    import pyarrow.compute as pc

    from .stages.global_scan import gini_scaled

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["event_type"], "purchase"))
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.table({"v6": pa.array(
            np.floor(v * 1e6 + 0.5).astype(np.int64), pa.int64())})

    ds = _read(sf_dir, "events", ["event_type", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return gini_scaled(ds, "v6", n_rows=_nrows(sf_dir, "events"))


def q_gini_sql() -> str:
    return (
        "WITH x AS (SELECT CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v "
        "FROM events WHERE event_type = 'purchase'), "
        "r AS (SELECT v, row_number() OVER (ORDER BY v) AS i, "
        "(SELECT count(*) FROM x) AS n FROM x) "
        "SELECT CAST(COALESCE(sum((2 * i - n - 1) * v), 0) AS BIGINT) "
        "AS g_num, "
        "CAST((SELECT count(*) FROM x) * COALESCE((SELECT sum(v) FROM x), "
        "0) AS BIGINT) AS g_den FROM r"
    )


def q_heading_octants(sf_dir: str):
    """Movement-heading histogram over per-user trajectories: each
    consecutive step (ordered by ts, event_id) is classified into one
    of 8 compass octants by EXACT integer-free comparisons on
    (dx, dy) — sign tests and |dx| vs |dy|, no atan2, so the
    distributed result is bit-identical to the SQL CASE cascade
    (np.select and CASE share first-match semantics and condition
    order).  Per-user steps come from the coarse-bucket keyed_scan;
    the bounded 8-key histogram merges on the combiner tree — no
    all-to-all anywhere."""
    from .stages.agg_tree import tree_aggregate_to_table
    from .stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "x": pa.array(lon), "y": pa.array(lat)})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        x = d["x"].to_numpy()
        y = d["y"].to_numpy()
        dx = np.zeros(len(d))
        dy = np.zeros(len(d))
        dx[1:] = x[1:] - x[:-1]
        dy[1:] = y[1:] - y[:-1]
        first = np.r_[True, u[1:] != u[:-1]]
        octant = np.select(
            [(dx > 0) & (dy >= 0) & (dx >= dy),
             (dy > 0) & (dx >= 0) & (dy > dx),
             (dy > 0) & (dx < 0) & (dy >= -dx),
             (dx < 0) & (dy > 0) & (-dx > dy),
             (dx < 0) & (dy <= 0) & (-dx >= -dy),
             (dy < 0) & (dx <= 0) & (-dy > -dx),
             (dy < 0) & (dx > 0) & (-dy >= dx),
             (dx > 0) & (dy < 0) & (dx > -dy)],
            [0, 1, 2, 3, 4, 5, 6, 7], -1)
        octant[first] = -1
        keep = octant >= 0
        uo, c = np.unique(octant[keep], return_counts=True)
        return pd.DataFrame({"octant": uo.astype(np.int64),
                             "n": c.astype(np.int64)})

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    parts = keyed_scan(ds, key="user_id", order=["t", "event_id"],
                       fn=fn, n_rows=_nrows(sf_dir, "events"))
    return tree_aggregate_to_table(parts, ["octant"], [("n", "sum")])


def q_heading_octants_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        f"WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        f"{lon} AS x, {lat} AS y FROM events), "
        "s AS (SELECT x - lag(x) OVER w AS dx, y - lag(y) OVER w AS dy "
        "FROM p WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), "
        "o AS (SELECT CASE "
        "WHEN dx > 0 AND dy >= 0 AND dx >= dy THEN 0 "
        "WHEN dy > 0 AND dx >= 0 AND dy > dx THEN 1 "
        "WHEN dy > 0 AND dx < 0 AND dy >= -dx THEN 2 "
        "WHEN dx < 0 AND dy > 0 AND -dx > dy THEN 3 "
        "WHEN dx < 0 AND dy <= 0 AND -dx >= -dy THEN 4 "
        "WHEN dy < 0 AND dx <= 0 AND -dy > -dx THEN 5 "
        "WHEN dy < 0 AND dx > 0 AND -dy >= dx THEN 6 "
        "WHEN dx > 0 AND dy < 0 AND dx > -dy THEN 7 END AS octant "
        "FROM s WHERE dx IS NOT NULL) "
        "SELECT CAST(octant AS BIGINT) AS octant, "
        "CAST(count(*) AS BIGINT) AS n "
        "FROM o WHERE octant IS NOT NULL GROUP BY octant"
    )


_DWELL_EPS_MICRO = 90_000_000  # step < 90 planar degrees (micro-int)
_DWELL_MIN_PTS = 3


def q_stay_points(sf_dir: str):
    """Stay-point (dwell) detection per user trajectory: maximal runs
    of consecutive points whose incoming planar step is below
    `_DWELL_EPS_MICRO` (micro-int compare — floats never accumulate);
    a run with ≥ `_DWELL_MIN_PTS` points is a dwell.  Per user:
    dwell count and longest dwell duration (exact int μs).  The
    gaps-and-islands machinery is one vectorized cumsum over run
    boundaries inside each keyed_scan bucket — runs never straddle
    buckets because keys don't."""
    from .stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "x": pa.array(lon), "y": pa.array(lat)})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        t = d["t"].to_numpy()
        x = d["x"].to_numpy()
        y = d["y"].to_numpy()
        dx = np.zeros(len(d))
        dy = np.zeros(len(d))
        dx[1:] = x[1:] - x[:-1]
        dy[1:] = y[1:] - y[:-1]
        first = np.r_[True, u[1:] != u[:-1]]
        step6 = np.floor(np.sqrt(dx * dx + dy * dy) * 1e6 + 0.5
                         ).astype(np.int64)
        small = (~first) & (step6 < _DWELL_EPS_MICRO)
        run_id = np.cumsum(~small)
        runs = (pd.DataFrame({"user_id": u, "run": run_id, "t": t})
                .groupby("run", sort=False)
                .agg(user_id=("user_id", "first"), cnt=("t", "size"),
                     t0=("t", "min"), t1=("t", "max")))
        qual = runs["cnt"].to_numpy() >= _DWELL_MIN_PTS
        dur = np.where(qual, runs["t1"].to_numpy() - runs["t0"].to_numpy(),
                       np.int64(-1))
        per = (pd.DataFrame({"user_id": runs["user_id"].to_numpy(),
                             "q": qual.astype(np.int64), "dur": dur})
               .groupby("user_id", sort=False, as_index=False)
               .agg(n_dwells=("q", "sum"), max_dwell_us=("dur", "max")))
        per["max_dwell_us"] = np.maximum(
            per["max_dwell_us"].to_numpy(), 0).astype(np.int64)
        per["n_dwells"] = per["n_dwells"].astype(np.int64)
        return per

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t", "event_id"],
                      fn=fn, n_rows=_nrows(sf_dir, "events"))


def q_stay_points_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        f"WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        f"{lon} AS x, {lat} AS y FROM events), "
        "d AS (SELECT user_id, t, event_id, "
        "x - lag(x) OVER w AS dx, y - lag(y) OVER w AS dy "
        "FROM p WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), "
        "s AS (SELECT user_id, t, event_id, "
        "CASE WHEN dx IS NOT NULL AND "
        "CAST(floor(sqrt(dx * dx + dy * dy) * 1000000 + 0.5) AS BIGINT) "
        f"< {_DWELL_EPS_MICRO} THEN 0 ELSE 1 END AS new_run FROM d), "
        "r AS (SELECT user_id, t, sum(new_run) OVER "
        "(PARTITION BY user_id ORDER BY t, event_id) AS run_id FROM s), "
        "g AS (SELECT user_id, run_id, count(*) AS cnt, "
        "max(t) - min(t) AS dur FROM r GROUP BY user_id, run_id) "
        "SELECT user_id, "
        f"CAST(count(*) FILTER (WHERE cnt >= {_DWELL_MIN_PTS}) AS BIGINT) "
        "AS n_dwells, "
        f"CAST(COALESCE(max(dur) FILTER (WHERE cnt >= {_DWELL_MIN_PTS}), "
        "0) AS BIGINT) AS max_dwell_us FROM g GROUP BY user_id"
    )


def q_shoelace_area(sf_dir: str):
    """Signed polygon area (shoelace, ×2, micro-int) of each user's
    closed trajectory ring (points ordered by ts, event_id; last point
    wraps to the first).  Each cross term ``x·y' − x'·y`` is quantized
    to micro-ints BEFORE summation, so the distributed integer sum is
    order-free and bit-identical to the SQL lead/first_value oracle.
    Single-point users contribute a zero ring."""
    from .stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "x": pa.array(lon), "y": pa.array(lat)})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        x = d["x"].to_numpy()
        y = d["y"].to_numpy()
        idx = np.arange(len(d), dtype=np.int64)
        first = np.r_[True, u[1:] != u[:-1]]
        last = np.r_[first[1:], True]
        seg_start = idx[first][np.cumsum(first) - 1]
        nxt = idx + 1
        nxt[last] = seg_start[last]
        cross6 = np.floor((x * y[nxt] - x[nxt] * y) * 1e6 + 0.5
                          ).astype(np.int64)
        out = pd.DataFrame({"user_id": u, "c": cross6})
        return (out.groupby("user_id", sort=False, as_index=False)
                .agg(area2_micro=("c", "sum"), n_pts=("c", "size")))

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t", "event_id"],
                      fn=fn, n_rows=_nrows(sf_dir, "events"))


def q_shoelace_area_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        f"WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        f"{lon} AS x, {lat} AS y FROM events), "
        "s AS (SELECT user_id, x, y, "
        "COALESCE(lead(x) OVER w, first_value(x) OVER w) AS nx, "
        "COALESCE(lead(y) OVER w, first_value(y) OVER w) AS ny "
        "FROM p WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)) "
        "SELECT user_id, CAST(sum(CAST(floor((x * ny - nx * y) * 1000000 "
        "+ 0.5) AS BIGINT)) AS BIGINT) AS area2_micro, "
        "CAST(count(*) AS BIGINT) AS n_pts FROM s GROUP BY user_id"
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
    from .stages.agg_tree import tree_aggregate_to_table

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


def q_mom_revenue(sf_dir: str):
    """Month-over-month revenue deltas (the period-over-period
    reporting shape): one streaming pass pre-aggregates cent-quantized
    order totals per calendar month inside each batch, the bounded
    month space merges on the combiner tree, and the lag delta is a
    vectorized driver-side pass over the (tiny) month series —
    no shuffle anywhere."""
    from .stages.agg_tree import tree_aggregate_to_table

    def partial(b: pd.DataFrame) -> pa.Table:
        ym = (b["o_orderdate"].dt.year * 100
              + b["o_orderdate"].dt.month).to_numpy().astype(np.int64)
        cents = np.floor(b["o_totalprice"].to_numpy() * 100 + 0.5
                         ).astype(np.int64)
        t = pa.table({"ym": pa.array(ym), "rev_cents": pa.array(cents),
                      "n_orders": pa.array(np.ones(len(b), np.int64))})
        return (t.group_by(["ym"])
                 .aggregate([("rev_cents", "sum"), ("n_orders", "sum")])
                 .rename_columns(["ym", "rev_cents", "n_orders"]))

    parts = _read(sf_dir, "orders",
                  ["o_orderdate", "o_totalprice"]).map_batches(
        partial, batch_format="pandas")
    m = tree_aggregate_to_table(
        parts, ["ym"], [("rev_cents", "sum"), ("n_orders", "sum")]
    ).to_pandas().sort_values("ym", kind="mergesort").reset_index(
        drop=True)
    rev = m["rev_cents"].to_numpy().astype(np.int64)
    delta = np.zeros(len(m), np.int64)
    delta[1:] = rev[1:] - rev[:-1]
    m["delta_cents"] = delta
    m["ym"] = m["ym"].astype(np.int64)
    m["n_orders"] = m["n_orders"].astype(np.int64)
    return m


def q_mom_revenue_sql() -> str:
    return (
        "WITH m AS (SELECT CAST(year(o_orderdate) * 100 + "
        "month(o_orderdate) AS BIGINT) AS ym, "
        "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) "
        "AS BIGINT) AS rev_cents, CAST(count(*) AS BIGINT) AS n_orders "
        "FROM orders GROUP BY 1) "
        "SELECT ym, rev_cents, n_orders, "
        "CAST(COALESCE(rev_cents - lag(rev_cents) OVER (ORDER BY ym), 0) "
        "AS BIGINT) AS delta_cents FROM m"
    )


def q_od_matrix(sf_dir: str):
    """Origin–destination trip matrix (mobility-analytics staple):
    each user's events split into calendar-day trips via the coarse
    keyed_scan (ordered by ts, event_id; a user's rows never straddle
    buckets so day runs are bucket-local), the day's first and last
    positions map to a 15° grid cell, and the bounded (origin, dest)
    cell-pair space merges on the combiner tree — per-bucket partials
    only, no all-to-all exchange anywhere."""
    from .stages.agg_tree import tree_aggregate_to_table
    from .stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        cx = np.floor((lon + 180.0) / 15.0).astype(np.int64)
        cy = np.floor((lat + 60.0) / 15.0).astype(np.int64)
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "cx": pa.array(cx), "cy": pa.array(cy)})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        day = d["t"].to_numpy() // 86_400_000_000
        first = np.r_[True, (u[1:] != u[:-1]) | (day[1:] != day[:-1])]
        last = np.r_[first[1:], True]
        cx = d["cx"].to_numpy()
        cy = d["cy"].to_numpy()
        g = (pd.DataFrame({"o_cx": cx[first], "o_cy": cy[first],
                           "d_cx": cx[last], "d_cy": cy[last]})
             .groupby(["o_cx", "o_cy", "d_cx", "d_cy"], sort=False)
             .size().reset_index(name="n_trips"))
        g["n_trips"] = g["n_trips"].astype(np.int64)
        return g

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"]
               ).map_batches(prep, batch_format="pyarrow")
    parts = keyed_scan(ds, "user_id", ["t", "event_id"], fn)
    return tree_aggregate_to_table(
        parts, ["o_cx", "o_cy", "d_cx", "d_cy"], [("n_trips", "sum")])


def q_od_matrix_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        f"WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        f"CAST(floor(({lon} + 180.0) / 15.0) AS BIGINT) AS cx, "
        f"CAST(floor(({lat} + 60.0) / 15.0) AS BIGINT) AS cy "
        "FROM events), "
        "s AS (SELECT user_id, t // 86400000000 AS day, cx, cy, "
        "row_number() OVER (PARTITION BY user_id, t // 86400000000 "
        "ORDER BY t, event_id) AS rn, "
        "count(*) OVER (PARTITION BY user_id, t // 86400000000) AS cnt "
        "FROM p) "
        "SELECT o.cx AS o_cx, o.cy AS o_cy, d.cx AS d_cx, d.cy AS d_cy, "
        "CAST(count(*) AS BIGINT) AS n_trips "
        "FROM s o JOIN s d ON o.user_id = d.user_id AND o.day = d.day "
        "WHERE o.rn = 1 AND d.rn = d.cnt GROUP BY 1, 2, 3, 4"
    )


def q_cum_new_users(sf_dir: str):
    """Daily new-user counts with a cumulative total (the
    growth-accounting shape): per-batch Arrow group_by pre-reduces
    each user's min event time (the combiner — shuffle volume is
    distinct users per block, not rows), ONE coarse hash exchange on
    user_id finishes the global first-seen day, the bounded day space
    rides the combiner tree, and the cumulative sum is a vectorized
    pass over the tiny day series on the driver."""
    from .stages.agg_tree import tree_aggregate_to_table
    from .stages.scan import hash_bucket_scan

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"user_id": b["user_id"],
                      "t": b["ts"].cast(pa.int64())})
        return (t.group_by(["user_id"]).aggregate([("t", "min")])
                 .rename_columns(["user_id", "t"]))

    ds = _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
        partial, batch_format="pyarrow")

    def per_user_day(t: pa.Table) -> pa.Table:
        g = (t.group_by(["user_id"]).aggregate([("t", "min")])
              .rename_columns(["user_id", "t"]))
        day = g["t"].to_numpy() // 86_400_000_000
        c = pa.table({"day": pa.array(day),
                      "n_new": pa.array(np.ones(len(day), np.int64))})
        return (c.group_by(["day"]).aggregate([("n_new", "sum")])
                 .rename_columns(["day", "n_new"]))

    days = hash_bucket_scan(ds, ["user_id"], per_user_day)
    m = tree_aggregate_to_table(days, ["day"], [("n_new", "sum")]
                                ).to_pandas()
    m = m.sort_values("day", kind="mergesort").reset_index(drop=True)
    m["day"] = m["day"].astype(np.int64)
    m["n_new"] = m["n_new"].astype(np.int64)
    m["cum_users"] = m["n_new"].to_numpy().cumsum()
    return m


def q_cum_new_users_sql() -> str:
    return (
        "WITH f AS (SELECT user_id, min(epoch_us(ts)) // 86400000000 "
        "AS day FROM events GROUP BY 1), "
        "d AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new FROM f "
        "GROUP BY 1) "
        "SELECT day, n_new, CAST(sum(n_new) OVER (ORDER BY day) "
        "AS BIGINT) AS cum_users FROM d"
    )


def q_kring_smooth(sf_dir: str):
    """3×3 neighbor-smoothed density surface over a 1° grid (the
    heatmap / kernel-smoothing shape): per-batch partial cell counts
    merge on the combiner tree — grid resolution bounds the key space
    at 360×120 regardless of data volume — and the k-ring convolution
    is one vectorized sparse searchsorted pass over the realized cells
    on the driver.  The event stream itself never shuffles."""
    from .stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        cx = np.floor(lon + 180.0).astype(np.int64)
        cy = np.floor(lat + 60.0).astype(np.int64)
        t = pa.table({"cx": pa.array(cx), "cy": pa.array(cy),
                      "n": pa.array(np.ones(len(cx), np.int64))})
        return (t.group_by(["cx", "cy"]).aggregate([("n", "sum")])
                 .rename_columns(["cx", "cy", "n"]))

    cells = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_id"]).map_batches(
            partial, batch_format="pyarrow"),
        ["cx", "cy"], [("n", "sum")]).to_pandas()
    cx = cells["cx"].to_numpy().astype(np.int64)
    cy = cells["cy"].to_numpy().astype(np.int64)
    n = cells["n"].to_numpy().astype(np.int64)
    # cy < 1024 always (grid is 120 tall), so the packed key is unique
    # and a ±1 cy probe can never alias a neighboring cx column
    key = cx * 1024 + cy
    order = np.argsort(key, kind="mergesort")
    skey, sn = key[order], n[order]
    smooth = np.zeros(len(cells), np.int64)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            q = key + dx * 1024 + dy
            idx = np.clip(np.searchsorted(skey, q), 0, len(skey) - 1)
            smooth += np.where(skey[idx] == q, sn[idx], 0)
    return pd.DataFrame({"cx": cx, "cy": cy, "n": n,
                         "smooth_n": smooth})


def q_kring_smooth_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        f"WITH c AS (SELECT CAST(floor({lon} + 180.0) AS BIGINT) AS cx, "
        f"CAST(floor({lat} + 60.0) AS BIGINT) AS cy, "
        "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2) "
        "SELECT a.cx, a.cy, a.n, CAST(sum(b.n) AS BIGINT) AS smooth_n "
        "FROM c a JOIN c b ON b.cx BETWEEN a.cx - 1 AND a.cx + 1 "
        "AND b.cy BETWEEN a.cy - 1 AND a.cy + 1 "
        "GROUP BY 1, 2, 3"
    )


def _border_segments(sf_dir: str):
    """25 deterministic 'border' line segments derived from nation
    keys (endpoints via the shared derive_latlon hash, micro-int
    quantized) — the broadcast small side of the crossing join."""
    import pyarrow.parquet as pq

    nk = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                       columns=["n_nationkey"])["n_nationkey"]\
        .to_numpy(zero_copy_only=False).astype(np.int64)
    a_lat, a_lon = derive_latlon(nk * 2 + 1001)
    b_lat, b_lon = derive_latlon(nk * 2 + 1002)
    micro = lambda v: np.floor(v * 1e6 + 0.5).astype(np.int64)
    return (nk, micro(a_lon), micro(a_lat), micro(b_lon), micro(b_lat))


def q_border_crossings(sf_dir: str):
    """Geofence line-crossing counts (border-crossing detection): each
    consecutive per-user trajectory step is tested for PROPER
    intersection against 25 broadcast 'border' segments using exact
    int64 orientation cross-products on microdegree coordinates (|d|
    < 2^58 — no float anywhere, so the SQL CASE oracle matches
    bit-for-bit).  Steps come from the coarse keyed_scan; the bounded
    25-key histogram merges on the combiner tree.  The segment loop is
    a fixed 25-iteration vectorized pass — O(n) memory per bucket."""
    from .stages.agg_tree import tree_aggregate_to_table
    from .stages.scan import keyed_scan

    seg, ax, ay, bx, by = _border_segments(sf_dir)

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        return pa.table({
            "user_id": b["user_id"], "t": b["ts"].cast(pa.int64()),
            "event_id": b["event_id"],
            "x": pa.array(np.floor(lon * 1e6 + 0.5).astype(np.int64)),
            "y": pa.array(np.floor(lat * 1e6 + 0.5).astype(np.int64))})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        x = d["x"].to_numpy()
        y = d["y"].to_numpy()
        step = np.r_[False, u[1:] == u[:-1]]  # row i: step (i-1)->(i)
        x1, y1 = x[:-1][step[1:]], y[:-1][step[1:]]
        x2, y2 = x[1:][step[1:]], y[1:][step[1:]]
        counts = np.zeros(len(seg), np.int64)
        for i in range(len(seg)):
            dx, dy = bx[i] - ax[i], by[i] - ay[i]
            d1 = dx * (y1 - ay[i]) - dy * (x1 - ax[i])
            d2 = dx * (y2 - ay[i]) - dy * (x2 - ax[i])
            sx, sy = x2 - x1, y2 - y1
            d3 = sx * (ay[i] - y1) - sy * (ax[i] - x1)
            d4 = sx * (by[i] - y1) - sy * (bx[i] - x1)
            hit = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) \
                & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
            counts[i] = int(np.count_nonzero(hit))
        return pd.DataFrame({"seg": seg, "n_cross": counts})

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"]
               ).map_batches(prep, batch_format="pyarrow")
    parts = keyed_scan(ds, "user_id", ["t", "event_id"], fn)
    return tree_aggregate_to_table(parts, ["seg"], [("n_cross", "sum")])


def q_border_crossings_sql() -> str:
    lat, lon = latlon_sql("event_id")
    a_lat, a_lon = latlon_sql("(CAST(n_nationkey AS BIGINT) * 2 + 1001)")
    b_lat, b_lon = latlon_sql("(CAST(n_nationkey AS BIGINT) * 2 + 1002)")
    return (
        f"WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        f"CAST(floor({lon} * 1000000 + 0.5) AS BIGINT) AS x, "
        f"CAST(floor({lat} * 1000000 + 0.5) AS BIGINT) AS y "
        "FROM events), "
        "s AS (SELECT x AS x2, y AS y2, lag(x) OVER w AS x1, "
        "lag(y) OVER w AS y1 FROM p "
        "WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), "
        f"g AS (SELECT CAST(n_nationkey AS BIGINT) AS seg, "
        f"CAST(floor({a_lon} * 1000000 + 0.5) AS BIGINT) AS ax, "
        f"CAST(floor({a_lat} * 1000000 + 0.5) AS BIGINT) AS ay, "
        f"CAST(floor({b_lon} * 1000000 + 0.5) AS BIGINT) AS bx, "
        f"CAST(floor({b_lat} * 1000000 + 0.5) AS BIGINT) AS by "
        "FROM nation), "
        "d AS (SELECT g.seg, "
        "(g.bx - g.ax) * (s.y1 - g.ay) - (g.by - g.ay) * (s.x1 - g.ax) "
        "AS d1, "
        "(g.bx - g.ax) * (s.y2 - g.ay) - (g.by - g.ay) * (s.x2 - g.ax) "
        "AS d2, "
        "(s.x2 - s.x1) * (g.ay - s.y1) - (s.y2 - s.y1) * (g.ax - s.x1) "
        "AS d3, "
        "(s.x2 - s.x1) * (g.by - s.y1) - (s.y2 - s.y1) * (g.bx - s.x1) "
        "AS d4 FROM g CROSS JOIN "
        "(SELECT * FROM s WHERE x1 IS NOT NULL) s) "
        "SELECT seg, CAST(sum(CASE WHEN "
        "((d1 > 0 AND d2 < 0) OR (d1 < 0 AND d2 > 0)) AND "
        "((d3 > 0 AND d4 < 0) OR (d3 < 0 AND d4 > 0)) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_cross FROM d GROUP BY seg"
    )


_DP_EPS_MICRO = 10_000_000  # 10° tolerance on the synthetic tracks


def q_douglas_peucker(sf_dir: str):
    """Douglas–Peucker trajectory simplification per user (the
    track-thinning step of a GPS-trace pipeline): each user's
    (t, event_id)-ordered polyline is simplified to ε = 10° with
    exact integer geometry — see functions/simplify.py for the
    breadth-first vectorized engine (no per-user recursion; every
    active segment in a bucket advances in one numpy pass per round).
    Rows-only entry (recursive semantics aren't SQL-expressible);
    tests/test_geo.py pins the engine to a recursive textbook oracle
    point-for-point on planted tracks AND on the full sf0.001 table.
    Output: per-user point/kept counts + a kept-set checksum."""
    from .functions.simplify import dp_keep_mask
    from .stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        return pa.table({
            "user_id": b["user_id"], "t": b["ts"].cast(pa.int64()),
            "event_id": b["event_id"],
            "x": pa.array(np.floor(lon * 1e6 + 0.5).astype(np.int64)),
            "y": pa.array(np.floor(lat * 1e6 + 0.5).astype(np.int64))})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        first = np.r_[True, u[1:] != u[:-1]]
        keep = dp_keep_mask(d["x"].to_numpy(), d["y"].to_numpy(),
                            first, _DP_EPS_MICRO)
        ev = d["event_id"].to_numpy().astype(np.int64)
        gid = np.cumsum(first) - 1
        n_pts = np.bincount(gid).astype(np.int64)
        n_kept = np.bincount(gid, weights=keep).astype(np.int64)
        csum = np.bincount(gid, weights=np.where(keep, ev, 0)
                           ).astype(np.int64)
        return pd.DataFrame({"user_id": u[first], "n_points": n_pts,
                             "n_kept": n_kept, "kept_checksum": csum})

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"]
               ).map_batches(prep, batch_format="pyarrow")
    return keyed_scan(ds, "user_id", ["t", "event_id"], fn)


_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def q_geohash4(sf_dir: str):
    """Geohash-4 cell counts (the standard base-32 bit-interleaved
    spatial key): 10 lat + 10 lon bits interleave lon-first into a
    20-bit code — counted per batch as INTEGER codes (combiner), with
    only the realized distinct codes converted to strings on the
    driver after the tree merge.  The code space is bounded at 2^20
    regardless of data volume, so the tree holds at any scale; the
    SQL oracle mirrors the interleave with the same shift/mask
    arithmetic."""
    from .stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        latb = np.floor((lat + 90.0) / 180.0 * 1024.0).astype(np.int64)
        lonb = np.floor((lon + 180.0) / 360.0 * 1024.0).astype(np.int64)
        code = np.zeros(len(latb), np.int64)
        for j in range(10):
            code |= ((lonb >> (9 - j)) & 1) << (19 - 2 * j)
            code |= ((latb >> (9 - j)) & 1) << (18 - 2 * j)
        t = pa.table({"code": pa.array(code),
                      "n": pa.array(np.ones(len(code), np.int64))})
        return (t.group_by(["code"]).aggregate([("n", "sum")])
                 .rename_columns(["code", "n"]))

    cells = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_id"]).map_batches(
            partial, batch_format="pyarrow"),
        ["code"], [("n", "sum")]).to_pandas()
    code = cells["code"].to_numpy().astype(np.int64)
    alph = np.array(list(_GH32))
    gh = alph[(code >> 15) & 31]
    for sh in (10, 5, 0):
        gh = np.char.add(gh, alph[(code >> sh) & 31])
    return pd.DataFrame({"gh4": gh,
                         "n": cells["n"].to_numpy().astype(np.int64)})


def q_geohash4_sql() -> str:
    lat, lon = latlon_sql("event_id")
    interleave = " + ".join(
        f"(((lonb >> {9 - j}) & 1) << {19 - 2 * j}) + "
        f"(((latb >> {9 - j}) & 1) << {18 - 2 * j})"
        for j in range(10))
    chars = " || ".join(
        f"substr('{_GH32}', CAST(((code >> {sh}) & 31) AS INTEGER) + 1, 1)"
        for sh in (15, 10, 5, 0))
    return (
        f"WITH b AS (SELECT "
        f"CAST(floor(({lat} + 90.0) / 180.0 * 1024.0) AS BIGINT) AS latb, "
        f"CAST(floor(({lon} + 180.0) / 360.0 * 1024.0) AS BIGINT) AS lonb "
        "FROM events), "
        f"c AS (SELECT ({interleave}) AS code FROM b) "
        f"SELECT {chars} AS gh4, CAST(count(*) AS BIGINT) AS n "
        "FROM c GROUP BY 1"
    )


_GROUP_SAMPLE_K = 50


def q_group_sample(sf_dir: str):
    """Deterministic per-domain cap (the "≤ K documents per source"
    rebalancing step of LLM corpus curation): within each source keep
    the K docs with the smallest multiply-shift hash of doc_id — a
    seedless, replayable uniform sample that needs no RNG state.  The
    engine shape is grouped_top_k's per-batch pre-reduce (≤ K rows per
    (source, batch) survive locally), so the shuffle moves ≤ K·blocks
    rows per source, never the corpus."""
    from .stages.topk import grouped_top_k

    def prio(b: pa.Table) -> pa.Table:
        i = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (i * 2654435761 + 99991) % 4294967296
        return pa.table({"doc_id": b["doc_id"], "source": b["source"],
                         "h": pa.array(h, pa.int64())})

    ds = _read(sf_dir, "documents", ["doc_id", "source"]).map_batches(
        prio, batch_format="pyarrow")
    out = grouped_top_k(ds, "source", "h", _GROUP_SAMPLE_K,
                        descending=False, tiebreak_col="doc_id")
    return out.select_columns(["doc_id", "source"])


def q_group_sample_sql() -> str:
    return (
        "WITH h AS (SELECT doc_id, source, "
        "(doc_id * 2654435761 + 99991) % 4294967296 AS h "
        "FROM documents), "
        "r AS (SELECT doc_id, source, row_number() OVER ("
        "PARTITION BY source ORDER BY h, doc_id) AS rn FROM h) "
        f"SELECT doc_id, source FROM r WHERE rn <= {_GROUP_SAMPLE_K}"
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
    from .stages.agg_tree import tree_aggregate_to_table

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


_ADAPT_ZMAX = 8
_ADAPT_CAP = 64


def q_adaptive_tiles(sf_dir: str):
    """Adaptive quadtree tiling: starting from the z=0 web-mercator
    root, any tile holding more than `_ADAPT_CAP` points splits into
    its four children, down to z=`_ADAPT_ZMAX` — the
    density-adaptive variant of the flagship fixed-zoom tiling.  ONE
    data pass builds per-batch z-max partial counts (pre-aggregated,
    so the combiner tree ships ≤ |tiles| rows per block over the
    bounded 4^zmax space); leaf selection is the vectorized
    ancestor-reachability walk in stages/tiling.py::adaptive_leaves,
    relying on bit-exact tile nesting (see q_tile_pyramid)."""
    from .stages.agg_tree import tree_aggregate_to_table
    from .stages.tiling import adaptive_leaves

    def leaf(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        x, y = tile_xy(lat, lon, _ADAPT_ZMAX)
        t = pa.table({"tile_x": pa.array(x), "tile_y": pa.array(y),
                      "n": pa.array(np.ones(len(x), np.int64))})
        return (t.group_by(["tile_x", "tile_y"])
                 .aggregate([("n", "sum")])
                 .rename_columns(["tile_x", "tile_y", "n"]))

    parts = _read(sf_dir, "events", ["event_id"]).map_batches(
        leaf, batch_format="pyarrow")
    counts = tree_aggregate_to_table(
        parts, ["tile_x", "tile_y"], [("n", "sum")]).to_pandas()
    return adaptive_leaves(counts, _ADAPT_ZMAX, _ADAPT_CAP)


def q_adaptive_tiles_sql() -> str:
    lat, lon = latlon_sql("event_id")
    cap, zmax = _ADAPT_CAP, _ADAPT_ZMAX
    ctes = [f"p AS (SELECT {lat} AS lat, {lon} AS lon FROM events)"]
    for z in range(zmax + 1):
        xe, ye = tile_sql("lat", "lon", z)
        ctes.append(f"c{z} AS (SELECT {xe} AS x, {ye} AS y, "
                    "count(*) AS n FROM p GROUP BY 1, 2)")
    ctes.append("r0 AS (SELECT x, y, n FROM c0)")
    for z in range(1, zmax + 1):
        ctes.append(
            f"r{z} AS (SELECT c.x, c.y, c.n FROM c{z} c "
            f"JOIN r{z - 1} pa ON pa.x = c.x // 2 AND pa.y = c.y // 2 "
            f"WHERE pa.n > {cap})")
    leaves = [f"SELECT {z} AS tile_z, x AS tile_x, y AS tile_y, n "
              f"FROM r{z} WHERE n <= {cap}" for z in range(zmax)]
    leaves.append(f"SELECT {zmax} AS tile_z, x AS tile_x, y AS tile_y, "
                  f"n FROM r{zmax}")
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT CAST(tile_z AS BIGINT) AS tile_z, "
        "CAST(tile_x AS BIGINT) AS tile_x, "
        "CAST(tile_y AS BIGINT) AS tile_y, CAST(n AS BIGINT) AS n "
        "FROM (" + " UNION ALL ".join(leaves) + ")"
    )


def q_trend_slopes(sf_dir: str):
    """Per-user least-squares trend of event value over time, kept as
    the exact integer pair (slope_num, slope_den) = (n·Σxy − Σx·Σy,
    n·Σx² − (Σx)²) so the distributed result is bit-identical: x =
    whole hours since the user's first event (int), y = milli-quantized
    value.  One keyed_scan pass — the five moment sums are per-segment
    vectorized reductions; no float ever accumulates."""
    from .stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "y": pa.array(np.floor(v * 1e3 + 0.5
                                                ).astype(np.int64))})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        g = d.groupby("user_id", sort=False)
        tmin = g["t"].transform("min").to_numpy()
        x = (d["t"].to_numpy() - tmin) // 3_600_000_000
        y = d["y"].to_numpy()
        f = pd.DataFrame({"user_id": d["user_id"].to_numpy(),
                          "x": x, "y": y, "xy": x * y, "xx": x * x})
        s = (f.groupby("user_id", sort=False, as_index=False)
             .agg(n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
                  sxy=("xy", "sum"), sxx=("xx", "sum")))
        n = s["n"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "user_id": s["user_id"].to_numpy(),
            "slope_num": n * s["sxy"].to_numpy() -
            s["sx"].to_numpy() * s["sy"].to_numpy(),
            "slope_den": n * s["sxx"].to_numpy() -
            s["sx"].to_numpy() ** 2,
            "n": n})

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t", "event_id"],
                      fn=fn, n_rows=_nrows(sf_dir, "events"))


def q_trend_slopes_sql() -> str:
    return (
        "WITH p AS (SELECT user_id, epoch_us(ts) AS t, "
        "CAST(floor(value * 1000 + 0.5) AS BIGINT) AS y FROM events), "
        "x AS (SELECT user_id, (t - min(t) OVER (PARTITION BY user_id)) "
        "// 3600000000 AS x, y FROM p) "
        "SELECT user_id, CAST(count(*) * sum(x * y) - sum(x) * sum(y) "
        "AS BIGINT) AS slope_num, "
        "CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) "
        "AS slope_den, CAST(count(*) AS BIGINT) AS n "
        "FROM x GROUP BY user_id"
    )


def q_nearest_center(sf_dir: str):
    """Broadcast nearest-center assignment (the k-means / IVF assign
    shape): every event point snaps to its closest nation center by
    EXACT integer squared distance on microdegree coordinates (no
    float argmin ties), reduced to per-center (count, Σd²) partials
    inside each batch and merged on the bounded combiner tree — the
    25-row center table is closure-captured, points never shuffle."""
    import pyarrow.parquet as pq

    from .stages.agg_tree import tree_aggregate_to_table

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


def q_rolling_zscore(sf_dir: str):
    """Streaming anomaly flags: per user (ordered by ts, event_id), a
    point is anomalous when its squared z-score against the trailing
    11-row window (ROWS 10 PRECEDING..CURRENT, incl. itself) exceeds
    4 and the window holds ≥ 5 rows.  The test
    ``(v·n − s1)² > 4·(n·s2 − s1²)`` is pure int64 on milli-quantized
    values — no division, no float variance, so distributed runs are
    bit-identical.  Rolling sums are one global cumsum per bucket with
    per-segment window-start clamps (no per-key loop)."""
    from .stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "v": pa.array(np.floor(v * 1e3 + 0.5
                                                ).astype(np.int64))})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        v = d["v"].to_numpy()
        idx = np.arange(len(d), dtype=np.int64)
        first = np.r_[True, u[1:] != u[:-1]]
        seg_start = idx[first][np.cumsum(first) - 1]
        start = np.maximum(idx - 10, seg_start)
        c1 = np.concatenate(([0], np.cumsum(v)))
        c2 = np.concatenate(([0], np.cumsum(v * v)))
        s1 = c1[idx + 1] - c1[start]
        s2 = c2[idx + 1] - c2[start]
        n = idx - start + 1
        dev = v * n - s1
        anom = (n >= 5) & (dev * dev > 4 * (n * s2 - s1 * s1))
        return pd.DataFrame({
            "event_id": d["event_id"].to_numpy()[anom],
            "user_id": u[anom]})

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, key="user_id", order=["t", "event_id"],
                      fn=fn, n_rows=_nrows(sf_dir, "events"))


def q_rolling_zscore_sql() -> str:
    return (
        "WITH x AS (SELECT event_id, user_id, epoch_us(ts) AS t, "
        "CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v FROM events), "
        "w AS (SELECT event_id, user_id, v, sum(v) OVER win AS s1, "
        "sum(v * v) OVER win AS s2, count(*) OVER win AS n FROM x "
        "WINDOW win AS (PARTITION BY user_id ORDER BY t, event_id "
        "ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)) "
        "SELECT event_id, user_id FROM w WHERE n >= 5 AND "
        "(v * n - s1) * (v * n - s1) > 4 * (n * s2 - s1 * s1)"
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

    from .stages.cc import connected_components
    from .stages.scan import hash_bucket_scan
    from .stages.spatial_join import point_radius_join

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


_DBSCAN_EPS = 1.0
_DBSCAN_MINPTS = 3  # |N_eps(p)| ≥ 3 counting the point itself


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

    from .stages.cc import connected_components
    from .stages.graph import edge_state_messages
    from .stages.joins import copart_hash_join
    from .stages.scan import auto_n_buckets, hash_bucket_scan
    from .stages.spatial_join import point_radius_join

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


def _intra_run_pairs(run_id: np.ndarray, pair_budget: int = 2_000_000):
    """All index pairs (i, j), i < j, within equal-value runs of the
    SORTED ``run_id`` array — fully vectorized (np.repeat/arange offset
    arithmetic, the OD-matrix style), yielded in chunks of at most
    ``pair_budget`` pairs so a hot run never materializes quadratically
    in one allocation.  Callers' per-run quadratic cost is the
    documented partitioning assumption (per-key cardinality bounded —
    trajectory/user-sized, not table-sized)."""
    n = len(run_id)
    if n == 0:
        return
    starts = np.r_[0, np.flatnonzero(run_id[1:] != run_id[:-1]) + 1]
    lengths = np.diff(np.r_[starts, n])
    seg_start_of_row = np.repeat(starts, lengths)
    r = np.arange(n) - seg_start_of_row  # index within run = pairs
    # contributed by the row as the 'j' (right) element
    cum = np.r_[0, np.cumsum(r)]
    total = int(cum[-1])
    lo = 0
    while lo < total:
        hi = min(lo + pair_budget, total)
        # rows whose pair slots intersect [lo, hi)
        j0 = int(np.searchsorted(cum, lo, side="right") - 1)
        j1 = int(np.searchsorted(cum, hi, side="left"))
        jr = np.arange(j0, j1)
        cnt = r[j0:j1].copy()
        if len(cnt):
            cnt[0] -= lo - cum[j0]
            cnt[-1] -= cum[j1] - hi
        jg = np.repeat(jr, cnt)
        first_slot = np.maximum(cum[j0:j1], lo)
        a_local = (np.arange(hi - lo)
                   - np.repeat(first_slot - lo, cnt)
                   + np.repeat(first_slot - cum[j0:j1], cnt))
        ig = seg_start_of_row[jg] + a_local
        yield ig, jg
        lo = hi


def q_max_span(sf_dir: str):
    """Per-user trajectory diameter: the maximum squared planar
    distance (degree²) between any two of the user's event points.
    Users co-partition through keyed_scan (one coarse hash exchange);
    the per-bucket pass explodes intra-user index pairs with the
    vectorized chunked generator — no per-key Python loop, and the
    pair budget bounds peak memory.  Quadratic per user by nature
    (documented assumption: per-user event counts are bounded); the
    max of identical per-pair doubles is order-independent, so the
    result hash-matches the SQL self-join exactly."""
    from .stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        return pa.table({"user_id": b["user_id"],
                         "event_id": b["event_id"],
                         "x": pa.array(lon), "y": pa.array(lat)})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        x = d["x"].to_numpy()
        y = d["y"].to_numpy()
        best: dict[int, float] = {}
        for ig, jg in _intra_run_pairs(u):
            dx = x[ig] - x[jg]
            dy = y[ig] - y[jg]
            d2 = dx * dx + dy * dy
            t = pd.DataFrame({"u": u[jg], "d2": d2}).groupby(
                "u", sort=False)["d2"].max()
            for k, v in t.items():  # ≤ distinct-users-per-chunk items
                if v > best.get(k, -1.0):
                    best[k] = v
        return pd.DataFrame({"user_id": np.fromiter(best, np.int64),
                             "max_d2": np.fromiter(best.values(),
                                                   np.float64)})

    ds = _read(sf_dir, "events", ["event_id", "user_id"]).map_batches(
        prep, batch_format="pyarrow")
    return keyed_scan(ds, "user_id", ["event_id"], fn,
                      n_rows=_nrows(sf_dir, "events"))


def q_max_span_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        f"WITH p AS (SELECT user_id, event_id, {lon} AS x, {lat} AS y "
        "FROM events) "
        "SELECT a.user_id AS user_id, "
        "max((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) "
        "AS max_d2 FROM p a JOIN p b "
        "ON a.user_id = b.user_id AND a.event_id < b.event_id "
        "GROUP BY 1"
    )


def q_self_crossings(sf_dir: str):
    """Per-user trajectory self-intersection counts: consecutive
    events (ordered by ts, event_id) form segments in exact microdegree
    ints; every NON-ADJACENT segment pair of the same user is tested
    for proper crossing with integer cross-product orientation signs
    (no epsilon, no floats — coordinates ≤ 3.6e8 keep every product
    under 2^63).  Same keyed_scan co-partition + chunked pair explode
    as max_span; emits users with ≥ 1 crossing."""
    from .stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        return pa.table({
            "user_id": b["user_id"], "t": b["ts"].cast(pa.int64()),
            "event_id": b["event_id"],
            "xm": pa.array(np.floor(lon * 1e6 + 0.5).astype(np.int64)),
            "ym": pa.array(np.floor(lat * 1e6 + 0.5).astype(np.int64))})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        x = d["xm"].to_numpy()
        y = d["ym"].to_numpy()
        seg = np.r_[False, u[1:] == u[:-1]]  # row k closes segment
        # (k-1, k); runs of segment rows inherit the user run id
        sx1, sy1 = np.roll(x, 1)[seg], np.roll(y, 1)[seg]
        sx2, sy2, su = x[seg], y[seg], u[seg]
        out: dict[int, int] = {}
        for ig, jg in _intra_run_pairs(su):
            keep = jg - ig >= 2  # non-adjacent (shared-endpoint pairs
            # are always improper anyway, but skip the work)
            ig, jg = ig[keep], jg[keep]
            ax1, ay1, ax2, ay2 = sx1[ig], sy1[ig], sx2[ig], sy2[ig]
            bx1, by1, bx2, by2 = sx1[jg], sy1[jg], sx2[jg], sy2[jg]
            d1 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
            d2 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
            d3 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)
            d4 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)
            cross = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) \
                & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
            if cross.any():
                t = pd.DataFrame({"u": su[jg][cross]}).groupby(
                    "u", sort=False).size()
                for k, v in t.items():
                    out[k] = out.get(k, 0) + int(v)
        return pd.DataFrame({"user_id": np.fromiter(out, np.int64),
                             "n_cross": np.fromiter(out.values(),
                                                    np.int64)})

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"]
               ).map_batches(prep, batch_format="pyarrow")
    return keyed_scan(ds, "user_id", ["t", "event_id"], fn,
                      n_rows=_nrows(sf_dir, "events"))


def q_self_crossings_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        "WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        f"CAST(floor({lon} * 1e6 + 0.5) AS BIGINT) AS xm, "
        f"CAST(floor({lat} * 1e6 + 0.5) AS BIGINT) AS ym FROM events), "
        "s AS (SELECT user_id, "
        "row_number() OVER w AS seq, "
        "lag(xm) OVER w AS x1, lag(ym) OVER w AS y1, "
        "xm AS x2, ym AS y2 FROM p "
        "WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), "
        "seg AS (SELECT * FROM s WHERE x1 IS NOT NULL), "
        "x AS (SELECT a.user_id, "
        "(a.x2 - a.x1) * (b.y1 - a.y1) - (a.y2 - a.y1) * (b.x1 - a.x1) "
        "AS d1, "
        "(a.x2 - a.x1) * (b.y2 - a.y1) - (a.y2 - a.y1) * (b.x2 - a.x1) "
        "AS d2, "
        "(b.x2 - b.x1) * (a.y1 - b.y1) - (b.y2 - b.y1) * (a.x1 - b.x1) "
        "AS d3, "
        "(b.x2 - b.x1) * (a.y2 - b.y1) - (b.y2 - b.y1) * (a.x2 - b.x1) "
        "AS d4 "
        "FROM seg a JOIN seg b ON a.user_id = b.user_id "
        "AND b.seq >= a.seq + 2) "
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_cross FROM x "
        "WHERE ((d1 > 0 AND d2 < 0) OR (d1 < 0 AND d2 > 0)) "
        "AND ((d3 > 0 AND d4 < 0) OR (d3 < 0 AND d4 > 0)) "
        "GROUP BY 1"
    )


def q_haversine_legs(sf_dir: str):
    """Per-user total great-circle travel distance: consecutive hops
    (ordered by ts, event_id) through the haversine formula, each hop
    pinned to millimetre ints via floor(d·1e3 + 0.5) BEFORE the sum so
    the distributed total is exact-integer (the house transcendental
    protocol — float sums never cross an aggregate).  keyed_scan
    co-partitions users; hops and sums are one vectorized pass per
    bucket."""
    from .stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "lat": pa.array(lat), "lon": pa.array(lon)})

    C = np.pi / 180.0
    R2 = 2.0 * 6371000.0

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        phi = d["lat"].to_numpy() * C
        lam = d["lon"].to_numpy() * C
        hop = np.r_[False, u[1:] == u[:-1]]
        p1, p2 = np.roll(phi, 1)[hop], phi[hop]
        l1, l2 = np.roll(lam, 1)[hop], lam[hop]
        sp = np.sin((p2 - p1) / 2.0)
        sl = np.sin((l2 - l1) / 2.0)
        h = sp * sp + np.cos(p1) * np.cos(p2) * (sl * sl)
        dist = R2 * np.arcsin(np.minimum(1.0, np.sqrt(h)))
        mm = np.floor(dist * 1e3 + 0.5).astype(np.int64)
        g = pd.DataFrame({"user_id": u[hop], "total_mm": mm}).groupby(
            "user_id", sort=False, as_index=False)["total_mm"].sum()
        g["total_mm"] = g["total_mm"].astype(np.int64)
        return g

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"]
               ).map_batches(prep, batch_format="pyarrow")
    return keyed_scan(ds, "user_id", ["t", "event_id"], fn,
                      n_rows=_nrows(sf_dir, "events"))


def q_haversine_legs_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        "WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        f"{lat} * (pi() / 180.0) AS phi, "
        f"{lon} * (pi() / 180.0) AS lam FROM events), "
        "s AS (SELECT user_id, phi, lam, "
        "lag(phi) OVER w AS p1, lag(lam) OVER w AS l1 FROM p "
        "WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), "
        "h AS (SELECT user_id, "
        "sin((phi - p1) / 2.0) * sin((phi - p1) / 2.0) "
        "+ cos(p1) * cos(phi) * "
        "(sin((lam - l1) / 2.0) * sin((lam - l1) / 2.0)) AS hv "
        "FROM s WHERE p1 IS NOT NULL) "
        "SELECT user_id, CAST(sum(CAST(floor("
        "2.0 * 6371000.0 * asin(least(1.0, sqrt(hv))) * 1e3 + 0.5) "
        "AS BIGINT)) AS BIGINT) AS total_mm FROM h GROUP BY 1"
    )


_RIPLEY_EPS = 1.0


def q_pair_dist_hist(sf_dir: str):
    """Ripley-K-style pair-distance histogram: every unordered event
    pair within ε = 1° (PBSM radius self-join — only grid neighbors
    ever meet, no all-pairs) binned by floor(d²·10/ε²); the ≤ 11-key
    bin space merges on the combiner tree.  Pair distances recompute
    from the ids inside the binning map (derive_latlon is pure), so
    the join output stays ids-only."""
    import pyarrow.compute as pc

    from .stages.agg_tree import tree_aggregate_to_table
    from .stages.spatial_join import point_radius_join

    def pts(b: pa.Table) -> pa.Table:
        k = b["event_id"].to_numpy(zero_copy_only=False)
        lat, lon = derive_latlon(k)
        return pa.table({"id": pa.array(k), "x": pa.array(lon),
                         "y": pa.array(lat)})

    a = _read(sf_dir, "events", ["event_id"]).map_batches(
        pts, batch_format="pyarrow")
    b = _read(sf_dir, "events", ["event_id"]).map_batches(
        pts, batch_format="pyarrow")
    pairs = point_radius_join(a, b, radius=_RIPLEY_EPS, cell=8.0,
                              out_a="u", out_b="v")

    def bins(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["u"], t["v"]))
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        ya, xa = derive_latlon(u)
        yb, xb = derive_latlon(v)
        d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
        bin_ = np.floor(d2 * 10.0 / (_RIPLEY_EPS * _RIPLEY_EPS)
                        ).astype(np.int64)
        c = pa.table({"bin": pa.array(bin_),
                      "n_pairs": pa.array(np.ones(len(bin_), np.int64))})
        return (c.group_by(["bin"]).aggregate([("n_pairs", "sum")])
                 .rename_columns(["bin", "n_pairs"]))

    return tree_aggregate_to_table(
        pairs.map_batches(bins, batch_format="pyarrow"),
        ["bin"], [("n_pairs", "sum")])


def q_pair_dist_hist_sql() -> str:
    lat, lon = latlon_sql("event_id")
    e2 = _RIPLEY_EPS * _RIPLEY_EPS
    return (
        f"WITH p AS (SELECT event_id AS id, {lon} AS x, {lat} AS y "
        "FROM events), "
        "d AS (SELECT (a.x - b.x) * (a.x - b.x) + "
        "(a.y - b.y) * (a.y - b.y) AS d2 FROM p a JOIN p b "
        "ON a.id < b.id AND (a.x - b.x) * (a.x - b.x) + "
        f"(a.y - b.y) * (a.y - b.y) <= {e2}) "
        f"SELECT CAST(floor(d2 * 10.0 / {e2}) AS BIGINT) AS bin, "
        "CAST(count(*) AS BIGINT) AS n_pairs FROM d GROUP BY 1"
    )


def q_bbox_extent(sf_dir: str):
    """Per-user bounding box (ST_Extent shape) in exact microdegree
    ints plus the box area: per-batch Arrow group_by pre-reduces each
    block to one row per (block, user) — the combiner — then ONE
    coarse hash exchange on user_id finishes the global min/max.  The
    event stream never shuffles."""
    from .stages.scan import hash_bucket_scan

    def partial(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        t = pa.table({
            "user_id": b["user_id"],
            "xm": pa.array(np.floor(lon * 1e6 + 0.5).astype(np.int64)),
            "ym": pa.array(np.floor(lat * 1e6 + 0.5).astype(np.int64))})
        return (t.group_by(["user_id"]).aggregate(
            [("xm", "min"), ("xm", "max"), ("ym", "min"), ("ym", "max")])
            .rename_columns(["user_id", "x_min", "x_max",
                             "y_min", "y_max"]))

    ds = _read(sf_dir, "events", ["event_id", "user_id"]).map_batches(
        partial, batch_format="pyarrow")

    def final(t: pa.Table) -> pa.Table:
        g = (t.group_by(["user_id"]).aggregate(
            [("x_min", "min"), ("x_max", "max"),
             ("y_min", "min"), ("y_max", "max")])
            .rename_columns(["user_id", "x_min", "x_max",
                             "y_min", "y_max"]))
        area = ((g["x_max"].to_numpy() - g["x_min"].to_numpy())
                * (g["y_max"].to_numpy() - g["y_min"].to_numpy()))
        return g.append_column("area_u2", pa.array(area, pa.int64()))

    return hash_bucket_scan(ds, ["user_id"], final)


def q_bbox_extent_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        "WITH p AS (SELECT user_id, "
        f"CAST(floor({lon} * 1e6 + 0.5) AS BIGINT) AS xm, "
        f"CAST(floor({lat} * 1e6 + 0.5) AS BIGINT) AS ym FROM events) "
        "SELECT user_id, min(xm) AS x_min, max(xm) AS x_max, "
        "min(ym) AS y_min, max(ym) AS y_max, "
        "(max(xm) - min(xm)) * (max(ym) - min(ym)) AS area_u2 "
        "FROM p GROUP BY 1"
    )


_CHECKSUM_K = 300  # first K fixture images; covers all 15 (side,fmt)
# combos 20×.  K is a constant (not scale-derived) so the oracle SQL —
# which regenerates the pixels from the fixture's closed-form generator
# (fixtures.py::_gen_pixels) — is identical at every sf.


def q_image_checksum(sf_dir: str):
    """End-to-end hash verification of the IMAGE DECODE PATH: decode
    the first K fixture images (real from-spec PNG + the deterministic
    SKWJ/SKWW fake-lossy stubs — functions/image_codec.py) inside
    ``map_batches`` and emit each image's exact int64 pixel sum.  The
    DuckDB oracle never sees the bytes: it regenerates every pixel
    from the fixture's closed-form generator (fixtures.py::_gen_pixels
    — int64-wraparound noise replayed in HUGEINT) and applies the
    fake-lossy quantization ``p//4*4+2`` in SQL, so a single flipped
    byte anywhere in encode → parquet → Arrow → decode mismatches.

    Scale shape: the decode stage is the real per-batch kernel used by
    image_features/image_pyramid (bytes stay inside the task, only
    (id, fmt, sum) rows come out); the head-K filter is just what
    makes a fixed SQL oracle possible.  Valid at smoke/correctness
    scales (max_side=64); the bench fixture downsizes max_side to 16,
    where only the timing (never the hash) is used."""
    import ray.data

    from .fixtures import ensure_images_parquet, scale_for_sf_dir
    from .functions.image_codec import decode_image

    import pyarrow.dataset as pds

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    # row filter pushed to the parquet read: row groups whose
    # image_id stats exceed K never ship their bytes
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)

    def sums(b: pa.Table) -> pa.Table:
        blobs = b["bytes"].to_pylist()
        fmts = b["fmt"].to_pylist()
        out = np.empty(len(blobs), np.int64)
        for i in range(len(blobs)):  # variable-size payloads: the
            # per-row loop is the decode itself (module docstring)
            out[i] = decode_image(blobs[i], fmts[i]).astype(np.int64).sum()
        return pa.table({"image_id": b["image_id"], "fmt": b["fmt"],
                         "pixel_sum": pa.array(out)})

    return ds.map_batches(sums, batch_format="pyarrow", batch_size=128)


def q_image_checksum_sql() -> str:
    # pixel formula mirror of fixtures.py::_gen_pixels: the noise
    # term's int64 wraparound is replayed exactly via HUGEINT mod 2^64
    # (numpy's arithmetic >>16 then floored %32 equals bits 16..20 of
    # the unsigned wrap, all-positive here)
    return (
        "WITH imgs AS (SELECT CAST(i AS BIGINT) AS i, "
        "CASE i % 5 WHEN 0 THEN 16 WHEN 1 THEN 24 WHEN 2 THEN 32 "
        "WHEN 3 THEN 48 ELSE 64 END AS side, "
        "CASE i % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' "
        "ELSE 'webp' END AS fmt "
        f"FROM range({_CHECKSUM_K}) t(i)), "
        "px AS (SELECT i, fmt, "
        "((x*3 + y*5 + c*11 + (i*37) % 256 + "
        "CAST((((CAST(i AS HUGEINT)*2654435761 + (y*side+x)*97 + c*131)"
        " * 1103515245) % 18446744073709551616) // 65536 % 32 "
        "AS BIGINT)) % 256) AS raw "
        "FROM imgs "
        "JOIN range(64) tx(x) ON tx.x < imgs.side "
        "JOIN range(64) ty(y) ON ty.y < imgs.side "
        "CROSS JOIN range(3) tc(c)) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        " fmt, CAST(SUM(CASE WHEN fmt = 'png' THEN raw "
        "ELSE raw // 4 * 4 + 2 END) AS BIGINT) AS pixel_sum "
        "FROM px GROUP BY 1, 2"
    )


_THUMB_SIDE = 8


def q_thumb_checksum(sf_dir: str):
    """Hash verification of the RESIZE + RE-ENCODE path: run the real
    ``ImageResize`` stage (decode → nearest-neighbor resize to 8×8
    → PNG re-encode, stages/multimodal.py:63) over the first K fixture
    images, then decode each emitted thumb and report its exact int64
    pixel sum.  The oracle replays the nearest-neighbor index map
    ``src = dst*side//8`` on the closed-form pixel generator in SQL —
    pinning the resize kernel AND the PNG encoder round-trip (a lossy
    or shifted thumb mismatches).  Same head-K / scale caveats as
    image_checksum."""
    import pyarrow.dataset as pds
    import ray.data

    from .fixtures import ensure_images_parquet, scale_for_sf_dir
    from .functions.image_codec import decode_png
    from .stages.multimodal import ImageResize

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)
    thumbs = ds.map_batches(ImageResize(side=_THUMB_SIDE),
                            batch_format="pyarrow", batch_size=128)

    def sums(b: pa.Table) -> pa.Table:
        blobs = b["thumb"].to_pylist()
        out = np.empty(len(blobs), np.int64)
        for i, blob in enumerate(blobs):
            out[i] = decode_png(blob).astype(np.int64).sum()
        return pa.table({"image_id": b["image_id"],
                         "thumb_sum": pa.array(out)})

    return thumbs.map_batches(sums, batch_format="pyarrow", batch_size=256)


def q_thumb_checksum_sql() -> str:
    s = _THUMB_SIDE
    return (
        "WITH imgs AS (SELECT CAST(i AS BIGINT) AS i, "
        "CASE i % 5 WHEN 0 THEN 16 WHEN 1 THEN 24 WHEN 2 THEN 32 "
        "WHEN 3 THEN 48 ELSE 64 END AS side, "
        "CASE i % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' "
        "ELSE 'webp' END AS fmt "
        f"FROM range({_CHECKSUM_K}) t(i)), "
        # nearest-neighbor source coords, then the generator replay
        "px AS (SELECT i, fmt, "
        "(dx.d * side) // " + str(s) + " AS x, "
        "(dy.d * side) // " + str(s) + " AS y, tc.c AS c, side "
        f"FROM imgs CROSS JOIN range({s}) dx(d) "
        f"CROSS JOIN range({s}) dy(d) CROSS JOIN range(3) tc(c)), "
        "v AS (SELECT i, fmt, "
        "((x*3 + y*5 + c*11 + (i*37) % 256 + "
        "CAST((((CAST(i AS HUGEINT)*2654435761 + (y*side+x)*97 + c*131)"
        " * 1103515245) % 18446744073709551616) // 65536 % 32 "
        "AS BIGINT)) % 256) AS raw FROM px) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        " CAST(SUM(CASE WHEN fmt = 'png' THEN raw "
        "ELSE raw // 4 * 4 + 2 END) AS BIGINT) AS thumb_sum "
        "FROM v GROUP BY 1"
    )


# shared SQL fragment: decoded-luma table (i, x, y, luma) for the
# first K fixture images — generator replay (see q_image_checksum_sql)
# → per-channel fake-lossy quantization → integer luma (77R+150G+29B)>>8
def _luma_table_sql(k: int) -> str:
    def raw(c: str) -> str:
        return ("((x*3 + y*5 + " + c + "*11 + (i*37) % 256 + "
                "CAST((((CAST(i AS HUGEINT)*2654435761 + (y*side+x)*97 "
                "+ " + c + "*131) * 1103515245) % 18446744073709551616)"
                " // 65536 % 32 AS BIGINT)) % 256)")

    def chan(c: str) -> str:
        return (f"(CASE WHEN fmt = 'png' THEN {raw(c)} "
                f"ELSE {raw(c)} // 4 * 4 + 2 END)")

    return (
        "imgs AS (SELECT CAST(i AS BIGINT) AS i, "
        "CASE i % 5 WHEN 0 THEN 16 WHEN 1 THEN 24 WHEN 2 THEN 32 "
        "WHEN 3 THEN 48 ELSE 64 END AS side, "
        "CASE i % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' "
        "ELSE 'webp' END AS fmt "
        f"FROM range({k}) t(i)), "
        "lum AS (SELECT i, side, x, y, "
        f"(77 * {chan('0')} + 150 * {chan('1')} + 29 * {chan('2')}) "
        "// 256 AS l "
        "FROM imgs "
        "JOIN range(64) tx(x) ON tx.x < imgs.side "
        "JOIN range(64) ty(y) ON ty.y < imgs.side)"
    )


def q_blur_checksum(sf_dir: str):
    """Hash verification of the BLUR-SCORE path: the real
    ``ImageBlurScore`` stage (decode → integer luma → 4-neighbour
    Laplacian → exact-int variance numerator n·Σl²−(Σl)²,
    stages/multimodal.py:232) over the first K fixture images.  The
    oracle rebuilds the decoded-luma plane from the pixel generator in
    SQL and takes the Laplacian via four neighbor equijoins — any
    drift in decode, luma weights, or interior handling mismatches.
    Same head-K / scale caveats as image_checksum."""
    import pyarrow.dataset as pds
    import ray.data

    from .fixtures import ensure_images_parquet, scale_for_sf_dir
    from .stages.multimodal import ImageBlurScore

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)
    return ds.map_batches(ImageBlurScore, batch_format="pyarrow",
                          batch_size=128, concurrency=2)


def q_blur_checksum_sql() -> str:
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "lap AS (SELECT c.i, "
        "4 * c.l - u.l - d.l - lf.l - rt.l AS v "
        "FROM lum c "
        "JOIN lum u ON u.i = c.i AND u.x = c.x AND u.y = c.y - 1 "
        "JOIN lum d ON d.i = c.i AND d.x = c.x AND d.y = c.y + 1 "
        "JOIN lum lf ON lf.i = c.i AND lf.x = c.x - 1 AND lf.y = c.y "
        "JOIN lum rt ON rt.i = c.i AND rt.x = c.x + 1 AND rt.y = c.y "
        "WHERE c.x BETWEEN 1 AND c.side - 2 "
        "AND c.y BETWEEN 1 AND c.side - 2) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        " CAST(count(*) * CAST(sum(v * v) AS BIGINT) "
        "- CAST(sum(v) AS BIGINT) * CAST(sum(v) AS BIGINT) AS BIGINT) "
        "AS lap_var_num, CAST(count(*) AS BIGINT) AS lap_n "
        "FROM lap GROUP BY 1"
    )


_PATCH_P = 16


def q_patch_checksum(sf_dir: str):
    """Hash verification of the PATCHIFY path: the real
    ``ImagePatchify`` stage (decode → non-overlapping 16×16 patch grid
    → exact-int mean luma per patch, stages/multimodal.py:139) over
    the first K fixture images, returning the (image, patch_y,
    patch_x, mean_luma) manifest (the binary patch buffers stay inside
    the pipeline, as in production).  The oracle groups the replayed
    luma plane by floor-grid patch coordinates — the floor-crop of
    non-divisible sides (24 → one 16×16 patch) is pinned too."""
    import pyarrow.dataset as pds
    import ray.data

    from .fixtures import ensure_images_parquet, scale_for_sf_dir
    from .stages.multimodal import ImagePatchify

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)
    patches = ds.map_batches(ImagePatchify(patch=_PATCH_P),
                             batch_format="pyarrow", batch_size=64)

    def manifest(b: pa.Table) -> pa.Table:
        return pa.table({
            "image_id": b["image_id"],
            "patch_y": b["patch_y"].cast(pa.int64()),
            "patch_x": b["patch_x"].cast(pa.int64()),
            "mean_luma": b["mean_luma"]})

    return patches.map_batches(manifest, batch_format="pyarrow")


def q_patch_checksum_sql() -> str:
    p = _PATCH_P
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + " "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        f" y // {p} AS patch_y, x // {p} AS patch_x, "
        f"CAST(sum(l) AS BIGINT) // {p * p} AS mean_luma "
        f"FROM lum WHERE x < (side // {p}) * {p} "
        f"AND y < (side // {p}) * {p} "
        "GROUP BY 1, 2, 3"
    )


def q_dhash_checksum(sf_dir: str):
    """Hash verification of the PERCEPTUAL-HASH path: the real
    ``PerceptualHash`` stage (decode → float luma → 8×9 nearest-
    neighbor sample → horizontal-gradient dHash bit pack,
    stages/multimodal.py:198, functions/phash.py:53) over the first K
    fixture images.  dHash is float-exact across SQL/numpy because it
    never averages — each sampled luma is one (r·0.299 + g·0.587 +
    b·0.114) expression evaluated identically on both sides, and bits
    are strict comparisons of those exact doubles.  (aHash is NOT
    oracle-pinned: numpy's mean uses pairwise summation whose order
    SQL cannot replicate; it stays covered by kernel tests.)  The
    64-bit pack is replayed in HUGEINT and wrapped to signed int64."""
    import pyarrow.dataset as pds
    import ray.data

    from .fixtures import ensure_images_parquet, scale_for_sf_dir
    from .stages.multimodal import PerceptualHash

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)
    hashes = ds.map_batches(PerceptualHash, batch_format="pyarrow",
                            batch_size=128, concurrency=2)
    return hashes.map_batches(
        lambda t: t.select(["image_id", "dhash64"]),
        batch_format="pyarrow")


def q_dhash_checksum_sql() -> str:
    def raw(c: str, xe: str, ye: str) -> str:
        return (f"(({xe}*3 + {ye}*5 + {c}*11 + (i*37) % 256 + "
                "CAST((((CAST(i AS HUGEINT)*2654435761 + "
                f"(({ye})*side+({xe}))*97 + {c}*131) * 1103515245) "
                "% 18446744073709551616) // 65536 % 32 AS BIGINT)) "
                "% 256)")

    def chan(c: str, xe: str, ye: str) -> str:
        r = raw(c, xe, ye)
        return f"(CASE WHEN fmt = 'png' THEN {r} ELSE {r} // 4 * 4 + 2 END)"

    def luma(xe: str, ye: str) -> str:
        return (f"({chan('0', xe, ye)} * 0.299 + "
                f"{chan('1', xe, ye)} * 0.587 + "
                f"{chan('2', xe, ye)} * 0.114)")

    # sample coords: row sy = gy*side//8; bit column pair uses the 8x9
    # grid's x(j) = j*side//9 with bit gx comparing j = gx+1 vs gx
    l2 = luma("((gx + 1) * side) // 9", "(gy * side) // 8")
    l1 = luma("(gx * side) // 9", "(gy * side) // 8")
    return (
        "WITH imgs AS (SELECT CAST(i AS BIGINT) AS i, "
        "CASE i % 5 WHEN 0 THEN 16 WHEN 1 THEN 24 WHEN 2 THEN 32 "
        "WHEN 3 THEN 48 ELSE 64 END AS side, "
        "CASE i % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' "
        "ELSE 'webp' END AS fmt "
        f"FROM range({_CHECKSUM_K}) t(i)), "
        "bits AS (SELECT i, gy, gx, "
        f"CASE WHEN {l2} > {l1} THEN 1 ELSE 0 END AS b "
        "FROM imgs CROSS JOIN range(8) ty(gy) CROSS JOIN range(8) "
        "tx(gx)), "
        "packed AS (SELECT i, sum(CASE WHEN b = 1 THEN "
        "CAST(1 AS HUGEINT) << CAST(gy * 8 + gx AS INTEGER) "
        "ELSE 0 END) AS h FROM bits GROUP BY 1) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        " CAST(h - CASE WHEN h >= 9223372036854775808 "
        "THEN 18446744073709551616 ELSE 0 END AS BIGINT) AS dhash64 "
        "FROM packed"
    )


_COLOC_EPS = 1.0


def q_colocation(sf_dir: str):
    """Spatial co-location mining: counts of unordered event-TYPE
    pairs whose instances fall within ε = 1° of each other (the
    classic co-location pattern-count).  The PBSM radius self-join
    emits id pairs only; event types attach as INT codes through two
    chained vertex-state exchanges (stages/graph: the pair stream
    keyed by u picks up u's type code bucket-locally and re-keys
    itself by v, where v's code attaches and the bounded (code,
    code) partial counts are emitted in-bucket) — half the exchange
    volume of the former two copart string joins, and only bounded
    partials leave the second exchange.  Codes are vocabulary-rank
    ints (the type space is bounded), so canonical min/max on codes
    equals the string ordering; the bounded type-pair space merges on
    the combiner tree and decodes at the end."""
    import pyarrow.compute as pc

    from .stages.agg_tree import tree_aggregate_to_table
    from .stages.graph import edge_state_messages
    from .stages.spatial_join import point_radius_join

    def pts(b: pa.Table) -> pa.Table:
        k = b["event_id"].to_numpy(zero_copy_only=False)
        lat, lon = derive_latlon(k)
        return pa.table({"id": pa.array(k), "x": pa.array(lon),
                         "y": pa.array(lat)})

    a = _read(sf_dir, "events", ["event_id"]).map_batches(
        pts, batch_format="pyarrow")
    b = _read(sf_dir, "events", ["event_id"]).map_batches(
        pts, batch_format="pyarrow")
    pairs = point_radius_join(a, b, radius=_COLOC_EPS, cell=8.0,
                              out_a="u", out_b="v").map_batches(
        lambda t: t.filter(pc.less(t["u"], t["v"])),
        batch_format="pyarrow").materialize()  # ids only; counted
    # below so the exchanges size buckets without re-running the PBSM
    n_p = pairs.count()
    n = _nrows(sf_dir, "events")

    # bounded vocabulary (per-block distinct partials, driver-merged),
    # sorted so code order == string order
    vt = _read(sf_dir, "events", ["event_type"]).map_batches(
        lambda t: pa.table({"event_type": pc.unique(
            t["event_type"].combine_chunks())}),
        batch_format="pyarrow").to_pandas()
    vocab = np.sort(vt["event_type"].unique().astype("U"))

    def to_codes(t: pa.Table) -> pa.Table:
        ty = t["event_type"].to_numpy(zero_copy_only=False).astype("U")
        return pa.table({
            "node": t["event_id"].combine_chunks().cast(pa.int64()),
            "val": pa.array(np.searchsorted(vocab, ty), pa.int64())})

    tstate = _read(sf_dir, "events",
                   ["event_id", "event_type"]).map_batches(
        to_codes, batch_format="pyarrow")

    def attach_u(ek, pays, lookup):
        tu, _ = lookup(ek, default=0)
        return pa.table({"v": pa.array(pays["v"], pa.int64()),
                         "tu": pa.array(tu, pa.int64())})

    def attach_v_count(ek, pays, lookup):
        tv, _ = lookup(ek, default=0)
        tu = pays["tu"]
        c = pa.table({
            "ca": pa.array(np.minimum(tu, tv), pa.int64()),
            "cb": pa.array(np.maximum(tu, tv), pa.int64()),
            "n_pairs": pa.array(np.ones(len(tu), np.int64))})
        return (c.group_by(["ca", "cb"])
                .aggregate([("n_pairs", "sum")])
                .rename_columns(["ca", "cb", "n_pairs"]))

    part = edge_state_messages(
        edge_state_messages(pairs, tstate, "u", ["v"], attach_u,
                            n_rows=n_p + n),
        tstate, "v", ["tu"], attach_v_count, n_rows=n_p + n)
    agg = tree_aggregate_to_table(
        part, ["ca", "cb"], [("n_pairs", "sum")])
    return pa.table({
        "type_a": pa.array(
            vocab[agg["ca"].to_numpy(zero_copy_only=False)]),
        "type_b": pa.array(
            vocab[agg["cb"].to_numpy(zero_copy_only=False)]),
        "n_pairs": agg["n_pairs"]})


def q_colocation_sql() -> str:
    lat, lon = latlon_sql("event_id")
    e2 = _COLOC_EPS * _COLOC_EPS
    return (
        f"WITH p AS (SELECT event_id AS id, {lon} AS x, {lat} AS y "
        "FROM events), "
        "e AS (SELECT a.id AS u, b.id AS v FROM p a JOIN p b "
        "ON a.id < b.id AND (a.x - b.x) * (a.x - b.x) + "
        f"(a.y - b.y) * (a.y - b.y) <= {e2}), "
        "t AS (SELECT ea.event_type AS tu, eb.event_type AS tv FROM e "
        "JOIN events ea ON ea.event_id = e.u "
        "JOIN events eb ON eb.event_id = e.v) "
        "SELECT least(tu, tv) AS type_a, greatest(tu, tv) AS type_b, "
        "CAST(count(*) AS BIGINT) AS n_pairs FROM t GROUP BY 1, 2"
    )


def q_repetition_ratio(sf_dir: str):
    """Per-document repetition scoring (the dedup-adjacent quality
    signal: boilerplate/spam has a dominant repeated n-gram): most
    frequent word-3-gram count over total 3-grams, as exact
    parts-per-million ints (``max·1e6 // n3`` — no floats anywhere).
    Tokenization is the house ``[A-Za-z0-9]+`` regex (same as
    token_count); everything is doc-local, so the stage is a pure
    map_batches — no shuffle at any scale.  Docs with < 3 tokens emit
    nothing (no 3-grams), matching the SQL join shape."""
    import re

    pat = re.compile(r"[A-Za-z0-9]+")

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        ids, ppm = [], []
        for did, text in zip(batch["doc_id"], batch["text"]):
            toks = pat.findall(text)
            n3 = len(toks) - 2
            if n3 < 1:
                continue
            c = Counter(" ".join(toks[k:k + 3]) for k in range(n3))
            ids.append(did)
            ppm.append(max(c.values()) * 1_000_000 // n3)
        return pd.DataFrame({"doc_id": np.array(ids, np.int64),
                             "rep_ppm": np.array(ppm, np.int64)})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pandas")


def q_repetition_ratio_sql() -> str:
    return (
        "WITH toks AS (SELECT doc_id, "
        "unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS tok, "
        "unnest(range(1, length(regexp_extract_all(text, "
        "'[A-Za-z0-9]+')) + 1)) AS pos FROM documents), "
        "g AS (SELECT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok "
        "AS g3 FROM toks a "
        "JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 "
        "JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2), "
        "cnt AS (SELECT doc_id, g3, count(*) AS c FROM g GROUP BY 1, 2) "
        "SELECT doc_id, CAST(max(c) * 1000000 // sum(c) AS BIGINT) "
        "AS rep_ppm FROM cnt GROUP BY 1"
    )


def q_grad_energy(sf_dir: str):
    """Hash verification of a TOTAL-VARIATION energy score (the
    edge-density quality signal of image curation): decode → integer
    luma → Σ|∂x| + Σ|∂y| over the luma plane, exact int64.  Oracle =
    luma-plane replay + two neighbor equijoins.  Same head-K / scale
    caveats as image_checksum."""
    import pyarrow.dataset as pds
    import ray.data

    from .fixtures import ensure_images_parquet, scale_for_sf_dir
    from .functions.image_codec import decode_image

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)

    def tv(b: pa.Table) -> pa.Table:
        blobs = b["bytes"].to_pylist()
        fmts = b["fmt"].to_pylist()
        out = np.empty(len(blobs), np.int64)
        for i in range(len(blobs)):
            img = decode_image(blobs[i], fmts[i]).astype(np.int64)
            y = (77 * img[:, :, 0] + 150 * img[:, :, 1]
                 + 29 * img[:, :, 2]) >> 8
            out[i] = (np.abs(y[:, 1:] - y[:, :-1]).sum()
                      + np.abs(y[1:, :] - y[:-1, :]).sum())
        return pa.table({"image_id": b["image_id"],
                         "tv_energy": pa.array(out)})

    return ds.map_batches(tv, batch_format="pyarrow", batch_size=128)


def q_grad_energy_sql() -> str:
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "dx AS (SELECT c.i, abs(r.l - c.l) AS v FROM lum c "
        "JOIN lum r ON r.i = c.i AND r.y = c.y AND r.x = c.x + 1), "
        "dy AS (SELECT c.i, abs(d.l - c.l) AS v FROM lum c "
        "JOIN lum d ON d.i = c.i AND d.x = c.x AND d.y = c.y + 1), "
        "u AS (SELECT i, v FROM dx UNION ALL SELECT i, v FROM dy) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        " CAST(sum(v) AS BIGINT) AS tv_energy FROM u GROUP BY 1"
    )


def q_scatter_orientation(sf_dir: str):
    """Per-cell point-scatter principal orientation (anisotropy — the
    directional-trend spatial statistic): for each 15° grid cell, the
    covariance eigen-direction ``atan2(2·Mxy, Mxx − Myy) → micro-int``
    from EXACT integer central moments.  Per-batch Arrow group_by
    pre-reduces each block to per-cell int sums (n, Σx, Σy, Σx², Σy²,
    Σxy over millidegree offsets from the cell origin — shift-
    invariant for central moments and keeps n·Σx² < 2^63 up to ~2e5
    points/cell; beyond that, split cells or carry Welford partials);
    the bounded 24×8 cell space merges on the combiner tree and one
    double atan2 per cell runs on the driver.  Events never shuffle."""
    from .stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        cx = np.floor((lon + 180.0) / 15.0).astype(np.int64)
        cy = np.floor((lat + 60.0) / 15.0).astype(np.int64)
        xm = np.floor(lon * 1e3 + 0.5).astype(np.int64) \
            - (cx * 15000 - 180000)
        ym = np.floor(lat * 1e3 + 0.5).astype(np.int64) \
            - (cy * 15000 - 60000)
        t = pa.table({
            "cx": pa.array(cx), "cy": pa.array(cy),
            "n": pa.array(np.ones(len(xm), np.int64)),
            "sx": pa.array(xm), "sy": pa.array(ym),
            "sxx": pa.array(xm * xm), "syy": pa.array(ym * ym),
            "sxy": pa.array(xm * ym)})
        return (t.group_by(["cx", "cy"]).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")])
            .rename_columns(["cx", "cy", "n", "sx", "sy",
                             "sxx", "syy", "sxy"]))

    ds = _read(sf_dir, "events", ["event_id"]).map_batches(
        partial, batch_format="pyarrow")
    m = tree_aggregate_to_table(
        ds, ["cx", "cy"],
        [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
         ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")]).to_pandas()
    m = m[m["n"] >= 2]
    n = m["n"].to_numpy()
    mxy = n * m["sxy"].to_numpy() - m["sx"].to_numpy() * m["sy"].to_numpy()
    mxx = n * m["sxx"].to_numpy() - m["sx"].to_numpy() ** 2
    myy = n * m["syy"].to_numpy() - m["sy"].to_numpy() ** 2
    theta = np.arctan2(2.0 * mxy.astype(np.float64),
                       (mxx - myy).astype(np.float64))
    return pd.DataFrame({
        "cx": m["cx"].to_numpy().astype(np.int64),
        "cy": m["cy"].to_numpy().astype(np.int64),
        "n": n.astype(np.int64),
        "theta_micro": np.floor(theta * 1e6 + 0.5).astype(np.int64)})


def q_scatter_orientation_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        "WITH p AS (SELECT "
        f"CAST(floor(({lon} + 180.0) / 15.0) AS BIGINT) AS cx, "
        f"CAST(floor(({lat} + 60.0) / 15.0) AS BIGINT) AS cy, "
        f"CAST(floor({lon} * 1e3 + 0.5) AS BIGINT) AS xm, "
        f"CAST(floor({lat} * 1e3 + 0.5) AS BIGINT) AS ym "
        "FROM events), "
        "c AS (SELECT cx, cy, xm - (cx * 15000 - 180000) AS dx, "
        "ym - (cy * 15000 - 60000) AS dy FROM p), "
        "s AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy, "
        "CAST(sum(dx * dx) AS BIGINT) AS sxx, "
        "CAST(sum(dy * dy) AS BIGINT) AS syy, "
        "CAST(sum(dx * dy) AS BIGINT) AS sxy "
        "FROM c GROUP BY 1, 2) "
        "SELECT cx, cy, n, CAST(floor(atan2("
        "CAST(2 * (n * sxy - sx * sy) AS DOUBLE), "
        "CAST((n * sxx - sx * sx) - (n * syy - sy * sy) AS DOUBLE)) "
        "* 1e6 + 0.5) AS BIGINT) AS theta_micro FROM s WHERE n >= 2"
    )


_BUFFER_D = 0.5


def q_border_buffer(sf_dir: str):
    """Buffer-zone counts: events within 0.5° of each derived border
    segment (point-to-segment distance — projection parameter clamped
    to the segment, perpendicular case via cross²/len² in doubles with
    the identical expression order as the SQL CASE, so the comparison
    replays bit-for-bit).  The 25 segments are a broadcast constant;
    the whole query is one vectorized map over event batches (25-
    iteration fixed loop) plus the bounded combiner tree — the event
    stream never shuffles."""
    from .stages.agg_tree import tree_aggregate_to_table

    seg, axm, aym, bxm, bym = _border_segments(sf_dir)
    # microdegree segment endpoints → degree doubles (exact: ints
    # < 2^53), matching the SQL's x/1e6 derivation
    ax, ay = axm / 1e6, aym / 1e6
    bx, by = bxm / 1e6, bym / 1e6
    dd = _BUFFER_D * _BUFFER_D

    def partial(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        segs, cnts = [], []
        for i in range(len(seg)):
            dx, dy = bx[i] - ax[i], by[i] - ay[i]
            px, py = lon - ax[i], lat - ay[i]
            len2 = dx * dx + dy * dy
            tp = px * dx + py * dy
            qx, qy = lon - bx[i], lat - by[i]
            cross = px * dy - py * dx
            d2 = np.where(
                tp <= 0.0, px * px + py * py,
                np.where(tp >= len2, qx * qx + qy * qy,
                         cross * cross / len2))
            segs.append(seg[i])
            cnts.append(int(np.count_nonzero(d2 <= dd)))
        return pa.table({"seg": pa.array(np.array(segs, np.int64)),
                         "n_in": pa.array(np.array(cnts, np.int64))})

    ds = _read(sf_dir, "events", ["event_id"]).map_batches(
        partial, batch_format="pyarrow")
    return tree_aggregate_to_table(ds, ["seg"], [("n_in", "sum")])


def q_border_buffer_sql() -> str:
    lat, lon = latlon_sql("event_id")
    a_lat, a_lon = latlon_sql("(CAST(n_nationkey AS BIGINT) * 2 + 1001)")
    b_lat, b_lon = latlon_sql("(CAST(n_nationkey AS BIGINT) * 2 + 1002)")
    dd = _BUFFER_D * _BUFFER_D
    return (
        f"WITH p AS (SELECT {lon} AS x, {lat} AS y FROM events), "
        "g AS (SELECT CAST(n_nationkey AS BIGINT) AS seg, "
        f"CAST(floor({a_lon} * 1000000 + 0.5) AS BIGINT) / 1e6 AS ax, "
        f"CAST(floor({a_lat} * 1000000 + 0.5) AS BIGINT) / 1e6 AS ay, "
        f"CAST(floor({b_lon} * 1000000 + 0.5) AS BIGINT) / 1e6 AS bx, "
        f"CAST(floor({b_lat} * 1000000 + 0.5) AS BIGINT) / 1e6 AS by "
        "FROM nation), "
        "d AS (SELECT g.seg, CASE "
        "WHEN (p.x - g.ax) * (g.bx - g.ax) + (p.y - g.ay) * "
        "(g.by - g.ay) <= 0.0 THEN "
        "(p.x - g.ax) * (p.x - g.ax) + (p.y - g.ay) * (p.y - g.ay) "
        "WHEN (p.x - g.ax) * (g.bx - g.ax) + (p.y - g.ay) * "
        "(g.by - g.ay) >= (g.bx - g.ax) * (g.bx - g.ax) + "
        "(g.by - g.ay) * (g.by - g.ay) THEN "
        "(p.x - g.bx) * (p.x - g.bx) + (p.y - g.by) * (p.y - g.by) "
        "ELSE ((p.x - g.ax) * (g.by - g.ay) - (p.y - g.ay) * "
        "(g.bx - g.ax)) * ((p.x - g.ax) * (g.by - g.ay) - "
        "(p.y - g.ay) * (g.bx - g.ax)) / ((g.bx - g.ax) * "
        "(g.bx - g.ax) + (g.by - g.ay) * (g.by - g.ay)) END AS d2 "
        "FROM p CROSS JOIN g) "
        f"SELECT seg, CAST(count(*) FILTER (d2 <= {dd}) AS BIGINT) "
        "AS n_in FROM d GROUP BY 1"
    )


def q_cell_transitions(sf_dir: str):
    """Markov cell-transition counts (sequence/mobility mining): each
    user's consecutive events (ordered by ts, event_id) emit a
    (from_cell → to_cell) edge on the 15° grid when the cell changes;
    users co-partition through the coarse keyed_scan and the bounded
    transition space merges on the combiner tree."""
    from .stages.agg_tree import tree_aggregate_to_table
    from .stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        cx = np.floor((lon + 180.0) / 15.0).astype(np.int64)
        cy = np.floor((lat + 60.0) / 15.0).astype(np.int64)
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "cell": pa.array(cy * 24 + cx)})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        c = d["cell"].to_numpy()
        step = np.r_[False, (u[1:] == u[:-1]) & (c[1:] != c[:-1])]
        g = (pd.DataFrame({"from_cell": np.roll(c, 1)[step],
                           "to_cell": c[step]})
             .groupby(["from_cell", "to_cell"], sort=False)
             .size().reset_index(name="n"))
        g["n"] = g["n"].astype(np.int64)
        return g

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"]
               ).map_batches(prep, batch_format="pyarrow")
    parts = keyed_scan(ds, "user_id", ["t", "event_id"], fn,
                       n_rows=_nrows(sf_dir, "events"))
    return tree_aggregate_to_table(
        parts, ["from_cell", "to_cell"], [("n", "sum")])


def q_cell_transitions_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        f"WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        f"CAST(floor(({lat} + 60.0) / 15.0) AS BIGINT) * 24 + "
        f"CAST(floor(({lon} + 180.0) / 15.0) AS BIGINT) AS cell "
        "FROM events), "
        "s AS (SELECT cell AS to_cell, lag(cell) OVER "
        "(PARTITION BY user_id ORDER BY t, event_id) AS from_cell "
        "FROM p) "
        "SELECT from_cell, to_cell, CAST(count(*) AS BIGINT) AS n "
        "FROM s WHERE from_cell IS NOT NULL AND from_cell <> to_cell "
        "GROUP BY 1, 2"
    )


def q_weighted_centroid(sf_dir: str):
    """Value-weighted centroid per 15° grid cell (the weighted-
    center-of-mass map shape): weights are exact cents ints
    (floor(value·100 + 0.5)), positions exact microdegrees, so the
    distributed Σw·x / Σw accumulates as pure int64 partials through
    the combiner tree with ONE pinned double division per cell at the
    end (house float protocol).  Events never shuffle."""
    from .stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        w = np.floor(b["value"].to_numpy(zero_copy_only=False)
                     * 100.0 + 0.5).astype(np.int64)
        cx = np.floor((lon + 180.0) / 15.0).astype(np.int64)
        cy = np.floor((lat + 60.0) / 15.0).astype(np.int64)
        xm = np.floor(lon * 1e6 + 0.5).astype(np.int64)
        ym = np.floor(lat * 1e6 + 0.5).astype(np.int64)
        t = pa.table({"cx": pa.array(cx), "cy": pa.array(cy),
                      "sw": pa.array(w), "swx": pa.array(w * xm),
                      "swy": pa.array(w * ym)})
        return (t.group_by(["cx", "cy"]).aggregate(
            [("sw", "sum"), ("swx", "sum"), ("swy", "sum")])
            .rename_columns(["cx", "cy", "sw", "swx", "swy"]))

    ds = _read(sf_dir, "events", ["event_id", "value"]).map_batches(
        partial, batch_format="pyarrow")
    m = tree_aggregate_to_table(
        ds, ["cx", "cy"],
        [("sw", "sum"), ("swx", "sum"), ("swy", "sum")]).to_pandas()
    m = m[m["sw"] > 0]
    sw = m["sw"].to_numpy().astype(np.float64)
    wx = np.floor(m["swx"].to_numpy().astype(np.float64) / sw + 0.5)
    wy = np.floor(m["swy"].to_numpy().astype(np.float64) / sw + 0.5)
    return pd.DataFrame({
        "cx": m["cx"].to_numpy().astype(np.int64),
        "cy": m["cy"].to_numpy().astype(np.int64),
        "sw": m["sw"].to_numpy().astype(np.int64),
        "wx_micro": wx.astype(np.int64),
        "wy_micro": wy.astype(np.int64)})


def q_weighted_centroid_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        "WITH p AS (SELECT "
        f"CAST(floor(({lon} + 180.0) / 15.0) AS BIGINT) AS cx, "
        f"CAST(floor(({lat} + 60.0) / 15.0) AS BIGINT) AS cy, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS w, "
        f"CAST(floor({lon} * 1e6 + 0.5) AS BIGINT) AS xm, "
        f"CAST(floor({lat} * 1e6 + 0.5) AS BIGINT) AS ym FROM events), "
        "s AS (SELECT cx, cy, CAST(sum(w) AS BIGINT) AS sw, "
        "CAST(sum(w * xm) AS BIGINT) AS swx, "
        "CAST(sum(w * ym) AS BIGINT) AS swy FROM p GROUP BY 1, 2) "
        "SELECT cx, cy, sw, "
        "CAST(floor(CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE) + 0.5) "
        "AS BIGINT) AS wx_micro, "
        "CAST(floor(CAST(swy AS DOUBLE) / CAST(sw AS DOUBLE) + 0.5) "
        "AS BIGINT) AS wy_micro FROM s WHERE sw > 0"
    )


def q_histeq_checksum(sf_dir: str):
    """Hash verification of HISTOGRAM EQUALIZATION (the classic
    contrast-normalization preprocessing kernel): decode → integer
    luma → per-image CDF → ``eq(v) = (cdf(v) − cdf(min))·255 //
    (n − cdf(min))`` → Σ of the equalized plane, all exact ints.  The
    oracle replays the CDF as a window cumsum over the per-value luma
    counts of the generator plane.  Flat images (n == cdf(min)) pass
    through as identity — not present in the fixture but pinned in the
    kernel.  Same head-K / scale caveats as image_checksum."""
    import pyarrow.dataset as pds
    import ray.data

    from .fixtures import ensure_images_parquet, scale_for_sf_dir
    from .functions.image_codec import decode_image

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)

    def eq(b: pa.Table) -> pa.Table:
        blobs = b["bytes"].to_pylist()
        fmts = b["fmt"].to_pylist()
        out = np.empty(len(blobs), np.int64)
        for i in range(len(blobs)):
            img = decode_image(blobs[i], fmts[i]).astype(np.int64)
            y = (77 * img[:, :, 0] + 150 * img[:, :, 1]
                 + 29 * img[:, :, 2]) >> 8
            vals, counts = np.unique(y, return_counts=True)
            cdf = np.cumsum(counts)
            n, cmin = int(cdf[-1]), int(counts[0])
            if n == cmin:
                out[i] = int(vals[0]) * n  # flat: identity
            else:
                eqv = (cdf - cmin) * 255 // (n - cmin)
                out[i] = int((counts * eqv).sum())
        return pa.table({"image_id": b["image_id"],
                         "eq_sum": pa.array(out)})

    return ds.map_batches(eq, batch_format="pyarrow", batch_size=128)


def q_histeq_checksum_sql() -> str:
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "h AS (SELECT i, l, CAST(count(*) AS BIGINT) AS c "
        "FROM lum GROUP BY 1, 2), "
        "w AS (SELECT i, l, c, "
        "CAST(sum(c) OVER (PARTITION BY i ORDER BY l) AS BIGINT) "
        "AS cdf, CAST(sum(c) OVER (PARTITION BY i) AS BIGINT) AS n, "
        "CAST(first_value(c) OVER (PARTITION BY i ORDER BY l) "
        "AS BIGINT) AS cmin FROM h) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        " CAST(sum(CASE WHEN n = cmin THEN l * c "
        "ELSE c * ((cdf - cmin) * 255 // (n - cmin)) END) AS BIGINT) "
        "AS eq_sum FROM w GROUP BY 1"
    )


_SKETCH_QS = (0.25, 0.5, 0.9, 0.99)


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
    from .functions.sketch_quantile import QuantileSketch

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


def q_speed_profile(sf_dir: str):
    """Velocity analytics over trajectories: per-hop speed =
    haversine-mm · 1e6 // Δt_µs (pure int64 after the house
    millimetre pinning), bucketed by decimal magnitude (exact digit
    count — integer threshold comparisons, no log) into a bounded
    histogram that merges on the combiner tree.  Zero/negative Δt hops
    (same-timestamp events) are excluded on both sides."""
    from .stages.agg_tree import tree_aggregate_to_table
    from .stages.scan import keyed_scan

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        return pa.table({"user_id": b["user_id"],
                         "t": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"],
                         "lat": pa.array(lat), "lon": pa.array(lon)})

    C = np.pi / 180.0
    R2 = 2.0 * 6371000.0
    POW10 = 10 ** np.arange(1, 19, dtype=np.int64)

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        t = d["t"].to_numpy()
        phi = d["lat"].to_numpy() * C
        lam = d["lon"].to_numpy() * C
        hop = np.r_[False, u[1:] == u[:-1]]
        dt = t - np.roll(t, 1)
        p1, p2 = np.roll(phi, 1)[hop], phi[hop]
        l1, l2 = np.roll(lam, 1)[hop], lam[hop]
        dt = dt[hop]
        sp = np.sin((p2 - p1) / 2.0)
        sl = np.sin((l2 - l1) / 2.0)
        h = sp * sp + np.cos(p1) * np.cos(p2) * (sl * sl)
        mm = np.floor(R2 * np.arcsin(np.minimum(1.0, np.sqrt(h)))
                      * 1e3 + 0.5).astype(np.int64)
        ok = dt > 0
        speed = mm[ok] * 1_000_000 // dt[ok]
        digits = (np.searchsorted(POW10, speed, side="right") + 1
                  ).astype(np.int64)
        g = (pd.DataFrame({"magnitude": digits})
             .groupby("magnitude", sort=False).size()
             .reset_index(name="n_hops"))
        g["n_hops"] = g["n_hops"].astype(np.int64)
        return g

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"]
               ).map_batches(prep, batch_format="pyarrow")
    parts = keyed_scan(ds, "user_id", ["t", "event_id"], fn,
                       n_rows=_nrows(sf_dir, "events"))
    return tree_aggregate_to_table(
        parts, ["magnitude"], [("n_hops", "sum")])


def q_speed_profile_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        "WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        f"{lat} * (pi() / 180.0) AS phi, "
        f"{lon} * (pi() / 180.0) AS lam FROM events), "
        "s AS (SELECT user_id, t, phi, lam, lag(t) OVER w AS t0, "
        "lag(phi) OVER w AS p1, lag(lam) OVER w AS l1 FROM p "
        "WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), "
        "h AS (SELECT t - t0 AS dt, "
        "CAST(floor(2.0 * 6371000.0 * asin(least(1.0, sqrt("
        "sin((phi - p1) / 2.0) * sin((phi - p1) / 2.0) "
        "+ cos(p1) * cos(phi) * (sin((lam - l1) / 2.0) * "
        "sin((lam - l1) / 2.0))))) * 1e3 + 0.5) AS BIGINT) AS mm "
        "FROM s WHERE t0 IS NOT NULL), "
        "v AS (SELECT length(CAST(mm * 1000000 // dt AS VARCHAR)) "
        "AS magnitude FROM h WHERE dt > 0) "
        "SELECT CAST(magnitude AS BIGINT) AS magnitude, "
        "CAST(count(*) AS BIGINT) AS n_hops FROM v GROUP BY 1"
    )


_BM25_TERMS = ("spark", "window", "hash", "vector")
_BM25_K = 20


def q_bm25_topk(sf_dir: str):
    """BM25 retrieval scoring (k1=1.2, b=0.75) of every document
    against a fixed query-term list, global top-20.  Two streaming
    passes: (1) per-batch partials for document frequency and token
    totals (docs never shuffle — a doc is one row, so per-batch
    distinct-doc counts sum exactly); (2) per-doc term scores, each
    quantized to micro-ints BEFORE the cross-term sum (the house rule
    for transcendental parity — idf goes through the same ln as the
    DuckDB oracle, and every float op is written in the identical
    order on both sides), then the top_k partial-sort combiner.
    idf/avgdl are 5 scalars — closure-captured, not broadcast."""
    from .stages.topk import top_k

    def _toks(texts: pd.Series):
        toks = texts.str.lower().str.findall(r"[a-z0-9]+")
        lens = toks.str.len().to_numpy().astype(np.int64)
        flat = np.concatenate([np.asarray(t, dtype="U")
                               for t in toks if len(t)] or
                              [np.array([], dtype="U")])
        return lens, flat, np.repeat(np.arange(len(texts)), lens)

    def stat_batch(b: pd.DataFrame) -> pd.DataFrame:
        lens, flat, doc_idx = _toks(b["text"])
        out = {"tot": [np.int64(lens.sum())]}
        for j, term in enumerate(_BM25_TERMS):
            out[f"df{j}"] = [np.int64(
                len(np.unique(doc_idx[flat == term])))]
        return pd.DataFrame(out)

    stats = _read(sf_dir, "documents", ["text"]).map_batches(
        stat_batch, batch_format="pandas").to_pandas().sum()
    n = float(_nrows(sf_dir, "documents"))
    avgdl = float(stats["tot"]) / n
    idf = [float(np.log(((n - float(stats[f"df{j}"])) + 0.5)
                        / (float(stats[f"df{j}"]) + 0.5) + 1.0))
           for j in range(len(_BM25_TERMS))]

    def score(b: pd.DataFrame) -> pd.DataFrame:
        lens, flat, doc_idx = _toks(b["text"])
        dl = lens.astype(np.float64)
        denom_base = 1.2 * ((1.0 - 0.75) + (0.75 * dl) / avgdl)
        s6 = np.zeros(len(b), np.int64)
        hit = np.zeros(len(b), bool)
        for idf_t, term in zip(idf, _BM25_TERMS):
            tf = np.bincount(doc_idx[flat == term],
                             minlength=len(b)).astype(np.float64)
            has = tf > 0
            sc = idf_t * (tf * 2.2) / (tf + denom_base)
            s6 += np.where(has, np.floor(sc * 1e6 + 0.5), 0
                           ).astype(np.int64)
            hit |= has
        return pd.DataFrame({"doc_id": b["doc_id"].to_numpy()[hit],
                             "score6": s6[hit]})

    scored = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        score, batch_format="pandas")
    return top_k(scored, "score6", _BM25_K, descending=True,
                 tiebreak_col="doc_id")


def q_bm25_topk_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return (
        "WITH w AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), "
        "'[a-z0-9]+')) AS tok FROM documents), "
        "dlt AS (SELECT doc_id, count(*) AS dl FROM w GROUP BY doc_id), "
        "st AS (SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) "
        "AS n, CAST((SELECT sum(dl) FROM dlt) AS DOUBLE) / "
        "CAST((SELECT count(*) FROM documents) AS DOUBLE) AS avgdl), "
        f"df AS (SELECT tok, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df "
        f"FROM w WHERE tok IN ({terms}) GROUP BY tok), "
        f"tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf "
        f"FROM w WHERE tok IN ({terms}) GROUP BY doc_id, tok), "
        "sc AS (SELECT tf.doc_id, CAST(floor("
        "ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1.0) * (tf.tf * 2.2) / "
        "(tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dlt.dl AS DOUBLE) / "
        "st.avgdl)) * 1e6 + 0.5) AS BIGINT) AS s6 "
        "FROM tf JOIN df USING (tok) JOIN dlt ON tf.doc_id = dlt.doc_id, "
        "st) "
        "SELECT doc_id, CAST(sum(s6) AS BIGINT) AS score6 FROM sc "
        f"GROUP BY doc_id ORDER BY score6 DESC, doc_id LIMIT {_BM25_K}"
    )


def _seg_params(eid: np.ndarray):
    """Short directed segment per event id: start = the derived point,
    delta = ±3° per axis from two more multiplicative hashes.  Shared
    by the intersection join's cover pass and its verify map (the
    verify re-derives endpoints from ids, so coordinates never ride
    the shuffle).

    Odd ids (the B side) derive their start from ``eid * 1000003``:
    both derive_latlon multipliers are LINEAR in the key, so A/B pairs
    of the SAME derivation have (Δlat, Δlon) determined jointly by Δid
    — at fixture id ranges NO pair is close on both axes at once (a
    measured zero at sf0.001/sf0.01) — and the key remap breaks that
    lattice.  int64 wraparound in ``key * mult`` is exact mod 2^32
    (2^32 | 2^64), mirrored by HUGEINT in the oracle."""
    eid = np.asarray(eid, dtype=np.int64)
    key = np.where(eid % 2 == 1, eid * 1000003, eid)
    lat, lon = derive_latlon(key)
    dlat = -3.0 + 6.0 * (((eid * 7919) % 1000).astype(np.float64) / 1000.0)
    dlon = -3.0 + 6.0 * (((eid * 104729) % 1000).astype(np.float64) / 1000.0)
    return lat, lon, lat + dlat, lon + dlon


def q_traj_intersections(sf_dir: str):
    """Cross-set line-segment intersection join — the vector-overlay
    GIS shape (road network × trajectory hops): every event derives a
    short directed segment (≤ 3° per axis) from its id; even-id
    segments join odd-id segments on PROPER crossing.  Distributed
    plan: PBSM grid co-partition over segment bounding boxes
    (stages/spatial_join.py — cover fan-out, reference-point dedup so
    a pair is reported by exactly one cell, hot-cell fragment-
    replicate guard), then a stateless vectorized verify map
    re-derives endpoints from the ids (only id pairs cross the
    shuffle) and keeps pairs whose exact int64 microdegree
    cross-product orientation signs witness a proper crossing — no
    epsilon, no floats (|products| ≤ ~4e12, far inside int64).  The
    oracle replays the bbox join plus the same strict orientation
    predicate."""
    from .stages.spatial_join import box_overlap_join

    def boxes(parity: int):
        def f(b: pa.Table) -> pa.Table:
            eid = b["event_id"].to_numpy(zero_copy_only=False)
            eid = eid[eid % 2 == parity]
            y1, x1, y2, x2 = _seg_params(eid)
            return pa.table({
                "id": pa.array(eid, pa.int64()),
                "xmin": pa.array(np.minimum(x1, x2)),
                "ymin": pa.array(np.minimum(y1, y2)),
                "xmax": pa.array(np.maximum(x1, x2)),
                "ymax": pa.array(np.maximum(y1, y2))})
        return f

    a = _read(sf_dir, "events", ["event_id"]).map_batches(
        boxes(0), batch_format="pyarrow")
    b = _read(sf_dir, "events", ["event_id"]).map_batches(
        boxes(1), batch_format="pyarrow")
    cand = box_overlap_join(a, b, cell=4.0, out_a="a_id", out_b="b_id")

    def _micro(eid):
        y1, x1, y2, x2 = _seg_params(eid)
        def m(v):
            return np.floor(v * 1e6 + 0.5).astype(np.int64)
        return m(x1), m(y1), m(x2), m(y2)

    def verify(t: pa.Table) -> pa.Table:
        aid = t["a_id"].to_numpy(zero_copy_only=False)
        bid = t["b_id"].to_numpy(zero_copy_only=False)
        ax1, ay1, ax2, ay2 = _micro(aid)
        bx1, by1, bx2, by2 = _micro(bid)
        d1 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
        d2 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
        d3 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)
        d4 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)
        cross = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) \
            & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
        return pa.table({"a_id": pa.array(aid[cross], pa.int64()),
                         "b_id": pa.array(bid[cross], pa.int64())})

    return cand.map_batches(verify, batch_format="pyarrow")


def q_traj_intersections_sql() -> str:
    # side A (even ids) keys on event_id; side B (odd) on
    # event_id·1000003 — the CAST to HUGEINT happens BEFORE the
    # multiply so the product itself is exact at any event_id (a
    # BIGINT multiply would raise past ~9.2e12 while the engine's
    # int64 wrap proceeds; the downstream latlon derive only uses
    # the value mod 2^32, which both sides then agree on)
    lat, lon = latlon_sql(
        "CASE WHEN event_id % 2 = 1 THEN "
        "CAST(event_id AS HUGEINT) * 1000003 "
        "ELSE CAST(event_id AS HUGEINT) END")
    return (
        "WITH e AS (SELECT event_id, "
        f"CAST({lat} AS DOUBLE) AS lat, CAST({lon} AS DOUBLE) AS lon, "
        "-3.0 + 6.0 * (((event_id * 7919) % 1000) / 1000.0) AS dlat, "
        "-3.0 + 6.0 * (((event_id * 104729) % 1000) / 1000.0) AS dlon "
        "FROM events), "
        "s AS (SELECT event_id, "
        "least(lon, lon + dlon) AS xmin, greatest(lon, lon + dlon) AS xmax, "
        "least(lat, lat + dlat) AS ymin, greatest(lat, lat + dlat) AS ymax, "
        "CAST(floor(lon * 1e6 + 0.5) AS BIGINT) AS x1, "
        "CAST(floor(lat * 1e6 + 0.5) AS BIGINT) AS y1, "
        "CAST(floor((lon + dlon) * 1e6 + 0.5) AS BIGINT) AS x2, "
        "CAST(floor((lat + dlat) * 1e6 + 0.5) AS BIGINT) AS y2 FROM e), "
        "c AS (SELECT a.event_id AS a_id, b.event_id AS b_id, "
        "(a.x2 - a.x1) * (b.y1 - a.y1) - (a.y2 - a.y1) * (b.x1 - a.x1) AS d1, "
        "(a.x2 - a.x1) * (b.y2 - a.y1) - (a.y2 - a.y1) * (b.x2 - a.x1) AS d2, "
        "(b.x2 - b.x1) * (a.y1 - b.y1) - (b.y2 - b.y1) * (a.x1 - b.x1) AS d3, "
        "(b.x2 - b.x1) * (a.y2 - b.y1) - (b.y2 - b.y1) * (a.x2 - b.x1) AS d4 "
        "FROM s a JOIN s b ON a.event_id % 2 = 0 AND b.event_id % 2 = 1 "
        "AND a.xmin <= b.xmax AND b.xmin <= a.xmax "
        "AND a.ymin <= b.ymax AND b.ymin <= a.ymax) "
        "SELECT a_id, b_id FROM c "
        "WHERE ((d1 > 0 AND d2 < 0) OR (d1 < 0 AND d2 > 0)) "
        "AND ((d3 > 0 AND d4 < 0) OR (d3 < 0 AND d4 > 0))"
    )


def q_ab_ttest(sf_dir: str):
    """Welch two-sample t-statistic per event_type between user
    cohorts (user_id % 2) — the A/B-experiment readout: per-(type,
    cohort) moment partials (n, Σcents, Σcents²) are exact int64 and
    merge on the bounded combiner tree; the t finalize is a fixed
    sequence of double ops on the driver (divisions and ONE
    correctly-rounded IEEE sqrt, micro-pinned) replayed verbatim by
    the oracle.  Σc² fits int64 through bench scale; at 100 TB the
    cents partials would shard to (hi, lo) limb pairs like the
    moments stage."""
    from .stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        c = np.floor(b["value"].to_numpy(zero_copy_only=False)
                     * 100.0 + 0.5).astype(np.int64)
        coh = (b["user_id"].to_numpy(zero_copy_only=False) % 2)
        t = pa.table({"event_type": b["event_type"],
                      "coh": pa.array(coh, pa.int64()),
                      "n": pa.array(np.ones(len(c), np.int64)),
                      "s1": pa.array(c), "s2": pa.array(c * c)})
        return (t.group_by(["event_type", "coh"]).aggregate(
            [("n", "sum"), ("s1", "sum"), ("s2", "sum")])
            .rename_columns(["event_type", "coh", "n", "s1", "s2"]))

    g = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_type", "user_id", "value"])
        .map_batches(partial, batch_format="pyarrow"),
        ["event_type", "coh"],
        [("n", "sum"), ("s1", "sum"), ("s2", "sum")]).to_pandas()
    a = g[g["coh"] == 0].set_index("event_type")
    b = g[g["coh"] == 1].set_index("event_type")
    types = sorted(set(a.index) & set(b.index))
    a, b = a.loc[types], b.loc[types]
    na = a["n"].to_numpy().astype(np.float64)
    nb = b["n"].to_numpy().astype(np.float64)
    s1a = a["s1"].to_numpy().astype(np.float64)
    s1b = b["s1"].to_numpy().astype(np.float64)
    s2a = a["s2"].to_numpy().astype(np.float64)
    s2b = b["s2"].to_numpy().astype(np.float64)
    keep = (na > 1) & (nb > 1)
    t = (s1a / na - s1b / nb) / np.sqrt(
        (s2a - s1a * s1a / na) / (na - 1.0) / na
        + (s2b - s1b * s1b / nb) / (nb - 1.0) / nb)
    return pd.DataFrame({
        "event_type": np.asarray(types, dtype=object)[keep],
        "na": a["n"].to_numpy().astype(np.int64)[keep],
        "nb": b["n"].to_numpy().astype(np.int64)[keep],
        "t_micro": np.floor(t[keep] * 1e6 + 0.5).astype(np.int64)})


def q_ab_ttest_sql() -> str:
    def var(s2, s1, n):
        return (f"(CAST({s2} AS DOUBLE) - CAST({s1} AS DOUBLE) * "
                f"CAST({s1} AS DOUBLE) / CAST({n} AS DOUBLE)) / "
                f"CAST({n} - 1 AS DOUBLE) / CAST({n} AS DOUBLE)")

    return (
        "WITH p AS (SELECT event_type, user_id % 2 AS coh, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c FROM events), "
        "g AS (SELECT event_type, coh, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(c) AS BIGINT) AS s1, CAST(sum(c * c) AS BIGINT) AS s2 "
        "FROM p GROUP BY 1, 2) "
        "SELECT a.event_type, a.n AS na, b.n AS nb, "
        "CAST(floor((CAST(a.s1 AS DOUBLE) / CAST(a.n AS DOUBLE) - "
        "CAST(b.s1 AS DOUBLE) / CAST(b.n AS DOUBLE)) / sqrt("
        + var("a.s2", "a.s1", "a.n") + " + "
        + var("b.s2", "b.s1", "b.n") +
        ") * 1e6 + 0.5) AS BIGINT) AS t_micro "
        "FROM g a JOIN g b ON a.event_type = b.event_type "
        "AND a.coh = 0 AND b.coh = 1 WHERE a.n > 1 AND b.n > 1"
    )


def q_pmi_bigrams(sf_dir: str):
    """Top-20 adjacent-word bigrams with pointwise mutual information
    (the collocation-extraction shape): distributed bigram and unigram
    wordcounts (per-batch np.unique combiners — the shuffles ship
    per-batch DISTINCT keys), then the unigram totals attach to each
    bigram via TWO string-keyed co-partition exchanges
    (hash_bucket_scan + a vectorized in-bucket merge — the open-
    vocabulary join shape; a broadcast would assume the vocabulary
    fits a worker).  pmi_nano = floor(ln((N·c_xy)/(c_x·c_y))·1e9+0.5)
    with one libm ln per surviving bigram (house transcendental
    protocol; products ≤ ~6e10 stay exact in int64 → DOUBLE)."""
    from .stages.scan import hash_bucket_scan
    from .stages.topk import top_k

    n_docs = _nrows(sf_dir, "documents")
    # session-cached corpus count passes shared with q_bigram_ppl /
    # q_unigram_logprob (each is one tokenize + one exchange)
    bg = _corpus_bigram_counts(sf_dir)
    uni = _corpus_unigram_counts(sf_dir)
    n_total = int(bg.sum("cnt"))

    import pyarrow.compute as pc

    def attach(src_col: str, out_col: str):
        # co-partition (bigram rows ∪ unigram totals) on the token and
        # join inside the bucket via compiled Acero — an equi-join on
        # a string key without assuming either side fits a worker
        def f(t: pa.Table) -> pa.Table:
            t = t.drop_columns(["_jk"]).combine_chunks()
            is_uni = pc.is_null(t["x"])
            lut = t.filter(is_uni).select(["tok", "n"]) \
                   .rename_columns(["_k", out_col])
            rows = t.filter(pc.invert(is_uni)).drop_columns(["tok", "n"])
            j = rows.join(lut, keys=[src_col], right_keys=["_k"],
                          join_type="inner")
            return j.set_column(
                j.column_names.index(out_col), out_col,
                j[out_col].cast(pa.int64()))
        return f

    def pad_and_key(extra_cols, key_col):
        # null-pad to the union schema and tag the co-partition key —
        # generic so the second pass (bg already carries cx) also fits
        def f(t: pa.Table) -> pa.Table:
            for name, typ in extra_cols:
                t = t.append_column(name, pa.nulls(len(t), typ))
            t = t.append_column("_jk", t[key_col].cast(pa.string()))
            return t.select(sorted(t.column_names))
        return f

    for src, out in (("x", "cx"), ("y", "cy")):
        bs = bg.schema()
        bg_cols = list(zip(bs.names, bs.types))
        bgp = bg.map_batches(
            pad_and_key([("tok", pa.string()), ("n", pa.int64())], src),
            batch_format="pyarrow")
        u = uni.map_batches(pad_and_key(bg_cols, "tok"),
                            batch_format="pyarrow")
        bg = hash_bucket_scan(bgp.union(u), ["_jk"],
                              attach(src, out),
                              n_rows=n_docs).materialize()

    def finalize(t: pa.Table) -> pa.Table:
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx = t["cx"].to_numpy(zero_copy_only=False).astype(np.int64)
        cy = t["cy"].to_numpy(zero_copy_only=False).astype(np.int64)
        pmi = np.log((n_total * cnt).astype(np.float64)
                     / (cx * cy).astype(np.float64))
        item = pc.binary_join_element_wise(
            t["x"].cast(pa.string()), t["y"].cast(pa.string()), " ")
        return pa.table({
            "x": t["x"].cast(pa.string()), "y": t["y"].cast(pa.string()),
            "cnt": pa.array(cnt), "pmi_nano": pa.array(
                np.floor(pmi * 1e9 + 0.5).astype(np.int64)),
            "_item": item})

    scored = bg.map_batches(finalize, batch_format="pyarrow")
    out = top_k(scored, "cnt", 20, descending=True, tiebreak_col="_item")
    return out.drop_columns(["_item"])


def q_pmi_bigrams_sql() -> str:
    return (
        "WITH toks AS (SELECT doc_id, "
        "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok, "
        "generate_subscripts(regexp_extract_all(lower(text), "
        "'[a-z0-9]+'), 1) AS i FROM documents), "
        "bg AS (SELECT a.tok AS x, b.tok AS y FROM toks a JOIN toks b "
        "ON a.doc_id = b.doc_id AND b.i = a.i + 1), "
        "cb AS (SELECT x, y, CAST(count(*) AS BIGINT) AS cnt "
        "FROM bg GROUP BY 1, 2), "
        "cu AS (SELECT tok, CAST(count(*) AS BIGINT) AS n "
        "FROM toks GROUP BY 1), "
        "nb AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM bg) "
        "SELECT cb.x, cb.y, cb.cnt, "
        "CAST(floor(ln(CAST(nb.nn * cb.cnt AS DOUBLE) / "
        "CAST(ux.n * uy.n AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) "
        "AS pmi_nano FROM cb, nb "
        "JOIN cu ux ON cb.x = ux.tok JOIN cu uy ON cb.y = uy.tok "
        "ORDER BY cb.cnt DESC, cb.x, cb.y LIMIT 20"
    )


def _grid_cell_counts(sf_dir: str) -> pd.DataFrame:
    """Per-5°-cell event counts (cx, cy, x) on the bounded combiner
    tree (≤ 72×24 cells) — the ONE copy of the counting pass shared
    by q_morans_i / q_getis_ord / q_density_gradient (previously
    triplicated; a grid tweak could silently desynchronize the
    family)."""
    from .stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        cx = np.floor((lon + 180.0) / 5.0).astype(np.int64)
        cy = np.floor((lat + 60.0) / 5.0).astype(np.int64)
        t = pa.table({"cx": pa.array(cx), "cy": pa.array(cy),
                      "x": pa.array(np.ones(len(cx), np.int64))})
        return (t.group_by(["cx", "cy"]).aggregate([("x", "sum")])
                .rename_columns(["cx", "cy", "x"]))

    return tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_id"]).map_batches(
            partial, batch_format="pyarrow"),
        ["cx", "cy"], [("x", "sum")]).to_pandas()


def q_morans_i(sf_dir: str):
    """Global Moran's I spatial autocorrelation of event density over
    a 5° grid with queen (8-neighbour) contiguity — THE classic
    geospatial clustering statistic: one distributed counting pass
    (per-cell event counts on the bounded combiner tree, ≤ 72×24
    cells), then the I finalize on the driver over the tiny cell
    table in EXACT integer arithmetic — deviations are scaled by N
    (z·N = N·x_i − Σx, an integer), so the numerator
    Σ_ij w_ij (Nx_i−S)(Nx_j−S) and denominator Σ_i (Nx_i−S)² are
    exact Python bigints at any event count; the single division
    I = (N·num)/(W·den) is one double op pinned to nano (HUGEINT →
    DOUBLE on the oracle side, int → float here — both correctly
    rounded).  W counts ordered neighbour pairs among OCCUPIED cells
    (the empirical contiguity matrix)."""
    m = _grid_cell_counts(sf_dir)
    n_cells = len(m)
    s_tot = int(m["x"].sum())
    z = {(int(r.cx), int(r.cy)): n_cells * int(r.x) - s_tot
         for r in m.itertuples()}
    num = 0
    w_pairs = 0
    for (cx, cy), zi in z.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                zj = z.get((cx + dx, cy + dy))
                if zj is not None:
                    num += zi * zj
                    w_pairs += 1
    den = sum(v * v for v in z.values())
    if w_pairs == 0 or den == 0:
        raise RuntimeError("degenerate grid for Moran's I")
    i_nano = int(np.floor(float(n_cells * num) / float(w_pairs * den)
                          * 1e9 + 0.5))
    return pd.DataFrame({"n_cells": [np.int64(n_cells)],
                         "w_pairs": [np.int64(w_pairs)],
                         "i_nano": [np.int64(i_nano)]})


def q_morans_i_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        "WITH p AS (SELECT "
        f"CAST(floor(({lon} + 180.0) / 5.0) AS BIGINT) AS cx, "
        f"CAST(floor(({lat} + 60.0) / 5.0) AS BIGINT) AS cy "
        "FROM events), "
        "c AS MATERIALIZED (SELECT cx, cy, "
        "CAST(count(*) AS BIGINT) AS x FROM p GROUP BY 1, 2), "
        "s AS MATERIALIZED (SELECT CAST(count(*) AS HUGEINT) AS n, "
        "CAST(sum(x) AS HUGEINT) AS t FROM c), "
        "z AS MATERIALIZED (SELECT cx, cy, "
        "s.n * x - s.t AS zz FROM c, s), "
        "pr AS (SELECT a.zz AS za, b.zz AS zb FROM z a JOIN z b ON "
        "abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1 "
        "AND NOT (a.cx = b.cx AND a.cy = b.cy)), "
        "agg AS (SELECT CAST(count(*) AS HUGEINT) AS w, "
        "CAST(sum(za * zb) AS HUGEINT) AS num FROM pr), "
        "dn AS (SELECT CAST(sum(zz * zz) AS HUGEINT) AS den FROM z) "
        "SELECT CAST(s.n AS BIGINT) AS n_cells, "
        "CAST(agg.w AS BIGINT) AS w_pairs, "
        "CAST(floor(CAST(s.n * agg.num AS DOUBLE) / "
        "CAST(agg.w * dn.den AS DOUBLE) * 1e9 + 0.5) AS BIGINT) "
        "AS i_nano FROM s, agg, dn"
    )


# IDW inner cutoff: d² ≥ 10^6 micro² (0.001°).  Bounds the pinned
# 1/d² and v/d² terms within int64 for any point placement — applied
# identically in the engine and the oracle SQL.
_IDW_MIN_D2 = 1_000_000


def q_idw_surface(sf_dir: str):
    """Inverse-distance-weighted interpolation of event values onto a
    coarse 48-probe grid (the raster-surface estimation kernel:
    kriging's cheap cousin): the probe grid broadcasts (it is tiny and
    fixed), each batch computes its (event × probe) pair terms
    vectorized — squared distance is an exact int64 in microdegree
    units, and both the value term v/d² and the weight 1/d² are fixed
    double sequences pinned to ints PER PAIR, so the distributed sums
    are exact integer adds in any order; the final estimate is one
    pinned division of the two sums.  Pairs beyond the 15° radius
    drop out, as do pairs INSIDE 0.001° (d² < 10^6 micro²): the inner
    cutoff bounds 1/d² so both pinned terms fit int64 at any point
    placement — without it a point within ~3e-5° of a probe would
    wrap numpy's float→int64 astype while the oracle's CAST raises,
    failing the two sides differently.  At 100 TB nothing changes:
    probes stay broadcast, partials stay (48 × n_blocks) rows on the
    combiner tree."""
    from .stages.agg_tree import tree_aggregate_to_table

    pxs = np.array([-165 + 30 * k for k in range(12)], np.int64) * 1_000_000
    pys = np.array([-45 + 30 * j for j in range(4)], np.int64) * 1_000_000
    # probes are at whole degrees and fixture points never land on
    # one, so the inner cutoff excludes no fixture pair — it exists
    # to bound 1/d² (see docstring)
    pxm = np.repeat(pxs, len(pys))
    pym = np.tile(pys, len(pxs))
    r2 = (15 * 1_000_000) ** 2

    def partial(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        v = np.floor(b["value"].to_numpy(zero_copy_only=False)
                     * 100.0 + 0.5).astype(np.int64)
        xm = np.floor(lon * 1e6 + 0.5).astype(np.int64)
        ym = np.floor(lat * 1e6 + 0.5).astype(np.int64)
        dx = xm[:, None] - pxm[None, :]
        dy = ym[:, None] - pym[None, :]
        d2 = dx * dx + dy * dy
        ok = (d2 >= _IDW_MIN_D2) & (d2 < r2)
        ev, pr = np.nonzero(ok)
        d2deg = d2[ev, pr].astype(np.float64) / 1e12
        vterm = np.floor(v[ev].astype(np.float64) / d2deg
                         * 1e6 + 0.5).astype(np.int64)
        wterm = np.floor(1.0 / d2deg * 1e6 + 0.5).astype(np.int64)
        t = pa.table({"pxm": pa.array(pxm[pr]), "pym": pa.array(pym[pr]),
                      "n_pts": pa.array(np.ones(len(pr), np.int64)),
                      "sv": pa.array(vterm), "sw": pa.array(wterm)})
        return (t.group_by(["pxm", "pym"]).aggregate(
            [("n_pts", "sum"), ("sv", "sum"), ("sw", "sum")])
            .rename_columns(["pxm", "pym", "n_pts", "sv", "sw"]))

    g = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_id", "value"]).map_batches(
            partial, batch_format="pyarrow"),
        ["pxm", "pym"],
        [("n_pts", "sum"), ("sv", "sum"), ("sw", "sum")]).to_pandas()
    g = g[g["sw"] > 0]
    est = np.floor(g["sv"].to_numpy().astype(np.float64)
                   / g["sw"].to_numpy().astype(np.float64)
                   * 100.0 + 0.5).astype(np.int64)
    return pd.DataFrame({
        "pxm": g["pxm"].to_numpy().astype(np.int64),
        "pym": g["pym"].to_numpy().astype(np.int64),
        "n_pts": g["n_pts"].to_numpy().astype(np.int64),
        "est_cq": est})


def q_idw_surface_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        "WITH pr AS (SELECT (-165 + 30 * k) * 1000000 AS pxm, "
        "(-45 + 30 * j) * 1000000 AS pym "
        "FROM range(12) t(k), range(4) u(j)), "
        "e AS (SELECT "
        f"CAST(floor({lon} * 1e6 + 0.5) AS BIGINT) AS xm, "
        f"CAST(floor({lat} * 1e6 + 0.5) AS BIGINT) AS ym, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v FROM events), "
        "pairs AS (SELECT pxm, pym, v, "
        "(xm - pxm) * (xm - pxm) + (ym - pym) * (ym - pym) AS d2 "
        "FROM e, pr), "
        "t AS (SELECT pxm, pym, "
        "CAST(floor(CAST(v AS DOUBLE) / (CAST(d2 AS DOUBLE) / 1e12) "
        "* 1e6 + 0.5) AS BIGINT) AS vterm, "
        "CAST(floor(1.0 / (CAST(d2 AS DOUBLE) / 1e12) * 1e6 + 0.5) "
        "AS BIGINT) AS wterm FROM pairs "
        f"WHERE d2 >= {_IDW_MIN_D2} AND d2 < {(15 * 1_000_000) ** 2}), "
        "g AS (SELECT pxm, pym, CAST(count(*) AS BIGINT) AS n_pts, "
        "CAST(sum(vterm) AS BIGINT) AS sv, "
        "CAST(sum(wterm) AS BIGINT) AS sw FROM t GROUP BY 1, 2) "
        "SELECT pxm, pym, n_pts, "
        "CAST(floor(CAST(sv AS DOUBLE) / CAST(sw AS DOUBLE) * 100.0 "
        "+ 0.5) AS BIGINT) AS est_cq FROM g WHERE sw > 0"
    )


def _hourly_counts_table(sf_dir: str) -> pd.DataFrame:
    """Per-hour event counts (bounded key space: fixture time range)
    via one combiner-tree pass — shared by the time-series queries."""
    from .stages.agg_tree import tree_aggregate_to_table

    def bucket(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy(zero_copy_only=False)
        h = ts.astype("datetime64[us]").astype(np.int64) \
            // 3_600_000_000
        t = pa.table({"h": pa.array(h, pa.int64()),
                      "x": pa.array(np.ones(len(h), np.int64))})
        return (t.group_by(["h"]).aggregate([("x", "sum")])
                .rename_columns(["h", "x"]))

    return tree_aggregate_to_table(
        _read(sf_dir, "events", ["ts"]).map_batches(
            bucket, batch_format="pyarrow"),
        ["h"], [("x", "sum")]).to_pandas().sort_values("h")


def q_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of the hourly event-count series (the
    seasonality probe): one distributed counting pass (combiner
    tree), then r₁ = Σ(N·x_t−S)(N·x_{t+1}−S) / Σ(N·x_t−S)² over the
    gap-filled hour range on the driver — N-scaled deviations keep
    every sum an exact Python bigint at any volume; one pinned double
    division at the end.  Missing hours count 0 (true gap-fill, like
    q_gap_fill)."""
    hc = _hourly_counts_table(sf_dir)
    h = hc["h"].to_numpy()
    full = np.arange(h.min(), h.max() + 1)
    x = np.zeros(len(full), np.int64)
    x[np.searchsorted(full, h)] = hc["x"].to_numpy()
    n = len(full)
    s = int(x.sum())
    z = [n * int(v) - s for v in x]
    num = sum(a * b for a, b in zip(z[:-1], z[1:]))
    den = sum(a * a for a in z)
    r1_nano = int(np.floor(float(num) / float(den) * 1e9 + 0.5))
    return pd.DataFrame({"n_hours": [np.int64(n)],
                         "r1_nano": [np.int64(r1_nano)]})


def q_autocorr_sql() -> str:
    return (
        "WITH c AS (SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) "
        "AS h, CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1), "
        "b AS (SELECT min(h) AS mn, max(h) AS mx FROM c), "
        "r AS (SELECT unnest(generate_series(mn, mx)) AS h FROM b), "
        "f AS MATERIALIZED (SELECT r.h, "
        "COALESCE(c.x, 0) AS x FROM r LEFT JOIN c ON r.h = c.h), "
        "s AS (SELECT CAST(count(*) AS HUGEINT) AS n, "
        "CAST(sum(x) AS HUGEINT) AS t FROM f), "
        "z AS MATERIALIZED (SELECT h, s.n * x - s.t AS z FROM f, s), "
        "num AS (SELECT CAST(sum(a.z * b.z) AS HUGEINT) AS num "
        "FROM z a JOIN z b ON b.h = a.h + 1), "
        "den AS (SELECT CAST(sum(z * z) AS HUGEINT) AS den FROM z) "
        "SELECT CAST(s.n AS BIGINT) AS n_hours, "
        "CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1e9 "
        "+ 0.5) AS BIGINT) AS r1_nano FROM s, num, den"
    )


def q_cusum_changepoint(sf_dir: str):
    """CUSUM changepoint detection over the hourly count series (the
    streaming drift alarm): the cumulative deviation n·S_t − t·S_n is
    an exact bigint per hour (no float drift over arbitrarily long
    series), and the changepoint is its |·| argmax with the earliest-
    hour tiebreak.  Counting pass distributed; the bounded hour table
    finalizes on the driver.  Output = (hour, deviation sign,
    |deviation|)."""
    hc = _hourly_counts_table(sf_dir)
    h = hc["h"].to_numpy()
    full = np.arange(h.min(), h.max() + 1)
    x = np.zeros(len(full), np.int64)
    x[np.searchsorted(full, h)] = hc["x"].to_numpy()
    n = len(full)
    s_n = int(x.sum())
    best = (-1, 0, 0)  # (|dev|, -h, dev)
    s_t = 0
    for t in range(n):
        s_t += int(x[t])
        dev = n * s_t - (t + 1) * s_n
        if abs(dev) > best[0]:
            best = (abs(dev), int(full[t]), dev)
    return pd.DataFrame({
        "cp_hour": [np.int64(best[1])],
        "dev_sign": [np.int64(1 if best[2] > 0 else
                              (-1 if best[2] < 0 else 0))],
        "dev_abs": [np.int64(best[0])]})


def q_cusum_changepoint_sql() -> str:
    return (
        "WITH c AS (SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) "
        "AS h, CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1), "
        "b AS (SELECT min(h) AS mn, max(h) AS mx FROM c), "
        "r AS (SELECT unnest(generate_series(mn, mx)) AS h FROM b), "
        "f AS MATERIALIZED (SELECT r.h, COALESCE(c.x, 0) AS x "
        "FROM r LEFT JOIN c ON r.h = c.h), "
        "s AS (SELECT CAST(count(*) AS HUGEINT) AS n, "
        "CAST(sum(x) AS HUGEINT) AS t FROM f), "
        "w AS (SELECT h, s.n * CAST(sum(x) OVER (ORDER BY h) "
        "AS HUGEINT) - CAST(row_number() OVER (ORDER BY h) "
        "AS HUGEINT) * s.t AS dev FROM f, s) "
        "SELECT h AS cp_hour, "
        "CAST(CASE WHEN dev > 0 THEN 1 WHEN dev < 0 THEN -1 "
        "ELSE 0 END AS BIGINT) AS dev_sign, "
        "CAST(abs(dev) AS BIGINT) AS dev_abs FROM w "
        "ORDER BY abs(dev) DESC, h LIMIT 1"
    )


def q_benford(sf_dir: str):
    """Benford first-digit screen over event value cents (the
    data-quality / fraud heuristic): observed digit counts are one
    bounded combiner-tree pass; expected counts n·log10(1+1/d) and
    the χ² = Σ(o−e)²/e statistic are fixed double sequences pinned
    per digit, summed exactly.  Output = the 9 digit rows plus the
    pinned per-digit χ² contribution."""
    from .stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        c = np.floor(b["value"].to_numpy(zero_copy_only=False)
                     * 100.0 + 0.5).astype(np.int64)
        c = c[c > 0]
        while True:  # leading digit via repeated tens reduction
            big = c >= 10
            if not big.any():
                break
            c = np.where(big, c // 10, c)
        t = pa.table({"d": pa.array(c, pa.int64()),
                      "o": pa.array(np.ones(len(c), np.int64))})
        return (t.group_by(["d"]).aggregate([("o", "sum")])
                .rename_columns(["d", "o"]))

    g = tree_aggregate_to_table(
        _read(sf_dir, "events", ["value"]).map_batches(
            partial, batch_format="pyarrow"),
        ["d"], [("o", "sum")]).to_pandas().sort_values("d")
    n = float(int(g["o"].sum()))
    d = g["d"].to_numpy().astype(np.float64)
    o = g["o"].to_numpy().astype(np.float64)
    e = n * (np.log(1.0 + 1.0 / d) / np.log(10.0))
    chi = (o - e) * (o - e) / e
    return pd.DataFrame({
        "d": g["d"].to_numpy().astype(np.int64),
        "o": g["o"].to_numpy().astype(np.int64),
        "chi_nano": np.floor(chi * 1e9 + 0.5).astype(np.int64)})


def q_benford_sql() -> str:
    return (
        "WITH p AS (SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) "
        "AS c FROM events), "
        # magnitude-independent leading digit (the engine reduces any
        # magnitude with a tens loop; a CASE capped at a fixed power
        # would silently break digit parity past its bound)
        "lead AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) "
        "AS BIGINT) AS d FROM p WHERE c > 0), "
        "g AS MATERIALIZED (SELECT d, CAST(count(*) AS BIGINT) AS o "
        "FROM lead GROUP BY 1), "
        "n AS (SELECT CAST(sum(o) AS DOUBLE) AS n FROM g) "
        "SELECT d, o, CAST(floor("
        "(CAST(o AS DOUBLE) - n.n * (ln(1.0 + 1.0 / "
        "CAST(d AS DOUBLE)) / ln(10.0))) * "
        "(CAST(o AS DOUBLE) - n.n * (ln(1.0 + 1.0 / "
        "CAST(d AS DOUBLE)) / ln(10.0))) / "
        "(n.n * (ln(1.0 + 1.0 / CAST(d AS DOUBLE)) / ln(10.0))) "
        "* 1e9 + 0.5) AS BIGINT) AS chi_nano FROM g, n"
    )


def q_density_gradient(sf_dir: str):
    """Density gradient field over the 5° event grid (the raster
    derivative — Sobel's geospatial sibling): per-cell central
    differences gx = x[c+1] − x[c−1], gy likewise over the gap-filled
    grid (absent neighbours count 0), magnitude² = gx²+gy² exact
    int64.  One distributed counting pass; the bounded grid finalizes
    on the driver.  Output = the 10 steepest cells (mag² desc, cell
    asc)."""
    m = _grid_cell_counts(sf_dir)
    cells = {(int(r.cx), int(r.cy)): int(r.x) for r in m.itertuples()}
    rows = []
    for (cx, cy), x in cells.items():
        gx = cells.get((cx + 1, cy), 0) - cells.get((cx - 1, cy), 0)
        gy = cells.get((cx, cy + 1), 0) - cells.get((cx, cy - 1), 0)
        rows.append((cx, cy, x, gx * gx + gy * gy))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    rows = rows[:10]
    return pd.DataFrame({
        "cx": np.array([r[0] for r in rows], np.int64),
        "cy": np.array([r[1] for r in rows], np.int64),
        "x": np.array([r[2] for r in rows], np.int64),
        "mag2": np.array([r[3] for r in rows], np.int64)})


def q_density_gradient_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        "WITH p AS (SELECT "
        f"CAST(floor(({lon} + 180.0) / 5.0) AS BIGINT) AS cx, "
        f"CAST(floor(({lat} + 60.0) / 5.0) AS BIGINT) AS cy "
        "FROM events), "
        "c AS MATERIALIZED (SELECT cx, cy, "
        "CAST(count(*) AS BIGINT) AS x FROM p GROUP BY 1, 2), "
        "g AS (SELECT a.cx, a.cy, a.x, "
        "COALESCE(e.x, 0) - COALESCE(w.x, 0) AS gx, "
        "COALESCE(nn.x, 0) - COALESCE(ss.x, 0) AS gy "
        "FROM c a "
        "LEFT JOIN c e ON e.cx = a.cx + 1 AND e.cy = a.cy "
        "LEFT JOIN c w ON w.cx = a.cx - 1 AND w.cy = a.cy "
        "LEFT JOIN c nn ON nn.cx = a.cx AND nn.cy = a.cy + 1 "
        "LEFT JOIN c ss ON ss.cx = a.cx AND ss.cy = a.cy - 1) "
        "SELECT cx, cy, x, CAST(gx * gx + gy * gy AS BIGINT) AS mag2 "
        "FROM g ORDER BY mag2 DESC, cx, cy LIMIT 10"
    )


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

    from .stages.agg_tree import tree_aggregate_to_table

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


def q_rfm_segments(sf_dir: str):
    """RFM (recency / frequency / monetary) user segmentation — the
    two-level marketing rollup: level 1 is a per-user aggregate over
    an UNBOUNDED key space (max ts, count, Σcents — ridden on the
    coarse hash-bucket exchange, one combined pass), level 2 buckets
    each user into fixed 3×3×3 bands and counts segments on the
    bounded combiner tree.  Band edges are fixed constants (hours /
    counts / cents), so everything is exact ints end to end."""
    from .stages.agg_tree import tree_aggregate_to_table
    from .stages.scan import hash_bucket_scan

    def per_user(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        c = np.floor(b["value"].to_numpy(zero_copy_only=False)
                     * 100.0 + 0.5).astype(np.int64)
        t = pa.table({"user_id": b["user_id"],
                      "r": pa.array(ts), "f": pa.array(
                          np.ones(len(ts), np.int64)),
                      "m": pa.array(c)})
        return (t.group_by(["user_id"]).aggregate(
            [("r", "max"), ("f", "sum"), ("m", "sum")])
            .rename_columns(["user_id", "r", "f", "m"]))

    users = hash_bucket_scan(
        _read(sf_dir, "events", ["user_id", "ts", "value"])
        .map_batches(per_user, batch_format="pyarrow"),
        ["user_id"],
        lambda t: (t.group_by(["user_id"]).aggregate(
            [("r", "max"), ("f", "sum"), ("m", "sum")])
            .rename_columns(["user_id", "r", "f", "m"])),
        n_rows=_nrows(sf_dir, "events")).materialize()

    # scale-free band edges: recency relative to the global max ts,
    # frequency / monetary relative to the per-user average (exact
    # integer cross-multiplication, no division)
    u_cnt = users.count()
    n_tot = int(users.sum("f"))
    m_tot = int(users.sum("m"))
    r_max = int(users.max("r"))
    H6 = 6 * 3_600_000_000
    H18 = 18 * 3_600_000_000

    def bands(t: pa.Table) -> pa.Table:
        r = t["r"].to_numpy(zero_copy_only=False)
        f = t["f"].to_numpy(zero_copy_only=False)
        m = t["m"].to_numpy(zero_copy_only=False)
        rb = np.where(r >= r_max - H6, 2,
                      np.where(r >= r_max - H18, 1, 0))
        fb = np.where(12 * f * u_cnt >= 13 * n_tot, 2,
                      np.where(12 * f * u_cnt >= 11 * n_tot, 1, 0))
        mb = np.where(12 * m * u_cnt >= 13 * m_tot, 2,
                      np.where(12 * m * u_cnt >= 11 * m_tot, 1, 0))
        out = pa.table({"rb": pa.array(rb.astype(np.int64)),
                        "fb": pa.array(fb.astype(np.int64)),
                        "mb": pa.array(mb.astype(np.int64)),
                        "n": pa.array(np.ones(len(rb), np.int64))})
        return (out.group_by(["rb", "fb", "mb"]).aggregate(
            [("n", "sum")]).rename_columns(["rb", "fb", "mb", "n"]))

    out = tree_aggregate_to_table(
        users.map_batches(bands, batch_format="pyarrow"),
        ["rb", "fb", "mb"], [("n", "sum")])
    return out.to_pandas().astype(np.int64)


def q_rfm_segments_sql() -> str:
    return (
        "WITH u AS MATERIALIZED (SELECT user_id, "
        "max(epoch_us(ts)) AS r, CAST(count(*) AS BIGINT) AS f, "
        "CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) "
        "AS BIGINT) AS m FROM events GROUP BY 1), "
        "g AS (SELECT CAST(count(*) AS BIGINT) AS uc, "
        "CAST(sum(f) AS BIGINT) AS nt, CAST(sum(m) AS BIGINT) AS mt, "
        "max(r) AS rmax FROM u), "
        "b AS (SELECT "
        f"CASE WHEN r >= rmax - {6 * 3_600_000_000} THEN 2 "
        f"WHEN r >= rmax - {18 * 3_600_000_000} THEN 1 ELSE 0 END "
        "AS rb, "
        "CASE WHEN 12 * f * uc >= 13 * nt THEN 2 "
        "WHEN 12 * f * uc >= 11 * nt THEN 1 ELSE 0 END AS fb, "
        "CASE WHEN 12 * m * uc >= 13 * mt THEN 2 "
        "WHEN 12 * m * uc >= 11 * mt THEN 1 ELSE 0 END AS mb "
        "FROM u, g) "
        "SELECT CAST(rb AS BIGINT) AS rb, CAST(fb AS BIGINT) AS fb, "
        "CAST(mb AS BIGINT) AS mb, CAST(count(*) AS BIGINT) AS n "
        "FROM b GROUP BY 1, 2, 3"
    )


def q_ransac_line(sf_dir: str):
    """RANSAC line fitting over the event point cloud (the robust
    geometry-estimation loop, run data-parallel): 64 DETERMINISTIC
    hypothesis lines (endpoints derived from fixed integer keys — the
    house replacement for random sampling), every (point, hypothesis)
    inlier test vectorized per batch — the cross product is an exact
    int64 in microdegrees and the point-to-line distance is one fixed
    double sequence (divide by a correctly-rounded sqrt) pinned to a
    micro int before the ≤ ε comparison, so the count is bit-stable —
    and per-hypothesis inlier counts merge on the bounded combiner
    tree.  Output = the 5 best hypotheses (inliers desc, k asc).
    Hypotheses broadcast; at 100 TB the shape is unchanged."""
    from .stages.agg_tree import tree_aggregate_to_table

    ks = np.arange(64, dtype=np.int64)
    y1, x1 = derive_latlon(ks * 2 + 1)
    y2, x2 = derive_latlon(ks * 2 + 2)
    x1m = np.floor(x1 * 1e6 + 0.5).astype(np.int64)
    y1m = np.floor(y1 * 1e6 + 0.5).astype(np.int64)
    x2m = np.floor(x2 * 1e6 + 0.5).astype(np.int64)
    y2m = np.floor(y2 * 1e6 + 0.5).astype(np.int64)
    dxm, dym = x2m - x1m, y2m - y1m
    len2 = (dxm * dxm + dym * dym).astype(np.float64)
    eps = 2_000_000  # 2 degrees in micro units

    def partial(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        xm = np.floor(lon * 1e6 + 0.5).astype(np.int64)
        ym = np.floor(lat * 1e6 + 0.5).astype(np.int64)
        cr = (dxm[None, :] * (ym[:, None] - y1m[None, :])
              - dym[None, :] * (xm[:, None] - x1m[None, :]))
        dist = np.floor(np.abs(cr).astype(np.float64)
                        / np.sqrt(len2)[None, :] + 0.5)
        cnt = (dist <= eps).sum(axis=0).astype(np.int64)
        return pa.table({"k": pa.array(ks),
                         "inliers": pa.array(cnt)})

    g = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_id"]).map_batches(
            partial, batch_format="pyarrow"),
        ["k"], [("inliers", "sum")]).to_pandas()
    g = g.sort_values(["inliers", "k"],
                      ascending=[False, True]).head(5)
    return pd.DataFrame({
        "k": g["k"].to_numpy().astype(np.int64),
        "inliers": g["inliers"].to_numpy().astype(np.int64)})


def q_ransac_line_sql() -> str:
    lat, lon = latlon_sql("event_id")
    l1y, l1x = latlon_sql("(k * 2 + 1)")
    l2y, l2x = latlon_sql("(k * 2 + 2)")
    return (
        "WITH h AS MATERIALIZED (SELECT k, "
        f"CAST(floor({l1x} * 1e6 + 0.5) AS BIGINT) AS x1m, "
        f"CAST(floor({l1y} * 1e6 + 0.5) AS BIGINT) AS y1m, "
        f"CAST(floor({l2x} * 1e6 + 0.5) AS BIGINT) AS x2m, "
        f"CAST(floor({l2y} * 1e6 + 0.5) AS BIGINT) AS y2m "
        "FROM range(64) t(k)), "
        "e AS (SELECT "
        f"CAST(floor({lon} * 1e6 + 0.5) AS BIGINT) AS xm, "
        f"CAST(floor({lat} * 1e6 + 0.5) AS BIGINT) AS ym FROM events), "
        "d AS (SELECT h.k, floor(abs(CAST("
        "(x2m - x1m) * (ym - y1m) - (y2m - y1m) * (xm - x1m) "
        "AS DOUBLE)) / sqrt(CAST((x2m - x1m) * (x2m - x1m) "
        "+ (y2m - y1m) * (y2m - y1m) AS DOUBLE)) + 0.5) AS dist "
        "FROM e, h) "
        "SELECT CAST(k AS BIGINT) AS k, "
        "CAST(sum(CASE WHEN dist <= 2000000 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS inliers "
        "FROM d GROUP BY 1 ORDER BY inliers DESC, k LIMIT 5"
    )


def q_mutual_info(sf_dir: str):
    """Mutual information between event_type and a fixed value band
    (the feature-relevance screen; the categorical sibling of
    q_js_divergence): the contingency table rides the bounded
    combiner tree as exact int counts (≤ |types|·4 cells), each
    cell's (c/N)·ln(N·c/(r·s)) is a fixed double sequence pinned to a
    nano int, and MI is the exact int sum of the pins.  Bands are
    floor(value/25) clamped to [0, 3]."""
    from .stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        band = np.clip((b["value"].to_numpy(zero_copy_only=False)
                        // 25.0).astype(np.int64), 0, 3)
        t = pa.table({"event_type": b["event_type"],
                      "band": pa.array(band),
                      "c": pa.array(np.ones(len(band), np.int64))})
        return (t.group_by(["event_type", "band"]).aggregate(
            [("c", "sum")]).rename_columns(["event_type", "band", "c"]))

    g = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_type", "value"]).map_batches(
            partial, batch_format="pyarrow"),
        ["event_type", "band"], [("c", "sum")]).to_pandas()
    n = int(g["c"].sum())
    r = g.groupby("event_type")["c"].transform("sum").to_numpy() \
         .astype(np.int64)
    s = g.groupby("band")["c"].transform("sum").to_numpy() \
         .astype(np.int64)
    c = g["c"].to_numpy().astype(np.int64)
    term = (c.astype(np.float64) / float(n)) * np.log(
        float(n) * c.astype(np.float64)
        / (r * s).astype(np.float64))
    pins = np.floor(term * 1e9 + 0.5).astype(np.int64)
    return pd.DataFrame({"n_cells": [np.int64(len(c))],
                         "mi_nano": [np.int64(int(pins.sum()))]})


def q_mutual_info_sql() -> str:
    return (
        "WITH p AS (SELECT event_type, "
        "least(greatest(CAST(floor(value / 25.0) AS BIGINT), 0), 3) "
        "AS band FROM events), "
        "g AS MATERIALIZED (SELECT event_type, band, "
        "CAST(count(*) AS BIGINT) AS c FROM p GROUP BY 1, 2), "
        "n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM g), "
        "r AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS r "
        "FROM g GROUP BY 1), "
        "s AS (SELECT band, CAST(sum(c) AS BIGINT) AS s "
        "FROM g GROUP BY 1), "
        "t AS (SELECT CAST(floor((CAST(c AS DOUBLE) / "
        "CAST(n.n AS DOUBLE)) * ln(CAST(n.n AS DOUBLE) * "
        "CAST(c AS DOUBLE) / CAST(r.r * s.s AS DOUBLE)) * 1e9 + 0.5) "
        "AS BIGINT) AS pin FROM g "
        "JOIN r ON g.event_type = r.event_type "
        "JOIN s ON g.band = s.band, n) "
        "SELECT CAST(count(*) AS BIGINT) AS n_cells, "
        "CAST(sum(pin) AS BIGINT) AS mi_nano FROM t"
    )


def q_getis_ord(sf_dir: str):
    """Getis-Ord Gi* hot-spot detection over the same 5° event grid
    as q_morans_i (the per-cell LOCAL autocorrelation statistic —
    Moran's I is the global one): one distributed counting pass, then
    per-cell Gi* on the driver's bounded cell table.  All moment
    ingredients (n, Σx, Σx², the 9-cell neighbourhood sum Lᵢ and size
    Wᵢ, self included) are exact ints; the Gi* finalize is a fixed
    per-cell double sequence (two correctly-rounded sqrts) pinned to
    nano.  Output = the 15 hottest cells (gi desc, cell asc) — the
    standard hot-spot readout."""
    m = _grid_cell_counts(sf_dir)
    cells = {(int(r.cx), int(r.cy)): int(r.x) for r in m.itertuples()}
    n = len(cells)
    sx = sum(cells.values())
    sxx = sum(v * v for v in cells.values())
    nd, xb = float(n), float(sx) / float(n)
    s = np.sqrt(float(sxx) / nd - xb * xb)
    rows = []
    for (cx, cy), x in cells.items():
        li, wi = 0, 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                xj = cells.get((cx + dx, cy + dy))
                if xj is not None:
                    li += xj
                    wi += 1
        wd = float(wi)
        den = s * np.sqrt((nd * wd - wd * wd) / (nd - 1.0))
        gi = (float(li) - xb * wd) / den
        rows.append((cx, cy, x, int(np.floor(gi * 1e9 + 0.5))))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    rows = rows[:15]
    return pd.DataFrame({
        "cx": np.array([r[0] for r in rows], np.int64),
        "cy": np.array([r[1] for r in rows], np.int64),
        "x": np.array([r[2] for r in rows], np.int64),
        "gi_nano": np.array([r[3] for r in rows], np.int64)})


def q_getis_ord_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        "WITH p AS (SELECT "
        f"CAST(floor(({lon} + 180.0) / 5.0) AS BIGINT) AS cx, "
        f"CAST(floor(({lat} + 60.0) / 5.0) AS BIGINT) AS cy "
        "FROM events), "
        "c AS MATERIALIZED (SELECT cx, cy, "
        "CAST(count(*) AS BIGINT) AS x FROM p GROUP BY 1, 2), "
        "s AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(x) AS BIGINT) AS sx, "
        "CAST(sum(x * x) AS BIGINT) AS sxx FROM c), "
        "nb AS (SELECT a.cx, a.cy, a.x, "
        "CAST(sum(b.x) AS BIGINT) AS li, "
        "CAST(count(*) AS BIGINT) AS wi FROM c a JOIN c b ON "
        "abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1 "
        "GROUP BY 1, 2, 3), "
        "g AS (SELECT cx, cy, x, CAST(floor("
        "(CAST(li AS DOUBLE) - (CAST(sx AS DOUBLE) / "
        "CAST(n AS DOUBLE)) * CAST(wi AS DOUBLE)) / "
        "(sqrt(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) - "
        "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * "
        "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) * "
        "sqrt((CAST(n AS DOUBLE) * CAST(wi AS DOUBLE) - "
        "CAST(wi AS DOUBLE) * CAST(wi AS DOUBLE)) / "
        "(CAST(n AS DOUBLE) - 1.0))) * 1e9 + 0.5) AS BIGINT) "
        "AS gi_nano FROM nb, s) "
        "SELECT cx, cy, x, gi_nano FROM g "
        "ORDER BY gi_nano DESC, cx, cy LIMIT 15"
    )


def q_zipf_slope(sf_dir: str):
    """Zipf's-law fit over the token frequency distribution: the OLS
    slope of ln(count) on ln(rank) across the top-100 tokens — the
    corpus-statistics health check for training data.  Distributed
    wordcount (per-batch np.unique combiners → open-vocabulary hash
    exchange), top-100 via the pre-reduced distributed top-k
    (count desc, token asc — deterministic), then both logs pin to
    nano ints per row and the OLS moments (Σx, Σy, Σxy, Σx², n) are
    exact Python bigints over the 100-row table; the final slope is
    one double division pinned to micro."""
    from .stages.scan import hash_bucket_scan
    from .stages.topk import top_k

    n_docs = _nrows(sf_dir, "documents")

    def unigram_counts(b: pd.DataFrame) -> pd.DataFrame:
        return _unigram_count_df(b["text"])

    counts = hash_bucket_scan(
        _read(sf_dir, "documents", ["text"]).map_batches(
            unigram_counts, batch_format="pandas"),
        ["tok"],
        lambda t: t.group_by(["tok"]).aggregate([("n", "sum")])
        .rename_columns(["tok", "n"]),
        n_rows=n_docs)
    top = top_k(counts, "n", 100, descending=True,
                tiebreak_col="tok").to_pandas()
    k = len(top)
    r = np.arange(1, k + 1, dtype=np.float64)
    x = np.floor(np.log(r) * 1e9 + 0.5).astype(np.int64)
    y = np.floor(np.log(top["n"].to_numpy().astype(np.float64))
                 * 1e9 + 0.5).astype(np.int64)
    xs = [int(v) for v in x]
    ys = [int(v) for v in y]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    num = k * sxy - sx * sy
    den = k * sxx - sx * sx
    slope_micro = int(np.floor(float(num) / float(den) * 1e6 + 0.5))
    return pd.DataFrame({"n_tokens": [np.int64(k)],
                         "top_tok": [str(top["tok"].iloc[0])],
                         "slope_micro": [np.int64(slope_micro)]})


def q_zipf_slope_sql() -> str:
    return (
        "WITH toks AS (SELECT "
        "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok "
        "FROM documents), "
        "cu AS (SELECT tok, CAST(count(*) AS BIGINT) AS n "
        "FROM toks GROUP BY 1), "
        "top AS MATERIALIZED (SELECT tok, n, "
        "row_number() OVER (ORDER BY n DESC, tok) AS r "
        "FROM cu ORDER BY n DESC, tok LIMIT 100), "
        "pin AS (SELECT tok, r, "
        "CAST(floor(ln(CAST(r AS DOUBLE)) * 1e9 + 0.5) AS HUGEINT) "
        "AS x, "
        "CAST(floor(ln(CAST(n AS DOUBLE)) * 1e9 + 0.5) AS HUGEINT) "
        "AS y FROM top), "
        "m AS (SELECT CAST(count(*) AS HUGEINT) AS k, sum(x) AS sx, "
        "sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx, "
        "min(CASE WHEN r = 1 THEN tok END) AS top_tok FROM pin) "
        "SELECT CAST(k AS BIGINT) AS n_tokens, top_tok, "
        "CAST(floor(CAST(k * sxy - sx * sy AS DOUBLE) / "
        "CAST(k * sxx - sx * sx AS DOUBLE) * 1e6 + 0.5) AS BIGINT) "
        "AS slope_micro FROM m"
    )


def q_js_divergence(sf_dir: str):
    """Jensen-Shannon divergence between the token distributions of
    the two doc_id-parity cohorts — the categorical drift detector
    (the numeric twin is q_ks_drift): per-(token, cohort) counts on
    the open-vocabulary hash exchange (both cohorts of a token land
    in the same bucket, so the bucket pass pivots straight to
    (tok, c0, c1)); cohort totals are exact int sums; each token's
    contribution p·ln(p/m) + q·ln(q/m) is a fixed double sequence
    pinned to a nano int per TOKEN, and the JS total is the exact
    int sum of those pins (distributed tree), so the result is
    bit-stable under any partitioning.  js/2 in nats, ∈ [0, ln 2]."""
    from .stages.agg_tree import tree_aggregate_to_table
    from .stages.scan import hash_bucket_scan

    n_docs = _nrows(sf_dir, "documents")

    def cohort_counts(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.lower().str.findall(r"[a-z0-9]+")
        coh = (b["doc_id"].to_numpy() % 2).astype(np.int64)
        xs, cs = [], []
        for t, c in zip(toks, coh):
            if len(t):
                xs.append(np.asarray(t, dtype=object))
                cs.append(np.full(len(t), c, np.int64))
        if not xs:
            return pd.DataFrame({"tok": np.array([], object),
                                 "c0": np.array([], np.int64),
                                 "c1": np.array([], np.int64)})
        df = pd.DataFrame({"tok": np.concatenate(xs),
                           "coh": np.concatenate(cs)})
        g = df.groupby(["tok", "coh"], sort=False).size().reset_index()
        cnt = g[0].to_numpy().astype(np.int64)
        c = g["coh"].to_numpy()
        return pd.DataFrame({"tok": g["tok"].astype(str),
                             "c0": np.where(c == 0, cnt, 0),
                             "c1": np.where(c == 1, cnt, 0)})

    counts = hash_bucket_scan(
        _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            cohort_counts, batch_format="pandas"),
        ["tok"],
        lambda t: t.group_by(["tok"]).aggregate(
            [("c0", "sum"), ("c1", "sum")])
        .rename_columns(["tok", "c0", "c1"]),
        n_rows=n_docs).materialize()
    n0 = float(int(counts.sum("c0")))
    n1 = float(int(counts.sum("c1")))

    def term(t: pa.Table) -> pa.Table:
        c0 = t["c0"].to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = t["c1"].to_numpy(zero_copy_only=False).astype(np.float64)
        p = c0 / n0
        q = c1 / n1
        m = (p + q) / 2.0
        with np.errstate(divide="ignore", invalid="ignore"):
            tp = np.where(p > 0.0, p * np.log(p / m), 0.0)
            tq = np.where(q > 0.0, q * np.log(q / m), 0.0)
        pin = np.floor((tp + tq) * 1e9 + 0.5).astype(np.int64)
        return pa.table({
            "n_tokens": pa.array(np.ones(len(pin), np.int64)),
            "js2_nano": pa.array(pin)})

    tot = tree_aggregate_to_table(
        counts.map_batches(term, batch_format="pyarrow")
        .map_batches(lambda t: t.append_column(
            "_g", pa.array(np.zeros(len(t), np.int64))),
            batch_format="pyarrow"),
        ["_g"], [("n_tokens", "sum"), ("js2_nano", "sum")]).to_pandas()
    return pd.DataFrame({
        "n_tokens": tot["n_tokens"].to_numpy().astype(np.int64),
        "js2_nano": tot["js2_nano"].to_numpy().astype(np.int64)})


def q_js_divergence_sql() -> str:
    return (
        "WITH toks AS (SELECT doc_id % 2 AS coh, "
        "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok "
        "FROM documents), "
        "c AS MATERIALIZED (SELECT tok, "
        "CAST(sum(CASE WHEN coh = 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS c0, "
        "CAST(sum(CASE WHEN coh = 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS c1 FROM toks GROUP BY 1), "
        "n AS (SELECT CAST(sum(c0) AS DOUBLE) AS n0, "
        "CAST(sum(c1) AS DOUBLE) AS n1 FROM c), "
        "t AS (SELECT CAST(floor(( "
        "CASE WHEN c0 > 0 THEN (c0 / n0) * ln((c0 / n0) / "
        "(((c0 / n0) + (c1 / n1)) / 2.0)) ELSE 0.0 END + "
        "CASE WHEN c1 > 0 THEN (c1 / n1) * ln((c1 / n1) / "
        "(((c0 / n0) + (c1 / n1)) / 2.0)) ELSE 0.0 END"
        ") * 1e9 + 0.5) AS BIGINT) AS pin FROM c, n) "
        "SELECT CAST(count(*) AS BIGINT) AS n_tokens, "
        "CAST(sum(pin) AS BIGINT) AS js2_nano FROM t"
    )


def q_target_encode(sf_dir: str):
    """Smoothed target encoding of event_type against value (the
    categorical-feature ML-prep transform): per-type (n, Σcents)
    int partials on the bounded combiner tree, global mean from the
    same partials, then enc = (s + m·μ)/(n + m) with m = 10 — a fixed
    double sequence per type, pinned micro.  One data pass; at
    unbounded key spaces the partials ride the hash-bucket exchange
    instead (q_group_concat shape)."""
    from .stages.agg_tree import tree_aggregate_to_table

    M = 10.0

    def partial(b: pa.Table) -> pa.Table:
        c = np.floor(b["value"].to_numpy(zero_copy_only=False)
                     * 100.0 + 0.5).astype(np.int64)
        t = pa.table({"event_type": b["event_type"],
                      "n": pa.array(np.ones(len(c), np.int64)),
                      "s": pa.array(c)})
        return (t.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("s", "sum")])
            .rename_columns(["event_type", "n", "s"]))

    g = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_type", "value"]).map_batches(
            partial, batch_format="pyarrow"),
        ["event_type"], [("n", "sum"), ("s", "sum")]).to_pandas()
    n = g["n"].to_numpy().astype(np.float64)
    s = g["s"].to_numpy().astype(np.float64)
    mu = float(int(g["s"].sum())) / float(int(g["n"].sum()))
    enc = (s + M * mu) / (n + M)
    return pd.DataFrame({
        "event_type": g["event_type"].astype(str),
        "n": g["n"].to_numpy().astype(np.int64),
        "enc_micro": np.floor(enc * 1e6 + 0.5).astype(np.int64)})


def q_target_encode_sql() -> str:
    return (
        "WITH p AS (SELECT event_type, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c FROM events), "
        "g AS MATERIALIZED (SELECT event_type, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(c) AS BIGINT) AS s FROM p GROUP BY 1), "
        "t AS (SELECT CAST(sum(s) AS DOUBLE) / CAST(sum(n) AS DOUBLE) "
        "AS mu FROM g) "
        "SELECT event_type, n, "
        "CAST(floor((CAST(s AS DOUBLE) + 10.0 * mu) / "
        "(CAST(n AS DOUBLE) + 10.0) * 1e6 + 0.5) AS BIGINT) "
        "AS enc_micro FROM g, t"
    )


def q_glcm_texture(sf_dir: str):
    """Hash verification of GLCM TEXTURE features (Haralick's
    gray-level co-occurrence matrix at offset (+1, 0)): per image,
    contrast = Σ_pairs (l₁−l₂)² straight off the luma plane and
    energy = Σ_{(l₁,l₂)} c(l₁,l₂)² off the pair histogram — both
    exact ints (pairs ≤ 64·63, energy ≤ ~1.6e7).  The oracle rebuilds
    the plane from the pixel generator and takes the horizontal
    neighbour equijoin.  Same head-K / scale caveats as
    image_checksum."""
    import pyarrow.dataset as pds
    import ray.data

    from .fixtures import ensure_images_parquet, scale_for_sf_dir
    from .functions.image_codec import decode_image

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)

    def glcm(b: pa.Table) -> pa.Table:
        blobs = b["bytes"].to_pylist()
        fmts = b["fmt"].to_pylist()
        con = np.empty(len(blobs), np.int64)
        ene = np.empty(len(blobs), np.int64)
        for i in range(len(blobs)):
            img = decode_image(blobs[i], fmts[i]).astype(np.int64)
            y = (77 * img[:, :, 0] + 150 * img[:, :, 1]
                 + 29 * img[:, :, 2]) >> 8
            l1, l2 = y[:, :-1].ravel(), y[:, 1:].ravel()
            d = l1 - l2
            con[i] = int((d * d).sum())
            _, counts = np.unique(l1 * 256 + l2, return_counts=True)
            ene[i] = int((counts * counts).sum())
        return pa.table({"image_id": b["image_id"],
                         "contrast": pa.array(con),
                         "energy": pa.array(ene)})

    return ds.map_batches(glcm, batch_format="pyarrow", batch_size=128)


def q_glcm_texture_sql() -> str:
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "pr AS MATERIALIZED (SELECT a.i, a.l AS l1, b.l AS l2 "
        "FROM lum a JOIN lum b ON a.i = b.i AND a.y = b.y "
        "AND b.x = a.x + 1), "
        "con AS (SELECT i, CAST(sum((l1 - l2) * (l1 - l2)) AS BIGINT) "
        "AS contrast FROM pr GROUP BY 1), "
        "h AS (SELECT i, l1, l2, CAST(count(*) AS BIGINT) AS c "
        "FROM pr GROUP BY 1, 2, 3), "
        "ene AS (SELECT i, CAST(sum(c * c) AS BIGINT) AS energy "
        "FROM h GROUP BY 1) "
        "SELECT 'img_' || lpad(CAST(con.i AS VARCHAR), 12, '0') "
        "AS image_id, contrast, energy "
        "FROM con JOIN ene ON con.i = ene.i"
    )


def q_sobel_octants(sf_dir: str):
    """Hash verification of the SOBEL EDGE-ORIENTATION histogram (the
    HOG building block): 3×3 integer Sobel gradients over interior
    luma pixels, orientation binned into 8 octants by PURE INTEGER
    predicates — bin = quadrant(gx, gy)·2 + [|gy| > |gx|] — so there
    is no atan2 and no float anywhere; zero-gradient pixels count in
    a separate ``flat`` column.  The oracle replays the stencil as
    eight neighbour equijoins over the generator plane.  Same head-K
    / scale caveats as image_checksum."""
    import pyarrow.dataset as pds
    import ray.data

    from .fixtures import ensure_images_parquet, scale_for_sf_dir
    from .functions.image_codec import decode_image

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)

    def sobel(b: pa.Table) -> pa.Table:
        blobs = b["bytes"].to_pylist()
        fmts = b["fmt"].to_pylist()
        out = np.zeros((len(blobs), 9), np.int64)
        for i in range(len(blobs)):
            img = decode_image(blobs[i], fmts[i]).astype(np.int64)
            y = (77 * img[:, :, 0] + 150 * img[:, :, 1]
                 + 29 * img[:, :, 2]) >> 8
            gx = (y[:-2, 2:] + 2 * y[1:-1, 2:] + y[2:, 2:]
                  - y[:-2, :-2] - 2 * y[1:-1, :-2] - y[2:, :-2])
            gy = (y[2:, :-2] + 2 * y[2:, 1:-1] + y[2:, 2:]
                  - y[:-2, :-2] - 2 * y[:-2, 1:-1] - y[:-2, 2:])
            flat = (gx == 0) & (gy == 0)
            quad = np.where(gx >= 0, np.where(gy >= 0, 0, 3),
                            np.where(gy >= 0, 1, 2))
            b8 = quad * 2 + (np.abs(gy) > np.abs(gx))
            cnt = np.bincount(b8[~flat].ravel(), minlength=8)
            out[i, :8] = cnt
            out[i, 8] = int(flat.sum())
        cols = {"image_id": b["image_id"]}
        for j in range(8):
            cols[f"b{j}"] = pa.array(out[:, j])
        cols["flat"] = pa.array(out[:, 8])
        return pa.table(cols)

    return ds.map_batches(sobel, batch_format="pyarrow", batch_size=128)


def q_sobel_octants_sql() -> str:
    bins = ", ".join(
        f"CAST(sum(CASE WHEN NOT (gx = 0 AND gy = 0) AND "
        f"(CASE WHEN gx >= 0 THEN (CASE WHEN gy >= 0 THEN 0 ELSE 3 "
        f"END) ELSE (CASE WHEN gy >= 0 THEN 1 ELSE 2 END) END) * 2 "
        f"+ (CASE WHEN abs(gy) > abs(gx) THEN 1 ELSE 0 END) = {j} "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS b{j}" for j in range(8))
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "g AS MATERIALIZED (SELECT c.i, "
        "(ne.l + 2 * e.l + se.l - nw.l - 2 * w.l - sw.l) AS gx, "
        "(sw.l + 2 * s.l + se.l - nw.l - 2 * n.l - ne.l) AS gy "
        "FROM lum c "
        "JOIN lum nw ON nw.i = c.i AND nw.x = c.x - 1 AND nw.y = c.y - 1 "
        "JOIN lum n  ON n.i  = c.i AND n.x  = c.x     AND n.y  = c.y - 1 "
        "JOIN lum ne ON ne.i = c.i AND ne.x = c.x + 1 AND ne.y = c.y - 1 "
        "JOIN lum w  ON w.i  = c.i AND w.x  = c.x - 1 AND w.y  = c.y "
        "JOIN lum e  ON e.i  = c.i AND e.x  = c.x + 1 AND e.y  = c.y "
        "JOIN lum sw ON sw.i = c.i AND sw.x = c.x - 1 AND sw.y = c.y + 1 "
        "JOIN lum s  ON s.i  = c.i AND s.x  = c.x     AND s.y  = c.y + 1 "
        "JOIN lum se ON se.i = c.i AND se.x = c.x + 1 AND se.y = c.y + 1 "
        "WHERE c.x BETWEEN 1 AND c.side - 2 "
        "AND c.y BETWEEN 1 AND c.side - 2) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') "
        "AS image_id, " + bins + ", "
        "CAST(sum(CASE WHEN gx = 0 AND gy = 0 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS flat FROM g GROUP BY 1"
    )


_QT_VAR_T = 220  # split a block when its luma variance exceeds this


def q_quadtree_leaves(sf_dir: str):
    """Hash verification of VARIANCE-SPLIT QUADTREE coding (the
    adaptive raster tiling that q_adaptive_tiles does for the globe,
    applied per image): a block splits when its integer variance
    witness n·Σl² − (Σl)² exceeds T·n² (exact ints; T = 220), down to
    depth 3; block ids use (coord·2^ℓ)//side so non-power-of-two
    sides partition cleanly.  A level-ℓ block is a leaf when every
    ancestor split and it does not (depth-3 blocks are leaves
    whenever reached).  Output = per-image leaf counts per level.
    Oracle replays the pyramid as four grouped scans over the
    generator plane joined down the ancestor chain.  Same head-K /
    scale caveats as image_checksum."""
    import pyarrow.dataset as pds
    import ray.data

    from .fixtures import ensure_images_parquet, scale_for_sf_dir
    from .functions.image_codec import decode_image

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)

    def quadtree(b: pa.Table) -> pa.Table:
        blobs = b["bytes"].to_pylist()
        fmts = b["fmt"].to_pylist()
        out = np.zeros((len(blobs), 4), np.int64)
        for i in range(len(blobs)):
            img = decode_image(blobs[i], fmts[i]).astype(np.int64)
            y = (77 * img[:, :, 0] + 150 * img[:, :, 1]
                 + 29 * img[:, :, 2]) >> 8
            side = y.shape[0]
            xs = np.arange(side, dtype=np.int64)
            split = []
            for lv in range(4):
                m = 1 << lv
                bid = (xs * m) // side
                bx = bid[None, :].repeat(side, 0)
                by = bid[:, None].repeat(side, 1)
                flat = (by * m + bx).ravel()
                n = np.bincount(flat, minlength=m * m)
                s = np.bincount(flat, weights=y.ravel().astype(
                    np.float64), minlength=m * m).astype(np.int64)
                ss = np.bincount(flat, weights=(y * y).ravel().astype(
                    np.float64), minlength=m * m).astype(np.int64)
                split.append((n * ss - s * s)
                             > _QT_VAR_T * n * n)
            alive = np.array([True])
            for lv in range(4):
                m = 1 << lv
                if lv > 0:
                    pm = m // 2
                    idx = np.arange(m * m)
                    pby, pbx = (idx // m) // 2, (idx % m) // 2
                    pidx = pby * pm + pbx
                    alive = alive[pidx] & split[lv - 1][pidx]
                if lv < 3:
                    out[i, lv] = int((alive & ~split[lv]).sum())
                else:
                    out[i, lv] = int(alive.sum())
        return pa.table({"image_id": b["image_id"],
                         "l0": pa.array(out[:, 0]),
                         "l1": pa.array(out[:, 1]),
                         "l2": pa.array(out[:, 2]),
                         "l3": pa.array(out[:, 3])})

    return ds.map_batches(quadtree, batch_format="pyarrow",
                          batch_size=128)


def q_quadtree_leaves_sql() -> str:
    t = _QT_VAR_T
    lvl = []
    for lv in range(4):
        m = 1 << lv
        lvl.append(
            f"b{lv} AS MATERIALIZED (SELECT i, "
            f"(x * {m}) // side AS bx, (y * {m}) // side AS by, "
            f"CAST(count(*) AS BIGINT) AS n, "
            f"CAST(sum(l) AS BIGINT) AS s, "
            f"CAST(sum(l * l) AS BIGINT) AS ss "
            f"FROM lum GROUP BY 1, 2, 3)")
    sp = [f"(b{lv}.n * b{lv}.ss - b{lv}.s * b{lv}.s > "
          f"{t} * b{lv}.n * b{lv}.n)" for lv in range(4)]
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        + ", ".join(lvl) + ", "
        "leaves AS ("
        f"SELECT i, 0 AS lvl FROM b0 WHERE NOT {sp[0]} "
        "UNION ALL "
        "SELECT b1.i, 1 FROM b1 JOIN b0 ON b0.i = b1.i "
        f"WHERE {sp[0]} AND NOT {sp[1]} "
        "UNION ALL "
        "SELECT b2.i, 2 FROM b2 "
        "JOIN b1 ON b1.i = b2.i AND b1.bx = b2.bx // 2 "
        "AND b1.by = b2.by // 2 "
        "JOIN b0 ON b0.i = b2.i "
        f"WHERE {sp[0]} AND {sp[1]} AND NOT {sp[2]} "
        "UNION ALL "
        "SELECT b3.i, 3 FROM b3 "
        "JOIN b2 ON b2.i = b3.i AND b2.bx = b3.bx // 2 "
        "AND b2.by = b3.by // 2 "
        "JOIN b1 ON b1.i = b3.i AND b1.bx = b3.bx // 4 "
        "AND b1.by = b3.by // 4 "
        "JOIN b0 ON b0.i = b3.i "
        f"WHERE {sp[0]} AND {sp[1]} AND {sp[2]}) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') "
        "AS image_id, "
        "CAST(sum(CASE WHEN lvl = 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS l0, "
        "CAST(sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS l1, "
        "CAST(sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS l2, "
        "CAST(sum(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS l3 FROM leaves GROUP BY 1"
    )


def _batch_token_runs(texts: pd.Series):
    """(flat token array, per-doc offsets) for one batch — the shared
    tokenize step of the n-gram counting kernels."""
    toks = texts.str.lower().str.findall(r"[a-z0-9]+")
    arrs = [np.asarray(t, dtype=object) for t in toks]
    lens = np.array([len(a) for a in arrs], np.int64)
    flat = np.concatenate([a for a in arrs if len(a)]
                          or [np.array([], object)])
    offs = np.concatenate([[0], np.cumsum(lens)])
    return flat, offs


def _bigram_pair_counts(flat: np.ndarray, offs: np.ndarray):
    """Adjacent-pair counts without an object-keyed groupby: factorize
    once, count int pair codes (code_x·V + code_y) with np.unique on
    int64 — ~10× the throughput of a pandas object-pair groupby on
    repetitive corpora.  Pairs spanning doc boundaries drop."""
    if len(flat) < 2:
        e = np.array([], object)
        return e, e, np.array([], np.int64)
    codes, uniq = pd.factorize(flat)
    v = len(uniq)
    valid = np.ones(len(flat) - 1, dtype=bool)
    starts = offs[1:-1]
    starts = starts[(starts > 0) & (starts < len(flat))]
    valid[starts - 1] = False  # pair (s-1, s) straddles two docs
    key = codes[:-1].astype(np.int64) * v + codes[1:]
    uk, cnt = np.unique(key[valid], return_counts=True)
    return (uniq[uk // v].astype(object), uniq[uk % v].astype(object),
            cnt.astype(np.int64))


def _unigram_count_df(texts: pd.Series) -> pd.DataFrame:
    """Per-batch token counts via hash factorize + bincount (O(n)
    object hashing; np.unique's comparison sort is ~2× slower on
    repetitive corpora)."""
    flat, _ = _batch_token_runs(texts)
    if not len(flat):
        return pd.DataFrame({"tok": np.array([], object),
                             "n": np.array([], np.int64)})
    codes, uniq = pd.factorize(flat)
    return pd.DataFrame({"tok": uniq.astype(str),
                         "n": np.bincount(codes).astype(np.int64)})


def _copart_lookup(rows, lut, key_col: str, out_col: str, n_rows: int):
    """Attach ``lut`` (columns ``_lk`` string / ``_lv`` int64) values
    to ``rows`` on ``rows[key_col]`` (string) as ``out_col`` — one
    string-keyed hash-bucket co-partition + a compiled Acero join per
    bucket (the open-vocabulary join shape; neither side is assumed
    to fit a worker).  Inner join: rows without a lut hit drop."""
    import pyarrow.compute as pc

    from .stages.scan import hash_bucket_scan

    rs = rows.schema()
    row_cols = list(zip(rs.names, rs.types))

    def pad_rows(t: pa.Table) -> pa.Table:
        t = t.append_column("_lk", pa.nulls(len(t), pa.string()))
        t = t.append_column("_lv", pa.nulls(len(t), pa.int64()))
        t = t.append_column("_jk", t[key_col])
        return t.select(sorted(t.column_names))

    def pad_lut(t: pa.Table) -> pa.Table:
        for name, typ in row_cols:
            t = t.append_column(name, pa.nulls(len(t), typ))
        t = t.append_column("_jk", t["_lk"])
        return t.select(sorted(t.column_names))

    def join(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_jk"]).combine_chunks()
        is_lut = pc.invert(pc.is_null(t["_lk"]))
        lu = (t.filter(is_lut).select(["_lk", "_lv"])
              .rename_columns(["_k", out_col]))
        r = t.filter(pc.invert(is_lut)).drop_columns(["_lk", "_lv"])
        j = r.join(lu, keys=[key_col], right_keys=["_k"],
                   join_type="inner")
        return j.set_column(j.column_names.index(out_col), out_col,
                            j[out_col].cast(pa.int64()))

    return hash_bucket_scan(
        rows.map_batches(pad_rows, batch_format="pyarrow").union(
            lut.map_batches(pad_lut, batch_format="pyarrow")),
        ["_jk"], join, n_rows=n_rows)


_LM_COUNTS_CACHE: dict[str, object] = {}


def _corpus_unigram_counts(sf_dir: str):
    """Materialized (tok, n) corpus unigram-count Dataset — ONE
    tokenize pass + one token hash exchange, cached per sf_dir for
    the session.  q_unigram_logprob, q_pmi_bigrams and q_bigram_ppl
    all need exactly this pass; the first caller builds it and the
    rest reuse (fixture dirs are immutable; one sf_dir retained so
    the object-store footprint stays one vocabulary table)."""
    key = ("uni", sf_dir)
    if key in _LM_COUNTS_CACHE:
        return _LM_COUNTS_CACHE[key]
    from .stages.scan import hash_bucket_scan

    uni = hash_bucket_scan(
        _read(sf_dir, "documents", ["text"]).map_batches(
            lambda b: _unigram_count_df(b["text"]),
            batch_format="pandas"),
        ["tok"],
        lambda t: t.group_by(["tok"]).aggregate([("n", "sum")])
        .rename_columns(["tok", "n"]),
        n_rows=_nrows(sf_dir, "documents")).materialize()
    for k in [k for k in _LM_COUNTS_CACHE if k[0] == "uni"]:
        del _LM_COUNTS_CACHE[k]
    _LM_COUNTS_CACHE[key] = uni
    return uni


def _corpus_bigram_counts(sf_dir: str):
    """Materialized (x, y, cnt) corpus adjacent-bigram-count Dataset —
    one tokenize + int-coded pair-count pass and one pair hash
    exchange, cached per sf_dir like :func:`_corpus_unigram_counts`
    (shared by q_pmi_bigrams and q_bigram_ppl, which previously each
    ran their own pass)."""
    key = ("bg", sf_dir)
    if key in _LM_COUNTS_CACHE:
        return _LM_COUNTS_CACHE[key]
    from .stages.scan import hash_bucket_scan

    def bigram_counts(b: pd.DataFrame) -> pd.DataFrame:
        flat, offs = _batch_token_runs(b["text"])
        x, y, cnt = _bigram_pair_counts(flat, offs)
        return pd.DataFrame({"x": x.astype(str), "y": y.astype(str),
                             "cnt": cnt})

    bg = hash_bucket_scan(
        _read(sf_dir, "documents", ["text"]).map_batches(
            bigram_counts, batch_format="pandas"),
        ["x", "y"],
        lambda t: t.group_by(["x", "y"]).aggregate([("cnt", "sum")])
        .rename_columns(["x", "y", "cnt"]),
        n_rows=_nrows(sf_dir, "documents")).materialize()
    for k in [k for k in _LM_COUNTS_CACHE if k[0] == "bg"]:
        del _LM_COUNTS_CACHE[k]
    _LM_COUNTS_CACHE[key] = bg
    return bg


def q_bigram_ppl(sf_dir: str):
    """Per-document corpus-LM log-likelihood (the perplexity quality
    filter every LLM data pipeline runs): an add-one-smoothed bigram
    model p(y|x) = (c_xy+1)/(c_x+V) is fit on the WHOLE corpus —
    distributed bigram and unigram counts, open vocabulary — and
    scored over the first 200 docs.  The scored-doc key set is
    bounded, so it broadcasts and filters the bigram-count partials
    BELOW the shuffle (semi-join pushdown: the exchange carries only
    probe-set keys; with the int-coded pair counting this took the
    sf0.1 wall time 22 s → ~8 s — the rest is five fixed-cost
    exchanges);
    parameters then attach via TWO string-keyed co-partition lookups
    (_copart_lookup — correct for unbounded probe sets too), each
    bigram's ln p pins to a nano int, and per-doc sums are exact
    integer adds on the bounded combiner tree.  Output = (doc_id,
    n_bigrams, lp_sum_nano); docs with < 2 tokens drop (no
    bigrams)."""
    import pyarrow.compute as pc

    from .stages.agg_tree import tree_aggregate_to_table

    n_docs = _nrows(sf_dir, "documents")
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def doc_bigrams(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["doc_id"] < 200]
        toks = b["text"].str.lower().str.findall(r"[a-z0-9]+")
        ids, xs, ys = [], [], []
        for d, t in zip(b["doc_id"].to_numpy(), toks):
            if len(t) > 1:
                a = np.asarray(t, dtype=object)
                xs.append(a[:-1])
                ys.append(a[1:])
                ids.append(np.full(len(t) - 1, d, np.int64))
        if not xs:
            return pd.DataFrame({"doc_id": np.array([], np.int64),
                                 "x": np.array([], object),
                                 "y": np.array([], object),
                                 "occ": np.array([], np.int64)})
        df = pd.DataFrame({"doc_id": np.concatenate(ids),
                           "x": np.concatenate(xs),
                           "y": np.concatenate(ys)})
        g = df.groupby(["doc_id", "x", "y"], sort=False).size() \
              .reset_index()
        return pd.DataFrame({"doc_id": g["doc_id"].astype(np.int64),
                             "x": g["x"].astype(str),
                             "y": g["y"].astype(str),
                             "occ": g[0].to_numpy().astype(np.int64)})

    def key_bg(t: pa.Table) -> pa.Table:
        return t.append_column("_bg", pc.binary_join_element_wise(
            t["x"].cast(pa.string()), t["y"].cast(pa.string()), " "))

    rows = docs.map_batches(doc_bigrams, batch_format="pandas") \
               .map_batches(key_bg, batch_format="pyarrow") \
               .materialize()

    # semi-join pushdown on the CACHED corpus counts: only the scored
    # docs' bigram keys need corpus counts, so the key set (bounded by
    # the 200-doc readout) broadcasts once and filters the already-
    # combined distinct pair table — the lookup exchange carries only
    # probe-set keys, and no second tokenize pass runs at all (the
    # count passes are the session-cached ones shared with
    # q_pmi_bigrams / q_unigram_logprob).
    import ray

    keys_tab = rows.select_columns(["_bg"]).to_pandas()
    bg_keys = frozenset(keys_tab["_bg"].tolist())
    x_keys = frozenset(k.split(" ", 1)[0] for k in bg_keys)
    bg_ref = ray.put(bg_keys)
    x_ref = ray.put(x_keys)

    def probe_filter(b: pd.DataFrame, *, _bg=bg_ref) -> pd.DataFrame:
        m = (b["x"] + " " + b["y"]).isin(ray.get(_bg)).to_numpy()
        return b[m]

    cb = _corpus_bigram_counts(sf_dir).map_batches(
        probe_filter, batch_format="pandas")
    cu = _corpus_unigram_counts(sf_dir)
    vocab_v = cu.count()

    def filt_cu(d: pd.DataFrame, *, _r=x_ref) -> pd.DataFrame:
        return d[d["tok"].isin(ray.get(_r))]

    cb_lut = cb.map_batches(
        lambda t: pa.table({
            "_lk": pc.binary_join_element_wise(
                t["x"].cast(pa.string()), t["y"].cast(pa.string()),
                " "),
            "_lv": t["cnt"].cast(pa.int64())}),
        batch_format="pyarrow")
    rows = _copart_lookup(rows, cb_lut, "_bg", "cxy",
                          n_rows=n_docs).materialize()
    cu_lut = cu.map_batches(filt_cu, batch_format="pandas") \
        .map_batches(
        lambda t: pa.table({"_lk": t["tok"].cast(pa.string()),
                            "_lv": t["n"].cast(pa.int64())}),
        batch_format="pyarrow")
    rows = _copart_lookup(rows.map_batches(
        lambda t: t.append_column("_xk", t["x"].cast(pa.string())),
        batch_format="pyarrow"), cu_lut, "_xk", "cx", n_rows=n_docs)

    def score(t: pa.Table) -> pa.Table:
        occ = t["occ"].to_numpy(zero_copy_only=False)
        cxy = t["cxy"].to_numpy(zero_copy_only=False)
        cx = t["cx"].to_numpy(zero_copy_only=False)
        pin = np.floor(np.log((cxy + 1).astype(np.float64)
                              / (cx + vocab_v).astype(np.float64))
                       * 1e9 + 0.5).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "n_bigrams": pa.array(occ.astype(np.int64)),
                         "lp_sum_nano": pa.array(occ * pin)})

    out = tree_aggregate_to_table(
        rows.map_batches(score, batch_format="pyarrow"),
        ["doc_id"], [("n_bigrams", "sum"), ("lp_sum_nano", "sum")])
    return out.to_pandas().astype({"doc_id": np.int64,
                                   "n_bigrams": np.int64,
                                   "lp_sum_nano": np.int64})


def q_bigram_ppl_sql() -> str:
    return (
        "WITH toks AS (SELECT doc_id, "
        "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok, "
        "generate_subscripts(regexp_extract_all(lower(text), "
        "'[a-z0-9]+'), 1) AS i FROM documents), "
        "bg AS MATERIALIZED (SELECT a.doc_id, a.tok AS x, b.tok AS y "
        "FROM toks a JOIN toks b "
        "ON a.doc_id = b.doc_id AND b.i = a.i + 1), "
        "cb AS (SELECT x, y, CAST(count(*) AS BIGINT) AS cxy "
        "FROM bg GROUP BY 1, 2), "
        "cu AS MATERIALIZED (SELECT tok, "
        "CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1), "
        "vv AS (SELECT CAST(count(*) AS BIGINT) AS v FROM cu), "
        "d AS (SELECT doc_id, x, y, CAST(count(*) AS BIGINT) AS occ "
        "FROM bg WHERE doc_id < 200 GROUP BY 1, 2, 3), "
        "t AS (SELECT doc_id, occ, CAST(floor(ln("
        "CAST(cb.cxy + 1 AS DOUBLE) / CAST(cu.n + vv.v AS DOUBLE)"
        ") * 1e9 + 0.5) AS BIGINT) AS pin "
        "FROM d JOIN cb ON d.x = cb.x AND d.y = cb.y "
        "JOIN cu ON d.x = cu.tok, vv) "
        "SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_bigrams, "
        "CAST(sum(occ * pin) AS BIGINT) AS lp_sum_nano "
        "FROM t GROUP BY 1"
    )


def q_otsu_checksum(sf_dir: str):
    """Hash verification of OTSU THRESHOLDING (the classic histogram
    segmentation kernel): decode → integer luma → per-image argmax of
    the between-class variance over the present luma values, computed
    as the EXACT integer score ((w0·S − n·S0)²·2^20) // (w0·(n−w0))
    (numerator ≤ ~2e25: Python bigints here, HUGEINT in the oracle;
    the shared floor-scaled score makes ties identical on both sides,
    broken by the smaller threshold).  Output = threshold plus the
    below-threshold pixel count and luma mass.  Same head-K / scale
    caveats as image_checksum."""
    import pyarrow.dataset as pds
    import ray.data

    from .fixtures import ensure_images_parquet, scale_for_sf_dir
    from .functions.image_codec import decode_image

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)

    def otsu(b: pa.Table) -> pa.Table:
        blobs = b["bytes"].to_pylist()
        fmts = b["fmt"].to_pylist()
        ts = np.empty(len(blobs), np.int64)
        lo_n = np.empty(len(blobs), np.int64)
        lo_sum = np.empty(len(blobs), np.int64)
        for i in range(len(blobs)):
            img = decode_image(blobs[i], fmts[i]).astype(np.int64)
            y = (77 * img[:, :, 0] + 150 * img[:, :, 1]
                 + 29 * img[:, :, 2]) >> 8
            vals, counts = np.unique(y, return_counts=True)
            cdf = np.cumsum(counts)
            s0c = np.cumsum(vals * counts)
            n, s = int(cdf[-1]), int(s0c[-1])
            best = (-1, -1, -1, -1)  # (score, -t) argmax w/ min-t tie
            for j in range(len(vals) - 1):  # last value has w0 == n
                w0, sj = int(cdf[j]), int(s0c[j])
                d = w0 * s - n * sj
                score = (d * d << 20) // (w0 * (n - w0))
                if score > best[0]:
                    best = (score, int(vals[j]), w0, sj)
            if best[1] < 0:  # flat image: single luma value
                best = (0, int(vals[0]), n, s)
            ts[i], lo_n[i], lo_sum[i] = best[1], best[2], best[3]
        return pa.table({"image_id": b["image_id"],
                         "otsu_t": pa.array(ts),
                         "lo_n": pa.array(lo_n),
                         "lo_sum": pa.array(lo_sum)})

    # smaller batches than the vectorized checksums: the per-image
    # threshold argmax is a (bounded) Python-bigint loop, so spread it
    return ds.map_batches(otsu, batch_format="pyarrow", batch_size=32)


def q_otsu_checksum_sql() -> str:
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "h AS (SELECT i, l, CAST(count(*) AS BIGINT) AS c "
        "FROM lum GROUP BY 1, 2), "
        "w AS (SELECT i, l, "
        "CAST(sum(c) OVER (PARTITION BY i ORDER BY l) AS HUGEINT) "
        "AS w0, "
        "CAST(sum(l * c) OVER (PARTITION BY i ORDER BY l) AS HUGEINT) "
        "AS s0, "
        "CAST(sum(c) OVER (PARTITION BY i) AS HUGEINT) AS n, "
        "CAST(sum(l * c) OVER (PARTITION BY i) AS HUGEINT) AS s "
        "FROM h), "
        "sc AS (SELECT i, l, w0, s0, "
        "(w0 * s - n * s0) * (w0 * s - n * s0) * 1048576 "
        "// (w0 * (n - w0)) AS score FROM w WHERE w0 < n), "
        "r AS (SELECT i, l, w0, s0, row_number() OVER "
        "(PARTITION BY i ORDER BY score DESC, l) AS rn FROM sc) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') "
        "AS image_id, l AS otsu_t, CAST(w0 AS BIGINT) AS lo_n, "
        "CAST(s0 AS BIGINT) AS lo_sum FROM r WHERE rn = 1 "
        # flat (single-luma) images have their only row dropped by the
        # sc filter (w0 = n); mirror the engine's fallback row
        # (t = the one value, lo_n = n, lo_sum = full mass) so a flat
        # image cannot split row-count parity
        "UNION ALL SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0'), "
        "min(l), CAST(sum(c) AS BIGINT), CAST(sum(l * c) AS BIGINT) "
        "FROM h GROUP BY i HAVING count(*) = 1"
    )


def q_hu_moment(sf_dir: str):
    """Hash verification of IMAGE MOMENTS (luma centroid + the first
    Hu invariant φ1 = (μ20+μ02)/μ00² — the scale-normalized spread
    feature): raw moments S, Σx·l, Σy·l, Σx²·l, Σy²·l are exact int64
    plane sums; central-moment numerators S·Mxx − Mx² (= S²·μ20) stay
    exact ints; the two finalize divisions (centroid micro-pixels,
    φ1 pico) are fixed double sequences pinned to ints.  Same head-K
    / scale caveats as image_checksum."""
    import pyarrow.dataset as pds
    import ray.data

    from .fixtures import ensure_images_parquet, scale_for_sf_dir
    from .functions.image_codec import decode_image

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)

    def moments(b: pa.Table) -> pa.Table:
        blobs = b["bytes"].to_pylist()
        fmts = b["fmt"].to_pylist()
        cxm = np.empty(len(blobs), np.int64)
        cym = np.empty(len(blobs), np.int64)
        phi = np.empty(len(blobs), np.int64)
        for i in range(len(blobs)):
            img = decode_image(blobs[i], fmts[i]).astype(np.int64)
            y = (77 * img[:, :, 0] + 150 * img[:, :, 1]
                 + 29 * img[:, :, 2]) >> 8
            side = y.shape[0]
            xs = np.arange(side, dtype=np.int64)[None, :]
            ys = np.arange(side, dtype=np.int64)[:, None]
            s = int(y.sum())
            mx, my = int((xs * y).sum()), int((ys * y).sum())
            mxx = int((xs * xs * y).sum())
            myy = int((ys * ys * y).sum())
            mu_num = (s * mxx - mx * mx) + (s * myy - my * my)
            cxm[i] = int(np.floor(float(mx) / float(s) * 1e6 + 0.5))
            cym[i] = int(np.floor(float(my) / float(s) * 1e6 + 0.5))
            phi[i] = int(np.floor(float(mu_num) / float(s * s * s)
                                  * 1e12 + 0.5))
        return pa.table({"image_id": b["image_id"],
                         "cx_micro": pa.array(cxm),
                         "cy_micro": pa.array(cym),
                         "phi1_pico": pa.array(phi)})

    return ds.map_batches(moments, batch_format="pyarrow", batch_size=128)


def q_hu_moment_sql() -> str:
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "m AS (SELECT i, CAST(sum(l) AS BIGINT) AS s, "
        "CAST(sum(x * l) AS BIGINT) AS mx, "
        "CAST(sum(y * l) AS BIGINT) AS my, "
        "CAST(sum(x * x * l) AS BIGINT) AS mxx, "
        "CAST(sum(y * y * l) AS BIGINT) AS myy FROM lum GROUP BY 1) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') "
        "AS image_id, "
        "CAST(floor(CAST(mx AS DOUBLE) / CAST(s AS DOUBLE) * 1e6 "
        "+ 0.5) AS BIGINT) AS cx_micro, "
        "CAST(floor(CAST(my AS DOUBLE) / CAST(s AS DOUBLE) * 1e6 "
        "+ 0.5) AS BIGINT) AS cy_micro, "
        "CAST(floor(CAST((s * mxx - mx * mx) + (s * myy - my * my) "
        "AS DOUBLE) / CAST(s * s * s AS DOUBLE) * 1e12 + 0.5) "
        "AS BIGINT) AS phi1_pico FROM m"
    )


_KCORE_K = 8
_KCORE_ROUNDS = 6  # oracle replay depth; peel is idempotent past fixpoint


def _kcore_node_sql(col: str, v: int) -> str:
    # quadratic-CDF skew: node = (h²>>32)·V >> 32 with h the Knuth
    # multiplicative hash — low ids become hubs, giving nested cores
    return (f"CAST((CAST({col} AS HUGEINT) * 2654435761 % 4294967296) "
            f"* (CAST({col} AS HUGEINT) * 2654435761 % 4294967296) "
            f"// 4294967296 * {v} // 4294967296 AS BIGINT)")


_SSSP_ROUNDS = 14  # oracle replay depth; relaxation idempotent after
# the fixpoint (measured: 6/7/10 rounds at sf0.001/0.01/0.1)


def q_sssp(sf_dir: str):
    """Single-source shortest paths from node 0 by distributed
    Bellman-Ford (the routing primitive; joins q_pagerank/_kcore/
    _connected_components in the graph family): the shared hub-skewed
    derived graph (stages/graph.derived_graph_edges), integer edge
    weights 1 + (31u+17v) mod 100, Jacobi rounds — distances live as a
    co-partitioned (node, dist) DATASET, never on the driver and never
    broadcast.  Each round is two hash-bucket exchanges: edges keyed by
    src gather the state bucket-locally and emit pre-combined (dst,
    dist+w) candidates, then a node-keyed min-combine folds candidates
    into the state.  Convergence checks an O(1) (count, sum)
    fingerprint (dists only decrease, rows only appear, so equality ⟺
    fixpoint).  Loops to fixpoint (≤ 14 rounds, asserted); the oracle
    replays exactly 14 chained-CTE rounds (idempotent past
    convergence).  Exact ints throughout; unreached nodes drop."""
    from .stages.graph import (combine_state, derived_graph_edges,
                               edge_state_messages, state_fingerprint,
                               state_from_rows)

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

    directed = edges.map_batches(
        orient, batch_format="pyarrow").materialize()
    E2 = 2 * n  # upper bound on directed edge rows (bucket sizing)

    def emit(ek, pays, lookup):
        d, found = lookup(ek)
        t = pa.table({
            "node": pa.array(pays["dst"][found], pa.int64()),
            "val": pa.array(d[found] + pays["w"][found], pa.int64())})
        return (t.group_by(["node"]).aggregate([("val", "min")])
                .rename_columns(["node", "val"]))

    state = state_from_rows([0], [0]).materialize()
    fp = state_fingerprint(state)[:2]
    for _ in range(_SSSP_ROUNDS + 1):
        msgs = edge_state_messages(directed, state, "src",
                                   ["dst", "w"], emit, n_rows=E2)
        new = combine_state(msgs.union(state), "min",
                            n_rows=V).materialize()
        nfp = state_fingerprint(new)[:2]
        if nfp == fp:
            state = new
            break
        state, fp = new, nfp
    else:
        raise RuntimeError("Bellman-Ford did not converge within "
                           f"{_SSSP_ROUNDS} oracle-replayable rounds")

    out = state.to_pandas().sort_values("node").reset_index(drop=True)
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
    DATASET, edges keyed by the gather endpoint read the state
    bucket-locally (missing node ⇒ 0, mirroring the oracle's LEFT
    JOIN COALESCE) and emit pre-combined per-dst partial sums; a
    node-keyed sum-combine closes the matvec.  Re-quantized after
    every matvec by the power-iteration house normalization
    floor(w·1000 / max w) — max w is the only driver-side value (an
    O(1)-per-block fold), so scores stay small ints and every round
    is bit-replayable by the oracle's chained CTEs.  Output = top-10
    authorities via per-block top-k partials."""
    from .stages.graph import (combine_state, derived_graph_edges,
                               edge_state_messages, state_fingerprint,
                               topk_state)

    edges, V, n = derived_graph_edges(sf_dir, directed=True,
                                      read=_read, nrows=_nrows)

    def seed(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b["u"].combine_chunks().cast(pa.int64()),
            "val": pa.array(np.full(len(b), 1000, np.int64),
                            pa.int64())})

    h = combine_state(edges.map_batches(seed, batch_format="pyarrow"),
                      "max", n_rows=V).materialize()

    def matvec(state, src: str, dst: str):
        def emit(ek, pays, lookup):
            w, _ = lookup(ek, default=0)
            t = pa.table({"node": pa.array(pays[dst], pa.int64()),
                          "val": pa.array(w, pa.int64())})
            return (t.group_by(["node"]).aggregate([("val", "sum")])
                    .rename_columns(["node", "val"]))

        msgs = edge_state_messages(edges, state, src, [dst], emit,
                                   n_rows=n)
        g = combine_state(msgs, "sum", n_rows=V).materialize()
        s = float(state_fingerprint(g)[2])

        def quant(b: pa.Table) -> pa.Table:
            w = b["val"].to_numpy(zero_copy_only=False)
            return pa.table({"node": b["node"], "val": pa.array(
                np.floor(w.astype(np.float64) * 1000.0 / s)
                .astype(np.int64), pa.int64())})

        return g.map_batches(quant, batch_format="pyarrow").materialize()

    for _ in range(2):
        a = matvec(h, "u", "v")
        h = matvec(a, "v", "u")

    def best_first(d: pd.DataFrame) -> pd.DataFrame:
        d = d[d["val"] > 0]
        return d.sort_values(["val", "node"], ascending=[False, True],
                             kind="mergesort")

    top = topk_state(a, 10, best_first)
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
    from .stages.graph import (combine_state, derived_graph_edges,
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


def q_emd1d(sf_dir: str):
    """1-D Wasserstein (earth-mover) distance between the value
    distributions of the two user-parity cohorts — the integral drift
    metric (q_ks_drift is the sup metric): per-(cent, cohort) counts
    on the combiner tree (cents are a bounded grid), then
    W₁ = Σ_bins |F₀−F₁|·Δ on the driver with cross-multiplied integer
    CDFs (|n₁·C₀ − n₀·C₁|·Δcents — exact bigints at any volume); the
    single normalizing division by n₀·n₁·100 pins to nano (unit:
    value, not cents)."""
    from .stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        c = np.floor(b["value"].to_numpy(zero_copy_only=False)
                     * 100.0 + 0.5).astype(np.int64)
        coh = (b["user_id"].to_numpy(zero_copy_only=False) % 2)
        t = pa.table({"c": pa.array(c), "coh": pa.array(coh),
                      "n": pa.array(np.ones(len(c), np.int64))})
        return (t.group_by(["c", "coh"]).aggregate([("n", "sum")])
                .rename_columns(["c", "coh", "n"]))

    g = tree_aggregate_to_table(
        _read(sf_dir, "events", ["user_id", "value"]).map_batches(
            partial, batch_format="pyarrow"),
        ["c", "coh"], [("n", "sum")]).to_pandas()
    cents = np.unique(g["c"].to_numpy())
    n0g = g[g["coh"] == 0].set_index("c")["n"]
    n1g = g[g["coh"] == 1].set_index("c")["n"]
    x0 = n0g.reindex(cents, fill_value=0).to_numpy().astype(object)
    x1 = n1g.reindex(cents, fill_value=0).to_numpy().astype(object)
    n0, n1 = int(sum(x0)), int(sum(x1))
    total = 0
    c0 = c1 = 0
    for i in range(len(cents) - 1):
        c0 += int(x0[i])
        c1 += int(x1[i])
        total += abs(n1 * c0 - n0 * c1) * int(cents[i + 1] - cents[i])
    w1_nano = int(np.floor(float(total) / float(n0 * n1)
                           / 100.0 * 1e9 + 0.5))
    return pd.DataFrame({"n0": [np.int64(n0)], "n1": [np.int64(n1)],
                         "w1_nano": [np.int64(w1_nano)]})


def q_emd1d_sql() -> str:
    return (
        "WITH p AS (SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) "
        "AS c, user_id % 2 AS coh FROM events), "
        "g AS MATERIALIZED (SELECT c, "
        "CAST(sum(CASE WHEN coh = 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS x0, "
        "CAST(sum(CASE WHEN coh = 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS x1 FROM p GROUP BY 1), "
        "n AS (SELECT CAST(sum(x0) AS HUGEINT) AS n0, "
        "CAST(sum(x1) AS HUGEINT) AS n1 FROM g), "
        "w AS (SELECT c, "
        "CAST(sum(x0) OVER (ORDER BY c) AS HUGEINT) AS c0, "
        "CAST(sum(x1) OVER (ORDER BY c) AS HUGEINT) AS c1, "
        "lead(c) OVER (ORDER BY c) AS nxt FROM g), "
        "t AS (SELECT CAST(sum(abs(n.n1 * c0 - n.n0 * c1) "
        "* (nxt - c)) AS HUGEINT) AS total FROM w, n "
        "WHERE nxt IS NOT NULL) "
        "SELECT CAST(n.n0 AS BIGINT) AS n0, "
        "CAST(n.n1 AS BIGINT) AS n1, "
        "CAST(floor(CAST(total AS DOUBLE) / "
        "CAST(n.n0 * n.n1 AS DOUBLE) / 100.0 * 1e9 + 0.5) AS BIGINT) "
        "AS w1_nano FROM t, n"
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

    from .stages.graph import (combine_state, derived_graph_edges,
                               edge_state_messages)

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
        edges = edge_state_messages(
            edge_state_messages(edges, bad, "u", ["v"], survive_u,
                                n_rows=n),
            bad, "v", ["u"], survive_v, n_rows=n).materialize()
    else:
        raise RuntimeError("k-core peel did not converge within "
                           f"{_KCORE_ROUNDS} oracle-replayable rounds")

    core = deg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["val"], _KCORE_K)),
        batch_format="pyarrow").to_pandas().sort_values("node")
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


# ---------------------------------------------------------------------------
# registry


# Ordering contract: the driver's correctness sweep records only the
# FIRST 50 entries in dict order. Rounds r01-r04 covered 109 of the 204
# entries; this round rotates the window onto the 95 entries no driver
# round has ever checked (VERDICT r04, Next-round #2): the 84 unchecked
# hash-verified entries lead (pagerank first -- modified this round),
# then the 11 unchecked rows-only entries, then the 109 driver-proven
# entries in their prior order.
QUERIES = {
    "pagerank": q_pagerank,
    "max_span": q_max_span,
    "self_crossings": q_self_crossings,
    "haversine_legs": q_haversine_legs,
    "pair_dist_hist": q_pair_dist_hist,
    "bbox_extent": q_bbox_extent,
    "heading_octants": q_heading_octants,
    "stay_points": q_stay_points,
    "shoelace_area": q_shoelace_area,
    "bm25_topk": q_bm25_topk,
    "spatial_clusters": q_spatial_clusters,
    "nearest_center": q_nearest_center,
    "rolling_zscore": q_rolling_zscore,
    "trend_slopes": q_trend_slopes,
    "adaptive_tiles": q_adaptive_tiles,
    "power_iteration": q_power_iteration,
    "group_sample": q_group_sample,
    "mom_revenue": q_mom_revenue,
    "label_scatter": q_label_scatter,
    "setsim_pairs": q_setsim_pairs,
    "kmeans": q_kmeans,
    "mad": q_mad,
    "equidepth_hist": q_equidepth_hist,
    "scd_intervals": q_scd_intervals,
    "ratio_to_report": q_ratio_to_report,
    "local_volume": q_local_volume,
    "big_orders": q_big_orders,
    "returned_revenue": q_returned_revenue,
    "pareto_front": q_pareto_front,
    "regex_extract": q_regex_extract,
    "interval_overlap": q_interval_overlap,
    "asof_forward": q_asof_forward,
    "edit_join": q_edit_join,
    "connected_components": q_connected_components,
    "phrase_match": q_phrase_match,
    "min_cost_supp": q_min_cost_supp,
    "rows_frame_sum": q_rows_frame_sum,
    "unigram_logprob": q_unigram_logprob,
    "ks_drift": q_ks_drift,
    "global_rank": q_global_rank,
    "gini": q_gini,
    "hamming_topk": q_hamming_topk,
    "outlier_flags": q_outlier_flags,
    "shipping_priority": q_shipping_priority,
    "cooccur": q_cooccur,
    "minmax_norm": q_minmax_norm,
    "winsorize": q_winsorize,
    "group_percentiles": q_group_percentiles,
    "transitions": q_transitions,
    "degree_hist": q_degree_hist,
    "pct_rank": q_pct_rank,
    "retention": q_retention,
    "doc_stats": q_doc_stats,
    "type_entropy": q_type_entropy,
    "gap_fill": q_gap_fill,
    "triangles": q_triangles,
    "char_jaccard": q_char_jaccard,
    "dup_spans": q_dup_spans,
    "unpivot": q_unpivot,
    "full_outer": q_full_outer,
    "user_window": q_user_window,
    "dense_rank": q_dense_rank,
    "corr_flags": q_corr_flags,
    "box_join": q_box_join,
    "radius_join": q_radius_join,
    "group_concat": q_group_concat,
    "skew_join": q_skew_join,
    "decontam": q_decontam,
    "group_stats": q_group_stats,
    "rollup_orders": q_rollup_orders,
    "group_mode": q_group_mode,
    "rank_events": q_rank_events,
    "funnel": q_funnel,
    "props_extract": q_props_extract,
    "percentile_cont": q_percentile_cont,
    "throttle_dedup": q_throttle_dedup,
    "star_join": q_star_join,
    "cube_orders": q_cube_orders,
    "travel_dist": q_travel_dist,
    "embedding_stats": q_embedding_stats,
    "tile_pyramid": q_tile_pyramid,
    "upsert_merge": q_upsert_merge,
    "nb_features": q_nb_features,
    "sliding_distinct": q_sliding_distinct,
    "phash_dedup": q_phash_dedup,
    "image_blur": q_image_blur,
    "image_patches": q_image_patches,
    "image_pyramid": q_image_pyramid,
    "prep_pipeline": q_prep_pipeline,
    "compress_ratio": q_compress_ratio,
    "audio_features": q_audio_features,
    "hll_users": q_hll_users,
    "pq_ann": q_pq_ann,
    "hll_users_by_type": q_hll_users_by_type,
    "bpe_merges": q_bpe_merges,
    "hits": q_hits,
    "kcore": q_kcore,
    "sssp": q_sssp,
    "assortativity": q_assortativity,
    "emd1d": q_emd1d,
    "morans_i": q_morans_i,
    "zipf_slope": q_zipf_slope,
    "js_divergence": q_js_divergence,
    "target_encode": q_target_encode,
    "otsu_checksum": q_otsu_checksum,
    "hu_moment": q_hu_moment,
    "getis_ord": q_getis_ord,
    "idw_surface": q_idw_surface,
    "quadtree_leaves": q_quadtree_leaves,
    "bigram_ppl": q_bigram_ppl,
    "ransac_line": q_ransac_line,
    "mutual_info": q_mutual_info,
    "autocorr": q_autocorr,
    "cusum_changepoint": q_cusum_changepoint,
    "benford": q_benford,
    "density_gradient": q_density_gradient,
    "silhouette": q_silhouette,
    "rfm_segments": q_rfm_segments,
    "glcm_texture": q_glcm_texture,
    "sobel_octants": q_sobel_octants,
    "traj_intersections": q_traj_intersections,
    "ab_ttest": q_ab_ttest,
    "pmi_bigrams": q_pmi_bigrams,
    "od_matrix": q_od_matrix,
    "cum_new_users": q_cum_new_users,
    "kring_smooth": q_kring_smooth,
    "border_crossings": q_border_crossings,
    "geohash4": q_geohash4,
    "douglas_peucker": q_douglas_peucker,
    "dbscan": q_dbscan,
    "image_checksum": q_image_checksum,
    "thumb_checksum": q_thumb_checksum,
    "blur_checksum": q_blur_checksum,
    "patch_checksum": q_patch_checksum,
    "dhash_checksum": q_dhash_checksum,
    "colocation": q_colocation,
    "repetition_ratio": q_repetition_ratio,
    "grad_energy": q_grad_energy,
    "weighted_centroid": q_weighted_centroid,
    "histeq_checksum": q_histeq_checksum,
    "kll_quantiles": q_kll_quantiles,
    "speed_profile": q_speed_profile,
    "scatter_orientation": q_scatter_orientation,
    "border_buffer": q_border_buffer,
    "cell_transitions": q_cell_transitions,
    "minhash_exact": q_minhash_exact,
    "dedup_docs": q_dedup_docs,
    "rolling_counts": q_rolling_counts,
    "session_windows": q_session_windows,
    "prefix_sums": q_prefix_sums,
    "lag_deltas": q_lag_deltas,
    "ivf_exact": q_ivf_exact,
    "bloom_dedup": q_bloom_dedup,
    "order_lineitems": q_order_lineitems,
    "cel_filter": q_cel_filter,
    "knn": q_knn,
    "pip_join_boxes": q_pip_join_boxes,
    "ann_cosine": q_ann_cosine,
    "tile_stats": q_tile_stats,
    "cell_stats": q_cell_stats,
    "quantiles": q_quantiles,
    "tfidf": q_tfidf,
    "heavy_hitters": q_heavy_hitters,
    "top_tokens": q_top_tokens,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "stratified_sample": q_stratified_sample,
    "geotag": q_geotag,
    "cells": q_cells,
    "tiles": q_tiles,
    "events_by_type": q_events_by_type,
    "topk_events": q_topk_events,
    "token_count": q_token_count,
    "bpe_tokens": q_bpe_tokens,
    "grouped_topk": q_grouped_topk,
    "grouped_median": q_grouped_median,
    "quality": q_quality,
    "orders_per_nation": q_orders_per_nation,
    "semi_join_events": q_semi_join_events,
    "anti_join_events": q_anti_join_events,
    "window_counts": q_window_counts,
    "sliding_windows": q_sliding_windows,
    "distinct_types": q_distinct_types,
    "tile_polygons": q_tile_polygons,
    "box_tile_cover": q_box_tile_cover,
    "union_all": q_union_all,
    "hash_sample": q_hash_sample,
    "lineitem_stats": q_lineitem_stats,
    "langid": q_langid,
    "fingerprint": q_fingerprint,
    "distinct_users": q_distinct_users,
    "user_intersect": q_user_intersect,
    "user_except": q_user_except,
    "order_pivot": q_order_pivot,
    "profile_lineitem": q_profile_lineitem,
    "flagship_tiles": q_flagship_tiles,
    "osmfilter_docs": q_osmfilter_docs,
    "exact_dedup_images": q_exact_dedup_images,
    "minhash_dedup": q_minhash_dedup,
    "ivf_ann": q_ivf_ann,
    "embedding_dedup": q_embedding_dedup,
    "simhash": q_simhash,
    "knn_images": q_knn_images,
    "image_features": q_image_features,
}

# Same key order as QUERIES (the driver zips the two by queries()'s
# first-50 prefix).
ORACLE_SQL = {
    "pagerank": q_pagerank_sql(),
    "max_span": q_max_span_sql(),
    "self_crossings": q_self_crossings_sql(),
    "haversine_legs": q_haversine_legs_sql(),
    "pair_dist_hist": q_pair_dist_hist_sql(),
    "bbox_extent": q_bbox_extent_sql(),
    "heading_octants": q_heading_octants_sql(),
    "stay_points": q_stay_points_sql(),
    "shoelace_area": q_shoelace_area_sql(),
    "bm25_topk": q_bm25_topk_sql(),
    "spatial_clusters": q_spatial_clusters_sql(),
    "nearest_center": q_nearest_center_sql(),
    "rolling_zscore": q_rolling_zscore_sql(),
    "trend_slopes": q_trend_slopes_sql(),
    "adaptive_tiles": q_adaptive_tiles_sql(),
    "power_iteration": q_power_iteration_sql(),
    "group_sample": q_group_sample_sql(),
    "mom_revenue": q_mom_revenue_sql(),
    "label_scatter": q_label_scatter_sql(),
    "setsim_pairs": q_setsim_pairs_sql(),
    "kmeans": q_kmeans_sql(),
    "mad": q_mad_sql(),
    "equidepth_hist": q_equidepth_hist_sql(),
    "scd_intervals": q_scd_intervals_sql(),
    "ratio_to_report": q_ratio_to_report_sql(),
    "local_volume": q_local_volume_sql(),
    "big_orders": q_big_orders_sql(),
    "returned_revenue": q_returned_revenue_sql(),
    "pareto_front": q_pareto_front_sql(),
    "regex_extract": q_regex_extract_sql(),
    "interval_overlap": q_interval_overlap_sql(),
    "asof_forward": q_asof_forward_sql(),
    "edit_join": q_edit_join_sql(),
    "connected_components": q_connected_components_sql(),
    "phrase_match": q_phrase_match_sql(),
    "min_cost_supp": q_min_cost_supp_sql(),
    "rows_frame_sum": q_rows_frame_sum_sql(),
    "unigram_logprob": q_unigram_logprob_sql(),
    "ks_drift": q_ks_drift_sql(),
    "global_rank": q_global_rank_sql(),
    "gini": q_gini_sql(),
    "hamming_topk": q_hamming_topk_sql(),
    "outlier_flags": q_outlier_flags_sql(),
    "shipping_priority": q_shipping_priority_sql(),
    "cooccur": q_cooccur_sql(),
    "minmax_norm": q_minmax_norm_sql(),
    "winsorize": q_winsorize_sql(),
    "group_percentiles": q_group_percentiles_sql(),
    "transitions": q_transitions_sql(),
    "degree_hist": q_degree_hist_sql(),
    "pct_rank": q_pct_rank_sql(),
    "retention": q_retention_sql(),
    "doc_stats": q_doc_stats_sql(),
    "type_entropy": q_type_entropy_sql(),
    "gap_fill": q_gap_fill_sql(),
    "triangles": q_triangles_sql(),
    "char_jaccard": q_char_jaccard_sql(),
    "dup_spans": q_dup_spans_sql(),
    "unpivot": q_unpivot_sql(),
    "full_outer": q_full_outer_sql(),
    "user_window": q_user_window_sql(),
    "dense_rank": q_dense_rank_sql(),
    "corr_flags": q_corr_flags_sql(),
    "box_join": q_box_join_sql(),
    "radius_join": q_radius_join_sql(),
    "group_concat": q_group_concat_sql(),
    "skew_join": q_skew_join_sql(),
    "decontam": q_decontam_sql(),
    "group_stats": q_group_stats_sql(),
    "rollup_orders": q_rollup_orders_sql(),
    "group_mode": q_group_mode_sql(),
    "rank_events": q_rank_events_sql(),
    "funnel": q_funnel_sql(),
    "props_extract": q_props_extract_sql(),
    "percentile_cont": q_percentile_cont_sql(),
    "throttle_dedup": q_throttle_dedup_sql(),
    "star_join": q_star_join_sql(),
    "cube_orders": q_cube_orders_sql(),
    "travel_dist": q_travel_dist_sql(),
    "embedding_stats": q_embedding_stats_sql(),
    "tile_pyramid": q_tile_pyramid_sql(),
    "upsert_merge": q_upsert_merge_sql(),
    "nb_features": q_nb_features_sql(),
    "sliding_distinct": q_sliding_distinct_sql(),
    "hits": q_hits_sql(),
    "kcore": q_kcore_sql(),
    "sssp": q_sssp_sql(),
    "assortativity": q_assortativity_sql(),
    "emd1d": q_emd1d_sql(),
    "morans_i": q_morans_i_sql(),
    "zipf_slope": q_zipf_slope_sql(),
    "js_divergence": q_js_divergence_sql(),
    "target_encode": q_target_encode_sql(),
    "otsu_checksum": q_otsu_checksum_sql(),
    "hu_moment": q_hu_moment_sql(),
    "getis_ord": q_getis_ord_sql(),
    "idw_surface": q_idw_surface_sql(),
    "quadtree_leaves": q_quadtree_leaves_sql(),
    "bigram_ppl": q_bigram_ppl_sql(),
    "ransac_line": q_ransac_line_sql(),
    "mutual_info": q_mutual_info_sql(),
    "autocorr": q_autocorr_sql(),
    "cusum_changepoint": q_cusum_changepoint_sql(),
    "benford": q_benford_sql(),
    "density_gradient": q_density_gradient_sql(),
    "silhouette": q_silhouette_sql(),
    "rfm_segments": q_rfm_segments_sql(),
    "glcm_texture": q_glcm_texture_sql(),
    "sobel_octants": q_sobel_octants_sql(),
    "traj_intersections": q_traj_intersections_sql(),
    "ab_ttest": q_ab_ttest_sql(),
    "pmi_bigrams": q_pmi_bigrams_sql(),
    "od_matrix": q_od_matrix_sql(),
    "cum_new_users": q_cum_new_users_sql(),
    "kring_smooth": q_kring_smooth_sql(),
    "border_crossings": q_border_crossings_sql(),
    "geohash4": q_geohash4_sql(),
    "dbscan": q_dbscan_sql(),
    "image_checksum": q_image_checksum_sql(),
    "thumb_checksum": q_thumb_checksum_sql(),
    "blur_checksum": q_blur_checksum_sql(),
    "patch_checksum": q_patch_checksum_sql(),
    "dhash_checksum": q_dhash_checksum_sql(),
    "colocation": q_colocation_sql(),
    "repetition_ratio": q_repetition_ratio_sql(),
    "grad_energy": q_grad_energy_sql(),
    "weighted_centroid": q_weighted_centroid_sql(),
    "histeq_checksum": q_histeq_checksum_sql(),
    "speed_profile": q_speed_profile_sql(),
    "scatter_orientation": q_scatter_orientation_sql(),
    "border_buffer": q_border_buffer_sql(),
    "cell_transitions": q_cell_transitions_sql(),
    "minhash_exact": q_minhash_exact_sql(),
    "dedup_docs": q_dedup_docs_sql(),
    "rolling_counts": q_rolling_counts_sql(),
    "session_windows": q_session_windows_sql(),
    "prefix_sums": q_prefix_sums_sql(),
    "lag_deltas": q_lag_deltas_sql(),
    "ivf_exact": q_ivf_exact_sql(),
    "bloom_dedup": q_bloom_dedup_sql(),
    "order_lineitems": q_order_lineitems_sql(),
    "cel_filter": q_cel_filter_sql(),
    "knn": q_knn_sql(),
    "pip_join_boxes": q_pip_join_boxes_sql(),
    "ann_cosine": q_ann_cosine_sql(),
    "tile_stats": q_tile_stats_sql(),
    "cell_stats": q_cell_stats_sql(),
    "quantiles": q_quantiles_sql(),
    "tfidf": q_tfidf_sql(),
    "heavy_hitters": q_heavy_hitters_sql(),
    "top_tokens": q_top_tokens_sql(),
    "asof_join": q_asof_join_sql(),
    "range_join": q_range_join_sql(),
    "stratified_sample": q_stratified_sample_sql(),
    "geotag": q_geotag_sql(),
    "cells": q_cells_sql(),
    "tiles": q_tiles_sql(),
    "events_by_type": q_events_by_type_sql(),
    "topk_events": q_topk_events_sql(),
    "token_count": q_token_count_sql(),
    "bpe_tokens": q_bpe_tokens_sql(),
    "grouped_topk": q_grouped_topk_sql(),
    "grouped_median": q_grouped_median_sql(),
    "quality": q_quality_sql(),
    "orders_per_nation": q_orders_per_nation_sql(),
    "semi_join_events": q_semi_join_events_sql(),
    "anti_join_events": q_anti_join_events_sql(),
    "window_counts": q_window_counts_sql(),
    "sliding_windows": q_sliding_windows_sql(),
    "distinct_types": q_distinct_types_sql(),
    "tile_polygons": q_tile_polygons_sql(),
    "box_tile_cover": q_box_tile_cover_sql(),
    "union_all": q_union_all_sql(),
    "hash_sample": q_hash_sample_sql(),
    "lineitem_stats": q_lineitem_stats_sql(),
    "langid": q_langid_sql(),
    "fingerprint": q_fingerprint_sql(),
    "distinct_users": q_distinct_users_sql(),
    "user_intersect": q_user_intersect_sql(),
    "user_except": q_user_except_sql(),
    "order_pivot": q_order_pivot_sql(),
    "profile_lineitem": q_profile_lineitem_sql(),
}
