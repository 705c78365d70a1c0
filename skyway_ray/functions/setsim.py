"""Exact distributed set-similarity self-join (all pairs with word-set
Jaccard ≥ τ) via prefix filtering — the AllPairs/PPJoin family
(R. J. Bayardo et al., WWW'07) in the MapReduce shape of Vernica,
Carey & Li (SIGMOD'10), re-expressed on Ray Data.

Exactness: under ANY global total order on tokens, two sets with
J ≥ τ must share a token within each one's first
``|d| - ceil(τ·|d|) + 1`` tokens (the *prefix*), so token-partitioned
candidate generation over prefixes loses no qualifying pair; exact
verification then removes false positives.  We use 64-bit token-hash
order — data-independent, no global frequency pass.  The classic
rarest-first (document-frequency) order is the scale lever for skewed
vocabularies: it makes prefix tokens rare, shrinking token groups; it
costs one extra token-count aggregate + broadcast and plugs in here by
re-ranking `toks` before the prefix slice.

Distributed shape (no per-group Python, no driver funnel):
 1. one ``map_batches`` pass tokenizes (distinct 64-bit word hashes,
    sorted = prefix order) and emits (token, doc_id, size) rows for
    prefix tokens only;
 2. a distributed sort on (token, doc_id) co-locates each token run; a
    vectorized per-block scan emits all within-run candidate pairs
    (with the |b| ≥ τ·|a| length filter); runs straddling block
    boundaries are finished by ONE rescue task over the per-block
    first/last-run rows, emitting only cross-block pairs — exactly the
    complement of the main pass;
 3. candidates dedupe via a sort-based distributed DISTINCT
    (:func:`distinct_pairs` — no per-group Python);
 4. two sort-based co-partition joins (:func:`.near_dup._copart_join`)
    attach both token-set blobs (Bloom-prefiltered second data pass)
    and compute exact Jaccard inline — output (doc_a, doc_b,
    jac_micro) with the division done in one pinned float op so a SQL
    oracle matches bit-for-bit.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from .bloom import BloomFilter
from .near_dup import _blk_tag, _copart_join, _obj_cached

_WORD_RE = re.compile(r"[a-z0-9]+")


def _word_hashes64(text: str, ngram_words: int = 1) -> np.ndarray:
    """Distinct sorted 64-bit hashes of the lowercased [a-z0-9]+ word
    set (``ngram_words=1``) or its word-shingle set (n consecutive
    words joined by one space) — a SQL oracle mirrors the former with
    ``regexp_extract_all(lower(text), '[a-z0-9]+')`` and the latter
    with the decontam-style ``array_to_string(arr[i:i+n-1], ' ')``
    slice.  Shingles are the classic set-similarity tokenization: on
    small-vocabulary corpora single words make every document look
    like every other (the candidate count degenerates toward all
    pairs), while shingles scale the effective vocabulary by the
    context length."""
    import zlib

    words = _WORD_RE.findall(text.lower())
    if ngram_words <= 1:
        toks = set(words)
    else:
        toks = {" ".join(words[i:i + ngram_words])
                for i in range(len(words) - ngram_words + 1)}
    if not toks:
        return np.empty(0, np.int64)
    out = np.fromiter(
        (((zlib.crc32(b) << 32) | zlib.crc32(b, 0xA5A5A5A5)) & 0x7FFFFFFFFFFFFFFF
         for b in (w.encode() for w in toks)),
        dtype=np.int64, count=len(toks))
    return np.sort(out)


def _prefix_len(sizes: np.ndarray, tau: float) -> np.ndarray:
    """|d| - O_min + 1 with O_min = max(1, floor(τ·|d|)): floor (not
    ceil) absorbs float fuzz in the SAFE direction — a longer prefix
    only adds candidates, never loses a qualifying pair."""
    o_min = np.maximum(1, np.floor(tau * sizes).astype(np.int64))
    return sizes - o_min + 1


def _batch_jaccard(a_blobs, b_blobs) -> np.ndarray:
    """Exact Jaccard for a batch of (token-set blob, token-set blob)
    pairs in one sort-based vectorized pass: (pair, token) rows from
    both sides are lexsorted and adjacent duplicates counted per pair
    (tokens are unique within a doc, so a duplicate means membership
    in both).  Replaces ~20 µs-per-pair Python ``intersect1d`` with
    C-speed sorting — the per-pair Python that remains is one
    ``frombuffer`` view per blob.  The division is the same single
    pinned float op the SQL oracle spells."""
    n = len(a_blobs)
    if n == 0:
        return np.empty(0, np.float64)
    avs = [np.frombuffer(x, np.int64) for x in a_blobs]
    bvs = [np.frombuffer(x, np.int64) for x in b_blobs]
    na = np.array([len(v) for v in avs], np.int64)
    nb = np.array([len(v) for v in bvs], np.int64)
    toks = np.concatenate([v for ab in zip(avs, bvs) for v in ab]) \
        if int((na + nb).sum()) else np.empty(0, np.int64)
    pair = np.repeat(np.arange(n), na + nb)
    order = np.lexsort((toks, pair))
    t, p = toks[order], pair[order]
    dup = (t[1:] == t[:-1]) & (p[1:] == p[:-1])
    inter = np.bincount(p[1:][dup], minlength=n).astype(np.int64)
    union = na + nb - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        jac = np.where(union > 0,
                       inter.astype(np.float64) / union.astype(np.float64),
                       1.0)
    return jac


def _run_pairs(tok: np.ndarray, doc: np.ndarray, size: np.ndarray,
               blk: np.ndarray | None, tau: float) -> pa.Table:
    """All (doc_a < doc_b) pairs within equal-token runs of a sorted
    block, length-filtered (τ·|a| ≤ |b|, sizes sorted with ids).  With
    ``blk``, keep only cross-block pairs (the boundary-rescue rule)."""
    outs_a, outs_b = [], []
    n = len(tok)
    if n:
        starts = np.flatnonzero(np.r_[True, tok[1:] != tok[:-1]])
        ends = np.r_[starts[1:], n]
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            i, j = np.triu_indices(m, k=1)
            a, b = s + i, s + j
            # docs sorted within run → doc[a] < doc[b]; sizes aligned
            sa, sb = size[a], size[b]
            keep = (np.minimum(sa, sb).astype(np.float64)
                    >= tau * np.maximum(sa, sb) - 1e-9)
            if blk is not None:
                keep &= blk[a] != blk[b]
            outs_a.append(doc[a][keep])
            outs_b.append(doc[b][keep])
    da = np.concatenate(outs_a) if outs_a else np.empty(0, np.int64)
    db = np.concatenate(outs_b) if outs_b else np.empty(0, np.int64)
    return pa.table({"doc_a": pa.array(da, pa.int64()),
                     "doc_b": pa.array(db, pa.int64())})


def distinct_pairs(cands, shuffle: str = "hash"):
    """Distributed DISTINCT over (doc_a, doc_b) pair rows WITHOUT a
    Ray ``groupby`` (whose sort-based Aggregate pays per-group Python —
    ruinous at millions of mostly-singleton pair groups).
    ``shuffle="sort"``: one distributed sort on the packed pair key;
    each block emits its strictly-interior values exactly once (equal
    values are contiguous after the sort, so a value strictly between a
    block's first and last values lives wholly inside that block) and
    routes first/last values to a bounded boundary table (2 rows per
    block); ONE rescue task re-adds each distinct boundary value once.
    ``shuffle="hash"``: coarse hash-bucket co-partition — equal pair
    keys land in one bucket, so a per-bucket ``np.unique`` IS the
    distinct, no boundary handling.  Requires doc ids < 2^31 (packed
    int64 key).

    Returns a Dataset of distinct (doc_a, doc_b) rows."""
    import ray
    import ray.data

    def pack(b: pa.Table) -> pa.Table:
        da = b["doc_a"].to_numpy(zero_copy_only=False)
        db = b["doc_b"].to_numpy(zero_copy_only=False)
        return pa.table({"pk": pa.array((da << np.int64(31)) | db,
                                        pa.int64())})

    def unpack(b: pa.Table) -> pa.Table:
        pk = b["pk"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_a": pa.array(pk >> np.int64(31), pa.int64()),
            "doc_b": pa.array(pk & np.int64((1 << 31) - 1), pa.int64())})

    if shuffle == "hash":
        from ..stages.scan import hash_bucket_scan

        packed = cands.map_batches(pack,
                                   batch_format="pyarrow").materialize()

        def uniq(tb: pa.Table) -> pa.Table:
            return pa.table({"pk": pa.array(np.unique(
                tb["pk"].to_numpy(zero_copy_only=False)), pa.int64())})

        return hash_bucket_scan(packed, ["pk"], uniq,
                                n_rows=packed.count()).map_batches(
            unpack, batch_format="pyarrow")

    srt = cands.map_batches(pack, batch_format="pyarrow").sort("pk") \
        .materialize()

    def interior(b: pa.Table) -> pa.Table:
        pk = b["pk"].to_numpy(zero_copy_only=False)
        if len(pk) == 0:
            return pa.table({"pk": pa.array([], pa.int64()),
                             "_bnd": pa.array([], pa.int8())})
        u = np.unique(pk)
        inner = u[(u != pk[0]) & (u != pk[-1])]
        bnd = np.array([pk[0], pk[-1]], np.int64)
        return pa.table({
            "pk": pa.array(np.concatenate([inner, bnd]), pa.int64()),
            "_bnd": pa.array(np.r_[np.zeros(len(inner), np.int8),
                                   np.ones(2, np.int8)], pa.int8())})

    marked = srt.map_batches(interior, batch_format="pyarrow",
                             batch_size=None).materialize()
    main = marked.filter(expr="_bnd == 0")
    bnd_refs = [r for bundle in (marked.filter(expr="_bnd == 1")
                                 .iter_internal_ref_bundles())
                for r in bundle.block_refs]

    @ray.remote
    def rescue(refs):
        tabs = [t for t in (ray.get(r) for r in refs) if t.num_rows]
        if not tabs:
            return pa.table({"pk": pa.array([], pa.int64()),
                             "_bnd": pa.array([], pa.int8())})
        vals = np.unique(np.concatenate(
            [t["pk"].to_numpy(zero_copy_only=False) for t in tabs]))
        return pa.table({"pk": pa.array(vals, pa.int64()),
                         "_bnd": pa.array(np.ones(len(vals), np.int8),
                                          pa.int8())})

    return (main.union(ray.data.from_arrow_refs([rescue.remote(bnd_refs)]))
            .map_batches(unpack, batch_format="pyarrow"))


def _df_ranks(ds, text_col: str, ngram_words: int = 1):
    """Global token ordering by (document frequency asc, hash asc) —
    the classic rarest-first prefix order (Vernica et al. phase 1).
    Distributed df aggregate (per-batch combine → token-key groupby);
    the (sorted token hashes, rank) pair is broadcast — vocabulary is
    assumed broadcastable (10⁷ tokens ≈ 160 MB), the standard
    assumption of the published MapReduce formulation."""

    def tok_partials(batch: pa.Table) -> pa.Table:
        toks = [_word_hashes64(t, ngram_words)
                for t in batch[text_col].to_pylist()]
        flat = (np.concatenate(toks) if toks else np.empty(0, np.int64))
        u, c = np.unique(flat, return_counts=True)
        return pa.table({"tok": pa.array(u, pa.int64()),
                         "df": pa.array(c.astype(np.int64), pa.int64())})

    df_tab = (ds.map_batches(tok_partials, batch_format="pyarrow")
              .groupby("tok").sum("df").to_pandas())
    tok = df_tab["tok"].to_numpy().astype(np.int64)
    df = df_tab["sum(df)"].to_numpy().astype(np.int64)
    order = np.lexsort((tok, df))          # (df asc, tok asc)
    rank_of = np.empty(len(tok), np.int64)
    rank_of[order] = np.arange(len(tok), dtype=np.int64)
    srt = np.argsort(tok, kind="stable")
    return tok[srt], rank_of[srt]          # (sorted tokens, their ranks)


def setsim_join(ds, tau: float, id_col: str = "doc_id",
                text_col: str = "text", freq_order: bool = False,
                broadcast_sketch_limit: int = 1_000_000,
                ngram_words: int = 1, shuffle: str = "hash"):
    """Exact τ-threshold word-set Jaccard self-join; returns a Dataset
    of (doc_a, doc_b, jac_micro) with doc_a < doc_b.

    ``freq_order=True`` orders prefixes rarest-token-first (one extra
    df aggregate + a broadcast token→rank table): prefix tokens become
    rare, shrinking candidate token groups on skewed vocabularies.
    The OUTPUT is identical under any order — only candidate counts
    change (tested).

    Verification: when the Bloom-filtered sketch table has ≤
    ``broadcast_sketch_limit`` docs it is broadcast once (``ray.put``)
    and candidates verify in ONE map pass; above the limit the two
    sort-based co-partition joins run instead (no broadcast
    proportional to the candidate set).  Both paths are exact and
    tested equal."""
    import ray
    import ray.data

    rank_ref = None
    if freq_order:
        sorted_tok, ranks = _df_ranks(ds, text_col, ngram_words)
        rank_ref = ray.put((sorted_tok, ranks))

    def prefix_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        toks = [_word_hashes64(t, ngram_words)
                for t in batch[text_col].to_pylist()]
        if rank_ref is not None:
            sorted_tok, ranks = _obj_cached(rank_ref)
            # re-key each doc's tokens by global rank; sort ascending
            # so the prefix slice takes the RAREST tokens
            toks = [np.sort(ranks[np.searchsorted(sorted_tok, t)])
                    for t in toks]
        sizes = np.array([len(t) for t in toks], np.int64)
        plens = _prefix_len(sizes, tau)
        plens[sizes == 0] = 0
        flat = (np.concatenate([t[:l] for t, l in zip(toks, plens)])
                if len(toks) else np.empty(0, np.int64))
        rep = np.repeat(np.arange(len(toks)), plens)
        return pa.table({"tok": pa.array(flat, pa.int64()),
                         "doc_id": pa.array(ids[rep], pa.int64()),
                         "size": pa.array(sizes[rep], pa.int64())})

    rows = ds.map_batches(prefix_rows, batch_format="pyarrow")

    def block_pairs(b: pa.Table) -> pa.Table:
        return _run_pairs(b["tok"].to_numpy(zero_copy_only=False),
                          b["doc_id"].to_numpy(zero_copy_only=False),
                          b["size"].to_numpy(zero_copy_only=False),
                          None, tau)

    if shuffle == "hash":
        # hash-bucket co-partition: a token run can never straddle a
        # bucket, so candidate generation needs no edge-run rescue
        from ..stages.scan import hash_bucket_scan

        rows = rows.materialize()

        def bucket_pairs(tb: pa.Table) -> pa.Table:
            idx = np.lexsort((tb["doc_id"].to_numpy(zero_copy_only=False),
                              tb["tok"].to_numpy(zero_copy_only=False)))
            return block_pairs(tb.take(pa.array(idx, pa.int64())))

        cands = hash_bucket_scan(rows, ["tok"], bucket_pairs,
                                 n_rows=rows.count())
    else:
        srt = rows.sort(["tok", "doc_id"]).materialize()

        def edge_run_rows(b: pa.Table) -> pa.Table:
            """Rows of each block's FIRST and LAST token run (a
            straddling run is one of these by construction),
            block-tagged.  Bounded by the two edge-run lengths per
            block, not block size."""
            if b.num_rows == 0:
                return b.append_column("_blk", pa.array([], pa.int64()))
            tok = b["tok"].to_numpy(zero_copy_only=False)
            first = tok == tok[0]
            last = tok == tok[-1]
            idx = np.flatnonzero(first | last)
            t = b.take(pa.array(idx, pa.int64()))
            return t.append_column("_blk", pa.array(
                np.full(len(t), _blk_tag(), np.int64), pa.int64()))

        cands = srt.map_batches(block_pairs, batch_format="pyarrow")
        bnd = (srt.map_batches(edge_run_rows, batch_format="pyarrow")
               .to_pandas().sort_values(["tok", "doc_id"], kind="mergesort"))
        stitched = _run_pairs(bnd["tok"].to_numpy(), bnd["doc_id"].to_numpy(),
                              bnd["size"].to_numpy(), bnd["_blk"].to_numpy(),
                              tau)
        if stitched.num_rows:
            cands = cands.union(ray.data.from_arrow(stitched))
    cands = distinct_pairs(cands, shuffle=shuffle).materialize()
    n_cands = cands.count()
    empty = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
        "jac_micro": pa.array([], pa.int64())}))
    if n_cands == 0:
        return empty

    bf = BloomFilter(2 * n_cands)
    for b in cands.iter_batches(batch_format="pyarrow"):
        bf.add(b["doc_a"].to_numpy(zero_copy_only=False))
        bf.add(b["doc_b"].to_numpy(zero_copy_only=False))
    bf_ref = ray.put(bf)

    def sketch_rows(batch: pa.Table) -> pa.Table:
        f = _obj_cached(bf_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keep = f.contains(ids)
        texts = batch[text_col].to_pylist()
        blobs = [_word_hashes64(texts[i], ngram_words).tobytes()
                 for i in np.flatnonzero(keep)]
        n = int(keep.sum())
        return pa.table({
            "k": pa.array(ids[keep], pa.int64()),
            "kind": pa.array(np.zeros(n, np.int64)),
            "doc_a": pa.array(np.zeros(n, np.int64)),
            "doc_b": pa.array(np.zeros(n, np.int64)),
            "sh": pa.array(blobs, pa.binary()),
        })

    cand_sh = ds.map_batches(sketch_rows,
                             batch_format="pyarrow").materialize()

    if cand_sh.count() <= broadcast_sketch_limit:
        # broadcast-verify fast path: sketch dict ships once per
        # worker process, candidates verify in one vectorized-loop map
        sk = cand_sh.to_pandas()
        blob_ref = ray.put(dict(zip(sk["k"].to_numpy().astype(np.int64),
                                    sk["sh"].tolist())))

        def bverify(b: pa.Table) -> pa.Table:
            blobs = _obj_cached(blob_ref)
            da = b["doc_a"].to_numpy(zero_copy_only=False)
            db = b["doc_b"].to_numpy(zero_copy_only=False)
            jac = _batch_jaccard([blobs[i] for i in da],
                                 [blobs[i] for i in db])
            keep = jac >= tau
            return pa.table({
                "doc_a": pa.array(da[keep], pa.int64()),
                "doc_b": pa.array(db[keep], pa.int64()),
                "jac_micro": pa.array(
                    np.floor(jac[keep] * 1e6 + 0.5).astype(np.int64),
                    pa.int64()),
            })

        return cands.map_batches(bverify, batch_format="pyarrow")

    def _take(col, idx):
        return col.take(pa.array(np.asarray(idx, np.int64), pa.int64()))

    def edges_keyed(key_col):
        def f(b: pa.Table) -> pa.Table:
            n = len(b)
            return pa.table({
                "k": b[key_col],
                "kind": pa.array(np.ones(n, np.int64)),
                "doc_a": b["doc_a"],
                "doc_b": b["doc_b"],
                "sh": pa.array([b""] * n, pa.binary()),
            })
        return f

    def attach_finish(tb: pa.Table, res_e, res_g) -> pa.Table:
        return pa.table({
            "doc_a": _take(tb["doc_a"], res_e),
            "doc_b": _take(tb["doc_b"], res_e),
            "sh": _take(tb["sh"], res_g),
        })

    n_join_rows = n_cands + cand_sh.count()
    half = _copart_join(
        cands.map_batches(edges_keyed("doc_b"), batch_format="pyarrow")
        .union(cand_sh), attach_finish, shuffle=shuffle,
        n_rows=n_join_rows)

    def half_keyed(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table({
            "k": b["doc_a"],
            "kind": pa.array(np.ones(n, np.int64)),
            "doc_a": b["doc_a"],
            "doc_b": b["doc_b"],
            "sh": b["sh"],
        })

    def verify_finish(tb: pa.Table, res_e, res_g) -> pa.Table:
        a_blobs = _take(tb["sh"], res_g).to_pylist()
        b_blobs = _take(tb["sh"], res_e).to_pylist()
        jac = _batch_jaccard(a_blobs, b_blobs)
        keep = jac >= tau
        ke = np.asarray(res_e)[keep]
        micro = np.floor(jac[keep] * 1e6 + 0.5).astype(np.int64)
        return pa.table({
            "doc_a": _take(tb["doc_a"], ke),
            "doc_b": _take(tb["doc_b"], ke),
            "sh": pa.array([m.tobytes() for m in micro], pa.binary()),
        })

    verified = _copart_join(
        half.map_batches(half_keyed, batch_format="pyarrow")
        .union(cand_sh), verify_finish, shuffle=shuffle,
        n_rows=n_join_rows)

    def unpack(b: pa.Table) -> pa.Table:
        micro = np.array([np.frombuffer(x, np.int64)[0]
                          for x in b["sh"].to_pylist()], np.int64) \
            if b.num_rows else np.empty(0, np.int64)
        return pa.table({"doc_a": b["doc_a"], "doc_b": b["doc_b"],
                         "jac_micro": pa.array(micro, pa.int64())})

    return verified.map_batches(unpack, batch_format="pyarrow")


def setsim_sql(table: str, tau: float, id_col: str = "doc_id",
               text_col: str = "text", ngram_words: int = 1) -> str:
    """DuckDB oracle: exact pairwise word-set (or word-shingle-set)
    Jaccard ≥ τ (quadratic — test-scale only), same tokenization and
    same pinned division."""
    if ngram_words <= 1:
        tok_cte = f"""
  SELECT DISTINCT {id_col} AS doc_id, t AS token FROM (
    SELECT {id_col}, unnest(string_split_regex(lower({text_col}),
                                               '[^a-z0-9]+')) AS t
    FROM {table})
  WHERE t <> ''"""
    else:
        n = ngram_words
        tok_cte = f"""
  SELECT DISTINCT {id_col} AS doc_id,
         array_to_string(arr[i:i+{n - 1}], ' ') AS token
  FROM (SELECT {id_col}, regexp_extract_all(lower({text_col}),
                                            '[a-z0-9]+') AS arr
        FROM {table}),
       UNNEST(range(1, len(arr) - {n - 2})) t(i)"""
    return f"""
WITH tok AS ({tok_cte}
), sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS o
  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
  CAST(floor(CAST(o AS DOUBLE) / CAST(na.n + nb.n - o AS DOUBLE)
             * 1000000 + 0.5) AS BIGINT) AS jac_micro
FROM inter
JOIN sz na ON na.doc_id = doc_a
JOIN sz nb ON nb.doc_id = doc_b
WHERE CAST(o AS DOUBLE) / CAST(na.n + nb.n - o AS DOUBLE) >= {tau}
"""
