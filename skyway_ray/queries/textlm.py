"""textlm query family (split from the former single-file queries module)."""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo.cells import cell_id, cell_sql
from ..geo.tiles import tile_sql, tile_xy
from ._common import (
    CEL_EVENTS_EXPR,
    _BM25_K,
    _BM25_TERMS,
    _SCAN_PHRASES,
    _copart_lookup,
    _corpus_bigram_counts,
    _corpus_unigram_counts,
    _nrows,
    _read,
    _unigram_count_df,
)




def q_token_count(sf_dir: str):
    """Token counting over documents (text-analysis op)."""
    from ..functions.text import token_count

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
    from ..functions.text import bpe_token_count

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_bpe_tokens": bpe_token_count(batch["text"]),
        })

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pandas")


def q_bpe_tokens_sql() -> str:
    from ..functions.text import BPE_RE

    pat = BPE_RE.replace("'", "''")
    return ("SELECT doc_id, cast(length(regexp_extract_all(text, "
            f"'{pat}')) as bigint) AS n_bpe_tokens FROM documents")


def q_quality(sf_dir: str):
    """Quality-scoring features (counts + one ratio of ints)."""
    from ..functions.text import char_count, punct_count, token_count

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


def q_cel_filter(sf_dir: str):
    """CEL-filtered scan (filters/cel.py): exercises float arithmetic,
    the lazy ternary, equality, and list membership in one expression —
    the practical surface the reference's embedded cel-interpreter
    exposes (docs/src/cel-filters.md).  The batch's columns are the CEL
    identifiers.  Hash-stable: ``value * 2.0`` is a power-of-two scale
    (exact in IEEE), everything else is string/bool logic."""
    from ..filters.cel import CelFilter

    f = CelFilter(CEL_EVENTS_EXPR)
    return _read(sf_dir, "events",
                 ["event_id", "event_type", "value"]).map_batches(
        f.apply_table, batch_format="pyarrow")


def q_cel_filter_sql() -> str:
    return ("SELECT event_id, event_type, value FROM events "
            "WHERE CASE WHEN value * 2.0 > 150.0 "
            "THEN event_type = 'click' "
            "ELSE event_type IN ('view', 'purchase') END")


_OSMF_K = 1000  # head-K elements: the fixture's tags depend only on the
# row index (never on corpus size n — unlike nodes/members), so a fixed
# SQL replay of the tag generator + the filter's DSL semantics is
# identical at every scale, same pattern as the image checksum family


def q_osmfilter_docs(sf_dir: str):
    """Hash verification of the CANONICAL DOCS FILTER (the OSMFilter
    DSL end-to-end: TYPE dispatch, HAS, EQUALS, SET replace-or-append,
    COMMIT/DROP) over the head-K conformance elements: ways with a
    footway tag get surface=concrete set (n_tags +1 only when no
    surface tag existed), relations tagged type=route drop, everything
    else commits unchanged.  The oracle regenerates each element's tag
    multiset from the fixture's closed-form index arithmetic
    (fixtures.py::make_osm_elements — vocab picks, first-key-wins
    dedup, the conditional footway/route appends) and applies the same
    mutation algebra in SQL, so parser, compiler, and vectorized
    mutation kernel are all pinned."""
    import pyarrow.dataset as pds
    import ray.data

    from ..filters.vector import CompiledFilter
    from ..fixtures import ensure_osm_elements_parquet, scale_for_sf_dir

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
    ds = ray.data.read_parquet(path, filter=pds.field("id") <= _OSMF_K)
    out = ds.map_batches(f.apply_table, batch_format="pyarrow")
    return out.map_batches(
        lambda b: pa.table({
            "id": b["id"],
            "type": b["type"],
            "n_tags": pa.compute.fill_null(
                pa.compute.list_value_length(b["tags"]), 0),
        }),
        batch_format="pyarrow")


def q_langid(sf_dir: str):
    """Language-ID heuristic over documents (hash-verified: the
    stopword-hit argmax is integer counting over RE2-compatible
    tokenization, so a DuckDB ``regexp_extract_all`` + ``list_filter``
    oracle reproduces it exactly — see :func:`q_langid_sql`)."""
    from ..functions.text import guess_lang

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "lang_guess": guess_lang(batch["text"])})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pandas")


def q_langid_sql() -> str:
    """Mirror of functions/text.py guess_lang: tokenize with the same
    RE2/re-agreeing class, count stopword hits per language, argmax
    with ties broken by language-code order, 'und' below 2 hits."""
    from ..functions.text import _LANG_STOPWORDS

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
    from ..functions.text import fingerprint64

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


def q_top_tokens(sf_dir: str):
    """Exact corpus-wide top-20 most frequent tokens (wordcount shape):
    per-batch vectorized token counting (one np.unique over the batch's
    flat token list — the combiner: the shuffle ships per-batch
    DISTINCT tokens, not token instances), hash groupby over the
    unbounded token key, pre-reduced global top-k."""
    from ..stages.topk import top_k

    def count_batch(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.lower().str.findall(r"[a-z0-9]+")
        flat = np.concatenate([np.asarray(t, dtype=object)
                               for t in toks if len(t)] or
                              [np.array([], dtype=object)])
        uniq, counts = np.unique(flat, return_counts=True)
        return pd.DataFrame({"tok": uniq.astype(str),
                             "n": counts.astype(np.int64)})

    from ..stages.scan import hash_bucket_scan

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

    from ..stages.scan import hash_bucket_scan

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


def q_bpe_merges(sf_dir: str) -> pd.DataFrame:
    """Distributed BPE tokenizer training, the real production shape:
    the corpus-sized step is a word-frequency count (per-batch
    ``np.unique`` combiner → one token-key shuffle), and the merge loop
    runs over the VOCABULARY-bounded (word, count) table
    (functions/text.py::learn_bpe_merges — deterministic tie-breaks).
    Returns (rank, left, right) merge rows.  Hash-verified: the
    iterative merge loop IS SQL-expressible — q_bpe_merges_sql replays
    each round with a recursive CTE (grouped pair counts over the
    round's working set, the count-then-lexicographic argmax via
    QUALIFY, and the left-to-right non-overlapping merge apply as a
    list_reduce whose replace-last rule is provably equivalent: a
    merged symbol a||b can never equal a, so overlap never chains).
    A pure-Python reference BPE additionally asserts equality in
    tests."""
    from ..functions.text import learn_bpe_merges

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


def q_bpe_merges_sql(n_merges: int = 40) -> str:
    """Recursive-CTE replay of learn_bpe_merges (see q_bpe_merges).
    State rows are (round, word, symbol list, count) plus the merge
    that produced the round; each recursive step counts adjacent
    symbol pairs over the round's working set (overlap-inclusive,
    like the engine's zip), picks max-count-then-lexicographic-min
    via QUALIFY, and rewrites every word's list with the fold.  The
    accumulator is a PLAIN list — DuckDB 1.0's list_reduce drops
    list-valued fields inside struct accumulators."""
    fold = (
        "list_reduce("
        "list_prepend(CAST([] AS VARCHAR[]), "
        "list_transform(s.syms, x -> [x])), "
        "(acc, cur) -> CASE WHEN len(acc) > 0 AND acc[-1] = bp.a "
        "AND cur[1] = bp.b "
        "THEN list_append(acc[:len(acc)-1], bp.a || bp.b) "
        "ELSE list_append(acc, cur[1]) END)")
    return (
        "WITH RECURSIVE "
        "wc AS (SELECT tk AS w, CAST(count(*) AS BIGINT) AS n "
        "FROM (SELECT unnest(regexp_extract_all(lower(text), "
        "'[a-z0-9]+')) AS tk FROM documents) GROUP BY 1), "
        "st AS ("
        "SELECT 0 AS rnd, w, string_split(w, '') AS syms, n, "
        "CAST(NULL AS VARCHAR) AS ml, CAST(NULL AS VARCHAR) AS mr "
        "FROM wc "
        "UNION ALL "
        f"SELECT s.rnd + 1, s.w, {fold}, s.n, bp.a, bp.b "
        "FROM st s "
        "JOIN (SELECT rnd, a, b FROM ("
        "SELECT q.rnd, q.p[1] AS a, q.p[2] AS b, sum(q.n) AS c "
        "FROM (SELECT rnd, n, unnest(list_transform("
        "range(1, len(syms)), i -> [syms[i], syms[i+1]])) AS p "
        "FROM st WHERE len(syms) > 1) q GROUP BY 1, 2, 3) "
        "QUALIFY row_number() OVER (PARTITION BY rnd "
        "ORDER BY c DESC, a, b) = 1) bp ON bp.rnd = s.rnd "
        f"WHERE s.rnd < {n_merges}) "
        "SELECT DISTINCT CAST(rnd - 1 AS BIGINT) AS rank, "
        "ml AS \"left\", mr AS \"right\" FROM st WHERE rnd > 0"
    )


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

    from ..functions.text import benchmark_overlap_counts, ngram_strings

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


def q_props_extract(sf_dir: str):
    """Semi-structured field extraction: pull the integer ``k`` out of
    the JSON-ish ``props`` string with an RE2 kernel
    (pyarrow.compute.extract_regex — same engine class as DuckDB's
    regexp_extract), then an exact grouped sum/count via per-batch
    partials + combiner tree."""
    import pyarrow.compute as pc

    from ..stages.agg_tree import tree_aggregate

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


def q_prep_pipeline(sf_dir: str):
    """End-to-end training-data prep (the composition story): language
    ID + quality filter → unbounded-key Bloom dedup on content
    fingerprints → benchmark decontamination (broadcast 5-gram set) →
    BPE-ish token counting, all streaming map stages — documents never
    shuffle except the dup-rate-bounded dedup projection.  Returns the
    surviving-doc manifest (doc_id, lang, n_tokens, n_bpe)."""
    import pyarrow.parquet as pq
    import ray

    from ..functions.text import (benchmark_overlap_counts,
                                 bpe_token_count, fingerprint64,
                                 guess_lang, ngram_strings,
                                 quality_features)
    from ..stages.dedup import exact_dedup_bloom

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


def q_prep_pipeline_sql() -> str:
    """Composition oracle: every stage of the prep manifest is the SQL
    of an already hash-verified component — langid (q_langid_sql),
    quality counts/ratio (q_quality_sql's literals), min-id-per-text
    dedup (q_bloom_dedup_sql's window; identical text ⟺ identical
    fingerprint, the same no-collision premise that query rests on),
    the 5-gram benchmark overlap (q_decontam_sql's CTEs), and the
    BPE-piece count (q_bpe_tokens_sql's RE2 pattern) — chained in the
    pipeline's order, so the COMPOSITION itself is pinned end-to-end."""
    from ..functions.text import BPE_RE

    punct = r"[.,;:!?''\"()\[\]{}-]"   # q_quality_sql's literal
    bpe = BPE_RE.replace("'", "''")
    return (
        "WITH lang AS (SELECT * FROM (" + q_langid_sql() + ")), "
        "q AS (SELECT doc_id, text, length(text) AS n_chars, "
        "CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+')) "
        "AS BIGINT) AS n_tokens, "
        f"CAST(length(regexp_extract_all(text, '{punct}')) AS BIGINT) "
        "AS n_punct FROM documents), "
        "keep1 AS (SELECT q.doc_id, q.text, l.lang_guess AS lang, "
        "q.n_tokens FROM q JOIN lang l ON l.doc_id = q.doc_id "
        "WHERE l.lang_guess <> 'und' AND q.n_chars >= 50 AND "
        "(CASE WHEN q.n_chars > 0 THEN q.n_punct "
        "/ CAST(q.n_chars AS DOUBLE) ELSE 0.0 END) <= 0.2), "
        "ded AS (SELECT doc_id, text, lang, n_tokens FROM ("
        "SELECT k.*, min(doc_id) OVER (PARTITION BY text) AS w "
        "FROM keep1 k) WHERE doc_id = w), "
        "docs5 AS (SELECT doc_id, regexp_extract_all(lower(text), "
        "'[a-z0-9]+') AS arr FROM documents), "
        "grams AS (SELECT doc_id, array_to_string(arr[i:i+4], ' ') AS g "
        "FROM docs5, UNNEST(range(1, len(arr) - 3)) AS t(i)), "
        "bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 10), "
        "hits AS (SELECT DISTINCT doc_id FROM grams "
        "WHERE g IN (SELECT g FROM bench)) "
        "SELECT d.doc_id, d.lang, d.n_tokens, "
        f"CAST(length(regexp_extract_all(d.text, '{bpe}')) AS BIGINT) "
        "AS n_bpe FROM ded d "
        "WHERE d.doc_id NOT IN (SELECT doc_id FROM hits)"
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

    from ..functions.setsim import _batch_jaccard
    from ..stages.scan import hash_bucket_scan

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

    from ..stages.scan import hash_bucket_scan

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


def q_cooccur(sf_dir: str):
    """Event-type co-occurrence supports (association mining: for each
    unordered type pair, how many users performed both).  ONE user-key
    hash exchange; inside a bucket the distinct (user, type) pairs
    fall out of a lexsort + boundary mask and each user's pair
    expansion is the grouped-arange arithmetic (no per-user loop);
    the bounded (type_a, type_b) supports ride the combiner tree.
    Exact ints — bit-match vs the distinct self-join oracle."""
    from ..stages.agg_tree import tree_aggregate
    from ..stages.scan import hash_bucket_scan

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
        from ..stages.joins import _cached

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
    from ..stages.topk import top_k

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
    from ..stages.scan import hash_bucket_scan
    from ..stages.topk import top_k

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
    from ..stages.scan import hash_bucket_scan
    from ..stages.topk import top_k

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
    from ..stages.agg_tree import tree_aggregate_to_table
    from ..stages.scan import hash_bucket_scan

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

    from ..stages.agg_tree import tree_aggregate_to_table

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


def q_rare_tokens(sf_dir: str):
    """Per-document rare-token counts (tokens whose CORPUS frequency
    is strictly below the corpus mean — the scale-free stand-in for
    hapax legomena on bounded-vocabulary fixtures; the predicate is
    the exact integer test c·V < T so no float average is involved):
    the session-cached corpus wordcount pass filters to the rare
    vocabulary, docs attach it through the open-vocabulary
    ``_copart_lookup`` string-key exchange (neither side is assumed to
    fit a worker — the rare set grows with the corpus), and per-doc
    counts resolve through one doc_id hash exchange.  Docs with no
    rare token drop (inner-join shape, mirrored in the oracle).  The
    V/T scalars come from the vocabulary-bounded cached count table
    (same driver-side posture as q_unigram_logprob)."""
    from ..stages.scan import hash_bucket_scan
    from ._common import _copart_lookup, _corpus_unigram_counts

    n_docs = _nrows(sf_dir, "documents")
    uni = _corpus_unigram_counts(sf_dir)
    vdf = uni.to_pandas()
    V = np.int64(len(vdf))
    T = np.int64(vdf["n"].sum())

    def to_lut(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        t = b.filter(pa.array(n * V < T))
        return pa.table({"_lk": t["tok"],
                         "_lv": pa.array(np.ones(len(t), np.int64),
                                         pa.int64())})

    lut = uni.map_batches(to_lut, batch_format="pyarrow")

    def doc_tokens(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.lower().str.findall(r"[a-z0-9]+")
        lens = toks.str.len().to_numpy().astype(np.int64)
        flat = np.concatenate([np.asarray(t, dtype="U")
                               for t in toks if len(t)] or
                              [np.array([], dtype="U")])
        return pd.DataFrame({
            "doc_id": np.repeat(b["doc_id"].to_numpy(), lens),
            "tok": flat.astype(object)})

    rows = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        doc_tokens, batch_format="pandas")
    hits = _copart_lookup(rows, lut, key_col="tok", out_col="hit",
                          n_rows=40 * n_docs)

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"doc_id": b["doc_id"], "n_rare": b["hit"]})
        g = t.group_by(["doc_id"]).aggregate([("n_rare", "sum")])
        return g.rename_columns(["doc_id", "n_rare"])

    return hash_bucket_scan(
        hits.map_batches(partial, batch_format="pyarrow"),
        ["doc_id"],
        lambda t: t.group_by(["doc_id"]).aggregate([("n_rare", "sum")])
        .rename_columns(["doc_id", "n_rare"]),
        n_rows=n_docs)


def q_rare_tokens_sql() -> str:
    return (
        "WITH w AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), "
        "'[a-z0-9]+')) AS tok FROM documents), "
        "cnt AS (SELECT tok, count(*) AS c FROM w GROUP BY 1), "
        "s AS (SELECT CAST(count(*) AS BIGINT) AS v, "
        "CAST(sum(c) AS BIGINT) AS t FROM cnt), "
        "rare AS (SELECT tok FROM cnt, s WHERE c * v < t) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_rare "
        "FROM w JOIN rare USING (tok) GROUP BY 1"
    )


def q_osmfilter_docs_sql() -> str:
    return (
        "WITH elems AS (SELECT CAST(i AS BIGINT) AS i, "
        "CAST(i + 1 AS BIGINT) AS id, "
        "CASE WHEN i % 10 < 7 THEN 'node' WHEN i % 10 < 9 THEN 'way' "
        "ELSE 'relation' END AS type "
        f"FROM range({_OSMF_K}) t(i)), "
        # the 8-entry tag vocabulary (fixtures.py::_TAG_VOCAB); only
        # key identity and the 'type' values affect the output
        "vocab(ki, key, nv) AS (SELECT * FROM (VALUES "
        "(0, 'highway', 4), (1, 'surface', 3), (2, 'oneway', 2), "
        "(3, 'footway', 2), (4, 'type', 3), (5, 'route', 2), "
        "(6, 'name', 3), (7, 'cycleway:right', 2))), "
        "picks AS (SELECT e.i, kk.k, ((e.i * 3 + kk.k) % 8) AS ki "
        "FROM elems e JOIN range(5) kk(k) ON kk.k < e.i % 6), "
        "tagged AS (SELECT p.i, p.k, v.key, "
        "CASE WHEN v.ki = 4 AND (p.i + p.k) % v.nv = 0 "
        "THEN 'route' ELSE '' END AS tval, "
        "row_number() OVER (PARTITION BY p.i, v.key ORDER BY p.k) "
        "AS rn FROM picks p JOIN vocab v ON v.ki = p.ki), "
        "base AS (SELECT i, key, tval FROM tagged WHERE rn = 1), "
        "app AS (SELECT e.i, 'footway' AS key, '' AS tval FROM elems e "
        "WHERE e.type = 'way' AND e.i % 4 = 0 AND NOT EXISTS ("
        "SELECT 1 FROM base b WHERE b.i = e.i AND b.key = 'footway') "
        "UNION ALL SELECT e.i, 'type', 'route' FROM elems e "
        "WHERE e.type = 'relation' AND e.i % 3 = 0 AND NOT EXISTS ("
        "SELECT 1 FROM base b WHERE b.i = e.i AND b.key = 'type')), "
        "tags AS (SELECT * FROM base UNION ALL SELECT * FROM app), "
        "feat AS (SELECT e.i, e.id, e.type, "
        "COALESCE(t.ntags, 0) AS ntags, "
        "COALESCE(t.has_footway, FALSE) AS has_footway, "
        "COALESCE(t.has_surface, FALSE) AS has_surface, "
        "COALESCE(t.type_route, FALSE) AS type_route "
        "FROM elems e LEFT JOIN (SELECT i, count(*) AS ntags, "
        "bool_or(key = 'footway') AS has_footway, "
        "bool_or(key = 'surface') AS has_surface, "
        "bool_or(key = 'type' AND tval = 'route') AS type_route "
        "FROM tags GROUP BY 1) t ON t.i = e.i) "
        "SELECT id, type, CAST(CASE WHEN type = 'way' AND has_footway "
        "AND NOT has_surface THEN ntags + 1 ELSE ntags END AS BIGINT) "
        "AS n_tags FROM feat "
        "WHERE NOT (type = 'relation' AND type_route)"
    )


def q_winnowing(sf_dir: str):
    """WINNOWING document fingerprints (the MOSS near-dup selection
    scheme): per doc the byte-8-gram rolling-hash count and the exact
    sum of window-4 minima (functions/text.py::winnow_features — one
    flat-buffer batch kernel, no per-string Python).  Streaming
    map-only; at corpus scale the selected minima would feed the LSH
    dedup harness — the pinned sums prove the selection logic.
    Oracle = an explicit 8-step HUGEINT Horner chain per position and
    a w-row window min, summed per doc."""
    from ..functions.text import winnow_features

    def f(b: pd.DataFrame) -> pd.DataFrame:
        nk, ws = winnow_features(b["text"])
        return pd.DataFrame({"doc_id": b["doc_id"],
                             "n_kgrams": nk, "winnow_sum": ws})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pandas")


def q_winnowing_sql() -> str:
    K, M = 1099511628211, 18446744073709551616
    k, w = 8, 4

    def byte(i: int) -> str:
        return (f"(CAST(concat('0x', substr(hx, 2 * (p + {i}) + 1, 2)) "
                "AS INT) + 1)")

    acc = f"CAST({byte(0)} AS HUGEINT)"
    for i in range(1, k):
        acc = (f"(({acc}) * {K}::HUGEINT + {byte(i)}) "
               f"% {M}::HUGEINT")
    return (
        "WITH d AS (SELECT doc_id, hex(encode(text)) AS hx, "
        "octet_length(encode(text)) AS n FROM documents), "
        "pos AS (SELECT doc_id, hx, n, p FROM d "
        "JOIN range(0, 8192) r(p) "  # fixture docs ≤ ~600 B; bound is a SQL-only cap
        
        f"ON p <= n - {k}), "
        f"h AS (SELECT doc_id, n, p, CAST(({acc}) % 4294967296::HUGEINT "
        "AS BIGINT) AS h32 FROM pos), "
        "wm AS (SELECT doc_id, n, p, min(h32) OVER "
        "(PARTITION BY doc_id ORDER BY p "
        f"ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS wmin "
        "FROM h), "
        "agg AS (SELECT doc_id, CAST(sum(wmin) AS BIGINT) AS winnow_sum"
        f" FROM wm WHERE p <= n - {k} - {w} + 1 GROUP BY 1) "
        "SELECT d.doc_id, "
        f"CAST(greatest(d.n - {k} + 1, 0) AS BIGINT) AS n_kgrams, "
        "COALESCE(agg.winnow_sum, 0) AS winnow_sum "
        "FROM d LEFT JOIN agg ON agg.doc_id = d.doc_id"
    )


def q_byte_entropy(sf_dir: str):
    """BYTE-HISTOGRAM ENTROPY per document — the compressibility /
    encoding-anomaly screen (the text sibling of q_image_entropy):
    Shannon entropy over each doc's UTF-8 byte distribution, pinned
    per term (floor(−p·ln p·10⁹ + 0.5)) + the distinct-byte count.
    ONE flat-buffer pass: a joint (doc_code·256 + byte) bincount
    gives every histogram without per-string Python.  Oracle unrolls
    bytes via the winnowing hex-pair position join."""
    def f(b: pd.DataFrame) -> pd.DataFrame:
        arr = pa.array(b["text"].fillna(""), type=pa.large_string())
        m = len(arr)
        offs = np.frombuffer(arr.buffers()[1], np.int64, count=m + 1,
                             offset=8 * arr.offset)
        lens = np.diff(offs)
        total = int(offs[-1] - offs[0])
        h = np.zeros(m, np.int64)
        nb = np.zeros(m, np.int64)
        if total:
            data = np.frombuffer(arr.buffers()[2], np.uint8,
                                 count=total, offset=int(offs[0]))
            code = np.repeat(np.arange(m, dtype=np.int64), lens)
            joint = np.bincount(code * 256 + data.astype(np.int64),
                                minlength=m * 256).reshape(m, 256)
            nz = joint > 0
            nb = nz.sum(axis=1).astype(np.int64)
            with np.errstate(divide="ignore", invalid="ignore"):
                p = joint / np.maximum(lens, 1)[:, None]
                terms = np.where(nz, np.floor(-(p * np.log(
                    np.where(nz, p, 1.0))) * 1e9 + 0.5), 0.0)
            h = terms.sum(axis=1).astype(np.int64)
        return pd.DataFrame({"doc_id": b["doc_id"],
                             "h_nano": h, "n_bytes": nb})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pandas")


def q_byte_entropy_sql() -> str:
    return (
        "WITH d AS (SELECT doc_id, hex(encode(text)) AS hx, "
        "octet_length(encode(text)) AS n FROM documents), "
        "pos AS (SELECT doc_id, hx, n, p FROM d "
        "JOIN range(0, 8192) r(p) ON p < n), "
        "b AS (SELECT doc_id, n, CAST(concat('0x', "
        "substr(hx, 2 * p + 1, 2)) AS INT) AS byte FROM pos), "
        "c AS (SELECT doc_id, any_value(n) AS n, byte, count(*) AS c "
        "FROM b GROUP BY doc_id, byte), "
        "t AS (SELECT doc_id, CAST(floor(-((CAST(c AS DOUBLE) / n) * "
        "ln(CAST(c AS DOUBLE) / n)) * 1e9 + 0.5) AS BIGINT) AS term "
        "FROM c) "
        "SELECT d.doc_id, CAST(COALESCE(s.h, 0) AS BIGINT) AS h_nano, "
        "CAST(COALESCE(s.nb, 0) AS BIGINT) AS n_bytes FROM d "
        "LEFT JOIN (SELECT doc_id, sum(term) AS h, count(*) AS nb "
        "FROM t GROUP BY 1) s ON s.doc_id = d.doc_id"
    )


_HEAPS_NS = (1000, 2000, 4000, 8000)
_HEAPS_DOC_CAP = 200


def q_heaps_curve(sf_dir: str):
    """HEAPS'-LAW vocabulary-growth curve: distinct token count among
    the first N corpus tokens (docs ordered by doc_id, tokens in doc
    order) for N ∈ {1k, 2k, 4k, 8k}.  Only the corpus HEAD can matter
    (≤ 200 docs cover every probe at fixture token densities), so the
    read is a pushed-down doc_id filter and the fold is bounded by
    construction — the head-K pattern of the image-checksum family.
    Tokenization is the corpus-standard [a-z0-9]+ lowercase.  Oracle
    re-derives positions with a per-doc range join + window offsets."""
    import pyarrow.dataset as pds
    import ray.data

    def toks(b: pd.DataFrame) -> pd.DataFrame:
        t = b["text"].str.lower().str.findall(r"[a-z0-9]+")
        lens = t.str.len().to_numpy()
        flat = np.concatenate([np.asarray(x, object) for x in t
                               if len(x)] or [np.array([], object)])
        doc = np.repeat(b["doc_id"].to_numpy(), lens)
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens)
        return pd.DataFrame({"doc_id": doc, "pos": pos,
                             "tok": flat.astype(str)})

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filter=pds.field("doc_id") < _HEAPS_DOC_CAP)
    rows = ds.map_batches(toks, batch_format="pandas").to_pandas()
    rows = rows.sort_values(["doc_id", "pos"],
                            kind="mergesort").reset_index(drop=True)
    toks_arr = rows["tok"].to_numpy()
    out = []
    for N in _HEAPS_NS:
        head = toks_arr[:N]
        out.append((N, len(np.unique(head))))
    return pd.DataFrame(out, columns=["n_tokens", "vocab"]
                        ).astype(np.int64)


def q_heaps_curve_sql() -> str:
    ns = ", ".join(str(n) for n in _HEAPS_NS)
    return (
        "WITH d AS (SELECT doc_id, "
        "regexp_extract_all(lower(text), '[a-z0-9]+') AS l "
        f"FROM documents WHERE doc_id < {_HEAPS_DOC_CAP}), "
        "t AS (SELECT doc_id, p, l[p + 1] AS tok FROM d "
        "JOIN range(0, 8192) r(p) ON p < len(l)), "
        "o AS (SELECT doc_id, sum(len(l)) OVER (ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS off "
        "FROM d), "
        "g AS (SELECT t.tok, COALESCE(o.off, 0) + t.p AS gpos "
        "FROM t JOIN o ON o.doc_id = t.doc_id) "
        f"SELECT CAST(n AS BIGINT) AS n_tokens, "
        "CAST((SELECT count(DISTINCT tok) FROM g WHERE gpos < n) "
        f"AS BIGINT) AS vocab FROM (SELECT unnest([{ns}]) AS n)"
    )
