"""Text-analysis kernels for the ``documents`` table (training-data
pipeline ops): token counting, quality scoring, language-ID heuristic,
rolling-hash fingerprinting.

All kernels are batch-vectorized (pandas str / numpy); the regex-based
ones are written to be mirrorable by DuckDB ``regexp_*`` functions so
the driver can hash-verify them (see ``__ray_entry__.oracle_sql``).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

TOKEN_RE = r"[A-Za-z0-9]+"
PUNCT_RE = r"[.,;:!?'\"()\[\]{}-]"

# tiny per-language stopword lists for the n-gram/stopword heuristic
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "en", "por", "que"},
}


def token_count(texts: pd.Series) -> np.ndarray:
    """Number of [A-Za-z0-9]+ tokens (DuckDB mirror:
    ``length(regexp_extract_all(text, '[A-Za-z0-9]+'))``)."""
    return texts.str.count(TOKEN_RE).fillna(0).to_numpy(dtype=np.int64)


# GPT-2-style pre-tokenizer, ASCII approximation with NO lookahead so
# RE2 (DuckDB regexp_extract_all) matches Python's re exactly:
# contractions | space?-letters | space?-digits | space?-punct-run |
# whitespace run.  Counts of these pieces approximate BPE token counts
# (each piece maps to >=1 BPE tokens; for budget estimation the piece
# count is the standard cheap proxy).
# Whitespace is the EXPLICIT ASCII class [ \t\n\r\f\v], not \s:
# Python's \s (and [^...\s]) is Unicode-aware (matches U+00A0 etc.)
# while RE2's \s is ASCII-only, so \s would make piece counts diverge
# between engine and oracle on non-ASCII whitespace (' .' is 2
# pieces under Python \s, 1 under RE2).  Both engines agree on the
# explicit class.
BPE_RE = (r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
          r"| ?[^A-Za-z0-9 \t\n\r\f\v]+|[ \t\n\r\f\v]+")


def bpe_token_count(texts: pd.Series) -> np.ndarray:
    """BPE-ish subword token estimate via the pre-tokenizer piece
    count (DuckDB-mirrorable — see :data:`BPE_RE`)."""
    return texts.str.count(BPE_RE).fillna(0).to_numpy(dtype=np.int64)


def char_count(texts: pd.Series) -> np.ndarray:
    return texts.str.len().fillna(0).to_numpy(dtype=np.int64)


def punct_count(texts: pd.Series) -> np.ndarray:
    return texts.str.count(PUNCT_RE).fillna(0).to_numpy(dtype=np.int64)


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """Length / punctuation / mean-token-length quality features.
    Ratios are plain double divisions of integer counts, so a SQL
    oracle reproduces them bit-for-bit."""
    n_chars = char_count(texts)
    n_tokens = token_count(texts)
    n_punct = punct_count(texts)
    with np.errstate(divide="ignore", invalid="ignore"):
        punct_ratio = np.where(n_chars > 0, n_punct / n_chars, 0.0)
        mean_token_len = np.where(
            n_tokens > 0,
            texts.str.count(r"[A-Za-z0-9]").fillna(0).to_numpy(np.int64) / n_tokens,
            0.0)
    return pd.DataFrame({
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_punct": n_punct,
        "punct_ratio": punct_ratio,
        "mean_token_len": mean_token_len,
    })


_WORD_RE = re.compile(r"[a-zà-ÿ']+")


def guess_lang(texts: pd.Series) -> np.ndarray:
    """Stopword-hit language heuristic; 'und' (undetermined) when no
    list scores ≥ 2 hits. Deterministic; ties broken by language code
    order.

    Vectorized: stopword membership is computed once per UNIQUE batch
    token (``pd.factorize``) into a (vocab, n_langs) matrix; per-doc
    hit counts are one ``np.add.reduceat`` — the only per-doc Python
    is the tokenizing regex."""
    texts = list(pd.Series(texts).fillna(""))
    n = len(texts)
    out = np.full(n, "und", dtype=object)
    if not n:
        return out
    flat: list = []
    offs = np.empty(n + 1, dtype=np.int64)
    offs[0] = 0
    for i, t in enumerate(texts):
        flat.extend(_WORD_RE.findall(t.lower()))
        offs[i + 1] = len(flat)
    if not flat:
        return out
    codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
    langs = sorted(_LANG_STOPWORDS)
    memb = np.stack(
        [np.fromiter((u in _LANG_STOPWORDS[lg] for u in uniq),
                     dtype=np.int64, count=len(uniq)) for lg in langs],
        axis=1)                                   # (vocab, n_langs)
    tok_m = memb[codes]                           # (tokens, n_langs)
    lens = np.diff(offs)
    ne = np.flatnonzero(lens > 0)
    hits = np.add.reduceat(tok_m, offs[ne], axis=0)   # (n_docs', n_langs)
    best = np.argmax(hits, axis=1)                # first max = lang order
    best_hits = hits[np.arange(len(ne)), best]
    lang_arr = np.array(langs, dtype=object)
    out[ne[best_hits >= 2]] = lang_arr[best[best_hits >= 2]]
    return out


_FP_K = np.uint64(1099511628211)
_FP_POW_CACHE = np.array([1], dtype=np.uint64)


def _fp_powers(n: int) -> np.ndarray:
    global _FP_POW_CACHE
    if len(_FP_POW_CACHE) < n:
        m = len(_FP_POW_CACHE)
        ext = np.empty(n, dtype=np.uint64)
        ext[:m] = _FP_POW_CACHE
        with np.errstate(over="ignore"):
            for i in range(m, n):
                ext[i] = ext[i - 1] * _FP_K  # uint64 wraps (mod 2^64)
        _FP_POW_CACHE = ext
    return _FP_POW_CACHE


def fingerprint64(texts) -> np.ndarray:
    """64-bit polynomial rolling document fingerprint over UTF-8 bytes:
    ``h = Σ (b_i + 1) * K^(n-1-i) mod 2^64``.  ONE flat-buffer pass
    over the whole batch (no per-string Python): the strings' UTF-8
    bytes are read straight from the Arrow large_string buffers
    (offsets + data), per-byte exponents come from one repeat/arange
    pass, and per-string sums are a single ``np.add.reduceat`` —
    deterministic across runs/platforms and bit-identical to the
    per-string definition.  Accepts a pandas Series or an Arrow
    (Chunked)Array (zero-copy from a pyarrow batch column).  Content
    hash for exact dedup, shard-stable sampling, doc-identity
    lineage."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        arr = pc.fill_null(texts, "").cast(pa.large_string())
    else:
        arr = pa.array(texts.fillna(""), type=pa.large_string())
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    m = len(arr)
    out = np.zeros(m, dtype=np.uint64)
    if m == 0:
        return out.view(np.int64)
    offs = np.frombuffer(arr.buffers()[1], np.int64,
                         count=m + 1, offset=8 * arr.offset)
    lens = np.diff(offs)
    total = int(offs[-1] - offs[0])
    if total == 0:
        return out.view(np.int64)
    data = np.frombuffer(arr.buffers()[2], np.uint8,
                         count=total, offset=int(offs[0]))
    starts = (offs[:-1] - offs[0]).astype(np.int64)
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    exp = np.repeat(lens - 1, lens) - pos
    pows = _fp_powers(int(lens.max()))
    with np.errstate(over="ignore"):
        terms = (data.astype(np.uint64) + np.uint64(1)) * pows[exp]
    nz = lens > 0
    out[nz] = np.add.reduceat(terms, starts[nz])
    return out.view(np.int64)


def ngram_strings(texts: pd.Series, doc_ids: np.ndarray, n: int = 5
                  ) -> pd.DataFrame:
    """Word n-gram strings per document, vectorized across the batch:
    tokens are lower-cased ``[a-z0-9]+`` runs joined with single
    spaces; n-grams never cross documents (validity mask on the
    flattened token array — no per-doc Python loop).  Returns a long
    frame (doc_id, g)."""
    toks = texts.str.lower().str.findall(r"[a-z0-9]+")
    lens = toks.str.len().to_numpy()
    total = int(lens.sum())
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                          "g": pd.Series([], dtype=str)})
    if total < n:
        return empty
    flat = np.concatenate([np.asarray(t, dtype=object)
                           for t in toks if len(t)])
    doc_idx = np.repeat(np.asarray(doc_ids)[lens > 0], lens[lens > 0])
    m = total - n + 1
    # a gram starting at i stays in-document iff token i+n-1 is in the
    # same document as token i
    valid = doc_idx[:m] == doc_idx[n - 1:]
    if not valid.any():
        return empty
    g = pd.Series(flat[:m][valid], dtype=str)
    for k in range(1, n):
        g = g.str.cat(pd.Series(flat[k:m + k][valid], dtype=str), sep=" ")
    return pd.DataFrame({"doc_id": doc_idx[:m][valid].astype(np.int64),
                         "g": g})


def benchmark_overlap_counts(batch: pd.DataFrame, bench_sorted: np.ndarray,
                             n: int = 5, text_col: str = "text",
                             id_col: str = "doc_id") -> pd.DataFrame:
    """Per-document count of DISTINCT word n-grams that appear in the
    (sorted) benchmark n-gram array — the decontamination primitive.
    Only documents with ≥ 1 hit are emitted."""
    grams = ngram_strings(batch[text_col], batch[id_col].to_numpy(), n)
    if not len(grams) or not len(bench_sorted):
        return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                             "n_hits": pd.Series([], dtype=np.int64)})
    gs = grams["g"].to_numpy().astype(str)
    pos = np.clip(np.searchsorted(bench_sorted, gs), 0,
                  len(bench_sorted) - 1)
    hit = bench_sorted[pos] == gs
    matched = grams.loc[hit].drop_duplicates()
    out = (matched.groupby("doc_id", sort=False).size()
           .reset_index(name="n_hits"))
    out["n_hits"] = out["n_hits"].astype(np.int64)
    return out.rename(columns={"doc_id": id_col})


def learn_bpe_merges(words: np.ndarray, counts: np.ndarray,
                     n_merges: int = 50) -> list[tuple[str, str]]:
    """Classic BPE merge learning from a (word, count) frequency table
    (Sennrich et al. 2016): start from characters, repeatedly merge
    the most frequent adjacent symbol pair (ties broken
    lexicographically — fully deterministic).

    This is the DRIVER-side half of distributed BPE training: real
    tokenizer trainers count words first (the corpus-sized, distributed
    step — a wordcount shuffle here) and learn merges over the
    vocabulary-bounded frequency table, which is what this function
    consumes.  Pairs never cross word boundaries."""
    from collections import Counter

    vocab = {w: (list(w), int(c)) for w, c in zip(words, counts)}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for syms, c in vocab.values():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += c
        if not pair_counts:
            break
        # deterministic: max count, then lexicographically SMALLEST pair
        top = max(pair_counts.values())
        pair = min(p for p, c in pair_counts.items() if c == top)
        merges.append(pair)
        merged = pair[0] + pair[1]
        for w, (syms, c) in vocab.items():
            i, out = 0, []
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == pair[0]
                        and syms[i + 1] == pair[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = (out, c)
    return merges


def compression_ratio(texts: pd.Series, level: int = 6) -> np.ndarray:
    """Per-document zlib compression ratio (compressed/raw bytes) as a
    redundancy/entropy proxy — the classic cheap quality signal for
    training-data filtering (highly repetitive boilerplate compresses
    far below ~0.4; high-entropy noise sits near 1.0).  Deterministic
    for a fixed level; 1.0 for empty docs.  Not SQL-expressible —
    rows-only in the driver check."""
    import zlib

    out = np.empty(len(texts), np.float64)
    for i, t in enumerate(pd.Series(texts).fillna("")):
        raw = t.encode()
        out[i] = len(zlib.compress(raw, level)) / len(raw) if raw else 1.0
    return out


def winnow_features(texts, k: int = 8, w: int = 4):
    """WINNOWING (MOSS) fingerprint features per string: byte k-gram
    rolling hashes ``h(p) = Horner_{i<k}(b_{p+i}+1) mod 2^64`` reduced
    mod 2^32, then the sum of per-window minima over every w
    consecutive k-gram hashes — the document-similarity fingerprint
    selection, pinned as two exact ints (n_kgrams, winnow_sum) so the
    window-min logic itself hash-verifies.  ONE flat-buffer pass like
    :func:`fingerprint64`: k bounded Horner steps vectorized over all
    flat positions, one stride-tricks sliding min, one cumsum — cross-
    string positions are computed but never read (validity by string
    offsets).  Returns ``(n_kgrams, winnow_sum)`` int64 arrays."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        arr = pc.fill_null(texts, "").cast(pa.large_string())
    else:
        arr = pa.array(texts.fillna(""), type=pa.large_string())
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    m = len(arr)
    n_kg = np.zeros(m, dtype=np.int64)
    wsum = np.zeros(m, dtype=np.int64)
    if m == 0:
        return n_kg, wsum
    offs = np.frombuffer(arr.buffers()[1], np.int64,
                         count=m + 1, offset=8 * arr.offset)
    lens = np.diff(offs)
    total = int(offs[-1] - offs[0])
    n_kg[:] = np.maximum(lens - k + 1, 0)
    L = total - k + 1
    if L <= 0:
        return n_kg, wsum
    data = np.frombuffer(arr.buffers()[2], np.uint8,
                         count=total, offset=int(offs[0]))
    starts = (offs[:-1] - offs[0]).astype(np.int64)
    acc = np.zeros(L, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            acc = acc * _FP_K + (data[i:i + L].astype(np.uint64)
                                 + np.uint64(1))
    h32 = (acc & np.uint64(0xFFFFFFFF)).astype(np.int64)
    W = L - w + 1
    if W <= 0:
        return n_kg, wsum
    wmin = np.lib.stride_tricks.sliding_window_view(h32, w).min(axis=1)
    csum = np.zeros(W + 1, dtype=np.int64)
    np.cumsum(wmin, out=csum[1:])
    n_win = np.maximum(lens - k - w + 2, 0)
    ok = (n_win > 0) & (starts + n_win <= W)
    s0 = starts[ok]
    wsum[ok] = csum[s0 + n_win[ok]] - csum[s0]
    return n_kg, wsum
