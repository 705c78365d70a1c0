"""Near-duplicate detection kernels: MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Ray Data shape (the mergeable-sketch pattern): a ``map_batches`` stage
computes per-doc signatures vectorized; band rows explode to
``(band_id, band_hash, doc_id)``; a ``groupby(["band_id","band_hash"])``
co-locates candidates; verification (exact Jaccard / Hamming / cosine)
runs per group; winners resolve with min-doc-id label propagation.
Everything is seeded/deterministic.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD_RE = re.compile(r"[A-Za-z0-9]+")
_MERSENNE = (1 << 61) - 1


def _token_hashes(text: str) -> np.ndarray:
    """Distinct word-shingle hashes (crc32 — C speed, deterministic)."""
    toks = {t.lower() for t in _WORD_RE.findall(text or "")}
    if not toks:
        return np.empty(0, dtype=np.uint64)
    return np.fromiter((zlib.crc32(t.encode()) for t in toks),
                       dtype=np.uint64, count=len(toks))


def _ngram_hashes(text: str, n: int = 3) -> np.ndarray:
    """Distinct word n-gram hashes."""
    toks = [t.lower() for t in _WORD_RE.findall(text or "")]
    if len(toks) < n:
        grams = {" ".join(toks)} if toks else set()
    else:
        grams = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    if not grams:
        return np.empty(0, dtype=np.uint64)
    return np.fromiter((zlib.crc32(g.encode()) for g in grams),
                       dtype=np.uint64, count=len(grams))


class MinHasher:
    """128-perm MinHash via universal hashing
    ``h_i(x) = (a_i * x + b_i) mod p`` (p = 2^61-1), seeded."""

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, token_hashes: np.ndarray) -> np.ndarray:
        if len(token_hashes) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (t, p) universal hashes; object dtype avoids uint64 overflow of a*x
        x = token_hashes.astype(object)[:, None]
        h = (x * self.a.astype(object) + self.b.astype(object)) % _MERSENNE
        return np.min(np.asarray(h, dtype=np.uint64), axis=0)

    def signatures(self, texts: pd.Series, shingler=_token_hashes) -> np.ndarray:
        return np.stack([self.signature(shingler(t)) for t in texts.fillna("")])


def band_rows(signatures: np.ndarray, doc_ids: np.ndarray,
              bands: int = 16) -> pa.Table:
    """(n, num_perm) signatures → exploded (band_id, band_hash, doc_id)
    rows for the LSH groupby."""
    n, num_perm = signatures.shape
    rows_per_band = num_perm // bands
    out_band, out_hash, out_doc = [], [], []
    for b in range(bands):
        seg = signatures[:, b * rows_per_band:(b + 1) * rows_per_band]
        # stable 64-bit band hash of the segment bytes, vectorized-ish
        hashes = np.fromiter(
            (zlib.crc32(seg[i].tobytes()) for i in range(n)),
            dtype=np.int64, count=n)
        out_band.append(np.full(n, b, dtype=np.int64))
        out_hash.append(hashes)
        out_doc.append(doc_ids)
    return pa.table({
        "band_id": np.concatenate(out_band),
        "band_hash": np.concatenate(out_hash),
        "doc_id": np.concatenate(out_doc),
    })


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def simhash64(texts: pd.Series, seed: int = 42) -> np.ndarray:
    """64-bit SimHash over word shingles: sign of the per-bit weighted
    sum of shingle hashes (two independent crc32 halves per token)."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts.fillna("")):
        toks = _WORD_RE.findall(t.lower())
        if not toks:
            out[i] = 0
            continue
        h64 = np.fromiter(
            ((zlib.crc32(tok.encode()) << 32)
             | zlib.crc32(tok.encode(), 0xA5A5A5A5) for tok in toks),
            dtype=np.uint64, count=len(toks))
        bits = ((h64[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
        counts = bits.sum(axis=0)
        vote = counts * 2 - len(toks)
        out[i] = np.uint64(
            int("".join("1" if v > 0 else "0" for v in vote[::-1]), 2))
    return out.view(np.int64)


def hamming64(a, b) -> np.ndarray:
    x = (np.asarray(a).view(np.uint64) ^ np.asarray(b).view(np.uint64))
    return np.array([bin(int(v)).count("1") for v in np.atleast_1d(x)],
                    dtype=np.int64)


def ngram_jaccard_pairs(texts: pd.Series, doc_ids: np.ndarray, n: int = 3,
                        threshold: float = 0.8) -> pa.Table:
    """All-pairs n-gram Jaccard ≥ threshold within one group/batch —
    the verification step after LSH bucketing (never run globally)."""
    hs = [_ngram_hashes(t, n) for t in texts.fillna("")]
    hs = [np.unique(h) for h in hs]
    a_out, b_out, sim_out = [], [], []
    for i in range(len(hs)):
        for j in range(i + 1, len(hs)):
            s = jaccard(hs[i], hs[j])
            if s >= threshold:
                a_out.append(doc_ids[i])
                b_out.append(doc_ids[j])
                sim_out.append(s)
    return pa.table({
        "doc_a": pa.array(a_out, pa.int64()),
        "doc_b": pa.array(b_out, pa.int64()),
        "jaccard": pa.array(sim_out, pa.float64()),
    })


def embedding_near_dup_pairs(vecs: np.ndarray, ids: np.ndarray,
                             threshold: float = 0.95) -> pa.Table:
    """Embedding-cosine near-dup pairs within one bucket/batch (run
    after LSH bucketing at scale; exact within the group)."""
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    nv = vecs / norms
    sims = nv @ nv.T
    iu = np.triu_indices(len(ids), k=1)
    mask = sims[iu] >= threshold
    return pa.table({
        "doc_a": pa.array(np.asarray(ids)[iu[0][mask]], pa.int64()),
        "doc_b": pa.array(np.asarray(ids)[iu[1][mask]], pa.int64()),
        "cos": pa.array(sims[iu][mask], pa.float64()),
    })


# ---------------- Ray Data pipelines ----------------


def minhash_lsh_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 128, bands: int = 16,
                      threshold: float = 0.7, shingle: str = "ngram",
                      ngram_n: int = 3):
    """MinHash+LSH near-dedup: returns the Dataset of surviving rows
    (duplicate clusters keep their min-id representative).

    ``shingle``: "ngram" (default; word n-grams — discriminative even
    over tiny vocabularies) or "token" (word-set Jaccard).

    Stages: signature (stateful actor: hasher built once) → band
    explode → groupby bucket → verified pairs → winner set broadcast →
    filter.  The candidate-pair set is tiny at realistic dup rates, so
    the union-find runs on the driver (documented assumption; swap to
    min-label propagation for adversarial inputs)."""
    if shingle == "ngram":
        def shingler(t):
            return _ngram_hashes(t, ngram_n)
    else:
        shingler = _token_hashes

    class Signer:
        def __init__(self):
            self.mh = MinHasher(num_perm=num_perm)

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = pd.Series(batch[text_col].to_pylist())
            sigs = self.mh.signatures(texts, shingler=shingler)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            return band_rows(sigs, ids, bands=bands)

    banded = ds.map_batches(Signer, batch_format="pyarrow", concurrency=2)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique().tolist())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        rep = ids[0]
        return pd.DataFrame({"doc_a": [rep] * (len(ids) - 1), "doc_b": ids[1:]})

    pairs = (banded.groupby(["band_id", "band_hash"])
             .map_groups(bucket_pairs, batch_format="pandas")).to_pandas()

    # driver-side union-find over candidate pairs (small by construction)
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    # verify candidate pairs with exact Jaccard before merging clusters
    texts_by_id = None
    if len(pairs):
        cand_ids = set(pairs["doc_a"]) | set(pairs["doc_b"])
        small = ds.map_batches(
            lambda b: b.filter(
                pa.compute.is_in(b[id_col], pa.array(list(cand_ids)))),
            batch_format="pyarrow").to_pandas()
        texts_by_id = dict(zip(small[id_col], small[text_col]))
        for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
            ja = jaccard(np.unique(shingler(texts_by_id[a])),
                         np.unique(shingler(texts_by_id[b])))
            if ja >= threshold:
                union(int(a), int(b))

    losers = {x for x in parent if find(x) != x}

    def drop_losers(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keep = ~np.isin(ids, np.fromiter(losers, dtype=ids.dtype, count=len(losers))) \
            if losers else np.ones(len(ids), dtype=bool)
        return batch.filter(pa.array(keep))

    return ds.map_batches(drop_losers, batch_format="pyarrow")
