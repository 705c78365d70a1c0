import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from skyway_ray.functions.ann import (
    BruteForceTopK, IvfIndex, LshIndex, cosine_topk_batch,
    embeddings_to_matrix, merge_topk, _normalize,
)
from skyway_ray.functions.near_dup import (
    MinHasher, band_rows, hamming64, jaccard, minhash_lsh_dedup,
    ngram_jaccard_pairs, simhash64, _token_hashes,
)
from skyway_ray.functions.text import (
    fingerprint64, guess_lang, quality_features, token_count,
)


class TestText:
    def test_token_count(self):
        s = pd.Series(["a b  c", "", "one,two;three", None, "héllo world 42"])
        # note: "héllo" splits at the accented char under [A-Za-z0-9]+
        assert list(token_count(s)) == [3, 0, 3, 0, 4]

    def test_quality(self):
        s = pd.Series(["Hello, world!", ""])
        q = quality_features(s)
        assert q["n_punct"][0] == 2
        assert q["n_chars"][0] == 13
        assert q["punct_ratio"][1] == 0.0

    def test_guess_lang(self):
        s = pd.Series([
            "the cat and the dog sat in the garden for a while",
            "der Hund ist nicht mit der Katze und das ist gut",
            "le chat est dans la maison et les oiseaux pour que",
            "xyzzy plugh",
        ])
        assert list(guess_lang(s)) == ["en", "de", "fr", "und"]

    def test_fingerprint(self):
        s = pd.Series(["hello", "hello", "hellp", ""])
        f = fingerprint64(s)
        assert f[0] == f[1] and f[0] != f[2] and f[3] == 0
        assert (fingerprint64(s) == f).all()


class TestAnn:
    def _data(self, n=300, d=16, seed=3):
        rng = np.random.default_rng(seed)
        vecs = rng.standard_normal((n, d))
        ids = np.arange(n, dtype=np.int64)
        return vecs, ids

    def test_bruteforce_exact(self):
        vecs, ids = self._data()
        qm = _normalize(vecs[:5].copy())
        t = cosine_topk_batch(vecs, ids, qm, ids[:5], k=10)
        nv = _normalize(vecs)
        sims = qm @ nv.T
        for qi in range(5):
            got = t.filter(pa.compute.equal(t["query_id"], qi))
            want = np.lexsort((ids, -sims[qi]))[:10]
            assert got["neighbor_id"].to_pylist() == list(ids[want])
        # self is always rank 1 with cos ~1
        assert t["neighbor_id"][0].as_py() == 0

    def test_lsh_recall(self):
        vecs, ids = self._data(500, 32)
        idx = LshIndex(dim=32, bands=12, bits=6)
        idx.build(vecs, ids)
        nv = _normalize(vecs)
        hits = 0
        for qi in range(30):
            got_ids, _ = idx.query(vecs[qi], 5)
            sims = nv @ nv[qi]
            want = set(ids[np.lexsort((ids, -sims))[:5]].tolist())
            hits += len(want & set(got_ids.tolist()))
        assert hits / (30 * 5) > 0.5  # recall well above chance

    def test_ivf_recall(self):
        vecs, ids = self._data(800, 24)
        idx = IvfIndex(dim=24, n_centroids=32)
        idx.build(vecs, ids)
        nv = _normalize(vecs)
        hits = 0
        for qi in range(40):
            got_ids, _ = idx.query(vecs[qi], 5, n_probe=6)
            sims = nv @ nv[qi]
            want = set(ids[np.lexsort((ids, -sims))[:5]].tolist())
            hits += len(want & set(got_ids.tolist()))
        assert hits / (40 * 5) > 0.6
        # determinism
        a, _ = idx.query(vecs[3], 5)
        idx2 = IvfIndex(dim=24, n_centroids=32); idx2.build(vecs, ids)
        b, _ = idx2.query(vecs[3], 5)
        assert list(a) == list(b)

    def test_ray_pipeline(self, ray_session):
        import ray
        import ray.data

        vecs, ids = self._data(400, 8)
        table = pa.table({
            "vec_id": ids,
            "embedding": pa.array(vecs.astype(np.float32).tolist(),
                                  pa.list_(pa.float32())),
        })
        qm = _normalize(embeddings_to_matrix(table["embedding"])[:4].astype(np.float64))
        ref = ray.put((qm, ids[:4]))
        ds = ray.data.from_arrow(table).repartition(4)
        partials = ds.map_batches(
            BruteForceTopK, fn_constructor_kwargs=dict(queries_ref=ref, k=5),
            batch_format="pyarrow", concurrency=2)
        out = merge_topk(partials, 5).to_pandas()
        assert len(out) == 20
        r1 = out[out["rank"] == 1]
        assert set(r1["query_id"]) == set(r1["neighbor_id"])  # self first


class TestNearDup:
    def test_jaccard_and_minhash_estimate(self):
        a = _token_hashes("the quick brown fox jumps over the lazy dog")
        b = _token_hashes("the quick brown fox jumped over a lazy dog")
        j = jaccard(np.unique(a), np.unique(b))
        mh = MinHasher(256)
        sa, sb = mh.signature(a), mh.signature(b)
        est = (sa == sb).mean()
        assert abs(est - j) < 0.15

    def test_simhash_close_for_near_dups(self):
        s = pd.Series([
            "the quick brown fox jumps over the lazy dog again and again",
            "the quick brown fox jumps over the lazy dog again and again!",
            "completely different content about databases and query engines",
        ])
        h = simhash64(s)
        assert hamming64(h[0], h[1])[0] <= 8
        assert hamming64(h[0], h[2])[0] > 8

    def test_ngram_pairs(self):
        texts = pd.Series([
            "alpha beta gamma delta epsilon zeta eta theta",
            "alpha beta gamma delta epsilon zeta eta iota",
            "unrelated words entirely here now",
        ])
        t = ngram_jaccard_pairs(texts, np.array([1, 2, 3]), n=3, threshold=0.4)
        assert t.num_rows == 1
        assert (t["doc_a"][0].as_py(), t["doc_b"][0].as_py()) == (1, 2)

    def test_band_rows_shape(self):
        mh = MinHasher(64)
        sigs = mh.signatures(pd.Series(["a b c", "d e f"]))
        t = band_rows(sigs, np.array([10, 20]), bands=8)
        assert t.num_rows == 16
        assert set(t["doc_id"].to_pylist()) == {10, 20}

    def test_minhash_lsh_dedup_ray(self, ray_session):
        import ray.data

        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep green forest tonight")
        texts, ids = [], []
        for i in range(40):
            texts.append(f"document{i} " + " ".join(
                f"w{i}x{j}" for j in range(20)))
            ids.append(i)
        # plant 3 near-dups of base
        for i, extra in enumerate(["", " extra", " bonus"]):
            texts.append(base + extra)
            ids.append(100 + i)
        ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
        out = minhash_lsh_dedup(ds, threshold=0.6).to_pandas()
        kept = set(out["doc_id"])
        assert 100 in kept and 101 not in kept and 102 not in kept
        assert all(i in kept for i in range(40))


class TestIvfDistributed:
    def test_ivf_recall_clustered(self, ray_session):
        """Distributed IVF (groupby(centroid) inverted lists) on a
        clustered corpus: recall@10 >= 0.9 vs exact brute force while
        probing a minority of lists."""
        import ray.data

        from skyway_ray.functions.ann import _normalize, ivf_topk

        rng = np.random.default_rng(7)
        centers = _normalize(rng.standard_normal((20, 32)))
        vecs, ids = [], []
        for c in range(20):
            pts = centers[c] + 0.15 * rng.standard_normal((50, 32))
            vecs.append(pts)
            ids.extend(range(c * 50, c * 50 + 50))
        V = _normalize(np.concatenate(vecs))
        ids = np.asarray(ids, dtype=np.int64)
        qm = V[::100][:5]
        qids = np.arange(5, dtype=np.int64)
        tab = pa.table({
            "vec_id": ids,
            "embedding": pa.array([row.astype(np.float32) for row in V],
                                  pa.list_(pa.float32()))})
        ds = ray.data.from_arrow(tab).repartition(4)
        got = ivf_topk(ds, qm, qids, k=10, n_centroids=20,
                       n_probe=4).to_pandas()
        exact = np.argsort(-(qm @ V.T), axis=1)[:, :10]
        recalls = []
        for qi in range(5):
            want = set(ids[exact[qi]])
            have = set(got[got["query_id"] == qi]["neighbor_id"])
            recalls.append(len(want & have) / 10)
        assert np.mean(recalls) >= 0.9, recalls

    def test_ivf_slab_parity_and_auto_centroids(self, ray_session):
        """Slabbed per-list rerank emits partial top-k per slab that
        merge_topk recombines — a tiny list_slab must give exactly the
        unslabbed result; auto n_centroids keeps expected list size at
        ~sqrt(n) so one inverted list always fits a worker."""
        import ray.data

        from skyway_ray.functions.ann import (_normalize, auto_n_centroids,
                                              ivf_topk)

        assert auto_n_centroids(10) == 64
        assert auto_n_centroids(10_000) == 100
        assert auto_n_centroids(10**12) == 10**6

        rng = np.random.default_rng(11)
        V = _normalize(rng.standard_normal((300, 16)))
        tab = pa.table({
            "vec_id": np.arange(300, dtype=np.int64),
            "embedding": pa.array([r.astype(np.float32) for r in V],
                                  pa.list_(pa.float32()))})
        qm = V[:3]
        key = ["query_id", "rank"]
        a = ivf_topk(ray.data.from_arrow(tab).repartition(3), qm,
                     np.arange(3), k=5, n_centroids=4, n_probe=4,
                     list_slab=7).to_pandas()
        b = ivf_topk(ray.data.from_arrow(tab).repartition(3), qm,
                     np.arange(3), k=5, n_centroids=4,
                     n_probe=4).to_pandas()
        assert a.sort_values(key).reset_index(drop=True).equals(
            b.sort_values(key).reset_index(drop=True))
        # auto mode end-to-end (n_centroids=None) still returns k rows
        # per query
        c = ivf_topk(ray.data.from_arrow(tab).repartition(3), qm,
                     np.arange(3), k=5, n_probe=40).to_pandas()
        assert len(c) == 15

    def test_ivf_deterministic(self, ray_session):
        import ray.data

        from skyway_ray.functions.ann import _normalize, ivf_topk

        rng = np.random.default_rng(3)
        V = _normalize(rng.standard_normal((200, 16)))
        tab = pa.table({
            "vec_id": np.arange(200, dtype=np.int64),
            "embedding": pa.array([r.astype(np.float32) for r in V],
                                  pa.list_(pa.float32()))})
        qm = V[:3]
        a = ivf_topk(ray.data.from_arrow(tab).repartition(3), qm,
                     np.arange(3), k=5, n_centroids=8,
                     n_probe=6).to_pandas()
        b = ivf_topk(ray.data.from_arrow(tab).repartition(5), qm,
                     np.arange(3), k=5, n_centroids=8,
                     n_probe=6).to_pandas()
        key = ["query_id", "rank"]
        assert a.sort_values(key).reset_index(drop=True).equals(
            b.sort_values(key).reset_index(drop=True))


class TestEmbeddingLshDedup:
    def test_planted_near_dups(self, ray_session):
        """Near-identical embedding rows collapse to the min id; the
        rest survive — hyperplane banding + exact cosine verify + CC,
        all through the shared lsh_dedup_pipeline."""
        import ray.data

        from skyway_ray.functions.ann import _normalize
        from skyway_ray.functions.near_dup import embedding_lsh_dedup

        rng = np.random.default_rng(5)
        base = _normalize(rng.standard_normal((40, 24)))
        rows = [(i, base[i]) for i in range(40)]
        # plant 3 near-copies of vector 7 (tiny perturbations)
        for j, vid in enumerate((100, 101, 102)):
            rows.append((vid, _normalize(
                (base[7] + 0.01 * rng.standard_normal(24))[None, :])[0]))
        tab = pa.table({
            "vec_id": np.array([r[0] for r in rows], dtype=np.int64),
            "embedding": pa.array([r[1].astype(np.float32) for r in rows],
                                  pa.list_(pa.float32()))})
        ds = ray.data.from_arrow(tab).repartition(3)
        out = embedding_lsh_dedup(ds, threshold=0.98).to_pandas()
        kept = set(out["vec_id"])
        assert 7 in kept
        assert not {100, 101, 102} & kept
        assert all(i in kept for i in range(40) if i != 7) or 7 in kept
        # no unrelated vector lost
        assert len(kept & set(range(40))) == 40


def test_loser_filter_left_anti_path(ray_session):
    """broadcast_loser_limit=0 forces the distributed left_anti join
    loser path — survivors must be identical to the broadcast-id-set
    path on the same input."""
    import ray.data

    from skyway_ray.functions.near_dup import minhash_lsh_dedup

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight")
    texts, ids = [], []
    for i in range(30):
        texts.append(f"document{i} " + " ".join(
            f"w{i}x{j}" for j in range(20)))
        ids.append(i)
    for i, extra in enumerate(["", " extra", " bonus"]):
        texts.append(base + extra)
        ids.append(100 + i)
    tab = pa.table({"doc_id": ids, "text": texts})
    bc = sorted(minhash_lsh_dedup(
        ray.data.from_arrow(tab).repartition(3),
        threshold=0.6).to_pandas()["doc_id"])
    la = sorted(minhash_lsh_dedup(
        ray.data.from_arrow(tab).repartition(3), threshold=0.6,
        broadcast_loser_limit=0).to_pandas()["doc_id"])
    assert bc == la
    assert 100 in la and 101 not in la and 102 not in la


def test_minhash_dedup_run_to_run_deterministic(ray_session):
    """Survivor sets must not depend on scheduling: the bucket
    co-location runs through a deterministic sort and the verification
    and CC stages are order-free, so two runs (different partitioning)
    agree exactly."""
    import ray.data

    from skyway_ray.functions.near_dup import minhash_lsh_dedup

    rng = np.random.default_rng(17)
    texts, ids = [], []
    for i in range(120):
        texts.append(f"doc{i} " + " ".join(
            f"w{i % 11}x{j}" for j in range(30)))
        ids.append(i)
    tab = pa.table({"doc_id": ids, "text": texts})
    a = sorted(minhash_lsh_dedup(
        ray.data.from_arrow(tab).repartition(3),
        threshold=0.6).to_pandas()["doc_id"])
    b = sorted(minhash_lsh_dedup(
        ray.data.from_arrow(tab).repartition(7),
        threshold=0.6).to_pandas()["doc_id"])
    assert a == b


def test_bpe_ascii_ws_parity_with_re2():
    """BPE_RE uses the explicit ASCII whitespace class so Python re and
    DuckDB's RE2 count identical pieces even around non-ASCII
    whitespace (Python's \\s matches U+00A0/U+2003; RE2's does not)."""
    import duckdb

    from skyway_ray.functions.text import BPE_RE, bpe_token_count

    texts = ["a .", "x y z", "tab\there", "it's 2 words!",
             "multi  space", "  leading", ""]
    py = list(bpe_token_count(pd.Series(texts)))
    con = duckdb.connect()
    pat = BPE_RE.replace("'", "''")
    sql = [con.sql(
        "SELECT length(regexp_extract_all(?, '" + pat + "'))",
        params=[t]).fetchone()[0] for t in texts]
    assert py == sql


def test_resolve_block_scan_kernel():
    """Unit test of the sorted-block sketch->edge resolution scan:
    edges resolve to the nearest preceding same-k sketch; head edges
    whose sketch is in a previous block report unresolved; the last
    sketch index is returned as the boundary carry."""
    from skyway_ray.functions.near_dup import _resolve_block

    def tb(rows):
        k, kind, da, db, sh = zip(*rows)
        return pa.table({
            "k": pa.array(k, pa.int64()), "kind": pa.array(kind, pa.int64()),
            "doc_a": pa.array(da, pa.int64()),
            "doc_b": pa.array(db, pa.int64()),
            "sh": pa.array(sh, pa.binary())})

    # block starting mid-run (k=1 edges have no sketch here), then a
    # full run for k=2, then a sketch-only run for k=3 (the carry)
    t = tb([(1, 1, 10, 1, b""), (1, 1, 11, 1, b""),
            (2, 0, 0, 0, b"S2"), (2, 1, 12, 2, b""), (2, 1, 13, 2, b""),
            (3, 0, 0, 0, b"S3")])
    resolved, unresolved, last_sk = _resolve_block(t)
    res_e, res_g = resolved
    assert list(res_e) == [3, 4] and list(res_g) == [2, 2]
    assert list(unresolved) == [0, 1]
    assert last_sk == 5  # k=3 sketch is the boundary carry

    # block with no sketch at all: everything unresolved
    t2 = tb([(7, 1, 1, 7, b""), (7, 1, 2, 7, b"")])
    resolved2, unresolved2, last2 = _resolve_block(t2)
    assert resolved2 is None and list(unresolved2) == [0, 1] and last2 == -1

def test_fingerprint_sql_parity_nonascii():
    """The HUGEINT Horner-fold oracle (queries.q_fingerprint_sql)
    reproduces fingerprint64 bit-for-bit on multi-byte UTF-8, quotes,
    and the empty string — the driver corpus is all-ASCII, so pin the
    hard cases here."""
    import duckdb

    from skyway_ray.functions.text import fingerprint64
    from skyway_ray.queries import q_fingerprint_sql

    texts = ["", "a", "héllo wörld", "naïve — em-dash", "日本語テキスト",
             "it's \"quoted\"", " nbsp ", "x" * 600]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    py = list(fingerprint64(df["text"]))
    con = duckdb.connect()
    con.register("documents", df)
    want = con.sql(q_fingerprint_sql()).df().sort_values(
        "doc_id")["fp64"].tolist()
    assert py == want


def test_langid_sql_parity_multilingual():
    """The stopword-argmax oracle (queries.q_langid_sql) agrees with
    guess_lang on multilingual text, accented tokens, ties (broken by
    language-code order), and the und threshold."""
    import duckdb

    from skyway_ray.functions.text import guess_lang
    from skyway_ray.queries import q_langid_sql

    texts = [
        "the cat and the dog",                    # en
        "der Hund ist nicht da und die Katze",    # de (+ 'und' is a de word)
        "le chat est dans la maison et il dort",  # fr
        "el perro es un animal y la casa",        # es
        "the der",                                # 1 hit each -> und
        "the and der die",                        # 2-2 tie -> de (code order)
        "où ça français déjà",                    # accented, no stopwords -> und
        "",                                       # empty -> und
        "LA LE ET EST",                           # uppercase fr
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    py = list(guess_lang(df["text"]))
    con = duckdb.connect()
    con.register("documents", df)
    want = con.sql(q_langid_sql()).df().sort_values(
        "doc_id")["lang_guess"].tolist()
    assert py == want


def test_ivf_full_probe_equals_brute_force(ray_session):
    """ivf_topk at n_probe == n_centroids scores every vector exactly
    once, so (query_id, neighbor_id, rank) equals the brute-force
    baseline under the shared quantized ranking — the basis of the
    hash-verified ivf_exact driver row."""
    import ray.data

    from skyway_ray.functions.ann import (
        BruteForceTopK, _normalize, ivf_topk, merge_topk)

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    ids = np.arange(300, dtype=np.int64)
    tab = pa.table({"vec_id": ids,
                    "embedding": pa.array(list(vecs), pa.list_(pa.float32()))})
    qm = _normalize(vecs[:4].astype(np.float64))
    qids = ids[:4]
    ds = ray.data.from_arrow(tab).repartition(4)
    ivf = ivf_topk(ds, qm, qids, k=7, n_centroids=8, n_probe=8).to_pandas()
    bf_partials = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs=dict(query_matrix=qm, query_ids=qids, k=7),
        batch_format="pyarrow", concurrency=2)
    bf = merge_topk(bf_partials, 7).to_pandas()
    key = ["query_id", "rank"]
    a = ivf.sort_values(key).reset_index(drop=True)
    b = bf.sort_values(key).reset_index(drop=True)
    assert a[["query_id", "neighbor_id", "rank"]].equals(
        b[["query_id", "neighbor_id", "rank"]])


class TestPhashDedup:
    def _img(self, rng, h=32, w=32):
        return rng.integers(20, 200, (h, w, 3)).astype(np.uint8)

    def test_kernels_deterministic_and_brightness_invariant(self):
        from skyway_ray.functions.phash import ahash64, dhash64, to_gray

        rng = np.random.default_rng(6)
        img = self._img(rng)
        assert ahash64(img) == ahash64(img.copy())
        assert dhash64(img) == dhash64(img.copy())
        # adding a constant to every pixel preserves > comparisons on
        # both the mean (aHash) and the gradient (dHash)
        shifted = (img.astype(np.int64) + 30).astype(np.uint8)
        assert ahash64(shifted) == ahash64(img)
        assert dhash64(shifted) == dhash64(img)
        other = self._img(np.random.default_rng(7))
        from skyway_ray.functions.near_dup import hamming64
        d = hamming64(np.array([dhash64(img)]), np.array([dhash64(other)]))
        assert d[0] > 10
        assert to_gray(img).shape == (32, 32)

    def test_banded_near_dup_clusters(self, ray_session):
        """Synthetic hashes with known Hamming structure: clusters
        collapse to min-id survivors, distant singletons survive."""
        import ray.data

        from skyway_ray.functions.phash import phash_near_dup

        base_a = np.int64(0x123456789ABCDEF0)
        base_b = np.int64(-0x7edcba0987654322)
        def flip(h, *bits):
            u = np.uint64(h)
            for b in bits:
                u ^= np.uint64(1) << np.uint64(b)
            return np.int64(u.astype(np.uint64).view(np.int64))
        hashes = [
            (0, base_a), (1, flip(base_a, 5)), (2, flip(base_a, 5, 40)),
            (10, base_b), (11, flip(base_b, 0, 1)),
            (20, np.int64(0x5555555555555555)),
            (21, np.int64(0x0F0F0F0F0F0F0F0F)),
        ]
        tab = pa.table({
            "image_id": pa.array([i for i, _ in hashes], pa.int64()),
            "dhash64": pa.array([h for _, h in hashes], pa.int64()),
        })
        got = phash_near_dup(
            ray.data.from_arrow(tab).repartition(3), max_dist=3)
        ids = sorted(got.to_pandas()["image_id"])
        assert ids == [0, 10, 20, 21]

    def test_identical_images_end_to_end(self, ray_session):
        import ray.data

        from skyway_ray.functions.image_codec import encode_png
        from skyway_ray.functions.phash import phash_near_dup
        from skyway_ray.stages.multimodal import PerceptualHash

        rng = np.random.default_rng(12)
        a = encode_png(self._img(rng))
        b = encode_png(self._img(rng))
        c = encode_png(self._img(rng))
        tab = pa.table({
            "image_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "bytes": pa.array([a, a, b, b, c], pa.binary()),
            "fmt": pa.array(["png"] * 5),
        })
        hashes = ray.data.from_arrow(tab).map_batches(
            PerceptualHash, batch_format="pyarrow", batch_size=2,
            concurrency=2)
        got = phash_near_dup(hashes, max_dist=3)
        ids = sorted(got.to_pandas()["image_id"])
        assert ids == [0, 2, 4]

    def test_star_contraction_large_identical_run(self, ray_session):
        """Exercises the chain scan's star-contraction branch at run
        length ≫ 2 plus the cross-run verified edge: 300 ids share one
        hash, 3 more sit at Hamming distance 1 (cross-run), and two
        far singletons survive untouched.  Survivor set must equal the
        brute-force expectation regardless of the contraction."""
        import ray.data

        from skyway_ray.functions.phash import phash_near_dup

        base = np.int64(0x0123456789ABCDEF)
        near = np.int64(base ^ np.int64(1) << np.int64(17))
        n_run = 300
        ids = list(range(n_run)) + [1000, 1001, 1002, 5000, 5001]
        hashes = ([base] * n_run + [near] * 3
                  + [np.int64(0x5555555555555555),
                     np.int64(-0x0F0F0F0F0F0F0F10)])
        tab = pa.table({
            "image_id": pa.array(ids, pa.int64()),
            "dhash64": pa.array(hashes, pa.int64()),
        })
        got = phash_near_dup(
            ray.data.from_arrow(tab).repartition(4), max_dist=3)
        assert sorted(got.to_pandas()["image_id"]) == [0, 5000, 5001]

    def test_contracted_groups_merge_across_hashes(self, ray_session):
        """Two exact-dup groups at Hamming distance 1 must fuse into
        ONE cluster whose survivor is the global min id — which lives
        in the SECOND group, so the contraction's per-hash
        representative (min id of its own run) must be overridden by
        the CC min across the cross-hash edge."""
        import ray.data

        from skyway_ray.functions.phash import phash_near_dup

        h1 = np.int64(0x0123456789ABCDEF)
        h2 = np.int64(h1 ^ np.int64(1) << np.int64(33))
        tab = pa.table({
            "image_id": pa.array([10, 11, 12, 13, 14, 0, 1, 2],
                                 pa.int64()),
            "dhash64": pa.array([h1] * 5 + [h2] * 3, pa.int64()),
        })
        got = phash_near_dup(
            ray.data.from_arrow(tab).repartition(3), max_dist=3)
        assert sorted(got.to_pandas()["image_id"]) == [0]


class TestPqAnn:
    @staticmethod
    def _clustered(seed=7, n_centers=20, per=50, dim=32):
        from skyway_ray.functions.ann import _normalize

        rng = np.random.default_rng(seed)
        centers = _normalize(rng.standard_normal((n_centers, dim)))
        vecs, ids = [], []
        for c in range(n_centers):
            pts = centers[c] + 0.15 * rng.standard_normal((per, dim))
            vecs.append(pts)
            ids.extend(range(c * per, c * per + per))
        V = _normalize(np.concatenate(vecs))
        return V, np.asarray(ids, dtype=np.int64)

    @staticmethod
    def _ds(V, ids, parts):
        import ray.data

        tab = pa.table({
            "vec_id": ids,
            "embedding": pa.array([r.astype(np.float32) for r in V],
                                  pa.list_(pa.float32()))})
        return ray.data.from_arrow(tab).repartition(parts)

    def test_pq_recall_clustered(self, ray_session):
        """PQ ADC scan + exact rerank on a clustered corpus: the
        candidate pool from 8-byte codes recovers >= 0.9 of the exact
        top-10."""
        from skyway_ray.functions.ann import pq_topk

        V, ids = self._clustered()
        qm = V[::100][:5]
        qids = np.arange(5, dtype=np.int64)
        got = pq_topk(self._ds(V, ids, 4), qm, qids, k=10, m=8,
                      n_codes=16, rerank=5)
        exact = np.argsort(-(qm @ V.T), axis=1)[:, :10]
        recalls = []
        for qi in range(5):
            want = set(ids[exact[qi]])
            have = set(got[got["query_id"] == qi]["neighbor_id"])
            recalls.append(len(want & have) / 10)
        assert np.mean(recalls) >= 0.9, recalls

    def test_pq_partition_invariant(self, ray_session):
        from skyway_ray.functions.ann import pq_topk

        V, ids = self._clustered(seed=11, n_centers=8, per=40, dim=16)
        qm = V[:3]
        qids = np.arange(3, dtype=np.int64)
        key = ["query_id", "ann_rank"]
        outs = [pq_topk(self._ds(V, ids, p), qm, qids, k=5, m=4,
                        n_codes=8, rerank=6)
                .sort_values(key).reset_index(drop=True)
                for p in (2, 7)]
        assert outs[0].equals(outs[1])

    def test_pq_codes_roundtrip_compression(self):
        """Codes are m bytes/vector and decode against the codebooks to
        within sub-quantizer error."""
        from skyway_ray.functions.ann import (_normalize, pq_encode,
                                              pq_train)

        rng = np.random.default_rng(5)
        V = _normalize(rng.standard_normal((500, 32)))
        books = pq_train(V, m=8, n_codes=16)
        codes = pq_encode(V, books)
        assert codes.shape == (500, 8) and codes.dtype == np.uint8
        recon = np.concatenate(
            [books[s][codes[:, s]] for s in range(8)], axis=1)
        err = np.linalg.norm(V - recon, axis=1).mean()
        raw = np.linalg.norm(V, axis=1).mean()
        assert err < 0.8 * raw  # 32x smaller, bounded distortion


class TestNgramsDecontam:
    def test_ngram_strings_mask(self):
        from skyway_ray.functions.text import ngram_strings

        g = ngram_strings(pd.Series(["a b c d e f", "x y", "p q r s t"]),
                          np.array([1, 2, 3]), n=5)
        assert g.to_dict("records") == [
            {"doc_id": 1, "g": "a b c d e"},
            {"doc_id": 1, "g": "b c d e f"},
            {"doc_id": 3, "g": "p q r s t"},
        ]
        assert len(ngram_strings(pd.Series(["a b"]), np.array([1]), 5)) == 0

    def test_overlap_counts_matches_python(self):
        from skyway_ray.functions.text import (benchmark_overlap_counts,
                                               ngram_strings)

        rng = np.random.default_rng(2)
        vocab = [f"w{i}" for i in range(30)]
        texts = [" ".join(rng.choice(vocab, rng.integers(3, 40)))
                 for _ in range(200)]
        df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                           "text": texts})
        bench_grams = np.unique(ngram_strings(
            df["text"][:5], df["doc_id"].to_numpy()[:5], 3)["g"]
            .to_numpy().astype(str))
        got = benchmark_overlap_counts(df, bench_grams, n=3)
        # python oracle
        want = {}
        bset = set(bench_grams)
        for did, text in zip(df["doc_id"], df["text"]):
            toks = text.split()
            grams = {" ".join(toks[i:i + 3])
                     for i in range(len(toks) - 2)}
            hits = len(grams & bset)
            if hits:
                want[did] = hits
        assert dict(zip(got["doc_id"], got["n_hits"])) == want


class TestBpeMerges:
    def test_matches_reference_bpe(self, ray_session):
        """Distributed wordcount + driver merge loop equals a plain
        single-process reference BPE over the same corpus."""
        import __ray_entry__

        got = __ray_entry__.queries()["bpe_merges"](
            "/root/testdata/sf0.001")

        # reference implementation straight off the corpus
        import re
        from collections import Counter

        import pyarrow.parquet as pq

        texts = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                              columns=["text"])["text"].to_pylist()
        wc = Counter()
        for t in texts:
            wc.update(re.findall(r"[a-z0-9]+", t.lower()))
        vocab = {w: list(w) for w in wc}
        merges = []
        for _ in range(40):
            pc_ = Counter()
            for w, syms in vocab.items():
                for a, b in zip(syms, syms[1:]):
                    pc_[(a, b)] += wc[w]
            if not pc_:
                break
            top = max(pc_.values())
            pair = min(p for p, c in pc_.items() if c == top)
            merges.append(pair)
            m = pair[0] + pair[1]
            for w, syms in vocab.items():
                i, out = 0, []
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == pair[0]
                            and syms[i + 1] == pair[1]):
                        out.append(m)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                vocab[w] = out
        assert list(zip(got["left"], got["right"])) == merges
        assert list(got["rank"]) == list(range(len(merges)))

    def test_sennrich_example(self):
        from skyway_ray.functions.text import learn_bpe_merges

        m = learn_bpe_merges(np.array(["low", "lower", "newest", "widest"]),
                             np.array([5, 2, 6, 3]), 4)
        assert m[:2] == [("e", "s"), ("es", "t")]


def test_setsim_join_partition_invariant_and_exact(ray_session):
    """The prefix-filtered set-similarity join is EXACT: planted
    word-overlap pairs at known Jaccard appear iff J >= tau, and the
    pair set is identical across input partitionings (run-boundary
    rescue covers straddling token runs)."""
    import ray.data

    from skyway_ray.functions.setsim import setsim_join

    # doc i and doc i+100 share 8 of 10 words -> J = 8/12 = 0.667
    # doc i and doc i+200 share 5 of 10 words -> J = 5/15 = 0.333
    texts, ids = [], []
    for i in range(40):
        base = [f"w{i}common{j}" for j in range(10)]
        texts.append(" ".join(base)); ids.append(i)
        texts.append(" ".join(base[:8] + [f"a{i}x", f"a{i}y"]))
        ids.append(i + 100)
        texts.append(" ".join(base[:5] + [f"b{i}{j}" for j in range(5)]))
        ids.append(i + 200)
    tab = pa.table({"doc_id": ids, "text": texts})

    def pairs(nparts, **kw):
        df = setsim_join(ray.data.from_arrow(tab).repartition(nparts),
                         tau=0.5, **kw).to_pandas()
        return sorted(zip(df.doc_a, df.doc_b))

    p3 = pairs(3)
    assert p3 == pairs(9)
    assert all((i, i + 100) in p3 for i in range(40))
    assert not any((i, i + 200) in p3 for i in range(40))
    # the rarest-first prefix order and the co-partition (non-broadcast)
    # verify path both produce the identical pair set
    assert p3 == pairs(5, freq_order=True)
    assert p3 == pairs(5, broadcast_sketch_limit=0)


def test_distinct_pairs_exact_under_hostile_partitioning(ray_session):
    """The sort-based pair DISTINCT emits every distinct pair exactly
    once even when a value's run spans several blocks (whole blocks of
    one repeated pair) or a block holds a single value."""
    import ray.data

    from skyway_ray.functions.setsim import distinct_pairs

    rng = np.random.default_rng(5)
    # heavy duplication: few distinct pairs, many copies
    da = rng.integers(0, 12, 5000).astype(np.int64)
    db = rng.integers(0, 12, 5000).astype(np.int64) + 100
    tab = pa.table({"doc_a": da, "doc_b": db})
    want = sorted(set(zip(da, db)))
    for nparts in (1, 3, 17):
        df = distinct_pairs(
            ray.data.from_arrow(tab).repartition(nparts)).to_pandas()
        got = sorted(zip(df.doc_a, df.doc_b))
        assert got == want, nparts


def test_compression_ratio_signal():
    """Repetitive text compresses far below high-entropy text; the
    ratio is deterministic and 1.0 for empty docs."""
    import numpy.random as npr

    from skyway_ray.functions.text import compression_ratio

    rng = np.random.default_rng(2)
    noise = "".join(chr(rng.integers(33, 126)) for _ in range(2000))
    s = pd.Series(["spam " * 400, noise, ""])
    r = compression_ratio(s)
    assert r[0] < 0.05 < 0.5 < r[1] <= 1.1
    assert r[2] == 1.0
    assert (compression_ratio(s) == r).all()


class TestHashShufflePaths:
    """shuffle="hash" (coarse hash-bucket co-partition, no boundary
    stitch/rescue) must equal shuffle="sort" result-for-result."""

    def _corpus(self, n=220, seed=5):
        rng = np.random.default_rng(seed)
        vocab = [f"tok{i}" for i in range(400)]
        texts, ids = [], []
        for i in range(n):
            texts.append(" ".join(rng.choice(vocab, 25)))
            ids.append(i)
        # planted exact dups + near-dups (suffix noise)
        for j in range(30):
            texts.append(texts[j])
            ids.append(1000 + j)
        for j in range(20):
            texts.append(texts[j] + " zz" + str(j))
            ids.append(2000 + j)
        return ids, texts

    def test_minhash_dedup_parity(self, ray_session):
        import ray.data

        from skyway_ray.functions.near_dup import minhash_lsh_dedup

        ids, texts = self._corpus()
        tab = pa.table({"doc_id": pa.array(ids, pa.int64()),
                        "text": texts})

        def run(shuffle):
            ds = ray.data.from_arrow(tab).repartition(7)
            out = minhash_lsh_dedup(ds, threshold=0.7,
                                    shuffle=shuffle).to_pandas()
            return sorted(out["doc_id"])

        srt, hsh = run("sort"), run("hash")
        assert srt == hsh
        assert len(srt) < len(ids)  # some dups actually removed

    def test_minhash_dedup_parity_tiny_buckets(self, ray_session):
        """Force many hash buckets (rows_per_bucket=1-ish via a
        monkeypatched budget) — parity must hold under any bucket
        count."""
        import ray.data

        import skyway_ray.functions.near_dup as nd
        from skyway_ray.stages import scan as scan_mod

        ids, texts = self._corpus(n=80, seed=9)
        tab = pa.table({"doc_id": pa.array(ids, pa.int64()),
                        "text": texts})

        def run(shuffle):
            ds = ray.data.from_arrow(tab).repartition(5)
            return sorted(nd.minhash_lsh_dedup(
                ds, threshold=0.7, shuffle=shuffle).to_pandas()["doc_id"])

        want = run("sort")
        orig = scan_mod.ROWS_PER_BUCKET
        try:
            scan_mod.ROWS_PER_BUCKET = 37
            got = run("hash")
        finally:
            scan_mod.ROWS_PER_BUCKET = orig
        assert got == want

    def test_setsim_parity_broadcast_and_copart(self, ray_session):
        import ray.data

        from skyway_ray.functions.setsim import setsim_join

        ids, texts = self._corpus(n=150, seed=11)
        tab = pa.table({"doc_id": pa.array(ids, pa.int64()),
                        "text": texts})

        def run(shuffle, limit):
            ds = ray.data.from_arrow(tab).repartition(6)
            out = setsim_join(ds, tau=0.8, ngram_words=3,
                              broadcast_sketch_limit=limit,
                              shuffle=shuffle).to_pandas()
            return sorted(zip(out.doc_a, out.doc_b, out.jac_micro))

        want = run("sort", 1_000_000)
        assert want  # planted pairs exist
        assert run("hash", 1_000_000) == want          # broadcast verify
        assert run("hash", 0) == want                   # copart verify
        assert run("sort", 0) == want                   # sanity

    def test_distinct_pairs_hash_parity(self, ray_session):
        import ray.data

        from skyway_ray.functions.setsim import distinct_pairs

        rng = np.random.default_rng(3)
        da = rng.integers(0, 50, 4000).astype(np.int64)
        db = rng.integers(0, 50, 4000).astype(np.int64) + 100
        tab = pa.table({"doc_a": da, "doc_b": db})
        want = sorted(set(zip(da, db)))
        for nparts in (1, 6):
            df = distinct_pairs(
                ray.data.from_arrow(tab).repartition(nparts),
                shuffle="hash").to_pandas()
            assert sorted(zip(df.doc_a, df.doc_b)) == want, nparts
