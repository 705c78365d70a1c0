"""Exact deduplication (hash-partition + per-group first).

``groupby(key)`` hash-partitions rows so all duplicates co-locate, then
``map_groups`` keeps the winner — the row with the minimum ``order_col``
(deterministic across runs and parallelism levels).  The 2% controlled
duplicate rate in the fixtures (FIXTURES.md §1) exercises this.

Scale note: ``exact_dedup`` shuffles whole rows; for wide rows
(multi-MB image bytes) use ``exact_dedup_projected`` — the shuffle
carries only (key, order_col), and the winner set is broadcast ONCE via
``ray.put`` into an actor pool (a closure-captured Python set would be
re-pickled into every task)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def exact_dedup(ds, key: str = "phash", order_col: str = "image_id"):
    """Keep exactly one row (min ``order_col``) per ``key`` value."""

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return group.nsmallest(1, order_col) if group[order_col].dtype.kind in "iuf" \
            else group.sort_values(order_col, kind="mergesort").head(1)

    return ds.groupby(key).map_groups(first, batch_format="pandas")


# per-worker-process cache for the broadcast winner array (stateless
# tasks — an actor pool sized near the CPU count can starve the
# upstream read in small sessions)
_WINNER_CACHE: dict = {}


def _make_winner_filter(winners_ref, order_col: str, key_col: str | None = None):
    """Keep rows whose ``order_col`` equals their key's winner.

    With ``key_col`` (numeric keys), the broadcast payload is (sorted
    keys, aligned winner values): the lookup is one C ``searchsorted``
    on int64 plus one Arrow string/scalar equality — no Python-object
    comparisons.  Without it (legacy), the payload is the sorted winner
    id array and membership decides (string ids pay object-dtype
    searchsorted — avoid for large sets)."""

    def winner_filter(batch: pa.Table) -> pa.Table:
        ck = str(winners_ref)
        payload = _WINNER_CACHE.get(ck)
        if payload is None:
            import ray

            payload = ray.get(winners_ref)
            if key_col is None:
                payload = np.sort(np.asarray(payload))
            _WINNER_CACHE.clear()
            _WINNER_CACHE[ck] = payload
        if key_col is not None:
            keys_sorted, winner_vals = payload
            kv = batch[key_col].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(keys_sorted, kv), 0,
                          max(len(keys_sorted) - 1, 0))
            hit = keys_sorted[pos] == kv if len(keys_sorted) else \
                np.zeros(len(kv), dtype=bool)
            winner = pa.array(winner_vals[pos])
            eq = pa.compute.equal(
                batch[order_col],
                winner.cast(batch.schema.field(order_col).type))
            keep = (np.asarray(eq.to_numpy(zero_copy_only=False), dtype=bool)
                    & hit)
            return batch.filter(pa.array(keep))
        winners = payload
        is_str = winners.dtype.kind in "OU"
        vals = np.asarray(batch[order_col].to_pylist()) if is_str \
            else batch[order_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(winners, vals)
        pos = np.clip(pos, 0, len(winners) - 1)
        keep = winners[pos] == vals
        return batch.filter(pa.array(keep))

    return winner_filter


def _key_hash64(col) -> np.ndarray:
    """Key column → uint64 hashes for the Bloom filter (strings via
    crc32 pair; ints pass through).  Collisions only add Bloom false
    positives, which the exact-confirm join removes."""
    import zlib

    if pa.types.is_integer(col.type):
        return col.to_numpy(zero_copy_only=False).astype(np.uint64)
    out = np.fromiter(
        ((zlib.crc32(s.encode()) << 32) | zlib.crc32(s.encode(), 0xA5A5A5A5)
         for s in col.to_pylist()), dtype=np.uint64, count=len(col))
    return out


def exact_dedup_bloom(ds, key: str = "phash", order_col: str = "image_id",
                      num_partitions: int = 8, bits_per_key: int = 10,
                      n_rows: int | None = None):
    """Unbounded-key-space exact dedup — the fallback named by
    ``exact_dedup_projected`` for when the winner set cannot be
    broadcast (winners ≈ distinct keys ≈ corpus size).

    The trick is to size everything by the DUPLICATE rate, not the key
    count: (1) the projected (key, order) groupby emits only keys with
    count > 1 — small; (2) a Bloom filter of those dup keys (built
    streaming, fixed driver memory) splits the corpus into bloom-clean
    rows (definitely unique-keyed → kept as-is) and a small flagged
    subset; (3) the flagged subset dedups DIRECTLY — a Bloom filter has
    no false negatives, so every row of a duplicated key is flagged and
    min-per-key over the flagged rows is exact (false-positive keys
    have one row, which min-per-key keeps).  The per-key winner runs
    vectorized inside coarse hash buckets (one sort + drop_duplicates
    per bucket, no per-key Python, no Acero join — Ray's hash-shuffle
    join intermittently drops the schema of mostly-empty small sides).
    No unbounded driver state, no broadcast proportional to distinct
    keys."""
    import ray

    from ..functions.bloom import BloomFilter
    from .scan import hash_bucket_scan

    projected = ds.select_columns([key, order_col])

    # dup-key discovery: batch-local count combiner (shuffle carries
    # per-batch (key, n) partials, not rows) → ONE coarse hash
    # exchange → per-bucket sum, keep keys with total > 1
    def local_counts(b: pa.Table) -> pa.Table:
        g = b.select([key]).group_by([key]).aggregate([(key, "count")])
        return g.rename_columns([key, "_n"])

    def bucket_dups(t: pa.Table) -> pa.Table:
        g = t.group_by([key]).aggregate([("_n", "sum")])
        g = g.rename_columns([key, "_n"])
        return g.filter(pa.compute.greater(g["_n"], 1)).select([key])

    dup_keys = hash_bucket_scan(
        projected.map_batches(local_counts, batch_format="pyarrow"),
        [key], bucket_dups, n_rows=n_rows).materialize()
    if dup_keys.count() == 0:
        return ds
    bf = BloomFilter(dup_keys.count(), bits_per_key=bits_per_key)
    for b in dup_keys.iter_batches(batch_format="pyarrow"):
        bf.add(_key_hash64(b[key]))
    bf_ref = ray.put(bf)

    def split(flagged: bool):
        def f(batch: pa.Table) -> pa.Table:
            blm = _WINNER_CACHE.get(str(bf_ref))
            if blm is None:
                import ray as _r

                blm = _r.get(bf_ref)
                _WINNER_CACHE.clear()
                _WINNER_CACHE[str(bf_ref)] = blm
            hit = blm.contains(_key_hash64(batch[key]))
            return batch.filter(pa.array(hit if flagged else ~hit))
        return f

    clean = ds.map_batches(split(False), batch_format="pyarrow")
    cand = ds.map_batches(split(True), batch_format="pyarrow")

    n_buckets = max(1, num_partitions) * 4

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (_key_hash64(batch[key]) % np.uint64(n_buckets)).astype(np.int64)
        return batch.append_column("_bucket", pa.array(b, pa.int64()))

    def bucket_first(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.sort_values([key, order_col], kind="mergesort")
               .drop_duplicates(key, keep="first"))
        return out.drop(columns=["_bucket"])

    confirmed = (cand.map_batches(add_bucket, batch_format="pyarrow")
                 .groupby("_bucket")
                 .map_groups(bucket_first, batch_format="pandas"))
    return clean.union(confirmed)


def exact_dedup_projected(ds, key: str = "phash", order_col: str = "image_id",
                          concurrency: int = 4, strategy: str = "tree"):
    """Scale path for wide rows: shuffle only (key, order_col), compute
    winner ids, broadcast them once, then semi-join back via an actor
    pool. Valid when ``order_col`` is unique per row (image_id is).

    ``strategy="tree"`` (default) computes per-key min via the Arrow
    combiner tree — right when the winner set fits one block (it must
    anyway, since it is broadcast).  ``strategy="groupby"`` uses the
    hash-partitioned Dataset groupby for unbounded key spaces, where
    the broadcast itself must also be replaced (bloom filter / join)."""
    import ray

    projected = ds.select_columns([key, order_col])
    if strategy == "tree":
        from .agg_tree import tree_aggregate

        winners_ds = tree_aggregate(projected, [key], [(order_col, "min")])
        winners_df = winners_ds.to_pandas()
        winner_col = order_col
    else:
        from ray.data.aggregate import Min

        winners_df = (projected.groupby(key)
                      .aggregate(Min(order_col, alias_name="winner"))
                      ).to_pandas()
        winner_col = "winner"
    keys_np = winners_df[key].to_numpy()
    if keys_np.dtype.kind in "iuf":
        # numeric keys: broadcast (sorted keys, aligned winners) so the
        # filter is one C searchsorted + one Arrow equality, never an
        # object-dtype search over winner-id strings
        order = np.argsort(keys_np, kind="mergesort")
        winners_ref = ray.put((keys_np[order],
                               winners_df[winner_col].to_numpy()[order]))
        return ds.map_batches(
            _make_winner_filter(winners_ref, order_col, key_col=key),
            batch_format="pyarrow")
    winners_ref = ray.put(winners_df[winner_col].to_numpy())
    return ds.map_batches(_make_winner_filter(winners_ref, order_col),
                          batch_format="pyarrow")
