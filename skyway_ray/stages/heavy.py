"""Exact heavy hitters over an UNBOUNDED key space without shuffling it.

``SELECT item, count(*) GROUP BY item HAVING count(*)*phi_den > N*phi_num``
in two streaming passes, never moving the full distinct-key set:

1. **Mergeable Misra-Gries summaries** (Agarwal et al., "Mergeable
   Summaries", PODS'12): each block maps to a bounded summary of at
   most ``k`` counter rows (``pyarrow.compute.value_counts`` then the
   MG compression — subtract the (k+1)-th largest count, keep positive
   counters) plus two null-keyed bookkeeping rows carrying the block's
   item count and the subtracted value ``cstar`` (the per-item
   undercount that block's compression can introduce).  Only summaries
   ride the (small) ``groupby`` merge — at most ``k`` rows per input
   block versus every item instance for a naive wordcount shuffle.
2. **Exact recount**: every item whose merged lower-bound count plus
   the global undercount bound ``E = Σ cstar_j`` clears the threshold
   is a candidate (true_count ≤ merged_count + E, so this is a
   guaranteed superset; #candidates ≤ N / (phi·N − E) ≤ 2/phi for the
   default ``k = ceil(2·phi_den/phi_num)`` since E ≤ N/(k+1) < phi·N/2).
   The bounded candidate set is broadcast once (``ray.put``) and
   recounted exactly with per-batch ``value_counts`` partials over a
   now-bounded key set; the final filter is integer math
   (``cnt·phi_den > N·phi_num``) — no float threshold.

Works for string and integer item columns (integer keys compare in
C-typed numpy throughout — the path :func:`joins.skew_hybrid_join`
uses for hot-key detection).  Driver memory is O(candidates) = O(1/phi);
the full dataset is never sorted, shuffled by raw key, or materialized.
Deterministic: counts are exact, the MG guarantee is worst-case, and
ties survive to the recount where the exact filter decides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _mg_compress(items: np.ndarray, counts: np.ndarray, k: int):
    """Misra-Gries reduction of an exact count vector to ≤ k positive
    counters; returns (items, counts, cstar) where ``cstar`` is the
    subtracted value — the per-ITEM undercount this compression can
    introduce (an item loses at most min(its count, cstar)).  Since
    k+1 counts are ≥ cstar and they sum to ≤ n, cstar ≤ n/(k+1)."""
    if len(items) <= k:
        return items, counts, 0
    # (k+1)-th largest count; subtracting it zeroes that item and every
    # rarer one, leaving ≤ k positive counters
    cstar = int(np.partition(counts,
                             len(counts) - (k + 1))[len(counts) - (k + 1)])
    kept = counts - cstar
    pos = kept > 0
    return items[pos], kept[pos], cstar


def _summarize(col: str, k: int):
    def summarize(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch[col])
        items = vc.field("values").to_numpy(zero_copy_only=False)
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        n_batch = int(counts.sum())
        items, counts, cstar = _mg_compress(items, counts, k)
        item_arr = pa.array(items, batch[col].type)
        out_items = pa.concat_arrays(
            [item_arr, pa.nulls(2, batch[col].type)])
        out_cnt = np.concatenate([counts, [n_batch, cstar]]).astype(np.int64)
        kind = np.concatenate([np.zeros(len(items)), [1, 2]]).astype(np.int8)
        return pa.table({"item": out_items,
                         "cnt": pa.array(out_cnt),
                         "kind": pa.array(kind)})

    return summarize


def _cmp_array(values: np.ndarray) -> np.ndarray:
    """Numpy array with C-typed comparisons for sort/searchsorted:
    integers stay int64, everything else casts to fixed-width str."""
    if np.issubdtype(np.asarray(values).dtype, np.integer):
        return np.asarray(values, dtype=np.int64)
    return np.asarray(values).astype(str)


def exact_heavy_hitters(ds, col: str, phi_num: int = 1, phi_den: int = 500,
                        k: int | None = None):
    """Items of ``ds[col]`` (string or integer) with frequency strictly
    above ``phi_num/phi_den`` of the total, with EXACT counts.

    Returns a Dataset with columns (item, cnt).  ``k`` is the per-block
    summary size; the default guarantees the candidate superset
    property (E < phi·N/2).  Raises if a custom ``k`` is too small for
    the guarantee on this input (E ≥ phi·N)."""
    import ray

    if k is None:
        k = int(np.ceil(2 * phi_den / phi_num))

    summaries = ds.map_batches(_summarize(col, k), batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    item_type = summaries.schema().base_schema.field("item").type

    def _empty():
        return ray.data.from_arrow(pa.table(
            {"item": pa.nulls(0, item_type),
             "cnt": pa.array([], pa.int64())}))

    book = summaries.filter(expr="kind > 0").to_pandas()  # 2 rows/block
    n_total = int(book.loc[book["kind"] == 1, "cnt"].sum())
    # per-item undercount bound: an item loses ≤ cstar_j in block j, so
    # ≤ E = sum_j cstar_j overall; E ≤ sum_j n_j/(k+1) = N/(k+1)
    err = int(book.loc[book["kind"] == 2, "cnt"].sum())
    if n_total == 0:
        return _empty()
    if err * phi_den >= n_total * phi_num:
        raise ValueError(
            f"summary size k={k} too small: undercount bound {err} >= "
            f"phi*N = {phi_num}/{phi_den}*{n_total}; raise k")

    # merged MG lower bounds; candidate iff lower + E clears phi*N
    # (true_count ≤ merged_lower + E).  The summary table is bounded by
    # k rows/block; the candidate FILTER runs distributed, so only
    # ≤ N/(phi*N - E) candidate rows (≤ 2/phi for the default k) are
    # ever collected.
    # merged partials are bounded (≤ k rows per block), so they ride
    # the combiner tree — no sort-based Aggregate in the plan
    from .agg_tree import tree_aggregate

    merged = tree_aggregate(
        summaries.filter(expr="kind == 0").select_columns(["item", "cnt"]),
        ["item"], [("cnt", "sum")])

    def cand(b: pa.Table) -> pa.Table:
        lower = b["cnt"].to_numpy(zero_copy_only=False)
        keep = (lower + err) * phi_den > n_total * phi_num
        return b.filter(pa.array(keep)).select(["item"])

    cand_df = merged.map_batches(cand, batch_format="pyarrow").to_pandas()
    if "item" not in cand_df.columns or not len(cand_df):
        return _empty()
    cand_sorted = np.sort(_cmp_array(cand_df["item"].to_numpy()))
    cand_ref = ray.put(cand_sorted)

    def recount(batch: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        vc = pc.value_counts(batch[col])
        items = vc.field("values").to_numpy(zero_copy_only=False)
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        s = _cmp_array(items)
        pos = np.searchsorted(cands, s)
        pos_c = np.clip(pos, 0, len(cands) - 1)
        hit = cands[pos_c] == s
        return pa.table({"item": pa.array(items[hit], batch[col].type),
                         "cnt": pa.array(counts[hit].astype(np.int64))})

    totals = tree_aggregate(
        ds.map_batches(recount, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["item"], [("cnt", "sum")])

    def final(b: pa.Table) -> pa.Table:
        cnt = b["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = cnt * phi_den > n_total * phi_num
        return pa.table({"item": b["item"].filter(pa.array(keep)),
                         "cnt": pa.array(cnt[keep])})

    return totals.map_batches(final, batch_format="pyarrow")


def bigram_items(batch: pd.DataFrame, text_col: str = "text",
                 out_col: str = "item") -> pd.DataFrame:
    """Word-bigram extraction, vectorized across the batch: tokens are
    lower-cased ``[a-z0-9]+`` runs; bigrams never cross documents
    (mask on the flattened token array, no per-doc Python loop)."""
    toks = batch[text_col].str.lower().str.findall(r"[a-z0-9]+")
    lens = toks.str.len().to_numpy()
    if int(lens.sum()) == 0:
        return pd.DataFrame({out_col: pd.Series([], dtype=str)})
    flat = np.concatenate([np.asarray(t, dtype=object)
                           for t in toks if len(t)])
    # last token of each doc cannot start a bigram
    ends = np.cumsum(lens[lens > 0]) - 1
    valid = np.ones(len(flat), dtype=bool)
    valid[ends] = False
    a = pd.Series(flat[:-1][valid[:-1]], dtype=str)
    b = pd.Series(flat[1:][valid[:-1]], dtype=str)
    return pd.DataFrame({out_col: a.str.cat(b, sep=" ")})
