"""Join patterns the Dataset API doesn't ship directly (ray_guide
"Joins and lookups"): broadcast hash join, broadcast semi/anti join,
and a bucketed as-of join.

All small sides travel once via ``ray.put``; lookup happens inside
``map_batches`` with a per-worker-process cache — no shuffle.  The
as-of join co-locates keys with one ``groupby`` on the big side only
and runs ``pd.merge_asof`` per group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_SIDE_CACHE: dict = {}


def _cached(ref):
    key = str(ref)
    val = _SIDE_CACHE.get(key)
    if val is None:
        import ray

        val = ray.get(ref)
        _SIDE_CACHE.clear()
        _SIDE_CACHE[key] = val
    return val


def broadcast_hash_join(ds, small: pd.DataFrame, on: str, how: str = "inner",
                        small_on: str | None = None):
    """Join a Dataset against a broadcast pandas table (dimension-table
    pattern). ``how`` ∈ inner/left."""
    import ray

    ref = ray.put(small)
    small_key = small_on or on

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        rhs = _cached(ref)
        return batch.merge(rhs, how=how, left_on=on, right_on=small_key)

    return ds.map_batches(join, batch_format="pandas")


def broadcast_semi_join(ds, keys, on: str, anti: bool = False):
    """Keep rows whose ``on`` value is (not) in the broadcast key set —
    the HAS/DROP selector analogue over a foreign key."""
    import ray

    arr = np.sort(np.asarray(keys))
    ref = ray.put(arr)

    def filt(batch: pa.Table) -> pa.Table:
        k = _cached(ref)
        vals = batch[on].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(k, vals), 0, len(k) - 1)
        hit = k[pos] == vals if len(k) else np.zeros(len(vals), bool)
        return batch.filter(pa.array(~hit if anti else hit))

    return ds.map_batches(filt, batch_format="pyarrow")


def bloom_semi_join(ds, keys, on: str, bits_per_key: int = 10):
    """Approximate semi join for key sets too large to broadcast
    exactly: ~1% false-positive over-keep, zero false drops. Chain an
    exact filter on the (much smaller) survivor set when exactness is
    required."""
    import ray

    from ..functions.bloom import BloomFilter

    keys = np.asarray(keys)
    bf = BloomFilter(len(keys), bits_per_key=bits_per_key)
    bf.add(keys)
    ref = ray.put(bf)

    def filt(batch: pa.Table) -> pa.Table:
        f = _cached(ref)
        vals = batch[on].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(f.contains(vals)))

    return ds.map_batches(filt, batch_format="pyarrow")


def broadcast_range_join(ds, intervals: pd.DataFrame, on: str,
                         lo: str = "lo", hi: str = "hi",
                         how: str = "inner"):
    """Interval join: match each big-side row's ``on`` value x against
    every broadcast interval with ``lo <= x < hi``.  Intervals MAY
    overlap (a row can match several) — the classic price-band /
    time-range / geofence-latitude join.

    Vectorized bounded-span probe: intervals sort by ``lo`` once on the
    driver; per batch, the candidate set for x is the contiguous run of
    intervals with ``lo`` in ``(x - max_span, x]`` (two searchsorteds),
    expanded with ``np.repeat`` and filtered by ``hi > x``.  Cost is
    O(rows x overlap-degree), not O(rows x intervals).  The interval
    table is the SMALL side (broadcast once via ``ray.put``); a
    large-interval-side variant would bucket both sides by range bins —
    not needed for dimension-table-sized band lists.

    ``how='left'`` keeps unmatched rows with nulls in interval columns.
    """
    import ray

    iv = intervals.sort_values([lo, hi], kind="mergesort").reset_index(drop=True)
    los = iv[lo].to_numpy()
    his = iv[hi].to_numpy()
    max_span = float((his - los).max()) if len(iv) else 0.0
    ref = ray.put((los, his, iv))

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        los_b, his_b, iv_b = _cached(ref)
        x = batch[on].to_numpy()
        # candidate interval indices per row: los in (x - max_span, x]
        start = np.searchsorted(los_b, x - max_span, side="left")
        stop = np.searchsorted(los_b, x, side="right")
        counts = stop - start
        row_idx = np.repeat(np.arange(len(x)), counts)
        # flatten the per-row candidate runs into one index vector
        if len(row_idx):
            offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
            cand = np.arange(len(row_idx)) - offs[row_idx] + start[row_idx]
            keep = his_b[cand] > x[row_idx]
            row_idx, cand = row_idx[keep], cand[keep]
        else:
            cand = row_idx
        out = batch.iloc[row_idx].reset_index(drop=True)
        matched = iv_b.iloc[cand].reset_index(drop=True)
        out = pd.concat([out, matched], axis=1)
        if how == "left":
            miss = np.ones(len(x), dtype=bool)
            miss[row_idx] = False
            if miss.any():
                rest = batch.iloc[np.flatnonzero(miss)].reset_index(drop=True)
                rest = rest.reindex(columns=out.columns)
                out = pd.concat([out, rest], ignore_index=True)
        return out

    return ds.map_batches(join, batch_format="pandas")


def asof_join_broadcast(ds, right: pd.DataFrame, key: str, ts: str,
                        right_key: str, right_ts: str, right_cols: list[str],
                        direction: str = "backward"):
    """As-of join: for each left row, the latest right row with the
    same key and right_ts <= ts (direction=backward).  The right side
    is broadcast (small); each batch merge_asofs locally — no shuffle
    of the big side at all.  For a LARGE right side, bucket both sides
    by key hash and merge per bucket instead (documented scale path).
    """
    import ray

    right = right.sort_values([right_ts, right_key], kind="mergesort")
    ref = ray.put(right)

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        rhs = _cached(ref)
        b = batch.sort_values([ts, key], kind="mergesort")
        out = pd.merge_asof(b, rhs, left_on=ts, right_on=right_ts,
                            left_by=key, right_by=right_key,
                            direction=direction)
        return out[list(batch.columns) + right_cols]

    return ds.map_batches(join, batch_format="pandas")


def copart_hash_join(left_ds, right_ds, left_on: str,
                     right_on: str | None = None, how: str = "inner",
                     n_rows: int | None = None,
                     rows_per_bucket: int | None = None,
                     left_schema=None, right_schema=None):
    """Large×large equi-join as ONE coarse hash co-partition exchange
    plus a vectorized Acero (``pyarrow.Table.join``) hash join inside
    each bucket — the replacement for ``Dataset.join``, whose
    aggregator-actor machinery costs ~10s of fixed overhead per call
    at any scale (measured: the same 750k-row inner join drops 14.6s →
    sub-second through this path).

    Shape: both sides are tagged (``_side``) and null-padded to one
    unified schema, unioned, and routed through
    :func:`stages.scan.hash_bucket_scan` keyed on the join key — every
    key lands wholly in one bucket, buckets bound worker memory at
    ``rows_per_bucket``, and the per-bucket join is compiled C++.
    Output column order matches ``Dataset.join``: left columns (key
    coalesced under ``left_on`` for outer joins) then right non-key
    columns.  Requirements: non-null INTEGER keys (hash material) and
    disjoint payload column names.  ``how`` ∈ inner / left / right /
    full_outer.  For skewed keys wrap with :func:`skew_hybrid_join`."""
    import pyarrow.compute as pc

    from .scan import hash_bucket_scan

    right_on = right_on or left_on
    # schema() on a map_batches-derived Dataset executes a plan prefix
    # to infer types — callers that know their schemas (same .names /
    # .types duck type: ray Schema or pyarrow Schema) pass them instead
    ls = left_schema if left_schema is not None else left_ds.schema()
    rs = right_schema if right_schema is not None else right_ds.schema()

    def _pa_type(t):
        # ray Schema reports numpy dtypes / Python types for
        # pandas-backed blocks; Arrow blocks give DataTypes through
        if isinstance(t, pa.DataType):
            return t
        dt = np.dtype(t)
        if dt.kind in ("O", "U", "S"):  # pandas strings arrive as object
            return pa.string()
        return pa.from_numpy_dtype(dt)

    ltypes = {n: _pa_type(t) for n, t in zip(ls.names, ls.types)}
    rtypes = {n: _pa_type(t) for n, t in zip(rs.names, rs.types)}
    lpay = [n for n in ls.names if n != left_on]
    rpay = [n for n in rs.names if n != right_on]
    clash = set(lpay) & set(rpay)
    if clash:
        raise ValueError(f"overlapping payload columns: {sorted(clash)}")
    key_t = ltypes[left_on]
    names = ["_k", "_side"] + lpay + rpay
    types = ([key_t, pa.int8()] + [ltypes[n] for n in lpay]
             + [rtypes[n] for n in rpay])

    def _tag(side: int, key: str, own: list[str]):
        def fn(b: pa.Table) -> pa.Table:
            n = len(b)
            side_arr = pa.array(np.full(n, side, np.int8()), pa.int8())
            arrs = []
            for nm, tp in zip(names, types):
                if nm == "_k":
                    arrs.append(b[key] if tp == b[key].type
                                else b[key].cast(tp))
                elif nm == "_side":
                    arrs.append(side_arr)
                elif nm in own:
                    # empty blocks surface null-typed columns — pin to
                    # the unified schema type (Acero rejects null
                    # payload fields)
                    arrs.append(b[nm] if tp == b[nm].type
                                else b[nm].cast(tp))
                else:
                    arrs.append(pa.nulls(n, tp))
            return pa.table(dict(zip(names, arrs)))

        return fn

    tagged = left_ds.map_batches(
        _tag(0, left_on, lpay), batch_format="pyarrow").union(
        right_ds.map_batches(_tag(1, right_on, rpay),
                             batch_format="pyarrow"))
    jt = {"inner": "inner", "left": "left outer",
          "right": "right outer", "full_outer": "full outer",
          "left_semi": "left semi", "left_anti": "left anti"}[how]
    # Dataset.join's column layout; semi/anti emit left columns only
    out_order = list(ls.names) + ([] if how in ("left_semi", "left_anti")
                                  else rpay)

    lt_schema = pa.schema([pa.field("_k", key_t)]
                          + [pa.field(c, ltypes[c]) for c in lpay])
    rt_schema = pa.schema([pa.field("_k", key_t)]
                          + [pa.field(c, rtypes[c]) for c in rpay])

    def bucket_join(t: pa.Table) -> pa.Table:
        lt = t.filter(pc.equal(t["_side"], 0)).select(["_k"] + lpay)
        rt = t.filter(pc.equal(t["_side"], 1)).select(["_k"] + rpay)
        # degenerate empty groups pass through Ray as schemaless pandas
        # blocks whose columns re-enter Arrow as type null, which Acero
        # rejects — pin them back (a zero-row cast is always safe)
        if lt.schema != lt_schema:
            lt = lt.cast(lt_schema)
        if rt.schema != rt_schema:
            rt = rt.cast(rt_schema)
        out = lt.join(rt, keys=["_k"], join_type=jt, use_threads=False)
        out = out.rename_columns(
            [left_on if c == "_k" else c for c in out.column_names])
        return out.select(out_order)

    return hash_bucket_scan(tagged, ["_k"], bucket_join, n_rows=n_rows,
                            rows_per_bucket=rows_per_bucket)


def skew_hybrid_join(fact_ds, dim_ds, fact_key: str, dim_key: str,
                     phi_num: int = 1, phi_den: int = 200,
                     num_partitions: int = 16, hot_limit: int = 100_000):
    """Skew-resistant large×large inner equi-join.

    A plain hash-shuffle join sends every row of a hot key to ONE
    partition — at web scale a single skewed key (one viral image id,
    one empty-string token) serializes the whole join.  This hybrid
    routes around it exactly:

    1. Hot keys of the FACT side are detected with the bounded
       Misra-Gries pass (:func:`stages.heavy.exact_heavy_hitters` —
       two streaming scans, ≤ 2·phi_den/phi_num candidates, no raw-key
       shuffle).
    2. The dim rows matching hot keys are collected once (bounded by
       |hot| for a key-unique dim side — the usual fact⋈dim shape) and
       broadcast; hot fact rows join against them inside
       ``map_batches`` — hot keys never enter a shuffle.
    3. Cold rows of both sides go through the ordinary hash-shuffle
       ``Dataset.join``, now skew-free by construction.
    4. The two result streams union (same column layout).

    Output equals the plain inner join bit-for-bit (both paths are
    exact; a key routes to exactly one path).  ``hot_limit`` guards the
    broadcast: if the dim rows for hot keys exceed it, raise instead of
    silently materializing an unbounded side."""
    import ray

    from .heavy import _cmp_array, exact_heavy_hitters

    hot = exact_heavy_hitters(fact_ds, fact_key, phi_num=phi_num,
                              phi_den=phi_den).to_pandas()
    if not len(hot):  # no skew detected — plain hash-shuffle join
        return copart_hash_join(fact_ds, dim_ds, fact_key, dim_key)
    hot_keys = np.sort(_cmp_array(hot["item"].to_numpy()))
    hot_ref = ray.put(hot_keys)
    # Ray's hash-shuffle join cannot take a FULLY empty input (its
    # aggregators learn the schema from received blocks), so detect the
    # all-hot degenerate cases up front from counts we already have
    n_cold_fact = fact_ds.count() - int(hot["cnt"].sum())

    def _split(key_col):
        def mask(batch: pa.Table, keep_hot: bool) -> pa.Table:
            keys = _cmp_array(batch[key_col].to_numpy(zero_copy_only=False))
            hk = ray.get(hot_ref)
            if not len(hk):
                hit = np.zeros(len(keys), dtype=bool)
            else:
                pos = np.clip(np.searchsorted(hk, keys), 0, len(hk) - 1)
                hit = hk[pos] == keys
            return batch.filter(pa.array(hit if keep_hot else ~hit))

        return mask

    fact_mask, dim_mask = _split(fact_key), _split(dim_key)

    # hot path: bounded dim rows broadcast once, fact-side merge
    dim_hot = dim_ds.map_batches(
        lambda b: dim_mask(b, True), batch_format="pyarrow").to_pandas()
    if len(dim_hot) > hot_limit:
        raise ValueError(
            f"dim rows for hot keys ({len(dim_hot)}) exceed hot_limit="
            f"{hot_limit}; dim side is not key-bounded — raise the limit "
            "or pre-aggregate the dim side")
    if not len(dim_hot):  # hot keys have no dim partners: hot path
        # contributes nothing — the plain join over full inputs is
        # identical (hot fact rows just fail to match)
        return copart_hash_join(fact_ds, dim_ds, fact_key, dim_key)
    dim_hot_ref = ray.put(dim_hot)
    dim_fields = {f.name: f.type for f in
                  pa.Table.from_pandas(dim_hot, preserve_index=False)
                  .schema}

    def hot_merge(b: pa.Table) -> pa.Table:
        right = _cached(dim_hot_ref)
        out = b.to_pandas().merge(right, left_on=fact_key,
                                  right_on=dim_key, how="inner")
        # match Dataset.join's layout: left columns then right columns
        # with the right key dropped (it duplicates the left key)
        if dim_key != fact_key:
            out = out.drop(columns=[dim_key])
        # cast to the cold path's exact Arrow schema so union sees ONE
        # schema (pandas round-trips would otherwise drift string types)
        target = pa.schema(
            list(b.schema) + [pa.field(n, t) for n, t in dim_fields.items()
                              if n != dim_key])
        return pa.Table.from_pandas(out, preserve_index=False).cast(target)

    hot_joined = fact_ds.map_batches(
        lambda b: fact_mask(b, True), batch_format="pyarrow").map_batches(
        hot_merge, batch_format="pyarrow")

    # cold fact empty (every row hot) or cold dim empty (every dim key
    # hot ⇒ cold fact rows have no partners): the cold join contributes
    # nothing — and would crash on a schemaless empty input
    if n_cold_fact == 0 or len(dim_hot) >= dim_ds.count():
        return hot_joined

    cold_joined = copart_hash_join(
        fact_ds.map_batches(lambda b: fact_mask(b, False),
                            batch_format="pyarrow"),
        dim_ds.map_batches(lambda b: dim_mask(b, False),
                           batch_format="pyarrow"),
        fact_key, dim_key, n_rows=n_cold_fact,
        left_schema=fact_ds.schema(), right_schema=dim_ds.schema())

    return hot_joined.union(cold_joined)


def interval_overlap_join(left_ds, right_ds, key: str,
                          left_id: str, left_start: str, left_end: str,
                          right_id: str, right_start: str, right_end: str,
                          max_right_dur: int,
                          out_cols: tuple[str, str] | None = None,
                          n_rows: int | None = None,
                          rows_per_bucket: int | None = None):
    """Keyed interval×interval overlap join: emit (left_id, right_id)
    for every same-key pair with ``l.start <= r.end`` and
    ``r.start <= l.end``.  Start/end columns are int64 on one time
    axis (e.g. epoch-microseconds).

    Scale shape: ONE coarse hash exchange on ``key`` (both sides
    union-tagged, the :func:`stages.scan.hash_bucket_scan` pattern), so
    a key's intervals land wholly in one bucket.  Inside a bucket the
    right side sorts once by a (dense-key-rank, start) composite and
    every left interval finds its candidate window with two GLOBAL
    ``searchsorted`` calls — the bounded-duration sweep: a right
    interval overlapping [s, e] must start in [s - max_right_dur, e],
    so candidates are one contiguous slice per left row, expanded with
    grouped-arange arithmetic and masked exactly (``r.end >= l.start``)
    — no per-key Python.  ``max_right_dur`` is the caller's bound on
    right-interval length (enforced; a violation would silently drop
    pairs).  Composite keys need ``n_keys × time_span`` < 2^63 per
    bucket — raised as an error otherwise (tighten rows_per_bucket)."""
    from .scan import hash_bucket_scan

    def tag(side: int, id_c: str, s_c: str, e_c: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({
                "_ivk": b[key].cast(pa.int64()),
                "_ivid": b[id_c].cast(pa.int64()),
                "_ivs": b[s_c].cast(pa.int64()),
                "_ive": b[e_c].cast(pa.int64()),
                "_ivside": pa.array(
                    np.full(len(b), side, np.int8), pa.int8())})
        return f

    unioned = (left_ds.map_batches(tag(0, left_id, left_start, left_end),
                                   batch_format="pyarrow")
               .union(right_ds.map_batches(
                   tag(1, right_id, right_start, right_end),
                   batch_format="pyarrow")))

    lcol, rcol = out_cols if out_cols else (left_id, right_id)
    if lcol == rcol:
        raise ValueError("output id columns collide — pass out_cols")
    empty = pa.table({lcol: pa.array([], pa.int64()),
                      rcol: pa.array([], pa.int64())})

    def pairs(t: pa.Table) -> pa.Table:
        side = t["_ivside"].to_numpy(zero_copy_only=False)
        k = t["_ivk"].to_numpy(zero_copy_only=False)
        iv_id = t["_ivid"].to_numpy(zero_copy_only=False)
        s = t["_ivs"].to_numpy(zero_copy_only=False)
        e = t["_ive"].to_numpy(zero_copy_only=False)
        a = side == 0
        ka, ia, sa, ea = k[a], iv_id[a], s[a], e[a]
        kb, ib, sb, eb = k[~a], iv_id[~a], s[~a], e[~a]
        if not len(ka) or not len(kb):
            return empty
        if int((eb - sb).max()) > max_right_dur:
            raise ValueError("right interval exceeds max_right_dur")
        base = int(min(sa.min(), sb.min()))
        span = int(max(ea.max(), eb.max())) - base + int(max_right_dur) + 2
        uk = np.unique(np.concatenate([ka, kb]))
        if len(uk) * span >= 2 ** 63:
            raise ValueError("key-rank × time-span composite overflows "
                             "int64 — lower rows_per_bucket")
        ra = np.searchsorted(uk, ka).astype(np.int64)
        rb = np.searchsorted(uk, kb).astype(np.int64)
        bkey = rb * span + (sb - base)
        order = np.argsort(bkey, kind="stable")
        bkey, ib, sb, eb = bkey[order], ib[order], sb[order], eb[order]
        lo = np.searchsorted(
            bkey, ra * span + np.maximum(sa - base - max_right_dur, 0),
            side="left")
        hi = np.searchsorted(bkey, ra * span + (ea - base), side="right")
        cnt = hi - lo
        tot = int(cnt.sum())
        if not tot:
            return empty
        a_idx = np.repeat(np.arange(len(sa)), cnt)
        offs = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        b_pos = np.arange(tot) - np.repeat(offs, cnt) + np.repeat(lo, cnt)
        keep = eb[b_pos] >= sa[a_idx]
        return pa.table({lcol: pa.array(ia[a_idx][keep], pa.int64()),
                         rcol: pa.array(ib[b_pos][keep], pa.int64())})

    return hash_bucket_scan(unioned, ["_ivk"], pairs, n_rows=n_rows,
                            rows_per_bucket=rows_per_bucket)
