"""HyperLogLog approximate COUNT(DISTINCT) — one streaming pass, no
shuffle, O(2^p) state (Flajolet et al. 2007; the bias/small-range
handling follows the classic paper, not any proprietary variant).

Scale shape: every block maps to one 2^p-byte register blob (vectorized
``np.maximum.at`` over polars-hashed keys — a C hash path for both int
and string columns); blobs merge by elementwise max, which is
associative/commutative/idempotent, so the result is partition- and
order-invariant.  A ``map_batches`` tree level folds 64 blobs at a
time before the driver reduces the short remainder — the driver never
sees more than #blocks/64 blobs and never any data rows.

The exact operators (``agg_tree.grouped_count_distinct``,
``Dataset.unique``) stay the correctness path; this is the
constant-memory estimate for 10^9+-cardinality columns where even the
pair-dedup shuffle is too expensive.  Standard error ≈ 1.04/√(2^p)
(~0.8% at the default p=14, 16 KiB of state).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


_MASK64 = (1 << 64) - 1
_GOLD = 0x9E3779B97F4A7C15
_MIX1 = 0xBF58476D1CE4E5B9
_MIX2 = 0x94D049BB133111EB


def _splitmix64(x: np.ndarray, seed: int = 42) -> np.ndarray:
    """SplitMix64 avalanche finalizer over int64 keys (wrapping uint64
    arithmetic; the seed offsets the stream).  Chosen over polars'
    internal hash because every step is plain arithmetic a SQL oracle
    can replay exactly in HUGEINT (:func:`splitmix64_sql`) — which is
    what turns the HLL ESTIMATE itself into a hash-verifiable value."""
    off = np.uint64(((seed + 1) * _GOLD) & _MASK64)
    z = np.ascontiguousarray(x, np.int64).view(np.uint64) + off
    z = (z ^ (z >> np.uint64(30))) * np.uint64(_MIX1)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(_MIX2)
    return z ^ (z >> np.uint64(31))


def splitmix64_sql(expr: str, seed: int = 42) -> str:
    """DuckDB expression computing :func:`_splitmix64` of BIGINT
    ``expr`` bit-for-bit (mod-2^64 HUGEINT arithmetic — builders in
    :mod:`..functions.sqlhash`; shifts are floor divisions)."""
    from ..functions.sqlhash import mul64_sql, xor64_sql

    two64 = 1 << 64
    off = ((seed + 1) * _GOLD) & _MASK64
    z = (f"((CAST({expr} AS HUGEINT) % {two64} + {two64}) % {two64} "
         f"+ {off}) % {two64}")
    z = mul64_sql(xor64_sql(z, f"({z}) // {1 << 30}"), _MIX1)
    z = mul64_sql(xor64_sql(z, f"({z}) // {1 << 27}"), _MIX2)
    return xor64_sql(z, f"({z}) // {1 << 31}")


def _hash64(col, seed: int = 42) -> np.ndarray:
    """Vectorized 64-bit avalanche hash of an Arrow column: integer
    columns ride :func:`_splitmix64` (SQL-replayable — the oracle
    pins the estimate exactly); other dtypes fall back to polars'
    hash (deterministic for a fixed environment; those estimates stay
    rows-only)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        return _splitmix64(col.to_numpy(zero_copy_only=False), seed)
    import polars as pl

    s = pl.from_arrow(col)
    return s.hash(seed).to_numpy().astype(np.uint64)


def _register_blob(h: np.ndarray, p: int) -> np.ndarray:
    """uint8[2^p] register array for one batch of hashes: index = top
    ``p`` bits; rank = leading-zero count (+1) of the next 40 bits —
    a 40-bit window is exact under float64 ``log2`` (values < 2^52),
    avoiding the rounding hazard of log2 on full 64-bit words."""
    m = 1 << p
    reg = np.zeros(m, dtype=np.uint8)
    if len(h) == 0:
        return reg
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = ((h >> np.uint64(24 - p)) & np.uint64((1 << 40) - 1)).astype(np.int64)
    rho = np.full(len(h), 41, dtype=np.uint8)
    nz = w > 0
    rho[nz] = (40 - np.floor(np.log2(w[nz])).astype(np.int64)).astype(np.uint8)
    np.maximum.at(reg, idx, rho)
    return reg


def _estimate(reg: np.ndarray) -> float:
    """Classic HLL estimate with the harmonic sum kept EXACT: every
    register term 2^-reg scales to the integer 2^(41-reg) (reg ≤ 41),
    so Σ fits int64 (≤ m·2^41 < 2^55 at p=14) and the whole estimate
    is one correctly-rounded float division — summation-order
    independent, hence replayable bit-for-bit by a SQL oracle
    (:func:`hll_estimate_sql`)."""
    m = len(reg)
    alpha = 0.7213 / (1.0 + 1.079 / m)  # m >= 128
    s_int = int(np.sum(np.int64(1) << (41 - reg.astype(np.int64))))
    e = alpha * m * m * 2199023255552.0 / s_int  # 2^41
    zeros = int((reg == 0).sum())
    if e <= 2.5 * m and zeros > 0:  # small-range linear counting
        e = m * np.log(m / zeros)
    return float(e)


def hll_estimate_sql(reg_rows: str, p: int, group_cols: str = "") -> str:
    """SQL CTE tail replaying :func:`_estimate` over ``reg_rows`` — a
    relation of (``group_cols``…, idx, reg) FILLED registers (absent
    idx = register 0; the zero count is recovered as m − present).
    Returns a SELECT yielding (``group_cols``…, est) with ``est`` the
    raw DOUBLE estimate, same op order as the engine: the harmonic
    sum is the exact integer Σ 2^(41−reg), the numerator
    alpha·m²·2^41 is ONE embedded repr-round-tripped float, and the
    linear-counting branch mirrors ``m * log(m / zeros)``."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = alpha * m * m * 2199023255552.0
    g = f"{group_cols}, " if group_cols else ""
    gby = f"GROUP BY {group_cols}" if group_cols else ""
    return (
        f"SELECT {g}CASE WHEN raw <= {2.5 * m!r} AND zeros > 0 "
        f"THEN {float(m)!r} * ln(CAST({m} AS DOUBLE) / zeros) "
        f"ELSE raw END AS est FROM ("
        f"SELECT {g}{m} - count(*) AS zeros, "
        f"{num!r} / (CAST(sum(CAST(1 AS BIGINT) << (41 - reg)) "
        f"AS HUGEINT) + (CAST({m} AS HUGEINT) - count(*)) "
        f"* {1 << 41}) AS raw "
        f"FROM ({reg_rows}) {gby})"
    )


def hll_reg_rows_sql(source: str, key_expr: str, p: int,
                     seed: int = 42, group_cols: str = "") -> str:
    """SQL producing the (``group_cols``…, idx, reg) filled-register
    relation of :func:`_register_blob` over ``key_expr`` drawn from
    ``source``: splitmix64 hash, top-p-bit index, leading-zero rank of
    the next 40 bits via floor(log2) — exact for w < 2^40 (a non-power
    w keeps log2 ≥ 2^-41 away from an integer, > 100× double ulp)."""
    m = 1 << p
    h = splitmix64_sql(key_expr, seed)
    g = f"{group_cols}, " if group_cols else ""
    return (
        f"SELECT {g}idx, max(rho) AS reg FROM ("
        f"SELECT {g}CAST(h // {1 << (64 - p)} AS BIGINT) AS idx, "
        f"CAST(CASE WHEN (h // {1 << (24 - p)}) % {1 << 40} = 0 THEN 41 "
        f"ELSE 40 - CAST(floor(log2(CAST((h // {1 << (24 - p)}) "
        f"% {1 << 40} AS DOUBLE))) AS BIGINT) END AS BIGINT) AS rho "
        f"FROM (SELECT {g}{h} AS h FROM {source})) "
        f"GROUP BY {g}idx"
    )


def hll_distinct(ds, col: str, p: int = 14, seed: int = 42) -> float:
    """Approximate distinct count of ``ds[col]``."""
    m = 1 << p

    def to_blob(batch: pa.Table) -> pd.DataFrame:
        reg = _register_blob(_hash64(batch[col], seed), p)
        return pd.DataFrame({"blob": [reg.tobytes()]})

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        regs = np.stack([np.frombuffer(x, dtype=np.uint8)
                         for x in b["blob"]])
        return pd.DataFrame({"blob": [regs.max(axis=0).tobytes()]})

    blobs = (ds.map_batches(to_blob, batch_format="pyarrow",
                            zero_copy_batch=True)
             .map_batches(fold, batch_format="pandas", batch_size=64)
             .to_pandas())
    reg = np.zeros(m, dtype=np.uint8)
    for x in blobs["blob"]:
        np.maximum(reg, np.frombuffer(x, dtype=np.uint8), out=reg)
    return _estimate(reg)


def hll_merge(blob_a: bytes, blob_b: bytes) -> bytes:
    """Merge two HLL register blobs (elementwise max) — the sketch is
    mergeable across shards/days/sources without rescanning."""
    a = np.frombuffer(blob_a, dtype=np.uint8)
    b = np.frombuffer(blob_b, dtype=np.uint8)
    return np.maximum(a, b).tobytes()


def hll_distinct_by(ds, group_col: str, col: str, p: int = 12,
                    seed: int = 42) -> pd.DataFrame:
    """Approximate distinct count of ``col`` PER GROUP — one pass plus
    one sketch-sized shuffle: each batch emits one (group, 2^p-byte
    blob) partial per group present (vectorized register fill via
    ``np.maximum.at`` on a groups×m matrix), and the ``groupby`` merge
    folds blobs by elementwise max.  What rides the shuffle is bounded
    by groups×blocks sketches, never by rows — the approximate
    complement to the exact ``agg_tree.grouped_count_distinct`` (whose
    shuffle carries every distinct (group, key) pair).  Defaults to
    p=12 (4 KiB/sketch, ~1.6% rse): grouped sketches multiply by the
    group count, so spend bytes deliberately."""
    m = 1 << p

    def to_blobs(batch: pa.Table) -> pd.DataFrame:
        import pandas as pd_

        g = batch[group_col].to_numpy(zero_copy_only=False)
        h = _hash64(batch[col], seed)
        codes, uniq = pd_.factorize(pd_.Series(g), sort=False)
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        w = ((h >> np.uint64(24 - p)) &
             np.uint64((1 << 40) - 1)).astype(np.int64)
        rho = np.full(len(h), 41, dtype=np.uint8)
        nz = w > 0
        rho[nz] = (40 - np.floor(np.log2(w[nz]))
                   .astype(np.int64)).astype(np.uint8)
        regs = np.zeros((len(uniq), m), dtype=np.uint8)
        np.maximum.at(regs, (codes, idx), rho)
        return pd_.DataFrame({group_col: uniq,
                              "blob": [r.tobytes() for r in regs]})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.stack([np.frombuffer(x, dtype=np.uint8)
                         for x in g["blob"]])
        est = _estimate(regs.max(axis=0))
        # floor(x+0.5), not round(): Python round is banker's, the SQL
        # oracle's floor(est + 0.5) is not — pin both to the same op
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             "n_distinct_est": [int(np.floor(est + 0.5))]})

    return (ds.map_batches(to_blobs, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(group_col).map_groups(fold, batch_format="pandas")
            .to_pandas())
