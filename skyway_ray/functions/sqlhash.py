"""SQL-replayable hash builders — the DuckDB expression halves of the
engine's integer hash kernels, shared by every oracle that pins a
hash-dependent result (HLL registers via stages/hll.splitmix64_sql,
SimHash fingerprints via :func:`fnv1a64_sql`).

All arithmetic is mod 2^64 carried in HUGEINT: a 64×64 multiply can
reach 2^128 (one past HUGEINT's 2^127), so :func:`mul64_sql`
decomposes the variable operand into 32-bit halves — every
intermediate stays ≤ 2^96.  XOR routes through UBIGINT (operands are
always < 2^64 here, so the cast is lossless).
"""

from __future__ import annotations

_TWO64 = 1 << 64
_TWO32 = 1 << 32

FNV_OFFSET = 14695981039346656037
FNV_PRIME = 1099511628211


def mul64_sql(e: str, k: int) -> str:
    """``(e * k) mod 2^64`` for a HUGEINT expression ``e`` in
    [0, 2^64) and a constant ``k`` (its 32-bit halves are baked into
    the expression)."""
    k_lo, k_hi = k % _TWO32, k // _TWO32
    return (f"((({e}) % {_TWO32}) * {k_lo} + "
            f"((((({e}) // {_TWO32}) * {k_lo} + "
            f"(({e}) % {_TWO32}) * {k_hi}) % {_TWO32}) * {_TWO32})) "
            f"% {_TWO64}")


def xor64_sql(a: str, b: str) -> str:
    """Bitwise XOR of two HUGEINT expressions in [0, 2^64)."""
    return (f"CAST(xor(CAST(({a}) AS UBIGINT), "
            f"CAST(({b}) AS UBIGINT)) AS HUGEINT)")


def rot64_sql(e: str, k: int) -> str:
    """64-bit left-rotate by ``k`` of a HUGEINT expression in
    [0, 2^64) — the two shifted halves occupy disjoint bits, so OR
    is plain addition."""
    return (f"((({e}) % {1 << (64 - k)}) * {1 << k} "
            f"+ (({e}) // {1 << (64 - k)}))")


def fold32_sql(e: str) -> str:
    """``(e ^ (e >> 32)) & 0xFFFFFFFF`` — the engine's ``_fold32``."""
    return f"({xor64_sql(e, f'({e}) // {1 << 32}')}) % {1 << 32}"


def signed64_sql(e: str) -> str:
    """Reinterpret a [0, 2^64) HUGEINT as the engine's signed-int64
    view (sort keys compare in SIGNED order on the engine side)."""
    return (f"CAST(CASE WHEN ({e}) >= {1 << 63} THEN ({e}) - {1 << 64} "
            f"ELSE ({e}) END AS BIGINT)")


def fnv1a64_sql(tok_expr: str) -> str:
    """FNV-1a 64 of an ASCII VARCHAR expression, bit-identical to
    :func:`..functions.near_dup._fnv1a64_arr`: fold the codepoints
    (== UTF-8 bytes for the ``[a-z0-9]+`` token alphabet) through the
    xor-multiply round with ``list_reduce``."""
    lam = mul64_sql(xor64_sql("acc", "b"), FNV_PRIME)
    return (f"list_reduce(list_prepend(CAST({FNV_OFFSET} AS HUGEINT), "
            f"list_transform(string_split({tok_expr}, ''), "
            f"c -> CAST(ord(c) AS HUGEINT))), (acc, b) -> {lam})")
