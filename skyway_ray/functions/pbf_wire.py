"""Minimal protobuf wire-format codec (pure Python + numpy).

No protobuf library ships in this environment, so the OSM PBF
source/sink (io/osm_pbf.py) carries its own codec for the tiny message
subset the format needs.  Implements the public protobuf encoding
(developers.google.com/protocol-buffers/docs/encoding): varints,
zigzag, length-delimited fields, packed repeated scalars.

Decoding returns ``{field_number: [values...]}`` with bytes for
length-delimited fields — the caller interprets per the OSMPBF schema
(wiki.openstreetmap.org/wiki/PBF_Format).
"""

from __future__ import annotations

import numpy as np


def encode_varint(value: int) -> bytes:
    if value < 0:
        value += 1 << 64  # two's-complement 64-bit, per proto spec
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def zigzag_encode(value: int) -> int:
    return (value << 1) ^ (value >> 63)


def zigzag_decode(value: int) -> int:
    return (value >> 1) ^ -(value & 1)


def tag(field: int, wire_type: int) -> bytes:
    return encode_varint((field << 3) | wire_type)


def field_varint(field: int, value: int) -> bytes:
    return tag(field, 0) + encode_varint(value)


def field_bytes(field: int, data: bytes) -> bytes:
    return tag(field, 2) + encode_varint(len(data)) + data


def field_packed_varints(field: int, values, zigzag: bool = False) -> bytes:
    body = b"".join(
        encode_varint(zigzag_encode(int(v)) if zigzag else int(v))
        for v in values)
    return field_bytes(field, body)


def decode_message(data: bytes) -> dict[int, list]:
    """One pass over a message; values: ints (varint/fixed) or bytes."""
    fields: dict[int, list] = {}
    pos = 0
    n = len(data)
    while pos < n:
        key, pos = decode_varint(data, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:
            v, pos = decode_varint(data, pos)
        elif wt == 2:
            ln, pos = decode_varint(data, pos)
            v = data[pos:pos + ln]
            pos += ln
        elif wt == 5:
            v = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
        elif wt == 1:
            v = int.from_bytes(data[pos:pos + 8], "little")
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        fields.setdefault(field, []).append(v)
    return fields


def decode_packed_varints(data: bytes, zigzag: bool = False) -> np.ndarray:
    """Vectorized packed-varint decode: one numpy pass over the bytes
    (terminator bytes have the high bit clear; each value is the
    base-128 sum of its 7-bit groups).  Exact for full 64-bit values
    (``np.add.at`` on uint64 — no float round-trip)."""
    buf = np.frombuffer(data, dtype=np.uint8)
    n = len(buf)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    term = (buf & 0x80) == 0
    # values occupy contiguous byte ranges; group starts follow each
    # terminator, so a reduceat sums each group's 7-bit contributions
    starts = np.flatnonzero(np.concatenate([[True], term[:-1]]))
    counts = np.diff(np.append(starts, n))
    wpos = (np.arange(n, dtype=np.uint64)
            - np.repeat(starts.astype(np.uint64), counts))
    contrib = (buf & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * wpos)
    vals = np.add.reduceat(contrib, starts)
    if zigzag:
        out = (vals >> np.uint64(1)).view(np.int64)
        neg = (vals & np.uint64(1)).astype(bool)
        out = np.where(neg, -out - 1, out)
        return out.astype(np.int64)
    return vals.view(np.int64)
