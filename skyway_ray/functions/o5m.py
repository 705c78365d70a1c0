"""o5m binary-format kernels: unsigned varint, zero-delimited strings,
the 15,000-entry MRU string reference table — plus the global
sort-by-(type, id) the o5m layout requires.

The reference's o5m writer is incomplete and never dispatched
(``/root/reference/src/writers/o5m.rs`` — ``convert_f64`` is
``unimplemented!``, the format isn't in ``OutputFileFormat``), so this
module ports the *finished* pieces with their unit vectors
(``o5m.rs:226-291``) and documents the stateful-encoder /
ordered-stream pattern they imply for a distributed engine: the string
table is order-sensitive per output stream, so a distributed o5m sink
would be one encoder actor per output partition fed by a
``sort(["type_rank", "id"])`` range shuffle.
"""

from __future__ import annotations

import numpy as np


def convert_number(value: int) -> bytes:
    """Unsigned o5m varint: little-endian 7-bit groups, high bit =
    continuation (``o5m.rs:30-62``; vectors ``o5m.rs:244-261``)."""
    if value < 0:
        raise ValueError("convert_number takes unsigned values")
    if value == 0:
        return b""  # reference emits nothing for an all-zero bitvec
    out = bytearray()
    while value:
        b = value & 0x7F
        value >>= 7
        out.append(b | (0x80 if value else 0x00))
    return bytes(out)


def convert_tag(key: str, value: str) -> bytes:
    """Zero-delimited key/value pair (``o5m.rs:16-24``)."""
    return b"\x00" + key.encode() + b"\x00" + value.encode() + b"\x00"


def convert_string(s: str) -> bytes:
    return b"\x00" + s.encode() + b"\x00"


def convert_user(uid: int, username: str) -> bytes:
    """uid varint + username, zero-delimited (``o5m.rs:71-79``)."""
    return b"\x00" + convert_number(uid) + b"\x00" + username.encode() + b"\x00"


class StringTable:
    """MRU reference table (``o5m.rs:88-122``): a repeated byte string
    is replaced by its 1-based table index (as varint); misses insert
    at the front and truncate to ``capacity`` (15,000 in the
    reference).  Order-sensitive — one instance per output stream."""

    def __init__(self, capacity: int = 15_000):
        self.capacity = capacity
        # O(1) equivalent of the front-insert list: entries carry the
        # sequence number of their (latest) insertion; the 1-based
        # front index of an entry is n_inserts - seq, and anything
        # deeper than capacity counts as evicted.  (The list form paid
        # an O(capacity) list.index scan + O(capacity) front-insert
        # memmove per string — the o5m writer hotspot.)
        self._seq_of: dict[bytes, int] = {}
        self._n = 0

    def hit_cache(self, data: bytes) -> bytes:
        s = self._seq_of.get(data)
        if s is not None:
            dist = self._n - s
            if dist <= self.capacity:
                return convert_number(dist)
        self._seq_of[data] = self._n
        self._n += 1
        if len(self._seq_of) > 4 * self.capacity:  # prune dead entries
            cut = self._n - self.capacity
            self._seq_of = {k: v for k, v in self._seq_of.items()
                            if v >= cut}
        return data


_TYPE_RANK = {"node": 0, "way": 1, "relation": 2}


def sort_elements_for_o5m(ds):
    """The one global sort in the reference's operator set: o5m layout
    requires nodes → ways → relations, ids ascending within each type
    (``o5m.rs:155-204``).  A range-partitioned ``Dataset.sort`` — each
    output block is then a contiguous (type, id) range suitable for one
    encoder actor."""
    import pyarrow as pa

    def add_rank(batch: pa.Table) -> pa.Table:
        types = batch["type"].to_pylist()
        rank = np.fromiter((_TYPE_RANK[t] for t in types), dtype=np.int8,
                           count=len(types))
        return batch.append_column("type_rank", pa.array(rank, pa.int8()))

    return ds.map_batches(add_rank, batch_format="pyarrow").sort(
        ["type_rank", "id"])
