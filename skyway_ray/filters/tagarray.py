"""Vectorized tag multimap with per-row dict semantics.

The reference stores tags as ``HashMap<String, String>`` per element and
mutates it statement by statement (``logic.rs:74-93``).  This class is
the batch equivalent: one flattened (row, key, value) triple store for a
whole Arrow batch, with every operation (has / get / set / rename /
keep / delete) a masked, vectorized pass — no per-row Python in the hot
path.  Invariants: entries sorted by row (stable), at most one entry per
(row, key).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..schemas import TAGS_TYPE


class TagArray:
    __slots__ = ("n", "row", "keys", "vals")

    def __init__(self, n: int, row: np.ndarray, keys: np.ndarray, vals: np.ndarray):
        self.n = n
        self.row = row
        self.keys = keys
        self.vals = vals

    # ---------- construction ----------

    @classmethod
    def from_arrow(cls, tags_col: pa.ChunkedArray | pa.Array, n: int | None = None) -> "TagArray":
        if isinstance(tags_col, pa.ChunkedArray):
            tags_col = tags_col.combine_chunks()
        if n is None:
            n = len(tags_col)
        import pyarrow.compute as pc

        # list_flatten skips null lists; list_value_length is null there
        lengths = pc.fill_null(pc.list_value_length(tags_col), 0)
        lengths = lengths.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(tags_col)  # struct<key,value> of valid entries
        row = np.repeat(np.arange(n, dtype=np.int64), lengths)
        keys = np.asarray(flat.field("key").to_pylist(), dtype=object)
        vals = np.asarray(flat.field("value").to_pylist(), dtype=object)
        return cls(n, row, keys, vals)

    @classmethod
    def from_dicts(cls, dicts) -> "TagArray":
        n = len(dicts)
        rows, keys, vals = [], [], []
        for i, d in enumerate(dicts):
            for k, v in (d or {}).items():
                rows.append(i)
                keys.append(k)
                vals.append(v)
        return cls(n, np.asarray(rows, dtype=np.int64),
                   np.asarray(keys, dtype=object), np.asarray(vals, dtype=object))

    # ---------- predicates ----------

    def has(self, key: str) -> np.ndarray:
        m = self.keys == key
        out = np.zeros(self.n, dtype=bool)
        if m.any():
            out[self.row[m]] = True
        return out

    def get(self, key: str) -> np.ndarray:
        out = np.full(self.n, None, dtype=object)
        m = self.keys == key
        if m.any():
            out[self.row[m]] = self.vals[m]
        return out

    def equals(self, key: str, value: str) -> np.ndarray:
        m = (self.keys == key) & (self.vals == value)
        out = np.zeros(self.n, dtype=bool)
        if m.any():
            out[self.row[m]] = True
        return out

    # ---------- mutations (masked) ----------

    def _drop_entries(self, entry_mask: np.ndarray) -> None:
        if entry_mask.any():
            keep = ~entry_mask
            self.row = self.row[keep]
            self.keys = self.keys[keep]
            self.vals = self.vals[keep]

    def _append(self, rows: np.ndarray, key_or_keys, vals) -> None:
        if len(rows) == 0:
            return
        if isinstance(key_or_keys, str):
            new_keys = np.full(len(rows), key_or_keys, dtype=object)
        else:
            new_keys = np.asarray(key_or_keys, dtype=object)
        if isinstance(vals, str):
            new_vals = np.full(len(rows), vals, dtype=object)
        else:
            new_vals = np.asarray(vals, dtype=object)
        self.row = np.concatenate([self.row, rows])
        self.keys = np.concatenate([self.keys, new_keys])
        self.vals = np.concatenate([self.vals, new_vals])
        order = np.argsort(self.row, kind="stable")
        self.row = self.row[order]
        self.keys = self.keys[order]
        self.vals = self.vals[order]

    def set(self, mask: np.ndarray, key: str, value: str) -> None:
        """Upsert ``key=value`` on masked rows (logic.rs:84-87)."""
        self._drop_entries((self.keys == key) & mask[self.row])
        self._append(np.flatnonzero(mask).astype(np.int64), key, value)

    def rename(self, mask: np.ndarray, old_key: str, new_key: str) -> None:
        """Move value old→new iff old exists (logic.rs:88-93)."""
        old_vals = self.get(old_key)
        eligible = mask & np.array([v is not None for v in old_vals], dtype=bool)
        if not eligible.any():
            return
        in_rows = eligible[self.row]
        self._drop_entries(((self.keys == old_key) | (self.keys == new_key)) & in_rows)
        rows = np.flatnonzero(eligible).astype(np.int64)
        self._append(rows, new_key, old_vals[rows])

    def keep(self, mask: np.ndarray, keys: tuple[str, ...]) -> None:
        """Retain only listed keys on masked rows (logic.rs:80-83)."""
        listed = np.zeros(len(self.keys), dtype=bool)
        for k in keys:
            listed |= self.keys == k
        self._drop_entries(~listed & mask[self.row])

    def delete(self, mask: np.ndarray, keys: tuple[str, ...]) -> None:
        """Remove listed keys on masked rows (logic.rs:74-79)."""
        listed = np.zeros(len(self.keys), dtype=bool)
        for k in keys:
            listed |= self.keys == k
        self._drop_entries(listed & mask[self.row])

    # ---------- output ----------

    def to_arrow(self) -> pa.Array:
        counts = np.bincount(self.row, minlength=self.n) if len(self.row) else np.zeros(self.n, np.int64)
        offsets = np.zeros(self.n + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:])
        struct = pa.StructArray.from_arrays(
            [pa.array(self.keys, pa.string()), pa.array(self.vals, pa.string())],
            names=["key", "value"],
        )
        return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)

    def to_dicts(self) -> list[dict[str, str]]:
        out = [dict() for _ in range(self.n)]
        for r, k, v in zip(self.row, self.keys, self.vals):
            out[r][k] = v
        return out

    def take(self, indices: np.ndarray) -> "TagArray":
        """New TagArray for a row subset (for building output batches)."""
        indices = np.asarray(indices, dtype=np.int64)
        remap = np.full(self.n, -1, dtype=np.int64)
        remap[indices] = np.arange(len(indices))
        m = remap[self.row] >= 0
        return TagArray(len(indices), remap[self.row[m]], self.keys[m], self.vals[m])
