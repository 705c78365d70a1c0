"""Vectorized tag multimap with per-row dict semantics — Arrow-backed.

The reference stores tags as ``HashMap<String, String>`` per element and
mutates it statement by statement (``logic.rs:74-93``).  This class is
the batch equivalent: one flattened (row, key, value) triple store for a
whole Arrow batch, with every operation (has / get / set / rename /
keep / delete) a masked, vectorized pass.

Keys/values stay **Arrow string arrays** end to end — predicates run as
``pyarrow.compute`` kernels and output needs no re-conversion; Python
string objects materialize only for the (few) rows a RENAME actually
moves.  Invariants: entries sorted by row (stable), at most one entry
per (row, key).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schemas import TAGS_TYPE


def _eq_mask(arr: pa.Array, value: str) -> np.ndarray:
    if len(arr) == 0:
        return np.zeros(0, dtype=bool)
    return pc.equal(arr, pa.scalar(value)).fill_null(False).to_numpy(
        zero_copy_only=False)


class TagArray:
    __slots__ = ("n", "row", "keys", "vals")

    def __init__(self, n: int, row: np.ndarray, keys: pa.Array, vals: pa.Array):
        self.n = n
        self.row = row
        self.keys = keys if isinstance(keys, pa.Array) else pa.array(keys, pa.string())
        self.vals = vals if isinstance(vals, pa.Array) else pa.array(vals, pa.string())

    # ---------- construction ----------

    @classmethod
    def from_arrow(cls, tags_col, n: int | None = None) -> "TagArray":
        if isinstance(tags_col, pa.ChunkedArray):
            tags_col = tags_col.combine_chunks()
        if n is None:
            n = len(tags_col)
        # list_flatten skips null lists; list_value_length is null there
        lengths = pc.fill_null(pc.list_value_length(tags_col), 0)
        lengths = lengths.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(tags_col)  # struct<key,value> of valid entries
        row = np.repeat(np.arange(n, dtype=np.int64), lengths)
        keys = flat.field("key")
        vals = flat.field("value")
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
            vals = vals.combine_chunks()
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
                   pa.array(keys, pa.string()), pa.array(vals, pa.string()))

    # ---------- predicates ----------

    def has(self, key: str) -> np.ndarray:
        m = _eq_mask(self.keys, key)
        out = np.zeros(self.n, dtype=bool)
        if m.any():
            out[self.row[m]] = True
        return out

    def get(self, key: str) -> np.ndarray:
        """Per-row value (object array, None where absent)."""
        out = np.full(self.n, None, dtype=object)
        m = _eq_mask(self.keys, key)
        if m.any():
            idx = np.flatnonzero(m)
            vals = self.vals.take(pa.array(idx)).to_pylist()
            out[self.row[idx]] = vals
        return out

    def equals(self, key: str, value: str) -> np.ndarray:
        m = _eq_mask(self.keys, key) & _eq_mask(self.vals, value)
        out = np.zeros(self.n, dtype=bool)
        if m.any():
            out[self.row[m]] = True
        return out

    # ---------- mutations (masked) ----------

    def _filter_entries(self, keep: np.ndarray) -> None:
        if not keep.all():
            keep_pa = pa.array(keep)
            self.row = self.row[keep]
            self.keys = self.keys.filter(keep_pa)
            self.vals = self.vals.filter(keep_pa)

    def _append(self, rows: np.ndarray, keys, vals) -> None:
        if len(rows) == 0:
            return
        if isinstance(keys, str):
            keys = pa.array([keys] * len(rows), pa.string())
        elif not isinstance(keys, pa.Array):
            keys = pa.array(list(keys), pa.string())
        if isinstance(vals, str):
            vals = pa.array([vals] * len(rows), pa.string())
        elif not isinstance(vals, pa.Array):
            vals = pa.array(list(vals), pa.string())
        self.row = np.concatenate([self.row, rows])
        self.keys = pa.concat_arrays([self.keys.cast(pa.string()),
                                      keys.cast(pa.string())])
        self.vals = pa.concat_arrays([self.vals.cast(pa.string()),
                                      vals.cast(pa.string())])
        order = np.argsort(self.row, kind="stable")
        if not (order == np.arange(len(order))).all():
            self.row = self.row[order]
            take = pa.array(order)
            self.keys = self.keys.take(take)
            self.vals = self.vals.take(take)

    def set(self, mask: np.ndarray, key: str, value: str) -> None:
        """Upsert ``key=value`` on masked rows (logic.rs:84-87)."""
        self._filter_entries(~(_eq_mask(self.keys, key) & mask[self.row]))
        self._append(np.flatnonzero(mask).astype(np.int64), key, value)

    def rename(self, mask: np.ndarray, old_key: str, new_key: str) -> None:
        """Move value old→new iff old exists (logic.rs:88-93)."""
        old_vals = self.get(old_key)
        eligible = mask & (old_vals != None)  # noqa: E711 (elementwise)
        if not eligible.any():
            return
        in_rows = eligible[self.row]
        drop = (_eq_mask(self.keys, old_key) | _eq_mask(self.keys, new_key)) \
            & in_rows
        self._filter_entries(~drop)
        rows = np.flatnonzero(eligible).astype(np.int64)
        self._append(rows, new_key, [old_vals[r] for r in rows])

    def _listed_mask(self, keys: tuple[str, ...]) -> np.ndarray:
        if len(self.keys) == 0:
            return np.zeros(0, dtype=bool)
        return pc.is_in(self.keys, value_set=pa.array(list(keys), pa.string())
                        ).fill_null(False).to_numpy(zero_copy_only=False)

    def keep(self, mask: np.ndarray, keys: tuple[str, ...]) -> None:
        """Retain only listed keys on masked rows (logic.rs:80-83)."""
        self._filter_entries(~(~self._listed_mask(keys) & mask[self.row]))

    def delete(self, mask: np.ndarray, keys: tuple[str, ...]) -> None:
        """Remove listed keys on masked rows (logic.rs:74-79)."""
        self._filter_entries(~(self._listed_mask(keys) & mask[self.row]))

    # ---------- output ----------

    def to_arrow(self) -> pa.Array:
        counts = np.bincount(self.row, minlength=self.n) if len(self.row) \
            else np.zeros(self.n, np.int64)
        offsets = np.zeros(self.n + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:])
        struct = pa.StructArray.from_arrays(
            [self.keys.cast(pa.string()), self.vals.cast(pa.string())],
            names=["key", "value"])
        return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)

    def to_dicts(self) -> list[dict[str, str]]:
        out = [dict() for _ in range(self.n)]
        ks = self.keys.to_pylist()
        vs = self.vals.to_pylist()
        for r, k, v in zip(self.row, ks, vs):
            out[r][k] = v
        return out

    def take(self, indices: np.ndarray) -> "TagArray":
        """New TagArray for a row subset (for building output batches)."""
        indices = np.asarray(indices, dtype=np.int64)
        remap = np.full(self.n, -1, dtype=np.int64)
        remap[indices] = np.arange(len(indices))
        m = remap[self.row] >= 0
        m_pa = pa.array(m)
        return TagArray(len(indices), remap[self.row[m]],
                        self.keys.filter(m_pa), self.vals.filter(m_pa))
