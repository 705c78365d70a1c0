"""Vectorized OSMFilter execution over Arrow batches.

Semantics contract (``/root/reference/src/filter/osmfilter/logic.rs:70-127``):

* statements run top-to-bottom, **mutating tags as they go** — later
  selectors observe earlier mutations;
* ``COMMIT`` / ``DROP`` decide a row immediately and skip the rest of
  the whole filter for that row (propagating out of nested blocks);
* a row neither committed nor dropped when statements are exhausted is
  **kept** (logic.rs:125).

The vectorized equivalent: ops apply in statement order to the whole
batch, masked per row by (parent-selector masks ∧ still-undecided).
An int8 ``decided`` array (0 undecided / 1 committed / 2 dropped)
implements the short-circuit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ast import (
    Commit, Delete, Drop, Equals, Has, Keep, Rename, SelectionBlock, Set,
    TypeSelector,
)
from .osmfilter import parse_osmfilter
from .tagarray import TagArray

_UNDECIDED, _COMMIT, _DROP = 0, 1, 2


class CompiledFilter:
    """A parsed OSMFilter program, applied batch-at-a-time.

    Use as ``ds.map_batches(f.apply_table, batch_format="pyarrow")`` —
    the object is picklable (pure-python AST) so Ray ships it via
    closure capture, mirroring the reference's compiled-filter-per-
    thread model (``src/main.rs:150-171``).
    """

    def __init__(self, statements, tags_column: str = "tags",
                 type_column: str = "type"):
        self.statements = statements
        self.tags_column = tags_column
        self.type_column = type_column

    @classmethod
    def from_source(cls, source: str, **kw) -> "CompiledFilter":
        return cls(parse_osmfilter(source), **kw)

    # -- core evaluation --------------------------------------------------

    def evaluate(self, tags: TagArray, types: np.ndarray | None):
        """Run the program. Mutates ``tags`` in place; returns the keep
        mask (committed ∪ undecided)."""
        n = tags.n
        decided = np.zeros(n, dtype=np.int8)
        self._run(self.statements, np.ones(n, dtype=bool), decided, tags, types)
        return decided != _DROP

    def _selector_mask(self, sel, tags: TagArray, types) -> np.ndarray:
        if isinstance(sel, TypeSelector):
            if types is None:
                return np.zeros(tags.n, dtype=bool)
            import pyarrow.compute as pc

            m = np.zeros(tags.n, dtype=bool)
            for flag, name in ((sel.node, "node"), (sel.way, "way"),
                               (sel.relation, "relation")):
                if flag:
                    m |= pc.equal(types, name).fill_null(False).to_numpy(
                        zero_copy_only=False)
            return m
        if isinstance(sel, Has):
            return tags.has(sel.key)
        if isinstance(sel, Equals):
            return tags.equals(sel.key, sel.value)
        raise TypeError(f"unknown selector {sel!r}")

    def _run(self, statements, active: np.ndarray, decided: np.ndarray,
             tags: TagArray, types) -> None:
        for st in statements:
            live = active & (decided == _UNDECIDED)
            if not live.any():
                return
            if isinstance(st, Commit):
                decided[live] = _COMMIT
            elif isinstance(st, Drop):
                decided[live] = _DROP
            elif isinstance(st, Set):
                tags.set(live, st.key, st.value)
            elif isinstance(st, Rename):
                tags.rename(live, st.old_key, st.new_key)
            elif isinstance(st, Keep):
                tags.keep(live, st.keys)
            elif isinstance(st, Delete):
                tags.delete(live, st.keys)
            elif isinstance(st, SelectionBlock):
                m = self._selector_mask(st.selector, tags, types)
                self._run(st.statements, live & m, decided, tags, types)
            else:
                raise TypeError(f"unknown statement {st!r}")

    # -- Arrow batch adapter ----------------------------------------------

    def apply_table(self, table: pa.Table) -> pa.Table:
        """Filter + transform one Arrow batch: drops rows, rewrites the
        tags column, passes all other columns through untouched."""
        n = table.num_rows
        if n == 0:
            return table
        if self.tags_column in table.column_names:
            tags = TagArray.from_arrow(table[self.tags_column], n)
        else:
            # tagless table: selectors on tags match nothing, mutations
            # create a tags column (HAS/EQUALS false, SET adds)
            tags = TagArray.from_dicts([{}] * n)
        types = None
        if self.type_column in table.column_names:
            types = table[self.type_column]
            if isinstance(types, pa.ChunkedArray):
                types = types.combine_chunks()
        keep = self.evaluate(tags, types)
        idx = np.flatnonzero(keep)
        out = table.take(pa.array(idx, pa.int64()))
        new_tags = tags.take(idx).to_arrow()
        if self.tags_column in out.column_names:
            col_idx = out.column_names.index(self.tags_column)
            return out.set_column(col_idx, self.tags_column, new_tags)
        return out.append_column(self.tags_column, new_tags)
