"""Pure-Python row-at-a-time OSMFilter oracle.

A direct transliteration of the reference evaluator
(``/root/reference/src/filter/osmfilter/logic.rs:20-127``) used only to
produce golden outputs for tests — the vectorized engine in
``vector.py`` must match this row for row.
"""

from __future__ import annotations

from .ast import (
    Commit, Delete, Drop, Equals, Has, Keep, Rename, SelectionBlock, Set,
    TypeSelector,
)

_CONTINUE, _COMMIT_R, _DROP_R = 0, 1, 2


def _test_selector(sel, element: dict) -> bool:
    if isinstance(sel, TypeSelector):
        t = element.get("type")
        if t == "node":
            return sel.node
        if t == "way":
            return sel.way
        if t == "relation":
            return sel.relation
        return False
    tags = element["tags"]
    if isinstance(sel, Has):
        return sel.key in tags
    if isinstance(sel, Equals):
        return tags.get(sel.key) == sel.value
    raise TypeError(sel)


def _evaluate_statement(st, element: dict) -> int:
    if isinstance(st, Commit):
        return _COMMIT_R
    if isinstance(st, Drop):
        return _DROP_R
    tags = element["tags"]
    if isinstance(st, Delete):
        for k in st.keys:
            tags.pop(k, None)
        return _CONTINUE
    if isinstance(st, Keep):
        for k in list(tags):
            if k not in st.keys:
                del tags[k]
        return _CONTINUE
    if isinstance(st, Set):
        tags[st.key] = st.value
        return _CONTINUE
    if isinstance(st, Rename):
        if st.old_key in tags:
            tags[st.new_key] = tags.pop(st.old_key)
        return _CONTINUE
    if isinstance(st, SelectionBlock):
        if _test_selector(st.selector, element):
            for sub in st.statements:
                result = _evaluate_statement(sub, element)
                if result != _CONTINUE:
                    return result
        return _CONTINUE
    raise TypeError(st)


def oracle_evaluate(statements, element: dict) -> bool:
    """Evaluate one element (dict with 'type' and mutable 'tags' dict).
    Returns keep/drop; mutates element['tags'] in place — exactly
    ``OsmFilter::evaluate`` (logic.rs:116-127)."""
    for st in statements:
        result = _evaluate_statement(st, element)
        if result == _COMMIT_R:
            return True
        if result == _DROP_R:
            return False
    return True
