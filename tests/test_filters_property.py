"""Property-based conformance: random OSMFilter programs must match the
row-at-a-time oracle on every row — mutation visibility, nesting,
COMMIT/DROP short-circuit included."""

import hypothesis.strategies as st
from hypothesis import given, settings

from skyway_ray.filters.ast import (
    Commit, Delete, Drop, Equals, Has, Keep, Rename, SelectionBlock, Set,
    TypeSelector,
)
from skyway_ray.filters.oracle import oracle_evaluate
from skyway_ray.filters.vector import CompiledFilter
from skyway_ray.fixtures import make_osm_elements

ELEMENTS = make_osm_elements(400)
_KEYS = ["highway", "surface", "oneway", "footway", "type", "route", "name",
         "graded", "zz_absent"]
_VALUES = ["residential", "footway", "asphalt", "yes", "route", "1", ""]

keys = st.sampled_from(_KEYS)
values = st.sampled_from(_VALUES)

selectors = st.one_of(
    st.builds(TypeSelector, node=st.booleans(), way=st.booleans(),
              relation=st.booleans()),
    st.builds(Has, key=keys),
    st.builds(Equals, key=keys, value=values),
)

leaf_statements = st.one_of(
    st.just(Commit()),
    st.just(Drop()),
    st.builds(Set, key=keys, value=values),
    st.builds(Rename, old_key=keys, new_key=keys),
    st.builds(Keep, keys=st.lists(keys, min_size=1, max_size=3).map(tuple)),
    st.builds(Delete, keys=st.lists(keys, min_size=1, max_size=3).map(tuple)),
)


def block(inner):
    return st.builds(
        lambda sel, stmts: SelectionBlock(selector=sel, statements=stmts),
        selectors, st.lists(inner, min_size=1, max_size=4))


statements = st.recursive(leaf_statements, block, max_leaves=12)
programs = st.lists(statements, min_size=1, max_size=6)


def _tags_of(table, i):
    lst = table["tags"][i].as_py()
    return {kv["key"]: kv["value"] for kv in (lst or [])}


@settings(max_examples=120, deadline=None)
@given(programs)
def test_random_program_matches_oracle(program):
    f = CompiledFilter(program)
    got = f.apply_table(ELEMENTS)

    types = ELEMENTS["type"].to_pylist()
    ids = ELEMENTS["id"].to_pylist()
    want_ids, want_tags = [], []
    for i in range(ELEMENTS.num_rows):
        el = {"type": types[i], "tags": _tags_of(ELEMENTS, i)}
        if oracle_evaluate(program, el):
            want_ids.append(ids[i])
            want_tags.append(el["tags"])

    assert got["id"].to_pylist() == want_ids
    assert [_tags_of(got, i) for i in range(got.num_rows)] == want_tags
