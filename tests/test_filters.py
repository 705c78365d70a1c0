"""OSMFilter conformance: parser + vectorized engine vs row-at-a-time oracle."""

import numpy as np
import pyarrow as pa
import pytest

from skyway_ray.filters import (
    CompiledFilter, FilterParseError, parse_osmfilter, oracle_evaluate,
)
from skyway_ray.filters.ast import (
    Commit, Drop, Equals, Has, Keep, Rename, SelectionBlock, Set, TypeSelector,
)
from skyway_ray.filters.tagarray import TagArray
from skyway_ray.fixtures import make_osm_elements

HEADER = "OSMFilter v0.2.0\n\n"

DOCS_FILTER = HEADER + (
    'TYPE way                                 # selects ways\n'
    '\tHAS "footway"                    # selects elements with a "footway" tag (any value)\n'
    '\t\tSET "surface" "concrete" # changes the value of the "surface" tag\n'
    '\t\tCOMMIT                   # immediately commit this element\n'
    'TYPE relation                            # selects relations\n'
    '\tEQUALS "type" "route"            # selects elements with "type"="route"\n'
    '\t\tDROP                     # exclude from output\n'
    'COMMIT                                   # commit the element\n'
)

# FIXTURES.md §4(b): matrix covering every statement & semantics corner
MATRIX = {
    "type_single": HEADER + 'TYPE node\n\tDROP\n',
    "type_multi": HEADER + 'TYPE way, relation\n\tCOMMIT\nDROP\n',
    "has": HEADER + 'HAS "highway"\n\tCOMMIT\nDROP\n',
    "equals": HEADER + 'EQUALS "surface" "asphalt"\n\tDROP\n',
    "set_then_equals_visibility": HEADER + (
        'TYPE way\n\tSET "graded" "yes"\n'
        'EQUALS "graded" "yes"\n\tSET "checked" "true"\n\tCOMMIT\n'
        'DROP\n'
    ),
    "rename_present_absent": HEADER + (
        'RENAME "highway" "road_kind"\nRENAME "no_such_key" "whatever"\n'
    ),
    "keep": HEADER + 'KEEP "name", "highway"\n',
    "delete_multi": HEADER + 'DELETE "surface", "oneway", "footway"\n',
    "nested_3_deep": HEADER + (
        'TYPE way, node\n'
        '\tHAS "highway"\n'
        '\t\tEQUALS "highway" "footway"\n'
        '\t\t\tSET "pedestrian" "yes"\n'
        '\t\t\tCOMMIT\n'
        '\t\tDELETE "oneway"\n'
        '\tDROP\n'
    ),
    "commit_short_circuit": HEADER + (
        'HAS "name"\n\tCOMMIT\nSET "unnamed" "yes"\n'
    ),
    "fall_through_keep": HEADER + 'TYPE relation\n\tSET "seen" "1"\n',
    "rename_overwrites_existing": HEADER + (
        'TYPE way\n\tRENAME "highway" "surface"\n'
    ),
    "docs": DOCS_FILTER,
}


def _tags_of(table, i):
    lst = table["tags"][i].as_py()
    return {kv["key"]: kv["value"] for kv in (lst or [])}


@pytest.fixture(scope="module")
def elements():
    return make_osm_elements(3000)


class TestParser:
    def test_docs_filter_shape(self):
        prog = parse_osmfilter(DOCS_FILTER)
        assert len(prog) == 3
        assert isinstance(prog[0], SelectionBlock)
        assert prog[0].selector == TypeSelector(way=True)
        inner = prog[0].statements[0]
        assert inner.selector == Has("footway")
        assert inner.statements == [Set("surface", "concrete"), Commit()]
        assert prog[1].statements[0].selector == Equals("type", "route")
        assert prog[1].statements[0].statements == [Drop()]
        assert prog[2] == Commit()

    def test_version_mismatch_warns(self):
        with pytest.warns(UserWarning):
            parse_osmfilter("OSMFilter v0.1.0\n\nCOMMIT\n")

    def test_missing_header(self):
        with pytest.raises(FilterParseError):
            parse_osmfilter('COMMIT\n')

    def test_selector_without_block(self):
        with pytest.raises(FilterParseError):
            parse_osmfilter(HEADER + 'TYPE way\nCOMMIT\n')

    def test_escapes(self):
        # escape FORMS are validated but kept literal — the reference's
        # get_inner_string (parse.rs:13-15) returns the raw span
        prog = parse_osmfilter(HEADER + 'SET "a\\"b" "c\\u00e9\\n"\n')
        assert prog == [Set('a\\"b', "c\\u00e9\\n")]

    def test_bad_escape_rejected(self):
        with pytest.raises(FilterParseError):
            parse_osmfilter(HEADER + 'HAS "a\\xb"\n')
        with pytest.raises(FilterParseError):
            parse_osmfilter(HEADER + 'HAS "a\\uZZZZ"\n')

    def test_keep_list(self):
        prog = parse_osmfilter(HEADER + 'KEEP "a", "b", "c"\n')
        assert prog == [Keep(("a", "b", "c"))]

    def test_comment_only_and_blank_lines(self):
        prog = parse_osmfilter(HEADER + "# just a comment\n\nCOMMIT\n")
        assert prog == [Commit()]


class TestVectorVsOracle:
    @pytest.mark.parametrize("name", sorted(MATRIX))
    def test_matrix(self, name, elements):
        src = MATRIX[name]
        prog = parse_osmfilter(src)
        f = CompiledFilter(prog)
        got = f.apply_table(elements)

        # oracle pass
        types = elements["type"].to_pylist()
        ids = elements["id"].to_pylist()
        want_rows = []
        for i in range(elements.num_rows):
            el = {"type": types[i], "tags": _tags_of(elements, i)}
            if oracle_evaluate(prog, el):
                want_rows.append((ids[i], el["tags"]))

        got_ids = got["id"].to_pylist()
        got_tags = [_tags_of(got, i) for i in range(got.num_rows)]
        assert got_ids == [r[0] for r in want_rows], f"row set mismatch for {name}"
        assert got_tags == [r[1] for r in want_rows], f"tag mutation mismatch for {name}"

    def test_docs_filter_nontrivial(self, elements):
        f = CompiledFilter(parse_osmfilter(DOCS_FILTER))
        got = f.apply_table(elements)
        # drops relations with type=route, keeps everything else
        assert 0 < got.num_rows < elements.num_rows
        # surviving footway-tagged ways got surface=concrete
        found = 0
        for i in range(got.num_rows):
            t = _tags_of(got, i)
            if got["type"][i].as_py() == "way" and "footway" in t:
                assert t["surface"] == "concrete"
                found += 1
        assert found > 0


class TestTagArray:
    def test_roundtrip(self):
        dicts = [{"a": "1"}, {}, {"b": "2", "c": "3"}, {}]
        ta = TagArray.from_dicts(dicts)
        assert ta.to_dicts() == dicts

    def test_arrow_roundtrip_with_nulls(self):
        from skyway_ray.schemas import TAGS_TYPE
        arr = pa.array([[{"key": "a", "value": "1"}], None, []], type=TAGS_TYPE)
        ta = TagArray.from_arrow(arr, 3)
        assert ta.to_dicts() == [{"a": "1"}, {}, {}]

    def test_masked_set_upsert(self):
        ta = TagArray.from_dicts([{"k": "old"}, {}, {"k": "old"}])
        ta.set(np.array([True, True, False]), "k", "new")
        assert ta.to_dicts() == [{"k": "new"}, {"k": "new"}, {"k": "old"}]

    def test_rename_clobbers_target(self):
        ta = TagArray.from_dicts([{"a": "1", "b": "x"}, {"b": "y"}])
        ta.rename(np.array([True, True]), "a", "b")
        assert ta.to_dicts() == [{"b": "1"}, {"b": "y"}]
