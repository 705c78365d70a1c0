import warnings

import numpy as np
import pytest

from skyway_ray.filters.cel import CelFilter, create_filter
from skyway_ray.filters.vector import CompiledFilter
from skyway_ray.fixtures import make_osm_elements


@pytest.fixture(scope="module")
def elements():
    return make_osm_elements(2000)


def _tags_of(table, i):
    lst = table["tags"][i].as_py()
    return {kv["key"]: kv["value"] for kv in (lst or [])}


def _oracle(table, fn):
    """Row-at-a-time CEL oracle: fn(row_ctx) -> bool, raising = dropped."""
    keep = []
    for i in range(table.num_rows):
        ctx = {
            "tags": _tags_of(table, i),
            "type": table["type"][i].as_py(),
            "id": table["id"][i].as_py(),
            "uid": table["uid"][i].as_py(),
            "user": table["user"][i].as_py(),
            "changeset": table["changeset"][i].as_py(),
            "timestamp": table["timestamp"][i].as_py(),
            "visible": table["visible"][i].as_py(),
        }
        try:
            r = fn(ctx)
            keep.append(bool(r) if isinstance(r, bool) else False)
        except Exception:
            keep.append(False)
    return keep


CASES = [
    ('type == "node"', lambda c: c["type"] == "node"),
    ('type == "way" || type == "relation"', lambda c: c["type"] in ("way", "relation")),
    ('"highway" in tags', lambda c: "highway" in c["tags"]),
    ('tags["highway"] == "footway"',
     lambda c: (_ for _ in ()).throw(KeyError()) if "highway" not in c["tags"]
     else c["tags"]["highway"] == "footway"),
    ('id < 500', lambda c: c["id"] < 500),
    ('uid >= 500', lambda c: (_ for _ in ()).throw(KeyError()) if c["uid"] is None
     else c["uid"] >= 500),
    ('visible == true', lambda c: (_ for _ in ()).throw(KeyError()) if c["visible"] is None
     else c["visible"] is True),
    ('has(tags.name) && type != "relation"',
     lambda c: "name" in c["tags"] and c["type"] != "relation"),
    ('tags["name"].startsWith("Main")',
     lambda c: (_ for _ in ()).throw(KeyError()) if "name" not in c["tags"]
     else c["tags"]["name"].startswith("Main")),
    ('user.contains("ob")', lambda c: (_ for _ in ()).throw(KeyError()) if c["user"] is None
     else "ob" in c["user"]),
    ('!("surface" in tags)', lambda c: "surface" not in c["tags"]),
    ('size(tags) > 2', lambda c: len(c["tags"]) > 2),
    ('timestamp.matches("2024-01-0[1-5]")',
     lambda c: (_ for _ in ()).throw(KeyError()) if c["timestamp"] is None
     else __import__("re").search("2024-01-0[1-5]", c["timestamp"]) is not None),
    # --- arithmetic (CEL: trunc int division, C-style %, no int/double mix)
    ('id * 2 > 1000', lambda c: c["id"] * 2 > 1000),
    ('id % 7 == 3', lambda c: c["id"] % 7 == 3),
    ('id / 3 >= 200', lambda c: c["id"] // 3 >= 200),
    ('(id - 3) * 2 >= 10', lambda c: (c["id"] - 3) * 2 >= 10),
    ('changeset + 1 > 900000', lambda c: (_ for _ in ()).throw(KeyError())
     if c["changeset"] is None else c["changeset"] + 1 > 900000),
    ('-id < -500', lambda c: -c["id"] < -500),
    ('size(user) * 2 >= 6', lambda c: (_ for _ in ()).throw(KeyError())
     if c["user"] is None else len(c["user"]) * 2 >= 6),
    # int op double is a CEL type error -> every row drops
    ('id * 1.0 > 500.0', lambda c: (_ for _ in ()).throw(TypeError())),
    # --- floats
    ('1.5 < 2.5', lambda c: True),
    # cross-type numeric ORDER comparison is allowed (cel-spec
    # heterogeneous numeric comparisons) — only arithmetic mixing errors
    ('id < 1e3', lambda c: c["id"] < 1000.0),
    # --- ternary (lazy: untaken branch errors don't propagate)
    ('type == "node" ? id < 500 : id >= 500',
     lambda c: c["id"] < 500 if c["type"] == "node" else c["id"] >= 500),
    ('has(tags.name) ? tags["name"].startsWith("Main") : false',
     lambda c: c["tags"]["name"].startswith("Main")
     if "name" in c["tags"] else False),
    # --- list literals + in
    ('type in ["node", "way"]', lambda c: c["type"] in ("node", "way")),
    ('id in [1, 2, 3, 500]', lambda c: c["id"] in (1, 2, 3, 500)),
    # --- per-row map-key in (key is not a constant)
    ('user in tags', lambda c: (_ for _ in ()).throw(KeyError())
     if c["user"] is None else c["user"] in c["tags"]),
    # --- string concat
    ('user + "!" == "bob!"', lambda c: (_ for _ in ()).throw(KeyError())
     if c["user"] is None else c["user"] + "!" == "bob!"),
    # cross-type bool equality is a type-mismatch error (drops the
    # row), never Python's True == 1
    ('visible == 1', lambda c: (_ for _ in ()).throw(TypeError())),
    ('id != true', lambda c: (_ for _ in ()).throw(TypeError())),
    ('visible != false', lambda c: (_ for _ in ()).throw(KeyError())
     if c["visible"] is None else c["visible"] is not False),
]


class TestCel:
    @pytest.mark.parametrize("src,fn", CASES, ids=[c[0] for c in CASES])
    def test_vs_oracle(self, src, fn, elements):
        f = CelFilter(src)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            got = f.apply_table(elements)
        want_ids = [elements["id"][i].as_py()
                    for i, k in enumerate(_oracle(elements, fn)) if k]
        assert got["id"].to_pylist() == want_ids, src

    def test_runtime_error_warns_and_drops(self, elements):
        # indexing a key many rows lack -> those rows dropped with warning
        f = CelFilter('tags["no_such_key"] == "x"')
        with pytest.warns(UserWarning):
            got = f.apply_table(elements)
        assert got.num_rows == 0

    def test_unknown_identifier_drops_all_rows(self, elements):
        """cel-interpreter compiles unknown identifiers fine; they err
        at EXECUTION, and the reference skips the element with a
        warning (src/filter/cel/mod.rs:49-53) — so the filter yields
        zero rows instead of aborting the pipeline."""
        f = CelFilter("garbage")
        with pytest.warns(UserWarning):
            got = f.apply_table(elements)
        assert got.num_rows == 0
        # ...and inside a disjunction CEL's commutative short-circuit
        # absorbs it: error || true == true, false || error == error
        # (row drops) — nodes survive, everything else drops
        f2 = CelFilter('no_such_field == 1 || type == "node"')
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            got2 = f2.apply_table(elements)
        want = [elements["id"][i].as_py() for i in range(elements.num_rows)
                if elements["type"][i].as_py() == "node"]
        assert got2["id"].to_pylist() == want

    def test_dispatch_osmfilter_first(self):
        f = create_filter("OSMFilter v0.2.0\n\nCOMMIT\n")
        assert isinstance(f, CompiledFilter)
        f2 = create_filter('type == "node"')
        assert isinstance(f2, CelFilter)
        with pytest.raises(ValueError):
            create_filter("@@@ not a filter @@@")


class TestCelArithmeticFuzz:
    """Random arithmetic/comparison expression trees vs a Python
    oracle implementing CEL semantics (truncated int division, C-style
    modulo, error on div-by-zero) — guards operator precedence and the
    vectorized fast paths."""

    def _gen(self, rng, depth):
        if depth == 0 or rng.random() < 0.3:
            if rng.random() < 0.5:
                return "id", lambda c: c["id"]
            v = int(rng.integers(-20, 21))
            if v >= 0:
                return str(v), lambda c, v=v: v
            return f"({v})", lambda c, v=v: v
        op = rng.choice(["+", "-", "*", "/", "%"])
        ls, lf = self._gen(rng, depth - 1)
        rs, rf = self._gen(rng, depth - 1)

        def f(c, op=op, lf=lf, rf=rf):
            l, r = lf(c), rf(c)
            if op == "+":
                return l + r
            if op == "-":
                return l - r
            if op == "*":
                return l * r
            if r == 0:
                raise ZeroDivisionError
            q = abs(l) // abs(r)
            if (l < 0) != (r < 0):
                q = -q
            return q if op == "/" else l - q * r

        return f"({ls} {op} {rs})", f

    def test_random_trees(self, elements):
        rng = np.random.default_rng(123)
        for _ in range(40):
            ls, lf = self._gen(rng, 3)
            rs, rf = self._gen(rng, 2)
            cmp_op = rng.choice(["<", "<=", ">", ">=", "==", "!="])
            src = f"{ls} {cmp_op} {rs}"
            import operator
            cmps = {"<": operator.lt, "<=": operator.le, ">": operator.gt,
                    ">=": operator.ge, "==": operator.eq, "!=": operator.ne}

            def fn(c, lf=lf, rf=rf, op=cmps[cmp_op]):
                return op(lf(c), rf(c))

            f = CelFilter(src)
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                got = f.apply_table(elements)
            want_ids = [elements["id"][i].as_py()
                        for i, k in enumerate(_oracle(elements, fn)) if k]
            assert got["id"].to_pylist() == want_ids, src
