"""Property-based codec fuzzing: OPL escaping, PNG, OPL line round-trip."""

import hypothesis.strategies as st
import numpy as np
from hypothesis import given, settings

from skyway_ray.functions.image_codec import decode_png, encode_png
from skyway_ray.functions.opl_codec import escape_opl, unescape_opl

# printable-ish unicode without surrogates
texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFFF),
    max_size=80,
)


class TestOplEscapeProperty:
    @settings(max_examples=300, deadline=None)
    @given(texts)
    def test_roundtrip(self, s):
        assert unescape_opl(escape_opl(s)) == s

    @settings(max_examples=300, deadline=None)
    @given(texts)
    def test_escaped_is_opl_safe(self, s):
        """Escaped output contains no whitespace/comma/equals — the OPL
        field separators."""
        out = escape_opl(s)
        assert not any(c in out for c in (" ", "\t", "\n", ",", "="))


class TestPngProperty:
    @settings(max_examples=60, deadline=None)
    @given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**31 - 1))
    def test_roundtrip_any_shape(self, w, h, seed):
        img = np.random.default_rng(seed).integers(
            0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_png(encode_png(img)) == img).all()


class TestPackedVarintProperty:
    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(0, 2**64 - 1), max_size=30),
           st.booleans())
    def test_vectorized_matches_scalar(self, values, zz):
        from skyway_ray.functions.pbf_wire import (
            decode_packed_varints, decode_varint, encode_varint,
            zigzag_decode, zigzag_encode,
        )

        if zz:  # treat inputs as signed via zigzag space
            values = [v - 2**63 for v in values]
            body = b"".join(encode_varint(zigzag_encode(v)) for v in values)
        else:
            body = b"".join(encode_varint(v) for v in values)
        got = decode_packed_varints(body, zigzag=zz)
        # scalar reference
        want = []
        pos = 0
        while pos < len(body):
            u, pos = decode_varint(body, pos)
            want.append(zigzag_decode(u) if zz
                        else (u - 2**64 if u >= 2**63 else u))
        assert [int(v) for v in got] == want


class TestPbfBlockProperty:
    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.integers(0, 2**31), min_size=1, max_size=20),
           st.integers(0, 2**31 - 1))
    def test_dense_node_block_roundtrip(self, raw_ids, seed):
        import numpy as np

        from skyway_ray.io.osm_pbf import (
            _encode_primitive_block, decode_primitive_block)

        rng = np.random.default_rng(seed)
        ids = sorted(set(raw_ids))
        rows = [{"type": "node", "id": i,
                 "lat": float(rng.uniform(-85, 85)),
                 "lon": float(rng.uniform(-180, 180)),
                 "nodes": None, "members": None,
                 "tags": [{"key": "k", "value": str(i)}],
                 "changeset": None, "uid": None, "user": None,
                 "version": 1, "timestamp": None, "visible": None}
                for i in ids]
        out = decode_primitive_block(_encode_primitive_block(rows))
        assert out["id"].to_pylist() == ids
        for r_in, r_out in zip(rows, out.to_pylist()):
            assert abs(r_in["lat"] - r_out["lat"]) < 1e-7 + 1e-9
            assert abs(r_in["lon"] - r_out["lon"]) < 1e-7 + 1e-9
            assert r_out["tags"][0]["value"] == str(r_in["id"])


ids = st.integers(min_value=1, max_value=2**62)
tag_kv = st.tuples(texts.filter(bool), texts)


@st.composite
def elements(draw):
    t = draw(st.sampled_from(["node", "way", "relation"]))
    el = {
        "type": t, "id": draw(ids),
        "lat": None, "lon": None, "nodes": None, "members": None,
        "tags": [{"key": k, "value": v}
                 for k, v in dict(draw(st.lists(tag_kv, max_size=4))).items()],
        "changeset": draw(st.none() | st.integers(0, 2**40)),
        "uid": draw(st.none() | st.integers(0, 2**31 - 1)),
        "user": draw(st.none() | texts),
        "version": draw(st.none() | st.integers(1, 2**30)),
        "timestamp": draw(st.none() | st.sampled_from(
            ["2024-01-01T00:00:00Z", "1999-12-31T23:59:59Z"])),
        "visible": draw(st.none() | st.booleans()),
    }
    if t == "node":
        el["lat"] = draw(st.floats(-90, 90, allow_nan=False))
        el["lon"] = draw(st.floats(-180, 180, allow_nan=False))
    elif t == "way":
        el["nodes"] = draw(st.lists(ids, min_size=0, max_size=6))
    else:
        el["members"] = [
            {"type": draw(st.sampled_from(["node", "way", "relation"])),
             "ref": draw(ids), "role": draw(texts)}
            for _ in range(draw(st.integers(0, 4)))
        ]
    return el


class TestOplLineProperty:
    @settings(max_examples=150, deadline=None)
    @given(st.lists(elements(), min_size=1, max_size=5))
    def test_line_roundtrip(self, els):
        import pyarrow as pa

        from skyway_ray.io.opl import parse_opl_lines, serialize_opl_batch
        from skyway_ray.schemas import OSM_ELEMENT_SCHEMA

        t = pa.Table.from_pylist(els, schema=OSM_ELEMENT_SCHEMA)
        lines = serialize_opl_batch(t)
        t2 = parse_opl_lines(lines)
        for a, b in zip(t.to_pylist(), t2.to_pylist()):
            assert a["type"] == b["type"] and a["id"] == b["id"]
            ta = {kv["key"]: kv["value"] for kv in (a["tags"] or [])}
            tb = {kv["key"]: kv["value"] for kv in (b["tags"] or [])}
            assert ta == tb
            if a["type"] == "node":
                assert abs((a["lat"] or 0) - (b["lat"] or 0)) < 1e-9
                assert abs((a["lon"] or 0) - (b["lon"] or 0)) < 1e-9
            if a["type"] == "way":
                assert (a["nodes"] or []) == (b["nodes"] or [])
            if a["type"] == "relation":
                ma = [(m["type"], m["ref"], m["role"] or "")
                      for m in (a["members"] or [])]
                mb = [(m["type"], m["ref"], m["role"] or "")
                      for m in (b["members"] or [])]
                assert ma == mb
            for f in ("changeset", "uid", "user", "version", "visible"):
                assert a[f] == b[f], f
