"""Source/sink round-trips over the conformance fixture + the
reference's example corpus."""

import os

import pyarrow as pa
import pytest

from skyway_ray.fixtures import make_osm_elements
from skyway_ray.io.opl import parse_opl_lines, serialize_opl_batch
from skyway_ray.io.osm_json import (
    create_header, parse_osm_json, serialize_json_elements,
)
from skyway_ray.io.osm_xml import parse_osm_xml, _serialize_one
from skyway_ray.io.registry import infer_format

EXAMPLE_JSON = "/root/reference/src/examples/example.json"


def _norm_rows(table: pa.Table, drop_visible_true=False, drop_version=False):
    rows = []
    for r in table.to_pylist():
        tags = {kv["key"]: kv["value"] for kv in (r["tags"] or [])}
        vis = r["visible"]
        if drop_visible_true and vis is True:
            vis = None
        version = None if drop_version else r["version"]
        rows.append((
            r["type"], r["id"], r["lat"], r["lon"],
            tuple(r["nodes"] or []) if r["type"] == "way" else None,
            tuple((m["type"], m["ref"], m["role"]) for m in (r["members"] or []))
            if r["type"] == "relation" else None,
            tuple(sorted(tags.items())), r["changeset"], r["uid"], r["user"],
            version, r["timestamp"], vis,
        ))
    return rows


class TestFormatInference:
    def test_infer(self):
        assert infer_format("a.json") == "json"
        assert infer_format("a.osm") == "xml"
        assert infer_format("a.opl") == "opl"
        assert infer_format("a.foo", explicit="overpass") == "json"
        with pytest.raises(ValueError):
            infer_format("a.bin")


class TestOplRoundtrip:
    def test_roundtrip(self):
        t = make_osm_elements(500)
        lines = serialize_opl_batch(t)
        t2 = parse_opl_lines(lines)
        # OPL has no empty-vs-missing tags distinction; visible round-trips
        assert _norm_rows(t) == _norm_rows(t2)

    def test_single_line_forms(self):
        lines = [
            "n1 v2 dV c30 t2024-01-01T00:00:00Z i99 ualice Thighway=primary x1.5 y-2.25",
            "w2 Tname=A%20road Nn1,n2,n3",
            "r3 T Mn1@outer,w2@inner,r4@",
        ]
        t = parse_opl_lines(lines)
        rows = t.to_pylist()
        assert rows[0]["type"] == "node" and rows[0]["lon"] == 1.5
        assert rows[0]["visible"] is True
        tag = rows[0]["tags"][0]
        assert (tag["key"], tag["value"]) == ("highway", "primary")
        assert rows[1]["nodes"] == [1, 2, 3]
        assert {m["type"] for m in rows[2]["members"]} == {"node", "way", "relation"}
        # and serialize back
        out = serialize_opl_batch(t)
        assert out[0].startswith("n1 v2 dV c30")
        assert "ualice" in out[0]


class TestJson:
    def test_reference_example_parses(self):
        with open(EXAMPLE_JSON, encoding="utf-8") as f:
            table, metadata = parse_osm_json(f.read())
        assert table.num_rows == 1551
        assert metadata["generator"] is not None
        # overpass-style doc: osm3s metadata captured
        assert metadata["copyright"] is not None
        # unknown fields (bounds/geometry) silently dropped
        assert "bounds" not in table.column_names
        assert set(table["type"].to_pylist()) == {"way"}

    def test_roundtrip(self):
        t = make_osm_elements(500)
        body = serialize_json_elements(t)
        doc = create_header({"generator": "skyway_ray"}, overpass=False) + body + "]}"
        t2, meta = parse_osm_json(doc)
        assert meta["generator"] == "skyway_ray"
        assert meta["version"] == "0.6"
        # visible=True is not emitted by the writer (json.rs:165-168) and
        # element version is never emitted (absent from json.rs:74-190)
        assert _norm_rows(t, True, True) == _norm_rows(t2, True, True)

    def test_overpass_header_numeric_version(self):
        h = create_header({"generator": "g", "timestamp": "T", "copyright": "c"},
                          overpass=True)
        assert '"version":0.6' in h and '"osm3s"' in h
        h2 = create_header({"generator": "g"}, overpass=False)
        assert '"version":"0.6"' in h2


class TestXml:
    def test_vectorized_serializer_byte_parity(self):
        """The Arrow-kernel block serializer must be byte-identical to
        the per-row oracle (attribute order, escaping, children)."""
        from skyway_ray.io.osm_xml import serialize_xml_elements

        t = make_osm_elements(400)
        want = "".join(_serialize_one(r) for r in t.to_pylist())
        assert serialize_xml_elements(t) == want

    def test_roundtrip(self):
        t = make_osm_elements(400)
        body = "".join(_serialize_one(r) for r in t.to_pylist())
        doc = f'<osm version="0.6" generator="skyway_ray">{body}</osm>'
        t2, meta = parse_osm_xml(doc)
        assert meta["generator"] == "skyway_ray"
        # XML writer groups by type; compare as sets
        assert sorted(_norm_rows(t)) == sorted(_norm_rows(t2))


class TestRayIO:
    def test_opl_ray_roundtrip(self, ray_session, tmp_path):
        import ray.data
        from skyway_ray.io.opl import read_opl, write_opl

        t = make_osm_elements(1000)
        ds = ray.data.from_arrow(t)
        out_dir = str(tmp_path / "opl_out")
        n = write_opl(ds, out_dir)
        assert n == 1000
        ds2 = read_opl(out_dir)
        t2 = pa.concat_tables([ray.get(r) for r in ds2.to_arrow_refs()])
        assert sorted(_norm_rows(t)) == sorted(_norm_rows(t2))

    def test_json_ray_roundtrip(self, ray_session, tmp_path):
        import ray.data
        from skyway_ray.io.osm_json import read_osm_json, write_osm_json

        t = make_osm_elements(500)
        ds = ray.data.from_arrow(t)
        path = str(tmp_path / "out.json")
        n = write_osm_json(ds, path, {"generator": "skyway_ray"})
        assert n == 500
        ds2, meta = read_osm_json(path)
        t2 = pa.concat_tables([ray.get(r) for r in ds2.to_arrow_refs()])
        assert sorted(_norm_rows(t, True, True)) == sorted(_norm_rows(t2, True, True))

    def test_xml_ray_roundtrip(self, ray_session, tmp_path):
        import ray.data
        from skyway_ray.io.osm_xml import read_osm_xml, write_osm_xml

        t = make_osm_elements(300)
        ds = ray.data.from_arrow(t)
        path = str(tmp_path / "out.osm")
        n = write_osm_xml(ds, path, {"version": "0.6"})
        assert n == 300
        ds2, meta = read_osm_xml(path)
        t2 = pa.concat_tables([ray.get(r) for r in ds2.to_arrow_refs()])
        assert sorted(_norm_rows(t)) == sorted(_norm_rows(t2))

    def test_cross_format_matrix(self, ray_session, tmp_path):
        """The same element set survives every format chain: the
        reference corpus converted json→{opl,xml,pbf,o5m}→back keeps
        the identical (type, id) set and tag dicts."""
        import ray
        from skyway_ray.io.registry import read_elements, write_elements

        src, _ = read_elements(EXAMPLE_JSON, "json")
        base = pa.concat_tables([ray.get(r) for r in src.to_arrow_refs()])

        def key_set(t):
            out = {}
            for r in t.to_pylist():
                tags = tuple(sorted(
                    (kv["key"], kv["value"]) for kv in (r["tags"] or [])))
                out[(r["type"], r["id"])] = tags
            return out

        want = key_set(base)
        for fmt, name in (("opl", "m.opl"), ("xml", "m.osm"),
                          ("pbf", "m.osm.pbf"), ("o5m", "m.o5m")):
            path = str(tmp_path / name)
            src2, _ = read_elements(EXAMPLE_JSON, "json")
            write_elements(src2, path, fmt)
            back, _ = read_elements(path, fmt)
            t2 = pa.concat_tables([ray.get(r) for r in back.to_arrow_refs()])
            assert key_set(t2) == want, fmt

    def test_example_json_through_filter_to_opl(self, ray_session, tmp_path):
        """Reference corpus end-to-end: read example.json → docs filter →
        write OPL."""
        from skyway_ray.filters.vector import CompiledFilter
        from skyway_ray.io.osm_json import read_osm_json
        from skyway_ray.io.opl import write_opl

        ds, meta = read_osm_json(EXAMPLE_JSON)
        f = CompiledFilter.from_source(
            "OSMFilter v0.2.0\n\n"
            'EQUALS "highway" "residential"\n\tCOMMIT\nDROP\n')
        out = ds.map_batches(f.apply_table, batch_format="pyarrow")
        n = write_opl(out, str(tmp_path / "ex_opl"))
        assert 0 < n < 1551
