"""OSM PBF wire codec + source/sink round-trips."""

import numpy as np
import pyarrow as pa
import pytest

from skyway_ray.fixtures import make_osm_elements
from skyway_ray.functions.pbf_wire import (
    decode_message, decode_packed_varints, decode_varint, encode_varint,
    field_bytes, field_packed_varints, field_varint, zigzag_decode,
    zigzag_encode,
)


class TestWire:
    def test_varint_vectors(self):
        # protobuf spec examples
        assert encode_varint(1) == b"\x01"
        assert encode_varint(300) == b"\xac\x02"
        for v in (0, 1, 127, 128, 300, 2**32, 2**63 - 1, -1, -2**63):
            got, pos = decode_varint(encode_varint(v), 0)
            if v < 0:
                got -= 1 << 64
            assert got == v

    def test_zigzag(self):
        # spec: 0->0, -1->1, 1->2, -2->3
        assert [zigzag_encode(v) for v in (0, -1, 1, -2, 2147483647)] == \
            [0, 1, 2, 3, 4294967294]
        for v in (0, -1, 1, -64, 12345, -2**62):
            assert zigzag_decode(zigzag_encode(v)) == v

    def test_message_roundtrip(self):
        msg = (field_varint(1, 42) + field_bytes(2, b"hello")
               + field_packed_varints(3, [1, -2, 3], zigzag=True))
        d = decode_message(msg)
        assert d[1] == [42]
        assert d[2] == [b"hello"]
        assert list(decode_packed_varints(d[3][0], zigzag=True)) == [1, -2, 3]


def _norm(table: pa.Table):
    rows = []
    for r in table.to_pylist():
        tags = {kv["key"]: kv["value"] for kv in (r["tags"] or [])}
        rows.append((
            r["type"], r["id"],
            None if r["lat"] is None else round(r["lat"], 7),
            None if r["lon"] is None else round(r["lon"], 7),
            tuple(r["nodes"] or []) if r["type"] == "way" else None,
            tuple((m["type"], m["ref"], m["role"] or "")
                  for m in (r["members"] or []))
            if r["type"] == "relation" else None,
            tuple(sorted(tags.items())),
            # PBF's Info can't distinguish absent from 0 for these
            r["changeset"] or None, r["uid"] or None, r["user"],
            # visible defaults to true in the PBF model (None -> True)
            r["version"] or None, r["visible"] is not False,
            # second-resolution ISO timestamps round-trip (epoch 0 = absent)
            r["timestamp"],
        ))
    return sorted(rows)


class TestPbfRoundtrip:
    def test_roundtrip(self, ray_session, tmp_path):
        import ray.data
        from skyway_ray.io.osm_pbf import read_pbf, write_pbf

        t = make_osm_elements(2500)
        path = str(tmp_path / "out.osm.pbf")
        n = write_pbf(ray.data.from_arrow(t), path, rows_per_blob=600)
        assert n == 2500
        ds, meta = read_pbf(path)
        assert meta.get("generator") == "skyway_ray"
        t2 = pa.concat_tables([__import__("ray").get(r)
                               for r in ds.to_arrow_refs()])
        assert t2.num_rows == 2500
        # lat/lon at 100-nanodegree granularity; timestamp not carried;
        # PBF model: missing-changeset/uid/version become... preserved
        assert _norm(t) == _norm(t2)

    def test_reference_corpus_through_pbf(self, ray_session, tmp_path):
        """example.json → PBF → docs-style filter → element count matches
        the direct JSON path (69 residential ways)."""
        from skyway_ray.filters.vector import CompiledFilter
        from skyway_ray.io.osm_json import read_osm_json
        from skyway_ray.io.osm_pbf import read_pbf, write_pbf

        ds, _ = read_osm_json("/root/reference/src/examples/example.json")
        path = str(tmp_path / "ex.osm.pbf")
        assert write_pbf(ds, path) == 1551
        ds2, _ = read_pbf(path)
        f = CompiledFilter.from_source(
            "OSMFilter v0.2.0\n\n"
            'EQUALS "highway" "residential"\n\tCOMMIT\nDROP\n')
        out = ds2.map_batches(f.apply_table, batch_format="pyarrow")
        assert out.count() == 69

    def test_multi_blob_unordered_ok(self, ray_session, tmp_path):
        import ray.data
        from skyway_ray.io.osm_pbf import read_pbf, scan_blobs, write_pbf

        t = make_osm_elements(3000)
        path = str(tmp_path / "multi.osm.pbf")
        write_pbf(ray.data.from_arrow(t), path, rows_per_blob=250)
        blobs = scan_blobs(path)
        assert sum(1 for b, _ in blobs if b == "OSMData") >= 12
        ds, _ = read_pbf(path)
        assert ds.count() == 3000
