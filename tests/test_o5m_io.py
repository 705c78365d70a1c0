"""Assembled o5m sink/reader round-trips (beyond the reference's
unfinished writer)."""

import pyarrow as pa
import pytest

from skyway_ray.fixtures import make_osm_elements
from skyway_ray.io.o5m_io import (
    decode_svarint, encode_svarint, read_o5m, write_o5m,
)


class TestSvarint:
    def test_roundtrip(self):
        for v in (0, 1, -1, 63, -64, 64, -65, 2**40, -2**40):
            got, pos = decode_svarint(encode_svarint(v), 0)
            assert got == v, v

    def test_known(self):
        # o5m spec examples: 0->0x00, -1->0x01, 1->0x02, -2->0x03
        assert encode_svarint(0) == b"\x00"
        assert encode_svarint(-1) == b"\x01"
        assert encode_svarint(1) == b"\x02"
        assert encode_svarint(-2) == b"\x03"


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
            tuple(sorted(tags.items())), r["version"] or None,
        ))
    return sorted(rows)


class TestO5mRoundtrip:
    def test_roundtrip(self, ray_session, tmp_path):
        import ray
        import ray.data

        t = make_osm_elements(1500)
        path = str(tmp_path / "out.o5m")
        n = write_o5m(ray.data.from_arrow(t), path)
        assert n == 1500
        ds, _ = read_o5m(path)
        t2 = pa.concat_tables([ray.get(r) for r in ds.to_arrow_refs()])
        assert t2.num_rows == 1500
        # o5m keeps (id, coords@1e-7, nodes, members, tags, version);
        # changeset/uid/user/timestamp/visible are not carried (docstring)
        assert _norm(t) == _norm(t2)

    def test_output_is_sorted(self, ray_session, tmp_path):
        import numpy as np
        import ray
        import ray.data

        t = make_osm_elements(900)
        path = str(tmp_path / "sorted.o5m")
        write_o5m(ray.data.from_arrow(t).repartition(6), path)
        ds, _ = read_o5m(path)
        t2 = pa.concat_tables([ray.get(r) for r in ds.to_arrow_refs()])
        types = t2["type"].to_pylist()
        rank = np.array([{"node": 0, "way": 1, "relation": 2}[x] for x in types])
        assert (np.diff(rank) >= 0).all()
        ids = t2["id"].to_numpy()
        for rr in (0, 1, 2):
            sub = ids[rank == rr]
            assert (np.diff(sub) > 0).all()

    def test_string_table_compression(self, ray_session, tmp_path):
        """Repeated tags must hit the reference table (file shrinks)."""
        import ray.data

        rows = [{"type": "node", "id": i + 1, "lat": 1.0 + i * 1e-5,
                 "lon": 2.0, "nodes": None, "members": None,
                 "tags": [{"key": "highway", "value": "residential"}],
                 "changeset": None, "uid": None, "user": None,
                 "version": 1, "timestamp": None, "visible": None}
                for i in range(500)]
        from skyway_ray.schemas import OSM_ELEMENT_SCHEMA

        t = pa.Table.from_pylist(rows, schema=OSM_ELEMENT_SCHEMA)
        path = str(tmp_path / "st.o5m")
        write_o5m(ray.data.from_arrow(t), path)
        import os

        # 500 nodes with an identical tag: ~8 bytes/node with table hits
        assert os.path.getsize(path) < 500 * 15
        ds, _ = read_o5m(path)
        assert ds.count() == 500
