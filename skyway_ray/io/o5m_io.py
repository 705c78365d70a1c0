"""o5m source + sink — assembled from the kernels the reference left
unfinished.

The reference's o5m writer exists but is incomplete and never
dispatched (``/root/reference/src/writers/o5m.rs`` — ``convert_f64``
is ``unimplemented!``, the format is commented out of
``OutputFileFormat``).  This module assembles a working sink (and a
reader for round-trip verification) against the public o5m spec
(wiki.openstreetmap.org/wiki/O5m), reusing the ported kernels from
``functions/o5m.py`` (unsigned varint, zero-delimited string pairs,
15,000-entry MRU string table) plus the o5m signed varint and the
per-stream delta coding the format requires.

Structure: ``0xFF`` reset · ``0xE0`` header ("o5m2") · datasets
(``0x10`` node / ``0x11`` way / ``0x12`` relation, each
length-prefixed, ids/coords/refs delta-coded) · ``0xFE`` eof.
Coordinates are 100-nanodegree ints.  Metadata fidelity: ``version``
is kept; timestamp/changeset/uid/user are written as "unknown"
(timestamp 0 — the spec then omits the rest), matching the engine's
unparsed-string timestamp model; ``visible`` has no o5m encoding.

The sink consumes the globally sorted stream
(``functions/o5m.sort_elements_for_o5m``) on the driver — o5m's
delta/string-table coding is inherently a sequential single-stream
format, like the XML sink.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.o5m import StringTable, convert_number
from ..schemas import OSM_ELEMENT_SCHEMA

_HEADER = b"o5m2"
_RESET = 0xFF
_EOF = 0xFE
_NODE, _WAY, _REL = 0x10, 0x11, 0x12
_NANO7 = 10_000_000  # o5m coordinate unit: 100 nanodegrees


def encode_svarint(v: int) -> bytes:
    """o5m signed varint: lowest bit is the sign."""
    u = (v << 1) if v >= 0 else (((-v - 1) << 1) | 1)
    return convert_number(u) or b"\x00"


def decode_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def decode_svarint(data: bytes, pos: int) -> tuple[int, int]:
    u, pos = decode_uvarint(data, pos)
    return (-(u >> 1) - 1) if (u & 1) else (u >> 1), pos


class _DeltaState:
    def __init__(self):
        self.id = 0
        self.lat = 0
        self.lon = 0
        self.ref = 0
        self.memid = 0


def _string_pair_bytes(st: StringTable, key: str, value: str) -> bytes:
    pair = b"\x00" + key.encode() + b"\x00" + value.encode() + b"\x00"
    if len(pair) <= 252:  # spec: long strings bypass the table
        return st.hit_cache(pair)
    return pair


def write_o5m(ds, path: str) -> int:
    """Sorted-stream o5m sink. ``ds`` must be OSM_ELEMENT_SCHEMA;
    sorting to (nodes, ways, relations) × id asc happens here via
    ``sort_elements_for_o5m``. Returns rows written."""
    from ..functions.o5m import sort_elements_for_o5m

    ds = sort_elements_for_o5m(ds)
    st = StringTable()
    state = _DeltaState()
    rows = 0
    with open(path, "wb") as f:
        f.write(bytes([_RESET]))
        f.write(bytes([0xE0]) + convert_number(len(_HEADER)) + _HEADER)
        for batch in ds.iter_batches(batch_format="pyarrow"):
            for r in batch.to_pylist():
                payload = encode_svarint(r["id"] - state.id)
                state.id = r["id"]
                # version block: version uvarint, then timestamp=0 ->
                # "unknown", closing the metadata block per spec
                version = r.get("version") or 0
                payload += convert_number(version) or b"\x00"
                if version:
                    payload += encode_svarint(0)  # timestamp unknown
                if r["type"] == "node":
                    lon = round((r["lon"] or 0.0) * _NANO7)
                    lat = round((r["lat"] or 0.0) * _NANO7)
                    payload += encode_svarint(lon - state.lon)
                    payload += encode_svarint(lat - state.lat)
                    state.lon, state.lat = lon, lat
                    code = _NODE
                elif r["type"] == "way":
                    refs = b""
                    for n in (r.get("nodes") or []):
                        refs += encode_svarint(n - state.ref)
                        state.ref = n
                    payload += convert_number(len(refs)) or b"\x00"
                    payload += refs
                    code = _WAY
                else:
                    mems = b""
                    type_code = {"node": "0", "way": "1", "relation": "2"}
                    for m in (r.get("members") or []):
                        mems += encode_svarint(m["ref"] - state.memid)
                        state.memid = m["ref"]
                        mstr = (type_code[m["type"]] + (m.get("role") or ""))
                        pair = b"\x00" + mstr.encode() + b"\x00"
                        mems += st.hit_cache(pair) if len(pair) <= 252 else pair
                    payload += convert_number(len(mems)) or b"\x00"
                    payload += mems
                    code = _REL
                for t in (r.get("tags") or []):
                    payload += _string_pair_bytes(st, t["key"], t["value"])
                f.write(bytes([code]) + convert_number(len(payload)) + payload)
                rows += 1
        f.write(bytes([_EOF]))
    return rows


class _RefTable:
    """Reader-side mirror of the MRU reference table — append-only
    list + arithmetic indexing (``ref`` counts back from the newest),
    instead of an O(capacity) front-insert memmove per entry."""

    def __init__(self, capacity: int = 15_000):
        self.entries: list[bytes] = []
        self.capacity = capacity

    def add(self, data: bytes) -> None:
        self.entries.append(data)
        if len(self.entries) > 4 * self.capacity:  # prune dead tail
            self.entries = self.entries[-self.capacity:]

    def get(self, ref: int) -> bytes:
        return self.entries[len(self.entries) - ref]


def _read_string_pair(data: bytes, pos: int, rt: _RefTable,
                      n_strings: int = 2) -> tuple[bytes, int]:
    """Read a string-table entry: tag pairs hold two zero-terminated
    strings, member type+role entries hold one."""
    if data[pos] != 0:
        ref, pos = decode_uvarint(data, pos)
        return rt.get(ref), pos
    end = pos
    for _ in range(n_strings):
        end = data.index(0, end + 1)
    pair = data[pos:end + 1]
    if len(pair) <= 252:
        rt.add(pair)
    return pair, end + 1


def read_o5m(path: str):
    """o5m → (Dataset, metadata). Driver-side sequential decode (the
    format's delta/string state is stream-global), then a Dataset."""
    import ray.data

    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    st = _RefTable()
    state = _DeltaState()
    cols = {k: [] for k in ("type", "id", "lat", "lon", "nodes", "members",
                            "tags", "changeset", "uid", "user", "version",
                            "timestamp", "visible")}

    def emit(t, id_, lat=None, lon=None, nodes=None, members=None,
             tags=None, version=None):
        cols["type"].append(t)
        cols["id"].append(id_)
        cols["lat"].append(lat)
        cols["lon"].append(lon)
        cols["nodes"].append(nodes)
        cols["members"].append(members)
        cols["tags"].append(tags or [])
        cols["changeset"].append(None)
        cols["uid"].append(None)
        cols["user"].append(None)
        cols["version"].append(version or None)
        cols["timestamp"].append(None)
        cols["visible"].append(None)

    while pos < len(data):
        code = data[pos]
        pos += 1
        if code == _RESET:
            state = _DeltaState()
            continue
        if code == _EOF:
            break
        length, pos = decode_uvarint(data, pos)
        payload = data[pos:pos + length]
        pos += length
        if code == 0xE0:
            continue  # header
        if code not in (_NODE, _WAY, _REL):
            continue  # skip unknown dataset types
        p = 0
        did, p = decode_svarint(payload, p)
        state.id += did
        version, p = decode_uvarint(payload, p)
        if version:
            ts, p = decode_svarint(payload, p)
            # ts == 0 -> no further metadata (we always write 0)
        tags = []
        if code == _NODE:
            dlon, p = decode_svarint(payload, p)
            dlat, p = decode_svarint(payload, p)
            state.lon += dlon
            state.lat += dlat
            while p < len(payload):
                pair, p = _read_string_pair(payload, p, st)
                parts = pair.split(b"\x00")
                tags.append({"key": parts[1].decode(),
                             "value": parts[2].decode()})
            emit("node", state.id, lat=state.lat / _NANO7,
                 lon=state.lon / _NANO7, tags=tags, version=version)
        elif code == _WAY:
            reflen, p = decode_uvarint(payload, p)
            refs_end = p + reflen
            nodes = []
            while p < refs_end:
                dref, p = decode_svarint(payload, p)
                state.ref += dref
                nodes.append(state.ref)
            while p < len(payload):
                pair, p = _read_string_pair(payload, p, st)
                parts = pair.split(b"\x00")
                tags.append({"key": parts[1].decode(),
                             "value": parts[2].decode()})
            emit("way", state.id, nodes=nodes, tags=tags, version=version)
        else:
            memlen, p = decode_uvarint(payload, p)
            mems_end = p + memlen
            members = []
            type_name = {"0": "node", "1": "way", "2": "relation"}
            while p < mems_end:
                dmem, p = decode_svarint(payload, p)
                state.memid += dmem
                pair, p = _read_string_pair(payload, p, st, n_strings=1)
                mstr = pair.split(b"\x00")[1].decode()
                members.append({"type": type_name[mstr[0]], "ref": state.memid,
                                "role": mstr[1:]})
            while p < len(payload):
                pair, p = _read_string_pair(payload, p, st)
                parts = pair.split(b"\x00")
                tags.append({"key": parts[1].decode(),
                             "value": parts[2].decode()})
            emit("relation", state.id, members=members, tags=tags,
                 version=version)

    arrays = [pa.array(cols[f.name], f.type) for f in OSM_ELEMENT_SCHEMA]
    table = pa.Table.from_arrays(arrays, schema=OSM_ELEMENT_SCHEMA)
    return ray.data.from_arrow(table), {}
