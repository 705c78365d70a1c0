"""OSM PBF source + sink — pure-Python wire codec, Ray-parallel decode.

The reference's PBF reader decodes blobs **in parallel, unordered** on
a fixed rayon pool (``/root/reference/src/readers/pbf.rs:125-160``);
here the driver scans the blob framing (cheap: length-prefixed) and
each blob becomes one row of a Dataset, so Ray's task parallelism
replaces the rayon pool and ordering is likewise not guaranteed.

Format per the public OSMPBF spec (wiki.openstreetmap.org/wiki/
PBF_Format): length-prefixed BlobHeader/Blob framing (zlib payloads),
PrimitiveBlock with string table + DenseNodes (delta/zigzag packed) /
Way / Relation groups, granularity 100 nanodegrees.

Fidelity notes (documented deltas from the row model):
* ``timestamp`` round-trips at SECOND resolution via the Info /
  DenseInfo timestamp field (epoch units of date_granularity=1000 ms)
  — strings must be ``YYYY-MM-DDTHH:MM:SSZ``; anything else is
  dropped on write.  (The reference's PBF reader leaves
  timestamp/user TODO, ``pbf.rs:50-69`` — this goes beyond it, as
  with ``user`` via the string table.)  Epoch 0 encodes "absent",
  matching the proto default-value semantics used for
  changeset/uid.
* lat/lon round-trip at 100-nanodegree granularity (the format's
  default resolution).
"""

from __future__ import annotations

import calendar
import time as _time
import zlib

import numpy as np
import pyarrow as pa

from ..functions.pbf_wire import (
    decode_message, decode_packed_varints, decode_varint, field_bytes,
    field_packed_varints, field_varint, zigzag_decode,
)
from ..schemas import OSM_ELEMENT_SCHEMA

_GRANULARITY = 100  # nanodegrees
_NANO = 1_000_000_000


# ---------------------------------------------------------------------------
# encoding


class _StringTable:
    def __init__(self):
        self.strings: list[bytes] = [b""]  # index 0 must be empty
        self.index: dict[bytes, int] = {}

    def sid(self, s: str) -> int:
        b = s.encode()
        i = self.index.get(b)
        if i is None:
            i = len(self.strings)
            self.strings.append(b)
            self.index[b] = i
        return i

    def encode(self) -> bytes:
        return b"".join(field_bytes(1, s) for s in self.strings)


def _ts_epoch(s) -> int | None:
    """ISO ``YYYY-MM-DDTHH:MM:SSZ`` → epoch seconds, else None."""
    if not s:
        return None
    try:
        return calendar.timegm(_time.strptime(s, "%Y-%m-%dT%H:%M:%SZ"))
    except ValueError:
        return None


def _epoch_ts_strings(vals: np.ndarray) -> np.ndarray:
    """Vectorized epoch-seconds → ISO strings; 0 (absent) → None."""
    out = np.char.add(
        np.datetime_as_string(vals.astype("datetime64[s]"), unit="s"),
        "Z").astype(object)
    out[vals == 0] = None
    return out


def _info(st: _StringTable, r: dict) -> bytes:
    out = b""
    if r.get("version") is not None:
        out += field_varint(1, r["version"])
    ts = _ts_epoch(r.get("timestamp"))
    if ts is not None:
        out += field_varint(2, ts)
    if r.get("changeset") is not None:
        out += field_varint(3, r["changeset"])
    if r.get("uid") is not None:
        out += field_varint(4, r["uid"])
    if r.get("user") is not None:
        out += field_varint(5, st.sid(r["user"]))
    if r.get("visible") is not None:
        out += field_varint(6, 1 if r["visible"] else 0)
    return out


def _encode_primitive_block(rows: list[dict]) -> bytes:
    st = _StringTable()
    groups = b""

    nodes = [r for r in rows if r["type"] == "node"]
    ways = [r for r in rows if r["type"] == "way"]
    rels = [r for r in rows if r["type"] == "relation"]

    if nodes:
        ids = np.array([r["id"] for r in nodes], dtype=np.int64)
        # symmetric rounding at granularity units (floor-divide would
        # bias negative coordinates by up to one unit)
        lat = np.array([round((r["lat"] or 0.0) * _NANO / _GRANULARITY)
                        for r in nodes], dtype=np.int64)
        lon = np.array([round((r["lon"] or 0.0) * _NANO / _GRANULARITY)
                        for r in nodes], dtype=np.int64)
        dense = field_packed_varints(1, np.diff(ids, prepend=0), zigzag=True)
        dense += field_packed_varints(8, np.diff(lat, prepend=0), zigzag=True)
        dense += field_packed_varints(9, np.diff(lon, prepend=0), zigzag=True)
        kv: list[int] = []
        for r in nodes:
            for t in (r.get("tags") or []):
                kv.append(st.sid(t["key"]))
                kv.append(st.sid(t["value"]))
            kv.append(0)
        dense += field_packed_varints(10, kv)
        # DenseInfo (version/changeset/uid/user_sid/visible, delta-coded)
        versions = [r.get("version") or 0 for r in nodes]
        changesets = np.array([r.get("changeset") or 0 for r in nodes],
                              dtype=np.int64)
        uids = np.array([r.get("uid") or 0 for r in nodes], dtype=np.int64)
        user_sids = np.array([st.sid(r["user"]) if r.get("user") else 0
                              for r in nodes], dtype=np.int64)
        visible = [0 if r.get("visible") is False else 1 for r in nodes]
        tstamps = np.array([_ts_epoch(r.get("timestamp")) or 0
                            for r in nodes], dtype=np.int64)
        dinfo = field_packed_varints(1, versions)
        dinfo += field_packed_varints(2, np.diff(tstamps, prepend=0),
                                      zigzag=True)
        dinfo += field_packed_varints(3, np.diff(changesets, prepend=0), zigzag=True)
        dinfo += field_packed_varints(4, np.diff(uids, prepend=0), zigzag=True)
        dinfo += field_packed_varints(5, np.diff(user_sids, prepend=0), zigzag=True)
        dinfo += field_packed_varints(6, visible)
        dense += field_bytes(5, dinfo)
        groups += field_bytes(2, field_bytes(2, dense))

    for r in ways:
        msg = field_varint(1, r["id"])
        tags = r.get("tags") or []
        msg += field_packed_varints(2, [st.sid(t["key"]) for t in tags])
        msg += field_packed_varints(3, [st.sid(t["value"]) for t in tags])
        msg += field_bytes(4, _info(st, r))
        refs = np.array(r.get("nodes") or [], dtype=np.int64)
        msg += field_packed_varints(8, np.diff(refs, prepend=0), zigzag=True)
        groups += field_bytes(2, field_bytes(3, msg))

    _TYPE_CODE = {"node": 0, "way": 1, "relation": 2}
    for r in rels:
        msg = field_varint(1, r["id"])
        tags = r.get("tags") or []
        msg += field_packed_varints(2, [st.sid(t["key"]) for t in tags])
        msg += field_packed_varints(3, [st.sid(t["value"]) for t in tags])
        msg += field_bytes(4, _info(st, r))
        members = r.get("members") or []
        msg += field_packed_varints(8, [st.sid(m.get("role") or "")
                                        for m in members])
        memids = np.array([m["ref"] for m in members], dtype=np.int64)
        msg += field_packed_varints(9, np.diff(memids, prepend=0), zigzag=True)
        msg += field_packed_varints(10, [_TYPE_CODE[m["type"]] for m in members])
        groups += field_bytes(2, field_bytes(4, msg))

    block = field_bytes(1, st.encode()) + groups
    block += field_varint(17, _GRANULARITY)
    return block


def _frame_blob(blob_type: str, payload: bytes) -> bytes:
    blob = field_varint(2, len(payload)) + field_bytes(3, zlib.compress(payload))
    header = field_bytes(1, blob_type.encode()) + field_varint(3, len(blob))
    return len(header).to_bytes(4, "big") + header + blob


def write_pbf(ds, path: str, rows_per_blob: int = 8000) -> int:
    """Dataset (OSM_ELEMENT_SCHEMA) → .osm.pbf file. The document
    header + sequential framing make this a driver-side sink (blob
    payloads themselves are built per batch); returns rows written."""
    header = (field_bytes(4, b"OsmSchema-V0.6") +
              field_bytes(4, b"DenseNodes") +
              field_bytes(16, b"skyway_ray"))
    rows = 0
    with open(path, "wb") as f:
        f.write(_frame_blob("OSMHeader", header))
        buf: list[dict] = []

        def flush():
            nonlocal rows
            if buf:
                f.write(_frame_blob("OSMData", _encode_primitive_block(buf)))
                rows += len(buf)
                buf.clear()

        for batch in ds.iter_batches(batch_format="pyarrow"):
            buf.extend(batch.to_pylist())
            while len(buf) >= rows_per_blob:
                chunk, rest = buf[:rows_per_blob], buf[rows_per_blob:]
                buf[:] = chunk
                flush()
                buf[:] = rest
        flush()
    return rows


# ---------------------------------------------------------------------------
# decoding


def scan_blobs(path: str) -> list[tuple[str, bytes]]:
    """Driver-side framing scan → [(type, compressed-blob bytes)]."""
    out = []
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    while pos < len(data):
        hlen = int.from_bytes(data[pos:pos + 4], "big")
        pos += 4
        header = decode_message(data[pos:pos + hlen])
        pos += hlen
        btype = header[1][0].decode()
        dsize = header[3][0]
        out.append((btype, data[pos:pos + dsize]))
        pos += dsize
    return out


def _blob_payload(blob_bytes: bytes) -> bytes:
    msg = decode_message(blob_bytes)
    if 1 in msg:       # raw
        return msg[1][0]
    return zlib.decompress(msg[3][0])


def decode_primitive_block(payload: bytes) -> pa.Table:
    blk = decode_message(payload)
    st = [s.decode() for s in decode_message(blk[1][0]).get(1, [])]
    gran = blk.get(17, [100])[0]
    date_gran = blk.get(18, [1000])[0]
    lat_off = blk.get(19, [0])[0]
    lon_off = blk.get(20, [0])[0]
    cols = {k: [] for k in ("type", "id", "lat", "lon", "nodes", "members",
                            "tags", "changeset", "uid", "user", "version",
                            "timestamp", "visible")}

    def put(t, id_, lat=None, lon=None, nodes=None, members=None, tags=None,
            info=None):
        cols["type"].append(t)
        cols["id"].append(int(id_))
        cols["lat"].append(lat)
        cols["lon"].append(lon)
        cols["nodes"].append(nodes)
        cols["members"].append(members)
        cols["tags"].append(tags or [])
        info = info or {}
        cols["changeset"].append(info.get("changeset"))
        cols["uid"].append(info.get("uid"))
        cols["user"].append(info.get("user"))
        cols["version"].append(info.get("version"))
        cols["timestamp"].append(info.get("timestamp"))
        cols["visible"].append(info.get("visible"))

    def parse_info(data: bytes) -> dict:
        m = decode_message(data)
        out = {}
        if 1 in m:
            out["version"] = m[1][0]
        if 2 in m and m[2][0]:
            out["timestamp"] = str(_epoch_ts_strings(np.array(
                [m[2][0] * date_gran // 1000], dtype=np.int64))[0])
        if 3 in m:
            out["changeset"] = m[3][0]
        if 4 in m:
            out["uid"] = m[4][0]
        if 5 in m and m[5][0]:
            out["user"] = st[m[5][0]]
        if 6 in m:
            out["visible"] = bool(m[6][0])
        return out

    _TYPE_NAME = {0: "node", 1: "way", 2: "relation"}
    dense_parts: list[pa.Table] = []
    for group_bytes in blk.get(2, []):
        grp = decode_message(group_bytes)
        for dense_bytes in grp.get(2, []):        # DenseNodes
            d = decode_message(dense_bytes)
            ids = np.cumsum(decode_packed_varints(d[1][0], zigzag=True))
            lat = np.cumsum(decode_packed_varints(d[8][0], zigzag=True))
            lon = np.cumsum(decode_packed_varints(d[9][0], zigzag=True))
            lat_deg = (lat_off + gran * lat) / _NANO
            lon_deg = (lon_off + gran * lon) / _NANO
            kv = decode_packed_varints(d[10][0]) if 10 in d else np.empty(0, np.int64)
            dinfo = {}
            if 5 in d:
                di = decode_message(d[5][0])
                dinfo = {
                    "version": decode_packed_varints(di[1][0]) if 1 in di else None,
                    "timestamp": np.cumsum(decode_packed_varints(di[2][0], zigzag=True)) if 2 in di else None,
                    "changeset": np.cumsum(decode_packed_varints(di[3][0], zigzag=True)) if 3 in di else None,
                    "uid": np.cumsum(decode_packed_varints(di[4][0], zigzag=True)) if 4 in di else None,
                    "user_sid": np.cumsum(decode_packed_varints(di[5][0], zigzag=True)) if 5 in di else None,
                    "visible": decode_packed_varints(di[6][0]) if 6 in di else None,
                }
            # vectorized tag assembly: keys_vals is k,v,…,0 per node —
            # pair split is valid globally (even count per node) and a
            # numpy string-table gather replaces the per-tag lookups
            nn = len(ids)
            st_arr = np.asarray(st, dtype=object)
            if len(kv):
                zeros = np.flatnonzero(kv == 0)
                seg_starts = np.concatenate([[0], zeros[:-1] + 1])
                n_tags = ((zeros - seg_starts) // 2).astype(np.int64)
                flat = kv[kv != 0]
                keys = st_arr[flat[0::2]]
                values = st_arr[flat[1::2]]
            else:
                n_tags = np.zeros(nn, dtype=np.int64)
                keys = values = np.empty(0, dtype=object)
            offsets = np.zeros(nn + 1, dtype=np.int32)
            np.cumsum(n_tags, out=offsets[1:])
            tags_arr = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                pa.StructArray.from_arrays(
                    [pa.array(keys, pa.string()), pa.array(values, pa.string())],
                    names=["key", "value"]))

            def opt(arr, cast=pa.int64()):
                if arr is None:
                    return pa.nulls(nn, cast)
                return pa.array(np.asarray(arr), cast)

            if dinfo:
                tsv = dinfo.get("timestamp")
                if tsv is not None:
                    ts_arr = pa.array(_epoch_ts_strings(
                        (np.asarray(tsv) * date_gran) // 1000), pa.string())
                else:
                    ts_arr = pa.nulls(nn, pa.string())
                user_sid = dinfo.get("user_sid")
                if user_sid is not None:
                    users = np.where(user_sid > 0, st_arr[user_sid], None)
                    user_arr = pa.array(users, pa.string())
                else:
                    user_arr = pa.nulls(nn, pa.string())
                visible = dinfo.get("visible")
                visible_arr = (pa.array(np.asarray(visible, dtype=bool))
                               if visible is not None
                               else pa.nulls(nn, pa.bool_()))
                version_arr = opt(dinfo.get("version"), pa.int32())
                changeset_arr = opt(dinfo.get("changeset"))
                uid_arr = opt(dinfo.get("uid"), pa.int32())
            else:
                ts_arr = pa.nulls(nn, pa.string())
                user_arr = pa.nulls(nn, pa.string())
                visible_arr = pa.nulls(nn, pa.bool_())
                version_arr = pa.nulls(nn, pa.int32())
                changeset_arr = pa.nulls(nn, pa.int64())
                uid_arr = pa.nulls(nn, pa.int32())
            part = pa.Table.from_arrays([
                pa.array(["node"] * nn, pa.string()),
                pa.array(ids, pa.int64()),
                pa.array(lat_deg, pa.float64()),
                pa.array(lon_deg, pa.float64()),
                pa.nulls(nn, pa.list_(pa.int64())),
                pa.nulls(nn, OSM_ELEMENT_SCHEMA.field("members").type),
                tags_arr,
                changeset_arr,
                uid_arr,
                user_arr,
                version_arr,
                ts_arr,
                visible_arr,
            ], schema=OSM_ELEMENT_SCHEMA)
            dense_parts.append(part)
        for node_bytes in grp.get(1, []):          # plain Nodes
            m = decode_message(node_bytes)
            tags = [{"key": st[k], "value": st[v]}
                    for k, v in zip(decode_packed_varints(m[2][0]) if 2 in m else [],
                                    decode_packed_varints(m[3][0]) if 3 in m else [])]
            lat_deg = (lat_off + gran * zigzag_decode(m[8][0])) / _NANO
            lon_deg = (lon_off + gran * zigzag_decode(m[9][0])) / _NANO
            put("node", m[1][0], lat=lat_deg, lon=lon_deg, tags=tags,
                info=parse_info(m[4][0]) if 4 in m else None)
        for way_bytes in grp.get(3, []):           # Ways
            m = decode_message(way_bytes)
            tags = [{"key": st[k], "value": st[v]}
                    for k, v in zip(decode_packed_varints(m[2][0]) if 2 in m else [],
                                    decode_packed_varints(m[3][0]) if 3 in m else [])]
            refs = np.cumsum(decode_packed_varints(m[8][0], zigzag=True)) \
                if 8 in m else np.empty(0, np.int64)
            put("way", m[1][0], nodes=[int(x) for x in refs], tags=tags,
                info=parse_info(m[4][0]) if 4 in m else None)
        for rel_bytes in grp.get(4, []):           # Relations
            m = decode_message(rel_bytes)
            tags = [{"key": st[k], "value": st[v]}
                    for k, v in zip(decode_packed_varints(m[2][0]) if 2 in m else [],
                                    decode_packed_varints(m[3][0]) if 3 in m else [])]
            roles = decode_packed_varints(m[8][0]) if 8 in m else np.empty(0, np.int64)
            memids = np.cumsum(decode_packed_varints(m[9][0], zigzag=True)) \
                if 9 in m else np.empty(0, np.int64)
            types = decode_packed_varints(m[10][0]) if 10 in m else np.empty(0, np.int64)
            members = [{"type": _TYPE_NAME[int(t)], "ref": int(r),
                        "role": st[int(s)]}
                       for t, r, s in zip(types, memids, roles)]
            put("relation", m[1][0], members=members, tags=tags,
                info=parse_info(m[4][0]) if 4 in m else None)

    arrays = [pa.array(cols[f.name], f.type) for f in OSM_ELEMENT_SCHEMA]
    rest = pa.Table.from_arrays(arrays, schema=OSM_ELEMENT_SCHEMA)
    parts = dense_parts + ([rest] if rest.num_rows else [])
    if not parts:
        return OSM_ELEMENT_SCHEMA.empty_table()
    return pa.concat_tables(parts) if len(parts) > 1 else parts[0]


def read_pbf(path: str):
    """PBF → (Dataset, metadata). One decode task per data blob
    (parallel, unordered — the reference's rayon pool shape)."""
    import ray.data

    blobs = scan_blobs(path)
    metadata: dict = {}
    data_blobs = []
    for btype, raw in blobs:
        if btype == "OSMHeader":
            hdr = decode_message(_blob_payload(raw))
            if 16 in hdr:
                metadata["generator"] = hdr[16][0].decode()
        elif btype == "OSMData":
            data_blobs.append(raw)
    ds = ray.data.from_items([{"blob": b} for b in data_blobs])

    def decode_batch(batch: pa.Table) -> pa.Table:
        tables = [decode_primitive_block(_blob_payload(b))
                  for b in batch["blob"].to_pylist()]
        return pa.concat_tables(tables) if tables else \
            OSM_ELEMENT_SCHEMA.empty_table()

    return ds.map_batches(decode_batch, batch_format="pyarrow"), metadata
