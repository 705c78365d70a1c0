"""OSM-JSON / Overpass-JSON source + sink.

Reader mirrors ``/root/reference/src/readers/json.rs``: the whole
document is parsed at once (the reference slurps it too), handling both
flat and ``osm3s``-nested metadata, numeric-or-string ``version``, and
silently dropping unknown element fields (``bounds``, ``geometry`` …)
— only the ``ElementDef`` fields survive (``json.rs:66-80``).

Writer mirrors ``/root/reference/src/writers/json.rs``: elements are
serialized per block in parallel (``map_batches``), with the driver
adding the header/footer.  Quirks preserved: ``visible`` emitted only
when ``false`` (``json.rs:165-168``); ``tags`` omitted when empty
(``json.rs:171``); ``overpass=True`` switches the header to the
``osm3s`` block + numeric version (``json.rs:23-72``).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..schemas import OSM_ELEMENT_SCHEMA
from .opl import _list_join

_VALID_TYPES = {"node", "way", "relation"}


def parse_osm_json(text: str) -> tuple[pa.Table, dict]:
    """Parse an OSM/Overpass JSON document → (elements table, metadata)."""
    doc = json.loads(text)
    version = doc.get("version")
    if isinstance(version, (int, float)):
        version = repr(float(version)) if isinstance(version, float) else str(version)
    metadata = {
        "version": version,
        "generator": doc.get("generator"),
        "license": doc.get("license"),
        "copyright": None,
        "timestamp": None,
    }
    if "osm3s" in doc:
        osm3s = doc["osm3s"] or {}
        metadata["copyright"] = osm3s.get("copyright")
        metadata["timestamp"] = osm3s.get("timestamp_osm_base")
    else:
        metadata["copyright"] = doc.get("copyright")

    cols = {k: [] for k in ("type", "id", "lat", "lon", "nodes", "members",
                            "tags", "changeset", "uid", "user", "version",
                            "timestamp", "visible")}
    for el in doc.get("elements", []):
        t = el.get("type")
        if t not in _VALID_TYPES:
            raise ValueError(f"invalid element type: {t}")
        cols["type"].append(t)
        cols["id"].append(el["id"])
        cols["lat"].append(el.get("lat") if t == "node" else None)
        cols["lon"].append(el.get("lon") if t == "node" else None)
        cols["nodes"].append(el.get("nodes") if t == "way" else None)
        if t == "relation":
            cols["members"].append([
                {"type": m.get("type"), "ref": m["ref"], "role": m.get("role")}
                for m in el.get("members", [])
            ])
        else:
            cols["members"].append(None)
        cols["tags"].append([{"key": k, "value": v}
                             for k, v in (el.get("tags") or {}).items()])
        cols["changeset"].append(el.get("changeset"))
        cols["uid"].append(el.get("uid"))
        cols["user"].append(el.get("user"))
        cols["version"].append(el.get("version"))
        cols["timestamp"].append(el.get("timestamp"))
        cols["visible"].append(el.get("visible"))
    arrays = [pa.array(cols[f.name], f.type) for f in OSM_ELEMENT_SCHEMA]
    return pa.Table.from_arrays(arrays, schema=OSM_ELEMENT_SCHEMA), metadata


def read_osm_json(path: str):
    """Single-doc parse in a REMOTE task (document formats are one
    file; parallelism starts at the first map stage).  The parsed
    table never lands on the driver — ``from_arrow_refs`` wraps the
    task's object-store output directly; only the (small) metadata is
    fetched."""
    import ray
    import ray.data

    @ray.remote(num_returns=2)
    def parse(p):
        with open(p, encoding="utf-8") as f:
            return parse_osm_json(f.read())

    tref, mref = parse.remote(path)
    return ray.data.from_arrow_refs([tref]), ray.get(mref)


def _fmt_num(v) -> str:
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _json_quote_col(col: pa.Array) -> pa.Array:
    """Vectorized JSON string quoting: plain-ASCII strings without
    quote/backslash take the C concat fast path; the rest go through
    ``json.dumps`` (which also \\uXXXX-escapes non-ASCII, matching the
    row writer byte-for-byte)."""
    import pyarrow.compute as pc

    quoted = pc.binary_join_element_wise(
        pa.scalar('"'), col, pa.scalar('"'), "")
    safe = pc.fill_null(
        pc.match_substring_regex(col, r"^[ !#-\[\]-~]*$"), True)
    sv = safe.to_numpy(zero_copy_only=False)
    if sv.all():
        return quoted
    vals = quoted.to_numpy(zero_copy_only=False).copy()
    raw = col.to_numpy(zero_copy_only=False)
    for i in np.flatnonzero(~sv):
        if raw[i] is not None:
            vals[i] = json.dumps(raw[i])
    return pa.array(vals, pa.string())


def _float_repr_col(col) -> pa.Array:
    """repr() formatting (shortest round-trip), with the row writer's
    ``str(None) == "None"`` behavior preserved for null coordinates."""
    return pa.array([repr(v) if isinstance(v, float) else str(v)
                     for v in col.to_pylist()], pa.string())


def serialize_json_elements(table: pa.Table) -> str:
    """One block → comma-joined element objects (no brackets).

    Vectorized on Arrow kernels (field order / omission semantics of
    ``writers/json.rs``): every scalar field is one cast +
    ``binary_join_element_wise`` column with a leading-comma prefix
    folded in when present; nodes/members/tags strings come from
    list-layout rebuilds + ``binary_join``.  Per-string Python only
    for non-plain-ASCII JSON escapes and float repr."""
    import pyarrow.compute as pc

    n = table.num_rows
    if n == 0:
        return ""
    tb = table.combine_chunks()

    def chunk(name):
        c = tb[name]
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    bjew = pc.binary_join_element_wise
    typ_col = chunk("type")
    typ = typ_col.to_numpy(zero_copy_only=False)
    head = bjew(pa.scalar('"type":'), _json_quote_col(typ_col), "")

    # geometry by type (always present, before id — writers/json.rs)
    node_geo = bjew(pa.scalar(',"lat":'), _float_repr_col(chunk("lat")),
                    pa.scalar(',"lon":'), _float_repr_col(chunk("lon")), "")

    nodes = chunk("nodes")
    way_geo = bjew(pa.scalar(',"nodes":['),
                   pc.fill_null(_list_join(
                       nodes, pc.cast(nodes.flatten(), pa.string()), ","), ""),
                   pa.scalar("]"), "")

    members = chunk("members")
    mflat = members.flatten()
    mtype = mflat.field("type")
    # "type" is omitted per member when null
    mtype_part = pc.fill_null(
        bjew(pa.scalar(',"type":'), _json_quote_col(mtype), ""), "")
    ment = bjew(pa.scalar('{"ref":'),
                pc.cast(mflat.field("ref"), pa.string()),
                mtype_part,
                pa.scalar(',"role":'),
                _json_quote_col(pc.fill_null(mflat.field("role"), "")),
                pa.scalar("}"), "")
    rel_geo = bjew(pa.scalar(',"members":['),
                   pc.fill_null(_list_join(members, ment, ","), ""),
                   pa.scalar("]"), "")

    is_node = pa.array(typ == "node")
    is_way = pa.array(typ == "way")
    geo = pc.if_else(is_node, node_geo, pc.if_else(is_way, way_geo, rel_geo))

    f_id = bjew(pa.scalar(',"id":'), pc.cast(chunk("id"), pa.string()), "")

    def opt(name, label, to_str=None):
        col = chunk(name)
        sval = to_str(col) if to_str else pc.cast(col, pa.string())
        return pc.fill_null(
            bjew(pa.scalar(f',"{label}":'), sval, ""), "")

    f_ch = opt("changeset", "changeset")
    f_ts = opt("timestamp", "timestamp", to_str=_json_quote_col)
    f_uid = opt("uid", "uid")
    f_user = opt("user", "user", to_str=_json_quote_col)
    vis = chunk("visible")
    f_vis = pc.if_else(
        pc.and_kleene(pc.is_valid(vis), pc.equal(vis, False)),
        pa.scalar(',"visible":false'), pa.scalar(""))

    tags = chunk("tags")
    tflat = tags.flatten()
    kvs = bjew(_json_quote_col(tflat.field("key")), pa.scalar(":"),
               _json_quote_col(tflat.field("value")), "")
    tag_body = pc.fill_null(_list_join(tags, kvs, ","), "")
    has_tags = pc.greater(
        pc.fill_null(pc.list_value_length(tags), 0), 0)
    f_tags = pc.if_else(
        has_tags,
        bjew(pa.scalar(',"tags":{'), tag_body, pa.scalar("}"), ""),
        pa.scalar(""))

    full = bjew(pa.scalar("{"), head, geo, f_id, f_ch, f_ts, f_uid,
                f_user, f_vis, f_tags, pa.scalar("}"), "")
    return ",".join(full.to_pylist())


def create_header(metadata: dict, overpass: bool) -> str:
    """Mirror of ``create_header`` (writers/json.rs:23-72)."""
    h = "{"
    if metadata.get("generator") is not None:
        h += f'"generator":{json.dumps(metadata["generator"])},'
    if overpass:
        h += '"osm3s":{'
        appended = False
        if metadata.get("timestamp") is not None:
            h += f'"timestamp_osm_base":{json.dumps(metadata["timestamp"])}'
            appended = True
        if metadata.get("copyright") is not None:
            if appended:
                h += ","
            h += f'"copyright":{json.dumps(metadata["copyright"])}'
        h += '},"version":0.6,"elements":['
    else:
        if metadata.get("copyright") is not None:
            h += f'"copyright":{json.dumps(metadata["copyright"])},'
        if metadata.get("license") is not None:
            h += f'"license":{json.dumps(metadata["license"])},'
        h += '"version":"0.6","elements":['
    return h


def write_osm_json(ds, path: str, metadata: dict | None = None,
                   overpass: bool = False) -> int:
    """Sink: blocks serialize in parallel; the driver streams chunks to
    the file between header and footer (arrival order — the reference's
    parallel serialize is likewise unordered, json.rs:212-222)."""
    metadata = metadata or {}
    rows = 0
    with open(path, "w", encoding="utf-8") as f:
        f.write(create_header(metadata, overpass))
        first = True
        for chunk in ds.map_batches(
                lambda b: pa.table({"s": [serialize_json_elements(b)],
                                    "n": [b.num_rows]}),
                batch_format="pyarrow").iter_rows():
            if chunk["n"] == 0 or not chunk["s"]:
                continue
            if not first:
                f.write(",")
            first = False
            f.write(chunk["s"])
            rows += chunk["n"]
        f.write("]}")
    return rows
