"""OSM-XML source + sink.

Reader mirrors ``/root/reference/src/readers/xml.rs`` (attribute names
``id/lat/lon/user/uid/visible/version/changeset/timestamp``, child
elements ``tag[@k,@v]``, ``nd[@ref]``, ``member[@type,@ref,@role]``).
Writer mirrors ``/root/reference/src/writers/xml.rs``: the XML document
format requires nodes, then ways, then relations in one root element,
so the sink **materializes** (the reference buffers the entire stream
too — ``xml.rs:200-227``); it is inherently a small-document format.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

import pyarrow as pa

from ..schemas import OSM_ELEMENT_SCHEMA


def parse_osm_xml(text: str) -> tuple[pa.Table, dict]:
    root = ET.fromstring(text)
    metadata = {k: root.attrib.get(k)
                for k in ("version", "generator", "copyright", "license",
                          "timestamp")}
    cols = {k: [] for k in ("type", "id", "lat", "lon", "nodes", "members",
                            "tags", "changeset", "uid", "user", "version",
                            "timestamp", "visible")}

    def meta_of(el):
        a = el.attrib
        return dict(
            id=int(a["id"]),
            user=a.get("user"),
            uid=int(a["uid"]) if a.get("uid") else None,
            visible={"true": True, "false": False, "1": True, "0": False}.get(
                (a.get("visible") or "").lower()),
            version=int(a["version"]) if a.get("version") else None,
            changeset=int(a["changeset"]) if a.get("changeset") else None,
            timestamp=a.get("timestamp"),
        )

    def tags_of(el):
        return [{"key": t.attrib["k"], "value": t.attrib["v"]}
                for t in el.findall("tag")]

    # reference emits nodes-then-ways-then-relations; accept any order
    for tag_name in ("node", "way", "relation"):
        for el in root.findall(tag_name):
            m = meta_of(el)
            cols["type"].append(tag_name)
            cols["id"].append(m["id"])
            cols["lat"].append(float(el.attrib["lat"]) if tag_name == "node" else None)
            cols["lon"].append(float(el.attrib["lon"]) if tag_name == "node" else None)
            cols["nodes"].append(
                [int(nd.attrib["ref"]) for nd in el.findall("nd")]
                if tag_name == "way" else None)
            cols["members"].append(
                [{"type": mm.attrib.get("type"), "ref": int(mm.attrib["ref"]),
                  "role": mm.attrib.get("role")} for mm in el.findall("member")]
                if tag_name == "relation" else None)
            cols["tags"].append(tags_of(el))
            for k in ("changeset", "uid", "user", "version", "timestamp", "visible"):
                cols[k].append(m[k])
    arrays = [pa.array(cols[f.name], f.type) for f in OSM_ELEMENT_SCHEMA]
    return pa.Table.from_arrays(arrays, schema=OSM_ELEMENT_SCHEMA), metadata


def read_osm_xml(path: str):
    """Single-doc parse in a REMOTE task; the parsed table stays in
    the object store (``from_arrow_refs``) — only metadata is fetched
    to the driver."""
    import ray
    import ray.data

    @ray.remote(num_returns=2)
    def parse(p):
        with open(p, encoding="utf-8") as f:
            return parse_osm_xml(f.read())

    tref, mref = parse.remote(path)
    return ray.data.from_arrow_refs([tref]), ray.get(mref)


def _serialize_one(r: dict) -> str:
    t = r["type"]
    attrs = [f'id="{r["id"]}"']
    if t == "node":
        attrs.append(f'lat="{r["lat"]!r}"')
        attrs.append(f'lon="{r["lon"]!r}"')
    for k in ("user",):
        if r.get(k) is not None:
            attrs.append(f"{k}={quoteattr(r[k])}")
    for k in ("uid", "version", "changeset"):
        if r.get(k) is not None:
            attrs.append(f'{k}="{r[k]}"')
    if r.get("timestamp") is not None:
        attrs.append(f"timestamp={quoteattr(r['timestamp'])}")
    if r.get("visible") is not None:
        attrs.append(f'visible="{"true" if r["visible"] else "false"}"')
    children = []
    if t == "way":
        children += [f'<nd ref="{n}"/>' for n in (r.get("nodes") or [])]
    if t == "relation":
        for m in (r.get("members") or []):
            ma = []
            if m.get("type") is not None:
                ma.append(f'type="{m["type"]}"')
            ma.append(f'ref="{m["ref"]}"')
            ma.append(f"role={quoteattr(m.get('role') or '')}")
            children.append(f"<member {' '.join(ma)}/>")
    children += [f"<tag k={quoteattr(kv['key'])} v={quoteattr(kv['value'])}/>"
                 for kv in (r.get("tags") or [])]
    head = f"<{t} {' '.join(attrs)}"
    if children:
        return head + ">" + "".join(children) + f"</{t}>"
    return head + "/>"


def _xml_quoteattr_col(col) -> "pa.Array":
    """Vectorized ``quoteattr``: strings free of ``&<>"'`` and control
    whitespace take the C concat fast path (wrap in double quotes); the
    rest fall back to :func:`xml.sax.saxutils.quoteattr` per row —
    byte-identical to the row serializer."""
    import numpy as np
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    quoted = pc.binary_join_element_wise(
        pa.scalar('"'), col, pa.scalar('"'), "")
    safe = pc.fill_null(
        pc.match_substring_regex(col, "^[^&<>\"'\t\n\r]*$"), True)
    sv = safe.to_numpy(zero_copy_only=False)
    if sv.all():
        return quoted
    vals = quoted.to_numpy(zero_copy_only=False).copy()
    raw = col.to_numpy(zero_copy_only=False)
    for i in np.flatnonzero(~sv):
        if raw[i] is not None:
            vals[i] = quoteattr(raw[i])
    return pa.array(vals, pa.string())


def serialize_xml_elements(table: pa.Table) -> str:
    """One block → concatenated ``<node/>``/``<way/>``/``<relation/>``
    element strings, byte-identical to :func:`_serialize_one` per row.

    Vectorized on Arrow kernels the way the OPL/JSON serializers are:
    every attribute is one cast/quote + ``binary_join_element_wise``
    column (absent optional attributes fold to empty strings via
    ``fill_null``); nd/member/tag children come from list-layout
    rebuilds + ``binary_join``.  Per-string Python survives only for
    the rare attribute values needing real XML escapes and for float
    ``repr``."""
    import numpy as np
    import pyarrow.compute as pc

    from .opl import _list_join
    from .osm_json import _float_repr_col

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

    f_id = bjew(pa.scalar('id="'), pc.cast(chunk("id"), pa.string()),
                pa.scalar('"'), "")
    node_geo = bjew(pa.scalar(' lat="'), _float_repr_col(chunk("lat")),
                    pa.scalar('" lon="'), _float_repr_col(chunk("lon")),
                    pa.scalar('"'), "")
    is_node = pa.array(typ == "node")
    is_way = pa.array(typ == "way")
    geo = pc.if_else(is_node, node_geo, pa.scalar(""))

    def opt_quoted(name):
        return pc.fill_null(
            bjew(pa.scalar(f" {name}="), _xml_quoteattr_col(chunk(name)),
                 ""), "")

    def opt_plain(name):
        return pc.fill_null(
            bjew(pa.scalar(f' {name}="'),
                 pc.cast(chunk(name), pa.string()), pa.scalar('"'), ""), "")

    f_user = opt_quoted("user")
    f_uid = opt_plain("uid")
    f_ver = opt_plain("version")
    f_ch = opt_plain("changeset")
    f_ts = opt_quoted("timestamp")
    vis = chunk("visible")
    f_vis = pc.if_else(
        pc.is_valid(vis),
        pc.if_else(pc.fill_null(vis, False),
                   pa.scalar(' visible="true"'),
                   pa.scalar(' visible="false"')),
        pa.scalar(""))

    nodes = chunk("nodes")
    nd_ent = bjew(pa.scalar('<nd ref="'),
                  pc.cast(nodes.flatten(), pa.string()),
                  pa.scalar('"/>'), "")
    nd_str = pc.fill_null(_list_join(nodes, nd_ent, ""), "")

    members = chunk("members")
    mflat = members.flatten()
    mtype_part = pc.fill_null(
        bjew(pa.scalar('type="'), mflat.field("type"), pa.scalar('" '), ""),
        "")
    ment = bjew(pa.scalar("<member "), mtype_part,
                pa.scalar('ref="'), pc.cast(mflat.field("ref"), pa.string()),
                pa.scalar('" role='),
                _xml_quoteattr_col(pc.fill_null(mflat.field("role"), "")),
                pa.scalar("/>"), "")
    m_str = pc.fill_null(_list_join(members, ment, ""), "")

    tags = chunk("tags")
    tflat = tags.flatten()
    t_ent = bjew(pa.scalar("<tag k="), _xml_quoteattr_col(tflat.field("key")),
                 pa.scalar(" v="), _xml_quoteattr_col(tflat.field("value")),
                 pa.scalar("/>"), "")
    t_str = pc.fill_null(_list_join(tags, t_ent, ""), "")

    children = bjew(pc.if_else(is_way, nd_str, pa.scalar("")),
                    pc.if_else(pa.array(typ == "relation"), m_str,
                               pa.scalar("")),
                    t_str, "")
    head = bjew(pa.scalar("<"), typ_col, pa.scalar(" "), f_id, geo, f_user,
                f_uid, f_ver, f_ch, f_ts, f_vis, "")
    has_children = pc.greater(pc.binary_length(children), 0)
    full = pc.if_else(
        has_children,
        bjew(head, pa.scalar(">"), children, pa.scalar("</"), typ_col,
             pa.scalar(">"), ""),
        bjew(head, pa.scalar("/>"), ""))
    return "".join(full.to_pylist())


def write_osm_xml(ds, path: str, metadata: dict | None = None) -> int:
    """Materializing sink (format-inherent, like the reference):
    partition by type with three filtered streaming passes, emit
    nodes → ways → relations.  Blocks serialize in PARALLEL via
    ``map_batches`` over the Arrow-kernel serializer; the driver only
    streams the finished strings to the file."""
    metadata = metadata or {}
    rows = 0
    with open(path, "w", encoding="utf-8") as f:
        attrs = "".join(
            f" {k}={quoteattr(v)}" for k, v in metadata.items() if v is not None)
        f.write(f"<osm{attrs}>")
        for t in ("node", "way", "relation"):
            sub = ds.filter(expr=f"type == '{t}'")
            for chunk in sub.map_batches(
                    lambda b: pa.table({"s": [serialize_xml_elements(b)],
                                        "n": [b.num_rows]}),
                    batch_format="pyarrow").iter_rows():
                if chunk["n"]:
                    f.write(chunk["s"])
                    rows += chunk["n"]
        f.write("</osm>")
    return rows
