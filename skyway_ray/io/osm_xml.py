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


def write_osm_xml(ds, path: str, metadata: dict | None = None) -> int:
    """Materializing sink (format-inherent, like the reference):
    partition by type with three filtered streaming passes, emit
    nodes → ways → relations."""
    metadata = metadata or {}
    rows = 0
    with open(path, "w", encoding="utf-8") as f:
        attrs = "".join(
            f" {k}={quoteattr(v)}" for k, v in metadata.items() if v is not None)
        f.write(f"<osm{attrs}>")
        for t in ("node", "way", "relation"):
            sub = ds.filter(expr=f"type == '{t}'")
            for batch in sub.iter_batches(batch_format="pyarrow"):
                for r in batch.to_pylist():
                    f.write(_serialize_one(r))
                    rows += 1
        f.write("</osm>")
    return rows
