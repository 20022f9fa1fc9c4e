"""GPX reader (waypoints + tracks) -> Arrow tables, no external deps.

Reference semantics (karta/vector/_gpx.py, karta/vector/read.py:214-233):
- waypoint lon/lat attributes are rounded to 6 decimals
  (_gpx.py:85-86);
- child elements of <wpt>/<trk> (name, ele, time, ...) become free-form
  properties, <extensions> excluded (_gpx.py:74-80);
- tracks contain track segments contain track points; each segment
  becomes one polyline member.

Columnar mapping: waypoints -> one row per <wpt> with lon/lat (+
property columns); tracks -> one row per <trkseg> in the members-table
layout (geom_id, kind='line', vertices) with per-vertex elevations as a
list column when present.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa


def _strip(tag: str) -> str:
    """Remove the XML namespace (reference strip_namespace,
    _gpx.py:31-32)."""
    return tag.split("}")[-1]


def _properties(node) -> dict:
    out = {}
    for child in node:
        tag = _strip(child.tag)
        if tag == "extensions" or len(child):
            continue
        if child.text is not None and child.text.strip():
            out[tag] = child.text.strip()
    return out


def read_gpx_waypts(path: str) -> pa.Table:
    """<wpt> elements -> Arrow table (lon, lat, <props...>)."""
    root = ET.parse(path).getroot()
    lons = []
    lats = []
    props = []
    for node in root:
        if _strip(node.tag) != "wpt":
            continue
        lons.append(round(float(node.attrib["lon"]), 6))
        lats.append(round(float(node.attrib["lat"]), 6))
        props.append(_properties(node))
    cols = {"lon": pa.array(lons, pa.float64()),
            "lat": pa.array(lats, pa.float64())}
    keys = []
    for p in props:
        for k in p:
            if k not in keys:
                keys.append(k)
    for k in keys:
        cols[k] = pa.array([p.get(k) for p in props])
    return pa.table(cols)


def read_gpx_tracks(path: str) -> pa.Table:
    """<trk>/<trkseg> elements -> members-table rows
    (geom_id, kind, vertices, ele, name)."""
    root = ET.parse(path).getroot()
    gids = []
    verts = []
    eles = []
    names = []
    gid = 0
    for trk in root:
        if _strip(trk.tag) != "trk":
            continue
        name = None
        for child in trk:
            if _strip(child.tag) == "name" and child.text:
                name = " ".join(child.text.split())
        for seg in trk:
            if _strip(seg.tag) != "trkseg":
                continue
            pts = []
            el = []
            for pt in seg:
                if _strip(pt.tag) != "trkpt":
                    continue
                pts.append([round(float(pt.attrib["lon"]), 6),
                            round(float(pt.attrib["lat"]), 6)])
                e = None
                for c in pt:
                    if _strip(c.tag) == "ele" and c.text:
                        e = float(c.text)
                el.append(e)
            if pts:
                gids.append(gid)
                verts.append(pts)
                eles.append(el)
                names.append(name)
                gid += 1
    return pa.table({
        "geom_id": pa.array(gids, pa.int64()),
        "kind": pa.array(["line"] * len(gids), pa.string()),
        "vertices": pa.array(verts, pa.list_(pa.list_(pa.float64(), 2))),
        "ele": pa.array(eles, pa.list_(pa.float64())),
        "name": pa.array(names, pa.string()),
    })


def track_lengths(table: pa.Table, crs) -> np.ndarray:
    """Geodesic length of each track segment (meters)."""
    from ..functions.arrays import nested_vertices_to_arrays
    from ..kernels.lines import line_length

    return np.array([line_length(v, crs)
                     for v in nested_vertices_to_arrays(
                         table.column("vertices"))])
