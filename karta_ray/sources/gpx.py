"""GPX reader + writer (waypoints, tracks, routes) -> Arrow tables,
no external deps.

Reference semantics (karta/vector/_gpx.py, karta/vector/read.py:214-233):
- waypoint lon/lat attributes are rounded to 6 decimals
  (_gpx.py:85-86);
- child elements of <wpt>/<trk> (name, ele, time, ...) become free-form
  properties, <extensions> excluded (_gpx.py:74-80);
- tracks contain track segments contain track points; each segment
  becomes one polyline member; routes contain route points directly
  (_gpx.py:175-180 parse_rte);
- write path (_gpx.py:288-307 as_string/writefile): GPX 1.1 namespace,
  creator attribute, one child element per property; keys outside the
  GPX 1.1 property vocabulary go under <extensions>
  (_gpx.py:27-29 VALID_PROPERTIES, :183-196 add_waypoint).

Columnar mapping: waypoints -> one row per <wpt> with lon/lat (+
property columns); tracks -> one row per <trkseg> in the members-table
layout (geom_id, kind='line', vertices) with per-vertex elevations as a
list column when present; routes -> one row per <rte> in the same
layout.
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


def read_gpx_routes(path: str) -> pa.Table:
    """<rte> elements -> members-table rows (geom_id, kind, vertices,
    ele, name) — one row per route (reference parse_rte,
    _gpx.py:175-180: route points sit directly under <rte>)."""
    root = ET.parse(path).getroot()
    gids = []
    verts = []
    eles = []
    names = []
    gid = 0
    for rte in root:
        if _strip(rte.tag) != "rte":
            continue
        name = None
        for child in rte:
            if _strip(child.tag) == "name" and child.text:
                name = " ".join(child.text.split())
        pts = []
        el = []
        for pt in rte:
            if _strip(pt.tag) != "rtept":
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


# GPX 1.1 point-level property vocabulary (reference VALID_PROPERTIES,
# _gpx.py:27-29); anything else is written under <extensions>
VALID_PROPERTIES = ("ele", "time", "magvar", "geoidheight", "name", "cmt",
                    "desc", "src", "link", "sym", "type", "fix", "sat",
                    "hdop", "vdop", "pdop", "ageofdgpsdata", "dgpsid")

_GPX_NS = "http://www.topografix.com/GPX/1/1"


def _fmt_coord(v: float) -> str:
    # shortest repr (reference writes str(float), _gpx.py:105)
    return repr(round(float(v), 6))


def _append_props(el, props: dict) -> None:
    """One child element per property, extensions grouped under an
    <extensions> node (reference _dict2gpx/_extensions2gpx,
    _gpx.py:93-104)."""
    ext = {k: v for k, v in props.items()
           if k not in VALID_PROPERTIES and v is not None}
    for k, v in props.items():
        if k in VALID_PROPERTIES and v is not None:
            sub = ET.SubElement(el, k)
            sub.text = str(v)
    if ext:
        e = ET.SubElement(el, "extensions")
        for k, v in ext.items():
            sub = ET.SubElement(e, k)
            sub.text = str(v)


def _point_el(parent, tag: str, lon: float, lat: float, props: dict):
    el = ET.SubElement(parent, tag, lon=_fmt_coord(lon),
                       lat=_fmt_coord(lat))
    _append_props(el, props)
    return el


def gpx_string(waypts: pa.Table | None = None,
               tracks: pa.Table | None = None,
               routes: pa.Table | None = None) -> str:
    """Serialize Arrow tables to a GPX 1.1 document string (reference
    GPX.as_string, _gpx.py:288-303).

    ``waypts``: (lon, lat, <prop/extension columns...>) — the
    read_gpx_waypts layout. ``tracks`` / ``routes``: members-table rows
    (geom_id, vertices, ele?, name?) — the read_gpx_tracks /
    read_gpx_routes layout; each track row becomes one <trk> with one
    <trkseg>."""
    root = ET.Element("gpx", version="1.1", creator="karta-ray",
                      xmlns=_GPX_NS)

    if waypts is not None and waypts.num_rows:
        lons = waypts.column("lon").to_pylist()
        lats = waypts.column("lat").to_pylist()
        prop_cols = [c for c in waypts.column_names
                     if c not in ("lon", "lat")]
        cols = {c: waypts.column(c).to_pylist() for c in prop_cols}
        for i in range(waypts.num_rows):
            props = {c: cols[c][i] for c in prop_cols
                     if cols[c][i] is not None}
            _point_el(root, "wpt", lons[i], lats[i], props)

    def _write_lines(table, container_tag, point_tag, nest_seg):
        from ..functions.arrays import nested_vertices_to_arrays

        vlist = nested_vertices_to_arrays(table.column("vertices"))
        eles = (table.column("ele").to_pylist()
                if "ele" in table.column_names else [None] * len(vlist))
        names = (table.column("name").to_pylist()
                 if "name" in table.column_names else [None] * len(vlist))
        for verts, ele, name in zip(vlist, eles, names):
            cont = ET.SubElement(root, container_tag)
            if name is not None:
                sub = ET.SubElement(cont, "name")
                sub.text = str(name)
            holder = ET.SubElement(cont, "trkseg") if nest_seg else cont
            for j, (lon, lat) in enumerate(verts):
                props = {}
                if ele is not None and j < len(ele) and ele[j] is not None:
                    props["ele"] = repr(ele[j])
                _point_el(holder, point_tag, lon, lat, props)

    if tracks is not None and tracks.num_rows:
        _write_lines(tracks, "trk", "trkpt", nest_seg=True)
    if routes is not None and routes.num_rows:
        _write_lines(routes, "rte", "rtept", nest_seg=False)

    return ET.tostring(root, encoding="unicode")


def write_gpx(path: str, waypts: pa.Table | None = None,
              tracks: pa.Table | None = None,
              routes: pa.Table | None = None) -> None:
    """GPX.writefile equivalent (_gpx.py:305-307)."""
    with open(path, "w") as f:
        f.write(gpx_string(waypts=waypts, tracks=tracks, routes=routes))


def track_lengths(table: pa.Table, crs) -> np.ndarray:
    """Geodesic length of each track segment (meters)."""
    from ..functions.arrays import nested_vertices_to_arrays
    from ..kernels.lines import line_length

    return np.array([line_length(v, crs)
                     for v in nested_vertices_to_arrays(
                         table.column("vertices"))])
