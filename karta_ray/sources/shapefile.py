"""Pure-Python ESRI shapefile reader (.shp + .shx + .dbf), no GDAL.

Replaces the reference's OGR-backed ``read_shapefile``
(karta/vector/read.py:167-209, karta/vector/_shp.py:106-180) for the
formats its test suite exercises — including the shapelib conformance
corpus (tests/data/shapefile/shapelib/*, reference
tests/shapefile_tests.py:251-328):

- shape types: Null(0), Point(1/11/21), MultiPoint(8/18/28),
  PolyLine(3/13/23), Polygon(5/15/25), MultiPatch(31)
- structural mapping mirrors OGR's: a 1-part PolyLine record reads as a
  ``Line``, multi-part as ``Multiline``; a Polygon record with one
  clockwise (outer) ring reads as ``Polygon`` (counter-clockwise rings
  are holes), with several outer rings as ``Multipolygon``; MultiPatch
  reads as ``Multipolygon``
- Z coordinates are preserved (rank 3); M values are parsed past and
  dropped, like the reference pipeline (karta geometries carry x, y, z)
- dBase III attributes: C -> str (stripped), N/F -> int/float,
  L -> bool, D -> ISO date string; deleted records skipped

The binary layout implemented here is the public ESRI shapefile spec
(main-file header: 100 bytes, big-endian file code 9994 + little-endian
shape type and bbox; records: big-endian (number, content-words) header
then little-endian shape payload).
"""

from __future__ import annotations

import os
import struct

import numpy as np

SHAPE_NAMES = {
    0: "Null", 1: "Point", 11: "PointZ", 21: "PointM",
    8: "MultiPoint", 18: "MultiPointZ", 28: "MultiPointM",
    3: "PolyLine", 13: "PolyLineZ", 23: "PolyLineM",
    5: "Polygon", 15: "PolygonZ", 25: "PolygonM",
    31: "MultiPatch",
}

_POINT_TYPES = {1, 11, 21}
_MULTIPOINT_TYPES = {8, 18, 28}
_POLYLINE_TYPES = {3, 13, 23}
_POLYGON_TYPES = {5, 15, 25}
_Z_TYPES = {11, 13, 15, 18, 31}


def _read_shp_records(path: str):
    """Yield (shape_type, payload bytes) per record of a .shp file."""
    with open(path, "rb") as f:
        header = f.read(100)
        if len(header) < 100 or struct.unpack(">i", header[:4])[0] != 9994:
            raise ValueError(f"{path}: not a shapefile (bad file code)")
        file_words = struct.unpack(">i", header[24:28])[0]
        file_bytes = 2 * file_words
        pos = 100
        while pos < file_bytes:
            rec_header = f.read(8)
            if len(rec_header) < 8:
                break
            _, content_words = struct.unpack(">ii", rec_header)
            payload = f.read(2 * content_words)
            pos += 8 + 2 * content_words
            if len(payload) < 4:
                # Malformed/truncated record: yield a Null placeholder so
                # the geometry stream stays positionally aligned with the
                # .dbf attribute rows (read_shapefile zips by index).
                yield 0, b""
                continue
            (stype,) = struct.unpack("<i", payload[:4])
            yield stype, payload


def _parse_points_block(payload, off, n):
    xy = np.frombuffer(payload, dtype="<f8", count=2 * n,
                       offset=off).reshape(n, 2)
    return xy, off + 16 * n


def _parse_z_block(payload, off, n):
    """Optional Z (or M) block: [min, max] + n doubles. Returns (vals,
    newoff) or (None, off) when the record ends first."""
    need = 16 + 8 * n
    if off + need > len(payload):
        return None, off
    vals = np.frombuffer(payload, dtype="<f8", count=n, offset=off + 16)
    return vals, off + need


def _ring_is_cw(ring: np.ndarray) -> bool:
    x = ring[:, 0]
    y = ring[:, 1]
    return float(np.sum((np.roll(x, -1) - x) * (np.roll(y, -1) + y))) > 0


def _parse_record(stype: int, payload: bytes):
    """One .shp record -> geo-interface-style dict (or None for Null)."""
    if stype == 0:
        return None
    if stype in _POINT_TYPES:
        x, y = struct.unpack("<2d", payload[4:20])
        coords = [x, y]
        if stype == 11 and len(payload) >= 28:  # PointZ: x y z (m)
            coords.append(struct.unpack("<d", payload[20:28])[0])
        return {"type": "Point", "coordinates": coords}

    if stype in _MULTIPOINT_TYPES:
        (n,) = struct.unpack("<i", payload[36:40])
        xy, off = _parse_points_block(payload, 40, n)
        z = None
        if stype == 18:
            z, off = _parse_z_block(payload, off, n)
        pts = np.column_stack([xy, z]) if z is not None else xy
        return {"type": "MultiPoint", "coordinates": pts}

    if stype in _POLYLINE_TYPES or stype in _POLYGON_TYPES or stype == 31:
        nparts, npoints = struct.unpack("<2i", payload[36:44])
        off = 44
        parts = np.frombuffer(payload, dtype="<i4", count=nparts, offset=off)
        off += 4 * nparts
        part_types = None
        if stype == 31:  # MultiPatch: per-part type codes
            part_types = np.frombuffer(payload, dtype="<i4", count=nparts,
                                       offset=off)
            off += 4 * nparts
        xy, off = _parse_points_block(payload, off, npoints)
        z = None
        if stype in _Z_TYPES:
            z, off = _parse_z_block(payload, off, npoints)
        pts = np.column_stack([xy, z]) if z is not None else xy
        bounds = np.append(parts, npoints)
        keep = [i for i in range(nparts) if bounds[i + 1] > bounds[i]]
        chains = [pts[bounds[i]:bounds[i + 1]] for i in keep]
        if part_types is not None:
            part_types = [int(part_types[i]) for i in keep]
        if stype in _POLYLINE_TYPES:
            if len(chains) == 1:
                return {"type": "Line", "coordinates": chains[0]}
            return {"type": "Multiline", "coordinates": chains}
        # Polygon / MultiPatch: organize rings into outer + holes.
        outers = []
        holes = []
        if part_types is not None:
            # MultiPatch: honor the per-part type codes. TriangleStrip(0)
            # and TriangleFan(1) are expanded into their constituent
            # triangles (matching OGR's triangulation) rather than being
            # misread as closed rings; OuterRing(2)/FirstRing(4) are
            # outers, InnerRing(3) holes, Ring(5) classified by winding.
            for ring, ptype in zip(chains, part_types):
                if ptype in (0, 1):  # strip / fan -> triangles
                    for t in range(len(ring) - 2):
                        a = 0 if ptype == 1 else t
                        tri = np.vstack([ring[a], ring[t + 1], ring[t + 2],
                                         ring[a]])
                        outers.append(tri)
                elif ptype == 3:
                    holes.append(ring)
                elif ptype in (2, 4):
                    outers.append(ring)
                elif ptype == 5:
                    (outers if _ring_is_cw(ring[:, :2])
                     else holes).append(ring)
                else:
                    raise TypeError(
                        f"MultiPatch part type {ptype} not handled")
        else:
            # shapefile outer rings are clockwise
            for ring in chains:
                (outers if _ring_is_cw(ring[:, :2]) else holes).append(ring)
        if not outers:  # degenerate: treat every ring as its own outer
            outers, holes = chains, []
        if len(outers) == 1 and stype != 31:
            return {"type": "Polygon", "coordinates": [outers[0]] + holes}
        polys = []
        for o in outers:
            my_holes = []
            for h in holes:
                from ..kernels.predicates import points_in_ring

                if len(h) and points_in_ring(
                        h[:1, 0], h[:1, 1], o[:, :2])[0]:
                    my_holes.append(h)
            polys.append([o] + my_holes)
        return {"type": "Multipolygon", "coordinates": polys}

    raise TypeError(f"shape type {stype} ({SHAPE_NAMES.get(stype)}) "
                    "not handled")


def read_dbf(path: str):
    """dBase III attribute records -> (fieldnames, list of dicts)."""
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 32:
        return [], []
    n_records = struct.unpack("<i", data[4:8])[0]
    header_size, record_size = struct.unpack("<2h", data[8:12])
    fields = []
    off = 32
    while off < header_size - 1 and data[off] != 0x0D:
        desc = data[off:off + 32]
        name = desc[:11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(desc[11])
        flen = desc[16]
        fdec = desc[17]
        fields.append((name, ftype, flen, fdec))
        off += 32

    def convert(ftype, fdec, raw: bytes):
        text = raw.decode("latin-1").strip()
        if ftype in ("N", "F"):
            if not text:
                return None
            try:
                return (float(text) if (fdec > 0 or "." in text)
                        else int(text))
            except ValueError:  # dBase overflow markers like '******'
                return None
        if ftype == "L":
            return text.upper() in ("T", "Y")
        if ftype == "D" and len(text) == 8:
            return f"{text[:4]}-{text[4:6]}-{text[6:8]}"
        return text

    records = []
    pos = header_size
    for _ in range(n_records):
        rec = data[pos:pos + record_size]
        pos += record_size
        if len(rec) < record_size:
            continue
        if rec[:1] == b"*":
            # deletion-flagged dBase record: keep an EMPTY placeholder
            # so attribute rows stay positionally aligned with .shp
            # records (OGR preserves row alignment too)
            records.append({})
            continue
        row = {}
        o = 1
        for name, ftype, flen, fdec in fields:
            row[name] = convert(ftype, fdec, rec[o:o + flen])
            o += flen
        records.append(row)
    return [f[0] for f in fields], records


def read_shapefile(path: str):
    """Read ``path`` (with or without the .shp extension) -> list of
    geometry dicts {type, coordinates, properties}. Null-shape records
    are skipped (matching OGR, which yields no geometry for them)."""
    base, ext = os.path.splitext(path)
    if ext.lower() not in ("", ".shp"):
        base = path
    shp_path = base + ".shp"
    dbf_path = base + ".dbf"
    props = []
    if os.path.exists(dbf_path):
        _, props = read_dbf(dbf_path)
    out = []
    for i, (stype, payload) in enumerate(_read_shp_records(shp_path)):
        geom = _parse_record(stype, payload)
        if geom is None:
            continue
        geom["properties"] = props[i] if i < len(props) else {}
        out.append(geom)
    return out


def shapefile_members_table(path: str):
    """Shapefile -> the engine's members-table Arrow layout
    (geom_id, kind, vertices) + one column per dBase attribute, ready
    for the geometry-set join stages. Multi-part geometries contribute
    one member row per part/ring."""
    import pyarrow as pa

    geoms = read_shapefile(path)
    ids = []
    kinds = []
    verts = []
    row_props = []

    def push(gid, kind, chain, props):
        ids.append(gid)
        kinds.append(kind)
        verts.append(np.asarray(chain, dtype=np.float64)[:, :2].tolist())
        row_props.append(props)

    for gid, g in enumerate(geoms):
        t = g["type"]
        if t == "Point":
            push(gid, "point", [g["coordinates"][:2]], g["properties"])
        elif t == "MultiPoint":
            push(gid, "point_set", g["coordinates"], g["properties"])
        elif t == "Line":
            push(gid, "line", g["coordinates"], g["properties"])
        elif t == "Multiline":
            for c in g["coordinates"]:
                push(gid, "line", c, g["properties"])
        elif t == "Polygon":
            for r, ring in enumerate(g["coordinates"]):
                push(gid, "polygon" if r == 0 else "hole", ring,
                     g["properties"])
        else:  # Multipolygon
            for rings in g["coordinates"]:
                for r, ring in enumerate(rings):
                    push(gid, "polygon" if r == 0 else "hole", ring,
                         g["properties"])

    table = {
        "geom_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "vertices": pa.array(verts, pa.list_(pa.list_(pa.float64(), 2))),
    }
    all_keys = []
    for p in row_props:
        for k in p:
            if k not in all_keys:
                all_keys.append(k)
    for k in all_keys:
        table[k] = pa.array([p.get(k) for p in row_props])
    return pa.table(table)


# ---------------------------------------------------------------------------
# Writer (.shp + .shx + .dbf), pure Python
# ---------------------------------------------------------------------------

_TYPE_CODES = {"Point": 1, "MultiPoint": 8, "Line": 3, "Multiline": 3,
               "Polygon": 5, "Multipolygon": 5}


def _dbf_field_spec(values):
    """dBase (type, length, decimals) for a column, mirroring the
    reference's inference (_shp.py:53-89: ints -> 32-wide N, reals ->
    N with decimals, strings -> 180-wide C, bools -> L)."""
    sample = next((v for v in values if v is not None), "")
    if isinstance(sample, bool):
        return ("L", 1, 0)
    if isinstance(sample, (int, np.integer)):
        return ("N", 32, 0)
    if isinstance(sample, (float, np.floating)):
        return ("N", 32, 10)
    return ("C", 180, 0)


def _dbf_keys(keys):
    """10-char uppercase names with the reference's de-clash rule
    (_shp.py:227-244: truncate, then suffix 2, 3, ...)."""
    out = {}
    for k in keys:
        name = str(k)[:10].upper()
        i = 2
        while name in out.values():
            name = name[:-len(str(i))] + str(i)
            i += 1
        out[k] = name
    return out


def _write_dbf(path: str, keys, rows):
    import datetime

    mapping = _dbf_keys(keys)
    specs = {k: _dbf_field_spec([r.get(k) for r in rows]) for k in keys}
    header_size = 32 + 32 * len(keys) + 1
    record_size = 1 + sum(specs[k][1] for k in keys)
    now = datetime.date(1999, 12, 31)  # deterministic timestamp
    with open(path, "wb") as f:
        f.write(struct.pack("<B3BIHH20x", 3, now.year - 1900, now.month,
                            now.day, len(rows), header_size, record_size))
        for k in keys:
            ftype, flen, fdec = specs[k]
            f.write(struct.pack("<11sc4xBB14x",
                                mapping[k].encode("ascii")[:11],
                                ftype.encode("ascii"), flen, fdec))
        f.write(b"\x0d")
        for r in rows:
            f.write(b" ")
            for k in keys:
                ftype, flen, fdec = specs[k]
                v = r.get(k)
                if v is None:
                    text = ""
                elif ftype == "L":
                    text = "T" if v else "F"
                elif ftype == "N" and fdec > 0:
                    text = f"{float(v):.{fdec}f}"
                elif ftype == "N":
                    text = str(int(v))
                else:
                    text = str(v)
                raw = text.encode("latin-1", "replace")[:flen]
                if ftype == "N":
                    raw = raw.rjust(flen)
                else:
                    raw = raw.ljust(flen)
                f.write(raw)


def _shape_payload(geom) -> bytes:
    t = geom["type"]
    code = _TYPE_CODES[t]
    if t == "Point":
        x, y = geom["coordinates"][:2]
        return struct.pack("<i2d", 1, float(x), float(y))
    if t == "MultiPoint":
        pts = np.asarray(geom["coordinates"], dtype=np.float64)[:, :2]
        bbox = (pts[:, 0].min(), pts[:, 1].min(),
                pts[:, 0].max(), pts[:, 1].max())
        return (struct.pack("<i4di", 8, *bbox, len(pts))
                + pts.astype("<f8").tobytes())
    # polyline / polygon: list of parts
    if t == "Line":
        parts = [np.asarray(geom["coordinates"], dtype=np.float64)[:, :2]]
    elif t == "Multiline":
        parts = [np.asarray(c, dtype=np.float64)[:, :2]
                 for c in geom["coordinates"]]
    elif t == "Polygon":
        parts = [_oriented_ring(r, outer=(i == 0))
                 for i, r in enumerate(geom["coordinates"])]
    else:  # Multipolygon
        parts = [_oriented_ring(r, outer=(i == 0))
                 for rings in geom["coordinates"]
                 for i, r in enumerate(rings)]
    allpts = np.vstack(parts)
    bbox = (allpts[:, 0].min(), allpts[:, 1].min(),
            allpts[:, 0].max(), allpts[:, 1].max())
    offsets = np.cumsum([0] + [len(p) for p in parts[:-1]]).astype("<i4")
    return (struct.pack("<i4d2i", code, *bbox, len(parts), len(allpts))
            + offsets.tobytes() + allpts.astype("<f8").tobytes())


def _close_ring(ring: np.ndarray) -> np.ndarray:
    if len(ring) and not np.array_equal(ring[0], ring[-1]):
        return np.vstack([ring, ring[:1]])
    return ring


def _oriented_ring(ring, *, outer: bool) -> np.ndarray:
    """Close a polygon ring and normalize winding to the ESRI spec
    (outer rings clockwise, holes counter-clockwise), regardless of the
    caller's convention — read_shapefile classifies outer vs hole purely
    by winding, so an un-normalized CCW outer (the GeoJSON convention)
    would round-trip misclassified."""
    r = _close_ring(np.asarray(ring, dtype=np.float64)[:, :2])
    if len(r) >= 4 and _ring_is_cw(r) != outer:
        r = r[::-1]
    return r


def write_shapefile(path: str, geoms):
    """Write geometry dicts ({type, coordinates, properties}) to
    ``path``.shp/.shx/.dbf. All records must share one shape type
    family (the shapefile format constraint)."""
    base, ext = os.path.splitext(path)
    if ext.lower() != ".shp":
        base = path
    codes = {_TYPE_CODES[g["type"]] for g in geoms}
    if len(codes) > 1:
        raise ValueError("shapefile records must share one shape type")
    code = codes.pop() if codes else 0

    payloads = [_shape_payload(g) for g in geoms]
    allpts = []
    for g in geoms:
        c = g["coordinates"]
        if g["type"] == "Point":
            allpts.append([c[:2]])
        elif g["type"] == "MultiPoint":
            allpts.append(np.asarray(c, dtype=np.float64)[:, :2])
        elif g["type"] in ("Line",):
            allpts.append(np.asarray(c, dtype=np.float64)[:, :2])
        elif g["type"] == "Multiline":
            allpts.extend(np.asarray(p, dtype=np.float64)[:, :2] for p in c)
        elif g["type"] == "Polygon":
            allpts.extend(np.asarray(r, dtype=np.float64)[:, :2] for r in c)
        else:
            allpts.extend(np.asarray(r, dtype=np.float64)[:, :2]
                          for rings in c for r in rings)
    pts = np.vstack(allpts) if allpts else np.zeros((1, 2))
    bbox = (pts[:, 0].min(), pts[:, 1].min(),
            pts[:, 0].max(), pts[:, 1].max())

    shp_len = 100 + sum(8 + len(p) for p in payloads)
    header = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
    with open(base + ".shp", "wb") as f, open(base + ".shx", "wb") as x:
        for fh, length in ((f, shp_len),
                           (x, 100 + 8 * len(payloads))):
            fh.write(header + struct.pack(">i", length // 2)
                     + struct.pack("<2i4d4d", 1000, code, *bbox,
                                   0.0, 0.0, 0.0, 0.0))
        pos = 100
        for i, p in enumerate(payloads):
            f.write(struct.pack(">2i", i + 1, len(p) // 2) + p)
            x.write(struct.pack(">2i", pos // 2, len(p) // 2))
            pos += 8 + len(p)

    keys = []
    for g in geoms:
        for k in g.get("properties", {}):
            if k not in keys:
                keys.append(k)
    _write_dbf(base + ".dbf", keys,
               [g.get("properties", {}) for g in geoms])
