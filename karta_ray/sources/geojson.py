"""GeoJSON fixture loader (karta ``read_geojson``, karta/vector/read.py:
52-134): parses Feature/FeatureCollection/raw-geometry JSON into Arrow
tables and polygon specs. This is a small-fixture reader — canonical
bulk IO is parquet."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa


def _features(obj):
    if obj.get("type") == "FeatureCollection":
        return obj["features"]
    if obj.get("type") == "Feature":
        return [obj]
    return [{"type": "Feature", "geometry": obj, "properties": {}}]


def read_geojson(src: str):
    """Parse GeoJSON text or a file path.

    Returns dict with:
    - "points": Arrow table (geom_id, lon, lat, props)
    - "polygons": list of {"poly_id", "rings", "name", "crs"} specs
      (PolygonSet.from_rings input)
    - "lines": list of {"geom_id", "vertices"}
    """
    if src.lstrip().startswith(("{", "[")):
        obj = json.loads(src)
    else:
        with open(src) as f:
            obj = json.load(f)

    pts = {"geom_id": [], "lon": [], "lat": [], "props": []}
    polys = []
    lines = []
    gid = 0

    def add_point(c, props):
        pts["geom_id"].append(gid)
        pts["lon"].append(float(c[0]))
        pts["lat"].append(float(c[1]))
        pts["props"].append(json.dumps(props, sort_keys=True))

    for feat in _features(obj):
        geom = feat.get("geometry") or {}
        props = feat.get("properties") or {}
        gtype = geom.get("type")
        coords = geom.get("coordinates")
        if gtype == "Point":
            add_point(coords, props)
        elif gtype == "MultiPoint":
            for c in coords:
                add_point(c, props)
        elif gtype == "LineString":
            lines.append({"geom_id": gid,
                          "vertices": np.asarray(coords, dtype=np.float64)[:, :2],
                          "props": props})
        elif gtype == "MultiLineString":
            for part in coords:
                lines.append({"geom_id": gid,
                              "vertices": np.asarray(part, dtype=np.float64)[:, :2],
                              "props": props})
        elif gtype == "Polygon":
            rings = [np.asarray(r, dtype=np.float64)[:, :2] for r in coords]
            # GeoJSON rings are explicitly closed; karta rings are not
            rings = [r[:-1] if len(r) > 1 and np.array_equal(r[0], r[-1])
                     else r for r in rings]
            polys.append({"poly_id": gid, "rings": rings,
                          "name": str(props.get("name", gid)),
                          "crs": "lonlat_wgs84"})
        elif gtype == "MultiPolygon":
            for part in coords:
                rings = [np.asarray(r, dtype=np.float64)[:, :2] for r in part]
                rings = [r[:-1] if len(r) > 1 and np.array_equal(r[0], r[-1])
                         else r for r in rings]
                polys.append({"poly_id": gid, "rings": rings,
                              "name": str(props.get("name", gid)),
                              "crs": "lonlat_wgs84"})
        gid += 1

    return {
        "points": pa.table({
            "geom_id": pa.array(pts["geom_id"], pa.int64()),
            "lon": pa.array(pts["lon"], pa.float64()),
            "lat": pa.array(pts["lat"], pa.float64()),
            "props": pa.array(pts["props"], pa.string()),
        }),
        "polygons": polys,
        "lines": lines,
    }


def to_geojson(points=None, polygons=None) -> str:
    """Debug writer: Arrow points table and/or polygon specs -> GeoJSON
    FeatureCollection string (karta ``as_geojson``)."""
    feats = []
    if points is not None:
        for r in range(points.num_rows):
            feats.append({
                "type": "Feature",
                "geometry": {"type": "Point",
                             "coordinates": [points.column("lon")[r].as_py(),
                                             points.column("lat")[r].as_py()]},
                "properties": json.loads(points.column("props")[r].as_py())
                if "props" in points.column_names else {},
            })
    for p in (polygons or []):
        rings = [np.vstack([r, r[:1]]).tolist() for r in p["rings"]]
        feats.append({
            "type": "Feature",
            "geometry": {"type": "Polygon", "coordinates": rings},
            "properties": {"name": p.get("name", "")},
        })
    return json.dumps({"type": "FeatureCollection", "features": feats})
