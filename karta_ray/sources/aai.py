"""ESRI ASCII grid (.asc) reader/writer.

Semantics per the reference (karta/raster/_aai.py:5-82): header keys are
case-insensitive, corner and center references are interconvertible via
half a cellsize, nodata values become NaN. Row order in the file is
north-to-south; the returned values array is south-up (row 0 at y0),
matching karta's ``read_aai`` flip (karta/raster/read.py:9-21).
"""

from __future__ import annotations

import numpy as np

_HEADER_KEYS = {"nrows", "ncols", "yllcenter", "xllcenter", "yllcorner",
                "xllcorner", "cellsize", "nodata_value"}


def read_aai(path: str):
    """Returns (values[ny, nx] float64 south-up, transform 6-tuple,
    nodata=NaN)."""
    hdr = {}
    data_lines = []
    with open(path) as f:
        for line in f:
            parts = line.split(None, 1)
            if parts and parts[0].lower() in _HEADER_KEYS and len(hdr) < 8 \
                    and not data_lines:
                hdr[parts[0].lower()] = float(parts[1])
            else:
                data_lines.append(line)

    for k in ("ncols", "nrows", "cellsize"):
        if k not in hdr:
            raise ValueError(f"{k.upper()} not set in header")
    d = hdr["cellsize"]
    if "xllcorner" not in hdr:
        if "xllcenter" not in hdr:
            raise ValueError("XLL reference not set in header")
        hdr["xllcorner"] = hdr["xllcenter"] - d / 2.0
    if "yllcorner" not in hdr:
        if "yllcenter" not in hdr:
            raise ValueError("YLL reference not set in header")
        hdr["yllcorner"] = hdr["yllcenter"] - d / 2.0
    nodata = hdr.get("nodata_value", -9999.0)

    values = np.array([[float(v) for v in ln.split()] for ln in data_lines
                       if ln.strip()], dtype=np.float64)
    if values.shape != (int(hdr["nrows"]), int(hdr["ncols"])):
        raise ValueError("data shape does not match header")
    values[values == nodata] = np.nan
    values = values[::-1]  # file is north-down; store south-up
    transform = (hdr["xllcorner"], hdr["yllcorner"], d, d, 0.0, 0.0)
    return values, transform, np.nan


def write_aai(path: str, values, transform, nodata=-9999.0,
              reference: str = "corner"):
    """Write a south-up values array as an .asc file
    (karta/raster/grid.py:1066-1139 semantics)."""
    x0, y0, dx, dy, sx, sy = transform
    if sx or sy:
        raise ValueError("cannot write skewed grid to ASCII")
    if dx != dy:
        raise ValueError("cannot write anisotropic grid to ASCII")
    ny, nx = values.shape
    data = np.where(np.isnan(values), nodata, values)[::-1]
    with open(path, "w") as f:
        f.write(f"NCOLS {nx}\nNROWS {ny}\n")
        if reference == "center":
            f.write(f"XLLCENTER {x0 + dx / 2.0}\nYLLCENTER {y0 + dy / 2.0}\n")
        else:
            f.write(f"XLLCORNER {float(x0)}\nYLLCORNER {float(y0)}\n")
        f.write(f"CELLSIZE {float(dx)}\nNODATA_VALUE {nodata}\n")
        for row in data:
            f.write(" ".join(str(v) for v in row) + "\n")
