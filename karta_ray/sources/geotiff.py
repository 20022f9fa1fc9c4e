"""Pure-Python GeoTIFF reader/writer (no GDAL dependency).

Replaces the reference's GDAL binding (karta/raster/_gdal.py:114-250,
karta/raster/read.py:27-111) with a from-scratch classic-TIFF codec:

- baseline TIFF 6.0 structure, little- or big-endian on read,
  little-endian on write;
- strip AND tile organisation on read, strips on write;
- compressions: none (1), LZW (5, with TIFF "early change" semantics),
  Deflate (8, plus legacy 32946), PackBits (32773);
- horizontal-differencing predictor (317 = 2) for integer samples;
- sample formats uint/int/float at 8/16/32/64 bits (the reference's
  GDT_* ladder, karta/raster/_gdal.py:27-45);
- multi-band images, chunky (PlanarConfiguration=1) and planar (=2);
- GeoTIFF georeferencing: ModelPixelScale+ModelTiepoint or a full
  ModelTransformation matrix for sheared grids, GeoKeyDirectory with
  EPSG codes for the CRSs this engine knows closed forms for, and a
  citation fallback tag for the rest;
- GDAL's ASCII nodata convention (tag 42113).

Array convention matches the rest of the raster stack: values are
SOUTH-UP (row 0 at the grid's y origin) with karta's 6-tuple affine
``(x0, y0, dx, dy, sx, sy)`` of the lower-left corner
(karta/raster/grid.py:90-140); TIFF files store rows north-down, so the
codec flips on the way in/out.

Scale path: :func:`read_geotiff_dataset` parses only the IFD on the
driver (a few KB) and fans the strip ranges out to Ray tasks — each task
seeks to its byte ranges, decodes, and emits tile records compatible
with ``stages.raster`` — so a continental mosaic of GeoTIFFs becomes a
Dataset without any single process holding a full grid.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# --- TIFF tag ids ----------------------------------------------------------
_T_WIDTH = 256
_T_LENGTH = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES_PER_PX = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317
_T_TILE_WIDTH = 322
_T_TILE_LENGTH = 323
_T_TILE_OFFSETS = 324
_T_TILE_COUNTS = 325
_T_SAMPLE_FORMAT = 339
_T_PIXEL_SCALE = 33550
_T_TIEPOINT = 33922
_T_TRANSFORMATION = 34264
_T_GEO_KEYS = 34735
_T_GEO_DOUBLES = 34736
_T_GEO_ASCII = 34737
_T_GDAL_NODATA = 42113

# field types: (struct fmt char, byte size)
_FIELD = {1: ("B", 1), 2: ("c", 1), 3: ("H", 2), 4: ("I", 4),
          6: ("b", 1), 8: ("h", 2), 9: ("i", 4), 11: ("f", 4),
          12: ("d", 8), 16: ("Q", 8), 17: ("q", 8)}

# (sample_format, bits) <-> numpy dtype; covers the reference's full
# GDT ladder (karta/raster/_gdal.py:27-45) including the complex IEEE
# types (TIFF SAMPLEFORMAT_COMPLEXIEEEFP = 6: GDAL CFloat32/CFloat64).
_DTYPES = {(1, 8): "u1", (1, 16): "u2", (1, 32): "u4", (1, 64): "u8",
           (2, 8): "i1", (2, 16): "i2", (2, 32): "i4", (2, 64): "i8",
           (3, 32): "f4", (3, 64): "f8", (6, 64): "c8", (6, 128): "c16"}
_DTYPES_INV = {v: k for k, v in _DTYPES.items()}

# CRS tag -> (GTModelType, EPSG code) for CRSs with a closed-form EPSG
# identity; everything else round-trips through the citation key.
_CRS_EPSG = {"lonlat_wgs84": (2, 4326), "webmercator": (1, 3857),
             "ups_north": (1, 32661), "ups_south": (1, 32761),
             "nsidc_north": (1, 3413), "nsidc_south": (1, 3976)}
_EPSG_CRS = {epsg: tag for tag, (_m, epsg) in _CRS_EPSG.items()}

_GK_MODEL = 1024
_GK_RASTER = 1025
_GK_CITATION = 1026
_GK_GEOGRAPHIC = 2048
_GK_PROJECTED = 3072


# --------------------------------------------------------------------------
# compression codecs
# --------------------------------------------------------------------------

def _packbits_encode(data: bytes) -> bytes:
    """Apple PackBits RLE (TIFF 6.0 §9)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # run of >= 2 identical bytes -> replicate record
        j = i
        while j + 1 < n and data[j + 1] == data[j] and j - i < 127:
            j += 1
        if j > i:
            out.append(257 - (j - i + 1) & 0xFF)
            out.append(data[i])
            i = j + 1
            continue
        # literal run up to the next 3-byte replicate or 128 bytes
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        h = data[i]
        i += 1
        if h < 128:
            out += data[i:i + h + 1]
            i += h + 1
        elif h > 128:
            out += data[i:i + 1] * (257 - h)
            i += 1
        # h == 128: no-op
    return bytes(out[:expected])


_LZW_CLEAR, _LZW_EOI = 256, 257


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW (MSB-first bit order, "early change": the code
    width bumps one code before the table fills — TIFF 6.0 §13)."""
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    emit(_LZW_CLEAR, width)
    w = b""
    for b in data:
        c = bytes([b])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:
            emit(_LZW_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        w = c
    if w:
        emit(table[w], width)
    emit(_LZW_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    acc = nbits = 0
    pos, n = 0, len(data)
    prev = b""
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                return bytes(out[:expected])
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            table = table[:258]
            width = 9
            prev = b""
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        if prev:
            table.append(prev + entry[:1])
            # the decoder's table lags the encoder's by one entry, so
            # the "early change" bump fires one entry sooner here
            if len(table) == (1 << width) - 2 and width < 12:
                width += 1
        prev = entry
    return bytes(out[:expected])


def _decompress(data: bytes, comp: int, expected: int) -> bytes:
    if comp == 1:
        return data[:expected]
    if comp in (8, 32946):
        return zlib.decompress(data)[:expected]
    if comp == 5:
        return _lzw_decode(data, expected)
    if comp == 32773:
        return _packbits_decode(data, expected)
    raise ValueError(f"unsupported TIFF compression {comp} "
                     "(supported: none, LZW, deflate, packbits)")


def _compress(data: bytes, comp: int) -> bytes:
    if comp == 1:
        return data
    if comp == 8:
        return zlib.compress(data, 6)
    if comp == 5:
        return _lzw_encode(data)
    if comp == 32773:
        return _packbits_encode(data)
    raise AssertionError(comp)


# --------------------------------------------------------------------------
# IFD parsing
# --------------------------------------------------------------------------

def _decode_tag(raw: bytes, ftype: int, count: int, e: str):
    fmt, _ = _FIELD[ftype]
    if ftype == 2:
        return (raw.split(b"\0")[0].decode("ascii", "replace"),)
    return struct.unpack(e + fmt * count, raw)


def _read_ifd(buf: bytes):
    """Parse the first IFD from an in-memory TIFF. Returns
    (tags, endian_prefix) where tags maps tag id -> tuple of values."""
    if buf[:2] == b"II":
        e = "<"
    elif buf[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF file (bad byte-order mark)")
    magic, off = struct.unpack(e + "HI", buf[2:8])
    if magic != 42:
        raise ValueError("not a classic TIFF file")
    n = struct.unpack_from(e + "H", buf, off)[0]
    tags = {}
    for k in range(n):
        tag, ftype, count = struct.unpack_from(e + "HHI", buf, off + 2 + k * 12)
        if ftype not in _FIELD:
            continue
        fmt, size = _FIELD[ftype]
        total = size * count
        if total <= 4:
            raw = buf[off + 2 + k * 12 + 8: off + 2 + k * 12 + 8 + total]
        else:
            voff = struct.unpack_from(e + "I", buf, off + 2 + k * 12 + 8)[0]
            raw = buf[voff:voff + total]
            if len(raw) < total:
                raise IndexError("tag value beyond buffer")
        tags[tag] = _decode_tag(raw, ftype, count, e)
    return tags, e


def _read_ifd_file(f):
    """Seek-based first-IFD parse of an open binary file: 8-byte
    header -> seek to the IFD -> one read for the entry table -> one
    seek+read per out-of-line tag value. libtiff/GDAL commonly append
    the IFD at the END of the file, so a prefix slurp would pull the
    whole raster through the driver; this touches only
    O(tags + value tables) bytes for any file size."""
    f.seek(0)
    head = f.read(8)
    if head[:2] == b"II":
        e = "<"
    elif head[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF file (bad byte-order mark)")
    magic, off = struct.unpack(e + "HI", head[2:8])
    if magic != 42:
        raise ValueError("not a classic TIFF file")
    f.seek(off)
    n = struct.unpack(e + "H", f.read(2))[0]
    entries = f.read(n * 12)
    if len(entries) < n * 12:
        raise ValueError("truncated TIFF IFD")
    tags = {}
    deferred = []
    for k in range(n):
        tag, ftype, count = struct.unpack_from(e + "HHI", entries, k * 12)
        if ftype not in _FIELD:
            continue
        fmt, size = _FIELD[ftype]
        total = size * count
        if total <= 4:
            raw = entries[k * 12 + 8: k * 12 + 8 + total]
            tags[tag] = _decode_tag(raw, ftype, count, e)
        else:
            voff = struct.unpack_from(e + "I", entries, k * 12 + 8)[0]
            deferred.append((tag, ftype, count, total, voff))
    # out-of-line values in file order (sequential-friendly seeks)
    for tag, ftype, count, total, voff in sorted(deferred, key=lambda d: d[4]):
        f.seek(voff)
        raw = f.read(total)
        if len(raw) < total:
            raise ValueError("TIFF tag value beyond end of file")
        tags[tag] = _decode_tag(raw, ftype, count, e)
    return tags, e


def _tag1(tags, tid, default=None):
    v = tags.get(tid)
    return v[0] if v else default


def read_geotiff_info(path: str) -> dict:
    """Parse only the header/IFD of a GeoTIFF: shape, dtype, bands,
    transform, CRS, nodata, and the chunk (strip/tile) byte ranges.
    Seek-based (_read_ifd_file): touches O(tags) bytes no matter where
    the IFD sits (libtiff/GDAL often append it at the END of the file),
    so the driver never slurps a multi-GB raster to learn its layout."""
    with open(path, "rb") as f:
        tags, e = _read_ifd_file(f)

    nx = _tag1(tags, _T_WIDTH)
    ny = _tag1(tags, _T_LENGTH)
    if nx is None or ny is None:
        raise ValueError("TIFF missing ImageWidth/ImageLength")
    spp = _tag1(tags, _T_SAMPLES_PER_PX, 1)
    bits = tags.get(_T_BITS, (8,))[0]
    sfmt = tags.get(_T_SAMPLE_FORMAT, (1,))[0]
    key = (sfmt, bits)
    if key not in _DTYPES:
        raise ValueError(f"unsupported sample format/bits {key}")
    dtype = np.dtype(e + _DTYPES[key][0] + str(bits // 8))

    tiled = _T_TILE_OFFSETS in tags
    if tiled:
        offsets = tags[_T_TILE_OFFSETS]
        counts = tags[_T_TILE_COUNTS]
        cw = _tag1(tags, _T_TILE_WIDTH)
        ch = _tag1(tags, _T_TILE_LENGTH)
    else:
        offsets = tags[_T_STRIP_OFFSETS]
        counts = tags[_T_STRIP_COUNTS]
        cw = nx
        ch = _tag1(tags, _T_ROWS_PER_STRIP, ny)

    info = {
        "nx": nx, "ny": ny, "nbands": spp, "dtype": dtype,
        "compression": _tag1(tags, _T_COMPRESSION, 1),
        "predictor": _tag1(tags, _T_PREDICTOR, 1),
        "planar": _tag1(tags, _T_PLANAR, 1),
        "tiled": tiled, "chunk_w": cw, "chunk_h": ch,
        "offsets": list(offsets), "counts": list(counts),
        "endian": e,
    }

    nd = _tag1(tags, _T_GDAL_NODATA)
    if nd is not None:
        try:
            info["nodata"] = float(str(nd).strip().rstrip("\0"))
        except ValueError:
            info["nodata"] = None
    else:
        info["nodata"] = None

    # georeferencing -> karta lower-left-corner affine
    if _T_TRANSFORMATION in tags:
        m = tags[_T_TRANSFORMATION]
        # X = m0*c + m1*r + m3 ; Y = m4*c + m5*r + m7 (north-down rows)
        dx, msx, ulx = m[0], m[1], m[3]
        msy, mdy, uly = m[4], m[5], m[7]
        dy, sx, sy = -mdy, -msx, msy
        x0 = ulx - ny * sx
        y0 = uly - ny * dy
        info["transform"] = (x0, y0, dx, dy, sx, sy)
    elif _T_PIXEL_SCALE in tags and _T_TIEPOINT in tags:
        px, py = tags[_T_PIXEL_SCALE][0], tags[_T_PIXEL_SCALE][1]
        tp = tags[_T_TIEPOINT]
        # tiepoint: raster (I,J,K) -> model (X,Y,Z); anchored at (0,0)
        ulx = tp[3] - tp[0] * px
        uly = tp[4] + tp[1] * py
        info["transform"] = (ulx, uly - ny * py, px, py, 0.0, 0.0)
    else:
        info["transform"] = (0.0, 0.0, 1.0, 1.0, 0.0, 0.0)

    info["crs"] = _crs_from_geokeys(tags)
    return info


def _crs_from_geokeys(tags) -> str | None:
    keys = tags.get(_T_GEO_KEYS)
    ascii_params = _tag1(tags, _T_GEO_ASCII, "") or ""
    if not keys or len(keys) < 4:
        return None
    nkeys = keys[3]
    kv = {}
    cite = None
    for k in range(nkeys):
        kid, loc, cnt, val = keys[4 + 4 * k: 8 + 4 * k]
        if loc == 0:
            kv[kid] = val
        elif loc == _T_GEO_ASCII and kid == _GK_CITATION:
            cite = ascii_params[val:val + cnt].rstrip("|\0")
    epsg = kv.get(_GK_PROJECTED) or kv.get(_GK_GEOGRAPHIC)
    if epsg in _EPSG_CRS:
        return _EPSG_CRS[epsg]
    if cite and cite.startswith("karta_ray:"):
        return cite.split(":", 1)[1]
    if epsg:
        return f"epsg:{epsg}"
    return None


# --------------------------------------------------------------------------
# reading
# --------------------------------------------------------------------------

def _decode_chunks(f, info, chunk_ids):
    """Decode chunk indices (plane-major order) -> dict id -> 2D array
    (chunk_h, chunk_w) in file row order (north-down)."""
    dtype = info["dtype"]
    bpp = dtype.itemsize
    spp = info["nbands"]
    per_chunk_samples = info["chunk_h"] * info["chunk_w"] * (
        1 if info["planar"] == 2 else spp)
    out = {}
    for cid in chunk_ids:
        f.seek(info["offsets"][cid])
        raw = f.read(info["counts"][cid])
        data = _decompress(raw, info["compression"],
                           per_chunk_samples * bpp)
        arr = np.frombuffer(data, dtype=dtype,
                            count=len(data) // bpp).copy()
        if info["planar"] == 2 or spp == 1:
            arr = arr.reshape(-1, info["chunk_w"])
        else:
            arr = arr.reshape(-1, info["chunk_w"], spp)
        if info["predictor"] == 2:
            # horizontal differencing: cumulative-sum along the width
            # axis, per row and (for chunky data) per trailing sample
            # channel; integer wraparound is native numpy behavior
            arr = np.cumsum(arr, axis=1, dtype=arr.dtype)
        elif info["predictor"] == 3:
            raise ValueError("floating-point predictor (3) not supported")
        out[cid] = arr
    return out


def read_geotiff(path: str):
    """Read a GeoTIFF fully into memory.

    Returns ``(values, transform, nodata, crs_tag)`` — values SOUTH-UP,
    native dtype (native byte order), shape (ny, nx) for single-band or
    (nbands, ny, nx) for multi-band (the reference returns one band per
    Band object, karta/raster/read.py:27-62)."""
    info = read_geotiff_info(path)
    ny, nx, spp = info["ny"], info["nx"], info["nbands"]
    dtype = info["dtype"]
    planes = spp if info["planar"] == 2 else 1
    full = np.empty((spp, ny, nx), dtype=dtype.newbyteorder("="))

    n_chunks = len(info["offsets"])
    chunks_per_plane = n_chunks // planes
    with open(path, "rb") as f:
        decoded = _decode_chunks(f, info, range(n_chunks))
    ch, cw = info["chunk_h"], info["chunk_w"]
    across = (nx + cw - 1) // cw if info["tiled"] else 1
    for cid, arr in decoded.items():
        plane = cid // chunks_per_plane if planes > 1 else 0
        local = cid % chunks_per_plane
        if info["tiled"]:
            r0 = (local // across) * ch
            c0 = (local % across) * cw
        else:
            r0 = local * ch
            c0 = 0
        h = min(ch, ny - r0)
        w = min(cw, nx - c0)
        if info["planar"] == 1 and spp > 1:
            blk = arr[:h, :w, :]
            for s in range(spp):
                full[s, r0:r0 + h, c0:c0 + w] = blk[:, :, s]
        else:
            full[plane, r0:r0 + h, c0:c0 + w] = arr[:h, :w]

    full = full[:, ::-1, :].copy()  # north-down file -> south-up array
    values = full[0] if spp == 1 else full
    return values, info["transform"], info["nodata"], info["crs"]


def from_geotiffs(*paths):
    """Read several single-band rasters on the same grid as one
    (nbands, ny, nx) stack (reference ``from_geotiffs``,
    karta/raster/read.py:64-111: bands must share transform)."""
    if not paths:
        raise ValueError("from_geotiffs needs at least one path")
    vals, transform, nodata, crs = read_geotiff(paths[0])
    bands = [vals if vals.ndim == 2 else vals[0]]
    for p in paths[1:]:
        v, t, _nd, _crs = read_geotiff(p)
        if tuple(np.round(t, 9)) != tuple(np.round(transform, 9)):
            raise ValueError(f"grid mismatch between {paths[0]} and {p}")
        bands.append(v if v.ndim == 2 else v[0])
    return np.stack(bands), transform, nodata, crs


# --------------------------------------------------------------------------
# writing
# --------------------------------------------------------------------------

_COMPRESS_IDS = {None: 1, "none": 1, "lzw": 5, "deflate": 8,
                 "zlib": 8, "packbits": 32773}


def write_geotiff(path: str, values, transform, *, crs=None, nodata=None,
                  compress=None, rows_per_strip=None, predictor=None):
    """Write a south-up array as a little-endian classic GeoTIFF.

    ``compress``: None | "lzw" | "deflate" | "packbits" (the reference
    accepts the GDAL spellings "LZW"/"PACKBITS"/"DEFLATE",
    karta/raster/grid.py:1085-1100 — matched case-insensitively).
    ``predictor``: horizontal differencing for integer samples; defaults
    to on when compressing integer data."""
    values = np.asarray(values)
    if values.ndim == 2:
        values = values[None, :, :]
    spp, ny, nx = values.shape
    dtype = values.dtype.newbyteorder("<")
    code = _DTYPES_INV.get(dtype.str[1:])
    if code is None:
        raise ValueError(f"unsupported dtype {values.dtype} for GeoTIFF")
    sfmt, bits = code
    comp_name = (compress or "none").lower() if isinstance(
        compress, str) else "none" if compress is None else compress
    if comp_name not in _COMPRESS_IDS:
        raise ValueError(f"unknown compression {compress!r}")
    comp = _COMPRESS_IDS[comp_name]
    if predictor is None:
        predictor = comp != 1 and sfmt in (1, 2)
    if predictor and sfmt not in (1, 2):
        raise ValueError("predictor=2 needs integer samples")

    # north-down, chunky-interleaved sample stream
    north = np.ascontiguousarray(
        np.moveaxis(values[:, ::-1, :], 0, -1)).astype(dtype)

    if rows_per_strip is None:
        row_bytes = max(1, nx * spp * dtype.itemsize)
        rows_per_strip = max(1, min(ny, (256 * 1024) // row_bytes))
    strips = []
    for r0 in range(0, ny, rows_per_strip):
        blk = north[r0:r0 + rows_per_strip]
        if predictor:
            d = blk.copy()
            d[:, 1:, :] = blk[:, 1:, :] - blk[:, :-1, :]
            blk = d
        strips.append(_compress(blk.tobytes(), comp))

    tags = [
        (_T_WIDTH, 3, [nx]),
        (_T_LENGTH, 3, [ny]),
        (_T_BITS, 3, [bits] * spp),
        (_T_COMPRESSION, 3, [comp]),
        (_T_PHOTOMETRIC, 3, [1]),
        (_T_SAMPLES_PER_PX, 3, [spp]),
        (_T_ROWS_PER_STRIP, 3, [min(rows_per_strip, 65535)] if
         rows_per_strip < 65536 else None),
        (_T_PLANAR, 3, [1]),
        (_T_SAMPLE_FORMAT, 3, [sfmt] * spp),
    ]
    if rows_per_strip >= 65536:
        tags[6] = (_T_ROWS_PER_STRIP, 4, [rows_per_strip])
    if predictor:
        tags.append((_T_PREDICTOR, 3, [2]))

    x0, y0, dx, dy, sx, sy = [float(v) for v in transform]
    if sx == 0.0 and sy == 0.0:
        tags.append((_T_PIXEL_SCALE, 12, [dx, dy, 0.0]))
        tags.append((_T_TIEPOINT, 12,
                     [0.0, 0.0, 0.0, x0, y0 + ny * dy, 0.0]))
    else:
        ulx = x0 + ny * sx
        uly = y0 + ny * dy
        tags.append((_T_TRANSFORMATION, 12,
                     [dx, -sx, 0.0, ulx,
                      sy, -dy, 0.0, uly,
                      0.0, 0.0, 0.0, 0.0,
                      0.0, 0.0, 0.0, 1.0]))

    geo_ascii = ""
    geokeys = [(_GK_RASTER, 0, 1, 1)]  # PixelIsArea
    crs_tag = getattr(crs, "name", crs)
    if crs_tag:
        model, epsg = _CRS_EPSG.get(crs_tag, (0, None))
        if epsg is not None:
            geokeys.insert(0, (_GK_MODEL, 0, 1, model))
            geokeys.append((_GK_PROJECTED if model == 1 else _GK_GEOGRAPHIC,
                            0, 1, epsg))
        cite = f"karta_ray:{crs_tag}|"
        geokeys.append((_GK_CITATION, _T_GEO_ASCII, len(cite), 0))
        geo_ascii = cite
    geokeys.sort()
    gk_values = [1, 1, 0, len(geokeys)]
    for k in geokeys:
        gk_values.extend(k)
    tags.append((_T_GEO_KEYS, 3, gk_values))
    if geo_ascii:
        tags.append((_T_GEO_ASCII, 2, geo_ascii + "\0"))
    if nodata is not None:
        nd = nodata
        nds = ("nan" if isinstance(nd, float) and np.isnan(nd)
               else repr(float(nd)))
        tags.append((_T_GDAL_NODATA, 2, nds + "\0"))

    tags = [t for t in tags if t[2] is not None]

    # layout: header(8) | IFD | out-of-line tag values | strip data
    n_entries = len(tags) + 2  # + strip offsets/counts
    ifd_off = 8
    ifd_size = 2 + n_entries * 12 + 4
    heap_off = ifd_off + ifd_size
    heap = bytearray()

    def place(fmt_char, vals):
        nonlocal heap
        if fmt_char == "c":
            raw = vals.encode("ascii")
        else:
            raw = struct.pack("<" + fmt_char * len(vals), *vals)
        if len(raw) <= 4:
            return None, raw.ljust(4, b"\0")
        off = heap_off + len(heap)
        heap += raw
        if len(heap) % 2:
            heap += b"\0"
        return off, None

    # strip value arrays go in the heap too; data begins after it
    strip_counts = [len(s) for s in strips]
    entries = []
    for tid, ftype, vals in tags:
        fmt, _size = _FIELD[ftype]
        count = len(vals)
        off, inline = place(fmt, vals)
        entries.append((tid, ftype, count, off, inline))

    # two passes for strip offsets: reserve heap room first
    n_strips = len(strips)
    so_off = co_off = None
    if n_strips > 1:
        so_off = heap_off + len(heap)
        heap += b"\0" * (4 * n_strips)
        co_off = heap_off + len(heap)
        heap += b"\0" * (4 * n_strips)
    data_off = heap_off + len(heap)
    if data_off % 2:
        heap += b"\0"
        data_off += 1
    strip_offsets = []
    pos = data_off
    for c in strip_counts:
        strip_offsets.append(pos)
        pos += c + (c % 2)
    if n_strips > 1:
        heap[so_off - heap_off:so_off - heap_off + 4 * n_strips] = \
            struct.pack("<" + "I" * n_strips, *strip_offsets)
        heap[co_off - heap_off:co_off - heap_off + 4 * n_strips] = \
            struct.pack("<" + "I" * n_strips, *strip_counts)
        entries.append((_T_STRIP_OFFSETS, 4, n_strips, so_off, None))
        entries.append((_T_STRIP_COUNTS, 4, n_strips, co_off, None))
    else:
        entries.append((_T_STRIP_OFFSETS, 4, 1, None,
                        struct.pack("<I", strip_offsets[0])))
        entries.append((_T_STRIP_COUNTS, 4, 1, None,
                        struct.pack("<I", strip_counts[0])))
    entries.sort(key=lambda t: t[0])

    with open(path, "wb") as f:
        f.write(b"II*\0" + struct.pack("<I", ifd_off))
        f.write(struct.pack("<H", n_entries))
        for tid, ftype, count, off, inline in entries:
            f.write(struct.pack("<HHI", tid, ftype, count))
            f.write(struct.pack("<I", off) if inline is None else inline)
        f.write(struct.pack("<I", 0))  # no next IFD
        f.write(heap)
        for s, off in zip(strips, strip_offsets):
            f.seek(off)
            f.write(s)


to_geotiff = write_geotiff  # reference spelling (karta/raster/grid.py:1066)


# --------------------------------------------------------------------------
# Ray Dataset reader (parallel strip decode)
# --------------------------------------------------------------------------

def read_geotiff_dataset(path: str, *, grid_id=0, band=0,
                         strips_per_task=None):
    """GeoTIFF -> Dataset of tile records without materializing the grid
    in any one process: the driver parses only the IFD, then Ray tasks
    each decode a contiguous run of strips/tiles into ``stages.raster``
    tile records (south-up ``i0/j0`` coordinates, dtype preserved).

    The partitioning unit is the file's own chunk grid, so object-store
    traffic per task is bounded by ``strips_per_task`` x strip size
    regardless of the raster's total extent."""
    import pyarrow as pa
    import ray.data

    info = read_geotiff_info(path)
    if info["nbands"] != 1:
        raise ValueError("read_geotiff_dataset handles single-band "
                         "rasters; use from_geotiffs for stacks")
    ny, nx = info["ny"], info["nx"]
    ch, cw = info["chunk_h"], info["chunk_w"]
    n_chunks = len(info["offsets"])
    if strips_per_task is None:
        # ~8 MB of decoded samples per task
        per = info["chunk_h"] * info["chunk_w"] * info["dtype"].itemsize
        strips_per_task = max(1, (8 << 20) // max(per, 1))
    items = [{"c0": c0, "c1": min(c0 + strips_per_task, n_chunks)}
             for c0 in range(0, n_chunks, strips_per_task)]

    transform = info["transform"]
    dtype_str = np.dtype(info["dtype"].newbyteorder("=")).str
    across = (nx + cw - 1) // cw if info["tiled"] else 1

    def decode(batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("grid_id", "band", "tile_i", "tile_j",
                                "i0", "j0", "ny", "nx", "pt", "pl",
                                "pny", "pnx")}
        tcol, vcol = [], []
        with open(path, "rb") as f:
            for c0, c1 in zip(batch.column("c0").to_pylist(),
                              batch.column("c1").to_pylist()):
                decoded = _decode_chunks(f, info, range(c0, c1))
                for cid, arr in decoded.items():
                    if info["tiled"]:
                        r0 = (cid // across) * ch
                        j0 = (cid % across) * cw
                    else:
                        r0 = cid * ch
                        j0 = 0
                    h = min(ch, ny - r0)
                    w = min(cw, nx - j0)
                    blk = np.ascontiguousarray(
                        arr[:h, :w][::-1].astype(dtype_str))
                    i0 = ny - (r0 + h)  # south-up row of block bottom
                    rows["grid_id"].append(grid_id)
                    rows["band"].append(band)
                    # tile ids come from the file's own chunk grid
                    # (north-down chunk row/col) — unique per record
                    # even when ny % chunk_h != 0; geometry travels in
                    # i0/j0
                    rows["tile_i"].append(r0 // max(ch, 1))
                    rows["tile_j"].append(j0 // max(cw, 1))
                    rows["i0"].append(i0)
                    rows["j0"].append(j0)
                    rows["ny"].append(h)
                    rows["nx"].append(w)
                    rows["pt"].append(0)
                    rows["pl"].append(0)
                    rows["pny"].append(h)
                    rows["pnx"].append(w)
                    tcol.append(list(transform))
                    vcol.append(blk.tobytes())
        return pa.table({
            **{k: pa.array(v, pa.int64()) for k, v in rows.items()},
            "transform": pa.array(tcol, pa.list_(pa.float64(), 6)),
            "values": pa.array(vcol, pa.binary()),
            "dtype": pa.array([dtype_str] * len(vcol), pa.string()),
        })

    return ray.data.from_items(items).map_batches(
        decode, batch_format="pyarrow")
