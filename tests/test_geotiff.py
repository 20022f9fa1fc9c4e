"""GeoTIFF codec tests, modeled on the reference suite
(/root/reference/tests/geotiff_tests.py:24-120): write→read round-trips
across dtypes/compressions, transform and CRS preservation, multi-band
stacking via from_geotiffs, plus decoder independence checks against a
hand-assembled spec-conformant fixture (no GDAL in this environment)."""

import os
import struct

import numpy as np
import pytest

from karta_ray.sources import geotiff as GT


def peaks(n=49):
    # the reference's standard test surface (karta/examples -> peaks)
    x = np.linspace(-3, 3, n)
    X, Y = np.meshgrid(x, x)
    return (3.0 * (1 - X)**2 * np.exp(-X**2 - (Y + 1)**2)
            - 10.0 * (X / 5.0 - X**3 - Y**5) * np.exp(-X**2 - Y**2)
            - 1.0 / 3.0 * np.exp(-(X + 1)**2 - Y**2))


TRANSFORM = (15.0, 15.0, 30.0, 30.0, 0.0, 0.0)


@pytest.fixture()
def tmpfile(tmp_path):
    return str(tmp_path / "test.tif")


class TestRoundTrip:
    def test_write_read(self, tmpfile):
        # mirrors geotiff_tests.py::test_write_read
        v = peaks(500)[:100, :]
        GT.write_geotiff(tmpfile, v, TRANSFORM, crs="lonlat_wgs84")
        vals, transform, nodata, crs = GT.read_geotiff(tmpfile)
        assert transform == TRANSFORM
        assert vals.dtype == v.dtype
        assert np.all(vals == v)
        assert crs == "lonlat_wgs84"
        assert nodata is None

    @pytest.mark.parametrize("dtype", ["u1", "u2", "u4", "i1", "i2",
                                       "i4", "f4", "f8"])
    def test_dtypes(self, tmpfile, dtype):
        rng = np.random.RandomState(7)
        dt = np.dtype(dtype)
        if dt.kind == "f":
            v = rng.randn(37, 53).astype(dt)
        else:
            info = np.iinfo(dt)
            v = rng.randint(info.min, info.max, size=(37, 53)).astype(dt)
        GT.write_geotiff(tmpfile, v, TRANSFORM)
        vals, transform, _nd, _crs = GT.read_geotiff(tmpfile)
        assert vals.dtype == dt
        assert np.array_equal(vals, v)
        assert transform == TRANSFORM

    @pytest.mark.parametrize("compress", [None, "deflate", "packbits",
                                          "lzw", "LZW", "PACKBITS"])
    def test_compressions(self, tmpfile, compress):
        # mirrors geotiff_tests.py::test_write_compress (GDAL spellings)
        v = (peaks(500)[:100, :] * 100).astype(np.int16)
        GT.write_geotiff(tmpfile, v, TRANSFORM, compress=compress)
        vals, _t, _nd, _crs = GT.read_geotiff(tmpfile)
        assert np.array_equal(vals, v)

    def test_compressed_float(self, tmpfile):
        v = peaks(120)
        GT.write_geotiff(tmpfile, v, TRANSFORM, compress="deflate")
        vals, _t, _nd, _crs = GT.read_geotiff(tmpfile)
        assert np.array_equal(vals, v)

    def test_deflate_actually_compresses(self, tmpfile):
        v = np.zeros((256, 256), dtype=np.float64)
        GT.write_geotiff(tmpfile, v, TRANSFORM, compress="deflate")
        assert os.path.getsize(tmpfile) < v.nbytes // 10

    def test_predictor_improves_lzw(self, tmp_path):
        # smooth integer data: horizontal differencing must shrink LZW
        v = np.cumsum(np.ones((64, 512), dtype=np.uint16), axis=1)
        a, b = str(tmp_path / "a.tif"), str(tmp_path / "b.tif")
        GT.write_geotiff(a, v, TRANSFORM, compress="lzw", predictor=True)
        GT.write_geotiff(b, v, TRANSFORM, compress="lzw", predictor=False)
        assert os.path.getsize(a) < os.path.getsize(b)
        for p in (a, b):
            vals, _t, _nd, _crs = GT.read_geotiff(p)
            assert np.array_equal(vals, v)

    def test_nodata(self, tmpfile):
        v = peaks(40)
        GT.write_geotiff(tmpfile, v, TRANSFORM, nodata=-9999.0)
        _v, _t, nodata, _crs = GT.read_geotiff(tmpfile)
        assert nodata == -9999.0

    def test_sheared_transform(self, tmpfile):
        t = (10.0, 20.0, 2.0, 3.0, 0.25, -0.5)
        v = peaks(30)
        GT.write_geotiff(tmpfile, v, t)
        vals, transform, _nd, _crs = GT.read_geotiff(tmpfile)
        assert np.allclose(transform, t)
        assert np.array_equal(vals, v)

    def test_multiband_chunky(self, tmpfile):
        v = np.stack([peaks(33), peaks(33)**2, peaks(33) + 2])
        GT.write_geotiff(tmpfile, v, TRANSFORM)
        vals, transform, _nd, _crs = GT.read_geotiff(tmpfile)
        assert vals.shape == (3, 33, 33)
        assert np.array_equal(vals, v)

    def test_multiband_compressed_predictor(self, tmpfile):
        v = np.stack([np.arange(32 * 40, dtype=np.uint16).reshape(32, 40),
                      np.arange(32 * 40, dtype=np.uint16)[::-1]
                      .reshape(32, 40)])
        GT.write_geotiff(tmpfile, v, TRANSFORM, compress="deflate")
        vals, _t, _nd, _crs = GT.read_geotiff(tmpfile)
        assert np.array_equal(vals, v)

    def test_many_strips(self, tmpfile):
        v = peaks(300)
        GT.write_geotiff(tmpfile, v, TRANSFORM, rows_per_strip=7)
        vals, _t, _nd, _crs = GT.read_geotiff(tmpfile)
        assert np.array_equal(vals, v)


class TestCRSKeys:
    @pytest.mark.parametrize("tag", ["lonlat_wgs84", "webmercator",
                                     "ups_north", "nsidc_south"])
    def test_epsg_round_trip(self, tmpfile, tag):
        GT.write_geotiff(tmpfile, peaks(20), TRANSFORM, crs=tag)
        _v, _t, _nd, crs = GT.read_geotiff(tmpfile)
        assert crs == tag

    def test_citation_fallback(self, tmpfile):
        # no EPSG identity -> citation key carries the tag
        GT.write_geotiff(tmpfile, peaks(20), TRANSFORM, crs="gall_peters")
        _v, _t, _nd, crs = GT.read_geotiff(tmpfile)
        assert crs == "gall_peters"

    def test_crs_object(self, tmpfile):
        from karta_ray import crs as C
        GT.write_geotiff(tmpfile, peaks(20), TRANSFORM, crs=C.WebMercator)
        _v, _t, _nd, crs = GT.read_geotiff(tmpfile)
        assert crs == "webmercator"


class TestFromGeotiffs:
    def test_read_as_bands(self, tmp_path):
        # mirrors geotiff_tests.py::test_read_as_bands
        v = peaks(500)[:100, :]
        paths = []
        for i, b in enumerate((v, v**2, v + 2, v * 2)):
            p = str(tmp_path / f"test{i}.tif")
            GT.write_geotiff(p, b, TRANSFORM, crs="webmercator")
            paths.append(p)
        vals, transform, _nd, crs = GT.from_geotiffs(*paths)
        assert vals.shape == (4, 100, 500)
        assert transform == TRANSFORM
        assert crs == "webmercator"
        assert np.array_equal(vals[1], v**2)

    def test_grid_mismatch_raises(self, tmp_path):
        a, b = str(tmp_path / "a.tif"), str(tmp_path / "b.tif")
        GT.write_geotiff(a, peaks(20), TRANSFORM)
        GT.write_geotiff(b, peaks(20), (0, 0, 1, 1, 0, 0))
        with pytest.raises(ValueError):
            GT.from_geotiffs(a, b)


class TestDecoderConformance:
    """Decode TIFFs assembled field-by-field from the TIFF 6.0 spec —
    independent of our writer's layout choices."""

    def _build(self, *, endian="<", tiled=False):
        # 4x3 uint8 image, values 0..11, north-down rows
        e = endian
        img = bytes(range(12))
        entries = []

        def entry(tag, ftype, count, value_bytes):
            entries.append((tag, ftype, count, value_bytes))

        n_entries = 9 if tiled else 8
        data_off = 8 + 2 + 12 * n_entries + 4  # header + IFD + next ptr
        entry(256, 3, 1, struct.pack(e + "HH", 3, 0))      # width
        entry(257, 3, 1, struct.pack(e + "HH", 4, 0))      # length
        entry(258, 3, 1, struct.pack(e + "HH", 8, 0))
        entry(259, 3, 1, struct.pack(e + "HH", 1, 0))
        entry(262, 3, 1, struct.pack(e + "HH", 1, 0))
        if tiled:
            entry(322, 3, 1, struct.pack(e + "HH", 16, 0))
            entry(323, 3, 1, struct.pack(e + "HH", 16, 0))
            # one padded 16x16 tile
            tile = bytearray(256)
            for r in range(4):
                tile[r * 16:r * 16 + 3] = img[r * 3:r * 3 + 3]
            entry(324, 4, 1, struct.pack(e + "I", data_off))
            entry(325, 4, 1, struct.pack(e + "I", 256))
            payload = bytes(tile)
        else:
            entry(278, 3, 1, struct.pack(e + "HH", 4, 0))
            entry(273, 4, 1, struct.pack(e + "I", data_off))
            entry(279, 4, 1, struct.pack(e + "I", 12))
            payload = img
        assert len(entries) == n_entries
        entries.sort()
        buf = bytearray()
        buf += (b"II" if e == "<" else b"MM")
        buf += struct.pack(e + "HI", 42, 8)
        buf += struct.pack(e + "H", len(entries))
        for tag, ftype, count, vb in entries:
            buf += struct.pack(e + "HHI", tag, ftype, count) + vb
        buf += struct.pack(e + "I", 0)
        assert len(buf) == data_off
        buf += payload
        return bytes(buf)

    @pytest.mark.parametrize("endian", ["<", ">"])
    def test_hand_built_strips(self, tmp_path, endian):
        p = str(tmp_path / "hand.tif")
        with open(p, "wb") as f:
            f.write(self._build(endian=endian))
        vals, transform, _nd, crs = GT.read_geotiff(p)
        # north-down file rows flipped to south-up
        expect = np.arange(12, dtype=np.uint8).reshape(4, 3)[::-1]
        assert np.array_equal(vals, expect)
        assert transform == (0.0, 0.0, 1.0, 1.0, 0.0, 0.0)
        assert crs is None

    def test_hand_built_tiled(self, tmp_path):
        p = str(tmp_path / "tiled.tif")
        with open(p, "wb") as f:
            f.write(self._build(tiled=True))
        vals, _t, _nd, _crs = GT.read_geotiff(p)
        expect = np.arange(12, dtype=np.uint8).reshape(4, 3)[::-1]
        assert np.array_equal(vals, expect)

    def test_packbits_vectors(self):
        # worked example from the TIFF 6.0 spec, §9
        src = bytes([0xAA, 0xAA, 0xAA, 0x80, 0x00, 0x2A, 0xAA, 0xAA,
                     0xAA, 0xAA, 0x80, 0x00, 0x2A, 0x22, 0xAA, 0xAA,
                     0xAA, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA])
        enc = bytes([0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA,
                     0x03, 0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA])
        assert GT._packbits_decode(enc, len(src)) == src
        ours = GT._packbits_encode(src)
        assert GT._packbits_decode(ours, len(src)) == src

    def test_lzw_round_trip_random(self):
        rng = np.random.RandomState(3)
        for n in (0, 1, 7, 300, 5000):
            data = rng.randint(0, 8, size=n).astype(np.uint8).tobytes()
            assert GT._lzw_decode(GT._lzw_encode(data), n) == data

    def test_lzw_table_reset(self):
        # force > 4094 table entries so the mid-stream CLEAR path runs
        rng = np.random.RandomState(5)
        data = rng.randint(0, 256, size=80_000).astype(np.uint8).tobytes()
        assert GT._lzw_decode(GT._lzw_encode(data), len(data)) == data


class TestRayDataset:
    @pytest.mark.usefixtures("ray_session")
    def test_tile_records_reassemble(self, tmp_path):
        from karta_ray.stages.raster import grid_from_tiles
        v = (peaks(200) * 1000).astype(np.int32)
        p = str(tmp_path / "big.tif")
        GT.write_geotiff(p, v, TRANSFORM, compress="deflate",
                         rows_per_strip=16)
        ds = GT.read_geotiff_dataset(p, strips_per_task=3)
        table = ds.to_arrow_refs()
        import pyarrow as pa
        import ray
        tbl = pa.concat_tables([ray.get(r) for r in table])
        out, transform = grid_from_tiles(tbl, shape=v.shape)
        assert np.array_equal(out, v)
        assert np.allclose(transform, TRANSFORM)


class TestPlanarConfig2:
    """PlanarConfiguration=2 (separate planes) decoding — our writer
    emits chunky (=1), so this fixture is assembled by hand per the
    TIFF 6.0 spec: 2 samples/px, one strip per plane."""

    def test_hand_built_planar2(self, tmp_path):
        e = "<"
        # 2x3 image, 2 samples: plane0 = 0..5, plane1 = 100..105,
        # one strip per plane (strip offsets/counts out-of-line)
        p0 = bytes(range(6))
        p1 = bytes(range(100, 106))
        n = 10
        ifd_end = 8 + 2 + 12 * n + 4
        so_off = ifd_end          # 2-entry strip-offset array
        co_off = so_off + 8       # 2-entry strip-count array
        data_off = co_off + 8
        rows = sorted([
            (256, 3, 1, struct.pack(e + "HH", 3, 0)),   # width
            (257, 3, 1, struct.pack(e + "HH", 2, 0)),   # length
            (258, 3, 2, struct.pack(e + "HH", 8, 8)),   # bits/sample
            (259, 3, 1, struct.pack(e + "HH", 1, 0)),   # no compression
            (262, 3, 1, struct.pack(e + "HH", 1, 0)),   # photometric
            (273, 4, 2, struct.pack(e + "I", so_off)),  # strip offsets
            (277, 3, 1, struct.pack(e + "HH", 2, 0)),   # samples/px
            (278, 3, 1, struct.pack(e + "HH", 2, 0)),   # rows/strip
            (279, 4, 2, struct.pack(e + "I", co_off)),  # strip counts
            (284, 3, 1, struct.pack(e + "HH", 2, 0)),   # planar = 2
        ])
        buf = bytearray()
        buf += b"II" + struct.pack(e + "HI", 42, 8)
        buf += struct.pack(e + "H", n)
        for tag, ftype, count, vb in rows:
            buf += struct.pack(e + "HHI", tag, ftype, count) + vb
        buf += struct.pack(e + "I", 0)
        assert len(buf) == ifd_end
        buf += struct.pack(e + "II", data_off, data_off + 6)  # offsets
        buf += struct.pack(e + "II", 6, 6)                    # counts
        buf += p0 + p1

        p = str(tmp_path / "planar2.tif")
        with open(p, "wb") as f:
            f.write(bytes(buf))
        vals, _t, _nd, _crs = GT.read_geotiff(p)
        assert vals.shape == (2, 2, 3)
        expect0 = np.arange(6, dtype=np.uint8).reshape(2, 3)[::-1]
        expect1 = np.arange(100, 106, dtype=np.uint8).reshape(2, 3)[::-1]
        assert np.array_equal(vals[0], expect0)
        assert np.array_equal(vals[1], expect1)


class TestSeekBasedIfdParse:
    def test_trailing_ifd_reads_bounded_bytes(self, tmpfile):
        # ADVICE r03: libtiff/GDAL commonly append the IFD at the END
        # of the file; the driver-side info parse must seek, not slurp
        # prefixes. Build an end-IFD variant of our own output by
        # relocating the IFD block behind the pixel data, then assert
        # the parse touches O(tags) bytes and returns identical tags.
        vals = np.arange(40000, dtype=np.uint16).reshape(200, 200)
        GT.write_geotiff(tmpfile, vals, TRANSFORM)
        data = open(tmpfile, "rb").read()

        # our writer puts the IFD right after the 8-byte header; move
        # the whole remainder-minus-pixel layout by rewriting: simplest
        # robust relocation = append a COPY of everything after the
        # header and point the header at it
        e = "<" if data[:2] == b"II" else ">"
        (old_off,) = struct.unpack(e + "I", data[4:8])
        shifted = bytearray(data + data[old_off:])
        new_off = len(data)
        # entry values with voff pointers still reference the original
        # (retained) region, so only the IFD table itself moves
        shifted[4:8] = struct.pack(e + "I", new_off)
        end_path = tmpfile + ".endifd.tif"
        with open(end_path, "wb") as f:
            f.write(bytes(shifted))

        class CountingFile:
            def __init__(self, f):
                self._f = f
                self.bytes_read = 0

            def read(self, n=-1):
                b = self._f.read(n)
                self.bytes_read += len(b)
                return b

            def seek(self, *a):
                return self._f.seek(*a)

        with open(end_path, "rb") as raw:
            cf = CountingFile(raw)
            tags, endian = GT._read_ifd_file(cf)
        want, _ = GT._read_ifd(data)
        assert tags == want
        # whole file is ~80 KB; the parse must touch only tags+tables
        assert cf.bytes_read < 8192

        info = GT.read_geotiff_info(end_path)
        assert (info["nx"], info["ny"]) == (200, 200)


class TestComplexDtypes:
    def test_complex_round_trip(self, tmpfile):
        # reference GDT ladder includes CFloat32/CFloat64
        # (karta/raster/_gdal.py:27-45); TIFF SAMPLEFORMAT 6
        for dt in (np.complex64, np.complex128):
            vals = (np.arange(20 * 15).reshape(20, 15)
                    + 1j * np.arange(20 * 15)[::-1].reshape(20, 15)) \
                .astype(dt)
            GT.write_geotiff(tmpfile, vals, TRANSFORM, compress="deflate")
            info = GT.read_geotiff_info(tmpfile)
            assert info["dtype"].kind == "c"
            got, transform, _, _ = GT.read_geotiff(tmpfile)
            assert got.dtype == dt
            assert np.array_equal(got[0] if got.ndim == 3 else got, vals)
            assert transform == TRANSFORM

    def test_predictor_rejected_for_complex(self, tmpfile):
        vals = np.ones((4, 4), np.complex64)
        with pytest.raises(ValueError, match="predictor"):
            GT.write_geotiff(tmpfile, vals, TRANSFORM, compress="deflate",
                             predictor=True)
