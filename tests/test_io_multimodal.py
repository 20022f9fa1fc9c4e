"""GeoJSON fixture loader + multimodal stage plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from karta_ray.sources.geojson import read_geojson, to_geojson
from karta_ray.stages.multimodal import (MediaFeatureExtractor,
                                         synth_media_table)


class TestGeoJSON:
    GJ = """{"type": "FeatureCollection", "features": [
      {"type": "Feature", "properties": {"name": "pt1"},
       "geometry": {"type": "Point", "coordinates": [30.0, 10.0]}},
      {"type": "Feature", "properties": {"name": "sq"},
       "geometry": {"type": "Polygon", "coordinates":
         [[[0,0],[4,0],[4,4],[0,4],[0,0]]]}},
      {"type": "Feature", "properties": {},
       "geometry": {"type": "LineString",
                    "coordinates": [[0,0],[1,1],[2,0]]}}]}"""

    def test_parse(self):
        out = read_geojson(self.GJ)
        assert out["points"].num_rows == 1
        assert out["points"].column("lon")[0].as_py() == 30.0
        assert len(out["polygons"]) == 1
        # explicit closure stripped (karta rings are implicitly closed)
        assert len(out["polygons"][0]["rings"][0]) == 4
        assert len(out["lines"]) == 1
        assert out["lines"][0]["vertices"].shape == (3, 2)

    def test_polygon_contains_via_polyset(self):
        from karta_ray.geoms import PolygonSet

        out = read_geojson(self.GJ)
        ps = PolygonSet.from_rings(out["polygons"])
        got = ps.contains(np.array([2.0, 9.0]), np.array([2.0, 9.0]), 0)
        assert got.tolist() == [True, False]

    def test_roundtrip(self):
        out = read_geojson(self.GJ)
        s = to_geojson(points=out["points"], polygons=out["polygons"])
        back = read_geojson(s)
        assert back["points"].num_rows == 1
        assert len(back["polygons"]) == 1
        np.testing.assert_allclose(back["polygons"][0]["rings"][0],
                                   out["polygons"][0]["rings"][0])


class TestMultimodal:
    def test_schema_and_determinism(self):
        t = synth_media_table(30)
        ex = MediaFeatureExtractor(dim=16)
        out1 = ex(t)
        out2 = ex(t.slice(10, 10))  # different batch boundaries
        assert "payload" not in out1.column_names
        f_full = np.asarray(out1.column("features").to_pylist())
        f_part = np.asarray(out2.column("features").to_pylist())
        np.testing.assert_allclose(f_full[10:20], f_part)
        assert f_full.shape == (30, 16)

    def test_video_decoder_is_guarded(self):
        from karta_ray.stages.multimodal import _decode_video_real

        with pytest.raises(NotImplementedError):
            _decode_video_real(b"xxxx")

    def test_real_image_audio_decode(self):
        from karta_ray.stages.multimodal import (decode_ppm, decode_wav,
                                                 encode_ppm, encode_wav,
                                                 frame_sample,
                                                 resize_image)

        img = (np.arange(24 * 32 * 3) % 251).reshape(24, 32, 3) \
            .astype(np.uint8)
        assert (decode_ppm(encode_ppm(img)) == img).all()
        gray = img[:, :, 0]
        assert (decode_ppm(encode_ppm(gray)) == gray).all()
        small = resize_image(img, 8, 6)
        assert small.shape == (6, 8, 3)
        wave = (np.sin(np.arange(4000) / 20) * 20000).astype(np.int16)
        got, rate = decode_wav(encode_wav(wave, 8000))
        assert rate == 8000 and (got == wave).all()
        stereo = np.column_stack([wave, -wave])
        got2, _ = decode_wav(encode_wav(stereo, 8000))
        assert got2.shape == stereo.shape and (got2 == stereo).all()
        frames = [img, img, img, img, img]
        assert len(frame_sample(frames, 2)) == 3

    def test_image_features_reflect_content(self):
        from karta_ray.stages.multimodal import (_features_image,
                                                 encode_ppm)

        dark = np.zeros((16, 16, 3), dtype=np.uint8)
        light = np.full((16, 16, 3), 250, dtype=np.uint8)
        fd = _features_image(dark, 16)
        fl = _features_image(light, 16)
        assert fd[2] == 0.0 and fl[2] == 250.0  # channel means differ
        assert encode_ppm(dark)[:2] == b"P6"

    @pytest.mark.usefixtures("ray_session")
    def test_actor_pool_stage(self):
        import ray.data

        from karta_ray.stages.multimodal import extract_media_features

        ds = ray.data.from_arrow(synth_media_table(100))
        out = extract_media_features(ds, dim=8, batch_size=16,
                                     concurrency=2).to_pandas()
        assert len(out) == 100
        assert len(out["features"].iloc[0]) == 8


class TestGeoJSONReferenceFixtures:
    """Parse the reference's checked-in GeoJSON fixtures
    (/root/reference/tests/data/geojson_input/*)."""

    DIR = "/root/reference/tests/data/geojson_input"

    def test_all_fixtures_parse(self):
        import os

        for name in sorted(os.listdir(self.DIR)):
            if not (name.endswith(".json") or name.endswith(".geojson")):
                continue
            out = read_geojson(os.path.join(self.DIR, name))
            total = (out["points"].num_rows + len(out["polygons"])
                     + len(out["lines"]))
            if name != "geometrycollection.json":  # not supported by karta either
                assert total > 0, name

    def test_california_outline_contains(self):
        # the fixture stores the state outline as a MultiLineString;
        # close it into a ring and run the winding test
        import numpy as np

        from karta_ray.kernels import predicates as P

        out = read_geojson(f"{self.DIR}/california.geojson")
        assert len(out["lines"]) == 1
        ring = out["lines"][0]["vertices"]
        assert len(ring) > 1000  # 1161-vertex coastline
        # closed coastline ring has positive area, contains interior
        # probe points, and excludes far-away points
        from karta_ray.kernels import measures
        area = measures.ring_area_planar(ring)
        assert area > 1.0
        gx, gy = np.meshgrid(np.linspace(-124.4, -120.7, 20),
                             np.linspace(35.2, 44.8, 20))
        inside = P.points_in_ring(gx.ravel(), gy.ravel(), ring)
        assert 0 < inside.sum() < inside.size
        assert not P.points_in_ring(np.array([0.0]), np.array([0.0]), ring)[0]

    def test_us_capitols_points(self):
        out = read_geojson(f"{self.DIR}/us-capitols.json")
        assert out["points"].num_rows >= 50


class TestGPX:
    GPX_PATH = "/root/reference/tests/data/gpx_input/fishermans-trail.gpx"

    def test_read_tracks(self):
        import os

        import pytest as _pytest

        if not os.path.exists(self.GPX_PATH):
            _pytest.skip("reference gpx fixture absent")
        from karta_ray.sources.gpx import read_gpx_tracks

        t = read_gpx_tracks(self.GPX_PATH)
        assert t.num_rows >= 1
        assert t.column("kind")[0].as_py() == "line"
        verts = t.column("vertices")[0].as_py()
        # reference rounds attributes to 6 decimals (_gpx.py:85-86)
        assert verts[0] == [-123.00702, 49.32947]
        ele = t.column("ele")[0].as_py()
        assert ele[0] == 73.189
        assert "Fisherman's Trail" in t.column("name")[0].as_py()

    def test_track_lengths_positive(self):
        import os

        import pytest as _pytest

        if not os.path.exists(self.GPX_PATH):
            _pytest.skip("reference gpx fixture absent")
        from karta_ray import crs
        from karta_ray.sources.gpx import read_gpx_tracks, track_lengths

        t = read_gpx_tracks(self.GPX_PATH)
        lens = track_lengths(t, crs.SphericalEarth)
        assert (lens > 0).all()

    def test_write_round_trip(self, tmp_path):
        # writer semantics per reference GPX.as_string/_build_gpx_wpt
        # (_gpx.py:105-133, 288-307): wpt props as child elements,
        # non-GPX keys under <extensions>, trkpts nested in trksegs
        import pyarrow as pa

        from karta_ray.sources.gpx import (gpx_string, read_gpx_routes,
                                           read_gpx_tracks,
                                           read_gpx_waypts, write_gpx)

        waypts = pa.table({
            "lon": pa.array([-80.0, 12.345678901]),
            "lat": pa.array([82.0, -5.5]),
            "name": pa.array(["ellesmere", None]),
            "ele": pa.array(["100", "7.25"]),
            "custom": pa.array(["x1", None]),  # -> <extensions>
        })
        tracks = pa.table({
            "geom_id": pa.array([0, 1], pa.int64()),
            "kind": pa.array(["line", "line"]),
            "vertices": pa.array(
                [[[-123.007021, 49.329471], [-122.9914, 49.392751]],
                 [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]],
                pa.list_(pa.list_(pa.float64(), 2))),
            "ele": pa.array([[73.189, 80.0], [None, 1.5, None]],
                            pa.list_(pa.float64())),
            "name": pa.array(["Fisherman's Trail", None]),
        })
        routes = pa.table({
            "geom_id": pa.array([0], pa.int64()),
            "kind": pa.array(["line"]),
            "vertices": pa.array([[[10.0, 20.0], [11.0, 21.0]]],
                                 pa.list_(pa.list_(pa.float64(), 2))),
            "ele": pa.array([[None, None]], pa.list_(pa.float64())),
            "name": pa.array(["route0"]),
        })
        p = str(tmp_path / "rt.gpx")
        write_gpx(p, waypts=waypts, tracks=tracks, routes=routes)

        w = read_gpx_waypts(p)
        # 6-decimal rounding on write matches the reader's rounding
        assert w.column("lon").to_pylist() == [-80.0, 12.345679]
        assert w.column("lat").to_pylist() == [82.0, -5.5]
        assert w.column("name").to_pylist() == ["ellesmere", None]
        assert w.column("ele").to_pylist() == ["100", "7.25"]
        assert "custom" not in w.column_names  # extensions excluded

        t = read_gpx_tracks(p)
        assert t.column("vertices").to_pylist() \
            == tracks.column("vertices").to_pylist()
        assert t.column("ele").to_pylist() == tracks.column("ele").to_pylist()
        assert t.column("name").to_pylist() == tracks.column("name").to_pylist()

        r = read_gpx_routes(p)
        assert r.column("vertices").to_pylist() \
            == routes.column("vertices").to_pylist()
        assert r.column("name").to_pylist() == ["route0"]

        # string form parses as namespaced GPX 1.1
        s = gpx_string(waypts=waypts)
        assert 'xmlns="http://www.topografix.com/GPX/1/1"' in s
        assert 'version="1.1"' in s

    def test_read_routes_from_written_reference_shape(self, tmp_path):
        # a minimal hand-written doc with namespace prefix, mirroring
        # the reference's parse_rte path (_gpx.py:175-180)
        from karta_ray.sources.gpx import read_gpx_routes

        doc = ('<gpx xmlns="http://www.topografix.com/GPX/1/1" '
               'version="1.1" creator="t">'
               '<rte><name>r1</name>'
               '<rtept lon="1.0000005" lat="2.0"><ele>5.0</ele></rtept>'
               '<rtept lon="3.0" lat="4.0"/></rte></gpx>')
        p = str(tmp_path / "r.gpx")
        with open(p, "w") as f:
            f.write(doc)
        r = read_gpx_routes(p)
        assert r.num_rows == 1
        assert r.column("vertices").to_pylist() == [[[1.000001, 2.0],
                                                     [3.0, 4.0]]]
        assert r.column("ele").to_pylist() == [[5.0, None]]
        assert r.column("name").to_pylist() == ["r1"]


class TestRasterDtypes:
    def test_get_nodata_defaults(self):
        # grid.py:1233-1257 semantics
        from karta_ray.kernels.raster import get_nodata

        assert get_nodata(np.uint8) == 255
        assert get_nodata(np.uint16) == 65535
        assert get_nodata(np.int16) == -32768
        assert get_nodata(np.int64) == np.iinfo(np.int64).min
        assert np.isnan(get_nodata(np.float32))
        with pytest.raises(ValueError):
            get_nodata(np.dtype("U4"))

    def test_uint8_tiles_round_trip(self):
        from karta_ray.stages.raster import (grid_from_tiles,
                                             tiles_from_grid)

        rng = np.random.RandomState(3)
        vals = rng.randint(0, 255, (70, 90)).astype(np.uint8)
        t = tiles_from_grid(vals, (0, 0, 1, 1, 0, 0), tile=32)
        # 1 byte per pixel on the wire, not 8
        total = sum(len(v.as_py()) for v in t.column("values"))
        assert total == 70 * 90
        back, transform = grid_from_tiles(t)
        assert back.dtype == np.uint8
        assert (back == vals).all()

    def test_stencil_on_int_grid_outputs_float(self):
        import ray.data

        from karta_ray.kernels.raster import slope
        from karta_ray.stages.raster import (grid_from_tiles,
                                             stencil_stage, tiles_dataset)

        vals = (np.arange(48 * 48).reshape(48, 48) % 17).astype(np.int32)
        tiles = tiles_dataset(vals, (0, 0, 1, 1, 0, 0), tile=16, overlap=1)
        out = stencil_stage(tiles, "slope")
        table = pa.concat_tables(list(out.iter_batches(
            batch_format="pyarrow", batch_size=1024)))
        back, _ = grid_from_tiles(table)
        assert back.dtype == np.float64
        np.testing.assert_array_equal(back, slope(vals.astype(np.float64)))

    def test_parquet_tiles_round_trip(self, tmp_path):
        from karta_ray.stages.raster import (grid_from_tiles,
                                             read_tiles_parquet,
                                             tiles_dataset,
                                             write_tiles_parquet)

        vals = np.arange(40 * 60, dtype=np.uint16).reshape(40, 60)
        ds = tiles_dataset(vals, (5, 6, 1, 2, 0, 0), tile=32)
        path = str(tmp_path / "tiles_pq")
        write_tiles_parquet(ds, path)
        back_ds = read_tiles_parquet(path)
        table = pa.concat_tables(list(back_ds.iter_batches(
            batch_format="pyarrow", batch_size=1024)))
        back, transform = grid_from_tiles(table)
        assert back.dtype == np.uint16
        assert (back == vals).all()
        assert transform == (5.0, 6.0, 1.0, 2.0, 0.0, 0.0)
