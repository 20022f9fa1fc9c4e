"""GeoJSON fixture loader + multimodal stage plumbing."""

import numpy as np
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

    def test_real_decoder_is_guarded(self):
        t = synth_media_table(2)
        ex = MediaFeatureExtractor(dim=8, use_fake_decoder=False)
        with pytest.raises(NotImplementedError):
            ex(t)

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
