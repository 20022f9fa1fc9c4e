"""tile_sample_stage (stages/raster.py): the tile-record co-shuffle
sampling join must be bit-identical to the broadcast sample_points path
(both modes), drop out-of-support points the same way, and survive a
hot tile whose points straddle sorted blocks."""

import numpy as np
import pyarrow as pa


SHAPE = (70, 90)
T = (-10.0, -5.0, 1.0, 1.0, 0.0, 0.0)


def _grid():
    jj, ii = np.meshgrid(np.arange(SHAPE[1]), np.arange(SHAPE[0]))
    return ((ii * 7 + jj * 13) % 41).astype(np.float64)


def _tiles(overlap):
    from karta_ray.stages.raster import synthetic_tiles

    return synthetic_tiles(SHAPE, T, lambda ii, jj: (ii * 7 + jj * 13) % 41,
                           tile=32, overlap=overlap)


def _points(n, seed, spread=True):
    rng = np.random.RandomState(seed)
    if spread:
        x = rng.uniform(-13.0, 84.0, n)    # some beyond both edges
        y = rng.uniform(-8.0, 68.0, n)
    else:                                  # hot tile: all in one 32x32
        x = rng.uniform(-9.5, 5.0, n)
        y = rng.uniform(-4.5, 10.0, n)
    return pa.table({"x": pa.array(x), "y": pa.array(y),
                     "pid": pa.array(np.arange(n, dtype=np.int64))})


class TestTileSample:
    def _check(self, mode, n=4000, seed=5, spread=True, nblocks=11):
        import ray

        from karta_ray.kernels import raster as RK
        from karta_ray.stages.raster import tile_sample_stage

        pts = _points(n, seed, spread)
        ds = ray.data.from_arrow(pts).repartition(nblocks)
        got = tile_sample_stage(
            ds, _tiles(overlap=1 if mode == "bilinear" else 0),
            transform=T, shape=SHAPE, tile=32, mode=mode,
            keep_cols=("pid",)).to_pandas().sort_values("pid")
        x = pts.column("x").to_numpy()
        y = pts.column("y").to_numpy()
        fn = (RK.sample_bilinear if mode == "bilinear"
              else RK.sample_nearest)
        want = fn(T, _grid(), x, y)
        keep = ~np.isnan(want)
        assert got["pid"].tolist() == np.flatnonzero(keep).tolist()
        # bit-exact vs the broadcast kernel
        assert (got["value"].to_numpy() == want[keep]).all()

    def test_nearest_matches_broadcast(self, ray_session):
        self._check("nearest")

    def test_bilinear_matches_broadcast(self, ray_session):
        self._check("bilinear")

    def test_hot_tile_straddles_blocks(self, ray_session):
        # every point in ONE tile, spread over many input blocks: the
        # sharded residue path must still answer each point exactly
        self._check("bilinear", n=20000, seed=9, spread=False,
                    nblocks=16)


class TestRegridTiles:
    def _check(self, method, new_dx, new_dy):
        from karta_ray.kernels.raster import resample
        from karta_ray.stages.raster import regrid_tiles_stage

        want, _t = resample(_grid(), T, new_dx, new_dy, method=method)
        got = regrid_tiles_stage(
            _tiles(overlap=1 if method == "bilinear" else 0),
            transform=T, shape=SHAPE, new_dx=new_dx, new_dy=new_dy,
            method=method).to_pandas()
        got = got.sort_values(["gi", "gj"]).reset_index(drop=True)
        keep = ~np.isnan(want.ravel())
        assert len(got) == int(keep.sum())
        ny, nx = want.shape
        idx = got["gi"].to_numpy() * nx + got["gj"].to_numpy()
        assert (idx == np.flatnonzero(keep)).all()
        # bit-exact vs the driver-side kernel
        assert (got["value"].to_numpy() == want.ravel()[keep]).all()

    def test_nearest_downsample(self, ray_session):
        self._check("nearest", 3.0, 2.0)

    def test_nearest_upsample(self, ray_session):
        self._check("nearest", 0.5, 0.5)

    def test_bilinear_downsample(self, ray_session):
        self._check("bilinear", 2.5, 1.5)

    def test_bilinear_upsample_edges_drop(self, ray_session):
        # upsampled edge centers whose 2x2 support leaves the grid are
        # nodata in the kernel and absent here — counts must agree
        self._check("bilinear", 0.5, 0.5)


class TestTileSeams:
    def test_exact_seam_positions(self, ray_session):
        # points whose float index I is EXACTLY integer at tile seams
        # exercise the _lohi integer branch (lo = v-1): the point
        # routes to the PREVIOUS tile and reads its +1 halo row/col
        import ray

        from karta_ray.kernels import raster as RK
        from karta_ray.stages.raster import tile_sample_stage

        # tile=32: seams at source index 31/32, 63/64; I = y - (-5) - 0.5
        seam_is = np.array([32.0, 64.0, 1.0, 0.0])   # integer positions
        y = seam_is + T[1] + 0.5
        x = np.full_like(y, 17.0 + T[0] + 0.5)       # interior column
        pts = pa.table({"x": pa.array(x), "y": pa.array(y),
                        "pid": pa.array(np.arange(len(y),
                                                  dtype=np.int64))})
        got = tile_sample_stage(
            ray.data.from_arrow(pts).repartition(2), _tiles(overlap=1),
            transform=T, shape=SHAPE, tile=32, mode="bilinear",
            keep_cols=("pid",)).to_pandas().sort_values("pid")
        want = RK.sample_bilinear(T, _grid(), x, y)
        keep = ~np.isnan(want)
        assert got["pid"].tolist() == np.flatnonzero(keep).tolist()
        assert (got["value"].to_numpy() == want[keep]).all()
