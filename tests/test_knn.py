"""kNN join: exactness vs brute force, including cross-cell neighbors."""

import numpy as np
import pyarrow as pa
import pytest

from karta_ray.kernels import tiles
from karta_ray.stages.knn import KnnJoiner, RightIndex, _dist_sphere


def brute_knn(qlon, qlat, ids, rlon, rlat, k):
    d = _dist_sphere(qlon[:, None], qlat[:, None], rlon[None, :], rlat[None, :])
    order = np.lexsort((np.broadcast_to(ids, d.shape), d), axis=1)[:, :k]
    return ids[order]


def make_joiner(index, k):
    return KnnJoiner(index, k=k)


class TestKnnExact:
    def test_matches_brute_force(self):
        rng = np.random.RandomState(7)
        n_r = 500
        rlon = rng.uniform(-170, 170, n_r)
        rlat = rng.uniform(-75, 75, n_r)
        ids = np.arange(1000, 1000 + n_r)
        index = RightIndex(ids, rlon, rlat, zoom=5)

        n_q = 200
        qlon = rng.uniform(-179, 179, n_q)
        qlat = rng.uniform(-80, 80, n_q)
        cells = tiles.cell_id(qlon, qlat, 5)
        batch = pa.table({"qid": pa.array(np.arange(n_q)),
                          "lon": pa.array(qlon), "lat": pa.array(qlat),
                          "cell_id": pa.array(cells)})
        k = 5
        out = make_joiner(index, k)(batch)
        got = {}
        for qid, nid, rank in zip(out.column("qid").to_pylist(),
                                  out.column("neighbor_id").to_pylist(),
                                  out.column("rank").to_pylist()):
            got.setdefault(qid, {})[rank] = nid
        want = brute_knn(qlon, qlat, ids, rlon, rlat, k)
        for q in range(n_q):
            assert [got[q][r] for r in range(1, k + 1)] == want[q].tolist(), q

    def test_sparse_right_side(self):
        # fewer right points than k in any nearby cell -> ring expansion
        # must still find the globally nearest ones
        rlon = np.array([0.0, 90.0, -90.0, 179.0])
        rlat = np.array([0.0, 40.0, -40.0, -70.0])
        ids = np.array([1, 2, 3, 4])
        index = RightIndex(ids, rlon, rlat, zoom=6)
        qlon = np.array([10.0])
        qlat = np.array([5.0])
        batch = pa.table({"lon": pa.array(qlon), "lat": pa.array(qlat),
                          "cell_id": pa.array(tiles.cell_id(qlon, qlat, 6))})
        out = make_joiner(index, 2)(batch)
        want = brute_knn(qlon, qlat, ids, rlon, rlat, 2)
        assert out.column("neighbor_id").to_pylist() == want[0].tolist()

    def test_dateline_neighbors(self):
        # nearest neighbor across the dateline must be found
        rlon = np.array([179.5, 170.0, 0.0])
        rlat = np.array([10.0, 10.0, 10.0])
        ids = np.array([11, 12, 13])
        index = RightIndex(ids, rlon, rlat, zoom=6)
        qlon = np.array([-179.8])
        qlat = np.array([10.0])
        batch = pa.table({"lon": pa.array(qlon), "lat": pa.array(qlat),
                          "cell_id": pa.array(tiles.cell_id(qlon, qlat, 6))})
        out = make_joiner(index, 1)(batch)
        assert out.column("neighbor_id").to_pylist() == [11]


@pytest.mark.usefixtures("ray_session")
class TestKnnCoshuffle:
    def test_matches_brute_force(self):
        import ray.data

        from karta_ray.stages.knn import knn_join_coshuffle

        rng = np.random.RandomState(11)
        n_r, n_l, k = 400, 150, 3
        rlon = rng.uniform(-60, 60, n_r)
        rlat = rng.uniform(-50, 50, n_r)
        rids = np.arange(5000, 5000 + n_r)
        llon = rng.uniform(-55, 55, n_l)
        llat = rng.uniform(-45, 45, n_l)
        lids = np.arange(n_l)
        zoom = 3  # large cells -> candidates dense, residue small

        left = pa.table({"left_id": pa.array(lids),
                         "lon": pa.array(llon), "lat": pa.array(llat),
                         "cell_id": pa.array(tiles.cell_id(llon, llat, zoom))})
        right = pa.table({"right_id": pa.array(rids),
                          "lon": pa.array(rlon), "lat": pa.array(rlat)})
        out = knn_join_coshuffle(ray.data.from_arrow(left),
                                 ray.data.from_arrow(right),
                                 k, zoom=zoom).to_pandas()
        want = brute_knn(llon, llat, rids, rlon, rlat, k)
        got = {}
        for _, row in out.iterrows():
            got.setdefault(int(row.left_id), {})[int(row["rank"])] = int(row.neighbor_id)
        for q in range(n_l):
            assert [got[q][r] for r in range(1, k + 1)] == want[q].tolist(), q


class TestKnnCoshuffleHotCell:
    def test_hot_cell_query_tiling_exact(self):
        # dense-city skew: thousands of left rows + hundreds of right
        # rows in ONE cell, forcing multiple _Q_TILE query tiles through
        # the probe (memory stays tile x ncand, not nq x ncand); the
        # tiled path must stay exact vs brute force
        import ray.data

        import karta_ray.stages.knn as knnmod
        from karta_ray.stages.knn import knn_join_coshuffle

        rng = np.random.RandomState(17)
        n_l, n_r, k = 3000, 300, 3
        assert n_l > 2 * knnmod._Q_TILE  # ensure >= 3 tiles
        # everything inside one zoom-2 cell (cells are 90 deg wide)
        llon = rng.uniform(10, 40, n_l)
        llat = rng.uniform(10, 30, n_l)
        rlon = rng.uniform(10, 40, n_r)
        rlat = rng.uniform(10, 30, n_r)
        lids = np.arange(n_l)
        rids = np.arange(7000, 7000 + n_r)
        zoom = 2
        left = pa.table({"left_id": pa.array(lids),
                         "lon": pa.array(llon), "lat": pa.array(llat),
                         "cell_id": pa.array(tiles.cell_id(llon, llat, zoom))})
        right = pa.table({"right_id": pa.array(rids),
                          "lon": pa.array(rlon), "lat": pa.array(rlat)})
        out = knn_join_coshuffle(ray.data.from_arrow(left),
                                 ray.data.from_arrow(right),
                                 k, zoom=zoom).to_pandas()
        want = brute_knn(llon, llat, rids, rlon, rlat, k)
        got = {}
        for _, row in out.iterrows():
            got.setdefault(int(row.left_id), {})[int(row["rank"])] = \
                int(row.neighbor_id)
        for q in range(n_l):
            assert [got[q][r] for r in range(1, k + 1)] == want[q].tolist(), q


class TestKnnCoshuffleEdgeCases:
    def test_nan_coordinates_do_not_crash(self):
        # ADVICE r01: rows without coordinates (cell_id == -1) used to
        # reach unpack_cell(-1)/_explored_bound_m and raise; they must
        # simply be dropped on both sides (KnnJoiner semantics)
        import ray.data

        from karta_ray.stages.knn import knn_join_coshuffle

        rng = np.random.RandomState(3)
        n_r, n_l, k = 60, 25, 2
        rlon = rng.uniform(-40, 40, n_r)
        rlat = rng.uniform(-30, 30, n_r)
        rlon[::7] = np.nan  # some right rows without coords
        rids = np.arange(9000, 9000 + n_r)
        llon = rng.uniform(-35, 35, n_l)
        llat = rng.uniform(-25, 25, n_l)
        llon[::5] = np.nan  # some left rows without coords
        lids = np.arange(n_l)
        zoom = 2
        left = pa.table({"left_id": pa.array(lids),
                         "lon": pa.array(llon), "lat": pa.array(llat),
                         "cell_id": pa.array(tiles.cell_id(llon, llat, zoom))})
        right = pa.table({"right_id": pa.array(rids),
                          "lon": pa.array(rlon), "lat": pa.array(rlat)})
        out = knn_join_coshuffle(ray.data.from_arrow(left),
                                 ray.data.from_arrow(right),
                                 k, zoom=zoom).to_pandas()
        lok = ~np.isnan(llon)
        rok = ~np.isnan(rlon)
        want = brute_knn(llon[lok], llat[lok], rids[rok],
                         rlon[rok], rlat[rok], k)
        got = {}
        for _, row in out.iterrows():
            got.setdefault(int(row.left_id), {})[int(row["rank"])] = \
                int(row.neighbor_id)
        assert set(got) == set(lids[lok].tolist())
        for qi, q in enumerate(lids[lok]):
            assert [got[q][r] for r in range(1, k + 1)] == want[qi].tolist()

    def test_sparse_right_forces_residue_rounds(self):
        # right side so sparse that most cells fail the in-cell bound:
        # the distributed residue rounds (left-fanout, ring doubling up
        # to full cover) must still produce exact results
        import ray.data

        from karta_ray.stages.knn import knn_join_coshuffle

        rng = np.random.RandomState(23)
        n_r, n_l, k = 8, 40, 3
        rlon = rng.uniform(-150, 150, n_r)
        rlat = rng.uniform(-70, 70, n_r)
        rids = np.arange(100, 100 + n_r)
        llon = rng.uniform(-170, 170, n_l)
        llat = rng.uniform(-75, 75, n_l)
        lids = np.arange(n_l)
        zoom = 4  # 16x16 grid, 8 right points -> almost all cells empty
        left = pa.table({"left_id": pa.array(lids),
                         "lon": pa.array(llon), "lat": pa.array(llat),
                         "cell_id": pa.array(tiles.cell_id(llon, llat, zoom))})
        right = pa.table({"right_id": pa.array(rids),
                          "lon": pa.array(rlon), "lat": pa.array(rlat)})
        out = knn_join_coshuffle(ray.data.from_arrow(left),
                                 ray.data.from_arrow(right),
                                 k, zoom=zoom).to_pandas()
        want = brute_knn(llon, llat, rids, rlon, rlat, k)
        got = {}
        for _, row in out.iterrows():
            got.setdefault(int(row.left_id), {})[int(row["rank"])] = \
                int(row.neighbor_id)
        assert set(got) == set(lids.tolist())
        for q in range(n_l):
            assert [got[q][r] for r in range(1, k + 1)] == want[q].tolist(), q
