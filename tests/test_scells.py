"""Tests for the S2-style cube-face spherical cell index."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from karta_ray.kernels import scells

lon_st = st.floats(min_value=-180.0, max_value=180.0,
                   allow_nan=False, allow_infinity=False)
lat_st = st.floats(min_value=-90.0, max_value=90.0,
                   allow_nan=False, allow_infinity=False)


def test_faces_cover_sphere():
    rng = np.random.RandomState(0)
    lon = rng.uniform(-180, 180, 20000)
    lat = rng.uniform(-90, 90, 20000)
    face, u, v = scells.face_uv(lon, lat)
    assert set(np.unique(face)) == set(range(6))
    assert np.all(np.abs(u) <= 1.0 + 1e-12)
    assert np.all(np.abs(v) <= 1.0 + 1e-12)


def test_poles_and_dateline_valid():
    lon = np.array([0.0, 180.0, -180.0, 45.0, -135.0, 10.0])
    lat = np.array([90.0, -90.0, 0.0, 90.0, -90.0, 0.0])
    face, u, v = scells.face_uv(lon, lat)
    # poles land on the z faces
    assert face[0] == 2 and face[1] == 5 and face[3] == 2 and face[4] == 5
    cell = scells.cell_id(lon, lat, 12)
    assert np.all(cell >= 0)
    assert np.all((cell >> np.int64(24)) == face)


def test_morton_roundtrip():
    rng = np.random.RandomState(1)
    i = rng.randint(0, 1 << 12, 5000).astype(np.int64)
    j = rng.randint(0, 1 << 12, 5000).astype(np.int64)
    m = scells.morton(i, j)
    # decode by de-interleaving bit by bit
    ii = np.zeros_like(i)
    jj = np.zeros_like(j)
    for b in range(12):
        ii |= ((m >> np.int64(2 * b + 1)) & 1) << np.int64(b)
        jj |= ((m >> np.int64(2 * b)) & 1) << np.int64(b)
    assert np.array_equal(ii, i)
    assert np.array_equal(jj, j)
    # morton of halved coords == code >> 2
    assert np.array_equal(scells.morton(i >> 1, j >> 1), m >> np.int64(2))


def test_parent_contains_child():
    rng = np.random.RandomState(2)
    lon = rng.uniform(-180, 180, 10000)
    lat = rng.uniform(-90, 90, 10000)
    for lv in (4, 9, 12):
        child = scells.cell_id(lon, lat, lv)
        parent_direct = scells.cell_id(lon, lat, lv - 1)
        assert np.array_equal(scells.parent_cell(child, lv),
                              parent_direct)


def test_morton_sql_matches_numpy():
    import duckdb

    rng = np.random.RandomState(3)
    i = rng.randint(0, 1 << 12, 2000).astype(np.int64)
    j = rng.randint(0, 1 << 12, 2000).astype(np.int64)
    want = scells.morton(i, j)
    import pandas as pd
    df = pd.DataFrame({"i": i, "j": j})
    expr = scells.morton_sql("i", "j", 12)
    got = duckdb.sql(f"SELECT {expr} AS m FROM df").df()["m"].to_numpy()
    assert np.array_equal(got.astype(np.int64), want)


@settings(max_examples=200, deadline=None)
@given(lon_st, lat_st, st.integers(min_value=1, max_value=20))
def test_cell_valid_range_property(lon, lat, level):
    cell = int(scells.cell_id(np.array([lon]), np.array([lat]), level)[0])
    face = cell >> (2 * level)
    code = cell & ((1 << (2 * level)) - 1)
    assert 0 <= face < 6
    assert 0 <= code < 1 << (2 * level)
    if level > 1:
        par = int(scells.parent_cell(np.array([cell]), level)[0])
        assert par == int(scells.cell_id(np.array([lon]),
                                         np.array([lat]), level - 1)[0])


def test_cell_pyramid_invariants(ray_session):
    from karta_ray.pipelines.queries import points_ds
    from karta_ray.pipelines.queries4 import SCELL_LEVEL, q_cell_pyramid

    sf = "/root/testdata/sf0.001"
    df = q_cell_pyramid(sf).to_pandas()
    n_total = points_ds(sf).count()
    per_level = df.groupby("level")["n_points"].sum()
    assert set(per_level.index) == set(range(SCELL_LEVEL + 1))
    assert (per_level == n_total).all()
    # level 0: at most 6 face cells, ids are the face numbers
    z0 = df[df["level"] == 0]
    assert set(z0["s_cell"]).issubset(set(range(6)))
    # children roll up to their parent exactly
    lv = SCELL_LEVEL
    ch = df[df["level"] == lv].copy()
    ch["parent"] = scells.parent_cell(
        ch["s_cell"].to_numpy(), lv)
    rolled = ch.groupby("parent")["n_points"].sum()
    par = df[df["level"] == lv - 1].set_index("s_cell")["n_points"]
    assert rolled.sort_index().equals(par.sort_index())
