"""Tile math, Hilbert ids, cells, geotag — kernel unit tests.

Formulas under test mirror /root/reference/src/transform.rs:16-71; the
Hilbert tile-id ordering mirrors the pmtiles TileId sort at
/root/reference/src/processing.rs:38.
"""

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mvt_wrangler_ray.geo import cells, geotag, tilemath
from mvt_wrangler_ray.geo.geometry import (
    parse_geojson_geometry,
    points_in_polygon,
    rects_intersect_polygon,
    geoms_intersect,
    transform_geom,
)
from mvt_wrangler_ray.geo.strtree import STRtree


def test_assign_tile_known_values():
    # Tokyo (139.6917, 35.6895) at z10 → x=909, y=403 (standard slippy map)
    x, y = tilemath.assign_tile(np.array([139.6917]), np.array([35.6895]), 10)
    assert (x[0], y[0]) == (909, 403)
    # Null Island at z1 → (1, 1) quadrant
    x, y = tilemath.assign_tile(np.array([0.0]), np.array([0.0]), 1)
    assert (x[0], y[0]) == (1, 1)
    # west/north edge
    x, y = tilemath.assign_tile(np.array([-180.0]), np.array([85.0]), 3)
    assert (x[0], y[0]) == (0, 0)


def test_tile_bounds_roundtrip():
    z = 12
    xs = np.array([0, 100, 2047, 4095])
    ys = np.array([0, 100, 2047, 4095])
    w, s, e, n = tilemath.tile_bounds(z, xs, ys)
    # center of each tile assigns back to the same tile
    cx, cy = (w + e) / 2, (s + n) / 2
    ax, ay = tilemath.assign_tile(cx, cy, z)
    assert (ax == xs).all() and (ay == ys).all()
    assert (w < e).all() and (s < n).all()


def test_project_to_tile_center():
    # the center of tile (z, x, y) projects to ~extent/2
    z, x, y = 10, 909, 403
    w, s, e, n = tilemath.tile_bounds(z, np.array([x]), np.array([y]))
    # mercator-true center: lat of y+0.5 (degree midpoint is NOT the
    # projection midpoint)
    clat = tilemath.tile_y_to_lat(np.array([y + 0.5]), 2.0 ** z)
    lx, ly = tilemath.project_to_tile((w + e) / 2, clat, z, x, y, extent=4096)
    assert abs(lx[0] - 2048) < 1e-6
    assert abs(ly[0] - 2048) < 1e-6


def test_assign_tile_matches_duckdb_sql():
    """The exact SQL used by oracle_sql() reproduces the numpy kernel."""
    rng = np.random.default_rng(42)
    lon = rng.uniform(-179.9, 179.9, 500)
    lat = rng.uniform(-84.9, 84.9, 500)
    z = 12
    x, y = tilemath.assign_tile(lon, lat, z)
    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame({"lon": lon, "lat": lat}))
    sql = f"""
      SELECT
        CAST(greatest(0, least({2**z - 1}, floor((lon + 180.0) / 360.0 * {2**z}))) AS BIGINT) AS tx,
        CAST(greatest(0, least({2**z - 1}, floor(
          (1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * {2**z}
        ))) AS BIGINT) AS ty
      FROM pts
    """
    got = con.execute(sql).fetchnumpy()
    assert (got["tx"] == x).all()
    assert (got["ty"] == y).all()


def test_hilbert_roundtrip():
    rng = np.random.default_rng(7)
    for z in [0, 1, 5, 12]:
        n = 1 << z
        xs = rng.integers(0, n, 200)
        ys = rng.integers(0, n, 200)
        d = tilemath.hilbert_xy_to_d(z, xs, ys)
        assert (d >= 0).all() and (d < n * n).all()
        zz = np.full(200, z, dtype=np.int64)
        rx, ry = tilemath.hilbert_d_to_xy_arr(zz, d)
        assert (rx == xs).all() and (ry == ys).all()


def test_hilbert_locality():
    # consecutive d values are adjacent cells (the defining property)
    z = 6
    d = np.arange(4 ** z)
    zz = np.full(len(d), z)
    x, y = tilemath.hilbert_d_to_xy_arr(zz, d)
    step = np.abs(np.diff(x)) + np.abs(np.diff(y))
    assert (step == 1).all()


def test_tile_id_ordering_and_inverse():
    # tile ids are unique, zoom-partitioned, and invert correctly
    zs = np.array([0, 1, 1, 5, 9, 15])
    xs = np.array([0, 0, 1, 17, 452, 28000])
    ys = np.array([0, 1, 1, 30, 201, 12345])
    tids = np.array([tilemath.tile_id(int(z), np.array([x]), np.array([y]))[0]
                     for z, x, y in zip(zs, xs, ys)])
    assert len(set(tids.tolist())) == len(tids)
    rz, rx, ry = tilemath.tile_id_to_zxy(tids)
    assert (rz == zs).all() and (rx == xs).all() and (ry == ys).all()
    # all z=k ids sort before all z=k+1 ids (zoom-major order, PMTiles spec)
    assert tilemath.zoom_offset(2) > tilemath.tile_id(1, np.array([1]), np.array([1]))[0]


def test_quadkey_known():
    # Bing docs example: tile (3, 5) at level 3 → "213"
    qk = tilemath.quadkey_array(3, np.array([3]), np.array([5]))
    assert qk[0] == "213"


SQUARE = parse_geojson_geometry(
    {"type": "Polygon", "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]]})
DONUT = parse_geojson_geometry({
    "type": "Polygon",
    "coordinates": [
        [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
        [[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]],
    ],
})


def test_points_in_polygon_basic():
    px = np.array([5.0, 15.0, 5.0, -1.0])
    py = np.array([5.0, 5.0, 9.9, 5.0])
    got = points_in_polygon(px, py, SQUARE)
    assert got.tolist() == [True, False, True, False]


def test_points_in_polygon_hole():
    px = np.array([5.0, 2.0, 4.5])
    py = np.array([5.0, 2.0, 5.0])
    got = points_in_polygon(px, py, DONUT)
    assert got.tolist() == [False, True, False]  # 5,5 in hole; 4.5,5 in hole


def test_points_in_multipolygon():
    mp = parse_geojson_geometry({
        "type": "MultiPolygon",
        "coordinates": [
            [[[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]],
            [[[10, 10], [12, 10], [12, 12], [10, 12], [10, 10]]],
        ],
    })
    got = points_in_polygon(np.array([1.0, 11.0, 5.0]), np.array([1.0, 11.0, 5.0]), mp)
    assert got.tolist() == [True, True, False]


@settings(max_examples=40, deadline=None)
@given(st.floats(min_value=-20, max_value=30), st.floats(min_value=-20, max_value=30),
       st.floats(min_value=0.1, max_value=15), st.floats(min_value=0.1, max_value=15))
def test_rects_intersect_polygon_matches_generic(w, s, dw, dh):
    e, n = w + dw, s + dh
    rect_geom = parse_geojson_geometry({
        "type": "Polygon",
        "coordinates": [[[w, s], [e, s], [e, n], [w, n], [w, s]]],
    })
    want = geoms_intersect(rect_geom, SQUARE)
    got = rects_intersect_polygon(
        np.array([w]), np.array([s]), np.array([e]), np.array([n]), SQUARE)[0]
    assert bool(got) == want


def test_geoms_intersect_cases():
    tri = parse_geojson_geometry(
        {"type": "Polygon", "coordinates": [[[20, 20], [30, 20], [25, 30], [20, 20]]]})
    assert not geoms_intersect(tri, SQUARE)
    overlapping = parse_geojson_geometry(
        {"type": "Polygon", "coordinates": [[[5, 5], [15, 5], [15, 15], [5, 15], [5, 5]]]})
    assert geoms_intersect(overlapping, SQUARE)
    contained = parse_geojson_geometry(
        {"type": "Polygon", "coordinates": [[[2, 2], [3, 2], [3, 3], [2, 3], [2, 2]]]})
    assert geoms_intersect(contained, SQUARE)      # fully inside
    assert geoms_intersect(SQUARE, contained)      # symmetric
    pt = parse_geojson_geometry({"type": "Point", "coordinates": [5, 5]})
    assert geoms_intersect(pt, SQUARE)
    far_pt = parse_geojson_geometry({"type": "Point", "coordinates": [50, 5]})
    assert not geoms_intersect(far_pt, SQUARE)


def test_transform_geom_projects():
    g = transform_geom(SQUARE, lambda a: a * 2.0)
    assert g.bbox == (0.0, 0.0, 20.0, 20.0)


def test_strtree_matches_bruteforce():
    rng = np.random.default_rng(3)
    n = 500  # > brute-force threshold → exercises the packed tree
    mins = rng.uniform(0, 100, (n, 2))
    sizes = rng.uniform(0.1, 5, (n, 2))
    boxes = np.hstack([mins, mins + sizes])
    tree = STRtree(boxes)
    assert not tree._brute
    for _ in range(50):
        q = rng.uniform(0, 100, 2)
        qbox = (q[0], q[1], q[0] + rng.uniform(0.1, 10), q[1] + rng.uniform(0.1, 10))
        want = np.nonzero(
            (boxes[:, 0] <= qbox[2]) & (boxes[:, 2] >= qbox[0])
            & (boxes[:, 1] <= qbox[3]) & (boxes[:, 3] >= qbox[1]))[0]
        got = tree.query_box(*qbox)
        assert sorted(got.tolist()) == sorted(want.tolist())


def test_strtree_matrix_query():
    boxes = np.array([[0, 0, 1, 1], [5, 5, 6, 6], [0.5, 0.5, 2, 2]])
    tree = STRtree(boxes)
    qs = np.array([[0.8, 0.8, 0.9, 0.9], [10, 10, 11, 11]])
    m = tree.query_boxes_matrix(qs)
    assert m[0].tolist() == [True, False, True]
    assert m[1].tolist() == [False, False, False]


def test_s2_cells_hierarchy():
    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 180, 300)
    lat = rng.uniform(-85, 85, 300)
    c12 = cells.s2_cell_id(lon, lat, 12)
    c8 = cells.s2_cell_id(lon, lat, 8)
    # parent-of-level-12 at level 8 == direct level-8 id
    assert (cells.s2_parent(c12, 12, 8) == c8).all()
    assert (cells.s2_level(c12) == 12).all()
    assert (cells.s2_level(c8) == 8).all()
    # determinism
    assert (cells.s2_cell_id(lon, lat, 12) == c12).all()
    # locality: nearby points usually share coarse cells
    c2a = cells.s2_cell_id(np.array([10.0]), np.array([10.0]), 5)
    c2b = cells.s2_cell_id(np.array([10.001]), np.array([10.001]), 5)
    assert c2a[0] == c2b[0]


def test_hex_cells():
    rng = np.random.default_rng(13)
    lon = rng.uniform(-170, 170, 200)
    lat = rng.uniform(-80, 80, 200)
    h = cells.hex_cell(lon, lat, 7)
    assert (cells.hex_res(h) == 7).all()
    assert (cells.hex_cell(lon, lat, 7) == h).all()
    # nearby points share a coarse hex
    assert cells.hex_cell(np.array([10.0]), np.array([10.0]), 3)[0] == \
           cells.hex_cell(np.array([10.01]), np.array([10.01]), 3)[0]


def test_geotag_matches_duckdb_sql():
    import pandas as pd
    ids = np.arange(1, 2001, dtype=np.int64)
    lon, lat = geotag.geotag_ints(ids)
    assert (lon >= -180).all() and (lon < 180).all()
    assert (np.abs(lat) < tilemath.MERCATOR_LAT_MAX).all()
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"id": ids}))
    sql = (f"SELECT {geotag.SQL_LON.format(id='id')} AS lon, "
           f"{geotag.SQL_LAT.format(id='id')} AS lat FROM t")
    got = con.execute(sql).fetchnumpy()
    np.testing.assert_allclose(got["lon"], lon, rtol=0, atol=1e-12)
    np.testing.assert_allclose(got["lat"], lat, rtol=0, atol=1e-12)


def test_geotag_strings_deterministic():
    ids = [f"img{i:08d}" for i in range(100)]
    lon1, lat1 = geotag.geotag_strings(ids)
    lon2, lat2 = geotag.geotag_strings(ids)
    assert (lon1 == lon2).all() and (lat1 == lat2).all()
    # spread: not all in one tile
    x, y = tilemath.assign_tile(lon1, lat1, 6)
    assert len(set(zip(x.tolist(), y.tolist()))) > 50


def test_strtree_three_levels():
    """Deep tree (>NODE_CAP² items → 3+ levels) still matches brute force."""
    rng = np.random.default_rng(9)
    n = 6000
    mins = rng.uniform(0, 1000, (n, 2))
    sizes = rng.uniform(0.1, 3, (n, 2))
    boxes = np.hstack([mins, mins + sizes])
    tree = STRtree(boxes)
    assert len(tree.levels) >= 3
    for _ in range(25):
        q = rng.uniform(0, 1000, 2)
        qbox = (q[0], q[1], q[0] + rng.uniform(1, 30), q[1] + rng.uniform(1, 30))
        want = np.nonzero(
            (boxes[:, 0] <= qbox[2]) & (boxes[:, 2] >= qbox[0])
            & (boxes[:, 1] <= qbox[3]) & (boxes[:, 3] >= qbox[1]))[0]
        got = tree.query_box(*qbox)
        assert sorted(got.tolist()) == sorted(want.tolist())


def test_point_on_linestring_intersects():
    line = parse_geojson_geometry(
        {"type": "LineString", "coordinates": [[0, 0], [10, 10]]})
    on = parse_geojson_geometry({"type": "Point", "coordinates": [5, 5]})
    off = parse_geojson_geometry({"type": "Point", "coordinates": [5, 6]})
    assert geoms_intersect(on, line)
    assert geoms_intersect(line, on)
    assert not geoms_intersect(off, line)
