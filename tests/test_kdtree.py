"""Pure-numpy k-d tree: exactness vs brute force (including tie-break
parity), degenerate shapes, and the nearest_site large-set path."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mvt_wrangler_ray.geo.kdtree import KDTree2D


def _brute(px, py, sx, sy, ids):
    d2 = (px[:, None] - sx[None, :]) ** 2 + (py[:, None] - sy[None, :]) ** 2
    idx = np.argmin(d2, axis=1)
    return ids[idx], d2[np.arange(len(px)), idx]


def test_exact_vs_brute_random():
    rng = np.random.default_rng(5)
    sx = rng.uniform(-180, 180, 3000)
    sy = rng.uniform(-85, 85, 3000)
    ids = np.arange(3000, dtype=np.int64)
    px = rng.uniform(-180, 180, 5000)
    py = rng.uniform(-85, 85, 5000)
    tree = KDTree2D(np.stack([sx, sy], axis=1), ids)
    kid, kd2 = tree.nearest(px, py)
    bid, bd2 = _brute(px, py, sx, sy, ids)
    assert np.array_equal(kid, bid)
    assert np.array_equal(kd2, bd2)


def test_tie_break_lowest_id():
    # two sites at the SAME location: lowest id must win
    sx = np.array([10.0, 10.0, 50.0])
    sy = np.array([20.0, 20.0, 60.0])
    ids = np.array([7, 3, 1], dtype=np.int64)
    tree = KDTree2D(np.stack([sx, sy], axis=1), ids)
    kid, _ = tree.nearest(np.array([10.0]), np.array([20.0]))
    assert kid[0] == 3


@pytest.mark.parametrize("m", [1, 2, 3, 63, 64, 65, 257])
def test_small_and_boundary_sizes(m):
    rng = np.random.default_rng(m)
    sx = rng.uniform(-10, 10, m)
    sy = rng.uniform(-10, 10, m)
    ids = np.arange(m, dtype=np.int64)
    px = rng.uniform(-12, 12, 500)
    py = rng.uniform(-12, 12, 500)
    tree = KDTree2D(np.stack([sx, sy], axis=1), ids)
    kid, kd2 = tree.nearest(px, py)
    bid, bd2 = _brute(px, py, sx, sy, ids)
    assert np.array_equal(kid, bid)
    assert np.array_equal(kd2, bd2)


def test_collinear_and_duplicate_sites():
    sx = np.concatenate([np.full(100, 5.0), np.linspace(0, 1, 100)])
    sy = np.concatenate([np.linspace(0, 1, 100), np.full(100, 5.0)])
    ids = np.arange(200, dtype=np.int64)
    px = np.array([5.0, 0.5, -1.0, 6.0])
    py = np.array([0.5, 5.0, -1.0, 6.0])
    tree = KDTree2D(np.stack([sx, sy], axis=1), ids)
    kid, kd2 = tree.nearest(px, py)
    bid, bd2 = _brute(px, py, sx, sy, ids)
    assert np.array_equal(kid, bid)


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 400), st.integers(0, 10_000))
def test_exactness_property(m, seed):
    rng = np.random.default_rng(seed)
    sx = rng.uniform(-100, 100, m)
    sy = rng.uniform(-100, 100, m)
    ids = np.arange(m, dtype=np.int64)
    px = rng.uniform(-110, 110, 64)
    py = rng.uniform(-110, 110, 64)
    tree = KDTree2D(np.stack([sx, sy], axis=1), ids)
    kid, kd2 = tree.nearest(px, py)
    bid, bd2 = _brute(px, py, sx, sy, ids)
    assert np.array_equal(kid, bid)
    assert np.array_equal(kd2, bd2)


def test_nearest_site_batch_kdtree_path_matches_brute():
    from mvt_wrangler_ray.geo.geotag import geotag_ints
    from mvt_wrangler_ray.stages.geospatial import nearest_site_batch

    site_ids = np.arange(2000, dtype=np.int64)
    slon, slat = geotag_ints(site_ids + 5_000_000)
    plon, plat = geotag_ints(np.arange(3000, dtype=np.int64))
    batch = pa.table({"lon": pa.array(plon), "lat": pa.array(plat)})
    via_kd = nearest_site_batch(batch, slon, slat, site_ids)           # m>512
    via_brute = nearest_site_batch(batch, slon, slat, site_ids,
                                   kdtree_threshold=10_000_000)
    assert via_kd["nearest_site"].to_pylist() == \
        via_brute["nearest_site"].to_pylist()
    assert via_kd["site_dist2"].to_pylist() == \
        via_brute["site_dist2"].to_pylist()
