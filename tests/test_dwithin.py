"""Radius self-join (within_distance_pairs): grid plan vs brute force."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from mvt_wrangler_ray.stages.geospatial import within_distance_pairs


def _brute(ids, lon, lat, r):
    out = set()
    r2 = r * r
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d2 = (lon[i] - lon[j]) ** 2 + (lat[i] - lat[j]) ** 2
            if d2 <= r2:
                a, b = sorted((int(ids[i]), int(ids[j])))
                out.add((a, b))
    return out


def _run(ids, lon, lat, r, **kw):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "lon": pa.array(lon, pa.float64()),
        "lat": pa.array(lat, pa.float64())}))
    df = within_distance_pairs(ds, radius=r, **kw).to_pandas()
    return set(map(tuple, df[["id_a", "id_b"]].to_numpy()))


def test_dwithin_matches_brute_force(ray_session):
    rng = np.random.default_rng(7)
    n = 300
    ids = rng.permutation(n).astype(np.int64)  # non-sequential ids
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-85, 85, n)
    for r in (2.0, 11.0):
        got = _run(ids, lon, lat, r)
        assert got == _brute(ids, lon, lat, r)
        # a<b invariant and exactly-once emission are implied by set
        # equality against the canonical brute pairs


def test_dwithin_cell_boundary_pairs(ray_session):
    # points straddling cell edges at exactly-radius separations must
    # still pair through the ghost replication
    r = 1.0
    lon = np.array([0.0, 1.0, -0.25, 179.5, -179.9])
    lat = np.array([0.0, 0.0, 0.75, 80.0, 80.0])
    ids = np.arange(5, dtype=np.int64)
    got = _run(ids, lon, lat, r)
    assert got == _brute(ids, lon, lat, r)
    assert (0, 1) in got  # separation exactly == radius is inclusive


def test_dwithin_cell_cap_raises(ray_session):
    ids = np.arange(50, dtype=np.int64)
    lon = np.full(50, 10.0)
    lat = np.full(50, 10.0)
    with pytest.raises(Exception, match="cell_cap"):
        _run(ids, lon, lat, 1.0, cell_cap=10)
    # uncapped degenerate cell is exact
    got = _run(ids, lon, lat, 1.0, cell_cap=None)
    assert len(got) == 50 * 49 // 2


def test_dwithin_duplicate_ids_no_self_pairs(ray_session):
    # input violating the unique-id contract must not emit (x, x) pairs
    ids = np.array([5, 5, 9], dtype=np.int64)
    lon = np.array([0.0, 0.1, 0.2])
    lat = np.array([0.0, 0.0, 0.0])
    got = _run(ids, lon, lat, 1.0)
    assert got == {(5, 9)}
