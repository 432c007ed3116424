"""Regressions for the round-2 geo/stages/state review findings (each
reproduced before the fix)."""

import json

import numpy as np
import pyarrow as pa
import pytest


def test_tag_drop_masks_evaluate_against_original_columns():
    """transform.rs consults the UNTOUCHED tag map for every key; the
    vectorized stage previously nulled columns inside the loop, so later
    columns saw mutated inputs (column-order-dependent results)."""
    from mvt_wrangler_ray.stages.filter_join import FilterJoinStage

    filters = {
        "type": "FeatureCollection",
        "features": [{
            "type": "Feature",
            "geometry": {"type": "Polygon",
                         "coordinates": [[[-180, -85], [180, -85],
                                          [180, 85], [-180, 85],
                                          [-180, -85]]]},
            "properties": {"layers": {"*": {
                "tag": ["==", ["tag", "caption"], "x"]}}},
        }],
    }
    stage = FilterJoinStage(json.dumps(filters))
    batch = pa.table({
        "lon": pa.array([10.0, 20.0]),
        "lat": pa.array([10.0, 20.0]),
        "caption": pa.array(["x", "y"]),
        "fmt": pa.array(["jpg", "png"]),
    })
    out = stage(batch)
    # row 0: caption == 'x' → EVERY tag drops (fmt evaluated against the
    # original caption, not the already-nulled one)
    assert out["caption"][0].as_py() is None
    assert out["fmt"][0].as_py() is None
    assert out["caption"][1].as_py() == "y"
    assert out["fmt"][1].as_py() == "png"


def test_null_layer_rows_take_wildcard_filter():
    """Rows with a NULL layer previously bypassed every filter because
    astype('U') compared the string 'None' against None cells."""
    from mvt_wrangler_ray.expr.vector import ColumnTagContext, VBatch
    from mvt_wrangler_ray.filters import CompiledFilterCollection

    filters = {
        "type": "FeatureCollection",
        "features": [{
            "type": "Feature",
            "geometry": {"type": "Polygon",
                         "coordinates": [[[-180, -85], [180, -85],
                                          [180, 85], [-180, 85],
                                          [-180, -85]]]},
            "properties": {"layers": {"*": {
                "feature": ["==", ["type"], "Point"]}}},
        }],
    }
    fc = CompiledFilterCollection.from_geojson(json.dumps(filters))
    n = 3
    ctx = ColumnTagContext(
        n, {}, geometry_type=VBatch.from_scalar((4, "Point"), n))
    layer = np.array(["roads", None, "pois"], dtype=object)
    mask = np.ones((n, 1), dtype=bool)
    drop = fc.feature_drop_mask(ctx, layer, mask)
    assert list(drop) == [True, True, True]   # None-layer row included


def test_hex_cell_pole_clamp():
    from mvt_wrangler_ray.geo.cells import hex_cell, hex_res

    cells = hex_cell(np.array([0.0, 12.0]), np.array([90.0, -90.0]), 20)
    assert list(hex_res(cells)) == [20, 20]   # res field intact
    # equals the clamped computation
    from mvt_wrangler_ray.geo.tilemath import MERCATOR_LAT_MAX
    expect = hex_cell(np.array([0.0, 12.0]),
                      np.array([MERCATOR_LAT_MAX, -MERCATOR_LAT_MAX]), 20)
    assert np.array_equal(cells, expect)


def test_stale_partitions_removed_on_shrunk_plan(ray_session, tmp_path):
    """Rerunning an out_dir with FEWER partitions must not leave the old
    high-numbered part dirs (their rows would read duplicated)."""
    import os
    import warnings

    import ray.data as rd

    from mvt_wrangler_ray.state.lineage import write_partitioned

    out = str(tmp_path / "o")
    t = pa.table({"tile_id": pa.array(np.arange(1000), pa.int64()),
                  "v": pa.array(np.arange(1000.0))})
    write_partitioned(rd.from_arrow(t), out, num_partitions=8)
    assert len([d for d in os.listdir(out) if d.startswith("part=")]) == 8
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        recs = write_partitioned(rd.from_arrow(t), out, num_partitions=4)
    dirs = [d for d in os.listdir(out) if d.startswith("part=")]
    assert sorted(dirs) == [f"part={i:05d}" for i in range(4)]
    assert len(recs) == 4
    assert sum(r["rows"] for r in recs) == 1000   # no duplicated rows


def test_write_partitioned_empty_dataset(ray_session, tmp_path):
    import ray.data as rd

    from mvt_wrangler_ray.state.lineage import write_partitioned

    out = str(tmp_path / "e")
    t = pa.table({"tile_id": pa.array([], pa.int64()),
                  "v": pa.array([], pa.float64())})
    recs = write_partitioned(rd.from_arrow(t), out, num_partitions=4)
    assert sum(r["rows"] for r in recs) == 0
    import os
    assert os.path.exists(os.path.join(out, "_metadata.json"))


def test_sessionize_ns_timestamps_unify(ray_session):
    """timestamp[ns] input: empty and non-empty groups must emit the
    SAME session_start type (us)."""
    import pandas as pd
    import ray.data as rd

    from mvt_wrangler_ray.stages.events import sessionize

    df = pd.DataFrame({
        "user_id": np.arange(50, dtype=np.int64) % 7,
        "ts": pd.date_range("2024-01-01", periods=50, freq="1min"),
    })
    assert df["ts"].dtype == "datetime64[ns]"
    out = sessionize(rd.from_pandas(df), gap_minutes=5).to_pandas()
    assert len(out) >= 7
    assert str(out["session_start"].dtype).startswith("datetime64")
