"""Raster↔vector conversion stages."""

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mvt_wrangler_ray.config import EngineConfig
from mvt_wrangler_ray.stages.raster import (
    _label_components,
    rasterize,
    rasterize_tile_group,
    vectorize,
    vectorize_raster_batch,
)


def test_label_components():
    occ = np.zeros((8, 8), dtype=bool)
    occ[1:3, 1:3] = True          # component A (4 cells)
    occ[5, 5] = True              # component B (1 cell)
    occ[6, 5] = True              # connected to B (4-conn)
    occ[0, 7] = True              # component C
    lab = _label_components(occ)
    labels = set(lab[occ].tolist())
    assert len(labels) == 3
    assert lab[1, 1] == lab[2, 2]
    assert lab[5, 5] == lab[6, 5]
    assert lab[0, 7] not in (lab[1, 1], lab[5, 5])


def test_rasterize_counts_conserved():
    from mvt_wrangler_ray.stages.geospatial import geotag_batch, tile_assign_batch
    from mvt_wrangler_ray.sources.images import synth_images_table

    cfg = EngineConfig(zoom=6)
    t = tile_assign_batch(geotag_batch(synth_images_table(500), cfg), cfg)
    df = t.to_pandas()
    one_tile = df[df["tile_id"] == df["tile_id"].mode().iloc[0]]
    out = rasterize_tile_group(one_tile, res=32, cfg=cfg)
    raster = np.frombuffer(out["raster"][0].as_py(), dtype=np.uint32)
    assert raster.sum() == len(one_tile)
    assert out["n_points"][0].as_py() == len(one_tile)


def test_raster_vector_roundtrip(ray_session):
    """points → raster → polygons: every point falls inside some output
    polygon of its tile."""
    import ray.data as rd

    from mvt_wrangler_ray.geo.geometry import parse_geojson_geometry, points_in_polygon
    from mvt_wrangler_ray.pipelines.wrangle import assign_stage

    cfg = EngineConfig(zoom=5)
    from mvt_wrangler_ray.sources.images import synth_images_table
    t = synth_images_table(2000)
    rows = assign_stage(rd.from_arrow(t), cfg)
    rasters = rasterize(rows, res=32, cfg=cfg)
    polys = vectorize(rasters).to_pandas()
    assert len(polys) > 0
    assert (polys["n_cells"] >= 1).all()
    # counts conserved through both conversions
    assert polys["total_count"].sum() == 2000
    # spot-check containment: the densest component's polygon contains
    # at least one original point of that tile
    top = polys.sort_values("total_count", ascending=False).iloc[0]
    g = parse_geojson_geometry(json.loads(top["polygon"]))
    src = rows.to_pandas()
    tile_pts = src[src["tile_id"] == top["tile_id"]]
    inside = points_in_polygon(tile_pts["lon"].to_numpy(),
                               tile_pts["lat"].to_numpy(), g)
    assert inside.any()
