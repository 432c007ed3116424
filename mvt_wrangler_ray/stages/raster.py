"""Raster ↔ vector conversion (north_rule checklist item).

rasterize: point features → per-tile count rasters (res × res uint32),
    vectorized binning (np.add.at over local-coordinate bins) inside a
    per-tile group — the raster analogue of the tile-encode stage. The
    raster travels as a binary column (opaque payload + typed metadata,
    the multimodal-column pattern).

vectorize: raster → vector polygons of connected occupied regions —
    4-connected component labeling (iterative min-label propagation,
    pure numpy, converges in O(diameter) whole-array passes on the
    res×res grid) followed by per-component bounding-ring extraction in
    tile-local coordinates, projected back to WGS84 with the inverse
    Web-Mercator formulas (transform.rs:47-71).

Both run inside `map_batches`/`map_groups` — each tile is independent,
so the stage scales with tile count.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import EngineConfig
from ..geo.tilemath import tile_bounds, tile_y_to_lat


def rasterize_tile_group(group: pa.Table, res: int = 64,
                         cfg: Optional[EngineConfig] = None) -> pa.Table:
    """``groupby(tile_id).map_groups``: one row per tile with a count
    raster over the tile's local grid. Input rows need lon/lat + z/x/y.
    Arrow-native group body — the binning is numpy-on-columns anyway."""
    cfg = cfg or EngineConfig()
    if isinstance(group, pd.DataFrame):
        group = pa.Table.from_pandas(group, preserve_index=False)
    z = int(group["z"][0].as_py())
    x = int(group["x"][0].as_py())
    y = int(group["y"][0].as_py())
    from ..geo.tilemath import lonlat_to_tile_frac

    fx, fy = lonlat_to_tile_frac(
        group["lon"].to_numpy(zero_copy_only=False),
        group["lat"].to_numpy(zero_copy_only=False), z)
    cx = np.clip(((fx - x) * res).astype(np.int64), 0, res - 1)
    cy = np.clip(((fy - y) * res).astype(np.int64), 0, res - 1)
    raster = np.zeros((res, res), dtype=np.uint32)
    np.add.at(raster, (cy, cx), 1)
    return pa.table({
        "tile_id": pa.array([int(group["tile_id"][0].as_py())], pa.int64()),
        "z": pa.array([z], pa.int64()), "x": pa.array([x], pa.int64()),
        "y": pa.array([y], pa.int64()),
        "res": pa.array([res], pa.int64()),
        "n_points": pa.array([len(group)], pa.int64()),
        "raster": pa.array([raster.tobytes()], pa.binary()),
    })


def rasterize(ds, res: int = 64, cfg: Optional[EngineConfig] = None,
              num_buckets: int = 64):
    """Bucketed: tiles route to num_buckets hash buckets; each bucket
    rasterizes all its tiles (Arrow-native per-tile slices) — bounded
    Python group count instead of one group per tile."""
    from .shuffle import add_bucket_column

    bucketed = ds.map_batches(
        lambda b: add_bucket_column(b, ["tile_id"], num_buckets),
        batch_format="pyarrow")

    _EMPTY = pa.table({
        "tile_id": pa.array([], pa.int64()), "z": pa.array([], pa.int64()),
        "x": pa.array([], pa.int64()), "y": pa.array([], pa.int64()),
        "res": pa.array([], pa.int64()), "n_points": pa.array([], pa.int64()),
        "raster": pa.array([], pa.binary())})

    def raster_bucket(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return _EMPTY
        tid = g["tile_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(tid, kind="stable")
        g = g.take(order)
        tid = tid[order]
        cuts = np.nonzero(np.diff(tid))[0] + 1
        starts = np.concatenate([[0], cuts])
        ends = np.concatenate([cuts, [len(tid)]])
        outs = [rasterize_tile_group(g.slice(int(s), int(e - s)), res, cfg)
                for s, e in zip(starts, ends)]
        return pa.concat_tables(outs)

    return bucketed.groupby("bucket").map_groups(
        raster_bucket, batch_format="pyarrow")


def _label_components(occ: np.ndarray, max_iters: int = 10_000) -> np.ndarray:
    """4-connected component labels of a boolean grid: seed each occupied
    cell with its linear index, repeatedly take the min over the 4
    neighborhood (whole-array shifts) until fixpoint."""
    res_y, res_x = occ.shape
    lab = np.where(occ, np.arange(occ.size, dtype=np.int64).reshape(occ.shape),
                   np.int64(occ.size))
    for _ in range(max_iters):
        prev = lab
        m = lab.copy()
        m[1:, :] = np.minimum(m[1:, :], lab[:-1, :])
        m[:-1, :] = np.minimum(m[:-1, :], lab[1:, :])
        m[:, 1:] = np.minimum(m[:, 1:], lab[:, :-1])
        m[:, :-1] = np.minimum(m[:, :-1], lab[:, 1:])
        lab = np.where(occ, m, np.int64(occ.size))
        if np.array_equal(lab, prev):
            break
    return lab


def vectorize_raster_batch(batch: pa.Table, threshold: int = 1) -> pa.Table:
    """Raster rows → vector polygon rows: one row per connected occupied
    component with its WGS84 bounding ring (GeoJSON-style coordinates)
    and aggregate count."""
    import json

    out = {"tile_id": [], "z": [], "x": [], "y": [], "component": [],
           "n_cells": [], "total_count": [], "polygon": []}
    for i in range(len(batch)):
        res = int(batch["res"][i].as_py())
        z = int(batch["z"][i].as_py())
        tx = int(batch["x"][i].as_py())
        ty = int(batch["y"][i].as_py())
        raster = np.frombuffer(batch["raster"][i].as_py(),
                               dtype=np.uint32).reshape(res, res)
        occ = raster >= threshold
        if not occ.any():
            continue
        lab = _label_components(occ)
        nval = np.float64(2.0) ** z
        for comp in np.unique(lab[occ]):
            m = lab == comp
            ys, xs = np.nonzero(m)
            # cell range → fractional tile coords → WGS84
            fx0 = tx + xs.min() / res
            fx1 = tx + (xs.max() + 1) / res
            fy0 = ty + ys.min() / res
            fy1 = ty + (ys.max() + 1) / res
            lon0 = fx0 / nval * 360.0 - 180.0
            lon1 = fx1 / nval * 360.0 - 180.0
            lat0 = float(tile_y_to_lat(np.array([fy0]), nval)[0])  # north
            lat1 = float(tile_y_to_lat(np.array([fy1]), nval)[0])  # south
            # counterclockwise exterior ring (RFC 7946 right-hand rule):
            # SW → SE → NE → NW → SW
            ring = [[lon0, lat1], [lon1, lat1], [lon1, lat0],
                    [lon0, lat0], [lon0, lat1]]
            out["tile_id"].append(int(batch["tile_id"][i].as_py()))
            out["z"].append(z)
            out["x"].append(tx)
            out["y"].append(ty)
            out["component"].append(int(comp))
            out["n_cells"].append(int(m.sum()))
            out["total_count"].append(int(raster[m].sum()))
            out["polygon"].append(json.dumps(
                {"type": "Polygon", "coordinates": [ring]}))
    return pa.table({
        "tile_id": pa.array(out["tile_id"], pa.int64()),
        "z": pa.array(out["z"], pa.int64()),
        "x": pa.array(out["x"], pa.int64()),
        "y": pa.array(out["y"], pa.int64()),
        "component": pa.array(out["component"], pa.int64()),
        "n_cells": pa.array(out["n_cells"], pa.int64()),
        "total_count": pa.array(out["total_count"], pa.int64()),
        "polygon": pa.array(out["polygon"], pa.string()),
    })


def vectorize(raster_ds, threshold: int = 1):
    return raster_ds.map_batches(
        lambda b: vectorize_raster_batch(b, threshold), batch_format="pyarrow")
