"""Deterministic synthetic features table (FIXTURES.md §2) mirroring the
reference fixture corpus: a Yakushima-area extract with 9 layers across
z9–z15, multilingual ``name:*`` tags (incl. the ``name:fr`` the golden
test asserts is dropped), one layer with a non-default extent (8192) to
exercise per-layer reprojection (transform.rs:94), and mixed tag value
types covering the reference unit-test context (executor.rs:252-309)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo.geotag import fnv1a64_strings
from ..geo.tilemath import assign_tile, tile_id
from ..pipelines.features import TAGS_TYPE, tag_value

LAYERS = ["boundaries", "buildings", "earth", "landcover", "landuse",
          "places", "pois", "roads", "water"]
GEOM_TYPES = {"boundaries": "LineString", "buildings": "Polygon",
              "earth": "Polygon", "landcover": "Polygon", "landuse": "Polygon",
              "places": "Point", "pois": "Point", "roads": "LineString",
              "water": "Polygon"}
# Yakushima-ish bounds (reference fixture header: [130.348, 30.210,
# 130.706, 30.494])
BOUNDS = (130.348, 30.210, 130.706, 30.494)
LANGS = ["", "ja", "en", "fr", "de", "2"]


def synth_features_table(n: int, start: int = 0, zmin: int = 9, zmax: int = 15) -> pa.Table:
    ids = np.arange(start, start + n, dtype=np.int64)
    fid = np.array([f"feat{i:08d}" for i in ids], dtype=object)
    h = fnv1a64_strings(fid)

    w, s, e, nn = BOUNDS
    lon = w + (h % np.uint64(1_000_000)).astype(np.float64) / 1e6 * (e - w)
    lat = s + ((h >> np.uint64(20)) % np.uint64(1_000_000)).astype(np.float64) / 1e6 * (nn - s)

    layer_idx = (ids % len(LAYERS)).astype(np.int64)
    layer = np.array([LAYERS[i] for i in layer_idx], dtype=object)
    geom_type = np.array([GEOM_TYPES[l] for l in layer], dtype=object)
    # one layer exercises the non-default extent (transform.rs:94)
    extent = np.where(layer == "buildings", 8192, 4096).astype(np.int32)

    z = (zmin + (h % np.uint64(zmax - zmin + 1)).astype(np.int64)).astype(np.int64)
    xs = np.empty(n, dtype=np.int64)
    ys = np.empty(n, dtype=np.int64)
    tids = np.empty(n, dtype=np.int64)
    for zz in range(zmin, zmax + 1):
        m = z == zz
        if m.any():
            x_, y_ = assign_tile(lon[m], lat[m], zz)
            xs[m], ys[m] = x_, y_
            tids[m] = tile_id(zz, x_, y_)

    tags_rows = []
    for i in range(n):
        hid = int(h[i])
        t = [("name", tag_value(f"Feature {int(ids[i])}")),
             ("kind", tag_value("building" if layer[i] == "buildings" and hid % 2 == 0
                                else f"kind{hid % 5}")),
             ("area", tag_value((hid % 1000) / 10.0)),
             ("public", tag_value(hid % 3 == 0)),
             ("capacity", tag_value(hid % 5000))]
        # lang index 0 is "" (the bare name key, already emitted above) —
        # only the name:<lang> variants are appended here
        for j, lang in enumerate(LANGS[1:], 1):
            if hid % len(LANGS) != j:
                t.append((f"name:{lang}",
                          tag_value(f"Feature {int(ids[i])} ({lang})")))
        if hid % 4 == 0:
            t.append(("pgf:name:ja", tag_value("ラベル")))
        tags_rows.append(t)

    return pa.table({
        "feature_id": pa.array(fid, pa.string()),
        "z": pa.array(z.astype(np.int8), pa.int8()),
        "x": pa.array(xs.astype(np.int32), pa.int32()),
        "y": pa.array(ys.astype(np.int32), pa.int32()),
        "tile_id": pa.array(tids, pa.int64()),
        "layer": pa.array(layer, pa.string()),
        "extent": pa.array(extent, pa.int32()),
        "geom_type": pa.array(geom_type, pa.string()),
        "lon": pa.array(lon, pa.float64()),
        "lat": pa.array(lat, pa.float64()),
        "tags": pa.array(tags_rows, TAGS_TYPE),
    })
