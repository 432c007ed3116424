"""End-to-end flagship pipeline tests (Ray local, session fixture).

Mirrors the reference integration strategy (tests/integration_test.rs:63-137):
run the real pipeline on a fixture input + filter collection, then assert
golden properties — masked rows dropped, tag gone everywhere, everything
outside the masks untouched — against a row-wise oracle.
"""

import gzip
import json

import numpy as np
import pyarrow as pa
import pytest

from mvt_wrangler_ray.config import EngineConfig
from mvt_wrangler_ray.expr.rowexec import EvaluationContext
from mvt_wrangler_ray.expr.values import vbool, vfloat_from_f64, vint, vstr
from mvt_wrangler_ray.filters import CompiledFilterCollection
from mvt_wrangler_ray.geo.geometry import points_in_polygon
from mvt_wrangler_ray.sources.images import synth_images_table
from mvt_wrangler_ray.stages.geospatial import geotag_batch, tile_assign_batch
from mvt_wrangler_ray.stages.tile_encode import decode_tile_blob

# masks re-anchored to the synthetic geotag space (FIXTURES.md §3):
# polygon A covers the hot cluster; B a band to the west; world wildcard
POLY_A = [[130.60, 30.30], [130.75, 30.30], [130.75, 30.45], [130.60, 30.45],
          [130.60, 30.30]]
POLY_B = [[-60.0, -30.0], [-20.0, -30.0], [-20.0, 30.0], [-60.0, 30.0], [-60.0, -30.0]]

FILTERS = {
    "type": "FeatureCollection",
    "features": [
        {   # drop ALL images inside A  (fixture filter 1 semantics)
            "type": "Feature",
            "properties": {"name": "A", "layers": {"images": {"feature": ["boolean", True]}}},
            "geometry": {"type": "Polygon", "coordinates": [POLY_A]},
        },
        {   # drop jpeg images inside B (fixture filter 2 semantics)
            "type": "Feature",
            "properties": {"name": "B", "layers": {
                "images": {"feature": ["any", ["==", ["tag", "fmt"], "jpeg"]]}}},
            "geometry": {"type": "Polygon", "coordinates": [POLY_B]},
        },
        {   # globally drop the phash tag (fixture filter 3 semantics —
            # wildcard layer, key-dependent tag expression)
            "type": "Feature",
            "properties": {"layers": {"*": {"tag": ["in", ["key"], ["literal", ["phash"]]]}}},
            "geometry": {"type": "Polygon",
                         "coordinates": [[[-180, -90], [-180, 90], [180, 90],
                                          [180, -90], [-180, -90]]]},
        },
    ],
}

N = 3000


def _tagged(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return vbool(v)
    if isinstance(v, (int, np.integer)):
        return vint(int(v))
    if isinstance(v, (float, np.floating)):
        return vfloat_from_f64(float(v))
    return vstr(str(v))


def oracle_rows(table: pa.Table, fc: CompiledFilterCollection, cfg: EngineConfig):
    """Row-wise reimplementation of transform.rs:140-171 over the batch."""
    lon = table["lon"].to_numpy()
    lat = table["lat"].to_numpy()
    keep, dropped_tags = [], []
    for r in range(len(table)):
        props = {}
        for c in cfg.tag_cols:
            v = table[c][r].as_py()
            t = _tagged(v)
            if t is not None:
                props[c] = t
        ctx = EvaluationContext("images", props, None, "Point")
        hit_filters = [
            f for f in fc.features
            if points_in_polygon(np.array([lon[r]]), np.array([lat[r]]), f.geometry)[0]
        ]
        if any(f.should_remove_feature(ctx) for f in hit_filters):
            keep.append(False)
            dropped_tags.append(set())
            continue
        keep.append(True)
        gone = set()
        for c in props:
            kctx = EvaluationContext("images", props, c, "Point")
            if any(f.should_remove_tag(kctx) for f in hit_filters):
                gone.add(c)
        dropped_tags.append(gone)
    return np.array(keep), dropped_tags


@pytest.fixture(scope="module")
def assigned_table():
    cfg = EngineConfig()
    t = synth_images_table(N)
    t = geotag_batch(t, cfg)
    t = tile_assign_batch(t, cfg)
    return t, cfg


def test_filter_join_matches_row_oracle(assigned_table):
    from mvt_wrangler_ray.stages.filter_join import FilterJoinStage

    t, cfg = assigned_table
    stage = FilterJoinStage(json.dumps(FILTERS), cfg)
    out = stage(t)

    fc = CompiledFilterCollection.from_geojson(FILTERS)
    keep, dropped = oracle_rows(t, fc, cfg)
    want_ids = set(np.asarray(t["image_id"])[keep].tolist())
    got_ids = set(out["image_id"].to_pylist())
    assert got_ids == want_ids

    # phash tag is gone everywhere (world mask)
    assert out["phash"].null_count == len(out)
    # captions untouched for surviving rows
    assert out["caption"].null_count == 0

    # the oracle agrees per-row on which tags were dropped
    id_to_dropped = {
        i: d for i, k, d in zip(t["image_id"].to_pylist(), keep, dropped) if k}
    for r in range(min(len(out), 200)):
        iid = out["image_id"][r].as_py()
        assert ("phash" in id_to_dropped[iid]) == (out["phash"][r].as_py() is None)


def test_masked_regions_enforced(assigned_table):
    from mvt_wrangler_ray.stages.filter_join import FilterJoinStage

    t, cfg = assigned_table
    out = FilterJoinStage(json.dumps(FILTERS), cfg)(t)
    fc = CompiledFilterCollection.from_geojson(FILTERS)
    lon = out["lon"].to_numpy()
    lat = out["lat"].to_numpy()
    in_a = points_in_polygon(lon, lat, fc.features[0].geometry)
    assert not in_a.any()  # nothing survives inside A
    in_b = points_in_polygon(lon, lat, fc.features[1].geometry)
    fmts = np.asarray(out["fmt"].to_pylist(), dtype=object)
    assert not (in_b & (fmts == "jpeg")).any()
    # outside all masks: untouched rows still present
    n_outside_in = 0
    t_lon, t_lat = t["lon"].to_numpy(), t["lat"].to_numpy()
    out_ids = set(out["image_id"].to_pylist())
    ta = points_in_polygon(t_lon, t_lat, fc.features[0].geometry)
    tb = points_in_polygon(t_lon, t_lat, fc.features[1].geometry)
    outside = ~ta & ~tb
    for iid in np.asarray(t["image_id"])[outside][:100]:
        assert iid in out_ids


def test_wrangle_counts_end_to_end(ray_session):
    import ray.data as rd

    from mvt_wrangler_ray.pipelines.wrangle import wrangle_counts

    cfg = EngineConfig()
    t = synth_images_table(2000)
    ds = rd.from_arrow(t)
    counts = wrangle_counts(ds, cfg, filter_geojson=json.dumps(FILTERS))
    pdf = counts.to_pandas()
    assert pdf["n_images"].sum() > 0
    assert pdf["tile_id"].is_unique
    # cross-check against a driver-side oracle
    tt = tile_assign_batch(geotag_batch(t, cfg), cfg)
    fc = CompiledFilterCollection.from_geojson(FILTERS)
    keep, _ = oracle_rows(tt, fc, cfg)
    import collections
    want = collections.Counter(np.asarray(tt["tile_id"])[keep].tolist())
    got = dict(zip(pdf["tile_id"], pdf["n_images"]))
    assert got == dict(want)


def test_wrangle_tiles_blob_roundtrip(ray_session):
    import ray.data as rd

    from mvt_wrangler_ray.pipelines.wrangle import wrangle_tiles

    cfg = EngineConfig(zoom=6)
    t = synth_images_table(500)
    tiles = wrangle_tiles(rd.from_arrow(t), cfg).to_pandas()
    assert (np.diff(tiles["tile_id"].to_numpy()) > 0).all()  # ascending order
    assert tiles["n_features"].sum() == 500                   # no filter → all survive
    m = decode_tile_blob(tiles["blob"].iloc[0])
    assert m["z"] == 6 and len(m["decoded"]) == tiles["n_features"].iloc[0]
    # canonical order within tile: ids ascending
    ids = [f["id"] for f in m["decoded"]]
    assert ids == sorted(ids)
    # tags round-trip with pools
    first = m["decoded"][0]["tags"]
    assert "caption" in first and "fmt" in first


def test_salted_tile_encode_matches_unsalted(ray_session):
    """Skew case: a hot tile with ~half the rows. The salted two-phase
    encode must produce identical tiles to the unsalted path."""
    import ray.data as rd

    from mvt_wrangler_ray.pipelines.wrangle import wrangle
    from mvt_wrangler_ray.stages.tile_encode import encode_tiles_salted

    cfg = EngineConfig(zoom=8, salt_buckets=8)
    t = synth_images_table(1200, hot_fraction=0.5)  # heavy skew
    rows = wrangle(rd.from_arrow(t), cfg)
    plain = rows.groupby("tile_id").map_groups(
        lambda g: __import__("mvt_wrangler_ray.stages.tile_encode",
                             fromlist=["encode_tile_group"]).encode_tile_group(g, cfg),
        batch_format="pandas").to_pandas().sort_values("tile_id").reset_index(drop=True)
    salted = encode_tiles_salted(rows, cfg).to_pandas().sort_values(
        "tile_id").reset_index(drop=True)
    assert len(plain) == len(salted)
    assert (plain["tile_id"] == salted["tile_id"]).all()
    assert (plain["n_features"] == salted["n_features"]).all()
    # decoded manifests identical (id order + tags)
    for i in range(len(plain)):
        a = decode_tile_blob(plain["blob"].iloc[i])
        b = decode_tile_blob(salted["blob"].iloc[i])
        assert a["decoded"] == b["decoded"], plain["tile_id"].iloc[i]
    # the hot tile really is hot
    assert plain["n_features"].max() > 400


def test_wrangle_to_pmtiles_archive(ray_session, tmp_path):
    """Image tiles written as a PMTiles archive: readable, ordered,
    manifests decode."""
    import ray.data as rd

    from mvt_wrangler_ray.pipelines.wrangle import wrangle_to_pmtiles
    from mvt_wrangler_ray.sources.pmtiles import PmTilesReader

    cfg = EngineConfig(zoom=7, name="image-tiles")
    t = synth_images_table(800)
    out = str(tmp_path / "images.pmtiles")
    s = wrangle_to_pmtiles(rd.from_arrow(t), out, cfg)
    r = PmTilesReader(out)
    assert r.header.addressed_tiles == s["tiles_written"]
    assert r.metadata()["name"] == "image-tiles"
    ents = list(r.entries())
    blob = r.get_tile_decompressed(ents[0])
    m = decode_tile_blob(gzip.compress(blob))  # decode handles raw too
    assert m["z"] == 7 and len(m["decoded"]) >= 1
    total = 0
    for e in ents:
        mm = decode_tile_blob(r.get_tile_decompressed(e))
        total += len(mm["decoded"]) * e.run_length
    assert total == 800
    r.close()


def test_filter_actor_pool_mode(ray_session):
    """mode='actors': FilterJoinStage actor pool produces identical
    results to the broadcast-task mode."""
    import ray.data as rd

    from mvt_wrangler_ray.pipelines.wrangle import assign_stage, filter_stage

    cfg = EngineConfig(zoom=9, filter_concurrency=(1, 2))
    t = synth_images_table(1200)
    base = assign_stage(rd.from_arrow(t), cfg)
    a = filter_stage(base, cfg, json.dumps(FILTERS), mode="actors").to_pandas()
    b = filter_stage(base, cfg, json.dumps(FILTERS), mode="tasks").to_pandas()
    assert sorted(a["image_id"]) == sorted(b["image_id"])
    assert a["phash"].isna().all() and b["phash"].isna().all()


def test_pyramid_wrangle(ray_session):
    """Pyramid assignment: each surviving image appears once per zoom."""
    import ray.data as rd

    from mvt_wrangler_ray.pipelines.wrangle import wrangle

    cfg = EngineConfig(zoom_range=(5, 7))
    t = synth_images_table(400)
    out = wrangle(rd.from_arrow(t), cfg, pyramid=True).to_pandas()
    assert len(out) == 400 * 3
    assert sorted(out["z"].unique()) == [5, 6, 7]
    per_img = out.groupby("image_id")["z"].nunique()
    assert (per_img == 3).all()
    # zoom hierarchy: the z6 tile is the parent of the z7 tile
    one = out[out["image_id"] == out["image_id"].iloc[0]].set_index("z")
    assert one.loc[6, "x"] == one.loc[7, "x"] // 2
    assert one.loc[6, "y"] == one.loc[7, "y"] // 2
