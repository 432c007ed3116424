"""End-to-end PMTiles archive rewrite on the REFERENCE's real fixture
archive (/root/reference/tests/fixtures/input.pmtiles — used as input
DATA only). Mirrors the reference integration test
(tests/integration_test.rs:63-137): run the full pipeline with a filter
collection of the same shape, then verify golden properties by decoding
the output tiles."""

import gzip
import os

import numpy as np
import pytest

from mvt_wrangler_ray.config import EngineConfig
from mvt_wrangler_ray.sources import mvt
from mvt_wrangler_ray.sources.pmtiles import PmTilesReader

FIXTURE = "/root/reference/tests/fixtures/input.pmtiles"
OUT = "/tmp/mwr_out.pmtiles"
OUT_ID = "/tmp/mwr_identity.pmtiles"

# Anbo-area polygon (own coordinates, same semantics as the reference
# fixture's filter 1) + the global name:* language filter (filter 3 shape)
ANBO = [[130.63, 30.29], [130.67, 30.29], [130.67, 30.34], [130.63, 30.34],
        [130.63, 30.29]]
FILTERS = {
    "type": "FeatureCollection",
    "features": [
        {"type": "Feature",
         "properties": {"name": "anbo", "layers": {"pois": {"feature": ["boolean", True]}}},
         "geometry": {"type": "Polygon", "coordinates": [ANBO]}},
        {"type": "Feature",
         "properties": {"layers": {"*": {"tag": [
             "any",
             ["starts-with", ["key"], "pgf:name:"],
             ["all",
              ["starts-with", ["key"], "name"],
              ["not", ["in", ["regex-capture", ["key"], "^name:?(.*)$", 1],
                       ["literal", ["", "ja", "en", "2"]]]]]]}}},
         "geometry": {"type": "Polygon",
                      "coordinates": [[[-180, -90], [-180, 90], [180, 90],
                                       [180, -90], [-180, -90]]]}},
    ],
}


def _decode_all(path):
    r = PmTilesReader(path)
    out = {}
    for e in r.entries():
        blob = r.get_tile_decompressed(e)
        for k in range(e.run_length):
            out[e.tile_id + k] = mvt.decode_tile(blob)
    r.close()
    return out


def _tags_of(layer, feat):
    t = feat["tags"]
    return {layer["keys"][t[i]]: layer["values"][t[i + 1]]
            for i in range(0, len(t) - 1, 2)}


@pytest.fixture(scope="module")
def wrangled(ray_session):
    from mvt_wrangler_ray.pipelines.archive import wrangle_pmtiles
    for p in (OUT,):
        if os.path.exists(p):
            os.remove(p)
    cfg = EngineConfig(name="wrangled", description="test run",
                       attribution="mvt_wrangler_ray")
    summary = wrangle_pmtiles(FIXTURE, OUT, FILTERS, cfg)
    return summary


def test_output_structure(wrangled):
    assert wrangled["tiles_written"] == 1446
    r = PmTilesReader(OUT)
    assert r.header.addressed_tiles == 1446
    assert r.header.min_zoom == 9 and r.header.max_zoom == 15
    assert r.header.tile_compression == 2
    tids = r.tile_ids()
    assert tids == sorted(tids) and len(tids) == 1446
    m = r.metadata()
    assert m["name"] == "wrangled"
    assert m["description"] == "test run"
    assert m["attribution"] == "mvt_wrangler_ray"
    # untouched input metadata keys survive (metadata.rs merge semantics)
    assert "planetiler:buildtime" in m
    r.close()


def test_no_filtered_name_tags_survive(wrangled):
    tiles = _decode_all(OUT)
    seen_name_keys = set()
    for t in tiles.values():
        for layer in t["layers"]:
            for feat in layer["features"]:
                for k in _tags_of(layer, feat):
                    if k.startswith("name") or k.startswith("pgf:name:"):
                        seen_name_keys.add(k)
    assert seen_name_keys, "fixture should have name tags at all"
    for k in seen_name_keys:
        assert not k.startswith("pgf:name:"), k
        if k.startswith("name:"):
            assert k.split(":", 1)[1] in ("", "ja", "en", "2"), k
    # input DID contain dropped keys (e.g. name:fr)
    in_tiles = _decode_all(FIXTURE)
    in_keys = set()
    for t in in_tiles.values():
        for layer in t["layers"]:
            for feat in layer["features"]:
                in_keys.update(_tags_of(layer, feat))
    assert any(k.startswith("name:") and k.split(":", 1)[1] not in
               ("", "ja", "en", "2") for k in in_keys)


def test_pois_dropped_inside_mask(wrangled):
    from mvt_wrangler_ray.filters import CompiledFilterCollection
    from mvt_wrangler_ray.geo.tilemath import tile_bounds, tile_id_to_zxy

    fc = CompiledFilterCollection.from_geojson(FILTERS)
    in_tiles = _decode_all(FIXTURE)
    out_tiles = _decode_all(OUT)
    dropped_somewhere = False
    for tid, t_in in in_tiles.items():
        z, x, y = tile_id_to_zxy(np.array([tid]))
        # tiles fully inside the Anbo mask: all pois must be gone
        w, s, e, n = tile_bounds(int(z[0]), np.array([int(x[0])]), np.array([int(y[0])]))
        minx, miny, maxx, maxy = fc.features[0].geometry.bbox
        fully_inside = (w[0] >= minx and e[0] <= maxx and s[0] >= miny and n[0] <= maxy)
        if not fully_inside:
            continue
        pois_in = sum(len(l["features"]) for l in t_in["layers"] if l["name"] == "pois")
        pois_out = sum(len(l["features"]) for l in out_tiles[tid]["layers"]
                       if l["name"] == "pois")
        if pois_in:
            dropped_somewhere = True
            assert pois_out == 0, (tid, pois_in, pois_out)
        # other layers keep their feature counts
        for lin in t_in["layers"]:
            if lin["name"] == "pois":
                continue
            lout = [l for l in out_tiles[tid]["layers"] if l["name"] == lin["name"]]
            assert lout and len(lout[0]["features"]) == len(lin["features"])
    assert dropped_somewhere


def test_identity_pass_roundtrip(ray_session):
    """No-filter normalization pass (lib.rs §3.2): every feature and tag
    set survives; geometry bytes round-trip through decode/encode."""
    from mvt_wrangler_ray.pipelines.archive import wrangle_pmtiles

    if os.path.exists(OUT_ID):
        os.remove(OUT_ID)
    summary = wrangle_pmtiles(FIXTURE, OUT_ID, None, EngineConfig())
    assert summary["tiles_written"] == 1446
    in_tiles = _decode_all(FIXTURE)
    out_tiles = _decode_all(OUT_ID)
    assert set(in_tiles) == set(out_tiles)
    checked = 0
    for tid in list(in_tiles)[:120]:
        t_in, t_out = in_tiles[tid], out_tiles[tid]
        assert [l["name"] for l in t_in["layers"]] == [l["name"] for l in t_out["layers"]]
        for lin, lout in zip(t_in["layers"], t_out["layers"]):
            assert lin["extent"] == lout["extent"]
            assert len(lin["features"]) == len(lout["features"])
            for fi, fo in zip(lin["features"], lout["features"]):
                assert _tags_of(lin, fi) == _tags_of(lout, fo)
                assert fi["geometry"] == fo["geometry"]
                assert fi["type"] == fo["type"]
                checked += 1
    assert checked > 500


def test_read_pmtiles_features_flatten(ray_session):
    """M2 explode mapping: archive → feature-level Dataset, row counts
    match the per-tile feature totals."""
    from mvt_wrangler_ray.pipelines.archive import read_pmtiles_features

    ds = read_pmtiles_features(FIXTURE)
    df = ds.to_pandas()
    in_tiles = _decode_all(FIXTURE)
    want = sum(len(l["features"]) for t in in_tiles.values() for l in t["layers"])
    assert len(df) == want
    observed = set(df["layer"].unique())
    assert observed <= {"boundaries", "buildings", "earth", "landcover",
                        "landuse", "places", "pois", "roads", "water"}
    assert len(observed) >= 7  # fixture tiles carry most (not all) layers
    assert df["geom_type"].isin(["Point", "LineString", "Polygon", "Unknown"]).all()
    # spot-check a tags map round-trip
    row = df[df["layer"] == "places"].iloc[0]
    keys = [k for k, v in row["tags"]]
    assert any(k == "name" or k.startswith("name") for k in keys)


def test_cli_end_to_end(ray_session, tmp_path):
    """python -m mvt_wrangler_ray parity: runs in-process (Ray already
    initialized by the session fixture; the CLI guards its init)."""
    import json as _json

    from mvt_wrangler_ray.__main__ import main

    fpath = tmp_path / "filter.geojson"
    fpath.write_text(_json.dumps(FILTERS))
    out = tmp_path / "cli_out.pmtiles"
    rc = main([FIXTURE, str(out), "--filter", str(fpath), "--name", "cli-run"])
    assert rc == 0
    r = PmTilesReader(str(out))
    assert r.header.addressed_tiles == 1446
    assert r.metadata()["name"] == "cli-run"
    r.close()


def test_filtered_tiles_match_independent_recomputation(wrangled):
    """Cross-check the optimized _transform_tile (bulk paths, coverage
    detection, key-only caches) against a direct, unoptimized per-feature
    re-derivation of the semantics on a sample of real fixture tiles."""
    import numpy as np

    from mvt_wrangler_ray.expr.rowexec import EvaluationContext
    from mvt_wrangler_ray.filters import CompiledFilterCollection
    from mvt_wrangler_ray.geo.geometry import geoms_intersect, transform_geom
    from mvt_wrangler_ray.geo.tilemath import (
        bbox_intersects_tile,
        lonlat_to_tile_frac,
        tile_bounds,
        tile_id_to_zxy,
    )
    from mvt_wrangler_ray.pipelines.archive import (
        _mvt_value_to_expr,
        _paths_to_geom,
    )
    from mvt_wrangler_ray.sources import mvt as mvtc

    fc = CompiledFilterCollection.from_geojson(FILTERS)
    in_tiles = _decode_all(FIXTURE)
    out_tiles = _decode_all(OUT)
    rng = np.random.default_rng(77)
    sample = rng.choice(sorted(in_tiles), 40, replace=False)
    checked_feats = 0
    for tid in sample:
        z, x, y = (int(v[0]) for v in tile_id_to_zxy(np.array([int(tid)])))
        # tile-level candidates, slow path: exact geoms_intersect of the
        # WGS84 envelope polygon against every mask
        w, s, e, n = tile_bounds(z, np.array([x]), np.array([y]))
        from mvt_wrangler_ray.geo.geometry import parse_geojson_geometry
        env = parse_geojson_geometry({"type": "Polygon", "coordinates": [[
            [w[0], n[0]], [e[0], n[0]], [e[0], s[0]], [w[0], s[0]], [w[0], n[0]]]]})
        cands = [f for f in fc.features if geoms_intersect(f.geometry, env)]
        for lin, lout_named in zip(in_tiles[tid]["layers"],
                                   [None] * 0 or [None]):
            break
        out_layers = {l["name"]: l for l in out_tiles[tid]["layers"]}
        for lin in in_tiles[tid]["layers"]:
            extent = lin.get("extent", 4096)
            masks = []
            for f in cands:
                def proj(a, _z=z, _x=x, _y=y, _e=extent):
                    fx, fy = lonlat_to_tile_frac(a[:, 0], a[:, 1], _z)
                    return np.stack([(fx - _x) * _e, (fy - _y) * _e], axis=1)
                g = transform_geom(f.geometry, proj)
                bb = g.bbox
                if bbox_intersects_tile(np.array([bb[0]]), np.array([bb[1]]),
                                        np.array([bb[2]]), np.array([bb[3]]),
                                        extent)[0]:
                    masks.append((f, g))
            want_feats = []
            for feat in lin["features"]:
                tags = _tags_of(lin, feat)
                geom = _paths_to_geom(mvtc.decode_geometry(feat["geometry"]),
                                      feat["type"])
                gclass = geom.geom_class if feat["type"] != 0 else "Unknown"
                hits = [f for f, g in masks if geoms_intersect(geom, g)]
                props = {k: _mvt_value_to_expr(v) for k, v in tags.items()}
                ctx = EvaluationContext(lin["name"], props, None, gclass)
                if any(f.should_remove_feature(ctx) for f in hits):
                    continue
                keep_tags = {}
                for k, v in tags.items():
                    kctx = EvaluationContext(lin["name"], props, k, gclass)
                    if any(f.should_remove_tag(kctx) for f in hits):
                        continue
                    keep_tags[k] = v
                want_feats.append((feat["geometry"], keep_tags))
            got_layer = out_layers.get(lin["name"])
            got_feats = ([(f["geometry"], _tags_of(got_layer, f))
                          for f in got_layer["features"]] if got_layer else [])
            assert len(got_feats) == len(want_feats), (tid, lin["name"])
            for (ggeom, gtags), (wgeom, wtags) in zip(got_feats, want_feats):
                assert ggeom == wgeom
                assert gtags == wtags
                checked_feats += 1
    assert checked_feats > 150
