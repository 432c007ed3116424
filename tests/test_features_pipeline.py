"""Features-table transform: the reference's full transform_tile
semantics (map tags, per-layer extent, current_key tag filtering).

Golden properties mirror /root/reference/tests/integration_test.rs:63-137
+ tests/fixtures/filter.geojson, re-anchored to the synthetic extract:
  (a) every pois feature inside polygon A is dropped;
  (b) every buildings feature with kind=building inside polygon B is
      dropped;
  (c) NO surviving feature anywhere carries a ``name:fr`` (or any
      ``name:<lang>`` with lang ∉ {"", ja, en, 2}) or ``pgf:name:*`` tag;
  (d) features outside the masks keep all other tags untouched.
"""

import numpy as np
import pyarrow as pa
import pytest

from mvt_wrangler_ray.filters import CompiledFilterCollection
from mvt_wrangler_ray.geo.geometry import points_in_polygon
from mvt_wrangler_ray.pipelines.features import transform_features_batch, _MapTags
from mvt_wrangler_ray.sources.features import synth_features_table

from mvt_wrangler_ray.fixtures import FEATURE_FILTERS as FILTERS


@pytest.fixture(scope="module")
def transformed():
    t = synth_features_table(4000)
    fc = CompiledFilterCollection.from_geojson(FILTERS)
    out = transform_features_batch(t, fc)
    return t, fc, out


def _decoded_tags(table: pa.Table):
    tags = _MapTags(table["tags"], len(table))
    per_row = [dict() for _ in range(len(table))]
    for e in range(len(tags.keys)):
        r = tags.row_of_entry[e]
        per_row[r][tags.keys[e]] = int(tags.vtype[e])
    return per_row


def test_pois_dropped_inside_a(transformed):
    t, fc, out = transformed
    lon = out["lon"].to_numpy()
    lat = out["lat"].to_numpy()
    layer = np.asarray(out["layer"].to_pandas(), dtype=object)
    in_a = points_in_polygon(lon, lat, fc.features[0].geometry)
    assert not (in_a & (layer == "pois")).any()
    # and some pois existed inside A in the input
    tl = np.asarray(t["layer"].to_pandas(), dtype=object)
    ta = points_in_polygon(t["lon"].to_numpy(), t["lat"].to_numpy(),
                           fc.features[0].geometry)
    assert (ta & (tl == "pois")).any()


def test_buildings_kind_dropped_inside_b(transformed):
    t, fc, out = transformed
    lon = out["lon"].to_numpy()
    lat = out["lat"].to_numpy()
    layer = np.asarray(out["layer"].to_pandas(), dtype=object)
    in_b = points_in_polygon(lon, lat, fc.features[1].geometry)
    kinds = []
    tags = _MapTags(out["tags"], len(out))
    per_row = [None] * len(out)
    for e in range(len(tags.keys)):
        if tags.keys[e] == "kind":
            per_row[tags.row_of_entry[e]] = tags.vs[e]
    kinds = np.array([x if x is not None else "" for x in per_row], dtype=object)
    assert not (in_b & (layer == "buildings") & (kinds == "building")).any()
    # non-building buildings inside B survive
    assert (in_b & (layer == "buildings")).any()


def test_no_name_fr_survives(transformed):
    _, _, out = transformed
    for row in _decoded_tags(out):
        for k in row:
            assert not k.startswith("pgf:name:"), k
            if k.startswith("name:"):
                assert k.split(":", 1)[1] in ("", "ja", "en", "2"), k


def test_outside_masks_untouched(transformed):
    t, fc, out = transformed
    # rows outside A and B keep every non-name-filtered tag
    tin = {i: r for i, r in enumerate(_decoded_tags(t))}
    out_ids = {out["feature_id"][i].as_py(): i for i in range(len(out))}
    out_tags = _decoded_tags(out)
    lon, lat = t["lon"].to_numpy(), t["lat"].to_numpy()
    in_a = points_in_polygon(lon, lat, fc.features[0].geometry)
    in_b = points_in_polygon(lon, lat, fc.features[1].geometry)
    checked = 0
    for i in range(len(t)):
        if in_a[i] or in_b[i]:
            continue
        fid = t["feature_id"][i].as_py()
        assert fid in out_ids  # survived
        want = {k: v for k, v in tin[i].items()
                if not k.startswith("pgf:name:")
                and not (k.startswith("name:")
                         and k.split(":", 1)[1] not in ("", "ja", "en", "2"))}
        assert out_tags[out_ids[fid]] == want
        checked += 1
        if checked > 300:
            break
    assert checked > 50


def test_extent_column_respected(transformed):
    t, fc, out = transformed
    # buildings rows carry extent 8192 (exercises per-layer reprojection)
    layer = np.asarray(t["layer"].to_pandas(), dtype=object)
    ext = t["extent"].to_numpy()
    assert (ext[layer == "buildings"] == 8192).all()
    assert (ext[layer != "buildings"] == 4096).all()


def test_transform_features_dataset(ray_session):
    import ray.data as rd

    from mvt_wrangler_ray.pipelines.features import transform_features

    t = synth_features_table(2000)
    out = transform_features(rd.from_arrow(t), FILTERS).to_pandas()
    fc = CompiledFilterCollection.from_geojson(FILTERS)
    want = transform_features_batch(t, fc)
    assert len(out) == len(want)
    assert set(out["feature_id"]) == set(want["feature_id"].to_pylist())


def test_duplicate_tag_keys_last_wins():
    """MVT allows duplicate key indices; the reference's HashMap insert
    makes the LAST value win (transform.rs:118-128). _MapTags.lookup must
    agree."""
    import pyarrow as pa

    from mvt_wrangler_ray.pipelines.features import TAGS_TYPE, _MapTags, tag_value

    rows = [[("k", tag_value("first")), ("k", tag_value("second")),
             ("other", tag_value(1))]]
    col = pa.array(rows, TAGS_TYPE)
    tags = _MapTags(col, 1)
    vb = tags.lookup("k")
    from mvt_wrangler_ray.expr.values import vstr
    assert vb.row_value(0) == vstr("second")   # last wins
    assert tags.has_key("k")[0]


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_transform_matches_row_oracle_random(seed):
    """Randomized micro-fixtures: the vectorized features transform must
    agree row-for-row (survival + surviving tag keys) with a direct
    per-row evaluation of the compiled filter semantics."""
    import numpy as np

    from mvt_wrangler_ray.expr.rowexec import EvaluationContext
    from mvt_wrangler_ray.expr.values import vbool, vfloat_from_f64, vint, vstr
    from mvt_wrangler_ray.pipelines.features import TAGS_TYPE, tag_value

    rng = np.random.default_rng(seed)
    n = 300
    layers = ["pois", "buildings", "roads"]
    keys_pool = ["name", "name:fr", "name:ja", "kind", "area", "public", "cap"]
    rows = []
    import pyarrow as pa

    from mvt_wrangler_ray.sources.features import BOUNDS
    w, s, e, nn = BOUNDS
    lon = rng.uniform(w, e, n)
    lat = rng.uniform(s, nn, n)
    from mvt_wrangler_ray.geo.tilemath import assign_tile, tile_id
    z = np.full(n, 10)
    x, y = assign_tile(lon, lat, 10)
    tags_rows = []
    for i in range(n):
        t = []
        for k in keys_pool:
            if rng.random() < 0.6:
                r = rng.random()
                if r < 0.4:
                    v = f"v{int(rng.integers(0, 4))}"
                elif r < 0.6:
                    v = float(rng.integers(0, 100)) / 7.0
                elif r < 0.8:
                    v = int(rng.integers(-50, 50))
                else:
                    v = bool(rng.integers(0, 2))
                t.append((k, tag_value(v)))
        tags_rows.append(t)
    table = pa.table({
        "feature_id": pa.array([f"f{i}" for i in range(n)], pa.string()),
        "z": pa.array(z.astype(np.int8), pa.int8()),
        "x": pa.array(x.astype(np.int32), pa.int32()),
        "y": pa.array(y.astype(np.int32), pa.int32()),
        "tile_id": pa.array(tile_id(10, x, y), pa.int64()),
        "layer": pa.array([layers[i % 3] for i in range(n)], pa.string()),
        "extent": pa.array(np.full(n, 4096, np.int32), pa.int32()),
        "geom_type": pa.array(["Point"] * n, pa.string()),
        "lon": pa.array(lon, pa.float64()),
        "lat": pa.array(lat, pa.float64()),
        "tags": pa.array(tags_rows, TAGS_TYPE),
    })
    # random mask inside the bounds + the global language filter
    mw = rng.uniform(w, (w + e) / 2)
    ms = rng.uniform(s, (s + nn) / 2)
    me = rng.uniform(mw + 0.02, e)
    mn = rng.uniform(ms + 0.02, nn)
    filters = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature",
             "properties": {"layers": {
                 "pois": {"feature": ["any", ["==", ["tag", "kind"], "v1"],
                                      [">", ["tag", "area"], 5]]},
                 "*": {"tag": ["starts-with", ["key"], "name:"]}}},
             "geometry": {"type": "Polygon", "coordinates": [[
                 [mw, ms], [me, ms], [me, mn], [mw, mn], [mw, ms]]]}},
        ],
    }
    fc = CompiledFilterCollection.from_geojson(filters)
    out = transform_features_batch(table, fc)

    # row oracle
    def to_val(tv):
        t = tv["type"]
        if t == 0:
            return None
        if t == 1:
            return vbool(tv["b"])
        if t == 2:
            return vint(tv["i"])
        if t == 3:
            return vfloat_from_f64(tv["f"])
        return vstr(tv["s"])

    got = {out["feature_id"][i].as_py():
           {k for k, v in out["tags"][i].as_py()} for i in range(len(out))}
    n_checked = 0
    for i in range(n):
        inside = points_in_polygon(np.array([lon[i]]), np.array([lat[i]]),
                                   fc.features[0].geometry)[0]
        tags = {k: to_val(v) for k, v in table["tags"][i].as_py()}
        lname = table["layer"][i].as_py()
        fid = table["feature_id"][i].as_py()
        ctx = EvaluationContext(lname, tags, None, "Point")
        if inside and fc.features[0].should_remove_feature(ctx):
            assert fid not in got, fid
            continue
        assert fid in got, fid
        want_keys = set()
        for k in tags:
            kctx = EvaluationContext(lname, tags, k, "Point")
            if inside and fc.features[0].should_remove_tag(kctx):
                continue
            want_keys.add(k)
        assert got[fid] == want_keys, (fid, got[fid], want_keys)
        n_checked += 1
    assert n_checked > 100
