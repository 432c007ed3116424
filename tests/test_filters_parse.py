"""Filter collection parsing/structure tests — ports of the reference's
data.rs unit tests (/root/reference/src/filtering/data.rs:311-481)."""

import json

import pytest

from mvt_wrangler_ray.expr import ExpressionCompileError
from mvt_wrangler_ray.filters import CompiledFilterCollection


def test_parse_basic_filter():
    """data.rs:318-359 — wildcard layer with in-expression."""
    fc = CompiledFilterCollection.from_geojson(json.dumps({
        "type": "FeatureCollection",
        "features": [{
            "type": "Feature",
            "geometry": {"type": "Polygon", "coordinates": [
                [[-180, -90], [-180, 90], [180, 90], [180, -90], [-180, -90]]]},
            "properties": {
                "id": "global-park-school",
                "description": "Remove park/school features worldwide",
                "layers": {"*": {"feature": [
                    "in", ["tag", "kind"], ["literal", ["park", "school"]]]}},
            },
        }],
    }))
    assert len(fc.features) == 1
    assert fc.features[0].name == "global-park-school"
    assert "*" in fc.features[0].layers
    assert fc.features[0].layers["*"].feature is not None
    assert fc.features[0].layers["*"].tag is None


def test_layer_filter_with_both_feature_and_tag():
    """data.rs:371-401."""
    fc = CompiledFilterCollection.from_geojson({
        "type": "FeatureCollection",
        "features": [{
            "type": "Feature",
            "geometry": {"type": "Point", "coordinates": [0, 0]},
            "properties": {"layers": {"buildings": {
                "feature": ["==", ["tag", "demolished"], True],
                "tag": ["starts-with", ["key"], "temp:"],
            }}},
        }],
    })
    lf = fc.features[0].layers["buildings"]
    assert lf.feature is not None and lf.tag is not None


def test_complex_expressions_parse():
    """data.rs:404-443."""
    fc = CompiledFilterCollection.from_geojson({
        "type": "FeatureCollection",
        "features": [{
            "type": "Feature",
            "geometry": {"type": "Polygon",
                         "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]},
            "properties": {"layers": {"*": {
                "feature": ["any", ["==", ["type"], "Point"],
                            ["==", ["type"], "LineString"]],
                "tag": ["regex-capture", ["key"], "^name:?(.*)$", 1],
            }}},
        }],
    })
    lf = fc.features[0].layers["*"]
    assert lf.feature is not None and lf.tag is not None


def test_invalid_expression_fails_at_compile():
    """Compile errors surface at filter-load time, never mid-stream
    (lib.rs:57-59 / SURVEY §2.8)."""
    with pytest.raises(ExpressionCompileError):
        CompiledFilterCollection.from_geojson({
            "type": "FeatureCollection",
            "features": [{
                "type": "Feature",
                "geometry": {"type": "Point", "coordinates": [0, 0]},
                "properties": {"layers": {"*": {"feature": ["bogus-op", 1]}}},
            }],
        })
    with pytest.raises(ExpressionCompileError):
        CompiledFilterCollection.from_geojson({
            "type": "FeatureCollection",
            "features": [{
                "type": "Feature",
                "geometry": {"type": "Point", "coordinates": [0, 0]},
                "properties": {"layers": {"*": {
                    "feature": ["regex-match", ["key"], "["]}}},
            }],
        })


def test_non_feature_collection_rejected():
    with pytest.raises(ValueError):
        CompiledFilterCollection.from_geojson({"type": "Feature"})


def test_layer_selector_fallback_per_expression():
    """The '&&-let' fallback of data.rs:272-287: an exact-layer entry
    WITHOUT the requested expression falls through to the wildcard."""
    from mvt_wrangler_ray.expr.rowexec import EvaluationContext
    from mvt_wrangler_ray.expr.values import vstr

    fc = CompiledFilterCollection.from_geojson({
        "type": "FeatureCollection",
        "features": [{
            "type": "Feature",
            "geometry": {"type": "Polygon",
                         "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]},
            "properties": {"layers": {
                "pois": {"tag": ["boolean", False]},           # no feature expr
                "*": {"feature": ["boolean", True]},           # wildcard drops
            }},
        }],
    })
    f = fc.features[0]
    ctx = EvaluationContext("pois", {"kind": vstr("park")})
    # exact layer has no feature expr → wildcard's applies → drop
    assert f.should_remove_feature(ctx) is True
    # exact layer HAS a tag expr (false) → wildcard must NOT apply
    assert f.should_remove_tag(ctx.with_current_key("kind")) is False
