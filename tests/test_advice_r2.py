"""Regression tests for the round-1 ADVICE findings.

Each test reproduces the reported divergence and asserts the fixed
behavior (reference semantics: geo crate intersects, Rust f32 Display,
schema-stable bucketed join, range-validated lineage resume).
"""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from mvt_wrangler_ray.geo.geometry import (
    geoms_intersect,
    parse_geojson_geometry,
    rect_within_polygon,
)


def _poly(coords):
    return parse_geojson_geometry({"type": "Polygon", "coordinates": coords})


class TestContainmentPerPart:
    """ADVICE high: containment fallback must test a vertex of EACH part."""

    def test_multilinestring_second_part_inside(self):
        # mask covers only the area around the SECOND line part; no edge
        # crossings — the geo crate returns true (part fully inside)
        mask = _poly([[[10, 10], [20, 10], [20, 20], [10, 20], [10, 10]]])
        mls = parse_geojson_geometry({
            "type": "MultiLineString",
            "coordinates": [[[0, 0], [1, 1]], [[14, 14], [16, 16]]],
        })
        assert geoms_intersect(mls, mask)
        assert geoms_intersect(mask, mls)

    def test_multipolygon_second_part_inside(self):
        mask = _poly([[[10, 10], [20, 10], [20, 20], [10, 20], [10, 10]]])
        mp = parse_geojson_geometry({
            "type": "MultiPolygon",
            "coordinates": [
                [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
                [[[14, 14], [16, 14], [16, 16], [14, 16], [14, 14]]],
            ],
        })
        assert geoms_intersect(mp, mask)
        assert geoms_intersect(mask, mp)

    def test_part_inside_hole_still_disjoint(self):
        # second part sits inside the mask's HOLE → no intersection
        mask = _poly([
            [[10, 10], [20, 10], [20, 20], [10, 20], [10, 10]],
            [[13, 13], [17, 13], [17, 17], [13, 17], [13, 13]],
        ])
        mls = parse_geojson_geometry({
            "type": "MultiLineString",
            "coordinates": [[[0, 0], [1, 1]], [[14, 14], [16, 16]]],
        })
        assert not geoms_intersect(mls, mask)


class TestRectWithinPolygonHoles:
    """ADVICE medium: a hole strictly inside the rect defeats coverage."""

    def test_hole_inside_rect(self):
        poly = _poly([
            [[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]],
            [[40, 40], [60, 40], [60, 60], [40, 60], [40, 40]],
        ])
        assert not rect_within_polygon(30, 30, 70, 70, poly)

    def test_solid_polygon_still_covers(self):
        poly = _poly([[[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]]])
        assert rect_within_polygon(30, 30, 70, 70, poly)

    def test_hole_outside_rect_still_covers(self):
        poly = _poly([
            [[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]],
            [[1, 1], [5, 1], [5, 5], [1, 5], [1, 1]],
        ])
        assert rect_within_polygon(30, 30, 70, 70, poly)


class TestFloat32Provenance:
    """ADVICE medium: mvt float (Value field 2) keeps f32 Display form."""

    def test_decode_preserves_f32(self):
        import struct

        from mvt_wrangler_ray.sources import mvt

        buf = bytes([0x15]) + struct.pack("<f", 0.1)  # field 2, wire 5
        v = mvt.decode_value(buf)
        assert isinstance(v, np.float32)
        # bit-exact round trip through encode_value (stays field 2)
        assert mvt.encode_value(v) == buf

    def test_display_is_f32_shortest(self):
        from mvt_wrangler_ray.expr.values import fmt_float32_rust

        assert fmt_float32_rust(np.float32(0.1)) == "0.1"
        assert fmt_float32_rust(np.float32(5.0)) == "5"
        assert fmt_float32_rust(np.float32(-0.0)) == "-0"
        assert fmt_float32_rust(np.float32("nan")) == "NaN"

    def test_expression_eq_on_f32_tag(self):
        from mvt_wrangler_ray.expr.compiler import compile_expression
        from mvt_wrangler_ray.expr.rowexec import EvaluationContext, evaluate_bool
        from mvt_wrangler_ray.pipelines.archive import _mvt_value_to_expr

        props = {"x": _mvt_value_to_expr(np.float32(0.1))}
        ctx = EvaluationContext("l", props, None, "Point")
        expr = compile_expression(["==", ["tag", "x"], 0.1])
        assert evaluate_bool(expr, ctx)

    def test_tag_value_struct_roundtrips_f32_string(self):
        from mvt_wrangler_ray.expr.values import fmt_float_rust
        from mvt_wrangler_ray.pipelines.features import tag_value

        tv = tag_value(np.float32(0.1))
        assert fmt_float_rust(tv["f"]) == "0.1"


@pytest.mark.usefixtures("ray_session")
class TestBucketedJoinSchema:
    """ADVICE low: all-null-within-bucket column must survive the join."""

    def test_all_null_column_kept(self):
        import ray

        from mvt_wrangler_ray.stages.shuffle import bucketed_hash_join

        n = 200
        left = ray.data.from_arrow(pa.table({
            "k": pa.array(range(n), pa.int64()),
            "lv": pa.array([f"L{i}" for i in range(n)]),
        }))
        # rcol is null for even keys — some buckets will see only nulls
        right = ray.data.from_arrow(pa.table({
            "rk": pa.array(range(n), pa.int64()),
            "rcol": pa.array([None if i % 2 == 0 else f"R{i}"
                              for i in range(n)]),
        }))
        out = bucketed_hash_join(left, right, "k", "rk",
                                 num_buckets=16).to_pandas()
        assert len(out) == n
        assert set(out.columns) >= {"k", "lv", "rcol"}
        assert out["rcol"].notna().sum() == n // 2


class TestResumePlanValidation:
    """ADVICE low: a marker is trusted only if its range matches the plan."""

    def test_changed_partitioning_recomputes(self, tmp_path):
        from mvt_wrangler_ray.state.lineage import (
            LineageWriter,
            partition_bounds,
            resume_plan,
        )

        out = str(tmp_path / "out")
        w = LineageWriter(out, key="k")
        b4 = partition_bounds(0, 99, 4)
        t = pa.table({"k": pa.array([1, 2], pa.int64())})
        for pid, (lo, hi) in enumerate(b4):
            w.write_partition(pid, lo, hi, t)
        # same plan → nothing to do
        assert resume_plan(out, b4, key="k") == []
        # different partition count → every mismatched range recomputes
        b8 = partition_bounds(0, 99, 8)
        with pytest.warns(UserWarning):
            todo = resume_plan(out, b8, key="k")
        assert [pid for pid, _, _ in todo] == list(range(8))

    def test_corrupt_record_recomputes(self, tmp_path):
        from mvt_wrangler_ray.state.lineage import (
            LineageWriter,
            partition_bounds,
            resume_plan,
        )

        out = str(tmp_path / "out")
        w = LineageWriter(out, key="k")
        bounds = partition_bounds(0, 99, 2)
        t = pa.table({"k": pa.array([1], pa.int64())})
        for pid, (lo, hi) in enumerate(bounds):
            w.write_partition(pid, lo, hi, t)
        with open(w._lineage_path(0), "w") as f:
            f.write("{not json")
        with pytest.warns(UserWarning):
            todo = resume_plan(out, bounds, key="k")
        assert [pid for pid, _, _ in todo] == [0]


class TestCodeReviewR2Fixes:
    """Round-2 self-review findings (latent bugs fixed before they bite)."""

    def test_fingerprint_null_text_is_zero(self):
        from mvt_wrangler_ray.stages.text import fingerprint_batch

        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["hello", None], pa.string())})
        out = fingerprint_batch(t)
        assert out["fingerprint"][1].as_py() == 0
        assert out["fingerprint"][0].as_py() != 0

    def test_nearest_site_tie_break_consistent_across_paths(self):
        from mvt_wrangler_ray.stages.geospatial import nearest_site_batch

        # sites passed UNSORTED with two co-located: lowest ID must win
        # on both the brute (m<=thresh) and kd (m>thresh) paths
        m = 600
        rng = np.random.default_rng(1)
        slon = rng.uniform(-10, 10, m)
        slat = rng.uniform(-10, 10, m)
        slon[0] = slon[1] = 5.0
        slat[0] = slat[1] = 5.0
        ids = np.arange(m, dtype=np.int64)[::-1].copy()  # descending ids
        batch = pa.table({"lon": pa.array([5.0]), "lat": pa.array([5.0])})
        kd = nearest_site_batch(batch, slon, slat, ids)
        brute = nearest_site_batch(batch, slon, slat, ids,
                                   kdtree_threshold=10**9)
        want = min(ids[0], ids[1])
        assert kd["nearest_site"][0].as_py() == want
        assert brute["nearest_site"][0].as_py() == want

    def test_resume_plan_nondict_json_recomputes(self, tmp_path):
        from mvt_wrangler_ray.state.lineage import (
            LineageWriter,
            partition_bounds,
            resume_plan,
        )

        out = str(tmp_path / "out")
        w = LineageWriter(out, key="k")
        bounds = partition_bounds(0, 9, 1)
        w.write_partition(0, *bounds[0], pa.table({"k": pa.array([1], pa.int64())}))
        with open(w._lineage_path(0), "w") as f:
            f.write("null")  # valid JSON, wrong shape
        with pytest.warns(UserWarning):
            todo = resume_plan(out, bounds, key="k")
        assert [p for p, _, _ in todo] == [0]
