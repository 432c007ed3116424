"""Expression dialect unit tests.

Ports every reference unit test 1:1:
  - /root/reference/src/filtering/executor.rs:244-546
  - /root/reference/src/filtering/expression_compiler.rs:353-435
  - /root/reference/src/filtering/data.rs:361-368 (operator tokens)
plus float-as-string caveats (SURVEY.md §2.4) and a hypothesis
property test: vectorized evaluator ≡ row oracle.
"""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mvt_wrangler_ray.expr import (
    ColumnTagContext,
    EvaluationContext,
    ExpressionCompileError,
    compile_expression,
    evaluate,
    evaluate_bool,
    evaluate_vector,
    to_bool,
    vbool,
    vfloat_from_f64,
    vint,
    vnull,
    vstr,
)
from mvt_wrangler_ray.expr.values import (
    V_STR,
    compare_values,
    display,
    fmt_float_rust,
    fmt_float_serde,
)


def ctx():
    """The reference's canonical test context — executor.rs:252-309:
    park polygon with string/double/bool/sint tags, current_key name:en."""
    return EvaluationContext(
        layer_name="test",
        properties={
            "name": vstr("Central Park"),
            "kind": vstr("park"),
            "area": vfloat_from_f64(3.41),
            "public": vbool(True),
            "capacity": vint(1000),
        },
        current_key="name:en",
        geometry_type="Polygon",
    )


def ev(expr_json, context=None):
    return evaluate_bool(compile_expression(expr_json), context or ctx())


# ---- executor.rs ports ------------------------------------------------

def test_simple_equality_filter():
    assert ev(["==", ["tag", "kind"], "park"])


def test_inequality_filter():
    assert ev(["!=", ["tag", "kind"], "school"])


def test_numeric_comparison():
    assert ev([">", ["tag", "capacity"], 500])
    assert ev(["<", ["tag", "area"], 5.0])


def test_logical_operations():
    assert ev(["any", ["==", ["tag", "kind"], "school"], ["==", ["tag", "kind"], "park"]])
    assert ev(["all", ["==", ["tag", "kind"], "park"], [">", ["tag", "capacity"], 100]])
    assert ev(["!", ["==", ["tag", "kind"], "school"]])


def test_membership_operations():
    assert ev(["in", ["tag", "kind"], ["literal", ["park", "school", "hospital"]]])
    assert ev(["!", ["in", ["tag", "kind"], ["literal", ["school", "hospital"]]]])
    # null ∈ set containing null — executor.rs:402-406
    assert ev(["in", None, ["literal", [None, "school", "hospital"]]])


def test_string_operations():
    assert ev(["starts-with", ["tag", "name"], "Central"])
    assert ev(["ends-with", ["tag", "name"], "Park"])
    assert ev(["regex-match", ["tag", "name"], "^Central.*Park$"])


def test_context_operations():
    assert ev(["starts-with", ["key"], "name:"])
    assert ev(["==", ["type"], "Polygon"])


def test_boolean_type_conversion():
    assert ev(["boolean", ["tag", "public"]])


def test_missing_tag_handling():
    assert not ev(["==", ["tag", "nonexistent"], "value"])


def test_complex_filter_example():
    assert ev([
        "all",
        ["==", ["tag", "kind"], "park"],
        ["boolean", ["tag", "public"]],
        ["any", [">", ["tag", "capacity"], 500], [">", ["tag", "area"], 2.0]],
    ])


def test_regex_capture():
    out = evaluate(compile_expression(["regex-capture", ["tag", "name"], r"^(\w+)", 1]), ctx())
    assert out == vstr("Central")


def test_complex_regex_capture_filter():
    """executor.rs:504-545 — the flagship language-code filter under three
    current_key values."""
    expr = compile_expression([
        "all",
        ["starts-with", ["key"], "name"],
        ["not", ["in",
                 ["regex-capture", ["key"], "^name:?(.*)$", 1],
                 ["literal", ["", "ja"]]]],
    ])
    assert evaluate_bool(expr, ctx())                                  # name:en → keep
    assert not evaluate_bool(expr, ctx().with_current_key("name:ja"))  # ja ∈ set
    assert not evaluate_bool(expr, ctx().with_current_key("name"))     # "" ∈ set


# ---- expression_compiler.rs ports ------------------------------------

def test_compile_shapes():
    assert compile_expression(["==", ["tag", "kind"], "park"])[0] == "eq"
    anyexpr = compile_expression(
        ["any", ["==", ["tag", "kind"], "park"], ["==", ["tag", "kind"], "school"]])
    assert len(anyexpr[1]) == 2
    inexpr = compile_expression(
        ["in", ["tag", "kind"], ["literal", ["park", "school", "hospital"]]])
    assert len(inexpr[2]) == 3 and vstr("park") in inexpr[2]


def test_invalid_regex_pattern():
    with pytest.raises(ExpressionCompileError):
        compile_expression(["regex-match", ["key"], "["])


def test_in_requires_literal_array():
    with pytest.raises(ExpressionCompileError):
        compile_expression(["in", ["tag", "kind"], ["tag", "other"]])


def test_operator_token_table():
    """data.rs:112-137 — incl. parse-parity: 'not-in' is NOT a token."""
    for tok in ["==", "in", "starts-with", "type"]:
        compile_expression([tok] if tok == "type" else _minimal(tok))
    with pytest.raises(ExpressionCompileError):
        compile_expression(["invalid-op", 1, 2])
    with pytest.raises(ExpressionCompileError):
        compile_expression(["not-in", ["tag", "kind"], ["literal", ["a"]]])
    with pytest.raises(ExpressionCompileError):
        compile_expression([])
    with pytest.raises(ExpressionCompileError):
        compile_expression({"op": "=="})


def _minimal(tok):
    return {
        "==": ["==", 1, 1],
        "in": ["in", 1, ["literal", [1]]],
        "starts-with": ["starts-with", ["key"], "x"],
    }[tok]


def test_value_conversions():
    assert display(vstr("test")) == "test" and to_bool(vstr("test"))
    assert not to_bool(vint(0))
    assert to_bool(vbool(True))
    assert display(vbool(True)) == "true" and display(vnull()) == "null"


# ---- float-as-string caveats (SURVEY §2.4) ---------------------------

def test_float_string_forms():
    # mvt doubles go through Rust Display: 5.0 → "5"
    assert fmt_float_rust(5.0) == "5"
    assert fmt_float_rust(3.41) == "3.41"
    assert fmt_float_rust(-0.0) == "-0"
    # JSON literals go through serde/ryu: 5.0 → "5.0"
    assert fmt_float_serde(5.0) == "5.0"
    assert fmt_float_serde(3.41) == "3.41"


def test_float_in_set_uses_string_identity():
    """A double tag 5.0 ("5") does NOT match a JSON literal 5.0 ("5.0")
    inside `in` — exact reference behavior (hash by string form)."""
    context = EvaluationContext("t", {"x": vfloat_from_f64(5.0)})
    assert not ev(["in", ["tag", "x"], ["literal", [5.0]]], context)
    # but ordering comparison parses both to f64 and matches
    assert ev(["==", ["tag", "x"], 5.0], context)


def test_float_truthiness_string_table():
    assert not to_bool(vfloat_from_f64(0.0))      # "0"
    assert to_bool(vfloat_from_f64(-0.0))         # "-0" ≠ "0"/"0.0"
    assert to_bool(vfloat_from_f64(0.5))


def test_mixed_type_comparison_string_fallback():
    # Number(5) vs String("5") → Display compare → equal
    assert compare_values(vint(5), vstr("5")) == 0
    # Boolean(true) vs String("true") → equal
    assert compare_values(vbool(True), vstr("true")) == 0
    # Null < anything
    assert compare_values(vnull(), vint(-10)) == -1


def test_int_literal_vs_double_tag():
    context = EvaluationContext("t", {"area": vfloat_from_f64(3.41)})
    assert ev([">", ["tag", "area"], 3], context)
    assert ev(["<", ["tag", "area"], 4], context)


# ---- vectorized ≡ oracle ---------------------------------------------

EXPRS = [
    ["==", ["tag", "kind"], "park"],
    ["!=", ["tag", "kind"], "school"],
    [">", ["tag", "capacity"], 500],
    ["<", ["tag", "area"], 5.0],
    [">=", ["tag", "capacity"], ["tag", "area"]],
    ["any", ["==", ["tag", "kind"], "school"], ["==", ["tag", "kind"], "park"]],
    ["all", ["==", ["tag", "kind"], "park"], [">", ["tag", "capacity"], 100]],
    ["none", ["==", ["tag", "kind"], "zoo"]],
    ["!", ["==", ["tag", "kind"], "school"]],
    ["in", ["tag", "kind"], ["literal", ["park", "school", None, 7, 2.5]]],
    ["starts-with", ["tag", "name"], "Cen"],
    ["ends-with", ["tag", "name"], "ark"],
    ["regex-match", ["tag", "name"], "^C.*k$"],
    ["==", ["regex-capture", ["key"], "^name:?(.*)$", 1], "en"],
    ["boolean", ["tag", "public"]],
    ["boolean", ["tag", "area"]],
    ["==", ["type"], "Polygon"],
    ["==", ["tag", "capacity"], ["tag", "name"]],     # mixed fallback
    ["in", ["tag", "area"], ["literal", [3.41, "3.41"]]],
]

_names = st.sampled_from(["Central Park", "park", "", "5", "true", "null", "Ω≤", "name:fr"])
_kinds = st.sampled_from(["park", "school", None, "building"])
_areas = st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                        min_value=-1e6, max_value=1e6))
_caps = st.one_of(st.none(), st.integers(min_value=-(2**40), max_value=2**40))
_pubs = st.one_of(st.none(), st.booleans())


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(_names, _kinds, _areas, _caps, _pubs), min_size=1, max_size=40),
       st.sampled_from(range(len(EXPRS))))
def test_vector_matches_oracle(rows, expr_i):
    expr = compile_expression(EXPRS[expr_i])
    names, kinds, areas, caps, pubs = zip(*rows)
    n = len(rows)
    table = pa.table({
        "name": pa.array(names, pa.string()),
        "kind": pa.array(kinds, pa.string()),
        "area": pa.array(areas, pa.float64()),
        "capacity": pa.array(caps, pa.int64()),
        "public": pa.array(pubs, pa.bool_()),
    })
    from mvt_wrangler_ray.expr.vector import VBatch
    vctx = ColumnTagContext(
        n, {c: table[c] for c in table.column_names},
        layer_name="test",
        current_key=VBatch.from_scalar(vstr("name:en"), n),
        geometry_type=VBatch.from_scalar(vstr("Polygon"), n),
    )
    got = evaluate_vector(expr, vctx).to_bool_array()

    for r in range(n):
        props = {}
        if names[r] is not None:
            props["name"] = vstr(names[r])
        if kinds[r] is not None:
            props["kind"] = vstr(kinds[r])
        if areas[r] is not None:
            props["area"] = vfloat_from_f64(areas[r])
        if caps[r] is not None:
            props["capacity"] = vint(caps[r])
        if pubs[r] is not None:
            props["public"] = vbool(pubs[r])
        rctx = EvaluationContext("test", props, "name:en", "Polygon")
        want = evaluate_bool(expr, rctx)
        assert bool(got[r]) == want, f"row {r} expr {EXPRS[expr_i]}: {got[r]} != {want}"


def test_vector_regex_capture_values():
    from mvt_wrangler_ray.expr.vector import VBatch
    keys = np.array(["name:en", "name:ja", "name", "pgf:name:ja", "kind"], dtype=object)
    vctx = ColumnTagContext(5, {}, current_key=VBatch.from_strings(keys))
    expr = compile_expression(["regex-capture", ["key"], "^name:?(.*)$", 1])
    out = evaluate_vector(expr, vctx)
    vals = [out.row_value(i) for i in range(5)]
    assert vals[0] == vstr("en")
    assert vals[1] == vstr("ja")
    assert vals[2] == vstr("")          # group participates with empty match
    assert vals[3] == vnull()           # no match ("pgf:..." doesn't start at ^)
    assert vals[4] == vnull()


def test_documented_but_unimplemented_tokens_rejected():
    """FILTERING.md lists `not-in` and `string` but the reference's
    Operator::from_str (data.rs:112-137) has no arms for them — both are
    compile errors there, and must stay compile errors here."""
    with pytest.raises(ExpressionCompileError):
        compile_expression(["string", ["tag", "kind"]])
    with pytest.raises(ExpressionCompileError):
        compile_expression(["not-in", ["tag", "kind"], ["literal", ["a"]]])


# ---- round-2 core-review regressions ----------------------------------


def test_signed_zero_display_parity():
    """np.unique collapses -0.0/+0.0; the vectorized formatter must keep
    their distinct Display forms ('0' vs '-0') — fuzz-found divergence
    from the row oracle."""
    from mvt_wrangler_ray.expr.vector import VBatch

    col = pa.array(np.array([0.0, -0.0, 1.5, -0.0, 0.0]))
    vb = VBatch.from_arrow(col)
    disp = vb.ensure_display()
    assert list(disp) == ["0", "-0", "1.5", "-0", "0"]
    vctx = ColumnTagContext(5, {"c": VBatch.from_arrow(col)})
    expr = compile_expression(["starts-with", ["tag", "c"], "-"])
    out = evaluate_vector(expr, vctx).to_bool_array()
    assert list(out) == [False, True, False, True, False]


def test_big_uint_wraps_like_reference():
    """expression_compiler.rs:84 does `u as i64` — uint values >= 2^63
    wrap two's-complement instead of overflowing int64 columns."""
    from mvt_wrangler_ray.expr.vector import VBatch
    from mvt_wrangler_ray.pipelines.archive import _mvt_value_to_expr
    from mvt_wrangler_ray.pipelines.features import tag_value

    big = np.uint64(2**63 + 5)
    assert _mvt_value_to_expr(big) == vint(-(2**63) + 5)
    assert tag_value(big)["i"] == -(2**63) + 5
    col = pa.array(np.array([2**63 + 5, 7], dtype=np.uint64))
    vb = VBatch.from_arrow(col)
    assert list(vb.i) == [-(2**63) + 5, 7]


def test_big_int_literal_compiles_to_float_string():
    """serde as_i64 fails outside i64; the reference stores
    Float(n.to_string()) — and the vectorized 'in' must not crash."""
    big = 2**63 + 1
    expr = compile_expression(["in", ["tag", "x"], ["literal", [big]]])
    ctx = EvaluationContext("l", {"x": vint(5)}, None, "Point")
    assert evaluate_bool(expr, ctx) is False
    from mvt_wrangler_ray.expr.vector import VBatch

    vctx = ColumnTagContext(2, {"x": VBatch.from_arrow(pa.array([5, 6]))})
    out = evaluate_vector(expr, vctx).to_bool_array()
    assert list(out) == [False, False]
    # a Float-typed tag whose display equals the literal's text DOES match
    ctx2 = EvaluationContext("l", {"x": (3, str(big))}, None, "Point")
    assert evaluate_bool(expr, ctx2) is True


def test_float32_column_display_parity():
    """A float32 Arrow column must Display at f32 precision ('0.1'), and
    compare using the parsed-back f64 — the tag_value ingestion rule."""
    from mvt_wrangler_ray.expr.vector import VBatch

    col = pa.array(np.array([0.1, 2.5], dtype=np.float32))
    vb = VBatch.from_arrow(col)
    assert list(vb.ensure_display()) == ["0.1", "2.5"]
    vctx = ColumnTagContext(2, {"x": VBatch.from_arrow(col)})
    expr = compile_expression(["==", ["tag", "x"], 0.1])
    assert list(evaluate_vector(expr, vctx).to_bool_array()) == [True, False]


def test_truncated_fixed_width_fields_raise_valueerror():
    from mvt_wrangler_ray.sources.mvt import _iter_fields

    # field 3, wire type 1 (fixed64) with only 3 payload bytes
    with pytest.raises(ValueError, match="fixed64"):
        list(_iter_fields(bytes([3 << 3 | 1, 0, 0, 0])))
    with pytest.raises(ValueError, match="fixed32"):
        list(_iter_fields(bytes([7 << 3 | 5, 0])))
