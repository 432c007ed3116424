"""Maplibre-style JSON expression dialect (the reference's filter WHERE
language), compiled once on the driver, evaluated row-wise (oracle) or
vectorized over Arrow batches.

Semantics parity target: /root/reference/src/filtering/
  - data.rs:112-137        operator token table (note: "not-in" is NOT a token)
  - expression_compiler.rs value model + compilation rules
  - executor.rs            evaluation, coercion and comparison tables
"""

from .values import (
    V_NULL,
    V_BOOL,
    V_INT,
    V_FLOAT,
    V_STR,
    V_ARRAY,
    Value,
    vnull,
    vbool,
    vint,
    vfloat_from_f32,
    vfloat_from_f64,
    vfloat_from_json,
    vstr,
    varray,
    to_bool,
    display,
    compare_values,
    fmt_float_rust,
    fmt_float_serde,
)
from .compiler import compile_expression, ExpressionCompileError
from .rowexec import EvaluationContext, evaluate, evaluate_bool
from .vector import VBatch, VectorContext, ColumnTagContext, evaluate_vector

__all__ = [
    "V_NULL", "V_BOOL", "V_INT", "V_FLOAT", "V_STR", "V_ARRAY",
    "Value", "vnull", "vbool", "vint", "vfloat_from_f32", "vfloat_from_f64",
    "vfloat_from_json", "vstr", "varray", "to_bool", "display",
    "compare_values", "fmt_float_rust", "fmt_float_serde",
    "compile_expression", "ExpressionCompileError",
    "EvaluationContext", "evaluate", "evaluate_bool",
    "VBatch", "VectorContext", "ColumnTagContext", "evaluate_vector",
]
