"""Compile JSON array expressions to an AST, once, on the driver.

Parity: /root/reference/src/filtering/expression_compiler.rs:127-351 and
the operator token table data.rs:112-137. Compile errors (bad operator,
bad arity, invalid regex, non-literal ``in`` array, object literals) are
raised here — never mid-stream (lib.rs:57-59).

AST nodes are small frozen tuples ``(OP, *args)`` so a compiled expression
pickles cheaply into Ray actor constructors / ``ray.put`` broadcasts.
"""

from __future__ import annotations

import re
from typing import Any, FrozenSet, Tuple

from .values import (
    Value,
    value_from_json,
    vbool,
    vfloat_from_json,
    vint,
    vnull,
    vstr,
)

# AST op codes
OP_EQ = "eq"
OP_NE = "ne"
OP_LT = "lt"
OP_GT = "gt"
OP_LE = "le"
OP_GE = "ge"
OP_ANY = "any"
OP_ALL = "all"
OP_NONE = "none"
OP_NOT = "not"
OP_IN = "in"
OP_STARTS = "starts_with"
OP_ENDS = "ends_with"
OP_REGEX_MATCH = "regex_match"
OP_REGEX_CAPTURE = "regex_capture"
OP_BOOLEAN = "boolean"
OP_LITERAL = "literal"
OP_TAG = "tag"
OP_KEY = "key"
OP_TYPE = "type"

Expr = Tuple  # (op, *payload)


class ExpressionCompileError(ValueError):
    pass


def expression_deps(expr) -> frozenset:
    """Context dependencies of a compiled expression: subset of
    {"tag", "key", "type"}. Lets evaluators cache results that depend
    only on the current key (e.g. the common global ``name:*`` tag
    filters) instead of re-evaluating per feature."""
    op = expr[0]
    if op == OP_TAG:
        return frozenset(("tag",))
    if op == OP_KEY:
        return frozenset(("key",))
    if op == OP_TYPE:
        return frozenset(("type",))
    if op == OP_LITERAL:
        return frozenset()
    if op in (OP_ANY, OP_ALL, OP_NONE):
        out = frozenset()
        for sub in expr[1]:
            out |= expression_deps(sub)
        return out
    out = frozenset()
    for part in expr[1:]:
        if isinstance(part, tuple) and part and isinstance(part[0], str):
            out |= expression_deps(part)
    return out


# data.rs:112-137 — note "not-in" is deliberately absent (documented in
# FILTERING.md but not implemented in the reference; users write ["!", ["in", ...]]).
_TOKEN_TABLE = {
    "==": OP_EQ,
    "!=": OP_NE,
    "<": OP_LT,
    ">": OP_GT,
    "<=": OP_LE,
    ">=": OP_GE,
    "any": OP_ANY,
    "all": OP_ALL,
    "none": OP_NONE,
    "not": OP_NOT,
    "!": OP_NOT,
    "in": OP_IN,
    "starts-with": OP_STARTS,
    "ends-with": OP_ENDS,
    "regex-match": OP_REGEX_MATCH,
    "regex-capture": OP_REGEX_CAPTURE,
    "boolean": OP_BOOLEAN,
    "literal": OP_LITERAL,
    "tag": OP_TAG,
    "key": OP_KEY,
    "type": OP_TYPE,
}

_BINARY_CMP = {"==": OP_EQ, "!=": OP_NE, "<": OP_LT, ">": OP_GT, "<=": OP_LE, ">=": OP_GE}


def _ensure_argc(op: str, args, n: int):
    if len(args) != n:
        raise ExpressionCompileError(f"{op}: expected {n} arguments, got {len(args)}")


def compile_expression(expr: Any) -> Expr:
    """JSON value → AST. Mirrors ExpressionCompiler::compile."""
    if isinstance(expr, list):
        if not expr:
            raise ExpressionCompileError("Expression array cannot be empty")
        tok = expr[0]
        if not isinstance(tok, str):
            raise ExpressionCompileError("First element must be operator string")
        if tok not in _TOKEN_TABLE:
            raise ExpressionCompileError(f"Unknown operator: {tok}")
        return _compile_operator(tok, expr[1:])
    # bare literals (expression_compiler.rs:148-163)
    if isinstance(expr, bool):
        return (OP_LITERAL, vbool(expr))
    if isinstance(expr, str):
        return (OP_LITERAL, vstr(expr))
    if isinstance(expr, int):
        # serde as_i64-else-Float(n.to_string()) — same range rule as
        # value_from_json; a big V_INT would also crash the vectorized
        # isin's int64 set mid-stream
        from .values import value_from_json

        return (OP_LITERAL, value_from_json(expr))
    if isinstance(expr, float):
        return (OP_LITERAL, vfloat_from_json(expr))
    if expr is None:
        return (OP_LITERAL, vnull())
    raise ExpressionCompileError("Object expressions are not supported")


def _compile_operator(tok: str, args) -> Expr:
    op = _TOKEN_TABLE[tok]
    if tok in _BINARY_CMP:
        _ensure_argc(tok, args, 2)
        return (op, compile_expression(args[0]), compile_expression(args[1]))
    if op in (OP_ANY, OP_ALL, OP_NONE):
        return (op, tuple(compile_expression(a) for a in args))
    if op == OP_NOT:
        _ensure_argc(tok, args, 1)
        return (op, compile_expression(args[0]))
    if op == OP_IN:
        _ensure_argc(tok, args, 2)
        sub = compile_expression(args[0])
        values = compile_expression(args[1])
        if values[0] != OP_LITERAL or values[1][0] != 5:  # V_ARRAY
            raise ExpressionCompileError("In operator requires an array of values")
        value_set: FrozenSet[Value] = frozenset(values[1][1])
        return (op, sub, value_set)
    if op in (OP_STARTS, OP_ENDS):
        _ensure_argc(tok, args, 2)
        sub = compile_expression(args[0])
        if not isinstance(args[1], str):
            raise ExpressionCompileError(f"{tok} requires string argument")
        return (op, sub, args[1])
    if op == OP_REGEX_MATCH:
        _ensure_argc(tok, args, 2)
        sub = compile_expression(args[0])
        if not isinstance(args[1], str):
            raise ExpressionCompileError("RegexMatch requires string pattern")
        try:
            rx = re.compile(args[1])
        except re.error as e:
            raise ExpressionCompileError(f"Invalid regex pattern '{args[1]}': {e}")
        return (op, sub, rx)
    if op == OP_REGEX_CAPTURE:
        if len(args) < 3:
            raise ExpressionCompileError(
                f"regex-capture: expected at least 3 arguments, got {len(args)}"
            )
        sub = compile_expression(args[0])
        if not isinstance(args[1], str):
            raise ExpressionCompileError("RegexCapture requires string pattern")
        if not isinstance(args[2], int) or isinstance(args[2], bool) or args[2] < 0:
            raise ExpressionCompileError("RegexCapture requires numeric group index")
        try:
            rx = re.compile(args[1])
        except re.error as e:
            raise ExpressionCompileError(f"Invalid regex pattern '{args[1]}': {e}")
        return (op, sub, rx, args[2])
    if op == OP_BOOLEAN:
        _ensure_argc(tok, args, 1)
        return (op, compile_expression(args[0]))
    if op == OP_LITERAL:
        _ensure_argc(tok, args, 1)
        return (op, value_from_json(args[0]))
    if op == OP_TAG:
        _ensure_argc(tok, args, 1)
        if not isinstance(args[0], str):
            raise ExpressionCompileError("Tag operator requires string argument")
        return (op, args[0])
    if op == OP_KEY:
        _ensure_argc(tok, args, 0)
        return (op,)
    if op == OP_TYPE:
        _ensure_argc(tok, args, 0)
        return (op,)
    raise AssertionError(f"unhandled operator {tok}")
