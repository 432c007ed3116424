"""Row-wise expression evaluator — the semantic oracle.

Parity: /root/reference/src/filtering/executor.rs:45-241. The vectorized
evaluator (vector.py) is property-tested against this one.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, Optional

from . import compiler as c
from .values import (
    Value,
    compare_values,
    display,
    to_bool,
    vbool,
    vnull,
    vstr,
)


@dataclass
class EvaluationContext:
    """executor.rs:9-40. ``properties`` maps tag key → Value (already in
    expression-value form; ingestion-side coercion from the storage type
    happens before this — see values.vfloat_from_f64 for doubles)."""

    layer_name: str
    properties: Dict[str, Value] = field(default_factory=dict)
    current_key: Optional[str] = None
    geometry_type: Optional[str] = None

    def with_current_key(self, key: str) -> "EvaluationContext":
        return EvaluationContext(self.layer_name, self.properties, key, self.geometry_type)

    def with_geometry_type(self, g: str) -> "EvaluationContext":
        return EvaluationContext(self.layer_name, self.properties, self.current_key, g)


def evaluate(expr, ctx: EvaluationContext) -> Value:
    op = expr[0]
    if op == c.OP_LITERAL:
        return expr[1]
    if op == c.OP_TAG:
        return ctx.properties.get(expr[1], vnull())
    if op == c.OP_KEY:
        return vstr(ctx.current_key) if ctx.current_key is not None else vnull()
    if op == c.OP_TYPE:
        return vstr(ctx.geometry_type) if ctx.geometry_type is not None else vnull()
    if op == c.OP_EQ:
        return vbool(compare_values(evaluate(expr[1], ctx), evaluate(expr[2], ctx)) == 0)
    if op == c.OP_NE:
        return vbool(compare_values(evaluate(expr[1], ctx), evaluate(expr[2], ctx)) != 0)
    if op == c.OP_LT:
        return vbool(compare_values(evaluate(expr[1], ctx), evaluate(expr[2], ctx)) < 0)
    if op == c.OP_GT:
        return vbool(compare_values(evaluate(expr[1], ctx), evaluate(expr[2], ctx)) > 0)
    if op == c.OP_LE:
        return vbool(compare_values(evaluate(expr[1], ctx), evaluate(expr[2], ctx)) <= 0)
    if op == c.OP_GE:
        return vbool(compare_values(evaluate(expr[1], ctx), evaluate(expr[2], ctx)) >= 0)
    if op == c.OP_ANY:
        for sub in expr[1]:
            if to_bool(evaluate(sub, ctx)):
                return vbool(True)
        return vbool(False)
    if op == c.OP_ALL:
        for sub in expr[1]:
            if not to_bool(evaluate(sub, ctx)):
                return vbool(False)
        return vbool(True)
    if op == c.OP_NONE:
        for sub in expr[1]:
            if to_bool(evaluate(sub, ctx)):
                return vbool(False)
        return vbool(True)
    if op == c.OP_NOT:
        return vbool(not to_bool(evaluate(expr[1], ctx)))
    if op == c.OP_IN:
        return vbool(evaluate(expr[1], ctx) in expr[2])
    if op == c.OP_STARTS:
        return vbool(display(evaluate(expr[1], ctx)).startswith(expr[2]))
    if op == c.OP_ENDS:
        return vbool(display(evaluate(expr[1], ctx)).endswith(expr[2]))
    if op == c.OP_REGEX_MATCH:
        # Rust regex is_match = unanchored search (executor.rs:148-152)
        return vbool(expr[2].search(display(evaluate(expr[1], ctx))) is not None)
    if op == c.OP_REGEX_CAPTURE:
        rx: re.Pattern = expr[2]
        m = rx.search(display(evaluate(expr[1], ctx)))
        if m is None:
            return vnull()
        gi = expr[3]
        if gi > rx.groups:
            return vnull()
        g = m.group(gi)
        # Rust captures.get(i) is None only for non-participating groups
        return vstr(g) if g is not None else vnull()
    if op == c.OP_BOOLEAN:
        return vbool(to_bool(evaluate(expr[1], ctx)))
    raise AssertionError(f"unhandled op {op}")


def evaluate_bool(expr, ctx: EvaluationContext) -> bool:
    return to_bool(evaluate(expr, ctx))
