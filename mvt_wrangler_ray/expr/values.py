"""Runtime value domain for the filter expression dialect.

Parity with the reference's ``ExpressionValue``
(/root/reference/src/filtering/expression_compiler.rs:47-125) and the
comparison/coercion table (/root/reference/src/filtering/executor.rs:200-235).

A value is a plain tuple ``(kind, payload)`` — cheap, hashable (needed for
``in`` sets), and trivially picklable for Ray broadcast:

    (V_NULL,  None)
    (V_BOOL,  bool)
    (V_INT,   int)          # i64 domain
    (V_FLOAT, str)          # float carried as its STRING form (reference parity)
    (V_STR,   str)
    (V_ARRAY, tuple[Value, ...])

Float-as-string is load-bearing: the reference stores floats as the string
produced at ingestion time and (a) hashes/compares them by that string in
``in`` sets, (b) parses them back to f64 for ordering comparisons with
``unwrap_or(0.0)``, (c) treats exactly "0"/"0.0" as falsy. Two distinct
string producers exist in the reference and we mirror both:

  * mvt tag doubles go through Rust ``f64::Display`` → ``5.0`` becomes "5"
    (expression_compiler.rs:87-90 ``f.to_string()``);
  * JSON literals go through serde_json/ryu → ``5.0`` stays "5.0"
    (expression_compiler.rs:62-66 ``n.to_string()``).
"""

from __future__ import annotations

import math
from typing import Tuple, Union

V_NULL = 0
V_BOOL = 1
V_INT = 2
V_FLOAT = 3
V_STR = 4
V_ARRAY = 5

Value = Tuple[int, Union[None, bool, int, str, tuple]]

_VNULL: Value = (V_NULL, None)


def vnull() -> Value:
    return _VNULL


def vbool(b: bool) -> Value:
    return (V_BOOL, bool(b))


def vint(i: int) -> Value:
    return (V_INT, int(i))


def vstr(s: str) -> Value:
    return (V_STR, s)


def varray(items) -> Value:
    return (V_ARRAY, tuple(items))


def fmt_float_rust(x: float) -> str:
    """Rust ``f64::Display`` (shortest round-trip, integral values WITHOUT
    a trailing ``.0``, no exponent for ordinary magnitudes). This is the
    string form mvt double/float tag values take in the reference
    (expression_compiler.rs:87-90)."""
    if math.isnan(x):
        return "NaN"
    if math.isinf(x):
        return "inf" if x > 0 else "-inf"
    if x == int(x) and abs(x) < 1e16:
        # Rust Display keeps the sign of -0.0 ("-0") but drops the ".0"
        if x == 0.0 and math.copysign(1.0, x) < 0:
            return "-0"
        return str(int(x))
    r = repr(float(x))
    if "e" in r or "E" in r:
        # Rust Display never uses scientific notation; expand positionally.
        return _expand_positional(float(x))
    return r


def fmt_float_serde(x: float) -> str:
    """serde_json / ryu ``Number::to_string`` (shortest round-trip, integral
    values WITH a trailing ``.0``). This is the string form JSON literal
    floats take in the reference (expression_compiler.rs:62-66). Python's
    repr already matches for ordinary magnitudes."""
    if math.isnan(x) or math.isinf(x):
        return "null"  # serde_json cannot represent these; unreachable in practice
    r = repr(float(x))
    if "e" in r or "E" in r:
        return _normalize_ryu_exponent(r)
    return r


def _expand_positional(x: float) -> str:
    """Exact positional expansion of the shortest round-trip digits —
    Rust Display never uses exponent notation, so 5e-324 renders as a
    ~324-digit decimal. Decimal(repr(x)) keeps exactly the shortest
    digits; 'f' formatting expands positionally without precision loss."""
    from decimal import Decimal

    s = format(Decimal(repr(x)), "f")
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return s if s not in ("", "-") else "0"


def _normalize_ryu_exponent(r: str) -> str:
    """ryu prints 'e16'/'e-5'; Python repr prints 'e+16'/'e-05'."""
    mant, _, exp = r.partition("e")
    neg = exp.startswith("-")
    exp = exp.lstrip("+-").lstrip("0") or "0"
    return f"{mant}e{'-' if neg else ''}{exp}"


def vfloat_from_f64(x: float) -> Value:
    """A float sourced from a typed (Arrow/mvt) double column."""
    return (V_FLOAT, fmt_float_rust(x))


def fmt_float32_rust(x) -> str:
    """Rust ``f32::Display`` — shortest round-trip at FLOAT32 precision,
    integral without ``.0``, positional notation. An mvt float (Value
    field 2) of 0.1f32 renders "0.1" in the reference; widening to f64
    first would render "0.10000000149011612" and break ==/in/truthiness
    against expression literals (expression_compiler.rs:85-86)."""
    import numpy as np

    x32 = np.float32(x)
    if np.isnan(x32):
        return "NaN"
    if np.isinf(x32):
        return "inf" if x32 > 0 else "-inf"
    return np.format_float_positional(x32, unique=True, trim="-")


def vfloat_from_f32(x) -> Value:
    """A float sourced from a typed float32 (mvt Value field 2) column."""
    return (V_FLOAT, fmt_float32_rust(x))


def vfloat_from_json(x: float) -> Value:
    """A float sourced from a JSON literal in an expression."""
    return (V_FLOAT, fmt_float_serde(x))


def _parse_f64(s: str) -> float:
    """Rust ``str::parse::<f64>().unwrap_or(0.0)`` (executor.rs:214)."""
    try:
        return float(s)
    except (ValueError, TypeError):
        return 0.0


def to_bool(v: Value) -> bool:
    """Truthiness table — expression_compiler.rs:99-108."""
    k, p = v
    if k == V_BOOL:
        return p
    if k == V_STR:
        return p != ""
    if k == V_INT:
        return p != 0
    if k == V_FLOAT:
        return p != "0" and p != "0.0"
    if k == V_NULL:
        return False
    # array
    return len(p) != 0


def display(v: Value) -> str:
    """Rust ``Display for ExpressionValue`` — expression_compiler.rs:111-125.
    Note booleans render lowercase and Null renders "null"."""
    k, p = v
    if k == V_STR:
        return p
    if k == V_INT:
        return str(p)
    if k == V_FLOAT:
        return p
    if k == V_BOOL:
        return "true" if p else "false"
    if k == V_NULL:
        return "null"
    return "[" + ", ".join(display(e) for e in p) + "]"


def compare_values(left: Value, right: Value) -> int:
    """Total order with type coercion — executor.rs:200-235.
    Returns -1 / 0 / +1.

    Null < everything; bool.cmp; int.cmp; float(str)↔float(str) parsed as
    f64 (parse failure → 0.0); int×float promote; str.cmp; ANY other mixed
    pair compares the Display strings."""
    lk, lp = left
    rk, rp = right
    if lk == V_NULL and rk == V_NULL:
        return 0
    if lk == V_NULL:
        return -1
    if rk == V_NULL:
        return 1
    if lk == V_BOOL and rk == V_BOOL:
        return (lp > rp) - (lp < rp)
    if lk == V_INT and rk == V_INT:
        return (lp > rp) - (lp < rp)
    if lk == V_FLOAT and rk == V_FLOAT:
        a, b = _parse_f64(lp), _parse_f64(rp)
        if a != a or b != b:  # NaN → Ordering::Equal (partial_cmp unwrap_or)
            return 0
        return (a > b) - (a < b)
    if lk == V_INT and rk == V_FLOAT:
        a, b = float(lp), _parse_f64(rp)
        if b != b:
            return 0
        return (a > b) - (a < b)
    if lk == V_FLOAT and rk == V_INT:
        a, b = _parse_f64(lp), float(rp)
        if a != a:
            return 0
        return (a > b) - (a < b)
    if lk == V_STR and rk == V_STR:
        return (lp > rp) - (lp < rp)
    a, b = display(left), display(right)
    return (a > b) - (a < b)


def value_from_json(obj) -> Value:
    """``ExpressionValue::from_json_value`` — expression_compiler.rs:58-75.
    Whole-number JSON floats that fit i64 become Number (serde ``as_i64``
    returns Some only for syntactic integers; Python's json module parses
    ``5`` as int and ``5.0`` as float, which matches serde's distinction)."""
    if obj is None:
        return vnull()
    if isinstance(obj, bool):
        return vbool(obj)
    if isinstance(obj, int):
        if -(1 << 63) <= obj < (1 << 63):
            return vint(obj)
        # serde's as_i64 fails outside i64; the reference then stores
        # Float(n.to_string()) — the integer's decimal text
        return (V_FLOAT, str(obj))
    if isinstance(obj, float):
        return vfloat_from_json(obj)
    if isinstance(obj, str):
        return vstr(obj)
    if isinstance(obj, (list, tuple)):
        return varray(value_from_json(e) for e in obj)
    # serde falls back to the JSON string rendering for other types
    import json as _json

    return vstr(_json.dumps(obj))
