"""Vectorized expression evaluator over Arrow/numpy batches.

Same semantics as rowexec.py (property-tested equivalent), but each AST
node evaluates a whole batch at once:

  * values are a tagged union of numpy arrays (``VBatch``) — a per-row
    ``kind`` code plus payload arrays; float rows carry BOTH the f64 (for
    ordering) and, lazily, the reference's string form (for display /
    ``in`` / truthiness — see values.py for why floats are strings);
  * comparisons dispatch on (kind, kind) masks, with the reference's
    mixed-type fallback (compare Display strings) — executor.rs:200-235;
  * regex ops run the compiled Python pattern over the UNIQUE display
    strings only (dictionary trick): tag keys/values repeat massively in
    real batches, so this is near-vectorized cost;
  * logical ops are numpy boolean algebra (no short-circuit needed — the
    reference's short-circuit is unobservable: expressions are pure and
    error-free after compilation).

This module is the hot path of the filter-join stage; no per-row Python
except through the unique-value dictionary trick.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import pyarrow as pa

from . import compiler as c
from .values import (
    V_ARRAY,
    V_BOOL,
    V_FLOAT,
    V_INT,
    V_NULL,
    V_STR,
    Value,
    display,
    fmt_float_rust,
    to_bool,
)

_EMPTY_OBJ = np.empty(0, dtype=object)


class VBatch:
    """Tagged-union batch of expression values.

    kind : int8[n]  (V_* codes)
    b    : bool[n]  payload for V_BOOL rows
    i    : int64[n] payload for V_INT rows
    f    : f64[n]   payload for V_FLOAT rows (numeric form)
    s    : object[n] or None — string payloads: V_STR rows hold the string,
           V_FLOAT rows hold the reference string form (lazily built)
    arr  : object[n] or None — V_ARRAY rows hold Value tuples (rare: only
           literals produce arrays, and those are scalar-broadcast)
    """

    __slots__ = ("n", "kind", "b", "i", "f", "s", "arr", "_scalar")

    def __init__(self, n, kind, b=None, i=None, f=None, s=None, arr=None, scalar=None):
        self.n = n
        self.kind = kind
        self.b = b
        self.i = i
        self.f = f
        self.s = s
        self.arr = arr
        self._scalar = scalar  # set when this batch is a broadcast constant

    # ---- constructors -------------------------------------------------

    @staticmethod
    def from_scalar(v: Value, n: int) -> "VBatch":
        k, p = v
        kind = np.full(n, k, dtype=np.int8)
        vb = VBatch(n, kind, scalar=v)
        if k == V_BOOL:
            vb.b = np.full(n, p, dtype=bool)
        elif k == V_INT:
            vb.i = np.full(n, p, dtype=np.int64)
        elif k == V_FLOAT:
            vb.f = np.full(n, float(p), dtype=np.float64)
            vb.s = np.full(n, p, dtype=object)
        elif k == V_STR:
            vb.s = np.full(n, p, dtype=object)
        elif k == V_ARRAY:
            vb.arr = np.full(n, None, dtype=object)
            vb.arr[:] = [p] * n
        return vb

    @staticmethod
    def from_bool(mask: np.ndarray) -> "VBatch":
        n = len(mask)
        return VBatch(n, np.full(n, V_BOOL, dtype=np.int8), b=np.ascontiguousarray(mask, dtype=bool))

    @staticmethod
    def nulls(n: int) -> "VBatch":
        return VBatch(n, np.full(n, V_NULL, dtype=np.int8), scalar=(V_NULL, None))

    @staticmethod
    def from_strings(values: np.ndarray, valid: Optional[np.ndarray] = None) -> "VBatch":
        """Object array of python strings (+ optional validity mask)."""
        n = len(values)
        if valid is None:
            kind = np.full(n, V_STR, dtype=np.int8)
        else:
            kind = np.where(valid, V_STR, V_NULL).astype(np.int8)
        s = np.asarray(values, dtype=object)
        return VBatch(n, kind, s=s)

    @staticmethod
    def from_arrow(col: pa.ChunkedArray | pa.Array) -> "VBatch":
        """Typed Arrow column → VBatch. Mirrors ExpressionValue::from_mvt_value
        (expression_compiler.rs:78-96): ints (any width/sign) → Number,
        floats/doubles → Float, strings → String, bools → Boolean,
        null → Null."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        t = col.type
        n = len(col)
        valid = np.asarray(col.is_valid())
        if pa.types.is_integer(t):
            if pa.types.is_uint64(t):
                # reference: `u as i64` — two's-complement wrap, never an
                # overflow (a checked cast to int64 raises on >= 2^63)
                i = (col.fill_null(0).to_numpy(zero_copy_only=False)
                     .astype(np.uint64).view(np.int64))
            else:
                i = (col.cast(pa.int64()).fill_null(0)
                     .to_numpy(zero_copy_only=False).astype(np.int64))
            kind = np.where(valid, V_INT, V_NULL).astype(np.int8)
            return VBatch(n, kind, i=i)
        if pa.types.is_floating(t):
            f = col.cast(pa.float64()).fill_null(0.0).to_numpy(zero_copy_only=False)
            kind = np.where(valid, V_FLOAT, V_NULL).astype(np.int8)
            vb = VBatch(n, kind, f=f)
            if pa.types.is_float32(t):
                # f32 provenance: the reference Displays at f32 precision
                # ('0.1'), so pre-fill the display strings from the f32
                # values before the f64 widening can leak into them
                from .values import fmt_float32_rust

                v32 = (col.fill_null(0.0)
                       .to_numpy(zero_copy_only=False).astype(np.float32))
                s = np.full(n, None, dtype=object)
                bits = np.ascontiguousarray(v32).view(np.uint32)
                uniq, inv = np.unique(bits, return_inverse=True)
                fstr = np.array([fmt_float32_rust(x)
                                 for x in uniq.view(np.float32)], dtype=object)
                sel = np.asarray(valid)
                s[sel] = fstr[inv][sel]
                vb.s = s
                # numeric lane parity: the reference stores the Display
                # STRING and parses it back to f64 for ordering, so the
                # comparable value is float('0.1') — not the raw f32
                # widening 0.10000000149011612 (same rule as tag_value)
                fnum = np.array([float(x) for x in fstr])[inv]
                vb.f = np.where(sel, fnum, 0.0)
            return vb
        if pa.types.is_boolean(t):
            b = col.fill_null(False).to_numpy(zero_copy_only=False).astype(bool)
            kind = np.where(valid, V_BOOL, V_NULL).astype(np.int8)
            return VBatch(n, kind, b=b)
        if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_dictionary(t):
            if pa.types.is_dictionary(t):
                col = col.cast(pa.string())
            s = np.asarray(col.to_pandas(), dtype=object)
            kind = np.where(valid, V_STR, V_NULL).astype(np.int8)
            return VBatch(n, kind, s=s)
        if pa.types.is_null(t):
            return VBatch.nulls(n)
        raise TypeError(f"unsupported Arrow type for expression value: {t}")

    # ---- lazy string forms -------------------------------------------

    def ensure_display(self) -> np.ndarray:
        """Object array of the Rust Display form of every row
        (expression_compiler.rs:111-125)."""
        out = np.full(self.n, "null", dtype=object)
        k = self.kind
        m = k == V_STR
        if m.any():
            out[m] = self.s[m]
        m = k == V_INT
        if m.any():
            out[m] = self.i[m].astype("U")
        m = k == V_FLOAT
        if m.any():
            self._ensure_float_strings()
            out[m] = self.s[m]
        m = k == V_BOOL
        if m.any():
            out[m] = np.where(self.b[m], "true", "false")
        m = k == V_ARRAY
        if m.any():
            out[m] = [display((V_ARRAY, a)) for a in self.arr[m]]
        return out

    def _ensure_float_strings(self):
        if self.s is None:
            self.s = np.full(self.n, None, dtype=object)
        m = self.kind == V_FLOAT
        need = m & np.array([x is None for x in self.s], dtype=bool)
        if need.any():
            # dictionary trick: format unique floats only. Unique runs
            # over BIT PATTERNS: np.unique on the float values collapses
            # -0.0 and +0.0 into one representative, giving one sign of
            # zero the other's display string ('0' vs '-0').
            bits = np.ascontiguousarray(self.f[need]).view(np.uint64)
            uniq, inv = np.unique(bits, return_inverse=True)
            fstr = np.array([fmt_float_rust(x)
                             for x in uniq.view(np.float64)], dtype=object)
            self.s[need] = fstr[inv]

    # ---- truthiness ---------------------------------------------------

    def to_bool_array(self) -> np.ndarray:
        """Vectorized truthiness — expression_compiler.rs:99-108."""
        k = self.kind
        out = np.zeros(self.n, dtype=bool)
        m = k == V_BOOL
        if m.any():
            out[m] = self.b[m]
        m = k == V_STR
        if m.any():
            out[m] = np.array([x != "" for x in self.s[m]], dtype=bool)
        m = k == V_INT
        if m.any():
            out[m] = self.i[m] != 0
        m = k == V_FLOAT
        if m.any():
            # string-form truthiness: falsy iff form is "0" or "0.0";
            # fmt_float_rust yields "0" only for +0.0 and "-0" for -0.0,
            # so numerically: truthy unless (x == 0 and not signbit).
            x = self.f[m]
            out[m] = (x != 0.0) | np.signbit(x)
        m = k == V_ARRAY
        if m.any():
            out[m] = np.array([len(a) != 0 for a in self.arr[m]], dtype=bool)
        return out

    def row_value(self, idx: int) -> Value:
        k = int(self.kind[idx])
        if k == V_NULL:
            return (V_NULL, None)
        if k == V_BOOL:
            return (V_BOOL, bool(self.b[idx]))
        if k == V_INT:
            return (V_INT, int(self.i[idx]))
        if k == V_FLOAT:
            self._ensure_float_strings()
            return (V_FLOAT, self.s[idx])
        if k == V_STR:
            return (V_STR, self.s[idx])
        return (V_ARRAY, self.arr[idx])


# ---- vectorized comparison (executor.rs:200-235) ----------------------


def compare_batches(L: VBatch, R: VBatch) -> np.ndarray:
    """int8[n] in {-1, 0, 1} — the reference's compare_values per row."""
    n = L.n
    out = np.zeros(n, dtype=np.int8)
    lk, rk = L.kind, R.kind

    lnull = lk == V_NULL
    rnull = rk == V_NULL
    out[lnull & ~rnull] = -1
    out[~lnull & rnull] = 1
    done = lnull | rnull

    def sign_into(mask, a, b):
        out[mask] = np.sign(a - b).astype(np.int8)

    m = ~done & (lk == V_BOOL) & (rk == V_BOOL)
    if m.any():
        sign_into(m, L.b[m].astype(np.int8), R.b[m].astype(np.int8))
    done |= m

    m = ~done & (lk == V_INT) & (rk == V_INT)
    if m.any():
        li, ri = L.i[m], R.i[m]
        out[m] = ((li > ri).astype(np.int8) - (li < ri).astype(np.int8))
    done |= m

    # numeric float arms: Float×Float, Number×Float, Float×Number
    lnum = (lk == V_INT) | (lk == V_FLOAT)
    rnum = (rk == V_INT) | (rk == V_FLOAT)
    m = ~done & lnum & rnum & ((lk == V_FLOAT) | (rk == V_FLOAT))
    if m.any():
        msum = int(m.sum())
        a = np.zeros(msum, dtype=np.float64)
        b = np.zeros(msum, dtype=np.float64)
        sel = lk[m] == V_FLOAT
        if sel.any():
            a[sel] = L.f[m][sel]
        sel = lk[m] == V_INT
        if sel.any():
            a[sel] = L.i[m][sel].astype(np.float64)
        sel = rk[m] == V_FLOAT
        if sel.any():
            b[sel] = R.f[m][sel]
        sel = rk[m] == V_INT
        if sel.any():
            b[sel] = R.i[m][sel].astype(np.float64)
        r = np.zeros(msum, dtype=np.int8)
        with np.errstate(invalid="ignore"):
            r[a > b] = 1
            r[a < b] = -1
        # NaN on either side → Ordering::Equal (partial_cmp unwrap_or) → 0
        out[m] = r
    done |= m

    m = ~done & (lk == V_STR) & (rk == V_STR)
    if m.any():
        ls = L.s[m].astype("U")
        rs = R.s[m].astype("U")
        out[m] = ((ls > rs).astype(np.int8) - (ls < rs).astype(np.int8))
    done |= m

    # mixed-type fallback: compare Display strings
    m = ~done
    if m.any():
        ls = L.ensure_display()[m].astype("U")
        rs = R.ensure_display()[m].astype("U")
        out[m] = ((ls > rs).astype(np.int8) - (ls < rs).astype(np.int8))
    return out


def _isin_batch(v: VBatch, value_set: frozenset) -> np.ndarray:
    """Vectorized ``in`` — membership is exact tagged-value equality
    (type + string form for floats), executor.rs:132-135."""
    out = np.zeros(v.n, dtype=bool)
    if not value_set:
        return out
    by_kind: Dict[int, set] = {}
    for k, p in value_set:
        by_kind.setdefault(k, set()).add(p)
    kind = v.kind
    if V_NULL in by_kind:
        out |= kind == V_NULL
    if V_BOOL in by_kind:
        m = kind == V_BOOL
        if m.any():
            s = by_kind[V_BOOL]
            out[m] = np.array([x in s for x in v.b[m]], dtype=bool)
    if V_INT in by_kind:
        m = kind == V_INT
        if m.any():
            out[m] = np.isin(v.i[m], np.fromiter(by_kind[V_INT], dtype=np.int64))
    if V_FLOAT in by_kind:
        m = kind == V_FLOAT
        if m.any():
            v._ensure_float_strings()
            s = by_kind[V_FLOAT]
            out[m] = np.array([x in s for x in v.s[m]], dtype=bool)
    if V_STR in by_kind:
        m = kind == V_STR
        if m.any():
            s = by_kind[V_STR]
            out[m] = np.array([x in s for x in v.s[m]], dtype=bool)
    if V_ARRAY in by_kind:
        m = kind == V_ARRAY
        if m.any():
            s = by_kind[V_ARRAY]
            out[m] = np.array([a in s for a in v.arr[m]], dtype=bool)
    return out


def _unique_map(strings: np.ndarray, fn) -> np.ndarray:
    """Apply a python fn over unique values only (dictionary trick)."""
    uniq, inv = np.unique(strings.astype("U"), return_inverse=True)
    mapped = np.array([fn(u) for u in uniq], dtype=object)
    return mapped[inv]


# ---- context ----------------------------------------------------------


class VectorContext:
    """Batch evaluation context. Subclasses provide tag lookup."""

    def __init__(self, n: int, layer_name: str = "", current_key: Optional[VBatch] = None,
                 geometry_type: Optional[VBatch] = None):
        self.n = n
        self.layer_name = layer_name
        self.current_key = current_key
        self.geometry_type = geometry_type

    def lookup_tag(self, name: str) -> VBatch:
        raise NotImplementedError


class ColumnTagContext(VectorContext):
    """Tags held as typed columns (dict name → Arrow column / numpy array /
    prebuilt VBatch). Missing tag → all-null (executor.rs:175-181)."""

    def __init__(self, n: int, columns: Dict[str, object], **kw):
        super().__init__(n, **kw)
        self._cols = columns
        self._cache: Dict[str, VBatch] = {}

    def lookup_tag(self, name: str) -> VBatch:
        vb = self._cache.get(name)
        if vb is None:
            col = self._cols.get(name)
            if col is None:
                vb = VBatch.nulls(self.n)
            elif isinstance(col, VBatch):
                vb = col
            elif isinstance(col, (pa.Array, pa.ChunkedArray)):
                vb = VBatch.from_arrow(col)
            else:
                vb = VBatch.from_arrow(pa.array(col))
            self._cache[name] = vb
        return vb


# ---- evaluator --------------------------------------------------------


def evaluate_vector(expr, ctx: VectorContext) -> VBatch:
    op = expr[0]
    n = ctx.n
    if op == c.OP_LITERAL:
        return VBatch.from_scalar(expr[1], n)
    if op == c.OP_TAG:
        return ctx.lookup_tag(expr[1])
    if op == c.OP_KEY:
        return ctx.current_key if ctx.current_key is not None else VBatch.nulls(n)
    if op == c.OP_TYPE:
        return ctx.geometry_type if ctx.geometry_type is not None else VBatch.nulls(n)
    if op in (c.OP_EQ, c.OP_NE, c.OP_LT, c.OP_GT, c.OP_LE, c.OP_GE):
        cmp = compare_batches(evaluate_vector(expr[1], ctx), evaluate_vector(expr[2], ctx))
        if op == c.OP_EQ:
            return VBatch.from_bool(cmp == 0)
        if op == c.OP_NE:
            return VBatch.from_bool(cmp != 0)
        if op == c.OP_LT:
            return VBatch.from_bool(cmp < 0)
        if op == c.OP_GT:
            return VBatch.from_bool(cmp > 0)
        if op == c.OP_LE:
            return VBatch.from_bool(cmp <= 0)
        return VBatch.from_bool(cmp >= 0)
    if op == c.OP_ANY:
        acc = np.zeros(n, dtype=bool)
        for sub in expr[1]:
            acc |= evaluate_vector(sub, ctx).to_bool_array()
        return VBatch.from_bool(acc)
    if op == c.OP_ALL:
        acc = np.ones(n, dtype=bool)
        for sub in expr[1]:
            acc &= evaluate_vector(sub, ctx).to_bool_array()
        return VBatch.from_bool(acc)
    if op == c.OP_NONE:
        acc = np.zeros(n, dtype=bool)
        for sub in expr[1]:
            acc |= evaluate_vector(sub, ctx).to_bool_array()
        return VBatch.from_bool(~acc)
    if op == c.OP_NOT:
        return VBatch.from_bool(~evaluate_vector(expr[1], ctx).to_bool_array())
    if op == c.OP_IN:
        return VBatch.from_bool(_isin_batch(evaluate_vector(expr[1], ctx), expr[2]))
    if op == c.OP_STARTS:
        disp = evaluate_vector(expr[1], ctx).ensure_display().astype("U")
        return VBatch.from_bool(np.char.startswith(disp, expr[2]))
    if op == c.OP_ENDS:
        disp = evaluate_vector(expr[1], ctx).ensure_display().astype("U")
        return VBatch.from_bool(np.char.endswith(disp, expr[2]))
    if op == c.OP_REGEX_MATCH:
        disp = evaluate_vector(expr[1], ctx).ensure_display()
        rx = expr[2]
        hits = _unique_map(disp, lambda u: rx.search(u) is not None)
        return VBatch.from_bool(hits.astype(bool))
    if op == c.OP_REGEX_CAPTURE:
        disp = evaluate_vector(expr[1], ctx).ensure_display()
        rx, gi = expr[2], expr[3]

        def cap(u):
            m = rx.search(u)
            if m is None or gi > rx.groups:
                return None
            return m.group(gi)

        vals = _unique_map(disp, cap)
        valid = np.array([x is not None for x in vals], dtype=bool)
        return VBatch.from_strings(vals, valid)
    if op == c.OP_BOOLEAN:
        return VBatch.from_bool(evaluate_vector(expr[1], ctx).to_bool_array())
    raise AssertionError(f"unhandled op {op}")


def evaluate_vector_bool(expr, ctx: VectorContext) -> np.ndarray:
    return evaluate_vector(expr, ctx).to_bool_array()
