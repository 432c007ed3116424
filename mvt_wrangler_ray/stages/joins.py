"""Custom temporal joins Ray Data lacks natively (the build brief's
"as-of join, range join" custom-operator row), expressed as bucketed
map_groups compositions — the partitioning assumption is explicit:
rows co-locate by key hash (as-of) or by coarse time bucket (range),
and every row moves exactly once.

asof_join_bucketed — for each left row, the LATEST right row with
    right.on <= left.on within the same key (backward as-of). Vectorized
    per bucket: both sides sort by (key, on); a dense (key_rank, ts_rank)
    composite makes one np.searchsorted resolve every left row at once —
    no per-key Python.

range_join_bucketed — inner join of points to the intervals containing
    them. Intervals replicate to every coarse time bucket they overlap
    (flat-map), points route to their bucket, and each bucket does a
    vectorized containment test. bucket_span trades replication factor
    against per-bucket fanout; choose it ~ the typical interval length.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _asof_bucket(g: pa.Table, by: str, on: str, right_cols, suffix: str):
    side = g["_side"].to_numpy(zero_copy_only=False)
    left = g.filter(pa.array(side == 0))
    right = g.filter(pa.array(side == 1))
    n = len(left)
    if n == 0:
        return None
    # keys stay in their native dtype: the rank construction below only
    # needs sortable+equatable values, so string/float keys work too (an
    # int64 cast here crashed strings and silently truncated floats)
    lk = left[by].to_numpy(zero_copy_only=False)
    lt = left[on].to_numpy(zero_copy_only=False)
    out_cols = {c: left[c] for c in left.column_names
                if c not in ("_side", "bucket") and not c.endswith("_r_tmp")}
    if len(right) == 0:
        for c in right_cols:
            out_cols[c + suffix] = pa.nulls(n, g.schema.field(c + "_r_tmp").type)
        return pa.table(out_cols)
    rk = right[by].to_numpy(zero_copy_only=False)
    rt = right[on].to_numpy(zero_copy_only=False)
    r_order = np.lexsort((rt, rk))
    rk, rt = rk[r_order], rt[r_order]

    # dense composite: key rank over the union, ts rank over right's ts
    all_keys = np.unique(np.concatenate([lk, rk]))
    lkr = np.searchsorted(all_keys, lk)
    rkr = np.searchsorted(all_keys, rk)
    ts_sorted = np.sort(rt)
    ltr = np.searchsorted(ts_sorted, lt, side="right")
    rtr = np.searchsorted(ts_sorted, rt, side="right")
    M = np.int64(len(rt) + 2)
    rcomp = rkr.astype(np.int64) * M + rtr.astype(np.int64)
    lcomp = lkr.astype(np.int64) * M + ltr.astype(np.int64)
    idx = np.searchsorted(rcomp, lcomp, side="right") - 1
    valid = (idx >= 0)
    safe = np.clip(idx, 0, len(rk) - 1)
    valid &= rk[safe] == lk
    for c in right_cols:
        vals = right[c + "_r_tmp"].combine_chunks().take(
            pa.array(r_order[safe], pa.int64()))
        out_cols[c + suffix] = pa.compute.if_else(
            pa.array(valid), vals, pa.nulls(n, vals.type))
    return pa.table(out_cols)


def asof_join_bucketed(left, right, by: str, on: str,
                       right_cols=("ts",), suffix: str = "_asof",
                       num_buckets: int = 64):
    """Backward as-of join (latest right.on <= left.on per key). Both
    sides hash-bucket by `by`; one groupby co-locates them; each bucket
    resolves vectorized. right_cols are carried onto the left rows with
    `suffix` (null when no right row precedes)."""
    from .shuffle import add_bucket_column

    right_cols = list(right_cols)
    # resolve both schemas ONCE — calling .schema() inside the batch
    # closures would trigger a limit-1 execution of the other pipeline
    # PER BATCH
    rschema = right.schema()
    rtype = dict(zip(rschema.names, rschema.types))
    lschema = left.schema()
    lnames = list(lschema.names)
    ltype = dict(zip(lschema.names, lschema.types))

    def tag_left(b: pa.Table) -> pa.Table:
        b = add_bucket_column(b, [by], num_buckets)
        for c in right_cols:
            b = b.append_column(c + "_r_tmp", pa.nulls(len(b), rtype[c]))
        return b.append_column("_side", pa.array(np.zeros(len(b), np.int8)))

    def tag_right(b: pa.Table) -> pa.Table:
        out = {by: b[by], on: b[on]}
        for c in right_cols:
            out[c + "_r_tmp"] = b[c]
        t = pa.table(out)
        # align to the left schema: missing left columns become nulls
        for c in lnames:
            if c not in t.column_names:
                t = t.append_column(c, pa.nulls(len(t), ltype[c]))
        t = add_bucket_column(t, [by], num_buckets)
        return t.append_column("_side", pa.array(np.ones(len(t), np.int8)))

    def reorder(b: pa.Table) -> pa.Table:
        return b.select(sorted(b.column_names))

    l_tagged = left.map_batches(tag_left, batch_format="pyarrow").map_batches(
        reorder, batch_format="pyarrow")
    r_tagged = right.map_batches(tag_right, batch_format="pyarrow").map_batches(
        reorder, batch_format="pyarrow")

    def run(g: pa.Table) -> pa.Table:
        out = _asof_bucket(g, by, on, right_cols, suffix)
        if out is None:
            # empty left side in this bucket: emit an empty table with
            # the output schema
            cols = {c: pa.array([], g.schema.field(c).type)
                    for c in g.column_names
                    if c not in ("_side", "bucket") and not c.endswith("_r_tmp")}
            for c in right_cols:
                cols[c + suffix] = pa.array([], g.schema.field(c + "_r_tmp").type)
            return pa.table(cols)
        return out

    return (l_tagged.union(r_tagged)
            .groupby("bucket").map_groups(run, batch_format="pyarrow"))


def _stab_pairs(t: np.ndarray, lo: np.ndarray, hi: np.ndarray,
                cand_budget: int = 1 << 22):
    """Exact interval-stabbing pairs (lo <= t < hi) without the dense
    points×intervals boolean matrix (a hot bucket with many long
    overlapping intervals made that allocation quadratic).

    Intervals sort by lo once; each point's candidates are the sorted
    prefix with lo <= t, filtered by hi > t. Enumeration runs in point
    chunks whose total candidate count stays under ``cand_budget``, so
    peak memory is O(budget) regardless of skew; total work is
    sum(prefix sizes) ≥ output but ≤ points×intervals, and the exact
    per-point match counts come first from two searchsorteds (#lo<=t
    minus #hi<=t — valid because lo < hi makes "dead" imply "started")."""
    n = len(t)
    order_lo = np.argsort(lo, kind="stable")
    lo_s, hi_s = lo[order_lo], hi[order_lo]
    cnt_lo = np.searchsorted(lo_s, t, side="right")
    total_cand = int(cnt_lo.sum())
    if total_cand == 0:
        z = np.array([], dtype=np.int64)
        return z, z
    csum = np.cumsum(cnt_lo)
    pi_parts, ri_parts = [], []
    start = 0
    while start < n:
        base = int(csum[start - 1]) if start else 0
        end = int(np.searchsorted(csum, base + cand_budget, side="right"))
        end = max(end, start + 1)
        cl = cnt_lo[start:end]
        tot = int(cl.sum())
        if tot:
            row = np.repeat(np.arange(start, end, dtype=np.int64), cl)
            starts = np.cumsum(cl) - cl
            cand = np.arange(tot, dtype=np.int64) - np.repeat(starts, cl)
            keep = hi_s[cand] > t[row]
            pi_parts.append(row[keep])
            ri_parts.append(order_lo[cand[keep]])
        start = end
    return (np.concatenate(pi_parts) if pi_parts else np.array([], np.int64),
            np.concatenate(ri_parts) if ri_parts else np.array([], np.int64))


def range_join_bucketed(points, ranges, on: str, lo_col: str, hi_col: str,
                        range_cols=("range_id",), bucket_span: int = None):
    """Inner join point rows to interval rows with lo <= on < hi.
    Intervals replicate to every `bucket_span`-sized time bucket they
    overlap; points route to one bucket; per-bucket vectorized
    containment emits the pairs. Works on int64-comparable columns
    (e.g. epoch microseconds)."""
    range_cols = list(range_cols)
    if bucket_span is None:
        raise ValueError("bucket_span is required (pick ~ interval length)")

    def tag_points(b: pa.Table) -> pa.Table:
        t = b[on].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "tbucket", pa.array(t // bucket_span, pa.int64())).append_column(
            "_side", pa.array(np.zeros(len(b), np.int8)))

    def explode_ranges(b: pa.Table) -> pa.Table:
        lo = b[lo_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = b[hi_col].to_numpy(zero_copy_only=False).astype(np.int64)
        first = lo // bucket_span
        last = np.maximum(hi - 1, lo) // bucket_span
        reps = (last - first + 1).astype(np.int64)
        row_idx = np.repeat(np.arange(len(b)), reps)
        offs = np.concatenate([np.arange(r) for r in reps]) if len(b) else \
            np.array([], dtype=np.int64)
        buckets = first[row_idx] + offs
        cols = {"tbucket": pa.array(buckets, pa.int64()),
                lo_col: pa.array(lo[row_idx], pa.int64()),
                hi_col: pa.array(hi[row_idx], pa.int64())}
        for c in range_cols:
            cols[c] = b[c].combine_chunks().take(pa.array(row_idx, pa.int64()))
        t = pa.table(cols)
        return t.append_column("_side", pa.array(np.ones(len(t), np.int8)))

    p_tagged = points.map_batches(tag_points, batch_format="pyarrow")
    r_tagged = ranges.map_batches(explode_ranges, batch_format="pyarrow")

    pnames = points.schema().names
    ptypes = points.schema().types
    rtypes = {c: ranges.schema().types[ranges.schema().names.index(c)]
              for c in range_cols}

    def align(b: pa.Table) -> pa.Table:
        cols = {}
        for c, t in zip(pnames, ptypes):
            cols[c] = b[c] if c in b.column_names else pa.nulls(len(b), t)
        for c in (lo_col, hi_col):
            cols[c] = b[c] if c in b.column_names else pa.nulls(len(b), pa.int64())
        for c, t in rtypes.items():
            cols[c] = b[c] if c in b.column_names else pa.nulls(len(b), t)
        cols["tbucket"] = b["tbucket"]
        cols["_side"] = b["_side"]
        return pa.table(cols)

    unioned = (p_tagged.map_batches(align, batch_format="pyarrow")
               .union(r_tagged.map_batches(align, batch_format="pyarrow")))

    def join_bucket(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        pts = g.filter(pa.array(side == 0))
        rng = g.filter(pa.array(side == 1))
        out_schema = {c: g.schema.field(c).type for c in pnames}
        for c in range_cols:
            out_schema[c] = g.schema.field(c).type
        if len(pts) == 0 or len(rng) == 0:
            return pa.table({c: pa.array([], t) for c, t in out_schema.items()})
        t = pts[on].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = rng[lo_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = rng[hi_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pi, ri = _stab_pairs(t, lo, hi)
        cols = {}
        for c in pnames:
            cols[c] = pts[c].combine_chunks().take(pa.array(pi, pa.int64()))
        for c in range_cols:
            cols[c] = rng[c].combine_chunks().take(pa.array(ri, pa.int64()))
        return pa.table(cols)

    return unioned.groupby("tbucket").map_groups(
        join_bucket, batch_format="pyarrow")
