"""Stream-shaped operators over the bounded events log.

Ray Data has no event-time windows (SURVEY §2.9 — the reference has none
either); the log is treated as a partitioned, ordered table: partition
by key (hash bucket), sort within the group by timestamp, and run the
windowing logic vectorized over the sorted group (the guide's
streaming-shaped pattern). The ordering assumption — events of one user
are processed in ts order — is established BY the groupby, not assumed
of the input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def sessionize(ds, gap_minutes: float = 30.0, user_col: str = "user_id",
               ts_col: str = "ts", num_buckets: int = 64):
    """Session windows: per user, a new session starts when the gap from
    the previous event exceeds `gap_minutes`. Emits one row per session:
    (user_id, session_start, n_events, duration_sec).

    Plan: bucket by USER HASH (distinct group count = num_buckets, not
    user cardinality — a per-user groupby walks one Python group per
    distinct user, millions at scale), sort within the bucket by
    (user, ts), then sessionize EVERY user in one vectorized pass:
    session breaks = user change OR gap exceeded; per-session aggregates
    fall out of the break offsets (no per-session loop). Scales with
    bucket count; a hot user stays one contiguous segment."""
    from .shuffle import add_bucket_column

    gap = np.timedelta64(int(gap_minutes * 60 * 1_000_000), "us")

    bucketed = ds.map_batches(
        lambda b: add_bucket_column(b, [user_col], num_buckets),
        batch_format="pyarrow")

    def sessions(g: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(
            g, sort_keys=[(user_col, "ascending"), (ts_col, "ascending")])
        g = g.take(idx)
        users = np.asarray(g[user_col].to_pandas())
        ts = g[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        n = len(users)
        utype = g.schema.field(user_col).type
        if n == 0:
            # MUST mirror the non-empty branch's types, not the input
            # schema: ts is force-cast to datetime64[us] below, so a
            # timestamp[ns] input would give this branch a different
            # session_start type and break block schema unification
            return pa.table({
                user_col: pa.array([], utype),
                "session_start": pa.array(
                    np.array([], dtype="datetime64[us]")),
                "n_events": pa.array([], pa.int64()),
                "duration_sec": pa.array([], pa.float64())})
        new = np.ones(n, dtype=bool)
        if n > 1:
            same_user = users[1:] == users[:-1]
            within = (ts[1:] - ts[:-1]) <= gap
            new[1:] = ~(same_user & within)
        starts = np.nonzero(new)[0]
        ends = np.concatenate([starts[1:], [n]])
        dur = (ts[ends - 1] - ts[starts]) / np.timedelta64(1, "s")
        return pa.table({
            user_col: pa.array(users[starts]).cast(utype),
            "session_start": pa.array(ts[starts]),
            "n_events": pa.array((ends - starts).astype(np.int64)),
            "duration_sec": pa.array(dur.astype(np.float64), pa.float64()),
        })

    return bucketed.groupby("bucket").map_groups(sessions, batch_format="pyarrow")


def tumbling_window(ds, minutes: int, key_col: str = "event_type",
                    ts_col: str = "ts", value_col: str = "value"):
    """Tumbling fixed windows by (key, window): two-phase — in-batch
    floor-to-window partial aggregation, then the bucketed merge."""
    from .shuffle import two_phase_aggregate

    us = minutes * 60 * 1_000_000

    def window(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].to_numpy(zero_copy_only=False)
        w = (ts.astype("datetime64[us]").astype(np.int64) // us) * us
        return pa.table({
            key_col: batch[key_col],
            "window_start": pa.array(w.astype("datetime64[us]")),
            value_col: batch[value_col],
        })

    return two_phase_aggregate(
        ds.map_batches(window, batch_format="pyarrow"),
        keys=[key_col, "window_start"],
        partial_aggs=[(value_col, "sum"), (value_col, "count")],
        partial_names=["vsum", "vcount"],
        final_aggs=[("vsum", "sum"), ("vcount", "sum")],
        final_names=["total_raw", "n"])


# ---- broadcast semi / anti joins --------------------------------------


def broadcast_semi_join(ds, key_col: str, key_set_ref, anti: bool = False):
    """Semi (or anti) join against a broadcast key set: `ray.put` the
    (small) key set once; each batch filters with a vectorized isin —
    no shuffle at all (the guide's semi/anti pattern)."""
    import ray

    cache = {}

    def f(batch: pa.Table) -> pa.Table:
        ks = cache.get("k")
        if ks is None:
            ks = cache["k"] = np.asarray(sorted(ray.get(key_set_ref)))
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        m = np.isin(keys, ks)
        if anti:
            m = ~m
        return batch.filter(pa.array(m))

    return ds.map_batches(f, batch_format="pyarrow")


def distinct_values(ds, col: str, num_buckets: int = 16):
    """Distinct values of one column without ds.unique()'s per-key
    Python: per-block Arrow unique → bucketed exchange → per-bucket
    unique."""
    from .shuffle import add_bucket_column

    def local(batch: pa.Table) -> pa.Table:
        u = batch[col].combine_chunks().unique() if isinstance(
            batch[col], pa.ChunkedArray) else batch[col].unique()
        return pa.table({col: u})

    partial = ds.map_batches(
        lambda b: local(b), batch_format="pyarrow")
    bucketed = partial.map_batches(
        lambda b: add_bucket_column(b, [col], num_buckets), batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        u = g[col].combine_chunks().unique() if isinstance(
            g[col], pa.ChunkedArray) else g[col].unique()
        return pa.table({col: u})

    return (bucketed.groupby("bucket")
            .map_groups(merge, batch_format="pyarrow")
            .map_batches(lambda b: b.select([col]), batch_format="pyarrow"))


def path_length(ds, user_col: str = "user_id", ts_col: str = "ts",
                lon_col: str = "lon", lat_col: str = "lat",
                order_col: str = "event_id", num_buckets: int = 64):
    """Per-user planar path length over a positioned event log: order
    each user's events by (ts, order_col), sum the consecutive-leg
    distances sqrt(dlon² + dlat²). Emits (user_id, path_nano, n_legs)
    for users with ≥ 2 events.

    Same plan as sessionize: bucket by USER HASH, one vectorized pass
    per bucket (sort → diff → mask user boundaries → reduceat segment
    sums) — never a per-user Python group. Legs are quantized to int64
    NANODEGREES (floor(leg · 1e9)) before summing so the per-user total
    is addition-order independent and bit-equal to the SQL oracle's
    window-function derivation (float sums would differ by reduction
    tree). Overflow bound: a leg is < 509°·1e9 < 2^39, so int64 holds
    > 1.8e7 legs per user."""
    from .shuffle import add_bucket_column

    bucketed = ds.map_batches(
        lambda b: add_bucket_column(b, [user_col], num_buckets),
        batch_format="pyarrow")

    def legs(g: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(
            g, sort_keys=[(user_col, "ascending"), (ts_col, "ascending"),
                          (order_col, "ascending")])
        g = g.take(idx)
        users = g[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lon = g[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = g[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(users)
        if n == 0:
            return pa.table({user_col: pa.array([], pa.int64()),
                             "path_nano": pa.array([], pa.int64()),
                             "n_legs": pa.array([], pa.int64())})
        same = np.zeros(n, dtype=bool)
        same[1:] = users[1:] == users[:-1]
        dlon = np.zeros(n, dtype=np.float64)
        dlat = np.zeros(n, dtype=np.float64)
        dlon[1:] = lon[1:] - lon[:-1]
        dlat[1:] = lat[1:] - lat[:-1]
        leg = np.floor(np.sqrt(dlon * dlon + dlat * dlat) * 1e9)
        contrib = np.where(same, leg, 0.0).astype(np.int64)
        starts = np.nonzero(~same)[0]
        path = np.add.reduceat(contrib, starts)
        nlegs = np.add.reduceat(same.astype(np.int64), starts)
        keep = nlegs > 0
        return pa.table({
            user_col: pa.array(users[starts][keep], pa.int64()),
            "path_nano": pa.array(path[keep], pa.int64()),
            "n_legs": pa.array(nlegs[keep], pa.int64())})

    return bucketed.groupby("bucket").map_groups(legs, batch_format="pyarrow")


def funnel_depth(ds, steps, user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type", num_buckets: int = 64):
    """Ordered funnel analysis: for each user, how deep into the step
    sequence they progressed, where step i+1 counts only at a timestamp
    >= the earliest qualifying time of step i (the classic
    event-analytics funnel; >= keeps the semantics total and
    tie-stable). Emits (user_id, depth) for users who reached step 1.

    Plan: user-hash buckets (the sessionize-family shape), then per
    bucket ONE sort and |steps| vectorized masked-min passes
    (minimum.reduceat per user segment) — no per-user Python, no join:
    each pass reuses the previous step's per-user threshold."""
    from .shuffle import add_bucket_column

    steps = list(steps)
    bucketed = ds.map_batches(
        lambda b: add_bucket_column(b, [user_col], num_buckets),
        batch_format="pyarrow")

    def depths(g: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(
            g, sort_keys=[(user_col, "ascending"), (ts_col, "ascending")])
        g = g.take(idx)
        users = g[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g[ts_col].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        types = np.asarray(g[type_col].to_pandas(), dtype=object)
        n = len(users)
        if n == 0:
            return pa.table({user_col: pa.array([], pa.int64()),
                             "depth": pa.array([], pa.int64())})
        new = np.ones(n, dtype=bool)
        new[1:] = users[1:] != users[:-1]
        starts = np.nonzero(new)[0]
        seg = np.cumsum(new) - 1          # row → user segment index
        big = np.int64(np.iinfo(np.int64).max)
        thresh = np.full(len(starts), -np.iinfo(np.int64).max - 1,
                         dtype=np.int64)  # step-0 threshold: -inf
        depth = np.zeros(len(starts), dtype=np.int64)
        for si, step in enumerate(steps):
            ok = (types == step) & (ts >= thresh[seg])
            cand = np.where(ok, ts, big)
            tmin = np.minimum.reduceat(cand, starts)
            reached = tmin < big
            depth[reached & (depth == si)] = si + 1
            thresh = np.where(reached, tmin, big)  # unreached: block next
        keep = depth >= 1
        return pa.table({
            user_col: pa.array(users[starts][keep], pa.int64()),
            "depth": pa.array(depth[keep], pa.int64())})

    return bucketed.groupby("bucket").map_groups(
        depths, batch_format="pyarrow")


def burst_counts(ds, window_seconds: float = 21_600.0,
                 user_col: str = "user_id", ts_col: str = "ts",
                 num_buckets: int = 64):
    """Per-user MAX burst rate (the bot / abuse-rate detector of event
    pipelines): for every event, the number of the same user's events in
    [ts, ts + window) — boundary exclusive on the right — and per user
    the maximum such count plus the total event count.

    Plan: user-hash buckets like sessionize (group count = num_buckets,
    never user cardinality); inside a bucket ONE vectorized pass for
    every user at once — sort by (user, ts), shift each user's
    timestamps into a disjoint numeric range (segment stride > span +
    window), then a single global searchsorted pair yields the
    per-event window counts and maximum.reduceat the per-user maxima.
    No per-user Python loop; a hot user is one contiguous segment."""
    from .shuffle import add_bucket_column

    win = np.int64(int(window_seconds * 1_000_000))

    bucketed = ds.map_batches(
        lambda b: add_bucket_column(b, [user_col], num_buckets),
        batch_format="pyarrow")

    def bursts(g: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(
            g, sort_keys=[(user_col, "ascending"), (ts_col, "ascending")])
        g = g.take(idx)
        users = g[user_col].to_numpy(zero_copy_only=False)
        ts = g[ts_col].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        n = len(users)
        if n == 0:
            return pa.table({
                user_col: g[user_col],
                "max_burst": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64())})
        chg = users[1:] != users[:-1]
        starts = np.flatnonzero(np.concatenate(([True], chg)))
        seg = np.cumsum(np.concatenate(([False], chg))).astype(np.int64)
        # shift each user's times into a disjoint range so one global
        # searchsorted respects user boundaries. Times are rebased to
        # the USER's own first event and the stride is the max PER-USER
        # span (not the bucket's global span) — with a global-span
        # stride, users-per-bucket × bucket-span overflows int64 at
        # ~20M users × 1 year and silently wraps; per-user rebasing
        # defers that by orders of magnitude, and the explicit guard
        # below refuses rather than wrap if it is ever still exceeded.
        rel = ts - ts[starts][seg]
        stride = np.int64(int(rel.max()) + int(win) + 1)
        if int(seg[-1]) * int(stride) + int(rel.max()) + int(win) \
                >= (1 << 63):
            raise OverflowError(
                "burst_counts: users-per-bucket x max-user-span "
                "exceeds the int64 shift range; raise num_buckets")
        shifted = rel + seg * stride
        lo = np.searchsorted(shifted, shifted, side="left")
        hi = np.searchsorted(shifted, shifted + win, side="left")
        counts = (hi - lo).astype(np.int64)
        maxima = np.maximum.reduceat(counts, starts)
        totals = np.diff(np.concatenate((starts, [n]))).astype(np.int64)
        return pa.table({
            user_col: g[user_col].take(pa.array(starts, pa.int64())),
            "max_burst": pa.array(maxima, pa.int64()),
            "n_events": pa.array(totals, pa.int64())})

    return bucketed.groupby("bucket").map_groups(
        bursts, batch_format="pyarrow")


def event_transitions(ds, user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type",
                      order_col: str = "event_id", num_buckets: int = 64):
    """First-order Markov transition counts over the event log: order
    each user's events by (ts, order_col), count every consecutive
    (prev_type → next_type) pair globally. Emits
    (prev_type, next_type, n) — the transition-matrix numerator behind
    next-event prediction and session modeling.

    Plan: user-hash buckets (the sessionize-family shape); per bucket
    ONE sort + shift + factorized bincount — no per-user Python; each
    bucket emits its already-reduced (prev, next, n) partials, and one
    tiny two-phase grouped sum (keys bounded by |event_type|²) merges
    them. User event sequences never cross buckets, so the per-bucket
    counts partition the global pair multiset exactly."""
    from .shuffle import add_bucket_column, two_phase_aggregate

    bucketed = ds.map_batches(
        lambda b: add_bucket_column(b, [user_col], num_buckets),
        batch_format="pyarrow")

    def pair_counts(g: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(
            g, sort_keys=[(user_col, "ascending"), (ts_col, "ascending"),
                          (order_col, "ascending")])
        g = g.take(idx)
        users = g[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        types = np.asarray(g[type_col].to_pandas(), dtype=object)
        n = len(users)
        empty = pa.table({"prev_type": pa.array([], pa.string()),
                          "next_type": pa.array([], pa.string()),
                          "pn": pa.array([], pa.int64())})
        if n < 2:
            return empty
        same = users[1:] == users[:-1]
        prev = types[:-1][same]
        nxt = types[1:][same]
        if len(prev) == 0:
            return empty
        uniq, codes = np.unique(np.concatenate([prev, nxt]),
                                return_inverse=True)
        pc_, nc_ = codes[:len(prev)], codes[len(prev):]
        combo = pc_ * len(uniq) + nc_
        counts = np.bincount(combo, minlength=len(uniq) * len(uniq))
        hot = np.nonzero(counts)[0]
        return pa.table({
            "prev_type": pa.array(uniq[hot // len(uniq)], pa.string()),
            "next_type": pa.array(uniq[hot % len(uniq)], pa.string()),
            "pn": pa.array(counts[hot], pa.int64())})

    partials = bucketed.groupby("bucket").map_groups(
        pair_counts, batch_format="pyarrow")
    return two_phase_aggregate(
        partials.map_batches(
            lambda b: b.drop_columns(
                [c for c in ("bucket",) if c in b.column_names]),
            batch_format="pyarrow"),
        keys=["prev_type", "next_type"],
        partial_aggs=[("pn", "sum")], partial_names=["pn"],
        final_aggs=[("pn", "sum")], final_names=["n"],
        num_buckets=8)
