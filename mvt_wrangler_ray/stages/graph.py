"""Iterative graph algorithms over edge Datasets: PageRank.

PageRank is the canonical "iterative joins + aggregates" workload a
data engine must express without driver-side loops over rows: each
iteration is one edge⋈ranks join plus one grouped sum, both streaming.
No reference-repo counterpart (the reference is a tile engine); this
extends the large-scale-pipeline surface like stages/dedup.py.

All rank arithmetic is integer fixed-point (scale 1e12, damping as a
ratio 85/100) so per-node sums are order-independent and the DuckDB
oracle (the same 5 iterations unrolled as CTEs) is bit-exact:

    r0(v)   = S // N
    contrib = (r(u) * 85) // (100 * outdeg(u))      per edge u→v
    r'(v)   = (S * 15) // (100 * N) + Σ contrib

Dangling nodes (outdeg 0) never appear: nodes are DEFINED as edge
sources, so callers wanting undirected semantics emit both directions.

Scale plan: ranks live in a Dataset keyed by node. Below
``broadcast_nodes_limit`` each iteration ships the (node → r, outdeg)
table once via ray.put and the join is a vectorized map_batches lookup
over the streaming edges; above it the plan cuts over to bucketed hash
joins (nothing driver-resident). The grouped sum is always the
two-phase bucketed exchange (partials combined inside map_batches
before the shuffle).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["pagerank", "cooccurrence_edges", "triangle_counts",
           "cooccurrence_pair_counts"]

SCALE = 10**12


def pagerank(edges, iterations: int = 5, damping_num: int = 85,
             damping_den: int = 100, num_buckets: int = 64,
             broadcast_nodes_limit: int = 5_000_000):
    """PageRank over an edge Dataset with columns (src:int64, dst:int64).

    Returns a Dataset (node:int64, rank_int:int64, rank:float64) where
    rank_int is the fixed-point value (scale 1e12) and rank is the
    single deterministic float division rank_int / 1e12.
    """
    import ray
    import ray.data

    from .shuffle import bucketed_hash_join, two_phase_aggregate

    # every iteration scans the edges: pin the blocks once (Ray spills
    # if they don't fit) instead of re-running the upstream plan 5x
    edges = edges.materialize()

    deg = two_phase_aggregate(
        edges.map_batches(lambda t: t.select(["src"]),
                          batch_format="pyarrow"),
        keys=["src"],
        partial_aggs=[("src", "count")], partial_names=["pc"],
        final_aggs=[("pc", "sum")], final_names=["outdeg"]).materialize()
    n_nodes = int(deg.count())
    base = (SCALE * (damping_den - damping_num)) // (damping_den * n_nodes)
    r0 = SCALE // n_nodes

    if n_nodes <= broadcast_nodes_limit:
        # broadcast lane: the rank table fits the driver (that is what
        # the limit MEANS), so per iteration the only cluster work is
        # one streaming pass over the edges plus the small contribution
        # exchange — no ranks Dataset is rebuilt or re-collected
        ddf = deg.to_pandas()
        nodes = ddf["src"].to_numpy().astype(np.int64)
        order = np.argsort(nodes, kind="stable")
        nodes = nodes[order]
        outdeg = ddf["outdeg"].to_numpy().astype(np.int64)[order]
        r = np.full(n_nodes, r0, dtype=np.int64)

        for _ in range(iterations):
            rd_ref = ray.put((nodes, np.stack([r, outdeg], axis=1)))
            cache: dict = {}

            def contrib(batch: pa.Table, _ref=rd_ref) -> pa.Table:
                st = cache.get(id(_ref))
                if st is None:
                    st = cache[id(_ref)] = ray.get(_ref)
                nd, rd = st
                src = batch["src"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(nd, src)
                c = (rd[pos, 0] * damping_num) // (damping_den * rd[pos, 1])
                return pa.table({
                    "dst": batch["dst"].combine_chunks().cast(pa.int64()),
                    "c": pa.array(c, pa.int64())})

            sdf = two_phase_aggregate(
                edges.map_batches(contrib, batch_format="pyarrow"),
                keys=["dst"],
                partial_aggs=[("c", "sum")], partial_names=["ps"],
                final_aggs=[("ps", "sum")], final_names=["s"],
                num_buckets=num_buckets).to_pandas()
            pos = np.searchsorted(
                nodes, sdf["dst"].to_numpy().astype(np.int64))
            r = np.full(n_nodes, base, dtype=np.int64)
            r[pos] += sdf["s"].to_numpy().astype(np.int64)

        out = pa.table({
            "node": pa.array(nodes, pa.int64()),
            "rank_int": pa.array(r, pa.int64()),
            "rank": pa.array(r.astype(np.float64) / 1.0e12, pa.float64())})
        return ray.data.from_arrow(out)

    def seed(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["src"].combine_chunks().cast(pa.int64()),
            "outdeg": batch["outdeg"].combine_chunks().cast(pa.int64()),
            "r": pa.array(np.full(len(batch), r0, np.int64), pa.int64())})

    ranks = deg.map_batches(seed, batch_format="pyarrow").materialize()

    for _ in range(iterations):
        joined = bucketed_hash_join(
            edges, ranks.map_batches(
                lambda t: t.rename_columns(["src", "outdeg", "r"]),
                batch_format="pyarrow"),
            "src", "src", num_buckets=num_buckets)

        def contrib_j(batch: pa.Table) -> pa.Table:
            r = batch["r"].to_numpy(zero_copy_only=False)
            od = batch["outdeg"].to_numpy(zero_copy_only=False)
            c = (r * damping_num) // (damping_den * od)
            return pa.table({
                "dst": batch["dst"].combine_chunks().cast(pa.int64()),
                "c": pa.array(c, pa.int64())})

        contribs = joined.map_batches(contrib_j, batch_format="pyarrow")

        sums = two_phase_aggregate(
            contribs, keys=["dst"],
            partial_aggs=[("c", "sum")], partial_names=["ps"],
            final_aggs=[("ps", "sum")], final_names=["s"],
            num_buckets=num_buckets)

        nxt = bucketed_hash_join(
            ranks.map_batches(lambda t: t.select(["node", "outdeg"]),
                              batch_format="pyarrow"),
            sums.map_batches(
                lambda t: t.rename_columns(["node", "s"]),
                batch_format="pyarrow"),
            "node", "node", num_buckets=num_buckets, how="left")

        def advance_j(batch: pa.Table) -> pa.Table:
            s = batch["s"].to_numpy(zero_copy_only=False)
            s = np.where(np.isnan(s.astype(np.float64)), 0,
                         s).astype(np.int64) if s.dtype != np.int64 \
                else s
            return pa.table({
                "node": batch["node"].combine_chunks().cast(pa.int64()),
                "outdeg":
                    batch["outdeg"].combine_chunks().cast(pa.int64()),
                "r": pa.array(base + s, pa.int64())})

        ranks = nxt.map_batches(advance_j,
                                batch_format="pyarrow").materialize()

    def finalize(batch: pa.Table) -> pa.Table:
        r = batch["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "node": batch["node"].combine_chunks().cast(pa.int64()),
            "rank_int": pa.array(r, pa.int64()),
            "rank": pa.array(r.astype(np.float64) / 1.0e12, pa.float64())})

    return ranks.map_batches(finalize, batch_format="pyarrow")


def _strict_segment_pairs(g, group_col: str, item_col: str,
                          group_cap: int) -> pa.Table:
    """All within-group item pairs of one co-located hash bucket, with
    in-segment item dedup and a RAISING group_cap: the graph operators
    are exact (the LSH family's silent bucket skip would understate
    counts/edges) — a degenerate giant group must fail loudly so the
    caller raises the cap deliberately."""
    df = g.select([group_col, item_col]).to_pandas()
    df = df.sort_values([group_col, item_col], kind="stable")
    gv = df[group_col].to_numpy()
    iv = df[item_col].to_numpy().astype(np.int64)
    n = len(gv)
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64())})
    if n == 0:
        return empty
    keep = np.ones(n, dtype=bool)
    keep[1:] = (gv[1:] != gv[:-1]) | (iv[1:] != iv[:-1])
    gv, iv = gv[keep], iv[keep]
    n = len(gv)
    boundary = np.zeros(n, dtype=bool)
    boundary[1:] = gv[1:] != gv[:-1]
    cuts = np.nonzero(boundary)[0]
    starts = np.concatenate([[0], cuts])
    ends = np.concatenate([cuts, [n]])
    oa, ob = [], []
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        if m > group_cap:
            raise ValueError(
                f"co-occurrence group with {m} distinct items exceeds "
                f"group_cap={group_cap} (quadratic pair volume); raise "
                "group_cap deliberately or pre-filter degenerate groups")
        ia, ib = np.triu_indices(m, k=1)
        oa.append(iv[s + ia])
        ob.append(iv[s + ib])
    if not oa:
        return empty
    return pa.table({"id_a": pa.array(np.concatenate(oa), pa.int64()),
                     "id_b": pa.array(np.concatenate(ob), pa.int64())})


def cooccurrence_edges(ds, group_col: str, item_col: str,
                       num_buckets: int = 64, group_cap: int = 10_000):
    """DISTINCT undirected co-occurrence edges (id_a < id_b): items that
    share a group (parts in an order, tokens in a doc, …). Groups
    co-locate via the bucketed exchange; in-segment dedup + triu pair
    expansion per group. group_cap guards a degenerate giant group
    (quadratic pair volume) by RAISING — this is an exact operator, a
    silent skip would understate the edge set."""
    from .dedup import _distinct_pairs
    from .shuffle import add_bucket_column

    rows = ds.map_batches(
        lambda b: b.select([group_col, item_col]), batch_format="pyarrow")
    bucketed = rows.map_batches(
        lambda b: add_bucket_column(b, [group_col], num_buckets),
        batch_format="pyarrow")
    cand = bucketed.groupby("bucket").map_groups(
        lambda g: _strict_segment_pairs(g, group_col, item_col, group_cap),
        batch_format="pyarrow")
    return _distinct_pairs(cand, num_buckets)


def _pack_pair(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Injective int64 composite of two node ids — requires ids in
    [0, 2^31). Asserted by the caller once per batch."""
    return (a.astype(np.int64) << np.int64(32)) | b.astype(np.int64)


def triangle_counts(edges, num_buckets: int = 64,
                    broadcast_nodes_limit: int = 5_000_000,
                    broadcast_edges_limit: int = 5_000_000):
    """Per-node triangle participation counts via the degree-ordered
    wedge join (the distributed node-iterator++ plan of the MapReduce
    triangle literature, Suri & Vassilvitskii 2011): orient every edge
    from lower to higher (degree, id); for each source, emit its
    oriented out-neighbor pairs as wedges; a wedge (v, w) closes a
    triangle iff (v, w) is itself an oriented edge. Degree ordering
    bounds wedge volume at O(m^1.5) regardless of skew — a hub of
    degree d generates wedges only toward HIGHER-degree nodes.

    Two broadcast↔join cutovers (the repo's standard small-side plan):
    - degree lookup: below ``broadcast_nodes_limit`` nodes, the (node,
      deg) table ships once via ray.put and orientation is ONE
      map_batches with searchsorted lookups — no join exchanges; above
      it, two bucketed hash joins.
    - edge membership: below ``broadcast_edges_limit`` edges, the packed
      (src,dst) key set ships once and the wedge→triangle closure is a
      map-side searchsorted filter — the wedge set (the O(m^1.5) bulk)
      NEVER crosses an exchange; above it, a bucketed hash join.

    edges: Dataset of distinct undirected (id_a < id_b) int64 pairs,
    ids < 2^31 (packed composite join key). Returns a Dataset
    (node, n_tri) for nodes in ≥ 1 triangle."""
    import ray

    from .shuffle import (add_bucket_column, bucketed_hash_join,
                          grouped_count, two_phase_aggregate)

    edges = edges.materialize()

    def endpoints(b: pa.Table) -> pa.Table:
        a = b["id_a"].to_numpy(zero_copy_only=False)
        bb = b["id_b"].to_numpy(zero_copy_only=False)
        assert (a >= 0).all() and (bb < 1 << 31).all(), \
            "triangle_counts requires node ids in [0, 2^31)"
        return pa.table({"node": pa.array(
            np.concatenate([a, bb]).astype(np.int64), pa.int64())})

    deg = grouped_count(edges.map_batches(endpoints, batch_format="pyarrow"),
                        ["node"], "deg", num_buckets=num_buckets)
    deg = deg.materialize()

    if deg.count() <= broadcast_nodes_limit:
        dd = deg.to_pandas()
        nodes_arr = dd["node"].to_numpy().astype(np.int64)
        order = np.argsort(nodes_arr, kind="stable")
        deg_ref = ray.put((nodes_arr[order],
                           dd["deg"].to_numpy().astype(np.int64)[order]))
        _dcache: dict = {}

        def orient_bcast(b: pa.Table) -> pa.Table:
            lut = _dcache.get("d")
            if lut is None:
                lut = _dcache["d"] = ray.get(deg_ref)
            dn, dv = lut
            a = b["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
            bb = b["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
            da = dv[np.searchsorted(dn, a)]
            db = dv[np.searchsorted(dn, bb)]
            fwd = (da < db) | ((da == db) & (a < bb))
            return pa.table({
                "src": pa.array(np.where(fwd, a, bb), pa.int64()),
                "dst": pa.array(np.where(fwd, bb, a), pa.int64()),
                "ddst": pa.array(np.where(fwd, db, da), pa.int64()),
            })

        oriented = edges.map_batches(orient_bcast, batch_format="pyarrow")
    else:
        ea = bucketed_hash_join(
            edges, deg.map_batches(
                lambda b: pa.table({"id_a": b["node"], "da": b["deg"]}),
                batch_format="pyarrow"),
            "id_a", "id_a", num_buckets=num_buckets)
        eab = bucketed_hash_join(
            ea, deg.map_batches(
                lambda b: pa.table({"id_b": b["node"], "db": b["deg"]}),
                batch_format="pyarrow"),
            "id_b", "id_b", num_buckets=num_buckets)

        def orient(b: pa.Table) -> pa.Table:
            a = b["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
            bb = b["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
            da = b["da"].to_numpy(zero_copy_only=False).astype(np.int64)
            db = b["db"].to_numpy(zero_copy_only=False).astype(np.int64)
            fwd = (da < db) | ((da == db) & (a < bb))
            return pa.table({
                "src": pa.array(np.where(fwd, a, bb), pa.int64()),
                "dst": pa.array(np.where(fwd, bb, a), pa.int64()),
                "ddst": pa.array(np.where(fwd, db, da), pa.int64()),
            })

        oriented = eab.map_batches(orient, batch_format="pyarrow")

    oriented = oriented.materialize()

    def wedge_group(g: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F401
        df = g.select(["src", "dst", "ddst"]).to_pandas()
        # within each src, neighbors sorted by the SAME (deg, id) order
        # used for orientation, so emitted wedge pairs are themselves
        # correctly oriented for the edge lookup
        df = df.sort_values(["src", "ddst", "dst"], kind="stable")
        src = df["src"].to_numpy()
        dst = df["dst"].to_numpy()
        n = len(src)
        boundary = np.zeros(n, dtype=bool)
        boundary[1:] = src[1:] != src[:-1]
        cuts = np.nonzero(boundary)[0]
        starts = np.concatenate([[0], cuts])
        ends = np.concatenate([cuts, [n]])
        ou, ov, ow = [], [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            ia, ib = np.triu_indices(m, k=1)
            ou.append(np.full(len(ia), src[s], np.int64))
            ov.append(dst[s + ia])
            ow.append(dst[s + ib])
        if not ou:
            return pa.table({"u": pa.array([], pa.int64()),
                             "wkey": pa.array([], pa.int64())})
        u = np.concatenate(ou)
        v = np.concatenate(ov).astype(np.int64)
        w = np.concatenate(ow).astype(np.int64)
        return pa.table({"u": pa.array(u, pa.int64()),
                         "wkey": pa.array(_pack_pair(v, w), pa.int64())})

    wedge_src = oriented.map_batches(
        lambda b: add_bucket_column(b, ["src"], num_buckets),
        batch_format="pyarrow")

    if edges.count() <= broadcast_edges_limit:
        ek = oriented.map_batches(
            lambda b: pa.table({"wkey": pa.array(_pack_pair(
                b["src"].to_numpy(zero_copy_only=False),
                b["dst"].to_numpy(zero_copy_only=False)), pa.int64())}),
            batch_format="pyarrow").to_pandas()
        ekeys_ref = ray.put(np.sort(ek["wkey"].to_numpy().astype(np.int64)))
        _ecache: dict = {}

        def closed_wedges(g: pa.Table) -> pa.Table:
            t = wedge_group(g)
            if len(t) == 0:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "one": pa.array([], pa.int64())})
            ek_sorted = _ecache.get("e")
            if ek_sorted is None:
                ek_sorted = _ecache["e"] = ray.get(ekeys_ref)
            k = t["wkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ek_sorted, k)
            pos[pos >= len(ek_sorted)] = len(ek_sorted) - 1
            hit = ek_sorted[pos] == k
            u = t["u"].to_numpy(zero_copy_only=False)[hit].astype(np.int64)
            kk = k[hit]
            v = kk >> np.int64(32)
            w = kk & np.int64(0xFFFFFFFF)
            node = np.concatenate([u, v, w]).astype(np.int64)
            return pa.table({"node": pa.array(node, pa.int64()),
                             "one": pa.array(np.ones(len(node), np.int64),
                                             pa.int64())})

        nodes = wedge_src.groupby("bucket").map_groups(
            closed_wedges, batch_format="pyarrow")
    else:
        wedges = wedge_src.groupby("bucket").map_groups(
            wedge_group, batch_format="pyarrow")
        ekeys = oriented.map_batches(
            lambda b: pa.table({"wkey": pa.array(_pack_pair(
                b["src"].to_numpy(zero_copy_only=False),
                b["dst"].to_numpy(zero_copy_only=False)), pa.int64())}),
            batch_format="pyarrow")
        tri = bucketed_hash_join(wedges, ekeys, "wkey", "wkey",
                                 num_buckets=num_buckets)

        def tri_nodes(b: pa.Table) -> pa.Table:
            u = b["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            k = b["wkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = k >> np.int64(32)
            w = k & np.int64(0xFFFFFFFF)
            return pa.table({"node": pa.array(np.concatenate([u, v, w]),
                                              pa.int64()),
                             "one": pa.array(np.ones(3 * len(b), np.int64),
                                             pa.int64())})

        nodes = tri.map_batches(tri_nodes, batch_format="pyarrow")

    return two_phase_aggregate(
        nodes, ["node"], [("one", "sum")], ["p"], [("p", "sum")], ["n_tri"],
        num_buckets=num_buckets)


def cooccurrence_pair_counts(ds, group_col: str, item_col: str,
                             num_buckets: int = 64,
                             group_cap: int = 10_000):
    """Co-occurrence pair COUNTS: for every unordered item pair
    (id_a < id_b), the number of groups containing both (the
    co-purchase / co-view statistic behind item-item recommenders).
    Groups co-locate via the bucketed exchange; each group's items are
    deduped in-segment before the triu pair expansion, so a repeated
    item in one group counts that group once. group_cap RAISES on a
    degenerate giant group (exact operator — a silent skip would
    understate counts). Returns a Dataset (id_a, id_b, n_co)."""
    from .shuffle import add_bucket_column, grouped_count

    rows = ds.map_batches(
        lambda b: b.select([group_col, item_col]), batch_format="pyarrow")
    bucketed = rows.map_batches(
        lambda b: add_bucket_column(b, [group_col], num_buckets),
        batch_format="pyarrow")
    pairs = bucketed.groupby("bucket").map_groups(
        lambda g: _strict_segment_pairs(g, group_col, item_col, group_cap),
        batch_format="pyarrow")
    return grouped_count(pairs, ["id_a", "id_b"], "n_co",
                         num_buckets=num_buckets)
