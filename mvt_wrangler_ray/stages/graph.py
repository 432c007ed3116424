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

__all__ = ["pagerank"]

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
