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

    from .shuffle import bucketed_hash_join, two_phase_aggregate

    deg = two_phase_aggregate(
        edges.map_batches(lambda t: t.select(["src"]),
                          batch_format="pyarrow"),
        keys=["src"],
        partial_aggs=[("src", "count")], partial_names=["pc"],
        final_aggs=[("pc", "sum")], final_names=["outdeg"]).materialize()
    n_nodes = int(deg.count())
    base = (SCALE * (damping_den - damping_num)) // (damping_den * n_nodes)
    r0 = SCALE // n_nodes

    def seed(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["src"].combine_chunks().cast(pa.int64()),
            "outdeg": batch["outdeg"].combine_chunks().cast(pa.int64()),
            "r": pa.array(np.full(len(batch), r0, np.int64), pa.int64())})

    ranks = deg.map_batches(seed, batch_format="pyarrow").materialize()
    broadcast = n_nodes <= broadcast_nodes_limit

    for _ in range(iterations):
        if broadcast:
            df = ranks.to_pandas()
            node_ref = ray.put(df["node"].to_numpy())
            rd_ref = ray.put(np.stack(
                [df["r"].to_numpy(), df["outdeg"].to_numpy()], axis=1))
            cache: dict = {}

            def contrib(batch: pa.Table, _n=node_ref, _rd=rd_ref) -> pa.Table:
                st = cache.get(id(_n))
                if st is None:
                    nodes = ray.get(_n)
                    order = np.argsort(nodes, kind="stable")
                    st = cache[id(_n)] = (nodes[order], ray.get(_rd)[order])
                nodes, rd = st
                src = batch["src"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(nodes, src)
                c = (rd[pos, 0] * damping_num) // (damping_den * rd[pos, 1])
                return pa.table({
                    "dst": batch["dst"].combine_chunks().cast(pa.int64()),
                    "c": pa.array(c, pa.int64())})

            contribs = edges.map_batches(contrib, batch_format="pyarrow")
        else:
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

        if broadcast:
            sdf = sums.to_pandas()
            sn_ref = ray.put(sdf["dst"].to_numpy())
            sv_ref = ray.put(sdf["s"].to_numpy())
            scache: dict = {}

            def advance(batch: pa.Table, _n=sn_ref, _v=sv_ref) -> pa.Table:
                st = scache.get(id(_n))
                if st is None:
                    nodes = ray.get(_n)
                    order = np.argsort(nodes, kind="stable")
                    st = scache[id(_n)] = (nodes[order], ray.get(_v)[order])
                nodes, vals = st
                nb = batch["src"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(nodes, nb)
                hit = (pos < len(nodes))
                pos = np.minimum(pos, len(nodes) - 1)
                hit &= nodes[pos] == nb
                r = np.full(len(nb), base, np.int64)
                r[hit] += vals[pos[hit]]
                return pa.table({
                    "node": batch["src"].combine_chunks().cast(pa.int64()),
                    "outdeg": batch["outdeg"].combine_chunks().cast(pa.int64()),
                    "r": pa.array(r, pa.int64())})

            ranks = deg.map_batches(advance,
                                    batch_format="pyarrow").materialize()
        else:
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
