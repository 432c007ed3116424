"""Distributed k-means over embedding columns (the SemDeDup-style
semantic-clustering primitive for training-data curation).

Everything is integer fixed-point so the result is bit-exact against a
relational oracle (and across any execution order):

- quantize: q_i = floor(x_i * 2^scale_bits) — exact in float64 because
  the input is float32 widened to float64 and 2^k multiplies only shift
  the exponent;
- distance: squared L2 over int64 components (order-free integer sums);
- ties: smallest cluster id wins (centroid columns are kept sorted);
- centroid update: componentwise TRUNCATING division sum/count —
  truncation, not floor, because DuckDB's `//` truncates toward zero
  for integers (-7 // 2 = -3) while numpy floors; the engine mirrors
  SQL so negative component sums stay bit-equal;
- empty clusters vanish (both sides drop them identically).

Scale plan: centroids (K × dim int64, KBs) broadcast via ray.put each
iteration; every batch computes assignments vectorized and emits ONE
partial row per cluster (count + componentwise sums), so the per-
iteration exchange is K × num_blocks tiny rows — no payload shuffle,
no driver materialization of the points. The final pass emits
(id, cluster) labels streaming.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from .knn import _as_matrix

__all__ = ["kmeans_quantized", "semantic_dedup", "quantize_matrix"]


def quantize_matrix(batch: pa.Table, vec_col: str,
                    scale_bits: int = 20) -> np.ndarray:
    """Zero-copy-ish embedding column → int64 fixed-point matrix."""
    mat = _as_matrix(batch[vec_col]).astype(np.float64)
    return np.floor(mat * float(1 << scale_bits)).astype(np.int64)


def _assign(q: np.ndarray, cents: np.ndarray,
            cids: np.ndarray) -> np.ndarray:
    """Row-wise nearest centroid (squared L2, int64 exact); ties go to
    the smallest cluster id because cids is sorted ascending and
    argmin returns the first minimum."""
    # ||q-c||^2 = ||q||^2 - 2 q.c + ||c||^2 — identical integers to the
    # componentwise sum, any algebraic form is exact in int64
    qq = np.einsum("ij,ij->i", q, q)
    cc = np.einsum("ij,ij->i", cents, cents)
    d = qq[:, None] - 2 * (q @ cents.T) + cc[None, :]
    return cids[np.argmin(d, axis=1)]


def kmeans_quantized(ds_emb, k: int = 8, iterations: int = 3,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     scale_bits: int = 20):
    """Run k-means and return a Dataset (id_col, cluster:int64).

    Init: the quantized vectors of the k smallest ids (deterministic,
    mirrored by the oracle's ``WHERE vec_id < k`` seed)."""
    import ray

    ds_emb, cids, cents = _kmeans_centroids(
        ds_emb, k, iterations, vec_col, id_col, scale_bits)

    cents_ref = ray.put((cids, cents))
    fcache: dict = {}

    def label(batch: pa.Table, _ref=cents_ref) -> pa.Table:
        st = fcache.get(id(_ref))
        if st is None:
            st = fcache[id(_ref)] = ray.get(_ref)
        ids_c, ctr = st
        q = quantize_matrix(batch, vec_col, scale_bits)
        a = _assign(q, ctr, ids_c)
        return pa.table({
            id_col: batch[id_col].combine_chunks().cast(pa.int64()),
            "cluster": pa.array(a, pa.int64())})

    return ds_emb.map_batches(label, batch_format="pyarrow")


def _kmeans_centroids(ds_emb, k, iterations, vec_col, id_col, scale_bits):
    """Shared centroid loop: returns (materialized points, final
    cluster ids, final centroid matrix)."""
    import pandas as pd
    import ray

    dim = len(ds_emb.take(1)[0][vec_col])

    # iterative algorithm: every iteration scans the points, so pin the
    # blocks in the object store once instead of re-reading storage
    # per pass (Ray spills if they don't fit)
    ds_emb = ds_emb.materialize()

    def local_min_k(b: pa.Table) -> pa.Table:
        # per-block k-smallest-id rows; the global merge then sees only
        # k × num_blocks rows (works for ANY id space, not just 0-based
        # dense ids — the oracle's `WHERE vec_id < k` seed coincides on
        # the synth tables' dense ids)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        if len(ids) > k:
            take = np.sort(np.argpartition(ids, k - 1)[:k])
            b = b.take(pa.array(take, pa.int64()))
        return b.select([id_col, vec_col])

    seed_rows = (ds_emb.map_batches(local_min_k, batch_format="pyarrow")
                 .sort(id_col).take(k))
    cents = np.floor(np.array(
        [r[vec_col] for r in seed_rows], dtype=np.float64)
        * float(1 << scale_bits)).astype(np.int64)
    cids = np.array([r[id_col] for r in seed_rows], dtype=np.int64)

    sum_cols = [f"s{j}" for j in range(dim)]

    for _ in range(iterations):
        cents_ref = ray.put((cids, cents))
        cache: dict = {}

        def partials(batch: pa.Table, _ref=cents_ref) -> pa.Table:
            st = cache.get(id(_ref))
            if st is None:
                st = cache[id(_ref)] = ray.get(_ref)
            ids_c, ctr = st
            q = quantize_matrix(batch, vec_col, scale_bits)
            a = _assign(q, ctr, ids_c)
            # one output row per assigned-to cluster: count + per-
            # component sums (mergeable; K rows per block max)
            uniq, inv = np.unique(a, return_inverse=True)
            cnt = np.bincount(inv)
            sums = np.zeros((len(uniq), q.shape[1]), dtype=np.int64)
            np.add.at(sums, inv, q)
            cols = {"cluster": pa.array(uniq, pa.int64()),
                    "n": pa.array(cnt.astype(np.int64), pa.int64())}
            for j in range(q.shape[1]):
                cols[f"s{j}"] = pa.array(sums[:, j], pa.int64())
            return pa.table(cols)

        # partials are ≤ K rows PER BLOCK by construction (the sketch
        # pattern): the driver merge handles K × num_blocks tiny rows,
        # KBs even at cluster scale — a distributed groupby here costs
        # a full sort exchange per iteration for no memory benefit
        pdf = (ds_emb.map_batches(partials, batch_format="pyarrow")
               .to_pandas())
        agg = (pdf.groupby("cluster", sort=True)[["n"] + sum_cols]
               .sum().reset_index())
        cids = agg["cluster"].to_numpy().astype(np.int64)
        n = agg["n"].to_numpy().astype(np.int64)
        s = np.stack([agg[f"s{j}"].to_numpy().astype(np.int64)
                      for j in range(dim)], axis=1)
        # TRUNCATING integer division (see module docstring)
        cents = np.sign(s) * (np.abs(s) // n[:, None])

    return ds_emb, cids, cents


def _exact_cosine_survivors(ids: np.ndarray, q: np.ndarray, t2: float,
                            pair_chunk_entries: int) -> np.ndarray:
    """The exact in-cluster SemDeDup drop rule over (sorted-id, quantized
    vector) arrays: row b is dropped iff ANY smaller-id row a has
    cos(a, b) ≥ threshold. Row-chunked so the m×m pair matrix never
    materializes; all dots/norms are exact int64 (< 2^53). Returns the
    boolean KEEP mask aligned with ids."""
    m = len(ids)
    if m <= 1:
        return np.ones(m, dtype=bool)
    na = np.einsum("ij,ij->i", q, q).astype(np.float64)
    rows = max(1, pair_chunk_entries // max(m, 1))
    dropped = np.zeros(m, dtype=bool)
    col_idx = np.arange(m)
    for s0 in range(0, m, rows):
        s1 = min(s0 + rows, m)
        dot = q[s0:s1] @ q.T            # exact int64 (< 2^53)
        dotf = dot.astype(np.float64)
        cond = (dot > 0) & (dotf * dotf
                            >= t2 * (na[s0:s1, None] * na[None, :]))
        # row b (global s0+i) is dropped if any column a < b matches
        mask = col_idx[None, :] < (s0 + np.arange(s1 - s0))[:, None]
        dropped[s0:s1] = (cond & mask).any(axis=1)
    return ~dropped


def _split_two_means(ids: np.ndarray, q: np.ndarray,
                     iters: int = 3) -> np.ndarray:
    """Deterministic local 2-means split (squared-L2 over the quantized
    int64 vectors, same metric as the global k-means): c0 seeds from the
    min-id row, c1 from the row farthest from c0 (first max → smallest
    id). Returns a boolean mask (True = side of c0). Falls back to an
    id-median split when the geometric split makes no progress (all
    points coincident — their near-dups were already removed by the
    caller's representative pre-pass, so the id split loses nothing)."""
    c0 = q[0].astype(np.int64)
    d0 = np.einsum("ij,ij->i", q - c0, q - c0)
    c1 = q[int(np.argmax(d0))].astype(np.int64)
    side0 = None
    for _ in range(iters):
        e0 = np.einsum("ij,ij->i", q - c0, q - c0)
        e1 = np.einsum("ij,ij->i", q - c1, q - c1)
        side0 = e0 <= e1                 # ties → c0 (deterministic)
        n0, n1 = int(side0.sum()), int((~side0).sum())
        if n0 == 0 or n1 == 0:
            break
        s0v = q[side0].sum(axis=0)
        s1v = q[~side0].sum(axis=0)
        # TRUNCATING division, matching the global k-means convention
        c0 = np.sign(s0v) * (np.abs(s0v) // n0)
        c1 = np.sign(s1v) * (np.abs(s1v) // n1)
    if side0 is None or not side0.any() or side0.all():
        half = len(ids) // 2
        side0 = np.arange(len(ids)) < half
    return side0


def _dedup_over_cap(ids: np.ndarray, q: np.ndarray, t2: float, cap: int,
                    depth: int, pair_chunk_entries: int) -> np.ndarray:
    """Drop-safe over-cap policy (round-3 verdict item 1): instead of
    passing a mega-cluster through undeduped, (1) run a representative
    pre-pass — every row whose cosine with the cluster's MIN-ID row
    meets the threshold drops immediately (the common crawl-skew case:
    one huge blob of near-identical vectors collapses to one row in
    O(m·dim)) — then (2) recursively 2-means-split the survivors and
    dedup each side (bounded depth). Approximate above the cap: pairs
    falling in different sub-clusters (beyond the representative) are
    not compared — the documented SemDeDup-style trade; the SQL oracle
    certifies the exact cap=None mode. At depth 0 the exact chunked
    pair loop runs regardless (drop-safety beats the quadratic cost of
    a pathological split failure). ids must be sorted ascending.
    Returns surviving ids (sorted)."""
    import warnings

    m = len(ids)
    if m <= 1:
        return ids
    if m <= cap:
        return ids[_exact_cosine_survivors(ids, q, t2, pair_chunk_entries)]
    if depth <= 0:
        warnings.warn(
            f"semantic_dedup: split depth exhausted at {m} rows > "
            f"cluster_cap={cap}; running the exact chunked pair loop "
            "(quadratic time, bounded memory) to stay drop-safe")
        return ids[_exact_cosine_survivors(ids, q, t2, pair_chunk_entries)]
    # (1) representative pre-pass vs the min-id row
    na = np.einsum("ij,ij->i", q, q).astype(np.float64)
    dot = q @ q[0]
    dotf = dot.astype(np.float64)
    drop = (dot > 0) & (dotf * dotf >= t2 * (na[0] * na))
    drop[0] = False
    keep = ~drop
    ids, q = ids[keep], q[keep]
    if len(ids) <= cap:
        return ids[_exact_cosine_survivors(ids, q, t2, pair_chunk_entries)]
    # (2) deterministic 2-means split, recurse both sides
    side0 = _split_two_means(ids, q)
    left = _dedup_over_cap(ids[side0], q[side0], t2, cap, depth - 1,
                           pair_chunk_entries)
    right = _dedup_over_cap(ids[~side0], q[~side0], t2, cap, depth - 1,
                            pair_chunk_entries)
    return np.sort(np.concatenate([left, right]))


def semantic_dedup(ds_emb, k: int = 8, iterations: int = 3,
                   threshold: float = 0.99, vec_col: str = "embedding",
                   id_col: str = "vec_id", scale_bits: int = 20,
                   cluster_cap: Optional[int] = 100_000,
                   pair_chunk_entries: int = 1 << 22,
                   split_depth: int = 32):
    """SemDeDup (Abbas et al. 2023, public literature): k-means the
    embeddings, then inside each cluster drop every vector whose cosine
    similarity with a SMALLER-id cluster-mate meets ``threshold``.
    Returns the surviving ids as a Dataset (id_col,).

    The drop rule is non-iterative (id b is dropped if ANY smaller a in
    the cluster qualifies, whether or not a itself survives) — the same
    min-id convention as exact_dedup, and cheaply mirrored in SQL.

    Parity: the cosine test is done on quantized integer vectors —
    dot and the squared norms are EXACT int64 (< 2^53, so their
    float64 casts are exact too), and the single comparison
    ``dot*dot >= t² * (na*nb)`` is evaluated with the identical
    float64 expression in the oracle. No order-dependent float sums.

    Scale: one groupby exchange on cluster id (carrying the ORIGINAL
    float32 vectors — half the bytes of the int64 quantized form, which
    is recomputed deterministically inside the group body); the
    in-cluster pair test is the quadratic step — ``cluster_cap`` is the
    explicit skew guard. Clusters larger than the cap are DEDUPED
    drop-safely via _dedup_over_cap: a min-id representative pre-pass
    (collapses the crawl-skew mega-blob in O(m·dim)) followed by
    recursive deterministic 2-means splitting (depth ≤ ``split_depth``),
    exact pair loop inside each under-cap leaf. Over-cap results are
    approximate (cross-sub-cluster pairs beyond the representative are
    not compared); pass cluster_cap=None for the exact keep-every-
    cluster mode the SQL oracle certifies."""
    import ray

    ds_emb, cids, cents = _kmeans_centroids(
        ds_emb, k, iterations, vec_col, id_col, scale_bits)
    t2 = threshold * threshold
    cents_ref = ray.put((cids, cents))
    cache: dict = {}

    def label_q(batch: pa.Table, _ref=cents_ref) -> pa.Table:
        st = cache.get(id(_ref))
        if st is None:
            st = cache[id(_ref)] = ray.get(_ref)
        ids_c, ctr = st
        q = quantize_matrix(batch, vec_col, scale_bits)
        a = _assign(q, ctr, ids_c)
        return pa.table({
            id_col: batch[id_col].combine_chunks().cast(pa.int64()),
            "cluster": pa.array(a, pa.int64()),
            vec_col: batch[vec_col]})

    labeled = ds_emb.map_batches(label_q, batch_format="pyarrow")

    def dedup_cluster(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        q = quantize_matrix(g, vec_col, scale_bits)[order]
        if cluster_cap is not None and len(ids) > cluster_cap:
            out = _dedup_over_cap(ids, q, t2, cluster_cap, split_depth,
                                  pair_chunk_entries)
            return pa.table({id_col: pa.array(out, pa.int64())})
        keep = _exact_cosine_survivors(ids, q, t2, pair_chunk_entries)
        return pa.table({id_col: pa.array(ids[keep], pa.int64())})

    return labeled.groupby("cluster").map_groups(
        dedup_cluster, batch_format="pyarrow")


def grid_clusters(ds_points, res_deg: float = 8.0, min_pts: int = 1,
                  lon_col: str = "lon", lat_col: str = "lat",
                  num_buckets: int = 16):
    """Grid-based spatial clustering (the DBSCAN-lite / grid-DBSCAN
    family — e.g. He et al. 2011 MR-DBSCAN's cell decomposition): points
    bin to a fixed lon/lat grid, a cell is OCCUPIED iff it holds >=
    ``min_pts`` points, and occupied cells that touch 4-neighbor-wise
    merge into one cluster. Per occupied cell: packed cell id, cluster
    id (min cell id in its component), point count.

    Plan: two-phase per-cell counts (the only pass over the point data)
    → the occupied-cell set is bounded by the GRID, not the data
    (<= (360/res)·(180/res) cells — 1,035 at the 8° default), so the
    adjacency graph builds driver-side from that bounded set and the
    components come from dedup.cluster_pairs (union-find below its
    documented cutover, label propagation above). Cells are packed as
    cx·1024 + cy with cy < 1024, so +1 / +1024 neighbours never cross a
    row boundary (Web-Mercator lat keeps cy <= (85.05+90)/res rows).
    """
    import pandas as pd

    from .dedup import cluster_pairs
    from .shuffle import grouped_count

    # packing correctness bound: cy = floor((lat+90)/res) must stay
    # under the 1024 row stride for every lat in [-90, 90], or distinct
    # cells collide into one id (and the +1/+1024 adjacency corrupts)
    if 180.0 / res_deg >= 1023:
        raise ValueError(
            f"res_deg={res_deg} packs more than 1023 latitude rows into "
            "the cx*1024+cy cell id; use res_deg > 180/1023 (~0.176°) "
            "or widen the row stride")

    def cellify(b: pa.Table) -> pa.Table:
        lon = b[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = b[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cx = np.floor((lon + 180.0) / res_deg).astype(np.int64)
        cy = np.floor((lat + 90.0) / res_deg).astype(np.int64)
        return pa.table({"cell": pa.array(cx * 1024 + cy, pa.int64())})

    counts = grouped_count(ds_points.map_batches(cellify,
                                                 batch_format="pyarrow"),
                           ["cell"], out="n_points", num_buckets=num_buckets)
    occ = counts.map_batches(
        lambda b: b.filter(pa.compute.greater_equal(b["n_points"],
                                                    min_pts)),
        batch_format="pyarrow")
    # bounded by the grid (res-determined), NOT the input size — safe to
    # assemble on the driver at any data scale
    occ_df = occ.to_pandas()
    cells = occ_df["cell"].to_numpy().astype(np.int64)
    cs = set(cells.tolist())
    ea, eb = [], []
    for c in cells.tolist():
        for d in (c + 1, c + 1024):  # (cx, cy+1), (cx+1, cy)
            if d in cs:
                ea.append(c)
                eb.append(d)
    comp = cluster_pairs(pd.DataFrame({"id_a": ea, "id_b": eb}))
    lab = dict(zip(comp["doc_id"], comp["cluster_id"]))
    occ_df["cluster_id"] = np.array(
        [lab.get(c, c) for c in cells.tolist()], np.int64)
    occ_df["n_points"] = occ_df["n_points"].astype(np.int64)
    return occ_df[["cell", "cluster_id", "n_points"]]
