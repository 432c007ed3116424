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


def semantic_dedup(ds_emb, k: int = 8, iterations: int = 3,
                   threshold: float = 0.99, vec_col: str = "embedding",
                   id_col: str = "vec_id", scale_bits: int = 20,
                   cluster_cap: Optional[int] = 100_000,
                   pair_chunk_entries: int = 1 << 22):
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
    explicit skew guard (clusters larger than the cap are passed
    through UNDEDUPED with a warning; pick k so n/k stays well under
    it, or pass None for the exact keep-every-cluster mode the SQL
    oracle certifies)."""
    import warnings

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
        ids = g[id_col].to_numpy(zero_copy_only=False)
        if cluster_cap is not None and len(g) > cluster_cap:
            warnings.warn(
                f"semantic_dedup: cluster of {len(g)} rows exceeds "
                f"cluster_cap={cluster_cap}; passed through undeduped")
            return pa.table({id_col: pa.array(np.sort(ids), pa.int64())})
        order = np.argsort(ids)
        ids = ids[order]
        q = quantize_matrix(g, vec_col, scale_bits)[order]
        m = len(ids)
        na = np.einsum("ij,ij->i", q, q).astype(np.float64)
        # row-chunked pair test: never materialize the m×m matrix —
        # each chunk is (rows × m) with rows sized to pair_chunk_entries
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
        return pa.table({id_col: pa.array(ids[~dropped], pa.int64())})

    return labeled.groupby("cluster").map_groups(
        dedup_cluster, batch_format="pyarrow")
