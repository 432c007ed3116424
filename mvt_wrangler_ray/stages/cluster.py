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

import numpy as np
import pyarrow as pa

from .knn import _as_matrix

__all__ = ["kmeans_quantized", "quantize_matrix"]


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
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    dim = len(ds_emb.take(1)[0][vec_col])

    # iterative algorithm: every iteration scans the points, so pin the
    # blocks in the object store once instead of re-reading storage
    # per pass (Ray spills if they don't fit)
    ds_emb = ds_emb.materialize()

    def seed_filter(b: pa.Table) -> pa.Table:
        return b.filter(pc.less(b[id_col], k))

    seed_rows = (ds_emb.map_batches(seed_filter, batch_format="pyarrow")
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
