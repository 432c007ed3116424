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
import pyarrow.compute as pc


# ---- exact ------------------------------------------------------------


def content_hash_batch(batch: pa.Table, col: str = "text",
                       out: str = "content_hash") -> pa.Table:
    texts = batch[col].to_pylist()
    hashes = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    return batch.append_column(out, pa.array(hashes, pa.string()))


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id",
                num_buckets: int = 64):
    """Keep the min-id row per content hash. Narrow shuffle: only
    (hash, id) leaves the map side, pre-reduced per block, merged with the
    bucketed hash aggregate (see stages/shuffle.py — avoids Ray's
    per-group Python walk over one group per distinct document)."""
    from .shuffle import two_phase_aggregate

    hashed = ds.map_batches(
        lambda b: content_hash_batch(b, col).select([id_col, "content_hash"]),
        batch_format="pyarrow")
    return two_phase_aggregate(
        hashed, keys=["content_hash"],
        partial_aggs=[(id_col, "min")], partial_names=[id_col],
        final_aggs=[(id_col, "min")], final_names=[id_col],
        num_buckets=num_buckets)


def _empty_pairs(value_col: str = "jaccard",
                 value_dtype=np.float64) -> pd.DataFrame:
    """The canonical empty near-dup result frame — ONE definition so the
    empty path cannot drift from the populated path's schema."""
    return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                         "id_b": pd.Series([], dtype=np.int64),
                         value_col: pd.Series([], dtype=value_dtype)})


def exact_dedup_rows(ds, col: str = "text", id_col: str = "doc_id",
                     num_buckets: int = 64):
    """Full-ROW exact dedup with NO driver state: the scale path when the
    survivor id set is too large to broadcast (clean_corpus cutover).

    One payload exchange: rows gain a content hash (map-side), bucket by
    hash (co-locating every copy of a document), and each bucket keeps
    the min-id row per hash with a vectorized sort + segment-boundary
    mask — no per-group Python, no id set anywhere. Contrast exact_dedup,
    which shuffles only narrow (hash, id) pairs and leaves survivor
    SELECTION to the caller — cheaper when a broadcast join is viable."""
    from .shuffle import add_bucket_column

    hashed = ds.map_batches(lambda b: content_hash_batch(b, col),
                            batch_format="pyarrow")
    bucketed = hashed.map_batches(
        lambda b: add_bucket_column(b, ["content_hash"], num_buckets),
        batch_format="pyarrow")

    def keep_min(g: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(
            g, sort_keys=[("content_hash", "ascending"),
                          (id_col, "ascending")])
        g = g.take(order)
        h = np.asarray(g["content_hash"].to_pandas(), dtype=object)
        first = np.ones(len(g), dtype=bool)
        first[1:] = h[1:] != h[:-1]
        return g.filter(pa.array(first)).drop_columns(
            ["content_hash", "bucket"])

    return bucketed.groupby("bucket").map_groups(
        keep_min, batch_format="pyarrow")


# ---- minhash LSH ------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, num_perm, dtype=np.uint64)
    return a, b


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingle hashes: 64-bit md5 fold per gram (the same
    primitive DuckDB exposes as md5_number_lower, so minhash signatures
    and Jaccard verification have an exact SQL oracle)."""
    from .text import md5_lower64

    words = (text or "").lower().split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    return np.fromiter((md5_lower64(g) for g in grams),
                       dtype=np.uint64, count=len(grams))


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    sh = _shingles(text)
    if len(sh) == 0:
        return np.zeros(len(a), dtype=np.uint64)
    # (num_perm, n_shingles) universal hash, min over shingles
    vals = (a[:, None] * (sh[None, :] & _MERSENNE) + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


def batch_minhash_signatures(texts, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Whole-batch minhash: concatenate every document's shingle hashes
    into one array, apply all permutations as one (num_perm, total)
    matrix op, then per-document minimum via ``np.minimum.reduceat`` over
    the segment boundaries — one numpy kernel instead of a per-document
    Python loop (equal output to minhash_signature per row)."""
    n = len(texts)
    num_perm = len(a)
    per_doc = [_shingles(t) for t in texts]
    lens = np.array([len(s) for s in per_doc], dtype=np.int64)
    out = np.zeros((n, num_perm), dtype=np.uint64)
    nz = lens > 0
    if not nz.any():
        return out
    allsh = np.concatenate([s for s in per_doc if len(s)])
    vals = (a[:, None] * (allsh[None, :] & _MERSENNE) + b[:, None]) % _MERSENNE
    starts = np.concatenate([[0], np.cumsum(lens[nz])[:-1]])
    mins = np.minimum.reduceat(vals, starts, axis=1)  # (num_perm, n_nonzero)
    out[nz] = mins.T
    return out


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
        sigs = batch_minhash_signatures(texts, self.a, self.b)
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


def _segment_pairs_table(g: pa.Table, key_cols, id_col: str,
                         bucket_cap: int) -> pa.Table:
    """All within-group id pairs (id_a < id_b) for the equal-key segments
    of one hash bucket, vectorized. Group boundaries come from comparing
    the key COLUMNS directly — a packed/XOR composite of two 64-bit
    columns is not injective and a (vanishingly rare but silent)
    collision would merge adjacent groups. Groups larger than bucket_cap
    are skipped (the degenerate-band skew guard)."""
    df = g.select([*key_cols, id_col]).to_pandas()
    df = df.sort_values([*key_cols, id_col], kind="stable")
    ids = df[id_col].to_numpy()
    n = len(ids)
    boundary = np.zeros(n, dtype=bool)
    for c in key_cols:
        v = df[c].to_numpy()
        boundary[1:] |= v[1:] != v[:-1]
    cuts = np.nonzero(boundary)[0]
    starts = np.concatenate([[0], cuts])
    ends = np.concatenate([cuts, [n]])
    out_a, out_b = [], []
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2 or m > bucket_cap:
            continue
        ia, ib = np.triu_indices(m, k=1)
        out_a.append(ids[s + ia])
        out_b.append(ids[s + ib])
    if not out_a:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64())})
    return pa.table({"id_a": pa.array(np.concatenate(out_a), pa.int64()),
                     "id_b": pa.array(np.concatenate(out_b), pa.int64())})


def _distinct_pairs(cand, num_buckets: int):
    """Global (id_a, id_b) dedup via one bucketed exchange."""
    from .shuffle import add_bucket_column

    bucketed = cand.map_batches(
        lambda b: add_bucket_column(b, ["id_a", "id_b"], num_buckets),
        batch_format="pyarrow")

    def distinct(g: pa.Table) -> pa.Table:
        df = g.select(["id_a", "id_b"]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    return bucketed.groupby("bucket").map_groups(
        distinct, batch_format="pyarrow")


def _broadcast_candidate_column(cand, ds_rows, id_col: str, val_col: str):
    """Fetch `val_col` for every id appearing in the candidate pairs:
    distinct ids reduce per batch → broadcast id set → vectorized
    semi-join over the row source → small driver dict (the broadcast
    build side; the full source never materializes)."""
    import ray

    from .events import broadcast_semi_join

    def distinct_ids(b: pa.Table) -> pa.Table:
        u = pa.concat_arrays([b["id_a"].combine_chunks().cast(pa.int64()),
                              b["id_b"].combine_chunks().cast(pa.int64())]).unique()
        return pa.table({id_col: u})

    need = np.unique(cand.map_batches(distinct_ids, batch_format="pyarrow")
                     .to_pandas()[id_col].to_numpy())
    id_ref = ray.put(set(need.tolist()))
    rows = broadcast_semi_join(
        ds_rows.map_batches(lambda b: b.select([id_col, val_col]),
                            batch_format="pyarrow"),
        id_col, id_ref).to_pandas()
    return ray.put(dict(zip(rows[id_col], rows[val_col])))


def minhash_candidate_pairs(ds, num_perm: int = 64, bands: int = 16,
                            col: str = "text", id_col: str = "doc_id",
                            bucket_cap: int = 1000, num_buckets: int = 64):
    """Dataset → Dataset of distinct candidate pairs (id_a < id_b).

    The LSH band table has ~#docs × #bands distinct (band, band_hash)
    groups — far too many for per-group Python. Instead: hash the band
    key to a small bucket space, ONE map_groups per bucket, and inside
    the bucket generate every group's pairs with numpy segment ops.
    Global pair dedup runs the same way on a pair-key bucket."""
    from .shuffle import add_bucket_column

    # stateless tasks with cached per-worker stage: the permutation
    # params are tiny, so actor-pool startup (~seconds) would dominate
    # small corpora; state builds once per worker process either way
    _stage_cache: dict = {}
    key = (num_perm, bands, col, id_col)

    def explode_batch(b: pa.Table) -> pa.Table:
        st = _stage_cache.get(key)
        if st is None:
            st = _stage_cache[key] = MinHashStage(
                num_perm=num_perm, bands=bands, col=col, id_col=id_col)
        return st(b)

    exploded = ds.map_batches(explode_batch, batch_format="pyarrow")
    bucketed = exploded.map_batches(
        lambda b: add_bucket_column(b, ["band", "band_hash"], num_buckets),
        batch_format="pyarrow")
    cand = bucketed.groupby("bucket").map_groups(
        lambda g: _segment_pairs_table(g, ["band", "band_hash"], "doc_id",
                                       bucket_cap),
        batch_format="pyarrow")
    return _distinct_pairs(cand, num_buckets)


def minhash_near_dups(ds_docs, threshold: float = 0.7, col: str = "text",
                      id_col: str = "doc_id", as_dataset: bool = False,
                      broadcast_pairs_limit: int = 2_000_000,
                      **kw):
    """Candidate pairs + exact-Jaccard verify. The verify stage is
    distributed and the corpus never materializes on the driver:

      1. distinct candidate IDS are reduced per-batch (narrow: one int
         column) and broadcast via ray.put — the small build side;
      2. candidate TEXTS are fetched with broadcast_semi_join (vectorized
         isin per batch — streaming, no per-row Python predicate, no
         shuffle) and collected (bounded by candidate count ≪ corpus:
         this IS the broadcast payload);
      3. jaccard verification runs inside map_batches over the pairs
         Dataset against the broadcast lookup.

    Only verified pairs (tiny) and candidate texts (small) reach the
    driver; payloads of non-candidates move zero times."""
    empty = _empty_pairs()
    # candidate pairs are narrow (two ids) and ≪ corpus: materializing THEM
    # is cheap and guards the empty case; the corpus itself still streams
    cand = minhash_candidate_pairs(ds_docs, col=col, id_col=id_col,
                                   **kw).materialize()
    n_cand = cand.count()
    if n_cand == 0:
        if as_dataset:
            import ray.data as rd
            return rd.from_pandas(empty)
        return empty
    # verify-plan cutover: the broadcast text lookup is ~3x faster at
    # bench scale but ships every candidate text to driver + workers;
    # past the limit the bucketed-join verify keeps everything
    # distributed (same output — equivalence pytest)
    verify = (_verify_jaccard_pairs if n_cand <= broadcast_pairs_limit
              else _verify_jaccard_pairs_bucketed)
    return verify(cand, ds_docs, threshold, col, id_col,
                  as_dataset=as_dataset)


class _LruMemo:
    """Bounded per-worker memo (doc id → shingle set). The verify
    workers are long-lived on the 100-TB path; an unbounded dict keyed
    by every candidate doc a worker ever touched is the wrong shape for
    a week-long job. LRU: pairs for the same doc arrive clustered (the
    candidate stream is bucket/band-ordered), so a small window keeps
    the once-per-worker shingling win."""

    __slots__ = ("cap", "d")

    def __init__(self, cap: int = 1 << 16):
        from collections import OrderedDict

        self.cap = cap
        self.d = OrderedDict()

    def get(self, key, make):
        d = self.d
        s = d.get(key)
        if s is not None:
            d.move_to_end(key)
            return s
        s = d[key] = make()
        if len(d) > self.cap:
            d.popitem(last=False)
        return s


def _verify_jaccard_pairs(cand, ds_docs, threshold: float, col: str,
                          id_col: str, k: int = 3,
                          as_dataset: bool = False):
    """Exact-Jaccard verification of a candidate-pair Dataset against the
    docs Dataset: candidate texts fetched with a broadcast semi-join (the
    small side), verification inside map_batches over the pairs. Shared
    by the minhash-LSH and prefix-filter candidate generators.
    ``as_dataset=True`` returns the verified-pairs Dataset unmaterialized
    (the billion-pair path: downstream clustering runs distributed)."""
    import ray

    empty = _empty_pairs()
    lookup_ref = _broadcast_candidate_column(cand, ds_docs, id_col, col)
    lookup_cache: dict = {}

    def verify(b: pa.Table) -> pa.Table:
        state = lookup_cache.get("l")
        if state is None:
            state = lookup_cache["l"] = (ray.get(lookup_ref), _LruMemo())
        lookup, shingle_sets = state

        def doc_set(i):
            # each candidate doc participates in MANY pairs; shingle its
            # text once per worker (bounded LRU), not once per pair
            return shingle_sets.get(
                i, lambda: set(_shingles(lookup.get(i, ""), k).tolist()))

        ia = b["id_a"].to_numpy(zero_copy_only=False)
        ib = b["id_b"].to_numpy(zero_copy_only=False)

        def pair_j(a, bb):
            sa, sb = doc_set(a), doc_set(bb)
            if not sa and not sb:
                return 1.0
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter    # same ints as len(sa|sb)
            return inter / union if union else 0.0

        js = np.fromiter((pair_j(a, bb) for a, bb in zip(ia, ib)),
                         dtype=np.float64, count=len(b))
        out = pa.table({"id_a": pa.array(ia.astype(np.int64), pa.int64()),
                        "id_b": pa.array(ib.astype(np.int64), pa.int64()),
                        "jaccard": pa.array(js, pa.float64())})
        return out.filter(pa.array(js >= threshold))

    verified = cand.map_batches(verify, batch_format="pyarrow")
    if as_dataset:
        return verified
    out = verified.to_pandas()
    if len(out) == 0:
        return empty
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _verify_jaccard_pairs_bucketed(cand, ds_docs, threshold: float,
                                   col: str, id_col: str, k: int = 3,
                                   as_dataset: bool = False):
    """Fully-distributed exact-Jaccard verify — the cutover when the
    candidate set is too large for the broadcast text lookup of
    _verify_jaccard_pairs (which ships every candidate text to the
    driver and every worker). Texts attach through two bucketed hash
    joins (each pair row moves twice, co-located with its doc text by id
    hash); verification runs in map_batches with a per-worker
    shingle-set cache keyed by doc id, so a doc in many pairs still
    shingles once per worker. Measured at sf0.1 the broadcast path is
    ~3x faster (the joins' exchanges dominate tiny candidate sets) —
    this one exists for the corpus where the candidate set itself is
    big data."""
    from .shuffle import bucketed_hash_join

    empty = _empty_pairs()
    docs = ds_docs.map_batches(
        lambda b: b.select([id_col, col]), batch_format="pyarrow")
    ta_col = f"_{col}_a"
    with_a = bucketed_hash_join(cand, docs, "id_a", id_col,
                                num_buckets=16).map_batches(
        lambda b: b.rename_columns(
            [ta_col if c == col else c for c in b.column_names]),
        batch_format="pyarrow")
    with_ab = bucketed_hash_join(with_a, docs, "id_b", id_col,
                                 num_buckets=16)
    shingle_cache = _LruMemo()

    def doc_set(i, text):
        return shingle_cache.get(
            i, lambda: set(_shingles(text or "", k).tolist()))

    def verify(b: pa.Table) -> pa.Table:
        ia = b["id_a"].to_numpy(zero_copy_only=False)
        ib = b["id_b"].to_numpy(zero_copy_only=False)
        texts_a = b[ta_col].to_pylist()
        texts_b = b[col].to_pylist()

        def pair_j(a, bb, txa, txb):
            sa, sb = doc_set(a, txa), doc_set(bb, txb)
            if not sa and not sb:
                return 1.0
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            return inter / union if union else 0.0

        js = np.fromiter(
            (pair_j(a, bb, txa, txb)
             for a, bb, txa, txb in zip(ia, ib, texts_a, texts_b)),
            dtype=np.float64, count=len(b))
        out = pa.table({"id_a": pa.array(ia.astype(np.int64), pa.int64()),
                        "id_b": pa.array(ib.astype(np.int64), pa.int64()),
                        "jaccard": pa.array(js, pa.float64())})
        return out.filter(pa.array(js >= threshold))

    verified = with_ab.map_batches(verify, batch_format="pyarrow")
    if as_dataset:
        return verified
    out = verified.to_pandas()
    if len(out) == 0:
        return empty
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ---- exact n-gram Jaccard (prefix-filter join) ------------------------

# sentinel gram for documents with NO shingles (empty / whitespace-only
# text): J(∅, ∅) = 1.0 by definition, so such docs must still meet in
# candidate generation. A hash collision with a real gram only creates a
# spurious CANDIDATE, which the exact verify discards.
_EMPTY_DOC_GRAM = np.uint64(0)


def _min_overlap(threshold: float, m: int) -> int:
    """Smallest integer i such that the float64 ratio i/m compares >=
    threshold — the minimal intersection any verify-accepted pair with
    |A| = m can have (the tight side is union = m, i.e. B ⊆ A).

    This MUST mirror the verify stage's float comparison, not real
    arithmetic: np.ceil(threshold*m) disagrees with it at exact-integer
    boundaries (e.g. float 0.55 × 100 = 55.000000000000004 ceils to 56,
    yet a pair with J = 55/100 — whose float64 value equals the float64
    literal 0.55 — PASSES `j >= 0.55` in verify), and an overshoot of 1
    silently breaks the lossless-prefix guarantee."""
    i = max(int(np.floor(threshold * m)) - 2, 0)
    while i <= m and not (i / m >= threshold):
        i += 1
    return max(i, 1)


def ngram_prefix_rows(texts, ids, threshold: float, k: int = 3,
                      hot=None) -> pa.Table:
    """AllPairs/PPJoin-style prefix filtering (Bayardo et al., WWW'07;
    public literature — no reference-repo counterpart): order each
    document's DISTINCT gram-hash set by a fixed global total order, and
    emit only the first  m - ceil(t*m) + 1  grams. Any pair with
    Jaccard >= t is guaranteed to share at least one emitted prefix gram
    (the lemma holds for ANY fixed total order), so the inverted-index
    join over prefix rows is a LOSSLESS candidate generator — and the
    narrow (gram, doc_id) rows are all that shuffles.

    ``hot`` (optional sorted uint64 array of gram hashes):
    frequency-aware order —
    non-hot (rare) grams sort BEFORE hot (frequent) grams, hash-ordered
    within each class. Prefixes then consist of the rarest grams, which
    is what makes AllPairs selective on Zipfian corpora: a stop-gram
    shared by half the corpus stops generating O(n²) candidates. Still a
    fixed total order, so losslessness is unaffected.

    Each row also carries ``pos`` (the gram's 0-based position in the
    doc's FULL ordered distinct-gram sequence) and ``m`` (the distinct
    gram count) for the PPJoin positional filter downstream (Xiao et
    al., WWW'08). The reorder is applied whenever ``hot`` is given —
    even when the prefix is the whole set — so positions from different
    docs always refer to the SAME global total order."""
    out_g: list = []
    out_id: list = []
    out_pos: list = []
    out_m: list = []
    for t, i in zip(texts, ids):
        sh = np.unique(_shingles(t, k))  # distinct + ascending hash order
        m = len(sh)
        if m == 0:
            out_g.append(np.array([_EMPTY_DOC_GRAM], dtype=np.uint64))
            out_id.append(np.full(1, i, dtype=np.int64))
            out_pos.append(np.zeros(1, dtype=np.int32))
            out_m.append(np.zeros(1, dtype=np.int32))
            continue
        p = m - _min_overlap(threshold, m) + 1
        if hot is not None and len(hot):
            is_hot = np.isin(sh, hot)          # hot: sorted uint64 array
            sh = sh[np.lexsort((sh, is_hot))]  # rare first, hash within
        out_g.append(sh[:p])
        out_id.append(np.full(p, i, dtype=np.int64))
        out_pos.append(np.arange(p, dtype=np.int32))
        out_m.append(np.full(p, m, dtype=np.int32))
    grams = (np.concatenate(out_g) if out_g
             else np.array([], dtype=np.uint64))
    dids = (np.concatenate(out_id) if out_id
            else np.array([], dtype=np.int64))
    poss = (np.concatenate(out_pos) if out_pos
            else np.array([], dtype=np.int32))
    ms = (np.concatenate(out_m) if out_m
          else np.array([], dtype=np.int32))
    return pa.table({"gram": pa.array(grams.view(np.int64), pa.int64()),
                     "doc_id": pa.array(dids, pa.int64()),
                     "pos": pa.array(poss, pa.int32()),
                     "m": pa.array(ms, pa.int32())})


def _pair_min_overlap_vec(ma: np.ndarray, mb: np.ndarray,
                          threshold: float) -> np.ndarray:
    """Vectorized pair-level overlap bound: for each (|A|, |B|) the
    smallest integer o whose float64 ratio o/(|A|+|B|-o) compares >=
    threshold — the minimal intersection a verify-accepted pair can
    have. Like _min_overlap this MUST mirror the verify stage's float
    comparison, so it searches upward from a safe underestimate instead
    of trusting real-arithmetic ceil at exact-integer boundaries."""
    s = (ma + mb).astype(np.int64)
    o = np.maximum(
        np.floor(threshold * s / (1.0 + threshold)).astype(np.int64) - 2, 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        for _ in range(8):
            bad = ~(o / (s - o) >= threshold)
            if not bad.any():
                break
            o = o + bad
    return o


def _segment_pairs_ppjoin(g: pa.Table, threshold: float,
                          bucket_cap: int) -> pa.Table:
    """Jaccard-path pair generation with the PPJoin positional filter
    (Xiao et al., WWW'08 — public literature): a (gram g, A, B)
    co-occurrence can only witness overlap <= min(|A| - pos_A(g),
    |B| - pos_B(g)) because, in the global total order, the FIRST gram
    A and B share leaves exactly that many slots after (and including)
    itself. A truly-qualifying pair's first shared gram sits inside
    both prefixes (prefix lemma) and its bound >= the true overlap >=
    the pair's required overlap, so filtering EVERY co-occurrence by
    `bound >= _pair_min_overlap_vec(|A|, |B|)` is lossless while
    discarding the bulk of spurious candidates before the pair-dedup
    exchange. Empty-doc sentinel rows (m = 0) bypass the filter —
    J(∅,∅) = 1.0 is verify's call. The positional bound at pos 0
    equals min(|A|, |B|), so the classic length filter is subsumed."""
    df = g.select(["gram", "doc_id", "pos", "m"]).to_pandas()
    df = df.sort_values(["gram", "doc_id"], kind="stable")
    ids = df["doc_id"].to_numpy()
    pos = df["pos"].to_numpy().astype(np.int64)
    mm = df["m"].to_numpy().astype(np.int64)
    gr = df["gram"].to_numpy()
    n = len(ids)
    boundary = np.zeros(n, dtype=bool)
    boundary[1:] = gr[1:] != gr[:-1]
    cuts = np.nonzero(boundary)[0]
    starts = np.concatenate([[0], cuts])
    ends = np.concatenate([cuts, [n]])
    out_a, out_b = [], []
    for s, e in zip(starts, ends):
        cnt = e - s
        if cnt < 2 or cnt > bucket_cap:
            continue
        ia, ib = np.triu_indices(cnt, k=1)
        a_idx = s + ia
        b_idx = s + ib
        ma, mb = mm[a_idx], mm[b_idx]
        ub = np.minimum(ma - pos[a_idx], mb - pos[b_idx])
        keep = (ma == 0) | (mb == 0) | \
            (ub >= _pair_min_overlap_vec(ma, mb, threshold))
        out_a.append(ids[a_idx[keep]])
        out_b.append(ids[b_idx[keep]])
    if not out_a:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64())})
    return pa.table({"id_a": pa.array(np.concatenate(out_a), pa.int64()),
                     "id_b": pa.array(np.concatenate(out_b), pa.int64())})


def _hot_grams(ds_docs, col: str, k: int, min_df: int,
               cap: int) -> np.ndarray:
    """SORTED uint64 array of gram hashes whose document frequency >=
    min_df (capped at the `cap` most frequent, deterministically
    tie-broken by gram hash) — the broadcast side of the frequency-aware
    prefix order, kept as an array so membership tests are one np.isin.
    One narrow pass: only (gram) rows leave the map side, pre-reduced
    per block."""
    from .shuffle import two_phase_aggregate

    def explode_all(b: pa.Table) -> pa.Table:
        gs = [np.unique(_shingles(t, k)) for t in b[col].to_pylist()]
        allg = (np.concatenate(gs) if gs
                else np.array([], dtype=np.uint64))
        return pa.table({"gram": pa.array(allg.view(np.int64), pa.int64())})

    grams = ds_docs.map_batches(explode_all, batch_format="pyarrow")
    freq = two_phase_aggregate(
        grams, keys=["gram"],
        partial_aggs=[("gram", "count")], partial_names=["pc"],
        final_aggs=[("pc", "sum")], final_names=["df"])
    flt = freq.map_batches(
        lambda b: b.filter(pa.compute.greater_equal(b["df"], min_df)),
        batch_format="pyarrow").materialize()
    n_hot = flt.count()
    if n_hot == 0:
        return np.array([], dtype=np.uint64)
    if n_hot <= max(cap * 4, 1_000_000):
        # small filtered set: driver-side top-k skips a whole Dataset
        # sort exchange (~1s of fixed latency at bench scale)
        df = flt.to_pandas().sort_values(["df", "gram"],
                                         ascending=[False, True])
        hot = df.head(cap)
    else:
        hot = (flt.sort(["df", "gram"], descending=[True, False])
               .limit(cap).to_pandas())
    return np.sort(np.asarray(hot["gram"], dtype=np.int64)
                   .view(np.uint64))


def ngram_jaccard_near_dups(ds_docs, threshold: float = 0.5,
                            col: str = "text", id_col: str = "doc_id",
                            k: int = 3, bucket_cap: int = 10_000,
                            num_buckets: int = 64, hot_min_df: int = 4,
                            hot_cap: int = 100_000,
                            broadcast_pairs_limit: int = 2_000_000
                            ) -> pd.DataFrame:
    """EXACT n-gram-Jaccard near-duplicate pairs (id_a < id_b, jaccard):
    every pair with shingle-set Jaccard >= threshold, no LSH recall loss.

    Plan (each step a streaming Dataset stage):
      1. map_batches: per-doc distinct gram hashes, keep only the
         prefix-filter slice → narrow (gram, doc_id, pos, m) rows;
      2. bucket the gram space → per-bucket numpy segment pair-gen with
         the PPJoin positional filter (_segment_pairs_ppjoin — lossless,
         subsumes the length filter) → distinct pairs;
      3. exact-Jaccard verify via the shared broadcast verify stage.

    Versus minhash_near_dups: exact recall, but candidate volume grows
    with corpus self-similarity — minhash is the scale path when recall
    loss is acceptable; this is the ground-truth path. bucket_cap only
    guards stop-gram degeneracy (a gram shared by >cap docs generates
    O(cap²) pairs; such grams are dropped with the same skew-guard
    contract as the LSH bands)."""
    import ray

    from .shuffle import add_bucket_column

    empty = _empty_pairs()

    hot_ref = ray.put(_hot_grams(ds_docs, col, k, hot_min_df, hot_cap)
                      if hot_min_df else None)
    hot_cache: dict = {}

    def explode(b: pa.Table) -> pa.Table:
        if "h" not in hot_cache:
            hot_cache["h"] = ray.get(hot_ref)
        return ngram_prefix_rows(b[col].to_pylist(),
                                 b[id_col].to_numpy(zero_copy_only=False),
                                 threshold, k, hot=hot_cache["h"])

    rows = ds_docs.map_batches(explode, batch_format="pyarrow")
    bucketed = rows.map_batches(
        lambda b: add_bucket_column(b, ["gram"], num_buckets),
        batch_format="pyarrow")
    cand = bucketed.groupby("bucket").map_groups(
        lambda g: _segment_pairs_ppjoin(g, threshold, bucket_cap),
        batch_format="pyarrow")
    cand = _distinct_pairs(cand, num_buckets).materialize()
    n_cand = cand.count()
    if n_cand == 0:
        return empty
    verify = (_verify_jaccard_pairs if n_cand <= broadcast_pairs_limit
              else _verify_jaccard_pairs_bucketed)
    return verify(cand, ds_docs, threshold, col, id_col, k)


def span_windows_batch(batch: pa.Table, width: int = 8, col: str = "text",
                       id_col: str = "doc_id") -> pa.Table:
    """Explode every `width`-word window (lowercase whitespace tokens)
    into (doc_id, whash) rows — md5 lower-64 of the joined window, the
    same hash primitive the fingerprint/simhash oracles share with
    DuckDB's ``md5_number_lower``."""
    from .text import md5_lower64

    texts = batch[col].to_pylist()
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    oid: list = []
    oh: list = []
    for i, t in enumerate(texts):
        ws = (t or "").lower().split()
        for g in range(len(ws) - width + 1):
            oid.append(ids[i])
            oh.append(md5_lower64(" ".join(ws[g:g + width])))
    h = (np.array(oh, dtype=np.uint64).astype(np.int64) if oh
         else np.empty(0, np.int64))
    return pa.table({"doc_id": pa.array(np.asarray(oid, np.int64), pa.int64()),
                     "whash": pa.array(h, pa.int64())})


def span_dedup_stats(ds_docs, width: int = 8, col: str = "text",
                     id_col: str = "doc_id", num_buckets: int = 64,
                     broadcast_dup_limit: int = 5_000_000):
    """Duplicated-substring detection (the repeated-span dedup family of
    the LLM-training-data literature — Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better", via fixed-width word
    windows): a window is duplicated iff its hash occurs ≥ 2 times
    corpus-wide (any doc, any position). Per-doc output: n_windows,
    dup_windows, dup_ratio — docs shorter than `width` words emit no
    windows and no row.

    Plan: window explode (pinned once — two consumers) → two-phase
    per-hash counts → the DUPLICATED-hash set (count ≥ 2, typically a
    small fraction of distinct windows) broadcasts via ray.put below
    ``broadcast_dup_limit`` and flagging is a map-side searchsorted
    with in-block per-doc scatter-add partials — the window rows never
    cross a join exchange; above the limit, the original bucketed
    hash-join lane takes over (forced-equivalence pytest). No
    driver-side state beyond the bounded dup-hash set."""
    import ray

    from .shuffle import bucketed_hash_join, grouped_count, two_phase_aggregate

    win = ds_docs.map_batches(
        lambda b: span_windows_batch(b, width, col, id_col),
        batch_format="pyarrow").materialize()
    counts = grouped_count(win, ["whash"], "cnt", num_buckets=num_buckets)
    dup = counts.map_batches(
        lambda b: b.filter(pa.compute.greater_equal(b["cnt"], 2))
                   .select(["whash"]),
        batch_format="pyarrow").materialize()

    if dup.count() <= broadcast_dup_limit:
        dh = dup.to_pandas()
        dup_sorted = (np.sort(dh["whash"].to_numpy().astype(np.int64))
                      if len(dh) else np.empty(0, np.int64))
        dref = ray.put(dup_sorted)
        _cache: dict = {}

        def flag_partial(b: pa.Table) -> pa.Table:
            ds_ = _cache.get("d")
            if ds_ is None:
                ds_ = _cache["d"] = ray.get(dref)
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            wh = b["whash"].to_numpy(zero_copy_only=False)
            if len(ds_):
                pos = np.searchsorted(ds_, wh)
                pos[pos >= len(ds_)] = len(ds_) - 1
                isdup = (ds_[pos] == wh).astype(np.int64)
            else:
                isdup = np.zeros(len(wh), np.int64)
            uids, inv = np.unique(ids, return_inverse=True)
            pn = np.bincount(inv, minlength=len(uids)).astype(np.int64)
            pd_ = np.zeros(len(uids), np.int64)
            np.add.at(pd_, inv, isdup)
            return pa.table({
                "doc_id": pa.array(uids, pa.int64()),
                "pn": pa.array(pn, pa.int64()),
                "pd": pa.array(pd_, pa.int64())})

        flagged = win.map_batches(flag_partial, batch_format="pyarrow")
        per_doc = two_phase_aggregate(
            flagged, ["doc_id"],
            [("pn", "sum"), ("pd", "sum")], ["ppn", "ppd"],
            [("ppn", "sum"), ("ppd", "sum")], ["n_windows", "dup_windows"],
            num_buckets=num_buckets)
    else:
        joined = bucketed_hash_join(win, counts, "whash", "whash",
                                    num_buckets=num_buckets)

        def flag(b: pa.Table) -> pa.Table:
            cnt = b["cnt"].to_numpy(zero_copy_only=False)
            return pa.table({
                "doc_id": b["doc_id"],
                "one": pa.array(np.ones(len(b), np.int64), pa.int64()),
                "dup": pa.array((cnt >= 2).astype(np.int64), pa.int64()),
            })

        flagged = joined.map_batches(flag, batch_format="pyarrow")
        per_doc = two_phase_aggregate(
            flagged, ["doc_id"],
            [("one", "sum"), ("dup", "sum")], ["pn", "pd"],
            [("pn", "sum"), ("pd", "sum")], ["n_windows", "dup_windows"],
            num_buckets=num_buckets)

    def ratio(b: pa.Table) -> pa.Table:
        n = b["n_windows"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dup_windows"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_windows": pa.array(n, pa.int64()),
            "dup_windows": pa.array(d, pa.int64()),
            "dup_ratio": pa.array(d / n, pa.float64()),
        })

    return per_doc.map_batches(ratio, batch_format="pyarrow")


def cluster_pairs(pairs: pd.DataFrame, large_threshold: int = 2_000_000):
    """Duplicate-pair graph → cluster ids (connected components).

    Verified near-dup pairs are a tiny fraction of the corpus (candidates
    already passed LSH + exact verify), so driver-side union-find is the
    right plan below `large_threshold` edges. Above it, callers should
    switch to label propagation over a Dataset (min-label groupby rounds
    — see label_propagation_round) — the sketch is provided and tested,
    the cutover documented here rather than silently assumed."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    if len(pairs) > large_threshold:
        raise ValueError(
            "pair set too large for driver-side union-find; run "
            "label_propagation_round iterations over the edges Dataset")
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(set(pairs["id_a"]) | set(pairs["id_b"]))
    return pd.DataFrame({"doc_id": nodes,
                         "cluster_id": [find(n) for n in nodes]})


def seed_labels(edges_ds):
    """Initial labels: every endpoint labeled with its own id."""
    import pyarrow as pa

    from .shuffle import two_phase_aggregate

    def explode(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        node = np.concatenate([a, b])
        return pa.table({"node": pa.array(node), "label": pa.array(node)})

    return two_phase_aggregate(
        edges_ds.map_batches(explode, batch_format="pyarrow"),
        keys=["node"],
        partial_aggs=[("label", "min")], partial_names=["label"],
        final_aggs=[("label", "min")], final_names=["label"])


def label_propagation_round(edges_ds, labels_ds):
    """One min-label propagation round, Dataset-native and scalable:

      1. bucketed hash JOIN of current labels onto edge endpoints (both
         directions) — endpoint and label rows co-located by node hash,
         merged vectorized per bucket;
      2. each edge endpoint sends its node's current label to its peer;
      3. new label = min over (own label ∪ received messages) per node.

    Iterate until the distinct-label count stops changing (component
    diameter rounds). labels_ds=None seeds with seed_labels()."""
    import pyarrow as pa

    from .shuffle import add_bucket_column, two_phase_aggregate

    if labels_ds is None:
        labels_ds = seed_labels(edges_ds)
    labels_ds = labels_ds.materialize()  # used twice (join + final min)

    def endpoints(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([a, b])),
                         "peer": pa.array(np.concatenate([b, a]))})

    eps = edges_ds.map_batches(endpoints, batch_format="pyarrow")
    tagged_eps = eps.map_batches(
        lambda b: add_bucket_column(b, ["node"], 32).append_column(
            "label", pa.nulls(len(b), pa.int64())),
        batch_format="pyarrow")
    tagged_lab = labels_ds.map_batches(
        lambda b: add_bucket_column(b, ["node"], 32).append_column(
            "peer", pa.nulls(len(b), pa.int64())).select(
            ["node", "peer", "bucket", "label"]),
        batch_format="pyarrow")

    def join_and_message(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        labs = df[df["peer"].isna()][["node", "label"]]
        eps_ = df[~df["peer"].isna()][["node", "peer"]]
        merged = eps_.merge(labs, on="node", how="inner")
        return pa.table({"node": pa.array(merged["peer"].astype(np.int64)),
                         "label": pa.array(merged["label"].astype(np.int64))})

    msgs = (tagged_eps.select_columns(["node", "peer", "bucket", "label"])
            .union(tagged_lab)
            .groupby("bucket").map_groups(join_and_message, batch_format="pyarrow"))

    return two_phase_aggregate(
        msgs.union(labels_ds), keys=["node"],
        partial_aggs=[("label", "min")], partial_names=["label"],
        final_aggs=[("label", "min")], final_names=["label"])


def _exact_int_sum(ds, col: str) -> int:
    """Exact sum of an int64 column with NO int64-overflow risk: each
    batch sums the low and high 32-bit halves separately (each bounded
    by rows × 2³² ≪ 2⁶³), recombines in Python-int arithmetic, and ships
    one decimal string; the driver adds a handful of big ints."""
    def part(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
        neg = int((v < 0).sum())          # two's-complement correction
        u = v.view(np.uint64)
        lo = int((u & np.uint64(0xFFFFFFFF)).sum(dtype=np.uint64))
        hi = int((u >> np.uint64(32)).astype(np.int64).sum())
        total = (hi << 32) + lo - (neg << 64)
        return pa.table({"s": pa.array([str(total)], pa.string())})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    return sum(int(s) for s in parts["s"])


def label_propagation_converged(edges_ds, max_rounds: int = 64):
    """Iterate label_propagation_round to the connected-components
    fixpoint. Convergence test: the exact label sum is a strictly
    decreasing integer potential (labels only ever shrink), so an
    unchanged sum IS the fixpoint — no join against the previous round
    needed, and the arbitrary-precision sum cannot overflow at any node
    count. Rounds needed = graph diameter (near-dup clusters are
    shallow; max_rounds is a runaway bound, not a tuning knob)."""
    labels = None
    prev = None
    for _ in range(max_rounds):
        labels = label_propagation_round(edges_ds, labels).materialize()
        s = _exact_int_sum(labels, "label")
        if s == prev:
            return labels
        prev = s
    # silently returning here would hand callers (clean_corpus) labels
    # that have NOT reached the components fixpoint — duplicates would
    # survive with no signal. A >max_rounds-diameter near-dup chain is
    # pathological input worth surfacing, not papering over.
    raise RuntimeError(
        f"label propagation did not converge in {max_rounds} rounds "
        "(component diameter exceeds max_rounds); raise max_rounds")


# ---- simhash ----------------------------------------------------------


_SIMHASH_SHIFTS = np.arange(64, dtype=np.uint64)
_SIMHASH_POW2 = (np.uint64(1) << _SIMHASH_SHIFTS)


def simhash_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """64-bit word-level simhash, vectorized batch-wide: explode words
    with per-doc segment offsets, hash UNIQUE words once (md5 lower-64 —
    DuckDB ``md5_number_lower``, so the driver oracle is exact SQL), bit
    matrix ±1, per-doc accumulate via ``np.add.reduceat``, pack the sign
    bits. Bit b of the result = 1 iff the accumulated weight of word-hash
    bit b is > 0; empty/whitespace-only docs hash to 0."""
    from .text import md5_lower64

    texts = batch[col].to_pylist()
    n = len(texts)
    words_per_doc = [(t or "").lower().split() for t in texts]
    lens = np.fromiter((len(w) for w in words_per_doc), dtype=np.int64, count=n)
    out = np.zeros(n, dtype=np.int64)
    nz = lens > 0
    if not nz.any():
        return batch.append_column("simhash", pa.array(out, pa.int64()))
    all_words = np.concatenate(
        [np.asarray(w, dtype=object) for w in words_per_doc if w])
    uniq, inv = np.unique(all_words.astype(str), return_inverse=True)
    uh = np.fromiter((md5_lower64(w) for w in uniq),
                     dtype=np.uint64, count=len(uniq))
    hs = uh[inv]
    # (nwords, 64) ±1 matrix, segment-summed per doc in one reduceat
    pm = (((hs[:, None] >> _SIMHASH_SHIFTS[None, :]) & np.uint64(1))
          .astype(np.int32) * 2 - 1)
    starts = np.concatenate([[0], np.cumsum(lens[nz])[:-1]])
    acc = np.add.reduceat(pm, starts, axis=0)       # (n_nonzero, 64)
    vals = ((acc > 0).astype(np.uint64) * _SIMHASH_POW2[None, :]).sum(axis=1)
    out[nz] = vals.astype(np.int64)
    return batch.append_column("simhash", pa.array(out, pa.int64()))


def hamming_bands(batch: pa.Table, sig_col: str, id_col: str = "doc_id",
                  bands: int = 4) -> pa.Table:
    """Split a 64-bit signature into `bands` equal-width bands (pigeonhole:
    any pair within Hamming distance < bands shares ≥ 1 band). The output
    id column is always named ``doc_id`` — the shared contract of the
    segment-pair candidate machinery downstream."""
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    sh = batch[sig_col].to_numpy(zero_copy_only=False).astype(np.uint64)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    n = len(sh)
    bcol = np.repeat(np.arange(bands, dtype=np.int32), n)
    vals = np.concatenate([((sh >> np.uint64(width * b)) & mask).astype(np.int64)
                           for b in range(bands)])
    return pa.table({"band": pa.array(bcol), "band_val": pa.array(vals),
                     "doc_id": pa.array(np.tile(ids, bands))})


def simhash_bands(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """4 × 16-bit bands: pairs within Hamming distance 3 share ≥1 band."""
    return hamming_bands(batch, "simhash", id_col, bands=4)


def hamming_near_dups(sig_ds, sig_col: str, max_hamming: int = 3,
                      id_col: str = "doc_id", bands: int = 4,
                      num_buckets: int = 64, bucket_cap: int = 1000):
    """Near-dup pairs for ANY 64-bit signature column (simhash, image
    phash, …): equal-width band blocking (pigeonhole: pairs within
    Hamming < bands share ≥ 1 band) → bucketed candidate generation
    (bounded Python group count, per-(band,value) cap against degenerate
    bands) → popcount verify against a broadcast signature lookup of
    candidate ids only. ``sig_ds`` is a Dataset carrying (id_col,
    sig_col). Returns (id_a, id_b, hamming) sorted.

    Recall is COMPLETE only for max_hamming ≤ bands - 1: a pair at
    distance ≥ bands can place one differing bit in every band and
    share no band (it is never generated as a candidate). Passing
    max_hamming ≥ bands warns and returns approximate (banding-limited)
    recall."""
    import warnings

    import ray

    from .shuffle import add_bucket_column

    if max_hamming >= bands:
        warnings.warn(
            f"hamming_near_dups: max_hamming={max_hamming} >= bands={bands} "
            "— band blocking only guarantees candidate recall for distance "
            f"<= {bands - 1}; pairs at distance in [{bands}, {max_hamming}] "
            "may be missed (approximate recall)")

    empty = _empty_pairs("hamming", np.int64)
    sh = sig_ds.materialize()
    band_rows = sh.map_batches(
        lambda b: hamming_bands(b, sig_col, id_col, bands),
        batch_format="pyarrow")
    bucketed = band_rows.map_batches(
        lambda b: add_bucket_column(b, ["band", "band_val"], num_buckets),
        batch_format="pyarrow")
    cand = bucketed.groupby("bucket").map_groups(
        lambda g: _segment_pairs_table(g, ["band", "band_val"], "doc_id",
                                       bucket_cap),
        batch_format="pyarrow")
    cand = _distinct_pairs(cand, num_buckets).materialize()
    if cand.count() == 0:
        return empty

    # broadcast the (8-byte) signatures of candidate ids only; verify in
    # map_batches over the pairs Dataset
    sig_ref = _broadcast_candidate_column(cand, sh, id_col, sig_col)
    cache: dict = {}

    def verify(b: pa.Table) -> pa.Table:
        lookup = cache.get("l")
        if lookup is None:
            lookup = cache["l"] = ray.get(sig_ref)
        ia = b["id_a"].to_numpy(zero_copy_only=False)
        ib = b["id_b"].to_numpy(zero_copy_only=False)
        sa = np.fromiter((lookup.get(a, 0) for a in ia), np.int64, len(b))
        sb = np.fromiter((lookup.get(x, 0) for x in ib), np.int64, len(b))
        d = hamming64(sa, sb)
        keep = d <= max_hamming
        return pa.table({"id_a": pa.array(ia.astype(np.int64), pa.int64()),
                         "id_b": pa.array(ib.astype(np.int64), pa.int64()),
                         "hamming": pa.array(d, pa.int64())}
                        ).filter(pa.array(keep))

    out = cand.map_batches(verify, batch_format="pyarrow").to_pandas()
    if len(out) == 0:
        return empty
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def simhash_near_dups(ds_docs, max_hamming: int = 3, col: str = "text",
                      id_col: str = "doc_id", num_buckets: int = 64,
                      bucket_cap: int = 1000):
    """SimHash near-dup pairs, Ray-Data-first: 64-bit simhash per doc →
    4×16-bit band blocking → the generic hamming_near_dups tail."""
    sh = ds_docs.map_batches(
        lambda b: simhash_batch(b, col).select([id_col, "simhash"]),
        batch_format="pyarrow")
    return hamming_near_dups(sh, "simhash", max_hamming, id_col,
                             bands=4, num_buckets=num_buckets,
                             bucket_cap=bucket_cap)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-element popcount(xor): one unpackbits over the byte view of
    the whole vector (no 64-iteration shift loop)."""
    x = (np.asarray(a).astype(np.uint64) ^ np.asarray(b).astype(np.uint64))
    by = np.ascontiguousarray(x)[:, None].view(np.uint8)   # (n, 8)
    return np.unpackbits(by, axis=1).sum(axis=1).astype(np.int64)


# ---- embedding near-dup ----------------------------------------------


class HyperplaneLSHStage:
    """Random-hyperplane signatures for cosine LSH (seeded, built once
    per actor). Emits (bucket, vec_id) plus the ORIGINAL vector column:
    the sign of planes·v is normalization-invariant, so normalization
    happens once in the per-bucket verify instead of widening the
    shuffle payload to float64 lists here.

    ``probes`` > 0 enables multiprobe (Lv et al., VLDB'07 — public
    literature): each vector is ALSO emitted to the `probes` buckets
    obtained by flipping its lowest-|margin| hyperplane bits — the
    planes it was closest to, i.e. the buckets a true near-neighbor
    most likely fell into. Recovers cross-bucket pairs single-probe LSH
    misses at the cost of a (probes+1)× shuffle payload (the standard
    trade versus maintaining multiple hash tables)."""

    def __init__(self, dim: int = 64, nbits: int = 12, seed: int = 42,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 probes: int = 0):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, nbits))
        self.vec_col, self.id_col = vec_col, id_col
        self.probes = min(probes, nbits)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .knn import _as_matrix

        mat = _as_matrix(batch[self.vec_col])
        margin = mat @ self.planes
        bits = margin > 0
        nbits = bits.shape[1]
        bucket = np.zeros(len(mat), dtype=np.int64)
        for j in range(nbits):
            bucket = bucket * 2 + bits[:, j]
        if not self.probes:
            return pa.table({
                "bucket": pa.array(bucket, pa.int64()),
                self.id_col: batch[self.id_col],
                self.vec_col: batch[self.vec_col],
            })
        # bit j carries weight 2^(nbits-1-j); flipping plane j toggles it
        weights = (np.int64(1) << np.arange(nbits - 1, -1, -1,
                                            dtype=np.int64))
        flip_order = np.argsort(np.abs(margin), axis=1, kind="stable")
        probe_buckets = [bucket]
        for p in range(self.probes):
            probe_buckets.append(bucket ^ weights[flip_order[:, p]])
        all_buckets = np.concatenate(probe_buckets)
        tile_idx = np.tile(np.arange(len(mat)), self.probes + 1)
        idx = pa.array(tile_idx, pa.int64())
        return pa.table({
            "bucket": pa.array(all_buckets, pa.int64()),
            self.id_col: batch[self.id_col].take(idx),
            self.vec_col: batch[self.vec_col].take(idx),
        })


_BUCKET_CAP_UNSET = object()


def _resolve_bucket_cap(nbits: int, bucket_cap) -> Optional[int]:
    """Default skew-guard resolution: ON (10k) for LSH buckets, OFF for
    nbits=0 exact mode where everything lands in ONE bucket by design —
    a silent cap there would return zero pairs instead of the answer."""
    if bucket_cap is _BUCKET_CAP_UNSET:
        return None if nbits == 0 else 10_000
    return bucket_cap


def embedding_near_dups(ds_emb, threshold: float = 0.95,
                        vec_col: str = "embedding", id_col: str = "vec_id",
                        nbits: int = 8, bucket_cap=_BUCKET_CAP_UNSET,
                        probes: int = 0, num_buckets: int = 64):
    """LSH-bucketed cosine near-dup pairs. Scale path: per-bucket
    brute-force only (buckets are small); exact pairs above threshold may
    miss cross-bucket pairs — that's the documented LSH recall trade; use
    nbits=0 to force one bucket (exact, quadratic), or ``probes`` > 0
    for multiprobe recall (each vector also lands in the `probes`
    lowest-margin bit-flip buckets; recall rises monotonically with
    probes, payload grows (probes+1)×, and a pair-dedup exchange is
    added since a pair can now meet in several buckets).

    At scale, size nbits so buckets stay in worker memory (expected
    bucket = n / 2^nbits, and the in-bucket matmul is quadratic).
    ``bucket_cap`` is the same explicit skew-guard contract as the
    minhash/simhash band caps: a bucket larger than the cap is SKIPPED
    (degenerate buckets, e.g. all-zero embeddings, otherwise take O(m²)
    memory). It defaults ON (10,000) for the LSH mode, but UNSET for
    nbits=0 — exact mode puts every row in one bucket by design, and a
    silent cap there would return zero pairs instead of the exact
    answer. Pass ``None``/an int explicitly to override either way."""
    bucket_cap = _resolve_bucket_cap(nbits, bucket_cap)
    dim = len(ds_emb.take(1)[0][vec_col])
    _cache: dict = {}
    key = (dim, nbits, vec_col, id_col, probes)

    def sig_batch(b: pa.Table) -> pa.Table:
        st = _cache.get(key)
        if st is None:
            st = _cache[key] = HyperplaneLSHStage(
                dim=dim, nbits=nbits, vec_col=vec_col, id_col=id_col,
                probes=probes)
        return st(b)

    sig = ds_emb.map_batches(sig_batch, batch_format="pyarrow")

    def bucket_pairs(g: pa.Table) -> pa.Table:
        from .knn import _as_matrix, _normalize

        if len(g) < 2 or (bucket_cap is not None and len(g) > bucket_cap):
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids = ids[order]
        mat = _normalize(_as_matrix(g[vec_col])[order])
        sims = mat @ mat.T
        ia, ib = np.triu_indices(len(ids), k=1)
        if probes:
            # multiprobe replicates each vector probes+1 times; inside a
            # bucket the same id can appear more than once — self-pairs
            # and in-bucket duplicates are dropped here, cross-bucket
            # duplicates by the distinct exchange below
            dup = ids[ia] == ids[ib]
            ia, ib = ia[~dup], ib[~dup]
        keep = sims[ia, ib] >= threshold
        return pa.table({"id_a": pa.array(ids[ia][keep], pa.int64()),
                         "id_b": pa.array(ids[ib][keep], pa.int64()),
                         "cosine": pa.array(sims[ia, ib][keep], pa.float64())})

    pairs = sig.groupby("bucket").map_groups(bucket_pairs,
                                             batch_format="pyarrow")
    if not probes:
        return pairs
    from .shuffle import add_bucket_column

    bucketed = pairs.map_batches(
        lambda b: add_bucket_column(b, ["id_a", "id_b"], num_buckets),
        batch_format="pyarrow")

    def distinct(g: pa.Table) -> pa.Table:
        df = g.select(["id_a", "id_b", "cosine"]).to_pandas()
        df = df.drop_duplicates(["id_a", "id_b"])
        return pa.Table.from_pandas(df, preserve_index=False)

    return bucketed.groupby("bucket").map_groups(distinct,
                                                 batch_format="pyarrow")


def _distinct_id_hash_rows(ids: np.ndarray, wh: np.ndarray):
    """Distinct (id, hash) rows via one lexsort + consecutive-duplicate
    mask — ~10× faster than np.unique(axis=0)'s void-dtype sort on the
    multi-million-row window explodes."""
    if not len(ids):
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    ids = ids.astype(np.int64, copy=False)
    wh = wh.astype(np.int64, copy=False)
    order = np.lexsort((wh, ids))
    si, sw = ids[order], wh[order]
    keep = np.empty(len(si), bool)
    keep[0] = True
    np.logical_or(si[1:] != si[:-1], sw[1:] != sw[:-1], out=keep[1:])
    return si[keep], sw[keep]


def ngram_contamination(train_ds, eval_ds, n: int = 5, col: str = "text",
                        id_col: str = "doc_id", num_buckets: int = 32,
                        broadcast_eval_limit: int = 20_000_000):
    """Benchmark-contamination check (the decontamination pass of the
    LLM-training-data literature — e.g. GPT-3 appendix C / Brown et al.
    2020's 13-gram filtering, here over `n`-word windows): for every
    TRAIN doc, count how many of its DISTINCT n-gram windows also occur
    anywhere in the EVAL set, plus the contamination ratio. Docs shorter
    than `n` words emit no row (no windows → nothing to test).

    Window hashing is the md5-lower-64 primitive shared with the
    span/fingerprint oracles (`span_windows_batch`), so the DuckDB
    oracle reproduces it exactly.

    Plan: the eval side reduces to its DISTINCT window-hash set — eval
    benchmarks are tiny next to a training corpus by construction, so
    below ``broadcast_eval_limit`` the sorted hash array ships once via
    ``ray.put`` and the train side is ONE map_batches pass (a doc's
    windows all live in its own row, so per-doc distinct + searchsorted
    membership never crosses a shuffle). Above the limit, a bucketed
    flag-join lane co-locates train windows with eval hashes by hash
    bucket and a two-phase aggregate rebuilds the per-doc counts
    (forced-equivalence pytest).
    """
    import ray

    from .shuffle import (add_bucket_column, grouped_count,
                          two_phase_aggregate)

    ev_win = eval_ds.map_batches(
        lambda b: span_windows_batch(b, n, col, id_col),
        batch_format="pyarrow")
    ev_hashes = grouped_count(ev_win, ["whash"], "cnt",
                              num_buckets=num_buckets).select_columns(["whash"])
    ev_hashes = ev_hashes.materialize()

    def finish(b: pa.Table) -> pa.Table:
        tot = b["n_ngrams"].to_numpy(zero_copy_only=False).astype(np.int64)
        hit = b["n_overlap"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_ngrams": pa.array(tot, pa.int64()),
            "n_overlap": pa.array(hit, pa.int64()),
            "contamination": pa.array(hit / tot, pa.float64()),
            "contaminated": pa.array((hit > 0).astype(np.int64), pa.int64()),
        })

    if ev_hashes.count() <= broadcast_eval_limit:
        eh = ev_hashes.to_pandas()
        ev_sorted = (np.sort(eh["whash"].to_numpy().astype(np.int64))
                     if len(eh) else np.empty(0, np.int64))
        eref = ray.put(ev_sorted)
        _cache: dict = {}

        def per_doc(b: pa.Table) -> pa.Table:
            ev = _cache.get("e")
            if ev is None:
                ev = _cache["e"] = ray.get(eref)
            w = span_windows_batch(b, n, col, id_col)
            ids = w["doc_id"].to_numpy(zero_copy_only=False)
            wh = w["whash"].to_numpy(zero_copy_only=False)
            dids, dwh = _distinct_id_hash_rows(ids, wh)
            uids, inv = (np.unique(dids, return_inverse=True)
                         if len(dids)
                         else (np.empty(0, np.int64),
                               np.empty(0, np.int64)))
            tot = np.bincount(inv, minlength=len(uids)).astype(np.int64)
            if len(ev) and len(dwh):
                pos = np.searchsorted(ev, dwh)
                pos[pos >= len(ev)] = len(ev) - 1
                ishit = (ev[pos] == dwh).astype(np.int64)
            else:
                ishit = np.zeros(len(dwh), np.int64)
            hit = np.zeros(len(uids), np.int64)
            np.add.at(hit, inv, ishit)
            return pa.table({
                "doc_id": pa.array(uids.astype(np.int64), pa.int64()),
                "n_ngrams": pa.array(tot, pa.int64()),
                "n_overlap": pa.array(hit, pa.int64())})

        return train_ds.map_batches(
            per_doc, batch_format="pyarrow").map_batches(
            finish, batch_format="pyarrow")

    # bucketed flag-join lane: DISTINCT train windows (side 0) union eval
    # hashes (side 1), co-located by whash bucket; each bucket flags
    # membership with one vectorized is_in, then a two-phase per-doc
    # aggregate. Explode + per-doc distinct happen inside ONE UDF over
    # the raw doc rows: a doc's windows all derive from its single input
    # row, so distinctness is complete before Ray can split the (much
    # larger) window table into blocks — a separate distinct stage after
    # the explode would dedup per BLOCK, not per doc, and double-count
    # duplicate windows straddling a split.

    def tr_distinct(b: pa.Table) -> pa.Table:
        w = span_windows_batch(b, n, col, id_col)
        ids = w["doc_id"].to_numpy(zero_copy_only=False)
        wh = w["whash"].to_numpy(zero_copy_only=False)
        dids, dwh = _distinct_id_hash_rows(ids, wh)
        t = pa.table({"doc_id": pa.array(dids, pa.int64()),
                      "whash": pa.array(dwh, pa.int64())})
        t = add_bucket_column(t, ["whash"], num_buckets)
        return t.append_column("_side", pa.array(np.zeros(len(t), np.int8)))

    def ev_tag(b: pa.Table) -> pa.Table:
        t = pa.table({"doc_id": pa.nulls(len(b), pa.int64()),
                      "whash": b["whash"]})
        t = add_bucket_column(t, ["whash"], num_buckets)
        return t.append_column("_side", pa.array(np.ones(len(t), np.int8)))

    unioned = (train_ds.map_batches(tr_distinct, batch_format="pyarrow")
               .union(ev_hashes.map_batches(ev_tag, batch_format="pyarrow")))

    def flag_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = g["_side"].to_numpy(zero_copy_only=False)
        rows = g.filter(pa.array(side == 0))
        keys = (g.filter(pa.array(side == 1))["whash"]
                .combine_chunks().unique().drop_null())
        hit = pc.fill_null(pc.is_in(rows["whash"], value_set=keys), False)
        return pa.table({
            "doc_id": rows["doc_id"],
            "one": pa.array(np.ones(len(rows), np.int64), pa.int64()),
            "hit": pa.array(hit.to_numpy(zero_copy_only=False)
                            .astype(np.int64), pa.int64())})

    flagged = unioned.groupby("bucket").map_groups(
        flag_bucket, batch_format="pyarrow")
    per_doc_tbl = two_phase_aggregate(
        flagged, ["doc_id"],
        [("one", "sum"), ("hit", "sum")], ["pn", "ph"],
        [("pn", "sum"), ("ph", "sum")], ["n_ngrams", "n_overlap"],
        num_buckets=num_buckets)
    return per_doc_tbl.map_batches(finish, batch_format="pyarrow")


def incremental_dedup(incoming_ds, base_ds, col: str = "text",
                      id_col: str = "doc_id", num_buckets: int = 32):
    """INCREMENTAL ingestion dedup (the production pattern for a
    continuously-growing corpus: dedup the NEW batch against the
    existing corpus without re-processing the corpus): keep the min-id
    row per content hash within the incoming batch, then drop any whose
    content already exists in the base.

    Plan: incoming reduces to narrow (hash, min id) via the two-phase
    aggregate; the base side contributes ONLY its content-hash column
    (never payloads); the membership test is the bucketed anti
    semi-join, so neither the base hash set nor the incoming survivors
    ever assume driver residence. Both sides stream."""
    from .shuffle import bucketed_key_semi_join

    # the incoming-side reduction IS exact_dedup (one definition of the
    # min-id-per-hash plan; its output carries (content_hash, id))
    first = exact_dedup(incoming_ds, col=col, id_col=id_col,
                        num_buckets=num_buckets)
    base_hashes = base_ds.map_batches(
        lambda b: content_hash_batch(b, col).select(["content_hash"]),
        batch_format="pyarrow")
    fresh = bucketed_key_semi_join(first, base_hashes, "content_hash",
                                   anti=True, num_buckets=num_buckets)
    return fresh.map_batches(lambda b: b.select([id_col]),
                             batch_format="pyarrow")


_SEG_PACK_BITS = 20  # seg_idx packs into the low 20 bits of the winner key


def segment_rows_batch(batch: pa.Table, seg_words: int = 20,
                       col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Explode documents into fixed-width word segments (the unit of
    C4/Lee-et-al paragraph-style dedup, adapted to the newline-free
    corpus): lowercase + whitespace-split, consecutive runs of
    ``seg_words`` tokens re-joined with single spaces (the last segment
    may be shorter). Emits (doc_id, seg_idx, seg_text, packed) — packed
    = doc_id·2^20 + seg_idx is the injective first-occurrence key the
    dedup minimizes. Arrow-vectorized: the per-segment join is one
    ``pc.binary_join`` over a ListArray sliced at segment boundaries; no
    Python loop over tokens."""
    from .retrieval import whitespace_tokens

    lowered = pc.utf8_lower(batch[col])
    flat, parent, dl = whitespace_tokens(lowered)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)

    n_segs = -(-dl // seg_words)  # ceil
    if n_segs.size and int(n_segs.max()) >= (1 << _SEG_PACK_BITS):
        raise ValueError(
            f"document with {int(dl.max())} tokens exceeds the "
            f"2^{_SEG_PACK_BITS} segment packing bound — raise seg_words")

    # segment boundaries in the flat token stream: every seg_words
    # tokens within a doc, plus each doc start
    doc_start = np.zeros(len(dl) + 1, np.int64)
    np.cumsum(dl, out=doc_start[1:])
    total_segs = int(n_segs.sum())
    seg_doc = np.repeat(np.arange(len(dl), dtype=np.int64), n_segs)
    seg_first = np.zeros(len(n_segs) + 1, np.int64)
    np.cumsum(n_segs, out=seg_first[1:])
    seg_idx = np.arange(total_segs, dtype=np.int64) - seg_first[seg_doc]
    offsets = np.empty(total_segs + 1, np.int64)
    offsets[:total_segs] = doc_start[seg_doc] + seg_idx * seg_words
    offsets[total_segs] = doc_start[-1]
    if total_segs:
        # segments tile the flat token stream contiguously (a segment
        # ends exactly where the next begins, and each doc's last
        # segment ends on the doc boundary), so the start offsets plus
        # the stream length form a valid monotone ListArray offset set
        seg_lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int64()),
            flat if isinstance(flat, pa.Array) else flat.combine_chunks())
        seg_text = pc.binary_join(seg_lists, " ")
    else:
        seg_text = pa.array([], pa.string())

    return pa.table({
        id_col: pa.array(ids[seg_doc], pa.int64()),
        "seg_idx": pa.array(seg_idx, pa.int64()),
        "seg_text": seg_text,
        "packed": pa.array(ids[seg_doc] * (1 << _SEG_PACK_BITS) + seg_idx,
                           pa.int64()),
    })


def segment_dedup(ds, seg_words: int = 20, col: str = "text",
                  id_col: str = "doc_id", num_buckets: int = 64):
    """Segment-level exact dedup with document reassembly — the C4 /
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better") paragraph-dedup shape over fixed ``seg_words`` word
    windows: a segment survives iff it is the FIRST occurrence of its
    content corpus-wide (min (doc_id, seg_idx)); each document is then
    reassembled from its surviving segments in order.

    → (doc_id, n_segs, n_kept, kept_text) — one row per input document
    (zero-segment documents report 0/0/'').

    Plan (100-TB shape): the winner election moves only narrow
    (seg_hash, packed) rows through one two-phase min aggregate; the
    payload-carrying segment rows move exactly once, through the
    bucketed semi join against the winner keys (packed is injective, so
    membership in the winner set IS survivorship); reassembly unions
    the survivors with tiny per-doc meta rows and buckets by doc id —
    no driver-resident state anywhere. The segmentation map runs twice
    (winner branch + payload branch) by design: recomputing a tokenize
    is cheaper at scale than pinning the exploded corpus."""
    from .shuffle import (add_bucket_column, bucketed_key_semi_join,
                          two_phase_aggregate)
    from .text import md5_lower64

    def seg_rows(b: pa.Table) -> pa.Table:
        return segment_rows_batch(b, seg_words, col, id_col)

    def seg_keys(b: pa.Table) -> pa.Table:
        t = segment_rows_batch(b, seg_words, col, id_col)
        h = np.fromiter((md5_lower64(s) for s in t["seg_text"].to_pylist()),
                        np.uint64, len(t)).astype(np.int64)
        return pa.table({"seg_hash": pa.array(h, pa.int64()),
                         "packed": t["packed"]})
    winners = two_phase_aggregate(
        ds.map_batches(seg_keys, batch_format="pyarrow"),
        keys=["seg_hash"],
        partial_aggs=[("packed", "min")], partial_names=["w"],
        final_aggs=[("w", "min")], final_names=["w"],
        num_buckets=num_buckets)

    survivors = bucketed_key_semi_join(
        ds.map_batches(seg_rows, batch_format="pyarrow"),
        winners.map_batches(lambda b: b.select(["w"]),
                            batch_format="pyarrow"),
        key="packed", right_key="w", num_buckets=num_buckets)

    def meta_rows(b: pa.Table) -> pa.Table:
        from .retrieval import whitespace_tokens

        _f, _p, dl = whitespace_tokens(pc.utf8_lower(b[col]))
        return pa.table({
            id_col: b[id_col].combine_chunks().cast(pa.int64()),
            "n_segs": pa.array(-(-dl // seg_words), pa.int64()),
        })

    meta = ds.map_batches(meta_rows, batch_format="pyarrow")

    # union survivors (side 0) + meta (side 1) into one doc-id-bucketed
    # exchange; each bucket reassembles its documents vectorized
    def tag_s(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col], "seg_idx": b["seg_idx"],
            "seg_text": b["seg_text"],
            "n_segs": pa.nulls(len(b), pa.int64()),
            "_side": pa.array(np.zeros(len(b), np.int8))})

    def tag_m(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col],
            "seg_idx": pa.nulls(len(b), pa.int64()),
            "seg_text": pa.nulls(len(b), pa.string()),
            "n_segs": b["n_segs"],
            "_side": pa.array(np.ones(len(b), np.int8))})

    unioned = (survivors.map_batches(tag_s, batch_format="pyarrow")
               .union(meta.map_batches(tag_m, batch_format="pyarrow")))
    bucketed = unioned.map_batches(
        lambda b: add_bucket_column(b, [id_col], num_buckets),
        batch_format="pyarrow")

    def assemble(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        m = g.filter(pa.array(side == 1))
        s = g.filter(pa.array(side == 0))
        mid = m[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        morder = np.argsort(mid, kind="stable")
        mid = mid[morder]
        nsegs = m["n_segs"].to_numpy(
            zero_copy_only=False).astype(np.int64)[morder]
        sid = s[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sidx = s["seg_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((sidx, sid))
        stext = s["seg_text"].take(pa.array(order, pa.int64()))
        sid = sid[order]
        n_kept = np.zeros(len(mid), np.int64)
        pos = np.searchsorted(mid, sid)
        np.add.at(n_kept, pos, 1)
        # join kept segments per doc: ListArray over survivor runs
        kept_off = np.zeros(len(mid) + 1, np.int64)
        np.cumsum(n_kept, out=kept_off[1:])
        lists = pa.ListArray.from_arrays(
            pa.array(kept_off, pa.int64()),
            stext.combine_chunks() if isinstance(stext, pa.ChunkedArray)
            else stext)
        kept_text = pc.binary_join(lists, " ")
        return pa.table({
            id_col: pa.array(mid, pa.int64()),
            "n_segs": pa.array(nsegs, pa.int64()),
            "n_kept": pa.array(n_kept, pa.int64()),
            "kept_text": kept_text,
        })

    out = bucketed.groupby("bucket").map_groups(assemble,
                                                batch_format="pyarrow")
    return out.map_batches(
        lambda b: b.drop_columns(
            [c for c in ("bucket",) if c in b.column_names]),
        batch_format="pyarrow")


def winnow_near_dups(ds_docs, min_shared: int = 2, k: int = 3, w: int = 4,
                     col: str = "text", id_col: str = "doc_id",
                     num_buckets: int = 64, bucket_cap: int = 1000,
                     as_dataset: bool = False):
    """Near-dup pair mining via WINNOWING fingerprints (the MOSS
    detector): docs sharing ≥ ``min_shared`` selected fingerprints —
    by the winnowing guarantee, any shared w+k-1-token run yields a
    shared fingerprint, so this finds LOCAL copied passages that
    whole-document MinHash similarity dilutes away.

    Plan: distinct (doc, fp) explode (map-side, text.winnow_fp_rows) →
    fp-hash-bucketed pair generation with the per-fp ``bucket_cap``
    skew guard (an fp shared by more docs than the cap is boilerplate,
    not plagiarism — dropped deterministically, mirrored by the
    oracle) → one two-phase count per pair → threshold. Returns a
    Dataset (id_a, id_b, n_shared)."""
    from .shuffle import add_bucket_column, two_phase_aggregate

    def fp_rows(b: pa.Table) -> pa.Table:
        from .text import winnow_fp_rows_batch

        return winnow_fp_rows_batch(b, k, w, col, id_col)

    rows = ds_docs.map_batches(fp_rows, batch_format="pyarrow")
    bucketed = rows.map_batches(
        lambda b: add_bucket_column(b, ["fp"], num_buckets),
        batch_format="pyarrow")
    # one pair row per SHARED fp (not distinct): multiplicity is the
    # statistic being counted
    pairs = bucketed.groupby("bucket").map_groups(
        lambda g: _segment_pairs_table(g, ["fp"], id_col, bucket_cap),
        batch_format="pyarrow")
    counted = two_phase_aggregate(
        pairs, keys=["id_a", "id_b"],
        partial_aggs=[("id_a", "count")], partial_names=["pc"],
        final_aggs=[("pc", "sum")], final_names=["n_shared"],
        num_buckets=num_buckets)
    thresholded = counted.map_batches(
        lambda b: b.filter(pc.greater_equal(b["n_shared"],
                                            pa.scalar(min_shared))),
        batch_format="pyarrow")
    if as_dataset:
        # the distributed lane for pair lists too large to collect:
        # stays a Dataset end-to-end (consumers bucket or write it)
        return thresholded
    # default: the thresholded pair list is small (bounded by the capped
    # candidate generation) — collect like the other pair miners so the
    # empty case keeps its schema
    out = thresholded.to_pandas()
    if len(out) == 0:
        return _empty_pairs("n_shared", np.int64)
    return (out.sort_values(["id_a", "id_b"])
            .reset_index(drop=True))


def incremental_near_dup(incoming_ds, base_ds, threshold: float = 0.5,
                         col: str = "text", id_col: str = "doc_id",
                         **kw):
    """Near-dup INCREMENTAL ingestion (the MinHash companion to
    incremental_dedup's exact-hash pass): drop each incoming doc that
    is a verified near-duplicate (Jaccard ≥ threshold) of any BASE
    doc. Incoming-incoming near-dups are NOT dropped — that is the
    separate within-batch pass; this operator's contract is "new
    versus corpus". Ids must be disjoint across sides.

    Plan: ONE LSH banding over the union (the band exchange cannot be
    avoided — cross-side candidates need co-located bands), the
    existing capped candidate generation + distributed Jaccard verify
    (minhash_near_dups), then the pair list — small by construction —
    classifies ends by a broadcast membership probe of incoming ids
    RESTRICTED to pair participants (never the whole incoming id set
    driver-side), and survivors emerge from one broadcast anti
    semi-join. Returns a Dataset of surviving incoming (id_col) rows."""
    import ray

    from .events import broadcast_semi_join

    both = incoming_ds.union(base_ds)
    pairs = minhash_near_dups(both, threshold=threshold, col=col,
                              id_col=id_col, **kw)
    incoming_ids = incoming_ds.map_batches(
        lambda b: b.select([id_col]), batch_format="pyarrow")
    if len(pairs) == 0:
        return incoming_ids
    pair_ids = np.unique(np.concatenate(
        [pairs["id_a"].to_numpy(), pairs["id_b"].to_numpy()]))
    # which pair participants are incoming? probe the incoming side
    # with the (small) pair-id set — narrow rows only
    probe_ref = ray.put(set(pair_ids.tolist()))
    inc_members = set(broadcast_semi_join(
        incoming_ids, id_col, probe_ref).to_pandas()[id_col].tolist())
    a_in = pairs["id_a"].isin(inc_members).to_numpy()
    b_in = pairs["id_b"].isin(inc_members).to_numpy()
    cross = a_in != b_in
    dropped = set(np.where(a_in[cross], pairs["id_a"].to_numpy()[cross],
                           pairs["id_b"].to_numpy()[cross]).tolist())
    drop_ref = ray.put(dropped)
    return broadcast_semi_join(incoming_ids, id_col, drop_ref, anti=True)


def gram_dup_exposure(ds_docs, n: int = 5, col: str = "text",
                      id_col: str = "doc_id", num_buckets: int = 16,
                      broadcast_flag_limit: int = 20_000_000):
    """Per-document DUPLICATION EXPOSURE: of a doc's n-gram
    occurrences, how many have gram content that appears in ≥ 2
    DISTINCT documents corpus-wide — the doc-level "how much of me is
    boilerplate/copied" signal (the C4/Gopher duplicate-n-gram
    fraction's numerator, corpus-global rather than within-doc).
    Integer outputs (doc_id, n_grams, n_shared_grams); callers derive
    the fraction.

    Plan: one narrow distinct-(doc, gram-hash) explode → two-phase
    distinct-doc frequency → the shared-gram FLAG SET (hashes with
    df ≥ 2) broadcasts via ray.put below ``broadcast_flag_limit``
    (8 B/hash; above it, swap in the bucketed flag-join lane exactly as
    ngram_contamination does — same shape, same cutover reasoning) →
    a second pass over docs counts flagged occurrences per doc
    in-batch. Documents move zero times; the exchange carries only
    hashes."""
    import ray

    from .shuffle import two_phase_aggregate
    from .text import _winnow_gram_hashes

    def distinct_rows(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m, h_all, first = _winnow_gram_hashes(b, n, col)
        out_i, out_h = [], []
        for d in range(len(ids)):
            md = int(m[d])
            if md == 0:
                continue
            u = np.unique(h_all[first[d]: first[d] + md])
            out_i.append(np.full(len(u), ids[d], np.int64))
            out_h.append(u)
        if not out_i:
            return pa.table({"gh": pa.array([], pa.int64())})
        return pa.table({"gh": pa.array(
            np.concatenate(out_h).astype(np.int64), pa.int64())})

    dfreq = two_phase_aggregate(
        ds_docs.map_batches(distinct_rows, batch_format="pyarrow"),
        keys=["gh"],
        partial_aggs=[("gh", "count")], partial_names=["pc"],
        final_aggs=[("pc", "sum")], final_names=["df"],
        num_buckets=num_buckets)
    flagged = dfreq.map_batches(
        lambda b: b.filter(pc.greater_equal(b["df"], pa.scalar(2)))
        .select(["gh"]), batch_format="pyarrow")
    flag_tbl = flagged.to_pandas()
    if len(flag_tbl) > broadcast_flag_limit:
        raise ValueError(
            f"{len(flag_tbl)} shared grams exceed broadcast_flag_limit="
            f"{broadcast_flag_limit}: use the bucketed flag-join lane "
            "(ngram_contamination's above-limit plan)")
    flag_ref = ray.put(set(flag_tbl["gh"].tolist()))
    cache: dict = {}

    def exposure(b: pa.Table) -> pa.Table:
        flags = cache.get("f")
        if flags is None:
            flags = cache["f"] = ray.get(flag_ref)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m, h_all, first = _winnow_gram_hashes(b, n, col)
        shared = np.zeros(len(ids), np.int64)
        for d in range(len(ids)):
            md = int(m[d])
            if md == 0:
                continue
            h = h_all[first[d]: first[d] + md].astype(np.int64)
            shared[d] = sum(1 for x in h if x in flags)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_grams": pa.array(m, pa.int64()),
            "n_shared_grams": pa.array(shared, pa.int64())})

    return ds_docs.map_batches(exposure, batch_format="pyarrow")
