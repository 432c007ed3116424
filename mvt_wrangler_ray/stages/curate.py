"""Corpus curation reporting operators.

Three operators every large-scale training-data pipeline runs before
(and while) training:

- **Deterministic split assignment** (`assign_split_batch`,
  `split_stats`): hash each document id into train/val/test with the
  same SQL-reproducible multiplicative hash the engine's deterministic
  sampler uses, so the split is stable across runs, machines, and
  re-shards — no RNG state, any worker can re-derive any row's split.
- **Filter-funnel report** (`filter_funnel`): the stage-by-stage
  survivor count (input → length gate → language gate → quality gate →
  exact dedup) that corpus papers publish (e.g. the C4 / Gopher / RefinedWeb
  data cards). One pass computes every per-document gate; the only
  shuffle is the narrow distinct-hash exchange for the dedup stage.
- **Token-length histogram** (`token_histogram`): document length
  distribution in power-of-two buckets — the report that sizes
  sequence-packing `seq_len` and flags truncation loss. Bucket edges
  are exact integer math (no float log2), so the DuckDB oracle
  (`length(bin(n+1)) - 1`) matches bit-for-bit.

Scale shape: every operator is map-side partial aggregation into a tiny
keyed merge (`two_phase_aggregate`); driver state is bounded by the
number of splits / stages / buckets (≤ ~64 rows), never by the corpus.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# The same SQL-reproducible multiplicative hash as the deterministic
# sampler (`__ray_entry__._q_sample`) and the geotagger: Knuth's
# 2654435761 (2^32 / phi), folded to 32 bits, bucketed mod 100.
_KNUTH = np.uint64(2654435761)
_MASK32 = np.uint64(0xFFFFFFFF)


def split_bucket(ids: np.ndarray) -> np.ndarray:
    """0..99 bucket per id — ((id * 2654435761) mod 2^32) mod 100."""
    return ((ids.astype(np.uint64) * _KNUTH) & _MASK32) % np.uint64(100)


def assign_split_batch(batch: pa.Table, id_col: str = "doc_id",
                       train_pct: int = 90, val_pct: int = 5,
                       out: str = "split") -> pa.Table:
    """Append a deterministic train/val/test split column.

    bucket < train_pct → 'train'; < train_pct+val_pct → 'val';
    else 'test'. Pure integer math, reproducible in SQL:
    ``((doc_id * 2654435761) % 4294967296) % 100``.
    """
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    b = split_bucket(ids)
    split = np.where(b < np.uint64(train_pct), "train",
                     np.where(b < np.uint64(train_pct + val_pct), "val",
                              "test"))
    return batch.append_column(out, pa.array(split, pa.string()))


def split_stats(ds, id_col: str = "doc_id", text_col: str = "text",
                train_pct: int = 90, val_pct: int = 5):
    """Per-split document and character counts.

    → Dataset[split:string, n_docs:int64, n_chars:int64] (≤ 3 rows).
    Map-side partials (3 rows per block) into a tiny keyed merge — the
    shuffle moves O(blocks) rows regardless of corpus size.
    """
    from .shuffle import two_phase_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        t = assign_split_batch(batch, id_col, train_pct, val_pct)
        nch = pc.cast(pc.utf8_length(t[text_col]), pa.int64())
        return pa.table({"split": t["split"],
                         "one": pa.array(np.ones(len(t), np.int64)),
                         "nch": nch})

    narrow = ds.map_batches(partial, batch_format="pyarrow")
    return two_phase_aggregate(
        narrow, keys=["split"],
        partial_aggs=[("one", "sum"), ("nch", "sum")],
        partial_names=["pn", "pc_"],
        final_aggs=[("pn", "sum"), ("pc_", "sum")],
        final_names=["n_docs", "n_chars"], num_buckets=4)


def funnel_flags_batch(batch: pa.Table, text_col: str = "text",
                       min_tokens: int = 5, max_tokens: int = 5000,
                       langs: Sequence[str] = ("en",),
                       min_quality: float = 0.2,
                       id_col: str = "doc_id") -> pa.Table:
    """Per-document cumulative gate flags + content hash (narrow row).

    Gates mirror pipelines/corpus.clean_corpus bit-for-bit (same Arrow
    kernels, same IEEE op order for the quality composite) plus a token
    length gate; each flag is the AND-cascade so stage survivor counts
    are plain column sums.
    """
    from .dedup import content_hash_batch
    from .text import lang_id_batch, quality_score_batch, token_count_batch

    t = token_count_batch(batch, text_col)
    t = quality_score_batch(t, text_col)
    t = lang_id_batch(t)
    ntok = t["n_tokens"].to_numpy(zero_copy_only=False)
    q = t["quality_score"].to_numpy(zero_copy_only=False)
    pl = np.asarray(t["predicted_lang"].to_pylist(), dtype=object)
    p_len = (ntok >= min_tokens) & (ntok <= max_tokens)
    p_lang = p_len & np.isin(pl, list(langs))
    p_qual = p_lang & (q >= min_quality)
    hashed = content_hash_batch(batch, text_col, out="content_hash")
    return pa.table({
        id_col: batch[id_col],
        "pass_len": pa.array(p_len),
        "pass_lang": pa.array(p_lang),
        "pass_qual": pa.array(p_qual),
        "content_hash": hashed["content_hash"],
    })


def filter_funnel(ds, text_col: str = "text", id_col: str = "doc_id",
                  min_tokens: int = 5, max_tokens: int = 5000,
                  langs: Sequence[str] = ("en",),
                  min_quality: float = 0.2,
                  num_buckets: int = 32) -> pa.Table:
    """Stage-by-stage survivor counts for the standard curation chain.

    → pa.Table[stage:string, survivors:int64] with exactly five rows:
    input, length, language, quality, exact_dedup (cumulative gates; the
    dedup stage counts distinct content hashes among quality survivors —
    the min-id-survivor count of stages/dedup.exact_dedup).

    One pass computes every per-document flag; the narrow flag table is
    pinned once for its two consumers (the flag sums and the distinct-
    hash exchange), so document payloads move zero times and driver
    state is five integers.
    """
    from .shuffle import two_phase_aggregate

    def flags(batch: pa.Table) -> pa.Table:
        return funnel_flags_batch(batch, text_col, min_tokens, max_tokens,
                                  langs, min_quality, id_col)

    narrow = ds.map_batches(flags, batch_format="pyarrow").materialize()

    n_input = narrow.count()
    sums = narrow.map_batches(
        lambda b: pa.table({
            "l": [int(pc.sum(pc.cast(b["pass_len"], pa.int64())).as_py() or 0)],
            "g": [int(pc.sum(pc.cast(b["pass_lang"], pa.int64())).as_py() or 0)],
            "q": [int(pc.sum(pc.cast(b["pass_qual"], pa.int64())).as_py() or 0)],
        }), batch_format="pyarrow")
    agg = sums.sum(["l", "g", "q"]) or {}
    agg = {k: int(agg.get(k) or 0) for k in ("sum(l)", "sum(g)", "sum(q)")}

    # distinct content hashes among quality survivors = exact-dedup
    # survivor count (one narrow hash exchange; payloads never move)
    qual_hashes = narrow.map_batches(
        lambda b: b.filter(b["pass_qual"]).select(["content_hash"]),
        batch_format="pyarrow")
    n_dedup = two_phase_aggregate(
        qual_hashes, keys=["content_hash"],
        partial_aggs=[("content_hash", "count")], partial_names=["c"],
        final_aggs=[("c", "sum")], final_names=["n"],
        num_buckets=num_buckets).count()

    return pa.table({
        "stage": pa.array(["input", "length", "language", "quality",
                           "exact_dedup"], pa.string()),
        "survivors": pa.array([n_input, int(agg["sum(l)"]),
                               int(agg["sum(g)"]), int(agg["sum(q)"]),
                               n_dedup], pa.int64()),
    })


_POW2 = (np.int64(1) << np.arange(62, dtype=np.int64))


def log2_bucket(v: np.ndarray) -> np.ndarray:
    """floor(log2(v + 1)) in exact integer math (no float log)."""
    return (np.searchsorted(_POW2, v.astype(np.int64) + 1, side="right")
            - 1).astype(np.int64)


def token_histogram(ds, text_col: str = "text"):
    """Document token-length histogram in power-of-two buckets.

    → Dataset[len_bucket:int64, n_docs:int64, sum_tokens:int64] where
    len_bucket = floor(log2(n_tokens + 1)). Map-side partials (≤ ~20
    rows per block) into a tiny keyed merge. (Named len_bucket: plain
    "bucket" would collide with the exchange's own shuffle column.)
    """
    from .shuffle import two_phase_aggregate
    from .text import token_count_batch

    def partial(batch: pa.Table) -> pa.Table:
        t = token_count_batch(batch, text_col)
        ntok = t["n_tokens"].to_numpy(zero_copy_only=False)
        return pa.table({
            "len_bucket": pa.array(log2_bucket(ntok)),
            "one": pa.array(np.ones(len(t), np.int64)),
            "tok": pa.array(ntok.astype(np.int64)),
        })

    narrow = ds.map_batches(partial, batch_format="pyarrow")
    return two_phase_aggregate(
        narrow, keys=["len_bucket"],
        partial_aggs=[("one", "sum"), ("tok", "sum")],
        partial_names=["pn", "pt"],
        final_aggs=[("pn", "sum"), ("pt", "sum")],
        final_names=["n_docs", "sum_tokens"], num_buckets=8)


def curriculum_rank(ds, id_col: str = "doc_id", text_col: str = "text",
                    seed: int = 0, n_phases: int = 10,
                    bucket_bits: int = 8):
    """Quality-curriculum training order: rank every document ascending
    in (phase, splitmix(id ^ seed), id), where phase 0 holds the
    HIGHEST-quality decile (phase = (n_phases-1) - clip(floor(
    quality_score * n_phases))) — curriculum learning's easy-to-hard
    schedule with a seeded, replayable shuffle inside each phase.

    Same scale shape as stages/shuffle.seeded_shuffle_rank (its
    docstring has the full argument): a distributed prefix sum over
    composite (phase, hash-range) buckets — driver state is
    n_phases * 2^bucket_bits ints — then one narrow groupby co-locates
    each bucket and ranks with a lexsort. Only (id, phase, hash,
    bucket) cross the exchange; payloads and text never move (text is
    read once to score quality map-side).

    → Dataset[id_col:int64, phase:int64, curriculum_rank:int64].
    """
    import ray

    from .shuffle import _splitmix
    from .text import quality_score_batch

    if not 1 <= bucket_bits <= 20:
        raise ValueError("bucket_bits must be in [1, 20]")
    shift = np.uint64(64 - bucket_bits)
    sd = np.uint64(seed)
    top = np.int64(n_phases - 1)

    def narrow_batch(batch: pa.Table) -> pa.Table:
        t = quality_score_batch(batch, text_col)
        qs = t["quality_score"].to_numpy(zero_copy_only=False)
        phase = top - np.minimum(
            np.floor(qs * float(n_phases)).astype(np.int64), top)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _splitmix(ids.astype(np.uint64) ^ sd)
        cbucket = phase * np.int64(1 << bucket_bits) \
            + (h >> shift).astype(np.int64)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "phase": pa.array(phase, pa.int64()),
            "h": pa.array(h, pa.uint64()),
            "cbucket": pa.array(cbucket, pa.int64()),
        })

    narrow = ds.map_batches(narrow_batch, batch_format="pyarrow").materialize()

    def bucket_partials(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["cbucket"]).aggregate([([], "count_all")])
        return g.rename_columns(
            ["n" if c == "count_all" else c for c in g.column_names])

    totals: dict = {}
    for row in narrow.map_batches(
            bucket_partials, batch_format="pyarrow").take_all():
        totals[row["cbucket"]] = totals.get(row["cbucket"], 0) + row["n"]
    base, acc = {}, 0
    for b in sorted(totals):   # ascending cbucket == ascending (phase, h-range)
        base[b] = acc
        acc += totals[b]
    base_ref = ray.put(base)

    def rank_group(g: pa.Table) -> pa.Table:
        bases = ray.get(base_ref)
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = g["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((ids, h))
        b = int(g["cbucket"][0].as_py())
        return pa.table({
            id_col: pa.array(ids[order], pa.int64()),
            "phase": g["phase"].take(pa.array(order)),
            "curriculum_rank": pa.array(
                bases[b] + np.arange(len(ids), dtype=np.int64)),
        })

    return narrow.groupby("cbucket").map_groups(rank_group,
                                                batch_format="pyarrow")


def validate_corpus(ds, id_col: str = "doc_id", text_col: str = "text",
                    num_buckets: int = 32) -> pa.Table:
    """Corpus data-quality gate — the checks to run before training:

    → pa.Table[check:string, value:int64] with rows n_rows, n_null_id,
    n_null_text, n_empty_text (whitespace-only counts), n_dup_ids
    (rows minus distinct ids). All but the distinct-id check are
    map-side partial sums; the distinct count is one narrow id
    exchange. Driver state: five integers.
    """
    from .shuffle import two_phase_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        ids, txt = batch[id_col], batch[text_col]
        n = len(batch)
        null_id = int(pc.sum(
            pc.cast(pc.is_null(ids), pa.int64())).as_py() or 0)
        null_tx = int(pc.sum(
            pc.cast(pc.is_null(txt), pa.int64())).as_py() or 0)
        empty = int(pc.sum(pc.cast(
            pc.equal(pc.utf8_trim_whitespace(pc.fill_null(txt, "")), ""),
            pa.int64())).as_py() or 0)
        return pa.table({"n": pa.array([n], pa.int64()),
                         "ni": pa.array([null_id], pa.int64()),
                         "nt": pa.array([null_tx], pa.int64()),
                         "ne": pa.array([empty], pa.int64())})

    sums = ds.map_batches(partial, batch_format="pyarrow").sum(
        ["n", "ni", "nt", "ne"]) or {}
    n_rows = int(sums.get("sum(n)") or 0)
    n_distinct = two_phase_aggregate(
        ds.map_batches(lambda b: b.select([id_col]),
                       batch_format="pyarrow"),
        keys=[id_col],
        partial_aggs=[(id_col, "count")], partial_names=["c"],
        final_aggs=[("c", "sum")], final_names=["cnt"],
        num_buckets=num_buckets).count()

    return pa.table({
        "check": pa.array(["n_rows", "n_null_id", "n_null_text",
                           "n_empty_text", "n_dup_ids"], pa.string()),
        "value": pa.array([n_rows, int(sums.get("sum(ni)") or 0),
                           int(sums.get("sum(nt)") or 0),
                           int(sums.get("sum(ne)") or 0),
                           n_rows - n_distinct], pa.int64()),
    })


def cluster_representatives(ds, threshold: float = 0.35,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            num_buckets: int = 32,
                            clusters_ds=None):
    """Quality-aware near-dup representative selection — keep the BEST
    member of each duplicate cluster, not the first: for every near-dup
    cluster (MinHash-LSH pairs → connected components), pick the member
    with the highest quality score (ties → min id).

    Min-id survivor selection (stages/dedup, clean_corpus) is cheap but
    arbitrary; when near-dups differ (truncation, boilerplate, OCR
    noise), the curation literature keeps the best-quality copy. This
    operator does that selection with the same scale shape as the rest
    of the dedup family: quality is scored map-side (narrow (id, qs)
    rows), membership joins through one bucketed hash exchange, and the
    per-cluster argmax is a vectorized lexsort head per cluster-hash
    bucket.

    `clusters_ds` injects a precomputed (id_col, cluster_id) Dataset
    (e.g. from dedup.label_propagation_converged when the pair graph
    exceeds driver capacity); by default the pair graph clusters via
    union-find exactly like the certified dedup_clusters pipeline.

    → Dataset[cluster_id:int64, rep_id:int64, n_members:int64].
    """
    import ray.data as rd

    from .shuffle import add_bucket_column, bucketed_hash_join
    from .text import quality_score_batch

    if clusters_ds is None:
        from .dedup import cluster_pairs, minhash_near_dups

        pairs = minhash_near_dups(ds, threshold=threshold, col=text_col,
                                  id_col=id_col)
        if len(pairs) == 0:
            return rd.from_arrow(pa.table({
                "cluster_id": pa.array([], pa.int64()),
                "rep_id": pa.array([], pa.int64()),
                "n_members": pa.array([], pa.int64())}))
        clusters_ds = rd.from_pandas(cluster_pairs(pairs))

    def qnarrow(batch: pa.Table) -> pa.Table:
        t = quality_score_batch(batch, text_col)
        return t.select([id_col, "quality_score"])

    quality = ds.map_batches(qnarrow, batch_format="pyarrow")
    joined = bucketed_hash_join(quality, clusters_ds, id_col, id_col,
                                num_buckets=num_buckets)

    def head(g: pa.Table) -> pa.Table:
        cl = g["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        qs = g["quality_score"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -qs, cl))
        cl_s, id_s = cl[order], ids[order]
        first = np.r_[True, cl_s[1:] != cl_s[:-1]] if len(cl_s) else \
            np.zeros(0, bool)
        idx = np.flatnonzero(first)
        cnt = np.diff(np.r_[idx, len(cl_s)])
        return pa.table({
            "cluster_id": pa.array(cl_s[idx], pa.int64()),
            "rep_id": pa.array(id_s[idx], pa.int64()),
            "n_members": pa.array(cnt.astype(np.int64)),
        })

    bucketed = joined.map_batches(
        lambda b: add_bucket_column(
            b.drop_columns([c for c in ("bucket",) if c in b.column_names]),
            ["cluster_id"], num_buckets),
        batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(head, batch_format="pyarrow")


def split_leakage(ds, threshold: float = 0.35, id_col: str = "doc_id",
                  text_col: str = "text",
                  train_pct: int = 90, val_pct: int = 5) -> pa.Table:
    """Test-set leakage audit: near-duplicate pairs that CROSS
    train/val/test split boundaries. A held-out document with a near-dup
    in train is effectively memorized — this is the check to run after
    split_assign and before trusting any eval number.

    Pairs come from the certified MinHash near-dup pipeline; each end's
    split is a pure function of its id (split_bucket), so the audit
    needs no join — one vectorized pass over the bounded pair list.

    → pa.Table[split_a:string, split_b:string, n_pairs:int64] with
    split_a <= split_b lexicographically; same-split rows included so
    the table partitions the whole pair set (cross-split rows are the
    leakage).
    """
    from .dedup import minhash_near_dups

    pairs = minhash_near_dups(ds, threshold=threshold, col=text_col,
                              id_col=id_col)
    if len(pairs) == 0:
        return pa.table({"split_a": pa.array([], pa.string()),
                         "split_b": pa.array([], pa.string()),
                         "n_pairs": pa.array([], pa.int64())})

    def splits_of(ids: np.ndarray) -> np.ndarray:
        b = split_bucket(ids.astype(np.int64))
        return np.where(b < np.uint64(train_pct), "train",
                        np.where(b < np.uint64(train_pct + val_pct),
                                 "val", "test"))

    sa = splits_of(pairs["id_a"].to_numpy())
    sb = splits_of(pairs["id_b"].to_numpy())
    swap = sa > sb
    lo = np.where(swap, sb, sa)
    hi = np.where(swap, sa, sb)
    key = np.char.add(np.char.add(lo.astype(str), "|"), hi.astype(str))
    uniq, counts = np.unique(key, return_counts=True)
    parts = [k.split("|") for k in uniq]
    return pa.table({
        "split_a": pa.array([p[0] for p in parts], pa.string()),
        "split_b": pa.array([p[1] for p in parts], pa.string()),
        "n_pairs": pa.array(counts.astype(np.int64)),
    })


def vocab_coverage(ds, text_col: str = "text", k: int = 50) -> pa.Table:
    """Top-k global vocabulary with cumulative corpus coverage — the
    report that sizes a tokenizer vocabulary (what fraction of all
    token occurrences the top-k types cover).

    Tokenization mirrors the certified top_terms convention
    (lower().split(), empties dropped). Shape: word explode →
    two-phase counts → distributed (n DESC, word ASC) sort + limit k;
    the cumulative sum runs over the k returned rows only (driver
    state: k rows + one exact int64 total).

    → pa.Table[rank:int64, word:string, n:int64, cum_frac:float64].
    """
    from .shuffle import two_phase_aggregate

    def explode(b: pa.Table) -> pa.Table:
        out = []
        for t in b[text_col].to_pylist():
            out.extend((t or "").lower().split())
        return pa.table({"word": pa.array(out, pa.string())})

    counts = two_phase_aggregate(
        ds.map_batches(explode, batch_format="pyarrow"),
        keys=["word"],
        partial_aggs=[("word", "count")], partial_names=["pc"],
        final_aggs=[("pc", "sum")], final_names=["n"],
        num_buckets=32).materialize()

    total = counts.sum("n") or 0
    top = counts.sort(["n", "word"], descending=[True, False]).limit(k)
    df = top.to_pandas()
    cum = df["n"].to_numpy(dtype=np.int64).cumsum()
    return pa.table({
        "rank": pa.array(np.arange(1, len(df) + 1, dtype=np.int64)),
        "word": pa.array(df["word"], pa.string()),
        "n": pa.array(df["n"].to_numpy(), pa.int64()),
        "cum_frac": pa.array(cum.astype(np.float64) / np.float64(total),
                             pa.float64()),
    })


def quality_calibrate(ds, keep_rate: float = 0.6, text_col: str = "text",
                      num_bins: int = 4096) -> pa.Table:
    """Percentile-calibrated quality threshold: instead of a hand-picked
    quality cutoff, compute the threshold that keeps the top
    ``keep_rate`` fraction by quality score, then count the actual
    survivors at that threshold — the calibration pass a curation
    pipeline runs per-corpus before gating.

    Shape: quality scored map-side into a narrow (quality_score) table
    pinned once for its two consumers; the threshold comes from the
    mergeable fixed-bin histogram (stages/sketch.histogram_quantiles at
    q = 1 - keep_rate over the exact-dyadic [0, 1] domain — no sort, no
    wide shuffle), the survivor count is one exact vectorized compare
    pass. Driver state: the ≤ num_bins histogram + four scalars.

    → pa.Table[q:float64, threshold:float64, n_kept:int64,
    n_total:int64] (one row).
    """
    from .sketch import histogram_quantiles
    from .text import quality_score_batch

    def qnarrow(batch: pa.Table) -> pa.Table:
        t = quality_score_batch(batch, text_col)
        return t.select(["quality_score"])

    scored = ds.map_batches(qnarrow, batch_format="pyarrow").materialize()
    q = 1.0 - keep_rate
    hq = histogram_quantiles(scored, "quality_score", 0.0, 1.0,
                             num_bins=num_bins, qs=(q,))
    n_total = scored.count()
    if len(hq) == 0:
        return pa.table({"q": pa.array([q], pa.float64()),
                         "threshold": pa.array([0.0], pa.float64()),
                         "n_kept": pa.array([0], pa.int64()),
                         "n_total": pa.array([0], pa.int64())})
    thr = float(hq["est"].iloc[0])

    def count_kept(b: pa.Table) -> pa.Table:
        x = b["quality_score"].to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array([int((x >= thr).sum())], pa.int64())})

    kept = scored.map_batches(count_kept, batch_format="pyarrow").sum("k") or 0
    return pa.table({
        "q": pa.array([q], pa.float64()),
        "threshold": pa.array([thr], pa.float64()),
        "n_kept": pa.array([int(kept)], pa.int64()),
        "n_total": pa.array([n_total], pa.int64()),
    })


def truncation_report(ds, text_col: str = "text",
                      seq_lens: Sequence[int] = (128, 512, 2048)):
    """Packing-loss report per candidate sequence length: for each
    seq_len, how many tokens a truncate-at-L loader keeps vs loses and
    how many documents get truncated — the report that picks seq_len
    next to token_histogram.

    → Dataset[seq_len:int64, kept_tokens:int64, lost_tokens:int64,
    n_truncated:int64]. Map-side partials (|seq_lens| rows per block)
    into a tiny keyed merge.
    """
    from .shuffle import two_phase_aggregate
    from .text import token_count_batch

    lens = np.asarray(sorted(seq_lens), np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        ntok = token_count_batch(batch, text_col)["n_tokens"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        out_l, kept, lost, ntr = [], [], [], []
        for L in lens:
            out_l.append(L)
            kept.append(int(np.minimum(ntok, L).sum()))
            lost.append(int(np.maximum(ntok - L, 0).sum()))
            ntr.append(int((ntok > L).sum()))
        return pa.table({"seq_len": pa.array(out_l, pa.int64()),
                         "k": pa.array(kept, pa.int64()),
                         "l": pa.array(lost, pa.int64()),
                         "t": pa.array(ntr, pa.int64())})

    narrow = ds.map_batches(partial, batch_format="pyarrow")
    return two_phase_aggregate(
        narrow, keys=["seq_len"],
        partial_aggs=[("k", "sum"), ("l", "sum"), ("t", "sum")],
        partial_names=["pk", "pl", "pt"],
        final_aggs=[("pk", "sum"), ("pl", "sum"), ("pt", "sum")],
        final_names=["kept_tokens", "lost_tokens", "n_truncated"],
        num_buckets=4)
