"""Corpus retrieval + LM-quality scoring stages.

BM25 ranking (Robertson/Sparck-Jones as popularized by Lucene) and a
corpus-trained bigram language-model log-probability score (the
CCNet-style "how fluent is this document under a cheap LM" quality
gate). Both are expressed as streaming Ray Data stages: narrow
statistics passes, vectorized Arrow/numpy token work, and top-k /
per-doc aggregation without materializing the corpus.

No reference-repo counterpart (the reference is a tile engine); these
extend the LLM-training-data surface alongside stages/text.py and
stages/dedup.py.

Float-parity discipline (the DuckDB oracles must hash-match):
- every float expression is written with an explicit association order
  and mirrored token-for-token in the SQL oracle;
- order-insensitive per-doc sums use fixed-point int64
  (floor(x * 1e9 + 0.5)) so summation order cannot wobble ulps;
- SQL float literals must be spelled in e-notation (1.2e0) so DuckDB
  parses DOUBLE, not DECIMAL.
"""
from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["bm25_topk", "bigram_logprob", "whitespace_tokens", "pmi_top_pairs",
           "inverted_index", "tfidf_topk"]


def _libm_log(x: np.ndarray) -> np.ndarray:
    """Elementwise natural log routed through libm (math.log) instead of
    numpy's SIMD kernel: np.log diverges from DuckDB's ln by 1 ulp on
    some inputs (measured), which would break the bit-exact oracle
    parity. Memoized over unique values — callers arrange for few
    distinct inputs (counts, not raw floats)."""
    u, inv = np.unique(x, return_inverse=True)
    lu = np.fromiter((math.log(v) for v in u), np.float64, len(u))
    return lu[inv]


def whitespace_tokens(col: pa.ChunkedArray | pa.Array):
    """(flat tokens, parent doc index, per-doc token count) for a string
    column — Arrow-vectorized, mirrors Python's str.split() (runs of
    whitespace, no empty tokens). Returns (tokens: pa.Array,
    parent: np.int64 array, dl: np.int64 array)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lists = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(
        pc.coalesce(col, pa.scalar(""))))
    flat = pc.list_flatten(lists)
    dl = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    parent = np.repeat(np.arange(len(dl), dtype=np.int64), dl)
    # trim+split leaves [''] for empty/whitespace-only docs: drop those
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    if not nonempty.all():
        flat = flat.filter(pa.array(nonempty))
        parent = parent[nonempty]
        dl = np.bincount(parent, minlength=len(dl)).astype(np.int64)
    return flat, parent, dl


def bm25_topk(ds_docs, query_terms, k: int = 10, col: str = "text",
              id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75):
    """Top-k documents by BM25 score for a fixed bag of query terms.

    Plan (all streaming, two passes over the narrow (id, text) columns):
      1. stats pass — map_batches emits ONE row per block with
         (n_docs, n_tokens, df_term1..df_termQ); the driver sums a
         handful of ints (KBs, mergeable, no shuffle);
      2. score pass — map_batches computes every doc's score
         vectorized (flat-token compare + bincount per term, float64
         with a fixed association order), keeps its block-local top-k;
         the driver merges block heads (k × #blocks rows).

    Scale: both passes are narrow column scans; nothing wide shuffles
    and the corpus never materializes. The score formula keeps docs
    with score > 0 only (a doc containing no query term scores exactly
    0.0 by construction)."""
    import pandas as pd

    terms = list(query_terms)
    q = len(terms)

    def stats_block(batch: pa.Table) -> pa.Table:
        flat, parent, dl = whitespace_tokens(batch[col])
        n = len(batch)
        cols = {"n_docs": pa.array([n], pa.int64()),
                "n_tokens": pa.array([int(dl.sum())], pa.int64())}
        for j, t in enumerate(terms):
            hit = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            ndocs_with = int((np.bincount(parent[hit], minlength=n) > 0).sum())
            cols[f"df_{j}"] = pa.array([ndocs_with], pa.int64())
        return pa.table(cols)

    stats = (ds_docs.map_batches(stats_block, batch_format="pyarrow")
             .sum(["n_docs", "n_tokens"] + [f"df_{j}" for j in range(q)]))
    n_total = int(stats["sum(n_docs)"])
    tot_tokens = int(stats["sum(n_tokens)"])
    dfs = [int(stats[f"sum(df_{j})"]) for j in range(q)]
    avgdl = tot_tokens / n_total
    # idf_t = ln(1 + ((N - df) + 0.5) / (df + 0.5)) — association order
    # mirrored exactly in the SQL oracle; math.log (libm) because
    # np.log is 1 ulp off DuckDB's ln on some inputs
    idfs = [math.log(1.0 + ((n_total - df) + 0.5) / (df + 0.5)) for df in dfs]

    def score_block(batch: pa.Table) -> pa.Table:
        flat, parent, dl = whitespace_tokens(batch[col])
        n = len(batch)
        dlf = dl.astype(np.float64)
        score = np.zeros(n, dtype=np.float64)
        for j, t in enumerate(terms):
            hit = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            tf = np.bincount(parent[hit], minlength=n).astype(np.float64)
            # idf * (tf * (k1+1)) / (tf + k1 * ((1-b) + b * (dl/avgdl)))
            contrib = idfs[j] * (tf * (k1 + 1.0)) / \
                (tf + k1 * ((1.0 - b) + b * (dlf / avgdl)))
            score = score + contrib
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        pos = (score > 0.0).nonzero()[0]
        if len(pos) > k:
            # block-local head under the SAME total order as the global
            # merge (score desc, id asc) — plain argpartition breaks
            # score ties arbitrarily and can drop the doc the global
            # tiebreak would keep
            order = np.lexsort((ids[pos], -score[pos]))
            top = pos[order[:k]]
        else:
            top = pos
        return pa.table({id_col: pa.array(ids[top], pa.int64()),
                         "score": pa.array(score[top], pa.float64())})

    heads = ds_docs.map_batches(score_block, batch_format="pyarrow").to_pandas()
    if len(heads) == 0:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    out = heads.sort_values(["score", id_col], ascending=[False, True]).head(k)
    return out.reset_index(drop=True)


def bigram_logprob(ds_docs, col: str = "text", id_col: str = "doc_id",
                   alpha: float = 0.5, num_buckets: int = 64,
                   broadcast_vocab_limit: int = 2_000_000):
    """Per-document mean bigram log-probability under a LM trained on
    the corpus itself — the classic cheap fluency/quality gate for
    training-data pipelines (add-alpha smoothed):

        P(w2 | w1) = (c(w1,w2) + α) / (c1(w1) + α·V)

    where c(w1,w2) counts the bigram over the corpus, c1(w) counts w as
    a bigram LEFT token, and V is the distinct unigram vocabulary size.
    score(doc) = (Σ round_1e9(ln P)) / 1e9 / n_bigrams over the doc's
    bigram occurrences — the sum is fixed-point int64 so it is
    order-independent (bit-exact vs the SQL oracle), with one float
    division at the end. Docs with < 2 tokens have no bigrams and are
    excluded (both sides of the parity check).

    Plan: explode (doc_id, w1, bgkey) bigram rows once — materialized,
    since three consumers read it (Arrow-vectorized shift-compare, no
    Python token loops) → two-phase counted bigram and left-unigram
    tables (pre-reduced per block before the one exchange) → annotate
    occurrences with counts. The vocabulary size V needs one extra
    token-level pass over the docs: it counts distinct UNIGRAMS, which
    the bigram rows cannot supply (a one-token doc has vocabulary but
    no bigrams). The count tables broadcast via ray.put below
    `broadcast_vocab_limit` rows; above it the plan cuts over to
    bucketed hash joins (the genuinely-huge-vocab shape: nothing
    driver-resident)."""
    import ray

    from .shuffle import bucketed_hash_join, two_phase_aggregate

    def explode_bigrams(batch: pa.Table) -> pa.Table:
        flat, parent, _dl = whitespace_tokens(batch[col])
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(parent) < 2:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "w1": pa.array([], pa.string()),
                             "bgkey": pa.array([], pa.string())})
        adj = parent[1:] == parent[:-1]
        idx = np.nonzero(adj)[0]
        w1 = flat.take(pa.array(idx, pa.int64()))
        w2 = flat.take(pa.array(idx + 1, pa.int64()))
        # injective composite join key: "len(w1):w1:w2" — the length
        # prefix disambiguates w1's extent whatever its content, so two
        # distinct bigrams can never share a key
        bgkey = pc.binary_join_element_wise(
            pc.cast(pc.utf8_length(w1), pa.string()), w1, w2, ":")
        return pa.table({
            id_col: pa.array(ids[parent[idx]], pa.int64()),
            "w1": w1,
            "bgkey": bgkey,
        })

    # three consumers (c2, c1, annotate/join) — materialize so the
    # corpus is tokenized and exploded exactly once, not re-run lazily
    # per consumer
    bg = ds_docs.map_batches(explode_bigrams,
                             batch_format="pyarrow").materialize()

    c2 = two_phase_aggregate(
        bg.map_batches(lambda t: t.select(["bgkey"]), batch_format="pyarrow"),
        keys=["bgkey"],
        partial_aggs=[("bgkey", "count")], partial_names=["pc"],
        final_aggs=[("pc", "sum")], final_names=["c2"]).materialize()
    c1 = two_phase_aggregate(
        bg.map_batches(lambda t: t.select(["w1"]), batch_format="pyarrow"),
        keys=["w1"],
        partial_aggs=[("w1", "count")], partial_names=["pc"],
        final_aggs=[("pc", "sum")], final_names=["c1"]).materialize()

    def explode_tokens(batch: pa.Table) -> pa.Table:
        flat, _p, _dl = whitespace_tokens(batch[col])
        u = flat.unique() if isinstance(flat, pa.Array) else flat
        return pa.table({"w": u})

    vocab = two_phase_aggregate(
        ds_docs.map_batches(explode_tokens, batch_format="pyarrow"),
        keys=["w"],
        partial_aggs=[("w", "count")], partial_names=["pc"],
        final_aggs=[("pc", "sum")], final_names=["n"])
    v_size = int(vocab.count())

    n_c2 = c2.count()
    if n_c2 <= broadcast_vocab_limit:
        import pandas as pd

        df2 = c2.to_pandas()
        df1 = c1.to_pandas()
        lut2_ref = ray.put((df2["bgkey"].to_numpy(),
                            df2["c2"].to_numpy().astype(np.int64)))
        lut1_ref = ray.put((df1["w1"].to_numpy(),
                            df1["c1"].to_numpy().astype(np.int64)))
        cache: dict = {}

        def annotate(batch: pa.Table) -> pa.Table:
            st = cache.get("l")
            if st is None:
                k2, v2 = ray.get(lut2_ref)
                k1, v1 = ray.get(lut1_ref)
                # pd.Index hash lookup — one vectorized probe per batch
                # column, no per-row Python dict loop
                st = cache["l"] = (pd.Index(k2), v2, pd.Index(k1), v1)
            i2, v2, i1, v1 = st
            p2 = i2.get_indexer(batch["bgkey"].to_numpy(
                zero_copy_only=False))
            p1 = i1.get_indexer(batch["w1"].to_numpy(
                zero_copy_only=False))
            # every occurrence key exists in the luts (the counts were
            # derived from the SAME materialized bg); get_indexer's -1
            # miss marker would otherwise silently read v[-1]
            if (p2 < 0).any() or (p1 < 0).any():
                raise KeyError("bigram occurrence missing from count lut "
                               "(bg must stay materialized)")
            cc2 = v2[p2]
            cc1 = v1[p1]
            return _contrib_table(batch, id_col, cc2, cc1, alpha, v_size)

        annotated = bg.map_batches(annotate, batch_format="pyarrow")
    else:
        j2 = bucketed_hash_join(bg, c2, "bgkey", "bgkey",
                                num_buckets=num_buckets)
        j1 = bucketed_hash_join(j2, c1, "w1", "w1",
                                num_buckets=num_buckets)

        def contrib(batch: pa.Table) -> pa.Table:
            cc2 = batch["c2"].to_numpy(zero_copy_only=False).astype(np.int64)
            cc1 = batch["c1"].to_numpy(zero_copy_only=False).astype(np.int64)
            return _contrib_table(batch, id_col, cc2, cc1, alpha, v_size)

        annotated = j1.map_batches(contrib, batch_format="pyarrow")

    per_doc = two_phase_aggregate(
        annotated, keys=[id_col],
        partial_aggs=[("lp_int", "sum"), ("lp_int", "count")],
        partial_names=["ps", "pn"],
        final_aggs=[("ps", "sum"), ("pn", "sum")],
        final_names=["lp_sum", "n_bigrams"])

    def finalize(batch: pa.Table) -> pa.Table:
        s = batch["lp_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = batch["n_bigrams"].to_numpy(zero_copy_only=False).astype(np.float64)
        # (sum / 1e9) / n — association order mirrored in the oracle
        lp = (s / 1.0e9) / n
        return pa.table({
            id_col: batch[id_col].combine_chunks().cast(pa.int64()),
            "logprob": pa.array(lp, pa.float64()),
            "n_bigrams": pa.array(n.astype(np.int64), pa.int64())})

    return per_doc.map_batches(finalize, batch_format="pyarrow")


def _contrib_table(batch: pa.Table, id_col: str, c2: np.ndarray,
                   c1: np.ndarray, alpha: float, v_size: int) -> pa.Table:
    """Fixed-point bigram log-prob contribution rows:
    floor((ln(c2 + α) - ln(c1 + α·V)) * 1e9 + 0.5) as int64 — the
    order-independent addend (identical expression in the oracle).
    Written as a difference of logs so each log's argument is a small
    integer count plus α: few distinct values, so the libm-parity log
    memo stays cheap."""
    lp = _libm_log(c2 + alpha) - _libm_log(c1 + alpha * v_size)
    lpi = np.floor(lp * 1.0e9 + 0.5).astype(np.int64)
    return pa.table({id_col: batch[id_col].combine_chunks().cast(pa.int64()),
                     "lp_int": pa.array(lpi, pa.int64())})


def pmi_top_pairs(ds_docs, k: int = 20, min_df: int = 5, min_pair: int = 3,
                  col: str = "text", id_col: str = "doc_id",
                  num_buckets: int = 64, group_cap: int = 10_000):
    """Top-k token pairs by pointwise mutual information over per-doc
    DISTINCT co-occurrence: pmi = ln(n_pair·N / (df_a·df_b)), the
    classic collocation statistic.

    Plan: distinct (doc, token) explode → two-phase doc-frequency counts
    → vocabulary TRIM (df ≥ min_df) broadcast once via ray.put (the trim
    bounds the broadcast at total_token_occurrences/min_df — at corpus
    scale raise min_df, the statistic is meaningless for rare tokens
    anyway) → token-id pairs per doc via the bucketed segment-pair
    exchange (vocab index order == lexicographic order, so id_a < id_b
    ⇔ tok_a < tok_b) → two-phase pair counts → vectorized PMI in int64
    NANONATS (floor(ln(arg)·1e9 + 0.5), libm log for DuckDB ulp parity,
    the ratio formed as one exact-int division so the float tree is
    deterministic) → distributed sort + limit k.

    Returns a Dataset (tok_a, tok_b, n_pair, pmi_nano)."""
    import ray

    from .graph import _strict_segment_pairs
    from .shuffle import add_bucket_column, grouped_count

    docs = ds_docs.materialize()
    n_docs = docs.count()

    def distinct_tokens(b: pa.Table) -> pa.Table:
        toks, parent, _ = whitespace_tokens(b[col])
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(
            np.int64)[parent]
        t = pa.table({"doc_id": pa.array(ids, pa.int64()), "tok": toks})
        return pa.Table.from_pandas(
            t.to_pandas().drop_duplicates(), preserve_index=False)

    # two consumers (df counts + the pair stage) — pin the explode once
    dt = docs.map_batches(distinct_tokens,
                          batch_format="pyarrow").materialize()
    dfc = grouped_count(dt, ["tok"], "df", num_buckets=num_buckets)
    vd = dfc.map_batches(
        lambda b: b.filter(pc.greater_equal(b["df"], min_df)),
        batch_format="pyarrow").to_pandas()
    if len(vd) == 0:
        # an all-empty filter result can come back column-less
        vtok = np.empty(0, dtype=str)
        vdfs = np.empty(0, dtype=np.int64)
    else:
        raw = np.asarray(vd["tok"].to_numpy(), dtype=object).astype(str)
        order = np.argsort(raw, kind="stable")
        vtok = raw[order]
        vdfs = vd["df"].to_numpy().astype(np.int64)[order]
    vocab_ref = ray.put((vtok, vdfs))
    _cache: dict = {}

    def _vocab():
        v = _cache.get("v")
        if v is None:
            v = _cache["v"] = ray.get(vocab_ref)
        return v

    def to_tid(b: pa.Table) -> pa.Table:
        vt, _ = _vocab()
        tok = np.asarray(b["tok"].to_pandas(), dtype=object).astype(str)
        if len(vt) == 0 or len(tok) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "tid": pa.array([], pa.int64())})
        pos = np.searchsorted(vt, tok)
        pos_c = np.minimum(pos, len(vt) - 1)
        hit = vt[pos_c] == tok
        return pa.table({
            "doc_id": pa.array(
                b["doc_id"].to_numpy(zero_copy_only=False)[hit], pa.int64()),
            "tid": pa.array(pos_c[hit].astype(np.int64), pa.int64())})

    dtv = dt.map_batches(to_tid, batch_format="pyarrow")
    bucketed = dtv.map_batches(
        lambda b: add_bucket_column(b, ["doc_id"], num_buckets),
        batch_format="pyarrow")
    # RAISING cap (graph._strict_segment_pairs), not the LSH family's
    # silent skip: the PMI statistic is exact and the SQL oracle has no
    # cap, so a doc with > group_cap distinct in-vocab tokens must fail
    # loudly (raise group_cap or min_df deliberately) rather than
    # silently understate pair counts and diverge from the oracle.
    pairs = bucketed.groupby("bucket").map_groups(
        lambda g: _strict_segment_pairs(g, "doc_id", "tid", group_cap),
        batch_format="pyarrow")
    counts = grouped_count(pairs, ["id_a", "id_b"], "n_pair",
                           num_buckets=num_buckets)

    def score(b: pa.Table) -> pa.Table:
        vt, vdf = _vocab()
        n_pair = b["n_pair"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = n_pair >= min_pair
        n_pair = n_pair[keep]
        ia = b["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        ib = b["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        num = (n_pair * np.int64(n_docs)).astype(np.float64)
        den = (vdf[ia] * vdf[ib]).astype(np.float64)
        pmi = np.floor(_libm_log(num / den) * 1e9 + 0.5).astype(np.int64)
        return pa.table({
            "tok_a": pa.array(vt[ia].astype(object), pa.string()),
            "tok_b": pa.array(vt[ib].astype(object), pa.string()),
            "n_pair": pa.array(n_pair, pa.int64()),
            "pmi_nano": pa.array(pmi, pa.int64())})

    scored = counts.map_batches(score, batch_format="pyarrow")
    return scored.sort(["pmi_nano", "tok_a", "tok_b"],
                       descending=[True, False, False]).limit(k)


def inverted_index(ds_docs, col: str = "text", id_col: str = "doc_id",
                   min_df: int = 1, num_buckets: int = 64):
    """Distributed inverted-index build: one row per term with its
    document frequency and an md5 digest of the ascending-doc_id posting
    list ("id,id,..."). The digest certifies the exact posting-list
    CONTENT through the driver's hash compare without shipping list
    columns; a real deployment would write the lists themselves to the
    partitioned sink — the construction (distinct-explode, term-hash
    co-location, in-bucket ordered assembly) is identical.

    Plan: distinct (doc, token) explode → bucket by TERM hash (posting
    lists assemble where their term lands, never on the driver) → one
    sorted pass per bucket, md5 per term segment. Returns a Dataset
    (tok, df, postings_md5)."""
    import hashlib

    from .shuffle import add_bucket_column

    def distinct_tokens(b: pa.Table) -> pa.Table:
        toks, parent, _ = whitespace_tokens(b[col])
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(
            np.int64)[parent]
        t = pa.table({"doc_id": pa.array(ids, pa.int64()), "tok": toks})
        return pa.Table.from_pandas(
            t.to_pandas().drop_duplicates(), preserve_index=False)

    dt = ds_docs.map_batches(distinct_tokens, batch_format="pyarrow")
    bucketed = dt.map_batches(
        lambda b: add_bucket_column(b, ["tok"], num_buckets),
        batch_format="pyarrow")

    def assemble(g: pa.Table) -> pa.Table:
        df = g.select(["tok", "doc_id"]).to_pandas()
        df = df.sort_values(["tok", "doc_id"], kind="stable")
        tok = df["tok"].to_numpy()
        ids = df["doc_id"].to_numpy().astype(np.int64)
        n = len(tok)
        boundary = np.zeros(n, dtype=bool)
        boundary[1:] = tok[1:] != tok[:-1]
        cuts = np.nonzero(boundary)[0]
        starts = np.concatenate([[0], cuts])
        ends = np.concatenate([cuts, [n]])
        out_t, out_df, out_h = [], [], []
        for s, e in zip(starts, ends):
            if e - s < min_df:
                continue
            out_t.append(tok[s])
            out_df.append(e - s)
            out_h.append(hashlib.md5(
                ",".join(map(str, ids[s:e])).encode()).hexdigest())
        return pa.table({
            "tok": pa.array(out_t, pa.string()),
            "df": pa.array(np.asarray(out_df, np.int64), pa.int64()),
            "postings_md5": pa.array(out_h, pa.string())})

    return bucketed.groupby("bucket").map_groups(
        assemble, batch_format="pyarrow")


def tfidf_topk(ds_docs, k: int = 3, col: str = "text",
               id_col: str = "doc_id", num_buckets: int = 64):
    """Per-document top-k terms by tf·idf (idf = ln(N/df) over distinct
    per-doc occurrence), ties broken by term ascending — the classic
    keyword-extraction primitive.

    Plan: one explode pass feeds BOTH the per-(doc, term) tf counts
    (in-block — a doc's tokens live in one row) and the distinct-doc
    df counts (two-phase). The (term, df) table broadcasts once via
    ray.put (bounded by the distinct vocabulary; trim upstream for
    open-web scale), scoring is one vectorized pass, and the per-doc
    head runs under a doc-hash bucket groupby — Ray's dynamic block
    splitting may split one map_batches output across blocks, so a
    block-local head is NOT split-safe; the bucket co-location is.
    Scores are fixed-point int64 nano-units (floor(tf·idf·1e9 + 0.5),
    libm log) for bit-exact SQL parity."""
    import ray

    from .shuffle import grouped_count

    def doc_term_counts(b: pa.Table) -> pa.Table:
        toks, parent, _ = whitespace_tokens(b[col])
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(
            np.int64)[parent]
        t = pa.table({"doc_id": pa.array(ids, pa.int64()), "tok": toks})
        df = t.to_pandas().groupby(["doc_id", "tok"], sort=False) \
            .size().reset_index(name="tf")
        return pa.Table.from_pandas(df, preserve_index=False)

    dtc = ds_docs.map_batches(doc_term_counts,
                              batch_format="pyarrow").materialize()
    n_docs = ds_docs.count()
    dfc = grouped_count(
        dtc.map_batches(lambda b: b.select(["tok"]),
                        batch_format="pyarrow"),
        ["tok"], "df", num_buckets=num_buckets).to_pandas()
    raw = np.asarray(dfc["tok"].to_numpy(), dtype=object).astype(str)
    order = np.argsort(raw, kind="stable")
    vref = ray.put((raw[order],
                    dfc["df"].to_numpy().astype(np.int64)[order]))
    _cache: dict = {}

    def score(b: pa.Table) -> pa.Table:
        m = _cache.get("v")
        if m is None:
            m = _cache["v"] = ray.get(vref)
        vt, vdf = m
        tok = np.asarray(b["tok"].to_pandas(), dtype=object).astype(str)
        tf = b["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        df_ = vdf[np.searchsorted(vt, tok)]
        idf = _libm_log((np.float64(n_docs) / df_.astype(np.float64)))
        score = np.floor(tf.astype(np.float64) * idf * 1e9
                         + 0.5).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "tok": pa.array(tok.astype(object), pa.string()),
                         "tfidf_nano": pa.array(score, pa.int64())})

    from .shuffle import add_bucket_column

    scored = dtc.map_batches(score, batch_format="pyarrow")
    bucketed = scored.map_batches(
        lambda b: add_bucket_column(b, ["doc_id"], num_buckets),
        batch_format="pyarrow")

    def head(g: pa.Table) -> pa.Table:
        import pandas as pd
        d = g.select(["doc_id", "tok", "tfidf_nano"]).to_pandas()
        d = d.sort_values(["doc_id", "tfidf_nano", "tok"],
                          ascending=[True, False, True], kind="stable")
        d = d.groupby("doc_id", sort=False).head(k)
        return pa.Table.from_pandas(d, preserve_index=False)

    return bucketed.groupby("bucket").map_groups(head,
                                                 batch_format="pyarrow")


def dsir_weights(ds_docs, target_col: str = "lang",
                 target_value: str = "en", hash_buckets: int = 1024,
                 col: str = "text", id_col: str = "doc_id",
                 num_buckets: int = 64):
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): hashed-bigram bag
    features; the log importance weight of a document under the
    add-1-smoothed target/raw multinomials is

        log w(doc) = Σ_grams [ ln(t[b]+1) − ln(r[b]+1) ]
                     + n · [ ln(R+B) − ln(T+B) ]

    where b = md5_64(bigram) mod B, t/r are target/raw per-bucket
    occurrence counts and T/R their totals. Emitted per document with
    ≥ 1 bigram as (doc_id, n_bigrams, weight_nano): the weight in
    int64 NANONATS (each occurrence contributes
    floor(lp·1e9 + 0.5) — order-independent, bit-equal to the SQL
    oracle; callers exponentiate for resampling).

    Plan: one narrow (doc_id, bucket, tgt) bigram explode, materialized
    for its three consumers; the count vectors are B-bounded (map-side
    bincount partials + one tiny keyed merge, driver fold ≤ B rows);
    the annotate pass is a pure array lookup; per-doc totals are one
    two-phase sum. Nothing driver-resident grows with the corpus."""
    from .shuffle import two_phase_aggregate
    from .text import md5_lower64

    B = int(hash_buckets)

    def explode(batch: pa.Table) -> pa.Table:
        flat, parent, _dl = whitespace_tokens(batch[col])
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        tgt_doc = pc.equal(batch[target_col], target_value)
        tgt_doc = pc.fill_null(tgt_doc, False).to_numpy(zero_copy_only=False)
        if len(parent) < 2:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "tgt": pa.array([], pa.int8())})
        adj = parent[1:] == parent[:-1]
        idx = np.nonzero(adj)[0]
        w1 = flat.take(pa.array(idx, pa.int64()))
        w2 = flat.take(pa.array(idx + 1, pa.int64()))
        bgkey = pc.binary_join_element_wise(
            pc.cast(pc.utf8_length(w1), pa.string()), w1, w2, ":")
        h = np.fromiter((md5_lower64(s) for s in bgkey.to_pylist()),
                        np.uint64, len(idx))
        docs_of = parent[idx]
        return pa.table({
            id_col: pa.array(ids[docs_of], pa.int64()),
            "b": pa.array((h % np.uint64(B)).astype(np.int64), pa.int64()),
            "tgt": pa.array(tgt_doc[docs_of].astype(np.int8), pa.int8()),
        })

    bg = ds_docs.map_batches(explode, batch_format="pyarrow").materialize()

    def hist(batch: pa.Table) -> pa.Table:
        b = batch["b"].to_numpy(zero_copy_only=False)
        tg = batch["tgt"].to_numpy(zero_copy_only=False).astype(bool)
        r = np.bincount(b, minlength=B)
        t = np.bincount(b[tg], minlength=B)
        hot = np.nonzero(r)[0]
        return pa.table({"b": pa.array(hot, pa.int64()),
                         "pr": pa.array(r[hot], pa.int64()),
                         "pt": pa.array(t[hot], pa.int64())})

    counts = two_phase_aggregate(
        bg.map_batches(hist, batch_format="pyarrow"),
        keys=["b"],
        partial_aggs=[("pr", "sum"), ("pt", "sum")],
        partial_names=["pr", "pt"],
        final_aggs=[("pr", "sum"), ("pt", "sum")],
        final_names=["r", "t"], num_buckets=8)
    # bounded driver fold: ≤ B rows whatever the corpus size
    ctab = counts.to_pandas()
    r_vec = np.zeros(B, np.int64)
    t_vec = np.zeros(B, np.int64)
    r_vec[ctab["b"].to_numpy()] = ctab["r"].to_numpy()
    t_vec[ctab["b"].to_numpy()] = ctab["t"].to_numpy()
    R, T = int(r_vec.sum()), int(t_vec.sum())
    const = math.log(R + B) - math.log(T + B)
    # per-bucket contribution table (B doubles) — shipped in the closure
    lp_by_bucket = np.floor(
        ((_libm_log(t_vec + 1.0) - _libm_log(r_vec + 1.0)) + const)
        * 1.0e9 + 0.5).astype(np.int64)

    def annotate(batch: pa.Table) -> pa.Table:
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: batch[id_col],
            "lp_int": pa.array(lp_by_bucket[b], pa.int64())})

    per_doc = two_phase_aggregate(
        bg.map_batches(annotate, batch_format="pyarrow"),
        keys=[id_col],
        partial_aggs=[("lp_int", "sum"), ("lp_int", "count")],
        partial_names=["ps", "pn"],
        final_aggs=[("ps", "sum"), ("pn", "sum")],
        final_names=["weight_nano", "n_bigrams"],
        num_buckets=num_buckets)
    return per_doc.map_batches(
        lambda b: pa.table({
            id_col: b[id_col].combine_chunks().cast(pa.int64()),
            "n_bigrams": b["n_bigrams"].combine_chunks().cast(pa.int64()),
            "weight_nano": b["weight_nano"].combine_chunks().cast(pa.int64()),
        }), batch_format="pyarrow")
