"""Text-analysis stages for large-scale training-data pipelines:
token counting, quality scoring, language ID, document fingerprinting.

All are stateless vectorized ``map_batches`` transforms except language
ID, which is a callable class (actor pool) holding compiled regexes and
stopword tables built once per actor.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def token_count_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Whitespace token count + BPE-ish subword estimate.
    n_tokens mirrors `len(text.split())` == SQL
    `length(regexp_split_to_array(trim(col), '\\s+'))`."""
    arr = batch[col]
    trimmed = pc.utf8_trim_whitespace(arr)
    # count runs of non-space = whitespace split count (0 for empty)
    toks = pc.count_substring_regex(trimmed, pattern=r"\S+")
    # BPE-ish: ~1 token per 4 chars, minimum the word count
    n_chars = pc.utf8_length(arr)
    bpe = pc.max_element_wise(toks, pc.cast(
        pc.ceil(pc.divide(pc.cast(n_chars, pa.float64()), 4.0)), pa.int32()))
    return (batch
            .append_column("n_tokens", pc.cast(toks, pa.int64()))
            .append_column("n_tokens_bpe", pc.cast(bpe, pa.int64())))


def quality_score_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Quality heuristics: length, punctuation ratio, digit ratio,
    mean word length, and a composite [0,1] score. Pure Arrow kernels —
    SQL-reproducible (see oracle)."""
    arr = batch[col]
    n_chars = pc.cast(pc.utf8_length(arr), pa.float64())
    n_punct = pc.cast(pc.count_substring_regex(arr, pattern=r"[.!?,;:]"), pa.float64())
    n_digit = pc.cast(pc.count_substring_regex(arr, pattern=r"[0-9]"), pa.float64())
    n_words = pc.cast(pc.count_substring_regex(
        pc.utf8_trim_whitespace(arr), pattern=r"\S+"), pa.float64())
    safe_chars = pc.max_element_wise(n_chars, 1.0)
    safe_words = pc.max_element_wise(n_words, 1.0)
    punct_ratio = pc.divide(n_punct, safe_chars)
    digit_ratio = pc.divide(n_digit, safe_chars)
    mean_word_len = pc.divide(
        pc.subtract(n_chars, pc.subtract(n_words, 1.0)), safe_words)
    # composite: long enough, not punct/digit heavy
    score = pc.multiply(
        pc.min_element_wise(pc.divide(n_chars, 200.0), 1.0),
        pc.multiply(pc.subtract(1.0, pc.min_element_wise(punct_ratio, 1.0)),
                    pc.subtract(1.0, pc.min_element_wise(digit_ratio, 1.0))))
    return (batch
            .append_column("punct_ratio", punct_ratio)
            .append_column("digit_ratio", digit_ratio)
            .append_column("mean_word_len", mean_word_len)
            .append_column("quality_score", score))


_STOPWORDS: Dict[str, set] = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "que", "por"},
}


_LANGID_CACHE: dict = {}


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task wrapper over LangIdStage with a per-worker cache —
    the state (compiled regexes + stopword tables) is tiny, so task mode
    skips actor-pool startup while still building state once per worker."""
    st = _LANGID_CACHE.get("s")
    if st is None:
        st = _LANGID_CACHE["s"] = LangIdStage()
    return st(batch)


class LangIdStage:
    """n-gram + stopword language ID heuristic (callable class usable as
    an actor pool for heavy models; see lang_id_batch for the
    small-state task mode). CJK detection by unicode block; Latin
    languages by stopword hit-rate. Emits predicted_lang."""

    def __init__(self):
        self.word_re = re.compile(r"[a-zA-ZÀ-ÿ]+")
        self.cjk_re = re.compile(r"[一-鿿぀-ヿ]")
        self.tables = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        preds = np.empty(len(texts), dtype=object)
        for i, t in enumerate(texts):
            t = t or ""
            if self.cjk_re.search(t):
                preds[i] = "zh"
                continue
            words = [w.lower() for w in self.word_re.findall(t)[:200]]
            best, best_hits = "en", -1
            for lang, table in self.tables.items():
                hits = sum(1 for w in words if w in table)
                if hits > best_hits:
                    best, best_hits = lang, hits
            preds[i] = best if best_hits > 0 else "und"
        return batch.append_column("predicted_lang", pa.array(preds, pa.string()))


def chunk_docs_batch(batch: pa.Table, chunk_words: int = 50,
                     overlap: int = 10, col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Training-data chunking: split each document into overlapping
    word windows (size chunk_words, stride chunk_words - overlap) — the
    flat-map-shaped stage every LLM-corpus pipeline runs before
    tokenization. Emits (doc_id, chunk_idx, n_words, chunk_hash) — the
    hash is the md5 lower-64 of the chunk text, so the driver oracle can
    verify chunk CONTENT without shipping it."""
    step = chunk_words - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than chunk_words")
    texts = batch[col].to_pylist()
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    out_id, out_idx, out_n, out_h = [], [], [], []
    for i, t in enumerate(texts):
        words = (t or "").lower().split()
        # a tail start with start + overlap >= n yields a chunk fully
        # CONTAINED in the previous window (100% duplicated content) —
        # standard chunkers stop there
        n_w = len(words)
        starts = [s for s in range(0, n_w, step)
                  if s == 0 or s + overlap < n_w]
        for k, start in enumerate(starts):
            chunk = words[start:start + chunk_words]
            out_id.append(int(ids[i]))
            out_idx.append(k)
            out_n.append(len(chunk))
            out_h.append(md5_lower64(" ".join(chunk)))
    return pa.table({
        id_col: pa.array(out_id, pa.int64()),
        "chunk_idx": pa.array(out_idx, pa.int64()),
        "n_words": pa.array(out_n, pa.int64()),
        "chunk_hash": pa.array(
            np.array(out_h, dtype=np.uint64).astype(np.int64), pa.int64()),
    })


def repetition_stats_batch(batch: pa.Table, col: str = "text",
                           id_col: str = "doc_id") -> pa.Table:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1),
    per document: token count, distinct-token count, and the occurrence
    count of the modal word bigram — the integer numerators of the
    "fraction of duplicate n-grams" filters every pretraining pipeline
    applies. Integer outputs only, so the oracle hash is exact; the
    caller derives ratios.

    Fully vectorized: Arrow regex split → one dictionary encode → numpy
    lexsort + run-length counting (no per-row Python, no hashing —
    bigram identity is the (code_i, code_{i+1}) pair compared
    lexicographically, immune to vocab-size overflow)."""
    arr = batch[col]
    n_docs = len(arr)
    trimmed = pc.utf8_trim_whitespace(pc.utf8_lower(arr))
    toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
    lengths = pc.list_value_length(toks).fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    # an empty/whitespace-only doc splits to [''] — zero real tokens
    empty = pc.equal(trimmed, "").fill_null(True).to_numpy(
        zero_copy_only=False)
    lengths[empty] = 0

    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    codes_all = np.asarray(pc.dictionary_encode(flat).indices,
                           dtype=np.int64)
    doc_all = np.repeat(np.arange(n_docs, dtype=np.int64),
                        pc.list_value_length(toks).fill_null(0).to_numpy(
                            zero_copy_only=False).astype(np.int64))
    keep = ~empty[doc_all]
    codes, doc_idx = codes_all[keep], doc_all[keep]

    n_distinct = np.zeros(n_docs, dtype=np.int64)
    top_bigram = np.zeros(n_docs, dtype=np.int64)
    if len(codes):
        # distinct tokens per doc: sort (doc, code), count run starts
        order = np.lexsort((codes, doc_idx))
        d, c = doc_idx[order], codes[order]
        new = np.concatenate(([True], (d[1:] != d[:-1]) | (c[1:] != c[:-1])))
        np.add.at(n_distinct, d[new], 1)
        # bigrams: adjacent positions within one doc
        adj = doc_idx[1:] == doc_idx[:-1]
        if adj.any():
            bd = doc_idx[:-1][adj]
            b1, b2 = codes[:-1][adj], codes[1:][adj]
            o = np.lexsort((b2, b1, bd))
            bd, b1, b2 = bd[o], b1[o], b2[o]
            run_start = np.concatenate(([True], (bd[1:] != bd[:-1])
                                        | (b1[1:] != b1[:-1])
                                        | (b2[1:] != b2[:-1])))
            starts = np.flatnonzero(run_start)
            run_len = np.diff(np.concatenate((starts, [len(bd)])))
            run_doc = bd[starts]
            doc_first = np.concatenate(([True],
                                        run_doc[1:] != run_doc[:-1]))
            top = np.maximum.reduceat(run_len, np.flatnonzero(doc_first))
            top_bigram[run_doc[doc_first]] = top

    return pa.table({
        id_col: batch[id_col],
        "n_tokens": pa.array(lengths, pa.int64()),
        "n_distinct": pa.array(n_distinct, pa.int64()),
        "top_bigram_n": pa.array(top_bigram, pa.int64()),
    })


def md5_lower64(s: str) -> int:
    """The 64-bit md5 fold DuckDB exposes as ``md5_number_lower`` (bytes
    8..16 of the digest, little-endian) — the hash primitive shared by
    fingerprint and simhash so both have exact SQL oracles."""
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")


def fingerprint_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Document fingerprint: 64-bit md5 fold of the whitespace-normalized
    lowercased text — a cheap stable content id for exact dedup at scale.
    SQL oracle: ``md5_number_lower(trim(regexp_replace(lower(text),
    '\\s+', ' ', 'g')))`` two's-complemented to BIGINT."""
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(pc.utf8_lower(batch[col]),
                                   pattern=r"\s+", replacement=" "))
    # null text → 0, matching the SQL oracle's NULL-md5 → 0 coalesce
    out = np.fromiter(
        (md5_lower64(s) if s is not None else 0 for s in norm.to_pylist()),
        dtype=np.uint64, count=len(batch)).astype(np.int64)
    return batch.append_column("fingerprint", pa.array(out, pa.int64()))


# PII redaction patterns (RE2 syntax — pyarrow's re2 and DuckDB's
# regexp_replace are both RE2, so one pattern string serves the engine
# and the SQL oracle). Order matters: emails before phones so the
# digits inside an already-redacted token can't double-match.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Redact emails / phone numbers / IPv4 addresses from a string
    column — the standard pre-training privacy scrub, fully vectorized
    (one RE2 pass per pattern over the whole batch, no Python rows).
    Emits ``clean_text`` plus per-class redaction counts (n_email,
    n_phone, n_ip) so a downstream filter can drop PII-dense docs.

    SQL oracle: the same patterns via ``regexp_replace(..., 'g')`` and
    count via ``len(regexp_extract_all(...))``."""
    cur = batch[col]
    counts = {}
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(cur, pattern=pat), pa.int64())
        cur = pc.replace_substring_regex(cur, pattern=pat, replacement=repl)
    out = batch.append_column("clean_text", cur)
    for k, v in counts.items():
        out = out.append_column(k, v)
    return out


def winnow_fingerprints_batch(batch: pa.Table, k: int = 3, w: int = 4,
                              col: str = "text",
                              id_col: str = "doc_id") -> pa.Table:
    """WINNOWING document fingerprints (Schleimer, Wilkerson & Aiken
    2003, the MOSS algorithm): hash every k-token gram (md5 64-bit fold
    of the space-joined lowercased gram), slide a w-hash window, select
    each window's minimum hash (rightmost position on ties), and keep
    the distinct selected positions. Guarantees any shared run of
    w+k-1 tokens yields a shared fingerprint — the local-dedup
    primitive exact hashing lacks.

    Emits (doc_id, n_grams, n_fps, fp_xor): the gram count, the
    fingerprint count, and the xor-fold of the selected hashes (an
    exact certification of the selected SET). Docs with < k tokens
    report 0/0/0. Entirely map-side: no exchange.

    Hash comparisons are UNSIGNED 64-bit (DuckDB md5_number_lower
    UBIGINT order); fp_xor is two's-complemented to int64 at the end."""
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n_docs = len(ids)
    m_per_doc, h_all, doc_first = _winnow_gram_hashes(batch, k, col)

    n_fps = np.zeros(n_docs, np.int64)
    fp_xor = np.zeros(n_docs, np.uint64)
    for d in range(n_docs):
        m = int(m_per_doc[d])
        if m == 0:
            continue
        h = h_all[doc_first[d]: doc_first[d] + m]
        sel = _winnow_select(h, w)
        n_fps[d] = len(sel)
        fp_xor[d] = np.bitwise_xor.reduce(h[sel])

    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "n_grams": pa.array(m_per_doc, pa.int64()),
        "n_fps": pa.array(n_fps, pa.int64()),
        "fp_xor": pa.array(fp_xor.astype(np.int64), pa.int64()),
    })


def _winnow_gram_hashes(batch: pa.Table, k: int, col: str):
    """(grams per doc, concatenated per-doc gram hash stream, per-doc
    stream offsets) — the shared front half of the winnowing ops."""
    from .retrieval import whitespace_tokens

    flat, parent, dl = whitespace_tokens(pc.utf8_lower(batch[col]))
    n_docs = len(batch)
    m_per_doc = np.maximum(dl - (k - 1), 0)
    if not (len(parent) and m_per_doc.any()):
        return m_per_doc, np.empty(0, np.uint64), np.zeros(n_docs, np.int64)
    toks = np.asarray(flat.to_pylist(), dtype=object)
    # k-gram rows: position i valid iff tokens i..i+k-1 share a doc
    valid = parent[: len(parent) - (k - 1)] == parent[k - 1:]
    gi = np.nonzero(valid)[0]
    h_all = np.fromiter(
        (md5_lower64(" ".join(toks[i:i + k])) for i in gi),
        np.uint64, len(gi))
    gdoc = parent[gi]
    doc_first = np.searchsorted(gdoc, np.arange(n_docs))
    return m_per_doc, h_all, doc_first


def _winnow_select(h: np.ndarray, w: int) -> np.ndarray:
    """Selected positions for one doc's gram-hash stream: per-window
    minimum, rightmost on ties, position-distinct (ascending)."""
    m = len(h)
    width = min(w, m)
    sw = np.lib.stride_tricks.sliding_window_view(h, width)
    sw = sw[: max(1, m - w + 1)]
    rev = sw[:, ::-1]
    j = rev.argmin(axis=1)              # first in reversed = rightmost
    selpos = np.arange(len(sw)) + (width - 1 - j)
    return np.unique(selpos)


def winnow_fp_rows_batch(batch: pa.Table, k: int = 3, w: int = 4,
                         col: str = "text",
                         id_col: str = "doc_id") -> pa.Table:
    """Row-per-fingerprint variant of winnow_fingerprints_batch:
    DISTINCT (doc_id, fp) rows (two selected positions sharing a hash
    collapse — pair mining cares about hash identity). The narrow
    explode feeding winnow_near_dups."""
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    m_per_doc, h_all, doc_first = _winnow_gram_hashes(batch, k, col)
    out_id, out_fp = [], []
    for d in range(len(ids)):
        m = int(m_per_doc[d])
        if m == 0:
            continue
        h = h_all[doc_first[d]: doc_first[d] + m]
        fps = np.unique(h[_winnow_select(h, w)])
        out_id.append(np.full(len(fps), ids[d], np.int64))
        out_fp.append(fps)
    if not out_id:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "fp": pa.array([], pa.int64())})
    return pa.table({
        id_col: pa.array(np.concatenate(out_id), pa.int64()),
        "fp": pa.array(np.concatenate(out_fp).astype(np.int64),
                       pa.int64()),
    })


def bpe_pair_counts(ds, k: int = 50, col: str = "text"):
    """Adjacent character-pair frequencies within words — the count
    table a byte-pair-encoding tokenizer trainer (Sennrich et al. 2016)
    builds for its first merge iteration. Returns the top-k (pair, n)
    rows ordered by (n desc, pair asc) — a deterministic tie-broken
    head, so the result is a well-defined SET.

    Plan: map-side the batch reduces tokens to UNIQUE words ×
    occurrence counts before pair expansion (the pair loop runs over
    the batch vocabulary, not the token stream), partial (pair, n)
    rows merge through one tiny two-phase grouped sum (keys bounded by
    alphabet²), and the head is one distributed sort + limit over that
    bounded table."""
    from .shuffle import two_phase_aggregate

    def partial_pairs(batch: pa.Table) -> pa.Table:
        from .retrieval import whitespace_tokens

        flat, _parent, _dl = whitespace_tokens(batch[col])
        vc = pc.value_counts(flat)
        counts: dict = {}
        for rec in vc.to_pylist():
            w, c = rec["values"], rec["counts"]
            if w is None or len(w) < 2:
                continue
            for j in range(len(w) - 1):
                p = w[j:j + 2]
                counts[p] = counts.get(p, 0) + c
        return pa.table({
            "pair": pa.array(list(counts.keys()), pa.string()),
            "pn": pa.array(list(counts.values()), pa.int64())})

    merged = two_phase_aggregate(
        ds.map_batches(partial_pairs, batch_format="pyarrow"),
        keys=["pair"],
        partial_aggs=[("pn", "sum")], partial_names=["pn"],
        final_aggs=[("pn", "sum")], final_names=["n"],
        num_buckets=8)
    return merged.sort(["n", "pair"], descending=[True, False]).limit(k)


def token_diversity_batch(batch: pa.Table, col: str = "text",
                          id_col: str = "doc_id") -> pa.Table:
    """Lexical-diversity numerators per document: token count and the
    SIMPSON collision numerator Σ c_w² over unigram counts (the
    repeated-token mass; simpson_num/n² is the probability two randomly
    drawn tokens coincide — high values flag gibberish/keyword-stuffed
    docs that pass length gates). Integer outputs only, so the oracle
    hash is exact; callers derive the ratio.

    Vectorized: one dictionary encode, one np.unique over combined
    (doc, code) keys, one scatter-add of c² — no per-row Python."""
    from .retrieval import whitespace_tokens

    flat, parent, dl = whitespace_tokens(pc.utf8_lower(batch[col]))
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n_docs = len(ids)
    simpson = np.zeros(n_docs, np.int64)
    if len(parent):
        codes = pc.dictionary_encode(flat).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        v = int(codes.max()) + 1
        _u, counts = np.unique(parent * v + codes, return_counts=True)
        doc_of = _u // v
        np.add.at(simpson, doc_of, counts.astype(np.int64) ** 2)
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "n_tokens": pa.array(dl, pa.int64()),
        "simpson_num": pa.array(simpson, pa.int64()),
    })
