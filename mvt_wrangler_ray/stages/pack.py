"""Sequence packing: documents -> fixed-length token sequences.

The missing last step of the training-data chain (pipelines/corpus.py
ends at a clean document corpus): concatenate documents in deterministic
``id`` order, split the global token stream into sequences of exactly
``seq_len`` tokens, and emit one row per (sequence, document) SEGMENT —
the document-boundary / attention-reset index table a pretraining
dataloader consumes. A segment row says "sequence ``seq_id`` carries
tokens ``tok_start..tok_end`` (within-sequence, end-exclusive) of
document ``doc_id``"; ``tok_start == 0`` or a new ``doc_id`` inside a
sequence is exactly where an attention mask resets.

No reference analog (the reference is a tile engine); this operator is
the builder's-brief training-data axis. Tokenizer parity with
``stages/text.token_count_batch`` (whitespace runs == DuckDB
``length(regexp_split_to_array(trim(text), '\\s+'))``) so the oracle is
an exact window-function SQL.

Scale shape (100 TB):
- token counting is a narrow ``map_batches``: only (id, n_tokens) leave
  the stage — document text never moves past the count;
- global token offsets are a distributed prefix sum: per-RANGE-bucket
  totals fold on the driver (state bounded by the bucket COUNT, never
  the data), then ONE groupby over the narrow (id, n_tok, bucket) table
  computes exact within-bucket prefixes;
- segment expansion is numpy repeat/arange — no per-row Python;
- the narrow table is pinned once (``materialize``) because two
  consumers read it (bucket totals + segment emit): 24 B/doc, ~24 GB
  per 10^9 docs spread across the cluster object store.
The only shuffle moves those 24 B/doc. Buckets are id RANGES (not hash)
because the prefix sum needs bucket order == id order; ids are assumed
orderable integers (dense or not). At scale, pick ``bucket_ids`` so a
bucket's docs fit one worker (e.g. 1e6 docs -> 24 MB groups).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .text import token_count_batch

_SEG_SCHEMA = {"seq_id": pa.int64(), "doc_id": pa.int64(),
               "tok_start": pa.int64(), "tok_end": pa.int64()}


def _empty_segments(id_col: str) -> pa.Table:
    return pa.table({("doc_id" if k == "doc_id" else k): pa.array([], t)
                     for k, t in _SEG_SCHEMA.items()}).rename_columns(
        ["seq_id", id_col, "tok_start", "tok_end"])


def emit_segments(ids: np.ndarray, ntok: np.ndarray, start0: int,
                  seq_len: int, id_col: str = "doc_id") -> pa.Table:
    """Vectorized segment expansion for one id-sorted run of documents
    whose first token sits at GLOBAL offset ``start0``. Pure numpy; unit
    of the oracle-checked semantics, reused by tests as the single-node
    reference plan."""
    ntok = ntok.astype(np.int64)
    starts = start0 + np.concatenate(([0], np.cumsum(ntok)[:-1]))
    ends = starts + ntok
    keep = ntok > 0  # empty docs occupy no tokens -> no segment row
    ids, starts, ends = ids[keep], starts[keep], ends[keep]
    if len(ids) == 0:
        return _empty_segments(id_col)
    first = starts // seq_len
    nseg = ((ends - 1) // seq_len - first + 1).astype(np.int64)
    total = int(nseg.sum())
    rep = np.repeat(np.arange(len(ids), dtype=np.int64), nseg)
    run_excl = np.concatenate(([0], np.cumsum(nseg)[:-1]))
    within = np.arange(total, dtype=np.int64) - np.repeat(run_excl, nseg)
    seq = first[rep] + within
    lo = np.maximum(starts[rep], seq * seq_len)
    hi = np.minimum(ends[rep], (seq + 1) * seq_len)
    return pa.table({
        "seq_id": pa.array(seq, pa.int64()),
        id_col: pa.array(ids[rep], pa.int64()),
        "tok_start": pa.array(lo - seq * seq_len, pa.int64()),
        "tok_end": pa.array(hi - seq * seq_len, pa.int64()),
    })


def pack_sequences(ds, seq_len: int = 128, id_col: str = "doc_id",
                   text_col: str = "text", bucket_ids: int = 4096):
    """Pack ``ds``'s documents (in ascending ``id_col`` order) into
    ``seq_len``-token sequences; returns the segment Dataset with
    columns (seq_id, id_col, tok_start, tok_end). ``bucket_ids`` is the
    id-range width of one prefix-sum bucket."""
    import ray

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")

    def counts(batch: pa.Table) -> pa.Table:
        t = token_count_batch(batch, col=text_col)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_tok": t["n_tokens"],
            "bucket": pa.array(ids // bucket_ids, pa.int64()),
        })

    narrow = ds.map_batches(counts, batch_format="pyarrow").materialize()

    # per-bucket totals: one tiny partial table per block -> driver fold
    # (rows bounded by buckets-per-block x blocks, each 16 B)
    def bucket_partials(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["bucket"]).aggregate([("n_tok", "sum")])
        return g.rename_columns(
            ["tok_sum" if c == "n_tok_sum" else c for c in g.column_names])

    totals: dict[int, int] = {}
    for row in narrow.map_batches(
            bucket_partials, batch_format="pyarrow").take_all():
        totals[row["bucket"]] = totals.get(row["bucket"], 0) + row["tok_sum"]
    base, acc = {}, 0
    for b in sorted(totals):
        base[b] = acc
        acc += totals[b]
    base_ref = ray.put(base)  # shipped once, read per task

    def emit(group: pa.Table) -> pa.Table:
        bases = ray.get(base_ref)
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = group["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return _empty_segments(id_col)
        order = np.argsort(ids, kind="stable")
        b = int(group["bucket"][0].as_py())
        return emit_segments(ids[order], ntok[order], bases[b], seq_len,
                             id_col=id_col)

    return narrow.groupby("bucket").map_groups(emit, batch_format="pyarrow")
