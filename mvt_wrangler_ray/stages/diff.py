"""Corpus snapshot diff — what changed between two crawls/ingests.

At 100 TB an ingestion pipeline re-crawls sources continuously; the
operator every versioned corpus needs is the snapshot delta: which
documents were ADDED, which REMOVED, and which CHANGED content between
snapshot A and snapshot B. Composes with stages/dedup.incremental_dedup
(which answers "which incoming docs are new content"); this answers the
id-keyed version question.

Shape: each side reduces map-side to a narrow (id, content_hash, side)
row — payloads never move. The union hash-partitions by id into
`num_buckets` groups; inside each group a pure-numpy lexsort pairs the
two sides and classifies in O(n log n) per bucket with zero Python
per-row work. Driver state: none (the result is a Dataset).

Unchanged documents are dropped (the overwhelming majority at steady
state), so the output is proportional to the delta, not the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _narrow_side(side: int, id_col: str, text_col: str):
    from .dedup import content_hash_batch

    def f(batch: pa.Table) -> pa.Table:
        t = content_hash_batch(batch, text_col, out="h")
        return pa.table({
            id_col: t[id_col],
            "h": t["h"],
            "side": pa.array(np.full(len(t), side, np.int8)),
        })

    return f


def _diff_group(g: pa.Table, id_col: str) -> pa.Table:
    ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    side = g["side"].to_numpy(zero_copy_only=False).astype(np.int8)
    h = np.asarray(g["h"].to_pylist(), dtype=object)

    order = np.lexsort((side, ids))
    ids_s, side_s, h_s = ids[order], side[order], h[order]

    first = np.r_[True, ids_s[1:] != ids_s[:-1]] if len(ids_s) else \
        np.zeros(0, bool)
    idx = np.flatnonzero(first)
    cnt = np.diff(np.r_[idx, len(ids_s)])
    two = idx[cnt == 2]
    # a pair must be one row per side — two rows of the SAME side is a
    # duplicate id within one snapshot, as is any run longer than 2
    same_side = two[side_s[two] == side_s[two + 1]] if len(two) else two
    if (cnt > 2).any() or len(same_side):
        bad = np.concatenate([ids_s[idx[cnt > 2]], ids_s[same_side]])[:5]
        raise ValueError(
            f"snapshot_diff: duplicate ids within one snapshot: {bad}")

    one = idx[cnt == 1]
    out_ids = [ids_s[one]]
    out_status = [np.where(side_s[one] == 1, "added", "removed")]

    changed = two[h_s[two] != h_s[two + 1]]
    out_ids.append(ids_s[changed])
    out_status.append(np.full(len(changed), "changed", object))

    return pa.table({
        id_col: pa.array(np.concatenate(out_ids), pa.int64()),
        "status": pa.array(np.concatenate(out_status), pa.string()),
    })


def snapshot_diff(old_ds, new_ds, id_col: str = "doc_id",
                  text_col: str = "text", num_buckets: int = 32):
    """Diff two snapshots by id + content hash.

    → Dataset[id_col:int64, status:string] with status ∈
    {'added', 'removed', 'changed'}; unchanged rows are omitted.
    Raises if either snapshot carries duplicate ids (data-quality guard —
    run exact dedup first).
    """
    from .shuffle import add_bucket_column

    a = old_ds.map_batches(_narrow_side(0, id_col, text_col),
                           batch_format="pyarrow")
    b = new_ds.map_batches(_narrow_side(1, id_col, text_col),
                           batch_format="pyarrow")
    u = a.union(b)
    bucketed = u.map_batches(
        lambda t: add_bucket_column(t, [id_col], num_buckets),
        batch_format="pyarrow")
    return (bucketed.groupby("bucket")
            .map_groups(lambda g: _diff_group(g, id_col),
                        batch_format="pyarrow"))
