"""Repeated-span (substring) dedup stats vs a brute-force oracle."""

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd

from mvt_wrangler_ray.stages.dedup import span_dedup_stats, span_windows_batch
from mvt_wrangler_ray.stages.text import md5_lower64

DOCS = [
    "the quick brown fox jumps over the lazy dog again and again today",
    "a completely different document with no repeats whatsoever in it at all",
    "prefix words then the quick brown fox jumps over the lazy dog again",
    "short doc",                       # < width words: no windows, no row
    "the quick brown fox jumps over the lazy dog again and again today",  # exact dup of doc 0
]


def _brute(width: int):
    wins = []
    for i, t in enumerate(DOCS):
        ws = t.lower().split()
        for g in range(len(ws) - width + 1):
            wins.append((i, md5_lower64(" ".join(ws[g:g + width]))))
    cnt = Counter(h for _, h in wins)
    per = {}
    for i, h in wins:
        n, d = per.get(i, (0, 0))
        per[i] = (n + 1, d + (cnt[h] >= 2))
    return per


def test_span_dedup_matches_brute(ray_session):
    width = 4
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(DOCS), dtype=np.int64)),
        "text": pa.array(DOCS, pa.string())}))
    out = span_dedup_stats(ds, width=width).to_pandas().set_index("doc_id")
    brute = _brute(width)
    assert set(out.index) == set(brute)      # doc 3 (too short) absent
    for i, (n, d) in brute.items():
        row = out.loc[i]
        assert int(row["n_windows"]) == n
        assert int(row["dup_windows"]) == d
        assert row["dup_ratio"] == d / n
    # planted duplicates detected: docs 0 and 4 fully duplicated
    assert out.loc[0, "dup_ratio"] == 1.0
    assert out.loc[4, "dup_ratio"] == 1.0
    assert out.loc[1, "dup_windows"] == 0


def test_span_windows_batch_handles_empty_and_null():
    b = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["", None, "one two three"], pa.string())})
    out = span_windows_batch(b, width=2)
    assert out["doc_id"].to_pylist() == [3, 3]
    assert out.schema.field("whash").type == pa.int64()


def test_span_dedup_cutover_equivalence(ray_session):
    # broadcast flag lane (default) ≡ the bucketed join lane
    import pyarrow as pa
    import ray.data as rd

    from mvt_wrangler_ray.stages.dedup import span_dedup_stats

    texts = ["a b c d e f g h i j", "z b c d e f g h i k",
             "a b c d e f g h i j extra", "short text", ""]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(5)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    fast = span_dedup_stats(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    slow = span_dedup_stats(ds, broadcast_dup_limit=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert fast.equals(slow)
