"""Exact n-gram-Jaccard near-dup join: the prefix-filter candidate
generator must be LOSSLESS — output equals brute-force all-pairs Jaccard
at every threshold, including empty-text and sub-k-word documents."""

import numpy as np
import pyarrow as pa
import pytest

from mvt_wrangler_ray.stages.dedup import (
    jaccard,
    ngram_jaccard_near_dups,
    ngram_prefix_rows,
)


def _brute_pairs(docs, threshold, k=3):
    out = set()
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            if jaccard(docs[a], docs[b], k) >= threshold:
                out.add((a, b))
    return out


def _corpus(rng, n_bg=120):
    vocab = [f"w{i}" for i in range(200)]
    docs = []
    for c in range(12):                      # planted clusters of 3
        words = [vocab[j] for j in rng.choice(200, 25, replace=False)]
        docs.append(" ".join(words))
        docs.append(" ".join(words[:-2] + ["zz1", "zz2"]))
        docs.append(" ".join(["aa0"] + words[1:]))
    for _ in range(n_bg):                    # background
        words = [vocab[j] for j in rng.choice(200, 25, replace=False)]
        docs.append(" ".join(words))
    docs += ["", "   ", "one two", "one two", "solo"]  # degenerate texts
    return docs


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
def test_ngram_jaccard_equals_brute_force(ray_session, threshold):
    import ray.data as rd

    docs = _corpus(np.random.default_rng(7))
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    out = ngram_jaccard_near_dups(rd.from_arrow(t), threshold=threshold)
    got = {tuple(p) for p in zip(out["id_a"], out["id_b"])}
    expect = _brute_pairs(docs, threshold)
    assert got == expect
    # reported jaccard values are the exact per-pair values
    for a, b, j in zip(out["id_a"], out["id_b"], out["jaccard"]):
        assert j == jaccard(docs[a], docs[b])


def test_float_boundary_threshold_is_lossless(ray_session):
    """Regression: float 0.55 × 100 = 55.000000000000004, so a
    np.ceil-based prefix length overshoots by one and silently drops a
    pair whose exact J = 55/100 — which PASSES the verify stage's float
    comparison (float64(55/100) == float64(0.55)). The prefix bound must
    mirror the verify comparison (_min_overlap), not real arithmetic."""
    import ray.data as rd

    vocab = [f"w{i:03d}" for i in range(300)]
    # doc A: 102 words → 100 distinct 3-gram shingles; doc B = suffix of
    # A sharing exactly 55 of them in every global order... construct by
    # brute force: B = last 57 words of A → 55 shared grams, then pad B
    # with unique words until |B| s.t. union makes J exactly 55/100
    a_words = vocab[:102]
    b_words = a_words[45:] + ["zz1", "zz2", "zz3"]  # tail + fresh tail
    docs = [" ".join(a_words), " ".join(b_words)]
    j = jaccard(docs[0], docs[1])
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(docs, pa.string())})
    out = ngram_jaccard_near_dups(rd.from_arrow(t), threshold=j)
    # the pair's jaccard equals the threshold exactly → verify keeps it,
    # so candidate generation MUST surface it
    assert [(0, 1)] == list(zip(out["id_a"], out["id_b"]))
    # and the generic brute-force equality at the awkward threshold 0.55
    corpus = _corpus(np.random.default_rng(3), n_bg=40)
    tc = pa.table({"doc_id": pa.array(range(len(corpus)), pa.int64()),
                   "text": pa.array(corpus, pa.string())})
    got = ngram_jaccard_near_dups(rd.from_arrow(tc), threshold=0.55)
    expect = _brute_pairs(corpus, 0.55)
    assert {tuple(p) for p in zip(got["id_a"], got["id_b"])} == expect


def test_prefix_rows_bounds():
    """Prefix slice obeys m - ceil(t*m) + 1 and empty docs emit the
    sentinel gram so J(∅,∅)=1 pairs still meet in candidate gen."""
    texts = ["a b c d e f g h", "", "x y"]
    rows = ngram_prefix_rows(texts, np.array([0, 1, 2]), threshold=0.5)
    per_doc = {i: 0 for i in range(3)}
    for d in rows["doc_id"].to_pylist():
        per_doc[d] += 1
    # doc 0: 6 distinct grams → prefix 6 - ceil(3) + 1 = 4
    assert per_doc[0] == 4
    assert per_doc[1] == 1                    # sentinel for empty
    assert per_doc[2] == 1                    # single joined gram


def test_verify_plan_cutover_equivalence(ray_session):
    """broadcast_pairs_limit=0 forces the bucketed-join verify (the
    too-big-to-broadcast path); output must equal the broadcast plan for
    both the minhash and the exact prefix-filter generators."""
    import ray.data as rd

    from mvt_wrangler_ray.stages.dedup import minhash_near_dups

    docs = _corpus(np.random.default_rng(13), n_bg=60)
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    for fn in (ngram_jaccard_near_dups, minhash_near_dups):
        a = fn(rd.from_arrow(t), threshold=0.5)
        b = fn(rd.from_arrow(t), threshold=0.5, broadcast_pairs_limit=0)
        assert a[["id_a", "id_b", "jaccard"]].values.tolist() == \
            b[["id_a", "id_b", "jaccard"]].values.tolist()
        assert len(a) > 0


def test_ppjoin_positional_filter_prunes_and_stays_lossless():
    """The positional filter must cut candidates versus plain segment
    pair-gen on a length-skewed segment (a short doc sharing one late
    gram with long docs cannot reach threshold), while every qualifying
    pair still survives via its first shared gram."""
    from mvt_wrangler_ray.stages.dedup import (
        _pair_min_overlap_vec,
        _segment_pairs_ppjoin,
        _segment_pairs_table,
        ngram_prefix_rows,
    )

    # doc 0/1: near-identical 30-gram docs; doc 2: 4 grams, one shared
    vocab = [f"w{i:02d}" for i in range(40)]
    texts = [" ".join(vocab[:32]),
             " ".join(vocab[:31] + ["zz"]),
             " ".join(vocab[28:32] + ["qq", "rr"])]
    rows = ngram_prefix_rows(texts, np.array([0, 1, 2]), threshold=0.8)
    g = rows.append_column("bucket", pa.array([0] * len(rows), pa.int64()))
    plain = _segment_pairs_table(g, ["gram"], "doc_id", 10_000)
    filtered = _segment_pairs_ppjoin(g, 0.8, 10_000)
    assert len(filtered) < len(plain)
    kept = set(zip(filtered["id_a"].to_pylist(),
                   filtered["id_b"].to_pylist()))
    truth = {(a, b) for a in range(3) for b in range(a + 1, 3)
             if jaccard(texts[a], texts[b]) >= 0.8}
    assert truth <= kept          # lossless
    assert (2 not in {i for p in kept for i in p}) or not any(
        2 in p for p in truth)    # the short doc was pruned

    # o_req mirrors the scalar helper's float-compare contract
    ma = np.array([100, 10, 7, 1], dtype=np.int64)
    mb = np.array([100, 20, 7, 1], dtype=np.int64)
    o = _pair_min_overlap_vec(ma, mb, 0.55)
    for i in range(len(ma)):
        cand = int(o[i])
        assert cand / (ma[i] + mb[i] - cand) >= 0.55
        assert cand == 1 or not (
            (cand - 1) / (ma[i] + mb[i] - (cand - 1)) >= 0.55)


def test_stop_gram_cap_documented_drop(ray_session):
    """A gram shared by more than bucket_cap docs is skipped by the skew
    guard — candidate loss is the documented contract (same as the LSH
    band cap), verified here so the behavior is intentional."""
    import ray.data as rd

    docs = [f"common common common unique{i}" for i in range(30)]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    out = ngram_jaccard_near_dups(rd.from_arrow(t), threshold=0.3,
                                  bucket_cap=5)
    # every pair's only shared grams sit in over-cap groups → no pairs
    assert len(out) == 0
