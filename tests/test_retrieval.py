"""stages/retrieval.py — BM25 top-k and bigram-LM quality scoring.

Covers: tokenizer parity with str.split, brute-force BM25 equality,
score-tie determinism at the k boundary, the broadcast↔bucketed-join
plan cutover, and short/empty-doc edge cases."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data

from mvt_wrangler_ray.stages.retrieval import (
    bigram_logprob, bm25_topk, whitespace_tokens)


def _ds(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.asarray(ids, np.int64), "text": texts}))


def test_whitespace_tokens_matches_str_split(ray_session):
    import pyarrow as pa
    texts = ["a b  c", "", "   ", "one", "\tx\ny z ", None]
    flat, parent, dl = whitespace_tokens(pa.array(texts, pa.string()))
    want = [(t or "").split() for t in texts]
    assert dl.tolist() == [len(w) for w in want]
    got = [[] for _ in texts]
    for tok, p in zip(flat.to_pylist(), parent):
        got[p].append(tok)
    assert got == want


def _bm25_brute(texts, ids, terms, k=10, k1=1.2, b=0.75):
    toks = [t.split() for t in texts]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    out = []
    for i, tk in enumerate(toks):
        score = 0.0
        for t in terms:
            df = sum(1 for d in toks if t in d)
            idf = math.log(1.0 + ((n - df) + 0.5) / (df + 0.5))
            tf = float(tk.count(t))
            score = score + idf * (tf * (k1 + 1.0)) / \
                (tf + k1 * ((1.0 - b) + b * (len(tk) / avgdl)))
        if score > 0.0:
            out.append((ids[i], score))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


def test_bm25_matches_brute_force(ray_session):
    rng = np.random.default_rng(7)
    vocab = ["data", "ray", "tile", "apple", "the", "zig"]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 12)))
             for _ in range(120)]
    ids = list(range(120))
    got = bm25_topk(_ds(texts, ids), ["data", "apple"], k=7)
    want = _bm25_brute(texts, ids, ["data", "apple"], k=7)
    assert list(got["doc_id"]) == [w[0] for w in want]
    np.testing.assert_allclose(got["score"].to_numpy(),
                               [w[1] for w in want], rtol=1e-12)


def test_bm25_tied_scores_keep_smallest_ids(ray_session):
    # many identical docs → identical scores; the winner set must be the
    # k smallest ids regardless of block boundaries
    texts = ["data x"] * 40 + ["nothing here"] * 10
    ids = list(range(49, -1, -1))  # ids 49..0, tied docs get ids 10..49
    ds = _ds(texts, ids).repartition(8)
    got = bm25_topk(ds, ["data"], k=5)
    assert list(got["doc_id"]) == [10, 11, 12, 13, 14]


def test_bm25_no_hits_returns_typed_empty(ray_session):
    got = bm25_topk(_ds(["alpha beta", "gamma"]), ["zzz"], k=5)
    assert len(got) == 0
    assert got["doc_id"].dtype == np.int64
    assert got["score"].dtype == np.float64


def _bigram_brute(texts, ids, alpha=0.5):
    toks = [t.split() for t in texts]
    c2: dict = {}
    c1: dict = {}
    vocab = set()
    for tk in toks:
        vocab.update(tk)
        for a, b in zip(tk, tk[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    v = len(vocab)
    rows = {}
    for i, tk in enumerate(toks):
        if len(tk) < 2:
            continue
        s = 0
        for a, b in zip(tk, tk[1:]):
            lp = math.log(c2[(a, b)] + alpha) - math.log(c1[a] + alpha * v)
            s += int(math.floor(lp * 1.0e9 + 0.5))
        n = len(tk) - 1
        rows[ids[i]] = ((s / 1.0e9) / n, n)
    return rows


@pytest.mark.parametrize("limit", [2_000_000, 0])
def test_bigram_logprob_matches_brute(limit, ray_session):
    rng = np.random.default_rng(3)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 9)))
             for _ in range(80)]
    ids = list(range(80))
    got = bigram_logprob(_ds(texts, ids),
                         broadcast_vocab_limit=limit).to_pandas()
    want = _bigram_brute(texts, ids)
    assert set(got["doc_id"]) == set(want)
    for _, r in got.iterrows():
        wlp, wn = want[int(r["doc_id"])]
        assert r["n_bigrams"] == wn
        assert r["logprob"] == wlp  # bit-exact: fixed-point sum path


def test_bigram_logprob_excludes_short_docs(ray_session):
    got = bigram_logprob(_ds(["one", "", "two words"])).to_pandas()
    assert set(got["doc_id"]) == {2}
    assert int(got["n_bigrams"].iloc[0]) == 1


def test_redact_pii_batch_patterns(ray_session):
    import pyarrow as pa

    from mvt_wrangler_ray.stages.text import redact_pii_batch
    t = pa.table({"text": [
        "write to john.doe+x@sub.example.org now",
        "call 555-123-4567 or 555.987.6543",
        "hosts 192.168.0.1 and 10.0.0.255",
        "v1.2.3.45 is a version not an ip 1234.1.1.1",
        "no pii here",
    ]})
    o = redact_pii_batch(t)
    assert o["clean_text"].to_pylist() == [
        "write to <EMAIL> now",
        "call <PHONE> or <PHONE>",
        "hosts <IP> and <IP>",
        "v1.2.3.45 is a version not an ip 1234.1.1.1",
        "no pii here",
    ]
    assert o["n_email"].to_pylist() == [1, 0, 0, 0, 0]
    assert o["n_phone"].to_pylist() == [0, 2, 0, 0, 0]
    assert o["n_ip"].to_pylist() == [0, 0, 2, 0, 0]
