"""PMI top collocations: distributed plan vs a row-wise oracle."""

import math
from collections import Counter
from itertools import combinations

import numpy as np
import pyarrow as pa
import ray.data as rd

from mvt_wrangler_ray.stages.retrieval import pmi_top_pairs


def _brute(texts, k, min_df, min_pair):
    n = len(texts)
    doc_toks = [sorted(set(t.split())) for t in texts]
    df = Counter(t for toks in doc_toks for t in toks)
    vocab = {t for t, c in df.items() if c >= min_df}
    pc_ = Counter()
    for toks in doc_toks:
        vt = [t for t in toks if t in vocab]
        for a, b in combinations(vt, 2):
            pc_[(a, b)] += 1
    rows = []
    for (a, b), c in pc_.items():
        if c < min_pair:
            continue
        pmi = int(math.floor(math.log((c * n) / (df[a] * df[b])) * 1e9 + 0.5))
        rows.append((a, b, c, pmi))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:k]


def test_pmi_matches_brute_force(ray_session):
    rng = np.random.default_rng(13)
    words = [f"w{i}" for i in range(40)]
    texts = []
    for i in range(120):
        n = rng.integers(3, 15)
        toks = list(rng.choice(words, n))
        if i % 4 == 0:
            toks += ["alpha", "beta"]  # a planted collocation
        texts.append(" ".join(toks))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string())}))
    got = pmi_top_pairs(ds, k=15, min_df=3, min_pair=2).to_pandas()
    want = _brute(texts, 15, 3, 2)
    gt = list(map(tuple, got[["tok_a", "tok_b", "n_pair",
                              "pmi_nano"]].to_numpy()))
    assert gt == want
    # the planted collocation dominates
    assert gt[0][:2] == ("alpha", "beta")


def test_pmi_empty_vocab(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b", "c d"], pa.string())}))
    out = pmi_top_pairs(ds, k=5, min_df=3, min_pair=2).to_pandas()
    assert len(out) == 0
