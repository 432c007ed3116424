"""Composed corpus-cleaning pipeline + IVF kNN recall."""

import numpy as np
import pyarrow as pa
import pytest


def test_clean_corpus_end_to_end(ray_session):
    import ray.data as rd

    from mvt_wrangler_ray.pipelines.corpus import clean_corpus

    # synthetic corpus: good docs, a low-quality doc, a duplicate pair,
    # a near-duplicate pair, a non-English doc
    base = ("the quick brown fox jumps over the lazy dog and then walks "
            "to the market to buy fresh bread with his friends on a "
            "sunny morning in the old town near the harbor ") * 3
    docs = [
        (0, base + "alpha ending one"),
        (1, base + "alpha ending one"),          # exact dup of 0
        (2, base + "beta ending two"),           # near-dup of 0/1
        (3, "der schnelle braune fuchs springt über den faulen hund und "
            "läuft mit seinen freunden zum markt um frisches brot zu "
            "kaufen an einem sonnigen morgen in der alten stadt " * 3),  # de
        (4, "!!! ??? ... !!!"),                   # junk / low quality
        (5, "a completely different english document about the history "
            "of distributed data processing engines and the various "
            "shuffle strategies that they employ at large scale " * 3),
    ]
    t = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([x for _, x in docs], pa.string())})
    survivors, stats = clean_corpus(rd.from_arrow(t), min_quality=0.2,
                                    langs=("en",), near_dup_threshold=0.6)
    ids = sorted(survivors.to_pandas()["doc_id"].tolist())
    assert stats["input"] == 6
    assert 3 not in ids          # german gated
    assert 4 not in ids          # junk gated
    assert 1 not in ids          # exact dup (min-id 0 survives)
    assert 0 in ids and 5 in ids
    assert 2 not in ids          # near-dup of 0 clustered and dropped
    assert stats["output"] == len(ids)


def test_exact_dedup_rows_matches_broadcast_plan(ray_session):
    """The payload-exchange dedup (no driver id set) must select exactly
    the rows the narrow-aggregate + broadcast plan selects."""
    import ray.data as rd

    from mvt_wrangler_ray.stages.dedup import exact_dedup, exact_dedup_rows

    rng = np.random.default_rng(11)
    texts = [f"document body {i % 40}" for i in range(600)]  # 40 distinct
    ids = rng.permutation(600).astype(np.int64)              # shuffled ids
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "extra": pa.array(np.arange(600.0))})
    ds = rd.from_arrow(t)
    rows = exact_dedup_rows(ds).to_pandas().sort_values("doc_id")
    narrow = exact_dedup(ds).to_pandas()
    assert sorted(rows["doc_id"]) == sorted(narrow["doc_id"])
    assert set(rows.columns) == {"doc_id", "text", "extra"}  # payload kept
    # survivor is the MIN id of each duplicate class
    src = {i: txt for i, txt in zip(ids, texts)}
    by_text: dict = {}
    for i, txt in src.items():
        by_text.setdefault(txt, []).append(i)
    expect = sorted(min(v) for v in by_text.values())
    assert sorted(rows["doc_id"]) == expect


def test_clean_corpus_cutover_plans_agree(ray_session):
    """clean_corpus with broadcast_id_limit=0 (forcing the payload-
    exchange dedup) returns the same survivor set as the broadcast plan."""
    import ray.data as rd

    from mvt_wrangler_ray.pipelines.corpus import clean_corpus

    base = ("the quick brown fox jumps over the lazy dog near the old "
            "harbor town market every sunny morning with friends ") * 3
    docs = [(i, base + f"variant tail {i % 7}") for i in range(40)]
    t = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([x for _, x in docs], pa.string())})
    s1, st1 = clean_corpus(rd.from_arrow(t), min_quality=0.1, langs=("en",))
    s2, st2 = clean_corpus(rd.from_arrow(t), min_quality=0.1, langs=("en",),
                           broadcast_id_limit=0)
    ids1 = sorted(s1.to_pandas()["doc_id"].tolist())
    ids2 = sorted(s2.to_pandas()["doc_id"].tolist())
    assert ids1 == ids2
    assert st1["after_exact_dedup"] == st2["after_exact_dedup"]
    # distributed near-dup clustering (label propagation + bucketed
    # anti-join) must agree with driver union-find + broadcast
    s3, st3 = clean_corpus(rd.from_arrow(t), min_quality=0.1, langs=("en",),
                           near_dup_pairs_limit=0)
    ids3 = sorted(s3.to_pandas()["doc_id"].tolist())
    assert ids3 == ids1
    assert st3["near_dup_dropped"] == st1["near_dup_dropped"]
    assert st1["near_dup_pairs"] > 0  # the cutover actually exercised


def test_ivf_recall_vs_bruteforce(ray_session):
    import ray.data as rd

    from mvt_wrangler_ray.stages.knn import ivf_knn_topk, knn_topk, train_centroids

    rng = np.random.default_rng(17)
    n, dim = 2000, 32
    base = rng.standard_normal((n, dim))
    t = pa.table({"vec_id": pa.array(np.arange(n), pa.int64()),
                  "embedding": pa.array(list(base.astype(np.float64)),
                                        pa.list_(pa.float64()))})
    ds = rd.from_arrow(t)
    q = base[7] + rng.standard_normal(dim) * 0.05
    exact = knn_topk(ds, q[None, :], np.array([0]), k=10)
    cents = train_centroids(base[:500], ncentroids=16)
    approx = ivf_knn_topk(ds, q[None, :], np.array([0]), cents, k=10, nprobe=8)
    inter = set(exact["vec_id"]) & set(approx["vec_id"])
    assert exact["vec_id"].iloc[0] == 7        # nearest is the seed vector
    assert len(inter) >= 6                     # ≥60% recall at nprobe=8/16
