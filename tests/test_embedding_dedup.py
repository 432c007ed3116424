"""embedding_near_dups: zero-copy vector path + bucket_cap skew guard."""

import inspect

import numpy as np
import pyarrow as pa


def _emb_table(mat: np.ndarray) -> pa.Table:
    return pa.table({
        "vec_id": pa.array(np.arange(len(mat), dtype=np.int64), pa.int64()),
        "embedding": pa.array([row.tolist() for row in mat],
                              pa.list_(pa.float32())),
    })


def _brute_pairs(mat: np.ndarray, threshold: float) -> set:
    m = mat.astype(np.float64)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    sims = m @ m.T
    ia, ib = np.triu_indices(len(m), k=1)
    keep = sims[ia, ib] >= threshold
    return set(zip(ia[keep].tolist(), ib[keep].tolist()))


def test_exact_mode_matches_bruteforce(ray_session):
    import ray.data as rd

    from mvt_wrangler_ray.stages.dedup import embedding_near_dups

    rng = np.random.default_rng(7)
    mat = rng.standard_normal((60, 16)).astype(np.float32)
    mat[11] = mat[3] * 2.5          # same direction → cosine 1.0
    mat[27] = mat[3] + 0.01 * rng.standard_normal(16)

    got = embedding_near_dups(rd.from_arrow(_emb_table(mat)),
                              threshold=0.9, nbits=0,
                              bucket_cap=None).to_pandas()
    got_pairs = set(zip(got["id_a"].tolist(), got["id_b"].tolist()))
    assert got_pairs == _brute_pairs(mat, 0.9)
    assert (3, 11) in got_pairs


def test_bucket_cap_defaults_on_and_skips_degenerate_bucket(ray_session):
    import ray.data as rd

    from mvt_wrangler_ray.stages.dedup import embedding_near_dups

    cap_default = inspect.signature(embedding_near_dups) \
        .parameters["bucket_cap"].default
    assert cap_default is not None, \
        "bucket_cap must default ON (minhash/simhash guard contract)"

    # degenerate corpus: every embedding identical → all rows land in ONE
    # LSH bucket; an uncapped run would do the full O(m²) matrix there
    mat = np.tile(np.ones(8, dtype=np.float32), (120, 1))
    ds = rd.from_arrow(_emb_table(mat))
    capped = embedding_near_dups(ds, threshold=0.5, nbits=4,
                                 bucket_cap=50).to_pandas()
    assert len(capped) == 0          # the oversized bucket is skipped

    uncapped = embedding_near_dups(ds, threshold=0.5, nbits=4,
                                   bucket_cap=None).to_pandas()
    assert len(uncapped) == 120 * 119 // 2


def test_lsh_buckets_subset_of_exact_and_catch_identicals(ray_session):
    import ray.data as rd

    from mvt_wrangler_ray.stages.dedup import embedding_near_dups

    rng = np.random.default_rng(11)
    mat = rng.standard_normal((80, 16)).astype(np.float32)
    mat[40] = mat[10]               # identical pair: same bucket always

    exact = _brute_pairs(mat, 0.95)
    got = embedding_near_dups(rd.from_arrow(_emb_table(mat)),
                              threshold=0.95, nbits=6).to_pandas()
    got_pairs = set(zip(got["id_a"].tolist(), got["id_b"].tolist()))
    assert got_pairs <= exact       # LSH may lose recall, never precision
    assert (10, 40) in got_pairs


def _pairs_at(ds, probes, threshold=0.9, nbits=8):
    from mvt_wrangler_ray.stages.dedup import embedding_near_dups

    df = embedding_near_dups(ds, threshold=threshold, nbits=nbits,
                             probes=probes).to_pandas()
    return df, set(zip(df["id_a"].tolist(), df["id_b"].tolist()))


def test_multiprobe_improves_recall_monotonically(ray_session):
    """probes>0 recovers cross-bucket pairs single-probe misses: recall
    is monotone in probes, precision stays exact (pairs ⊆ brute force,
    cosines exact), and output has no duplicate pairs despite each
    vector landing in probes+1 buckets."""
    import ray.data as rd

    rng = np.random.default_rng(23)
    base = rng.standard_normal((120, 16)).astype(np.float32)
    # planted near-dups: small perturbations → high cosine but some
    # cross a hyperplane and land in a different bucket
    for i in range(0, 120, 4):
        base[i + 1] = base[i] + 0.15 * rng.standard_normal(16).astype(np.float32)
    ds = rd.from_arrow(_emb_table(base))
    exact = _brute_pairs(base, 0.9)
    assert len(exact) >= 20

    recalls = []
    prev: set = set()
    for probes in (0, 2, 4):
        df, pairs = _pairs_at(ds, probes)
        assert pairs <= exact                       # precision exact
        assert len(df) == len(pairs)                # no duplicate rows
        if probes:
            assert prev <= pairs                    # monotone recall
        prev = pairs
        recalls.append(len(pairs) / len(exact))
        # reported cosines are the true values
        m = base.astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        for a, b, c in zip(df["id_a"], df["id_b"], df["cosine"]):
            assert abs(float(m[a] @ m[b]) - c) < 1e-12
    assert recalls[0] < 1.0, "corpus must exercise the recall gap"
    assert recalls[-1] > recalls[0], "multiprobe must recover pairs"
