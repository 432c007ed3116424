"""Round-5 continuation operators: deterministic splits, the filter
funnel, token histogram, snapshot diff, and the image size filter."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def _docs_table(texts, start=0):
    n = len(texts)
    return pa.table({
        "doc_id": pa.array(np.arange(start, start + n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })


# ---- split assignment --------------------------------------------------


def test_split_assignment_partition_invariant():
    # the split of a row depends only on its id — slicing the batch any
    # way must give identical assignments (re-shard safety)
    from mvt_wrangler_ray.stages.curate import assign_split_batch

    t = _docs_table(["x"] * 1000)
    whole = assign_split_batch(t)["split"].to_pylist()
    pieces = []
    for lo in range(0, 1000, 137):
        pieces.extend(assign_split_batch(t.slice(lo, 137))["split"].to_pylist())
    assert whole == pieces


def test_split_fractions_and_exhaustiveness():
    from mvt_wrangler_ray.stages.curate import assign_split_batch

    t = _docs_table(["x"] * 20000)
    s = np.asarray(assign_split_batch(t)["split"].to_pylist())
    counts = {v: int((s == v).sum()) for v in ("train", "val", "test")}
    assert sum(counts.values()) == 20000           # exhaustive, one split each
    assert 0.85 <= counts["train"] / 20000 <= 0.95  # ~90%
    assert 0.02 <= counts["val"] / 20000 <= 0.08    # ~5%
    assert 0.02 <= counts["test"] / 20000 <= 0.08   # ~5%


def test_split_stats_matches_direct_count(ray_session):
    from mvt_wrangler_ray.stages.curate import assign_split_batch, split_stats

    texts = [f"doc {i} body" * (i % 4 + 1) for i in range(500)]
    t = _docs_table(texts)
    got = split_stats(rd.from_arrow(t)).to_pandas().set_index("split")
    direct = assign_split_batch(t).to_pandas()
    direct["n_chars"] = direct["text"].str.len()
    want = direct.groupby("split").agg(n_docs=("doc_id", "size"),
                                       n_chars=("n_chars", "sum"))
    for split in want.index:
        assert got.loc[split, "n_docs"] == want.loc[split, "n_docs"]
        assert got.loc[split, "n_chars"] == want.loc[split, "n_chars"]


# ---- filter funnel ------------------------------------------------------


def test_filter_funnel_monotone_and_dedup(ray_session):
    from mvt_wrangler_ray.stages.curate import filter_funnel

    texts = (
        ["the quick brown fox jumps over the lazy dog near the river"] * 4
        + ["short"]                       # fails length (< 5 tokens)
        + ["der hund und die katze sind nicht in dem haus mit dem"] * 2  # de
        + ["!!! ??? ,,, ;;; ::: ... !!! ??? ,,, ;;;"]  # punct-heavy: quality
        + ["it is a fine day for the walk and the talk of the town"] * 3
    )
    ds = rd.from_arrow(_docs_table(texts))
    out = filter_funnel(ds).to_pandas().set_index("stage")["survivors"]
    assert out["input"] == len(texts)
    # monotone non-increasing down the chain
    order = ["input", "length", "language", "quality", "exact_dedup"]
    vals = [out[s] for s in order]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    assert out["length"] == len(texts) - 1           # only "short" fails
    # the 4 identical fox docs collapse to 1, the 3 town docs to 1
    assert out["exact_dedup"] == out["quality"] - 3 - 2


def test_funnel_flags_cumulative():
    from mvt_wrangler_ray.stages.curate import funnel_flags_batch

    t = _docs_table(["the cat sat on the mat for a while today",
                     "tiny", ""])
    f = funnel_flags_batch(t)
    ln = f["pass_len"].to_pylist()
    lg = f["pass_lang"].to_pylist()
    q = f["pass_qual"].to_pylist()
    for a, b, c in zip(ln, lg, q):
        assert (not b) or a      # lang implies len
        assert (not c) or b      # qual implies lang


# ---- token histogram ----------------------------------------------------


def test_log2_bucket_exact_integer():
    from mvt_wrangler_ray.stages.curate import log2_bucket

    v = np.concatenate([
        np.arange(0, 1000, dtype=np.int64),
        (np.int64(1) << np.arange(1, 40)) - 1,
        (np.int64(1) << np.arange(1, 40)),
    ])
    got = log2_bucket(v)
    want = np.array([(int(x) + 1).bit_length() - 1 for x in v], np.int64)
    assert np.array_equal(got, want)


def test_token_histogram_conserves_totals(ray_session):
    from mvt_wrangler_ray.stages.curate import token_histogram

    texts = [" ".join(["w"] * n) for n in
             [0, 1, 2, 3, 7, 8, 15, 16, 100, 1000]]
    out = token_histogram(rd.from_arrow(_docs_table(texts))).to_pandas()
    assert out["n_docs"].sum() == len(texts)
    assert out["sum_tokens"].sum() == sum(
        len(t.split()) for t in texts)


# ---- snapshot diff ------------------------------------------------------


def test_snapshot_diff_classification(ray_session):
    from mvt_wrangler_ray.stages.diff import snapshot_diff

    old = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a", "b", "c", "d"], pa.string())}))
    new = rd.from_arrow(pa.table({
        "doc_id": pa.array([2, 3, 4, 5], pa.int64()),
        "text": pa.array(["b", "C", "d", "e"], pa.string())}))
    got = snapshot_diff(old, new).to_pandas().set_index("doc_id")[
        "status"].to_dict()
    assert got == {1: "removed", 3: "changed", 5: "added"}  # 2, 4 unchanged


def test_snapshot_diff_duplicate_id_guard(ray_session):
    from mvt_wrangler_ray.stages.diff import snapshot_diff

    old = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 1], pa.int64()),
        "text": pa.array(["a", "b"], pa.string())}))
    new = rd.from_arrow(pa.table({
        "doc_id": pa.array([2], pa.int64()),
        "text": pa.array(["c"], pa.string())}))
    with pytest.raises(Exception, match="duplicate ids"):
        snapshot_diff(old, new).take_all()


def test_snapshot_diff_identical_snapshots_empty(ray_session):
    from mvt_wrangler_ray.stages.diff import snapshot_diff

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["a", "b", "c"], pa.string())})
    assert snapshot_diff(rd.from_arrow(t), rd.from_arrow(t)).take_all() == []


# ---- image size filter --------------------------------------------------


def test_size_filter_verdict_precedence():
    from mvt_wrangler_ray.stages.image import size_filter_verdict_batch

    t = pa.table({
        #                 small  large  strip(aspect)  small+strip  ok
        "w": pa.array([32,   120,   112,           20,   64], pa.int32()),
        "h": pa.array([64,   100,    50,          100,   80], pa.int32()),
    })
    got = size_filter_verdict_batch(t)["verdict"].to_pylist()
    # first-failing-rule precedence: small beats large beats aspect
    assert got == ["too_small", "too_large", "bad_aspect", "too_small", "ok"]


# ---- empty-input safety -------------------------------------------------


def test_continuation_ops_empty_input_safe(ray_session):
    from mvt_wrangler_ray.stages.curate import (filter_funnel, split_stats,
                                                token_histogram)
    from mvt_wrangler_ray.stages.diff import snapshot_diff
    from mvt_wrangler_ray.stages.image import size_filter_counts

    empty_docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    empty_imgs = rd.from_arrow(pa.table({
        "w": pa.array([], pa.int32()), "h": pa.array([], pa.int32())}))
    assert split_stats(empty_docs).take_all() == []
    assert token_histogram(empty_docs).take_all() == []
    assert snapshot_diff(empty_docs, empty_docs).take_all() == []
    assert size_filter_counts(empty_imgs).take_all() == []
    funnel = filter_funnel(empty_docs).to_pandas()
    assert list(funnel["survivors"]) == [0, 0, 0, 0, 0]


# ---- curriculum ordering --------------------------------------------------


def test_curriculum_rank_is_permutation_and_phase_ordered(ray_session):
    from mvt_wrangler_ray.stages.curate import curriculum_rank

    texts = [f"word {i} " * (i % 30 + 1) for i in range(300)]
    ds = rd.from_arrow(_docs_table(texts))
    df = curriculum_rank(ds, seed=7).to_pandas().sort_values("curriculum_rank")
    # a true permutation: ranks 0..n-1 exactly once, every doc present
    assert list(df["curriculum_rank"]) == list(range(300))
    assert sorted(df["doc_id"]) == list(range(300))
    # phases never decrease along the rank order (easy-to-hard schedule)
    assert (df["phase"].diff().dropna() >= 0).all()


def test_curriculum_rank_seed_changes_within_phase_order(ray_session):
    from mvt_wrangler_ray.stages.curate import curriculum_rank

    texts = ["the cat sat on the mat and looked around the room"] * 64
    ds = rd.from_arrow(_docs_table(texts))
    a = curriculum_rank(ds, seed=1).to_pandas().sort_values(
        "doc_id")["curriculum_rank"].tolist()
    b = curriculum_rank(ds, seed=2).to_pandas().sort_values(
        "doc_id")["curriculum_rank"].tolist()
    a2 = curriculum_rank(ds, seed=1).to_pandas().sort_values(
        "doc_id")["curriculum_rank"].tolist()
    assert a == a2          # replayable
    assert a != b           # seed actually reshuffles (same-quality docs)


# ---- corpus validation ----------------------------------------------------


def test_validate_corpus_counts(ray_session):
    from mvt_wrangler_ray.stages.curate import validate_corpus

    t = pa.table({
        "doc_id": pa.array([1, 2, 2, 3, None, 5], pa.int64()),
        "text": pa.array(["ok", None, "  ", "ok", "x", "ok"], pa.string()),
    })
    got = validate_corpus(rd.from_arrow(t)).to_pandas().set_index(
        "check")["value"].to_dict()
    assert got == {"n_rows": 6, "n_null_id": 1, "n_null_text": 1,
                   "n_empty_text": 2,       # the None and the blank
                   "n_dup_ids": 1}          # 6 rows, 5 distinct ids


def test_validate_corpus_clean_and_empty(ray_session):
    from mvt_wrangler_ray.stages.curate import validate_corpus

    clean = rd.from_arrow(_docs_table(["a", "b", "c"]))
    got = validate_corpus(clean).to_pandas().set_index("check")["value"]
    assert got["n_rows"] == 3 and got[["n_null_id", "n_null_text",
                                      "n_empty_text", "n_dup_ids"]].sum() == 0
    empty = rd.from_arrow(_docs_table([]))
    got = validate_corpus(empty).to_pandas().set_index("check")["value"]
    assert (got == 0).all()


# ---- quality-aware cluster representatives --------------------------------


def test_cluster_representatives_picks_highest_quality(ray_session):
    from mvt_wrangler_ray.stages.curate import cluster_representatives

    # docs 0/1/2 are near-dups; doc 1 is longer (higher quality_score:
    # the length term saturates at 200 chars). doc 3 is unrelated.
    base = "the quick brown fox jumps over the lazy dog by the river today "
    texts = [base * 2, base * 4, base * 2 + "and then some more words here",
             "completely different content about mountains and weather " * 3]
    ds = rd.from_arrow(_docs_table(texts))
    out = cluster_representatives(ds, threshold=0.35).to_pandas()
    assert len(out) == 1                      # one cluster (docs 0-2)
    row = out.iloc[0]
    assert row["n_members"] == 3
    assert row["rep_id"] == 1                 # the longest, not min id 0


def test_cluster_representatives_injected_clusters(ray_session):
    from mvt_wrangler_ray.stages.curate import cluster_representatives

    texts = ["short one here now", "a much longer document " * 12,
             "tiny words", "another long rich document " * 12]
    ds = rd.from_arrow(_docs_table(texts))
    clusters = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "cluster_id": pa.array([0, 0, 2, 2], pa.int64())}))
    out = cluster_representatives(ds, clusters_ds=clusters).to_pandas(
    ).sort_values("cluster_id").reset_index(drop=True)
    assert out["rep_id"].tolist() == [1, 3]   # quality argmax per cluster
    assert out["n_members"].tolist() == [2, 2]


def test_cluster_representatives_no_pairs_empty(ray_session):
    from mvt_wrangler_ray.stages.curate import cluster_representatives

    texts = ["alpha beta gamma delta", "completely unrelated words here",
             "third document about other topics entirely"]
    out = cluster_representatives(
        rd.from_arrow(_docs_table(texts)), threshold=0.9).take_all()
    assert out == []


# ---- composed image curation ----------------------------------------------


def test_clean_images_stats_and_planted_copy_drop(ray_session):
    from mvt_wrangler_ray.pipelines.images import clean_images
    from mvt_wrangler_ray.sources.images import synth_images_table

    # synth table with planted near-dups: replicate the retouched-copy
    # convention by duplicating payloads for every 5th image
    import pyarrow.compute as pc

    base = synth_images_table(200)
    # make ids 5k+4 exact copies of 5k+3 (hamming 0 -> always verified)
    df = base.to_pandas()
    for i in range(4, 200, 5):
        for col in ("bytes", "w", "h", "fmt", "phash"):
            df.at[i, col] = df.at[i - 1, col]
    df["doc_id"] = np.arange(200, dtype=np.int64)
    ds = rd.from_pandas(df)

    survivors, stats = clean_images(ds)
    assert stats["input"] == 200
    assert stats["after_size_gate"] <= 200
    assert stats["output"] == stats["after_size_gate"] - stats["near_dup_dropped"]
    # every dropped id is the higher member of a verified pair
    assert stats["near_dup_dropped"] <= stats["near_dup_pairs"] or \
        stats["near_dup_pairs"] == 0
    got_ids = set(survivors.to_pandas()["doc_id"])
    assert len(got_ids) == stats["output"]
    # no surviving copy whose base also survived the size gate
    # (exact copies share w/h, so base survives iff copy survives)
    for i in range(4, 200, 5):
        if i in got_ids:
            assert (i - 1) not in got_ids or True  # copy dropped, base kept
            # the copy must NOT survive if its base is in
            assert not ((i - 1) in got_ids and i in got_ids)


def test_clean_images_empty_input(ray_session):
    from mvt_wrangler_ray.pipelines.images import clean_images
    from mvt_wrangler_ray.sources.images import synth_images_table

    empty = rd.from_arrow(synth_images_table(0))
    survivors, stats = clean_images(empty)
    assert stats["input"] == 0 and stats["output"] == 0
    assert survivors.take_all() == []


# ---- split leakage audit ----------------------------------------------------


def test_split_leakage_partitions_pairs(ray_session):
    from mvt_wrangler_ray.stages.curate import split_leakage
    from mvt_wrangler_ray.stages.dedup import minhash_near_dups

    # 40 docs in 20 near-identical pairs (i, i+1000 share text)
    texts = [f"document number {i} about the weather in the mountains "
             f"and the rivers nearby with plenty of shared words" for i in
             range(20)]
    t = pa.table({
        "doc_id": pa.array(list(range(20)) + [i + 1000 for i in range(20)],
                           pa.int64()),
        "text": pa.array(texts + texts, pa.string())})
    ds = rd.from_arrow(t)
    out = split_leakage(ds, threshold=0.9).to_pandas()
    n_pairs = len(minhash_near_dups(ds, threshold=0.9))
    assert out["n_pairs"].sum() == n_pairs      # partitions the pair set
    assert (out["split_a"] <= out["split_b"]).all()


def test_split_leakage_no_pairs_empty(ray_session):
    from mvt_wrangler_ray.stages.curate import split_leakage

    ds = rd.from_arrow(_docs_table(
        ["alpha beta gamma", "totally different words here",
         "third unrelated document text"]))
    assert len(split_leakage(ds, threshold=0.95)) == 0


# ---- vocabulary coverage ----------------------------------------------------


def test_vocab_coverage_exact_small_case(ray_session):
    from mvt_wrangler_ray.stages.curate import vocab_coverage

    ds = rd.from_arrow(_docs_table(["a a a b b c", "a b d", ""]))
    out = vocab_coverage(ds, k=3).to_pandas()
    # counts: a=4, b=3, c=1, d=1 (total 9); top-3 ties broken by word asc
    assert out["word"].tolist() == ["a", "b", "c"]
    assert out["n"].tolist() == [4, 3, 1]
    assert out["rank"].tolist() == [1, 2, 3]
    assert np.allclose(out["cum_frac"], [4 / 9, 7 / 9, 8 / 9])
    # cumulative coverage is monotone and <= 1
    assert (out["cum_frac"].diff().dropna() > 0).all()
    assert out["cum_frac"].iloc[-1] <= 1.0


def test_vocab_coverage_k_larger_than_vocab(ray_session):
    from mvt_wrangler_ray.stages.curate import vocab_coverage

    out = vocab_coverage(rd.from_arrow(_docs_table(["x y", "y"])),
                         k=50).to_pandas()
    assert len(out) == 2
    assert out["cum_frac"].iloc[-1] == 1.0


# ---- quality calibration ----------------------------------------------------


def test_quality_calibrate_keep_rate(ray_session):
    from mvt_wrangler_ray.stages.curate import quality_calibrate
    from mvt_wrangler_ray.stages.text import quality_score_batch

    # near-continuous scores: distinct sub-saturation lengths so no
    # single score carries a large tie mass (the documented tie
    # contract: with heavy ties only n_kept is meaningful)
    texts = ["x" * (i % 190 + 5) for i in range(400)]
    t = _docs_table(texts)
    out = quality_calibrate(rd.from_arrow(t), keep_rate=0.6).to_pandas()
    row = out.iloc[0]
    assert row["n_total"] == 400
    # the kept fraction lands near the target for continuous-ish data
    frac = row["n_kept"] / 400
    assert 0.55 <= frac <= 0.65
    # the threshold separates the corpus exactly as counted
    qs = quality_score_batch(t)["quality_score"].to_numpy()
    assert int((qs >= row["threshold"]).sum()) == row["n_kept"]


def test_quality_calibrate_empty(ray_session):
    from mvt_wrangler_ray.stages.curate import quality_calibrate

    out = quality_calibrate(rd.from_arrow(_docs_table([]))).to_pandas()
    assert out.iloc[0]["n_total"] == 0 and out.iloc[0]["n_kept"] == 0


# ---- truncation report ------------------------------------------------------


def test_truncation_report_conservation(ray_session):
    from mvt_wrangler_ray.stages.curate import truncation_report

    lens = [0, 5, 100, 128, 129, 600, 3000]
    texts = [" ".join(["w"] * n) for n in lens]
    out = truncation_report(rd.from_arrow(_docs_table(texts)),
                            seq_lens=(128, 512)).to_pandas().set_index(
        "seq_len")
    total = sum(lens)
    for L in (128, 512):
        # kept + lost == total tokens (conservation)
        assert out.loc[L, "kept_tokens"] + out.loc[L, "lost_tokens"] == total
        assert out.loc[L, "n_truncated"] == sum(1 for n in lens if n > L)
    # longer seq_len keeps at least as much
    assert out.loc[512, "kept_tokens"] >= out.loc[128, "kept_tokens"]


# ---- differential / property tests ------------------------------------------


def test_diff_group_kernel_differential_hypothesis():
    # the per-bucket diff kernel vs a dict-based reference over random
    # two-snapshot tables (pure numpy, no Ray per example)
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mvt_wrangler_ray.stages.diff import _diff_group

    snap = st.dictionaries(st.integers(0, 30), st.sampled_from("abcd"),
                           max_size=20)

    @settings(max_examples=300, deadline=None)
    @given(snap, snap)
    def run(old, new):
        ids, sides, hs = [], [], []
        for i, h in old.items():
            ids.append(i); sides.append(0); hs.append(h)
        for i, h in new.items():
            ids.append(i); sides.append(1); hs.append(h)
        g = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "side": pa.array(sides, pa.int8()),
                      "h": pa.array(hs, pa.string())})
        got = {r["doc_id"]: r["status"]
               for r in _diff_group(g, "doc_id").to_pylist()}
        want = {}
        for i in set(old) | set(new):
            if i not in new:
                want[i] = "removed"
            elif i not in old:
                want[i] = "added"
            elif old[i] != new[i]:
                want[i] = "changed"
        assert got == want, (old, new, got, want)

    run()


def test_split_bucket_matches_duckdb_hypothesis():
    # the split hash vs DuckDB integer arithmetic (the oracle's exact
    # HUGEINT expression) over random id vectors — ids past 2^31
    # included: this test CAUGHT the original BIGINT oracle overflowing
    # at doc_id > ~3.47e9 (a real id range at 100 TB), which is why the
    # registered oracles multiply in HUGEINT
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mvt_wrangler_ray.stages.curate import split_bucket

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.integers(0, 2**40), min_size=1, max_size=50))
    def run(ids):
        got = split_bucket(np.asarray(ids, np.int64)).astype(np.int64)
        want = duckdb.sql(
            "SELECT ((CAST(i AS HUGEINT) * 2654435761) % 4294967296) % 100 "
            "AS b FROM (SELECT unnest($1) AS i)",
            params=[ids]).df()["b"].to_numpy()
        assert np.array_equal(got, want.astype(np.int64)), (ids, got, want)

    run()


def test_curriculum_rank_matches_bruteforce(ray_session):
    from mvt_wrangler_ray.stages.curate import curriculum_rank
    from mvt_wrangler_ray.stages.shuffle import _splitmix
    from mvt_wrangler_ray.stages.text import quality_score_batch

    rng = np.random.default_rng(3)
    texts = ["".join(rng.choice(list("abc de,f.g1 "), size=int(n)))
             for n in rng.integers(1, 300, size=200)]
    t = _docs_table(texts)
    got = curriculum_rank(rd.from_arrow(t), seed=5).to_pandas(
    ).sort_values("doc_id").reset_index(drop=True)

    qs = quality_score_batch(t)["quality_score"].to_numpy()
    phase = np.int64(9) - np.minimum(np.floor(qs * 10.0).astype(np.int64), 9)
    ids = np.arange(200, dtype=np.int64)
    h = _splitmix(ids.astype(np.uint64) ^ np.uint64(5))
    order = np.lexsort((ids, h, phase))
    want_rank = np.empty(200, np.int64)
    want_rank[order] = np.arange(200)
    assert np.array_equal(got["curriculum_rank"].to_numpy(), want_rank)
    assert np.array_equal(got["phase"].to_numpy(), phase)
