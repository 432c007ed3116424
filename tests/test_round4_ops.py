"""Round-4 operators: n-gram contamination (decontamination pass) and
grid-based spatial clustering — brute-force references plus the
forced-cutover equivalence the repo requires for every broadcast lane."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from mvt_wrangler_ray.stages.cluster import grid_clusters
from mvt_wrangler_ray.stages.dedup import ngram_contamination
from mvt_wrangler_ray.stages.text import md5_lower64


def _brute_contamination(train, eval_, n=3):
    ev = set()
    for t in eval_["text"]:
        ws = t.lower().split()
        for g in range(len(ws) - n + 1):
            ev.add(" ".join(ws[g:g + n]))
    rows = []
    for did, t in zip(train["doc_id"], train["text"]):
        ws = t.lower().split()
        grams = {" ".join(ws[g:g + n]) for g in range(len(ws) - n + 1)}
        if not grams:
            continue
        hit = len(grams & ev)
        rows.append((did, len(grams), hit, hit / len(grams),
                     int(hit > 0)))
    return pd.DataFrame(rows, columns=["doc_id", "n_ngrams", "n_overlap",
                                       "contamination", "contaminated"])


TRAIN = pd.DataFrame({
    "doc_id": [1, 2, 3, 4, 5],
    "text": [
        "the quick brown fox jumps over the lazy dog",
        "a wholly original sentence with no eval overlap at all",
        "short",                       # < n words: no row
        "the quick brown fox appears here too with extra words",
        "repeated words repeated words repeated words",  # dup windows
    ]})
EVAL = pd.DataFrame({
    "doc_id": [100, 101],
    "text": [
        "watch the quick brown fox carefully",
        "completely unrelated benchmark prompt",
    ]})


@pytest.mark.parametrize("force_join", [False, True])
def test_contamination_matches_brute(ray_session, force_join):
    kw = {"broadcast_eval_limit": 0} if force_join else {}
    got = (ngram_contamination(rd.from_pandas(TRAIN),
                               rd.from_pandas(EVAL), n=3, **kw)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _brute_contamination(TRAIN, EVAL, 3) \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_ngrams"].tolist() == want["n_ngrams"].tolist()
    assert got["n_overlap"].tolist() == want["n_overlap"].tolist()
    assert got["contaminated"].tolist() == want["contaminated"].tolist()
    assert np.allclose(got["contamination"], want["contamination"],
                       rtol=0, atol=0)
    # doc 3 (< n words) emits no row; doc 1 and 4 share "the quick
    # brown" windows with eval; doc 2 is clean
    assert 3 not in got["doc_id"].tolist()
    assert got.set_index("doc_id")["contaminated"][1] == 1
    assert got.set_index("doc_id")["contaminated"][2] == 0


def test_contamination_lanes_equal_on_random_docs(ray_session):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    docs = pd.DataFrame({
        "doc_id": np.arange(60, dtype=np.int64),
        "text": [" ".join(rng.choice(vocab, size=rng.integers(2, 30)))
                 for _ in range(60)]})
    tr, ev = docs.iloc[:50], docs.iloc[50:]
    a = (ngram_contamination(rd.from_pandas(tr), rd.from_pandas(ev), n=4)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (ngram_contamination(rd.from_pandas(tr), rd.from_pandas(ev), n=4,
                             broadcast_eval_limit=0)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_contamination_empty_eval(ray_session):
    got = (ngram_contamination(rd.from_pandas(TRAIN),
                               rd.from_pandas(EVAL.iloc[:0]), n=3)
           .to_pandas())
    assert (got["n_overlap"] == 0).all()
    assert (got["contaminated"] == 0).all()


def _brute_components(cells):
    cs = set(cells)
    lab = {c: c for c in cs}

    def find(x):
        while lab[x] != x:
            lab[x] = lab[lab[x]]
            x = lab[x]
        return x

    for c in cs:
        for d in (c + 1, c + 1024):
            if d in cs:
                ra, rb = find(c), find(d)
                if ra != rb:
                    lab[max(ra, rb)] = min(ra, rb)
    return {c: find(c) for c in cs}


def test_grid_clusters_planted(ray_session):
    # two plus-shaped blobs far apart + one isolated point, res 10°:
    # cells are (cx*1024+cy); blob A spans cells (1,1),(1,2),(2,1);
    # blob B spans (20,10),(21,10); point C isolated at (30,3)
    def pt(cx, cy, jitter):
        # center of cell (cx, cy) at res 10: lon = cx*10 - 180 + 5
        return (cx * 10 - 180 + 5 + jitter, cy * 10 - 90 + 5 + jitter)

    pts = [pt(1, 1, 0), pt(1, 1, 1), pt(1, 2, 0), pt(2, 1, 0),
           pt(20, 10, 0), pt(21, 10, 2), pt(30, 3, 0)]
    df = pd.DataFrame(pts, columns=["lon", "lat"])
    out = grid_clusters(rd.from_pandas(df), res_deg=10.0, min_pts=1)
    out = out.sort_values("cell").reset_index(drop=True)
    want = _brute_components(out["cell"].tolist())
    assert dict(zip(out["cell"], out["cluster_id"])) == want
    # blob A = one cluster of 3 cells, blob B = one of 2, C isolated
    sizes = sorted(out.groupby("cluster_id").size().tolist())
    assert sizes == [1, 2, 3]
    # counts: cell (1,1) holds 2 points
    assert out.set_index("cell")["n_points"][1 * 1024 + 1] == 2


def test_grid_clusters_min_pts_gate(ray_session):
    df = pd.DataFrame({"lon": [-175.0, -175.0, -165.0],
                       "lat": [-85.0, -85.0, -85.0]})
    out = grid_clusters(rd.from_pandas(df), res_deg=10.0, min_pts=2)
    # only the doubly-occupied cell survives the gate
    assert len(out) == 1
    assert out["n_points"].tolist() == [2]
    assert out["cluster_id"].tolist() == out["cell"].tolist()


def test_window_hash_is_md5_lower64():
    # the SQL-parity primitive: window hash == md5_number_lower of the
    # joined window string (int64 two's complement view)
    from mvt_wrangler_ray.stages.dedup import span_windows_batch

    b = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "text": pa.array(["Alpha beta GAMMA delta"])})
    w = span_windows_batch(b, 3)
    assert w["whash"].to_pylist() == [
        np.uint64(md5_lower64("alpha beta gamma")).astype(np.int64),
        np.uint64(md5_lower64("beta gamma delta")).astype(np.int64)]


def test_knn_self_graph_matches_brute(ray_session):
    rng = np.random.default_rng(3)
    n, d, k = 40, 8, 3
    vecs = rng.normal(size=(n, d))
    ids = np.arange(100, 100 + n, dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    from mvt_wrangler_ray.stages.knn import knn_self_graph

    got = (knn_self_graph(rd.from_pandas(df), k=k)
           .to_pandas().sort_values(["vec_id", "nn_rank"])
           .reset_index(drop=True))
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = nv @ nv.T
    np.fill_diagonal(sims, -np.inf)
    for i in range(n):
        order = np.lexsort((ids, -sims[i]))[:k]
        mine = got[got["vec_id"] == ids[i]]
        assert mine["nn_rank"].tolist() == [1, 2, 3]
        assert mine["nn_id"].tolist() == ids[order].tolist()


def test_knn_self_graph_small_corpus(ray_session):
    # k larger than n-1: emit only the n-1 real neighbors
    df = pd.DataFrame({"vec_id": np.array([1, 2, 3], np.int64),
                       "embedding": [np.array([1.0, 0.0]),
                                     np.array([0.9, 0.1]),
                                     np.array([0.0, 1.0])]})
    from mvt_wrangler_ray.stages.knn import knn_self_graph

    got = knn_self_graph(rd.from_pandas(df), k=10).to_pandas()
    assert len(got) == 6  # 3 rows x 2 other rows each
    assert got.groupby("vec_id")["nn_rank"].max().tolist() == [2, 2, 2]


def test_knn_self_graph_ivf_cutover_equals_exact(ray_session):
    # forced cutover (broadcast_limit=0) with nprobe=ncentroids is EXACT:
    # must equal the broadcast lane row for row
    rng = np.random.default_rng(11)
    n, d, k = 60, 6, 3
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(rng.normal(size=(n, d)))})
    from mvt_wrangler_ray.stages.knn import knn_self_graph

    a = (knn_self_graph(rd.from_pandas(df), k=k)
         .to_pandas().sort_values(["vec_id", "nn_rank"])
         .reset_index(drop=True))
    b = (knn_self_graph(rd.from_pandas(df), k=k, broadcast_limit=0,
                        ncentroids=4, nprobe=4)
         .to_pandas().sort_values(["vec_id", "nn_rank"])
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a[["vec_id", "nn_rank", "nn_id"]],
                                  b[["vec_id", "nn_rank", "nn_id"]])


def test_knn_self_join_ivf_k1_shape_unchanged(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"vec_id": np.arange(30, dtype=np.int64),
                       "embedding": list(rng.normal(size=(30, 5)))})
    from mvt_wrangler_ray.stages.knn import knn_self_join, knn_self_join_ivf

    a = (knn_self_join(rd.from_pandas(df)).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    b = (knn_self_join_ivf(rd.from_pandas(df), ncentroids=4, nprobe=4)
         .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert list(b.columns) == ["vec_id", "nn_id"]
    pd.testing.assert_frame_equal(a, b)


def test_mixture_resample_quotas(ray_session):
    from mvt_wrangler_ray.stages.shuffle import mixture_resample

    # 3 groups with skewed sizes; weights force cap + proportional mix
    df = pd.DataFrame({
        "doc_id": np.arange(100, dtype=np.int64),
        "source": ["a"] * 70 + ["b"] * 25 + ["c"] * 5})
    weights = {"a": 1, "b": 1, "c": 8}
    out = mixture_resample(rd.from_pandas(df), "source", weights,
                           "doc_id").to_pandas()
    got = out.groupby("source").size().to_dict()
    # budget = 50, sw = 10: a -> min(70, 50*1//10)=5, b -> min(25,5)=5,
    # c -> min(5, 50*8//10)=5 (capped by availability)
    assert got == {"a": 5, "b": 5, "c": 5}
    # determinism: same call returns the same ids
    out2 = mixture_resample(rd.from_pandas(df), "source", weights,
                            "doc_id").to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # members must come from their own group
    assert (out[out["source"] == "c"]["doc_id"] >= 95).all()


def test_contamination_bucketed_lane_survives_block_splits(ray_session):
    # regression (round-4 review): the window explode is much larger
    # than the doc rows, and Ray splits it into blocks; per-doc
    # distinctness must be complete BEFORE any split or duplicate
    # windows straddling a boundary double-count. Force tiny blocks and
    # a doc whose 500x-repeated text explodes past them.
    import ray

    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 1 << 14  # 16 KiB
    try:
        tr = pd.DataFrame({
            "doc_id": np.array([1], np.int64),
            "text": ["alpha beta gamma delta " * 500]})
        ev = pd.DataFrame({
            "doc_id": np.array([9], np.int64),
            "text": ["beta gamma delta"]})
        a = ngram_contamination(rd.from_pandas(tr), rd.from_pandas(ev),
                                n=3).to_pandas()
        b = ngram_contamination(rd.from_pandas(tr), rd.from_pandas(ev),
                                n=3, broadcast_eval_limit=0).to_pandas()
        # 4 distinct 3-grams in the cycle, 1 shared with eval
        assert a["n_ngrams"].tolist() == [4]
        assert a["n_overlap"].tolist() == [1]
        pd.testing.assert_frame_equal(
            a.sort_values("doc_id").reset_index(drop=True),
            b.sort_values("doc_id").reset_index(drop=True))
    finally:
        ctx.target_max_block_size = old


def test_grid_clusters_rejects_overflowing_resolution(ray_session):
    # regression (round-4 review): res below 180/1023 deg packs >= 1024
    # latitude rows and distinct cells would collide into one id
    df = pd.DataFrame({"lon": [-179.95, -179.85], "lat": [12.45, -89.95]})
    with pytest.raises(ValueError, match="row stride"):
        grid_clusters(rd.from_pandas(df), res_deg=0.1)


def test_mixture_resample_unweighted_group_dropped(ray_session):
    from mvt_wrangler_ray.stages.shuffle import mixture_resample

    df = pd.DataFrame({"doc_id": np.arange(20, dtype=np.int64),
                       "source": ["a"] * 10 + ["b"] * 10})
    out = mixture_resample(rd.from_pandas(df), "source", {"a": 1},
                           "doc_id").to_pandas()
    # budget = 10, sw = 1: a -> min(10, 10) = 10 kept, b -> weight 0 -> 0
    assert set(out["source"]) == {"a"}
    assert len(out) == 10


def test_burst_counts_matches_brute(ray_session):
    from mvt_wrangler_ray.stages.events import burst_counts

    rng = np.random.default_rng(2)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.integers(0, 12, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 3_600_000_000, n),
                             unit="us")})
    W = 300.0  # 5-minute window
    got = (burst_counts(rd.from_pandas(df), window_seconds=W)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    rows = []
    for u, sub in df.groupby("user_id"):
        t = np.sort(sub["ts"].astype("datetime64[us]").astype(np.int64))
        c = [((t >= x) & (t < x + int(W * 1e6))).sum() for x in t]
        rows.append((u, max(c), len(t)))
    want = pd.DataFrame(rows, columns=["user_id", "max_burst",
                                       "n_events"]) \
        .sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"max_burst": np.int64, "n_events": np.int64}), want)


def test_burst_counts_duplicate_timestamps(ray_session):
    from mvt_wrangler_ray.stages.events import burst_counts

    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "user_id": np.array([1, 1, 1, 2], np.int64),
        "ts": [t0, t0, t0 + pd.Timedelta(hours=2), t0]})
    out = (burst_counts(rd.from_pandas(df), window_seconds=60.0)
           .to_pandas().set_index("user_id"))
    # both ts-equal events count each other; the 2h-later one is alone
    assert out.loc[1, "max_burst"] == 2 and out.loc[1, "n_events"] == 3
    assert out.loc[2, "max_burst"] == 1


def test_blur_score_flat_vs_textured(ray_session):
    from mvt_wrangler_ray.stages.image import BlurScoreStage

    from mvt_wrangler_ray.codecs.png import encode_png

    flat = np.full((16, 16), 128, np.uint8)
    tex = (np.indices((16, 16)).sum(axis=0) % 2 * 255).astype(np.uint8)
    b = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "bytes": pa.array([encode_png(flat), encode_png(tex)],
                          pa.binary()),
        "w": pa.array([16, 16], pa.int32()),
        "h": pa.array([16, 16], pa.int32())})
    out = BlurScoreStage()(b).to_pandas().set_index("doc_id")
    # a constant image has zero Laplacian variance; a checkerboard's is
    # the maximum possible (|L| = 1020 everywhere, mean 0 on interior)
    assert out.loc[1, "blur_var"] == 0.0
    assert out.loc[2, "blur_var"] > 1e5
    assert (out["n_interior"] == 14 * 14).all()


def test_profile_numeric_columns(ray_session):
    from mvt_wrangler_ray.stages.sketch import profile_numeric_columns

    df = pd.DataFrame({
        "a": [1.0, np.nan, 3.0, -2.0],
        "b": [np.nan, np.nan, np.nan, np.nan],
        "c": [5.0, 5.0, 5.0, 5.0]})
    out = profile_numeric_columns(
        rd.from_pandas(df), ["a", "b", "c"]).set_index("col")
    assert out.loc["a", "n_rows"] == 4 and out.loc["a", "n_null"] == 1
    assert out.loc["a", "min_v"] == -2.0 and out.loc["a", "max_v"] == 3.0
    assert out.loc["b", "n_null"] == 4 and np.isnan(out.loc["b", "min_v"])
    assert out.loc["c", "min_v"] == out.loc["c", "max_v"] == 5.0


def test_incremental_dedup_planted(ray_session):
    from mvt_wrangler_ray.stages.dedup import incremental_dedup

    base = pd.DataFrame({
        "doc_id": np.array([1, 2], np.int64),
        "text": ["existing content", "other existing"]})
    inc = pd.DataFrame({
        "doc_id": np.array([10, 11, 12, 13], np.int64),
        "text": ["existing content",   # dup of base -> dropped
                 "brand new",          # kept
                 "brand new",          # within-incoming dup -> min id kept
                 "also new"]})         # kept
    out = (incremental_dedup(rd.from_pandas(inc), rd.from_pandas(base))
           .to_pandas())
    assert sorted(out["doc_id"]) == [11, 13]


def test_blur_score_sub3px_emits_no_row(ray_session):
    from mvt_wrangler_ray.codecs.png import encode_png
    from mvt_wrangler_ray.stages.image import BlurScoreStage

    tiny = np.full((2, 2), 7, np.uint8)
    ok = np.full((4, 4), 7, np.uint8)
    b = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "bytes": pa.array([encode_png(tiny), encode_png(ok)], pa.binary()),
        "w": pa.array([2, 4], pa.int32()),
        "h": pa.array([2, 4], pa.int32())})
    out = BlurScoreStage()(b).to_pandas()
    # the 2x2 image has no interior -> NO row (matching the oracle's
    # empty unnest), not a 0/0 NaN row
    assert out["doc_id"].tolist() == [2]
    assert np.isfinite(out["blur_var"]).all()


def test_profile_empty_dataset(ray_session):
    from mvt_wrangler_ray.stages.sketch import profile_numeric_columns

    df = pd.DataFrame({"a": pd.Series([], dtype=np.float64)})
    out = profile_numeric_columns(rd.from_pandas(df), ["a"])
    assert out["n_rows"].tolist() == [0]
    assert out["n_null"].tolist() == [0]
    assert np.isnan(out["min_v"]).all() and np.isnan(out["max_v"]).all()


def test_profile_nan_skipped_for_extrema(ray_session):
    from mvt_wrangler_ray.stages.sketch import profile_numeric_columns

    df = pd.DataFrame({"a": [1.0, np.nan, 5.0]})
    # pandas converts the NaN to null on from_pandas? keep as float NaN
    # via an explicit arrow table round trip
    t = pa.table({"a": pa.array([1.0, float("nan"), 5.0], pa.float64())})
    out = profile_numeric_columns(rd.from_arrow(t), ["a"])
    # documented contract: NaN skipped for extrema (Arrow kernel / the
    # oracle's isnan filter)
    assert out["min_v"].tolist() == [1.0]
    assert out["max_v"].tolist() == [5.0]


def test_mixture_resample_quota_property(ray_session):
    # property over random sizes/weights: per-group counts equal the
    # exact-integer quota formula and members are the splitmix head
    from mvt_wrangler_ray.stages.shuffle import _splitmix, mixture_resample

    rng = np.random.default_rng(13)
    sizes = {f"g{i}": int(rng.integers(1, 40)) for i in range(6)}
    weights = {f"g{i}": int(rng.integers(0, 9)) for i in range(6)}
    rows = []
    nid = 0
    for g, sz in sizes.items():
        for _ in range(sz):
            rows.append((nid, g)); nid += 1
    df = pd.DataFrame(rows, columns=["doc_id", "source"])
    df["doc_id"] = df["doc_id"].astype(np.int64)
    out = mixture_resample(rd.from_pandas(df), "source", weights,
                           "doc_id").to_pandas()
    total = len(df); budget = total // 2
    sw = sum(weights.get(g, 0) for g in sizes) or 1
    for g, sz in sizes.items():
        quota = min(sz, budget * weights.get(g, 0) // sw)
        mine = out[out["source"] == g]
        assert len(mine) == quota, (g, len(mine), quota)
        # expected members: smallest splitmix(doc_id) first
        ids = df[df["source"] == g]["doc_id"].to_numpy(np.uint64)
        order = np.lexsort((ids, _splitmix(ids)))
        assert sorted(mine["doc_id"]) == sorted(
            ids[order][:quota].astype(np.int64).tolist())


def test_corpus_cli_decontaminate(tmp_path, ray_session):
    """The corpus CLI's --decontaminate surface: library-level
    equivalent of `python -m mvt_wrangler_ray corpus ... --decontaminate
    EVAL` — survivors sharing an eval 5-gram are dropped and counted.
    (The CLI owns its own ray session, so the test composes the same
    stages the CLI wires rather than subprocessing.)"""
    from mvt_wrangler_ray.pipelines.corpus import clean_corpus
    from mvt_wrangler_ray.stages.dedup import ngram_contamination
    from mvt_wrangler_ray.stages.shuffle import bucketed_key_semi_join

    docs = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "text": ["an entirely clean document body here ok fine"] * 4
        + ["the secret benchmark answer is forty two indeed"] * 2
        + ["another clean piece of text with enough words in it"] * 2})
    # make each doc distinct so exact dedup keeps them all
    docs["text"] = docs["text"] + " tail" + docs["doc_id"].astype(str)
    ev = pd.DataFrame({
        "doc_id": np.array([99], np.int64),
        "text": ["the secret benchmark answer is forty two"]})
    survivors, stats = clean_corpus(
        rd.from_pandas(docs), min_quality=0.0, langs=("en", "und"),
        near_dup_threshold=0.99)
    survivors = survivors.materialize()
    cont = ngram_contamination(survivors, rd.from_pandas(ev),
                               n=5).map_batches(
        lambda b: b.filter(pa.compute.equal(b["contaminated"], 1))
        .select(["doc_id"]), batch_format="pyarrow").materialize()
    out = bucketed_key_semi_join(survivors, cont, "doc_id",
                                 anti=True).to_pandas()
    dropped = cont.count()
    assert dropped == 2                       # both secret-leak docs
    assert set(out["doc_id"]) == {0, 1, 2, 3, 6, 7}
