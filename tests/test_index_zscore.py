"""Inverted index digest + group z-score vs row-wise oracles."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from mvt_wrangler_ray.stages.retrieval import inverted_index
from mvt_wrangler_ray.stages.shuffle import group_zscore


def test_inverted_index_matches_oracle(ray_session):
    texts = ["a b c", "b c d", "c d e", "  a   c ", ""]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 20, 30, 40, 50], pa.int64()),
        "text": pa.array(texts, pa.string())}))
    got = inverted_index(ds, min_df=1).to_pandas().set_index("tok")
    want = {"a": [10, 40], "b": [10, 20], "c": [10, 20, 30, 40],
            "d": [20, 30], "e": [30]}
    assert set(got.index) == set(want)
    for t, ids in want.items():
        assert got.loc[t, "df"] == len(ids)
        assert got.loc[t, "postings_md5"] == hashlib.md5(
            ",".join(map(str, ids)).encode()).hexdigest()
    # min_df filters
    got2 = inverted_index(ds, min_df=2).to_pandas()
    assert set(got2["tok"]) == {"a", "b", "c", "d"}


def test_group_zscore_matches_oracle(ray_session):
    rng = np.random.default_rng(17)
    n = 5000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "grp": rng.choice(["X", "Y", "Z"], n),
        "val": rng.integers(1, 51, n).astype(np.float64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = group_zscore(ds, ["grp"], "val", id_cols=["id"]).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    for g, sub in df.groupby("grp"):
        v = sub["val"].to_numpy().astype(np.int64)
        nn = np.float64(len(v))
        mean = np.float64(v.sum()) / nn
        vp = np.float64((v * v).sum()) / nn - mean * mean
        want = (v.astype(np.float64) - mean) / np.sqrt(vp)
        gv = got.set_index("id").loc[sub["id"], "z"].to_numpy()
        assert np.array_equal(gv, want)


def test_group_zscore_constant_group(ray_session):
    df = pd.DataFrame({
        "id": np.arange(4, dtype=np.int64),
        "grp": ["C"] * 4,
        "val": [7.0] * 4})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = group_zscore(ds, ["grp"], "val", id_cols=["id"]).to_pandas()
    assert (got["z"] == 0.0).all()


def test_weighted_sample_favors_heavy_weights(ray_session):
    from mvt_wrangler_ray.stages.shuffle import weighted_sample_topk
    n = 10_000
    ids = np.arange(n, dtype=np.int64)
    # ids 0..9 carry 1e6x the weight of the rest
    w = np.where(ids < 10, 1e6, 1.0)
    ds = rd.from_arrow(pa.table({
        "o_orderkey": pa.array(ids, pa.int64()),
        "o_totalprice": pa.array(w, pa.float64())}))
    out = weighted_sample_topk(ds, "o_orderkey", "o_totalprice", k=20)
    assert len(out) == 20
    # at 1e6x weight every heavy id's priority (~1e-6) beats the 20th
    # order statistic of 9990 unit exponentials (~2e-3)
    assert sum(1 for i in out["o_orderkey"] if i < 10) == 10
    # deterministic: same input -> same sample
    out2 = weighted_sample_topk(ds, "o_orderkey", "o_totalprice", k=20)
    assert list(out["o_orderkey"]) == list(out2["o_orderkey"])


def test_revenue_by_nation_cutover_equivalence(ray_session):
    import __ray_entry__ as entry
    sf = "/root/testdata/sf0.001"
    a = entry._q_revenue_by_nation(sf).to_pandas() \
        .sort_values("n_name").reset_index(drop=True)
    b = entry._q_revenue_by_nation(sf, broadcast_orders_limit=0) \
        .to_pandas().sort_values("n_name").reset_index(drop=True)
    assert a.equals(b)


def test_knn_self_join_matches_brute_force(ray_session):
    from mvt_wrangler_ray.stages.knn import knn_self_join
    rng = np.random.default_rng(31)
    n, dim = 200, 16
    vecs = rng.normal(size=(n, dim))
    ids = rng.permutation(n).astype(np.int64) * 3  # non-dense ids
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(list(vecs),
                                        pa.list_(pa.float32()))})
    got = knn_self_join(rd.from_arrow(t)).to_pandas() \
        .set_index("vec_id")["nn_id"]
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    # brute force on the SAME float32-rounded vectors the table stores
    v32 = np.asarray(list(t["embedding"].to_pylist()), dtype=np.float64)
    v32 = v32 / np.linalg.norm(v32, axis=1, keepdims=True)
    sims = v32 @ v32.T
    np.fill_diagonal(sims, -np.inf)
    order = np.argsort(ids, kind="stable")
    for row, i in enumerate(ids):
        srow = sims[row]
        best = np.max(srow)
        cands = ids[np.nonzero(srow == best)[0]]
        assert got.loc[i] == cands.min()


def test_knn_self_join_forced_ivf_cutover_equals_exact(ray_session):
    """Above broadcast_limit the self-join must AUTOMATICALLY cut over
    to the IVF-partitioned lane (round-3 verdict item 2) — and at
    nprobe = ncentroids the cutover lane is exact, so it must equal the
    broadcast lane row for row."""
    from mvt_wrangler_ray.stages.knn import knn_self_join
    rng = np.random.default_rng(33)
    n, dim = 300, 12
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    ids = rng.permutation(n).astype(np.int64) * 7 + 3
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(list(vecs),
                                        pa.list_(pa.float32()))})
    exact = knn_self_join(rd.from_arrow(t)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    # broadcast_limit=10 forces the IVF lane; nprobe=ncentroids → exact
    ivf = knn_self_join(rd.from_arrow(t), broadcast_limit=10,
                        ncentroids=6, nprobe=6).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert list(ivf.columns) == ["vec_id", "nn_id"]
    assert exact.equals(ivf)


def test_knn_self_join_ivf_partial_probe_recall(ray_session):
    """nprobe < ncentroids is the approximate scale path: every row
    still gets exactly one neighbor row, and neighbors inside the same
    centroid partition are found exactly (well-separated blobs)."""
    from mvt_wrangler_ray.stages.knn import knn_self_join_ivf
    rng = np.random.default_rng(34)
    # 4 far-apart blobs of 30: each row's true NN is inside its blob
    centers = rng.normal(size=(4, 8)) * 50.0
    vecs = np.concatenate([c + rng.normal(0, 0.01, (30, 8))
                           for c in centers]).astype(np.float32)
    ids = np.arange(120, dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(list(vecs),
                                        pa.list_(pa.float32()))})
    out = knn_self_join_ivf(rd.from_arrow(t), ncentroids=4, nprobe=1,
                            sample_rows=120).to_pandas()
    assert len(out) == 120
    assert set(out["vec_id"]) == set(ids.tolist())
    # same-blob neighbor for every row (blobs are 50σ apart)
    blob = dict(zip(ids.tolist(), (ids // 30).tolist()))
    assert all(blob[int(a)] == blob[int(b)]
               for a, b in zip(out["vec_id"], out["nn_id"]))
