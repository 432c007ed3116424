"""Materialized IVF layout: build once, probe reads only the probed
shards (pruning at the READ, not after a full scan), exact at
nprobe = ncentroids."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mvt_wrangler_ray.stages.knn import (
    build_ivf_index,
    ivf_index_knn_topk,
    knn_topk,
    probe_partitions,
    train_centroids,
)

DIM = 16
N = 400


def _vectors(n, dim, seed=7):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, dim))


@pytest.fixture(scope="module")
def index(ray_session, tmp_path_factory):
    import ray.data as rd

    mat = _vectors(N, DIM)
    t = pa.table({
        "vec_id": pa.array(np.arange(N, dtype=np.int64)),
        "embedding": pa.array(list(mat), pa.list_(pa.float64())),
    })
    src = tmp_path_factory.mktemp("ivf_src")
    pq.write_table(t, str(src / "emb.parquet"))
    cents = train_centroids(mat[:128], ncentroids=8)
    out = str(tmp_path_factory.mktemp("ivf_idx"))
    recs = build_ivf_index(rd.read_parquet(str(src)), cents, out)
    return out, cents, mat, recs


def test_index_layout_one_shard_per_centroid(index):
    out, cents, _, recs = index
    assert len(recs) == len(cents)
    assert sum(r["rows"] for r in recs) == N
    for r in recs:
        # partition i holds exactly centroid i (aligned range bounds)
        assert r["key_hi"] - r["key_lo"] == 1


def test_probe_reads_fewer_rows_than_full_scan(index):
    out, cents, mat, recs = index
    q = mat[3][None, :]
    parts = probe_partitions(q, cents, nprobe=2)
    assert len(parts) == 2
    probed_rows = sum(r["rows"] for r in recs if r["partition"] in set(parts.tolist()))
    assert 0 < probed_rows < N  # strictly fewer rows leave storage
    # and the files NOT probed are never opened: the probed path list is
    # exactly the probed shards
    read_paths = [os.path.join(out, f"part={int(p):05d}", "data.parquet")
                  for p in parts]
    assert all(os.path.exists(p) for p in read_paths)


def test_full_probe_matches_brute_force(index, ray_session):
    import ray.data as rd

    out, cents, mat, _ = index
    q = mat[3][None, :]
    qids = np.array([0], dtype=np.int64)
    got = ivf_index_knn_topk(out, q, qids, cents, k=5, nprobe=len(cents))
    src = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(N, dtype=np.int64)),
        "embedding": pa.array(list(mat), pa.list_(pa.float64())),
    }))
    want = knn_topk(src, q, qids, k=5)
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert got["rank"].tolist() == want["rank"].tolist()


def test_partial_probe_subset_of_probed_partitions(index):
    out, cents, mat, _ = index
    q = mat[3][None, :]
    qids = np.array([0], dtype=np.int64)
    got = ivf_index_knn_topk(out, q, qids, cents, k=5, nprobe=2)
    # every result vector must live in a probed partition
    parts = set(probe_partitions(q, cents, nprobe=2).tolist())
    allowed = set()
    for p in parts:
        t = pq.read_table(os.path.join(out, f"part={p:05d}", "data.parquet"),
                          columns=["vec_id"])
        allowed |= set(t["vec_id"].to_pylist())
    assert set(got["vec_id"].tolist()) <= allowed
    # the query's own vector routes to its nearest centroid, which is
    # always probed first → the top hit is the query itself
    assert got["vec_id"].iloc[0] == 3
