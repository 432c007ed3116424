"""Triangle counting: degree-ordered wedge join vs brute force."""

from itertools import combinations

import numpy as np
import pyarrow as pa
import ray.data as rd

from mvt_wrangler_ray.stages.graph import cooccurrence_edges, triangle_counts


def _brute_tri_counts(edge_set):
    nodes = sorted({x for e in edge_set for x in e})
    cnt = {}
    for a, b, c in combinations(nodes, 3):
        if (a, b) in edge_set and (b, c) in edge_set and (a, c) in edge_set:
            for x in (a, b, c):
                cnt[x] = cnt.get(x, 0) + 1
    return cnt


def test_triangles_match_brute_force(ray_session):
    rng = np.random.default_rng(3)
    n = 40
    edges = sorted({(int(a), int(b)) for a, b in
                    rng.integers(0, n, (220, 2)) if a < b})
    ds = rd.from_arrow(pa.table({
        "id_a": pa.array([a for a, _ in edges], pa.int64()),
        "id_b": pa.array([b for _, b in edges], pa.int64())}))
    out = triangle_counts(ds).to_pandas().set_index("node")["n_tri"]
    brute = _brute_tri_counts(set(edges))
    assert dict(out) == brute
    # total triangle count: each triangle credited to exactly 3 nodes
    assert out.sum() % 3 == 0


def test_triangles_skewed_hub(ray_session):
    # star + one closing rim edge: hub degree 30, exactly 1 triangle;
    # degree ordering must not explode wedges from the hub
    edges = [(0, h) for h in range(1, 31)] + [(1, 2)]
    ds = rd.from_arrow(pa.table({
        "id_a": pa.array([a for a, _ in edges], pa.int64()),
        "id_b": pa.array([b for _, b in edges], pa.int64())}))
    out = triangle_counts(ds).to_pandas().set_index("node")["n_tri"]
    assert dict(out) == {0: 1, 1: 1, 2: 1}


def test_cooccurrence_edges_dedup(ray_session):
    # duplicate (group, item) rows and repeated items must not create
    # self-pairs or duplicate edges
    t = pa.table({"g": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
                  "i": pa.array([7, 7, 9, 9, 7, 5], pa.int64())})
    out = cooccurrence_edges(rd.from_arrow(t), "g", "i").to_pandas()
    got = sorted(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    assert got == [(5, 7), (5, 9), (7, 9)]


def test_triangles_cutover_equivalence(ray_session):
    # broadcast lanes (defaults) vs forced join lanes must be identical
    rng = np.random.default_rng(5)
    n = 60
    edges = sorted({(int(a), int(b)) for a, b in
                    rng.integers(0, n, (400, 2)) if a < b})
    t = pa.table({
        "id_a": pa.array([a for a, _ in edges], pa.int64()),
        "id_b": pa.array([b for _, b in edges], pa.int64())})
    fast = triangle_counts(rd.from_arrow(t)).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    slow = triangle_counts(rd.from_arrow(t), broadcast_nodes_limit=0,
                           broadcast_edges_limit=0).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert fast.equals(slow)
