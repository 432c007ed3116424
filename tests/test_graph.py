"""stages/graph.py — PageRank: brute-force equality on random graphs,
broadcast↔bucketed-join plan equivalence, mass conservation."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from mvt_wrangler_ray.stages.graph import SCALE, pagerank


def _edges(seed=5, n_nodes=60, n_edges=500):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    s = np.concatenate([src, dst]).astype(np.int64)
    d = np.concatenate([dst, src]).astype(np.int64)
    return s, d


def _brute(s, d, iters=5):
    nodes = np.unique(s)
    outdeg = {int(u): 0 for u in nodes}
    for u in s:
        outdeg[int(u)] += 1
    n = len(nodes)
    r = {int(u): SCALE // n for u in nodes}
    base = (SCALE * 15) // (100 * n)
    for _ in range(iters):
        acc = {int(u): 0 for u in nodes}
        for u, v in zip(s, d):
            acc[int(v)] += (r[int(u)] * 85) // (100 * outdeg[int(u)])
        r = {u: base + acc[u] for u in acc}
    return r


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_pagerank_matches_brute_force(limit, ray_session):
    s, d = _edges()
    ds = ray.data.from_pandas(
        pd.DataFrame({"src": s, "dst": d})).repartition(4)
    got = pagerank(ds, broadcast_nodes_limit=limit).to_pandas()
    want = _brute(s, d)
    assert len(got) == len(want)
    for _, row in got.iterrows():
        assert int(row["rank_int"]) == want[int(row["node"])]
        assert row["rank"] == int(row["rank_int"]) / 1.0e12


def test_pagerank_mass_approximately_conserved(ray_session):
    # fixed-point floors only ever LOSE mass: total stays in
    # (SCALE - n_nodes*iters*2, SCALE]
    s, d = _edges(seed=11, n_nodes=40, n_edges=300)
    ds = ray.data.from_pandas(pd.DataFrame({"src": s, "dst": d}))
    got = pagerank(ds).to_pandas()
    total = int(got["rank_int"].sum())
    n = len(got)
    assert total <= SCALE
    assert total > SCALE - n * 6 * (2 + len(s) // n)


def test_pagerank_star_graph_ranks_center_highest(ray_session):
    # hub 0 connected to leaves 1..20 both ways
    leaves = np.arange(1, 21, dtype=np.int64)
    s = np.concatenate([np.zeros(20, np.int64), leaves])
    d = np.concatenate([leaves, np.zeros(20, np.int64)])
    got = pagerank(ray.data.from_pandas(
        pd.DataFrame({"src": s, "dst": d}))).to_pandas()
    center = got.loc[got["node"] == 0, "rank"].iloc[0]
    leaf_ranks = got.loc[got["node"] != 0, "rank"]
    assert center > leaf_ranks.max() * 5
    assert leaf_ranks.nunique() == 1


class TestKmeansQuantized:
    def _brute(self, vecs, ids, k=4, iters=3, bits=20):
        q = np.floor(vecs.astype(np.float64) * (1 << bits)).astype(np.int64)
        order = np.argsort(ids)
        cids = ids[order][:k]
        cents = q[order][:k].copy()
        for it in range(iters + 1):
            d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            a = cids[np.argmin(d, axis=1)]
            if it == iters:
                return dict(zip(ids.tolist(), a.tolist()))
            uniq = np.unique(a)
            new_c = []
            for c in uniq:
                s = q[a == c].sum(axis=0)
                n = (a == c).sum()
                new_c.append(np.sign(s) * (np.abs(s) // n))
            cids, cents = uniq, np.stack(new_c)

    def test_matches_brute_force(self, ray_session):
        import pandas as pd
        import ray.data

        from mvt_wrangler_ray.stages.cluster import kmeans_quantized
        rng = np.random.default_rng(9)
        vecs = rng.normal(size=(120, 8)).astype(np.float32)
        ids = np.arange(120, dtype=np.int64)
        ds = ray.data.from_pandas(pd.DataFrame(
            {"vec_id": ids, "embedding": list(vecs)})).repartition(4)
        got = kmeans_quantized(ds, k=4, iterations=3,
                               scale_bits=20).to_pandas()
        want = self._brute(vecs, ids)
        assert len(got) == 120
        for _, r in got.iterrows():
            assert int(r["cluster"]) == want[int(r["vec_id"])]

    def test_clusters_separate_well_separated_data(self, ray_session):
        import pandas as pd
        import ray.data

        from mvt_wrangler_ray.stages.cluster import kmeans_quantized
        rng = np.random.default_rng(2)
        a = rng.normal(0.0, 0.01, size=(40, 4))
        b = rng.normal(5.0, 0.01, size=(40, 4))
        vecs = np.concatenate([a, b]).astype(np.float32)
        ids = np.arange(80, dtype=np.int64)
        ds = ray.data.from_pandas(pd.DataFrame(
            {"vec_id": ids, "embedding": list(vecs)}))
        got = kmeans_quantized(ds, k=2, iterations=3).to_pandas()
        got = got.sort_values("vec_id")
        first = got["cluster"].to_numpy()[:40]
        second = got["cluster"].to_numpy()[40:]
        assert len(set(first)) == 1 and len(set(second)) == 1
        assert first[0] != second[0]


class TestSemanticDedup:
    def _brute(self, vecs, ids, k=2, iters=3, t=0.9, bits=20):
        km = TestKmeansQuantized()
        lab = km._brute(vecs, ids, k=k, iters=iters, bits=bits)
        q = np.floor(vecs.astype(np.float64) * (1 << bits)).astype(np.int64)
        idx = {int(v): i for i, v in enumerate(ids)}
        t2 = t * t
        dropped = set()
        for b in sorted(idx):
            for a in sorted(idx):
                if a >= b or lab[a] != lab[b]:
                    continue
                qa, qb = q[idx[a]], q[idx[b]]
                dot = int(qa @ qb)
                na, nb = float(qa @ qa), float(qb @ qb)
                if dot > 0 and float(dot) * float(dot) >= t2 * (na * nb):
                    dropped.add(b)
                    break
        return sorted(set(idx) - dropped)

    def test_matches_brute_force(self, ray_session):
        import pandas as pd
        import ray.data

        from mvt_wrangler_ray.stages.cluster import semantic_dedup
        rng = np.random.default_rng(4)
        base = rng.normal(size=(30, 6)).astype(np.float32)
        # plant near-dups: rows 30..44 are tiny perturbations of 0..14
        dups = (base[:15] + rng.normal(0, 1e-3, (15, 6))).astype(np.float32)
        vecs = np.concatenate([base, dups])
        ids = np.arange(45, dtype=np.int64)
        ds = ray.data.from_pandas(pd.DataFrame(
            {"vec_id": ids, "embedding": list(vecs)})).repartition(3)
        got = sorted(semantic_dedup(ds, k=2, iterations=3, threshold=0.9)
                     .to_pandas()["vec_id"])
        want = self._brute(vecs, ids)
        assert got == want
        assert len(got) < 45  # the planted dups actually dropped

    @pytest.mark.parametrize("chunk_entries", [1 << 22, 997, 1])
    def test_chunked_pair_scan_equals_direct(self, chunk_entries,
                                             ray_session):
        # chunk_entries=997/1 force multi-chunk row scans (rows per
        # chunk = chunk_entries // m), exercising the s0 > 0 global-
        # offset mask arithmetic; all sizes must agree with brute force
        import pandas as pd
        import ray.data

        from mvt_wrangler_ray.stages.cluster import semantic_dedup
        rng = np.random.default_rng(6)
        vecs = rng.normal(size=(400, 5)).astype(np.float32)
        vecs[200:] = vecs[:200] * 1.0001  # scaled copies: cosine == 1
        ids = np.arange(400, dtype=np.int64)
        ds = ray.data.from_pandas(pd.DataFrame(
            {"vec_id": ids, "embedding": list(vecs)}))
        got = sorted(semantic_dedup(ds, k=1, iterations=1, threshold=0.999,
                                    pair_chunk_entries=chunk_entries)
                     .to_pandas()["vec_id"])
        want = self._brute(vecs, ids, k=1, iters=1, t=0.999)
        assert got == want
        assert len(got) <= 210  # every scaled copy dropped

    def test_nonzero_based_ids_seed_k_smallest(self, ray_session):
        # ids 1000..1079: the seed must be the k SMALLEST ids, not
        # `id < k` (which matches nothing here)
        import pandas as pd
        import ray.data

        from mvt_wrangler_ray.stages.cluster import kmeans_quantized
        rng = np.random.default_rng(8)
        vecs = rng.normal(size=(80, 4)).astype(np.float32)
        ids = np.arange(1000, 1080, dtype=np.int64)
        ds = ray.data.from_pandas(pd.DataFrame(
            {"vec_id": ids, "embedding": list(vecs)})).repartition(4)
        got = kmeans_quantized(ds, k=3, iterations=2).to_pandas()
        assert len(got) == 80
        assert set(got["cluster"]).issubset(set(ids.tolist()))

    def test_cluster_cap_overcap_identical_collapse(self, ray_session):
        # the crawl-skew worst case: one mega-cluster of IDENTICAL
        # vectors over the cap. The old policy passed it through
        # undeduped; the drop-safe policy's representative pre-pass
        # must collapse it to the single min-id row.
        import pandas as pd
        import ray.data

        from mvt_wrangler_ray.stages.cluster import semantic_dedup
        vecs = np.ones((30, 3), dtype=np.float32)
        ids = np.arange(30, dtype=np.int64)
        ds = ray.data.from_pandas(pd.DataFrame(
            {"vec_id": ids, "embedding": list(vecs)}))
        out = semantic_dedup(ds, k=1, iterations=1, threshold=0.5,
                             cluster_cap=10).to_pandas()
        assert sorted(out["vec_id"]) == [0]

    def test_cluster_cap_overcap_planted_megacluster(self, ray_session):
        # forced over-cap with REAL near-dups: 60 random base vectors,
        # each with 4 planted near-copies (300 rows, k=1 → one cluster
        # of 300 > cap=40). Exact dedup keeps one row per blob; the
        # recursive-split lane must still drop (almost) all of the 240
        # planted copies instead of passing 300 rows through.
        import pandas as pd
        import ray.data

        from mvt_wrangler_ray.stages.cluster import semantic_dedup
        rng = np.random.default_rng(11)
        base = rng.normal(size=(60, 8)).astype(np.float32)
        blobs = [base + rng.normal(0, 1e-4, base.shape).astype(np.float32)
                 for _ in range(5)]
        vecs = np.concatenate(blobs).astype(np.float32)
        ids = np.arange(300, dtype=np.int64)
        ds = ray.data.from_pandas(pd.DataFrame(
            {"vec_id": ids, "embedding": list(vecs)})).repartition(4)
        got = sorted(semantic_dedup(ds, k=1, iterations=1, threshold=0.99,
                                    cluster_cap=40).to_pandas()["vec_id"])
        want = self._brute(vecs, ids, k=1, iters=1, t=0.99)
        # drop-safety: the planted dups actually drop (exact keeps ~60;
        # allow slack for blobs straddling a split boundary) and nothing
        # the exact rule keeps is lost spuriously in the identical-
        # vector sense (survivors are a superset of nothing — just
        # bounded)
        assert len(got) <= len(want) + 15
        assert len(got) < 120          # undeduped pass-through was 300
        assert got[0] == 0             # the global min id always survives

    def test_cluster_cap_depth_zero_equals_exact(self, ray_session):
        # split_depth=0 forces the over-cap path straight to the exact
        # chunked pair loop — bit-identical to the cap=None result
        import pandas as pd
        import ray.data

        from mvt_wrangler_ray.stages.cluster import semantic_dedup
        rng = np.random.default_rng(12)
        vecs = rng.normal(size=(120, 5)).astype(np.float32)
        vecs[60:] = vecs[:60] * 1.0001
        ids = np.arange(120, dtype=np.int64)
        ds = ray.data.from_pandas(pd.DataFrame(
            {"vec_id": ids, "embedding": list(vecs)}))
        # (the depth-exhausted warning fires inside the map_groups
        # worker, so it is not observable via pytest.warns here)
        capped = sorted(
            semantic_dedup(ds, k=1, iterations=1, threshold=0.999,
                           cluster_cap=10, split_depth=0)
            .to_pandas()["vec_id"])
        exact = sorted(semantic_dedup(ds, k=1, iterations=1,
                                      threshold=0.999, cluster_cap=None)
                       .to_pandas()["vec_id"])
        assert capped == exact
