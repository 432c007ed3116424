"""As-of and range joins (stages/joins.py) vs brute-force pandas
references on deterministic synthetic data."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events(n, n_users, seed):
    rng = np.random.default_rng(seed)
    return pa.table({
        "user_id": pa.array(rng.integers(0, n_users, n).astype(np.int64)),
        "ts": pa.array(rng.integers(0, 10_000, n).astype(np.int64)),
        "val": pa.array(rng.uniform(size=n)),
    })


@pytest.mark.usefixtures("ray_session")
class TestAsofJoin:
    def test_matches_brute_force(self):
        import ray.data as rd

        from mvt_wrangler_ray.stages.joins import asof_join_bucketed

        left = _events(800, 40, 1)
        right = _events(300, 40, 2).select(["user_id", "ts"])
        out = asof_join_bucketed(
            rd.from_arrow(left), rd.from_arrow(right),
            by="user_id", on="ts", right_cols=("ts",),
            num_buckets=8).to_pandas()
        assert len(out) == len(left)

        ldf, rdf = left.to_pandas(), right.to_pandas()
        exp = []
        for _, row in ldf.iterrows():
            cand = rdf[(rdf.user_id == row.user_id) & (rdf.ts <= row.ts)]
            exp.append(cand.ts.max() if len(cand) else None)
        ldf["ts_asof"] = exp
        got = out.sort_values(["user_id", "ts", "val"]).reset_index(drop=True)
        want = ldf.sort_values(["user_id", "ts", "val"]).reset_index(drop=True)
        assert got["ts_asof"].astype("float64").equals(
            want["ts_asof"].astype("float64"))
        assert got["val"].equals(want["val"])

    def test_no_preceding_rows_are_null(self):
        import ray.data as rd

        from mvt_wrangler_ray.stages.joins import asof_join_bucketed

        left = pa.table({"user_id": pa.array([1, 2], pa.int64()),
                         "ts": pa.array([5, 5], pa.int64())})
        right = pa.table({"user_id": pa.array([1], pa.int64()),
                          "ts": pa.array([9], pa.int64())})  # after left.ts
        out = asof_join_bucketed(rd.from_arrow(left), rd.from_arrow(right),
                                 by="user_id", on="ts").to_pandas()
        assert out["ts_asof"].isna().all()

    def test_equal_timestamp_included(self):
        import ray.data as rd

        from mvt_wrangler_ray.stages.joins import asof_join_bucketed

        left = pa.table({"user_id": pa.array([1], pa.int64()),
                         "ts": pa.array([5], pa.int64())})
        right = pa.table({"user_id": pa.array([1], pa.int64()),
                          "ts": pa.array([5], pa.int64())})
        out = asof_join_bucketed(rd.from_arrow(left), rd.from_arrow(right),
                                 by="user_id", on="ts").to_pandas()
        assert out["ts_asof"].tolist() == [5]  # backward as-of is <=


@pytest.mark.usefixtures("ray_session")
class TestRangeJoin:
    def test_matches_brute_force(self):
        import ray.data as rd

        from mvt_wrangler_ray.stages.joins import range_join_bucketed

        rng = np.random.default_rng(3)
        pts = pa.table({
            "pid": pa.array(np.arange(500, dtype=np.int64)),
            "t": pa.array(rng.integers(0, 100_000, 500).astype(np.int64)),
        })
        lo = rng.integers(0, 95_000, 40).astype(np.int64)
        ranges = pa.table({
            "range_id": pa.array(np.arange(40, dtype=np.int64)),
            "lo": pa.array(lo),
            "hi": pa.array(lo + rng.integers(1_000, 20_000, 40)),
        })
        out = range_join_bucketed(
            rd.from_arrow(pts), rd.from_arrow(ranges), on="t",
            lo_col="lo", hi_col="hi", range_cols=("range_id",),
            bucket_span=10_000).to_pandas()

        pdf, rdf = pts.to_pandas(), ranges.to_pandas()
        exp = pdf.merge(rdf, how="cross")
        exp = exp[(exp.t >= exp.lo) & (exp.t < exp.hi)][["pid", "range_id"]]
        got = set(map(tuple, out[["pid", "range_id"]].to_numpy()))
        want = set(map(tuple, exp.to_numpy()))
        assert got == want

    def test_hot_bucket_overlapping_intervals(self):
        """1.5k long overlapping intervals in ONE time bucket: the old
        dense points×intervals matrix was quadratic here; the stab sweep
        must produce identical pairs in bounded chunks."""
        import ray.data as rd

        from mvt_wrangler_ray.stages.joins import range_join_bucketed

        rng = np.random.default_rng(9)
        n_r = 1_500
        lo = rng.integers(0, 500, n_r).astype(np.int64)
        hi = lo + rng.integers(400, 9_000, n_r)   # long + overlapping
        pts = pa.table({
            "pid": pa.array(np.arange(300, dtype=np.int64)),
            "t": pa.array(rng.integers(0, 9_500, 300).astype(np.int64)),
        })
        ranges = pa.table({
            "range_id": pa.array(np.arange(n_r, dtype=np.int64)),
            "lo": pa.array(lo), "hi": pa.array(hi),
        })
        out = range_join_bucketed(
            rd.from_arrow(pts), rd.from_arrow(ranges), on="t",
            lo_col="lo", hi_col="hi", bucket_span=10_000).to_pandas()
        exp = pts.to_pandas().merge(ranges.to_pandas(), how="cross")
        exp = exp[(exp.t >= exp.lo) & (exp.t < exp.hi)][["pid", "range_id"]]
        assert set(map(tuple, out[["pid", "range_id"]].to_numpy())) == \
            set(map(tuple, exp.to_numpy()))

    def test_stab_pairs_chunked_matches_dense(self):
        """_stab_pairs with a tiny candidate budget (forcing many chunks)
        equals the dense reference, including dead-interval-heavy input."""
        from mvt_wrangler_ray.stages.joins import _stab_pairs

        rng = np.random.default_rng(17)
        t = rng.integers(0, 1_000, 400).astype(np.int64)
        lo = rng.integers(0, 1_000, 250).astype(np.int64)
        hi = lo + rng.integers(1, 80, 250)        # mostly-dead prefixes
        pi, ri = _stab_pairs(t, lo, hi, cand_budget=64)
        hit = (t[:, None] >= lo[None, :]) & (t[:, None] < hi[None, :])
        epi, eri = np.nonzero(hit)
        assert set(zip(pi.tolist(), ri.tolist())) == \
            set(zip(epi.tolist(), eri.tolist()))

    def test_half_open_boundaries(self):
        import ray.data as rd

        from mvt_wrangler_ray.stages.joins import range_join_bucketed

        pts = pa.table({"pid": pa.array([0, 1], pa.int64()),
                        "t": pa.array([10, 20], pa.int64())})
        ranges = pa.table({"range_id": pa.array([7], pa.int64()),
                           "lo": pa.array([10], pa.int64()),
                           "hi": pa.array([20], pa.int64())})
        out = range_join_bucketed(rd.from_arrow(pts), rd.from_arrow(ranges),
                                  on="t", lo_col="lo", hi_col="hi",
                                  bucket_span=8).to_pandas()
        assert out["pid"].tolist() == [0]  # lo inclusive, hi exclusive
