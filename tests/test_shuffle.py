"""Bucketed shuffle aggregates: hypothesis equivalence vs a pandas
groupby oracle, plus dedup clustering."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mvt_wrangler_ray.stages.shuffle import grouped_count, two_phase_aggregate


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 50), st.floats(-100, 100)),
                min_size=1, max_size=500),
       st.integers(2, 16))
def test_two_phase_matches_pandas(ray_session, rows, buckets):
    import ray.data as rd

    keys, vals = zip(*rows)
    t = pa.table({"k": pa.array(keys, pa.int64()),
                  "v": pa.array(vals, pa.float64())})
    got = two_phase_aggregate(
        rd.from_arrow(t).repartition(4),
        keys=["k"],
        partial_aggs=[("v", "sum"), ("v", "count")],
        partial_names=["vs", "vc"],
        final_aggs=[("vs", "sum"), ("vc", "sum")],
        final_names=["total", "n"],
        num_buckets=buckets,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    want = (pd.DataFrame({"k": keys, "v": vals}).groupby("k")
            .agg(total=("v", "sum"), n=("v", "count")).reset_index())
    assert (got["k"].to_numpy() == want["k"].to_numpy()).all()
    np.testing.assert_allclose(got["total"], want["total"], rtol=1e-12)
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()


def test_grouped_count_with_carry(ray_session):
    import ray.data as rd

    t = pa.table({"k": pa.array([1, 1, 2, 2, 2], pa.int64()),
                  "z": pa.array([5, 5, 7, 7, 7], pa.int64())})
    out = grouped_count(rd.from_arrow(t), ["k"], out="n", carry=["z"],
                        num_buckets=4).to_pandas().sort_values("k")
    assert out["n"].tolist() == [2, 3]
    assert out["z"].tolist() == [5, 7]


def test_cluster_pairs_union_find():
    from mvt_wrangler_ray.stages.dedup import cluster_pairs

    pairs = pd.DataFrame({"id_a": [1, 2, 10, 11, 2],
                          "id_b": [2, 3, 11, 12, 10]})
    out = cluster_pairs(pairs)
    by = dict(zip(out["doc_id"], out["cluster_id"]))
    # {1,2,3,10,11,12} all connected through 2-10 edge
    assert len(set(by.values())) == 1


def test_cluster_pairs_separate_components():
    from mvt_wrangler_ray.stages.dedup import cluster_pairs

    pairs = pd.DataFrame({"id_a": [1, 10], "id_b": [2, 11]})
    out = cluster_pairs(pairs)
    by = dict(zip(out["doc_id"], out["cluster_id"]))
    assert by[1] == by[2] == 1
    assert by[10] == by[11] == 10
    assert by[1] != by[10]


def test_label_propagation_round(ray_session):
    import ray.data as rd

    from mvt_wrangler_ray.stages.dedup import label_propagation_round

    edges = rd.from_arrow(pa.table({
        "id_a": pa.array([1, 2, 10], pa.int64()),
        "id_b": pa.array([2, 3, 11], pa.int64())}))
    labels = None
    for _ in range(3):
        labels = label_propagation_round(edges, labels)
    out = labels.to_pandas()
    by = dict(zip(out["node"], out["label"]))
    assert by[1] == by[2] == by[3] == 1
    assert by[10] == by[11] == 10


def test_pyramid_rollup_conserves_counts(ray_session):
    """Every rollup level must sum to the base level's total; parents
    aggregate exactly their 4 children."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from mvt_wrangler_ray.stages.tile_encode import rollup_pyramid_counts

    rng = np.random.default_rng(11)
    n = 300
    x = rng.integers(0, 1 << 10, n)
    y = rng.integers(0, 1 << 10, n)
    base = rd.from_arrow(pa.table({
        "z": pa.array(np.full(n, 10, np.int64)),
        "x": pa.array(x.astype(np.int64)),
        "y": pa.array(y.astype(np.int64)),
        "n": pa.array(rng.integers(1, 50, n).astype(np.int64)),
    }))
    out = rollup_pyramid_counts(base, 10, 7).to_pandas()
    totals = out.groupby("z")["n"].sum()
    assert set(totals.index) == {7, 8, 9, 10}
    assert totals.nunique() == 1  # conservation at every level
    lv9 = out[out.z == 9].set_index(["x", "y"])["n"]
    lv10 = out[out.z == 10]
    child_sum = lv10.assign(px=lv10.x // 2, py=lv10.y // 2).groupby(
        ["px", "py"])["n"].sum()
    assert dict(child_sum) == dict(lv9)
