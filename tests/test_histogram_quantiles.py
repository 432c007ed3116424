"""Mergeable histogram quantiles: accuracy bound + block invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from mvt_wrangler_ray.stages.sketch import histogram_quantiles


def test_within_one_bin_width_of_exact(ray_session):
    rng = np.random.default_rng(11)
    x = rng.uniform(0.0, 1000.0, 20_000)
    ds = rd.from_arrow(pa.table({"v": pa.array(x, pa.float64())}))
    out = histogram_quantiles(ds, "v", 0.0, 1000.0, num_bins=512)
    width = 1000.0 / 512
    for _, row in out.iterrows():
        exact = np.quantile(x, row["q"])
        assert abs(row["est"] - exact) <= 2 * width, (row["q"], row["est"], exact)


def test_block_split_invariant(ray_session):
    rng = np.random.default_rng(5)
    x = rng.normal(500.0, 100.0, 10_000)
    t = pa.table({"v": pa.array(x, pa.float64())})
    one = histogram_quantiles(rd.from_arrow(t), "v", 0.0, 1000.0)
    many = histogram_quantiles(
        rd.from_arrow(t).repartition(13), "v", 0.0, 1000.0)
    assert one.equals(many)  # partial bincounts merge associatively


def test_out_of_range_and_nan_clamped(ray_session):
    x = np.array([-100.0, 0.0, 5.0, np.nan, 2000.0])
    ds = rd.from_arrow(pa.table({"v": pa.array(x, pa.float64())}))
    out = histogram_quantiles(ds, "v", 0.0, 10.0, num_bins=10, qs=(0.5,))
    # 4 non-nan values; median target rank 2 → second value (0.0 or 5.0 bin)
    assert len(out) == 1
    assert out["target_rank"].iloc[0] == 2
    assert 0.0 <= out["est"].iloc[0] <= 10.0
