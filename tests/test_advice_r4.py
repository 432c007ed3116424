"""Round-4 ADVICE.md regression tests:

1. hamming_near_dups warns when max_hamming >= bands (pigeonhole recall
   gap) — covered in tests/test_image_near_dup.py.
2. pmi_top_pairs uses the RAISING strict segment-pair guard instead of
   the LSH family's silent over-cap skip.
3. COVERAGE.md symbol paths corrected (doc-only).
4. sketch.histogram_quantiles returns an empty typed frame on
   empty/all-NaN input instead of IndexError.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def test_histogram_quantiles_empty_input(ray_session):
    from mvt_wrangler_ray.stages.sketch import histogram_quantiles

    ds = rd.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
    out = histogram_quantiles(ds, "v", 0.0, 100.0, num_bins=16)
    assert list(out.columns) == ["q", "target_rank", "bin", "est"]
    assert len(out) == 0


def test_histogram_quantiles_all_nan_input(ray_session):
    from mvt_wrangler_ray.stages.sketch import histogram_quantiles

    ds = rd.from_arrow(pa.table(
        {"v": pa.array([float("nan")] * 5, pa.float64())}))
    out = histogram_quantiles(ds, "v", 0.0, 100.0, num_bins=16)
    assert len(out) == 0


def test_histogram_quantiles_nonempty_still_works(ray_session):
    from mvt_wrangler_ray.stages.sketch import histogram_quantiles

    vals = np.arange(1000, dtype=np.float64)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.float64())}))
    out = histogram_quantiles(ds, "v", 0.0, 1000.0, num_bins=1000,
                              qs=(0.5,))
    assert len(out) == 1
    assert abs(float(out["est"].iloc[0]) - 500.0) <= 1.0


def test_pmi_over_cap_doc_raises(ray_session):
    """A doc with more distinct in-vocab tokens than group_cap must fail
    loudly (the SQL oracle has no cap, so a silent skip would diverge)."""
    from mvt_wrangler_ray.stages.retrieval import pmi_top_pairs

    # 40 distinct tokens, each appearing in >= min_df docs so all stay
    # in vocab; doc 0 holds all 40 > group_cap=30
    toks = [f"tok{i:02d}" for i in range(40)]
    docs = [" ".join(toks)] * 6
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(docs, pa.string())}))
    with pytest.raises(Exception, match="group_cap"):
        pmi_top_pairs(ds, k=5, min_df=2, min_pair=1,
                      group_cap=30).to_pandas()


def test_pmi_under_cap_unchanged(ray_session):
    """Regular input (all docs under the cap) still produces the PMI
    top-k — the strict guard is a no-op below the cap."""
    from mvt_wrangler_ray.stages.retrieval import pmi_top_pairs

    docs = ["alpha beta gamma"] * 5 + ["alpha beta"] * 3 + ["gamma delta"] * 4
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string())}))
    out = pmi_top_pairs(ds, k=10, min_df=2, min_pair=2,
                        group_cap=100).to_pandas()
    assert len(out) > 0
    assert {"tok_a", "tok_b", "n_pair", "pmi_nano"} <= set(out.columns)
    pairs = set(zip(out["tok_a"], out["tok_b"]))
    assert ("alpha", "beta") in pairs
