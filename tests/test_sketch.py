"""HLL sketches and Bloom filters."""

import numpy as np
import pyarrow as pa
import pytest

from mvt_wrangler_ray.stages.sketch import HLL, BloomFilter, approx_distinct, bloom_semi_join
from mvt_wrangler_ray.stages.shuffle import _splitmix


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(3)
    a = _splitmix(rng.integers(0, 2**62, 60_000).astype(np.uint64))
    b = _splitmix(rng.integers(0, 2**62, 60_000).astype(np.uint64) + np.uint64(2**62))
    h1, h2 = HLL(12), HLL(12)
    h1.add_hashes(a)
    h2.add_hashes(b)
    merged = h1.merge(h2)
    exact = len(np.unique(np.concatenate([a, b])))
    est = merged.estimate()
    assert abs(est - exact) / exact < 0.05
    # serialization round trip
    again = HLL.from_bytes(merged.to_bytes())
    assert again.estimate() == est
    # merge is commutative
    assert (h2.merge(h1).reg == merged.reg).all()


def test_hll_small_range():
    h = HLL(12)
    h.add_hashes(_splitmix(np.arange(100, dtype=np.uint64)))
    assert abs(h.estimate() - 100) < 10


def test_approx_distinct_dataset(ray_session):
    import ray.data as rd

    n = 50_000
    vals = np.concatenate([np.arange(n // 2), np.arange(n // 2)])  # half dups
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())})).repartition(8)
    est = approx_distinct(ds, "v")
    assert abs(est - n // 2) / (n // 2) < 0.05


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(5)
    members = rng.integers(0, 2**60, 20_000)
    bf = BloomFilter.build(members, nbits=1 << 19)
    assert bf.contains_hashes(_splitmix(members.astype(np.uint64))).all()
    others = rng.integers(2**60, 2**61, 20_000)
    fp = bf.contains_hashes(_splitmix(others.astype(np.uint64))).mean()
    assert fp < 0.05


def test_bloom_semi_join(ray_session):
    import ray

    import ray.data as rd

    keys = list(range(0, 1000, 2))     # even ids are members
    bf = BloomFilter.build(keys, nbits=1 << 16)
    ref = ray.put(bf)
    t = pa.table({"k": pa.array(np.arange(1000), pa.int64())})
    kept = bloom_semi_join(rd.from_arrow(t), "k", ref).to_pandas()["k"].to_numpy()
    # no false negatives: every even id survives
    assert set(keys) <= set(kept.tolist())
    # false positives bounded
    odd_kept = [k for k in kept if k % 2 == 1]
    assert len(odd_kept) < 50


# ---- Count-Min sketch -------------------------------------------------


def test_countmin_overestimates_only_and_bound():
    import numpy as np

    from mvt_wrangler_ray.geo.geotag import fnv1a64_strings
    from mvt_wrangler_ray.stages.shuffle import _splitmix
    from mvt_wrangler_ray.stages.sketch import CountMin

    rng = np.random.default_rng(3)
    # zipf-ish stream over 500 keys
    keys = np.array([f"k{i}" for i in range(500)], dtype=object)
    freqs = (2000 / (np.arange(500) + 1)).astype(int) + 1
    stream = np.repeat(keys, freqs)
    h = _splitmix(fnv1a64_strings(stream))
    cm = CountMin(w=1 << 12, d=4)
    cm.add_hashes(h)
    uh = _splitmix(fnv1a64_strings(keys))
    est = cm.estimate_hashes(uh)
    assert (est >= freqs).all()                    # never undercounts
    n = int(freqs.sum())
    slack = 2 * np.e * n / (1 << 12)               # loose CM bound
    assert (est - freqs <= slack).all()


def test_countmin_merge_law():
    import numpy as np

    from mvt_wrangler_ray.stages.sketch import CountMin

    rng = np.random.default_rng(11)
    h1 = rng.integers(0, 2**63, 4000).astype(np.uint64)
    h2 = rng.integers(0, 2**63, 4000).astype(np.uint64)
    a, b, whole = CountMin(1 << 10, 3), CountMin(1 << 10, 3), CountMin(1 << 10, 3)
    a.add_hashes(h1); b.add_hashes(h2)
    whole.add_hashes(np.concatenate([h1, h2]))
    merged = a.merge(b)
    assert np.array_equal(merged.table, whole.table)   # exact merge law
    back = CountMin.from_bytes(merged.to_bytes())
    assert np.array_equal(back.table, merged.table)
    assert (back.w, back.d) == (merged.w, merged.d)


def test_approx_counts_dataset(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from mvt_wrangler_ray.stages.sketch import approx_counts

    vals = ["hot"] * 5000 + ["warm"] * 500 + [f"cold{i}" for i in range(2000)]
    rng = np.random.default_rng(5)
    order = rng.permutation(len(vals))
    t = pa.table({"k": pa.array([vals[i] for i in order], pa.string())})
    est = approx_counts(rd.from_arrow(t), "k", ["hot", "warm", "absent"])
    assert est["hot"] >= 5000 and est["hot"] <= 5000 + 40
    assert est["warm"] >= 500 and est["warm"] <= 540
    assert est["absent"] <= 40                      # collision-bounded
