"""Property-based guards (hypothesis) for the round-2 codecs and the
bucketed key semi/anti join — random inputs, exact invariants."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from mvt_wrangler_ray.codecs.dct import decode_ljpg, encode_ljpg
from mvt_wrangler_ray.sources.media import decode_fvid, encode_fvid
from mvt_wrangler_ray.stages.image import psnr


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 80), st.integers(1, 80), st.integers(1, 4),
       st.integers(0, 2**32 - 1))
def test_ljpg_roundtrip_psnr_any_shape(h, w, step, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w)).astype(np.uint8)
    back = decode_ljpg(encode_ljpg(img, step=step))
    assert back.shape == img.shape
    assert psnr(img, back) >= 40.0
    # quantizer bound in pixel space: orthonormal transform keeps the
    # worst-case per-pixel error modest; assert a loose hard cap too
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 8 * step


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 20), st.integers(1, 30), st.integers(1, 30),
       st.integers(0, 2**32 - 1), st.integers(0, 65535))
def test_fvid_roundtrip_any_shape(n, h, w, seed, fps):
    frames = np.random.default_rng(seed).integers(
        0, 256, (n, h, w)).astype(np.uint8)
    back, fps_out = decode_fvid(encode_fvid(frames, fps))
    assert fps_out == fps
    assert np.array_equal(back, frames)


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 64))
def test_bucketed_key_semi_join_matches_isin(ray_session, seed, nkeys):
    import ray.data as rd

    from mvt_wrangler_ray.stages.shuffle import bucketed_key_semi_join

    rng = np.random.default_rng(seed)
    left_keys = rng.integers(0, 40, 200).astype(np.int64)
    right_keys = rng.integers(0, 40, nkeys).astype(np.int64)
    left = rd.from_arrow(pa.table({
        "k": pa.array(left_keys, pa.int64()),
        "payload": pa.array(np.arange(200.0)),
    }))
    keys = rd.from_arrow(pa.table({"k": pa.array(right_keys, pa.int64())}))
    semi = bucketed_key_semi_join(left, keys, "k").to_pandas()
    anti = bucketed_key_semi_join(left, keys, "k", anti=True).to_pandas()
    mask = np.isin(left_keys, right_keys)
    assert sorted(semi["payload"]) == sorted(np.arange(200.0)[mask])
    assert sorted(anti["payload"]) == sorted(np.arange(200.0)[~mask])
    assert len(semi) + len(anti) == 200
