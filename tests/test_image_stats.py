"""ImageStatsStage: exact-integer moments + Sobel edge energy."""

import numpy as np
import pyarrow as pa

from mvt_wrangler_ray.sources.images import synth_images_table
from mvt_wrangler_ray.stages.image import (
    DecodeImageStage, ImageStatsStage, sobel_edge_energy)


def _brute_sobel(p: np.ndarray) -> int:
    h, w = p.shape
    p = p.astype(np.int64)
    tot = 0
    for r in range(1, h - 1):
        for c in range(1, w - 1):
            gx = ((p[r - 1, c + 1] + 2 * p[r, c + 1] + p[r + 1, c + 1])
                  - (p[r - 1, c - 1] + 2 * p[r, c - 1] + p[r + 1, c - 1]))
            gy = ((p[r + 1, c - 1] + 2 * p[r + 1, c] + p[r + 1, c + 1])
                  - (p[r - 1, c - 1] + 2 * p[r - 1, c] + p[r - 1, c + 1]))
            tot += abs(gx) + abs(gy)
    return tot


def test_sobel_matches_brute_force():
    rng = np.random.default_rng(7)
    for shape in [(8, 8), (13, 9), (32, 32)]:
        p = rng.integers(0, 256, shape, dtype=np.uint8)
        assert sobel_edge_energy(p) == _brute_sobel(p)
    assert sobel_edge_energy(np.zeros((2, 10), np.uint8)) == 0  # too thin


def test_stage_matches_direct_decode():
    t = synth_images_table(40).append_column(
        "doc_id", pa.array(np.arange(40, dtype=np.int64), pa.int64()))
    out = ImageStatsStage()(t)
    dec = DecodeImageStage(compute_phash=False)
    for i in range(40):
        px = dec._decode(t["bytes"][i].as_py(), int(t["w"][i].as_py()),
                         int(t["h"][i].as_py())).astype(np.int64)
        n = px.size
        m = px.sum() / n
        assert out["px_mean"][i].as_py() == m
        assert out["px_var"][i].as_py() == (px * px).sum() / n - m * m
        assert out["edge_energy"][i].as_py() == sobel_edge_energy(px)


def test_stage_batch_split_invariant():
    t = synth_images_table(30).append_column(
        "doc_id", pa.array(np.arange(30, dtype=np.int64), pa.int64()))
    st = ImageStatsStage()
    whole = st(t)
    parts = pa.concat_tables([st(t.slice(0, 11)), st(t.slice(11, 9)),
                              st(t.slice(20))])
    assert whole.equals(parts)
