"""LJPG lossy transform codec: the PSNR >= 40 dB invariant exercised by
a REAL lossy codec — round trips must both lose information (not
bit-exact) and stay above the fidelity floor."""

import numpy as np
import pyarrow as pa
import pytest

from mvt_wrangler_ray.codecs.dct import (
    dct8_matrix,
    decode_ljpg,
    encode_ljpg,
)
from mvt_wrangler_ray.stages.image import LossyRecodeStage, psnr


def test_dct_matrix_orthonormal():
    D = dct8_matrix()
    assert np.allclose(D @ D.T, np.eye(8), atol=1e-12)


@pytest.mark.parametrize("shape", [(8, 8), (32, 32), (33, 47), (7, 5), (64, 129)])
def test_roundtrip_psnr_bound(shape):
    rng = np.random.default_rng(hash(shape) % (2**32))
    for img in (
        rng.integers(0, 256, shape).astype(np.uint8),        # noise
        np.fromfunction(lambda i, j: (i * 3 + j * 2) % 256,  # gradient
                        shape).astype(np.uint8),
        np.full(shape, 200, np.uint8),                       # flat
    ):
        blob = encode_ljpg(img, step=2)
        back = decode_ljpg(blob)
        assert back.shape == img.shape
        assert psnr(img, back) >= 40.0


def test_codec_is_genuinely_lossy():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (48, 48)).astype(np.uint8)
    back = decode_ljpg(encode_ljpg(img, step=4))
    p = psnr(img, back)
    assert not np.array_equal(back, img)    # information was lost ...
    assert np.isfinite(p) and p >= 40.0     # ... within the invariant
    # larger steps lose more
    p8 = psnr(img, decode_ljpg(encode_ljpg(img, step=8)))
    assert p8 < p


def test_decode_stage_reads_ljpg_transparently():
    from mvt_wrangler_ray.stages.image import DecodeImageStage

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (24, 40)).astype(np.uint8)
    blob = encode_ljpg(img, step=2)
    st = DecodeImageStage(compute_phash=False)
    px = st._decode(blob, 40, 24)
    assert np.array_equal(px, decode_ljpg(blob))
    assert psnr(img, px) >= 40.0


def test_bad_payloads_raise():
    img = np.zeros((8, 8), np.uint8)
    blob = encode_ljpg(img)
    with pytest.raises(ValueError):
        decode_ljpg(b"XXXX" + blob[4:])
    with pytest.raises(ValueError):
        decode_ljpg(blob[:-4])


def test_lossy_recode_stage(ray_session):
    import ray.data as rd

    from mvt_wrangler_ray.sources.images import synth_images_table

    t = synth_images_table(300)
    out = rd.from_arrow(t).map_batches(
        LossyRecodeStage, batch_format="pyarrow", batch_size=128,
        concurrency=2).to_pandas()
    assert len(out) == 300
    assert (out["psnr_db"] >= 40.0).all()            # the invariant
    # ... and it's not free: the overwhelming majority of round trips
    # genuinely lose information (an individual image CAN survive
    # quantization exactly, so per-row finiteness is not required)
    assert np.isfinite(out["psnr_db"]).mean() > 0.9
    # payloads decode back to the stage's measured fidelity
    row = out.iloc[0]
    px = decode_ljpg(row["ljpg_bytes"])
    assert px.shape == (row["h"], row["w"])
