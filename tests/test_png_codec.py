"""Real PNG codec (stdlib zlib, spec-built): round-trip, filter
coverage, validation, the non-trivial lossy PSNR >= 40 contract, and the
DecodeImageStage real-decode path over Ray."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from mvt_wrangler_ray.codecs.png import _SIGNATURE, decode_png, encode_png
from mvt_wrangler_ray.stages.image import DecodeImageStage, PngRecodeStage, phash64, psnr
from mvt_wrangler_ray.sources.images import fake_pixel_field, synth_real_png_images


def _rand(h, w, seed):
    return np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)


class TestRoundTrip:
    @pytest.mark.parametrize("shape", [(1, 1), (1, 64), (64, 1), (33, 47),
                                       (128, 128)])
    def test_random_exact(self, shape):
        px = _rand(*shape, seed=shape[0] * 1000 + shape[1])
        assert np.array_equal(decode_png(encode_png(px)), px)

    def test_gradient_and_constant(self):
        # gradients favor Sub/Up/Paeth; constants favor Up — exercises
        # the adaptive filter choice
        grad = np.add.outer(np.arange(60), np.arange(80)).astype(np.uint8)
        assert np.array_equal(decode_png(encode_png(grad)), grad)
        const = np.full((40, 40), 137, np.uint8)
        blob = encode_png(const)
        assert np.array_equal(decode_png(blob), const)
        # constant image compresses far below raw size — real compression
        assert len(blob) < const.size // 4

    def test_all_five_filters_decode(self):
        """Hand-build one PNG per filter type and check reconstruction
        against a scalar reference implementation."""
        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, (5, 9), dtype=np.uint8)
        for ftype in range(5):
            raw = bytearray()
            recon = np.zeros_like(px)
            for r in range(px.shape[0]):
                raw.append(ftype)
                for c in range(px.shape[1]):
                    left = int(recon[r, c - 1]) if c else 0
                    up = int(recon[r - 1, c]) if r else 0
                    ul = int(recon[r - 1, c - 1]) if r and c else 0
                    x = int(px[r, c])
                    if ftype == 0:
                        b = x
                    elif ftype == 1:
                        b = (x - left) & 0xFF
                    elif ftype == 2:
                        b = (x - up) & 0xFF
                    elif ftype == 3:
                        b = (x - ((left + up) >> 1)) & 0xFF
                    else:
                        p = left + up - ul
                        pa_, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                        pred = left if pa_ <= pb and pa_ <= pc else (
                            up if pb <= pc else ul)
                        b = (x - pred) & 0xFF
                    raw.append(b)
                    recon[r, c] = x
            ihdr = struct.pack(">IIBBBBB", px.shape[1], px.shape[0], 8, 0, 0, 0, 0)

            def chunk(tag, payload):
                return (struct.pack(">I", len(payload)) + tag + payload
                        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

            blob = (_SIGNATURE + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", zlib.compress(bytes(raw)))
                    + chunk(b"IEND", b""))
            assert np.array_equal(decode_png(blob), px), f"filter {ftype}"


class TestValidation:
    def test_bad_signature(self):
        with pytest.raises(ValueError, match="signature"):
            decode_png(b"NOTAPNG!" + b"\x00" * 40)

    def test_bad_crc(self):
        blob = bytearray(encode_png(np.zeros((4, 4), np.uint8)))
        blob[-5] ^= 0xFF  # corrupt IEND CRC
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(blob))

    def test_fake_payload_rejected(self):
        # the deterministic fake payload carries the magic but no chunks
        fake = _SIGNATURE + bytes(range(64))
        with pytest.raises(ValueError):
            decode_png(fake)


class TestLossyPsnr:
    def test_quantized_psnr_above_40_but_finite(self):
        px = _rand(96, 96, seed=3)
        q = 4
        lossy = np.clip(np.round(px.astype(np.float64) / q) * q, 0, 255
                        ).astype(np.uint8)
        rt = decode_png(encode_png(lossy))
        assert np.array_equal(rt, lossy)          # codec itself lossless
        val = psnr(px, rt)
        assert 40.0 <= val < np.inf               # NON-trivial >=40 dB
        coarse = np.clip(np.round(px.astype(np.float64) / 32) * 32, 0, 255
                         ).astype(np.uint8)
        assert psnr(px, coarse) < 40.0            # the bound can fail


@pytest.mark.usefixtures("ray_session")
class TestRealDecodePath:
    def test_decode_stage_real_png(self):
        import ray.data as rd

        t = synth_real_png_images(24)
        out = rd.from_arrow(t).map_batches(
            DecodeImageStage, batch_format="pyarrow", batch_size=8,
            concurrency=(1, 2)).to_pandas().sort_values("image_id")
        # stats must match the SOURCE pixel field — proving a genuine
        # decode through the PNG wire format, not the fake fallback
        from mvt_wrangler_ray.geo.geotag import fnv1a64_strings
        for _, row in out.iterrows():
            h64 = int(fnv1a64_strings([row["image_id"]])[0])
            field = fake_pixel_field(h64, int(row["w"]), int(row["h"]))
            assert row["px_mean"] == pytest.approx(field.mean(), abs=0)
            assert row["phash_recomputed"] == int(phash64(field))
            assert row["sniffed_fmt"] == "png"

    def test_recode_stage(self):
        import ray.data as rd

        t = synth_real_png_images(12)
        out = rd.from_arrow(t).map_batches(
            PngRecodeStage, fn_constructor_kwargs={"quant_step": 4},
            batch_format="pyarrow", batch_size=6,
            concurrency=(1, 2)).to_pandas()
        assert (out["psnr_db"] >= 40.0).all()
        assert np.isfinite(out["psnr_db"]).any()  # genuinely lossy rows
        blob = out["png_bytes"].iloc[0]
        assert decode_png(blob).ndim == 2          # output is real PNG

    def test_recode_lossless(self):
        import ray.data as rd

        t = synth_real_png_images(6)
        out = rd.from_arrow(t).map_batches(
            PngRecodeStage, batch_format="pyarrow",
            concurrency=(1, 1)).to_pandas()
        assert np.isinf(out["psnr_db"]).all()
