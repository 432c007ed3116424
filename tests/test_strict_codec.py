"""Strict codec mode (round-3 verdict item 6): with strict=True (or
MVT_STRICT_CODECS=1), payloads that would silently fall back to the
deterministic fake decode raise NotImplementedError instead — a user
pointing the engine at real JPEG/WebP data without PIL cannot get
plausible-but-wrong pixels."""

import numpy as np
import pytest

from mvt_wrangler_ray.codecs.png import encode_png
from mvt_wrangler_ray.stages.image import DecodeImageStage

JPEG_PAYLOAD = b"\xff\xd8\xff\xe0" + bytes(range(64))
WEBP_PAYLOAD = b"RIFF" + b"\x00" * 8 + bytes(range(64))
FAKE_PNG = b"\x89PNG\r\n\x1a\n" + bytes(range(64))  # magic, no chunks


def test_default_mode_fake_decodes():
    st = DecodeImageStage()
    assert st.strict is False
    px = st._decode(JPEG_PAYLOAD, 16, 16)
    assert px.shape == (16, 16)
    assert st._decode(FAKE_PNG, 8, 8).shape == (8, 8)


@pytest.mark.parametrize("payload,fmt", [
    (JPEG_PAYLOAD, "jpeg"), (WEBP_PAYLOAD, "webp"), (FAKE_PNG, "png")])
def test_strict_mode_refuses_fake(payload, fmt):
    st = DecodeImageStage(strict=True)
    with pytest.raises(NotImplementedError, match="strict codec mode"):
        st._decode(payload, 16, 16)


def test_strict_mode_real_png_still_decodes():
    pixels = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 256
    payload = encode_png(pixels)
    st = DecodeImageStage(strict=True)
    out = st._decode(payload, 8, 8)
    assert np.array_equal(out, pixels)


def test_strict_mode_real_ljpg_still_decodes():
    from mvt_wrangler_ray.codecs.dct import encode_ljpg

    pixels = ((np.arange(256, dtype=np.int64).reshape(16, 16) * 7) % 256
              ).astype(np.uint8)
    payload = encode_ljpg(pixels)
    st = DecodeImageStage(strict=True)
    out = st._decode(payload, 16, 16)
    assert out.shape == (16, 16)


def test_env_var_enables_strict(monkeypatch):
    monkeypatch.setenv("MVT_STRICT_CODECS", "1")
    assert DecodeImageStage().strict is True
    monkeypatch.setenv("MVT_STRICT_CODECS", "0")
    assert DecodeImageStage().strict is False
    monkeypatch.delenv("MVT_STRICT_CODECS")
    assert DecodeImageStage().strict is False
