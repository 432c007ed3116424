"""From-scratch LOSSY image codec ("LJPG"): 8×8 block DCT-II +
uniform quantization + zlib-packed int16 coefficients.

Why it exists: BASELINE.json's per-row invariant demands decoded-pixel
PSNR ≥ 40 dB *for lossy formats*, and no real lossy codec library (PIL,
libjpeg, cv2) exists in this container. This module is a genuine lossy
transform codec built from public DSP (the type-II DCT basis used by
JPEG, without entropy coding): round-trips are NOT bit-exact, yet the
quantization step bounds per-coefficient error to step/2, and because
the DCT matrix is orthonormal the spatial-domain RMS error has the same
bound — so PSNR stays provably above 40 dB at the default step. That
makes the PSNR invariant a real test of a real codec path rather than a
tautology over bit-identical fakes.

Format (little-endian):
    0:4   b"LJPG"
    4:6   h (uint16)       original height
    6:8   w (uint16)       original width
    8:9   step (uint8)     uniform quantizer step
    9:    zlib(int16 LE coefficients, padded-block raster order)

Everything is whole-image vectorized (one einsum over all blocks);
no per-pixel Python.
"""

from __future__ import annotations

import zlib

import numpy as np

LJPG_MAGIC = b"LJPG"


def dct8_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II basis matrix D (D @ D.T = I)."""
    k = np.arange(8)
    D = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    D[0] *= np.sqrt(1 / 8)
    D[1:] *= np.sqrt(2 / 8)
    return D


_D = dct8_matrix()


def _to_blocks(px: np.ndarray):
    """Pad to 8-multiples (edge-replicate) and reshape to (hb, wb, 8, 8)."""
    h, w = px.shape
    ph, pw = (-h) % 8, (-w) % 8
    padded = np.pad(px.astype(np.float64), ((0, ph), (0, pw)), mode="edge")
    hb, wb = padded.shape[0] // 8, padded.shape[1] // 8
    return (padded.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3), hb, wb)


def encode_ljpg(pixels: np.ndarray, step: int = 2) -> bytes:
    """Gray8 (h, w) → LJPG bytes. step >= 1; larger = lossier."""
    assert pixels.ndim == 2 and 1 <= step <= 255
    h, w = pixels.shape
    blocks, hb, wb = _to_blocks(pixels)
    coeff = np.einsum("ij,abjk,lk->abil", _D, blocks - 128.0, _D)
    q = np.round(coeff / step).astype(np.int16)
    head = (LJPG_MAGIC + int(h).to_bytes(2, "little")
            + int(w).to_bytes(2, "little") + int(step).to_bytes(1, "little"))
    return head + zlib.compress(q.tobytes(), 6)


def decode_ljpg(data: bytes) -> np.ndarray:
    """LJPG bytes → gray8 (h, w). Raises ValueError on bad payloads."""
    if data[:4] != LJPG_MAGIC:
        raise ValueError("not an LJPG payload")
    if len(data) < 9:
        raise ValueError("truncated LJPG header")
    h = int.from_bytes(data[4:6], "little")
    w = int.from_bytes(data[6:8], "little")
    step = data[8]
    hb, wb = (h + 7) // 8, (w + 7) // 8
    try:
        body = zlib.decompress(data[9:])
    except zlib.error as e:
        raise ValueError(f"corrupt LJPG body: {e}") from e
    q = np.frombuffer(body, dtype=np.int16)
    if len(q) != hb * wb * 64:
        raise ValueError("truncated LJPG payload")
    coeff = q.reshape(hb, wb, 8, 8).astype(np.float64) * step
    blocks = np.einsum("ji,abjk,kl->abil", _D, coeff, _D) + 128.0
    full = blocks.transpose(0, 2, 1, 3).reshape(hb * 8, wb * 8)
    return np.clip(np.round(full), 0, 255).astype(np.uint8)[:h, :w]
