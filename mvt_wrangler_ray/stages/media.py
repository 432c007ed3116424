"""Audio / video processing stages (actor-pool map_batches callables).

Real work, not stubs: int16 PCM parsing + RMS / zero-crossing / peak DSP
for audio, FVID container parsing + frame sampling + PNG re-encode for
video (sources/media.py documents the formats). Externally-encoded
formats (wav/mp3/mp4/...) would need codec libraries that do not exist
in this container; ``sniff_media`` gates on their magics and raises the
documented NotImplementedError rather than silently mis-parsing.

Scale shape: stages are callable CLASSES for map_batches actor pools —
any future model/codec state loads once per actor in __init__; per-batch
work is numpy over whole payload matrices where the format allows. Frame
sampling is a flat_map-style expansion (one input row → k frame rows),
kept inside a single map_batches so the output block structure stays
under the streaming executor's control.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.media import decode_fvid

_KNOWN_CODEC_MAGICS = {
    b"RIFF": "wav/avi (RIFF)",
    b"ID3": "mp3",
    b"\xff\xfb": "mp3",
    b"OggS": "ogg",
    b"fLaC": "flac",
    b"\x00\x00\x00\x18ftyp": "mp4",
    b"\x00\x00\x00\x20ftyp": "mp4",
    b"\x1aE\xdf\xa3": "mkv/webm",
}


def sniff_media(payload: bytes) -> str | None:
    """Return the name of a KNOWN-but-unsupported codec if the payload
    starts with its magic, else None (raw PCM / FVID / unknown)."""
    for magic, name in _KNOWN_CODEC_MAGICS.items():
        if payload[: len(magic)] == magic:
            return name
    return None


class AudioFeatureStage:
    """Per-row audio features from int16 little-endian PCM:

        rms       sqrt(Σ s² / n)   — the integer square-sum is exact and
                                     order-independent, so the float is
                                     bit-identical to the SQL oracle
        zcr       #sign changes between consecutive samples (>=0 vs <0)
        peak      max |s|  (int64; abs(-32768) handled in int64)
        duration_s n / sr

    A payload carrying a known compressed-codec magic raises
    NotImplementedError naming the codec — decoding it needs libraries
    absent from this environment."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "audio_id"):
        self.bytes_col, self.id_col = bytes_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.bytes_col].to_pylist()
        srs = batch["sr"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(batch)
        rms = np.empty(n, np.float64)
        zcr = np.empty(n, np.int64)
        peak = np.empty(n, np.int64)
        dur = np.empty(n, np.float64)
        for i, raw in enumerate(payloads):
            codec = sniff_media(raw)
            if codec is not None:
                raise NotImplementedError(
                    f"compressed audio ({codec}) needs codec libraries not "
                    "present in this environment; provide raw int16 PCM")
            s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
            ns = len(s)
            sq = int((s * s).sum())
            rms[i] = float(np.sqrt(sq / ns)) if ns else 0.0
            zcr[i] = int(((s[1:] >= 0) != (s[:-1] >= 0)).sum()) if ns > 1 else 0
            peak[i] = int(np.abs(s).max()) if ns else 0
            dur[i] = ns / srs[i] if srs[i] else 0.0
        return pa.table({
            self.id_col: batch[self.id_col],
            "rms": pa.array(rms, pa.float64()),
            "zcr": pa.array(zcr, pa.int64()),
            "peak": pa.array(peak, pa.int64()),
            "duration_s": pa.array(dur, pa.float64()),
        })


class FrameSampleStage:
    """Sample every ``every``-th frame of each FVID video row and emit one
    row per sampled frame: (id, frame_idx, frame_w, frame_h, frame_mean,
    frame_bytes). ``encode_frames=True`` re-encodes each sampled frame as
    a genuine PNG (codecs/png); False keeps only the metadata + mean —
    the cheap path when downstream wants statistics, not pixels.

    frame_mean divides the exact integer pixel sum, so it is bit-stable
    and SQL-derivable."""

    def __init__(self, every: int = 4, encode_frames: bool = True,
                 bytes_col: str = "bytes", id_col: str = "video_id"):
        assert every >= 1
        self.every, self.encode_frames = every, encode_frames
        self.bytes_col, self.id_col = bytes_col, id_col
        if encode_frames:
            from ..codecs.png import encode_png
            self._encode_png = encode_png

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.bytes_col].to_pylist()
        src_ids = batch[self.id_col].to_pylist()
        out_id: list = []
        out_idx: list = []
        out_w: list = []
        out_h: list = []
        out_mean: list = []
        out_png: list = []
        for rid, raw in zip(src_ids, payloads):
            codec = sniff_media(raw)
            if codec is not None:
                raise NotImplementedError(
                    f"compressed video ({codec}) needs codec libraries not "
                    "present in this environment; provide FVID payloads")
            frames, _fps = decode_fvid(raw)
            nf, h, w = frames.shape
            idxs = range(0, nf, self.every)
            # exact integer sums over the whole clip at once
            sums = frames.reshape(nf, -1).astype(np.int64).sum(axis=1)
            for f in idxs:
                out_id.append(rid)
                out_idx.append(f)
                out_w.append(w)
                out_h.append(h)
                out_mean.append(sums[f] / (w * h))
                if self.encode_frames:
                    out_png.append(self._encode_png(frames[f]))
        cols = {
            self.id_col: pa.array(out_id, type=batch[self.id_col].type),
            "frame_idx": pa.array(out_idx, pa.int64()),
            "frame_w": pa.array(out_w, pa.int32()),
            "frame_h": pa.array(out_h, pa.int32()),
            "frame_mean": pa.array(out_mean, pa.float64()),
        }
        if self.encode_frames:
            cols["frame_bytes"] = pa.array(out_png, pa.binary())
        return pa.table(cols)


class SceneChangeStage:
    """Scene-boundary detection over FVID video rows: per consecutive
    frame pair, the sum of absolute pixel differences (SAD, exact
    int64); frames whose SAD from their predecessor reaches
    ``min_sad`` are emitted as (id, frame_idx, sad) boundary rows.
    One vectorized diff over the whole clip per row — pixels never
    leave the stage; compressed codecs raise the documented gate."""

    def __init__(self, min_sad: int = 19000, bytes_col: str = "bytes",
                 id_col: str = "video_id"):
        self.min_sad = int(min_sad)
        self.bytes_col, self.id_col = bytes_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.bytes_col].to_pylist()
        src_ids = batch[self.id_col].to_pylist()
        out_id: list = []
        out_idx: list = []
        out_sad: list = []
        for rid, raw in zip(src_ids, payloads):
            codec = sniff_media(raw)
            if codec is not None:
                raise NotImplementedError(
                    f"compressed video ({codec}) needs codec libraries "
                    "not present in this environment; provide FVID "
                    "payloads")
            frames, _fps = decode_fvid(raw)
            nf = frames.shape[0]
            if nf < 2:
                continue
            p = frames.reshape(nf, -1).astype(np.int64)
            sad = np.abs(p[1:] - p[:-1]).sum(axis=1)
            hit = np.nonzero(sad >= self.min_sad)[0]
            out_id.extend([rid] * len(hit))
            out_idx.extend((hit + 1).tolist())
            out_sad.extend(sad[hit].tolist())
        return pa.table({
            self.id_col: pa.array(out_id, type=batch[self.id_col].type),
            "frame_idx": pa.array(out_idx, pa.int64()),
            "sad": pa.array(out_sad, pa.int64())})
