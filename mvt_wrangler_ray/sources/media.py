"""Audio / video input tables — the multimodal columns a training-data
pipeline carries besides images (task brief: opaque binary payloads with
typed metadata; decode / feature-extract / frame-sample run as actor-pool
map_batches stages).

No audio or video codec libraries exist in this container (no ffmpeg,
soundfile, or cv2 — stages/media.py gates on import and documents the
absence), so payloads use two REAL self-describing formats this repo can
actually parse end to end:

  audio — raw little-endian int16 PCM. Parsing with ``np.frombuffer`` is
      genuine decoding; RMS / zero-crossings / peak are genuine DSP.
  video — the documented "FVID" gray8 container (header + dense frame
      planes, below). Parsing, frame sampling, and PNG re-encode of the
      sampled frames (codecs/png) are all real.

Synthesis is deterministic from the row id (same contract as
sources/images.py): every sample / pixel is a closed-form integer
function of the id hash, so any worker regenerates any shard
independently and the DuckDB oracles re-derive features exactly.

FVID layout (all little-endian):
    0:4   b"FVID"
    4:6   n_frames  (uint16)
    6:8   w         (uint16)
    8:10  h         (uint16)
    10:12 fps_x100  (uint16)
    12:   n_frames dense gray8 planes, h*w bytes each
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo.geotag import fnv1a64_strings

FVID_MAGIC = b"FVID"
FRAME_STRIDE = 7919  # per-frame pixel offset (prime, so frames differ)

AUDIO_SR = 8000
AUDIO_SAMPLES = 4096


# ---- audio ------------------------------------------------------------


def _audio_pcm(h64: int, n_samples: int) -> np.ndarray:
    """int16 PCM for one row: sample[t] = ((t*s + tl) mod 65536) - 32768
    with s = (h|1) mod 65536, tl = (h >> 7) mod 65536 — closed-form per
    sample (the SQL oracle unrolls the same formula)."""
    s = np.uint64(h64) | np.uint64(1)
    tl = np.uint64(h64) >> np.uint64(7)
    t = np.arange(n_samples, dtype=np.uint64)
    vals = ((t * (s % np.uint64(65536)) + tl) % np.uint64(65536)).astype(np.int64)
    return (vals - 32768).astype(np.int16)


def synth_audio_table(n: int, start: int = 0, sr: int = AUDIO_SR,
                      n_samples: int = AUDIO_SAMPLES) -> pa.Table:
    """Deterministic audio table rows [start, start+n):
    (audio_id:string, bytes:binary<int16 PCM LE>, sr:int32,
    n_samples:int32, caption:string)."""
    ids = np.arange(start, start + n, dtype=np.int64)
    audio_id = np.array([f"aud{i:08d}" for i in ids], dtype=object)
    h64 = fnv1a64_strings(audio_id)
    payloads = [_audio_pcm(int(h), n_samples).tobytes() for h in h64]
    caption = np.array([f"a field recording {int(i)}" for i in ids], dtype=object)
    return pa.table({
        "audio_id": pa.array(audio_id, pa.string()),
        "bytes": pa.array(payloads, pa.binary()),
        "sr": pa.array(np.full(n, sr, np.int32), pa.int32()),
        "n_samples": pa.array(np.full(n, n_samples, np.int32), pa.int32()),
        "caption": pa.array(caption, pa.string()),
    })


def audio_from_documents(sf_dir: str, n_samples: int = AUDIO_SAMPLES):
    """Audio-shaped Dataset derived from the driver's documents table
    (doc_id → audio_id), so driver queries use only provided inputs."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_audio(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return (synth_audio_rows(ids, n_samples)
                .append_column("doc_id", batch["doc_id"]))

    return ds.map_batches(to_audio, batch_format="pyarrow")


def synth_audio_rows(ids: np.ndarray, n_samples: int = AUDIO_SAMPLES) -> pa.Table:
    """Audio rows for an arbitrary id vector (not necessarily a range)."""
    audio_id = np.array([f"aud{int(i):08d}" for i in ids], dtype=object)
    h64 = fnv1a64_strings(audio_id)
    payloads = [_audio_pcm(int(h), n_samples).tobytes() for h in h64]
    n = len(ids)
    return pa.table({
        "audio_id": pa.array(audio_id, pa.string()),
        "bytes": pa.array(payloads, pa.binary()),
        "sr": pa.array(np.full(n, AUDIO_SR, np.int32), pa.int32()),
        "n_samples": pa.array(np.full(n, n_samples, np.int32), pa.int32()),
    })


# ---- video ------------------------------------------------------------


def video_geometry(h64: np.ndarray):
    """Deterministic (n_frames, w, h, fps_x100) from the id hash."""
    n_frames = (8 + (h64 % np.uint64(9)).astype(np.int64)).astype(np.int32)
    # 15x15 = 225 pixels, deliberately NOT a multiple of 256: a full
    # residue cycle mod 256 would make every frame's mean exactly 127.5
    # (odd multiplier ⇒ complete residue permutation), turning the
    # frame_mean oracle into a constant
    w = np.full(len(h64), 15, np.int32)
    h = np.full(len(h64), 15, np.int32)
    fps_x100 = (1000 + ((h64 >> np.uint64(16)) % np.uint64(2001))
                .astype(np.int64)).astype(np.int32)  # 10.00 .. 30.00 fps
    return n_frames, w, h, fps_x100


def _video_frames(h64: int, n_frames: int, w: int, h: int) -> np.ndarray:
    """(n_frames, h, w) uint8 planes: frame f pixel p (row-major) =
    ((p + f*FRAME_STRIDE)*s + tl) mod 256, s = (h|1) mod 256,
    tl = (h >> 7) mod 256."""
    s = int(np.uint64(h64) | np.uint64(1)) % 256
    tl = int(np.uint64(h64) >> np.uint64(7)) % 256
    p = np.arange(w * h, dtype=np.int64)
    f = np.arange(n_frames, dtype=np.int64)
    vals = ((p[None, :] + f[:, None] * FRAME_STRIDE) * s + tl) % 256
    return vals.astype(np.uint8).reshape(n_frames, h, w)


def encode_fvid(frames: np.ndarray, fps_x100: int) -> bytes:
    """frames (n, h, w) uint8 → FVID container bytes."""
    n, h, w = frames.shape
    head = (FVID_MAGIC
            + int(n).to_bytes(2, "little") + int(w).to_bytes(2, "little")
            + int(h).to_bytes(2, "little") + int(fps_x100).to_bytes(2, "little"))
    return head + frames.tobytes()


def decode_fvid(data: bytes):
    """FVID container bytes → (frames (n, h, w) uint8, fps_x100). Raises
    ValueError on a bad magic or a truncated payload."""
    if data[:4] != FVID_MAGIC:
        raise ValueError("not an FVID payload")
    n = int.from_bytes(data[4:6], "little")
    w = int.from_bytes(data[6:8], "little")
    h = int.from_bytes(data[8:10], "little")
    fps_x100 = int.from_bytes(data[10:12], "little")
    body = np.frombuffer(data, np.uint8, count=n * h * w, offset=12)
    if len(body) != n * h * w:
        raise ValueError("truncated FVID payload")
    return body.reshape(n, h, w), fps_x100


def synth_video_rows(ids: np.ndarray) -> pa.Table:
    """(video_id, bytes, n_frames, w, h, fps) rows for an id vector."""
    video_id = np.array([f"vid{int(i):08d}" for i in ids], dtype=object)
    h64 = fnv1a64_strings(video_id)
    n_frames, w, h, fps_x100 = video_geometry(h64)
    payloads = [
        encode_fvid(_video_frames(int(h64[i]), int(n_frames[i]),
                                  int(w[i]), int(h[i])), int(fps_x100[i]))
        for i in range(len(ids))
    ]
    return pa.table({
        "video_id": pa.array(video_id, pa.string()),
        "bytes": pa.array(payloads, pa.binary()),
        "n_frames": pa.array(n_frames, pa.int32()),
        "w": pa.array(w, pa.int32()),
        "h": pa.array(h, pa.int32()),
        "fps": pa.array(fps_x100.astype(np.float64) / 100.0, pa.float64()),
    })


def synth_videos_table(n: int, start: int = 0) -> pa.Table:
    t = synth_video_rows(np.arange(start, start + n, dtype=np.int64))
    caption = [f"a short clip {i}" for i in range(start, start + n)]
    return t.append_column("caption", pa.array(caption, pa.string()))


def videos_from_documents(sf_dir: str):
    """Video-shaped Dataset derived from the driver's documents table."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_videos(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return synth_video_rows(ids).append_column("doc_id", batch["doc_id"])

    return ds.map_batches(to_videos, batch_format="pyarrow")
