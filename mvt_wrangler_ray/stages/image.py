"""Multimodal (image) stages: decode / feature-extract / resize /
perceptual-hash as actor-pool ``map_batches`` stages over opaque binary
columns.

STUB NOTICE (per the build brief): no image codecs (PIL/cv2) exist in
this container. The Ray-side plumbing — schema, batch sizing, actor
signature, zero-copy binary handling, output layout — is real and
tested; the codec itself is stubbed:

  * if PIL is importable (production), real decode runs;
  * else payloads produced by sources.images (deterministic fake
    encoding with format magic) are "decoded" by regenerating the
    deterministic pixel field from the payload bytes;
  * any other payload raises NotImplementedError — clearly marked.

The per-row invariant contract (BASELINE.json): decoded-pixel allclose /
PSNR ≥ 40 dB for lossy formats, caption equality across the pipeline.
psnr() implements the metric; with the deterministic fake codec the
round-trip is bit-exact (PSNR = inf), which satisfies ≥ 40 dB trivially
and keeps the contract testable until real codecs exist.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

_MAGICS = {
    b"\x89PNG\r\n\x1a\n": "png",
    b"\xff\xd8\xff\xe0": "jpeg",
    b"RIFF": "webp",
}


def sniff_format(payload: bytes) -> Optional[str]:
    for magic, fmt in _MAGICS.items():
        if payload[: len(magic)] == magic:
            return fmt
    return None


def _fake_decode(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic pixel field from the payload body (inverse of the
    sources.images fake encoding): tile the body bytes to (h, w)."""
    fmt = sniff_format(payload)
    if fmt == "png":
        body = payload[8:]
    elif fmt == "jpeg":
        body = payload[4:]
    elif fmt == "webp":
        body = payload[12:]
    else:
        raise NotImplementedError(
            "real image decoding requires PIL/cv2 (not in this container); "
            "only deterministic fake payloads from sources.images decode")
    arr = np.frombuffer(body, dtype=np.uint8)
    reps = int(np.ceil(w * h / max(len(arr), 1)))
    return np.tile(arr, reps)[: w * h].reshape(h, w)


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def phash64(pixels: np.ndarray) -> np.int64:
    """Perceptual-hash-like 64-bit signature: 8×8 block means vs their
    median (a DCT-free aHash — deterministic, vectorized). Images smaller
    than 8 pixels on a side are edge-tiled up to 8×8 first (tiny icons /
    tracking pixels are common in scraped corpora and must hash, not
    crash)."""
    h, w = pixels.shape
    if h < 8 or w < 8:
        pixels = np.tile(pixels,
                         ((8 + h - 1) // h, (8 + w - 1) // w))[:max(h, 8),
                                                               :max(w, 8)]
        h, w = pixels.shape
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    blocks = pixels[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks > np.median(blocks)).ravel()
    # MSB-first pack (bits[0] → bit 63), one packbits instead of a
    # 64-iteration Python loop
    val = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return np.int64(val - (1 << 64) if val >= 1 << 63 else val)


def strict_codecs_default() -> bool:
    """Resolve MVT_STRICT_CODECS on the DRIVER at plan-build time.
    Stage ``__init__``s execute inside Ray worker processes, which on a
    multi-node cluster do NOT inherit driver env vars (absent a
    runtime_env) — a driver-side export would silently leave strict
    mode off on remote workers. Call this where the plan is built and
    pass the bool into the stage constructor explicitly; the env
    fallback inside the stages remains for single-process use."""
    import os

    return os.environ.get(
        "MVT_STRICT_CODECS", "").lower() in ("1", "true", "yes")


class DecodeImageStage:
    """Actor pool stage: bytes → decoded stats + recomputed phash.
    Keep batch_size SMALL here (wide binary rows): batch × pool must fit
    worker heaps; decoded pixels never leave the stage (only scalar
    features do), so nothing wide crosses a shuffle."""

    def __init__(self, compute_phash: bool = True,
                 strict: Optional[bool] = None):
        try:
            from PIL import Image  # noqa: F401
            self._pil = True
        except ImportError:
            self._pil = False
        self.compute_phash = compute_phash
        if strict is None:
            import os

            strict = os.environ.get(
                "MVT_STRICT_CODECS", "").lower() in ("1", "true", "yes")
        # strict mode: NEVER fall back to the deterministic fake decode
        # — a real-data user pointing this at JPEG/WebP payloads without
        # PIL must get a loud NotImplementedError, not plausible-but-
        # wrong pseudo-random pixels (round-3 verdict item 6)
        self.strict = strict

    def _decode(self, payload: bytes, w: int, h: int) -> np.ndarray:
        if payload[:4] == b"LJPG":
            # REAL lossy transform codec (codecs/dct.py) — checked BEFORE
            # the PIL branch: PIL doesn't know this container and would
            # raise UnidentifiedImageError where PIL is installed
            from ..codecs.dct import decode_ljpg

            return decode_ljpg(payload)
        if self._pil:  # pragma: no cover — not installed here
            import io

            from PIL import Image

            return np.asarray(Image.open(io.BytesIO(payload)).convert("L"))
        if sniff_format(payload) == "png":
            # REAL spec-compliant PNG decode (stdlib zlib codec). Only a
            # payload with NO valid chunk structure (the synthetic
            # fixtures: magic + arbitrary body) may fall back to the fake
            # decode — a structurally valid PNG that fails (16-bit, RGB,
            # interlaced, bad CRC mid-file) must raise, or phash/PSNR
            # downstream would be plausible-but-wrong with no signal.
            from ..codecs.png import decode_png, has_chunk_structure

            try:
                return decode_png(payload)
            except ValueError:
                if has_chunk_structure(payload):
                    raise
        if self.strict:
            fmt = sniff_format(payload) or "unknown"
            raise NotImplementedError(
                f"strict codec mode: no real decoder available for "
                f"{fmt!r} payload (PIL/cv2 absent; only spec-compliant "
                "PNG and LJPG decode natively) — refusing the "
                "deterministic fake decode. Unset MVT_STRICT_CODECS / "
                "pass strict=False to allow synthetic-fixture payloads.")
        return _fake_decode(payload, w, h)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["bytes"].to_pylist()
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        n = len(payloads)
        means = np.empty(n, dtype=np.float64)
        stds = np.empty(n, dtype=np.float64)
        hashes = np.empty(n, dtype=np.int64)
        fmts = np.empty(n, dtype=object)
        for i in range(n):
            px = self._decode(payloads[i], int(ws[i]), int(hs[i]))
            means[i] = px.mean()
            stds[i] = px.std()
            fmts[i] = sniff_format(payloads[i]) or "unknown"
            hashes[i] = phash64(px) if self.compute_phash else 0
        out = (batch
               .append_column("px_mean", pa.array(means, pa.float64()))
               .append_column("px_std", pa.array(stds, pa.float64()))
               .append_column("sniffed_fmt", pa.array(fmts, pa.string())))
        if self.compute_phash:
            out = out.append_column("phash_recomputed", pa.array(hashes, pa.int64()))
        return out


def sobel_edge_energy(p: np.ndarray) -> int:
    """Exact integer Sobel energy: sum of |gx| + |gy| over interior
    pixels (3×3 kernels [[-1,0,1],[-2,0,2],[-1,0,1]] and its transpose).
    Pure int64 slicing arithmetic — no float drift, so the SQL oracle
    reproduces it bit-exactly."""
    if p.shape[0] < 3 or p.shape[1] < 3:
        return 0
    p = p.astype(np.int64)
    gx = ((p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:])
          - (p[:-2, :-2] + 2 * p[1:-1, :-2] + p[2:, :-2]))
    gy = ((p[2:, :-2] + 2 * p[2:, 1:-1] + p[2:, 2:])
          - (p[:-2, :-2] + 2 * p[:-2, 1:-1] + p[:-2, 2:]))
    return int(np.abs(gx).sum() + np.abs(gy).sum())


class ImageStatsStage:
    """Actor pool stage: decode → exact moment + edge features. All
    accumulations are integer sums (mean/variance divide them at the
    end), so results are bit-identical across engines and batch splits.
    Pixels never leave the stage — only four scalars per image do."""

    def __init__(self, strict: Optional[bool] = None):
        self._decoder = DecodeImageStage(compute_phash=False,
                                         strict=strict)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["bytes"].to_pylist()
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        n = len(payloads)
        means = np.empty(n, np.float64)
        variances = np.empty(n, np.float64)
        edges = np.empty(n, np.int64)
        for i in range(n):
            px = self._decoder._decode(payloads[i], int(ws[i]), int(hs[i]))
            p = px.astype(np.int64)
            npx = p.size
            s = int(p.sum())
            ss = int((p * p).sum())
            m = s / npx
            means[i] = m
            variances[i] = ss / npx - m * m
            edges[i] = sobel_edge_energy(px)
        return pa.table({
            "doc_id": batch["doc_id"],
            "px_mean": pa.array(means, pa.float64()),
            "px_var": pa.array(variances, pa.float64()),
            "edge_energy": pa.array(edges, pa.int64()),
        })


class PixelHistogramStage:
    """Actor pool stage: decode → per-block 256-bin pixel-value
    histogram partials. The per-image bincount merges by elementwise
    addition (a mergeable sketch, like the HLL/Count-Min stages), so a
    whole-corpus value distribution costs ONE tiny 256-row exchange —
    pixels never leave the stage, each block emits at most 256 rows."""

    def __init__(self, strict: Optional[bool] = None):
        self._decoder = DecodeImageStage(compute_phash=False,
                                         strict=strict)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["bytes"].to_pylist()
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        counts = np.zeros(256, np.int64)
        for i in range(len(payloads)):
            px = self._decoder._decode(payloads[i], int(ws[i]), int(hs[i]))
            counts += np.bincount(px.ravel(), minlength=256)
        nz = np.nonzero(counts)[0]
        return pa.table({
            "bin": pa.array(nz.astype(np.int64), pa.int64()),
            "n_px": pa.array(counts[nz], pa.int64()),
        })


def pixel_histogram(ds_images, num_buckets: int = 8):
    """Whole-corpus pixel-value histogram: actor-shaped decode +
    per-block partials, then one tiny two-phase merge keyed by bin.
    Returns a Dataset (bin, n_px) for non-empty bins."""
    from .shuffle import two_phase_aggregate

    _cache: dict = {}

    def partial(b: pa.Table) -> pa.Table:
        st = _cache.get("s")
        if st is None:
            st = _cache["s"] = PixelHistogramStage()
        return st(b)

    parts = ds_images.map_batches(partial, batch_format="pyarrow",
                                  batch_size=1024)
    return two_phase_aggregate(
        parts, keys=["bin"], partial_aggs=[("n_px", "sum")],
        partial_names=["p"], final_aggs=[("p", "sum")],
        final_names=["n_px"], num_buckets=num_buckets)


class PngRecodeStage:
    """Actor-pool stage: decode each image, optionally quantize (the
    LOSSY path — step q maps pixels to q·round(px/q), a real fidelity
    loss), re-encode as a genuine PNG, and record PSNR vs the source
    pixels. With quant_step=0 the round trip is lossless (PSNR = inf);
    with small steps PSNR stays ≥ 40 dB NON-trivially (asserted in
    tests/test_png_codec.py) — the BASELINE.json per-row invariant."""

    def __init__(self, quant_step: int = 0,
                 strict: Optional[bool] = None):
        self.quant_step = int(quant_step)
        self._inner = DecodeImageStage(compute_phash=False, strict=strict)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..codecs.png import encode_png

        payloads = batch["bytes"].to_pylist()
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        n = len(payloads)
        out_bytes = []
        psnrs = np.empty(n, dtype=np.float64)
        for i in range(n):
            px = self._inner._decode(payloads[i], int(ws[i]), int(hs[i]))
            if self.quant_step > 1:
                q = self.quant_step
                lossy = np.clip(
                    np.round(px.astype(np.float64) / q) * q, 0, 255
                ).astype(np.uint8)
            else:
                lossy = px
            blob = encode_png(lossy)
            psnrs[i] = psnr(px, lossy)
            out_bytes.append(blob)
        return (batch
                .append_column("png_bytes", pa.array(out_bytes, pa.binary()))
                .append_column("psnr_db", pa.array(psnrs, pa.float64())))


class LossyRecodeStage:
    """Actor-pool stage around the from-scratch LJPG transform codec
    (codecs/dct.py — 8×8 DCT + uniform quantization): decode each source
    image, lossy-encode, decode back, and record the measured PSNR. The
    round trip is genuinely NOT bit-exact, yet PSNR ≥ 40 dB is
    guaranteed by the quantizer bound — the BASELINE.json lossy-format
    invariant exercised by a real transform codec rather than a
    bit-identical fake (tests/test_dct_codec.py asserts both halves)."""

    def __init__(self, step: int = 2, strict: Optional[bool] = None):
        self.step = int(step)
        self._inner = DecodeImageStage(compute_phash=False, strict=strict)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..codecs.dct import decode_ljpg, encode_ljpg

        payloads = batch["bytes"].to_pylist()
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        n = len(payloads)
        out_bytes = []
        psnrs = np.empty(n, dtype=np.float64)
        for i in range(n):
            px = self._inner._decode(payloads[i], int(ws[i]), int(hs[i]))
            blob = encode_ljpg(px, self.step)
            back = decode_ljpg(blob)
            psnrs[i] = psnr(px, back)
            out_bytes.append(blob)
        return (batch
                .append_column("ljpg_bytes", pa.array(out_bytes, pa.binary()))
                .append_column("psnr_db", pa.array(psnrs, pa.float64())))


class ResizeStage:
    """REAL resize/thumbnail stage: decode (PNG via the stdlib codec, or
    the deterministic fake payloads), nearest-neighbor resample to the
    target geometry (pure numpy index gather — no codecs needed), and
    re-encode as a genuine PNG. thumb_w/thumb_h always describe the
    actual thumb_bytes content."""

    def __init__(self, target: Tuple[int, int] = (64, 64),
                 strict: Optional[bool] = None):
        self.target = target
        self._decoder = DecodeImageStage(compute_phash=False,
                                         strict=strict)

    @staticmethod
    def _nearest_resample(px: np.ndarray, tw: int, th: int) -> np.ndarray:
        h, w = px.shape
        rows = np.minimum((np.arange(th) * h) // th, h - 1)
        cols = np.minimum((np.arange(tw) * w) // tw, w - 1)
        return px[rows[:, None], cols[None, :]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..codecs.png import encode_png

        n = len(batch)
        tw, th = self.target
        payloads = batch["bytes"].to_pylist()
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        thumbs = []
        for i in range(n):
            px = self._decoder._decode(payloads[i], int(ws[i]), int(hs[i]))
            thumbs.append(encode_png(self._nearest_resample(px, tw, th)))
        return (batch
                .append_column("thumb_w", pa.array(np.full(n, tw, np.int32), pa.int32()))
                .append_column("thumb_h", pa.array(np.full(n, th, np.int32), pa.int32()))
                .append_column("thumb_bytes", pa.array(thumbs, pa.binary())))


class BlurScoreStage:
    """Actor pool stage: decode → variance-of-Laplacian blur score (the
    standard blur / out-of-focus detector for image-corpus filtering —
    Pech-Pacheco et al. 2000). L(r,c) = 4·V(r,c) − V(r±1,c) − V(r,c±1)
    over interior pixels; the sums ΣL and ΣL² accumulate in exact int64
    (|L| ≤ 1020, so ΣL² < 2^44 even at 4096² pixels), and the variance
    is ONE trailing float expression (n·ΣL² − ΣL²̄)/n² — bit-identical
    to the closed-form SQL oracle. Pixels never leave the stage."""

    def __init__(self, strict: Optional[bool] = None):
        self._decoder = DecodeImageStage(compute_phash=False,
                                         strict=strict)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["bytes"].to_pylist()
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        n = len(payloads)
        ls = np.empty(n, np.int64)
        lsq = np.empty(n, np.int64)
        ni = np.empty(n, np.int64)
        for i in range(n):
            px = self._decoder._decode(
                payloads[i], int(ws[i]), int(hs[i])).astype(np.int64)
            if px.shape[0] < 3 or px.shape[1] < 3:
                # no interior pixels → no Laplacian → NO row (the SQL
                # oracle's empty unnest range emits none either; a 0/0
                # NaN here would be a silent parity break)
                ls[i] = lsq[i] = ni[i] = 0
                continue
            lap = (4 * px[1:-1, 1:-1] - px[:-2, 1:-1] - px[2:, 1:-1]
                   - px[1:-1, :-2] - px[1:-1, 2:])
            ls[i] = int(lap.sum())
            lsq[i] = int((lap * lap).sum())
            ni[i] = lap.size
        keep = ni > 0
        ls, lsq, ni = ls[keep], lsq[keep], ni[keep]
        nf = ni.astype(np.float64)
        var = (nf * lsq.astype(np.float64)
               - ls.astype(np.float64) * ls.astype(np.float64)) / (nf * nf)
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks().filter(
                pa.array(keep)) if isinstance(batch["doc_id"],
                                              pa.ChunkedArray)
            else batch["doc_id"].filter(pa.array(keep)),
            "lap_sum": pa.array(ls, pa.int64()),
            "lap_sq_sum": pa.array(lsq, pa.int64()),
            "n_interior": pa.array(ni, pa.int64()),
            "blur_var": pa.array(var, pa.float64())})


def size_filter_verdict_batch(batch: pa.Table, min_side: int = 48,
                              max_side: int = 112,
                              max_aspect: int = 2) -> pa.Table:
    """Dimension/aspect gating — the standard multimodal pre-filter
    (drop tiny thumbnails, oversized scans, and extreme strips before
    paying decode cost). Appends `verdict` with FIRST-FAILING-RULE
    precedence: 'too_small' (min(w,h) < min_side), then 'too_large'
    (max(w,h) > max_side), then 'bad_aspect' (w > max_aspect*h or
    h > max_aspect*w), else 'ok'. Pure integer compares on the metadata
    columns — the payload is never touched, so the stage runs on a
    2-column pruned read."""
    w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
    verdict = np.where(
        np.minimum(w, h) < min_side, "too_small",
        np.where(np.maximum(w, h) > max_side, "too_large",
                 np.where((w > max_aspect * h) | (h > max_aspect * w),
                          "bad_aspect", "ok")))
    return batch.append_column("verdict", pa.array(verdict, pa.string()))


def size_filter_counts(ds_images, min_side: int = 48, max_side: int = 112,
                       max_aspect: int = 2):
    """Per-verdict image counts for the size/aspect gate.

    → Dataset[verdict:string, n:int64] (≤ 4 rows). Map-side partials
    into a tiny keyed merge; driver state is the verdict set."""
    from .shuffle import two_phase_aggregate

    def partial(b: pa.Table) -> pa.Table:
        t = size_filter_verdict_batch(b, min_side, max_side, max_aspect)
        return pa.table({"verdict": t["verdict"],
                         "one": pa.array(np.ones(len(t), np.int64))})

    narrow = ds_images.map_batches(partial, batch_format="pyarrow")
    return two_phase_aggregate(
        narrow, keys=["verdict"],
        partial_aggs=[("one", "sum")], partial_names=["pn"],
        final_aggs=[("pn", "sum")], final_names=["n"], num_buckets=4)


# the SDXL-style aspect ladder (scaled to the fixture's 32-128 px
# range), ratio-ascending: portrait → square → landscape
ASPECT_LADDER = ((64, 128), (80, 112), (96, 96), (112, 80), (128, 64))


def aspect_bucket_batch(batch: pa.Table,
                        ladder=ASPECT_LADDER) -> pa.Table:
    """Aspect-ratio BUCKETING (the diffusion-training batching trick:
    group images into fixed (w, h) shape buckets so a batch shares one
    tensor shape): each image goes to the ladder bucket whose log
    aspect ratio is nearest to its own.

    The argmin is INTEGER-EXACT — nearest in log space between adjacent
    ladder ratios b_i < b_{i+1} flips exactly where (w/h)² crosses
    b_i·b_{i+1}, i.e. where w²·bh_i·bh_{i+1} ≥ h²·bw_i·bw_{i+1}
    (equality assigns the HIGHER bucket) — so the engine and the SQL
    oracle agree bit-for-bit with no float logs anywhere."""
    w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
    idx = np.zeros(len(w), np.int64)
    for i in range(len(ladder) - 1):
        bw1, bh1 = ladder[i]
        bw2, bh2 = ladder[i + 1]
        # move to bucket i+1 where w²·bh1·bh2 >= h²·bw1·bw2
        idx = np.where(w * w * (bh1 * bh2) >= h * h * (bw1 * bw2),
                       i + 1, idx)
    bw = np.array([b[0] for b in ladder], np.int64)[idx]
    bh = np.array([b[1] for b in ladder], np.int64)[idx]
    return pa.table({
        "bucket_w": pa.array(bw, pa.int64()),
        "bucket_h": pa.array(bh, pa.int64()),
        "src_px": pa.array(w * h, pa.int64()),
    })


def aspect_bucket_counts(ds, ladder=ASPECT_LADDER):
    """Per-bucket image counts + total source pixels (the batch-shape
    histogram a bucketed dataloader is sized from): map-side bucket
    assignment, one tiny keyed merge (keys ≤ |ladder|)."""
    from .shuffle import two_phase_aggregate

    assigned = ds.map_batches(
        lambda b: aspect_bucket_batch(b, ladder), batch_format="pyarrow")
    return two_phase_aggregate(
        assigned, keys=["bucket_w", "bucket_h"],
        partial_aggs=[("src_px", "count"), ("src_px", "sum")],
        partial_names=["pn", "ps"],
        final_aggs=[("pn", "sum"), ("ps", "sum")],
        final_names=["n_images", "total_src_px"], num_buckets=4)
