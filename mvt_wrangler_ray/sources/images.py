"""The images+captions input table.

Authoritative shape (BASELINE.json input_hint):
    image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
    caption:string, phash:int64

At production scale this is a Lance table read with
``ray.data.read_lance``; pylance is not installed in this sandbox, so
``read_images`` gates on import and falls back to parquet directories
with identical schema. Synthesis is fully deterministic from the row id
(seeded, no RNG state carried across rows) so any worker can regenerate
any shard independently — that's also what makes the fixtures
reproducible in the DuckDB oracle.

The payload bytes are a deterministic pseudo-encoding (documented FAKE:
no image codecs exist in this container — see stages/image.py for the
decode stub contract and PSNR notes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo.geotag import fnv1a64_strings

_FMTS = np.array(["png", "jpeg", "webp"], dtype=object)
_NOUNS = np.array(
    ["a harbor", "a forest", "a shrine", "a street", "a mountain", "a beach",
     "a bridge", "a market", "a waterfall", "a lighthouse"], dtype=object)
_PLACES = np.array(
    ["Anbo", "Miyanoura", "Nagata", "Kurio", "Onoaida", "Isso",
     "Hirauchi", "Koseda"], dtype=object)

# magic prefixes so fmt sniffing is possible on the fake payloads
_MAGIC = {"png": b"\x89PNG\r\n\x1a\n", "jpeg": b"\xff\xd8\xff\xe0", "webp": b"RIFF????WEBP"}


def _fake_payloads(h64: np.ndarray, fmt: np.ndarray, payload_bytes: int) -> pa.Array:
    """Vectorized deterministic payload synthesis: one (n, payload) uint8
    matrix from the id hashes (outer product, no per-row arithmetic), then
    per-row magic + memcpy. Matches stages.image._fake_decode."""
    n = len(h64)
    seeds = (h64 | np.uint64(1)).astype(np.uint64)
    tail = (h64 >> np.uint64(7)).astype(np.uint64)
    idx = np.arange(payload_bytes, dtype=np.uint64)
    mat = ((idx[None, :] * seeds[:, None]) + tail[:, None]).astype(np.uint8)
    return pa.array(
        [_MAGIC[fmt[i]] + mat[i].tobytes() for i in range(n)], pa.binary())


def derive_image_fields(ids: np.ndarray, h64: np.ndarray):
    """The deterministic (w, h, fmt, phash) derivation shared by
    synth_images_table and images_from_documents — ONE definition so the
    fixture determinism contract (stages/image recomputes phash against
    these formulas; the SQL oracles unroll them) cannot desynchronize."""
    w = (32 + (h64 % np.uint64(97)).astype(np.int64)).astype(np.int32)
    h = (32 + ((h64 >> np.uint64(8)) % np.uint64(97)).astype(np.int64)).astype(np.int32)
    fmt = _FMTS[(ids % 3)]
    phash = (h64 ^ (h64 >> np.uint64(13))
             ^ np.uint64(0x9E3779B97F4A7C15)).astype(np.int64)
    return w, h, fmt, phash


def fake_pixel_field(h64: int, w: int, h: int, payload_bytes: int = 96) -> "np.ndarray":
    """The deterministic (h, w) pixel field one image's fake payload
    decodes to (matches stages.image._fake_decode on _fake_payloads)."""
    seed = np.uint64(h64) | np.uint64(1)
    tail = np.uint64(h64) >> np.uint64(7)
    idx = np.arange(payload_bytes, dtype=np.uint64)
    mat = ((idx * seed) + tail).astype(np.uint8)
    reps = int(np.ceil(w * h / max(len(mat), 1)))
    return np.tile(mat, reps)[: w * h].reshape(h, w)


def synth_real_png_images(n: int, start: int = 0) -> pa.Table:
    """Images table whose payloads are REAL spec-compliant PNGs (stdlib
    codec) of the deterministic pixel field — same schema as
    synth_images_table, fmt always 'png'. Exercises the genuine decode
    path of stages.image.DecodeImageStage end to end."""
    from ..codecs.png import encode_png

    ids = np.arange(start, start + n, dtype=np.int64)
    image_id = np.array([f"img{i:08d}" for i in ids], dtype=object)
    h64 = fnv1a64_strings(image_id)
    w, h, _, phash = derive_image_fields(ids, h64)
    caption = np.array([f"a real png {int(i)}" for i in ids], dtype=object)
    payloads = [
        encode_png(fake_pixel_field(int(h64[i]), int(w[i]), int(h[i])))
        for i in range(n)
    ]
    return pa.table({
        "image_id": pa.array(image_id, pa.string()),
        "bytes": pa.array(payloads, pa.binary()),
        "w": pa.array(w, pa.int32()),
        "h": pa.array(h, pa.int32()),
        "fmt": pa.array(np.full(n, "png", dtype=object), pa.string()),
        "caption": pa.array(caption, pa.string()),
        "phash": pa.array(phash, pa.int64()),
    })


def synth_images_table(n: int, start: int = 0, payload_bytes: int = 96,
                       hot_fraction: float = 0.1,
                       hot_lon: float = 130.66, hot_lat: float = 30.38) -> pa.Table:
    """Deterministic images table rows [start, start+n).

    ``hot_fraction`` of rows (by id mod) cluster near (hot_lon, hot_lat) —
    the Yakushima-area skew case from FIXTURES.md §1 — by carrying a
    ``geo_hint`` column the geotag stage honors. The rest geotag from the
    image_id hash (uniform)."""
    ids = np.arange(start, start + n, dtype=np.int64)
    image_id = np.array([f"img{i:08d}" for i in ids], dtype=object)
    h64 = fnv1a64_strings(image_id)

    w, h, fmt, phash = derive_image_fields(ids, h64)
    caption = np.array(
        [f"a photo of {_NOUNS[i % len(_NOUNS)]} near {_PLACES[i % len(_PLACES)]}"
         for i in ids], dtype=object)

    bytes_col = _fake_payloads(h64, fmt, payload_bytes)

    if hot_fraction <= 0:
        hot = np.zeros(n, dtype=bool)   # explicitly no skew cluster
    else:
        hot = (ids % np.int64(max(round(1.0 / hot_fraction), 1))) == 0
    jitter = (h64 % np.uint64(10_000)).astype(np.float64) / 10_000.0 * 0.02 - 0.01
    geo_hint_lon = np.where(hot, hot_lon + jitter, np.nan)
    geo_hint_lat = np.where(hot, hot_lat + jitter * 0.7, np.nan)

    return pa.table({
        "image_id": pa.array(image_id, pa.string()),
        "bytes": bytes_col,
        "w": pa.array(w, pa.int32()),
        "h": pa.array(h, pa.int32()),
        "fmt": pa.array(fmt, pa.string()),
        "caption": pa.array(caption, pa.string()),
        "phash": pa.array(phash, pa.int64()),
        "geo_hint_lon": pa.array(geo_hint_lon, pa.float64()),
        "geo_hint_lat": pa.array(geo_hint_lat, pa.float64()),
    })


def synth_images_dataset(n: int, blocks: int = 32, **kw):
    """Distributed synthesis: one task per block, each regenerating its id
    range independently (no driver-side materialization)."""
    import ray.data as rd

    if n <= 0:
        return rd.from_arrow(synth_images_table(0))
    per = (n + blocks - 1) // blocks
    starts = list(range(0, n, per))
    ds = rd.from_items([{"start": s, "count": min(per, n - s)} for s in starts],
                       override_num_blocks=len(starts))

    def gen(batch: pa.Table) -> pa.Table:
        return pa.concat_tables([
            synth_images_table(int(c), start=int(s), **kw)
            for s, c in zip(batch["start"].to_pylist(),
                            batch["count"].to_pylist())])

    return ds.map_batches(gen, batch_format="pyarrow")


REQUIRED_IMAGE_COLUMNS = {
    "image_id": (pa.string(), pa.large_string()),
    "bytes": (pa.binary(), pa.large_binary()),
    "w": (pa.int32(), pa.int64()),
    "h": (pa.int32(), pa.int64()),
    "fmt": (pa.string(), pa.large_string()),
    "caption": (pa.string(), pa.large_string()),
    "phash": (pa.int64(),),
}


def validate_images_schema(ds) -> None:
    """Assert the input matches the authoritative shape
    (BASELINE.json input_hint). Raises ValueError listing every problem
    at once — schema errors should surface before the cluster spends
    anything."""
    schema = ds.schema()
    have = dict(zip(schema.names, schema.types))
    problems = []
    for name, accepted in REQUIRED_IMAGE_COLUMNS.items():
        if name not in have:
            problems.append(f"missing column {name!r}")
        elif have[name] not in accepted:
            problems.append(
                f"column {name!r} has type {have[name]} "
                f"(expected one of {[str(t) for t in accepted]})")
    if problems:
        raise ValueError("images table schema mismatch: " + "; ".join(problems))


def read_images(path: str, columns=None):
    """Read an images table: Lance if available (the at-scale path),
    else parquet file/directory with the same schema."""
    import ray.data as rd

    if str(path).endswith(".lance"):
        try:
            import lance  # noqa: F401
            return rd.read_lance(path, columns=columns)
        except ImportError as e:
            raise ImportError(
                "pylance not installed in this environment; materialize the "
                "table as parquet instead") from e
    return rd.read_parquet(path, columns=columns)


def images_from_documents(sf_dir: str, payload_bytes: int = 64):
    """Derive an images-shaped Dataset from the driver's documents table
    (TESTDATA.md): doc_id → image_id, text → caption, deterministic fake
    payloads. Lets the flagship pipeline run on driver-provided inputs
    only (no external data), while tests use synth_images_table."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_images(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        image_id = np.array([f"img{i:08d}" for i in ids], dtype=object)
        h64 = fnv1a64_strings(image_id)
        w, h, fmt, phash = derive_image_fields(ids, h64)
        return pa.table({
            "image_id": pa.array(image_id, pa.string()),
            "bytes": _fake_payloads(h64, fmt, payload_bytes),
            "w": pa.array(w, pa.int32()),
            "h": pa.array(h, pa.int32()),
            "fmt": pa.array(fmt, pa.string()),
            "caption": batch["text"],
            "phash": pa.array(phash, pa.int64()),
            "doc_id": batch["doc_id"],
        })

    return ds.map_batches(to_images, batch_format="pyarrow")


def images_from_documents_retouched(sf_dir: str, payload_bytes: int = 64,
                                    copy_mod: int = 5):
    """images_from_documents with PLANTED near-duplicates: every doc with
    ``doc_id % copy_mod == copy_mod - 1`` is a "retouched copy" of
    ``doc_id - 1``'s image — identical deterministic payload and geometry
    except ONE body byte (index ``h64 % payload_bytes``) XORed with 0x80.
    The decoded pixel field then differs on ~1/payload_bytes of positions,
    so the recomputed phash lands within a small Hamming distance of the
    base image's: deterministic planted ground truth for the image
    near-dup pipeline, exactly re-derivable by the DuckDB oracle."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_images(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        is_copy = (ids % copy_mod) == (copy_mod - 1)
        bid = ids - is_copy.astype(np.int64)
        base_image_id = np.array([f"img{i:08d}" for i in bid], dtype=object)
        h64 = fnv1a64_strings(base_image_id)
        w, h, fmt, phash = derive_image_fields(bid, h64)
        seeds = (h64 | np.uint64(1)).astype(np.uint64)
        tail = (h64 >> np.uint64(7)).astype(np.uint64)
        idx = np.arange(payload_bytes, dtype=np.uint64)
        mat = ((idx[None, :] * seeds[:, None]) + tail[:, None]).astype(np.uint8)
        j = (h64 % np.uint64(payload_bytes)).astype(np.int64)
        mat[is_copy, j[is_copy]] ^= np.uint8(0x80)
        payloads = pa.array(
            [_MAGIC[fmt[i]] + mat[i].tobytes() for i in range(n)], pa.binary())
        image_id = np.array([f"img{i:08d}" for i in ids], dtype=object)
        return pa.table({
            "image_id": pa.array(image_id, pa.string()),
            "bytes": payloads,
            "w": pa.array(w, pa.int32()),
            "h": pa.array(h, pa.int32()),
            "fmt": pa.array(fmt, pa.string()),
            "caption": batch["text"],
            "phash": pa.array(phash, pa.int64()),
            "doc_id": batch["doc_id"],
        })

    return ds.map_batches(to_images, batch_format="pyarrow")
