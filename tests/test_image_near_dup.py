"""Image near-dup detection: planted retouched copies recovered via
phash Hamming-band LSH (the generic hamming_near_dups machinery)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from mvt_wrangler_ray.sources.images import (
    _MAGIC, derive_image_fields, fnv1a64_strings,
    images_from_documents_retouched)
from mvt_wrangler_ray.stages.dedup import (
    hamming64, hamming_bands, hamming_near_dups, simhash_bands)
from mvt_wrangler_ray.stages.image import DecodeImageStage, _fake_decode, phash64

SF = "/root/testdata/sf0.001"


def _planted_signatures(n_ids):
    """Driver-side ground truth: (doc_id, phash) for each id, with the
    retouch rule applied — mirrors images_from_documents_retouched."""
    ids = np.asarray(n_ids, dtype=np.int64)
    is_copy = (ids % 5) == 4
    bid = ids - is_copy.astype(np.int64)
    h64 = fnv1a64_strings(np.array([f"img{i:08d}" for i in bid], dtype=object))
    w, h, fmt, _ = derive_image_fields(bid, h64)
    seeds = h64 | np.uint64(1)
    tail = h64 >> np.uint64(7)
    idx = np.arange(64, dtype=np.uint64)
    mat = ((idx[None, :] * seeds[:, None]) + tail[:, None]).astype(np.uint8)
    j = (h64 % np.uint64(64)).astype(np.int64)
    mat[is_copy, j[is_copy]] ^= np.uint8(0x80)
    sigs = np.empty(len(ids), np.int64)
    for i in range(len(ids)):
        px = _fake_decode(_MAGIC[fmt[i]] + mat[i].tobytes(),
                          int(w[i]), int(h[i]))
        sigs[i] = phash64(px)
    return sigs, is_copy, bid


def test_retouched_source_differs_in_one_byte(ray_session):
    ds = images_from_documents_retouched(SF)
    t = ds.take_batch(25, batch_format="pyarrow")
    by_id = dict(zip(t["doc_id"].to_pylist(), t["bytes"].to_pylist()))
    checked = 0
    for i, payload in by_id.items():
        if i % 5 == 4 and (i - 1) in by_id:
            base = by_id[i - 1]
            assert len(base) == len(payload)
            diff = [k for k in range(len(base)) if base[k] != payload[k]]
            assert len(diff) == 1, f"copy {i} differs in {len(diff)} bytes"
            checked += 1
    assert checked >= 3


def test_hamming_bands_matches_simhash_bands():
    sig = np.array([0, -1, 0x123456789ABCDEF0, -42], dtype=np.int64)
    b = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "simhash": pa.array(sig, pa.int64())})
    assert simhash_bands(b).equals(hamming_bands(b, "simhash", bands=4))
    b8 = hamming_bands(b, "simhash", bands=8)
    assert b8.num_rows == 4 * 8
    # reconstructing the signature from its 8 bands is lossless
    vals = b8["band_val"].to_numpy().reshape(8, 4).astype(np.uint64)
    bands = b8["band"].to_numpy().reshape(8, 4)
    recon = np.zeros(4, np.uint64)
    for r in range(8):
        recon |= vals[r] << (np.uint64(8) * bands[r].astype(np.uint64))
    assert (recon.astype(np.int64) == sig).all()


def test_planted_pairs_recovered(ray_session):
    """Every planted (base, copy) pair within Hamming ≤ 7 MUST appear
    (pigeonhole over 8 bands guarantees recall only up to bands-1 = 7);
    every reported pair must verify ≤ 7."""
    ds = images_from_documents_retouched(SF)
    st = DecodeImageStage()
    sig_ds = ds.map_batches(
        lambda b: st(b).select(["doc_id", "phash_recomputed"]),
        batch_format="pyarrow")
    pairs = hamming_near_dups(sig_ds, "phash_recomputed", max_hamming=7,
                              bands=8)
    got = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}

    import pyarrow.parquet as pq
    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]
                        )["doc_id"].to_numpy().astype(np.int64)
    sigs, is_copy, bid = _planted_signatures(ids)
    sig_of = dict(zip(ids.tolist(), sigs.tolist()))
    for i, copy in zip(ids, is_copy):
        if not copy or (i - 1) not in sig_of:
            continue
        d = int(hamming64(np.array([sig_of[i]]), np.array([sig_of[i - 1]]))[0])
        if d <= 7:
            assert (int(i - 1), int(i)) in got, f"missed planted pair {i-1},{i} d={d}"
    # soundness: reported hamming values are true distances ≤ 7
    ham = pairs["hamming"].to_numpy()
    assert (ham <= 7).all()
    aa = pairs["id_a"].to_numpy().astype(np.int64)
    bb = pairs["id_b"].to_numpy().astype(np.int64)
    sa = np.array([sig_of[int(x)] for x in aa])
    sb = np.array([sig_of[int(x)] for x in bb])
    assert (hamming64(sa, sb) == ham).all()


def test_hamming_threshold_above_bands_warns(ray_session):
    """max_hamming >= bands has incomplete pigeonhole recall — the
    stage must say so loudly instead of silently under-reporting."""
    sig_ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "sig": pa.array([0, 255], pa.int64())}))
    with pytest.warns(UserWarning, match="max_hamming=8 >= bands=8"):
        hamming_near_dups(sig_ds, "sig", max_hamming=8, bands=8)
