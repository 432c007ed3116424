"""Regression tests for the round-2 ADVICE findings.

Each test reproduces the reported divergence and asserts the fixed
behavior: no silent fake-decode of real-but-unsupported PNGs, typed
empty kNN batches for string query ids, dtype-generic as-of keys,
validated --lossy-recode step, and an exact int64 membership lane in
the bucketed semi join even when left keys contain nulls.
"""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from mvt_wrangler_ray.codecs.png import encode_png, has_chunk_structure
from mvt_wrangler_ray.stages.image import DecodeImageStage


def _png_with_profile(depth: int, ctype: int) -> bytes:
    """Structurally VALID png (good signature + CRC-correct IHDR) with an
    out-of-profile header (e.g. 16-bit or RGB)."""
    ihdr = struct.pack(">IIBBBBB", 4, 4, depth, ctype, 0, 0, 0)
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
    chunk += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    return b"\x89PNG\r\n\x1a\n" + chunk


class TestPngFallbackGate:
    """ADVICE: DecodeImageStage must not silently fake-decode a REAL png
    that the from-scratch codec can't handle."""

    def test_fake_payload_still_decodes(self):
        stage = DecodeImageStage()
        payload = b"\x89PNG\r\n\x1a\n" + bytes(range(64))
        assert not has_chunk_structure(payload)
        px = stage._decode(payload, 8, 8)
        assert px.shape == (8, 8)

    @pytest.mark.parametrize("depth,ctype", [(16, 0), (8, 2)])
    def test_out_of_profile_real_png_raises(self, depth, ctype):
        payload = _png_with_profile(depth, ctype)
        assert has_chunk_structure(payload)
        with pytest.raises(ValueError, match="unsupported PNG profile"):
            DecodeImageStage()._decode(payload, 4, 4)

    def test_corrupt_real_png_raises(self):
        good = encode_png(np.arange(64, dtype=np.uint8).reshape(8, 8))
        bad = bytearray(good)
        bad[-5] ^= 0xFF  # flip a byte inside IEND/IDAT region
        with pytest.raises(ValueError):
            DecodeImageStage()._decode(bytes(bad), 8, 8)

    def test_supported_real_png_roundtrips(self):
        img = (np.arange(64, dtype=np.uint8) * 3 % 251).reshape(8, 8)
        px = DecodeImageStage()._decode(encode_png(img), 8, 8)
        assert (px == img).all()


class TestKnnEmptyBatchStringIds:
    """ADVICE: empty-batch query_id column must carry the REAL Arrow type
    (an empty object-dtype numpy array infers null and breaks block
    schema unification)."""

    def test_empty_batch_string_qid_type(self):
        from mvt_wrangler_ray.stages.knn import BruteForceKnnStage

        stage = BruteForceKnnStage(
            queries=np.eye(2, 4), query_ids=np.array(["qa", "qb"]), k=1)
        empty = pa.table({
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
        })
        out = stage(empty)
        assert out.schema.field("query_id").type == pa.string()
        assert len(out) == 0
        # non-empty batch emits the same type → blocks unify
        full = pa.table({
            "vec_id": pa.array([7, 8], pa.int64()),
            "embedding": pa.array(
                [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]],
                pa.list_(pa.float32())),
        })
        assert stage(full).schema.field("query_id").type == pa.string()


class TestAsofGenericKeys:
    """ADVICE: asof_join_bucketed advertised a generic `by` column but
    int64-cast it (strings crashed, floats truncated)."""

    def _brute(self, lk, lt, rk, rt, rv):
        out = []
        for k, t in zip(lk, lt):
            best = None
            for k2, t2, v in zip(rk, rt, rv):
                if k2 == k and t2 <= t and (best is None or t2 > best[0]):
                    best = (t2, v)
            out.append(None if best is None else best[1])
        return out

    def test_string_keys(self, ray_session):
        import ray.data as rd

        from mvt_wrangler_ray.stages.joins import asof_join_bucketed

        rng = np.random.default_rng(5)
        keys = np.array(["alpha", "beta", "gamma"])
        lk = keys[rng.integers(0, 3, 40)]
        lt = rng.integers(0, 100, 40).astype(np.int64)
        rk = keys[rng.integers(0, 3, 25)]
        rt = rng.integers(0, 100, 25).astype(np.int64)
        rv = np.arange(25, dtype=np.int64) * 10
        left = pa.table({"k": pa.array(lk), "ts": pa.array(lt),
                         "row": pa.array(np.arange(40, dtype=np.int64))})
        right = pa.table({"k": pa.array(rk), "ts": pa.array(rt),
                          "val": pa.array(rv)})
        out = asof_join_bucketed(
            rd.from_arrow(left), rd.from_arrow(right), by="k", on="ts",
            right_cols=("val",)).to_pandas().sort_values("row")
        want = self._brute(lk, lt, rk, rt, rv)
        got = [None if v is None or (isinstance(v, float) and np.isnan(v))
               else int(v) for v in out["val_asof"]]
        assert got == want

    def test_float_keys_not_truncated(self, ray_session):
        import ray.data as rd

        from mvt_wrangler_ray.stages.joins import asof_join_bucketed

        # 1.25 and 1.75 both truncated to 1 under the old int64 cast
        left = pa.table({"k": pa.array([1.25, 1.75]),
                         "ts": pa.array([10, 10], pa.int64()),
                         "row": pa.array([0, 1], pa.int64())})
        right = pa.table({"k": pa.array([1.25, 1.75]),
                          "ts": pa.array([5, 6], pa.int64()),
                          "val": pa.array([100, 200], pa.int64())})
        out = asof_join_bucketed(
            rd.from_arrow(left), rd.from_arrow(right), by="k", on="ts",
            right_cols=("val",)).to_pandas().sort_values("row")
        assert out["val_asof"].tolist() == [100, 200]


class TestLossyRecodeFlagValidation:
    """ADVICE: --lossy-recode must reject steps that break the
    documented PSNR >= 40 dB invariant (worst case 20*log10(510/step))."""

    def test_step_over_5_rejected(self):
        from mvt_wrangler_ray.__main__ import main

        with pytest.raises(SystemExit):
            main(["images", "/tmp/nonexistent.parquet", "/tmp/out",
                  "--lossy-recode", "6"])


class TestSemiJoinNullKeyExactness:
    """ADVICE: nulls in the left int64 key column forced the whole
    group's keys into float64, colliding ids above 2^53."""

    def test_huge_ids_with_nulls_stay_exact(self, ray_session):
        import ray.data as rd

        from mvt_wrangler_ray.stages.shuffle import bucketed_key_semi_join

        base = (1 << 60) + 12345678901234
        # adjacent ids differing by 1 collide under float64
        lk = pa.array([base, base + 1, base + 2, None, base + 3],
                      pa.int64())
        left = pa.table({"id": lk,
                         "row": pa.array(np.arange(5, dtype=np.int64))})
        keys = pa.table({"id": pa.array([base + 1, base + 3], pa.int64())})
        semi = bucketed_key_semi_join(
            rd.from_arrow(left), rd.from_arrow(keys), key="id",
            num_buckets=4).to_pandas()
        assert sorted(semi["row"].tolist()) == [1, 4]
        anti = bucketed_key_semi_join(
            rd.from_arrow(left), rd.from_arrow(keys), key="id",
            num_buckets=4, anti=True).to_pandas()
        # null key matches nothing → anti KEEPS it
        assert sorted(anti["row"].tolist()) == [0, 2, 3]


class TestShingleCacheBounded:
    """VERDICT #7: verify-stage shingle memos must be bounded (LRU), and
    both verify plans must still produce identical pairs."""

    def test_lru_evicts(self):
        from mvt_wrangler_ray.stages.dedup import _LruMemo

        memo = _LruMemo(cap=3)
        made = []
        for key in [1, 2, 3, 1, 4, 5]:   # cap 3: inserting 4 evicts 2
            memo.get(key, lambda k=key: made.append(k) or {k})
        assert len(memo.d) == 3
        assert 2 not in memo.d and 1 in memo.d
        memo.get(2, lambda: {"remade"})  # recompute on miss, not crash
        assert len(memo.d) == 3

    def test_verify_plans_agree_under_tiny_cache(self, ray_session, monkeypatch):
        import ray.data as rd

        from mvt_wrangler_ray.stages import dedup

        # force constant eviction: every doc_set call beyond 2 distinct
        # docs recomputes — outputs must not change
        orig = dedup._LruMemo

        class Tiny(orig):
            def __init__(self, cap: int = 2):
                super().__init__(cap=2)

        monkeypatch.setattr(dedup, "_LruMemo", Tiny)
        docs = pa.table({
            "doc_id": pa.array(np.arange(30, dtype=np.int64)),
            "text": pa.array([f"common shingle text block {i % 5} tail"
                              for i in range(30)]),
        })
        ds = rd.from_arrow(docs)
        a = dedup.minhash_near_dups(ds, threshold=0.5, col="text",
                                    id_col="doc_id").reset_index(drop=True)
        b = dedup.minhash_near_dups(ds, threshold=0.5, col="text",
                                    id_col="doc_id",
                                    broadcast_pairs_limit=0
                                    ).reset_index(drop=True)
        assert a.equals(b)
        assert len(a) > 0
