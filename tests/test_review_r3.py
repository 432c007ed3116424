"""Round-3 self-review regression tests: the semi-join null-in-key-set
inversion, the embedding exact-mode bucket_cap default, and the
PmTilesWriter spool cleanup on abandoned writes."""

import glob
import os

import numpy as np
import pandas as pd
import pytest
import ray.data

from mvt_wrangler_ray.stages.dedup import (
    _BUCKET_CAP_UNSET, _resolve_bucket_cap)
from mvt_wrangler_ray.stages.shuffle import bucketed_key_semi_join


class TestSemiJoinNullKeySet:
    """pc.is_in returns TRUE for a null input when value_set contains a
    null — the key set must be null-free or null left keys silently
    match (semi keeps them, anti drops them: contract inversion)."""

    def _run(self, anti, ray_session=None):
        import pyarrow as pa
        left = ray.data.from_arrow(pa.table(
            {"k": pa.array([1, None, 3, 4], pa.int64()),
             "v": pa.array(["a", "b", "c", "d"])}))
        keys = ray.data.from_arrow(pa.table(
            {"k": pa.array([1, None], pa.int64())}))
        out = bucketed_key_semi_join(left, keys, "k", anti=anti,
                                     num_buckets=4).to_pandas()
        return sorted(out["v"])

    def test_semi_drops_null_left_keys(self, ray_session):
        assert self._run(anti=False) == ["a"]

    def test_anti_keeps_null_left_keys(self, ray_session):
        assert self._run(anti=True) == ["b", "c", "d"]


class TestEmbeddingBucketCapDefault:
    def test_lsh_mode_defaults_on(self):
        assert _resolve_bucket_cap(8, _BUCKET_CAP_UNSET) == 10_000

    def test_exact_mode_defaults_off(self):
        # nbits=0 puts EVERY row in one bucket; a silent default cap
        # would return zero pairs for >10k inputs
        assert _resolve_bucket_cap(0, _BUCKET_CAP_UNSET) is None

    def test_explicit_value_wins_either_way(self):
        assert _resolve_bucket_cap(0, 7) == 7
        assert _resolve_bucket_cap(8, None) is None


class TestWriterSpoolCleanup:
    def _spools(self, d):
        return glob.glob(os.path.join(d, ".pmtiles-data-*"))

    def test_abandoned_writer_close_removes_spool(self, tmp_path):
        from mvt_wrangler_ray.sources.pmtiles import PmTilesWriter
        out = str(tmp_path / "x.pmtiles")
        w = PmTilesWriter(out)
        w.add_tile(5, b"data")
        with pytest.raises(ValueError):
            w.add_tile(3, b"out-of-order")
        assert len(self._spools(str(tmp_path))) == 1
        w.close()
        assert self._spools(str(tmp_path)) == []
        w.close()  # idempotent

    def test_context_manager_cleans_on_error(self, tmp_path):
        from mvt_wrangler_ray.sources.pmtiles import PmTilesWriter
        with pytest.raises(RuntimeError):
            with PmTilesWriter(str(tmp_path / "y.pmtiles")) as w:
                w.add_tile(1, b"t")
                raise RuntimeError("upstream died")
        assert self._spools(str(tmp_path)) == []

    def test_finalize_still_writes_and_cleans(self, tmp_path):
        from mvt_wrangler_ray.sources.pmtiles import (
            PmTilesReader, PmTilesWriter)
        out = str(tmp_path / "z.pmtiles")
        with PmTilesWriter(out) as w:
            w.add_tile(0, b"hello")
            w.add_tile(9, b"hello")
            w.finalize()
        assert self._spools(str(tmp_path)) == []
        r = PmTilesReader(out)
        assert r.header.addressed_tiles == 2
