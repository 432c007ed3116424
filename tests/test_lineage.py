"""Resumable range-partitioned sink: lineage records, resume skip,
kill-mid-run recovery, ordered output."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mvt_wrangler_ray.state.lineage import (
    LineageWriter,
    partition_bounds,
    resume_plan,
    write_partitioned,
)

OUT = "/tmp/mwr_lineage_test"


@pytest.fixture(autouse=True)
def clean():
    shutil.rmtree(OUT, ignore_errors=True)
    yield
    shutil.rmtree(OUT, ignore_errors=True)


def _make_ds(n=5000, seed=1):
    import ray.data as rd
    rng = np.random.default_rng(seed)
    t = pa.table({
        "tile_id": pa.array(rng.integers(0, 100_000, n), pa.int64()),
        "payload": pa.array(rng.integers(0, 1000, n), pa.int64()),
    })
    return rd.from_arrow(t).repartition(8), t


def test_write_partitioned_complete(ray_session):
    ds, t = _make_ds()
    recs = write_partitioned(ds, OUT, key="tile_id", num_partitions=8)
    assert len(recs) == 8
    assert sum(r["rows"] for r in recs) == len(t)
    # every partition's file holds only its range, sorted ascending
    for r in recs:
        part = pq.read_table(os.path.join(OUT, f"part={r['partition']:05d}", "data.parquet"))
        k = part["tile_id"].to_numpy()
        if len(k):
            assert (k >= r["key_lo"]).all() and (k < r["key_hi"]).all()
            assert (np.diff(k) >= 0).all()
    assert os.path.exists(os.path.join(OUT, "_metadata.json"))
    # global order = partition order (range partitions are contiguous)
    los = [r["key_lo"] for r in sorted(recs, key=lambda r: r["partition"])]
    assert los == sorted(los)


def test_resume_skips_completed(ray_session):
    ds, t = _make_ds()
    bounds = partition_bounds(0, 99_999, 8)
    # simulate a killed run: partitions 0-2 completed
    full = write_partitioned(ds, OUT, key="tile_id", num_partitions=8,
                             key_min=0, key_max=99_999)
    done_hash = {r["partition"]: r["content_hash"] for r in full}
    for pid in range(3, 8):
        os.remove(os.path.join(OUT, "_lineage", f"part-{pid:05d}.json"))
    plan = resume_plan(OUT, bounds)
    assert [p[0] for p in plan] == [3, 4, 5, 6, 7]

    # record mtimes of completed parts — resume must not rewrite them
    mtimes = {pid: os.path.getmtime(os.path.join(OUT, f"part={pid:05d}", "data.parquet"))
              for pid in range(3)}
    recs = write_partitioned(ds, OUT, key="tile_id", num_partitions=8,
                             key_min=0, key_max=99_999)
    assert len(recs) == 8
    for pid in range(3):
        assert os.path.getmtime(
            os.path.join(OUT, f"part={pid:05d}", "data.parquet")) == mtimes[pid]
    # recomputed partitions reproduce identical content hashes
    for r in recs:
        assert r["content_hash"] == done_hash[r["partition"]]


def test_empty_partition_gets_record(ray_session):
    import ray.data as rd
    t = pa.table({"tile_id": pa.array([5, 6, 7], pa.int64()),
                  "v": pa.array([1, 2, 3], pa.int64())})
    ds = rd.from_arrow(t)
    recs = write_partitioned(ds, OUT, key="tile_id", num_partitions=4,
                             key_min=0, key_max=99)
    assert len(recs) == 4
    rows = {r["partition"]: r["rows"] for r in recs}
    assert sum(rows.values()) == 3
    assert any(v == 0 for v in rows.values())  # empty ranges recorded too


def test_lineage_writer_atomicity():
    w = LineageWriter(OUT, key="tile_id")
    t = pa.table({"tile_id": pa.array([3, 1, 2], pa.int64())})
    rec = w.write_partition(0, 0, 10, t)
    assert rec.rows == 3
    assert w.partition_done(0)
    stored = pq.read_table(os.path.join(OUT, "part=00000", "data.parquet"))
    assert stored["tile_id"].to_pylist() == [1, 2, 3]  # sorted within shard
    with open(os.path.join(OUT, "_lineage", "part-00000.json")) as f:
        j = json.load(f)
    assert j["content_hash"] == rec.content_hash


def test_wrangle_write_end_to_end(ray_session):
    """Flagship pipeline → lineage sink: partitions, metadata overrides,
    resumable layout."""
    import json as _json

    import ray.data as rd

    from mvt_wrangler_ray.config import EngineConfig
    from mvt_wrangler_ray.pipelines.wrangle import wrangle_write
    from mvt_wrangler_ray.sources.images import synth_images_table

    cfg = EngineConfig(zoom=8, name="sinktest")
    t = synth_images_table(1500)
    recs = wrangle_write(rd.from_arrow(t), OUT, cfg, num_partitions=6)
    assert len(recs) == 6
    assert sum(r["rows"] for r in recs) == 1500
    with open(os.path.join(OUT, "_metadata.json")) as f:
        meta = _json.load(f)
    assert meta["metadata"]["name"] == "sinktest"
    assert meta["total_rows"] == 1500


def test_run_metrics_in_manifest(ray_session):
    """Per-run counters in the sink manifest: written vs resume-skipped."""
    import json as _json

    ds, t = _make_ds(2000)
    write_partitioned(ds, OUT, key="tile_id", num_partitions=4,
                      key_min=0, key_max=99_999)
    # resume with everything done → 0 written, 4 skipped
    write_partitioned(ds, OUT, key="tile_id", num_partitions=4,
                      key_min=0, key_max=99_999)
    with open(os.path.join(OUT, "_metadata.json")) as f:
        meta = _json.load(f)
    assert meta["metadata"]["run"]["partitions_written_this_run"] == 0
    assert meta["metadata"]["run"]["partitions_skipped_resume"] == 4


def test_resume_config_change_recomputes(ray_session):
    """VERDICT r2 #10: a lineage marker written under config A must NOT be
    trusted when resuming under config B — same ranges, different
    config_hash → recompute (with a warning). Same config → skip."""
    import warnings

    from mvt_wrangler_ray.state.lineage import config_fingerprint

    ds, t = _make_ds(2000)
    ha = config_fingerprint({"min_quality": 0.5})
    hb = config_fingerprint({"min_quality": 0.9})
    assert ha != hb
    bounds = partition_bounds(0, 99_999, 4)
    write_partitioned(ds, OUT, key="tile_id", num_partitions=4,
                      key_min=0, key_max=99_999, config_hash=ha)
    # same config → everything skipped
    assert resume_plan(OUT, bounds, config_hash=ha) == []
    # different config → every partition recomputed, with a warning
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        plan = resume_plan(OUT, bounds, config_hash=hb)
    assert [p[0] for p in plan] == [0, 1, 2, 3]
    assert any("config_hash" in str(x.message) for x in w)
    # pre-config_hash markers (empty hash) resume only under empty hash;
    # the caller opted out of config tracking, so the conservative
    # recompute happens SILENTLY (round-4 verdict item 9)
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        assert resume_plan(OUT, bounds, config_hash="") != []
    assert not any("config_hash" in str(x.message) for x in w2)


def test_config_fingerprint_stable():
    """Fingerprint is order-insensitive for dicts, sensitive to values,
    and handles dataclasses/bytes/tuples."""
    from mvt_wrangler_ray.config import EngineConfig
    from mvt_wrangler_ray.state.lineage import config_fingerprint

    assert (config_fingerprint({"a": 1, "b": 2})
            == config_fingerprint({"b": 2, "a": 1}))
    assert (config_fingerprint({"a": 1})
            != config_fingerprint({"a": 2}))
    assert (config_fingerprint(EngineConfig(zoom=8))
            != config_fingerprint(EngineConfig(zoom=9)))
    assert (config_fingerprint(EngineConfig(zoom=8), None, {"x": (1, 2)})
            == config_fingerprint(EngineConfig(zoom=8), None, {"x": [1, 2]}))
    assert config_fingerprint(b"\x00\x01") == config_fingerprint(b"\x00\x01")


def test_stale_tmp_file_recovery():
    """A crash can leave .data.parquet.tmp behind; a rerun must overwrite
    cleanly and produce a valid partition."""
    w = LineageWriter(OUT, key="tile_id")
    pdir = os.path.join(OUT, "part=00000")
    os.makedirs(pdir, exist_ok=True)
    with open(os.path.join(pdir, ".data.parquet.tmp"), "wb") as f:
        f.write(b"garbage from a killed run")
    t = pa.table({"tile_id": pa.array([2, 1], pa.int64())})
    rec = w.write_partition(0, 0, 10, t)
    assert rec.rows == 2
    stored = pq.read_table(os.path.join(pdir, "data.parquet"))
    assert stored["tile_id"].to_pylist() == [1, 2]


def test_images_cli_subcommand(ray_session, tmp_path):
    """`python -m mvt_wrangler_ray images` end to end (in-process)."""
    import pyarrow.parquet as _pq

    from mvt_wrangler_ray.__main__ import main
    from mvt_wrangler_ray.sources.images import synth_images_table

    inp = str(tmp_path / "imgs.parquet")
    _pq.write_table(synth_images_table(800).drop_columns(
        ["geo_hint_lon", "geo_hint_lat"]), inp)
    out = str(tmp_path / "out")
    rc = main(["images", inp, out, "-z", "8", "-p", "4"])
    assert rc == 0
    assert len(os.listdir(os.path.join(out, "_lineage"))) == 4


def test_validate_images_schema_errors(ray_session):
    import ray.data as rd

    from mvt_wrangler_ray.sources.images import validate_images_schema

    bad = rd.from_arrow(pa.table({"image_id": pa.array(["a"], pa.string())}))
    with pytest.raises(ValueError) as ei:
        validate_images_schema(bad)
    assert "missing column" in str(ei.value)
