"""Per-partition lineage + resumable, range-partitioned output.

North-rule requirement: "every partition writes lineage records and
counters so a killed run resumes from the last per-partition checkpoint
without recomputing completed tile ranges."

The reference has NO resume (it deletes the output up front,
lib.rs:41-43, and any error aborts the whole job, processing.rs:123-125)
— this is explicit engine design per SURVEY §4.

Layout:
    out/
      part=00000/data.parquet         one directory per key range
      part=00001/data.parquet
      _lineage/part-00000.json        written AFTER the partition's data
      _lineage/part-00001.json          (atomic rename) — its existence IS
      _metadata.json                    the checkpoint marker

A lineage record carries: partition id, key range [lo, hi), row count,
content hash (order-insensitive xor of row hashes), wall time, engine
version. `resume_plan(out_dir, partitions)` diffs the manifest against
completed lineage records and returns only the partitions still to run —
the driver re-submits those; finished ranges are never recomputed.

Partitioning is BY KEY RANGE (tile_id / cell prefix), so each output
shard is a contiguous spatial range (the reference's Hilbert-sorted
archive order, processing.rs:38) and a resumed run redoes only the
missing ranges.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass
from typing import Callable, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..stages.shuffle import stable_hash_columns

ENGINE_VERSION = "0.1.0"


@dataclass
class LineageRecord:
    partition: int
    key_lo: int
    key_hi: int          # exclusive
    rows: int
    content_hash: str    # order-insensitive
    wall_sec: float
    engine_version: str = ENGINE_VERSION
    config_hash: str = ""  # fingerprint of the producing pipeline config


def config_fingerprint(*parts) -> str:
    """Stable hash of a pipeline's configuration (dataclasses, dicts,
    strings, numbers). Recorded per partition so resume can tell "this
    range was computed under the SAME filter/config" — a marker produced
    by a different config must be recomputed, not trusted."""
    import dataclasses
    import hashlib as _hl

    def norm(p):
        if dataclasses.is_dataclass(p) and not isinstance(p, type):
            return {"__dc__": type(p).__name__,
                    **{k: norm(v) for k, v in dataclasses.asdict(p).items()}}
        if isinstance(p, dict):
            return {str(k): norm(v) for k, v in sorted(p.items())}
        if isinstance(p, (list, tuple)):
            return [norm(v) for v in p]
        if isinstance(p, bytes):
            return p.hex()
        return p

    blob = json.dumps([norm(p) for p in parts], sort_keys=True,
                      default=str).encode()
    return _hl.md5(blob).hexdigest()[:16]


def _content_hash(table: pa.Table, key: str) -> str:
    """Order-insensitive: xor of per-row stable hashes over all columns'
    key column + row count. Cheap and deterministic."""
    if len(table) == 0:
        return "0"
    h = stable_hash_columns(table, [key])
    acc = np.bitwise_xor.reduce(h)
    return f"{int(acc):016x}"


def partition_bounds(key_min: int, key_max: int, num_partitions: int) -> List[tuple]:
    """Contiguous key ranges [(lo, hi), ...] covering [key_min, key_max]."""
    edges = np.linspace(key_min, key_max + 1, num_partitions + 1).astype(np.int64)
    return [(int(edges[i]), int(edges[i + 1])) for i in range(num_partitions)
            if edges[i] < edges[i + 1]]


class LineageWriter:
    """Writes one partition atomically: data to a temp file → rename →
    lineage record last. A partition with a lineage record is complete."""

    def __init__(self, out_dir: str, key: str = "tile_id", sort_within: bool = True,
                 config_hash: str = ""):
        self.out_dir = out_dir
        self.key = key
        self.sort_within = sort_within
        self.config_hash = config_hash
        os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)

    def partition_done(self, pid: int) -> bool:
        return os.path.exists(self._lineage_path(pid))

    def _lineage_path(self, pid: int) -> str:
        return os.path.join(self.out_dir, "_lineage", f"part-{pid:05d}.json")

    def write_partition(self, pid: int, lo: int, hi: int, table: pa.Table) -> LineageRecord:
        t0 = time.perf_counter()
        if self.sort_within and len(table):
            order = pa.compute.sort_indices(table, sort_keys=[(self.key, "ascending")])
            table = table.take(order)
        pdir = os.path.join(self.out_dir, f"part={pid:05d}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".data.parquet.tmp")
        dst = os.path.join(pdir, "data.parquet")
        pq.write_table(table, tmp)
        os.replace(tmp, dst)                      # atomic within the fs
        rec = LineageRecord(
            partition=pid, key_lo=lo, key_hi=hi, rows=len(table),
            content_hash=_content_hash(table, self.key),
            wall_sec=round(time.perf_counter() - t0, 4),
            config_hash=self.config_hash)
        ltmp = self._lineage_path(pid) + ".tmp"
        with open(ltmp, "w") as f:
            json.dump(asdict(rec), f)
        os.replace(ltmp, self._lineage_path(pid))  # marker written LAST
        return rec

    def finalize(self, metadata: Optional[dict] = None):
        recs = self.read_lineage()
        meta = {
            "engine_version": ENGINE_VERSION,
            "key": self.key,
            "config_hash": self.config_hash,
            "partitions": len(recs),
            "total_rows": sum(r["rows"] for r in recs),
            "metadata": metadata or {},
        }
        tmp = os.path.join(self.out_dir, "_metadata.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, os.path.join(self.out_dir, "_metadata.json"))

    def read_lineage(self) -> List[dict]:
        ldir = os.path.join(self.out_dir, "_lineage")
        out = []
        for name in sorted(os.listdir(ldir)):
            if name.endswith(".json"):
                with open(os.path.join(ldir, name)) as f:
                    out.append(json.load(f))
        return out


def resume_plan(out_dir: str, bounds: Sequence[tuple], key: str = "tile_id",
                config_hash: str = ""):
    """Partitions still to compute: manifest minus completed lineage.

    A marker alone is NOT trusted: the recorded (key_lo, key_hi) must equal
    the current plan's range for that partition, AND the recorded
    config_hash must equal the current pipeline's. Resuming with a
    different num_partitions / key range / filter / config would
    otherwise silently keep partitions computed under the OLD plan,
    corrupting the output — such partitions are recomputed (with a
    warning) instead."""
    import warnings

    w = LineageWriter(out_dir, key)
    todo = []
    for pid, (lo, hi) in enumerate(bounds):
        if w.partition_done(pid):
            try:
                with open(w._lineage_path(pid)) as f:
                    rec = json.load(f)
                if (int(rec["key_lo"]) == lo and int(rec["key_hi"]) == hi
                        and rec.get("config_hash", "") == config_hash):
                    continue  # genuinely complete for THIS plan+config
                if int(rec["key_lo"]) == lo and int(rec["key_hi"]) == hi:
                    # a caller that supplies NO fingerprint ("") opted
                    # out of config tracking: the recompute is the
                    # expected conservative behavior, not a surprise —
                    # warn only when a real current hash mismatches
                    if config_hash:
                        warnings.warn(
                            f"lineage part {pid}: recorded config_hash "
                            f"{rec.get('config_hash', '')!r} != current "
                            f"{config_hash!r} — recomputing")
                else:
                    warnings.warn(
                        f"lineage part {pid}: recorded range "
                        f"[{rec['key_lo']}, {rec['key_hi']}) != current "
                        f"[{lo}, {hi}) — recomputing")
            except (OSError, ValueError, KeyError, TypeError):
                warnings.warn(f"lineage part {pid}: unreadable record — recomputing")
        todo.append((pid, lo, hi))
    _drop_stale_partitions(out_dir, len(bounds), w)
    return todo


def _drop_stale_partitions(out_dir: str, n_bounds: int, w: "LineageWriter"):
    """Remove part dirs / lineage records with pid >= the CURRENT plan's
    partition count: a rerun with fewer partitions would otherwise leave
    the old high-numbered partitions on disk — finalize() would count
    them and a reader unioning part=* would see their rows DUPLICATED
    inside the recomputed wider ranges."""
    import re
    import shutil
    import warnings

    pat = re.compile(r"^part=(\d+)$")
    for name in sorted(os.listdir(out_dir)):
        m = pat.match(name)
        if m and int(m.group(1)) >= n_bounds:
            warnings.warn(
                f"removing stale partition {name} from a previous plan "
                f"with more than {n_bounds} partitions")
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
            lp = w._lineage_path(int(m.group(1)))
            if os.path.exists(lp):
                os.remove(lp)


def write_partitioned(ds, out_dir: str, key: str = "tile_id",
                      num_partitions: int = 16,
                      key_min: Optional[int] = None,
                      key_max: Optional[int] = None,
                      metadata: Optional[dict] = None,
                      resume: bool = True,
                      config_hash: str = "") -> List[dict]:
    """Range-partitioned resumable sink for a keyed Dataset.

    Each range partition is one Ray task: filter its key range (predicate
    applied per batch — streaming, no global sort barrier), sort within
    the shard, write atomically, record lineage. On resume, completed
    partitions are skipped ENTIRELY (their filter tasks never launch).

    Deliberately not a single global ds.sort: per-range sorted shards +
    the ordered directory manifest give the reference's ascending-tile_id
    output order (processing.rs:38) without an all-to-all sort barrier.
    """
    import ray

    if key_min is None or key_max is None:
        import pyarrow.compute as pc
        lohi = ds.map_batches(
            lambda b: pa.table({
                "lo": pa.array([pc.min(b[key]).as_py()], pa.int64()),
                "hi": pa.array([pc.max(b[key]).as_py()], pa.int64())}),
            batch_format="pyarrow").to_pandas().dropna()
        if len(lohi) == 0:
            # empty (or all-null-key) dataset: degenerate bounds still
            # produce a finalized, resumable EMPTY output instead of
            # int(NaN) blowing up
            key_min = 0 if key_min is None else key_min
            key_max = 0 if key_max is None else key_max
        else:
            key_min = int(lohi["lo"].min()) if key_min is None else key_min
            key_max = int(lohi["hi"].max()) if key_max is None else key_max

    bounds = partition_bounds(key_min, key_max, num_partitions)
    writer = LineageWriter(out_dir, key, config_hash=config_hash)
    if resume:
        todo = resume_plan(out_dir, bounds, key, config_hash=config_hash)
    else:
        todo = [(pid, lo, hi) for pid, (lo, hi) in enumerate(bounds)]
        _drop_stale_partitions(out_dir, len(bounds), writer)

    def _run_meta():
        meta = dict(metadata or {})
        meta["run"] = {
            "partitions_written_this_run": len(todo),
            "partitions_skipped_resume": len(bounds) - len(todo),
            "key_min": int(key_min),
            "key_max": int(key_max),
        }
        return meta

    if not todo:
        writer.finalize(_run_meta())
        return writer.read_lineage()

    todo_pids = np.array(sorted(pid for pid, _, _ in todo), dtype=np.int64)
    edges = np.array([lo for lo, _ in bounds] + [bounds[-1][1]], dtype=np.int64)
    bounds_arr = bounds

    def route(batch: pa.Table) -> pa.Table:
        """Map side: assign each row its range-partition id; rows of
        already-completed partitions are DROPPED here (resume skip), so
        they never enter the shuffle."""
        k = batch[key].to_numpy(zero_copy_only=False)
        pid = np.clip(np.searchsorted(edges, k, side="right") - 1,
                      0, len(bounds_arr) - 1).astype(np.int64)
        keep = np.isin(pid, todo_pids)
        out = batch.append_column("_part_id", pa.array(pid, pa.int64()))
        return out.filter(pa.array(keep))

    def write_group(g: pa.Table) -> pa.Table:
        pid = int(g["_part_id"][0].as_py())
        lo, hi = bounds_arr[pid]
        w = LineageWriter(out_dir, key, config_hash=config_hash)
        rec = w.write_partition(pid, lo, hi, g.drop_columns(["_part_id"]))
        return pa.table({"partition": pa.array([rec.partition], pa.int64()),
                         "rows": pa.array([rec.rows], pa.int64())})

    # one shuffle: each row moves once to its partition writer
    (ds.map_batches(route, batch_format="pyarrow")
       .groupby("_part_id")
       .map_groups(write_group, batch_format="pyarrow")
       .count())

    # empty partitions in the todo list still need a (zero-row) record so
    # resume can tell "done, empty" from "never ran"
    schema = None
    for pid, lo, hi in todo:
        if not writer.partition_done(pid):
            if schema is None:
                schema = _dataset_schema(ds)
            writer.write_partition(pid, lo, hi, schema.empty_table()
                                   if schema else pa.table({}))
    writer.finalize(_run_meta())
    return writer.read_lineage()


def _dataset_schema(ds):
    try:
        s = ds.schema()
        return pa.schema([(n, t) for n, t in zip(s.names, s.types)])
    except Exception:
        return None
