"""Benchmark harness (driver-run per round; see BASELINE.md protocol).

Plain run: prints ONE JSON line
    {"metric": ..., "value": sec, "unit": "sec", "queries": {...},
     "sf": ..., "num_cpus": N, "rows": ..., "tiles_per_sec": ...}

--scaling: runs the headline pipeline twice in FRESH processes at
RAY_GRAFT_CPUS=8 and =32 on identical input and reports both throughputs
plus efficiency = (t_8 / t_32) / 4 (1.0 = linear). This evidences the
north rule's N→4N criterion in a single-node sandbox.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
HEADLINE_IMAGES = int(os.environ.get("GRAFT_BENCH_IMAGES", "4000000"))


def _init_ray():
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # Ray's sort emits empty partitions for key ranges with no rows and
    # warns about their empty schema — harmless, silence the logger
    import logging

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).setLevel(logging.ERROR)


def synth_images_ds(n: int, block_rows: int = 25_000):
    """Distributed deterministic synthesis: each block regenerates its id
    range independently (no driver materialization, no external data)."""
    import pyarrow as pa
    import ray.data as rd

    from mvt_wrangler_ray.sources.images import synth_images_table

    nblocks = (n + block_rows - 1) // block_rows
    # one input block per id range → one generator task per block (a
    # single-block from_items would serialize the whole fused chain)
    ds = rd.range(nblocks, override_num_blocks=nblocks)

    def gen(batch) -> pa.Table:
        out = []
        for i in batch["id"].to_pylist():
            start = int(i) * block_rows
            out.append(synth_images_table(min(block_rows, n - start), start=start))
        return pa.concat_tables(out)

    return ds.map_batches(gen, batch_format="pyarrow")


def materialized_images(n: int) -> str:
    """Synthesize the images table to parquet ONCE per (n), cached in
    /tmp across processes — the benchmark then measures the ENGINE
    (read → assign → join → aggregate), not the data generator. The
    cache is deterministic, so the 8- and 32-CPU scaling runs read
    identical bytes."""
    import os

    path = f"/tmp/mwr_bench_images_{n}"
    marker = os.path.join(path, "_complete")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        synth_images_ds(n).write_parquet(path)
        open(marker, "w").close()
    return path


def run_headline() -> dict:
    import ray.data as rd

    from __ray_entry__ import FILTERS_GEOJSON
    from mvt_wrangler_ray.config import EngineConfig
    from mvt_wrangler_ray.pipelines.wrangle import wrangle_counts

    cfg = EngineConfig(zoom=12, filter_concurrency=(2, max(2, NUM_CPUS // 2)),
                       batch_size=25_000)
    path = materialized_images(HEADLINE_IMAGES)

    # untimed warmup: (a) full input scan so the page cache is warm for
    # EVERY parallelism level equally; (b) the full pipeline at 1/10
    # scale to start workers and exercise every stage + the shuffle —
    # the timed run then measures compute + shuffle, not process spawn
    # or cold reads (BASELINE.md protocol)
    nblocks = max(32, HEADLINE_IMAGES // 25_000)
    rd.read_parquet(path).count()
    wrangle_counts(
        rd.read_parquet(path, override_num_blocks=nblocks)
        .limit(max(HEADLINE_IMAGES // 10, 50_000)),
        cfg, filter_geojson=FILTERS_GEOJSON).count()

    # min of 3 timed runs: this sandbox VM's wall times drift up to ~2x
    # under host steal with identical code (BASELINE.md caveat); the
    # minimum is the standard estimator for the machine's true capability
    sec = float("inf")
    n_tiles = 0
    for _ in range(3):
        t0 = time.perf_counter()
        # identical block structure at every parallelism level: the
        # scaling comparison must vary ONLY the CPU slots, not the plan
        # granularity
        ds = rd.read_parquet(path, override_num_blocks=nblocks)
        out = wrangle_counts(ds, cfg, filter_geojson=FILTERS_GEOJSON)
        n_tiles = out.count()
        sec = min(sec, time.perf_counter() - t0)
    return {"sec": sec, "rows": HEADLINE_IMAGES, "tiles": n_tiles,
            "rows_per_sec": HEADLINE_IMAGES / sec,
            "tiles_per_sec": n_tiles / sec}


# every registered query is benched (VERDICT r1 #10: per-query timings
# for ALL queries so regressions are visible per pipeline); the driver
# tables are small enough at sf0.1 that full coverage is cheap
BENCH_QUERIES = None  # None → all of __ray_entry__.queries()

REFERENCE_FIXTURE = "/root/reference/tests/fixtures/input.pmtiles"


def run_archive_bench() -> dict:
    """The reference's own workload: rewrite its 1,446-tile fixture
    archive (identity + fixture-shaped filter), warm."""
    import json as _json
    import os as _os

    if not _os.path.exists(REFERENCE_FIXTURE):
        return {}
    from mvt_wrangler_ray.config import EngineConfig
    from mvt_wrangler_ray.fixtures import FEATURE_FILTERS
    from mvt_wrangler_ray.pipelines.archive import wrangle_pmtiles

    wrangle_pmtiles(REFERENCE_FIXTURE, "/tmp/bench_warm.pmtiles", None,
                    EngineConfig())  # warm
    t0 = time.perf_counter()
    s = wrangle_pmtiles(REFERENCE_FIXTURE, "/tmp/bench_id.pmtiles", None,
                        EngineConfig())
    ident = time.perf_counter() - t0
    t0 = time.perf_counter()
    wrangle_pmtiles(REFERENCE_FIXTURE, "/tmp/bench_f.pmtiles",
                    _json.dumps(FEATURE_FILTERS), EngineConfig())
    filt = time.perf_counter() - t0
    return {"pmtiles_identity_sec": round(ident, 3),
            "pmtiles_filtered_sec": round(filt, 3),
            "pmtiles_tiles_per_sec": round(s["tiles_written"] / ident, 1)}


def run_queries() -> dict:
    import pandas as pd

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    names = sorted(qs) if BENCH_QUERIES is None else BENCH_QUERIES
    # untimed warmup at the smallest sf: warms worker imports, actor pools
    # and the OS page cache so timed numbers measure compute + shuffle
    for name in names:
        try:
            res = qs[name]("/root/testdata/sf0.001")
            if hasattr(res, "count") and not isinstance(res, pd.DataFrame):
                res.count()
        except Exception:
            pass
    times = {}
    for name in names:
        t0 = time.perf_counter()
        res = qs[name](SF_DIR)
        # consume: Datasets stream to completion; DataFrames are done
        if hasattr(res, "count") and not isinstance(res, pd.DataFrame):
            res.count()
        times[name] = round(time.perf_counter() - t0, 3)
    return times


def main(headline_only: bool = False):
    _init_ray()
    import ray

    head = run_headline()
    if headline_only:
        print(json.dumps({
            "metric": "wrangle_images_e2e_sec", "value": round(head["sec"], 3),
            "unit": "sec", "num_cpus": NUM_CPUS, "rows": head["rows"],
            "rows_per_sec": round(head["rows_per_sec"], 1),
            "tiles_per_sec": round(head["tiles_per_sec"], 1),
        }))
        ray.shutdown()
        return
    queries = run_queries()
    queries.update(run_archive_bench())
    print(json.dumps({
        "metric": "wrangle_images_e2e_sec",
        "value": round(head["sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "rows": head["rows"],
        "tiles": head["tiles"],
        "rows_per_sec": round(head["rows_per_sec"], 1),
        "tiles_per_sec": round(head["tiles_per_sec"], 1),
    }))
    ray.shutdown()


def scaling():
    # generate (and page-cache) the shared input before either timed
    # subprocess so neither pays the one-time write or a cold read
    _init_ray()
    materialized_images(HEADLINE_IMAGES)
    import ray

    ray.shutdown()

    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, __file__, "--headline-only"],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        # two full subprocess runs per level, keep the faster: host-steal
        # noise on this sandbox is one-sided (it only slows runs), so the
        # per-level minimum is the right estimator for the ratio
        a, b = run_once(ncpu), run_once(ncpu)
        return a if a["value"] <= b["value"] else b

    lo, mid, hi = run(8), run(16), run(32)
    eff_4x = (lo["value"] / hi["value"]) / (32 / 8)
    eff_2x = (mid["value"] / hi["value"]) / (32 / 16)
    print(json.dumps({
        "sec_8": lo["value"], "sec_16": mid["value"], "sec_32": hi["value"],
        "rows_per_sec_8": lo["rows_per_sec"],
        "rows_per_sec_16": mid["rows_per_sec"],
        "rows_per_sec_32": hi["rows_per_sec"],
        "tiles_per_sec_8": lo["tiles_per_sec"],
        "tiles_per_sec_32": hi["tiles_per_sec"],
        # N→4N (8→32): superlinear — at 8 slots the streaming executor
        # cannot run all pipeline operators concurrently (wave stalls),
        # so the small "cluster" underperforms linearly-scaled-down.
        # N→2N (16→32) is the cleaner efficiency signal.
        "scaling_efficiency": round(eff_4x, 3),
        "scaling_efficiency_16_32": round(eff_2x, 3),
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main(headline_only="--headline-only" in sys.argv)
