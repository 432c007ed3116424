"""The flagship pipeline — the Ray-Data re-expression of the reference's
`run` lifecycle (/root/reference/src/lib.rs:39-99 + processing.rs:18-129):

    read images table
      → map_batches(geotag)                  (stateless, vectorized)
      → map_batches(cell_encode)             (stateless: hex/S2/prefix)
      → map_batches(tile_assign)             (stateless: z/x/y, tile_id, quadkey)
      → map_batches(FilterJoinStage, actor pool)
                                             (broadcast spatial join + expr filter)
      → either: salted two-phase per-tile aggregate (headline metric)
         or:    groupby(tile_id).map_groups(encode_tile_group) tile blobs
      → sort(tile_id) → range-partitioned parquet + lineage

Everything before the sink is a streaming, backpressured Dataset plan —
no driver-side materialization; the only all-to-all exchange is the
per-tile grouping (SURVEY §2.6 A1), which operates on pre-reduced
partials for the aggregate path.
"""

from __future__ import annotations

from typing import Optional

import ray.data as rd

from ..config import EngineConfig
from ..stages.filter_join import FilterJoinStage
from ..stages.geospatial import (
    cell_encode_batch,
    geotag_batch,
    pyramid_assign_batch,
    tile_assign_batch,
)
from ..stages.tile_encode import encode_tile_group, tile_counts_two_phase


def assign_stage(ds: rd.Dataset, cfg: EngineConfig, pyramid: bool = False) -> rd.Dataset:
    """geotag → cells → tile-assign as ONE map_batches stage.

    The three kernels are stateless vector transforms over the same
    batch; composing them in-process avoids two inter-operator rebatch /
    object-store hops (measured 3-4× on the assignment path). No
    batch_size override: the incoming block size (source blocks /
    target_max_block_size) is already right, and forcing an exact size
    makes Ray buffer-and-copy at every stage boundary."""
    assign = pyramid_assign_batch if pyramid else tile_assign_batch

    def fused(b):
        return assign(cell_encode_batch(geotag_batch(b, cfg), cfg), cfg)

    return ds.map_batches(fused, batch_format="pyarrow")


def filter_stage(ds: rd.Dataset, cfg: EngineConfig, filter_geojson,
                 mode: str = "tasks") -> rd.Dataset:
    """Broadcast spatial join + expression filter.

    mode="tasks" (default): compile once on the driver, `ray.put`
    broadcast, stateless elastic tasks with a per-worker cache — no pool
    startup, near-linear scaling (see stages.filter_join.make_task_filter).
    mode="actors": FilterJoinStage actor pool — state built once per
    actor; the right plan when the mask set itself is huge."""
    if mode == "actors":
        return ds.map_batches(
            FilterJoinStage,
            fn_constructor_kwargs={"filter_geojson": filter_geojson, "cfg": cfg},
            batch_format="pyarrow",
            concurrency=cfg.filter_concurrency,
            num_cpus=1,
        )
    from ..stages.filter_join import make_task_filter

    return ds.map_batches(make_task_filter(filter_geojson, cfg),
                          batch_format="pyarrow")


def wrangle(ds: rd.Dataset, cfg: Optional[EngineConfig] = None,
            filter_geojson=None, pyramid: bool = False) -> rd.Dataset:
    """Assignment + spatial join, row-level output (still streaming)."""
    cfg = cfg or EngineConfig()
    ds = assign_stage(ds, cfg, pyramid=pyramid)
    if filter_geojson is not None:
        ds = filter_stage(ds, cfg, filter_geojson)
    return ds

def wrangle_counts(ds: rd.Dataset, cfg: Optional[EngineConfig] = None,
                   filter_geojson=None, pyramid: bool = False) -> rd.Dataset:
    """Headline: per-tile image counts via the salted two-phase aggregate
    (map-side combine → small shuffle)."""
    cfg = cfg or EngineConfig()
    return tile_counts_two_phase(wrangle(ds, cfg, filter_geojson, pyramid))


def wrangle_write(ds: rd.Dataset, out_dir: str,
                  cfg: Optional[EngineConfig] = None,
                  filter_geojson=None, num_partitions: int = 16,
                  resume: bool = True, config_extra=None):
    """Flagship rows → resumable range-partitioned parquet sink with
    per-partition lineage (state/lineage.py): the production output path.
    Metadata overrides land in the sink's _metadata.json (M14). Returns
    the lineage records.

    Resume validates a config fingerprint (cfg + filter + config_extra)
    per partition: rerunning over the same output dir with a different
    filter/config recomputes instead of trusting stale markers."""
    from ..config import apply_metadata_overrides
    from ..state.lineage import config_fingerprint, write_partitioned

    cfg = cfg or EngineConfig()
    rows = wrangle(ds, cfg, filter_geojson)
    meta = apply_metadata_overrides(None, cfg)
    chash = config_fingerprint(cfg, filter_geojson, config_extra)
    return write_partitioned(rows, out_dir, key="tile_id",
                             num_partitions=num_partitions,
                             metadata=meta, resume=resume,
                             config_hash=chash)


def wrangle_tiles(ds: rd.Dataset, cfg: Optional[EngineConfig] = None,
                  filter_geojson=None, pyramid: bool = False,
                  salted: bool = False) -> rd.Dataset:
    """Full tile-blob encode: groupby(tile_id) → per-tile gzip manifest,
    ordered by ascending tile_id (the reference's output order).
    salted=True routes through the two-phase hot-tile encode."""
    cfg = cfg or EngineConfig()
    rows = wrangle(ds, cfg, filter_geojson, pyramid)
    if salted:
        from ..stages.tile_encode import encode_tiles_salted

        tiles = encode_tiles_salted(rows, cfg)
    else:
        # bucketed: Ray walks num_buckets Python groups, not one per tile
        # (tile cardinality is millions at pyramid depth)
        from ..stages.tile_encode import encode_tiles_bucketed

        tiles = encode_tiles_bucketed(rows, cfg)
    return tiles.sort("tile_id")


def wrangle_to_pmtiles(ds: rd.Dataset, output_path: str,
                       cfg: Optional[EngineConfig] = None,
                       filter_geojson=None, pyramid: bool = False) -> dict:
    """Images routed to tiles, written as a PMTiles archive: each tile's
    blob is the gzip image manifest (north_star: 'image bytes geotagged
    and routed to tiles'). Single-file compatibility sink (ordered
    driver-side writer); the scale path is wrangle_write's partitioned
    shards."""
    from ..config import apply_metadata_overrides
    from ..geo.tilemath import MERCATOR_LAT_MAX
    from ..sources.pmtiles import PmHeader, PmTilesWriter

    cfg = cfg or EngineConfig()
    tiles = wrangle_tiles(ds, cfg, filter_geojson, pyramid)
    zmin, zmax = (cfg.zoom_range if pyramid else (cfg.zoom, cfg.zoom))
    header = PmHeader(tile_type=0, min_zoom=zmin, max_zoom=zmax,
                      min_lat_e7=int(-MERCATOR_LAT_MAX * 1e7),
                      max_lat_e7=int(MERCATOR_LAT_MAX * 1e7))
    writer = PmTilesWriter(output_path, header,
                           apply_metadata_overrides(None, cfg))
    n = 0
    for b in tiles.iter_batches(batch_size=256, batch_format="pyarrow"):
        for tid, blob in zip(b["tile_id"].to_pylist(), b["blob"].to_pylist()):
            writer.add_tile(int(tid), blob, compressed=True)  # already gzip
            n += 1
    writer.finalize()
    return {"tiles_written": n}
