"""The broadcast spatial-join + expression-filter stage — the engine's
flagship stateful actor pool.

Reference semantics (transform.rs:73-205 + data.rs:207-308):
  per feature: exact-intersect join against the filter masks (R-tree
  probed), then OR-of-feature-expressions decides DROP; surviving rows
  get per-tag expression evaluation (current_key = tag key) deciding
  per-tag removal.

Ray Data mapping: a callable CLASS for
``ds.map_batches(FilterJoinStage, fn_constructor_kwargs=...,
concurrency=(m, n), batch_size=B, batch_format="pyarrow")``.
``__init__`` compiles the filter collection ONCE PER ACTOR (GeoJSON parse,
expression ASTs, regexes, STR-tree bulk load — the analogue of
lib.rs:52-60 driver-side compile + broadcast). ``__call__`` is fully
vectorized: point-in-polygon masks per filter, per-layer expression
dispatch, Arrow filter + column rewrite.

Tag removal on a columnar table = nulling the cell (the mvt map-rebuild
M12 happens at tile-encode time, where only non-null tags are written).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import EngineConfig
from ..expr.vector import ColumnTagContext, VBatch
from ..expr.values import vstr
from ..filters import CompiledFilterCollection


def _filter_kinds(fc: CompiledFilterCollection):
    """(has_tag_filters, has_feature_filters) — ONE derivation shared by
    __init__ and the broadcast-task reconstruction in make_task_filter."""
    return (any(lf.tag is not None
                for f in fc.features for lf in f.layers.values()),
            any(lf.feature is not None
                for f in fc.features for lf in f.layers.values()))


class FilterJoinStage:
    def __init__(self, filter_geojson, cfg: Optional[EngineConfig] = None,
                 geom_type: str = "Point"):
        self.cfg = cfg or EngineConfig()
        self.fc = CompiledFilterCollection.from_geojson(filter_geojson)
        self.geom_type = geom_type
        self._has_tag_filters, self._has_feature_filters = _filter_kinds(self.fc)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = len(batch)
        if n == 0 or not self.fc.features:
            return batch
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)

        # spatial containment matrix (n, nfilters): the exact-intersect
        # join specialised to point rows
        mask = self.fc.point_candidates(lon, lat)

        layer = (batch[cfg.layer_col].to_numpy(zero_copy_only=False).astype(object)
                 if cfg.layer_col else cfg.default_layer)

        tag_cols = [c for c in cfg.tag_cols if c in batch.column_names]
        ctx = ColumnTagContext(
            n, {c: batch[c] for c in tag_cols},
            geometry_type=VBatch.from_scalar(vstr(self.geom_type), n),
        )

        if self._has_feature_filters:
            drop = self.fc.feature_drop_mask(ctx, layer, mask)
            if drop.any():
                keep = ~drop
                batch = batch.filter(pa.array(keep))
                lon, lat = lon[keep], lat[keep]
                mask = mask[keep]
                n = len(batch)
                if n == 0:
                    return batch
                if isinstance(layer, np.ndarray):
                    layer = layer[keep]
                tag_cols = [c for c in cfg.tag_cols if c in batch.column_names]
                ctx = ColumnTagContext(
                    n, {c: batch[c] for c in tag_cols},
                    geometry_type=VBatch.from_scalar(vstr(self.geom_type), n),
                )

        if self._has_tag_filters:
            # per tag column: current_key = column name. ALL drop masks
            # evaluate against the ORIGINAL columns first, then nulls
            # apply — the reference (transform.rs tag loop) consults the
            # untouched tag map for every key, so evaluating later
            # columns against already-nulled earlier ones would make
            # results column-order-dependent.
            orig_cols = {c: batch[c] for c in tag_cols}
            drops = {}
            for col in tag_cols:
                kctx = ColumnTagContext(
                    n, orig_cols,
                    geometry_type=VBatch.from_scalar(vstr(self.geom_type), n),
                    current_key=VBatch.from_scalar(vstr(col), n),
                )
                drops[col] = self.fc.tag_drop_mask(kctx, layer, mask)
            for col, tdrop in drops.items():
                if tdrop.any():
                    arr = orig_cols[col].combine_chunks() \
                        if isinstance(orig_cols[col], pa.ChunkedArray) \
                        else orig_cols[col]
                    nulled = pc.if_else(pa.array(~tdrop), arr, pa.nulls(n, arr.type))
                    batch = batch.set_column(
                        batch.column_names.index(col), col, nulled)
        return batch


_TASK_STAGE_CACHE: dict = {}


def make_task_filter(filter_geojson, cfg: Optional[EngineConfig] = None,
                     geom_type: str = "Point"):
    """Broadcast-task variant of the filter join.

    The compiled collection for a typical filter file is small (a few
    masks + ASTs), so per-actor amortization buys nothing while actor
    POOL STARTUP costs ~5s of fixed wall time per pipeline. Here the
    driver compiles ONCE, `ray.put`s the result, and stateless map tasks
    fetch it zero-copy from their node's object store on first use and
    cache it per worker process. Elastic, no pool startup, and the state
    still crosses the cluster exactly once per node.

    Use the FilterJoinStage actor pool instead when the mask set is large
    enough that STRtree construction / filter compile itself is the
    expensive part (tens of thousands of masks)."""
    import ray

    cfg = cfg or EngineConfig()
    fc = CompiledFilterCollection.from_geojson(filter_geojson)
    ref = ray.put((fc, cfg, geom_type))
    key = ref.hex()

    def filter_batch(batch: pa.Table) -> pa.Table:
        stage = _TASK_STAGE_CACHE.get(key)
        if stage is None:
            fc_, cfg_, gt = ray.get(ref)
            stage = FilterJoinStage.__new__(FilterJoinStage)
            stage.cfg = cfg_
            stage.fc = fc_
            stage.geom_type = gt
            stage._has_tag_filters, stage._has_feature_filters = \
                _filter_kinds(fc_)
            _TASK_STAGE_CACHE[key] = stage
        return stage(batch)

    # keep the broadcast object alive as long as the closure lives
    filter_batch._broadcast_ref = ref
    return filter_batch


# Features-table (map<string, struct> tags) filtering with true per-entry
# current_key semantics lives in pipelines.features.transform_features_batch.
