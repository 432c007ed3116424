"""Reference-shaped features-table pipeline (FIXTURES.md §2) — the exact
semantics of `transform_tile` (/root/reference/src/transform.rs:73-205)
re-expressed over a flattened feature Dataset:

    (z:int8, x:int32, y:int32, tile_id:int64, layer:dict<string>,
     extent:int32, geom_type:dict<string>, lon:f64, lat:f64,
     tags: map<string, struct<type:int8, s:string, i:int64, f:float64,
                              b:bool>>)

Stage semantics, with reference citations:
  1. tile-level candidate probe: filter-mask STRtree bbox query + exact
     envelope intersect per distinct (z, x, y) in the batch
     (transform.rs:82-87, data.rs:207-230);
  2. per-layer mask reprojection + bbox cull at the LAYER's extent
     (transform.rs:89-108 — extent differs per layer, so the same mask
     culls differently);
  3. feature-level exact intersect (point features: PIP) + feature-drop
     expression OR across candidates (transform.rs:140-157);
  4. per-tag-key expression evaluation with ``current_key`` set — the
     reference's per-entry tag loop (transform.rs:159-171) vectorized by
     iterating DISTINCT keys of the batch and masking rows;
  5. map-column rebuild dropping removed entries (the analogue of the
     keys/values pool re-encode, transform.rs:174-200; dictionary
     encoding happens at the Arrow layer).

Tag value struct ``type`` codes: 0=null 1=bool 2=int 3=float 4=string
(the mvt Value oneof, expression_compiler.rs:78-96: uint/sint fold into
int, float/double into float)."""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

from ..config import EngineConfig
from ..expr.values import V_BOOL, V_FLOAT, V_INT, V_NULL, V_STR
from ..expr.vector import ColumnTagContext, VBatch, evaluate_vector
from ..expr.values import vstr
from ..filters import CompiledFilterCollection
from ..geo.geometry import transform_geom
from ..geo.tilemath import bbox_intersects_tile, lonlat_to_tile_frac

TAG_STRUCT = pa.struct([
    ("type", pa.int8()), ("s", pa.string()), ("i", pa.int64()),
    ("f", pa.float64()), ("b", pa.bool_()),
])
TAGS_TYPE = pa.map_(pa.string(), TAG_STRUCT)


def tag_value(v) -> dict:
    if v is None:
        return {"type": 0, "s": None, "i": None, "f": None, "b": None}
    if isinstance(v, bool):
        return {"type": 1, "s": None, "i": None, "f": None, "b": v}
    if isinstance(v, (int, np.integer)):
        iv = int(v)
        if iv >= 1 << 63:
            iv -= 1 << 64  # reference: `u as i64` two's-complement wrap
        return {"type": 2, "s": None, "i": iv, "f": None, "b": None}
    if isinstance(v, np.float32):
        # The reference carries floats as their Display STRING (parsed back
        # to f64 for ordering), so storing the f64 that parses from the f32
        # Display string is exact: fmt_float_rust(float("0.1")) == "0.1",
        # while float(v) would widen to 0.10000000149011612.
        from ..expr.values import fmt_float32_rust
        return {"type": 3, "s": None, "i": None,
                "f": float(fmt_float32_rust(v)), "b": None}
    if isinstance(v, (float, np.floating)):
        return {"type": 3, "s": None, "i": None, "f": float(v), "b": None}
    return {"type": 4, "s": str(v), "i": None, "f": None, "b": None}


class _MapTags:
    """Decoded map column: flattened arrays + per-row offsets, with
    vectorized per-key lookup building VBatches for the expression
    evaluator. Missing key → Null (executor.rs:175-181)."""

    def __init__(self, col: pa.ChunkedArray | pa.Array, n: int):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        self.n = n
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        self.row_of_entry = np.repeat(np.arange(n), np.diff(offsets))
        self.keys = np.asarray(col.keys.to_pandas(), dtype=object)
        items = col.items
        self.vtype = items.field("type").to_numpy(zero_copy_only=False)
        self.vs = np.asarray(items.field("s").to_pandas(), dtype=object)
        self.vi = items.field("i").fill_null(0).to_numpy(zero_copy_only=False)
        self.vf = items.field("f").fill_null(0.0).to_numpy(zero_copy_only=False)
        self.vb = items.field("b").fill_null(False).to_numpy(zero_copy_only=False)

    def distinct_keys(self) -> List[str]:
        return sorted(set(self.keys.tolist()))

    def has_key(self, key: str) -> np.ndarray:
        out = np.zeros(self.n, dtype=bool)
        m = self.keys == key
        out[self.row_of_entry[m]] = True
        return out

    def lookup(self, key: str) -> VBatch:
        vb = VBatch.nulls(self.n)
        m = self.keys == key
        if not m.any():
            return vb
        rows = self.row_of_entry[m]
        vt = self.vtype[m]
        kind = np.full(self.n, V_NULL, dtype=np.int8)
        kmap = {0: V_NULL, 1: V_BOOL, 2: V_INT, 3: V_FLOAT, 4: V_STR}
        kind[rows] = [kmap[int(t)] for t in vt]
        b = np.zeros(self.n, dtype=bool)
        b[rows] = self.vb[m]
        i = np.zeros(self.n, dtype=np.int64)
        i[rows] = self.vi[m]
        f = np.zeros(self.n, dtype=np.float64)
        f[rows] = self.vf[m]
        s = np.full(self.n, None, dtype=object)
        # last-wins must apply to the STRING lane too: writing only the
        # string-typed entries would leave an earlier duplicate-key
        # string payload attached to a later winning float/int entry
        # (e.g. [("k", "hello"), ("k", 2.5)] → (V_FLOAT, s="hello"),
        # corrupting every Display-string operation on that tag)
        s[rows] = np.where(vt == 4, self.vs[m], None)
        return VBatch(self.n, kind, b=b, i=i, f=f, s=s)


class MapTagContext(ColumnTagContext):
    def __init__(self, n: int, tags: _MapTags, **kw):
        super().__init__(n, {}, **kw)
        self._tags = tags

    def lookup_tag(self, name: str) -> VBatch:
        vb = self._cache.get(name)
        if vb is None:
            vb = self._tags.lookup(name)
            self._cache[name] = vb
        return vb


def _layer_candidate_matrix(fc: CompiledFilterCollection, batch: pa.Table) -> np.ndarray:
    """(n, nfilters) bool: tile-level candidacy refined by the per-layer
    extent reprojection + bbox cull (stages 1-2)."""
    n = len(batch)
    z = batch["z"].to_numpy(zero_copy_only=False).astype(np.int64)
    x = batch["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    y = batch["y"].to_numpy(zero_copy_only=False).astype(np.int64)
    extent = batch["extent"].to_numpy(zero_copy_only=False).astype(np.int64)
    out = np.zeros((n, len(fc.features)), dtype=bool)
    # group rows by (z, x, y, extent) — candidates are per tile+extent.
    # Grouping runs over the COLUMN STACK: a packed shift key is not
    # injective (extent << 52 wraps int64 — np.int64(4096) << 52 == 0,
    # silently merging 4096/8192-extent groups of the same tile)
    uniq, inv = np.unique(np.stack([z, x, y, extent], axis=1),
                          axis=0, return_inverse=True)
    inv = inv.ravel()   # numpy 2.0 returns (n, 1) for axis-unique
    for ui in range(len(uniq)):
        rows = inv == ui
        r0 = int(np.nonzero(rows)[0][0])
        zz, xx, yy, ext = int(z[r0]), int(x[r0]), int(y[r0]), int(extent[r0])
        cand = fc.tile_candidates(zz, np.array([xx]), np.array([yy]))[0]
        for fi in np.nonzero(cand)[0]:
            # per-layer extent reprojection + [0, extent]² bbox cull
            # (transform.rs:96-108)
            def proj(a, _z=zz, _x=xx, _y=yy, _e=ext):
                fx, fy = lonlat_to_tile_frac(a[:, 0], a[:, 1], _z)
                return np.stack([(fx - _x) * _e, (fy - _y) * _e], axis=1)

            g = transform_geom(fc.features[fi].geometry, proj)
            minx, miny, maxx, maxy = g.bbox
            if bbox_intersects_tile(
                    np.array([minx]), np.array([miny]),
                    np.array([maxx]), np.array([maxy]), ext)[0]:
                out[rows, fi] = True
    return out


def transform_features_batch(batch: pa.Table, fc: CompiledFilterCollection,
                             cfg: Optional[EngineConfig] = None) -> pa.Table:
    """One batch through stages 1-5 (see module docstring)."""
    n = len(batch)
    if n == 0 or not fc.features:
        return batch
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    layer = np.asarray(batch["layer"].to_pandas(), dtype=object)
    geom_type = np.asarray(batch["geom_type"].to_pandas(), dtype=object)

    tile_mask = _layer_candidate_matrix(fc, batch)
    # feature-level exact intersect (point features → PIP)
    pip = fc.point_candidates(lon, lat)
    mask = tile_mask & pip

    tags = _MapTags(batch["tags"], n)
    ctx = MapTagContext(n, tags,
                        geometry_type=VBatch.from_strings(geom_type))
    drop = fc.feature_drop_mask(ctx, layer, mask)
    keep = ~drop
    if drop.any():
        batch = batch.filter(pa.array(keep))
        n = len(batch)
        if n == 0:
            return batch
        lon, lat, layer, geom_type = lon[keep], lat[keep], layer[keep], geom_type[keep]
        mask = mask[keep]
        tags = _MapTags(batch["tags"], n)

    # tag-level pass: distinct keys, current_key semantics. Tag lookups
    # and the geometry-type VBatch do not depend on current_key, so ONE
    # cache and one geom VBatch serve all K per-key contexts (a fresh
    # context per key re-decoded every referenced tag column K times)
    entry_drop = np.zeros(len(tags.keys), dtype=bool)
    geom_vb = VBatch.from_strings(geom_type)
    shared_tag_cache: dict = {}
    for key in tags.distinct_keys():
        kctx = MapTagContext(n, tags,
                             geometry_type=geom_vb,
                             current_key=VBatch.from_scalar(vstr(key), n))
        kctx._cache = shared_tag_cache
        row_drop = fc.tag_drop_mask(kctx, layer, mask)
        if row_drop.any():
            em = tags.keys == key
            entry_drop[em] = row_drop[tags.row_of_entry[em]]

    if entry_drop.any():
        batch = _rebuild_tags(batch, tags, ~entry_drop)
    return batch


def _rebuild_tags(batch: pa.Table, tags: _MapTags, entry_keep: np.ndarray) -> pa.Table:
    """Rebuild the map column with surviving entries only (stage 5)."""
    n = len(batch)
    per_row = np.bincount(tags.row_of_entry[entry_keep], minlength=n)
    offsets = np.concatenate([[0], np.cumsum(per_row)]).astype(np.int32)
    order = np.argsort(tags.row_of_entry[entry_keep], kind="stable")
    keys = pa.array(tags.keys[entry_keep][order], pa.string())
    items = pa.StructArray.from_arrays(
        [
            pa.array(tags.vtype[entry_keep][order], pa.int8()),
            pa.array(tags.vs[entry_keep][order], pa.string()),
            pa.array(tags.vi[entry_keep][order], pa.int64()),
            pa.array(tags.vf[entry_keep][order], pa.float64()),
            pa.array(tags.vb[entry_keep][order], pa.bool_()),
        ],
        fields=list(TAG_STRUCT),
    )
    new_map = pa.MapArray.from_arrays(pa.array(offsets, pa.int32()), keys, items)
    idx = batch.column_names.index("tags")
    return batch.set_column(idx, "tags", new_map)


def transform_features(ds, filter_geojson, cfg: Optional[EngineConfig] = None):
    """Dataset-level features transform: broadcast the compiled filter
    collection, stream batches through transform_features_batch."""
    import ray

    fc = CompiledFilterCollection.from_geojson(filter_geojson)
    ref = ray.put(fc)
    cache = {}

    def f(batch: pa.Table) -> pa.Table:
        c = cache.get("fc")
        if c is None:
            c = cache["fc"] = ray.get(ref)
        return transform_features_batch(batch, c, cfg)

    f._broadcast_ref = ref
    return ds.map_batches(f, batch_format="pyarrow")
