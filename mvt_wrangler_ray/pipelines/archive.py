"""The full archive-rewrite pipeline: PMTiles → transform → PMTiles.

This is the engine's equivalent of the reference CLI
(`mvt-wrangler input.pmtiles output.pmtiles --filter f.geojson --name ...`,
lib.rs:39-99): every addressed tile is fetched, decompressed, decoded,
filtered per the spatially-scoped expression rules, re-encoded,
re-compressed, and written in ascending tile-id order with patched
TileJSON metadata.

Ray Data mapping:
  driver: open archive, read directory → small Arrow manifest of
          (tile_id, offset, length) — the work manifest (S2);
          compile filters once, `ray.put` broadcast (ST1);
  map_batches over manifest batches: each task opens the archive
          read-only (OS page cache shared), fetches + decompresses its
          tiles (S3), decodes (M2), transforms (M1: the per-tile
          semantics of transform.rs:73-205 — see _transform_tile), and
          re-encodes + re-gzips (M13/S7);
  sink:   blobs stream back ordered by manifest position
          (preserve_order) into the single-file PmTilesWriter (content
          dedup + run-length, matching the pmtiles crate's writer).
          NOTE: a single .pmtiles file forces a single-writer sink — the
          compatibility path. The scale path is state.lineage's
          range-partitioned shards; both are offered.

Per-tile transform parity (transform.rs:73-205):
  - tile-level filter candidates via envelope intersect (J1)
  - per-LAYER mask reprojection at the layer's extent + bbox cull (M6/J2)
  - per-feature: tag materialization (M7, last-wins duplicate keys),
    geometry decode + Multi*-folded type classification (M8),
    exact geometry intersect against candidate masks in TILE-LOCAL
    coords (J3), feature-drop OR with first-true short-circuit (M9),
    per-tag current_key evaluation (M10), first-seen key/value pool
    rebuild (M12).
  - canonicalization (SURVEY §2.8): tag iteration preserves the
    feature's original tag order (the reference iterates a HashMap —
    nondeterministic; ours is deterministic and compares equal as a set).
"""

from __future__ import annotations

import gzip
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

from ..config import EngineConfig, apply_metadata_overrides
from ..expr.rowexec import EvaluationContext
from ..expr.values import (
    Value, vbool, vfloat_from_f32, vfloat_from_f64, vint, vnull, vstr,
)
from ..filters import CompiledFilterCollection
from ..geo.geometry import Geom, geoms_intersect, transform_geom
from ..geo.tilemath import bbox_intersects_tile, lonlat_to_tile_frac, tile_id_to_zxy
from ..sources import mvt
from ..sources.pmtiles import (
    COMPRESSION_GZIP,
    COMPRESSION_NONE,
    PmHeader,
    PmTilesReader,
    PmTilesWriter,
)


def _mvt_value_to_expr(v) -> Value:
    """decode_value output → expression value (expression_compiler.rs:78-96)."""
    if v is None:
        return vnull()
    if isinstance(v, bool):
        return vbool(v)
    if isinstance(v, (int, np.integer)):
        iv = int(v)
        if iv >= 1 << 63:
            iv -= 1 << 64  # reference: `u as i64` two's-complement wrap
        return vint(iv)
    if isinstance(v, np.float32):
        # mvt Value field 2 (float): reference Displays at f32 precision
        return vfloat_from_f32(v)
    if isinstance(v, float):
        return vfloat_from_f64(v)
    return vstr(str(v))


def _paths_to_geom(paths: List[List[Tuple[int, int]]], gtype: int) -> Geom:
    """Decoded tile-local geometry → Geom for the intersect join. MVT
    polygons interleave exterior/interior rings by winding; for the
    intersect test ring roles don't matter, treat each ring as a part."""
    arrs = [np.asarray(p, dtype=np.float64) for p in paths if p]
    if not arrs:
        return Geom("Point", [], (np.nan, np.nan, np.nan, np.nan))
    flat = np.vstack(arrs)
    bbox = (float(flat[:, 0].min()), float(flat[:, 1].min()),
            float(flat[:, 0].max()), float(flat[:, 1].max()))
    if gtype == mvt.GEOM_POINT:
        return Geom("MultiPoint", [flat], bbox)
    if gtype == mvt.GEOM_LINESTRING:
        return Geom("MultiLineString", arrs, bbox)
    if gtype == mvt.GEOM_POLYGON:
        return Geom("MultiPolygon", [[_close(a)] for a in arrs], bbox)
    return Geom("MultiPoint", [flat], bbox)


def _close(a: np.ndarray) -> np.ndarray:
    if len(a) and not np.array_equal(a[0], a[-1]):
        return np.vstack([a, a[:1]])
    return a


def needs_geom_test_layer(layer_masks) -> bool:
    return any(g is not None for _, g in layer_masks)


def _applicable_expr(f, layer_name: str, kind: str):
    """Exact-layer-then-wildcard per-expression fallback (data.rs:272-308)."""
    lf = f.layers.get(layer_name)
    e = getattr(lf, kind, None) if lf is not None else None
    if e is not None:
        return e
    lf = f.layers.get("*")
    return getattr(lf, kind, None) if lf is not None else None


def _bulk_remap_layer(layer: dict, drop_ki: set):
    """Rebuild a layer's pools dropping the given key indices — the bulk
    equivalent of the general per-feature loop when the drop decision is
    uniform per key (duplicate-key last-wins and first-seen pool order
    preserved identically)."""
    keys, values = layer["keys"], layer["values"]
    new_keys: List[str] = []
    new_values: List[object] = []
    kmap: Dict[int, int] = {}
    vmap: Dict[tuple, int] = {}
    new_feats = []
    for feat in layer["features"]:
        t = feat["tags"]
        seen: Dict[str, tuple] = {}
        order: List[str] = []
        for i in range(0, len(t) - 1, 2):
            ki, vi = t[i], t[i + 1]
            k = keys[ki]
            if k not in seen:
                order.append(k)
            seen[k] = (ki, vi)
        pairs: List[int] = []
        for k in order:
            ki, vi = seen[k]
            if ki in drop_ki:
                continue
            nki = kmap.get(ki)
            if nki is None:
                nki = kmap[ki] = len(new_keys)
                new_keys.append(keys[ki])
            v = values[vi]
            vk = (type(v).__name__, v)
            nvi = vmap.get(vk)
            if nvi is None:
                nvi = vmap[vk] = len(new_values)
                new_values.append(v)
            pairs.extend((nki, nvi))
        new_feats.append({**feat, "tags": pairs})
    layer["keys"] = new_keys
    layer["values"] = new_values
    layer["features"] = new_feats


def _any_uses_type(layer_masks, layer_name: str) -> bool:
    """Does any applicable expression reference ["type"]? If so the
    geometry class must be computed even when no geometry intersect test
    is needed (tile-covering masks)."""
    from ..expr.compiler import expression_deps

    for f, _ in layer_masks:
        for kind in ("feature", "tag"):
            lf = f.layers.get(layer_name)
            e = getattr(lf, kind, None) if lf is not None else None
            if e is None:
                lf2 = f.layers.get("*")
                e = getattr(lf2, kind, None) if lf2 is not None else None
            if e is not None and "type" in expression_deps(e):
                return True
    return False


def _transform_tile(tile_blob: bytes, z: int, x: int, y: int,
                    fc: Optional[CompiledFilterCollection]) -> bytes:
    """transform_tile parity (transform.rs:73-205). Always decodes and
    re-encodes (the reference's no-filter normalization pass, lib.rs
    §3.2, behaves the same)."""
    tile = mvt.decode_tile(tile_blob)
    candidates = []
    covers_tile: Dict[int, bool] = {}
    if fc is not None and fc.features:
        cand = fc.tile_candidates(z, np.array([x]), np.array([y]))[0]
        candidates = [fc.features[i] for i in np.nonzero(cand)[0]]
        if candidates:
            from ..geo.geometry import rect_within_polygon
            from ..geo.tilemath import tile_bounds

            # BUFFERED tile rect: MVT features may carry coordinates outside
            # [0, extent]^2 (tile buffer). A mask covering only the bare tile
            # rect does NOT intersect a feature living wholly in the buffer
            # zone, so the shortcut must require coverage of the buffered
            # envelope. B = 0.5 tile spans per side (>= 8x the spec-typical
            # 256/4096 buffer); tile-local projection is linear in tile
            # fractions, so buffer in fraction space, not degrees.
            B = 0.5
            tw, _, _, tn_ = tile_bounds(z, np.array([x - B]), np.array([y - B]))
            _, ts, te, _ = tile_bounds(z, np.array([x + B]), np.array([y + B]))
            for f in candidates:
                # a mask that fully covers the buffered tile intersects EVERY
                # in-buffer feature — the per-feature geometry test is
                # skippable with identical output
                covers_tile[id(f)] = rect_within_polygon(
                    float(tw[0]), float(ts[0]), float(te[0]), float(tn_[0]),
                    f.geometry)

    # per-(filter, layer, key) cache for tag expressions that depend on
    # the key alone (the common global name:* filters) — the decision is
    # identical for every feature, so evaluate once per key
    from ..expr.compiler import expression_deps

    keyonly_cache: Dict[tuple, bool] = {}

    def tag_decision(f, layer_name: str, key: str, props, geom_class: str) -> bool:
        lf = f.layers.get(layer_name)
        texpr = lf.tag if lf is not None and lf.tag is not None else None
        if texpr is None:
            lf = f.layers.get("*")
            texpr = lf.tag if lf is not None else None
        if texpr is None:
            return False
        if expression_deps(texpr) <= frozenset(("key",)):
            ck = (id(f), layer_name, key)
            hit = keyonly_cache.get(ck)
            if hit is None:
                hit = keyonly_cache[ck] = f.should_remove_tag(
                    EvaluationContext(layer_name, {}, key, None))
            return hit
        return f.should_remove_tag(
            EvaluationContext(layer_name, props, key, geom_class))

    for layer in tile["layers"]:
        extent = layer.get("extent", 4096)

        # per-layer reprojection + bbox cull (transform.rs:96-108)
        layer_masks = []
        for f in candidates:
            if covers_tile[id(f)]:
                layer_masks.append((f, None))  # covers → always intersects
                continue

            def proj(a, _z=z, _x=x, _y=y, _e=extent):
                fx, fy = lonlat_to_tile_frac(a[:, 0], a[:, 1], _z)
                return np.stack([(fx - _x) * _e, (fy - _y) * _e], axis=1)

            g = transform_geom(f.geometry, proj)
            minx, miny, maxx, maxy = g.bbox
            if bbox_intersects_tile(np.array([minx]), np.array([miny]),
                                    np.array([maxx]), np.array([maxy]), extent)[0]:
                layer_masks.append((f, g))

        if not layer_masks:
            # no mask reaches this layer: pure normalization pass
            _bulk_remap_layer(layer, set())
            continue

        # layer-level bulk path: every mask covers the tile (feature
        # membership is uniform), no applicable feature expression, and
        # every applicable tag expression is key-only → the per-key drop
        # decision is a property of the LAYER KEY POOL, not of features.
        # Evaluate once per pool key and remap tag indices in bulk —
        # identical output to the general loop.
        if layer_masks and not needs_geom_test_layer(layer_masks):
            lname = layer["name"]
            has_feature_expr = any(
                _applicable_expr(f, lname, "feature") is not None
                for f, _ in layer_masks)
            all_key_only = all(
                (e := _applicable_expr(f, lname, "tag")) is None
                or expression_deps(e) <= frozenset(("key",))
                for f, _ in layer_masks)
            if not has_feature_expr and all_key_only:
                drop_ki = {
                    ki for ki, key in enumerate(layer["keys"])
                    if any(tag_decision(f, lname, key, None, "Unknown")
                           for f, _ in layer_masks)}
                _bulk_remap_layer(layer, drop_ki)
                continue

        keys: List[str] = []
        values: List[object] = []
        key_idx: Dict[str, int] = {}
        val_idx: Dict[tuple, int] = {}
        new_feats = []
        # per-LAYER invariants, hoisted out of the feature loop:
        # _any_uses_type walks every filter's expression tree (recursive
        # expression_deps) — doing that per feature is O(features ×
        # filters × expr-size) of pure-Python work for a constant answer
        needs_geom_test = any(g is not None for _, g in layer_masks)
        layer_uses_type = bool(layer_masks) and _any_uses_type(
            layer_masks, layer["name"])
        for feat in layer["features"]:
            # tag materialization (transform.rs:118-128): last wins on
            # duplicate keys, original order remembered for canonical output
            tag_order: List[str] = []
            tag_map: Dict[str, object] = {}
            tpairs = feat["tags"]
            for ti in range(0, len(tpairs) - 1, 2):
                k = layer["keys"][tpairs[ti]]
                v = layer["values"][tpairs[ti + 1]]
                if k not in tag_map:
                    tag_order.append(k)
                tag_map[k] = v

            # fast paths: no mask reaches this layer → nothing to
            # evaluate; only covering masks → every feature intersects
            # without decoding its geometry (transform.rs:140-143 —
            # non-intersecting filters are never consulted, and a
            # tile-covering mask intersects every in-tile geometry)
            geom_class = "Unknown"
            if layer_masks and (needs_geom_test or layer_uses_type):
                geom_paths = mvt.decode_geometry(feat["geometry"])
                feat_geom = _paths_to_geom(geom_paths, feat["type"])
                geom_class = (feat_geom.geom_class
                              if feat["type"] != mvt.GEOM_UNKNOWN else "Unknown")
                intersecting = [
                    (f, g) for f, g in layer_masks
                    if g is None or geoms_intersect(feat_geom, g)
                ]
            else:
                intersecting = list(layer_masks)

            if intersecting:
                props = {k: _mvt_value_to_expr(v) for k, v in tag_map.items()}
                ctx = EvaluationContext(layer["name"], props, None, geom_class)

                # feature drop: OR, first-true short-circuit (transform.rs:148-157)
                if any(f.should_remove_feature(ctx) for f, _ in intersecting):
                    continue
            else:
                props = None

            new_tags: List[int] = []
            for k in tag_order:
                if intersecting and any(
                        tag_decision(f, layer["name"], k, props, geom_class)
                        for f, _ in intersecting):
                    continue
                v = tag_map[k]
                ki = key_idx.get(k)
                if ki is None:
                    ki = key_idx[k] = len(keys)
                    keys.append(k)
                vk = (type(v).__name__, v)
                vi = val_idx.get(vk)
                if vi is None:
                    vi = val_idx[vk] = len(values)
                    values.append(v)
                new_tags.extend((ki, vi))

            new_feats.append({**feat, "tags": new_tags})

        layer["keys"] = keys
        layer["values"] = values
        layer["features"] = new_feats

    return mvt.encode_tile(tile)


# ---------------------------------------------------------------------------


def read_pmtiles_manifest(path: str) -> pa.Table:
    """Driver-side: directory → Arrow manifest of every ADDRESSED tile
    (runs expanded, ascending — processing.rs:32-39)."""
    r = PmTilesReader(path)
    tids, offs, lens = [], [], []
    for e in r.entries():
        for k in range(e.run_length):
            tids.append(e.tile_id + k)
            offs.append(e.offset)
            lens.append(e.length)
    r.close()
    order = np.argsort(np.asarray(tids), kind="stable")
    t = pa.table({
        "tile_id": pa.array(np.asarray(tids)[order], pa.int64()),
        "offset": pa.array(np.asarray(offs)[order], pa.int64()),
        "length": pa.array(np.asarray(lens)[order], pa.int64()),
    })
    z, x, y = tile_id_to_zxy(t["tile_id"].to_numpy())
    return (t.append_column("z", pa.array(z.astype(np.int8), pa.int8()))
             .append_column("x", pa.array(x.astype(np.int32), pa.int32()))
             .append_column("y", pa.array(y.astype(np.int32), pa.int32())))


def read_pmtiles_features(path: str, batch_size: int = 64):
    """PMTiles archive → flattened feature-level Dataset (the engine's
    internal model, SURVEY §1.2 / FIXTURES §2): one row per feature with
    (z, x, y, tile_id, layer, extent, geom_type, tags map). The M2
    'exploded feature rows' mapping: one tile → many rows, emitted from a
    map_batches over the driver-side manifest."""
    import ray.data as rd

    from .features import TAGS_TYPE, tag_value

    manifest = read_pmtiles_manifest(path)
    rdr_cache: dict = {}
    _hr = PmTilesReader(path)
    hdr = _hr.header
    _hr.close()

    def explode(batch: pa.Table) -> pa.Table:
        rdr = rdr_cache.get("f")
        if rdr is None:
            rdr = rdr_cache["f"] = open(path, "rb")
        rows = {"z": [], "x": [], "y": [], "tile_id": [], "layer": [],
                "extent": [], "geom_type": [], "tags": []}
        offs = batch["offset"].to_numpy(zero_copy_only=False)
        lens = batch["length"].to_numpy(zero_copy_only=False)
        for i in range(len(batch)):
            rdr.seek(hdr.data_offset + int(offs[i]))
            raw = rdr.read(int(lens[i]))
            blob = gzip.decompress(raw) if hdr.tile_compression == COMPRESSION_GZIP else raw
            tile = mvt.decode_tile(blob)
            for layer in tile["layers"]:
                for feat in layer["features"]:
                    t = feat["tags"]
                    tags = []
                    for ti in range(0, len(t) - 1, 2):
                        tags.append((layer["keys"][t[ti]],
                                     tag_value(layer["values"][t[ti + 1]])))
                    rows["z"].append(int(batch["z"][i].as_py()))
                    rows["x"].append(int(batch["x"][i].as_py()))
                    rows["y"].append(int(batch["y"][i].as_py()))
                    rows["tile_id"].append(int(batch["tile_id"][i].as_py()))
                    rows["layer"].append(layer["name"])
                    rows["extent"].append(layer.get("extent", 4096))
                    rows["geom_type"].append(feat["type_name"] if feat["type"] != 0
                                             else "Unknown")
                    rows["tags"].append(tags)
        return pa.table({
            "z": pa.array(rows["z"], pa.int8()),
            "x": pa.array(rows["x"], pa.int32()),
            "y": pa.array(rows["y"], pa.int32()),
            "tile_id": pa.array(rows["tile_id"], pa.int64()),
            "layer": pa.array(rows["layer"], pa.string()),
            "extent": pa.array(rows["extent"], pa.int32()),
            "geom_type": pa.array(rows["geom_type"], pa.string()),
            "tags": pa.array(rows["tags"], TAGS_TYPE),
        })

    nblocks = max(1, (len(manifest) + batch_size - 1) // batch_size)
    return (rd.from_arrow(manifest).repartition(nblocks)
            .map_batches(explode, batch_format="pyarrow", batch_size=batch_size))


def wrangle_pmtiles(input_path: str, output_path: str,
                    filter_geojson=None, cfg: Optional[EngineConfig] = None,
                    batch_size: int = 64) -> dict:
    """Full CLI-equivalent run. Returns summary counters."""
    import ray
    import ray.data as rd
    from ray.data import DataContext

    cfg = cfg or EngineConfig()
    src = PmTilesReader(input_path)
    in_header = src.header
    in_meta = src.metadata()
    if in_header.tile_type != 1:
        raise ValueError("unsupported tile type (MVT only) — lib.rs:73-75 parity")
    src.close()

    fc = (CompiledFilterCollection.from_geojson(filter_geojson)
          if filter_geojson is not None else None)
    fc_ref = ray.put(fc)
    tile_comp = in_header.tile_compression
    cache: dict = {}

    manifest = read_pmtiles_manifest(input_path)

    def transform_batch(batch: pa.Table) -> pa.Table:
        c = cache.get("fc", "_missing_")
        if c == "_missing_":
            c = cache["fc"] = ray.get(fc_ref)
        rdr = cache.get("rdr")
        if rdr is None:
            rdr = cache["rdr"] = open(input_path, "rb")
        out = []
        offs = batch["offset"].to_numpy(zero_copy_only=False)
        lens = batch["length"].to_numpy(zero_copy_only=False)
        zs = batch["z"].to_numpy(zero_copy_only=False)
        xs = batch["x"].to_numpy(zero_copy_only=False)
        ys = batch["y"].to_numpy(zero_copy_only=False)
        for i in range(len(batch)):
            rdr.seek(in_header.data_offset + int(offs[i]))
            raw = rdr.read(int(lens[i]))
            blob = gzip.decompress(raw) if tile_comp == COMPRESSION_GZIP else raw
            new = _transform_tile(blob, int(zs[i]), int(xs[i]), int(ys[i]), c)
            if tile_comp == COMPRESSION_GZIP:
                new = gzip.compress(new, mtime=0)
            elif tile_comp != COMPRESSION_NONE:
                raise ValueError(f"unsupported tile compression {tile_comp}")
            out.append(new)
        return pa.table({"tile_id": batch["tile_id"],
                         "blob": pa.array(out, pa.binary())})

    ctx = DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True   # ordered single-file sink
    try:
        nblocks = max(1, (len(manifest) + batch_size - 1) // batch_size)
        # the manifest table arrives as ONE block; split it so the
        # transform runs one task per batch (a single block would
        # serialize the whole archive into one task)
        ds = (rd.from_arrow(manifest).repartition(nblocks)
              .map_batches(transform_batch, batch_format="pyarrow",
                           batch_size=batch_size))

        out_header = PmHeader(
            tile_compression=in_header.tile_compression,
            tile_type=in_header.tile_type,
            min_zoom=in_header.min_zoom, max_zoom=in_header.max_zoom,
            min_lon_e7=in_header.min_lon_e7, min_lat_e7=in_header.min_lat_e7,
            max_lon_e7=in_header.max_lon_e7, max_lat_e7=in_header.max_lat_e7,
            center_zoom=in_header.center_zoom,
            center_lon_e7=in_header.center_lon_e7,
            center_lat_e7=in_header.center_lat_e7,
        )
        out_meta = apply_metadata_overrides(in_meta, cfg)
        writer = PmTilesWriter(output_path, out_header, out_meta)
        n = 0
        for b in ds.iter_batches(batch_size=256, batch_format="pyarrow"):
            tids = b["tile_id"].to_numpy(zero_copy_only=False)
            blobs = b["blob"].to_pylist()
            for tid, blob in zip(tids, blobs):
                writer.add_tile(int(tid), blob, compressed=True)
                n += 1
        writer.finalize()
    finally:
        ctx.execution_options.preserve_order = prev
    return {"tiles_written": n, "input_tiles": len(manifest)}
