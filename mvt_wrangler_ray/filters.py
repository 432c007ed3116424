"""Spatially-scoped filter collections (the reference's GeoJSON config
surface — FILTERING.md), compiled once on the driver and broadcast to
workers.

Parity: /root/reference/src/filtering/data.rs
  - FilterCollection / FilterFeature / LayerFilter parse: data.rs:12-62
  - compile (expressions + R-tree bulk load):             data.rs:140-205
  - get_filter_features (bbox probe + exact intersects):  data.rs:207-230
  - should_remove_feature / should_remove_tag with the
    exact-layer-then-"*"-wildcard fallback:               data.rs:264-308

Evaluation here is vectorized: per filter feature, a spatial mask over the
whole batch (point-in-polygon for point features / envelope intersect for
tiles), then each layer's compiled expression evaluated once per batch and
OR-combined. The reference's first-true-wins short-circuit over filters
(transform.rs:149-157) is a pure OR — order-independent, so batch OR is
semantically identical.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from .expr.compiler import ExpressionCompileError, compile_expression
from .expr.rowexec import EvaluationContext, evaluate_bool
from .expr.vector import ColumnTagContext, VBatch, evaluate_vector
from .geo.geometry import Geom, geoms_intersect, parse_geojson_geometry, points_in_polygon, rects_intersect_polygon
from .geo.strtree import STRtree
from .geo.tilemath import tile_bounds


@dataclass
class CompiledLayerFilter:
    feature: Optional[tuple]  # compiled AST or None
    tag: Optional[tuple]


@dataclass
class CompiledFilterFeature:
    geometry: Geom
    layers: Dict[str, CompiledLayerFilter]
    name: Optional[str] = None

    def layer_filter(self, layer_name: str) -> Optional[CompiledLayerFilter]:
        """Exact layer name, else '*' wildcard, else None — data.rs:272-287."""
        lf = self.layers.get(layer_name)
        if lf is not None:
            return lf
        return self.layers.get("*")

    # row-wise (oracle / per-group paths) --------------------------------

    def should_remove_feature(self, ctx: EvaluationContext) -> bool:
        lf = self.layers.get(ctx.layer_name)
        if lf is not None and lf.feature is not None:
            return evaluate_bool(lf.feature, ctx)
        lf = self.layers.get("*")
        if lf is not None and lf.feature is not None:
            return evaluate_bool(lf.feature, ctx)
        return False

    def should_remove_tag(self, ctx: EvaluationContext) -> bool:
        lf = self.layers.get(ctx.layer_name)
        if lf is not None and lf.tag is not None:
            return evaluate_bool(lf.tag, ctx)
        lf = self.layers.get("*")
        if lf is not None and lf.tag is not None:
            return evaluate_bool(lf.tag, ctx)
        return False


class CompiledFilterCollection:
    """Driver-compiled filter set + STR-tree spatial index. Picklable —
    ship via `ray.put` or actor constructor args (the analogue of the
    reference moving the compiled collection into the rayon closure,
    processing.rs:84-89)."""

    def __init__(self, features: List[CompiledFilterFeature]):
        self.features = features
        boxes = np.array(
            [f.geometry.bbox for f in features], dtype=np.float64
        ).reshape(-1, 4)
        self.tree = STRtree(boxes)

    # ---- construction --------------------------------------------------

    @classmethod
    def from_geojson(cls, obj) -> "CompiledFilterCollection":
        """obj: dict, JSON string, or path to a .geojson file."""
        if isinstance(obj, (str, bytes)):
            s = obj.decode() if isinstance(obj, bytes) else obj
            if s.lstrip().startswith("{"):
                obj = json.loads(s)
            else:
                with open(s) as f:
                    obj = json.load(f)
        if obj.get("type") != "FeatureCollection":
            raise ValueError("filter must be a GeoJSON FeatureCollection")
        feats = []
        for feat in obj.get("features", []):
            geom = parse_geojson_geometry(feat["geometry"])
            props = feat.get("properties") or {}
            layers = {}
            for lname, lf in (props.get("layers") or {}).items():
                fe = lf.get("feature")
                tg = lf.get("tag")
                layers[lname] = CompiledLayerFilter(
                    feature=compile_expression(fe) if fe is not None else None,
                    tag=compile_expression(tg) if tg is not None else None,
                )
            feats.append(CompiledFilterFeature(geom, layers, props.get("name") or props.get("id")))
        return cls(feats)

    # ---- spatial probes (vectorized) -----------------------------------

    def tile_candidates(self, z: int, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
        """(ntiles, nfilters) bool — which filters' masks intersect each
        tile envelope. Two-phase like the reference: R-tree bbox probe,
        then exact rect×polygon intersect (data.rs:207-230)."""
        w, s, e, n = tile_bounds(z, xs, ys)
        qboxes = np.stack([w, s, e, n], axis=1)
        cand = self.tree.query_boxes_matrix(qboxes)
        out = np.zeros_like(cand)
        for fi in np.nonzero(cand.any(axis=0))[0]:
            rows = cand[:, fi]
            out[rows, fi] = rects_intersect_polygon(
                w[rows], s[rows], e[rows], n[rows], self.features[fi].geometry
            )
        return out

    def point_candidates(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """(npoints, nfilters) bool — point-in-mask containment. The
        feature-level exact intersect join of transform.rs:140-143
        specialised to point features (the graft's image rows)."""
        n = len(lon)
        out = np.zeros((n, len(self.features)), dtype=bool)
        for fi, f in enumerate(self.features):
            g = f.geometry
            if g.kind in ("Polygon", "MultiPolygon"):
                out[:, fi] = points_in_polygon(lon, lat, g)
            else:
                # degenerate mask kinds: bbox containment only
                minx, miny, maxx, maxy = g.bbox
                out[:, fi] = (lon >= minx) & (lon <= maxx) & (lat >= miny) & (lat <= maxy)
        return out

    def candidates_for_geom(self, geom: Geom) -> List[int]:
        """Single-geometry probe (tile envelope) — data.rs:207-230."""
        idx = self.tree.query_box(*geom.bbox)
        return [int(i) for i in idx if geoms_intersect(self.features[int(i)].geometry, geom)]

    # ---- vectorized predicate evaluation -------------------------------

    def feature_drop_mask(
        self,
        ctx: ColumnTagContext,
        layer: np.ndarray | str,
        mask_matrix: np.ndarray,
    ) -> np.ndarray:
        """bool[n]: True where the row should be DROPPED.
        mask_matrix: (n, nfilters) spatial containment (from
        point_candidates or a tile-level candidate broadcast).
        OR over filters of (contained & layer-filter expr) —
        transform.rs:140-157."""
        n = ctx.n
        drop = np.zeros(n, dtype=bool)
        layer_arr = np.full(n, layer, dtype=object) if isinstance(layer, str) else layer
        for fi, f in enumerate(self.features):
            contained = mask_matrix[:, fi]
            if not contained.any():
                continue
            drop |= contained & self._eval_layered(f, ctx, layer_arr, kind="feature")
        return drop

    def tag_drop_mask(
        self,
        ctx: ColumnTagContext,
        layer: np.ndarray | str,
        mask_matrix: np.ndarray,
    ) -> np.ndarray:
        """Same shape as feature_drop_mask but for the tag expression;
        ctx.current_key must be set by the caller (per tag key)."""
        n = ctx.n
        drop = np.zeros(n, dtype=bool)
        layer_arr = np.full(n, layer, dtype=object) if isinstance(layer, str) else layer
        for fi, f in enumerate(self.features):
            contained = mask_matrix[:, fi]
            if not contained.any():
                continue
            drop |= contained & self._eval_layered(f, ctx, layer_arr, kind="tag")
        return drop

    def _eval_layered(
        self, f: CompiledFilterFeature, ctx: ColumnTagContext, layer_arr: np.ndarray, kind: str
    ) -> np.ndarray:
        """Per-row expression dispatch by layer name with '*' fallback,
        evaluating each DISTINCT expression once per batch."""
        n = ctx.n
        out = np.zeros(n, dtype=bool)
        wildcard = f.layers.get("*")
        # rows with a NULL layer take the '*' fallback (no exact-name
        # filter can match them); the previous astype('U') turned None
        # into the string 'None', whose equality test never matched the
        # actual None cells — such rows silently bypassed every filter
        sent = "\x00__null_layer__"
        norm = np.array([sent if x is None else x for x in layer_arr],
                        dtype=object)
        eval_cache: dict = {}

        def eval_expr(expr) -> np.ndarray:
            # several layers often resolve to the SAME '*' expression —
            # evaluate each distinct AST once per batch, as documented
            r = eval_cache.get(id(expr))
            if r is None:
                r = eval_cache[id(expr)] = \
                    evaluate_vector(expr, ctx).to_bool_array()
            return r

        for lname in set(norm.tolist()):
            lf = None if lname == sent else f.layers.get(lname)
            expr = None
            if lf is not None:
                expr = lf.feature if kind == "feature" else lf.tag
            if expr is None and wildcard is not None:
                expr = wildcard.feature if kind == "feature" else wildcard.tag
            if expr is None:
                continue
            rows = norm == lname
            out[rows] = eval_expr(expr)[rows]
        return out
