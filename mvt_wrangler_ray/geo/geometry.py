"""Pure-numpy computational geometry (no shapely in this environment).

Provides what the reference gets from the `geo` crate:
  - GeoJSON geometry parsing (Point/MultiPoint/LineString/MultiLineString/
    Polygon/MultiPolygon) — data.rs:24 `geojson::Geometry`
  - bounding boxes — `BoundingRect`
  - geometry × geometry `intersects` (used tile-envelope × filter-mask,
    transform.rs:82-87 / data.rs:207-230, and feature × filter,
    transform.rs:140-143)
  - vectorized many-points × one-polygon containment (the graft's hot
    point-in-polygon join) and many-rects × one-polygon intersection
    (the tile-level candidate cull).

Boundary convention: containment uses even-odd ray casting; points exactly
on an edge may land either side (same caveat as any float PIP — the
synthetic fixtures avoid on-edge points).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np


@dataclass
class Geom:
    """Flattened geometry: kind + list of parts.

    kind ∈ {"Point","MultiPoint","LineString","MultiLineString",
            "Polygon","MultiPolygon"}.
    For polygons: parts is a list of polygons, each a list of rings, each
    ring an (n,2) float64 array (closed: first == last).
    For points/lines: parts is a list of (n,2) arrays.
    """

    kind: str
    parts: list
    bbox: Tuple[float, float, float, float]  # (minx, miny, maxx, maxy)

    @property
    def geom_class(self) -> str:
        """Multi*-folded class string — transform.rs:131-139."""
        k = self.kind
        if k in ("Point", "MultiPoint"):
            return "Point"
        if k in ("LineString", "MultiLineString"):
            return "LineString"
        if k in ("Polygon", "MultiPolygon"):
            return "Polygon"
        return "Unknown"


def _ring(coords) -> np.ndarray:
    a = np.asarray(coords, dtype=np.float64)
    if a.ndim != 2 or a.shape[1] < 2:
        raise ValueError("ring must be a list of [x, y] positions")
    a = a[:, :2]
    if len(a) and not np.array_equal(a[0], a[-1]):
        a = np.vstack([a, a[:1]])  # close the ring
    return a


def parse_geojson_geometry(g: dict) -> Geom:
    t = g["type"]
    c = g.get("coordinates")
    if t == "Point":
        parts = [np.asarray([c], dtype=np.float64)[:, :2]]
    elif t == "MultiPoint":
        parts = [np.asarray(c, dtype=np.float64)[:, :2]]
    elif t == "LineString":
        parts = [np.asarray(c, dtype=np.float64)[:, :2]]
    elif t == "MultiLineString":
        parts = [np.asarray(line, dtype=np.float64)[:, :2] for line in c]
    elif t == "Polygon":
        parts = [[_ring(r) for r in c]]
    elif t == "MultiPolygon":
        parts = [[_ring(r) for r in poly] for poly in c]
    elif t == "GeometryCollection":
        raise ValueError("GeometryCollection filter masks are not supported")
    else:
        raise ValueError(f"unsupported geometry type {t}")
    flat = _all_coords(t, parts)
    if len(flat) == 0:
        bbox = (np.nan, np.nan, np.nan, np.nan)
    else:
        bbox = (
            float(flat[:, 0].min()),
            float(flat[:, 1].min()),
            float(flat[:, 0].max()),
            float(flat[:, 1].max()),
        )
    return Geom(t, parts, bbox)


def _all_coords(kind: str, parts) -> np.ndarray:
    if kind in ("Polygon", "MultiPolygon"):
        arrs = [r for poly in parts for r in poly]
    else:
        arrs = parts
    return np.vstack(arrs) if arrs else np.empty((0, 2))


def transform_geom(geom: Geom, fn) -> Geom:
    """Apply fn((n,2) array) → (n,2) array to every coordinate array —
    the analogue of geo's MapCoords (used by project_to_tile,
    transform.rs:16-29)."""
    if geom.kind in ("Polygon", "MultiPolygon"):
        parts = [[fn(r) for r in poly] for poly in geom.parts]
        arrs = [r for poly in parts for r in poly]
    else:
        parts = [fn(p) for p in geom.parts]
        arrs = parts
    flat = np.vstack(arrs) if arrs else np.empty((0, 2))
    if len(flat) == 0 or np.isnan(flat).all():
        bbox = (np.nan, np.nan, np.nan, np.nan)
    else:
        bbox = (
            float(np.nanmin(flat[:, 0])),
            float(np.nanmin(flat[:, 1])),
            float(np.nanmax(flat[:, 0])),
            float(np.nanmax(flat[:, 1])),
        )
    return Geom(geom.kind, parts, bbox)


# ---- point-in-polygon (vectorized over points) ------------------------


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd crossing number for many points vs one ring. O(E) passes,
    each vectorized over all points."""
    inside = np.zeros(len(px), dtype=bool)
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    for i in range(len(x0)):
        ax, ay, bx, by = x0[i], y0[i], x1[i], y1[i]
        cond = (ay > py) != (by > py)
        if not cond.any():
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = ax + (py - ay) * (bx - ax) / (by - ay)
        inside ^= cond & (px < xint)
    return inside


def points_in_polygon(px: np.ndarray, py: np.ndarray, geom: Geom) -> np.ndarray:
    """Many points vs one (Multi)Polygon, holes honored (even-odd)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    out = np.zeros(len(px), dtype=bool)
    minx, miny, maxx, maxy = geom.bbox
    cand = (px >= minx) & (px <= maxx) & (py >= miny) & (py <= maxy)
    if not cand.any():
        return out
    cpx, cpy = px[cand], py[cand]
    acc = np.zeros(len(cpx), dtype=bool)
    if geom.kind == "Polygon":
        polys = [geom.parts[0]]
    elif geom.kind == "MultiPolygon":
        polys = geom.parts
    else:
        return out
    for rings in polys:
        inside = np.zeros(len(cpx), dtype=bool)
        for ring in rings:
            inside ^= points_in_ring(cpx, cpy, ring)
        acc |= inside
    out[cand] = acc
    return out


# ---- segment and polygon intersection ---------------------------------


def _segments_cross(a0, a1, b0, b1) -> bool:
    """Proper/improper 2-segment intersection via orientation tests."""

    def orient(p, q, r):
        return (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])

    def on_seg(p, q, r):
        return (
            min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
            and min(p[1], q[1]) <= r[1] <= max(p[1], q[1])
        )

    d1 = orient(b0, b1, a0)
    d2 = orient(b0, b1, a1)
    d3 = orient(a0, a1, b0)
    d4 = orient(a0, a1, b1)
    if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)) and d1 != 0 and d2 != 0:
        return True
    if d1 == 0 and on_seg(b0, b1, a0):
        return True
    if d2 == 0 and on_seg(b0, b1, a1):
        return True
    if d3 == 0 and on_seg(a0, a1, b0):
        return True
    if d4 == 0 and on_seg(a0, a1, b1):
        return True
    return False


def _edges(geom: Geom):
    if geom.kind in ("Polygon",):
        for ring in geom.parts[0]:
            yield ring
    elif geom.kind == "MultiPolygon":
        for poly in geom.parts:
            for ring in poly:
                yield ring
    elif geom.kind in ("LineString",):
        yield geom.parts[0]
    elif geom.kind == "MultiLineString":
        for line in geom.parts:
            yield line


def _edge_arrays_cross(e1: np.ndarray, e2: np.ndarray) -> bool:
    """Any segment of polyline e1 crosses any of e2 — outer loop over the
    shorter polyline, inner test vectorized."""
    if len(e1) < 2 or len(e2) < 2:
        return False
    if len(e1) > len(e2):
        e1, e2 = e2, e1
    bx0, by0 = e2[:-1, 0], e2[:-1, 1]
    bx1, by1 = e2[1:, 0], e2[1:, 1]
    bminx, bmaxx = np.minimum(bx0, bx1), np.maximum(bx0, bx1)
    bminy, bmaxy = np.minimum(by0, by1), np.maximum(by0, by1)
    for i in range(len(e1) - 1):
        ax0, ay0 = e1[i]
        ax1, ay1 = e1[i + 1]
        d1 = (bx1 - bx0) * (ay0 - by0) - (by1 - by0) * (ax0 - bx0)
        d2 = (bx1 - bx0) * (ay1 - by0) - (by1 - by0) * (ax1 - bx0)
        d3 = (ax1 - ax0) * (by0 - ay0) - (ay1 - ay0) * (bx0 - ax0)
        d4 = (ax1 - ax0) * (by1 - ay0) - (ay1 - ay0) * (bx1 - ax0)
        proper = (((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))
                  & (d1 != 0) & (d2 != 0))
        # boundary contact EXACTLY (the vectorized _segments_cross): a
        # zero orientation only counts when that endpoint lies ON the
        # other SEGMENT, not merely on its infinite line — the previous
        # "collinear touch + bbox overlap" shortcut reported non-touching
        # segment pairs as intersecting (e.g. (0,0)-(3,3) x (0,3)-(2,3))
        on_a0 = ((d1 == 0) & (bminx <= ax0) & (ax0 <= bmaxx)
                 & (bminy <= ay0) & (ay0 <= bmaxy))
        on_a1 = ((d2 == 0) & (bminx <= ax1) & (ax1 <= bmaxx)
                 & (bminy <= ay1) & (ay1 <= bmaxy))
        aminx, amaxx = min(ax0, ax1), max(ax0, ax1)
        aminy, amaxy = min(ay0, ay1), max(ay0, ay1)
        on_b0 = ((d3 == 0) & (aminx <= bx0) & (bx0 <= amaxx)
                 & (aminy <= by0) & (by0 <= amaxy))
        on_b1 = ((d4 == 0) & (aminx <= bx1) & (bx1 <= amaxx)
                 & (aminy <= by1) & (by1 <= amaxy))
        if (proper | on_a0 | on_a1 | on_b0 | on_b1).any():
            return True
    return False


def _bbox_overlap(b1, b2) -> bool:
    return not (
        b1[2] < b2[0] or b2[2] < b1[0] or b1[3] < b2[1] or b2[3] < b1[1]
    )


def geoms_intersect(g1: Geom, g2: Geom) -> bool:
    """geo-crate-style `intersects` for the kinds we carry. Two phases:
    bbox reject, then edge crossing / containment."""
    if not _bbox_overlap(g1.bbox, g2.bbox):
        return False
    # point cases
    for a, b in ((g1, g2), (g2, g1)):
        if a.kind in ("Point", "MultiPoint"):
            pts = np.vstack(a.parts)
            if b.kind in ("Polygon", "MultiPolygon"):
                if points_in_polygon(pts[:, 0], pts[:, 1], b).any():
                    return True
                # boundary contact: geo's intersects includes a point
                # exactly ON a polygon edge, which even-odd ray casting
                # may classify either side
                for ring in _edges(b):
                    if _points_on_polyline(pts, ring):
                        return True
                return False
            if b.kind in ("Point", "MultiPoint"):
                bp = np.vstack(b.parts)
                return bool(
                    (pts[:, None, :] == bp[None, :, :]).all(-1).any()
                )
            # point vs line: on-segment test (rare; conservative bbox pass)
            for line in _edges(b):
                for p in pts:
                    for i in range(len(line) - 1):
                        if _segments_cross(line[i], line[i + 1], p, p):
                            return True
            return False
    # edge crossing
    for e1 in _edges(g1):
        for e2 in _edges(g2):
            if _edge_arrays_cross(e1, e2):
                return True
    # containment (one fully inside the other). With no edge crossings a
    # part is either entirely inside or entirely outside the polygon, so one
    # representative vertex PER PART decides it — testing only the first
    # vertex of the whole geometry would miss a Multi* whose non-first part
    # lies inside (geo crate returns true there).
    if g1.kind in ("Polygon", "MultiPolygon"):
        p2 = _part_vertices(g2)
        if p2 is not None and points_in_polygon(p2[:, 0], p2[:, 1], g1).any():
            return True
    if g2.kind in ("Polygon", "MultiPolygon"):
        p1 = _part_vertices(g1)
        if p1 is not None and points_in_polygon(p1[:, 0], p1[:, 1], g2).any():
            return True
    return False


def _points_on_polyline(pts: np.ndarray, line: np.ndarray) -> bool:
    """Any of the points exactly on a segment of the polyline
    (zero orientation + bbox containment), vectorized over points."""
    px, py = pts[:, 0], pts[:, 1]
    for i in range(len(line) - 1):
        ax, ay = line[i]
        bx, by = line[i + 1]
        cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        on = ((cross == 0)
              & (np.minimum(ax, bx) <= px) & (px <= np.maximum(ax, bx))
              & (np.minimum(ay, by) <= py) & (py <= np.maximum(ay, by)))
        if on.any():
            return True
    return False


def _part_vertices(g: Geom):
    """One representative vertex per part (per polygon: exterior-ring first
    vertex; per line/point part: first coordinate)."""
    if g.kind in ("Polygon", "MultiPolygon"):
        polys = [g.parts[0]] if g.kind == "Polygon" else g.parts
        pts = [rings[0][0] for rings in polys if rings and len(rings[0])]
    else:
        pts = [p[0] for p in g.parts if len(p)]
    return np.asarray(pts, dtype=np.float64) if pts else None


def rect_within_polygon(w: float, s: float, e: float, n: float, geom: Geom) -> bool:
    """True when the axis-aligned rect lies ENTIRELY inside the polygon:
    all four corners inside and no polygon edge crossing the rect
    boundary. Used to detect masks that fully cover a tile (then every
    feature of the tile intersects the mask — no per-feature test)."""
    if geom.kind not in ("Polygon", "MultiPolygon"):
        return False
    cx = np.array([w, w, e, e])
    cy = np.array([s, n, s, n])
    if not points_in_polygon(cx, cy, geom).all():
        return False
    # Any polygon vertex inside the rect defeats full coverage: an interior
    # ring (hole) strictly inside the rect has no edge crossing the rect
    # boundary and all four corners inside the polygon, yet the rect is NOT
    # entirely within the polygon.
    verts = _all_coords(geom.kind, geom.parts)
    if len(verts):
        inside = (
            (verts[:, 0] > w)
            & (verts[:, 0] < e)
            & (verts[:, 1] > s)
            & (verts[:, 1] < n)
        )
        if inside.any():
            return False
    rect = np.array([[w, s], [e, s], [e, n], [w, n], [w, s]])
    for ring in _edges(geom):
        if _edge_arrays_cross(rect, ring):
            return False
    return True


# ---- many axis-aligned rects × one polygon ----------------------------


def rects_intersect_polygon(west, south, east, north, geom: Geom) -> np.ndarray:
    """Vectorized: N tile envelopes vs one filter-mask polygon.
    True where the rect intersects the polygon. Used for the tile-level
    spatial-join candidate probe (transform.rs:82-87).

    Tests, each vectorized over rects:
      1. bbox overlap (reject)
      2. any polygon vertex inside rect
      3. rect center (or corner) inside polygon
      4. polygon edge crosses rect boundary (per-edge AA clip test)
    """
    west = np.asarray(west, dtype=np.float64)
    south = np.asarray(south, dtype=np.float64)
    east = np.asarray(east, dtype=np.float64)
    north = np.asarray(north, dtype=np.float64)
    n = len(west)
    minx, miny, maxx, maxy = geom.bbox
    cand = (west <= maxx) & (east >= minx) & (south <= maxy) & (north >= miny)
    out = np.zeros(n, dtype=bool)
    if not cand.any():
        return out
    idx = np.nonzero(cand)[0]
    w, s_, e, nn = west[idx], south[idx], east[idx], north[idx]
    hit = np.zeros(len(idx), dtype=bool)

    # 2. any polygon vertex inside the rect
    verts = _all_coords(geom.kind, geom.parts)
    vx, vy = verts[:, 0], verts[:, 1]
    # chunk to bound memory: len(idx) × len(verts)
    CH = max(1, int(4_000_000 // max(len(verts), 1)))
    for st in range(0, len(idx), CH):
        sl = slice(st, st + CH)
        inside = (
            (vx[None, :] >= w[sl, None])
            & (vx[None, :] <= e[sl, None])
            & (vy[None, :] >= s_[sl, None])
            & (vy[None, :] <= nn[sl, None])
        ).any(axis=1)
        hit[sl] |= inside

    # 3. rect corners inside polygon
    rem = ~hit
    if rem.any():
        cx = (w[rem] + e[rem]) * 0.5
        cy = (s_[rem] + nn[rem]) * 0.5
        corners_in = points_in_polygon(cx, cy, geom)
        for qx, qy in ((w, s_), (w, nn), (e, s_), (e, nn)):
            corners_in |= points_in_polygon(qx[rem], qy[rem], geom)
        h = hit[rem]
        h |= corners_in
        hit[rem] = h

    # 4. polygon edges crossing the rect (Cohen–Sutherland style reject)
    rem = ~hit
    if rem.any():
        w_r, s_r, e_r, n_r = w[rem], s_[rem], e[rem], nn[rem]
        cross = np.zeros(len(w_r), dtype=bool)
        for ring in _edges(geom):
            x0, y0 = ring[:-1, 0], ring[:-1, 1]
            x1, y1 = ring[1:, 0], ring[1:, 1]
            for i in range(len(x0)):
                ax, ay, bx, by = x0[i], y0[i], x1[i], y1[i]
                # quick rejects per rect
                m = ~(
                    (max(ax, bx) < w_r)
                    | (min(ax, bx) > e_r)
                    | (max(ay, by) < s_r)
                    | (min(ay, by) > n_r)
                ) & ~cross
                if not m.any():
                    continue
                # liang-barsky clip of segment against each remaining rect
                dx, dy = bx - ax, by - ay
                t0 = np.zeros(m.sum())
                t1 = np.ones(m.sum())
                ok = np.ones(m.sum(), dtype=bool)
                for p, q in (
                    (-dx, ax - w_r[m]),
                    (dx, e_r[m] - ax),
                    (-dy, ay - s_r[m]),
                    (dy, n_r[m] - ay),
                ):
                    if p == 0:
                        ok &= q >= 0
                    else:
                        r = q / p
                        if p < 0:
                            t0 = np.maximum(t0, r)
                        else:
                            t1 = np.minimum(t1, r)
                ok &= t0 <= t1
                cross[m] |= ok
        hit[rem] |= cross

    out[idx] = hit
    return out
