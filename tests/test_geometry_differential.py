"""Differential testing of geo/geometry.py against an independent
EXACT-arithmetic oracle.

Generator uses small integer coordinates, where float64 evaluation of
every orientation/crossing product is exact — so the float production
code and the integer oracle must agree on every case, including
touching boundaries (geo-crate `intersects` counts boundary contact).
The round-1 advisor found two real bugs here (per-part containment,
holes in rect coverage); this suite hunts the class, not the instance.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mvt_wrangler_ray.geo.geometry import (
    geoms_intersect,
    parse_geojson_geometry,
    rect_within_polygon,
)

# ---- exact integer oracle --------------------------------------------


def _orient(p, q, r):
    return (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])


def _on_seg(p, q, r):
    return (min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
            and min(p[1], q[1]) <= r[1] <= max(p[1], q[1]))


def _seg_intersect(a0, a1, b0, b1):
    d1 = _orient(b0, b1, a0)
    d2 = _orient(b0, b1, a1)
    d3 = _orient(a0, a1, b0)
    d4 = _orient(a0, a1, b1)
    if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)) \
            and d1 != 0 and d2 != 0:
        return True
    for d, s0, s1, r in ((d1, b0, b1, a0), (d2, b0, b1, a1),
                         (d3, a0, a1, b0), (d4, a0, a1, b1)):
        if d == 0 and _on_seg(s0, s1, r):
            return True
    return False


def _pip_exact(px, py, rings) -> bool:
    """Even-odd crossing with exact integer comparisons (ray to +x)."""
    inside = False
    for ring in rings:
        for (ax, ay), (bx, by) in zip(ring[:-1], ring[1:]):
            if (ay > py) != (by > py):
                # px < ax + (py-ay)(bx-ax)/(by-ay), sign-aware
                lhs = (px - ax) * (by - ay)
                rhs = (py - ay) * (bx - ax)
                if by - ay > 0:
                    cross = lhs < rhs
                else:
                    cross = lhs > rhs
                if cross:
                    inside = not inside
    return inside


def _geom_parts(gj):
    t, c = gj["type"], gj["coordinates"]
    if t == "Polygon":
        return [("poly", [r + ([r[0]] if r[0] != r[-1] else []) for r in c])]
    if t == "MultiPolygon":
        return [("poly", [r + ([r[0]] if r[0] != r[-1] else []) for r in p])
                for p in c]
    if t == "LineString":
        return [("line", [c])]
    if t == "MultiLineString":
        return [("line", [seg]) for seg in c]
    if t == "Point":
        return [("point", [[c]])]
    if t == "MultiPoint":
        return [("point", [[p]]) for p in c]
    raise ValueError(t)


def _edges_of(parts):
    for kind, paths in parts:
        for path in paths:
            if kind == "point":
                continue
            for s0, s1 in zip(path[:-1], path[1:]):
                yield tuple(s0), tuple(s1)


def _oracle_intersects(gj_a, gj_b) -> bool:
    pa_, pb = _geom_parts(gj_a), _geom_parts(gj_b)
    ea, eb = list(_edges_of(pa_)), list(_edges_of(pb))
    # point cases: point on segment or inside polygon
    for parts, other_parts, other_edges in ((pa_, pb, eb), (pb, pa_, ea)):
        for kind, paths in parts:
            if kind != "point":
                continue
            for path in paths:
                p = tuple(path[0])
                for kind2, paths2 in other_parts:
                    if kind2 == "poly" and _pip_exact(p[0], p[1], paths2):
                        return True
                    if kind2 == "point" and tuple(paths2[0][0]) == p:
                        return True
                for s0, s1 in other_edges:
                    if _orient(s0, s1, p) == 0 and _on_seg(s0, s1, p):
                        return True
    # edge crossings
    for a0, a1 in ea:
        for b0, b1 in eb:
            if _seg_intersect(a0, a1, b0, b1):
                return True
    # containment: one representative vertex of each non-point part
    for parts, other in ((pa_, pb), (pb, pa_)):
        for kind2, paths2 in other:
            if kind2 != "poly":
                continue
            for kind, paths in parts:
                if kind == "point":
                    continue
                v = paths[0][0]
                if _pip_exact(v[0], v[1], paths2):
                    return True
    return False


# ---- generators -------------------------------------------------------

coord = st.integers(0, 40)


@st.composite
def rect_poly(draw, holes=False):
    x0 = draw(st.integers(0, 30))
    y0 = draw(st.integers(0, 30))
    w = draw(st.integers(2, 10))
    h = draw(st.integers(2, 10))
    rings = [[[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h],
              [x0, y0]]]
    if holes and w > 3 and h > 3 and draw(st.booleans()):
        rings.append([[x0 + 1, y0 + 1], [x0 + w - 1, y0 + 1],
                      [x0 + w - 1, y0 + h - 1], [x0 + 1, y0 + h - 1],
                      [x0 + 1, y0 + 1]])
    return {"type": "Polygon", "coordinates": rings}


@st.composite
def tri_poly(draw):
    pts = [[draw(coord), draw(coord)] for _ in range(3)]
    if _orient(pts[0], pts[1], pts[2]) == 0:
        pts[2][0] += 1
        pts[2][1] += 3
        if _orient(pts[0], pts[1], pts[2]) == 0:
            pts[2][0] += 2
    return {"type": "Polygon", "coordinates": [pts + [pts[0]]]}


@st.composite
def multi_line(draw):
    n = draw(st.integers(1, 3))
    lines = []
    for _ in range(n):
        k = draw(st.integers(2, 4))
        lines.append([[draw(coord), draw(coord)] for _ in range(k)])
    return {"type": "MultiLineString", "coordinates": lines}


@st.composite
def multi_poly(draw):
    n = draw(st.integers(1, 3))
    polys = []
    for _ in range(n):
        p = draw(rect_poly())
        polys.append(p["coordinates"])
    return {"type": "MultiPolygon", "coordinates": polys}


@st.composite
def points_geom(draw):
    n = draw(st.integers(1, 4))
    return {"type": "MultiPoint",
            "coordinates": [[draw(coord), draw(coord)] for _ in range(n)]}


any_geom = st.one_of(rect_poly(holes=True), tri_poly(), multi_line(),
                     multi_poly(), points_geom())
poly_geom = st.one_of(rect_poly(holes=True), tri_poly(), multi_poly())


@settings(max_examples=400, deadline=None)
@given(any_geom, poly_geom)
def test_intersects_matches_exact_oracle(gj_a, gj_b):
    ga = parse_geojson_geometry(gj_a)
    gb = parse_geojson_geometry(gj_b)
    want = _oracle_intersects(gj_a, gj_b)
    assert geoms_intersect(ga, gb) == want
    assert geoms_intersect(gb, ga) == want


@settings(max_examples=300, deadline=None)
@given(rect_poly(holes=True), st.integers(0, 35), st.integers(0, 35),
       st.integers(1, 8), st.integers(1, 8))
def test_rect_within_polygon_vs_oracle(gj, x0, y0, w, h):
    """rect_within_polygon may be conservatively False (it gates a fast
    path), but must NEVER claim coverage when some rect point is outside
    the polygon — verified on a dense grid of interior sample points."""
    geom = parse_geojson_geometry(gj)
    if not rect_within_polygon(x0, y0, x0 + w, y0 + h, geom):
        return
    rings = _geom_parts(gj)[0][1]
    # scaled integer grid over the rect (x4 density, exact arithmetic on
    # quarter-integers via scaling both rect and polygon by 4)
    rings4 = [[[x * 4, y * 4] for x, y in r] for r in rings]
    for ix in range(4 * x0, 4 * (x0 + w) + 1):
        for iy in range(4 * y0, 4 * (y0 + h) + 1):
            on_edge = any(
                _orient(s0, s1, (ix, iy)) == 0 and _on_seg(s0, s1, (ix, iy))
                for r in rings4 for s0, s1 in zip(
                    [tuple(p) for p in r][:-1], [tuple(p) for p in r][1:]))
            if on_edge:
                continue
            assert _pip_exact(ix, iy, rings4), (
                f"rect_within_polygon claimed coverage but grid point "
                f"({ix / 4}, {iy / 4}) is outside")


@settings(max_examples=300, deadline=None)
@given(poly_geom, st.lists(
    st.tuples(st.integers(0, 35), st.integers(0, 35),
              st.integers(1, 8), st.integers(1, 8)),
    min_size=1, max_size=8))
def test_rects_intersect_polygon_matches_scalar(gj, rects):
    """The vectorized tile-candidate cull must agree with the scalar
    (oracle-verified) geoms_intersect on each rect-as-polygon."""
    from mvt_wrangler_ray.geo.geometry import rects_intersect_polygon

    geom = parse_geojson_geometry(gj)
    w = np.array([r[0] for r in rects], dtype=np.float64)
    s = np.array([r[1] for r in rects], dtype=np.float64)
    e = w + np.array([r[2] for r in rects], dtype=np.float64)
    n = s + np.array([r[3] for r in rects], dtype=np.float64)
    got = rects_intersect_polygon(w, s, e, n, geom)
    for i in range(len(rects)):
        rect_gj = {"type": "Polygon", "coordinates": [[
            [w[i], s[i]], [e[i], s[i]], [e[i], n[i]], [w[i], n[i]],
            [w[i], s[i]]]]}
        want = geoms_intersect(parse_geojson_geometry(rect_gj), geom)
        assert bool(got[i]) == want, (rects[i], gj)
