"""Hierarchical cell indexes for routing, density aggregation and
skew-aware repartitioning (north_rule: "H3/S2 cell routing").

No h3/s2 native libraries exist in this environment, so both indexes are
implemented from the published algorithms, vectorized in numpy:

  * ``s2_cell_id`` — S2-style cell ids: lon/lat → unit sphere → cube face
    → quadratic (s,t) projection (the published S2 ST_TO_UV quadratic) →
    leaf (i,j) at level 30 → per-face Hilbert curve position → 64-bit id
    with S2's bit layout (3 face bits, 2·level position bits, trailing
    lsb marker). Hierarchical: parent = truncate position bits. NOTE:
    same construction and layout as Google S2, but the Hilbert orientation
    seeding is our own — ids are NOT bit-identical to the s2geometry
    library; all hierarchy/locality properties hold.
  * ``hex_cell`` — H3-style hexagonal binning as a planar hex lattice on
    the Web-Mercator plane with aperture-4 resolution scaling (axial
    coords + cube rounding). Documented engine-defined approximation of
    H3 (no icosahedral projection); supports resolution hierarchy by
    recomputation, which is how H3 parents work for our
    density/partitioning use cases.
  * ``cell_range_prefix`` — the repartitioning key: the high bits of a
    cell id shared by a contiguous spatial range (north_rule's "explicit
    repartitioning by resolution-prefix ranges").
"""

from __future__ import annotations

import numpy as np

from .tilemath import hilbert_xy_to_d

S2_MAX_LEVEL = 30


def _lonlat_to_xyz(lon, lat):
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    coslat = np.cos(lat)
    return coslat * np.cos(lon), coslat * np.sin(lon), np.sin(lat)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    # negative major axis → face + 3
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    # S2 face (u,v) axes (published table)
    for f, (un, ud, vn, vd) in enumerate([
        ("y", "x", "z", "x"),    # face 0: +x major
        ("-x", "y", "z", "y"),   # face 1: +y major
        ("-x", "z", "-y", "z"),  # face 2: +z major
        ("z", "x", "y", "x"),    # face 3: -x major  (u=z/x, v=y/x with x<0)
        ("z", "y", "-x", "y"),   # face 4: -y major
        ("-y", "z", "-x", "z"),  # face 5: -z major
    ]):
        m = face == f
        if not m.any():
            continue
        comp = {"x": x, "y": y, "z": z, "-x": -x, "-y": -y, "-z": -z}
        u[m] = comp[un][m] / comp[ud][m]
        v[m] = comp[vn][m] / comp[vd][m]
    return face, u, v


def _uv_to_st(u):
    """S2's quadratic projection (published): evens cell areas.
    (np.where evaluates both branches — mask the sqrt args to stay ≥ 0.)"""
    pos = u >= 0
    return np.where(
        pos,
        0.5 * np.sqrt(1 + 3 * np.where(pos, u, 0)),
        1 - 0.5 * np.sqrt(1 - 3 * np.where(pos, 0, u)),
    )


def s2_cell_id(lon, lat, level: int) -> np.ndarray:
    """uint64 S2-style cell id at the given level (0..30)."""
    if not (0 <= level <= S2_MAX_LEVEL):
        raise ValueError("level must be in [0, 30]")
    x, y, z = _lonlat_to_xyz(lon, lat)
    face, u, v = _xyz_to_face_uv(x, y, z)
    s, t = _uv_to_st(u), _uv_to_st(v)
    n = np.int64(1) << np.int64(level)
    i = np.clip((s * n).astype(np.int64), 0, n - 1)
    j = np.clip((t * n).astype(np.int64), 0, n - 1)
    # per-face Hilbert (odd faces traverse the mirrored curve so adjacent
    # faces join ends — our orientation seeding, see module docstring)
    pos = np.empty(len(face), dtype=np.int64)
    for f in range(6):
        m = face == f
        if not m.any():
            continue
        fi, fj = (i[m], j[m]) if f % 2 == 0 else (j[m], i[m])
        pos[m] = hilbert_xy_to_d(level, fi, fj)
    # S2 layout: face(3) | pos(2*level) | 1 marker, left-aligned in 64 bits
    shift = np.uint64(2 * (S2_MAX_LEVEL - level) + 1)
    cell = (
        (face.astype(np.uint64) << np.uint64(61))
        | (pos.astype(np.uint64) << shift)
        | (np.uint64(1) << (shift - np.uint64(1)))
    )
    return cell


def s2_parent(cell: np.ndarray, level: int, parent_level: int) -> np.ndarray:
    """Truncate position bits: the standard S2 parent operation."""
    if parent_level > level:
        raise ValueError("parent_level must be ≤ level")
    shift = np.uint64(2 * (S2_MAX_LEVEL - parent_level) + 1)
    lsb = np.uint64(1) << (shift - np.uint64(1))
    return (np.asarray(cell, dtype=np.uint64) & ~(lsb * np.uint64(2) - np.uint64(1))) | lsb


def s2_level(cell) -> np.ndarray:
    """Level from the trailing set bit."""
    c = np.asarray(cell, dtype=np.uint64)
    lsb = c & (~c + np.uint64(1))
    lvl = S2_MAX_LEVEL - (np.log2(lsb.astype(np.float64)).astype(np.int64) // 2)
    return lvl


# ---- hex binning (H3-style, planar) -----------------------------------

_HEX_BASE = 360.0 / 16.0  # base hex size in mercator degrees at res 0
_HEX_OFF = np.int64(1) << np.int64(25)
_SQRT3 = np.sqrt(3.0)


def _mercator_xy(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    y = np.degrees(np.log(np.tan(lat) + 1.0 / np.cos(lat)))
    return lon, y


def hex_cell(lon, lat, res: int) -> np.ndarray:
    """uint64 hex cell id at resolution res (0..20): pointy-top axial
    coords with cube rounding; aperture 4 (cell size halves per res)."""
    if not (0 <= res <= 20):
        raise ValueError("res must be in [0, 20]")
    # clamp to the Web-Mercator valid band (same rule as tilemath): an
    # unclamped pole sends Y → ∞, the axial offset (qi + 2^25) goes
    # negative, and the int64→uint64 wrap smashes the res bit-field
    from .tilemath import MERCATOR_LAT_MAX

    lat = np.clip(np.asarray(lat, dtype=np.float64),
                  -MERCATOR_LAT_MAX, MERCATOR_LAT_MAX)
    X, Y = _mercator_xy(lon, lat)
    size = _HEX_BASE / (2.0 ** res)
    q = (_SQRT3 / 3.0 * X - 1.0 / 3.0 * Y) / size
    r = (2.0 / 3.0 * Y) / size
    qi, ri = _cube_round(q, r)
    return (
        (np.uint64(res) << np.uint64(58))
        | ((qi + _HEX_OFF).astype(np.uint64) << np.uint64(26))
        | (ri + _HEX_OFF).astype(np.uint64)
    )


def _cube_round(q, r):
    s = -q - r
    qi = np.round(q)
    ri = np.round(r)
    si = np.round(s)
    dq = np.abs(qi - q)
    dr = np.abs(ri - r)
    ds = np.abs(si - s)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    qi = np.where(fix_q, -ri - si, qi)
    ri = np.where(fix_r, -qi - si, ri)
    return qi.astype(np.int64), ri.astype(np.int64)


def hex_res(cell) -> np.ndarray:
    return (np.asarray(cell, dtype=np.uint64) >> np.uint64(58)).astype(np.int64)


def cell_range_prefix(cell, bits: int = 16) -> np.ndarray:
    """High-order prefix of a cell id — a contiguous spatial key range,
    used as the explicit repartitioning key before wide ops (the
    'repartition by resolution-prefix ranges' of the north rule)."""
    return (np.asarray(cell, dtype=np.uint64) >> np.uint64(64 - bits)).astype(np.int64)
