"""Web-Mercator tile-pyramid math, vectorized.

Formula parity with the reference:
  - forward projection / tile-local coords: /root/reference/src/transform.rs:16-29
  - tile envelope (inverse):                /root/reference/src/transform.rs:47-71
  - bbox-vs-tile cull:                      /root/reference/src/transform.rs:31-45
  - output ordering key (Hilbert TileId):   /root/reference/src/processing.rs:38
    (the pmtiles crate's TileId — PMTiles spec: cumulative tile count of
    all zooms < z, plus the Hilbert curve index of (x, y) at zoom z).

Every function takes/returns numpy arrays and is safe for float64 at all
zooms ≤ 30 (tile ids fit in int64 up to z30).
"""

from __future__ import annotations

import numpy as np

# Web-Mercator latitude clamp (the projection diverges at the poles)
MERCATOR_LAT_MAX = 85.05112877980659


def lonlat_to_tile_frac(lon, lat, z):
    """Fractional tile coordinates — transform.rs:20-23.
    x_frac = (lon+180)/360 · 2^z ;  y_frac = (1 − ln(tan φ + sec φ)/π)/2 · 2^z
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = np.float64(2.0) ** np.int64(z)
    x_frac = (lon + 180.0) / 360.0 * n
    lat_rad = np.radians(lat)
    # |lat| = 90 (e.g. world-mask vertices) → ±inf y_frac; downstream bbox
    # culls handle the infinities, so just suppress the numpy warnings
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        y_frac = (1.0 - np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / np.pi) / 2.0 * n
    return x_frac, y_frac


def assign_tile(lon, lat, z):
    """(lon, lat) → integer (x, y) tile at zoom z — the graft's
    tile-assignment kernel (floor of the fractional coords, clamped to the
    valid range so lat==±MERCATOR_LAT_MAX stays in the edge tile)."""
    x_frac, y_frac = lonlat_to_tile_frac(lon, lat, z)
    n = np.int64(1) << np.int64(z)
    x = np.clip(np.floor(x_frac).astype(np.int64), 0, n - 1)
    y = np.clip(np.floor(y_frac).astype(np.int64), 0, n - 1)
    return x, y


def tile_y_to_lat(y, n):
    """transform.rs:47-50: atan(sinh(π·(1 − 2y/n))) in degrees."""
    y = np.asarray(y, dtype=np.float64)
    return np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * y / n))))


def tile_bounds(z, x, y):
    """Tile WGS84 envelope (west, south, east, north) — transform.rs:52-71."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = np.float64(2.0) ** np.int64(z)
    west = x / n * 360.0 - 180.0
    east = (x + 1.0) / n * 360.0 - 180.0
    north = tile_y_to_lat(y, n)
    south = tile_y_to_lat(y + 1.0, n)
    return west, south, east, north


def project_to_tile(lon, lat, z, tile_x, tile_y, extent=4096):
    """WGS84 → tile-local integer-grid coords — transform.rs:16-29.
    The same filter geometry projects DIFFERENTLY per layer extent
    (transform.rs:89-108), so extent is an argument, not a constant."""
    x_frac, y_frac = lonlat_to_tile_frac(lon, lat, z)
    x_local = (x_frac - np.asarray(tile_x, dtype=np.float64)) * float(extent)
    y_local = (y_frac - np.asarray(tile_y, dtype=np.float64)) * float(extent)
    return x_local, y_local


def bbox_intersects_tile(minx, miny, maxx, maxy, extent=4096):
    """AABB vs [0, extent]² overlap — transform.rs:31-45. Empty bbox
    (NaN) → False."""
    e = float(extent)
    minx = np.asarray(minx, dtype=np.float64)
    miny = np.asarray(miny, dtype=np.float64)
    maxx = np.asarray(maxx, dtype=np.float64)
    maxy = np.asarray(maxy, dtype=np.float64)
    ok = (minx <= e) & (maxx >= 0.0) & (miny <= e) & (maxy >= 0.0)
    return ok & ~(np.isnan(minx) | np.isnan(miny) | np.isnan(maxx) | np.isnan(maxy))


# ---- ordering keys ----------------------------------------------------


def quadkey_array(z, x, y):
    """Vectorized quadkey as a numpy object array of python strings."""
    x = np.atleast_1d(np.asarray(x, dtype=np.int64))
    y = np.atleast_1d(np.asarray(y, dtype=np.int64))
    n = len(x)
    z = int(z)
    if z == 0:
        return np.full(n, "", dtype=object)
    digits = np.zeros((n, z), dtype=np.uint8)
    for i in range(z):
        bit = z - 1 - i
        digits[:, i] = (((y >> bit) & 1) * 2 + ((x >> bit) & 1)).astype(np.uint8) + ord("0")
    flat = digits.tobytes().decode("ascii")
    return np.array([flat[i * z:(i + 1) * z] for i in range(n)], dtype=object)


def hilbert_xy_to_d(z, x, y):
    """Hilbert curve index of (x, y) on the 2^z × 2^z grid — vectorized
    classic xy2d (bit loop over z iterations, whole-array ops). This is the
    curve the PMTiles spec (and the pmtiles crate's TileId ordering used at
    processing.rs:38) defines for tile addressing."""
    x = np.array(x, dtype=np.int64, copy=True)
    y = np.array(y, dtype=np.int64, copy=True)
    d = np.zeros_like(x)
    s = np.int64(1) << np.int64(max(int(z) - 1, 0))
    if int(z) == 0:
        return d
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f, y_f = x[flip], y[flip]
        x[flip] = s - 1 - x_f
        y[flip] = s - 1 - y_f
        x_sw = x[swap].copy()
        x[swap] = y[swap]
        y[swap] = x_sw
        s >>= 1
    return d


def zoom_offset(z):
    """Number of tiles in all zooms < z: sum_{i<z} 4^i = (4^z − 1) / 3."""
    return ((np.int64(1) << np.int64(2 * int(z))) - 1) // 3


def tile_id(z, x, y):
    """PMTiles-style global tile id: zoom_offset(z) + hilbert_d(z, x, y).
    Ascending tile_id = the reference's deterministic output order
    (processing.rs:38 `coords.sort_unstable()` on pmtiles TileId)."""
    return zoom_offset(z) + hilbert_xy_to_d(z, x, y)


def tile_id_to_zxy(tid):
    """Inverse of tile_id (scalar or array) — for tests and sinks."""
    tid = np.atleast_1d(np.asarray(tid, dtype=np.int64))
    z = np.zeros_like(tid)
    acc = np.zeros_like(tid)
    for zz in range(0, 31):
        count = np.int64(1) << np.int64(2 * zz)
        more = tid >= acc + count
        z[more] = zz + 1
        acc[more] += count
    d = tid - zoom_offset_arr(z)
    x, y = hilbert_d_to_xy_arr(z, d)
    return z, x, y


def zoom_offset_arr(z):
    return ((np.int64(1) << (2 * z.astype(np.int64))) - 1) // 3


def hilbert_d_to_xy_arr(z, d):
    """Vectorized d2xy supporting per-row zoom (loop to max zoom; rows with
    smaller z finish early via masking)."""
    d = np.array(d, dtype=np.int64, copy=True)
    z = np.asarray(z, dtype=np.int64)
    x = np.zeros_like(d)
    y = np.zeros_like(d)
    t = d.copy()
    maxz = int(z.max()) if len(z) else 0
    s_vals = np.int64(1)
    s = np.ones_like(d)
    level = np.zeros_like(d)
    for _ in range(maxz):
        active = level < z
        rx = np.zeros_like(d)
        ry = np.zeros_like(d)
        rx[active] = 1 & (t[active] // 2)
        ry[active] = 1 & (t[active] ^ rx[active])
        # rotate
        swap = active & (ry == 0)
        flip = swap & (rx == 1)
        x_f, y_f = x[flip], y[flip]
        x[flip] = s[flip] - 1 - x_f
        y[flip] = s[flip] - 1 - y_f
        x_sw = x[swap].copy()
        x[swap] = y[swap]
        y[swap] = x_sw
        x[active] += s[active] * rx[active]
        y[active] += s[active] * ry[active]
        t[active] //= 4
        s[active] *= 2
        level[active] += 1
    return x, y
