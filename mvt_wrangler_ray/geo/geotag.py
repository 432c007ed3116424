"""Deterministic geotagging.

The input table (BASELINE.json input_hint) carries NO lon/lat — the engine
derives a stable, reproducible position from the row id (FIXTURES.md §1
"Geo note"). Two generators:

  * ``geotag_ints`` — Knuth multiplicative hashing over an int64 id with
    explicit mod-2^32 arithmetic. Deliberately simple enough to express in
    ANSI SQL, so the DuckDB oracle can reproduce it exactly
    (__ray_entry__.oracle_sql uses the same formula).
  * ``geotag_strings`` — FNV-1a 64 over the id bytes (for string
    image_ids), then the same mapping.

lon ∈ [-180, 180), lat ∈ (-85.0511, 85.0511) — Web-Mercator-valid.
"""

from __future__ import annotations

import numpy as np

from .tilemath import MERCATOR_LAT_MAX

_M32 = np.uint64(0xFFFFFFFF)
_KNUTH = np.uint64(2654435761)
_LAT_MUL = np.uint64(2246822519)
_LAT_ADD = np.uint64(3266489917)

# SQL fragments mirroring geotag_ints — kept adjacent to the numpy code so
# they can't drift. {id} is the integer id column expression. numpy wraps
# the id to uint64 then masks to 32 bits, which equals the NON-NEGATIVE
# residue mod 2^32; the SQL therefore (a) normalizes the residue with the
# +2^32 trick (DuckDB's % keeps the dividend's sign) and (b) multiplies in
# HUGEINT (BIGINT overflows for id >= ~3.47e9) — exact for every int64 id.
_SQL_ID32 = "(((CAST({id} AS HUGEINT) % 4294967296) + 4294967296) % 4294967296)"
SQL_LON = (f"((({_SQL_ID32} * 2654435761) % 4294967296) "
           "/ 4294967296.0 * 360.0 - 180.0)")
SQL_LAT = (
    f"((({_SQL_ID32} * 2246822519 + 3266489917) % 4294967296) / 4294967296.0 "
    f"* {2 * MERCATOR_LAT_MAX!r} - {MERCATOR_LAT_MAX!r})"
)


def geotag_ints(ids) -> tuple[np.ndarray, np.ndarray]:
    """int64 ids → (lon, lat), exactly reproducible in SQL."""
    u = np.asarray(ids).astype(np.uint64)
    hlon = (u * _KNUTH) & _M32
    hlat = (u * _LAT_MUL + _LAT_ADD) & _M32
    lon = hlon.astype(np.float64) / 4294967296.0 * 360.0 - 180.0
    lat = hlat.astype(np.float64) / 4294967296.0 * (2 * MERCATOR_LAT_MAX) - MERCATOR_LAT_MAX
    return lon, lat


def fnv1a64_strings(ids) -> np.ndarray:
    """Vectorized FNV-1a 64 over variable-length ASCII/UTF-8 ids: pad to a
    byte matrix, fold per byte column (loop over max length, each step
    whole-array)."""
    arr = [s.encode() if isinstance(s, str) else bytes(s) for s in ids]
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    maxlen = max(len(b) for b in arr)
    mat = np.zeros((n, maxlen), dtype=np.uint8)
    lens = np.empty(n, dtype=np.int64)
    for i, b in enumerate(arr):
        mat[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        lens[i] = len(b)
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    for col in range(maxlen):
        active = lens > col
        hv = h[active]
        hv = (hv ^ mat[active, col].astype(np.uint64)) * prime
        h[active] = hv
    return h


def geotag_strings(ids) -> tuple[np.ndarray, np.ndarray]:
    """string ids → (lon, lat) via FNV-1a 64 then the int mapping."""
    return geotag_ints(fnv1a64_strings(ids).astype(np.int64))


def append_lonlat_batch(batch, id_col: str = "doc_id"):
    """map_batches body: append deterministic lon/lat to an Arrow batch.

    Named distinctly from stages.geospatial.geotag_batch (the
    EngineConfig-driven superset with geo-hint handling) so the two
    can't be confused at an import site — this is the minimal id→coords
    append the entry-file queries use. Lives in the package (not the
    driver entry file) so cloudpickle ships it by reference to an
    importable module regardless of what module name the harness
    imported ``__ray_entry__.py`` under."""
    import pyarrow as pa

    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    lon, lat = geotag_ints(ids)
    return (batch.append_column("lon", pa.array(lon, pa.float64()))
                 .append_column("lat", pa.array(lat, pa.float64())))


def append_tile_xyz_batch(batch, z: int):
    """map_batches body: append (z, x, y) web-mercator tile columns
    (stages.geospatial.tile_assign_batch is the EngineConfig superset
    that also emits Hilbert tile_id + quadkey)."""
    import pyarrow as pa

    from .tilemath import assign_tile

    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    x, y = assign_tile(lon, lat, z)
    return (batch.append_column("z", pa.array(np.full(len(x), z, np.int64), pa.int64()))
                 .append_column("x", pa.array(x, pa.int64()))
                 .append_column("y", pa.array(y, pa.int64())))
