"""Stateless geospatial stages: geotag → cell-encode → tile-assign →
(optional) pyramid expansion. All zero-copy Arrow in/out, numpy kernels
inside — each is a `ds.map_batches(fn, batch_format="pyarrow")` stage.

Semantics: tile assignment is the forward Web-Mercator formula of
/root/reference/src/transform.rs:16-29 (floor of fractional tile coords);
tile_id is the reference's output ordering key (processing.rs:38).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import EngineConfig
from ..geo import cells as cellmod
from ..geo import tilemath
from ..geo.geotag import geotag_ints, geotag_strings


def geotag_batch(batch: pa.Table, cfg: EngineConfig = EngineConfig()) -> pa.Table:
    """Derive deterministic (lon, lat) from the id column. Honors optional
    ``geo_hint_lon/lat`` columns (the synth skew cluster) where non-NaN."""
    idc = batch[cfg.id_col]
    if pa.types.is_integer(idc.type):
        lon, lat = geotag_ints(idc.to_numpy(zero_copy_only=False).astype(np.int64))
    else:
        ids = idc.to_pylist()
        lon, lat = geotag_strings(ids)
    if "geo_hint_lon" in batch.column_names:
        hlon = batch["geo_hint_lon"].to_numpy(zero_copy_only=False)
        hlat = batch["geo_hint_lat"].to_numpy(zero_copy_only=False)
        # a hint only applies when BOTH coordinates are present — a
        # partial hint would inject NaN lat and silently clamp the row
        # into an edge tile
        use = ~np.isnan(hlon) & ~np.isnan(hlat)
        lon = np.where(use, hlon, lon)
        lat = np.where(use, hlat, lat)
        batch = batch.drop_columns(["geo_hint_lon", "geo_hint_lat"])
    return batch.append_column("lon", pa.array(lon, pa.float64())) \
                .append_column("lat", pa.array(lat, pa.float64()))


def cell_encode_batch(batch: pa.Table, cfg: EngineConfig = EngineConfig()) -> pa.Table:
    """H3-style hex cell + S2-style cell + the prefix-range partition key
    (north_rule cell routing)."""
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    hexc = cellmod.hex_cell(lon, lat, cfg.hex_res)
    s2c = cellmod.s2_cell_id(lon, lat, cfg.s2_level)
    pref = cellmod.cell_range_prefix(s2c, cfg.prefix_bits)
    return (batch
            .append_column("hex_cell", pa.array(hexc.astype(np.int64), pa.int64()))
            .append_column("s2_cell", pa.array(s2c.astype(np.int64), pa.int64()))
            .append_column("cell_prefix", pa.array(pref, pa.int64())))


def tile_assign_batch(batch: pa.Table, cfg: EngineConfig = EngineConfig()) -> pa.Table:
    """Single-zoom z/x/y + Hilbert tile_id + quadkey."""
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    z = cfg.zoom
    x, y = tilemath.assign_tile(lon, lat, z)
    tid = tilemath.tile_id(z, x, y)
    qk = tilemath.quadkey_array(z, x, y)
    return (batch
            .append_column("z", pa.array(np.full(len(x), z, dtype=np.int8), pa.int8()))
            .append_column("x", pa.array(x.astype(np.int32), pa.int32()))
            .append_column("y", pa.array(y.astype(np.int32), pa.int32()))
            .append_column("tile_id", pa.array(tid, pa.int64()))
            .append_column("quadkey", pa.array(qk, pa.string())))


def build_site_tree(site_lon: np.ndarray, site_lat: np.ndarray,
                    site_ids: np.ndarray):
    """Prebuild the id-sorted KDTree2D for a fixed site set — hold the
    result in per-worker/actor state and pass it to nearest_site_batch
    as ``tree`` so the O(m log m) build happens once per worker, not
    once per batch."""
    from ..geo.kdtree import KDTree2D

    site_ids = np.asarray(site_ids, dtype=np.int64)
    order = np.argsort(site_ids, kind="stable")
    site_ids = site_ids[order]
    site_lon = np.asarray(site_lon)[order]
    site_lat = np.asarray(site_lat)[order]
    return KDTree2D(np.stack([site_lon, site_lat], axis=1), site_ids)


def nearest_site_batch(batch: pa.Table, site_lon: np.ndarray,
                       site_lat: np.ndarray, site_ids: np.ndarray,
                       chunk_cells: int = 4_000_000,
                       kdtree_threshold: int = 512,
                       tree=None) -> pa.Table:
    """Nearest-neighbor spatial join against a broadcast site set: each
    row gets the id of its closest site (squared-euclidean in lon/lat —
    deterministic and SQL-reproducible; switch to haversine for true
    meters). Vectorized (rows × sites) argmin in row chunks.

    The broadcast-join pattern for 'route each image to its nearest
    POI/centroid': sites ship once via ray.put / closure; no shuffle.
    For huge site sets, pre-bucket sites by cell and probe neighboring
    cells instead (the IVF pattern of stages/knn.py)."""
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    n = len(lon)
    m = len(site_lon)
    if m == 0 and tree is None:
        # fail with the actual problem, not argmin's cryptic
        # "attempt to get argmin of an empty sequence"
        raise ValueError("nearest_site_batch: empty site set")
    # canonicalize to ascending site id so BOTH paths break distance ties
    # to the lowest id (brute argmin = lowest index; kd = lexicographic
    # (dist, id) — identical once sites are id-sorted)
    site_ids = np.asarray(site_ids, dtype=np.int64)
    order = np.argsort(site_ids, kind="stable")
    if not np.array_equal(order, np.arange(m)):
        site_ids = site_ids[order]
        site_lon = np.asarray(site_lon)[order]
        site_lat = np.asarray(site_lat)[order]
    best = np.empty(n, dtype=np.int64)
    bestd = np.empty(n, dtype=np.float64)
    if tree is not None or m > kdtree_threshold:
        # large site set: exact k-d-tree NN (bbox-pruned vectorized leaf
        # checks — work scales with TOUCHED leaves, not site count).
        # Pass a prebuilt `tree` (build_site_tree, held in worker/actor
        # state — the ST4 pattern) to avoid rebuilding per batch.
        if tree is None:
            from ..geo.kdtree import KDTree2D

            tree = KDTree2D(np.stack([site_lon, site_lat], axis=1),
                            np.asarray(site_ids, dtype=np.int64))
        best, bestd = tree.nearest(lon, lat)
    else:
        ch = max(1, chunk_cells // max(m, 1))
        for s in range(0, n, ch):
            sl = slice(s, min(s + ch, n))
            d2 = ((lon[sl, None] - site_lon[None, :]) ** 2
                  + (lat[sl, None] - site_lat[None, :]) ** 2)
            idx = np.argmin(d2, axis=1)      # ties → lowest index (SQL parity:
            best[sl] = site_ids[idx]         # order sites by id ascending)
            bestd[sl] = d2[np.arange(d2.shape[0]), idx]
    return (batch
            .append_column("nearest_site", pa.array(best, pa.int64()))
            .append_column("site_dist2", pa.array(bestd, pa.float64())))


def repartition_by_cell_prefix(ds, cfg: EngineConfig = EngineConfig(),
                               num_blocks: int = 64):
    """Explicit repartition by S2-cell prefix ranges (north_rule): rows
    sharing a spatial prefix land in the same block, so later per-cell
    ops (density, neighborhood joins) shuffle less. Implemented as a
    sort on the already-computed cell_prefix column — contiguous ranges
    per block — then coalesce to the target block count."""
    return ds.sort("cell_prefix").repartition(num_blocks)


def pyramid_assign_batch(batch: pa.Table, cfg: EngineConfig = EngineConfig()) -> pa.Table:
    """Tile-pyramid expansion: replicate each row once per zoom in
    cfg.zoom_range (a flat-map shaped map_batches — rows out = rows in ×
    n_zooms). The replication is an Arrow take + per-zoom assignment, no
    Python row loop."""
    zmin, zmax = cfg.zoom_range
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    pieces = []
    for z in range(zmin, zmax + 1):
        x, y = tilemath.assign_tile(lon, lat, z)
        tid = tilemath.tile_id(z, x, y)
        qk = tilemath.quadkey_array(z, x, y)
        t = (batch
             .append_column("z", pa.array(np.full(len(x), z, dtype=np.int8), pa.int8()))
             .append_column("x", pa.array(x.astype(np.int32), pa.int32()))
             .append_column("y", pa.array(y.astype(np.int32), pa.int32()))
             .append_column("tile_id", pa.array(tid, pa.int64()))
             .append_column("quadkey", pa.array(qk, pa.string())))
        pieces.append(t)
    return pa.concat_tables(pieces)


def within_distance_pairs(ds, id_col: str = "doc_id", lon_col: str = "lon",
                          lat_col: str = "lat", radius: float = 2.0,
                          num_buckets: int = 64,
                          cell_cap: int | None = 50_000):
    """Exact planar radius self-join (the ST_DWithin pair generator):
    every unordered point pair with (dlon^2 + dlat^2) <= radius^2, each
    emitted exactly once as (id_a < id_b).

    Plan (the classic grid partitioned-spatial-join): square cells of
    side ``radius``; every point is replicated to its home cell plus the
    8 neighbors (ghosts), so any in-range partner is visible in the home
    cell of the smaller id — the one cell where the pair is generated.
    Cells co-locate via the bucketed exchange; per-cell pairing is one
    triu_indices + vectorized distance verify. Only (id, lon, lat)
    replicate (9x three narrow columns), never payloads; a dense city
    cell is bounded by ``cell_cap`` (raises — this is an exact operator,
    silently skipping a cell would drop pairs; pick a larger radius grid
    or cap upstream for degenerate data).

    Planar degree semantics (no meridian wrap, no haversine) — matches
    the SQL oracle bit-for-bit: same float64 expression tree on both
    sides. Cell assignment uses floor((lon+180)/radius); a pair at
    distance <= radius always lands in adjacent cells except a
    measure-zero float-boundary sliver (separation within 3e-14
    relative of EXACTLY radius AND straddling a cell edge) that the
    deterministic geotag lattice cannot produce."""
    r = float(radius)
    r2 = r * r
    from .shuffle import add_bucket_column

    def replicate(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lon = b[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = b[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cx = np.floor((lon + 180.0) / r).astype(np.int64)
        cy = np.floor((lat + 90.0) / r).astype(np.int64)
        n = len(ids)
        pieces = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                home = dx == 0 and dy == 0
                cell = ((cx + dx + 2) << np.int64(32)) | (cy + dy + 2)
                pieces.append(pa.table({
                    "cell": pa.array(cell, pa.int64()),
                    "pid": pa.array(ids, pa.int64()),
                    "plon": pa.array(lon, pa.float64()),
                    "plat": pa.array(lat, pa.float64()),
                    "home": pa.array(np.full(n, home), pa.bool_())}))
        return pa.concat_tables(pieces)

    def cell_pairs(g: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F401  (to_pandas group body)
        df = g.select(["cell", "pid", "plon", "plat", "home"]).to_pandas()
        df = df.sort_values(["cell", "pid"], kind="stable")
        cell = df["cell"].to_numpy()
        pid = df["pid"].to_numpy()
        plon = df["plon"].to_numpy()
        plat = df["plat"].to_numpy()
        home = df["home"].to_numpy()
        n = len(pid)
        boundary = np.zeros(n, dtype=bool)
        boundary[1:] = cell[1:] != cell[:-1]
        cuts = np.nonzero(boundary)[0]
        starts = np.concatenate([[0], cuts])
        ends = np.concatenate([cuts, [n]])
        out_a, out_b = [], []
        # anchor-chunked pair generation: peak allocation is bounded by
        # CHUNK_PAIRS candidate rows regardless of cell population, so a
        # dense cell costs time (the cell_cap guard), never worker OOM
        CHUNK_PAIRS = 4_000_000
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            if cell_cap is not None and m > cell_cap:
                raise ValueError(
                    f"within_distance_pairs: cell with {m} points exceeds "
                    f"cell_cap={cell_cap}; use a finer grid (smaller "
                    f"radius) or raise cell_cap")
            step = max(1, CHUNK_PAIRS // m)
            for a0 in range(0, m - 1, step):
                a1 = min(a0 + step, m - 1)
                # pairs (i, j) with a0 <= i < a1, i < j < m
                ia, ib = np.triu_indices(a1 - a0, k=1, m=m - a0)
                ia = ia + a0
                ib = ib + a0
                dlon = plon[s + ia] - plon[s + ib]
                dlat = plat[s + ia] - plat[s + ib]
                # strict < drops degenerate self-pairs if the input
                # violates the documented unique-id contract
                keep = (home[s + ia] & (pid[s + ia] < pid[s + ib])
                        & (dlon * dlon + dlat * dlat <= r2))
                out_a.append(pid[s + ia[keep]])
                out_b.append(pid[s + ib[keep]])
        if not out_a:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        return pa.table({"id_a": pa.array(np.concatenate(out_a), pa.int64()),
                         "id_b": pa.array(np.concatenate(out_b), pa.int64())})

    rep = ds.map_batches(replicate, batch_format="pyarrow")
    bucketed = rep.map_batches(
        lambda b: add_bucket_column(b, ["cell"], num_buckets),
        batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(
        cell_pairs, batch_format="pyarrow")


def spatial_anti_join(ds, geoms, lon_col: str = "lon",
                      lat_col: str = "lat", keep_cols=("doc_id",)):
    """Spatial ANTI join: keep only points that fall in NONE of the
    mask polygons — the complement of the point-in-polygon semi join
    (the "outside all exclusion zones" filter of geofencing and
    training-data region scrubs).

    Per batch: a vectorized bbox prefilter per mask narrows the exact
    crossing-number test to candidates, and already-hit points are
    skipped for later masks. The mask list ships once in the task
    closure (small side broadcast); for mask sets too large to loop,
    swap the prefilter for the STRtree candidate query
    (filters.tile_candidates is the same two-phase shape at tile
    granularity). No exchange: points stream through one map."""
    import pyarrow as pa

    from ..geo.geometry import points_in_polygon

    geoms = list(geoms)
    keep_cols = list(keep_cols)

    def anti(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        hit = np.zeros(len(batch), bool)
        for g in geoms:
            w, s, e, n = g.bbox
            cand = (~hit & (lon >= w) & (lon <= e)
                    & (lat >= s) & (lat <= n))
            if cand.any():
                sub = np.nonzero(cand)[0]
                hit[sub[points_in_polygon(lon[sub], lat[sub], g)]] = True
        return batch.filter(pa.array(~hit)).select(keep_cols)

    return ds.map_batches(anti, batch_format="pyarrow")
