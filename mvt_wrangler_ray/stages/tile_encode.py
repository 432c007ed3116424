"""Tile grouping / encoding — the engine's one required shuffle — plus
salted two-phase aggregates for skewed keys.

Reference semantics: tile reassembly and pool re-encoding
(transform.rs:89-201, A1/M12/O3 in SURVEY §2), gzip of the encoded tile
(processing.rs:131-155), deterministic output order by ascending tile_id
(processing.rs:38).

Canonicalization note (SURVEY §2.8): the reference's tag iteration order
is HashMap order — nondeterministic. We canonicalize: rows within a tile
sort by the id column, tag keys sort lexicographically. Fixture
comparisons are set-based, so both engines agree.
"""

from __future__ import annotations

import gzip
import json
from typing import Dict, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import EngineConfig


def _pool_encode(ids: list, tag_cols: list, col_vals: list):
    """First-seen key/value pool re-encode over row-ordered cells (M12)
    — shared by the pandas and Arrow tile encoders. Pool re-encode is
    inherently row-ordered (§2.8 canonical order), but the per-cell
    access is plain list indexing (10-50x cheaper per feature than
    iterrows' per-row Series construction)."""
    keys_pool: list = []
    values_pool: list = []
    key_idx: Dict[str, int] = {}
    val_idx: Dict[object, int] = {}
    feats = []
    for i in range(len(ids)):
        tags = []
        for j, c in enumerate(tag_cols):
            v = col_vals[j][i]
            if v is None or (isinstance(v, float) and v != v):
                continue
            if isinstance(v, np.generic):
                v = v.item()
            ki = key_idx.get(c)
            if ki is None:
                ki = key_idx[c] = len(keys_pool)
                keys_pool.append(c)
            vkey = (type(v).__name__, v)
            vi = val_idx.get(vkey)
            if vi is None:
                vi = val_idx[vkey] = len(values_pool)
                values_pool.append(v)
            tags.extend((ki, vi))
        feats.append({"id": ids[i], "tags": tags})
    return keys_pool, values_pool, feats


def _manifest_blob(tile_id: int, z: int, x: int, y: int, keys: list,
                   values: list, feats: list, compress: bool) -> bytes:
    manifest = {"tile_id": tile_id, "z": z, "x": x, "y": y,
                "keys": keys, "values": values, "features": feats}
    raw = json.dumps(manifest, separators=(",", ":"), default=str).encode()
    return gzip.compress(raw, mtime=0) if compress else raw


def encode_tile_group(group: pd.DataFrame, cfg: EngineConfig = EngineConfig(),
                      compress: bool = True) -> pd.DataFrame:
    """``groupby(tile_id).map_groups(encode_tile_group)``: one output row
    per tile — (tile_id, z, x, y, quadkey, n_features, blob). The blob is
    a gzip-compressed JSON manifest of the tile's surviving rows and
    non-null tags (the graft analogue of MVT re-encode M13 + gzip S7),
    with first-seen key/value pools like the reference's layer dicts
    (M12) so pool indices round-trip. Pandas-group variant; the A1
    shuffle paths use the Arrow-native encode_tile_group_arrow."""
    g = group.sort_values(cfg.id_col, kind="stable")
    tag_cols = [c for c in cfg.tag_cols if c in g.columns]
    # columnar extraction ONCE (Series.tolist converts numpy scalars to
    # python scalars)
    ids = g[cfg.id_col].tolist()
    col_vals = [g[c].tolist() for c in tag_cols]
    keys_pool, values_pool, feats = _pool_encode(ids, tag_cols, col_vals)
    tid = int(g["tile_id"].iloc[0])
    z, x, y = int(g["z"].iloc[0]), int(g["x"].iloc[0]), int(g["y"].iloc[0])
    blob = _manifest_blob(tid, z, x, y, keys_pool, values_pool, feats,
                          compress)
    return pd.DataFrame({
        "tile_id": [tid], "z": [z], "x": [x], "y": [y],
        "quadkey": [g["quadkey"].iloc[0]],
        "n_features": [len(feats)],
        "blob": [blob],
    })


_TILE_BLOB_SCHEMA = pa.schema([
    ("tile_id", pa.int64()), ("z", pa.int64()), ("x", pa.int64()),
    ("y", pa.int64()), ("quadkey", pa.string()),
    ("n_features", pa.int64()), ("blob", pa.binary())])


def encode_tile_group_arrow(g: pa.Table, cfg: EngineConfig = EngineConfig(),
                            compress: bool = True) -> pa.Table:
    """Arrow-native single-tile encoder — byte-identical blobs to
    encode_tile_group without a pandas round trip on either side of the
    A1 exchange (round-3 verdict item 4). The per-feature pool loop is
    inherently row-ordered (§2.8); cell access is plain list indexing
    over to_pylist columns."""
    idx = pa.compute.sort_indices(g, sort_keys=[(cfg.id_col, "ascending")])
    g = g.take(idx)
    tag_cols = [c for c in cfg.tag_cols if c in g.column_names]
    ids = g[cfg.id_col].to_pylist()
    col_vals = [g[c].to_pylist() for c in tag_cols]
    keys_pool, values_pool, feats = _pool_encode(ids, tag_cols, col_vals)
    tid = int(g["tile_id"][0].as_py())
    z, x, y = (int(g["z"][0].as_py()), int(g["x"][0].as_py()),
               int(g["y"][0].as_py()))
    blob = _manifest_blob(tid, z, x, y, keys_pool, values_pool, feats,
                          compress)
    return pa.table({
        "tile_id": pa.array([tid], pa.int64()),
        "z": pa.array([z], pa.int64()),
        "x": pa.array([x], pa.int64()),
        "y": pa.array([y], pa.int64()),
        "quadkey": pa.array([g["quadkey"][0].as_py()], pa.string()),
        "n_features": pa.array([len(feats)], pa.int64()),
        "blob": pa.array([blob], pa.binary()),
    }, schema=_TILE_BLOB_SCHEMA)


def decode_tile_blob(blob: bytes) -> dict:
    """Inverse of encode_tile_group (tests + downstream readers)."""
    try:
        raw = gzip.decompress(blob)
    except OSError:
        raw = blob
    m = json.loads(raw)
    out = []
    for f in m["features"]:
        tags = {}
        t = f["tags"]
        for i in range(0, len(t), 2):
            tags[m["keys"][t[i]]] = m["values"][t[i + 1]]
        out.append({"id": f["id"], "tags": tags})
    m["decoded"] = out
    return m


# ---- salted two-phase aggregates --------------------------------------


def partial_tile_counts(batch: pa.Table, key: str = "tile_id",
                        carry=("z", "x", "y")) -> pa.Table:
    """Phase 1 (inside map_batches, before any shuffle): collapse a batch
    to one row per key — the combiner that turns the wide
    groupby-over-rows into a groupby-over-partials (SURVEY §4 skew row).
    Hot tiles therefore arrive at the shuffle pre-reduced per block, which
    IS the salting: the salt is the block id."""
    cols = [c for c in carry if c in batch.column_names]
    tbl = batch.select([key, *cols])
    g = tbl.group_by(key).aggregate(
        [(key, "count")] + [(c, "max") for c in cols])
    names = {f"{key}_count": "partial_count"}
    names.update({f"{c}_max": c for c in cols})
    return g.rename_columns([names.get(c, c) for c in g.column_names])


def tile_counts_two_phase(ds, key: str = "tile_id", carry=("z", "x", "y"),
                          num_buckets: int = 64):
    """Full two-phase count: map-side Arrow combine per block, then a
    bucketed hash shuffle with vectorized per-bucket merge (see
    stages/shuffle.py — Ray's sort-based aggregate walks 10^5 tile groups
    in Python; the bucketed plan crosses Python 64 times)."""
    from .shuffle import grouped_count

    # wide path: at high zooms partials ≈ rows, so coalesce before the
    # exchange (see shuffle.two_phase_aggregate)
    return grouped_count(ds, [key], out="n_images", carry=carry,
                         num_buckets=num_buckets, coalesce_blocks=num_buckets)


def encode_tiles_salted(ds, cfg: EngineConfig = EngineConfig(),
                        salt_buckets: Optional[int] = None):
    """Salted two-phase tile-blob encode for skewed tiles (north_rule):

    phase 1: groupby((tile_id, salt)) where salt = row-hash %
             cfg.salt_buckets — a hot tile's rows split across
             salt_buckets groups, each encoding a PARTIAL manifest in
             parallel (no single straggler task holds the whole tile);
    phase 2: groupby(tile_id) merges the partial manifests (concatenate
             feature lists, re-encode pools) — input is one small row
             per (tile, salt), so the second shuffle is tiny.

    Equivalent output to the unsalted path (encode_tile_group over whole
    groups): features canonically sorted by id at merge. Both group
    bodies are Arrow-native — no pandas conversion on either side of
    the A1 exchange (round-3 verdict item 4)."""
    import json

    import pyarrow as pa

    from .shuffle import stable_hash_columns

    sb = salt_buckets or cfg.salt_buckets

    def add_salt(batch: pa.Table) -> pa.Table:
        h = stable_hash_columns(batch, [cfg.id_col])
        return batch.append_column(
            "salt", pa.array((h % np.uint64(sb)).astype(np.int64), pa.int64()))

    def partial_encode(g: pa.Table) -> pa.Table:
        return encode_tile_group_arrow(g.drop_columns(["salt"]), cfg,
                                       compress=False)

    def merge(g: pa.Table) -> pa.Table:
        manifests = [json.loads(b) for b in g["blob"].to_pylist()]
        feats = []
        for m in manifests:
            for f in m["features"]:
                tags = {m["keys"][f["tags"][i]]: m["values"][f["tags"][i + 1]]
                        for i in range(0, len(f["tags"]) - 1, 2)}
                feats.append({"id": f["id"], "tags": tags})
        feats.sort(key=lambda f: f["id"])
        keys, values, kidx, vidx = [], [], {}, {}
        out_feats = []
        for f in feats:
            pairs = []
            for k, v in f["tags"].items():
                ki = kidx.setdefault(k, len(keys))
                if ki == len(keys):
                    keys.append(k)
                vk = (type(v).__name__, v)
                vi = vidx.setdefault(vk, len(values))
                if vi == len(values):
                    values.append(v)
                pairs.extend((ki, vi))
            out_feats.append({"id": f["id"], "tags": pairs})
        m0 = manifests[0]
        blob = gzip.compress(json.dumps(
            {"tile_id": m0["tile_id"], "z": m0["z"], "x": m0["x"],
             "y": m0["y"], "keys": keys, "values": values,
             "features": out_feats},
            separators=(",", ":"), default=str).encode(), mtime=0)
        return pa.table({
            "tile_id": pa.array([m0["tile_id"]], pa.int64()),
            "z": pa.array([m0["z"]], pa.int64()),
            "x": pa.array([m0["x"]], pa.int64()),
            "y": pa.array([m0["y"]], pa.int64()),
            "quadkey": pa.array([g["quadkey"][0].as_py()], pa.string()),
            "n_features": pa.array([len(out_feats)], pa.int64()),
            "blob": pa.array([blob], pa.binary()),
        }, schema=_TILE_BLOB_SCHEMA)

    salted = ds.map_batches(add_salt, batch_format="pyarrow")
    partials = salted.groupby(["tile_id", "salt"]).map_groups(
        partial_encode, batch_format="pyarrow")
    return partials.groupby("tile_id").map_groups(merge,
                                                  batch_format="pyarrow")


def encode_tiles_bucketed(ds, cfg: EngineConfig = EngineConfig(),
                          num_buckets: int = 64):
    """Tile-blob encode with a BOUNDED group count: tiles are routed to
    num_buckets hash buckets (one shuffle, like the unsalted path), and
    each bucket encodes ALL of its tiles in one Arrow-native map_groups
    call — Ray crosses the Python boundary num_buckets times, not once
    per tile (millions at depth-12+ pyramid scale), and no pandas
    conversion happens on either side of the exchange.
    Output rows identical to groupby(tile_id) + encode_tile_group."""
    from .shuffle import add_bucket_column

    bucketed = ds.map_batches(
        lambda b: add_bucket_column(b, ["tile_id"], num_buckets),
        batch_format="pyarrow")

    def encode_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _TILE_BLOB_SCHEMA.empty_table()
        g = g.drop_columns(["bucket"]).combine_chunks()
        tid = g["tile_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(tid, kind="stable")
        g = g.take(pa.array(order, pa.int64()))
        tid = tid[order]
        cuts = np.nonzero(np.diff(tid))[0] + 1
        starts = np.concatenate([[0], cuts])
        ends = np.concatenate([cuts, [len(tid)]])
        return pa.concat_tables(
            [encode_tile_group_arrow(g.slice(int(s), int(e - s)), cfg)
             for s, e in zip(starts, ends)])

    return bucketed.groupby("bucket").map_groups(
        encode_bucket, batch_format="pyarrow")


def rollup_pyramid_counts(counts_ds, z_bottom: int, z_top: int,
                          num_buckets: int = 16):
    """Tile-pyramid rollup: per-tile counts (z, x, y, n) at z_bottom
    aggregated up the pyramid to z_top (parent = x//2, y//2; counts
    sum). Each level aggregates the PREVIOUS level's output, so the
    exchanges shrink 4x per level — the standard tile-service
    overview-generation aggregate. Returns the union of all levels
    z_top..z_bottom."""
    from .shuffle import two_phase_aggregate

    levels = [counts_ds]
    cur = counts_ds
    for z in range(z_bottom - 1, z_top - 1, -1):
        def to_parent(b: pa.Table, _z=z) -> pa.Table:
            x = b["x"].to_numpy(zero_copy_only=False) // 2
            y = b["y"].to_numpy(zero_copy_only=False) // 2
            return pa.table({
                "z": pa.array(np.full(len(b), _z, np.int64), pa.int64()),
                "x": pa.array(x.astype(np.int64), pa.int64()),
                "y": pa.array(y.astype(np.int64), pa.int64()),
                "n": b["n"].cast(pa.int64()),
            })

        cur = two_phase_aggregate(
            cur.map_batches(to_parent, batch_format="pyarrow"),
            keys=["z", "x", "y"],
            partial_aggs=[("n", "sum")], partial_names=["n"],
            final_aggs=[("n", "sum")], final_names=["n"],
            num_buckets=num_buckets)
        cur = cur.map_batches(
            lambda b: pa.table({"z": b["z"].cast(pa.int64()),
                                "x": b["x"].cast(pa.int64()),
                                "y": b["y"].cast(pa.int64()),
                                "n": b["n"].cast(pa.int64())}),
            batch_format="pyarrow").materialize()
        levels.append(cur)
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def top_k_tiles(ds, k: int = 20, key: str = "tile_id"):
    """Top-k dense tiles from the two-phase counts (small result)."""
    counted = tile_counts_two_phase(ds, key=key)
    return counted.sort("n_images", descending=True).limit(k)
