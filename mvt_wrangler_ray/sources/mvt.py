"""Pure-Python Mapbox Vector Tile (MVT) wire codec.

Implemented from the PUBLIC MVT 2.1 specification
(github.com/mapbox/vector-tile-spec) — protobuf field numbers:

    Tile:    layers = 3 (repeated message)
    Layer:   version=15(varint) name=1(string) features=2(repeated msg)
             keys=3(repeated string) values=4(repeated msg)
             extent=5(varint, default 4096)
    Feature: id=1(varint) tags=2(packed varint) type=3(enum varint)
             geometry=4(packed varint)
    Value:   oneof — string=1 float=2(fixed32) double=3(fixed64)
             int=4(varint) uint=5(varint) sint=6(zigzag varint) bool=7

Geometry command stream: (cmd & 0x7, count = cmd >> 3); MoveTo=1,
LineTo=2, ClosePath=7; coordinates are zigzag-encoded deltas in
tile-local integer space.

This is the analogue of the reference's prost/geozero decode+encode
(transform.rs:79-80, 204) — built from the spec, not ported. Decoding is
batch-friendly: decode_tile() returns plain dict/list structures that the
flattening stage turns into Arrow columns.
"""

from __future__ import annotations

import struct
from typing import Iterator, List, Optional, Tuple

import numpy as np


# ---- varint primitives -------------------------------------------------


def read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def write_varint(value: int, out: bytearray):
    if value < 0:
        # python's arithmetic shift never terminates for negatives; a
        # caller passing a raw (non-zigzagged) negative must fail fast
        raise ValueError(f"varint value must be non-negative, got {value}")
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def zigzag_decode(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def zigzag_encode(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def _iter_fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a protobuf buffer.
    wire types: 0 varint, 1 fixed64, 2 length-delimited, 5 fixed32."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = read_varint(buf, pos)
        field, wt = key >> 3, key & 0x7
        if wt == 0:
            v, pos = read_varint(buf, pos)
        elif wt == 1:
            if pos + 8 > n:
                raise ValueError(
                    f"truncated protobuf buffer: fixed64 field {field} "
                    f"needs 8 bytes, {n - pos} remain")
            v = buf[pos:pos + 8]
            pos += 8
        elif wt == 2:
            ln, pos = read_varint(buf, pos)
            if pos + ln > n:
                raise ValueError(
                    f"truncated protobuf buffer: field {field} declares "
                    f"{ln} bytes, {n - pos} remain")
            v = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            if pos + 4 > n:
                raise ValueError(
                    f"truncated protobuf buffer: fixed32 field {field} "
                    f"needs 4 bytes, {n - pos} remain")
            v = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, v


# ---- Value -------------------------------------------------------------


def decode_value(buf: bytes):
    """→ python scalar; mirrors the mvt Value oneof coercion the
    reference applies (expression_compiler.rs:78-96): first present field
    wins in its order (string, int, uint, sint, float, double, bool)."""
    fields = {}
    for f, wt, v in _iter_fields(buf):
        fields[f] = (wt, v)
    if 1 in fields:
        return fields[1][1].decode("utf-8")
    if 4 in fields:
        v = fields[4][1]
        return v - (1 << 64) if v >= (1 << 63) else v  # int64 two's complement
    if 5 in fields:
        # uint (field 5) keeps its provenance as np.uint64 so re-encode
        # writes field 5 again (and values >= 2^63 survive the round trip
        # instead of being reinterpreted through the int64 field)
        return np.uint64(fields[5][1])
    if 6 in fields:
        return zigzag_decode(fields[6][1])
    if 2 in fields:
        # preserve float32 provenance: the reference keeps this as f32 and
        # Displays it at f32 precision ("0.1", not "0.10000000149011612")
        return np.float32(struct.unpack("<f", fields[2][1])[0])
    if 3 in fields:
        return struct.unpack("<d", fields[3][1])[0]
    if 7 in fields:
        return bool(fields[7][1])
    return None


def encode_value(v) -> bytes:
    out = bytearray()
    if isinstance(v, bool):
        out.append((7 << 3) | 0)
        write_varint(1 if v else 0, out)
    elif isinstance(v, str):
        b = v.encode("utf-8")
        out.append((1 << 3) | 2)
        write_varint(len(b), out)
        out.extend(b)
    elif isinstance(v, np.uint64):
        # uint stays uint on re-encode (wire field 5)
        out.append((5 << 3) | 0)
        write_varint(int(v), out)
    elif isinstance(v, (int, np.integer)):
        v = int(v)
        if v >= 0:
            out.append((4 << 3) | 0)
            write_varint(v, out)
        else:
            out.append((6 << 3) | 0)
            write_varint(zigzag_encode(v), out)
    elif isinstance(v, np.float32):
        # f32 stays f32 on re-encode (bit-exact round trip, field 2)
        out.append((2 << 3) | 5)
        out.extend(struct.pack("<f", v))
    elif isinstance(v, float):
        out.append((3 << 3) | 1)
        out.extend(struct.pack("<d", v))
    elif v is None:
        pass
    else:
        raise TypeError(f"unsupported tag value {type(v)}")
    return bytes(out)


# ---- geometry ----------------------------------------------------------

GEOM_UNKNOWN, GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON = 0, 1, 2, 3
_TYPE_NAMES = {GEOM_POINT: "Point", GEOM_LINESTRING: "LineString",
               GEOM_POLYGON: "Polygon", GEOM_UNKNOWN: "Unknown"}


def decode_geometry(geom: List[int]) -> List[List[Tuple[int, int]]]:
    """Command stream → list of paths (each a list of (x, y) int points).
    ClosePath repeats the first vertex (polygon ring closure)."""
    paths: List[List[Tuple[int, int]]] = []
    cur: List[Tuple[int, int]] = []
    x = y = 0
    i = 0
    n = len(geom)
    while i < n:
        cmd = geom[i]
        op, count = cmd & 0x7, cmd >> 3
        i += 1
        if op == 1:  # MoveTo
            for _ in range(count):
                x += zigzag_decode(geom[i]); y += zigzag_decode(geom[i + 1])
                i += 2
                if cur:
                    paths.append(cur)
                cur = [(x, y)]
        elif op == 2:  # LineTo
            for _ in range(count):
                x += zigzag_decode(geom[i]); y += zigzag_decode(geom[i + 1])
                i += 2
                cur.append((x, y))
        elif op == 7:  # ClosePath
            if cur:
                cur.append(cur[0])
        else:
            raise ValueError(f"bad geometry op {op}")
    if cur:
        paths.append(cur)
    return paths


def encode_geometry(paths: List[List[Tuple[int, int]]], geom_type: int) -> List[int]:
    """Inverse of decode_geometry (ClosePath emitted for polygons when the
    path is explicitly closed). POINT geometry encodes as the spec's
    single MoveTo command with count = number of points (4.3.4.2) — a
    per-point MoveTo(1) stream is invalid MVT for multipoints."""
    out: List[int] = []
    x = y = 0
    if geom_type == GEOM_POINT:
        pts = [p for path in paths for p in path]
        if not pts:
            return out
        out.append((len(pts) << 3) | 1)  # MoveTo n
        for px, py in pts:
            out.extend([zigzag_encode(px - x), zigzag_encode(py - y)])
            x, y = px, py
        return out
    for path in paths:
        closed = geom_type == GEOM_POLYGON and len(path) > 1 and path[0] == path[-1]
        pts = path[:-1] if closed else path
        if not pts:
            continue
        out.append((1 << 3) | 1)  # MoveTo 1
        dx, dy = pts[0][0] - x, pts[0][1] - y
        out.extend([zigzag_encode(dx), zigzag_encode(dy)])
        x, y = pts[0]
        rest = pts[1:]
        if rest:
            out.append((len(rest) << 3) | 2)  # LineTo n
            for px, py in rest:
                out.extend([zigzag_encode(px - x), zigzag_encode(py - y)])
                x, y = px, py
        if closed:
            out.append((1 << 3) | 7)  # ClosePath
    return out


# ---- Feature / Layer / Tile -------------------------------------------


def decode_tile(buf: bytes) -> dict:
    """→ {"layers": [{"name", "extent", "version", "keys", "values",
    "features": [{"id", "type", "type_name", "tags", "geometry"}]}]}.
    tags stay as raw index pairs (the reference materializes them into a
    map per feature, transform.rs:118-128 — our flatten stage does the
    same into an Arrow map column)."""
    layers = []
    for f, wt, v in _iter_fields(buf):
        if f == 3 and wt == 2:
            layers.append(_decode_layer(v))
    return {"layers": layers}


def _decode_layer(buf: bytes) -> dict:
    name = ""
    version = 1
    extent = 4096
    keys: List[str] = []
    values: List[object] = []
    feats: List[dict] = []
    for f, wt, v in _iter_fields(buf):
        if f == 1:
            name = v.decode("utf-8")
        elif f == 15:
            version = v
        elif f == 5:
            extent = v
        elif f == 3:
            keys.append(v.decode("utf-8"))
        elif f == 4:
            values.append(decode_value(v))
        elif f == 2:
            feats.append(_decode_feature(v))
    return {"name": name, "version": version, "extent": extent,
            "keys": keys, "values": values, "features": feats}


def _decode_packed(v, wt) -> List[int]:
    if wt == 0:
        return [v]
    out = []
    pos = 0
    while pos < len(v):
        x, pos = read_varint(v, pos)
        out.append(x)
    return out


def _decode_feature(buf: bytes) -> dict:
    fid = None
    tags: List[int] = []
    gtype = GEOM_UNKNOWN
    geom: List[int] = []
    for f, wt, v in _iter_fields(buf):
        if f == 1:
            fid = v
        elif f == 2:
            tags.extend(_decode_packed(v, wt))
        elif f == 3:
            gtype = v
        elif f == 4:
            geom.extend(_decode_packed(v, wt))
    return {"id": fid, "type": int(gtype),
            "type_name": _TYPE_NAMES.get(int(gtype), "Unknown"),
            "tags": tags, "geometry": geom}


def _write_field(out: bytearray, field: int, wt: int, payload):
    out.append((field << 3) | wt)
    if wt == 0:
        write_varint(payload, out)
    elif wt == 2:
        write_varint(len(payload), out)
        out.extend(payload)
    else:
        out.extend(payload)


def encode_tile(tile: dict) -> bytes:
    out = bytearray()
    for layer in tile["layers"]:
        _write_field(out, 3, 2, _encode_layer(layer))
    return bytes(out)


def _encode_layer(layer: dict) -> bytes:
    out = bytearray()
    _write_field(out, 15, 0, layer.get("version", 2))
    _write_field(out, 1, 2, layer["name"].encode("utf-8"))
    for feat in layer["features"]:
        _write_field(out, 2, 2, _encode_feature(feat))
    for k in layer["keys"]:
        _write_field(out, 3, 2, k.encode("utf-8"))
    for v in layer["values"]:
        _write_field(out, 4, 2, encode_value(v))
    _write_field(out, 5, 0, layer.get("extent", 4096))
    return bytes(out)


def _encode_feature(feat: dict) -> bytes:
    out = bytearray()
    if feat.get("id") is not None:
        _write_field(out, 1, 0, feat["id"])
    if feat.get("tags"):
        packed = bytearray()
        for t in feat["tags"]:
            write_varint(t, packed)
        _write_field(out, 2, 2, bytes(packed))
    _write_field(out, 3, 0, feat.get("type", GEOM_UNKNOWN))
    if feat.get("geometry"):
        packed = bytearray()
        for g in feat["geometry"]:
            write_varint(g, packed)
        _write_field(out, 4, 2, bytes(packed))
    return bytes(out)
