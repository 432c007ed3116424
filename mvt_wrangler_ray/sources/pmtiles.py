"""Pure-Python PMTiles v3 archive reader + writer.

Implemented from the PUBLIC PMTiles v3 specification
(github.com/protomaps/PMTiles/blob/main/spec/v3) — the analogue of the
reference's `pmtiles` crate usage (lib.rs:68-95, processing.rs:26-39):

  127-byte header: magic "PMTiles" + version 3, section offsets/lengths
  (root directory, JSON metadata, leaf directories, tile data), tile
  counts, clustered flag, internal/tile compression, tile type, zoom
  range, bounds/center (E7 ints).

  Directories: compressed (internal_compression) varint stream —
  n_entries; n tile_id DELTAS; n run_lengths; n lengths; n offsets
  (0 ⇒ previous offset + previous length). run_length ≥ 1 ⇒ tile entry
  covering [tile_id, tile_id+run_length); run_length = 0 ⇒ pointer to a
  leaf directory at (leaf_dirs_offset + offset, length).

Tile ids are the global Hilbert ids of geo/tilemath.tile_id (the sort
key the reference relies on, processing.rs:38)."""

from __future__ import annotations

import gzip
import json
import os
import struct
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Tuple

from .mvt import read_varint, write_varint

MAGIC = b"PMTiles"
COMPRESSION_UNKNOWN, COMPRESSION_NONE, COMPRESSION_GZIP = 0, 1, 2
TILETYPE_MVT = 1


@dataclass
class PmHeader:
    root_offset: int = 0
    root_length: int = 0
    metadata_offset: int = 0
    metadata_length: int = 0
    leaf_offset: int = 0
    leaf_length: int = 0
    data_offset: int = 0
    data_length: int = 0
    addressed_tiles: int = 0
    tile_entries: int = 0
    tile_contents: int = 0
    clustered: bool = True
    internal_compression: int = COMPRESSION_GZIP
    tile_compression: int = COMPRESSION_GZIP
    tile_type: int = TILETYPE_MVT
    min_zoom: int = 0
    max_zoom: int = 0
    min_lon_e7: int = -1800000000
    min_lat_e7: int = -850000000
    max_lon_e7: int = 1800000000
    max_lat_e7: int = 850000000
    center_zoom: int = 0
    center_lon_e7: int = 0
    center_lat_e7: int = 0


def _parse_header(buf: bytes) -> PmHeader:
    if buf[:7] != MAGIC or buf[7] != 3:
        raise ValueError("not a PMTiles v3 archive")
    u64 = lambda off: struct.unpack_from("<Q", buf, off)[0]
    i32 = lambda off: struct.unpack_from("<i", buf, off)[0]
    return PmHeader(
        root_offset=u64(8), root_length=u64(16),
        metadata_offset=u64(24), metadata_length=u64(32),
        leaf_offset=u64(40), leaf_length=u64(48),
        data_offset=u64(56), data_length=u64(64),
        addressed_tiles=u64(72), tile_entries=u64(80), tile_contents=u64(88),
        clustered=buf[96] == 1,
        internal_compression=buf[97], tile_compression=buf[98],
        tile_type=buf[99], min_zoom=buf[100], max_zoom=buf[101],
        min_lon_e7=i32(102), min_lat_e7=i32(106),
        max_lon_e7=i32(110), max_lat_e7=i32(114),
        center_zoom=buf[118], center_lon_e7=i32(119), center_lat_e7=i32(123),
    )


def _serialize_header(h: PmHeader) -> bytes:
    buf = bytearray(127)
    buf[:7] = MAGIC
    buf[7] = 3
    struct.pack_into("<Q", buf, 8, h.root_offset)
    struct.pack_into("<Q", buf, 16, h.root_length)
    struct.pack_into("<Q", buf, 24, h.metadata_offset)
    struct.pack_into("<Q", buf, 32, h.metadata_length)
    struct.pack_into("<Q", buf, 40, h.leaf_offset)
    struct.pack_into("<Q", buf, 48, h.leaf_length)
    struct.pack_into("<Q", buf, 56, h.data_offset)
    struct.pack_into("<Q", buf, 64, h.data_length)
    struct.pack_into("<Q", buf, 72, h.addressed_tiles)
    struct.pack_into("<Q", buf, 80, h.tile_entries)
    struct.pack_into("<Q", buf, 88, h.tile_contents)
    buf[96] = 1 if h.clustered else 0
    buf[97] = h.internal_compression
    buf[98] = h.tile_compression
    buf[99] = h.tile_type
    buf[100] = h.min_zoom
    buf[101] = h.max_zoom
    struct.pack_into("<i", buf, 102, h.min_lon_e7)
    struct.pack_into("<i", buf, 106, h.min_lat_e7)
    struct.pack_into("<i", buf, 110, h.max_lon_e7)
    struct.pack_into("<i", buf, 114, h.max_lat_e7)
    buf[118] = h.center_zoom
    struct.pack_into("<i", buf, 119, h.center_lon_e7)
    struct.pack_into("<i", buf, 123, h.center_lat_e7)
    return bytes(buf)


@dataclass
class DirEntry:
    tile_id: int
    offset: int
    length: int
    run_length: int  # ≥1 tile entry; 0 → leaf directory pointer


def _decompress(data: bytes, compression: int) -> bytes:
    if compression == COMPRESSION_GZIP:
        return gzip.decompress(data)
    return data


def _compress(data: bytes, compression: int) -> bytes:
    if compression == COMPRESSION_GZIP:
        return gzip.compress(data, mtime=0)
    return data


def _decode_directory(data: bytes) -> List[DirEntry]:
    pos = 0
    n, pos = read_varint(data, pos)
    tile_ids = []
    last = 0
    for _ in range(n):
        d, pos = read_varint(data, pos)
        last += d
        tile_ids.append(last)
    runs = []
    for _ in range(n):
        r, pos = read_varint(data, pos)
        runs.append(r)
    lengths = []
    for _ in range(n):
        ln, pos = read_varint(data, pos)
        lengths.append(ln)
    entries: List[DirEntry] = []
    for i in range(n):
        off, pos = read_varint(data, pos)
        if off == 0:
            if i == 0:
                # offset 0 means "previous offset + length", undefined for
                # the first entry — reject instead of yielding offset -1
                # and silently reading garbage one byte early
                raise ValueError("malformed PMTiles directory: first entry "
                                 "has offset 0 (delta with no predecessor)")
            offset = entries[i - 1].offset + entries[i - 1].length
        else:
            offset = off - 1
        entries.append(DirEntry(tile_ids[i], offset, lengths[i], runs[i]))
    return entries


def _encode_directory(entries: List[DirEntry]) -> bytes:
    out = bytearray()
    write_varint(len(entries), out)
    last = 0
    for e in entries:
        write_varint(e.tile_id - last, out)
        last = e.tile_id
    for e in entries:
        write_varint(e.run_length, out)
    for e in entries:
        write_varint(e.length, out)
    for i, e in enumerate(entries):
        if i > 0 and e.offset == entries[i - 1].offset + entries[i - 1].length:
            write_varint(0, out)
        else:
            write_varint(e.offset + 1, out)
    return bytes(out)


class PmTilesReader:
    """mmap-free random-access reader (the file is read with seeks; at
    scale the tile manifest feeds a Ray Dataset and workers fetch ranges
    independently)."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        self.header = _parse_header(self._f.read(127))
        self._root = self._read_dir(self.header.root_offset, self.header.root_length)
        self._leaf_cache: dict = {}

    def _read_dir(self, offset: int, length: int) -> List[DirEntry]:
        self._f.seek(offset)
        return _decode_directory(
            _decompress(self._f.read(length), self.header.internal_compression))

    def metadata(self) -> dict:
        self._f.seek(self.header.metadata_offset)
        raw = _decompress(self._f.read(self.header.metadata_length),
                          self.header.internal_compression)
        try:
            return json.loads(raw)
        except ValueError:
            return {}

    def entries(self) -> Iterator[DirEntry]:
        """All tile entries (leaf directories resolved), ascending id."""
        for e in self._root:
            if e.run_length == 0:
                for le in self._leaf_entries(e):
                    yield le
            else:
                yield e

    def tile_ids(self) -> List[int]:
        """Every addressed tile id (run-length entries expanded)."""
        out = []
        for e in self.entries():
            out.extend(range(e.tile_id, e.tile_id + e.run_length))
        return out

    def get_tile_bytes(self, entry: DirEntry) -> bytes:
        self._f.seek(self.header.data_offset + entry.offset)
        return self._f.read(entry.length)

    def get_tile_decompressed(self, entry: DirEntry) -> bytes:
        return _decompress(self.get_tile_bytes(entry), self.header.tile_compression)

    def _leaf_entries(self, root_entry: DirEntry) -> List[DirEntry]:
        key = (root_entry.offset, root_entry.length)
        hit = self._leaf_cache.get(key)
        if hit is None:
            hit = self._leaf_cache[key] = self._read_dir(
                self.header.leaf_offset + root_entry.offset, root_entry.length)
        return hit

    @staticmethod
    def _bisect_entries(entries: List[DirEntry], tile_id: int) -> Optional[DirEntry]:
        """Rightmost entry with e.tile_id <= tile_id (entries ascending)."""
        lo, hi = 0, len(entries)
        while lo < hi:
            mid = (lo + hi) // 2
            if entries[mid].tile_id <= tile_id:
                lo = mid + 1
            else:
                hi = mid
        return entries[lo - 1] if lo else None

    def get_by_id(self, tile_id: int) -> Optional[bytes]:
        """Spec-shaped random lookup: binary-search the root, read (and
        cache) exactly one leaf directory, binary-search it — O(log n)
        instead of scanning and decompressing every leaf."""
        e = self._bisect_entries(self._root, tile_id)
        if e is None:
            return None
        if e.run_length == 0:  # leaf pointer
            e = self._bisect_entries(self._leaf_entries(e), tile_id)
            if e is None:
                return None
        if e.tile_id <= tile_id < e.tile_id + e.run_length:
            return self.get_tile_decompressed(e)
        return None

    def close(self):
        self._f.close()


class PmTilesWriter:
    """Single-pass writer: add tiles in ASCENDING tile-id order (the
    reference's ordered write contract, processing.rs:111-118), content
    de-duplicated by blob hash (the fixture's 963 unique contents for
    1446 addressed tiles come from exactly this).

    The data section is spooled to a temp file next to the output as
    tiles arrive (the reference's single writer streams to disk too,
    processing.rs:98-121); driver memory holds only the directory
    entries and the content-hash → (offset, length) dedup index, never
    the tile payload bytes."""

    def __init__(self, path: str, header: Optional[PmHeader] = None,
                 metadata: Optional[dict] = None):
        import tempfile

        self.path = path
        self.header = header or PmHeader()
        self.metadata = metadata or {}
        self._entries: List[DirEntry] = []
        # spool in the destination directory so finalize's copy never
        # crosses filesystems (the old in-RAM writer only touched the
        # path at finalize, so callers may not have made the dir yet)
        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".",
                    exist_ok=True)
        self._spool = tempfile.NamedTemporaryFile(
            dir=os.path.dirname(os.path.abspath(path)) or ".",
            prefix=".pmtiles-data-", delete=False)
        self._data_len = 0
        self._content: Dict[bytes, Tuple[int, int]] = {}
        self._last_id = -1
        self._addressed = 0

    def add_tile(self, tile_id: int, data: bytes, compressed: bool = False):
        if tile_id <= self._last_id:
            raise ValueError("tiles must be added in ascending tile_id order")
        self._last_id = tile_id
        blob = data if compressed else _compress(data, self.header.tile_compression)
        import hashlib

        key = hashlib.md5(blob).digest()
        hit = self._content.get(key)
        if hit is None:
            off = self._data_len
            self._spool.write(blob)
            self._data_len += len(blob)
            hit = (off, len(blob))
            self._content[key] = hit
        off, ln = hit
        self._addressed += 1
        # run-length merge: consecutive ids with identical content
        if (self._entries and self._entries[-1].offset == off
                and self._entries[-1].length == ln
                and self._entries[-1].tile_id + self._entries[-1].run_length == tile_id):
            self._entries[-1].run_length += 1
        else:
            self._entries.append(DirEntry(tile_id, off, ln, 1))

    # root directories are capped (spec: root+header fit the first 16 KiB
    # so one read serves any tile lookup); larger archives split into
    # leaf directories the root points at (run_length = 0 entries)
    MAX_ROOT_ENTRIES = 256
    LEAF_ENTRIES = 2048

    def finalize(self):
        h = self.header
        if len(self._entries) <= self.MAX_ROOT_ENTRIES:
            root = _compress(_encode_directory(self._entries), h.internal_compression)
            leaves = b""
        else:
            # split tile entries into fixed-size leaves; root entry i
            # carries the first tile_id of leaf i and its byte range
            leaf_blobs = []
            root_entries = []
            off = 0
            for s in range(0, len(self._entries), self.LEAF_ENTRIES):
                chunk = self._entries[s:s + self.LEAF_ENTRIES]
                blob = _compress(_encode_directory(chunk), h.internal_compression)
                root_entries.append(DirEntry(chunk[0].tile_id, off, len(blob), 0))
                leaf_blobs.append(blob)
                off += len(blob)
            root = _compress(_encode_directory(root_entries), h.internal_compression)
            leaves = b"".join(leaf_blobs)
        meta = _compress(json.dumps(self.metadata).encode(), h.internal_compression)
        h.root_offset = 127
        h.root_length = len(root)
        h.metadata_offset = h.root_offset + h.root_length
        h.metadata_length = len(meta)
        h.leaf_offset = h.metadata_offset + h.metadata_length
        h.leaf_length = len(leaves)
        h.data_offset = h.leaf_offset + h.leaf_length
        h.data_length = self._data_len
        h.addressed_tiles = self._addressed
        h.tile_entries = len(self._entries)
        h.tile_contents = len(self._content)
        h.clustered = True
        import shutil

        try:
            self._spool.flush()
            with open(self.path, "wb") as f:
                f.write(_serialize_header(h))
                f.write(root)
                f.write(meta)
                f.write(leaves)
                with open(self._spool.name, "rb") as src:
                    shutil.copyfileobj(src, f, length=4 << 20)
        finally:
            self.close()

    def close(self):
        """Release the spool file. Idempotent; called by finalize, but
        also safe to call after an aborted write (e.g. an
        out-of-order add_tile or a failed upstream iterator) so the
        on-disk '.pmtiles-data-*' temp — which holds the whole data
        section — never outlives the writer."""
        spool = getattr(self, "_spool", None)
        if spool is None:
            return
        self._spool = None
        spool.close()
        try:
            os.unlink(spool.name)
        except OSError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass  # interpreter teardown: os/open may already be gone
