"""Mergeable sketches + Bloom filters — the aggregation-at-scale
patterns for quantities that don't need exactness:

  * HyperLogLog (dense, 2^p registers): one sketch per batch emitted from
    map_batches, merged associatively in a tiny reduce — the shuffle
    carries `blocks × 2^p bytes` instead of every distinct key.
  * Bloom filter: broadcast membership for semi/anti joins when even the
    key SET is too big to ship exactly — k hash probes per row,
    vectorized; false positives only (semi-join may keep a few extra
    rows, never lose one).

Both use the deterministic splitmix/FNV hashes (never Python hash())."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

from ..geo.geotag import fnv1a64_strings
from .shuffle import _splitmix


def _hash_column(col) -> np.ndarray:
    """Deterministic per-row uint64 hash with the SAME per-type branches
    as shuffle.stable_hash_columns — floats hash their bit pattern,
    timestamps their epoch micros, bools as ints; anything else goes
    through its string form (bytes(float) would crash, and str-vs-bytes
    asymmetry between build and probe sides would break Bloom joins)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_integer(t) or pa.types.is_boolean(t):
        v = col.cast(pa.int64()).fill_null(-(2 ** 62)).to_numpy(
            zero_copy_only=False).astype(np.uint64)
        return _splitmix(v)
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        # normalize to epoch MICROS regardless of stored unit so the
        # probe side agrees with BloomFilter.build's datetime64[us] rule
        v = (col.cast(pa.timestamp("us")).cast(pa.int64())
             .fill_null(-(2 ** 62)).to_numpy(zero_copy_only=False)
             .astype(np.uint64))
        return _splitmix(v)
    if pa.types.is_floating(t):
        v = col.cast(pa.float64()).fill_null(0.0).to_numpy(
            zero_copy_only=False).view(np.uint64)
        return _splitmix(v)
    return _splitmix(fnv1a64_strings(
        [x if isinstance(x, str) else ("" if x is None else str(x))
         for x in col.to_pylist()]))


# ---- HyperLogLog ------------------------------------------------------


class HLL:
    """Dense HyperLogLog with 2^p registers (p=12 → ~1.6% typical error).
    Serializes to bytes; merge = elementwise max (associative and
    commutative → safe to combine in any shuffle order)."""

    def __init__(self, p: int = 12, registers: Optional[np.ndarray] = None):
        self.p = p
        self.m = 1 << p
        self.reg = registers if registers is not None else np.zeros(self.m, np.uint8)

    def add_hashes(self, h: np.ndarray):
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of the remaining bits + 1, vectorized via
        # float64 exponent extraction (exact for the ranges involved)
        rank = np.zeros(len(h), dtype=np.uint8)
        x = rest.copy()
        r = np.ones(len(h), dtype=np.uint8)
        bit = np.uint64(1) << np.uint64(63)
        # loop ≤ 64-p times, whole-array ops
        active = np.ones(len(h), dtype=bool)
        for _ in range(64 - self.p + 1):
            top = (x & bit) != 0
            done = active & top
            rank[done] = r[done]
            active &= ~top
            if not active.any():
                break
            x = x << np.uint64(1)
            r += np.uint8(1)
        np.maximum.at(self.reg, idx, rank)

    def merge(self, other: "HLL") -> "HLL":
        return HLL(self.p, np.maximum(self.reg, other.reg))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        inv = np.power(2.0, -self.reg.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.reg == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)   # small-range correction
        return float(e)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.reg.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HLL":
        return cls(b[0], np.frombuffer(b[1:], np.uint8).copy())


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate distinct count: per-batch HLL sketches (map side) →
    driver-side merge of blocks × (2^p + 1) bytes. No key shuffle."""
    def sketch(batch: pa.Table) -> pa.Table:
        h = HLL(p)
        h.add_hashes(_hash_column(batch[col]))
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    merged = HLL(p)
    for row in ds.map_batches(sketch, batch_format="pyarrow").take_all():
        merged = merged.merge(HLL.from_bytes(row["sketch"]))
    return merged.estimate()


# ---- Bloom filter -----------------------------------------------------


class BloomFilter:
    """Vectorized Bloom filter: nbits bits, k probes derived from two
    base hashes (Kirsch–Mitzenmacher double hashing)."""

    def __init__(self, nbits: int, k: int = 5,
                 bits: Optional[np.ndarray] = None):
        self.nbits = nbits
        self.k = k
        self.bits = bits if bits is not None else np.zeros(
            (nbits + 63) // 64, np.uint64)

    @staticmethod
    def _h2(h: np.ndarray) -> np.ndarray:
        """Second base hash — depends only on h; compute ONCE per batch,
        not once per probe (k-1 redundant splitmix passes otherwise)."""
        return _splitmix(h ^ np.uint64(0x5851F42D4C957F2D))

    def _probe(self, h: np.ndarray, h2: np.ndarray, j: int) -> np.ndarray:
        return ((h + np.uint64(j) * h2) % np.uint64(self.nbits)).astype(np.uint64)

    def add_hashes(self, h: np.ndarray):
        h2 = self._h2(h)
        for j in range(self.k):
            pos = self._probe(h, h2, j)
            word = (pos >> np.uint64(6)).astype(np.int64)
            mask = np.uint64(1) << (pos & np.uint64(63))
            np.bitwise_or.at(self.bits, word, mask)

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        out = np.ones(len(h), dtype=bool)
        h2 = self._h2(h)
        for j in range(self.k):
            pos = self._probe(h, h2, j)
            word = (pos >> np.uint64(6)).astype(np.int64)
            mask = np.uint64(1) << (pos & np.uint64(63))
            out &= (self.bits[word] & mask) != 0
        return out

    @classmethod
    def build(cls, values, nbits: int = 1 << 20, k: int = 5) -> "BloomFilter":
        """Per-dtype hashing MUST mirror _hash_column's probe-side rules,
        or build and probe disagree and the filter matches nothing."""
        bf = cls(nbits, k)
        arr = np.asarray(list(values))
        if arr.dtype.kind in ("i", "u", "b"):
            bf.add_hashes(_splitmix(arr.astype(np.int64).astype(np.uint64)))
        elif arr.dtype.kind == "f":
            bf.add_hashes(_splitmix(arr.astype(np.float64).view(np.uint64)))
        elif arr.dtype.kind == "M":
            bf.add_hashes(_splitmix(
                arr.astype("datetime64[us]").astype(np.int64).astype(np.uint64)))
        else:
            bf.add_hashes(_splitmix(fnv1a64_strings([str(v) for v in arr])))
        return bf


def bloom_semi_join(ds, key_col: str, bloom_ref, anti: bool = False):
    """Semi-join against a broadcast Bloom filter (the guide's pattern for
    key sets too large to broadcast exactly): semi keeps all true matches
    plus ≤ fp-rate extras; anti drops those extras — callers that need
    exactness follow with an exact check on the (small) survivor set."""
    import ray

    cache = {}

    def f(batch: pa.Table) -> pa.Table:
        bf = cache.get("b")
        if bf is None:
            bf = cache["b"] = ray.get(bloom_ref)
        m = bf.contains_hashes(_hash_column(batch[key_col]))
        if anti:
            m = ~m
        return batch.filter(pa.array(m))

    return ds.map_batches(f, batch_format="pyarrow")


# ---- Count-Min sketch -------------------------------------------------


class CountMin:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): d rows × w
    counters; point estimate = min over rows; overestimates only, by at
    most ``e·N/w`` with probability ``1 − e^−d`` (N = stream length).
    Merge = elementwise ADD (associative/commutative → per-batch
    sketches combine in any shuffle order). Row hashes derive from the
    same splitmix chain as everything else — deterministic across
    workers."""

    def __init__(self, w: int = 1 << 14, d: int = 4,
                 table: Optional[np.ndarray] = None):
        self.w, self.d = w, d
        self.table = (table if table is not None
                      else np.zeros((d, w), np.int64))

    def _cols(self, h: np.ndarray) -> np.ndarray:
        """(d, n) column indices: row j uses splitmix(h ^ (j+1))."""
        out = np.empty((self.d, len(h)), np.int64)
        for j in range(self.d):
            out[j] = (_splitmix(h ^ np.uint64(j + 1))
                      % np.uint64(self.w)).astype(np.int64)
        return out

    def add_hashes(self, h: np.ndarray, counts: Optional[np.ndarray] = None):
        c = (np.ones(len(h), np.int64) if counts is None
             else np.asarray(counts, np.int64))
        cols = self._cols(h)
        for j in range(self.d):
            np.add.at(self.table[j], cols[j], c)

    def estimate_hashes(self, h: np.ndarray) -> np.ndarray:
        cols = self._cols(h)
        return np.min(
            np.stack([self.table[j][cols[j]] for j in range(self.d)]),
            axis=0)

    def merge(self, other: "CountMin") -> "CountMin":
        assert (self.w, self.d) == (other.w, other.d)
        return CountMin(self.w, self.d, self.table + other.table)

    def to_bytes(self) -> bytes:
        head = (int(self.d).to_bytes(2, "little")
                + int(self.w).to_bytes(6, "little"))
        return head + self.table.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "CountMin":
        d = int.from_bytes(b[:2], "little")
        w = int.from_bytes(b[2:8], "little")
        return cls(w, d, np.frombuffer(b[8:], np.int64).reshape(d, w).copy())


def approx_counts(ds, col: str, values, w: int = 1 << 14, d: int = 4) -> dict:
    """Approximate frequencies for `values` of ds[col] via per-batch
    Count-Min sketches merged on the driver (blocks × d·w·8 bytes move;
    no key shuffle — the heavy-hitter probe at 100 TB where an exact
    per-key groupby would shuffle every row)."""
    def sketch(batch: pa.Table) -> pa.Table:
        cm = CountMin(w, d)
        cm.add_hashes(_hash_column(batch[col]))
        return pa.table({"sketch": pa.array([cm.to_bytes()], pa.binary())})

    merged = CountMin(w, d)
    for row in ds.map_batches(sketch, batch_format="pyarrow").take_all():
        merged = merged.merge(CountMin.from_bytes(row["sketch"]))
    probe = pa.array(values)
    est = merged.estimate_hashes(_hash_column(probe))
    return dict(zip(values, (int(x) for x in est)))


def histogram_quantiles(ds, col: str, lo: float, hi: float,
                        num_bins: int = 4096,
                        qs=(0.25, 0.5, 0.75, 0.9, 0.99)):
    """Mergeable fixed-bin histogram quantiles — the no-sort scale path
    for percentiles (KLL/t-digest's deterministic cousin): each block
    emits a pre-reduced partial bincount (≤ num_bins rows), a two-phase
    sum merges them, and the driver walks ≤ num_bins cumulative rows.
    Error is bounded by the bin width (hi - lo) / num_bins; no global
    sort, no wide shuffle, bounded driver state at any input size.
    Domain bounds are fixed a priori (at scale: from metadata or one
    cheap mergeable min/max pass); values outside clamp to the edge
    bins. Returns one row per requested quantile:
    (q, target_rank, bin, est) with est linearly interpolated inside
    the selected bin — every arithmetic step mirrors the SQL oracle's
    IEEE ops exactly."""
    import pandas as pd

    from .shuffle import two_phase_aggregate

    width = (hi - lo) / num_bins

    def part(b: pa.Table) -> pa.Table:
        x = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        idx = np.clip(np.floor((x - lo) / width).astype(np.int64),
                      0, num_bins - 1)
        cnt = np.bincount(idx, minlength=num_bins)
        nz = np.nonzero(cnt)[0]
        return pa.table({"bin": pa.array(nz.astype(np.int64), pa.int64()),
                         "pc": pa.array(cnt[nz].astype(np.int64), pa.int64())})

    partials = ds.map_batches(part, batch_format="pyarrow")
    totals = two_phase_aggregate(
        partials, ["bin"], [("pc", "sum")], ["pp"], [("pp", "sum")], ["n"])
    hist = totals.to_pandas()
    # empty/all-NaN input: the aggregate comes back column-less, and
    # there is no rank to walk — return an empty frame with the result
    # schema instead of KeyError/IndexError-ing below
    if len(hist) == 0 or "bin" not in hist.columns:
        total = 0
    else:
        hist = hist.sort_values("bin").reset_index(drop=True)
        cum = hist["n"].cumsum().to_numpy()
        total = int(hist["n"].sum())
    if total == 0:
        return pd.DataFrame({"q": pd.Series([], dtype=np.float64),
                             "target_rank": pd.Series([], dtype=np.int64),
                             "bin": pd.Series([], dtype=np.int64),
                             "est": pd.Series([], dtype=np.float64)})
    rows = []
    for q in qs:
        target = int(np.ceil(q * total))
        pos = int(np.searchsorted(cum, target))
        b = int(hist["bin"].iloc[pos])
        binn = int(hist["n"].iloc[pos])
        cumb = int(cum[pos]) - binn
        est = lo + width * (b + (target - cumb) / binn)
        rows.append((float(q), target, b, est))
    return pd.DataFrame(rows, columns=["q", "target_rank", "bin", "est"])


def profile_numeric_columns(ds, cols):
    """Dataset profiling (the ingestion-time column-stats pass): one
    row per profiled column with exact n_rows / n_null / min / max.
    Mergeable-sketch shape like the HLL/Count-Min stages: every block
    emits one tiny partial row per column (pyarrow.compute min_max —
    no Python over values), and the driver folds the ≤ blocks × cols
    partials. min/max/count involve NO float arithmetic, so results
    are bit-exact regardless of block split.

    NaN CONTRACT: min/max use the Arrow kernel's semantics — NaN values
    are SKIPPED (the SQL oracle mirrors this with an isnan filter);
    a column with no non-null values reports NaN for both. An empty
    dataset reports n_rows = n_null = 0 and NaN extrema."""
    import pandas as pd
    import pyarrow.compute as pc

    def partials(b: pa.Table) -> pa.Table:
        names, n, nn, mn, mx = [], [], [], [], []
        for c in cols:
            arr = b[c]
            names.append(c)
            n.append(len(arr))
            nn.append(arr.null_count)
            if len(arr) - arr.null_count > 0:
                s = pc.min_max(arr)
                mn.append(float(s["min"].as_py()))
                mx.append(float(s["max"].as_py()))
            else:
                mn.append(np.nan)
                mx.append(np.nan)
        return pa.table({
            "col": pa.array(names, pa.string()),
            "pn": pa.array(np.asarray(n, np.int64), pa.int64()),
            "pnull": pa.array(np.asarray(nn, np.int64), pa.int64()),
            "pmin": pa.array(np.asarray(mn, np.float64), pa.float64()),
            "pmax": pa.array(np.asarray(mx, np.float64), pa.float64())})

    # one fixed-size row per (block, column): driver fold is bounded.
    # pandas min/max skip the NaN sentinel emitted by all-null blocks,
    # and reindex+fillna covers columns with no partials at all (an
    # EMPTY dataset has zero blocks — without the fillna, NaN counts
    # would silently cast to INT64_MIN)
    df = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    order = sorted(cols)
    if df.empty or "col" not in df.columns:
        # an empty dataset produces ZERO blocks (not one empty block),
        # so no partial rows exist at all
        return pd.DataFrame({
            "col": order,
            "n_rows": np.zeros(len(order), np.int64),
            "n_null": np.zeros(len(order), np.int64),
            "min_v": np.full(len(order), np.nan),
            "max_v": np.full(len(order), np.nan)})
    g = df.groupby("col", sort=True)
    out = pd.DataFrame({
        "col": order,
        "n_rows": g["pn"].sum().reindex(order).fillna(0)
                  .to_numpy(np.int64),
        "n_null": g["pnull"].sum().reindex(order).fillna(0)
                  .to_numpy(np.int64),
        "min_v": g["pmin"].min().reindex(order).to_numpy(np.float64),
        "max_v": g["pmax"].max().reindex(order).to_numpy(np.float64),
    })
    return out
