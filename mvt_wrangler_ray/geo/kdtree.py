"""Pure-numpy 2-d k-d tree for exact nearest-neighbor against a
broadcast site set (north_star: "k-d-tree kNN ... STRtree-backed
point-in-polygon") — no scipy in this environment.

Design for batch queries (the Ray hot path is map_batches over ~10^4-10^5
points per batch, sites broadcast once):

  build   — implicit balanced tree by recursive median split on the
            wider axis; leaves hold ≤ leaf_size points padded to a dense
            (n_leaves, leaf_size, 2) matrix, so leaf distance checks are
            single einsum-shaped numpy ops.
  query   — three vectorized phases, no per-point Python:
              1. simultaneous descent: ALL query points walk the split
                 tree together (one vectorized comparison per level) to
                 their home leaf;
              2. seed: exact distances to the home leaf's points give
                 each point an initial best (dist, id) — ties broken by
                 lowest site id, matching np.argmin semantics;
              3. prune: per leaf (n_leaves iterations, each vectorized
                 over the still-candidate points), check only points
                 whose current radius reaches the leaf's bbox.
            Worst case O(n_points × n_sites) like brute force, but the
            bbox pruning makes the common case O(n_points × leaf_size ×
            touched_leaves) — the win grows with site count.
"""

from __future__ import annotations

import numpy as np


class KDTree2D:
    def __init__(self, xy: np.ndarray, ids: np.ndarray | None = None,
                 leaf_size: int = 64):
        xy = np.asarray(xy, dtype=np.float64)
        n = len(xy)
        if n == 0:
            raise ValueError("empty site set")
        self.ids = (np.arange(n, dtype=np.int64) if ids is None
                    else np.asarray(ids, dtype=np.int64))
        self.leaf_size = leaf_size
        # implicit tree: node 0 is the root; children of i are 2i+1, 2i+2
        depth = max(0, int(np.ceil(np.log2(max(n / leaf_size, 1)))))
        self.depth = depth
        n_internal = (1 << depth) - 1
        n_leaves = 1 << depth
        self.split_dim = np.zeros(max(n_internal, 1), dtype=np.int8)
        self.split_val = np.zeros(max(n_internal, 1), dtype=np.float64)
        # recursive median partition into equal leaf index ranges
        order = np.arange(n)
        slots = [(0, order)]
        leaf_members: list = [None] * n_leaves
        for node, idx in slots:
            if node >= n_internal:
                leaf_members[node - n_internal] = idx
                continue
            pts = xy[idx]
            spread = pts.max(axis=0) - pts.min(axis=0) if len(pts) else (0, 0)
            d = int(np.argmax(spread))
            k = len(idx) // 2
            part = idx[np.argsort(pts[:, d], kind="stable")]
            left, right = part[:k], part[k:]
            self.split_dim[node] = d
            self.split_val[node] = (xy[right[0], d] if len(right)
                                    else (xy[left[-1], d] if len(left) else 0.0))
            slots.append((2 * node + 1, left))
            slots.append((2 * node + 2, right))
        # dense padded leaves
        L = max(max((len(m) for m in leaf_members), default=1), 1)
        self.leaf_pts = np.full((n_leaves, L, 2), np.inf)
        self.leaf_ids = np.full((n_leaves, L), np.iinfo(np.int64).max,
                                dtype=np.int64)
        self.leaf_bbox = np.empty((n_leaves, 4))  # minx, miny, maxx, maxy
        for li, m in enumerate(leaf_members):
            if m is None or len(m) == 0:
                self.leaf_bbox[li] = (np.inf, np.inf, -np.inf, -np.inf)
                continue
            self.leaf_pts[li, : len(m)] = xy[m]
            self.leaf_ids[li, : len(m)] = self.ids[m]
            self.leaf_bbox[li] = (xy[m, 0].min(), xy[m, 1].min(),
                                  xy[m, 0].max(), xy[m, 1].max())
        self.n_internal = n_internal
        self.n_leaves = n_leaves

    def _home_leaf(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        node = np.zeros(len(px), dtype=np.int64)
        for _ in range(self.depth):
            d = self.split_dim[node]
            v = self.split_val[node]
            coord = np.where(d == 0, px, py)
            node = np.where(coord < v, 2 * node + 1, 2 * node + 2)
        return node - self.n_internal

    def _leaf_best(self, px, py, leaf_idx, best_d2, best_id):
        """Exact check of each point against ITS indexed leaf (gathered
        dense matrices); lexicographic (dist, id) min for argmin-parity
        tie-breaking."""
        pts = self.leaf_pts[leaf_idx]               # (n, L, 2)
        ids = self.leaf_ids[leaf_idx]               # (n, L)
        with np.errstate(invalid="ignore"):
            d2 = ((pts[:, :, 0] - px[:, None]) ** 2
                  + (pts[:, :, 1] - py[:, None]) ** 2)
        d2 = np.where(np.isnan(d2), np.inf, d2)
        # lexicographic min without a full sort: min dist, then min id
        # among entries equal to it
        md = d2.min(axis=1)
        is_min = d2 <= md[:, None]
        cand_ids = np.where(is_min, ids, np.iinfo(np.int64).max)
        mid = cand_ids.min(axis=1)
        upd = (md < best_d2) | ((md == best_d2) & (mid < best_id))
        best_d2 = np.where(upd, md, best_d2)
        best_id = np.where(upd, mid, best_id)
        return best_d2, best_id

    def nearest(self, px: np.ndarray, py: np.ndarray):
        """→ (site_id, dist2) per query point. Exact; ties by lowest id."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        n = len(px)
        best_d2 = np.full(n, np.inf)
        best_id = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        home = self._home_leaf(px, py)
        best_d2, best_id = self._leaf_best(px, py, home, best_d2, best_id)
        # prune pass over every leaf: only points whose radius reaches
        # the leaf bbox get the exact check
        for li in range(self.n_leaves):
            minx, miny, maxx, maxy = self.leaf_bbox[li]
            if not np.isfinite(minx):
                continue
            dx = np.maximum(np.maximum(minx - px, px - maxx), 0.0)
            dy = np.maximum(np.maximum(miny - py, py - maxy), 0.0)
            need = (dx * dx + dy * dy) <= best_d2
            need &= home != li
            if not need.any():
                continue
            sub_d2, sub_id = self._leaf_best(
                px[need], py[need],
                np.full(int(need.sum()), li, dtype=np.int64),
                best_d2[need], best_id[need])
            best_d2[need] = sub_d2
            best_id[need] = sub_id
        return best_id, best_d2
