"""STR-packed R-tree over item bounding boxes, pure numpy.

The analogue of the reference's `rstar::RTree` bulk-load + envelope query
(data.rs:189-230): built once per actor over the filter-mask bboxes,
probed per batch with many query boxes at once.

Sort-Tile-Recursive packing: sort by center-x into vertical slices, sort
each slice by center-y, pack NODE_CAP children per node, repeat upward.
Node bboxes live in flat numpy arrays; a batch query walks levels
breadth-first with vectorized overlap tests.

For the tiny build sides typical of filter collections (< ~64 boxes) the
query degenerates to a brute-force vectorized bbox matrix — which is
exactly the right plan there; the tree pays off when users load thousands
of mask polygons.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

NODE_CAP = 16


class STRtree:
    def __init__(self, boxes: np.ndarray):
        """boxes: (n, 4) float64 [minx, miny, maxx, maxy]."""
        self.boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        n = len(self.boxes)
        self.n = n
        self._brute = n <= 64
        if self._brute or n == 0:
            self.levels = []
            self.perm = np.arange(n)
            return
        # STR packing
        order = self._str_order(self.boxes)
        self.perm = order  # leaf i in packed order → original item perm[i]
        leaf_boxes = self.boxes[order]
        levels: List[Tuple[np.ndarray, np.ndarray]] = []
        cur = leaf_boxes
        while len(cur) > NODE_CAP:
            ngroups = (len(cur) + NODE_CAP - 1) // NODE_CAP
            parents = np.empty((ngroups, 4))
            starts = np.arange(ngroups) * NODE_CAP
            ends = np.minimum(starts + NODE_CAP, len(cur))
            for g in range(ngroups):
                seg = cur[starts[g]:ends[g]]
                parents[g] = (
                    seg[:, 0].min(), seg[:, 1].min(), seg[:, 2].max(), seg[:, 3].max()
                )
            levels.append((cur, starts))
            cur = parents
        levels.append((cur, np.zeros(1, dtype=np.int64)))
        levels.reverse()  # root first
        self.levels = levels

    @staticmethod
    def _str_order(boxes: np.ndarray) -> np.ndarray:
        n = len(boxes)
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        nslices = int(np.ceil(np.sqrt(n / NODE_CAP))) or 1
        slice_cap = int(np.ceil(n / nslices))
        by_x = np.argsort(cx, kind="stable")
        order = np.empty(n, dtype=np.int64)
        pos = 0
        for s in range(nslices):
            sl = by_x[s * slice_cap:(s + 1) * slice_cap]
            sl = sl[np.argsort(cy[sl], kind="stable")]
            order[pos:pos + len(sl)] = sl
            pos += len(sl)
        return order

    def query_box(self, qminx, qminy, qmaxx, qmaxy) -> np.ndarray:
        """Item indices whose bbox overlaps the single query box."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        if self._brute:
            b = self.boxes
            hit = (
                (b[:, 0] <= qmaxx) & (b[:, 2] >= qminx)
                & (b[:, 1] <= qmaxy) & (b[:, 3] >= qminy)
            )
            return np.nonzero(hit)[0]
        # walk levels: the top level holds up to NODE_CAP root nodes
        top = self.levels[0][0]
        hit = (
            (top[:, 0] <= qmaxx) & (top[:, 2] >= qminx)
            & (top[:, 1] <= qmaxy) & (top[:, 3] >= qminy)
        )
        frontier = np.nonzero(hit)[0].astype(np.int64)
        for li in range(len(self.levels) - 1):
            child_boxes, child_starts = self.levels[li + 1]
            nxt = []
            for node in frontier:
                s = int(child_starts[node])
                e = min(s + NODE_CAP, len(child_boxes))
                seg = child_boxes[s:e]
                hit = (
                    (seg[:, 0] <= qmaxx) & (seg[:, 2] >= qminx)
                    & (seg[:, 1] <= qmaxy) & (seg[:, 3] >= qminy)
                )
                nxt.extend(s + np.nonzero(hit)[0])
            frontier = np.asarray(nxt, dtype=np.int64)
            if len(frontier) == 0:
                return np.empty(0, dtype=np.int64)
        return np.sort(self.perm[frontier])

    def query_boxes_matrix(self, qboxes: np.ndarray, max_cells: int = 8_000_000):
        """Batch query: (m, 4) query boxes → boolean matrix (m, n_items) of
        bbox overlaps, computed in row chunks. The per-batch probe of the
        broadcast spatial join: with small n_items this IS the right plan;
        for large n_items use query_box per row instead."""
        q = np.asarray(qboxes, dtype=np.float64).reshape(-1, 4)
        m = len(q)
        out = np.zeros((m, self.n), dtype=bool)
        if self.n == 0 or m == 0:
            return out
        b = self.boxes
        ch = max(1, max_cells // max(self.n, 1))
        for st in range(0, m, ch):
            sl = slice(st, min(st + ch, m))
            out[sl] = (
                (q[sl, None, 0] <= b[None, :, 2])
                & (q[sl, None, 2] >= b[None, :, 0])
                & (q[sl, None, 1] <= b[None, :, 3])
                & (q[sl, None, 3] >= b[None, :, 1])
            )
        return out
