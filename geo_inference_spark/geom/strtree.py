"""Sort-Tile-Recursive packed bbox R-tree (numpy).

Replaces the reference's rtree spatial index used by
get_overlapping_subset (/root/reference/geo_inference/utils/
geo_transforms.py:230-256). Built once per broadcast polygon layer,
queried per Arrow batch inside pandas UDFs. Candidate filtering only
(bbox); exact refinement is the caller's job — same contract as
gdf.sindex.intersection in the reference.
"""

from __future__ import annotations

import numpy as np


class STRtree:
    """Static packed R-tree over item bboxes.

    boxes: (N, 4) float64 [minx, miny, maxx, maxy].
    """

    NODE_CAP = 16

    def __init__(self, boxes: np.ndarray):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.n = len(boxes)
        self.item_boxes = boxes
        if self.n == 0:
            self.levels = []
            self.order = np.empty(0, dtype=np.int64)
            return
        # STR packing: sort by x of center into vertical slices, then by
        # y within each slice.
        cx = (boxes[:, 0] + boxes[:, 2]) / 2
        cy = (boxes[:, 1] + boxes[:, 3]) / 2
        n_leaves = int(np.ceil(self.n / self.NODE_CAP))
        n_slices = int(np.ceil(np.sqrt(n_leaves)))
        per_slice = n_slices * self.NODE_CAP
        order = np.argsort(cx, kind="stable")
        for s in range(0, self.n, per_slice):
            seg = order[s : s + per_slice]
            seg_sorted = seg[np.argsort(cy[seg], kind="stable")]
            order[s : s + per_slice] = seg_sorted
        self.order = order.astype(np.int64)
        # level 0 = leaf-node bboxes over 'order'-permuted item boxes
        self.levels = []
        cur = boxes[self.order]
        while len(cur) > 1:
            n_nodes = int(np.ceil(len(cur) / self.NODE_CAP))
            pad = n_nodes * self.NODE_CAP - len(cur)
            if pad:
                fill = np.repeat(cur[-1:], pad, axis=0)
                cur_p = np.vstack([cur, fill])
            else:
                cur_p = cur
            grp = cur_p.reshape(n_nodes, self.NODE_CAP, 4)
            nodes = np.empty((n_nodes, 4))
            nodes[:, 0] = grp[:, :, 0].min(axis=1)
            nodes[:, 1] = grp[:, :, 1].min(axis=1)
            nodes[:, 2] = grp[:, :, 2].max(axis=1)
            nodes[:, 3] = grp[:, :, 3].max(axis=1)
            self.levels.append(nodes)
            cur = nodes

    def query(self, minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
        """Item indices whose bbox intersects the query box."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        if not self.levels:
            hits = self._isect(self.item_boxes[self.order], minx, miny, maxx, maxy)
            return self.order[hits]
        # descend from root level down to items
        frontier = np.arange(len(self.levels[-1]), dtype=np.int64)
        for lvl in range(len(self.levels) - 1, -1, -1):
            nodes = self.levels[lvl]
            hit = frontier[self._isect(nodes[frontier], minx, miny, maxx, maxy)]
            if lvl == 0:
                # expand leaf nodes to item positions
                pos = (
                    hit[:, None] * self.NODE_CAP + np.arange(self.NODE_CAP)[None, :]
                ).ravel()
                pos = pos[pos < self.n]
                items = self.order[pos]
                keep = self._isect(self.item_boxes[items], minx, miny, maxx, maxy)
                return items[keep]
            # children of node i at level lvl-1 are i*CAP..(i+1)*CAP
            child_count = len(self.levels[lvl - 1])
            frontier = (
                hit[:, None] * self.NODE_CAP + np.arange(self.NODE_CAP)[None, :]
            ).ravel()
            frontier = frontier[frontier < child_count]
        return np.empty(0, dtype=np.int64)  # pragma: no cover

    def query_many(self, qboxes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Batch query: (query_idx, item_idx) candidate pairs."""
        qi, it = [], []
        for i, (a, b, c, d) in enumerate(np.asarray(qboxes, dtype=np.float64)):
            hits = self.query(a, b, c, d)
            if len(hits):
                qi.append(np.full(len(hits), i, dtype=np.int64))
                it.append(hits)
        if not qi:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(qi), np.concatenate(it)

    @staticmethod
    def _isect(boxes, minx, miny, maxx, maxy):
        return ~(
            (boxes[:, 2] < minx)
            | (boxes[:, 0] > maxx)
            | (boxes[:, 3] < miny)
            | (boxes[:, 1] > maxy)
        )
