"""Uniform-grid spatial index over axis-aligned boxes.

Replaces rtree/STRtree for tile-overlap sweeps and triangle lookup
(reference uses: feabas/dal.py:932, feabas/mesh.py:2507). Vectorized
numpy; build O(N), query O(candidates)."""

import numpy as np


def _groupby_sorted(sorted_keys, order):
    """Yield (key, original_indices) for runs in a sorted key array."""
    if sorted_keys.size == 0:
        return
    bounds = np.nonzero(np.diff(sorted_keys))[0] + 1
    starts = np.concatenate([[0], bounds])
    stops = np.concatenate([bounds, [sorted_keys.size]])
    for s0, s1 in zip(starts, stops):
        yield sorted_keys[s0], order[s0:s1]


class GridIndex:
    def __init__(self, bboxes, cell_size=None):
        """bboxes: (N,4) [xmin,ymin,xmax,ymax]."""
        bboxes = np.asarray(bboxes, dtype=np.float64).reshape(-1, 4)
        self.bboxes = bboxes
        self._n = bboxes.shape[0]
        if self._n == 0:
            self._origin = np.zeros(2)
            self._cell = 1.0
            self._shape = (1, 1)
            self._cells = {}
            return
        if cell_size is None:
            sizes = (bboxes[:, 2:] - bboxes[:, :2])
            cell_size = max(float(np.median(sizes)), 1e-6)
        self._cell = float(cell_size)
        self._origin = bboxes[:, :2].min(axis=0)
        extent = bboxes[:, 2:].max(axis=0) - self._origin
        nx = max(int(np.ceil(extent[0] / self._cell)), 1)
        ny = max(int(np.ceil(extent[1] / self._cell)), 1)
        self._shape = (nx, ny)
        i0 = np.floor((bboxes[:, 0] - self._origin[0]) / self._cell).astype(np.int64)
        i1 = np.floor((bboxes[:, 2] - self._origin[0]) / self._cell).astype(np.int64)
        j0 = np.floor((bboxes[:, 1] - self._origin[1]) / self._cell).astype(np.int64)
        j1 = np.floor((bboxes[:, 3] - self._origin[1]) / self._cell).astype(np.int64)
        i0, i1 = np.clip(i0, 0, nx - 1), np.clip(i1, 0, nx - 1)
        j0, j1 = np.clip(j0, 0, ny - 1), np.clip(j1, 0, ny - 1)
        cells = {}
        for k in range(self._n):
            for ci in range(i0[k], i1[k] + 1):
                for cj in range(j0[k], j1[k] + 1):
                    cells.setdefault(ci * ny + cj, []).append(k)
        self._cells = {c: np.asarray(v, dtype=np.int64) for c, v in cells.items()}

    def query(self, bbox):
        """ids of boxes intersecting bbox (sorted, unique)."""
        if self._n == 0:
            return np.empty(0, dtype=np.int64)
        nx, ny = self._shape
        i0 = int(np.clip(np.floor((bbox[0] - self._origin[0]) / self._cell), 0, nx - 1))
        i1 = int(np.clip(np.floor((bbox[2] - self._origin[0]) / self._cell), 0, nx - 1))
        j0 = int(np.clip(np.floor((bbox[1] - self._origin[1]) / self._cell), 0, ny - 1))
        j1 = int(np.clip(np.floor((bbox[3] - self._origin[1]) / self._cell), 0, ny - 1))
        cand = []
        for ci in range(i0, i1 + 1):
            for cj in range(j0, j1 + 1):
                c = self._cells.get(ci * ny + cj)
                if c is not None:
                    cand.append(c)
        if not cand:
            return np.empty(0, dtype=np.int64)
        cand = np.unique(np.concatenate(cand))
        b = self.bboxes[cand]
        hit = ((b[:, 0] < bbox[2]) & (b[:, 2] > bbox[0]) &
               (b[:, 1] < bbox[3]) & (b[:, 3] > bbox[1]))
        return cand[hit]

    def query_point(self, xy):
        return self.query((xy[0], xy[1], xy[0], xy[1]))

    def query_points_batch(self, pts):
        """Candidate pairs for many points at once.

        Returns (pt_idx, box_idx) int arrays: for each point, the boxes of
        its grid cell whose extent contains the point. Grouped by cell so
        cost scales with unique cells, not points."""
        pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
        if self._n == 0 or pts.shape[0] == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        nx, ny = self._shape
        ci = np.clip(np.floor((pts[:, 0] - self._origin[0]) / self._cell),
                     0, nx - 1).astype(np.int64)
        cj = np.clip(np.floor((pts[:, 1] - self._origin[1]) / self._cell),
                     0, ny - 1).astype(np.int64)
        cell_ids = ci * ny + cj
        order = np.argsort(cell_ids, kind='stable')
        pt_out, box_out = [], []
        for cell, grp in _groupby_sorted(cell_ids[order], order):
            cand = self._cells.get(int(cell))
            if cand is None:
                continue
            pt_out.append(np.repeat(grp, cand.size))
            box_out.append(np.tile(cand, grp.size))
        if not pt_out:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        pt_idx = np.concatenate(pt_out)
        box_idx = np.concatenate(box_out)
        b = self.bboxes[box_idx]
        p = pts[pt_idx]
        hit = ((b[:, 0] <= p[:, 0]) & (b[:, 2] >= p[:, 0]) &
               (b[:, 1] <= p[:, 1]) & (b[:, 3] >= p[:, 1]))
        return pt_idx[hit], box_idx[hit]

    def all_pairs(self):
        """All intersecting (i, j) pairs with i < j."""
        pairs = set()
        for ids in self._cells.values():
            if len(ids) < 2:
                continue
            b = self.bboxes[ids]
            for a in range(len(ids)):
                hit = ((b[:, 0] < b[a, 2]) & (b[:, 2] > b[a, 0]) &
                       (b[:, 1] < b[a, 3]) & (b[:, 3] > b[a, 1]))
                hit[a] = False
                for k in ids[hit]:
                    i, j = int(ids[a]), int(k)
                    if i > j:
                        i, j = j, i
                    pairs.add((i, j))
        if not pairs:
            return np.empty((0, 2), dtype=np.int64)
        return np.asarray(sorted(pairs), dtype=np.int64)
