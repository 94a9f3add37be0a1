"""Connected components + cell detection/ordering A11-A13 (SURVEY.md §2.A).

Reimplements, from the public two-pass union-find algorithm, what
``cv2.connectedComponentsWithStats`` / ``cv2.findContours``+``boundingRect``
provide (the reference repo's tree carries no such code — SURVEY.md §0;
the stage list comes from BASELINE.json:6 "contour/connected-component
cell detection ... row/column ordering into cell text spans").

The labeling is run-based: rows are decomposed into foreground runs with
vectorized NumPy, and the union-find loop iterates over *runs*, not
pixels, so grid-like images (few long runs) label in microseconds.
"""

from __future__ import annotations

import numpy as np

__all__ = ["connected_components", "detect_cells", "order_cells"]


def _row_runs(mask_row_bool: np.ndarray) -> np.ndarray:
    """Return (n_runs, 2) array of [start, end) column intervals of True."""
    d = np.diff(mask_row_bool.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if mask_row_bool[0]:
        starts = np.concatenate(([0], starts))
    if mask_row_bool[-1]:
        ends = np.concatenate((ends, [mask_row_bool.size]))
    return np.stack([starts, ends], axis=1)


class _UnionFind:
    __slots__ = ("parent",)

    def __init__(self) -> None:
        self.parent: list[int] = []

    def make(self) -> int:
        self.parent.append(len(self.parent))
        return len(self.parent) - 1

    def find(self, a: int) -> int:
        p = self.parent
        root = a
        while p[root] != root:
            root = p[root]
        while p[a] != root:  # path compression
            p[a], a = root, p[a]
        return root

    def union(self, a: int, b: int) -> int:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra
        return ra


def connected_components(
    bin_img: np.ndarray, return_labels: bool = False
) -> tuple[int, np.ndarray | None, np.ndarray]:
    """4-connectivity connected components of a binary image.

    Returns ``(n, labels, stats)`` where ``stats`` is an int64 array of
    shape (n, 5) with columns (x, y, w, h, area), sorted by (y, x, w, h)
    for determinism. ``labels`` is an int32 label map (1-based, 0 =
    background) when ``return_labels`` else None. Label ids follow the
    stats row order + 1.
    """
    H, W = bin_img.shape
    fg = bin_img != 0
    uf = _UnionFind()
    run_labels: list[np.ndarray] = []
    runs_per_row: list[np.ndarray] = []
    prev_runs = np.empty((0, 2), dtype=np.int64)
    prev_lab = np.empty(0, dtype=np.int64)
    for y in range(H):
        row = fg[y]
        if not row.any():
            runs = np.empty((0, 2), dtype=np.int64)
            labs = np.empty(0, dtype=np.int64)
        else:
            runs = _row_runs(row)
            labs = np.empty(len(runs), dtype=np.int64)
            j = 0
            for i, (s, e) in enumerate(runs):
                lab = -1
                # advance over previous-row runs ending at or before s
                while j < len(prev_runs) and prev_runs[j, 1] <= s:
                    j += 1
                jj = j
                while jj < len(prev_runs) and prev_runs[jj, 0] < e:
                    lab = (
                        uf.union(lab, uf.find(prev_lab[jj]))
                        if lab >= 0
                        else uf.find(prev_lab[jj])
                    )
                    jj += 1
                labs[i] = uf.make() if lab < 0 else lab
        run_labels.append(labs)
        runs_per_row.append(runs)
        prev_runs, prev_lab = runs, labs

    if not uf.parent:
        return 0, (np.zeros((H, W), np.int32) if return_labels else None), np.empty(
            (0, 5), np.int64
        )

    roots = np.array([uf.find(i) for i in range(len(uf.parent))], dtype=np.int64)
    uniq = {}
    comp = np.empty(len(roots), dtype=np.int64)
    for i, r in enumerate(roots):
        comp[i] = uniq.setdefault(r, len(uniq))
    n = len(uniq)

    x0 = np.full(n, W, np.int64)
    x1 = np.zeros(n, np.int64)
    y0 = np.full(n, H, np.int64)
    y1 = np.zeros(n, np.int64)
    area = np.zeros(n, np.int64)
    for y in range(H):
        runs, labs = runs_per_row[y], run_labels[y]
        for i in range(len(runs)):
            c = comp[labs[i]]
            s, e = runs[i]
            if s < x0[c]:
                x0[c] = s
            if e > x1[c]:
                x1[c] = e
            if y < y0[c]:
                y0[c] = y
            if y + 1 > y1[c]:
                y1[c] = y + 1
            area[c] += e - s

    stats = np.stack([x0, y0, x1 - x0, y1 - y0, area], axis=1)
    order = np.lexsort((stats[:, 2], stats[:, 0], stats[:, 1]))
    stats = stats[order]
    labels = None
    if return_labels:
        remap = np.empty(n, dtype=np.int32)
        remap[order] = np.arange(1, n + 1, dtype=np.int32)
        labels = np.zeros((H, W), dtype=np.int32)
        for y in range(H):
            runs, labs = runs_per_row[y], run_labels[y]
            for i in range(len(runs)):
                labels[y, runs[i, 0] : runs[i, 1]] = remap[comp[labs[i]]]
    return n, labels, stats


def detect_cells(
    grid: np.ndarray,
    min_area: int = 24,
    min_w: int = 4,
    min_h: int = 4,
) -> np.ndarray:
    """Cell interiors = components of the grid-mask complement.

    The outer background (any component touching the image border) is
    excluded; remaining components are filtered by area/width/height
    sanity. Returns int64 (n_cells, 4) rects (x, y, w, h) in stats order.
    """
    H, W = grid.shape
    inv = np.where(grid == 0, 255, 0).astype(np.uint8)
    _, _, stats = connected_components(inv)
    if stats.size == 0:
        return np.empty((0, 4), np.int64)
    x, y, w, h = stats[:, 0], stats[:, 1], stats[:, 2], stats[:, 3]
    keep = (
        (x > 0)
        & (y > 0)
        & (x + w < W)
        & (y + h < H)
        & (stats[:, 4] >= min_area)
        & (w >= min_w)
        & (h >= min_h)
    )
    return stats[keep][:, :4]


def order_cells(rects: np.ndarray) -> np.ndarray:
    """Assign (row, col) to cell rects by y-center clustering then x order.

    Rows are formed by scanning y-centers in ascending order and starting
    a new row when the gap to the previous center exceeds half the median
    cell height (BASELINE.json:6 "sorts cells by (row, col)"); stable and
    deterministic. Returns int64 (n, 6): (row, col, x, y, w, h).
    """
    if len(rects) == 0:
        return np.empty((0, 6), np.int64)
    yc = rects[:, 1] + rects[:, 3] / 2.0
    xc = rects[:, 0] + rects[:, 2] / 2.0
    gap = max(2.0, float(np.median(rects[:, 3])) / 2.0)
    order = np.lexsort((xc, yc))
    row_id = np.zeros(len(rects), dtype=np.int64)
    rid = 0
    prev_y = yc[order[0]]
    for k in order:
        if yc[k] - prev_y > gap:
            rid += 1
        row_id[k] = rid
        prev_y = yc[k]
    out = []
    for r in range(rid + 1):
        idx = np.flatnonzero(row_id == r)
        idx = idx[np.argsort(xc[idx], kind="stable")]
        for c, k in enumerate(idx):
            out.append((r, c, *rects[k]))
    return np.array(out, dtype=np.int64)
