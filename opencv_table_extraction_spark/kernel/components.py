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


def _all_runs(fg: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized run extraction for the WHOLE image in one pass.

    A guard column of False is appended so runs never straddle rows;
    transitions are found on the flattened mask with a single diff.
    Returns (row, start_col, end_col) int64 arrays sorted by (row, start).
    """
    H, W = fg.shape
    padded = np.zeros((H, W + 1), dtype=bool)
    padded[:, :W] = fg
    flat = padded.ravel()
    d = np.diff(flat.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if flat[0]:
        starts = np.concatenate(([0], starts))
    rows = starts // (W + 1)
    return rows, starts - rows * (W + 1), ends - rows * (W + 1)


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
    if not fg.any():
        return 0, (np.zeros((H, W), np.int32) if return_labels else None), np.empty(
            (0, 5), np.int64
        )
    # band compression (exact): consecutive identical rows — the common
    # case for grid/cell imagery, where components are rectangles — are
    # collapsed to one representative row each; 4-connectivity within a
    # band is trivial (identical runs stack), and adjacent bands touch by
    # construction, so labeling over bands is equivalent to labeling over
    # rows. Turns O(H * runs/row) union-find work into O(bands * runs).
    if H > 1:
        changed = np.any(fg[1:] != fg[:-1], axis=1)
        band_y0 = np.concatenate(([0], np.flatnonzero(changed) + 1))
    else:
        band_y0 = np.zeros(1, np.int64)
    band_y1 = np.concatenate((band_y0[1:], [H]))
    r_row, r_s, r_e = _all_runs(fg[band_y0])
    rows_l = r_row.tolist()
    s_l = r_s.tolist()
    e_l = r_e.tolist()
    n_runs = len(rows_l)

    uf = _UnionFind()
    find, union, make = uf.find, uf.union, uf.make
    run_lab = [0] * n_runs
    # single pass over runs (already sorted by (row, start)); two-pointer
    # against the previous row's run range for 4-connectivity merges
    prev_lo = prev_hi = 0
    prev_row = -2
    i = 0
    while i < n_runs:
        r = rows_l[i]
        j_end = i
        while j_end < n_runs and rows_l[j_end] == r:
            j_end += 1
        if r != prev_row + 1:
            lo = hi = i  # previous row empty: no merges possible
        else:
            lo, hi = prev_lo, prev_hi
        j = lo
        for k in range(i, j_end):
            s, e = s_l[k], e_l[k]
            lab = -1
            while j < hi and e_l[j] <= s:
                j += 1
            jj = j
            while jj < hi and s_l[jj] < e:
                lab = union(lab, find(run_lab[jj])) if lab >= 0 else find(run_lab[jj])
                jj += 1
            run_lab[k] = make() if lab < 0 else lab
        prev_lo, prev_hi, prev_row = i, j_end, r
        i = j_end

    roots = [find(x) for x in run_lab]
    uniq: dict[int, int] = {}
    comp = np.array([uniq.setdefault(x, len(uniq)) for x in roots], dtype=np.int64)
    n = len(uniq)

    # vectorized stats: scatter-reduce run extents into components,
    # expanding band rows back to pixel rows
    x0 = np.full(n, W, np.int64)
    x1 = np.zeros(n, np.int64)
    y0 = np.full(n, H, np.int64)
    y1 = np.zeros(n, np.int64)
    area = np.zeros(n, np.int64)
    run_y0 = band_y0[r_row]
    run_y1 = band_y1[r_row]
    np.minimum.at(x0, comp, r_s)
    np.maximum.at(x1, comp, r_e)
    np.minimum.at(y0, comp, run_y0)
    np.maximum.at(y1, comp, run_y1)
    np.add.at(area, comp, (r_e - r_s) * (run_y1 - run_y0))

    stats = np.stack([x0, y0, x1 - x0, y1 - y0, area], axis=1)
    order = np.lexsort((stats[:, 2], stats[:, 0], stats[:, 1]))
    stats = stats[order]
    labels = None
    if return_labels:
        remap = np.empty(n, dtype=np.int32)
        remap[order] = np.arange(1, n + 1, dtype=np.int32)
        labels = np.zeros((H, W), dtype=np.int32)
        run_remap = remap[comp]
        ry0 = run_y0.tolist()
        ry1 = run_y1.tolist()
        for k in range(n_runs):
            labels[ry0[k] : ry1[k], s_l[k] : e_l[k]] = run_remap[k]
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
    inv = np.where(grid == 0, np.uint8(255), np.uint8(0))
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
    n = len(rects)
    if n == 0:
        return np.empty((0, 6), np.int64)
    yc = rects[:, 1] + rects[:, 3] / 2.0
    xc = rects[:, 0] + rects[:, 2] / 2.0
    gap = max(2.0, float(np.median(rects[:, 3])) / 2.0)
    order = np.lexsort((xc, yc))
    # row ids: a new row starts when the gap to the PREVIOUS center (in
    # (yc, xc) order) exceeds `gap` — the same chained comparison the
    # old per-element loop made, as one vectorized diff + cumsum
    ys = yc[order]
    brk = np.empty(n, dtype=np.int64)
    brk[0] = 0
    np.greater(ys[1:] - ys[:-1], gap, out=brk[1:], casting="unsafe")
    row_id = np.empty(n, dtype=np.int64)
    row_id[order] = np.cumsum(brk)
    # final order: by row, then x-center, ties by original index — the
    # stable per-row argsort of the loop form, as one lexsort
    final = np.lexsort((np.arange(n), xc, row_id))
    rows_f = row_id[final]
    # col = position within the row run
    start = np.empty(n, dtype=bool)
    start[0] = True
    np.not_equal(rows_f[1:], rows_f[:-1], out=start[1:])
    idx = np.arange(n, dtype=np.int64)
    col = idx - np.maximum.accumulate(np.where(start, idx, 0))
    out = np.empty((n, 6), dtype=np.int64)
    out[:, 0] = rows_f
    out[:, 1] = col
    out[:, 2:] = rects[final]
    return out
