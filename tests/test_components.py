"""Unit tests A11-A13: components vs BFS reference; cell detect/order."""

from collections import deque

import numpy as np
import pytest

from opencv_table_extraction_spark.kernel.components import (
    connected_components,
    detect_cells,
    order_cells,
)

RNG = np.random.RandomState(99)


def bfs_components(img):
    H, W = img.shape
    seen = np.zeros((H, W), bool)
    comps = []
    for y in range(H):
        for x in range(W):
            if img[y, x] and not seen[y, x]:
                q = deque([(y, x)])
                seen[y, x] = True
                px = []
                while q:
                    cy, cx = q.popleft()
                    px.append((cy, cx))
                    for ny, nx in ((cy-1,cx),(cy+1,cx),(cy,cx-1),(cy,cx+1)):
                        if 0 <= ny < H and 0 <= nx < W and img[ny, nx] and not seen[ny, nx]:
                            seen[ny, nx] = True
                            q.append((ny, nx))
                ys = [p[0] for p in px]; xs = [p[1] for p in px]
                comps.append((min(xs), min(ys), max(xs)-min(xs)+1, max(ys)-min(ys)+1, len(px)))
    return sorted(comps, key=lambda s: (s[1], s[0], s[2]))


@pytest.mark.parametrize("density", [0.1, 0.3, 0.5, 0.7])
def test_components_match_bfs(density):
    img = (RNG.rand(40, 55) < density).astype(np.uint8) * 255
    n, labels, stats = connected_components(img, return_labels=True)
    ref = bfs_components(img)
    assert n == len(ref)
    assert [tuple(s) for s in stats] == ref
    # label map partitions the foreground consistently
    assert (labels > 0).sum() == (img > 0).sum()
    for lab in range(1, n + 1):
        area = (labels == lab).sum()
        assert area == stats[lab - 1, 4]


def test_components_empty_and_full():
    n, _, stats = connected_components(np.zeros((5, 5), np.uint8))
    assert n == 0 and stats.shape == (0, 5)
    n, _, stats = connected_components(np.full((4, 6), 255, np.uint8))
    assert n == 1 and tuple(stats[0]) == (0, 0, 6, 4, 24)


def test_detect_cells_excludes_border_and_noise():
    grid = np.zeros((50, 70), np.uint8)
    # a 2x2 cell table drawn as grid lines
    for y in (10, 25, 40):
        grid[y:y+2, 10:62] = 255
    for x in (10, 35, 60):
        grid[10:42, x:x+2] = 255
    cells = detect_cells(grid)
    assert len(cells) == 4
    for x, y, w, h in cells:
        assert w >= 4 and h >= 4


def test_order_cells_row_major():
    rects = np.array([
        [40, 30, 20, 10],   # row1 col1
        [10, 10, 20, 10],   # row0 col0
        [40, 11, 20, 10],   # row0 col1 (1px jitter)
        [10, 31, 20, 10],   # row1 col0
    ])
    out = order_cells(rects)
    assert [(r, c) for r, c, *_ in out] == [(0, 0), (0, 1), (1, 0), (1, 1)]
    assert tuple(out[0][2:]) == (10, 10, 20, 10)
    assert tuple(out[3][2:]) == (40, 30, 20, 10)


def test_order_cells_empty():
    assert order_cells(np.empty((0, 4), np.int64)).shape == (0, 6)
