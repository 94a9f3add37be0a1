"""Unit tests A3-A10 vs brute-force references (SURVEY.md §5.2-3)."""

import numpy as np
import pytest

from opencv_table_extraction_spark.kernel.imaging import (
    adaptive_threshold,
    dilate,
    erode,
    grid_mask,
    mask_intersect,
    morph_open,
    otsu_threshold,
    to_gray,
)

RNG = np.random.RandomState(1234)


def brute_otsu(gray):
    hist = np.bincount(gray.ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    best_t, best_v = 0, -1.0
    for t in range(256):
        w0 = hist[: t + 1].sum() / total
        w1 = 1 - w0
        if w0 == 0 or w1 == 0:
            v = 0.0
        else:
            mu0 = (hist[: t + 1] * np.arange(t + 1)).sum() / hist[: t + 1].sum()
            mu1 = (hist[t + 1 :] * np.arange(t + 1, 256)).sum() / hist[t + 1 :].sum()
            v = w0 * w1 * (mu0 - mu1) ** 2
        if v > best_v + 1e-12:
            best_v, best_t = v, t
    return best_t


def brute_morph(img, se, op, pad):
    kh, kw = se
    lh, rh = (kh - 1) // 2, kh // 2
    lw, rw = (kw - 1) // 2, kw // 2
    p = np.pad(img, ((lh, rh), (lw, rw)), constant_values=pad)
    H, W = img.shape
    out = np.empty_like(img)
    for y in range(H):
        for x in range(W):
            out[y, x] = op(p[y : y + kh, x : x + kw])
    return out


@pytest.mark.parametrize("trial", range(8))
def test_otsu_matches_bruteforce(trial):
    if trial < 4:
        gray = RNG.randint(0, 256, (40, 50)).astype(np.uint8)
    else:  # bimodal, the realistic document case
        gray = np.where(RNG.rand(40, 50) < 0.2, RNG.randint(0, 60, (40, 50)),
                        RNG.randint(200, 256, (40, 50))).astype(np.uint8)
    thr, binary = otsu_threshold(gray)
    assert thr == brute_otsu(gray)
    assert np.array_equal(binary, np.where(gray <= thr, 255, 0).astype(np.uint8))


def test_otsu_empty_and_flat():
    flat = np.full((10, 10), 77, np.uint8)
    thr, b = otsu_threshold(flat)
    assert b.shape == flat.shape


@pytest.mark.parametrize("se", [(1, 3), (3, 1), (3, 3), (1, 8), (7, 1), (2, 5), (5, 2), (4, 4), (1, 25)])
def test_erode_dilate_match_bruteforce(se):
    img = (RNG.rand(23, 31) < 0.45).astype(np.uint8) * 255
    assert np.array_equal(erode(img, se), brute_morph(img, se, np.min, 255))
    assert np.array_equal(dilate(img, se), brute_morph(img, se, np.max, 0))


def test_open_removes_short_keeps_long_runs():
    img = np.zeros((5, 60), np.uint8)
    img[2, 5:9] = 255     # run of 4 < k
    img[2, 20:45] = 255   # run of 25 >= k
    out = morph_open(img, (1, 10))
    assert out[2, 5:9].sum() == 0
    assert np.array_equal(out[2, 20:45], np.full(25, 255, np.uint8))
    assert out.sum() == 25 * 255  # opening is idempotent-exact on long runs


def test_adaptive_threshold_lines_on_white():
    img = np.full((60, 80), 255, np.uint8)
    img[30, 10:70] = 0  # a thin dark line
    out = adaptive_threshold(img, block=15, C=-2)
    assert (out[30, 12:68] == 255).all()      # line is ink
    assert out[5, 5] == 0 and out[55, 75] == 0  # flat white is background


def test_mask_ops_and_gray():
    a = np.array([[0, 255], [255, 255]], np.uint8)
    b = np.array([[0, 0], [255, 0]], np.uint8)
    assert np.array_equal(mask_intersect(a, b), np.array([[0, 0], [255, 0]], np.uint8))
    assert np.array_equal(grid_mask(a, b), np.array([[0, 255], [255, 255]], np.uint8))
    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[..., 1] = 255
    g = to_gray(rgb)
    assert g.shape == (2, 2) and abs(int(g[0, 0]) - 150) <= 1  # 0.587*255
