"""Property-based hardening (hypothesis) for the imaging primitives:
morphology vs brute force on arbitrary masks, Otsu vs argmax scan on
arbitrary histograms, CC invariants, parse-offset round-trips."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from opencv_table_extraction_spark.kernel.components import connected_components
from opencv_table_extraction_spark.kernel.imaging import (
    dilate,
    erode,
    morph_open,
    otsu_threshold,
)
from opencv_table_extraction_spark.kernel.render import parse_pipe_table

masks = arrays(
    np.uint8,
    st.tuples(st.integers(1, 24), st.integers(1, 24)),
    elements=st.sampled_from([0, 255]),
)


def brute(img, se, op, pad):
    kh, kw = se
    p = np.pad(img, (((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)),
               constant_values=pad)
    return np.array(
        [[op(p[y : y + kh, x : x + kw]) for x in range(img.shape[1])]
         for y in range(img.shape[0])],
        dtype=np.uint8,
    )


@settings(max_examples=40, deadline=None)
@given(masks, st.integers(1, 7), st.integers(1, 7))
def test_erode_dilate_property(img, kh, kw):
    assert np.array_equal(erode(img, (kh, kw)), brute(img, (kh, kw), np.min, 255))
    assert np.array_equal(dilate(img, (kh, kw)), brute(img, (kh, kw), np.max, 0))


@settings(max_examples=25, deadline=None)
@given(masks, st.integers(2, 6))
def test_open_idempotent(img, k):
    once = morph_open(img, (1, k))
    assert np.array_equal(morph_open(once, (1, k)), once)


@settings(max_examples=120, deadline=None)
@given(masks, st.integers(2, 9))
def test_open_run_path_equals_erode_dilate(img, k):
    """The run-length 1-D opening fast path must equal the erode +
    reflected-dilate composition bit for bit, both axes."""
    from opencv_table_extraction_spark.kernel.imaging import dilate, erode

    got_h = morph_open(img, (1, k))
    ref_h = dilate(erode(img, (1, k)), (1, k), reflect=True)
    assert np.array_equal(got_h, ref_h)
    got_v = morph_open(img, (k, 1))
    ref_v = dilate(erode(img, (k, 1)), (k, 1), reflect=True)
    assert np.array_equal(got_v, ref_v)


@settings(max_examples=40, deadline=None)
@given(arrays(np.uint8, st.tuples(st.integers(2, 30), st.integers(2, 30)),
              elements=st.integers(0, 255)))
def test_otsu_binary_consistent(gray):
    thr, binary = otsu_threshold(gray)
    assert 0 <= thr <= 255
    assert np.array_equal(binary, np.where(gray <= thr, 255, 0).astype(np.uint8))


@settings(max_examples=40, deadline=None)
@given(masks)
def test_cc_invariants(img):
    n, labels, stats = connected_components(img, return_labels=True)
    assert (labels > 0).sum() == (img > 0).sum()
    assert stats[:, 4].sum() == (img > 0).sum()
    for i in range(n):
        x, y, w, h, area = stats[i]
        assert area <= w * h
        patch = labels[y : y + h, x : x + w]
        assert (patch == i + 1).sum() == area  # label confined to its bbox


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.text(
    alphabet=st.characters(blacklist_characters="|\n\r", min_codepoint=32,
                           max_codepoint=126),
    max_size=8).map(lambda s: s.strip() or "x"), min_size=1, max_size=5),
    min_size=1, max_size=5))
def test_parse_offsets_roundtrip(rows):
    text = "\n".join("| " + " | ".join(r) + " |" for r in rows)
    pt = parse_pipe_table(text)
    assert pt is not None
    for cell in pt.cells:
        assert text[cell.start : cell.end] == cell.text
