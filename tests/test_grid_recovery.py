"""Constructive kernel property tests (SURVEY.md §5.2-2): render a known
R x C grid, run the full morphology chain, assert exact recovery of cell
count, (row, col) assignment, joint count, and span slicing."""

import numpy as np
import pytest

from opencv_table_extraction_spark.kernel.extract import extract_turn
from opencv_table_extraction_spark.kernel.render import parse_pipe_table


def make_table_md(R, C, sep=True):
    lines = []
    for r in range(R):
        lines.append("| " + " | ".join(f"r{r}c{c}-xx" for c in range(C)) + " |")
        if r == 0 and (sep or R == 1):
            lines.append("|" + "|".join(["---"] * C) + "|")
    return "\n".join(lines)


@pytest.mark.parametrize("R", [1, 2, 3, 5, 8])
@pytest.mark.parametrize("C", [1, 2, 4, 8])
def test_exact_grid_recovery(R, C):
    text = make_table_md(R, C)
    out = extract_turn(text)
    assert out["err"] == ""
    assert out["route"] == "table"
    assert out["n_rows"] == R and out["n_cols"] == C
    assert out["n_cells"] == R * C
    assert out["n_joints"] == (R + 1) * (C + 1)
    expected = "\n".join("\t".join(f"r{r}c{c}-xx" for c in range(C)) for r in range(R))
    assert out["extracted_text"] == expected
    # spans slice back to the original cell text, in (row, col) order
    spans = sorted(out["spans"], key=lambda s: (s["row"], s["col"]))
    for s in spans:
        assert text[s["start"] : s["end"]] == f"r{s['row']}c{s['col']}-xx"


@pytest.mark.parametrize("use_adaptive", [False, True])
def test_both_threshold_paths_agree(use_adaptive):
    text = make_table_md(4, 3)
    out = extract_turn(text, use_adaptive=use_adaptive)
    assert out["n_cells"] == 12 and out["err"] == ""


def test_ragged_rows_padded():
    text = "| a1 | b1 | c1 |\n| a2 | b2 |"
    out = extract_turn(text)
    assert out["n_rows"] == 2 and out["n_cols"] == 3
    assert out["extracted_text"] == "a1\tb1\tc1\na2\tb2\t"


def test_prose_noise_around_table_ignored():
    text = "intro prose line.\n| a | b |\n| c | d |\n\ntrailing prose."
    out = extract_turn(text)
    assert out["extracted_text"] == "a\tb\nc\td"


def test_parse_offsets():
    text = "| alpha | beta |\n|---|---|\n| gamma | d |"
    pt = parse_pipe_table(text)
    assert pt.n_rows == 2 and pt.n_cols == 2
    for cell in pt.cells:
        assert text[cell.start : cell.end] == cell.text


def test_noise_specks_do_not_create_cells():
    # many renders with different noise seeds (seed derives from payload)
    for salt in range(10):
        text = make_table_md(3, 3) + f"\n\nnoise salt {salt}."
        out = extract_turn(text)
        assert out["n_cells"] == 9, f"salt {salt}: {out}"
