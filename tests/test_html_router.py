"""Unit tests A16-A22: HTML boilerplate strip + the reference's router
contract (test2.py:3-12 — the one operator the reference encodes)."""

from opencv_table_extraction_spark.kernel.extract import extract_turn
from opencv_table_extraction_spark.kernel.html import (
    extract_main_content,
    segment_blocks,
    tokenize_html,
)
from opencv_table_extraction_spark.kernel.router import route_page, transcribe


def test_script_style_comment_elided():
    html = "<p>keep this sentence around for the test</p><script>drop() < 1</script><style>.x{}</style><!-- gone -->"
    toks = tokenize_html(html)
    texts = " ".join(t[2] for t in toks if t[0] == "text")
    assert "drop" not in texts and "gone" not in texts and "keep" in texts


def test_boilerplate_stripped_content_kept():
    content = "the quick brown fox jumped over the lazy dog again and again"
    html = (
        '<html><body><nav><ul><li><a href="/">home</a></li>'
        '<li><a href="/x">about</a></li></ul></nav>'
        f"<div><p>{content}</p></div>"
        "<footer>copyright</footer></body></html>"
    )
    assert extract_main_content(html) == content


def test_link_density_rejects_link_farm():
    links = "".join(f'<a href="#{i}">some anchor text number {i}</a> ' for i in range(8))
    html = f"<div>{links}</div>"
    assert extract_main_content(html) == ""


def test_block_segmentation_counts():
    html = '<p>one <b>two</b> three</p><p>four</p>'
    blocks = segment_blocks(tokenize_html(html))
    assert [b.text for b in blocks] == ["one two three", "four"]
    assert blocks[0].n_tags == 2  # <b> and </b>


def _scan(regions, transcript="hello world transcript"):
    return f"[[scan]] w=400 h=300\n" + "\n".join(regions) + f"\n[[/scan]]\n{transcript}"


def test_filled_form_triggers_handwriting():
    mode, _ = route_page(_scan([
        "region x=20 y=30 w=120 h=30 d=0.5",
        "region x=20 y=90 w=120 h=30 d=0.5",
    ]))
    assert mode == "handwriting"


def test_single_signature_at_bottom_does_not_trigger():
    # the explicit test2.py:5 carve-out
    mode, _ = route_page(_scan(["region x=250 y=260 w=90 h=24 d=0.5"]))
    assert mode == "ocr"


def test_single_large_region_not_signature():
    mode, _ = route_page(_scan(["region x=30 y=40 w=250 h=100 d=0.5"]))
    assert mode == "handwriting"


def test_faint_ink_below_floor_is_ocr():
    mode, _ = route_page(_scan(["region x=30 y=40 w=40 h=10 d=0.05"]))
    assert mode == "ocr"


def test_final_output_rule_no_mode_leakage():
    """test2.py:11-12: output ONLY the transcribed text."""
    payload = _scan(["region x=250 y=260 w=90 h=24 d=0.5"], "the transcript body")
    out = extract_turn(payload)
    assert out["extracted_text"] == "the transcript body"
    for word in ("ocr", "handwriting", "mode", "[[scan]]", "region"):
        assert word not in out["extracted_text"].lower()
    assert transcribe("ocr", " padded ") == "padded"


def test_route_dispatch_is_exactly_one():
    import pytest
    with pytest.raises(ValueError):
        transcribe("both", "x")
