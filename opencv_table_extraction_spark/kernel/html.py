"""HTML main-content extraction A18-A22 (SURVEY.md §2.A).

Single-pass tag tokenizer + block segmentation + text-density/link-density
boilerplate classification, in the published boilerpipe/trafilatura
family (Kohlschuetter et al., WSDM 2010 — text density + link density are
the two discriminative features). Mandated by BASELINE.json:6 "companion
HTML boilerplate stripping (DOM tag tokenize + text-density heuristics)
for markup-bearing turns"; the reference tree itself contains no HTML
code (SURVEY.md §0).

Pure Python/regex over a single turn payload; called only from inside
Arrow batches (kernel/extract.py), never per-row at the DataFrame layer.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

__all__ = ["tokenize_html", "segment_blocks", "score_block", "extract_main_content", "Block"]

_ELIDE = re.compile(
    r"<script\b.*?</script\s*>|<style\b.*?</style\s*>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
_TOKEN = re.compile(r"<\s*(/?)\s*([a-zA-Z][a-zA-Z0-9]*)((?:\s[^<>]*)?)\s*>")

BLOCK_TAGS = frozenset(
    "p div li ul ol td th tr table h1 h2 h3 h4 h5 h6 br article section "
    "header footer nav main blockquote pre form body html head title".split()
)

# classification thresholds (deterministic; tuned once, fixed)
MIN_CONTENT_CHARS = 25
MAX_LINK_DENSITY = 0.33
MIN_TEXT_DENSITY = 8.0
SMOOTH_MIN_CHARS = 10


@dataclass
class Block:
    text: str          # whitespace-normalized text run
    n_tags: int        # inline tags inside the block
    anchor_chars: int  # characters inside <a> ... </a>
    start_tag: str     # block-level tag that opened this block


def tokenize_html(text: str) -> list[tuple[str, str, str]]:
    """Tokenize to [(kind, tag, payload)]; kind in {'open','close','text'}.

    Script/style/comment spans are elided first. Self-closing and void
    tags surface as 'open'. Not a validating parser — a linear scanner,
    which is the right cost model for 10^12 turns.
    """
    text = _ELIDE.sub(" ", text)
    out: list[tuple[str, str, str]] = []
    pos = 0
    for m in _TOKEN.finditer(text):
        if m.start() > pos:
            run = text[pos : m.start()]
            if run.strip():
                out.append(("text", "", run))
        kind = "close" if m.group(1) else "open"
        out.append((kind, m.group(2).lower(), m.group(3) or ""))
        pos = m.end()
    if pos < len(text) and text[pos:].strip():
        out.append(("text", "", text[pos:]))
    return out


def segment_blocks(tokens: list[tuple[str, str, str]]) -> list[Block]:
    """Split the token stream into text blocks at block-level tag
    boundaries; track inline-tag count and anchor-text chars per block."""
    blocks: list[Block] = []
    buf: list[str] = []
    n_tags = 0
    anchor_chars = 0
    anchor_depth = 0
    start_tag = ""

    def flush() -> None:
        nonlocal buf, n_tags, anchor_chars
        txt = " ".join(" ".join(buf).split())
        if txt:
            blocks.append(Block(txt, n_tags, anchor_chars, start_tag))
        buf, n_tags, anchor_chars = [], 0, 0

    for kind, tag, payload in tokens:
        if kind == "text":
            buf.append(payload)
            if anchor_depth > 0:
                anchor_chars += len(" ".join(payload.split()))
        elif tag in BLOCK_TAGS:
            flush()
            if kind == "open":
                start_tag = tag
            anchor_depth = 0
        else:
            n_tags += 1
            if tag == "a":
                if kind == "open":
                    anchor_depth += 1
                else:
                    anchor_depth = max(0, anchor_depth - 1)
    flush()
    return blocks


def score_block(b: Block) -> tuple[float, float]:
    """(text_density, link_density) — Kohlschuetter-style features."""
    text_density = len(b.text) / (1.0 + b.n_tags)
    link_density = b.anchor_chars / max(1, len(b.text))
    return text_density, link_density


def _classify(blocks: list[Block]) -> list[bool]:
    labels = []
    for b in blocks:
        td, ld = score_block(b)
        labels.append(
            len(b.text) >= MIN_CONTENT_CHARS
            and ld <= MAX_LINK_DENSITY
            and td >= MIN_TEXT_DENSITY
        )
    # neighbor smoothing: short block sandwiched between two content
    # blocks is rescued; lone short content between boilerplate is dropped
    out = list(labels)
    for i in range(1, len(labels) - 1):
        if not labels[i] and labels[i - 1] and labels[i + 1]:
            b = blocks[i]
            _, ld = score_block(b)
            if len(b.text) >= SMOOTH_MIN_CHARS and ld <= MAX_LINK_DENSITY:
                out[i] = True
    return out


def extract_main_content(text: str) -> str:
    """A22: concatenated content blocks, '\\n'-joined, for a markup turn."""
    blocks = segment_blocks(tokenize_html(text))
    labels = _classify(blocks)
    return "\n".join(b.text for b, keep in zip(blocks, labels) if keep)
