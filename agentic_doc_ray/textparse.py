"""Pure, deterministic parsing primitives.

These are the local stand-ins for the reference's remote
"agentic-document-analysis" API (``/root/reference/agentic_doc/parse.py:751-828``):
HTML boilerplate stripping via DOM heuristics, block segmentation, and chunk
classification into the reference's ``ChunkType`` taxonomy
(``common.py:22-26``: table/figure/text/marginalia) plus ``title`` (per the
north_star) and ``error`` (the placeholder kind, ``parse.py:722-739``).

Everything here is a pure function of its inputs — required so Ray task
retries are idempotent (SURVEY.md §7.4). The Ray actor stage and the
pure-Python oracle both call these primitives; orchestration (split, shuffle,
merge, rebase) is tested independently against the oracle.
"""

from __future__ import annotations

import re
from typing import NamedTuple

# Marker synthesized into undecodable page payloads (the analogue of a part
# the remote API cannot parse — tests/unit/test_parse.py:438-501 semantics).
CORRUPT_MARKER = "\x00CORRUPT\x00"

KIND_TITLE = "title"
KIND_TEXT = "text"
KIND_TABLE = "table"
KIND_FIGURE = "figure"
KIND_MARGINALIA = "marginalia"
KIND_ERROR = "error"

# All patterns use re.ASCII so python-re semantics == RE2 semantics: the
# vectorized Arrow implementation (stages/layout_parse_vec.py) must be
# bit-identical to this spec, and RE2's \s, \d, \b are ASCII-only.
_FIGURE_RE = re.compile(r"^!\[(?P<caption>[^\]]*)\]\((?P<ref>[^)]*)\)", re.A)
_PAGENUM_RE = re.compile(r"^(Page \d+( of \d+)?|- \d+ -|\d{1,4})$", re.A)
_ALLCAPS_RE = re.compile(r"^[A-Z][A-Z0-9 .,&'\-]{2,60}$", re.A)
# explicit whitespace class: python-re ASCII \s includes \x0b (vertical
# tab) but RE2's \s does not — the vectorized parser must match exactly
_WS = r"[ \t\n\r\f\v]"
_BLOCK_SEP_RE = re.compile(rf"\n{_WS}*\n", re.A)
_EDGE_WS_RE = re.compile(rf"^{_WS}+|{_WS}+$", re.A)
_LINE_TABLE_RE = re.compile(r"[ \t]*\|", re.A)

# --- HTML boilerplate stripping (DOM heuristics) ---------------------------
# Sequential per-tag subtree strips (one regex pass per tag, in this order)
# instead of a single alternation with a backreference: RE2 has no
# backreferences, and the vectorized Arrow implementation
# (stages/html_strip.py) must be bit-identical to this spec. All patterns
# are ASCII (re.A) for the same reason.
_SUBTREE_TAGS = ("script", "style", "nav", "footer", "header", "aside")
_SUBTREE_RES = [
    re.compile(rf"<{t}\b[^>]*>.*?</{t}{_WS}*>", re.S | re.I | re.A)
    for t in _SUBTREE_TAGS
]
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_BLOCK_SPLIT_RE = re.compile(
    r"</?(?:p|div|h[1-6]|ul|ol|li|table|tr|section|article|br)\b[^>]*>", re.I | re.A
)
_ANCHOR_RE = re.compile(rf"<a\b[^>]*>.*?</a{_WS}*>", re.S | re.I | re.A)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"[ \t\r\f\v]+")

# Boilerplate thresholds: a block whose visible text is mostly link text
# (link density > 0.5) or too short (< 20 chars) is chrome, not content.
LINK_DENSITY_MAX = 0.5
MIN_BLOCK_CHARS = 20


def strip_html(html: str) -> str:
    """Strip HTML boilerplate, returning main-content text blocks.

    DOM heuristics (the north_star's from-scratch analogue of
    boilerplate-removal): drop <script>/<style>/<nav>/<footer>/<header>/
    <aside> subtrees and comments, split on block-level tags, then keep only
    blocks with link density <= 0.5 and visible length >= 20 chars. Blocks
    are re-joined with a blank line so the result feeds the same block
    segmenter as plain pages.
    """
    if not html:
        return ""
    s = html
    for pat in _SUBTREE_RES:
        s = pat.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    kept: list[str] = []
    for raw in _BLOCK_SPLIT_RE.split(s):
        if not raw:
            continue
        # anchor visible chars = visible(raw) - visible(raw minus anchors):
        # removing an anchor removes exactly its tag-stripped inner text
        # from the tag-stripped whole (exact, and RE2-expressible — unlike
        # findall with a capture group).
        visible_all = _TAG_RE.sub("", raw)
        visible_no_anchor = _TAG_RE.sub("", _ANCHOR_RE.sub("", raw))
        anchor_chars = len(visible_all) - len(visible_no_anchor)
        visible = _EDGE_WS_RE.sub("", _WS_RE.sub(" ", visible_all))
        if not visible:
            continue
        if len(visible) < MIN_BLOCK_CHARS:
            continue
        # link density > 0.5, in exact integers (len(visible) >= 1 here)
        if 2 * anchor_chars > len(visible):
            continue
        kept.append(visible)
    return "\n\n".join(kept)


# --- block segmentation + classification -----------------------------------


def segment_blocks(page_text: str) -> list[str]:
    """Split a page payload into layout blocks (blank-line separated).

    ASCII whitespace semantics throughout (see pattern note above)."""
    blocks = [_EDGE_WS_RE.sub("", b) for b in _BLOCK_SEP_RE.split(page_text)]
    return [b for b in blocks if b]


def classify_block(block: str) -> tuple[str, str]:
    """Classify one block -> (kind, media_ref).

    Deterministic layout heuristics standing in for the remote model:
      - ``# ...`` heading        -> title
      - all lines start with '|' -> table
      - markdown image           -> figure (media_ref extracted)
      - page numbers / short ALL-CAPS lines / (c) lines -> marginalia
      - otherwise                -> text
    Taxonomy: ChunkType (common.py:22-26) + title.
    """
    first = block.split("\n", 1)[0]
    if first.startswith("# ") or first.startswith("## "):
        return KIND_TITLE, ""
    m = _FIGURE_RE.match(block)
    if m:
        return KIND_FIGURE, m.group("ref")
    lines = block.split("\n")
    if all(_LINE_TABLE_RE.match(ln) for ln in lines):
        return KIND_TABLE, ""
    if len(lines) == 1:
        ln = lines[0]
        if (
            _PAGENUM_RE.match(ln)
            or ln.startswith("©")
            or ln.startswith("(c) ")
            or (_ALLCAPS_RE.match(ln) and len(ln) <= 60)
        ):
            return KIND_MARGINALIA, ""
    return KIND_TEXT, ""


def bbox_for(block_idx: int, n_blocks: int, kind: str) -> tuple[float, float, float, float]:
    """Deterministic normalized bbox [l,t,r,b] for block i of n on a page.

    Vertical stack layout; invariants mirror the reference's integ tests
    (tests/integ/test_parse_integ.py:375-401): all in [0,1], r > l, b > t.
    """
    n = max(1, n_blocks)
    t = block_idx / n
    b = (block_idx + 1) / n
    l = 0.08 if kind == KIND_MARGINALIA else 0.05
    r = 0.92 if kind == KIND_MARGINALIA else 0.95
    # keep strictly inside [0,1] with b > t
    t = min(max(t, 0.0), 0.999)
    b = min(max(b, t + 0.001), 1.0)
    return (l, t, r, b)


class PageChunk(NamedTuple):
    """One extracted chunk of one page, pages still part-relative."""

    block_idx: int
    kind: str
    text: str
    media_ref: str
    chunk_id: str
    bbox: tuple[float, float, float, float]
    is_error: bool
    error: str


def parse_page(
    doc_id: str,
    offset: int,
    kind: str,
    text: str,
    media_ref: str,
    *,
    include_marginalia: bool = True,
) -> list[PageChunk]:
    """Parse ONE page unit (an input span) into chunks.

    Never throws (the reference's never-throw contract, parse.py:722-739):
    an undecodable payload yields a single error placeholder chunk with
    is_error=True; the caller turns it into a PageError row + error span.

    chunk_id = f"{doc_id}-{offset:05d}-{block_idx:02d}" — unique per doc
    (integ test :337-360) and computable without knowing the merge order.
    """
    try:
        if CORRUPT_MARKER in text:
            raise ValueError("unparseable page payload")
        if kind == "image":
            # A standalone image span -> one figure chunk grounded on page 0
            # (_parse_image semantics: start=end=0, parse.py:538-545).
            return [
                PageChunk(
                    0,
                    KIND_FIGURE,
                    text,
                    media_ref,
                    f"{doc_id}-{offset:05d}-00",
                    bbox_for(0, 1, KIND_FIGURE),
                    False,
                    "",
                )
            ]
        payload = strip_html(text) if kind == "html" else text
        blocks = segment_blocks(payload)
        chunks: list[PageChunk] = []
        n = len(blocks)
        out_idx = 0
        for i, block in enumerate(blocks):
            ckind, cref = classify_block(block)
            if ckind == KIND_MARGINALIA and not include_marginalia:
                continue
            chunks.append(
                PageChunk(
                    out_idx,
                    ckind,
                    block,
                    cref,
                    f"{doc_id}-{offset:05d}-{out_idx:02d}",
                    bbox_for(i, n, ckind),
                    False,
                    "",
                )
            )
            out_idx += 1
        return chunks
    except Exception as exc:  # never-throw contract
        return [
            PageChunk(
                0,
                KIND_ERROR,
                "",
                "",
                f"{doc_id}-{offset:05d}-00",
                (0.0, 0.0, 1.0, 1.0),
                True,
                str(exc),
            )
        ]


def part_markdown(chunk_texts: list[str]) -> str:
    """Markdown of one part = chunk texts joined with blank lines."""
    return "\n\n".join(chunk_texts)


def merge_markdown(part_markdowns: list[str]) -> str:
    """Merge part markdowns in part order with "\\n\\n" separators.

    Faithful to _merge_next_part (parse.py:620-629): even an empty (failed)
    part contributes its separator.
    """
    return "\n\n".join(part_markdowns)
