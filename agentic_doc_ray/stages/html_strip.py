"""HTML boilerplate-strip stage (stateless map_batches task).

Rewrites ``kind=="html"`` page rows: ``text`` becomes the stripped main
content and ``kind`` becomes ``"text"`` so the downstream parser sees plain
blocks. Non-HTML rows pass through untouched in their own table slice —
only the HTML subset (~8% of pages) is processed at all, and that subset
runs through chained Arrow RE2 kernels (``replace_substring_regex`` /
``split_pattern_regex`` / ``binary_join``), bit-identical to the pure
``textparse.strip_html`` spec (property-pinned in tests/test_html_vec.py).

This is the north_star's dedicated boilerplate-strip stage; the reference
has no local analogue (stripping happened server-side behind the API).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from agentic_doc_ray.textparse import LINK_DENSITY_MAX, MIN_BLOCK_CHARS  # noqa: F401

_WS_CLS = r"[ \t\n\r\f\v]"
# Same order as textparse._SUBTREE_RES + comment strip.
_SUBTREE_PATTERNS = [
    rf"(?is)<{t}\b[^>]*>.*?</{t}{_WS_CLS}*>"
    for t in ("script", "style", "nav", "footer", "header", "aside")
] + [r"(?s)<!--.*?-->"]
_BLOCK_SPLIT_PATTERN = r"(?i)</?(?:p|div|h[1-6]|ul|ol|li|table|tr|section|article|br)\b[^>]*>"
_ANCHOR_PATTERN = rf"(?is)<a\b[^>]*>.*?</a{_WS_CLS}*>"
_TAG_PATTERN = r"<[^>]+>"
_WS_NORM_PATTERN = r"[ \t\r\f\v]+"
_EDGE_WS_PATTERN = rf"^{_WS_CLS}+|{_WS_CLS}+$"


def strip_html_array(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized ``strip_html`` over a string array (RE2 kernels only)."""
    s = texts
    for pat in _SUBTREE_PATTERNS:
        s = pc.replace_substring_regex(s, pat, " ")
    blocks = pc.split_pattern_regex(s, _BLOCK_SPLIT_PATTERN)
    if isinstance(blocks, pa.ChunkedArray):
        blocks = blocks.combine_chunks()
    n_rows = len(blocks)
    flat = blocks.flatten()
    parents = pc.list_parent_indices(blocks).to_numpy(zero_copy_only=False)

    visible_all = pc.replace_substring_regex(flat, _TAG_PATTERN, "")
    no_anchor = pc.replace_substring_regex(flat, _ANCHOR_PATTERN, "")
    visible_no_anchor = pc.replace_substring_regex(no_anchor, _TAG_PATTERN, "")
    len_all = pc.utf8_length(visible_all).to_numpy(zero_copy_only=False)
    anchor_chars = len_all - pc.utf8_length(visible_no_anchor).to_numpy(
        zero_copy_only=False
    )
    visible = pc.replace_substring_regex(
        pc.replace_substring_regex(visible_all, _WS_NORM_PATTERN, " "),
        _EDGE_WS_PATTERN,
        "",
    )
    vis_len = pc.utf8_length(visible).to_numpy(zero_copy_only=False)
    keep = (vis_len >= MIN_BLOCK_CHARS) & (2 * anchor_chars <= vis_len)

    kept_vals = visible.filter(pa.array(keep))
    kept_parents = parents[keep]
    counts = np.bincount(kept_parents, minlength=n_rows)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    kept_lists = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), kept_vals.combine_chunks()
        if isinstance(kept_vals, pa.ChunkedArray)
        else kept_vals,
    )
    return pc.binary_join(kept_lists, "\n\n")


def strip_html_batch(batch: pa.Table) -> pa.Table:
    kind = batch.column("kind")
    mask = pc.equal(kind, "html")
    if not pc.any(mask).as_py():
        return batch
    html_rows = batch.filter(mask)
    rest = batch.filter(pc.invert(mask))
    stripped = strip_html_array(html_rows.column("text"))
    html_rows = html_rows.set_column(
        batch.schema.get_field_index("text"), "text", stripped
    ).set_column(
        batch.schema.get_field_index("kind"),
        "kind",
        pa.array(["text"] * html_rows.num_rows, pa.string()),
    )
    # Row order changes across the concat; downstream order comes from the
    # offset columns, never block order (pinned by the shuffled-input tests).
    return pa.concat_tables([rest, html_rows])
