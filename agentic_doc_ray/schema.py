"""Arrow schemas for every table that crosses a stage boundary.

Derived from BASELINE.json ``input_hint`` and FIXTURES.md; the reference's
Pydantic models (``/root/reference/agentic_doc/common.py:22-161``) map onto
these per SURVEY.md §1.4. Stage boundaries enforce these schemas the way the
reference enforces Pydantic validation on every API response
(``parse.py:578-580``).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input corpus (the input_hint shape): one row per document.
# ---------------------------------------------------------------------------
INPUT_SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),       # "text" | "html" | "pdf_page" | "image"
        pa.field("text", pa.string()),       # payload ("" for pure media)
        pa.field("media_ref", pa.string()),  # grounding pointer ("" for pure text)
        pa.field("offset", pa.int32()),      # dense 0..n-1 intra-doc order key
    ]
)

CORPUS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(INPUT_SPAN_STRUCT)),
    ]
)

# ---------------------------------------------------------------------------
# Intermediate: one row per input span ("page unit") after the explode/split
# stage.  part_idx mirrors the reference's PDF part (utils.py:214-264):
# part_idx = offset // split_size, page_rel = offset - part_idx*split_size.
# ---------------------------------------------------------------------------
PAGE_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("part_idx", pa.int32()),
        pa.field("page_rel", pa.int32()),    # page index RELATIVE to its part
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),      # original input offset (= absolute page)
        pa.field("n_spans", pa.int32()),     # doc-level: total spans in the doc
        pa.field("doc_type", pa.string()),   # "pdf" | "image"
    ]
)

# ---------------------------------------------------------------------------
# Intermediate: one row per extracted chunk after the layout-parse stage.
# Pages are still part-relative here; the reassembly shuffle rebases them
# (merge semantics of parse.py:620-629).
# ---------------------------------------------------------------------------
CHUNK_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("part_idx", pa.int32()),
        pa.field("page_rel", pa.int32()),
        pa.field("block_idx", pa.int32()),   # order of the chunk within its page
        pa.field("kind", pa.string()),       # title|text|table|figure|marginalia|error
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("chunk_id", pa.string()),
        pa.field("bbox", pa.list_(pa.float32(), 4)),  # l,t,r,b normalized
        pa.field("is_error", pa.bool_()),
        pa.field("error", pa.string()),      # "" unless is_error
        pa.field("n_spans", pa.int32()),
        pa.field("doc_type", pa.string()),
    ]
)

# ---------------------------------------------------------------------------
# Output: one row per document (the ParsedDocument analogue, FIXTURES.md §2).
# A chunk can ground on SEVERAL pages (reference Chunk.grounding is a LIST,
# common.py:49-53, pinned by ref tests/unit/test_common.py:95-103): the
# ``groundings`` list carries every (page, bbox) pair; the scalar
# page/bbox columns mirror the FIRST grounding (ordering + compat).
# ---------------------------------------------------------------------------
GROUNDING_STRUCT = pa.struct(
    [
        pa.field("page", pa.int32()),                 # absolute page
        pa.field("bbox", pa.list_(pa.float32(), 4)),  # l,t,r,b normalized
    ]
)

OUTPUT_SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),      # rebased, dense 0..n-1 per doc
        pa.field("chunk_id", pa.string()),
        pa.field("page", pa.int32()),        # first grounding's page
        pa.field("bbox", pa.list_(pa.float32(), 4)),  # first grounding's box
        pa.field("groundings", pa.list_(GROUNDING_STRUCT)),
    ]
)

ERROR_STRUCT = pa.struct(
    [
        pa.field("page_num", pa.int32()),
        pa.field("error", pa.string()),
        pa.field("error_code", pa.int32()),  # -1 for client-side (common.py:56-59)
    ]
)

PARSED_DOC_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("markdown", pa.string()),
        pa.field("spans", pa.list_(OUTPUT_SPAN_STRUCT)),
        pa.field("errors", pa.list_(ERROR_STRUCT)),
        pa.field("start_page_idx", pa.int32()),
        pa.field("end_page_idx", pa.int32()),
        pa.field("doc_type", pa.string()),
    ]
)

# Flat (exploded) view of PARSED_DOC_SCHEMA spans — used by the correctness
# queries because flat columns hash robustly.
FLAT_SPAN_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("offset", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("chunk_id", pa.string()),
        pa.field("page", pa.int32()),
    ]
)

# Checkpoint manifest (SURVEY.md §4.4).
MANIFEST_SCHEMA = pa.schema(
    [
        pa.field("partition_id", pa.int32()),
        pa.field("n_docs", pa.int64()),
        pa.field("n_spans", pa.int64()),
        pa.field("status", pa.string()),
        pa.field("attempt", pa.int32()),
        pa.field("wall_s", pa.float64()),
        pa.field("error", pa.string()),
    ]
)
