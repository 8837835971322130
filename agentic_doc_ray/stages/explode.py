"""Explode stage: corpus rows -> page rows; parsed rows -> flat span rows.

The Ray-native analogue of the reference's PDF splitter
(``/root/reference/agentic_doc/utils.py:214-264``): instead of writing
part-files to a temp dir, one document row fans out into N page rows with
``part_idx = offset // split_size`` and ``page_rel = offset - part_idx *
split_size`` (axis A: a mega-document becomes many blocks, so no single task
holds a whole pathological doc).

Fully vectorized pyarrow/numpy — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from agentic_doc_ray.config import DEFAULT_CONFIG, EngineConfig
from agentic_doc_ray.schema import FLAT_SPAN_SCHEMA, PAGE_SCHEMA

# Sentinel "kind" marking a document that arrived with zero spans.
EMPTY_KIND = "__empty__"
# Sentinel "kind" for a page whose payload yields zero chunks (blank page):
# it must still mark its part in the markdown join and keep the doc alive,
# but never appears as an output span.
BLANK_KIND = "__blank__"


def explode_spans(
    batch: pa.Table, config: EngineConfig = DEFAULT_CONFIG
) -> pa.Table:
    """(doc_id, spans) rows -> PAGE_SCHEMA rows, one per span."""
    spans = batch.column("spans").combine_chunks()
    if isinstance(spans, pa.ChunkedArray):  # zero-length tables keep chunking
        spans = spans.chunk(0) if spans.num_chunks else pa.array([], type=spans.type)
    parents = pc.list_parent_indices(spans)
    lengths = pc.list_value_length(spans).cast(pa.int32())
    flat = spans.flatten()  # StructArray of (kind, text, media_ref, offset)

    kind = flat.field("kind")
    offset = flat.field("offset").cast(pa.int32())

    # per-doc doc_type: "image" iff every span of the doc is an image span
    # (generalizes _parse_image's doc_type="image", parse.py:538-545).
    # Segment starts via cumsum of lengths — robust to sliced list arrays,
    # unlike ListArray.offsets which may carry a nonzero base.
    lens_np = lengths.to_numpy(zero_copy_only=False)
    is_img = pc.equal(kind, "image").cast(pa.int32()).to_numpy(zero_copy_only=False)
    n_docs = len(spans)
    if len(is_img) and n_docs:
        # Exact segment sums via prefix-sum differences: correct even when
        # zero-span docs sit anywhere in the batch (reduceat with clipped
        # starts truncated the last non-empty doc's segment in that case).
        starts = np.concatenate(([0], np.cumsum(lens_np[:-1])))
        cs = np.concatenate(([0], np.cumsum(is_img)))
        seg_img = cs[starts + lens_np] - cs[starts]
        all_img = (seg_img == lens_np) & (lens_np > 0)
    else:
        all_img = np.zeros(n_docs, dtype=bool)
    doc_type_per_doc = pa.array(np.where(all_img, "image", "pdf"))

    split = pa.scalar(config.split_size, pa.int32())
    part_idx = pc.divide(offset, split)  # integer division on int32
    page_rel = pc.subtract(offset, pc.multiply(part_idx, split))

    doc_ids = batch.column("doc_id").combine_chunks()
    out = pa.Table.from_arrays(
        [
            pc.take(doc_ids, parents),
            part_idx,
            page_rel,
            kind,
            flat.field("text"),
            flat.field("media_ref"),
            offset,
            pc.take(lengths, parents),
            pc.take(doc_type_per_doc, parents),
        ],
        schema=PAGE_SCHEMA,
    )

    # A document with zero spans must still surface in the output as an empty
    # ParsedDocument (reference: _merge_part_results([]) -> empty result,
    # parse.py:599-611). Emit one sentinel page row per empty doc; the parser
    # and reassembler turn it into an empty doc row.
    empty_mask = lens_np == 0
    if empty_mask.any():
        idx = np.flatnonzero(empty_mask)
        n = len(idx)
        sentinel = pa.Table.from_arrays(
            [
                pc.take(doc_ids, pa.array(idx, pa.int64())),
                pa.array([0] * n, pa.int32()),
                pa.array([0] * n, pa.int32()),
                pa.array([EMPTY_KIND] * n),
                pa.array([""] * n),
                pa.array([""] * n),
                pa.array([0] * n, pa.int32()),
                pa.array([0] * n, pa.int32()),
                pa.array(["pdf"] * n),
            ],
            schema=PAGE_SCHEMA,
        )
        out = pa.concat_tables([out, sentinel])
    return out


def flatten_parsed(batch: pa.Table) -> pa.Table:
    """Parsed-doc rows -> FLAT_SPAN_SCHEMA rows (for hashing / analytics)."""
    spans = batch.column("spans").combine_chunks()
    parents = pc.list_parent_indices(spans)
    flat = spans.flatten()
    return pa.Table.from_arrays(
        [
            pc.take(batch.column("doc_id").combine_chunks(), parents),
            flat.field("offset"),
            flat.field("kind"),
            flat.field("text"),
            flat.field("media_ref"),
            flat.field("chunk_id"),
            flat.field("page"),
        ],
        schema=FLAT_SPAN_SCHEMA,
    )
