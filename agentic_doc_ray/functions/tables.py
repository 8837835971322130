"""Structured table extraction: table spans -> (row, col, cell) rows.

The extraction pipeline classifies pipe-grid blocks as ``table`` chunks
(reference ChunkType taxonomy; cross-page continuations are merged into
one chunk upstream, stages/reassemble.py). This operator completes the
document-AI story: it parses each table chunk's text into addressable
cells — the structured output a user joins, filters, or loads into a
frame — as a batch-local vectorized stage over the flat-span stream
(zero exchanges; two Arrow split kernels and numpy index arithmetic, no
per-row Python).

Cell grammar (the corpus/parser contract): lines are newline-delimited,
cells are " | "-delimited, a line may open with "| " and close with
" |" (page-boundary truncation can drop the closing bar — handled).
Ragged rows are preserved as-is: row lengths vary and col_idx is
per-row, so nothing is silently padded or dropped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

CELL_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("offset", pa.int32()),
        ("row_idx", pa.int64()),
        ("col_idx", pa.int64()),
        ("cell", pa.string()),
    ]
)


def table_cells_batch(batch: pa.Table) -> pa.Table:
    """Flat spans -> one row per table cell (non-table spans dropped)."""
    t = batch.filter(pc.equal(batch.column("kind"), "table"))
    if t.num_rows == 0:
        return CELL_SCHEMA.empty_table()
    lines = pc.split_pattern(t.column("text"), "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    n_lines = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
    span_of_line = np.repeat(np.arange(t.num_rows), n_lines)
    row_idx = np.arange(len(span_of_line), dtype=np.int64) - np.repeat(
        np.concatenate((np.zeros(1, np.int64), np.cumsum(n_lines)))[:-1], n_lines
    )
    flat_lines = lines.flatten()
    stripped = pc.replace_substring_regex(flat_lines, r"^\| | \|$", "")
    cells = pc.split_pattern(stripped, " | ")
    if isinstance(cells, pa.ChunkedArray):
        cells = cells.combine_chunks()
    n_cells = pc.list_value_length(cells).to_numpy(zero_copy_only=False)
    line_of_cell = np.repeat(np.arange(len(span_of_line)), n_cells)
    col_idx = np.arange(len(line_of_cell), dtype=np.int64) - np.repeat(
        np.concatenate((np.zeros(1, np.int64), np.cumsum(n_cells)))[:-1], n_cells
    )
    return pa.Table.from_arrays(
        [
            pc.take(
                t.column("doc_id"), pa.array(span_of_line[line_of_cell], pa.int64())
            ),
            pc.take(
                t.column("offset"), pa.array(span_of_line[line_of_cell], pa.int64())
            ),
            pa.array(row_idx[line_of_cell], pa.int64()),
            pa.array(col_idx, pa.int64()),
            cells.flatten(),
        ],
        schema=CELL_SCHEMA,
    )


def table_cells(flat_spans: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distributed structured table extraction over the flat-span stream
    (the flagship pipeline's output): batch-local, zero exchanges."""
    return flat_spans.map_batches(table_cells_batch, batch_format="pyarrow")


OUTLINE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("title_idx", pa.int64()),
        ("title_text", pa.string()),
        ("n_spans", pa.int64()),
    ]
)


def doc_outline_batch(batch: pa.Table) -> pa.Table:
    """Flat spans -> document outline: one row per section, where a
    section is a ``title`` chunk plus every following span up to the
    next title (the TOC/structure view a document-AI consumer renders).

    ``title_idx`` counts titles per doc in offset order (0-based); spans
    before the first title form a preamble section (title_idx = -1,
    null title_text) emitted only when non-empty. ``n_spans`` counts the
    section's NON-title spans. Requires whole-document span runs per
    batch — i.e. operate on flat spans exploded from parsed-doc rows
    inside the same batch (``doc_outline``), not on arbitrarily
    re-blocked span streams.
    """
    if batch.num_rows == 0:
        return OUTLINE_SCHEMA.empty_table()
    order = pc.sort_indices(
        batch, sort_keys=[("doc_id", "ascending"), ("offset", "ascending")]
    )
    b = batch.take(order)
    doc = b.column("doc_id").to_numpy(zero_copy_only=False)
    kind = b.column("kind").to_numpy(zero_copy_only=False)
    new_doc = np.concatenate(([True], doc[1:] != doc[:-1]))
    is_title = kind == "title"
    # per-doc running title count (reset at doc starts): global cumsum
    # minus the cumsum value at each doc's first row
    cs = np.cumsum(is_title.astype(np.int64))
    base = np.repeat(cs[new_doc] - is_title[new_doc].astype(np.int64),
                     np.diff(np.concatenate((np.flatnonzero(new_doc), [len(doc)]))))
    # a title row belongs to ITS OWN section (the inclusive cumsum counts
    # it); a non-title row belongs to the last title seen, -1 before any
    title_idx = cs - base - 1
    t = pa.Table.from_arrays(
        [
            b.column("doc_id"),
            pa.array(title_idx, pa.int64()),
            pc.if_else(
                pa.array(is_title), b.column("text"), pa.nulls(len(doc), pa.string())
            ),
            pa.array((~is_title).astype(np.int64)),
        ],
        names=["doc_id", "title_idx", "title_text", "n_spans"],
    )
    g = (
        t.group_by(["doc_id", "title_idx"])
        .aggregate([("title_text", "max"), ("n_spans", "sum")])
        .rename_columns(["doc_id", "title_idx", "title_text", "n_spans"])
    )
    # preamble sections are emitted only when non-empty
    keep = pc.or_(
        pc.greater_equal(g.column("title_idx"), pa.scalar(0, pa.int64())),
        pc.greater(g.column("n_spans"), pa.scalar(0, pa.int64())),
    )
    return g.filter(keep).cast(OUTLINE_SCHEMA)


def doc_outline(parsed: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distributed outline extraction over PARSED docs (doc_id, spans):
    parsed rows are atomic under batch slicing, so exploding to flat
    spans inside the same map_batches keeps every document's span run
    whole — zero exchanges."""
    from agentic_doc_ray.stages.explode import flatten_parsed

    def per_batch(batch: pa.Table) -> pa.Table:
        return doc_outline_batch(flatten_parsed(batch))

    return parsed.map_batches(per_batch, batch_format="pyarrow")
