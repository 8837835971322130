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
