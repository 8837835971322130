"""Interleave-structure analytics over text+media documents.

Per-document shape metrics of the INTERLEAVING itself — the signals a
multimodal-mixture builder filters on (MMC4/OBELICS-style interleaved
pretraining wants documents with enough text between images; pure image
galleries and walls of text both get downweighted):

- ``n_spans``   — spans in the document,
- ``n_media``   — spans carrying a ``media_ref``,
- ``media_per_mille`` — 1000·n_media // n_spans (integer, SQL-exact),
- ``max_text_run``    — the longest consecutive run of NON-media spans
  in offset order (the "text gap" a media-anchored sample can draw on).

Shape: zero exchanges — a corpus row carries its whole document, so all
four metrics are batch-local. The run computation is fully vectorized:
per-doc offset order via one ``np.lexsort``, media positions become run
BREAKS via a prefix max, and per-doc maxima come from ``np.maximum.at``.

Reference analogue: none (the reference parses; it does not profile
interleaving). Oracle: DuckDB ``unnest(..., recursive := true)`` +
gaps-and-islands window SQL over the same corpus parquet — an
independent implementation of the run rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

STATS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("n_spans", pa.int64()),
        ("n_media", pa.int64()),
        ("media_per_mille", pa.int64()),
        ("max_text_run", pa.int64()),
    ]
)


def interleave_stats_batch(batch: pa.Table) -> pa.Table:
    spans = batch.column("spans").combine_chunks()
    n_docs = batch.num_rows
    lens = pc.list_value_length(spans).to_numpy(zero_copy_only=False).astype(np.int64)
    parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    flat = spans.flatten()
    n = len(flat)

    n_media = np.zeros(n_docs, np.int64)
    max_run = np.zeros(n_docs, np.int64)
    if n:
        is_media = pc.not_equal(flat.field("media_ref"), "").to_numpy(
            zero_copy_only=False
        )
        offs = flat.field("offset").to_numpy(zero_copy_only=False)
        # offset order within each doc (list order is NOT guaranteed)
        order = np.lexsort((offs, parents))
        p = parents[order]
        med = is_media[order]
        np.add.at(n_media, parents[np.flatnonzero(is_media)], 1)

        idx = np.arange(n, dtype=np.int64)
        # a run of non-media spans breaks at media positions and at the
        # start of each document
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]  # first sorted
        # position of each doc in the sorted order == same cumsum layout
        last_media = np.maximum.accumulate(np.where(med, idx, np.int64(-1)))
        boundary = np.maximum(last_media, starts[p] - 1)
        run_len = np.where(med, 0, idx - boundary)
        np.maximum.at(max_run, p, run_len)

    n_spans = lens
    per_mille = np.zeros(n_docs, np.int64)
    pos = n_spans > 0
    per_mille[pos] = (1000 * n_media[pos]) // n_spans[pos]
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(n_spans),
            pa.array(n_media),
            pa.array(per_mille),
            pa.array(max_run),
        ],
        schema=STATS_SCHEMA,
    )


def interleave_stats(corpus: "ray.data.Dataset") -> "ray.data.Dataset":
    """Corpus (doc_id, spans) -> per-doc interleave metrics; pure map."""
    return corpus.map_batches(
        interleave_stats_batch, batch_format="pyarrow", zero_copy_batch=True
    )
