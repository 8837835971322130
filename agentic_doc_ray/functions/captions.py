"""Caption harvesting over interleaved text+media documents.

The MMC4/LAION-style image-text pairing step: for every extracted media
span (``media_ref`` non-empty), pick up the nearest preceding and
following TEXT span in the same document — the raw material for
image-caption training pairs mined from interleaved corpora (Zhu et al.
2023, "Multimodal C4").

Shape: ZERO exchanges. Parsed-document rows hold each document's full
ordered span list (the reassemble stage's ordering invariant), so the
neighbor lookup is doc-local: one vectorized prefix/suffix scan over the
batch's flattened span arrays — ``np.maximum.accumulate`` of text-span
indices gives "nearest text before", its reverse gives "nearest text
after", and a parent-id check masks lookups that cross a document
boundary (parents are nondecreasing within a batch, so a stale index
always belongs to an EARLIER doc and is rejected exactly).

Reference analogue: none (the reference stops at extraction); the oracle
is an independent DuckDB window-function implementation (IGNORE NULLS
frames) over the flat-spans replica.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

CAPTION_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("offset", pa.int32()),
        ("media_ref", pa.string()),
        ("chunk_id", pa.string()),
        ("caption_before", pa.string()),
        ("caption_after", pa.string()),
    ]
)


def caption_pairs_batch(batch: pa.Table) -> pa.Table:
    """Parsed-doc rows -> one row per media span with its neighbor
    captions ('' when the document has no text span on that side)."""
    spans = batch.column("spans").combine_chunks()
    parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    flat = spans.flatten()
    n = len(flat)
    media_mask = pc.not_equal(flat.field("media_ref"), "").to_numpy(
        zero_copy_only=False
    )
    if not media_mask.any():
        return pa.Table.from_arrays(
            [pa.array([], f.type) for f in CAPTION_SCHEMA],
            schema=CAPTION_SCHEMA,
        )
    text_mask = pc.equal(flat.field("kind"), "text").to_numpy(
        zero_copy_only=False
    )
    idx = np.arange(n, dtype=np.int64)
    # nearest text index strictly before i (within the flat order)
    marked = np.where(text_mask, idx, np.int64(-1))
    before = np.empty(n, dtype=np.int64)
    before[0] = -1
    np.maximum.accumulate(marked[:-1], out=before[1:])
    # nearest text index strictly after i
    marked_rev = np.where(text_mask, idx, np.int64(n))
    after = np.empty(n, dtype=np.int64)
    after[-1] = n
    np.minimum.accumulate(marked_rev[::-1][:-1], out=after[:-1][::-1])

    m = np.flatnonzero(media_mask)
    texts = flat.field("text")

    def pick(neigh: np.ndarray, invalid: int) -> pa.Array:
        tgt = neigh[m]
        ok = (tgt != invalid) & (
            parents[np.clip(tgt, 0, n - 1)] == parents[m]
        )
        safe = np.where(ok, tgt, 0)
        vals = texts.take(pa.array(safe))
        return pc.if_else(pa.array(ok), vals, "")

    doc_ids = pc.take(batch.column("doc_id").combine_chunks(), pa.array(parents[m]))
    return pa.Table.from_arrays(
        [
            doc_ids,
            flat.field("offset").take(pa.array(m)),
            flat.field("media_ref").take(pa.array(m)),
            flat.field("chunk_id").take(pa.array(m)),
            pick(before, -1),
            pick(after, n),
        ],
        schema=CAPTION_SCHEMA,
    )


def harvest_captions(parsed: "ray.data.Dataset") -> "ray.data.Dataset":
    """Parsed documents -> caption pairs; pure map, streams."""
    return parsed.map_batches(
        caption_pairs_batch, batch_format="pyarrow", zero_copy_batch=True
    )
