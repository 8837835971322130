"""Content-defined chunking (CDC) and chunk-level dedup statistics.

Storage-style dedup for large text corpora: split each document at
positions determined by the CONTENT of a small rolling window (FastCDC /
LBFS lineage), so an insertion or deletion early in a document shifts
only the chunks it touches — downstream chunk hashes realign, which is
exactly what byte-offset (fixed-size) chunking cannot do. Chunk-hash
overlap across documents then measures shared content at sub-document
granularity: the signal behind incremental crawl storage and
partial-overlap dedup (complementing the exact L-gram span marking in
``functions/substr.py``, which finds spans, not storage units).

Design:

  - boundaries: a cut after every ``window``-byte run whose 61-bit
    Mersenne rolling hash (the engine-wide fingerprint convention,
    ``functions/text.py``) is ``== 0 (mod divisor)`` — expected chunk
    size ~``divisor`` bytes; cuts depend ONLY on the local window, so
    chunking is shift-invariant (property-tested);
  - a ``max_len`` cap splits over-long runs at fixed offsets FROM THE
    PREVIOUS CONTENT CUT (not from the doc start), preserving
    realignment after the next content cut;
  - no min-length coalescing (FastCDC's min-size skip makes the cut
    sequence stateful; the stateless variant keeps every stage
    vectorized and the replica bit-equal — documented deviation);
  - chunk identity: the canonical (position-independent) 61-bit
    polynomial hash of the chunk bytes, same convention as
    ``substr._gram_hashes`` so equal content always collides.

Everything is batch-local per document (zero exchanges for
``cdc_chunks``); ``cdc_dedup_stats`` adds two key-only exchanges
(hash-bucket occurrence counts, then per-doc partial sums) — chunk TEXT
never ships, only (bucket, hash, doc_id, length) rows.

ASCII is enforced (positions are byte offsets == char offsets), the
same contract as the substr operators.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from agentic_doc_ray.context import partitions_for
from agentic_doc_ray.functions.substr import _gram_hashes, _powers
from agentic_doc_ray.functions.text import (
    _FP_BASE,
    _FP_MOD,
    _mulmod61,
    _prefix_halves,
    _segment_modsum,
)

CHUNK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("chunk_idx", pa.int64()),
        ("start", pa.int64()),
        ("length", pa.int64()),
        ("chunk_hash", pa.int64()),
    ]
)


def cdc_chunk_batch(
    batch: pa.Table,
    window: int = 16,
    divisor: int = 64,
    max_len: int = 256,
) -> pa.Table:
    """(doc_id, text) -> one row per content-defined chunk.

    Fully vectorized: the rolling window hashes come from the shared
    flat-buffer gram machinery (``substr._gram_hashes``), boundary
    selection and the max-len splitting are numpy index arithmetic, and
    chunk hashes are one ``_segment_modsum`` over the batch buffer.
    Deterministic per document => batching-independent.
    """
    texts = batch.column("text")
    if batch.num_rows == 0 or not (
        pc.sum(pc.utf8_length(texts)).as_py() or 0
    ):
        return CHUNK_SCHEMA.empty_table()
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    h, doc_idx, pos, buf, offsets = _gram_hashes(texts, window)
    n = buf.size
    n_docs = len(doc_ids)
    doc_lens = np.diff(offsets)

    # content cuts: global boundary AFTER the window, never at doc edges
    cut_mask = (h % np.uint64(divisor)) == 0
    cut_doc = doc_idx[cut_mask]
    cut_b = offsets[cut_doc] + pos[cut_mask] + window
    interior = cut_b < offsets[cut_doc + 1]
    cut_doc, cut_b = cut_doc[interior], cut_b[interior]

    # boundary list per doc: start, content cuts (already position-sorted
    # within each doc), end — docs with no text contribute nothing
    nonempty = doc_lens > 0
    n_cuts = np.bincount(cut_doc, minlength=n_docs)
    seg_doc = np.repeat(np.arange(n_docs), nonempty.astype(np.int64) + n_cuts)
    # interleave: for each doc, [start] + cuts; ends come from the NEXT
    # boundary (or the doc end), so build starts then derive ends
    starts = np.empty(len(seg_doc), dtype=np.int64)
    starts_pos = np.concatenate(
        (np.zeros(1, np.int64), np.cumsum(nonempty.astype(np.int64) + n_cuts))
    )
    starts[starts_pos[:-1][nonempty]] = offsets[:-1][nonempty]
    if len(cut_b):
        # cut rows go after each doc's start slot, in original order
        cut_slot = starts_pos[cut_doc] + 1 + (
            np.arange(len(cut_b))
            - np.concatenate((np.zeros(1, np.int64), np.cumsum(n_cuts)))[cut_doc]
        )
        starts[cut_slot] = cut_b
    ends = np.empty_like(starts)
    ends[:-1] = starts[1:]
    last_rows = starts_pos[1:][nonempty] - 1
    ends[last_rows] = offsets[1:][nonempty]
    seg_lens = ends - starts

    # max_len cap: split a long [a, b) at a+max_len, a+2*max_len, ...
    n_parts = -(-seg_lens // max_len)  # ceil; seg_lens >= 1 here
    part_doc = np.repeat(seg_doc, n_parts)
    base = np.repeat(starts, n_parts)
    within = np.arange(int(n_parts.sum()), dtype=np.int64) - np.repeat(
        np.concatenate((np.zeros(1, np.int64), np.cumsum(n_parts)))[:-1], n_parts
    )
    c_start = base + within * max_len
    c_end = np.minimum(c_start + max_len, np.repeat(ends, n_parts))
    c_len = c_end - c_start

    # canonical chunk hashes over the flat buffer (same convention as the
    # gram hashes: content-only, position-independent)
    if n:
        bpow = _powers(_FP_BASE, n + 1)
        binv = pow(_FP_BASE, _FP_MOD - 2, _FP_MOD)
        ipow = _powers(binv, n + 1)
        u = _mulmod61(buf.astype(np.uint64), bpow[n - 1 :: -1].copy())
        cs_hi, cs_lo = _prefix_halves(u)
        raw = _segment_modsum(cs_hi, cs_lo, c_start, c_end)
        chash = _mulmod61(raw, ipow[n - c_end]).astype(np.int64)
    else:
        chash = np.zeros(0, np.int64)

    # chunk_idx: position of the chunk within its document
    doc_first = np.concatenate((np.zeros(1, np.int64), np.cumsum(n_parts)))
    first_part_of_doc = np.zeros(n_docs, np.int64)
    first_part_of_doc[nonempty] = doc_first[starts_pos[:-1][nonempty]]
    chunk_idx = np.arange(len(part_doc), dtype=np.int64) - first_part_of_doc[part_doc]

    return pa.Table.from_arrays(
        [
            pa.array(doc_ids[part_doc], pa.int64()),
            pa.array(chunk_idx, pa.int64()),
            pa.array(c_start - offsets[part_doc], pa.int64()),
            pa.array(c_len, pa.int64()),
            pa.array(chash, pa.int64()),
        ],
        schema=CHUNK_SCHEMA,
    )


def cdc_chunks(
    docs: "ray.data.Dataset",
    window: int = 16,
    divisor: int = 64,
    max_len: int = 256,
) -> "ray.data.Dataset":
    """Distributed content-defined chunking: one output row per chunk,
    batch-local (zero exchanges)."""
    import functools

    return docs.map_batches(
        functools.partial(
            cdc_chunk_batch, window=window, divisor=divisor, max_len=max_len
        ),
        batch_format="pyarrow",
    )


def cdc_dedup_stats(
    docs: "ray.data.Dataset",
    window: int = 16,
    divisor: int = 64,
    max_len: int = 256,
    n_buckets: int = 64,
    n_rows_hint: int | None = None,
) -> "ray.data.Dataset":
    """Per-document chunk-dedup statistics: how much of each document's
    content is shared (at CDC-chunk granularity) with the rest of the
    corpus.

    Output: (doc_id, n_chunks, n_dup_chunks, dup_bytes, n_bytes), where a
    chunk is "dup" iff its hash occurs >= 2 times corpus-wide (any doc,
    including its own). Docs with empty text emit no row.

    Scale shape: chunk TEXT never ships. Exchange 1 hash-buckets
    (bucket, chunk_hash, doc_id, length) key rows and resolves per-hash
    occurrence counts + per-(doc, bucket) PARTIAL sums in-bucket;
    exchange 2 is a tiny groupby(doc_id) over the partials. Both
    map_groups inputs union sentinel rows (functions/_exchange.py).
    """
    import functools

    from ray.data.aggregate import Sum

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    chunks = docs.map_batches(
        functools.partial(
            cdc_chunk_batch, window=window, divisor=divisor, max_len=max_len
        ),
        batch_format="pyarrow",
    )

    ex_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("chunk_hash", pa.int64()),
            ("doc_id", pa.int64()),
            ("length", pa.int64()),
        ]
    )

    def tag(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                pc.cast(
                    pc.bit_wise_and(
                        batch.column("chunk_hash"),
                        pa.scalar(n_buckets - 1, pa.int64()),
                    ),
                    pa.int32(),
                ),
                batch.column("chunk_hash"),
                batch.column("doc_id"),
                batch.column("length"),
            ],
            schema=ex_schema,
        )

    part_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_chunks", pa.int64()),
            ("n_dup_chunks", pa.int64()),
            ("dup_bytes", pa.int64()),
            ("n_bytes", pa.int64()),
        ]
    )

    def stats_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("doc_id"), pa.scalar(-1)))
        if g.num_rows == 0:
            return part_schema.empty_table()
        counts = (
            g.select(["chunk_hash"])
            .group_by("chunk_hash")
            .aggregate([("chunk_hash", "count")])
            .rename_columns(["chunk_hash", "cnt"])
        )
        m = g.join(counts, keys="chunk_hash", join_type="inner")
        is_dup = pc.greater_equal(m.column("cnt"), pa.scalar(2, pa.int64()))
        dup_len = pc.if_else(is_dup, m.column("length"), pa.scalar(0, pa.int64()))
        t = pa.Table.from_arrays(
            [
                m.column("doc_id"),
                pa.array(np.ones(m.num_rows, np.int64)),
                is_dup.cast(pa.int64()),
                dup_len,
                m.column("length"),
            ],
            schema=part_schema,
        )
        out = (
            t.group_by("doc_id")
            .aggregate(
                [
                    ("n_chunks", "sum"),
                    ("n_dup_chunks", "sum"),
                    ("dup_bytes", "sum"),
                    ("n_bytes", "sum"),
                ]
            )
            .rename_columns(
                ["doc_id", "n_chunks", "n_dup_chunks", "dup_bytes", "n_bytes"]
            )
        )
        return out.cast(part_schema)

    n_hint = n_rows_hint if n_rows_hint is not None else docs.count()
    partials = (
        chunks.map_batches(tag, batch_format="pyarrow")
        .union(
            int_key_sentinels(
                ex_schema, "bucket", fill={"doc_id": -1, "chunk_hash": 0, "length": 0}
            )
        )
        .groupby("bucket", num_partitions=partitions_for(n_hint))
        .map_groups(stats_bucket, batch_format="pyarrow")
    )
    return (
        partials.groupby("doc_id", num_partitions=partitions_for(n_hint))
        .aggregate(
            Sum("n_chunks", alias_name="n_chunks"),
            Sum("n_dup_chunks", alias_name="n_dup_chunks"),
            Sum("dup_bytes", alias_name="dup_bytes"),
            Sum("n_bytes", alias_name="n_bytes"),
        )
    )


def cdc_transfer_stats(
    old_docs: "ray.data.Dataset",
    new_docs: "ray.data.Dataset",
    window: int = 16,
    divisor: int = 64,
    max_len: int = 256,
    n_buckets: int = 64,
    n_rows_hint: int | None = None,
) -> "ray.data.Dataset":
    """Cross-snapshot storage transfer: for each NEW-crawl document, how
    many of its CDC chunks (and bytes) already exist in the OLD crawl's
    chunk store — the incremental-ingest signal CDC exists for (only
    ``new_bytes`` need storing/shipping; shift-invariance makes edited
    documents mostly reuse).

    Output: (doc_id, n_chunks, n_bytes, reused_chunks, reused_bytes),
    one row per new-crawl doc with text.

    Scale shape: one hash-bucket exchange + one per-doc sum. The OLD
    side ships each distinct chunk hash once per batch (key-only rows,
    in-batch deduped, no length/doc payload); the NEW side ships
    (hash, doc_id, length) key rows. Chunk text never moves. The
    in-bucket membership test is one vectorized ``is_in``.
    """
    import functools

    from ray.data.aggregate import Sum

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    chunker = functools.partial(
        cdc_chunk_batch, window=window, divisor=divisor, max_len=max_len
    )

    ex_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("chunk_hash", pa.int64()),
            ("doc_id", pa.int64()),  # -1 = old-side (key-only) row
            ("length", pa.int64()),
        ]
    )

    def _bucket(h) -> "pa.Array":
        return pc.cast(
            pc.bit_wise_and(h, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )

    def tag_old(batch: pa.Table) -> pa.Table:
        c = chunker(batch)
        h = pc.unique(c.column("chunk_hash").combine_chunks())
        return pa.Table.from_arrays(
            [
                _bucket(h),
                h,
                pa.nulls(len(h), pa.int64()).fill_null(-1),
                pa.nulls(len(h), pa.int64()).fill_null(0),
            ],
            schema=ex_schema,
        )

    def tag_new(batch: pa.Table) -> pa.Table:
        c = chunker(batch)
        h = c.column("chunk_hash")
        return pa.Table.from_arrays(
            [_bucket(h), h, c.column("doc_id"), c.column("length")],
            schema=ex_schema,
        )

    part_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_chunks", pa.int64()),
            ("n_bytes", pa.int64()),
            ("reused_chunks", pa.int64()),
            ("reused_bytes", pa.int64()),
        ]
    )

    def transfer_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("doc_id"), pa.scalar(-2)))
        is_old = pc.equal(g.column("doc_id"), pa.scalar(-1))
        old_h = g.filter(is_old).column("chunk_hash").combine_chunks()
        new = g.filter(pc.invert(is_old))
        if new.num_rows == 0:
            return part_schema.empty_table()
        reused = pc.is_in(new.column("chunk_hash"), value_set=old_h)
        t = pa.Table.from_arrays(
            [
                new.column("doc_id"),
                pa.array(np.ones(new.num_rows, np.int64)),
                new.column("length"),
                reused.cast(pa.int64()),
                pc.if_else(reused, new.column("length"), pa.scalar(0, pa.int64())),
            ],
            schema=part_schema,
        )
        out = (
            t.group_by("doc_id")
            .aggregate(
                [
                    ("n_chunks", "sum"),
                    ("n_bytes", "sum"),
                    ("reused_chunks", "sum"),
                    ("reused_bytes", "sum"),
                ]
            )
            .rename_columns(
                ["doc_id", "n_chunks", "n_bytes", "reused_chunks", "reused_bytes"]
            )
        )
        return out.cast(part_schema)

    n_hint = n_rows_hint if n_rows_hint is not None else new_docs.count()
    partials = (
        old_docs.map_batches(tag_old, batch_format="pyarrow")
        .union(new_docs.map_batches(tag_new, batch_format="pyarrow"))
        .union(
            int_key_sentinels(
                ex_schema,
                "bucket",
                fill={"doc_id": -2, "chunk_hash": 0, "length": 0},
            )
        )
        .groupby("bucket", num_partitions=partitions_for(n_hint))
        .map_groups(transfer_bucket, batch_format="pyarrow")
    )
    return partials.groupby("doc_id", num_partitions=partitions_for(n_hint)).aggregate(
        Sum("n_chunks", alias_name="n_chunks"),
        Sum("n_bytes", alias_name="n_bytes"),
        Sum("reused_chunks", alias_name="reused_chunks"),
        Sum("reused_bytes", alias_name="reused_bytes"),
    )
