"""Reassembly stage — THE shuffle of the engine.

``groupby(doc_id).map_groups(merge)``: the Ray-native form of the
reference's ``_merge_part_results`` / ``_merge_next_part``
(``/root/reference/agentic_doc/parse.py:597-629``):

  - chunks sorted by (part_idx, page_rel, block_idx) — restores intra-doc
    order from the ``offset`` keys, never from block order (SURVEY.md §2.6);
  - pages rebased: page_abs = page_rel + part_idx * split_size, the exact
    ``grounding.page += next.start_page_idx`` math (parse.py:620-624);
  - markdown = part markdowns joined "\n\n" (parse.py:621), a failed part
    contributing its empty string;
  - errors concatenated in part order (parse.py:628);
  - final span offsets re-assigned dense 0..n-1 per doc.

Skew note: one pathological mega-doc is one group. The per-group work is
O(n_chunks) python over at most (pages_per_doc x blocks_per_page) rows;
at 100 TB the group payload is bounded by size-aware splitting upstream,
and a salted two-phase merge (partial merge per (doc_id, part_bucket),
final merge per doc_id) is the documented escape hatch if a single group
exceeds a worker's heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from agentic_doc_ray.config import DEFAULT_CONFIG, EngineConfig
from agentic_doc_ray.schema import ERROR_STRUCT, OUTPUT_SPAN_STRUCT, PARSED_DOC_SCHEMA
from agentic_doc_ray.textparse import merge_markdown, part_markdown


_EMPTY_PARSED = PARSED_DOC_SCHEMA.empty_table()


def merge_bucket_group(
    group: pa.Table, config: EngineConfig = DEFAULT_CONFIG
) -> pa.Table:
    """Merge EVERY doc inside one hash bucket -> one output row per doc.

    Fully vectorized assembly: one C-speed multi-key sort, numpy boundary
    detection, and direct ListArray/StructArray construction reusing the
    sorted chunk columns as the span child arrays (zero row-dict building —
    measured 5-10x over from_pylist). Python touches only the markdown
    string joins. Grouping by bucket instead of doc_id collapses shuffle
    key cardinality and amortizes per-group overhead.
    """
    from agentic_doc_ray.stages.explode import BLANK_KIND, EMPTY_KIND

    if group.num_rows == 0:
        return _EMPTY_PARSED
    order = pa.compute.sort_indices(
        group,
        sort_keys=[
            ("doc_id", "ascending"),
            ("part_idx", "ascending"),
            ("page_rel", "ascending"),
            ("block_idx", "ascending"),
        ],
    )
    g = group.take(order).combine_chunks()
    n = g.num_rows
    split = config.split_size

    doc_id_arr = g.column("doc_id").combine_chunks()
    # doc boundaries: row i starts a new doc iff doc_id[i] != doc_id[i-1]
    neq = pa.compute.not_equal(doc_id_arr.slice(1), doc_id_arr.slice(0, n - 1))
    changes = np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1
    starts = np.concatenate(([0], changes))
    counts = np.diff(np.concatenate((starts, [n])))
    n_docs = len(starts)

    kind_np = np.asarray(g.column("kind").to_pylist(), dtype=object)
    # page rows (everything but the zero-span doc sentinel) drive part/
    # markdown structure; span rows (also excluding blank pages) become
    # output spans
    is_page = kind_np != EMPTY_KIND
    is_real = is_page & (kind_np != BLANK_KIND)
    is_err = g.column("is_error").combine_chunks().to_numpy(zero_copy_only=False)
    part_np = g.column("part_idx").combine_chunks().to_numpy(zero_copy_only=False)
    page_abs = (
        g.column("page_rel").combine_chunks().to_numpy(zero_copy_only=False)
        + part_np * split
    ).astype(np.int32)

    def seg_sum(mask: np.ndarray) -> np.ndarray:
        return np.add.reduceat(mask.astype(np.int64), starts)

    err_counts = seg_sum(is_err)

    # --- spans list<struct> built from the sorted chunk columns -----------
    # Table-continuation merge (multi-page chunk groundings, reference
    # Chunk.grounding is a LIST — common.py:49-53): a table chunk that is
    # the FIRST chunk of its page continues the previous page's LAST chunk
    # when that is also a table on the immediately preceding page of the
    # SAME part. Members collapse into one span: text "\n"-joined,
    # kind/chunk_id/media_ref from the first member, one grounding per
    # member; chains compose page-by-page. The pure-Python oracle
    # implements the identical rule independently (oracle.py).
    real_idx = np.flatnonzero(is_real)
    sv = g.take(pa.array(real_idx, pa.int64()))
    m = len(real_idx)
    doc_of_row = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    r_doc = doc_of_row[real_idx]
    r_part = part_np[real_idx]
    r_page = page_abs[real_idx]
    r_kind = kind_np[real_idx]
    r_block = sv.column("block_idx").combine_chunks().to_numpy(
        zero_copy_only=False
    )
    cont = np.zeros(m, dtype=bool)
    if m > 1:
        cont[1:] = (
            (r_kind[1:] == "table")
            & (r_kind[:-1] == "table")
            & (r_doc[1:] == r_doc[:-1])
            & (r_part[1:] == r_part[:-1])
            & (r_page[1:] == r_page[:-1] + 1)
            & (r_block[1:] == 0)
        )  # prev is last chunk of its page by sort adjacency
    heads = ~cont
    head_pos = np.flatnonzero(heads)
    n_heads = len(head_pos)

    # per-doc span counts over MERGED spans
    head_all = np.zeros(n, dtype=bool)
    head_all[real_idx[head_pos]] = True
    merged_counts = seg_sum(head_all)
    real_starts = np.concatenate(([0], np.cumsum(merged_counts)))
    offset_in_doc = (
        np.arange(n_heads, dtype=np.int64)
        - np.repeat(real_starts[:-1], merged_counts)
    ).astype(np.int32)

    head_take = pa.array(head_pos, pa.int64())
    if cont.any():
        texts_real = sv.column("text").to_pylist()
        bounds = np.append(head_pos, m)
        text_col = pa.array(
            [
                "\n".join(texts_real[s:e]) if e - s > 1 else texts_real[s]
                for s, e in zip(bounds[:-1], bounds[1:])
            ],
            pa.string(),
        )
    else:
        text_col = sv.column("text").combine_chunks()

    # one grounding per MEMBER row, grouped per merged span
    from agentic_doc_ray.schema import GROUNDING_STRUCT

    g_struct = pa.StructArray.from_arrays(
        [pa.array(r_page, pa.int32()), sv.column("bbox").combine_chunks()],
        fields=list(GROUNDING_STRUCT),
    )
    groundings_arr = pa.ListArray.from_arrays(
        pa.array(np.append(head_pos, m), pa.int32()), g_struct
    )

    span_struct = pa.StructArray.from_arrays(
        [
            pa.compute.take(sv.column("kind").combine_chunks(), head_take),
            text_col,
            pa.compute.take(sv.column("media_ref").combine_chunks(), head_take),
            pa.array(offset_in_doc, pa.int32()),
            pa.compute.take(sv.column("chunk_id").combine_chunks(), head_take),
            pa.array(r_page[head_pos], pa.int32()),
            pa.compute.take(sv.column("bbox").combine_chunks(), head_take),
            groundings_arr,
        ],
        fields=list(OUTPUT_SPAN_STRUCT),
    )
    spans_arr = pa.ListArray.from_arrays(
        pa.array(real_starts, pa.int32()), span_struct
    )

    # --- errors list<struct> ----------------------------------------------
    err_idx = np.flatnonzero(is_err)
    ev = g.take(pa.array(err_idx, pa.int64()))
    err_struct = pa.StructArray.from_arrays(
        [
            pa.array(page_abs[err_idx], pa.int32()),
            ev.column("error").combine_chunks(),
            pa.array(np.full(len(err_idx), -1, np.int32)),
        ],
        fields=list(ERROR_STRUCT),
    )
    errors_arr = pa.ListArray.from_arrays(
        pa.array(np.concatenate(([0], np.cumsum(err_counts))), pa.int32()),
        err_struct,
    )

    # --- markdown: the one inherently sequential piece --------------------
    # markdown joins the MERGED span texts (a continued table contributes
    # once, "\n"-joined) so "markdown == '\n\n'-join of span texts per
    # part" stays invariant under multi-page grounding merges
    merged_texts = text_col.to_pylist()
    head_order_of_row = np.full(n, -1, dtype=np.int64)
    head_order_of_row[real_idx[head_pos]] = np.arange(n_heads)
    markdowns = []
    page_counts = seg_sum(is_page)
    for di in range(n_docs):
        lo, hi = starts[di], starts[di] + counts[di]
        if page_counts[di] == 0:  # zero-span doc sentinel only
            markdowns.append("")
            continue
        part_mds, cur_part, cur_texts = [], None, []
        for i in range(lo, hi):
            if not is_page[i]:
                continue
            if part_np[i] != cur_part:
                if cur_part is not None:
                    part_mds.append(part_markdown(cur_texts))
                cur_part, cur_texts = part_np[i], []
            if not is_err[i] and is_real[i] and head_order_of_row[i] >= 0:
                cur_texts.append(merged_texts[head_order_of_row[i]])
        part_mds.append(part_markdown(cur_texts))
        markdowns.append(merge_markdown(part_mds))

    # --- doc-level columns from each doc's first row ----------------------
    first = pa.array(starts, pa.int64())
    doc_type_out = pa.compute.take(g.column("doc_type").combine_chunks(), first)
    n_spans_first = g.column("n_spans").combine_chunks().to_numpy(
        zero_copy_only=False
    )[starts]
    is_image = np.asarray(doc_type_out.to_pylist(), dtype=object) == "image"
    end_page = np.where(
        is_image, 0, np.maximum(0, n_spans_first - 1)
    ).astype(np.int32)

    return pa.Table.from_arrays(
        [
            pa.compute.take(doc_id_arr, first),
            pa.array(markdowns, pa.string()),
            spans_arr,
            errors_arr,
            pa.array(np.zeros(n_docs, np.int32)),
            pa.array(end_page, pa.int32()),
            doc_type_out,
        ],
        schema=PARSED_DOC_SCHEMA,
    )


def merge_doc_group(group: pa.Table, config: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Merge one doc's chunk rows (CHUNK_SCHEMA) -> one PARSED_DOC_SCHEMA row."""
    return merge_bucket_group(group, config)


def _add_bucket(batch: pa.Table, n_buckets: int) -> pa.Table:
    """bucket = crc32(doc_id) % n_buckets — deterministic across processes
    (python hash() is salted per process and must never be a shuffle key)."""
    import zlib

    ids = batch.column("doc_id").to_pylist()
    bucket = pa.array(
        [zlib.crc32(s.encode()) % n_buckets for s in ids], pa.int32()
    )
    return batch.append_column("bucket", bucket)


def _combine_partial_docs(group: pa.Table) -> pa.Table:
    """Phase 2 of the two-phase merge: concatenate partial ParsedDocument
    rows (one per (doc_id, part_range)) into full docs.

    Associative by construction: partial markdowns are "\\n\\n"-joined part
    markdowns, so joining partials with "\\n\\n" reproduces the single-phase
    join exactly; spans/errors concatenate in part_range order with page
    numbers already absolute; offsets are re-assigned dense per doc."""
    if group.num_rows == 0:
        return _EMPTY_PARSED
    order = pa.compute.sort_indices(
        group, sort_keys=[("doc_id", "ascending"), ("part_range", "ascending")]
    )
    g = group.take(order).combine_chunks()
    n = g.num_rows
    doc_id_arr = g.column("doc_id").combine_chunks()
    neq = pa.compute.not_equal(doc_id_arr.slice(1), doc_id_arr.slice(0, n - 1))
    changes = np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1
    starts = np.concatenate(([0], changes))
    counts = np.diff(np.concatenate((starts, [n])))
    n_docs = len(starts)

    spans_col = g.column("spans").combine_chunks()
    span_lens = pa.compute.list_value_length(spans_col).to_numpy(
        zero_copy_only=False
    )
    flat_spans = spans_col.flatten()
    # spans per DOC = sum of partial span counts over the doc's rows
    cs = np.concatenate(([0], np.cumsum(span_lens)))
    doc_span_counts = cs[starts + counts] - cs[starts]
    doc_starts = np.concatenate(([0], np.cumsum(doc_span_counts)))
    # dense offsets per doc (flat order already doc-major, range-ordered)
    offsets_dense = (
        np.arange(len(flat_spans), dtype=np.int64)
        - np.repeat(doc_starts[:-1], doc_span_counts)
    ).astype(np.int32)
    span_struct = pa.StructArray.from_arrays(
        [
            flat_spans.field("kind"),
            flat_spans.field("text"),
            flat_spans.field("media_ref"),
            pa.array(offsets_dense, pa.int32()),
            flat_spans.field("chunk_id"),
            flat_spans.field("page"),
            flat_spans.field("bbox"),
            # multi-page groundings pass through untouched: a continuation
            # chain never crosses a part_range (merge is part-local)
            flat_spans.field("groundings"),
        ],
        fields=list(OUTPUT_SPAN_STRUCT),
    )
    spans_arr = pa.ListArray.from_arrays(pa.array(doc_starts, pa.int32()), span_struct)

    errors_col = g.column("errors").combine_chunks()
    err_lens = pa.compute.list_value_length(errors_col).to_numpy(
        zero_copy_only=False
    )
    cse = np.concatenate(([0], np.cumsum(err_lens)))
    doc_err_counts = cse[starts + counts] - cse[starts]
    errors_arr = pa.ListArray.from_arrays(
        pa.array(np.concatenate(([0], np.cumsum(doc_err_counts))), pa.int32()),
        errors_col.flatten(),
    )

    mds = g.column("markdown").to_pylist()
    markdowns = [
        merge_markdown(mds[starts[di] : starts[di] + counts[di]])
        for di in range(n_docs)
    ]

    first = pa.array(starts, pa.int64())
    ends = g.column("end_page_idx").combine_chunks().to_numpy(zero_copy_only=False)
    end_page = np.maximum.reduceat(ends, starts).astype(np.int32)
    return pa.Table.from_arrays(
        [
            pa.compute.take(doc_id_arr, first),
            pa.array(markdowns, pa.string()),
            spans_arr,
            errors_arr,
            pa.array(np.zeros(n_docs, np.int32)),
            pa.array(end_page, pa.int32()),
            pa.compute.take(g.column("doc_type").combine_chunks(), first),
        ],
        schema=PARSED_DOC_SCHEMA,
    )


def reassemble_two_phase(
    chunks: "ray.data.Dataset",
    config: EngineConfig = DEFAULT_CONFIG,
    range_size: int = 8,
) -> "ray.data.Dataset":
    """Salted two-phase merge — the escape hatch for documents whose chunk
    rows exceed a single reducer's heap.

    Phase 1 groups by (bucket, part_idx // range_size): each partial group
    holds at most ``range_size`` parts of any document, merges them with
    the SAME vectorized merge as the single-phase path, and emits a partial
    ParsedDocument row. Phase 2 groups by bucket only and concatenates each
    doc's partials in part_range order (``_combine_partial_docs``). The
    merge is associative because parts are order-indexed — pinned equal to
    single-phase ``reassemble`` by tests/test_split_merge.py."""
    from agentic_doc_ray.context import shuffle_partitions

    b = config.reassemble_num_partitions or 64

    def add_range(batch: pa.Table) -> pa.Table:
        rng = pa.compute.cast(
            pa.compute.divide(batch.column("part_idx"), pa.scalar(range_size, pa.int32())),
            pa.int32(),
        )
        # widen the shuffle key so one mega-doc's ranges spread across
        # reducers: salt = bucket * large + range would explode key space;
        # key on (bucket, part_range) pairs instead
        return batch.append_column("part_range", rng)

    keyed = chunks.map_batches(add_range, batch_format="pyarrow")

    def merge_partial(group: pa.Table) -> pa.Table:
        rng = group.column("part_range")[0].as_py() if group.num_rows else 0
        merged = merge_bucket_group(group.drop_columns(["part_range"]), config)
        return merged.append_column(
            "part_range", pa.array([rng] * merged.num_rows, pa.int32())
        )

    partials = keyed.groupby(
        ["bucket", "part_range"], num_partitions=shuffle_partitions(b)
    ).map_groups(merge_partial, batch_format="pyarrow")

    def re_bucket(batch: pa.Table) -> pa.Table:
        import zlib

        ids = batch.column("doc_id").to_pylist()
        return batch.append_column(
            "bucket",
            pa.array([zlib.crc32(str(s).encode()) % b for s in ids], pa.int32()),
        )

    return (
        partials.map_batches(re_bucket, batch_format="pyarrow")
        .groupby("bucket", num_partitions=shuffle_partitions(b))
        .map_groups(
            lambda g: _combine_partial_docs(g.drop_columns(["bucket"])),
            batch_format="pyarrow",
        )
    )


def reassemble(
    chunks: "ray.data.Dataset",
    config: EngineConfig = DEFAULT_CONFIG,
    has_bucket: bool = True,
) -> "ray.data.Dataset":
    """The groupby(doc_id) shuffle restoring per-document span order.

    Implemented as a salted/bucketed exchange: chunks are keyed by
    ``crc32(doc_id) % B`` and grouped by bucket, and each bucket merges all
    of its documents in one vectorized pass (merge_bucket_group). Same
    rows-to-reducer movement as groupby(doc_id), but the shuffle sorts 64
    small int keys instead of one string key per document, and per-group
    overhead is amortized across the bucket (SURVEY.md §4.3 skew design:
    a pathological doc still lands in one bucket — buckets hold many docs,
    so B spreads them; raise B for larger clusters).
    """
    from agentic_doc_ray.context import shuffle_partitions

    b = config.reassemble_num_partitions or 64
    if not has_bucket:
        chunks = chunks.map_batches(
            _add_bucket, fn_kwargs={"n_buckets": b}, batch_format="pyarrow"
        )
    return chunks.groupby(
        "bucket", num_partitions=shuffle_partitions(b)
    ).map_groups(lambda g: merge_bucket_group(g, config), batch_format="pyarrow")
