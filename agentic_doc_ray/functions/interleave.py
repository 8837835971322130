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


# ---------------------------------------------------------------------------
# Interleaved multimodal sequence packing
# ---------------------------------------------------------------------------

PACK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("offset", pa.int64()),
        ("is_media", pa.int64()),
        ("cost", pa.int64()),
        ("seq_idx", pa.int64()),
        ("seq_pos", pa.int64()),
    ]
)


def interleave_pack_batch(
    batch: pa.Table, *, token_budget: int = 96, media_cost: int = 32
) -> pa.Table:
    """Segment each document's interleaved span stream (offset order) into
    training sequences of <= token_budget cost: text spans cost their
    whitespace token count (the repo-wide ``_token_count`` convention),
    media spans cost the fixed ``media_cost`` placeholder budget
    (MMC4/OBELICS-style image-token accounting). A sequence break falls
    before the span that would overflow the budget; a single span larger
    than the budget gets a sequence of its own (spans are never split).

    Output: one row per span — (doc_id, offset, is_media, cost, seq_idx,
    seq_pos), seq_idx counted within the document. Doc-local (a corpus
    row carries its whole document): zero exchanges. Costs and ordering
    are fully vectorized; the greedy boundary scan is one
    ``np.searchsorted`` per produced SEQUENCE on the doc's cost cumsum
    (sequential by nature, like ``sampling.pack_sequences``), never a
    per-span Python loop.
    """
    from agentic_doc_ray.functions.text import _token_count

    spans = batch.column("spans").combine_chunks()
    n_docs = batch.num_rows
    lens = pc.list_value_length(spans).to_numpy(zero_copy_only=False).astype(np.int64)
    parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    flat = spans.flatten()
    n = len(flat)
    if n == 0:
        return pa.Table.from_arrays(
            [pa.array([], f.type) for f in PACK_SCHEMA], schema=PACK_SCHEMA
        )

    media_ref = pc.fill_null(flat.field("media_ref"), "")
    is_media = pc.not_equal(media_ref, "").to_numpy(zero_copy_only=False)
    text_cost = _token_count(pc.fill_null(flat.field("text"), "")).to_numpy(
        zero_copy_only=False
    )
    cost = np.where(is_media, np.int64(media_cost), text_cost).astype(np.int64)
    offs = flat.field("offset").to_numpy(zero_copy_only=False).astype(np.int64)

    order = np.lexsort((offs, parents))
    p = order_p = parents[order]
    c = cost[order]
    starts = np.concatenate(([0], np.cumsum(lens)))
    cum = np.cumsum(c)

    seq_idx = np.zeros(n, np.int64)
    seq_pos = np.zeros(n, np.int64)
    for d in range(n_docs):
        lo, hi = int(starts[d]), int(starts[d + 1])
        if lo == hi:
            continue
        base = cum[lo - 1] if lo else 0
        start = lo
        seq = 0
        while start < hi:
            # furthest span such that the sequence cost stays <= budget
            end = int(
                np.searchsorted(cum[start:hi], base + token_budget, side="right")
            ) + start
            if end == start:  # oversize single span: own sequence
                end = start + 1
            seq_idx[start:end] = seq
            seq_pos[start:end] = np.arange(end - start)
            base = cum[end - 1]
            start = end
            seq += 1

    ids = pc.take(batch.column("doc_id").combine_chunks(), pa.array(order_p))
    return pa.Table.from_arrays(
        [
            pc.cast(ids, pa.string()),
            pa.array(offs[order]),
            pa.array(is_media[order].astype(np.int64)),
            pa.array(c),
            pa.array(seq_idx),
            pa.array(seq_pos),
        ],
        schema=PACK_SCHEMA,
    )


def interleave_pack(
    corpus: "ray.data.Dataset", *, token_budget: int = 96, media_cost: int = 32
) -> "ray.data.Dataset":
    def f(batch: pa.Table) -> pa.Table:
        return interleave_pack_batch(
            batch, token_budget=token_budget, media_cost=media_cost
        )

    return corpus.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def interleave_pack_oracle(
    corpus: pa.Table, *, token_budget: int = 96, media_cost: int = 32
) -> pa.Table:
    """Independent naive replica: plain per-span Python loop, no shared
    cumsum/searchsorted machinery with the operator."""
    from agentic_doc_ray.functions.text import _token_count

    rows = []
    ids = corpus.column("doc_id").to_pylist()
    spans_col = corpus.column("spans").to_pylist()
    for d, spans in zip(ids, spans_col):
        ordered = sorted(spans or [], key=lambda s: s["offset"])
        seq = used = pos = 0
        for s in ordered:
            m = bool(s.get("media_ref") or "")
            c = (
                media_cost
                if m
                else int(
                    _token_count(pa.array([s.get("text") or ""]))[0].as_py()
                )
            )
            if pos > 0 and used + c > token_budget:
                seq += 1
                used = 0
                pos = 0
            rows.append(
                {
                    "doc_id": str(d),
                    "offset": int(s["offset"]),
                    "is_media": int(m),
                    "cost": c,
                    "seq_idx": seq,
                    "seq_pos": pos,
                }
            )
            used += c
            pos += 1
    return pa.Table.from_pylist(rows, schema=PACK_SCHEMA)


def kind_transitions(parsed: "ray.data.Dataset") -> "ray.data.Dataset":
    """Layout-structure profile of the extracted span stream: counts of
    consecutive (kind -> next kind) transitions in offset order per doc
    (title->text, text->table, ... — the corpus-level document-grammar
    signal). Consumes the PARSED stream — a document is one atomic row
    carrying its ordered span list, so transitions can never be cut by
    block re-slicing (the flat stream CAN split a doc across batches);
    per-batch pair partials -> one tiny (kind_a, kind_b) aggregate."""
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions

    empty = pa.table(
        {
            "kind_a": pa.array([], pa.string()),
            "kind_b": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        kinds = flat.field("kind")
        parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        n = len(kinds)
        if n < 2:
            return empty
        same = pa.array(parents[:-1] == parents[1:])
        t = pa.Table.from_arrays(
            [
                kinds.slice(0, n - 1).filter(same),
                kinds.slice(1).filter(same),
            ],
            names=["kind_a", "kind_b"],
        )
        if t.num_rows == 0:
            return empty
        g = t.group_by(["kind_a", "kind_b"]).aggregate([("kind_a", "count")])
        return g.rename_columns(["kind_a", "kind_b", "n"])

    return (
        parsed.map_batches(partial, batch_format="pyarrow")
        .groupby(["kind_a", "kind_b"], num_partitions=shuffle_partitions(4))
        .aggregate(Sum("n", alias_name="n"))
    )


def error_rate_by_source(
    parsed: "ray.data.Dataset", sf_dir: str
) -> "ray.data.Dataset":
    """Per-source extraction health rollup (the ingestion-quality alarm
    table): n_docs, docs with >= 1 page error, total page errors. The
    corpus doc_id encodes the source table's integer id (doc-%08d), so
    the source attaches through the generic bucketed ``hash_join``
    against the documents table (source scales with docs — no
    broadcast); per-source int partials finish in a tiny aggregate."""
    import ray

    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions
    from agentic_doc_ray.functions.join_api import hash_join

    def doc_rows(batch: pa.Table) -> pa.Table:
        ids = pc.cast(
            pc.utf8_slice_codeunits(batch.column("doc_id"), 4, 1 << 30),
            pa.int64(),
        )
        n_err = pc.list_value_length(batch.column("errors")).cast(pa.int64())
        return pa.Table.from_arrays(
            [
                ids,
                pc.cast(pc.greater(n_err, 0), pa.int64()),
                n_err,
            ],
            names=["doc_int", "has_err", "n_errors"],
        )

    per_doc = parsed.map_batches(doc_rows, batch_format="pyarrow")
    src = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    joined = hash_join(per_doc, src, left_on="doc_int", right_on="doc_id")

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["source", "has_err", "n_errors"])
            .group_by("source")
            .aggregate(
                [("has_err", "count"), ("has_err", "sum"), ("n_errors", "sum")]
            )
        )
        return g.rename_columns(["source", "n_docs", "n_docs_with_errors", "n_errors"])

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("source", num_partitions=shuffle_partitions(4))
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_docs_with_errors", alias_name="n_docs_with_errors"),
            Sum("n_errors", alias_name="n_errors"),
        )
    )


def extraction_yield(
    parsed: "ray.data.Dataset", corpus: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """Per-doc extraction yield audit: markdown chars OUT vs raw corpus
    span chars IN (boilerplate-strip efficiency + error losses), floor
    per-mille. Both sides collapse to per-doc char counts batch-locally
    (doc-atomic rows); they meet in one bucketed ``hash_join`` — nothing
    text-sized shuffles."""
    from agentic_doc_ray.functions.join_api import hash_join

    def raw_side(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        tl = pc.utf8_length(flat.field("text")).cast(pa.int64())
        parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        n_docs = batch.num_rows
        raw = np.zeros(n_docs, np.int64)
        if len(tl):
            np.add.at(raw, parents, tl.to_numpy(zero_copy_only=False))
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(raw)],
            names=["doc_id", "raw_chars"],
        )

    def md_side(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                pc.utf8_length(batch.column("markdown")).cast(pa.int64()),
            ],
            names=["doc_id", "markdown_chars"],
        )

    raw = corpus.map_batches(raw_side, batch_format="pyarrow")
    md = parsed.map_batches(md_side, batch_format="pyarrow")
    joined = hash_join(md, raw, left_on="doc_id", how="left")

    def finish(batch: pa.Table) -> pa.Table:
        r = pc.coalesce(
            batch.column("raw_chars").combine_chunks().cast(pa.int64()),
            pa.scalar(0, pa.int64()),
        ).to_numpy(zero_copy_only=False)
        o = batch.column("markdown_chars").combine_chunks().cast(pa.int64())
        ypm = 1000 * o.to_numpy(zero_copy_only=False) // np.maximum(r, 1)
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                pa.array(r.astype(np.int64)),
                o,
                pa.array(ypm.astype(np.int64)),
            ],
            names=["doc_id", "raw_chars", "markdown_chars", "yield_per_mille"],
        )

    return joined.map_batches(finish, batch_format="pyarrow")
