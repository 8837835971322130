"""Distributed inverted-index construction (term -> postings).

The index-build pipeline of a retrieval / training-data stack, as one
exchange: tokenize -> per-batch (doc_id, term, tf) partials via a single
C-speed Arrow group_by -> hash-partition on crc32(term) so every term's
postings co-locate -> per-bucket (term, doc_id)-sorted postings, ready to
sink as partitioned parquet (one directory per term-hash bucket — the
resumable layout). Nothing passes through the driver; the exchange
carries (doc, term, tf) rows — the index's own size, the irreducible
cost of index construction.

``terms=`` prunes at the map stage (targeted postings extraction reads
the corpus once and ships only the requested terms' rows). Tokenization
is the engine's standard trim + whitespace split (functions/text.py), so
the DuckDB oracle matches token-for-token.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from agentic_doc_ray.context import shuffle_partitions
from agentic_doc_ray.functions.text import _regex_trim

_N_IDX_BUCKETS = 64

_POSTING_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int64()),
    ]
)


def _postings_batch(batch: pa.Table, terms: list[str] | None) -> pa.Table:
    """(doc_id, text) -> (bucket, term, doc_id, tf), one row per distinct
    (doc, term) in the batch. One Arrow group_by does the tf counting."""
    text = batch.column("text")
    toks = pc.split_pattern_regex(_regex_trim(text), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(len(lens)), lens)
    ids = batch.column("doc_id").combine_chunks()
    pairs = pa.Table.from_arrays(
        [pc.take(ids, pa.array(parent, pa.int64())), flat],
        names=["doc_id", "term"],
    )
    # drop the empty-string token a blank doc splits into
    pairs = pairs.filter(pc.not_equal(pairs.column("term"), ""))
    if terms is not None:
        pairs = pairs.filter(
            pc.is_in(pairs.column("term"), value_set=pa.array(terms, pa.string()))
        )
    g = (
        pairs.group_by(["doc_id", "term"])
        .aggregate([("term", "count")])
        .rename_columns(["doc_id", "term", "tf"])
    )
    # crc32 once per distinct term, broadcast back via dictionary codes
    enc = g.column("term").combine_chunks().dictionary_encode()
    vocab = enc.dictionary.to_pylist()
    crc = np.fromiter(
        (zlib.crc32(t.encode()) % _N_IDX_BUCKETS for t in vocab),
        dtype=np.int64,
        count=len(vocab),
    )
    codes = np.asarray(enc.indices.cast(pa.int64()))
    return pa.Table.from_arrays(
        [
            pa.array(crc[codes].astype(np.int32), pa.int32()),
            g.column("term"),
            g.column("doc_id").cast(pa.int64()),
            g.column("tf").cast(pa.int64()),
        ],
        schema=_POSTING_SCHEMA,
    )


def build_inverted_index(
    docs: "ray.data.Dataset",
    terms: list[str] | None = None,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """(bucket, term, doc_id, tf) with each bucket's rows sorted by
    (term, doc_id) — the postings layout. ``terms`` prunes at the map."""
    from agentic_doc_ray.functions._exchange import int_key_sentinels

    def sort_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.greater(group.column("tf"), 0))  # drop sentinels
        return g.take(
            pc.sort_indices(
                g, sort_keys=[("term", "ascending"), ("doc_id", "ascending")]
            )
        )

    # a terms= filter can empty whole blocks -> empty-first-block guard
    # (_exchange.py); sentinel tf=0 rows never survive sort_bucket
    return (
        docs.map_batches(
            lambda b: _postings_batch(b, terms), batch_format="pyarrow"
        )
        .union(int_key_sentinels(_POSTING_SCHEMA, "bucket", fill={"term": "", "doc_id": -1, "tf": 0}))
        .groupby("bucket", num_partitions=shuffle_partitions(num_partitions))
        .map_groups(sort_bucket, batch_format="pyarrow")
    )


def index_postings(
    docs: "ray.data.Dataset",
    terms: list[str],
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """(term, doc_id, tf) for the requested terms — targeted postings
    extraction through the full index exchange."""
    return build_inverted_index(
        docs, terms=terms, num_partitions=num_partitions
    ).drop_columns(["bucket"])


def write_index(
    docs: "ray.data.Dataset", out_dir: str
) -> "ray.data.Dataset":
    """Sink the full index as bucket-partitioned parquet (one directory
    per term-hash bucket: a rerun can skip finished buckets, and a term
    lookup touches exactly one directory)."""
    ds = build_inverted_index(docs)
    ds.write_parquet(out_dir, partition_cols=["bucket"])
    return ray.data.read_parquet(out_dir)
