"""Composed end-to-end curation pipeline: quality gate -> exact dedup ->
token pricing, fused into a single streaming plan.

Real curation runs (Gopher, RefinedWeb, FineWeb) are compositions — a
quality rule set gates documents, the survivors are exact-deduplicated,
and what remains is priced in tokens for mixture planning. Each stage
exists in this repo as a standalone operator (text.gopher_quality_flags,
dedup.dedup_keep, text.token_counts); this module chains them WITHOUT
materializing between stages and without re-reading or re-shipping
document text:

  stage 1 (map_batches, batch-local): Gopher flags -> filter keep==1 ->
      md5 the surviving text -> emit slim (bucket, h, doc_id, n_tokens)
      key rows. n_words from the Gopher pass IS the repo-wide whitespace
      token count, so pricing costs nothing extra. Text never leaves
      this stage.
  stage 2 (ONE bucketed exchange): per-bucket first-occurrence keep
      (min doc_id per content hash), emitting (doc_id, n_tokens).

Total exchange payload: one ~50-byte key row per SURVIVING doc — at
100 TB the shuffle moves hashes, never documents. The quality filter can
empty whole blocks (a batch of boilerplate), so the exchange unions the
standard covering sentinels against Ray's empty-first-block schema race
(see functions/_exchange.py).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from agentic_doc_ray.context import shuffle_partitions
from agentic_doc_ray.functions.dedup import _N_DEDUP_BUCKETS
from agentic_doc_ray.functions.text import (
    _GOPHER_STOPWORDS,
    gopher_quality_flags_batch,
)

_KEY_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("h", pa.string()),
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
    ]
)


def _gate_and_key(
    batch: pa.Table, stopwords: tuple[str, ...] = _GOPHER_STOPWORDS
) -> pa.Table:
    """Gopher gate + content hash in one pass over the batch."""
    flags = gopher_quality_flags_batch(batch, stopwords=stopwords)
    mask = pc.cast(pc.equal(flags.column("keep"), 1), pa.bool_())
    surv = batch.filter(mask)
    toks = flags.filter(mask).column("n_words")
    h = [
        hashlib.md5((t or "").encode()).hexdigest()
        for t in surv.column("text").to_pylist()
    ]
    bucket = pa.array(
        [int(x[:4], 16) % _N_DEDUP_BUCKETS for x in h], pa.int32()
    )
    return pa.Table.from_arrays(
        [bucket, pa.array(h, pa.string()), surv.column("doc_id"), toks],
        schema=_KEY_SCHEMA,
    )


def _keep_first(group: pa.Table) -> pa.Table:
    """Min-doc_id row per content hash (sentinel rows carry doc_id=-1)."""
    group = group.filter(pc.greater_equal(group.column("doc_id"), 0))
    if group.num_rows == 0:
        return pa.Table.from_pydict(
            {"doc_id": pa.array([], pa.int64()),
             "n_tokens": pa.array([], pa.int64())}
        )
    keepers = (
        group.select(["h", "doc_id"])
        .group_by("h")
        .aggregate([("doc_id", "min")])
        .rename_columns(["h", "keeper"])
    )
    joined = group.join(keepers, keys="h", join_type="inner")
    kept = joined.filter(
        pc.equal(joined.column("doc_id"), joined.column("keeper"))
    )
    return kept.select(["doc_id", "n_tokens"])


def curation_keep(
    docs: "ray.data.Dataset",
    stopwords: tuple[str, ...] = _GOPHER_STOPWORDS,
) -> "ray.data.Dataset":
    """(doc_id, n_tokens) for every document that passes the full Gopher
    rule set (with the given stopword inventory) AND is the first
    occurrence (min doc_id) of its exact content among the survivors."""
    import functools

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    keyed = docs.map_batches(
        functools.partial(_gate_and_key, stopwords=stopwords),
        batch_format="pyarrow",
    )
    sentinels = int_key_sentinels(
        _KEY_SCHEMA, "bucket", fill={"h": "", "doc_id": -1, "n_tokens": 0}
    )
    return (
        keyed.union(sentinels)
        .groupby("bucket", num_partitions=shuffle_partitions())
        .map_groups(_keep_first, batch_format="pyarrow")
    )
